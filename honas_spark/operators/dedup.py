"""Deduplication operators for large-scale training-data pipelines.

All hot paths are Spark built-ins (JVM, whole-stage codegen): shingling via
split/transform, MinHash via min(xxhash64(shingle, seed_i)) aggregates,
SimHash via bit-arithmetic aggregates.  No Python UDFs anywhere here.

Scale notes (100 TB):
  * exact dedup — hash-groupBy on a 16-byte fingerprint: shuffle carries
    (fingerprint, id) only, never content.
  * n-gram Jaccard — inverted-index self-join; `max_shingle_freq` drops
    stop-shingles (document-frequency cap) to keep the join from going
    quadratic on common n-grams — the standard prefix-filtering move.
  * MinHash LSH — signatures are fixed-size (num_hashes longs) per doc;
    banding turns all-pairs into equality buckets, so candidate generation
    is one groupBy on (band, band_hash).  Only candidates get verified.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint, tokens
from .common import resplit_small


def shingles(col, n: int = 3):
    """Distinct word n-gram shingles of a text column (built-ins only).

    Zero-token documents (empty / whitespace-only text) produce an EMPTY
    array, not [""]: a blank doc has no shingle content, and emitting the
    empty-string shingle would make every blank doc hash-identical — the
    downstream signature operators drop such docs entirely (they cannot
    be meaningfully near-dup compared)."""
    # n-gram construction folds n shifted slices with zip_with instead
    # of transform(sequence(…), i -> slice(toks, i+1, n)): an
    # expression captured inside a higher-order lambda is re-evaluated
    # PER ELEMENT, so the old form re-tokenized the document once per
    # shingle — O(tokens²) per row (measured 16x on the bigram twin,
    # operators/quality.py:_bigram_rows).  Slices are HOF *arguments*
    # and evaluate once.
    toks = tokens(col)
    sz = F.size(toks)
    if n == 1:
        gram = toks
    else:
        m = F.greatest(sz - (n - 1), F.lit(0))
        gram = F.slice(toks, 1, m)
        for j in range(2, n + 1):
            gram = F.zip_with(
                gram,
                F.slice(toks, j, m),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
    return F.array_distinct(
        F.when(sz >= n, gram)
        .when(sz > 0, F.array(F.array_join(toks, " ")))
        .otherwise(F.array().cast("array<string>"))
    )


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact (normalized) duplicate groups: fingerprint -> count + rep.
    Output: (fp, n_dups, rep_id) for groups with >= 2 members."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("rep_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_num: int = 4,
    min_den: int = 5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs with
    jaccard >= min_num/min_den, in pure integer arithmetic (no float
    thresholds): |A∩B| * min_den >= |A∪B| * min_num.

    Output: (id_a, id_b, inter, uni)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), n)).alias("sh"),
    )
    if max_shingle_freq is not None:
        # document-frequency cap WITHOUT a window sort: a hot stop-shingle
        # ("the quick") would put its whole posting list into one sorted
        # window partition — the exact skew the cap exists to defuse.
        # Instead: groupBy-count the shingle DF and semi-join the survivors
        # back (same pattern as the LSH hot-bucket cap below); the count
        # aggregate is map-side partial, so no task ever holds a full
        # posting list.
        good = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_freq)
            .select("sh")
        )
        sh = sh.join(good.hint("shuffle_hash"), "sh", "left_semi")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(F.col("inter") * min_den >= F.col("uni") * min_num)
        .select("id_a", "id_b", "inter", "uni")
    )


def token_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_num: int = 4,
    min_den: int = 5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Asymmetric near-SUPERSET detection: keep pairs whose containment
    C = |A∩B| / min(|A|, |B|) >= min_num/min_den, in pure integer
    arithmetic (inter * min_den >= min(n_a, n_b) * min_num — no float
    ever decides a pair).

    Jaccard misses one-document-inside-another duplication: a
    100-shingle quote embedded verbatim in a 10,000-shingle page has
    J ~= 0.01 but containment 1.0 — the quotation/boilerplate-inclusion
    regime that substring dedup targets (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), scored here at shingle
    granularity.  Output: (id_a, id_b, inter, n_a, n_b) with
    id_a < id_b; the smaller side's containment is the score.

    Scale shape is identical to ngram_jaccard_pairs: distinct-shingle
    inverted index, document-frequency cap via groupBy-count + semi-join
    (no window sort, no task ever holds a full posting list), integer
    filter after two size joins.  Note the DF cap SHRINKS effective set
    sizes for both engines equally — the score stays exact over the
    capped shingle universe."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(F.col(text_col), n)).alias("sh"),
    )
    if max_shingle_freq is not None:
        good = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_freq)
            .select("sh")
        )
        sh = sh.join(good.hint("shuffle_hash"), "sh", "left_semi")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .filter(
            F.col("inter") * min_den
            >= F.least(F.col("n_a"), F.col("n_b")) * min_num
        )
        .select("id_a", "id_b", "inter", "n_a", "n_b")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig array<long>): sig_i = min over shingles of h_i(shingle)
    — one shuffle, JVM-side aggregates.

    hash_fn: "xxhash64" (default — fastest, JVM-internal) or "md5"
    (60-bit prefix of md5(i || shingle): ~3x slower but portable, so a
    SQL engine can recompute signatures exactly — the cross-engine
    verification knob).

    Physical shape: a signature is a per-document reduction, so it is
    computed as `array_min(transform(shingles, h_i))` — a pure
    projection, ZERO shuffle (the explode+groupBy alternative ships
    every shingle string through an exchange, ~5-10x the input bytes at
    corpus scale).  Parallelism comes from input splits; a small input
    with fewer partitions than cores is re-split first (cheap there,
    and never triggered on a real many-split corpus)."""
    if hash_fn == "md5":
        def h(s, i):
            return F.conv(
                F.substring(F.md5(F.concat(F.lit(str(i)), s)), 1, 15),
                16, 10,
            ).cast("long")
    else:
        def h(s, i):
            return F.xxhash64(s, F.lit(i))

    def mk(i):  # bind i; a 2-arg lambda would receive the element INDEX
        return lambda s: h(s, i)

    df = resplit_small(df)
    # zero-shingle docs are dropped, not emitted: array_min over an empty
    # array is null, and null signatures would band-hash identically,
    # pairing ALL blank/short docs at max confidence downstream.  The
    # predicate is rlike('\\S') (text contains any non-whitespace
    # char) — equivalent to size(shingles) > 0 but evaluated BEFORE the
    # projection: a filter on the shingle array itself gets pushed below
    # the select by substitution, computing the (dominant) shingle
    # expression twice per row.  (Not trim(): Spark trim strips only
    # ASCII spaces, not tabs/newlines.)
    base = df.filter(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("_shs")
    )
    sig = F.array(
        *[F.array_min(F.transform(F.col("_shs"), mk(i)))
          for i in range(num_hashes)]
    )
    return base.select(id_col, sig.alias("sig"))


def band_hashes(sig_col, bands: int, rows_per_band: int):
    """The canonical signature-banding expression: an array of `bands`
    hashes, one per contiguous rows_per_band slice of the signature
    (xxhash64 over the comma-joined decimal rendering — hash equality
    collapses to slice equality).  Shared by minhash_lsh_candidates
    and streaming.neardedupe so the stream's state-bucket keys can
    never drift from the batch LSH semantics."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.array_join(
                F.transform(
                    F.slice(
                        sig_col, b * rows_per_band + 1, rows_per_band
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ),
    )


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Banded LSH: docs agreeing on all rows of any band become a
    candidate pair.  Output: (id_a, id_b, n_bands_matched).

    max_bucket_size drops degenerate buckets before the self-join: a
    band value shared by thousands of documents signals a near-universal
    shingle pattern, not near-duplication, and would turn the join
    quadratic — the standard LSH hot-bucket cap at corpus scale."""
    if bands < 1 or num_hashes % bands:
        # rows_per_band would floor to 0 (or misalign): every band hashes
        # an empty/truncated signature slice and ALL docs collapse into
        # one bucket — silently degenerate recall, so fail loudly.  Use
        # lsh_params(threshold, num_hashes) to derive a valid pair.
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes}); see lsh_params()"
        )
    rows_per_band = num_hashes // bands
    banded = sig_df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            band_hashes(F.col("sig"), bands, rows_per_band)
        ).alias("band", "bh"),
    )
    if max_bucket_size is not None:
        # hot-bucket cap WITHOUT a window sort: bucket sizes come from a
        # groupBy on the same key, and the filtering join re-uses the
        # (band, bh) exchange (ReusedExchange under AQE) — cheaper than
        # the sort-based window and bounded-memory at any skew.
        good = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(
                (F.col("_bsz") <= max_bucket_size) & (F.col("_bsz") >= 2)
            )
            .select("band", "bh")
        )
        banded = banded.join(
            good.hint("shuffle_hash"), ["band", "bh"], "left_semi"
        )
        # buckets are now <= max_bucket_size: generate pairs INSIDE each
        # bucket from a collect_list (pure projection) instead of a
        # bucket self-join — one fewer shuffle of the banded table and no
        # join explosion.
        ids = F.array_sort(F.col("ids"))
        n = F.size(ids)
        pair_array = F.flatten(
            F.transform(
                ids,
                lambda x, i: F.transform(
                    F.slice(ids, i + 2, n - i - 1),
                    lambda y: F.struct(
                        x.alias("id_a"), y.alias("id_b")
                    ),
                ),
            )
        )
        return (
            banded.groupBy("band", "bh")
            .agg(F.collect_list("_id").alias("ids"))
            .select(F.explode(pair_array).alias("p"))
            # strict inequality guards duplicate input ids (the sorted
            # list would otherwise yield id_a == id_b self-pairs the
            # self-join path's a._id < b._id can never produce)
            .filter(F.col("p.id_a") < F.col("p.id_b"))
            .groupBy(
                F.col("p.id_a").alias("id_a"),
                F.col("p.id_b").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_bands_matched"))
        )
    # uncapped path (caller vouches for bucket sizes): bucket self-join
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per document: per bit, sum +-1 over token hashes, take
    the sign.  Output: (id, simhash long).  hash_fn="md5" swaps in the
    portable 60-bit md5-prefix hash so a SQL oracle can recompute the
    fingerprint exactly (same knob as minhash_signatures).

    Physical shape: per-document reduction -> pure projection, zero
    shuffle.  Token hashes are computed once into an array column; ONE
    `aggregate` pass folds them into a `bits`-element vote array
    (zip_with accumulator — measured ~35% faster than 64 separate
    aggregate passes at sf0.1, and it touches each token hash once);
    the sign fold is plain column arithmetic.  The old explode +
    64-sum groupBy shipped one row per token through an exchange.
    Small inputs with fewer splits than cores re-split first (same rule
    as minhash_signatures)."""
    if not 1 <= bits <= 64:
        # bit 63 is the two's-complement sign bit; more would alias
        raise ValueError(f"bits must be in [1, 64]: {bits}")
    if hash_fn == "md5":
        def h(t):
            return F.conv(
                F.substring(F.md5(t), 1, 15), 16, 10
            ).cast("long")
    else:
        def h(t):
            return F.xxhash64(t)

    df = resplit_small(df)
    # zero-token docs are dropped: their vote vector is all-zero, so the
    # fingerprint collapses to 0 and every blank doc pairs at hamming 0.
    # rlike('\\S') == size(tokens) > 0, evaluated pre-projection so
    # the token-hash array is computed once (see minhash_signatures).
    base = df.filter(F.col(text_col).rlike(r"\S")).select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), h).alias("_hs"),
    )

    bitsq = F.sequence(F.lit(0), F.lit(bits - 1))
    votes = F.aggregate(
        F.col("_hs"),
        F.array_repeat(F.lit(0), bits),
        # getbit(hv, b)*2 - 1 == the reference +-1 vote for bit b
        lambda acc, hv: F.zip_with(
            acc, bitsq,
            lambda a, b: a + F.getbit(hv, b).cast("int") * 2 - 1,
        ),
    )
    base = base.select(F.col(id_col), votes.alias("_v"))
    terms = []
    for b in range(bits):
        val = (1 << b) if b < 63 else -(1 << 63)  # two's-complement top bit
        terms.append(
            F.when(F.col("_v")[b] > 0, F.lit(val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    sim = reduce(lambda x, y: x + y, terms)
    return base.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str, max_hamming: int = 3,
    bands: int = 4, max_bucket_size: int | None = 200,
    sim_col: str = "simhash", bits: int = 64,
) -> DataFrame:
    """Candidate pairs by band equality (any pair within hamming
    distance <= bands-1 shares a band), verified with bit_count.
    Output: (id_a, id_b, hamming).

    max_bucket_size caps degenerate buckets before pair generation:
    band values are width-bit chunks, so there are at most 2^width
    distinct bucket keys per band (~65k for the default 16-bit bands) —
    past ~10^8 docs the expected bucket holds thousands of rows and an
    uncapped band self-join goes quadratic-in-bucket.  Same defusal as
    minhash_lsh_candidates: bucket sizes from a groupBy on the band key
    (map-side partial, ReusedExchange under AQE), oversized buckets
    dropped via semi-join, pairs generated INSIDE each surviving bucket
    from a collect_list — no self-join anywhere on the capped path.  A
    bucket that large signals a degenerate fingerprint region (e.g.
    boilerplate-dominated docs), not near-duplication.  Pass None to
    restore the uncapped self-join (caller vouches for bucket sizes).

    sim_col: the fingerprint column ("simhash" here, "srp" when called
    from knn.srp_near_pairs — the SRP scale path reuses this banding).

    bits: the fingerprint width.  Banding MUST slice within the real
    fingerprint: a 16-bit fingerprint banded over 64 bits would give
    three all-zero bands shared by EVERY document — vacuous buckets
    that the cap would drop wholesale (silent recall loss) and the
    uncapped path would pair quadratically."""
    if bands < 1 or bits % bands:
        raise ValueError(
            f"bands ({bands}) must evenly divide bits ({bits})"
        )
    width = bits // bands
    banded = sim_df.select(
        F.col(id_col).alias("_id"),
        F.col(sim_col).alias("_sim"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col(sim_col), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                for i in range(bands)
            ])
        ).alias("band", "bh"),
    )
    if max_bucket_size is not None:
        good = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter(
                (F.col("_bsz") <= max_bucket_size) & (F.col("_bsz") >= 2)
            )
            .select("band", "bh")
        )
        banded = banded.join(
            good.hint("shuffle_hash"), ["band", "bh"], "left_semi"
        )
        # buckets are now <= max_bucket_size: pair generation is a pure
        # projection over a collect_list per bucket (bounded memory),
        # hamming computed in the same pass from the carried fingerprints
        members = F.array_sort(F.col("members"))
        n = F.size(members)
        pair_array = F.flatten(
            F.transform(
                members,
                lambda x, i: F.transform(
                    F.slice(members, i + 2, n - i - 1),
                    lambda y: F.struct(
                        x["_id"].alias("id_a"),
                        y["_id"].alias("id_b"),
                        F.bit_count(
                            x["_sim"].bitwiseXOR(y["_sim"])
                        ).alias("hamming"),
                    ),
                ),
            )
        )
        return (
            banded.groupBy("band", "bh")
            .agg(
                F.collect_list(F.struct("_id", "_sim")).alias("members")
            )
            .select(F.explode(pair_array).alias("p"))
            .select("p.id_a", "p.id_b", "p.hamming")
            # id_a < id_b also guards duplicate input ids: the sorted
            # collect_list would otherwise emit a self-pair the
            # self-join path's strict inequality could never produce
            .filter(
                (F.col("hamming") <= max_hamming)
                & (F.col("id_a") < F.col("id_b"))
            )
            .distinct()
        )
    # uncapped path (caller vouches for bucket sizes): bucket self-join
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(
                F.col("a._sim").bitwiseXOR(F.col("b._sim"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _cc_driver(edges: DataFrame, a_col: str, b_col: str):
    """Union-find over a driver-collected edge list — byte-identical
    (node, component=min reachable id) labels, without the per-round
    join/checkpoint jobs of the distributed loop.  Returns None when
    the edges contain NULL ids (the distributed path owns those)."""
    rows = edges.select(a_col, b_col).collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r[0], r[1]
        if a is None or b is None:
            return None
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    for v in parent:
        root = find(v)
        m = comp_min.get(root)
        if m is None or v < m:
            comp_min[root] = v
    out = [(v, comp_min[find(v)]) for v in parent]
    id_type = edges.schema[a_col].dataType.simpleString()
    return edges.sparkSession.createDataFrame(
        out, f"node {id_type}, component {id_type}"
    )


# candidate-pair graphs below this many edges resolve on the driver:
# the distributed loop costs O(log diameter) rounds of two joins + an
# eager checkpoint each, pure scheduling latency at this size
_CC_DRIVER_MAX_EDGES = 200_000


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate CLUSTER formation: connected components over a
    candidate-pair graph — the step that turns minhash_lsh_candidates /
    simhash_near_pairs / ngram_jaccard_pairs output into dedup groups
    (keep min-id per component, drop the rest).

    Output: (node, component) for every node appearing in `edges`,
    component = the smallest node id reachable from it.

    Algorithm: min-label propagation with pointer jumping — each round
    takes the min over neighbors' labels, then contracts label chains
    by one label->label lookup (comp = comp(comp)).  Pointer jumping
    makes convergence O(log diameter) rounds, so a 100M-node pair graph
    needs ~a dozen joins, not diameter-many; every round is two hash
    joins + one aggregation on (node, label) pairs only.  Rounds stop
    early at the first fixpoint (a count of changed labels per round —
    a scalar driver check, not a collect of data)."""
    # materialize the candidate edges ONCE: the probe, the driver
    # fallback and the bidirectional expansion below would otherwise
    # each recompute the (usually expensive) pair-generation subtree
    edges = edges.select(F.col(a_col), F.col(b_col)).localCheckpoint()
    # small graphs short-circuit to a driver union-find (the probe is
    # a limit-bounded count over the materialized edges, so a
    # web-scale pair graph never reaches the driver; NULL ids fall
    # through to the distributed loop)
    n_probe = edges.limit(_CC_DRIVER_MAX_EDGES + 1).count()
    if n_probe <= _CC_DRIVER_MAX_EDGES:
        small = _cc_driver(edges, a_col, b_col)
        if small is not None:
            return small
    bidir = edges.select(
        F.col(a_col).alias("s"), F.col(b_col).alias("d")
    ).unionByName(
        edges.select(F.col(b_col).alias("s"), F.col(a_col).alias("d"))
    )
    labels = (
        bidir.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    bidir = bidir.persist()
    labels = labels.persist()
    converged = False
    for it in range(max_iter):
        nbr_min = (
            bidir.join(
                labels.withColumnRenamed("node", "d_node"),
                F.col("d") == F.col("d_node"),
            )
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("comp").alias("comp_old"),
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer jumping: follow the label's own label one hop
        jump = stepped.select(
            F.col("node").alias("j_node"), F.col("comp").alias("j_comp")
        )
        # localCheckpoint, not persist: the per-round plan would otherwise
        # nest (each label frame is built from the previous one), and
        # Catalyst re-analysis cost compounds per round; checkpointing
        # truncates the lineage so every round plans against a flat scan.
        # (On a multi-executor cluster prefer reliable checkpointing for
        # executor-loss tolerance; semantics are identical.)
        # The round's label change is carried as a column (comp_old
        # rides along), so the convergence check is a filter-count over
        # the checkpointed partitions — NOT a join of consecutive label
        # frames (which was a per-round hash join of the whole table).
        new_labels = (
            stepped.join(jump, stepped["comp"] == jump["j_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("j_comp", F.col("comp"))
                ).alias("comp"),
                (
                    F.least(
                        F.col("comp"),
                        F.coalesce("j_comp", F.col("comp")),
                    )
                    != F.col("comp_old")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        # the first round always changes labels (every node starts as
        # its own component) — skip its convergence count job
        if it == 0:
            n_changed = 1
        else:
            n_changed = new_labels.filter("changed").count()
        labels.unpersist()
        labels = new_labels.select("node", "comp")
        if n_changed == 0:
            converged = True
            break
    bidir.unpersist()
    if not converged:
        # pointer jumping converges in O(log diameter) rounds, so 25
        # covers any graph up to diameter ~2^25 — hitting the cap means
        # the labels are WRONG (unmerged components), not just slow;
        # returning them silently would corrupt downstream dedup.
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} "
            "iterations; labels may be unmerged — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def near_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    n: int = 3,
    bands: int = 16,
    min_num: int = 4,
    min_den: int = 5,
    max_bucket_size: int | None = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The full near-dedup pipeline in one call: MinHash signatures ->
    banded LSH candidates -> exact Jaccard verification of candidates
    only -> connected components -> representative selection.

    hash_fn: the minhash hash family ("xxhash64" default; "md5" is the
    portable family a SQL engine can recompute — it determines which
    signature slices collide, so cross-engine verification of the WHOLE
    pipeline needs it; see minhash_signatures).

    Output: every input row's (id, component, keep) where component is
    the min id of its near-dup cluster (its own id if unclustered) and
    keep marks the one representative per cluster — filter on keep to
    deduplicate, or join component back for provenance.

    Exact duplicates are folded in via fingerprint edges (rep -> member
    per normalized-text group), which also catches the docs the
    signature path cannot compare: blank/whitespace-only documents
    carry no shingles and never become LSH candidates, but identical
    blanks still collapse to one representative here.

    Scale shape: all-pairs never happens (banding + bucket caps bound
    candidate generation); verification computes the exact Jaccard of
    CANDIDATE PAIRS ONLY — each pair joins its two (distinct-shingle)
    arrays and takes array_intersect/sizes in a projection, so there is
    no inverted-index self-join anywhere in the verify path (an
    uncapped posting-list join over the candidate docs would re-create
    the quadratic blowup banding exists to avoid); clustering runs on
    the verified + exact edge list with pointer jumping."""
    if bands < 1 or num_hashes % bands:
        # fail BEFORE the signature pass (minhash_lsh_candidates would
        # catch it too, but only after computing every signature)
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes}); see lsh_params()"
        )
    sig = minhash_signatures(df, id_col, text_col, num_hashes, n,
                             hash_fn=hash_fn)
    cands = minhash_lsh_candidates(
        sig, id_col, num_hashes, bands, max_bucket_size
    ).select("id_a", "id_b")
    # candidates are typically a tiny fraction of the corpus: semi-join
    # BEFORE computing shingle arrays so the verify step tokenizes and
    # ships arrays for candidate docs only, not the whole corpus
    cand_ids = (
        cands.select(F.col("id_a").alias("_cid"))
        .unionByName(cands.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    sh_df = df.join(
        cand_ids, df[id_col] == cand_ids["_cid"], "left_semi"
    ).select(
        F.col(id_col).alias("_sid"),
        shingles(F.col(text_col), n).alias("_sh"),
    )
    a_sh = sh_df.select(
        F.col("_sid").alias("id_a"), F.col("_sh").alias("_sh_a")
    )
    b_sh = sh_df.select(
        F.col("_sid").alias("id_b"), F.col("_sh").alias("_sh_b")
    )
    verified = (
        cands.join(a_sh, "id_a").join(b_sh, "id_b")
        .withColumn(
            "_inter", F.size(F.array_intersect("_sh_a", "_sh_b"))
        )
        .withColumn(
            "_uni",
            F.size("_sh_a") + F.size("_sh_b") - F.col("_inter"),
        )
        .filter(F.col("_inter") * min_den >= F.col("_uni") * min_num)
        .select("id_a", "id_b")
    )
    # exact-duplicate edges: rep -> every other member of the
    # normalized-fingerprint group (includes zero-shingle docs)
    fp_df = df.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("_fp")
    )
    reps = fp_df.groupBy("_fp").agg(F.min(id_col).alias("id_a"))
    exact_edges = (
        fp_df.join(reps, "_fp")
        .filter(F.col(id_col) != F.col("id_a"))
        .select("id_a", F.col(id_col).alias("id_b"))
    )
    comp = connected_components(
        verified.unionByName(exact_edges), "id_a", "id_b"
    )
    base = df.select(F.col(id_col))
    out = base.join(
        comp, base[id_col] == comp["node"], "left"
    ).select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("component"),
    )
    return out.withColumn(
        "keep", (F.col(id_col) == F.col("component")).cast("int")
    )


def lsh_params(
    threshold: float, num_hashes: int = 64
) -> "tuple[int, int]":
    """Pick (bands, rows_per_band) for a target Jaccard threshold —
    the standard S-curve tuning: candidate probability for similarity s
    is 1-(1-s^r)^b; choose the divisor pair whose curve threshold
    (1/b)^(1/r) sits closest to the target, preferring the
    higher-recall side on ties.  Deterministic, driver-side, O(divisors
    of num_hashes)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1): {threshold}")
    best = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        t = (1.0 / b) ** (1.0 / r)
        key = (abs(t - threshold), t > threshold)
        if best is None or key < best[0]:
            best = (key, b, r)
    return best[1], best[2]


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    delim: str = "\n",
) -> DataFrame:
    """Boilerplate-line removal (line-level dedup as in RefinedWeb /
    CCNet corpus prep): any line occurring in >= `min_docs` DISTINCT
    documents is dropped from every document, and the surviving lines
    are reassembled in their original order.  Output: one row per input
    document — (id, text, n_kept, n_removed), text == '' when every
    line was boilerplate.

    Scale shape (100 TB): the document-frequency count never shuffles
    line CONTENT — each line folds to a 16-byte md5 fingerprint first,
    so that groupBy carries (fp, id) pairs only.  The boilerplate set
    (df >= min_docs) is tiny relative to the corpus (headers, footers,
    nav chrome), so AQE turns the marking join into a broadcast; the
    one full-text shuffle is the final reassembly groupBy(id), which
    any pass that rewrites documents must pay.  Line order is restored
    by array_sort on (pos, line) structs — no window, no single
    partition anywhere.
    """
    import re as _re

    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(delim), -1)
        ).alias("_pos", "_line"),
    ).withColumn("_fp", F.md5(F.col("_line")))

    boiler = (
        lines.groupBy("_fp")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= int(min_docs))
        .select("_fp", F.lit(True).alias("_is_b"))
    )

    # self-join lineage: alias both sides so the analyzer cannot
    # conflate the shared parent's attributes
    flagged = (
        lines.alias("L")
        .join(boiler.alias("B"), F.col("L._fp") == F.col("B._fp"), "left")
        .select("L._id", "L._pos", "L._line", "B._is_b")
    )
    kept = F.when(F.col("_is_b").isNull(), F.struct("_pos", "_line"))
    return (
        flagged.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda x: x["_line"]
                ),
                delim,
            ).alias("text"),
            F.count(kept).alias("n_kept"),
            F.count(F.when(F.col("_is_b"), 1)).alias("n_removed"),
        )
        .select(F.col("_id").alias(id_col), "text", "n_kept", "n_removed")
    )


def cross_lsh_candidates(
    left_sig: DataFrame,
    right_sig: DataFrame,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_side: "int | None" = 200,
) -> DataFrame:
    """Cross-CORPUS banded LSH: candidate pairs between two signature
    tables (new crawl vs existing corpus, eval set vs training set) —
    the asymmetric sibling of minhash_lsh_candidates.  A left doc and
    a right doc sharing any band bucket become a candidate.

    Output: (left_id, right_id, n_bands_matched).  Ids may collide
    across tables — the columns keep the sides apart.

    Scale shape: both sides band with the SAME band_hashes expression
    (zero-shuffle projections), union tagged, ONE shuffle on
    (band, bh); pairs generate INSIDE each bucket as a projection over
    the two collected id lists (left x right, never left x left), with
    max_bucket_side capping EACH side's bucket independently — a hot
    band value on either side drops deterministically, same contract
    as the self-join cap."""
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes "
            f"({num_hashes}); see lsh_params()"
        )
    rows_per_band = num_hashes // bands

    def banded(sig_df, side):
        return sig_df.select(
            F.col(id_col).alias("_id"),
            F.lit(side).alias("_side"),
            F.posexplode(
                band_hashes(F.col("sig"), bands, rows_per_band)
            ).alias("band", "bh"),
        )

    both = banded(left_sig, 0).unionByName(banded(right_sig, 1))
    buckets = both.groupBy("band", "bh").agg(
        F.collect_list(
            F.when(F.col("_side") == 0, F.col("_id"))
        ).alias("_l"),
        F.collect_list(
            F.when(F.col("_side") == 1, F.col("_id"))
        ).alias("_r"),
    )
    keep = (F.size("_l") >= 1) & (F.size("_r") >= 1)
    if max_bucket_side is not None:
        keep = (
            keep
            & (F.size("_l") <= max_bucket_side)
            & (F.size("_r") <= max_bucket_side)
        )
    pair_array = F.flatten(
        F.transform(
            F.col("_l"),
            lambda x: F.transform(
                F.col("_r"),
                lambda y: F.struct(
                    x.alias("left_id"), y.alias("right_id")
                ),
            ),
        )
    )
    return (
        buckets.filter(keep)
        .select(F.explode(pair_array).alias("p"))
        .groupBy(
            F.col("p.left_id").alias("left_id"),
            F.col("p.right_id").alias("right_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )


def cross_dedup_pairs(
    left_df: DataFrame,
    right_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    n: int = 3,
    bands: int = 16,
    hash_fn: str = "xxhash64",
    max_bucket_side: "int | None" = 200,
) -> DataFrame:
    """One-call cross-corpus near-dup candidates: minhash signatures
    for both inputs (zero-shuffle projections) -> cross-table banded
    LSH.  The dedup-new-crawl-against-existing-corpus primitive; feed
    the pairs to an exact-Jaccard verify or straight to a left anti
    join to drop flagged left docs."""
    ls = minhash_signatures(
        left_df, id_col, text_col, num_hashes, n, hash_fn=hash_fn
    )
    rs = minhash_signatures(
        right_df, id_col, text_col, num_hashes, n, hash_fn=hash_fn
    )
    return cross_lsh_candidates(
        ls, rs, id_col, num_hashes, bands, max_bucket_side
    )
