"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline.  The dot product runs
    JVM-side via zip_with/aggregate (whole-stage codegen); the query side
    is broadcast so the big side never shuffles.
  * IVF (inverted-file) top-k — the 100 TB path: vectors are bucketed to
    their nearest of C centroids once (vectorized numpy inside a pandas
    UDF — one Arrow pass), queries probe only the closest `nprobe`
    buckets, so the per-query work drops from O(N) to O(N * nprobe / C).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .common import duckdb_round
from pyspark.sql.types import IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a, b):
    """Cosine similarity of two array<float/double> columns — built-ins
    only (zip_with + aggregate), runs inside codegen."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    vector table; rank with a per-query window.  Ties break on neighbor
    id for determinism.  Output: (query_id, neighbor_id, rank)."""
    joined = vectors.crossJoin(F.broadcast(queries)).withColumn(
        "sim", cosine_sim(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("sim"),
        )
    )


def _assign_udf(centroids: np.ndarray):
    """Vectorized nearest-centroid assignment (one matmul per Arrow
    batch); centroids are L2-normalized driver-side and broadcast in the
    closure."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cn.T, axis=1).astype(np.int32))

    return assign


def kmeans_refine(
    vectors: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    n_iters: int = 3,
) -> np.ndarray:
    """Distributed Lloyd iterations over the (optionally pre-sampled)
    vector table: assignment is one matmul per Arrow batch; the new
    means come from ONE shuffle of (bucket, dim) partial sums per
    iteration (map-side combined), so per-iter driver traffic is
    O(C x D) regardless of N.  Deterministic: ties in argmax break to
    the lowest bucket.  Empty buckets keep their previous centroid."""
    C, D = centroids.shape
    for _ in range(n_iters):
        assigned = vectors.withColumn(
            "bucket", _assign_udf(centroids)(F.col(vec_col))
        )
        rows = (
            assigned.select(
                "bucket", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("bucket", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums = np.zeros((C, D), dtype=np.float64)
        counts = np.zeros(C, dtype=np.int64)
        for r in rows:
            sums[r["bucket"], r["pos"]] = r["s"]
            counts[r["bucket"]] = r["n"]
        new = centroids.copy()
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = new
    return centroids


def ivf_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: Optional[int] = 16,
    sample_stride: Optional[int] = None,
    kmeans_iters: int = 0,
    train_sample_pct: Optional[int] = None,
) -> tuple[DataFrame, np.ndarray]:
    """Bucket every vector to its nearest centroid.

    n_centroids=None applies the sqrt-N rule: C = clamp(sqrt(N), 16,
    4096), which keeps both the expected bucket size AND the centroid
    count at O(sqrt N) — the balance point for in-bucket all-pairs work
    (embedding_near_dup_pairs) and for the O(C x D) driver traffic in
    kmeans_refine.  A fixed small C at corpus scale makes buckets O(N/C)
    and the in-bucket compare quadratic.

    Centroid init is a deterministic stratified sample of the data
    (stride over ids); `kmeans_iters > 0` refines them with distributed
    Lloyd iterations (kmeans_refine) — at corpus scale pass
    `train_sample_pct` to train on a deterministic hash sample while
    still assigning the FULL table.  Returns (bucketed df, centroids)."""
    total = vectors.count()
    if n_centroids is None:
        n_centroids = int(min(max(total ** 0.5, 16), 4096))
    stride = sample_stride or max(total // n_centroids, 1)
    cents = (
        vectors.filter((F.col(id_col) % stride) == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([r[0] for r in cents], dtype=np.float64)
    if kmeans_iters > 0:
        train = vectors
        if train_sample_pct is not None:
            from .sampling import hash_sample

            train = hash_sample(
                vectors.withColumn("_sk", F.col(id_col).cast("string")),
                "_sk",
                train_sample_pct,
            )
        centroids = kmeans_refine(train, centroids, vec_col, kmeans_iters)
    bucketed = vectors.withColumn(
        "bucket", _assign_udf(centroids)(F.col(vec_col))
    )
    return bucketed, centroids


def ivf_topk(
    bucketed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k probing only the nprobe nearest buckets per query.
    Output: (query_id, neighbor_id, rank, sim)."""
    spark = bucketed.sparkSession
    qrows = queries.collect()
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(cn @ qv))[:nprobe]
        for b in order:
            probe_rows.append((r[query_id_col], int(b), list(r[query_vec_col])))
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, bucket int, {query_vec_col} array<double>"
    )
    joined = bucketed.join(F.broadcast(probes), "bucket").withColumn(
        "sim", cosine_sim(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("sim"),
        )
    )


def _lloyd_local(X: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic plain-L2 Lloyd on a driver-side sample: stride
    init over the (given) row order, argmin ties to the lowest index,
    empty clusters keep their previous centroid."""
    n = X.shape[0]
    k = min(k, n)
    init_idx = (np.arange(k) * max(n // k, 1)) % n
    cents = X[init_idx].astype(np.float64).copy()
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for j in range(k):
            sel = X[a == j]
            if sel.shape[0]:
                cents[j] = sel.mean(axis=0)
    return cents


def pq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    codebook_size: int = 16,
    train_rows: int = 4096,
    iters: int = 8,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the dimension
    into m subspaces, k-means each on a deterministic stride sample.

    -> ndarray (m, codebook_size, d/m).  The sample is driver-side
    (train_rows vectors) — PQ codebooks are tiny (m*ks*dsub floats)
    and training needs only a representative sample; encoding and
    search stay fully distributed."""
    total = vectors.count()
    if total == 0:
        raise ValueError("cannot train PQ on an empty vector table")
    stride = max(total // train_rows, 1)
    rows = (
        vectors.filter((F.col(id_col) % stride) == 0)
        .orderBy(id_col)
        .limit(train_rows)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack(
        [
            _lloyd_local(X[:, j * dsub:(j + 1) * dsub], codebook_size, iters)
            for j in range(m)
        ]
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes array<int>): each vector compressed to m codebook
    indices (m bytes at ks<=256 vs 4*d float bytes — the 100 TB
    memory story: a billion 768-dim float32 vectors are 3 TB raw but
    ~16-64 GB as PQ codes, broadcastable shard by shard).

    One vectorized matmul-free argmin per Arrow batch per subspace;
    codebooks ride the closure (tiny)."""
    mm, ks, dsub = codebooks.shape
    cb = codebooks.astype(np.float64)
    cb_sq = (cb ** 2).sum(axis=2)  # (m, ks)

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            codes = np.empty((X.shape[0], mm), dtype=np.int32)
            for j in range(mm):
                sub = X[:, j * dsub:(j + 1) * dsub]
                # ||x-c||^2 = ||c||^2 - 2 x.c (+ ||x||^2, constant per row)
                d = cb_sq[j][None, :] - 2.0 * (sub @ cb[j].T)
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {"_id": pdf["_id"], "codes": list(codes)}
            )

    out = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).mapInPandas(encode, schema="_id long, codes array<int>")
    return out.withColumnRenamed("_id", id_col)


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes an (m, ks) lookup table of exact subspace distances,
    every code row then scores with m table lookups — no float vector
    is ever touched again.

    Output: (query_id, neighbor_id, rank, adist) — adist is the
    approximate squared L2 distance.  Scale shape: queries + LUTs ride
    the closure (broadcast); each partition emits only its LOCAL top-k
    per query, so the final exact rank sorts P*k*|Q| candidate rows,
    never the corpus."""
    mm, ks, dsub = codebooks.shape
    cb = codebooks.astype(np.float64)
    qrows = queries.collect()
    luts = []  # (query_id, (m, ks) LUT)
    for r in qrows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        lut = np.stack(
            [
                ((cb[j] - qv[j * dsub:(j + 1) * dsub][None, :]) ** 2).sum(
                    axis=1
                )
                for j in range(mm)
            ]
        )
        luts.append((r[query_id_col], lut))

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_d = [], [], []
            for qid, lut in luts:
                d = lut[np.arange(mm)[None, :], C].sum(axis=1)
                # local cut in the SAME (adist, id) total order the
                # global rank uses: every global top-k row then
                # survives its partition cut under any layout
                top = np.lexsort((ids, d))[:k]
                out_q += [qid] * len(top)
                out_i += list(ids[top])
                out_d += list(d[top])
            yield pd.DataFrame(
                {
                    query_id_col: out_q,
                    "neighbor_id": out_i,
                    "adist": out_d,
                }
            )

    cand = codes.mapInPandas(
        score,
        schema=f"{query_id_col} long, neighbor_id long, adist double",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "adist")
    )


def _spherical_kmeans_local(
    X: np.ndarray, k: int, iters: int = 10
) -> np.ndarray:
    """Driver-side spherical k-means on a (small, sampled) matrix —
    trains the sub-centroids for hot-bucket re-splitting.  Plain
    nearest-of-sampled-rows concentrates on the most-central sample in
    a tight directional blob (one sub-bucket swallows the mass); Lloyd
    iterations spread the centroids over the blob.  Deterministic:
    init is the first k rows, argmax ties break low."""
    Xn = X / np.maximum(
        np.linalg.norm(X, axis=1, keepdims=True), 1e-12
    )
    C = Xn[:k].copy()
    for _ in range(iters):
        a = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            m = Xn[a == j]
            if len(m):
                mu = m.mean(axis=0)
                C[j] = mu / max(np.linalg.norm(mu), 1e-12)
    return C


def _sub_assign_udf(sub_cents: "dict[int, np.ndarray]"):
    """Per-bucket nearest-sub-centroid assignment for hot-bucket
    re-splitting: rows whose bucket has no sub-centroids keep sub=0.
    Vectorized per (Arrow batch x hot bucket) — one matmul per group."""

    @F.pandas_udf(IntegerType())
    def assign(buckets: pd.Series, vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(buckets), dtype=np.int32)
        for b in buckets.unique():
            cn = sub_cents.get(int(b))
            if cn is None:
                continue
            idx = (buckets == b).to_numpy()
            m = np.stack(vecs[idx].to_numpy())
            m = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12
            )
            out[idx] = np.argmax(m @ cn.T, axis=1).astype(np.int32)
        return pd.Series(out)

    return assign


def embedding_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: Optional[int] = None,
    min_sim: float = 0.95,
    max_bucket_size: Optional[int] = 2000,
    method: str = "ivf",
    srp_bits: int = 64,
    srp_max_hamming: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by IVF centroid,
    compare only within buckets (plus nothing across — recall/cost
    trade-off documented), keep pairs with cosine >= min_sim.

    method="srp" routes through the signature path instead: SRP-LSH
    banded candidate pairs (srp_near_pairs — an 8-byte signature is
    all that shuffles) verified with exact cosine on the CANDIDATE
    pairs only.  Choose it when vectors are too wide/numerous for the
    IVF in-bucket all-pairs even after re-splitting — signature recall
    follows the SRP hamming curve (bits * angle/pi vs srp_max_hamming)
    rather than centroid-bucket co-membership.

    Scale shape: n_centroids defaults to the sqrt-N rule (ivf_index),
    so the EXPECTED bucket is O(sqrt N); max_bucket_size then bounds
    the worst case — embedding spaces are skewed and one dense centroid
    can attract most of a corpus, turning the in-bucket all-pairs join
    O(N^2/C).  Oversized buckets get ONE extra split level: sub-
    centroids are stride-sampled from inside each hot bucket (a single
    broadcast-joined hash-sample job for ALL hot buckets, driver
    traffic O(sub_k) rows per bucket) and rows re-assigned by a
    vectorized per-bucket matmul; the pair join then keys on
    (bucket, sub).  A bucket still oversized after re-splitting is a
    degenerate mass of (near-)identical vectors — its OUTPUT is
    inherently quadratic, so it is kept (correctness) but warned about:
    run exact dedup first.  max_bucket_size=None restores the plain
    one-level bucketing."""
    if method == "srp":
        cands = srp_near_pairs(
            vectors, id_col, vec_col, bits=srp_bits,
            max_hamming=srp_max_hamming,
            max_bucket_size=max_bucket_size,
        ).select("id_a", "id_b")
        va = vectors.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        vb = vectors.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        return (
            cands.join(va, "id_a").join(vb, "id_b")
            .withColumn("sim", cosine_sim(F.col("va"), F.col("vb")))
            .filter(F.col("sim") >= min_sim)
            .select("id_a", "id_b", "sim")
        )
    if method != "ivf":
        raise ValueError(f"method must be ivf|srp: {method}")
    bucketed, cents = ivf_index(vectors, id_col, vec_col, n_centroids)
    key = ["bucket"]
    cached = None
    if max_bucket_size is not None:
        # the capped path reads the bucketed table several times (size
        # census, hot-bucket sample, residual check) — persist so the
        # assignment UDF runs once across those eager passes.  The
        # handle is kept and unpersisted after the LAST eager action:
        # leaving it cached would leak a full copy of the vector corpus
        # into executor storage per call (the returned plan is lazy and
        # outlives this function).  The final pair join then recomputes
        # the assignment once per side — the same cost the uncapped
        # path always paid.
        cached = bucketed = bucketed.persist()
        sizes = {
            r["bucket"]: r["n"]
            for r in bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        hot = {
            b: n for b, n in sizes.items() if n > max_bucket_size
        }
        if hot:
            spark = vectors.sparkSession
            # one sampling job for every hot bucket: per-bucket modulus
            # K targets ~8x the sub-centroid count, broadcast as a tiny
            # (bucket, K) dim table
            plan = []
            for b, nsz in hot.items():
                # 8x headroom over ceil(n/cap): nearest-centroid
                # assignment inside a dense blob is uneven, so the
                # average sub-bucket must sit well under the cap
                sub_k = min(max(-(-nsz // max_bucket_size) * 8, 2), 256)
                plan.append(
                    (int(b), int(sub_k), max(nsz // (sub_k * 8), 1))
                )
            plandf = spark.createDataFrame(
                plan, "bucket int, sub_k int, modk long"
            )
            samp = (
                bucketed.join(F.broadcast(plandf), "bucket")
                .filter(
                    F.pmod(
                        F.xxhash64(F.col(id_col).cast("string")),
                        F.col("modk"),
                    )
                    == 0
                )
                .select("bucket", id_col, vec_col)
                .collect()
            )
            by_bucket: dict[int, list] = {}
            for r in samp:
                by_bucket.setdefault(r["bucket"], []).append(
                    (r[id_col], r[vec_col])
                )
            sub_cents = {}
            for b, sub_k, _ in plan:
                rows = sorted(by_bucket.get(b, []))
                if len(rows) >= 2:
                    # train on the FULL sample (~8x sub_k rows), not
                    # just the first sub_k: Lloyd on the sample spreads
                    # the sub-centroids over the blob (nearest-of-raw-
                    # samples concentrates on the most central one)
                    sub_cents[b] = _spherical_kmeans_local(
                        np.array(
                            [v for _, v in rows], dtype=np.float64
                        ),
                        min(sub_k, len(rows)),
                    )
            bucketed = bucketed.withColumn(
                "sub",
                _sub_assign_udf(sub_cents)(
                    F.col("bucket"), F.col(vec_col)
                ),
            )
            key = ["bucket", "sub"]
            residual = (
                bucketed.groupBy(*key)
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > max_bucket_size)
                .count()
            )
            if residual:
                import warnings

                warnings.warn(
                    f"{residual} bucket(s) remain over "
                    f"max_bucket_size={max_bucket_size} after "
                    "re-splitting (degenerate near-identical mass); "
                    "their pair output is inherently quadratic — run "
                    "exact dedup first",
                    RuntimeWarning,
                    stacklevel=2,
                )
        if cached is not None:
            cached.unpersist()
    a = bucketed.select(
        *key,
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = bucketed.select(
        *key,
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    return (
        a.join(b, key)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_sim(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= min_sim)
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float = 0.95,
    **pair_kwargs,
) -> DataFrame:
    """SemDeDup-style semantic deduplication ACTION (Abbas et al. 2023,
    arXiv:2303.09540): turn embedding-cosine near-duplicate PAIRS into a
    keep/drop decision for every row — connected components over the
    pair graph, one representative (the min id) kept per component.

    -> (id_col, component, is_rep) for EVERY input row: rows touching
    no pair are singleton components of themselves (is_rep true);
    filtering on is_rep is the dedup, grouping on component is the
    cluster view.

    Scale shape: pair generation is the bucketed/capped
    embedding_near_dup_pairs (pass method/n_centroids/max_bucket_size
    through **pair_kwargs); connected_components runs on (id, id) pairs
    only — O(log diameter) rounds of hash joins, vectors never enter
    the iteration; the final membership join is one left join of the id
    projection against the label table."""
    from honas_spark.operators.dedup import connected_components

    pairs = embedding_near_dup_pairs(
        vectors, id_col, vec_col, min_sim=min_sim, **pair_kwargs
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    base = vectors.select(F.col(id_col))
    merged = F.coalesce(F.col("component"), F.col(id_col))
    return base.join(
        comp, base[id_col] == comp["node"], "left"
    ).select(
        id_col,
        merged.alias("component"),
        (merged == F.col(id_col)).alias("is_rep"),
    )


def srp_planes(bits: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic integer random-hyperplane matrix for SRP-LSH:
    standard normals from a seeded RNG, scaled and rounded to integers
    in roughly [-300, 300] so every engine computes the same dot-product
    SIGN in exact arithmetic (no float-summation-order ambiguity)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((bits, dim)) * 100).astype(
        np.int64
    )


def srp_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    dim: "int | None" = None,
    seed: int = 42,
    scale: int = 1000,
) -> DataFrame:
    """Signed-random-projection (SRP / random-hyperplane) LSH signature
    for COSINE similarity (Charikar 2002's simhash-for-vectors): bit p
    = sign(<v, plane_p>); the expected Hamming distance between two
    signatures is bits * angle/pi, so banding the signature (reuse
    simhash_near_pairs) finds angular near-neighbors without any
    vector ever shuffling — the scale path that complements the IVF
    bucketing in embedding_near_dup_pairs.

    QUANTIZED on purpose: the vector is rounded to integers
    (round(x * scale)) and the planes are integer-valued
    (`srp_planes`), so the dot product is exact integer math and a SQL
    oracle recomputes the identical signature — no cross-engine
    float-summation-order hazard.  Quantization can only flip bits for
    vectors nearly orthogonal to a plane (|<v,p>| < dim/scale-ish),
    which perturbs Hamming distances by at most those boundary bits.

    Output: (id, srp long) — one codegen projection, zero shuffle."""
    if not 1 <= bits <= 64:
        # plane 63 maps to the two's-complement sign bit; more planes
        # would alias onto it (and their sum overflows under ANSI mode)
        raise ValueError(f"bits must be in [1, 64]: {bits}")
    if dim is None:
        row = df.select(F.size(F.col(vec_col))).first()
        if row is None:
            raise ValueError(
                "cannot infer dim from an empty DataFrame; pass dim="
            )
        dim = row[0]
    planes = srp_planes(bits, dim, seed)
    q = F.transform(
        F.col(vec_col),
        lambda x: duckdb_round(x * scale, 0).cast("long"),
    )
    base = df.select(F.col(id_col), q.alias("_q"))
    terms = []
    for p in range(bits):
        plane = F.array(*[F.lit(int(w)) for w in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col("_q"), plane, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        val = (1 << p) if p < 63 else -(1 << 63)
        terms.append(
            F.when(dot > 0, F.lit(val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = terms[0]
    for t in terms[1:]:
        sig = sig + t
    return base.select(F.col(id_col), sig.alias("srp"))


def srp_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 64,
    max_hamming: int = 8,
    bands: int = 4,
    max_bucket_size: "int | None" = 200,
    seed: int = 42,
    scale: int = 1000,
) -> DataFrame:
    """Angular (cosine) near-neighbor candidate pairs at corpus scale:
    SRP signatures + the capped simhash banding — the path the
    srp_signatures docstring routes scale users to, with the hot-bucket
    cap threaded through (an uncapped 16-bit band self-join goes
    quadratic past ~10^8 docs; see simhash_near_pairs).

    Output: (id_a, id_b, hamming) — expected hamming tracks
    bits * angle/pi, so filter/verify downstream with exact cosine on
    the candidate pairs only.  Vectors themselves never shuffle: only
    the 8-byte signature enters the banding exchange."""
    from .dedup import simhash_near_pairs

    sig = srp_signatures(df, id_col, vec_col, bits, seed=seed,
                         scale=scale)
    return simhash_near_pairs(
        sig, id_col, max_hamming=max_hamming, bands=bands,
        max_bucket_size=max_bucket_size, sim_col="srp", bits=bits,
    )
