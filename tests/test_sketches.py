"""HLL / CMS / KLL accuracy + merge semantics (pure kernels, no Spark).

Ports the reference's HLL expectations (tests/hyperloglog.c:38-156): exact
small counts, ±10% accuracy to 250k, merge(A, A∪{x}) counts +1."""

import numpy as np

from honas_spark import kernels as K


def _hashes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=n, dtype=np.int64).astype(np.uint64)


def test_hll_exact_small_counts():
    for n in (0, 1, 2, 10):
        regs = K.hll_zero()
        K.hll_add(regs, _hashes(n))
        assert K.hll_count(regs) == n  # LinearCounting exact this small
    regs = K.hll_zero()
    K.hll_add(regs, _hashes(95))
    # 95 values can collide in the 14 index bits: LinearCounting ±3
    assert abs(K.hll_count(regs) - 95) <= 3


def test_hll_accuracy_sweep():
    # tests/hyperloglog.c:136-156 asserts ±10% up to 250k
    for n in (1000, 5000, 50_000, 250_000):
        regs = K.hll_zero()
        K.hll_add(regs, _hashes(n, seed=n))
        est = K.hll_count(regs)
        assert abs(est - n) / n < 0.10, (n, est)


def test_hll_idempotent_adds():
    h = _hashes(1000, seed=9)
    a = K.hll_zero()
    K.hll_add(a, h)
    b = a.copy()
    K.hll_add(b, h)  # re-adding the same values changes nothing
    assert np.array_equal(a, b)


def test_hll_merge_union_plus_one():
    # tests/hyperloglog.c:101-134: count(merge(A, A∪{x})) == count(A)+1
    h = _hashes(500, seed=4)
    a = K.hll_zero()
    K.hll_add(a, h)
    b = a.copy()
    K.hll_add(b, _hashes(1, seed=12345))
    merged = K.hll_merge(a, b)
    assert K.hll_count(merged) == K.hll_count(a) + 1
    assert np.array_equal(K.hll_merge(a, b), K.hll_merge(b, a))


def test_cms_bounds():
    # est >= true always; est <= true + eps*N with eps = e/width
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 200, size=20_000).astype(np.uint64)  # skewed keys
    counts = K.cms_zero(4, 2048)
    K.cms_add(counts, keys)
    uniq, true = np.unique(keys, return_counts=True)
    est = K.cms_query(counts, uniq)
    assert (est >= true).all()
    eps = np.e / 2048
    assert (est <= true + eps * keys.size).all()


def test_cms_merge_is_add():
    k1, k2 = _hashes(5000, 1), _hashes(5000, 2)
    a = K.cms_zero(4, 1024)
    b = K.cms_zero(4, 1024)
    K.cms_add(a, k1)
    K.cms_add(b, k2)
    both = K.cms_zero(4, 1024)
    K.cms_add(both, np.concatenate([k1, k2]))
    assert np.array_equal(K.cms_merge(a, b), both)


def test_kll_rank_error():
    rng = np.random.default_rng(5)
    data = rng.normal(size=100_000)
    sk = K.KLL(200)
    for chunk in np.array_split(data, 20):
        sk.add(chunk)
    srt = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = sk.quantile(q)
        true_rank = np.searchsorted(srt, est) / data.size
        assert abs(true_rank - q) < 0.025, (q, est, true_rank)


def test_kll_merge_preserves_bounds():
    rng = np.random.default_rng(6)
    data = rng.uniform(0, 100, size=60_000)
    parts = np.array_split(data, 6)
    sks = []
    for p in parts:
        s = K.KLL(200)
        s.add(p)
        sks.append(s)
    merged = sks[0]
    for s in sks[1:]:
        merged = merged.merge(s)
    assert merged.n == data.size
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(srt, est) / data.size
        assert abs(true_rank - q) < 0.03


def test_kll_serialization_roundtrip():
    s = K.KLL(128)
    s.add(np.arange(10_000, dtype=np.float64))
    blob = s.to_bytes()
    back = K.KLL.from_bytes(blob)
    assert back.n == s.n
    assert back.quantile(0.5) == s.quantile(0.5)
    assert back.to_bytes() == blob


def test_component_scoped_update_matches_full():
    """components={'cms'} / {'hll'} must produce exactly the same CMS /
    HLL arrays as a full update, leave the other components at their
    merge identity (zeros), and merge cleanly with full states."""
    import hashlib

    import numpy as np
    import pandas as pd

    from honas_spark.spec import SketchSpec
    from honas_spark.state import SketchState

    spec = SketchSpec(m_bits=1 << 14, k=5, num_filters=2,
                      filters_per_user=1, cms_width=256, kll_k=64)
    shas = pd.Series(
        [hashlib.sha256(f"k{i % 40}".encode()).digest() for i in range(200)]
    )
    full = SketchState(spec)
    full.update(shas)
    cms_only = SketchState(spec)
    cms_only.update(shas, components=frozenset({"cms"}))
    hll_only = SketchState(spec)
    hll_only.update(shas, components=frozenset({"hll"}))

    assert np.array_equal(cms_only.cms, full.cms)
    assert not cms_only.filters.any() and not cms_only.hll_items.any()
    assert np.array_equal(hll_only.hll_items, full.hll_items)
    assert np.array_equal(hll_only.hll_clients, full.hll_clients)
    assert not hll_only.cms.any() and not hll_only.filters.any()
    assert cms_only.n_rows == hll_only.n_rows == full.n_rows == 200

    # zero components are merge identities: full ∪ cms_only keeps full's
    # blooms/HLLs and doubles the CMS
    merged = full.merge(cms_only)
    assert np.array_equal(merged.filters, full.filters)
    assert np.array_equal(merged.hll_items, full.hll_items)
    assert np.array_equal(merged.cms, full.cms * 2)


# ------------------------------------------------- bottom-k sample


def test_bottomk_sample_matches_local_model_and_is_mergeable(spark):
    """The md5-family bottom-k distinct sample equals a local model's
    k smallest md5-prefix hashes over the distinct set, under ANY
    partitioning — the merge-invariance that makes it a sketch."""
    import hashlib

    from honas_spark.operators.bottomk import bottomk_sample_agg

    rows = [(f"g{i % 3}", f"v{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v string")

    def local_bottomk(vals, k):
        hs = sorted(
            (int(hashlib.md5(v.encode()).hexdigest()[:15], 16), v)
            for v in set(vals)
        )
        return [v for _, v in hs[:k]]

    expected = {
        g: local_bottomk(
            [v for gg, v in rows if gg == g], 8
        )
        for g in ("g0", "g1", "g2")
    }
    for layout in (df, df.repartition(11), df.coalesce(1)):
        got = {
            r["g"]: (r["sample"], r["n_sample"], r["est_distinct"])
            for r in bottomk_sample_agg(
                layout, ["g"], "v", k=8, hash_fn="md5"
            ).collect()
        }
        for g, want in expected.items():
            assert got[g][0] == want
            assert got[g][1] == 8


def test_bottomk_sample_exact_below_k_and_estimate_band(spark):
    from honas_spark.operators.bottomk import bottomk_sample_agg

    # 5 distinct values, k=16 -> the sample IS the distinct set, exact
    small = spark.createDataFrame(
        [("a", str(i % 5)) for i in range(50)], "g string, v string"
    )
    r = bottomk_sample_agg(small, ["g"], "v", k=16).collect()[0]
    assert sorted(r["sample"]) == ["0", "1", "2", "3", "4"]
    assert r["n_sample"] == 5 and r["est_distinct"] == 5
    # 2000 distinct, k=64 -> ~1/sqrt(64) relative error; allow 4 sigma
    big = spark.createDataFrame(
        [("a", str(i)) for i in range(2000)], "g string, v string"
    )
    est = bottomk_sample_agg(big, ["g"], "v", k=64).collect()[0][
        "est_distinct"
    ]
    assert abs(est - 2000) / 2000 < 0.5
    import pytest

    with pytest.raises(ValueError):
        bottomk_sample_agg(small, ["g"], "v", k=1)
    with pytest.raises(ValueError):
        bottomk_sample_agg(small, ["g"], "v", hash_fn="sha1")


# ---------------------------------------------------------------------------
# Count-Sketch F2 (operators/countsketch.py)
# ---------------------------------------------------------------------------


def test_count_sketch_f2_accuracy_and_determinism(spark):
    from honas_spark.operators.countsketch import count_sketch_f2

    # skewed frequency vector per group: F2 is dominated by hot keys
    rows = []
    for gname, mult in (("a", 1), ("b", 3)):
        for key in range(40):
            for _ in range((key % 7 + 1) * mult):
                rows.append((gname, f"k{key}"))
    df = spark.createDataFrame(rows, "g string, v string")
    exact = {}
    from collections import Counter

    for gname, mult in (("a", 1), ("b", 3)):
        c = Counter(
            f"k{k}" for k in range(40) for _ in range((k % 7 + 1) * mult)
        )
        exact[gname] = sum(n * n for n in c.values())

    got = {
        r["g"]: r
        for r in count_sketch_f2(df, ["g"], "v", depth=5, width=512).collect()
    }
    for gname in ("a", "b"):
        est = int(got[gname]["f2_est"])
        assert abs(est - exact[gname]) <= 0.3 * exact[gname], (
            gname, est, exact[gname]
        )
    assert got["a"]["n"] == sum((k % 7 + 1) for k in range(40))

    # deterministic hash family: identical re-run, any partitioning
    again = {
        r["g"]: int(r["f2_est"])
        for r in count_sketch_f2(
            df.repartition(13), ["g"], "v", depth=5, width=512
        ).collect()
    }
    assert again == {g: int(r["f2_est"]) for g, r in got.items()}


def test_count_sketch_f2_merge_is_union(spark):
    """Sketching two halves and summing counters == sketching the
    union: with the deterministic family this means the ESTIMATE from
    the unioned DataFrame equals the estimate from the whole."""
    from honas_spark.operators.countsketch import count_sketch_f2

    rows = [("g", f"k{i % 11}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v string, i int")
    half1 = df.filter("i < 150")
    half2 = df.filter("i >= 150")
    whole = int(count_sketch_f2(df, ["g"], "v").collect()[0]["f2_est"])
    unioned = int(
        count_sketch_f2(half1.union(half2), ["g"], "v")
        .collect()[0]["f2_est"]
    )
    assert whole == unioned


def test_count_sketch_f2_validation(spark):
    import pytest
    from honas_spark.operators.countsketch import count_sketch_f2

    df = spark.createDataFrame([("g", "x")], "g string, v string")
    with pytest.raises(ValueError, match="odd"):
        count_sketch_f2(df, ["g"], "v", depth=4)
    with pytest.raises(ValueError, match="width"):
        count_sketch_f2(df, ["g"], "v", width=1)
    with pytest.raises(ValueError, match="hash_fn"):
        count_sketch_f2(df, ["g"], "v", hash_fn="sha1")


# ---------------------------------------------------------------------------
# Hierarchical rollup (sketch_agg.rollup_hierarchy)
# ---------------------------------------------------------------------------


def test_rollup_hierarchy_bit_equal(spark):
    """Every lattice level must be BIT-IDENTICAL to a direct build at
    that grouping — the merge-associativity guarantee across dims."""
    from honas_spark import SketchSpec
    from honas_spark.operators import (
        build_sketches, rollup_hierarchy, sha256_key, with_window,
    )
    from honas_spark.sources.corpus import generate_corpus

    spec = SketchSpec(m_bits=1 << 12, k=4, cms_width=64, kll_k=32,
                      window="1 hour")
    corpus = generate_corpus(spark, 2000, n_hours=3)
    keyed = with_window(
        sha256_key(corpus, "path"), "commit_ts", "1 hour"
    )
    leaf = build_sketches(
        keyed, spec, group_cols=["window_start", "lang"],
        ts_col="commit_ts",
    )
    cube = rollup_hierarchy(
        leaf, spec, ["window_start", "lang"],
        sets=[("window_start", "lang"), ("window_start",), ("lang",), ()],
    ).collect()
    by_gid = {}
    for r in cube:
        by_gid.setdefault(r["gid"], []).append(r)

    def direct(cols):
        if not cols:
            from pyspark.sql import functions as F

            # build_sketches needs >= 1 group col; a constant gives the
            # global cell
            src = keyed.withColumn("_one", F.lit(1))
            return build_sketches(
                src, spec, group_cols=["_one"], ts_col="commit_ts"
            ).collect()
        return build_sketches(
            keyed, spec, group_cols=cols, ts_col="commit_ts"
        ).collect()

    def key_of(r, cols):
        return tuple(r[c] for c in cols)

    checks = [(0, ["window_start", "lang"]), (1, ["window_start"]),
              (2, ["lang"]), (3, [])]
    for gid, cols in checks:
        want = {key_of(r, cols): r for r in direct(cols)}
        got = {key_of(r, cols): r for r in by_gid[gid]}
        assert set(got) == set(want), (gid, set(got) ^ set(want))
        for k in want:
            for fld in ("filters", "hll_clients", "hll_items", "cms",
                        "kll", "n_rows", "first_ts", "last_ts"):
                assert got[k][fld] == want[k][fld], (gid, k, fld)
    # NULLed dims on aggregated levels
    assert all(r["lang"] is None for r in by_gid[1])
    assert all(r["window_start"] is None for r in by_gid[2])


def test_rollup_hierarchy_validation(spark):
    import pytest
    from honas_spark import SketchSpec
    from honas_spark.operators import rollup_hierarchy

    spec = SketchSpec(m_bits=1 << 10, k=3)
    df = spark.range(1).selectExpr("CAST(id AS STRING) AS a")
    with pytest.raises(ValueError, match="unknown dims"):
        rollup_hierarchy(df, spec, ["a"], sets=[("b",)])
    with pytest.raises(ValueError, match="duplicate"):
        rollup_hierarchy(df, spec, ["a"], sets=[("a",), ("a",)])
