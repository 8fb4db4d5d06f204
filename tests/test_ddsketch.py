"""DDSketch sibling (kernels.DDSketch): the published relative-error
guarantee, exact merge associativity (byte-identical state under any
merge ordering — the Bloom/CMS bitset-equality property, which
KLL/t-digest cannot give), lowest-bucket collapsing, serialization,
and the ddsketch_agg operator's plan shape."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from honas_spark import kernels as K


def _fill(alpha, data, chunks=7, max_buckets=2048):
    sk = K.DDSketch(alpha, max_buckets)
    for c in np.array_split(np.asarray(data, dtype=np.float64), chunks):
        sk.add(c)
    return sk


def test_relative_error_bound():
    """|est - true| / true <= alpha at EVERY quantile — the guarantee
    that distinguishes DDSketch from rank-error sketches."""
    rng = np.random.default_rng(41)
    for alpha in (0.01, 0.05):
        data = np.concatenate([
            rng.lognormal(3.0, 2.0, size=40_000),
            rng.uniform(0.001, 5.0, size=10_000),
        ])
        sk = _fill(alpha, data)
        srt = np.sort(data)
        for q in (0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
            rank = int(np.floor(q * (data.size - 1))) + 1
            true = srt[rank - 1]
            est = sk.quantile(q)
            assert abs(est - true) / true <= alpha + 1e-12, (alpha, q)


def test_merge_bitwise_associative():
    """Merged state is byte-identical regardless of merge order or how
    the input was partitioned (no collapse at this size)."""
    rng = np.random.default_rng(42)
    data = rng.lognormal(2.0, 1.5, size=30_000)
    parts = np.array_split(data, 6)
    sks = [_fill(0.01, p, chunks=1) for p in parts]

    left = sks[0]
    for s in sks[1:]:
        left = left.merge(s)
    right = sks[-1]
    for s in reversed(sks[:-1]):
        right = right.merge(s)
    # tree order
    pair = [sks[0].merge(sks[1]), sks[2].merge(sks[3]), sks[4].merge(sks[5])]
    tree = pair[0].merge(pair[1]).merge(pair[2])
    whole = _fill(0.01, data, chunks=1)

    assert left.to_bytes() == right.to_bytes() == tree.to_bytes()
    assert left.to_bytes() == whole.to_bytes()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1e-6, max_value=1e12, allow_nan=False),
        min_size=1, max_size=300,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_merge_equals_whole_property(values, nparts):
    """Any partition of any input multiset merges to the same state as
    one sketch over the whole input."""
    arr = np.array(values, dtype=np.float64)
    parts = np.array_split(arr, nparts)
    merged = None
    for p in parts:
        s = K.DDSketch(0.02)
        s.add(p)
        merged = s if merged is None else merged.merge(s)
    whole = K.DDSketch(0.02)
    whole.add(arr)
    assert merged.to_bytes() == whole.to_bytes()


def test_collapse_bounds_memory_keeps_upper_quantiles():
    rng = np.random.default_rng(43)
    # 12 decades of range -> far more than 64 buckets at alpha=0.05
    data = 10.0 ** rng.uniform(-6, 6, size=50_000)
    sk = _fill(0.05, data, max_buckets=64)
    assert sk.keys.size <= 64
    assert sk.n == data.size
    srt = np.sort(data)
    # upper quantiles stay inside the bound despite collapsed low end
    for q in (0.9, 0.99, 1.0):
        rank = int(np.floor(q * (data.size - 1))) + 1
        true = srt[rank - 1]
        assert abs(sk.quantile(q) - true) / true <= 0.05 + 1e-12


def test_zero_and_negative_values_ignored():
    sk = K.DDSketch(0.01)
    sk.add(np.array([0.0, -5.0, np.nan, 2.0, 8.0]))
    assert sk.n == 2
    assert abs(sk.quantile(1.0) - 8.0) / 8.0 <= 0.01


def test_serialization_roundtrip():
    sk = _fill(0.01, np.random.default_rng(44).uniform(0.5, 1e6, 10_000))
    back = K.DDSketch.from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    assert back.n == sk.n and back.alpha == sk.alpha
    assert np.array_equal(back.keys, sk.keys)
    assert np.array_equal(back.counts, sk.counts)
    with pytest.raises(AssertionError):
        K.DDSketch.from_bytes(b"\x00" * 32)


def test_empty_sketch():
    sk = K.DDSketch(0.01)
    assert np.isnan(sk.quantile(0.5))
    assert sk.quantile_bucket(0.5) is None
    assert K.DDSketch.from_bytes(sk.to_bytes()).n == 0


def test_ddsketch_agg_matches_local(spark):
    """The distributed two-phase agg equals the single local sketch."""
    from honas_spark.operators.quantiles import ddsketch_agg

    rng = np.random.default_rng(45)
    rows = [
        ("a" if i % 3 else "b", float(v))
        for i, v in enumerate(rng.lognormal(4.0, 1.0, 4000))
    ]
    df = spark.createDataFrame(rows, "grp string, v double").repartition(8)
    out = {
        r["grp"]: r
        for r in ddsketch_agg(df, ["grp"], "v", alpha=0.01).collect()
    }
    for grp in ("a", "b"):
        vals = np.array([v for g, v in rows if g == grp])
        local = K.DDSketch(0.01)
        local.add(vals)
        assert out[grp]["n"] == vals.size
        for q, b, c in ((0.5, "b_50", "q_50"), (0.9, "b_90", "q_90"),
                        (0.99, "b_99", "q_99")):
            assert out[grp][b] == local.quantile_bucket(q)
            assert out[grp][c] == round(local.quantile(q), 4)
