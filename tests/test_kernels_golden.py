"""Golden-vector ports of the reference unit tests (bit-exact).

Sources: tests/bloom.c:93-137 (offset vectors), tests/byte_slice.c:259-305
(big-int multiply), tests/bloom.c:257-298 (approx count),
tests/combinations.c:63-107 (unranking tables)."""

import struct

import numpy as np
import pytest

from honas_spark import kernels as K

GOLDEN_OFFSETS = [
    (0xDEADBEEF, 1, 2, [6, 7]),
    (0xDEADBEEF, 1024, 2, [5883, 7125]),
    (0xDEADBEEF, 1024, 3, [243, 5883, 7125]),
    (0xDEADBEEF, 8192, 2, [48879, 57005]),
    (0x99C0FFEE, 1, 2, [4, 6]),
    (0x99C0FFEE, 1024, 2, [1023, 4920]),
    (0x99C0FFEE, 1024, 6, [79, 1023, 1910, 4920, 4941, 7705]),
    (0x99C0FFEE, 8192, 2, [39360, 65518]),
    (10, 1024, 3, [0, 1, 1281]),
    (42, 1024, 3, [0, 1, 5376]),
    (0, 1024, 3, [0, 1, 2]),
    (0xFFFFFFFF, 1024, 3, [8189, 8190, 8191]),
]


@pytest.mark.parametrize("val,fb,k,expected", GOLDEN_OFFSETS)
def test_bloom_offsets_golden(val, fb, k, expected):
    limbs = K.hashes_to_limbs([struct.pack("<I", val)], hash_len=4)
    got = K.bloom_offsets(limbs, fb * 8, k)[0].tolist()
    assert got == expected


def test_bloom_offsets_batch_equals_single():
    """Vectorized batch must agree element-wise with per-row calls."""
    vals = [v for v, *_ in GOLDEN_OFFSETS]
    limbs = K.hashes_to_limbs([struct.pack("<I", v) for v in vals], 4)
    batch = K.bloom_offsets(limbs, 1024 * 8, 3)
    for i, v in enumerate(vals):
        single = K.bloom_offsets(
            K.hashes_to_limbs([struct.pack("<I", v)], 4), 1024 * 8, 3
        )[0]
        assert batch[i].tolist() == single.tolist()


def test_bigint_multiply_golden():
    """tests/byte_slice.c:259-305 — ×3 four times with exact overflows."""
    a = np.frombuffer(
        bytes([1, 2, 3, 4, 2, 3, 4, 5, 3, 4, 5, 6, 6, 7, 8, 9]), dtype="<u4"
    ).reshape(1, 4).astype(np.uint32)
    expected_overflows = [0, 0, 0, 2]
    expected_final = bytes(
        [81, 162, 243, 68, 163, 243, 68, 150, 244, 68, 150, 231, 231, 56, 138, 219]
    )
    limbs = a.copy()
    for exp_of in expected_overflows:
        carry = np.zeros(1, np.uint64)
        for li in range(4):
            t = limbs[:, li].astype(np.uint64) * np.uint64(3) + carry
            limbs[:, li] = (t & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            carry = t >> np.uint64(32)
        assert int(carry[0]) == exp_of
    assert limbs.view(np.uint8).tobytes() == expected_final


def test_offsets_distinct_and_sorted():
    rng = np.random.default_rng(42)
    hashes = [rng.bytes(32) for _ in range(500)]
    offs = K.bloom_offsets(K.hashes_to_limbs(hashes, 32), 1 << 17, 10)
    assert (np.diff(offs, axis=1) > 0).all(), "k offsets must be distinct+sorted"
    assert offs.min() >= 0 and offs.max() < (1 << 17)


def test_bloom_set_probe_roundtrip():
    rng = np.random.default_rng(1)
    members = [rng.bytes(32) for _ in range(200)]
    others = [rng.bytes(32) for _ in range(200)]
    filt = K.bloom_zero(1 << 16)
    offs = K.bloom_offsets(K.hashes_to_limbs(members, 32), 1 << 16, 10)
    K.bloom_build(filt, offs)
    assert K.bloom_probe(
        filt, K.bloom_offsets(K.hashes_to_limbs(members, 32), 1 << 16, 10)
    ).all()
    fp = K.bloom_probe(
        filt, K.bloom_offsets(K.hashes_to_limbs(others, 32), 1 << 16, 10)
    ).sum()
    assert fp == 0  # FPR ~ 1e-12 here


def test_bloom_build_small_and_large_paths_agree():
    """or.at path (<=4096 bits) vs bincount+packbits path must be identical."""
    rng = np.random.default_rng(7)
    offs = rng.integers(0, 1 << 14, size=(3000, 2)).astype(np.int64)
    f1, f2 = K.bloom_zero(1 << 14), K.bloom_zero(1 << 14)
    K.bloom_build(f1, offs)  # large path
    for row in offs:  # small path, row at a time
        K.bloom_build(f2, row.reshape(1, -1))
    assert np.array_equal(f1, f2)


def test_approx_count_golden():
    assert K.bloom_approx_count(1024 * 8, 3, 512) == 176
    assert K.bloom_approx_count(8, 1, 8) == 0xFFFFFFFF


def test_combination_tables_golden():
    assert K.combination_table(4, 2).tolist() == [
        [0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3],
    ]
    assert K.combination_table(5, 3).tolist() == [
        [0, 1, 2], [0, 1, 3], [0, 1, 4], [0, 2, 3], [0, 2, 4],
        [0, 3, 4], [1, 2, 3], [1, 2, 4], [1, 3, 4], [2, 3, 4],
    ]
    assert K.number_of_combinations(4, 2) == 6
    assert K.number_of_combinations(5, 3) == 10


def test_murmur64a_known_properties():
    # deterministic, seed- and length-sensitive
    assert K.murmur64a(b"hello") == K.murmur64a(b"hello")
    assert K.murmur64a(b"hello") != K.murmur64a(b"hello", seed=1)
    assert K.murmur64a(b"hello") != K.murmur64a(b"hello!")
    assert K.murmur64a(b"") != K.murmur64a(b"\x00")
    # tail handling: all lengths 0..16 distinct outputs
    outs = {K.murmur64a(bytes(range(n))) for n in range(17)}
    assert len(outs) == 17


def test_murmur64a_np_matches_scalar():
    """The vectorized numpy MurmurHash64A must be bit-exact with the
    scalar reference implementation over every tail length, mixed lengths
    in one batch, empty input, and a custom seed."""
    rng = np.random.default_rng(11)
    datas = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8)) for n in range(33)]
    datas += [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8))
              for n in rng.integers(0, 100, size=500)]
    for seed in (K.MURMUR_SEED, 0, 1, 0xFFFFFFFF):
        vec = K.murmur64a_np(datas, seed)
        sca = np.array([K.murmur64a(d, seed) for d in datas], dtype=np.uint64)
        assert (vec == sca).all()
    assert K.murmur64a_np([]).shape == (0,)


def test_murmur64a_series_high_cardinality_no_scalar_path():
    """1M-unique analog (downscaled): murmur64a_series must stay fully
    vectorized and agree with the scalar hash at any cardinality."""
    vals = [f"client-{i}" for i in range(50_000)]  # all unique
    out = K.murmur64a_series(vals)
    idx = [0, 1, 4999, 25_000, 49_999]
    for i in idx:
        assert out[i] == K.murmur64a(vals[i].encode("utf-8"))
    # null handling matches the old per-unique map (str() of the value)
    out2 = K.murmur64a_series(["a", None, "a"])
    assert out2[0] == out2[2] == K.murmur64a(b"a")
    assert out2[1] == K.murmur64a(b"None")


def test_transform_limbs_matches_reference_semantics():
    """filter_index_host_name_hash_transform (honas_state.c:231-244):
    each 64-bit lane multiplied by 2i+1 mod 2^64."""
    rng = np.random.default_rng(3)
    h = rng.bytes(32)
    limbs = K.hashes_to_limbs([h], 32)
    out = K.transform_limbs(limbs, 3)
    lanes = np.frombuffer(h, dtype="<u8")
    expected = (lanes * np.uint64(7)).view("<u4")
    assert np.array_equal(out[0], expected)
    assert np.array_equal(K.transform_limbs(limbs, 0), limbs)


def test_sizing_formulas():
    # advice.c anchors: n=2578756/h at p=1e-3 -> m ~ 37.08e6 bits, k=10
    m = K.bloom_filter_size(1e-3, 2578756)
    assert 36_000_000 < m < 38_500_000
    assert K.optimal_k(2578756, 40_810_000) in (10, 11)
    assert K.fpr_theory(10, 0, 1 << 20) == 0.0
    assert 0 < K.fpr_theory(10, 100_000, 1 << 20) < 1
    assert K.required_entropy_ok(1 << 20, 10, 256)
    assert not K.required_entropy_ok(1 << 30, 10, 256)


def test_bloom_offsets_chunking_is_invisible():
    """The cache-blocked path must produce byte-identical offsets across
    the chunk boundary (rows are independent by construction)."""
    rng = np.random.default_rng(5)
    hashes = [rng.bytes(32) for _ in range(5000)]  # crosses the 4096 chunk
    limbs = K.hashes_to_limbs(hashes, 32)
    chunked = K.bloom_offsets(limbs, 1 << 20, 10)
    whole = K._bloom_offsets_block(limbs, 1 << 20, 10)
    assert np.array_equal(chunked, whole)
