"""honas .hs state-file interop tests.

`tests/data/reference_golden.hs` was produced by a harness COMPILED FROM
THE REFERENCE SOURCES (honas_state.c + bloom.c + hyperloglog.c ... at
/root/reference) that created a state with F=4, m=65536, k=3, u=2,
registered three hostnames from client 10.0.0.1 at t=1700000100..102 and
persisted it.  The reference binary's own probe results on that file:

    www.example.com/example.com/www/api.test.org/deep.sub.domain.net/
    sub -> hits=2;  never-inserted.example -> hits=0
    est_clients=22 (Quirk Q6 aliasing), est_hostnames=13, n_req=3
    filter_bits_set = [0, 39, 0, 39]

The reference binary was also verified (during development) to load our
EXPORTED file and produce identical output."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from honas_spark import kernels as K
from honas_spark.spec import SketchSpec
from honas_spark.state import SketchState
from honas_spark.sources.hsfile import (
    export_hs_state,
    import_hs_state,
    read_hs_header,
)

GOLDEN = "tests/data/reference_golden.hs"
MEMBERS = [
    "www.example.com", "example.com", "www", "api.test.org",
    "deep.sub.domain.net", "sub",
]
NON_MEMBER = "never-inserted.example"


def _sha(s: str) -> bytes:
    return hashlib.sha256(s.encode()).digest()


def test_import_reproduces_reference_probe_results():
    spec, st, h = import_hs_state(GOLDEN)
    assert spec.num_filters == 4 and spec.m_bits == 65536 and spec.k == 3
    assert h["filter_bits_set"] == [0, 39, 0, 39]
    assert [K.bloom_bits_set(f) for f in st.filters] == [0, 39, 0, 39]
    hits, _ = st.probe([_sha(k) for k in MEMBERS + [NON_MEMBER]])
    assert hits.tolist() == [2] * len(MEMBERS) + [0]
    # header stats reproduce exactly — including the Quirk Q6 client
    # estimate (22 from one client: the HLL aliases filter 3's tail)
    assert K.hll_count(st.hll_clients) == h["estimated_number_of_clients"] == 22
    assert K.hll_count(st.hll_items) == h["estimated_number_of_host_names"] == 13
    assert st.n_rows == 3
    assert int(st.first_ts.timestamp()) == 1700000100
    assert int(st.last_ts.timestamp()) == 1700000102


def test_engine_rebuild_is_bit_exact_vs_reference():
    """Build the SAME state from scratch with our engine (same client,
    same names, honas label semantics) — every filter bitset and the
    hostname HLL must equal the reference-produced file bit for bit."""
    spec, ref, _ = import_hs_state(GOLDEN)
    client_hash = K.murmur64a(bytes([0x0A, 0, 0, 1]))  # 10.0.0.1 wire bytes

    def honas_keys(name):
        labels = name.split(".")
        return list(dict.fromkeys(
            [name] + labels[:-1] + [".".join(labels[-2:])]
        ))

    names = ["www.example.com", "api.test.org", "deep.sub.domain.net"]
    keys = [k for n in names for k in honas_keys(n)]
    mine = SketchState(spec)
    mine.update(
        pd.Series([_sha(k) for k in keys]),
        client_hashes=np.full(len(keys), client_hash, dtype=np.uint64),
    )
    for i in range(spec.num_filters):
        assert np.array_equal(mine.filters[i], ref.filters[i]), f"filter {i}"
    assert np.array_equal(mine.hll_items, ref.hll_items)


def test_export_roundtrip(tmp_path):
    spec, st, h = import_hs_state(GOLDEN)
    out = str(tmp_path / "exported.hs")
    export_hs_state(st, out, h["period_begin"], h["period_end"])
    spec2, st2, h2 = import_hs_state(out)
    assert spec2 == spec
    for a, b in zip(st.filters, st2.filters):
        assert np.array_equal(a, b)
    assert np.array_equal(st.hll_clients, st2.hll_clients)
    assert np.array_equal(st.hll_items, st2.hll_items)
    assert st2.n_rows == st.n_rows
    assert h2["filter_bits_set"] == h["filter_bits_set"]
    # layout fields the reference validates on load (honas_state.c:179-210)
    assert h2["first_filter_offset"] == 4096
    assert h2["client_hll_size"] == 12289


def test_header_validation():
    with open(GOLDEN, "rb") as f:
        data = bytearray(f.read())
    data[0] = 0x58  # corrupt magic
    with pytest.raises(ValueError, match="magic"):
        read_hs_header(bytes(data))


def test_search_result_json_golden_document(spark, tmp_path):
    """Field-for-field golden of the FULL rendered search-result document
    (README.md:341-454) for the reference-produced state and the
    documented job shape, through the CLI path (`honas_spark search
    --state golden.hs --job ...`).  Every value below is either a header
    constant recorded from the reference binary or derived by the
    documented formulas (bloom_approx_count on byte size, fill^k FPR as
    a "%.10f" string, threshold/omission rules)."""
    import json
    import os

    from honas_spark import __version__
    from honas_spark.cli import main

    job = {
        "groups": [
            {
                "id": 1,
                "hostnames": {
                    k: _sha(k).hex() for k in MEMBERS + [NON_MEMBER]
                },
            },
            {"id": 2, "hostnames": {NON_MEMBER: _sha(NON_MEMBER).hex()}},
        ]
    }
    job_path = str(tmp_path / "job.json")
    out_path = str(tmp_path / "result.json")
    with open(job_path, "w") as f:
        json.dump(job, f)
    assert main([
        "search", "--state", os.path.abspath(GOLDEN),
        "--job", job_path, "--out", out_path,
    ]) == 0
    with open(out_path) as f:
        got = json.load(f)

    expected = {
        "node_version": __version__,
        "state_file_version": "1.0",
        "period_begin": 1700000000,
        "first_request": 1700000100,
        "last_request": 1700000102,
        "period_end": 1700003600,
        "estimated_number_of_clients": 22,
        "estimated_number_of_host_names": 13,
        "number_of_requests": 3,
        "number_of_filters": 4,
        "number_of_filters_per_user": 2,
        "number_of_hashes": 3,
        "number_of_bits_per_filter": 65536,
        "flatten_threshold": 1,
        "filters": [
            {
                "number_of_bits_set": 0,
                "estimated_number_of_host_names": 0,
                "actual_false_positive_rate": "0.0000000000",
            },
            {
                "number_of_bits_set": 39,
                "estimated_number_of_host_names": 13,
                "actual_false_positive_rate": "0.0000000002",
            },
            {
                "number_of_bits_set": 0,
                "estimated_number_of_host_names": 0,
                "actual_false_positive_rate": "0.0000000000",
            },
            {
                "number_of_bits_set": 39,
                "estimated_number_of_host_names": 13,
                "actual_false_positive_rate": "0.0000000002",
            },
        ],
        "flattened_results": False,
        "groups": [
            {
                "id": 1,
                # every member in 2 filters; the never-inserted key is
                # dropped (hits < filters_per_user); group 2 (only the
                # non-member) is omitted entirely; the AND across group 1
                # zeroes because one key was missing
                "hostnames": {k: 2 for k in MEMBERS},
                "hits_by_all_hostnames": 0,
            }
        ],
    }
    assert got == expected
    # field ORDER also matches the reference printer (README.md "Format")
    assert list(got) == list(expected)


GOLDEN_INFO_TEXT = """
## Version information ##

Node version      : {version}
State file version: 1.0

## Period information ##

Period begin                  : 2023-11-14T22:13:20
First request                 : 2023-11-14T22:15:00
Last request                  : 2023-11-14T22:15:02
Period end                    : 2023-11-14T23:13:20
Estimated number of clients   : 22
Estimated number of host names: 13 
Number of requests            : 3

## Filter configuration ##

Number of filters         : 4
Number of filters per user: 2
Number of hashes          : 3
Number of bits per filter : 65536
Flatten threshold         : 1

## Filter information ##

 1. Number of bits set:          0 (Estimated number of host names:          0)
    Fill Rate:        0.0000000000 (False positive probability:   0.00000000000000000000)
 2. Number of bits set:         39 (Estimated number of host names:         13)
    Fill Rate:        0.0005950928 (False positive probability:   0.00000000021074342271)
 3. Number of bits set:          0 (Estimated number of host names:          0)
    Fill Rate:        0.0000000000 (False positive probability:   0.00000000000000000000)
 4. Number of bits set:         39 (Estimated number of host names:         13)
    Fill Rate:        0.0005950928 (False positive probability:   0.00000000021074342271)
"""


def test_info_text_and_plotmode_golden(tmp_path, capsys):
    """honas-info parity: the human dump (honas_info.c:69-105 — same
    field widths, float precisions and trailing-space quirks) and the
    --plotmode lines (period_begin,estimate per filter), pinned for the
    reference-produced state, through the CLI."""
    import os

    from honas_spark import __version__
    from honas_spark.cli import main

    assert main(["info", "--state", os.path.abspath(GOLDEN)]) == 0
    out = capsys.readouterr().out
    assert out.rstrip("\n") == GOLDEN_INFO_TEXT.format(
        version=__version__
    ).rstrip("\n")

    plot = str(tmp_path / "plot.csv")
    assert main(["info", "--state", os.path.abspath(GOLDEN),
                 "--plotmode", plot]) == 0
    assert open(plot).read().splitlines() == [
        "1700000000,0", "1700000000,13", "1700000000,0", "1700000000,13",
    ]


# ---------------------------------------------------------------------------
# Multi-client golden fixture: tests/data/reference_golden_multi.hs was
# produced THIS round by a harness compiled from the reference sources
# (honas_state.c + bloom.c + byte_slice.c + combinations.c +
# hyperloglog.c, gcc -O2, HAS_128BIT_INTEGERS): F=8, m=32768, k=5, u=3,
# flatten=2; six clients (4x IPv4 + 2x IPv6), entity prefixes, a PTR
# registration and a mixed-case name with trailing dot.  All constants
# below are the reference binary's own recorded output.
# ---------------------------------------------------------------------------

GOLDEN_MULTI = "tests/data/reference_golden_multi.hs"

_MULTI_CLIENTS = {
    0: bytes([10, 0, 0, 1]),
    1: bytes([192, 168, 1, 50]),
    2: bytes([172, 16, 5, 9]),
    3: bytes([8, 8, 4, 4]),
    4: bytes.fromhex("20010db8000000000000000000000001"),
    5: bytes.fromhex("fe800000000000000000000000000042"),
}
# (client, name, entity, is_ptr) — the harness registration sequence
_MULTI_REGS = [
    (0, "www.example.com", None, False),
    (1, "www.example.com", "SURFnet", False),
    (2, "api.test.org", "netSURF", False),
    (3, "deep.sub.domain.net", None, False),
    (4, "MiXeD.Case.Example.", None, False),
    (5, "ptr.reverse.zone", "SURFnet", True),
    (0, "www.example.com", None, False),
    (4, "v6.only.host", None, False),
]
_MULTI_PROBE_HITS = {
    "www.example.com": 4, "www": 4, "example": 4, "example.com": 4,
    "surfnet@www.example.com": 0, "SURFnet@www.example.com": 3,
    "netsurf@api": 0, "netSURF@api": 3, "api.test.org": 3,
    "test.org": 3, "deep.sub.domain.net": 3, "domain.net": 3, "sub": 3,
    "mixed.case.example": 3, "case.example": 3, "mixed": 3,
    "ptr.reverse.zone": 3, "surfnet@ptr.reverse.zone": 0,
    "SURFnet@ptr.reverse.zone": 3, "reverse.zone": 0, "ptr": 0,
    "v6.only.host": 3, "only.host": 3, "v6": 3,
    "never-inserted.example": 0,
}
_MULTI_BITS = [60, 50, 45, 95, 35, 60, 35, 76]


def _honas_reg_keys(name: str, entity=None, ptr=False) -> list:
    """The exact key set one registration inserts
    (honas_state.c:296-453): lowercased name with ONE trailing dot
    stripped; entity@full (entity case PRESERVED — the reference never
    lowercases the prefix); unless PTR: per-label (entity@label, label)
    pairs for every label before the TLD, then the bare SLD.TLD."""
    if name.endswith("."):
        name = name[:-1]
    name = name.lower()
    keys = [name]
    if entity:
        keys.append(f"{entity}@{name}")
    if not ptr:
        parts = name.split(".")
        for lab in parts[:-1]:
            if entity:
                keys.append(f"{entity}@{lab}")
            keys.append(lab)
        keys.append(".".join(parts[-2:]))
    return keys


def test_multi_client_import_reproduces_reference_probes():
    spec, st, h = import_hs_state(GOLDEN_MULTI)
    assert (spec.num_filters, spec.m_bits, spec.k,
            spec.filters_per_user, spec.flatten_threshold) == (
        8, 32768, 5, 3, 2)
    assert h["filter_bits_set"] == _MULTI_BITS
    assert [K.bloom_bits_set(f) for f in st.filters] == _MULTI_BITS
    assert st.n_rows == 8
    assert int(st.first_ts.timestamp()) == 1700000100
    assert int(st.last_ts.timestamp()) == 1700000107
    assert h["estimated_number_of_clients"] == 80   # Quirk Q6 aliasing
    assert h["estimated_number_of_host_names"] == 29
    assert K.hll_count(st.hll_clients) == 80
    assert K.hll_count(st.hll_items) == 29
    probes = list(_MULTI_PROBE_HITS)
    hits, _ = st.probe([_sha(k) for k in probes])
    assert {k: int(v) for k, v in zip(probes, hits)} == _MULTI_PROBE_HITS


def test_multi_client_engine_rebuild_is_bit_exact():
    """Rebuild the same state from scratch with our engine — murmur
    client hashes over raw wire bytes select each client's 3-of-8
    filter subset, honas key semantics incl. entity prefixes and PTR
    mode — and compare every bitset and both HLLs bit for bit.

    Quirk Q6, fully characterized: the reference's persist ORs the
    packed client-HLL registers into `mmap + (fbytes+pad)*F`
    (honas_state.c:90,495) — first_filter_offset bytes BEFORE the
    filter region ends — so the persisted LAST filter equals
    pure_bloom | packed_client_hll[:first_filter_offset], and the
    reloaded client HLL equals packed_client_hll | that same bloom
    tail (whence est_clients=80 from six real clients).  Our pure
    rebuild + an explicit OR reproduces the file bit for bit."""
    from honas_spark.sources.hsfile import (
        _pack_registers, _unpack_registers,
    )

    spec, ref, h = import_hs_state(GOLDEN_MULTI)
    mine = SketchState(spec)
    for cid, name, entity, ptr in _MULTI_REGS:
        keys = _honas_reg_keys(name, entity, ptr)
        ch = K.murmur64a(_MULTI_CLIENTS[cid])
        mine.update(
            pd.Series([_sha(k) for k in keys]),
            client_hashes=np.full(len(keys), ch, dtype=np.uint64),
        )
    last = spec.num_filters - 1
    for i in range(last):
        assert np.array_equal(mine.filters[i], ref.filters[i]), f"filter {i}"
    assert np.array_equal(mine.hll_items, ref.hll_items)

    ffo = h["first_filter_offset"]  # 4096: the aliased overlap length
    packed_clients = np.frombuffer(
        _pack_registers(mine.hll_clients), dtype=np.uint8
    )
    aliased_last = mine.filters[last].copy()
    aliased_last |= packed_clients[:ffo]
    assert np.array_equal(aliased_last, ref.filters[last])

    client_region = packed_clients.copy()
    client_region[:ffo] |= mine.filters[last]
    assert np.array_equal(
        _unpack_registers(client_region.tobytes()), ref.hll_clients
    )
    # ... and the bloom bits leaked into the registers ARE the quirky
    # client estimate the reference reports
    assert K.hll_count(ref.hll_clients) == 80


def test_multi_client_export_roundtrip(tmp_path):
    spec, st, h = import_hs_state(GOLDEN_MULTI)
    out = str(tmp_path / "multi.hs")
    export_hs_state(st, out, h["period_begin"], h["period_end"])
    spec2, st2, h2 = import_hs_state(out)
    assert spec2 == spec
    assert np.array_equal(st.filters, st2.filters)
    assert h2["filter_bits_set"] == _MULTI_BITS


def test_engine_built_export_verified_against_reference_loader(tmp_path):
    """A state built FROM SCRATCH by our engine and exported to .hs was
    loaded by a loader compiled from the reference sources
    (honas_state_load + honas_state_check_host_name_lookups, this
    round's harness).  The reference binary's recorded output on it:

        HDR clients=6 hostnames=29 requests=8
            first=1700000100 last=1700000107 F=8 m=32768 k=5 u=3
        BITS [60, 50, 45, 95, 35, 60, 35, 75]
        PROBE results identical to tests/data/reference_golden_multi.hs
        for all 22 keys (members hit, case-sensitivity of entity
        prefixes, PTR label suppression, non-member zero).

    Two deliberate divergences from the reference's OWN persisted file,
    both because our export never performs the Q6 aliasing OR:
    est_clients is the TRUE 6 (not 80) and filter 7 has the pure 75
    bits (not 76 — the reference's extra bit is HLL leakage).  This
    test pins the exact exported bytes the loader read: re-importing
    them must reproduce every recorded number."""
    spec = SketchSpec(m_bits=32768, k=5, num_filters=8,
                      filters_per_user=3, flatten_threshold=2)
    mine = SketchState(spec)
    ts = 1700000100
    for cid, name, entity, ptr in _MULTI_REGS:
        keys = _honas_reg_keys(name, entity, ptr)
        ch = K.murmur64a(_MULTI_CLIENTS[cid])
        mine.update(
            pd.Series([_sha(k) for k in keys]),
            client_hashes=np.full(len(keys), ch, dtype=np.uint64),
            ts=pd.Series([pd.Timestamp(t, unit="s")
                          for t in (ts, ts)]),
        )
        ts += 1
    mine.n_rows = 8  # the reference counts registrations, not keys
    out = str(tmp_path / "engine_export.hs")
    export_hs_state(mine, out, 1700000000, 1700003600)
    spec2, st2, h2 = import_hs_state(out)
    assert h2["filter_bits_set"] == [60, 50, 45, 95, 35, 60, 35, 75]
    assert h2["estimated_number_of_clients"] == 6     # true count
    assert h2["estimated_number_of_host_names"] == 29
    assert h2["number_of_requests"] == 8
    probes = list(_MULTI_PROBE_HITS)
    hits, _ = st2.probe([_sha(k) for k in probes])
    got = {k: int(v) for k, v in zip(probes, hits)}
    expected = dict(_MULTI_PROBE_HITS)
    assert got == expected


def test_merge_verified_against_reference_combine(tmp_path):
    """Two engine-built states were exported and combined by a harness
    around the reference's own honas_state_aggregate_combine
    (honas_state.c:568-611, compiled this round); the persisted result
    was bit-identical to our `SketchState.merge` for all 8 filters and
    the hostname HLL.  The reference binary's recorded output:

        HDR requests=5 clients=2 hostnames=16
        BITS [50, 0, 80, 30, 80, 0, 0, 0]

    (No Q6 leak on this path: states loaded from file have
    registers_owned=false, so persist skips the aliasing OR.)  This
    test pins the same construction engine-side."""
    spec = SketchSpec(m_bits=32768, k=5, num_filters=8,
                      filters_per_user=3, flatten_threshold=2)

    def mk(names, client_bytes, ts0):
        st = SketchState(spec)
        for i, n in enumerate(names):
            keys = [n] + n.split(".")[:-1] + [".".join(n.split(".")[-2:])]
            ch = K.murmur64a(client_bytes)
            st.update(
                pd.Series([_sha(k) for k in keys]),
                client_hashes=np.full(len(keys), ch, dtype=np.uint64),
                ts=pd.Series([pd.Timestamp(ts0 + i, unit="s")]),
            )
        st.n_rows = len(names)
        return st

    a = mk(["alpha.example.com", "beta.example.com"],
           bytes([10, 0, 0, 1]), 1700000100)
    b = mk(["gamma.test.org", "delta.test.org", "epsilon.net.nl"],
           bytes([192, 168, 1, 50]), 1700001000)
    merged = a.merge(b)
    assert [K.bloom_bits_set(f) for f in merged.filters] == [
        50, 0, 80, 30, 80, 0, 0, 0]
    assert merged.n_rows == 5
    assert K.hll_count(merged.hll_items) == 16
    assert K.hll_count(merged.hll_clients) == 2
    # the exported bytes round-trip (what the reference combiner read)
    out = str(tmp_path / "m.hs")
    export_hs_state(merged, out, 1700000000, 1700003600)
    _, st2, h2 = import_hs_state(out)
    assert h2["filter_bits_set"] == [50, 0, 80, 30, 80, 0, 0, 0]
    assert np.array_equal(st2.filters, merged.filters)
