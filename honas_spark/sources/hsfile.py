"""honas `.hs` state-file interop (S2/S3): read and write the reference's
binary state files so existing honas deployments can migrate either way.

Layout (include/honas_state.h:110-152, all little-endian, packed):
  [header 108 B][uint32 filter_bits_set[F]][pad to first_filter_offset]
  [filter 0][padding_after_filters] ... [filter F-1][padding]
  [client HLL dense 12289 B][pad][hostname HLL dense 12289 B][pad]
with first_filter_offset = roundup(108 + 4F, 4096) and paddings rounding
each section to a page (src/honas_state.c:96-150).

**Quirk Q6 (bug-compatible on purpose):** the reference computes the HLL
pointers as `(filter_bytes + padding) * F` from the START of the file,
omitting `first_filter_offset` (src/honas_state.c:91-92) — so the client
HLL aliases the last filter's final page.  Verified empirically against
a harness built from the reference sources: with F=4, m=65536 the client
HLL lands at offset 32768, inside filter 3 ([28672, 36864)), and a
single-client state reports estimated_number_of_clients=22 because
filter bits leak into HLL registers.  We reproduce the exact pointer
math so files round-trip bit-faithfully; the aliasing (and its effect on
the client estimate) is the reference's own behavior.

HLL registers are 6-bit packed (hyperloglog.c HLL_DENSE_GET/SET macros,
bit offset = regnum*6, little-endian within the byte stream); we unpack
to one byte per register on import and repack on export.
"""

from __future__ import annotations

import struct

import numpy as np

from .. import kernels as K
from ..spec import SketchSpec
from ..state import SketchState

MAGIC = b"DNSBLOOM"
MAJOR, MINOR = 1, 0
PAGE = 4096
HLL_DENSE_SIZE = ((K.HLL_REGISTERS * 6 + 7) // 8) + 1  # 12289

_HEADER_FMT = "<8sII" + "IIIIIII" + "IIII" + "QQQQQ" + "II"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)  # 108

# enough bytes for the fixed header PLUS filter_bits_set at the maximum
# num_filters the validator accepts (4096) — callers reading a prefix of
# a state file must use this, not a round number: an 8 KiB prefix only
# covers 2021 filters and made valid wide states raise "truncated"
HEADER_READ_SIZE = _HEADER_SIZE + 4 * 4096


def _roundup(v: int, page: int = PAGE) -> int:
    return (v + page - 1) & ~(page - 1)


def _unpack_registers(buf: bytes) -> np.ndarray:
    """6-bit packed dense registers -> (16384,) uint8."""
    bits = np.unpackbits(
        np.frombuffer(buf[: K.HLL_REGISTERS * 6 // 8], dtype=np.uint8),
        bitorder="little",
    )
    weights = np.array([1, 2, 4, 8, 16, 32], dtype=np.uint8)
    return (bits.reshape(K.HLL_REGISTERS, 6) * weights).sum(
        axis=1
    ).astype(np.uint8)


def _pack_registers(regs: np.ndarray) -> bytes:
    """(16384,) uint8 (values < 64) -> 6-bit packed dense + guard byte."""
    bits = (
        (regs[:, None] >> np.arange(6, dtype=np.uint8)) & 1
    ).astype(np.uint8)
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return packed.tobytes() + b"\x00"  # guard byte (HLL_DENSE_SIZE)


def read_hs_header(data: bytes) -> dict:
    """Parse + validate the packed header.

    Validation mirrors the reference loader (honas_state.c:179-210):
    magic, major version, and layout-consistency checks.  ANY corrupt or
    truncated input raises ValueError with a message — never struct
    errors, absurd allocations, or a garbage header (fuzz-tested)."""
    if len(data) < _HEADER_SIZE:
        raise ValueError(
            f"truncated state file: {len(data)} bytes < header"
            f" {_HEADER_SIZE}"
        )
    vals = struct.unpack_from(_HEADER_FMT, data, 0)
    names = [
        "magic", "major", "minor",
        "first_filter_offset", "padding_after_filters", "num_filters",
        "m_bits", "k", "filters_per_user", "flatten_threshold",
        "client_hll_size", "padding_after_client_hll",
        "host_name_hll_size", "padding_after_host_name_hll",
        "period_begin", "period_end", "first_request", "last_request",
        "number_of_requests",
        "estimated_number_of_clients", "estimated_number_of_host_names",
    ]
    h = dict(zip(names, vals))
    if h["magic"] != MAGIC:
        raise ValueError("not a honas state file (bad magic)")
    if h["major"] != MAJOR:
        raise ValueError(f"unsupported major version {h['major']}")
    if not 1 <= h["num_filters"] <= 4096:
        raise ValueError(f"corrupt num_filters {h['num_filters']}")
    if h["m_bits"] == 0 or h["m_bits"] % 8:
        raise ValueError(f"corrupt number_of_bits_per_filter {h['m_bits']}")
    if not 1 <= h["k"] <= 64:
        raise ValueError(f"corrupt number_of_hashes {h['k']}")
    if not 1 <= h["filters_per_user"] <= h["num_filters"]:
        raise ValueError(
            f"corrupt number_of_filters_per_user {h['filters_per_user']}"
        )
    if h["first_filter_offset"] < _HEADER_SIZE + 4 * h["num_filters"]:
        raise ValueError(
            f"corrupt first_filter_offset {h['first_filter_offset']}"
        )
    for f in ("client_hll_size", "host_name_hll_size"):
        if h[f] != HLL_DENSE_SIZE:
            raise ValueError(f"corrupt {f} {h[f]} != {HLL_DENSE_SIZE}")
    if len(data) < _HEADER_SIZE + 4 * h["num_filters"]:
        raise ValueError("truncated state file: filter_bits_set missing")
    h["filter_bits_set"] = list(
        struct.unpack_from(f"<{h['num_filters']}I", data, _HEADER_SIZE)
    )
    return h


def import_hs_state(path: str, spec: SketchSpec | None = None
                    ) -> tuple[SketchSpec, SketchState, dict]:
    """Load a honas .hs state file into a SketchState.

    Returns (spec, state, header).  CMS/KLL start empty (the reference
    has no such sketches); counters/timestamps come from the header."""
    with open(path, "rb") as f:
        data = f.read()
    h = read_hs_header(data)
    fbytes = h["m_bits"] // 8
    pad = h["padding_after_filters"]
    if spec is None:
        spec = SketchSpec(
            m_bits=h["m_bits"], k=h["k"],
            num_filters=h["num_filters"],
            filters_per_user=h["filters_per_user"],
            flatten_threshold=h["flatten_threshold"],
        )
    state = SketchState(spec)
    # Quirk Q6: HLL offsets computed exactly as the reference does
    client_off = (fbytes + pad) * h["num_filters"]
    host_off = (
        client_off + h["client_hll_size"] + h["padding_after_client_hll"]
    )
    need = max(
        h["first_filter_offset"] + h["num_filters"] * (fbytes + pad),
        host_off + h["host_name_hll_size"],
    )
    if len(data) < need:
        raise ValueError(
            f"truncated state file: {len(data)} bytes < {need} required"
            " by header layout"
        )
    for i in range(h["num_filters"]):
        off = h["first_filter_offset"] + i * (fbytes + pad)
        state.filters[i] = np.frombuffer(
            data, dtype=np.uint8, count=fbytes, offset=off
        ).copy()
    state.hll_clients = _unpack_registers(
        data[client_off: client_off + h["client_hll_size"]]
    )
    state.hll_items = _unpack_registers(
        data[host_off: host_off + h["host_name_hll_size"]]
    )
    state.n_rows = h["number_of_requests"]
    import pandas as pd

    if h["first_request"]:
        state.first_ts = pd.Timestamp(h["first_request"], unit="s")
    if h["last_request"]:
        state.last_ts = pd.Timestamp(h["last_request"], unit="s")
    return spec, state, h


def export_hs_state(
    state: SketchState,
    path: str,
    period_begin: int = 0,
    period_end: int = 0,
) -> None:
    """Write a SketchState as a honas .hs file the reference binaries can
    load (verified against a harness compiled from the reference
    sources).  The CMS/KLL siblings have no reference representation and
    are not persisted here — use the parquet checkpoint for full state."""
    spec = state.spec
    F = spec.num_filters
    fbytes = spec.filter_bytes
    ffo = _roundup(_HEADER_SIZE + 4 * F)
    pad = _roundup(fbytes) - fbytes
    pad_hll = _roundup(HLL_DENSE_SIZE) - HLL_DENSE_SIZE
    size = ffo + F * (fbytes + pad) + 2 * (HLL_DENSE_SIZE + pad_hll)
    buf = bytearray(size)

    bits_set = [K.bloom_bits_set(f) for f in state.filters]

    def ts(t):
        return 0 if t is None else int(t.timestamp())

    struct.pack_into(
        _HEADER_FMT, buf, 0,
        MAGIC, MAJOR, MINOR,
        ffo, pad, F, spec.m_bits, spec.k, spec.filters_per_user,
        spec.flatten_threshold,
        HLL_DENSE_SIZE, pad_hll, HLL_DENSE_SIZE, pad_hll,
        period_begin, period_end,
        ts(state.first_ts), ts(state.last_ts),
        state.n_rows,
        K.hll_count(state.hll_clients), K.hll_count(state.hll_items),
    )
    struct.pack_into(f"<{F}I", buf, _HEADER_SIZE, *bits_set)
    # Quirk Q6: the reference READS the HLLs at (fbytes+pad)*F, aliasing
    # the last filter's final page(s).  In honas the aliased region is
    # ONE shared memory range that both bloom-bit writes and the HLL
    # flush OR into (byte_slice_bitwise_or, honas_state.c:496) — so we
    # OR every section into the buffer instead of assigning, which
    # reproduces the reference's on-disk content for fresh states too.
    arr = np.frombuffer(buf, dtype=np.uint8)
    for i in range(F):
        off = ffo + i * (fbytes + pad)
        np.bitwise_or(
            arr[off: off + fbytes], state.filters[i],
            out=arr[off: off + fbytes],
        )
    client_off = (fbytes + pad) * F
    host_off = client_off + HLL_DENSE_SIZE + pad_hll
    for off, regs in (
        (client_off, state.hll_clients),
        (host_off, state.hll_items),
    ):
        packed = np.frombuffer(_pack_registers(regs), dtype=np.uint8)
        np.bitwise_or(
            arr[off: off + HLL_DENSE_SIZE], packed,
            out=arr[off: off + HLL_DENSE_SIZE],
        )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(buf))
    import os

    os.replace(tmp, path)  # atomic publish
