"""In-memory sketch state + the CRDT merge algebra.

One `SketchState` is the engine's analog of a honas state file
(include/honas_state.h:121-171): F Bloom filters + two HLLs + counters,
extended with the north-rule CMS and KLL siblings.  All components share one
merge protocol — commutative, associative, and (except the additive
CMS/count) idempotent — which is what makes any tree/fold merge ordering
produce identical results (reference merge: src/honas_state.c:568-611).

Pure numpy; no Spark imports — usable from pandas UDFs and from tests.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from . import kernels as K
from .spec import SketchSpec


class SketchState:
    __slots__ = (
        "spec", "filters", "hll_clients", "hll_items", "cms", "kll",
        "n_rows", "first_ts", "last_ts",
    )

    def __init__(self, spec: SketchSpec):
        self.spec = spec
        self.filters = np.zeros(
            (spec.num_filters, spec.filter_bytes), dtype=np.uint8
        )
        self.hll_clients = K.hll_zero()
        self.hll_items = K.hll_zero()
        self.cms = K.cms_zero(spec.cms_depth, spec.cms_width)
        self.kll = K.KLL(spec.kll_k)
        self.n_rows = 0
        self.first_ts: Optional[pd.Timestamp] = None
        self.last_ts: Optional[pd.Timestamp] = None

    # ------------------------------------------------------------------ #
    # update — the vectorized analog of                                   #
    # honas_state_register_host_name_lookup (honas_state.c:246-454)       #
    # ------------------------------------------------------------------ #
    ALL_COMPONENTS = frozenset({"bloom", "hll", "cms", "kll"})

    def update(
        self,
        key_sha: "pd.Series | list",
        client_hashes: Optional[np.ndarray] = None,
        ts: Optional[pd.Series] = None,
        values: Optional[np.ndarray] = None,
        components: Optional[frozenset] = None,
    ) -> None:
        """Ingest a batch of keys.

        key_sha: 32-byte SHA-256 digests (bytes), one per logical key
            occurrence.  The digest doubles as the HLL input (first 8
            bytes LE — honas_state.c:308) and the CMS key.
        client_hashes: optional (N,) uint64 MurmurHash64A per row (the
            filter-subset selector + client HLL input,
            honas_state.c:261-283).  Defaults to 0 (single-client mode).
        ts: optional timestamps (first/last request stats, Quirk Q4: we
            use true min — the reference mis-stamps out-of-order firsts).
        values: optional floats for the KLL quantile sibling.
        components: subset of {"bloom","hll","cms","kll"} to maintain —
            a CMS-only or HLL-only aggregation skips the Bloom offset
            derivation (the k-draw big-int kernel, ~10x the rest), the
            single biggest per-key cost.  Untouched components stay
            zero and still merge correctly (zero is the identity).
        """
        comp = self.ALL_COMPONENTS if components is None else components
        n = len(key_sha)
        if n == 0:
            return
        spec = self.spec
        self.n_rows += n
        if ts is not None and len(ts):
            tmin, tmax = ts.min(), ts.max()
            if self.first_ts is None or tmin < self.first_ts:
                self.first_ts = tmin
            if self.last_ts is None or tmax > self.last_ts:
                self.last_ts = tmax

        limbs = None
        if comp & {"bloom", "hll", "cms"}:
            limbs = K.hashes_to_limbs(list(key_sha), spec.hash_len)
            item_h64 = limbs[:, :2].copy().view("<u8").reshape(-1)
        if "hll" in comp:
            K.hll_add(self.hll_items, item_h64)
        if "cms" in comp:
            K.cms_add(self.cms, item_h64)

        if client_hashes is None:
            client_hashes = np.zeros(n, dtype=np.uint64)
        if "hll" in comp:
            K.hll_add(self.hll_clients, client_hashes)

        if values is not None and "kll" in comp:
            self.kll.add(np.asarray(values, dtype=np.float64))

        if "bloom" in comp:
            # each client updates its u-of-F filter subset
            subsets = K.filter_indexes_for_clients(
                client_hashes, spec.num_filters, spec.filters_per_user
            )
            for fi in range(spec.num_filters):
                mask = (subsets == fi).any(axis=1)
                if not mask.any():
                    continue
                tl = K.transform_limbs(limbs[mask], fi)
                offs = K.bloom_offsets(tl, spec.m_bits, spec.k)
                K.bloom_build(self.filters[fi], offs)

    # ------------------------------------------------------------------ #
    # merge — OR / max / add / min-max (honas_state.c:568-611)            #
    # ------------------------------------------------------------------ #
    def merge(self, other: "SketchState") -> "SketchState":
        if self.spec != other.spec:
            raise ValueError("cannot merge sketches with different specs")
        out = SketchState(self.spec)
        out.filters = np.bitwise_or(self.filters, other.filters)
        out.hll_clients = K.hll_merge(self.hll_clients, other.hll_clients)
        out.hll_items = K.hll_merge(self.hll_items, other.hll_items)
        out.cms = K.cms_merge(self.cms, other.cms)
        out.kll = self.kll.merge(other.kll)
        out.n_rows = self.n_rows + other.n_rows
        out.first_ts = _opt_min(self.first_ts, other.first_ts)
        out.last_ts = _opt_max(self.last_ts, other.last_ts)
        return out

    @classmethod
    def merge_packed(
        cls, spec: SketchSpec, filters, hll_clients, hll_items, cms, kll
    ) -> "SketchState":
        """Reduce parallel sequences of serialized component buffers in
        one vectorized pass: one bitwise_or.reduce / maximum.reduce /
        add.reduce over the stacked buffers instead of P sequential
        deserialize+merge round trips.  Bit-identical to folding with
        merge() (associativity).  Counters/ts stats stay at their
        zero/None defaults — the caller owns them (they aggregate
        vectorized across ALL groups at once in _merge_by_group)."""
        out = cls(spec)
        out.filters = np.bitwise_or.reduce(
            np.stack([
                K.bloom_unpack(b, spec.num_filters, spec.filter_bytes)
                for b in filters
            ]),
            axis=0,
        )
        out.hll_clients = np.maximum.reduce(
            np.stack([K.hll_unpack(b) for b in hll_clients]),
            axis=0,
        )
        out.hll_items = np.maximum.reduce(
            np.stack([K.hll_unpack(b) for b in hll_items]),
            axis=0,
        )
        out.cms = np.add.reduce(
            np.stack([
                K.cms_unpack(b, spec.cms_depth, spec.cms_width)
                for b in cms
            ]),
            axis=0,
        ).astype(np.int64)
        acc = None
        for b in kll:
            nxt = K.KLL.from_bytes(b)
            acc = nxt if acc is None else acc.merge(nxt)
        out.kll = acc
        return out

    @classmethod
    def merge_many(cls, spec: SketchSpec, sub) -> "SketchState":
        """merge_packed over a pandas sub-frame's value columns, plus
        the counter/ts stats from the same frame."""
        import pandas as pd

        out = cls.merge_packed(
            spec, sub["filters"], sub["hll_clients"], sub["hll_items"],
            sub["cms"], sub["kll"],
        )
        out.n_rows = int(sub["n_rows"].sum())
        first = sub["first_ts"].min()
        last = sub["last_ts"].max()
        out.first_ts = None if pd.isna(first) else first
        out.last_ts = None if pd.isna(last) else last
        return out

    # ------------------------------------------------------------------ #
    # probe — honas_state_check_host_name_lookups (honas_state.c:456-474):#
    # each key is checked against EVERY filter (with its per-filter       #
    # transform); result = hit count + per-filter hit bitmask.            #
    # ------------------------------------------------------------------ #
    def probe(self, key_sha: list) -> tuple[np.ndarray, np.ndarray]:
        """-> (hits (N,) int64, filters_hit_bitmask (N,) int64)."""
        spec = self.spec
        limbs = K.hashes_to_limbs(list(key_sha), spec.hash_len)
        n = limbs.shape[0]
        hits = np.zeros(n, dtype=np.int64)
        mask = np.zeros(n, dtype=np.int64)
        for fi in range(spec.num_filters):
            tl = K.transform_limbs(limbs, fi)
            offs = K.bloom_offsets(tl, spec.m_bits, spec.k)
            hit = K.bloom_probe(self.filters[fi], offs)
            hits += hit
            mask |= hit.astype(np.int64) << fi
        return hits, mask

    # ------------------------------------------------------------------ #
    # finalize — header/diagnostic stats (honas_info.c:60-105,            #
    # honas_search.c:88-127)                                              #
    # ------------------------------------------------------------------ #
    def stats(self) -> dict:
        spec = self.spec
        bits = [K.bloom_bits_set(f) for f in self.filters]
        total_bits = int(sum(bits))
        return {
            "n_rows": int(self.n_rows),
            "bits_set": bits,
            "est_items": K.hll_count(self.hll_items),
            "est_clients": K.hll_count(self.hll_clients),
            "est_items_per_filter": [
                K.bloom_approx_count(spec.m_bits, spec.k, b) for b in bits
            ],
            "fill_rate": [b / spec.m_bits for b in bits],
            "actual_fpr": [K.actual_fpr(spec.m_bits, spec.k, b) for b in bits],
            "total_bits_set": total_bits,
        }

    # ------------------------------------------------------------------ #
    # serialization to/from flat row fields (BinaryType columns)          #
    # ------------------------------------------------------------------ #
    def to_fields(self) -> dict:
        # HLL registers serialize sparse when mostly zero (K.hll_pack):
        # a partial sketch from a small (window, group) slice ships a
        # few dozen (idx, val) pairs through the merge exchange instead
        # of the dense 16 KiB array — the reference's sparse HLL
        # (hyperloglog.c:589-830) applied to THIS engine's shuffle
        # boundary.  Bit-identical after unpack; dense fallback kicks
        # in automatically as registers fill.
        return {
            "filters": K.bloom_pack(self.filters),
            "hll_clients": K.hll_pack(self.hll_clients),
            "hll_items": K.hll_pack(self.hll_items),
            "cms": K.cms_pack(self.cms),
            "kll": self.kll.to_bytes(),
            "n_rows": int(self.n_rows),
            "first_ts": self.first_ts,
            "last_ts": self.last_ts,
        }

    @classmethod
    def from_fields(cls, spec: SketchSpec, row) -> "SketchState":
        st = cls(spec)
        st.filters = K.bloom_unpack(
            row["filters"], spec.num_filters, spec.filter_bytes
        )
        st.hll_clients = K.hll_unpack(row["hll_clients"])
        st.hll_items = K.hll_unpack(row["hll_items"])
        st.cms = K.cms_unpack(row["cms"], spec.cms_depth, spec.cms_width)
        st.kll = K.KLL.from_bytes(row["kll"])
        st.n_rows = int(row["n_rows"])
        st.first_ts = row["first_ts"]
        st.last_ts = row["last_ts"]
        return st


def _opt_min(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _opt_max(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)
