"""Sketch specification — the engine's analog of honas's gather config +
state-file header (reference: src/honas_gather_config.c:61-87,
include/honas_state.h:121-152).  A frozen dataclass: every sketch table is
built against exactly one spec, and merges refuse mismatched specs (the
reference checks only m,k,F at src/honas_state.c:575-577 — Quirk Q5 — we
check all parameters)."""

from __future__ import annotations

import math
from dataclasses import dataclass, asdict

from . import kernels as K


@dataclass(frozen=True)
class SketchSpec:
    """All sketch parameters, mirroring the honas config keywords
    (README.md:601-625) plus the north-rule sibling sketches."""

    m_bits: int = 1 << 20            # bloom filter size in bits (config: number_of_bits_per_filter)
    k: int = 10                      # hashes per key (config: number_of_hashes)
    num_filters: int = 1             # F (config: number_of_filters)
    filters_per_user: int = 1        # u (config: number_of_filters_per_user)
    window: str = "1 hour"           # period (config: period_length, seconds)
    flatten_threshold: int = 1       # flatten results below this client estimate
    cms_depth: int = 4
    cms_width: int = 16384
    kll_k: int = 200
    hash_len: int = 32               # SHA-256

    def __post_init__(self):
        if self.m_bits % 8 != 0:
            raise ValueError("m_bits must be a multiple of 8")
        if not (1 <= self.filters_per_user <= self.num_filters):
            raise ValueError("need 1 <= u <= F")
        if self.k < 1:
            raise ValueError("k >= 1")
        if not K.required_entropy_ok(self.m_bits, self.k, self.hash_len * 8):
            # reference warns at 512 bits of required entropy
            # (honas_state.c:613-624); we hard-fail past the hash budget
            raise ValueError(
                f"k*ceil(log2 m) = {self.k * math.ceil(math.log2(self.m_bits))}"
                f" exceeds hash entropy {self.hash_len * 8} bits"
            )

    # --- derived sizes ----------------------------------------------------
    @property
    def filter_bytes(self) -> int:
        return self.m_bits // 8

    @property
    def filters_blob_bytes(self) -> int:
        return self.num_filters * self.filter_bytes

    @property
    def n_combinations(self) -> int:
        return math.comb(self.num_filters, self.filters_per_user)

    @property
    def cms_bytes(self) -> int:
        return self.cms_depth * self.cms_width * 8

    # --- planning helpers (advice.c:30-51) ---------------------------------
    @staticmethod
    def plan(n: int, p: float) -> "SketchSpec":
        """Size a spec for n expected keys at target FPR p."""
        m = K.bloom_filter_size(p, n)
        m += (-m) % 8
        return SketchSpec(m_bits=max(m, 64), k=max(K.optimal_k(n, m), 1))

    def theoretical_fpr(self, n: int) -> float:
        return K.fpr_theory(self.k, n, self.m_bits)

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SketchSpec":
        return cls(**d)
