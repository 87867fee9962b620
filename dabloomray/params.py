"""Bloom geometry + scaling policy.

Geometry closed forms match the reference exactly
(``counting_bloom_init``, src/dablooms.c ≈L200–230):

    nfuncs          = ceil(log2(1 / error_rate))
    counts_per_func = ceil(capacity * |ln error_rate| / (nfuncs * ln^2 2))
    size            = nfuncs * counts_per_func

The filter is *partitioned*: hash i addresses only the slice
``[i*counts_per_func, (i+1)*counts_per_func)``.

Scaling policy per BASELINE.json (diverges from upstream, documented in
SURVEY.md §7.2): error tightening ratio r=0.9 (upstream
ERROR_TIGHTENING_RATIO recalled 0.5, src/dablooms.c ≈L24) and geometric
capacity growth x2 (upstream: constant).  Compound FPR of the OR-chain
<= sum err0*r^(i+1) = err0*r/(1-r); to honor an end-to-end target
``target``, choose err0 = target*(1-r)  (Almeida et al., "Scalable
Bloom Filters", Inf. Proc. Letters 2007).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class BloomParams:
    """Geometry of one counting bloom (reference counting_bloom_t)."""

    capacity: int
    error_rate: float
    nfuncs: int = field(init=False)
    counts_per_func: int = field(init=False)
    size: int = field(init=False)

    def __post_init__(self):
        if not (0 < self.error_rate < 1):
            raise ValueError(f"error_rate must be in (0,1): {self.error_rate}")
        if self.capacity < 1:
            raise ValueError(f"capacity must be >= 1: {self.capacity}")
        nfuncs = int(math.ceil(math.log2(1.0 / self.error_rate)))
        cpf = int(
            math.ceil(
                self.capacity
                * abs(math.log(self.error_rate))
                / (nfuncs * (math.log(2) ** 2))
            )
        )
        object.__setattr__(self, "nfuncs", nfuncs)
        object.__setattr__(self, "counts_per_func", cpf)
        object.__setattr__(self, "size", nfuncs * cpf)

    def to_dict(self) -> dict:
        return {"capacity": self.capacity, "error_rate": self.error_rate}

    @classmethod
    def from_dict(cls, d: dict) -> "BloomParams":
        return cls(capacity=int(d["capacity"]), error_rate=float(d["error_rate"]))


@dataclass(frozen=True)
class ScalingPolicy:
    """Chain growth policy (reference new_counting_bloom_from_scale,
    src/dablooms.c ≈L430, with BASELINE.json overrides).

    Sub-filter i (0-based) gets error ``err0 * r**(i+1)`` and capacity
    ``cap0 * growth**i``.
    """

    capacity0: int = 100_000
    target_error: float = 0.05
    tightening_ratio: float = 0.9  # r, BASELINE.json north_star
    growth: int = 2  # geometric capacity growth per spec

    @property
    def err0(self) -> float:
        # end-to-end FPR budget: sum err0*r^(i+1) <= err0*r/(1-r) <= target
        return self.target_error * (1.0 - self.tightening_ratio)

    def sub_params(self, i: int) -> BloomParams:
        return BloomParams(
            capacity=self.capacity0 * (self.growth ** i),
            error_rate=self.err0 * (self.tightening_ratio ** (i + 1)),
        )

    def to_dict(self) -> dict:
        return {
            "capacity0": self.capacity0,
            "target_error": self.target_error,
            "tightening_ratio": self.tightening_ratio,
            "growth": self.growth,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ScalingPolicy":
        return cls(
            capacity0=int(d["capacity0"]),
            target_error=float(d["target_error"]),
            tightening_ratio=float(d["tightening_ratio"]),
            growth=int(d["growth"]),
        )
