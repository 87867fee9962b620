"""HyperLogLog (dense + sparse) — mergeable distinct-count sketch.

NEW vs the reference (dablooms has no cardinality sketch); demanded by
the north_rule ("companion HLL ... sharing the same MurmurHash-based
double-hashing kernel").  Standard Flajolet–Fuss–Gandouet–Meunier HLL
with the HLL++-style *sparse* mode: below a cardinality threshold the
sketch stores the exact set of 64-bit key hashes, so small-cardinality
estimates are exact; above it, it degrades to dense registers with the
published ~1.04/sqrt(m) relative error.  Merge = register-wise max
(dense) / set union (sparse) — associative and commutative.
"""

from __future__ import annotations

import numpy as np

from ..hashing import SALT_CONSTANT, murmur3_x64_128_batch
from ..serde import register_sketch

def hll_factory(p: int = 14):
    """Picklable zero-arg constructor for distributed builds."""
    import functools

    return functools.partial(HyperLogLog, p)


# bias-correction alpha_m for m >= 128 (Flajolet et al. 2007)
def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@register_sketch("hll")
class HyperLogLog:
    """p-bit HLL over murmur h1; sparse (exact hash set) until
    ``sparse_limit`` distinct hashes, then dense uint8 registers."""

    __slots__ = ("p", "m", "sparse", "hashes", "registers", "count")

    def __init__(self, p: int = 14, sparse: bool = True,
                 hashes: np.ndarray | None = None,
                 registers: np.ndarray | None = None, count: int = 0):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.sparse = sparse and registers is None
        self.hashes = (
            hashes if hashes is not None else np.zeros(0, dtype=np.uint64)
        ) if self.sparse else None
        self.registers = (
            registers if registers is not None
            else (None if self.sparse else np.zeros(self.m, dtype=np.uint8))
        )
        self.count = count  # total items offered (not distinct)

    @property
    def sparse_limit(self) -> int:
        return self.m // 4  # sparse rep stays smaller than dense registers

    # -- build -------------------------------------------------------------
    def add_hashed(self, h1: np.ndarray, h2: np.ndarray | None = None) -> None:
        """h2 accepted (and ignored) for kernel-signature uniformity."""
        self.count += len(h1)
        if self.sparse:
            self.hashes = np.union1d(self.hashes, h1)
            if len(self.hashes) > self.sparse_limit:
                self._to_dense()
        else:
            self._dense_add(h1)

    def add(self, keys) -> None:
        h1, _ = murmur3_x64_128_batch(keys, seed=SALT_CONSTANT)
        self.add_hashed(h1)

    def _to_dense(self) -> None:
        hashes = self.hashes
        self.sparse = False
        self.hashes = None
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self._dense_add(hashes)

    def _dense_add(self, h1: np.ndarray) -> None:
        if len(h1) == 0:
            return
        idx = (h1 >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h1 << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rho = position of first set bit in the remaining stream (1-based)
        nbits = 64 - self.p
        lz = np.full(len(h1), nbits, dtype=np.int64)  # all-zero rest
        nz = rest != 0
        if nz.any():
            r = rest[nz]
            # count leading zeros of a uint64 via float64 exponent trick is
            # unsafe for >2^53; do it with a shift loop over bit widths
            lzc = np.zeros(len(r), dtype=np.int64)
            shift = 32
            v = r.copy()
            while shift:
                mask = v < (np.uint64(1) << np.uint64(64 - shift))
                lzc[mask] += shift
                v[mask] = v[mask] << np.uint64(shift)
                shift //= 2
            lz[nz] = lzc
        rho = np.minimum(lz + 1, nbits + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    # -- estimate ----------------------------------------------------------
    def estimate(self) -> float:
        if self.sparse:
            return float(len(self.hashes))
        m = self.m
        regs = self.registers.astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:  # small-range: linear counting over empty registers
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different p")
        count = self.count + other.count
        if self.sparse and other.sparse:
            merged = HyperLogLog(self.p, hashes=np.union1d(self.hashes, other.hashes),
                                 count=count)
            if len(merged.hashes) > merged.sparse_limit:
                merged._to_dense()
            return merged
        a, b = self, other
        if a.sparse:
            a, b = b, a  # a dense
        regs = a.registers.copy()
        if b.sparse:
            out = HyperLogLog(self.p, sparse=False, registers=regs, count=count)
            out._dense_add(b.hashes)
            return out
        np.maximum(regs, b.registers, out=regs)
        return HyperLogLog(self.p, sparse=False, registers=regs, count=count)

    # -- serde -------------------------------------------------------------
    def to_state(self):
        if self.sparse:
            return ({"p": self.p, "mode": "sparse"},
                    self.hashes.tobytes(), self.count, self.count)
        return ({"p": self.p, "mode": "dense"},
                self.registers.tobytes(), self.count, self.count)

    @classmethod
    def from_state(cls, params, state, count, seq):
        p = int(params["p"])
        if params["mode"] == "sparse":
            return cls(p, hashes=np.frombuffer(state, dtype=np.uint64).copy(),
                       count=count)
        return cls(p, sparse=False,
                   registers=np.frombuffer(state, dtype=np.uint8).copy(),
                   count=count)
