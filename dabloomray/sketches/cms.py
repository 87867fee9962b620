"""Count-min sketch — mergeable frequency estimator.

NEW vs the reference (north_rule companion sketch).  Shares the
murmur double-hashing kernel (H1/H2): row i of the depth-d matrix uses
index ``(h1 + i*h2) % width`` — the same Kirsch–Mitzenmacher scheme as
the bloom partitions (``hash_func``, src/dablooms.c ≈L160).

Published bounds (Cormode & Muthukrishnan 2005): with width w = ceil(e/ε)
and depth d = ceil(ln(1/δ)), a point estimate overcounts by at most
ε·N with probability ≥ 1−δ.  Merge = element-wise add (associative).
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import SALT_CONSTANT, double_hash_indices, murmur3_x64_128_batch
from ..serde import register_sketch


@register_sketch("cms")
class CountMinSketch:
    __slots__ = ("width", "depth", "table", "count")

    def __init__(self, width: int = 8192, depth: int = 4,
                 table: np.ndarray | None = None, count: int = 0):
        self.width = width
        self.depth = depth
        self.table = (table if table is not None
                      else np.zeros((depth, width), dtype=np.int64))
        self.count = count

    @classmethod
    def from_error(cls, epsilon: float = 1e-4, delta: float = 0.01):
        return cls(width=int(math.ceil(math.e / epsilon)),
                   depth=int(math.ceil(math.log(1.0 / delta))))

    def _indices(self, keys) -> np.ndarray:
        h1, h2 = murmur3_x64_128_batch(keys, seed=SALT_CONSTANT)
        return double_hash_indices(h1, h2, self.depth, self.width)

    def add_hashed(self, h1: np.ndarray, h2: np.ndarray) -> None:
        idx = double_hash_indices(h1, h2, self.depth, self.width)
        for d in range(self.depth):
            self.table[d] += np.bincount(idx[:, d],
                                         minlength=self.width).astype(np.int64)
        self.count += len(h1)

    def add(self, keys, counts=None) -> None:
        idx = self._indices(keys)  # (n, depth)
        n = idx.shape[0]
        w = np.ones(n, dtype=np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            self.table[d] += np.bincount(idx[:, d], weights=w,
                                         minlength=self.width).astype(np.int64)
        self.count += int(w.sum())

    def estimate(self, keys) -> np.ndarray:
        idx = self._indices(keys)
        ests = np.stack(
            [self.table[d][idx[:, d]] for d in range(self.depth)], axis=1
        )
        return ests.min(axis=1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge CMS with different geometry")
        return CountMinSketch(self.width, self.depth,
                              table=self.table + other.table,
                              count=self.count + other.count)

    def to_state(self):
        return ({"width": self.width, "depth": self.depth},
                self.table.tobytes(), self.count, self.count)

    @classmethod
    def from_state(cls, params, state, count, seq):
        w, d = int(params["width"]), int(params["depth"])
        table = np.frombuffer(state, dtype=np.int64).reshape(d, w).copy()
        return cls(w, d, table=table, count=count)


def cms_factory(width: int = 8192, depth: int = 4):
    """Picklable zero-arg constructor for distributed builds."""
    import functools

    return functools.partial(CountMinSketch, width, depth)
