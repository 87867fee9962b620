"""Counting Bloom filter with 4-bit saturating counters — mergeable.

Reference semantics (src/dablooms.c):
  - ``counting_bloom_add``  ≈L330: k counter increments via double hashing
  - ``counting_bloom_remove`` ≈L350: k decrements, floor at 0
  - ``counting_bloom_check`` ≈L370: all k counters non-zero => present
  - ``bitmap_increment`` ≈L95: 4-bit nibble saturates at 0xF (overflow is
    a logged no-op that returns -1); two counters per byte on disk.
    We keep the no-op semantics and COUNT the events instead of
    logging each: ``overflows`` / ``underflows`` record how many
    increments/decrements were lost to saturation/floor (surfaced via
    ``metrics``, serialized with the sketch, summed on merge).

Our in-memory representation is an *unpacked* ``uint8`` array clipped to
15 (vectorized batch math), packed to nibbles only on serialization —
byte layout then matches the reference bitmap (even index → high
nibble, odd → low nibble, ``bitmap_increment`` ≈L95).

Merge = element-wise saturating add, which is associative + commutative
on non-negatives, so any combine-tree shape is valid (SURVEY.md §2.5).
Batch add via ``bincount`` + clip is identical to sequential saturating
increments; batch remove via subtract + floor likewise.
"""

from __future__ import annotations

import functools

import numpy as np

from ..hashing import SALT_CONSTANT, double_hash_indices, murmur3_x64_128_batch
from ..params import BloomParams
from ..serde import register_sketch

_MAX_COUNT = 15  # 4-bit saturating counter


def counting_bloom_factory(capacity: int, error_rate: float):
    """Picklable zero-arg constructor for distributed sketch builds
    (test modules aren't importable on Ray workers; library ones are)."""
    return functools.partial(CountingBloom, BloomParams(capacity, error_rate))


@register_sketch("counting_bloom")
class CountingBloom:
    """One partitioned counting bloom (reference counting_bloom_t)."""

    __slots__ = ("params", "counters", "count", "first_id",
                 "overflows", "underflows")

    def __init__(self, params: BloomParams, first_id: int = 0,
                 counters: np.ndarray | None = None, count: int = 0,
                 overflows: int = 0, underflows: int = 0):
        self.params = params
        self.counters = (
            counters if counters is not None
            else np.zeros(params.size, dtype=np.uint8)
        )
        self.count = count  # header->count: number of inserts
        self.first_id = first_id  # header->id: first seq id this filter covers
        self.overflows = overflows  # lost increments (bitmap_increment ≈L95)
        self.underflows = underflows  # lost decrements (floor at 0)

    @property
    def metrics(self) -> dict:
        return {"overflows": self.overflows, "underflows": self.underflows}

    # -- hashing -----------------------------------------------------------
    def _indices(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) flat counter indices: partition i gets hash i
        (hashes[i] + i*counts_per_func, counting_bloom_add ≈L330)."""
        p = self.params
        idx = double_hash_indices(h1, h2, p.nfuncs, p.counts_per_func)
        idx += np.arange(p.nfuncs, dtype=np.int64)[None, :] * p.counts_per_func
        return idx

    @staticmethod
    def hash_keys(keys) -> tuple[np.ndarray, np.ndarray]:
        return murmur3_x64_128_batch(keys, seed=SALT_CONSTANT)

    # -- core ops (vectorized over a batch of keys) ------------------------
    def add_hashed(self, h1: np.ndarray, h2: np.ndarray) -> None:
        idx = self._indices(h1, h2).ravel()
        delta = np.bincount(idx, minlength=self.params.size)
        wide = self.counters.astype(np.int64) + delta
        # lost increments == overflow no-ops of a sequential 4-bit run
        self.overflows += int(np.maximum(wide - _MAX_COUNT, 0).sum())
        # saturating add == sequential 4-bit increments with overflow no-op
        np.minimum(wide, _MAX_COUNT, out=wide)
        self.counters = wide.astype(np.uint8)
        self.count += len(h1)

    def remove_hashed(self, h1: np.ndarray, h2: np.ndarray) -> None:
        idx = self._indices(h1, h2).ravel()
        delta = np.bincount(idx, minlength=self.params.size)
        wide = self.counters.astype(np.int64) - delta
        # lost decrements == underflow no-ops (reference logs + returns -1)
        self.underflows += int(np.maximum(-wide, 0).sum())
        np.maximum(wide, 0, out=wide)
        self.counters = wide.astype(np.uint8)
        self.count = max(0, self.count - len(h1))

    def check_hashed(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        idx = self._indices(h1, h2)
        return (self.counters[idx] > 0).all(axis=1)

    def add(self, keys) -> None:
        self.add_hashed(*self.hash_keys(keys))

    def remove(self, keys) -> None:
        self.remove_hashed(*self.hash_keys(keys))

    def check(self, keys) -> np.ndarray:
        return self.check_hashed(*self.hash_keys(keys))

    # -- merge (NEW vs reference — distributed combine, SURVEY.md §2.5) ----
    def merge(self, other: "CountingBloom") -> "CountingBloom":
        if other.params != self.params:
            raise ValueError("cannot merge blooms with different geometry")
        wide = self.counters.astype(np.int64) + other.counters
        merge_lost = int(np.maximum(wide - _MAX_COUNT, 0).sum())
        merged = np.minimum(wide, _MAX_COUNT).astype(np.uint8)
        return CountingBloom(
            self.params,
            first_id=min(self.first_id, other.first_id),
            counters=merged,
            count=self.count + other.count,
            overflows=self.overflows + other.overflows + merge_lost,
            underflows=self.underflows + other.underflows,
        )

    # -- serde: packed nibbles, reference bitmap layout --------------------
    def pack(self) -> bytes:
        c = self.counters
        if len(c) % 2:
            c = np.concatenate([c, np.zeros(1, dtype=np.uint8)])
        even = c[0::2]  # high nibble (bitmap_increment ≈L95)
        odd = c[1::2]  # low nibble
        return ((even << 4) | odd).tobytes()

    def to_state(self):
        params = self.params.to_dict()
        params["first_id"] = self.first_id
        if self.overflows or self.underflows:
            params["overflows"] = self.overflows
            params["underflows"] = self.underflows
        return params, self.pack(), self.count, self.count

    @classmethod
    def from_state(cls, params, state, count, seq):
        p = BloomParams.from_dict(params)
        sk = cls.unpack(p, state, first_id=int(params.get("first_id", 0)),
                        count=count)
        sk.overflows = int(params.get("overflows", 0))
        sk.underflows = int(params.get("underflows", 0))
        return sk

    @classmethod
    def unpack(cls, params: BloomParams, data: bytes, first_id: int = 0,
               count: int = 0) -> "CountingBloom":
        packed = np.frombuffer(data, dtype=np.uint8)
        counters = np.empty(len(packed) * 2, dtype=np.uint8)
        counters[0::2] = packed >> 4
        counters[1::2] = packed & 0x0F
        return cls(params, first_id=first_id,
                   counters=counters[: params.size].copy(), count=count)
