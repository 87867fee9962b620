"""Scaling counting Bloom filter — seq-id-gated chain of counting blooms.

Reference semantics (src/dablooms.c):
  - ``new_counting_bloom_from_scale`` ≈L430: append sub-filter with
    geometrically tightened error rate (our r=0.9 per BASELINE.json;
    upstream ERROR_TIGHTENING_RATIO recalled 0.5) — our sub-filter
    capacity also grows geometrically x2 (upstream: constant), per spec.
  - ``scaling_bloom_add`` ≈L555: route to the newest filter whose
    ``header->id <= id``; grow when the newest is full
    (count >= capacity - 1) and the id is new (> max_id).
  - ``scaling_bloom_remove`` ≈L590: decrement only in the newest filter
    with ``header->id <= id``; no-op if no filter covers the id.
  - ``scaling_bloom_check`` ≈L610: OR over sub-filters, newest→oldest.
  - seqnum protocol ≈L560/≈L630: ``mem_seqnum`` zeroed during a
    mutation, set to seq+1 after; ``disk_seqnum`` updated on flush —
    we keep mem_seqnum as the applied-op generation and record
    ``ckpt_seqnum`` at checkpoint time (SURVEY.md §4.2).

NOT order-invariant: sub-filter boundaries depend on insert order, so
two scaling blooms are never merged into one chain.  Distribution is by
key ownership: hash-partition keys to P chains; the "global" filter is
the vector of per-partition chains (SURVEY.md §2.5).

Batch adds split at capacity boundaries so growth happens at exactly
the same insert ordinal as a sequential run (parity test §5.2(4)).
"""

from __future__ import annotations

import numpy as np

from ..params import ScalingPolicy
from ..serde import register_sketch
from .counting import CountingBloom


@register_sketch("scaling_bloom")
class ScalingBloom:
    __slots__ = ("policy", "blooms", "max_id", "mem_seqnum")

    def __init__(self, policy: ScalingPolicy | None = None,
                 blooms: list[CountingBloom] | None = None,
                 max_id: int = 0, mem_seqnum: int = 0):
        self.policy = policy or ScalingPolicy()
        self.blooms = blooms if blooms is not None else []
        self.max_id = max_id  # header->max_id
        self.mem_seqnum = mem_seqnum
        if not self.blooms:
            self._grow(first_id=0)

    # -- chain growth (new_counting_bloom_from_scale ≈L430) ---------------
    def _grow(self, first_id: int) -> CountingBloom:
        params = self.policy.sub_params(len(self.blooms))
        cb = CountingBloom(params, first_id=first_id)
        self.blooms.append(cb)
        return cb

    @property
    def capacity_total(self) -> int:
        return sum(b.params.capacity for b in self.blooms)

    @property
    def count_total(self) -> int:
        return sum(b.count for b in self.blooms)

    @property
    def metrics(self) -> dict:
        """Aggregated overflow/underflow no-op counts over the chain
        (reference ``bitmap_increment`` ≈L95 logs each event; we count
        them — parity metric, SURVEY.md §2.4)."""
        return {
            "overflows": sum(b.overflows for b in self.blooms),
            "underflows": sum(b.underflows for b in self.blooms),
        }

    # -- add (scaling_bloom_add ≈L555) -------------------------------------
    def add(self, keys, ids) -> None:
        """Vectorized batch add. ``ids`` must be monotonically
        non-decreasing within the batch (reference ordering assumption,
        SURVEY.md §1.1); the batch is split at capacity boundaries."""
        h1, h2 = CountingBloom.hash_keys(keys)
        self.add_hashed(h1, h2, ids)

    def add_hashed(self, h1: np.ndarray, h2: np.ndarray, ids) -> None:
        """Add pre-hashed keys (same routing/growth as :meth:`add`)."""
        ids = np.asarray(ids, dtype=np.int64)
        if len(ids) == 0:
            return
        pos = 0
        n = len(ids)
        while pos < n:
            cur = self.blooms[-1]
            # reference grow condition: count >= capacity - 1 and new id
            if cur.count >= cur.params.capacity - 1 and int(ids[pos]) > self.max_id:
                cur = self._grow(first_id=self.max_id + 1)
            room = max(1, (cur.params.capacity - 1) - cur.count)
            take = min(room, n - pos)
            sl = slice(pos, pos + take)
            cur.add_hashed(h1[sl], h2[sl])
            batch_max = int(ids[pos + take - 1])
            if batch_max > self.max_id:
                self.max_id = batch_max
            self.mem_seqnum += take
            pos += take

    # -- remove (scaling_bloom_remove ≈L590) -------------------------------
    def remove(self, keys, ids) -> np.ndarray:
        """Decrement each key only in the newest sub-filter whose
        first_id <= id.  Returns a bool mask of keys that were routed
        (False = no filter covers that id, reference returns 0)."""
        ids = np.asarray(ids, dtype=np.int64)
        if len(ids) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = CountingBloom.hash_keys(keys)
        first_ids = np.array([b.first_id for b in self.blooms], dtype=np.int64)
        # first_ids is strictly increasing along the chain
        which = np.searchsorted(first_ids, ids, side="right") - 1
        routed = which >= 0
        for fi in np.unique(which[routed]):
            m = which == fi
            self.blooms[fi].remove_hashed(h1[m], h2[m])
        self.mem_seqnum += int(routed.sum())
        return routed

    # -- check (scaling_bloom_check ≈L610) ---------------------------------
    def check(self, keys) -> np.ndarray:
        h1, h2 = CountingBloom.hash_keys(keys)
        return self.check_hashed(h1, h2)

    def check_hashed(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        out = np.zeros(len(h1), dtype=bool)
        for b in reversed(self.blooms):  # newest→oldest, early exit
            pending = ~out
            if not pending.any():
                break
            out[pending] |= b.check_hashed(h1[pending], h2[pending])
        return out

    # -- serde -------------------------------------------------------------
    def to_state(self):
        blobs, headers = [], []
        for b in self.blooms:
            blob = b.pack()
            headers.append({"first_id": b.first_id, "count": b.count,
                            "nbytes": len(blob)})
            blobs.append(blob)
        params = {"policy": self.policy.to_dict(), "headers": headers,
                  "max_id": self.max_id}
        return params, b"".join(blobs), self.count_total, self.mem_seqnum

    @classmethod
    def from_state(cls, params, state, count, seq):
        policy = ScalingPolicy.from_dict(params["policy"])
        blooms, off = [], 0
        for i, h in enumerate(params["headers"]):
            sub = policy.sub_params(i)
            blob = state[off : off + h["nbytes"]]
            off += h["nbytes"]
            blooms.append(CountingBloom.unpack(sub, blob,
                                               first_id=int(h["first_id"]),
                                               count=int(h["count"])))
        return cls(policy, blooms=blooms, max_id=int(params["max_id"]),
                   mem_seqnum=seq)
