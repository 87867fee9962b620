"""Heavy hitters — CMS + candidate heap (SURVEY.md §2.6 "CMS+heap
top-k" stretch goal).

Mergeable approximate top-k: a count-min sketch estimates frequencies;
a bounded candidate map keeps the current top ``k_max`` keys by
estimate.  Merge = CMS add + union of candidate sets re-estimated
against the merged CMS (associative within CMS error; the union keeps
every key that was a candidate in ANY partial, so a global heavy
hitter can't be lost by partitioning — the standard mergeable
heavy-hitters argument, Cormode & Muthukrishnan 2005).
"""

from __future__ import annotations

from ..serde import register_sketch
from .cms import CountMinSketch


@register_sketch("topk")
class TopKSketch:
    __slots__ = ("cms", "k", "k_max", "candidates", "count")

    def __init__(self, k: int = 10, width: int = 8192, depth: int = 4,
                 cms: CountMinSketch | None = None,
                 candidates: dict[str, int] | None = None, count: int = 0):
        self.k = k
        self.k_max = 4 * k  # headroom so borderline keys survive merges
        self.cms = cms if cms is not None else CountMinSketch(width, depth)
        self.candidates = candidates if candidates is not None else {}
        self.count = count

    def add(self, keys) -> None:
        try:
            import pyarrow as pa

            if isinstance(keys, (pa.Array, pa.ChunkedArray)):
                keys = keys.to_pylist()
        except ImportError:  # pragma: no cover
            pass
        keys = [k if isinstance(k, str) else str(k) for k in keys]
        self.cms.add(keys)
        self.count += len(keys)
        # only batch-distinct keys need re-estimation
        distinct = list(dict.fromkeys(keys))
        est = self.cms.estimate(distinct)
        for key, e in zip(distinct, est):
            self.candidates[key] = int(e)
        self._trim()

    def _trim(self) -> None:
        if len(self.candidates) > self.k_max:
            keep = sorted(self.candidates.items(),
                          key=lambda kv: (-kv[1], kv[0]))[: self.k_max]
            self.candidates = dict(keep)

    def merge(self, other: "TopKSketch") -> "TopKSketch":
        if self.k != other.k:
            raise ValueError("cannot merge TopK with different k")
        cms = self.cms.merge(other.cms)
        union = list(dict.fromkeys(list(self.candidates)
                                   + list(other.candidates)))
        est = cms.estimate(union)
        merged = TopKSketch(self.k, cms.width, cms.depth, cms=cms,
                            candidates={u: int(e) for u, e in zip(union, est)},
                            count=self.count + other.count)
        merged._trim()
        return merged

    def top(self, k: int | None = None) -> list[tuple[str, int]]:
        """Top-k (key, estimated count), count desc then key asc."""
        k = k or self.k
        return sorted(self.candidates.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]

    # -- serde -------------------------------------------------------------
    def to_state(self):
        cms_params, cms_state, _, _ = self.cms.to_state()
        params = {"k": self.k, "cms": cms_params,
                  "candidates": self.candidates}
        return params, cms_state, self.count, self.count

    @classmethod
    def from_state(cls, params, state, count, seq):
        cms = CountMinSketch.from_state(params["cms"], state, count, seq)
        return cls(int(params["k"]), cms.width, cms.depth, cms=cms,
                   candidates={k: int(v)
                               for k, v in params["candidates"].items()},
                   count=count)


def topk_factory(k: int = 10, width: int = 8192, depth: int = 4):
    import functools

    return functools.partial(TopKSketch, k, width, depth)
