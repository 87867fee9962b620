"""KLL — mergeable quantile sketch (Karnin, Lang, Liberty 2016).

NEW vs the reference (north_rule companion).  Standard compactor
hierarchy: level h stores items with implicit weight 2^h; when a level
overflows its capacity it is sorted and every other item is promoted to
level h+1 (the survivor parity is drawn from a deterministic
splitmix64 stream so runs are reproducible).  Published guarantee:
rank error ~ O(1/k) with high probability; merge = concatenate levels +
compact (associative within the bound).
"""

from __future__ import annotations

import numpy as np

from ..fixtures import splitmix64
from ..serde import register_sketch

_DEFAULT_K = 200


@register_sketch("kll")
class KLL:
    __slots__ = ("k", "levels", "count", "_rng_tick")

    def __init__(self, k: int = _DEFAULT_K, levels: list[np.ndarray] | None = None,
                 count: int = 0):
        self.k = k
        self.levels = levels if levels is not None else [np.zeros(0)]
        self.count = count
        self._rng_tick = count  # deterministic parity stream position

    def _capacity(self, h: int) -> int:
        depth = len(self.levels)
        c = int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - h)))
        return max(8, c)

    def add(self, values) -> None:
        from .tdigest import _as_float_array

        vals = _as_float_array(values)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.count += len(vals)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compact()

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._capacity(h):
                if h + 1 == len(self.levels):
                    self.levels.append(np.zeros(0))
                lvl = np.sort(self.levels[h])
                # deterministic coin: keep odd or even survivors
                coin = int(splitmix64(0xC0FFEE, np.uint64(self._rng_tick))) & 1
                self._rng_tick += 1
                promoted = lvl[coin::2]
                self.levels[h] = np.zeros(0)
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], promoted])
            h += 1

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("cannot merge KLL with different k")
        depth = max(len(self.levels), len(other.levels))
        levels = []
        for h in range(depth):
            a = self.levels[h] if h < len(self.levels) else np.zeros(0)
            b = other.levels[h] if h < len(other.levels) else np.zeros(0)
            levels.append(np.concatenate([a, b]))
        out = KLL(self.k, levels=levels, count=self.count + other.count)
        out._rng_tick = self._rng_tick + other._rng_tick + 1
        out._compact()
        return out

    def quantile(self, q) -> np.ndarray:
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        items, weights = [], []
        for h, lvl in enumerate(self.levels):
            if len(lvl):
                items.append(lvl)
                weights.append(np.full(len(lvl), 2 ** h, dtype=np.float64))
        if not items:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        items = np.concatenate(items)
        weights = np.concatenate(weights)
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights) - weights / 2.0
        out = np.interp(qs * weights.sum(), cum, items,
                        left=items[0], right=items[-1])
        return float(out[0]) if scalar else out

    def to_state(self):
        sizes = [len(l) for l in self.levels]
        blob = np.concatenate(self.levels) if self.levels else np.zeros(0)
        return ({"k": self.k, "sizes": sizes},
                blob.astype(np.float64).tobytes(), self.count, self._rng_tick)

    @classmethod
    def from_state(cls, params, state, count, seq):
        arr = np.frombuffer(state, dtype=np.float64)
        levels, off = [], 0
        for s in params["sizes"]:
            levels.append(arr[off : off + s].copy())
            off += s
        out = cls(int(params["k"]), levels=levels or [np.zeros(0)], count=count)
        out._rng_tick = seq
        return out


def kll_factory(k: int = _DEFAULT_K):
    import functools

    return functools.partial(KLL, k)
