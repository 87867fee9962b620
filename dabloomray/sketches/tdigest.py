"""t-digest — mergeable quantile sketch (Dunning & Ertl, 2019).

NEW vs the reference (north_rule companion).  Merging-digest variant:
centroids (mean, weight) kept sorted; compression bounds centroid
q-spans via the k1 scale function k(q) = asin(2q−1)/(2π), giving small
rank error at the tails.  Merge = concatenate + recompress
(associative within the published rank-error bound).
"""

from __future__ import annotations

import numpy as np

from ..serde import register_sketch


def _k(q: np.ndarray) -> np.ndarray:
    return np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) / (2.0 * np.pi)


@register_sketch("tdigest")
class TDigest:
    __slots__ = ("compression", "means", "weights", "count", "_buf")

    def __init__(self, compression: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None, count: int = 0):
        self.compression = compression
        self.means = means if means is not None else np.zeros(0)
        self.weights = weights if weights is not None else np.zeros(0)
        self.count = count
        self._buf: list[np.ndarray] = []

    # -- build -------------------------------------------------------------
    def add(self, values) -> None:
        vals = _as_float_array(values)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.count += len(vals)
        self._buf.append(vals)
        if sum(len(b) for b in self._buf) >= 32 * self.compression:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        vals = np.concatenate(self._buf)
        self._buf = []
        means = np.concatenate([self.means, vals])
        weights = np.concatenate([self.weights, np.ones(len(vals))])
        self.means, self.weights = _compress(means, weights, self.compression)

    # -- merge -------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        self._flush()
        other._flush()
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        m, w = _compress(means, weights, self.compression)
        return TDigest(self.compression, means=m, weights=w,
                       count=self.count + other.count)

    # -- query -------------------------------------------------------------
    def quantile(self, q) -> np.ndarray:
        """Interpolated quantile(s); scalar in → scalar out."""
        self._flush()
        scalar = np.isscalar(q)
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            out = np.full(len(qs), np.nan)
            return float(out[0]) if scalar else out
        w = self.weights
        W = w.sum()
        # centroid i spans [cum_i - w_i/2, cum_i + w_i/2] in rank space
        cum = np.cumsum(w) - w / 2.0
        targets = qs * W
        out = np.interp(targets, cum, self.means,
                        left=self.means[0], right=self.means[-1])
        return float(out[0]) if scalar else out

    # -- serde -------------------------------------------------------------
    def to_state(self):
        self._flush()
        state = np.concatenate([self.means, self.weights]).astype(np.float64)
        return ({"compression": self.compression, "n_centroids": len(self.means)},
                state.tobytes(), self.count, self.count)

    @classmethod
    def from_state(cls, params, state, count, seq):
        n = int(params["n_centroids"])
        arr = np.frombuffer(state, dtype=np.float64)
        return cls(int(params["compression"]), means=arr[:n].copy(),
                   weights=arr[n:].copy(), count=count)


def _as_float_array(values) -> np.ndarray:
    try:
        import pyarrow as pa

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            return values.to_numpy(zero_copy_only=False).astype(np.float64)
    except ImportError:  # pragma: no cover
        pass
    return np.asarray(values, dtype=np.float64)


def _compress(means: np.ndarray, weights: np.ndarray,
              compression: int) -> tuple[np.ndarray, np.ndarray]:
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    W = weights.sum()
    out_m, out_w = [], []
    cur_m, cur_w = means[0], weights[0]
    q0 = 0.0
    qlimit = _k_inv(_k(np.array([q0]))[0] + 1.0 / compression)
    for i in range(1, len(means)):
        w = weights[i]
        if (q0 + (cur_w + w) / W) <= qlimit:
            # weighted absorb
            cur_m += (means[i] - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            q0 += cur_w / W
            qlimit = _k_inv(_k(np.array([q0]))[0] + 1.0 / compression)
            cur_m, cur_w = means[i], w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _k_inv(k: float) -> float:
    return (np.sin(np.clip(k, -0.25, 0.25) * 2.0 * np.pi) + 1.0) / 2.0


def tdigest_factory(compression: int = 200):
    import functools

    return functools.partial(TDigest, compression)
