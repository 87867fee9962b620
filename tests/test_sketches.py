"""Companion sketches: accuracy within published bounds + merge laws
(SURVEY.md §5.2(3), FIXTURES.md F4)."""

import numpy as np
import pytest

from dabloomray.fixtures import make_urls_table, splitmix64
from dabloomray.serde import sketch_from_row, sketch_to_row
from dabloomray.sketches.cms import CountMinSketch
from dabloomray.sketches.hll import HyperLogLog
from dabloomray.sketches.kll import KLL
from dabloomray.sketches.tdigest import TDigest


def keys(n, tag=""):
    return [f"k{tag}{i:08d}" for i in range(n)]


# -- HLL -------------------------------------------------------------------

def test_hll_sparse_exact():
    h = HyperLogLog(p=14)
    h.add(keys(3000) + keys(1000))  # duplicates
    assert h.sparse
    assert h.estimate() == 3000  # exact below sparse limit


def test_hll_dense_within_bound():
    h = HyperLogLog(p=12)  # m=4096, rel err ~1.04/64 = 1.6%
    n = 200_000
    h.add(keys(n))
    assert not h.sparse
    rel = abs(h.estimate() - n) / n
    assert rel < 3 * 1.04 / np.sqrt(4096)  # 3 sigma


def test_hll_merge_equals_sequential():
    parts = [keys(5000, tag=str(t)) for t in range(4)]
    hs = []
    for p in parts:
        h = HyperLogLog(p=12)
        h.add(p)
        hs.append(h)
    merged = hs[0].merge(hs[1]).merge(hs[2]).merge(hs[3])
    seq = HyperLogLog(p=12)
    seq.add([k for p in parts for k in p])
    assert merged.estimate() == pytest.approx(seq.estimate())
    # associativity
    m2 = hs[0].merge(hs[1].merge(hs[2].merge(hs[3])))
    assert m2.estimate() == pytest.approx(merged.estimate())


def test_hll_sparse_dense_mixed_merge():
    a = HyperLogLog(p=10)
    a.add(keys(100))
    b = HyperLogLog(p=10)
    b.add(keys(50_000, tag="b"))
    m = a.merge(b)
    seq = HyperLogLog(p=10)
    seq.add(keys(100) + keys(50_000, tag="b"))
    assert m.estimate() == pytest.approx(seq.estimate())


def test_hll_serde():
    for n in (100, 50_000):  # sparse and dense
        h = HyperLogLog(p=12)
        h.add(keys(n))
        back = sketch_from_row(sketch_to_row(h))
        assert back.estimate() == pytest.approx(h.estimate())


# -- CMS -------------------------------------------------------------------

def test_cms_exact_on_small_domains():
    c = CountMinSketch(width=8192, depth=4)
    stream = keys(8) * 100 + keys(3) * 50
    c.add(stream)
    est = c.estimate(keys(8))
    assert list(est[:3]) == [150, 150, 150]
    assert list(est[3:]) == [100] * 5


def test_cms_overcount_bound():
    c = CountMinSketch.from_error(epsilon=0.005, delta=0.01)
    n = 50_000
    c.add(keys(n))
    est = c.estimate(keys(1000))
    assert (est >= 1).all()  # never undercounts
    assert (est <= 1 + 0.005 * n).all()


def test_cms_merge_equals_sequential():
    parts = [keys(4000, tag=str(t)) for t in range(3)]
    cs = []
    for p in parts:
        c = CountMinSketch(width=2048, depth=4)
        c.add(p)
        cs.append(c)
    merged = cs[0].merge(cs[1]).merge(cs[2])
    seq = CountMinSketch(width=2048, depth=4)
    seq.add([k for p in parts for k in p])
    assert np.array_equal(merged.table, seq.table)
    m2 = cs[2].merge(cs[0]).merge(cs[1])
    assert np.array_equal(m2.table, merged.table)


def test_cms_weighted_add_and_serde():
    c = CountMinSketch(width=1024, depth=3)
    c.add(["a", "b"], counts=[10, 5])
    assert list(c.estimate(["a", "b"])) == [10, 5]
    back = sketch_from_row(sketch_to_row(c))
    assert np.array_equal(back.table, c.table)


# -- t-digest / KLL --------------------------------------------------------

def _stream(n=100_000):
    # deterministic heavy-tailed stream
    u = splitmix64(7, np.arange(n, dtype=np.uint64)).astype(np.float64)
    u /= 2.0 ** 64
    return np.exp(4 * u)  # log-uniform in [1, e^4]


def _published_bound(sk, q: float) -> float:
    """The PUBLISHED (k/δ-parameterized) rank-error ceiling the sketch
    claims (VERDICT r3 #7 — asserts cite the bound they check):

    - t-digest (Dunning & Ertl 2019, k1 scale function §3): a centroid
      near quantile q spans Δq ≤ Δk/k'(q) = 2π·sqrt(q(1-q))/δ (with
      k(q) = asin(2q-1)/2π, k'(q) = 1/(2π·sqrt(q(1-q))), Δk = 1/δ);
      midpoint interpolation then errs by at most half a span:
      ε(q) ≤ π·sqrt(q(1-q))/δ.  δ=200, q=0.5 → 0.79%, q=0.01 → 0.16%.
    - KLL (Karnin-Lang-Liberty 2016: ε = O(sqrt(log 1/δ_fail)/k));
      the Apache DataSketches calibration of the same 2/3-compaction
      family fits the 99%-confidence constant: ε(k) ≈ 2.296/k^0.9433
      — k=200 → ~1.55%.
    """
    if isinstance(sk, TDigest):
        return float(np.pi * np.sqrt(q * (1 - q)) / sk.compression)
    return float(2.296 / sk.k ** 0.9433)


@pytest.mark.parametrize("cls", [lambda: TDigest(200), lambda: KLL(200)])
def test_quantile_rank_error(cls):
    vals = _stream()
    sk = cls()
    sk.add(vals)
    s = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        rank = np.searchsorted(s, est) / len(s)
        err = abs(rank - q)
        # the implementation must honour its published guarantee...
        assert err < _published_bound(sk, q), (q, est, rank)
        # ...and stay in the MEASURED class (t-digest ≤ 0.03%, KLL
        # ≤ 0.7% on this stream) so accuracy regressions still fail
        # even while inside the published ceiling
        assert err < (0.002 if isinstance(sk, TDigest) else 0.009), (
            q, est, rank)


@pytest.mark.parametrize("cls", [lambda: TDigest(200), lambda: KLL(200)])
def test_quantile_merge_within_bound(cls):
    vals = _stream(60_000)
    parts = np.array_split(vals, 5)
    sks = []
    for p in parts:
        sk = cls()
        sk.add(p)
        sks.append(sk)
    merged = sks[0]
    for sk in sks[1:]:
        merged = merged.merge(sk)
    assert merged.count == len(vals)
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.95):
        rank = np.searchsorted(s, merged.quantile(q)) / len(s)
        err = abs(rank - q)
        # merge = concat + recompress keeps every centroid within the
        # same k1 Δk ≤ 1/δ span, so the published ceiling still holds
        # post-merge (KLL merge consumes one compaction level — allow
        # the next-k ceiling by doubling)
        cap = _published_bound(merged, q)
        assert err < (cap if isinstance(merged, TDigest) else 2 * cap), (
            q, rank)
        # measured class: merge must not degrade past ~2x single-pass
        assert err < (0.004 if isinstance(merged, TDigest) else 0.012), (
            q, rank)


@pytest.mark.parametrize("cls", [lambda: TDigest(100), lambda: KLL(150)])
def test_quantile_serde(cls):
    vals = _stream(20_000)
    sk = cls()
    sk.add(vals)
    back = sketch_from_row(sketch_to_row(sk))
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == pytest.approx(sk.quantile(q))


def test_tdigest_monotone_and_empty():
    td = TDigest(100)
    assert np.isnan(td.quantile(0.5))
    td.add(np.arange(1000, dtype=np.float64))
    qs = td.quantile(np.linspace(0, 1, 21))
    assert (np.diff(qs) >= 0).all()
    assert td.quantile(0.0) == pytest.approx(0.0, abs=2)
    assert td.quantile(1.0) == pytest.approx(999.0, abs=2)
