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


@pytest.mark.parametrize("cls", [lambda: TDigest(200), lambda: KLL(200)])
def test_quantile_rank_error(cls):
    vals = _stream()
    sk = cls()
    sk.add(vals)
    s = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        # published-bound comparison (ROADMAP r1 #6): KLL k=200 has
        # eps ~ 2.3/k ≈ 1.15%; t-digest delta=200 is ~0.1% at the
        # median and tighter at the tails.  Measured on this stream:
        # t-digest ≤ 0.03%, KLL ≤ 0.7% — assert the measured class,
        # not just the loose published one.
        rank = np.searchsorted(s, est) / len(s)
        bound = 0.002 if isinstance(sk, TDigest) else 0.009
        assert abs(rank - q) < bound, (q, est, rank)


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
        # merge must not degrade past the single-sketch class
        bound = 0.004 if isinstance(merged, TDigest) else 0.012
        assert abs(rank - q) < bound, (q, rank)


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
