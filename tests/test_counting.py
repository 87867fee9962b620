"""Counting bloom core semantics + merge laws (SURVEY.md §5.2 items 2,3)."""

import numpy as np
import pytest

from dabloomray.params import BloomParams, ScalingPolicy
from dabloomray.sketches.counting import CountingBloom


def words(n, tag=""):
    return [f"w{tag}{i:07d}" for i in range(n)]


def test_geometry_closed_form():
    # nfuncs = ceil(log2(1/err)); cpf = ceil(cap*|ln err|/(nfuncs*ln^2 2))
    p = BloomParams(capacity=100_000, error_rate=0.05)
    assert p.nfuncs == 5  # ceil(log2(20)) = 5
    import math
    assert p.counts_per_func == math.ceil(
        100_000 * abs(math.log(0.05)) / (5 * math.log(2) ** 2))
    assert p.size == p.nfuncs * p.counts_per_func


def test_scaling_policy_budget():
    pol = ScalingPolicy(capacity0=1000, target_error=0.05, tightening_ratio=0.9)
    assert pol.err0 == pytest.approx(0.005)
    # sum of the infinite chain err series stays under target
    total = sum(pol.err0 * 0.9 ** (i + 1) for i in range(200))
    assert total <= 0.05
    assert pol.sub_params(3).capacity == 8000


def test_add_check_no_false_negatives():
    p = BloomParams(5000, 0.05)
    cb = CountingBloom(p)
    keys = words(5000)
    cb.add(keys)
    assert cb.count == 5000
    assert cb.check(keys).all()


def test_fpr_within_bound():
    p = BloomParams(10_000, 0.05)
    cb = CountingBloom(p)
    cb.add(words(10_000))
    neg = words(20_000, tag="x")
    fpr = cb.check(neg).mean()
    assert fpr <= 0.05


def test_remove_semantics():
    p = BloomParams(2000, 0.05)
    cb = CountingBloom(p)
    keys = words(2000)
    cb.add(keys)
    removed = keys[::2]
    cb.remove(removed)
    kept = keys[1::2]
    assert cb.check(kept).all()  # zero false negatives after removes
    # removed keys mostly gone (some may collide with kept keys)
    assert cb.check(removed).mean() < 0.25


def test_batch_add_equals_sequential():
    p = BloomParams(500, 0.05)
    a = CountingBloom(p)
    b = CountingBloom(p)
    keys = words(400) + words(100)  # duplicates to stress saturation
    a.add(keys)
    for k in keys:
        b.add([k])
    assert np.array_equal(a.counters, b.counters)
    assert a.count == b.count


def test_saturation_at_15():
    p = BloomParams(100, 0.05)
    cb = CountingBloom(p)
    cb.add(["hot"] * 40)  # 40 > 15: counters saturate
    assert cb.counters.max() == 15
    assert cb.check(["hot"])[0]
    # lossy remove after saturation — reference overflow caveat (C1)
    cb.remove(["hot"] * 16)
    assert not cb.check(["hot"])[0]


def test_merge_associative_commutative():
    p = BloomParams(3000, 0.05)
    keys = words(3000)
    parts = [keys[0::3], keys[1::3], keys[2::3]]
    blooms = []
    for part in parts:
        cb = CountingBloom(p)
        cb.add(part)
        blooms.append(cb)
    m1 = blooms[0].merge(blooms[1]).merge(blooms[2])
    m2 = blooms[0].merge(blooms[1].merge(blooms[2]))
    m3 = blooms[2].merge(blooms[0]).merge(blooms[1])
    assert np.array_equal(m1.counters, m2.counters)
    assert np.array_equal(m1.counters, m3.counters)
    assert m1.count == 3000
    # partitioned build + merge == sequential build
    seq = CountingBloom(p)
    seq.add(keys)
    assert np.array_equal(m1.counters, seq.counters)


def test_pack_unpack_roundtrip():
    p = BloomParams(1000, 0.05)
    cb = CountingBloom(p, first_id=17)
    cb.add(words(900))
    data = cb.pack()
    # two 4-bit counters per byte, reference layout (bitmap_increment ≈L95)
    assert len(data) == (p.size + 1) // 2
    back = CountingBloom.unpack(p, data, first_id=17, count=cb.count)
    assert np.array_equal(back.counters, cb.counters)
    assert back.check(words(900)).all()


def test_merge_geometry_mismatch_raises():
    a = CountingBloom(BloomParams(100, 0.05))
    b = CountingBloom(BloomParams(200, 0.05))
    with pytest.raises(ValueError):
        a.merge(b)


def test_overflow_underflow_counters():
    """Reference bitmap_increment ≈L95 logs '4 bit int Overflow' and
    returns -1 (no-op); we keep the no-op and COUNT the events —
    batch counts equal a sequential saturating run's no-op count, the
    counters survive serde, and merges sum them."""
    from dabloomray.params import BloomParams
    from dabloomray.serde import sketch_from_row, sketch_to_row
    from dabloomray.sketches.counting import CountingBloom

    p = BloomParams(1000, 0.05)
    cb = CountingBloom(p)
    key = ["same-key"] * 40  # k counters driven past 15
    cb.add(key)
    k = p.nfuncs
    assert cb.metrics["overflows"] == (40 - 15) * k
    assert cb.metrics["underflows"] == 0
    # removing 40 brings each counter 15→0 with 25 lost decrements each
    cb.remove(key)
    assert cb.metrics["underflows"] == (40 - 15) * k
    # removing an absent key floors at 0 → k more underflows
    cb.remove(["never-added"])
    assert cb.metrics["underflows"] == (40 - 15) * k + k

    # batch == sequential event counts
    seq = CountingBloom(p)
    for w in key:
        seq.add([w])
    assert seq.metrics["overflows"] == cb.metrics["overflows"]

    # serde roundtrip keeps the metric; merge sums + counts merge loss
    back = sketch_from_row(sketch_to_row(cb))
    assert back.metrics == cb.metrics
    a, b = CountingBloom(p), CountingBloom(p)
    a.add(["x"] * 10)
    b.add(["x"] * 10)
    merged = a.merge(b)  # 20 per counter → 5 lost in the merge itself
    assert merged.metrics["overflows"] == 5 * k
