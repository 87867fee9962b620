"""Property-based tests (hypothesis) — merge laws and kernel parity
over randomized inputs (SURVEY.md §5.2(3) 'property-style')."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dabloomray.hashing import murmur3_x64_128, murmur3_x64_128_batch
from dabloomray.params import BloomParams
from dabloomray.sketches.cms import CountMinSketch
from dabloomray.sketches.counting import CountingBloom
from dabloomray.sketches.hll import HyperLogLog

keys_strategy = st.lists(
    st.text(min_size=0, max_size=40), min_size=1, max_size=200)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=128),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_murmur_scalar_vectorized_agree(data, seed):
    h1, h2 = murmur3_x64_128(data, seed)
    v1, v2 = murmur3_x64_128_batch([data], seed=seed)
    assert (h1, h2) == (int(v1[0]), int(v2[0]))


@settings(max_examples=20, deadline=None)
@given(keys=keys_strategy, split=st.integers(min_value=0, max_value=199))
def test_counting_bloom_merge_equals_sequential(keys, split):
    split = min(split, len(keys))
    p = BloomParams(200, 0.05)
    a, b, seq = CountingBloom(p), CountingBloom(p), CountingBloom(p)
    if keys[:split]:
        a.add(keys[:split])
    if keys[split:]:
        b.add(keys[split:])
    seq.add(keys)
    m = a.merge(b)
    assert np.array_equal(m.counters, seq.counters)
    assert m.count == seq.count


@settings(max_examples=20, deadline=None)
@given(keys=keys_strategy,
       perm=st.permutations([0, 1, 2]))
def test_hll_merge_order_invariant(keys, perm):
    parts = [keys[0::3], keys[1::3], keys[2::3]]
    hs = []
    for part in parts:
        h = HyperLogLog(p=10)
        if part:
            h.add(part)
        hs.append(h)
    m1 = hs[0].merge(hs[1]).merge(hs[2])
    m2 = hs[perm[0]].merge(hs[perm[1]]).merge(hs[perm[2]])
    assert m1.estimate() == m2.estimate()


@settings(max_examples=20, deadline=None)
@given(keys=keys_strategy)
def test_cms_never_undercounts(keys):
    c = CountMinSketch(width=256, depth=3)
    c.add(keys)
    import collections

    true = collections.Counter(keys)
    distinct = list(true)
    est = c.estimate(distinct)
    for k, e in zip(distinct, est):
        assert e >= true[k]
