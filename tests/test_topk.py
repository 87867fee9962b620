"""Heavy-hitters sketch: exactness on skewed data + merge laws."""

import numpy as np
import pytest

from dabloomray.fixtures import splitmix64
from dabloomray.serde import sketch_from_row, sketch_to_row
from dabloomray.sketches.topk import TopKSketch, topk_factory


def zipf_stream(n=30_000, n_keys=500):
    """Deterministic zipf-ish stream: key i has weight ~ 1/(i+1)."""
    u = splitmix64(9, np.arange(n, dtype=np.uint64)).astype(np.float64)
    u /= 2.0 ** 64
    ranks = np.minimum((1.0 / (u + 1e-9) - 1).astype(np.int64), n_keys - 1)
    return [f"key{r:04d}" for r in ranks]


def exact_top(stream, k):
    import collections

    c = collections.Counter(stream)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_topk_matches_exact_on_skewed_stream():
    stream = zipf_stream()
    tk = TopKSketch(k=10, width=8192, depth=4)
    for s in range(0, len(stream), 4096):
        tk.add(stream[s : s + 4096])
    got = tk.top()
    want = exact_top(stream, 10)
    assert [k for k, _ in got] == [k for k, _ in want]
    for (gk, ge), (wk, we) in zip(got, want):
        assert ge >= we  # CMS never undercounts
        assert ge <= we + 0.005 * len(stream)


def test_topk_merge_equals_sequential():
    stream = zipf_stream(20_000)
    parts = [stream[i::4] for i in range(4)]
    sks = []
    for p in parts:
        sk = TopKSketch(k=5, width=4096, depth=4)
        sk.add(p)
        sks.append(sk)
    merged = sks[0].merge(sks[1]).merge(sks[2]).merge(sks[3])
    seq = TopKSketch(k=5, width=4096, depth=4)
    seq.add(stream)
    assert np.array_equal(merged.cms.table, seq.cms.table)
    assert [k for k, _ in merged.top()] == [k for k, _ in seq.top()]
    # associativity of the top set
    m2 = sks[2].merge(sks[3]).merge(sks[0].merge(sks[1]))
    assert [k for k, _ in m2.top()] == [k for k, _ in merged.top()]


def test_topk_serde_roundtrip():
    sk = TopKSketch(k=3, width=1024, depth=3)
    sk.add(["a"] * 50 + ["b"] * 30 + ["c"] * 10 + ["d"])
    back = sketch_from_row(sketch_to_row(sk))
    assert back.top() == sk.top()
    assert back.count == sk.count


def test_topk_distributed_build(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dabloomray.pipelines.core import build_sketch
    from dabloomray.serde import table_to_sketches

    stream = zipf_stream(15_000)
    ds = rd.from_arrow(pa.table({"k": stream})).repartition(4)
    tab = pa.concat_tables(list(
        build_sketch(ds, "k", topk_factory(10, 4096, 4))
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    sk = table_to_sketches(tab)[0]
    want = exact_top(stream, 10)
    assert [k for k, _ in sk.top()] == [k for k, _ in want]
