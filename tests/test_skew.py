"""Salted two-phase aggregation, windows, top-k, url normalization."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from dabloomray.pipelines.skew import (
    salted_counts,
    top_k_by_count,
    tumbling_window_agg,
)
from dabloomray.stages.text import normalize_url


def collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )


def test_salted_counts_hot_key(ray_session):
    import ray.data as rd

    # one hot key with 80% of rows — the §4.4 pathology
    keys = ["hot"] * 8000 + [f"k{i}" for i in range(2000)]
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(4)
    out = collect(salted_counts(ds, "k", num_salts=8))
    got = dict(zip(out.column("k").to_pylist(), out.column("n").to_pylist()))
    assert got["hot"] == 8000
    assert got["k0"] == 1
    assert len(got) == 2001


def test_tumbling_window_matches_manual(ray_session):
    import ray.data as rd

    n = 5000
    ts = np.int64(1_700_000_000_000_000) + (
        np.arange(n, dtype=np.int64) * 7_311_000_000)  # ~2h span steps
    t = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array([f"t{i % 3}" for i in range(n)]),
        "value": pa.array(np.ones(n)),
    })
    ds = rd.from_arrow(t).repartition(3)
    out = collect(tumbling_window_agg(ds, "ts", "event_type", 3600))
    manual = collections.Counter(
        (f"t{i % 3}", int(ts[i] // 3_600_000_000))
        for i in range(n))
    got = {(r["event_type"], r["window_id"]): r["n"]
           for r in out.to_pylist()}
    assert got == dict(manual)


def test_top_k_deterministic(ray_session):
    import ray.data as rd

    keys = [f"u{i % 50:02d}" for i in range(5000)] + ["u07"] * 30
    ds = rd.from_arrow(pa.table({"u": keys})).repartition(4)
    out = top_k_by_count(ds, "u", k=5)
    assert out.num_rows == 5
    assert out.column("u")[0].as_py() == "u07"
    assert out.column("n")[0].as_py() == 130
    # ties broken by key ascending
    rest = out.column("u").to_pylist()[1:]
    assert rest == sorted(rest)


@pytest.mark.parametrize("url,want", [
    ("HTTPS://Example.COM:443/Path/page#frag", "https://example.com/Path/page"),
    ("http://a.b:80/", "http://a.b"),
    ("https://x.y/p/q/", "https://x.y/p/q"),
    ("https://x.y", "https://x.y"),
    ("not a url", "not a url"),
    ("", ""),
])
def test_normalize_url(url, want):
    t = pa.table({"url": pa.array([url], pa.string())})
    got = normalize_url(t).column("url_norm")[0].as_py()
    assert got == want


def test_salted_sketch_build_equals_hashed(ray_session):
    """build_sketch_salted (two-phase, hot-key-safe) == build_sketch
    _hashed, counter for counter, on a corpus where one key carries
    30% of all rows (the straggler scenario)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dabloomray.pipelines.core import (
        build_sketch_hashed,
        build_sketch_salted,
    )
    from dabloomray.serde import table_to_sketches
    from dabloomray.sketches.counting import counting_bloom_factory
    from dabloomray.sketches.hll import hll_factory

    keys = [f"key-{i}" for i in range(7000)] + ["hot-key"] * 3000
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(4)

    def collect(d):
        return pa.concat_tables(list(
            d.iter_batches(batch_size=None, batch_format="pyarrow")))

    for fac in (counting_bloom_factory(4000, 0.05), hll_factory(12)):
        a = table_to_sketches(collect(
            build_sketch_hashed(ds, "k", fac, num_partitions=4)))
        b = table_to_sketches(collect(
            build_sketch_salted(ds, "k", fac, num_partitions=4,
                                num_salts=5)))
        assert set(a) == set(b)
        for pid in a:
            if hasattr(a[pid], "counters"):
                assert np.array_equal(a[pid].counters, b[pid].counters)
                assert a[pid].count == b[pid].count
            else:  # HLL registers
                assert np.array_equal(a[pid].registers, b[pid].registers)
