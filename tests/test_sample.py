"""Deterministic hash sampling + broadcast dimension joins."""

import numpy as np
import pyarrow as pa
import pytest

from dabloomray.stages.sample import sample_by_hash


def _ids(ds):
    return sorted(r["k"] for r in ds.select_columns(["k"]).take_all())


@pytest.fixture()
def keyed_ds(ray_session):
    import ray.data as rd

    n = 20_000
    tab = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "key": pa.array([f"key-{i}" for i in range(n)], pa.string()),
    })
    return tab, rd.from_arrow(tab)


def test_hash_sample_fraction_and_determinism(keyed_ds):
    import ray.data as rd

    tab, ds = keyed_ds
    n = tab.num_rows
    got = _ids(sample_by_hash(ds, "key", 0.2))
    # binomial bound: p=0.2, n=20k → std ~56; allow 5 sigma
    assert abs(len(got) - 0.2 * n) < 5 * np.sqrt(n * 0.2 * 0.8)
    # identical row set across re-runs and block layouts
    assert _ids(sample_by_hash(ds.repartition(7), "key", 0.2)) == got
    assert _ids(sample_by_hash(rd.from_arrow(tab).repartition(2),
                               "key", 0.2)) == got
    # monotone in fraction: the 10% sample is a subset of the 20% one
    smaller = _ids(sample_by_hash(ds, "key", 0.1))
    assert set(smaller) <= set(got)


def test_hash_sample_keeps_duplicate_keys_together(ray_session):
    import ray.data as rd

    keys = [f"key-{i % 500}" for i in range(5000)]  # 10 dups per key
    ds = rd.from_arrow(pa.table({
        "k": pa.array(range(5000), pa.int64()),
        "key": pa.array(keys, pa.string()),
    }))
    out = sample_by_hash(ds, "key", 0.3).take_all()
    sampled_keys = {}
    for r in out:
        sampled_keys.setdefault(r["key"], 0)
        sampled_keys[r["key"]] += 1
    # every sampled key brought ALL its duplicates
    assert all(v == 10 for v in sampled_keys.values())


def test_hash_sample_edges(keyed_ds):
    _, ds = keyed_ds
    assert sample_by_hash(ds, "key", 0.0).count() == 0
    assert sample_by_hash(ds, "key", 1.0).count() == ds.count()
    with pytest.raises(ValueError):
        sample_by_hash(ds, "key", 1.5)


def test_broadcast_join_matches_hash_join(ray_session):
    """BroadcastLookup (zero-shuffle dim join) == plain inner join."""
    import ray.data as rd

    from dabloomray.stages.lookup import broadcast_join

    dim = pa.table({
        "nk": pa.array([0, 1, 2, 4], pa.int32()),
        "name": pa.array(["a", "b", "c", "e"], pa.string()),
    })
    rng = np.random.default_rng(3)
    fact_keys = rng.integers(0, 6, size=2000).astype(np.int32)  # 3,5 miss
    fact = pa.table({
        "row": pa.array(range(2000), pa.int64()),
        "nk": pa.array(fact_keys, pa.int32()),
    })
    out = broadcast_join(rd.from_arrow(fact).repartition(4), dim,
                         dim_key="nk", key_col="nk", add_cols=["name"])
    got = sorted((r["row"], r["name"]) for r in out.take_all())
    lut = dict(zip(dim.column("nk").to_pylist(),
                   dim.column("name").to_pylist()))
    want = sorted((i, lut[k]) for i, k in enumerate(fact_keys.tolist())
                  if k in lut)
    assert got == want


def test_broadcast_join_refuses_large_side(ray_session):
    import ray.data as rd

    from dabloomray.stages.lookup import broadcast_join

    big = pa.table({"nk": pa.array(range(1000), pa.int64()),
                    "name": pa.array(["x" * 100] * 1000)})
    with pytest.raises(ValueError):
        broadcast_join(rd.from_arrow(big), big, "nk", "nk", ["name"],
                       max_dim_bytes=1024)
