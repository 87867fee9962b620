"""Ray pipeline tests: distributed == sequential (SURVEY.md §5.2(4))."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from dabloomray.fixtures import make_urls_table, make_words
from dabloomray.hashing import partition_ids
from dabloomray.params import BloomParams, ScalingPolicy
from dabloomray.pipelines.core import (
    build_scaling_bloom,
    build_sketch,
    build_sketch_grouped,
    check_membership,
    dedup_approx,
    dedup_exact,
)
from dabloomray.serde import table_to_sketches
from dabloomray.sketches.counting import CountingBloom, counting_bloom_factory
from dabloomray.sketches.scaling import ScalingBloom


def collect(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )


@pytest.fixture(scope="module")
def words_ds(ray_session):
    import ray.data as rd

    words = make_words(12_000)
    return words, rd.from_arrow(words).repartition(6)


factory = counting_bloom_factory(3000, 0.05)


def test_build_sketch_partitioned_parity(words_ds):
    words, ds = words_ds
    table = collect(build_sketch(ds, "word", factory, num_partitions=4))
    sks = table_to_sketches(table)
    wl = np.array(words.column("word").to_pylist())
    pids = partition_ids(list(wl), 4)
    for p in range(4):
        seq = factory()
        seq.add(list(wl[pids == p]))
        assert np.array_equal(seq.counters, sks[p].counters)
        assert seq.count == sks[p].count


def test_build_sketch_global(words_ds):
    words, ds = words_ds
    table = collect(build_sketch(ds, "word", factory, num_partitions=None))
    assert table.num_rows == 1
    sk = table_to_sketches(table)[0]
    seq = factory()
    seq.add(words.column("word"))
    assert np.array_equal(seq.counters, sk.counters)


def test_hashed_build_matches_partial_path(words_ds):
    from dabloomray.pipelines.core import build_sketch_hashed

    words, ds = words_ds
    t1 = collect(build_sketch(ds, "word", factory, num_partitions=4))
    t2 = collect(build_sketch_hashed(ds, "word", factory, num_partitions=4))
    a, b = table_to_sketches(t1), table_to_sketches(t2)
    assert set(a) == set(b)
    for pid in a:
        assert np.array_equal(a[pid].counters, b[pid].counters)
        assert a[pid].count == b[pid].count


def test_grouped_udaf_matches_partial_path(words_ds):
    words, ds = words_ds
    t1 = collect(build_sketch(ds, "word", factory, num_partitions=4))
    rows = build_sketch_grouped(ds, "word", factory, num_partitions=4).take_all()
    a = table_to_sketches(t1)
    for row in rows:
        sk_row = row["sketch"]
        from dabloomray.serde import sketch_from_row

        b = sketch_from_row(sk_row)
        assert np.array_equal(a[row["part_id"]].counters, b.counters)


def test_udaf_and_hashed_paths_for_hll_and_cms(words_ds):
    """All three build strategies agree for every hash-kernel sketch."""
    from dabloomray.pipelines.core import build_sketch_hashed
    from dabloomray.serde import sketch_from_row
    from dabloomray.sketches.cms import cms_factory
    from dabloomray.sketches.hll import hll_factory

    words, ds = words_ds
    for fac, cmp in [
        (hll_factory(12), lambda a, b: a.estimate() == b.estimate()),
        (cms_factory(2048, 4), lambda a, b: np.array_equal(a.table, b.table)),
    ]:
        t_partial = collect(build_sketch(ds, "word", fac, num_partitions=2))
        t_hashed = collect(build_sketch_hashed(ds, "word", fac,
                                               num_partitions=2))
        rows_udaf = build_sketch_grouped(ds, "word", fac,
                                         num_partitions=2).take_all()
        a = table_to_sketches(t_partial)
        b = table_to_sketches(t_hashed)
        c = {r["part_id"]: sketch_from_row(r["sketch"]) for r in rows_udaf}
        for pid in a:
            assert cmp(a[pid], b[pid])
            assert cmp(a[pid], c[pid])


def test_check_membership_verdicts(words_ds):
    words, ds = words_ds
    table = collect(build_sketch(ds, "word", factory, num_partitions=4))
    got = collect(check_membership(ds, table, "word", concurrency=2))
    assert got.num_rows == words.num_rows
    assert got.column("member").to_numpy().all()  # zero false negatives


def test_scaling_chain_distributed_equals_sequential(words_ds):
    words, ds = words_ds
    pol = ScalingPolicy(capacity0=1500, target_error=0.05)
    sbt = collect(build_scaling_bloom(ds, "word", "seq_id", pol,
                                      num_partitions=4))
    sks = table_to_sketches(sbt)
    wl = np.array(words.column("word").to_pylist())
    ids = words.column("seq_id").to_numpy()
    pids = partition_ids(list(wl), 4)
    for p in range(4):
        seq = ScalingBloom(ScalingPolicy(capacity0=1500, target_error=0.05))
        seq.add(list(wl[pids == p]), ids[pids == p])
        got = sks[p]
        assert len(seq.blooms) == len(got.blooms)
        for a, b in zip(seq.blooms, got.blooms):
            assert a.first_id == b.first_id
            assert np.array_equal(a.counters, b.counters)


def test_scaling_chain_op_stream(ray_session):
    """F3 ops stream: interleaved add/remove applied in seq order
    matches a sequential per-partition replay (G2/G3 routing)."""
    import ray.data as rd

    words = make_words(4000)
    wl = np.array(words.column("word").to_pylist())
    ids = words.column("seq_id").to_numpy()
    ops = np.where((ids % 4 == 0) & (ids > 0), "remove", "add")
    t = pa.table({
        "word": pa.array(wl, pa.string()),
        "seq_id": pa.array(ids),
        "op": pa.array(ops, pa.string()),
    })
    pol = ScalingPolicy(capacity0=800, target_error=0.05)
    ds = rd.from_arrow(t).repartition(4)
    sbt = collect(build_scaling_bloom(ds, "word", "seq_id", pol,
                                      num_partitions=3, op_col="op"))
    sks = table_to_sketches(sbt)
    pids = partition_ids(list(wl), 3)
    for p in range(3):
        seq = ScalingBloom(ScalingPolicy(capacity0=800, target_error=0.05))
        m = pids == p
        for w, i, op in zip(wl[m], ids[m], ops[m]):
            if op == "remove":
                seq.remove([w], [i])
            else:
                seq.add([w], [i])
        got = sks[p]
        assert len(seq.blooms) == len(got.blooms)
        for x, y in zip(seq.blooms, got.blooms):
            assert np.array_equal(x.counters, y.counters)


@pytest.fixture(scope="module")
def urls_ds(ray_session):
    import ray.data as rd

    urls = make_urls_table(4000)
    ds = rd.from_arrow(urls.select(["url", "warc_ts"])).repartition(4)
    ds = ds.map_batches(
        lambda t: t.append_column(
            "seq_id", pc.cast(t.column("warc_ts"), pa.int64())
        ),
        batch_format="pyarrow",
    )
    return urls, ds


def test_dedup_approx_drops_all_duplicates(urls_ds):
    urls, ds = urls_ds
    out = collect(dedup_approx(ds, "url", "seq_id",
                               ScalingPolicy(capacity0=1000, target_error=0.05),
                               num_partitions=4))
    counts = collections.Counter(out.column("url").to_pylist())
    assert max(counts.values()) == 1  # no key survives twice
    n_unique = len(set(urls.column("url").to_pylist()))
    # FPR may drop a few uniques but never more than the bound
    assert out.num_rows >= n_unique * 0.95
    assert out.num_rows <= n_unique


def test_dedup_mask_mode_equals_rows_mode(urls_ds):
    """payload='mask' (hash-only shuffle) must keep exactly the same
    rows as payload='rows'."""
    urls, ds = urls_ds
    pol = dict(policy=ScalingPolicy(capacity0=1000, target_error=0.05),
               num_partitions=4)
    rows = collect(dedup_approx(ds, "url", "seq_id", **pol))
    mask = collect(dedup_approx(ds, "url", "seq_id", payload="mask", **pol))
    assert sorted(mask.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    assert set(mask.column_names) == set(ds.schema().names)
    # join mode (distributed semi-join, no driver collect) — same rows
    join = collect(dedup_approx(ds, "url", "seq_id", payload="join", **pol))
    assert sorted(join.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    # auto mode: below the default mask_limit → same rows as mask
    auto = collect(dedup_approx(ds, "url", "seq_id", payload="auto", **pol))
    assert sorted(auto.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    # auto with a tiny mask_limit must fall back to join — same rows
    auto_j = collect(dedup_approx(ds, "url", "seq_id", payload="auto",
                                  mask_limit=10, **pol))
    assert sorted(auto_j.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())


def test_dedup_join_mode_no_driver_survivors(urls_ds, monkeypatch):
    """VERDICT r3 #2: payload='join' (two-phase block gather) must
    never collect the survivor seq set on the driver or ``ray.put`` a
    survivor-sized array — the driver holds only (block ref, lo, hi)
    triples; target rows never shuffle.  Also covers a RANDOMLY
    ordered wide target (the case rangemask degrades on)."""
    import pickle

    import ray

    urls, ds = urls_ds
    # shuffle the target's row order so seq ranges per block are wide
    shuffled = ds.random_shuffle(seed=9)
    puts = []
    real_put = ray.put

    def spy_put(obj, *a, **kw):
        if isinstance(obj, np.ndarray):
            puts.append(obj.nbytes)
        else:
            try:
                puts.append(len(pickle.dumps(obj)))
            except Exception:
                puts.append(0)
        return real_put(obj, *a, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    pol = dict(policy=ScalingPolicy(capacity0=1000, target_error=0.05),
               num_partitions=4)
    rows = collect(dedup_approx(ds, "url", "seq_id", **pol))
    join = collect(dedup_approx(shuffled, "url", "seq_id",
                                payload="join", **pol))
    assert sorted(join.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    # the survivor set here is ~2000 rows x 8 B; any driver-side put of
    # it would be >= that — assert nothing survivor-sized was put
    assert all(p < 8_000 for p in puts), max(puts)


def test_lru_dict_is_lru_and_span_memo_hits():
    """code-review r4: the survivor caches must be true LRU (access
    refreshes recency) and the merged-span memo must make a repeated
    full-span request build only once."""
    from dabloomray.pipelines.core import _LruDict

    builds = []

    def mk(key):
        def build():
            builds.append(key)
            return key
        return build

    lru = _LruDict(2)
    lru.get("a", mk("a"))
    lru.get("b", mk("b"))
    lru.get("a", mk("a"))      # refresh 'a' — a FIFO would evict it next
    lru.get("c", mk("c"))      # evicts 'b' (LRU), not 'a'
    lru.get("a", mk("a"))      # hit
    assert builds == ["a", "b", "c"]
    lru.get("b", mk("b"))      # 'b' was evicted — rebuilds
    assert builds == ["a", "b", "c", "b"]

    # span-memo shape: the same wide span requested per batch builds once
    spans = _LruDict(4)
    for _ in range(5):
        spans.get((0, 64), mk((0, 64)))
    assert builds.count((0, 64)) == 1


def test_dedup_exact_matches_distinct(urls_ds):
    urls, ds = urls_ds
    out = collect(dedup_exact(ds, "url", "seq_id"))
    uniq = set(urls.column("url").to_pylist())
    assert out.num_rows == len(uniq)
    assert set(out.column("url").to_pylist()) == uniq
    # keeps the EARLIEST occurrence per key
    first_ts = {}
    for u, ts in zip(urls.column("url").to_pylist(),
                     urls.column("warc_ts").to_pylist()):
        if u not in first_ts or ts < first_ts[u]:
            first_ts[u] = ts
    got_ts = dict(zip(out.column("url").to_pylist(),
                      out.column("warc_ts").to_pylist()))
    assert got_ts == first_ts


def test_dedup_rangemask_equals_rows_mode(urls_ds, tmp_path):
    """payload='rangemask' (seq-range-bucketed spilled survivor sets,
    no target shuffle, no driver mask) keeps exactly the same rows as
    payload='rows'."""
    urls, ds = urls_ds
    pol = dict(policy=ScalingPolicy(capacity0=1000, target_error=0.05),
               num_partitions=4)
    rows = collect(dedup_approx(ds, "url", "seq_id", **pol))
    rm = collect(dedup_approx(ds, "url", "seq_id", payload="rangemask",
                              spill_dir=str(tmp_path / "spill"),
                              range_buckets=8, **pol))
    assert sorted(rm.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    assert set(rm.column_names) == set(ds.schema().names)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_approx(ds, "url", "seq_id", payload="rangemask", **pol)


def test_dedup_auto_prefers_rangemask_with_spill(urls_ds, tmp_path):
    """auto over the driver limit: rangemask when spill_dir is given
    (measured ~1.1x mask vs ~3x for join), join otherwise — outputs
    identical either way."""
    urls, ds = urls_ds
    pol = dict(policy=ScalingPolicy(capacity0=1000, target_error=0.05),
               num_partitions=4)
    rows = collect(dedup_approx(ds, "url", "seq_id", **pol))
    out = collect(dedup_approx(ds, "url", "seq_id", payload="auto",
                               mask_limit=10,
                               spill_dir=str(tmp_path / "sp"), **pol))
    assert sorted(out.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    # the spill actually happened (rangemask, not join)
    import glob
    assert glob.glob(str(tmp_path / "sp" / "bucket=*.parquet"))


def test_rangemask_spill_dir_reuse_is_safe(urls_ds, tmp_path):
    """A reused spill_dir must not leak stale bucket files from a
    previous run with different boundaries (missing file == empty
    range, so stale files would resurrect false survivors)."""
    import pyarrow.parquet as pq

    urls, ds = urls_ds
    pol = dict(policy=ScalingPolicy(capacity0=1000, target_error=0.05),
               num_partitions=4)
    spill = tmp_path / "spill"
    spill.mkdir()
    # poison: a stale bucket full of bogus survivor seqs
    pq.write_table(pa.table({"seq": pa.array([1, 2, 3], pa.int64())}),
                   str(spill / "bucket=999.parquet"))
    rows = collect(dedup_approx(ds, "url", "seq_id", **pol))
    rm = collect(dedup_approx(ds, "url", "seq_id", payload="rangemask",
                              spill_dir=str(spill), range_buckets=8, **pol))
    assert sorted(rm.column("seq_id").to_pylist()) == \
        sorted(rows.column("seq_id").to_pylist())
    import os
    assert not os.path.exists(spill / "bucket=999.parquet")


def test_rangemask_refuses_foreign_dir(urls_ds, tmp_path):
    """ADVICE r2 #1: a spill_dir holding anything other than a prior
    rangemask run's artifacts must raise, not be silently rmtree'd."""
    urls, ds = urls_ds
    spill = tmp_path / "users_checkpoints"
    spill.mkdir()
    (spill / "important.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to delete"):
        dedup_approx(ds, "url", "seq_id",
                     policy=ScalingPolicy(capacity0=1000, target_error=0.05),
                     num_partitions=4, payload="rangemask",
                     spill_dir=str(spill), range_buckets=8)
    assert (spill / "important.txt").read_text() == "do not delete"


def test_blockmask_span_cap_bounds_memory(ray_session):
    """VERDICT r4 #4: with the merged-span memo capped, a
    randomly-ordered target is filtered block-by-block — peak actor
    memory is one block, survivors byte-identical to the uncapped
    path, and the span memo is never populated."""
    import ray

    from dabloomray.pipelines.core import _BlockMaskFilter

    rng = np.random.default_rng(7)
    # 4 range-disjoint sorted survivor blocks of 1000 ids each
    blocks = [np.sort(rng.choice(np.arange(i * 10_000, (i + 1) * 10_000),
                                 size=1000, replace=False))
              for i in range(4)]
    refs = [ray.put(pa.table({"seq": pa.array(b, pa.int64())}))
            for b in blocks]
    los = np.array([int(b[0]) for b in blocks], dtype=np.int64)
    his = np.array([int(b[-1]) for b in blocks], dtype=np.int64)
    rows = np.array([len(b) for b in blocks], dtype=np.int64)
    # a fully random-order batch spanning all four blocks
    seqs = rng.permutation(np.arange(0, 40_000))[:5000].astype(np.int64)
    batch = pa.table({"seq": pa.array(seqs, pa.int64()),
                      "payload": pa.array([f"p{i}" for i in seqs])})

    uncapped = _BlockMaskFilter(refs, los, his, "seq", rows=rows)
    capped = _BlockMaskFilter(refs, los, his, "seq", rows=rows,
                              span_cap_bytes=1000 * 8)  # < 2 blocks
    out_u = uncapped(batch)
    out_c = capped(batch)
    assert out_u.column("seq").to_pylist() == out_c.column("seq").to_pylist()
    assert out_u.column("payload").to_pylist() == \
        out_c.column("payload").to_pylist()
    # oracle: numpy membership
    want = seqs[np.isin(seqs, np.concatenate(blocks))]
    assert out_c.column("seq").to_pylist() == list(want)
    # the capped actor never concatenated a span...
    assert len(capped.spans.d) == 0
    # ...while the uncapped one memoized the full (0, 4) span
    assert (0, 4) in uncapped.spans.d
