"""Checkpoint / resume (SURVEY.md §5.2(5)): kill-after-ckpt resume
produces the same final sketch table as an uninterrupted run."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from dabloomray.checkpoint import (
    finished_partitions,
    read_checkpoint,
    read_manifest,
    write_checkpoint,
)
from dabloomray.fixtures import make_words
from dabloomray.params import ScalingPolicy
from dabloomray.pipelines.core import (
    build_scaling_bloom,
    build_scaling_bloom_checkpointed,
)
from dabloomray.serde import table_to_sketches


def collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )


POL = dict(policy=ScalingPolicy(capacity0=1500, target_error=0.05),
           num_partitions=6)


@pytest.fixture()
def words_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(make_words(15_000)).repartition(4)


def test_checkpoint_roundtrip(tmp_path, words_ds):
    full = collect(build_scaling_bloom(words_ds, "word", "seq_id", **POL))
    ckpt = str(tmp_path / "ckpt")
    write_checkpoint(full, ckpt, lineage={"input": "make_words(15000)"})
    man = read_manifest(ckpt)
    assert len(man["partitions"]) == 6
    assert man["lineage"]["input"] == "make_words(15000)"
    for meta in man["partitions"].values():
        assert meta["ckpt_seqnum"] > 0  # disk_seqnum recorded (§4.2)
        assert meta["rows_processed"] > 0
    back = read_checkpoint(ckpt)
    a, b = table_to_sketches(full), table_to_sketches(back)
    assert set(a) == set(b)
    for pid in a:
        assert a[pid].max_id == b[pid].max_id
        for x, y in zip(a[pid].blooms, b[pid].blooms):
            assert np.array_equal(x.counters, y.counters)


def test_resume_equals_uninterrupted(tmp_path, words_ds):
    ckpt = str(tmp_path / "ckpt")
    # uninterrupted reference run
    full = collect(build_scaling_bloom(words_ds, "word", "seq_id", **POL))

    # "crashed" run: only partitions 0,1,2 reached the checkpoint
    partial = full.filter(pc.is_in(full.column("part_id"),
                                   value_set=pa.array([0, 1, 2], pa.int32())))
    write_checkpoint(partial, ckpt)
    assert set(finished_partitions(ckpt)) == {0, 1, 2}

    # resume: must rebuild only 3,4,5 and end byte-identical to full
    final = build_scaling_bloom_checkpointed(
        words_ds, "word", "seq_id", ckpt, **POL)
    assert set(finished_partitions(ckpt)) == set(range(6))
    a, b = table_to_sketches(full), table_to_sketches(final)
    for pid in a:
        assert len(a[pid].blooms) == len(b[pid].blooms)
        for x, y in zip(a[pid].blooms, b[pid].blooms):
            assert x.first_id == y.first_id
            assert np.array_equal(x.counters, y.counters)


def test_fresh_run_writes_everything(tmp_path, words_ds):
    ckpt = str(tmp_path / "ckpt")
    final = build_scaling_bloom_checkpointed(
        words_ds, "word", "seq_id", ckpt, **POL)
    assert final.num_rows == 6
    assert os.path.exists(os.path.join(ckpt, "_MANIFEST.json"))
    # second call with same ckpt: nothing to rebuild, same table back
    again = build_scaling_bloom_checkpointed(
        words_ds, "word", "seq_id", ckpt, **POL)
    assert again.equals(final)


def test_mergeable_build_checkpointed_resume(tmp_path, words_ds):
    """build_sketch_checkpointed (counting bloom): partial ckpt + resume
    equals the uninterrupted hashed build."""
    from dabloomray.pipelines.core import (
        build_sketch_checkpointed,
        build_sketch_hashed,
    )
    from dabloomray.sketches.counting import counting_bloom_factory

    fac = counting_bloom_factory(3000, 0.05)
    ckpt = str(tmp_path / "ckpt_cb")
    full = collect(build_sketch_hashed(words_ds, "word", fac,
                                       num_partitions=6))
    partial = full.filter(pc.is_in(full.column("part_id"),
                                   value_set=pa.array([1, 4], pa.int32())))
    write_checkpoint(partial, ckpt)
    final = build_sketch_checkpointed(words_ds, "word", fac, ckpt,
                                      num_partitions=6)
    assert set(finished_partitions(ckpt)) == set(range(6))
    a, b = table_to_sketches(full), table_to_sketches(final)
    for pid in a:
        assert np.array_equal(a[pid].counters, b[pid].counters)
        assert a[pid].count == b[pid].count
    # complete checkpoint → short-circuit without reading input
    again = build_sketch_checkpointed(words_ds, "word", fac, ckpt,
                                      num_partitions=6)
    assert again.num_rows == 6


def test_unreferenced_partition_file_ignored(tmp_path, words_ds):
    """A partition file without a manifest entry (torn run) is invisible
    — the reference's mem_seqnum==0 torn-write detection analogue."""
    ckpt = str(tmp_path / "ckpt")
    full = collect(build_scaling_bloom(words_ds, "word", "seq_id", **POL))
    write_checkpoint(full.slice(0, 2), ckpt)
    # drop a stray file that no manifest references
    stray = os.path.join(ckpt, "part=99.parquet")
    import pyarrow.parquet as pq

    pq.write_table(full.slice(0, 1), stray)
    assert 99 not in finished_partitions(ckpt)
    assert read_checkpoint(ckpt).num_rows == 2


def test_check_membership_empty_high_partitions(tmp_path, ray_session):
    """ADVICE r1 (medium): with more partitions than keys, the highest
    partitions emit no sketch row; inferring num_partitions from
    observed part_ids at check time would shrink the modulus and route
    keys to the wrong bloom → false negatives.  The manifest persists
    the build-time count; passing it through must give zero FNs."""
    import ray.data as rd

    from dabloomray.pipelines.core import check_membership
    from dabloomray.stages.build import with_partition_id

    keys = [f"k{i}" for i in range(12)]
    tab = pa.table({"word": pa.array(keys, pa.string()),
                    "seq_id": pa.array(range(12), pa.int64())})
    ds = rd.from_arrow(tab)
    P = 64
    ckpt = str(tmp_path / "ckpt")
    final = build_scaling_bloom_checkpointed(
        ds, "word", "seq_id", ckpt,
        policy=ScalingPolicy(capacity0=1000, target_error=0.05),
        num_partitions=P)
    # precondition for the regression: some high partition is empty
    max_pid = pc.max(final.column("part_id")).as_py()
    assert max_pid < P - 1, "fixture no longer exercises the bug"
    man = read_manifest(ckpt)
    assert man["num_partitions"] == P

    out = collect(check_membership(rd.from_arrow(tab), final, "word",
                                   num_partitions=man["num_partitions"]))
    verdicts = dict(zip(out.column("word").to_pylist(),
                        out.column("member").to_pylist()))
    assert all(verdicts[k] for k in keys)  # zero false negatives


def _chains_equal(a, b):
    for pid in a:
        assert len(a[pid].blooms) == len(b[pid].blooms), pid
        for x, y in zip(a[pid].blooms, b[pid].blooms):
            assert x.first_id == y.first_id
            assert np.array_equal(x.counters, y.counters)


def test_fragment_resume_mid_partition(tmp_path, words_ds, ray_session):
    """VERDICT r1 #5 / SURVEY §4.2: a build killed MID-PARTITION
    resumes from the fragment checkpoint, replays only rows with
    seq_id > _frag_seq, and ends byte-identical to an uninterrupted
    run.  Byte-identity also PROVES the prefix was not re-applied —
    re-adding any already-applied row would double-increment its
    counters."""
    import ray.data as rd

    from dabloomray.checkpoint import (
        fragment_checkpoints,
        fragment_last_seq,
        write_fragment,
    )
    from dabloomray.serde import sketch_from_row, sketch_to_row
    from dabloomray.sketches.scaling import ScalingBloom
    from dabloomray.stages.build import with_partition_id

    ckpt = str(tmp_path / "ckpt")
    # uninterrupted reference
    full = collect(build_scaling_bloom(words_ds, "word", "seq_id", **POL))
    ref = table_to_sketches(full)

    # simulate a crash mid-partition-2: sequentially apply the first
    # half of partition 2's rows, checkpoint that as a fragment
    words = collect(words_ds.map_batches(
        with_partition_id("word", POL["num_partitions"]),
        batch_format="pyarrow"))
    p2 = words.filter(pc.equal(words.column("part_id"), 2)).sort_by("seq_id")
    half = p2.num_rows // 2
    sb = ScalingBloom(POL["policy"])
    sb.add(p2.column("word").slice(0, half),
           p2.column("seq_id").to_numpy()[:half])
    cutoff = int(p2.column("seq_id")[half - 1].as_py())
    write_fragment(ckpt, sketch_to_row(sb, part_id=2), last_seq=cutoff)
    frags = fragment_checkpoints(ckpt)
    assert set(frags) == {2}
    assert fragment_last_seq(frags[2]) == cutoff

    # resume: fragment partitions replay only seq > cutoff
    final = build_scaling_bloom_checkpointed(
        words_ds, "word", "seq_id", ckpt, **POL)
    _chains_equal(ref, table_to_sketches(final))
    # fragment superseded by the manifest entry and cleaned up
    assert fragment_checkpoints(ckpt) == {}


def test_fragmenting_build_equals_plain(tmp_path, words_ds):
    """fragment_every=N produces mid-build fragments, cleans them up on
    publish, and the final chains equal the non-fragmented build
    (batch-split == sequential parity, §5.2(4))."""
    ckpt = str(tmp_path / "ckpt")
    plain = table_to_sketches(
        collect(build_scaling_bloom(words_ds, "word", "seq_id", **POL)))
    final = build_scaling_bloom_checkpointed(
        words_ds, "word", "seq_id", ckpt, fragment_every=500, **POL)
    _chains_equal(plain, table_to_sketches(final))
    from dabloomray.checkpoint import fragment_checkpoints

    assert fragment_checkpoints(ckpt) == {}
