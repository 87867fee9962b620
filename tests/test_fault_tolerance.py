"""Retry idempotence (SURVEY.md §7.5 known-hard #1).

Build stages are pure functions of their input group — state never
mutates in place across attempts — so a Ray task retry after a worker
death must produce a byte-identical sketch table.  We inject a real
fault: the build task for one partition calls os._exit(1) on its first
attempt (worker process dies; Ray reschedules the task)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from dabloomray.fixtures import make_words
from dabloomray.params import ScalingPolicy
from dabloomray.serde import table_to_sketches
from dabloomray.stages.build import ScalingChainBuild, with_partition_id


def collect(ds):
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )


def test_worker_death_retry_is_idempotent(ray_session, tmp_path):
    import ray.data as rd

    flag = str(tmp_path / "killed_once")
    words = make_words(6000)
    pol = ScalingPolicy(capacity0=800, target_error=0.05)
    builder = ScalingChainBuild(pol, "word", seq_col="seq_id")

    def flaky_build(group: pa.Table) -> pa.Table:
        pid = int(group.column("part_id")[0].as_py())
        if pid == 2 and not os.path.exists(flag):
            open(flag, "w").write("x")
            os._exit(1)  # real worker death — Ray must retry the task
        return builder(group)

    ds = rd.from_arrow(words).repartition(4).map_batches(
        with_partition_id("word", 4), batch_format="pyarrow")
    got = collect(ds.groupby("part_id").map_groups(flaky_build,
                                                   batch_format="pyarrow"))
    assert os.path.exists(flag), "fault was never injected"

    # clean reference run
    def clean_build(group: pa.Table) -> pa.Table:
        return builder(group)

    ds2 = rd.from_arrow(words).repartition(4).map_batches(
        with_partition_id("word", 4), batch_format="pyarrow")
    want = collect(ds2.groupby("part_id").map_groups(clean_build,
                                                     batch_format="pyarrow"))
    a, b = table_to_sketches(got), table_to_sketches(want)
    assert set(a) == set(b) == {0, 1, 2, 3}
    for pid in a:
        assert len(a[pid].blooms) == len(b[pid].blooms)
        for x, y in zip(a[pid].blooms, b[pid].blooms):
            assert np.array_equal(x.counters, y.counters)
        assert a[pid].mem_seqnum == b[pid].mem_seqnum
