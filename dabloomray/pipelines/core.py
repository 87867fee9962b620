"""High-level pipelines: sketch build, membership check, dedup.

These are the user-facing equivalents of the reference's whole-program
flows (src/test_dablooms.c main ≈L400, pydablooms class) re-expressed
as Ray Data pipelines (SURVEY.md §3.1 "our equivalent").
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..params import ScalingPolicy
from ..serde import table_to_sketches
from ..sketches.scaling import ScalingBloom
from ..stages.build import (
    MembershipCheck,
    PartialSketchEmit,
    ScalingChainBuild,
    merge_sketch_dataset,
    sketch_agg,
    with_partition_id,
)


def build_sketch(
    ds,
    key_col: str,
    sketch_factory: Callable[[], object],
    num_partitions: int | None = None,
    batch_size: int | None = 16_384,
):
    """Build a mergeable sketch over ``ds[key_col]``.

    Returns a Dataset of serialized sketch rows (one per partition, or
    a single part_id=0 row when ``num_partitions`` is None).

    Strategy: per-batch partial sketches inside ``map_batches`` (no raw
    shuffle — the pre-aggregation pattern), then a sketch-row tree
    merge.  At 10^12 rows only sketch-sized rows ever cross the
    network.
    """
    if num_partitions is not None:
        ds = ds.map_batches(with_partition_id(key_col, num_partitions),
                            batch_format="pyarrow", batch_size=batch_size)
        part_col = "part_id"
    else:
        part_col = None
    partials = ds.map_batches(
        PartialSketchEmit(sketch_factory, key_col, part_col=part_col),
        batch_format="pyarrow", batch_size=batch_size,
    )
    return merge_sketch_dataset(partials)


def build_sketch_grouped(
    ds,
    key_col: str,
    sketch_factory: Callable[[], object],
    num_partitions: int = 16,
    batch_size: int | None = 16_384,
):
    """Grouped-UDAF variant: shuffle keys by part_id once, one sketch
    per partition via ``groupby().aggregate(sketch_agg)``."""
    ds = ds.map_batches(with_partition_id(key_col, num_partitions),
                        batch_format="pyarrow", batch_size=batch_size)
    return ds.groupby("part_id").aggregate(
        sketch_agg(sketch_factory, key_col, name="sketch")
    )


def build_scaling_bloom(
    ds,
    key_col: str,
    seq_col: str,
    policy: ScalingPolicy | None = None,
    num_partitions: int = 16,
    op_col: str | None = None,
    skip_partitions: frozenset | set | None = None,
):
    """Partition-owned scaling blooms: each key belongs to exactly one
    partition's chain; chains are built in seq order (G2 semantics).
    Returns a Dataset of one sketch row per partition.
    ``skip_partitions``: part_ids already checkpointed (resume path) —
    their rows are dropped right after the partition projection, before
    the shuffle."""
    policy = policy or ScalingPolicy()
    ds = ds.map_batches(with_partition_id(key_col, num_partitions),
                        batch_format="pyarrow")
    if skip_partitions:
        skip = pa.array(sorted(int(p) for p in skip_partitions), pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            keep = pa.compute.invert(
                pa.compute.is_in(batch.column("part_id"), value_set=skip))
            return batch.filter(keep)

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    builder = ScalingChainBuild(policy, key_col, seq_col=seq_col, op_col=op_col)

    def build_chain(group: pa.Table) -> pa.Table:  # map_groups wants a fn
        return builder(group)

    return ds.groupby("part_id").map_groups(build_chain, batch_format="pyarrow")


def check_membership(
    ds,
    sketch_table: pa.Table,
    key_col: str,
    partitioned: bool = True,
    out_col: str = "member",
    concurrency=(1, 8),
    batch_size: int | None = 16_384,
):
    """Membership verdicts for every row of ``ds`` against a built
    sketch table (broadcast once via ray.put; per-actor rehydration).

    ``concurrency`` defaults to an autoscaling (min, max) pool so the
    actor pool never reserves every CPU up front and starves the
    upstream stages into a deadlock (observed on a 4-CPU local run
    with a fixed pool of 4).
    """
    import ray

    num_partitions = 1 + int(max(
        (row["part_id"] for row in sketch_table.select(["part_id"]).to_pylist()),
        default=0,
    ))
    ref = ray.put(sketch_table)
    if partitioned and num_partitions > 1:
        ds = ds.map_batches(with_partition_id(key_col, num_partitions),
                            batch_format="pyarrow", batch_size=batch_size)
        part_col = "part_id"
    else:
        part_col = None
    return ds.map_batches(
        MembershipCheck,
        fn_constructor_kwargs={
            "sketch_table_ref": ref,
            "key_col": key_col,
            "part_col": part_col,
            "out_col": out_col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class _BloomGateGroup:
    """Per-partition approximate-dedup gate: scan the group's rows in
    seq order through a scaling bloom; keep rows whose key is not yet
    in the chain.  Zero false negatives on duplicates (a dup is never
    emitted twice... unless counters saturated) — a small FPR drops
    some first occurrences, matching the library's purpose
    (SURVEY.md §2.6 "set ops / dedup")."""

    def __init__(self, policy: ScalingPolicy, key_col: str, seq_col: str):
        self.policy = policy
        self.key_col = key_col
        self.seq_col = seq_col

    def __call__(self, group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column(self.seq_col))
        group = group.take(order)
        keys = group.column(self.key_col)
        ids = group.column(self.seq_col).to_numpy()
        sb = ScalingBloom(self.policy)
        from ..sketches.counting import CountingBloom

        h1, h2 = CountingBloom.hash_keys(keys)
        keep = np.zeros(len(group), dtype=bool)
        # batch-wise gate: within a batch, first occurrence wins
        B = 8192
        for s in range(0, len(group), B):
            e = min(s + B, len(group))
            seen = sb.check_hashed(h1[s:e], h2[s:e])
            kb = keys.slice(s, e - s)
            # intra-batch first-occurrence on the 128-bit key hash
            pair = np.stack([h1[s:e], h2[s:e]], axis=1)
            _, first_idx = np.unique(pair, axis=0, return_index=True)
            dup_within = np.ones(e - s, dtype=bool)
            dup_within[first_idx] = False
            keep_batch = (~seen) & (~dup_within)
            keep[s:e] = keep_batch
            new_mask = keep_batch
            if new_mask.any():
                sb.add(kb.filter(pa.array(new_mask)),
                       ids[s:e][new_mask])
        return group.filter(pa.array(keep))


def dedup_approx(
    ds,
    key_col: str,
    seq_col: str,
    policy: ScalingPolicy | None = None,
    num_partitions: int = 16,
):
    """Approximate streaming dedup: partition by key hash (all dups of a
    key land in one partition — required for correctness, §4.4), gate
    each partition through its scaling bloom in seq order."""
    policy = policy or ScalingPolicy()
    ds = ds.map_batches(with_partition_id(key_col, num_partitions),
                        batch_format="pyarrow")
    gate = _BloomGateGroup(policy, key_col, seq_col)

    def gate_group(group: pa.Table) -> pa.Table:
        return gate(group)

    return ds.groupby("part_id").map_groups(gate_group, batch_format="pyarrow")


def dedup_exact(ds, key_col: str, seq_col: str | None = None):
    """Exact dedup oracle path: hash-partition + per-group first
    (groupby(key).map_groups(head1), SURVEY.md §2.6)."""

    def first_row(group: pa.Table) -> pa.Table:
        if seq_col is not None:
            order = pa.compute.sort_indices(group.column(seq_col))
            group = group.take(order)
        return group.slice(0, 1)

    return ds.groupby(key_col).map_groups(first_row, batch_format="pyarrow")


def build_scaling_bloom_checkpointed(
    ds,
    key_col: str,
    seq_col: str,
    ckpt_dir: str,
    policy: ScalingPolicy | None = None,
    num_partitions: int = 16,
    op_col: str | None = None,
    lineage: dict | None = None,
) -> pa.Table:
    """Resumable scaling-bloom build (SURVEY.md §4.2/§4.3).

    Finished partitions (per the checkpoint manifest) are skipped at
    the read side; remaining chains are built, each published to the
    checkpoint as it streams back (partition file first, then the
    manifest — so a kill mid-run never references a torn write).
    Returns the complete sketch table from the checkpoint.  A resumed
    run is identical to an uninterrupted one because each partition's
    chain is a pure function of its own input rows.
    """
    from ..checkpoint import finished_partitions, read_checkpoint, write_partition

    done = finished_partitions(ckpt_dir)
    pending = build_scaling_bloom(
        ds, key_col, seq_col, policy=policy, num_partitions=num_partitions,
        op_col=op_col, skip_partitions=set(done),
    )
    for batch in pending.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in batch.to_pylist():
            write_partition(ckpt_dir, row, lineage=lineage,
                            pipeline="scaling_bloom")
    return read_checkpoint(ckpt_dir)


def sketches_from_dataset(sketch_ds) -> dict[int, object]:
    """Collect a (small) sketch-row dataset into {part_id: sketch}."""
    tables = [b for b in sketch_ds.iter_batches(batch_size=None,
                                                batch_format="pyarrow")]
    merged: dict[int, object] = {}
    for t in tables:
        for pid, sk in table_to_sketches(t).items():
            merged[pid] = merged[pid].merge(sk) if pid in merged else sk
    return merged
