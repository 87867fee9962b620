"""Ray Data build stages: partition projection, sketch UDAFs, partial
per-batch sketch emission, and the order-sensitive scaling-bloom group
build.  (SURVEY.md §2.5 A1/A2.)

Three physical strategies, chosen by sketch algebra + scale:

1. **Per-batch partials** (mergeable sketches, small state): a stateless
   ``map_batches`` fn emits one serialized sketch row per input batch;
   a tiny second stage merges rows.  No shuffle of raw data — only
   sketch-sized rows move.  Best when sketch state << block size.
2. **Grouped UDAF** (mergeable sketches, partition ownership):
   ``ds.groupby("part_id").aggregate(sketch_agg(...))`` — Ray's
   shuffle-reduce moves raw keys once, emits one sketch per partition.
3. **Grouped chain build** (scaling bloom — order-sensitive, NOT
   mergeable): ``groupby("part_id").map_groups(build)`` with a seq-id
   sort inside each group, so every partition chain is byte-identical
   to a sequential run on that partition's keys (SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..hashing import murmur3_x64_128_batch
from ..params import ScalingPolicy
from ..serde import rows_to_table, sketch_from_row, sketch_to_row
from ..sketches.scaling import ScalingBloom

PARTITION_SEED = 0x9E3779B9  # independent of SALT_CONSTANT (SURVEY §4.4)


def with_partition_id(key_col: str, num_partitions: int,
                      col: str = "part_id") -> Callable[[pa.Table], pa.Table]:
    """Stateless projection: part_id = murmur64(key) % P."""

    def fn(batch: pa.Table) -> pa.Table:
        h1, _ = murmur3_x64_128_batch(batch.column(key_col), seed=PARTITION_SEED)
        pid = (h1 % np.uint64(num_partitions)).astype(np.int32)
        if col in batch.column_names:
            batch = batch.drop_columns([col])
        return batch.append_column(col, pa.array(pid, pa.int32()))

    return fn


def hash_project(key_col: str, num_partitions: int) -> Callable[[pa.Table], pa.Table]:
    """Stateless projection: key column → (part_id, h1, h2) ONLY.

    The hot-path trick behind the fast build strategies: strings are
    hashed once, vectorized, at the read side, and only 20 bytes/row
    ever enter the shuffle — at 10^12 rows the exchange carries hashes,
    never documents.  h1/h2 are stored as int64 bit patterns (Arrow has
    no uint64-friendly kernels); view back to uint64 on use.
    """

    def fn(batch: pa.Table) -> pa.Table:
        from ..sketches.counting import CountingBloom

        hp, _ = murmur3_x64_128_batch(batch.column(key_col),
                                      seed=PARTITION_SEED)
        h1, h2 = CountingBloom.hash_keys(batch.column(key_col))
        return pa.table({
            "part_id": pa.array((hp % np.uint64(num_partitions))
                                .astype(np.int32)),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
        })

    return fn


class HashedGroupBuild:
    """``groupby(part_id).map_groups`` fn over hash_project output:
    allocates the partition's sketch exactly once and feeds it the
    pre-computed 128-bit hashes — no string re-hash, no per-batch
    partial-sketch allocations (5-8x faster than both at 10^6 rows)."""

    def __init__(self, sketch_factory: Callable[[], object]):
        self.factory = sketch_factory

    def __call__(self, group: pa.Table) -> pa.Table:
        sk = self.factory()
        sk.add_hashed(group.column("h1").to_numpy().view(np.uint64),
                      group.column("h2").to_numpy().view(np.uint64))
        pid = int(group.column("part_id")[0].as_py()) if len(group) else 0
        return rows_to_table([sketch_to_row(sk, part_id=pid)])


# ---------------------------------------------------------------------------
# strategy 1: per-batch partial sketches (pre-aggregation before any shuffle)
# ---------------------------------------------------------------------------

class PartialSketchEmit:
    """map_batches fn: batch of keys → one serialized sketch row.

    With a ``part_col``, emits one row per partition present in the
    batch (each holding only that partition's keys).  The downstream
    merge is associative, so any block/batch split yields the same
    final sketch.
    """

    def __init__(self, sketch_factory: Callable[[], object], key_col: str,
                 part_col: str | None = None):
        self.factory = sketch_factory
        self.key_col = key_col
        self.part_col = part_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        if self.part_col is None:
            sk = self.factory()
            sk.add(batch.column(self.key_col))
            rows.append(sketch_to_row(sk, part_id=0))
        else:
            pids = batch.column(self.part_col).to_numpy()
            keys = batch.column(self.key_col)
            order = np.argsort(pids, kind="stable")
            sorted_pids = pids[order]
            bounds = np.flatnonzero(np.diff(sorted_pids)) + 1
            for grp in np.split(order, bounds):
                sk = self.factory()
                sk.add(keys.take(pa.array(grp)))
                rows.append(sketch_to_row(sk, part_id=int(pids[grp[0]])))
        return rows_to_table(rows)


def merge_sketch_rows(batch: pa.Table) -> pa.Table:
    """Merge all sketch rows in a batch, per part_id (associative)."""
    merged: dict[int, object] = {}
    for row in batch.to_pylist():
        sk = sketch_from_row(row)
        pid = int(row["part_id"])
        merged[pid] = merged[pid].merge(sk) if pid in merged else sk
    return rows_to_table(
        [sketch_to_row(sk, part_id=pid) for pid, sk in sorted(merged.items())]
    )


def merge_sketch_dataset(sketch_ds, fan_in: int = 16):
    """Tree-merge a dataset of sketch rows down to one row per part_id.

    Two bounded rounds: merge within blocks after coalescing to
    ``fan_in`` blocks, then a final single-block merge — so no single
    task ever sees more than ~(partials/fan_in) rows at once
    (SURVEY.md §4.3 "merge fan-in at 10^12 scale"; deeper trees can
    chain this function).
    """
    ds = sketch_ds.repartition(fan_in).map_batches(
        merge_sketch_rows, batch_format="pyarrow", batch_size=None
    )
    return ds.repartition(1).map_batches(
        merge_sketch_rows, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# strategy 2: grouped UDAF (ray.data.aggregate.AggregateFn)
# ---------------------------------------------------------------------------

def sketch_agg(sketch_factory: Callable[[], object], key_col: str,
               name: str = "sketch"):
    """Mergeable-sketch UDAF for ``ds.groupby(...).aggregate(...)``.

    init/accumulate_block/merge/finalize per SURVEY.md §2.5 A2; the
    finalized value is the canonical serialized row struct.
    """
    from ray.data.aggregate import AggregateFn

    def _acc(sk, block):
        if isinstance(block, pa.Table):
            keys = block.column(key_col)
        else:  # pandas
            keys = block[key_col].tolist()
        sk.add(keys)
        return sk

    return AggregateFn(
        init=lambda k: sketch_factory(),
        merge=lambda a, b: a.merge(b),
        accumulate_block=_acc,
        finalize=lambda sk: sketch_to_row(sk),
        name=name,
    )


# ---------------------------------------------------------------------------
# strategy 3: order-sensitive scaling-bloom chain build (per partition)
# ---------------------------------------------------------------------------

class ScalingChainBuild:
    """``groupby(part_id).map_groups`` fn: build one scaling-bloom chain
    per partition, rows applied in seq_id order (deterministic parity
    with a sequential per-partition run — scaling_bloom_add ≈L555).

    Emits the chain as one sketch row.  ``op_col`` (optional) carries
    "add"/"remove" so a remove stream interleaves by seq order
    (scaling_bloom_remove ≈L590).

    Fragment-level resume (SURVEY.md §4.2): with ``frag_dir`` +
    ``fragment_every`` set, the worker checkpoints the chain every N
    applied rows (``checkpoint.write_fragment``, atomic, one writer
    per partition).  ``resume_ref`` (ray.put of {pid: fragment row})
    rehydrates a partially-built chain; the caller is responsible for
    filtering already-applied rows (seq <= _frag_seq) BEFORE the
    shuffle.  Resumption is byte-identical to an uninterrupted build
    because the chain after a seq-prefix is a pure function of that
    prefix, and batch-split adds equal sequential adds (§5.2(4))."""

    def __init__(self, policy: ScalingPolicy, key_col: str,
                 seq_col: str = "seq_id", part_col: str = "part_id",
                 op_col: str | None = None, frag_dir: str | None = None,
                 fragment_every: int | None = None, resume_ref=None):
        self.policy = policy
        self.key_col = key_col
        self.seq_col = seq_col
        self.part_col = part_col
        self.op_col = op_col
        self.frag_dir = frag_dir
        self.fragment_every = fragment_every
        self.resume_ref = resume_ref

    def _initial(self, pid: int) -> ScalingBloom:
        if self.resume_ref is not None:
            import ray

            frags = ray.get(self.resume_ref)
            if pid in frags:
                return sketch_from_row(frags[pid])
        return ScalingBloom(self.policy)

    def _apply(self, sb: ScalingBloom, group: pa.Table,
               ids: np.ndarray) -> None:
        keys = group.column(self.key_col)
        if self.op_col is None:
            sb.add(keys, ids)
            return
        ops = np.asarray(group.column(self.op_col).to_pylist())
        # contiguous runs of the same op keep relative seq order
        change = np.flatnonzero(ops[1:] != ops[:-1]) + 1
        for seg in np.split(np.arange(len(ops)), change):
            seg_keys = keys.take(pa.array(seg))
            seg_ids = ids[seg]
            if ops[seg[0]] == "remove":
                sb.remove(seg_keys, seg_ids)
            else:
                sb.add(seg_keys, seg_ids)

    def __call__(self, group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column(self.seq_col))
        group = group.take(order)
        ids = group.column(self.seq_col).to_numpy()
        pid = int(group.column(self.part_col)[0].as_py()) if len(group) else 0
        sb = self._initial(pid)
        step = self.fragment_every if (self.frag_dir and
                                       self.fragment_every) else len(group)
        for s in range(0, len(group), max(1, step)):
            e = min(s + max(1, step), len(group))
            self._apply(sb, group.slice(s, e - s), ids[s:e])
            if self.frag_dir and e < len(group):
                from ..checkpoint import write_fragment

                write_fragment(self.frag_dir, sketch_to_row(sb, part_id=pid),
                               last_seq=int(ids[e - 1]))
        return rows_to_table([sketch_to_row(sb, part_id=pid)])


# ---------------------------------------------------------------------------
# membership check stage (stateful actor pool; sketch broadcast once)
# ---------------------------------------------------------------------------

class MembershipCheck:
    """Actor-pool map_batches stage: verdict = sketch.check(key).

    The sketch table is broadcast with ``ray.put`` ONCE on the driver;
    each actor rehydrates it in ``__init__`` (once per worker, not per
    batch — SURVEY.md §2.6 "stateful stages").  Routing: part_id →
    that partition's sketch.
    """

    def __init__(self, sketch_table_ref, key_col: str,
                 part_col: str | None = None, out_col: str = "member"):
        import ray

        table = ray.get(sketch_table_ref)
        from ..serde import table_to_sketches

        self.sketches = table_to_sketches(table)
        self.key_col = key_col
        self.part_col = part_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        verdict = np.zeros(n, dtype=bool)
        keys = batch.column(self.key_col)
        if self.part_col is None:
            verdict = self.sketches[0].check(keys)
        else:
            pids = batch.column(self.part_col).to_numpy()
            for pid in np.unique(pids):
                m = pids == pid
                sk = self.sketches.get(int(pid))
                if sk is not None:
                    verdict[m] = sk.check(keys.filter(pa.array(m)))
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, pa.array(verdict))
