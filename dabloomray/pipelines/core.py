"""High-level pipelines: sketch build, membership check, dedup.

These are the user-facing equivalents of the reference's whole-program
flows (src/test_dablooms.c main ≈L400, pydablooms class) re-expressed
as Ray Data pipelines (SURVEY.md §3.1 "our equivalent").
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa

from ..params import ScalingPolicy
from ..serde import table_to_sketches
from ..sketches.scaling import ScalingBloom
from ..stages.build import (
    HashedGroupBuild,
    MembershipCheck,
    PartialSketchEmit,
    ScalingChainBuild,
    hash_project,
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


def build_sketch_hashed(
    ds,
    key_col: str,
    sketch_factory: Callable[[], object],
    num_partitions: int = 16,
    batch_size: int | None = 65_536,
):
    """Fastest partition-owned build for hash-kernel sketches
    (counting bloom / HLL / CMS): vectorized hash projection at the
    read (only 20 B/row shuffles), then one ``map_groups`` build per
    partition — each counter array allocated exactly once.  Measured
    5-8x faster than the partial-emit and UDAF paths at 10^6 rows.
    Returns a Dataset of one sketch row per partition."""
    hashed = ds.map_batches(hash_project(key_col, num_partitions),
                            batch_format="pyarrow", batch_size=batch_size)
    builder = HashedGroupBuild(sketch_factory)

    def build_group(group: pa.Table) -> pa.Table:
        return builder(group)

    return hashed.groupby("part_id").map_groups(build_group,
                                                batch_format="pyarrow")


def build_sketch_salted(
    ds,
    key_col: str,
    sketch_factory: Callable[[], object],
    num_partitions: int = 16,
    num_salts: int = 8,
    batch_size: int | None = 65_536,
):
    """Hot-key-safe variant of :func:`build_sketch_hashed` (SURVEY.md
    §4.4 applied to sketch UDAFs, not just counts): phase 1 builds one
    partial sketch per (part_id, salt) — a skewed partition's rows
    spread across ``num_salts`` reducers instead of landing on one
    straggler — phase 2 tree-merges the S sketch rows per partition
    (tiny).  Exact: saturating-add / max / sum merges equal the
    sequential build (min(15, clip(a)+clip(b)) == min(15, a+b)), so
    the result is byte-identical to the unsalted hashed build
    (tests/test_skew.py)."""
    hashed = ds.map_batches(hash_project(key_col, num_partitions),
                            batch_format="pyarrow", batch_size=batch_size)

    def add_salt(batch: pa.Table) -> pa.Table:
        # salt by ROW POSITION, not key hash (ADVICE r2): a key-derived
        # salt sends every duplicate row of one heavy-hitter key to the
        # same reducer, defeating the point.  The merges are exact
        # (saturating add / max / sum == sequential), so ANY row
        # assignment yields the same final sketch — positional salting
        # spreads single-hot-key skew too.
        salt = (np.arange(len(batch)) % num_salts).astype(np.int32)
        return batch.append_column("_salt", pa.array(salt))

    salted = hashed.map_batches(add_salt, batch_format="pyarrow")
    builder = HashedGroupBuild(sketch_factory)

    def build_group(group: pa.Table) -> pa.Table:
        return builder(group)

    partials = salted.groupby(["part_id", "_salt"]).map_groups(
        build_group, batch_format="pyarrow")
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
    resume_fragments: dict | None = None,
    frag_dir: str | None = None,
    fragment_every: int | None = None,
):
    """Partition-owned scaling blooms: each key belongs to exactly one
    partition's chain; chains are built in seq order (G2 semantics).
    Returns a Dataset of one sketch row per partition.
    ``skip_partitions``: part_ids already checkpointed (resume path) —
    their rows are dropped right after the partition projection, before
    the shuffle.
    ``resume_fragments``: {part_id: fragment row} from
    ``checkpoint.fragment_checkpoints`` — those partitions resume from
    the fragment's chain and rows with ``seq <= _frag_seq`` are
    dropped BEFORE the shuffle (only unapplied input moves).
    ``frag_dir`` + ``fragment_every``: write a mid-build fragment
    checkpoint every N applied rows per partition."""
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
    resume_ref = None
    if resume_fragments:
        import ray

        from ..checkpoint import fragment_last_seq

        seq_pids = np.array(sorted(resume_fragments), dtype=np.int64)
        seq_last = np.array([fragment_last_seq(resume_fragments[int(p)])
                             for p in seq_pids], dtype=np.int64)

        def drop_applied(batch: pa.Table) -> pa.Table:
            pids = batch.column("part_id").to_numpy().astype(np.int64)
            seqs = batch.column(seq_col).to_numpy().astype(np.int64)
            pos = np.minimum(np.searchsorted(seq_pids, pids),
                             len(seq_pids) - 1)
            covered = seq_pids[pos] == pids
            drop = covered & (seqs <= seq_last[pos])
            return batch.filter(pa.array(~drop))

        ds = ds.map_batches(drop_applied, batch_format="pyarrow")
        resume_ref = ray.put(resume_fragments)
    builder = ScalingChainBuild(policy, key_col, seq_col=seq_col,
                                op_col=op_col, frag_dir=frag_dir,
                                fragment_every=fragment_every,
                                resume_ref=resume_ref)

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
    num_partitions: int | None = None,
):
    """Membership verdicts for every row of ``ds`` against a built
    sketch table (broadcast once via ray.put; per-actor rehydration).

    ``num_partitions`` MUST equal the build-time partition count.  When
    None it is inferred as 1+max(part_id) over the sketch rows — only
    safe if every partition received at least one key at build time
    (an empty high partition emits no sketch row, and a smaller modulus
    here would route keys to the wrong partition's bloom, breaking the
    no-false-negative guarantee).  Builders that checkpoint persist the
    true count in the manifest (``checkpoint.read_manifest``); the CLI
    ``check`` command passes it through.

    ``concurrency`` defaults to an autoscaling (min, max) pool so the
    actor pool never reserves every CPU up front and starves the
    upstream stages into a deadlock (observed on a 4-CPU local run
    with a fixed pool of 4).
    """
    import ray

    if num_partitions is None:
        num_partitions = 1 + int(max(
            (row["part_id"]
             for row in sketch_table.select(["part_id"]).to_pylist()),
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
    payload: str = "rows",
    apply_to=None,
    mask_limit: int = 100_000_000,
    spill_dir: str | None = None,
    range_buckets: int = 64,
):
    """Approximate streaming dedup: partition by key hash (all dups of a
    key land in one partition — required for correctness, §4.4), gate
    each partition through its scaling bloom in seq order.

    ``payload="rows"``: full rows ride through the shuffle (simple;
    fine when rows are narrow).
    ``payload="mask"``: ONLY (part_id, h1, h2, seq) enter the shuffle —
    28 B/row regardless of document width; the gate emits surviving
    seq ids, which are broadcast back as a filter over the original
    dataset (no second shuffle).  This is the 10^12-scale path: at
    100 TB the exchange carries hashes, never documents.  Requires
    ``seq_col`` values to be globally unique.

    ``payload="join"``: like mask, but the survivor seq set NEVER
    lands on the driver — two-phase block gather (VERDICT r3 #2;
    replaces the old full-row ``Dataset.join(left_semi)``, which
    shuffled wide rows at ~3x mask cost): phase 2a sorts the survivor
    seq ids (an 8 B/row shuffle) and leaves the sorted blocks in the
    object store; the driver holds only (block ref, min_seq, max_seq)
    triples.  Phase 2b filters the target WITHOUT shuffling it — each
    task ``ray.get``s just the survivor blocks overlapping its batch's
    own [min, max] seq range (zero-copy on the same node, LRU-cached
    per actor).  Worst case (randomly-ordered target) each NODE pulls
    the full survivor set once — ~8 B/survivor/node, still orders of
    magnitude below shuffling a wide corpus.  Use beyond ~10^8
    survivors, where the mask array would not fit on the driver.

    ``payload="auto"``: size-aware selection — the gate output (seq
    ids only, 8 B/row, blocks distributed in the object store) is
    materialized, its exact count read from metadata, and mask is
    chosen iff survivors <= ``mask_limit`` (default 10^8 ≈ 800 MB on
    the driver), else join.  The materialization is not wasted work:
    mask needs the full survivor set before filtering anyway, and join
    reuses the blocks without recomputing the gate.

    ``payload="rangemask"``: neither a driver mask nor a row shuffle —
    survivor seq ids are written to ``spill_dir`` bucketed by seq
    RANGE, and each target task loads only the buckets overlapping its
    own [min_seq, max_seq] (LRU-cached per actor).  The target never
    shuffles and the driver never holds survivors; total survivor IO
    per task is proportional to its seq-range overlap, so this is the
    wide-row beyond-10^8-survivors path WHEN the input is roughly
    seq-ordered (e.g. time-ordered crawl files).  A randomly-ordered
    target degrades to reading many buckets per task — use ``join``
    there.

    ``apply_to`` (mask/join/auto/rangemask modes): apply the survivor
    filter to this dataset instead of ``ds`` — pass a column-pruned
    read as ``ds`` (key+seq only) and the full-width read here, so
    phase 1 never deserializes wide columns.
    """
    policy = policy or ScalingPolicy()
    if payload == "rows":
        ds2 = ds.map_batches(with_partition_id(key_col, num_partitions),
                             batch_format="pyarrow")
        gate = _BloomGateGroup(policy, key_col, seq_col)

        def gate_group(group: pa.Table) -> pa.Table:
            return gate(group)

        return ds2.groupby("part_id").map_groups(gate_group,
                                                 batch_format="pyarrow")

    import ray

    survivors_ds = dedup_survivor_seqs(ds, key_col, seq_col, policy,
                                       num_partitions)
    target = apply_to if apply_to is not None else ds
    if payload == "auto":
        survivors_ds = survivors_ds.materialize()
        n_surv = survivors_ds.count()  # metadata read on materialized ds
        if n_surv <= mask_limit:
            payload = "mask"
        else:
            # beyond the driver limit: rangemask when a spill dir is
            # available (measured ~1.1x mask at 7.2M survivors vs ~3x
            # for join), else the join fallback
            payload = "rangemask" if spill_dir else "join"
    if payload == "rangemask":
        if spill_dir is None:
            raise ValueError("payload='rangemask' requires spill_dir")
        return _rangemask_filter(target, survivors_ds, seq_col, spill_dir,
                                 range_buckets)
    if payload == "join":
        return _blockmask_filter(target, survivors_ds, seq_col)
    seqs = np.sort(np.concatenate([
        b.column("seq").to_numpy()
        for b in survivors_ds.iter_batches(batch_size=None,
                                           batch_format="pyarrow")
    ] or [np.zeros(0, dtype=np.int64)]))
    ref = ray.put(seqs)

    # stateless task fn (NOT an actor pool): ray.get(ref) is zero-copy
    # from the object store, and a plain fn lets Ray fuse downstream
    # stateless stages into one elastic task pool — an actor pool here
    # would drag the fused tail down to the pool's (lazily upscaled)
    # size (observed 50% utilization at 2 cpus)
    def keep_survivors(batch: pa.Table) -> pa.Table:
        seqs_arr = ray.get(ref)
        s = batch.column(seq_col).cast(pa.int64()).to_numpy()
        if len(seqs_arr) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(seqs_arr, s), len(seqs_arr) - 1)
        return batch.filter(pa.array(seqs_arr[pos] == s))

    return target.map_batches(keep_survivors, batch_format="pyarrow")


def dedup_survivor_seqs(ds, key_col: str, seq_col: str,
                        policy: ScalingPolicy, num_partitions: int):
    """Phase 1 of the hash-only dedup modes (mask/join/rangemask):
    project (part_id, h1, h2, seq) — 28 B/row, documents never enter
    the exchange — then gate each partition through its scaling bloom
    in seq order.  Returns a Dataset with one column ``seq`` holding
    the surviving sequence ids."""
    from ..hashing import murmur3_x64_128_batch
    from ..sketches.counting import CountingBloom
    from ..stages.build import PARTITION_SEED

    def project(batch: pa.Table) -> pa.Table:
        hp, _ = murmur3_x64_128_batch(batch.column(key_col),
                                      seed=PARTITION_SEED)
        h1, h2 = CountingBloom.hash_keys(batch.column(key_col))
        return pa.table({
            "part_id": pa.array((hp % np.uint64(num_partitions))
                                .astype(np.int32)),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64()),
            "seq": batch.column(seq_col).cast(pa.int64()),
        })

    gate = _HashedBloomGateGroup(policy)

    def gate_group(group: pa.Table) -> pa.Table:
        return gate(group)

    return (ds.map_batches(project, batch_format="pyarrow")
            .groupby("part_id").map_groups(gate_group,
                                           batch_format="pyarrow"))


class _LruDict:
    """Tiny true-LRU (access refreshes recency — the previous
    insertion-order pop was FIFO and scored 0 hits on sequential
    scans wider than the capacity, code-review r4)."""

    def __init__(self, cap: int):
        self.cap = cap
        self.d: dict = {}

    def get(self, key, build):
        if key in self.d:
            self.d[key] = self.d.pop(key)  # refresh recency
            return self.d[key]
        if len(self.d) >= self.cap:
            self.d.pop(next(iter(self.d)))
        val = build()
        self.d[key] = val
        return val


def _sorted_membership(batch: pa.Table, seq_col: str,
                       surv: np.ndarray) -> pa.Table:
    """Filter ``batch`` to rows whose seq appears in the SORTED
    survivor array (clamped searchsorted — shared by the mask /
    rangemask / blockmask payloads)."""
    if len(surv) == 0:
        return batch.slice(0, 0)
    seqs = batch.column(seq_col).cast(pa.int64()).to_numpy()
    pos = np.minimum(np.searchsorted(surv, seqs), len(surv) - 1)
    return batch.filter(pa.array(surv[pos] == seqs))


class _BlockMaskFilter:
    """Actor for ``payload="join"``'s phase 2b (VERDICT r3 #2): filter
    a batch to surviving seq ids by ``ray.get``-ing ONLY the sorted
    survivor blocks overlapping the batch's own [min_seq, max_seq]
    (zero-copy from the object store on the same node).  ``refs`` are
    ObjectRefs of sorted, range-disjoint pyarrow blocks (from
    ``Dataset.sort("seq")``) — holding them in the constructor args
    pins the blocks for the actor's lifetime.

    Two LRU layers make the worst case cheap: per-block int64 arrays,
    plus the MERGED span keyed by (i0, i1) — a randomly-ordered
    target asks for the full span every batch, so the merge (and the
    fetches under it) happens once per actor, not once per batch.

    The merged-span memo is CAPPED (VERDICT r4 #4): a span wider than
    ``span_cap_bytes`` (default 64 MB of int64 ids) is never
    concatenated — membership against range-disjoint sorted blocks
    decomposes per block, so the batch is filtered block-by-block
    instead, holding one block at a time.  Peak actor memory stays
    bounded even when the target is fully random-order."""

    def __init__(self, refs, los: np.ndarray, his: np.ndarray,
                 seq_col: str, rows: np.ndarray | None = None,
                 cache_blocks: int = 8, cache_spans: int = 4,
                 span_cap_bytes: int = 64 << 20):
        self.refs = refs
        self.los = los  # ascending per-block min seq
        self.his = his  # ascending per-block max seq
        self.seq_col = seq_col
        self.rows = rows  # per-block row counts (for the span cap)
        self.span_cap_bytes = span_cap_bytes
        self.blocks = _LruDict(cache_blocks)
        self.spans = _LruDict(cache_spans)

    def _block(self, i: int) -> np.ndarray:
        import ray

        def build():
            tab = ray.get(self.refs[i])
            # sort() emits sorted blocks; keep a compact int64 copy
            return tab.column("seq").to_numpy().astype(np.int64)

        return self.blocks.get(i, build)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        seqs = batch.column(self.seq_col).cast(pa.int64()).to_numpy()
        lo, hi = int(seqs.min()), int(seqs.max())
        # blocks overlapping [lo, hi]: his >= lo and los <= hi
        i0 = int(np.searchsorted(self.his, lo, side="left"))
        i1 = int(np.searchsorted(self.los, hi, side="right"))
        if i0 >= i1:
            return batch.slice(0, 0)
        if i1 - i0 == 1:
            surv = self._block(i0)
        elif (self.rows is not None
              and int(self.rows[i0:i1].sum()) * 8 > self.span_cap_bytes):
            # span too wide to hold: membership is per-block
            # decomposable (blocks are range-disjoint), so test each
            # block in turn — one block resident at a time
            keep = np.zeros(len(seqs), dtype=bool)
            for i in range(i0, i1):
                surv = self._block(i)
                if len(surv) == 0:
                    continue
                pos = np.minimum(np.searchsorted(surv, seqs),
                                 len(surv) - 1)
                keep |= surv[pos] == seqs
            return batch.filter(pa.array(keep))
        else:
            # blocks are range-disjoint and internally sorted ⇒ the
            # concatenation is sorted; memoized per span
            surv = self.spans.get(
                (i0, i1),
                lambda: np.concatenate(
                    [self._block(i) for i in range(i0, i1)]))
        return _sorted_membership(batch, self.seq_col, surv)


def _blockmask_filter(target, survivors_ds, seq_col: str,
                      concurrency=(1, 8)):
    """Phase 2 of ``payload="join"`` (two-phase block gather): sort
    the survivor seq ids, pin the sorted blocks in the object store,
    and filter the target against per-batch overlapping blocks — the
    target never shuffles, the driver never holds survivor ids (only
    one (ref, lo, hi) triple per block)."""
    import ray

    srt = survivors_ds.sort("seq").materialize()
    refs, nrows = [], []
    for bundle in srt.iter_internal_ref_bundles():
        for ref, md in zip(bundle.block_refs, bundle.metadata):
            if md.num_rows:
                refs.append(ref)
                nrows.append(md.num_rows)
    if not refs:
        return target.map_batches(lambda t: t.slice(0, 0),
                                  batch_format="pyarrow")

    @ray.remote(num_cpus=0.25)
    def bounds(tab) -> tuple[int, int]:
        col = tab.column("seq")
        import pyarrow.compute as pc

        mm = pc.min_max(col).as_py()
        return int(mm["min"]), int(mm["max"])

    bl = ray.get([bounds.remote(r) for r in refs])
    los = np.array([b[0] for b in bl], dtype=np.int64)
    his = np.array([b[1] for b in bl], dtype=np.int64)
    rows = np.array(nrows, dtype=np.int64)
    order = np.argsort(los, kind="stable")
    refs = [refs[i] for i in order]
    los, his, rows = los[order], his[order], rows[order]
    return target.map_batches(
        _BlockMaskFilter,
        fn_constructor_kwargs={"refs": refs, "los": los, "his": his,
                               "rows": rows, "seq_col": seq_col},
        batch_format="pyarrow", concurrency=concurrency,
    )


class _RangeMaskFilter:
    """Actor: filter a batch to surviving seq ids by loading ONLY the
    survivor range-buckets overlapping the batch's own
    [min_seq, max_seq] (small LRU per actor).  ``spill_dir`` must be
    shared storage on a multi-node cluster (same contract as
    checkpoints)."""

    def __init__(self, spill_dir: str, boundaries: np.ndarray,
                 seq_col: str, cache_buckets: int = 8,
                 cache_spans: int = 4):
        self.spill_dir = spill_dir
        self.boundaries = boundaries  # ascending inner bucket edges
        self.seq_col = seq_col
        self.buckets = _LruDict(cache_buckets)
        self.spans = _LruDict(cache_spans)

    def _bucket(self, b: int) -> np.ndarray:
        import os

        import pyarrow.parquet as pq

        def build():
            path = os.path.join(self.spill_dir, f"bucket={b}.parquet")
            return (np.sort(pq.read_table(path).column("seq").to_numpy())
                    if os.path.exists(path) else np.zeros(0, dtype=np.int64))

        return self.buckets.get(b, build)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        seqs = batch.column(self.seq_col).cast(pa.int64()).to_numpy()
        b_lo = int(np.searchsorted(self.boundaries, seqs.min(),
                                   side="right"))
        b_hi = int(np.searchsorted(self.boundaries, seqs.max(),
                                   side="right"))
        if b_lo == b_hi:
            surv = self._bucket(b_lo)
        else:
            # buckets are range-disjoint but each only locally sorted;
            # the merged span needs one sort — memoized per span
            surv = self.spans.get(
                (b_lo, b_hi),
                lambda: np.sort(np.concatenate(
                    [self._bucket(b) for b in range(b_lo, b_hi + 1)])))
        return _sorted_membership(batch, self.seq_col, surv)


RANGEMASK_SENTINEL = "_RANGEMASK.json"


def _clear_rangemask_dir(spill_dir: str) -> None:
    """Guarded reset of a rangemask spill dir: delete it ONLY if it is
    empty or contains nothing but a previous rangemask run's artifacts
    (``bucket=*.parquet``, the sentinel, stray ``*.tmp``).  A directory
    holding anything else (a user's output or checkpoint dir passed by
    mistake) raises instead of being silently destroyed."""
    import shutil

    if os.path.isdir(spill_dir):
        foreign = [e for e in os.listdir(spill_dir)
                   if e != RANGEMASK_SENTINEL
                   and not (e.startswith("bucket=") and e.endswith(".parquet"))
                   and not e.endswith(".tmp")]
        if foreign:
            raise ValueError(
                f"rangemask spill_dir {spill_dir!r} contains non-rangemask "
                f"entries {foreign[:5]}; refusing to delete it — pass an "
                f"empty or dedicated directory")
        shutil.rmtree(spill_dir)
    os.makedirs(spill_dir, exist_ok=True)


def rangemask_spill(survivors_ds, spill_dir: str, range_buckets: int):
    """Write the survivor seq set (Dataset with column ``seq``) to
    ``spill_dir`` bucketed by seq range, finishing with an atomic
    sentinel (``_RANGEMASK.json``) carrying the bucket boundaries —
    so the directory doubles as a resumable checkpoint: a sentinel
    means every bucket underneath it is complete.  Returns the
    boundaries array (None when there are no survivors)."""
    import json

    import pyarrow.parquet as pq

    from ..checkpoint import _atomic_write

    _clear_rangemask_dir(spill_dir)
    survivors_ds = survivors_ds.materialize()
    lo = survivors_ds.min("seq")
    hi = survivors_ds.max("seq")
    if lo is None:  # no survivors at all
        _atomic_write(os.path.join(spill_dir, RANGEMASK_SENTINEL),
                      lambda tmp: open(tmp, "w").write(
                          json.dumps({"empty": True})))
        return None
    # inner edges of range_buckets equal-width buckets over [lo, hi]
    boundaries = np.linspace(lo, hi, range_buckets + 1)[1:-1].astype(
        np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        s = batch.column("seq").to_numpy()
        b = np.searchsorted(boundaries, s, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        tab = pa.table({"seq": group.column("seq").cast(pa.int64())})
        _atomic_write(os.path.join(spill_dir, f"bucket={b}.parquet"),
                      lambda tmp: pq.write_table(tab, tmp))
        return pa.table({"bucket": pa.array([b], pa.int32()),
                         "n": pa.array([len(group)], pa.int64())})

    # one writer per bucket (groupby ownership ⇒ atomic, no races);
    # count() drives the write and returns the tiny summary.  The
    # sentinel lands strictly AFTER every bucket (count() blocks), so
    # a killed spill leaves no sentinel and a resume recomputes.
    (survivors_ds.map_batches(assign, batch_format="pyarrow")
     .groupby("bucket").map_groups(write_bucket, batch_format="pyarrow")
     .count())
    _atomic_write(os.path.join(spill_dir, RANGEMASK_SENTINEL),
                  lambda tmp: open(tmp, "w").write(json.dumps(
                      {"boundaries": boundaries.tolist(),
                       "range_buckets": int(range_buckets)})))
    return boundaries


def rangemask_load(spill_dir: str):
    """Load a completed rangemask checkpoint's boundaries, or None if
    no sentinel exists (spill incomplete / never ran).  An ``empty``
    sentinel (zero survivors) returns the string ``"empty"``."""
    import json

    path = os.path.join(spill_dir, RANGEMASK_SENTINEL)
    if not os.path.exists(path):
        return None
    meta = json.load(open(path))
    if meta.get("empty"):
        return "empty"
    return np.asarray(meta["boundaries"], dtype=np.int64)


def rangemask_apply(target, spill_dir: str, seq_col: str, boundaries):
    """Filter ``target`` to the survivor seqs held in a spilled
    rangemask directory (no shuffle of the target; each task loads
    only its overlapping buckets).  ``boundaries`` is the array from
    :func:`rangemask_spill` / :func:`rangemask_load`; None or
    ``"empty"`` means zero survivors."""
    if boundaries is None or isinstance(boundaries, str):
        return target.map_batches(lambda t: t.slice(0, 0),
                                  batch_format="pyarrow")
    return target.map_batches(
        _RangeMaskFilter,
        fn_constructor_kwargs={"spill_dir": spill_dir,
                               "boundaries": boundaries,
                               "seq_col": seq_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )


def _rangemask_filter(target, survivors_ds, seq_col: str, spill_dir: str,
                      range_buckets: int):
    """Spill the survivor seq set to seq-range buckets, then filter the
    target without shuffling it (see ``dedup_approx`` rangemask docs)."""
    boundaries = rangemask_spill(survivors_ds, spill_dir, range_buckets)
    return rangemask_apply(target, spill_dir, seq_col, boundaries)


class _HashedBloomGateGroup:
    """Mask-mode gate: operates purely on precomputed 128-bit hashes;
    emits the surviving seq ids of one partition (seq order applied)."""

    def __init__(self, policy: ScalingPolicy):
        self.policy = policy

    def __call__(self, group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(group.column("seq"))
        group = group.take(order)
        h1 = group.column("h1").to_numpy().view(np.uint64)
        h2 = group.column("h2").to_numpy().view(np.uint64)
        ids = group.column("seq").to_numpy()
        sb = ScalingBloom(self.policy)
        keep = np.zeros(len(ids), dtype=bool)
        B = 8192
        for s in range(0, len(ids), B):
            e = min(s + B, len(ids))
            seen = sb.check_hashed(h1[s:e], h2[s:e])
            pair = np.stack([h1[s:e], h2[s:e]], axis=1)
            _, first_idx = np.unique(pair, axis=0, return_index=True)
            dup_within = np.ones(e - s, dtype=bool)
            dup_within[first_idx] = False
            kb = (~seen) & (~dup_within)
            keep[s:e] = kb
            if kb.any():
                idx = np.flatnonzero(kb) + s
                sb.add_hashed(h1[idx], h2[idx], ids[idx])
        return pa.table({"seq": pa.array(ids[keep], pa.int64())})


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
    fragment_every: int | None = None,
) -> pa.Table:
    """Resumable scaling-bloom build (SURVEY.md §4.2/§4.3).

    Finished partitions (per the checkpoint manifest) are skipped at
    the read side; remaining chains are built, each published to the
    checkpoint as it streams back (partition file first, then the
    manifest — so a kill mid-run never references a torn write).
    Returns the complete sketch table from the checkpoint.  A resumed
    run is identical to an uninterrupted one because each partition's
    chain is a pure function of its own input rows.

    ``fragment_every``: ALSO checkpoint every N applied rows inside
    each partition (fragment-level resume, SURVEY.md §4.2).  A killed
    mid-partition build resumes from the last fragment: rows with
    ``seq_id <= ckpt _frag_seq`` are dropped before the shuffle, the
    chain continues from the fragment's state, and the final sketch is
    byte-identical to an uninterrupted run (tests/test_checkpoint.py).
    Fragments are superseded by the partition's manifest entry and
    deleted once it lands.
    """
    from ..checkpoint import (
        clear_fragment,
        finished_partitions,
        fragment_checkpoints,
        read_checkpoint,
        write_partition,
    )

    done = finished_partitions(ckpt_dir)
    if set(done) >= set(range(num_partitions)):
        return read_checkpoint(ckpt_dir)  # nothing pending: skip the read
    frags = fragment_checkpoints(ckpt_dir)
    pending = build_scaling_bloom(
        ds, key_col, seq_col, policy=policy, num_partitions=num_partitions,
        op_col=op_col, skip_partitions=set(done),
        resume_fragments=frags or None,
        frag_dir=ckpt_dir if fragment_every else None,
        fragment_every=fragment_every,
    )
    for batch in pending.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in batch.to_pylist():
            write_partition(ckpt_dir, row, lineage=lineage,
                            pipeline="scaling_bloom",
                            num_partitions=num_partitions)
            clear_fragment(ckpt_dir, int(row["part_id"]))
    return read_checkpoint(ckpt_dir)


def build_sketch_checkpointed(
    ds,
    key_col: str,
    sketch_factory: Callable[[], object],
    ckpt_dir: str,
    num_partitions: int = 16,
    lineage: dict | None = None,
) -> pa.Table:
    """Resumable mergeable-sketch build (counting bloom / HLL / CMS):
    the hashed-groupby strategy with per-partition checkpoint
    publication, mirroring :func:`build_scaling_bloom_checkpointed`.
    Finished partitions are dropped before the shuffle; a resumed run
    equals an uninterrupted one because every partition's sketch is a
    pure function of its own keys.

    Requires a hash-kernel sketch (``add_hashed``); key-preserving
    sketches like top-k need the string keys this path's hash-only
    projection discards — build those via :func:`build_sketch`
    (PartialSketchEmit keeps the key column)."""
    from ..checkpoint import finished_partitions, read_checkpoint, write_partition

    probe = sketch_factory()
    if not hasattr(probe, "add_hashed"):
        raise TypeError(
            f"build_sketch_checkpointed requires a hash-kernel sketch "
            f"with add_hashed(); {type(probe).__name__} does not have "
            f"one — use build_sketch() for key-preserving sketches")
    done = finished_partitions(ckpt_dir)
    if set(done) >= set(range(num_partitions)):
        return read_checkpoint(ckpt_dir)
    hashed = ds.map_batches(hash_project(key_col, num_partitions),
                            batch_format="pyarrow")
    if done:
        skip = pa.array(sorted(int(p) for p in done), pa.int32())

        def drop_done(batch: pa.Table) -> pa.Table:
            keep = pa.compute.invert(
                pa.compute.is_in(batch.column("part_id"), value_set=skip))
            return batch.filter(keep)

        hashed = hashed.map_batches(drop_done, batch_format="pyarrow")
    builder = HashedGroupBuild(sketch_factory)

    def build_group(group: pa.Table) -> pa.Table:
        return builder(group)

    pending = hashed.groupby("part_id").map_groups(build_group,
                                                   batch_format="pyarrow")
    for batch in pending.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in batch.to_pylist():
            write_partition(ckpt_dir, row, lineage=lineage,
                            pipeline="sketch_build",
                            num_partitions=num_partitions)
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
