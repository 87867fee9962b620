"""End-to-end Common-Crawl-style webtext pipeline — the flagship job
(SURVEY.md §3.1 "our equivalent").

    read (url, warc_ts, html)                        [columns pruned]
      └─ phase 1: url+seq only → hash-only shuffle → per-partition
         scaling-bloom dedup gate → survivor seq ids  (mask mode —
         documents never enter the exchange)
      └─ phase 2: filter survivors → extract_text (byte-identical) →
         token counts → quality scores → fingerprint → write Parquet

Dedup runs BEFORE the expensive extraction so duplicate documents are
never extracted — the right stage order at 100 TB.  Output is a
directory of Parquet files (one per block) so a rerun can resume per
partition.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..params import ScalingPolicy
from ..stages.text import QualityScore, fingerprint, token_count_whitespace
from .core import dedup_approx


def add_seq_from_ts(ts_col: str = "warc_ts", out_col: str = "seq_id"):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col,
                                   pc.cast(batch.column(ts_col), pa.int64()))

    return fn


def webtext_pipeline(
    input_path: str,
    out_dir: str | None = None,
    policy: ScalingPolicy | None = None,
    num_partitions: int = 32,
    override_num_blocks: int | None = None,
    drop_html: bool = True,
):
    """Full pipeline over a corpus parquet with columns
    (url, warc_ts, html[, ...]).  Returns the final Dataset (already
    written to ``out_dir`` when given).

    Two reads of the same files with different column pruning: the
    dedup phase deserializes only (url, warc_ts) — html bytes are
    never touched for rows that will be dropped as duplicates."""
    import ray.data as rd

    policy = policy or ScalingPolicy(capacity0=50_000, target_error=0.05)
    kw = {"override_num_blocks": override_num_blocks} \
        if override_num_blocks else {}
    light = rd.read_parquet(input_path, columns=["url", "warc_ts"], **kw) \
        .map_batches(add_seq_from_ts(), batch_format="pyarrow")
    full = rd.read_parquet(input_path,
                           columns=["url", "warc_ts", "html"], **kw) \
        .map_batches(add_seq_from_ts(), batch_format="pyarrow")
    # phase 1: hash-only dedup shuffle — only (part_id, h1, h2, seq)
    # moves; phase 2 filter applied to the full-width read.  'auto'
    # picks mask while the survivor set fits the driver (~1e8), then
    # the range-bucketed spill mask (this corpus is warc_ts-ordered,
    # rangemask's sweet spot) — same output either way
    spill = os.path.join(out_dir, "_dedup_spill") if out_dir else None
    survivors = dedup_approx(light, "url", "seq_id", policy=policy,
                             num_partitions=num_partitions, payload="auto",
                             spill_dir=spill, apply_to=full)

    from ..extract import extract_text_batch

    out = survivors.map_batches(extract_text_batch, batch_format="pyarrow")
    if drop_html:  # keep the shuffle-free tail light (SURVEY.md §7.5)
        out = out.drop_columns(["html"])
    out = out.map_batches(token_count_whitespace, batch_format="pyarrow")
    out = out.map_batches(QualityScore(), batch_format="pyarrow")
    out = out.map_batches(fingerprint, batch_format="pyarrow")
    if out_dir is not None:
        out.write_parquet(out_dir)
    return out


def webtext_neardup_pipeline(
    input_path: str,
    out_dir: str | None = None,
    policy: ScalingPolicy | None = None,
    num_partitions: int = 32,
    override_num_blocks: int | None = None,
    threshold: float = 0.8,
    **lsh_kwargs,
):
    """The full LLM-training-data composition: exact URL dedup (cheap,
    hash-only shuffle, BEFORE extraction) → html→text extraction →
    token/quality stats → fingerprints → CONTENT near-dedup
    (MinHash-LSH → verified pairs → min-label components → keep the
    earliest seq per cluster).  The two dedups answer different
    questions — same page fetched twice vs the same content hosted on
    different urls — and their order is the cost-correct one at 100
    TB: url-dups never pay extraction, and the expensive near-dup
    banding runs only on surviving extracted text.

    Fully distributed end-to-end (the near-dup stage inherits the
    no-driver-corpus guarantees of ``near_dedup_keep_first``).
    Returns the surviving Dataset (written to ``out_dir`` when
    given)."""
    from .dedup import near_dedup_keep_first

    base = webtext_pipeline(input_path, out_dir=None, policy=policy,
                            num_partitions=num_partitions,
                            override_num_blocks=override_num_blocks)
    out = near_dedup_keep_first(base, "seq_id", "text",
                                threshold=threshold,
                                num_partitions=max(8, num_partitions // 4),
                                **lsh_kwargs)
    if out_dir is not None:
        out.write_parquet(out_dir)
    return out


def webtext_pipeline_resumable(
    input_path: str,
    out_dir: str,
    policy: ScalingPolicy | None = None,
    num_partitions: int = 32,
    max_shards: int | None = None,
    range_buckets: int = 64,
) -> dict:
    """Resumable variant: one output directory per INPUT SHARD (file),
    written atomically and tracked in a manifest — a failed run skips
    finished shards on restart ("resumable output" layout).

    Two-level resume:
    1. the GLOBAL dedup survivor set (order-dependent across shards) is
       computed once and checkpointed AS a rangemask bucket directory
       (``_survivor_buckets/``): seq-range-bucketed parquet files plus
       an atomic sentinel.  Nothing survivor-sized ever lands on the
       driver or in a ``ray.put`` — the same beyond-10^8-survivors
       contract as ``dedup_approx(payload="rangemask")``, and the spill
       is already a persisted, resumable artifact (sentinel == every
       bucket complete).
    2. the shard-parallel tail (rangemask filter → extract → stats →
       write) runs per input file; each finished shard is published to
       ``_MANIFEST.json`` only after its directory rename.

    ``max_shards`` stops after N shards (fault-injection hook for
    tests).  Returns the manifest.  A resumed run is identical to an
    uninterrupted one because the survivor set is deterministic and
    each shard's output depends only on that set and its own file.
    """
    import glob
    import json

    import ray.data as rd

    from ..checkpoint import _atomic_write
    from ..extract import extract_text_batch
    from .core import (
        dedup_survivor_seqs,
        rangemask_apply,
        rangemask_load,
        rangemask_spill,
    )

    policy = policy or ScalingPolicy(capacity0=50_000, target_error=0.05)
    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, "_MANIFEST.json")
    manifest = (json.load(open(man_path))
                if os.path.exists(man_path) else {"shards": {}})

    # phase 1: global survivors, checkpointed as the rangemask spill
    spill_dir = os.path.join(out_dir, "_survivor_buckets")
    boundaries = rangemask_load(spill_dir)
    if boundaries is None:  # no sentinel: spill absent or incomplete
        light = rd.read_parquet(input_path, columns=["url", "warc_ts"]) \
            .map_batches(add_seq_from_ts(), batch_format="pyarrow")
        survivors = dedup_survivor_seqs(light, "url", "seq_id",
                                        policy, num_partitions)
        boundaries = rangemask_spill(survivors, spill_dir, range_buckets)

    files = sorted(glob.glob(os.path.join(input_path, "*.parquet"))) \
        if os.path.isdir(input_path) else [input_path]
    done = 0
    for i, f in enumerate(files):
        # keyed by input basename, NOT enumeration index: if files are
        # added/removed between a failed run and its resume, indices
        # shift and an index key would skip or overwrite the wrong
        # shards.  Double-check the recorded input path before skipping.
        sid = os.path.basename(f)
        prev = manifest["shards"].get(sid)
        if prev is not None and prev.get("input") == f:
            continue
        if max_shards is not None and done >= max_shards:
            break
        shard_dir = os.path.join(out_dir, f"shard={sid}")
        tmp_dir = shard_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(shard_dir, ignore_errors=True)
        ds = rd.read_parquet(f, columns=["url", "warc_ts", "html"]) \
            .map_batches(add_seq_from_ts(), batch_format="pyarrow")

        out = rangemask_apply(ds, spill_dir, "seq_id", boundaries)
        out = out.map_batches(extract_text_batch, batch_format="pyarrow") \
            .drop_columns(["html"])
        out = out.map_batches(token_count_whitespace, batch_format="pyarrow")
        out = out.map_batches(QualityScore(), batch_format="pyarrow")
        out = out.map_batches(fingerprint, batch_format="pyarrow")
        out.write_parquet(tmp_dir)
        os.replace(tmp_dir, shard_dir)  # atomic publish of the shard
        manifest["shards"][sid] = {"input": f, "dir": f"shard={sid}"}
        _atomic_write(man_path, lambda tmp: open(tmp, "w").write(
            json.dumps(manifest, indent=1, sort_keys=True)))
        done += 1
    return manifest
