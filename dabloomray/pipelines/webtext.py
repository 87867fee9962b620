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

import numpy as np
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
    # phase 1: mask-mode dedup — only (part_id, h1, h2, seq) shuffle;
    # phase 2 filter applied to the full-width read
    survivors = dedup_approx(light, "url", "seq_id", policy=policy,
                             num_partitions=num_partitions, payload="mask",
                             apply_to=full)

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
