"""Sampling operators (SURVEY.md §2.6 "sorts / limits / top-k /
sampling").

Two flavors, both streaming map_batches filters (no shuffle, no
materialization — each block decides for its own rows):

- :func:`sample_by_hash` — DETERMINISTIC Bernoulli sample keyed on a
  column's content hash: a row is kept iff murmur64(key) < p * 2^64.
  Reproducible across runs, parallelism, and block layout, and
  CONSISTENT across tables — sampling two tables by the same key
  keeps matching rows in both (the standard trick for sampling
  joinable pairs at 100 TB).  Also usable as a deterministic
  train/test splitter.
- ``Dataset.random_sample(fraction, seed=...)`` — Ray's built-in
  per-block pseudo-random sample; used for e.g. quantizer training in
  :func:`dabloomray.pipelines.similarity.ivf_knn` where cross-run
  key-consistency is not required.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import murmur3_x64_128_batch

SAMPLE_SEED = 0x5A4D11CE


def sample_by_hash(ds, key_col: str, fraction: float,
                   seed: int = SAMPLE_SEED):
    """Deterministic Bernoulli sample: keep rows whose
    murmur64(key, seed) falls below ``fraction`` of the hash space.

    Every duplicate of a key is kept or dropped together (the sample
    of a deduplicated table equals the dedup of a sampled table), and
    the decision is a pure function of (key, seed) — re-runs, resumes
    and different partitionings return the identical row set.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * 2.0**64)
    if cut >= 2**64:  # fraction == 1.0: keep everything
        return ds
    threshold = np.uint64(cut)

    def keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        h, _ = murmur3_x64_128_batch(batch.column(key_col), seed=seed)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")
