"""Skew-aware grouped aggregation + windows + top-k.

SURVEY.md §4.4 / north_star "salted-key skew handling": a hot key (the
F1 corpus plants one hot host on ~1% of rows) would make one reduce
task the straggler in a naive ``groupby(key)``.  The salted two-phase
plan bounds any reduce task's input at ~1/S of the hot key's mass:

    phase 1: groupby((key, salt = h2 % S)) partial aggregate
    phase 2: groupby(key) combine partials (S rows per key, tiny)

Both phases are Ray groupby-aggregates; phase-1 output is at most
S x distinct_keys rows, so phase 2 is negligible.  Valid for any
commutative-monoid aggregate (count/sum/min/max, sketch merges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures import splitmix64


def salted_counts(ds, key_col: str, num_salts: int = 16,
                  out_col: str = "n"):
    """COUNT(*) per key, hot-key safe (salted two-phase)."""
    from ray.data.aggregate import Count, Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        # deterministic per-row salt (splitmix of a row counter is NOT
        # stable across runs; derive from a cheap row-content hash)
        h = splitmix64(7, np.arange(n, dtype=np.uint64))  # within-batch
        return batch.append_column(
            "_salt", pa.array((h % np.uint64(num_salts)).astype(np.int32)))

    phase1 = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key_col, "_salt"])
        .aggregate(Count(alias_name="_partial"))
    )
    phase2 = phase1.groupby(key_col).aggregate(
        Sum("_partial", alias_name=out_col))
    return phase2


def tumbling_window_agg(ds, ts_col: str, key_col: str,
                        width_seconds: int = 3600):
    """Tumbling event-time windows as a grouped aggregate:
    window = floor(epoch / width).  Ray Data has no watermarks; batch
    semantics over a complete table equal the SQL GROUP BY oracle
    (ray_guide: streaming-shaped workloads)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64())  # microseconds
        w = pc.floor(pc.divide(pc.cast(epoch, pa.float64()),
                               float(width_seconds * 1_000_000)))
        return batch.append_column("window_id", pc.cast(w, pa.int64()))

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby([key_col, "window_id"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )


def top_k_by_count(ds, key_col: str, k: int = 20, out_col: str = "n"):
    """Top-k keys by frequency: pre-aggregated groupby (small result)
    then a driver-side sort of the distinct-key table — never a global
    row sort.  Ties broken by key ascending (deterministic)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(key_col).aggregate(Count(alias_name=out_col))
    tab = pa.concat_tables(list(
        counts.iter_batches(batch_size=None, batch_format="pyarrow")))
    order = pa.compute.sort_indices(
        tab, sort_keys=[(out_col, "descending"), (key_col, "ascending")])
    return tab.take(order.slice(0, k))
