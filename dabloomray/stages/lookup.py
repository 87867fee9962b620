"""Broadcast small-side joins (dimension lookups).

The other half of the join playbook (SURVEY.md §2.6 "joins /
lookups"): when one side fits comfortably in memory (dimension
tables: nation is 25 rows, region 5), a hash-shuffle ``Dataset.join``
wastes an all-to-all exchange of the big side.  Instead the small
side is ``ray.put`` ONCE and every map task appends the looked-up
columns with a vectorized searchsorted — zero shuffle, the big side
streams through untouched.

Contrast with:
- ``Dataset.join`` (both sides large, hash-partitioned) —
  ``orders_by_segment`` in ``__ray_entry__``;
- the bloom semi-join (approximate gate + exact verify) —
  ``membership_semijoin``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BroadcastLookup:
    """map_batches actor: append dimension columns via a broadcast
    lookup table, rehydrated once per actor in ``__init__`` (never per
    batch).  Inner-join semantics: rows with no match are dropped."""

    def __init__(self, dim_ref, dim_key: str, key_col: str,
                 add_cols: list[str]):
        import ray

        tab = ray.get(dim_ref)
        keys = tab.column(dim_key).to_numpy()
        order = np.argsort(keys)
        self.keys = keys[order]
        self.cols = {c: tab.column(c).take(pa.array(order)).combine_chunks()
                     for c in add_cols}
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0 or len(self.keys) == 0:
            batch = batch.slice(0, 0)
            for c, arr in self.cols.items():
                batch = batch.append_column(c, arr.slice(0, 0))
            return batch
        k = batch.column(self.key_col).to_numpy()
        pos = np.minimum(np.searchsorted(self.keys, k), len(self.keys) - 1)
        match = self.keys[pos] == k
        batch = batch.filter(pa.array(match))
        pos = pos[match]
        idx = pa.array(pos.astype(np.int64))
        for c, arr in self.cols.items():
            batch = batch.append_column(c, arr.take(idx))
        return batch


def broadcast_join(ds, dim_table: pa.Table, dim_key: str, key_col: str,
                   add_cols: list[str], concurrency=(1, 4),
                   max_dim_bytes: int = 256 * 1024 * 1024):
    """Inner-join ``ds`` against a driver-held dimension table by
    broadcasting it once (``ray.put``) — the small-side-broadcast
    pattern; refuses tables too big to broadcast (use ``Dataset.join``
    for those)."""
    import ray

    if dim_table.nbytes > max_dim_bytes:
        raise ValueError(
            f"dimension table is {dim_table.nbytes} B > broadcast limit "
            f"{max_dim_bytes} B — use Dataset.join for large sides")
    ref = ray.put(dim_table.select([dim_key, *add_cols]).combine_chunks())
    return ds.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs={"dim_ref": ref, "dim_key": dim_key,
                               "key_col": key_col, "add_cols": add_cols},
        batch_format="pyarrow", concurrency=concurrency,
    )
