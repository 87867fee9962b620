"""pydablooms-compatible API — drop-in shim for reference users.

Mirrors the CPython binding surface (pydablooms/pydablooms.c ≈L1–470):

    bloom = Dablooms(capacity, error_rate, filepath)   # create
    bloom.add(key, id);  bloom.delete(key, id)         # seq-gated ops
    bloom.check(key);  key in bloom                    # membership
    bloom.flush()                                      # durability point
    bloom.mem_seqnum;  bloom.disk_seqnum               # §4.2 protocol
    bloom = load_dablooms(capacity, error_rate, filepath)  # reopen

Differences from the C binding, by design:
- the backing store is a self-describing one-row Parquet checkpoint
  (serde.SKETCH_SCHEMA), not a raw mmap — ``load_dablooms`` ignores
  the capacity/error_rate args beyond validation (the reference
  re-derives geometry from them; our files carry their params).
- batch methods (``add_batch``/``check_batch``) expose the vectorized
  kernels; scalar calls wrap them.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from .params import ScalingPolicy
from .serde import rows_to_table, sketch_from_row, sketch_to_row
from .sketches.scaling import ScalingBloom


class Dablooms:
    """Scaling counting bloom with the pydablooms surface."""

    def __init__(self, capacity: int, error_rate: float, filepath: str,
                 _bloom: ScalingBloom | None = None,
                 _disk_seqnum: int = 0):
        self.capacity = capacity
        self.error_rate = error_rate
        self.filepath = filepath
        self._bloom = _bloom if _bloom is not None else ScalingBloom(
            ScalingPolicy(capacity0=capacity, target_error=error_rate))
        self._disk_seqnum = _disk_seqnum

    # -- reference API ------------------------------------------------------
    def add(self, key: str | bytes, id: int) -> bool:
        self._bloom.add([_as_str(key)], [id])
        return True

    def delete(self, key: str | bytes, id: int) -> bool:
        routed = self._bloom.remove([_as_str(key)], [id])
        return bool(routed.all())

    def check(self, key: str | bytes) -> bool:
        return bool(self._bloom.check([_as_str(key)])[0])

    def __contains__(self, key) -> bool:
        return self.check(key)

    def flush(self) -> None:
        """Persist atomically; advances disk_seqnum to mem_seqnum
        (scaling_bloom_flush, src/dablooms.c ≈L630)."""
        row = sketch_to_row(self._bloom, part_id=0)
        tmp = self.filepath + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(self.filepath)),
                    exist_ok=True)
        pq.write_table(rows_to_table([row]), tmp)
        os.replace(tmp, self.filepath)
        self._disk_seqnum = self._bloom.mem_seqnum

    @property
    def mem_seqnum(self) -> int:
        return self._bloom.mem_seqnum

    @property
    def disk_seqnum(self) -> int:
        return self._disk_seqnum

    # -- vectorized extensions ---------------------------------------------
    def add_batch(self, keys, ids) -> None:
        self._bloom.add(list(map(_as_str, keys)), ids)

    def delete_batch(self, keys, ids) -> np.ndarray:
        return self._bloom.remove(list(map(_as_str, keys)), ids)

    def check_batch(self, keys) -> np.ndarray:
        return self._bloom.check(list(map(_as_str, keys)))


def load_dablooms(capacity: int, error_rate: float,
                  filepath: str) -> Dablooms:
    """Reopen from file (new_scaling_bloom_from_file, src/dablooms.c
    ≈L520).  Unlike the reference, the file is self-describing; the
    capacity/error_rate args are accepted for signature parity."""
    table = pq.read_table(filepath)
    row = table.to_pylist()[0]
    bloom = sketch_from_row(row)
    return Dablooms(capacity, error_rate, filepath, _bloom=bloom,
                    _disk_seqnum=bloom.mem_seqnum)


def _as_str(key) -> str:
    return key.decode("utf-8", errors="surrogateescape") \
        if isinstance(key, bytes) else str(key)
