"""Arrow-native serialization of sketch state (SURVEY.md §1.2b).

Every sketch kind serializes to one row of the canonical **sketch
table** so sketches can ride through ``groupby().aggregate()`` trees,
be written as Parquet checkpoints, and be broadcast with ``ray.put``:

    kind        string   "counting_bloom" | "scaling_bloom" | "hll" |
                         "cms" | "tdigest" | "kll" | "minhash" ...
    part_id     int32    owning partition (0 for global sketches)
    params      string   JSON of the constructor params
    state       binary   packed state bytes (kind-specific layout)
    count       int64    number of accumulated items (header->count)
    mem_seqnum  int64    applied-op generation (reference seqnum, §4.2)

Unlike the reference's file format (geometry re-derived from caller
args, ``new_scaling_bloom_from_file`` src/dablooms.c ≈L520), rows are
fully self-describing.
"""

from __future__ import annotations

import json

import pyarrow as pa

SKETCH_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("part_id", pa.int32()),
        ("params", pa.string()),
        ("state", pa.binary()),
        ("count", pa.int64()),
        ("mem_seqnum", pa.int64()),
    ]
)

_REGISTRY: dict[str, type] = {}


def register_sketch(kind: str):
    """Class decorator: registers a sketch type for deserialization.

    The class must provide ``to_state() -> (params_dict, state_bytes,
    count, mem_seqnum)`` and ``from_state(params_dict, state_bytes,
    count, mem_seqnum) -> instance``.
    """

    def wrap(cls):
        cls.KIND = kind
        _REGISTRY[kind] = cls
        return cls

    return wrap


def sketch_to_row(sketch, part_id: int = 0) -> dict:
    params, state, count, seq = sketch.to_state()
    return {
        "kind": sketch.KIND,
        "part_id": part_id,
        "params": json.dumps(params, sort_keys=True),
        "state": state,
        "count": count,
        "mem_seqnum": seq,
    }


def rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in SKETCH_SCHEMA.names}
    return pa.table(cols, schema=SKETCH_SCHEMA)


def _ensure_registry() -> None:
    """Import all sketch modules so their @register_sketch decorators
    have run — needed on Ray workers, which only import the modules
    referenced by the pickled UDF, not the whole package."""
    from .sketches import (  # noqa: F401
        cms, counting, hll, kll, scaling, tdigest, topk,
    )


def sketch_from_row(row: dict):
    if row["kind"] not in _REGISTRY:
        _ensure_registry()
    cls = _REGISTRY[row["kind"]]
    return cls.from_state(
        json.loads(row["params"]), row["state"], int(row["count"]),
        int(row["mem_seqnum"]),
    )


def table_to_sketches(table: pa.Table) -> dict[int, object]:
    """Sketch table → {part_id: sketch}. Rows with the same part_id are
    merged (associative combine)."""
    out: dict[int, object] = {}
    for row in table.to_pylist():
        sk = sketch_from_row(row)
        pid = int(row["part_id"])
        out[pid] = out[pid].merge(sk) if pid in out else sk
    return out
