"""Per-partition checkpoint / resume with lineage + metrics.

Reference counterpart: the mmap file + ``scaling_bloom_flush`` seqnum
protocol (src/dablooms.c ≈L630; ``new_scaling_bloom_from_file`` ≈L520
is the resume path).  Our checkpoints are self-describing Parquet
sketch rows — one file per partition, written atomically (tmp + rename)
— plus a JSON manifest:

    manifest = {
      "version": 1,
      "pipeline": "<name>",
      "partitions": {
         "<part_id>": {"ckpt_seqnum": int,   # == disk_seqnum (§4.2)
                        "rows_processed": int,
                        "file": "part=<pid>.parquet"},
      },
      "lineage": {...}                        # input paths / fragment ids
    }

A resume reads the manifest, skips finished partitions, and rebuilds
only the rest — valid because partition ownership is a pure function of
the key (murmur64 % P), so a partition's sketch depends only on its own
input rows.  ``ckpt_seqnum`` mirrors the reference's disk_seqnum: a
partition file is only referenced from the manifest after its rename
completed, so a torn write is never visible (the mmap analogue of
``mem_seqnum == 0`` detection).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from .serde import SKETCH_SCHEMA

MANIFEST = "_MANIFEST.json"


def _atomic_write(path: str, write_fn) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        write_fn(tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def write_partition(ckpt_dir: str, row: dict, lineage: dict | None = None,
                    pipeline: str = "sketch",
                    num_partitions: int | None = None) -> None:
    """Checkpoint one partition's sketch row, then publish it in the
    manifest (write order = durability order, §4.2).

    ``num_partitions`` records the BUILD-TIME partition count in the
    manifest so the check side never has to infer it from observed
    part_ids (empty partitions emit no sketch row; inferring a smaller
    modulus would misroute keys and produce false negatives)."""
    pid = int(row["part_id"])
    fname = f"part={pid}.parquet"
    table = pa.table({k: [row[k]] for k in SKETCH_SCHEMA.names},
                     schema=SKETCH_SCHEMA)
    _atomic_write(os.path.join(ckpt_dir, fname),
                  lambda tmp: pq.write_table(table, tmp))
    man = read_manifest(ckpt_dir) or {
        "version": 1, "pipeline": pipeline, "partitions": {}, "lineage": {}}
    man["partitions"][str(pid)] = {
        "ckpt_seqnum": int(row["mem_seqnum"]),
        "rows_processed": int(row["count"]),
        "file": fname,
    }
    if num_partitions is not None:
        man["num_partitions"] = int(num_partitions)
    if lineage:
        man["lineage"].update(lineage)
    _atomic_write(
        os.path.join(ckpt_dir, MANIFEST),
        lambda tmp: open(tmp, "w").write(json.dumps(man, indent=1,
                                                    sort_keys=True)),
    )


def write_checkpoint(sketch_table: pa.Table, ckpt_dir: str,
                     lineage: dict | None = None,
                     pipeline: str = "sketch") -> None:
    for row in sketch_table.to_pylist():
        write_partition(ckpt_dir, row, lineage=lineage, pipeline=pipeline)


FRAG_SUFFIX = ".fragment.parquet"


def write_fragment(ckpt_dir: str, row: dict, last_seq: int) -> None:
    """Mid-partition (fragment-level) checkpoint: the partition's
    chain state after applying every row with seq_id <= ``last_seq``.

    Written ATOMICALLY by the worker building that partition (exactly
    one writer per partition — partition ownership is exclusive), and
    deliberately NOT published in the manifest: concurrent workers
    must not race the manifest's read-modify-write, and a fragment is
    advisory — losing one only costs replay, never correctness.  On a
    multi-node cluster ``ckpt_dir`` must be shared storage (the same
    requirement the manifest already has).

    ``last_seq`` rides in the params JSON (``_frag_seq``) so the
    resume path knows which input rows are already applied; sketch
    ``from_state`` ignores unknown params keys."""
    pid = int(row["part_id"])
    params = json.loads(row["params"])
    params["_frag_seq"] = int(last_seq)
    row = dict(row, params=json.dumps(params, sort_keys=True))
    table = pa.table({k: [row[k]] for k in SKETCH_SCHEMA.names},
                     schema=SKETCH_SCHEMA)
    _atomic_write(os.path.join(ckpt_dir, f"part={pid}{FRAG_SUFFIX}"),
                  lambda tmp: pq.write_table(table, tmp))


def fragment_checkpoints(ckpt_dir: str) -> dict[int, dict]:
    """{part_id: fragment row} for partitions with a mid-build
    fragment but NO completed manifest entry (a manifest entry
    supersedes any leftover fragment)."""
    import glob

    done = finished_partitions(ckpt_dir)
    out: dict[int, dict] = {}
    for path in glob.glob(os.path.join(ckpt_dir, f"part=*{FRAG_SUFFIX}")):
        row = pq.read_table(path).to_pylist()[0]
        pid = int(row["part_id"])
        if pid not in done:
            out[pid] = row
    return out


def fragment_last_seq(row: dict) -> int:
    return int(json.loads(row["params"]).get("_frag_seq", -1))


def clear_fragment(ckpt_dir: str, pid: int) -> None:
    path = os.path.join(ckpt_dir, f"part={int(pid)}{FRAG_SUFFIX}")
    if os.path.exists(path):
        os.unlink(path)


def read_manifest(ckpt_dir: str) -> dict | None:
    path = os.path.join(ckpt_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def finished_partitions(ckpt_dir: str) -> dict[int, dict]:
    """{part_id: {ckpt_seqnum, rows_processed, file}} for every
    partition the manifest references (torn writes are invisible)."""
    man = read_manifest(ckpt_dir)
    if man is None:
        return {}
    return {int(pid): meta for pid, meta in man["partitions"].items()}


def read_checkpoint(ckpt_dir: str) -> pa.Table:
    """All checkpointed sketch rows (manifest-referenced files only)."""
    parts = finished_partitions(ckpt_dir)
    tables = [
        pq.read_table(os.path.join(ckpt_dir, meta["file"]))
        for _, meta in sorted(parts.items())
    ]
    if not tables:
        return pa.table({k: [] for k in SKETCH_SCHEMA.names},
                        schema=SKETCH_SCHEMA)
    return pa.concat_tables(tables)
