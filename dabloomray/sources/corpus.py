"""Corpus sources — schema-validated reads (SURVEY.md §1.2a).

The input contract (BASELINE.json input_hint) is a Parquet table of
Common-Crawl-style pages: (url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string).  ``read_corpus`` validates the
schema at plan time (fail fast, before any task runs) and prunes
columns at the read — only requested columns leave storage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_SCHEMA = {
    "url": pa.string(),
    "warc_ts": pa.timestamp("us"),
    "html": pa.binary(),
    "text": pa.string(),
    "lang": pa.string(),
}


def validate_corpus_schema(path: str, required: list[str] | None = None) -> None:
    """Raise ValueError if the parquet schema doesn't satisfy the
    corpus contract for the ``required`` columns (default: all)."""
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise ValueError(f"no parquet files under {path}")
        probe = files[0]
    else:
        probe = path
    schema = pq.ParquetFile(probe).schema_arrow
    for col in required or list(CORPUS_SCHEMA):
        want = CORPUS_SCHEMA[col]
        idx = schema.get_field_index(col)
        if idx < 0:
            raise ValueError(f"corpus missing column {col!r} "
                             f"(have {schema.names})")
        got = schema.field(idx).type
        if got != want:
            raise ValueError(
                f"corpus column {col!r} has type {got}, expected {want}")


def read_corpus(path: str, columns: list[str] | None = None,
                override_num_blocks: int | None = None,
                validate: bool = True):
    """Schema-validated, column-pruned corpus read → ray.data.Dataset."""
    import ray.data as rd

    if validate:
        validate_corpus_schema(path, required=columns)
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, columns=columns, **kw)


def read_text_corpus(path: str, encoding: str = "utf-8"):
    """Newline-delimited key source — the reference test harness's
    words-file reader (chomp_line, src/test_dablooms.c ≈L30) as a Ray
    source; one column ``word``."""
    import ray.data as rd

    ds = rd.read_text(path, encoding=encoding)
    return ds.map_batches(
        lambda t: pa.table({"word": t.column("text")}),
        batch_format="pyarrow",
    )
