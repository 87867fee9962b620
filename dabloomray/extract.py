"""Deterministic html→text extraction — byte-identical invariant.

The reference has no text extraction (dablooms keys are opaque bytes);
this is NEW per BASELINE.json input_hint: "byte-identical extracted text
per url".  The extractor is a pure function of the html bytes: title +
body text, newline-joined, NFC-normalized, no trailing whitespace —
same bytes at any parallelism, any run.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa

_TAG = re.compile(rb"<[^>]+>")
_TITLE = re.compile(rb"<title[^>]*>(.*?)</title>", re.S | re.I)
_BODY = re.compile(rb"<body[^>]*>(.*?)</body>", re.S | re.I)
_WS = re.compile(r"\s+")


def extract_text(html: bytes) -> str:
    """Deterministic extraction: title line + body line, '\\n'-joined."""
    if html is None:
        return ""
    parts = []
    m = _TITLE.search(html)
    if m:
        parts.append(m.group(1))
    m = _BODY.search(html)
    if m:
        parts.append(_TAG.sub(b" ", m.group(1)))
    if not parts:
        parts.append(_TAG.sub(b" ", html))
    lines = []
    for raw in parts:
        s = raw.decode("utf-8", errors="replace")
        s = _WS.sub(" ", s).strip()
        if s:
            lines.append(s)
    return unicodedata.normalize("NFC", "\n".join(lines))


def extract_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "text") -> pa.Table:
    """map_batches stage: html binary column → text column.

    Row loop is unavoidable (regex over variable-length binary), but the
    regexes are module-level-compiled and the stage is stateless, so it
    scales horizontally; at 100 TB this is the dominant embarrassingly
    parallel compute stage.
    """
    htmls = batch.column(html_col).to_pylist()
    texts = pa.array([extract_text(h) for h in htmls], pa.string())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, texts)
