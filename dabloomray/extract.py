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
import pyarrow.compute as pc

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

    Two paths, byte-identical by construction:
    - **fast path** (valid-utf8, pure-ASCII rows with a <title> or
      <body> match): Arrow RE2 kernels end-to-end — extract_regex for
      title/body, replace_substring_regex for tag-strip and whitespace
      collapse.  ASCII-only is required because Python's ``\\s`` (str
      mode) and RE2's ``\\s`` disagree on unicode whitespace, and NFC
      is the identity on ASCII.
    - **scalar fallback** (non-ascii, invalid utf-8, or neither tag
      matched): the reference scalar :func:`extract_text` per row.
    Equivalence is pinned by tests/test_extract.py over adversarial
    inputs.
    """
    col = batch.column(html_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    texts: list[str | None] = [None] * n
    try:
        as_str = pc.cast(col, pa.string())  # validates utf-8
        decodable = np.ones(n, dtype=bool)
    except pa.ArrowInvalid:
        as_str = None
        decodable = np.zeros(n, dtype=bool)

    if as_str is not None:
        ascii_ok = pc.fill_null(pc.string_is_ascii(as_str), False) \
            .to_numpy(zero_copy_only=False)
        title = pc.struct_field(
            pc.extract_regex(as_str, r"(?is)<title[^>]*>(?P<t>.*?)</title>"),
            "t")
        body = pc.struct_field(
            pc.extract_regex(as_str, r"(?is)<body[^>]*>(?P<b>.*?)</body>"),
            "b")
        has_title = pc.is_valid(title).to_numpy(zero_copy_only=False)
        has_body = pc.is_valid(body).to_numpy(zero_copy_only=False)
        fast = ascii_ok & (has_title | has_body)
        if fast.any():
            def clean(arr):
                arr = pc.fill_null(arr, "")
                # Python str-mode \s on ASCII = [ \t\n\r\f\v\x1c-\x1f];
                # RE2's \s is narrower ([\t\n\f\r ]) — spell it out for
                # byte parity with the scalar path
                arr = pc.replace_substring_regex(
                    arr, "[ \\t\\n\\r\\f\\v\\x1c-\\x1f]+", " ")
                return pc.utf8_trim_whitespace(arr)

            t_clean = clean(title)
            b_clean = clean(
                pc.replace_substring_regex(pc.fill_null(body, ""),
                                           r"<[^>]+>", " "))
            # join non-empty parts with "\n"
            t_np = t_clean.to_numpy(zero_copy_only=False)
            b_np = b_clean.to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(fast):
                parts = []
                if has_title[i] and t_np[i]:
                    parts.append(t_np[i])
                if has_body[i] and b_np[i]:
                    parts.append(b_np[i])
                texts[i] = "\n".join(parts)
    else:
        ascii_ok = np.zeros(n, dtype=bool)

    # scalar fallback for everything the fast path didn't cover
    pending = [i for i in range(n) if texts[i] is None]
    if pending:
        blobs = col.take(pa.array(pending, pa.int64())).to_pylist()
        for i, blob in zip(pending, blobs):
            texts[i] = extract_text(blob)

    out = pa.array(texts, pa.string())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, out)
