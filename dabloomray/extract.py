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


def _match_positions(data: np.ndarray, pat: bytes,
                     cand: np.ndarray | None = None) -> np.ndarray:
    """Start positions of ASCII-case-insensitive matches of ``pat``
    (lowercase, first byte a symbol) — checks only at ``cand``
    positions (pre-computed first-byte hits, shared across patterns)
    instead of scanning every byte per pattern."""
    if cand is None:
        cand = np.flatnonzero(data == pat[0]).astype(np.int64)
    cand = cand[cand + len(pat) <= len(data)]
    if len(cand) == 0:
        return cand
    m = np.ones(len(cand), dtype=bool)
    for k in range(1, len(pat)):
        c = pat[k]
        d = data[cand + k]
        if ord("a") <= c <= ord("z"):
            m &= (d == c) | (d == c - 32)
        else:
            m &= d == c
    return cand[m]


def _first_in_row(pos: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                  patlen: int) -> np.ndarray:
    """First position in ``pos`` with lo <= p and p + patlen <= hi,
    per row; -1 when none.  ``pos`` must not contain cross-row matches
    that still satisfy the bound (it can't: p+patlen <= hi pins the
    whole match inside the row)."""
    out = np.full(len(lo), -1, dtype=np.int64)
    if len(pos) == 0:
        return out
    idx = np.searchsorted(pos, lo)
    ok = idx < len(pos)
    cand = np.where(ok, pos[np.minimum(idx, max(len(pos) - 1, 0))], -1)
    good = ok & (cand + patlen <= hi)
    out[good] = cand[good]
    return out


def _gather_ranges(data: np.ndarray, starts: np.ndarray,
                   lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate data[starts[i]:starts[i]+lengths[i]] per row →
    (flat bytes, new offsets).  Pure index math, no per-row loop."""
    offs = np.concatenate([[0], np.cumsum(lengths)])
    total = int(offs[-1])
    if total == 0:
        return np.zeros(0, dtype=np.uint8), offs
    rel = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lengths)
    src = np.repeat(starts, lengths) + rel
    return data[src], offs


_WS_TABLE = np.zeros(256, dtype=bool)
for _c in b" \t\n\r\f\v\x1c\x1d\x1e\x1f":  # Python str-mode \s on ASCII
    _WS_TABLE[_c] = True


def _collapse_trim(data: np.ndarray, offs: np.ndarray):
    """Per-row collapse of \\s+ runs to single spaces plus strip — the
    numpy equivalent of ``_WS.sub(" ", s).strip()`` for ASCII rows.
    Returns (kept bytes, per-row start, per-row end) WITHOUT gathering
    — rows in ``kept`` are ordered but may leave 1-byte gaps where a
    boundary space was trimmed; the caller gathers once at assembly."""
    n = len(offs) - 1
    z = np.zeros(n, dtype=np.int64)
    if len(data) == 0:
        return data, z, z.copy()
    ws = _WS_TABLE[data]
    if ws.all():  # nothing but whitespace anywhere: every row strips empty
        return np.zeros(0, dtype=np.uint8), z, z.copy()
    prev = np.empty_like(ws)
    prev[0] = False
    prev[1:] = ws[:-1]
    starts = offs[:-1]
    prev[starts[starts < len(data)]] = False  # runs break at row bounds
    keep = ~ws | (ws & ~prev)  # first ws of each run survives as ' '
    mapped = np.where(ws, np.uint8(ord(" ")), data)
    # kept-count prefix sums → kept offsets per row
    csum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    k_lo = csum[offs[:-1]]
    k_hi = csum[offs[1:]]
    kept = mapped[keep]
    # strip: a leading run collapsed to one ' ' ⇒ at most one leading
    # and one trailing space to drop per row
    lead = (k_hi > k_lo) & (kept[np.minimum(k_lo, len(kept) - 1)]
                            == ord(" "))
    k_lo = k_lo + lead
    trail = (k_hi > k_lo) & (kept[np.maximum(k_hi - 1, 0)] == ord(" "))
    k_hi = k_hi - trail
    return kept, k_lo, np.maximum(k_hi, k_lo)


def _string_array(data: np.ndarray, offs: np.ndarray) -> pa.Array:
    return pa.StringArray.from_buffers(
        len(offs) - 1,
        pa.py_buffer(offs.astype(np.int32).tobytes()),
        pa.py_buffer(data.tobytes()))


def extract_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "text") -> pa.Table:
    """map_batches stage: html binary column → text column.

    Two paths, byte-identical by construction:
    - **fast path** (pure-ASCII rows with a <title> or <body> match):
      byte-level numpy finders — tag open = first case-folded literal
      occurrence, attr end = first following '>', close = first close
      tag after that (exactly RE2's ``<tag[^>]*>(.*?)</tag>`` leftmost
      semantics, since ``[^>]*`` cannot cross a '>'), then a vectorized
      whitespace collapse + strip; only the body tag-strip stays an
      RE2 kernel (sequential-match semantics).  ~3x the former
      extract_regex path, which spent its time in the lazy submatch
      scan.  ASCII-only is required because Python's ``\\s`` (str
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
    except pa.ArrowInvalid:
        as_str = None

    if as_str is not None and n:
        ascii_ok = pc.fill_null(pc.string_is_ascii(as_str), False) \
            .to_numpy(zero_copy_only=False)
        valid = pc.is_valid(as_str).to_numpy(zero_copy_only=False)
        ascii_ok &= valid
        arr = as_str.combine_chunks() if isinstance(as_str, pa.ChunkedArray) \
            else as_str
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=odt, count=n + 1,
                             offset=arr.offset * np.dtype(odt).itemsize) \
            .astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        lo, hi = offs[:-1], offs[1:]
        gt_pos = np.flatnonzero(data == ord(">")).astype(np.int64)
        lt_pos = np.flatnonzero(data == ord("<")).astype(np.int64)

        def tag_content(open_pat: bytes, close_pat: bytes):
            """Per-row (start, length, matched) of the tag's content."""
            open_p = _first_in_row(
                _match_positions(data, open_pat, cand=lt_pos),
                lo, hi, len(open_pat))
            # attr end: first '>' at/after the open tag's end
            attr = _first_in_row(gt_pos, open_p + len(open_pat), hi, 1)
            close = _first_in_row(
                _match_positions(data, close_pat, cand=lt_pos),
                attr + 1, hi, len(close_pat))
            ok = (open_p >= 0) & (attr >= 0) & (close >= 0)
            start = np.where(ok, attr + 1, 0)
            length = np.where(ok, close - attr - 1, 0)
            return start, length, ok

        t_start, t_len, has_title = tag_content(b"<title", b"</title>")
        b_start, b_len, has_body = tag_content(b"<body", b"</body>")
        fast = ascii_ok & (has_title | has_body)
        if fast.any():
            zero_t = np.where(fast & has_title, t_len, 0)
            zero_b = np.where(fast & has_body, b_len, 0)
            td, to = _gather_ranges(data, t_start, zero_t)
            bd, bo = _gather_ranges(data, b_start, zero_b)
            # tag-strip body content (RE2 — sequential match semantics)
            stripped = pc.replace_substring_regex(
                _string_array(bd, bo), r"<[^>]+>", " ")
            bd = np.frombuffer(stripped.buffers()[2] or b"", dtype=np.uint8)
            bo = np.frombuffer(stripped.buffers()[1], dtype=np.int32,
                               count=n + 1).astype(np.int64)
            td, t_lo, t_hi = _collapse_trim(td, to)
            bd, b_lo, b_hi = _collapse_trim(bd, bo)
            # assemble per row: title [+ "\n"] + body over non-empty parts
            tl = t_hi - t_lo
            bl = b_hi - b_lo
            both = (tl > 0) & (bl > 0)
            out_len = tl + bl + both
            out_offs = np.concatenate([[0], np.cumsum(out_len)])
            buf = np.empty(int(out_offs[-1]), dtype=np.uint8)
            # copy titles
            rel = np.arange(int(tl.sum()), dtype=np.int64) - \
                np.repeat(np.cumsum(tl) - tl, tl)
            buf[np.repeat(out_offs[:-1], tl) + rel] = \
                td[np.repeat(t_lo, tl) + rel]
            # newline separators
            buf[(out_offs[:-1] + tl)[both]] = ord("\n")
            # copy bodies
            relb = np.arange(int(bl.sum()), dtype=np.int64) - \
                np.repeat(np.cumsum(bl) - bl, bl)
            bdst = out_offs[:-1] + tl + both
            buf[np.repeat(bdst, bl) + relb] = bd[np.repeat(b_lo, bl) + relb]
            # ASCII ⇒ NFC is identity; one C-level decode of all rows
            fast_vals = _string_array(buf, out_offs).to_pylist()
            for i in np.flatnonzero(fast):
                texts[i] = fast_vals[i]

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
