"""Text-analysis stages for web-scale training-data pipelines.

NEW vs the reference (dablooms keys are opaque bytes) — these are the
per-record projections a 100 TB corpus pipeline runs before/alongside
sketch-based dedup: token counting, quality scoring, language ID,
document fingerprinting.  All stages are ``map_batches`` callables;
stateful ones (compiled regexes, language profiles) are actor classes
with setup in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import SALT_CONSTANT, murmur3_x64_128_batch

# ---------------------------------------------------------------------------
# token counting — vectorized Arrow kernels (whitespace) + regex (BPE-ish)
# ---------------------------------------------------------------------------

def token_count_whitespace(batch: pa.Table, text_col: str = "text",
                           out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count (tokens = non-whitespace runs), no Python
    loop: numpy transition scan over the string buffer for pure-ASCII
    batches (parity-tested vs the kernel), Arrow count_substring_regex
    otherwise."""
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    if len(txt) > 0 and bool(pc.all(pc.string_is_ascii(txt)).as_py()):
        data, offs = _flat_bytes(txt)
        lo, hi = offs[0], offs[-1]
        n = len(offs) - 1
        if hi == lo:
            counts = np.zeros(n, dtype=np.int64)
        else:
            # tokens = runs of RE2 \S (the Arrow kernel's class; \v and
            # \x1c-\x1f are NON-space there, unlike Python str-mode \s)
            m = ~_RE2_SPACE[data[lo:hi]]
            prev = np.empty_like(m)
            prev[0] = False
            prev[1:] = m[:-1]
            starts_rel = offs[:-1] - lo
            prev[starts_rel[starts_rel < hi - lo]] = False
            nonempty = np.diff(offs) > 0
            run_start = np.concatenate([m & ~prev, [False]])
            counts = _row_sums(run_start, starts_rel, nonempty)
        lens = pa.array(counts, pa.int64())
    else:
        lens = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, lens)


class RegexTokenCount:
    """BPE-ish token counting with a compiled regex (actor stage —
    pattern compiled once per worker)."""

    PATTERN = r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"

    def __init__(self, text_col: str = "text", out_col: str = "n_tokens_re"):
        self.re = re.compile(self.PATTERN)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = pa.array(
            [len(self.re.findall(t or "")) for t in texts], pa.int64()
        )
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, counts)


# ---------------------------------------------------------------------------
# quality scoring — vectorized length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

_STOPWORDS = (
    "the a an and or of to in is it for on with as at by that this be are "
    "was from but not have has had you he she they we i"
).split()


_ASCII_LETTER = np.zeros(256, dtype=bool)
_ASCII_LETTER[ord("A"):ord("Z") + 1] = True
_ASCII_LETTER[ord("a"):ord("z") + 1] = True
_ASCII_WORDCHAR = _ASCII_LETTER.copy()
_ASCII_WORDCHAR[ord("0"):ord("9") + 1] = True
_ASCII_WORDCHAR[ord("_")] = True
_ASCII_SPACE = np.zeros(256, dtype=bool)
for _c in b" \t\n\r\f\v":
    _ASCII_SPACE[_c] = True
# punct mirrors the Arrow kernel's [^\w\s]: RE2's \s is ONLY
# [ \t\n\f\r] — \v and \x1c-\x1f count as punctuation there (caught by
# a hypothesis parity test; Python's broader str-mode \s applies to
# token counting, not to this class)
_RE2_SPACE = np.zeros(256, dtype=bool)
for _c in b" \t\n\f\r":
    _RE2_SPACE[_c] = True
_ASCII_PUNCT = ~(_ASCII_WORDCHAR | _RE2_SPACE)
_ASCII_PUNCT[128:] = False  # only defined for ascii bytes
# single classification table: 1 = letter, 2 = punct ([^\w\s]), 0 = rest
_ASCII_CODE = np.zeros(256, dtype=np.uint8)
_ASCII_CODE[_ASCII_LETTER] = 1
_ASCII_CODE[_ASCII_PUNCT] = 2


def _flat_bytes(txt: pa.Array):
    """(data bytes, per-row offsets) views of a String/LargeString
    array's buffers — zero-copy; offsets rebased to the array's
    slice."""
    buf_off, buf_data = txt.buffers()[1], txt.buffers()[2]
    odt = np.int64 if pa.types.is_large_string(txt.type) else np.int32
    offs = np.frombuffer(buf_off, dtype=odt, count=len(txt) + 1,
                         offset=txt.offset * np.dtype(odt).itemsize)
    data = np.frombuffer(buf_data, dtype=np.uint8)
    return data, offs.astype(np.int64)


def _row_sums(padded: np.ndarray, starts: np.ndarray,
              nonempty: np.ndarray) -> np.ndarray:
    """Per-row sums of ``padded`` (one trailing pad element so every
    start index is valid) via ``np.add.reduceat``.  reduceat's
    empty-segment quirk (result[i] = x[starts[i]] when
    starts[i] == starts[i+1]) only corrupts EMPTY rows — zeroed via
    the ``nonempty`` mask."""
    out = np.add.reduceat(padded, starts).astype(np.int64)
    out[~nonempty] = 0
    return out


def _ascii_text_stats(data, offs):
    """Per-row (word runs, letter chars, punct chars) for a pure-ASCII
    batch: ONE 256-entry table lookup classifies every byte, a
    transition scan marks word starts, three reduceats sum per row —
    the numpy equivalent of the three RE2 kernels, one pass over the
    bytes."""
    n = len(offs) - 1
    lo, hi = offs[0], offs[-1]
    if hi == lo:
        z = np.zeros(n, dtype=np.int64)
        return z, z.copy(), z.copy()
    code = _ASCII_CODE[data[lo:hi]]
    m_letter = code == 1
    prev = np.empty_like(m_letter)
    prev[0] = False
    prev[1:] = m_letter[:-1]
    starts_rel = offs[:-1] - lo
    # row boundaries break runs (trailing empty rows start at hi-lo)
    prev[starts_rel[starts_rel < hi - lo]] = False
    pad = lambda a: np.concatenate([a, a[:1] & False])  # noqa: E731
    nonempty = np.diff(offs) > 0
    n_words = _row_sums(pad(m_letter & ~prev), starts_rel, nonempty)
    letters = _row_sums(pad(m_letter), starts_rel, nonempty)
    n_punct = _row_sums(pad(code == 2), starts_rel, nonempty)
    return n_words, letters, n_punct


class QualityScore:
    """Length, mean word length, punctuation ratio, stopword ratio, and
    a composite [0,1] quality score (heuristics in the spirit of
    C4/Gopher quality filters, public).

    Vectorized two ways: pure-ASCII batches (the common web-extract
    case) take a numpy byte-table path — one transition scan +
    reduceat for word runs / letter counts / punctuation, ~4x the
    Arrow-RE2 kernels; any non-ASCII row falls the whole batch back to
    the Arrow regex path (identical results on ASCII, parity-tested).
    Stopword counting stays on the RE2 alternation either way (it is
    NOT the hot kernel — measured 12 ms vs 106 ms for words+letters on
    20k docs)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop_re = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        all_ascii = len(txt) > 0 and bool(
            pc.all(pc.string_is_ascii(txt)).as_py())
        if all_ascii:
            data, offs = _flat_bytes(txt)
            n_words, letters, n_punct = _ascii_text_stats(data, offs)
        else:
            n_words = pc.count_substring_regex(txt, r"[A-Za-z]+") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            letters = pc.utf8_length(
                pc.replace_substring_regex(txt, r"[^A-Za-z]+", "")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            n_punct = pc.count_substring_regex(txt, r"[^\w\s]") \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        n_stop = pc.count_substring_regex(txt, self.stop_re) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        safe_words = np.maximum(n_words, 1)
        mean_wlen = np.where(n_words > 0, letters / safe_words, 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / safe_words, 0.0)
        punct_ratio = np.where(n_chars > 0,
                               n_punct / np.maximum(n_chars, 1), 0.0)
        # composite: reward mid-length docs with some stopwords, low punct
        length_ok = np.clip(n_chars / 200.0, 0, 1) * (n_chars < 100_000)
        score = (
            0.4 * length_ok
            + 0.3 * np.clip(stop_ratio / 0.4, 0, 1)
            + 0.3 * (1.0 - np.clip(punct_ratio / 0.3, 0, 1))
        )
        for name, arr, typ in [
            ("q_chars", n_chars, pa.int64()),
            ("q_mean_word_len", mean_wlen, pa.float64()),
            ("q_punct_ratio", punct_ratio, pa.float64()),
            ("q_stop_ratio", stop_ratio, pa.float64()),
            ("q_score", score, pa.float64()),
        ]:
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(arr, typ))
        return batch


# ---------------------------------------------------------------------------
# language ID — character-n-gram profiles (actor stage)
# ---------------------------------------------------------------------------

_LANG_PROFILES = {
    # top character trigrams per language (public frequency knowledge,
    # tiny deterministic profiles — a heuristic, not a model)
    "en": ["the", " th", "he ", "ing", "and", " an", "nd ", " of", "of ", "ed "],
    "es": ["de ", " de", "os ", " la", "la ", "el ", " el", "ión", "ción", "as "],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", " la", "la ", "ion", "que"],
    "de": ["en ", "er ", "ch ", "der", " de", "ein", "ie ", "ich", "sch", "und"],
    "zh": [],  # CJK handled by codepoint-range rule below
}


class LangId:
    """Heuristic language ID: CJK codepoint ratio → zh; else the
    language whose trigram profile overlaps the text most; 'und' when
    nothing matches.  Profiles built once per actor.

    Vectorized: one Arrow ``count_substring`` presence test per
    profile trigram (40 fixed-substring scans, no regex) + one CJK
    codepoint count — no Python loop over rows.  ``_classify`` is the
    kept per-row reference (parity-tested)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {
            lang: frozenset(grams)
            for lang, grams in _LANG_PROFILES.items() if grams
        }

    @staticmethod
    def _cjk_ratio(t: str) -> float:
        if not t:
            return 0.0
        cjk = sum(1 for c in t if 0x4E00 <= ord(c) <= 0x9FFF)
        return cjk / len(t)

    def _classify(self, t: str) -> str:
        t = (t or "").lower()
        if self._cjk_ratio(t) > 0.2:
            return "zh"
        grams = {t[i : i + 3] for i in range(max(0, len(t) - 2))}
        best, best_hits = "und", 0
        for lang, prof in self.profiles.items():
            hits = len(grams & prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits >= 2 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.utf8_lower(pc.fill_null(txt, ""))
        n = len(txt)
        n_cp = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cjk = pc.count_substring_regex(txt, r"[一-鿿]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        is_zh = (n_cp > 0) & (cjk / np.maximum(n_cp, 1) > 0.2)
        langs = list(self.profiles)
        hits = np.zeros((n, len(langs)), dtype=np.int64)
        for li, lang in enumerate(langs):
            for g in self.profiles[lang]:
                present = pc.greater(pc.count_substring(txt, g), 0) \
                    .to_numpy(zero_copy_only=False)
                hits[:, li] += present
        # ties: earlier profile wins (argmax returns the first maximum,
        # matching _classify's strictly-greater update order)
        best = np.argmax(hits, axis=1)
        best_hits = hits[np.arange(n), best] if n else np.zeros(0, int)
        lang_arr = np.array(langs, dtype=object)
        preds = np.where(is_zh, "zh",
                         np.where(best_hits >= 2, lang_arr[best], "und"))
        preds = pa.array(preds.tolist(), pa.string())
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, preds)


# ---------------------------------------------------------------------------
# url normalization — pure Arrow regex kernels (SURVEY.md §2.6 projections)
# ---------------------------------------------------------------------------

def normalize_url(batch: pa.Table, url_col: str = "url",
                  out_col: str = "url_norm") -> pa.Table:
    """Deterministic url canonicalization, fully vectorized:
    lowercase scheme+host, strip fragment, drop default ports, drop a
    single trailing slash on the path."""
    u = batch.column(url_col)
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    u = pc.fill_null(u, "")
    u = pc.replace_substring_regex(u, r"#.*$", "")  # fragment
    # lowercase scheme://host prefix only (not the path)
    # split into prefix + rest, lowercase prefix, re-join
    prefix = pc.extract_regex(u, r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/]*)")
    pref = pc.struct_field(prefix, "p")
    rest = pc.replace_substring_regex(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    pref = pc.utf8_lower(pc.fill_null(pref, ""))
    pref = pc.replace_substring_regex(pref, r":80$|:443$", "")
    joined = pc.binary_join_element_wise(pref, rest, "")
    # RE2 has no lookbehind: keep the non-slash char via a backreference
    joined = pc.replace_substring_regex(joined, r"([^/])/$", r"\1")
    out = pc.if_else(pc.equal(pref, ""), u, joined)
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, out)


# ---------------------------------------------------------------------------
# document fingerprinting — content hash + rolling-hash shingle sketch
# ---------------------------------------------------------------------------

def fingerprint(batch: pa.Table, text_col: str = "text",
                out_col: str = "fp") -> pa.Table:
    """128-bit content fingerprint (murmur of the exact bytes) as a
    hex string — the exact-dedup key at scale (collision odds
    ~n^2/2^128).  Hex encoding is loop-free: one hexlify of the
    big-endian hash bytes, then a StringArray built directly from the
    fixed-stride offsets (measured ~17x the per-row f-string)."""
    import binascii

    h1, h2 = murmur3_x64_128_batch(batch.column(text_col), seed=SALT_CONSTANT)
    n = len(h1)
    packed = np.empty((n, 2), dtype=">u8")
    packed[:, 0] = h1
    packed[:, 1] = h2
    hexdata = binascii.hexlify(packed.tobytes())
    offsets = pa.array(np.arange(0, 32 * (n + 1), 32, dtype=np.int32))
    fps = pa.StringArray.from_buffers(
        n, offsets.buffers()[1], pa.py_buffer(hexdata))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, fps)


_M61 = np.uint64((1 << 61) - 1)


def _fold61(x: np.ndarray) -> np.ndarray:
    """x (< 2^64) → x mod 2^61-1 (two folds + conditional subtract)."""
    x = (x & _M61) + (x >> np.uint64(61))
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


class RollingFingerprint:
    """map_batches stage: per-doc minimum Karp–Rabin w-gram hash (the
    1-perm min-shingle document fingerprint) — value-identical to
    :func:`rolling_shingle_min`, vectorized.

    Instead of the inherently sequential rolling recurrence, every
    window hash is evaluated directly as the polynomial
    sum_j d[i+j] * base^(w-1-j) mod 2^61-1 using w precomputed
    256-entry tables (one lookup + modular add per tap, all positions
    at once over the flat utf-8 buffer), then a per-row min via
    ``np.minimum.reduceat``.  Rows shorter than w fall back to the
    scalar reference (hash of the whole row).  ~15x the per-byte
    Python loop; parity-tested."""

    def __init__(self, text_col: str = "text", out_col: str = "shingle_min",
                 w: int = 16, base: int = 257):
        self.text_col = text_col
        self.out_col = out_col
        self.w = w
        self.base = base
        if w % 2:
            raise ValueError("w must be even (byte-pair table taps)")
        mod = (1 << 61) - 1
        # byte-PAIR taps: 65536-entry table per pair halves the gather
        # count (the hot cost).  Built with Python ints: v * base^k
        # exceeds 2^64, so a numpy uint64 product would wrap BEFORE
        # the mod.
        t1 = np.array(
            [[(v * pow(base, w - 1 - k, mod)) % mod for v in range(256)]
             for k in range(w)], dtype=np.uint64)  # per-byte taps < 2^61
        v = np.arange(65536, dtype=np.uint64)
        hi, lo = v >> np.uint64(8), v & np.uint64(255)
        self.tables = np.stack([
            _fold61(t1[2 * j][hi] + t1[2 * j + 1][lo])
            for j in range(w // 2)
        ])  # (w/2, 65536), < 2^61

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        n = len(txt)
        out = np.zeros(n, dtype=np.uint64)
        if n:
            data, offs = _flat_bytes(txt)
            lo, hi = offs[0], offs[-1]
            d = data[lo:hi]
            lens = offs[1:] - offs[:-1]
            w = self.w
            long_rows = lens >= w
            if long_rows.any() and len(d) >= w:
                npos = len(d) - w + 1
                # 16-bit byte pairs: d16[i] = d[i]<<8 | d[i+1]
                d16 = (d[:-1].astype(np.uint16) << 8) | d[1:]
                acc = np.zeros(npos, dtype=np.uint64)
                for j in range(self.w // 2):
                    acc += self.tables[j][d16[2 * j:2 * j + npos]]
                    if j % 6 == 5:  # fold before the uint64 sum overflows
                        acc = _fold61(acc)
                acc = _fold61(acc)
                # per-row min over windows fully inside the row:
                # reduceat over interleaved [start, end) pairs (even
                # segments are the rows; odd gap segments discarded).
                # `end` is clipped to npos-1 to stay a valid reduceat
                # index, so the final window is re-minned explicitly.
                n_long = int(long_rows.sum())
                starts = (offs[:-1] - lo)[long_rows]
                ends = starts + lens[long_rows] - w + 1
                inter = np.empty(2 * n_long, dtype=np.int64)
                inter[0::2] = starts
                inter[1::2] = np.minimum(ends, npos - 1)
                red = np.minimum.reduceat(acc, np.minimum(inter, npos - 1))
                mins = red[0::2]
                last = np.maximum(ends - 1, starts)
                mins = np.minimum(mins, acc[np.minimum(last, npos - 1)])
                out[long_rows] = mins
            # short rows: scalar reference (hash of the whole row)
            short_idx = np.flatnonzero(~long_rows)
            if len(short_idx):
                vals = txt.take(pa.array(short_idx)).to_pylist()
                for i, v in zip(short_idx, vals):
                    out[i] = rolling_shingle_min(v or "", self.w, self.base)
        res = pa.array(out.view(np.int64), pa.int64())
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        return batch.append_column(self.out_col, res)


def rolling_shingle_min(text: str, w: int = 16,
                        base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Karp–Rabin rolling hash over byte w-grams; returns the minimum
    shingle hash (a 1-perm minhash — document similarity fingerprint)."""
    data = text.encode("utf-8")
    if len(data) < w:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    # initial window
    h = 0
    for b in data[:w]:
        h = (h * base + b) % mod
    pw = pow(base, w - 1, mod)
    best = h
    for i in range(w, len(data)):
        h = ((h - data[i - w] * pw) * base + data[i]) % mod
        if h < best:
            best = h
    return best
