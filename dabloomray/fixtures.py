"""Deterministic synthetic fixtures (FIXTURES.md). seed=42, every column a
pure function of row index — identical bytes at any parallelism.

F1 ``urls``  — Common-Crawl-style corpus (url, warc_ts, html, text, lang)
F2 ``words`` — words-list replica of the reference test harness corpus
               (src/test_dablooms.c ≈L15–300 used /usr/share/dict/words)
F3 ``ops``   — sequenced add/remove stream for scaling-bloom routing
"""

from __future__ import annotations

import string

import numpy as np
import pyarrow as pa

SEED = 42
_HOSTS = 997

_VOCAB = [
    "the", "a", "of", "and", "to", "in", "is", "it", "data", "web", "page",
    "crawl", "index", "link", "query", "table", "row", "batch", "stream",
    "merge", "sort", "hash", "key", "value", "filter", "bloom", "sketch",
    "count", "distinct", "scale", "node", "actor", "block", "shard", "text",
    "word", "title", "body", "host", "site", "path", "time", "stamp", "byte",
    "code", "lang", "test", "fast", "slow", "small", "large", "first", "last",
    "next", "prev", "open", "close", "read", "write", "spill", "spark", "ray",
    "arrow", "quick",
]
assert len(_VOCAB) == 64
_LANGS = ["en", "es", "zh", "de", "fr"]
_B36 = string.digits + string.ascii_lowercase


def splitmix64(seed: int, i) -> np.ndarray:
    """Pure-function PRNG: splitmix64(seed ^ golden*i). Vectorized."""
    i = np.asarray(i, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = np.uint64(seed) + (i + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _base36(v: int) -> str:
    if v == 0:
        return "0"
    out = []
    while v:
        v, r = divmod(v, 36)
        out.append(_B36[r])
    return "".join(reversed(out))


def _body_words(i: int) -> list[str]:
    """5–40 words from the 64-word vocab, driven by splitmix64(42, i)."""
    r0 = int(splitmix64(SEED, np.uint64(i)))
    n = 5 + (r0 % 36)
    # successive words from a cheap stream keyed off (i, j)
    js = np.arange(n, dtype=np.uint64) + (np.uint64(i) << np.uint64(20))
    rs = splitmix64(SEED + 1, js)
    return [_VOCAB[int(r) & 63] for r in rs]


def make_urls_table(n: int) -> pa.Table:
    """F1 corpus. Duplicates: rows with i%10==7 repeat the url of row i-7
    (same html/text bytes, later warc_ts)."""
    from .extract import extract_text

    idx = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        host = (idx * np.uint64(2654435761)) % np.uint64(_HOSTS)
    host = host.astype(np.int64)
    host[np.arange(n) % 97 == 0] = 0  # hot host for skew tests

    src = np.arange(n)
    dup_mask = (src % 10 == 7) & (src >= 7)
    src = np.where(dup_mask, src - 7, src)

    urls, htmls, texts = [], [], []
    for i in range(n):
        j = int(src[i])
        h = int(host[j])
        urls.append(f"https://site{h:04d}.example/p/{j:08d}")
        html = (
            f"<html><head><title>d{j}</title></head>"
            f"<body><p>{' '.join(_body_words(j))}</p></body></html>"
        ).encode()
        htmls.append(html)
        texts.append(extract_text(html))

    ts = (np.int64(1_767_225_600_000_000) + np.arange(n, dtype=np.int64) * 1_000_000)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([_LANGS[i % 5] for i in range(n)], pa.string()),
        }
    )


def make_words(n: int = 120_000) -> pa.Table:
    """F2 words-list replica: all-distinct keys, seq_id = row index."""
    rs = splitmix64(SEED, np.arange(n, dtype=np.uint64))
    words = [f"w{i:07d}-{_base36(int(r))}" for i, r in enumerate(rs)]
    return pa.table(
        {
            "word": pa.array(words, pa.string()),
            "seq_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


def write_urls_parquet(path: str, n: int, row_group_size: int = 64 * 1024) -> str:
    """Materialize F1 to one parquet file (bench input). Deterministic."""
    import pyarrow.parquet as pq

    pq.write_table(make_urls_table(n), path, row_group_size=row_group_size)
    return path
