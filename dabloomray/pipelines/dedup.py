"""Near-duplicate detection for web-scale corpora.

NEW vs the reference (dablooms does exact-key membership only): the
standard training-data dedup stack, Ray-Data-first —

- **MinHash + LSH**: shingle → minhash signature → banded LSH buckets →
  ``groupby(band, hash)`` candidate pairs → exact Jaccard verify.
- **SimHash**: 64-bit signature; pigeonhole banding on 16-bit chunks →
  hamming-distance verify.
- **n-gram Jaccard**: the exact verifier (shared).
- **Embedding cosine**: blocked brute-force all-pairs (exact) against a
  broadcast matrix; the scale path buckets by random-hyperplane LSH.

Scale notes (10^12 docs): candidate generation is a shuffle keyed on
(band_id, band_hash) — only (doc_id, key) pairs move, never text.  The
verify stage here broadcasts the text column via ``ray.put`` (fine to
~10^6 docs); beyond that, repartition candidate pairs by hash(doc_id)
bucket and join text within buckets (SURVEY.md §2.6 join pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures import splitmix64
from ..hashing import murmur3_x64_128_batch

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# shingling + minhash signatures (vectorized)
# ---------------------------------------------------------------------------

def word_ngrams(text: str, n: int = 3) -> list[str]:
    words = (text or "").split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(num_perm, dtype=np.uint64)
    a = splitmix64(101, idx) | np.uint64(1)  # odd ⇒ bijection on Z/2^64
    b = splitmix64(202, idx)
    return a, b


def minhash_signatures(texts: list[str], num_perm: int = 128,
                       ngram: int = 3) -> np.ndarray:
    """(n_docs, num_perm) uint64 signatures.  One murmur pass over the
    flattened shingle list, then ``num_perm`` multiply-xor permutations
    h_i = (h ^ b_i) * a_i over Z/2^64 (a_i odd ⇒ bijective), minimum
    per doc segment via ``np.minimum.reduceat``."""
    grams, counts = [], []
    for t in texts:
        g = word_ngrams(t, ngram)
        grams.extend(g)
        counts.append(len(g))
    n = len(texts)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not grams:
        return sig
    h, _ = murmur3_x64_128_batch(grams, seed=7)
    a, b = _perm_params(num_perm)
    with np.errstate(over="ignore"):
        vals = (h[:, None] ^ b[None, :]) * a[None, :]  # (n_grams, num_perm)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    starts = np.minimum(starts, len(grams) - 1)  # guard trailing empty docs
    nonempty = np.asarray(counts) > 0
    mins = np.minimum.reduceat(vals, starts, axis=0)
    # reduceat rows for empty segments duplicate another segment; mask them
    sig[nonempty] = mins[nonempty]
    return sig


# ---------------------------------------------------------------------------
# LSH banding stage
# ---------------------------------------------------------------------------

class MinHashBands:
    """map_batches stage: docs → (doc_id, band_id, band_hash) rows.
    bands*rows_per_band == num_perm; J >= threshold pairs share a band
    with prob ~1-(1-J^r)^b."""

    def __init__(self, id_col: str, text_col: str, num_perm: int = 128,
                 bands: int = 32, ngram: int = 3):
        assert num_perm % bands == 0
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.bands = bands
        self.r = num_perm // bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        sig = minhash_signatures(texts, self.num_perm, self.ngram)
        n = len(ids)
        band_rows = sig.reshape(n, self.bands, self.r)
        # hash each band's r values into one 64-bit key
        bh = band_rows[:, :, 0].copy()
        for j in range(1, self.r):
            with np.errstate(over="ignore"):
                bh = bh * np.uint64(0x100000001B3) ^ band_rows[:, :, j]
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64), pa.int64()),
        })


def candidate_pairs_from_bands(bands_ds):
    """groupby(band_id, band_hash) → unique candidate (a<b) pairs."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column("doc_id").to_numpy())
        if len(ids) < 2:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"left_id": pa.array(ids[a], pa.int64()),
                         "right_id": pa.array(ids[b], pa.int64())})

    cand = bands_ds.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pyarrow")

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # coalesce then drop duplicate pairs produced by multiple bands
    return cand.repartition(1).map_batches(dedup_pairs, batch_format="pyarrow",
                                           batch_size=None)


# ---------------------------------------------------------------------------
# verifiers
# ---------------------------------------------------------------------------

def jaccard(a: str, b: str, ngram: int = 3) -> float:
    sa, sb = set(word_ngrams(a, ngram)), set(word_ngrams(b, ngram))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class JaccardVerify:
    """Actor stage: exact n-gram Jaccard for candidate pairs; text
    lookup from a broadcast {doc_id: text} dict (see module docstring
    for the beyond-broadcast scale path)."""

    def __init__(self, texts_ref, threshold: float, ngram: int = 3):
        import ray

        self.texts = ray.get(texts_ref)
        self.threshold = threshold
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = batch.column("left_id").to_pylist()
        right = batch.column("right_id").to_pylist()
        sims = np.array([
            jaccard(self.texts.get(l, ""), self.texts.get(r, ""), self.ngram)
            for l, r in zip(left, right)
        ])
        keep = sims >= self.threshold
        out = batch.filter(pa.array(keep))
        return out.append_column("jaccard",
                                 pa.array(np.round(sims[keep], 6), pa.float64()))


def minhash_lsh_dedup(ds, id_col: str, text_col: str, threshold: float = 0.8,
                      num_perm: int = 128, bands: int = 32, ngram: int = 3):
    """Full MinHash-LSH near-dup pipeline → verified pairs
    (left_id, right_id, jaccard), jaccard >= threshold."""
    import ray

    bands_ds = ds.map_batches(
        MinHashBands(id_col, text_col, num_perm, bands, ngram),
        batch_format="pyarrow")
    cand = candidate_pairs_from_bands(bands_ds)
    texts = {}
    for b in ds.select_columns([id_col, text_col]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        texts.update(zip(b.column(id_col).to_pylist(),
                         b.column(text_col).to_pylist()))
    ref = ray.put(texts)
    return cand.map_batches(
        JaccardVerify,
        fn_constructor_kwargs={"texts_ref": ref, "threshold": threshold,
                               "ngram": ngram},
        batch_format="pyarrow", concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# near-dup groups (connected components) + keep-first
# ---------------------------------------------------------------------------

def pairs_to_groups(pairs: pa.Table) -> dict[int, int]:
    """Union-find over verified near-dup pairs → {doc_id: group_root}.

    Driver-side: the verified pair set is orders of magnitude smaller
    than the corpus (only near-dups).  If it ever isn't, switch to
    min-label propagation: iterate ``groupby(doc).aggregate(min(label))``
    rounds until fixpoint (ray_guide near-dup recipe)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for left, right in zip(pairs.column("left_id").to_pylist(),
                           pairs.column("right_id").to_pylist()):
        ra, rb = find(int(left)), find(int(right))
        if ra != rb:
            if rb < ra:  # deterministic: smallest id becomes the root
                ra, rb = rb, ra
            parent[rb] = ra
    return {doc: find(doc) for doc in list(parent)}


def near_dedup_keep_first(ds, id_col: str, text_col: str,
                          threshold: float = 0.8, **lsh_kwargs):
    """Full near-dedup: MinHash-LSH pairs → groups → drop every group
    member except the smallest doc_id.  Returns the surviving Dataset."""
    import ray

    pairs = pa.concat_tables(list(
        minhash_lsh_dedup(ds, id_col, text_col, threshold=threshold,
                          **lsh_kwargs)
        .iter_batches(batch_size=None, batch_format="pyarrow")))
    groups = pairs_to_groups(pairs)
    drop = np.sort(np.array(
        [doc for doc, root in groups.items() if doc != root],
        dtype=np.int64))
    ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy()
        if len(d) == 0:
            return batch
        pos = np.minimum(np.searchsorted(d, ids), len(d) - 1)
        return batch.filter(pa.array(d[pos] != ids))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: list[str], ngram: int = 2) -> np.ndarray:
    """64-bit simhash per doc (Charikar 2002): sign-sum of feature
    hash bits, features = word n-grams."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        feats = word_ngrams(t, ngram)
        if not feats:
            continue
        h, _ = murmur3_x64_128_batch(feats, seed=11)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        with np.errstate(over="ignore"):
            out[i] = np.sum(
                (votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)
            )
    return out


class SimHashStage:
    def __init__(self, id_col: str, text_col: str, ngram: int = 2):
        self.id_col = id_col
        self.text_col = text_col
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash64(batch.column(self.text_col).to_pylist(), self.ngram)
        t = pa.table({
            "doc_id": batch.column(self.id_col).cast(pa.int64()),
            "simhash": pa.array(sh.view(np.int64), pa.int64()),
        })
        return t


def simhash_dedup(ds, id_col: str, text_col: str, max_hamming: int = 3,
                  ngram: int = 2):
    """SimHash near-dup: pigeonhole banding on 4x16-bit chunks (any
    pair with hamming <= 3 must agree on >= 1 chunk) → hamming verify.
    Returns (left_id, right_id, hamming) pairs."""

    sh_ds = ds.map_batches(SimHashStage(id_col, text_col, ngram),
                           batch_format="pyarrow")

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sh = batch.column("simhash").to_numpy().view(np.uint64)
        n = len(ids)
        chunk_ids = np.tile(np.arange(4, dtype=np.int32), n)
        chunks = np.stack([(sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
                           for c in range(4)], axis=1)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "simhash": pa.array(np.repeat(sh.view(np.int64), 4), pa.int64()),
            "band_id": pa.array(chunk_ids),
            "band_hash": pa.array(chunks.reshape(-1).astype(np.int64)),
        })

    bands = sh_ds.map_batches(explode_chunks, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().drop_duplicates("doc_id").sort_values("doc_id")
        ids = df["doc_id"].to_numpy()
        sh = df["simhash"].to_numpy().view(np.uint64)
        if len(ids) < 2:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(ids), k=1)
        x = sh[a] ^ sh[b]
        ham = np.zeros(len(x), dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        return pa.table({"left_id": pa.array(ids[a], pa.int64()),
                         "right_id": pa.array(ids[b], pa.int64()),
                         "hamming": pa.array(ham, pa.int64())})

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pyarrow")

    def finalize(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        df = df[df["hamming"] <= max_hamming].drop_duplicates(
            ["left_id", "right_id"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return cand.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                           batch_size=None)
