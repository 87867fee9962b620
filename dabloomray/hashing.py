"""MurmurHash3 x64_128 kernel — scalar (parity) and NumPy-vectorized batch.

From-scratch reimplementation of Austin Appleby's public-domain
MurmurHash3_x64_128 (the variant dablooms uses: reference
``src/murmur.c`` ≈L150–255, called from ``hash_func`` in
``src/dablooms.c`` ≈L160 with seed ``SALT_CONSTANT``).  All sketches in
this library (Bloom, HLL, CMS, MinHash, SimHash) share this kernel via
Kirsch–Mitzenmacher double hashing, per the north_rule.

The vectorized path operates on a whole Arrow/NumPy string column at
once: strings are packed into a padded ``(n, L)`` uint8 matrix, the
16-byte block loop runs across all rows with an "active" mask per block
index, and the tail bytes are gathered into a zero-padded ``(n, 16)``
matrix.  Zero-padding the tail is *exactly* equivalent to the C switch
fallthrough: absent bytes contribute 0 to k1/k2, and mixing a zero k
into h is the identity (0*c=0, rotl(0)=0, h^0=h).
"""

from __future__ import annotations

import numpy as np

# dablooms seed: SALT_CONSTANT, src/dablooms.c ≈L25
SALT_CONSTANT = 0x97C29B3A

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_F1 = 0xFF51AFD7ED558CCD
_F2 = 0xC4CEB9FE1A85EC53
_M64 = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# scalar reference implementation (pure Python) — used for parity tests
# ---------------------------------------------------------------------------

def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * _F1) & _M64
    k ^= k >> 33
    k = (k * _F2) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar MurmurHash3_x64_128. Returns (h1, h2) as uint64 ints."""
    length = len(data)
    nblocks = length // 16
    h1 = seed & _M64
    h2 = seed & _M64

    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = data[nblocks * 16 :]
    k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
    k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")
    # zero k mixes are identity ops, so unconditional apply == C switch
    k2 = (k2 * _C2) & _M64
    k2 = _rotl64(k2, 33)
    k2 = (k2 * _C1) & _M64
    h2 ^= k2
    k1 = (k1 * _C1) & _M64
    k1 = _rotl64(k1, 31)
    k1 = (k1 * _C2) & _M64
    h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


# ---------------------------------------------------------------------------
# vectorized batch implementation
# ---------------------------------------------------------------------------

def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _vfmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(_F1)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(_F2)
    k = k ^ (k >> np.uint64(33))
    return k


def pack_strings(values) -> tuple[np.ndarray, np.ndarray]:
    """Pack a sequence of str/bytes into (padded uint8 matrix, lengths).

    The matrix width is the max length rounded up to a multiple of 16
    (minimum 16) so whole 16-byte blocks can be viewed as uint64 pairs.
    Accepts a pyarrow Array/ChunkedArray, numpy object array, or list.
    """
    try:  # pyarrow string arrays: use the flat buffers (no per-row Python)
        import pyarrow as pa

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            arr = values
            if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
                arr = arr.cast(pa.string()).cast(pa.binary())
            elif pa.types.is_string(arr.type):
                arr = arr.cast(pa.binary())
            if arr.null_count:
                arr = arr.fill_null(b"")
            buffers = arr.buffers()
            offsets = np.frombuffer(buffers[1], dtype=np.int32, count=len(arr) + 1,
                                    offset=arr.offset * 4)
            data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None \
                else np.zeros(0, dtype=np.uint8)
            lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
            n = len(arr)
            width = max(16, int(-(-int(lengths.max(initial=0)) // 16)) * 16)
            out = np.zeros((n, width), dtype=np.uint8)
            # scatter all bytes at once: destination column index per byte
            if data.size and lengths.sum() > 0:
                total = int(lengths.sum())
                row_idx = np.repeat(np.arange(n), lengths)
                col_idx = np.arange(total) - np.repeat(
                    np.cumsum(lengths) - lengths, lengths
                )
                src_idx = np.repeat(offsets[:-1].astype(np.int64), lengths) + col_idx
                out[row_idx, col_idx] = data[src_idx]
            return out, lengths
    except ImportError:  # pragma: no cover
        pass

    encoded = [v.encode("utf-8") if isinstance(v, str) else (v or b"") for v in values]
    lengths = np.array([len(e) for e in encoded], dtype=np.int64)
    n = len(encoded)
    width = max(16, int(-(-int(lengths.max(initial=0)) // 16)) * 16)
    out = np.zeros((n, width), dtype=np.uint8)
    for i, e in enumerate(encoded):
        out[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    return out, lengths


def murmur3_x64_128_batch(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized MurmurHash3_x64_128 over a column of strings/bytes.

    Returns (h1, h2) uint64 arrays, identical per-row to
    :func:`murmur3_x64_128`.
    """
    padded, lengths = pack_strings(values)
    return murmur3_x64_128_padded(padded, lengths, seed)


def murmur3_x64_128_padded(padded: np.ndarray, lengths: np.ndarray,
                           seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Murmur core over an already-packed ``(n, width)`` uint8 matrix
    (width a multiple of 16, rows zero-padded past ``lengths``) — the
    entry point for callers that assemble the matrix themselves (e.g.
    the shingle kernel gathers gram windows straight into it, skipping
    the string-array round-trip through :func:`pack_strings`)."""
    n = len(lengths)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.uint64)

    h1 = np.full(n, seed & _M64, dtype=np.uint64)
    h2 = np.full(n, seed & _M64, dtype=np.uint64)
    nblocks = (lengths // 16).astype(np.int64)
    words = padded.view("<u8")  # (n, width/8)
    max_blocks = int(nblocks.max(initial=0))

    c1 = np.uint64(_C1)
    c2 = np.uint64(_C2)
    with np.errstate(over="ignore"):
        for b in range(max_blocks):
            active = nblocks > b
            k1 = words[:, 2 * b].copy()
            k2 = words[:, 2 * b + 1].copy()
            k1 = _vrotl(k1 * c1, 31) * c2
            nh1 = h1 ^ k1
            nh1 = _vrotl(nh1, 27) + h2
            nh1 = nh1 * np.uint64(5) + np.uint64(0x52DCE729)
            k2 = _vrotl(k2 * c2, 33) * c1
            nh2 = h2 ^ k2
            nh2 = _vrotl(nh2, 31) + nh1
            nh2 = nh2 * np.uint64(5) + np.uint64(0x38495AB5)
            h1 = np.where(active, nh1, h1)
            h2 = np.where(active, nh2, h2)

        # gather tail bytes into a zero-padded (n, 16) matrix
        tail_len = lengths - nblocks * 16
        tails = np.zeros((n, 16), dtype=np.uint8)
        offset = nblocks * 16
        rows = np.arange(n)
        for t in range(16):
            mask = tail_len > t
            if not mask.any():
                break
            tails[mask, t] = padded[rows[mask], offset[mask] + t]
        k1 = tails[:, :8].copy().view("<u8").ravel()
        k2 = tails[:, 8:16].copy().view("<u8").ravel()
        k2 = _vrotl(k2 * c2, 33) * c1
        h2 = h2 ^ k2
        k1 = _vrotl(k1 * c1, 31) * c2
        h1 = h1 ^ k1

        ulen = lengths.astype(np.uint64)
        h1 = h1 ^ ulen
        h2 = h2 ^ ulen
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _vfmix64(h1)
        h2 = _vfmix64(h2)
        h1 = h1 + h2
        h2 = h2 + h1
    return h1, h2


def double_hash_indices(
    h1: np.ndarray, h2: np.ndarray, k: int, modulus: int
) -> np.ndarray:
    """Kirsch–Mitzenmacher double hashing (reference ``hash_func``,
    src/dablooms.c ≈L160–180): ``idx[i] = (h1 + i*h2) % modulus`` for
    i < k.  Returns an (n, k) int64 index matrix.

    The reference truncates h1/h2 to the low 32 bits of the 128-bit
    murmur output; we keep full 64-bit words (documented divergence —
    strictly more entropy, same published FPR bound).
    """
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(modulus)
    return idx.astype(np.int64)


def partition_ids(values, num_partitions: int, seed: int = 0x9E3779B9) -> np.ndarray:
    """Stable key→partition assignment: low murmur64 word mod P.

    Uses a *different* seed from SALT_CONSTANT so partition choice is
    independent of in-filter bit positions (SURVEY.md §4.4).
    """
    h1, _ = murmur3_x64_128_batch(values, seed=seed)
    return (h1 % np.uint64(num_partitions)).astype(np.int32)
