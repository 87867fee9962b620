"""Kernel parity tests (SURVEY.md §5.2 item 1)."""

import numpy as np
import pyarrow as pa
import pytest

from dabloomray.hashing import (
    SALT_CONSTANT,
    double_hash_indices,
    murmur3_x64_128,
    murmur3_x64_128_batch,
    partition_ids,
)


def test_smhasher_verification():
    """Authoritative check: SMHasher VerificationTest value for
    MurmurHash3_x64_128 is 0x6384BA69 (smhasher main.cpp, public)."""
    buf = b""
    for l in range(256):
        h1, h2 = murmur3_x64_128(bytes(range(l)), 256 - l)
        buf += h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    h1, _ = murmur3_x64_128(buf, 0)
    assert h1 & 0xFFFFFFFF == 0x6384BA69


def test_known_vectors():
    # mmh3.hash64(b"foo") == (-2129773440516405919, 9128664383759220103)
    h1, h2 = murmur3_x64_128(b"foo", 0)
    assert h1 == -2129773440516405919 % (1 << 64)
    assert h2 == 9128664383759220103
    assert murmur3_x64_128(b"", 0) == (0, 0)


@pytest.mark.parametrize("seed", [0, SALT_CONSTANT, 12345])
def test_scalar_vs_vectorized(seed):
    rng = np.random.RandomState(42)
    strs = [bytes(rng.randint(0, 256, rng.randint(0, 100), dtype=np.uint8))
            for _ in range(200)]
    strs += [b"", b"a" * 16, b"b" * 17, b"c" * 15, b"d" * 32]
    h1v, h2v = murmur3_x64_128_batch(strs, seed=seed)
    for i, s in enumerate(strs):
        assert murmur3_x64_128(s, seed) == (int(h1v[i]), int(h2v[i]))


def test_arrow_input_paths():
    words = [f"key-{i}" for i in range(100)]
    expected = murmur3_x64_128_batch(words, seed=1)
    for arr in (pa.array(words), pa.chunked_array([words[:50], words[50:]]),
                pa.array(words).slice(0, 100)):
        got = murmur3_x64_128_batch(arr, seed=1)
        assert np.array_equal(got[0], expected[0])
        assert np.array_equal(got[1], expected[1])
    # sliced arrays (non-zero offset) must honor the offset
    sl = pa.array(words).slice(10, 20)
    got = murmur3_x64_128_batch(sl, seed=1)
    assert np.array_equal(got[0], expected[0][10:30])


def test_double_hash_indices():
    h1 = np.array([5, 7], dtype=np.uint64)
    h2 = np.array([3, 11], dtype=np.uint64)
    idx = double_hash_indices(h1, h2, k=4, modulus=13)
    assert idx.shape == (2, 4)
    assert list(idx[0]) == [(5 + i * 3) % 13 for i in range(4)]
    assert list(idx[1]) == [(7 + i * 11) % 13 for i in range(4)]


def test_partition_ids_stable_and_spread():
    words = [f"url-{i}" for i in range(5000)]
    p = partition_ids(words, 16)
    q = partition_ids(words, 16)
    assert np.array_equal(p, q)
    counts = np.bincount(p, minlength=16)
    assert counts.min() > 0.5 * 5000 / 16  # roughly uniform
