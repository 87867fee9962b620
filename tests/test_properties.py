"""Property-based tests (hypothesis) — merge laws and kernel parity
over randomized inputs (SURVEY.md §5.2(3) 'property-style')."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dabloomray.hashing import murmur3_x64_128, murmur3_x64_128_batch
from dabloomray.params import BloomParams
from dabloomray.sketches.cms import CountMinSketch
from dabloomray.sketches.counting import CountingBloom
from dabloomray.sketches.hll import HyperLogLog

keys_strategy = st.lists(
    st.text(min_size=0, max_size=40), min_size=1, max_size=200)


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=128),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_murmur_scalar_vectorized_agree(data, seed):
    h1, h2 = murmur3_x64_128(data, seed)
    v1, v2 = murmur3_x64_128_batch([data], seed=seed)
    assert (h1, h2) == (int(v1[0]), int(v2[0]))


@settings(max_examples=20, deadline=None)
@given(keys=keys_strategy, split=st.integers(min_value=0, max_value=199))
def test_counting_bloom_merge_equals_sequential(keys, split):
    split = min(split, len(keys))
    p = BloomParams(200, 0.05)
    a, b, seq = CountingBloom(p), CountingBloom(p), CountingBloom(p)
    if keys[:split]:
        a.add(keys[:split])
    if keys[split:]:
        b.add(keys[split:])
    seq.add(keys)
    m = a.merge(b)
    assert np.array_equal(m.counters, seq.counters)
    assert m.count == seq.count


@settings(max_examples=20, deadline=None)
@given(keys=keys_strategy,
       perm=st.permutations([0, 1, 2]))
def test_hll_merge_order_invariant(keys, perm):
    parts = [keys[0::3], keys[1::3], keys[2::3]]
    hs = []
    for part in parts:
        h = HyperLogLog(p=10)
        if part:
            h.add(part)
        hs.append(h)
    m1 = hs[0].merge(hs[1]).merge(hs[2])
    m2 = hs[perm[0]].merge(hs[perm[1]]).merge(hs[perm[2]])
    assert m1.estimate() == m2.estimate()


@settings(max_examples=15, deadline=None)
@given(data=st.data())
def test_scaling_bloom_never_false_negative(data):
    """Hard invariant from the reference suite: any added-and-not-
    removed key checks True, for arbitrary add/remove interleavings
    with monotone ids."""
    from dabloomray.params import ScalingPolicy
    from dabloomray.sketches.scaling import ScalingBloom

    n = data.draw(st.integers(min_value=1, max_value=300))
    remove_every = data.draw(st.integers(min_value=2, max_value=7))
    cap = data.draw(st.sampled_from([16, 50, 120]))
    keys = [f"k{i}" for i in range(n)]
    sb = ScalingBloom(ScalingPolicy(capacity0=cap, target_error=0.05))
    sb.add(keys, list(range(n)))
    removed = [i for i in range(n) if i % remove_every == 0]
    sb.remove([keys[i] for i in removed], removed)
    kept = [keys[i] for i in range(n) if i % remove_every != 0]
    if kept:
        assert sb.check(kept).all()


@settings(max_examples=15, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False), min_size=10,
                     max_size=400),
       nsplit=st.integers(min_value=1, max_value=5))
def test_quantile_sketch_merge_bounds(vals, nsplit):
    """Merged quantile sketches stay within the input range and are
    monotone in q (t-digest and KLL)."""
    import numpy as np

    from dabloomray.sketches.kll import KLL
    from dabloomray.sketches.tdigest import TDigest

    arr = np.asarray(vals)
    parts = np.array_split(arr, nsplit)
    for cls in (lambda: TDigest(50), lambda: KLL(50)):
        merged = None
        for p in parts:
            sk = cls()
            if len(p):
                sk.add(p)
            merged = sk if merged is None else merged.merge(sk)
        qs = merged.quantile(np.array([0.0, 0.25, 0.5, 0.75, 1.0]))
        assert (np.diff(qs) >= -1e-9).all()
        assert qs[0] >= arr.min() - 1e-9
        assert qs[-1] <= arr.max() + 1e-9


@settings(max_examples=15, deadline=None)
@given(keys=st.lists(st.sampled_from([f"k{i}" for i in range(30)]),
                     min_size=5, max_size=300),
       nsplit=st.integers(min_value=1, max_value=4))
def test_topk_merge_never_loses_heavy_hitter(keys, nsplit):
    """The true most-frequent key always survives partitioned merge
    (candidate-union argument)."""
    import collections

    import numpy as np

    from dabloomray.sketches.topk import TopKSketch

    parts = np.array_split(np.asarray(keys, dtype=object), nsplit)
    merged = None
    for p in parts:
        sk = TopKSketch(k=3, width=1024, depth=4)
        if len(p):
            sk.add(list(p))
        merged = sk if merged is None else merged.merge(sk)
    true_top = collections.Counter(keys).most_common(1)[0][0]
    top_keys = {k for k, _ in merged.top(3)}
    # the max-count key must be present (ties: any max-count key)
    counts = collections.Counter(keys)
    maxc = counts[true_top]
    assert any(counts[k] == maxc for k in top_keys)


@settings(max_examples=20, deadline=None)
@given(keys=keys_strategy)
def test_cms_never_undercounts(keys):
    c = CountMinSketch(width=256, depth=3)
    c.add(keys)
    import collections

    true = collections.Counter(keys)
    distinct = list(true)
    est = c.estimate(distinct)
    for k, e in zip(distinct, est):
        assert e >= true[k]


# -- round-2 fast-path parity properties ------------------------------------

_html_frag = st.sampled_from([
    "<title>", "</title>", "<body>", "</body>", "<TITLE >", "</BODY>",
    "<body class='x'>", "<p>", "</p>", "<>", "word", " ", "\t", "\n",
    ">", "<", "<bodyxyz>", "\x1c", "\x0b", "text here", "<body><body>",
    "</body></body>", "<title></title>", "9!.",
])


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(st.lists(_html_frag, min_size=0, max_size=10),
                     min_size=1, max_size=20))
def test_extract_batch_equals_scalar(rows):
    """Byte-level extraction fast path == scalar reference on
    arbitrary tag soup (incl. control chars and malformed nesting)."""
    import pyarrow as pa

    from dabloomray.extract import extract_text, extract_text_batch

    cases = ["".join(r).encode() for r in rows]
    tab = pa.table({"html": pa.array(cases, pa.binary())})
    got = extract_text_batch(tab).column("text").to_pylist()
    assert got == [extract_text(c) for c in cases]


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(
    st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=126),
            min_size=0, max_size=60),
    min_size=1, max_size=30))
def test_quality_and_tokens_ascii_path_equals_arrow(texts):
    """ASCII byte-table QualityScore/token-count == the Arrow regex
    path, column for column."""
    import pyarrow as pa

    import dabloomray.stages.text as T

    tab = pa.table({"text": pa.array(texts, pa.string())})
    qs = T.QualityScore()
    fast = qs(tab)
    real_all = T.pc.all
    T.pc.all = lambda *a, **k: pa.scalar(False)  # force the Arrow path
    try:
        slow = T.QualityScore()(tab)
        tok_slow = T.token_count_whitespace(tab)
    finally:
        T.pc.all = real_all
    for col in ("q_chars", "q_mean_word_len", "q_punct_ratio",
                "q_stop_ratio", "q_score"):
        assert np.allclose(fast.column(col).to_numpy(),
                           slow.column(col).to_numpy()), col
    tok_fast = T.token_count_whitespace(tab)
    assert tok_fast.column("n_tokens").to_pylist() == \
        tok_slow.column("n_tokens").to_pylist()


@settings(max_examples=30, deadline=None)
@given(texts=st.lists(st.text(min_size=0, max_size=80),
                      min_size=1, max_size=20))
def test_rolling_fingerprint_equals_scalar(texts):
    import pyarrow as pa

    from dabloomray.stages.text import RollingFingerprint, rolling_shingle_min

    tab = pa.table({"text": pa.array(texts, pa.string())})
    got = RollingFingerprint(w=16)(tab).column("shingle_min") \
        .to_numpy().view(np.uint64)
    want = np.array([rolling_shingle_min(t, 16) for t in texts],
                    dtype=np.uint64)
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(texts=st.lists(st.text(min_size=0, max_size=60),
                      min_size=0, max_size=15))
def test_simhash_vectorized_equals_rowwise(texts):
    from dabloomray.pipelines.dedup import _simhash64_rowwise, simhash64

    assert np.array_equal(simhash64(texts), _simhash64_rowwise(texts))


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(st.text(min_size=0, max_size=60),
                      min_size=0, max_size=15),
       n=st.integers(min_value=1, max_value=4))
def test_shingle_hashes_byte_path_equals_rowwise(texts, n):
    """VERDICT r2 #2: the byte-level shingle kernel must be
    hash-identical to per-doc word_ngrams + murmur, for arbitrary
    unicode (fallback) AND pure-ASCII inputs (fast path) — including
    exotic whitespace (\\v, \\x1c-\\x1f) where Python's split() differs
    from naive space splitting."""
    from dabloomray.pipelines.dedup import (
        _shingle_hashes_rowwise,
        shingle_hashes,
    )

    h1, c1 = shingle_hashes(texts, n, seed=7)
    h2, c2 = _shingle_hashes_rowwise(texts, n, seed=7)
    assert np.array_equal(c1, c2)
    assert np.array_equal(h1, h2)


@settings(max_examples=40, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.text(alphabet=" abcdef\t\n", min_size=0, max_size=60),
              st.text(alphabet=" abcdef\t\n", min_size=0, max_size=60)),
    min_size=0, max_size=12),
    n=st.integers(min_value=1, max_value=3))
def test_pairwise_jaccard_hashes_equals_scalar(pairs, n):
    """VERDICT r2 #5: vectorized hashed-set Jaccard == python set
    Jaccard over gram strings (constrained alphabet ⇒ many set
    collisions exercised; hash collisions are ~2^-64)."""
    from dabloomray.pipelines.dedup import (
        jaccard,
        pairwise_jaccard_hashes,
        shingle_hashes,
    )

    lt = [a for a, _ in pairs]
    rt = [b for _, b in pairs]
    lh, lc = shingle_hashes(lt, n, seed=7)
    rh, rc = shingle_hashes(rt, n, seed=7)
    got = pairwise_jaccard_hashes(lh, lc, rh, rc)
    want = np.array([jaccard(a, b, n) for a, b in pairs], dtype=np.float64)
    assert np.allclose(got, want, atol=0)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(min_value=1, max_value=24),
       w=st.integers(min_value=1, max_value=24),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_codec_image_roundtrips(h, w, seed):
    """PPM and BMP encode→decode are lossless for any uint8 RGB image
    (BMP exercises row padding at every width mod 4)."""
    from dabloomray.stages.codecs import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(min_value=1, max_value=500),
       channels=st.integers(min_value=1, max_value=3),
       rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_codec_wav_roundtrip(n, channels, rate, seed):
    """PCM-16 WAV encode→decode is lossless for any int16 signal."""
    from dabloomray.stages.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    samples = rng.integers(-2**15, 2**15, (n, channels)).astype(np.int16)
    out, got_rate = decode_wav(encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(out, samples)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(min_value=1, max_value=20),
       w=st.integers(min_value=1, max_value=20),
       ch=st.sampled_from([1, 2, 3, 4]),
       ftype=st.integers(min_value=0, max_value=4),
       seed=st.integers(min_value=0, max_value=2**32 - 1))
def test_codec_png_roundtrip(h, w, ch, ftype, seed):
    """PNG encode→decode is lossless for any 8-bit image across every
    channel count and every scanline filter type (VERDICT r4 #5)."""
    from dabloomray.stages.codecs import decode_png, encode_png, png_dims

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    blob = encode_png(img, filter_type=ftype)
    assert png_dims(blob) == (h, w, ch)
    assert np.array_equal(decode_png(blob), img)
