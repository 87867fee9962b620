"""Baseline JPEG codec (stages/jpeg.py): pure-numpy T.81 decode +
encode, registry-routed as a built-in like PNG (VERDICT r4 "What's
missing" #1 — the last real-compressed-media-decode gap).

No independent JPEG implementation exists in this environment, so
correctness is established the same way the PNG codec's was:
round-trips through an encoder that can drive every decoder path
(4:4:4 / 4:2:0, gray / color, restart intervals, interleaved and
non-interleaved scans, byte stuffing), exactness on DC-only content,
error bounds from the quantization tables on everything else, and
loud ValueError on the unsupported subset (progressive etc.) so the
stages fall back instead of mis-decoding."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dabloomray.stages.codecs import sniff
from dabloomray.stages.jpeg import decode_jpeg, encode_jpeg, jpeg_dims
from dabloomray.stages.multimodal import ImageDecode, _decode_image


def gradient_img(h, w, seed=0):
    r = (np.arange(h)[:, None] + np.zeros(w, int)[None, :] + seed) % 256
    g = (np.arange(w)[None, :] + np.zeros(h, int)[:, None] + 2 * seed) % 256
    b = (r + g) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def smooth_img(h, w, ch=3, seed=0):
    """Blurred noise — generic content whose JPEG error stays small."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (h, w, ch)).astype(np.float64)
    for _ in range(4):
        x = (x + np.roll(x, 1, 0) + np.roll(x, 1, 1) + np.roll(x, -1, 0)) / 4
    return x.astype(np.uint8)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


def test_constant_image_roundtrips_exact():
    """A constant block is DC-only, so round-trip error is exactly the
    DC quantizer's rounding error: ≤ qdc/16 of a pixel level.  At
    quality ≥ 75 the scaled luma DC quantizer is ≤ 8 → sub-half-level
    → EXACT after rint; at lower qualities the bound still pins the
    decoder (the sharpest self-check without a reference decoder)."""
    for q, bound in ((10, 5), (50, 1), (75, 0), (95, 0)):
        for val in (0, 90, 200, 255):
            img = np.full((16, 24, 3), val, np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=q))
            err = np.abs(out.astype(int) - img.astype(int))
            assert err.max() <= bound, (q, val, err.max())
            assert len(np.unique(out.reshape(-1, 3), axis=0)) == 1
    gray = np.full((8, 8), 77, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(gray, quality=75)),
                          gray[:, :, None])


def test_gradient_roundtrips_at_q95():
    """Smooth content at q95 across every knob: a chroma-free ramp
    (identical RGB channels ⇒ Cb=Cr=0) round-trips EXACTLY, and a
    colored gradient stays within ±1 (±2 when chroma is subsampled)."""
    ramp = (np.add.outer(np.arange(24), np.arange(40)) * 2 % 256) \
        .astype(np.uint8)
    flat = np.repeat(ramp[:, :, None], 3, axis=2)
    img = gradient_img(24, 40)
    for kwargs in ({}, {"subsample": True}, {"restart_interval": 2},
                   {"interleave": False},
                   {"subsample": True, "restart_interval": 1,
                    "interleave": False}):
        buf = encode_jpeg(flat, quality=95, **kwargs)
        assert sniff(buf) == "jpeg"
        assert jpeg_dims(buf) == (24, 40, 3)
        assert np.array_equal(decode_jpeg(buf), flat), kwargs
        out = decode_jpeg(encode_jpeg(img, quality=95, **kwargs))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= (2 if kwargs.get("subsample") else 1), kwargs


def test_error_bound_on_noise():
    """Worst-case content (uniform noise) at q95: per-pixel error is
    bounded by the sum of half-quantizer steps through the orthonormal
    IDCT — loose engineering bound of 32 levels, mean under 6."""
    img = np.random.default_rng(3).integers(0, 256, (33, 29, 3),
                                            dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 32 and err.mean() < 6.0


def test_interleave_and_restart_variants_decode_identically():
    """Scan layout is lossless packaging: the same quantized
    coefficients must reconstruct bit-identically whether the file is
    interleaved, non-interleaved (three Ns=1 scans), or chopped by
    restart markers."""
    img = smooth_img(21, 13, seed=7)
    base = decode_jpeg(encode_jpeg(img, quality=80))
    for kwargs in ({"restart_interval": 1}, {"restart_interval": 3},
                   {"interleave": False},
                   {"interleave": False, "restart_interval": 2}):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, quality=80, **kwargs)), base), \
            kwargs
    sub = decode_jpeg(encode_jpeg(img, quality=80, subsample=True))
    for kwargs in ({"restart_interval": 2}, {"interleave": False}):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, quality=80, subsample=True,
                                    **kwargs)), sub), kwargs


def test_byte_stuffing_roundtrip():
    """Content chosen to emit 0xFF bytes in the entropy stream — the
    stuffed 0x00s must be stripped on decode.  (Any sufficiently long
    noise stream contains 0xFF bytes; assert it actually did.)"""
    img = np.random.default_rng(11).integers(0, 256, (64, 64, 3),
                                             dtype=np.uint8)
    buf = encode_jpeg(img, quality=95)
    body = buf[buf.find(b"\xff\xda") + 14:-2]
    assert b"\xff\x00" in body, "fixture no longer exercises stuffing"
    out = decode_jpeg(buf)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 32


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    quality=st.sampled_from([75, 90, 95]),
    subsample=st.booleans(),
    ri=st.sampled_from([0, 1, 5]),
    interleave=st.booleans(),
    seed=st.integers(0, 2 ** 16),
)
def test_roundtrip_properties(h, w, ch, quality, subsample, ri, interleave,
                              seed):
    """Any size x any knob combination: dims exact, shape exact,
    decode within a quality-scaled error envelope (chroma subsampling
    on non-smooth content is the loosest path)."""
    img = smooth_img(h, w, ch=ch, seed=seed)
    if ch == 1:
        img = img[:, :, 0]
    buf = encode_jpeg(img, quality=quality, subsample=subsample,
                      restart_interval=ri, interleave=interleave)
    out_ch = 3 if ch == 3 else 1
    assert jpeg_dims(buf) == (h, w, out_ch)
    out = decode_jpeg(buf)
    assert out.shape == (h, w, out_ch)
    err = np.abs(out.astype(int)
                 - (img if img.ndim == 3 else img[:, :, None]).astype(int))
    bound = 48 if quality == 75 else 40
    if subsample and ch == 3:
        bound += 48  # 2x2 chroma averaging + replication upsample
    assert err.max() <= bound, (err.max(), quality, subsample)


def test_fill_bytes_before_markers_tolerated():
    """T.81 allows 0xFF fill bytes before any marker; inserting one
    before each RST and before EOI must not change the decode."""
    img = smooth_img(17, 19, seed=2)
    buf = encode_jpeg(img, quality=85, restart_interval=2)
    base = decode_jpeg(buf)
    padded = bytearray()
    i = 0
    while i < len(buf):
        if buf[i] == 0xFF and i + 1 < len(buf) \
                and (0xD0 <= buf[i + 1] <= 0xD7 or buf[i + 1] == 0xD9):
            padded.append(0xFF)  # fill byte ahead of the marker
        padded.append(buf[i])
        i += 1
    out = decode_jpeg(bytes(padded))
    assert np.array_equal(out, base)


# ---------------------------------------------------------------------------
# unsupported subset + malformed blobs: ValueError, never garbage
# ---------------------------------------------------------------------------


def test_unsupported_and_malformed_raise_valueerror():
    import pytest
    import struct as s

    good = encode_jpeg(gradient_img(16, 16), quality=90)

    def mutate_sof(marker):
        i = good.find(b"\xff\xc0")
        return good[:i + 1] + bytes([marker]) + good[i + 2:]

    bad = {
        "not jpeg": b"\x00\x01\x02",
        "truncated header": good[:8],
        "truncated entropy": good[:len(good) // 2],
        "progressive": mutate_sof(0xC2),
        "lossless": mutate_sof(0xC3),
        "arithmetic": mutate_sof(0xC9),
        "no sof": good[:2] + b"\xff\xd9",
    }
    for name, blob in bad.items():
        with pytest.raises(ValueError):
            decode_jpeg(blob)
        if name not in ("not jpeg",):
            continue
        with pytest.raises(ValueError):
            jpeg_dims(blob)
    # jpeg_dims reads dims from ANY SOFn including progressive
    assert jpeg_dims(mutate_sof(0xC2)) == (16, 16, 3)
    # 12-bit precision rejected at decode
    i = good.find(b"\xff\xc0")
    twelve = good[:i + 4] + bytes([12]) + good[i + 5:]
    with pytest.raises(ValueError):
        decode_jpeg(twelve)
    # 4-component (CMYK-style) SOF rejected
    sof = (b"\xff\xc0" + s.pack(">H", 8 + 3 * 4)
           + s.pack(">BHHB", 8, 4, 4, 4)
           + b"".join(bytes([i + 1, 0x11, 0]) for i in range(4)))
    with pytest.raises(ValueError):
        decode_jpeg(good[:2] + sof + b"\xff\xd9")


# ---------------------------------------------------------------------------
# registry integration: JPEG is a REAL built-in decoder now
# ---------------------------------------------------------------------------


def test_jpeg_rides_registry_as_builtin():
    """Same contract as PNG's: real dims via the header-only dims
    hook, real pixels via _decode_image, override + unregister
    restores the built-in, malformed blobs fall to the fake."""
    from dabloomray.stages.multimodal import (
        _DECODERS,
        register_decoder,
        unregister_decoder,
    )

    assert "jpeg" in _DECODERS
    ramp = (np.add.outer(np.arange(20), np.arange(30)) * 2 % 256) \
        .astype(np.uint8)
    img = np.repeat(ramp[:, :, None], 3, axis=2)  # chroma-free ⇒ exact
    blob = encode_jpeg(img, quality=95)
    t = pa.table({"media_id": pa.array([0, 1], pa.int64()),
                  "content": pa.array([blob, b"\xff\xd8\xffbroken"],
                                      pa.binary())})
    dec = ImageDecode()(t)
    assert dec.column("height").to_pylist()[0] == 20
    assert dec.column("width").to_pylist()[0] == 30
    assert dec.column("n_channels").to_pylist()[0] == 3
    assert dec.column("height").to_pylist()[1] >= 64  # fake dims
    assert np.array_equal(_decode_image(blob), img)  # q95 exact ramp
    try:
        register_decoder("jpeg", lambda b: np.zeros((2, 2, 3), np.uint8))
        assert _decode_image(blob).shape == (2, 2, 3)
    finally:
        unregister_decoder("jpeg")
    assert np.array_equal(_decode_image(blob), img)


def test_review_r5_truncated_sos_raises_valueerror():
    """Round-5 review: an SOS segment with an empty or short payload
    used to raise IndexError (escaping the malformed-blob harness).
    Both truncation shapes must raise ValueError instead."""
    import struct as s

    import pytest

    blob = encode_jpeg(np.full((8, 8, 3), 77, np.uint8))
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    # empty SOS payload (declared seglen 2)
    empty = blob[:sos + 2] + s.pack(">H", 2) + blob[sos + 4:]
    # SOS declaring more components than the payload carries
    head, tail = blob[:sos + 4], blob[sos + 4:]
    overlong = head[:sos + 2] + s.pack(">H", 4) + bytes([3]) + tail[1:]
    for bad in (empty, overlong):
        with pytest.raises(ValueError):
            decode_jpeg(bad)
        assert _decode_image(bad) is None


def test_review_r5_huffman_lut_memoized():
    """The 65536-entry LUT build is ~half the decode cost of a small
    tile; identical DHT bytes (the common case — Annex K everywhere)
    must hit the module cache, and decodes must stay correct."""
    from dabloomray.stages import jpeg as j

    img = np.full((8, 8, 3), 90, np.uint8)
    blob = encode_jpeg(img)
    j._LUT_CACHE.clear()
    out1 = decode_jpeg(blob)
    n_after_first = len(j._LUT_CACHE)
    assert n_after_first == 4  # dc/ac x lum/chr
    out2 = decode_jpeg(blob)
    assert len(j._LUT_CACHE) == n_after_first  # pure cache hits
    assert np.array_equal(out1, out2)
    assert np.array_equal(out1, img)  # constant block: exact at q90


def test_progressive_equals_baseline_default_script():
    """Round-5: SOF2 progressive.  Progressive and baseline files of
    the same image carry the SAME quantized coefficients, so they
    must decode bit-identically — color and gray, with and without
    4:2:0 subsampling and restart intervals."""
    from dabloomray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(17)
    for shape, sub, ri in [((16, 16, 3), False, 0), ((13, 21, 3), True, 0),
                           ((9, 7), False, 0), ((24, 18, 3), True, 3),
                           ((8, 8, 3), False, 1)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=sub))
        blob = encode_jpeg_progressive(img, quality=85, subsample=sub,
                                       restart_interval=ri)
        assert blob[:3] == b"\xff\xd8\xff" and sniff(blob) == "jpeg"
        assert jpeg_dims(blob)[:2] == shape[:2]
        assert np.array_equal(decode_jpeg(blob), base), (shape, sub, ri)


def test_progressive_custom_scan_scripts():
    """Spectral-selection-only, fine-grained bands, and deep
    successive approximation must all reassemble the exact
    coefficient lattice."""
    from dabloomray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 17, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=70))
    scripts = [
        (((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 63, 0, 0),
         ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)),
        (((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 2, 0, 0),
         ((0,), 3, 10, 0, 0), ((0,), 11, 63, 0, 0),
         ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)),
        (((0, 1, 2), 0, 0, 0, 3),
         ((0,), 1, 63, 0, 3), ((1,), 1, 63, 0, 3), ((2,), 1, 63, 0, 3),
         ((0,), 1, 63, 3, 2), ((1,), 1, 63, 3, 2), ((2,), 1, 63, 3, 2),
         ((0,), 1, 63, 2, 1), ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1),
         ((0,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
         ((0, 1, 2), 0, 0, 3, 2), ((0, 1, 2), 0, 0, 2, 1),
         ((0, 1, 2), 0, 0, 1, 0)),
    ]
    for i, sc in enumerate(scripts):
        blob = encode_jpeg_progressive(img, quality=70, scans=sc)
        assert np.array_equal(decode_jpeg(blob), base), f"script {i}"


def test_progressive_long_eob_runs_and_optimal_tables():
    """A large near-constant low-quality image forces multi-bit EOBn
    codes (EOBRUN >> 1) through both encoder and decoder, and the
    per-scan optimal Huffman tables must beat the baseline Annex K
    file on it."""
    from dabloomray.stages.jpeg import encode_jpeg_progressive
    from dabloomray.stages.multimodal import _decode_image

    img = np.full((256, 264, 3), 130, np.uint8)
    img[0, 0] = 200
    blob_p = encode_jpeg_progressive(img, quality=10)
    blob_b = encode_jpeg(img, quality=10)
    assert np.array_equal(decode_jpeg(blob_p), decode_jpeg(blob_b))
    assert len(blob_p) < len(blob_b)  # optimal tables + EOB runs win
    # registry path decodes progressive transparently
    assert np.array_equal(_decode_image(blob_p), decode_jpeg(blob_b))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    color=st.booleans(),
    quality=st.sampled_from([10, 50, 90]),
    subsample=st.booleans(),
    ri=st.integers(0, 3),
    seed=st.integers(0, 2**32 - 1),
)
def test_progressive_roundtrip_property(h, w, color, quality, subsample,
                                        ri, seed):
    from dabloomray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality,
                                   subsample=subsample and color))
    blob = encode_jpeg_progressive(img, quality=quality,
                                   subsample=subsample and color,
                                   restart_interval=ri)
    assert np.array_equal(decode_jpeg(blob), base)


def test_progressive_malformed_raises_valueerror():
    """Truncated/corrupt progressive streams must raise ValueError
    (the malformed-blob contract), never IndexError or a hang."""
    import pytest

    from dabloomray.stages.jpeg import encode_jpeg_progressive
    from dabloomray.stages.multimodal import _decode_image

    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    blob = encode_jpeg_progressive(img, quality=50)
    for cut in (len(blob) // 3, len(blob) // 2, len(blob) - 3):
        bad = blob[:cut]
        with pytest.raises(ValueError):
            decode_jpeg(bad)
        assert _decode_image(bad) is None


def test_review_r5b_ns_zero_sos_raises_valueerror():
    """Second review pass: an SOS declaring Ns=0 passed the truncation
    check and crashed _decode_scan with IndexError at scan[0]."""
    import struct as s

    import pytest

    from dabloomray.stages.multimodal import _decode_image

    blob = encode_jpeg(np.full((8, 8, 3), 50, np.uint8))
    sos = blob.find(b"\xff\xda")
    bad = blob[:sos + 2] + s.pack(">H", 6) + bytes([0, 0, 63, 0]) \
        + blob[sos + 4 + blob[sos + 3]:]
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    assert _decode_image(bad) is None


def test_progressive_handcrafted_stream_matches_spec_arithmetic():
    """Decoder checked against a BYTE-LEVEL HAND-ASSEMBLED SOF2 stream
    (written from T.81 G.2 directly, independent of our encoder):
    4 scans — DC first (Al=1), AC first (band 1-63, Al=1), AC refine
    (correction bit over a nonzero-history coefficient + a newly
    significant one + EOB), DC refine — must produce exactly the
    coefficients {DC: 7, zig1: 3, zig2: 1} and the IDCT of them."""
    import struct as s

    from dabloomray.stages.jpeg import _A, _ZIGZAG

    def seg(marker, payload):
        return bytes([0xFF, marker]) + s.pack(">H", len(payload) + 2) \
            + payload

    class BW:
        def __init__(self):
            self.bits = []

        def put(self, val, n):
            for i in range(n - 1, -1, -1):
                self.bits.append((val >> i) & 1)

        def out(self):
            bs = bytearray()
            b = self.bits + [1] * (-len(self.bits) % 8)
            for i in range(0, len(b), 8):
                v = 0
                for x in b[i:i + 8]:
                    v = (v << 1) | x
                bs.append(v)
                if v == 0xFF:
                    bs.append(0)
            return bytes(bs)

    blob = bytearray(b"\xff\xd8")
    blob += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # identity DQT
    blob += seg(0xC2, s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    blob += seg(0xC4, bytes([0x00]) + bytes([1, 1] + [0] * 14)
                + bytes([2, 0]))  # DC: cat2 len1, cat0 len2
    blob += seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14)
                + bytes([0x01, 0x00]))  # AC: (0,1) len1, EOB len2
    # scan 1: DC first Al=1 — diff cat 2, bits '11' → pred 3, coef 6
    blob += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    bw = BW(); bw.put(0, 1); bw.put(0b11, 2); blob += bw.out()
    # scan 2: AC first 1-63 Al=1 — +1<<1 at k=1, then EOB
    blob += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
    bw = BW(); bw.put(0, 1); bw.put(1, 1); bw.put(0b10, 2)
    blob += bw.out()
    # scan 3: AC refine Ah=1 Al=0 — newly significant +1 at k=2 with a
    # correction bit consumed passing over k=1 (2 → 3), then EOB
    blob += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
    bw = BW(); bw.put(0, 1); bw.put(1, 1); bw.put(1, 1); bw.put(0b10, 2)
    blob += bw.out()
    # scan 4: DC refine — one bit: 6 | 1 = 7
    blob += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    bw = BW(); bw.put(1, 1); blob += bw.out()
    blob += b"\xff\xd9"

    img = decode_jpeg(bytes(blob))
    coef = np.zeros(64)
    coef[0] = 7
    coef[int(_ZIGZAG[1])] = 3
    coef[int(_ZIGZAG[2])] = 1
    pix = _A.T @ coef.reshape(8, 8) @ _A + 128.0
    want = np.clip(np.rint(pix), 0, 255).astype(np.uint8)[:, :, None]
    assert np.array_equal(img, want)
