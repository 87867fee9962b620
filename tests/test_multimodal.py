"""Multimodal stages: REAL pure-numpy codecs for uncompressed formats
(P6 PPM / 24-bit BMP / PCM-16 WAV / concatenated-P6 streams) plus the
deterministic-fake fallbacks for compressed formats (libs absent)."""

import numpy as np
import pyarrow as pa

from dabloomray.stages.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_features,
    resize_nearest,
    sniff,
)
from dabloomray.stages.multimodal import (
    AudioDecode,
    FrameSample,
    ImageDecode,
    ImageFeatures,
    ImageResize,
)


def gradient_img(h, w, seed=0):
    r = (np.arange(h)[:, None] + np.zeros(w, int)[None, :] + seed) % 256
    g = (np.arange(w)[None, :] + np.zeros(h, int)[:, None] + 2 * seed) % 256
    b = (r + g) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_ppm_roundtrip_and_comment_header():
    img = gradient_img(13, 17)
    buf = encode_ppm(img)
    assert sniff(buf) == "ppm"
    assert np.array_equal(decode_ppm(buf), img)
    # header with a comment line (valid netpbm)
    buf2 = b"P6\n# a comment\n17 13\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(buf2), img)


def test_bmp_roundtrip_with_row_padding():
    img = gradient_img(9, 5)  # width 5 -> 15-byte rows, padded to 16
    buf = encode_bmp(img)
    assert sniff(buf) == "bmp"
    assert np.array_equal(decode_bmp(buf), img)


def test_wav_roundtrip_stereo():
    t = np.arange(800)
    samples = np.stack([(1000 * np.sin(t / 10)).astype(np.int16),
                        (500 * np.cos(t / 7)).astype(np.int16)], axis=1)
    buf = encode_wav(samples, 8000)
    assert sniff(buf) == "wav"
    out, rate = decode_wav(buf)
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_resize_nearest_identity_and_downscale():
    img = gradient_img(16, 16)
    assert np.array_equal(resize_nearest(img, 16, 16), img)
    half = resize_nearest(img, 8, 8)
    assert half.shape == (8, 8, 3)
    # nearest with centre mapping picks pixel floor((i+0.5)*2) = 2i+1
    assert np.array_equal(half, img[1::2, 1::2])


def test_image_decode_real_dims_for_ppm_and_bmp():
    img = gradient_img(21, 34)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "content": pa.array([encode_ppm(img), encode_bmp(img)], pa.binary()),
    })
    out = ImageDecode()(t)
    assert out.column("height").to_pylist() == [21, 21]
    assert out.column("width").to_pylist() == [34, 34]
    assert out.column("n_channels").to_pylist() == [3, 3]


def test_image_resize_stage_real_and_passthrough():
    img = gradient_img(20, 30, seed=3)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "content": pa.array([encode_ppm(img), b"\xff\xd8 not decodable"],
                            pa.binary()),
    })
    out = ImageResize(10, 15)(t)
    assert out.column("resized_ok").to_pylist() == [True, False]
    resized = decode_ppm(out.column("resized")[0].as_py())
    assert resized.shape == (10, 15, 3)
    assert np.array_equal(resized, resize_nearest(img, 10, 15))


def test_image_features_real_for_constant_image():
    img = np.full((8, 8, 3), 128, np.uint8)
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "content": pa.array([encode_ppm(img)], pa.binary())})
    f = np.asarray(ImageFeatures(dim=16)(t).column("features").to_pylist()[0])
    assert np.allclose(f[0:3], 128 / 255.0)  # per-channel means
    assert np.allclose(f[3:6], 0.0)          # constant -> zero std
    assert np.isclose(f[6:].sum(), 1.0)      # histogram normalized
    assert np.allclose(f, image_features(img, 16))


def test_audio_decode_real_wav():
    tone = (10000 * np.sin(np.arange(16000) / 5)).astype(np.int16)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "content": pa.array([encode_wav(tone, 16000), b"mp3junk"],
                            pa.binary()),
    })
    out = AudioDecode()(t)
    assert out.column("audio_ok").to_pylist() == [True, False]
    assert out.column("n_samples")[0].as_py() == 16000
    assert out.column("sample_rate")[0].as_py() == 16000
    assert abs(out.column("duration_s")[0].as_py() - 1.0) < 1e-9
    # sine rms = amp/sqrt(2); amp = 10000/32768
    assert abs(out.column("rms")[0].as_py()
               - (10000 / 32768) / np.sqrt(2)) < 0.01


def test_frame_sample_real_ppm_stream():
    frames = [gradient_img(6, 7, seed=s) for s in range(10)]
    stream = b"".join(encode_ppm(f) for f in frames)
    t = pa.table({"media_id": pa.array([42], pa.int64()),
                  "content": pa.array([stream], pa.binary())})
    out = FrameSample(n_frames=4)(t)
    assert out.num_rows == 4
    assert out.column("frame_idx").to_pylist() == [0, 3, 6, 9]
    for row_i, src_i in enumerate([0, 3, 6, 9]):
        got = decode_ppm(out.column("frame")[row_i].as_py())
        assert np.array_equal(got, frames[src_i])


def media_table(n=20):
    blobs = [bytes([i % 251]) * (100 + 13 * i) for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "content": pa.array(blobs, pa.binary()),
    })


def test_image_decode_schema_and_determinism():
    t = media_table()
    out1 = ImageDecode()(t)
    out2 = ImageDecode()(t)
    assert out1.column("height").to_pylist() == out2.column("height").to_pylist()
    assert out1.schema.field("height").type == pa.int32()
    assert all(64 <= h < 1024 for h in out1.column("height").to_pylist())


def test_image_features_fixed_size_list():
    out = ImageFeatures(dim=16)(media_table())
    f = out.column("features")
    assert pa.types.is_fixed_size_list(f.type)
    assert f.type.list_size == 16
    mat = np.asarray(out.column("features").to_pylist())
    assert mat.shape == (20, 16)
    assert (ImageFeatures(dim=16)(media_table()).column("features")
            .to_pylist() == f.to_pylist())


def test_frame_sample_fanout():
    out = FrameSample(n_frames=4)(media_table(5))
    assert out.num_rows == 20
    assert out.column("frame_idx").to_pylist() == [0, 1, 2, 3] * 5
    assert all(len(b) > 0 for b in out.column("frame").to_pylist())


def test_binary_payload_neardup_via_features(ray_session):
    """Compose multimodal features with the similarity pipeline:
    identical binary payloads → identical (deterministic fake)
    features → cosine 1.0 pairs; distinct payloads stay apart."""
    import ray.data as rd

    from dabloomray.pipelines.similarity import cosine_neardup_pairs

    t = media_table(30)
    # plant exact-duplicate payloads: media 10 == media 0, 20 == 5
    content = t.column("content").to_pylist()
    content[10] = content[0]
    content[20] = content[5]
    t = pa.table({"media_id": t.column("media_id"),
                  "content": pa.array(content, pa.binary())})
    ds = rd.from_arrow(t).repartition(3)
    feats = ds.map_batches(ImageFeatures(dim=16), batch_format="pyarrow") \
        .select_columns(["media_id", "features"])
    pairs = cosine_neardup_pairs(feats, "media_id", "features",
                                 threshold=0.999)
    got = {(r["left_id"], r["right_id"]) for r in pairs.take_all()}
    assert got == {(0, 10), (5, 20)}


def test_stages_compose_in_ray_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(media_table(40)).repartition(4)
    out = ds.map_batches(ImageDecode, batch_format="pyarrow",
                         batch_size=8, concurrency=(1, 2))
    out = out.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=8, concurrency=(1, 2))
    got = out.take_all()
    assert len(got) == 40
    assert len(got[0]["features"]) == 16


def test_malformed_blobs_never_raise():
    """A corrupt blob whose magic bytes match must fall back (fake
    dims / pass-through / audio_ok=False), never raise out of the
    stage — one bad file in a crawl batch must not kill the task."""
    bad = [
        b"P6garbage header",                 # bad PPM tokens
        b"P6\n5 5\n255\nshort",              # truncated PPM raster
        b"BM" + b"\x00" * 10,                # truncated BMP header
        encode_bmp(gradient_img(4, 4))[:30], # truncated BMP mid-header
        b"RIFF\x10\x00\x00\x00WAVEjunk",     # WAV with garbage chunks
        # IEEE-float WAV (fmt=3): valid file, unsupported variant
        b"RIFF\x2a\x00\x00\x00WAVEfmt \x12\x00\x00\x00\x03\x00\x01\x00"
        + b"\x00" * 14 + b"data\x00\x00\x00\x00",
        b"",
    ]
    t = pa.table({
        "media_id": pa.array(range(len(bad)), pa.int64()),
        "content": pa.array(bad, pa.binary()),
    })
    dec = ImageDecode()(t)          # fake-dims (or header dims), no raise
    assert len(dec) == len(bad)
    heights = dec.column("height").to_pylist()
    # blob 3 has an INTACT header (only the raster is truncated) and
    # ImageDecode is header-only by design → real 4x4; the rest fake
    assert heights[3] == 4
    assert all(64 <= h for i, h in enumerate(heights) if i != 3)
    rez = ImageResize(4, 4)(t)      # all pass-through (resize needs raster)
    assert rez.column("resized_ok").to_pylist() == [False] * len(bad)
    assert rez.column("resized").to_pylist() == bad
    feat = ImageFeatures(dim=16)(t)  # all hash-fakes, deterministic
    assert len(feat.column("features").to_pylist()[0]) == 16
    aud = AudioDecode()(t)           # nothing decodes, nothing raises
    assert aud.column("audio_ok").to_pylist() == [False] * len(bad)
    fs = FrameSample(n_frames=2)(t)  # stub slicing for all
    assert fs.num_rows == 2 * len(bad)


def test_decoder_registry_plugs_in_without_editing_stages():
    """VERDICT r3 #5: register_decoder('jpeg', fn) must route 'jpeg'
    blobs through the plugged decoder in ImageDecode (dims) and the
    shared _decode_image path (resize/features), while unregistered
    compressed formats keep the deterministic-fake fallback, and a
    raising decoder falls back instead of killing the task."""
    from dabloomray.stages.multimodal import (
        _decode_image,
        register_decoder,
        unregister_decoder,
    )

    # a "jpeg": right magic, payload encodes dims in two bytes
    def toy(h, w):
        return b"\xff\xd8\xff" + bytes([h, w]) + b"payload"

    def toy_decode(blob):
        h, w = blob[3], blob[4]
        return np.full((h, w, 3), 7, np.uint8)

    blobs = [toy(9, 11), toy(5, 6), b"\x89PNG\r\n\x1a\nstub"]
    t = pa.table({
        "media_id": pa.array(range(len(blobs)), pa.int64()),
        "content": pa.array(blobs, pa.binary()),
    })
    try:
        register_decoder("jpeg", toy_decode)
        dec = ImageDecode()(t)
        assert dec.column("height").to_pylist()[:2] == [9, 5]
        assert dec.column("width").to_pylist()[:2] == [11, 6]
        # png has no registered decoder -> deterministic fake dims
        assert dec.column("height").to_pylist()[2] >= 64
        # shared decode path (resize/features) uses the registry too
        img = _decode_image(toy(4, 3))
        assert img.shape == (4, 3, 3)
        rez = ImageResize(2, 2)(t)
        assert rez.column("resized_ok").to_pylist() == [True, True, False]
        # a cheap dims hook takes priority over decode-and-measure
        register_decoder("jpeg", toy_decode,
                         dims=lambda b: (b[3] + 1, b[4] + 1, 3))
        dec2 = ImageDecode()(t)
        assert dec2.column("height").to_pylist()[0] == 10
        # a RAISING registered decoder falls back, never raises out
        register_decoder("jpeg", lambda b: (_ for _ in ()).throw(
            ValueError("corrupt")))
        dec3 = ImageDecode()(t)
        assert dec3.column("height").to_pylist()[0] >= 64  # fake dims
        assert _decode_image(toy(4, 3)) is None
        # a None-RETURNING decoder (cv2.imdecode convention) must also
        # fall back — np.asarray(None) is a 0-d object array that
        # would crash resize/features (code-review r4)
        register_decoder("jpeg", lambda b: None)
        decn = ImageDecode()(t)
        assert decn.column("height").to_pylist()[0] >= 64  # fake dims
        assert _decode_image(toy(4, 3)) is None
        rezn = ImageResize(2, 2)(t)
        assert rezn.column("resized_ok").to_pylist()[0] is False
        featn = ImageFeatures(dim=8)(t)  # hash-fake, no crash
        assert len(featn.column("features").to_pylist()[0]) == 8
    finally:
        unregister_decoder("jpeg")
    # registry cleared -> jpeg back on the fake path
    dec4 = ImageDecode()(t)
    assert dec4.column("height").to_pylist()[0] >= 64


# ---------------------------------------------------------------------------
# PNG (VERDICT r4 #5: real decode via the registry)
# ---------------------------------------------------------------------------


def test_png_roundtrip_every_filter_and_channel():
    """encode_png applies ONE filter to every scanline, so each of the
    five spec filters (None/Sub/Up/Average/Paeth) gets its own decode
    path exercised, across gray / gray+alpha / RGB / RGBA."""
    from dabloomray.stages.codecs import decode_png, encode_png, png_dims

    rng = np.random.default_rng(42)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
        for f in range(5):
            blob = encode_png(img, filter_type=f)
            assert sniff(blob) == "png"
            assert png_dims(blob) == (13, 9, ch)
            out = decode_png(blob)
            assert out.shape == (13, 9, ch), (ch, f)
            assert np.array_equal(out, img), (ch, f)


def test_png_palette_decode():
    """Color type 3: indices map through PLTE to RGB."""
    import struct
    import zlib

    from dabloomray.stages.codecs import _PNG_SIG, decode_png, png_dims

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    h, w = idx.shape
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(kind, data):
        return (struct.pack(">I", len(data)) + kind + data
                + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF))

    blob = (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(lines))
            + chunk(b"IEND", b""))
    assert png_dims(blob) == (h, w, 3)
    assert np.array_equal(decode_png(blob), pal[idx])


def test_png_rides_registry_as_builtin():
    """PNG must be a REAL registry decoder out of the box: real dims
    in ImageDecode (via the dims hook, no inflate), real resize and
    features; unregister restores the built-in rather than dropping
    to the fake."""
    from dabloomray.stages.multimodal import (
        _DECODERS,
        _decode_image,
        register_decoder,
        unregister_decoder,
    )
    from dabloomray.stages.codecs import decode_png, encode_png

    assert "png" in _DECODERS
    img = gradient_img(20, 30)
    blob = encode_png(img, filter_type=4)
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "content": pa.array([blob], pa.binary())})
    dec = ImageDecode()(t)
    assert dec.column("height").to_pylist() == [20]
    assert dec.column("width").to_pylist() == [30]
    assert dec.column("n_channels").to_pylist() == [3]
    assert np.array_equal(_decode_image(blob), img)
    rez = ImageResize(10, 15)(t)
    assert rez.column("resized_ok").to_pylist() == [True]
    want = resize_nearest(img, 10, 15)
    assert np.array_equal(decode_ppm(rez.column("resized")[0].as_py()), want)
    # a user override wins; unregister restores the REAL built-in
    try:
        register_decoder("png", lambda b: np.zeros((2, 2, 3), np.uint8))
        assert _decode_image(blob).shape == (2, 2, 3)
    finally:
        unregister_decoder("png")
    assert np.array_equal(_decode_image(blob), img)


def test_png_malformed_blobs_fall_back():
    """Truncated/unsupported PNGs (bad IDAT, sub-byte depth, bad
    filter byte) must fall to the documented fake/pass-through paths.
    16-bit and Adam7 are REAL since the round-5 extension, so those
    headers now yield real dims (raster still absent → resize falls
    back)."""
    import struct
    import zlib

    from dabloomray.stages.codecs import _PNG_SIG, encode_png

    def chunk(kind, data):
        return (struct.pack(">I", len(data)) + kind + data
                + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF))

    def ihdr(depth=8, ctype=2, interlace=0):
        return chunk(b"IHDR",
                     struct.pack(">IIBBBBB", 4, 4, depth, ctype, 0, 0,
                                 interlace))

    bad = [
        _PNG_SIG + b"short",                               # no IHDR
        _PNG_SIG + ihdr(depth=4) + chunk(b"IEND", b""),    # sub-byte
        _PNG_SIG + ihdr(depth=16, ctype=3)
        + chunk(b"IEND", b""),                             # 16-bit palette
        _PNG_SIG + ihdr() + chunk(b"IDAT", b"notzlib")
        + chunk(b"IEND", b""),                             # bad stream
        _PNG_SIG + ihdr()
        + chunk(b"IDAT", zlib.compress(b"\x09" + b"\x00" * 12))
        + chunk(b"IEND", b""),                             # filter 9
        encode_png(gradient_img(6, 6))[:40],               # truncated
        # REAL headers since round 5: 16-bit and Adam7 give real dims
        _PNG_SIG + ihdr(depth=16) + chunk(b"IEND", b""),
        _PNG_SIG + ihdr(interlace=1) + chunk(b"IEND", b""),
    ]
    t = pa.table({"media_id": pa.array(range(len(bad)), pa.int64()),
                  "content": pa.array(bad, pa.binary())})
    dec = ImageDecode()(t)  # never raises
    heights = dec.column("height").to_pylist()
    # blobs 0-2 have no usable IHDR (missing / sub-byte / 16-bit
    # palette) → fake dims; the rest have an INTACT supported IHDR and
    # ImageDecode is header-only by design → real dims even though the
    # raster is junk or missing
    assert all(h >= 64 for h in heights[:3])
    assert heights[3:] == [4, 4, 6, 4, 4]
    rez = ImageResize(3, 3)(t)  # raster decode fails on ALL of them
    assert rez.column("resized_ok").to_pylist() == [False] * len(bad)


def test_png_distributed_decode(ray_session):
    """Round-trip through a real Ray pipeline: encode with the tiny
    writer, decode/resize/features on actor-pool stages."""
    import ray.data as rd

    from dabloomray.stages.codecs import encode_png

    rows = [{"media_id": i,
             "content": encode_png(gradient_img(8 + i, 6 + i, seed=i),
                                   filter_type=i % 5)}
            for i in range(10)]
    ds = rd.from_items(rows).map_batches(ImageDecode, concurrency=2,
                                         batch_format="pyarrow")
    got = {r["media_id"]: (r["height"], r["width"], r["n_channels"])
           for r in ds.take_all()}
    assert got == {i: (8 + i, 6 + i, 3) for i in range(10)}


# ---------------------------------------------------------------------------
# GIF (round 5: real first-frame decode + LZW, registry built-in)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_paletted_content():
    """Lossless palette format: any image with <= 256 distinct colors
    must round-trip EXACTLY, plain and interlaced, including sizes
    whose LZW stream crosses code-width growth and the 4096 reset."""
    from dabloomray.stages.codecs import decode_gif, encode_gif, gif_dims

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (200, 3), np.uint8)
    cases = [
        np.zeros((5, 7, 3), np.uint8),                       # 1 color
        gradient_img(16, 16),                                # 256 colors
        pal[rng.integers(0, 200, (37, 53))],                 # width growth
        pal[rng.integers(0, 200, (150, 200))],               # 4096 reset
        np.full((1, 1, 3), 9, np.uint8),                     # 1x1
    ]
    for img in cases:
        for interlace in (False, True):
            blob = encode_gif(img, interlace=interlace)
            assert sniff(blob) == "gif"
            assert gif_dims(blob) == (img.shape[0], img.shape[1], 3)
            assert np.array_equal(decode_gif(blob), img), \
                (img.shape, interlace)
    # gray input is expanded to identical RGB channels
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)
    from dabloomray.stages.codecs import decode_gif as dg, encode_gif as eg
    assert np.array_equal(dg(eg(g)), np.repeat(g[:, :, None], 3, axis=2))


def test_gif_lzw_kwkwk_and_transparency():
    """The KwKwK corner (code == next dictionary slot) arises from
    period-2 repetition — drive it explicitly; and a GIF89a GCE
    transparent index must leave background pixels where the frame is
    transparent."""
    from dabloomray.stages.codecs import decode_gif, encode_gif

    # abababab... rows: the LZW encoder emits the just-added code
    ab = np.zeros((4, 32, 3), np.uint8)
    ab[:, 1::2] = 255
    assert np.array_equal(decode_gif(encode_gif(ab)), ab)

    img = np.zeros((4, 4, 3), np.uint8)
    img[1, 1] = [255, 0, 0]
    img[2, 2] = [0, 255, 0]
    out = decode_gif(encode_gif(img, transparent_color=(255, 0, 0)))
    assert np.array_equal(out[2, 2], [0, 255, 0])
    assert np.array_equal(out[1, 1], out[0, 0])  # transparent → bg
    import pytest

    with pytest.raises(ValueError):  # quantization is out of scope
        encode_gif(np.random.default_rng(1).integers(
            0, 256, (40, 40, 3), np.uint8))
    with pytest.raises(ValueError):  # transparent color must exist
        encode_gif(img, transparent_color=(1, 2, 3))


def test_gif_rides_registry_and_malformed_falls_back():
    """GIF is a REAL built-in registry decoder: header-only dims in
    ImageDecode, real pixels in resize/features; malformed blobs
    (truncated LZW, bad block, index past palette) fall to the fake
    path, never raise."""
    from dabloomray.stages.codecs import encode_gif
    from dabloomray.stages.multimodal import _DECODERS, _decode_image

    assert "gif" in _DECODERS
    img = gradient_img(12, 18)
    blob = encode_gif(img)
    t = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "content": pa.array(
            [blob, b"GIF87a\x05\x00", blob[:40]], pa.binary()),
    })
    dec = ImageDecode()(t)
    assert dec.column("height").to_pylist()[0] == 12
    assert dec.column("width").to_pylist()[0] == 18
    assert dec.column("height").to_pylist()[1] >= 64  # truncated header
    # blob[:40] keeps the LSD (real header dims) but ImageDecode's gif
    # hook is header-only, so dims are still real; full decode fails
    assert dec.column("height").to_pylist()[2] == 12
    assert np.array_equal(_decode_image(blob), img)
    assert _decode_image(blob[:40]) is None
    rez = ImageResize(6, 9)(t)
    assert rez.column("resized_ok").to_pylist() == [True, False, False]


# ---------------------------------------------------------------------------
# MP4 demux + WEBP dims (round 5: real container parses, no codec)
# ---------------------------------------------------------------------------


def test_mp4_demux_roundtrip_and_dims():
    """The sample-table walk must return every sample's exact byte
    range across chunk layouts (stsc run expansion), and tkhd dims
    must surface through the registry's header-only hook."""
    from dabloomray.stages.codecs import (
        encode_mp4,
        mp4_dims,
        mp4_sample_ranges,
    )

    frames = [bytes([i]) * (10 + 7 * i) for i in range(11)]
    for chunk_size in (1, 2, 3, 5, 100):
        buf = encode_mp4(frames, 320, 240, chunk_size=chunk_size)
        assert sniff(buf) == "mp4"
        assert mp4_dims(buf) == (240, 320, 3)
        spans = mp4_sample_ranges(buf)
        assert [buf[o:o + s] for o, s in spans] == frames, chunk_size
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "content": pa.array([encode_mp4(frames, 320, 240)],
                                      pa.binary())})
    dec = ImageDecode()(t)  # real dims, header-only
    assert dec.column("height").to_pylist() == [240]
    assert dec.column("width").to_pylist() == [320]
    rez = ImageResize(2, 2)(t)  # pixels stay honestly undecodable
    assert rez.column("resized_ok").to_pylist() == [False]


def test_frame_sample_real_mp4_path():
    """FrameSample on an MP4 must emit REAL encoded sample bytes with
    SOURCE indices (even spread), and fall to the stub slicer on a
    corrupt sample table — never raise."""
    from dabloomray.stages.codecs import encode_mp4

    frames = [bytes([i]) * 50 for i in range(9)]
    buf = encode_mp4(frames, 64, 48, chunk_size=4)
    # corrupt: truncate into the moov so the sample table is broken
    bad = buf[:len(buf) - 40]
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "content": pa.array([buf, bad], pa.binary())})
    fs = FrameSample(n_frames=3)(t)
    rows = fs.to_pylist()
    real = [r for r in rows if r["media_id"] == 1]
    assert [r["frame_idx"] for r in real] == [0, 4, 8]
    assert all(r["frame"] == frames[r["frame_idx"]] for r in real)
    stub = [r for r in rows if r["media_id"] == 2]
    assert len(stub) == 3  # stub slicing, same schema


def test_webp_dims_all_three_chunk_kinds():
    import struct as s

    import pytest

    from dabloomray.stages.codecs import webp_dims

    def riff(chunks):
        body = b"WEBP" + chunks
        return b"RIFF" + s.pack("<I", len(body)) + body

    vp8 = (b"VP8 " + s.pack("<I", 10) + b"\x00\x00\x00\x9d\x01\x2a"
           + s.pack("<HH", 160, 120))
    vp8l = (b"VP8L" + s.pack("<I", 5) + b"\x2f"
            + s.pack("<I", 159 | (119 << 14)))
    vp8x = (b"VP8X" + s.pack("<I", 10) + b"\x00" * 4
            + (159).to_bytes(3, "little") + (119).to_bytes(3, "little"))
    for chunk in (vp8, vp8l, vp8x):
        blob = riff(chunk)
        assert sniff(blob) == "webp"
        assert webp_dims(blob) == (120, 160, 3)
    with pytest.raises(ValueError):
        webp_dims(riff(b"VP8 " + s.pack("<I", 10) + b"\x00" * 10))
    with pytest.raises(ValueError):
        webp_dims(b"RIFF\x04\x00\x00\x00WAVE")
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "content": pa.array([riff(vp8)], pa.binary())})
    dec = ImageDecode()(t)
    assert (dec.column("height").to_pylist(),
            dec.column("width").to_pylist()) == ([120], [160])


def test_review_r5_truncated_blobs_raise_valueerror_not_indexerror():
    """Round-5 review: blobs truncated at specific parser offsets used
    to raise IndexError, escaping _decode_image's (ValueError,
    struct.error, OSError) harness and killing the map_batches task.
    Every decoder must raise ValueError on truncation."""
    import struct as s

    import pytest

    from dabloomray.stages.codecs import (
        decode_gif,
        encode_gif,
        encode_mp4,
        mp4_dims,
    )
    from dabloomray.stages.multimodal import _decode_image

    # GIF truncated inside a GCE (after the flags byte)
    gce_trunc = (b"GIF89a" + s.pack("<HH", 2, 2)
                 + bytes([0x80, 0, 0]) + b"\x00" * 6  # LSD + 2-entry GCT
                 + bytes([0x21, 0xF9, 0x04, 0x01]))
    # GIF truncated right before the LZW min-code-size byte
    mcs_trunc = (b"GIF87a" + s.pack("<HH", 2, 2)
                 + bytes([0x80, 0, 0]) + b"\x00" * 6
                 + b"\x2c" + s.pack("<HHHH", 0, 0, 2, 2) + b"\x00")
    # MP4 whose tkhd box is empty at buffer end
    full = encode_mp4([b"xx"], 4, 4)
    tk = full.find(b"tkhd")
    empty_tkhd = full[:tk - 4] + s.pack(">I", 8) + b"tkhd"
    for blob, fn in [(gce_trunc, decode_gif), (mcs_trunc, decode_gif),
                     (empty_tkhd, mp4_dims)]:
        with pytest.raises(ValueError):
            fn(blob)
        assert _decode_image(blob) is None  # harness catches it
    # the whole stage survives a batch of them
    t = pa.table({"media_id": pa.array([0, 1, 2], pa.int64()),
                  "content": pa.array([gce_trunc, mcs_trunc, empty_tkhd],
                                      pa.binary())})
    assert len(ImageDecode()(t)) == 3
    # sanity: the valid encodings still decode
    img = gradient_img(3, 3)
    assert decode_gif(encode_gif(img)).shape == (3, 3, 3)
    assert mp4_dims(full) == (4, 4, 3)


def test_review_r5_mp4_stsc_gap_rejected():
    """stsc runs not covering chunk 1 used to leave np.empty garbage
    as samples-per-chunk — nondeterministic WRONG sample ranges.
    Malformed coverage must raise, valid tables stay exact."""
    import struct as s

    import pytest

    from dabloomray.stages.codecs import encode_mp4, mp4_sample_ranges

    frames = [b"aa", b"bbb", b"c", b"dddd", b"ee"]
    blob = encode_mp4(frames, 4, 4, chunk_size=2)
    spans = mp4_sample_ranges(blob)
    assert [blob[o:o + n] for o, n in spans] == frames
    # corrupt the first stsc run to start at chunk 2
    stsc = blob.find(b"stsc")
    patched = bytearray(blob)
    patched[stsc + 12:stsc + 16] = s.pack(">I", 2)
    with pytest.raises(ValueError):
        mp4_sample_ranges(bytes(patched))


def test_review_r5_dims_hook_int32_overflow_falls_back():
    """A PNG whose IHDR claims width 2^31 passes the decoder's w > 0
    check (unsigned read, Python int) but used to WRAP to a negative
    int32 inside ImageDecode.  It must fall to the fake path now."""
    import struct as s
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = s.pack(">II5B", 2**31, 8, 8, 2, 0, 0, 0)

    def chunk(kind, data):
        return (s.pack(">I", len(data)) + kind + data
                + s.pack(">I", zlib.crc32(kind + data)))

    blob = sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "content": pa.array([blob], pa.binary())})
    dec = ImageDecode()(t)
    w = dec.column("width").to_pylist()[0]
    h = dec.column("height").to_pylist()[0]
    assert w > 0 and h > 0  # fake dims, never a wrapped negative
    assert 64 <= w <= 1280 + 64 and 64 <= h <= 960 + 64


def test_review_r5_webp_zero_dims_rejected():
    import struct as s

    import pytest

    from dabloomray.stages.codecs import webp_dims

    vp8 = (b"VP8 " + s.pack("<I", 10) + b"\x00\x00\x00\x9d\x01\x2a"
           + s.pack("<HH", 0, 0))
    body = b"WEBP" + vp8
    with pytest.raises(ValueError):
        webp_dims(b"RIFF" + s.pack("<I", len(body)) + body)


def test_review_r5_encode_png_bad_channels_raises_valueerror():
    import pytest

    from dabloomray.stages.codecs import encode_png

    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4, 5), np.uint8))


def test_png_adam7_and_16bit_roundtrip():
    """Round-5 extension: Adam7 interlace and 16-bit depth.  Adam7
    must be pixel-exact for any shape (incl. dims smaller than the
    8x8 pass grid); 16-bit reduces to the high byte (the spec's
    sample-depth scaling)."""
    from dabloomray.stages.codecs import decode_png, encode_png, png_dims

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (3, 2), (7, 9), (16, 16), (23, 31)]:
        for ch in (1, 2, 3, 4):
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            for ft in range(5):
                blob = encode_png(img, filter_type=ft, interlace=True)
                assert sniff(blob) == "png"
                assert np.array_equal(decode_png(blob), img), (h, w, ch, ft)
            img16 = rng.integers(0, 65536, (h, w, ch), dtype=np.uint16)
            for il in (False, True):
                blob = encode_png(img16, filter_type=4, interlace=il)
                assert png_dims(blob) == (h, w, ch)
                assert np.array_equal(decode_png(blob),
                                      (img16 >> 8).astype(np.uint8))
    # interlaced 8-bit rides ImageDecode's registry dims path
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    t = pa.table({"media_id": pa.array([0], pa.int64()),
                  "content": pa.array([encode_png(img, interlace=True)],
                                      pa.binary())})
    dec = ImageDecode()(t)
    assert (dec.column("height").to_pylist(),
            dec.column("width").to_pylist()) == ([6], [5])


def test_gif_animation_demux_and_frame_sample():
    """Round-5: animated-GIF demux — gif_frames re-wraps each frame as
    a standalone GIF that decode_gif reproduces exactly, and
    FrameSample samples evenly with SOURCE frame indices."""
    from dabloomray.stages.codecs import (
        decode_gif,
        encode_gif_animation,
        gif_frames,
    )

    rng = np.random.default_rng(5)
    frames = [np.full((5, 7, 3), v, np.uint8)
              for v in (10, 60, 110, 160, 210, 250)]
    frames[2] = (rng.integers(0, 4, (5, 7, 1)) * 60) \
        .astype(np.uint8).repeat(3, axis=2)
    blob = encode_gif_animation(frames)
    assert sniff(blob) == "gif"
    got = gif_frames(blob)
    assert len(got) == len(frames)
    for g, img in zip(got, frames):
        assert np.array_equal(decode_gif(g), img)
    # decode_gif on the animation returns the FIRST frame
    assert np.array_equal(decode_gif(blob), frames[0])
    t = pa.table({"media_id": pa.array([7], pa.int64()),
                  "content": pa.array([blob], pa.binary())})
    out = FrameSample(n_frames=3)(t)
    assert out.column("frame_idx").to_pylist() == [0, 2, 5]
    for f, fi in zip(out.column("frame").to_pylist(), [0, 2, 5]):
        assert np.array_equal(decode_gif(f), frames[fi])
    # truncated animation raises ValueError (falls back in stages)
    import pytest

    with pytest.raises(ValueError):
        gif_frames(blob[:len(blob) // 2] )


def test_review_r5b_adam7_huge_dims_raise_valueerror_not_memoryerror():
    """Second review pass: a corrupt interlaced PNG claiming ~2^32
    pixel dims reached np.zeros and raised MemoryError (uncaught by
    the malformed-blob harness).  The scanline-length check must run
    BEFORE the screen allocation."""
    import struct as s
    import zlib

    import pytest

    from dabloomray.stages.codecs import decode_png
    from dabloomray.stages.multimodal import _decode_image

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(kind, data):
        return (s.pack(">I", len(data)) + kind + data
                + s.pack(">I", zlib.crc32(kind + data)))

    ihdr = s.pack(">II5B", 3_000_000_000, 9, 8, 2, 0, 0, 1)
    blob = (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(blob)
    assert _decode_image(blob) is None  # harness-caught, task survives
