"""Multimodal stub stages: real Arrow/actor plumbing, deterministic
fake kernels (libs absent in this environment)."""

import numpy as np
import pyarrow as pa

from dabloomray.stages.multimodal import FrameSample, ImageDecode, ImageFeatures


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
