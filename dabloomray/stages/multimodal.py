"""Multimodal (image/audio/video) stages — Ray-side plumbing is real,
decode kernels are STUBBED.

Media rides as opaque ``binary`` columns with typed metadata, processed
by actor-pool ``map_batches`` stages with small batch sizes (large
payloads: size batch_size so batch x concurrency fits worker heap).
The decode libraries (PIL/torchaudio/ffmpeg) are NOT in this
environment, so each kernel either uses the real library if importable
or falls back to a DETERMINISTIC FAKE (pure function of the bytes) that
preserves schema, determinism and batch shape — swap ``_fake_*`` for
real decoders when the libs exist.  Fakes are marked loudly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import murmur3_x64_128_batch

IMAGE_META_SCHEMA = [
    ("height", pa.int32()),
    ("width", pa.int32()),
    ("n_channels", pa.int32()),
]


def _fake_dims(blobs) -> tuple[np.ndarray, np.ndarray]:
    """DETERMINISTIC FAKE: pretend dims derived from a content hash."""
    h1, h2 = murmur3_x64_128_batch(blobs, seed=99)
    height = (h1 % np.uint64(960) + np.uint64(64)).astype(np.int32)
    width = (h2 % np.uint64(1280) + np.uint64(64)).astype(np.int32)
    return height, width


class ImageDecode:
    """binary → (height, width, n_channels).  Real path: PIL; fake
    path: content-hash dims (see module docstring)."""

    def __init__(self, content_col: str = "content"):
        self.content_col = content_col
        try:
            from PIL import Image  # noqa: F401

            self.pil = Image
        except ImportError:
            self.pil = None  # STUB MODE

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.content_col)
        if self.pil is not None:  # pragma: no cover - lib absent here
            import io

            dims = [self.pil.open(io.BytesIO(b.as_py())).size
                    for b in blobs]
            width = np.array([d[0] for d in dims], np.int32)
            height = np.array([d[1] for d in dims], np.int32)
        else:
            height, width = _fake_dims(blobs)
        batch = batch.append_column("height", pa.array(height, pa.int32()))
        batch = batch.append_column("width", pa.array(width, pa.int32()))
        return batch.append_column(
            "n_channels", pa.array(np.full(len(batch), 3, np.int32)))


class ImageFeatures:
    """binary → embedding list<float32> (model inference slot).

    Real path would load a vision model ONCE in __init__ and run
    batched inference in __call__; here the model is a DETERMINISTIC
    FAKE (hash-seeded vector) with the same schema/actor lifecycle."""

    def __init__(self, content_col: str = "content", dim: int = 16):
        self.content_col = content_col
        self.dim = dim
        # real: self.model = load_model(...)  (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fixtures import splitmix64

        h1, _ = murmur3_x64_128_batch(batch.column(self.content_col), seed=5)
        idx = (h1[:, None] * np.uint64(31)
               + np.arange(self.dim, dtype=np.uint64)[None, :])
        with np.errstate(over="ignore"):
            vals = splitmix64(17, idx.ravel()).astype(np.float64) / 2.0 ** 64
        feats = vals.reshape(len(batch), self.dim).astype(np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim)
        return batch.append_column("features", col)


class FrameSample:
    """video binary → flat table of sampled frame rows
    (media_id, frame_idx, frame: binary).  Fan-out stage: one input row
    becomes ``n_frames`` output rows — schema plumbing for a real
    ffmpeg-based sampler (STUB: frames are hash-sliced byte windows)."""

    def __init__(self, id_col: str = "media_id",
                 content_col: str = "content", n_frames: int = 4):
        self.id_col = id_col
        self.content_col = content_col
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        blobs = batch.column(self.content_col).to_pylist()
        out_ids, out_idx, frames = [], [], []
        for mid, blob in zip(ids, blobs):
            blob = blob or b""
            step = max(1, len(blob) // self.n_frames)
            for f in range(self.n_frames):
                out_ids.append(int(mid))
                out_idx.append(f)
                frames.append(blob[f * step : f * step + step])
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })
