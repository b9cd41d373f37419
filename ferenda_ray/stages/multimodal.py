"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as Arrow ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages.  The decode kernels themselves are
STUBBED (no imaging/audio libraries in this container): `DecodeImage`
raises ``NotImplementedError`` unless given ``fake=True``, in which
case a deterministic fake decoder (seeded from the payload sha256)
produces stable pseudo-pixels — the Ray-side plumbing (schema, batch
size, actor signature, output layout) is real and tested.

Batch-size note (SURVEY.md "memory-aware"): binary payloads are wide —
callers should use a small ``batch_size`` (64–512) so
batch × concurrency fits the worker heap; blocks of multi-MB rows are
the case for raising ``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # nullable typed metadata
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def make_media_table(n: int = 8, kind: str = "image",
                     seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/bench."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{kind}:{i}".encode()).digest() * 64
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(64 if kind != "audio" else None)
        rows["height"].append(64 if kind != "audio" else None)
        rows["duration_ms"].append(None if kind == "image" else 1000 + i)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: payload → pixel tensor → mean-channel features.

    Real deployments plug a PIL/libvips decode into :meth:`_decode`;
    this container has neither, so ``fake=True`` derives a
    deterministic 8×8×3 uint8 array from the payload hash, and
    ``fake=False`` raises ``NotImplementedError`` (clearly-marked stub).
    """

    def __init__(self, fake: bool = False, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/libvips (not in this container); "
                "pass fake=True for the deterministic test decoder")
        h = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        return rng.integers(0, 256, (self.thumb, self.thumb, 3),
                            dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload in batch.column("payload").to_pylist():
            try:
                px = self._decode(payload)
                feats.append([round(float(px[..., c].mean()), 4)
                              for c in range(3)])
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append(None)
                ok.append(False)
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.array(feats, pa.list_(pa.float64())),
            "decoded": pa.array(ok, pa.bool_()),
        })


class SampleFrames:
    """Actor-pool stage: video payload → N deterministic frame offsets
    (the frame-sampling layout; decode of each frame is the same stub)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offs = [], []
        for mid, dur in zip(batch.column("media_id").to_pylist(),
                            batch.column("duration_ms").to_pylist()):
            dur = dur or 0
            for f in range(self.n_frames):
                ids.append(mid)
                offs.append(int(dur * (f + 0.5) / self.n_frames))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_ms": pa.array(offs, pa.int64())})


def decode_images(media, fake: bool = False, concurrency=(1, 4),
                  batch_size: int = 128):
    """Attach the image-decode actor pool (small batch: wide rows)."""
    return media.map_batches(
        DecodeImage, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(media, n_frames: int = 4, concurrency=(1, 4)):
    return media.map_batches(
        SampleFrames, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=128, concurrency=concurrency)
