"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as Arrow ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages.  Decode is REAL for the formats the
stdlib can handle — PNG / BMP / netpbm / GIF and WAV PCM via
:mod:`ferenda_ray.functions.codecs`, baseline JPEG via
:mod:`ferenda_ray.functions.jpeg`, and MJPEG-in-AVI video via
:mod:`ferenda_ray.functions.avi` (:class:`SampleAviFrames`) — while
other video containers/codecs stay honestly stubbed (ffmpeg absent):
an unsupported format raises ``NotImplementedError`` unless
``fake=True`` supplies the deterministic pseudo-decoder.

Batch-size note (SURVEY.md "memory-aware"): binary payloads are wide —
callers should use a small ``batch_size`` (64–512) so
batch × concurrency fits the worker heap; blocks of multi-MB rows are
the case for raising ``DataContext.target_max_block_size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ferenda_ray.functions import codecs

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
    """Deterministic REAL media rows for tests/bench: images are
    actual PNGs (seeded pixels), audio rows actual PCM WAVs (seeded
    sine + noise); video payloads stay opaque (no free codec)."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        rng = np.random.default_rng(seed * 1000 + i)
        if kind == "image":
            px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            payload = codecs.encode_png(px)
            w = h = 16
            dur = None
        elif kind == "audio":
            dur = 1000 + i
            rate = 8000
            t = np.arange(int(rate * dur / 1000)) / rate
            sig = (0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t)
                   + 0.05 * rng.standard_normal(len(t)))
            payload = codecs.encode_wav(sig, rate)
            w = h = None
        else:  # video: opaque payload, stub decode
            payload = hashlib.sha256(f"{seed}:{kind}:{i}".encode()
                                     ).digest() * 64
            w = h = 64
            dur = 1000 + i
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool stage: payload → pixels → channel-mean features +
    dimensions.  PNG/BMP/netpbm decode natively; other formats raise
    ``NotImplementedError`` unless ``fake=True`` (deterministic
    pseudo-pixels seeded from the payload hash).  Corrupt payloads of
    a KNOWN format become per-row error rows (poison-pill isolation).
    """

    def __init__(self, fake: bool = False, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb

    def _decode(self, payload: bytes) -> np.ndarray:
        kind = codecs.sniff_media(payload)
        if kind in ("png", "bmp", "ppm", "gif", "jpeg"):
            return codecs.decode_image(payload)
        if self.fake:
            h = hashlib.sha256(payload).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
            return rng.integers(0, 256, (self.thumb, self.thumb, 3),
                                dtype=np.uint8)
        raise NotImplementedError(
            "%s decode requires external libraries (PNG/BMP/netpbm/"
            "GIF/baseline-JPEG decode natively); pass fake=True for "
            "the deterministic test decoder" % kind)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok, ws, hs, errs = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                px = self._decode(payload)
                feats.append([round(float(px[..., c].mean()), 4)
                              for c in range(3)])
                ws.append(px.shape[1])
                hs.append(px.shape[0])
                ok.append(True)
                errs.append(None)
            except NotImplementedError:
                raise
            except Exception as e:
                feats.append(None)
                ws.append(None)
                hs.append(None)
                ok.append(False)
                errs.append(str(e))
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.array(feats, pa.list_(pa.float64())),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "decoded": pa.array(ok, pa.bool_()),
            "error": pa.array(errs, pa.string()),
        })


class DecodeAudio:
    """Actor-pool stage: WAV payload → DSP features (RMS, zero-crossing
    rate, spectral centroid, duration) — real numpy kernels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": batch.column("media_id").to_pylist(),
               "duration_ms": [], "rms": [], "zcr": [],
               "spectral_centroid_hz": [], "decoded": [], "error": []}
        for payload in batch.column("payload").to_pylist():
            try:
                x, rate = codecs.decode_wav(payload)
                f = codecs.audio_features(x, rate)
                for k in ("duration_ms", "rms", "zcr",
                          "spectral_centroid_hz"):
                    out[k].append(f[k])
                out["decoded"].append(True)
                out["error"].append(None)
            except Exception as e:
                for k in ("duration_ms", "rms", "zcr",
                          "spectral_centroid_hz"):
                    out[k].append(None)
                out["decoded"].append(False)
                out["error"].append(str(e))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "duration_ms": pa.array(out["duration_ms"], pa.int64()),
            "rms": pa.array(out["rms"], pa.float64()),
            "zcr": pa.array(out["zcr"], pa.float64()),
            "spectral_centroid_hz": pa.array(out["spectral_centroid_hz"],
                                             pa.float64()),
            "decoded": pa.array(out["decoded"], pa.bool_()),
            "error": pa.array(out["error"], pa.string()),
        })


class Thumbnail:
    """Actor-pool stage: image payload → nearest-neighbor thumbnail,
    re-encoded as PNG (decode → resize → encode, all native)."""

    def __init__(self, size: int = 8):
        self.size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs, errs = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            ids.append(mid)
            try:
                px = codecs.decode_image(payload)
                small = codecs.resize_nearest(px, self.size, self.size)
                thumbs.append(codecs.encode_png(np.ascontiguousarray(small)))
                errs.append(None)
            except Exception as e:
                thumbs.append(None)
                errs.append(str(e))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "thumb_png": pa.array(thumbs, pa.large_binary()),
                         "error": pa.array(errs, pa.string())})


class SampleFrames:
    """Actor-pool stage: video payload → N deterministic frame offsets
    (the frame-sampling layout; per-frame decode needs ffmpeg → stub)."""

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


def decode_audio(media, concurrency=(1, 4), batch_size: int = 64):
    return media.map_batches(
        DecodeAudio, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def thumbnails(media, size: int = 8, concurrency=(1, 4),
               batch_size: int = 64):
    return media.map_batches(
        Thumbnail, fn_constructor_kwargs={"size": size},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(media, n_frames: int = 4, concurrency=(1, 4)):
    return media.map_batches(
        SampleFrames, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=128, concurrency=concurrency)


class SampleGifFrames:
    """Actor-pool stage: animated-GIF payload → N sampled frames,
    REALLY decoded (the engine's pure-stdlib GIF codec) — the
    non-stub frame-sampling path.  Emits one row per sampled frame
    with its timestamp and mean-RGB features; other container formats
    still need ffmpeg and go through the :class:`SampleFrames` offset
    stub."""

    def __init__(self, n_frames: int = 4):
        from ferenda_ray.functions.codecs import decode_gif
        self.n_frames = n_frames
        self.decode_gif = decode_gif

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        ids, fidx, ts, means, errs = [], [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                frames = self.decode_gif(bytes(payload))
            except Exception as e:
                ids.append(mid)
                fidx.append(-1)
                ts.append(-1)
                means.append(None)
                errs.append(f"{type(e).__name__}: {e}")
                continue
            n = len(frames)
            picks = sorted({min(n - 1, (i * n) // self.n_frames)
                            for i in range(self.n_frames)})
            t = 0
            starts = []
            for f in frames:
                starts.append(t)
                t += f["delay_ms"]
            for i in picks:
                ids.append(mid)
                fidx.append(i)
                ts.append(starts[i])
                means.append(float(np.mean(frames[i]["px"])))
                errs.append(None)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "frame_ms": pa.array(ts, pa.int64()),
            "mean_rgb": pa.array(means, pa.float64()),
            "error": pa.array(errs, pa.string())})


def sample_gif_frames(media, n_frames: int = 4, concurrency=(1, 4),
                      batch_size: int = 64):
    return media.map_batches(
        SampleGifFrames, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class SampleAviFrames:
    """Actor-pool stage: MJPEG-in-AVI payload → N sampled frames,
    REALLY decoded (pure-stdlib RIFF walker +
    :mod:`ferenda_ray.functions.jpeg`) — same row contract as
    :class:`SampleGifFrames` (frame_idx/frame_ms/mean_rgb, errors as
    rows).  Other containers/codecs still need ffmpeg and go through
    the :class:`SampleFrames` offset stub."""

    def __init__(self, n_frames: int = 4):
        from ferenda_ray.functions.avi import decode_avi_mjpeg
        self.n_frames = n_frames
        self.decode = decode_avi_mjpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, ts, means, errs = [], [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                frames = self.decode(bytes(payload))
            except Exception as e:
                ids.append(mid)
                fidx.append(-1)
                ts.append(-1)
                means.append(None)
                errs.append(f"{type(e).__name__}: {e}")
                continue
            n = len(frames)
            picks = sorted({min(n - 1, (i * n) // self.n_frames)
                            for i in range(self.n_frames)})
            for i in picks:
                ids.append(mid)
                fidx.append(i)
                ts.append(frames[i]["t_ms"])
                means.append(float(np.mean(frames[i]["px"])))
                errs.append(None)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "frame_ms": pa.array(ts, pa.int64()),
            "mean_rgb": pa.array(means, pa.float64()),
            "error": pa.array(errs, pa.string())})


def sample_avi_frames(media, n_frames: int = 4, concurrency=(1, 4),
                      batch_size: int = 64):
    return media.map_batches(
        SampleAviFrames, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class ImagePHash:
    """Actor-pool stage: image payload → 64-bit perceptual hash
    (``codecs.phash64``) — the multimodal analogue of the SimHash
    text sketch; pairs come from the shared banded-Hamming kernel
    (``dedup.hamming_pairs64``).  Undecodable rows are dropped from
    the hash table (they carry no visual content to match)."""

    def __init__(self, fake: bool = False):
        self._decode = DecodeImage(fake=fake)._decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                px = self._decode(payload)
            except NotImplementedError:
                raise
            except Exception:
                continue
            ids.append(mid)
            hashes.append(codecs.phash64(px))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "phash": pa.array(hashes, pa.uint64())})


def image_phashes(media, fake: bool = False, concurrency=(1, 4),
                  batch_size: int = 64):
    return media.map_batches(ImagePHash, fn_constructor_kwargs={
        "fake": fake}, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def phash_pairs(media, max_hamming: int = 6, fake: bool = False,
                concurrency=(1, 4)):
    """Near-duplicate IMAGE pairs: perceptual hash per image (actor
    pool), then the exact-recall banded Hamming join — re-encoded,
    brightness-shifted or lightly edited copies collide within a few
    bits while distinct images stay far apart."""
    from ferenda_ray.stages.dedup import hamming_pairs64
    return hamming_pairs64(
        image_phashes(media, fake=fake, concurrency=concurrency),
        hash_col="phash", id_col="media_id", max_hamming=max_hamming)


class AudioFingerprint:
    """Actor-pool stage: WAV payload → 64-bit band-energy fingerprint
    (``codecs.audio_fingerprint64``) — the audio analogue of
    ``ImagePHash``; undecodable rows are dropped."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                x, rate = codecs.decode_wav(payload)
            except Exception:
                continue
            ids.append(mid)
            hashes.append(codecs.audio_fingerprint64(x, rate))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "afp": pa.array(hashes, pa.uint64())})


def audio_fingerprints(media, concurrency=(1, 4), batch_size: int = 64):
    return media.map_batches(AudioFingerprint, batch_format="pyarrow",
                             batch_size=batch_size,
                             concurrency=concurrency)


def audio_neardup_pairs(media, max_hamming: int = 6,
                        concurrency=(1, 4)):
    """Near-duplicate AUDIO pairs: re-noised / gain-shifted copies of
    the same signal collide within a few bits through the shared
    banded-Hamming kernel; distinct content stays far."""
    from ferenda_ray.stages.dedup import hamming_pairs64
    return hamming_pairs64(
        audio_fingerprints(media, concurrency=concurrency),
        hash_col="afp", id_col="media_id", max_hamming=max_hamming)


class VideoFramePHash:
    """Actor-pool stage: animated-GIF / MJPEG-AVI payload → one
    perceptual hash per sampled frame (``codecs.phash64`` over really
    decoded pixels).  Feeds :func:`video_neardup_pairs`."""

    def __init__(self, n_frames: int = 4):
        from ferenda_ray.functions.avi import decode_avi_mjpeg
        self.n_frames = n_frames
        self._avi = decode_avi_mjpeg

    def _frames(self, payload: bytes):
        kind = codecs.sniff_media(payload)
        if kind == "gif":
            return [f["px"] for f in codecs.decode_gif(payload)]
        return [f["px"] for f in self._avi(payload)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, hashes = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            try:
                frames = self._frames(bytes(payload))
            except Exception:
                continue
            n = len(frames)
            picks = sorted({min(n - 1, (i * n) // self.n_frames)
                            for i in range(self.n_frames)})
            for i in picks:
                ids.append(mid)
                fidx.append(i)
                hashes.append(codecs.phash64(np.asarray(frames[i])))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int64()),
                         "phash": pa.array(hashes, pa.uint64())})


def video_neardup_pairs(media, max_hamming: int = 6, n_frames: int = 4,
                        concurrency=(1, 4)):
    """Near-duplicate VIDEO pairs: perceptual-hash each sampled frame,
    run the banded-Hamming join over the frame hashes, then collapse
    frame matches to video pairs (min frame distance, distinct
    videos).  Re-encoded or brightness-shifted copies of a clip
    collide on every sampled frame; unrelated clips share none."""
    from ray.data.aggregate import Min as _Min

    from ferenda_ray.stages.dedup import hamming_pairs64

    fh = media.map_batches(
        VideoFramePHash, fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=64, concurrency=concurrency)
    # composite key: (video, frame) — videos small per frame count
    FRAMES_PER_VIDEO = 1 << 20

    def pack(b: pa.Table) -> pa.Table:
        vid = b.column("media_id").to_numpy()
        fi = b.column("frame_idx").to_numpy()
        return pa.table({
            "fid": pa.array(vid * FRAMES_PER_VIDEO + fi, pa.int64()),
            "phash": b.column("phash")})

    pairs = hamming_pairs64(
        fh.map_batches(pack, batch_format="pyarrow"),
        hash_col="phash", id_col="fid", max_hamming=max_hamming)

    def to_videos(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy() // FRAMES_PER_VIDEO
        c = b.column("id_b").to_numpy() // FRAMES_PER_VIDEO
        lo = np.minimum(a, c)
        hi = np.maximum(a, c)
        keep = lo != hi
        return pa.table({"id_a": pa.array(lo[keep], pa.int64()),
                         "id_b": pa.array(hi[keep], pa.int64()),
                         "hamming": b.column("hamming").filter(
                             pa.array(keep))})

    return (pairs.map_batches(to_videos, batch_format="pyarrow")
            .groupby(["id_a", "id_b"])
            .aggregate(_Min("hamming", alias_name="hamming")))
