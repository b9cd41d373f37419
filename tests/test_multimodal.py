"""Multimodal: real PNG/BMP/netpbm/WAV codecs + actor stages; only
JPEG/video decode remains a (tested) honest stub."""

import os

import numpy as np
import pyarrow as pa
import pytest

from ferenda_ray.functions import codecs
from ferenda_ray.stages import multimodal as mm


def test_media_table_schema():
    t = mm.make_media_table(5, "image")
    assert t.schema.equals(mm.MEDIA_SCHEMA)
    assert t.num_rows == 5
    # deterministic payloads
    t2 = mm.make_media_table(5, "image")
    assert t.column("payload").to_pylist() == t2.column("payload").to_pylist()
    # ...and they are REAL PNGs
    assert all(codecs.sniff_media(p) == "png"
               for p in t.column("payload").to_pylist())


def test_decode_stub_raises_without_fake():
    # video payloads are an unsupported format → honest stub
    d = mm.DecodeImage(fake=False)
    with pytest.raises(NotImplementedError):
        d(mm.make_media_table(1, "video"))


def test_png_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(px)) == px).all()


def test_bmp_and_ppm_decode():
    import struct
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # hand-built 24-bit BMP (bottom-up, 4-byte row padding)
    stride = (3 * 3 + 3) & ~3
    body = b"".join(
        bytes(px[y, x, ::-1]) for y in (1, 0) for x in range(3))
    rows = []
    for y in (1, 0):
        row = b"".join(bytes(px[y, x, ::-1]) for x in range(3))
        rows.append(row + b"\x00" * (stride - len(row)))
    data = b"".join(rows)
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
           + struct.pack("<IiihHIIiiII", 40, 3, 2, 1, 24, 0,
                         len(data), 0, 0, 0, 0))
    assert (codecs.decode_bmp(hdr + data) == px).all()
    ppm = b"P6 3 2 255\n" + px.tobytes()
    assert (codecs.decode_ppm(ppm) == px).all()


def test_wav_features():
    rate = 8000
    t = np.arange(rate) / rate  # 1 s
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    x, r = codecs.decode_wav(codecs.encode_wav(sig, rate))
    assert r == rate and abs(len(x) - rate) < 2
    f = codecs.audio_features(x, r)
    assert f["duration_ms"] == 1000
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 0.01
    # a 440 Hz tone's centroid sits near 440
    assert 400 < f["spectral_centroid_hz"] < 500


def test_reference_png_fixtures_decode():
    path = ("/root/reference/test/files/pdfreader/intermediate/"
            "sample001.png")
    if not os.path.exists(path):
        pytest.skip("reference fixtures absent")
    px = codecs.decode_image(open(path, "rb").read())
    assert px.ndim == 3 and px.shape[2] == 3 and px.shape[0] > 100


def test_audio_pipeline(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.make_media_table(4, "audio"))
    out = {r["media_id"]: r for r in mm.decode_audio(ds).take_all()}
    assert len(out) == 4
    for i, r in out.items():
        assert r["decoded"] and r["duration_ms"] == 1000 + i
        assert 0.2 < r["rms"] < 0.6
        # per-row seeded tones: 220 + 20*i Hz dominates the centroid
        assert abs(r["spectral_centroid_hz"] - (220 + 20 * i)) < 150


def test_thumbnail_pipeline(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.make_media_table(3, "image"))
    rows = mm.thumbnails(ds, size=4).take_all()
    assert len(rows) == 3 and not any(r["error"] for r in rows)
    for r in rows:
        px = codecs.decode_png(r["thumb_png"])
        assert px.shape == (4, 4, 3)


def test_fake_decode_pipeline(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.make_media_table(6, "image"))
    out = {r["media_id"]: r for r in
           mm.decode_images(ds, fake=True).take_all()}
    assert len(out) == 6
    for r in out.values():
        assert r["decoded"] and len(r["features"]) == 3
        assert all(0 <= f <= 255 for f in r["features"])
    # determinism across runs
    out2 = {r["media_id"]: r["features"] for r in
            mm.decode_images(rd.from_arrow(mm.make_media_table(6, "image")),
                             fake=True).take_all()}
    assert {k: v["features"] for k, v in out.items()} == out2


def test_sample_frames(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(mm.make_media_table(3, "video"))
    rows = mm.sample_frames(ds, n_frames=4).take_all()
    assert len(rows) == 12
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ms"])
    for mid, offs in by_id.items():
        assert sorted(offs) == offs and len(offs) == 4
        assert all(0 <= o <= 1000 + mid for o in offs)


def test_gif_roundtrip_and_frame_sampling(ray_session):
    import numpy as np
    import ray.data as rd
    from ferenda_ray.functions.codecs import (decode_gif, decode_image,
                                              encode_gif, sniff_media)
    from ferenda_ray.stages.multimodal import sample_gif_frames
    f = [np.full((4, 6, 3), c, np.uint8)
         for c in (10, 80, 160, 240)]
    gif = encode_gif(f, [40, 40, 40, 40])
    assert sniff_media(gif) == "gif"
    frames = decode_gif(gif)
    assert len(frames) == 4
    assert all((frames[i]["px"] == f[i]).all() for i in range(4))
    assert [fr["delay_ms"] for fr in frames] == [40] * 4
    # decode_image returns the first frame
    assert (decode_image(gif) == f[0]).all()
    # distributed REAL frame sampling: 2 of 4 frames, actual pixels
    media = rd.from_arrow(pa.table({
        "media_id": [7], "payload": pa.array([gif], pa.large_binary())}))
    out = sample_gif_frames(media, n_frames=2).to_pandas()
    assert out["frame_idx"].tolist() == [0, 2]
    assert out["frame_ms"].tolist() == [0, 80]
    assert out["mean_rgb"].tolist() == [10.0, 160.0]
    assert out["error"].isna().all()


def test_gif_interlace_and_transparency():
    import numpy as np
    from ferenda_ray.functions.codecs import decode_gif, encode_gif
    # hand-mangle: re-encode then decode a single frame under a
    # transparent overlay — frame 2 only overwrites where not
    # transparent.  encode_gif writes no transparency, so exercise
    # the decoder's transparent path with a crafted GCE.
    f1 = np.zeros((2, 2, 3), np.uint8)
    gif = bytearray(encode_gif([f1, f1], [10, 10]))
    # set the SECOND frame's GCE transparency flag + index 0
    # (find the second 0x21 0xF9 occurrence)
    i = gif.index(b"\x21\xf9", gif.index(b"\x21\xf9") + 2)
    gif[i + 3] |= 1            # flags: transparent color flag
    gif[i + 6] = 0             # transparent index = palette 0
    frames = decode_gif(bytes(gif))
    assert (frames[1]["px"] == frames[0]["px"]).all()


def test_jpeg_roundtrip():
    import numpy as np
    from ferenda_ray.functions.codecs import decode_image, sniff_media
    from ferenda_ray.functions.jpeg import (JpegError, decode_jpeg,
                                            encode_jpeg)
    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([(xx * 255 / w), (yy * 255 / h),
                   ((xx + yy) * 255 / (h + w))], axis=-1) \
        .astype(np.uint8)
    jp = encode_jpeg(px, quality=90)
    assert sniff_media(jp) == "jpeg"
    out = decode_jpeg(jp)
    mse = np.mean((out.astype(float) - px.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 40          # near-lossless
    # decode_image routes jpeg natively now
    assert decode_image(jp).shape == (h, w, 3)
    # grayscale path + hard edges at high quality
    g = (yy * 255 / h).astype(np.uint8)
    go = decode_jpeg(encode_jpeg(g, quality=85))
    assert go.shape == (h, w)
    assert np.abs(go.astype(int) - g.astype(int)).max() <= 4
    e = np.zeros((16, 16, 3), np.uint8)
    e[:, 8:] = 255
    assert (decode_jpeg(encode_jpeg(e, quality=95)) == e).all()
    # non-baseline is an honest error, not silent garbage
    prog = bytearray(encode_jpeg(px))
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2           # fake SOF2
    with pytest.raises(JpegError):
        decode_jpeg(bytes(prog))


def test_jpeg_420_subsampling():
    import numpy as np
    from ferenda_ray.functions.jpeg import decode_jpeg, encode_jpeg
    h, w = 33, 41            # odd dims exercise MCU padding + crop
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([(xx * 255 / w), (yy * 255 / h),
                   ((xx + yy) * 255 / (h + w))], axis=-1) \
        .astype(np.uint8)
    jp444 = encode_jpeg(px, quality=90, subsample="444")
    jp420 = encode_jpeg(px, quality=90, subsample="420")
    assert len(jp420) < len(jp444)         # chroma really subsampled
    out = decode_jpeg(jp420)
    assert out.shape == (h, w, 3)
    mse = np.mean((out.astype(float) - px.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 35


def test_avi_mjpeg_roundtrip():
    import numpy as np
    from ferenda_ray.functions.avi import (AviError, decode_avi_mjpeg,
                                           encode_avi_mjpeg)
    frames = []
    for i in range(5):
        f = np.zeros((16, 24, 3), np.uint8)
        f[..., 0] = 40 * i + 20
        f[..., 1] = 128
        f[..., 2] = 255 - 40 * i
        frames.append(f)
    avi = encode_avi_mjpeg(frames, fps=8)
    out = decode_avi_mjpeg(avi)
    assert len(out) == 5
    # timestamps from strh scale/rate: 125 ms per frame at 8 fps
    assert [f["t_ms"] for f in out] == [0, 125, 250, 375, 500]
    for i, f in enumerate(out):
        assert f["px"].shape == (16, 24, 3)
        err = np.abs(f["px"].astype(float)
                     - frames[i].astype(float)).mean()
        assert err < 6            # JPEG-lossy but pixel-verified
    import pytest as _pytest
    with _pytest.raises(AviError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")


def test_sample_avi_frames_distributed(ray_session):
    """End-to-end MJPEG-AVI frame sampling through the actor-pool
    stage: synthetic fixture -> decoded pixels + timestamps, same row
    contract as the GIF sampler; undecodable payloads become error
    rows, not task failures."""
    import numpy as np
    import ray.data as rd
    from ferenda_ray.functions.avi import encode_avi_mjpeg
    from ferenda_ray.stages.multimodal import sample_avi_frames
    frames = [np.full((8, 8, 3), c, np.uint8)
              for c in (10, 80, 160, 240)]
    avi = encode_avi_mjpeg(frames, fps=25)
    media = rd.from_arrow(pa.table({
        "media_id": [3, 4],
        "payload": pa.array([avi, b"not an avi"], pa.large_binary())}))
    out = sample_avi_frames(media, n_frames=2).to_pandas()
    out = out.sort_values(["media_id", "frame_idx"])
    ok = out[out["media_id"] == 3]
    assert ok["frame_idx"].tolist() == [0, 2]
    assert ok["frame_ms"].tolist() == [0, 80]          # 40 ms/frame
    # flat frames survive JPEG within ~1 grey level
    assert np.allclose(ok["mean_rgb"].tolist(), [10.0, 160.0], atol=2)
    bad = out[out["media_id"] == 4]
    assert bad["frame_idx"].tolist() == [-1]
    assert bad["error"].notna().all()


def test_phash_near_dup_images(ray_session):
    # corpus: 6 distinct images + a brightness-shifted copy of image 0
    # and a PNG re-encode of image 3 — exactly those two pairs collide
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.functions import codecs
    from ferenda_ray.stages import multimodal as mm

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(6)]
    shifted = np.clip(imgs[0].astype(np.int16) + 10, 0,
                      255).astype(np.uint8)
    payloads = [codecs.encode_png(p) for p in imgs]
    payloads.append(codecs.encode_png(shifted))        # id 6 ~ id 0
    payloads.append(codecs.encode_png(imgs[3]))        # id 7 == id 3
    tbl = pa.table({"media_id": list(range(8)),
                    "payload": pa.array(payloads, pa.binary())})
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in mm.phash_pairs(
                 rd.from_arrow(tbl).repartition(3),
                 max_hamming=6).take_all()}
    assert set(pairs) == {(0, 6), (3, 7)}
    assert pairs[(3, 7)] == 0 and pairs[(0, 6)] <= 6


def test_phash_undecodable_rows_dropped(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.functions import codecs
    from ferenda_ray.stages import multimodal as mm
    import numpy as np
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    tbl = pa.table({
        "media_id": [1, 2],
        "payload": pa.array([codecs.encode_png(px),
                             b"\x89PNG\r\n\x1a\ncorrupt"], pa.binary())})
    got = mm.image_phashes(rd.from_arrow(tbl)).take_all()
    assert [r["media_id"] for r in got] == [1]


def test_audio_neardup_pairs(ray_session):
    # 4 distinct signals + a re-noised copy of signal 0 and a
    # gain-shifted copy of signal 2: exactly those two pairs collide
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.functions import codecs
    from ferenda_ray.stages import multimodal as mm

    rate = 8000
    t = np.arange(rate) / rate
    rng = np.random.default_rng(4)
    sigs = [0.5 * np.sin(2 * np.pi * f * t)
            + 0.1 * np.sin(2 * np.pi * 3.1 * f * t)
            for f in (220, 330, 495, 742)]
    payloads = [codecs.encode_wav(s + 0.02 * rng.standard_normal(len(t)),
                                  rate) for s in sigs]
    payloads.append(codecs.encode_wav(
        sigs[0] + 0.02 * rng.standard_normal(len(t)), rate))   # 4 ~ 0
    payloads.append(codecs.encode_wav(
        0.7 * sigs[2] + 0.02 * rng.standard_normal(len(t)), rate))  # 5 ~ 2
    tbl = pa.table({"media_id": list(range(6)),
                    "payload": pa.array(payloads, pa.binary())})
    pairs = {(r["id_a"], r["id_b"]) for r in mm.audio_neardup_pairs(
        rd.from_arrow(tbl).repartition(2), max_hamming=6).take_all()}
    assert pairs == {(0, 4), (2, 5)}


def test_video_neardup_pairs_gif(ray_session):
    # two copies of the same animated GIF (one brightness-shifted) +
    # one unrelated clip: only the copy pair collides, on every frame
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.functions import codecs
    from ferenda_ray.stages import multimodal as mm

    rng = np.random.default_rng(12)
    # spectrum-rich frames from a small gray palette (GIF caps at 256
    # colors); the copy is brightness-shifted within the same palette
    palette = np.arange(0, 240, 16, dtype=np.uint8)
    base = [np.repeat(rng.choice(palette, (24, 24))[..., None],
                      3, axis=2) for _ in range(4)]
    shifted = [np.clip(f.astype(np.int16) + 8, 0, 255).astype(np.uint8)
               for f in base]
    other = [np.repeat(rng.choice(palette, (24, 24))[..., None],
                       3, axis=2) for _ in range(4)]
    payloads = [codecs.encode_gif(base), codecs.encode_gif(shifted),
                codecs.encode_gif(other)]
    tbl = pa.table({"media_id": [0, 1, 2],
                    "payload": pa.array(payloads, pa.binary())})
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in mm.video_neardup_pairs(
                 rd.from_arrow(tbl), max_hamming=6).take_all()}
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] <= 6
