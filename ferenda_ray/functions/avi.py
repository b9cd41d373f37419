"""Pure-stdlib MJPEG-in-AVI container codec.

Closes the last multimodal stub (round-3 verdict #4): video frame
sampling used to emit only offsets because ffmpeg is absent, but an
AVI carrying Motion-JPEG needs no codec library — the container is a
RIFF chunk tree and every ``00dc`` chunk in the ``movi`` list is a
standalone baseline JPEG that :func:`ferenda_ray.functions.jpeg.
decode_jpeg` already handles.

Layout written/accepted (the minimal OpenDML-free AVI 1.0 shape):

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>  — dwMicroSecPerFrame, dwTotalFrames, dwStreams=1,
                       dwWidth/dwHeight (+ flags/reserved zeroed)
        LIST <sz> 'strl'
          'strh' <56> — fccType 'vids', handler 'MJPG', scale/rate
          'strf' <40> — BITMAPINFOHEADER, biCompression 'MJPG'
      LIST <sz> 'movi'
        '00dc' <len> <jpeg bytes>   (word-aligned)
        ...
      'idx1' — optional; ignored on read

Only structural fields the sampler needs are interpreted; everything
else is carried opaquely.  No reference counterpart exists (the
reference has no media pipeline).
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    pass


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: float = 10.0,
                     quality: int = 85) -> bytes:
    """uint8 RGB/grayscale frames (equal shapes) → MJPEG AVI bytes."""
    from ferenda_ray.functions.jpeg import encode_jpeg
    if not frames:
        raise AviError("no frames")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    uspf = int(round(1_000_000 / fps))
    avih = struct.pack("<14I", uspf, 0, 0, 0, len(frames), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    # scale/rate: frame duration = scale/rate seconds
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIiI4H",
                          0, 0, 0, 0,          # flags/prio/lang/init
                          uspf, 1_000_000,     # scale / rate
                          0, len(frames), 0,   # start/length/bufsize
                          -1, 0,               # quality/samplesize
                          0, 0, w, h))         # rcFrame
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p)
                                   for p in payloads))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, list_subtype|None, body_start, body_end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError("truncated chunk")
        if fourcc == b"LIST":
            yield fourcc, data[body:body + 4], body + 4, body + size
        else:
            yield fourcc, None, body, body + size
        pos = body + size + (size & 1)   # word alignment


def decode_avi_mjpeg(payload: bytes) -> list[dict]:
    """MJPEG AVI bytes → ``[{"px": ndarray, "t_ms": int}, ...]``.

    Frame timestamps come from ``strh`` scale/rate (falling back to
    ``avih`` dwMicroSecPerFrame); each ``00dc``/``00db`` chunk decodes
    through the engine's baseline-JPEG decoder."""
    from ferenda_ray.functions.jpeg import decode_jpeg
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not an AVI (RIFF/AVI header missing)")
    uspf = None
    scale = rate = None
    jpegs: list[bytes] = []

    def visit(start: int, end: int, in_strl: bool) -> None:
        nonlocal uspf, scale, rate
        for fourcc, sub, b0, b1 in _walk(payload, start, end):
            if fourcc == b"LIST":
                if sub in (b"hdrl", b"movi", b"strl", b"rec "):
                    visit(b0, b1, sub == b"strl")
            elif fourcc == b"avih":
                (uspf,) = struct.unpack_from("<I", payload, b0)
            elif fourcc == b"strh" and in_strl:
                if payload[b0:b0 + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", payload,
                                                     b0 + 20)
            elif fourcc[2:] in (b"dc", b"db") and b1 > b0:
                jpegs.append(payload[b0:b1])

    visit(12, len(payload), False)
    if not jpegs:
        raise AviError("no video frames (movi 00dc chunks)")
    if rate:
        frame_ms = 1000.0 * scale / rate
    elif uspf:
        frame_ms = uspf / 1000.0
    else:
        raise AviError("no frame timing (strh/avih missing)")
    return [{"px": decode_jpeg(j), "t_ms": int(round(i * frame_ms))}
            for i, j in enumerate(jpegs)]
