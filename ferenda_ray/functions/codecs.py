"""Pure-stdlib/numpy media codecs for the multimodal stages.

The container has no imaging or audio libraries, but several common
formats are decodable with nothing beyond ``zlib``/``struct``/numpy:
PNG (zlib inflate + per-row filters), BMP (uncompressed BI_RGB),
netpbm P5/P6, and WAV PCM (stdlib ``wave``).  These make the
multimodal decode stages REAL for those formats; JPEG and video stay
honestly stubbed (they need libjpeg/ffmpeg).

Everything here is per-payload pure functions — called from actor-pool
``map_batches`` stages (``stages/multimodal.py``), never driver-side.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

__all__ = ["sniff_media", "decode_image", "decode_png", "decode_bmp",
           "decode_ppm", "decode_wav", "encode_png", "encode_wav",
           "resize_nearest", "image_features", "audio_features",
           "MediaDecodeError"]


class MediaDecodeError(Exception):
    pass


def sniff_media(payload: bytes) -> str:
    head = bytes(payload[:16])
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if head.startswith(b"BM"):
        return "bmp"
    if head[:2] in (b"P5", b"P6"):
        return "ppm"
    if head.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if head.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if head.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG

def _unfilter(raw: bytes, height: int, rowbytes: int, bpp: int) -> bytes:
    out = bytearray()
    prev = bytearray(rowbytes)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + rowbytes])
        pos += 1 + rowbytes
        if ft == 1:  # Sub
            for x in range(bpp, rowbytes):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(rowbytes):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(rowbytes):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(rowbytes):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else \
                    (b if pb_ <= pc_ else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ft != 0:
            raise MediaDecodeError("bad PNG filter %d" % ft)
        out += row
        prev = row
    return bytes(out)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8 (8-bit gray / palette / RGB / RGBA;
    alpha is dropped, no interlace)."""
    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise MediaDecodeError("not a PNG")
    pos = 8
    idat, plte = b"", None
    w = h = depth = ctype = interlace = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
        elif ctag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat += data
        elif ctag == b"IEND":
            break
    if w is None:
        raise MediaDecodeError("no IHDR")
    if depth != 8 or interlace:
        raise MediaDecodeError(
            "unsupported PNG (depth=%s interlace=%s)" % (depth, interlace))
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise MediaDecodeError("unsupported color type %d" % ctype)
    raw = zlib.decompress(idat)
    rowbytes = w * channels
    px = np.frombuffer(_unfilter(raw, h, rowbytes, channels),
                       np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise MediaDecodeError("palette PNG without PLTE")
        return plte[px[..., 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:  # gray+alpha
        return np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3].copy()


def encode_png(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → PNG bytes (filter 0; for tests/fixtures)."""
    h, w, _ = px.shape
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data +
                struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP / netpbm

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (H, W, 3) uint8."""
    if payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP")
    (off,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h, _planes, bpp, comp = struct.unpack(
        "<IiihHI", payload[14:34])
    if comp != 0 or bpp not in (24, 32):
        raise MediaDecodeError("unsupported BMP (bpp=%d comp=%d)"
                               % (bpp, comp))
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = []
    for y in range(h):
        line = payload[off + y * stride: off + y * stride + w * nbytes]
        a = np.frombuffer(line, np.uint8).reshape(w, nbytes)
        rows.append(a[:, 2::-1])  # BGR(A) → RGB
    px = np.stack(rows)
    return px[::-1] if flip else px


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB) → (H, W, 3) uint8."""
    f = io.BytesIO(payload)
    magic = f.read(2)
    if magic not in (b"P5", b"P6"):
        raise MediaDecodeError("not a binary PGM/PPM")

    def token():
        t = b""
        while True:
            c = f.read(1)
            if c in b" \t\r\n":
                if t:
                    return t
            elif c == b"#":
                while f.read(1) not in b"\r\n":
                    pass
            elif not c:
                return t
            else:
                t += c

    w, h, maxv = int(token()), int(token()), int(token())
    if maxv > 255:
        raise MediaDecodeError("16-bit netpbm unsupported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(f.read(w * h * ch), np.uint8).reshape(h, w, ch)
    return px if ch == 3 else np.repeat(px, 3, axis=2)


def decode_image(payload: bytes) -> np.ndarray:
    kind = sniff_media(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "gif":
        return decode_gif(payload)[0]["px"]
    if kind == "jpeg":
        from ferenda_ray.functions.jpeg import decode_jpeg
        px = decode_jpeg(payload)
        if px.ndim == 2:           # grayscale -> RGB for a uniform API
            px = np.stack([px] * 3, axis=-1)
        return px
    raise MediaDecodeError(
        "NotImplemented: %s decode requires external libraries "
        "(PNG/BMP/netpbm/GIF/baseline-JPEG decode natively)" % kind)


# ---------------------------------------------------------------------------
# GIF (87a/89a) — pure stdlib/numpy; the only animated format in the
# engine, so it is ALSO the real (non-stub) frame-sampling target

def _gif_lzw_decode(data: bytes, min_code: int) -> bytes:
    """GIF LZW: LSB-first variable codes, per-spec clear/EOI."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    buf = bits = 0
    for byte in data:
        buf |= byte << bits
        bits += 8
        while bits >= width:
            code = buf & ((1 << width) - 1)
            buf >>= width
            bits -= width
            if code == clear:
                table = table[:eoi + 1]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = (list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(idx)
    out[rows] = idx
    return out


def decode_gif(payload: bytes) -> list:
    """GIF87a/89a → ``[{"delay_ms", "px"}]`` RGB frames (uint8
    H×W×3).  Frames composite onto the running canvas (disposal
    'leave in place'); transparent pixels keep the canvas."""
    if not payload.startswith((b"GIF87a", b"GIF89a")):
        raise MediaDecodeError("not a GIF")
    import struct as _s
    pos = 6
    width, height, flags, _bg, _ar = _s.unpack_from("<HHBBB", payload,
                                                    pos)
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3,
                            pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((height, width, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[_bg] if _bg < len(gct) else 0
    frames = []
    delay_ms = 0
    transparent = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                      # trailer
            break
        if block == 0x21:                      # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:                  # graphic control
                size = payload[pos]
                gflags, delay, tidx = _s.unpack_from(
                    "<BHB", payload, pos + 1)
                delay_ms = delay * 10
                transparent = tidx if gflags & 1 else None
                pos += 1 + size
            while payload[pos] != 0:           # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:                      # image descriptor
            raise MediaDecodeError(f"bad GIF block 0x{block:02x}")
        left, top, w, h, iflags = _s.unpack_from("<HHHHB", payload,
                                                 pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3,
                                pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise MediaDecodeError("GIF image without color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            size = payload[pos]
            data += payload[pos + 1:pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(_gif_lzw_decode(bytes(data), min_code),
                            np.uint8)[:w * h].reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h)
        rect = canvas[top:top + h, left:left + w]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = pal[idx[mask]]
        else:
            rect[:] = pal[idx.clip(0, len(pal) - 1)]
        frames.append({"delay_ms": delay_ms,
                       "px": canvas.copy()})
        delay_ms, transparent = 0, None
    if not frames:
        raise MediaDecodeError("GIF with no frames")
    return frames


def encode_gif(frames, delays_ms=None) -> bytes:
    """Minimal GIF89a encoder (global palette from the frames' ≤256
    unique colors; clear-code-per-pixel LZW, valid per spec) — for
    round-trip tests and fixtures, like :func:`encode_png`."""
    import struct as _s
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0)
    if len(colors) > 256:
        raise MediaDecodeError("encode_gif: > 256 colors")
    depth = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal = np.zeros((1 << depth, 3), np.uint8)
    pal[:len(colors)] = colors
    cmap = {tuple(c): i for i, c in enumerate(colors)}
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    # loop forever (netscape) so multi-frame files animate
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delays_ms = delays_ms or [100] * len(frames)
    min_code = depth
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    for f, delay in zip(frames, delays_ms):
        # GCE: size 4 = flags, delay(u16), transparent idx; then term
        out += _s.pack("<BBBBHB", 0x21, 0xF9, 4, 0, delay // 10, 0)
        out += b"\x00"
        out += _s.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        idx = np.array([cmap[tuple(p)] for p in
                        f.reshape(-1, 3)], np.uint16)
        bits = buf = 0
        stream = bytearray()

        def emit(code):
            nonlocal bits, buf
            buf |= code << bits
            bits += width
            while bits >= 8:
                stream.append(buf & 0xFF)
                buf >>= 8
                bits -= 8

        for c in idx:
            emit(clear)                        # table never grows
            emit(int(c))
        emit(eoi)
        if bits:
            stream.append(buf & 0xFF)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# ---------------------------------------------------------------------------
# WAV

def decode_wav(payload: bytes):
    """WAV PCM → (samples ndarray float32 in [-1, 1], sample_rate).
    Multi-channel audio is averaged to mono."""
    import wave
    try:
        wf = wave.open(io.BytesIO(payload))
    except Exception as e:
        raise MediaDecodeError("bad WAV: %s" % e)
    with wf:
        n = wf.getnframes()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        chans = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128.0
    else:
        raise MediaDecodeError("unsupported sample width %d" % width)
    if chans > 1:
        x = x[: (len(x) // chans) * chans].reshape(-1, chans).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float [-1,1] mono → 16-bit PCM WAV bytes (tests/fixtures)."""
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.clip(samples, -1, 1) * 32767)
                       .astype(np.int16).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature kernels (vectorized numpy — the per-batch hot path)

def resize_nearest(px: np.ndarray, w: int, h: int) -> np.ndarray:
    ys = (np.arange(h) * px.shape[0] // h).clip(0, px.shape[0] - 1)
    xs = (np.arange(w) * px.shape[1] // w).clip(0, px.shape[1] - 1)
    return px[ys[:, None], xs[None, :]]


def image_features(px: np.ndarray) -> dict:
    lum = px.astype(np.float32).mean(axis=2)
    return {
        "width": int(px.shape[1]), "height": int(px.shape[0]),
        "mean_r": round(float(px[..., 0].mean()), 4),
        "mean_g": round(float(px[..., 1].mean()), 4),
        "mean_b": round(float(px[..., 2].mean()), 4),
        "luma_std": round(float(lum.std()), 4),
    }


def audio_features(x: np.ndarray, rate: int) -> dict:
    if len(x) == 0:
        return {"duration_ms": 0, "rms": 0.0, "zcr": 0.0,
                "spectral_centroid_hz": 0.0}
    rms = float(np.sqrt((x ** 2).mean()))
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    # power-weighted centroid: tonal content must dominate broadband
    # noise (magnitude weighting lets flat noise swamp a pure tone)
    pw = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
    centroid = float((freqs * pw).sum() / pw.sum()) if pw.sum() else 0.0
    return {
        "duration_ms": int(len(x) * 1000 / rate),
        "rms": round(rms, 6),
        "zcr": round(zcr, 6),
        "spectral_centroid_hz": round(centroid, 2),
    }


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis (same construction as the JPEG
    codec's 8×8 transform, ``functions/jpeg.py``) — cached module-
    level: phash calls it per image."""
    global _DCT32
    if _DCT32 is None or _DCT32.shape[0] != n:
        k = np.arange(n)
        M = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        M *= np.sqrt(2.0 / n)
        M[0] *= np.sqrt(0.5)
        _DCT32 = M
    return _DCT32


def phash64(px: np.ndarray, size: int = 32, keep: int = 8) -> int:
    """64-bit perceptual image hash (the classic pHash recipe):
    grayscale → ``size``×``size`` nearest resize → 2-D DCT → top-left
    ``keep``×``keep`` low-frequency block minus the DC term → bit i
    set iff coefficient i > median.  Deterministic, pure numpy; near-
    duplicate images (re-encodes, small edits, brightness shifts)
    land within a few bits — feed through
    ``stages.dedup.hamming_pairs64`` for corpus-wide pairs."""
    if px.ndim == 3:
        gray = px.astype(np.float64).mean(axis=2)
    else:
        gray = px.astype(np.float64)
    small = resize_nearest(gray[..., None], size, size)[..., 0] \
        if gray.ndim == 2 else gray
    D = _dct_matrix(size)
    coef = D @ small @ D.T
    block = coef[:keep, :keep].flatten()[1:]   # drop DC
    # dust floor: on spectrally sparse images (flat fills, pure
    # gradients) most coefficients are float noise around the median
    # and their sign bits flip under trivial edits — zero them
    peak = np.abs(block).max()
    if peak > 0:
        block = np.where(np.abs(block) < 1e-6 * peak, 0.0, block)
    med = np.median(block)
    bits = block > med
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h


def audio_fingerprint64(x: np.ndarray, rate: int, n_frames: int = 4,
                        n_bands: int = 17,
                        floor_frac: float = 0.01) -> int:
    """64-bit audio fingerprint (band-energy signature in the
    Haitsma–Kalker family): split the signal into ``n_frames`` equal
    windows, measure energy in ``n_bands`` log-spaced frequency bands
    per window, zero every band below ``floor_frac`` of the frame's
    peak band (noise floor — otherwise empty-band comparisons encode
    pure noise), and set bit (t, b) iff E[t,b] > E[t,b+1] (the
    spectral-slope sign) — n_frames×(n_bands−1) = 64 bits.  Slope
    signs are gain-invariant; with the floor, re-noised / re-gained
    copies land ≤~4 bits apart while different tonal content differs
    by ≥~8 (the classic temporal-difference variant flips ~half its
    bits on stationary content).  Pairs via
    ``dedup.hamming_pairs64``."""
    if len(x) < n_frames:
        x = np.pad(x, (0, n_frames - len(x)))
    step = len(x) // n_frames
    frames = x[: step * n_frames].reshape(n_frames, step)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    nyq = spec.shape[1]
    # log-spaced band START indices, strictly inside [1, nyq-1]; the
    # int cast can collapse neighbors on tiny spectra — refill with
    # consecutive bins so reduceat always gets n_bands valid starts
    starts = list(np.unique(
        np.geomspace(1, nyq, n_bands + 1)[:-1]
        .astype(int).clip(1, max(nyq - 1, 1))))[:n_bands]
    while len(starts) < n_bands:
        starts.append(min(starts[-1] + 1, max(nyq - 1, 1)))
    E = np.add.reduceat(spec, starts, axis=1)[:, :n_bands]
    floor = E.max(axis=1, keepdims=True) * floor_frac
    E = np.where(E < floor, 0.0, E)
    bits = (E[:, :-1] > E[:, 1:])            # (n_frames, n_bands-1)
    h = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            h |= 1 << i
    return h
