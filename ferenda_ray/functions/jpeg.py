"""Baseline JPEG (ITU-T T.81) codec — pure numpy/stdlib.

The environment has no libjpeg, so the multimodal family previously
stubbed JPEG decode.  This module implements the public baseline
process directly: JFIF segment parsing, DQT/DHT-driven entropy
decode (the decoder uses the tables IN THE FILE, not hardcoded
ones), dequantize → inverse zigzag → IDCT (orthonormal DCT-II
matrix), chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0, YCbCr→RGB —
plus a minimal 4:4:4 encoder (Annex K quantization + Huffman tables)
for round-trip validation.

Scope: baseline sequential (SOF0), 8-bit, no restart markers,
no progressive/arithmetic coding — raise ``JpegError`` otherwise.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(Exception):
    pass


# --- shared math -----------------------------------------------------------

_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                for x in range(8)] for u in range(8)])

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct2(block):
    return _C @ block @ _C.T


def _idct2(coef):
    return _C.T @ coef @ _C


#: Annex K.1 luminance / chrominance quantization tables
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113,
    92, 49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112,
    100, 103, 99]).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99]).reshape(8, 8)

#: Annex K.3 standard Huffman tables: (bits[1..16], values)
_HT = {
    ("dc", 0): ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12))),
    ("dc", 1): ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12))),
    ("ac", 0): ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
                [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
                 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
                 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
                 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
                 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
                 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
                 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
                 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
                 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
                 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
                 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
                 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
                 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
                 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
                 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
                 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
                 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
                 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
                 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
                 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
                 0xF9, 0xFA]),
    ("ac", 1): ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
                [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
                 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
                 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
                 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
                 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
                 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
                 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
                 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
                 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
                 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
                 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
                 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
                 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
                 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
                 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
                 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
                 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
                 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
                 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
                 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
                 0xF9, 0xFA]),
}


def _huff_codes(bits, values):
    """(bits, values) → {value: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits, values):
    """(bits, values) → {(code, length): value}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(code, length)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits_val: int, size: int) -> int:
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


# --- encoder ---------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)         # byte stuffing

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)      # pad with 1s


def _scaled_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    t = (qt * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _downsample2(c: np.ndarray) -> np.ndarray:
    hh = (c.shape[0] + 1) // 2 * 2
    ww = (c.shape[1] + 1) // 2 * 2
    c = np.pad(c, ((0, hh - c.shape[0]), (0, ww - c.shape[1])),
               mode="edge")
    return c.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))


def encode_jpeg(px: np.ndarray, quality: int = 85,
                subsample: str = "444") -> bytes:
    """RGB (H×W×3) or grayscale (H×W) uint8 → baseline JFIF bytes
    (Annex K tables scaled by libjpeg's quality formula;
    ``subsample`` = '444' or '420')."""
    px = np.asarray(px, np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64) - 128]
        qts = [_scaled_qt(_QT_LUMA, quality)]
        qsel, tsel = [0], [(0, 0)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        comps = [y, cb, cr]
        qts = [_scaled_qt(_QT_LUMA, quality),
               _scaled_qt(_QT_CHROMA, quality)]
        qsel, tsel = [0, 1, 1], [(0, 0), (1, 1), (1, 1)]

    if not gray and subsample == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        comps = [comps[0], _downsample2(comps[1]),
                 _downsample2(comps[2])]
    else:
        samp = [(1, 1)] * len(comps)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [np.pad(comps[ci],
                     ((0, mcuy * 8 * samp[ci][1]
                       - comps[ci].shape[0]),
                      (0, mcux * 8 * samp[ci][0]
                       - comps[ci].shape[1])), mode="edge")
              for ci in range(len(comps))]

    dc_enc = [_huff_codes(*_HT[("dc", i)]) for i in (0, 1)]
    ac_enc = [_huff_codes(*_HT[("ac", i)]) for i in (0, 1)]
    bw = _BitWriter()
    pred = [0] * len(comps)

    def emit_block(block, ci):
        q = np.round(_dct2(block) / qts[qsel[ci]]).astype(np.int32)
        zz = q.flatten()[_ZIGZAG]
        dct_t, act_t = tsel[ci]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size = _category(diff)
        code, length = dc_enc[dct_t][size]
        bw.write(code, length)
        if size:
            v = diff if diff >= 0 else diff + (1 << size) - 1
            bw.write(v, size)
        run = 0
        for v in zz[1:]:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_enc[act_t][0xF0]
                bw.write(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_enc[act_t][(run << 4) | size]
            bw.write(code, length)
            bw.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            code, length = ac_enc[act_t][0x00]           # EOB
            bw.write(code, length)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci, comp in enumerate(padded):
                sh, sv = samp[ci]
                for v in range(sv):
                    for u in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + u) * 8
                        emit_block(comp[y0:y0 + 8, x0:x0 + 8], ci)
    bw.flush()

    out = bytearray(b"\xff\xd8")                        # SOI
    out += (b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00"
            b"\x00\x01\x00\x01\x00\x00")                # APP0
    for i, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, i)
        out += bytes(qt.flatten()[_ZIGZAG].astype(np.uint8))
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w,
                                     nc)
    for ci in range(nc):
        out += struct.pack(">BBB", ci + 1,
                           (samp[ci][0] << 4) | samp[ci][1],
                           qsel[ci])
    tables = [("dc", 0), ("ac", 0)] + ([("dc", 1), ("ac", 1)]
                                       if nc > 1 else [])
    for kind, tid in tables:
        bits, values = _HT[(kind, tid)]
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(values),
            (0x00 if kind == "dc" else 0x10) | tid)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        dct_t, act_t = tsel[ci]
        out += struct.pack(">BB", ci + 1, (dct_t << 4) | act_t)
    out += b"\x00\x3f\x00"
    out += bw.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if (self.pos < len(self.data)
                        and self.data[self.pos] == 0x00):
                    self.pos += 1              # unstuff
                else:
                    raise JpegError("marker inside entropy data")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            if (code, length) in table:
                return table[(code, length)]
        raise JpegError("bad Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → uint8 RGB (H×W×3) or grayscale
    (H×W).  Tables come from the file's own DQT/DHT segments."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    qts: dict = {}
    hts: dict = {}
    frame = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise JpegError("expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                     # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                     # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq:
                    raise JpegError("16-bit DQT unsupported")
                qts[tq] = np.frombuffer(
                    seg, np.uint8, 64, i + 1).astype(
                    np.int32)[_UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:                   # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                hts[(tc, th)] = _huff_decoder(bits, values)
                i += 17 + nv
        elif marker == 0xC0:                   # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise JpegError("only 8-bit baseline")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg,
                                                 6 + 3 * ci)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("NotImplemented: non-baseline JPEG "
                            f"(SOF marker 0x{marker:02x})")
        elif marker == 0xDD:
            if struct.unpack_from(">H", seg, 0)[0] != 0:
                raise JpegError("restart intervals unsupported")
        elif marker == 0xDA:                   # SOS
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            # entropy data runs to the next real marker
            end = pos
            while end + 1 < len(payload):
                if payload[end] == 0xFF and payload[end + 1] not in \
                        (0x00,) and not 0xD0 <= payload[end + 1] <= 0xD7:
                    break
                end += 1
            entropy = payload[pos:end]
            pos = end
            break
    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    by_id = {s["id"]: s for s in scan}
    br = _BitReader(entropy)
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                s = by_id[c["id"]]
                dct = hts[(0, s["dc"])]
                act = hts[(1, s["ac"])]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        size = br.read_huff(dct)
                        diff = _extend(br.read_bits(size), size)
                        pred[ci] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_huff(act)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0xF
                            if k > 63:
                                raise JpegError("AC overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = (zz[_UNZIGZAG].reshape(8, 8)
                                * qts[c["tq"]])
                        blk = _idct2(coef) + 128
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + u) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)
    y, cb, cr = full
    cb = cb - 128                  # JFIF stores chroma offset +128
    cr = cr - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0,
                   255).astype(np.uint8)
