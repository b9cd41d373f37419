"""Native legacy ``.doc`` text extraction — pure stdlib.

The reference shells out to ``antiword`` (``wordreader.py:28-96``);
that binary is absent here, so this module implements the documented
public formats directly: the OLE2/CFB container ([MS-CFB]: 512-byte
sectors, FAT chains, directory, miniFAT) and the Word binary file
([MS-DOC]: FIB, Clx piece table in the Table stream, compressed
cp1252 vs utf-16 text pieces).

Validation: ``sample.doc`` and ``sample.docx`` in the reference's
wordreader fixture corpus are the same document — the extracted text
must match the engine's real .docx reader on the .docx twin.
"""

from __future__ import annotations

import struct

CFB_MAGIC = bytes.fromhex("d0cf11e0a1b11ae1")
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF


class DocError(Exception):
    pass


def _sector(data: bytes, n: int, size: int) -> bytes:
    off = 512 + n * size
    return data[off:off + size]


def _chain(fat: list, start: int) -> list:
    out, s = [], start
    seen = set()
    while s not in (ENDOFCHAIN, FREESECT) and s < len(fat):
        if s in seen:
            raise DocError("FAT cycle")
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(data: bytes) -> dict:
    """CFB container → {stream name: bytes} (root level only — all
    the Word streams live there)."""
    if data[:8] != CFB_MAGIC:
        raise DocError("not a CFB/OLE2 file")
    ssz = 1 << struct.unpack_from("<H", data, 30)[0]
    mssz = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]

    # DIFAT: 109 entries in the header + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    while s not in (ENDOFCHAIN, FREESECT):
        sec = _sector(data, s, ssz)
        vals = struct.unpack(f"<{ssz // 4}I", sec)
        difat.extend(vals[:-1])
        s = vals[-1]
    fat: list = []
    for fs in difat[:n_fat]:
        if fs in (ENDOFCHAIN, FREESECT):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I",
                                 _sector(data, fs, ssz)))

    def read_chain(start: int) -> bytes:
        return b"".join(_sector(data, s, ssz)
                        for s in _chain(fat, start))

    dirdata = read_chain(dir_start)
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off:off + 128]
        cb = struct.unpack_from("<H", e, 64)[0]
        if cb < 2 or e[66] == 0:
            continue
        name = e[:cb - 2].decode("utf-16le", "replace")
        otype = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0]
        entries.append((name, otype, start, size))
    if not entries:
        raise DocError("empty CFB directory")

    # root entry (type 5) holds the mini-stream
    root = next(e for e in entries if e[1] == 5)
    ministream = read_chain(root[2])[:root[3]]
    minifat: list = []
    for s in _chain(fat, minifat_start):
        minifat.extend(struct.unpack(f"<{ssz // 4}I",
                                     _sector(data, s, ssz)))

    def read_mini(start: int, size: int) -> bytes:
        out = b"".join(ministream[s * mssz:(s + 1) * mssz]
                       for s in _chain(minifat, start))
        return out[:size]

    out = {}
    for name, otype, start, size in entries:
        if otype != 2:          # stream objects only
            continue
        blob = (read_mini(start, size) if size < mini_cutoff
                else read_chain(start)[:size])
        out[name] = blob
    return out


def extract_doc_text(data: bytes) -> str:
    """Word 97-2003 binary → document text (the main-document CP
    range), via the Clx piece table ([MS-DOC] 2.8.35, 2.9.177)."""
    streams = cfb_streams(data)
    try:
        word = streams["WordDocument"]
    except KeyError:
        raise DocError("no WordDocument stream")
    if struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise DocError("bad FIB magic")
    flags = struct.unpack_from("<H", word, 0x000A)[0]
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name) or streams.get("0Table") \
        or streams.get("1Table")
    if table is None:
        raise DocError("no Table stream")
    ccp_text = struct.unpack_from("<i", word, 0x004C)[0]
    fc_clx = struct.unpack_from("<I", word, 0x01A2)[0]
    lcb_clx = struct.unpack_from("<I", word, 0x01A6)[0]
    clx = table[fc_clx:fc_clx + lcb_clx]

    # Clx = RgPrc (clxt=1 blocks) then Pcdt (clxt=2)
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        cb = struct.unpack_from("<h", clx, pos + 1)[0]
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise DocError("no Pcdt in Clx")
    lcb = struct.unpack_from("<I", clx, pos + 1)[0]
    plc = clx[pos + 5:pos + 5 + lcb]
    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out = []
    for i in range(n):
        pcd = plc[(n + 1) * 4 + i * 8:(n + 1) * 4 + (i + 1) * 8]
        fc = struct.unpack_from("<I", pcd, 2)[0]
        n_chars = cps[i + 1] - cps[i]
        if fc & 0x40000000:                   # fCompressed: cp1252
            off = (fc & 0x3FFFFFFF) // 2
            out.append(word[off:off + n_chars].decode("cp1252",
                                                      "replace"))
        else:
            off = fc & 0x3FFFFFFF
            out.append(word[off:off + 2 * n_chars]
                       .decode("utf-16le", "replace"))
    text = "".join(out)[:max(ccp_text, 0) or None]
    # Word control characters → text conventions
    return (text.replace("\r", "\n").replace("\x07", "\n")
            .replace("\x0b", "\n").replace("\x0c", "\n")
            .replace("\x13", "").replace("\x14", "").replace("\x15", "")
            .replace("\xa0", " "))
