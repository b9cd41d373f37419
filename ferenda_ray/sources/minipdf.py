"""Minimal pure-stdlib raw-PDF text extraction.

The reference always converts raw PDFs with the external ``pdftohtml``
binary (``ferenda/pdfreader.py:332-401``) — absent in this
environment.  This module provides the fallback conversion path in
pure Python: object/stream parsing (FlateDecode via zlib, object
streams for PDF 1.5+), page-tree walk, a small content-stream
interpreter (BT/ET text ops with CTM and text-matrix tracking) and
glyph decoding via ToUnicode CMaps / encoding differences.  Output is
the same :class:`~.pdf2xml.PDFDocument` model the intermediate parsers
produce, with pdftohtml-like 1.5× zoomed coordinates — GEOMETRY IS
APPROXIMATE (no font-widths advance model): positions come from text
matrices only, so use this path for text content, reading order and
font attribution, and prefer a real pdf2xml intermediate when layout
precision matters.

Scale shape: one document per call inside a ``map_batches`` actor —
nothing driver-side.
"""

from __future__ import annotations

import re
import zlib

from .pdf2xml import Page, PDFDocument, Textbox, Textelement

__all__ = ["PDFSyntaxError", "extract_pdf", "parse_objects"]

ZOOM = 1.5  # pdftohtml default zoom used for the checked-in intermediates


class PDFSyntaxError(Exception):
    pass


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num):
        self.num = num


class _Name(str):
    pass


def _skip_ws(data, i):
    n = len(data)
    while i < n:
        c = data[i:i + 1]
        if c in b"%":
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


_NUM = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REFPAT = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


def _parse(data, i):
    """Parse one PDF object at offset ``i`` → (value, next offset)."""
    i = _skip_ws(data, i)
    c = data[i:i + 1]
    if c == b"/":
        j = i + 1
        while j < len(data) and data[j:j + 1] not in _WS \
                and data[j:j + 1] not in _DELIM:
            j += 1
        raw = data[i + 1:j]
        raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                     lambda m: bytes([int(m.group(1), 16)]), raw)
        return _Name(raw.decode("latin-1")), j
    if c == b"(":
        out, depth, j = bytearray(), 1, i + 1
        while j < len(data) and depth:
            ch = data[j]
            if ch == 0x5C:  # backslash
                nxt = data[j + 1:j + 2]
                esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                       b"f": b"\x0c", b"(": b"(", b")": b")",
                       b"\\": b"\\"}.get(nxt)
                if esc:
                    out += esc
                    j += 2
                elif nxt.isdigit():
                    k = j + 1
                    oct_ = b""
                    while k < len(data) and len(oct_) < 3 \
                            and data[k:k + 1].isdigit():
                        oct_ += data[k:k + 1]
                        k += 1
                    out.append(int(oct_, 8) & 0xFF)
                    j = k
                elif nxt in (b"\n", b"\r"):  # line continuation
                    j += 2
                else:
                    j += 1
            elif ch == 0x28:
                depth += 1
                out.append(ch)
                j += 1
            elif ch == 0x29:
                depth -= 1
                if depth:
                    out.append(ch)
                j += 1
            else:
                out.append(ch)
                j += 1
        return bytes(out), j
    if data[i:i + 2] == b"<<":
        d, j = {}, i + 2
        while True:
            j = _skip_ws(data, j)
            if data[j:j + 2] == b">>":
                return d, j + 2
            key, j = _parse(data, j)
            val, j = _parse(data, j)
            d[str(key)] = val
    if c == b"<":
        j = data.index(b">", i)
        hexs = re.sub(rb"\s", b"", data[i + 1:j])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii")), j + 1
    if c == b"[":
        arr, j = [], i + 1
        while True:
            j = _skip_ws(data, j)
            if data[j:j + 1] == b"]":
                return arr, j + 1
            v, j = _parse(data, j)
            arr.append(v)
    if data[i:i + 4] == b"true":
        return True, i + 4
    if data[i:i + 5] == b"false":
        return False, i + 5
    if data[i:i + 4] == b"null":
        return None, i + 4
    m = _NUM.match(data, i)
    if m:
        # indirect reference "N G R"?
        r = _REFPAT.match(data, i)
        if r and r.group(1) == m.group(0):
            return _Ref(int(r.group(1))), r.end()
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    raise PDFSyntaxError("unparseable object at %d: %r" % (i, data[i:i + 20]))


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode: 9→12-bit variable codes, 256=clear, 257=EOD."""
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    prev = None
    width = 9
    buf = bits = 0
    for byte in data:
        buf = (buf << 8) | byte
        bits += 8
        while bits >= width:
            bits -= width
            code = (buf >> bits) & ((1 << width) - 1)
            if code == 256:
                table = table[:258]
                width, prev = 9, None
                continue
            if code == 257:
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
            if len(table) >= (1 << width) - early_change and width < 12:
                width += 1
    return bytes(out)


def _png_unpredict(data, columns, colors=1, bpc=8):
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 <= len(data) - rowlen:
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        i += 1 + rowlen
        bpp = max(1, colors * bpc // 8)
        for x in range(rowlen):
            left = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                row[x] = (row[x] + left) & 0xFF
            elif ft == 2:
                row[x] = (row[x] + up) & 0xFF
            elif ft == 3:
                row[x] = (row[x] + (left + up) // 2) & 0xFF
            elif ft == 4:
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb_ and pa_ <= pc_ else \
                    (up if pb_ <= pc_ else ul)
                row[x] = (row[x] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


class PDFFile:
    """All objects of a PDF, scanned sequentially (streams skipped by
    their real extent, object streams unpacked)."""

    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict = {}
        self.streams: dict = {}
        self._scan()
        self._unpack_objstms()

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref) and seen < 32:
            v = self.objects.get(v.num)
            seen += 1
        return v

    def _scan(self):
        data = self.data
        pat = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
        i = 0
        while True:
            m = pat.search(data, i)
            if not m:
                break
            try:
                val, j = _parse(data, m.end())
            except (PDFSyntaxError, ValueError, IndexError):
                i = m.end()
                continue
            num = int(m.group(1))
            j2 = _skip_ws(data, j)
            if data[j2:j2 + 6] == b"stream":
                j2 += 6
                if data[j2:j2 + 2] == b"\r\n":
                    j2 += 2
                elif data[j2:j2 + 1] in (b"\n", b"\r"):
                    j2 += 1
                length = self.resolve(val.get("Length")) \
                    if isinstance(val, dict) else None
                if isinstance(length, (int, float)):
                    end = j2 + int(length)
                    if data[end:end + 20].strip()[:9] not in (
                            b"endstream", b"endstrea"):
                        end = data.find(b"endstream", j2)
                else:
                    end = data.find(b"endstream", j2)
                if end < 0:
                    end = len(data)
                self.streams[num] = (val, data[j2:end].rstrip(b"\r\n"))
                j = end
            self.objects[num] = val
            i = j

    def stream_bytes(self, num_or_ref) -> bytes:
        num = num_or_ref.num if isinstance(num_or_ref, _Ref) else num_or_ref
        if num not in self.streams:
            return b""
        d, raw = self.streams[num]
        filters = self.resolve(d.get("Filter"))
        if filters is None:
            filters = []
        elif not isinstance(filters, list):
            filters = [filters]
        parms = self.resolve(d.get("DecodeParms")) or {}
        if isinstance(parms, list):
            parms = next((p for p in parms if p), {})
        out = raw
        for f in filters:
            f = str(f)
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:
                    out = zlib.decompressobj().decompress(out)
                pred = self.resolve(parms.get("Predictor")) or 1
                if pred >= 10:
                    out = _png_unpredict(
                        out, int(self.resolve(parms.get("Columns")) or 1),
                        int(self.resolve(parms.get("Colors")) or 1),
                        int(self.resolve(parms.get("BitsPerComponent"))
                            or 8))
            elif f == "LZWDecode":
                out = _lzw_decode(
                    out, int(self.resolve(parms.get("EarlyChange")) or 1))
                pred = self.resolve(parms.get("Predictor")) or 1
                if pred >= 10:
                    out = _png_unpredict(
                        out, int(self.resolve(parms.get("Columns")) or 1),
                        int(self.resolve(parms.get("Colors")) or 1),
                        int(self.resolve(parms.get("BitsPerComponent"))
                            or 8))
            elif f in ("ASCIIHexDecode",):
                out = bytes.fromhex(
                    re.sub(rb"[^0-9A-Fa-f]", b"",
                           out.rstrip(b">")).decode("ascii"))
            # other filters (DCT, CCITT…) are image data: leave raw
        return out

    def _unpack_objstms(self):
        for num, (d, _raw) in list(self.streams.items()):
            if str(self.resolve(d.get("Type"))) != "ObjStm":
                continue
            payload = self.stream_bytes(num)
            n = int(self.resolve(d.get("N")))
            first = int(self.resolve(d.get("First")))
            header = payload[:first].split()
            for k in range(n):
                onum = int(header[2 * k])
                off = int(header[2 * k + 1])
                try:
                    val, _ = _parse(payload, first + off)
                except (PDFSyntaxError, ValueError, IndexError):
                    continue
                self.objects.setdefault(onum, val)


# ---------------------------------------------------------------------------
# glyph decoding

_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
# hex payloads may contain whitespace: "<0009 000d 0020 00a0>"
_HEX = re.compile(rb"<([0-9A-Fa-f\s]+)>")


def _cp(hexs: str) -> str:
    """UTF-16BE hex payload → str."""
    try:
        return bytes.fromhex(hexs).decode("utf-16-be")
    except Exception:
        return ""


def parse_tounicode(cmap: bytes) -> dict:
    """ToUnicode CMap → {code: str} (bfchar + bfrange sections)."""
    def clean(tok: bytes) -> str:
        return re.sub(rb"\s", b"", tok).decode("ascii")

    out: dict = {}
    for m in _BFCHAR.finditer(cmap):
        toks = _HEX.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            out[int(clean(src), 16)] = _cp(clean(dst))
    for m in _BFRANGE.finditer(cmap):
        body = m.group(1)
        for line in body.splitlines():
            toks = _HEX.findall(line)
            if len(toks) >= 3 and b"[" not in line:
                lo, hi = int(clean(toks[0]), 16), int(clean(toks[1]), 16)
                base = clean(toks[2])
                basecp = int(base, 16) if len(base) <= 4 else None
                for k in range(hi - lo + 1):
                    if basecp is not None:
                        out[lo + k] = chr(basecp + k)
                    else:
                        out[lo + k] = _cp(base)
            elif len(toks) >= 2 and b"[" in line:
                lo, hi = int(clean(toks[0]), 16), int(clean(toks[1]), 16)
                dsts = toks[2:]
                for k, dst in enumerate(dsts[:hi - lo + 1]):
                    out[lo + k] = _cp(clean(dst))
    return out


# minimal Adobe-glyph-list subset for /Differences (common names)
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "underscore": "_",
    "adieresis": "ä", "odieresis": "ö", "aring": "å",
    "Adieresis": "Ä", "Odieresis": "Ö", "Aring": "Å",
    "eacute": "é", "section": "§", "bullet": "•", "endash": "–",
    "emdash": "—", "quotedblleft": "“", "quotedblright": "”",
    "quoteleft": "‘", "quoteright": "’",
}
for _i in range(48, 58):
    _AGL[["zero", "one", "two", "three", "four", "five", "six", "seven",
          "eight", "nine"][_i - 48]] = chr(_i)


def _glyphname_to_char(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    if len(name) == 1:
        return name
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    return ""


class _FontDecoder:
    def __init__(self, pdf: PDFFile, fontdict: dict):
        self.two_byte = str(pdf.resolve(fontdict.get("Subtype"))) == "Type0"
        self.map: dict = {}
        self.base = "cp1252"
        tu = fontdict.get("ToUnicode")
        if tu is not None:
            num = tu.num if isinstance(tu, _Ref) else None
            if num is not None:
                self.map = parse_tounicode(pdf.stream_bytes(num))
        enc = pdf.resolve(fontdict.get("Encoding"))
        if isinstance(enc, _Name):
            if "MacRoman" in enc:
                self.base = "mac_roman"
        elif isinstance(enc, dict):
            base = enc.get("BaseEncoding")
            if base and "MacRoman" in str(base):
                self.base = "mac_roman"
            diffs = pdf.resolve(enc.get("Differences")) or []
            code = 0
            for item in diffs:
                if isinstance(item, (int, float)):
                    code = int(item)
                else:
                    ch = _glyphname_to_char(str(item))
                    if ch and code not in self.map:
                        self.map[code] = ch
                    code += 1

    def decode(self, raw: bytes) -> str:
        if self.two_byte:
            codes = [int.from_bytes(raw[k:k + 2], "big")
                     for k in range(0, len(raw) - len(raw) % 2, 2)]
        else:
            codes = list(raw)
        out = []
        for c in codes:
            if c in self.map:
                out.append(self.map[c])
            else:
                try:
                    out.append(bytes([c & 0xFF]).decode(self.base))
                except UnicodeDecodeError:
                    out.append("�")
        return "".join(out)


# ---------------------------------------------------------------------------
# content-stream interpretation

def _matmul(a, b):
    return (a[0] * b[0] + a[1] * b[2], a[0] * b[1] + a[1] * b[3],
            a[2] * b[0] + a[3] * b[2], a[2] * b[1] + a[3] * b[3],
            a[4] * b[0] + a[5] * b[2] + b[4],
            a[4] * b[1] + a[5] * b[3] + b[5])

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
_OP = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")
# PDF whitespace / delimiter classes (PDF 32000-1:2008 §7.2.2-7.2.3)
_PDF_WS = [b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "]
_PDF_DELIM = [b"(", b")", b"<", b">", b"[", b"]", b"{", b"}",
              b"/", b"%"]


def _content_tokens(data: bytes):
    i, n = 0, len(data)
    while i < n:
        i = _skip_ws(data, i)
        if i >= n:
            break
        c = data[i:i + 1]
        if c in b"/(<[" or c in b"+-." or c.isdigit():
            try:
                v, i = _parse(data, i)
            except (PDFSyntaxError, ValueError, IndexError):
                i += 1
                continue
            yield ("operand", v)
        else:
            m = _OP.match(data, i)
            if not m:
                i += 1
                continue
            op = m.group(0)
            i = m.end()
            if op == b"BI":  # inline image: skip to EI
                # 'EI' can occur inside the binary image payload;
                # accept it only when delimited by whitespace/EOF on
                # both sides, else the tokenizer desynchronizes and
                # corrupts the rest of the page's text
                j = i
                while True:
                    j = data.find(b"EI", j)
                    if j < 0:
                        i = n
                        break
                    before_ok = j == 0 or data[j - 1:j] in _PDF_WS
                    after = data[j + 2:j + 3]
                    after_ok = after == b"" or after in _PDF_WS \
                        or after in _PDF_DELIM
                    if before_ok and after_ok:
                        i = j + 2
                        break
                    j += 2
                continue
            yield ("op", op.decode("latin-1"))


def _interpret_page(pdf: PDFFile, content: bytes, fonts: dict) -> list:
    """Run text operators → list of (x, y, size, fontname, text) in
    device space (y-up)."""
    shows = []
    ctm_stack = []
    ctm = _ID
    tm = lm = _ID
    fs, fname, tl = 0.0, None, 0.0
    operands: list = []
    decoder = None
    for kind, v in _content_tokens(content):
        if kind == "operand":
            operands.append(v)
            continue
        op = v
        try:
            if op == "q":
                ctm_stack.append(ctm)
            elif op == "Q":
                ctm = ctm_stack.pop() if ctm_stack else _ID
            elif op == "cm" and len(operands) >= 6:
                ctm = _matmul(tuple(float(x) for x in operands[-6:]), ctm)
            elif op == "BT":
                tm = lm = _ID
            elif op == "Tm" and len(operands) >= 6:
                tm = lm = tuple(float(x) for x in operands[-6:])
            elif op == "Td" and len(operands) >= 2:
                tm = lm = _matmul(
                    (1, 0, 0, 1, float(operands[-2]), float(operands[-1])),
                    lm)
            elif op == "TD" and len(operands) >= 2:
                tl = -float(operands[-1])
                tm = lm = _matmul(
                    (1, 0, 0, 1, float(operands[-2]), float(operands[-1])),
                    lm)
            elif op == "T*":
                tm = lm = _matmul((1, 0, 0, 1, 0, -tl), lm)
            elif op == "TL":
                tl = float(operands[-1])
            elif op == "Tf" and len(operands) >= 2:
                fname = str(operands[-2])
                fs = float(operands[-1])
                fd = fonts.get(fname)
                decoder = _FontDecoder(pdf, fd) if fd else None
            elif op in ("Tj", "'", '"') or op == "TJ":
                if op == "'":
                    tm = lm = _matmul((1, 0, 0, 1, 0, -tl), lm)
                    payload = operands[-1:] if operands else []
                elif op == '"':
                    tm = lm = _matmul((1, 0, 0, 1, 0, -tl), lm)
                    payload = operands[-1:] if operands else []
                elif op == "Tj":
                    payload = operands[-1:] if operands else []
                else:
                    payload = operands[-1] if operands and \
                        isinstance(operands[-1], list) else []
                parts = []
                for item in payload:
                    if isinstance(item, bytes):
                        parts.append(decoder.decode(item) if decoder
                                     else item.decode("latin-1"))
                    elif isinstance(item, (int, float)) and item < -150:
                        parts.append(" ")  # big kern = word gap
                text = "".join(parts)
                if text:
                    trm = _matmul(_matmul((fs, 0, 0, fs, 0, 0), tm), ctm)
                    size = (trm[2] ** 2 + trm[3] ** 2) ** 0.5
                    shows.append((trm[4], trm[5], size, fname, text))
        except (ValueError, TypeError, IndexError):
            pass
        operands = []
    return shows


def _walk_pages(pdf: PDFFile, node, inherited, out):
    node = pdf.resolve(node)
    if not isinstance(node, dict):
        return
    inh = dict(inherited)
    for k in ("Resources", "MediaBox"):
        if k in node:
            inh[k] = node[k]
    t = str(pdf.resolve(node.get("Type")) or "")
    if t == "Pages" or ("Kids" in node and t != "Page"):
        for kid in pdf.resolve(node.get("Kids")) or []:
            _walk_pages(pdf, kid, inh, out)
    elif t == "Page" or "Contents" in node:
        out.append((node, inh))


def extract_pdf(data: bytes, zoom: float = ZOOM) -> PDFDocument:
    """Raw PDF bytes → :class:`PDFDocument` (approximate geometry,
    pdftohtml-like ``zoom``-scaled integer coordinates)."""
    if not data.startswith(b"%PDF"):
        raise PDFSyntaxError("not a PDF (magic missing)")
    pdf = PDFFile(data)
    root = next((v for v in pdf.objects.values()
                 if isinstance(v, dict)
                 and str(pdf.resolve(v.get("Type"))) == "Catalog"), None)
    if root is None:
        raise PDFSyntaxError("no document catalog found")
    pages: list = []
    _walk_pages(pdf, root.get("Pages"), {}, pages)
    doc = PDFDocument()
    for pageno, (node, inh) in enumerate(pages, 1):
        media = [float(x) for x in
                 (pdf.resolve(node.get("MediaBox"))
                  or inh.get("MediaBox") or [0, 0, 612, 792])]
        pw, ph = media[2] - media[0], media[3] - media[1]
        res = pdf.resolve(node.get("Resources")) or \
            pdf.resolve(inh.get("Resources")) or {}
        fonts = {k: pdf.resolve(v)
                 for k, v in (pdf.resolve(res.get("Font")) or {}).items()}
        contents = node.get("Contents")
        chunks = []
        for ref in (contents if isinstance(contents, list)
                    else [contents]):
            if ref is not None:
                chunks.append(pdf.stream_bytes(ref))
        shows = _interpret_page(pdf, b"\n".join(chunks), fonts)
        page = Page(number=pageno, width=round(pw * zoom),
                    height=round(ph * zoom))
        # group shows into lines by device y, top-down then left-right
        lines: dict = {}
        for x, y, size, fname, text in shows:
            lines.setdefault(round(y), []).append((x, size, fname, text))
        for y in sorted(lines, reverse=True):  # PDF y-up → top first
            row = sorted(lines[y], key=lambda t: t[0])
            text = ""
            prev_end = None
            for x, size, fname, t in row:
                # word-gap heuristic: only insert a space when the gap
                # to the previous run's ESTIMATED end (0.5 em/glyph —
                # no width tables in this minimal reader) exceeds a
                # third of an em
                if (text and not text.endswith(" ")
                        and not t.startswith(" ") and prev_end is not None
                        and x - prev_end > 0.33 * size):
                    text += " "
                text += t
                prev_end = x + 0.5 * size * len(t)
            text = " ".join(text.split())
            if not text:
                continue
            x0, size0, fname0, _ = row[0]
            fam = None
            fd = fonts.get(fname0) or {}
            base = pdf.resolve(fd.get("BaseFont"))
            if base:
                fam = str(base).split("+", 1)[-1]
            sz = round(size0 * zoom)
            fid = next((i for i, s in doc.fontspec.items()
                        if s["family"] == (fam or "unknown")
                        and s["size"] == sz), None)
            if fid is None:
                fid = len(doc.fontspec)
                doc.fontspec[fid] = {"family": fam or "unknown",
                                     "size": sz, "id": str(fid)}
            top = round((ph - y - size0) * zoom)
            left = round((x0 - media[0]) * zoom)
            width = round(len(text) * size0 * 0.5 * zoom)
            box = Textbox([Textelement(text, tag=None)],
                          top=max(top, 0), left=max(left, 0),
                          width=width, height=max(round(size0 * zoom), 1),
                          fontid=fid, fontspec=doc.fontspec)
            page.append(box)
        doc.append(page)
    return doc
