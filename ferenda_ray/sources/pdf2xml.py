"""PDF intermediate-format parsers: pdf2xml (poppler) and hOCR (tesseract).

The reference never reads PDF bytes directly: ``pdftohtml -xml``
produces a ``<pdf2xml>`` intermediate and ``tesseract`` produces hOCR
HTML, and the interesting work — the parse into Page / Textbox /
Textelement objects with font, position and formatting semantics — is
pure XML processing (``ferenda/pdfreader.py:522-921`` for pdf2xml,
``:405-520`` for hOCR).  This module re-implements that parse on the
engine's own element model so the checked-in reference intermediates
(``test/files/pdfreader/intermediate/*.xml``, ``*.hocr.html``) decode
bit-for-bit; only the binary→intermediate CONVERSION (which needs the
absent poppler/tesseract binaries) stays injectable.

Scale shape: one document's intermediate is parsed entirely inside a
``map_batches`` task (`textbox_rows`); nothing here touches the
driver.  Wide textbox rows stream into ``stages/pdfanalyze`` for the
distributed page-metrics aggregation.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from ..elements import CompoundElement, UnicodeElement

__all__ = [
    "Textelement", "LinkedTextelement", "Textbox", "Page", "PDFDocument",
    "parse_pdf2xml", "parse_hocr", "parse_fontinfo", "default_glue",
]

_WS_TRANS = {ord("\n"): " ", ord("\t"): " ", ord("\xa0"): " "}


def _normalize_space(s: str) -> str:
    return " ".join(s.split())


def _normspace(txt: str) -> str:
    """Collapse runs of whitespace but keep a single leading/trailing
    space (``pdfreader.py:849-859``)."""
    txt = txt.translate(_WS_TRANS)
    if re.match(r"  +$", txt):
        return " "
    endspace = " " if txt.endswith(" ") and len(txt) > 1 else ""
    startspace = " " if txt.startswith(" ") else ""
    return startspace + _normalize_space(txt) + endspace


def _boxtext(s) -> str:
    """Emptiness-check normalization (``pdfreader.py:560-561``)."""
    return re.sub(r"[\s\xa0\xc2]+", " ", str(s))


class Textelement(UnicodeElement):
    """A run of uniformly-formatted text.  ``tag`` is ``None`` or a
    combination of ``b``/``i`` (plus ``s``/``sup`` for footnote
    superscripts); semantics of ``pdfreader.py:1545-1618``."""

    def __new__(cls, text="", tag=None, **kwargs):
        return super().__new__(cls, text, tag=tag, **kwargs)

    def __add__(self, other):
        # space restoration between line fragments + mandatory
        # dehyphenation (pdfreader.py:1579-1618)
        if len(self) and not (self.endswith(" ") or self.endswith("-")
                              or str(other).startswith(" ")):
            extraspace = " "
        else:
            extraspace = ""
        strself, strother = str(self), str(other)
        if strself and strself[-1] == "-" and strother and strother[0].islower():
            strself = strself[:-1]
        kwargs = {}
        if getattr(self, "uri", None) is not None:
            kwargs["uri"] = self.uri
        return self.__class__(strself + extraspace + strother,
                              tag=self.tag, **kwargs)


class LinkedTextelement(Textelement):
    """Textelement carrying a hyperlink ``uri``
    (``pdfreader.py:1620-1651``)."""

    def __new__(cls, text="", tag=None, uri=None, **kwargs):
        return super().__new__(cls, text, tag=tag, uri=uri, **kwargs)

    def __add__(self, other):
        assert getattr(other, "uri", None) == self.uri, \
            "can't join LinkedTextelements with different URIs"
        new = super().__add__(other)
        new.uri = self.uri
        return new


class Textbox(CompoundElement):
    """Positioned box of Textelements sharing one font
    (``pdfreader.py:1289-1455``)."""

    def __init__(self, children=None, *, top, left, width, height,
                 fontid=0, fontspec=None, **kwargs):
        self.top = int(top)
        self.left = int(left)
        self.width = int(width)
        self.height = int(height)
        self.right = self.left + self.width
        self.bottom = self.top + self.height
        self.fontid = int(fontid) if fontid is not None else 0
        self._fontspec = fontspec if fontspec is not None else {}
        super().__init__(children, **kwargs)

    @property
    def font(self) -> dict:
        return self._fontspec.get(self.fontid, {})

    def __str__(self):
        return "".join(str(x) for x in self)

    def __repr__(self):
        s = str(self)
        if len(s) > 40:
            s = s[:25] + "[...]" + s[-10:]
        return '<Textbox %sx%s+%s+%s "%s">' % (
            self.width, self.height, self.left, self.top, s)

    def __add__(self, other: "Textbox") -> "Textbox":
        # expand dims, then re-run-length-encode elements by tag
        # (pdfreader.py:1364-1414)
        top = min(self.top, other.top)
        left = min(self.left, other.left)
        width = max(self.right, other.right) - left
        height = max(self.bottom, other.bottom) - top
        res = Textbox(top=top, left=left, width=width, height=height,
                      fontid=self.fontid, fontspec=self._fontspec)
        mine = list(self)
        # a missing newline between boxes becomes a space — except
        # around superscript (footnote-marker) elements
        if (mine and len(other) and
                not (mine[-1].tag and "s" in mine[-1].tag or
                     other[0].tag and "s" in other[0].tag) and
                not mine[-1].endswith((" ", "-", "–"))):
            mine.append(Textelement(" ", tag=mine[-1].tag))
        c = Textelement(tag=mine[0].tag if mine else None)
        for e in list(mine) + list(other):
            if e.tag != c.tag:
                if c:
                    res.append(c)
                res.append(e)
                c = Textelement(tag=e.tag)
            else:
                c = c + e
        if len(res) and c and c.tag == res[-1].tag and type(c) == type(res[-1]):
            res[-1] = res[-1] + c
        elif c:
            res.append(c)
        return res


class Page(CompoundElement):
    """A page of Textboxes (``pdfreader.py:1204-1286``)."""

    def __init__(self, children=None, *, number, width, height, **kwargs):
        self.number = number
        self.width = int(width)
        self.height = int(height)
        super().__init__(children, **kwargs)

    def boundingbox(self, top=0, left=0, bottom=None, right=None):
        """Yield the boxes that fit inside the given bounds
        (``pdfreader.py:1233-1248``)."""
        bottom = bottom if bottom else self.height
        right = right if right else self.width
        for box in self:
            if (box.top >= top and box.left >= left and
                    box.bottom <= bottom and box.right <= right):
                yield box

    def crop(self, top=0, left=0, bottom=None, right=None):
        """Keep only boxes inside the bounds, shifting their coords to
        the new origin (``pdfreader.py:1252-1266``; the
        background-image convert call is environmental and skipped)."""
        bottom = bottom if bottom else self.height
        right = right if right else self.width
        kept = []
        for box in self.boundingbox(top, left, bottom, right):
            box.top -= top
            box.left -= left
            # CONFORMANCE QUIRK: right/bottom shift by the crop-box
            # right/bottom (not left/top), leaving kept boxes with
            # non-positive extents — this reproduces the reference's
            # own bug (pdfreader.py:1258-1261) byte-for-byte; use
            # left+width / top+height downstream if real extents are
            # needed after a crop.
            box.right -= right
            box.bottom -= bottom
            kept.append(box)
        self[:] = kept
        self.width = right - left
        self.height = bottom - top

    def __str__(self):
        excerpt = " ".join(str(x) for x in self)
        return "Page %s (%d x %d): '%s...'" % (
            self.number, self.width, self.height, excerpt[:40])


class PDFDocument(CompoundElement):
    """Parsed PDF: a list of Pages + the shared fontspec dict
    (``PDFReader`` object surface, ``pdfreader.py:952-1036``)."""

    def __init__(self, children=None, fontspec=None, **kwargs):
        self.fontspec = fontspec if fontspec is not None else {}
        super().__init__(children, **kwargs)

    def is_empty(self) -> bool:
        return 0 == sum(len(p) for p in self)

    def median_box_width(self, threshold=0) -> int:
        widths = sorted(b.right - b.left for p in self for b in p
                        if b.right - b.left >= threshold)
        return widths[int(len(widths) / 2)]

    def textboxes(self, gluefunc=None, pageobjects=False, keepempty=False,
                  startpage=0, pagecount=None):
        """Stream textboxes, gluing adjacent ones when ``gluefunc``
        (called with ``(textbox, nextbox, prevbox)``) approves
        (``pdfreader.py:961-1024``)."""
        glue = gluefunc or default_glue
        pages = self[startpage:startpage + pagecount] if pagecount else self
        for page in pages:
            textbox = prevbox = None
            if pageobjects:
                yield page
            for nextbox in page:
                if not (keepempty or str(nextbox).strip()):
                    continue
                if textbox is None:
                    textbox = nextbox
                elif glue(textbox, nextbox, prevbox):
                    textbox = textbox + nextbox
                else:
                    yield textbox
                    textbox = nextbox
                prevbox = nextbox
            if textbox is not None:
                yield textbox


def default_glue(textbox, nextbox, prevbox):
    """Same font (modulo bold/italic), left-aligned, vertically adjacent
    within 1.5 line spacing (``pdfreader.py:1038-1070``)."""
    def basefamily(family):
        return family.replace("-", "").replace("Bold", "").replace("Italic", "")
    linespacing = 1.5
    tf, nf = textbox.font, nextbox.font
    return bool(
        basefamily(tf.get("family", "")) == basefamily(nf.get("family", "")) and
        tf.get("size") == nf.get("size") and
        textbox.left == nextbox.left and
        textbox.top < nextbox.top and
        textbox.bottom + (prevbox.height * linespacing) - prevbox.height
        >= nextbox.top)


# ---------------------------------------------------------------------------
# fontinfo (pdffonts output) parsing — pdfreader.py:524-557

_FONT_TYPES = ["Type 1C (OT)", "Type 1C", "Type 1", "Type 3",
               "TrueType (OT)", "CID Type 0C (OT)", "CID Type 0C",
               "CID Type 0", "CID TrueType (OT)", "CID TrueType"]


def parse_fontinfo(text: str) -> dict:
    """``pdffonts`` tabular output → ``{family: {col: val}}``."""
    fontinfo: dict = {}
    fields: list = []
    for line in text.splitlines():
        if not line.strip():
            continue
        if not fields:
            fields = line.split()
        elif not line.startswith("-----"):
            for t in _FONT_TYPES:  # collapse multi-word type names
                if t in line:
                    line = line.replace(t, t.replace(" ", ""))
            cols = line.split()
            if cols and cols[0] not in fontinfo:
                fontinfo[cols[0]] = dict(zip(fields, cols))
    return fontinfo


# ---------------------------------------------------------------------------
# pdf2xml parse — pdfreader.py:522-921

def _flatten(element, decoder_tags=None, keep_ws_only=False, tag="",
             uri=None, linked=False):
    """``<text>`` subtree → flat Textelement list with composed tags
    (``_parse_xml_make_textelement``, ``pdfreader.py:814-904``)."""
    def cleantag(t):
        t = t.replace("a", "") if "a" in t else t
        return t or None

    def mk(text, t, lnk, u):
        if lnk:
            return LinkedTextelement(_normspace(text), tag=cleantag(t), uri=u)
        return Textelement(_normspace(text), tag=cleantag(t))

    res: list = []
    orig_tag, orig_linked, orig_uri = tag, linked, uri
    if element.tag == "a":
        linked = True
        uri = element.get("href")
        tag = tag + "a"
    elif element.tag in ("b", "i"):
        if "a" in tag:
            linked = True
        tag = tag + element.tag
    if element.text and (element.text.strip() or element.tag == "a"
                         or keep_ws_only):
        res.append(mk(element.text, tag, linked, uri))
    children = list(element)
    for idx, child in enumerate(children):
        # allow a ws-only LAST child if the preceding run lacks a
        # trailing space ("<text>x<i> </i></text>" keeps the gap)
        kwso = (idx + 1 == len(children) and bool(res)
                and not res[-1][-1].isspace())
        res.extend(_flatten(child, keep_ws_only=kwso, tag=tag,
                            uri=uri, linked=linked))
    if element.tag != "text" and element.tail:
        if element.tail.strip():
            res.append(mk(element.tail, orig_tag, orig_linked, orig_uri))
        elif (res and not isinstance(res[-1], LinkedTextelement)
              and res[-1][-1] not in (" ", "–", "-")):
            # ws-only tail: move the space inside the previous element
            res[-1] = res[-1] + " "
    return res


def _make_textbox(element, nextelement, lastbox, page, fontspec,
                  detect_footnotes=True):
    """``<text>`` element → (Textbox, disposition) where disposition is
    ``"merge"`` (inline footnote marker — join the previous box),
    ``"footnote"`` (footer marker — new box, keep appending) or
    ``None`` (``_parse_xml_make_textbox``, ``pdfreader.py:712-807``)."""
    tes = _flatten(element)
    attribs = {k: element.get(k) for k in ("top", "left", "width", "height")}
    fontid = int(element.get("font"))
    thisfont = fontspec.get(fontid, {})
    lastfont = lastbox.font if lastbox is not None else None
    nextfont = None
    if nextelement is not None and nextelement.get("font") is not None:
        nextfont = fontspec.get(int(nextelement.get("font")), {})
    disposition = None
    if detect_footnotes and tes and tes[0].strip().isdigit():
        left, top = int(attribs["left"]), int(attribs["top"])
        height = int(attribs["height"])
        is_inline = (
            lastfont is not None and
            lastfont.get("family") == thisfont.get("family") and
            (lastfont.get("size") or 0) > (thisfont.get("size") or 0) and
            -5 < left - lastbox.right < 10 and
            0 < lastbox.bottom - (top + height) < 20)
        is_footer = (
            nextfont is not None and
            thisfont.get("family") == nextfont.get("family") and
            (thisfont.get("size") or 0) < (nextfont.get("size") or 0) and
            -5 < int(nextelement.get("left")) - (left + int(attribs["width"])) < 10 and
            0 < (int(nextelement.get("top")) + int(nextelement.get("height")))
            - (top + height) < 20)
        if is_inline or is_footer:
            first = tes[0]
            if isinstance(first, LinkedTextelement) or first.tag:
                tes[0] = type(first)(str(first), tag=(first.tag or "") + "s",
                                     **({"uri": first.uri}
                                        if isinstance(first, LinkedTextelement)
                                        else {}))
            else:
                tes[0] = Textelement(str(first), tag="sup")
            if lastbox is not None and abs(lastbox.right - left) < 3:
                disposition = "merge"
            elif min([x.left for x in page] + [0]) - left < 3:
                # footer marker: box geometry/font follows the NEXT
                # element (the footnote body text)
                if nextelement is not None:
                    attribs["top"] = nextelement.get("top")
                    attribs["height"] = nextelement.get("height")
                    fontid = int(nextelement.get("font"))
                disposition = "footnote"
    # merge whitespace-only elements into their (compatible) neighbor
    merged: list = []
    for x in tes:
        if (merged and x and not x.strip() and type(merged[-1]) == type(x)
                and getattr(merged[-1], "uri", None) == getattr(x, "uri", None)):
            merged[-1] = merged[-1] + x
        else:
            merged.append(x)
    if not merged:
        return None, None
    box = Textbox(merged, fontid=fontid, fontspec=fontspec, **attribs)
    return box, disposition


def parse_pdf2xml(data: bytes, fontinfo: dict | None = None,
                  decoder=None, detect_footnotes: bool = True) -> PDFDocument:
    """Parse a poppler ``pdftohtml -xml`` intermediate into a
    :class:`PDFDocument` (``_parse_xml``, ``pdfreader.py:522-709``).

    ``fontinfo`` is the parsed ``pdffonts`` table (font encodings);
    ``decoder`` is an optional callable ``(Textbox, fontspec) ->
    Textbox`` applied to every box (custom-encoding decode hooks,
    semantics of ``BaseTextDecoder``, ``pdfreader.py:1653-1661``)."""
    fontinfo = fontinfo or {}
    if "Custom" in [f.get("encoding") for f in fontinfo.values()]:
        # pdftohtml emits raw control bytes for custom-encoded fonts;
        # double-escape them so XML parse survives and the decoder can
        # see them as literal "&#N;" (pdfreader.py:564-609)
        out = bytearray()
        for b in bytes(data):
            if b < 0x20 and b not in (0x0A, 0x0D):
                out += b"&amp;#%d;" % b
            else:
                out.append(b)
        data = bytes(out)
    root = ET.fromstring(data)
    assert root.tag == "pdf2xml", "unexpected root <%s>" % root.tag
    if hasattr(decoder, "analyze_font"):
        _analyze_font_encodings(root, fontinfo, decoder)
    doc = PDFDocument()
    for pageelement in root:
        if pageelement.tag != "page":
            continue  # <outline> etc.
        page = Page(number=int(pageelement.get("number")),
                    width=int(pageelement.get("width")),
                    height=int(pageelement.get("height")))
        after_footnote = False
        elements = [e for e in pageelement if e.tag in
                    ("text", "fontspec", "image")]
        for i, element in enumerate(elements):
            if element.tag == "image":
                continue
            if element.tag == "fontspec":
                _add_fontspec(element, fontinfo, doc.fontspec, decoder)
                continue
            # skip empty boxes ("<text><i> </i></text>")
            if (((element.text and _boxtext(element.text).strip() == "") or
                 element.text is None) and not list(element)):
                continue
            # the reference peeks at the IMMEDIATELY following element
            # (pdfreader.py:680-683); only a <text> carries usable
            # font/geometry
            nextelement = elements[i + 1] if i + 1 < len(elements) else None
            if nextelement is not None and nextelement.tag != "text":
                nextelement = None
            lastbox = page[-1] if len(page) else None
            box, disposition = _make_textbox(
                element, nextelement, lastbox, page, doc.fontspec,
                detect_footnotes)
            if box is None:
                continue
            # inline footnote markers merge UNDECODED
            # (pdfreader.py:747-751 returns before the decoder call)
            if decoder is not None and callable(decoder) and \
                    disposition != "merge":
                box = decoder(box, doc.fontspec)
            if disposition == "merge":
                page[-1] = page[-1] + box
                after_footnote = True
            elif disposition == "footnote" or (
                    len(box) and box[0].tag
                    and box[0].tag.endswith(("sup", "s"))):
                page.append(box)
                after_footnote = True
            elif after_footnote and abs(page[-1].right - box.left) < 3:
                page[-1] = page[-1] + box
                after_footnote = False
            else:
                page.append(box)
                after_footnote = False
        doc.append(page)
    return doc


def _analyze_font_encodings(root, fontinfo, decoder):
    """Feed ≤10 sample ``<text>`` elements per Custom-encoded font to
    an auto-detecting decoder (``pdfreader.py:923-950``)."""
    samples: dict = {}
    for pageelement in root:
        for e in pageelement:
            if e.tag == "fontspec":
                family = e.get("family")
                if (fontinfo.get(family)
                        and fontinfo[family].get("encoding") == "Custom"):
                    samples[e.get("id")] = []
            elif e.tag == "text" and e.get("font") in samples:
                if len(samples[e.get("font")]) < 10:
                    samples[e.get("font")].append(e)
    for fontid, elems in samples.items():
        try:
            decoder.analyze_font(fontid, elems)
        except Exception:
            # undetectable: leave the font undecoded (reference logs
            # and continues, pdfreader.py:949-950)
            pass


def _add_fontspec(element, fontinfo, fontspec, decoder=None):
    """Register a ``<fontspec>`` (``pdfreader.py:907-920``); a decoder
    with a ``fontspec`` method may rewrite it (font-alias hooks)."""
    fontid = int(element.get("id"))
    fspec = {k: str(v) for k, v in element.attrib.items()}
    fspec["size"] = int(fspec["size"])
    if fontinfo.get(fspec["family"]):
        fspec["encoding"] = fontinfo[fspec["family"]]["encoding"]
    if "+" in fspec["family"]:
        fspec["family"] = fspec["family"].split("+", 1)[1]
    if decoder is not None and hasattr(decoder, "fontspec"):
        fspec = decoder.fontspec(fspec)
    fontspec[fontid] = fspec


# ---------------------------------------------------------------------------
# hOCR parse (tesseract output for scanned PDFs) — pdfreader.py:403-520

_XHTML = "{http://www.w3.org/1999/xhtml}"
_DIMS = re.compile(
    r"bbox (?P<left>\d+) (?P<top>\d+) (?P<right>\d+) (?P<bottom>\d+)"
    r"(; x_wconf (?P<confidence>\d+)|)")


def parse_hocr(data: bytes) -> PDFDocument:
    """Parse tesseract hOCR output into a :class:`PDFDocument`,
    scaling pixel coords to points against an A4 page height
    (``_parse_hocr``, ``pdfreader.py:405-520``)."""
    root = ET.fromstring(data)
    doc = PDFDocument()
    pageheight_in_points = 11.69 / (1 / 72)  # A4
    for pageelement in root.iter(_XHTML + "div"):
        if pageelement.get("class") != "ocr_page":
            continue
        bbox = _DIMS.search(pageelement.get("title"))
        px_per_point = ((int(bbox.group("bottom")) - int(bbox.group("top")))
                        / pageheight_in_points)

        def dims(s):
            m = _DIMS.search(s)
            res = {k: round(int(v) / px_per_point)
                   for k, v in m.groupdict().items()
                   if k != "confidence" and v is not None}
            if m.group("confidence"):
                res["confidence"] = int(m.group("confidence"))
            return res

        d = dims(pageelement.get("title"))
        page = Page(number=int(pageelement.get("id")[5:]),
                    width=d["right"] - d["left"],
                    height=d["bottom"] - d["top"])
        for line in pageelement.iter(_XHTML + "span"):
            if line.get("class") != "ocr_line":
                continue
            boxdim = dims(line.get("title"))
            tes, confidence, conflen = [], 0, 0
            for word in line.iter(_XHTML + "span"):
                if word.get("class") != "ocrx_word":
                    continue
                wd = dims(word.get("title"))
                t = "".join(word.itertext()) + (word.tail or "")
                if not t.strip():
                    continue
                t = t.replace("\n", " ")
                children = list(word)
                tag = None
                if children:
                    tag = {_XHTML + "em": "i",
                           _XHTML + "strong": "b"}.get(children[0].tag)
                te = Textelement(t, tag=tag)
                te.top, te.left = wd["top"], wd["left"]
                te.width = wd["right"] - wd["left"]
                te.height = wd["bottom"] - wd["top"]
                tes.append(te)
                tlen = len(t.strip())
                confidence += wd.get("confidence", 0) * tlen
                conflen += tlen
            if not tes:
                continue
            avgheight = sum(x.height for x in tes) // len(tes)
            if tes[0].strip().isdigit() and tes[0].height <= avgheight / 2:
                tes[0] = Textelement(str(tes[0]), tag="sup")
            fspec = {"family": "unknown", "size": avgheight}
            fontid = next((fid for fid, s in doc.fontspec.items()
                           if s["size"] == fspec["size"]
                           and s["family"] == fspec["family"]), None)
            if fontid is None:
                fontid = len(doc.fontspec)
                doc.fontspec[fontid] = fspec
            box = Textbox(tes, top=boxdim["top"], left=boxdim["left"],
                          width=boxdim["right"] - boxdim["left"],
                          height=boxdim["bottom"] - boxdim["top"],
                          fontid=fontid, fontspec=doc.fontspec)
            box.confidence = confidence / conflen if conflen else 0
            page.append(box)
        doc.append(page)
    return doc


# ---------------------------------------------------------------------------
# Row emission for the Ray stages

def textbox_rows(doc_id, doc: PDFDocument) -> list:
    """Flatten a parsed document into textbox dicts matching
    ``stages/pdfanalyze.TEXTBOX_SCHEMA`` (+ ``font_id``)."""
    rows = []
    for page in doc:
        for box in page:
            font = box.font
            rows.append({
                "doc_id": doc_id, "page": page.number,
                "left": box.left, "top": box.top,
                "right": box.right, "bottom": box.bottom,
                "font_id": box.fontid,
                "font_family": font.get("family", "unknown"),
                "font_size": int(font.get("size", 0)),
                "text": str(box),
                "page_width": page.width, "page_height": page.height,
            })
    return rows
