"""Custom-font text decoders for pdf2xml intermediates.

Some PDF producers emit fonts with a *custom encoding*: the glyph
codes are plain character codes shifted by a fixed offset, so
``pdftohtml`` output is mojibake until translated back.  The reference
handles this with a decoder family
(``ferenda/sources/legal/se/decoders.py:13-274``) plugged into the
PDF parse; this module re-implements those semantics generically:

- :class:`OffsetDecoder`: one low offset for the ASCII range, one
  high offset for the 0x80+ range (``OffsetDecoder1d``,
  ``decoders.py:13-95``).
- :class:`OffsetDecoder20`: 0x20/0x40 offsets with pass-through
  spaces and the partially-encoded-leader heuristics
  (``decoders.py:99-208``).
- :class:`DetectingDecoder`: tries candidate offsets per font and
  keeps the first whose decoded sample reads as natural language
  (``decoders.py:216-274``; the reference uses langdetect — absent
  here, so the engine's own stopword-profile heuristic
  (``stages/text_analysis._LANG_PROFILES``) stands in).

Decoders are INJECTED per parse (``parse_pdf2xml(decoder=...)``) and
are plain picklable objects, so an actor pool can hold one per worker.
"""

from __future__ import annotations

import re

from ..stages.text_analysis import _LANG_PROFILES
from .pdf2xml import Textelement

__all__ = ["OffsetDecoder", "OffsetDecoder20", "DetectingDecoder",
           "PDFDecodeError", "detect_lang"]


class PDFDecodeError(Exception):
    pass


# pdf2xml font-family aliases: the same physical font surfaces under
# different names depending on the producer toolchain
# (decoders.py:69-95)
FAMILY_ALIASES = {
    "Times New Roman": "TimesNewRomanPSMT",
    "Times New Roman,Italic": "TimesNewRomanPS-ItalicMT",
    "Times New Roman,Bold": "TimesNewRomanPS-BoldMT",
    "Times New Roman,BoldItalic": "TimesNewRomanPS-BoldItalicMT",
    "TTA1o00": "TT5Eo00",  # superscript variant of the same font
}

_XMLCHARREF = re.compile(r"&#\d+;")


def detect_lang(text: str, casefold: bool = False) -> str:
    """Stopword-ratio language guess (same profiles as the
    ``language_id`` stage); ``und`` when nothing scores.  Encoding
    detection matches case-SENSITIVELY: wrongly-decoded mojibake often
    preserves stopwords in shifted case ("OCH"), which must not count
    as a hit."""
    toks = text.lower().split() if casefold else text.split()
    n = max(1, len(toks))
    best_lang, best = "und", 0.0
    for lang, prof in _LANG_PROFILES.items():
        s = sum(1 for w in toks if w in prof) / n
        if s > best:
            best_lang, best = lang, s
    return best_lang if best > 0.0 else "und"


class OffsetDecoder:
    """Fixed-offset custom-encoding decoder (``OffsetDecoder1d``
    semantics, ``decoders.py:13-95``): ASCII printable range shifted
    by ``low_offset``, 0x80+ range (assumed cp1252-ish) by
    ``high_offset``."""

    low_offset = 0x1D
    high_offset = 0x7A
    unmapped: tuple = ()

    def __init__(self, dummy=None):
        self.map = self.encodingmap(self.low_offset, self.high_offset,
                                    self.unmapped)

    @staticmethod
    def encodingmap(low_offset, high_offset, unmapped) -> dict:
        m = {}
        for i in range(0x20, 0x7E):
            m[i - low_offset] = i
        for i in unmapped:
            m[i] = i
        for i in range(0x80, 0xFF):
            if i - high_offset not in m:
                m[i - high_offset] = i
        return m

    def decode_string(self, s: str, encoding_map: dict) -> str:
        # control bytes were double-escaped to literal "&#N;" during
        # the byte preprocessing (pdf2xml.parse_pdf2xml) — restore
        # them before translating
        s = _XMLCHARREF.sub(lambda m: chr(int(m.group(0)[2:-1])), s)
        return s.translate(encoding_map)

    def _decode_box(self, textbox, encoding_map):
        # if the box mixes <i> and plain runs, only the <i> runs are
        # encoded (matches producer behavior; decoders.py:57-66)
        decode_all = "i" not in [getattr(x, "tag", None) for x in textbox]
        for idx, part in enumerate(textbox):
            if isinstance(part, Textelement) and (decode_all
                                                 or part.tag == "i"):
                textbox[idx] = Textelement(
                    self.decode_string(part, encoding_map), tag=part.tag)
        return textbox

    def __call__(self, textbox, fontspecs):
        spec = fontspecs.get(textbox.fontid, {})
        if spec.get("encoding") != "Custom":
            return textbox
        return self._decode_box(textbox, self.map)

    def fontspec(self, fontspec: dict) -> dict:
        fam = fontspec.get("family")
        if fam in FAMILY_ALIASES:
            fontspec["family"] = FAMILY_ALIASES[fam]
        return fontspec


class OffsetDecoder20(OffsetDecoder):
    """0x20/0x40-offset decoder with pass-through spaces and
    handling for boxes where only a leading bold run is encoded
    (``decoders.py:99-208``).  ``bold_families`` / ``italic_families``
    name the producer's encoded bold/italic font families;
    ``fixedleaders`` are regexes (in DECODED text) for known bold
    lead-in phrases; ``extra_leader`` appends a name whose
    "<name>s (assessment|proposal)"-style leads are also bold."""

    low_offset = 0x20
    high_offset = 0x40
    unmapped = (0x20,)
    fixedleaders = [
        "(Skälen för r|R)egeringens (bedömning och förslag|bedömning"
        "|förslag):",
        "Remissinstanserna:",
    ]
    bold_family = "Times.New.Roman.Fet0100"
    italic_family = "Times.New.Roman.Kursiv0104"
    plain_family = "Times-Roman"

    def __init__(self, kommittenamn=None):
        super().__init__()
        self.reversemap = {v: k for k, v in self.map.items()}
        for c in "|()":  # keep regex metachars intact when encoding
            self.reversemap[ord(c)] = ord(c)
        leaders = list(self.fixedleaders)
        if kommittenamn:
            leaders.append(kommittenamn +
                           "s (bedömning och förslag|bedömning|förslag)")
        self.re_fixedleaders = re.compile(
            "(%s)" % "|".join(self.encode_string(x) for x in leaders))

    def encode_string(self, s: str) -> str:
        s = s.translate(self.reversemap)
        out = []
        for c in s:
            b = ord(c)
            if b < 0x20 and b not in (0x9, 0xA, 0xD):
                out.append("&#%d;" % b)
            elif c == "$":
                out.append("\\" + c)
            else:
                out.append(c)
        return "".join(out)

    def find_fontid(self, fontspecs, family, size):
        for fontid, spec in fontspecs.items():
            if spec["family"] == family and spec["size"] == size:
                return fontid
        raise KeyError("no fontspec matching (%s, %s)" % (family, size))

    def __call__(self, textbox, fontspecs):
        spec = fontspecs.get(textbox.fontid, {})
        if spec.get("encoding") != "Custom":
            return textbox
        font = textbox.font
        if font.get("family") == self.bold_family:
            # partially-encoded boxes: only the (unmarked) leading
            # bold run is encoded.  Find the boundary either by the
            # encoded section sign ("N g ..." where g decodes to §)
            # or by a known lead-in phrase.
            boundary = None
            first = str(textbox[0])
            if (len(first.split(" ", 2)) == 3 and
                    first.split(" ", 2)[1] == "g"):
                boundary = first.index(" ", first.index(" ") + 1)
            else:
                m = self.re_fixedleaders.match(first)
                if m:
                    boundary = m.end()
            if boundary:
                textbox[0] = Textelement(
                    self.decode_string(first[:boundary], self.map), tag="b")
                textbox.insert(1, Textelement(first[boundary:], tag=None))
                newfontid = self.find_fontid(fontspecs, self.plain_family,
                                             font["size"])
                expected_length = 2
            else:
                textbox[0] = Textelement(
                    self.decode_string(first, self.map), tag=textbox[0].tag)
                expected_length = 1
                newfontid = textbox.fontid
            if len(textbox) > expected_length:
                decoded = textbox[:expected_length]
                textbox[:] = textbox[expected_length:]
                textbox = self._decode_box(textbox, self.map)
                textbox[:] = decoded + textbox[:]
            textbox.fontid = newfontid
        else:
            textbox = self._decode_box(textbox, self.map)
            # a box specced as the italic font whose runs carry <i>
            # tags should take the plain font (the <i> markup already
            # says it)
            if (textbox.font.get("family") == self.italic_family and
                    "i" in [x.tag for x in textbox]):
                textbox.fontid = self.find_fontid(
                    fontspecs, self.plain_family, textbox.font["size"])
        return textbox


class DetectingDecoder(OffsetDecoder):
    """Per-font offset autodetection (``decoders.py:216-274``): decode
    a sample with each candidate offset pair and keep the first that
    reads as the expected language."""

    candidates = ((0, 0, ()), (0x1D, 0x7A, ()), (0x20, 0x40, (0x20,)))

    def __init__(self, dummy=None, lang: str = "sv"):
        super().__init__()
        self.lang = lang
        self.encodingmaps: dict = {}

    def analyze_font(self, fontid, samples):
        """``samples`` are raw ``<text>`` etree elements using this
        font; returns the chosen low offset (diagnostics)."""
        sampletext = ""
        for element in samples:
            tags = [c.tag for c in element]
            if "i" not in tags:
                sampletext += "".join(element.itertext())
            else:
                for child in element:
                    if child.tag == "i" and child.text:
                        sampletext += child.text
        for low, high, unmapped in self.candidates:
            if low or high:
                emap = self.encodingmap(low, high, unmapped)
                decoded = self.decode_string(sampletext, emap)
            else:
                emap, decoded = None, sampletext
            if detect_lang(decoded) == self.lang:
                self.encodingmaps[int(fontid)] = emap
                return low
        raise PDFDecodeError("cannot detect how to decode font %s from %r"
                             % (fontid, sampletext[:80]))

    def __call__(self, textbox, fontspecs):
        spec = fontspecs.get(textbox.fontid, {})
        if (spec.get("encoding") != "Custom" or
                self.encodingmaps.get(textbox.fontid) is None):
            return textbox
        return self._decode_box(textbox, self.encodingmaps[textbox.fontid])
