# -*- coding: utf-8 -*-
"""Conformance: pdf2xml / hOCR parsing vs the reference's OWN fixtures.

Every expectation below is ported from the reference's test suite
(``test/testPDFReader.py``, ``test/testPDFAnalyze.py``) and runs over
the reference's checked-in intermediate files — not self-generated
goldens.  No Ray needed: the parse is the per-task UDF body.
"""

import os

import pytest

from ferenda_ray.sources.pdf2xml import (
    LinkedTextelement, Textelement, parse_fontinfo, parse_hocr,
    parse_pdf2xml, textbox_rows,
)
from ferenda_ray.stages import pdfanalyze

FIXDIR = "/root/reference/test/files/pdfreader/intermediate"
ANADIR = "/root/reference/test/files/pdfanalyze"

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(FIXDIR), reason="reference fixtures not available")


def _fix(name, d=FIXDIR):
    with open(os.path.join(d, name), "rb") as f:
        return f.read()


def _parse_frag(frag, **kwargs):
    """Wrap an XML fragment the way testPDFReader.ParseXML does
    (``testPDFReader.py:343-358``)."""
    xml = ('<?xml version="1.0" encoding="UTF-8"?>\n'
           '<pdf2xml producer="poppler" version="0.24.3">\n'
           '<page number="1" position="absolute" top="0" left="0" '
           'height="750" width="500">\n%s\n</page>\n</pdf2xml>' % frag)
    return parse_pdf2xml(xml.encode("utf-8"), **kwargs)


def _norm(s):
    return " ".join(str(s).split())


# --- testPDFReader.Read.test_basic over sample.xml --------------------------

@needs_fixtures
def test_sample_basic():
    doc = parse_pdf2xml(_fix("sample.xml"))
    assert not doc.is_empty()
    assert len(doc) == 1
    assert str(doc[0][0]) == "Document title "
    assert doc.median_box_width() == 570
    page = doc[0]
    assert str(page) == ("Page 1 (892 x 1263): 'Document title  This is a "
                         "simple documen...'")
    # nine nonempty textboxes; a smaller bounding box yields one
    assert len(list(page.boundingbox())) == 9
    assert len(list(page.boundingbox(190, 130, 230, 460))) == 1
    box = next(page.boundingbox(190, 130, 230, 460))
    assert str(box) == "This is a simple document in PDF format. "
    assert box.font["color"] == "#000000"
    assert box.font["size"] == 16
    assert box.font["id"] == "1"
    assert box.font["family"] == "Cambria"  # subset prefix stripped
    assert len(box) == 4
    assert [e.tag for e in box] == [None, "i", "ib", None]


@needs_fixtures
def test_sample_crop():
    doc = parse_pdf2xml(_fix("sample.xml"))
    page = doc[0]
    page.crop(190, 130, 230, 460)
    boxes = list(page.boundingbox())
    assert len(boxes) == 1
    assert str(boxes[0]) == "This is a simple document in PDF format. "


# --- testPDFReader.ParseXML ports -------------------------------------------

def test_grandchildren():
    doc = _parse_frag("""
<fontspec id="12" size="11" family="TimesNewRomanPS-BoldItalicMT" color="#000000"/>
<text top="270" left="278" width="450" height="12" font="12">
   <i><b>52 par</b> Sanktionsavgiften ska </i>
</text>""")
    box = doc[0][0]
    assert len(box) == 2
    assert box[0].tag == "ib" and box[0] == "52 par"
    assert box[1].tag == "i" and box[1] == " Sanktionsavgiften ska "


def test_whitespace_normalization():
    doc = _parse_frag(
        '<fontspec id="0" size="21" family="CCQUSK+Calibri-Bold" color="#345a8a"/>\n'
        '<text top="146" left="135" width="155" height="29" font="0">'
        '<b>Document\t  title\t  </b></text>')
    assert str(doc[0][0]) == "Document title "


def test_multiple_textelements():
    doc = _parse_frag("""
<fontspec id="1" size="5" family="X" color="#00000"/>
<text top="0" left="0" width="23" height="13" font="1"><b>foo</b> <b>bar</b></text>""")
    box = doc[0][0]
    # the space between the two <b> runs must not get lost
    assert str(box) == "foo bar"
    assert [(str(e), e.tag) for e in box] == [("foo ", "b"), ("bar", "b")]
    merged = box[0] + box[1]
    assert (str(merged), merged.tag) == ("foo bar", "b")

    doc = _parse_frag("""
<fontspec id="0" size="5" family="X" color="#00000"/>
<text top="374" left="508" width="211" height="14" font="0">näringsidkaren <i>en</i> <i>varning. En var-</i></text>""")
    box = doc[0][0]
    assert box.bottom == 388 and box.right == 719
    assert [(str(e), e.tag) for e in box] == [
        ("näringsidkaren ", None), ("en ", "i"), ("varning. En var-", "i")]


def test_footnote():
    doc = _parse_frag("""
<fontspec id="7" size="14" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<fontspec id="15" size="7" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<text top="830" left="85" width="241" height="20" font="7">bindande verkan för det allmänna.</text>
<text top="829" left="327" width="5" height="12" font="15">7</text>
<text top="830" left="332" width="227" height="20" font="7">Bestämmelsen kan således inte </text>""")
    page = doc[0]
    assert len(page) == 1
    box = page[0]
    assert (box.top, box.left, box.width, box.height, box.right,
            box.bottom, box.fontid) == (829, 85, 474, 21, 559, 850, 7)
    assert [(str(e), e.tag) for e in box] == [
        ("bindande verkan för det allmänna.", None),
        ("7", "sup"),
        ("Bestämmelsen kan således inte ", None)]


def test_footnote_lineending():
    doc = _parse_frag("""
<fontspec id="0" size="13" family="GGKKGC+TimesNewRomanPSMT" color="#000000"/>
<fontspec id="4" size="13" family="GGKKID+TimesNewRomanPS-ItalicMT" color="#000000"/>
<fontspec id="7" size="7" family="GGKKGC+TimesNewRomanPSMT" color="#000000"/>
<text top="161" left="291" width="401" height="17" font="0">Härigenom föreskrivs i fråga om mervärdesskattelagen (1994:200)</text>
<text top="159" left="692" width="5" height="11" font="7">7</text>
<text top="161" left="697" width="4" height="17" font="0"> </text>
<text top="178" left="291" width="249" height="17" font="4"><i>dels</i> att 1 kap. 12 § ska upphöra att gälla, </text>""")
    page = doc[0]
    assert len(page) == 2
    b0, b1 = page
    assert (b0.top, b0.left, b0.width, b0.height, b0.fontid) == \
        (159, 291, 406, 19, 0)
    assert [(str(e), e.tag) for e in b0] == [
        ("Härigenom föreskrivs i fråga om mervärdesskattelagen (1994:200)",
         None), ("7", "sup")]
    assert (b1.top, b1.left, b1.fontid) == (178, 291, 4)
    assert [(str(e), e.tag) for e in b1] == [
        ("dels", "i"), (" att 1 kap. 12 § ska upphöra att gälla, ", None)]


def test_linked_footnote():
    uri = "unik-kunskap-genom-registerforskning-sou-201445.html#120"
    doc = _parse_frag("""
<fontspec id="7" size="14" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<fontspec id="15" size="7" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<text top="830" left="85" width="241" height="20" font="7">bindande verkan för det allmänna.</text>
<text top="829" left="327" width="5" height="12" font="15"><a href="%s">7</a></text>
<text top="830" left="332" width="227" height="20" font="7"><a href="%s"> </a>Bestämmelsen kan således inte </text>""" % (uri, uri))
    page = doc[0]
    assert len(page) == 1
    box = page[0]
    assert [(type(e).__name__, str(e), e.tag) for e in box] == [
        ("Textelement", "bindande verkan för det allmänna.", None),
        ("LinkedTextelement", "7", "s"),
        ("LinkedTextelement", " ", None),
        ("Textelement", "Bestämmelsen kan således inte ", None)]
    assert box[1].uri == uri and box[2].uri == uri


def test_footnote_footer():
    doc = _parse_frag("""
<fontspec id="7" size="14" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<fontspec id="15" size="7" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<fontspec id="16" size="10" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<fontspec id="17" size="5" family="TROYEM+OriginalGaramondBT-Roman" color="#000000"/>
<text top="849" left="85" width="472" height="20" font="7">ligga till grund för några individuella rättigheter. I 2 kap. 4 och 5 §§ </text>
<text top="891" left="85" width="4" height="9" font="17">7</text>
<text top="891" left="89" width="258" height="15" font="16"> Prop. 1975/76:209 s. 128, prop. 2009/10:80 s. 173. </text>""")
    page = doc[0]
    assert len(page) == 2
    footer = page[1]
    assert (footer.top, footer.left, footer.right, footer.bottom,
            footer.fontid) == (891, 85, 347, 906, 16)
    assert [(str(e), e.tag) for e in footer] == [
        ("7", "sup"),
        (" Prop. 1975/76:209 s. 128, prop. 2009/10:80 s. 173. ", None)]


def test_links():
    doc = _parse_frag("""
<fontspec id="6" size="14" family="CNMEID+TradeGothic,Bold" color="#000000"/>
<fontspec id="8" size="14" family="CNMEIF+OrigGarmndBT" color="#000000"/>
<text top="310" left="81" width="10" height="20" font="6"><a href="nya-avfallsregler-ds-200937.html#7"><b>1</b></a></text>
<text top="384" left="81" width="21" height="20" font="8"><a href="nya-avfallsregler-ds-200937.html#9">2.1</a></text>""")
    page = doc[0]
    assert isinstance(page[0][0], LinkedTextelement)
    assert page[0][0] == "1" and page[0][0].tag == "b"
    assert page[0][0].uri == "nya-avfallsregler-ds-200937.html#7"
    assert isinstance(page[1][0], LinkedTextelement)
    assert page[1][0] == "2.1" and page[1][0].tag is None
    assert page[1][0].uri == "nya-avfallsregler-ds-200937.html#9"


def test_comment():
    doc = _parse_frag("""
<fontspec id="1" size="11" family="TimesNewRomanPS" color="#000000"/>
<text top="270" left="278" width="450" height="12" font="1">First line</text>
<!-- comments are never emitted by pdftohtml but appear in testcases -->
<text top="290" left="278" width="450" height="12" font="1">Second line</text>""")
    assert [str(b) for b in doc[0]] == ["First line", "Second line"]


# --- glue / textboxes() -----------------------------------------------------

@needs_fixtures
def test_textboxes_glue():
    doc = parse_pdf2xml(_fix("sample.xml"))
    glued = list(doc.textboxes())
    # the three physical lines of the "spans three lines" paragraph
    # merge into one logical box (testPDFReader comment in sample.xml)
    para = [str(b) for b in glued if "spans three lines" in str(b)]
    assert len(para) == 1
    assert "single box by the textboxes() method." in para[0]
    assert len(glued) < 9


# --- real linked fixtures ---------------------------------------------------

@needs_fixtures
def test_links_fixture():
    doc = parse_pdf2xml(_fix("links.xml"))
    links = [e for p in doc for b in p for e in b
             if isinstance(e, LinkedTextelement)]
    assert links, "links.xml should produce LinkedTextelements"
    assert all(e.uri for e in links)


@needs_fixtures
def test_linked_footnote_fixture():
    doc = parse_pdf2xml(_fix("linked-footnote.xml"))
    sups = [e for p in doc for b in p for e in b
            if e.tag and e.tag.endswith(("s", "sup"))]
    assert not doc.is_empty()
    assert sups, "fixture contains footnote markers"


@needs_fixtures
def test_custom_encoding_fixture_survives():
    # without a decoder the custom-encoded boxes stay escaped, but the
    # parse itself (incl. the control-byte preprocessing,
    # pdfreader.py:564-609) must survive
    fontinfo = parse_fontinfo(
        _fix("custom-encoding.xml.fontinfo").decode("utf8", "replace"))
    assert "Custom" in [f.get("encoding") for f in fontinfo.values()]
    doc = parse_pdf2xml(_fix("custom-encoding.xml"), fontinfo=fontinfo)
    assert not doc.is_empty()


# --- custom-encoding decoders — testPDFReader.Decoding ----------------------

def _fontinfo(name, d=FIXDIR):
    return parse_fontinfo(_fix(name, d).decode("utf8", "replace"))


@needs_fixtures
def test_1d_encoding():
    # testPDFReader.Decoding.test_1d_encoding
    from ferenda_ray.sources.pdfdecode import OffsetDecoder
    doc = parse_pdf2xml(_fix("custom-encoding.xml"),
                        fontinfo=_fontinfo("custom-encoding.xml.fontinfo"),
                        decoder=OffsetDecoder())
    tbs = list(doc.textboxes())
    assert str(tbs[5]) == "Göran Persson"
    assert str(tbs[6]) == "Bosse Ringholm"
    assert str(tbs[7]) == "(Finansdepartementet)"


@needs_fixtures
def test_20_encoding():
    # testPDFReader.Decoding.test_20_encoding
    from ferenda_ray.sources.pdfdecode import OffsetDecoder20
    doc = parse_pdf2xml(
        _fix("prop_1997_98_44.xml"),
        fontinfo=_fontinfo("prop_1997_98_44.xml.fontinfo"),
        decoder=OffsetDecoder20(kommittenamn="Datalagskommittén"))
    page = doc[0]
    assert str(page[0]) == "Personuppgiftslag"       # unencoded
    assert str(page[1]) == "Laila Freivalds"         # basic encoding
    assert str(page[2]) == "Pierre Schori"
    # footnote glueing inside an encoded box
    assert str(page[3]) == "Härigenom föreskrivs1 följande."
    assert page[3].width == 241 and page[3].right == 326
    assert page[3][0] == "Härigenom föreskrivs"
    assert page[3][1] == "1" and page[3][1].tag == "sup"
    assert page[3][2] == " följande."
    assert str(page[4]) == "Allmänna bestämmelser"
    assert page[4].font["family"] == "Times.New.Roman.Fet0100"
    assert page[4][0].tag is None
    assert str(page[5]) == "Syftet med lagen"
    assert page[5].font["family"] == "Times-Roman"   # italic font swapped
    assert page[5][0].tag == "i"
    # non-marked-up bold-then-normal textelement (encoded § boundary)
    assert str(page[6]) == ("1 § Syftet med denna lag är att skydda "
                            "människor mot att deras personli-")
    assert page[6].font["family"] == "Times-Roman"
    assert page[6][0] == "1 §" and page[6][0].tag == "b"
    assert page[6][1].tag is None
    assert str(page[8]) == ("Personuppgiftsansvarig Den som ensam eller "
                            "tillsammans med andra")
    assert page[8][0] == "Personuppgiftsansvarig " and page[8][0].tag == "i"
    assert page[8][1].tag is None
    # fixed-leader boundaries
    assert str(page[14]) == ("Regeringens bedömning: En lagstiftning som "
                             "reglerar själva hante-")
    assert page[14][0] == "Regeringens bedömning:" and page[14][0].tag == "b"
    assert str(page[16]) == ("Datalagskommitténs bedömning överensstämmer "
                             "med regeringens.")
    assert page[16][0] == "Datalagskommitténs bedömning"
    assert page[16][0].tag == "b"
    assert str(page[36]).startswith("Remissinstanserna: Kammarrätten i "
                                    "Göteborg")
    assert page[36][0] == "Remissinstanserna:" and page[36][0].tag == "b"
    assert page[36][2] == "Kammarrätten i Göteborg "
    assert page[36][2].tag == "i"
    assert page[39][0] == "Landsorganisationen i Sverige (LO)"
    assert page[39][0].tag == "i"


@needs_fixtures
def test_autodetect_encoding():
    # testPDFReader.Decoding.test_autodetect_encoding
    from ferenda_ray.sources.pdfdecode import DetectingDecoder
    doc = parse_pdf2xml(
        _fix("multiple-encodings.xml"),
        fontinfo=_fontinfo("multiple-encodings.xml.fontinfo"),
        decoder=DetectingDecoder())
    page = doc[0]
    assert str(page[0]) == ("Detta är helt vanlig icke-kodad text på "
                            "svenska.")                       # no offset
    assert str(page[1]) == ("mellan Konungariket Sveriges regering och "
                            "Konungariket Danmarks")          # 0x1d
    assert str(page[2]) == ("Skälen för regeringens bedömning och "
                            "förslag")                        # 0x20


def test_italic_superscript_unreliable_font():
    # testPDFReader.ParseXML.test_italic_superscript_unreliable_font:
    # fonts 2 and 7 are really the same family; the decoder's fontspec
    # alias makes the footnote-marker heuristic see that
    from ferenda_ray.sources.pdfdecode import OffsetDecoder
    doc = _parse_frag("""
<fontspec id="2" size="14" family="MAMMBB+TT5Eo00" color="#000000"/>
<fontspec id="7" size="7" family="MBAAAC+TTA1o00" color="#000000"/>
<text top="552" left="340" width="372" height="17" font="2">intressant om 50 år föreslås att projektet Kulturarw</text>
<text top="549" left="712" width="5" height="13" font="7"><i>3</i></text>
<text top="552" left="717" width="98" height="17" font="2"> får fortsätta </text>""",
                      decoder=OffsetDecoder())
    page = doc[0]
    assert len(page) == 1
    box = page[0]
    assert (box.top, box.left, box.right, box.bottom, box.fontid) == \
        (549, 340, 815, 569, 2)
    assert [(str(e), e.tag) for e in box] == [
        ("intressant om 50 år föreslås att projektet Kulturarw", None),
        ("3", "is"),
        (" får fortsätta ", None)]


# --- hOCR (scanned/OCR path) — testPDFReader.test_ocr / test_fallback_ocr ---

@needs_fixtures
def test_hocr_scanned():
    doc = parse_hocr(_fix("scanned.hocr.html"))
    assert len(doc) == 2
    first = doc[0][0][0]
    assert str(first) == "Regeringens "
    assert (first.top, first.left, first.height, first.width) == \
        (47, 38, 21, 118)
    assert _norm(doc[0][5]) == ("Regeringen föreslår riksdagen att anta de "
                                "förslag som har tagits. upp i")


@needs_fixtures
def test_hocr_ecma():
    doc = parse_hocr(_fix("scanned-ecma-99.hocr.html"))
    assert len(doc) == 2
    assert _norm(doc[0][1]) == "EUROPEAN COMPUTER MANUFACTURERS ASSOCIATION"


# --- raw-PDF extraction (pure-stdlib minipdf) -------------------------------

PDFDIR = "/root/reference/test/files/pdfreader"


@needs_fixtures
def test_minipdf_sample():
    from ferenda_ray.sources.minipdf import extract_pdf
    doc = extract_pdf(_fix("sample.pdf", PDFDIR))
    assert len(doc) == 1 and not doc.is_empty()
    texts = [str(b) for b in doc[0]]
    assert texts[0] == "Document title"
    assert "This is a simple document in PDF format." in texts
    # full text content matches the pdftohtml intermediate's words
    want = {w for b in parse_pdf2xml(_fix("sample.xml"))[0]
            for w in str(b).split()}
    got = {w for t in texts for w in t.split()}
    assert want == got


@needs_fixtures
def test_minipdf_scanned_is_empty():
    # testPDFReader.test_fallback_ocr: the non-OCR parse of a scanned
    # PDF yields no text
    from ferenda_ray.sources.minipdf import extract_pdf
    doc = extract_pdf(_fix("scanned-ecma-99.pdf", PDFDIR))
    assert len(doc) == 2 and doc.is_empty()


@needs_fixtures
def test_minipdf_lzw_and_offset_decode():
    # custom-encoding.pdf is LZW-compressed PDF 1.2 whose encoded
    # boxes carry 0x1d-shifted bytes; OffsetDecoder recovers them
    from ferenda_ray.sources.minipdf import extract_pdf
    from ferenda_ray.sources.pdfdecode import OffsetDecoder
    doc = extract_pdf(_fix("custom-encoding.pdf", PDFDIR))
    assert len(doc) == 11 and not doc.is_empty()
    texts = [str(b) for b in doc[0]]
    assert "Regeringens proposition" in texts
    assert "(Finansdepartementet)" in texts
    dec = OffsetDecoder()
    decoded = [dec.decode_string(t, dec.map) for t in texts]
    assert "Göran Persson" in decoded
    assert "Bosse Ringholm" in decoded


@needs_fixtures
def test_minipdf_objstm():
    # lipsum.pdf is PDF 1.5 with object streams
    from ferenda_ray.sources.minipdf import extract_pdf
    doc = extract_pdf(_fix("lipsum.pdf", ANADIR))
    assert len(doc) == 3
    assert str(doc[0][0]).startswith("Lorem ipsum dolor sit amet")


# --- pdfanalyze conformance over lipsum.xml (testPDFAnalyze) ----------------

@needs_fixtures
def test_analyzer_counters():
    rows = textbox_rows(0, parse_pdf2xml(_fix("lipsum.xml", ANADIR)))
    c = pdfanalyze.count_page(rows, twopage=True)
    # vertical counters over all pages (testPDFAnalyze.test_vcounters)
    assert max(h for _, _, _, h in c["pages"]) == 1262
    assert c["bottommargin"][76] == 22
    assert c["topmargin"][1167] == 3
    # horizontal counters (test_hcounters)
    assert set(c["leftmargin"]) == {135, 775, 778}
    assert list(c["leftmargin_even"]) == [108]
    assert c["rightmargin"].most_common(1)[0][0] == 784


@needs_fixtures
def test_analyzer_stylecounters():
    rows = textbox_rows(0, parse_pdf2xml(_fix("lipsum.xml", ANADIR)))
    rows = [r for r in rows if r["page"] in (2, 3)]
    c = pdfanalyze.count_page(rows, twopage=True)
    assert dict(c["styles"]) == {("Comic Sans MS", 14): 5922,
                                 ("Cambria,Bold", 14): 133,
                                 ("Cambria,Bold", 17): 128,
                                 ("Cambria,Bold", 19): 61}


@needs_fixtures
def test_ray_pdf_textboxes_to_metrics(ray_session):
    """End-to-end Ray path: binary intermediates → textbox rows
    (actor pool) → distributed page metrics."""
    import json

    import ray.data as rd

    from ferenda_ray.sources.readers import pdf_textboxes

    t = __import__("pyarrow").table({
        "doc_id": [0, 1],
        "pdf": __import__("pyarrow").array(
            [_fix("lipsum.xml", ANADIR), _fix("scanned.hocr.html")],
            type=__import__("pyarrow").large_binary()),
    })
    boxes = pdf_textboxes(rd.from_arrow(t))
    rows = boxes.take_all()
    assert not any(r["error"] for r in rows)
    assert {r["doc_id"] for r in rows} == {0, 1}
    metrics = {r["doc_id"]: json.loads(r["metrics_json"])
               for r in pdfanalyze.page_metrics(
                   boxes.drop_columns(["error", "font_id"])).take_all()}
    assert metrics[0]["pagewidth"] == 892
    assert metrics[0]["default"] == {"family": "Comic Sans MS", "size": 14}
    assert metrics[1]["pageheight"] > 0


@needs_fixtures
def test_analyzer_metrics():
    # testPDFAnalyze.test_margins: metrics(startpage=1) == canonical dict
    rows = textbox_rows(0, parse_pdf2xml(_fix("lipsum.xml", ANADIR)))
    rows = [r for r in rows if r["page"] in (2, 3)]
    c = pdfanalyze.count_page(rows, twopage=True)
    metrics = pdfanalyze.analyze_margins(c, twopage=True, scanned=False)
    metrics.update(pdfanalyze.analyze_styles(c["styles"]))
    assert metrics == {
        "default": {"family": "Comic Sans MS", "size": 14},
        "bottommargin": 1149,
        "h1": {"family": "Cambria,Bold", "size": 19},
        "h2": {"family": "Cambria,Bold", "size": 17},
        "h3": {"family": "Cambria,Bold", "size": 14},
        "topmargin": 53,
        "leftmargin": 135,
        "leftmargin_even": 108,
        "pageheight": 1262,
        "pagewidth": 892,
        "rightmargin": 780,
        "rightmargin_even": 760,
    }


def test_content_tokens_inline_image_embedded_EI():
    """'EI' bytes inside an inline-image payload must not terminate
    the BI..EI skip (PDF 32000-1 §7.8.2: the real EI is delimited);
    otherwise the tokenizer desynchronizes mid-stream."""
    from ferenda_ray.sources.minipdf import _content_tokens
    payload = b"\x01\x02EI\x03\x04"          # fake 'EI' inside binary
    data = (b"BT /F1 12 Tf (before) Tj ET "
            b"BI /W 2 /H 2 ID " + payload + b" EI\n"
            b"BT (after) Tj ET")
    toks = list(_content_tokens(data))
    ops = [t for k, t in toks if k == "op"]
    # both text blocks survive; no operator soup from image bytes
    assert ops.count("BT") == 2 and ops.count("Tj") == 2
    shows = [t for k, t in toks if k == "operand" and
             isinstance(t, bytes)]
    assert b"before" in shows and b"after" in shows
