"""Source operators: TextReader navigation/filters, crawl discovery
(two-step regex + dedup), conditional fetch (304 / unchanged /
updated), distributed chunking stages."""

import os

import pyarrow as pa
import pytest

from ferenda_ray.sources.crawl import basefiles_from_html, discover, iterlinks
from ferenda_ray.sources.fetch import DictTransport, Fetcher, fetch
from ferenda_ray.sources.readers import PDFReader
from ferenda_ray.sources.textreader import (
    TextReader, paragraphs, split_paragraphs)


# --- TextReader (textreader.py:11-352 semantics) --------------------------

TEXT = "First para\nwrapped line\n\nSecond para\n\n\nThird-\nhyphen\n"


def test_readparagraph_consumes_separators():
    r = TextReader(string=TEXT)
    assert r.readparagraph() == "First para\nwrapped line"
    assert r.readparagraph() == "Second para"
    assert r.readparagraph() == "Third-\nhyphen\n"
    assert r.eof()


def test_filters_dewrap_dehyphenate():
    r = TextReader(string=TEXT)
    r.autodewrap = True
    assert r.readparagraph() == "First para wrapped line"
    r2 = TextReader(string="Third-\nhyphen")
    r2.autodehyphenate = True
    assert r2.readparagraph() == "Thirdhyphen"


def test_cue_readto_peek_prev():
    r = TextReader(string="alpha beta gamma beta delta")
    r.cue("beta")
    assert r.tell() == 6
    assert r.readto("gamma") == "beta "
    assert r.peek(5) == "gamma"
    assert r.prev(5) == "beta "
    r.cuepast("gamma")
    assert r.read(1) == " "
    with pytest.raises(IOError):
        r.cue("nonexistent")


def test_peekparagraph_does_not_move_cursor():
    r = TextReader(string=TEXT)
    pos = r.tell()
    assert r.peekparagraph() == "First para\nwrapped line"
    assert r.peekparagraph(2) == "Second para"
    assert r.tell() == pos


def test_readpage_and_getreader():
    r = TextReader(string="page one\ftwo\fthree")
    assert r.readpage() == "page one"
    sub = r.getreader(r.readpage)
    assert sub.read(3) == "two"
    assert r.readpage() == "three"


def test_getiterator_lines():
    r = TextReader(string="a\nb\nc")
    assert list(r.getiterator(r.readline)) == ["a", "b", "c"]


def test_split_paragraphs():
    assert split_paragraphs(TEXT) == [
        "First para\nwrapped line", "Second para", "Third-\nhyphen"]
    assert split_paragraphs(TEXT, dewrap=True)[0] == "First para wrapped line"
    assert split_paragraphs(TEXT, dehyphenate=True)[-1] == "Thirdhyphen"


# --- crawl (documentrepository.py:892-934 semantics) ----------------------

HTML = """
<html><body>
<a href="/doc/rfc1.txt">RFC 1</a>
<a href='/doc/rfc2.txt'>RFC 2</a>
<a href="/doc/rfc1.txt">RFC 1</a>
<a href="/other/readme.txt">no match</a>
<a href="/doc/rfc7.txt">unrelated text</a>
</body></html>
"""


def test_iterlinks_absolute():
    links = iterlinks(HTML, base_url="https://x.test/start")
    assert links[0] == ("https://x.test/doc/rfc1.txt", "RFC 1")
    assert len(links) == 5


def test_basefiles_text_regex_first_then_url():
    # text regex matches "RFC n"; url regex catches rfc7 via href
    out = basefiles_from_html(
        HTML, basefile_regex=r"RFC (?P<basefile>\d+)",
        document_url_regex=r".*/doc/rfc(?P<basefile>\d+)\.txt",
        base_url="https://x.test/")
    assert out == [("1", "https://x.test/doc/rfc1.txt"),
                   ("2", "https://x.test/doc/rfc2.txt"),
                   ("7", "https://x.test/doc/rfc7.txt")]


def test_discover_distributed_dedup(ray_session):
    import ray.data as rd
    pages_ds = rd.from_arrow(pa.table({
        "url": ["https://x.test/p1", "https://x.test/p2"],
        "html": [HTML, HTML],  # same links on both pages
    }))
    out = discover(pages_ds, basefile_regex=r"RFC (?P<basefile>\d+)",
                   document_url_regex=r".*/doc/rfc(?P<basefile>\d+)\.txt")
    rows = sorted((r["basefile"], r["url"], r["src_page"])
                  for r in out.take_all())
    # dedup across pages; min src_page wins
    assert [r[0] for r in rows] == ["1", "2", "7"]
    assert all(r[2] == "https://x.test/p1" for r in rows)


# --- fetch (documentrepository.py:936-1094 semantics) ---------------------

RESPONSES = {
    "https://x.test/a": (200, {"ETag": 'W/"v1"'}, b"content-a"),
    "https://x.test/b": (200, {"Last-Modified": "Mon, 01 Jan 2024"},
                         b"content-b"),
    "https://x.test/gone": (410, {}, b""),
}


def _sha(b):
    import hashlib
    return hashlib.sha256(b).hexdigest()


def test_fetch_new_and_error():
    f = Fetcher(transport=DictTransport(RESPONSES))
    r = f.fetch_one("https://x.test/a")
    assert r["fetch_status"] == "new" and r["content"] == b"content-a"
    assert r["etag"] == 'W/"v1"'
    assert f.fetch_one("https://x.test/gone")["fetch_status"] == "error:410"
    assert f.fetch_one("https://x.test/nope")["fetch_status"] == "error:404"


def test_fetch_conditional_304_and_unchanged():
    f = Fetcher(transport=DictTransport(RESPONSES))
    # etag hit -> 304 not_modified, prior sha kept
    r = f.fetch_one("https://x.test/a", etag='W/"v1"', prior_sha="keep")
    assert r["fetch_status"] == "not_modified"
    assert r["content_sha256"] == "keep"
    # last-modified hit -> 304
    r = f.fetch_one("https://x.test/b",
                    last_modified="Mon, 01 Jan 2024", prior_sha="keep")
    assert r["fetch_status"] == "not_modified"
    # stale etag -> refetch; same bytes -> unchanged; new bytes -> updated
    r = f.fetch_one("https://x.test/a", etag='W/"v0"',
                    prior_sha=_sha(b"content-a"))
    assert r["fetch_status"] == "unchanged"
    r = f.fetch_one("https://x.test/a", etag='W/"v0"', prior_sha="old")
    assert r["fetch_status"] == "updated"


def test_fetch_stage_distributed(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "url": ["https://x.test/a", "https://x.test/b",
                "https://x.test/gone"]}))
    out = fetch(ds, transport_factory=lambda: DictTransport(RESPONSES),
                concurrency=(1, 2))
    rows = {r["url"]: r for r in out.take_all()}
    assert rows["https://x.test/a"]["fetch_status"] == "new"
    assert rows["https://x.test/a"]["content_sha256"] == _sha(b"content-a")
    assert rows["https://x.test/gone"]["fetch_status"] == "error:410"


# --- chunking stage + PDF stub --------------------------------------------

def test_paragraphs_stage(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["p1\n\np2", "only"],
    }))
    rows = sorted((r["doc_id"], r["para_idx"], r["paragraph"])
                  for r in paragraphs(ds).take_all())
    assert rows == [(1, 0, "p1"), (1, 1, "p2"), (2, 0, "only")]


def test_pdfreader_stub_and_injected_decoder():
    # a malformed raw PDF yields a per-row error (real decode now runs
    # via minipdf; unparseable input must not kill the task)
    batch = pa.table({"doc_id": [1], "pdf": [b"%PDF-fake"]})
    stub = PDFReader()
    out = stub(batch)
    assert out.column("error")[0].as_py()
    real = PDFReader(decoder=lambda blob: ["page1 text", "page2 text"])
    out = real(batch)
    assert out.column("text").to_pylist() == ["page1 text", "page2 text"]
    assert out.column("error").to_pylist() == [None, None]


_SCANNED_PDF = (b"%PDF-1.4\n"
                b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
                b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >>"
                b" endobj\n"
                b"3 0 obj << /Type /Page /Parent 2 0 R"
                b" /MediaBox [0 0 612 792] >> endobj\n"
                b"trailer << /Root 1 0 R >>\n%%EOF")
_HOCR_FIXTURE = ("/root/reference/test/files/pdfreader/intermediate/"
                 "scanned.hocr.html")


@pytest.mark.skipif(not os.path.exists(_HOCR_FIXTURE),
                    reason="reference tree absent")
def test_pdfreader_ocr_hook():
    """The injectable OCR hook (pdfreader.py:213-330 tesseract path):
    a raw PDF with NO text layer routes through ``ocr`` and the hOCR
    result parses via the existing parser; payloads with a real text
    layer never invoke it — end-to-end to page texts AND textbox
    rows."""
    from ferenda_ray.sources.readers import PDFTextboxes

    hocr = open(_HOCR_FIXTURE, "rb").read()
    calls = []

    def fake_ocr(blob):
        calls.append(len(blob))
        return hocr

    batch = pa.table({"doc_id": [7],
                      "pdf": pa.array([_SCANNED_PDF],
                                      pa.large_binary())})
    out = PDFReader(ocr=fake_ocr)(batch)
    assert calls == [len(_SCANNED_PDF)]
    assert out.column("error").to_pylist() == [None, None]
    texts = out.column("text").to_pylist()
    assert len(texts) == 2                        # the fixture's pages
    assert "Regeringens proposition" in texts[0]

    # same hook, textbox granularity
    boxes = PDFTextboxes(ocr=fake_ocr)(batch)
    assert boxes.num_rows > 10
    assert boxes.column("error").null_count == boxes.num_rows
    assert any("proposition" in t
               for t in boxes.column("text").to_pylist())

    # a payload WITH a text layer (pdf2xml intermediate) skips OCR
    calls.clear()
    inter = open("/root/reference/test/files/pdfreader/intermediate/"
                 "index.xml", "rb").read()
    out2 = PDFReader(ocr=fake_ocr)(pa.table({
        "doc_id": [8], "pdf": pa.array([inter], pa.large_binary())}))
    assert calls == []
    assert out2.column("error").to_pylist().count(None) == out2.num_rows


def test_tombstone_gate(ray_session):
    """Empty-body / error / not_modified rows are tombstones: dropped
    before parse, listed for status (documentrepository.py:831)."""
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.sources.fetch import drop_tombstones, tombstones
    t = pa.table({
        "url": [f"u{i}" for i in range(5)],
        "fetch_status": ["new", "updated", "error:404", "not_modified",
                         "new"],
        "content": pa.array([b"x", b"y", b"", b"", b""],
                            pa.large_binary()),
    })
    ds = rd.from_arrow(t)
    kept = drop_tombstones(ds).take_all()
    assert [r["url"] for r in kept] == ["u0", "u1"]  # u4: empty body
    dead = tombstones(ds).take_all()
    assert {r["url"] for r in dead} == {"u2", "u3", "u4"}
