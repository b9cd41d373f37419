"""Binary-document readers — actor-pool stages over wide rows.

The reference shells out to external binaries per document
(``pdftohtml``/``tesseract`` in ``ferenda/pdfreader.py:213,332``;
``antiword`` in ``ferenda/wordreader.py``).  Only the RAW-binary →
intermediate conversion needs those tools; the intermediate formats
themselves (poppler pdf2xml, tesseract hOCR, OOXML) are plain XML and
decode for real here via :mod:`.pdf2xml` / stdlib zipfile.  The Ray
shape: a callable class per reader, binary payloads in
``large_binary`` columns, small batches (wide rows), per-row error
capture instead of task failure (mirrors ``stages/multimodal.py``).
"""

from __future__ import annotations

import shutil

import pyarrow as pa

from . import pdf2xml as _p2x


def sniff_pdf_payload(blob: bytes) -> str:
    """Classify a payload: raw ``pdf``, poppler ``pdf2xml``
    intermediate, tesseract ``hocr``, or ``unknown``."""
    head = bytes(blob[:1024])
    if head.startswith(b"%PDF"):
        return "pdf"
    if b"<pdf2xml" in head:
        return "pdf2xml"
    if b"ocr_page" in bytes(blob[:4096]) or b"ocr-system" in bytes(blob[:4096]):
        return "hocr"
    return "unknown"


def _has_text(doc) -> bool:
    """True if any page carries a non-whitespace text element."""
    return any(str(b).strip() for page in doc for b in page)


def decode_payload(blob: bytes, ocr=None):
    """Any PDF payload → parsed :class:`~.pdf2xml.PDFDocument`:
    pdf2xml / hOCR intermediates via their parsers, raw PDFs via the
    pure-stdlib :mod:`.minipdf` extractor.

    ``ocr``: injectable OCR runner (``bytes → hOCR bytes``) — the
    reference's tesseract path (``pdfreader.py:213-330``) as a hook
    the same way WordReader/PDFReader take converter hooks (the
    binary itself is absent here).  A raw PDF whose extracted text
    layer is EMPTY (a scanned document) is routed through ``ocr`` and
    the result parsed by the existing hOCR parser; PDFs with a real
    text layer never invoke it."""
    kind = sniff_pdf_payload(blob)
    if kind == "pdf2xml":
        return _p2x.parse_pdf2xml(blob)
    if kind == "hocr":
        return _p2x.parse_hocr(blob)
    if kind == "pdf":
        from .minipdf import extract_pdf
        doc = extract_pdf(blob)
        if ocr is not None and not _has_text(doc):
            return _p2x.parse_hocr(ocr(blob))
        return doc
    raise ValueError("NotImplemented: cannot sniff payload kind "
                     "(expected %%PDF, pdf2xml or hOCR)")


def decode_intermediate(blob: bytes, ocr=None) -> list:
    """PDF payload bytes → list of page texts (real decode)."""
    return [" ".join(str(b) for b in page)
            for page in decode_payload(blob, ocr=ocr)]


class PDFReader:
    """``map_batches`` actor: ``(doc_id, pdf: binary)`` →
    ``(doc_id, page_idx, text)``.

    Raw-PDF conversion requires the ``pdftohtml`` binary
    (``pdfreader.py:213``) — absent here — but pdf2xml / hOCR
    INTERMEDIATES decode for real via :func:`decode_intermediate`
    (the default decoder).  Inject a ``decoder`` callable (bytes →
    list[str] of page texts) to override.

    ``ocr``: injectable OCR runner (``bytes → hOCR bytes``) for
    SCANNED raw PDFs — applies to the default decoder only (an
    injected ``decoder`` owns its whole pipeline); see
    :func:`decode_payload`."""

    def __init__(self, decoder=None, binary: str = "pdftohtml",
                 ocr=None):
        # intermediates always decode for real; the external binary is
        # only ever a user-injected decoder's concern (a host that HAS
        # pdftohtml must not silently disable the built-in decode)
        if decoder is None:
            def decoder(blob, _ocr=ocr):
                return decode_intermediate(blob, ocr=_ocr)
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, texts, errs = [], [], [], []
        for doc_id, blob in zip(batch.column("doc_id").to_pylist(),
                                batch.column("pdf").to_pylist()):
            try:
                for i, page in enumerate(self.decoder(blob)):
                    ids.append(doc_id)
                    idxs.append(i)
                    texts.append(page)
                    errs.append(None)
            except Exception as e:  # per-row poison-pill isolation
                ids.append(doc_id)
                idxs.append(-1)
                texts.append("")
                errs.append(str(e))
        return pa.table({
            "doc_id": pa.array(ids, batch.schema.field("doc_id").type),
            "page_idx": pa.array(idxs, pa.int64()),
            "text": pa.array(texts, pa.large_string()),
            "error": pa.array(errs, pa.string()),
        })


class PDFTextboxes:
    """``map_batches`` actor: ``(doc_id, pdf: binary)`` → one row per
    textbox (layout + font columns matching
    ``stages/pdfanalyze.TEXTBOX_SCHEMA``), feeding the distributed
    page-metrics analysis.  Intermediates (pdf2xml / hOCR) decode for
    real; raw PDFs yield an error row.  ``ocr``: injectable OCR
    runner for scanned raw PDFs (see :func:`decode_payload`) — OCR'd
    pages flow into the same textbox rows."""

    def __init__(self, ocr=None):
        self.ocr = ocr

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, errs = [], []
        for doc_id, blob in zip(batch.column("doc_id").to_pylist(),
                                batch.column("pdf").to_pylist()):
            try:
                rows.extend(_p2x.textbox_rows(
                    doc_id, decode_payload(blob, ocr=self.ocr)))
            except Exception as e:
                errs.append({"doc_id": doc_id, "error": str(e)})
        cols = {"doc_id": pa.int64(), "page": pa.int64(),
                "left": pa.int64(), "top": pa.int64(),
                "right": pa.int64(), "bottom": pa.int64(),
                "font_id": pa.int64(), "font_family": pa.string(),
                "font_size": pa.int64(), "text": pa.large_string(),
                "page_width": pa.int64(), "page_height": pa.int64()}
        out = {name: pa.array([r.get(name) for r in rows], typ)
               for name, typ in cols.items()}
        out["error"] = pa.array([None] * len(rows), pa.string())
        if errs:  # poison-pill rows keep the failure visible downstream
            for name, typ in cols.items():
                out[name] = pa.concat_arrays([
                    out[name],
                    pa.array([e.get(name) for e in errs], typ)])
            out["error"] = pa.concat_arrays([
                out["error"], pa.array([e["error"] for e in errs],
                                       pa.string())])
        return pa.table(out)


def pdf_textboxes(ds, concurrency=(1, 4), batch_size: int = 8):
    """Attach the textbox-extraction actor pool (small batches: rows
    are whole documents)."""
    return ds.map_batches(
        PDFTextboxes, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def read_pdfs(ds, decoder=None, concurrency=(1, 4), batch_size: int = 8):
    """Attach the PDF reader actor pool (small batches: rows are whole
    PDFs)."""
    return ds.map_batches(
        PDFReader, fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ---------------------------------------------------------------------------
# WordReader — .docx decode is REAL (stdlib zipfile + ElementTree);
# only legacy .doc needs the absent ``antiword`` binary.

_OOXML_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


class WordDecodeError(Exception):
    pass


class WordReader:
    """Semantics of the reference's ``WordReader``
    (``ferenda/wordreader.py:23-140``): ``read`` guesses the filetype
    (suffixes lie — a zip magic means OOXML regardless of extension,
    the "Retrying as OOXML" path at ``wordreader.py:63-68``), then
    extracts ``word/document.xml`` for .docx.  Legacy .doc converts
    NATIVELY via the pure-stdlib CFB/[MS-DOC] extractor
    (:mod:`ferenda_ray.sources.msdoc` — the reference shells out to
    antiword here) into a minimal docbook fragment; an injected
    ``doc_converter`` (bytes → docbook-XML bytes) overrides it."""

    def __init__(self, doc_converter=None):
        self.doc_converter = doc_converter

    @staticmethod
    def filetype(blob: bytes) -> str:
        return "docx" if blob[:4] == b"PK\x03\x04" else "doc"

    def read(self, blob: bytes) -> tuple:
        """bytes → (filetype, intermediate XML bytes)."""
        if self.filetype(blob) == "docx":
            return "docx", self.word_to_ooxml(blob)
        if self.doc_converter is not None:
            return "doc", self.doc_converter(blob)
        from xml.sax.saxutils import escape as _esc

        from ferenda_ray.sources.msdoc import extract_doc_text
        paras = [p for p in
                 (s.strip() for s in
                  extract_doc_text(blob).split("\n")) if p]
        xml = ("<article>"
               + "".join(f"<para>{_esc(p)}</para>" for p in paras)
               + "</article>")
        return "doc", xml.encode("utf-8")

    @staticmethod
    def word_to_ooxml(blob: bytes) -> bytes:
        """Extract the raw OOXML document part
        (``wordreader.py:113-125``)."""
        import io
        import zipfile
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            name = "word/document.xml"
            if name not in z.namelist():
                raise WordDecodeError(f"no {name} in docx zip")
            return z.read(name)

    @staticmethod
    def extract_paragraphs(ooxml: bytes) -> list:
        """OOXML → list of paragraph strings (runs merged — the
        intent of the reference's simplify-ooxml.xsl pass)."""
        import xml.etree.ElementTree as ET
        root = ET.fromstring(ooxml)
        out = []
        for p in root.iter(_OOXML_W + "p"):
            text = "".join(t.text or "" for t in p.iter(_OOXML_W + "t"))
            if text.strip():
                out.append(text)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """``(doc_id, word: binary)`` → ``(doc_id, para_idx, text,
        filetype, error)`` — same per-row poison-pill isolation as
        :class:`PDFReader`."""
        ids, idxs, texts, fts, errs = [], [], [], [], []
        for doc_id, blob in zip(batch.column("doc_id").to_pylist(),
                                batch.column("word").to_pylist()):
            try:
                ft, xml = self.read(blob)
                for i, para in enumerate(self.extract_paragraphs(xml)
                                         if ft == "docx" else
                                         self._docbook_paragraphs(xml)):
                    ids.append(doc_id)
                    idxs.append(i)
                    texts.append(para)
                    fts.append(ft)
                    errs.append(None)
            except Exception as e:
                ids.append(doc_id)
                idxs.append(-1)
                texts.append("")
                fts.append(self.filetype(blob or b""))
                errs.append(str(e))
        return pa.table({
            "doc_id": pa.array(ids, batch.schema.field("doc_id").type),
            "para_idx": pa.array(idxs, pa.int64()),
            "text": pa.array(texts, pa.large_string()),
            "filetype": pa.array(fts, pa.string()),
            "error": pa.array(errs, pa.string()),
        })

    @staticmethod
    def _docbook_paragraphs(xml: bytes) -> list:
        import xml.etree.ElementTree as ET
        root = ET.fromstring(xml)
        return [el.text for el in root.iter()
                if el.tag.endswith("para") and el.text and el.text.strip()]


def read_word(ds, doc_converter=None, concurrency=(1, 4),
              batch_size: int = 8):
    """Attach the Word reader actor pool (small batches: whole docs)."""
    return ds.map_batches(
        WordReader, fn_constructor_kwargs={"doc_converter": doc_converter},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
