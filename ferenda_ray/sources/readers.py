"""Binary-document readers — actor-pool plumbing with stubbed decode.

The reference shells out to external binaries per document
(``pdftohtml``/``tesseract`` in ``ferenda/pdfreader.py:213,332``;
``antiword`` in ``ferenda/wordreader.py``).  Those binaries don't
exist in this container, so the DECODE step is a clearly-marked stub
— but the Ray-side shape is real: a callable class per reader, binary
payloads in ``large_binary`` columns, small batches (wide rows), one
external-tool session per actor, per-row error capture instead of
task failure (mirrors ``stages/multimodal.py``).
"""

from __future__ import annotations

import shutil

import pyarrow as pa


class PDFReader:
    """``map_batches`` actor: ``(doc_id, pdf: binary)`` →
    ``(doc_id, page_idx, text)``.

    Decode requires the ``pdftohtml`` binary (``pdfreader.py:213``) —
    absent here, so ``__call__`` emits one ``error`` row per document
    unless a ``decoder`` callable (bytes → list[str] of page texts) is
    injected (tests inject a deterministic fake)."""

    def __init__(self, decoder=None, binary: str = "pdftohtml"):
        if decoder is None and shutil.which(binary) is None:
            # STUB: no external binary in this environment.  Keep the
            # actor constructible so the pipeline shape is testable.
            decoder = None
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, texts, errs = [], [], [], []
        for doc_id, blob in zip(batch.column("doc_id").to_pylist(),
                                batch.column("pdf").to_pylist()):
            if self.decoder is None:
                ids.append(doc_id)
                idxs.append(-1)
                texts.append("")
                errs.append("NotImplemented: pdftohtml unavailable")
                continue
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
    extracts ``word/document.xml`` for .docx or shells out to antiword
    for legacy .doc (stubbed here; inject ``doc_converter`` bytes →
    docbook-XML bytes to supply one)."""

    def __init__(self, doc_converter=None):
        self.doc_converter = doc_converter

    @staticmethod
    def filetype(blob: bytes) -> str:
        return "docx" if blob[:4] == b"PK\x03\x04" else "doc"

    def read(self, blob: bytes) -> tuple:
        """bytes → (filetype, intermediate XML bytes)."""
        if self.filetype(blob) == "docx":
            return "docx", self.word_to_ooxml(blob)
        if self.doc_converter is None:
            raise WordDecodeError(
                "NotImplemented: antiword unavailable for legacy .doc")
        return "doc", self.doc_converter(blob)

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
