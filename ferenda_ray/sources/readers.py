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
