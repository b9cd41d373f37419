"""Cursor-based text reader + distributed chunking stages.

The reader surface of the reference's ``TextReader``
(``ferenda/textreader.py:11-352``): a seekable cursor over an
in-memory string with paragraph / page / chunk / line reads,
non-destructive ``peek*`` / ``prev*``, ``cue``/``cuepast``/``readto``
navigation, and opt-in text filters (strip, dewrap, dehyphenate,
expandtabs).  Unlike the reference (which leaves dehyphenation as a
FIXME) ``dehyphenate`` here actually joins hyphen-broken words.

Scale-out face: :func:`paragraphs` / :func:`pages` turn a Dataset
text column into exploded chunk rows — the chunker runs inside
``map_batches``, one reader per document, no state across rows.
"""

from __future__ import annotations

import copy

import pyarrow as pa

UNIX = "\n"
DOS = "\r\n"
MAC = "\r"


class TextReader:
    """File-like reader over a string (or file) with chunk-oriented
    navigation.  See module docstring; API mirrors
    ``ferenda/textreader.py`` (cited per method)."""

    # class-attr aliases (reference API: ``TextReader.UNIX`` etc.)
    UNIX = UNIX
    DOS = DOS
    MAC = MAC

    def __init__(self, filename: str | None = None,
                 encoding: str = "utf-8", string: str | None = None,
                 linesep: str = UNIX):
        if (filename is None) == (string is None):
            raise TypeError("specify exactly one of filename / string")
        if filename is not None:
            with open(filename, "r", encoding=encoding) as f:
                string = f.read()
        self.data: str = string
        self.name = filename
        self.encoding = encoding
        self.linesep = linesep
        self.currpos = 0
        self.maxpos = len(self.data)
        self._lastread = ""
        # opt-in filters applied by _process on every read result
        self.autostrip = False
        self.autodewrap = False
        self.autodehyphenate = False
        self.expandtabs = False
        self._iterfunc = self.readline
        self._iterargs: tuple = ()

    # -- filters (``__process``, textreader.py:104-128) -------------------

    def _process(self, s: str) -> str:
        if self.autostrip:
            s = s.strip()
        if self.autodewrap:
            s = s.replace(self.linesep, " ")
        if self.autodehyphenate:
            s = s.replace("-" + self.linesep, "")
        if self.expandtabs:
            s = s.expandtabs(8)
        return s

    # -- cursor state ------------------------------------------------------

    def eof(self) -> bool:
        return self.currpos >= self.maxpos

    def bof(self) -> bool:
        return self.currpos == 0

    def seek(self, offset: int, whence: int = 0) -> None:
        if whence != 0:
            raise NotImplementedError("only absolute seek")
        self.currpos = offset

    def tell(self) -> int:
        return self.currpos

    # -- navigation (cue/cuepast/readto, textreader.py:138-157) -----------

    def cue(self, string: str) -> None:
        idx = self.data.find(string, self.currpos)
        if idx == -1:
            raise IOError(f"could not find {string!r}")
        self.currpos = idx

    def cuepast(self, string: str) -> None:
        self.cue(string)
        self.currpos += len(string)

    def readto(self, string: str) -> str:
        idx = self.data.find(string, self.currpos)
        if idx == -1:
            raise IOError(f"could not find {string!r}")
        res = self.data[self.currpos:idx]
        self.currpos = idx
        return self._process(res)

    # -- forward reads -----------------------------------------------------

    def _find(self, delimiter: str, start: int) -> tuple:
        idx = self.data.find(delimiter, start)
        if idx == -1:
            return self.data[start:], self.maxpos
        return self.data[start:idx], idx + len(delimiter)

    def _rfind(self, delimiter: str, end: int) -> tuple:
        idx = self.data.rfind(delimiter, 0, end)
        if idx == -1:
            return self.data[:end], 0
        return self.data[idx + len(delimiter):end], idx

    def read(self, size: int = 0) -> str:
        self._lastread = self.data[self.currpos:self.currpos + size]
        self.currpos += len(self._lastread)
        return self._process(self._lastread)

    def readline(self, size=None) -> str:
        return self.readchunk(self.linesep)

    def readchunk(self, delimiter: str) -> str:
        self._lastread, self.currpos = self._find(delimiter, self.currpos)
        return self._process(self._lastread)

    def readparagraph(self) -> str:
        """Text up to the next blank line (two+ separators); leading
        and trailing separator runs consumed (textreader.py:159-173)."""
        sep = self.linesep
        while self.data.startswith(sep, self.currpos):
            self.currpos += len(sep)
        res = self.readchunk(sep * 2)
        while self.data.startswith(sep, self.currpos):
            self.currpos += len(sep)
        return res

    def readpage(self) -> str:
        """Text up to the next form feed (textreader.py:175-183)."""
        return self.readchunk("\f")

    def lastread(self) -> str:
        return self._process(self._lastread)

    # -- non-destructive peeks / backwards reads ---------------------------

    def peek(self, size: int = 0) -> str:
        return self._process(self.data[self.currpos:self.currpos + size])

    def peekchunk(self, delimiter: str, times: int = 1) -> str:
        pos = self.currpos
        res = ""
        for _ in range(times):
            res, newpos = self._find(delimiter, pos)
            if newpos == pos:
                raise IOError("peek past end of file")
            pos = newpos
        return self._process(res)

    def peekline(self, times: int = 1) -> str:
        return self.peekchunk(self.linesep, times)

    def peekparagraph(self, times: int = 1) -> str:
        saved = self.currpos
        try:
            sep = self.linesep
            while self.data.startswith(sep, self.currpos):
                self.currpos += len(sep)
            return self.peekchunk(sep * 2, times)
        finally:
            self.currpos = saved

    def prev(self, size: int = 0) -> str:
        return self._process(self.data[self.currpos - size:self.currpos])

    def prevchunk(self, delimiter: str, times: int = 1) -> str:
        pos = self.currpos
        res = ""
        for _ in range(times):
            res, newpos = self._rfind(delimiter, pos)
            if newpos == pos:
                raise IOError("prev past beginning of file")
            pos = newpos
        return self._process(res)

    def prevline(self, times: int = 1) -> str:
        return self.prevchunk(self.linesep, times)

    def prevparagraph(self, times: int = 1) -> str:
        return self.prevchunk(self.linesep * 2, times)

    # -- derived readers / iteration (textreader.py:253-287) --------------

    def getreader(self, callable_obj, *args, **kwargs) -> "TextReader":
        res = callable_obj(*args, **kwargs)
        clone = copy.copy(self)
        clone.data = res
        clone.currpos = 0
        clone.maxpos = len(res)
        return clone

    def getiterator(self, callable_obj, *args):
        self._iterfunc = callable_obj
        self._iterargs = args
        return self

    def __iter__(self):
        return self

    def __next__(self) -> str:
        if self.eof():
            self._iterfunc = self.readline
            self._iterargs = ()
            raise StopIteration
        return self._iterfunc(*self._iterargs)


# ---------------------------------------------------------------------------
# distributed chunking stages

def split_paragraphs(text: str, linesep: str = UNIX, dewrap: bool = False,
                     dehyphenate: bool = False) -> list:
    """All non-empty paragraphs of ``text`` (strip applied)."""
    r = TextReader(string=text, linesep=linesep)
    r.autostrip = True
    r.autodewrap = dewrap
    r.autodehyphenate = dehyphenate
    out = []
    while not r.eof():
        p = r.readparagraph()
        if p:
            out.append(p)
    return out


def _explode(ds, id_col: str, text_col: str, splitter, out_col: str,
             idx_col: str):
    def explode(b: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for i, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            for j, c in enumerate(splitter(t)):
                ids.append(i)
                idxs.append(j)
                chunks.append(c)
        return pa.table({
            id_col: pa.array(ids, b.schema.field(id_col).type),
            idx_col: pa.array(idxs, pa.int64()),
            out_col: pa.array(chunks, pa.large_string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=1024)


def paragraphs(ds, id_col: str = "doc_id", text_col: str = "text",
               dewrap: bool = True):
    """Dataset(text docs) → Dataset ``(id, para_idx, paragraph)`` —
    the TextReader paragraph iterator as a flat-map stage."""
    import functools
    return _explode(ds, id_col, text_col,
                    functools.partial(split_paragraphs, dewrap=dewrap),
                    "paragraph", "para_idx")


def pages(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset(text docs) → Dataset ``(id, page_idx, page)`` (form-feed
    delimited, the pdftotext/RFC page convention)."""
    def split_pages(text: str) -> list:
        r = TextReader(string=text)
        out = []
        while not r.eof():
            out.append(r.readpage())
        return out

    return _explode(ds, id_col, text_col, split_pages, "page", "page_idx")
