"""RFC plain-text structure parser — an FSMParser grammar instance.

Re-creates the semantics of the reference's RFC parser
(``ferenda/sources/tech/rfc.py:134-428``: masthead/title/preamble
recognition, numbered sections to three levels, ``o``-bulleted lists,
preformatted/BNF blocks, page-break skipping with running short-title
capture), verified against the reference's own fixture corpus
(``test/files/rfc/*.txt`` → ``*.xml`` via ``testutil.testparser``,
``ferenda/testutil.py:929-948``) in ``tests/test_reference_fixtures.py``.

Scale-out face: :func:`parse_rfc` is a pure function of the content
string — run per row inside ``map_batches`` like every other language
recognizer (SURVEY.md §2.2); :func:`rfc_to_parsed` adapts the element
tree to the generic :class:`~ferenda_ray.recognizers.ParsedDoc` shape
the KG extraction stage consumes.
"""

from __future__ import annotations

import re

from ferenda_ray.elements import (
    Body, DocTitle, ListItem, Pagebreak, Paragraph, PreambleSection,
    Preformatted, RFCHeader, Section, Subsection, Subsubsection,
    UnorderedList,
)
from ferenda_ray.fsm import FSMParser, newstate

_SECTIONSTART = re.compile(r"^(\d[\.\d]*) +(.*[^\.])$")


def _columns(chunk: str):
    """Per line: (left, right, length) with a 3-space column split."""
    out = []
    for line in chunk.split("\n"):
        left, right = (line.split("   ", 1) if "   " in line
                       else (line, ""))
        out.append((left, right, len(line)))
    return out


def rfc_parser(basefile: str = "0") -> FSMParser:
    def section_parts(chunk: str):
        m = _SECTIONSTART.match(chunk)
        if not m:
            return None, chunk, None
        ordinal = m.group(1).rstrip(".")
        return (ordinal, m.group(2),
                f"RFC {basefile}, section {ordinal}")

    def _depth(chunk: str) -> int:
        ordinal = section_parts(chunk)[0]
        return 0 if ordinal is None else len(
            [s for s in ordinal.split(".") if s])

    # recognizers ----------------------------------------------------------
    def is_rfcheader(p, chunk=None, lenient=True):
        cols = _columns(chunk if chunk is not None else p.reader.peek())
        if len(cols) < 2:           # masthead is always 2+ lines
            return False
        target = cols[0][2]
        for _, right, length in cols:
            if right == "" and length > 40:
                return False
            if right != "" and length != target and not lenient:
                return False        # justified right margin required
        return True

    def is_doctitle(p):
        return True

    def is_pagebreak(p):
        return "\f" in p.reader.peek()

    def is_header(p):
        chunk = p.reader.peek()
        s = chunk.strip()
        return bool(s and len(s.split("\n")) == 1
                    and not s.endswith(".") and not chunk.startswith(" "))

    def is_section(p):
        return _depth(p.reader.peek()) == 1

    def is_subsection(p):
        return _depth(p.reader.peek()) == 2

    def is_subsubsection(p):
        return _depth(p.reader.peek()) == 3

    def _preformatted(chunk: str) -> bool:
        # drop the uniform 3-space body indent, neutralize
        # sentence-end double spaces; any surviving runs / TOC leaders
        # indicate preformatted content
        stripped = "\n".join(x[3:] for x in chunk.split("\n"))
        stripped = stripped.replace(".  ", ". ")
        return ("  " in stripped or "...." in stripped
                or ". . . " in stripped)

    def is_preformatted(p):
        return _preformatted(p.reader.peek())

    def is_bnf(p):
        chunk = p.reader.peek()
        return _preformatted(chunk) and " = " in chunk

    def is_ul_listitem(p):
        return p.reader.peek().strip().startswith("o  ")

    def is_paragraph(p):
        return True

    # constructors ---------------------------------------------------------
    @newstate("body")
    def make_body(p):
        return p.make_children(Body())

    def make_rfcheader(p):
        chunk = p.reader.next()
        # a spurious blank line can split the masthead (e.g. RFC 6912):
        # absorb the next chunk when it still looks strictly header-like
        if is_rfcheader(p, lenient=False):
            chunk += "\n" + p.reader.next()
        return RFCHeader(chunk)

    def make_doctitle(p):
        return DocTitle(p.reader.next())

    @newstate("preamble-section")
    def make_preamble_section(p):
        return p.make_children(PreambleSection(title=p.reader.next()))

    @newstate("preamble-section")
    def make_abstract(p):
        # older RFCs: untitled abstract paragraph opens the preamble
        return p.make_children(PreambleSection(title="(Abstract)"))

    def skip_pagebreak(p):
        lastline = p.reader.next().split("\n")[-1]
        parts = re.split("  +", lastline)
        return Pagebreak(shorttitle=parts[1]) if len(parts) > 2 else None

    def make_paragraph(p):
        return Paragraph([" ".join(p.reader.next().split())])

    def make_preformatted(p):
        return Preformatted([p.reader.next()])

    def make_bnf(p):
        return Preformatted([p.reader.next()], **{"class": "bnf"})

    def _sectional(cls, state):
        @newstate(state)
        def make(p):
            ordinal, title, ident = section_parts(p.reader.next())
            return p.make_children(
                cls(ordinal=ordinal, title=title, identifier=ident))
        make.__name__ = "make_" + state
        return make

    make_section = _sectional(Section, "section")
    make_subsection = _sectional(Subsection, "subsection")
    make_subsubsection = _sectional(Subsubsection, "subsubsection")

    @newstate("listitem")
    def make_listitem(p):
        chunk = p.reader.next()
        li = ListItem()
        li.append(chunk[6:] if chunk.startswith("   o  ") else chunk)
        return p.make_children(li)

    @newstate("ul-list")
    def make_unordered_list(p):
        ul = UnorderedList(type="disc")
        ul.append(p.make_child(make_listitem, "listitem"))
        return p.make_children(ul)

    p = FSMParser()
    p.set_recognizers(is_pagebreak, is_rfcheader, is_doctitle,
                      is_section, is_subsection, is_subsubsection,
                      is_header, is_ul_listitem, is_bnf, is_preformatted,
                      is_paragraph)
    common = ("section", "subsection", "subsubsection")
    p.set_transitions({
        ("body", is_rfcheader): (make_rfcheader, "doctitle"),
        ("doctitle", is_doctitle): (make_doctitle, "preamble"),
        ("preamble", is_header): (make_preamble_section,
                                  "preamble-section"),
        ("preamble", is_paragraph): (make_abstract, "preamble-section"),
        ("preamble-section", is_paragraph): (make_paragraph, None),
        ("preamble-section", is_header): (False, None),
        ("preamble-section", is_pagebreak): (skip_pagebreak, None),
        ("preamble-section", is_section): (False, "after-preamble"),
        ("after-preamble", is_section): (make_section, "section"),
        ("section", is_subsection): (make_subsection, "subsection"),
        ("section", is_section): (False, None),
        ("subsection", is_subsubsection): (make_subsubsection,
                                           "subsubsection"),
        ("subsection", is_subsection): (False, None),
        ("subsection", is_section): (False, None),
        ("subsubsection", is_subsubsection): (False, None),
        ("subsubsection", is_subsection): (False, None),
        ("subsubsection", is_section): (False, None),
        (common, is_ul_listitem): (make_unordered_list, "ul-list"),
        ("ul-list", is_ul_listitem): (make_listitem, "listitem"),
        ("ul-list", is_paragraph): (False, None),
        ("listitem", is_paragraph): (False, None),
        (common, is_bnf): (make_bnf, None),
        (common, is_preformatted): (make_preformatted, None),
        (common, is_paragraph): (make_paragraph, None),
        (common, is_pagebreak): (skip_pagebreak, None),
    })
    p.initial_state = "body"
    p.initial_constructor = make_body
    return p


def parse_rfc(content: str, basefile: str = "0") -> Body:
    """Content string → element tree (one parser per call; cheap)."""
    from ferenda_ray.sources.textreader import TextReader, UNIX
    tr = TextReader(string=content, linesep=UNIX)
    return rfc_parser(basefile).parse(tr.getiterator(tr.readparagraph))


def rfc_to_parsed(body: Body):
    """Element tree → the generic ParsedDoc the KG extractor consumes
    (title from DocTitle, preamble prose as intro, sections/subs)."""
    from ferenda_ray.recognizers import ParsedDoc, ParsedSection

    doc = ParsedDoc()
    stack_out = doc.sections

    def prose_of(node, out):
        for c in node:
            if isinstance(c, Paragraph):
                out.append(c.as_plaintext())

    for child in body:
        if isinstance(child, DocTitle):
            doc.title = " ".join(str(child).split())
        elif isinstance(child, PreambleSection):
            prose_of(child, doc.intro_prose)
        elif isinstance(child, Section):
            sec = ParsedSection(ordinal=child.ordinal, title=child.title)
            prose_of(child, sec.prose)
            for sub in child:
                if isinstance(sub, Subsection):
                    ss = ParsedSection(ordinal=sub.ordinal,
                                       title=sub.title)
                    prose_of(sub, ss.prose)
                    sec.subs.append(ss)
            stack_out.append(sec)
    return doc
