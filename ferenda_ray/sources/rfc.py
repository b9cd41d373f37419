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


# ---------------------------------------------------------------------------
# distill: downloaded RFC text -> triple rows, graph-equal to the
# reference's golden distilled graphs (test/files/repo/rfc/distilled/
# *.ttl).  Semantics re-derived from ferenda/sources/tech/rfc.py:
# parse() (:483-538), parse_header (:552-648), get_rfc_num (:538-548),
# cleanup_body (:520-535), make_citation_parser (:430-452), the
# SectionalElement / PreambleSection RDFa serialization
# (elements/elements.py:611-665, rfc.py:37-57) and the commondata
# label graph (sources/tech/res/extra/rfc.ttl).

DCT = "http://purl.org/dc/terms/"
BIBO = "http://purl.org/ontology/bibo/"
RFC_ONT = "http://example.org/ontology/rfc/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PROV_GEN = "http://www.w3.org/ns/prov#wasGeneratedBy"
XSD_GYM = "http://www.w3.org/2001/XMLSchema#gYearMonth"

#: masthead first-line -> publisher resource path (foaf:name /
#: skos:altLabel rows of res/extra/rfc.ttl)
RFC_PUBLISHERS = {
    "Internet Engineering Task Force (IETF)": "ext/ietf",
    "IETF": "ext/ietf",
    "Internet Architecture Board (IAB)": "ext/iab",
    "IAB": "ext/iab",
    "Internet Research Task Force (IRTF)": "ext/irtf",
    "IRTF": "ext/irtf",
    "Independent Submission": "ext/independent",
    "Network Working Group": "ext/nwg",
}

#: Category header value -> collection path (bibo:identifier rows)
RFC_CATEGORIES = {
    "Standards Track": "dataset/rfc/standard",
    "Informational": "dataset/rfc/informational",
    "Experimental": "dataset/rfc/experimental",
    "Best Current Practice": "dataset/rfc/best-current-practice",
    "Historic": "dataset/rfc/historic",
    "Unknown": "dataset/rfc/unknown",
}

_MONTHS = {m: i + 1 for i, m in enumerate(
    ("January", "February", "March", "April", "May", "June", "July",
     "August", "September", "October", "November", "December"))}

# the reference's citation grammar (rfc.py:438-446): caseless
# 'section', case-sensitive 'RFC', optional brackets, whitespace
# (incl. newlines) between tokens, NO word boundaries (pyparsing
# scanString semantics)
_CIT_SECRFC = re.compile(
    r"(?i:section)\s*([0-9.]+)\s*of\s*\[?\s*RFC\s*(\d+)\s*\]?")
_CIT_SEC = re.compile(r"(?i:section)\s*([0-9.]+)")
_CIT_RFC = re.compile(r"\[?\s*RFC\s*(\d+)\s*\]?")


def rfc_citation_uris(text: str, doc_uri: str, base: str) -> list:
    """All citation URIs in a text span, in scan order (leftmost,
    non-overlapping, section-of-RFC > section > RFC at equal start —
    the CitationParser alternation order)."""
    out, pos = [], 0
    while pos < len(text):
        cands = []
        for prio, rx in enumerate((_CIT_SECRFC, _CIT_SEC, _CIT_RFC)):
            m = rx.search(text, pos)
            if m:
                cands.append((m.start(), prio, m))
        if not cands:
            break
        cands.sort(key=lambda c: (c[0], c[1]))
        _, prio, m = cands[0]
        if prio == 0:
            sec, num = m.group(1), m.group(2)
            out.append(f"{base}res/rfc/{num.lstrip('0')}"
                       f"#S{sec.rstrip('.')}")
        elif prio == 1:
            out.append(doc_uri + "#S" + m.group(1).rstrip("."))
        else:
            out.append(f"{base}res/rfc/{m.group(1).lstrip('0')}")
        pos = m.end()
    return out


def _part_text(part) -> str:
    """Concatenated strings of a part, excluding nested sectional /
    preamble children (they are their own citation subjects)."""
    from ferenda_ray.elements import (PreambleSection, Section)
    out = []

    def walk(node):
        for c in node:
            if isinstance(c, (Section, PreambleSection)):
                continue
            if isinstance(c, str):
                out.append(str(c))
            else:
                walk(c)

    walk(part)
    return "\n".join(out)


def _header_triples(header: str, doc_uri: str, base: str,
                    basefile: str) -> list:
    """parse_header + get_rfc_num semantics (rfc.py:538-648)."""

    def lit(p, v, lang=None, dt=None):
        return {"subj": doc_uri, "pred": p, "obj_type": "literal",
                "obj_value": v, "obj_lang": lang, "obj_datatype": dt}

    def rel(p, o):
        return {"subj": doc_uri, "pred": p, "obj_type": "uri",
                "obj_value": o, "obj_lang": None, "obj_datatype": None}

    lines = header.split("\n")
    left = [x.split("   ", 1)[0].strip() for x in lines]
    right = [x.split("   ", 1)[1].strip() for x in lines
             if "   " in x]
    trips = []
    pub = RFC_PUBLISHERS.get(left[0])
    trips.append(rel(DCT + "publisher", base + pub) if pub
                 else lit(DCT + "publisher", left[0]))
    rdftype = RFC_ONT + "RFC"
    have_identifier = False
    for line in left[1:]:
        if not line.strip() or ": " not in line:
            continue
        key, value = (x.strip() for x in line.split(": ", 1))
        if key == "Request for Comments":
            value = re.sub(r"\D", "", value)
            if value:
                trips.append(lit(DCT + "identifier", "RFC " + value))
                have_identifier = True
        elif key == "Category":
            cat = RFC_CATEGORIES.get(value)
            trips.append(rel(DCT + "subject", base + cat) if cat
                         else lit(DCT + "subject", value))
        elif key == "ISSN":
            trips.append(lit(DCT + "issn", value))
        elif key in ("Updates", "Obsoletes"):
            pred = RFC_ONT + key.lower()
            for part in value.split(", "):
                m = re.search(r"\d+", part)
                if m:
                    trips.append(rel(pred, f"{base}res/rfc/"
                                           f"{m.group(0)}"))
        elif key == "BCP":
            trips.append(lit(RFC_ONT + "bcpnumber", value))
            rdftype = RFC_ONT + "BCP"
        elif key == "STD":
            trips.append(lit(RFC_ONT + "stdnumber", value))
            # sic: the reference maps STD to rfc:FYI (rfc.py:608-610)
            rdftype = RFC_ONT + "FYI"
        elif key == "FYI":
            trips.append(lit(RFC_ONT + "fyinumber", value))
            rdftype = RFC_ONT + "FYI"
    trips.append(rel(RDF_TYPE, rdftype))
    if not have_identifier:
        trips.append(lit(DCT + "identifier", "RFC " + basefile))
    for line in right:
        if re.match(r"[A-Z]\. ", line):
            trips.append(lit(DCT + "creator", line))
        elif re.match(r"\w+ \d{4}$", line):
            month, year = line.split()
            trips.append(lit(DCT + "issued",
                             "%s-%02d" % (year, _MONTHS[month]),
                             dt=XSD_GYM))
        else:
            trips.append(lit(DCT + "rightsHolder", line))
    return trips


def rfc_get_num(header: str) -> str | None:
    for line in (x.split("   ", 1)[0].strip()
                 for x in header.split("\n")[1:]):
        if ": " in line:
            key, val = (x.strip() for x in line.split(": ", 1))
            if key == "Request for Comments":
                return re.sub(r"\D", "", val)
    return None


def rfc_distill(content: str, basefile: str,
                base: str = "http://localhost:8000/") -> list:
    """Downloaded RFC text → the reference's distilled triple graph
    (list of TRIPLES-shaped dicts, no graph/lineage columns)."""
    from ferenda_ray.elements import (PreambleSection, Section,
                                      Subsection, Subsubsection)

    # faux-bold backspace cleanup (rfc.py:518-523)
    content = re.sub(".\b", "", content)
    body = parse_rfc(content, basefile)
    header = str(body[0])
    title = " ".join(str(body[1]).split())
    realid = rfc_get_num(header) or basefile
    doc_uri = f"{base}res/rfc/{realid}"

    def lit(s, p, v, lang=None, dt=None):
        return {"subj": s, "pred": p, "obj_type": "literal",
                "obj_value": v, "obj_lang": lang, "obj_datatype": dt}

    def rel(s, p, o):
        return {"subj": s, "pred": p, "obj_type": "uri",
                "obj_value": o, "obj_lang": None,
                "obj_datatype": None}

    trips = [lit(doc_uri, PROV_GEN, "ferenda.sources.tech.rfc.RFC"),
             lit(doc_uri, DCT + "title", title, lang="en")]
    trips += _header_triples(header, doc_uri, base, basefile)

    # shorttitle from running page headers (cleanup_body :520-535:
    # last pagebreak at a level wins; a child's comes in only when
    # none seen yet)
    from ferenda_ray.elements import Pagebreak

    def find_short(part):
        short = None
        for sub in part:
            if isinstance(sub, Pagebreak):
                short = getattr(sub, "shorttitle", None)
            elif not isinstance(sub, str):
                s = find_short(sub)
                if short is None:
                    short = s
        return short

    short = find_short(body)
    if short and short != title:
        trips.append(lit(doc_uri, BIBO + "shortTitle", short,
                         lang="en"))

    # drop the ToC (rfc.py:534-538) and the header/title elements
    parts = [p for p in list(body)[2:]
             if not (isinstance(p, PreambleSection)
                     and getattr(p, "title", None)
                     == "Table of Contents")]

    ps_counter = 0

    def refs_of(part):
        seen, out = set(), []
        for u in rfc_citation_uris(_part_text(part), doc_uri, base):
            if u not in seen:
                seen.add(u)
                out.append(u)
        return out

    def emit_part(part, uri, parent_uri):
        trips.append(rel(uri, RDF_TYPE, BIBO + "DocumentPart"))
        trips.append(lit(uri, DCT + "title", part.title, lang="en"))
        if parent_uri is not None:
            trips.append(rel(uri, DCT + "isPartOf", parent_uri))
        ordinal = getattr(part, "ordinal", None)
        if ordinal is not None:
            trips.append(lit(uri, BIBO + "chapter", ordinal,
                             lang="en"))
        ident = getattr(part, "identifier", None)
        if ident is not None:
            trips.append(lit(uri, DCT + "identifier", ident,
                             lang="en"))
        for ref in refs_of(part):
            trips.append(rel(uri, DCT + "references", ref))

    def walk(node, parent_uri):
        nonlocal ps_counter
        for part in node:
            if isinstance(part, PreambleSection):
                ps_counter += 1
                emit_part(part, f"{doc_uri}#PS{ps_counter}", None)
                walk(part, None)
            elif isinstance(part, (Section, Subsection,
                                   Subsubsection)):
                uri = f"{doc_uri}#S{part.ordinal}"
                emit_part(part, uri, parent_uri or doc_uri)
                walk(part, uri)
            elif not isinstance(part, str):
                walk(part, parent_uri)

    walk(parts, None)

    # stray citations outside any part attach to the document itself
    from ferenda_ray.elements import Paragraph
    stray = [p for p in parts
             if not isinstance(p, (PreambleSection, Section))]
    for p in stray:
        if isinstance(p, str):
            continue
        for ref in refs_of(p):
            trips.append(rel(doc_uri, DCT + "references", ref))
    return trips
