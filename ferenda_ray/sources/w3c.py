"""W3C standards repo: downloaded Recommendation HTML → distilled
triples, graph-equal to the reference's RepoTester goldens
(``test/files/repo/w3c/{downloaded,distilled}``).

Semantics re-derived from ``ferenda/sources/tech/w3c.py``:
``parse_metadata_from_soup`` (:209-266 — title from ``<title>``,
identifier = basefile, issued from the "W3C Recommendation <date>"
heading, publisher ext/w3c, prov class name),
``get_parser`` (:84-208 — h1-h4 headings; preamble titles
abstract / status of this document / table of contents / appendices;
``analyze_sectionstart`` regex ``^(\\d[\\.\\d]*) +(.*[^\\.])$``) and
``decorate_bodyparts`` (:290-303 — DocumentPart + title@en + chapter
with NO language tag, no isPartOf/identifier).
"""

from __future__ import annotations

import re
from datetime import datetime
from html.parser import HTMLParser

DCT = "http://purl.org/dc/terms/"
BIBO = "http://purl.org/ontology/bibo/"
W3C_ONT = "http://example.org/ontology/w3c/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PROV_GEN = "http://www.w3.org/ns/prov#wasGeneratedBy"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"

_PREAMBLE_TITLES = ("abstract", "status of this document",
                    "table of contents", "appendices")

_SECTIONSTART = re.compile(r"^(\d[\.\d]*) +(.*[^\.])$")
_RECDATE = re.compile(r"W3C\s+Recommendation,?\s+")
_DATESTR = re.compile(r"(\d+)[ \-](\w+),?[ \-](\d{4})")


class _HeadingScanner(HTMLParser):
    """<title> + h1-h4 headings with normalized plaintext, in
    document order."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title = None
        self.headings: list = []     # (tag, text)
        self._stack: list = []       # open capture buffers

    def handle_starttag(self, tag, attrs):
        if tag in ("h1", "h2", "h3", "h4", "title"):
            self._stack.append((tag, []))

    def handle_endtag(self, tag):
        if self._stack and self._stack[-1][0] == tag:
            t, buf = self._stack.pop()
            text = " ".join("".join(buf).split())
            if t == "title":
                self.title = text
            else:
                self.headings.append((t, text))

    def handle_data(self, data):
        if self._stack:
            self._stack[-1][1].append(data)


def _parse_issued(headings) -> str | None:
    for tag, text in headings:
        if tag in ("h2", "h3") and _RECDATE.search(text):
            m = _DATESTR.search(" ".join(text.split()))
            if not m:
                return None
            datestr = " ".join(m.groups())
            for fmt in ("%d %B %Y", "%d %b %Y"):
                try:
                    return datetime.strptime(datestr, fmt) \
                        .strftime("%Y-%m-%d")
                except ValueError:
                    continue
    return None


def w3c_distill(html_text: str, basefile: str,
                base: str = "http://localhost:8000/") -> list:
    """Downloaded W3C Recommendation HTML → triple rows (the
    distilled graph)."""
    scanner = _HeadingScanner()
    scanner.feed(html_text)
    doc_uri = f"{base}res/w3c/{basefile}"

    def lit(s, p, v, lang=None, dt=None):
        return {"subj": s, "pred": p, "obj_type": "literal",
                "obj_value": v, "obj_lang": lang, "obj_datatype": dt}

    def rel(s, p, o):
        return {"subj": s, "pred": p, "obj_type": "uri",
                "obj_value": o, "obj_lang": None,
                "obj_datatype": None}

    trips = [
        rel(doc_uri, RDF_TYPE, W3C_ONT + "Recommendation"),
        lit(doc_uri, PROV_GEN, "ferenda.sources.tech.w3c.W3Standards"),
        lit(doc_uri, DCT + "title", scanner.title, lang="en"),
        lit(doc_uri, DCT + "identifier", basefile),
        rel(doc_uri, DCT + "publisher", base + "ext/w3c"),
    ]
    issued = _parse_issued(scanner.headings)
    if issued:
        trips.append(lit(doc_uri, DCT + "issued", issued,
                         dt=XSD_DATE))

    ps_counter = 0
    in_sections = False
    for tag, text in scanner.headings:
        m = _SECTIONSTART.match(text)
        if m:
            in_sections = True
            uri = f"{doc_uri}#S{m.group(1).rstrip('.')}"
            trips.append(rel(uri, RDF_TYPE, BIBO + "DocumentPart"))
            trips.append(lit(uri, DCT + "title", m.group(2),
                             lang="en"))
            trips.append(lit(uri, BIBO + "chapter",
                             m.group(1).rstrip(".")))
        elif (text.lower() in _PREAMBLE_TITLES and not in_sections):
            ps_counter += 1
            uri = f"{doc_uri}#PS{ps_counter}"
            trips.append(rel(uri, RDF_TYPE, BIBO + "DocumentPart"))
            trips.append(lit(uri, DCT + "title", text, lang="en"))
    return trips
