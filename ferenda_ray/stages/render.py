"""Presentation-side stages: patches, link transforms, XHTML+RDFa.

Three per-record operators from the reference's parse/generate
surface, restated as ``map_batches`` stages:

* :func:`apply_patch` / :func:`patch_stage` — ``patch_if_needed``
  (``documentrepository.py:1355-1404``): apply a per-document unified
  diff before parsing; patch table is a small broadcast side input
  keyed by document id.  A conflicting patch raises
  :class:`PatchError` per row, captured as an ``patch_status`` column
  (the reference raises and aborts the doc; we must stay
  row-parallel).
* :func:`transform_links` / :func:`transformlinks_stage` —
  ``transformlinks`` (``:2754-2797``) + the url-transform closures
  (``:2534-2632``): rewrite every ``href``/``src`` in generated HTML
  through a url function (develurl / staticsite relocation,
  remove-invalid-links), regex-vectorized per batch.
* :func:`render_xhtml` / :func:`render_stage` — ``render_xhtml``
  (``:1459-1683``): serialize a document's triples to XHTML+RDFa
  (head ``<meta>``/``<link>`` per triple, ``@about``-scoped
  ``<div>`` per fragment subject) such that distilling the RDFa
  yields exactly the input triples — the reference's round-trip
  invariant (``decorators.py:201-227``), asserted in tests by
  re-extracting triples from the output.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa


class PatchError(Exception):
    """Patch does not apply (context mismatch) or is malformed —
    ``errors.PatchError`` analogue."""


# ---------------------------------------------------------------------------
# unified-diff application (thirdparty/patchit replacement, stdlib-only)

_HUNK = re.compile(r"@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


def _parse_hunks(patch: str) -> list:
    """Unified diff → [(src_start_0based, [hunk_lines])], validated."""
    hunks: list = []
    current: list | None = None
    for ln in patch.split("\n"):
        m = _HUNK.match(ln)
        if m:
            current = []
            hunks.append((int(m.group(1)) - 1, current))
        elif ln.startswith(("---", "+++")) or ln.startswith("\\"):
            continue
        elif current is not None and (ln.startswith(("-", "+", " "))
                                      or ln == ""):
            if ln:
                current.append(ln)
        elif ln.strip() and current is None:
            if ln.startswith(("-", "+")):
                raise PatchError(f"hunk line before @@ header: {ln!r}")
    if not hunks:
        raise PatchError("no hunks in patch")
    return hunks


def apply_patch(text: str, patch: str) -> str:
    """Apply a (possibly multi-hunk) single-file unified diff to
    ``text``.  Context and deletion lines are verified against the
    source; mismatch raises :class:`PatchError` (the
    ``PatchConflictError`` path)."""
    lines = text.split("\n")
    out: list = []
    src = 0
    for start, hunk in _parse_hunks(patch):
        if start < src:
            raise PatchError("hunks out of order or overlapping")
        out.extend(lines[src:start])
        src = start
        for hl in hunk:
            tag, content = hl[0], hl[1:]
            if tag == "-":
                if src >= len(lines) or lines[src] != content:
                    raise PatchError(
                        f"context mismatch at line {src + 1}: "
                        f"expected {content!r}")
                src += 1
            elif tag == "+":
                out.append(content)
            else:  # context line
                if src >= len(lines) or lines[src] != content:
                    raise PatchError(
                        f"context mismatch at line {src + 1}")
                out.append(lines[src])
                src += 1
    out.extend(lines[src:])
    return "\n".join(out)


def patch_stage(ds, patches: dict, id_col: str = "doc_id",
                text_col: str = "text"):
    """Broadcast {doc_id: unified_diff}; rows with a patch get it
    applied, adding ``patch_status`` ∈ {none, patched,
    error:<reason>}.  Small patch table ⇒ task-closure broadcast."""
    def apply_batch(b: pa.Table) -> pa.Table:
        texts, status = [], []
        for i, t in zip(b.column(id_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            p = patches.get(i)
            if p is None:
                texts.append(t)
                status.append("none")
            else:
                try:
                    texts.append(apply_patch(t, p))
                    status.append("patched")
                except PatchError as e:
                    texts.append(t)
                    status.append(f"error:{e}")
        idx = b.schema.get_field_index(text_col)
        b = b.set_column(idx, text_col,
                         pa.array(texts, b.schema.field(text_col).type))
        return b.append_column("patch_status", pa.array(status, pa.string()))

    return ds.map_batches(apply_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# link transformation (transformlinks, :2754-2797; closures :2534-2632)

_ATTR = re.compile(r"""\b(href|src)\s*=\s*(["'])(.*?)\2""", re.IGNORECASE)


def transform_links(html_text: str, transform) -> str:
    """Rewrite every href/src through ``transform(url) -> url | None``;
    ``None`` removes the attribute (remove-invalid-links semantics)."""
    def sub(m):
        new = transform(m.group(3))
        if new is None:
            return ""
        return f"{m.group(1)}={m.group(2)}{new}{m.group(2)}"

    return _ATTR.sub(sub, html_text)


def develurl_transform(develurl: str, canonical_base: str):
    """Canonical-base → development-server URL rewriter (the
    ``develurl`` closure, ``:2592-2602`` shape)."""
    def transform(url: str):
        if url.startswith(canonical_base):
            return develurl.rstrip("/") + "/" + url[len(canonical_base):]
        return url
    return transform


def transformlinks_stage(ds, transform, html_col: str = "html"):
    def fn(b: pa.Table) -> pa.Table:
        rewritten = [transform_links(h, transform)
                     for h in b.column(html_col).to_pylist()]
        idx = b.schema.get_field_index(html_col)
        return b.set_column(idx, html_col,
                            pa.array(rewritten,
                                     b.schema.field(html_col).type))
    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# XHTML+RDFa rendering (render_xhtml, :1459-1683)

_XHTML_NS = 'xmlns="http://www.w3.org/1999/xhtml"'


def _esc(s: str) -> str:
    return _html.escape(s, quote=True)


def render_xhtml(doc_uri: str, triples: list) -> str:
    """One document's triples → an XHTML+RDFa page string.

    ``triples``: (subj, pred, obj_type, obj_value, obj_lang,
    obj_datatype) tuples; subjects are ``doc_uri`` or fragment URIs
    ``doc_uri#...``.  Doc-level triples render in ``<head>`` as
    ``<meta property>``/``<link rel>`` (``render_xhtml_tree``'s head
    serialization, ``:1513-1622``); fragment subjects become
    ``@about``-scoped ``<div>`` elements in ``<body>`` (the
    ``as_xhtml`` RDFa output, ``elements.py:625-657``)."""
    head, body = [], []
    by_subj: dict = {}
    for t in triples:
        by_subj.setdefault(t[0], []).append(t)

    def emit(subj, rows, out, indent):
        pad = " " * indent
        for _, pred, otype, oval, olang, odt in sorted(
                rows, key=lambda r: (r[1], str(r[3]))):
            if otype == "uri":
                out.append(f'{pad}<link rel="{_esc(pred)}" '
                           f'href="{_esc(oval)}"/>')
            else:
                attrs = f'property="{_esc(pred)}" content="{_esc(oval)}"'
                if olang:
                    attrs += f' xml:lang="{_esc(olang)}"'
                if odt:
                    attrs += f' datatype="{_esc(odt)}"'
                out.append(f"{pad}<meta {attrs}/>")

    emit(doc_uri, by_subj.pop(doc_uri, []), head, 4)
    for subj in sorted(by_subj):
        body.append(f'    <div about="{_esc(subj)}" typeof="">')
        emit(subj, by_subj[subj], body, 6)
        body.append("    </div>")
    return "\n".join(
        ['<?xml version="1.0" encoding="utf-8"?>',
         f'<html {_XHTML_NS} about="{_esc(doc_uri)}">',
         "  <head>"] + head
        + ["  </head>", "  <body>"] + body + ["  </body>", "</html>", ""])


_RDFA_META = re.compile(
    r'<meta property="([^"]+)" content="([^"]*)"'
    r'(?: (?:xml:)?lang="([^"]*)")?(?: datatype="([^"]*)")?\s*/>')
_RDFA_LINK = re.compile(r'<link rel="([^"]+)" href="([^"]*)"\s*/>')
# presentation-only link rels that carry no RDFa statement
_PRESENTATION_RELS = frozenset({"stylesheet", "icon", "preload"})
_RDFA_SCOPE = re.compile(r'<(html|div|section)[^>]*\babout="([^"]*)"')


def distill_xhtml(xhtml: str) -> list:
    """Parse RDFa back to (subj, pred, obj_type, obj_value, obj_lang,
    obj_datatype) tuples — the reference's *distill* step
    (``decorators.py:201-227``), used to assert the round-trip."""
    out = []
    subj = None
    for ln in xhtml.split("\n"):
        m = _RDFA_SCOPE.search(ln)
        if m:
            subj = _html.unescape(m.group(2))
            continue
        m = _RDFA_META.search(ln)
        if m:
            out.append((subj, _html.unescape(m.group(1)), "literal",
                        _html.unescape(m.group(2)),
                        _html.unescape(m.group(3)) if m.group(3) else None,
                        _html.unescape(m.group(4)) if m.group(4) else None))
            continue
        m = _RDFA_LINK.search(ln)
        if m and m.group(1) not in _PRESENTATION_RELS:
            out.append((subj, _html.unescape(m.group(1)), "uri",
                        _html.unescape(m.group(2)), None, None))
    return out


def render_stage(triples, num_partitions: int | None = None):
    """Triples Dataset → Dataset ``(doc_uri, xhtml)``: group by the
    fragment-stripped document URI (one shuffle keyed like the
    annotations join), render per group."""
    def keyed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc = pc.replace_substring_regex(b.column("subj"), "#.*$", "")
        return b.append_column("_doc", doc)

    def render(group: pa.Table) -> pa.Table:
        doc_uri = group.column("_doc")[0].as_py()
        rows = list(zip(group.column("subj").to_pylist(),
                        group.column("pred").to_pylist(),
                        group.column("obj_type").to_pylist(),
                        group.column("obj_value").to_pylist(),
                        group.column("obj_lang").to_pylist(),
                        group.column("obj_datatype").to_pylist()))
        return pa.table({"doc_uri": [doc_uri],
                         "xhtml": [render_xhtml(doc_uri, rows)]})

    return (triples.map_batches(keyed, batch_format="pyarrow")
            .groupby("_doc").map_groups(render, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Grit annotation XML (graph_to_annotation_file, :2693-2726)

def to_grit_xml(triples: list) -> str:
    """Serialize (subj, pred, obj_type, obj_value, obj_lang,
    obj_datatype) tuples to Grit-shaped XML — the flattened
    one-element-per-resource RDF layout the reference produces via its
    ``rdfxml-grit.xsl`` for easy XSLT inclusion: ``<graph>`` of
    ``<resource uri=…>`` with one child element per statement
    (literal text, or ``<ref>`` for URI objects)."""
    from ferenda_ray import ns as _ns
    by_subj: dict = {}
    for t in triples:
        by_subj.setdefault(t[0], []).append(t)
    out = ['<graph xmlns="http://purl.org/oort/impl/xmlns/grit#">']
    for subj in sorted(by_subj):
        out.append(f'  <resource uri="{_esc(subj)}">')
        for _, pred, otype, oval, olang, odt in sorted(
                by_subj[subj], key=lambda r: (r[1], str(r[3]))):
            tag = _ns.qname(pred).replace(":", "-")
            if otype == "uri":
                out.append(f'    <{tag}><ref>{_esc(oval)}</ref></{tag}>')
            else:
                attrs = ""
                if olang:
                    attrs += f' xml:lang="{_esc(olang)}"'
                if odt:
                    attrs += f' fmt="{_esc(odt)}"'
                out.append(f"    <{tag}{attrs}>{_esc(oval)}</{tag}>")
        out.append("  </resource>")
    out.append("</graph>")
    return "\n".join(out) + "\n"


def annotations_grit(triples, target_prefix: str | None = None):
    """Per-target Grit annotation documents: the inbound-reference
    groupby (``construct_annotations``) + Grit serialization
    (``prep_annotation_file``) as one stage — Dataset
    ``(target_uri, grit_xml, n_inbound)``."""
    import pyarrow.compute as pc

    def proj(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("obj_type"), "uri")
        if target_prefix:
            keep = pc.and_(keep, pc.starts_with(
                b.column("obj_value").cast(pa.string()), target_prefix))
        b = b.filter(keep)
        return pa.table({
            "target_uri": b.column("obj_value").cast(pa.string()),
            "subj": b.column("subj"), "pred": b.column("pred")})

    def grit(group: pa.Table) -> pa.Table:
        target = group.column("target_uri")[0].as_py()
        rows = [(s, p, "uri", target, None, None) for s, p in
                sorted(zip(group.column("subj").to_pylist(),
                           group.column("pred").to_pylist()))]
        return pa.table({
            "target_uri": [target],
            "grit_xml": [to_grit_xml(rows)],
            "n_inbound": [group.num_rows],
        })

    return (triples.map_batches(proj, batch_format="pyarrow")
            .groupby("target_uri").map_groups(grit,
                                              batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# HTML5 presentation transform (ferenda/transformer.py:25-372 semantics:
# parsed XHTML+RDFa → templated, navigable HTML5 with depth-relative
# asset links; the reference drives an XSLT file, this engine performs
# the equivalent tree rewrite with stdlib parsing — no XSLT processor
# in the environment)

def xhtml_to_html5(xhtml: str, title: str | None = None,
                   depth: int = 0, stylesheets: tuple = ("css/main.css",),
                   scripts: tuple = ()) -> str:
    """One document's XHTML+RDFa string → an HTML5 page.

    * ``<!DOCTYPE html>`` + unnamespaced ``<html>``
    * head RDFa ``<meta>``/``<link>`` preserved (data attributes keep
      round-tripping through :func:`distill_xhtml`)
    * ``dcterms:title`` (or ``title=``) becomes ``<title>`` and a
      visible ``<h1>``
    * fragment ``<div about>`` sections become ``<section about>``
    * asset URLs are prefixed ``../`` × depth — the transformer's
      depth parameter (``transformer.py:127-160``)
    """
    triples = distill_xhtml(xhtml)
    doc_uri = None
    m = _RDFA_SCOPE.search(xhtml)
    if m:
        doc_uri = _html.unescape(m.group(2))
    if title is None:
        for s, p, ot, ov, _, _ in triples:
            if s == doc_uri and p.endswith("title"):
                title = ov
                break
    title = title or (doc_uri or "")
    rel = "../" * depth
    head = [f"    <title>{_esc(title)}</title>"]
    for sheet in stylesheets:
        head.append(f'    <link rel="stylesheet" href="{rel}{_esc(sheet)}"/>')
    for script in scripts:
        head.append(f'    <script src="{rel}{_esc(script)}"></script>')
    doc_rows = [t for t in triples if t[0] == doc_uri]
    frag_subjects: dict = {}
    for t in triples:
        if t[0] != doc_uri:
            frag_subjects.setdefault(t[0], []).append(t)
    for _, pred, otype, oval, olang, odt in sorted(
            doc_rows, key=lambda r: (r[1], str(r[3]))):
        if otype == "uri":
            head.append(f'    <link rel="{_esc(pred)}" '
                        f'href="{_esc(oval)}"/>')
        else:
            attrs = f'property="{_esc(pred)}" content="{_esc(oval)}"'
            if olang:
                attrs += f' lang="{_esc(olang)}"'
            if odt:
                attrs += f' datatype="{_esc(odt)}"'
            head.append(f"    <meta {attrs}/>")
    body = [f"    <h1>{_esc(title)}</h1>"]
    for subj in sorted(frag_subjects):
        body.append(f'    <section about="{_esc(subj)}">')
        for _, pred, otype, oval, olang, odt in sorted(
                frag_subjects[subj], key=lambda r: (r[1], str(r[3]))):
            if otype == "uri":
                body.append(f'      <link rel="{_esc(pred)}" '
                            f'href="{_esc(oval)}"/>')
            else:
                body.append(f'      <meta property="{_esc(pred)}" '
                            f'content="{_esc(oval)}"/>')
        body.append("    </section>")
    about = f' about="{_esc(doc_uri)}"' if doc_uri else ""
    return "\n".join(
        ["<!DOCTYPE html>", f"<html{about}>", "  <head>"] + head
        + ["  </head>", "  <body>"] + body + ["  </body>", "</html>", ""])


def html5_stage(pages, depth: int = 0):
    """Dataset ``(doc_uri, xhtml)`` → ``(doc_uri, html5)`` — the
    *generate* presentation pass as a vectorless but per-row-cheap
    map_batches stage (string rewrite only)."""
    def fn(b: pa.Table) -> pa.Table:
        html5 = [xhtml_to_html5(x, depth=depth)
                 for x in b.column("xhtml").to_pylist()]
        return pa.table({"doc_uri": b.column("doc_uri"),
                         "html5": pa.array(html5, pa.large_string())})
    return pages.map_batches(fn, batch_format="pyarrow")
