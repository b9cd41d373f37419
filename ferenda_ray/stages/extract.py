"""Stage 1 — stateless triple extraction (``map_batches``).

The Ray-native restatement of the reference's *parse* action
(``@managedparsing`` chain, ``ferenda/decorators.py:330-341``;
``DocumentRepository.parse``, ``documentrepository.py:1196-1219``): per
source row, recognize structure (FSM recognizers), mint canonical URIs
(COIN semantics) and emit triple rows directly — where ferenda renders
XHTML+RDFa and *distills* the triples back out of it
(``decorators.py:201-227``), this engine emits the same triple set
without the round-trip.

Emitted per document (mirrors ``parse_metadata_from_soup``,
``documentrepository.py:1314-1320``, plus the RDFa output of
``SectionalElement.as_xhtml``, ``ferenda/elements/elements.py:625-657``):

* ``rdf:type bibo:Document``, ``dcterms:title`` (lang-tagged),
  ``dcterms:identifier``, ``dcterms:language``, ``dcterms:creator``,
  ``dcterms:issued`` (xsd:date), ``prov:wasGeneratedBy``,
  ``fr:contentSha256`` (the per-row lineage invariant);
* per section: ``bibo:DocumentPart`` / ``dcterms:title`` /
  ``bibo:chapter`` / ``dcterms:isPartOf``;
* per citation hit: ``dcterms:references`` (CitationParser grammar);
* per import: ``dcterms:requires``;
* one ``obj_type="mention"`` row per prose blob, consumed by the
  entity-linking actor pool (stage 2);
* on parse failure: one ``obj_type="error"`` row — per-row error
  capture instead of task failure (``FSMStateError`` semantics,
  ``fsmparser.py:150-152``; SURVEY.md §7.4).

The batch function is a plain function (no actor): all state is
module-level compiled regexes / template config (SURVEY.md §7.2).  The
hot loop is per-row because parsing is inherently per-document; all
column access is zero-copy Arrow, and the ``content`` column is dropped
on output — only sha256 + derived rows flow downstream (SURVEY.md §7.4
"wide records").
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ferenda_ray import ns
from ferenda_ray.citations import extract_reference_uris, import_uris
from ferenda_ray.corpus import ENGINE_URI, GRAPH
from ferenda_ray.fsm import FSMStateError
from ferenda_ray.recognizers import ParsedDoc, parse_content
from ferenda_ray.schema import TRIPLES
from ferenda_ray.uri import DEFAULT_BASE, doc_uri, frag_uri


class _Emitter:
    """Column-wise row accumulator → one Arrow table per batch."""

    __slots__ = ("cols", "graph", "src_repo", "src_path")

    def __init__(self, graph: str):
        self.cols = {name: [] for name in TRIPLES.names}
        self.graph = graph
        self.src_repo = None
        self.src_path = None

    def row(self, subj, pred, obj_type, obj_value, obj_lang=None,
            obj_datatype=None):
        c = self.cols
        c["subj"].append(subj)
        c["pred"].append(pred)
        c["obj_type"].append(obj_type)
        c["obj_value"].append(obj_value)
        c["obj_lang"].append(obj_lang)
        c["obj_datatype"].append(obj_datatype)
        c["graph"].append(self.graph)
        c["src_repo"].append(self.src_repo)
        c["src_path"].append(self.src_path)

    def uri(self, s, p, o):
        self.row(s, p, "uri", o)

    def lit(self, s, p, o, lang=None, dt=None):
        self.row(s, p, "literal", o, lang, dt)

    def table(self) -> pa.Table:
        return pa.table(self.cols, schema=TRIPLES)


def _emit_doc(em: _Emitter, du: str, parsed: ParsedDoc, repo: str, path: str,
              commit: str, lang: str, sha: str, base: str) -> None:
    em.uri(du, ns.RDF_TYPE, ns.BIBO_DOCUMENT)
    if parsed.title:
        em.lit(du, ns.DCTERMS_TITLE, parsed.title, lang="en")
    em.lit(du, ns.DCTERMS_IDENTIFIER, f"{repo}/{path}@{commit[:7]}")
    em.lit(du, ns.DCTERMS_LANGUAGE, lang)
    if "Author" in parsed.meta:
        em.lit(du, ns.DCTERMS + "creator", parsed.meta["Author"])
    if "Issued" in parsed.meta:
        em.lit(du, ns.DCTERMS_ISSUED, parsed.meta["Issued"],
               dt=ns.XSD_DATE)
    em.uri(du, ns.PROV_WASGENERATEDBY, ENGINE_URI)
    em.lit(du, ns.FR_CONTENT_SHA256, sha)
    for u in import_uris(parsed.imports, base):
        em.uri(du, ns.DCTERMS + "requires", u)

    def handle_prose(owner_uri: str, prose: list) -> None:
        if not prose:
            return
        text = " ".join(prose)
        for u in extract_reference_uris(text, base):
            em.uri(owner_uri, ns.DCTERMS_REFERENCES, u)
        # mention row: linker resolves aliases; subj = the DOCUMENT
        # (dcterms:subject attaches doc-level, as the reference's
        # keyword hub does — sources/general/keyword.py:107-173)
        em.row(du, ns.FR_MENTIONS, "mention", text)

    handle_prose(du, parsed.intro_prose)

    def emit_section(sec, parent_uri):
        fu = frag_uri(du, sec.ordinal)
        em.uri(fu, ns.RDF_TYPE, ns.BIBO_DOCUMENTPART)
        em.lit(fu, ns.DCTERMS_TITLE, sec.title)
        em.lit(fu, ns.BIBO_CHAPTER, sec.ordinal)
        em.uri(fu, ns.DCTERMS_ISPARTOF, parent_uri)
        handle_prose(fu, sec.prose)
        for sub in sec.subs:
            emit_section(sub, fu)

    for sec in parsed.sections:
        emit_section(sec, du)


def extract_batch(batch: pa.Table, base: str = DEFAULT_BASE,
                  graph: str = GRAPH) -> pa.Table:
    """sources batch → triples/mentions batch (Arrow in / Arrow out)."""
    em = _Emitter(graph)
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()
    for repo, path, commit, lang, content in zip(
            repos, paths, commits, langs, contents):
        em.src_repo, em.src_path = repo, path
        du = doc_uri(repo, path, commit, base)
        sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
        try:
            parsed = parse_content(lang, content)
            _emit_doc(em, du, parsed, repo, path, commit, lang, sha, base)
        except FSMStateError as e:  # poison-pill isolation
            em.row(du, ns.FR + "parseError", "error", str(e))
            em.lit(du, ns.FR_CONTENT_SHA256, sha)
    return em.table()


def extract(sources, base: str = DEFAULT_BASE, graph: str = GRAPH,
            batch_size: int = 256):
    """``Dataset`` of sources → ``Dataset`` of triple/mention rows.

    ``batch_size`` is modest because ``content`` rows are wide (whole
    files); 256 rows × a few KiB ≈ 1 MiB per batch in flight per task.
    """
    import functools
    fn = functools.partial(extract_batch, base=base, graph=graph)
    return sources.map_batches(fn, batch_format="pyarrow",
                               batch_size=batch_size)
