"""JSON search/stats API — conformance with the reference's WSGI API.

Reference surface: ``ferenda/wsgiapp.py:388-660`` (query parsing,
result mangling ``:435-480``) over an ES/Whoosh fulltext index
(``fulltextindex.py:996-1085``), golden responses
``test/files/api/basicapi-*.json`` (built by
``test/integrationAPI.py:23-127`` from ``test/files/base``).

Ray-Data restatement: the "index" is a Dataset of per-``@about``
resource rows (uri, doc_uri, basefile, repo, text) built by one
``map_batches`` pass over parsed XHTML; a query is a vectorized
scoring scan; only the page of hits (small by construction) reaches
the driver for JSON mangling.

Pinned serialization quirks (each asserted byte-for-byte by a
golden):

* resource text keeps a LEADING space — the reference pads the
  highlight soup with one (``fulltextindex.py:1080-1082``);
* doc-level ``matches.text`` wraps the hit as
  ``<em class="match">{tok}</em>`` with the raw text around it;
* innerhits ``text`` is a segment list ``[pre, [tok + " "], post]``
  — the matched token gains a trailing space from the reference's
  ``"</em>" -> " </strong>"`` replace (``fulltextindex.py:1079``),
  and ``post`` keeps its own leading space;
* inner hits report ``repo = f"{repo}_child"`` (the ES join-type
  child document);
* items are sorted by uri DESCENDING (``wsgiapp.py:448-451``);
* the legacy API drops the prefix from field names
  (``dcterms_issued`` → ``issued``), drops innerhits, and its stats
  ``type`` term is the URI leaf, not a qname (``wsgiapp.py:455-461``).
"""

from __future__ import annotations

import fnmatch
import re
import xml.etree.ElementTree as ET

import pyarrow as pa

XHTML_NS = "{http://www.w3.org/1999/xhtml}"
_WS = re.compile(r"\s+")

#: qname prefixes for the stats 'term' dimension (wsgiapp qname use)
PREFIXES = {
    "http://purl.org/ontology/bibo/": "bibo",
    "http://purl.org/dc/terms/": "dcterms",
    "http://xmlns.com/foaf/0.1/": "foaf",
    "http://www.w3.org/2000/01/rdf-schema#": "rdfs",
}

#: the basic facet set of the golden corpus (DocumentRepository's
#: default facets: rdf:type, dcterms:title excluded from stats,
#: dcterms:publisher, dcterms:issued — documentrepository.py facets())
STATS_FACETS = (("dcterms_issued", "year"),
                ("dcterms_publisher", "ref"),
                ("rdf_type", "term"))


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


def parse_xhtml_resources(xhtml: str) -> list[dict]:
    """Parsed XHTML+RDFa → per-``@about`` resource rows in document
    order: ``{"uri", "text"}`` where text is the prose belonging to
    that resource and NOT to a nested ``@about`` subtree — the
    reference's indexing walk (``documentrepository.py:2082-2149``).
    Every prose block contributes ``" " + normalized`` (leading-space
    quirk above)."""
    root = ET.fromstring(xhtml)
    body = root.find(XHTML_NS + "body")
    order: list[str] = []
    texts: dict[str, list] = {}

    def visit(el, current):
        about = el.get("about")
        if about is not None:
            current = about
            if current not in texts:
                order.append(current)
                texts[current] = []
        if el.tag == XHTML_NS + "p":
            t = _norm("".join(el.itertext()))
            if t:
                texts.setdefault(current, []).append(" " + t)
        for child in el:
            visit(child, current)

    visit(body, None)
    return [{"uri": u, "text": "".join(texts[u])} for u in order]


def resource_rows(docs) -> "pa.Table":
    """Doc list ``[{doc_uri, basefile, repo, xhtml}]`` → Arrow index
    rows (uri, doc_uri, basefile, repo, text).  Wrap in
    ``ray.data.from_arrow`` for the distributed path."""
    cols = {k: [] for k in ("uri", "doc_uri", "basefile", "repo",
                            "text")}
    for d in docs:
        for res in parse_xhtml_resources(d["xhtml"]):
            cols["uri"].append(res["uri"])
            cols["doc_uri"].append(d["doc_uri"])
            cols["basefile"].append(d["basefile"])
            cols["repo"].append(d["repo"])
            cols["text"].append(res["text"])
    return pa.table({k: pa.array(v, pa.large_string() if k == "text"
                                 else pa.string())
                     for k, v in cols.items()})


def doc_meta(triples: list[dict]) -> dict:
    """Distilled triples → per-doc facet fields keyed by doc uri.
    Doc-level resources are those typed bibo:Standard/bibo:Document
    (fragment-free subjects)."""
    meta: dict[str, dict] = {}
    for t in triples:
        s = t["subj"]
        if "#" in s:
            continue
        d = meta.setdefault(s, {"iri": s})
        p, v = t["pred"], t["obj_value"]
        if p.endswith("22-rdf-syntax-ns#type"):
            d["rdf_type"] = v
        elif p.endswith("/title"):
            d["dcterms_title"] = v
        elif p.endswith("/identifier"):
            d["dcterms_identifier"] = v
        elif p.endswith("/issued"):
            d["dcterms_issued"] = v
        elif p.endswith("/publisher"):
            d["dcterms_publisher"] = {"iri": v, "label": v}
    return meta


def _field_match(value, pattern: str) -> bool:
    v = value["iri"] if isinstance(value, dict) else str(value)
    if "*" in pattern or "?" in pattern:
        return fnmatch.fnmatchcase(v, pattern)
    return v == pattern


def _resolve_field(name: str) -> str:
    """legacy 'publisher' → 'dcterms_publisher' (the endswith
    resolution of ``wsgiapp._guess_real_fieldname``)."""
    for full in ("dcterms_identifier", "dcterms_title",
                 "dcterms_issued", "dcterms_publisher", "rdf_type"):
        if full.endswith(name):
            return full
    return name


def _hit_spans(text: str, q: str) -> list[tuple]:
    return [(m.start(), m.end())
            for m in re.finditer(rf"(?i)\b{re.escape(q)}\b", text)]


def _matches_html(text: str, spans) -> str:
    out, last = [], 0
    for s, e in spans:
        out.append(text[last:s])
        out.append('<em class="match">%s</em>' % text[s:e])
        last = e
    out.append(text[last:])
    return "".join(out)


def _inner_segments(text: str, spans) -> list:
    out, last = [], 0
    for s, e in spans:
        out.append(text[last:s])
        out.append([text[s:e] + " "])
        last = e
    if last < len(text):
        out.append(text[last:])
    return out


def api_search(index, meta: dict, q: str | None = None,
               filters: dict | None = None, path: str = "/myapi/",
               query_string: str = "", legacy: bool = False,
               page_size: int = 10, page: int = 0,
               max_hits: int = 10_000) -> dict:
    """One API query → the reference's JSON response dict.

    ``index`` is a Ray Dataset (or Arrow table) of resource rows;
    scoring runs distributed via ``map_batches``; the driver-side
    collect is CAPPED at ``max_hits`` matching rows (a common term
    at corpus scale would otherwise collect the corpus — use
    :func:`ferenda_ray.stages.fulltext.query` for ranked retrieval
    over large indexes; this surface reproduces the reference's
    response JSON, whose ES backend pages the same way).  Doc-level
    facet filters run INSIDE the distributed pass (``meta`` is small
    and ships in the task closure), so the cap counts post-filter
    hits — filtered-out rows never consume cap slots and
    ``totalResults`` is exact up to ``max_hits``."""
    filters = {_resolve_field(k): v for k, v in (filters or {}).items()}
    allowed = pa.array(sorted(
        u for u, m in meta.items()
        if all(_field_match(m.get(f), pat)
               for f, pat in filters.items())), pa.string())

    def score(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.is_in(b.column("doc_uri"), value_set=allowed))
        if q is None:
            return b
        keep = [bool(_hit_spans(t, q))
                for t in b.column("text").to_pylist()]
        return b.filter(pa.array(keep))

    if hasattr(index, "map_batches"):        # ray.data.Dataset
        hits = index.map_batches(score, batch_format="pyarrow") \
                    .limit(max_hits).take_all()
    else:
        hits = score(index).to_pylist()

    # group hits by parent doc (meta presence + facet filters already
    # applied in the distributed pass)
    docs: dict[str, dict] = {}
    for h in hits:
        m = meta[h["doc_uri"]]
        d = docs.setdefault(h["doc_uri"], {"doc": m, "self": None,
                                           "inner": []})
        if h["uri"] == h["doc_uri"]:
            d["self"] = h
        else:
            d["inner"].append(h)

    items = []
    for uri in sorted(docs, reverse=True):   # wsgiapp.py:448-451
        d = docs[uri]
        item = dict(d["doc"])
        if q is not None and d["self"] is not None:
            text = d["self"]["text"]
            item["matches"] = {
                "text": _matches_html(text, _hit_spans(text, q))}
        if q is not None and d["inner"] and not legacy:
            # document order, capped at 3 — the ES inner_hits
            # default size the golden was recorded with
            item["innerhits"] = [
                {"basefile": h["basefile"],
                 "repo": h["repo"] + "_child",
                 "text": _inner_segments(h["text"],
                                         _hit_spans(h["text"], q)),
                 "uri": h["uri"]}
                for h in d["inner"][:3]]
        if legacy:
            item = {(k.split("_", 1)[1] if "_" in k else k): v
                    for k, v in item.items()}
        items.append(item)

    current = path + ("?" + query_string if query_string else "")
    return {"current": current, "duration": None,
            "items": items[page * page_size:(page + 1) * page_size],
            "itemsPerPage": page_size, "startIndex": page * page_size,
            "totalResults": len(items)}


def _qname(uri: str) -> str:
    for ns, prefix in PREFIXES.items():
        if uri.startswith(ns):
            return prefix + ":" + uri[len(ns):]
    return uri


def api_stats(meta: dict, legacy: bool = False) -> dict:
    """The ``;stats`` endpoint (``wsgiapp.py:232-386``): per-facet
    count-distinct observations over the doc-level resources."""
    slices = []
    for field, kind in STATS_FACETS:
        counts: dict[str, int] = {}
        for m in meta.values():
            v = m.get(field)
            if v is None:
                continue
            if kind == "year":
                key = str(v)[:4]
            elif kind == "ref":
                key = v["iri"] if isinstance(v, dict) else str(v)
            else:
                key = (_qname(v).split(":", 1)[1] if legacy
                       else _qname(v))
            counts[key] = counts.get(key, 0) + 1
        dim = field.split("_", 1)[1] if legacy and "_" in field \
            else field
        valkey = {"year": "year", "ref": "ref", "term": "term"}[kind]
        slices.append({
            "dimension": dim,
            "observations": [{"count": counts[k], valkey: k}
                             for k in sorted(counts)]})
    return {"type": "DataSet", "slices": slices}


# ===========================================================================
# Advanced faceted API: the examplerepos conformance surface
# (reference test/examplerepos.py DocRepo1-3 facet configs,
# test/integrationAPI.py:195-330 AdvancedAPI, goldens
# test/files/api/advancedapi-*.json).  Index rows are built from the
# repos' parsed RDFa with each repo's OWN facet set (facet.py
# defaults: rdf:type->term, dcterms:issued->year,
# dcterms:publisher->ref resource, dc:subject->keyword value,
# dc:creator->value, schema:free/boolean->value; Text/Label carry no
# stats dimension).

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

#: label-resolution predicate chain (facet.py resourcelabel :254-268)
LABEL_PREDS = (
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://www.w3.org/2004/02/skos/core#prefLabel",
    "http://www.w3.org/2004/02/skos/core#altLabel",
    "http://purl.org/dc/terms/title",
    "http://purl.org/dc/terms/alternative",
    "http://xmlns.com/foaf/0.1/name",
    "http://purl.org/ontology/bibo/identifier",
)

#: (field, predicate-qname, kind) per repo — examplerepos.py:24-123.
#: kind drives indexing, item serialization and the stats dimension.
ADVANCED_FACETS = {
    "repo1": [("rdf_type", "rdf:type", "uri"),
              ("dcterms_title", "dcterms:title", "text"),
              ("dcterms_publisher", "dcterms:publisher", "resource"),
              ("dcterms_issued", "dcterms:issued", "date")],
    "repo2": [("rdf_type", "rdf:type", "uri"),
              ("dcterms_title", "dcterms:title", "text"),
              ("dcterms_identifier", "dcterms:identifier", "label"),
              ("dcterms_issued", "dcterms:issued", "date"),
              ("aprilfools", "dcterms:issued", "aprilfools"),
              ("dcterms_publisher", "dcterms:publisher", "resource"),
              ("dc_subject", "dc:subject", "keyword"),
              ("schema_free", "schema:free", "boolean")],
    "repo3": [("dc_publisher", "dc:publisher", "value"),
              ("dcterms_rightsHolder", "dcterms:rightsHolder",
               "resource_multi"),
              ("dcterms_title", "dcterms:title", "text"),
              ("dcterms_identifier", "dcterms:identifier", "label"),
              ("dc_creator", "dc:creator", "value")],
}

#: global stats dimensions (facets with a dimension_type), sorted
STATS_DIMENSIONS = (("aprilfools", "value"), ("dc_creator", "value"),
                    ("dc_subject", "value"),
                    ("dcterms_issued", "year"),
                    ("dcterms_publisher", "ref"),
                    ("rdf_type", "term"), ("schema_free", "value"))


def rdfa_triples(xhtml: str):
    """Minimal RDFa extraction for the testrepos fixtures: ``about``
    scoping plus head/meta/link/title/span property-content-rel-href,
    with prefix expansion from the document's xmlns declarations."""
    import io
    ns = {}
    events = ET.iterparse(io.StringIO(xhtml), events=("start-ns",))
    for _, (prefix, uri) in events:
        ns[prefix] = uri
    root = events.root

    def expand(q):
        if q and ":" in q:
            p, local = q.split(":", 1)
            if p in ns:
                return ns[p] + local
        return q

    out = []

    def visit(el, subj):
        if el.get("about") is not None:
            subj = el.get("about")
        tag = el.tag.rsplit("}", 1)[-1]
        if tag == "link" and el.get("rel"):
            out.append((subj, expand(el.get("rel")), "uri",
                        el.get("href"), None))
        elif tag in ("meta", "span") and el.get("property") \
                and el.get("content") is not None:
            out.append((subj, expand(el.get("property")), "literal",
                        el.get("content"), expand(el.get("datatype"))))
        elif tag == "title" and el.get("property"):
            out.append((subj, expand(el.get("property")), "literal",
                        el.text or "", None))
        for c in el:
            visit(c, subj)

    visit(root, None)
    return out, ns


def label_map(triples: list) -> dict:
    """uri -> preferred label over the resourcelabel chain."""
    by_subj: dict = {}
    for t in triples:
        by_subj.setdefault(t["subj"], {})[t["pred"]] = t["obj_value"]
    out = {}
    for uri, preds in by_subj.items():
        for p in LABEL_PREDS:
            if p in preds:
                out[uri] = preds[p]
                break
    return out


def build_advanced_rows(docs: list, labels: dict) -> list:
    """``[{repo, doc_uri, xhtml}]`` → faceted index rows (one dict
    per doc, fields per that repo's facet set — the relate_fulltext
    row shape)."""
    rows = []
    for d in docs:
        trips, ns = rdfa_triples(d["xhtml"])
        doc_uri = d["doc_uri"]

        def values(qname):
            pred = qname.split(":")
            full = ns.get(pred[0], pred[0] + ":") + pred[1]
            return [t for t in trips
                    if t[0] == doc_uri and t[1] == full]

        row = {"iri": doc_uri}
        for field, qname, kind in ADVANCED_FACETS[d["repo"]]:
            vals = values(qname)
            if not vals:
                continue
            if kind == "uri":
                row[field] = vals[0][3]
            elif kind in ("text", "label", "value", "date"):
                row[field] = vals[0][3]
            elif kind == "resource":
                u = vals[0][3]
                row[field] = {"iri": u, "label": labels.get(u, u)}
            elif kind == "resource_multi":
                row[field] = [{"iri": v[3],
                               "label": labels.get(v[3], v[3])}
                              for v in vals]
            elif kind == "keyword":
                row[field] = sorted(v[3] for v in vals)
            elif kind == "boolean":
                row[field] = vals[0][3] == "true"
            elif kind == "aprilfools":
                ds = vals[0][3]
                row[field] = ds[5:7] == "04" and ds[8:10] == "01"
        rows.append(row)
    return rows


def _adv_stats(rows: list) -> dict:
    slices = []
    for dim, kind in STATS_DIMENSIONS:
        counts: dict = {}
        for r in rows:
            if dim not in r:
                continue
            v = r[dim]
            if kind == "year":
                keys = [str(v)[:4]]
            elif kind == "ref":
                keys = [v["iri"]]
            elif kind == "term":
                keys = [_adv_qname(v)]
            elif isinstance(v, list):
                keys = v
            else:
                keys = [v]
            for k in keys:
                counts[k] = counts.get(k, 0) + 1
        valkey = {"year": "year", "ref": "ref",
                  "term": "term"}.get(kind, "value")
        slices.append({"dimension": dim,
                       "observations": [
                           {"count": counts[k], valkey: k}
                           for k in sorted(counts)]})
    return {"type": "DataSet", "slices": slices}


_ADV_NS = {"ex": "http://example.org/vocab/"}


def _adv_qname(uri: str) -> str:
    for p, n in _ADV_NS.items():
        if uri.startswith(n):
            return p + ":" + uri[len(n):]
    return uri


def advanced_query(rows: list, params: dict, path: str = "/myapi/",
                   query_string: str = "", page_size: int = 10) -> dict:
    """One advanced-API query → the golden JSON shape.  Parameter
    grammar (wsgiapp.parse_parameters): ``field=value`` equality
    (booleans coerced, list fields by membership, ``rdf_type`` by
    qname expansion, ``uri`` / ``iri`` by wildcard), exclusive
    ``min-F``/``max-F`` ranges, ``year-F`` selectors, ``_stats=on``
    for result-set statistics."""
    stats_on = params.get("_stats") == "on"
    hits = []
    for r in rows:
        ok = True
        for k, v in params.items():
            if k == "_stats":
                continue
            if k.startswith("min-"):
                f = k[4:]
                ok = f in r and r[f] > v
            elif k.startswith("max-"):
                f = k[4:]
                ok = f in r and r[f] < v
            elif k.startswith("year-"):
                f = k[5:]
                ok = f in r and str(r[f])[:4] == v
            elif k in ("uri", "iri"):
                ok = fnmatch.fnmatchcase(r["iri"], v)
            elif k == "rdf_type":
                full = _adv_qname_expand(v)
                ok = r.get(k) == full
            else:
                rv = r.get(k)
                if isinstance(rv, bool):
                    ok = rv == (v == "true")
                elif isinstance(rv, list):
                    ok = v in rv
                else:
                    ok = rv == v
            if not ok:
                break
        if ok:
            hits.append(r)
    items = sorted(hits, key=lambda r: r["iri"], reverse=True)
    res = {"current": path + ("?" + query_string
                              if query_string else ""),
           "duration": None,
           "items": items[:page_size],
           "itemsPerPage": page_size, "startIndex": 0,
           "totalResults": len(items)}
    if stats_on:
        res["statistics"] = _adv_stats(hits)
    return res


def _adv_qname_expand(q: str) -> str:
    if ":" in q:
        p, local = q.split(":", 1)
        if p in _ADV_NS:
            return _ADV_NS[p] + local
    return q


def advanced_stats(rows: list) -> dict:
    return _adv_stats(rows)
