"""Derived queries over the triples dataset — the *generate/toc/news/
stats* surface of the reference, restated as Dataset ops.

Every function takes a (canonical) triples Dataset and returns a
Dataset / small table.  Shuffle keys follow SURVEY.md §7.3.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ferenda_ray import ns
from ferenda_ray.functions.facets import DEFAULT_FACETS, Facet
from ferenda_ray.uri import DEFAULT_BASE, basefile_from_uri


# ---------------------------------------------------------------------------
# faceted_data — SPARQL SELECT pivot analogue (documentrepository.py:2235-2383)

def faceted_data(triples, facets: list | None = None):
    """Wide row per document subject: ``uri`` + one column per facet
    binding.  Two-phase: per-batch projection to sparse wide rows
    (combiner), then one ``groupby(uri)`` with vectorized ``Max``
    aggregation (strings: max of the single non-null value; exact
    duplicate removal falls out, ``:2269-2280``).  ``multiple_values``
    facets are excluded here — use :func:`facet_values` (the exploded
    form, ``facet.py:54-58``)."""
    from ray.data.aggregate import Max
    facets = [f for f in (facets or DEFAULT_FACETS) if not f.multiple_values]
    pred_to_binding = {f.rdfpred: f.binding for f in facets}
    bindings = [f.binding for f in facets]

    def project(b: pa.Table) -> pa.Table:
        # doc subjects only (no fragment URIs)
        keep = pc.and_(
            pc.is_in(b.column("pred"),
                     value_set=pa.array(list(pred_to_binding))),
            pc.invert(pc.match_substring(b.column("subj"), "#")))
        b = b.filter(keep)
        df = pl.from_arrow(
            b.select(["subj", "pred", "obj_value"]))
        df = df.with_columns(
            pl.col("pred").replace_strict(pred_to_binding, default=None)
            .alias("binding"))
        wide = df.pivot(on="binding", index="subj",
                        values="obj_value", aggregate_function="min")
        wide = wide.rename({"subj": "uri"})
        for col in bindings:
            if col not in wide.columns:
                wide = wide.with_columns(pl.lit(None, pl.String).alias(col))
        return wide.select(["uri"] + bindings).to_arrow()

    projected = triples.map_batches(project, batch_format="pyarrow",
                                    batch_size=65536)
    agg = projected.groupby("uri").aggregate(
        *[Max(c, alias_name=c) for c in bindings])
    return agg


def facet_values(triples, facet: Facet):
    """Exploded (uri, value) rows for a multi-valued facet."""
    def project(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("pred"), facet.rdfpred))
        return pa.table({"uri": b.column("subj"),
                         "value": b.column("obj_value").cast(pa.string())})
    return triples.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TOC — pagesets + per-page sorted selection (documentrepository.py:2855-2995)

def toc_pagesets(faceted, facet: Facet) -> pa.Table:
    """Distinct selector values (+ doc counts) for one facet — the page
    list (``:2855-2934``).  Small result, returned as a Table."""
    def sel(b: pa.Table) -> pa.Table:
        vals = [v if v is None else facet.selector(v)
                for v in b.column(facet.binding).to_pylist()]
        return pa.table({"value": pa.array(vals, pa.string())})
    counts = (faceted.map_batches(sel, batch_format="pyarrow")
              .groupby("value").count())
    t = pa.Table.from_pylist(counts.take_all())
    if t.num_rows == 0:
        return pa.table({"value": pa.array([], pa.string()),
                         "count()": pa.array([], pa.int64())})
    t = t.filter(pc.is_valid(t.column("value")))
    return t.sort_by([("value", "descending" if facet.selector_descending
                       else "ascending")])


def toc_select_for_pages(faceted, facet: Facet):
    """Bucket docs by selector value; within each page sort by the
    facet key (``:2936-2995``).  Returns Dataset of
    ``(value, uris: list<string>, titles: list<string>)``."""
    binding = facet.binding

    def add_keys(b: pa.Table) -> pa.Table:
        vals = b.column(binding).to_pylist()
        sel = [None if v is None else str(facet.selector(v)) for v in vals]
        key = [None if v is None else str(facet.key(v)) for v in vals]
        return (b.append_column("_sel", pa.array(sel, pa.string()))
                 .append_column("_key", pa.array(key, pa.string())))

    keyed = (faceted.map_batches(add_keys, batch_format="pyarrow")
             .filter(lambda r: r["_sel"] is not None))

    def page(group: pa.Table) -> pa.Table:
        g = group.sort_by([("_key", "descending" if facet.key_descending
                            else "ascending"), ("uri", "ascending")])
        return pa.table({
            "value": [g.column("_sel")[0].as_py()],
            "uris": [g.column("uri").to_pylist()],
            "titles": [g.column(binding).to_pylist()],
        })

    return keyed.groupby("_sel").map_groups(page, batch_format="pyarrow")


def toc_entries(faceted, facet: Facet):
    """Exploded TOC selection: one ``(value, sortkey, uri)`` row per
    document — the flat form of :func:`toc_select_for_pages` (same
    selector/key semantics, no list columns), joinable/oracle-friendly."""
    binding = facet.binding

    def add_keys(b: pa.Table) -> pa.Table:
        vals = b.column(binding).to_pylist()
        sel = [None if v is None else str(facet.selector(v)) for v in vals]
        key = [None if v is None else str(facet.key(v)) for v in vals]
        return pa.table({
            "value": pa.array(sel, pa.string()),
            "sortkey": pa.array(key, pa.string()),
            "uri": b.column("uri"),
        })

    return (faceted.map_batches(add_keys, batch_format="pyarrow")
            .filter(lambda r: r["value"] is not None))


# ---------------------------------------------------------------------------
# keyword hub — grouped semi-join (sources/general/keyword.py:107-173)

def keyword_hub(triples, pred: str | None = None):
    """Per keyword (``dcterms:subject`` object): how many documents
    carry it and the lexicographically first one — the keyword-hub
    construction (``SELECT ?uri ?subject`` + group per sanitized term)
    as one ``groupby(term)`` with vectorized aggregates."""
    from ray.data.aggregate import Count, Min
    target = pred or ns.DCTERMS_SUBJECT

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("pred"), target))
        return pa.table({"term": b.column("obj_value").cast(pa.string()),
                         "uri": b.column("subj")})

    return (triples.map_batches(proj, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Count(alias_name="n_docs"),
                       Min("uri", alias_name="first_uri")))


# ---------------------------------------------------------------------------
# news / feeds — grouped top-k newest-first (documentrepository.py:3235-3377)

def news_feeds(faceted, facet: Facet, date_binding: str = "dcterms_issued",
               page_size: int = 25):
    """Per facet-value feed: entries sorted newest-first, top
    ``page_size`` (archive paging analogue ``:3527-3662``).  Also emits
    the "All" feed (``:3344-3348``)."""
    binding = facet.binding

    def feed(group: pa.Table) -> pa.Table:
        g = group.sort_by([(date_binding, "descending"),
                           ("uri", "ascending")])
        head = g.slice(0, page_size)
        return pa.table({
            "feed": [str(group.column("_fv")[0].as_py())],
            "entries": [head.column("uri").to_pylist()],
            "n_total": [group.num_rows],
        })

    def add_fv(b: pa.Table) -> pa.Table:
        vals = [None if v is None else str(facet.selector(v))
                for v in b.column(binding).to_pylist()]
        return b.append_column("_fv", pa.array(vals, pa.string()))

    keyed = (faceted.map_batches(add_fv, batch_format="pyarrow")
             .filter(lambda r: r["_fv"] is not None
                     and r[date_binding] is not None))
    per_value = keyed.groupby("_fv").map_groups(feed, batch_format="pyarrow")

    all_keyed = (faceted
                 .map_batches(lambda b: b.append_column(
                     "_fv", pa.array(["all"] * b.num_rows, pa.string())),
                     batch_format="pyarrow")
                 .filter(lambda r: r[date_binding] is not None))
    all_feed = all_keyed.groupby("_fv").map_groups(feed,
                                                   batch_format="pyarrow")
    return per_value.union(all_feed)


# ---------------------------------------------------------------------------
# stats — faceted count-distinct (wsgiapp.py:232-386)

def stats(triples, facets: list | None = None):
    """Per (dimension, value): count of distinct document URIs.
    Two shuffles: dedup (dim, value, uri) triples, then count —
    the partial/final split of ``wsgiapp.stats``'s per-repo merge
    (``:289-296``)."""
    facets = [f for f in (facets or DEFAULT_FACETS)]
    pred_to_binding = {f.rdfpred: f.binding for f in facets}
    selectors = {f.binding: f.selector for f in facets}

    def project(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_in(b.column("pred"),
                     value_set=pa.array(list(pred_to_binding))),
            pc.invert(pc.match_substring(b.column("subj"), "#")))
        b = b.filter(keep)
        dims, vals, uris = [], [], []
        for subj, pred, v in zip(b.column("subj").to_pylist(),
                                 b.column("pred").to_pylist(),
                                 b.column("obj_value").to_pylist()):
            binding = pred_to_binding[pred]
            try:
                sv = str(selectors[binding](v))
            except Exception:
                continue
            dims.append(binding)
            vals.append(sv)
            uris.append(subj)
        t = pa.table({"dimension": pa.array(dims, pa.string()),
                      "value": pa.array(vals, pa.string()),
                      "uri": pa.array(uris, pa.string())})
        return pl.from_arrow(t).unique().to_arrow()  # in-batch dedup

    projected = triples.map_batches(project, batch_format="pyarrow")
    distinct = projected.groupby(["dimension", "value", "uri"]).count()
    counts = (distinct
              .map_batches(lambda b: b.select(["dimension", "value"]),
                           batch_format="pyarrow")
              .groupby(["dimension", "value"]).count())
    return counts


# ---------------------------------------------------------------------------
# dependency join — relate_dependencies (documentrepository.py:2018-2080)

def _doc_ref_key(batch: pa.Table, base: str) -> pa.Table:
    """doc URI -> its commit-less ref key {base}ref/{repo}/{path}."""
    keys = []
    for u in batch.column("subj").to_pylist():
        parts = basefile_from_uri(u, base)
        keys.append(f"{base}ref/{parts['repo']}/{parts['path']}"
                    if parts else None)
    return pa.table({"doc_uri": batch.column("subj"),
                     "ref_key": pa.array(keys, pa.string())})


def dependencies(triples, base: str = DEFAULT_BASE, num_partitions: int = 8):
    """Resolve ``dcterms:references`` object URIs to concrete document
    URIs: edge extraction → hash join on the commit-less ref key →
    ``(src_doc_uri, dst_doc_uri)`` rows.  The inverse-reference join of
    ``relate_dependencies`` (object-URI probe, ``:2029-2055``) as one
    partitioned hash join instead of per-doc file appends."""
    # docs side: every bibo:Document subject
    docs = (triples
            .filter(lambda r: r["pred"] == ns.RDF_TYPE
                    and r["obj_value"] == ns.BIBO_DOCUMENT)
            .map_batches(lambda b: _doc_ref_key(b, base),
                         batch_format="pyarrow")
            .filter(lambda r: r["ref_key"] is not None))
    # refs side: citation edges; strip #S fragment from the ref URI
    def refs_proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("pred"), ns.DCTERMS_REFERENCES))
        obj = pc.replace_substring_regex(
            b.column("obj_value").cast(pa.string()), "#S[0-9.]+$", "")
        src = pc.replace_substring_regex(b.column("subj"), "#S[0-9.]+$", "")
        return pa.table({"src_doc_uri": src, "obj_key": obj})

    refs = triples.map_batches(refs_proj, batch_format="pyarrow")
    # coalesce to dodge the empty-block join bug; modest sizes expected
    refs = refs.repartition(4)
    docs = docs.repartition(4)
    joined = refs.join(docs, join_type="inner",
                       num_partitions=num_partitions,
                       on=("obj_key",), right_on=("ref_key",))
    return joined.map_batches(
        lambda b: pl.from_arrow(
            b.select(["src_doc_uri", "doc_uri"])).rename(
            {"doc_uri": "dst_doc_uri"}).unique().to_arrow(),
        batch_format="pyarrow")


def dependents_of(triples, base: str = DEFAULT_BASE):
    """Per target doc: list of docs that reference it —
    ``groupby(dst).collect`` (the dependency-file content,
    ``add_dependency`` ``:2058-2080``)."""
    deps = dependencies(triples, base)

    def collect(group: pa.Table) -> pa.Table:
        srcs = sorted(set(group.column("src_doc_uri").to_pylist()))
        return pa.table({
            "dst_doc_uri": [group.column("dst_doc_uri")[0].as_py()],
            "src_doc_uris": [srcs],
            "n_dependents": [len(srcs)],
        })

    return deps.groupby("dst_doc_uri").map_groups(collect,
                                                  batch_format="pyarrow")


# ---------------------------------------------------------------------------
# annotations — inbound-reference groupby (documentrepository.py:2636-2712)

def annotations(triples, target_prefix: str | None = None):
    """Group all URI-object triples by their object — per-resource
    inbound annotation groups (the SPARQL CONSTRUCT gathering inbound
    references, ``construct_annotations``).  Returns Dataset
    ``(target_uri, inbound: list<struct(subj, pred)>)`` — a shuffle
    keyed by object URI (SURVEY.md §2.5)."""
    def proj(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("obj_type"), "uri")
        if target_prefix:
            keep = pc.and_(keep, pc.starts_with(
                b.column("obj_value").cast(pa.string()), target_prefix))
        b = b.filter(keep)
        return pa.table({"target_uri": b.column("obj_value").cast(pa.string()),
                         "subj": b.column("subj"),
                         "pred": b.column("pred")})

    def collect(group: pa.Table) -> pa.Table:
        pairs = sorted(zip(group.column("subj").to_pylist(),
                           group.column("pred").to_pylist()))
        return pa.table({
            "target_uri": [group.column("target_uri")[0].as_py()],
            "inbound_subjs": [[s for s, _ in pairs]],
            "inbound_preds": [[p for _, p in pairs]],
            "n_inbound": [len(pairs)],
        })

    return (triples.map_batches(proj, batch_format="pyarrow")
            .groupby("target_uri").map_groups(collect,
                                              batch_format="pyarrow"))
