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


def _apply_unique(vals: pl.Series, fn) -> pl.Series:
    """Apply a Python scalar ``fn`` per DISTINCT value then remap
    vectorized (polars ``replace_strict``): O(n_distinct) Python calls
    instead of O(n_rows).  Values where ``fn`` raises map to null
    (callers drop them) — the in-batch replacement for the former
    per-row loops / ``Dataset.filter(lambda)`` sites."""
    mapping = {}
    for v in vals.unique().drop_nulls().to_list():
        try:
            mapping[v] = str(fn(v))
        except Exception:
            mapping[v] = None
    return vals.replace_strict(mapping, default=None,
                               return_dtype=pl.String)


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


def faceted_data_bgp(triples, facets: list | None = None,
                     base_pattern=None):
    """:func:`faceted_data` expressed through the composable BGP
    operator — the reference's dynamically BUILT facet SELECT
    (``documentrepository.py:2293-2383``: one required pattern binds
    ``?uri``, one OPTIONAL pattern per facet) instead of the pivot
    shortcut.  A caller can hand any ``base_pattern`` (must bind
    ``?uri``) to scope the document set, e.g. a repo-specific rdf:type.

    Same output contract as :func:`faceted_data`: wide row per
    subject, fragment URIs (``#``) excluded, multiple facet values
    collapsed by ``Max`` (the OPTIONAL join emits one row per value;
    the aggregate restores one-row-per-uri semantics)."""
    from ray.data.aggregate import Max

    from ferenda_ray import ns
    from ferenda_ray.stages.bgp import Var, match

    facets = [f for f in (facets or DEFAULT_FACETS) if not f.multiple_values]
    u = Var("uri")
    base = base_pattern or (u, ns.RDF_TYPE, None)
    if "uri" not in {str(t) for t in base if isinstance(t, Var)}:
        raise ValueError("base_pattern must bind ?uri")
    bindings = [f.binding for f in facets]
    sols = match(triples, [base],
                 optional=[(u, f.rdfpred, Var(f.binding)) for f in facets],
                 filters=[(u, "not_contains", "#")],
                 select=["uri"] + bindings)
    return sols.groupby("uri").aggregate(
        *[Max(c, alias_name=c) for c in bindings])


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
        vals = _apply_unique(
            pl.from_arrow(b.column(facet.binding)).rename("v"),
            facet.selector)
        return pa.table({"value": vals.to_arrow().cast(pa.string())})
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
        vals = pl.from_arrow(b.column(binding)).rename("v")
        sel = _apply_unique(vals, facet.selector).to_arrow().cast(pa.string())
        key = _apply_unique(vals, facet.key).to_arrow().cast(pa.string())
        out = (b.append_column("_sel", sel).append_column("_key", key))
        return out.filter(pc.is_valid(out.column("_sel")))

    keyed = faceted.map_batches(add_keys, batch_format="pyarrow")

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
        vals = pl.from_arrow(b.column(binding)).rename("v")
        t = pa.table({
            "value": _apply_unique(vals, facet.selector)
            .to_arrow().cast(pa.string()),
            "sortkey": _apply_unique(vals, facet.key)
            .to_arrow().cast(pa.string()),
            "uri": b.column("uri"),
        })
        return t.filter(pc.is_valid(t.column("value")))

    return faceted.map_batches(add_keys, batch_format="pyarrow")


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
        from ferenda_ray.functions.scalars import sanitize_term
        b = b.filter(pc.equal(b.column("pred"), target))
        # keyword sanity gate (keyword.py:175-183) applied per distinct
        # value; rejects (None) drop out of the hub
        def san(v):
            s = sanitize_term(v)
            if s is None:
                raise ValueError(v)   # → null in _apply_unique
            return s

        terms = _apply_unique(
            pl.from_arrow(b.column("obj_value").cast(pa.string()))
            .rename("v"), san)
        t = pa.table({"term": terms.to_arrow().cast(pa.string()),
                      "uri": b.column("subj")})
        return t.filter(pc.is_valid(t.column("term")))

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
        fv = _apply_unique(pl.from_arrow(b.column(binding)).rename("v"),
                           facet.selector).to_arrow().cast(pa.string())
        out = b.append_column("_fv", fv)
        return out.filter(pc.and_(pc.is_valid(out.column("_fv")),
                                  pc.is_valid(out.column(date_binding))))

    keyed = faceted.map_batches(add_fv, batch_format="pyarrow")
    per_value = keyed.groupby("_fv").map_groups(feed, batch_format="pyarrow")

    def add_all(b: pa.Table) -> pa.Table:
        out = b.append_column(
            "_fv", pa.array(["all"] * b.num_rows, pa.string()))
        return out.filter(pc.is_valid(out.column(date_binding)))

    all_keyed = faceted.map_batches(add_all, batch_format="pyarrow")
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
        df = pl.from_arrow(b.select(["subj", "pred", "obj_value"]))
        df = df.with_columns(
            pl.col("pred").replace_strict(pred_to_binding, default=None,
                                          return_dtype=pl.String)
            .alias("dimension"),
            pl.col("obj_value").cast(pl.String))
        # selector applied per distinct value per dimension (memoized
        # remap — was a per-row Python loop)
        parts = []
        for binding, selfn in selectors.items():
            sub = df.filter(pl.col("dimension") == binding)
            if sub.height == 0:
                continue
            parts.append(pl.DataFrame({
                "dimension": sub["dimension"],
                "value": _apply_unique(sub["obj_value"], selfn),
                "uri": sub["subj"],
            }))
        if not parts:
            return pa.table({"dimension": pa.array([], pa.string()),
                             "value": pa.array([], pa.string()),
                             "uri": pa.array([], pa.string())})
        out = (pl.concat(parts).drop_nulls("value").unique())
        return out.to_arrow()  # in-batch dedup

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


def dependencies(triples, base: str = DEFAULT_BASE,
                 num_partitions: int | None = None):
    """Resolve ``dcterms:references`` object URIs to concrete document
    URIs: edge extraction → hash join on the commit-less ref key →
    ``(src_doc_uri, dst_doc_uri)`` rows.  The inverse-reference join of
    ``relate_dependencies`` (object-URI probe, ``:2029-2055``) as one
    partitioned hash join instead of per-doc file appends."""
    # docs side: every bibo:Document subject (vectorized in-batch
    # predicate filter — runs on ~1 row per doc, not per triple)
    def docs_proj(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b.column("pred"), ns.RDF_TYPE),
            pc.equal(b.column("obj_value").cast(pa.string()),
                     ns.BIBO_DOCUMENT))
        t = _doc_ref_key(b.filter(keep), base)
        return t.filter(pc.is_valid(t.column("ref_key")))

    docs = triples.map_batches(docs_proj, batch_format="pyarrow")
    # refs side: citation edges; strip #S fragment from the ref URI
    def refs_proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("pred"), ns.DCTERMS_REFERENCES))
        obj = pc.replace_substring_regex(
            b.column("obj_value").cast(pa.string()), "#S[0-9.]+$", "")
        src = pc.replace_substring_regex(b.column("subj"), "#S[0-9.]+$", "")
        return pa.table({"src_doc_uri": src, "obj_key": obj})

    refs = triples.map_batches(refs_proj, batch_format="pyarrow")
    from ferenda_ray.cluster import coalesce_partitions, join_partitions
    num_partitions = num_partitions or join_partitions()
    # coalesce to dodge the empty-block join bug; modest sizes expected
    co = coalesce_partitions()
    refs = refs.repartition(co)
    docs = docs.repartition(co)
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


# ---------------------------------------------------------------------------
# annotations.rq — the reference's per-document annotation CONSTRUCT
# (ferenda/res/sparql/annotations.rq; documentrepository.py:2636-2692),
# expressed through the composable BGP operator (stages/bgp.py)

#: Row ceiling for broadcasting the annotation join's small sides
#: (closure pairs + doc ref keys) — two ~60-byte URI columns at 2M
#: rows ≈ 240 MB, the same order as the package's other measured-size
#: broadcast caps (minhash signatures 256 MB, closure/union-find 2M).
ANNOTATIONS_BROADCAST_MAX_ROWS = 2_000_000


def _five_cols(b: pa.Table) -> pa.Table:
    """The 5-column CONSTRUCT projection of a triples batch."""
    return pa.table({"subj": b.column("subj").cast(pa.string()),
                     "pred": b.column("pred").cast(pa.string()),
                     "obj_type": b.column("obj_type").cast(pa.string()),
                     "obj_value": b.column("obj_value").cast(pa.string())})


def _doc_keys_batch(b: pa.Table, base: str) -> pa.Table:
    """(doc_uri, ref_key) for every ``bibo:Document`` subject row."""
    keep = pc.and_(pc.equal(b.column("pred"), ns.RDF_TYPE),
                   pc.equal(b.column("obj_value").cast(pa.string()),
                            ns.BIBO_DOCUMENT))
    t = _doc_ref_key(b.filter(keep), base)
    return t.filter(pc.is_valid(t.column("ref_key")))


def _ref_edges_batch(b: pa.Table) -> pa.Table:
    """(ref_src, ref_key, ref_frag) for every ``dcterms:references``
    row — the object URI split into its commit-less doc key and the
    optional ``#S..`` fragment."""
    b = b.filter(pc.equal(b.column("pred"), ns.DCTERMS_REFERENCES))
    obj = b.column("obj_value").cast(pa.string())
    key = pc.replace_substring_regex(obj, "#S[0-9.]+$", "")
    ext = pc.extract_regex(obj, r"(?P<frag>#S[0-9.]+)$")
    frag = pc.fill_null(pc.struct_field(ext, "frag"), "")
    return pa.table({"ref_src": b.column("subj").cast(pa.string()),
                     "ref_key": key, "ref_frag": frag})


def annotations_graph(triples, base: str = DEFAULT_BASE,
                      num_partitions: int | None = None,
                      broadcast_max_rows: int =
                      ANNOTATIONS_BROADCAST_MAX_ROWS):
    """The reference's ``annotations.rq`` for EVERY document at once.

    The SPARQL template (per document URI ``U``)::

        CONSTRUCT { ?part dcterms:isReferencedBy ?s . ?s ?p ?o . }
        WHERE { ?s ?p ?o .
                { ?s dcterms:isPartOf* <U> . }
                UNION
                { ?part dcterms:isPartOf* <U> .
                  ?s dcterms:references ?part . } }

    restated for the whole corpus in one distributed plan — one
    ``(anchor, subj, pred, obj_type, obj_value)`` row per annotation
    triple, ``anchor`` = the document it annotates (running the
    template per-URI on the driver would be the anti-pattern):

    1. anchors: ``?d rdf:type bibo:Document`` (one BGP scan);
    2. ``up = path_closure(isPartOf, anchors)`` — the ``isPartOf*``
       property path, O(section depth) hash joins;
    3. branch 1: triples whose subject ∈ ``up`` (hash join on subj);
    4. reference resolution: ``dcterms:references`` objects live in
       the commit-less ``{base}ref/{repo}/{path}[#S..]`` space (the
       citation grammar's output); resolve them to concrete document
       URIs by joining on the doc's ref key — the same inverse-ref
       join as :func:`dependencies` (``relate_dependencies``,
       documentrepository.py:2018-2080) but fragment-preserving;
    5. branch 2: resolved ``(s, part)`` joined into ``up`` emits
       ``part dcterms:isReferencedBy s`` plus every triple of ``s``;
    6. DISTINCT over the 5 output columns (a CONSTRUCT result is a
       graph).

    PLAN PICK from MEASURED small-side sizes (the ``minhash_lsh_pairs``
    idiom): the closure pair set and the doc ref-key table are doc- /
    section-proportional, orders of magnitude smaller than the triple
    corpus.  When both measure ≤ ``broadcast_max_rows`` (~240 MB), the
    five hash joins collapse into TWO broadcast-map passes over the
    triples (polars in-batch joins against ``ray.put`` side tables) +
    the final DISTINCT exchange — measured 30.5 s → ~8 s at sf0.01.
    Above the cap — the 100-TB shape — the all-join plan below runs
    unchanged: every join hashes on a URI column with
    ``cluster.default_num_partitions()`` partitions; the closure is
    bounded by section depth (~3).  Both plans are asserted
    row-identical in pytest (``tests/test_annotations_graph.py``).
    """
    from ferenda_ray.cluster import join_partitions
    from ferenda_ray.stages.bgp import Var, distinct, path_closure, scan
    np_ = num_partitions or join_partitions()
    half = max(2, np_ // 2)

    # triples is consumed by five scans; materialize the (already
    # canonical, compact) triple set once instead of re-running the
    # upstream pipeline per scan.  On the 100-TB path read it back
    # from the bucketed shards (read_materialized) instead.
    triples = triples.materialize()

    anchors = scan(triples, (Var("anchor"), ns.RDF_TYPE,
                             ns.BIBO_DOCUMENT))
    up = path_closure(triples, ns.DCTERMS_ISPARTOF, anchors=anchors,
                      num_partitions=np_).materialize()

    dockeys = triples.map_batches(
        lambda b: _doc_keys_batch(b, base),
        batch_format="pyarrow").materialize()
    if (up.count() <= broadcast_max_rows
            and dockeys.count() <= broadcast_max_rows):
        return _annotations_broadcast(triples, up, dockeys)

    def five(b: pa.Table, extra: dict) -> pa.Table:
        cols = {c: _five_cols(b).column(c)
                for c in ("subj", "pred", "obj_type", "obj_value")}
        cols.update(extra)
        return pa.table(cols)

    plain = triples.map_batches(lambda b: five(b, {}),
                                batch_format="pyarrow")
    # branch 1: all triples of every part (and of the doc itself)
    b1 = plain.repartition(half).join(
        up.repartition(half), join_type="inner", num_partitions=np_,
        on=("subj",), right_on=("node",))
    b1 = b1.map_batches(
        lambda b: b.select(["anchor", "subj", "pred", "obj_type",
                            "obj_value"]), batch_format="pyarrow")

    refs = triples.map_batches(_ref_edges_batch, batch_format="pyarrow")
    resolved = refs.repartition(half).join(
        dockeys.repartition(half), join_type="inner",
        num_partitions=np_, on=("ref_key",))

    def part_uri(b: pa.Table) -> pa.Table:
        part = pc.binary_join_element_wise(
            b.column("doc_uri").cast(pa.string()),
            b.column("ref_frag").cast(pa.string()), "")
        return pa.table({"ref_src": b.column("ref_src"), "part": part})

    resolved = resolved.map_batches(part_uri, batch_format="pyarrow")
    # (s, part) ∧ part isPartOf* anchor
    hit = resolved.repartition(half).join(
        up.repartition(half), join_type="inner", num_partitions=np_,
        on=("part",), right_on=("node",))
    # branch 2a: part dcterms:isReferencedBy s
    b2a = hit.map_batches(
        lambda b: pa.table({
            "anchor": b.column("anchor").cast(pa.string()),
            "subj": b.column("part").cast(pa.string()),
            "pred": pa.array([ns.DCTERMS + "isReferencedBy"]
                             * b.num_rows, pa.string()),
            "obj_type": pa.array(["uri"] * b.num_rows, pa.string()),
            "obj_value": b.column("ref_src").cast(pa.string())}),
        batch_format="pyarrow")
    # branch 2b: every triple of s
    src_anchor = distinct(hit.map_batches(
        lambda b: pa.table({"ref_src": b.column("ref_src"),
                            "anchor": b.column("anchor")}),
        batch_format="pyarrow"), ["ref_src", "anchor"])
    b2b = plain.repartition(half).join(
        src_anchor.repartition(half), join_type="inner",
        num_partitions=np_, on=("subj",), right_on=("ref_src",))
    b2b = b2b.map_batches(
        lambda b: b.select(["anchor", "subj", "pred", "obj_type",
                            "obj_value"]), batch_format="pyarrow")

    out = b1.union(b2a).union(b2b)
    return distinct(out, ["anchor", "subj", "pred", "obj_type",
                          "obj_value"])


def _annotations_broadcast(triples, up, dockeys):
    """Small-side annotation plan (both sides measured ≤ cap by the
    caller): the closure pairs and doc ref keys ship once via
    ``ray.put`` as polars frames; each pass is ONE ``map_batches``
    over the triples with vectorized in-batch (Rust) joins — no
    ``Dataset.join`` exchanges, only the final DISTINCT shuffles.

    Pass A resolves ``dcterms:references`` edges to (anchor, part,
    ref_src) hits — citation-proportional, itself a slice of the
    output, so collecting its distinct (ref_src, anchor) pairs for
    the second broadcast side stays within the same size regime.
    Pass B emits branch 1 (triples of every closure node) and branch
    2b (every triple of a resolving source) in one scan."""
    import ray

    from ferenda_ray.stages.bgp import distinct

    def _collect_df(ds, cols) -> "pl.DataFrame":
        tbls = [t.select(cols) for t in ray.get(ds.to_arrow_refs())
                if t.num_rows]
        if not tbls:
            return pl.DataFrame(
                {c: pl.Series(c, [], dtype=pl.String) for c in cols})
        return pl.from_arrow(pa.concat_tables(tbls)).with_columns(
            [pl.col(c).cast(pl.String) for c in cols])

    from ferenda_ray.stages.broadcast import (resolve as _resolve_state,
                                              stateful_map)

    up_df = _collect_df(up, ["node", "anchor"])
    dk_df = _collect_df(dockeys, ["doc_uri", "ref_key"])

    class _ResolveRefs:
        # side tables deserialize ONCE per actor/task in __init__ —
        # a ray.get inside __call__ would rebuild the polars frames
        # on every batch
        def __init__(self, ref):
            self.dk, self.up = _resolve_state(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = pl.from_arrow(_ref_edges_batch(b))
            j = (df.join(self.dk, on="ref_key")
                 .with_columns((pl.col("doc_uri") + pl.col("ref_frag"))
                               .alias("part"))
                 .join(self.up, left_on="part", right_on="node"))
            return j.select(["anchor", "part", "ref_src"]).to_arrow()

    hits = stateful_map(triples, _ResolveRefs, (dk_df, up_df),
                        batch_size=None).materialize()

    def to_b2a(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "anchor": b.column("anchor").cast(pa.string()),
            "subj": b.column("part").cast(pa.string()),
            "pred": pa.array([ns.DCTERMS + "isReferencedBy"] * n,
                             pa.string()),
            "obj_type": pa.array(["uri"] * n, pa.string()),
            "obj_value": b.column("ref_src").cast(pa.string())})

    b2a = hits.map_batches(to_b2a, batch_format="pyarrow")
    src_df = (_collect_df(hits, ["ref_src", "anchor"]).unique()
              .rename({"ref_src": "subj"}))

    class _EmitBranches:
        def __init__(self, ref):
            self.up, self.src = _resolve_state(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = pl.from_arrow(_five_cols(b))
            one = df.join(self.up, left_on="subj",
                          right_on="node")          # branch 1
            two = df.join(self.src, on="subj")      # branch 2b
            cols = ["anchor", "subj", "pred", "obj_type", "obj_value"]
            return pl.concat([one.select(cols), two.select(cols)]) \
                .to_arrow()

    out = stateful_map(triples, _EmitBranches, (up_df, src_df),
                       batch_size=None).union(b2a)
    return distinct(out, ["anchor", "subj", "pred", "obj_type",
                          "obj_value"])


def skeleton_entries(triples, num_partitions: int | None = None):
    """Skeleton repo semantics (``ferenda/sources/general/
    skeleton.py:16-43``): find resources REFERRED TO but not PRESENT
    in the graph (URI objects that never appear as subjects) and emit
    a skeleton entry per dangling resource — ``(uri, identifier)``
    with identifier = the URI leaf (``util.uri_leaf``).

    Distributed shape: distinct URI objects LEFT-OUTER joined against
    distinct subjects, keep the null side (the
    ``customers_without_orders`` anti-join pattern — no driver-side
    keysets; each side is pre-distinct'ed so only unique URIs
    shuffle)."""
    import pyarrow.compute as pc

    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)
    np_ = num_partitions or join_partitions()

    refs = (triples.map_batches(
        lambda b: b.filter(pc.equal(b.column("obj_type"), "uri"))
        .select(["obj_value"]),
        batch_format="pyarrow")
        .groupby("obj_value").count()
        .map_batches(lambda b: b.select(["obj_value"]),
                     batch_format="pyarrow"))
    subjs = (triples.map_batches(
        lambda b: b.select(["subj"]), batch_format="pyarrow")
        .groupby("subj").count()
        .map_batches(
            lambda b: b.select(["subj"]).append_column(
                "__hit", pa.array([1] * b.num_rows, pa.int8())),
            batch_format="pyarrow"))
    if not ray_join_handles_empty_blocks():
        # Ray 2.49 hash join breaks on empty blocks in either input
        # (same gated workaround as canonicalize.label_propagation)
        co = coalesce_partitions()
        refs = refs.repartition(co)
        subjs = subjs.repartition(co)
    j = refs.join(subjs, join_type="left_outer",
                  num_partitions=np_,
                  on=("obj_value",), right_on=("subj",))

    def keep_dangling(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_null(b.column("__hit")))
        uris = b.column("obj_value").to_pylist()
        leafs = [u.rstrip("/").rsplit("#", 1)[-1]
                 .rsplit("/", 1)[-1] for u in uris]
        return pa.table({
            "uri": pa.array(uris, pa.large_string()),
            "identifier": pa.array(leafs, pa.string())})

    return j.map_batches(keep_dangling, batch_format="pyarrow")
