"""The flagship four-stage KG-construction pipeline.

``read_parquet(sources) → extract (stateless map_batches) → link
(task closure for small dictionaries, actor pool for large) →
canonicalize (sameAs rewrite + exact dedup, fused into the bucket
shuffle) → materialize (sorted bucketed shards + manifests)`` — the
Ray-native
restatement of ferenda's download→parse→relate→generate lifecycle
(SURVEY.md §3.4).

Skew handling: mega-repos are pre-split by row-count ``repartition``
before extraction so one repo cannot dominate a block (the analogue of
the reference's longest-job-first ordering,
``ferenda/documentstore.py:542-562``; SURVEY.md §7.3).
"""

from __future__ import annotations

import pyarrow as pa

from ferenda_ray import ns
from ferenda_ray.schema import TRIPLES
from ferenda_ray.stages.extract import extract
from ferenda_ray.stages.link import link
from ferenda_ray.stages.canonicalize import (
    _Rewriter, dedup_exact, mapping_from_sameas, prededup_batch, rewrite)
from ferenda_ray.stages.materialize import materialize
from ferenda_ray.uri import DEFAULT_BASE
from ferenda_ray.corpus import GRAPH


def vocab_as_triples(vocab: pa.Table, graph: str = GRAPH) -> pa.Table:
    """Side vocabulary triples (6-col) → full 9-col triple rows."""
    n = vocab.num_rows
    return pa.table({
        "subj": vocab.column("subj"),
        "pred": vocab.column("pred"),
        "obj_type": vocab.column("obj_type"),
        "obj_value": vocab.column("obj_value").cast(pa.large_string()),
        "obj_lang": vocab.column("obj_lang")
        if "obj_lang" in vocab.column_names else pa.nulls(n, pa.string()),
        "obj_datatype": vocab.column("obj_datatype")
        if "obj_datatype" in vocab.column_names else pa.nulls(n, pa.string()),
        "graph": pa.array([graph] * n, pa.string()),
        "src_repo": pa.nulls(n, pa.string()),
        "src_path": pa.nulls(n, pa.string()),
    }, schema=TRIPLES)


def build_kg(sources, aliases=None, sameas: pa.Table | None = None,
             vocab: pa.Table | None = None, base: str = DEFAULT_BASE,
             graph: str = GRAPH, link_concurrency=None,
             repartition_blocks: int | None = None,
             dedup: bool = True):
    """sources Dataset → canonical triples Dataset (lazy; nothing runs
    until consumed).  ``aliases`` / ``sameas`` / ``vocab`` are small
    side tables (broadcast, never shuffled).

    ``dedup=False`` applies only the per-batch combiner and leaves the
    global exact-dedup to ``materialize(dedup=True)``, fusing it into
    the bucket shuffle (one exchange instead of two) — the path
    ``run_kg`` takes."""
    import ray.data as rd
    if repartition_blocks:
        sources = sources.repartition(repartition_blocks)
    triples = extract(sources, base=base, graph=graph)
    if aliases is not None:
        triples = link(triples, aliases, base=base,
                       concurrency=link_concurrency)
    else:
        # no dictionary: mention rows cannot resolve; drop them
        import pyarrow.compute as pc
        triples = triples.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b.column("obj_type"),
                                                  "mention"))),
            batch_format="pyarrow")
    mapping = mapping_from_sameas(sameas) if sameas is not None else {}
    triples = rewrite(triples, mapping)
    if not dedup:
        # no explicit batch_size: see rewrite() — a large batch_size
        # would collapse the fused map chain to a handful of tasks
        triples = triples.map_batches(prededup_batch,
                                      batch_format="pyarrow")
    # union the (tiny, mention-free) vocab AFTER the map chain: a
    # mid-chain Union is a fusion barrier, splitting
    # extract→link→rewrite→prededup into separate physical operators —
    # on a small cluster the streaming executor's per-operator
    # resource reservation then starves the heavy extract stage
    # (measured: the 72 CPU-s extract ran at ~1× effective parallelism
    # on an 8-CPU cluster).  Rewrite/dedup semantics are preserved by
    # applying the rewriter to the vocab table driver-side (tiny) —
    # bucket-local dedup in materialize covers the rest.
    if vocab is not None and vocab.num_rows:
        vt = vocab_as_triples(vocab, graph)
        if mapping:
            vt = _Rewriter(mapping)(vt)
        triples = triples.union(rd.from_arrow(vt))
    if dedup:
        return dedup_exact(triples)
    return triples


def run_kg(sources_path, out_dir: str, aliases=None, sameas=None,
           vocab=None, base: str = DEFAULT_BASE, num_buckets: int = 32,
           resume: bool = True, fmt: str = "parquet",
           link_concurrency=None, graph: str = GRAPH) -> pa.Table:
    """End-to-end: read corpus parquet → … → materialized shards.
    Returns the manifest table.  ``sources_path`` is a parquet
    path/list, or an already-constructed corpus ``Dataset`` (e.g.
    from :func:`ferenda_ray.sources.ingest.read_code_corpus` for
    JSONL/CSV corpora).

    The exchange runs compact (static pred vocabulary = engine
    predicates + any predicates in the ``vocab`` side table; constant
    graph dropped in flight) — ~30% fewer shuffled bytes."""
    import ray.data as rd
    if isinstance(sources_path, (str, list, tuple)):
        sources = rd.read_parquet(sources_path)
    else:
        sources = sources_path
    canon = build_kg(sources, aliases=aliases, sameas=sameas, vocab=vocab,
                     base=base, graph=graph,
                     link_concurrency=link_concurrency,
                     dedup=False)
    pred_vocab = list(ns.ENGINE_PREDICATES)
    if vocab is not None and vocab.num_rows:
        pred_vocab += vocab.column("pred").to_pylist()
    return materialize(canon, out_dir, num_buckets=num_buckets,
                       resume=resume, fmt=fmt, dedup=True,
                       pred_vocab=pred_vocab, graph_const=graph)


def predicate_profile(triples):
    """Per-predicate KG quality profile (property profiling): triple
    count, distinct subjects, distinct object values, and the
    ``functional`` flag (every subject has exactly one value ⇔
    n_triples == n_subjects) — the schema-stats pass a KG pipeline
    runs after construction to catch extraction drift.

    Exact distincts via in-batch pre-distinct + one count groupby per
    leg (``bgp.distinct``); predicates are few, so the three tiny
    per-pred tables compose on the driver.  Returns a pyarrow Table
    ``(pred, n_triples, n_subjects, n_objects, functional)``."""
    import polars as pl
    import ray
    from ray.data.aggregate import Count

    from ferenda_ray.stages.bgp import distinct

    def _counts(ds, cols, alias):
        proj = ds.map_batches(lambda b, c=cols: b.select(c),
                              batch_format="pyarrow")
        if len(cols) > 1:
            proj = distinct(proj, cols)
        agg = proj.groupby("pred").aggregate(Count(alias_name=alias))
        tbls = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
        if not tbls:
            return pl.DataFrame({"pred": pl.Series([], dtype=pl.String),
                                 alias: pl.Series([], dtype=pl.Int64)})
        return (pl.from_arrow(pa.concat_tables(tbls))
                .with_columns(pl.col("pred").cast(pl.String),
                              pl.col(alias).cast(pl.Int64)))

    triples = triples.materialize()
    nt = _counts(triples, ["pred"], "n_triples")
    nsub = _counts(triples, ["pred", "subj"], "n_subjects")
    nobj = _counts(triples, ["pred", "obj_value"], "n_objects")
    out = (nt.join(nsub, on="pred").join(nobj, on="pred")
           .with_columns((pl.col("n_triples") == pl.col("n_subjects"))
                         .alias("functional"))
           .sort("pred"))
    t = out.to_arrow()
    return t.cast(pa.schema([
        ("pred", pa.string()), ("n_triples", pa.int64()),
        ("n_subjects", pa.int64()), ("n_objects", pa.int64()),
        ("functional", pa.bool_())]))


def required_predicate_violations(
        triples,
        required: tuple = ("http://purl.org/dc/terms/title",),
        type_pred: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"):
    """Soft-validation of required predicates per document (the
    reference warns when a parsed doc's meta lacks them —
    ``ferenda/documentrepository.py:745-746``,
    ``decorators.py:229-236``): for every subject that has an
    ``rdf:type`` triple, emit one ``(subj, missing_pred)`` row per
    required predicate it lacks.

    One pass + ONE groupby: per batch, (subj, pred∈required∪type)
    pairs reduce to per-subject boolean flags; a Max-groupby merges
    them; the final map explodes the missing set.  No joins, no
    per-subject tasks."""
    from ray.data.aggregate import Max

    preds = list(required)
    flags = [f"__has_{i}" for i in range(len(preds))]

    def to_flags(b: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(b.select(["subj", "pred"]))
              .filter(pl.col("pred").is_in(list(preds) + [type_pred]))
              .unique())
        if df.height == 0:
            return pa.table(
                {"subj": pa.array([], pa.string()),
                 "__is_doc": pa.array([], pa.int64()),
                 **{f: pa.array([], pa.int64()) for f in flags}})
        out = df.group_by("subj").agg(
            (pl.col("pred") == type_pred).any().cast(pl.Int64)
            .alias("__is_doc"),
            *[(pl.col("pred") == p).any().cast(pl.Int64).alias(f)
              for p, f in zip(preds, flags)])
        t = out.to_arrow()
        return t.cast(pa.schema(
            [("subj", pa.string()), ("__is_doc", pa.int64())]
            + [(f, pa.int64()) for f in flags]))

    agg = (triples.map_batches(to_flags, batch_format="pyarrow")
           .groupby("subj")
           .aggregate(Max("__is_doc", alias_name="__doc"),
                      *[Max(f, alias_name=f) for f in flags]))

    def explode_missing(b: pa.Table) -> pa.Table:
        import numpy as np
        doc = b.column("__doc").to_numpy().astype(bool)
        subs = b.column("subj").to_pylist()
        out_s, out_p = [], []
        for p, f in zip(preds, flags):
            has = b.column(f).to_numpy().astype(bool)
            for i in np.flatnonzero(doc & ~has):
                out_s.append(subs[i])
                out_p.append(p)
        return pa.table({
            "subj": pa.array(out_s, pa.string()),
            "missing_pred": pa.array(out_p, pa.string())})

    return agg.map_batches(explode_missing, batch_format="pyarrow")


def type_predicate_matrix(
        triples,
        type_pred: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"):
    """Schema discovery: which predicates appear on which rdf:types —
    ``(type, pred, n_subjects)`` with n_subjects = distinct subjects
    of that type carrying that predicate (the class/property usage
    matrix KG pipelines derive to detect modelling drift).

    Distributed shape: the (subj → type) leg is corpus-row-sized, so
    it HASH JOINS (never broadcasts) the distinct (subj, pred) pairs
    on the single subj key; one (type, pred) count groupby follows.
    Both sides pre-distinct in-batch before the exchange."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)
    from ferenda_ray.stages.bgp import distinct

    def types_leg(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("pred"), type_pred)
        t = b.filter(m)
        return pa.table({
            "subj": t.column("subj").cast(pa.string()),
            "type": t.column("obj_value").cast(pa.string())})

    def pairs_leg(b: pa.Table) -> pa.Table:
        return pa.table({
            "subj": b.column("subj").cast(pa.string()),
            "pred": b.column("pred").cast(pa.string())})

    types = distinct(triples.map_batches(types_leg,
                                         batch_format="pyarrow"),
                     ["subj", "type"])
    pairs = distinct(triples.map_batches(pairs_leg,
                                         batch_format="pyarrow"),
                     ["subj", "pred"])
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        types, pairs = types.repartition(co), pairs.repartition(co)
        # an ALL-empty join side trips Ray 2.49's key-field lookup
        # even after the repartition workaround (a typeless KG must
        # return an empty matrix, not crash)
        if types.count() == 0:
            import ray.data as rd
            return rd.from_arrow(pa.table({
                "type": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "n_subjects": pa.array([], pa.int64())}))
    j = pairs.join(types, join_type="inner", on=("subj",),
                   num_partitions=np_)
    return (j.groupby(["type", "pred"])
            .aggregate(Count(alias_name="n_subjects")))


def entity_mention_stats(
        triples,
        mention_pred: str = "http://purl.org/dc/terms/subject",
        label_pred: str = "http://www.w3.org/2000/01/rdf-schema#label"):
    """Entity popularity after linking + canonicalization: per
    canonical entity — total mention triples, distinct mentioning
    docs, and the entity's rdfs:label.  The linking-quality report a
    KG pipeline reads to spot over/under-linked entities.

    Two grouped aggregates over the mention slice (count + distinct
    subj count via in-batch pre-distinct) and a tiny label-slice
    collect; entities ≪ corpus, so the compose is driver-side."""
    import polars as pl
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from ferenda_ray.stages.bgp import distinct

    ment = triples.map_batches(
        lambda b: b.filter(pc.equal(b.column("pred"), mention_pred))
        .select(["subj", "obj_value"]),
        batch_format="pyarrow")

    def _collect(ds) -> list:
        return [r for t in ray.get(ds.to_arrow_refs())
                for r in t.to_pylist()]

    n_ment = {r["obj_value"]: r["n"] for r in _collect(
        ment.groupby("obj_value").aggregate(Count(alias_name="n")))}
    n_docs = {r["obj_value"]: r["n"] for r in _collect(
        distinct(ment, ["subj", "obj_value"])
        .groupby("obj_value").aggregate(Count(alias_name="n")))}
    labels = {r["subj"]: r["obj_value"] for r in _collect(
        triples.map_batches(
            lambda b: b.filter(pc.equal(b.column("pred"), label_pred))
            .select(["subj", "obj_value"]),
            batch_format="pyarrow"))}
    ents = sorted(n_ment)
    return pa.table({
        "entity": pa.array(ents, pa.string()),
        "label": pa.array([labels.get(e) for e in ents], pa.string()),
        "n_mentions": pa.array([n_ment[e] for e in ents], pa.int64()),
        "n_docs": pa.array([n_docs[e] for e in ents], pa.int64())})
