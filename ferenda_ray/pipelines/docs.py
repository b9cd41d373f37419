"""KG + text pipelines over the driver's ``documents`` table.

Maps the KG constructor onto the neutral ``documents(doc_id, text,
lang, source, n_chars)`` table so every stage has a DuckDB-checkable
oracle: triple extraction (doc-level metadata + sha256 lineage
invariant), alias mention detection (the linker grammar on a fixed
dictionary), faceted pivot and count-distinct stats — plus
driver-comparable wrappers for the dedup / text-analysis operators.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ferenda_ray import ns
from ferenda_ray.uri import DEFAULT_BASE

# the fixed alias dictionary for mention detection over the documents
# corpus (data-engineering vocabulary present in the synthetic text)
DOC_ALIASES = ["batch", "shuffle", "spark", "stream", "vector", "window"]

DOC_GRAPH = DEFAULT_BASE + "dataset/documents"


def doc_uri_for(source: str, doc_id: int, base: str = DEFAULT_BASE) -> str:
    return f"{base}res/{source}/{doc_id}"


def _read_docs(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _doc_triples_ds(docs, base: str = DEFAULT_BASE,
                    with_doc_key: bool = False):
    """Doc-level triple extraction over ANY documents Dataset (the
    shared kernel behind :func:`doc_triples` and
    :func:`kg_incremental`).  ``with_doc_key=True`` appends the doc's
    id as a ``doc_key`` column on every triple — the partition/upsert
    key that lets an incremental rebuild replace a changed doc's WHOLE
    triple set in one delta-wins upsert."""
    fields = [("subj", pa.string()), ("pred", pa.string()),
              ("obj_type", pa.string()), ("obj_value", pa.string())]
    if with_doc_key:
        fields.append(("doc_key", pa.int64()))
    schema = pa.schema(fields)

    def emit(b: pa.Table) -> pa.Table:
        # URI + constant columns are vectorized string concat; only the
        # sha256 lineage digest needs the Python loop (no vectorized
        # sha256 kernel in arrow/polars)
        import polars as pl
        df = pl.from_arrow(
            b.select(["doc_id", "text", "lang", "source", "n_chars"]))
        du = (pl.lit(base + "res/") + pl.col("source") + pl.lit("/")
              + pl.col("doc_id").cast(pl.String)).alias("subj")
        sha = pl.Series("sha", [hashlib.sha256(t.encode("utf-8")).hexdigest()
                                for t in df["text"]])
        key_cols = ([pl.col("doc_id").alias("doc_key")]
                    if with_doc_key else [])

        def block(p, t, ov):
            return df.select(du, pl.lit(p).alias("pred"),
                             pl.lit(t).alias("obj_type"),
                             ov.alias("obj_value"), *key_cols)

        out = pl.concat([
            block(ns.RDF_TYPE, "uri", pl.lit(ns.BIBO_DOCUMENT)),
            block(ns.DCTERMS_IDENTIFIER, "literal",
                  pl.col("doc_id").cast(pl.String)),
            block(ns.DCTERMS_LANGUAGE, "literal", pl.col("lang")),
            block(ns.DCTERMS_EXTENT, "literal",
                  pl.col("n_chars").cast(pl.String)),
            block(ns.FR_CONTENT_SHA256, "literal", sha),
        ])
        return out.to_arrow().cast(schema)

    return docs.map_batches(emit, batch_format="pyarrow",
                            batch_size=8192)


def doc_triples(sf_dir: str, base: str = DEFAULT_BASE):
    """Document-level triples: type, identifier, language, extent,
    content sha256 (the per-row lineage invariant).  5 triples per doc,
    flat-map inside one ``map_batches``."""
    return _doc_triples_ds(_read_docs(sf_dir), base)


def doc_mentions(sf_dir: str, aliases: list | None = None):
    """Alias mention counts per document — the linker's exact-scan
    grammar (longest-first alternation) on a fixed dictionary; one
    ``(doc_id, alias, n)`` row per (doc, alias) with n > 0.  Counts
    are whole-word regex matches, vectorized via polars."""
    import polars as pl
    aliases = aliases or DOC_ALIASES

    def scan(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["doc_id", "text"]))
        outs = []
        for alias in aliases:
            cnt = df.select(
                pl.col("doc_id"),
                pl.lit(alias).alias("alias"),
                pl.col("text").str.count_matches(rf"\b{alias}\b")
                .cast(pl.Int64).alias("n"))
            outs.append(cnt.filter(pl.col("n") > 0))
        return pl.concat(outs).to_arrow()

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", batch_size=8192)


def doc_facets(sf_dir: str, base: str = DEFAULT_BASE):
    """Faceted pivot of the doc triples: wide row per doc —
    (uri, dcterms_identifier, dcterms_language, dcterms_extent).
    Runs THROUGH the composable BGP operator (``faceted_data_bgp``:
    base pattern binds ?uri by rdf:type, one OPTIONAL per facet) so
    the driver hash-checks the reference's dynamically built facet
    SELECT shape, not just the pivot shortcut."""
    from ferenda_ray.functions.facets import Facet
    from ferenda_ray.pipelines.derived import faceted_data_bgp
    triples = doc_triples(sf_dir, base)

    def widen(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "subj": b.column("subj"), "pred": b.column("pred"),
            "obj_type": b.column("obj_type"),
            "obj_value": b.column("obj_value").cast(pa.large_string()),
            "obj_lang": pa.nulls(n, pa.string()),
            "obj_datatype": pa.nulls(n, pa.string()),
            "graph": pa.array([DOC_GRAPH] * n, pa.string()),
            "src_repo": pa.nulls(n, pa.string()),
            "src_path": pa.nulls(n, pa.string()),
        })

    facets = [
        Facet(ns.DCTERMS_IDENTIFIER, "dcterms_identifier"),
        Facet(ns.DCTERMS_LANGUAGE, "dcterms_language"),
        Facet(ns.DCTERMS_EXTENT, "dcterms_extent"),
    ]
    return faceted_data_bgp(
        triples.map_batches(widen, batch_format="pyarrow"), facets)


def doc_bgp_select(sf_dir: str, base: str = DEFAULT_BASE):
    """A USER-SUPPLIED pattern list through the composable BGP
    operator (the arbitrary-SELECT surface of ``stages/bgp.py``): a
    3-pattern star join over the doc triples — typed documents with
    their language and identifier bound — plus an in-batch FILTER
    ``?lang = "en"``.  Oracle-checked: equivalent to a SQL scan of
    ``documents`` restricted to lang='en'."""
    from ferenda_ray import ns
    from ferenda_ray.stages.bgp import Var, match
    u = Var("uri")
    triples = doc_triples(sf_dir, base).map_batches(
        _widen9, batch_format="pyarrow")
    return match(triples,
                 [(u, ns.RDF_TYPE, ns.BIBO_DOCUMENT),
                  (u, ns.DCTERMS_LANGUAGE, Var("lang")),
                  (u, ns.DCTERMS_IDENTIFIER, Var("ident"))],
                 filters=[(Var("lang"), "==", "en")],
                 select=["uri", "ident"])


def _widen9(b: pa.Table, graph: str = DOC_GRAPH) -> pa.Table:
    """4-col doc triples → full 9-col TRIPLES rows."""
    from ferenda_ray.schema import TRIPLES
    n = b.num_rows
    return pa.table({
        "subj": b.column("subj"), "pred": b.column("pred"),
        "obj_type": b.column("obj_type"),
        "obj_value": b.column("obj_value").cast(pa.large_string()),
        "obj_lang": pa.nulls(n, pa.string()),
        "obj_datatype": pa.nulls(n, pa.string()),
        "graph": pa.array([graph] * n, pa.string()),
        "src_repo": pa.nulls(n, pa.string()),
        "src_path": pa.nulls(n, pa.string()),
    }, schema=TRIPLES)


def _mention_triples(sf_dir: str, base: str = DEFAULT_BASE):
    """Mention rows as dcterms:subject URI-object triples (doc -> entity)."""
    from ferenda_ray.uri import entity_uri

    def as_triples(b: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(b.select(["doc_id", "alias"]))
        # entity_uri memoized over the tiny distinct alias set
        amap = {a: entity_uri(a, base)
                for a in df["alias"].unique().to_list()}
        out = df.select(
            (pl.lit(base + "res/doc/") + pl.col("doc_id").cast(pl.String))
            .alias("subj"),
            pl.lit(ns.DCTERMS_SUBJECT).alias("pred"),
            pl.lit("uri").alias("obj_type"),
            pl.col("alias").replace_strict(amap, return_dtype=pl.String)
            .alias("obj_value"))
        return _widen9(out.to_arrow().cast(pa.schema(
            [("subj", pa.string()), ("pred", pa.string()),
             ("obj_type", pa.string()), ("obj_value", pa.string())])))

    return doc_mentions(sf_dir).map_batches(as_triples,
                                            batch_format="pyarrow")


def doc_toc_pages(sf_dir: str, base: str = DEFAULT_BASE):
    """TOC pagesets over the doc triples (``toc_pagesets`` path,
    documentrepository.py:2855-2934): one page per first character of
    the identifier sort key, with doc counts."""
    from ferenda_ray.functions.facets import Facet
    from ferenda_ray.functions.scalars import firstletter
    from ferenda_ray.pipelines.derived import faceted_data, toc_pagesets
    facet = Facet(ns.DCTERMS_IDENTIFIER, "dcterms_identifier",
                  selector=firstletter)
    wide = doc_triples(sf_dir, base).map_batches(
        _widen9, batch_format="pyarrow")
    faceted = faceted_data(wide, [facet])
    pages = toc_pagesets(faceted, facet)
    return pages.rename_columns(["value", "n_docs"])


def doc_stats(sf_dir: str, base: str = DEFAULT_BASE):
    """Faceted count-distinct over doc triples (the ``wsgiapp.stats``
    shape, wsgiapp.py:232-386): per (dimension, value), distinct doc
    URIs."""
    from ferenda_ray.functions.facets import Facet
    from ferenda_ray.functions.scalars import firstletter
    from ferenda_ray.pipelines.derived import stats
    facets = [
        Facet(ns.DCTERMS_LANGUAGE, "dcterms_language"),
        Facet(ns.DCTERMS_IDENTIFIER, "dcterms_identifier",
              selector=firstletter),
    ]
    wide = doc_triples(sf_dir, base).map_batches(
        _widen9, batch_format="pyarrow")
    out = stats(wide, facets)
    return out.map_batches(
        lambda b: b.rename_columns(["dimension", "value", "n_docs"]),
        batch_format="pyarrow")


def doc_annotations(sf_dir: str, base: str = DEFAULT_BASE):
    """Inbound-reference annotation groups (``construct_annotations``,
    documentrepository.py:2636-2712) over the mention triples: for each
    linked entity, how many documents reference it — expressed through
    the composable BGP operator (``stages/bgp.py``): one pattern +
    prefix filter + groupby count."""
    from ray.data.aggregate import Count
    from ferenda_ray.stages.bgp import match, v
    sols = match(
        _mention_triples(sf_dir, base),
        [(v("subj"), ns.DCTERMS_SUBJECT, v("target_uri"))],
        filters=[(v("target_uri"), "prefix", base + "entity/")])
    return sols.groupby("target_uri").aggregate(
        Count(alias_name="n_inbound"))


def doc_toc_entries(sf_dir: str, base: str = DEFAULT_BASE):
    """Exploded TOC selection over the doc facets: one
    ``(value, sortkey, uri)`` row per doc, page = first identifier
    character (``toc_select_for_pages`` semantics without list
    columns)."""
    from ferenda_ray.functions.facets import Facet
    from ferenda_ray.functions.scalars import firstletter
    from ferenda_ray.pipelines.derived import faceted_data, toc_entries
    facet = Facet(ns.DCTERMS_IDENTIFIER, "dcterms_identifier",
                  selector=firstletter)
    wide = doc_triples(sf_dir, base).map_batches(
        _widen9, batch_format="pyarrow")
    return toc_entries(faceted_data(wide, [facet]), facet)


def doc_keyword_hub(sf_dir: str, base: str = DEFAULT_BASE):
    """Keyword hub over the mention triples: per linked entity, doc
    count + lexicographically first doc URI
    (``keyword.py:107-173`` shape)."""
    from ferenda_ray.pipelines.derived import keyword_hub
    return keyword_hub(_mention_triples(sf_dir, base))


def language_stats(sf_dir: str):
    """Count-distinct docs per language (the ``wsgiapp.stats`` shape
    on documents)."""
    from ray.data.aggregate import Count
    return (_read_docs(sf_dir, ["doc_id", "lang"])
            .groupby("lang").aggregate(Count(alias_name="n_docs")))


# --- driver-comparable wrappers over the dedup / text-analysis stages ------

def docs_exact_dedup(sf_dir: str):
    from ferenda_ray.stages.dedup import exact_dedup
    out = exact_dedup(_read_docs(sf_dir, ["doc_id", "text"]))
    return out.map_batches(lambda b: b.select(["doc_id", "n_dups"]),
                           batch_format="pyarrow")


def docs_token_count(sf_dir: str):
    from ferenda_ray.stages.text_analysis import token_count
    return token_count(_read_docs(sf_dir, ["doc_id", "text"]))


def docs_dup_ngrams(sf_dir: str, n: int = 16, stride: int = 4):
    """Per-doc exact substring-duplication stats (Lee et al. 2022
    substring dedup): distinct byte 16-grams sampled every 4 bytes,
    counted against the rest of the corpus — ``(doc_id, dup_grams,
    total_grams)``.  Byte grams == char grams on the ASCII corpus,
    matching the char-based SQL oracle."""
    from ferenda_ray.stages.dedup import ngram_dup_stats
    return ngram_dup_stats(_read_docs(sf_dir, ["doc_id", "text"]),
                           n=n, stride=stride)


def docs_top_tokens(sf_dir: str, k: int = 20):
    """Exact corpus-wide top-k tokens — the oracle-checked twin of the
    Space-Saving sketch path (``sketches.heavy_hitter_tokens``).
    Per-batch polars value_counts combiner shrinks the exchange to
    (token, partial-count) rows before the one global groupby."""
    import polars as pl

    from ray.data.aggregate import Sum as _Sum

    def combine(b: pa.Table) -> pa.Table:
        vc = (pl.from_arrow(b).select(
            pl.col("text").str.split(" ").alias("tok"))
            .explode("tok")["tok"].value_counts())
        t = pa.table({"tok": vc["tok"].to_arrow(),
                      "c": vc["count"].to_arrow()})
        return t.cast(pa.schema([("tok", pa.string()),
                                 ("c", pa.int64())]))

    counts = (_read_docs(sf_dir, ["doc_id", "text"])
              .map_batches(combine, batch_format="pyarrow")
              .groupby("tok").aggregate(_Sum("c", alias_name="n")))
    return counts.sort(["n", "tok"], descending=[True, False]).limit(k)


def docs_chunks(sf_dir: str, chunk_tokens: int = 64, overlap: int = 16):
    """Training chunk prep: 64-token windows overlapping by 16."""
    from ferenda_ray.stages.text_analysis import chunk_documents
    return chunk_documents(_read_docs(sf_dir, ["doc_id", "text"]),
                           chunk_tokens=chunk_tokens, overlap=overlap)


def docs_pack_offsets(sf_dir: str, seq_len: int = 1024):
    """Concat-and-split packing offsets for 1024-token sequences."""
    from ferenda_ray.stages.text_analysis import pack_sequence_offsets
    return pack_sequence_offsets(_read_docs(sf_dir, ["doc_id", "text"]),
                                 seq_len=seq_len)


def docs_snapshot_diff(sf_dir: str):
    """Corpus-diff demo on deterministic snapshots of the documents
    table: OLD = ids with ``id %% 10 != 0``, NEW = ids with
    ``id %% 10 != 1`` where ids with ``id %% 7 == 0`` carry edited
    text — producing all three statuses (added/removed/changed)
    against the same rule in SQL."""
    import polars as pl

    from ferenda_ray.stages.dedup import corpus_diff
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def mod_filter(m, r):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id")
            keep = pc.not_equal(
                pc.subtract(ids, pc.multiply(
                    pc.divide(ids, pa.scalar(m, pa.int64())),
                    pa.scalar(m, pa.int64()))),
                pa.scalar(r, pa.int64()))
            return b.filter(keep)
        return f

    old = docs.map_batches(mod_filter(10, 0), batch_format="pyarrow")

    def edit(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.with_columns(
            pl.when(pl.col("doc_id") % 7 == 0)
            .then(pl.col("text") + pl.lit(" v2"))
            .otherwise(pl.col("text")).alias("text")
        ).to_arrow().cast(b.schema)

    new = docs.map_batches(mod_filter(10, 1),
                           batch_format="pyarrow").map_batches(
        edit, batch_format="pyarrow")
    return corpus_diff(old, new)


def docs_incremental_neardup(sf_dir: str):
    """Incremental near-dedup against a PERSISTED LSH index — the
    operational 100-TB composition: the OLD snapshot (ids with
    ``id %% 10 != 0``, the same split as :func:`docs_snapshot_diff`)
    is indexed once with :func:`~ferenda_ray.stages.dedup.
    build_minhash_index`; the NEW snapshot's added docs
    (``id %% 10 == 0``) probe it with two hash joins — the old corpus
    is never re-paired.  Returns verified ``(new_id, old_id)`` pairs
    (identical distinct word sets), exactly the SQL digest-join
    oracle.  The index is rebuilt into a fresh directory per call so
    results never depend on stale /tmp state; persistence/reuse
    across calls is exercised by the probe-twice pytest."""
    import shutil
    import tempfile

    from ferenda_ray.stages.dedup import (build_minhash_index,
                                          probe_minhash_index)
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def mod_filter(eq: bool):
        def f(b: pa.Table) -> pa.Table:
            rem = pc.subtract(
                b.column("doc_id"),
                pc.multiply(pc.divide(b.column("doc_id"),
                                      pa.scalar(10, pa.int64())),
                            pa.scalar(10, pa.int64())))
            keep = pc.equal(rem, 0) if eq else pc.not_equal(rem, 0)
            return b.filter(keep)
        return f

    old = docs.map_batches(mod_filter(False), batch_format="pyarrow")
    new = docs.map_batches(mod_filter(True), batch_format="pyarrow")
    idx = tempfile.mkdtemp(prefix="ferenda_ray_mhidx_")
    try:
        build_minhash_index(old, idx)
        # materialize: the probe plan is consumed lazily by the caller,
        # which would otherwise read the index after the cleanup below
        out = probe_minhash_index(new, idx).materialize()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out


def docs_stratified_sample(sf_dir: str, k: int = 10):
    """Deterministic k-per-language sample (md5-ordered)."""
    from ferenda_ray.stages.sample import stratified_sample
    out = stratified_sample(
        _read_docs(sf_dir, ["doc_id", "lang"]), group_col="lang", k=k)
    return out


def docs_tfidf_top_terms(sf_dir: str, k: int = 3):
    """Top-3 characteristic terms per doc (integer-keyed tf-idf
    ranking — see ``text_analysis.tfidf_top_terms``)."""
    from ferenda_ray.stages.text_analysis import tfidf_top_terms
    return tfidf_top_terms(_read_docs(sf_dir, ["doc_id", "text"]), k=k)


def docs_bpe_pair_counts(sf_dir: str, k: int = 20):
    """Round-1 BPE statistics: top-k adjacent CHARACTER pair counts
    over whitespace words (weighted by word frequency = plain corpus
    pair counts) — the oracle-checked exact twin of the iterative
    ``text_analysis.bpe_train`` (whose later rounds depend on applied
    merges and are pytest-verified against an independent reference
    implementation)."""
    from ray.data.aggregate import Sum as _Sum

    from ferenda_ray.stages.text_analysis import (_pair_counts_batch,
                                                  word_frequencies)

    def init_syms(b: pa.Table) -> pa.Table:
        ws = b.column("word").to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in ws],
                             pa.list_(pa.string())),
            "freq": b.column("freq")})

    counts = (word_frequencies(_read_docs(sf_dir, ["doc_id", "text"]))
              .map_batches(init_syms, batch_format="pyarrow")
              .map_batches(_pair_counts_batch, batch_format="pyarrow")
              .groupby(["left", "right"])
              .aggregate(_Sum("n", alias_name="n")))
    top = counts.sort(["n", "left", "right"],
                      descending=[True, False, False]).limit(k)
    return top.map_batches(
        lambda b: b.rename_columns(["sym_left", "sym_right", "n"]),
        batch_format="pyarrow")


def docs_bpe_merges(sf_dir: str, num_merges: int = 8):
    """The learned BPE merge table as a Table (rows-only driver
    check: later rounds depend on applied merges, not expressible in
    one SQL pass; pytest verifies vs an independent reference)."""
    from ferenda_ray.stages.text_analysis import bpe_train
    m = bpe_train(_read_docs(sf_dir, ["doc_id", "text"]),
                  num_merges=num_merges)
    return pa.table({
        "rank": pa.array([r for r, *_ in m], pa.int64()),
        "sym_left": pa.array([l for _, l, _, _ in m], pa.string()),
        "sym_right": pa.array([r for _, _, r, _ in m], pa.string()),
        "freq": pa.array([f for *_, f in m], pa.int64())})


def docs_remove_dup_spans(sf_dir: str, n: int = 16):
    """Substring dedup in its removal form: the cleaned corpus with
    every byte covered by a corpus-duplicated 16-byte window deleted
    (byte == char on the ASCII corpus, matching the char oracle)."""
    from ferenda_ray.stages.dedup import remove_duplicated_spans
    return remove_duplicated_spans(_read_docs(sf_dir, ["doc_id", "text"]),
                                   n=n)


def _seg_min_docs(ds) -> int:
    """Corpus-relative duplication threshold (>25% of docs) — scale-
    stable: parquet metadata answers ``count()`` without a read."""
    return max(ds.count() // 4, 2)


def docs_segment_dup_stats(sf_dir: str):
    """CCNet-style per-doc boilerplate stats at SEGMENT granularity
    (``delim=' '`` on the single-line synthetic corpus ⇒ segments are
    words; on prose corpora ``delim='\\n'`` gives line stats): how
    many of a doc's segment occurrences appear in >25% of all docs."""
    from ferenda_ray.stages.dedup import segment_dup_stats
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return segment_dup_stats(ds, min_docs=_seg_min_docs(ds), delim=" ")


def docs_remove_common_segments(sf_dir: str):
    """Segment dedup, boilerplate-removal form: every occurrence of a
    segment present in >25% of docs is deleted and the doc rebuilt."""
    from ferenda_ray.stages.dedup import remove_duplicate_segments
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return remove_duplicate_segments(ds, min_docs=_seg_min_docs(ds),
                                     mode="drop_all", delim=" ")


def docs_segments_keep_first(sf_dir: str):
    """Segment dedup, CCNet keep-first form (Wenzek et al. 2020):
    of every corpus-duplicated segment keep only the single globally
    first occurrence (min doc_id, then min position)."""
    from ferenda_ray.stages.dedup import remove_duplicate_segments
    return remove_duplicate_segments(
        _read_docs(sf_dir, ["doc_id", "text"]),
        min_docs=2, mode="keep_first", delim=" ")


def docs_perplexity(sf_dir: str):
    """CCNet-style LM-perplexity quality statistic: bits-per-bigram
    under a self-trained add-0.5 bigram LM, rounded to 6 digits for
    the float-stable oracle compare."""
    from ferenda_ray.pipelines.relational import _round_cols
    from ferenda_ray.stages.text_analysis import perplexity_score
    out = perplexity_score(_read_docs(sf_dir, ["doc_id", "text"]))
    return out.map_batches(
        lambda b: _round_cols(b, {"bits_per_bigram": 6}),
        batch_format="pyarrow")


def docs_moore_lewis(sf_dir: str):
    """Moore-Lewis cross-entropy-difference data selection: in-domain
    LM trained on the ``lang='en'`` slice, general LM on the whole
    corpus; keep docs whose rounded ce_diff < 0 (more in-domain than
    general)."""
    from ferenda_ray.stages.text_analysis import moore_lewis_weights
    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), "en"))
        .select(["doc_id", "text"]),
        batch_format="pyarrow")
    body = docs.map_batches(lambda b: b.select(["doc_id", "text"]),
                            batch_format="pyarrow")
    return moore_lewis_weights(body, target)


def docs_dsir(sf_dir: str):
    """DSIR hashed-bigram importance weights: target distribution from
    the ``lang='en'`` slice, raw distribution from the whole corpus;
    keep docs whose rounded mean log importance ratio > 0."""
    from ferenda_ray.stages.text_analysis import dsir_weights
    docs = _read_docs(sf_dir, ["doc_id", "text", "lang"])
    target = docs.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), "en"))
        .select(["doc_id", "text"]),
        batch_format="pyarrow")
    body = docs.map_batches(lambda b: b.select(["doc_id", "text"]),
                            batch_format="pyarrow")
    return dsir_weights(body, target)


def docs_quality(sf_dir: str):
    from ferenda_ray.stages.text_analysis import quality_score
    return quality_score(_read_docs(sf_dir, ["doc_id", "text"]))


def docs_jaccard_pairs(sf_dir: str, threshold: float = 0.4,
                       max_docs: int = 1000):
    """Exact Jaccard pairs via the distributed prefix-filter plan
    (``dedup.jaccard_pairs``).  CAPPED to the first ``max_docs`` doc
    ids (documented bound, mirrored in the SQL oracle): the synthetic
    corpus draws from a tiny vocabulary, so at threshold 0.4 nearly
    HALF of all N² pairs qualify — the *output* is quadratic and no
    algorithm changes that.  Real sparse corpora don't hit the cap
    path; the operator itself has no cap."""
    from ferenda_ray.stages.dedup import jaccard_pairs
    docs = _read_docs(sf_dir, ["doc_id", "text"]).filter(
        expr=f"doc_id < {max_docs}")
    out = jaccard_pairs(docs, threshold=threshold)
    from ferenda_ray.pipelines.relational import _round_cols
    return out.map_batches(lambda b: _round_cols(b, {"jaccard": 6}),
                           batch_format="pyarrow")


def docs_minhash_pairs(sf_dir: str, threshold: float = 0.5):
    from ferenda_ray.stages.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_read_docs(sf_dir, ["doc_id", "text"]),
                             threshold=threshold)


def docs_minhash_verified_dups(sf_dir: str):
    """MinHash-LSH candidate pairs VERIFIED by exact word-SET equality
    — the oracle-checkable end-to-end exercise of the LSH path.  The
    MinHash here runs over 1-gram shingles (= the distinct-word set),
    so identical word sets ⇒ identical signatures ⇒ the pair collides
    in EVERY band: recall vs the SQL identical-word-set-pair oracle is
    1.0 BY CONSTRUCTION; the word-set-digest verify removes
    estimate-only false positives.  Returns ``(id_a, id_b)``."""
    import hashlib
    from ferenda_ray.cluster import coalesce_partitions, join_partitions
    from ferenda_ray.stages.dedup import minhash_lsh_pairs
    co = coalesce_partitions()
    np_ = join_partitions()
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=1.0,
                              shingle_n=1).repartition(co)

    def sha_side(idname, shaname):
        def prep(b: pa.Table) -> pa.Table:
            digs = [hashlib.sha256(
                        " ".join(sorted(set(t.split()))).encode()).hexdigest()
                    for t in b.column("text").to_pylist()]
            return pa.table({idname: b.column("doc_id"),
                             shaname: pa.array(digs, pa.string())})
        return prep

    sa = docs.map_batches(sha_side("id_a", "sha_a"),
                          batch_format="pyarrow").repartition(co)
    sb = docs.map_batches(sha_side("id_b", "sha_b"),
                          batch_format="pyarrow").repartition(co)
    j = pairs.join(sa, join_type="inner", on=("id_a",), num_partitions=np_)
    # coalesce between joins: Ray 2.49's join chokes on the empty
    # blocks the previous join can emit
    j = j.repartition(co)
    j = j.join(sb, join_type="inner", on=("id_b",), num_partitions=np_)

    def verify(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("sha_a"), b.column("sha_b"))
        return b.filter(keep).select(["id_a", "id_b"])

    return j.map_batches(verify, batch_format="pyarrow")


def docs_distinct(sf_dir: str):
    """Representative rows via the distributed semi-join dedup plan
    (``distinct_docs`` default path: groupby-Min keep set ⋈ docs on
    id, no driver-side id collection)."""
    from ferenda_ray.stages.dedup import distinct_docs
    out = distinct_docs(_read_docs(sf_dir))
    return out.map_batches(
        lambda b: b.select(["doc_id", "lang", "source", "n_chars"]),
        batch_format="pyarrow")


def docs_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs with the md5 token hash: band blocking
    has exact recall (pigeonhole), so the output equals the all-pairs
    Hamming-distance set and the DuckDB oracle applies."""
    from ferenda_ray.stages.dedup import simhash_pairs
    return simhash_pairs(_read_docs(sf_dir, ["doc_id", "text"]),
                         max_hamming=max_hamming, token_hash="md5")


def docs_neardup_clusters(sf_dir: str, max_hamming: int = 3):
    """Full near-dup cluster assignment: connected components (min-id
    label) over the exact-recall SimHash pair graph — one row per doc,
    singletons map to themselves.  Distributed label propagation over
    the edge set; the corpus side pays a single left-outer join.
    ORACLE: recursive-CTE reachability over the same pair SQL."""
    from ferenda_ray.stages.dedup import neardup_clusters, simhash_pairs
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    pairs = simhash_pairs(docs, max_hamming=max_hamming,
                          token_hash="md5")
    return neardup_clusters(docs, pairs)


def docs_dedup_keep_best(sf_dir: str, max_hamming: int = 3):
    """Near-dedup RESOLUTION: per SimHash cluster keep the single best
    doc (max ``n_chars``, ties → min id); singletons survive.  The
    cleaned-corpus keep set with provenance (cluster id + size)."""
    from ferenda_ray.stages.dedup import dedup_keep_best, simhash_pairs
    docs = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])
    pairs = simhash_pairs(
        _read_docs(sf_dir, ["doc_id", "text"]),
        max_hamming=max_hamming, token_hash="md5")
    return dedup_keep_best(docs, pairs, score_col="n_chars")


#: named statutes cycled through the synthesized citation column of
#: ``docs_legal_refs`` (name -> SFS number via legalref.KNOWN_LAWS)
_CITE_LAWS = [("brottsbalken", "1962:700"),
              ("rättegångsbalken", "1942:740"),
              ("regeringsformen", "1974:152")]


def docs_legal_refs(sf_dir: str):
    """Structured statute-citation extraction (the LegalRef grammar,
    ``ferenda_ray/legalref.py``) as a distributed actor-pool stage.

    The synthetic corpus has no Swedish statute citations, so each doc
    synthesizes one DETERMINISTIC compound reference from its doc_id
    ("enligt {K} kap. {P} § {law}") and runs the real parser on it;
    the DuckDB oracle reconstructs the expected structured output
    (law / chapter / section / minted URI) with arithmetic + CASE.
    Parser state (compiled grammar tables) lives per actor in
    ``__init__`` — the FSM/CitationParser broadcast pattern
    (SURVEY.md §2.4)."""

    class CiteExtract:
        def __init__(self):
            from ferenda_ray.legalref import LegalRefParser, Link
            self.parser = LegalRefParser()
            self.Link = Link

        def __call__(self, b: pa.Table) -> pa.Table:
            out = {"doc_id": [], "law": [], "chapter": [],
                   "section": [], "uri": []}
            for i in b.column("doc_id").to_pylist():
                name, _ = _CITE_LAWS[i % 3]
                text = (f"enligt {1 + i % 17} kap. "
                        f"{1 + i % 29} § {name}")
                for n in self.parser.parse(text):
                    if not isinstance(n, self.Link):
                        continue
                    out["doc_id"].append(i)
                    out["law"].append(n.attrs["law"])
                    out["chapter"].append(n.attrs["chapter"])
                    out["section"].append(n.attrs["section"])
                    out["uri"].append(n.uri)
            return pa.table({
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "law": pa.array(out["law"], pa.string()),
                "chapter": pa.array(out["chapter"], pa.string()),
                "section": pa.array(out["section"], pa.string()),
                "uri": pa.array(out["uri"], pa.string())})

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        CiteExtract, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8))


def docs_citation_roles(sf_dir: str):
    """The five non-LAGRUM citation roles (rattsfall / forarbeten /
    eulag / myndighetsbeslut, reference
    ``sources/legal/se/legalref.py`` roles 4-8) as one distributed
    actor-pool stage.  Like ``docs_legal_refs``, each doc synthesizes
    one DETERMINISTIC reference from its doc_id — role = doc_id % 4 —
    and runs the real role parser on it; the DuckDB oracle
    reconstructs the minted URI with arithmetic + CASE."""

    class RoleExtract:
        def __init__(self):
            from ferenda_ray.legalref import (AvgParser, EULagParser,
                                              EURattsfallParser,
                                              ForarbetenParser, Link,
                                              RattsfallParser)
            self.parsers = (RattsfallParser(), ForarbetenParser(),
                            EULagParser(), AvgParser(),
                            EURattsfallParser())
            self.Link = Link

        def __call__(self, b: pa.Table) -> pa.Table:
            ids, roles, uris = [], [], []
            for i in b.column("doc_id").to_pylist():
                role = i % 5
                if role == 0:
                    text = f"se NJA {1990 + i % 30} s. {10 + i % 90}"
                elif role == 1:
                    y = 1990 + i % 30
                    text = f"prop. {y}/{(y + 1) % 100:02d}:{1 + i % 200}"
                elif role == 2:
                    text = (f"rådets direktiv {70 + i % 30}/"
                            f"{1 + i % 600}/EG")
                elif role == 3:
                    text = f"dnr {100 + i % 800}-{i % 99:02d}-40"
                else:
                    text = f"Case C-{1 + i % 300}/{i % 30:02d}"
                for n in self.parsers[role].parse(text):
                    if isinstance(n, self.Link) and n.uri:
                        ids.append(i)
                        roles.append(role)
                        uris.append(n.uri)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "role": pa.array(roles, pa.int64()),
                "uri": pa.array(uris, pa.string())})

    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        RoleExtract, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 8))


def docs_fingerprints(sf_dir: str):
    """Winnowing fingerprints with the md5 k-gram hash (bit-identical
    to DuckDB's ``md5_number_lower``), exploded to one row per
    fingerprint value so the driver's SQL oracle can hash-compare."""
    import pyarrow as pa

    from ferenda_ray.stages.text_analysis import fingerprints
    out = fingerprints(_read_docs(sf_dir, ["doc_id", "text"]),
                       hash="md5")

    def explode(b):
        ids, fps = [], []
        for doc_id, fp in zip(b.column("doc_id").to_pylist(),
                              b.column("fingerprint").to_pylist()):
            ids.extend([doc_id] * len(fp))
            fps.extend(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.int64())})

    return out.map_batches(explode, batch_format="pyarrow")


def docs_language_id(sf_dir: str):
    from ferenda_ray.stages.text_analysis import language_id
    return language_id(_read_docs(sf_dir, ["doc_id", "text"]))


def docs_sample(sf_dir: str):
    """Deterministic md5-bucket sample of the documents table (the
    ``samplerepo`` analogue; engine-portable, so the DuckDB oracle
    computes the identical row set)."""
    from ferenda_ray.stages.sample import hash_sample
    ds = _read_docs(sf_dir, ["doc_id", "lang", "source"])
    return hash_sample(ds, "doc_id", keep_buckets=(0,), num_buckets=16)


def docs_search(sf_dir: str, terms=("batch", "stream", "vector"),
                k: int = 10):
    """Ranked fulltext search over the documents table — the
    ``relate_fulltext`` index + ``WSGIApp.query`` shape on
    oracle-checkable data (score = whole-word term frequency; no
    title field here so no boost term)."""
    from ferenda_ray.stages.fulltext import search

    def as_index(b: pa.Table) -> pa.Table:
        import polars as pl
        n = b.num_rows
        uri = pl.from_arrow(b.select(["source", "doc_id"])).select(
            (pl.lit(DEFAULT_BASE + "res/") + pl.col("source") + pl.lit("/")
             + pl.col("doc_id").cast(pl.String)).alias("uri"))["uri"]
        return pa.table({
            "uri": uri.to_arrow().cast(pa.string()),
            "title": pa.array([""] * n, pa.string()),
            "text": b.column("text").cast(pa.large_string()),
        })

    index = _read_docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        as_index, batch_format="pyarrow")
    return search(index, list(terms), k=k)


def doc_facets_long(sf_dir: str):
    """UNPIVOT/melt of the faceted wide table back to long
    ``(uri, facet, value)`` rows — vectorized per batch (one output
    column-block per facet, concatenated)."""
    wide = doc_facets(sf_dir)
    facets = ["dcterms_identifier", "dcterms_language", "dcterms_extent"]

    def melt(b: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(b)
        out = pl.concat([
            df.select(pl.col("uri"), pl.lit(f).alias("facet"),
                      pl.col(f).cast(pl.String).alias("value"))
            for f in facets])
        return out.to_arrow()

    return wide.map_batches(melt, batch_format="pyarrow")


def doc_entity_pagerank(sf_dir: str, damping: float = 0.85,
                        iters: int = 10):
    """PageRank over the symmetrized doc↔entity mention graph — the
    iterative join+aggregate operator, oracle-checked via an unrolled
    CTE chain (fixed iterations, float64, round 6)."""
    from ferenda_ray.stages.graph import pagerank

    def edges(b: pa.Table) -> pa.Table:
        docs_ = ["doc:%d" % d for d in b.column("doc_id").to_pylist()]
        ents = ["ent:%s" % a for a in b.column("alias").to_pylist()]
        return pa.table({"src": pa.array(docs_ + ents, pa.string()),
                         "dst": pa.array(ents + docs_, pa.string())})

    from ferenda_ray.cluster import coalesce_partitions
    e = doc_mentions(sf_dir).map_batches(edges, batch_format="pyarrow")
    pr = pagerank(e, damping=damping, iters=iters,
                  num_partitions=coalesce_partitions(), symmetric=True)
    return pr.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "rank": pc.round(b.column("rank"), 6)}),
        batch_format="pyarrow")


def docs_search_bm25(sf_dir: str, terms=("batch", "stream", "vector"),
                     k: int = 10):
    """Okapi BM25 ranking (k1=1.2, b=0.75) over the documents table —
    exact-formula oracle in SQL (same idf/tf shape, double math,
    round 4)."""
    from ferenda_ray.stages.fulltext import search_bm25

    def as_index(b: pa.Table) -> pa.Table:
        import polars as pl
        uri = pl.from_arrow(b.select(["source", "doc_id"])).select(
            (pl.lit(DEFAULT_BASE + "res/") + pl.col("source") + pl.lit("/")
             + pl.col("doc_id").cast(pl.String)).alias("uri"))["uri"]
        return pa.table({
            "uri": uri.to_arrow().cast(pa.string()),
            "text": b.column("text").cast(pa.large_string()),
        })

    index = _read_docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        as_index, batch_format="pyarrow")
    return search_bm25(index, list(terms), k=k)


def docs_search_paged(sf_dir: str, terms=("batch", "stream"),
                      lang: str = "en", page: int = 1, page_size: int = 5):
    """Field-filtered, PAGINATED search — the full ``WSGIApp.query``
    surface (free-text + ``lang=`` field filter + page 2 of the rank
    ordering), oracle-checkable."""
    import polars as pl
    from ferenda_ray.stages.fulltext import query

    def as_index(b: pa.Table) -> pa.Table:
        uri = pl.from_arrow(b.select(["source", "doc_id"])).select(
            (pl.lit(DEFAULT_BASE + "res/") + pl.col("source") + pl.lit("/")
             + pl.col("doc_id").cast(pl.String)).alias("uri"))["uri"]
        return pa.table({
            "uri": uri.to_arrow().cast(pa.string()),
            "title": pa.array([""] * b.num_rows, pa.string()),
            "text": b.column("text").cast(pa.large_string()),
            "lang": b.column("lang"),
        })

    index = _read_docs(sf_dir, ["doc_id", "source", "text", "lang"]) \
        .map_batches(as_index, batch_format="pyarrow")
    return query(index, list(terms), fields={"lang": lang},
                 page=page, page_size=page_size)


# --- embeddings ------------------------------------------------------------


def _read_emb(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _query_matrix(emb, query_ids):
    """Fetch the few query vectors WITHOUT collecting the table: the
    id filter runs distributed, only ≤len(query_ids) rows reach the
    driver."""
    import numpy as np
    import pyarrow.compute as pc

    ids = pa.array(list(query_ids))
    picked = emb.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=ids)),
        batch_format="pyarrow").take_all()
    rows = {r["vec_id"]: r["embedding"] for r in picked}
    return np.array([rows[q] for q in query_ids], dtype=np.float64)


def ann_topk(sf_dir: str, query_ids=(0, 1, 2), k: int = 10):
    """Brute-force cosine top-k for the vectors with the given ids
    (float64 math so the oracle's arithmetic matches)."""
    import numpy as np
    from ferenda_ray.stages.similarity import brute_topk
    emb = _read_emb(sf_dir).materialize()
    Q = _query_matrix(emb, query_ids)
    from ferenda_ray.pipelines.relational import _round_cols
    out = brute_topk(emb, Q, k=k, query_ids=list(query_ids))
    return out.map_batches(lambda b: _round_cols(b, {"cosine": 4}),
                           batch_format="pyarrow")


def embeddings_neardup(sf_dir: str, threshold: float = 0.4):
    from ferenda_ray.stages.dedup import embedding_neardup_pairs
    from ferenda_ray.pipelines.relational import _round_cols
    out = embedding_neardup_pairs(_read_emb(sf_dir), threshold=threshold)
    return out.map_batches(lambda b: _round_cols(b, {"cosine": 4}),
                           batch_format="pyarrow")


def embeddings_label_count(sf_dir: str):
    from ray.data.aggregate import Count
    return (_read_emb(sf_dir).select_columns(["label"])
            .groupby("label").count()
            .map_batches(lambda b: b.rename_columns(["label", "n"]),
                         batch_format="pyarrow"))


def embeddings_kmeans(sf_dir: str, k: int = 4, iters: int = 2):
    """Distributed k-means assignments ``(vec_id, cluster)`` —
    smallest-id init and a fixed iteration count, so the unrolled SQL
    oracle reproduces the assignment exactly (integer output: no
    float-rounding surface).  The input is materialized once (an
    iterative algorithm re-scans it every pass otherwise)."""
    from ferenda_ray.stages.similarity import kmeans_iterate
    emb = _read_emb(sf_dir).materialize()
    _, assigns = kmeans_iterate(emb, k=k, iters=iters)
    return assigns


def embeddings_knn_graph(sf_dir: str, k: int = 5):
    """Exact cosine k-NN graph over every vector (self excluded,
    rank by cosine desc then neighbor id; float64 math so the
    oracle's arithmetic matches; cosine rounded 4 AFTER ranking,
    the ann_topk convention)."""
    from ferenda_ray.pipelines.relational import _round_cols
    from ferenda_ray.stages.similarity import knn_graph
    out = knn_graph(_read_emb(sf_dir), k=k)
    return out.map_batches(lambda b: _round_cols(b, {"cosine": 4}),
                           batch_format="pyarrow")


def embeddings_semdedup(sf_dir: str, eps: float = 0.4):
    """SemDeDup over the embeddings table: k-means buckets (the
    oracled k=4/iters=2 instance) + within-cluster cosine pruning,
    keep-first.  ORACLE: the unrolled-kmeans SQL feeding an EXISTS
    lower-id-neighbor check on 6-digit rounded cosines."""
    from ferenda_ray.stages.similarity import semdedup
    return semdedup(_read_emb(sf_dir).materialize(), k=4, iters=2,
                    eps=eps)


def embeddings_quantized(sf_dir: str):
    """int8-quantized embeddings EXPLODED to one row per dimension
    (the fingerprints pattern: the driver's value hash needs scalar
    cells), scale rounded to 6 — the operator itself stores int8
    lists (``similarity.quantize_embeddings``)."""
    import numpy as np

    from ferenda_ray.stages.similarity import quantize_embeddings

    def compare_form(b: pa.Table) -> pa.Table:
        q = b.column("qvec").combine_chunks()
        n, d = len(q), len(q[0])
        flat = np.asarray(q.values, dtype=np.int64)
        ids = np.repeat(b.column("vec_id").to_numpy(), d)
        scale = np.repeat(
            np.round(b.column("scale").to_numpy(), 6), d)
        dim = np.tile(np.arange(1, d + 1, dtype=np.int64), n)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "dim": pa.array(dim, pa.int64()),
            "scale": pa.array(scale, pa.float64()),
            "q": pa.array(flat, pa.int64())})

    return quantize_embeddings(_read_emb(sf_dir)).map_batches(
        compare_form, batch_format="pyarrow")


def embeddings_logreg(sf_dir: str, iters: int = 2, lr: float = 0.5):
    """Trained quality-classifier weights ``(dim, weight)`` — batch-GD
    logistic regression on (embedding → label>=5), unrolled-SQL
    oracle-checkable exactly like ``embeddings_kmeans`` (zero init,
    fixed lr and iteration count, float64 accumulation); bias is the
    last dim.  Weights rounded to 6 digits for the float-stable
    compare."""
    import numpy as np

    from ferenda_ray.stages.similarity import logreg_train
    w = logreg_train(_read_emb(sf_dir).materialize(), iters=iters,
                     lr=lr)
    return pa.table({
        "dim": pa.array(range(len(w)), pa.int64()),
        "weight": pa.array(np.round(w, 6), pa.float64())})


def embeddings_logreg_scores(sf_dir: str, iters: int = 2,
                             lr: float = 0.5):
    """Train-then-score: the classifier trained by ``logreg_train``
    applied back over the table distributed — ``(vec_id, score)``
    sigmoid probabilities rounded to 6 (the model-filter statistic;
    the oracle re-derives the same 2-step weights and scores in
    SQL)."""
    from ferenda_ray.stages.similarity import logreg_score, logreg_train
    emb = _read_emb(sf_dir).materialize()
    w = logreg_train(emb, iters=iters, lr=lr)
    out = logreg_score(emb, w)
    return out.map_batches(
        lambda b: pa.table({"vec_id": b.column("vec_id"),
                            "score": pc.round(b.column("score"), 6)}),
        batch_format="pyarrow")


def ivf_ann_topk(sf_dir: str, query_ids=(0, 1, 2), k: int = 10):
    """IVF top-k run FULL-PROBE (n_probe = n_centroids), which is
    exact by construction — so the brute-force SQL oracle applies and
    the whole IVF machinery (train → assign → per-cell scan → merge)
    is value-checked.  The PRUNED path's recall is measured against
    brute force in tests (test_similarity)."""
    import numpy as np
    from ferenda_ray.stages.similarity import ivf_topk
    from ferenda_ray.pipelines.relational import _round_cols
    emb = _read_emb(sf_dir).materialize()
    Q = _query_matrix(emb, query_ids)
    out = ivf_topk(emb, Q, k=k, n_centroids=16, n_probe=16,
                   query_ids=list(query_ids), dtype=np.float64)
    return out.map_batches(lambda b: _round_cols(b, {"cosine": 4}),
                           batch_format="pyarrow")


def lsh_ann_topk(sf_dir: str, query_ids=(0, 1, 2), k: int = 10):
    """Approximate (LSH-bucketed) variant — rows-only check (recall<1
    by design; measured against brute force in tests)."""
    import numpy as np
    from ferenda_ray.stages.similarity import lsh_topk
    emb = _read_emb(sf_dir).materialize()
    Q = _query_matrix(emb, query_ids)
    return lsh_topk(emb, Q, k=k, n_planes=6, probe_hamming=2,
                    query_ids=list(query_ids))


def ann_topk_int8(sf_dir: str, query_ids=(0, 1, 2), k: int = 10):
    """int8-scan brute-force variant — rows-only check (quantization
    keeps ~2-3 cosine digits; recall vs the exact float path is
    measured in tests); ``ann_topk`` is the oracle-checked exact
    twin."""
    from ferenda_ray.stages.similarity import (brute_topk_int8,
                                               quantize_embeddings)
    emb = _read_emb(sf_dir).materialize()
    Q = _query_matrix(emb, query_ids)
    return brute_topk_int8(quantize_embeddings(emb), Q, k=k,
                           query_ids=list(query_ids))


def docs_repetition(sf_dir: str):
    """Gopher-style repetition filters (dup-line / dup-word fractions
    + pass flag) over the documents table."""
    from ferenda_ray.stages.text_analysis import repetition_stats
    return repetition_stats(_read_docs(sf_dir, ["doc_id", "text"]))


def docs_decontaminate(sf_dir: str, n: int = 8):
    """Benchmark decontamination over the documents table: every 50th
    doc plays the held-out benchmark; its leading 8-gram is the probe.
    The probe set (small side) is collected and broadcast; the scan is
    distributed."""
    from ferenda_ray.stages.text_analysis import (benchmark_ngrams,
                                                  decontaminate)
    def every_50th(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            (b.column("doc_id").to_numpy() % 50) == 0))

    bench_docs = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        every_50th, batch_format="pyarrow")
    grams = benchmark_ngrams(bench_docs, n=n).take_all()
    return decontaminate(_read_docs(sf_dir, ["doc_id", "text"]),
                         [r["gram"] for r in grams], n=n)


def docs_pii_scrub(sf_dir: str):
    """PII scrubbing (emails/phones/IPv4 -> placeholder tokens) with
    per-doc redaction counts over the documents table."""
    from ferenda_ray.stages.text_analysis import pii_scrub
    return pii_scrub(_read_docs(sf_dir, ["doc_id", "text"]))


def doc_skeletons(sf_dir: str, base: str = DEFAULT_BASE):
    """Skeleton entries over the documents graph: URI objects (the
    bibo:Document class + mention entity URIs) that never appear as
    subjects — the dangling-reference anti-join of
    ``sources/general/skeleton.py``."""
    from ferenda_ray.pipelines.derived import skeleton_entries

    def narrow(b: pa.Table) -> pa.Table:
        return b.select(["subj", "pred", "obj_type", "obj_value"])

    graph = doc_triples(sf_dir, base).union(
        _mention_triples(sf_dir, base).map_batches(
            narrow, batch_format="pyarrow"))
    return skeleton_entries(graph)


def docs_clean_corpus(sf_dir: str, n: int = 8):
    """The composed training-data cleaning pipeline — the flagship
    LLM-hygiene flow as ONE distributed plan: exact dedup (min-id
    keeper per distinct text) ∩ Gopher repetition gates ∩ NOT
    benchmark-contaminated.  Each leg is an existing oracle-checked
    operator; this query verifies their composition end-to-end.

    Distributed shape: three id-keyed legs joined pairwise
    (hash joins on doc_id — no driver-side sets except the broadcast
    probe grams, which are the small side by construction)."""
    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)
    from ferenda_ray.stages.dedup import exact_dedup
    from ferenda_ray.stages.text_analysis import (benchmark_ngrams,
                                                  decontaminate,
                                                  repetition_stats)

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    keep = exact_dedup(docs).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    rep = repetition_stats(docs).map_batches(
        lambda b: b.filter(b.column("passes"))
        .select(["doc_id"]), batch_format="pyarrow")

    def every_50th(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            (b.column("doc_id").to_numpy() % 50) == 0))

    grams = benchmark_ngrams(
        docs.map_batches(every_50th, batch_format="pyarrow"),
        n=n).take_all()
    clean = decontaminate(docs, [g["gram"] for g in grams],
                          n=n).map_batches(
        lambda b: b.filter(pc.invert(b.column("contaminated")))
        .select(["doc_id"]), batch_format="pyarrow")

    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        keep, rep, clean = (d.repartition(co)
                            for d in (keep, rep, clean))
    out = keep.join(rep, join_type="inner", num_partitions=np_,
                    on=("doc_id",))
    if not ray_join_handles_empty_blocks():
        out = out.repartition(coalesce_partitions())
    return out.join(clean, join_type="inner", num_partitions=np_,
                    on=("doc_id",))


def docs_token_budget(sf_dir: str, budget: int = 2000):
    """Per-language token-budget head (md5-ordered deterministic
    shuffle, keep while the running whitespace-token total ≤ 2000) —
    the "N tokens per language" mixing step, as a distributed prefix
    sum.  ORACLE: window cumsum over the same md5 ordering."""
    from ferenda_ray.stages.sample import token_budget_sample
    return token_budget_sample(
        _read_docs(sf_dir, ["doc_id", "lang", "text"]), budget=budget)


def docs_weighted_mix(sf_dir: str):
    """Deterministic source-weighted mixing: source ``srcK`` keeps
    fraction (K+1)/20 of its docs by md5 threshold — seedless,
    cluster-size-independent, exactly restatable in SQL."""
    from ferenda_ray.stages.sample import weighted_mix
    weights = {f"src{k}": (k + 1) / 20 for k in range(20)}
    out = weighted_mix(
        _read_docs(sf_dir, ["doc_id", "source"]), weights)
    return out.map_batches(lambda b: b.select(["doc_id", "source"]),
                           batch_format="pyarrow")


def embeddings_covariance(sf_dir: str):
    """Upper-triangle population covariance of the 64 embedding
    dimensions, via distributed second-moment partial sums (one tiny
    keyed partial per batch; the vectors never shuffle).  ORACLE:
    per-dimension-pair SQL aggregates over the unnested vectors."""
    from ferenda_ray.stages.similarity import embedding_covariance
    return embedding_covariance(_read_emb(sf_dir))


def embeddings_pca(sf_dir: str, k: int = 4):
    """Top-4 principal components (eigendecomposition of the
    distributed covariance on the driver — d=64 ≪ corpus).  Rows-only
    driver check by design (eigenvectors are not SQL-expressible);
    the covariance input IS the oracle-checked exact twin, and the
    decomposition is pytest-verified against ``numpy.linalg.eigh`` on
    the full matrix."""
    from ferenda_ray.stages.similarity import pca_components
    return pca_components(_read_emb(sf_dir), k=k)


def docs_clean_corpus_v2(sf_dir: str):
    """The FULL cleaning composition: exact dedup ∩ repetition gates
    ∩ NOT contaminated (``docs_clean_corpus``) ∩ near-dup keep-best
    (one representative per SimHash cluster) — every leg an
    oracle-checked operator, composed as one more id-keyed hash join;
    nothing corpus-sized touches the driver."""
    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)
    base = docs_clean_corpus(sf_dir)
    kept = docs_dedup_keep_best(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        base, kept = base.repartition(co), kept.repartition(co)
    return base.join(kept, join_type="inner", num_partitions=np_,
                     on=("doc_id",))


def docs_epoch_shards(sf_dir: str, n_epochs: int = 2, n_shards: int = 8):
    """Deterministic per-epoch shard assignment (md5(epoch:id) mod 8,
    2 epochs) — multi-epoch training layout with no RNG state."""
    from ferenda_ray.stages.sample import epoch_shards
    return epoch_shards(_read_docs(sf_dir, ["doc_id"]),
                        n_epochs=n_epochs, n_shards=n_shards)


def docs_minhash_clusters(sf_dir: str):
    """Cluster assignment over the MinHash-LSH VERIFIED dup pairs
    (identical word sets ⇒ equivalence classes): every doc mapped to
    its class's min id.  ORACLE: window-min over the word-set
    partition — exact because word-set equality is transitive."""
    from ferenda_ray.stages.dedup import neardup_clusters
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    pairs = docs_minhash_verified_dups(sf_dir)
    return neardup_clusters(docs, pairs)


def docs_fuzzy_decontaminate(sf_dir: str, threshold: float = 0.5):
    """NEAR-duplicate decontamination: every 50th doc is the
    'benchmark'; flag docs whose word-set Jaccard vs any benchmark
    doc ≥ 0.5 — the paraphrase-level companion to the exact n-gram
    ``docs_decontaminate``."""
    from ferenda_ray.stages.text_analysis import fuzzy_decontaminate
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def mod50(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        rem = pc.subtract(ids, pc.multiply(
            pc.divide(ids, pa.scalar(50, pa.int64())),
            pa.scalar(50, pa.int64())))
        return b.filter(pc.equal(rem, pa.scalar(0, pa.int64()))) \
                .select(["doc_id"])

    # benchmark-sized id list (distributed filter, tiny take)
    probe_ids = [r["doc_id"] for r in docs.map_batches(
        mod50, batch_format="pyarrow").take_all()]
    return fuzzy_decontaminate(docs, probe_ids, threshold=threshold)


def docs_corpus_stats(sf_dir: str):
    """One-row corpus report (the dataset-card summary): doc count,
    whitespace-token total, distinct languages / sources / texts,
    mean doc length.  Every component is a distributed aggregate;
    only the six scalars reach the driver."""
    import polars as pl

    from ray.data.aggregate import Sum as _Sum

    docs = _read_docs(sf_dir, ["doc_id", "text", "n_chars",
                               "lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["text", "n_chars"]))
        toks = int(df["text"].str.count_matches(r"\S+").sum() or 0)
        return pa.table({
            "n_docs": pa.array([b.num_rows], pa.int64()),
            "n_tokens": pa.array([toks], pa.int64()),
            "sum_chars": pa.array(
                [int(df["n_chars"].sum() or 0)], pa.int64())})

    sums = (docs.map_batches(partial, batch_format="pyarrow")
            .aggregate(_Sum("n_docs", alias_name="n_docs"),
                       _Sum("n_tokens", alias_name="n_tokens"),
                       _Sum("sum_chars", alias_name="sum_chars")))
    n_langs = docs.select_columns(["lang"]).groupby("lang").count().count()
    n_sources = (docs.select_columns(["source"])
                 .groupby("source").count().count())
    from ferenda_ray.stages.dedup import exact_dedup
    n_distinct = exact_dedup(docs).count()
    return pa.table({
        "n_docs": pa.array([sums["n_docs"]], pa.int64()),
        "n_tokens": pa.array([sums["n_tokens"]], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "n_distinct_texts": pa.array([n_distinct], pa.int64()),
        "mean_chars": pa.array(
            [round(sums["sum_chars"] / sums["n_docs"], 4)],
            pa.float64())})


def docs_quality_filter(sf_dir: str, q: float = 0.25):
    """Adaptive quality gate: keep docs whose ``alpha_ratio`` reaches
    the corpus p25 — exact distributed quantile via the bounded-domain
    histogram (one groupby-sum over the 6-digit value domain)."""
    from ferenda_ray.stages.text_analysis import quality_percentile_filter
    return quality_percentile_filter(
        _read_docs(sf_dir, ["doc_id", "text"]), q=q)


def docs_bpe_encoded(sf_dir: str, num_merges: int = 10):
    """Tokenizer ENCODE over the corpus with merges trained on the
    same corpus (train → encode composition).  Rows-only BY DESIGN:
    greedy iterative merging is not SQL-expressible (see
    ``text_analysis.bpe_encode``); exactness is pytest-pinned against
    an independent reference encoder, and the oracle-checked exact
    twins are ``docs_bpe_pair_counts`` (train side) and
    ``docs_token_count`` (pre-tokenization side).  Emits counts, not
    the token sequences — the driver hashes values, and list columns
    are for downstream consumers."""
    from ferenda_ray.stages.text_analysis import bpe_encode, bpe_train
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, num_merges=num_merges)
    enc = bpe_encode(docs, merges)
    return enc.map_batches(
        lambda b: b.select(["doc_id", "n_words", "n_bpe_tokens"]),
        batch_format="pyarrow")


def docs_packed_sequences(sf_dir: str, seq_len: int = 1024):
    """Materialized GPT-style packed training sequences (concat in
    doc-id order, split every 1024 tokens): the write-side twin of
    ``docs_pack_offsets`` — full sequence TEXT equality vs the SQL
    fragment/window restatement."""
    from ferenda_ray.stages.text_analysis import pack_sequences
    return pack_sequences(_read_docs(sf_dir, ["doc_id", "text"]),
                          seq_len=seq_len)


def docs_normalize(sf_dir: str):
    """Unicode NFC + control-strip + whitespace-collapse + lowercase
    normalization (the oracled NFC instance of
    ``text_analysis.normalize_text``; NFKC is pytest-pinned)."""
    from ferenda_ray.stages.text_analysis import normalize_text
    return normalize_text(_read_docs(sf_dir, ["doc_id", "text"]),
                          form="NFC")


def docs_gopher_rules(sf_dir: str):
    """The published Gopher document-quality rule gate (Rae et al.
    2021): per-rule boolean flags + the measured statistics, exact
    vs the SQL restatement (thresholds compared on 6-digit rounded
    ratios on both sides)."""
    from ferenda_ray.stages.text_analysis import gopher_rules
    return gopher_rules(_read_docs(sf_dir, ["doc_id", "text"]))


def docs_train_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by salted md5
    fraction of the doc id."""
    from ferenda_ray.stages.sample import train_val_test_split
    return train_val_test_split(_read_docs(sf_dir, ["doc_id"]))


def docs_length_quantiles(sf_dir: str):
    """Per-language exact p25/p50/p95 of doc length via the grouped
    bounded-domain histogram (one groupby-sum over lang × length —
    no group ever materializes in a single task)."""
    from ferenda_ray.stages.text_analysis import grouped_bounded_quantiles
    return grouped_bounded_quantiles(
        _read_docs(sf_dir, ["lang", "n_chars"]), "lang", "n_chars")


def docs_training_mixture(sf_dir: str, budget: int = 1200):
    """The assembled TRAINING MIXTURE: train-split docs (salted md5
    80%) ∩ source-weighted mix (srcK keeps (K+1)/20) → per-language
    token-budget head over WHAT SURVIVED (the budget orders and cuts
    the filtered stream, exactly as a mixing pipeline would).  One
    composition of three oracle-checked sampling operators."""
    from ferenda_ray.stages.sample import token_budget_sample, weighted_mix
    docs = _read_docs(sf_dir, ["doc_id", "lang", "source", "text"])
    weights = {f"src{k}": (k + 1) / 20 for k in range(20)}
    mixed = weighted_mix(docs, weights)

    # keep only train rows (same rule as train_val_test_split): the
    # label is a pure function of the id, so filter in place — no
    # join needed
    def train_only(b: pa.Table) -> pa.Table:
        from ferenda_ray.stages.sample import _md5_int63
        hs = _md5_int63(f"{i}:split"
                        for i in b.column("doc_id").to_pylist())
        keep = pa.array([h % 1_000_000 < 800_000 for h in hs])
        return b.filter(keep)

    surviving = mixed.map_batches(train_only, batch_format="pyarrow")
    return token_budget_sample(surviving, budget=budget)


def docs_fingerprint_pairs(sf_dir: str, max_hamming: int = 1):
    """Banded-Hamming PAIR KERNEL under a SQL oracle (r4 verdict #5):
    the perceptual near-dup family (image pHash, audio fingerprint,
    video frame-pHash — ``stages/multimodal.py``) all routes through
    ``dedup.hamming_pairs64``; binary decode is not SQL-expressible,
    but the 64-bit pair kernel is.  Fingerprint = ``md5_number_lower
    (lang) XOR (1 << doc_id % 61)`` — deterministic on both sides, so
    same-lang docs sit at Hamming 0 (same flipped bit) or 2, and the
    ≤1 pair set is exactly the same-lang same-bit classes, checkable
    by a DuckDB ``bit_count(xor(...))`` cross join."""
    import numpy as np

    from ferenda_ray.stages.dedup import hamming_pairs64

    def fp(b: pa.Table) -> pa.Table:
        from ferenda_ray.stages.sample import md5_u64
        langs = b.column("lang").to_pylist()
        cache = {L: md5_u64(L) for L in set(langs)}
        base = np.fromiter((cache[L] for L in langs), dtype=np.uint64,
                           count=len(langs))
        ids = b.column("doc_id").to_numpy().astype(np.uint64)
        f = base ^ (np.uint64(1) << (ids % np.uint64(61)))
        return pa.table({"doc_id": b.column("doc_id"),
                         "fingerprint": pa.array(f, pa.uint64())})

    hashed = _read_docs(sf_dir, ["doc_id", "lang"]).map_batches(
        fp, batch_format="pyarrow", batch_size=8192)
    return hamming_pairs64(hashed, hash_col="fingerprint",
                           id_col="doc_id", max_hamming=max_hamming)


def kg_incremental(sf_dir: str, base: str = DEFAULT_BASE):
    """End-to-end INCREMENTAL KG maintenance — the 100-TB operational
    story (r4 verdict #4) as one driver-checkable query:

    1. An OLD corpus snapshot (documents minus the ``doc_id%10==0``
       rows; ``doc_id%10==5`` rows at an older 64-char text revision)
       is extracted and written to a doc-keyed partitioned triples
       sink (``sinks.write_partitioned``, key = ``doc_key``).
    2. ``dedup.corpus_diff(old, new)`` finds exactly the added/changed
       ids (content-sha join, nothing corpus-sized on the driver).
    3. ONLY those docs are re-extracted and
       ``sinks.upsert_partitioned`` into the sink — delta wins per
       doc key, so a changed doc's whole triple set is replaced;
       untouched buckets keep byte-identical shards
       (tests/test_kg_incremental.py).
    4. The sink read-back must equal a FULL rebuild over the current
       corpus — enforced by the oracle: the SQL side is the plain
       full-corpus ``doc_triples`` restatement.

    Reference semantics: ``needed()``-gated re-parse + re-relate
    (``documentstore.py:400-470``, ``documentrepository.py:1731-1883``)
    at corpus scale."""
    import os
    import shutil

    import polars as pl

    from ferenda_ray.stages import sinks
    from ferenda_ray.stages.dedup import corpus_diff

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    new_docs = _read_docs(sf_dir, cols)

    def make_old(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b)
              .filter(pl.col("doc_id") % 10 != 0)       # added later
              .with_columns(
                  pl.when(pl.col("doc_id") % 10 == 5)   # older revision
                  .then(pl.col("text").str.slice(0, 64))
                  .otherwise(pl.col("text")).alias("text")))
        return df.select(cols).to_arrow().cast(b.select(cols).schema)

    old_docs = new_docs.map_batches(make_old, batch_format="pyarrow")

    # fresh sink per run: a stale dir would make resume skip buckets
    # and the equality check meaningless
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/ferenda_ray_kginc_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    sinks.write_partitioned(
        _doc_triples_ds(old_docs, base, with_doc_key=True), out,
        key_col="doc_key", num_buckets=8,
        sort_by=["doc_key", "pred", "obj_value"])

    delta = corpus_diff(old_docs, new_docs)     # (doc_id, status)
    delta_ids = sorted(
        r["doc_id"] for r in delta.take_all()   # ≪ corpus by design
        if r["status"] in ("added", "changed"))
    id_set = pa.array(delta_ids, pa.int64())
    delta_docs = new_docs.map_batches(
        lambda b: b.filter(pc.is_in(b.column("doc_id"),
                                    value_set=id_set)),
        batch_format="pyarrow")
    sinks.upsert_partitioned(
        _doc_triples_ds(delta_docs, base, with_doc_key=True), out,
        key_col="doc_key")
    return sinks.read_partitioned(out).map_batches(
        lambda b: b.drop_columns(["doc_key"]), batch_format="pyarrow")


def docs_c4_rules(sf_dir: str):
    """The published C4 heuristic gate (Raffel et al. 2020 §2.2).
    The synthetic docs are single-line and punctuation-free, so —
    like ``code_secrets_scan``'s key injection — a deterministic
    ``doc_id % 13`` marker line is appended on BOTH sides (here and
    the SQL oracle) so every rule's branches carry rows at every
    tier; gates are tier-calibrated (≥1 sentence, ≥0.5 of lines
    terminal-punctuated)."""
    import polars as pl

    from ferenda_ray.stages.text_analysis import c4_rules

    def inject(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        m = pl.col("doc_id") % 13
        df = df.with_columns(
            pl.when(m == 1)
             .then(pl.col("text")
                   + pl.lit("\nLorem ipsum dolor sit amet."))
             .when(m == 3)
             .then(pl.col("text")
                   + pl.lit("\nfunction f() { return 1; }"))
             .when(m == 5)
             .then(pl.col("text")
                   + pl.lit("\nEnable javascript to continue"))
             .when(m == 7)
             .then(pl.col("text")
                   + pl.lit("\nSee our privacy policy for details."))
             .when(m == 9)
             .then(pl.col("text") + pl.lit("\nOne. Two. Three."))
             .otherwise(pl.col("text")).alias("text"))
        return df.to_arrow()

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow")
    return c4_rules(ds, min_sentences=1,
                    min_terminal_punct_frac=0.5)


def kg_entity_embeddings(sf_dir: str):
    """Per-entity mean embedding over the docs that mention it — the
    KG × vector-table composition (mention pairs hash-join the
    embeddings table on doc id; per-batch partial vector sums; one
    tiny (entity, dim) groupby).  Exploded (alias, n_docs, dim,
    value) rows, mean rounded half-away to 4."""
    import ray.data as rd

    from ferenda_ray.stages.similarity import group_mean_embedding

    pairs = doc_mentions(sf_dir).map_batches(
        lambda b: b.select(["doc_id", "alias"]),
        batch_format="pyarrow")
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return group_mean_embedding(pairs, emb)


def entity_cooccurrence(sf_dir: str, aliases: list | None = None):
    """Entity co-occurrence edges with PMI — the mention-graph
    analytics step after linking (edge weights for the entity graph).
    For every unordered alias pair: the number of docs mentioning
    BOTH, and ``pmi = log(N * n_ab / (n_a * n_b))`` rounded 6.

    Distributed shape: pairs emit INSIDE the per-batch scan (every
    alias flag for a doc is computed from that doc's row, so no
    shuffle precedes pair emission); one tiny ``(a, b)`` groupby;
    marginals are an ≤|aliases|-row reduce broadcast into the final
    map.  No joins, one exchange."""
    import math

    import polars as pl
    from ray.data.aggregate import Sum

    from ferenda_ray.stages.broadcast import resolve, stateful_map

    aliases = aliases or DOC_ALIASES

    def flags(b: pa.Table):
        df = pl.from_arrow(b.select(["doc_id", "text"]))
        return df.select(
            [pl.col("text").str.contains(rf"\b{a}\b").cast(pl.Int64)
             .alias(a) for a in aliases])

    def count_rows(b: pa.Table) -> pa.Table:
        # ONE corpus scan: the alias-flag matrix feeds both the pair
        # counts and the marginals, tagged apart by alias_b ("" =
        # marginal row) so a single groupby carries everything
        F = flags(b).to_numpy()              # docs x aliases, 0/1
        out_a, out_b, out_n = [], [], []
        for i, a in enumerate(aliases):
            for j in range(i + 1, len(aliases)):
                out_a.append(a)
                out_b.append(aliases[j])
                out_n.append(int((F[:, i] & F[:, j]).sum()))
        out_a += list(aliases) + ["__total__"]
        out_b += [""] * (len(aliases) + 1)
        out_n += [int(x) for x in F.sum(axis=0)] + [len(F)]
        return pa.table({"alias_a": pa.array(out_a, pa.string()),
                         "alias_b": pa.array(out_b, pa.string()),
                         "__n": pa.array(out_n, pa.int64())})

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    counts = (docs.map_batches(count_rows, batch_format="pyarrow")
              .groupby(["alias_a", "alias_b"])
              .aggregate(Sum("__n", alias_name="n_docs"))
              .materialize())
    marg = {r["alias_a"]: r["n_docs"] for r in counts.take_all()
            if r["alias_b"] == ""}
    pair_counts = counts.filter(expr="alias_b != ''")

    class Pmi:
        def __init__(self, ref):
            self.marg = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            b = b.filter(pc.greater(b.column("n_docs"), 0))
            N = self.marg["__total__"]
            a = b.column("alias_a").to_pylist()
            c = b.column("alias_b").to_pylist()
            n = b.column("n_docs").to_pylist()
            pmi = []
            for x, y, k in zip(a, c, n):
                v = math.log(N * k / (self.marg[x] * self.marg[y]))
                pmi.append(math.floor(abs(v) * 1e6 + 0.5) / 1e6
                           * (1 if v >= 0 else -1))
            return pa.table({
                "alias_a": b.column("alias_a"),
                "alias_b": b.column("alias_b"),
                "n_docs": b.column("n_docs"),
                "pmi": pa.array(pmi, pa.float64())})

    return stateful_map(pair_counts, Pmi, marg, batch_size=None)


def docs_weighted_sample(sf_dir: str, k: int = 50):
    """Exact-k length-weighted sample without replacement (A-Res on
    the seedless md5 uniform, weight = n_chars) — longer docs win
    proportionally more often, deterministically."""
    import polars as pl

    from ferenda_ray.stages.sample import weighted_reservoir_sample

    def add_w(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select(
            "doc_id",
            pl.col("text").str.len_chars().cast(pl.Int64)
            .alias("n_chars")).to_arrow()

    ds = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_w, batch_format="pyarrow")
    return weighted_reservoir_sample(ds, k=k, weight_col="n_chars")


def docs_dedup_report(sf_dir: str):
    """One-row corpus DEDUP-HEALTH report composing three
    oracle-checked legs: document count, docs sharing a byte-exact
    text (exact-dup group members), and VERIFIED near-dup pair count
    (the word-set-equality pairs ``docs_minhash_verified_dups``
    emits — exact, unlike the estimate-only candidate count) — the
    dataset-card duplication summary.  Each leg reduces to a scalar
    distributed (the dup-member total via a filtered ``sum``, never a
    per-text collect); only three numbers reach the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()
    # docs whose text occurs >1 times (group members, not survivors)
    sizes = (docs.map_batches(
        lambda b: pa.table({"text": b.column("text")}),
        batch_format="pyarrow")
        .groupby("text").aggregate(Count(alias_name="n")))
    n_exact_dup_docs = int(sizes.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 1)),
        batch_format="pyarrow").sum("n") or 0)
    n_near_pairs = docs_minhash_verified_dups(sf_dir).count()
    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_exact_dup_docs": pa.array([n_exact_dup_docs], pa.int64()),
        "n_neardup_pairs": pa.array([n_near_pairs], pa.int64())})


def docs_lang_confusion(sf_dir: str):
    """Language-ID confusion counts: (lang_true, lang_pred, n) —
    the classifier-quality matrix over the labeled corpus.  One
    scoring pass (the oracled ``language_id`` heuristic) joined to
    the label column in the SAME batch scan (labels ride along, no
    join), then one tiny groupby."""
    from ray.data.aggregate import Count

    from ferenda_ray.stages.text_analysis import _LANG_PROFILES

    def pair(b: pa.Table) -> pa.Table:
        # the language_id scoring kernel inline, with the true label
        # riding along (language_id's output drops non-key columns)
        preds = []
        for t in b.column("text").to_pylist():
            toks = t.lower().split()
            n = max(1, len(toks))
            best_lang, best = "und", 0.0
            for lang, prof in _LANG_PROFILES.items():
                s = sum(1 for w in toks if w in prof) / n
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
        return pa.table({"lang_true": b.column("lang"),
                         "lang_pred": pa.array(preds, pa.string())})

    return (_read_docs(sf_dir, ["lang", "text"])
            .map_batches(pair, batch_format="pyarrow",
                         batch_size=8192)
            .groupby(["lang_true", "lang_pred"])
            .aggregate(Count(alias_name="n")))


def docs_ngram_diversity(sf_dir: str):
    """Corpus n-gram diversity report (n = 1, 2, 3)."""
    from ferenda_ray.stages.text_analysis import ngram_diversity
    return ngram_diversity(_read_docs(sf_dir, ["text"]))
