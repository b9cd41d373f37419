"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already initialised),
runs each ``queries()[name](sf_dir)`` at sf=0.01 against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash).  Nothing here calls ``ray.init``/``shutdown``.

Round-5 surface: 152 queries, 146 with DuckDB oracles (counts asserted
in sync by ``tests/test_query_oracles.py::test_surface_counts``).  The
6 rows-only entries are approximate/iterative BY DESIGN (MinHash
estimate, probe-limited LSH ANN, int8-quantized ANN, iterative BPE
train AND encode, PCA eigendecomposition); each has an exactness
property verified in pytest instead, and each has an oracle-checked
exact twin covering the same code path end-to-end
(``docs_minhash_verified_dups``, ``ivf_ann_topk``, ``ann_topk``,
``docs_bpe_pair_counts`` ×2, ``embeddings_covariance``).  Entries past the driver's 50-entry
window are verified against the same oracles by
``tests/test_query_oracles.py`` (sf0.001, same column-sorted
order-insensitive compare).

Naming discipline: every computed column is named identically in the
Ray pipeline and the SQL; doubles are rounded identically on both
sides (money 2, ratios 6, cosines 4) so parallel-summation ulp noise
never flips the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

BASE = "https://example.org/"
_NS = {
    "type": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    "ident": "http://purl.org/dc/terms/identifier",
    "lang": "http://purl.org/dc/terms/language",
    "extent": "http://purl.org/dc/terms/extent",
    "sha": "https://ferenda-ray.dev/ns#contentSha256",
    "bibo_doc": "http://purl.org/ontology/bibo/Document",
}


def entry() -> Any:
    """Flagship on sf0.001: doc-level triple extraction + alias-mention
    linking over ``documents``, canonicalized (exact dedup) — a compact
    end-to-end pass of the KG constructor on driver data."""
    import pyarrow as pa
    from ferenda_ray.pipelines.docs import (
        DOC_ALIASES, doc_mentions, doc_triples, doc_uri_for)
    from ferenda_ray.stages.canonicalize import dedup_exact
    from ferenda_ray.uri import entity_uri

    sf_dir = "/root/testdata/sf0.001"
    triples = doc_triples(sf_dir)

    def widen(b: pa.Table) -> pa.Table:
        from ferenda_ray.schema import TRIPLES
        n = b.num_rows
        return pa.table({
            "subj": b.column("subj"), "pred": b.column("pred"),
            "obj_type": b.column("obj_type"),
            "obj_value": b.column("obj_value").cast(pa.large_string()),
            "obj_lang": pa.nulls(n, pa.string()),
            "obj_datatype": pa.nulls(n, pa.string()),
            "graph": pa.array([BASE + "dataset/documents"] * n, pa.string()),
            "src_repo": pa.nulls(n, pa.string()),
            "src_path": pa.nulls(n, pa.string()),
        }, schema=TRIPLES)

    def mentions_as_triples(b: pa.Table) -> pa.Table:
        from ferenda_ray.schema import TRIPLES
        n = b.num_rows
        return pa.table({
            "subj": pa.array([f"{BASE}res/doc/{d}" for d in
                              b.column("doc_id").to_pylist()], pa.string()),
            "pred": pa.array(
                ["http://purl.org/dc/terms/subject"] * n, pa.string()),
            "obj_type": pa.array(["uri"] * n, pa.string()),
            "obj_value": pa.array(
                [entity_uri(a) for a in b.column("alias").to_pylist()],
                pa.large_string()),
            "obj_lang": pa.nulls(n, pa.string()),
            "obj_datatype": pa.nulls(n, pa.string()),
            "graph": pa.array([BASE + "dataset/documents"] * n, pa.string()),
            "src_repo": pa.nulls(n, pa.string()),
            "src_path": pa.nulls(n, pa.string()),
        }, schema=TRIPLES)

    wide = triples.map_batches(widen, batch_format="pyarrow")
    ment = doc_mentions(sf_dir).map_batches(mentions_as_triples,
                                            batch_format="pyarrow")
    return dedup_exact(wide.union(ment))


def queries() -> dict[str, Callable[[str], Any]]:
    from ferenda_ray.pipelines import code, docs, events, relational

    def _synth_canon(sf_dir: str):
        """Canonical triples of the pipeline-built synthetic KG (the
        shared leg of the kg_* queries): ensure the tier's corpus
        cache, then run build_kg over it.  ONE copy of the cache +
        build boilerplate; the sf→size mapping is code._tier_n."""
        import os
        import pyarrow.parquet as pq
        import ray.data as rd
        from ferenda_ray.corpus import CorpusSpec, write_corpus
        from ferenda_ray.pipelines.code import _tier_n
        from ferenda_ray.pipelines.kg import build_kg
        cache = f"/tmp/ferenda_ray_corpus_{_tier_n(sf_dir)}"
        if not os.path.exists(os.path.join(cache, "sources.parquet")):
            write_corpus(CorpusSpec(n_files=_tier_n(sf_dir)), cache)
        return build_kg(
            rd.read_parquet(os.path.join(cache, "sources.parquet")),
            aliases=pq.read_table(os.path.join(cache, "aliases.parquet")),
            sameas=pq.read_table(os.path.join(cache, "sameas.parquet")),
            vocab=pq.read_table(os.path.join(cache,
                                             "vocab_triples.parquet")))

    def kg_pipeline_synthetic(sf_dir: str):
        """Full 4-stage KG pipeline on the deterministic synthetic code
        corpus (size keyed to sf via a /tmp cache).  ORACLE-CHECKED:
        the generator's golden ``expected_triples`` parquet is the
        DuckDB side (read_parquet in the SQL), and the pipeline output
        (canonicalized + exact-deduped) must hash-match it exactly."""
        canon = _synth_canon(sf_dir)
        cols = ["subj", "pred", "obj_type", "obj_value", "obj_lang",
                "obj_datatype"]
        return canon.map_batches(lambda b: b.select(cols),
                                 batch_format="pyarrow")

    def kg_predicate_profile(sf_dir: str):
        """Per-predicate profile of the PIPELINE-built KG (property
        profiling: counts, distinct subjects/objects, functional
        flag).  The oracle profiles the generator's golden triples —
        the comparison holds exactly because the flagship output
        hash-matches the goldens."""
        from ferenda_ray.pipelines.kg import predicate_profile
        return predicate_profile(_synth_canon(sf_dir))

    def kg_required_predicates(sf_dir: str):
        """Soft-validation parity with the reference's
        required_predicates warning (documentrepository.py:745):
        (subj, missing_pred) rows over the pipeline-built KG —
        dcterms:title is universal (0 rows), dcterms:subject is
        sparse (most docs flagged), so both branches carry weight."""
        from ferenda_ray.pipelines.kg import (
            required_predicate_violations)
        canon = _synth_canon(sf_dir)
        return required_predicate_violations(
            canon, required=("http://purl.org/dc/terms/title",
                             "http://purl.org/dc/terms/subject"))

    def kg_type_predicate_matrix(sf_dir: str):
        """Class/property usage matrix of the pipeline-built KG
        (schema discovery): (type, pred, n_subjects)."""
        from ferenda_ray.pipelines.kg import type_predicate_matrix
        return type_predicate_matrix(_synth_canon(sf_dir))

    def kg_entity_mention_stats(sf_dir: str):
        """Entity popularity after linking + canonicalization
        (mention triples, distinct docs, label per entity)."""
        from ferenda_ray.pipelines.kg import entity_mention_stats
        return entity_mention_stats(_synth_canon(sf_dir))

    # ORDER MATTERS: the driver's correctness harness verifies only the
    # FIRST 50 entries (dict order).  Round-5 rotation (round-4 verdict
    # #1): the window now holds (a) the flagship pair + the two queries
    # NEW this round (kg_incremental, docs_fingerprint_pairs), (b)
    # every query whose IMPLEMENTATION changed this round (the
    # embedding-neardup plan pick, the events combiner/prefix-sum
    # rewrites, the sharded as-of join, the minhash_clusters
    # delegation), (c) the ~26 round-4 operators that had never had a
    # driver-green row (near-dup resolution, token-budget mixing,
    # clean_corpus_v2/training_mixture, BPE pair counts, logreg,
    # covariance, quality gates, sampling family), and (d) a core
    # spine of long-stable queries (q1, facets, exact dedup, BM25,
    # minhash/jaccard/simhash pairs, sessionize, tumbling) so a
    # regression in shared plumbing still trips the driver.  Everything
    # displaced was driver-green in rounds 1-4.  EVERY entry past
    # position 50 is verified per-commit against its oracle_sql() via
    # DuckDB at sf0.001 by tests/test_query_oracles.py
    # (window-position-agnostic), so rotation never leaves a query
    # unchecked.
    def kg_annotations(sf_dir: str):
        """The reference's ``annotations.rq`` CONSTRUCT (per-document
        annotation graph: isPartOf* closure + inbound-reference
        resolution) over the synthetic-corpus golden triples, expressed
        through the composable BGP operator (stages/bgp.py +
        pipelines/derived.annotations_graph).  ORACLE-CHECKED against a
        DuckDB recursive-CTE restatement of the same SPARQL."""
        import os
        import ray.data as rd
        from ferenda_ray.corpus import CorpusSpec, write_corpus
        from ferenda_ray.pipelines.derived import annotations_graph
        n = 200 if "0.001" in sf_dir else (400 if "0.01" in sf_dir else 1200)
        cache = f"/tmp/ferenda_ray_corpus_{n}"
        if not os.path.exists(os.path.join(cache, "sources.parquet")):
            write_corpus(CorpusSpec(n_files=n), cache)
        tri = rd.read_parquet(os.path.join(cache, "expected_triples.parquet"))
        return annotations_graph(tri)

    return {
        # ---------------- DRIVER WINDOW (first 50) ----------------
        # --- flagship KG pipeline (synthetic corpus, golden-oracled) ---
        "kg_pipeline_synthetic": kg_pipeline_synthetic,
        "kg_annotations": kg_annotations,
        # --- NEW this round ---
        "kg_incremental": docs.kg_incremental,
        "docs_fingerprint_pairs": docs.docs_fingerprint_pairs,
        "docs_incremental_neardup": docs.docs_incremental_neardup,
        # --- NEW session 3: code-corpus hygiene over the north-rule
        # input shape (repo, path, commit, lang, content); oracles
        # recompute from raw sources.parquet, independent of the
        # generator's goldens.  In-window by necessity: their oracle
        # SQL reads the sf0.01 corpus cache path ---
        "code_stack_filters": code.code_stack_filters,
        "code_comment_stats": code.code_comment_stats,
        "code_repo_comment_rollup": code.code_repo_comment_rollup,
        "code_xref_edges": code.code_xref_edges,
        "code_xref_degrees": code.code_xref_degrees,
        # --- implementation changed this round: kept/promoted in-window ---
        "embeddings_neardup": docs.embeddings_neardup,  # plan pick
        "docs_minhash_clusters": docs.docs_minhash_clusters,  # delegation
        "events_latest_per_type": events.latest_per_type,   # combiner
        "events_feed_pages": events.feed_pages,         # prefix-sum rank
        "events_value_percentiles": events.value_percentiles,  # histogram
        "events_asof_hourly": events.asof_hourly_share,  # sharded as-of
        "events_hourly_active_users": events.hourly_active_users,
        "events_top_values_ties": events.top_values_with_ties,
        # --- round-4 operators never driver-checked before: promoted ---
        "docs_neardup_clusters": docs.docs_neardup_clusters,
        "docs_dedup_keep_best": docs.docs_dedup_keep_best,
        "docs_token_budget": docs.docs_token_budget,
        "docs_weighted_mix": docs.docs_weighted_mix,
        "docs_clean_corpus_v2": docs.docs_clean_corpus_v2,
        "docs_training_mixture": docs.docs_training_mixture,
        "docs_tfidf_top_terms": docs.docs_tfidf_top_terms,
        "docs_chunks": docs.docs_chunks,
        "docs_pack_offsets": docs.docs_pack_offsets,
        "docs_packed_sequences": docs.docs_packed_sequences,
        "docs_bpe_pair_counts": docs.docs_bpe_pair_counts,
        "docs_snapshot_diff": docs.docs_snapshot_diff,
        "embeddings_covariance": docs.embeddings_covariance,
        "embeddings_logreg": docs.embeddings_logreg,
        "embeddings_logreg_scores": docs.embeddings_logreg_scores,
        "docs_quality_filter": docs.docs_quality_filter,
        "docs_gopher_rules": docs.docs_gopher_rules,
        "docs_normalize": docs.docs_normalize,
        "docs_train_split": docs.docs_train_split,
        "docs_fuzzy_decontaminate": docs.docs_fuzzy_decontaminate,
        "docs_moore_lewis": docs.docs_moore_lewis,
        "events_user_zscore": events.user_zscore_outliers,
        "events_user_ewma": events.user_value_ewma,
        "docs_corpus_stats": docs.docs_corpus_stats,
        "docs_length_quantiles": docs.docs_length_quantiles,
        "docs_stratified_sample": docs.docs_stratified_sample,
        "embeddings_quantized": docs.embeddings_quantized,
        "embeddings_semdedup": docs.embeddings_semdedup,
        "events_cumulative_users": events.cumulative_users,
        # --- round-5 additions (never driver-verified) ---
        "docs_segment_dup_stats": docs.docs_segment_dup_stats,
        "docs_remove_common_segments": docs.docs_remove_common_segments,
        "docs_segments_keep_first": docs.docs_segments_keep_first,
        # ---------------- position >50 below: rotated OUT this round
        # (driver-green in rounds 1-4); every oracled entry here is
        # verified per-commit by tests/test_query_oracles.py.  The
        # core spine (jaccard/simhash/sessionize/tumbling, q1,
        # doc_facets, exact_dedup, doc_triples, search_bm25,
        # minhash_verified_dups) leads this section — 3+ green driver
        # rounds each. -------------------------------------------------
        "docs_jaccard_pairs": docs.docs_jaccard_pairs,
        "docs_simhash_pairs": docs.docs_simhash_pairs,
        "events_sessionize": events.sessionize,
        "events_tumbling_hour": events.tumbling_hour,
        "doc_triples": docs.doc_triples,
        "docs_search_bm25": docs.docs_search_bm25,
        "docs_minhash_verified_dups": docs.docs_minhash_verified_dups,
        "embeddings_label_count": docs.embeddings_label_count,
        "embeddings_knn_graph": docs.embeddings_knn_graph,
        "docs_epoch_shards": docs.docs_epoch_shards,
        "doc_mentions": docs.doc_mentions,
        "docs_clean_corpus": docs.docs_clean_corpus,
        "ann_topk": docs.ann_topk,
        "ivf_ann_topk": docs.ivf_ann_topk,    # full-probe => exact, oracled
        "lsh_ann_topk": docs.lsh_ann_topk,                  # rows-only
        "doc_bgp_select": docs.doc_bgp_select,
        "doc_facets_long": docs.doc_facets_long,
        "q3_top_orders": relational.q3_top_orders,
        "nation_revenue": relational.nation_revenue,
        "customer_order_stats": relational.customer_order_stats,
        "doc_annotations": docs.doc_annotations,
        "docs_quality": docs.docs_quality,
        "docs_repetition": docs.docs_repetition,
        "docs_decontaminate": docs.docs_decontaminate,
        "docs_pii_scrub": docs.docs_pii_scrub,
        "doc_skeletons": docs.doc_skeletons,
        "docs_minhash_pairs": docs.docs_minhash_pairs,      # rows-only
        "docs_legal_refs": docs.docs_legal_refs,
        "docs_citation_roles": docs.docs_citation_roles,
        "docs_dup_ngrams": docs.docs_dup_ngrams,
        "docs_remove_dup_spans": docs.docs_remove_dup_spans,
        "docs_perplexity": docs.docs_perplexity,
        "docs_top_tokens": docs.docs_top_tokens,
        "embeddings_kmeans": docs.embeddings_kmeans,
        "events_range_pairs": events.range_pairs_5m,
        "events_value_hour_corr": events.value_hour_correlation,
        "events_type_hour_rollup": events.type_hour_rollup,
        "events_top_users": events.top_users_by_value,
        "events_frontpage_latest": events.frontpage_latest,
        "events_hopping_15m": events.hopping_15m_of_hour,
        "events_rolling_avg": events.rolling_user_avg,
        "events_latest_value_per_user": events.latest_value_per_user,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "doc_facets": docs.doc_facets,          # via faceted_data_bgp
        "docs_exact_dedup": docs.docs_exact_dedup,
        "top_parts_by_revenue": relational.top_parts_by_revenue,
        "distinct_segments": relational.distinct_segments,
        "order_priority_count": relational.order_priority_count,
        "supplier_acctbal_by_nation": relational.supplier_acctbal_by_nation,
        "customers_without_orders": relational.customers_without_orders,
        "language_stats": docs.language_stats,
        "ann_topk_int8": docs.ann_topk_int8,            # rows-only
        "docs_bpe_merges": docs.docs_bpe_merges,        # rows-only
        "docs_bpe_encoded": docs.docs_bpe_encoded,      # rows-only
        "embeddings_pca": docs.embeddings_pca,   # rows-only: eigh is
        # not SQL-expressible; its covariance INPUT is the oracle-
        # checked exact twin and the decomposition is pytest-verified
        "docs_fingerprints": docs.docs_fingerprints,
        "docs_dsir": docs.docs_dsir,
        # corpus-backed past-window entries: tests/test_query_oracles
        # rewrites the oracle's corpus_400 path to the sf0.001 cache
        "code_xref_components": code.code_xref_components,
        "code_xref_pagerank": code.code_xref_pagerank,
        "code_symbols": code.code_symbols,
        "code_imports": code.code_imports,
        "code_symbol_stats": code.code_symbol_stats,
        "code_symbol_triples": code.code_symbol_triples,
        "code_secrets_scan": code.code_secrets_scan,
        "code_dedup_keep_best": code.code_dedup_keep_best,
        "code_complexity": code.code_complexity,
        "code_symbols_incremental": code.code_symbols_incremental,
        "code_neardup_files": code.code_neardup_files,
        "code_repo_summary": code.code_repo_summary,
        "code_commit_diff": code.code_commit_diff,
        "code_license_scan": code.code_license_scan,
        "code_repo_license": code.code_repo_license,
        "docs_c4_rules": docs.docs_c4_rules,
        "kg_entity_embeddings": docs.kg_entity_embeddings,
        "kg_entity_cooccurrence": docs.entity_cooccurrence,
        "code_triangles": code.code_triangles,
        "docs_weighted_sample": docs.docs_weighted_sample,
        "code_normalized_dups": code.code_normalized_dups,
        "code_xref_ppr": code.code_xref_ppr,
        "events_funnel": events.funnel_steps,
        "kg_predicate_profile": kg_predicate_profile,
        "kg_required_predicates": kg_required_predicates,
        "kg_type_predicate_matrix": kg_type_predicate_matrix,
        "kg_entity_mention_stats": kg_entity_mention_stats,
        "events_cohort_retention": events.cohort_retention,
        "events_conversion_lag": events.conversion_lag,
        "docs_dedup_report": docs.docs_dedup_report,
        "docs_language_id": docs.docs_language_id,
        "docs_lang_confusion": docs.docs_lang_confusion,
        "docs_ngram_diversity": docs.docs_ngram_diversity,
        "doc_entity_pagerank": docs.doc_entity_pagerank,
        "docs_distinct": docs.docs_distinct,
        "doc_toc_pages": docs.doc_toc_pages,
        "doc_toc_entries": docs.doc_toc_entries,
        "doc_stats": docs.doc_stats,
        "doc_keyword_hub": docs.doc_keyword_hub,
        "docs_search": docs.docs_search,
        "docs_search_paged": docs.docs_search_paged,
        "docs_sample": docs.docs_sample,
        "docs_token_count": docs.docs_token_count,
        "event_type_share": events.event_type_share,
        "events_value_histogram": events.value_histogram,
    }


def oracle_sql() -> dict[str, str]:
    # the KG golden parquet must exist before DuckDB reads it: the
    # generator is pure Python/pyarrow (no Ray), cheap at n=400
    import os
    kg_cache = "/tmp/ferenda_ray_corpus_400"
    if not os.path.exists(os.path.join(kg_cache, "expected_triples.parquet")):
        from ferenda_ray.corpus import CorpusSpec, write_corpus
        write_corpus(CorpusSpec(n_files=400), kg_cache)
    # the license-injected corpus copy DuckDB reads must exist even if
    # the oracle runs before the Ray query (pure pyarrow, no Ray)
    from ferenda_ray.pipelines.code import ensure_lic_cache
    lic_parquet = ensure_lic_cache("/root/testdata/sf0.01")

    # first-match-wins license CASE over the header probe — the SAME
    # ordered literals as code_quality.LICENSE_PATTERNS
    lic_case = """CASE
              WHEN contains(head, 'SPDX-License-Identifier: MIT')
                THEN 'MIT'
              WHEN contains(head, 'SPDX-License-Identifier: Apache-2.0')
                THEN 'Apache-2.0'
              WHEN contains(head, 'SPDX-License-Identifier: GPL-3.0-only')
                THEN 'GPL-3.0-only'
              WHEN contains(head, 'SPDX-License-Identifier: BSD-3-Clause')
                THEN 'BSD-3-Clause'
              WHEN contains(head, 'SPDX-License-Identifier: MPL-2.0')
                THEN 'MPL-2.0'
              WHEN contains(head, 'MIT License') THEN 'MIT'
              WHEN contains(head, 'Apache License, Version 2.0')
                THEN 'Apache-2.0'
              WHEN contains(head, 'GNU General Public License')
                THEN 'GPL-3.0-only'
              WHEN contains(head, 'BSD 3-Clause License')
                THEN 'BSD-3-Clause'
              WHEN contains(head, 'Mozilla Public License')
                THEN 'MPL-2.0'
              ELSE 'none' END"""

    uri = "'https://example.org/res/' || source || '/' || doc_id"
    mention_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{a}' AS alias, "
        f"CAST(len(regexp_extract_all(text, '\\b{a}\\b')) AS BIGINT) AS n "
        f"FROM documents "
        f"WHERE len(regexp_extract_all(text, '\\b{a}\\b')) > 0"
        for a in ["batch", "shuffle", "spark", "stream", "vector", "window"])
    # entity co-occurrence: 0/1 mention flags per alias, pair legs and
    # per-side marginal CASE lookups generated over the SAME alias list
    _aliases = ["batch", "shuffle", "spark", "stream", "vector",
                "window"]
    _flag_cols = ", ".join(
        f"(CASE WHEN regexp_matches(text, '\\b{a}\\b') "
        f"THEN 1 ELSE 0 END) AS f_{a}" for a in _aliases)
    _marg_cols = ", ".join(f"CAST(SUM(f_{a}) AS BIGINT) AS n_{a}"
                           for a in _aliases)
    _pair_legs = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS alias_a, '{b}' AS alias_b, "
        f"CAST(SUM(f_{a} * f_{b}) AS BIGINT) AS n_docs FROM fl"
        for i, a in enumerate(_aliases) for b in _aliases[i + 1:])

    def _marg_case(side: str) -> str:
        whens = " ".join(f"WHEN '{a}' THEN tot.n_{a}"
                         for a in _aliases)
        return f"(CASE p.{side} {whens} END)"

    cooccur_sql = f"""
        WITH fl AS (SELECT {_flag_cols} FROM documents),
        tot AS (SELECT count(*) AS N, {_marg_cols} FROM fl),
        p AS ({_pair_legs})
        SELECT p.alias_a, p.alias_b, p.n_docs,
               round(ln(tot.N * p.n_docs * 1.0
                        / ({_marg_case('alias_a')}
                           * {_marg_case('alias_b')})), 6) AS pmi
        FROM p, tot WHERE p.n_docs > 0"""

    stop_re = r"(?i)\b(?:a|and|for|in|is|it|of|that|the|to)\b"
    _GOPHER_STOP_SQL = " + ".join(
        f"(CASE WHEN regexp_matches(text, '(?i)\\b{w}\\b') "
        "THEN 1 ELSE 0 END)"
        for w in ["the", "be", "to", "of", "and", "that", "have",
                  "with"])
    d = {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus""",
        "q3_top_orders": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
                     l_orderkey
            LIMIT 10""",
        "nation_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "top_parts_by_revenue": """
            SELECT l_partkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   any_value(p_name) AS p_name
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY l_partkey
            ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_partkey
            LIMIT 10""",
        "distinct_segments":
            "SELECT DISTINCT c_mktsegment FROM customer",
        "order_priority_count": """
            SELECT o_orderpriority, count(*) AS n
            FROM orders GROUP BY o_orderpriority""",
        "customer_order_stats": """
            SELECT c_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_spent
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_name""",
        "supplier_acctbal_by_nation": """
            SELECT n_name, round(avg(s_acctbal), 2) AS avg_acctbal,
                   count(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name""",
        "events_tumbling_hour": """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, 2""",
        "events_sessionize": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT user_id,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked
            ), per AS (
                SELECT user_id, sid, count(*) AS c
                FROM sess GROUP BY user_id, sid
            )
            SELECT user_id,
                   CAST(max(sid) AS BIGINT) AS n_sessions,
                   CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(max(c) AS BIGINT) AS max_session_events
            FROM per GROUP BY user_id""",
        "events_top_users": """
            SELECT user_id, round(sum(value), 2) AS total_value,
                   count(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY sum(value) DESC, user_id LIMIT 20""",
        "event_type_share": """
            SELECT event_type, count(*) AS n,
                   round(CAST(count(*) AS DOUBLE)
                         / (SELECT count(*) FROM events), 6) AS share
            FROM events GROUP BY event_type""",
        "doc_triples": f"""
            SELECT {uri} AS subj, '{_NS["type"]}' AS pred,
                   'uri' AS obj_type, '{_NS["bibo_doc"]}' AS obj_value
            FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["ident"]}', 'literal',
                   CAST(doc_id AS VARCHAR) FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["lang"]}', 'literal', lang FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["extent"]}', 'literal',
                   CAST(n_chars AS VARCHAR) FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["sha"]}', 'literal', sha256(text)
            FROM documents""",
        # incremental delta-rebuild must equal the FULL rebuild: the
        # oracle is the plain full-corpus doc_triples restatement
        "kg_incremental": f"""
            SELECT {uri} AS subj, '{_NS["type"]}' AS pred,
                   'uri' AS obj_type, '{_NS["bibo_doc"]}' AS obj_value
            FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["ident"]}', 'literal',
                   CAST(doc_id AS VARCHAR) FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["lang"]}', 'literal', lang FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["extent"]}', 'literal',
                   CAST(n_chars AS VARCHAR) FROM documents
            UNION ALL
            SELECT {uri}, '{_NS["sha"]}', 'literal', sha256(text)
            FROM documents""",
        # --- code-corpus hygiene: every oracle recomputes its
        # statistics from the RAW sources.parquet (the north-rule
        # input table), so the SQL side shares nothing with the
        # operator or the generator's goldens.  Thresholds 92/32/0.72
        # are corpus-calibrated so both branches of every flag carry
        # rows (published Stack defaults are the operator's own
        # defaults; pipelines/code.py docstring) ---
        "code_stack_filters": f"""
            WITH f AS (
              SELECT repo, path, lang, content,
                     string_split(content, chr(10)) AS ls
              FROM read_parquet('{kg_cache}/sources.parquet')),
            s AS (
              SELECT repo, path, lang,
                     len(ls) AS n_lines,
                     list_max(list_transform(ls, x -> len(x)))
                       AS max_line_len,
                     round(list_sum(list_transform(ls, x -> len(x)))
                           * 1.0 / greatest(len(ls), 1), 6)
                       AS avg_line_len,
                     round(len(regexp_replace(content, '[^A-Za-z0-9]',
                                              '', 'g')) * 1.0
                           / greatest(len(content), 1), 6)
                       AS alnum_frac,
                     regexp_matches(substr(content, 1, 300),
                       '(?i)auto-?generated|generated by|do not edit')
                       AS is_autogen
              FROM f)
            SELECT repo, path, lang, n_lines, max_line_len,
                   avg_line_len, alnum_frac, is_autogen,
                   max_line_len <= 92 AS pass_max_line,
                   avg_line_len <= 32.0 AS pass_avg_line,
                   alnum_frac >= 0.72 AS pass_alnum,
                   (max_line_len <= 92 AND avg_line_len <= 32.0
                    AND alnum_frac >= 0.72 AND NOT is_autogen)
                     AS passes_stack
            FROM s""",
        "code_comment_stats": f"""
            WITH f AS (
              SELECT repo, path, lang,
                     string_split(content, chr(10)) AS ls
              FROM read_parquet('{kg_cache}/sources.parquet')),
            s AS (
              SELECT repo, path, lang, len(ls) AS n_lines,
                     len(list_filter(ls,
                         x -> regexp_matches(x, '^\\s*$')))
                       AS blank_lines,
                     CASE
                       WHEN lang = 'python' THEN len(list_filter(ls,
                            x -> regexp_matches(x, '^\\s*#')))
                       WHEN lang IN ('go', 'java')
                         THEN len(list_filter(ls,
                            x -> regexp_matches(x, '^\\s*//')))
                       ELSE 0 END AS comment_lines
              FROM f)
            SELECT repo, path, lang, n_lines, blank_lines,
                   comment_lines,
                   n_lines - blank_lines - comment_lines AS code_lines,
                   round(comment_lines * 1.0
                         / greatest(n_lines - blank_lines, 1), 6)
                     AS comment_frac
            FROM s""",
        "code_repo_comment_rollup": f"""
            WITH f AS (
              SELECT repo, lang, string_split(content, chr(10)) AS ls
              FROM read_parquet('{kg_cache}/sources.parquet')),
            s AS (
              SELECT repo, len(ls) AS n_lines,
                     len(list_filter(ls,
                         x -> regexp_matches(x, '^\\s*$')))
                       AS blank_lines,
                     CASE
                       WHEN lang = 'python' THEN len(list_filter(ls,
                            x -> regexp_matches(x, '^\\s*#')))
                       WHEN lang IN ('go', 'java')
                         THEN len(list_filter(ls,
                            x -> regexp_matches(x, '^\\s*//')))
                       ELSE 0 END AS comment_lines
              FROM f)
            SELECT repo, count(*) AS n_files,
                   CAST(SUM(n_lines) AS BIGINT) AS total_lines,
                   CAST(SUM(comment_lines) AS BIGINT) AS total_comment,
                   CAST(SUM(blank_lines) AS BIGINT) AS total_blank,
                   round(SUM(comment_lines) * 1.0
                         / greatest(SUM(n_lines) - SUM(blank_lines),
                                    1), 6) AS comment_frac
            FROM s GROUP BY repo""",
        "code_license_scan": f"""
            WITH f AS (
              SELECT repo, path, lang,
                     substr(content, 1, 512) AS head
              FROM read_parquet('{lic_parquet}')),
            s AS (
              SELECT repo, path, lang, {lic_case} AS license
              FROM f)
            SELECT repo, path, lang, license,
                   CASE WHEN license IN ('MIT', 'Apache-2.0',
                                         'BSD-3-Clause')
                          THEN 'permissive'
                        WHEN license IN ('GPL-3.0-only', 'MPL-2.0')
                          THEN 'copyleft'
                        ELSE 'unknown' END AS license_family,
                   license IN ('MIT', 'Apache-2.0', 'BSD-3-Clause')
                     AS is_permissive
            FROM s""",
        "code_repo_license": f"""
            WITH f AS (
              SELECT repo, substr(content, 1, 512) AS head
              FROM read_parquet('{lic_parquet}')),
            s AS (SELECT repo, {lic_case} AS license FROM f)
            SELECT repo, count(*) AS n_files,
                   CAST(SUM(CASE WHEN license IN ('MIT', 'Apache-2.0',
                                                  'BSD-3-Clause')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_permissive,
                   CAST(SUM(CASE WHEN license IN ('GPL-3.0-only',
                                                  'MPL-2.0')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_copyleft,
                   CAST(SUM(CASE WHEN license = 'none'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unknown,
                   SUM(CASE WHEN license IN ('GPL-3.0-only', 'MPL-2.0')
                            THEN 1 ELSE 0 END) = 0 AS train_ok
            FROM s GROUP BY repo""",
        "code_xref_edges": f"""
            SELECT repo, path,
                   unnest(regexp_extract_all(content,
                     'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                     1)) AS dst_repo,
                   unnest(regexp_extract_all(content,
                     'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                     2)) AS dst_path
            FROM read_parquet('{kg_cache}/sources.parquet')""",
        # incremental code-table maintenance: snapshot diff keyed by
        # the repo:path node (added / changed / removed)
        "code_commit_diff": f"""
            WITH newt AS (
              SELECT repo || ':' || path AS file, content,
                     CAST(regexp_extract(path, 'mod_(\\d+)', 1)
                          AS INT) AS o
              FROM read_parquet('{kg_cache}/sources.parquet')),
            oldt AS (
              SELECT file,
                     CASE WHEN o % 10 = 5 THEN substr(content, 1, 64)
                          ELSE content END AS content
              FROM newt WHERE o % 10 != 0
              UNION ALL SELECT 'org0/repo0:ghost.py', 'gone'),
            d AS (
              SELECT COALESCE(n.file, o.file) AS file,
                     CASE WHEN o.file IS NULL THEN 'added'
                          WHEN n.file IS NULL THEN 'removed'
                          WHEN n.content != o.content THEN 'changed'
                          END AS status
              FROM newt n FULL OUTER JOIN oldt o ON n.file = o.file)
            SELECT file, status FROM d WHERE status IS NOT NULL""",
        # per-repo dashboard: three oracle-checked legs composed
        # (comment rollup + Stack pass rate + lang counts)
        "code_repo_summary": f"""
            WITH f AS (
              SELECT repo, path, lang, content,
                     string_split(content, chr(10)) AS ls
              FROM read_parquet('{kg_cache}/sources.parquet')),
            s AS (
              SELECT repo, lang, len(ls) AS n_lines,
                     len(list_filter(ls,
                         x -> regexp_matches(x, '^\\s*$')))
                       AS blank_lines,
                     CASE
                       WHEN lang = 'python' THEN len(list_filter(ls,
                            x -> regexp_matches(x, '^\\s*#')))
                       WHEN lang IN ('go', 'java')
                         THEN len(list_filter(ls,
                            x -> regexp_matches(x, '^\\s*//')))
                       ELSE 0 END AS comment_lines,
                     list_max(list_transform(ls, x -> len(x))) AS mll,
                     round(list_sum(list_transform(ls, x -> len(x)))
                           * 1.0 / greatest(len(ls), 1), 6) AS all_,
                     round(len(regexp_replace(content, '[^A-Za-z0-9]',
                                              '', 'g')) * 1.0
                           / greatest(len(content), 1), 6) AS af,
                     regexp_matches(substr(content, 1, 300),
                       '(?i)auto-?generated|generated by|do not edit')
                       AS ag
              FROM f)
            SELECT repo, count(*) AS n_files,
                   count(*) FILTER (WHERE lang = 'python') AS n_python,
                   count(*) FILTER (WHERE lang = 'java') AS n_java,
                   count(*) FILTER (WHERE lang = 'go') AS n_go,
                   count(*) FILTER (WHERE lang = 'markdown')
                     AS n_markdown,
                   CAST(SUM(n_lines) AS BIGINT) AS total_lines,
                   round(SUM(comment_lines) * 1.0
                         / greatest(SUM(n_lines) - SUM(blank_lines),
                                    1), 6) AS comment_frac,
                   round(SUM(CASE WHEN mll <= 92 AND all_ <= 32.0
                                  AND af >= 0.72 AND NOT ag
                             THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                     AS stack_pass_rate
            FROM s GROUP BY repo""",
        # near-dup files: identifier-token Jaccard >= 0.6 through the
        # PPJoin kernel; file ids = md5_number_lower(repo:path) int63
        "code_neardup_files": f"""
            WITH w AS (
              SELECT CAST(md5_number_lower(repo || ':' || path)
                          & 9223372036854775807 AS BIGINT) AS file_id,
                     list_distinct(regexp_extract_all(content,
                                                      '[A-Za-z0-9_]+'))
                       AS words
              FROM read_parquet('{kg_cache}/sources.parquet'))
            SELECT a.file_id AS id_a, b.file_id AS id_b,
                   round(CAST(len(list_intersect(a.words, b.words))
                              AS DOUBLE)
                         / len(list_distinct(a.words || b.words)), 6)
                     AS jaccard
            FROM w a JOIN w b ON a.file_id < b.file_id
            WHERE CAST(len(list_intersect(a.words, b.words))
                       AS DOUBLE)
                  / len(list_distinct(a.words || b.words)) >= 0.6""",
        "code_xref_components": f"""
            WITH RECURSIVE e0 AS (
              SELECT repo || ':' || path AS src,
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       1)) || ':' ||
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       2)) AS dst
              FROM read_parquet('{kg_cache}/sources.parquet')),
            e AS (SELECT src, dst FROM e0
                  UNION SELECT dst, src FROM e0),
            n AS (SELECT DISTINCT node FROM (
                    SELECT repo || ':' || path AS node
                    FROM read_parquet('{kg_cache}/sources.parquet')
                    UNION ALL SELECT src FROM e
                    UNION ALL SELECT dst FROM e)),
            reach AS (
              SELECT node, node AS label FROM n
              UNION
              SELECT e.dst AS node, reach.label
              FROM reach JOIN e ON e.src = reach.node)
            SELECT f.repo AS repo, f.path AS path,
                   m.component AS component
            FROM read_parquet('{kg_cache}/sources.parquet') f
            JOIN (SELECT node, min(label) AS component FROM reach
                  GROUP BY node) m
              ON m.node = f.repo || ':' || f.path""",
        "code_normalized_dups": f"""
            WITH src AS (
              SELECT repo, path, lang, content
              FROM read_parquet('{kg_cache}/sources.parquet')),
            tw AS (
              SELECT repo, path || '@mut' AS path, lang,
                     (CASE WHEN lang = 'python' THEN '# mutated twin'
                           ELSE '// mutated twin' END)
                     || chr(10) || content AS content
              FROM src
              WHERE lang <> 'markdown'
                AND CAST(regexp_extract(path, 'mod_(\\d+)', 1)
                         AS INT) % 7 = 2),
            allf AS (SELECT * FROM src UNION ALL SELECT * FROM tw),
            norm AS (
              SELECT repo, path, lang,
                     md5(array_to_string(list_filter(
                       list_transform(string_split(content, chr(10)),
                                      x -> trim(x, ' ' || chr(9))),
                       x -> x <> '' AND NOT (CASE
                         WHEN lang = 'python'
                           THEN starts_with(x, '#')
                         WHEN lang IN ('go', 'java')
                           THEN starts_with(x, '//')
                         ELSE false END)), chr(10))) AS norm_md5
              FROM allf),
            g AS (SELECT norm_md5, count(*) AS group_size
                  FROM norm GROUP BY norm_md5)
            SELECT n.repo, n.path, n.lang, n.norm_md5, g.group_size
            FROM norm n JOIN g USING (norm_md5)
            WHERE g.group_size > 1""",
        "code_triangles": f"""
            WITH e0 AS (
              SELECT repo || ':' || path AS src,
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       1)) || ':' ||
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       2)) AS dst
              FROM read_parquet('{kg_cache}/sources.parquet')),
            e AS (SELECT DISTINCT least(src, dst) AS a,
                         greatest(src, dst) AS b
                  FROM e0 WHERE src <> dst),
            deg AS (SELECT node, count(*) AS d FROM (
                      SELECT a AS node FROM e
                      UNION ALL SELECT b FROM e) GROUP BY node),
            tri AS (SELECT count(*) AS t
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
            SELECT (SELECT count(*) FROM deg) AS n_nodes,
                   (SELECT count(*) FROM e) AS n_edges,
                   CAST((SELECT SUM(d * (d - 1) // 2) FROM deg)
                        AS BIGINT) AS n_wedges,
                   (SELECT t FROM tri) AS n_triangles,
                   round(CASE WHEN (SELECT SUM(d * (d - 1) // 2)
                                    FROM deg) = 0 THEN 0.0
                         ELSE 3.0 * (SELECT t FROM tri)
                              / (SELECT SUM(d * (d - 1) // 2)
                                 FROM deg) END, 6)
                     AS global_clustering""",
        "code_xref_pagerank": f"""
            WITH e0 AS (
              SELECT repo || ':' || path AS src,
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       1)) || ':' ||
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       2)) AS dst
              FROM read_parquet('{kg_cache}/sources.parquet')),
            edges AS (SELECT src, dst FROM e0
                      UNION ALL SELECT dst, src FROM e0),
            deg AS (SELECT src, count(*) AS outdeg FROM edges
                    GROUP BY src),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            params AS (SELECT CAST(count(*) AS DOUBLE) AS n
                       FROM nodes),
            r0 AS (SELECT node, 1.0/(SELECT n FROM params) AS rank
                   FROM nodes)
            {"".join(
                f", r{i} AS (SELECT nn.node, 0.15/(SELECT n FROM"
                " params) + 0.85*COALESCE(m.mass, 0) AS rank FROM"
                " nodes nn LEFT JOIN (SELECT e.dst AS node,"
                " sum(r.rank/dg.outdeg) AS mass FROM edges e"
                f" JOIN r{i-1} r ON r.node = e.src"
                " JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m"
                " ON m.node = nn.node)"
                for i in range(1, 11))}
            SELECT node, round(rank, 6) AS rank FROM r10""",
        "code_xref_ppr": f"""
            WITH e0 AS (
              SELECT repo || ':' || path AS src,
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       1)) || ':' ||
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       2)) AS dst
              FROM read_parquet('{kg_cache}/sources.parquet')),
            edges AS (SELECT src, dst FROM e0
                      UNION ALL SELECT dst, src FROM e0),
            deg AS (SELECT src, count(*) AS outdeg FROM edges
                    GROUP BY src),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            params AS (SELECT CAST(count(*) AS DOUBLE) AS s
                       FROM nodes
                       WHERE node LIKE 'org0/repo0:%'),
            r0 AS (SELECT node,
                          CASE WHEN node LIKE 'org0/repo0:%'
                               THEN 1.0/(SELECT s FROM params)
                               ELSE 0.0 END AS rank
                   FROM nodes)
            {"".join(
                f", r{i} AS (SELECT nn.node,"
                " (CASE WHEN nn.node LIKE 'org0/repo0:%' THEN"
                " 0.15/(SELECT s FROM params) ELSE 0.0 END)"
                " + 0.85*COALESCE(m.mass, 0) AS rank FROM"
                " nodes nn LEFT JOIN (SELECT e.dst AS node,"
                " sum(r.rank/dg.outdeg) AS mass FROM edges e"
                f" JOIN r{i-1} r ON r.node = e.src"
                " JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m"
                " ON m.node = nn.node)"
                for i in range(1, 11))}
            SELECT node, round(rank, 6) AS rank FROM r10""",
        "code_xref_degrees": f"""
            WITH e AS (
              SELECT repo, path,
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       1)) AS dst_repo,
                     unnest(regexp_extract_all(content,
                       'see ([\\w/]+):([\\w/.]+\\.(?:py|go|java|md))',
                       2)) AS dst_path
              FROM read_parquet('{kg_cache}/sources.parquet')),
            o AS (SELECT repo, path, count(*) AS fan_out FROM e
                  GROUP BY repo, path),
            i AS (SELECT dst_repo, dst_path, count(*) AS fan_in FROM e
                  GROUP BY dst_repo, dst_path)
            SELECT f.repo AS repo, f.path AS path, f.lang AS lang,
                   COALESCE(o.fan_out, 0) AS fan_out,
                   COALESCE(i.fan_in, 0) AS fan_in
            FROM read_parquet('{kg_cache}/sources.parquet') f
            LEFT JOIN o ON o.repo = f.repo AND o.path = f.path
            LEFT JOIN i ON i.dst_repo = f.repo
                       AND i.dst_path = f.path""",
        # the banded-Hamming pair kernel (shared by SimHash and the
        # perceptual image/audio/video near-dup family) over a
        # deterministic 64-bit fingerprint: md5_number_lower(lang)
        # XOR one doc-keyed bit — all-pairs bit_count cross join
        "docs_fingerprint_pairs": """
            WITH fp AS (
              SELECT doc_id,
                     xor(md5_number_lower(lang),
                         CAST(1 AS UBIGINT)
                         << CAST(doc_id % 61 AS INTEGER)) AS f
              FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 1""",
        # incremental near-dedup against a persisted LSH index: added
        # docs (id%10==0) probed against the indexed old snapshot
        # (id%10!=0); verified pairs = identical distinct word sets
        "docs_incremental_neardup": """
            WITH d AS (
              SELECT doc_id,
                     md5(array_to_string(list_sort(list_distinct(
                         string_split(text, ' '))), ' ')) AS dg
              FROM documents)
            SELECT n.doc_id AS new_id, o.doc_id AS old_id
            FROM d n JOIN d o ON n.dg = o.dg
            WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 != 0""",
        "doc_mentions": mention_union,
        "doc_facets": f"""
            SELECT {uri} AS uri,
                   CAST(doc_id AS VARCHAR) AS dcterms_identifier,
                   lang AS dcterms_language,
                   CAST(n_chars AS VARCHAR) AS dcterms_extent
            FROM documents""",
        "doc_bgp_select": f"""
            SELECT {uri} AS uri, CAST(doc_id AS VARCHAR) AS ident
            FROM documents WHERE lang = 'en'""",
        "language_stats": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang""",
        "doc_toc_pages": """
            SELECT substr(CAST(doc_id AS VARCHAR), 1, 1) AS value,
                   count(*) AS n_docs
            FROM documents GROUP BY 1""",
        "doc_stats": """
            SELECT 'dcterms_language' AS dimension, lang AS value,
                   count(DISTINCT source || '/' || doc_id) AS n_docs
            FROM documents GROUP BY lang
            UNION ALL
            SELECT 'dcterms_identifier',
                   substr(CAST(doc_id AS VARCHAR), 1, 1),
                   count(DISTINCT source || '/' || doc_id)
            FROM documents GROUP BY 2""",
        "doc_annotations": f"""
            SELECT 'https://example.org/entity/' || alias AS target_uri,
                   count(*) AS n_inbound
            FROM ({mention_union}) GROUP BY alias""",
        "doc_toc_entries": f"""
            SELECT substr(CAST(doc_id AS VARCHAR), 1, 1) AS value,
                   CAST(doc_id AS VARCHAR) AS sortkey,
                   {uri} AS uri
            FROM documents""",
        "doc_keyword_hub": f"""
            SELECT 'https://example.org/entity/' || alias AS term,
                   count(*) AS n_docs,
                   min('https://example.org/res/doc/'
                       || CAST(doc_id AS VARCHAR)) AS first_uri
            FROM ({mention_union}) GROUP BY alias""",
        "events_latest_per_type": """
            WITH r AS (
                SELECT event_type, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts DESC, event_id)
                           AS rank
                FROM events
            )
            SELECT event_type, event_id, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3""",
        "events_frontpage_latest": """
            SELECT event_id, event_type, epoch_us(ts) AS ts_us
            FROM events ORDER BY ts DESC, event_id LIMIT 5""",
        "events_feed_pages": """
            WITH r AS (
                SELECT event_type, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts DESC, event_id)
                           AS rank
                FROM events
            )
            SELECT event_type,
                   CAST((rank - 1) // 100 AS BIGINT) AS page_idx,
                   CAST(rank AS BIGINT) AS rank, event_id
            FROM r""",
        "docs_sample": """
            SELECT doc_id, lang, source FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'""",
        "events_hopping_15m": """
            WITH w AS (
                SELECT event_type, value,
                       (CAST(floor(epoch(ts) / 900) AS BIGINT) - hops.i)
                           * 900 AS window_start
                FROM events, (VALUES (0), (1), (2), (3)) AS hops(i)
            )
            SELECT event_type, window_start, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM w GROUP BY event_type, window_start""",
        "events_asof_hourly": """
            WITH hourly AS (
                SELECT event_type,
                       (CAST(floor(epoch(ts) / 3600) AS BIGINT) + 1)
                           * 3600000000 AS avail_us,
                       count(*) AS prev_hour_events
                FROM events GROUP BY event_type, 2
            ), l AS (
                SELECT event_id, event_type, epoch_us(ts) AS ts_us
                FROM events
            )
            SELECT l.event_id, l.event_type, h.prev_hour_events
            FROM l ASOF LEFT JOIN hourly h
              ON l.event_type = h.event_type AND l.ts_us >= h.avail_us""",
        "events_rolling_avg": """
            SELECT event_id, user_id,
                   round(avg(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
                   AS rolling_avg
            FROM events""",
        "doc_facets_long": """
            WITH wide AS (
              SELECT 'https://example.org/res/' || source || '/'
                         || doc_id AS uri,
                     CAST(doc_id AS VARCHAR) AS dcterms_identifier,
                     lang AS dcterms_language,
                     CAST(n_chars AS VARCHAR) AS dcterms_extent
              FROM documents)
            SELECT uri, 'dcterms_identifier' AS facet,
                   dcterms_identifier AS value FROM wide
            UNION ALL
            SELECT uri, 'dcterms_language', dcterms_language FROM wide
            UNION ALL
            SELECT uri, 'dcterms_extent', dcterms_extent FROM wide""",
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT')""",
        "events_latest_value_per_user": """
            SELECT user_id, value AS latest_value FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) = 1""",
        "events_value_hour_corr": """
            SELECT event_type,
                   round(corr(value,
                        CAST((epoch_us(ts) // 3600000000) %% 24
                             AS DOUBLE)), 6) AS corr_value_hour
            FROM events GROUP BY event_type""".replace("%%", "%"),
        "events_type_hour_rollup": """
            SELECT event_type,
                   CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
                   count(*) AS n
            FROM events
            GROUP BY ROLLUP(event_type, hour)""",
        "events_value_histogram": """
            SELECT event_type,
                   least(greatest(CAST(floor(value / 10.0) AS BIGINT),
                                  0), 9) AS bin,
                   count(*) AS n
            FROM events GROUP BY event_type, bin""",
        # distributed k-means (iterative algorithm), unrolled to its
        # fixed k=4 / iters=2 instance: c0 = smallest-id init,
        # a1 = assign, c1 = element-wise mean update, final assign;
        # ties break (dist, cluster) exactly like np.argmin first-hit
        "embeddings_kmeans": """
            WITH c0 AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                     embedding::DOUBLE[] AS c
              FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
            ),
            a1 AS (
              SELECT e.vec_id,
                     (SELECT c0.cluster FROM c0
                      ORDER BY list_distance(e.embedding::DOUBLE[],
                                             c0.c), c0.cluster
                      LIMIT 1) AS cluster
              FROM embeddings e
            ),
            x1 AS (
              SELECT a1.cluster,
                     generate_subscripts(e.embedding, 1) AS i,
                     unnest(e.embedding)::DOUBLE AS v
              FROM embeddings e JOIN a1 USING (vec_id)
            ),
            c1 AS (
              SELECT cluster, list(m ORDER BY i) AS c
              FROM (SELECT cluster, i, avg(v) AS m
                    FROM x1 GROUP BY cluster, i)
              GROUP BY cluster
            )
            SELECT e.vec_id,
                   (SELECT c1.cluster FROM c1
                    ORDER BY list_distance(e.embedding::DOUBLE[],
                                           c1.c), c1.cluster
                    LIMIT 1) AS cluster
            FROM embeddings e""",
        "events_top_values_ties": """
            WITH r AS (
              SELECT event_type, event_id, value,
                     rank() OVER (PARTITION BY event_type
                                  ORDER BY value DESC) AS rnk
              FROM events)
            SELECT event_type, event_id, value, rnk
            FROM r WHERE rnk <= 5""",
        "events_hourly_active_users": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
                   count(DISTINCT user_id) AS active_users
            FROM events GROUP BY hour""",
        "events_value_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.95), 6) AS p95,
                   count(*) AS n
            FROM events GROUP BY event_type""",
        "events_range_pairs": """
            SELECT a.user_id,
                   least(a.event_id, b.event_id) AS id_a,
                   greatest(a.event_id, b.event_id) AS id_b,
                   CAST(abs(epoch_us(a.ts) - epoch_us(b.ts)) // 1000000
                        AS BIGINT) AS gap_s
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND a.event_id < b.event_id
             AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 300000000""",
        "docs_exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text""",
        "docs_distinct": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE doc_id IN (SELECT min(doc_id) FROM documents
                             GROUP BY text)""",
        "docs_search": r"""
            WITH s AS (
                SELECT 'https://example.org/res/' || source || '/'
                           || doc_id AS uri,
                       len(regexp_extract_all(text, '(?i)\bbatch\b'))
                       + len(regexp_extract_all(text, '(?i)\bstream\b'))
                       + len(regexp_extract_all(text, '(?i)\bvector\b'))
                           AS hits
                FROM documents
            )
            SELECT uri, CAST(hits AS DOUBLE) AS score,
                   CAST(hits AS BIGINT) AS n_hits
            FROM s WHERE hits > 0
            ORDER BY score DESC, uri LIMIT 10""",
        # exact substring duplication (Lee et al. 2022 shape): distinct
        # char 16-grams at stride 4 per doc, duplicated = appears in >=2
        # docs.  Ray side windows over BYTES — identical on this
        # all-ASCII corpus (asserted by the pipeline docstring)
        "docs_dup_ngrams": """
            WITH grams AS (
              SELECT DISTINCT doc_id, substr(text, CAST(p AS INT), 16) AS g
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 15, 4))
                               AS p
                    FROM documents WHERE length(text) >= 16)),
            cnt AS (SELECT g, count(*) AS n FROM grams GROUP BY g)
            SELECT grams.doc_id AS doc_id,
                   count(*) FILTER (WHERE cnt.n >= 2) AS dup_grams,
                   count(*) AS total_grams
            FROM grams JOIN cnt USING (g)
            GROUP BY grams.doc_id ORDER BY doc_id""",
        # symmetric per-vector int8 quantization (scale = max|x|/127,
        # round half away from zero, zero vectors scale 0)
        "embeddings_quantized": """
            WITH m AS (SELECT vec_id, embedding::DOUBLE[] AS x,
                              list_max(list_transform(
                                  embedding::DOUBLE[],
                                  v -> abs(v))) AS ma
                       FROM embeddings),
            e AS (SELECT vec_id, ma,
                         unnest(generate_series(1, len(x))) AS dim, x
                  FROM m)
            SELECT vec_id, CAST(dim AS BIGINT) AS dim,
                   round(CASE WHEN ma > 0 THEN ma / 127.0
                              ELSE 0.0 END, 6) AS scale,
                   CAST(CASE WHEN x[CAST(dim AS INT)] >= 0
                        THEN floor(x[CAST(dim AS INT)]
                                   / (CASE WHEN ma > 0 THEN ma / 127.0
                                      ELSE 1.0 END) + 0.5)
                        ELSE -floor(-x[CAST(dim AS INT)]
                                    / (CASE WHEN ma > 0 THEN ma / 127.0
                                       ELSE 1.0 END) + 0.5)
                   END AS BIGINT) AS q
            FROM e ORDER BY vec_id, dim""",
        # corpus snapshot diff: OLD = id%10!=0, NEW = id%10!=1 with
        # id%7==0 rows edited; unchanged rows dropped
        "docs_snapshot_diff": """
            WITH o AS (SELECT doc_id, text FROM documents
                       WHERE doc_id % 10 != 0),
            nw AS (SELECT doc_id,
                          CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                               ELSE text END AS text
                   FROM documents WHERE doc_id % 10 != 1)
            SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN nw.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id
            WHERE o.doc_id IS NULL OR nw.doc_id IS NULL
                  OR o.text != nw.text
            ORDER BY doc_id""",
        # deterministic stratified sample: k smallest md5(id) per lang
        "docs_stratified_sample": """
            WITH h AS (SELECT doc_id, lang,
                              CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                                   & 9223372036854775807 AS BIGINT) AS hk
                       FROM documents),
            r AS (SELECT doc_id, lang,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY hk, doc_id) AS rn
                  FROM h)
            SELECT doc_id, lang FROM r WHERE rn <= 10
            ORDER BY lang, doc_id""",
        # batch-GD logistic regression (quality classifier), unrolled
        # to its fixed lr=0.5 / iters=2 / zero-init instance: w0=0 so
        # iteration 1's p is exactly 0.5; bias is dim 64
        "embeddings_logreg": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x,
                              CASE WHEN label >= 5 THEN 1.0 ELSE 0.0 END AS y
                       FROM embeddings),
            dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
            ex AS (SELECT e.vec_id, d.dim,
                          e.x[CAST(d.dim AS INT)] AS xv, e.y
                   FROM e, dims d),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM e),
            g1 AS (SELECT dim, sum((0.5 - y) * xv) AS g
                   FROM ex GROUP BY dim),
            g1b AS (SELECT sum(0.5 - y) AS g FROM e),
            w1 AS (SELECT dim, -0.5 * g / (SELECT cnt FROM n) AS w
                   FROM g1),
            w1b AS (SELECT -0.5 * g / (SELECT cnt FROM n) AS w FROM g1b),
            z AS (SELECT x.vec_id, any_value(x.y) AS y,
                         sum(w1.w * x.xv) + (SELECT w FROM w1b) AS z
                  FROM ex x JOIN w1 USING (dim) GROUP BY x.vec_id),
            p2 AS (SELECT vec_id, y, 1.0 / (1.0 + exp(-z)) AS p FROM z),
            g2 AS (SELECT x.dim, sum((p2.p - p2.y) * x.xv) AS g
                   FROM ex x JOIN p2 USING (vec_id) GROUP BY x.dim),
            g2b AS (SELECT sum(p - y) AS g FROM p2),
            w2 AS (SELECT w1.dim - 1 AS dim,
                          w1.w - 0.5 * g2.g / (SELECT cnt FROM n) AS w
                   FROM w1 JOIN g2 USING (dim)),
            w2b AS (SELECT 64 AS dim,
                           (SELECT w FROM w1b)
                           - 0.5 * g / (SELECT cnt FROM n) AS w
                    FROM g2b)
            SELECT dim, round(w, 6) AS weight
            FROM (SELECT * FROM w2 UNION ALL SELECT * FROM w2b)
            ORDER BY dim""",
        "embeddings_logreg_scores": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x,
                              CASE WHEN label >= 5 THEN 1.0 ELSE 0.0 END AS y
                       FROM embeddings),
            dims AS (SELECT unnest(generate_series(1, 64)) AS dim),
            ex AS (SELECT e.vec_id, d.dim,
                          e.x[CAST(d.dim AS INT)] AS xv, e.y
                   FROM e, dims d),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM e),
            g1 AS (SELECT dim, sum((0.5 - y) * xv) AS g
                   FROM ex GROUP BY dim),
            g1b AS (SELECT sum(0.5 - y) AS g FROM e),
            w1 AS (SELECT dim, -0.5 * g / (SELECT cnt FROM n) AS w
                   FROM g1),
            w1b AS (SELECT -0.5 * g / (SELECT cnt FROM n) AS w FROM g1b),
            z AS (SELECT x.vec_id, any_value(x.y) AS y,
                         sum(w1.w * x.xv) + (SELECT w FROM w1b) AS z
                  FROM ex x JOIN w1 USING (dim) GROUP BY x.vec_id),
            p2 AS (SELECT vec_id, y, 1.0 / (1.0 + exp(-z)) AS p FROM z),
            g2 AS (SELECT x.dim, sum((p2.p - p2.y) * x.xv) AS g
                   FROM ex x JOIN p2 USING (vec_id) GROUP BY x.dim),
            g2b AS (SELECT sum(p - y) AS g FROM p2),
            w2 AS (SELECT w1.dim AS dim,
                          w1.w - 0.5 * g2.g / (SELECT cnt FROM n) AS w
                   FROM w1 JOIN g2 USING (dim)),
            w2b AS (SELECT (SELECT w FROM w1b)
                           - 0.5 * g / (SELECT cnt FROM n) AS w
                    FROM g2b)
            SELECT x.vec_id,
                   round(1.0 / (1.0 + exp(-(sum(w2.w * x.xv)
                                            + (SELECT w FROM w2b)))), 6)
                       AS score
            FROM ex x JOIN w2 USING (dim)
            GROUP BY x.vec_id ORDER BY x.vec_id""",

        # tf-idf top terms: selection ranked by INTEGER keys
        # (tf desc, df asc, term) so float ln() ulps cannot flip rank;
        # the reported tfidf rounds half-away to 6 on both sides
        "docs_tfidf_top_terms": """
            WITH tok AS (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS t
                         FROM documents),
            tf AS (SELECT doc_id, t, count(*) AS tf
                   FROM tok GROUP BY doc_id, t),
            dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            sc AS (SELECT tf.doc_id, tf.t, tf.tf, dfreq.df,
                          row_number() OVER (
                              PARTITION BY tf.doc_id
                              ORDER BY tf.tf DESC, dfreq.df, tf.t)
                              AS rn
                   FROM tf JOIN dfreq USING (t))
            SELECT doc_id, t AS term, tf, df,
                   floor(tf * ln((SELECT n FROM nn) / df) * 1e6
                         + 0.5) / 1e6 AS tfidf
            FROM sc WHERE rn <= 3 ORDER BY doc_id, rn""",
        # round-1 BPE pair statistics (exact twin of the iterative
        # bpe_train, whose later rounds are pytest-verified)
        "docs_bpe_pair_counts": """
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents),
            p AS (SELECT substr(word, CAST(i AS INT), 1) AS sym_left,
                         substr(word, CAST(i AS INT) + 1, 1) AS sym_right
                  FROM (SELECT word,
                               unnest(generate_series(1, length(word) - 1))
                                   AS i
                        FROM w WHERE length(word) >= 2))
            SELECT sym_left, sym_right, count(*) AS n
            FROM p GROUP BY sym_left, sym_right
            ORDER BY n DESC, sym_left, sym_right LIMIT 20""",
        # concat-and-split sequence packing: where each doc's tokens
        # land when the corpus is concatenated in doc_id order and
        # split into 1024-token training sequences (distributed
        # prefix sum on the Ray side, window function here)
        "docs_pack_offsets": """
            WITH t AS (SELECT doc_id,
                              len(string_split(text, ' ')) AS n
                       FROM documents),
            p AS (SELECT doc_id, n,
                         CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS BIGINT) AS s
                  FROM t)
            SELECT doc_id, n AS n_tokens, s AS token_start,
                   CAST(s // 1024 AS BIGINT) AS seq_id,
                   CAST(s % 1024 AS BIGINT) AS seq_offset
            FROM p ORDER BY doc_id""",
        # materialized packed sequences (the write-side twin of
        # docs_pack_offsets): each doc contributes token-range
        # fragments to the sequences it spans; sequences reassemble
        # by fragment start.  Full seq_text equality.
        "docs_packed_sequences": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            p AS (SELECT doc_id, w, len(w) AS n,
                         CAST(COALESCE(sum(len(w)) OVER (ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS BIGINT) AS s
                  FROM t),
            frag AS (SELECT doc_id, s, n, w,
                            unnest(generate_series(s // 1024,
                                   (s + n - 1) // 1024)) AS seq_id
                     FROM p),
            fr AS (SELECT seq_id,
                          greatest(seq_id * 1024, s) AS fstart,
                          array_to_string(
                              w[CAST(greatest(seq_id * 1024, s) - s + 1
                                     AS INT) :
                                CAST(least((seq_id + 1) * 1024, s + n)
                                     - s AS INT)], ' ') AS ftext,
                          least((seq_id + 1) * 1024, s + n)
                              - greatest(seq_id * 1024, s) AS ftok
                   FROM frag)
            SELECT CAST(seq_id AS BIGINT) AS seq_id,
                   string_agg(ftext, ' ' ORDER BY fstart) AS seq_text,
                   CAST(sum(ftok) AS BIGINT) AS n_tokens
            FROM fr GROUP BY seq_id""",
        # fixed-size training chunks: 64 whitespace tokens, overlap 16
        # (stride 48); a doc with <=64 tokens is one chunk; the chunk
        # count is ceil((n-64)/48)+1 so the last token is always reached
        "docs_chunks": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l
                          FROM documents),
            meta AS (SELECT doc_id, l, len(l) AS n,
                       CASE WHEN len(l) <= 64 THEN 1
                            ELSE CAST(ceil((len(l) - 64) / 48.0) AS INT) + 1
                       END AS nc
                     FROM toks),
            c AS (SELECT doc_id, l, n,
                         unnest(generate_series(0, nc - 1)) AS j
                  FROM meta)
            SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
                   array_to_string(l[CAST(j*48+1 AS INT) :
                                     CAST(j*48+64 AS INT)], ' ')
                       AS chunk_text,
                   least(64, n - j*48) AS n_tokens
            FROM c ORDER BY doc_id, chunk_id""",
        # substring dedup, removal form (Lee et al. 2022): delete every
        # char covered by a corpus-duplicated 16-gram (within-doc
        # repeats count); gaps-and-islands via a windowed running max
        "docs_remove_dup_spans": """
            WITH grams AS (
              SELECT doc_id, p, substr(text, CAST(p AS INT), 16) AS g
              FROM (SELECT doc_id, text,
                           unnest(generate_series(1, length(text) - 15)) AS p
                    FROM documents WHERE length(text) >= 16)),
            cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
            starts AS (SELECT doc_id, p,
                              CASE WHEN c >= 2 THEN 1 ELSE 0 END AS d
                       FROM grams JOIN cnt USING (g)),
            chars AS (SELECT doc_id, p, substr(text, CAST(p AS INT), 1) AS ch
                      FROM (SELECT doc_id, text,
                                   unnest(generate_series(1, length(text)))
                                       AS p
                            FROM documents)),
            flag AS (SELECT c.doc_id, c.p, c.ch, COALESCE(s.d, 0) AS d
                     FROM chars c LEFT JOIN starts s
                       ON s.doc_id = c.doc_id AND s.p = c.p),
            cov AS (SELECT doc_id, p, ch,
                      max(d) OVER (PARTITION BY doc_id ORDER BY p
                                   ROWS BETWEEN 15 PRECEDING
                                   AND CURRENT ROW) AS covered
                    FROM flag)
            SELECT doc_id,
                   coalesce(string_agg(ch, '' ORDER BY p)
                            FILTER (WHERE covered = 0), '') AS clean_text,
                   CAST(sum(covered) AS BIGINT) AS n_removed
            FROM cov GROUP BY doc_id ORDER BY doc_id""",
        # CCNet-style segment (line) dedup family: segments = words on
        # this single-line corpus (delim=' '); blank segments exempt.
        # Threshold: present in > 25% of docs (corpus-relative).
        "docs_segment_dup_stats": """
            WITH l AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                     generate_subscripts(string_split(text, ' '), 1)
                         AS ord
              FROM documents),
            c AS (SELECT seg FROM l WHERE trim(seg) <> ''
                  GROUP BY seg
                  HAVING count(DISTINCT doc_id) >=
                         greatest((SELECT count(*) FROM documents)
                                  // 4, 2))
            SELECT l.doc_id,
                   CAST(count(c.seg) AS BIGINT) AS dup_segments,
                   CAST(count(*) AS BIGINT) AS total_segments
            FROM l LEFT JOIN c USING (seg)
            GROUP BY l.doc_id ORDER BY l.doc_id""",
        "docs_remove_common_segments": """
            WITH l AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                     generate_subscripts(string_split(text, ' '), 1)
                         AS ord
              FROM documents),
            c AS (SELECT seg FROM l WHERE trim(seg) <> ''
                  GROUP BY seg
                  HAVING count(DISTINCT doc_id) >=
                         greatest((SELECT count(*) FROM documents)
                                  // 4, 2))
            SELECT l.doc_id,
                   coalesce(string_agg(
                       CASE WHEN c.seg IS NULL OR trim(l.seg) = ''
                            THEN l.seg END, ' ' ORDER BY l.ord),
                       '') AS clean_text,
                   CAST(count(CASE WHEN c.seg IS NOT NULL
                                   AND trim(l.seg) <> '' THEN 1 END)
                        AS BIGINT) AS n_removed
            FROM l LEFT JOIN c USING (seg)
            GROUP BY l.doc_id ORDER BY l.doc_id""",
        # keep-first form (Wenzek et al. 2020): survivor = the
        # occurrence at (min doc_id, min position within it)
        "docs_segments_keep_first": """
            WITH l AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                     generate_subscripts(string_split(text, ' '), 1)
                         AS ord
              FROM documents),
            c AS (SELECT seg, min(doc_id) AS md FROM l
                  WHERE trim(seg) <> '' GROUP BY seg
                  HAVING count(DISTINCT doc_id) >= 2),
            c2 AS (SELECT c.seg, c.md, min(l.ord) AS mo
                   FROM c JOIN l ON l.seg = c.seg AND l.doc_id = c.md
                   GROUP BY c.seg, c.md)
            SELECT l.doc_id,
                   coalesce(string_agg(
                       CASE WHEN c2.seg IS NULL OR trim(l.seg) = ''
                            OR (l.doc_id = c2.md AND l.ord = c2.mo)
                            THEN l.seg END, ' ' ORDER BY l.ord),
                       '') AS clean_text,
                   CAST(count(CASE WHEN c2.seg IS NOT NULL
                                   AND trim(l.seg) <> ''
                                   AND NOT (l.doc_id = c2.md
                                            AND l.ord = c2.mo)
                                   THEN 1 END) AS BIGINT) AS n_removed
            FROM l LEFT JOIN c2 ON l.seg = c2.seg
            GROUP BY l.doc_id ORDER BY l.doc_id""",
        # exact top-k tokens — the exact twin of the Space-Saving
        # heavy-hitters sketch (sketches.heavy_hitter_tokens)
        "docs_top_tokens": """
            WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM documents)
            SELECT tok, count(*) AS n FROM t GROUP BY tok
            ORDER BY n DESC, tok LIMIT 20""",
        # CCNet-style perplexity filter statistic: bits-per-bigram
        # under a self-trained add-0.5 bigram LM (single-space
        # tokens, context count = bigram-lhs count, V = distinct rhs)
        "docs_perplexity": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS l FROM documents),
            big AS (
              SELECT doc_id, l[CAST(p AS INT)] AS w1,
                     l[CAST(p AS INT) + 1] AS w2
              FROM (SELECT doc_id, l,
                           unnest(generate_series(1, len(l) - 1)) AS p
                    FROM toks)),
            cb AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
            cu AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
            v AS (SELECT count(DISTINCT w2) AS vs FROM big)
            SELECT b.doc_id AS doc_id, count(*) AS n_bigrams,
                   round(-avg(log2((c12 + 0.5)
                                   / (c1 + 0.5 * (SELECT vs FROM v)))),
                         6) AS bits_per_bigram
            FROM big b JOIN cb USING (w1, w2) JOIN cu USING (w1)
            GROUP BY b.doc_id ORDER BY doc_id""",
        # DSIR (hashed-bigram importance resampling): bucket =
        # md5_number_lower(bigram) % 1024 (the engine's DuckDB-parity
        # hash), target = lang='en', add-one smoothing over the
        # bucket space; keep on the ROUNDED mean log ratio > 0
        "docs_dsir": """
            WITH toks AS (
              SELECT doc_id, lang, string_split(text, ' ') AS l
              FROM documents),
            big AS (
              SELECT doc_id, lang,
                     l[CAST(p AS INT)] || ' '
                       || l[CAST(p AS INT) + 1] AS bg
              FROM (SELECT doc_id, lang, l,
                           unnest(generate_series(1, len(l) - 1)) AS p
                    FROM toks)),
            bk AS (SELECT doc_id, lang,
                          CAST(md5_number_lower(bg) % 1024 AS BIGINT)
                            AS b FROM big),
            cnt AS (SELECT b, count(*) AS n_raw,
                           SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0
                               END) AS n_tgt
                    FROM bk GROUP BY b),
            tot AS (SELECT SUM(n_raw) AS R, SUM(n_tgt) AS T FROM cnt),
            lam AS (SELECT b, ln((n_tgt + 1.0) / (T + 1024.0))
                           - ln((n_raw + 1.0) / (R + 1024.0)) AS lam
                    FROM cnt, tot)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lam), 6) AS dsir_logratio,
                   round(avg(lam), 6) > 0 AS keep
            FROM bk JOIN lam USING (b) GROUP BY doc_id""",
        # Moore-Lewis cross-entropy difference: in-domain LM on the
        # lang='en' slice (left joins + COALESCE: unseen bigrams score
        # the add-alpha floor), general LM on the whole corpus; keep
        # docs whose ROUNDED diff < 0 (flag compared on the rounded
        # value on both sides)
        "docs_moore_lewis": """
            WITH toks AS (
              SELECT doc_id, lang, string_split(text, ' ') AS l
              FROM documents),
            big AS (
              SELECT doc_id, lang, l[CAST(p AS INT)] AS w1,
                     l[CAST(p AS INT) + 1] AS w2
              FROM (SELECT doc_id, lang, l,
                           unnest(generate_series(1, len(l) - 1)) AS p
                    FROM toks)),
            cbg AS (SELECT w1, w2, count(*) AS c12 FROM big
                    GROUP BY w1, w2),
            cug AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
            vg AS (SELECT count(DISTINCT w2) AS vs FROM big),
            bt AS (SELECT * FROM big WHERE lang = 'en'),
            cbt AS (SELECT w1, w2, count(*) AS c12 FROM bt
                    GROUP BY w1, w2),
            cut AS (SELECT w1, count(*) AS c1 FROM bt GROUP BY w1),
            vt AS (SELECT count(DISTINCT w2) AS vs FROM bt),
            gen AS (
              SELECT b.doc_id,
                     -avg(log2((c12 + 0.5)
                               / (c1 + 0.5 * (SELECT vs FROM vg))))
                         AS bits_gen
              FROM big b JOIN cbg USING (w1, w2) JOIN cug USING (w1)
              GROUP BY b.doc_id),
            ind AS (
              SELECT b.doc_id, count(*) AS n_bigrams,
                     -avg(log2((COALESCE(t.c12, 0) + 0.5)
                               / (COALESCE(u.c1, 0)
                                  + 0.5 * (SELECT vs FROM vt))))
                         AS bits_in
              FROM big b
              LEFT JOIN cbt t USING (w1, w2)
              LEFT JOIN cut u USING (w1)
              GROUP BY b.doc_id)
            SELECT ind.doc_id AS doc_id, ind.n_bigrams,
                   round(bits_in - bits_gen, 6) AS ce_diff,
                   round(bits_in - bits_gen, 6) < 0 AS keep
            FROM ind JOIN gen ON ind.doc_id = gen.doc_id
            ORDER BY doc_id""",
        "doc_entity_pagerank": "WITH de AS (SELECT 'doc:' || doc_id AS d, 'ent:batch' AS e FROM documents WHERE len(regexp_extract_all(text, '\\bbatch\\b')) > 0\n              UNION ALL SELECT 'doc:' || doc_id AS d, 'ent:shuffle' AS e FROM documents WHERE len(regexp_extract_all(text, '\\bshuffle\\b')) > 0\n              UNION ALL SELECT 'doc:' || doc_id AS d, 'ent:spark' AS e FROM documents WHERE len(regexp_extract_all(text, '\\bspark\\b')) > 0\n              UNION ALL SELECT 'doc:' || doc_id AS d, 'ent:stream' AS e FROM documents WHERE len(regexp_extract_all(text, '\\bstream\\b')) > 0\n              UNION ALL SELECT 'doc:' || doc_id AS d, 'ent:vector' AS e FROM documents WHERE len(regexp_extract_all(text, '\\bvector\\b')) > 0\n              UNION ALL SELECT 'doc:' || doc_id AS d, 'ent:window' AS e FROM documents WHERE len(regexp_extract_all(text, '\\bwindow\\b')) > 0),\nedges AS (SELECT d AS src, e AS dst FROM de UNION ALL SELECT e, d FROM de),\ndeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),\nnodes AS (SELECT DISTINCT src AS node FROM edges),\nparams AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),\nr0 AS (SELECT node, 1.0/(SELECT n FROM params) AS rank FROM nodes)\n, r1 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r0 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r2 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r1 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r3 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r2 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r4 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r3 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r5 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r4 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r6 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r5 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r7 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r6 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r8 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r7 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r9 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r8 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\n, r10 AS (SELECT nn.node, 0.15/(SELECT n FROM params) + 0.85*COALESCE(m.mass, 0) AS rank FROM nodes nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank/dg.outdeg) AS mass FROM edges e JOIN r9 r ON r.node = e.src JOIN deg dg ON dg.src = e.src GROUP BY e.dst) m ON m.node = nn.node)\nSELECT node, round(rank, 6) AS rank FROM r10",
        "docs_search_bm25": r"""
            WITH d AS (
              SELECT 'https://example.org/res/' || source || '/'
                         || doc_id AS uri,
                     len(regexp_extract_all(text, '(?i)\bbatch\b'))
                         AS tf0,
                     len(regexp_extract_all(text, '(?i)\bstream\b'))
                         AS tf1,
                     len(regexp_extract_all(text, '(?i)\bvector\b'))
                         AS tf2,
                     len(regexp_extract_all(text, '\S+')) AS dl
              FROM documents
            ), s AS (
              SELECT count(*) AS n, avg(dl) AS avgdl,
                     sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                     sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                     sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM d
            ), scored AS (
              SELECT uri, round(
                  ln((n - df0 + 0.5)/(df0 + 0.5) + 1.0)
                    * (tf0 * 2.2)/(tf0 + 1.2*(0.25 + 0.75*dl/avgdl))
                + ln((n - df1 + 0.5)/(df1 + 0.5) + 1.0)
                    * (tf1 * 2.2)/(tf1 + 1.2*(0.25 + 0.75*dl/avgdl))
                + ln((n - df2 + 0.5)/(df2 + 0.5) + 1.0)
                    * (tf2 * 2.2)/(tf2 + 1.2*(0.25 + 0.75*dl/avgdl)), 4)
                AS score
              FROM d, s
            )
            SELECT uri, score FROM scored WHERE score > 0
            ORDER BY score DESC, uri LIMIT 10""",
        "docs_search_paged": r"""
            WITH s AS (
                SELECT 'https://example.org/res/' || source || '/'
                           || doc_id AS uri,
                       len(regexp_extract_all(text, '(?i)\bbatch\b'))
                       + len(regexp_extract_all(text, '(?i)\bstream\b'))
                           AS hits
                FROM documents WHERE lang = 'en'
            ), r AS (
                SELECT uri, CAST(hits AS DOUBLE) AS score,
                       CAST(hits AS BIGINT) AS n_hits,
                       row_number() OVER (ORDER BY hits DESC, uri)
                           AS rank
                FROM s WHERE hits > 0
            )
            SELECT uri, score, n_hits, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank > 5 AND rank <= 10""",
        "docs_token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS ws_tokens,
                   CAST(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                       AS bpe_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents""",
        "docs_quality": f"""
            WITH raw AS (
                SELECT doc_id,
                    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                        AS n_tok,
                    CAST(length(text) AS BIGINT) AS n_char,
                    CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                        AS BIGINT) AS n_alpha,
                    CAST(len(regexp_extract_all(
                        text, '[!-/:-@\\[-`{{-~]')) AS BIGINT) AS n_punct,
                    CAST(len(regexp_extract_all(text, '{stop_re}'))
                        AS BIGINT) AS n_stop,
                    CAST(len(regexp_extract_all(text, '\\s')) AS BIGINT)
                        AS n_ws
                FROM documents
            ), ratios AS (
                SELECT doc_id, n_tok AS n_tokens,
                    round((n_char - n_ws)
                          / CAST(greatest(n_tok, 1) AS DOUBLE), 6)
                        AS mean_token_len,
                    round(n_stop / CAST(greatest(n_tok, 1) AS DOUBLE), 6)
                        AS stopword_ratio,
                    round(n_punct / CAST(greatest(n_char, 1) AS DOUBLE), 6)
                        AS punct_ratio,
                    round(n_alpha / CAST(greatest(n_char, 1) AS DOUBLE), 6)
                        AS alpha_ratio
                FROM raw
            )
            SELECT doc_id, n_tokens, mean_token_len, stopword_ratio,
                   punct_ratio, alpha_ratio,
                   round(0.4 * (least(stopword_ratio, 0.5) / 0.5)
                         + 0.4 * alpha_ratio
                         + 0.2 * (1 - least(punct_ratio, 0.2) / 0.2), 6)
                       AS quality
            FROM ratios""",
        # Gopher-style repetition gates: fractions rounded half-away-
        # from-zero to 6 digits, 'passes' computed on unrounded values
        # in both engines
        "docs_repetition": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                                                      '\s+'),
                                   x -> x != '') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents
            ), s AS (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n_words,
                       CAST(len(lines) AS BIGINT) AS n_lines,
                       1.0 - len(list_distinct(toks))
                           / CAST(greatest(len(toks), 1) AS DOUBLE)
                           AS dw,
                       1.0 - len(list_distinct(lines))
                           / CAST(greatest(len(lines), 1) AS DOUBLE)
                           AS dl
                FROM t
            )
            SELECT doc_id, n_words, n_lines,
                   floor(dw * 1e6 + 0.5) / 1e6 AS dup_word_frac,
                   floor(dl * 1e6 + 0.5) / 1e6 AS dup_line_frac,
                   (dl < 0.3 AND dw < 0.7 AND n_words >= 5) AS passes
            FROM s""",
        # the composed cleaning pipeline: exact-dedup keepers that
        # pass the repetition gates and are not contaminated
        "docs_clean_corpus": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                                                      '\s+'),
                                   x -> x != '') AS w,
                       string_split(text, chr(10)) AS lines,
                       text
                FROM documents
            ), keep AS (
                SELECT min(doc_id) AS doc_id FROM documents
                GROUP BY text
            ), rep AS (
                SELECT doc_id FROM toks
                WHERE 1.0 - len(list_distinct(lines))
                        / CAST(greatest(len(lines), 1) AS DOUBLE)
                        < 0.3
                  AND 1.0 - len(list_distinct(w))
                        / CAST(greatest(len(w), 1) AS DOUBLE) < 0.7
                  AND len(w) >= 5
            ), bench AS (
                SELECT DISTINCT array_to_string(w[1:8], ' ') AS gram
                FROM toks WHERE doc_id % 50 = 0 AND len(w) >= 8
            ), grams AS (
                SELECT doc_id,
                       unnest([array_to_string(w[i:i+7], ' ')
                               for i in generate_series(
                                   1, greatest(len(w) - 7, 0))])
                           AS gram
                FROM toks
            ), dirty AS (
                SELECT DISTINCT g.doc_id
                FROM grams g JOIN bench b ON g.gram = b.gram
            )
            SELECT k.doc_id FROM keep k
            JOIN rep r USING (doc_id)
            WHERE k.doc_id NOT IN (SELECT doc_id FROM dirty)""",
        # skeleton anti-join: URI objects never appearing as subjects
        # (the bibo:Document class + every mentioned entity URI)
        "doc_skeletons": r"""
            SELECT 'https://example.org/entity/' || a.alias AS uri,
                   a.alias AS identifier
            FROM (VALUES ('batch'), ('shuffle'), ('spark'),
                         ('stream'), ('vector'), ('window'))
                 AS a(alias)
            WHERE EXISTS (
                SELECT 1 FROM documents d
                WHERE regexp_matches(d.text,
                                     '\b' || a.alias || '\b'))
            UNION ALL
            SELECT 'http://purl.org/ontology/bibo/Document' AS uri,
                   'Document' AS identifier""",
        # the PII regexes are RE2/rust-regex compatible so both
        # engines apply literally the same patterns
        "docs_pii_scrub": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                     '\+?[0-9][0-9 \-]{7,}[0-9]')) AS BIGINT)
                     AS n_phone,
                   CAST(len(regexp_extract_all(text,
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}'))
                     AS BIGINT) AS n_ipv4,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                     '\+?[0-9][0-9 \-]{7,}[0-9]', '<PHONE>', 'g'),
                     '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
                     '<IP>', 'g') AS clean_text
            FROM documents""",
        # decontamination: every 50th doc is the 'benchmark'; its
        # leading 8-gram is the probe; n_hits counts DISTINCT probe
        # grams per doc
        "docs_decontaminate": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text),
                                                      '\s+'),
                                   x -> x != '') AS w
                FROM documents
            ), bench AS (
                SELECT DISTINCT array_to_string(w[1:8], ' ') AS gram
                FROM toks WHERE doc_id % 50 = 0 AND len(w) >= 8
            ), grams AS (
                SELECT doc_id,
                       unnest([array_to_string(w[i:i+7], ' ')
                               for i in generate_series(
                                   1, greatest(len(w) - 7, 0))]) AS gram
                FROM toks
            ), hits AS (
                SELECT g.doc_id,
                       count(DISTINCT g.gram) AS n_hits
                FROM grams g JOIN bench b ON g.gram = b.gram
                GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)""",
        # doc_id < 1000 mirrors the documented max_docs cap in
        # docs_jaccard_pairs (quadratic OUTPUT on the dense synthetic
        # vocabulary; no effect at sf<=0.01 where the corpus is smaller)
        "docs_jaccard_pairs": r"""
            WITH w AS (
                SELECT doc_id,
                       list_distinct(regexp_extract_all(text, '\S+'))
                           AS words
                FROM documents
                WHERE doc_id < 1000
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(CAST(len(list_intersect(a.words, b.words))
                              AS DOUBLE)
                         / len(list_distinct(a.words || b.words)), 6)
                       AS jaccard
            FROM w a JOIN w b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE)
                  / len(list_distinct(a.words || b.words)) >= 0.4""",
        # exact k-NN graph: all ordered pairs, rank by raw float64
        # cosine then neighbor id (numpy matmul and DuckDB
        # list_cosine_similarity agree on float64 — the ann_topk
        # precedent), cosine rounded to 4 only in the output
        "embeddings_knn_graph": """
            WITH s AS (
              SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                     list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[])
                         AS cos
              FROM embeddings a JOIN embeddings b
                ON a.vec_id != b.vec_id
            ), r AS (
              SELECT vec_id, neighbor_id, cos,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY cos DESC,
                                                 neighbor_id) AS rank
              FROM s)
            SELECT vec_id, neighbor_id, round(cos, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5""",
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id IN (0, 1, 2)
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding, q.qe) AS cos
                FROM embeddings e CROSS JOIN q
            ), r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id)
                           AS rank
                FROM s
            )
            SELECT query_id, vec_id, round(cos, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10""",
        "embeddings_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding),
                         4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding)
                  >= 0.4""",
        "embeddings_label_count": """
            SELECT label, count(*) AS n FROM embeddings GROUP BY label""",
        # IVF at full probe is exact ⇒ same oracle as brute force
        "ivf_ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id IN (0, 1, 2)
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding, q.qe) AS cos
                FROM embeddings e CROSS JOIN q
            ), r AS (
                SELECT query_id, vec_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id)
                           AS rank
                FROM s
            )
            SELECT query_id, vec_id, round(cos, 4) AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10""",
        # identical word SET ⇒ identical 1-gram MinHash signature ⇒
        # candidate in every band: the verified-dup set equals the
        # exact SQL identical-word-set-pair set (recall 1.0 by
        # construction)
        "docs_minhash_verified_dups": r"""
            WITH w AS (
                SELECT doc_id,
                       list_sort(list_distinct(
                           regexp_extract_all(text, '\S+'))) AS ws
                FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM w a JOIN w b
              ON a.ws = b.ws AND a.doc_id < b.doc_id""",
        # stopword-hit-ratio language ID is exactly expressible in SQL:
        # token membership over whitespace-split lower() tokens,
        # first-profile-wins tie-break (en > de > fr > sv), 'und' at 0
        "docs_language_id": _LANG_ID_SQL,
        "docs_lang_confusion": _LANG_CONF_SQL,
        "docs_ngram_diversity": """
            WITH g AS (
              SELECT n, unnest(list_transform(
                       range(len(string_split(text, ' ')) - n + 1),
                       i -> array_to_string(list_slice(
                              string_split(text, ' '),
                              i + 1, i + n), ' '))) AS gram
              FROM documents, (SELECT unnest([1, 2, 3]) AS n))
            SELECT n, count(*) AS total_ngrams,
                   count(DISTINCT gram) AS distinct_ngrams,
                   round(count(DISTINCT gram) * 1.0 / count(*), 6)
                     AS diversity
            FROM g GROUP BY n""",
        # winnowing (k=5 grams, window=4) with the md5 k-gram hash:
        # DuckDB's md5_number_lower == little-endian bytes 8:16 of the
        # digest, masked to int63 — validated bit-identical to the
        # engine's Fingerprinter(hash="md5")
        "docs_fingerprints": r"""
            WITH norm AS (
              SELECT doc_id,
                     lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
                     AS s
              FROM documents
            ), grams AS (
              SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                     CAST(md5_number_lower(
                            substr(s, CAST(t.i AS INTEGER) + 1, 5))
                          & 9223372036854775807 AS BIGINT) AS h,
                     length(s) - 4 AS g
              FROM norm,
                   UNNEST(range(0, greatest(length(s) - 4, 0))) AS t(i)
            ), winmin AS (
              SELECT doc_id, g, i,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i
                                  ROWS BETWEEN CURRENT ROW
                                  AND 3 FOLLOWING) AS m
              FROM grams
            )
            SELECT DISTINCT doc_id, m AS fp FROM winmin
            WHERE g > 4 AND i <= g - 4
            UNION
            SELECT doc_id, min(h) AS fp FROM grams
            WHERE g <= 4 GROUP BY doc_id
            UNION
            SELECT doc_id,
                   CAST(md5_number_lower(s)
                        & 9223372036854775807 AS BIGINT) AS fp
            FROM norm WHERE length(s) > 0 AND length(s) < 5""",
        "kg_pipeline_synthetic": f"""
            SELECT subj, pred, obj_type, obj_value, obj_lang,
                   obj_datatype
            FROM read_parquet(
                '{kg_cache}/expected_triples.parquet')""",
        # annotations.rq as a recursive CTE: isPartOf* closure (up),
        # branch 1 = triples of every part; branch 2 = inbound
        # references resolved through the commit-less ref key, emitting
        # part isReferencedBy src + every triple of src
        "kg_annotations": f"""
            WITH RECURSIVE t AS (
              SELECT subj, pred, obj_type, obj_value
              FROM read_parquet('{kg_cache}/expected_triples.parquet')
            ), docs AS (
              SELECT DISTINCT subj AS anchor FROM t
              WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                AND obj_value = 'http://purl.org/ontology/bibo/Document'
            ), up AS (
              SELECT anchor AS node, anchor FROM docs
              UNION
              SELECT t.subj AS node, up.anchor FROM t
              JOIN up ON t.obj_value = up.node
              WHERE t.pred = 'http://purl.org/dc/terms/isPartOf'
            ), b1 AS (
              SELECT up.anchor, t.subj, t.pred, t.obj_type, t.obj_value
              FROM t JOIN up ON t.subj = up.node
            ), dockeys AS (
              SELECT anchor AS doc_uri,
                     'https://example.org/ref/' || regexp_extract(
                         anchor,
                         '^https://example\\.org/res/(.*)@[0-9a-f]+$',
                         1) AS ref_key
              FROM docs
            ), refs AS (
              SELECT subj AS ref_src,
                     regexp_replace(obj_value, '#S[0-9.]+$', '')
                         AS ref_key,
                     COALESCE(regexp_extract(obj_value,
                                             '(#S[0-9.]+)$', 1), '')
                         AS ref_frag
              FROM t WHERE pred = 'http://purl.org/dc/terms/references'
            ), resolved AS (
              SELECT r.ref_src, d.doc_uri || r.ref_frag AS part
              FROM refs r JOIN dockeys d USING (ref_key)
            ), hit AS (
              SELECT r.ref_src, r.part, up.anchor
              FROM resolved r JOIN up ON r.part = up.node
            ), b2a AS (
              SELECT anchor, part AS subj,
                     'http://purl.org/dc/terms/isReferencedBy' AS pred,
                     'uri' AS obj_type, ref_src AS obj_value FROM hit
            ), b2b AS (
              SELECT DISTINCT h.anchor, t.subj, t.pred, t.obj_type,
                     t.obj_value
              FROM t JOIN (SELECT DISTINCT ref_src, anchor FROM hit) h
              ON t.subj = h.ref_src
            )
            SELECT DISTINCT * FROM (
              SELECT * FROM b1 UNION ALL SELECT * FROM b2a
              UNION ALL SELECT * FROM b2b
            )""",
        # 64-bit SimHash with the md5 token hash (md5_number_lower
        # identity); band blocking has exact recall for hamming<=3
        # (pigeonhole over 4 bands), so the pipeline's pair set equals
        # this all-pairs SQL
        "docs_simhash_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS tok
              FROM documents
            ), th AS (
              SELECT doc_id, md5_number_lower(tok) AS h FROM toks
            ), bits AS (
              SELECT doc_id, bit,
                     sum(CASE WHEN (h >> bit) & 1 = 1
                         THEN 1 ELSE -1 END) AS vote
              FROM th, (SELECT unnest(range(0, 64)) AS bit) b
              GROUP BY doc_id, bit
            ), sh AS (
              SELECT doc_id,
                     sum(CASE WHEN vote > 0
                         THEN (CAST(1 AS UBIGINT)
                               << CAST(bit AS INTEGER))
                         ELSE 0 END) AS simhash
              FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(CAST(a.simhash AS UBIGINT),
                                      CAST(b.simhash AS UBIGINT)))
                        AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(CAST(a.simhash AS UBIGINT),
                                CAST(b.simhash AS UBIGINT))) <= 3""",
        # the LegalRef grammar runs on a deterministic per-doc
        # citation ("enligt {K} kap. {P} § {law}"); the oracle
        # reconstructs its structured output with arithmetic
        "docs_legal_refs": """
            WITH base AS (
              SELECT doc_id,
                     CASE doc_id % 3 WHEN 0 THEN '1962:700'
                                     WHEN 1 THEN '1942:740'
                                     ELSE '1974:152' END AS law,
                     CAST(1 + doc_id % 17 AS VARCHAR) AS chapter,
                     CAST(1 + doc_id % 29 AS VARCHAR) AS section
              FROM documents
            )
            SELECT doc_id, law, chapter, section,
                   'https://lagen.nu/' || law || '#K' || chapter
                     || 'P' || section AS uri
            FROM base""",
        # the five role parsers (rattsfall/forarbeten/eulag/avg/ecj)
        # run on a deterministic per-doc citation picked by doc_id % 5;
        # the oracle mints the same URI with arithmetic + CASE
        "docs_citation_roles": """
            SELECT doc_id, CAST(doc_id % 5 AS BIGINT) AS role,
              CASE doc_id % 5
                WHEN 0 THEN 'https://lagen.nu/dom/nja/'
                  || (1990 + doc_id % 30) || 's' || (10 + doc_id % 90)
                WHEN 1 THEN 'https://lagen.nu/prop/'
                  || (1990 + doc_id % 30) || '/'
                  || lpad(CAST((1991 + doc_id % 30) % 100 AS VARCHAR),
                          2, '0')
                  || ':' || (1 + doc_id % 200)
                WHEN 2 THEN 'https://lagen.nu/ext/celex/3'
                  || (1970 + doc_id % 30) || 'L'
                  || lpad(CAST(1 + doc_id % 600 AS VARCHAR), 4, '0')
                WHEN 3 THEN 'https://lagen.nu/avg/jk/'
                  || (100 + doc_id % 800) || '-'
                  || lpad(CAST(doc_id % 99 AS VARCHAR), 2, '0')
                  || '-40'
                ELSE 'https://lagen.nu/ext/celex/6'
                  || (2000 + doc_id % 30) || 'CJ'
                  || lpad(CAST(1 + doc_id % 300 AS VARCHAR), 4, '0')
              END AS uri
            FROM documents""",
        # connected components (min-id label) over the exact-recall
        # SimHash pair graph as a recursive-CTE reachability; shared
        # by the cluster-assignment and keep-best queries
        "docs_neardup_clusters": _SIMHASH_CLUSTER_CTE + """
            SELECT doc_id, cluster_id FROM cl""",
        "docs_dedup_keep_best": _SIMHASH_CLUSTER_CTE + """
            , sz AS (
              SELECT cluster_id, count(*) AS cluster_size
              FROM cl GROUP BY cluster_id
            ), best AS (
              SELECT c.doc_id, c.cluster_id, d.n_chars,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC,
                                                 c.doc_id) AS rn
              FROM cl c JOIN documents d ON d.doc_id = c.doc_id
            )
            SELECT b.doc_id, b.cluster_id,
                   CAST(s.cluster_size AS BIGINT) AS cluster_size,
                   b.n_chars
            FROM best b JOIN sz s ON s.cluster_id = b.cluster_id
            WHERE b.rn = 1""",
        # per-language token-budget head: md5-ordered window cumsum,
        # keep while the running total stays <= 2000 (the engine runs
        # a distributed prefix sum over md5 hash ranges)
        "docs_token_budget": r"""
            WITH t AS (
              SELECT doc_id, lang,
                     CAST(len(regexp_extract_all(text, '\S+'))
                          AS BIGINT) AS n_tokens,
                     CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                          & 9223372036854775807 AS BIGINT) AS h
              FROM documents
            ), c AS (
              SELECT doc_id, lang, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY lang
                                         ORDER BY h, doc_id
                                         ROWS UNBOUNDED PRECEDING)
                         AS cum
              FROM t
            )
            SELECT doc_id, lang, n_tokens,
                   CAST(cum AS BIGINT) AS cum_tokens
            FROM c WHERE cum <= 2000""",
        # source srcK keeps fraction (K+1)/20 by md5 threshold — the
        # integer threshold (K+1)*50000 is computed exactly on both
        # sides (no float rounding in the comparison)
        "docs_weighted_mix": """
            SELECT doc_id, source FROM documents
            WHERE (md5_number_lower(CAST(doc_id AS VARCHAR) || ':mix')
                   & 9223372036854775807) % 1000000
                  < (1 + CAST(substr(source, 4) AS BIGINT)) * 50000""",
        # upper-triangle population covariance of the embedding dims:
        # the engine ships one keyed partial-sum row set per batch;
        # the oracle unnests and aggregates per dimension pair
        "embeddings_covariance": """
            WITH x AS (
              SELECT vec_id, CAST(t.i AS BIGINT) AS i,
                     CAST(embedding[CAST(t.i AS INTEGER) + 1]
                          AS DOUBLE) AS v
              FROM embeddings, unnest(range(0, 64)) t(i)
            )
            SELECT a.i AS i, b.i AS j,
                   round(sum(a.v * b.v) / count(*)
                         - (sum(a.v) / count(*))
                           * (sum(b.v) / count(*)), 6) AS cov
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i""",
        # the full cleaning composition: the clean_corpus legs (exact
        # dedup + repetition gates + decontamination) further
        # intersected with the SimHash near-dup keep-best set
        "docs_clean_corpus_v2": _SIMHASH_CLUSTER_CTE + r"""
            , best AS (
              SELECT c.doc_id,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC,
                                                 c.doc_id) AS rn
              FROM cl c JOIN documents d ON d.doc_id = c.doc_id
            ), kept AS (
              SELECT doc_id FROM best WHERE rn = 1
            ), t2 AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text),
                                                    '\s+'),
                                 x -> x != '') AS w,
                     string_split(text, chr(10)) AS lines,
                     text
              FROM documents
            ), keep AS (
              SELECT min(doc_id) AS doc_id FROM documents
              GROUP BY text
            ), rep AS (
              SELECT doc_id FROM t2
              WHERE 1.0 - len(list_distinct(lines))
                      / CAST(greatest(len(lines), 1) AS DOUBLE) < 0.3
                AND 1.0 - len(list_distinct(w))
                      / CAST(greatest(len(w), 1) AS DOUBLE) < 0.7
                AND len(w) >= 5
            ), bench AS (
              SELECT DISTINCT array_to_string(w[1:8], ' ') AS gram
              FROM t2 WHERE doc_id % 50 = 0 AND len(w) >= 8
            ), grams AS (
              SELECT doc_id,
                     unnest([array_to_string(w[i:i+7], ' ')
                             for i in generate_series(
                                 1, greatest(len(w) - 7, 0))])
                         AS gram
              FROM t2
            ), dirty AS (
              SELECT DISTINCT g.doc_id
              FROM grams g JOIN bench b ON g.gram = b.gram
            )
            SELECT k.doc_id FROM keep k
            JOIN rep r USING (doc_id)
            JOIN kept USING (doc_id)
            WHERE k.doc_id NOT IN (SELECT doc_id FROM dirty)""",
        # user growth curve: cumulative distinct users by first-seen
        # hour (no window COUNT(DISTINCT) needed)
        "events_cumulative_users": """
            WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events
                       GROUP BY user_id),
            h AS (SELECT date_trunc('hour', first_ts) AS hr,
                         count(*) AS c
                  FROM f GROUP BY 1)
            SELECT hr, CAST(sum(c) OVER (ORDER BY hr) AS BIGINT)
                       AS cum_users
            FROM h""",
        # per-user EWMA final state (adjust=False recursion) as its
        # closed form: weight a(1-a)^(k-1) for the k-th-latest event,
        # (1-a)^(n-1) for the first
        "kg_predicate_profile": f"""
            WITH t AS (
              SELECT pred, subj, obj_value
              FROM read_parquet('{kg_cache}/expected_triples.parquet'))
            SELECT pred, count(*) AS n_triples,
                   count(DISTINCT subj) AS n_subjects,
                   count(DISTINCT obj_value) AS n_objects,
                   count(*) = count(DISTINCT subj) AS functional
            FROM t GROUP BY pred ORDER BY pred""",
        "kg_required_predicates": f"""
            WITH t AS (
              SELECT subj, pred
              FROM read_parquet('{kg_cache}/expected_triples.parquet')),
            docs AS (SELECT DISTINCT subj FROM t WHERE pred =
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
            req(p) AS (VALUES
              ('http://purl.org/dc/terms/title'),
              ('http://purl.org/dc/terms/subject')),
            have AS (SELECT DISTINCT subj, pred FROM t
                     WHERE pred IN (
                       'http://purl.org/dc/terms/title',
                       'http://purl.org/dc/terms/subject'))
            SELECT d.subj, r.p AS missing_pred
            FROM docs d CROSS JOIN req r
            LEFT JOIN have h ON h.subj = d.subj AND h.pred = r.p
            WHERE h.subj IS NULL""",
        "kg_entity_mention_stats": f"""
            WITH t AS (
              SELECT subj, pred, obj_value
              FROM read_parquet('{kg_cache}/expected_triples.parquet')),
            m AS (SELECT subj, obj_value AS entity FROM t
                  WHERE pred = 'http://purl.org/dc/terms/subject'),
            l AS (SELECT subj AS entity, obj_value AS label FROM t
                  WHERE pred =
                    'http://www.w3.org/2000/01/rdf-schema#label')
            SELECT m.entity, l.label, count(*) AS n_mentions,
                   count(DISTINCT m.subj) AS n_docs
            FROM m LEFT JOIN l ON l.entity = m.entity
            GROUP BY m.entity, l.label""",
        "kg_type_predicate_matrix": f"""
            WITH t AS (
              SELECT subj, pred, obj_value
              FROM read_parquet('{kg_cache}/expected_triples.parquet')),
            ty AS (SELECT DISTINCT subj, obj_value AS type FROM t
                   WHERE pred =
                     'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'),
            pr AS (SELECT DISTINCT subj, pred FROM t)
            SELECT ty.type, pr.pred, count(*) AS n_subjects
            FROM pr JOIN ty ON ty.subj = pr.subj
            GROUP BY ty.type, pr.pred""",
        "events_funnel": """
            WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                  JOIN v ON v.user_id = e.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.t1
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                  JOIN c ON c.user_id = e.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.t2
                  GROUP BY e.user_id)
            SELECT 1 AS step, 'view' AS event_type,
                   (SELECT count(*) FROM v) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
            UNION ALL SELECT 3, 'purchase',
                      (SELECT count(*) FROM p)""",
        "docs_dedup_report": """
            WITH sizes AS (
              SELECT text, count(*) AS n FROM documents
              GROUP BY text),
            w AS (
              SELECT doc_id,
                     list_sort(list_distinct(
                         regexp_extract_all(text, '\\S+'))) AS ws
              FROM documents),
            pairs AS (
              SELECT 1 FROM w a JOIN w b
                ON a.ws = b.ws AND a.doc_id < b.doc_id)
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   CAST(COALESCE((SELECT SUM(n) FROM sizes
                                  WHERE n > 1), 0) AS BIGINT)
                     AS n_exact_dup_docs,
                   (SELECT count(*) FROM pairs) AS n_neardup_pairs""",
        "events_conversion_lag": """
            WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t1, min(v.t0) AS t0
                  FROM events e JOIN v ON v.user_id = e.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > v.t0
                  GROUP BY e.user_id)
            SELECT user_id,
                   CAST(floor(epoch(t1 - t0) / 60) AS BIGINT)
                     AS lag_minutes
            FROM p""",
        "events_cohort_retention": """
            WITH s AS (
              SELECT user_id,
                     CAST(floor(epoch(min(ts)) / 604800) AS BIGINT)
                       AS cw
              FROM events WHERE event_type = 'signup'
              GROUP BY user_id),
            a AS (
              SELECT DISTINCT e.user_id, s.cw,
                     CAST(floor(epoch(e.ts) / 604800) AS BIGINT)
                       - s.cw AS wk
              FROM events e JOIN s ON s.user_id = e.user_id),
            c AS (SELECT cw, wk, count(*) AS n_active FROM a
                  WHERE wk >= 0 AND wk <= 8 GROUP BY cw, wk),
            z AS (SELECT cw, count(*) AS n_cohort FROM s GROUP BY cw)
            SELECT c.cw AS cohort_week, c.wk AS week_offset,
                   c.n_active,
                   round(c.n_active * 1.0 / z.n_cohort, 6)
                     AS retention
            FROM c JOIN z ON z.cw = c.cw""",
        "events_user_ewma": """
            WITH r AS (
              SELECT user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC,
                                                 event_id DESC) AS k,
                     count(*) OVER (PARTITION BY user_id) AS n
              FROM events
            )
            SELECT user_id,
                   round(sum(CASE WHEN k = n
                             THEN power(0.9, n - 1) * value
                             ELSE 0.1 * power(0.9, k - 1) * value
                             END), 6) AS ewma
            FROM r GROUP BY user_id""",
        # the assembled training mixture: train split AND source mix
        # filters, then the per-language token-budget head over the
        # SURVIVORS (cumsum restarts on the filtered stream)
        "docs_training_mixture": r"""
            WITH surv AS (
              SELECT doc_id, lang,
                     CAST(len(regexp_extract_all(text, '\S+'))
                          AS BIGINT) AS n_tokens,
                     CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                          & 9223372036854775807 AS BIGINT) AS h
              FROM documents
              WHERE (md5_number_lower(CAST(doc_id AS VARCHAR)
                                      || ':mix')
                     & 9223372036854775807) % 1000000
                    < (1 + CAST(substr(source, 4) AS BIGINT)) * 50000
                AND (md5_number_lower(CAST(doc_id AS VARCHAR)
                                      || ':split')
                     & 9223372036854775807) % 1000000 < 800000
            ), c AS (
              SELECT doc_id, lang, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY lang
                                         ORDER BY h, doc_id
                                         ROWS UNBOUNDED PRECEDING)
                         AS cum
              FROM surv
            )
            SELECT doc_id, lang, n_tokens,
                   CAST(cum AS BIGINT) AS cum_tokens
            FROM c WHERE cum <= 1200""",
        # per-group exact quantiles via the bounded-domain histogram
        # (k-th smallest order statistic per lang)
        "docs_length_quantiles": """
            WITH r AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents
            )
            SELECT r.lang, q.q, r.n_chars AS value
            FROM r JOIN (VALUES (0.25), (0.5), (0.95)) q(q)
              ON r.rn = CAST(ceil(q.q * r.n) AS BIGINT)""",
        # deterministic 80/10/10 split by salted md5 fraction
        "docs_train_split": """
            SELECT doc_id,
                   CASE WHEN (md5_number_lower(
                                CAST(doc_id AS VARCHAR) || ':split')
                              & 9223372036854775807) % 1000000
                             < 800000 THEN 'train'
                        WHEN (md5_number_lower(
                                CAST(doc_id AS VARCHAR) || ':split')
                              & 9223372036854775807) % 1000000
                             < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents""",
        # percentile-thresholded quality gate: keep docs at or above
        # the corpus p25 of alpha_ratio (exact k-th-smallest via the
        # bounded-domain histogram; SQL states the same order
        # statistic with a window)
        "docs_quality_filter": """
            WITH qual AS ({DOCS_QUALITY}),
            r AS (SELECT doc_id, alpha_ratio,
                         row_number() OVER (ORDER BY alpha_ratio,
                                            doc_id) AS rn,
                         count(*) OVER () AS n
                  FROM qual)
            SELECT doc_id, alpha_ratio FROM r
            WHERE alpha_ratio >= (SELECT alpha_ratio FROM r
                                  WHERE rn = CAST(ceil(0.25 * n)
                                                  AS BIGINT) LIMIT 1)""",
        # Gopher rule gate (Rae et al. 2021 A1.1): flags computed on
        # 6-digit half-away-rounded ratios on BOTH sides so no ulp can
        # flip a threshold; words = single-space split on both sides
        "kg_entity_cooccurrence": cooccur_sql,
        "docs_weighted_sample": """
            WITH w AS (SELECT doc_id, len(text) AS n_chars
                       FROM documents),
            keyed AS (
              SELECT doc_id, n_chars,
                     pow(md5_number_lower(doc_id || ':ares')
                         / 18446744073709551616.0,
                         1.0 / n_chars) AS key
              FROM w WHERE n_chars > 0)
            SELECT doc_id, n_chars FROM keyed
            ORDER BY key DESC, doc_id LIMIT 50""",
        "kg_entity_embeddings": f"""
            WITH m AS ({mention_union}),
            j AS (
              SELECT m.alias, e.embedding
              FROM m JOIN embeddings e ON e.vec_id = m.doc_id),
            nd AS (SELECT alias, count(*) AS n_docs
                   FROM j GROUP BY alias),
            x AS (
              SELECT alias,
                     generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding) AS v
              FROM j)
            SELECT x.alias, nd.n_docs, x.dim,
                   round(avg(x.v), 4) AS value
            FROM x JOIN nd ON nd.alias = x.alias
            GROUP BY x.alias, nd.n_docs, x.dim""",
        "docs_c4_rules": """
            WITH d AS (
              SELECT doc_id, CASE CAST(doc_id % 13 AS INT)
                WHEN 1 THEN text || chr(10)
                  || 'Lorem ipsum dolor sit amet.'
                WHEN 3 THEN text || chr(10)
                  || 'function f() { return 1; }'
                WHEN 5 THEN text || chr(10)
                  || 'Enable javascript to continue'
                WHEN 7 THEN text || chr(10)
                  || 'See our privacy policy for details.'
                WHEN 9 THEN text || chr(10) || 'One. Two. Three.'
                ELSE text END AS text
              FROM documents),
            s AS (
              SELECT doc_id, text,
                     string_split(text, chr(10)) AS ls
              FROM d),
            t AS (
              SELECT doc_id,
                     len(ls) AS n_lines,
                     round(len(list_filter(ls, x ->
                             regexp_matches(x, '[.!?"]$'))) * 1.0
                           / greatest(len(ls), 1), 6)
                       AS frac_terminal_punct,
                     CAST(len(regexp_extract_all(text, '[.!?]'))
                          AS BIGINT) AS n_sentences,
                     regexp_matches(text, '(?i)lorem ipsum')
                       AS has_lorem,
                     contains(text, '{') AS has_brace,
                     regexp_matches(text, '(?i)javascript')
                       AS has_javascript,
                     regexp_matches(text,
                       '(?i)privacy policy|terms of use|cookie policy')
                       AS has_policy
              FROM s)
            SELECT doc_id, n_lines, frac_terminal_punct, n_sentences,
                   has_lorem, has_brace, has_javascript, has_policy,
                   (n_sentences >= 1 AND frac_terminal_punct >= 0.5
                    AND NOT has_lorem AND NOT has_brace
                    AND NOT has_javascript AND NOT has_policy)
                     AS passes_c4
            FROM t""",
        "docs_gopher_rules": f"""
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws, text
              FROM documents
            ), m AS (
              SELECT doc_id, len(ws) AS n_words,
                     floor(list_sum(list_transform(ws,
                               x -> length(x)))::DOUBLE
                           / greatest(len(ws), 1) * 1e6 + 0.5) / 1e6
                         AS mean_word_len,
                     floor(list_sum(list_transform(ws,
                               x -> CASE WHEN regexp_matches(x,
                                              '[A-Za-z]')
                                    THEN 1 ELSE 0 END))::DOUBLE
                           / greatest(len(ws), 1) * 1e6 + 0.5) / 1e6
                         AS frac_alpha_words,
                     floor((len(regexp_extract_all(text, '#'))
                            + len(regexp_extract_all(text,
                                  '\\.\\.\\.')))::DOUBLE
                           / greatest(len(ws), 1) * 1e6 + 0.5) / 1e6
                         AS symbol_ratio,
                     CAST({_GOPHER_STOP_SQL} AS BIGINT) AS n_stop_hits
              FROM w
            )
            SELECT doc_id, n_words, mean_word_len, frac_alpha_words,
                   symbol_ratio, n_stop_hits,
                   n_words BETWEEN 50 AND 100000 AS pass_word_count,
                   mean_word_len BETWEEN 3.0 AND 10.0
                       AS pass_mean_word_len,
                   symbol_ratio <= 0.1 AS pass_symbol_ratio,
                   frac_alpha_words >= 0.8 AS pass_alpha_words,
                   n_stop_hits >= 2 AS pass_stopwords,
                   (n_words BETWEEN 50 AND 100000
                    AND mean_word_len BETWEEN 3.0 AND 10.0
                    AND symbol_ratio <= 0.1
                    AND frac_alpha_words >= 0.8
                    AND n_stop_hits >= 2) AS passes_gopher
            FROM m""",
        # unicode NFC + control strip + whitespace collapse + trim +
        # lowercase (NFKC has no DuckDB twin; pytest-pinned instead)
        "docs_normalize": r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(
                        lower(nfc_normalize(text)),
                        '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                        '\s+', ' ', 'g'), ' ') AS norm_text,
                   length(text) AS n_chars_before,
                   length(trim(regexp_replace(regexp_replace(
                        lower(nfc_normalize(text)),
                        '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                        '\s+', ' ', 'g'), ' ')) AS n_chars_after
            FROM documents""",
        # one-row dataset-card summary (every component a distributed
        # aggregate; only six scalars reach the driver)
        "docs_corpus_stats": r"""
            SELECT count(*) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text, '\S+')))
                        AS BIGINT) AS n_tokens,
                   count(DISTINCT lang) AS n_langs,
                   count(DISTINCT source) AS n_sources,
                   count(DISTINCT text) AS n_distinct_texts,
                   round(avg(n_chars), 4) AS mean_chars
            FROM documents""",
        # NEAR-duplicate decontamination: word-set Jaccard vs the
        # every-50th-doc benchmark set, threshold on the ROUNDED value
        # (both sides round to 6 digits before the >= comparison)
        "docs_fuzzy_decontaminate": r"""
            WITH w AS (
              SELECT doc_id,
                     list_distinct(regexp_extract_all(text, '\S+'))
                         AS ws
              FROM documents
            ), tok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
            sizes AS (SELECT doc_id, len(ws) AS n FROM w),
            ptok AS (
              SELECT doc_id AS pid, tok FROM tok WHERE doc_id % 50 = 0
            ), inter AS (
              SELECT t.doc_id, p.pid, count(*) AS i
              FROM tok t JOIN ptok p USING (tok)
              GROUP BY t.doc_id, p.pid
            ), j AS (
              SELECT i.doc_id,
                     max(CAST(i.i AS DOUBLE) / (s.n + ps.n - i.i))
                         AS mj
              FROM inter i JOIN sizes s ON s.doc_id = i.doc_id
                   JOIN sizes ps ON ps.doc_id = i.pid
              GROUP BY i.doc_id
            )
            SELECT d.doc_id,
                   round(coalesce(j.mj, 0), 6) AS max_jaccard,
                   round(coalesce(j.mj, 0), 6) >= 0.5 AS contaminated
            FROM documents d LEFT JOIN j ON j.doc_id = d.doc_id""",
        # per-user z-score anomaly detection: population moments per
        # user, events beyond 3 sigma of the user's own mean
        "events_user_zscore": """
            WITH s AS (
              SELECT user_id, avg(value) AS m,
                     stddev_pop(value) AS sd
              FROM events GROUP BY user_id
            )
            SELECT e.event_id, e.user_id, round(e.value, 6) AS value,
                   round((e.value - s.m) / s.sd, 4) AS zscore
            FROM events e JOIN s USING (user_id)
            WHERE s.sd > 0 AND abs(e.value - s.m) / s.sd > 3""",
        # minhash-verified dup pairs are word-set equivalence classes,
        # so the cluster min is a plain window min over the partition
        "docs_minhash_clusters": r"""
            WITH w AS (
              SELECT doc_id,
                     list_sort(list_distinct(
                         regexp_extract_all(text, '\S+'))) AS ws
              FROM documents
            )
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY ws) AS cluster_id
            FROM w""",
        # per-epoch deterministic shard assignment (multi-epoch
        # training layout): md5(epoch:id) mod n_shards, 2 epochs
        "docs_epoch_shards": """
            SELECT doc_id, CAST(t.e AS BIGINT) AS epoch,
                   CAST((md5_number_lower(CAST(t.e AS VARCHAR) || ':'
                                          || CAST(doc_id AS VARCHAR))
                         & 9223372036854775807) % 8 AS BIGINT)
                       AS shard
            FROM documents, unnest(range(0, 2)) t(e)""",
        # docs_minhash_pairs / lsh_ann_topk / embeddings_pca:
        # intentionally no SQL equivalent (sketch-estimate /
        # approximate-by-design / eigendecomposition) → driver records
        # rows-only checks; their exactness properties are
        # pytest-verified (recall vs brute force, subset vs exact
        # jaccard, eigh vs the oracle-checked covariance).
    }
    # the quality-filter oracle embeds the docs_quality SQL as a CTE
    d["docs_quality_filter"] = d["docs_quality_filter"].replace(
        "{DOCS_QUALITY}", d["docs_quality"])
    # SemDeDup: the unrolled-kmeans assignment feeds an EXISTS
    # lower-id-same-cluster-neighbor check on 6-digit rounded cosines
    d["embeddings_semdedup"] = """
        WITH asg AS ({KMEANS}),
        p AS (SELECT a.vec_id, a.cluster, e.embedding::DOUBLE[] AS x
              FROM asg a JOIN embeddings e USING (vec_id))
        SELECT p.vec_id, p.cluster,
               NOT EXISTS (
                 SELECT 1 FROM p q
                 WHERE q.cluster = p.cluster AND q.vec_id < p.vec_id
                   AND round(list_cosine_similarity(q.x, p.x), 6)
                       >= 0.4) AS keep
        FROM p ORDER BY vec_id""".replace(
        "{KMEANS}", d["embeddings_kmeans"])
    d.update(_code_symbol_oracles(kg_cache))
    return d


def _code_symbol_oracles(kg_cache: str) -> dict[str, str]:
    """Oracles for the symbol-extraction family, generated from the
    SAME pattern tables the operators compile
    (``code_quality.SYMBOL_PATTERNS`` / ``IMPORT_PATTERNS``) — the
    regex strings are shared so operator and oracle can only diverge
    on ENGINE behavior (polars/Rust-regex vs DuckDB/RE2), which is
    exactly what the hash compare should catch."""
    from ferenda_ray.stages.code_quality import (DECISION_PATTERNS,
                                                 DEFINES_PRED,
                                                 IMPORT_PATTERNS,
                                                 REQUIRES_PRED,
                                                 SECRET_PATTERNS,
                                                 SYMBOL_PATTERNS)
    secret_re = "|".join(p for _, p in SECRET_PATTERNS)
    cx_expr = "CASE " + " ".join(
        f"WHEN lang = '{lang}' THEN "
        f"len(regexp_extract_all(content, '{pat}'))"
        for lang, pat in DECISION_PATTERNS.items()) + " ELSE 0 END"
    src = (f"SELECT repo, path, lang, content FROM "
           f"read_parquet('{kg_cache}/sources.parquet')")
    sym_legs = "\nUNION ALL\n".join(
        f"SELECT repo, path, lang, '{kind}' AS kind, "
        f"unnest(regexp_extract_all(content, '{pat}', 1)) AS name "
        f"FROM src WHERE lang = '{lang}'"
        for lang, kinds in SYMBOL_PATTERNS.items()
        for kind, pat in kinds)
    imp_legs = "\nUNION ALL\n".join(
        f"SELECT repo, path, lang, "
        f"unnest(regexp_extract_all(content, '{pat}', 1)) AS module "
        f"FROM src WHERE lang = '{lang}'"
        for lang, pat in IMPORT_PATTERNS.items())
    subj = "'https://example.org/res/' || repo || '/' || path"
    return {
        "code_symbols": f"WITH src AS ({src})\n{sym_legs}",
        # delta-maintained view must equal the full rebuild
        "code_symbols_incremental":
            f"WITH src AS ({src})\n{sym_legs}",
        "code_imports": f"WITH src AS ({src})\n{imp_legs}",
        "code_symbol_stats": f"""
            WITH src AS ({src}), u AS ({sym_legs})
            SELECT repo,
                   count(*) FILTER (WHERE kind = 'function')
                       AS n_functions,
                   count(*) FILTER (WHERE kind = 'class') AS n_classes,
                   count(*) FILTER (WHERE kind = 'method') AS n_methods
            FROM u GROUP BY repo""",
        "code_symbol_triples": f"""
            WITH src AS ({src}), u AS ({sym_legs}), m AS ({imp_legs})
            SELECT {subj} AS subj, '{DEFINES_PRED}' AS pred,
                   'uri' AS obj_type,
                   {subj} || '#' || kind || '.' || name AS obj_value
            FROM u
            UNION ALL
            SELECT {subj}, '{REQUIRES_PRED}', 'uri',
                   'https://example.org/module/' || module
            FROM m""",
        # secret scan: the oracle injects the SAME deterministic key
        # line (ordinal %13==3, AKIA + upper(md5(path)[:16])) before
        # scanning, then counts/redacts with the same alternation
        "code_secrets_scan": f"""
            WITH src AS ({src}),
            inj AS (
              SELECT repo, path,
                     CASE WHEN CAST(regexp_extract(path, 'mod_(\\d+)',
                                                   1) AS INT)
                               % 13 = 3
                          THEN content || chr(10) || '# key AKIA'
                               || upper(substr(md5(path), 1, 16))
                          ELSE content END AS content
              FROM src)
            SELECT repo, path,
                   CAST(len(regexp_extract_all(content, '{secret_re}'))
                        AS BIGINT) AS n_secret_hits,
                   len(regexp_extract_all(content, '{secret_re}')) > 0
                       AS has_secret,
                   md5(regexp_replace(content, '{secret_re}',
                                      '<SECRET>', 'g')) AS scrubbed_md5
            FROM inj""",
        # cyclomatic estimate: same per-language decision alternation
        "code_complexity": f"""
            WITH src AS ({src})
            SELECT repo, path, lang,
                   CAST({cx_expr} AS BIGINT) AS decision_points,
                   CAST({cx_expr} AS BIGINT) + 1 AS cyclomatic
            FROM src""",
        # near-dup file resolution: the code_neardup_files pair graph
        # → recursive min-label components → keep longest per cluster
        "code_dedup_keep_best": f"""
            WITH RECURSIVE w AS (
              SELECT CAST(md5_number_lower(repo || ':' || path)
                          & 9223372036854775807 AS BIGINT) AS file_id,
                     len(content) AS n_chars,
                     list_distinct(regexp_extract_all(content,
                                                      '[A-Za-z0-9_]+'))
                       AS words
              FROM read_parquet('{{kg_cache}}/sources.parquet')),
            p AS (
              SELECT a.file_id AS id_a, b.file_id AS id_b
              FROM w a JOIN w b ON a.file_id < b.file_id
              WHERE CAST(len(list_intersect(a.words, b.words))
                         AS DOUBLE)
                    / len(list_distinct(a.words || b.words)) >= 0.6),
            e AS (SELECT id_a AS s, id_b AS d FROM p
                  UNION SELECT id_b, id_a FROM p),
            reach AS (
              SELECT file_id AS node, file_id AS label FROM w
              UNION
              SELECT e.d, reach.label FROM reach
              JOIN e ON e.s = reach.node),
            cl AS (SELECT node AS file_id, min(label) AS cluster_id
                   FROM reach GROUP BY node),
            sz AS (SELECT cluster_id, count(*) AS cluster_size
                   FROM cl GROUP BY cluster_id),
            best AS (
              SELECT c.file_id, c.cluster_id, w.n_chars,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY w.n_chars DESC,
                                                 c.file_id) AS rn
              FROM cl c JOIN w ON w.file_id = c.file_id)
            SELECT b.file_id, b.cluster_id,
                   CAST(s.cluster_size AS BIGINT) AS cluster_size,
                   CAST(b.n_chars AS BIGINT) AS n_chars
            FROM best b JOIN sz s USING (cluster_id)
            WHERE b.rn = 1""".replace("{kg_cache}", kg_cache),
    }


def _lang_expr(lang: str, words) -> str:
    inlist = ", ".join(f"'{w}'" for w in sorted(words))
    return (f"len(list_filter(toks, x -> x IN ({inlist})))"
            f" / CAST(greatest(len(toks), 1) AS DOUBLE)")


def _build_lang_id_sql() -> str:
    from ferenda_ray.stages.text_analysis import _LANG_PROFILES
    exprs = {lang: _lang_expr(lang, words)
             for lang, words in _LANG_PROFILES.items()}
    order = list(_LANG_PROFILES)  # en, de, fr, sv — Python dict order
    score_cols = ",\n".join(f"  {exprs[l]} AS s_{l}" for l in order)
    # first profile with the (strictly) best raw score wins; 'und' at 0
    best = "greatest(" + ", ".join(f"s_{l}" for l in order) + ")"
    pick = "CASE WHEN " + best + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in order) + " END"
    return f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x != '') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
{score_cols}
            FROM t
        )
        SELECT doc_id, {pick} AS lang_pred,
               floor({best} * 1000000 + 0.5) / 1000000 AS lang_score
        FROM s"""


_LANG_ID_SQL = _build_lang_id_sql()

#: the same per-doc prediction joined back to the true label (the
#: classifier confusion matrix)
_LANG_CONF_SQL = f"""
    WITH pred AS ({_LANG_ID_SQL})
    SELECT d.lang AS lang_true, pred.lang_pred, count(*) AS n
    FROM pred JOIN documents d ON d.doc_id = pred.doc_id
    GROUP BY d.lang, pred.lang_pred"""

#: SimHash pair graph (identical to the docs_simhash_pairs oracle) →
#: undirected edges → recursive reachability → min-reachable-id
#: cluster per doc (``cl``): the SQL restatement of distributed
#: min-label propagation (stages/canonicalize.label_propagation)
_SIMHASH_CLUSTER_CTE = r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
      FROM documents
    ), th AS (
      SELECT doc_id, md5_number_lower(tok) AS h FROM toks
    ), bits AS (
      SELECT doc_id, bit,
             sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM th, (SELECT unnest(range(0, 64)) AS bit) b
      GROUP BY doc_id, bit
    ), sh AS (
      SELECT doc_id,
             sum(CASE WHEN vote > 0
                 THEN (CAST(1 AS UBIGINT) << CAST(bit AS INTEGER))
                 ELSE 0 END) AS simhash
      FROM bits GROUP BY doc_id
    ), p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(CAST(a.simhash AS UBIGINT),
                          CAST(b.simhash AS UBIGINT))) <= 3
    ), e AS (
      SELECT id_a AS u, id_b AS v FROM p
      UNION SELECT id_b, id_a FROM p
    ), reach(u, v) AS (
      SELECT u, v FROM e
      UNION
      SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u
      WHERE e2.v <> r.u
    ), cl AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
      GROUP BY d.doc_id
    )"""
