"""Driver queries over the synthetic source-code corpus.

These run the :mod:`ferenda_ray.stages.code_quality` operators over
the SAME deterministic ``(repo, path, commit, lang, content)`` corpus
the flagship KG pipeline consumes (north-rule input shape), cached
per size under ``/tmp/ferenda_ray_corpus_<n>``.  Unlike the flagship
(whose oracle is the generator's golden triples), every query here is
checked against an INDEPENDENT DuckDB restatement over the raw
``sources.parquet`` — SQL recomputes the statistics from content, so
generator and operator cannot share a bug.

Thresholds for the gate query are tightened from the published Stack
defaults (1000/100/0.25) to values inside the synthetic corpus's
measured distribution (92/32/0.72) so BOTH branches of every flag are
exercised at every scale; the operator itself defaults to the
published numbers.
"""

from __future__ import annotations

import os


def _tier_n(sf_dir: str) -> int:
    """The ONE sf→corpus-size mapping (shared with the flagship)."""
    return 200 if "0.001" in sf_dir else (400 if "0.01" in sf_dir
                                          else 1200)


def _sources(sf_dir: str):
    """Corpus Dataset for the sf tier, generating the cache on first
    use (same n↔sf mapping as the flagship so the cache is shared)."""
    import ray.data as rd
    from ferenda_ray.corpus import CorpusSpec, write_corpus
    n = _tier_n(sf_dir)
    cache = f"/tmp/ferenda_ray_corpus_{n}"
    if not os.path.exists(os.path.join(cache, "sources.parquet")):
        write_corpus(CorpusSpec(n_files=n), cache)
    return rd.read_parquet(os.path.join(cache, "sources.parquet"))


def corpus_cache_path(sf_dir: str) -> str:
    """The sources.parquet path for the tier (oracle SQL reads it)."""
    return f"/tmp/ferenda_ray_corpus_{_tier_n(sf_dir)}/sources.parquet"


def code_stack_filters(sf_dir: str):
    """Stack-style per-file gates with corpus-calibrated thresholds
    (both branches of every flag populated — see module docstring)."""
    from ferenda_ray.stages.code_quality import stack_filters
    ds = stack_filters(_sources(sf_dir), max_line_len=92,
                       max_avg_line_len=32.0, min_alnum_frac=0.72)
    return ds.map_batches(
        lambda b: b.select(
            ["repo", "path", "lang", "n_lines", "max_line_len",
             "avg_line_len", "alnum_frac", "is_autogen",
             "pass_max_line", "pass_avg_line", "pass_alnum",
             "passes_stack"]),
        batch_format="pyarrow")


def code_comment_stats(sf_dir: str):
    """Per-file comment / blank / code line counts + comment_frac."""
    from ferenda_ray.stages.code_quality import comment_stats
    ds = comment_stats(_sources(sf_dir))
    return ds.map_batches(
        lambda b: b.select(
            ["repo", "path", "lang", "n_lines", "blank_lines",
             "comment_lines", "code_lines", "comment_frac"]),
        batch_format="pyarrow")


def code_repo_comment_rollup(sf_dir: str):
    """Repo-level comment density (one tiny groupby exchange)."""
    from ferenda_ray.stages.code_quality import repo_comment_rollup
    return repo_comment_rollup(_sources(sf_dir))


def code_xref_edges(sf_dir: str):
    """The file dependency edge list (multiplicity preserved)."""
    from ferenda_ray.stages.code_quality import xref_edges
    ds = xref_edges(_sources(sf_dir))
    return ds.map_batches(
        lambda b: b.select(["repo", "path", "dst_repo", "dst_path"]),
        batch_format="pyarrow")


def code_commit_diff(sf_dir: str):
    """Incremental maintenance over the code table itself:
    :func:`~ferenda_ray.stages.dedup.corpus_diff` keyed by the
    ``repo:path`` file node — an OLD snapshot (files with ordinal
    ``%10==0`` absent → ``added``; ordinal ``%10==5`` at a truncated
    revision → ``changed``; one phantom file present only in OLD →
    ``removed``) diffed against the current corpus.  Same two
    hash-side passes + one full-outer join as the documents variant;
    statuses feed ``sinks.upsert_partitioned`` in the kg_incremental
    composition."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import polars as pl
    import ray.data as rd

    from ferenda_ray.stages.dedup import corpus_diff

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "file": pc.binary_join_element_wise(
                b.column("repo").cast(pa.string()),
                b.column("path").cast(pa.string()), ":"),
            "content": b.column("content").cast(pa.string())})

    new = _sources(sf_dir).map_batches(keyed, batch_format="pyarrow")

    def make_old(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b)
              .with_columns(pl.col("file").str.extract(r"mod_(\d+)", 1)
                            .cast(pl.Int64).alias("__o"))
              .filter(pl.col("__o") % 10 != 0)
              .with_columns(
                  pl.when(pl.col("__o") % 10 == 5)
                  .then(pl.col("content").str.slice(0, 64))
                  .otherwise(pl.col("content")).alias("content"))
              .drop(["__o"]))
        t = df.to_arrow()
        return pa.table({"file": t.column("file").cast(pa.string()),
                         "content": t.column("content")
                                     .cast(pa.string())})

    phantom = rd.from_arrow(pa.table(
        {"file": pa.array(["org0/repo0:ghost.py"], pa.string()),
         "content": pa.array(["gone"], pa.string())}))
    old = new.map_batches(make_old,
                          batch_format="pyarrow").union(phantom)
    return corpus_diff(old, new, id_col="file", text_col="content")


def code_repo_summary(sf_dir: str):
    """Per-repo dashboard row composing three oracle-checked legs:
    comment rollup (files/lines/comment_frac), the Stack-gate pass
    rate, and per-language file counts.  Each leg reduces to O(repos)
    rows via its own distributed pass; the final compose is a polars
    join over those tiny tables on the driver (repos ≪ files — the
    same regime as ``doc_stats``)."""
    import polars as pl

    from ferenda_ray.stages.code_quality import (repo_comment_rollup,
                                                 stack_filters)
    from ferenda_ray.stages.text_analysis import _rha

    src = _sources(sf_dir)
    roll = pl.from_arrow(pa_concat(
        repo_comment_rollup(src).to_arrow_refs()))
    gates = stack_filters(src, max_line_len=92, max_avg_line_len=32.0,
                          min_alnum_frac=0.72)

    def per_repo_flags(b):
        import pyarrow as pa
        df = pl.from_arrow(b)
        return (df.group_by("repo")
                .agg(pl.col("passes_stack").cast(pl.Int64).sum()
                     .alias("n_pass"),
                     *[(pl.col("lang") == lg).cast(pl.Int64).sum()
                       .alias(f"n_{lg}")
                       for lg in ("python", "java", "go", "markdown")])
                .to_arrow())

    from ray.data.aggregate import Sum
    flags = (gates.map_batches(per_repo_flags, batch_format="pyarrow")
             .groupby("repo")
             .aggregate(Sum("n_pass", alias_name="n_pass"),
                        *[Sum(f"n_{lg}", alias_name=f"n_{lg}")
                          for lg in ("python", "java", "go",
                                     "markdown")]))
    fl = pl.from_arrow(pa_concat(flags.to_arrow_refs()))
    out = (roll.join(fl, on="repo", how="inner")
           .with_columns(
               _rha(pl.col("n_pass") / pl.col("n_files"), 6)
               .alias("stack_pass_rate"))
           .select(["repo", "n_files", "n_python", "n_java", "n_go",
                    "n_markdown", "total_lines", "comment_frac",
                    "stack_pass_rate"])
           .sort("repo"))
    return out.to_arrow()


def pa_concat(refs):
    """Concatenate a Dataset's arrow refs into one table (tiny
    post-aggregate results only)."""
    import ray
    import pyarrow as pa
    tables = [t for t in ray.get(refs) if t.num_rows]
    return pa.concat_tables(tables) if tables else pa.table({})


def code_neardup_files(sf_dir: str, threshold: float = 0.6):
    """Near-duplicate FILE detection across the whole corpus (clone /
    boilerplate discovery): exact pairwise Jaccard ≥ threshold over
    each file's identifier-token set, via the shared PPJoin
    prefix-filter kernel (:func:`ferenda_ray.stages.dedup.
    jaccard_pairs`).  File ids are ``md5_number_lower(repo:path)``
    int63 keys (DuckDB-parity, stable across runs and cluster
    sizes); tokens are ``[A-Za-z0-9_]+`` identifiers so formatting
    noise doesn't mask clones."""
    import polars as pl

    from ferenda_ray.stages.dedup import jaccard_pairs
    from ferenda_ray.stages.sample import _md5_int63

    def keyed(b):
        df = pl.from_arrow(b)
        nodes = df.select(
            (pl.col("repo") + ":" + pl.col("path")).alias("n")
        ).get_column("n").to_list()
        toks = df.select(
            pl.col("content").str.extract_all("[A-Za-z0-9_]+")
            .list.join(" ").alias("text"))
        import pyarrow as pa
        return pa.table({
            "file_id": pa.array(_md5_int63(nodes), pa.int64()),
            "text": toks.get_column("text").to_arrow()
                        .cast(pa.string())})

    ds = _sources(sf_dir).map_batches(keyed, batch_format="pyarrow")
    out = jaccard_pairs(ds, threshold=threshold, text_col="text",
                        id_col="file_id")
    from ferenda_ray.pipelines.relational import _round_cols
    return out.map_batches(lambda b: _round_cols(b, {"jaccard": 6}),
                           batch_format="pyarrow")


def code_xref_components(sf_dir: str):
    """Connected components of the file dependency graph (one row
    per file; component = lexicographic min ``repo:path`` node)."""
    from ferenda_ray.stages.code_quality import xref_components
    return xref_components(_sources(sf_dir))


def code_xref_pagerank(sf_dir: str):
    """PageRank over the symmetrized file dependency graph."""
    from ferenda_ray.stages.code_quality import xref_pagerank
    return xref_pagerank(_sources(sf_dir))


def code_symbols(sf_dir: str):
    """Per-file defined symbols (function/class/method per language)."""
    from ferenda_ray.stages.code_quality import symbol_defs
    return symbol_defs(_sources(sf_dir))


def code_imports(sf_dir: str):
    """Module-import edges as written in source, per language."""
    from ferenda_ray.stages.code_quality import module_imports
    return module_imports(_sources(sf_dir))


def code_symbol_stats(sf_dir: str):
    """Per-repo symbol inventory (functions / classes / methods)."""
    from ferenda_ray.stages.code_quality import symbol_repo_stats
    return symbol_repo_stats(_sources(sf_dir))


def code_symbol_triples(sf_dir: str):
    """The code-entity KG leg: defines + requires triples."""
    from ferenda_ray.stages.code_quality import symbol_triples
    return symbol_triples(_sources(sf_dir))


def code_dedup_keep_best(sf_dir: str, threshold: float = 0.6):
    """Near-dup FILE resolution — the step The-Stack-style pipelines
    run after pair detection: connected components over the
    :func:`code_neardup_files` pair graph, keep the LONGEST file per
    component (ties → min file_id); singletons survive.  Composes the
    shared :func:`~ferenda_ray.stages.dedup.neardup_clusters` /
    ``dedup_keep_best`` resolution kernels (measured-edge-count plan
    pick) on md5 int63 file keys with ``n_chars`` as the keep score."""
    import polars as pl
    import pyarrow as pa

    from ferenda_ray.stages.dedup import dedup_keep_best, jaccard_pairs
    from ferenda_ray.stages.sample import _md5_int63

    def keyed(b):
        df = pl.from_arrow(b)
        nodes = df.select(
            (pl.col("repo") + ":" + pl.col("path")).alias("n")
        ).get_column("n").to_list()
        toks = df.select(
            pl.col("content").str.extract_all("[A-Za-z0-9_]+")
            .list.join(" ").alias("text"),
            pl.col("content").str.len_chars().cast(pl.Int64)
            .alias("n_chars"))
        return pa.table({
            "file_id": pa.array(_md5_int63(nodes), pa.int64()),
            "text": toks.get_column("text").to_arrow()
                        .cast(pa.string()),
            "n_chars": toks.get_column("n_chars").to_arrow()})

    files = _sources(sf_dir).map_batches(
        keyed, batch_format="pyarrow").materialize()
    pairs = jaccard_pairs(files, threshold=threshold, text_col="text",
                          id_col="file_id")
    return dedup_keep_best(files, pairs, id_col="file_id",
                           score_col="n_chars")


def code_symbols_incremental(sf_dir: str):
    """Incremental maintenance of the DERIVED symbol table — the
    delta-view twin of ``kg_incremental`` (which proves the
    partitioned-sink flow; this one proves in-memory view
    maintenance): an OLD snapshot (ordinal %10==0 absent, %10==5 at a
    truncated revision) had its symbols extracted; the snapshot diff
    names the added/changed/removed files; the maintained view =
    old symbols MINUS (changed ∪ removed files) UNION re-extraction
    of ONLY (added ∪ changed) files.  The oracle is the plain
    full-corpus ``code_symbols`` restatement — delta-maintained must
    equal full rebuild.  The file sets ride as broadcast id sets
    (≪ corpus by construction); only delta files are re-parsed."""
    import polars as pl
    import pyarrow as pa
    import pyarrow.compute as pc

    from ferenda_ray.stages.code_quality import symbol_defs
    from ferenda_ray.stages.dedup import corpus_diff

    new_src = _sources(sf_dir)

    def make_old(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b)
              .with_columns(pl.col("path").str.extract(r"mod_(\d+)", 1)
                            .cast(pl.Int64).alias("__o"))
              .filter(pl.col("__o") % 10 != 0)
              .with_columns(
                  pl.when(pl.col("__o") % 10 == 5)
                  .then(pl.col("content").str.slice(0, 64))
                  .otherwise(pl.col("content")).alias("content"))
              .drop(["__o"]))
        return df.to_arrow().cast(b.schema)

    old_src = new_src.map_batches(make_old, batch_format="pyarrow")

    def keyed(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(
            (pl.col("repo") + ":" + pl.col("path")).alias("file"),
            pl.col("content"))
        t = df.to_arrow()
        return pa.table({"file": t.column("file").cast(pa.string()),
                         "content": t.column("content")
                                     .cast(pa.string())})

    delta = corpus_diff(old_src.map_batches(keyed,
                                            batch_format="pyarrow"),
                        new_src.map_batches(keyed,
                                            batch_format="pyarrow"),
                        id_col="file", text_col="content")
    rows = delta.take_all()                     # ≪ corpus by design
    refresh = pa.array(sorted(r["file"] for r in rows
                              if r["status"] in ("added", "changed")),
                       pa.string())
    drop = pa.array(sorted(r["file"] for r in rows
                           if r["status"] in ("changed", "removed")),
                    pa.string())

    def file_key(b: pa.Table) -> pa.Array:
        return pc.binary_join_element_wise(
            b.column("repo").cast(pa.string()),
            b.column("path").cast(pa.string()), ":")

    keep_old = symbol_defs(old_src).map_batches(
        lambda b: b.filter(pc.invert(pc.is_in(file_key(b),
                                              value_set=drop))),
        batch_format="pyarrow")
    fresh = symbol_defs(new_src.map_batches(
        lambda b: b.filter(pc.is_in(file_key(b), value_set=refresh)),
        batch_format="pyarrow"))
    return keep_old.union(fresh)


def code_complexity(sf_dir: str):
    """Per-file decision-point count + cyclomatic estimate."""
    import pyarrow as pa

    from ferenda_ray.stages.code_quality import complexity_stats
    ds = complexity_stats(_sources(sf_dir))
    return ds.map_batches(
        lambda b: b.select(["repo", "path", "lang", "decision_points",
                            "cyclomatic"]),
        batch_format="pyarrow")


def code_secrets_scan(sf_dir: str):
    """Secret detection + redaction over the code table.  The clean
    synthetic corpus carries no credentials, so the query DETERMINISTICALLY
    INJECTS one AWS-style key line into every file whose ordinal
    ``%13==3`` (``# key AKIA`` + upper(md5(path)[:16]) — derivable in
    SQL, so the oracle injects identically) before scanning; output
    carries ``md5(scrubbed)`` instead of the scrubbed text so the
    compare stays row-sized.  Both branches of ``has_secret`` are
    populated at every tier."""
    import hashlib

    import polars as pl
    import pyarrow as pa

    from ferenda_ray.stages.code_quality import secrets_scan

    def inject(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).with_columns(
            pl.col("path").str.extract(r"mod_(\d+)", 1)
            .cast(pl.Int64).alias("__o"))
        paths = df.get_column("path").to_list()
        keys = ["AKIA" + hashlib.md5(p.encode()).hexdigest()[:16].upper()
                for p in paths]
        df = (df.with_columns(pl.Series("__k", keys, pl.String))
              .with_columns(
                  pl.when(pl.col("__o") % 13 == 3)
                  .then(pl.col("content") + "\n# key " + pl.col("__k"))
                  .otherwise(pl.col("content")).alias("content"))
              .drop(["__o", "__k"]))
        return df.to_arrow()

    scanned = secrets_scan(
        _sources(sf_dir).map_batches(inject, batch_format="pyarrow"))

    def digest(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        md5s = [hashlib.md5(s.encode()).hexdigest()
                for s in df.get_column("scrubbed").to_list()]
        return (df.with_columns(
                    pl.Series("scrubbed_md5", md5s, pl.String))
                .select(["repo", "path", "n_secret_hits", "has_secret",
                         "scrubbed_md5"])).to_arrow()

    return scanned.map_batches(digest, batch_format="pyarrow")


def code_xref_degrees(sf_dir: str):
    """Per-file fan-out / fan-in over the dependency graph."""
    from ferenda_ray.stages.code_quality import xref_degrees
    ds = xref_degrees(_sources(sf_dir))
    return ds.map_batches(
        lambda b: b.select(["repo", "path", "lang",
                            "fan_out", "fan_in"]),
        batch_format="pyarrow")


# license-header variants injected into a DERIVED copy of the corpus
# cache: per-file pick by the engine md5 parity hash, covering every
# detector branch (each SPDX tag, each phrase form, and no-header).
# Both the Ray query and the DuckDB oracle read the SAME persisted
# sources_lic.parquet, so injection is input synthesis — detection is
# recomputed independently on each side.
_LIC_HEADERS: tuple = (
    "SPDX-License-Identifier: MIT",
    "SPDX-License-Identifier: MIT",
    "SPDX-License-Identifier: Apache-2.0",
    "SPDX-License-Identifier: Apache-2.0",
    "SPDX-License-Identifier: GPL-3.0-only",
    "SPDX-License-Identifier: BSD-3-Clause",
    "SPDX-License-Identifier: MPL-2.0",
    "Licensed under the MIT License.",
    "Licensed under the Apache License, Version 2.0.",
    "This file is part of a GNU General Public License project.",
    "Subject to the terms of the Mozilla Public License.",
    None,
)

_LIC_COMMENT = {"python": ("# ", ""), "go": ("// ", ""),
                "java": ("// ", ""), "markdown": ("<!-- ", " -->")}


def ensure_lic_cache(sf_dir: str) -> str:
    """Materialize ``sources_lic.parquet`` beside the shared cache
    (the header-free flagship cache is untouched) and return its
    path.  Pure pyarrow — no Ray — so ``oracle_sql()`` can call it
    driver-side before DuckDB reads the file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.stages.sample import md5_u64

    src = corpus_cache_path(sf_dir)
    lic = lic_cache_path(sf_dir)
    if not os.path.exists(lic):
        if not os.path.exists(src):            # ensure the base cache
            from ferenda_ray.corpus import CorpusSpec, write_corpus
            write_corpus(CorpusSpec(n_files=_tier_n(sf_dir)),
                         os.path.dirname(src))
        t = pq.read_table(src)
        repos = t.column("repo").to_pylist()
        paths = t.column("path").to_pylist()
        langs = t.column("lang").to_pylist()
        texts = t.column("content").to_pylist()
        out = []
        for r, p, L, c in zip(repos, paths, langs, texts):
            h = _LIC_HEADERS[md5_u64(f"{r}:{p}:lic") % len(_LIC_HEADERS)]
            if h is None:
                out.append(c)
            else:
                pre, post = _LIC_COMMENT.get(L, ("", ""))
                out.append(f"{pre}{h}{post}\n{c}")
        t = t.set_column(t.schema.get_field_index("content"),
                         "content", pa.array(out, t.column("content").type))
        # per-process tmp name: two concurrent builders (pytest
        # worker + oracle driver) must not interleave into one file
        tmp = f"{lic}.{os.getpid()}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, lic)
    return lic


def _sources_lic(sf_dir: str):
    """Corpus Dataset with deterministic license headers."""
    import ray.data as rd
    return rd.read_parquet(ensure_lic_cache(sf_dir))


def lic_cache_path(sf_dir: str) -> str:
    """The sources_lic.parquet path for the tier (oracle SQL input)."""
    return corpus_cache_path(sf_dir).replace("sources.parquet",
                                             "sources_lic.parquet")


def code_license_scan(sf_dir: str):
    """Per-file license id / family / permissive flag from the header
    probe (The Stack's license gate)."""
    from ferenda_ray.stages.code_quality import license_scan
    ds = license_scan(_sources_lic(sf_dir))
    return ds.map_batches(
        lambda b: b.select(["repo", "path", "lang", "license",
                            "license_family", "is_permissive"]),
        batch_format="pyarrow")


def code_repo_license(sf_dir: str):
    """Repo-level license posture: per-family counts + ``train_ok``
    (no copyleft file in the repo)."""
    from ferenda_ray.stages.code_quality import repo_license_rollup
    return repo_license_rollup(_sources_lic(sf_dir))


def code_triangles(sf_dir: str):
    """Triangle census + global clustering coefficient of the file
    dependency graph (undirected)."""
    import pyarrow as pa
    import polars as pl

    from ferenda_ray.stages.code_quality import xref_edges
    from ferenda_ray.stages.graph import triangle_stats

    def to_nodes(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select(
            (pl.col("repo") + ":" + pl.col("path")).alias("src"),
            (pl.col("dst_repo") + ":" + pl.col("dst_path"))
            .alias("dst")).to_arrow()

    e = xref_edges(_sources(sf_dir)).map_batches(
        to_nodes, batch_format="pyarrow")
    return triangle_stats(e)


def code_normalized_dups(sf_dir: str):
    """Comment-insensitive duplicate file groups.  The synthetic
    corpus has no comment-only forks, so files with ordinal %7==2
    (non-markdown) gain a mutated twin — same code, one extra comment
    line, path suffixed ``@mut`` — injected identically on BOTH
    sides; the expected dup groups are exactly those twin pairs."""
    import pyarrow as pa
    import polars as pl

    from ferenda_ray.stages.code_quality import normalized_dup_groups

    def add_twins(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).select(["repo", "path", "lang",
                                      "content"])
        tw = (df.with_columns(
                pl.col("path").str.extract(r"mod_(\d+)", 1)
                .cast(pl.Int64).alias("__o"))
              .filter((pl.col("__o") % 7 == 2)
                      & (pl.col("lang") != "markdown"))
              .with_columns(
                  (pl.col("path") + "@mut").alias("path"),
                  (pl.when(pl.col("lang") == "python")
                   .then(pl.lit("# mutated twin"))
                   .otherwise(pl.lit("// mutated twin"))
                   + "\n" + pl.col("content")).alias("content"))
              .drop(["__o"]))
        return pl.concat([df, tw]).to_arrow()

    src = _sources(sf_dir).map_batches(add_twins,
                                       batch_format="pyarrow")
    out = normalized_dup_groups(src)
    return out.map_batches(
        lambda b: b.select(["repo", "path", "lang", "norm_md5",
                            "group_size"]),
        batch_format="pyarrow")


def code_xref_ppr(sf_dir: str, seed_repo: str = "org0/repo0"):
    """Personalized PageRank over the symmetrized dependency graph,
    restarting at one repo's files — "which files matter most FROM
    this repo's vantage" (the seed-set regime: seeds ≪ graph, the
    seed list ships in task closures)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import polars as pl

    from ferenda_ray.stages.code_quality import xref_edges
    from ferenda_ray.stages.graph import pagerank

    src = _sources(sf_dir)
    seeds = [f"{r['repo']}:{r['path']}" for r in
             src.map_batches(
                 lambda b: b.select(["repo", "path"]),
                 batch_format="pyarrow")
             .filter(expr=f"repo == '{seed_repo}'").take_all()]

    def to_nodes(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        fwd = df.select(
            (pl.col("repo") + ":" + pl.col("path")).alias("src"),
            (pl.col("dst_repo") + ":" + pl.col("dst_path"))
            .alias("dst"))
        rev = fwd.select(pl.col("dst").alias("src"),
                         pl.col("src").alias("dst"))
        return pl.concat([fwd, rev]).to_arrow()

    e = xref_edges(src).map_batches(to_nodes, batch_format="pyarrow")
    pr = pagerank(e, damping=0.85, iters=10, symmetric=True,
                  personalize=seeds)
    return pr.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rank": pc.round(b.column("rank"), 6)}),
        batch_format="pyarrow")
