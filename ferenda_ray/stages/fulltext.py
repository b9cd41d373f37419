"""Fulltext index: the ``relate_fulltext`` leg of the relate action.

The reference walks each parsed XHTML body, emits one indexable row
per ``@about`` resource — ``(uri, repo, basefile, text=normalized
plaintext, **facet_fields)`` — into ES/Whoosh
(``documentrepository.py:2082-2149``; row shape
``fulltextindex.py:120-151``; schema from facets ``:232-305``).

Ray restatement: the index is a Parquet-backed Dataset of the same
rows; building it is one ``map_batches`` pass over the sources (one
row per document + one per recognized section); querying it is a
vectorized scan — term-frequency scoring with a title boost (the
boost-field idea of ``fulltextindex.py:260-305``) and deterministic
ranking.  No shared mutable indexer: the "index" is data.
"""

from __future__ import annotations

import re

import pyarrow as pa
import polars as pl

from ferenda_ray.recognizers import parse_content
from ferenda_ray.fsm import FSMStateError
from ferenda_ray.uri import DEFAULT_BASE, doc_uri, frag_uri

_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    """``util.normalize_space`` analogue (``util.py:290``)."""
    return _WS.sub(" ", s).strip()


def fulltext_rows(sources, base: str = DEFAULT_BASE):
    """Sources Dataset → index rows ``(uri, repo, basefile, title,
    lang, text)``: one per document (intro prose) and one per section
    (its prose), mirroring the per-``@about``-resource walk."""
    def emit(b: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("uri", "repo", "basefile", "title",
                                "lang", "text")}

        def row(uri, repo, basefile, title, lang, text):
            cols["uri"].append(uri)
            cols["repo"].append(repo)
            cols["basefile"].append(basefile)
            cols["title"].append(title)
            cols["lang"].append(lang)
            cols["text"].append(_norm(text))

        for repo, path, commit, lang, content in zip(
                b.column("repo").to_pylist(), b.column("path").to_pylist(),
                b.column("commit").to_pylist(), b.column("lang").to_pylist(),
                b.column("content").to_pylist()):
            du = doc_uri(repo, path, commit, base)
            basefile = f"{repo}/{path}"
            try:
                parsed = parse_content(lang, content)
            except FSMStateError:
                continue  # poison pill: not indexable, pipeline continues
            row(du, repo, basefile, parsed.title or "", lang,
                " ".join(parsed.intro_prose))

            def walk(sec):
                row(frag_uri(du, sec.ordinal), repo, basefile, sec.title,
                    lang, " ".join(sec.prose))
                for sub in sec.subs:
                    walk(sub)

            for sec in parsed.sections:
                walk(sec)
        return pa.table({k: pa.array(v, pa.large_string()
                                     if k == "text" else pa.string())
                         for k, v in cols.items()})

    return sources.map_batches(emit, batch_format="pyarrow",
                               batch_size=256)


def write_fulltext(rows, out_dir: str):
    """Index sink: partitioned Parquet by ``repo`` (the per-repo index
    slices the reference merges at query time, ``wsgiapp.py:289-296``)."""
    rows.write_parquet(out_dir, partition_cols=["repo"])
    return out_dir


def read_fulltext(index_dir: str):
    import ray.data as rd
    return rd.read_parquet(index_dir)


def search(index, terms: list, k: int = 10, title_boost: float = 2.0):
    """Ranked fulltext query over index rows: score = Σ term frequency
    in ``text`` + ``title_boost`` × frequency in ``title`` (whole-word,
    case-insensitive).  Returns the global top-``k`` as
    ``(uri, score, n_hits)``, ties broken by uri — the
    ``WSGIApp.query`` shape (``wsgiapp.py:388-660``) without the
    serving layer."""
    pats = [rf"(?i)\b{re.escape(t)}\b" for t in terms]

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["uri", "title", "text"]))
        text_hits = sum((df["text"].str.count_matches(p).cast(pl.Int64)
                         for p in pats), pl.Series([0] * df.height))
        title_hits = sum((df["title"].str.count_matches(p).cast(pl.Int64)
                          for p in pats), pl.Series([0] * df.height))
        out = pl.DataFrame({
            "uri": df["uri"],
            "score": (text_hits + title_boost * title_hits).cast(pl.Float64),
            "n_hits": (text_hits + title_hits).cast(pl.Int64),
        }).filter(pl.col("n_hits") > 0)
        return out.to_arrow()

    scored = index.map_batches(score, batch_format="pyarrow",
                               batch_size=8192)
    return scored.sort(["score", "uri"], descending=[True, False]).limit(k)


def query(index, terms: list, fields: dict | None = None,
          require_all: bool = False, page: int = 0, page_size: int = 10,
          title_boost: float = 2.0):
    """The full ``WSGIApp.query`` surface (``wsgiapp.py:388-660``):
    free-text terms + exact field filters + boolean AND + pagination.

    * ``fields``: {column: value} equality filters applied vectorized
      inside the scoring pass (the ``field=value`` query params).
    * ``require_all``: every term must hit at least once (boolean AND;
      default OR keeps any row with a hit).
    * ``page``/``page_size``: global rank pagination — rows
      ``page*page_size .. (page+1)*page_size`` of the score ordering,
      with a 1-based ``rank`` column (deterministic: ties break on
      uri).

    Distributed shape: scoring + filtering stream per batch; only the
    top ``(page+1)*page_size`` rows (small) pass the sort barrier."""
    pats = [rf"(?i)\b{re.escape(t)}\b" for t in terms]

    def score(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        for col, val in (fields or {}).items():
            b = b.filter(pc.equal(b.column(col), val))
        df = pl.from_arrow(b.select(["uri", "title", "text"]))
        per_term = [(df["text"].str.count_matches(p).cast(pl.Int64),
                     df["title"].str.count_matches(p).cast(pl.Int64))
                    for p in pats]
        text_hits = sum((t for t, _ in per_term),
                        pl.Series([0] * df.height))
        title_hits = sum((t for _, t in per_term),
                         pl.Series([0] * df.height))
        out = pl.DataFrame({
            "uri": df["uri"],
            "score": (text_hits + title_boost * title_hits)
            .cast(pl.Float64),
            "n_hits": (text_hits + title_hits).cast(pl.Int64),
        })
        if require_all:
            present = None
            for t, ti in per_term:
                p = (t + ti) > 0
                present = p if present is None else (present & p)
            out = out.filter(pl.Series(present))
        else:
            out = out.filter(pl.col("n_hits") > 0)
        return out.to_arrow()

    scored = index.map_batches(score, batch_format="pyarrow",
                               batch_size=8192)
    top = (scored.sort(["score", "uri"], descending=[True, False])
           .limit((page + 1) * page_size).repartition(1))

    def page_slice(b: pa.Table) -> pa.Table:
        start = page * page_size
        b = b.append_column(
            "rank", pa.array(range(1, b.num_rows + 1), pa.int64()))
        return b.slice(start, page_size)

    return top.map_batches(page_slice, batch_format="pyarrow",
                           batch_size=None)


def fulltext_rows_faceted(sources, repo_facets: dict,
                          base: str = DEFAULT_BASE):
    """Facet-DRIVEN index rows: per-repo facet declarations are merged
    into ONE index schema (conflicting ``indexingtype`` for the same
    binding raises :class:`~ferenda_ray.functions.facets.SchemaConflictError`
    — ``fulltextindex.py:232-305`` semantics), and each document row
    carries one column per facet binding, populated from the parsed
    document's metadata (binding ``dcterms_issued`` ← meta key
    ``Issued`` etc.).

    ``repo_facets``: {repo_name_or_'*': [Facet, ...]}."""
    from ferenda_ray.functions.facets import merged_schema
    schema = merged_schema(list(repo_facets.values()))
    extra = [b for b in schema
             if b not in ("uri", "repo", "basefile", "title", "lang",
                          "text")]

    def _meta_key(binding: str) -> str:
        return binding.split("_", 1)[-1].capitalize()

    def emit(b: pa.Table) -> pa.Table:
        cols = {k: [] for k in ("uri", "repo", "basefile", "title",
                                "lang", "text", *extra)}
        for repo, path, commit, lang, content in zip(
                b.column("repo").to_pylist(), b.column("path").to_pylist(),
                b.column("commit").to_pylist(), b.column("lang").to_pylist(),
                b.column("content").to_pylist()):
            try:
                parsed = parse_content(lang, content)
            except FSMStateError:
                continue
            cols["uri"].append(doc_uri(repo, path, commit, base))
            cols["repo"].append(repo)
            cols["basefile"].append(f"{repo}/{path}")
            cols["title"].append(parsed.title or "")
            cols["lang"].append(lang)
            cols["text"].append(_norm(" ".join(parsed.intro_prose)))
            for binding in extra:
                cols[binding].append(parsed.meta.get(_meta_key(binding)))
        return pa.table({k: pa.array(v, pa.large_string()
                                     if k == "text" else pa.string())
                         for k, v in cols.items()})

    return sources.map_batches(emit, batch_format="pyarrow",
                               batch_size=256)


def search_bm25(index, terms: list, k: int = 10, k1: float = 1.2,
                b: float = 0.75):
    """Okapi BM25 ranking over the index (the scoring the reference
    delegates to Whoosh/Elasticsearch, ``fulltextindex.py`` backends).

    Two passes: a partial-aggregate stats pass (per-batch (n, Σdl,
    df_t) rows → tiny driver reduce — bounded by batch count, not
    corpus size) and a vectorized scoring pass with the reduced
    scalars in the task closure.  idf = ln((N-df+0.5)/(df+0.5)+1)
    (Lucene's non-negative form), tf term with the (k1+1) numerator."""
    import math

    import polars as pl

    pats = [rf"(?i)\b{t}\b" for t in terms]

    def stats(bt: pa.Table) -> pa.Table:
        df = pl.from_arrow(bt.select(["text"]))
        row = {"n": [bt.num_rows],
               "sum_dl": [int(df.select(
                   pl.col("text").str.count_matches(r"\S+"))
                   .sum().item() or 0)]}
        for i, p in enumerate(pats):
            row[f"df{i}"] = [int(df.select(
                (pl.col("text").str.count_matches(p) > 0).cast(pl.Int64))
                .sum().item() or 0)]
        return pa.table(row)

    parts = index.map_batches(stats, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    avgdl = (sum(r["sum_dl"] for r in parts) / n) if n else 1.0
    dfs = [sum(r[f"df{i}"] for r in parts) for i in range(len(terms))]
    idfs = [math.log((n - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]

    def score(bt: pa.Table) -> pa.Table:
        df = pl.from_arrow(bt.select(["uri", "text"]))
        dl = df.select(pl.col("text").str.count_matches(r"\S+")
                       .cast(pl.Float64).alias("dl"))["dl"]
        expr = pl.lit(0.0)
        for i, p in enumerate(pats):
            tf = pl.col("text").str.count_matches(p).cast(pl.Float64)
            expr = expr + pl.lit(idfs[i]) * (
                tf * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * pl.col("dl") / avgdl)))
        out = (df.with_columns(dl=dl)
               .select(pl.col("uri"), expr.round(4).alias("score")))
        return out.filter(pl.col("score") > 0).to_arrow()

    scored = index.map_batches(score, batch_format="pyarrow")
    return (scored.sort(["score", "uri"], descending=[True, False])
            .limit(k))
