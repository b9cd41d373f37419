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


def _bucket_of(basefile: str, num_buckets: int) -> int:
    """Deterministic bucket for a basefile (md5, stable across
    processes — Python ``hash()`` is salted)."""
    import hashlib
    return int(hashlib.md5(basefile.encode()).hexdigest()[:8],
               16) % num_buckets


def write_fulltext(rows, out_dir: str, num_buckets: int | None = None):
    """Index sink: partitioned Parquet by ``repo`` (the per-repo index
    slices the reference merges at query time, ``wsgiapp.py:289-296``).

    With ``num_buckets`` the layout adds a ``bucket`` partition level
    (``repo=X/bucket=N``) keyed by basefile hash — the granularity
    unit of :func:`upsert_fulltext`: re-indexing one document
    rewrites ONE bucket, not the repo partition."""
    if num_buckets:
        nb = num_buckets

        def add_bucket(b: pa.Table) -> pa.Table:
            return b.append_column("bucket", pa.array(
                [_bucket_of(x, nb)
                 for x in b.column("basefile").to_pylist()],
                pa.int64()))

        rows = rows.map_batches(add_bucket, batch_format="pyarrow")
        rows.write_parquet(out_dir, partition_cols=["repo", "bucket"])
    else:
        rows.write_parquet(out_dir, partition_cols=["repo"])
    return out_dir


def read_fulltext(index_dir: str):
    """Manifest-aware index read: a bucket dir carrying a
    ``_manifest.json`` (the atomic publish point of
    :func:`upsert_fulltext`) contributes ONLY the parts the manifest
    names, so readers never see a crashed upsert's unpublished or
    not-yet-GC'd files; legacy dirs (initial :func:`write_fulltext`
    output) contribute every parquet file.  Hive partition columns
    (repo/bucket) are parsed from the paths either way.  The listing
    is driver-side but per-bucket metadata only — O(buckets), not
    O(rows)."""
    import json
    import os

    import ray.data as rd
    files: list[str] = []
    has_manifest = False
    for root, _dirs, names in os.walk(index_dir):
        if "_manifest.json" in names:
            has_manifest = True
            with open(os.path.join(root, "_manifest.json")) as fh:
                live = json.load(fh)["parts"]
            files.extend(os.path.join(root, p) for p in live)
        else:
            files.extend(os.path.join(root, n) for n in names
                         if n.endswith(".parquet"))
    if not has_manifest:
        return rd.read_parquet(index_dir)
    return rd.read_parquet(files)


def upsert_fulltext(index_dir: str, new_rows, deletes=(),
                    num_buckets: int = 16):
    """Doc-granular index maintenance — the
    ``fulltextindex.update/commit/destroy`` surface
    (``fulltextindex.py:96-151``) on the bucketed Parquet layout.

    * ``new_rows``: rows (pa.Table or small Dataset) for CHANGED
      documents — every existing row of each basefile present here is
      replaced by the new rows (doc + section rows move together).
    * ``deletes``: iterable of ``(repo, basefile)`` to drop entirely.

    Only the buckets containing affected basefiles are rewritten —
    one Ray task per affected ``repo=X/bucket=N`` partition, each
    doing read → anti-filter → append → atomic publish.  At 100 TB
    this touches O(changed docs) buckets, never the full index.

    Crash safety: the publish point is an atomic ``_manifest.json``
    rename naming exactly the live part file; a crash at ANY point
    leaves a state manifest-aware readers (:func:`read_fulltext`)
    resolve consistently (old set or new set, never both).
    Superseded parts are GC'd by the NEXT upsert of the bucket (its
    reconcile pass removes every part not named by the live
    manifest), not at publish time — so a reader that resolved the
    previous manifest can finish streaming its part files through a
    full upsert interval.  Reader-vs-writer is safe within that
    grace period; only reads that straddle TWO upserts of the same
    bucket must be externally excluded.
    Semantics are SINGLE-WRITER per bucket: two concurrent upserts of
    one bucket race read-merge-write and the later manifest swap
    wins, dropping the earlier writer's rows — serialize upserts per
    bucket (they are cheap: one task per bucket)."""
    import os
    import uuid

    import ray

    if not isinstance(new_rows, pa.Table):
        new_rows = pa.Table.from_pylist(new_rows.take_all())
    if "bucket" in new_rows.column_names:
        new_rows = new_rows.drop_columns(["bucket"])

    # group new rows + deletes by affected (repo, bucket)
    affected: dict[tuple, dict] = {}
    if new_rows.num_rows:
        repos = new_rows.column("repo").to_pylist()
        bases = new_rows.column("basefile").to_pylist()
        for i, (r, bf) in enumerate(zip(repos, bases)):
            key = (r, _bucket_of(bf, num_buckets))
            slot = affected.setdefault(key, {"rows": [], "drop": set()})
            slot["rows"].append(i)
            slot["drop"].add(bf)
    for r, bf in deletes:
        key = (r, _bucket_of(bf, num_buckets))
        slot = affected.setdefault(key, {"rows": [], "drop": set()})
        slot["drop"].add(bf)

    body = new_rows.drop_columns(["repo"])
    body_ref = ray.put(body)

    @ray.remote
    def rewrite(part_dir, row_idx, drop, body):
        # body arrives plasma-shared: Ray auto-resolves the ObjectRef
        # argument, so every task reads ONE copy zero-copy
        import json

        import pyarrow.parquet as pq
        fresh = body.take(row_idx) if row_idx else body.slice(0, 0)
        manifest = os.path.join(part_dir, "_manifest.json")
        olds = []
        if os.path.isdir(part_dir):
            allparts = [f for f in sorted(os.listdir(part_dir))
                        if f.endswith(".parquet")]
            if os.path.exists(manifest):
                with open(manifest) as fh:
                    live = set(json.load(fh)["parts"])
                # reconcile: GC parts an earlier crashed upsert left
                # behind (written but never published, or published
                # and not yet collected)
                for f in allparts:
                    if f not in live:
                        os.remove(os.path.join(part_dir, f))
                olds = [os.path.join(part_dir, f)
                        for f in allparts if f in live]
            else:
                olds = [os.path.join(part_dir, f) for f in allparts]
        keep = [pq.read_table(f) for f in olds]
        if keep:
            import pyarrow.compute as pc
            existing = pa.concat_tables(keep,
                                        promote_options="default")
            mask = pc.invert(pc.is_in(
                existing.column("basefile"),
                value_set=pa.array(sorted(drop), pa.string())))
            existing = existing.filter(mask)
            fresh = fresh.cast(pa.schema(
                [existing.schema.field(n)
                 for n in fresh.column_names]))
            merged = pa.concat_tables(
                [existing.select(fresh.column_names), fresh],
                promote_options="default")
        else:
            merged = fresh
        os.makedirs(part_dir, exist_ok=True)
        token = uuid.uuid4().hex[:12]
        tmp = os.path.join(part_dir, f".part-{token}.tmp")
        final = os.path.join(part_dir, f"part-{token}.parquet")
        pq.write_table(merged, tmp)
        os.rename(tmp, final)  # part visible but not yet referenced
        # PUBLISH: atomic manifest swap — manifest-aware readers flip
        # from the old part set to the new in one rename; a crash on
        # either side of it leaves a consistent view
        mtmp = os.path.join(part_dir, f"._manifest-{token}.tmp")
        with open(mtmp, "w") as fh:
            json.dump({"parts": [os.path.basename(final)],
                       "rows": merged.num_rows}, fh)
        os.rename(mtmp, manifest)
        # Superseded parts are NOT unlinked here: a reader that
        # resolved the previous manifest may still be streaming them
        # (ADVICE r4 — the immediate unlink raced such readers into
        # FileNotFoundError).  GC is deferred to the NEXT upsert's
        # reconcile pass above (any .parquet not in the live manifest
        # is removed then), giving in-flight reads a full
        # upsert-interval grace period.
        return merged.num_rows

    futures = []
    for (repo, bucket), slot in affected.items():
        part_dir = os.path.join(index_dir, f"repo={repo}",
                                f"bucket={bucket}")
        futures.append(rewrite.remote(part_dir, slot["rows"],
                                      slot["drop"], body_ref))
    return {"buckets_rewritten": len(futures),
            "rows_after": sum(ray.get(futures))}


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
