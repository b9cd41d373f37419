"""Corpus ingestion: JSONL / CSV / parquet → the north-rule table.

The engine's canonical input is a Parquet table ``(repo, path,
commit, lang, content)`` (BASELINE.json input_hint; the reference's
downloaded-stage file tree plays this role,
``ferenda/documentstore.py:219-376``).  Real corpora also arrive as
JSONL dumps or CSV exports, so this module normalizes any of the
three into that schema:

* format-pruned reads — ``read_parquet(columns=...)`` projects at the
  row-group level; JSONL/CSV cannot prune at the read, so the column
  projection runs as the FIRST map stage and drops extras before
  anything shuffles;
* column renaming via ``column_map`` (source name → canonical name);
* schema validation up front (missing canonical columns raise before
  the run, not per batch);
* optional ``content_sha256`` — the per-row invariant the driver
  checks against the reference — appended as a map stage (hashlib per
  row: ~1 µs/KB, IO-dominated; there is no vectorized Arrow sha256
  kernel, and correctness of the invariant beats kernel purity here).

Everything stays a streaming ``ray.data`` pipeline: one read + at
most two narrow map stages, no driver materialization.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

CANONICAL = ("repo", "path", "commit", "lang", "content")


def _normalize(ds, column_map: dict | None, required: tuple,
               with_sha256: bool):
    names = ds.schema().names
    cmap = {src: dst for src, dst in (column_map or {}).items()
            if src in names}
    have = [cmap.get(n, n) for n in names]
    missing = [c for c in required if c not in have]
    if missing:
        raise ValueError(
            f"corpus missing required columns {missing}; present "
            f"after column_map: {sorted(have)}")
    dupes = [c for c in required if have.count(c) > 1]
    if dupes:
        raise ValueError(
            f"column_map maps onto canonical columns that already "
            f"exist: {dupes} — rename or drop the source column")
    keep = [n for n in names if cmap.get(n, n) in required]

    def project(b: pa.Table) -> pa.Table:
        t = b.select(keep)
        t = t.rename_columns([cmap.get(n, n) for n in keep])
        # canonical column order, canonical utf8 types; nulls fail
        # HERE with a clear message, not as an AttributeError inside
        # a later stage (JSONL/CSV readers null-fill absent fields)
        import pyarrow.compute as pc
        for c in required:
            if pc.any(pc.is_null(t.column(c))).as_py():
                raise ValueError(
                    f"corpus column {c!r} contains null rows — "
                    "every canonical column must be present in "
                    "every record")
        return pa.table({c: t.column(c).cast(pa.string())
                         for c in required})

    ds = ds.map_batches(project, batch_format="pyarrow")
    if with_sha256:
        def sha(b: pa.Table) -> pa.Table:
            col = [hashlib.sha256(s.encode()).hexdigest()
                   for s in b.column("content").to_pylist()]
            return b.append_column("content_sha256",
                                   pa.array(col, pa.string()))
        ds = ds.map_batches(sha, batch_format="pyarrow")
    return ds


def read_code_corpus(path, fmt: str = "parquet",
                     column_map: dict | None = None,
                     required: tuple = CANONICAL,
                     with_sha256: bool = False):
    """Read a source-code corpus in ``parquet`` / ``jsonl`` / ``csv``
    into the canonical ``(repo, path, commit, lang, content)``
    Dataset, renaming via ``column_map`` and optionally appending the
    ``content_sha256`` invariant column."""
    import ray.data as rd

    if fmt == "parquet":
        # prune at the read: only the canonical columns' source names
        # leave storage
        inv = {dst: src for src, dst in (column_map or {}).items()}
        import pyarrow.parquet as pq
        first = path[0] if isinstance(path, (list, tuple)) else path
        avail = set(pq.read_schema(first).names)
        cols = [inv.get(c, c) for c in required
                if inv.get(c, c) in avail]
        ds = rd.read_parquet(path, columns=cols or None)
    elif fmt == "jsonl":
        ds = rd.read_json(path)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unknown corpus format {fmt!r} "
                         "(parquet / jsonl / csv)")
    return _normalize(ds, column_map, required, with_sha256)
