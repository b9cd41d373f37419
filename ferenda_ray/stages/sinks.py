"""Generic resumable partitioned sink for ANY table.

:func:`materialize` (stages/materialize.py) implements the manifest +
atomic-write + skip-finished-buckets discipline for the triple layout;
this module generalizes the same machinery (``state/manifest``
primitives: layout guard, per-partition manifests, tmp+rename) to an
arbitrary Dataset — the cleaned-corpus / chunked-training-data output
path, so a failed 100-TB cleaning run resumes by skipping finished
buckets exactly like the KG sink does (reference analogue: per-
basefile ``DocumentStore`` paths + ``needed``-gated reruns,
``ferenda/documentstore.py``).

Bucketing is ``polars 64-bit hash(key) % num_buckets`` for ANY key
dtype (same idiom as ``materialize.add_bucket``); within-bucket order
is ``sort_by`` (default: the key) so shard contents are deterministic
and the manifest's content sha is reproducible.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ferenda_ray.state import manifest as mf


def _table_sha256(data: pa.Table) -> str:
    """sha256 over the table's Arrow IPC stream bytes — covers EVERY
    column, so 'redo is sha-identical' means the whole shard, not just
    the keys (ADVICE r4: the old digest hashed only the key column).
    Chunking is normalized first: IPC bytes depend on chunk layout,
    logical content must not."""
    data = data.combine_chunks()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, data.schema) as w:
        w.write_table(data)
    return hashlib.sha256(memoryview(sink.getvalue())).hexdigest()


def write_partitioned(ds, out_dir: str, key_col: str,
                      num_buckets: int = 32, resume: bool = True,
                      sort_by: list | None = None) -> pa.Table:
    """Hash-partitioned, manifested, resumable parquet sink; returns
    the manifest table (one row per bucket WRITTEN this run — resumed
    buckets are skipped before the exchange, so reruns cost one
    filtered scan, not a shuffle)."""
    import functools
    os.makedirs(out_dir, exist_ok=True)
    layout = mf.bucket_layout_probe()
    layout["num_buckets"] = num_buckets
    layout["key_col"] = key_col
    # record the DATA schema so read_partitioned can tell a user
    # column named "bucket" from the hive-inferred partition column
    # (ADVICE r4: the unconditional drop lost such a column on
    # round-trip); schema drift on resume is refused by the guard
    layout["columns"] = list(ds.schema().names)
    mf.check_bucket_layout(out_dir, layout)
    sort_by = sort_by or [key_col]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pl.from_arrow(b.column(key_col)).rename("k").hash(seed=0)
        return b.append_column(
            "__bucket", (h % num_buckets).cast(pl.Int64).to_arrow())

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    if resume:
        done = {int(p.split("=")[1])
                for p in mf.done_partitions(out_dir)}
        if done:
            done_arr = pa.array(sorted(done), pa.int64())
            bucketed = bucketed.map_batches(
                lambda b: b.filter(pc.invert(
                    pc.is_in(b.column("__bucket"),
                             value_set=done_arr))),
                batch_format="pyarrow")

    def write_bucket(group: pa.Table) -> pa.Table:
        import time
        t0 = time.perf_counter()
        bucket = group.column("__bucket")[0].as_py()
        part = f"bucket={bucket:05d}"
        data = (pl.from_arrow(
            group.drop_columns(["__bucket"]).combine_chunks())
            .sort(sort_by).to_arrow())
        keys = data.column(key_col)
        p = os.path.join(out_dir, part, "part.parquet")
        mf.atomic_write(p, lambda tmp: pq.write_table(data, tmp))
        record = {
            "partition": part, "shard_file": p,
            "rows": data.num_rows,
            "min_key": str(keys[0].as_py()) if len(keys) else "",
            "max_key": str(keys[-1].as_py()) if len(keys) else "",
            "content_sha256": _table_sha256(data),
            "elapsed_ms": int((time.perf_counter() - t0) * 1000),
        }
        mf.write_manifest(out_dir, part, record)
        return pa.table({k: [record[k]] for k in record})

    result = (bucketed.groupby("__bucket")
              .map_groups(write_bucket, batch_format="pyarrow")
              .take_all())  # tiny: one row per bucket
    return pa.Table.from_pylist(result) if result else pa.table({})


def read_partitioned(out_dir: str):
    """Read every finished bucket back as one Dataset."""
    import json
    import ray.data as rd
    parts = sorted(mf.done_partitions(out_dir))
    paths = [os.path.join(out_dir, p, "part.parquet") for p in parts]
    ds = rd.read_parquet(paths)
    # read_parquet hive-infers a "bucket" column from the partition
    # dirs — sink plumbing, not user data.  Drop it ONLY when the
    # layout's recorded schema says the table has no such column
    # itself (ADVICE r4: a legitimate user "bucket" column must
    # survive the round-trip; pre-"columns" layouts keep the old
    # unconditional drop).
    try:
        with open(os.path.join(out_dir, "_layout.json")) as f:
            cols = json.load(f).get("columns")
    except (OSError, ValueError):
        cols = None
    if ("bucket" in (ds.schema().names or [])
            and (cols is None or "bucket" not in cols)):
        ds = ds.map_batches(lambda b: b.drop_columns(["bucket"]),
                            batch_format="pyarrow")
    return ds


def upsert_partitioned(ds, out_dir: str, key_col: str) -> pa.Table:
    """Incremental update: merge new/changed rows into an existing
    :func:`write_partitioned` layout, rewriting ONLY the buckets that
    contain affected keys (the daily-increment path: a 0.1% delta
    touches ~min(num_buckets, delta-rows) shards, not the corpus).

    Per affected bucket the existing shard is read, rows whose key
    appears in the delta are replaced (delta wins), the merged shard
    is sorted and atomically swapped, and the manifest is refreshed —
    same crash-ordering as ``fulltext.upsert``: the old file is only
    ever replaced by a complete merged one (tmp + rename), so a crash
    leaves either the old or the new shard, never a mix.  Buckets not
    in the delta keep byte-identical shards and manifests."""
    import json
    with open(os.path.join(out_dir, "_layout.json")) as f:
        layout = json.load(f)
    num_buckets = layout["num_buckets"]
    sort_by = [key_col]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pl.from_arrow(b.column(key_col)).rename("k").hash(seed=0)
        return b.append_column(
            "__bucket", (h % num_buckets).cast(pl.Int64).to_arrow())

    def merge_bucket(group: pa.Table) -> pa.Table:
        import time
        t0 = time.perf_counter()
        bucket = group.column("__bucket")[0].as_py()
        part = f"bucket={bucket:05d}"
        delta = pl.from_arrow(
            group.drop_columns(["__bucket"]).combine_chunks())
        p = os.path.join(out_dir, part, "part.parquet")
        if os.path.exists(p):
            old = pl.from_arrow(pq.read_table(p))
            keys = delta[key_col].implode()
            kept = old.filter(~pl.col(key_col).is_in(keys))
            merged = pl.concat([kept, delta.select(old.columns)])
        else:
            merged = delta
        merged = merged.sort(sort_by)
        data = merged.to_arrow()
        keys_col = data.column(key_col)
        mf.atomic_write(p, lambda tmp: pq.write_table(data, tmp))
        record = {
            "partition": part, "shard_file": p,
            "rows": data.num_rows,
            "min_key": str(keys_col[0].as_py()) if len(keys_col) else "",
            "max_key": str(keys_col[-1].as_py()) if len(keys_col) else "",
            "content_sha256": _table_sha256(data),
            "elapsed_ms": int((time.perf_counter() - t0) * 1000),
        }
        mf.write_manifest(out_dir, part, record)
        return pa.table({k: [record[k]] for k in record})

    result = (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(merge_bucket, batch_format="pyarrow")
              .take_all())  # one row per AFFECTED bucket
    return pa.Table.from_pylist(result) if result else pa.table({})


def delete_keys_partitioned(ds, out_dir: str, key_col: str) -> pa.Table:
    """Retire keys from a :func:`write_partitioned` layout — the
    ``removed`` leg of :func:`~ferenda_ray.stages.dedup.corpus_diff`
    (a doc deleted from the corpus takes its whole keyed row set with
    it).  ``ds`` carries just the keys to drop; only buckets
    containing them are rewritten (same atomic tmp+rename + manifest
    refresh as :func:`upsert_partitioned`; untouched shards stay
    byte-identical)."""
    import json
    with open(os.path.join(out_dir, "_layout.json")) as f:
        layout = json.load(f)
    num_buckets = layout["num_buckets"]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pl.from_arrow(b.column(key_col)).rename("k").hash(seed=0)
        return b.append_column(
            "__bucket", (h % num_buckets).cast(pl.Int64).to_arrow())

    def drop_bucket(group: pa.Table) -> pa.Table:
        import time
        t0 = time.perf_counter()
        bucket = group.column("__bucket")[0].as_py()
        part = f"bucket={bucket:05d}"
        p = os.path.join(out_dir, part, "part.parquet")
        if not os.path.exists(p):
            return pa.table({"partition": [part], "shard_file": [p],
                             "rows": [0], "min_key": [""],
                             "max_key": [""], "content_sha256": [""],
                             "elapsed_ms": [0]})
        gone = pl.from_arrow(group.select([key_col]))[key_col].implode()
        data = (pl.from_arrow(pq.read_table(p))
                .filter(~pl.col(key_col).is_in(gone)).to_arrow())
        keys_col = data.column(key_col)
        mf.atomic_write(p, lambda tmp: pq.write_table(data, tmp))
        record = {
            "partition": part, "shard_file": p,
            "rows": data.num_rows,
            "min_key": str(keys_col[0].as_py()) if len(keys_col) else "",
            "max_key": str(keys_col[-1].as_py()) if len(keys_col) else "",
            "content_sha256": _table_sha256(data),
            "elapsed_ms": int((time.perf_counter() - t0) * 1000),
        }
        mf.write_manifest(out_dir, part, record)
        return pa.table({k: [record[k]] for k in record})

    result = (ds.select_columns([key_col])
              .map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(drop_bucket, batch_format="pyarrow")
              .take_all())  # one row per AFFECTED bucket
    return pa.Table.from_pylist(result) if result else pa.table({})


def upsert_aggregate(ds, out_dir: str, key_col: str,
                     sum_cols: list) -> pa.Table:
    """Incremental VIEW MAINTENANCE for distributive aggregates: the
    delta rows are PARTIAL aggregates (counts/sums per key) and merge
    into the persisted rollup by SUMMING ``sum_cols`` per key —
    unlike :func:`upsert_partitioned`'s delta-wins replace.  Only
    buckets containing delta keys are rewritten (same atomic
    tmp+rename and manifest refresh); maintaining a rollup over a
    daily increment therefore costs one pass over the delta plus
    min(num_buckets, delta-keys) shard rewrites — never a recompute
    of the base table.  Result equals the full recompute
    (pytest-asserted)."""
    import json
    with open(os.path.join(out_dir, "_layout.json")) as f:
        layout = json.load(f)
    num_buckets = layout["num_buckets"]

    def add_bucket(b: pa.Table) -> pa.Table:
        h = pl.from_arrow(b.column(key_col)).rename("k").hash(seed=0)
        return b.append_column(
            "__bucket", (h % num_buckets).cast(pl.Int64).to_arrow())

    def merge_bucket(group: pa.Table) -> pa.Table:
        import time
        t0 = time.perf_counter()
        bucket = group.column("__bucket")[0].as_py()
        part = f"bucket={bucket:05d}"
        delta = pl.from_arrow(
            group.drop_columns(["__bucket"]).combine_chunks())
        p = os.path.join(out_dir, part, "part.parquet")
        if os.path.exists(p):
            old = pl.from_arrow(pq.read_table(p))
            both = pl.concat([old, delta.select(old.columns)])
        else:
            both = delta
        merged = (both.group_by(key_col)
                  .agg([pl.col(c).sum() for c in sum_cols])
                  .select([key_col] + list(sum_cols))
                  .sort([key_col]))
        data = merged.to_arrow()
        keys_col = data.column(key_col)
        mf.atomic_write(p, lambda tmp: pq.write_table(data, tmp))
        record = {
            "partition": part, "shard_file": p,
            "rows": data.num_rows,
            "min_key": str(keys_col[0].as_py()) if len(keys_col) else "",
            "max_key": str(keys_col[-1].as_py()) if len(keys_col) else "",
            "content_sha256": _table_sha256(data),
            "elapsed_ms": int((time.perf_counter() - t0) * 1000),
        }
        mf.write_manifest(out_dir, part, record)
        return pa.table({k: [record[k]] for k in record})

    result = (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(merge_bucket, batch_format="pyarrow")
              .take_all())  # one row per AFFECTED bucket
    return pa.Table.from_pylist(result) if result else pa.table({})


def rebucket_partitioned(out_dir: str, new_dir: str,
                         new_num_buckets: int) -> pa.Table:
    """Re-shard a long-lived sink into a different bucket count (the
    maintenance op for a layout that outgrew — or over-provisioned —
    its original ``num_buckets``): stream the finished shards through
    :func:`write_partitioned` into ``new_dir`` with the same key and
    within-bucket order.  The source layout is untouched (swap
    directories only after the new manifest set is complete), so a
    crash mid-rebucket loses nothing and the rebucket itself resumes
    bucket-by-bucket like any other write."""
    import json
    with open(os.path.join(out_dir, "_layout.json")) as f:
        layout = json.load(f)
    return write_partitioned(read_partitioned(out_dir), new_dir,
                             layout["key_col"],
                             num_buckets=new_num_buckets)
