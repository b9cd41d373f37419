"""Stage 4 — graph materialization: sorted, partitioned shards + manifests.

The analogue of the reference's ``relate_all_teardown`` dump
(concatenate per-worker ``.nt`` append files → load → dump one sorted
``dump.nt``, ``ferenda/documentrepository.py:1813-1883``) — restated so
no central store and no driver-side concatenation exist:

* :func:`materialize` — hash-bucket the triples by ``subj`` (bucket
  count is the resume granularity; at 100 TB you raise ``num_buckets``,
  not the code), sort *within* bucket by ``(subj, pred, obj_value)``,
  write one Parquet and/or N-Triples shard per bucket **from the
  worker that holds the bucket** (distributed file sink: each
  ``map_groups`` group writes its own shard atomically and returns a
  manifest row).  A rerun skips buckets whose manifest exists
  (``needed()`` semantics).  Requires ``out_dir`` on storage all
  workers can reach — true single-node; on a real cluster this is the
  shared object store / NFS / S3 path, same assumption the reference
  makes for its network FS (``doc/advanced.rst:190-196``).

* :func:`materialize_sorted` — the literal ``dump.nt`` analogue: one
  globally range-sorted Parquet directory via ``ds.sort`` (sample-based
  range partitioning) + ``write_parquet``.

N-Triples encoding is vectorized (polars string ops), with proper
literal escaping per the N-Triples grammar.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import polars as pl

from ferenda_ray.schema import TRIPLES
from ferenda_ray.state import manifest as mf

SORT_KEY = ["subj", "pred", "obj_value"]

# fixed obj_type enum (engine-emitted values only)
_OBJ_TYPES = pa.array(["uri", "literal", "bnode", "mention", "error"])


def compact_batch(batch: pa.Table, pred_vocab: pa.Array,
                  graph_const: str | None) -> pa.Table:
    """Shrink exchange bytes without Arrow dictionary types (whose
    per-batch dictionaries Ray's exchange concat re-unifies
    quadratically): ``pred`` → int32 code against a GLOBAL static
    vocabulary (unknowns ride a mostly-empty fallback column),
    ``obj_type`` → int8 against the fixed enum, and the constant
    ``graph`` column is dropped entirely.  ~30% fewer shuffled bytes
    on the triple schema (pred+graph+obj_type ≈ 20 of 65 MB per 232k
    rows)."""
    if graph_const is not None and batch.num_rows:
        # single-graph invariant: never silently rewrite a mixed-graph
        # dataset's graph column to the constant (ADVICE r1)
        eq = pc.equal(batch.column("graph"), pa.scalar(graph_const))
        if pc.any(pc.is_null(eq)).as_py() or not pc.all(eq).as_py():
            raise ValueError(
                "compact_batch: graph_const set but batch carries "
                "differing graph values; pass graph_const=None")
    pred_c = pc.index_in(batch.column("pred"), value_set=pred_vocab) \
        .cast(pa.int32())
    known = pc.is_valid(pred_c)
    pred_x = pc.if_else(known, pa.nulls(batch.num_rows, pa.string()),
                        batch.column("pred").combine_chunks())
    ot_c = pc.index_in(batch.column("obj_type"),
                       value_set=_OBJ_TYPES).cast(pa.int8())
    cols = {"pred_c": pred_c, "pred_x": pred_x, "obj_type_c": ot_c}
    drop = ["pred", "obj_type"]
    if graph_const is not None:
        drop.append("graph")
    out = batch.drop_columns(drop)
    for k, v in cols.items():
        out = out.append_column(k, v)
    return out


def restore_batch(table: pa.Table, pred_vocab: pa.Array,
                  graph_const: str | None) -> pa.Table:
    """Inverse of :func:`compact_batch` (post-exchange, bucket-local)."""
    pred_c = table.column("pred_c").combine_chunks()
    known = pc.take(pred_vocab, pc.fill_null(pred_c, 0))
    pred = pc.if_else(pc.is_valid(pred_c), known,
                      table.column("pred_x").combine_chunks())
    ot = pc.take(_OBJ_TYPES, table.column("obj_type_c").combine_chunks())
    out = table.drop_columns(["pred_c", "pred_x", "obj_type_c"])
    out = out.append_column("pred", pred.cast(pa.string()))
    out = out.append_column("obj_type", ot.cast(pa.string()))
    if graph_const is not None:
        out = out.append_column(
            "graph", pa.array([graph_const] * table.num_rows, pa.string()))
    return out.select(TRIPLES.names)


def add_bucket(batch: pa.Table, num_buckets: int,
               dict_encode: bool = False,
               pred_vocab: pa.Array | None = None,
               graph_const: str | None = None) -> pa.Table:
    """Vectorized hash bucket on ``subj`` (polars 64-bit hash).

    ``dict_encode`` dictionary-encodes every string column before the
    exchange — triple columns are repetitive enough (constant
    ``graph``, ~13 predicates) that this cuts shuffled bytes ~60%
    (measured 65 MB → ~25 MB per 232k rows).  DEFAULT OFF: Ray's
    sort-exchange block concatenation unifies the per-batch
    dictionaries repeatedly and at the 14.8M-triple scale that
    unification dominates (the job went from 23 s to >10 min).  On a
    real multi-node cluster where network bytes — not CPU — bound the
    exchange, flip it on and measure."""
    h = pl.from_arrow(batch.column("subj")).rename("subj").hash(seed=0)
    b = (h % num_buckets).cast(pl.Int64).rename("bucket")
    if pred_vocab is not None:
        batch = compact_batch(batch, pred_vocab, graph_const)
    if dict_encode:
        cols = {}
        for name in batch.column_names:
            arr = batch.column(name)
            if pa.types.is_string(arr.type) or pa.types.is_large_string(
                    arr.type):
                arr = pc.dictionary_encode(arr.combine_chunks())
            cols[name] = arr
        batch = pa.table(cols)
    return batch.append_column("bucket", b.to_arrow())


def _nt_escape(col: pl.Expr) -> pl.Expr:
    return (col.str.replace_all("\\", "\\\\", literal=True)
               .str.replace_all('"', '\\"', literal=True)
               .str.replace_all("\n", "\\n", literal=True)
               .str.replace_all("\r", "\\r", literal=True)
               .str.replace_all("\t", "\\t", literal=True))


def to_ntriples(table: pa.Table) -> pl.Series:
    """One N-Triples line per row (vectorized)."""
    df = pl.from_arrow(table)
    obj = (
        pl.when(pl.col("obj_type") == "uri")
          .then("<" + pl.col("obj_value") + ">")
        .when(pl.col("obj_type") == "bnode")
          .then("_:" + pl.col("obj_value"))
        .otherwise(
            '"' + _nt_escape(pl.col("obj_value")) + '"'
            + pl.when(pl.col("obj_lang").is_not_null())
                .then("@" + pl.col("obj_lang"))
              .when(pl.col("obj_datatype").is_not_null())
                .then("^^<" + pl.col("obj_datatype") + ">")
              .otherwise(pl.lit("")))
    )
    return df.select(
        ("<" + pl.col("subj") + "> <" + pl.col("pred") + "> " + obj + " .")
        .alias("line"))["line"]


def _bucket_writer(out_dir: str, fmt: str = "parquet",
                   dedup: bool = False,
                   pred_vocab: pa.Array | None = None,
                   graph_const: str | None = None):
    """Per-bucket ``map_groups`` sink: (dedup,) sort, write, emit
    manifest row.

    ``dedup=True`` runs the exact-dedup *inside* the bucket: the bucket
    key is ``hash(subj)`` and ``subj`` is part of the 7-column triple
    key, so every duplicate lands in the same bucket and a vectorized
    within-bucket ``unique`` is globally correct — the canonicalization
    groupby and the materialize shuffle fuse into ONE exchange
    (the "two-phase shuffle for the canonicalization groupby" of the
    north rule: per-batch combiner upstream + this bucket-local merge).
    """

    def write_bucket(group: pa.Table) -> pa.Table:
        import time
        t0 = time.perf_counter()
        bucket = group.column("bucket")[0].as_py()
        part = f"bucket={bucket:05d}"
        # the exchange delivers hundreds of small chunks per bucket;
        # one defragment beats per-kernel chunk iteration (measured
        # 30x on polars from_arrow)
        group = group.drop_columns(["bucket"]).combine_chunks()
        if pred_vocab is not None:
            group = restore_batch(group, pred_vocab, graph_const)
        # decode any dictionary-encoded columns (post-exchange, local)
        cols = {}
        for name in group.column_names:
            arr = group.column(name)
            if pa.types.is_dictionary(arr.type):
                arr = pc.cast(arr.combine_chunks(), arr.type.value_type)
            cols[name] = arr
        group = pa.table(cols)
        df = pl.from_arrow(group)
        key7 = ["subj", "pred", "obj_type", "obj_value", "obj_lang",
                "obj_datatype", "graph"]
        if dedup:
            # ONE sort does both jobs: leading SORT_KEY gives the
            # output order, the remaining key7 columns make key groups
            # contiguous for unique(), and trailing lineage puts the
            # min (src_repo, src_path) row first in each group (the
            # dedup_exact rule)
            df = (df.sort(SORT_KEY + ["obj_type", "obj_lang",
                                      "obj_datatype", "graph",
                                      "src_repo", "src_path"])
                    .unique(subset=key7, keep="first",
                            maintain_order=True))
        else:
            df = df.sort(SORT_KEY)
        data = df.to_arrow().cast(TRIPLES)
        # deterministic content fingerprint over the sort key columns
        joined = df.select(
            pl.concat_str([pl.col(k) for k in SORT_KEY], separator="\x1f")
              .str.join("\n").alias("s"))["s"]
        digest = hashlib.sha256()
        digest.update((joined[0] if len(joined) else "").encode())
        files = []
        if fmt in ("parquet", "both"):
            p = os.path.join(out_dir, part, "part.parquet")
            mf.atomic_write(p, lambda tmp: pq.write_table(data, tmp))
            files.append(p)
        if fmt in ("nt", "both"):
            lines = to_ntriples(data)
            p = os.path.join(out_dir, part, "part.nt")
            text = "\n".join(lines.to_list()) + "\n" if len(lines) else ""
            mf.atomic_write(
                p, lambda tmp: open(tmp, "w").write(text))
            files.append(p)
        record = {
            "partition": part,
            "shard_file": files[0] if files else "",
            "rows": data.num_rows,
            "input_rows": group.num_rows,
            "min_subj": data.column("subj")[0].as_py() if data.num_rows else "",
            "max_subj": data.column("subj")[-1].as_py() if data.num_rows else "",
            "content_sha256": digest.hexdigest(),
            "elapsed_ms": int((time.perf_counter() - t0) * 1000),
        }
        mf.write_manifest(out_dir, part, record)
        return pa.table({k: [record[k]] for k in record})

    return write_bucket


def materialize(triples, out_dir: str, num_buckets: int = 32,
                resume: bool = True, fmt: str = "parquet",
                dedup: bool = False,
                shuffle_partitions: int | None = None,
                pred_vocab=None, graph_const: str | None = None) -> pa.Table:
    """Write hash-bucketed, within-bucket-sorted shards; returns the
    manifest table (one row per bucket written this run).

    ``dedup=True`` fuses global exact-dedup into the bucket shuffle
    (see :func:`_bucket_writer`) — use instead of a separate
    ``dedup_exact`` when the triples are being materialized anyway.

    ``num_buckets`` is the OUTPUT layout (resume granularity — at
    100 TB you raise it, not the code) and also the exchange
    granularity: measured at 32 CPUs / 14.8 M triples, 128 buckets
    more than halves the exchange+write wall time vs 64 (finer groups
    → better write parallelism after the range sort).

    ``shuffle_partitions`` opts into Ray's hash-shuffle exchange
    (``ShuffleStrategy.HASH_SHUFFLE`` with that many partitions)
    instead of the default sort-based one.  On a single node the sort
    exchange measures ~2× faster (26.7 s vs 52.9 s end-to-end on the
    400k-file corpus) — hash-shuffle's per-partition aggregator actors
    only pay off when partitions map to many nodes, so it is the
    multi-node escape hatch, not the default.
    """
    import functools
    os.makedirs(out_dir, exist_ok=True)
    layout = mf.bucket_layout_probe()
    layout["num_buckets"] = num_buckets
    mf.check_bucket_layout(out_dir, layout)
    if pred_vocab is not None and not isinstance(pred_vocab, pa.Array):
        pred_vocab = pa.array(sorted(set(pred_vocab)), pa.string())
    bucketed = triples.map_batches(
        functools.partial(add_bucket, num_buckets=num_buckets,
                          pred_vocab=pred_vocab, graph_const=graph_const),
        batch_format="pyarrow")
    if resume:
        done = {int(p.split("=")[1]) for p in mf.done_partitions(out_dir)}
        if done:
            import pyarrow.compute as pc
            done_arr = pa.array(sorted(done), pa.int64())
            bucketed = bucketed.map_batches(
                lambda b: b.filter(
                    pc.invert(pc.is_in(b.column("bucket"),
                                       value_set=done_arr))),
                batch_format="pyarrow")
    # hash-shuffle the bucket exchange: one hash repartition with
    # whole-group co-location and num_buckets-way parallel group
    # application — the default sort-based map_groups range-sorts the
    # whole dataset and lumps the 64 distinct keys into few blocks,
    # serializing the per-bucket writers (measured 43s → ~8s on a
    # 3.7M-triple corpus at 32 CPUs)
    if shuffle_partitions is None:
        manifest_ds = bucketed.groupby("bucket").map_groups(
            _bucket_writer(out_dir, fmt, dedup=dedup,
                           pred_vocab=pred_vocab, graph_const=graph_const),
            batch_format="pyarrow")
        result = manifest_ds.take_all()  # tiny: one row per bucket
        if os.environ.get("FERENDA_RAY_STATS"):
            # operator-level evidence (task counts, per-stage wall,
            # shuffle bytes) — `bench.py --stats`
            print(manifest_ds.stats())
        return pa.Table.from_pylist(result) if result else pa.table({})
    # opt-in hash exchange.  NOTE: the strategy must be set on the
    # DATASET's captured context (`Dataset.context`), not
    # `DataContext.get_current()` — Ray copies the context at dataset
    # creation, so mutating the global after the upstream pipeline is
    # built silently falls back to the sort-based exchange.
    from ray.data.context import ShuffleStrategy
    ctx = bucketed.context
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        manifest_ds = bucketed.groupby(
            "bucket", num_partitions=shuffle_partitions).map_groups(
            _bucket_writer(out_dir, fmt, dedup=dedup,
                           pred_vocab=pred_vocab, graph_const=graph_const),
            batch_format="pyarrow")
        result = manifest_ds.take_all()  # tiny: one row per bucket
    finally:
        ctx.shuffle_strategy = prev
    return pa.Table.from_pylist(result) if result else pa.table({})


def materialize_sorted(triples, out_dir: str) -> None:
    """Globally sorted Parquet dump (the ``dump.nt`` analogue)."""
    triples.sort(SORT_KEY).write_parquet(out_dir)


def read_materialized(out_dir: str):
    """Re-open a bucketed output as a Dataset (for downstream queries /
    verification)."""
    import ray.data as rd
    parts = sorted(
        os.path.join(out_dir, p, "part.parquet")
        for p in os.listdir(out_dir)
        if p.startswith("bucket=")
        and os.path.exists(os.path.join(out_dir, p, "part.parquet")))
    return rd.read_parquet(parts)
