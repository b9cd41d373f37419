"""Windowed / temporal operators Ray Data lacks natively.

Each is a composition of ``map_batches`` + ``groupby().map_groups``
with an explicit partitioning assumption (documented per function) —
the "custom operator" recipe: express via Dataset ops when semantics
allow, shuffle once on the natural key, keep the per-group body
vectorized (pandas/numpy).  No driver-side state.

The reference has no temporal operators (SURVEY.md §2.9 "no windows");
these are the beyond-the-reference stream shapes a large-scale
training-data pipeline needs (tumbling + sessionize live in
``pipelines/events.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def hopping_window(events, size_s: int, hop_s: int,
                   ts_col: str = "ts", key_cols: list | None = None,
                   aggs: dict | None = None):
    """Overlapping (hopping) windows: each row belongs to
    ``size_s // hop_s`` windows; flat-map duplicates the row per
    window, then ONE ``groupby(key, window_start)`` aggregates.

    Partitioning: the shuffle key is (key_cols…, window_start) — no
    ordering assumption at all; the window replication factor is the
    only cost.  ``aggs``: {out_col: (in_col, "sum"|"count")}.
    """
    assert size_s % hop_s == 0, "size must be a multiple of hop"
    fanout = size_s // hop_s
    key_cols = key_cols or []
    aggs = aggs or {"n_events": (ts_col, "count")}

    def explode(b: pa.Table) -> pa.Table:
        epoch = pc.divide(b.column(ts_col).cast(pa.int64()),
                          1_000_000).to_numpy(zero_copy_only=False)
        base = (epoch // hop_s) * hop_s
        parts = []
        for i in range(fanout):
            ws = base - i * hop_s
            keep = epoch < ws + size_s  # guard first windows
            t = b.filter(pa.array(keep))
            parts.append(t.append_column(
                "window_start", pa.array(ws[keep], pa.int64())))
        return pa.concat_tables(parts)

    from ray.data.aggregate import Count, Sum
    ray_aggs = []
    for out, (col, kind) in aggs.items():
        ray_aggs.append(Count(alias_name=out) if kind == "count"
                        else Sum(col, alias_name=out))
    return (events.map_batches(explode, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(key_cols + ["window_start"]).aggregate(*ray_aggs))


def asof_join(left, right, on: str, by: str, right_cols: list,
              ts_col_left: str = "ts", direction: str = "backward"):
    """As-of join: each left row picks the latest right row with
    ``right[on] <= left[ts]`` within the same ``by`` key.

    Partitioning (r5): co-partition BOTH sides on a SHARD of ``by``
    (hash(by) % P, the ``range_join_pairs`` idiom — one union + one
    groupby shuffle), NOT one Python task per key: each shard joins
    ALL of its keys in a single vectorized polars ``join_asof(by=)``
    call, so a hot key costs one sorted merge inside one task rather
    than a per-key pandas call, and per-task input is ~1/P of the
    data.  Right side must be the smaller/dimension side per key.
    """
    # align the two schemas (null-fill missing columns) so one union +
    # one groupby co-partitions both sides
    ls, rs = left.schema(), right.schema()
    lf = {f: ls.types[i] for i, f in enumerate(ls.names)}
    rf = {f: rs.types[i] for i, f in enumerate(rs.names)}
    merged = dict(lf)
    merged.update({k: v for k, v in rf.items() if k not in merged})
    order = list(merged) + ["_side"]

    def aligner(tag: str, have: dict):
        missing = {k: v for k, v in merged.items() if k not in have}

        def fn(b: pa.Table) -> pa.Table:
            for name, typ in missing.items():
                b = b.append_column(name, pa.nulls(b.num_rows, typ))
            b = b.append_column("_side",
                                pa.array([tag] * b.num_rows, pa.string()))
            return b.select(order)
        return fn

    lt = left.map_batches(aligner("l", lf), batch_format="pyarrow")
    rt = right.map_batches(aligner("r", rf), batch_format="pyarrow")

    right_only = [k for k in merged if k not in lf]
    out_cols = [c for c in merged if c not in right_only or
                c in right_cols]
    out_cols = [c for c in out_cols if c != on or c in lf]
    out_schema = pa.schema([(c, merged[c]) for c in out_cols])

    import polars as pl

    from ferenda_ray.cluster import default_num_partitions
    nshards = default_num_partitions(2.0)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select([by]))
              .select(pl.col(by).hash(seed=17) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def join_shard(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["__shard"]))
        lg = (df.filter(pl.col("_side") == "l")
              .drop(["_side"] + right_only).sort([ts_col_left, by]))
        rg = (df.filter(pl.col("_side") == "r")
              .select([by, on] + right_cols).drop_nulls([on])
              .sort([on, by]))
        if not lg.height:
            return out_schema.empty_table()
        if rg.height:
            out = lg.join_asof(rg, left_on=ts_col_left, right_on=on,
                               by=by, strategy=direction)
            if on in out.columns and on not in lg.columns:
                out = out.drop(on)
        else:
            out = lg.with_columns(
                [pl.lit(None).alias(c) for c in right_cols])
        return out.select(out_cols).to_arrow().cast(out_schema)

    return (lt.union(rt)
            .map_batches(shard, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("__shard")
            .map_groups(join_shard, batch_format="pyarrow"))


def range_join_pairs(events, key_col: str, ts_col: str = "ts",
                     max_gap_s: int = 300, id_col: str = "event_id"):
    """Self range-join: pairs of rows with the same key whose
    timestamps are within ``max_gap_s`` (id_a < id_b).

    Partitioning: one shuffle on a SHARD of ``key_col``
    (hash(key) % P); per shard: sort by (key, ts), an O(log) window
    bound per key run via ``searchsorted``, then ONE vectorized
    repeat/arange pair-emission kernel over the whole shard.  Output
    is O(pairs actually within range), never the full cross product,
    and no per-pair Python (the old shape looped Python over every
    pair of every per-key group).  Assumes per-key groups fit a
    worker (user/session-grade keys; salt hotter keys first)."""
    import polars as pl

    from ferenda_ray.cluster import default_num_partitions
    gap_us = max_gap_s * 1_000_000
    nshards = default_num_partitions(2.0)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select([key_col]))
              .select(pl.col(key_col).hash(seed=13) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def pairs(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.select([key_col, ts_col, id_col]))
              .sort([key_col, ts_col, id_col]))
        keys = df.get_column(key_col).to_numpy()
        ts = df.get_column(ts_col).cast(pl.Int64).to_numpy()
        ids = df.get_column(id_col).to_numpy()
        n = len(ids)
        empty = pa.table({key_col: pa.array([], g.schema.field(key_col)
                                            .type),
                          "id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "gap_s": pa.array([], pa.int64())})
        if n < 2:
            return empty
        # per-row window start within each key run: ts is sorted only
        # inside a run, so the searchsorted bound runs per run (one
        # cheap O(log) call per KEY, not per pair); everything after
        # is one vectorized pass over the whole shard
        run_change = np.ones(n, dtype=bool)
        run_change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(run_change)
        ends = np.append(starts[1:], n)
        j0 = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            j0[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - gap_us,
                                          side="left")
        counts = np.arange(n) - j0                 # pairs ending at i
        total = int(counts.sum())
        if total == 0:
            return empty
        rows = np.repeat(np.arange(n), counts)     # the i of each pair
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        cols = np.repeat(j0, counts) + (np.arange(total) - offs)
        a, b = ids[cols], ids[rows]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        gap = np.abs(ts[rows] - ts[cols]) // 1_000_000
        return pa.table({
            key_col: pa.array(keys[rows]),
            "id_a": pa.array(lo, pa.int64()),
            "id_b": pa.array(hi, pa.int64()),
            "gap_s": pa.array(gap, pa.int64())})

    return (events.map_batches(shard, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("__shard")
            .map_groups(pairs, batch_format="pyarrow"))


def salted_aggregate(ds, key_cols: list, agg_col: str, num_salts: int = 16,
                     kind: str = "sum"):
    """Two-phase aggregation for HOT keys: phase 1 groups on
    (key…, salt) where salt = row-hash % num_salts — a hot key's rows
    split across ``num_salts`` reducers; phase 2 merges the partials
    with a tiny second groupby.  Use when a plain groupby would send
    one key's entire volume to a single reducer (the "salt hot keys"
    rule; the reference's longest-job-first analogue for reducers)."""
    from ray.data.aggregate import Count, Sum
    import polars as pl

    def add_salt(b: pa.Table) -> pa.Table:
        h = pl.from_arrow(b.column(key_cols[0])).rename("k") \
            .hash(seed=3).to_numpy()
        idx = np.arange(len(b))
        salt = ((h + idx) % num_salts).astype("int64")
        return b.append_column("_salt", pa.array(salt))

    phase1_agg = (Count(alias_name="_partial") if kind == "count"
                  else Sum(agg_col, alias_name="_partial"))
    partial = (ds.map_batches(add_salt, batch_format="pyarrow",
                              batch_size=65536)
               .groupby(key_cols + ["_salt"]).aggregate(phase1_agg))
    out_name = f"{kind}_{agg_col}" if kind != "count" else "n"
    final = partial.groupby(key_cols).aggregate(
        Sum("_partial", alias_name=out_name))
    return final
