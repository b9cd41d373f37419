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

    Partitioning assumption: co-partition BOTH sides by ``by`` (one
    union + one groupby shuffle); within a group the pandas
    ``merge_asof`` sorts by time — valid because as-of semantics are
    per-key.  Right side must be the smaller/dimension side per key.
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

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == "l"].drop(columns=["_side"] + right_only)
        rg = g[g["_side"] == "r"].drop(columns=["_side"])
        lg = lg.sort_values(ts_col_left)
        rg = rg[[by, on] + right_cols].dropna(subset=[on])
        rg = rg.sort_values(on)
        if not len(lg):
            return pd.DataFrame()
        if not len(rg):
            out = lg.copy()
            for c in right_cols:
                out[c] = None
            return out
        out = pd.merge_asof(lg, rg.drop(columns=[by]),
                            left_on=ts_col_left, right_on=on,
                            direction=direction)
        return out.drop(columns=[on])

    return lt.union(rt).groupby(by).map_groups(join_group,
                                               batch_format="pandas")


def range_join_pairs(events, key_col: str, ts_col: str = "ts",
                     max_gap_s: int = 300, id_col: str = "event_id"):
    """Self range-join: pairs of rows with the same key whose
    timestamps are within ``max_gap_s`` (id_a < id_b).

    Partitioning: one shuffle on ``key_col``; per group a sorted
    two-pointer sweep — O(n·m) only over rows actually within range,
    never the full cross product.  Assumes per-key groups fit a
    worker (true when the key is a user/session-grade key; salt
    hotter keys first)."""
    gap_us = max_gap_s * 1_000_000

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        ts = g[ts_col].astype("int64").to_numpy()
        ids = g[id_col].to_numpy()
        key = g[key_col].iloc[0]
        a_out, b_out, gap_out = [], [], []
        j0 = 0
        for i in range(len(g)):
            while ts[i] - ts[j0] > gap_us:
                j0 += 1
            for j in range(j0, i):
                lo, hi = sorted((int(ids[j]), int(ids[i])))
                a_out.append(lo)
                b_out.append(hi)
                gap_out.append(int(abs(ts[i] - ts[j]) // 1_000_000))
        return pd.DataFrame({key_col: [key] * len(a_out),
                             "id_a": a_out, "id_b": b_out,
                             "gap_s": gap_out})

    return events.groupby(key_col).map_groups(pairs,
                                              batch_format="pandas")


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
