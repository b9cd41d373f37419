"""Stream-shaped workloads over the ``events`` table.

Ray Data has no event-time windows (SURVEY.md §2.9: neither does the
reference); windows are expressed as grouped computation over an
ordered, partitioned log — ``groupby(key)`` + in-group pandas over
ts-sorted rows.  Ordering assumption: windowing is per-key; each
group is sorted by ``ts`` inside the group UDF, so input block order
never matters.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_US_PER_HOUR = 3_600_000_000


def _read_events(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def tumbling_hour(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + value sum.
    Window id = floor(epoch_seconds / 3600) — the ``GROUP BY
    floor(ts/size)`` shape."""
    from ray.data.aggregate import Count, Sum

    def prep(b: pa.Table) -> pa.Table:
        hour = pc.divide(b.column("ts").cast(pa.int64()),
                         _US_PER_HOUR).cast(pa.int64())
        return pa.table({"event_type": b.column("event_type"),
                         "hour": hour,
                         "value": b.column("value")})

    from ferenda_ray.pipelines.relational import _round_cols
    agg = (_read_events(sf_dir, ["ts", "event_type", "value"])
           .map_batches(prep, batch_format="pyarrow", batch_size=65536)
           .groupby(["event_type", "hour"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    return agg.map_batches(lambda b: _round_cols(b, {"sum_value": 2}),
                           batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap-based): a new session starts when
    the inter-event gap exceeds ``gap_minutes``.  Per user: number of
    sessions, events, and the longest session length in events.

    Reduce side is SHARDED (user % P): one vectorized polars pass per
    shard (sort + ``diff().over(user)`` + ``cum_sum().over(user)``)
    instead of one Python/pandas call per user."""
    import polars as pl
    from ferenda_ray.cluster import default_num_partitions
    nshards = default_num_partitions(2.0)
    gap_us = gap_minutes * 60 * 1_000_000

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["user_id"]))
              .select(pl.col("user_id").hash(seed=11) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def sessions(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.select(["user_id", "ts"]))
              .sort(["user_id", "ts"])
              .with_columns(pl.col("ts").cast(pl.Int64).alias("__us")))
        df = df.with_columns(
            (pl.col("__us").diff().over("user_id").is_null()
             | (pl.col("__us").diff().over("user_id") > gap_us))
            .cast(pl.Int64).alias("__new"))
        df = df.with_columns(
            pl.col("__new").cum_sum().over("user_id").alias("__sid"))
        per = df.group_by(["user_id", "__sid"]).agg(pl.len().alias("c"))
        out = (per.group_by("user_id").agg(
            pl.col("__sid").max().alias("n_sessions"),
            pl.col("c").sum().alias("max_events_sum"),
            pl.col("c").max().alias("max_session_events"))
            .rename({"max_events_sum": "n_events"})
            .select(["user_id", "n_sessions", "n_events",
                     "max_session_events"]))
        t = out.to_arrow()
        return t.cast(pa.schema([
            ("user_id", t.schema.field("user_id").type),
            ("n_sessions", pa.int64()), ("n_events", pa.int64()),
            ("max_session_events", pa.int64())]))

    return (_read_events(sf_dir, ["ts", "user_id"])
            .map_batches(shard, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("__shard")
            .map_groups(sessions, batch_format="pyarrow"))


def top_users_by_value(sf_dir: str, k: int = 20):
    """Grouped sum + global top-k (ties broken by user_id asc)."""
    from ray.data.aggregate import Count, Sum
    agg = (_read_events(sf_dir, ["user_id", "value"])
           .groupby("user_id")
           .aggregate(Sum("value", alias_name="total_value"),
                      Count(alias_name="n_events")))
    from ferenda_ray.pipelines.relational import _round_cols
    rows = agg.sort(["total_value", "user_id"],
                    descending=[True, False]).limit(k)
    return rows.map_batches(lambda b: _round_cols(b, {"total_value": 2}),
                            batch_format="pyarrow")


def latest_per_type(sf_dir: str, k: int = 3):
    """Grouped top-k newest-first — the news-feed / atom-archive shape
    (``news_select_for_feeds`` + archive paging,
    ``documentrepository.py:3235-3377``, ``:3527-3662``): per
    event_type, the ``k`` latest events as exploded
    ``(event_type, event_id, rank)`` rows (ties broken by event_id).

    A per-batch partial top-k combiner (the ``stratified_sample``
    pattern) runs BEFORE the shuffle, so each group's exchange input
    is bounded by k·batches rows — a 90%-hot event_type never lands
    as one multi-GB task."""
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b)
              .sort(["ts", "event_id"], descending=[True, False])
              .group_by("event_type", maintain_order=True).head(k)
              .select(b.schema.names))
        return df.to_arrow().cast(b.schema)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "event_type": g["event_type"].values,
            "event_id": g["event_id"].values,
            "rank": range(1, len(g) + 1),
        })

    return (_read_events(sf_dir, ["ts", "event_type", "event_id"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("event_type")
            .map_groups(topk, batch_format="pandas"))


def frontpage_latest(sf_dir: str, k: int = 5):
    """Global newest-k — the frontpage ``islice(news_entries, 5)``
    analogue (``rfc.py:699-719``): distributed ``sort desc`` +
    ``limit``."""
    ds = (_read_events(sf_dir, ["ts", "event_id", "event_type"])
          .sort(["ts", "event_id"], descending=[True, False])
          .limit(k))
    return ds.map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "ts_us": b.column("ts").cast(pa.int64()),
        }), batch_format="pyarrow")


def feed_pages(sf_dir: str, page_size: int = 100):
    """Atom archive paging (``news_write_atom``,
    ``documentrepository.py:3527-3662``): per event_type feed, entries
    newest-first chunked into fixed pages — exploded
    ``(event_type, page_idx, rank, event_id)`` rows.

    Every entry needs its global feed rank, so the r4 shape (one
    pandas task holding the WHOLE event_type) is replaced by a
    distributed prefix sum (the ``token_budget_sample`` idiom): the
    feed is sliced into (event_type, hour) buckets; per-bucket counts
    — one tiny aggregate row each — prefix-sum newest-first on the
    driver into base offsets, and the second shuffle is keyed on the
    BOUNDED bucket, never the full event_type.  Ties (same ts) always
    land in the same bucket, so in-bucket ordering is globally
    correct."""
    import numpy as np
    import polars as pl
    from ray.data.aggregate import Count

    def prep(b: pa.Table) -> pa.Table:
        hour = pc.divide(b.column("ts").cast(pa.int64()),
                         _US_PER_HOUR).cast(pa.int64())
        return pa.table({"event_type": b.column("event_type"),
                         "hour": hour, "ts": b.column("ts"),
                         "event_id": b.column("event_id")})

    bucketed = (_read_events(sf_dir, ["ts", "event_type", "event_id"])
                .map_batches(prep, batch_format="pyarrow",
                             batch_size=65536)
                .materialize())   # two consumers: counts + rank pass
    counts = (bucketed.groupby(["event_type", "hour"])
              .aggregate(Count(alias_name="n")).take_all())  # tiny
    per_type: dict = {}
    for r in counts:
        per_type.setdefault(r["event_type"], []).append((r["hour"],
                                                         r["n"]))
    base = {}                       # (event_type, hour) -> rank offset
    for t, lst in per_type.items():
        acc = 0
        for h, n in sorted(lst, reverse=True):   # newest hour first
            base[(t, h)] = acc
            acc += n

    def pages(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g)
              .sort(["ts", "event_id"], descending=[True, False]))
        b0 = base[(df["event_type"][0], df["hour"][0])]
        rank = np.arange(1, df.height + 1, dtype=np.int64) + b0
        return pa.table({
            "event_type": df["event_type"].to_arrow(),
            "page_idx": pa.array((rank - 1) // page_size, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
            "event_id": df["event_id"].to_arrow(),
        })

    return (bucketed.groupby(["event_type", "hour"])
            .map_groups(pages, batch_format="pyarrow"))


def hopping_15m_of_hour(sf_dir: str):
    """1-hour windows hopping every 15 min, per event_type: count +
    value sum (the overlapping-window aggregate; each event lands in
    4 windows)."""
    from ferenda_ray.stages.windows import hopping_window
    from ferenda_ray.pipelines.relational import _round_cols
    out = hopping_window(
        _read_events(sf_dir, ["ts", "event_type", "value"]),
        size_s=3600, hop_s=900, key_cols=["event_type"],
        aggs={"n_events": ("ts", "count"), "sum_value": ("value", "sum")})
    return out.map_batches(lambda b: _round_cols(b, {"sum_value": 2}),
                           batch_format="pyarrow")


def asof_hourly_share(sf_dir: str):
    """As-of join: each event picks the latest completed hourly stats
    row (count for its event_type in the PREVIOUS hour) — the
    trades-to-quotes shape.  Right side is the tumbling-hour aggregate
    shifted forward one hour."""
    import ray.data as rd
    from ferenda_ray.stages.windows import asof_join

    hourly = (tumbling_hour(sf_dir)
              .map_batches(lambda b: pa.table({
                  "event_type": b.column("event_type"),
                  "avail_us": pc.multiply(
                      pc.add(b.column("hour"), 1),
                      _US_PER_HOUR).cast(pa.int64()),
                  "prev_hour_events": b.column("n_events"),
              }), batch_format="pyarrow"))
    left = (_read_events(sf_dir, ["ts", "event_type", "event_id"])
            .map_batches(lambda b: pa.table({
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "ts_us": b.column("ts").cast(pa.int64()),
            }), batch_format="pyarrow"))
    out = asof_join(left, hourly, on="avail_us", by="event_type",
                    right_cols=["prev_hour_events"], ts_col_left="ts_us")
    return out.map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id").cast(pa.int64()),
            "event_type": b.column("event_type"),
            "prev_hour_events":
                b.column("prev_hour_events").cast(pa.int64()),
        }), batch_format="pyarrow")


def range_pairs_5m(sf_dir: str, max_gap_s: int = 300):
    """Self range-join per user: event pairs within 5 minutes."""
    from ferenda_ray.stages.windows import range_join_pairs
    ev = (_read_events(sf_dir, ["ts", "user_id", "event_id"]))
    out = range_join_pairs(ev, key_col="user_id", max_gap_s=max_gap_s)
    return out.map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id").cast(pa.int64()),
            "id_a": b.column("id_a").cast(pa.int64()),
            "id_b": b.column("id_b").cast(pa.int64()),
            "gap_s": b.column("gap_s").cast(pa.int64()),
        }), batch_format="pyarrow")


def event_type_share(sf_dir: str):
    """Count per event_type + share of total (two-pass small agg)."""
    from ray.data.aggregate import Count
    agg = (_read_events(sf_dir, ["event_type"])
           .groupby("event_type").count())
    t = pa.Table.from_pylist(agg.take_all())
    total = pc.sum(t.column("count()")).as_py()
    from ferenda_ray.pipelines.relational import round_half_away
    share = round_half_away(pc.divide(
        pc.cast(t.column("count()"), pa.float64()), total), 6)
    return pa.table({"event_type": t.column("event_type"),
                     "n": t.column("count()"),
                     "share": share})


def rolling_user_avg(sf_dir: str, window: int = 5):
    """Per-user rolling mean of ``value`` over the current + preceding
    ``window-1`` events (ts, event_id order) — the bounded-preceding
    window-frame operator Ray Data lacks natively: ONE shuffle on a
    user SHARD + a vectorized polars ``rolling_mean(...).over(user)``
    per shard (not one Python call per user)."""
    import polars as pl
    from ferenda_ray.cluster import default_num_partitions
    nshards = default_num_partitions(2.0)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["user_id"]))
              .select(pl.col("user_id").hash(seed=11) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def roll(g: pa.Table) -> pa.Table:
        from ferenda_ray.pipelines.relational import _round_cols
        out = (pl.from_arrow(
            g.select(["event_id", "ts", "user_id", "value"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(pl.col("value")
                          .rolling_mean(window, min_samples=1)
                          .over("user_id")
                          .alias("rolling_avg"))
            .select(["event_id", "user_id", "rolling_avg"]))
        # round via the engine's half-away-from-zero (= DuckDB round),
        # not polars' rounding mode
        return _round_cols(out.to_arrow(), {"rolling_avg": 4})

    return (_read_events(sf_dir, ["event_id", "ts", "user_id", "value"])
            .map_batches(shard, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("__shard")
            .map_groups(roll, batch_format="pyarrow"))


def value_percentiles(sf_dir: str):
    """Exact per-type value percentiles (p50/p95, linear interpolation
    — numpy percentile == SQL quantile_cont) via the bounded-domain
    histogram shape (``text_analysis.grouped_bounded_quantiles``):
    per batch a vectorized (event_type, value) count, ONE groupby-sum
    whose row count is bounded by types × DISTINCT values (the
    2-decimal ``value`` domain), and a driver walk that picks the two
    order statistics around each target rank and interpolates.  No
    task ever holds a full group (the r4 ``map_groups`` shape did);
    for a truly continuous value domain use the q-digest sketch in
    ``stages/sketches``."""
    import numpy as np
    import polars as pl
    from ray.data.aggregate import Sum as _Sum

    def hist(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(["event_type", "value"]))
              .group_by(["event_type", "value"])
              .agg(pl.len().cast(pl.Int64).alias("__c")))
        return df.to_arrow()

    rows = (_read_events(sf_dir, ["event_type", "value"])
            .map_batches(hist, batch_format="pyarrow", batch_size=65536)
            .groupby(["event_type", "value"])
            .aggregate(_Sum("__c", alias_name="__c"))
            .take_all())            # types × distinct values: small
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append((r["value"],
                                                     r["__c"]))
    out = {"event_type": [], "p50": [], "p95": [], "n": []}
    for g in sorted(by_g):
        bins = sorted(by_g[g])
        vals = np.array([v for v, _ in bins], dtype=np.float64)
        cum = np.cumsum(np.array([c for _, c in bins], dtype=np.int64))
        n = int(cum[-1])

        def q_at(q: float) -> float:
            pos = (n - 1) * q       # numpy 'linear' == quantile_cont
            lo = int(np.floor(pos))
            vlo = vals[np.searchsorted(cum, lo + 1)]
            vhi = vals[np.searchsorted(cum, int(np.ceil(pos)) + 1)]
            return float(vlo + (vhi - vlo) * (pos - lo))

        out["event_type"].append(g)
        out["p50"].append(round(q_at(0.5), 6))
        out["p95"].append(round(q_at(0.95), 6))
        out["n"].append(n)
    return pa.table({"event_type": pa.array(out["event_type"]),
                     "p50": pa.array(out["p50"], pa.float64()),
                     "p95": pa.array(out["p95"], pa.float64()),
                     "n": pa.array(out["n"], pa.int64())})


def hourly_active_users(sf_dir: str):
    """Per-hour distinct-user count — windowed COUNT(DISTINCT):
    per-batch partial dedup of (hour, user) pairs, one shuffle on the
    pair key, then a per-hour set-size group body (the exact path; the
    HLL sketch in ``stages/sketches`` is the 100-TB variant)."""
    def pairs(b: pa.Table) -> pa.Table:
        import polars as pl
        hour = pc.divide(b.column("ts").cast(pa.int64()),
                         _US_PER_HOUR).cast(pa.int64())
        t = pa.table({"hour": hour, "user_id": b.column("user_id")})
        # per-batch combiner: drop duplicate pairs before the shuffle
        return pl.from_arrow(t).unique().to_arrow()

    def count_distinct(g: pa.Table) -> pa.Table:
        # vectorized n_unique — no Python set per hour group
        import polars as pl
        df = pl.from_arrow(g)
        return pa.table({"hour": pa.array([df["hour"][0]], pa.int64()),
                         "active_users": pa.array(
                             [df["user_id"].n_unique()], pa.int64())})

    return (_read_events(sf_dir, ["ts", "user_id"])
            .map_batches(pairs, batch_format="pyarrow", batch_size=65536)
            .groupby("hour")
            .map_groups(count_distinct, batch_format="pyarrow"))


def top_values_with_ties(sf_dir: str, k: int = 5):
    """Top-k ``value`` rows per event_type INCLUDING ties — RANK()
    semantics (row_number would drop tied rows arbitrarily).

    A per-batch partial rank-≤k filter runs before the shuffle (a
    globally top-k row is top-k within its batch too), so each
    group's exchange input is bounded by ~k·batches rows — except
    under massive value ties, where the OUTPUT itself is unbounded by
    RANK semantics."""
    import pandas as pd
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(
            pl.col("value").rank(method="min", descending=True)
            .over("event_type") <= k)
        return df.select(b.schema.names).to_arrow().cast(b.schema)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        r = g["value"].rank(method="min", ascending=False)
        out = g[r <= k].copy()
        out["rnk"] = r[r <= k].astype("int64")
        return out[["event_type", "event_id", "value", "rnk"]] \
            .sort_values(["rnk", "event_id"])

    return (_read_events(sf_dir, ["event_id", "event_type", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("event_type")
            .map_groups(topk, batch_format="pandas"))


def type_hour_rollup(sf_dir: str):
    """ROLLUP(event_type, hour): detail rows + per-type subtotals +
    grand total — expressed as one detail aggregation reused for both
    subtotal levels (re-aggregate the small result, NOT the input —
    the classic rollup-from-cube trick)."""
    import polars as pl

    def prep(b: pa.Table) -> pa.Table:
        hour = pc.divide(b.column("ts").cast(pa.int64()),
                         _US_PER_HOUR).cast(pa.int64())
        return pa.table({"event_type": b.column("event_type"),
                         "hour": hour})

    from ray.data.aggregate import Count
    detail = (_read_events(sf_dir, ["ts", "event_type"])
              .map_batches(prep, batch_format="pyarrow",
                           batch_size=65536)
              .groupby(["event_type", "hour"])
              .aggregate(Count(alias_name="n")))

    def finalize(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        per_type = (df.group_by("event_type").agg(pl.col("n").sum())
                    .with_columns(hour=pl.lit(None, pl.Int64)))
        grand = df.select(pl.col("n").sum()).with_columns(
            event_type=pl.lit(None, pl.String),
            hour=pl.lit(None, pl.Int64))
        out = pl.concat([df, per_type.select(df.columns),
                         grand.select(df.columns)])
        return out.to_arrow()

    # the rollup levels need ALL detail rows → one small materialize
    # of the aggregated (not raw) table; explicit schema so an empty
    # input still yields the three-column rollup shape
    import ray.data as rd
    rollup_schema = pa.schema([("event_type", pa.string()),
                               ("hour", pa.int64()),
                               ("n", pa.int64())])
    t = pa.Table.from_pylist(detail.take_all(), schema=rollup_schema)
    return rd.from_arrow(finalize(t))


def value_histogram(sf_dir: str, bins: int = 10, lo: float = 0.0,
                    hi: float = 100.0):
    """Fixed-bin histogram of ``value`` per event_type: bin id
    assigned per batch (vectorized floor), ONE groupby on
    (type, bin) — no data-dependent passes."""
    width = (hi - lo) / bins

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value")
        binid = pc.cast(pc.floor(pc.divide(pc.subtract(v, lo), width)),
                        pa.int64())
        binid = pc.min_element_wise(pc.max_element_wise(binid, 0),
                                    bins - 1)
        return pa.table({"event_type": b.column("event_type"),
                         "bin": binid})

    from ray.data.aggregate import Count
    return (_read_events(sf_dir, ["event_type", "value"])
            .map_batches(prep, batch_format="pyarrow", batch_size=65536)
            .groupby(["event_type", "bin"])
            .aggregate(Count(alias_name="n")))


def value_hour_correlation(sf_dir: str):
    """Pearson corr(value, hour-of-day) per event_type via the
    partial-sums combiner: each batch emits (n, Σx, Σy, Σxy, Σx²,
    Σy²) per type, one tiny groupby merges, closed form finishes —
    the distributed-statistics shape (no second pass over the data)."""
    import numpy as np
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        hour_of_day = pc.cast(
            pc.divide(pc.cast(b.column("ts").cast(pa.int64()),
                              pa.int64()), _US_PER_HOUR), pa.int64())
        hod = pc.cast(
            pc.subtract(hour_of_day,
                        pc.multiply(pc.divide(hour_of_day, 24), 24)),
            pa.float64())
        t = pa.table({"event_type": b.column("event_type"),
                      "x": pc.cast(b.column("value"), pa.float64()),
                      "y": hod})
        df = pl.from_arrow(t)
        return (df.group_by("event_type").agg(
            n=pl.len().cast(pl.Float64),
            sx=pl.col("x").sum(), sy=pl.col("y").sum(),
            sxy=(pl.col("x") * pl.col("y")).sum(),
            sxx=(pl.col("x") ** 2).sum(),
            syy=(pl.col("y") ** 2).sum()).to_arrow())

    def finalize(g: pa.Table) -> pa.Table:
        import numpy as np
        n = float(np.sum(g.column("n").to_numpy()))
        sx = float(np.sum(g.column("sx").to_numpy()))
        sy = float(np.sum(g.column("sy").to_numpy()))
        sxy = float(np.sum(g.column("sxy").to_numpy()))
        sxx = float(np.sum(g.column("sxx").to_numpy()))
        syy = float(np.sum(g.column("syy").to_numpy()))
        num = n * sxy - sx * sy
        den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
        corr = num / den if den else float("nan")
        return pa.table({
            "event_type": [g.column("event_type")[0].as_py()],
            "corr_value_hour": pa.array([round(corr, 6)], pa.float64()),
        })

    return (_read_events(sf_dir, ["ts", "event_type", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("event_type")
            .map_groups(finalize, batch_format="pyarrow"))


def latest_value_per_user(sf_dir: str):
    """ARG-MAX per group: each user's value at their latest event —
    per-batch polars combiner keeps one candidate per (user, max ts)
    before the shuffle; the reduce side is SHARDED (user % P), one
    vectorized polars pass per shard instead of one Python call per
    user (SQL ``arg_max`` with a deterministic event_id tie-break)."""
    import polars as pl
    from ferenda_ray.cluster import default_num_partitions
    nshards = default_num_partitions(2.0)

    def _tail1(t: pa.Table) -> pl.DataFrame:
        return (pl.from_arrow(t)
                .sort(["user_id", "ts", "event_id"])
                .group_by("user_id", maintain_order=True).tail(1))

    def combine(b: pa.Table) -> pa.Table:
        out = _tail1(b).with_columns(
            (pl.col("user_id").hash(seed=7) % nshards)
            .cast(pl.Int64).alias("__shard"))
        return out.to_arrow()

    def finalize(g: pa.Table) -> pa.Table:
        out = _tail1(g).select(
            "user_id", pl.col("value").alias("latest_value"))
        return out.to_arrow()

    return (_read_events(sf_dir, ["event_id", "ts", "user_id", "value"])
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("__shard")
            .map_groups(finalize, batch_format="pyarrow"))


def user_zscore_outliers(sf_dir: str, z: float = 3.0):
    """Anomaly detection: events whose ``value`` deviates more than
    ``z`` population standard deviations from the USER's own mean.
    Two-phase: per-batch (user, n, Σv, Σv²) polars combiner shrinks
    the exchange to one row per (user × batch), one groupby-sum, then
    a hash join back and a vectorized filter — no per-user Python.
    Zero-variance users are excluded (z undefined)."""
    import polars as pl
    from ray.data.aggregate import Sum as _Sum

    from ferenda_ray.cluster import (coalesce_partitions, join_partitions,
                                     ray_join_handles_empty_blocks)
    from ferenda_ray.pipelines.relational import _round_cols

    ev = _read_events(sf_dir, ["event_id", "user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(["user_id", "value"]))
              .group_by("user_id")
              .agg(pl.len().cast(pl.Int64).alias("n"),
                   pl.col("value").sum().alias("s"),
                   (pl.col("value") ** 2).sum().alias("s2")))
        return df.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("n", pa.int64()),
            ("s", pa.float64()), ("s2", pa.float64())]))

    stats = (ev.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("user_id")
             .aggregate(_Sum("n", alias_name="n"),
                        _Sum("s", alias_name="s"),
                        _Sum("s2", alias_name="s2")))

    def moments(b: pa.Table) -> pa.Table:
        import numpy as np
        n = b.column("n").to_numpy().astype(np.float64)
        m = b.column("s").to_numpy() / n
        var = np.maximum(b.column("s2").to_numpy() / n - m * m, 0.0)
        return pa.table({"__u": b.column("user_id"),
                         "__m": pa.array(m, pa.float64()),
                         "__sd": pa.array(np.sqrt(var), pa.float64())})

    stats = stats.map_batches(moments, batch_format="pyarrow")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        ev, stats = ev.repartition(co), stats.repartition(co)
    j = ev.join(stats, join_type="inner", num_partitions=np_,
                on=("user_id",), right_on=("__u",))

    def flag(b: pa.Table) -> pa.Table:
        import numpy as np
        v = b.column("value").to_numpy()
        m = b.column("__m").to_numpy()
        sd = b.column("__sd").to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            zs = (v - m) / sd
        keep = (sd > 0) & (np.abs(zs) > z)
        out = pa.table({
            "event_id": b.column("event_id").filter(pa.array(keep)),
            "user_id": b.column("user_id").filter(pa.array(keep)),
            "value": b.column("value").filter(pa.array(keep)),
            "zscore": pa.array(zs[keep], pa.float64())})
        return _round_cols(out, {"value": 6, "zscore": 4})

    return j.map_batches(flag, batch_format="pyarrow")


def user_value_ewma(sf_dir: str, alpha: float = 0.1):
    """Per-user exponentially-weighted value (adjust=False recursion
    v'_t = α·v_t + (1−α)·v'_{t−1} over (ts, event_id) order), final
    state per user — the time-decayed feature of a streaming profile,
    computed batch-side.  One shuffle on a user SHARD + a vectorized
    polars ``ewm_mean(...).over(user)`` per shard; the SQL oracle
    restates the closed form (weight α(1−α)^{k−1} for the k-th-latest
    event, (1−α)^{n−1} for the first)."""
    import polars as pl

    from ferenda_ray.cluster import default_num_partitions
    from ferenda_ray.pipelines.relational import _round_cols
    nshards = default_num_partitions(2.0)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["user_id"]))
              .select(pl.col("user_id").hash(seed=11) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def ewma(g: pa.Table) -> pa.Table:
        out = (pl.from_arrow(
            g.select(["user_id", "ts", "event_id", "value"]))
            .sort(["user_id", "ts", "event_id"])
            .group_by("user_id", maintain_order=True)
            .agg(pl.col("value")
                 .ewm_mean(alpha=alpha, adjust=False)
                 .last().alias("ewma")))
        return _round_cols(out.to_arrow(), {"ewma": 6})

    return (_read_events(sf_dir, ["event_id", "ts", "user_id", "value"])
            .map_batches(shard, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("__shard")
            .map_groups(ewma, batch_format="pyarrow"))


def cumulative_users(sf_dir: str):
    """User growth curve: cumulative count of distinct users by the
    hour of their FIRST event.  Distinct-over-time without a window
    COUNT(DISTINCT): per-user min(ts) (one aggregate), hourly
    first-seen counts (second aggregate), then a cumsum over the
    hour table — which is aggregation-sized (hours, not events), so
    the driver-side running total is the documented small side."""
    import pandas as pd

    from ray.data.aggregate import Min as _Min

    ev = _read_events(sf_dir, ["user_id", "ts"])
    first = ev.groupby("user_id").aggregate(_Min("ts", alias_name="first_ts"))

    def hour(b: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({"hr": _pc.floor_temporal(
            b.column("first_ts"), unit="hour")})

    rows = (first.map_batches(hour, batch_format="pyarrow")
            .groupby("hr").count().take_all())
    rows.sort(key=lambda r: r["hr"])
    acc, out_h, out_c = 0, [], []
    for r in rows:
        acc += r["count()"]
        out_h.append(r["hr"])
        out_c.append(acc)
    return pd.DataFrame({"hr": out_h, "cum_users": out_c})


def funnel_steps(sf_dir: str,
                 steps: tuple = ("view", "click", "purchase")):
    """Ordered event funnel: per user, step k counts iff a step-k
    event happens STRICTLY AFTER the user's earliest completion of
    step k-1 (the classic product-analytics funnel).  Output: one row
    per step — ``(step, event_type, n_users)``.

    Reduce side is SHARDED (user % P, the ``sessionize`` idiom): each
    shard resolves its users' sequential min-times in ONE vectorized
    polars pass (per-step filter → min-over-user → join), emits a
    per-shard count row per step, and a final ≤P×steps-row reduce
    sums them — no per-user Python, no global shuffle of raw
    events beyond the one shard exchange."""
    import polars as pl
    from ray.data.aggregate import Sum

    from ferenda_ray.cluster import default_num_partitions
    nshards = default_num_partitions(2.0)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["user_id"]))
              .select(pl.col("user_id").hash(seed=13) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def per_shard(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.select(["user_id", "ts", "event_type"]))
              .with_columns(pl.col("ts").cast(pl.Int64).alias("__us")))
        reached = None       # frame (user_id, __t) of completed users
        counts = []
        for k, et in enumerate(steps):
            ev = df.filter(pl.col("event_type") == et)
            if k > 0:
                ev = (ev.join(reached, on="user_id")
                      .filter(pl.col("__us") > pl.col("__t"))
                      .drop("__t"))
            reached = (ev.group_by("user_id")
                       .agg(pl.col("__us").min().alias("__t")))
            counts.append(reached.height)
        return pa.table({
            "step": pa.array(range(1, len(steps) + 1), pa.int64()),
            "event_type": pa.array(list(steps), pa.string()),
            "__n": pa.array(counts, pa.int64())})

    agg = (_read_events(sf_dir, ["ts", "user_id", "event_type"])
           .map_batches(shard, batch_format="pyarrow",
                        batch_size=65536)
           .groupby("__shard")
           .map_groups(per_shard, batch_format="pyarrow")
           .groupby(["step", "event_type"])
           .aggregate(Sum("__n", alias_name="n_users")))
    # an EMPTY event log yields no shard groups at all — the funnel
    # contract (like its SQL restatement) is one row per step, so
    # fill missing steps with 0 (≤len(steps) rows on the driver)
    rows = {r["step"]: r for r in agg.take_all()}
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "step": pa.array(range(1, len(steps) + 1), pa.int64()),
        "event_type": pa.array(list(steps), pa.string()),
        "n_users": pa.array(
            [rows.get(k, {}).get("n_users", 0)
             for k in range(1, len(steps) + 1)], pa.int64())}))


def cohort_retention(sf_dir: str, max_weeks: int = 8):
    """Signup-cohort retention: users cohort by the EPOCH-based week
    (floor(epoch/604800) — identical arithmetic in polars and SQL;
    calendar date_trunc('week') anchors differ across engines) of
    their first ``signup`` event; retention at offset w = distinct
    cohort users with ANY event in cohort_week + w, as a fraction of
    the cohort.  Output ``(cohort_week, week_offset, n_active,
    retention)`` for 0 ≤ w ≤ ``max_weeks``.

    Sharded per-user resolution (the ``sessionize`` idiom): each
    shard emits per-(cohort, offset) distinct-user counts AND cohort
    sizes (kind-tagged offset −1) from one vectorized polars pass;
    one tiny groupby sums the partials and a final map divides."""
    import math

    import polars as pl
    from ray.data.aggregate import Sum

    from ferenda_ray.cluster import default_num_partitions

    nshards = default_num_partitions(2.0)
    WK_US = 604_800 * 1_000_000

    def _rha_f(v: float, p: float = 1e6) -> float:
        return math.floor(abs(v) * p + 0.5) / p * (1 if v >= 0 else -1)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["user_id"]))
              .select(pl.col("user_id").hash(seed=29) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def per_shard(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.select(["user_id", "ts", "event_type"]))
              .with_columns((pl.col("ts").cast(pl.Int64) // WK_US)
                            .alias("__wk")))
        s = (df.filter(pl.col("event_type") == "signup")
             .group_by("user_id")
             .agg(pl.col("__wk").min().alias("__cw")))
        a = (df.join(s, on="user_id")
             .with_columns((pl.col("__wk") - pl.col("__cw"))
                           .alias("__off"))
             .filter((pl.col("__off") >= 0)
                     & (pl.col("__off") <= max_weeks))
             .select(["__cw", "__off", "user_id"]).unique())
        counts = (a.group_by(["__cw", "__off"])
                  .agg(pl.len().cast(pl.Int64).alias("__n")))
        sizes = (s.group_by("__cw")
                 .agg(pl.len().cast(pl.Int64).alias("__n"))
                 .with_columns(pl.lit(-1, pl.Int64).alias("__off"))
                 .select(["__cw", "__off", "__n"]))
        t = pl.concat([counts.select(["__cw", "__off", "__n"]),
                       sizes]).to_arrow()
        return t.cast(pa.schema([("__cw", pa.int64()),
                                 ("__off", pa.int64()),
                                 ("__n", pa.int64())]))

    agg = (_read_events(sf_dir, ["ts", "user_id", "event_type"])
           .map_batches(shard, batch_format="pyarrow",
                        batch_size=65536)
           .groupby("__shard")
           .map_groups(per_shard, batch_format="pyarrow")
           .groupby(["__cw", "__off"])
           .aggregate(Sum("__n", alias_name="n"))
           .materialize())
    sizes = {r["__cw"]: r["n"] for r in agg.take_all()
             if r["__off"] == -1}

    def finish(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).filter(pl.col("__off") >= 0)
        cws = df.get_column("__cw").to_list()
        ns = df.get_column("n").to_list()
        ret = [_rha_f(n / sizes[c]) for n, c in zip(ns, cws)]
        return pa.table({
            "cohort_week": pa.array(cws, pa.int64()),
            "week_offset": pa.array(df.get_column("__off").to_list(),
                                    pa.int64()),
            "n_active": pa.array(ns, pa.int64()),
            "retention": pa.array(ret, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def conversion_lag(sf_dir: str, frm: str = "view",
                   to: str = "purchase"):
    """Per-user conversion latency: whole minutes (floor) from the
    user's FIRST ``frm`` event to the first ``to`` event STRICTLY
    after it — the funnel's time dimension.  Users that never convert
    are absent.  Sharded per-user resolution (one vectorized polars
    pass per shard, the ``sessionize`` idiom)."""
    import polars as pl

    from ferenda_ray.cluster import default_num_partitions
    nshards = default_num_partitions(2.0)

    def shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["user_id"]))
              .select(pl.col("user_id").hash(seed=31) % nshards)
              .to_series().to_numpy().astype("int64"))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    def per_shard(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g.select(["user_id", "ts", "event_type"]))
              .with_columns(pl.col("ts").cast(pl.Int64).alias("__us")))
        v = (df.filter(pl.col("event_type") == frm)
             .group_by("user_id")
             .agg(pl.col("__us").min().alias("__t0")))
        p = (df.filter(pl.col("event_type") == to)
             .join(v, on="user_id")
             .filter(pl.col("__us") > pl.col("__t0"))
             .group_by("user_id")
             .agg(pl.col("__us").min().alias("__t1"),
                  pl.col("__t0").first().alias("__t0")))
        out = p.select(
            "user_id",
            ((pl.col("__t1") - pl.col("__t0"))
             // 60_000_000).alias("lag_minutes"))
        t = out.to_arrow()
        return t.cast(pa.schema([
            ("user_id", t.schema.field("user_id").type),
            ("lag_minutes", pa.int64())]))

    return (_read_events(sf_dir, ["ts", "user_id", "event_type"])
            .map_batches(shard, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("__shard")
            .map_groups(per_shard, batch_format="pyarrow"))
