"""Temporal custom operators: hopping windows, as-of join, range
join, salted aggregation (stages/windows.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ferenda_ray.stages.windows import (
    asof_join, hopping_window, range_join_pairs, salted_aggregate)


def _events(ray_session):
    import ray.data as rd
    ts = pd.to_datetime([
        "2024-01-01 00:05", "2024-01-01 00:20", "2024-01-01 01:10",
        "2024-01-01 01:12", "2024-01-01 02:40",
    ])
    return rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8, 7], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    }))


def test_hopping_window_fanout(ray_session):
    ds = _events(ray_session)
    out = hopping_window(ds, size_s=3600, hop_s=900,
                         aggs={"n": ("ts", "count")})
    rows = {r["window_start"]: r["n"] for r in out.take_all()}
    # every event appears in exactly 4 windows
    assert sum(rows.values()) == 5 * 4
    # the 00:00 window holds both 00:05 and 00:20
    base = int(pd.Timestamp("2024-01-01").timestamp())
    assert rows[base] == 2
    # the 23:15 window [23:15, 00:15) holds only 00:05
    assert rows[base - 2700] == 1


def test_asof_join_backward(ray_session):
    import ray.data as rd
    left = _events(ray_session).map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64())}),
        batch_format="pyarrow")
    base = int(pd.Timestamp("2024-01-01").timestamp()) * 1_000_000
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "avail_us": pa.array([base, base + 3_600_000_000, base],
                             pa.int64()),
        "tag": ["early7", "late7", "only8"],
    }))
    out = asof_join(left, right, on="avail_us", by="user_id",
                    right_cols=["tag"], ts_col_left="ts_us")
    got = {r["event_id"]: r["tag"] for r in out.take_all()}
    assert got[1] == "early7" and got[2] == "early7"
    assert got[3] == "late7" and got[5] == "late7"
    assert got[4] == "only8"


def test_range_join_pairs(ray_session):
    ds = _events(ray_session)
    out = range_join_pairs(ds, key_col="user_id", max_gap_s=1200)
    pairs = {(r["id_a"], r["id_b"]): r["gap_s"] for r in out.take_all()}
    # user 7: (1,2) 15min apart; 3 is 50min after 2 (out of range)
    assert pairs == {(1, 2): 900}
    wide = range_join_pairs(ds, key_col="user_id", max_gap_s=4000)
    ids = set((r["id_a"], r["id_b"])
              for r in wide.take_all())
    assert (2, 3) in ids and (1, 3) in ids
    assert (3, 4) not in ids  # different users never pair


def test_salted_aggregate_matches_plain(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    keys = np.where(rng.random(5000) < 0.8, "hot", "cold")  # heavy skew
    vals = rng.integers(0, 10, 5000)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals.astype("float64")}))
    out = {r["k"]: r["sum_v"]
           for r in salted_aggregate(ds, ["k"], "v",
                                     num_salts=8).take_all()}
    expect = {"hot": float(vals[keys == "hot"].sum()),
              "cold": float(vals[keys == "cold"].sum())}
    assert out == expect
    cnt = {r["k"]: r["n"]
           for r in salted_aggregate(ds, ["k"], "v", num_salts=8,
                                     kind="count").take_all()}
    assert cnt == {"hot": int((keys == "hot").sum()),
                   "cold": int((keys == "cold").sum())}
