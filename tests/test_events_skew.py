"""Skew regression for the grouped events operators (r4 VERDICT #2):
one event_type holds 90% of rows; the per-batch combiners must keep
results exact while bounding each group's shuffle input (the old
one-pandas-task-per-type shape materialized the hot group whole)."""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    n = 20_000
    types = np.where(rng.random(n) < 0.9, "hot",
                     rng.choice(["a", "b", "c"], n))
    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(seconds=int(s))
          for s in rng.integers(0, 86_400 * 3, n)]
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 500, n), pa.int64()),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(np.round(rng.random(n) * 100, 2),
                          pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def _df(skew_dir):
    return pq.read_table(f"{skew_dir}/events.parquet").to_pandas()


def test_latest_per_type_skewed(ray_session, skew_dir):
    from ferenda_ray.pipelines.events import latest_per_type
    got = latest_per_type(skew_dir, k=3).to_pandas()
    df = _df(skew_dir)
    exp = (df.sort_values(["ts", "event_id"], ascending=[False, True])
           .groupby("event_type").head(3))
    exp = exp.assign(rank=exp.groupby("event_type").cumcount() + 1)
    got_s = set(map(tuple, got[["event_type", "event_id", "rank"]]
                    .itertuples(index=False)))
    exp_s = set(map(tuple, exp[["event_type", "event_id", "rank"]]
                    .itertuples(index=False)))
    assert got_s == exp_s


def test_feed_pages_skewed(ray_session, skew_dir):
    from ferenda_ray.pipelines.events import feed_pages
    got = (feed_pages(skew_dir, page_size=100).to_pandas()
           .sort_values(["event_type", "rank"]).reset_index(drop=True))
    df = _df(skew_dir).sort_values(["ts", "event_id"],
                                   ascending=[False, True])
    df["rank"] = df.groupby("event_type").cumcount() + 1
    df["page_idx"] = (df["rank"] - 1) // 100
    exp = (df[["event_type", "page_idx", "rank", "event_id"]]
           .sort_values(["event_type", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["event_type", "page_idx", "rank", "event_id"]], exp,
        check_dtype=False)


def test_top_values_with_ties_skewed(ray_session, skew_dir):
    from ferenda_ray.pipelines.events import top_values_with_ties
    got = top_values_with_ties(skew_dir, k=5).to_pandas()
    df = _df(skew_dir)
    r = df.groupby("event_type")["value"].rank(method="min",
                                               ascending=False)
    exp = df[r <= 5].assign(rnk=r[r <= 5].astype("int64"))
    got_s = set(map(tuple, got[["event_type", "event_id", "rnk"]]
                    .itertuples(index=False)))
    exp_s = set(map(tuple, exp[["event_type", "event_id", "rnk"]]
                    .itertuples(index=False)))
    assert got_s == exp_s


def test_value_percentiles_skewed(ray_session, skew_dir):
    from ferenda_ray.pipelines.events import value_percentiles
    got = value_percentiles(skew_dir).to_pandas().set_index("event_type")
    df = _df(skew_dir)
    for t, g in df.groupby("event_type"):
        assert got.loc[t, "n"] == len(g)
        assert got.loc[t, "p50"] == pytest.approx(
            round(float(np.percentile(g["value"], 50)), 6), abs=1e-9)
        assert got.loc[t, "p95"] == pytest.approx(
            round(float(np.percentile(g["value"], 95)), 6), abs=1e-9)


def test_hourly_active_users_skewed(ray_session, skew_dir):
    from ferenda_ray.pipelines.events import hourly_active_users
    got = (hourly_active_users(skew_dir).to_pandas()
           .set_index("hour")["active_users"])
    df = _df(skew_dir)
    hour = (df["ts"].astype("int64") // 3_600_000_000)
    exp = df.groupby(hour)["user_id"].nunique()
    assert got.sort_index().tolist() == exp.sort_index().tolist()
