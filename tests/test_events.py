

def test_funnel_steps_strict_ordering(ray_session, tmp_path):
    """Funnel counts honor STRICT event ordering per user: a click
    before the first view does not count, and step sets shrink."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.events import funnel_steps

    t = dt.datetime(2024, 1, 1)

    def row(i, u, et, mins):
        return {"event_id": i, "ts": t + dt.timedelta(minutes=mins),
                "user_id": u, "event_type": et, "value": 1.0,
                "props": ""}

    rows = [
        # u1 completes the funnel in order
        row(1, 1, "view", 0), row(2, 1, "click", 5),
        row(3, 1, "purchase", 9),
        # u2 clicks BEFORE viewing: never reaches step 2
        row(4, 2, "click", 0), row(5, 2, "view", 5),
        row(6, 2, "purchase", 9),
        # u3 views then clicks, never purchases
        row(7, 3, "view", 0), row(8, 3, "click", 1),
        # u4 only purchases
        row(9, 4, "purchase", 0),
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    got = {r["step"]: (r["event_type"], r["n_users"])
           for r in funnel_steps(str(tmp_path)).take_all()}
    assert got[1] == ("view", 3)
    assert got[2] == ("click", 2)      # u1, u3 — u2's click was early
    assert got[3] == ("purchase", 1)   # only u1


def test_cohort_retention_fixture(ray_session, tmp_path):
    """Known cohorts: retention fractions and the epoch-week cohort
    key; non-signup users never appear."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.events import cohort_retention

    wk0 = dt.datetime(2024, 1, 4)            # some week W
    wk = dt.timedelta(weeks=1)

    def row(i, u, et, t):
        return {"event_id": i, "ts": t, "user_id": u,
                "event_type": et, "value": 1.0, "props": ""}

    rows = [
        # cohort W: u1 + u2 sign up; u1 active weeks 0,1; u2 week 0
        row(1, 1, "signup", wk0), row(2, 1, "click", wk0 + wk),
        row(3, 2, "signup", wk0 + dt.timedelta(days=1)),
        # u3: never signs up — excluded entirely
        row(4, 3, "view", wk0), row(5, 3, "click", wk0 + wk),
        # u1 event BEFORE signup week (negative offset) is dropped
        row(6, 1, "view", wk0 - wk),
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    got = {(r["cohort_week"], r["week_offset"]):
           (r["n_active"], r["retention"])
           for r in cohort_retention(str(tmp_path)).take_all()}
    # naive parquet timestamps are read verbatim (UTC wall time) —
    # wk0.timestamp() would shift by the local offset and, exactly on
    # a week boundary, flip the cohort key on east-of-UTC machines
    import calendar
    cw = calendar.timegm(wk0.timetuple()) // 604800
    assert got[(cw, 0)] == (2, 1.0)
    assert got[(cw, 1)] == (1, 0.5)
    assert set(got) == {(cw, 0), (cw, 1)}


def test_conversion_lag_fixture(ray_session, tmp_path):
    """Lag floors to whole minutes; pre-view purchases don't count;
    non-converting users are absent."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.events import conversion_lag

    t = dt.datetime(2024, 1, 1)

    def row(i, u, et, secs):
        return {"event_id": i, "ts": t + dt.timedelta(seconds=secs),
                "user_id": u, "event_type": et, "value": 1.0,
                "props": ""}

    rows = [
        row(1, 1, "view", 0), row(2, 1, "purchase", 150),   # 2.5 min
        row(3, 2, "purchase", 0), row(4, 2, "view", 60),    # early buy
        row(5, 3, "view", 0),                               # no buy
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r["lag_minutes"]
           for r in conversion_lag(str(tmp_path)).take_all()}
    assert got == {1: 2}


def test_funnel_empty_log_emits_zero_rows_per_step(ray_session,
                                                   tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.events import funnel_steps

    pq.write_table(pa.Table.from_pylist([], schema=pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])),
        str(tmp_path / "events.parquet"))
    got = sorted((r["step"], r["n_users"])
                 for r in funnel_steps(str(tmp_path)).take_all())
    assert got == [(1, 0), (2, 0), (3, 0)]
