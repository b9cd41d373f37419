# -*- coding: utf-8 -*-
"""Mergeable sketches: HLL count-distinct and quantile digests —
accuracy bounds vs exact, merge associativity, Ray operator paths."""

import numpy as np
import pyarrow as pa
import pytest

from ferenda_ray.stages import sketches
from ferenda_ray.stages.sketches import (
    HyperLogLog, QuantileDigest, hll_count_distinct, sketch_quantiles,
)


def test_hll_accuracy():
    for n in (100, 5000, 50000):
        h = HyperLogLog(p=12).add_many([f"item-{i}" for i in range(n)])
        est = h.estimate()
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_union():
    a = HyperLogLog(12).add_many([f"a{i}" for i in range(2000)])
    b = HyperLogLog(12).add_many([f"b{i}" for i in range(2000)])
    ab = HyperLogLog(12).add_many(
        [f"a{i}" for i in range(2000)] + [f"b{i}" for i in range(2000)])
    merged = HyperLogLog.loads(a.dumps()).merge(HyperLogLog.loads(b.dumps()))
    assert merged.estimate() == ab.estimate()  # same registers exactly
    # duplicates don't inflate
    dup = HyperLogLog(12).add_many(["x"] * 10000 + ["y"] * 10000)
    assert dup.estimate() < 10


def test_quantile_digest_accuracy():
    rng = np.random.default_rng(3)
    xs = rng.exponential(10.0, 100_000)
    d = QuantileDigest(k=256)
    # stream in chunks (forces repeated compression)
    for chunk in np.array_split(xs, 37):
        d.add_many(chunk)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = float(np.quantile(xs, q))
        got = d.quantile(q)
        # rank error: the estimate's true rank is within 1% of q
        rank = float((xs <= got).mean())
        assert abs(rank - q) < 0.01, (q, exact, got, rank)


def test_quantile_digest_merge():
    rng = np.random.default_rng(4)
    xs = rng.normal(0, 1, 40_000)
    parts = np.array_split(xs, 8)
    digests = [QuantileDigest(128).add_many(p) for p in parts]
    acc = QuantileDigest.loads(digests[0].dumps())
    for d in digests[1:]:
        acc.merge(QuantileDigest.loads(d.dumps()))
    med = acc.quantile(0.5)
    assert abs(float((xs <= med).mean()) - 0.5) < 0.02


def test_ray_hll_and_quantiles(ray_session):
    import ray.data as rd
    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_type", "value"])
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["user_id", "event_type", "value"])
    exact_users = len(set(t.column("user_id").to_pylist()))
    est = hll_count_distinct(ds, "user_id")
    assert abs(est - exact_users) / exact_users < 0.05
    rows = {r["group"]: r for r in
            sketch_quantiles(ds, "value", qs=(0.5,),
                             group_col="event_type").take_all()}
    import numpy as np
    vals = t.to_pydict()
    by_type = {}
    for et, v in zip(vals["event_type"], vals["value"]):
        by_type.setdefault(et, []).append(v)
    for et, v in by_type.items():
        exact = float(np.quantile(v, 0.5))
        got = rows[et]["p50"]
        rank = float((np.array(v) <= got).mean())
        assert abs(rank - 0.5) < 0.05, (et, exact, got)


# ---------------------------------------------------------------------------
# Space-Saving heavy hitters


def test_space_saving_guarantees():
    import collections
    import random
    rng = random.Random(5)
    # zipf-ish stream: token i has weight ~ 1/(i+1)
    pop = [f"w{i}" for i in range(200)]
    stream = [pop[min(int(rng.paretovariate(1.2)) - 1, 199)]
              for _ in range(20000)]
    true = collections.Counter(stream)
    s = sketches.SpaceSaving(64).add_many(stream)
    # every item with true count > N/capacity is monitored
    thresh = len(stream) / 64
    for it, c in true.items():
        if c > thresh:
            assert it in s.counts
    # per-item bounds: count-err <= true <= count
    for it, est in s.counts.items():
        assert est - s.errors[it] <= true[it] <= est


def test_space_saving_merge_matches_single_pass_bounds():
    import collections
    import random
    rng = random.Random(9)
    pop = [f"t{i}" for i in range(50)]
    a = [rng.choice(pop[:10]) for _ in range(5000)]
    b = [rng.choice(pop) for _ in range(5000)]
    true = collections.Counter(a + b)
    sa = sketches.SpaceSaving(32).add_many(a)
    sb = sketches.SpaceSaving(32).add_many(b)
    sa.merge(sketches.SpaceSaving.loads(sb.dumps()))
    assert sa.n == 10000
    for it, est in sa.counts.items():
        assert est - sa.errors[it] <= true[it] <= est
    # heavy items (>N/capacity) survive the merge
    for it, c in true.items():
        if c > 10000 / 32:
            assert it in sa.counts


def test_heavy_hitter_tokens_vs_exact(ray_session):
    import collections

    import ray.data as rd
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    hh = sketches.heavy_hitter_tokens(docs, "text", k=10, capacity=256)
    true = collections.Counter(
        t for r in docs.take_all() for t in r["text"].split(" "))
    exact = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    # capacity 256 >> vocab (31) → sketch IS exact here
    assert [(t, c) for t, c, _ in hh] == exact
    assert all(e == 0 for _, _, e in hh)


# ---------------------------------------------------------------------------
# Count-Min


def test_count_min_never_undercounts():
    import collections
    import random
    rng = random.Random(3)
    stream = [f"i{rng.randint(0, 400)}" for _ in range(30000)]
    true = collections.Counter(stream)
    s = sketches.CountMin(width=512, depth=4).add_many(stream)
    for it, c in true.items():
        est = s.estimate(it)
        assert est >= c
        assert est - c <= 2 * len(stream) / 512 * 4  # loose CM bound


def test_count_min_merge_equals_single_pass():
    a = ["x"] * 100 + ["y"] * 7
    b = ["x"] * 50 + ["z"] * 3
    sa = sketches.CountMin(256, 3).add_many(a)
    sb = sketches.CountMin(256, 3).add_many(b)
    sa.merge(sketches.CountMin.loads(sb.dumps()))
    whole = sketches.CountMin(256, 3).add_many(a + b)
    assert (sa.table == whole.table).all()
    assert sa.estimate("x") >= 150


def test_cm_token_counts_vs_exact(ray_session):
    import collections

    import ray.data as rd
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    true = collections.Counter(
        t for r in docs.take_all() for t in r["text"].split(" "))
    probes = [w for w, _ in true.most_common(5)] + ["absent-token"]
    est = sketches.cm_token_counts(docs, "text", probes, width=4096)
    for w in probes[:5]:
        assert est[w] >= true[w]
        assert est[w] - true[w] <= 2 * sum(true.values()) / 4096 * 4
    assert est["absent-token"] <= 2 * sum(true.values()) / 4096 * 4
