# -*- coding: utf-8 -*-
"""PageRank over edge Datasets — exact vs a numpy reference."""

import numpy as np
import pyarrow as pa


def _numpy_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    out = np.zeros(len(nodes))
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(iters):
        nr = np.full(len(nodes), (1 - d) / len(nodes))
        for s, t in edges:
            nr[idx[t]] += d * r[idx[s]] / out[idx[s]]
        r = nr
    return {n: r[idx[n]] for n in nodes}


def test_pagerank_matches_reference(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.graph import pagerank
    rng = np.random.default_rng(11)
    edges = sorted({(f"n{a}", f"n{b}")
                    for a, b in rng.integers(0, 20, (80, 2)) if a != b})
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in edges],
                                 "dst": [e[1] for e in edges]}))
    got = {r["node"]: r["rank"]
           for r in pagerank(ds, iters=8, num_partitions=2).take_all()}
    want = _numpy_pagerank(edges, iters=8)
    assert set(got) == set(want)
    assert all(abs(got[n] - want[n]) < 1e-12 for n in want)


def test_pagerank_symmetric_fast_path(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.graph import pagerank
    base = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    edges = sorted(set(base + [(t, s) for s, t in base]))
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in edges],
                                 "dst": [e[1] for e in edges]}))
    slow = {r["node"]: r["rank"]
            for r in pagerank(ds, iters=6, num_partitions=2).take_all()}
    fast = {r["node"]: r["rank"]
            for r in pagerank(ds, iters=6, num_partitions=2,
                              symmetric=True).take_all()}
    assert slow == fast
    assert abs(sum(fast.values()) - 1.0) < 1e-9


def test_pagerank_plans_identical(ray_session):
    """Plan-equivalence pin: driver bincount plan (default at these
    sizes) == distributed hash-join loop (forced with
    driver_max_edges=0, the 100-TB shape), 9-digit agreement."""
    import ray.data as rd

    from ferenda_ray.stages.graph import pagerank
    rng = np.random.default_rng(7)
    edges = sorted({(f"n{a}", f"n{b}")
                    for a, b in rng.integers(0, 30, (120, 2)) if a != b})
    ds = rd.from_arrow(pa.table({"src": [e[0] for e in edges],
                                 "dst": [e[1] for e in edges]}))
    fast = {r["node"]: round(r["rank"], 9)
            for r in pagerank(ds, iters=8, num_partitions=2).take_all()}
    slow = {r["node"]: round(r["rank"], 9)
            for r in pagerank(ds, iters=8, num_partitions=2,
                              driver_max_edges=0).take_all()}
    assert fast == slow and len(fast) > 0


def test_personalized_pagerank_plans_and_mass(ray_session):
    """PPR: both plans identical; mass concentrates near the seed;
    teleport goes to seeds only (non-seed sink keeps just walk mass);
    unknown seeds raise."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ferenda_ray.stages.graph import pagerank

    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("c", "d"), ("d", "c")]
    ds = rd.from_arrow(pa.table({
        "src": [x for x, _ in edges], "dst": [y for _, y in edges]}))
    drv = {r["node"]: r["rank"]
           for r in pagerank(ds, personalize=["a"],
                             symmetric=True).take_all()}
    dist = {r["node"]: r["rank"]
            for r in pagerank(ds, personalize=["a"], symmetric=True,
                              driver_max_edges=0).take_all()}
    assert set(drv) == set(dist) == {"a", "b", "c", "d"}
    for k in drv:
        assert abs(drv[k] - dist[k]) < 1e-9, k
    # restart at 'a': the seed side of the chain holds the mass
    # (b can outrank a — a sends ALL its mass to b, b splits)
    assert drv["a"] + drv["b"] > drv["c"] + drv["d"]
    assert drv["a"] > drv["c"] > drv["d"]
    with pytest.raises(ValueError, match="no seed"):
        pagerank(ds, personalize=["zzz"]).take_all()
