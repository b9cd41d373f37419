"""Iterative graph algorithms over edge Datasets.

Complements ``stages/canonicalize.label_propagation`` (connected
components) with PageRank — the canonical iterative join+aggregate
the Dataset API can express directly: each iteration is ONE hash join
(edges ⋈ ranks on src) and ONE groupby-sum on dst, so the work per
iteration is proportional to the edge count with no driver-side
state.  Deterministic: fixed iteration count, float64, uniform init —
which also makes it SQL-oracle-checkable via an unrolled CTE chain.

Ray 2.49 hygiene (same as label_propagation): both join inputs are
repartitioned to a small fixed partition count per iteration —
``Dataset.join`` breaks on empty blocks and the rank table is tiny
relative to the cluster.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["pagerank"]


#: Edge ceiling for the driver (numpy) PageRank plan — same order as
#: the package's other measured-size caps (closure 2M edges, minhash
#: 256 MB): 2M edges of two ~60-byte URIs ≈ 240 MB collected.
DRIVER_PAGERANK_MAX_EDGES = 2_000_000


def pagerank(edges, damping: float = 0.85, iters: int = 10,
             num_partitions: int | None = None, symmetric: bool = False,
             driver_max_edges: int = DRIVER_PAGERANK_MAX_EDGES,
             personalize: list | None = None):
    """PageRank over a directed edge Dataset ``(src, dst)``.

    Returns a Dataset ``(node, rank)`` over all nodes appearing as a
    src or dst.  Nodes without outlinks contribute their damped mass
    nowhere (classic "dangling" simplification is NOT applied — feed a
    symmetrized edge set for random-walk semantics).

    ``personalize``: optional seed-node list → PERSONALIZED PageRank:
    init mass 1/|S∩nodes| on the seeds, teleport (1−d)/|S∩nodes| to
    the seeds only (0 elsewhere).  The seed set ships in the task
    closures — it is the "random walk with restart from a small seed
    set" regime (seeds ≪ graph); for corpus-sized seed sets use plain
    PageRank.

    PLAN PICK from the MEASURED edge count (the ``minhash_lsh_pairs``
    idiom): the distributed loop is ~4 exchanges × ``iters`` of fixed
    actor-startup overhead, which dominates any graph small enough to
    collect.  Under ``driver_max_edges`` (~240 MB) the same fixed-
    iteration float64 recurrence runs as numpy ``bincount`` passes on
    the driver; above it the hash-join loop runs unchanged.  Both
    plans are asserted rank-identical (9 digits) in pytest
    (``tests/test_graph.py``).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ferenda_ray.cluster import coalesce_partitions
    num_partitions = num_partitions or coalesce_partitions()
    edges = edges.materialize()
    if edges.count() <= driver_max_edges:
        return _pagerank_driver(edges, damping, iters, personalize)
    # node universe + out-degrees
    srcs = edges.map_batches(
        lambda b: pa.table({"node": b.column("src")}),
        batch_format="pyarrow")
    dsts = edges.map_batches(
        lambda b: pa.table({"node": b.column("dst")}),
        batch_format="pyarrow")
    nodes = srcs.union(dsts).groupby("node").count().drop_columns(
        ["count()"]).materialize()
    n = nodes.count()
    outdeg = (edges.groupby("src")
              .aggregate(Count(alias_name="outdeg"))).materialize()

    # attach 1/outdeg to each edge once (it never changes)
    edged = edges.repartition(num_partitions).join(
        outdeg.repartition(num_partitions), join_type="inner",
        num_partitions=num_partitions, on=("src",)).materialize()

    seed_set = (frozenset(str(x) for x in personalize)
                if personalize is not None else None)
    if seed_set is not None:
        s = sum(r["c"] for r in nodes.map_batches(
            lambda b: pa.table({"c": pa.array(
                [sum(1 for v in b.column("node").to_pylist()
                     if v in seed_set)], pa.int64())}),
            batch_format="pyarrow").take_all())
        if s == 0:
            raise ValueError("personalize: no seed appears in the "
                             "graph's node universe")

    def init_rank(b: pa.Table) -> pa.Table:
        ns = b.column("node").to_pylist()
        if seed_set is None:
            vals = [1.0 / n] * len(ns)
        else:
            vals = [1.0 / s if v in seed_set else 0.0 for v in ns]
        return pa.table({"node": b.column("node"),
                         "rank": pa.array(vals, pa.float64())})

    base = (1.0 - damping) / n
    ranks = nodes.map_batches(init_rank,
                              batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = edged.repartition(num_partitions).join(
            ranks.repartition(num_partitions), join_type="inner",
            num_partitions=num_partitions, on=("src",),
            right_on=("node",))
        contrib = contrib.map_batches(
            lambda b: pa.table({
                "dst": b.column("dst"),
                "c": pa.array(
                    [r / d for r, d in
                     zip(b.column("rank").to_pylist(),
                         b.column("outdeg").to_pylist())],
                    pa.float64())}),
            batch_format="pyarrow")
        summed = contrib.groupby("dst").aggregate(
            Sum("c", alias_name="in_mass"))
        if symmetric:
            # a symmetrized edge set gives every node inbound mass —
            # skip the per-iteration left join against the universe
            joined = summed.map_batches(
                lambda b: pa.table({"node": b.column("dst"),
                                    "in_mass": b.column("in_mass")}),
                batch_format="pyarrow")
        else:
            # nodes with no inbound mass keep only the base term:
            # LEFT join the node universe against the summed mass
            joined = nodes.repartition(num_partitions).join(
                summed.repartition(num_partitions),
                join_type="left_outer",
                num_partitions=num_partitions, on=("node",),
                right_on=("dst",))
        def upd(b: pa.Table, base=base, d=damping) -> pa.Table:
            ms = b.column("in_mass").to_pylist()
            if seed_set is None:
                vals = [base + d * (m if m is not None else 0.0)
                        for m in ms]
            else:
                vals = [((1.0 - d) / s if v in seed_set else 0.0)
                        + d * (m if m is not None else 0.0)
                        for v, m in zip(b.column("node").to_pylist(),
                                        ms)]
            return pa.table({"node": b.column("node"),
                             "rank": pa.array(vals, pa.float64())})

        ranks = joined.map_batches(
            upd, batch_format="pyarrow").materialize()
    return ranks


def _pagerank_driver(edges, damping: float, iters: int,
                     personalize: list | None = None):
    """Small-graph plan: the identical recurrence (uniform init, base
    = (1-d)/n, no dangling redistribution, fixed ``iters``) as numpy
    ``bincount`` passes over integer-factorized edges.  float64
    summation order differs from the distributed ``Sum`` by ≤ 1e-12 —
    invisible at the oracles' 6-digit rounding; the plan-equivalence
    test compares at 9 digits."""
    import numpy as np
    import ray
    import ray.data as rd

    src_l, dst_l = [], []
    for t in ray.get(edges.to_arrow_refs()):
        src_l.extend(t.column("src").cast(pa.string()).to_pylist())
        dst_l.extend(t.column("dst").cast(pa.string()).to_pylist())
    if not src_l:
        return rd.from_arrow(pa.table(
            {"node": pa.array([], pa.string()),
             "rank": pa.array([], pa.float64())}))
    nodes, codes = np.unique(np.array(src_l + dst_l, dtype=object),
                             return_inverse=True)
    m = len(src_l)
    src = codes[:m]
    dst = codes[m:]
    n = len(nodes)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    if personalize is not None:
        seeds = np.isin(nodes, np.array(
            sorted({str(x) for x in personalize}), dtype=object))
        s = int(seeds.sum())
        if s == 0:
            raise ValueError("personalize: no seed appears in the "
                             "graph's node universe")
        restart = np.where(seeds, (1.0 - damping) / s, 0.0)
        ranks = np.where(seeds, 1.0 / s, 0.0)
    else:
        restart = np.full(n, (1.0 - damping) / n)
        ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = ranks[src] / outdeg[src]
        ranks = restart + damping * np.bincount(dst, weights=contrib,
                                                minlength=n)
    return rd.from_arrow(pa.table(
        {"node": pa.array(list(nodes), pa.string()),
         "rank": pa.array(ranks, pa.float64())}))


def triangle_stats(edges, src_col: str = "src", dst_col: str = "dst",
                   round_digits: int = 6):
    """Corpus-level triangle census over an UNDIRECTED simple graph:
    one row ``(n_nodes, n_edges, n_triangles, n_wedges,
    global_clustering)`` with ``global_clustering = 3·triangles /
    wedges`` (rounded half-away).

    Shape: direction + self-loops are normalized away and edges
    dedup'd to canonical ``a < b`` (string order — the same total
    order a degree-ordered node-iterator uses); triangles close via
    TWO hash joins (``(a,b) ⋈ (b,c)`` → wedge, wedge ⋈ ``(a,c)``),
    so work ∝ wedge count.  On a hub-heavy graph the wedge join is
    the known quadratic-in-degree hot spot — at 10^12-file scale
    pre-splitting hub nodes (or degree-ordering by actual degree
    instead of the string surrogate) bounds it; the synthetic xref
    graph is near-regular, so the simple plan is the honest one.
    Wedges count from per-node canonical degrees (one groupby)."""
    import numpy as np
    import polars as pl
    from ray.data.aggregate import Count

    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    def canon(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        a = pl.min_horizontal(pl.col(src_col).cast(pl.String),
                              pl.col(dst_col).cast(pl.String))
        c = pl.max_horizontal(pl.col(src_col).cast(pl.String),
                              pl.col(dst_col).cast(pl.String))
        return (df.select(a.alias("a"), c.alias("b"))
                .filter(pl.col("a") != pl.col("b"))
                .unique().to_arrow())

    from ferenda_ray.stages.bgp import distinct
    e = distinct(edges.map_batches(canon, batch_format="pyarrow"),
                 ["a", "b"]).materialize()

    def both_ends(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return pl.concat([df.select(pl.col("a").alias("node")),
                          df.select(pl.col("b").alias("node"))]) \
            .to_arrow()

    n_edges = e.count()
    deg = (e.map_batches(both_ends, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg"))
           .materialize())
    n_nodes = deg.count()
    wedge_rows = deg.map_batches(
        lambda b: pa.table({"__w": pa.array([int(
            (lambda d: (d * (d - 1) // 2).sum())(
                np.asarray(b.column("deg"))))], pa.int64())}),
        batch_format="pyarrow").take_all()
    n_wedges = int(sum(r["__w"] for r in wedge_rows))

    np_ = join_partitions()
    co = coalesce_partitions()
    left = e.map_batches(
        lambda b: pa.table({"a": b.column("a"), "m": b.column("b")}),
        batch_format="pyarrow")
    right = e.map_batches(
        lambda b: pa.table({"m": b.column("a"), "c": b.column("b")}),
        batch_format="pyarrow")
    if not ray_join_handles_empty_blocks():
        left, right = left.repartition(co), right.repartition(co)
    wedges = left.join(right, join_type="inner", on=("m",),
                       num_partitions=np_)   # a<m<c by construction

    # single string key for the closing join (composite keys hit
    # Ray 2.49's multi-column join finalize — see xref_degrees)
    def key_ac(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.select((pl.col("a") + "\x1f" + pl.col("c"))
                         .alias("__ac")).to_arrow()

    wk = wedges.map_batches(key_ac, batch_format="pyarrow")
    ck = e.map_batches(
        lambda b: pl.from_arrow(b).select(
            (pl.col("a") + "\x1f" + pl.col("b")).alias("__ac"))
        .to_arrow(), batch_format="pyarrow")
    if not ray_join_handles_empty_blocks():
        wk, ck = wk.repartition(co), ck.repartition(co)
    tri = wk.join(ck, join_type="inner", on=("__ac",),
                  num_partitions=np_)
    n_tri = tri.count()

    cc = (3.0 * n_tri / n_wedges) if n_wedges else 0.0
    p = 10.0 ** round_digits
    cc = float(np.floor(abs(cc) * p + 0.5) / p)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "global_clustering": pa.array([cc], pa.float64())}))
