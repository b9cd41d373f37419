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
             driver_max_edges: int = DRIVER_PAGERANK_MAX_EDGES):
    """PageRank over a directed edge Dataset ``(src, dst)``.

    Returns a Dataset ``(node, rank)`` over all nodes appearing as a
    src or dst.  Nodes without outlinks contribute their damped mass
    nowhere (classic "dangling" simplification is NOT applied — feed a
    symmetrized edge set for random-walk semantics).

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
        return _pagerank_driver(edges, damping, iters)
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

    base = (1.0 - damping) / n
    ranks = nodes.map_batches(
        lambda b, n=n: pa.table({"node": b.column("node"),
                                 "rank": pa.array([1.0 / n] * b.num_rows,
                                                  pa.float64())}),
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
        ranks = joined.map_batches(
            lambda b, base=base, d=damping: pa.table({
                "node": b.column("node"),
                "rank": pa.array(
                    [base + d * (m if m is not None else 0.0)
                     for m in b.column("in_mass").to_pylist()],
                    pa.float64())}),
            batch_format="pyarrow").materialize()
    return ranks


def _pagerank_driver(edges, damping: float, iters: int):
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
    base = (1.0 - damping) / n
    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = ranks[src] / outdeg[src]
        ranks = base + damping * np.bincount(dst, weights=contrib,
                                             minlength=n)
    return rd.from_arrow(pa.table(
        {"node": pa.array(list(nodes), pa.string()),
         "rank": pa.array(ranks, pa.float64())}))
