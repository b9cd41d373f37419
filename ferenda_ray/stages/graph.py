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


def pagerank(edges, damping: float = 0.85, iters: int = 10,
             num_partitions: int | None = None, symmetric: bool = False):
    """PageRank over a directed edge Dataset ``(src, dst)``.

    Returns a Dataset ``(node, rank)`` over all nodes appearing as a
    src or dst.  Nodes without outlinks contribute their damped mass
    nowhere (classic "dangling" simplification is NOT applied — feed a
    symmetrized edge set for random-walk semantics).
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ferenda_ray.cluster import coalesce_partitions
    num_partitions = num_partitions or coalesce_partitions()
    edges = edges.materialize()
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
