"""Cluster-derived sizing defaults.

Every exchange (join / groupby / repartition) needs a partition count.
Hardcoding 4/8 is a single-node tuning that underparallelizes a real
cluster (round-2 verdict); deriving from ``ray.cluster_resources()``
makes the same code span one laptop and 256 nodes.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs Ray knows about; ``default`` when Ray is not up
    (pure-driver unit tests)."""
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default)) or default
    except Exception:
        pass
    return default


def default_num_partitions(scale: float = 1.0, lo: int = 2,
                           hi: int = 1024) -> int:
    """Exchange partition count ≈ cluster CPUs × scale, clamped.

    ``scale`` > 1 for skew-prone keys (more, smaller partitions),
    < 1 for small side tables (fewer aggregator actors to spin up).
    """
    n = int(cluster_cpus() * scale)
    return max(lo, min(hi, n))


def join_partitions(lo: int = 4, hi: int = 1024) -> int:
    """Partition count for ``Dataset.join`` exchanges: cpus/4.  Ray's
    hash join spins up ``num_partitions`` aggregator actors; leaving
    ~3/4 of the CPUs to the map side measured consistently faster
    single-node (q3 at 32 CPUs: np=8 → 7.6 s, np=32 → 11.1 s;
    minhash verify joins regressed 6→35 s at np=32) and still scales
    with the cluster.

    HARD CAP at cpus/2: the aggregator actors each reserve a CPU for
    the whole join, so on a tiny cluster the old ``lo=4`` floor could
    reserve EVERY core and deadlock the map side feeding the join
    (reproduced: any BGP OPTIONAL chain wedged forever at
    ``num_cpus=4``, fine at 8 — the aggregators held all 4 CPUs while
    the upstream scan had nowhere to run)."""
    cap = max(2, cluster_cpus() // 2)
    return min(cap, default_num_partitions(0.25, lo=lo, hi=hi))


def ray_join_handles_empty_blocks() -> bool:
    """Ray 2.49's hash-shuffle join raises ``No match for key field
    reference`` when either input carries empty blocks (the reason
    for every pre-join coalesce/repartition in this package).  Gate
    the workaround on the Ray version so an upgraded cluster can
    drop the extra pass; flip the ceiling once a fixed release is
    verified."""
    import ray
    parts = tuple(int(x) for x in ray.__version__.split(".")[:2])
    # every released version up to and including 2.49 is affected;
    # treat >= 2.50 as unverified-but-likely-fixed (re-check on
    # upgrade: tests/test_canonicalize.py::test_label_propagation
    # fails fast if not)
    return parts >= (2, 50)


def coalesce_partitions(hi: int = 16) -> int:
    """Partition count for the pre-join coalesce of SMALL/intermediate
    relations (candidate pairs, ref edges).  Ray 2.49's hash join
    raises on empty input blocks (see
    :func:`ray_join_handles_empty_blocks`), so these repartitions
    must stay ≤ the relation's row count; cpus/4 capped at ``hi``
    keeps blocks non-empty for test-scale inputs while still
    spreading the join probe at cluster scale."""
    return max(2, min(hi, cluster_cpus() // 4))
