"""Stage 3 — canonicalization: sameAs merge + exact triple dedup.

Replaces the reference's ``relate`` triple-store pass (clear context →
insert per-doc graphs → dump, ``ferenda/documentrepository.py:1731-1883``)
with dataset-native semantics:

1. ``owl:sameAs`` cluster merge — union-find over the (small) edge set,
   broadcast the {variant → canonical} mapping, rewrite ``subj`` and
   URI-typed ``obj_value`` through it inside ``map_batches``.  The
   driver-side union-find is the documented small-side path (entity
   count ≪ triple count; the alias dictionary is the analogue of
   ferenda's ``commondata``, always tiny).  :func:`label_propagation`
   is the scale path: iterative min-label propagation expressed as
   Dataset joins/groupbys — O(diameter) rounds, no driver state.

2. Exact triple dedup — two-phase (SURVEY.md §7.3): vectorized
   per-batch ``unique`` (polars) cuts shuffle volume, then one
   hash-shuffled ``groupby(key_cols).aggregate(Min(lineage))`` —
   all-vectorized, no per-group Python.  Deterministic lineage: the
   minimum ``(src_repo, src_path)`` wins.  The analogue of faceted-row
   dedup (``documentrepository.py:2269-2280``) and re-relate
   idempotence (``:1770-1776``).

Null discipline: Ray/Arrow groupby keys must not be null, so
``obj_lang`` / ``obj_datatype`` travel as ``""`` through the shuffle
and are restored to null on the way out.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ferenda_ray import ns
from ferenda_ray.cluster import join_partitions
from ferenda_ray.schema import TRIPLES
from ferenda_ray.state.unionfind import canonical_map_from_edges

KEY7 = ["subj", "pred", "obj_type", "obj_value", "obj_lang", "obj_datatype",
        "graph"]


# --------------------------------------------------------------------------
# sameAs merge

def mapping_from_sameas(edges) -> dict:
    """edges: pyarrow Table / list of dicts with ``subj``/``obj`` columns
    → {variant: canonical}.  Driver-side; edge set assumed small."""
    if isinstance(edges, pa.Table):
        pairs = zip(edges.column("subj").to_pylist(),
                    edges.column("obj").to_pylist())
    else:
        pairs = [(e["subj"], e["obj"]) for e in edges]
    return canonical_map_from_edges(pairs)


class _Rewriter:
    """map_batches callable: rewrite URIs through a broadcast mapping."""

    def __init__(self, mapping):
        import ray
        if isinstance(mapping, ray.ObjectRef):
            mapping = ray.get(mapping)
        self.mapping = mapping

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.mapping:
            return batch
        df = pl.from_arrow(batch)
        df = df.with_columns(
            pl.col("subj").replace(self.mapping),
            pl.when(pl.col("obj_type") == "uri")
              .then(pl.col("obj_value").replace(self.mapping))
              .otherwise(pl.col("obj_value"))
              .alias("obj_value"),
        )
        # owl:sameAs self-loops created by the rewrite vanish
        df = df.filter(~((pl.col("pred") == ns.OWL_SAMEAS)
                         & (pl.col("subj") == pl.col("obj_value"))))
        return df.to_arrow().cast(TRIPLES)


def rewrite(triples, mapping: dict, broadcast: bool | None = None):
    """Rewrite subj/obj URIs through {variant → canonical}.

    Small mappings (the union-find path: entity count ≪ triple count)
    ride inside the pickled task closure — cached once per worker
    process, no actor pool and no per-batch reshipping.  Large mappings
    (``broadcast=True`` or >100k entries) go through ``ray.put`` + an
    actor pool that fetches the ref once in ``__init__``.
    """
    import ray
    if not mapping:
        return triples
    if broadcast is None:
        broadcast = len(mapping) > 100_000
    if broadcast:
        ref = ray.put(mapping)
        return triples.map_batches(
            _Rewriter, fn_constructor_kwargs={"mapping": ref},
            batch_format="pyarrow", concurrency=(1, 8))
    # batch_size deliberately unset: an explicit large batch_size on a
    # stage that fuses with upstream maps makes Ray bundle that many
    # input ROWS into every fused task (e.g. 65536 ⇒ only 7 tasks for
    # a 400k-doc corpus — parallelism collapse); per-block batches are
    # already tens of thousands of rows here
    rewriter = _Rewriter(mapping)
    return triples.map_batches(rewriter, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact dedup (two-phase)

_SENTINEL_COLS = ["obj_lang", "obj_datatype"]


def _prededup(batch: pa.Table) -> pa.Table:
    df = pl.from_arrow(batch)
    df = df.with_columns([pl.col(c).fill_null("") for c in _SENTINEL_COLS])
    df = (df.sort(KEY7 + ["src_repo", "src_path"])
            .unique(subset=KEY7, keep="first", maintain_order=True))
    return df.to_arrow()


def prededup_batch(batch: pa.Table) -> pa.Table:
    """Null-preserving per-batch combiner (polars treats nulls as equal
    in ``unique``): local exact-dedup keeping min lineage.  Used ahead
    of the fused bucket-shuffle dedup in ``materialize(dedup=True)``,
    where no Ray groupby ever sees the keys so no sentinel is needed."""
    df = pl.from_arrow(batch)
    df = (df.sort(KEY7 + ["src_repo", "src_path"])
            .unique(subset=KEY7, keep="first", maintain_order=True))
    return df.to_arrow().cast(batch.schema)


def _restore(batch: pa.Table) -> pa.Table:
    cols = {}
    for name in TRIPLES.names:
        src = name
        if name in ("src_repo", "src_path"):
            for cand in (f"min({name})", name):
                if cand in batch.column_names:
                    src = cand
                    break
        arr = batch.column(src)
        if name in _SENTINEL_COLS:
            arr = pc.if_else(pc.equal(arr, ""), pa.nulls(len(batch),
                                                         pa.string()), arr)
        cols[name] = arr.cast(TRIPLES.field(name).type)
    return pa.table(cols, schema=TRIPLES)


def dedup_exact(triples):
    """Global exact dedup on the 7-part triple key, keeping the minimum
    lineage pair.  Phase 1: per-batch vectorized unique (combiner);
    phase 2: one hash-shuffle groupby-aggregate."""
    from ray.data.aggregate import Min
    pre = triples.map_batches(_prededup, batch_format="pyarrow")
    agg = pre.groupby(KEY7).aggregate(Min("src_repo"), Min("src_path"))
    return agg.map_batches(_restore, batch_format="pyarrow",
                           batch_size=65536)


# --------------------------------------------------------------------------
# scale path: distributed connected components (min-label propagation)

def label_propagation(edges, max_iter: int = 20, dtype=None):
    """Connected components over an edge Dataset with columns
    ``subj``/``obj`` → Dataset ``(member, canonical)``.

    Iterative min-label propagation: each round every node adopts the
    minimum label among itself and its neighbors (undirected).  Runs
    O(cluster diameter) rounds, each one ``groupby(node).min(label)``
    plus a join — all shuffles, no driver-side state.  Use when the
    sameAs edge set is too large to collect (the union-find path
    assumes it fits on the driver).

    ``dtype`` is the Arrow node-id type (default ``pa.string()`` for
    URI edges; pass ``pa.int64()`` for integer doc-id graphs — the
    whole algorithm is min/join/groupby, so any ordered key works).

    RAY VERSION DEPENDENCY: the per-iteration ``_coalesce``
    (count + repartition + materialize) exists solely to work around
    Ray 2.49's hash-shuffle join failing on inputs with empty blocks
    ("No match for key field reference…").  It costs one extra pass
    over the label table per round; when the upstream join handles
    empty blocks, delete ``_coalesce`` and chain the joins lazily."""
    import ray.data as rd
    from ray.data.aggregate import Min

    # undirected edge list (both directions)
    def both_dirs(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([b.column("subj").combine_chunks(),
                                      b.column("obj").combine_chunks()]),
            "nbr": pa.concat_arrays([b.column("obj").combine_chunks(),
                                     b.column("subj").combine_chunks()]),
        })

    _LBL = pa.schema([("node", dtype or pa.string()),
                      ("label", dtype or pa.string())])

    def _scrub(b: pa.Table, label_col: str = "label") -> pa.Table:
        # Ray's hash-shuffle join can emit column-less empty blocks for
        # empty partitions; normalize every block to the (node, label)
        # schema so later shuffles never see a schema-less block.
        if b.num_rows == 0 or "node" not in b.column_names:
            return _LBL.empty_table()
        return pa.table({"node": b.column("node"),
                         "label": b.column(label_col)}, schema=_LBL)

    def _coalesce(ds):
        # Ray 2.49's hash-shuffle join breaks when an input contains
        # empty blocks ("No match for key field reference ... on right
        # side"); coalesce to a block count safely below the row count
        # so no block is empty.  Costs a count()+materialize() pass per
        # round, O(diameter) times — skipped entirely once the Ray
        # version gate reports the join fixed.
        from ferenda_ray.cluster import ray_join_handles_empty_blocks
        if ray_join_handles_empty_blocks():
            return ds
        n = ds.count()
        return ds.repartition(max(1, min(16, (n or 1) // 64 + 1))).materialize()

    und = _coalesce(edges.map_batches(both_dirs, batch_format="pyarrow"))
    # initial label = own uri
    labels = (und.groupby("node").aggregate(Min("nbr"))
              .map_batches(lambda b: pa.table(
                  {"node": b.column("node"),
                   "label": pc.min_element_wise(b.column("node"),
                                                b.column("min(nbr)"))},
                  schema=_LBL) if b.num_rows else _LBL.empty_table(),
                  batch_format="pyarrow"))
    labels = _coalesce(labels)
    for _ in range(max_iter):
        # message passing: neighbor labels (right side renamed to avoid
        # key-name collision in the join output)
        right = labels.map_batches(
            lambda b: pa.table({"lnode": b.column("node"),
                                "label": b.column("label")}),
            batch_format="pyarrow")
        msgs = und.join(right, join_type="inner",
                        num_partitions=join_partitions(),
                        on=("nbr",), right_on=("lnode",))
        msgs = msgs.map_batches(_scrub, batch_format="pyarrow")
        new_labels = (msgs.union(labels)
                      .groupby("node").aggregate(Min("label"))
                      .map_batches(
                          lambda b: _scrub(b, "min(label)"),
                          batch_format="pyarrow"))
        new_labels = _coalesce(new_labels)
        # convergence check: order-independent fingerprint of the label
        # assignment (sum of 64-bit row hashes) — cheaper than a join and
        # immune to Ray's empty-partition schema loss in join finalize
        if _labels_fingerprint(new_labels) == _labels_fingerprint(labels):
            labels = new_labels
            break
        labels = new_labels
    return labels


def _labels_fingerprint(labels) -> int:
    def h(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        v = (df.select((pl.col("node").cast(pl.Utf8) + "\x00"
                        + pl.col("label").cast(pl.Utf8))
                       .hash(seed=7).alias("h"))["h"]
             .cast(pl.Int64, wrap_numerical=True).sum())
        return pa.table({"h": pa.array([v or 0], pa.int64())})

    out = labels.map_batches(h, batch_format="pyarrow").sum("h")
    return out or 0
