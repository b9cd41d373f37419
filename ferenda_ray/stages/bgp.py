"""Composable basic-graph-pattern (BGP) queries over a triples Dataset.

The reference's query surface is SPARQL: per-repo CONSTRUCT templates
(``documentrepository.py:2636-2692`` running e.g.
``ferenda/res/sparql/annotations.rq``) and the dynamically built facet
SELECT (``documentrepository.py:2293-2383``) — arbitrary triple
patterns with OPTIONAL, UNION, FILTER and ``dcterms:isPartOf*``
property paths.  Rounds 1-2 hard-coded the two shapes the pipelines
needed; this module is the missing *composable* operator: a user hands
it a new list of patterns and gets a distributed query plan, no new
engine code.

Ray-Data-first restatement:

* each pattern ``(s, p, o)`` compiles to a vectorized ``map_batches``
  scan over the triples Dataset (constants → ``pyarrow.compute``
  equality filters; ``Var`` terms → projected binding columns);
* the BGP is a chain of distributed hash joins on the shared
  variables (``Dataset.join``), greedily ordered most-constants-first
  so the most selective scan is the build side, with every later
  pattern required to share ≥1 variable with the already-joined set
  (no silent cartesian products — ``match`` raises instead);
* ``optional`` groups are LEFT OUTER joins (SPARQL OPTIONAL);
* ``filters`` are applied in-batch right after the join that binds
  their variables — never a driver-side pass;
* ``distinct`` is one ``groupby(all binding columns)`` exchange;
* ``pred*`` property paths are :func:`path_closure` — O(path depth)
  iterative hash joins (frontier expansion), the same shape as the
  engine's label-propagation connected components;
* CONSTRUCT templates are :func:`construct` — a stateless
  ``map_batches`` emitting triple rows from each solution row.

Partitioning assumption: joins hash-partition on the shared variable
(``cluster.default_num_partitions()`` partitions).  A hot variable
value (one entity bound by millions of solutions) skews one partition;
salt the pattern upstream (split the scan by a second column) the way
``windows.salted_aggregate`` does.

Scale notes: every scan prunes to ``subj/pred/obj_value`` before the
exchange, so pattern relations carry only the binding columns; the
full 9-column triple rows never shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ferenda_ray.cluster import join_partitions


class Var(str):
    """A query variable (``?name``).  Subclass of ``str`` so binding
    columns are named by the variable itself."""
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"?{str(self)}"


def v(name: str) -> Var:
    return Var(name)


_POS_COL = (("s", "subj"), ("p", "pred"), ("o", "obj_value"))


def _pattern_vars(pat) -> list[str]:
    return [str(t) for t in pat if isinstance(t, Var)]


def scan(triples, pattern, extra_cols: dict | None = None):
    """One triple pattern → Dataset of binding columns.

    ``pattern`` is ``(s, p, o)``; each term is a :class:`Var`, a string
    constant, or ``None`` (wildcard, not projected).  Object constants
    /variables address ``obj_value`` (string form).  A Var repeated
    within the pattern (``(?x, p, ?x)``) adds an in-batch equality
    filter.  ``extra_cols`` maps output column name → triple column to
    carry through unprojected metadata (e.g. ``{"o_type":
    "obj_type"}``).
    """
    s, p, o = pattern
    consts = [(c, t) for (_, c), t in zip(_POS_COL, (s, p, o))
              if t is not None and not isinstance(t, Var)]
    out_cols: list[tuple[str, str]] = []   # (binding name, triple col)
    seen: dict[str, str] = {}
    dupes: list[tuple[str, str]] = []      # equality filter pairs
    for (_, col), term in zip(_POS_COL, (s, p, o)):
        if isinstance(term, Var):
            if str(term) in seen:
                dupes.append((seen[str(term)], col))
            else:
                seen[str(term)] = col
                out_cols.append((str(term), col))
    extra = dict(extra_cols or {})

    def do_scan(b: pa.Table) -> pa.Table:
        keep = None
        for col, val in consts:
            arr = b.column(col)
            if pa.types.is_large_string(arr.type):
                arr = arr.cast(pa.string())
            m = pc.equal(arr, pa.scalar(val))
            keep = m if keep is None else pc.and_(keep, m)
        for ca, cb in dupes:
            m = pc.equal(b.column(ca).cast(pa.string()),
                         b.column(cb).cast(pa.string()))
            keep = m if keep is None else pc.and_(keep, m)
        if keep is not None:
            b = b.filter(pc.fill_null(keep, False))
        cols = {name: b.column(col).cast(pa.string())
                for name, col in out_cols}
        for name, col in extra.items():
            cols[name] = b.column(col).cast(pa.string())
        if not cols:  # all-constant pattern: existence check
            return pa.table({"__exists": pa.array([True] * b.num_rows)})
        return pa.table(cols)

    return triples.map_batches(do_scan, batch_format="pyarrow")


def _join(left, left_vars: set, right, right_vars: list,
          how: str, num_partitions: int):
    shared = tuple(sorted(left_vars & set(right_vars)))
    if not shared:
        raise ValueError(
            "BGP pattern shares no variable with the preceding "
            "patterns (cartesian product) — reorder or bridge it")
    # Ray 2.49's hash join breaks on inputs containing empty blocks
    # ("No match for FieldRef"); a small repartition coalesces them
    npart = max(2, num_partitions // 2)
    joined = left.repartition(npart).join(
        right.repartition(npart), join_type=how,
        num_partitions=num_partitions, on=shared)
    return joined


def distinct(ds, cols: list[str] | None = None):
    """Global DISTINCT over ``cols`` (default: all columns): per-batch
    unique (combiner) then one groupby exchange.

    When ``cols`` covers every column (the usual case — a solution
    set IS its binding columns) the exchange is a VECTORIZED hash
    aggregate; a per-group ``map_groups`` callback would cost one
    Python call per distinct row.  Extra non-key columns fall back to
    keep-first ``map_groups``."""
    import polars as pl
    from ray.data.aggregate import Count

    def local(b: pa.Table) -> pa.Table:
        # polars round-trips string -> large_string; cast back so the
        # groupby exchange and any downstream join keep the input types
        return pl.from_arrow(b).unique().to_arrow().cast(b.schema)

    pre = ds.map_batches(local, batch_format="pyarrow")
    schema = pre.schema()
    if schema is None:        # row-less dataset: schema unknowable —
        return pre            # DISTINCT of nothing is nothing
    key = cols or list(schema.names)
    if set(key) == set(schema.names):
        return (pre.groupby(key).aggregate(Count(alias_name="__nb"))
                .drop_columns(["__nb"]))

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pre.groupby(key).map_groups(first, batch_format="pyarrow")


def match(triples, patterns, *, optional=(), filters=(),
          select: list[str] | None = None, dedup: bool = False,
          num_partitions: int | None = None):
    """Solve a BGP: ``patterns`` (required, joined inner) plus
    ``optional`` patterns (each LEFT OUTER joined after the required
    block — SPARQL OPTIONAL).  Returns a Dataset with one column per
    bound variable.

    ``filters``: iterable of ``(var, op, value)`` with op in
    ``{"==", "!=", "in", "not_in", "prefix", "not_contains"}`` —
    applied in-batch as soon as the variable is bound.  ``select`` projects/orders the
    output columns; ``dedup=True`` applies :func:`distinct` (SELECT
    DISTINCT).
    """
    patterns = list(patterns)
    if not patterns:
        raise ValueError("empty BGP")
    np_ = num_partitions or join_partitions()
    # greedy order: most-constant pattern first, then any pattern
    # sharing a variable with the bound set (most constants wins ties)
    def n_consts(pat):
        return sum(1 for t in pat if t is not None
                   and not isinstance(t, Var))

    remaining = sorted(patterns, key=n_consts, reverse=True)
    ordered = [remaining.pop(0)]
    bound = set(_pattern_vars(ordered[0]))
    while remaining:
        nxt = next((i for i, pat in enumerate(remaining)
                    if bound & set(_pattern_vars(pat))), None)
        if nxt is None:
            raise ValueError(
                "BGP is disconnected (cartesian product): "
                f"{remaining} share no variable with {sorted(bound)}")
        pat = remaining.pop(nxt)
        ordered.append(pat)
        bound |= set(_pattern_vars(pat))

    pending = list(filters)

    def apply_filters(rel, rel_vars: set):
        nonlocal pending
        ready = [f for f in pending if str(f[0]) in rel_vars]
        if not ready:
            return rel
        pending = [f for f in pending if str(f[0]) not in rel_vars]

        def fn(b: pa.Table) -> pa.Table:
            keep = None
            for var, op, val in ready:
                col = b.column(str(var))
                if op == "==":
                    m = pc.equal(col, pa.scalar(val))
                elif op == "!=":
                    m = pc.not_equal(col, pa.scalar(val))
                elif op == "in":
                    m = pc.is_in(col, value_set=pa.array(list(val)))
                elif op == "not_in":
                    m = pc.invert(
                        pc.is_in(col, value_set=pa.array(list(val))))
                elif op == "prefix":
                    m = pc.starts_with(col, val)
                elif op == "not_contains":
                    m = pc.invert(pc.match_substring(col, val))
                else:
                    raise ValueError(f"unknown filter op {op!r}")
                keep = m if keep is None else pc.and_(keep, m)
            return b.filter(pc.fill_null(keep, False))

        return rel.map_batches(fn, batch_format="pyarrow")

    rel = scan(triples, ordered[0])
    rel_vars = set(_pattern_vars(ordered[0]))
    rel = apply_filters(rel, rel_vars)
    for pat in ordered[1:]:
        rhs = scan(triples, pat)
        rhs_vars = _pattern_vars(pat)
        rel = _join(rel, rel_vars, rhs, rhs_vars, "inner", np_)
        rel_vars |= set(rhs_vars)
        rel = apply_filters(rel, rel_vars)
    for pat in optional:
        rhs = scan(triples, pat)
        rhs_vars = _pattern_vars(pat)
        rel = _join(rel, rel_vars, rhs, rhs_vars, "left_outer", np_)
        rel_vars |= set(rhs_vars)
        rel = apply_filters(rel, rel_vars)
    if pending:
        raise ValueError(
            f"filters reference unbound variables: {pending}")
    if select:
        cols = [str(c) for c in select]
        rel = rel.map_batches(lambda b: b.select(cols),
                              batch_format="pyarrow")
    if dedup:
        rel = distinct(rel, [str(c) for c in (select or sorted(rel_vars))])
    return rel


#: Edge-count ceiling for the driver-BFS closure plan.  2M edges of
#: two ~60-byte URIs ≈ 240 MB collected — the same order as the other
#: measured-size broadcast caps in this package (minhash_lsh_pairs'
#: 256 MB signature cap, neardup_clusters' 2M-edge union-find cap).
DRIVER_CLOSURE_MAX_EDGES = 2_000_000


def path_closure(triples, pred: str, *, anchors=None,
                 max_iters: int = 32,
                 num_partitions: int | None = None,
                 driver_max_edges: int = DRIVER_CLOSURE_MAX_EDGES):
    """Reflexive-transitive closure ``?x pred* ?anchor``.

    Returns Dataset ``(node, anchor)``: every node reachable by
    FOLLOWING ``pred`` edges UP INTO an anchor (``x pred y pred ...
    anchor``), plus the zero-length pairs ``(anchor, anchor)``.

    ``anchors``: Dataset with a single ``anchor`` column (defaults to
    every node that appears as an edge head or tail — the full
    closure).

    PLAN PICK from the MEASURED edge count (the ``minhash_lsh_pairs``
    idiom): ``pred``-edge sets are usually a tiny slice of the triple
    corpus (isPartOf section trees: a handful of edges per document),
    and every distributed round costs 2 joins + a groupby + 2
    materializations of fixed multi-second exchange overhead — a
    driver BFS over a collected edge list answers the same closure in
    milliseconds.  Under ``driver_max_edges`` (collected size ~240 MB,
    same order as this package's other broadcast caps) the closure is
    computed on the driver and returned as a Dataset; above it — the
    100-TB shape — the iterative hash-join loop runs unchanged:
    each round joins the edge set ``(child, parent)`` against the
    current frontier on ``parent``, then ANTI-JOINS the stepped
    frontier against the accumulated set: cycles converge (a
    revisited ``(node, anchor)`` adds nothing) and diamond-shaped
    DAGs stop re-expanding duplicate pairs, keeping per-round work
    O(new pairs) instead of O(paths).  ``max_iters`` only fires for
    genuinely deeper-than-bound graphs.  Both plans are asserted
    pair-identical in pytest (``tests/test_bgp.py``).
    """
    np_ = num_partitions or join_partitions()
    # one scan, reused by every round (and counted for the plan pick)
    edges = scan(triples, (Var("child"), pred, Var("parent"))) \
        .materialize()
    small = edges.count() <= driver_max_edges
    if small and anchors is not None:
        anchors = anchors.materialize()
        small = anchors.count() <= driver_max_edges
    if small:
        return _path_closure_driver(edges, anchors)
    if anchors is None:
        import ray.data as rd
        heads = edges.map_batches(
            lambda b: pa.table({"anchor": b.column("child")}),
            batch_format="pyarrow")
        tails = edges.map_batches(
            lambda b: pa.table({"anchor": b.column("parent")}),
            batch_format="pyarrow")
        anchors = distinct(heads.union(tails), ["anchor"])
    # zero-length pairs
    acc = anchors.map_batches(
        lambda b: pa.table({"node": b.column("anchor").cast(pa.string()),
                            "anchor": b.column("anchor").cast(pa.string())}),
        batch_format="pyarrow").materialize()
    frontier = acc
    for _ in range(max_iters):
        npart = max(2, np_ // 2)
        stepped = edges.repartition(npart).join(
            frontier.repartition(npart), join_type="inner",
            num_partitions=np_, on=("parent",), right_on=("node",))
        frontier = stepped.map_batches(
            lambda b: pa.table({"node": b.column("child"),
                                "anchor": b.column("anchor")}),
            batch_format="pyarrow")
        # anti-join against the accumulated closure (left-outer +
        # keep-null on a marker column): only genuinely NEW pairs
        # survive into the next round
        from ray.data.aggregate import Count as _Count
        frontier = (frontier.groupby(["node", "anchor"])
                    .aggregate(_Count(alias_name="__nb"))
                    .drop_columns(["__nb"])
                    .materialize())
        if frontier.count() == 0:
            break
        seen = acc.map_batches(
            lambda b: b.append_column(
                "__seen", pa.array([1] * b.num_rows, pa.int8())),
            batch_format="pyarrow")
        frontier = (frontier.repartition(npart).join(
            seen.repartition(npart), join_type="left_outer",
            num_partitions=np_, on=("node", "anchor"))
            .map_batches(
                lambda b: b.filter(pc.is_null(b.column("__seen")))
                .select(["node", "anchor"]),
                batch_format="pyarrow")
            .materialize())
        if frontier.count() == 0:
            break
        acc = acc.union(frontier).materialize()
    else:
        raise RuntimeError(
            f"path_closure: no fixpoint after {max_iters} rounds "
            "(cycle along pred chain?)")
    return distinct(acc, ["node", "anchor"])


def _path_closure_driver(edges, anchors):
    """Small-side closure plan: collect the (already measured ≤ cap)
    edge list, BFS down the reversed edges from each anchor on the
    driver, return the pair set as a single-block Dataset (downstream
    joins repartition it anyway).  Worst-case driver work is
    O(anchors × edges) — the same pair blowup the distributed loop
    would shuffle; real ``pred*`` chains (section trees) are O(nodes
    × depth)."""
    import ray
    import ray.data as rd

    child, parent = [], []
    for t in ray.get(edges.to_arrow_refs()):
        child.extend(t.column("child").cast(pa.string()).to_pylist())
        parent.extend(t.column("parent").cast(pa.string()).to_pylist())
    if anchors is None:
        anchor_list = sorted(set(child) | set(parent))
    else:
        vals = []
        for t in ray.get(anchors.to_arrow_refs()):
            vals.extend(t.column("anchor").cast(pa.string()).to_pylist())
        anchor_list = sorted(set(vals))

    children: dict = {}
    for c, p in zip(child, parent):
        children.setdefault(p, []).append(c)
    nodes_out, anchors_out = [], []
    for a in anchor_list:
        seen = {a}
        stack = [a]
        while stack:
            for ch in children.get(stack.pop(), ()):
                if ch not in seen:
                    seen.add(ch)
                    stack.append(ch)
        nodes_out.extend(seen)
        anchors_out.extend([a] * len(seen))
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes_out, pa.string()),
        "anchor": pa.array(anchors_out, pa.string())}))


def construct(solutions, template, num_partitions: int | None = None):
    """CONSTRUCT: map each solution row through ``template`` — a list
    of ``(s, p, o, o_type)`` where s/p/o are Vars (bound columns) or
    string constants and ``o_type`` is ``"uri"``/``"literal"`` or a
    Var naming a carried type column.  Emits a deduped Dataset
    ``(subj, pred, obj_type, obj_value)`` (a CONSTRUCT result is a
    graph, i.e. a set)."""

    def emit(b: pa.Table) -> pa.Table:
        n = b.num_rows

        def col_of(term):
            if isinstance(term, Var):
                return b.column(str(term)).cast(pa.string())
            return pa.array([term] * n, pa.string())

        parts = []
        for s, p, o, ot in template:
            t = pa.table({"subj": col_of(s), "pred": col_of(p),
                          "obj_type": col_of(ot), "obj_value": col_of(o)})
            # OPTIONAL-sourced null bindings produce no triple
            mask = pc.and_(pc.is_valid(t.column("subj")),
                           pc.and_(pc.is_valid(t.column("obj_value")),
                                   pc.is_valid(t.column("pred"))))
            parts.append(t.filter(mask))
        return pa.concat_tables(parts)

    out = solutions.map_batches(emit, batch_format="pyarrow")
    return distinct(out, ["subj", "pred", "obj_type", "obj_value"])


def union_solutions(*branches):
    """SPARQL UNION over solution relations: align binding columns
    across branches (variables a branch never binds become nulls —
    the SPARQL semantics of unbound) and concatenate the streams with
    ``Dataset.union``.  No exchange: union in Ray Data is a free
    block-stream merge; follow with :func:`distinct` for UNION's
    set semantics when duplicates matter."""
    if not branches:
        raise ValueError("union_solutions needs >= 1 branch")
    all_cols: list[str] = []
    for br in branches:
        for c in br.schema().names:
            if c not in all_cols:
                all_cols.append(c)

    def pad(missing):
        def fn(b: pa.Table) -> pa.Table:
            for c in missing:
                b = b.append_column(c, pa.nulls(b.num_rows,
                                                pa.large_string()))
            return b.select(all_cols)
        return fn

    out = None
    for br in branches:
        missing = [c for c in all_cols if c not in br.schema().names]
        aligned = br.map_batches(pad(missing), batch_format="pyarrow")
        out = aligned if out is None else out.union(aligned)
    return out
