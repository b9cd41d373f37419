"""Deterministic corpus sampling.

The reference copies N basefiles per repo into a test corpus
(``devel.samplerepo``/``samplerepos``, ``ferenda/devel.py:1232-1426``).
At pipeline scale the equivalent is a content-stable hash filter — no
RNG, no state, reproducible across runs and cluster sizes (SURVEY.md
§2.7 "deterministic hash-sampling, no RNG in workflows"): keep a row
iff ``md5(str(id))`` falls in the chosen residue class.  md5 is used
(not Python ``hash``) so any engine — including the DuckDB oracle —
computes the identical sample.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def md5_bucket(value) -> int:
    """First hex nibble of md5(str(value)) → 0..15."""
    return int(hashlib.md5(str(value).encode()).hexdigest()[0], 16)


def hash_sample(ds, id_col: str, keep_buckets: tuple = (0,),
                num_buckets: int = 16):
    """Keep rows whose ``md5(str(id))`` first nibble (scaled to
    ``num_buckets``) is in ``keep_buckets`` — an exact,
    engine-portable ``fraction ≈ len(keep)/num_buckets`` sample."""
    if num_buckets > 16:
        raise ValueError("num_buckets > 16 needs more nibbles; keep ≤ 16")
    keep = set(keep_buckets)

    def flt(b: pa.Table) -> pa.Table:
        mask = pa.array(
            [md5_bucket(v) * num_buckets // 16 in keep
             for v in b.column(id_col).to_pylist()])
        return b.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow")


def limit_per_group(ds, group_col: str, n: int, sort_col: str,
                    descending: bool = False):
    """First ``n`` rows per group by ``sort_col`` — the per-repo "N
    basefiles each" shape of ``samplerepos`` (grouped top-k)."""
    def head(g: pa.Table) -> pa.Table:
        g = g.sort_by([(sort_col, "descending" if descending
                        else "ascending")])
        return g.slice(0, n)

    return ds.groupby(group_col).map_groups(head, batch_format="pyarrow")


def stratified_sample(docs, group_col: str = "lang", k: int = 10,
                      id_col: str = "doc_id"):
    """Deterministic k-per-group sample: the k rows with the smallest
    md5 of the id (DuckDB ``md5_number_lower``-compatible, masked to
    int63) win per group — a seedless, engine-reproducible stratified
    draw.  Per-batch partial top-k combiner bounds every group's
    shuffle input to k·batches rows; the final per-group head is a
    tiny ``map_groups``."""
    import hashlib

    import numpy as np
    import polars as pl
    import pyarrow as pa

    def hkey(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        hs = _md5_int63(ids)
        t = b.append_column("__h", pa.array(hs, pa.int64()))
        # partial top-k per group inside the batch
        df = (pl.from_arrow(t).sort(["__h", id_col])
              .group_by(group_col, maintain_order=True).head(k)
              .select(t.schema.names))   # group_by reorders columns
        return df.to_arrow().cast(t.schema)

    def final(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group).sort(["__h", id_col]).head(k)
        return df.drop("__h").to_arrow()

    return (docs.map_batches(hkey, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final, batch_format="pyarrow"))


def md5_u64(data) -> int:
    """Little-endian bytes 8:16 of the md5 digest as an unsigned
    64-bit int — the ONE engine-wide DuckDB ``md5_number_lower``
    parity base.  Every hash-ordered / hash-bucketed operator derives
    its key from this (masked to int63 or reduced mod n at the call
    site) so a parity change lands in exactly one place."""
    if isinstance(data, str):
        data = data.encode()
    return int.from_bytes(hashlib.md5(data).digest()[8:16], "little")


def _md5_int63(values) -> list[int]:
    """``md5_number_lower``-compatible int63 per value (masked
    positive) — keeps hash-ordered operators oracle-checkable."""
    return [md5_u64(str(v)) & 0x7FFFFFFFFFFFFFFF for v in values]


def token_budget_sample(docs, budget: int, group_col: str = "lang",
                        id_col: str = "doc_id", text_col: str = "text",
                        hash_parts: int = 64):
    """Per-group TOKEN-BUDGET head: order each group's docs by
    ``md5(id)`` (a seedless deterministic shuffle) and keep docs while
    the group's running whitespace-token total stays ≤ ``budget`` —
    the "sample N tokens per language" step of training-data mixing.
    Returns ``(id, group, n_tokens, cum_tokens)`` for kept docs.

    Distributed prefix sum, no global sort: the md5 keyspace is cut
    into ``hash_parts`` ranges; per-(group, range) token sums — one
    tiny row each — prefix-sum on the driver, and a grouped second
    pass adds the broadcast base offset to an in-partition cumsum
    (same shape as ``text_analysis.pack_sequence_offsets``)."""
    import numpy as np
    import polars as pl

    from ray.data.aggregate import Sum as _Sum

    shift = 63 - max(1, hash_parts - 1).bit_length()

    def keyed(b: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: b.column(id_col),
            group_col: b.column(group_col),
            "n_tokens": pl.from_arrow(b.select([text_col]))[text_col]
                .str.count_matches(r"\S+").cast(pl.Int64).to_arrow(),
            "__h": pa.array(_md5_int63(b.column(id_col).to_pylist()),
                            pa.int64())})
        part = pc.shift_right(t.column("__h"), shift)
        gp = pc.binary_join_element_wise(
            t.column(group_col), pc.cast(part, pa.string()), "\x00")
        return t.append_column("__gp", gp)

    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow")
    psums = (keyed_ds.groupby("__gp")
             .aggregate(_Sum("n_tokens", alias_name="__s")).take_all())
    # driver-side prefix sum over (group, part) — rows = groups ×
    # hash_parts, independent of corpus size
    by_group: dict = {}
    for r in psums:
        g, p = r["__gp"].rsplit("\x00", 1)
        by_group.setdefault(g, []).append((int(p), r["__s"]))
    base = {}
    for g, parts in by_group.items():
        acc = 0
        for p, s in sorted(parts):
            base[f"{g}\x00{p}"] = acc
            acc += s

    # BUDGET PRUNING: a partition whose base offset already exceeds
    # the budget cannot contribute a kept row (its first cum ≥ base),
    # so the second shuffle moves only the ~budget-token prefix of
    # each group, not the corpus — the admissible key set is bounded
    # by groups × hash_parts and rides the task closure
    admissible = pa.array(
        [k for k, v in base.items() if v <= budget], pa.string())

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("__gp"),
                                 value_set=admissible))

    def scan(group: pa.Table) -> pa.Table:
        h = group.column("__h").to_numpy()
        ids = group.column(id_col).to_numpy()
        n = group.column("n_tokens").to_numpy()
        order = np.lexsort((ids, h))
        ids, n = ids[order], n[order]
        cum = base[group.column("__gp")[0].as_py()] + np.cumsum(n)
        keep = cum <= budget
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            group_col: pa.array(
                [group.column(group_col)[0].as_py()] * int(keep.sum()),
                pa.string()),
            "n_tokens": pa.array(n[keep], pa.int64()),
            "cum_tokens": pa.array(cum[keep], pa.int64())})

    return (keyed_ds.map_batches(prune, batch_format="pyarrow")
            .groupby("__gp")
            .map_groups(scan, batch_format="pyarrow"))


def weighted_mix(docs, weights: dict, key_col: str = "source",
                 id_col: str = "doc_id", salt: str = "mix",
                 default_weight: float = 1.0):
    """Deterministic source-weighted subsample (the domain-mixing
    step): keep a row iff ``md5(f"{id}:{salt}") % 1e6`` falls under
    its source's weight × 1e6 — seedless, reproducible across runs
    and cluster sizes, and exactly restatable in SQL.  ``weights``
    maps ``key_col`` values to keep fractions in [0, 1]."""
    thresholds = {k: int(round(w * 1_000_000))
                  for k, w in weights.items()}
    dflt = int(round(default_weight * 1_000_000))

    def flt(b: pa.Table) -> pa.Table:
        hs = _md5_int63(f"{i}:{salt}"
                        for i in b.column(id_col).to_pylist())
        keys = b.column(key_col).to_pylist()
        mask = pa.array([h % 1_000_000 < thresholds.get(k, dflt)
                         for h, k in zip(hs, keys)])
        return b.filter(mask)

    return docs.map_batches(flt, batch_format="pyarrow")


def epoch_shards(docs, n_epochs: int = 2, n_shards: int = 8,
                 id_col: str = "doc_id"):
    """Deterministic epoch-wise shard assignment for multi-epoch
    training: every (epoch, doc) gets ``shard = md5(f"{epoch}:{id}")
    % n_shards`` — a seedless reshuffle per epoch that is stable
    across runs and cluster sizes (workers can open exactly their
    shard's docs; no RNG state to synchronize).  Returns one row per
    (doc × epoch): ``(id, epoch, shard)``."""
    def assign(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        out_id, out_e, out_s = [], [], []
        for e in range(n_epochs):
            hs = _md5_int63(f"{e}:{i}" for i in ids)
            out_id.extend(ids)
            out_e.extend([e] * len(ids))
            out_s.extend(h % n_shards for h in hs)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "epoch": pa.array(out_e, pa.int64()),
                         "shard": pa.array(out_s, pa.int64())})

    return docs.map_batches(assign, batch_format="pyarrow")


def train_val_test_split(docs, id_col: str = "doc_id",
                         fractions=(0.8, 0.1, 0.1),
                         salt: str = "split"):
    """Deterministic train/val/test assignment: the md5 fraction of
    the id (salted) buckets each row into ``train``/``val``/``test``
    with the given proportions — stable across runs, cluster sizes
    and row order, and exactly restatable in SQL.  Returns
    ``(id, split)``."""
    t_hi = int(round(fractions[0] * 1_000_000))
    v_hi = t_hi + int(round(fractions[1] * 1_000_000))

    def assign(b: pa.Table) -> pa.Table:
        hs = _md5_int63(f"{i}:{salt}"
                        for i in b.column(id_col).to_pylist())
        lab = [("train" if h % 1_000_000 < t_hi else
                "val" if h % 1_000_000 < v_hi else "test")
               for h in hs]
        return pa.table({id_col: b.column(id_col),
                         "split": pa.array(lab, pa.string())})

    return docs.map_batches(assign, batch_format="pyarrow")


def weighted_reservoir_sample(docs, k: int, weight_col: str,
                              id_col: str = "doc_id",
                              salt: str = "ares"):
    """Exact-k WEIGHTED sample without replacement — Efraimidis &
    Spirakis A-Res with the engine's seedless uniform: each row's key
    is ``u^(1/w)`` for ``u = md5(f"{id}:{salt}") / 2^64`` and weight
    ``w = row[weight_col]``; the global top-k keys win.  Deterministic
    across runs and cluster sizes, and exactly restatable in SQL
    (``pow(md5_number_lower(...) / 2^64, 1.0 / w)``).

    Distributed shape: a per-batch partial top-k bounds the exchange
    to k rows per batch; the final exact top-k sorts only that
    reduced set.  Ties (never in practice — u is id-unique) break on
    the id so both engines agree.  Rows with weight ≤ 0 never win."""
    import numpy as np
    import polars as pl

    def key_and_trim(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        u = np.array([md5_u64(f"{i}:{salt}") for i in ids],
                     np.float64) / 2.0 ** 64
        w = b.column(weight_col).to_numpy().astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(w > 0, u ** (1.0 / np.maximum(w, 1e-300)),
                           -1.0)
        t = b.append_column("__key", pa.array(key, pa.float64()))
        df = (pl.from_arrow(t)
              .filter(pl.col("__key") >= 0)       # weight ≤ 0 is out
              .sort(["__key", id_col], descending=[True, False])
              .head(k))
        return df.to_arrow().cast(t.schema)

    trimmed = docs.map_batches(key_and_trim, batch_format="pyarrow")
    out = trimmed.sort(["__key", id_col],
                       descending=[True, False]).limit(k)
    return out.map_batches(lambda b: b.drop_columns(["__key"]),
                           batch_format="pyarrow")
