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
        hs = [(int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[8:16], "little")
            & 0x7FFFFFFFFFFFFFFF) for i in ids]
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
