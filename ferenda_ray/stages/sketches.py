"""Mergeable sketches for 100-TB-scale aggregation.

Exact count-distinct and exact quantiles need a full shuffle of the
keyed data; at corpus scale the right primitive is a MERGEABLE SKETCH
computed per batch and folded in a tiny reduce.  Two classics
(both from the published literature):

- :class:`HyperLogLog` (Flajolet et al. 2007): count-distinct in
  ``2^p`` bytes with ~1.04/sqrt(2^p) relative error.
- :class:`QuantileDigest`: a fixed-size mergeable summary in the
  Greenwald–Khanna / t-digest family — keeps ``k`` weighted centroids
  by merging sorted neighbors, giving bounded-rank-error quantiles.

Both follow the engine's combiner discipline: ``map_batches`` emits
one serialized partial per batch, a single small reduce merges them —
the reduce input is bounded by BATCH COUNT, not corpus size (the same
shape the reference's API ``stats`` endpoint computes per-repo then
merges, ``ferenda/wsgiapp.py:289-296``).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

__all__ = ["HyperLogLog", "QuantileDigest", "SpaceSaving", "CountMin",
           "hll_count_distinct", "sketch_quantiles",
           "heavy_hitter_tokens", "cm_token_counts"]


class HyperLogLog:
    """Dense HLL with the standard bias-corrected estimator and
    linear-counting switch for small cardinalities."""

    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values) -> np.ndarray:
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            h = hashlib.md5(str(v).encode("utf-8")).digest()
            out[i] = int.from_bytes(h[:8], "little")
        return out

    def add_many(self, values):
        if not len(values):
            return self
        hs = self._hash64(values)
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hs << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(hs), dtype=np.uint8)
        cur = rest.copy()
        for r in range(1, 64 - self.p + 2):
            top = (cur >> np.uint64(63)) & np.uint64(1)
            undecided = ranks == 0
            ranks[undecided & (top == 1)] = r
            cur = cur << np.uint64(1)
            if not undecided.any():
                break
        np.maximum.at(self.registers, idx, ranks)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -self.registers.astype(
            np.float64)).sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)  # linear counting
        return float(est)

    def dumps(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def loads(cls, blob: bytes) -> "HyperLogLog":
        h = cls(blob[0])
        h.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return h


class QuantileDigest:
    """Fixed-size weighted-centroid quantile summary: ingest sorts and
    collapses to ≤ ``k`` (value, weight) centroids by merging nearest
    neighbors; query interpolates on cumulative weight midpoints."""

    def __init__(self, k: int = 256, values=None, weights=None):
        self.k = k
        self.values = np.asarray(values if values is not None else [],
                                 dtype=np.float64)
        self.weights = np.asarray(weights if weights is not None else [],
                                  dtype=np.float64)

    def _compress(self):
        if len(self.values) <= self.k:
            return
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        # even-rank bucketing: split the cumulative weight into k
        # equal spans and merge each span to its weighted mean
        cum = np.cumsum(w)
        total = cum[-1]
        edges = np.searchsorted(cum - 1e-12, total * np.arange(
            1, self.k + 1) / self.k)
        out_v, out_w = [], []
        start = 0
        for e in edges:
            end = min(int(e) + 1, len(v))
            if end <= start:
                continue
            ws = w[start:end]
            out_v.append(float(np.average(v[start:end], weights=ws)))
            out_w.append(float(ws.sum()))
            start = end
        self.values = np.array(out_v)
        self.weights = np.array(out_w)

    def add_many(self, xs):
        xs = np.asarray(xs, dtype=np.float64)
        xs = xs[~np.isnan(xs)]
        if not len(xs):
            return self
        self.values = np.concatenate([self.values, xs])
        self.weights = np.concatenate([self.weights,
                                       np.ones(len(xs))])
        self._compress()
        return self

    def merge(self, other: "QuantileDigest") -> "QuantileDigest":
        self.values = np.concatenate([self.values, other.values])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        if not len(self.values):
            return float("nan")
        order = np.argsort(self.values, kind="stable")
        v, w = self.values[order], self.weights[order]
        cum = np.cumsum(w) - w / 2.0  # centroid midpoints
        target = q * w.sum()
        return float(np.interp(target, cum, v))

    def dumps(self) -> bytes:
        return (np.array([self.k], dtype=np.float64).tobytes()
                + self.values.tobytes() + self.weights.tobytes())

    @classmethod
    def loads(cls, blob: bytes) -> "QuantileDigest":
        arr = np.frombuffer(blob, dtype=np.float64)
        k = int(arr[0])
        n = (len(arr) - 1) // 2
        return cls(k, arr[1:1 + n].copy(), arr[1 + n:].copy())


# ---------------------------------------------------------------------------
# Dataset operators (partial per batch → one tiny reduce)

def hll_count_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one HLL partial per batch,
    merged driver-side (reduce input = batch count, not rows)."""
    def partial(b: pa.Table) -> pa.Table:
        h = HyperLogLog(p).add_many(b.column(col).to_pylist())
        return pa.table({"sketch": pa.array([h.dumps()],
                                            pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).take_all()
    acc = HyperLogLog(p)
    for r in parts:
        acc.merge(HyperLogLog.loads(r["sketch"]))
    return acc.estimate()


def sketch_quantiles(ds, col: str, qs=(0.5, 0.95), k: int = 256,
                     group_col: str | None = None):
    """Approximate quantiles; with ``group_col``, per-group digests
    combine inside ``map_batches`` then merge per group in a small
    groupby (the scale path behind the exact
    ``events_value_percentiles``)."""
    def partial(b: pa.Table) -> pa.Table:
        import collections
        groups = collections.defaultdict(QuantileDigest)
        if group_col is None:
            groups[""] = QuantileDigest(k).add_many(
                b.column(col).to_numpy(zero_copy_only=False))
        else:
            keys = b.column(group_col).to_pylist()
            vals = b.column(col).to_numpy(zero_copy_only=False)
            import numpy as _np
            keys_arr = _np.array(keys)
            for g in set(keys):
                groups[g] = QuantileDigest(k).add_many(
                    vals[keys_arr == g])
        return pa.table({
            "group": pa.array(list(groups), pa.string()),
            "sketch": pa.array([d.dumps() for d in groups.values()],
                               pa.large_binary()),
        })

    def finalize(g: pa.Table) -> pa.Table:
        acc = QuantileDigest(k)
        for blob in g.column("sketch").to_pylist():
            acc.merge(QuantileDigest.loads(blob))
        out = {"group": [g.column("group")[0].as_py()]}
        for q in qs:
            out["p%g" % (q * 100)] = [acc.quantile(q)]
        return pa.table(out)

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("group")
            .map_groups(finalize, batch_format="pyarrow"))


class SpaceSaving:
    """Space-Saving heavy hitters (Metwally et al. 2005): ``capacity``
    counters; an unmonitored item evicts the current minimum and
    inherits its count as overestimation error.  Guarantees: every
    item with true count > N/capacity is monitored, and
    ``count - error <= true <= count`` per monitored item.

    Mergeable (Agarwal et al. 2012 MERGEABLE SUMMARIES): combine
    counter maps (missing entries take the other sketch's min as
    count AND error), keep the top ``capacity`` — the bounds add."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.counts: dict = {}
        self.errors: dict = {}
        self.n = 0

    def _min(self) -> int:
        return min(self.counts.values()) if len(
            self.counts) >= self.capacity else 0

    def add_many(self, items, weights=None) -> "SpaceSaving":
        if weights is None:
            import collections
            pairs = collections.Counter(items).items()
        else:
            pairs = zip(items, weights)
        for it, w in pairs:
            w = int(w)
            self.n += w
            if it in self.counts:
                self.counts[it] += w
            elif len(self.counts) < self.capacity:
                self.counts[it] = w
                self.errors[it] = 0
            else:
                mn_it = min(self.counts, key=self.counts.get)
                mn = self.counts.pop(mn_it)
                self.errors.pop(mn_it)
                self.counts[it] = mn + w
                self.errors[it] = mn
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        smin, omin = self._min(), other._min()
        keys = set(self.counts) | set(other.counts)
        counts, errors = {}, {}
        for k in keys:
            counts[k] = (self.counts.get(k, smin)
                         + other.counts.get(k, omin))
            errors[k] = (self.errors.get(k, smin)
                         + other.errors.get(k, omin))
        top = sorted(keys, key=lambda k: counts[k],
                     reverse=True)[:self.capacity]
        self.counts = {k: counts[k] for k in top}
        self.errors = {k: errors[k] for k in top}
        self.n += other.n
        return self

    def heavy_hitters(self, k: int):
        """Top-k ``(item, est_count, max_overcount)`` by estimated
        count, ties broken by item for determinism."""
        top = sorted(self.counts,
                     key=lambda it: (-self.counts[it], str(it)))[:k]
        return [(it, self.counts[it], self.errors[it]) for it in top]

    def dumps(self) -> bytes:
        import pickle
        return pickle.dumps((self.capacity, self.counts, self.errors,
                             self.n))

    @classmethod
    def loads(cls, blob: bytes) -> "SpaceSaving":
        import pickle
        cap, counts, errors, n = pickle.loads(blob)
        s = cls(cap)
        s.counts, s.errors, s.n = counts, errors, n
        return s


def heavy_hitter_tokens(ds, col: str, k: int = 20,
                        capacity: int = 256):
    """Approximate top-k whitespace tokens: one Space-Saving partial
    per batch (built from the batch's OWN token counts — one Counter
    pass), merged driver-side.  Reduce input = batch count; every
    token with true frequency > N/capacity is guaranteed present.
    The exact twin is ``pipelines.docs.docs_top_tokens``."""
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        toks = (pl.from_arrow(b).select(
            pl.col(col).str.split(" ").alias("t"))
            .explode("t")["t"].value_counts())
        s = SpaceSaving(capacity).add_many(
            toks["t"].to_list(), toks["count"].to_numpy())
        return pa.table({"sketch": pa.array([s.dumps()],
                                            pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).take_all()
    acc = SpaceSaving(capacity)
    for r in parts:
        acc.merge(SpaceSaving.loads(r["sketch"]))
    return acc.heavy_hitters(k)


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``d`` rows of
    ``w`` counters; estimate = min over rows.  Never undercounts;
    overcount ≤ 2N/w with probability ≥ 1 - (1/2)^d.  Mergeable by
    element-wise addition (identical seeds/shape)."""

    def __init__(self, width: int = 1024, depth: int = 4,
                 seed: int = 97):
        self.width = width
        self.depth = depth
        self.seed = seed
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0

    def _rows(self, items) -> np.ndarray:
        import hashlib
        out = np.empty((len(items), self.depth), dtype=np.int64)
        for i, it in enumerate(items):
            h = hashlib.blake2b(str(it).encode(),
                                digest_size=8 * self.depth,
                                key=str(self.seed).encode()).digest()
            for j in range(self.depth):
                out[i, j] = int.from_bytes(
                    h[8 * j:8 * j + 8], "little") % self.width
        return out

    def add_many(self, items, weights=None) -> "CountMin":
        if not len(items):
            return self
        idx = self._rows(list(items))
        w = (np.asarray(weights, dtype=np.int64) if weights is not None
             else np.ones(len(idx), dtype=np.int64))
        for j in range(self.depth):        # d tiny; rows vectorized
            np.add.at(self.table[j], idx[:, j], w)
        self.n += int(w.sum())
        return self

    def estimate(self, item) -> int:
        idx = self._rows([item])[0]
        return int(min(self.table[j, idx[j]]
                       for j in range(self.depth)))

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.width, self.depth, self.seed) == \
            (other.width, other.depth, other.seed)
        self.table += other.table
        self.n += other.n
        return self

    def dumps(self) -> bytes:
        import pickle
        return pickle.dumps((self.width, self.depth, self.seed,
                             self.table, self.n))

    @classmethod
    def loads(cls, blob: bytes) -> "CountMin":
        import pickle
        w, d, seed, table, n = pickle.loads(blob)
        s = cls(w, d, seed)
        s.table, s.n = table, n
        return s


def cm_token_counts(ds, col: str, items, width: int = 4096,
                    depth: int = 4):
    """Point-frequency estimates for ``items`` over whitespace tokens
    of ``col``: one Count-Min partial per batch (from the batch's own
    value_counts), merged driver-side — reduce input = batch count.
    Returns ``{item: estimated_count}`` (never under the true
    count)."""
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        vc = (pl.from_arrow(b).select(
            pl.col(col).str.split(" ").alias("t"))
            .explode("t")["t"].value_counts())
        s = CountMin(width, depth).add_many(
            vc["t"].to_list(), vc["count"].to_numpy())
        return pa.table({"sketch": pa.array([s.dumps()],
                                            pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).take_all()
    acc = CountMin(width, depth)
    for r in parts:
        acc.merge(CountMin.loads(r["sketch"]))
    return {it: acc.estimate(it) for it in items}
