"""Mergeable Bloom filter — broadcast semi-join primitive.

When the filtering keyset is too big to broadcast exactly but a
distributed join is overkill (e.g. pre-filtering a fact table before
the real join), a Bloom filter gives a fixed-size, no-false-negative
broadcast: build per-batch partial bitmaps inside ``map_batches``,
OR-merge them (reduce bounded by batch count), ``ray.put`` once, and
apply a vectorized membership mask per batch.  Classic Bloom (1970)
with double hashing (Kirsch–Mitzenmacher) over the two md5 halves.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

__all__ = ["BloomFilter", "bloom_from_dataset", "bloom_filter_stage"]


class BloomFilter:
    def __init__(self, n_bits: int, k: int):
        assert n_bits > 0 and k > 0
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros((n_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def sized(cls, capacity: int, fpr: float = 0.01) -> "BloomFilter":
        """Size for ``capacity`` keys at the target false-positive
        rate: m = -n·ln(p)/ln(2)², k = (m/n)·ln 2."""
        capacity = max(capacity, 1)
        m = int(math.ceil(-capacity * math.log(fpr) / (math.log(2) ** 2)))
        k = max(1, round(m / capacity * math.log(2)))
        return cls(m, k)

    def _positions(self, values) -> np.ndarray:
        """(len(values), k) bit positions via double hashing."""
        h1 = np.empty(len(values), dtype=np.uint64)
        h2 = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            d = hashlib.md5(str(v).encode("utf-8")).digest()
            h1[i] = int.from_bytes(d[:8], "little")
            h2[i] = int.from_bytes(d[8:], "little") | 1  # odd step
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) \
            % np.uint64(self.n_bits)

    def add_many(self, values) -> "BloomFilter":
        if len(values):
            pos = self._positions(values).ravel()
            np.bitwise_or.at(self.bits, pos >> np.uint64(6),
                             np.uint64(1) << (pos & np.uint64(63)))
        return self

    def contains_many(self, values) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def dumps(self) -> bytes:
        head = np.array([self.n_bits, self.k], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def loads(cls, blob: bytes) -> "BloomFilter":
        n_bits, k = np.frombuffer(blob[:16], dtype=np.int64)
        f = cls(int(n_bits), int(k))
        f.bits = np.frombuffer(blob[16:], dtype=np.uint64).copy()
        return f


def bloom_from_dataset(ds, col: str, capacity: int,
                       fpr: float = 0.01) -> BloomFilter:
    """Build a filter over ``ds[col]`` with per-batch partials merged
    driver-side (reduce input = batch count)."""
    proto = BloomFilter.sized(capacity, fpr)

    def partial(b: pa.Table) -> pa.Table:
        f = BloomFilter(proto.n_bits, proto.k)
        f.add_many(b.column(col).to_pylist())
        return pa.table({"sketch": pa.array([f.dumps()],
                                            pa.large_binary())})

    acc = BloomFilter(proto.n_bits, proto.k)
    for r in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).take_all():
        acc.merge(BloomFilter.loads(r["sketch"]))
    return acc


def bloom_filter_stage(ds, col: str, bloom: BloomFilter):
    """Keep only rows whose ``col`` MAY be in the filter (broadcast
    once via ``ray.put``; no false negatives — follow with an exact
    join when exactness matters)."""
    import ray

    from ferenda_ray.stages.broadcast import resolve
    ref = ray.put(bloom.dumps())

    class Filter:
        def __init__(self, blob):
            self.bloom = BloomFilter.loads(resolve(blob))

        def __call__(self, b: pa.Table) -> pa.Table:
            mask = self.bloom.contains_many(b.column(col).to_pylist())
            return b.filter(pa.array(mask))

    return ds.map_batches(Filter, fn_constructor_kwargs={"blob": ref},
                          batch_format="pyarrow", batch_size=65536,
                          concurrency=(1, 4))
