"""Deduplication family over a document table.

Beyond-the-reference operators required for a training-data pipeline at
100 TB (the reference has no near-dedup — SURVEY.md §2.8 "near-dedup:
not present"; its closest analogue is exact ``(basefile, link)`` dedup
``documentrepository.py:913,932-933`` and fuzzy ``lookup_resource``):

* :func:`exact_dedup` — content-hash groupby, keep min id.  Two-phase:
  hash in ``map_batches``, per-batch pre-dedup, one vectorized
  ``groupby(hash)`` aggregate.
* :func:`minhash_lsh_pairs` / :func:`minhash_clusters` — shingle →
  128-perm MinHash → banded LSH buckets → ``groupby(band, key)`` →
  candidate pairs → signature-estimated Jaccard filter → union-find
  clusters.  The scale path: only band buckets shuffle; signatures are
  numpy-vectorized per batch.
* :func:`simhash_pairs` — 64-bit SimHash, 4×16-bit band blocking, exact
  Hamming verify.
* :func:`jaccard_pairs` — exact all-pairs word-set Jaccard with the
  small side broadcast (oracle-checkable baseline; the LSH path is the
  100 TB route).
* :func:`embedding_neardup_pairs` — exact cosine near-dup over an
  embedding column via broadcast matrix + per-batch matmul.

Determinism: all hash seeds fixed; MinHash permutations derive from a
seeded ``numpy.random.Generator`` built in ``__init__`` (actor) or at
module import — never from wall clock (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ferenda_ray.stages.broadcast import resolve, stateful_map

# byte-wise popcount lookup table (numpy 1.x has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

_MERSENNE = (1 << 61) - 1


# ---------------------------------------------------------------------------
# exact dedup

def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_sha256") -> pa.Table:
    h = [hashlib.sha256(t.encode("utf-8")).hexdigest()
         for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(h, pa.string()))


def exact_dedup(docs, text_col: str = "text", id_col: str = "doc_id"):
    """One representative (min id) per distinct content + dup count.
    Returns Dataset ``(content_sha256, doc_id, n_dups)``."""
    from ray.data.aggregate import Count, Min

    def prep(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, text_col)
        return b.select([id_col, "content_sha256"])

    hashed = docs.map_batches(prep, batch_format="pyarrow",
                              batch_size=16384)
    return (hashed.groupby("content_sha256")
            .aggregate(Min(id_col, alias_name=id_col),
                       Count(alias_name="n_dups")))


def distinct_docs(docs, text_col: str = "text", id_col: str = "doc_id",
                  broadcast: bool = False,
                  num_partitions: int | None = None):
    """Keep only the representative rows (the ``groupby(key).first``
    pattern of SURVEY.md §2.8).

    Default plan is a distributed semi-join (``Dataset.join`` on the
    id) — the keep set is ~N ids for a mostly-unique corpus, so it
    must NOT be collected to the driver.  ``broadcast=True`` opts into
    the collected-ids filter for high-dup-rate inputs where the keep
    set is known small (ships once via ``ray.put``)."""
    keep = exact_dedup(docs, text_col, id_col)
    if broadcast:
        keep_ids = pa.array(sorted(r[id_col] for r in keep.take_all()))

        class Filter:
            def __init__(self, ref):
                self.ids = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                return b.filter(pc.is_in(b.column(id_col),
                                         value_set=self.ids))

        return stateful_map(docs, Filter, keep_ids)
    from ferenda_ray.cluster import join_partitions
    num_partitions = num_partitions or join_partitions()
    keep_ids = keep.map_batches(
        lambda b: b.select([id_col]).rename_columns(["__keep_id"]),
        batch_format="pyarrow")
    # coalesce both sides: Ray 2.49 join breaks on empty blocks
    joined = docs.repartition(num_partitions).join(
        keep_ids.repartition(num_partitions), join_type="inner",
        num_partitions=num_partitions, on=(id_col,),
        right_on=("__keep_id",))
    # Ray keeps or drops the right key depending on version — strip
    # it defensively
    return joined.map_batches(
        lambda b: b.drop_columns(["__keep_id"])
        if "__keep_id" in b.column_names else b,
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH

class MinHasher:
    """Vectorized 128-perm MinHash over word n-gram shingles.

    Stateful setup (permutation coefficients) happens once per actor —
    the load-once pattern of SURVEY.md §2.4."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 5,
                 seed: int = 42, text_col: str = "text",
                 id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.split()
        n = self.shingle_n
        if len(toks) < n:
            grams = [" ".join(toks)] if toks else [""]
        else:
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
        return np.unique(np.fromiter(
            (zlib.crc32(g.encode()) for g in grams),
            dtype=np.int64, count=len(grams)))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        # (perm, shingle) permuted hashes → min per perm
        ph = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return ph.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        sigs = [self.signature(t)
                for t in batch.column(self.text_col).to_pylist()]
        return pa.table({
            self.id_col: pa.array(ids),
            "minhash": pa.array([s.tolist() for s in sigs],
                                pa.list_(pa.int64())),
        })


def minhash_signatures(docs, num_perm=128, shingle_n=5, seed=42,
                       text_col="text", id_col="doc_id",
                       concurrency=None):
    """Hasher state is seed-derived and tiny, so the default plan is a
    task closure (full-width, zero ramp); pass ``concurrency`` for an
    actor pool."""
    kw = dict(num_perm=num_perm, shingle_n=shingle_n, seed=seed,
              text_col=text_col, id_col=id_col)
    # modest batch size: the signature loop is the compute-heavy part,
    # so more/smaller tasks parallelize it across the cluster
    if concurrency is None:
        return docs.map_batches(MinHasher(**kw), batch_format="pyarrow",
                                batch_size=512)
    return docs.map_batches(
        MinHasher, fn_constructor_kwargs=kw,
        batch_format="pyarrow", batch_size=512, concurrency=concurrency)


def _bands(sig: list, bands: int, rows: int) -> list:
    out = []
    for b in range(bands):
        chunk = tuple(sig[b * rows:(b + 1) * rows])
        out.append(zlib.crc32(repr(chunk).encode()))
    return out


def minhash_lsh_pairs(docs, threshold: float = 0.8, num_perm: int = 128,
                      bands: int = 16, shingle_n: int = 5, seed: int = 42,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_bucket: int = 512):
    """Candidate generation via banded LSH + signature-estimated Jaccard
    ≥ ``threshold``.  Returns Dataset ``(id_a, id_b, est_jaccard)``
    with ``id_a < id_b``.

    Shuffle key = (band_id, band_hash): only bucket collisions
    co-locate; no all-pairs anywhere (the map_batches → explode →
    groupby shape of the MinHash-LSH recipe)."""
    rows = num_perm // bands
    # materialize the signature table ONCE: three consumers read it
    # (band explode, sig_a join side, sig_b join side) and Ray re-runs
    # a shared lazy subtree per consumer — 3× the MinHash compute.
    # The sig table is ~1 KB/doc (128×int64 + id), a deliberate small
    # intermediate, not a full-corpus materialization.
    sigs = minhash_signatures(docs, num_perm, shingle_n, seed,
                              text_col, id_col).materialize()

    # Shuffle ONLY (id, band, bhash) through the band exchange — NOT the
    # 128×int64 signature (which would be copied into every band row =
    # ``bands``× shuffle amplification).  Signatures re-join to the
    # candidate-pair set afterwards: two hash-joins of the sig table vs
    # a 16× fatter band shuffle.
    def explode(b: pa.Table) -> pa.Table:
        ids, bnd, bh = [], [], []
        for i, sig in zip(b.column(id_col).to_pylist(),
                          b.column("minhash").to_pylist()):
            for bi, h in enumerate(_bands(sig, bands, rows)):
                ids.append(i)
                bnd.append(bi)
                bh.append(h)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "band": pa.array(bnd, pa.int32()),
            "bhash": pa.array(bh, pa.int64()),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def band_pairs(group: pa.Table) -> pa.Table:
        # one call per BAND (16 total), segmenting the band's buckets
        # with numpy — a per-(band,bhash) ``map_groups`` costs one
        # Python call per bucket (~70k at sf0.1; profiled 8.3 s of
        # remote wall time, the pipeline's hottest op).  Pair emission
        # keeps the hot-bucket cap (round-2 verdict): buckets over
        # ``max_bucket`` members emit a min-id hub STAR (O(b) pairs)
        # — every member stays connected to the cluster through the
        # hub, the invariant near-dup *dedup* needs; all-pairs only
        # under the cap (always true on the oracle corpus, so the
        # checked pair set is unchanged).
        ids = group.column(id_col).to_numpy()
        bh = group.column("bhash").to_numpy()
        order = np.lexsort((ids, bh))
        ids, bh = ids[order], bh[order]
        bounds = np.flatnonzero(np.diff(bh)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(bh)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            seg = ids[s:e]
            if n <= max_bucket:
                xs, ys = np.triu_indices(n, k=1)
                out_a.append(seg[xs])
                out_b.append(seg[ys])
            else:
                out_a.append(np.full(n - 1, seg[0], dtype=seg.dtype))
                out_b.append(seg[1:])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64())})

    cand = (exploded.groupby("band")
            .map_groups(band_pairs, batch_format="pyarrow"))
    # a pair can surface from several bands → dedup via a VECTORIZED
    # hash aggregate (a per-group ``map_groups`` lambda is one Python
    # call per pair — 100k+ candidates made it the pipeline bottleneck),
    # then re-attach the two signatures and estimate Jaccard
    from ray.data.aggregate import Count as _Count
    cand = (cand.groupby(["id_a", "id_b"])
            .aggregate(_Count(alias_name="__nb"))
            .drop_columns(["__nb"]))
    # coalesce: map_groups output carries empty blocks that hang/break
    # Ray 2.49's hash-shuffle join (same workaround as
    # canonicalize.label_propagation); repartition alone redistributes
    # rows into non-empty blocks
    from ferenda_ray.cluster import coalesce_partitions, join_partitions
    co = coalesce_partitions()
    np_join = join_partitions()
    cand = cand.repartition(co)

    # pack each 128×int64 signature into one binary value — arrow's
    # hash join can't carry list payload columns, and the pack is
    # vectorized (one flatten + per-row memoryview slice)
    def _sig_packed(idname: str, signame: str):
        def pack(b: pa.Table) -> pa.Table:
            arr = b.column("minhash").combine_chunks()
            n = len(arr)
            flat = pc.list_flatten(arr).to_numpy().astype("<i8")
            buf = pa.py_buffer(flat.tobytes())
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(num_perm * 8), n, [None, buf])
            return pa.table({idname: b.column(id_col), signame: fsb})
        return pack

    sig_a = sigs.map_batches(_sig_packed("id_a", "sig_a"),
                             batch_format="pyarrow").repartition(co)
    sig_b = sigs.map_batches(_sig_packed("id_b", "sig_b"),
                             batch_format="pyarrow").repartition(co)
    joined = cand.join(sig_a, join_type="inner", on=("id_a",),
                       num_partitions=np_join)
    joined = joined.repartition(co)
    joined = joined.join(sig_b, join_type="inner", on=("id_b",),
                         num_partitions=np_join)

    def _unpack(col: pa.ChunkedArray, n: int) -> np.ndarray:
        raw = b"".join(m.as_py() for m in col.combine_chunks())
        return np.frombuffer(raw, dtype="<i8").reshape(n, num_perm)

    def estimate(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        A = _unpack(b.column("sig_a"), b.num_rows)
        B = _unpack(b.column("sig_b"), b.num_rows)
        est = (A == B).mean(axis=1)
        keep = est >= threshold
        mask = pa.array(keep)
        return pa.table({
            "id_a": b.column("id_a").filter(mask),
            "id_b": b.column("id_b").filter(mask),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
        })

    return joined.map_batches(estimate, batch_format="pyarrow")


def minhash_clusters(docs, threshold: float = 0.8, **kw) -> dict:
    """Near-dup clusters: union-find over the LSH pair set (pair set is
    ≪ corpus size; for larger, feed pairs to
    :func:`~ferenda_ray.stages.canonicalize.label_propagation`).
    Returns {doc_id: representative_id} (non-identity entries)."""
    from ferenda_ray.state.unionfind import UnionFind
    pairs = minhash_lsh_pairs(docs, threshold, **kw).take_all()
    uf = UnionFind()
    for p in pairs:
        uf.union(p["id_a"], p["id_b"])
    return uf.canonical_map()


# ---------------------------------------------------------------------------
# SimHash

class SimHasher:
    """64-bit SimHash over word hashes (vectorized bit counting).

    ``token_hash="md5"`` uses the lower 64 digest bits little-endian —
    bit-identical to DuckDB's ``md5_number_lower`` — making the whole
    SimHash (and the ≤max_hamming pair set, whose band blocking has
    exact recall) SQL-oracle-checkable.  Default stays crc-based (3×
    faster) for the scale path."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 token_hash: str = "crc"):
        self.text_col = text_col
        self.id_col = id_col
        if token_hash == "crc":
            self._th = lambda t: ((zlib.crc32(t.encode()) << 32)
                                  | zlib.crc32(t[::-1].encode()))
        elif token_hash == "md5":
            import hashlib
            self._th = lambda t: int.from_bytes(
                hashlib.md5(t.encode()).digest()[8:16], "little")
        else:
            raise ValueError("token_hash must be crc or md5")

    def simhash64(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter((self._th(t) for t in toks),
                         dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
        vote = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out = np.uint64(0)
        for i in np.nonzero(vote > 0)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        sh = [self.simhash64(t)
              for t in batch.column(self.text_col).to_pylist()]
        return pa.table({self.id_col: ids,
                         "simhash": pa.array(sh, pa.uint64())})


def simhash_pairs(docs, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", token_hash: str = "crc",
                  max_bucket: int = 512):
    """Near-dup pairs with Hamming distance ≤ ``max_hamming`` via
    band blocking, then exact verify.  The band count is DERIVED from
    ``max_hamming`` (bands = max_hamming + 1): by pigeonhole, a pair
    within distance ≤ max_hamming must agree exactly on at least one
    band — so recall is 1.0 for any ``max_hamming`` ≤ 63, not just the
    4-band default's ≤3."""
    bands = max_hamming + 1
    if bands > 64:
        raise ValueError("max_hamming must be <= 63 for 64-bit SimHash")
    width = 64 // bands
    # band bi covers bits [bi*width, (bi+1)*width) — last band takes
    # the remainder bits too
    def _band_key(h: int, bi: int) -> int:
        lo = bi * width
        hi = 64 if bi == bands - 1 else lo + width
        return (h >> lo) & ((1 << (hi - lo)) - 1)

    sh = docs.map_batches(SimHasher(text_col=text_col, id_col=id_col,
                                    token_hash=token_hash),
                          batch_format="pyarrow", batch_size=512)

    def explode(b: pa.Table) -> pa.Table:
        ids, band, key, full = [], [], [], []
        for i, h in zip(b.column(id_col).to_pylist(),
                        b.column("simhash").to_pylist()):
            for bi in range(bands):
                ids.append(i)
                band.append(bi)
                key.append(_band_key(h, bi))
                full.append(h)
        return pa.table({id_col: pa.array(ids),
                         "band": pa.array(band, pa.int32()),
                         "key": pa.array(key, pa.int64()),
                         "simhash": pa.array(full, pa.uint64())})

    def band_pairs(group: pa.Table) -> pa.Table:
        # one call per BAND with numpy bucket segmentation (the
        # per-(band,key) map_groups shape costs one Python call per
        # bucket — see minhash_lsh_pairs.band_pairs); vectorized
        # hamming verify (uint8-view popcount LUT) with the hot-bucket
        # cap: over ``max_bucket`` members, only min-id hub pairs are
        # tested (O(b) instead of O(b²)) — hub links keep every true
        # ≤max_hamming member connected for dedup clustering;
        # all-pairs (exact recall) below the cap.
        ids = group.column(id_col).to_numpy()
        keys = group.column("key").to_numpy()
        hs = group.column("simhash").to_numpy().astype(np.uint64)
        order = np.lexsort((ids, keys))
        ids, keys, hs = ids[order], keys[order], hs[order]
        bounds = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(keys)]))
        xs_all, ys_all = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n <= max_bucket:
                xs, ys = np.triu_indices(n, k=1)
            else:
                xs = np.zeros(n - 1, dtype=np.int64)
                ys = np.arange(1, n, dtype=np.int64)
            xs_all.append(xs + s)
            ys_all.append(ys + s)
        if not xs_all:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        xs = np.concatenate(xs_all)
        ys = np.concatenate(ys_all)
        x = hs[xs] ^ hs[ys]
        d = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1,
                                                       dtype=np.int64)
        keep = (d <= max_hamming) & (ids[xs] != ids[ys])
        return pa.table({"id_a": pa.array(ids[xs][keep], pa.int64()),
                         "id_b": pa.array(ids[ys][keep], pa.int64()),
                         "hamming": pa.array(d[keep], pa.int64())})

    from ray.data.aggregate import Min as _Min
    pairs = (sh.map_batches(explode, batch_format="pyarrow")
             .groupby("band")
             .map_groups(band_pairs, batch_format="pyarrow"))
    # cross-band dedup: vectorized aggregate (hamming identical in
    # every band, Min is a no-op choice), not per-pair map_groups
    return (pairs.groupby(["id_a", "id_b"])
            .aggregate(_Min("hamming", alias_name="hamming")))


# ---------------------------------------------------------------------------
# exact word-set Jaccard (broadcast baseline — the oracle-checkable path)

def jaccard_pairs(docs, threshold: float = 0.5, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Exact pairwise word-set Jaccard ≥ threshold, id_a < id_b —
    distributed prefix-filter plan (the AllPairs/PPJoin recipe,
    Bayardo et al. WWW'07 / Xiao et al. WWW'08), replacing the round-2
    broadcast-everything baseline that collected the whole word-set
    table to the driver:

    1. explode (id, token) + one groupby → global document frequency;
    2. per doc, order tokens rarest-first (df, token) and keep only
       the PREFIX of length ``|W| - ceil(t·|W|) + 1`` — two sets with
       J ≥ t must share a prefix token (if all shared tokens sat
       outside A's prefix, |A∩B| ≤ ceil(t|A|)-1 < t|A| ≤ t|A∪B|);
    3. groupby prefix token → vectorized pair emission (np.triu),
       rarest-first order keeps posting lists short under Zipf;
    4. dedup pairs, re-join each side's word-set key (a single sorted
       string — arrow joins can't carry list columns), exact verify.

    Every step is a ``map_batches``/``groupby``/``join`` — nothing
    corpus-sized ever rides the driver."""
    from ferenda_ray.cluster import coalesce_partitions, join_partitions
    from ray.data.aggregate import Count
    import math
    co = coalesce_partitions()
    np_join = join_partitions()

    def to_sets(b: pa.Table) -> pa.Table:
        wkeys = [" ".join(sorted(set(t.split())))
                 for t in b.column(text_col).to_pylist()]
        return pa.table({id_col: b.column(id_col),
                         "wkey": pa.array(wkeys, pa.string())})

    sets_ds = docs.map_batches(to_sets, batch_format="pyarrow",
                               batch_size=4096).materialize()

    def explode_toks(b: pa.Table) -> pa.Table:
        out = (pl.from_arrow(b)
               .with_columns(pl.col("wkey").str.split(" ").alias("tok"))
               .explode("tok")
               .filter(pl.col("tok").str.len_bytes() > 0)
               .select([id_col, "tok"]))
        return out.to_arrow().cast(pa.schema(
            [(id_col, pa.int64()), ("tok", pa.string())]))

    exploded = sets_ds.map_batches(explode_toks, batch_format="pyarrow")
    df = exploded.groupby("tok").aggregate(Count(alias_name="df"))
    with_df = exploded.repartition(co).join(
        df.repartition(co), join_type="inner", num_partitions=np_join,
        on=("tok",))

    def prefix_of(group: pa.Table) -> pa.Table:
        toks = group.column("tok").to_pylist()
        dfs = group.column("df").to_pylist()
        w = len(toks)
        k = w - math.ceil(threshold * w) + 1
        order = sorted(range(w), key=lambda i: (dfs[i], toks[i]))[:k]
        gid = group.column(id_col)[0].as_py()
        return pa.table({id_col: pa.array([gid] * len(order), pa.int64()),
                         "tok": pa.array([toks[i] for i in order],
                                         pa.string())})

    prefixes = with_df.groupby(id_col).map_groups(
        prefix_of, batch_format="pyarrow")

    def posting_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group.column(id_col).to_numpy())
        n = len(ids)
        if n < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        xs, ys = np.triu_indices(n, k=1)
        return pa.table({"id_a": pa.array(ids[xs], pa.int64()),
                         "id_b": pa.array(ids[ys], pa.int64())})

    cand = (prefixes.groupby("tok").map_groups(
        posting_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="__nb"))
        .drop_columns(["__nb"])
        .repartition(co))

    wa = sets_ds.map_batches(
        lambda b: pa.table({"id_a": b.column(id_col),
                            "wkey_a": b.column("wkey")}),
        batch_format="pyarrow").repartition(co)
    wb = sets_ds.map_batches(
        lambda b: pa.table({"id_b": b.column(id_col),
                            "wkey_b": b.column("wkey")}),
        batch_format="pyarrow").repartition(co)
    j = cand.join(wa, join_type="inner", on=("id_a",),
                  num_partitions=np_join).repartition(co)
    j = j.join(wb, join_type="inner", on=("id_b",),
               num_partitions=np_join)

    def verify(b: pa.Table) -> pa.Table:
        a_out, b_out, j_out = [], [], []
        for i, jj, ka, kb in zip(b.column("id_a").to_pylist(),
                                 b.column("id_b").to_pylist(),
                                 b.column("wkey_a").to_pylist(),
                                 b.column("wkey_b").to_pylist()):
            A, B = set(ka.split()), set(kb.split())
            inter = len(A & B)
            if not inter:
                continue
            jac = inter / (len(A) + len(B) - inter)
            if jac >= threshold:
                lo, hi = (i, jj) if i < jj else (jj, i)
                a_out.append(lo)
                b_out.append(hi)
                j_out.append(jac)
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    return j.map_batches(verify, batch_format="pyarrow")


def jaccard_pairs_broadcast(docs, threshold: float = 0.5,
                            text_col: str = "text",
                            id_col: str = "doc_id"):
    """Exact pairwise word-set Jaccard ≥ threshold, id_a < id_b.

    O(N²) BASELINE, kept as the cross-check for :func:`jaccard_pairs`:
    the full word-set table is broadcast once via ``ray.put`` and each
    batch computes its pairs against it — valid only while that table
    fits in worker memory."""
    def to_sets(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "words": pa.array([sorted(set(t.split()))
                               for t in b.column(text_col).to_pylist()],
                              pa.list_(pa.string())),
        })

    sets_ds = docs.map_batches(to_sets, batch_format="pyarrow")
    all_sets = sets_ds.take_all()  # small side, collected once
    side = {r[id_col]: frozenset(r["words"]) for r in all_sets}

    class PairFinder:
        def __init__(self, ref):
            self.side = resolve(ref)
            self.order = sorted(self.side)

        def __call__(self, b: pa.Table) -> pa.Table:
            a_out, b_out, j_out = [], [], []
            for i, words in zip(b.column(id_col).to_pylist(),
                                b.column("words").to_pylist()):
                ws = frozenset(words)
                for j in self.order:
                    if j <= i:
                        continue
                    other = self.side[j]
                    inter = len(ws & other)
                    if not inter:
                        continue
                    jac = inter / len(ws | other)
                    if jac >= threshold:
                        a_out.append(i)
                        b_out.append(j)
                        j_out.append(jac)
            return pa.table({"id_a": pa.array(a_out, pa.int64()),
                             "id_b": pa.array(b_out, pa.int64()),
                             "jaccard": pa.array(j_out, pa.float64())})

    return stateful_map(sets_ds, PairFinder, side, batch_size=1024)


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def embedding_neardup_pairs(embeddings, threshold: float = 0.95,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id", dtype=np.float64):
    # dtype float64 by default: this path is oracle-checked against
    # DuckDB's float64 cosine; float32 can flip threshold-boundary rows
    # (ADVICE r1).  Pass float32 explicitly for the approximate regime.
    """Pairs with cosine similarity ≥ threshold (id_a < id_b): the full
    (normalized) matrix is broadcast; each batch does one matmul
    against it.  O(N·B) flops per batch, zero shuffle — right for the
    'embedding table fits in memory' regime; bucket by coarse LSH
    before this at larger N (see similarity.py)."""
    mat_rows = embeddings.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in mat_rows])
    order = np.argsort(ids)
    ids = ids[order]
    M = np.array([mat_rows[i][vec_col] for i in order], dtype=dtype)
    M /= (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)

    class Finder:
        def __init__(self, ref):
            self.ids, self.M, self.dtype = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from ferenda_ray.stages.similarity import _col_matrix
            bids = b.column(id_col).to_numpy(zero_copy_only=False)
            # non-inplace divide: _col_matrix may return a read-only
            # zero-copy view of the Arrow buffer
            V = _col_matrix(b, vec_col, self.dtype)
            V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
            S = V @ self.M.T
            a_out, b_out, c_out = [], [], []
            for r in range(S.shape[0]):
                hits = np.nonzero(S[r] >= threshold)[0]
                for h in hits:
                    if self.ids[h] > bids[r]:
                        a_out.append(int(bids[r]))
                        b_out.append(int(self.ids[h]))
                        c_out.append(float(S[r, h]))
            return pa.table({"id_a": pa.array(a_out, pa.int64()),
                             "id_b": pa.array(b_out, pa.int64()),
                             "cosine": pa.array(c_out, pa.float64())})

    return stateful_map(embeddings, Finder, (ids, M, dtype),
                        batch_size=2048)
