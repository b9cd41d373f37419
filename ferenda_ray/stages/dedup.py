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
* :func:`neardup_clusters` / :func:`dedup_keep_best` — pair list →
  full cluster assignment (distributed min-label propagation) → one
  kept representative per cluster (max score, ties → min id): the
  near-dedup *resolution* step that turns pair detection into a
  cleaned corpus.
* :func:`segment_dup_stats` / :func:`remove_duplicate_segments` —
  CCNet-style corpus-wide segment/line dedup (stats, drop-all
  boilerplate removal, keep-globally-first), delimiter-generic,
  measured-size plan pick between a broadcast 128-bit dup set and an
  exploded distributed join.

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


def _emit_all_pairs(seg: np.ndarray, out_a: list, out_b: list,
                    chunk: int = 1 << 22) -> None:
    """Append every i<j pair of ``seg`` to the output lists in
    bounded-memory slabs of ~``chunk`` pairs: the pair OUTPUT of a
    long posting list is inherently quadratic (10k members → 50M
    pairs), but no single intermediate allocation exceeds the slab."""
    n = len(seg)
    i0 = 0
    while i0 < n - 1:
        cnt, i1 = 0, i0
        while i1 < n - 1 and cnt < chunk:
            cnt += n - 1 - i1
            i1 += 1
        rows = np.arange(i0, i1)
        reps = (n - 1) - rows
        row_of = np.repeat(rows, reps)
        offs = np.repeat(np.cumsum(reps) - reps, reps)
        col = row_of + 1 + (np.arange(len(row_of)) - offs)
        out_a.append(seg[row_of])
        out_b.append(seg[col])
        i0 = i1


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
                      max_bucket: int = 512, emit_capped: bool = False,
                      broadcast_sig_bytes: int = 256 << 20):
    """Candidate generation via banded LSH + signature-estimated Jaccard
    ≥ ``threshold``.  Returns Dataset ``(id_a, id_b, est_jaccard)``
    with ``id_a < id_b`` (plus a ``capped`` bool column when
    ``emit_capped=True``).

    Shuffle key = (band_id, band_hash): only bucket collisions
    co-locate; no all-pairs anywhere (the map_batches → explode →
    groupby shape of the MinHash-LSH recipe).

    Two physical plans, picked by the measured signature-table size
    (the table is materialized anyway because multiple consumers read
    it — ~1 KB/doc at the 128-perm default):

    * **≤ broadcast_sig_bytes** — the packed ``(ids, num_perm-matrix)``
      is ``ray.put`` once; each band task estimates Jaccard in place
      and the plan is exactly two exchanges (band groupby + pair
      dedup).  This is the fast path for corpora up to ~10^5–10^6
      docs per job shard.
    * **larger** — only ``(id, band, bhash)`` rides the band exchange
      and the signatures re-attach to the (threshold-pruned-later)
      candidate set via two hash joins: no corpus-sized state on any
      single worker, the 100 TB route.

    Recall caveat (hot-bucket cap): a bucket over ``max_bucket``
    members emits a min-id hub STAR instead of all pairs — O(b)
    instead of O(b²) under adversarial skew.  For near-dup *dedup
    clustering* every member stays reachable through the hub, but as
    a PAIR-LISTING API recall above the cap is approximate twice
    over: (1) member–member pairs inside an over-cap bucket are only
    recovered if they collide in some under-cap band, and (2) a hub
    edge whose ``est_jaccard`` fails the threshold is dropped, which
    can also disconnect the cluster the star was meant to hold
    together.  ``emit_capped=True`` adds a ``capped`` column that is
    True iff EVERY bucket that surfaced the pair was over-cap, so a
    consumer can tell which survivors came only from truncated
    buckets."""
    rows = num_perm // bands
    # materialize the signature table ONCE: multiple consumers read it
    # (band explode + either the broadcast pack or two join sides) and
    # Ray re-runs a shared lazy subtree per consumer — 2-3× the
    # MinHash compute.  ~1 KB/doc (128×int64 + id): a deliberate small
    # intermediate, not a full-corpus materialization.
    sigs = minhash_signatures(docs, num_perm, shingle_n, seed,
                              text_col, id_col).materialize()

    # Shuffle ONLY (id, band, bhash) through the band exchange — NOT the
    # 128×int64 signature (which would be copied into every band row =
    # ``bands``× shuffle amplification).
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

    def _bucket_pairs(ids: np.ndarray, bh: np.ndarray):
        """Segment one band's buckets with numpy (one Python call per
        BAND, not per bucket — a per-(band,bhash) ``map_groups`` cost
        ~70k Python calls at sf0.1, profiled 8.3 s) and emit pair id
        arrays + per-pair over-cap flags (hub star above the cap)."""
        order = np.lexsort((ids, bh))
        ids, bh = ids[order], bh[order]
        bounds = np.flatnonzero(np.diff(bh)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(bh)]))
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            seg = ids[s:e]
            if n <= max_bucket:
                xs, ys = np.triu_indices(n, k=1)
                out_a.append(seg[xs])
                out_b.append(seg[ys])
                out_c.append(np.zeros(len(xs), dtype=np.int32))
            else:
                out_a.append(np.full(n - 1, seg[0], dtype=seg.dtype))
                out_b.append(seg[1:])
                out_c.append(np.ones(n - 1, dtype=np.int32))
        if not out_a:
            z = np.array([], dtype=np.int64)
            return z, z, np.array([], dtype=np.int32)
        return (np.concatenate(out_a), np.concatenate(out_b),
                np.concatenate(out_c))

    from ray.data.aggregate import Max as _Max, Min as _Min

    def _finalize(pairs):
        """Cross-band dedup via a VECTORIZED hash aggregate (a
        per-group ``map_groups`` lambda is one Python call per pair),
        keeping est_jaccard (identical in every band) and the
        only-from-capped-buckets flag."""
        aggs = [_Min("est_jaccard", alias_name="est_jaccard")]
        if emit_capped:
            aggs.append(_Min("__capped", alias_name="__capped"))
        out = pairs.groupby(["id_a", "id_b"]).aggregate(*aggs)
        if not emit_capped:
            return out

        def cast_flag(b: pa.Table) -> pa.Table:
            flag = pc.greater(b.column("__capped"), 0)
            return b.drop_columns(["__capped"]).append_column(
                "capped", flag)
        return out.map_batches(cast_flag, batch_format="pyarrow")

    if sigs.size_bytes() <= broadcast_sig_bytes:
        # ---- broadcast plan: estimate inside the band task ----
        import ray as _ray
        refs = sigs.to_arrow_refs()
        if refs:
            packed = pa.concat_tables([_ray.get(r) for r in refs])
            all_ids = packed.column(id_col).to_numpy()
            mat = pc.list_flatten(
                packed.column("minhash").combine_chunks()).to_numpy()
            mat = np.ascontiguousarray(mat.astype(np.int64, copy=False)
                                       .reshape(len(all_ids), num_perm))
        else:
            all_ids = np.array([], dtype=np.int64)
            mat = np.empty((0, num_perm), dtype=np.int64)
        id_order = np.argsort(all_ids)
        sig_ref = _ray.put((all_ids[id_order], mat[id_order]))

        def band_pairs_bcast(group: pa.Table) -> pa.Table:
            import ray as _r
            sid, smat = _r.get(sig_ref)  # zero-copy from object store
            ids = group.column(id_col).to_numpy()
            bh = group.column("bhash").to_numpy()
            a, b, capped = _bucket_pairs(ids, bh)
            empty = {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "est_jaccard": pa.array([], pa.float64()),
            }
            if emit_capped:
                empty["__capped"] = pa.array([], pa.int32())
            if not len(a):
                return pa.table(empty)
            est = (smat[np.searchsorted(sid, a)]
                   == smat[np.searchsorted(sid, b)]).mean(axis=1)
            keep = est >= threshold
            out = {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
            }
            if emit_capped:
                out["__capped"] = pa.array(capped[keep], pa.int32())
            return pa.table(out)

        return _finalize(exploded.groupby("band").map_groups(
            band_pairs_bcast, batch_format="pyarrow"))

    # ---- join plan: signatures re-attach to the candidate set ----
    def band_pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        bh = group.column("bhash").to_numpy()
        a, b, capped = _bucket_pairs(ids, bh)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(b, pa.int64()),
            "__capped": pa.array(capped, pa.int32()),
        })

    cand = (exploded.groupby("band")
            .map_groups(band_pairs, batch_format="pyarrow"))
    # pre-join dedup (a pair can surface from several bands)
    cand = (cand.groupby(["id_a", "id_b"])
            .aggregate(_Min("__capped", alias_name="__capped")))
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
        empty = {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
        if emit_capped:
            empty["capped"] = pa.array([], pa.bool_())
        if b.num_rows == 0:
            return pa.table(empty)
        A = _unpack(b.column("sig_a"), b.num_rows)
        B = _unpack(b.column("sig_b"), b.num_rows)
        est = (A == B).mean(axis=1)
        keep = est >= threshold
        mask = pa.array(keep)
        out = {
            "id_a": b.column("id_a").filter(mask),
            "id_b": b.column("id_b").filter(mask),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
        }
        if emit_capped:
            out["capped"] = pc.greater(
                b.column("__capped").filter(mask), 0)
        return pa.table(out)

    return joined.map_batches(estimate, batch_format="pyarrow")


def minhash_clusters(docs, threshold: float = 0.8, **kw) -> dict:
    """Near-dup clusters over the LSH pair set as a small dict —
    {doc_id: representative_id}, non-identity entries only.

    Cluster RESOLUTION is delegated to :func:`neardup_clusters` (one
    code path: driver union-find under the measured-edge-count cap,
    distributed label propagation above it); only the dict
    materialization at the end collects — bounded by the number of
    near-dup docs, never the corpus or the raw pair set.  Prefer
    :func:`neardup_clusters` directly when a Dataset result works."""
    pairs = minhash_lsh_pairs(docs, threshold, **kw)
    assigned = neardup_clusters(docs, pairs)
    non_id = assigned.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("doc_id"),
                                        b.column("cluster_id"))),
        batch_format="pyarrow")
    return {r["doc_id"]: r["cluster_id"] for r in non_id.take_all()}


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
            from ferenda_ray.stages.sample import md5_u64
            self._th = md5_u64
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
    4-band default's ≤3 — PROVIDED no touched bucket exceeds
    ``max_bucket``: over-cap buckets emit a min-id hub star only, so
    recall above the cap is approximate (see the body comment)."""
    sh = docs.map_batches(SimHasher(text_col=text_col, id_col=id_col,
                                    token_hash=token_hash),
                          batch_format="pyarrow", batch_size=512)
    return hamming_pairs64(sh, hash_col="simhash", id_col=id_col,
                           max_hamming=max_hamming,
                           max_bucket=max_bucket)


def hamming_pairs64(hashed, hash_col: str = "simhash",
                    id_col: str = "doc_id", max_hamming: int = 3,
                    max_bucket: int = 512):
    """All pairs with Hamming distance ≤ ``max_hamming`` over ANY
    64-bit hash column (SimHash text sketches, perceptual image
    hashes, …) via pigeonhole band blocking + exact verify — the
    shared kernel behind :func:`simhash_pairs` and
    :func:`~ferenda_ray.stages.multimodal.phash_pairs`.  Exact recall
    while every touched bucket stays ≤ ``max_bucket`` (over-cap
    buckets degrade to a min-id hub star)."""
    bands = max_hamming + 1
    if bands > 64:
        raise ValueError("max_hamming must be <= 63 for a 64-bit hash")
    width = 64 // bands
    # band bi covers bits [bi*width, (bi+1)*width) — last band takes
    # the remainder bits too

    def explode(b: pa.Table) -> pa.Table:
        # vectorized: per band one shift/mask over the whole batch
        # (was a per-row Python loop — N×bands appends)
        ids = b.column(id_col).to_numpy()
        hs = b.column(hash_col).to_numpy().astype(np.uint64)
        n = len(ids)
        keys = np.empty((bands, n), dtype=np.uint64)
        for bi in range(bands):
            lo = bi * width
            hi = 64 if bi == bands - 1 else lo + width
            mask = np.uint64((1 << (hi - lo)) - 1) if hi - lo < 64 \
                else np.uint64(0xFFFFFFFFFFFFFFFF)
            keys[bi] = (hs >> np.uint64(lo)) & mask
        return pa.table({
            id_col: pa.array(np.tile(ids, bands)),
            "band": pa.array(np.repeat(
                np.arange(bands, dtype=np.int32), n), pa.int32()),
            "key": pa.array(keys.reshape(-1).view(np.int64),
                            pa.int64()),
            "__h64": pa.array(np.tile(hs, bands), pa.uint64())})

    def band_pairs(group: pa.Table) -> pa.Table:
        # one call per BAND with numpy bucket segmentation (the
        # per-(band,key) map_groups shape costs one Python call per
        # bucket — see minhash_lsh_pairs._bucket_pairs); vectorized
        # hamming verify (uint8-view popcount LUT) with the hot-bucket
        # cap: over ``max_bucket`` members, only min-id hub pairs are
        # tested (O(b) instead of O(b²)).  RECALL IS APPROXIMATE above
        # the cap: two members can be within max_hamming of each other
        # yet both >max_hamming from the hub, and if every band they
        # agree on is over-cap the pair is lost — the pigeonhole
        # exactness guarantee holds only while all touched buckets are
        # ≤max_bucket (always true on the oracle corpus).
        ids = group.column(id_col).to_numpy()
        keys = group.column("key").to_numpy()
        hs = group.column("__h64").to_numpy().astype(np.uint64)
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
    pairs = (hashed.map_batches(explode, batch_format="pyarrow")
             .groupby("band")
             .map_groups(band_pairs, batch_format="pyarrow"))
    # cross-band dedup: vectorized aggregate (hamming identical in
    # every band, Min is a no-op choice), not per-pair map_groups
    return (pairs.groupby(["id_a", "id_b"])
            .aggregate(_Min("hamming", alias_name="hamming")))


# ---------------------------------------------------------------------------
# exact word-set Jaccard (broadcast baseline — the oracle-checkable path)

def jaccard_pairs(docs, threshold: float = 0.5, text_col: str = "text",
                  id_col: str = "doc_id",
                  driver_max_bytes: int = 256 << 20):
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
    corpus-sized ever rides the driver.  Group granularity is a SHARD
    (id % P for prefixes, hash(tok) % P for postings), not a document
    or token: one Python call per shard with the whole shard handled
    by one vectorized polars/numpy pass (the per-doc ``map_groups``
    shape cost one Python call per document — the idiom proven in
    ``_bucket_pairs``).

    PLAN PICK from the MEASURED word-set table size (the
    ``minhash_lsh_pairs`` idiom): the distributed plan is ~12
    sequential exchanges whose per-exchange actor-startup overhead
    dominates small inputs (ds.stats(): every remote wall time in
    milliseconds, total 20+ s).  Under ``driver_max_bytes`` (default
    256 MB, the package's standard broadcast cap) THE SAME prefix /
    posting / verify kernels run once locally over the collected set
    table; above it the exchange plan runs unchanged.  Both plans are
    asserted pair-identical in pytest (``tests/test_dedup.py``)."""
    from ferenda_ray.cluster import (coalesce_partitions,
                                     default_num_partitions,
                                     join_partitions)
    from ray.data.aggregate import Count
    co = coalesce_partitions()
    np_join = join_partitions()
    nshards = default_num_partitions(4.0)

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

    def prefix_shard(group: pa.Table) -> pa.Table:
        # rarest-first prefix of length |W| - ceil(t·|W|) + 1 for every
        # doc in the shard, one vectorized polars pass (sort + window
        # rank — same (df, tok) order and the same IEEE float-ceil as
        # the scalar version it replaces)
        g = pl.from_arrow(group.select([id_col, "tok", "df"]))
        out = (g.sort([id_col, "df", "tok"])
               .with_columns(
                   pl.len().over(id_col).alias("__w"),
                   pl.int_range(pl.len()).over(id_col).alias("__r"))
               .filter(pl.col("__r").cast(pl.Float64)
                       < (pl.col("__w").cast(pl.Float64)
                          - (pl.col("__w").cast(pl.Float64)
                             * threshold).ceil() + 1.0))
               .select([id_col, "tok"]))
        return out.to_arrow().cast(pa.schema(
            [(id_col, pa.int64()), ("tok", pa.string())]))

    prefixes = (with_df.map_batches(
        lambda b: b.append_column("__shard", pa.array(
            b.column(id_col).to_numpy() % nshards, pa.int64())),
        batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(prefix_shard, batch_format="pyarrow"))

    def posting_shard(group: pa.Table) -> pa.Table:
        # pair emission for every posting list in the shard: sort by
        # (tok, id), segment token runs, bounded-memory vectorized
        # emission — NO np.triu (a 10k-member posting list is 50M
        # pairs; the output is inherently quadratic but the slab-wise
        # kernel keeps peak intermediates at O(chunk))
        g = (pl.from_arrow(group.select([id_col, "tok"]))
             .sort(["tok", id_col]))
        toks = g.get_column("tok").to_numpy()
        ids = g.get_column(id_col).to_numpy()
        out_a: list = []
        out_b: list = []
        if len(toks):
            new = np.ones(len(toks), dtype=bool)
            new[1:] = toks[1:] != toks[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(toks))
            for s, e in zip(starts, ends):
                if e - s >= 2:
                    _emit_all_pairs(ids[s:e], out_a, out_b)
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64())})

    def tok_shard(b: pa.Table) -> pa.Table:
        sh = (pl.from_arrow(b.select(["tok"]))
              .select(pl.col("tok").hash(seed=42) % nshards)
              .to_series().to_numpy().astype(np.int64))
        return b.append_column("__shard", pa.array(sh, pa.int64()))

    cand = (prefixes.map_batches(tok_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(posting_shard, batch_format="pyarrow")
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
        # exact Jaccard per candidate, one vectorized (Rust) pass:
        # wkeys are space-joined UNIQUE sorted tokens, so list lengths
        # are set cardinalities; empty wkeys (empty docs) are dropped
        # up front exactly as the scalar version skipped inter == 0
        out = (pl.from_arrow(b.select(
            ["id_a", "id_b", "wkey_a", "wkey_b"]))
            .filter((pl.col("wkey_a") != "") & (pl.col("wkey_b") != ""))
            .with_columns(pl.col("wkey_a").str.split(" ").alias("__A"),
                          pl.col("wkey_b").str.split(" ").alias("__B"))
            .with_columns(
                pl.col("__A").list.len().cast(pl.Float64).alias("__la"),
                pl.col("__B").list.len().cast(pl.Float64).alias("__lb"),
                pl.col("__A").list.set_intersection(pl.col("__B"))
                .list.len().cast(pl.Float64).alias("__i"))
            .with_columns((pl.col("__i") / (pl.col("__la")
                                            + pl.col("__lb")
                                            - pl.col("__i")))
                          .alias("jaccard"))
            .filter((pl.col("__i") > 0)
                    & (pl.col("jaccard") >= threshold))
            .select(pl.min_horizontal("id_a", "id_b").alias("id_a"),
                    pl.max_horizontal("id_a", "id_b").alias("id_b"),
                    "jaccard"))
        return out.to_arrow().cast(pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()),
             ("jaccard", pa.float64())]))

    # plan pick (docstring): under the cap, run the SAME kernels once
    # locally — the distributed graph above is lazy and unexecuted
    if sets_ds.size_bytes() <= driver_max_bytes:
        import ray
        import ray.data as rd
        tbls = [t for t in ray.get(sets_ds.to_arrow_refs())
                if t.num_rows]
        if not tbls:
            return rd.from_arrow(pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}))
        sets_tbl = pa.concat_tables(tbls)
        ex = pl.from_arrow(explode_toks(sets_tbl))
        dfl = (ex.group_by("tok").len().rename({"len": "df"})
               .with_columns(pl.col("df").cast(pl.Int64)))
        pref = prefix_shard(ex.join(dfl, on="tok").to_arrow())
        pairs = pl.from_arrow(posting_shard(pref)).unique()
        if dfl.height <= _BITSET_VOCAB_CAP:
            # dense-vocabulary fast path: with ≤16k distinct tokens a
            # word set is a ≤2 KB bitmask, so the exact verify is a
            # popcount over packed uint64 words per candidate instead
            # of a string split + Rust set-intersection per pair
            # (code corpora share identifier vocab heavily; measured
            # 20.9 s → see BASELINE.md).  Identical float math:
            # |A∩B| / (|A|+|B|-|A∩B|) on exact integer counts.
            return rd.from_arrow(_bitset_verify(
                ex, pairs, threshold, id_col))
        sp = pl.from_arrow(sets_tbl)
        j_l = (pairs
               .join(sp.rename({id_col: "id_a", "wkey": "wkey_a"}),
                     on="id_a")
               .join(sp.rename({id_col: "id_b", "wkey": "wkey_b"}),
                     on="id_b"))
        return rd.from_arrow(verify(j_l.to_arrow()))

    return j.map_batches(verify, batch_format="pyarrow")


#: vocab size up to which the local-plan verify packs word sets into
#: uint64 bitmasks (2 KB/doc at the cap)
_BITSET_VOCAB_CAP = 16384

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)],
                    dtype=np.uint16)


def _bitset_verify(ex: "pl.DataFrame", pairs: "pl.DataFrame",
                   threshold: float, id_col: str) -> pa.Table:
    """Exact Jaccard for candidate ``pairs`` via packed-bitset
    popcounts: ``ex`` is the exploded (id, tok) table of the whole
    (collected) corpus slice.  Returns the same (id_a, id_b, jaccard)
    schema and the same float64 values as the string-split verify."""
    if not pairs.height:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    ids_u, row = np.unique(ex.get_column(id_col).to_numpy(),
                           return_inverse=True)
    tok_idx = (ex.select(pl.col("tok").cast(pl.Categorical)
                         .to_physical())
               .to_series().to_numpy().astype(np.int64))
    n_words = (int(tok_idx.max()) >> 6) + 1
    words = np.zeros((len(ids_u), n_words), dtype=np.uint64)
    np.bitwise_or.at(
        words, (row, tok_idx >> 6),
        (np.uint64(1) << (tok_idx & 63).astype(np.uint64)))
    sizes = _POPCNT8[words.view(np.uint8)].sum(axis=1).astype(np.int64)
    a = np.searchsorted(ids_u, pairs.get_column("id_a").to_numpy())
    b = np.searchsorted(ids_u, pairs.get_column("id_b").to_numpy())
    ia = pairs.get_column("id_a").to_numpy()
    ib = pairs.get_column("id_b").to_numpy()
    # fixed-size slabs: the dense gathers (chunk × n_words uint64 ×2
    # + the uint16 LUT expansion) peak at ~50 MB per slab instead of
    # O(n_pairs × n_words) for the whole candidate set at once
    chunk = max(1, (1 << 25) // max(words.shape[1], 1))
    outs_a, outs_b, outs_j = [], [], []
    for s in range(0, len(a), chunk):
        aa, bb = a[s:s + chunk], b[s:s + chunk]
        inter = _POPCNT8[(words[aa] & words[bb]).view(np.uint8)] \
            .sum(axis=1).astype(np.int64)
        union = sizes[aa] + sizes[bb] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = inter / union
        keep = (inter > 0) & (jac >= threshold)
        outs_a.append(ia[s:s + chunk][keep])
        outs_b.append(ib[s:s + chunk][keep])
        outs_j.append(jac[keep])
    return pa.table({
        "id_a": pa.array(np.concatenate(outs_a), pa.int64()),
        "id_b": pa.array(np.concatenate(outs_b), pa.int64()),
        "jaccard": pa.array(np.concatenate(outs_j), pa.float64())})


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

_EMB_PAIRS_EMPTY = pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})


def _emb_hit_table(ids_rows: np.ndarray, ids_cols: np.ndarray,
                   S: np.ndarray, threshold: float,
                   ordered_only: bool) -> pa.Table:
    """Vectorized pair emission from a similarity block ``S`` (rows ×
    cols): one ``np.nonzero`` over the block, no per-row Python.
    ``ordered_only=True`` keeps only ``id_row < id_col`` (the two id
    sets overlap — diagonal block / broadcast plan); ``False`` emits
    ``(min, max)`` for every hit (disjoint id sets — each unordered
    pair surfaces exactly once)."""
    r, h = np.nonzero(S >= threshold)
    if not len(r):
        return _EMB_PAIRS_EMPTY
    a, b = ids_rows[r], ids_cols[h]
    sims = S[r, h]
    if ordered_only:
        m = a < b
        a, b, sims = a[m], b[m], sims[m]
    else:
        lo = np.minimum(a, b)
        b = np.maximum(a, b)
        a = lo
    return pa.table({"id_a": pa.array(a, pa.int64()),
                     "id_b": pa.array(b, pa.int64()),
                     "cosine": pa.array(sims.astype(np.float64),
                                        pa.float64())})


def embedding_neardup_pairs(embeddings, threshold: float = 0.95,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id", dtype=np.float64,
                            broadcast_bytes: int = 256 << 20):
    # dtype float64 by default: this path is oracle-checked against
    # DuckDB's float64 cosine; float32 can flip threshold-boundary rows
    # (ADVICE r1).  Pass float32 explicitly for the approximate regime.
    """Exact pairs with cosine similarity ≥ threshold (id_a < id_b).

    Two physical plans, picked from the MEASURED embedding-table size
    (the same gate as :func:`minhash_lsh_pairs` / :func:`neardup_clusters`):

    * **≤ broadcast_bytes** — the normalized matrix is assembled from
      arrow refs (never row-wise through the driver) and ``ray.put``
      once; each batch does one matmul against it.  O(N·B) flops per
      batch, zero shuffle — the 'embedding table fits in object-store
      memory' regime.
    * **larger** — block-pair plan: the table's blocks are normalized
      in place by one remote task each (results stay in the object
      store), and a tiny Dataset of block-pair indices (i ≤ j) fans
      out one matmul task per pair.  Same O(N²) flops — exact cosine
      over all pairs is inherently quadratic — but no driver collect
      and no worker ever holds more than two blocks, so the plan
      streams at any N.  Both plans are pair-identical
      (pytest-asserted).  For SUB-quadratic near-dup at 100 TB use the
      approximate LSH/IVF routes in ``stages/similarity.py``.
    """
    import ray as _ray
    from ferenda_ray.stages.similarity import _col_matrix
    emb = embeddings.select_columns([id_col, vec_col]).materialize()

    if emb.size_bytes() <= broadcast_bytes:
        refs = emb.to_arrow_refs()
        if not refs:
            import ray.data as rd
            return rd.from_arrow(_EMB_PAIRS_EMPTY)
        packed = pa.concat_tables([_ray.get(r) for r in refs])
        ids = packed.column(id_col).to_numpy(zero_copy_only=False)
        M = _col_matrix(packed, vec_col, dtype)
        M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)

        class Finder:
            def __init__(self, ref):
                self.ids, self.M, self.dtype = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                bids = b.column(id_col).to_numpy(zero_copy_only=False)
                # non-inplace divide: _col_matrix may return a
                # read-only zero-copy view of the Arrow buffer
                V = _col_matrix(b, vec_col, self.dtype)
                V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
                return _emb_hit_table(bids, self.ids, V @ self.M.T,
                                      threshold, ordered_only=True)

        return stateful_map(emb, Finder, (ids, M, dtype),
                            batch_size=2048)

    # ---- block-pair plan: nothing corpus-sized on any one worker ----
    import ray.data as rd

    @_ray.remote
    def _norm_block(tbl: pa.Table):
        bids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        V = _col_matrix(tbl, vec_col, dtype)
        V = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
        return bids.astype(np.int64), V

    blocks = [_norm_block.remote(r) for r in emb.to_arrow_refs()]
    if not blocks:
        return rd.from_arrow(_EMB_PAIRS_EMPTY)
    P = len(blocks)
    items = [{"i": i, "j": j} for i in range(P) for j in range(i, P)]

    class BlockPair:
        def __init__(self, ref):
            self.blocks = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            outs = []
            for i, j in zip(b.column("i").to_pylist(),
                            b.column("j").to_pylist()):
                ids_i, Mi = _ray.get(self.blocks[i])
                ids_j, Mj = _ray.get(self.blocks[j])
                outs.append(_emb_hit_table(ids_i, ids_j, Mi @ Mj.T,
                                           threshold,
                                           ordered_only=(i == j)))
            return pa.concat_tables(outs) if outs else _EMB_PAIRS_EMPTY

    idx = rd.from_items(items, override_num_blocks=min(len(items), 256))
    return stateful_map(idx, BlockPair, blocks, batch_size=8)


# ---------------------------------------------------------------------------
# exact substring (character n-gram) duplication — Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better" detects
# verbatim text reuse at SUBSTRING granularity, which doc-level
# MinHash/SimHash cannot see.  No reference counterpart (the reference
# dedups whole values only, documentrepository.py:913,932-933).


def _mix64(h: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 finalizer, vectorized over uint64."""
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(0xC4CEB9FE1A85EC53)
    h = h ^ (h >> np.uint64(33))
    return h


def _hash128_rows(words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit lane hashes over each ROW of a
    ``(K, W) uint64`` array — vectorized across K, one numpy pass per
    word lane (W is tiny: ``ceil(n/8)``).  Murmur3-style multiply +
    fmix per lane; 128 combined bits make cross-gram collisions
    vanishingly rare (< K²·2⁻¹²⁹ — the same exactness class as the
    content-hash groupby in :func:`exact_dedup`)."""
    K, W = words.shape
    h1 = np.full(K, 0x9368E53C2F6AF274, dtype=np.uint64)
    h2 = np.full(K, 0x586DCD208F7CD3FD, dtype=np.uint64)
    c1 = np.uint64(0x87C37B91114253D5)
    c2 = np.uint64(0x4CF5AD432745937F)
    for j in range(W):
        k = words[:, j]
        h1 = (h1 ^ _mix64(k * c1 + np.uint64(2 * j + 1)))
        h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
        h2 = (h2 ^ _mix64(k * c2 + np.uint64(2 * j + 2)))
        h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)
    return _mix64(h1 ^ np.uint64(W)), _mix64(h2 ^ np.uint64(W))


def _window_hash_rows(b: pa.Table, n: int, stride: int,
                      text_col: str, id_col: str):
    """All byte n-gram windows of a batch, hashed: returns
    ``(doc_ids_per_window, byte_pos_within_doc, g1, g2)`` numpy
    arrays, or ``None`` when the batch has no window.  ONE
    concatenated buffer + ``sliding_window_view`` — no per-doc Python
    beyond the ``str.encode`` C call."""
    texts = b.column(text_col).to_pylist()
    ids64 = b.column(id_col).to_numpy(zero_copy_only=False)
    encs = [t.encode("utf-8") if t else b"" for t in texts]
    lens = np.fromiter((len(e) for e in encs), dtype=np.int64,
                       count=len(encs))
    k = np.where(lens >= n, (lens - n) // stride + 1, 0)
    total = int(k.sum())
    if total == 0:
        return None
    w = (n + 7) // 8
    # global window start positions, built without a per-doc loop
    doc_idx = np.repeat(np.arange(len(encs)), k)
    kpre = np.concatenate(([0], np.cumsum(k)[:-1]))
    within = (np.arange(total) - np.repeat(kpre, k)) * stride
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gpos = starts[doc_idx] + within
    buf = np.frombuffer(b"".join(encs), dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(buf, n)[gpos]
    if n % 8:
        pad = np.zeros((total, w * 8), dtype=np.uint8)
        pad[:, :n] = win
        win = pad
    else:
        win = np.ascontiguousarray(win)
    g1, g2 = _hash128_rows(win.view(np.uint64).reshape(total, w))
    return ids64[doc_idx], within, g1, g2


def ngram_dup_stats(docs, n: int = 16, stride: int = 4,
                    text_col: str = "text", id_col: str = "doc_id",
                    num_buckets: int | None = None):
    """Per-document exact substring-duplication stats: for every doc,
    how many of its DISTINCT byte n-grams (length ``n``, sampled every
    ``stride`` bytes) also occur in at least one OTHER document.

    Returns ``(doc_id, dup_grams, total_grams)`` — docs shorter than
    ``n`` produce no row.  ``dup_grams / total_grams`` is the
    duplicated-text fraction used as a cut in substring-dedup corpus
    cleaning (Lee et al. 2022); ``stride=1`` is exhaustive, larger
    strides trade recall for a 1/stride exchange volume.

    Plan (two shuffles, zero per-gram Python):

    1. ``map_batches``: per batch, ONE concatenated byte buffer +
       ``sliding_window_view`` yields every window of every doc (no
       per-doc Python loop beyond the ``str.encode`` C call); windows
       are 128-bit-hashed lane-wise (:func:`_hash128_rows`) and
       deduped per doc with one ``np.unique``.  Only ``(doc_id, g1,
       g2, bucket)`` rows leave the stage — 28 B per gram regardless
       of ``n``.
    2. ``groupby(bucket)``: buckets co-locate every copy of a gram
       (bucket = g1 mod P); inside, one ``np.unique(return_counts)``
       flags grams seen in ≥2 docs (per-doc distinctness from stage 1
       makes count == distinct-doc count — no count-distinct needed).
    3. ``groupby(doc_id)``: Sum(flag) + Count() → the two stats.

    Byte vs character grams: identical on ASCII text (the oracle
    corpus); on multi-byte text the windows are byte-aligned, which is
    the standard choice in the substring-dedup literature."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from ferenda_ray.cluster import cluster_cpus

    nb = num_buckets or max(2 * cluster_cpus(), 16)
    w = (n + 7) // 8  # uint64 lanes per window (zero-padded)

    def _empty() -> pa.Table:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "__g1": pa.array([], pa.int64()),
                         "__g2": pa.array([], pa.int64()),
                         "__bucket": pa.array([], pa.int32())})

    def grams(b: pa.Table) -> pa.Table:
        hashed = _window_hash_rows(b, n, stride, text_col, id_col)
        if hashed is None:
            return _empty()
        ids_rep, _, g1, g2 = hashed
        total = len(ids_rep)
        # per-doc distinct (doc, gram) — ONE unique over packed rows
        rec = np.empty((total, 3), dtype=np.uint64)
        rec[:, 0] = ids_rep.astype(np.uint64)
        rec[:, 1] = g1
        rec[:, 2] = g2
        rec = np.unique(rec, axis=0)
        return pa.table({
            id_col: pa.array(rec[:, 0].astype(np.int64), pa.int64()),
            "__g1": pa.array(rec[:, 1].view(np.int64), pa.int64()),
            "__g2": pa.array(rec[:, 2].view(np.int64), pa.int64()),
            "__bucket": pa.array(
                (rec[:, 1] % np.uint64(nb)).astype(np.int32),
                pa.int32())})

    def flag_dups(group: pa.Table) -> pa.Table:
        # one call per BUCKET; gram multiplicity == distinct-doc count
        # because stage 1 emitted each (doc, gram) exactly once
        g1 = group.column("__g1").to_numpy().view(np.uint64)
        g2 = group.column("__g2").to_numpy().view(np.uint64)
        ids = group.column(id_col).to_numpy()
        pair = np.empty((len(g1), 2), dtype=np.uint64)
        pair[:, 0] = g1
        pair[:, 1] = g2
        _, inv, cnt = np.unique(pair, axis=0, return_inverse=True,
                                return_counts=True)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "dup": pa.array((cnt[inv] >= 2).astype(np.int64),
                            pa.int64())})

    flagged = (docs.map_batches(grams, batch_format="pyarrow")
               .groupby("__bucket")
               .map_groups(flag_dups, batch_format="pyarrow"))
    return (flagged.groupby(id_col)
            .aggregate(_Sum("dup", alias_name="dup_grams"),
                       _Count(alias_name="total_grams")))


def remove_duplicated_spans(docs, n: int = 16, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_buckets: int | None = None):
    """Substring dedup, removal form (Lee et al. 2022): delete every
    byte covered by a length-``n`` window whose exact bytes occur ≥2
    times ANYWHERE in the corpus (other docs or a repeat within the
    same doc — the paper's "substring occurring more than once"
    criterion).  Returns one row per input doc: ``(doc_id,
    clean_text, n_removed)`` — short docs pass through unchanged.

    Plan: stride-1 window hashes (28 B exchanged per byte — the honest
    cost of exact-coverage detection; suffix arrays are the asymptotic
    alternative) → per-bucket ``np.unique`` flags duplicated windows →
    only the DUP start positions travel back → per-group vectorized
    list packing → one ``left_outer`` join to the docs → batch-global
    mask surgery (diff-array + cumsum over one concatenated buffer, a
    single decode per doc).  Overlapping spans merge in the mask."""
    from ferenda_ray.cluster import (cluster_cpus, coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    nb = num_buckets or max(2 * cluster_cpus(), 16)

    def win_rows(b: pa.Table) -> pa.Table:
        hashed = _window_hash_rows(b, n, 1, text_col, id_col)
        if hashed is None:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "__pos": pa.array([], pa.int64()),
                             "__g1": pa.array([], pa.int64()),
                             "__g2": pa.array([], pa.int64()),
                             "__bucket": pa.array([], pa.int32())})
        ids_rep, pos, g1, g2 = hashed
        return pa.table({
            id_col: pa.array(ids_rep, pa.int64()),
            "__pos": pa.array(pos, pa.int64()),
            "__g1": pa.array(g1.view(np.int64), pa.int64()),
            "__g2": pa.array(g2.view(np.int64), pa.int64()),
            "__bucket": pa.array((g1 % np.uint64(nb)).astype(np.int32),
                                 pa.int32())})

    def dup_starts(group: pa.Table) -> pa.Table:
        # total-occurrence count (within-doc repeats DO count)
        g1 = group.column("__g1").to_numpy().view(np.uint64)
        g2 = group.column("__g2").to_numpy().view(np.uint64)
        pair = np.empty((len(g1), 2), dtype=np.uint64)
        pair[:, 0] = g1
        pair[:, 1] = g2
        _, inv, cnt = np.unique(pair, axis=0, return_inverse=True,
                                return_counts=True)
        keep = cnt[inv] >= 2
        return pa.table({
            id_col: pa.array(group.column(id_col).to_numpy()[keep],
                             pa.int64()),
            "__pos": pa.array(group.column("__pos").to_numpy()[keep],
                              pa.int64())})

    def pack_starts(group: pa.Table) -> pa.Table:
        # one call per id-hash group; per-doc list packing vectorized
        ids = group.column(id_col).to_numpy()
        pos = group.column("__pos").to_numpy()
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        bounds = np.flatnonzero(np.diff(ids)) + 1
        offsets = np.concatenate(([0], bounds, [len(ids)]))
        # packed little-endian int64 blob per doc: Acero joins reject
        # list payload columns, binary passes through fine
        raw = pos.astype("<i8").tobytes()
        blobs = [raw[8 * offsets[i]:8 * offsets[i + 1]]
                 for i in range(len(offsets) - 1)]
        uids = ids[offsets[:-1]]
        return pa.table({id_col: pa.array(uids, pa.int64()),
                         "__starts": pa.array(blobs, pa.binary())})

    starts = (docs.map_batches(win_rows, batch_format="pyarrow")
              .groupby("__bucket")
              .map_groups(dup_starts, batch_format="pyarrow")
              .add_column("__grp", lambda d: d[id_col] % nb)
              .groupby("__grp")
              .map_groups(pack_starts, batch_format="pyarrow"))

    src = docs.select_columns([id_col, text_col])
    # materialize the dup-start side: it is re-consumed by the count
    # probe AND the join, and a fully-empty right side (no duplicates
    # anywhere) breaks Acero schema inference — blocks live in the
    # object store (spillable), sized by dup positions not the corpus
    starts = starts.materialize()
    if starts.count() == 0:
        j = src.map_batches(
            lambda b: b.append_column(
                "__starts", pa.array([None] * len(b), pa.binary())),
            batch_format="pyarrow")
    else:
        if not ray_join_handles_empty_blocks():
            co = coalesce_partitions()
            src, starts = src.repartition(co), starts.repartition(co)
        j = src.join(starts, join_type="left_outer",
                     num_partitions=join_partitions(), on=(id_col,))

    def surgery(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        raw = b.column("__starts").to_pylist()
        encs = [t.encode("utf-8") if t else b"" for t in texts]
        lens = np.fromiter((len(e) for e in encs), dtype=np.int64,
                           count=len(encs))
        starts_np = [np.frombuffer(s, dtype="<i8")
                     if s is not None else np.empty(0, np.int64)
                     for s in raw]
        ns = np.fromiter((len(s) for s in starts_np), dtype=np.int64,
                         count=len(starts_np))
        doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = int(lens.sum())
        diff = np.zeros(total + 1, dtype=np.int64)
        if ns.sum():
            gs = (np.concatenate(starts_np)
                  + np.repeat(doc_off, ns))
            np.add.at(diff, gs, 1)
            np.add.at(diff, gs + n, -1)
        cov = np.cumsum(diff[:-1]) > 0
        buf = np.frombuffer(b"".join(encs), dtype=np.uint8)
        kept = buf[~cov]
        # reduceat only over docs with bytes: zero-length docs share
        # their offset with the next doc (or sit out of bounds at the
        # batch end) and any clamp/repeat correction corrupts the
        # NEIGHBOR's segment sum — nonzero-length offsets are strictly
        # increasing and in-bounds, so the segments are exact
        removed = np.zeros(len(encs), np.int64)
        nz = lens > 0
        if total and nz.any():
            removed[nz] = np.add.reduceat(cov.astype(np.int64),
                                          doc_off[nz])
        kept_lens = lens - removed
        kb = np.concatenate(([0], np.cumsum(kept_lens)))
        kept_bytes = kept.tobytes()
        clean = [kept_bytes[kb[i]:kb[i + 1]].decode("utf-8")
                 for i in range(len(encs))]
        return pa.table({id_col: b.column(id_col),
                         "clean_text": pa.array(clean, pa.string()),
                         "n_removed": pa.array(removed, pa.int64())})

    return j.map_batches(surgery, batch_format="pyarrow")


def corpus_diff(old, new, id_col: str = "doc_id",
                text_col: str = "text"):
    """Snapshot diff between two corpus versions — the dataset-
    versioning primitive behind incremental reprocessing (feed the
    ``added``/``changed`` rows to :func:`~ferenda_ray.stages.sinks.
    upsert_partitioned`, retire the ``removed`` keys).  Returns
    ``(doc_id, status)`` with status ∈ {added, removed, changed};
    unchanged rows are dropped.

    One content-hash pass per side (the :func:`add_content_hash`
    sha256 lineage idiom), one full-outer hash join on the id —
    nothing corpus-sized leaves the workers."""
    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    def side(ds, out):
        def prep(b: pa.Table) -> pa.Table:
            b = add_content_hash(b, text_col)
            return pa.table({id_col: b.column(id_col),
                             out: b.column("content_sha256")})
        return ds.map_batches(prep, batch_format="pyarrow")

    # materialize both hash sides: each is (id, 16-B hash) — the diff
    # working set, spillable — and an entirely-empty snapshot (first
    # run, emptied corpus) breaks Acero schema inference in the join
    o = side(old, "__h_old").materialize()
    n = side(new, "__h_new").materialize()

    def _all_as(ds_, status):
        return ds_.map_batches(
            lambda b: pa.table({
                id_col: b.column(id_col),
                "status": pa.array([status] * b.num_rows,
                                   pa.string())}),
            batch_format="pyarrow")

    if o.count() == 0:
        return _all_as(n, "added")
    if n.count() == 0:
        return _all_as(o, "removed")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        o, n = o.repartition(co), n.repartition(co)
    j = o.join(n, join_type="full_outer", num_partitions=np_,
               on=(id_col,))

    def classify(b: pa.Table) -> pa.Table:
        ho = b.column("__h_old")
        hn = b.column("__h_new")
        added = pc.is_null(ho)
        removed = pc.is_null(hn)
        changed = pc.and_(pc.and_(pc.invert(added), pc.invert(removed)),
                          pc.not_equal(ho, hn))
        status = pc.if_else(
            added, pa.scalar("added"),
            pc.if_else(removed, pa.scalar("removed"),
                       pc.if_else(changed, pa.scalar("changed"),
                                  pa.scalar(""))))
        keep = pc.not_equal(status, pa.scalar(""))
        out = pa.table({id_col: b.column(id_col),
                        "status": status})
        return out.filter(keep)

    return j.map_batches(classify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# near-dup cluster assignment + keep-best dedup (the step AFTER pair
# listing: the reference stops at exact dedup — documentrepository.py
# :913,932-933 — near-dup *resolution* is the beyond-reference part)

def neardup_clusters(docs, pairs, id_col: str = "doc_id",
                     max_collect_edges: int = 2_000_000):
    """Full cluster assignment from a near-dup PAIR list: connected
    components over ``(id_a, id_b)`` edges → one row per input doc
    ``(id, cluster_id)`` where ``cluster_id`` is the component's
    minimum doc id (singletons map to themselves).

    Physical plan picked from the MEASURED edge count (the same
    size-gated pattern as :func:`minhash_lsh_pairs`): a near-dup edge
    set is normally ≪ corpus, so up to ``max_collect_edges`` (~32 MB
    of int64 pairs) the components resolve via driver-side union-find
    broadcast once with ``ray.put`` — one pass over the corpus, no
    per-round shuffles.  Above the cap the edges run through
    distributed min-label propagation (:func:`~ferenda_ray.stages.
    canonicalize.label_propagation`, O(diameter) shuffle rounds, no
    driver state) and the corpus side pays one left-outer hash join.
    Both plans produce identical assignments (pytest-asserted)."""
    from ferenda_ray.cluster import (coalesce_partitions, join_partitions,
                                     ray_join_handles_empty_blocks)
    from ferenda_ray.stages.canonicalize import label_propagation
    from ferenda_ray.state.unionfind import canonical_map_from_edges

    edges = pairs.map_batches(
        lambda b: pa.table({"subj": b.column("id_a"),
                            "obj": b.column("id_b")}),
        batch_format="pyarrow").materialize()
    ids = docs.select_columns([id_col])
    n_edges = edges.count()
    if n_edges == 0:   # no near-dups anywhere: all singletons
        return ids.map_batches(
            lambda b: pa.table({id_col: b.column(id_col),
                                "cluster_id": b.column(id_col)}),
            batch_format="pyarrow")
    if n_edges <= max_collect_edges:
        mapping = canonical_map_from_edges(
            (r["subj"], r["obj"]) for r in edges.take_all())

        class Assign:
            def __init__(self, ref):
                self.m = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                vals = b.column(id_col).to_pylist()
                return pa.table({
                    id_col: b.column(id_col),
                    "cluster_id": pa.array(
                        [self.m.get(i, i) for i in vals], pa.int64())})

        return stateful_map(ids, Assign, mapping)
    # (node, label) for every node that appears in >=1 edge
    labels = label_propagation(edges, dtype=pa.int64()).map_batches(
        lambda b: pa.table({"__lnode": b.column("node"),
                            "__label": b.column("label")}),
        batch_format="pyarrow").materialize()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        ids, labels = ids.repartition(co), labels.repartition(co)
    j = ids.join(labels, join_type="left_outer",
                 num_partitions=join_partitions(),
                 on=(id_col,), right_on=("__lnode",))

    def pick(b: pa.Table) -> pa.Table:
        lbl = pc.coalesce(b.column("__label"), b.column(id_col))
        return pa.table({id_col: b.column(id_col),
                         "cluster_id": lbl.cast(pa.int64())})

    return j.map_batches(pick, batch_format="pyarrow")


def dedup_keep_best(docs, pairs, id_col: str = "doc_id",
                    score_col: str = "n_chars"):
    """Near-dedup RESOLUTION: per connected component of the pair
    graph keep the single best doc (max ``score_col``, ties → min
    id); singletons survive.  Returns ``(id, cluster_id, cluster_size,
    score)`` for the kept docs — the cleaned-corpus keep set.

    Plan: cluster assignment (:func:`neardup_clusters`) ⋈ scores, then
    a per-batch polars best-per-cluster combiner so the final
    ``groupby(cluster_id)`` shuffles at most one row per (cluster ×
    batch) — cluster size rides the same exchange as a partial count."""
    clusters = neardup_clusters(docs, pairs, id_col=id_col)
    from ferenda_ray.cluster import (coalesce_partitions, join_partitions,
                                     ray_join_handles_empty_blocks)
    scores = docs.select_columns([id_col, score_col])
    clusters = clusters.materialize()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        clusters = clusters.repartition(co)
        scores = scores.repartition(co)
    j = clusters.join(scores, join_type="inner",
                      num_partitions=join_partitions(), on=(id_col,))

    def combine(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b)
              .group_by("cluster_id")
              .agg(pl.col(id_col).sort_by(
                       [pl.col(score_col), -pl.col(id_col)],
                       descending=True).first(),
                   pl.col(score_col).max(),
                   pl.len().cast(pl.Int64).alias("__n")))
        return df.to_arrow().cast(pa.schema([
            ("cluster_id", pa.int64()), (id_col, pa.int64()),
            (score_col, pa.int64()), ("__n", pa.int64())]))

    def final(group: pa.Table) -> pa.Table:
        # one polars call per SHARD of clusters (not per cluster):
        # frame order after the sort feeds .first() per group
        df = (pl.from_arrow(group)
              .sort([score_col, id_col], descending=[True, False])
              .group_by("cluster_id")
              .agg(pl.col(id_col).first(),
                   pl.col(score_col).first(),
                   pl.col("__n").sum().alias("cluster_size")))
        return (df.select([id_col, "cluster_id", "cluster_size",
                           score_col]).to_arrow()
                .cast(pa.schema([(id_col, pa.int64()),
                                 ("cluster_id", pa.int64()),
                                 ("cluster_size", pa.int64()),
                                 (score_col, pa.int64())])))

    from ferenda_ray.cluster import cluster_cpus
    nsh = max(2 * cluster_cpus(), 16)
    return (j.map_batches(combine, batch_format="pyarrow")
            .add_column("__shard", lambda d: d["cluster_id"] % nsh)
            .groupby("__shard")
            .map_groups(lambda g: final(g.drop_columns(["__shard"])),
                        batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# corpus-wide segment (line) dedup — CCNet-style line dedup (Wenzek et
# al. 2020 deduplicate hashed lines across shards; C4 removes repeated
# three-sentence spans).  Generic over the segment delimiter: "\n"
# gives line dedup on prose corpora; " " gives document-frequency
# segment pruning on the single-line synthetic corpus.  No reference
# counterpart (the reference dedups whole values only,
# documentrepository.py:913,932-933).


def _split_segments(b: pa.Table, text_col: str, id_col: str,
                    delim: str):
    """Vectorized segment explode for one batch: returns
    ``(ids_rep, doc_idx, counts, ords, vals, h1, h2, nonblank)``
    where ``vals`` is the flat StringArray of segments, ``h1/h2``
    independent 64-bit xxhashes (128 bits total — no usable collision
    mass at 10^12 segments), ``nonblank`` mirrors SQL
    ``trim(seg) <> ''`` (space-trim, matching DuckDB ``trim``).
    One Arrow split + two polars hash calls; no per-row Python."""
    col = pc.fill_null(b.column(text_col), "").combine_chunks()
    la = pc.split_pattern(col, pattern=delim)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    vals = la.flatten()
    offs = la.offsets.to_numpy().astype(np.int64)
    counts = np.diff(offs)
    ids = b.column(id_col).to_numpy(zero_copy_only=False)
    ids_rep = np.repeat(ids, counts)
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    ords = np.arange(len(vals), dtype=np.int64) - np.repeat(offs[:-1],
                                                            counts)
    s = pl.from_arrow(vals)
    if not isinstance(s, pl.Series):       # empty batch edge
        s = pl.Series("seg", [], pl.String)
    h1 = s.hash(seed=1201).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=3407).to_numpy().astype(np.uint64)
    nonblank = pc.not_equal(
        pc.utf8_trim(vals, " "), "").to_numpy(zero_copy_only=False)
    return ids_rep, doc_idx, counts, ords, vals, h1, h2, nonblank


def _doc_distinct_segments(b: pa.Table, text_col: str, id_col: str,
                           delim: str):
    """Per-doc distinct nonblank segments of one batch with occurrence
    count and min ordinal: ``(doc, h1, h2, occ, min_ord)`` numpy
    columns.  One lexsort + run-length pass; each doc's segments live
    in one batch row, so per-batch distinctness IS per-doc
    distinctness."""
    ids_rep, _, _, ords, _, h1, h2, nonblank = _split_segments(
        b, text_col, id_col, delim)
    m = nonblank
    ids_m, ords_m = ids_rep[m], ords[m]
    h1_m, h2_m = h1[m], h2[m]
    if len(ids_m) == 0:
        z = np.array([], np.int64)
        return z, z.view(np.uint64), z.view(np.uint64), z, z
    order = np.lexsort((ords_m, h2_m, h1_m, ids_m))
    ids_s, h1_s, h2_s = ids_m[order], h1_m[order], h2_m[order]
    ords_s = ords_m[order]
    first = np.empty(len(ids_s), bool)
    first[0] = True
    np.not_equal(ids_s[1:], ids_s[:-1], out=first[1:])
    first[1:] |= (h1_s[1:] != h1_s[:-1]) | (h2_s[1:] != h2_s[:-1])
    starts = np.flatnonzero(first)
    occ = np.diff(np.append(starts, len(ids_s))).astype(np.int64)
    return (ids_s[starts], h1_s[starts], h2_s[starts], occ,
            ords_s[starts])          # ords sorted last → min per run


def segment_dup_stats(docs, min_docs: int = 2, delim: str = "\n",
                      text_col: str = "text", id_col: str = "doc_id",
                      num_buckets: int | None = None,
                      broadcast_bytes: int = 64 << 20):
    """Per-document corpus-duplication stats at SEGMENT granularity:
    ``(doc_id, dup_segments, total_segments)`` where ``dup_segments``
    counts the doc's nonblank segment OCCURRENCES whose exact text
    appears in ≥ ``min_docs`` distinct documents and
    ``total_segments`` counts all segment occurrences (blank
    included).  ``dup_segments / total_segments`` is the CCNet-style
    boilerplate fraction used as a document quality cut.

    Two physical plans, picked from the MEASURED duplicated-segment
    table size (the :func:`remove_duplicate_segments` gate):

    * **≤ broadcast_bytes** — the dup table's 128-bit hashes are
      lexsorted once and ``ray.put``; one ``map_batches`` over the
      corpus counts per-doc hits via two searchsorteds.  Total
      exchange: the DISTINCT (doc, hash) rows of the dup-table build
      — ~3× faster than the shuffle plan at sf0.1 (8.5 s → 2.7 s).
    * **larger** — :func:`ngram_dup_stats`'s shape: per-doc distinct
      ``(doc, hash, occ)`` rows bucket-shuffle on ``h1 % nb``; inside
      each bucket one run-length pass counts distinct docs per hash;
      a final ``groupby(doc_id)`` sums flagged occurrences.  Blank
      segments ride along with a flag so totals need no second
      corpus pass.  Both plans are asserted result-identical in
      pytest."""
    from ray.data.aggregate import Sum as _Sum

    from ferenda_ray.cluster import cluster_cpus

    import ray as _ray

    dup = _segment_dup_table(docs, min_docs, delim, text_col,
                             id_col, num_buckets).materialize()
    if dup.size_bytes() is None or dup.size_bytes() <= broadcast_bytes:
        parts = [t for t in (_ray.get(r) for r in dup.to_arrow_refs())
                 if t.num_columns == 4]
        if parts:
            tbl = pa.concat_tables(parts)
            s1 = tbl.column("__h1").to_numpy().view(np.uint64)
            s2 = tbl.column("__h2").to_numpy().view(np.uint64)
        else:
            s1 = s2 = np.array([], np.uint64)
        order = np.lexsort((s2, s1))
        payload = (s1[order], s2[order])

        class Counter:
            def __init__(self, ref):
                self.s1, self.s2 = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                (_, doc_idx, counts, _, _, h1, h2,
                 nonblank) = _split_segments(b, text_col, id_col,
                                             delim)
                hit = (_match128(h1, h2, self.s1, self.s2) >= 0) \
                    & nonblank
                ndocs = b.num_rows
                return pa.table({
                    id_col: b.column(id_col),
                    "dup_segments": pa.array(
                        np.bincount(doc_idx[hit], minlength=ndocs),
                        pa.int64()),
                    "total_segments": pa.array(counts, pa.int64())})

        return stateful_map(docs, Counter, payload, batch_size=1024)

    nb = num_buckets or max(2 * cluster_cpus(), 16)

    def emit(b: pa.Table) -> pa.Table:
        ids_rep, _, counts, _, _, h1, h2, nonblank = _split_segments(
            b, text_col, id_col, delim)
        doc, dh1, dh2, occ, _ = _doc_distinct_segments(
            b, text_col, id_col, delim)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        # blank occurrences per doc (exempt from dup flagging) fold
        # into a per-doc sentinel row: hash 0/0, blank=1
        blank_occ = np.bincount(
            np.repeat(np.arange(len(ids)), counts)[~nonblank],
            minlength=len(ids)).astype(np.int64)
        bz = np.flatnonzero(blank_occ)
        doc_all = np.concatenate([doc, ids[bz]])
        h1_all = np.concatenate([dh1, np.zeros(len(bz), np.uint64)])
        h2_all = np.concatenate([dh2, np.zeros(len(bz), np.uint64)])
        occ_all = np.concatenate([occ, blank_occ[bz]])
        blank = np.concatenate([np.zeros(len(doc), np.int8),
                                np.ones(len(bz), np.int8)])
        # sentinel rows never hash-match (flag() masks them with
        # ~blank), so spread them by DOC id instead of funnelling
        # every blank-holding doc into hash-0's bucket — on a prose
        # corpus nearly all docs emit one sentinel, and `0 % nb`
        # would rebuild the single-partition skew explode() salts
        # against in remove_duplicate_segments
        bucket = np.concatenate([
            (dh1 % np.uint64(nb)).astype(np.int32),
            (ids[bz] % nb).astype(np.int32)])
        return pa.table({
            id_col: pa.array(doc_all, pa.int64()),
            "__h1": pa.array(h1_all.view(np.int64), pa.int64()),
            "__h2": pa.array(h2_all.view(np.int64), pa.int64()),
            "__occ": pa.array(occ_all, pa.int64()),
            "__blank": pa.array(blank, pa.int8()),
            "__bucket": pa.array(bucket, pa.int32()),
        })

    def flag(group: pa.Table) -> pa.Table:
        h1 = group.column("__h1").to_numpy().view(np.uint64)
        h2 = group.column("__h2").to_numpy().view(np.uint64)
        ids = group.column(id_col).to_numpy()
        occ = group.column("__occ").to_numpy()
        blank = group.column("__blank").to_numpy().astype(bool)
        pair = np.empty((len(h1), 2), np.uint64)
        pair[:, 0], pair[:, 1] = h1, h2
        _, inv, cnt = np.unique(pair, axis=0, return_inverse=True,
                                return_counts=True)
        # rows are per-doc distinct → multiplicity == distinct docs;
        # the blank sentinel rows share hash 0/0 but are never flagged
        dup = (cnt[inv] >= min_docs) & ~blank
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "__dup_occ": pa.array(np.where(dup, occ, 0), pa.int64()),
            "__occ": pa.array(occ, pa.int64())})

    return (docs.map_batches(emit, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(flag, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(_Sum("__dup_occ", alias_name="dup_segments"),
                       _Sum("__occ", alias_name="total_segments")))


def _segment_dup_table(docs, min_docs: int, delim: str,
                       text_col: str, id_col: str,
                       num_buckets: int | None = None):
    """Corpus-duplicated segment table ``(h1, h2, min_doc, min_ord)``
    (int64 hash views): every nonblank segment whose text occurs in
    ≥ ``min_docs`` distinct docs, with the lexicographically first
    occurrence ``(min doc_id, min ord within it)`` — the survivor
    under keep-first semantics.  Size ∝ distinct duplicated segments,
    not the corpus."""
    from ferenda_ray.cluster import cluster_cpus

    nb = num_buckets or max(2 * cluster_cpus(), 16)

    def emit(b: pa.Table) -> pa.Table:
        doc, h1, h2, _, mo = _doc_distinct_segments(
            b, text_col, id_col, delim)
        return pa.table({
            "__doc": pa.array(doc, pa.int64()),
            "__h1": pa.array(h1.view(np.int64), pa.int64()),
            "__h2": pa.array(h2.view(np.int64), pa.int64()),
            "__mo": pa.array(mo, pa.int64()),
            "__bucket": pa.array(
                (h1 % np.uint64(nb)).astype(np.int32), pa.int32())})

    def reduce_bucket(group: pa.Table) -> pa.Table:
        h1 = group.column("__h1").to_numpy().view(np.uint64)
        h2 = group.column("__h2").to_numpy().view(np.uint64)
        doc = group.column("__doc").to_numpy()
        mo = group.column("__mo").to_numpy()
        # lexsort puts each hash's (min doc, min ord) row first; rows
        # are per-doc distinct so run length == distinct-doc count
        order = np.lexsort((mo, doc, h2, h1))
        h1s, h2s = h1[order], h2[order]
        first = np.empty(len(h1s), bool)
        first[0] = True
        np.not_equal(h1s[1:], h1s[:-1], out=first[1:])
        first[1:] |= h2s[1:] != h2s[:-1]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, len(h1s)))
        keep = runlen >= min_docs
        sk = starts[keep]
        return pa.table({
            "__h1": pa.array(h1s[sk].view(np.int64), pa.int64()),
            "__h2": pa.array(h2s[sk].view(np.int64), pa.int64()),
            "__min_doc": pa.array(doc[order][sk], pa.int64()),
            "__min_ord": pa.array(mo[order][sk], pa.int64())})

    return (docs.map_batches(emit, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(reduce_bucket, batch_format="pyarrow"))


def _match128(q1: np.ndarray, q2: np.ndarray, s1: np.ndarray,
              s2: np.ndarray) -> np.ndarray:
    """Index of each 128-bit query ``(q1[i], q2[i])`` in the set
    ``(s1, s2)`` sorted by ``lexsort((s2, s1))``; -1 where absent.
    Vectorized searchsorted on the primary lane; the h1-collision
    fallback loop runs only on duplicate-h1 runs (≈never)."""
    idx = np.full(len(q1), -1, np.int64)
    if len(s1) == 0 or len(q1) == 0:
        return idx
    lo = np.searchsorted(s1, q1, "left")
    hi = np.searchsorted(s1, q1, "right")
    one = (hi - lo) == 1
    cand = lo[one]
    ok = s2[cand] == q2[one]
    idx[np.flatnonzero(one)[ok]] = cand[ok]
    for i in np.flatnonzero((hi - lo) > 1):
        j = lo[i] + np.searchsorted(s2[lo[i]:hi[i]], q2[i])
        if j < hi[i] and s1[j] == q1[i] and s2[j] == q2[i]:
            idx[i] = j
    return idx


_SEG_CLEAN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                               ("clean_text", pa.string()),
                               ("n_removed", pa.int64())])


def remove_duplicate_segments(docs, min_docs: int = 2,
                              mode: str = "drop_all",
                              delim: str = "\n",
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              broadcast_bytes: int = 64 << 20):
    """Corpus-wide segment dedup, removal form: rebuild every document
    without the segments whose exact text occurs in ≥ ``min_docs``
    distinct documents.  ``mode="drop_all"`` removes every occurrence
    (boilerplate removal); ``mode="keep_first"`` keeps the single
    globally-first occurrence (min doc_id, then min ordinal — CCNet
    line-dedup semantics, Wenzek et al. 2020).  Blank segments are
    exempt and always kept.  Returns ``(doc_id, clean_text,
    n_removed)`` for EVERY input doc (a doc losing all segments
    yields ``clean_text=""``).

    Two physical plans, picked from the MEASURED duplicated-segment
    table size (the :func:`minhash_lsh_pairs` gate):

    * **≤ broadcast_bytes** — the ``(h1, h2, min_doc, min_ord)``
      arrays are lexsorted once and ``ray.put``; each batch re-splits
      its docs, membership-tests via two searchsorteds and reassembles
      with one ``pc.binary_join``.  One corpus read + one bucket
      shuffle of DISTINCT (doc, segment-hash) rows; segment text never
      shuffles.
    * **larger** — the exploded ``(doc_id, ord, seg, h1, h2)`` rows
      left-outer-join the dup table on ``(h1, h2)`` (hash-partitioned
      ``Dataset.join``), then one ``groupby(doc_id)`` reassembles; a
      doc's segments bound each task, never the corpus.  Both plans
      are asserted result-identical in pytest.
    """
    if mode not in ("drop_all", "keep_first"):
        raise ValueError(f"unknown mode {mode!r}")
    import ray as _ray
    import ray.data as rd

    dup = _segment_dup_table(docs, min_docs, delim, text_col,
                             id_col).materialize()

    if dup.size_bytes() is None or dup.size_bytes() <= broadcast_bytes:
        parts = [t for t in (_ray.get(r) for r in dup.to_arrow_refs())
                 if t.num_columns == 4]    # skip Ray's schemaless
        tbl = (pa.concat_tables(parts) if parts else   # empty blocks
               pa.table({"__h1": pa.array([], pa.int64()),
                         "__h2": pa.array([], pa.int64()),
                         "__min_doc": pa.array([], pa.int64()),
                         "__min_ord": pa.array([], pa.int64())}))
        s1 = tbl.column("__h1").to_numpy().view(np.uint64)
        s2 = tbl.column("__h2").to_numpy().view(np.uint64)
        md = tbl.column("__min_doc").to_numpy()
        mo = tbl.column("__min_ord").to_numpy()
        order = np.lexsort((s2, s1))
        payload = (s1[order], s2[order], md[order], mo[order])

        class Cleaner:
            def __init__(self, ref):
                self.s1, self.s2, self.md, self.mo = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                (ids_rep, doc_idx, counts, ords, vals, h1, h2,
                 nonblank) = _split_segments(b, text_col, id_col,
                                             delim)
                idx = _match128(h1, h2, self.s1, self.s2)
                hit = (idx >= 0) & nonblank
                if mode == "keep_first":
                    ii = idx[hit]
                    hit[np.flatnonzero(hit)[
                        (self.md[ii] == ids_rep[hit])
                        & (self.mo[ii] == ords[hit])]] = False
                keep = ~hit
                ndocs = b.num_rows
                kept_counts = np.bincount(doc_idx[keep],
                                          minlength=ndocs)
                offs = np.zeros(ndocs + 1, np.int64)
                np.cumsum(kept_counts, out=offs[1:])
                lj = pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()),
                    vals.filter(pa.array(keep)))
                removed = np.bincount(doc_idx[hit], minlength=ndocs)
                return pa.table({
                    "doc_id": b.column(id_col),
                    "clean_text": pc.binary_join(lj, delim),
                    "n_removed": pa.array(removed, pa.int64())})

        return stateful_map(docs, Cleaner, payload, batch_size=1024)

    # ---- distributed plan: exploded rows join the dup table ----
    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    def explode(b: pa.Table) -> pa.Table:
        (ids_rep, _, _, ords, vals, h1, h2,
         nonblank) = _split_segments(b, text_col, id_col, delim)
        return pa.table({
            id_col: pa.array(ids_rep, pa.int64()),
            "__ord": pa.array(ords, pa.int64()),
            "__seg": vals,
            "__nb": pa.array(nonblank),
            # blanks never match the (nonblank-only) dup table, but a
            # shared constant key would funnel every blank row into
            # one join partition — salt them with (doc, ord) instead
            # (collision with a real 128-bit hash pair: ~|dup|/2^128)
            "__h1": pa.array(
                np.where(nonblank, h1,
                         ids_rep.astype(np.uint64)).view(np.int64),
                pa.int64()),
            "__h2": pa.array(
                np.where(nonblank, h2,
                         ~ords.astype(np.uint64)).view(np.int64),
                pa.int64())})

    rows = docs.map_batches(explode, batch_format="pyarrow")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        rows, dup = rows.repartition(co), dup.repartition(co)
    j = rows.join(dup, join_type="left_outer", num_partitions=np_,
                  on=("__h1", "__h2"))

    def reassemble(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        ords = group.column("__ord").to_numpy()
        nonblank = group.column("__nb").to_numpy(zero_copy_only=False)
        matched = pc.is_valid(group.column("__min_doc")).to_numpy(
            zero_copy_only=False)
        md = pc.fill_null(group.column("__min_doc"), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        mo = pc.fill_null(group.column("__min_ord"), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hit = matched & nonblank
        if mode == "keep_first":
            hm = hit.copy()
            hit[np.flatnonzero(hm)[
                (md[hm] == ids[hm]) & (mo[hm] == ords[hm])]] = False
        order = np.lexsort((ords, ids))
        ids_s, hit_s = ids[order], hit[order]
        vals_s = group.column("__seg").combine_chunks().take(
            pa.array(order))
        first = np.empty(len(ids_s), bool)
        if len(ids_s):
            first[0] = True
            np.not_equal(ids_s[1:], ids_s[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        uids = ids_s[starts]
        seg_doc = np.cumsum(first) - 1          # doc index per row
        keep = ~hit_s
        kept_counts = np.bincount(seg_doc[keep], minlength=len(uids))
        offs = np.zeros(len(uids) + 1, np.int64)
        np.cumsum(kept_counts, out=offs[1:])
        lj = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                      vals_s.filter(pa.array(keep)))
        removed = np.bincount(seg_doc[hit_s], minlength=len(uids))
        return pa.table({
            "doc_id": pa.array(uids, pa.int64()),
            "clean_text": pc.binary_join(lj, delim),
            "n_removed": pa.array(removed, pa.int64())})

    out = j.groupby(id_col).map_groups(reassemble,
                                       batch_format="pyarrow")
    return out.map_batches(lambda b: b.cast(_SEG_CLEAN_SCHEMA),
                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Persisted MinHash-LSH index + incremental probe
#
# The operational 100-TB shape of near-dedup: the existing corpus is
# indexed ONCE (band buckets + verification digests persisted as
# partitioned parquet); each new snapshot probes the index with two
# hash joins instead of re-pairing the whole corpus.  Reference
# analogue: the needed()/re-relate incremental gates
# (documentstore.py:400-470, documentrepository.py:1731-1883) applied
# to near-dedup instead of parse/relate.

_MHIDX_META = "_minhash_index.json"


def build_minhash_index(docs, out_dir: str, num_perm: int = 128,
                        bands: int = 16, shingle_n: int = 1,
                        seed: int = 42, text_col: str = "text",
                        id_col: str = "doc_id") -> None:
    """Persist an LSH index over ``docs``: ``bands/`` = ``(id, bhash)``
    hive-partitioned by ``band`` (a probe join task reads only its
    band's directory), ``sigs.parquet`` = ``(id, digest)`` where
    digest is the sha256 of the sorted distinct word set (the exact
    verifier), and a meta record (num_perm/bands/shingle_n/seed/id_col)
    from which :func:`probe_minhash_index` derives its hash
    parameters — a probe can never hash with foreign parameters
    (the checkpoint-meta lesson from the kmeans/logreg ADVICE fix,
    applied by construction)."""
    import json
    import os
    rows = num_perm // bands
    sigs = minhash_signatures(docs, num_perm, shingle_n, seed,
                              text_col, id_col)

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

    os.makedirs(out_dir, exist_ok=True)
    sigs.map_batches(explode, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "bands"), partition_cols=["band"])

    def digest(b: pa.Table) -> pa.Table:
        digs = [hashlib.sha256(
                    " ".join(sorted(set(t.split()))).encode()).hexdigest()
                for t in b.column(text_col).to_pylist()]
        return pa.table({id_col: b.column(id_col),
                         "digest": pa.array(digs, pa.string())})

    docs.map_batches(digest, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "digests"))
    with open(os.path.join(out_dir, _MHIDX_META), "w") as f:
        json.dump({"num_perm": num_perm, "bands": bands,
                   "shingle_n": shingle_n, "seed": seed,
                   "id_col": id_col}, f)
def _index_bytes(index_dir: str) -> int:
    import os
    total = 0
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def probe_minhash_index(new_docs, index_dir: str,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        broadcast_bytes: int = 256 << 20):
    """Probe a persisted index with a new snapshot: returns verified
    duplicate pairs ``(new_id, old_id)`` — new docs whose distinct
    word set EQUALS an indexed doc's (``shingle_n=1`` default: the
    signature is a pure function of the word set, so every true pair
    collides in every band and recall vs the word-set-equality oracle
    is 1.0 by construction; the digest verify then removes every
    estimate-only false positive, making the result exact and
    SQL-checkable).

    Two physical plans, picked from the MEASURED on-disk index size
    (the ``minhash_lsh_pairs`` idiom):

    * **≤ broadcast_bytes** — the whole index (bucket dict + digest
      dict) is ``ray.put`` once and the probe is ONE ``map_batches``
      over the new snapshot: zero joins, zero shuffles.  The first
      cut used the join plan unconditionally and took 88 s at sf0.1
      — four hash joins in one streaming topology reserve
      4 × join_partitions() aggregator-actor CPUs (the whole 32-CPU
      box), starving every map stage; this plan runs in ~2 s.
    * **larger** — hash-join plan, PHASED with materialize barriers
      so at most one join's aggregator pool is alive at a time (the
      CPU-reservation lesson above; the barriers hold only the
      candidate pair list, not the corpus): new band rows ⋈ index
      bands on (band, bhash) → candidates (deduped across bands,
      materialized) → ⋈ new digests (materialized) → ⋈ indexed
      digests → equality filter.  No corpus-sized state on any
      worker; nothing re-pairs the OLD corpus."""
    import json
    import os
    import ray.data as rd
    from ray.data.aggregate import Min as _Min
    from ferenda_ray.cluster import coalesce_partitions, join_partitions

    with open(os.path.join(index_dir, _MHIDX_META)) as f:
        meta = json.load(f)
    rows = meta["num_perm"] // meta["bands"]

    if _index_bytes(index_dir) <= broadcast_bytes:
        # ---- broadcast plan: lookup + verify inside one map ----
        import pyarrow.parquet as _pq
        bt = _pq.read_table(os.path.join(index_dir, "bands"))
        buckets: dict = {}
        key = np.stack([bt.column("band").to_numpy().astype(np.int64),
                        bt.column("bhash").to_numpy()], axis=1) \
            if bt.num_rows else np.empty((0, 2), np.int64)
        oid = bt.column(meta["id_col"]).to_numpy().astype(np.int64) \
            if bt.num_rows else np.empty(0, np.int64)
        for (bb, hh), o in zip(map(tuple, key), oid):
            buckets.setdefault((int(bb), int(hh)), []).append(int(o))
        dt = _pq.read_table(os.path.join(index_dir, "digests"))
        digests = dict(zip(
            dt.column(meta["id_col"]).to_pylist(),
            dt.column("digest").to_pylist()))
        bands_n, id_c, txt_c = meta["bands"], id_col, text_col

        class Prober:
            """Index dict + hasher built ONCE per actor/closure
            (stateful_map load-once policy), not per batch."""

            def __init__(self, ref):
                self.buckets, self.digests = resolve(ref)
                self.hasher = MinHasher(meta["num_perm"],
                                        meta["shingle_n"],
                                        meta["seed"], txt_c, id_c)

            def __call__(self, b: pa.Table) -> pa.Table:
                out_n, out_o = [], []
                for i, t in zip(b.column(id_c).to_pylist(),
                                b.column(txt_c).to_pylist()):
                    sig = self.hasher.signature(t)
                    cands: set = set()
                    for bi, h in enumerate(
                            _bands(sig.tolist(), bands_n, rows)):
                        cands.update(self.buckets.get((bi, h), ()))
                    if not cands:
                        continue
                    dg = hashlib.sha256(
                        " ".join(sorted(set(t.split()))).encode()
                    ).hexdigest()
                    for o in sorted(cands):
                        if self.digests.get(o) == dg:
                            out_n.append(i)
                            out_o.append(o)
                return pa.table({
                    "new_id": pa.array(out_n, pa.int64()),
                    "old_id": pa.array(out_o, pa.int64())})

        return stateful_map(new_docs, Prober, (buckets, digests),
                            batch_size=2048)

    # ---- join plan (index larger than the broadcast cap) ----
    co = coalesce_partitions()
    np_ = join_partitions()
    sigs = minhash_signatures(new_docs, meta["num_perm"],
                              meta["shingle_n"], meta["seed"],
                              text_col, id_col)

    def explode(b: pa.Table) -> pa.Table:
        ids, bnd, bh = [], [], []
        for i, sig in zip(b.column(id_col).to_pylist(),
                          b.column("minhash").to_pylist()):
            for bi, h in enumerate(_bands(sig, meta["bands"], rows)):
                ids.append(i)
                bnd.append(bi)
                bh.append(h)
        return pa.table({
            "new_id": pa.array(ids, pa.int64()),
            "band": pa.array(bnd, pa.int32()),
            "bhash": pa.array(bh, pa.int64()),
        })

    probe = sigs.map_batches(explode,
                             batch_format="pyarrow").repartition(co)
    idx = rd.read_parquet(os.path.join(index_dir, "bands")).map_batches(
        lambda b: pa.table({
            "old_id": b.column(meta["id_col"]).cast(pa.int64()),
            "band": b.column("band").cast(pa.int32()),
            "bhash": b.column("bhash").cast(pa.int64())}),
        batch_format="pyarrow").repartition(co)
    cand = probe.join(idx, join_type="inner", on=("band", "bhash"),
                      num_partitions=np_)
    # per-BATCH vectorized pair dedup only (one polars unique per
    # block): a true pair collides in EVERY band (16× duplication)
    # and a GLOBAL groupby-dedup here is the wrong place — profiled
    # 88 s at sf0.1 (3.7 M candidate rows through a keyed aggregate)
    # vs leaving residual cross-block dups for the digest joins to
    # carry and deduping the (much smaller) VERIFIED output below.
    # materialize = phase barrier releasing this join's actor pool.
    cand = cand.map_batches(
        lambda b: pl.from_arrow(b.select(["new_id", "old_id"]))
        .unique().to_arrow().cast(
            pa.schema([("new_id", pa.int64()),
                       ("old_id", pa.int64())])),
        batch_format="pyarrow").repartition(co)
    cand = cand.materialize()

    def digest_side(idname, dgname, src_id):
        def prep(b: pa.Table) -> pa.Table:
            return pa.table({idname: b.column(src_id).cast(pa.int64()),
                             dgname: b.column("digest")})
        return prep

    def new_digests(b: pa.Table) -> pa.Table:
        digs = [hashlib.sha256(
                    " ".join(sorted(set(t.split()))).encode()).hexdigest()
                for t in b.column(text_col).to_pylist()]
        return pa.table({"new_id": b.column(id_col).cast(pa.int64()),
                         "dg_new": pa.array(digs, pa.string())})

    dn = new_docs.map_batches(new_digests,
                              batch_format="pyarrow").repartition(co)
    do = rd.read_parquet(os.path.join(index_dir, "digests")).map_batches(
        digest_side("old_id", "dg_old", meta["id_col"]),
        batch_format="pyarrow").repartition(co)
    j = cand.join(dn, join_type="inner", on=("new_id",),
                  num_partitions=np_)
    # second phase barrier: small (pairs + one digest column), keeps
    # the two digest joins from holding actor pools concurrently
    j = j.repartition(co).materialize()
    j = j.join(do, join_type="inner", on=("old_id",),
               num_partitions=np_)

    def verify(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("dg_new"), b.column("dg_old"))
        return b.filter(keep).select(["new_id", "old_id"])

    out = j.map_batches(verify, batch_format="pyarrow")
    # global dedup on the VERIFIED pairs (output-sized, not
    # candidate-sized: residual cross-block band dups collapse here)
    out = (out.groupby(["new_id", "old_id"])
           .aggregate(_Min("new_id", alias_name="__k")))
    return out.map_batches(lambda b: b.select(["new_id", "old_id"]),
                           batch_format="pyarrow")
