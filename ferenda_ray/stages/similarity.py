"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_topk` — exact cosine top-k: query matrix broadcast via
  ``ray.put``, one numpy matmul per batch, per-batch top-k candidates,
  final per-query merge.  The baseline; cost O(N·Q·d) flops, one small
  shuffle of N_batches·Q·k candidate rows.
* :func:`lsh_topk` — sign-random-projection LSH bucketing: vectors are
  assigned ``n_planes``-bit bucket codes (seeded projection, broadcast);
  queries only scan buckets within ``probe_hamming`` of their own code.
  The 100 TB path: the bucket column is a partition key, so a probe
  touches a bounded fraction of blocks.  Recall < 1, measured in tests
  against :func:`brute_topk`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ferenda_ray.stages.broadcast import resolve, stateful_map


def _as_matrix(rows_or_ndarray, dtype=np.float64) -> np.ndarray:
    # float64 by default: the oracle-checked paths (brute_topk,
    # embedding_neardup_pairs) must reproduce DuckDB's float64
    # list_cosine_similarity bit-for-bit after 4dp rounding; float32
    # can flip ties at rounding/threshold boundaries.  The approximate
    # scale paths (LSH/IVF) opt back into float32.
    a = np.asarray(rows_or_ndarray, dtype=dtype)
    return a if a.ndim == 2 else a[None, :]


def _col_matrix(b: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    """Vectorized ``list<float>`` column → (n, d) ndarray.

    Assumes non-null, equal-length lists (the embedding-table
    invariant); avoids the per-row ``to_pylist`` Python loop."""
    import pyarrow.compute as pc
    arr = b.column(col).combine_chunks()
    flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(len(arr), -1)


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)


def brute_topk(embeddings, queries, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id",
               query_ids: list | None = None):
    """Exact cosine top-k for each query vector.

    Returns Dataset ``(query_id, vec_id, cosine, rank)``; ties broken
    by ascending ``vec_id`` (deterministic)."""
    Q = _normalize(_as_matrix(queries))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))

    class Scorer:
        def __init__(self, ref):
            self.qids, self.Q = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            V = _normalize(_col_matrix(b, vec_col, np.float64))
            S = self.Q @ V.T                       # (q, batch)
            qcol, icol, ccol = [], [], []
            kk = min(k, S.shape[1])
            for qi in range(S.shape[0]):
                # partial top-k within the batch (candidates)
                idx = np.argpartition(-S[qi], kk - 1)[:kk]
                qcol.extend([self.qids[qi]] * len(idx))
                icol.extend(int(ids[j]) for j in idx)
                ccol.extend(float(S[qi, j]) for j in idx)
            return pa.table({"query_id": pa.array(qcol, pa.int64()),
                             id_col: pa.array(icol, pa.int64()),
                             "cosine": pa.array(ccol, pa.float64())})

    candidates = stateful_map(embeddings, Scorer, (qids, Q),
                              batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")])
        g = g.slice(0, k)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return candidates.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def knn_graph(embeddings, k: int = 5, vec_col: str = "embedding",
              id_col: str = "vec_id",
              broadcast_bytes: int = 256 << 20):
    """Exact cosine k-NN graph over ALL vectors: one row per
    (vector, neighbor) with ``rank`` 1..k by (cosine desc, neighbor_id
    asc), self excluded — the primitive under graph-based semantic
    dedup and cluster seeding.

    Plan picked from the MEASURED table size (the
    :func:`~ferenda_ray.stages.dedup.embedding_neardup_pairs` gate):

    * **≤ broadcast_bytes** — the id-sorted normalized matrix ships
      once via ``ray.put``; each batch is one matmul against it and
      an in-batch exact top-k (candidates = every corpus column, so
      no merge exchange at all).
    * **larger** — block-pair fan-out: every UNORDERED block pair
      (i ≤ j) computes one matmul and emits block-i rows' top-k from
      S plus block-j rows' top-k from S.T (the transpose is free — no
      (j, i) re-compute), then ONE ``groupby(vec_id)`` merge keeps the
      global top-k.  O(N²) flops — exact all-pairs is inherently
      quadratic; for sub-quadratic use the LSH/IVF index routes — but
      no worker holds more than two blocks.

    Memory discipline: the broadcast plan's batch size is derived
    from N so each batch's (rows × N) float64 score matrix stays
    ≤ ~256 MB regardless of how small the (bytes-gated) matrix is.

    Tie discipline matches the SQL oracle (ORDER BY cosine DESC, id):
    candidates are cut at ``max(4k, 64)`` per row before the exact
    (−cosine, id) sort, so results are deterministic unless >4k−1
    columns tie EXACTLY (bit-equal float64) with the k-th value."""
    import ray as _ray
    import ray.data as rd

    emb = embeddings.select_columns([id_col, vec_col]).materialize()
    empty = _knn_empty(id_col)

    def _row_topk(bids: np.ndarray, cids: np.ndarray, S: np.ndarray,
                  per_row_k: int, mask_self: bool) -> pa.Table:
        if mask_self:
            pos = np.searchsorted(cids, bids)
            pos = np.clip(pos, 0, len(cids) - 1)
            hit = cids[pos] == bids
            S[np.flatnonzero(hit), pos[hit]] = -np.inf
        m = min(S.shape[1], max(4 * per_row_k, 64))
        part = np.argpartition(-S, m - 1, axis=1)[:, :m]
        rows_out, nb_out, cos_out, rk_out = [], [], [], []
        for r in range(S.shape[0]):
            cand = part[r]
            c = S[r, cand]
            keep = c > -np.inf
            cand, c = cand[keep], c[keep]
            order = np.lexsort((cids[cand], -c))[:per_row_k]
            nb = cids[cand[order]]
            rows_out.append(np.full(len(nb), bids[r], np.int64))
            nb_out.append(nb)
            cos_out.append(c[order])
            rk_out.append(np.arange(1, len(nb) + 1, dtype=np.int64))
        if not rows_out:
            return empty
        return pa.table({
            id_col: pa.array(np.concatenate(rows_out), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(nb_out), pa.int64()),
            "cosine": pa.array(np.concatenate(cos_out), pa.float64()),
            "rank": pa.array(np.concatenate(rk_out), pa.int64())})

    if emb.size_bytes() <= broadcast_bytes:
        refs = emb.to_arrow_refs()
        tbls = [t for t in _ray.get(refs) if t.num_rows]
        if not tbls:
            return rd.from_arrow(empty)
        packed = pa.concat_tables(tbls)
        ids = packed.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order].astype(np.int64)
        M = _normalize(_col_matrix(packed, vec_col, np.float64))[order]

        class Finder:
            def __init__(self, ref):
                self.ids, self.M = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                bids = (b.column(id_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64))
                V = _normalize(_col_matrix(b, vec_col, np.float64))
                return _row_topk(bids, self.ids, V @ self.M.T, k, True)

        # rows × N × 16 B (scores + argpartition indices) ≤ ~512 MB
        bs = int(min(2048, max(32, (256 << 20) // (len(ids) * 16))))
        return stateful_map(emb, Finder, (ids, M), batch_size=bs)

    # ---- block-pair plan: nothing corpus-sized on any one worker ----
    @_ray.remote
    def _norm_block(tbl: pa.Table):
        if tbl.num_rows == 0:     # repartition can leave empty blocks
            return np.empty(0, np.int64), None
        bids = (tbl.column(id_col).to_numpy(zero_copy_only=False)
                .astype(np.int64))
        order = np.argsort(bids)
        return (bids[order],
                _normalize(_col_matrix(tbl, vec_col,
                                       np.float64))[order])

    blocks = [_norm_block.remote(r) for r in emb.to_arrow_refs()]
    if not blocks:
        return rd.from_arrow(empty)
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
                if Mi is None or Mj is None:
                    continue
                S = Mi @ Mj.T
                # S serves both directions: i-rows vs j-cols, and the
                # free transpose for j-rows vs i-cols.  Safe order:
                # the i==j call is the only one that mutates S (self
                # mask) and is also the only one with no second use.
                outs.append(_row_topk(ids_i, ids_j, S, k, i == j))
                if i != j:
                    outs.append(_row_topk(ids_j, ids_i,
                                          np.ascontiguousarray(S.T),
                                          k, False))
            return (pa.concat_tables(outs) if outs else empty)

    idx = rd.from_items(items, override_num_blocks=min(len(items), 256))
    cand = stateful_map(idx, BlockPair, blocks, batch_size=8)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"),
                           ("neighbor_id", "ascending")]).slice(0, k)
        return g.set_column(
            g.schema.get_field_index("rank"), "rank",
            pa.array(range(1, g.num_rows + 1), pa.int64()))

    return cand.groupby(id_col).map_groups(merge,
                                           batch_format="pyarrow")


def _knn_empty(id_col: str) -> pa.Table:
    return pa.table({id_col: pa.array([], pa.int64()),
                     "neighbor_id": pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64()),
                     "rank": pa.array([], pa.int64())})


def bucket_codes(embeddings, n_planes: int = 8, seed: int = 7,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Assign each vector its sign-LSH bucket code (int in
    [0, 2**n_planes)).  The planes are seeded and broadcast — at scale
    this column becomes the partition key for the index layout."""
    class Coder:
        def __init__(self, planes_ref):
            self.P = resolve(planes_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            V = _col_matrix(b, vec_col, np.float32)
            bits = (V @ self.P.T) > 0              # (n, planes)
            codes = bits @ (1 << np.arange(self.P.shape[0]))
            return b.append_column("bucket",
                                   pa.array(codes.astype("int64")))

    # dimension probed lazily from the first row
    first = embeddings.take(1)[0]
    dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)
    ds = stateful_map(embeddings, Coder, planes, state_key="planes_ref",
                      batch_size=4096)
    return ds, planes


def lsh_topk(embeddings, queries, k: int = 10, n_planes: int = 8,
             probe_hamming: int = 1, seed: int = 7,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_ids: list | None = None):
    """Approximate top-k: scan only vectors whose bucket code is within
    ``probe_hamming`` bits of the query's code."""
    import ray

    coded, planes = bucket_codes(embeddings, n_planes, seed, vec_col, id_col)
    Q = _normalize(_as_matrix(queries, np.float32))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    qbits = (Q @ planes.T) > 0
    qcodes = qbits @ (1 << np.arange(n_planes))

    # per query: admissible bucket set
    def _neighbors(code: int) -> set:
        out = {code}
        frontier = [code]
        for _ in range(probe_hamming):
            nxt = []
            for c in frontier:
                for b in range(n_planes):
                    nxt.append(c ^ (1 << b))
            frontier = nxt
            out.update(nxt)
        return out

    admissible = {}
    for qi, c in zip(qids, qcodes.astype(int)):
        for b in _neighbors(int(c)):
            admissible.setdefault(b, []).append(qi)
    qindex = {qid: i for i, qid in enumerate(qids)}

    class Scorer:
        def __init__(self, ref):
            self.admissible, self.qindex, self.Q = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            buckets = b.column("bucket").to_numpy(zero_copy_only=False)
            V = _normalize(_col_matrix(b, vec_col, np.float32))
            qcol, icol, ccol = [], [], []
            for qid_list_bucket in set(buckets.tolist()):
                qlist = self.admissible.get(int(qid_list_bucket))
                if not qlist:
                    continue
                mask = buckets == qid_list_bucket
                Vm, idsm = V[mask], ids[mask]
                for qid in qlist:
                    s = Vm @ self.Q[self.qindex[qid]]
                    kk = min(k, len(s))
                    idx = np.argpartition(-s, kk - 1)[:kk] if kk else []
                    qcol.extend([qid] * len(idx))
                    icol.extend(int(idsm[j]) for j in idx)
                    ccol.extend(float(s[j]) for j in idx)
            return pa.table({"query_id": pa.array(qcol, pa.int64()),
                             id_col: pa.array(icol, pa.int64()),
                             "cosine": pa.array(ccol, pa.float64())})

    candidates = stateful_map(coded, Scorer, (admissible, qindex, Q),
                              batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")])
        g = g.slice(0, k)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return candidates.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path

def kmeans_fit(X: np.ndarray, n_centroids: int, n_iter: int = 10,
               seed: int = 11) -> np.ndarray:
    """Tiny seeded Lloyd's k-means on normalized vectors (driver-side,
    over a sample).  Deterministic: init = seeded choice of rows."""
    X = _normalize(np.asarray(X, dtype=np.float32))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)),
                     replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for ci in range(len(C)):
            members = X[assign == ci]
            if len(members):
                C[ci] = members.mean(axis=0)
        C = _normalize(C)
    return C


def _ckpt_path(d: str, name: str) -> str:
    import os
    return os.path.join(d, f"{name}.ckpt.json")


def _load_checkpoint(d: str, name: str, expect_meta: dict | None = None):
    """Iterative-trainer checkpoint: ``{iter, state, meta}`` JSON
    written atomically after every pass — a killed long job resumes at
    the last finished iteration instead of restarting (the sink's
    manifest-resume discipline applied to model state).

    ``expect_meta`` is the run's hyperparameters + input fingerprint;
    a checkpoint recorded under DIFFERENT meta refuses to load instead
    of silently continuing from mismatched state (ADVICE r4: kmeans
    resumed with a larger k used to return the smaller-k centroids)."""
    import json
    import os
    p = _ckpt_path(d, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        rec = json.load(f)
    if expect_meta is not None and rec.get("meta") != expect_meta:
        raise ValueError(
            f"checkpoint {name!r} in {d} was written for "
            f"{rec.get('meta')}, resume requested with {expect_meta}; "
            "wipe the checkpoint or rerun with the original "
            "parameters/input")
    return rec


def _save_checkpoint(d: str, name: str, record: dict) -> None:
    import json
    import os

    from ferenda_ray.state import manifest as mf
    os.makedirs(d, exist_ok=True)
    mf.atomic_write(_ckpt_path(d, name),
                    lambda tmp: open(tmp, "w").write(json.dumps(record)))


def kmeans_iterate(embeddings, k: int = 8, iters: int = 2,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   checkpoint_dir: str | None = None):
    """Distributed Lloyd's k-means — the scale path that
    :func:`kmeans_fit` (driver-side, over a sample) approximates.

    Broadcast-iterate: per iteration the k×d float64 centroid matrix
    is ``ray.put`` ONCE, each batch computes its assignment and emits
    at most k partial rows ``(cluster, sum-vector, count)``, a
    per-cluster ``groupby().map_groups`` merges the partials
    distributedly, and the driver reads back exactly ≤k rows to update
    the matrix — nothing corpus-sized ever rides the driver, and the
    exchange per iteration is O(batches·k·d) bytes regardless of N.
    Empty clusters keep their previous centroid.

    Determinism (what makes this oracle-checkable by unrolled SQL):
    init = the k vectors with the smallest ``id_col`` (one sort+limit;
    at 100 TB swap in :func:`kmeans_fit`'s seeded-sample init),
    distances are plain squared-euclidean in float64 over the
    float32-rounded inputs, ties break to the lowest cluster index
    (``np.argmin`` first-hit == SQL ``ORDER BY dist, cluster``).

    ``iters`` counts ASSIGNMENT passes: ``iters=2`` is assign → update
    → assign, matching a 2-level unrolled SQL oracle.  Returns
    ``(centroids ndarray, assignments Dataset (id_col, cluster))``.
    """
    import ray

    seed_rows = embeddings.sort(id_col).limit(k).take_all()  # k rows
    C = _as_matrix([r[vec_col] for r in seed_rows])

    def _d2(X: np.ndarray, C_: np.ndarray) -> np.ndarray:
        # explicit (x-c)² sums — same element-wise algorithm as the
        # oracle's list_distance, so ulp behavior stays comparable;
        # batch_size=4096 bounds the (n, k, d) tensor to a few MB
        return ((X[:, None, :] - C_[None, :, :]) ** 2).sum(axis=2)

    class _Partial:
        def __init__(self, ref):
            self.C = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            X = _col_matrix(b, vec_col)
            a = np.argmin(_d2(X, self.C), axis=1)
            cl, s, n = [], [], []
            for ci in np.unique(a):  # ≤ k iterations per batch
                m = X[a == ci]
                cl.append(int(ci))
                s.append(m.sum(axis=0).tolist())
                n.append(len(m))
            return pa.table({
                "cluster": pa.array(cl, pa.int64()),
                "s": pa.array(s, pa.list_(pa.float64())),
                "n": pa.array(n, pa.int64())})

    def _merge(g: pa.Table) -> pa.Table:
        S = _col_matrix(g, "s")
        return pa.table({
            "cluster": g.column("cluster").slice(0, 1),
            "s": pa.array([S.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "n": pa.array([int(g.column("n").to_numpy().sum())],
                          pa.int64())})

    start_pass = 0
    ck_meta = None
    if checkpoint_dir is not None:
        # hyperparameters + input fingerprint (row count, dims,
        # column): a resume under different k/input refuses to load
        ck_meta = {"k": k, "d": int(C.shape[1]), "vec_col": vec_col,
                   "n_rows": embeddings.count()}
        ck = _load_checkpoint(checkpoint_dir, "kmeans",
                              expect_meta=ck_meta)
        if ck is not None:
            start_pass = ck["iter"]
            C = np.asarray(ck["state"], dtype=C.dtype)
    for it in range(start_pass, max(iters - 1, 0)):
        partials = stateful_map(embeddings, _Partial, C,
                                batch_size=4096)
        merged = (partials.groupby("cluster")
                  .map_groups(_merge, batch_format="pyarrow"))
        for r in merged.take_all():  # ≤ k rows by construction
            C[r["cluster"]] = np.asarray(r["s"]) / r["n"]
        if checkpoint_dir is not None:
            _save_checkpoint(checkpoint_dir, "kmeans",
                             {"iter": it + 1, "state": C.tolist(),
                              "meta": ck_meta})

    class _Assign:
        def __init__(self, ref):
            self.C = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            X = _col_matrix(b, vec_col)
            a = np.argmin(_d2(X, self.C), axis=1).astype("int64")
            return pa.table({id_col: b.column(id_col),
                             "cluster": pa.array(a)})

    return C, stateful_map(embeddings, _Assign, C, batch_size=4096)


def ivf_assign(embeddings, centroids: np.ndarray,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """Add each vector's nearest-centroid ``cell`` column (the
    inverted-list key; at scale this is the partition/layout key,
    exactly like the LSH ``bucket``)."""
    class Assigner:
        def __init__(self, ref):
            self.C = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            V = _normalize(_col_matrix(b, vec_col, np.float32))
            cells = np.argmax(V @ self.C.T, axis=1).astype("int64")
            return b.append_column("cell", pa.array(cells))

    return stateful_map(embeddings, Assigner, centroids, batch_size=4096)


def ivf_topk(embeddings, queries, k: int = 10, n_centroids: int = 16,
             n_probe: int = 4, train_sample: int = 4096, seed: int = 11,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_ids: list | None = None, dtype=np.float32):
    """IVF approximate top-k: train a coarse quantizer on a
    deterministic sample, assign every vector to its cell, and scan
    only each query's ``n_probe`` nearest cells.  Same
    candidates→merge shape as :func:`lsh_topk`; recall grows with
    ``n_probe`` (``n_probe = n_centroids`` ⇒ exact)."""
    sample = embeddings.limit(train_sample).take_all()
    C = kmeans_fit(np.array([r[vec_col] for r in sample]),
                   n_centroids, seed=seed)
    coded = ivf_assign(embeddings, C, vec_col, id_col)

    # dtype float64 when exact results are required (full probe +
    # DuckDB float64 oracle); float32 for the approximate scale path
    Q = _normalize(_as_matrix(queries, dtype))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    qindex = {qid: i for i, qid in enumerate(qids)}
    probe_order = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]
    admissible: dict = {}
    for qi, cells in zip(qids, probe_order):
        for c in cells:
            admissible.setdefault(int(c), []).append(qi)

    class Scorer:
        def __init__(self, ref):
            self.admissible, self.qindex, self.Q = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            cells = b.column("cell").to_numpy(zero_copy_only=False)
            V = _normalize(_col_matrix(b, vec_col, dtype))
            qcol, icol, ccol = [], [], []
            for cell in set(cells.tolist()):
                qlist = self.admissible.get(int(cell))
                if not qlist:
                    continue
                mask = cells == cell
                Vm, idsm = V[mask], ids[mask]
                for qid in qlist:
                    s = Vm @ self.Q[self.qindex[qid]]
                    kk = min(k, len(s))
                    idx = np.argpartition(-s, kk - 1)[:kk] if kk else []
                    qcol.extend([qid] * len(idx))
                    icol.extend(int(idsm[j]) for j in idx)
                    ccol.extend(float(s[j]) for j in idx)
            return pa.table({"query_id": pa.array(qcol, pa.int64()),
                             id_col: pa.array(icol, pa.int64()),
                             "cosine": pa.array(ccol, pa.float64())})

    candidates = stateful_map(coded, Scorer, (admissible, qindex, Q),
                              batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")])
        g = g.slice(0, k)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return candidates.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Partition-pruned index layouts — the 100 TB path made REAL.
#
# The in-task bucket filters above still READ every block; at scale a
# top-k probe must touch only admissible partitions.  These builders
# persist the bucket/cell assignment as hive-partitioned parquet
# (one directory per bucket) and the probers construct the explicit
# admissible-path list before the read — I/O pruning at the file
# listing, not a post-read filter.

def build_lsh_index(embeddings, out_dir: str, n_planes: int = 8,
                    seed: int = 7, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Persist ``(id, vec, bucket)`` partitioned by bucket; planes are
    saved beside the data so probers recompute query codes.  Returns
    the planes."""
    import os
    coded, planes = bucket_codes(embeddings, n_planes, seed,
                                 vec_col, id_col)
    # duplicate the key: hive partitioning consumes `part_bucket`,
    # `bucket` stays a data column for the scorer
    coded = coded.map_batches(
        lambda b: b.append_column("part_bucket", b.column("bucket")),
        batch_format="pyarrow")
    coded.write_parquet(out_dir, partition_cols=["part_bucket"])
    np.save(os.path.join(out_dir, "_planes.npy"), planes)
    return planes


def _admissible_lsh_partitions(index_dir: str, queries, k, probe_hamming,
                               query_ids):
    """(paths, admissible, qindex, Q) for an LSH probe — the path list
    is the pruning evidence tests assert on."""
    import os
    planes = np.load(os.path.join(index_dir, "_planes.npy"))
    n_planes = planes.shape[0]
    Q = _normalize(_as_matrix(queries, np.float32))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    qcodes = ((Q @ planes.T) > 0) @ (1 << np.arange(n_planes))

    def neighbors(code: int) -> set:
        out, frontier = {code}, [code]
        for _ in range(probe_hamming):
            frontier = [c ^ (1 << b) for c in frontier
                        for b in range(n_planes)]
            out.update(frontier)
        return out

    admissible: dict = {}
    for qid, c in zip(qids, qcodes.astype(int)):
        for b in neighbors(int(c)):
            admissible.setdefault(b, []).append(qid)
    import glob as _glob
    dirs = [os.path.join(index_dir, f"part_bucket={b}")
            for b in sorted(admissible)
            if os.path.isdir(os.path.join(index_dir, f"part_bucket={b}"))]
    # expand to files: Ray's read_parquet wants file paths when given
    # an explicit list
    paths = [f for d in dirs
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    qindex = {qid: i for i, qid in enumerate(qids)}
    return paths, admissible, qindex, Q


def lsh_topk_pruned(index_dir: str, queries, k: int = 10,
                    probe_hamming: int = 1,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    query_ids: list | None = None):
    """Approximate top-k over a persisted LSH index: ONLY admissible
    ``part_bucket=`` directories are opened (same candidates→merge
    shape as :func:`lsh_topk`, same recall)."""
    import ray.data as rd
    paths, admissible, qindex, Q = _admissible_lsh_partitions(
        index_dir, queries, k, probe_hamming, query_ids)
    if not paths:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            id_col: pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64())}))
    ds = rd.read_parquet(paths, columns=[id_col, vec_col, "bucket"])

    class Scorer:
        def __init__(self, ref):
            self.admissible, self.qindex, self.Q = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            buckets = b.column("bucket").to_numpy(zero_copy_only=False)
            V = _normalize(_col_matrix(b, vec_col, np.float32))
            qcol, icol, ccol = [], [], []
            for bucket in set(buckets.tolist()):
                qlist = self.admissible.get(int(bucket))
                if not qlist:
                    continue
                mask = buckets == bucket
                Vm, idsm = V[mask], ids[mask]
                for qid in qlist:
                    s = Vm @ self.Q[self.qindex[qid]]
                    kk = min(k, len(s))
                    idx = np.argpartition(-s, kk - 1)[:kk] if kk else []
                    qcol.extend([qid] * len(idx))
                    icol.extend(int(idsm[j]) for j in idx)
                    ccol.extend(float(s[j]) for j in idx)
            return pa.table({"query_id": pa.array(qcol, pa.int64()),
                             id_col: pa.array(icol, pa.int64()),
                             "cosine": pa.array(ccol, pa.float64())})

    candidates = stateful_map(ds, Scorer, (admissible, qindex, Q),
                              batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")])
        g = g.slice(0, k)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return candidates.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def build_ivf_index(embeddings, out_dir: str, n_centroids: int = 16,
                    train_sample: int = 4096, seed: int = 11,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Persist ``(id, vec, cell)`` partitioned by cell + the trained
    centroids.  Returns the centroids."""
    import os
    sample = embeddings.limit(train_sample).take_all()
    C = kmeans_fit(np.array([r[vec_col] for r in sample]),
                   n_centroids, seed=seed)
    coded = ivf_assign(embeddings, C, vec_col, id_col)
    coded = coded.map_batches(
        lambda b: b.append_column("part_cell", b.column("cell")),
        batch_format="pyarrow")
    coded.write_parquet(out_dir, partition_cols=["part_cell"])
    np.save(os.path.join(out_dir, "_centroids.npy"), C)
    return C


def ivf_topk_pruned(index_dir: str, queries, k: int = 10,
                    n_probe: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    query_ids: list | None = None):
    """IVF top-k over a persisted index: only each query's ``n_probe``
    nearest ``part_cell=`` directories are opened."""
    import os
    import ray.data as rd
    C = np.load(os.path.join(index_dir, "_centroids.npy"))
    Q = _normalize(_as_matrix(queries, np.float32))
    qids = list(query_ids) if query_ids is not None else list(range(len(Q)))
    qindex = {qid: i for i, qid in enumerate(qids)}
    probe_order = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]
    admissible: dict = {}
    for qid, cells in zip(qids, probe_order):
        for c in cells:
            admissible.setdefault(int(c), []).append(qid)
    import glob as _glob
    dirs = [os.path.join(index_dir, f"part_cell={c}")
            for c in sorted(admissible)
            if os.path.isdir(os.path.join(index_dir, f"part_cell={c}"))]
    paths = [f for d in dirs
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    ds = rd.read_parquet(paths, columns=[id_col, vec_col, "cell"])

    class Scorer:
        def __init__(self, ref):
            self.admissible, self.qindex, self.Q = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            cells = b.column("cell").to_numpy(zero_copy_only=False)
            V = _normalize(_col_matrix(b, vec_col, np.float32))
            qcol, icol, ccol = [], [], []
            for cell in set(cells.tolist()):
                qlist = self.admissible.get(int(cell))
                if not qlist:
                    continue
                mask = cells == cell
                Vm, idsm = V[mask], ids[mask]
                for qid in qlist:
                    s = Vm @ self.Q[self.qindex[qid]]
                    kk = min(k, len(s))
                    idx = np.argpartition(-s, kk - 1)[:kk] if kk else []
                    qcol.extend([qid] * len(idx))
                    icol.extend(int(idsm[j]) for j in idx)
                    ccol.extend(float(s[j]) for j in idx)
            return pa.table({"query_id": pa.array(qcol, pa.int64()),
                             id_col: pa.array(icol, pa.int64()),
                             "cosine": pa.array(ccol, pa.float64())})

    candidates = stateful_map(ds, Scorer, (admissible, qindex, Q),
                              batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"), (id_col, "ascending")])
        g = g.slice(0, k)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return candidates.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def logreg_train(embeddings, iters: int = 2, lr: float = 0.5,
                 label_threshold: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 label_col: str = "label",
                 checkpoint_dir: str | None = None):
    """Distributed batch-gradient-descent logistic regression — the
    model-based quality-classifier shape (features → keep/cut score)
    trained in-engine, broadcast-iterate like :func:`kmeans_iterate`.

    Binary target ``y = 1 if label >= label_threshold``; features are
    the embedding plus a bias term; ``w`` starts at zero.  Per
    iteration the (d+1)-vector ``w`` is ``ray.put`` once, each batch
    emits ONE partial row ``(grad-sum vector, count)`` (float64
    matmul), and the driver folds the ≤batch-count partials into the
    update ``w -= lr * grad/N`` — nothing corpus-sized leaves the
    workers, exchange is O(batches·d) per pass.

    Determinism (oracle-checkable by unrolled SQL): zero init means
    iteration 1's gradient is ``(0.5 - y)·x`` exactly; fixed ``lr``
    and iteration count; float64 accumulation over float32-rounded
    inputs.  Returns the trained ``w`` (ndarray, bias LAST)."""
    import ray

    from ferenda_ray.stages.broadcast import resolve, stateful_map

    class _Grad:
        def __init__(self, ref):
            self.w = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            X = _col_matrix(b, vec_col)
            y = (b.column(label_col).to_numpy()
                 >= label_threshold).astype(np.float64)
            z = X @ self.w[:-1] + self.w[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            r = p - y
            g = np.concatenate((X.T @ r, [r.sum()]))
            return pa.table({
                "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                "n": pa.array([len(y)], pa.int64())})

    first = embeddings.take(1)
    if not first:   # ADVICE r4: fail clearly, not IndexError/÷0 later
        raise ValueError("logreg_train: input dataset is empty — need "
                         "at least one labeled row to train")
    d = len(first[0][vec_col])
    w = None
    start_iter = 0
    ck_meta = None
    if checkpoint_dir is not None:
        ck_meta = {"lr": lr, "label_threshold": label_threshold,
                   "d": d, "vec_col": vec_col,
                   "n_rows": embeddings.count()}
        ck = _load_checkpoint(checkpoint_dir, "logreg",
                              expect_meta=ck_meta)
        if ck is not None:
            start_iter = ck["iter"]
            w = np.asarray(ck["state"], dtype=np.float64)
    for it in range(start_iter, iters):
        if w is None:
            w = np.zeros(d + 1, dtype=np.float64)
        parts = stateful_map(
            embeddings.select_columns([id_col, vec_col, label_col]),
            _Grad, w, batch_size=4096).take_all()  # ≤ batch count rows
        G = np.zeros_like(w)
        N = 0
        for r in parts:
            G += np.asarray(r["g"])
            N += r["n"]
        w = w - lr * G / N
        if checkpoint_dir is not None:
            _save_checkpoint(checkpoint_dir, "logreg",
                             {"iter": it + 1, "state": w.tolist(),
                              "meta": ck_meta})
    return w


def quantize_embeddings(embeddings, vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Symmetric per-vector int8 quantization — the ANN storage path
    (4× smaller than float32, 8× than float64; scan kernels matmul
    int8 and rescale).  ``scale = max|x| / 127`` per vector,
    ``q = round_half_away(x / scale)`` (DuckDB ``round`` semantics,
    NOT numpy's half-even), zero vectors get scale 0 / all-zero q.
    Returns ``(vec_id, scale float64, qvec list<int8>)`` — fully
    vectorized over the batch matrix."""
    def quant(b: pa.Table) -> pa.Table:
        X = _col_matrix(b, vec_col)
        ma = np.abs(X).max(axis=1)
        scale = np.where(ma > 0, ma / 127.0, 1.0)
        r = X / scale[:, None]
        q = (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int8)
        out_scale = np.where(ma > 0, ma / 127.0, 0.0)
        return pa.table({
            id_col: b.column(id_col),
            "scale": pa.array(out_scale, pa.float64()),
            "qvec": pa.array([row.tolist() for row in q],
                             pa.list_(pa.int8()))})

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        quant, batch_format="pyarrow", batch_size=4096)


def brute_topk_int8(quantized, queries, k: int = 10,
                    id_col: str = "vec_id",
                    query_ids: list | None = None):
    """Approximate cosine top-k over :func:`quantize_embeddings`
    output — the memory-bound scan path: the batch matmul runs on the
    int8 codes (promoted to int32 accumulation) and rescales by the
    per-vector scale afterwards, touching 4× fewer bytes than
    float32.  Recall vs the float path is measured in tests (int8
    keeps ~2-3 significant digits of cosine; rank inversions happen
    only between near-ties)."""
    Qf = _as_matrix(queries)
    qn = np.linalg.norm(Qf, axis=1, keepdims=True)
    Q = Qf / np.where(qn > 0, qn, 1.0)
    qids = list(query_ids) if query_ids is not None \
        else list(range(len(Q)))

    from ferenda_ray.stages.broadcast import resolve, stateful_map

    class Scorer:
        def __init__(self, ref):
            self.qids, self.Q = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            qv = b.column("qvec").combine_chunks()
            n, d = len(qv), len(self.Q[0])
            X8 = np.asarray(qv.values, dtype=np.int8).reshape(n, d)
            scale = b.column("scale").to_numpy()
            # dot in int-friendly space: (q · x8) * scale; then
            # normalize by the dequantized vector norm
            S = (self.Q @ X8.T.astype(np.float32)) * scale[None, :]
            norms = np.linalg.norm(
                X8.astype(np.float32), axis=1) * scale
            S = S / np.where(norms > 0, norms, 1.0)[None, :]
            qcol, icol, ccol = [], [], []
            kk = min(k, S.shape[1])
            for qi in range(S.shape[0]):
                idx = np.argpartition(-S[qi], kk - 1)[:kk]
                qcol.extend([self.qids[qi]] * len(idx))
                icol.extend(int(ids[j]) for j in idx)
                ccol.extend(float(S[qi, j]) for j in idx)
            return pa.table({"query_id": pa.array(qcol, pa.int64()),
                             id_col: pa.array(icol, pa.int64()),
                             "cosine": pa.array(ccol, pa.float64())})

    candidates = stateful_map(quantized, Scorer, (qids, Q),
                              batch_size=4096)

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("cosine", "descending"),
                           (id_col, "ascending")])
        g = g.slice(0, k)
        return g.append_column(
            "rank", pa.array(range(1, g.num_rows + 1), pa.int64()))

    return candidates.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")


def logreg_score(embeddings, w: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Apply trained :func:`logreg_train` weights distributed:
    per-batch float64 matmul against the broadcast ``w`` (bias last),
    emitting ``(id, score)`` sigmoid probabilities — the classifier
    side of model-based corpus filtering (keep rows with score ≥ the
    operating threshold)."""
    from ferenda_ray.stages.broadcast import resolve, stateful_map

    class Scorer:
        def __init__(self, ref):
            self.w = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            X = _col_matrix(b, vec_col)
            z = X @ self.w[:-1] + self.w[-1]
            p = 1.0 / (1.0 + np.exp(-z))
            return pa.table({id_col: b.column(id_col),
                             "score": pa.array(p, pa.float64())})

    return stateful_map(
        embeddings.select_columns([id_col, vec_col]), Scorer,
        np.asarray(w, dtype=np.float64), batch_size=4096)


# ---------------------------------------------------------------------------
# distributed covariance + PCA (feature analysis over the embedding
# column: whitening/decorrelation prep, dead-dimension detection)

def _cov_sums(embeddings, vec_col: str = "embedding"):
    """Distributed second-moment sums: per batch ONE partial
    (n, Σx, ΣxᵀX) flattened to keyed rows, reduced by a single
    vectorized ``groupby(key).sum`` — d(d+1)/2 + d + 1 rows per
    batch travel, never the vectors.  Returns (n, sx[d], sxy[d,d
    upper]) on the driver (size O(d²), independent of corpus)."""
    from ray.data.aggregate import Sum as _Sum

    def partials(b: pa.Table) -> pa.Table:
        X = _col_matrix(b, vec_col)          # float64
        d = X.shape[1]
        iu, ju = np.triu_indices(d)
        sxy = (X.T @ X)[iu, ju]
        sx = X.sum(axis=0)
        # key layout: (i+1)*(d+1) + (j+1); n -> key 0; Σx_i -> j=-1
        keys = np.concatenate((
            [0],
            (np.arange(d) + 1) * (d + 1),
            (iu + 1) * (d + 1) + (ju + 1)))
        vals = np.concatenate(([float(len(X))], sx, sxy))
        return pa.table({"__k": pa.array(keys, pa.int64()),
                         "v": pa.array(vals, pa.float64())})

    rows = (embeddings.select_columns([vec_col])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("__k").aggregate(_Sum("v", alias_name="v"))
            .take_all())
    return {r["__k"]: r["v"] for r in rows}


def covariance_from_sums(kv: dict, d: int):
    """(n, Σx, Σxy) dict (``_cov_sums`` layout) → (d, d) population
    covariance matrix."""
    n = kv[0]
    sx = np.array([kv[(i + 1) * (d + 1)] for i in range(d)])
    cov = np.zeros((d, d))
    iu, ju = np.triu_indices(d)
    vals = np.array([kv[(i + 1) * (d + 1) + (j + 1)]
                     for i, j in zip(iu, ju)])
    cov[iu, ju] = vals / n - (sx[iu] / n) * (sx[ju] / n)
    cov[ju, iu] = cov[iu, ju]
    return cov


def embedding_covariance(embeddings, vec_col: str = "embedding",
                         digits: int = 6):
    """Upper-triangle population covariance of the embedding columns
    as ``(i, j, cov)`` rows — the oracle-checkable exact twin of the
    PCA below (which is a deterministic driver-side function of this
    matrix)."""
    dim = _embedding_dim(embeddings, vec_col)
    kv = _cov_sums(embeddings, vec_col)
    cov = covariance_from_sums(kv, dim)
    iu, ju = np.triu_indices(dim)
    return pa.table({
        "i": pa.array(iu.astype(np.int64), pa.int64()),
        "j": pa.array(ju.astype(np.int64), pa.int64()),
        "cov": pa.array(np.round(cov[iu, ju], digits), pa.float64())})


def _embedding_dim(embeddings, vec_col: str) -> int:
    first = embeddings.select_columns([vec_col]).limit(1).take_all()
    return len(first[0][vec_col])


def pca_components(embeddings, k: int = 4, vec_col: str = "embedding"):
    """Top-k principal components via the distributed covariance sums
    + driver-side ``eigh`` of the tiny (d, d) matrix (d ≪ corpus; the
    heavy pass is the same one ``embedding_covariance`` ships).  Signs
    are fixed deterministically (largest-|entry| coordinate positive).
    Returns ``(component, dim, value, explained_var)`` rows."""
    dim = _embedding_dim(embeddings, vec_col)
    kv = _cov_sums(embeddings, vec_col)
    cov = covariance_from_sums(kv, dim)
    w, v = np.linalg.eigh(cov)           # ascending
    order = np.argsort(w)[::-1][:k]
    total = float(w.sum()) or 1.0
    comps, dims, vals, ev = [], [], [], []
    for c, idx in enumerate(order):
        vec = v[:, idx]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        comps.extend([c] * dim)
        dims.extend(range(dim))
        vals.extend(np.round(vec, 6))
        ev.extend([round(float(w[idx] / total), 6)] * dim)
    return pa.table({"component": pa.array(comps, pa.int64()),
                     "dim": pa.array(dims, pa.int64()),
                     "value": pa.array(vals, pa.float64()),
                     "explained_var": pa.array(ev, pa.float64())})


def semdedup(embeddings, k: int = 4, iters: int = 2,
             eps: float = 0.95, vec_col: str = "embedding",
             id_col: str = "vec_id", shards: int | None = None):
    """SemDeDup (Abbas et al. 2023): semantic dedup by k-means
    bucketing + within-cluster cosine pruning — drop a vector iff a
    LOWER-id member of its cluster has cosine ≥ ``eps`` with it (the
    deterministic keep-first variant of the paper's per-pair policy).
    Returns ``(vec_id, cluster, keep)``.

    This is also the embedding near-dup SCALE shape: pairs are only
    computed WITHIN clusters (choose k ≈ N/⟨cluster size⟩ so the
    per-cluster n² stays bounded), unlike the all-pairs
    ``dedup.embedding_neardup_pairs`` baseline.  The cluster pass is
    :func:`kmeans_iterate` (deterministic smallest-id init, so the
    whole composition stays oracle-checkable by unrolled SQL);
    clusters shuffle ONCE keyed by ``cluster % shards`` and each
    shard handles its clusters in one task (numpy segmentation, one
    matmul per cluster — no per-cluster Ray task).

    Cosines are rounded (half-away, 6 digits) BEFORE the ≥ eps
    compare on both the numpy and SQL sides, so a summation-order ulp
    cannot flip a drop decision."""
    from ferenda_ray.cluster import (cluster_cpus, coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    C, assigns = kmeans_iterate(embeddings, k=k, iters=iters,
                                vec_col=vec_col, id_col=id_col)
    dim = C.shape[1]
    shards = shards or min(k, cluster_cpus() * 2)

    # pack the vector into one fixed-size binary value: Arrow's hash
    # join cannot carry list payload columns (the minhash sig-join
    # packing, dedup.py)
    def pack(b: pa.Table) -> pa.Table:
        X = _col_matrix(b, vec_col).astype("<f8")
        buf = pa.py_buffer(np.ascontiguousarray(X).tobytes())
        fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(dim * 8), b.num_rows, [None, buf])
        return pa.table({id_col: b.column(id_col), "__vec": fsb})

    vecs = embeddings.map_batches(pack, batch_format="pyarrow")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        assigns, vecs = assigns.repartition(co), vecs.repartition(co)
    j = assigns.join(vecs, join_type="inner", on=(id_col,),
                     num_partitions=np_)
    j = j.map_batches(
        lambda b: b.append_column(
            "__shard", pc.cast(
                pc.subtract(b.column("cluster"),
                            pc.multiply(pc.divide(b.column("cluster"),
                                                  pa.scalar(shards,
                                                            pa.int64())),
                                        pa.scalar(shards, pa.int64()))),
                pa.int64())),
        batch_format="pyarrow")

    def prune(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        cl = group.column("cluster").to_numpy()
        order = np.lexsort((ids, cl))
        ids, cl = ids[order], cl[order]
        raw = b"".join(m.as_py() for m in
                       group.column("__vec").combine_chunks())
        X = np.frombuffer(raw, dtype="<f8").reshape(len(ids), dim)[order]
        Xn = _normalize(X)
        keep = np.ones(len(ids), dtype=bool)
        bounds = np.flatnonzero(np.diff(cl)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(cl)]))
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            G = Xn[s:e] @ Xn[s:e].T
            G6 = np.floor(np.abs(G) * 1e6 + 0.5) / 1e6 * np.sign(G)
            hit = np.triu(G6 >= eps, k=1).any(axis=0)
            keep[s:e] = ~hit
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(cl, pa.int64()),
            "keep": pa.array(keep, pa.bool_())})

    return j.groupby("__shard").map_groups(prune,
                                           batch_format="pyarrow")


def group_mean_embedding(pairs, embeddings, group_col: str = "alias",
                         id_col: str = "doc_id",
                         vec_id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         round_digits: int = 4):
    """Per-group MEAN embedding — the "entity embedding from the
    documents that mention it" aggregate (the KG × vector-table
    composition behind entity retrieval / linking seeds).

    Distributed shape: one hash join ``pairs.id → embeddings.vec_id``
    (both sides corpus-row-sized, never the matrix broadcast), then a
    per-batch partial vector sum (one ``np.add.at`` per batch) so the
    groupby exchange moves ≤ groups × dims tiny rows per batch, never
    raw vectors; final mean + round-half-away(``round_digits``).
    Output is EXPLODED ``(group, n_docs, dim, value)`` rows so a SQL
    oracle can compare exactly (list columns stringify differently
    across engines; rows don't)."""
    from ray.data.aggregate import Sum

    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    def _empty_result():
        import ray.data as rd
        return rd.from_arrow(pa.table({
            group_col: pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64())}))

    first = embeddings.take(1)
    if not first:                       # empty vector side: nothing
        return _empty_result()          # can join (and pack() cannot
    dim = len(first[0][vec_col])        # infer a width from 0 rows)
    typ = pa.binary(8 * dim)

    # Ray 2.49's hash join rejects list<float> payload columns
    # ("not supported in join non-key field") — pack each vector to
    # fixed-size binary for the exchange, unpack in the partial
    def pack(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:             # _col_matrix can't reshape 0
            return pa.table({vec_id_col: b.column(vec_id_col),
                             "__vec": pa.array([], typ)})
        M = _col_matrix(b, vec_col)                # float64 upcast
        arr = pa.Array.from_buffers(
            typ, M.shape[0],
            [None, pa.py_buffer(np.ascontiguousarray(M, "<f8")
                                .tobytes())])
        return pa.table({vec_id_col: b.column(vec_id_col),
                         "__vec": arr})

    packed = embeddings.map_batches(pack, batch_format="pyarrow")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        pairs = pairs.repartition(co)
        packed = packed.repartition(co)
        # an ALL-empty join side still trips Ray 2.49's key-field
        # lookup even after the repartition workaround
        if pairs.count() == 0:
            return _empty_result()
    j = pairs.join(packed, join_type="inner",
                   num_partitions=np_,
                   on=(id_col,), right_on=(vec_id_col,))

    def partial(b: pa.Table) -> pa.Table:
        groups = b.column(group_col).to_pylist()
        col = b.column("__vec").combine_chunks()
        width = col.type.byte_width
        if not groups:
            return pa.table({
                group_col: pa.array([], pa.string()),
                "dim": pa.array([], pa.int64()),
                "__sum": pa.array([], pa.float64()),
                "__cnt": pa.array([], pa.int64())})
        M = np.frombuffer(b"".join(col.to_pylist()),
                          "<f8").reshape(-1, width // 8)
        uniq = sorted(set(groups))
        idx = {g: i for i, g in enumerate(uniq)}
        rows = np.fromiter((idx[g] for g in groups), np.int64,
                           count=len(groups))
        sums = np.zeros((len(uniq), M.shape[1]), np.float64)
        np.add.at(sums, rows, M)
        cnt = np.bincount(rows, minlength=len(uniq))
        d = M.shape[1]
        return pa.table({
            group_col: pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1), len(uniq)),
                            pa.int64()),
            "__sum": pa.array(sums.ravel(), pa.float64()),
            "__cnt": pa.array(np.repeat(cnt, d), pa.int64())})

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby([group_col, "dim"])
           .aggregate(Sum("__sum", alias_name="__s"),
                      Sum("__cnt", alias_name="__n")))

    def mean(b: pa.Table) -> pa.Table:
        s = b.column("__s").to_numpy()
        n = np.maximum(b.column("__n").to_numpy(), 1)
        v = s / n
        p = 10.0 ** round_digits
        v = np.floor(np.abs(v) * p + 0.5) / p * np.sign(v)
        return pa.table({
            group_col: b.column(group_col),
            "n_docs": pa.array(b.column("__n").to_numpy(), pa.int64()),
            "dim": b.column("dim"),
            "value": pa.array(v, pa.float64())})

    return agg.map_batches(mean, batch_format="pyarrow")
