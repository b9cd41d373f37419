"""Similarity search: brute-force top-k exactness, LSH top-k recall."""

import numpy as np
import pyarrow as pa
import pytest

from ferenda_ray.stages import similarity as sim


@pytest.fixture(scope="module")
def emb(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(11)
    V = rng.standard_normal((200, 32)).astype(np.float32)
    t = pa.table({"vec_id": list(range(200)),
                  "embedding": [v.tolist() for v in V]})
    return rd.from_arrow(t).materialize(), V


def _brute_numpy(V, Q, k):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Vn.T
    out = {}
    for qi in range(len(Q)):
        order = sorted(range(V.shape[0]), key=lambda j: (-S[qi, j], j))
        out[qi] = [(j, S[qi, j]) for j in order[:k]]
    return out


def test_brute_topk_exact(emb):
    ds, V = emb
    Q = V[[5, 17]] + 0.001
    got = {}
    for r in sim.brute_topk(ds, Q, k=7).take_all():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cosine"]))
    exp = _brute_numpy(V, Q, 7)
    for qi in (0, 1):
        ranked = [v for _, v, _ in sorted(got[qi])]
        assert ranked == [j for j, _ in exp[qi]]
        # the query's own vector is its top hit
        assert ranked[0] == (5 if qi == 0 else 17)
        for (rank, vid, cos), (j, s) in zip(sorted(got[qi]), exp[qi]):
            assert abs(cos - s) < 1e-5


def test_lsh_topk_recall(emb):
    ds, V = emb
    Q = V[[3, 50, 99]]
    exact = _brute_numpy(V, Q, 10)
    got = {}
    for r in sim.lsh_topk(ds, Q, k=10, n_planes=6,
                          probe_hamming=2).take_all():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = []
    for qi in exact:
        exp_ids = {j for j, _ in exact[qi]}
        recalls.append(len(got.get(qi, set()) & exp_ids) / 10)
    # probing 2 bits of 6 planes: decent recall, and always finds self
    assert sum(recalls) / len(recalls) >= 0.5
    for qi, own in zip(range(3), (3, 50, 99)):
        assert own in got[qi]


def test_bucket_codes_deterministic(emb):
    ds, V = emb
    ds1, planes1 = sim.bucket_codes(ds, n_planes=5, seed=9)
    ds2, planes2 = sim.bucket_codes(ds, n_planes=5, seed=9)
    assert np.allclose(planes1, planes2)
    c1 = {r["vec_id"]: r["bucket"] for r in ds1.take_all()}
    c2 = {r["vec_id"]: r["bucket"] for r in ds2.take_all()}
    assert c1 == c2
    assert set(c1.values()) <= set(range(32))


def test_ivf_topk_recall_and_exact_at_full_probe(emb):
    import numpy as np
    from ferenda_ray.stages.similarity import brute_topk, ivf_topk
    ds, V = emb
    Q = V[:3].copy()
    exact = {}
    for r in brute_topk(ds, Q, k=10, query_ids=[0, 1, 2]).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    # partial probe: bounded scan, decent recall, always finds self
    got = {}
    rows = ivf_topk(ds, Q, k=10, n_centroids=8, n_probe=3,
                    query_ids=[0, 1, 2]).take_all()
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(got.get(qi, set()) & exact[qi]) / 10 for qi in (0, 1, 2)]
    assert sum(recalls) / 3 >= 0.5
    assert all(qi in got[qi] for qi in (0, 1, 2))
    # full probe == exact
    rows = ivf_topk(ds, Q, k=10, n_centroids=8, n_probe=8,
                    query_ids=[0, 1, 2]).take_all()
    full = {}
    for r in rows:
        full.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert full == exact


def test_kmeans_deterministic():
    import numpy as np
    from ferenda_ray.stages.similarity import kmeans_fit
    rng = np.random.default_rng(0)
    X = rng.standard_normal((200, 16)).astype("float32")
    C1 = kmeans_fit(X, 8, seed=11)
    C2 = kmeans_fit(X, 8, seed=11)
    assert np.allclose(C1, C2)


def test_lsh_pruned_index(emb, tmp_path):
    """Persisted LSH index: probe opens only admissible partitions,
    results identical to the in-task lsh_topk at matched params."""
    import os
    ds, V = emb
    idx = str(tmp_path / "lsh_idx")
    sim.build_lsh_index(ds, idx, n_planes=6, seed=7)
    all_parts = {d for d in os.listdir(idx) if d.startswith("part_bucket=")}
    assert len(all_parts) > 4  # data spread over many buckets
    Q = V[[3, 50]]
    paths, admissible, _, _ = sim._admissible_lsh_partitions(
        idx, Q, 10, 1, None)
    probed = {os.path.basename(os.path.dirname(p)) for p in paths}
    # PRUNING: the probe's file listing is a strict subset
    assert probed and probed < all_parts
    got_pruned = {}
    for r in sim.lsh_topk_pruned(idx, Q, k=10, probe_hamming=1).take_all():
        got_pruned.setdefault(r["query_id"], set()).add(r["vec_id"])
    got_full = {}
    for r in sim.lsh_topk(ds, Q, k=10, n_planes=6, seed=7,
                          probe_hamming=1).take_all():
        got_full.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert got_pruned == got_full


def test_ivf_pruned_index(emb, tmp_path):
    """Persisted IVF index: only n_probe cells opened; full probe over
    the index reproduces exact brute-force top-k ids."""
    import os
    ds, V = emb
    idx = str(tmp_path / "ivf_idx")
    sim.build_ivf_index(ds, idx, n_centroids=8, seed=11)
    all_parts = {d for d in os.listdir(idx) if d.startswith("part_cell=")}
    assert len(all_parts) >= 4
    Q = V[[7, 120]]
    # pruned probe: opens n_probe=2 cells per query at most
    got = {}
    for r in sim.ivf_topk_pruned(idx, Q, k=10, n_probe=2).take_all():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # self-hit always lands in the query's own (nearest) cell
    assert 7 in got[0] and 120 in got[1]
    # full probe == exact
    exact = _brute_numpy(V, Q, 10)
    got_full = {}
    for r in sim.ivf_topk_pruned(idx, Q, k=10, n_probe=8).take_all():
        got_full.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qi in exact:
        assert got_full[qi] == {j for j, _ in exact[qi]}


# ---------------------------------------------------------------------------
# int8 quantization


def test_quantize_embeddings_reconstruction(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.similarity import quantize_embeddings
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 16))
    X[7] = 0.0                                  # zero vector
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64()))}))
    rows = {r["vec_id"]: r for r in quantize_embeddings(ds).take_all()}
    for i in range(50):
        q = np.asarray(rows[i]["qvec"], dtype=np.int64)
        s = rows[i]["scale"]
        assert q.min() >= -127 and q.max() <= 127
        if i == 7:
            assert s == 0.0 and not q.any()
            continue
        # dequantized error bounded by half a quantization step
        assert np.abs(q * s - X[i]).max() <= s / 2 + 1e-12
        # the max-magnitude element hits ±127 exactly
        assert np.abs(q).max() == 127


def test_int8_topk_recall_vs_float(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.similarity import (brute_topk,
                                               brute_topk_int8,
                                               quantize_embeddings)
    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 32))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64()))})).materialize()
    Q = X[:3]
    exact = {}
    for r in brute_topk(ds, Q, k=10, query_ids=[0, 1, 2]).take_all():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    qds = quantize_embeddings(ds).materialize()
    got = {}
    for r in brute_topk_int8(qds, Q, k=10,
                             query_ids=[0, 1, 2]).take_all():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # int8 keeps ~2-3 digits of cosine: top-10 recall stays high and
    # the self-match (cos=1) is always rank-1 material
    for q in (0, 1, 2):
        assert len(exact[q] & got[q]) >= 8
        assert q in got[q]


def test_covariance_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd
    from ferenda_ray.stages.similarity import embedding_covariance
    rng = np.random.default_rng(3)
    X = rng.normal(size=(300, 5)).astype(np.float32)
    ds = rd.from_items([{"embedding": r.tolist()} for r in X])
    got = embedding_covariance(ds.repartition(7)).to_pandas()
    C = np.cov(np.asarray(X, np.float64), rowvar=False, bias=True)
    for r in got.itertuples(index=False):
        assert abs(r.cov - round(C[r.i, r.j], 6)) < 2e-6, (r.i, r.j)
    assert len(got) == 5 * 6 // 2


def test_pca_components_match_eigh(ray_session):
    import numpy as np
    import ray.data as rd
    from ferenda_ray.stages.similarity import pca_components
    rng = np.random.default_rng(11)
    # anisotropic data so eigenvalues are well separated
    X = rng.normal(size=(400, 6)) * np.array([5, 3, 2, 1, 0.5, 0.1])
    ds = rd.from_items([{"embedding": r.tolist()} for r in X])
    got = pca_components(ds.repartition(5), k=3).to_pandas()
    C = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    for c in range(3):
        vec = v[:, order[c]]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        mine = got[got.component == c].sort_values("dim").value.values
        assert np.allclose(mine, vec, atol=1e-5), c
        ev = got[got.component == c].explained_var.iloc[0]
        assert abs(ev - w[order[c]] / w.sum()) < 1e-5


def test_semdedup_matches_bruteforce(ray_session):
    """SemDeDup keep set == numpy brute force over the SAME kmeans
    assignment (keep-first within cluster at rounded cosine >= eps);
    planted duplicates are dropped, their lowest id kept."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.similarity import kmeans_iterate, semdedup
    rng = np.random.default_rng(3)
    V = rng.standard_normal((60, 8))
    V[30] = V[4]                       # exact dup
    V[31] = V[4] + 0.001 * rng.standard_normal(8)   # near dup
    V[45] = -V[4]                      # anti-correlated: NOT a dup
    t = pa.table({"vec_id": list(range(60)),
                  "embedding": [v.tolist() for v in V]})
    ds = rd.from_arrow(t).materialize()
    eps = 0.95
    got = {r["vec_id"]: (r["cluster"], r["keep"])
           for r in semdedup(ds, k=4, iters=2, eps=eps).take_all()}
    _, assigns = kmeans_iterate(ds, k=4, iters=2)
    cl = {r["vec_id"]: r["cluster"] for r in assigns.take_all()}
    Xn = V / np.linalg.norm(V, axis=1, keepdims=True)
    for v in range(60):
        G = Xn[v] @ Xn.T
        g6 = np.floor(np.abs(G) * 1e6 + 0.5) / 1e6 * np.sign(G)
        want_keep = not any(
            cl[u] == cl[v] and g6[u] >= eps for u in range(v))
        assert got[v] == (cl[v], want_keep), v
    assert not got[30][1] and not got[31][1]   # dups dropped
    assert got[4][1]                           # lowest id kept
    # anti-correlated vector survives even if co-clustered
    assert got[45][1]


def test_knn_graph_plans_identical(ray_session):
    """Broadcast and block-pair plans must produce the same graph,
    self always excluded, ranks contiguous from 1."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.similarity import knn_graph

    rng = np.random.default_rng(11)
    n, d = 40, 8
    emb = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([rng.normal(size=d).tolist()
                               for _ in range(n)],
                              pa.list_(pa.float64()))})
    ds = rd.from_arrow(emb).repartition(5)

    def canon(out):
        return sorted((r["vec_id"], r["rank"], r["neighbor_id"],
                       round(r["cosine"], 9)) for r in out.take_all())

    a = canon(knn_graph(ds, k=3))
    b = canon(knn_graph(ds, k=3, broadcast_bytes=0))
    assert a == b
    assert len(a) == n * 3
    per = {}
    for vid, rank, nb, _ in a:
        assert nb != vid
        per.setdefault(vid, []).append(rank)
    assert all(sorted(v) == [1, 2, 3] for v in per.values())


def test_knn_graph_block_plan_handles_empty_blocks(ray_session):
    """Repartition can leave zero-row blocks; the block-pair plan
    must skip them instead of crashing in _norm_block (found by
    review: _col_matrix on an empty table raises)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.similarity import knn_graph

    rng = np.random.default_rng(3)
    emb = pa.table({
        "vec_id": pa.array(range(3), pa.int64()),
        "embedding": pa.array([rng.normal(size=4).tolist()
                               for _ in range(3)],
                              pa.list_(pa.float64()))})
    ds = rd.from_arrow(emb).repartition(8)   # most blocks empty
    a = sorted((r["vec_id"], r["rank"], r["neighbor_id"])
               for r in knn_graph(ds, k=2, broadcast_bytes=0)
               .take_all())
    b = sorted((r["vec_id"], r["rank"], r["neighbor_id"])
               for r in knn_graph(ds, k=2).take_all())
    assert a == b and len(a) == 6


def test_group_mean_embedding_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.similarity import group_mean_embedding

    rng = np.random.default_rng(7)
    V = rng.normal(size=(6, 4))
    emb = rd.from_arrow(pa.table({
        "vec_id": list(range(6)),
        "embedding": [list(map(float, v)) for v in V]}))
    pairs = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 0, 3, 9],       # 9 has no embedding row
        "alias": ["a", "a", "a", "b", "b", "b"]}))
    got = {(r["alias"], r["dim"]): (r["value"], r["n_docs"])
           for r in group_mean_embedding(pairs, emb).take_all()}
    assert len(got) == 8                     # 2 aliases x 4 dims
    for alias, rows in [("a", [0, 1, 2]), ("b", [0, 3])]:
        m = V[rows].mean(axis=0)
        for d in range(4):
            v, n = got[(alias, d + 1)]
            assert n == len(rows)
            assert abs(v - m[d]) < 1e-4


def test_group_mean_embedding_empty_pairs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.similarity import group_mean_embedding

    emb = rd.from_arrow(pa.table({
        "vec_id": [1], "embedding": [[1.0, 2.0]]}))
    pairs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "alias": pa.array([], pa.string())}))
    assert group_mean_embedding(pairs, emb).count() == 0


def test_entity_cooccurrence_pmi(ray_session, tmp_path):
    """Hand-built corpus with known joint/marginal counts."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.docs import entity_cooccurrence

    texts = ["batch spark", "batch spark", "batch", "spark",
             "vector", "plain"]
    pq.write_table(pa.table({
        "doc_id": list(range(6)), "text": texts}),
        str(tmp_path / "documents.parquet"))
    rows = {(r["alias_a"], r["alias_b"]): r
            for r in entity_cooccurrence(
                str(tmp_path), aliases=["batch", "spark", "vector"])
            .take_all()}
    # batch: 3 docs, spark: 3, vector: 1, N=6; joint batch&spark = 2
    assert set(rows) == {("batch", "spark")}   # other pairs n=0
    r = rows[("batch", "spark")]
    assert r["n_docs"] == 2
    assert abs(r["pmi"] - round(math.log(6 * 2 / (3 * 3)), 6)) < 1e-9


def test_group_mean_embedding_empty_embeddings(ray_session):
    """An empty VECTOR side returns empty instead of crashing the
    join (review regression)."""
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.similarity import group_mean_embedding

    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    pairs = rd.from_arrow(pa.table({
        "doc_id": [1], "alias": ["a"]}))
    assert group_mean_embedding(pairs, emb).count() == 0
