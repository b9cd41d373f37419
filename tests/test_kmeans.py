"""Distributed k-means (stages/similarity.kmeans_iterate): identical
to a driver-side numpy reference of the same fixed-iteration Lloyd's,
deterministic across runs, and safe when a cluster empties.  The
oracle-level check (Ray vs unrolled DuckDB SQL on the embeddings
table) rides the past-window harness in test_query_oracles.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _numpy_kmeans(X: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Reference: same init (k smallest ids), same tie-break
    (np.argmin first-hit), same iteration count."""
    order = np.argsort(ids)
    C = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters - 1):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for ci in range(k):
            m = X[a == ci]
            if len(m):
                C[ci] = m.mean(axis=0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return C, np.argmin(d2, axis=1)


def _emb_table(X: np.ndarray, ids: np.ndarray) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in X],
                              pa.list_(pa.float32())),
    })


@pytest.fixture()
def random_emb():
    rng = np.random.default_rng(42)
    X = rng.normal(size=(300, 16)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64)
    return X, ids


def test_matches_numpy_reference(ray_session, random_emb):
    import ray.data as rd

    from ferenda_ray.stages.similarity import kmeans_iterate
    X, ids = random_emb
    ds = rd.from_arrow(_emb_table(X, ids)).repartition(5)
    C, assigns = kmeans_iterate(ds, k=5, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in assigns.take_all()}
    C_ref, a_ref = _numpy_kmeans(X.astype(np.float64), ids, k=5, iters=3)
    assert np.allclose(C, C_ref, rtol=0, atol=1e-9)
    assert got == {int(i): int(a) for i, a in zip(ids, a_ref)}


def test_deterministic_across_runs(ray_session, random_emb):
    import ray.data as rd

    from ferenda_ray.stages.similarity import kmeans_iterate
    X, ids = random_emb
    outs = []
    for _ in range(2):
        ds = rd.from_arrow(_emb_table(X, ids)).repartition(7)
        _, assigns = kmeans_iterate(ds, k=4, iters=2)
        outs.append(sorted((r["vec_id"], r["cluster"])
                           for r in assigns.take_all()))
    assert outs[0] == outs[1]


def test_empty_cluster_keeps_centroid(ray_session):
    """Seed 1 is an exact duplicate of seed 0, so the (dist, cluster)
    tie-break starves cluster 1 of members in every assignment pass —
    a GUARANTEED empty cluster.  Its centroid must survive unchanged
    (no NaN) and the final assignment must stay total and equal to
    the numpy reference."""
    import ray.data as rd

    from ferenda_ray.stages.similarity import kmeans_iterate
    rng = np.random.default_rng(7)
    A = rng.normal(0.0, 0.01, size=(40, 4))
    B = rng.normal(10.0, 0.01, size=(40, 4))
    X = np.vstack([A, B]).astype(np.float32)
    X[1] = X[0]  # duplicate seed → cluster 1 empties by tie-break
    ids = np.arange(80, dtype=np.int64)
    ds = rd.from_arrow(_emb_table(X, ids)).repartition(3)
    C, assigns = kmeans_iterate(ds, k=3, iters=4)
    rows = assigns.take_all()
    assert len(rows) == 80
    assert not np.isnan(C).any()
    C_ref, a_ref = _numpy_kmeans(X.astype(np.float64), ids, k=3, iters=4)
    assert np.allclose(C, C_ref, rtol=0, atol=1e-9)
    got = {r["vec_id"]: r["cluster"] for r in rows}
    assert got == {int(i): int(a) for i, a in zip(ids, a_ref)}


def test_k_larger_than_n(ray_session):
    """Degenerate k ≥ n: every point is its own seed/cluster."""
    import ray.data as rd

    from ferenda_ray.stages.similarity import kmeans_iterate
    X = np.eye(3, dtype=np.float32) * 5
    ids = np.array([2, 0, 1], dtype=np.int64)
    ds = rd.from_arrow(_emb_table(X, ids))
    C, assigns = kmeans_iterate(ds, k=3, iters=2)
    got = sorted((r["vec_id"], r["cluster"]) for r in assigns.take_all())
    # seeds ordered by ascending id: id0→cluster0, id1→cluster1, id2→2
    assert got == [(0, 0), (1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# batch-GD logistic regression (same broadcast-iterate family)


def _np_logreg(X, y, iters, lr):
    w = np.zeros(X.shape[1] + 1)
    for _ in range(iters):
        z = X @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        g = np.concatenate((X.T @ (p - y), [(p - y).sum()])) / len(y)
        w = w - lr * g
    return w


def test_logreg_matches_numpy_reference(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.similarity import logreg_train
    rng = np.random.default_rng(3)
    X = rng.normal(size=(120, 8)).astype(np.float32)
    labels = rng.integers(0, 10, 120)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(120), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))
    w = logreg_train(ds.materialize(), iters=3, lr=0.5)
    ref = _np_logreg(X.astype(np.float64), (labels >= 5).astype(float),
                     3, 0.5)
    np.testing.assert_allclose(w, ref, rtol=1e-10, atol=1e-12)


def test_logreg_learns_separable_signal(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.similarity import logreg_train
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 4))
    y = (X[:, 0] > 0)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64())),
        "label": pa.array(np.where(y, 9, 0), pa.int32())}))
    w = logreg_train(ds.materialize(), iters=20, lr=1.0)
    # the separating dimension dominates and points the right way
    assert w[0] > 0.5 and abs(w[0]) > 3 * max(abs(w[1]), abs(w[2]),
                                              abs(w[3]))


def test_logreg_score_matches_direct_sigmoid(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.similarity import logreg_score
    rng = np.random.default_rng(13)
    X = rng.normal(size=(60, 6))
    w = rng.normal(size=7)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64()))}))
    got = {r["vec_id"]: r["score"]
           for r in logreg_score(ds, w).take_all()}
    exp = 1.0 / (1.0 + np.exp(-(X @ w[:-1] + w[-1])))
    for i in range(60):
        assert abs(got[i] - exp[i]) < 1e-12


def test_logreg_checkpoint_resume(ray_session, tmp_path):
    import json
    import os

    import ray.data as rd

    from ferenda_ray.stages.similarity import logreg_train
    rng = np.random.default_rng(23)
    X = rng.normal(size=(80, 5))
    labels = rng.integers(0, 10, 80)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(80), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int32())})).materialize()
    full = logreg_train(ds, iters=3, lr=0.5)
    ck = str(tmp_path / "ck")
    # simulate a kill after iteration 1: train 1 iter with checkpoint
    logreg_train(ds, iters=1, lr=0.5, checkpoint_dir=ck)
    rec = json.load(open(os.path.join(ck, "logreg.ckpt.json")))
    assert rec["iter"] == 1
    # resume to 3 total — identical to the uninterrupted run
    resumed = logreg_train(ds, iters=3, lr=0.5, checkpoint_dir=ck)
    np.testing.assert_array_equal(resumed, full)
    # idempotent rerun at the same target: loads, no extra passes
    again = logreg_train(ds, iters=3, lr=0.5, checkpoint_dir=ck)
    np.testing.assert_array_equal(again, full)


def test_kmeans_checkpoint_resume(ray_session, tmp_path):
    import ray.data as rd

    from ferenda_ray.stages.similarity import kmeans_iterate
    rng = np.random.default_rng(29)
    X = rng.normal(size=(60, 4))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float64()))})).materialize()
    C_full, _ = kmeans_iterate(ds, k=3, iters=4)
    ck = str(tmp_path / "ck")
    kmeans_iterate(ds, k=3, iters=2, checkpoint_dir=ck)   # 1 update pass
    C_res, _ = kmeans_iterate(ds, k=3, iters=4, checkpoint_dir=ck)
    np.testing.assert_array_equal(C_res, C_full)


def test_checkpoint_meta_mismatch_refuses(ray_session, tmp_path):
    """ADVICE r4: resuming with different hyperparameters or a
    different input must raise, not silently continue from mismatched
    state (kmeans with a larger k used to return the smaller-k
    centroids)."""
    import pytest
    import ray.data as rd

    from ferenda_ray.stages.similarity import (kmeans_iterate,
                                               logreg_train)
    rng = np.random.default_rng(31)
    X = rng.normal(size=(40, 4))

    def mk(n):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in X[:n]],
                                  pa.list_(pa.float64())),
            "label": pa.array([i % 10 for i in range(n)],
                              pa.int32())})).materialize()

    ds = mk(40)
    ck = str(tmp_path / "ck")
    kmeans_iterate(ds, k=3, iters=2, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="checkpoint"):
        kmeans_iterate(ds, k=5, iters=2, checkpoint_dir=ck)   # k changed
    with pytest.raises(ValueError, match="checkpoint"):
        kmeans_iterate(mk(30), k=3, iters=2,
                       checkpoint_dir=ck)                # input changed
    logreg_train(ds, iters=1, lr=0.5, checkpoint_dir=ck)
    with pytest.raises(ValueError, match="checkpoint"):
        logreg_train(ds, iters=2, lr=0.1, checkpoint_dir=ck)  # lr changed


def test_logreg_empty_input_raises(ray_session):
    """ADVICE r4: clear ValueError up front instead of IndexError at
    take(1) / ÷0 at the first update."""
    import pytest
    import ray.data as rd

    from ferenda_ray.stages.similarity import logreg_train
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
        "label": pa.array([], pa.int32())}))
    with pytest.raises(ValueError, match="empty"):
        logreg_train(empty, iters=1)
