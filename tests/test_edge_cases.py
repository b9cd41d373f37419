"""Edge-case hardening: empty inputs, degenerate documents, zero
vectors — pipelines must produce empty/minimal results, never crash."""

import numpy as np
import pyarrow as pa
import pytest

from ferenda_ray.schema import TRIPLES


def _empty_sources():
    return pa.table({
        "repo": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "commit": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "content": pa.array([], pa.large_string()),
    })


def test_empty_corpus_through_kg(ray_session, tmp_path):
    import ray.data as rd
    from ferenda_ray.pipelines.kg import build_kg
    from ferenda_ray.stages.materialize import materialize
    ds = build_kg(rd.from_arrow(_empty_sources()))
    assert ds.count() == 0
    m = materialize(ds, str(tmp_path / "out"), num_buckets=4, dedup=True)
    assert m.num_rows == 0


def test_empty_and_whitespace_docs(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import quality_score, token_count
    from ferenda_ray.stages.dedup import exact_dedup
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "   \n\t  ", "one token"],
                         pa.large_string()),
    }))
    toks = {r["doc_id"]: r["ws_tokens"]
            for r in token_count(docs).take_all()}
    assert toks == {1: 0, 2: 0, 3: 2}
    q = {r["doc_id"]: r for r in quality_score(docs).take_all()}
    assert q[1]["n_tokens"] == 0  # no div-by-zero
    dd = exact_dedup(docs).take_all()
    assert sum(r["n_dups"] for r in dd) == 3


def test_minhash_short_docs(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.dedup import minhash_lsh_pairs
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["tiny", "tiny", ""], pa.large_string()),
    }))
    pairs = minhash_lsh_pairs(docs, threshold=0.9).take_all()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}


def test_zero_vector_similarity(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.similarity import brute_topk
    V = np.zeros((4, 8), dtype="float32")
    V[0, 0] = 1.0
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64())),
    }))
    out = brute_topk(ds, V[:1], k=2, query_ids=[0]).take_all()
    assert out[0]["vec_id"] == 0  # self first; zero vectors don't NaN
    assert all(np.isfinite(r["cosine"]) for r in out)


def test_linker_empty_text_and_unicode(ray_session):
    from ferenda_ray.stages.link import EntityLinker
    lk = EntityLinker([{"alias": "naïve", "label": "n",
                        "entity_uri": "https://x/e/n"}])
    batch = pa.table({
        "subj": ["s1", "s2"], "pred": ["p", "p"],
        "obj_type": ["mention", "mention"],
        "obj_value": pa.array(["", "a naïve approach"],
                              pa.large_string()),
        "obj_lang": [None, None], "obj_datatype": [None, None],
        "graph": ["g", "g"], "src_repo": [None, None],
        "src_path": [None, None],
    }, schema=TRIPLES)
    out = lk(batch)
    assert out.column("obj_value").to_pylist() == ["https://x/e/n"]


def test_patch_empty_text():
    from ferenda_ray.stages.render import PatchError, apply_patch
    with pytest.raises(PatchError):
        apply_patch("", "@@ -5,1 +5,1 @@\n-x\n+y\n")


def test_join_partitions_never_starves_map_side(ray_session):
    """Regression: Ray's hash-join aggregator actors each reserve a
    CPU for the whole join, so the partition count must leave at
    least half the cluster for the map side — the old lo=4 floor
    reserved ALL 4 CPUs of this very test cluster and any BGP
    OPTIONAL chain (doc_facets et al.) wedged forever."""
    from ferenda_ray.cluster import cluster_cpus, join_partitions
    cpus = cluster_cpus()
    assert cpus == 4  # the session fixture's cluster
    assert join_partitions() <= max(2, cpus // 2)
