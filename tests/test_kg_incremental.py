"""Incremental KG maintenance (r4 verdict #4): delta-rebuild ==
full-rebuild, and buckets untouched by the delta stay byte-identical
on disk (the resume/increment guarantee at corpus scale)."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _docs_table(n=60, revised=()):
    texts = [f"document body {i} " + ("lorem " * (i % 7))
             for i in range(n)]
    for i in revised:
        texts[i] = f"REVISED body {i}"
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "de", "sv"][i % 3] for i in range(n)),
        "source": pa.array(["web"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _shard_bytes(out):
    shards = {}
    for part in sorted(os.listdir(out)):
        p = os.path.join(out, part, "part.parquet")
        if os.path.isfile(p):
            with open(p, "rb") as f:
                shards[part] = hashlib.sha256(f.read()).hexdigest()
    return shards


def test_delta_rebuild_equals_full_and_untouched_shards_identical(
        ray_session, tmp_path):
    import ray.data as rd

    from ferenda_ray.pipelines.docs import _doc_triples_ds
    from ferenda_ray.stages import sinks
    from ferenda_ray.stages.dedup import corpus_diff

    old_tbl = _docs_table(60)                 # rows 55..59 dropped,
    old_tbl = old_tbl.slice(0, 55)            # to be 'added'
    new_tbl = _docs_table(60, revised=(7, 21))  # 2 changed docs

    old = rd.from_arrow(old_tbl).materialize()
    new = rd.from_arrow(new_tbl).materialize()
    out = str(tmp_path / "sink")
    sinks.write_partitioned(_doc_triples_ds(old, with_doc_key=True),
                            out, key_col="doc_key", num_buckets=8,
                            sort_by=["doc_key", "pred", "obj_value"])
    before = _shard_bytes(out)

    delta = {r["doc_id"]: r["status"]
             for r in corpus_diff(old, new).take_all()}
    assert delta == {7: "changed", 21: "changed",
                     **{i: "added" for i in range(55, 60)}}

    ids = pa.array(sorted(delta), pa.int64())
    delta_docs = new.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b.column("doc_id"), value_set=ids)),
        batch_format="pyarrow")
    sinks.upsert_partitioned(
        _doc_triples_ds(delta_docs, with_doc_key=True), out,
        key_col="doc_key")
    after = _shard_bytes(out)

    # which buckets SHOULD have been touched: hash(doc_key) % 8
    import polars as pl
    touched = set(
        f"bucket={b:05d}" for b in
        (pl.Series("k", sorted(delta), dtype=pl.Int64).hash(seed=0)
         % 8).to_list())
    for part, sha in before.items():
        if part in touched:
            assert after[part] != sha, f"{part} should be rewritten"
        else:
            assert after[part] == sha, f"{part} must be byte-identical"

    # delta-rebuild == full rebuild (multiset of triples)
    got = sorted(map(tuple, sinks.read_partitioned(out)
                 .map_batches(lambda b: b.drop_columns(["doc_key"]),
                              batch_format="pyarrow")
                 .to_pandas().itertuples(index=False)))
    exp = sorted(map(tuple, _doc_triples_ds(new).to_pandas()
                 .itertuples(index=False)))
    assert got == exp


def test_delete_keys_retires_removed_docs(ray_session, tmp_path):
    """The 'removed' leg: delete_keys_partitioned drops every row of
    the removed doc keys, rewrites only affected buckets."""
    import ray.data as rd

    from ferenda_ray.pipelines.docs import _doc_triples_ds
    from ferenda_ray.stages import sinks

    docs = rd.from_arrow(_docs_table(40)).materialize()
    out = str(tmp_path / "sink")
    sinks.write_partitioned(_doc_triples_ds(docs, with_doc_key=True),
                            out, key_col="doc_key", num_buckets=8)
    before = _shard_bytes(out)
    removed = [5, 17]
    sinks.delete_keys_partitioned(
        rd.from_arrow(pa.table({"doc_key": pa.array(removed,
                                                    pa.int64())})),
        out, key_col="doc_key")
    after = _shard_bytes(out)
    import polars as pl
    touched = set(
        f"bucket={b:05d}" for b in
        (pl.Series("k", removed, dtype=pl.Int64).hash(seed=0)
         % 8).to_list())
    for part, sha in before.items():
        assert (after[part] != sha) == (part in touched)
    back = sinks.read_partitioned(out).to_pandas()
    assert set(back["doc_key"]) == set(range(40)) - set(removed)
    assert len(back) == 38 * 5


def test_kg_incremental_query_matches_plain_doc_triples(ray_session):
    """The driver query itself: incremental read-back == doc_triples
    full rebuild on the same sf dir."""
    from ferenda_ray.pipelines.docs import doc_triples, kg_incremental
    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple,
                     kg_incremental(sf).to_pandas().itertuples(index=False)))
    exp = sorted(map(tuple,
                     doc_triples(sf).to_pandas().itertuples(index=False)))
    assert got == exp
