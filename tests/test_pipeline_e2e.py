"""End-to-end KG pipeline on Ray: golden P/R, materialize, resume,
N-Triples output.  The analogue of the reference's RepoTester
integration suites (testutil.py:316-728) on the synthetic corpus."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ferenda_ray.corpus import TRIPLE_FIELDS
from ferenda_ray.pipelines.kg import build_kg, run_kg
from ferenda_ray.stages.materialize import (
    materialize, read_materialized, to_ntriples)
from ferenda_ray.state import manifest as mf


def _keyset(rows):
    if isinstance(rows, pa.Table):
        rows = rows.to_pylist()
    return {tuple(r[f] for f in TRIPLE_FIELDS) for r in rows}


@pytest.fixture(scope="module")
def kg_result(ray_session, corpus):
    import ray.data as rd
    ds = build_kg(
        rd.from_arrow(corpus["sources"]),
        aliases=corpus["aliases"],
        sameas=corpus["sameas"],
        vocab=corpus["vocab_triples"],
        link_concurrency=2,
    )
    return ds.take_all()


def test_pipeline_matches_golden(kg_result, corpus):
    got = _keyset(kg_result)
    exp = _keyset(corpus["expected_triples"])
    tp = len(got & exp)
    precision, recall = tp / len(got), tp / len(exp)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert got == exp  # exact on own corpus


def test_pipeline_is_exactly_deduped(kg_result):
    assert len(_keyset(kg_result)) == len(kg_result)


def test_materialize_shards_and_manifest(ray_session, corpus, tmp_path):
    import ray.data as rd
    out_dir = str(tmp_path / "kg_out")
    ds = build_kg(rd.from_arrow(corpus["sources"]),
                  aliases=corpus["aliases"], sameas=corpus["sameas"],
                  vocab=corpus["vocab_triples"])
    manifest = materialize(ds, out_dir, num_buckets=8, fmt="both")
    assert manifest.num_rows == 8 or manifest.num_rows > 0
    records = mf.read_manifests(out_dir)
    assert len(records) == manifest.num_rows
    total = sum(r["rows"] for r in records.values())
    # every triple landed in exactly one bucket
    back = read_materialized(out_dir)
    assert back.count() == total
    # shards are sorted within bucket
    part = sorted(records)[0]
    t = pq.read_table(os.path.join(out_dir, part, "part.parquet"))
    subj = t.column("subj").to_pylist()
    assert subj == sorted(subj)
    # nt shard exists and has matching line count
    nt_file = os.path.join(out_dir, part, "part.nt")
    with open(nt_file) as f:
        assert sum(1 for _ in f) == records[part]["rows"]


def test_materialize_resume_skips_done(ray_session, corpus, tmp_path):
    import ray.data as rd
    out_dir = str(tmp_path / "kg_resume")
    ds = build_kg(rd.from_arrow(corpus["sources"]),
                  aliases=corpus["aliases"], sameas=corpus["sameas"])
    m1 = materialize(ds, out_dir, num_buckets=4)
    assert m1.num_rows == 4
    # second run: everything checkpointed → nothing rewritten
    ds2 = build_kg(rd.from_arrow(corpus["sources"]),
                   aliases=corpus["aliases"], sameas=corpus["sameas"])
    m2 = materialize(ds2, out_dir, num_buckets=4)
    assert m2.num_rows == 0
    # deleting one manifest reprocesses exactly that bucket
    parts = sorted(mf.done_partitions(out_dir))
    os.remove(mf.manifest_path(out_dir, parts[0]))
    ds3 = build_kg(rd.from_arrow(corpus["sources"]),
                   aliases=corpus["aliases"], sameas=corpus["sameas"])
    m3 = materialize(ds3, out_dir, num_buckets=4)
    assert m3.num_rows == 1
    assert m3.column("partition").to_pylist() == [parts[0]]


def test_run_kg_from_parquet(ray_session, corpus_dir, corpus, tmp_path):
    out_dir = str(tmp_path / "kg_full")
    manifest = run_kg(os.path.join(corpus_dir, "sources.parquet"), out_dir,
                      aliases=corpus["aliases"], sameas=corpus["sameas"],
                      vocab=corpus["vocab_triples"], num_buckets=4)
    got = _keyset(read_materialized(out_dir).take_all())
    exp = _keyset(corpus["expected_triples"])
    assert got == exp


def test_ntriples_encoding():
    t = pa.table({
        "subj": ["s1", "s2", "s3"],
        "pred": ["p", "p", "p"],
        "obj_type": ["uri", "literal", "literal"],
        "obj_value": ["https://x.org/o", 'say "hi"\nline2\\end', "date"],
        "obj_lang": [None, "en", None],
        "obj_datatype": [None, None, "http://www.w3.org/2001/XMLSchema#date"],
    })
    lines = to_ntriples(t).to_list()
    assert lines[0] == "<s1> <p> <https://x.org/o> ."
    assert lines[1] == '<s2> <p> "say \\"hi\\"\\nline2\\\\end"@en .'
    assert lines[2] == \
        '<s3> <p> "date"^^<http://www.w3.org/2001/XMLSchema#date> .'


def test_predicate_profile_known_triples(ray_session):
    """Hand-built triples: counts, distincts, functional flag."""
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.pipelines.kg import predicate_profile

    rows = [
        ("s1", "p:one", "a"), ("s2", "p:one", "a"),   # functional
        ("s1", "p:multi", "x"), ("s1", "p:multi", "y"),  # not
    ]
    ds = rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj_value": [r[2] for r in rows]}))
    t = predicate_profile(ds)
    got = {r["pred"]: r for r in t.to_pylist()}
    assert got["p:one"]["n_triples"] == 2
    assert got["p:one"]["n_subjects"] == 2
    assert got["p:one"]["n_objects"] == 1
    assert got["p:one"]["functional"]
    assert got["p:multi"]["n_subjects"] == 1
    assert not got["p:multi"]["functional"]


def test_required_predicate_violations(ray_session):
    """Only typed subjects are validated; missing required preds
    explode one row each; complete docs emit nothing."""
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.pipelines.kg import required_predicate_violations

    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    TI = "http://purl.org/dc/terms/title"
    SU = "http://purl.org/dc/terms/subject"
    rows = [
        ("d1", T), ("d1", TI), ("d1", SU),       # complete
        ("d2", T), ("d2", TI),                   # missing subject
        ("d3", T),                               # missing both
        ("x1", TI),                              # untyped: ignored
    ]
    ds = rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows]}))
    got = sorted((r["subj"], r["missing_pred"]) for r in
                 required_predicate_violations(
                     ds, required=(TI, SU)).take_all())
    assert got == [("d2", SU), ("d3", SU), ("d3", TI)]


def test_type_predicate_matrix(ray_session):
    """Multi-typed subjects count under every type; untyped subjects
    are excluded; distinct semantics per (subj, pred)."""
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.pipelines.kg import type_predicate_matrix

    T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("d1", T, "Doc"), ("d1", "p:a", "x"), ("d1", "p:a", "y"),
        ("d2", T, "Doc"), ("d2", T, "Memo"), ("d2", "p:a", "z"),
        ("x1", "p:a", "w"),                       # untyped
    ]
    ds = rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj_value": [r[2] for r in rows]}))
    got = {(r["type"], r["pred"]): r["n_subjects"]
           for r in type_predicate_matrix(ds).take_all()}
    assert got[("Doc", "p:a")] == 2        # d1 once despite 2 values
    assert got[("Memo", "p:a")] == 1
    assert got[("Doc", T)] == 2 and got[("Memo", T)] == 1
    assert not any(ty == "w" for ty, _ in got)


def test_entity_mention_stats(ray_session):
    """Counts, distinct docs, label attach; unlabeled entities keep
    a null label."""
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.pipelines.kg import entity_mention_stats

    S = "http://purl.org/dc/terms/subject"
    L = "http://www.w3.org/2000/01/rdf-schema#label"
    rows = [
        ("d1", S, "e1"), ("d1", S, "e1"),      # 2 mentions, 1 doc
        ("d2", S, "e1"),
        ("d2", S, "e2"),
        ("e1", L, "Entity One"),
    ]
    ds = rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj_value": [r[2] for r in rows]}))
    got = {r["entity"]: r for r in
           entity_mention_stats(ds).to_pylist()}
    assert got["e1"]["n_mentions"] == 3 and got["e1"]["n_docs"] == 2
    assert got["e1"]["label"] == "Entity One"
    assert got["e2"]["n_mentions"] == 1 and got["e2"]["label"] is None
