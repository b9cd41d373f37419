"""annotations_graph — the reference's annotations.rq CONSTRUCT
(documentrepository.py:2636-2692 running ferenda/res/sparql/
annotations.rq) for every document at once, checked against a DuckDB
recursive-CTE restatement of the same SPARQL on the synthetic-corpus
golden triples."""

import duckdb
import pytest

from ferenda_ray import ns
from ferenda_ray.corpus import CorpusSpec, write_corpus
from ferenda_ray.pipelines.derived import annotations_graph

COLS = ["anchor", "subj", "pred", "obj_type", "obj_value"]


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    out = tmp_path_factory.mktemp("anno_corpus")
    paths = write_corpus(CorpusSpec(n_files=40), str(out))
    return paths["expected_triples"]


def oracle(golden_path: str):
    con = duckdb.connect()
    sql = f"""
    WITH RECURSIVE t AS (
      SELECT subj, pred, obj_type, obj_value
      FROM read_parquet('{golden_path}')
    ), docs AS (
      SELECT DISTINCT subj AS anchor FROM t
      WHERE pred = '{ns.RDF_TYPE}' AND obj_value = '{ns.BIBO_DOCUMENT}'
    ), up AS (
      SELECT anchor AS node, anchor FROM docs
      UNION
      SELECT t.subj AS node, up.anchor FROM t
      JOIN up ON t.obj_value = up.node
      WHERE t.pred = '{ns.DCTERMS_ISPARTOF}'
    ), b1 AS (
      SELECT up.anchor, t.subj, t.pred, t.obj_type, t.obj_value
      FROM t JOIN up ON t.subj = up.node
    ), dockeys AS (
      SELECT anchor AS doc_uri,
             'https://example.org/ref/' || regexp_extract(
                 anchor, '^https://example\\.org/res/(.*)@[0-9a-f]+$',
                 1) AS ref_key
      FROM docs
    ), refs AS (
      SELECT subj AS ref_src,
             regexp_replace(obj_value, '#S[0-9.]+$', '') AS ref_key,
             COALESCE(regexp_extract(obj_value, '(#S[0-9.]+)$', 1), '')
                 AS ref_frag
      FROM t WHERE pred = '{ns.DCTERMS_REFERENCES}'
    ), resolved AS (
      SELECT r.ref_src, d.doc_uri || r.ref_frag AS part
      FROM refs r JOIN dockeys d USING (ref_key)
    ), hit AS (
      SELECT r.ref_src, r.part, up.anchor
      FROM resolved r JOIN up ON r.part = up.node
    ), b2a AS (
      SELECT anchor, part AS subj,
             '{ns.DCTERMS}isReferencedBy' AS pred,
             'uri' AS obj_type, ref_src AS obj_value FROM hit
    ), b2b AS (
      SELECT DISTINCT h.anchor, t.subj, t.pred, t.obj_type, t.obj_value
      FROM t JOIN (SELECT DISTINCT ref_src, anchor FROM hit) h
      ON t.subj = h.ref_src
    )
    SELECT DISTINCT * FROM (
      SELECT * FROM b1 UNION ALL SELECT * FROM b2a
      UNION ALL SELECT * FROM b2b
    )"""
    return con.execute(sql).fetch_df()


def test_annotations_graph_matches_sparql_oracle(ray_session, golden):
    import ray.data as rd
    eng = annotations_graph(rd.read_parquet(golden)).to_pandas()
    ora = oracle(golden)
    e = set(map(tuple, eng[COLS].itertuples(index=False)))
    o = set(map(tuple, ora[COLS].itertuples(index=False)))
    assert len(e) == len(eng), "engine emitted duplicate triples"
    assert e == o


def test_annotations_graph_branch2_nonempty(ray_session, golden):
    """Inbound-reference branch must actually fire (the corpus always
    links documents): some annotation triple is an isReferencedBy."""
    import ray.data as rd
    eng = annotations_graph(rd.read_parquet(golden)).to_pandas()
    assert (eng["pred"] == ns.DCTERMS + "isReferencedBy").any()


def test_annotations_graph_plans_identical(ray_session, golden):
    """Plan-equivalence pin: the broadcast-map plan (default at these
    sizes) and the five-hash-join plan (forced with
    broadcast_max_rows=0, the 100-TB shape) emit the same graph."""
    import ray.data as rd
    fast = annotations_graph(rd.read_parquet(golden)).to_pandas()
    slow = annotations_graph(rd.read_parquet(golden),
                             broadcast_max_rows=0).to_pandas()
    f = set(map(tuple, fast[COLS].itertuples(index=False)))
    s = set(map(tuple, slow[COLS].itertuples(index=False)))
    assert f == s and len(f) > 0
