"""Corpus ingestion sources (sources/ingest.py)."""
from __future__ import annotations

import json
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    {"repository": "org0/r0", "path": "src/a.py", "commit": "c1" * 4,
     "lang": "python", "content": "def a():\n    return 1\n"},
    {"repository": "org0/r0", "path": "src/b.go", "commit": "c2" * 4,
     "lang": "go", "content": "func B() int { return 2 }\n"},
    {"repository": "org1/r1", "path": "README.md", "commit": "c3" * 4,
     "lang": "markdown", "content": "# title\n\nbody text\n"},
]
CMAP = {"repository": "repo"}


def _write_all(tmp_path):
    t = pa.Table.from_pylist(ROWS)
    pq.write_table(t, str(tmp_path / "c.parquet"))
    with open(tmp_path / "c.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    import csv
    with open(tmp_path / "c.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(ROWS[0]))
        w.writeheader()
        w.writerows(ROWS)


@pytest.mark.parametrize("fmt,name", [("parquet", "c.parquet"),
                                      ("jsonl", "c.jsonl"),
                                      ("csv", "c.csv")])
def test_read_code_corpus_formats_agree(ray_session, tmp_path, fmt,
                                        name):
    from ferenda_ray.sources.ingest import read_code_corpus
    _write_all(tmp_path)
    ds = read_code_corpus(str(tmp_path / name), fmt=fmt,
                          column_map=CMAP, with_sha256=True)
    got = sorted(ds.take_all(), key=lambda r: r["path"])
    assert [r["repo"] for r in got] == ["org1/r1", "org0/r0",
                                        "org0/r0"]
    assert list(got[0]) == ["repo", "path", "commit", "lang",
                            "content", "content_sha256"]
    # the invariant column matches an independent engine
    exp = duckdb.connect().execute(
        "SELECT sha256(content) FROM read_parquet(?) ORDER BY path",
        [str(tmp_path / "c.parquet")]).fetchall()
    assert [r["content_sha256"] for r in got] == [e[0] for e in exp]


def test_read_code_corpus_validates_schema(ray_session, tmp_path):
    from ferenda_ray.sources.ingest import read_code_corpus
    _write_all(tmp_path)
    with pytest.raises(ValueError, match="missing required"):
        read_code_corpus(str(tmp_path / "c.parquet"), fmt="parquet")
    with pytest.raises(ValueError, match="unknown corpus format"):
        read_code_corpus(str(tmp_path / "c.jsonl"), fmt="xml")


def test_read_code_corpus_feeds_the_flagship(ray_session, tmp_path):
    """A JSONL corpus drives the same extraction stage as parquet."""
    from ferenda_ray.sources.ingest import read_code_corpus
    _write_all(tmp_path)
    ds = read_code_corpus(str(tmp_path / "c.jsonl"), fmt="jsonl",
                          column_map=CMAP)
    from ferenda_ray.stages.extract import extract
    triples = extract(ds)
    assert triples.count() > 0


def test_jsonl_corpus_drives_flagship_to_golden(ray_session,
                                                tmp_path):
    """A JSONL-ingested corpus through run_kg reproduces the
    generator's golden triples exactly (P=R=1.0)."""
    import pyarrow.parquet as pq

    from ferenda_ray.corpus import CorpusSpec, write_corpus
    from ferenda_ray.pipelines.kg import run_kg
    from ferenda_ray.sources.ingest import read_code_corpus
    from ferenda_ray.stages.materialize import read_materialized

    paths = write_corpus(CorpusSpec(n_files=60),
                         str(tmp_path / "corpus"))
    t = pq.read_table(paths["sources"])
    with open(tmp_path / "sources.jsonl", "w") as f:
        for r in t.to_pylist():
            f.write(json.dumps(r) + "\n")
    src = read_code_corpus(str(tmp_path / "sources.jsonl"),
                           fmt="jsonl")
    run_kg(src, str(tmp_path / "out"),
           aliases=pq.read_table(paths["aliases"]),
           sameas=pq.read_table(paths["sameas"]),
           vocab=pq.read_table(paths["vocab_triples"]),
           num_buckets=4)
    cols = ["subj", "pred", "obj_type", "obj_value", "obj_lang",
            "obj_datatype"]
    got = read_materialized(str(tmp_path / "out")).to_pandas()[cols]
    exp = pq.read_table(paths["expected_triples"]).to_pandas()[cols]
    gk = set(map(tuple, got.fillna("").values.tolist()))
    ek = set(map(tuple, exp.fillna("").values.tolist()))
    assert gk == ek


def test_read_code_corpus_null_and_collision_errors(ray_session,
                                                    tmp_path):
    """Null canonical fields fail with a clear message; a column_map
    collision with an existing canonical column raises up front."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.sources.ingest import read_code_corpus

    pq.write_table(pa.Table.from_pylist([
        {"repo": "r", "path": "p", "commit": "c", "lang": "python",
         "content": None}]), str(tmp_path / "nulls.parquet"))
    ds = read_code_corpus(str(tmp_path / "nulls.parquet"),
                          fmt="parquet")
    with pytest.raises(Exception, match="contains null rows"):
        ds.take_all()

    # parquet prunes at the read (the mapped source column wins), so
    # the collision can only reach _normalize via jsonl/csv
    with open(tmp_path / "dup.jsonl", "w") as f:
        f.write(json.dumps(
            {"repository": "r1", "repo": "r2", "path": "p",
             "commit": "c", "lang": "go", "content": "x"}) + "\n")
    with pytest.raises(ValueError, match="already"):
        read_code_corpus(str(tmp_path / "dup.jsonl"), fmt="jsonl",
                         column_map={"repository": "repo"})
