"""Fulltext index: per-resource rows, Parquet sink, ranked search
(relate_fulltext, documentrepository.py:2082-2149)."""

import pyarrow as pa
import pytest

from ferenda_ray.stages.fulltext import (
    fulltext_rows, read_fulltext, search, write_fulltext)


@pytest.fixture(scope="module")
def index(ray_session, corpus):
    import ray.data as rd
    return fulltext_rows(rd.from_arrow(corpus["sources"])).materialize()


def test_rows_per_resource(index, corpus):
    rows = index.take_all()
    uris = [r["uri"] for r in rows]
    # one row per doc + one per section fragment
    docs = [u for u in uris if "#" not in u]
    frags = [u for u in uris if "#" in u]
    assert len(docs) == corpus["sources"].num_rows
    assert frags  # sections exist in the synthetic corpus
    assert len(set(uris)) == len(uris)  # @about dedup semantics
    by_uri = {r["uri"]: r for r in rows}
    some_doc = docs[0]
    assert by_uri[some_doc]["repo"]
    assert by_uri[some_doc]["basefile"].startswith(by_uri[some_doc]["repo"])
    # normalize_space applied
    assert "\n" not in by_uri[some_doc]["text"]


def test_write_read_round_trip(index, tmp_path):
    out = str(tmp_path / "ftindex")
    write_fulltext(index, out)
    back = read_fulltext(out)
    assert back.count() == index.count()
    assert "repo" in back.schema().names  # partition col resurfaces


def test_search_ranked_deterministic(index):
    hits = search(index, ["the"], k=5).take_all()
    assert len(hits) <= 5
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    # determinism: rerun gives identical ranking
    again = search(index, ["the"], k=5).take_all()
    assert [h["uri"] for h in hits] == [h["uri"] for h in again]


def test_search_title_boost(ray_session):
    import ray.data as rd
    idx = rd.from_arrow(pa.table({
        "uri": ["u1", "u2"],
        "title": ["alpha here", ""],
        "text": pa.array(["nothing", "alpha in body"], pa.large_string()),
    }))
    hits = search(idx, ["alpha"], k=2, title_boost=2.0).take_all()
    assert hits[0]["uri"] == "u1" and hits[0]["score"] == 2.0
    assert hits[1]["uri"] == "u2" and hits[1]["score"] == 1.0
