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


def test_query_fields_pagination(ray_session):
    """WSGIApp.query surface: field filters, boolean AND, pagination."""
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.fulltext import query
    rows = []
    for i in range(30):
        rows.append({"uri": f"u{i:02d}", "title": "",
                     "text": "alpha " * (30 - i) + ("beta" if i % 2 else ""),
                     "repo": "r1" if i < 20 else "r2"})
    t = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(t)
    # page 0 and 1 partition the ordering with global ranks
    p0 = query(ds, ["alpha"], page=0, page_size=5).take_all()
    p1 = query(ds, ["alpha"], page=1, page_size=5).take_all()
    assert [r["rank"] for r in p0] == [1, 2, 3, 4, 5]
    assert [r["rank"] for r in p1] == [6, 7, 8, 9, 10]
    assert p0[0]["uri"] == "u00"  # most alpha hits first
    assert p1[0]["uri"] == "u05"
    # field filter
    pf = query(ds, ["alpha"], fields={"repo": "r2"}, page_size=20).take_all()
    assert {r["uri"][:3] >= "u20" for r in pf} == {True}
    # boolean AND: only odd-numbered docs contain beta
    pa_ = query(ds, ["alpha", "beta"], require_all=True,
                page_size=30).take_all()
    assert pa_ and all(int(r["uri"][1:]) % 2 == 1 for r in pa_)


def test_fulltext_rows_faceted(ray_session, corpus_dir):
    """Facet-declared schema drives the index columns; conflicting
    repo declarations raise SchemaConflictError before any work."""
    import pytest
    import ray.data as rd
    from ferenda_ray import ns
    from ferenda_ray.functions.facets import Facet, SchemaConflictError
    from ferenda_ray.stages.fulltext import fulltext_rows_faceted
    src = rd.read_parquet(f"{corpus_dir}/sources.parquet")
    facets = {"*": [Facet(ns.DCTERMS_ISSUED, "dcterms_issued",
                          indexingtype="Datetime"),
                    Facet(ns.DCTERMS + "author", "dcterms_author")]}
    rows = fulltext_rows_faceted(src, facets).take_all()
    assert rows and "dcterms_issued" in rows[0]
    assert any(r["dcterms_issued"] for r in rows)  # populated from meta
    # conflicting declarations across repos refuse up front
    clash = {"r1": [Facet(ns.DCTERMS_ISSUED, "dcterms_issued",
                          indexingtype="Datetime")],
             "r2": [Facet(ns.DCTERMS_ISSUED, "dcterms_issued",
                          indexingtype="Text")]}
    with pytest.raises(SchemaConflictError):
        fulltext_rows_faceted(src, clash)


def test_search_bm25(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.fulltext import search_bm25
    idx = rd.from_arrow(pa.table({
        "uri": ["u1", "u2", "u3"],
        "text": pa.array(["spark spark batch job", "batch once here",
                          "nothing relevant at all"], pa.large_string()),
    }))
    rows = search_bm25(idx, ["spark", "batch"], k=10).take_all()
    assert [r["uri"] for r in rows] == ["u1", "u2"]  # u3 scores 0
    # u1 matches both terms (one twice) → strictly higher score
    assert rows[0]["score"] > rows[1]["score"] > 0
    # idf of a term present in 2/3 docs, Lucene form, sanity bound
    assert rows[0]["score"] < 2 * math.log(3 + 1) * 2.2


def test_upsert_doc_granular(index, tmp_path):
    """fulltextindex.update/commit/destroy analogue: re-index ONE
    document by rewriting only its hash bucket (fulltextindex.py:
    96-151); untouched buckets keep their files byte-identical."""
    import os

    from ferenda_ray.stages.fulltext import upsert_fulltext

    out = str(tmp_path / "ft_bucketed")
    write_fulltext(index, out, num_buckets=4)
    before = read_fulltext(out)
    n0 = before.count()

    def snapshot():
        snap = {}
        for root, _, files in os.walk(out):
            for f in files:
                p = os.path.join(root, f)
                snap[p] = os.path.getsize(p), open(p, "rb").read(64)
        return snap

    target = before.take(1)[0]
    repo, basefile = target["repo"], target["basefile"]
    old_rows = [r for r in before.take_all()
                if r["basefile"] == basefile]
    assert old_rows

    snap0 = snapshot()
    new = pa.table({
        "uri": pa.array([old_rows[0]["uri"]], pa.string()),
        "repo": pa.array([repo], pa.string()),
        "basefile": pa.array([basefile], pa.string()),
        "title": pa.array(["REINDEXED TITLE"], pa.string()),
        "lang": pa.array([old_rows[0]["lang"]], pa.string()),
        "text": pa.array(["replacement body zzyzx"],
                         pa.large_string()),
    })
    res = upsert_fulltext(out, new, num_buckets=4)
    assert res["buckets_rewritten"] == 1

    after = read_fulltext(out).take_all()
    mine = [r for r in after if r["basefile"] == basefile]
    assert len(mine) == 1                      # doc+section rows replaced
    assert mine[0]["title"] == "REINDEXED TITLE"
    assert len(after) == n0 - len(old_rows) + 1

    # untouched buckets byte-identical
    snap1 = snapshot()
    changed_dirs = {os.path.dirname(p)
                    for p in (set(snap0) ^ set(snap1))}
    assert len(changed_dirs) == 1
    for p in set(snap0) & set(snap1):
        assert snap0[p] == snap1[p]

    # destroy: delete the doc entirely
    res = upsert_fulltext(out, new.slice(0, 0),
                          deletes=[(repo, basefile)], num_buckets=4)
    assert res["buckets_rewritten"] == 1
    remaining = read_fulltext(out).take_all()
    assert not [r for r in remaining if r["basefile"] == basefile]
    assert len(remaining) == n0 - len(old_rows)


def test_upsert_crash_consistency(index, tmp_path):
    """Crash-safety of the manifest publish: an unreferenced part file
    (a crashed upsert's leftover) is invisible to manifest-aware reads
    and garbage-collected by the next upsert of the bucket."""
    import json
    import os

    from ferenda_ray.stages.fulltext import upsert_fulltext

    out = str(tmp_path / "ft_crash")
    write_fulltext(index, out, num_buckets=4)
    target = read_fulltext(out).take(1)[0]
    repo, basefile = target["repo"], target["basefile"]
    new = pa.table({
        "uri": pa.array([target["uri"]], pa.string()),
        "repo": pa.array([repo], pa.string()),
        "basefile": pa.array([basefile], pa.string()),
        "title": pa.array(["V2"], pa.string()),
        "lang": pa.array([target["lang"]], pa.string()),
        "text": pa.array(["v2 body"], pa.large_string()),
    })
    upsert_fulltext(out, new, num_buckets=4)
    n0 = read_fulltext(out).count()

    # locate the manifested bucket and plant a stale (unreferenced)
    # part — what a crash between part-write and manifest-swap leaves
    bucket_dir = next(os.path.join(r, "") and r
                      for r, _, fs in os.walk(out)
                      if "_manifest.json" in fs)
    import pyarrow.parquet as pq
    stale = os.path.join(bucket_dir, "part-deadbeef.parquet")
    live = json.load(open(os.path.join(bucket_dir,
                                       "_manifest.json")))["parts"]
    pq.write_table(pq.read_table(
        os.path.join(bucket_dir, live[0])), stale)

    # readers never see the stale rows
    assert read_fulltext(out).count() == n0
    # the next upsert of that bucket reconciles: stale part removed
    upsert_fulltext(out, new, num_buckets=4)
    assert not os.path.exists(stale)
    assert read_fulltext(out).count() == n0
