"""Derived queries over the canonical triples dataset: faceted pivot,
TOC, feeds, stats, dependency join, annotations — cross-checked
against a pure-Python recomputation from the golden triples."""

import collections

import pyarrow as pa
import pytest

from ferenda_ray import ns
from ferenda_ray.functions.facets import (
    DEFAULT_FACETS, Facet, SchemaConflictError, merged_schema)
from ferenda_ray.pipelines import derived
from ferenda_ray.pipelines.kg import vocab_as_triples


@pytest.fixture(scope="module")
def triples_ds(ray_session, corpus):
    import ray.data as rd
    return rd.from_arrow(
        vocab_as_triples(corpus["expected_triples"])).materialize()


def _golden_rows(corpus):
    return corpus["expected_triples"].to_pylist()


def test_faceted_data_pivot(triples_ds, corpus):
    out = {r["uri"]: r for r in derived.faceted_data(triples_ds).take_all()}
    rows = _golden_rows(corpus)
    # expected: one wide row per doc subject
    docs = {r["subj"] for r in rows
            if r["pred"] == ns.RDF_TYPE and r["obj_value"] == ns.BIBO_DOCUMENT}
    assert set(out) >= docs
    titles = {r["subj"]: r["obj_value"] for r in rows
              if r["pred"] == ns.DCTERMS_TITLE and "#" not in r["subj"]}
    langs = {r["subj"]: r["obj_value"] for r in rows
             if r["pred"] == ns.DCTERMS_LANGUAGE}
    for d in docs:
        assert out[d]["dcterms_title"] == titles[d]
        assert out[d]["dcterms_language"] == langs[d]
        # pivot keeps raw values; selectors (e.g. qname) apply at
        # TOC/stats time, as in the reference
        assert out[d]["rdf_type"] == ns.BIBO_DOCUMENT


def test_facet_values_exploded(triples_ds, corpus):
    f = Facet.defaults_for(ns.DCTERMS_SUBJECT)
    got = {(r["uri"], r["value"])
           for r in derived.facet_values(triples_ds, f).take_all()}
    exp = {(r["subj"], r["obj_value"]) for r in _golden_rows(corpus)
           if r["pred"] == ns.DCTERMS_SUBJECT}
    assert got == exp


def test_toc_pagesets_and_pages(triples_ds, corpus):
    faceted = derived.faceted_data(triples_ds).materialize()
    issued_facet = [f for f in DEFAULT_FACETS
                    if f.binding == "dcterms_issued"][0]
    pagesets = derived.toc_pagesets(faceted, issued_facet)
    years = pagesets.column("value").to_pylist()
    assert years == sorted(years)
    exp_years = sorted({r["obj_value"][:4] for r in _golden_rows(corpus)
                        if r["pred"] == ns.DCTERMS_ISSUED})
    assert years == exp_years
    pages = {r["value"]: r for r in derived.toc_select_for_pages(
        faceted, issued_facet).take_all()}
    assert set(pages) == set(exp_years)
    n_docs = sum(len(p["uris"]) for p in pages.values())
    assert n_docs == sum(pagesets.column("count()").to_pylist())
    # within a page, docs sorted by the facet key (full date asc)
    issued = {r["subj"]: r["obj_value"] for r in _golden_rows(corpus)
              if r["pred"] == ns.DCTERMS_ISSUED}
    for p in pages.values():
        dates = [issued[u] for u in p["uris"]]
        assert dates == sorted(dates)


def test_news_feeds_topk(triples_ds, corpus):
    faceted = derived.faceted_data(triples_ds).materialize()
    lang_facet = [f for f in DEFAULT_FACETS
                  if f.binding == "dcterms_language"][0]
    feeds = {r["feed"]: r for r in derived.news_feeds(
        faceted, lang_facet, page_size=5).take_all()}
    assert "all" in feeds
    issued = {r["subj"]: r["obj_value"] for r in _golden_rows(corpus)
              if r["pred"] == ns.DCTERMS_ISSUED}
    for name, f in feeds.items():
        assert len(f["entries"]) <= 5
        dates = [issued[u] for u in f["entries"]]
        assert dates == sorted(dates, reverse=True)  # newest first
    langs = {r["obj_value"] for r in _golden_rows(corpus)
             if r["pred"] == ns.DCTERMS_LANGUAGE}
    assert set(feeds) == langs | {"all"}


def test_stats_count_distinct(triples_ds, corpus):
    got = {(r["dimension"], r["value"]): r["count()"]
           for r in derived.stats(triples_ds).take_all()}
    # recompute language counts by hand
    exp = collections.Counter(
        r["obj_value"] for r in _golden_rows(corpus)
        if r["pred"] == ns.DCTERMS_LANGUAGE)
    for lang, n in exp.items():
        assert got[("dcterms_language", lang)] == n
    # rdf_type dimension uses qname selector
    n_docs = sum(exp.values())
    assert got[("rdf_type", "bibo:Document")] == n_docs


def test_dependencies_join(triples_ds, corpus):
    from ferenda_ray.uri import basefile_from_uri
    rows = _golden_rows(corpus)
    docs = {}
    for r in rows:
        if r["pred"] == ns.RDF_TYPE and r["obj_value"] == ns.BIBO_DOCUMENT:
            p = basefile_from_uri(r["subj"])
            docs[f"https://example.org/ref/{p['repo']}/{p['path']}"] = r["subj"]
    exp = set()
    for r in rows:
        if r["pred"] == ns.DCTERMS_REFERENCES:
            key = r["obj_value"].split("#")[0]
            if key in docs:
                exp.add((r["subj"].split("#")[0], docs[key]))
    got = {(r["src_doc_uri"], r["dst_doc_uri"])
           for r in derived.dependencies(triples_ds).take_all()}
    assert got == exp
    assert len(got) > 0
    # grouped dependents
    dep_lists = {r["dst_doc_uri"]: r["src_doc_uris"]
                 for r in derived.dependents_of(triples_ds).take_all()}
    exp_lists = collections.defaultdict(set)
    for s, d in exp:
        exp_lists[d].add(s)
    assert {k: set(v) for k, v in dep_lists.items()} == dict(exp_lists)


def test_annotations_groupby_object(triples_ds, corpus):
    got = {r["target_uri"]: r for r in derived.annotations(
        triples_ds, target_prefix="https://example.org/entity/").take_all()}
    exp = collections.Counter(
        r["obj_value"] for r in _golden_rows(corpus)
        if r["obj_type"] == "uri"
        and r["obj_value"].startswith("https://example.org/entity/"))
    assert {k: v["n_inbound"] for k, v in got.items()} == dict(exp)


def test_merged_schema_conflict():
    a = [Facet("p1", "x", indexingtype="Text")]
    b = [Facet("p1", "x", indexingtype="Keyword")]
    assert merged_schema([a])["x"] == "Text"
    with pytest.raises(SchemaConflictError):
        merged_schema([a, b])


def test_skeleton_entries(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.pipelines.derived import skeleton_entries
    trips = rd.from_arrow(pa.table({
        "subj": ["d1", "d1", "d2"],
        "pred": ["ref", "type", "ref"],
        "obj_type": ["uri", "uri", "uri"],
        "obj_value": pa.array(["d2", "http://x/ns#Doc", "http://y/a/b"],
                              pa.large_string())}))
    out = skeleton_entries(trips).to_pandas().sort_values("uri") \
        .reset_index(drop=True)
    # d2 IS present as a subject -> not a skeleton
    assert out["uri"].tolist() == ["http://x/ns#Doc", "http://y/a/b"]
    assert out["identifier"].tolist() == ["Doc", "b"]
