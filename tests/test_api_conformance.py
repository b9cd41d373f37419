"""JSON API conformance vs the reference's golden responses
(test/files/api/basicapi-*.json, built from test/files/base by
test/integrationAPI.py:23-127).  The advancedapi-* goldens need the
three examplerepos corpora and are out of scope; the basicapi family
is asserted byte-for-byte (as JSON value equality)."""

import json
import os

import pytest

from ferenda_ray.sources.turtle import parse_turtle
from ferenda_ray.stages.api import (api_search, api_stats, doc_meta,
                                    resource_rows)

BASE = "/root/reference/test/files/base"
API = "/root/reference/test/files/api"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference tree absent")


def _corpus():
    docs, triples = [], []
    for bf in ("a", "b", "c"):
        with open(f"{BASE}/parsed/123/{bf}.xhtml") as fp:
            docs.append({"doc_uri": f"http://example.org/base/123/{bf}",
                         "basefile": f"123/{bf}", "repo": "base",
                         "xhtml": fp.read()})
        with open(f"{BASE}/distilled/123/{bf}.ttl") as fp:
            triples.extend(parse_turtle(fp.read()))
    return resource_rows(docs), doc_meta(triples)


def _want(name):
    with open(f"{API}/{name}") as fp:
        return json.load(fp)


INDEX, META = _corpus()


def test_fulltext_query():
    got = api_search(INDEX, META, q="tail",
                     query_string="q=tail")
    assert got == _want("basicapi-fulltext-query.json")


def test_faceted_query():
    got = api_search(INDEX, META,
                     filters={"dcterms_publisher": "*/publisher/A"},
                     query_string="dcterms_publisher=*%2Fpublisher%2FA")
    assert got == _want("basicapi-faceted-query.json")


def test_complex_query():
    got = api_search(INDEX, META, q="haystack",
                     filters={"dcterms_publisher": "*/publisher/B"},
                     query_string="q=haystack&dcterms_publisher="
                                  "*%2Fpublisher%2FB")
    assert got == _want("basicapi-complex-query.json")


def test_stats():
    assert api_stats(META) == _want("basicapi-stats.json")


def test_stats_legacy():
    assert api_stats(META, legacy=True) \
        == _want("basicapi-stats.legacy.json")


def test_complex_query_legacy():
    got = api_search(INDEX, META, q="haystack",
                     filters={"publisher": "*/publisher/B"},
                     path="/-/publ", legacy=True,
                     query_string="q=haystack&publisher="
                                  "*%2Fpublisher%2FB")
    assert got == _want("basicapi-complex-query.legacy.json")


def test_distributed_index(ray_session):
    """The same index rows as a Ray Dataset give identical responses
    (scoring runs in map_batches, only hits are collected)."""
    import ray.data as rd
    ds = rd.from_arrow(INDEX)
    got = api_search(ds, META, q="tail", query_string="q=tail")
    assert got == _want("basicapi-fulltext-query.json")


def test_fulltext_query_legacy():
    got = api_search(INDEX, META, q="tail", path="/-/publ",
                     legacy=True, query_string="q=tail")
    assert got == _want("basicapi-fulltext-query.legacy.json")


def test_faceted_query_legacy():
    # the reference's legacy test reuses the non-legacy querystring
    # verbatim (integrationAPI.py:91-104), so 'current' keeps the
    # dcterms_ prefix even in legacy mode
    got = api_search(INDEX, META, filters={"publisher": "*/publisher/A"},
                     path="/-/publ", legacy=True,
                     query_string="dcterms_publisher=*%2Fpublisher%2FA")
    assert got == _want("basicapi-faceted-query.legacy.json")
