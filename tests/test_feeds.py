"""Atom feed writer + HTML5 transformer (news_write_atom,
documentrepository.py:3527-3662; transformer.py:25-372 semantics)."""

import os
import xml.etree.ElementTree as ET

import pyarrow as pa
import pytest

from ferenda_ray.stages.feeds import atom_feed, rfc3339, write_atom_pages

NS = {"a": "http://www.w3.org/2005/Atom"}


def test_rfc3339():
    from datetime import datetime, timezone
    assert rfc3339(datetime(2024, 3, 1, 12, 30, tzinfo=timezone.utc)) \
        == "2024-03-01T12:30:00Z"
    assert rfc3339(0) == "1970-01-01T00:00:00Z"
    assert rfc3339(1_700_000_000_000_000).startswith("2023-11-14T")


def test_atom_feed_document():
    entries = [
        {"uri": "https://example.org/doc/1", "title": "Doc <1>",
         "updated": 1_700_000_000_000_000,
         "url": "https://example.org/doc/1"},
        {"uri": "https://example.org/doc/2", "title": "Doc 2",
         "updated": 1_700_000_100_000_000, "summary": "a & b",
         "url": "https://example.org/doc/2"},
    ]
    xml = atom_feed(entries, title="Feed", feed_id="urn:feed",
                    feed_url="https://example.org/feed/main.atom",
                    prev_archive="https://example.org/feed/main-1.atom")
    root = ET.fromstring(xml)
    assert root.tag == "{http://www.w3.org/2005/Atom}feed"
    assert root.findtext("a:title", namespaces=NS) == "Feed"
    # feed updated = max entry updated
    assert root.findtext("a:updated", namespaces=NS) \
        == "2023-11-14T22:15:00Z"
    links = {e.get("rel"): e.get("href")
             for e in root.findall("a:link", namespaces=NS)}
    assert links["prev-archive"].endswith("main-1.atom")
    es = root.findall("a:entry", namespaces=NS)
    assert [e.findtext("a:title", namespaces=NS) for e in es] \
        == ["Doc <1>", "Doc 2"]
    assert es[1].findtext("a:summary", namespaces=NS) == "a & b"


def test_write_atom_pages(ray_session, tmp_path):
    import ray.data as rd
    n = 25
    t = pa.table({
        "event_type": ["click"] * n + ["view"] * 5,
        "event_id": list(range(n)) + list(range(100, 105)),
        "ts": [1_700_000_000_000_000 + i * 1_000_000
               for i in range(n)] + [1_700_000_000_000_000] * 5,
    })
    out = str(tmp_path / "feeds")
    manifest = write_atom_pages(rd.from_arrow(t), out,
                                base_url="https://example.org/",
                                page_size=10).take_all()
    rows = {(r["feed"], r["page_idx"]): r for r in manifest}
    # 25 click events / page_size 10 → 3 pages; 5 view events → 1 page
    assert {(f, p) for f, p in rows} == {
        ("click", 0), ("click", 1), ("click", 2), ("view", 0)}
    assert rows[("click", 0)]["n_entries"] == 10
    assert rows[("click", 2)]["n_entries"] == 5
    # page 0 carries the NEWEST events; archives chain via links
    p0 = ET.parse(os.path.join(out, "click-0.atom")).getroot()
    ids = [e.findtext("a:id", namespaces=NS)
           for e in p0.findall("a:entry", namespaces=NS)]
    assert ids[0] == "https://example.org/event/24"  # newest first
    links = {e.get("rel"): e.get("href")
             for e in p0.findall("a:link", namespaces=NS)}
    assert links["prev-archive"].endswith("click-1.atom")
    assert "next-archive" not in links
    p1 = ET.parse(os.path.join(out, "click-1.atom")).getroot()
    l1 = {e.get("rel"): e.get("href")
          for e in p1.findall("a:link", namespaces=NS)}
    assert l1["next-archive"].endswith("click-0.atom")


def test_xhtml_to_html5_roundtrip():
    from ferenda_ray.stages.render import (
        distill_xhtml, render_xhtml, xhtml_to_html5)
    uri = "https://example.org/res/r/p"
    triples = [
        (uri, "http://purl.org/dc/terms/title", "literal",
         "A Title & More", "en", None),
        (uri, "http://purl.org/dc/terms/references", "uri",
         "https://example.org/res/r/q", None, None),
        (uri + "#S1", "http://purl.org/dc/terms/title", "literal",
         "Sec 1", None, None),
    ]
    xhtml = render_xhtml(uri, triples)
    html5 = xhtml_to_html5(xhtml, depth=2)
    assert html5.startswith("<!DOCTYPE html>")
    assert "<title>A Title &amp; More</title>" in html5
    assert "<h1>A Title &amp; More</h1>" in html5
    assert '<link rel="stylesheet" href="../../css/main.css"/>' in html5
    assert f'<section about="{uri}#S1">' in html5
    # the RDFa survives the presentation pass: re-distill equals input
    assert set(distill_xhtml(html5)) == set(triples)


def test_sitenews_feed():
    from ferenda_ray.stages.feeds import parse_sitenews, sitenews_feed
    text = """2014-09-23 18:12:34 New feature
Now the site has a <b>feature</b>.

More body text.
2013-06-06 Older post

Body of the older post.
"""
    entries = parse_sitenews(text)
    assert [e["title"] for e in entries] == ["New feature",
                                            "Older post"]
    assert entries[0]["body"].startswith("Now the site has")
    assert "More body text." in entries[0]["body"]
    feed = sitenews_feed(text, "https://example.org/")
    assert feed.index("New feature") < feed.index("Older post")
    assert "<updated>2014-09-23T18:12:34Z</updated>" in feed
    assert "sitenews/2013-06-06T00:00:00</id>" in feed
