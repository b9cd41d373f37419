"""Soup DOM + CSS-selector subset + parse_document_from_soup
(documentrepository.py:1259-1352; elements/html.py:23-72 semantics)."""

import pytest

from ferenda_ray import elements as el
from ferenda_ray.sources.soup import (
    ParseError, parse_document_from_soup, soup_parse)

HTML = """
<html><head><title>T</title><script>var x=1;</script></head>
<body>
  <div id="main" class="content wide">
    <h1>Head</h1>
    <p class="note">one</p>
    <p>two</p>
    <ol><li>a</li><li>b</li></ol>
    <script>tracking()</script>
  </div>
  <div class="sidebar"><p>ignored</p></div>
</body></html>
"""


def test_select_subset():
    root = soup_parse(HTML)
    assert [t.name for t in root.select("p")] == ["p", "p", "p"]
    assert len(root.select("div#main")) == 1
    assert len(root.select("div.content")) == 1
    assert len(root.select(".sidebar p")) == 1
    assert len(root.select("#main > p")) == 2
    assert [t.get_text() for t in root.select("p.note")] == ["one"]
    assert len(root.select("ol li")) == 2
    assert len(root.select("li, p.note")) == 3
    assert root.select("table") == []


def test_parse_document_from_soup():
    body = parse_document_from_soup(HTML, content_selector="div#main",
                                    filter_selectors=("script", ".ad"))
    # div#main → Section containing Heading, 2 Paragraphs, OrderedList
    assert isinstance(body, el.Section)
    kinds = [type(c).__name__ for c in body]
    assert kinds == ["Heading", "Paragraph", "Paragraph", "OrderedList"]
    assert str(body[0]) == "Head"
    assert body[3][0][0] == "a"  # first ListItem text
    # script pruned
    assert "tracking" not in el.serialize(body)


def test_content_selector_misses():
    with pytest.raises(ParseError):
        parse_document_from_soup(HTML, content_selector="main")


def test_reference_downloaded_fixture():
    """Drive the generic parse over the reference's own downloaded
    HTML fixture (test/files/base/downloaded/index.htm)."""
    import os
    path = "/root/reference/test/files/base/downloaded/index.htm"
    if not os.path.exists(path):
        pytest.skip("fixture absent")
    with open(path, encoding="utf-8") as f:
        html = f.read()
    root = soup_parse(html)
    links = root.select("a")
    assert links, "reference index.htm contains links"
    hrefs = [t.attrs.get("href") for t in links]
    assert all(h for h in hrefs)
    body = parse_document_from_soup(html)
    assert isinstance(body, el.Body)
