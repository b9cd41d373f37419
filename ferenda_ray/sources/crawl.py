"""Crawl-stage operators: link enumeration → (basefile, url) rows.

The discovery half of the reference's *download* action
(``download_get_basefiles``, ``documentrepository.py:892-934``):
examine each link's TEXT against ``basefile_regex`` first, then the
link URL against ``document_url_regex``; dedup on ``(basefile, link)``
keeping the first hit.  No lxml in this sandbox, so links come from a
small HTML regex (``<a href=...>text</a>``) — the semantics under
test are the two-step regex match and the dedup, not HTML parsing.

Scale-out face: :func:`discover` flat-maps start pages to candidate
rows and finishes with one ``groupby(basefile, url)`` first-wins pass
(global dedup across pages — the crawl-wide ``yielded`` set restated
as a shuffle).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pyarrow as pa

_LINK = re.compile(
    r"""<a\s[^>]*href\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL)


def iterlinks(html: str, base_url: str = "", use_dom: bool = True) -> list:
    """All ``(absolute_url, link_text)`` pairs in document order.

    Default path parses a real DOM (``sources/soup.py`` — the
    ``soup_from_basefile`` analogue) so nested markup inside ``<a>``
    and attribute-order variance are handled; the regex fast path
    remains for malformed tag soup."""
    out = []
    if use_dom:
        from ferenda_ray.sources.soup import soup_parse
        for a in soup_parse(html).select("a[href]"):
            href = a.attrs["href"]
            text = " ".join(a.get_text(" ").split())
            out.append((urljoin(base_url, href) if base_url else href,
                        text))
        return out
    for m in _LINK.finditer(html):
        href, text = m.group(1), re.sub(r"<[^>]+>", "", m.group(2)).strip()
        out.append((urljoin(base_url, href) if base_url else href, text))
    return out


def basefiles_from_html(html: str, basefile_regex: str | None = None,
                        document_url_regex: str | None = None,
                        base_url: str = "") -> list:
    """``(basefile, url)`` for every matching link, first-wins dedup —
    the two-step match of ``download_get_basefiles`` (text first, URL
    second; ``documentrepository.py:917-933``).  Both regexes must
    expose a ``(?P<basefile>...)`` group."""
    seen = set()
    out = []
    for url, text in iterlinks(html, base_url):
        basefile = None
        if basefile_regex and text:
            m = re.search(basefile_regex, text)
            if m:
                basefile = m.group("basefile")
        if basefile is None and document_url_regex:
            m = re.match(document_url_regex, url)
            if m:
                basefile = m.group("basefile")
        if basefile and (basefile, url) not in seen:
            seen.add((basefile, url))
            out.append((basefile, url))
    return out


def discover(pages, basefile_regex: str | None = None,
             document_url_regex: str | None = None,
             html_col: str = "html", url_col: str = "url"):
    """Dataset of start pages ``(url, html)`` → Dataset of distinct
    ``(basefile, url)`` rows.  Per-page extraction is a flat-map; the
    cross-page dedup is a ``groupby`` keeping the first source page
    (deterministic: min source url)."""
    from ray.data.aggregate import Min

    def extract(b: pa.Table) -> pa.Table:
        bf, u, src = [], [], []
        for page_url, html in zip(b.column(url_col).to_pylist(),
                                  b.column(html_col).to_pylist()):
            for basefile, url in basefiles_from_html(
                    html, basefile_regex, document_url_regex,
                    base_url=page_url):
                bf.append(basefile)
                u.append(url)
                src.append(page_url)
        return pa.table({"basefile": pa.array(bf, pa.string()),
                         "url": pa.array(u, pa.string()),
                         "src_page": pa.array(src, pa.string())})

    return (pages.map_batches(extract, batch_format="pyarrow")
            .groupby(["basefile", "url"])
            .aggregate(Min("src_page", alias_name="src_page")))
