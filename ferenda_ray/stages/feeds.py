"""Atom feed serialization + distributed feed-page sink.

The document side of the reference's ``news_write_atom``
(``ferenda/documentrepository.py:3527-3662``): entries are rendered
into Atom 1.0 XML with ``prev-archive`` / ``next-archive`` paging
links (archive split at ``archivesize``), written one file per
(feed, page).  Here the paging math runs distributed (the
oracle-verified ``events.feed_pages`` shape) and the XML writer is a
per-group ``map_groups`` sink — no driver-side feed assembly.
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone
from xml.sax.saxutils import escape

import pyarrow as pa

ATOM_NS = "http://www.w3.org/2005/Atom"


def rfc3339(ts) -> str:
    """datetime | iso-string | epoch-us int → RFC 3339 UTC timestamp
    (``util.rfc_3339_timestamp`` semantics)."""
    if isinstance(ts, (int, float)):
        dt = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc)
    elif isinstance(ts, str):
        dt = datetime.fromisoformat(ts)
    else:
        dt = ts
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def atom_feed(entries: list, title: str, feed_id: str, feed_url: str,
              author: str = "ferenda-ray",
              prev_archive: str | None = None,
              next_archive: str | None = None) -> str:
    """Entries (dicts with ``uri``, ``title``, ``updated``, optional
    ``published``/``summary``/``url``) → one Atom XML document string.
    Feed ``updated`` = max entry update (or epoch when empty) — kept
    deterministic: never wall clock."""
    updated = (max(e["updated"] for e in entries) if entries
               else 0)
    lines = ['<?xml version="1.0" encoding="utf-8"?>',
             f'<feed xmlns="{ATOM_NS}">',
             f"  <id>{escape(feed_id)}</id>",
             f"  <title>{escape(title)}</title>",
             f"  <updated>{rfc3339(updated)}</updated>",
             "  <author>",
             f"    <name>{escape(author)}</name>",
             "  </author>",
             f'  <link rel="self" href="{escape(feed_url, {chr(34): "&quot;"})}"/>']
    if prev_archive:
        lines.append(f'  <link rel="prev-archive" '
                     f'href="{escape(prev_archive)}"/>')
    if next_archive:
        lines.append(f'  <link rel="next-archive" '
                     f'href="{escape(next_archive)}"/>')
    for e in entries:
        lines.append("  <entry>")
        lines.append(f"    <id>{escape(str(e['uri']))}</id>")
        lines.append(f"    <title>{escape(str(e.get('title') or ''))}</title>")
        summary = e.get("summary") or ""
        lines.append(f'    <summary type="text">{escape(str(summary))}'
                     "</summary>")
        lines.append(
            f"    <published>{rfc3339(e.get('published', e['updated']))}"
            "</published>")
        lines.append(f"    <updated>{rfc3339(e['updated'])}</updated>")
        if e.get("url"):
            lines.append(f'    <link href="{escape(str(e["url"]))}"/>')
        lines.append("  </entry>")
    lines.append("</feed>")
    return "\n".join(lines) + "\n"


def write_atom_pages(events, out_dir: str, base_url: str,
                     page_size: int = 100,
                     type_col: str = "event_type",
                     id_col: str = "event_id",
                     ts_col: str = "ts"):
    """Distributed feed sink: page the per-type event stream newest-
    first (the ``feed_pages`` math) and write one Atom file per
    (feed, page) from the worker holding the group; archive pages are
    chained with prev-/next-archive links.  Returns the manifest
    Dataset ``(feed, page_idx, n_entries, path)``."""
    import polars as pl

    os.makedirs(out_dir, exist_ok=True)

    def paged(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        # one group per feed here (map_groups on type_col), so the
        # page index is a plain row-rank division
        df = df.sort([ts_col, id_col], descending=[True, False])
        df = df.with_columns(
            (pl.int_range(pl.len()) // page_size).alias("page_idx"))
        return df.to_arrow()

    # one shuffle keyed by feed; paging is per-feed rank math
    def write_page(group: pa.Table) -> pa.Table:
        feed = group.column(type_col)[0].as_py()
        page = group.column("page_idx")[0].as_py()
        g = group.sort_by([(ts_col, "descending"), (id_col, "ascending")])
        entries = [{
            "uri": f"{base_url}event/{r[id_col]}",
            "title": f"{feed} event {r[id_col]}",
            "updated": r[ts_col],
            "url": f"{base_url}event/{r[id_col]}",
        } for r in g.to_pylist()]
        slug = f"{feed}-{page}"
        prev_a = f"{base_url}feed/{feed}-{page + 1}.atom"
        next_a = (f"{base_url}feed/{feed}-{page - 1}.atom"
                  if page > 0 else None)
        xml = atom_feed(entries, title=f"{feed} (page {page})",
                        feed_id=f"{base_url}feed/{feed}",
                        feed_url=f"{base_url}feed/{slug}.atom",
                        prev_archive=prev_a, next_archive=next_a)
        path = os.path.join(out_dir, f"{slug}.atom")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(xml)
        os.replace(tmp, path)
        return pa.table({"feed": [feed], "page_idx": [page],
                         "n_entries": [len(entries)], "path": [path]})

    def sortable(b: pa.Table) -> pa.Table:
        # epoch-us for deterministic cross-engine ordering
        import pyarrow.compute as pc
        col = b.column(ts_col)
        if pa.types.is_timestamp(col.type):
            b = b.set_column(b.column_names.index(ts_col), ts_col,
                             pc.cast(col, pa.int64()))
        return b

    return (events.select_columns([type_col, id_col, ts_col])
            .map_batches(sortable, batch_format="pyarrow")
            .groupby(type_col)
            .map_groups(paged, batch_format="pyarrow")
            .groupby([type_col, "page_idx"])
            .map_groups(write_page, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Sitenews: a news feed from one structured text file
# (ferenda/sources/general/sitenews.py:18-60: entries are '<ISO
# datetime> <title>' header lines, a blank line, then an HTML-fragment
# body until the next header / EOF)

_SITENEWS_HEADER = re.compile(
    r"^(\d{4}-\d{2}-\d{2}(?:[ T]\d{2}:\d{2}(?::\d{2})?)?)\s+(.+)$")


def parse_sitenews(text: str) -> list:
    """Sitenews text → entry dicts ``(ts, title, body)`` in file
    order (newest customarily first in the file)."""
    entries: list = []
    body: list = []
    for line in text.split("\n"):
        m = _SITENEWS_HEADER.match(line)
        if m:
            if entries:
                entries[-1]["body"] = "\n".join(body).strip()
            body = []
            ts = m.group(1).replace(" ", "T")
            if len(ts) == 10:
                ts += "T00:00:00"
            elif len(ts) == 16:
                ts += ":00"
            entries.append({"ts": ts, "title": m.group(2).strip(),
                            "body": ""})
        elif entries:
            body.append(line)
    if entries:
        entries[-1]["body"] = "\n".join(body).strip()
    return entries


def sitenews_feed(text: str, base_url: str,
                  title: str = "Site news") -> str:
    """Sitenews text → one Atom feed with permalink entries
    (``{base}sitenews/{ts}``), newest first by timestamp."""
    entries = sorted(parse_sitenews(text),
                     key=lambda e: e["ts"], reverse=True)
    # updated as ISO strings: rfc3339 parses them directly, and ISO
    # strings order correctly for the feed-level max()
    feed_entries = [{
        "uri": f"{base_url}sitenews/{e['ts']}",
        "url": f"{base_url}sitenews/#item-{e['ts']}",
        "title": e["title"], "summary": e["body"],
        "updated": e["ts"]} for e in entries]
    return atom_feed(feed_entries, title=title,
                     feed_id=base_url + "sitenews/",
                     feed_url=base_url + "sitenews/feed.atom")
