"""PageAnalyzer metrics over synthetic textbox rows
(pdfanalyze.py:25-549 semantics — no PDF decode needed)."""

import json

import pyarrow as pa
import pytest

from ferenda_ray.stages.pdfanalyze import (
    analyze_margins, analyze_styles, count_page, merge_counters,
    page_metrics)


def _boxes(doc_id=1, pages=6):
    """Synthetic doc: body text at left=100/right=500 (odd),
    120/520 (even); a page header at top=30, footer at bottom=980;
    default 12pt Serif, h1 18pt Bold, tiny footnote refs 6pt."""
    rows = []
    for page in range(1, pages + 1):
        left, right = (100, 500) if page % 2 else (120, 520)
        rows.append(dict(doc_id=doc_id, page=page, left=left, top=30,
                         right=right, bottom=40, font_family="Serif",
                         font_size=10, text="hdr",
                         page_width=600, page_height=1000))
        rows.append(dict(doc_id=doc_id, page=page, left=left, top=60,
                         right=right, bottom=80,
                         font_family="Serif-Bold", font_size=18,
                         text="Heading " * 6,
                         page_width=600, page_height=1000))
        for i in range(8):
            rows.append(dict(doc_id=doc_id, page=page, left=left,
                             top=100 + i * 100, right=right,
                             bottom=180 + i * 100, font_family="Serif",
                             font_size=12, text="body text " * 40,
                             page_width=600, page_height=1000))
        rows.append(dict(doc_id=doc_id, page=page, left=left, top=90,
                         right=right, bottom=95, font_family="Serif",
                         font_size=6, text="12 " * 20,
                         page_width=600, page_height=1000))
        rows.append(dict(doc_id=doc_id, page=page, left=left, top=970,
                         right=right, bottom=980, font_family="Serif",
                         font_size=10, text="pg",
                         page_width=600, page_height=1000))
    return rows


def test_margins_and_styles():
    c = count_page(_boxes(), twopage=True)
    m = analyze_margins(c, twopage=True)
    assert m["leftmargin"] == 100 and m["leftmargin_even"] == 120
    assert m["rightmargin"] == 500 and m["rightmargin_even"] == 520
    assert m["pagewidth"] == 600 and m["pageheight"] == 1000
    # header zone ends before the body (top=60+); footer after bottom=180*
    assert 30 <= m["topmargin"] < 60
    assert 880 < m["bottommargin"] <= 980
    s = analyze_styles(c["styles"])
    assert s["default"] == {"family": "Serif", "size": 12}
    assert s["h1"] == {"family": "Serif-Bold", "size": 18}
    assert s["footnoteref"] == {"family": "Serif", "size": 6}


def test_page_metrics_distributed(ray_session):
    import ray.data as rd
    rows = _boxes(doc_id=1) + _boxes(doc_id=2, pages=4)
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = {r["doc_id"]: json.loads(r["metrics_json"])
           for r in page_metrics(ds).take_all()}
    assert set(out) == {1, 2}
    for m in out.values():
        assert m["leftmargin"] == 100 and m["rightmargin"] == 500
        assert m["default"] == {"family": "Serif", "size": 12}
    # partial+merge equals single-pass counting
    single = count_page(_boxes(doc_id=1), twopage=True)
    parts = [count_page(_boxes(doc_id=1)[:20]),
             count_page(_boxes(doc_id=1)[20:])]
    assert merge_counters(parts) == single
