"""Page-layout analysis: margins + typographic styles from textboxes.

Re-implements the metric semantics of the reference's ``PDFAnalyzer``
(``ferenda/pdfanalyze.py:25-549``): per-page textbox edge/style
counters → probable left/right margins (odd/even pages when
``twopage``), header/footer zones (≤0.2 % of characters above/below),
default / h1–h3 / footnote-reference styles — WITHOUT needing a PDF
decoder: the input is a Dataset of textbox rows, the schema a real
``pdftohtml`` decode (``sources/readers.PDFReader``) emits.

Distributed shape: counters are PARTIAL-aggregated per batch inside
``map_batches`` (a Counter over quantized positions is tiny — bounded
by page geometry, not corpus size), merged per document by one
``groupby(doc_id)``, and the pure analysis functions run on the merged
counters.  No driver-side pass over textboxes.
"""

from __future__ import annotations

import json
from collections import Counter
from math import ceil, floor

import pyarrow as pa

HEADER_THRESHOLD = 0.002   # pdfanalyze.py:62
FOOTER_THRESHOLD = 0.002   # pdfanalyze.py:71
STYLE_THRESHOLD = 0.005    # pdfanalyze.py:56

TEXTBOX_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("page", pa.int64()),
    ("left", pa.int64()), ("top", pa.int64()),
    ("right", pa.int64()), ("bottom", pa.int64()),
    ("font_family", pa.string()), ("font_size", pa.int64()),
    ("text", pa.large_string()),
    ("page_width", pa.int64()), ("page_height", pa.int64()),
])


def count_page(rows: list, twopage: bool = True) -> dict:
    """Textbox dicts → the counter set (``count_*`` family,
    ``pdfanalyze.py:334-399``)."""
    c = {"leftmargin": Counter(), "rightmargin": Counter(),
         "topmargin": Counter(), "bottommargin": Counter(),
         "styles": Counter(), "pages": set()}
    if twopage:
        c["leftmargin_even"] = Counter()
        c["rightmargin_even"] = Counter()
    for r in rows:
        n = len(str(r["text"]).strip())
        if twopage and r["page"] % 2 == 0:
            c["leftmargin_even"][r["left"]] += 1
            c["rightmargin_even"][r["right"]] += 1
        else:
            c["leftmargin"][r["left"]] += 1
            c["rightmargin"][r["right"]] += 1
        c["topmargin"][r["top"]] += n
        c["bottommargin"][r["bottom"]] += n
        c["styles"][(r["font_family"], r["font_size"])] += n
        # page geometry as a SET of (doc, page, w, h): unions are
        # idempotent, so a page split across batches is not
        # double-counted in the distributed partial merge
        c["pages"].add((r["doc_id"], r["page"],
                        r["page_width"], r["page_height"]))
    return c


def merge_counters(parts: list) -> dict:
    out: dict = {}
    for part in parts:
        for k, v in part.items():
            if k == "pages":
                out.setdefault(k, set()).update(v)
            else:
                out.setdefault(k, Counter()).update(v)
    return out


def _page_counters(c: dict) -> tuple:
    pw = Counter(w for _, _, w, _ in c["pages"])
    ph = Counter(h for _, _, _, h in c["pages"])
    return pw, ph


def _filterdict(counter: Counter, keep) -> Counter:
    return Counter({k: v for k, v in counter.items() if keep(k)})


def _findmargin(counter: Counter, trunc=round, quantize=False):
    """Most-common position, optionally bin-quantized for scanned
    sources (``pdfanalyze.py:460-497``)."""
    if not quantize:
        return counter.most_common(1)[0][0]
    binsize = 10
    lowres = Counter()
    for val, n in counter.items():
        lowres[trunc(val / binsize) * binsize] += n
    threshold = lowres.most_common(1)[0][1] * 0.8
    candidates = []
    for val, n in lowres.most_common():
        if n < threshold:
            break
        candidates.append(val)
    if trunc is ceil:
        return max(candidates)
    if trunc is floor:
        return min(candidates)
    return sum(candidates) / len(candidates)


def analyze_margins(c: dict, twopage: bool = True,
                    scanned: bool = False) -> dict:
    """Counters → margin metrics (``analyze_{horizontal,vertical}_
    margins``, ``pdfanalyze.py:400-458``)."""
    out: dict = {}
    pw, ph = _page_counters(c)
    pagewidth = pw.most_common(1)[0][0]
    midpage = pagewidth / 2
    sides = [("leftmargin", "rightmargin")]
    if twopage:
        sides.append(("leftmargin_even", "rightmargin_even"))
    for lkey, rkey in sides:
        left = _filterdict(c.get(lkey, Counter()), lambda x: x < midpage)
        right = _filterdict(c.get(rkey, Counter()), lambda x: x > midpage)
        if left:
            out[lkey] = _findmargin(left, trunc=floor, quantize=scanned)
        if right:
            out[rkey] = _findmargin(right, trunc=ceil, quantize=True)
    out["pagewidth"] = max(pw)
    # header/footer zones: walk inward until > threshold of all chars
    total = sum(c["topmargin"].values())
    pageheight = max(ph)
    charcount, header = 0, HEADER_THRESHOLD * total
    for i in range(pageheight):
        charcount += c["topmargin"].get(i, 0)
        if charcount > HEADER_THRESHOLD * total:
            header = i - 1
            break
    charcount, footer = 0, FOOTER_THRESHOLD * total
    for i in range(pageheight - 1, -1, -1):
        charcount += c["bottommargin"].get(i, 0)
        if charcount > FOOTER_THRESHOLD * total:
            footer = i + 1
            break
    out["topmargin"] = header
    out["bottommargin"] = footer
    out["pageheight"] = pageheight
    return out


def _fontsize_key(fonttuple):
    family, size = fonttuple
    weight = 2 if "Bold" in family else (1 if "Italic" in family else 0)
    return (size, weight)


def analyze_styles(styles: Counter) -> dict:
    """Style counter → default / h1–h3 / footnoteref styledefs
    (``pdfanalyze.py:516-549``)."""
    out: dict = {}
    if not styles:
        return out
    ds = styles.most_common(1)[0][0]
    out["default"] = {"family": ds[0], "size": ds[1]}
    significant = sum(styles.values()) * STYLE_THRESHOLD
    ordered = sorted(styles, key=_fontsize_key, reverse=True)
    large = [s for s in ordered
             if _fontsize_key(s) > _fontsize_key(ds)
             and styles[s] > significant]
    fnrs = next((s for s in reversed(ordered)
                 if styles[s] > significant and s[0] == ds[0]
                 and s[1] <= ds[1] / 2), None)
    if fnrs:
        out["footnoteref"] = {"family": fnrs[0], "size": fnrs[1]}
    for name in ("h1", "h2", "h3"):
        if large:
            s = large.pop(0)
            out[name] = {"family": s[0], "size": s[1]}
    return out


def page_metrics(textboxes, twopage: bool = True,
                 scanned: bool = False):
    """Dataset of textbox rows → Dataset ``(doc_id, metrics_json)``.

    Per-batch partial counters (combiner) → per-doc merge → pure
    analysis.  Counters serialize as JSON through the shuffle (small:
    bounded by distinct positions/styles, not rows)."""
    def partial(b: pa.Table) -> pa.Table:
        by_doc: dict = {}
        for r in b.to_pylist():
            by_doc.setdefault(r["doc_id"], []).append(r)
        ids, blobs = [], []
        for doc_id, rows in by_doc.items():
            c = count_page(rows, twopage)
            ids.append(doc_id)
            blobs.append(json.dumps(
                {k: (sorted(v) if k == "pages" else list(v.items()))
                 for k, v in c.items()}))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "part": pa.array(blobs, pa.large_string())})

    def finalize(group: pa.Table) -> pa.Table:
        parts = []
        for blob in group.column("part").to_pylist():
            raw = json.loads(blob)
            parts.append({
                k: (set(map(tuple, v)) if k == "pages" else
                    Counter({(tuple(p[0]) if isinstance(p[0], list)
                              else p[0]): p[1] for p in v}))
                for k, v in raw.items()})
        c = merge_counters(parts)
        metrics = analyze_margins(c, twopage, scanned)
        metrics.update(analyze_styles(c["styles"]))
        return pa.table({
            "doc_id": [group.column("doc_id")[0].as_py()],
            "metrics_json": [json.dumps(metrics, sort_keys=True)],
        })

    return (textboxes.map_batches(partial, batch_format="pyarrow",
                                  batch_size=8192)
            .groupby("doc_id")
            .map_groups(finalize, batch_format="pyarrow"))
