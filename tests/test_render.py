"""Presentation stages: unified-diff patching, link transforms,
XHTML+RDFa render/distill round-trip."""

import pyarrow as pa
import pytest

from ferenda_ray.stages.render import (
    PatchError, apply_patch, develurl_transform, distill_xhtml,
    patch_stage, render_stage, render_xhtml, transform_links,
    transformlinks_stage)

# --- apply_patch (patch_if_needed, documentrepository.py:1355-1404) -------

TEXT = "line1\nline2\nline3\nline4\nline5"

PATCH = """--- a/doc
+++ b/doc
@@ -2,3 +2,3 @@
 line2
-line3
+line three
 line4
"""

MULTI = """@@ -1,2 +1,2 @@
-line1
+first
 line2
@@ -5,1 +5,2 @@
 line5
+appended
"""


def test_apply_patch_single_hunk():
    assert apply_patch(TEXT, PATCH) == \
        "line1\nline2\nline three\nline4\nline5"


def test_apply_patch_multi_hunk():
    assert apply_patch(TEXT, MULTI) == \
        "first\nline2\nline3\nline4\nline5\nappended"


def test_apply_patch_conflict_raises():
    with pytest.raises(PatchError, match="context mismatch"):
        apply_patch("completely\ndifferent", PATCH)
    with pytest.raises(PatchError, match="no hunks"):
        apply_patch(TEXT, "not a patch")


def test_patch_stage_broadcast(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [TEXT, TEXT, "unrelated"],
    }))
    out = patch_stage(ds, {1: PATCH, 3: PATCH})
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert rows[1]["patch_status"] == "patched"
    assert "line three" in rows[1]["text"]
    assert rows[2]["patch_status"] == "none"
    assert rows[3]["patch_status"].startswith("error:")
    assert rows[3]["text"] == "unrelated"  # unchanged on conflict


# --- transform_links (transformlinks, :2754-2797) -------------------------

HTML = ('<a href="https://canon.test/res/a">A</a> '
        '<img src="https://canon.test/img/x.png"/> '
        '<a href="https://other.test/b">B</a>')


def test_develurl_transform():
    t = develurl_transform("http://localhost:8000/",
                           "https://canon.test/")
    out = transform_links(HTML, t)
    assert 'href="http://localhost:8000/res/a"' in out
    assert 'src="http://localhost:8000/img/x.png"' in out
    assert 'href="https://other.test/b"' in out  # untouched


def test_remove_invalid_links():
    out = transform_links(HTML, lambda u: None
                          if u.startswith("https://other") else u)
    assert "other.test" not in out
    assert 'href="https://canon.test/res/a"' in out


def test_transformlinks_stage(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc": ["d1"], "html": [HTML]}))
    t = develurl_transform("http://dev/", "https://canon.test/")
    out = transformlinks_stage(ds, t).take_all()
    assert 'href="http://dev/res/a"' in out[0]["html"]


# --- render_xhtml round-trip (render_xhtml :1459-1683; distill
#     decorators.py:201-227) ------------------------------------------------

DOC = "https://example.org/res/r/f.py@c"
TRIPLES = [
    (DOC, "http://purl.org/dc/terms/title", "literal", "A <Title>",
     "en", None),
    (DOC, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "uri",
     "http://purl.org/ontology/bibo/Document", None, None),
    (DOC + "#S1", "http://purl.org/dc/terms/title", "literal",
     "Sec \"one\"", None, None),
    (DOC + "#S1", "http://purl.org/dc/terms/isPartOf", "uri", DOC,
     None, None),
    (DOC, "http://purl.org/dc/terms/issued", "literal", "2024-01-01",
     None, "http://www.w3.org/2001/XMLSchema#date"),
]


def test_render_distill_round_trip():
    xhtml = render_xhtml(DOC, TRIPLES)
    assert xhtml.startswith('<?xml version="1.0"')
    assert 'about="https://example.org/res/r/f.py@c#S1"' in xhtml
    # escaping: raw < > " must not leak into attributes
    assert "A <Title>" not in xhtml
    distilled = distill_xhtml(xhtml)
    assert sorted(distilled) == sorted(TRIPLES)


def test_render_stage_groups_fragments(ray_session):
    import ray.data as rd
    t = pa.table({
        "subj": [r[0] for r in TRIPLES],
        "pred": [r[1] for r in TRIPLES],
        "obj_type": [r[2] for r in TRIPLES],
        "obj_value": [r[3] for r in TRIPLES],
        "obj_lang": [r[4] for r in TRIPLES],
        "obj_datatype": [r[5] for r in TRIPLES],
    })
    out = render_stage(rd.from_arrow(t)).take_all()
    assert len(out) == 1  # doc + fragment grouped under one page
    assert out[0]["doc_uri"] == DOC
    assert sorted(distill_xhtml(out[0]["xhtml"])) == sorted(TRIPLES)


# --- Grit annotation XML (graph_to_annotation_file :2693-2726) ------------

def test_to_grit_xml_shape():
    from ferenda_ray.stages.render import to_grit_xml
    xml = to_grit_xml(TRIPLES)
    assert xml.startswith('<graph xmlns="http://purl.org/oort/')
    assert f'<resource uri="{DOC}">' in xml
    assert "<dcterms-title" in xml and 'xml:lang="en"' in xml
    assert "<ref>http://purl.org/ontology/bibo/Document</ref>" in xml
    assert 'fmt="http://www.w3.org/2001/XMLSchema#date"' in xml


def test_annotations_grit_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.render import annotations_grit
    t = pa.table({
        "subj": ["d1", "d2", "d3"],
        "pred": ["http://purl.org/dc/terms/references"] * 3,
        "obj_type": ["uri"] * 3,
        "obj_value": ["https://x/entity/e1", "https://x/entity/e1",
                      "https://x/entity/e2"],
    })
    out = {r["target_uri"]: r
           for r in annotations_grit(rd.from_arrow(t),
                                     target_prefix="https://x/entity/"
                                     ).take_all()}
    assert out["https://x/entity/e1"]["n_inbound"] == 2
    assert '<resource uri="d1">' in out["https://x/entity/e1"]["grit_xml"]
    assert "dcterms-references" in out["https://x/entity/e2"]["grit_xml"]
