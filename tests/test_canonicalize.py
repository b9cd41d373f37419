"""Canonicalization: union-find, rewrite, exact dedup, label propagation."""

import pyarrow as pa
import pytest

from ferenda_ray import ns
from ferenda_ray.schema import TRIPLES
from ferenda_ray.state.unionfind import UnionFind, canonical_map_from_edges
from ferenda_ray.stages.canonicalize import (
    _Rewriter, _prededup, dedup_exact, label_propagation, mapping_from_sameas)


def test_unionfind_deterministic_representative():
    # representative independent of edge order
    for edges in ([("b", "c"), ("a", "b")], [("a", "b"), ("b", "c")],
                  [("c", "a"), ("c", "b")]):
        m = canonical_map_from_edges(edges)
        assert m == {"b": "a", "c": "a"}


def test_unionfind_multiple_clusters():
    m = canonical_map_from_edges([("x", "y"), ("p", "q"), ("q", "r")])
    assert m == {"y": "x", "q": "p", "r": "p"}


def _t(subj, pred, obj_type, obj_value, lang=None, dt=None,
       repo="o/r", path="f.py"):
    return {"subj": subj, "pred": pred, "obj_type": obj_type,
            "obj_value": obj_value, "obj_lang": lang, "obj_datatype": dt,
            "graph": "g", "src_repo": repo, "src_path": path}


def test_rewriter_subject_object_and_selfloop():
    rows = [
        _t("e2", ns.RDFS_LABEL, "literal", "name"),
        _t("d1", ns.DCTERMS_SUBJECT, "uri", "e2"),
        _t("e2", ns.OWL_SAMEAS, "uri", "e1"),
        _t("d1", ns.DCTERMS_TITLE, "literal", "e2"),  # literal untouched
    ]
    batch = pa.Table.from_pylist(rows, schema=TRIPLES)
    out = _Rewriter({"e2": "e1"})(batch)
    got = [(r["subj"], r["pred"], r["obj_value"])
           for r in out.to_pylist()]
    assert ("e1", ns.RDFS_LABEL, "name") in got
    assert ("d1", ns.DCTERMS_SUBJECT, "e1") in got
    assert ("d1", ns.DCTERMS_TITLE, "e2") in got  # literal not rewritten
    assert not any(p == ns.OWL_SAMEAS for _, p, _ in got)  # self-loop dropped


def test_prededup_keeps_min_lineage():
    rows = [
        _t("s", "p", "uri", "o", repo="z/z", path="b.py"),
        _t("s", "p", "uri", "o", repo="a/a", path="a.py"),
        _t("s", "p2", "uri", "o"),
    ]
    out = _prededup(pa.Table.from_pylist(rows, schema=TRIPLES)).to_pylist()
    assert len(out) == 2
    kept = [r for r in out if r["pred"] == "p"][0]
    assert kept["src_repo"] == "a/a"


def test_dedup_exact_distributed(ray_session):
    import ray.data as rd
    rows = (
        [_t("s1", "p", "literal", "v", lang="en", repo=f"r{i}", path="x")
         for i in range(5)]
        + [_t("s2", "p", "literal", "v")]
        + [_t("s1", "p", "literal", "v")]  # dup of first group, null repo diff
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=TRIPLES))
    out = dedup_exact(ds).take_all()
    keys = sorted((r["subj"], r["obj_lang"] or "") for r in out)
    keys = [(s, l or None) for s, l in keys]
    # (s1, en) deduped to one; (s1, None) distinct (lang differs); (s2, None)
    assert keys == [("s1", None), ("s1", "en"), ("s2", None)]
    en = [r for r in out if r["obj_lang"] == "en"][0]
    assert en["src_repo"] == "r0"  # min lineage wins
    # null restored (not "")
    assert all(r["obj_datatype"] is None for r in out)


def test_mapping_from_sameas_table():
    t = pa.table({"subj": ["b", "c"], "obj": ["a", "b"]})
    assert mapping_from_sameas(t) == {"b": "a", "c": "a"}


def test_label_propagation_matches_unionfind(ray_session):
    import ray.data as rd
    edges = [("b", "a"), ("c", "b"), ("z", "y"), ("m", "m")]
    ds = rd.from_arrow(pa.table({
        "subj": [e[0] for e in edges], "obj": [e[1] for e in edges]}))
    labels = {r["node"]: r["label"]
              for r in label_propagation(ds).take_all()}
    assert labels["a"] == labels["b"] == labels["c"] == "a"
    assert labels["y"] == labels["z"] == "y"
