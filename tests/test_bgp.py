"""BGP (triple-pattern) query operator — the composable analogue of
the reference's SPARQL surface (annotations.rq / facet_query)."""

import pyarrow as pa
import pytest

from ferenda_ray.stages.bgp import (
    Var, construct, distinct, match, path_closure, scan, v)

RDF_TYPE = "rdf:type"
DOC = "bibo:Document"
PART = "bibo:DocumentPart"
ISPARTOF = "dcterms:isPartOf"
REFS = "dcterms:references"
TITLE = "dcterms:title"
LANG = "dcterms:language"


def _triples(rows):
    return pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj_type": pa.array([r[3] if len(r) > 3 else "uri"
                              for r in rows], pa.string()),
        "obj_value": pa.array([r[2] for r in rows], pa.large_string()),
    })


GRAPH = [
    # two documents, one with two nested sections
    ("d1", RDF_TYPE, DOC),
    ("d1", TITLE, "Doc One", "literal"),
    ("d1", LANG, "en", "literal"),
    ("d2", RDF_TYPE, DOC),
    ("d2", LANG, "sv", "literal"),
    # d2 has no title (exercises OPTIONAL)
    ("s1", RDF_TYPE, PART),
    ("s1", ISPARTOF, "d1"),
    ("s1", TITLE, "Sec 1", "literal"),
    ("s11", RDF_TYPE, PART),
    ("s11", ISPARTOF, "s1"),
    # d2's section references d1's nested section
    ("s2", RDF_TYPE, PART),
    ("s2", ISPARTOF, "d2"),
    ("s2", REFS, "s11"),
]


@pytest.fixture(scope="module")
def triples_ds(ray_session):
    import ray.data as rd
    return rd.from_arrow(_triples(GRAPH))


def rows(ds):
    return sorted(tuple(r.values()) for r in ds.take_all())


def test_scan_constants_and_vars(triples_ds):
    out = scan(triples_ds, (v("s"), RDF_TYPE, DOC))
    assert rows(out) == [("d1",), ("d2",)]


def test_scan_wildcard_and_extra(triples_ds):
    out = scan(triples_ds, ("s1", v("p"), None))
    assert sorted(x[0] for x in rows(out)) == sorted(
        [ISPARTOF, RDF_TYPE, TITLE])


def test_match_star_join(triples_ds):
    out = match(triples_ds, [(v("d"), RDF_TYPE, DOC),
                             (v("d"), LANG, v("lang"))],
                select=["d", "lang"])
    assert rows(out) == [("d1", "en"), ("d2", "sv")]


def test_match_chain_two_hop(triples_ds):
    # section → its parent document's language
    out = match(triples_ds, [(v("s"), ISPARTOF, v("d")),
                             (v("d"), LANG, v("lang"))],
                select=["s", "lang"])
    assert rows(out) == [("s1", "en"), ("s2", "sv")]


def test_match_optional_left_outer(triples_ds):
    out = match(triples_ds, [(v("d"), RDF_TYPE, DOC)],
                optional=[(v("d"), TITLE, v("t"))],
                select=["d", "t"])
    assert rows(out) == [("d1", "Doc One"), ("d2", None)]


def test_match_filters(triples_ds):
    out = match(triples_ds, [(v("d"), RDF_TYPE, DOC),
                             (v("d"), LANG, v("lang"))],
                filters=[(v("lang"), "in", ["en"])], select=["d"])
    assert rows(out) == [("d1",)]
    out2 = match(triples_ds, [(v("x"), RDF_TYPE, v("t"))],
                 filters=[(v("t"), "==", PART), (v("x"), "prefix", "s1")],
                 select=["x"])
    assert rows(out2) == [("s1",), ("s11",)]


def test_match_rejects_cartesian(triples_ds):
    with pytest.raises(ValueError, match="cartesian|disconnected"):
        match(triples_ds, [(v("a"), RDF_TYPE, DOC),
                           (v("b"), RDF_TYPE, PART)])


def test_match_rejects_unbound_filter(triples_ds):
    with pytest.raises(ValueError, match="unbound"):
        match(triples_ds, [(v("d"), RDF_TYPE, DOC)],
              filters=[(v("nope"), "==", "x")])


def test_distinct(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"a": ["x", "x", "y"],
                                 "b": [1, 1, 2]}))
    assert rows(distinct(ds)) == [("x", 1), ("y", 2)]


# every closure test runs BOTH physical plans: the measured-size
# driver BFS (default at these sizes) and the distributed iterative
# hash-join loop (forced with driver_max_edges=0, the 100-TB shape)
BOTH_PLANS = pytest.mark.parametrize(
    "cap", [2_000_000, 0], ids=["driver", "distributed"])


@BOTH_PLANS
def test_path_closure_anchored(triples_ds, ray_session, cap):
    import ray.data as rd
    anchors = rd.from_arrow(pa.table({"anchor": ["d1", "d2"]}))
    out = path_closure(triples_ds, ISPARTOF, anchors=anchors,
                       driver_max_edges=cap)
    assert rows(out) == [("d1", "d1"), ("d2", "d2"), ("s1", "d1"),
                         ("s11", "d1"), ("s2", "d2")]


@BOTH_PLANS
def test_path_closure_full(triples_ds, cap):
    out = path_closure(triples_ds, ISPARTOF, driver_max_edges=cap)
    got = set(rows(out))
    # transitive: s11 reaches s1 and d1
    assert ("s11", "d1") in got and ("s11", "s1") in got
    # reflexive over every edge endpoint
    assert ("s1", "s1") in got and ("d1", "d1") in got


@BOTH_PLANS
def test_path_closure_cycle_converges(ray_session, cap):
    """The frontier anti-joins the accumulated set each round, so a
    cycle along pred CONVERGES to the finite closure instead of
    spinning until max_iters."""
    import ray.data as rd
    cyc = rd.from_arrow(_triples([("a", ISPARTOF, "b"),
                                  ("b", ISPARTOF, "a")]))
    out = path_closure(cyc, ISPARTOF, max_iters=6, driver_max_edges=cap)
    assert set(rows(out)) == {("a", "a"), ("a", "b"),
                              ("b", "a"), ("b", "b")}


@BOTH_PLANS
def test_path_closure_diamond_no_reexpansion(ray_session, cap):
    """Diamond DAG (two paths to the same anchor): duplicate
    (node, anchor) pairs are dropped at the frontier, and a long tail
    below the diamond still closes within depth-bounded rounds."""
    import ray.data as rd
    tri = rd.from_arrow(_triples([
        ("l", ISPARTOF, "top"), ("r", ISPARTOF, "top"),
        ("bot", ISPARTOF, "l"), ("bot", ISPARTOF, "r"),
        ("t1", ISPARTOF, "bot"), ("t2", ISPARTOF, "t1")]))
    anchors = rd.from_arrow(pa.table({"anchor": ["top"]}))
    out = path_closure(tri, ISPARTOF, anchors=anchors, max_iters=8,
                       driver_max_edges=cap)
    assert set(rows(out)) == {("top", "top"), ("l", "top"),
                              ("r", "top"), ("bot", "top"),
                              ("t1", "top"), ("t2", "top")}


def test_construct(triples_ds):
    sols = match(triples_ds, [(v("s"), REFS, v("part"))])
    out = construct(sols, [(v("part"), "dcterms:isReferencedBy",
                            v("s"), "uri")])
    assert rows(out) == [("s11", "dcterms:isReferencedBy", "uri", "s2")]


def test_construct_skips_null_bindings(triples_ds):
    sols = match(triples_ds, [(v("d"), RDF_TYPE, DOC)],
                 optional=[(v("d"), TITLE, v("t"))])
    out = construct(sols, [(v("d"), "ex:hasTitle", v("t"), "literal")])
    assert rows(out) == [("d1", "ex:hasTitle", "literal", "Doc One")]


def test_facet_select_shape(triples_ds):
    """The reference's facet_query shape (documentrepository.py:2293-
    2383): ?uri rdf:type <type> + one OPTIONAL per facet predicate."""
    out = match(triples_ds, [(v("uri"), RDF_TYPE, DOC)],
                optional=[(v("uri"), TITLE, v("dcterms_title")),
                          (v("uri"), LANG, v("dcterms_language"))],
                select=["uri", "dcterms_title", "dcterms_language"],
                dedup=True)
    assert rows(out) == [("d1", "Doc One", "en"), ("d2", None, "sv")]


def test_union_solutions(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.bgp import (Var, distinct, match,
                                        union_solutions)
    trips = rd.from_arrow(_triples([
        ("d1", RDF_TYPE, "T1"),
        ("d2", RDF_TYPE, "T2"),
        ("d2", TITLE, "two", "literal"),
    ]))
    a = match(trips, [(Var("d"), RDF_TYPE, "T1")])
    b = match(trips, [(Var("d"), TITLE, Var("t"))])
    out = distinct(union_solutions(a, b)).to_pandas() \
        .sort_values(["d", "t"], na_position="first") \
        .reset_index(drop=True)
    assert out["d"].tolist() == ["d1", "d2"]
    assert out["t"].isna().tolist() == [True, False]
    assert out.loc[1, "t"] == "two"


def test_path_closure_plans_identical_random_dag(ray_session):
    """Plan-equivalence pin: driver BFS == distributed loop on a
    deterministic messy graph (cycle + diamond + deep chain +
    disconnected island + anchor with no edges)."""
    import ray.data as rd
    edges = [("a", "b"), ("b", "c"), ("c", "a"),          # cycle
             ("l", "top"), ("r", "top"),
             ("bot", "l"), ("bot", "r"),                   # diamond
             ("d1", "d0"), ("d2", "d1"), ("d3", "d2"),
             ("d4", "d3"), ("d5", "d4"),                   # deep chain
             ("x", "y")]                                   # island
    tri = rd.from_arrow(_triples([(c, ISPARTOF, p) for c, p in edges]))
    anchors = rd.from_arrow(pa.table(
        {"anchor": ["a", "top", "d0", "lonely"]}))
    driver = set(rows(path_closure(tri, ISPARTOF, anchors=anchors)))
    dist = set(rows(path_closure(tri, ISPARTOF, anchors=anchors,
                                 driver_max_edges=0)))
    assert driver == dist
    assert ("d5", "d0") in driver and ("lonely", "lonely") in driver
