# -*- coding: utf-8 -*-
"""Turtle / N-Triples parsing — syntax micro-cases plus the
reference's own vocabulary files (``ferenda/res/vocab/*.ttl``,
``res/extra/base.ttl``) as fixture conformance."""

import glob
import os

import pytest

from ferenda_ray.sources.turtle import (
    RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, TurtleParseError,
    parse_ntriples, parse_turtle, turtle_table,
)

VOCABDIR = "/root/reference/ferenda/res/vocab"
needs_vocab = pytest.mark.skipif(not os.path.exists(VOCABDIR),
                                 reason="reference vocab not available")


def _idx(rows):
    return {(r["subj"], r["pred"]): r for r in rows}


def test_basic_triples():
    rows = parse_turtle("""
@prefix ex: <http://example.org/> .
@prefix dcterms: <http://purl.org/dc/terms/> .
ex:doc a ex:Document ;
    dcterms:title "Hello"@en , "Hallo"@de ;
    dcterms:issued "2014-01-04"^^<http://www.w3.org/2001/XMLSchema#date> ;
    ex:rank 3 ;
    ex:score 3.25 ;
    ex:ok true .
""")
    d = _idx(rows)
    assert d[("http://example.org/doc", RDF_TYPE)]["obj_value"] == \
        "http://example.org/Document"
    titles = {(r["obj_value"], r["obj_lang"]) for r in rows
              if r["pred"] == "http://purl.org/dc/terms/title"}
    assert titles == {("Hello", "en"), ("Hallo", "de")}
    issued = d[("http://example.org/doc",
                "http://purl.org/dc/terms/issued")]
    assert issued["obj_datatype"].endswith("#date")
    assert d[("http://example.org/doc", "http://example.org/rank")][
        "obj_datatype"].endswith("#integer")
    assert d[("http://example.org/doc", "http://example.org/score")][
        "obj_datatype"].endswith("#decimal")
    assert d[("http://example.org/doc", "http://example.org/ok")][
        "obj_value"] == "true"


def test_long_strings_and_escapes():
    rows = parse_turtle(r'''
@prefix ex: <http://example.org/> .
ex:a ex:p """multi
line "quoted" text""" ;
     ex:q "tab\there\nand å" .
''')
    vals = {r["obj_value"] for r in rows}
    assert 'multi\nline "quoted" text' in vals
    assert "tab\there\nand å" in vals


def test_bnodes_and_collections():
    rows = parse_turtle("""
@prefix ex: <http://example.org/> .
ex:a ex:parts ( ex:x ex:y ) ;
     ex:meta [ ex:k "v" ] .
ex:b ex:empty ( ) .
""")
    d = _idx(rows)
    head = d[("http://example.org/a", "http://example.org/parts")]
    assert head["obj_type"] == "bnode"
    first = d[(head["obj_value"], RDF_FIRST)]
    assert first["obj_value"] == "http://example.org/x"
    rest = d[(head["obj_value"], RDF_REST)]
    last = d[(rest["obj_value"], RDF_REST)]
    assert last["obj_value"] == RDF_NIL
    meta = d[("http://example.org/a", "http://example.org/meta")]
    assert d[(meta["obj_value"], "http://example.org/k")][
        "obj_value"] == "v"
    assert d[("http://example.org/b", "http://example.org/empty")][
        "obj_value"] == RDF_NIL


def test_base_and_relative_iris():
    rows = parse_turtle("""
@base <http://example.org/dir/> .
<doc> <p> <#frag> .
""")
    (r,) = rows
    assert r["subj"] == "http://example.org/dir/doc"
    assert r["obj_value"] == "http://example.org/dir/doc#frag" or \
        r["obj_value"].endswith("#frag")


def test_errors():
    with pytest.raises(TurtleParseError):
        parse_turtle("ex:a ex:b ex:c .")  # undefined prefix
    with pytest.raises(TurtleParseError):
        parse_turtle("@prefix ex: <http://e/> . ex:a ex:b ")  # no dot


def test_ntriples_roundtrip():
    lines = "\n".join([
        '<http://e/s> <http://e/p> <http://e/o> .',
        '<http://e/s> <http://e/t> "lit\\nval" .',
        '<http://e/s> <http://e/t> "hej"@sv .',
        '<http://e/s> <http://e/n> "4"^^<http://www.w3.org/2001/XMLSchema#integer> .',
        '_:b1 <http://e/p> _:b2 .',
    ])
    rows = parse_ntriples(lines)
    assert len(rows) == 5
    assert rows[1]["obj_value"] == "lit\nval"
    assert rows[2]["obj_lang"] == "sv"
    assert rows[3]["obj_datatype"].endswith("#integer")
    assert rows[4]["subj"] == "_:b1" and rows[4]["obj_type"] == "bnode"


@needs_vocab
def test_reference_vocabularies_parse():
    counts = {}
    for p in sorted(glob.glob(VOCABDIR + "/*.ttl")):
        rows = parse_turtle(open(p, encoding="utf8").read())
        counts[os.path.basename(p)] = len(rows)
        # every row well-formed
        for r in rows:
            assert r["subj"] and r["pred"]
            assert r["obj_type"] in ("uri", "literal", "bnode")
    # whole-family sanity: every vocab yields triples
    assert all(n > 0 for n in counts.values())
    assert counts["bibo.ttl"] == 878
    assert counts["skos.ttl"] == 252


DATADIR = "/root/reference/test/files/datasets"


@pytest.mark.skipif(not os.path.exists(DATADIR),
                    reason="reference fixtures not available")
def test_reference_dataset_fixtures_parse():
    """Every Turtle / N-Triples fixture in the reference's datasets
    corpus parses (the inputs of its triple-store integration suite)."""
    seen = 0
    for p in sorted(glob.glob(DATADIR + "/*.ttl")):
        rows = parse_turtle(open(p, encoding="utf8").read())
        assert rows, p
        seen += len(rows)
    for p in sorted(glob.glob(DATADIR + "/*.nt")):
        rows = parse_ntriples(open(p, encoding="utf8").read())
        assert rows, p
        seen += len(rows)
    assert seen > 3800  # incl. the 3700-triple rfc.nt corpus


@needs_vocab
def test_reference_commondata_spot_facts():
    rows = parse_turtle(
        open("/root/reference/ferenda/res/extra/base.ttl",
             encoding="utf8").read())
    d = _idx(rows)
    assert d[("http://github.com/staffanm/ferenda", RDF_TYPE)][
        "obj_value"] == "http://xmlns.com/foaf/0.1/Project"
    r = d[("http://github.com/staffanm/ferenda",
           "http://www.w3.org/2000/01/rdf-schema#comment")]
    assert r["obj_lang"] == "en"


@needs_vocab
def test_turtle_table_feeds_broadcast():
    t = turtle_table(
        [open(p, encoding="utf8").read()
         for p in glob.glob(VOCABDIR + "/*.ttl")], graph="vocab")
    assert t.num_rows > 10000
    assert t.column("graph")[0].as_py() == "vocab"
    assert set(t.column_names) >= {"subj", "pred", "obj_type",
                                   "obj_value", "obj_lang",
                                   "obj_datatype", "graph"}


def test_engine_nt_dump_reads_back(tmp_path):
    """The engine's own materialized .nt output must parse losslessly
    (dump → read round trip, the relate_all_setup/teardown analogue)."""
    import glob as g
    parts = g.glob("/tmp/verify_kg/out/bucket=*/part.nt")
    if not parts:
        pytest.skip("no materialized .nt present")
    rows = parse_ntriples(open(parts[0], encoding="utf8").read())
    assert rows and all(r["subj"].startswith("http") or
                        r["subj"].startswith("_:") for r in rows)
