"""CitationParser / URIFormatter semantics (citationparser.py:65-165)."""

from ferenda_ray.citations import (
    CitationParser, URIFormatter, extract_reference_uris)
from ferenda_ray.uri import DEFAULT_BASE


def test_parse_string_segments():
    p = CitationParser()
    segs = p.parse_string("before see org0/repo1:src/a.py#S2 after")
    assert segs[0] == "before "
    assert isinstance(segs[1], tuple)
    text, name, d = segs[1]
    assert name == "code_ref"
    assert d == {"repo": "org0/repo1", "path": "src/a.py", "ordinal": "2"}
    # matched span absorbs trailing whitespace (reference scanString
    # semantics, proven by the citation/url fixture suite)
    assert text == "see org0/repo1:src/a.py#S2 "
    assert segs[2] == "after"


def test_trailing_period_not_captured():
    uris = extract_reference_uris("see org0/repo1:src/pkg0/mod_01.java.")
    assert uris == [f"{DEFAULT_BASE}ref/org0/repo1/src/pkg0/mod_01.java"]
    uris = extract_reference_uris("see o/r:a/b.md#S1.2.")
    assert uris == [f"{DEFAULT_BASE}ref/o/r/a/b.md#S1.2"]


def test_multiple_and_none():
    text = "see a/b:x.py and also see c/d:y/z.go#S3"
    assert extract_reference_uris(text) == [
        f"{DEFAULT_BASE}ref/a/b/x.py",
        f"{DEFAULT_BASE}ref/c/d/y/z.go#S3",
    ]
    assert extract_reference_uris("no citations here") == []


def test_url_grammar_detected_but_not_a_corpus_ref():
    p = CitationParser()
    hits = list(p.citations("visit https://docs.example/x?q=1 now"))
    assert hits[0][0] == "url"
    # formatter maps urls to None -> excluded from reference URIs
    assert extract_reference_uris("visit https://docs.example/x now") == []


def test_custom_formatter_dispatch():
    # URIFormatter dispatch-by-name (uriformatter.py:7-52)
    fmt = URIFormatter(extra={"code_ref": lambda d: "override:" + d["path"]})
    assert fmt.format("code_ref", {"path": "p"}) == "override:p"
    assert fmt.format("unknown", {}) is None
