"""Extraction stage golden conformance (no Ray needed: extract_batch is
a pure Arrow-in/Arrow-out function).

The analogue of the reference's distill_test (parse a fixture, compare
the distilled graph to a checked-in golden, testutil.py:648-668) — here
the golden is computed by the corpus generator, independently of the
extraction code."""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ferenda_ray import ns
from ferenda_ray.corpus import TRIPLE_FIELDS
from ferenda_ray.stages.extract import extract_batch
from ferenda_ray.stages.link import EntityLinker
from ferenda_ray.stages.canonicalize import _Rewriter, mapping_from_sameas
from ferenda_ray.pipelines.kg import vocab_as_triples


def _keyset(t: pa.Table):
    return set(zip(*[t.column(k).to_pylist() for k in TRIPLE_FIELDS]))


def test_extract_matches_golden(corpus):
    out = extract_batch(corpus["sources"])
    linked = EntityLinker(corpus["aliases"].to_pylist())(out)
    all_t = pa.concat_tables(
        [linked, vocab_as_triples(corpus["vocab_triples"])])
    canon = _Rewriter(mapping_from_sameas(corpus["sameas"]))(all_t)
    got = _keyset(canon)
    exp = _keyset(corpus["expected_triples"])
    tp = len(got & exp)
    precision = tp / len(got)
    recall = tp / len(exp)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # in fact the engine is exact on its own corpus
    assert got == exp


def test_sha256_invariant(corpus):
    """Per-row content sha256 carried through extraction
    (the driver's per-row invariant)."""
    src = corpus["sources"]
    out = extract_batch(src)
    sha_rows = out.filter(pc.equal(out.column("pred"), ns.FR_CONTENT_SHA256))
    assert sha_rows.num_rows == src.num_rows
    by_doc = dict(zip(zip(sha_rows.column("src_repo").to_pylist(),
                          sha_rows.column("src_path").to_pylist()),
                      sha_rows.column("obj_value").to_pylist()))
    for repo, path, content in zip(src.column("repo").to_pylist(),
                                   src.column("path").to_pylist(),
                                   src.column("content").to_pylist()):
        assert by_doc[(repo, path)] == \
            hashlib.sha256(content.encode()).hexdigest()


def test_error_row_on_unparseable():
    """FSMStateError → per-row error record, not an exception
    (fsmparser.py:150-152; SURVEY.md §7.4)."""
    from ferenda_ray import recognizers
    from ferenda_ray.fsm import FSMStateError

    def boom(content):
        raise FSMStateError("synthetic failure")

    recognizers.PARSERS["boomlang"] = boom
    try:
        batch = pa.table({
            "repo": ["o/r"], "path": ["x.b"], "commit": ["c" * 40],
            "lang": ["boomlang"], "content": ["whatever"],
        })
        out = extract_batch(batch)
        kinds = out.column("obj_type").to_pylist()
        assert "error" in kinds
        # sha256 invariant still present for the failed row
        preds = out.column("pred").to_pylist()
        assert ns.FR_CONTENT_SHA256 in preds
    finally:
        del recognizers.PARSERS["boomlang"]


def test_mention_rows_present(corpus):
    out = extract_batch(corpus["sources"])
    mask = pc.equal(out.column("obj_type"), "mention")
    assert pc.sum(mask).as_py() > 0
    # mentions attach to document URIs (doc-level dcterms:subject)
    m = out.filter(mask)
    assert all("#" not in s for s in m.column("subj").to_pylist())
