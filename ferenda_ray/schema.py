"""Canonical Arrow schemas for every logical table in the engine.

The triple row layout follows SURVEY.md §1.3: it is the engine's
interchange format, the analogue of the reference's N-Triples dump
(``ferenda/documentrepository.py:1813-1883``).  ``obj_type`` admits two
transient values beyond the RDF ones: ``"mention"`` rows carry prose
awaiting the entity-linking actor pool, and ``"error"`` rows carry
per-document parse failures (poison-pill isolation, SURVEY.md §7.4 —
the analogue of ferenda recording per-doc errors in
``DocumentEntry.status``, ``ferenda/decorators.py:379-393``).
"""

import pyarrow as pa

SOURCES = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.string()),
])

TRIPLES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj_type", pa.string()),      # uri | literal | bnode | mention | error
    ("obj_value", pa.large_string()),
    ("obj_lang", pa.string()),
    ("obj_datatype", pa.string()),
    ("graph", pa.string()),
    ("src_repo", pa.string()),      # lineage
    ("src_path", pa.string()),
])

TRIPLE_KEY = ["subj", "pred", "obj_type", "obj_value", "obj_lang",
              "obj_datatype"]

ALIASES = pa.schema([
    ("alias", pa.string()),
    ("label", pa.string()),
    ("entity_uri", pa.string()),
])

MANIFEST = pa.schema([
    ("partition", pa.string()),
    ("shard_file", pa.string()),
    ("rows", pa.int64()),
    ("min_subj", pa.string()),
    ("max_subj", pa.string()),
    ("content_sha256", pa.string()),  # sha256 over the shard's sorted keys
])


def empty_triples() -> pa.Table:
    return TRIPLES.empty_table()
