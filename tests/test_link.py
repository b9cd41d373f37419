"""Entity linker: exact scan, longest-first, ambiguity rule, fuzzy
lookup (lookup_resource analogue, documentrepository.py:500-548)."""

import pyarrow as pa

from ferenda_ray import ns
from ferenda_ray.schema import TRIPLES
from ferenda_ray.stages.link import EntityLinker

ALIASES = [
    {"alias": "quicksilver", "label": "quicksilver",
     "entity_uri": "https://example.org/entity/quicksilver"},
    {"alias": "quick silver", "label": "quicksilver",
     "entity_uri": "https://example.org/entity/quick_silver"},
    {"alias": "ambig", "label": "b-side",
     "entity_uri": "https://example.org/entity/bbb"},
    {"alias": "ambig", "label": "a-side",
     "entity_uri": "https://example.org/entity/aaa"},
]


def _mention_batch(texts):
    n = len(texts)
    return pa.table({
        "subj": [f"https://example.org/res/o/r/f{i}.py@c" for i in range(n)],
        "pred": [ns.FR_MENTIONS] * n,
        "obj_type": ["mention"] * n,
        "obj_value": texts,
        "obj_lang": [None] * n,
        "obj_datatype": [None] * n,
        "graph": ["g"] * n,
        "src_repo": ["o/r"] * n,
        "src_path": [f"f{i}.py" for i in range(n)],
    }, schema=TRIPLES)


def test_exact_and_multiword():
    lk = EntityLinker(ALIASES)
    assert lk.entities_in("some quicksilver here") == \
        ["https://example.org/entity/quicksilver"]
    # multi-word alias matches as a phrase (longest-first alternation)
    assert lk.entities_in("liquid quick silver flows") == \
        ["https://example.org/entity/quick_silver"]
    assert lk.entities_in("nothing to find") == []


def test_case_insensitive():
    lk = EntityLinker(ALIASES)
    assert lk.entities_in("QuickSilver rises") == \
        ["https://example.org/entity/quicksilver"]


def test_ambiguous_alias_resolves_deterministically():
    lk = EntityLinker(ALIASES)
    # lexicographically smallest candidate wins
    assert lk.entities_in("the ambig term") == \
        ["https://example.org/entity/aaa"]


def test_fuzzy_lookup_cutoff():
    lk = EntityLinker(ALIASES, fuzzy_cutoff=0.8)
    assert lk.lookup_resource("quicksilvre") == \
        "https://example.org/entity/quicksilver"
    assert lk.lookup_resource("zzzzz") is None


def test_batch_passthrough_and_resolution():
    lk = EntityLinker(ALIASES)
    mentions = _mention_batch(["about quicksilver", "nothing"])
    passthrough = pa.table({
        "subj": ["s"], "pred": ["p"], "obj_type": ["literal"],
        "obj_value": ["v"], "obj_lang": [None], "obj_datatype": [None],
        "graph": ["g"], "src_repo": [None], "src_path": [None],
    }, schema=TRIPLES)
    out = lk(pa.concat_tables([passthrough, mentions]))
    kinds = out.column("obj_type").to_pylist()
    assert "mention" not in kinds
    subj_triples = [
        (s, o) for s, p, o in zip(out.column("subj").to_pylist(),
                                  out.column("pred").to_pylist(),
                                  out.column("obj_value").to_pylist())
        if p == ns.DCTERMS_SUBJECT]
    assert subj_triples == [
        ("https://example.org/res/o/r/f0.py@c",
         "https://example.org/entity/quicksilver")]
    # non-mention row passed through untouched
    assert "v" in out.column("obj_value").to_pylist()


def test_empty_alias_table():
    lk = EntityLinker([])
    assert lk.entities_in("anything") == []
    out = lk(_mention_batch(["text"]))
    assert out.num_rows == 0


def test_ambiguity_report():
    import pyarrow as pa
    from ferenda_ray.stages.link import ambiguity_report
    aliases = pa.table({
        "alias": ["foo", "foo", "bar"],
        "entity_uri": ["https://x/b", "https://x/a", "https://x/c"]})
    rep = ambiguity_report(aliases)
    assert rep.to_pylist() == [
        {"alias": "foo", "n_candidates": 2, "chosen_uri": "https://x/a"}]
