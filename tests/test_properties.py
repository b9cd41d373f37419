# -*- coding: utf-8 -*-
"""Property-based hardening (hypothesis) for the self-contained
parsers: Turtle/N-Triples round-trips, PDF object tokenizer
round-trips, fingerprint normalization invariants."""

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from ferenda_ray.sources.turtle import (
    parse_ntriples, parse_turtle, to_nt_line,
)

SETTINGS = dict(max_examples=60, deadline=None)

# IRI-safe characters (no whitespace/angle brackets/quotes/controls)
_IRI_CHARS = string.ascii_letters + string.digits + "/#._-~%?=&"
iris = st.text(_IRI_CHARS, min_size=1, max_size=40).map(
    lambda s: "http://x.test/" + s)
# literal text: any printable unicode minus surrogates
texts = st.text(
    st.characters(blacklist_categories=("Cs", "Cc")), max_size=80)
langs = st.one_of(st.none(), st.sampled_from(["en", "sv", "de", "pt-BR"]))


@st.composite
def triple_rows(draw):
    lang = draw(langs)
    dtype = None if lang else draw(st.one_of(st.none(), iris))
    return {
        "subj": draw(iris), "pred": draw(iris),
        "obj_type": "literal", "obj_value": draw(texts),
        "obj_lang": lang, "obj_datatype": dtype,
    }


@given(st.lists(triple_rows(), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_ntriples_roundtrip_property(rows):
    text = "\n".join(to_nt_line(r) for r in rows)
    back = parse_ntriples(text)
    assert [(r["subj"], r["pred"], r["obj_value"],
             r["obj_lang"], r["obj_datatype"]) for r in back] == \
        [(r["subj"], r["pred"], r["obj_value"],
          r["obj_lang"], r["obj_datatype"]) for r in rows]


@given(texts, st.sampled_from(["en", "sv", None]))
@settings(**SETTINGS)
def test_turtle_literal_roundtrip(value, lang):
    # serialize a literal with full escaping through the Turtle parser
    esc = (value.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n").replace("\r", "\\r"))
    tag = "@%s" % lang if lang else ""
    doc = ('@prefix ex: <http://e/> .\n'
           'ex:s ex:p "%s"%s .' % (esc, tag))
    (row,) = parse_turtle(doc)
    assert row["obj_value"] == value
    assert row["obj_lang"] == lang


@given(st.lists(st.tuples(iris, iris), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_turtle_uri_objects(pairs):
    body = " ;\n  ".join("<%s> <%s>" % (p, o) for p, o in pairs)
    doc = "<http://e/s> %s ." % body
    rows = parse_turtle(doc)
    assert [(r["pred"], r["obj_value"]) for r in rows] == pairs
    assert all(r["obj_type"] == "uri" for r in rows)


# --- PDF object tokenizer round-trip ---------------------------------------

pdf_names = st.text(string.ascii_letters + string.digits, min_size=1,
                    max_size=10)
pdf_strings = st.binary(max_size=24)
pdf_numbers = st.one_of(st.integers(-10**6, 10**6),
                        st.floats(-1e6, 1e6, allow_nan=False,
                                  allow_infinity=False, width=32))

pdf_values = st.recursive(
    st.one_of(pdf_names.map(lambda n: ("name", n)),
              pdf_strings.map(lambda b: ("str", b)),
              pdf_numbers.map(lambda n: ("num", n)),
              st.booleans().map(lambda b: ("bool", b))),
    lambda children: st.one_of(
        st.lists(children, max_size=4).map(lambda xs: ("arr", xs)),
        st.dictionaries(pdf_names, children, max_size=4)
        .map(lambda d: ("dict", d))),
    max_leaves=12)


def _ser(v):
    kind, val = v
    if kind == "name":
        return "/" + val
    if kind == "str":
        return "<%s>" % val.hex()
    if kind == "num":
        # PDF syntax has no exponent notation — always fixed-point
        return "%.6f" % val if isinstance(val, float) else str(val)
    if kind == "bool":
        return "true" if val else "false"
    if kind == "arr":
        return "[ %s ]" % " ".join(_ser(x) for x in val)
    return "<< %s >>" % " ".join(
        "/%s %s" % (k, _ser(x)) for k, x in val.items())


def _norm(v):
    kind, val = v
    if kind == "name":
        return str(val)
    if kind == "str":
        return bytes(val)
    if kind == "num":
        return round(float(val), 6) if isinstance(val, float) else val
    if kind == "bool":
        return val
    if kind == "arr":
        return [_norm(x) for x in val]
    return {k: _norm(x) for k, x in val.items()}


def _norm_parsed(v):
    if isinstance(v, dict):
        return {k: _norm_parsed(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm_parsed(x) for x in v]
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, str):
        return str(v)
    return v


@given(pdf_values)
@settings(**SETTINGS)
def test_minipdf_object_roundtrip(value):
    from ferenda_ray.sources.minipdf import _parse
    data = _ser(value).encode("latin-1") + b" "
    parsed, _ = _parse(data, 0)
    assert _norm_parsed(parsed) == _norm(value)


# --- fingerprint invariants -------------------------------------------------

@given(st.text(string.ascii_lowercase + "  \t\n", min_size=1,
               max_size=200))
@settings(**SETTINGS)
def test_fingerprint_whitespace_invariant(s):
    from ferenda_ray.stages.text_analysis import Fingerprinter
    fp = Fingerprinter()
    a = fp.fingerprint(s)
    b = fp.fingerprint(" ".join(s.split()))
    assert a == b


@given(st.text(string.printable, max_size=120))
@settings(**SETTINGS)
def test_simhash_bounded(s):
    from ferenda_ray.stages.dedup import SimHasher
    h = SimHasher().simhash64(s)
    assert 0 <= h < (1 << 64)
    assert h == SimHasher().simhash64(s)  # deterministic


# --- targeted edge cases for the new parsers --------------------------------

def test_minipdf_literal_string_escapes():
    from ferenda_ray.sources.minipdf import _parse
    v, _ = _parse(rb"(a\)b\(c \n \101 \\ end)", 0)
    assert v == b"a)b(c \n A \\ end"
    # nested parens without escapes
    v, _ = _parse(b"(outer (inner) tail)", 0)
    assert v == b"outer (inner) tail"
    # line continuation backslash-newline disappears
    v, _ = _parse(b"(split\\\nline)", 0)
    assert v == b"splitline"


def test_turtle_relative_iri_edges():
    from ferenda_ray.sources.turtle import parse_turtle
    rows = parse_turtle('@base <http://e/a/b> .\n<c> <p> <#f> .')
    (r,) = rows
    assert r["subj"] == "http://e/a/c"      # replace last segment
    assert r["obj_value"] == "http://e/a/bc" or \
        r["obj_value"] == "http://e/a/b#f"  # fragment appends to base


def test_hll_empty_and_single():
    from ferenda_ray.stages.sketches import HyperLogLog
    assert HyperLogLog(8).estimate() == 0.0
    h = HyperLogLog(8).add_many(["only"])
    assert 0.5 < h.estimate() < 2


def test_quantile_digest_constant_and_empty():
    import math

    from ferenda_ray.stages.sketches import QuantileDigest
    d = QuantileDigest(16).add_many([5.0] * 1000)
    assert d.quantile(0.5) == 5.0 and d.quantile(0.99) == 5.0
    assert math.isnan(QuantileDigest(16).quantile(0.5))


def test_wordlike_decoders_reject_garbage():
    import pytest as _pt

    from ferenda_ray.functions.codecs import (
        MediaDecodeError, decode_bmp, decode_png, decode_wav)
    for fn in (decode_png, decode_bmp):
        with _pt.raises(MediaDecodeError):
            fn(b"garbage not an image")
    with _pt.raises(MediaDecodeError):
        decode_wav(b"RIFFxxxxWAVEbroken")


# --- codec round-trip properties ------------------------------------------

@settings(max_examples=25, deadline=None)
@given(st.integers(2, 24), st.integers(2, 24), st.integers(0, 2**32 - 1),
       st.integers(2, 8))
def test_gif_roundtrip_exact(h, w, seed, ncolors):
    import numpy as np
    from ferenda_ray.functions.codecs import decode_gif, encode_gif
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, (h, w))
    frame = palette[idx]
    frames = decode_gif(encode_gif([frame]))
    assert len(frames) == 1
    assert (frames[0]["px"] == frame).all()   # GIF is lossless


@settings(max_examples=15, deadline=None)
@given(st.integers(8, 40), st.integers(8, 40), st.integers(0, 2**32 - 1))
def test_jpeg_roundtrip_psnr(h, w, seed):
    import numpy as np
    from ferenda_ray.functions.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(seed)
    # smooth content (JPEG's domain): low-frequency gradients
    yy, xx = np.mgrid[0:h, 0:w]
    a, b, c = rng.uniform(0, 255, 3)
    px = np.stack([
        (a + xx * 2) % 256, (b + yy * 2) % 256,
        (c + xx + yy) % 256], axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == px.shape
    mse = np.mean((out.astype(float) - px.astype(float)) ** 2)
    assert mse < 255**2 / 10**(30 / 10)       # PSNR > 30 dB


# ---------------------------------------------------------------------------
# chunking / packing / substring-dedup invariants (no Ray needed for
# the pure kernels: drive tiny Datasets through the session fixture)

ascii_texts = st.lists(
    st.text(alphabet="abcdef ", min_size=0, max_size=60),
    min_size=1, max_size=12)


@settings(max_examples=20, deadline=None)
@given(ascii_texts, st.integers(2, 10), st.integers(1, 5))
def test_chunks_cover_every_token_in_order(ray_session, texts, c, o):
    from ferenda_ray.stages.text_analysis import chunk_documents
    if o >= c:
        o = c - 1
    import pyarrow as pa
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    per = {}
    for r in chunk_documents(ds, c, o).take_all():
        per.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        rows = sorted(per[i], key=lambda r: r["chunk_id"])
        # first chunk starts at token 0; consecutive starts differ by
        # stride; the last chunk reaches the final token
        stride = c - o
        assert rows[0]["chunk_text"].startswith(
            " ".join(toks[:c])[:len(rows[0]["chunk_text"])])
        last = rows[-1]
        s_last = (len(rows) - 1) * stride
        assert " ".join(toks[s_last:s_last + c]) == last["chunk_text"]
        assert s_last + last["n_tokens"] == len(toks)
        # overlap reconstruction: stitching chunks at stride
        # boundaries reproduces the doc exactly
        stitched = list(toks[:0])
        for j, r in enumerate(rows):
            ct = r["chunk_text"].split(" ") if r["chunk_text"] or \
                r["n_tokens"] else []
            start = j * stride
            stitched[start:start + len(ct)] = ct
        assert stitched == toks


@settings(max_examples=15, deadline=None)
@given(ascii_texts)
def test_ngram_stats_bounds(ray_session, texts):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.dedup import ngram_dup_stats
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    for r in ngram_dup_stats(ds, n=4, stride=2).take_all():
        assert 0 <= r["dup_grams"] <= r["total_grams"]


@settings(max_examples=15, deadline=None)
@given(ascii_texts)
# regression: zero-length doc AFTER a fully-covered doc in the same
# batch — the old reduceat clamp stole the covered doc's last byte
@example(texts=['', '', '', '', 'aaaaaa', 'aaaaaa'])
def test_remove_spans_never_lengthens(ray_session, texts):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.dedup import remove_duplicated_spans
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    rows = {r["doc_id"]: r for r in
            remove_duplicated_spans(ds, n=6).take_all()}
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        r = rows[i]
        assert len(r["clean_text"]) + r["n_removed"] == len(t)
        # removal deletes contiguous spans: the cleaned text is a
        # subsequence of the original
        it = iter(t)
        assert all(c in it for c in r["clean_text"])


@settings(max_examples=15, deadline=None)
@given(ascii_texts, st.integers(2, 50))
def test_pack_offsets_are_exact_prefix_sums(ray_session, texts, seq):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import pack_sequence_offsets
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    rows = sorted(pack_sequence_offsets(ds, seq_len=seq,
                                        docs_per_part=3).take_all(),
                  key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["token_start"] == acc
        assert r["seq_id"] == acc // seq
        assert r["seq_offset"] == acc % seq
        acc += r["n_tokens"]
    assert acc == sum(t.count(" ") + 1 for t in texts)


@settings(max_examples=10, deadline=None)
@given(ascii_texts)
def test_perplexity_bigram_counts(ray_session, texts):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import perplexity_score
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    rows = {r["doc_id"]: r for r in perplexity_score(ds).take_all()}
    for i, t in enumerate(texts):
        n_tok = t.count(" ") + 1
        if n_tok < 2:
            assert i not in rows
        else:
            assert rows[i]["n_bigrams"] == n_tok - 1
            assert rows[i]["bits_per_bigram"] >= 0


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 500), min_size=1, max_size=40,
                unique=True),
       st.integers(1, 6))
def test_stratified_sample_bounds_and_stability(ray_session, ids, k):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.sample import stratified_sample
    langs = ["en", "de"]
    tbl = pa.table({"doc_id": ids,
                    "lang": [langs[i % 2] for i in ids]})
    a = stratified_sample(rd.from_arrow(tbl), "lang", k=k).take_all()
    b = stratified_sample(rd.from_arrow(tbl).repartition(5),
                          "lang", k=k).take_all()
    per = {}
    for r in a:
        per.setdefault(r["lang"], set()).add(r["doc_id"])
    for g, members in per.items():
        avail = sum(1 for i in ids if langs[i % 2] == g)
        assert len(members) == min(k, avail)
    # partitioning-independent (deterministic md5 order)
    assert sorted((r["lang"], r["doc_id"]) for r in a) == \
        sorted((r["lang"], r["doc_id"]) for r in b)


@settings(max_examples=10, deadline=None)
@given(ascii_texts)
def test_corpus_diff_self_is_empty_and_antisymmetric(ray_session,
                                                     texts):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.dedup import corpus_diff
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    ds = rd.from_arrow(t).materialize()
    assert corpus_diff(ds, ds).take_all() == []
    # drop the first doc from one side: added<->removed swap
    rest = rd.from_arrow(t.slice(1)).materialize()
    fwd = corpus_diff(ds, rest).take_all()
    rev = corpus_diff(rest, ds).take_all()
    assert [(r["doc_id"], r["status"]) for r in fwd] == [(0, "removed")]
    assert [(r["doc_id"], r["status"]) for r in rev] == [(0, "added")]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(0, 60), min_size=1, max_size=30,
                unique=True),
       st.lists(st.integers(0, 80), min_size=1, max_size=15,
                unique=True))
def test_upsert_equals_dict_merge(ray_session, tmp_path_factory,
                                  base_ids, delta_ids):
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages import sinks
    out = str(tmp_path_factory.mktemp("ups") / "out")
    base = pa.table({"doc_id": base_ids,
                     "text": [f"base {i}" for i in base_ids]})
    delta = pa.table({"doc_id": delta_ids,
                      "text": [f"delta {i}" for i in delta_ids]})
    sinks.write_partitioned(rd.from_arrow(base), out, "doc_id",
                            num_buckets=4)
    sinks.upsert_partitioned(rd.from_arrow(delta), out, "doc_id")
    got = {r["doc_id"]: r["text"]
           for r in sinks.read_partitioned(out).take_all()}
    exp = {i: f"base {i}" for i in base_ids}
    exp.update({i: f"delta {i}" for i in delta_ids})
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=30),
                min_size=1, max_size=8),
       st.integers(1, 5))
def test_bpe_train_matches_reference_on_random_corpora(
        ray_session, texts, m):
    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.text_analysis import bpe_train
    from tests.test_text_analysis import _reference_bpe
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(texts))),
                                 "text": texts}))
    # tiny alphabet forces heavy pair-count ties: the (freq desc,
    # left, right) tie-break must agree exactly with the reference
    assert bpe_train(ds, num_merges=m) == _reference_bpe(texts, m)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=40))
def test_neardup_clusters_match_reference_cc(ray_session, edges):
    # random edge set: cluster assignment must equal a plain
    # union-find reference over the same edges (min-id canonical)
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.dedup import neardup_clusters

    n = 31
    docs = rd.from_arrow(pa.table({"doc_id": list(range(n)),
                                   "text": ["x"] * n}))
    edges = [(a, b) for a, b in edges if a != b]
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))
    got = {r["doc_id"]: r["cluster_id"]
           for r in neardup_clusters(docs, pairs).take_all()}

    # reference: naive repeated-merge components
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    want = {m: min(ms) for ms in comp.values() for m in ms}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(ascii_texts, st.integers(1, 40))
def test_token_budget_matches_bruteforce(ray_session, texts, budget):
    import hashlib

    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.sample import token_budget_sample

    langs = ["en" if i % 2 else "de" for i in range(len(texts))]
    tbl = pa.table({"doc_id": list(range(len(texts))),
                    "lang": langs, "text": texts})
    got = sorted((r["doc_id"], r["cum_tokens"]) for r in
                 token_budget_sample(rd.from_arrow(tbl).repartition(3),
                                     budget=budget,
                                     hash_parts=8).take_all())

    def h(i):
        return (int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[8:16], "little")
            & 0x7FFFFFFFFFFFFFFF)

    want = []
    for lang in set(langs):
        ids = [i for i, l in enumerate(langs) if l == lang]
        acc = 0
        for i in sorted(ids, key=lambda i: (h(i), i)):
            ntok = len(texts[i].split())
            acc += ntok
            if acc > budget:
                break
            want.append((i, acc))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(-40, 40))
def test_phash_brightness_invariance(seed, shift):
    import numpy as np
    from ferenda_ray.functions.codecs import phash64

    rng = np.random.default_rng(seed)
    px = rng.integers(40, 216, (16, 16, 3), dtype=np.uint8)
    shifted = np.clip(px.astype(np.int16) + shift, 0,
                      255).astype(np.uint8)
    d = bin(phash64(px) ^ phash64(shifted)).count("1")
    assert d <= 2, d


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1), st.floats(0.3, 1.0))
def test_audio_fingerprint_gain_invariance(seed, gain):
    import numpy as np
    from ferenda_ray.functions.codecs import audio_fingerprint64

    rng = np.random.default_rng(seed)
    rate = 4000
    t = np.arange(rate) / rate
    f = 100 + (seed % 900)
    sig = (0.5 * np.sin(2 * np.pi * f * t)
           + 0.1 * np.sin(2 * np.pi * 2.7 * f * t))
    h1 = audio_fingerprint64(sig, rate)
    h2 = audio_fingerprint64(
        gain * sig + 0.01 * rng.standard_normal(len(t)), rate)
    assert bin(h1 ^ h2).count("1") <= 6


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=2, max_size=25,
                unique=True),
       st.integers(0, 10))
def test_hamming_pairs64_equals_bruteforce(ray_session, hashes,
                                           max_hamming):
    # the banded kernel (vectorized shift/mask explosion + pigeonhole
    # blocking) must return EXACTLY the brute-force <=h pair set for
    # any hash multiset and any band count
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ferenda_ray.stages.dedup import hamming_pairs64

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(hashes))), pa.int64()),
        "h": pa.array(np.array(hashes, dtype=np.uint64),
                      pa.uint64())})).repartition(3)
    got = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in
                 hamming_pairs64(ds, hash_col="h",
                                 max_hamming=max_hamming).take_all())
    want = sorted(
        (i, j, bin(hashes[i] ^ hashes[j]).count("1"))
        for i in range(len(hashes)) for j in range(i + 1, len(hashes))
        if bin(hashes[i] ^ hashes[j]).count("1") <= max_hamming)
    assert got == want
