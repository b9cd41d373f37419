"""Text-analysis operators: language ID, token counts, quality score,
winnowing fingerprints."""

import pyarrow as pa
import pytest

from ferenda_ray.stages import text_analysis as ta


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the cat and the dog went to the house in a day",
            "der Hund und die Katze ist nicht ein Tier mit Namen",
            "xy zq wp",                       # no stopwords -> und
            "Hello, world! It is a test; punctuation: 50%?",
        ],
    })
    return rd.from_arrow(t).materialize()


def test_language_id(docs_ds):
    out = {r["doc_id"]: r for r in ta.language_id(docs_ds).take_all()}
    assert out[0]["lang_pred"] == "en"
    assert out[1]["lang_pred"] == "de"
    assert out[2]["lang_pred"] == "und"
    assert out[0]["lang_score"] > 0.3


def test_token_count(docs_ds):
    out = {r["doc_id"]: r for r in ta.token_count(docs_ds).take_all()}
    assert out[0]["ws_tokens"] == 12
    assert out[2]["ws_tokens"] == 3
    # BPE-ish: "Hello" "," "world" "!" ... punctuation tokens counted
    assert out[3]["bpe_tokens"] > out[3]["ws_tokens"]
    assert out[0]["n_chars"] == len(
        "the cat and the dog went to the house in a day")


def test_quality_score(docs_ds):
    out = {r["doc_id"]: r for r in ta.quality_score(docs_ds).take_all()}
    # prose with stopwords scores higher than symbol soup
    assert out[0]["quality"] > out[2]["quality"]
    assert 0 <= out[3]["punct_ratio"] <= 1
    assert out[0]["stopword_ratio"] == round(7 / 12, 6)  # the×3,and,to,in,a
    r = out[3]
    assert 0 <= r["alpha_ratio"] <= 1 and 0 <= r["quality"] <= 1


def test_fingerprint_properties(docs_ds):
    out = {r["doc_id"]: r for r in ta.fingerprints(docs_ds).take_all()}
    assert all(r["fp_size"] >= 1 for r in out.values())
    # deterministic
    fp = ta.Fingerprinter()
    a = fp.fingerprint("the quick brown fox jumps over the lazy dog")
    b = fp.fingerprint("the quick brown fox jumps over the lazy dog")
    assert a == b
    # whitespace-insensitive (normalized)
    c = fp.fingerprint("the  quick   brown fox jumps over the lazy dog")
    assert a == c
    # small local edit preserves most fingerprint entries
    d = fp.fingerprint("the quick brown fox jumps over the lazy cat")
    inter = len(set(a) & set(d)) / len(set(a) | set(d))
    assert inter > 0.5


def test_fingerprint_short_inputs():
    fp = ta.Fingerprinter()
    assert fp.fingerprint("") == []
    assert len(fp.fingerprint("ab")) == 1


def test_fingerprint_md5_matches_duckdb():
    """The md5 k-gram hash must equal DuckDB md5_number_lower masked
    to int63 — that identity is what makes docs_fingerprints
    oracle-checkable."""
    import duckdb

    fp = ta.Fingerprinter(hash="md5")
    texts = ["the quick brown fox jumps over the lazy dog",
             "winnowing local algorithms for document fingerprinting",
             "ab", "tiny"]
    con = duckdb.connect()
    for s in texts:
        got = fp.fingerprint(s)
        sql = """
            WITH norm AS (SELECT ? AS s), grams AS (
              SELECT CAST(t.i AS BIGINT) AS i,
                     CAST(md5_number_lower(
                            substr(s, CAST(t.i AS INTEGER) + 1, 5))
                          & 9223372036854775807 AS BIGINT) AS h,
                     length(s) - 4 AS g
              FROM norm, UNNEST(range(0, greatest(length(s) - 4, 0)))
                   AS t(i))
            , winmin AS (
              SELECT g, i, min(h) OVER (ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
              FROM grams)
            SELECT DISTINCT m FROM winmin WHERE g > 4 AND i <= g - 4
            UNION
            SELECT min(h) FROM grams WHERE g <= 4 AND g > 0
            UNION
            SELECT CAST(md5_number_lower(s)
                        & 9223372036854775807 AS BIGINT)
            FROM norm WHERE length(s) > 0 AND length(s) < 5
        """
        # normalize the same way the Fingerprinter does
        norm = " ".join(s.split()).lower()
        want = sorted(int(r[0]) for r in
                      con.execute(sql, [norm]).fetchall()
                      if r[0] is not None)
        assert got == want, s


def test_repetition_stats(ray_session):
    import ray.data as rd
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b a b\na b a b", "one two three four five six",
                 "x x x x"]}))
    from ferenda_ray.stages.text_analysis import repetition_stats
    out = repetition_stats(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "dup_word_frac"] == 0.75       # 2 distinct / 8
    assert out.loc[1, "dup_line_frac"] == 0.5        # 1 distinct / 2
    assert not out.loc[1, "passes"]                  # dup_word >= 0.7
    assert out.loc[2, "passes"]
    assert not out.loc[3, "passes"]                  # < 5 words


def test_decontaminate_broadcast(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import (benchmark_ngrams,
                                                  decontaminate)
    docs = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox",      # benchmark (and itself)
                 "XX the quick brown fox YY",   # contains probe
                 "nothing to see here at all"]}))
    grams = benchmark_ngrams(docs.map_batches(
        lambda b: b.filter(pa.array(
            (b.column("doc_id").to_numpy() % 2) == 0)),
        batch_format="pyarrow"), n=4).take_all()
    assert [g["gram"] for g in grams] == ["the quick brown fox",
                                          "nothing to see here"]
    out = decontaminate(docs, [g["gram"] for g in grams],
                        n=4).to_pandas().set_index("doc_id")
    assert out["contaminated"].tolist() == [True, True, True]
    assert out.loc[1, "n_hits"] == 1
    # actor-pool plan gives identical output
    out2 = decontaminate(docs, [g["gram"] for g in grams], n=4,
                         concurrency=(1, 2)).to_pandas() \
        .set_index("doc_id")
    assert out2.equals(out)


def test_pii_scrub(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import pii_scrub
    docs = rd.from_arrow(pa.table({
        "doc_id": [1],
        "text": ["mail a@b.se or call +46 70-123 45 67 from 10.0.0.1"]}))
    out = pii_scrub(docs).to_pandas().iloc[0]
    assert (out["n_email"], out["n_phone"], out["n_ipv4"]) == (1, 1, 1)
    assert out["clean_text"] == "mail <EMAIL> or call <PHONE> from <IP>"


# ---------------------------------------------------------------------------
# bigram-LM perplexity (CCNet-style quality statistic)


def _brute_perplexity(texts, ids, alpha=0.5):
    import math
    from collections import Counter
    big = [(i, (a, b)) for i, t in zip(ids, texts)
           for a, b in zip(t.split(" "), t.split(" ")[1:])]
    cb = Counter(g for _, g in big)
    cu = Counter(g[0] for _, g in big)
    v = len({g[1] for _, g in big})
    out = {}
    for i in ids:
        gs = [g for j, g in big if j == i]
        if not gs:
            continue
        bits = [-math.log2((cb[g] + alpha) / (cu[g[0]] + alpha * v))
                for g in gs]
        out[i] = (len(bits), round(sum(bits) / len(bits), 6))
    return out


def test_perplexity_matches_brute_force(ray_session):
    import random

    import ray.data as rd
    rng = random.Random(11)
    words = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 30)))
             for _ in range(40)]
    ids = list(range(40))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {r["doc_id"]: (r["n_bigrams"], round(r["bits_per_bigram"], 6))
           for r in ta.perplexity_score(ds).take_all()}
    assert got == _brute_perplexity(texts, ids)


def test_perplexity_single_token_doc_excluded(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                 "text": ["lonely", "two words here"]}))
    rows = {r["doc_id"] for r in
            ta.perplexity_score(ds).take_all()}
    assert rows == {2}


def test_perplexity_separate_train_corpus(ray_session):
    # scoring corpus != training corpus: an unseen bigram of KNOWN
    # words scores the add-alpha floor; fluent in-domain text scores
    # lower (the CCNet keep/cut ordering)
    import ray.data as rd
    train = rd.from_arrow(pa.table(
        {"doc_id": [1, 2], "text": ["a b a b a b", "b c b c b c"]}))
    score = rd.from_arrow(pa.table(
        {"doc_id": [10, 11], "text": ["a b a b", "b a b a"]}))
    rows = {r["doc_id"]: r["bits_per_bigram"] for r in
            ta.perplexity_score(score, train=train).take_all()}
    assert rows[10] < rows[11]


# ---------------------------------------------------------------------------
# training-chunk prep


def _brute_chunks(texts, ids, c, o):
    import math
    s = c - o
    out = []
    for i, t in zip(ids, texts):
        toks = (t or "").split(" ")
        n = len(toks)
        nc = 1 if n <= c else math.ceil((n - c) / s) + 1
        for j in range(nc):
            out.append((i, j, " ".join(toks[j * s:j * s + c]),
                        min(c, n - j * s)))
    return sorted(out)


def test_chunk_documents_matches_brute_force(ray_session):
    import random

    import ray.data as rd
    rng = random.Random(21)
    texts = [" ".join(f"w{rng.randint(0, 30)}"
                      for _ in range(rng.randint(0, 40))) or ""
             for _ in range(30)]
    texts[3] = ""                              # empty doc → one chunk
    ids = list(range(30))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = sorted((r["doc_id"], r["chunk_id"], r["chunk_text"],
                  r["n_tokens"])
                 for r in ta.chunk_documents(ds, 8, 3).take_all())
    assert got == _brute_chunks(texts, ids, 8, 3)


def test_chunk_documents_boundaries(ray_session):
    import ray.data as rd
    # exactly chunk size → 1 chunk; chunk+stride → 2; +1 more → 3
    mk = lambda n: " ".join(str(x) for x in range(n))
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                 "text": [mk(8), mk(13), mk(14)]}))
    per = {}
    for r in ta.chunk_documents(ds, 8, 3).take_all():
        per.setdefault(r["doc_id"], []).append(r)
    assert len(per[1]) == 1 and per[1][0]["n_tokens"] == 8
    assert len(per[2]) == 2 and per[2][1]["n_tokens"] == 8
    assert len(per[3]) == 3
    # overlap: chunk j starts at token j*5
    assert per[3][1]["chunk_text"].startswith("5 ")
    assert per[3][2]["n_tokens"] == 4          # tokens 10..13


def test_chunk_documents_rejects_bad_overlap():
    with pytest.raises(ValueError):
        ta.chunk_documents(None, 8, 8)


def test_pack_sequence_offsets_matches_brute_force(ray_session):
    import random

    import ray.data as rd
    rng = random.Random(31)
    # sparse, shuffled ids exercise the ordering + range partitioning
    ids = sorted(rng.sample(range(0, 100000), 60))
    texts = [" ".join("x" for _ in range(rng.randint(0, 50)))
             for _ in ids]
    perm = list(range(60))
    rng.shuffle(perm)
    ds = rd.from_arrow(pa.table({"doc_id": [ids[i] for i in perm],
                                 "text": [texts[i] for i in perm]}))
    # tiny partitions force many driver-prefix entries
    got = {r["doc_id"]: r for r in ta.pack_sequence_offsets(
        ds, seq_len=16, docs_per_part=8).take_all()}
    acc = 0
    for i, t in zip(ids, texts):
        n = t.count(" ") + 1
        r = got[i]
        assert (r["n_tokens"], r["token_start"],
                r["seq_id"], r["seq_offset"]) == (n, acc, acc // 16,
                                                  acc % 16)
        acc += n


# ---------------------------------------------------------------------------
# BPE tokenizer training


def _reference_bpe(texts, m):
    # independent Sennrich-style implementation: word-freq dict,
    # symbol tuples, argmax pair with (left, right) tie-break
    from collections import Counter
    wf = Counter(w for t in texts for w in t.split(" "))
    table = {tuple(w): f for w, f in wf.items()}
    merges = []
    for rank in range(m):
        pc_ = Counter()
        for syms, f in table.items():
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += f
        if not pc_:
            break
        (l, r), f = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if f < 2:
            break
        merges.append((rank, l, r, f))
        new = {}
        for syms, fr in table.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i+1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + fr
        table = new
    return merges


def test_bpe_train_matches_reference(ray_session):
    import random

    import ray.data as rd
    rng = random.Random(17)
    words = ["banana", "bandana", "cabana", "anagram", "banal", "nab"]
    texts = [" ".join(rng.choice(words) for _ in range(20))
             for _ in range(25)]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(25)),
                                 "text": texts}))
    got = ta.bpe_train(ds, num_merges=8)
    assert got == _reference_bpe(texts, 8)
    # merged symbols must grow (at least one multi-char merge)
    assert any(len(l + r) > 2 for _, l, r, _ in got)
    # plan-equivalence pin: the distributed loop (forced with
    # driver_max_words=0, the 100-TB shape) learns the same merges
    assert ta.bpe_train(ds, num_merges=8, driver_max_words=0) == got


def test_bpe_train_stops_when_no_pair_repeats(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["abcdefg"]}))
    # every adjacent pair occurs once -> freq<2 -> no merges
    assert ta.bpe_train(ds, num_merges=5) == []


def test_stratified_sample_deterministic_topk(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from ferenda_ray.stages.sample import stratified_sample
    langs = ["en", "de", "fr"]
    ids = list(range(300))
    tbl = pa.table({"doc_id": ids,
                    "lang": [langs[i % 3] for i in ids]})
    # tiny blocks force cross-batch partial top-k merging
    out = stratified_sample(rd.from_arrow(tbl).repartition(10),
                            group_col="lang", k=5).take_all()
    md5k = lambda i: (int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[8:16], "little")
        & 0x7FFFFFFFFFFFFFFF)
    for g in langs:
        got = sorted(r["doc_id"] for r in out if r["lang"] == g)
        exp = sorted(sorted((i for i in ids if langs[i % 3] == g),
                            key=lambda i: (md5k(i), i))[:5])
        assert got == exp
    assert len(out) == 15


def test_tfidf_top_terms_matches_brute_force(ray_session):
    import math
    import random
    from collections import Counter

    import ray.data as rd
    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))
             for _ in range(40)]
    ids = list(range(40))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {}
    for r in ta.tfidf_top_terms(ds, k=3, docs_per_part=7).take_all():
        got.setdefault(r["doc_id"], []).append(
            (r["term"], r["tf"], r["df"], r["tfidf"]))
    tf = {i: Counter(t.split(" ")) for i, t in zip(ids, texts)}
    df = Counter(w for c in tf.values() for w in c)
    for i in ids:
        exp = sorted(((w, c, df[w]) for w, c in tf[i].items()),
                     key=lambda x: (-x[1], x[2], x[0]))[:3]
        exp = [(w, c, d,
                math.floor(c * math.log(40.0 / d) * 1e6 + 0.5) / 1e6)
               for w, c, d in exp]
        assert sorted(got[i]) == sorted(exp), i


def test_bpe_checkpoint_resume(ray_session, tmp_path):
    import ray.data as rd
    texts = ["banana bandana cabana"] * 10
    ds = rd.from_arrow(pa.table({"doc_id": list(range(10)),
                                 "text": texts})).materialize()
    full = ta.bpe_train(ds, num_merges=6)
    ck = str(tmp_path / "ck")
    part = ta.bpe_train(ds, num_merges=2, checkpoint_dir=ck)
    assert part == full[:2]
    resumed = ta.bpe_train(ds, num_merges=6, checkpoint_dir=ck)
    assert resumed == full


def test_token_budget_sample_greedy_prefix(ray_session):
    # hand-computable: single group, md5 order decides who fits
    import hashlib

    import ray.data as rd
    from ferenda_ray.stages.sample import token_budget_sample
    texts = {i: "w " * (i + 1) for i in range(8)}   # doc i: i+1 tokens
    tbl = pa.table({"doc_id": list(texts),
                    "lang": ["en"] * len(texts),
                    "text": [t.strip() for t in texts.values()]})
    out = token_budget_sample(rd.from_arrow(tbl).repartition(4),
                              budget=10, hash_parts=4)
    rows = sorted(out.take_all(), key=lambda r: r["cum_tokens"])

    def h(i):
        return (int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[8:16], "little")
            & 0x7FFFFFFFFFFFFFFF)

    order = sorted(texts, key=lambda i: (h(i), i))
    acc, expect = 0, []
    for i in order:
        acc += i + 1
        if acc > 10:
            break
        expect.append((i, acc))
    assert [(r["doc_id"], r["cum_tokens"]) for r in rows] == expect
    assert all(r["lang"] == "en" for r in rows)


def test_token_budget_groups_independent(ray_session):
    # each group gets its own budget; exact-boundary doc is KEPT
    import ray.data as rd
    from ferenda_ray.stages.sample import token_budget_sample
    tbl = pa.table({"doc_id": [1, 2],
                    "lang": ["en", "de"],
                    "text": ["a b c", "x y z"]})
    out = token_budget_sample(rd.from_arrow(tbl), budget=3)
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in rows] == [(1, 3, 3), (2, 3, 3)]


def test_weighted_mix_thresholds(ray_session):
    # weight 1.0 keeps everything, weight 0.0 keeps nothing; an
    # unknown source falls back to default_weight
    import ray.data as rd
    from ferenda_ray.stages.sample import weighted_mix
    tbl = pa.table({"doc_id": list(range(40)),
                    "source": (["keep"] * 15 + ["drop"] * 15
                               + ["other"] * 10)})
    out = weighted_mix(rd.from_arrow(tbl),
                       {"keep": 1.0, "drop": 0.0},
                       default_weight=1.0).take_all()
    srcs = [r["source"] for r in out]
    assert srcs.count("keep") == 15
    assert srcs.count("drop") == 0
    assert srcs.count("other") == 10


def test_epoch_shards_deterministic_and_balanced(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.sample import epoch_shards
    tbl = pa.table({"doc_id": list(range(400))})
    ds = rd.from_arrow(tbl).repartition(4)
    a = sorted(map(tuple, (r.values() for r in
                           epoch_shards(ds, 2, 8).take_all())))
    b = sorted(map(tuple, (r.values() for r in
                           epoch_shards(ds, 2, 8).take_all())))
    assert a == b and len(a) == 800
    # epochs shuffle differently and shards are roughly balanced
    e0 = {i: s for i, e, s in a if e == 0}
    e1 = {i: s for i, e, s in a if e == 1}
    assert any(e0[i] != e1[i] for i in e0)
    from collections import Counter
    for cnt in (Counter(e0.values()), Counter(e1.values())):
        assert len(cnt) == 8 and min(cnt.values()) > 20


def test_bounded_quantile_threshold_exact(ray_session):
    import numpy as np
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import bounded_quantile_threshold
    rng = np.random.default_rng(7)
    vals = np.round(rng.random(1000), 6)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    for q in (0.1, 0.25, 0.5, 0.9):
        thr = bounded_quantile_threshold(ds, "v", q)
        k = int(np.ceil(q * len(vals)))
        assert thr == float(np.sort(vals)[k - 1]), q


def test_token_budget_skewed_single_group(ray_session):
    # pathological skew: ALL docs in one group; the budget head keeps
    # only the md5-order prefix, and over-budget hash partitions are
    # pruned before the shuffle (the result must still be exact)
    import hashlib

    import ray.data as rd
    from ferenda_ray.stages.sample import token_budget_sample
    n = 3000
    tbl = pa.table({"doc_id": list(range(n)),
                    "lang": ["en"] * n,
                    "text": ["a b c d e"] * n})   # 5 tokens each
    out = token_budget_sample(rd.from_arrow(tbl).repartition(8),
                              budget=50, hash_parts=64).take_all()
    assert len(out) == 10 and all(r["cum_tokens"] <= 50 for r in out)

    def h(i):
        return (int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[8:16], "little")
            & 0x7FFFFFFFFFFFFFFF)

    expect = sorted(range(n), key=lambda i: (h(i), i))[:10]
    assert sorted(r["doc_id"] for r in out) == sorted(expect)


def test_gopher_rules_flags(ray_session):
    """Gopher gate vs hand-computed flags on crafted edge cases."""
    import ray.data as rd
    from ferenda_ray.stages.text_analysis import gopher_rules
    good = ("the data and that table have rows with " * 8).strip()  # 64 w
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            good,                          # passes everything
            "short doc only",              # fails word count + stopwords
            ("## " * 60).strip(),          # symbol-heavy, no alpha
            ("supercalifragilistic " * 60).strip(),  # mean len > 10
        ]})
    out = {r["doc_id"]: r for r in
           gopher_rules(rd.from_arrow(docs)).take_all()}
    assert out[1]["passes_gopher"]
    assert out[1]["n_stop_hits"] >= 5
    assert not out[2]["pass_word_count"]
    assert out[2]["pass_mean_word_len"]
    assert not out[3]["pass_alpha_words"]
    assert not out[3]["pass_symbol_ratio"]
    assert out[3]["symbol_ratio"] == 2.0  # two # chars per word
    assert not out[4]["pass_mean_word_len"]
    assert out[4]["mean_word_len"] > 10
    # stats exact on the good doc
    assert out[1]["n_words"] == 64
    assert not out[2]["passes_gopher"]


def _brute_pack(ids, texts, seq_len):
    stream = []
    for _i, t in sorted(zip(ids, texts)):
        stream.extend(t.split(" "))
    out = {}
    for s in range(0, len(stream), seq_len):
        out[s // seq_len] = (" ".join(stream[s:s + seq_len]),
                             len(stream[s:s + seq_len]))
    return out


@pytest.mark.parametrize("seq_len,docs_per_part", [(16, 4), (7, 3)])
def test_pack_sequences_brute(ray_session, seq_len, docs_per_part):
    """Materialized packed sequences equal the single-stream brute
    force — sparse ids, doc spans crossing sequence AND partition
    boundaries, a final partial sequence."""
    import random
    import ray.data as rd
    rng = random.Random(7)
    ids = sorted(rng.sample(range(200), 23))
    texts = [" ".join(f"w{i}_{j}" for j in range(rng.randint(1, 40)))
             for i in ids]
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {r["seq_id"]: (r["seq_text"], r["n_tokens"])
           for r in ta.pack_sequences(
               ds, seq_len=seq_len,
               docs_per_part=docs_per_part).take_all()}
    assert got == _brute_pack(ids, texts, seq_len)
    # every full sequence has exactly seq_len tokens; only the last
    # may be partial
    last = max(got)
    for sid, (_t, n) in got.items():
        assert n == seq_len or sid == last


def _reference_encode(text, merges):
    # independent apply: per word, merges in rank order, greedy
    # left-to-right — mirrors the Sennrich training update
    out = []
    for w in text.split(" "):
        syms = list(w)
        for _rank, l, r, _f in sorted(merges, key=lambda m: m[0]):
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l \
                        and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out.extend(syms)
    return out


def test_bpe_encode_matches_reference(ray_session):
    import ray.data as rd
    texts = ["low lower lowest low low", "newer newest new low",
             "wider wide wider new", "aaaa aa aaa a"]
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))
    merges = ta.bpe_train(ds, num_merges=8)
    assert merges  # sanity: corpus has repeating pairs
    got = {r["doc_id"]: r for r in
           ta.bpe_encode(ds, merges).take_all()}
    for i, t in enumerate(texts):
        want = _reference_encode(t, merges)
        assert list(got[i]["bpe_tokens"]) == want, (i, t)
        assert got[i]["n_bpe_tokens"] == len(want)
        assert got[i]["n_words"] == len(t.split(" "))
        # token concatenation preserves the characters
        assert "".join(got[i]["bpe_tokens"]) == t.replace(" ", "")


def test_bpe_encode_oov_and_plans(ray_session):
    """Encoding a DIFFERENT corpus than the vocab was built from hits
    the OOV path; distributed vocab plan (driver_max_words=0) equals
    the driver plan."""
    import ray.data as rd
    train_texts = ["low lower lowest low low", "newer newest new low"]
    train = rd.from_arrow(pa.table({
        "doc_id": [0, 1], "text": train_texts}))
    merges = ta.bpe_train(train, num_merges=6)
    other = rd.from_arrow(pa.table({
        "doc_id": [7], "text": ["slower lowdown unseen"]}))
    got = ta.bpe_encode(other, merges).take_all()[0]
    assert list(got["bpe_tokens"]) == _reference_encode(
        "slower lowdown unseen", merges)
    got2 = ta.bpe_encode(other, merges,
                         driver_max_words=0).take_all()[0]
    assert list(got2["bpe_tokens"]) == list(got["bpe_tokens"])


def test_perplexity_cross_trained_smooths_unseen(ray_session):
    """Regression: a scored bigram ABSENT from the training counts
    scores the add-alpha floor instead of being dropped from the
    mean (the inner join silently dropped it before Moore-Lewis
    composition exposed the bug)."""
    import math
    import ray.data as rd
    train = rd.from_arrow(pa.table(
        {"doc_id": [1], "text": ["a b a b"]}))
    # "z q": bigram (z, q) unseen, context z unseen
    score = rd.from_arrow(pa.table(
        {"doc_id": [10], "text": ["z q"]}))
    rows = {r["doc_id"]: r for r in
            ta.perplexity_score(score, train=train).take_all()}
    # train bigrams: (a,b)x2, (b,a); V = |{b, a}| = 2
    want = -math.log2((0 + 0.5) / (0 + 0.5 * 2))
    assert rows[10]["n_bigrams"] == 1
    assert abs(rows[10]["bits_per_bigram"] - want) < 1e-9


def test_moore_lewis_selects_in_domain(ray_session):
    """ce_diff orders docs by target-likeness and `keep` flags the
    in-domain side; values match a hand-rolled two-LM computation."""
    import math
    from collections import Counter
    import ray.data as rd
    texts = ["spark batch spark batch spark",    # in-domain-ish
             "noise qq zz noise qq zz qq",       # out-of-domain
             "spark batch noise zz spark"]       # mixed
    ids = [0, 1, 2]
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    target = rd.from_arrow(pa.table(
        {"doc_id": [100], "text": ["spark batch spark batch"]}))
    got = {r["doc_id"]: r for r in
           ta.moore_lewis_weights(docs, target).take_all()}

    def bigrams(ts):
        out = []
        for t in ts:
            w = t.split(" ")
            out += list(zip(w, w[1:]))
        return out

    def bits(doc_text, train_texts):
        tb = bigrams(train_texts)
        cb, cu = Counter(tb), Counter(w1 for w1, _ in tb)
        V = len({w2 for _, w2 in tb})
        bs = [-math.log2((cb[(a, b)] + 0.5) / (cu[a] + 0.5 * V))
              for a, b in bigrams([doc_text])]
        return sum(bs) / len(bs)

    for i, t in zip(ids, texts):
        want = bits(t, ["spark batch spark batch"]) - bits(t, texts)
        want6 = math.copysign(
            math.floor(abs(want) * 1e6 + 0.5) / 1e6, want)
        assert abs(got[i]["ce_diff"] - want6) < 1e-12, (i, want6)
        assert got[i]["keep"] == (want6 < 0)
    # absolute keep flags depend on the smoothing floor (tiny
    # target vocab => cheap floor); the ORDERING is the invariant
    assert got[0]["ce_diff"] < got[2]["ce_diff"] < got[1]["ce_diff"]


def test_perplexity_plans_identical(ray_session):
    """Broadcast-dict and join scoring plans agree to float noise
    (broadcast_bytes=0 forces the join plan), self- and
    cross-trained."""
    import ray.data as rd
    texts = ["a b a b c", "b c b c b", "z q a"]
    ds = rd.from_arrow(pa.table(
        {"doc_id": [0, 1, 2], "text": texts})).materialize()
    train = rd.from_arrow(pa.table(
        {"doc_id": [9], "text": ["a b a b"]})).materialize()
    for tr in (None, train):
        fast = {r["doc_id"]: r for r in
                ta.perplexity_score(ds, train=tr).take_all()}
        slow = {r["doc_id"]: r for r in
                ta.perplexity_score(ds, train=tr,
                                    broadcast_bytes=0).take_all()}
        assert set(fast) == set(slow)
        for i in fast:
            assert fast[i]["n_bigrams"] == slow[i]["n_bigrams"]
            assert abs(fast[i]["bits_per_bigram"]
                       - slow[i]["bits_per_bigram"]) < 1e-9


def test_normalize_text_unicode(ray_session):
    """NFKC folding, control strip, whitespace collapse, trim, case —
    on crafted unicode the SQL oracle can't express."""
    import ray.data as rd
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["ﬁne  TEXT\x00 here ",   # ﬁ ligature, nbsp, NUL
                 "  plain   spaced\tout\n",
                 "Å ring"]})                    # Å (angstrom sign)
    out = {r["doc_id"]: r for r in
           ta.normalize_text(rd.from_arrow(docs)).take_all()}
    assert out[1]["norm_text"] == "fine text here"   # NFKC: ﬁ→fi, nbsp→sp
    assert out[2]["norm_text"] == "plain spaced out"
    assert out[3]["norm_text"] == "å ring"      # NFKC+lower: Å→å
    assert out[1]["n_chars_before"] == len(docs.column("text")[0].as_py())
    assert out[1]["n_chars_after"] == len("fine text here")
    # no-normalization mode leaves the ligature alone
    raw = {r["doc_id"]: r["norm_text"] for r in
           ta.normalize_text(rd.from_arrow(docs), form=None,
                             lowercase=False).take_all()}
    assert raw[1].startswith("ﬁne")


def test_dsir_weights_math_and_edges(ray_session):
    """dsir_logratio matches a hand-rolled bucket computation (same
    md5 parity hash), single-token/empty docs emit no row, and the
    result is invariant to batch boundaries (hash is content-only)."""
    import hashlib
    import math
    from collections import Counter
    import ray.data as rd

    texts = ["spark batch spark batch spark",
             "noise qq zz noise qq zz qq",
             "spark batch noise zz spark",
             "solo",                             # 1 token: no bigrams
             ""]                                 # empty: no bigrams
    ids = [0, 1, 2, 3, 4]
    docs = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    target = rd.from_arrow(pa.table(
        {"doc_id": [100], "text": ["spark batch spark batch"]}))
    got = {r["doc_id"]: r
           for r in ta.dsir_weights(docs, target, n_buckets=64)
           .take_all()}
    assert set(got) == {0, 1, 2}                 # 3 and 4 dropped

    def buckets(ts):
        out = []
        for t in ts:
            w = t.split(" ")
            out += [int.from_bytes(
                        hashlib.md5((a + " " + b).encode())
                        .digest()[8:16], "little") % 64
                    for a, b in zip(w, w[1:])]
        return out

    r, t = Counter(buckets(texts)), Counter(
        buckets(["spark batch spark batch"]))
    R, T = sum(r.values()), sum(t.values())
    lam = {b: math.log((t[b] + 1) / (T + 64))
              - math.log((r[b] + 1) / (R + 64))
           for b in set(r) | set(t)}
    for i, txt in zip(ids[:3], texts[:3]):
        bs = buckets([txt])
        want = sum(lam[b] for b in bs) / len(bs)
        want6 = math.copysign(
            math.floor(abs(want) * 1e6 + 0.5) / 1e6, want)
        assert abs(got[i]["dsir_logratio"] - want6) < 1e-12
        assert got[i]["keep"] == (want6 > 0)
        assert got[i]["n_bigrams"] == len(bs)
    # absolute keep flags depend on the smoothing floor (tiny target
    # => the add-one prior drags every ratio down); the ORDERING is
    # the invariant, and keep==rounded>0 is asserted in the loop
    assert (got[0]["dsir_logratio"] > got[2]["dsir_logratio"]
            > got[1]["dsir_logratio"])

    # batch-boundary invariance: per-row batches == one batch
    one_by_one = {r["doc_id"]: r["dsir_logratio"] for r in
                  ta.dsir_weights(
                      docs.repartition(5), target, n_buckets=64)
                  .take_all()}
    assert one_by_one == {i: got[i]["dsir_logratio"] for i in got}


def test_c4_rules_flags(ray_session):
    """Every C4 rule branch on hand-built docs: sentence gate,
    terminal-punct line fraction, and each discard marker."""
    import ray.data as rd
    import pyarrow as pa

    from ferenda_ray.stages import text_analysis as ta

    rows = [
        (1, "Clean doc. Three lines here.\nAll end well.\nYes."),
        (2, "short no punct"),
        (3, "Has Lorem Ipsum inside. And more. Therefore fails."),
        (4, "Some code { infix }. Else fine. Truly."),
        (5, "Please enable JavaScript now. Ok. Ok."),
        (6, "Read the Privacy Policy. Ok. Ok."),
        (7, "Good sentences. But half the lines\nlack punctuation\nhere"),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows]}))
    got = {r["doc_id"]: r
           for r in ta.c4_rules(ds, min_sentences=3,
                                min_terminal_punct_frac=0.75)
           .take_all()}
    assert got[1]["passes_c4"] and got[1]["n_sentences"] == 4
    assert got[1]["frac_terminal_punct"] == 1.0
    assert not got[2]["passes_c4"] and got[2]["n_sentences"] == 0
    assert got[3]["has_lorem"] and not got[3]["passes_c4"]
    assert got[4]["has_brace"] and not got[4]["passes_c4"]
    assert got[5]["has_javascript"] and not got[5]["passes_c4"]
    assert got[6]["has_policy"] and not got[6]["passes_c4"]
    # 3 sentences but only 1/3 lines end in terminal punctuation
    assert got[7]["frac_terminal_punct"] < 0.75
    assert not got[7]["passes_c4"]


def test_c4_corpus_covers_every_branch(ray_session):
    """The injected sf0.001 corpus must populate both sides of every
    flag, else the oracle row is vacuous."""
    import __ray_entry__ as entry
    df = entry.queries()["docs_c4_rules"]("/root/testdata/sf0.001") \
        .to_pandas()
    for c in ["has_lorem", "has_brace", "has_javascript",
              "has_policy", "passes_c4"]:
        assert df[c].nunique() == 2, c


def test_lang_confusion_counts(ray_session, tmp_path):
    """Pred × true counts over a mixed fixture (en hit, de hit,
    stopword-free text lands in 'und')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ferenda_ray.pipelines.docs import docs_lang_confusion

    rows = [
        {"doc_id": 1, "lang": "en", "text": "the cat and the hat"},
        {"doc_id": 2, "lang": "en", "text": "der hund und die katze"},
        {"doc_id": 3, "lang": "de", "text": "der hund ist nicht da"},
        {"doc_id": 4, "lang": "xx", "text": "zzz qqq www"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    got = {(r["lang_true"], r["lang_pred"]): r["n"] for r in
           docs_lang_confusion(str(tmp_path)).take_all()}
    assert got == {("en", "en"): 1, ("en", "de"): 1,
                   ("de", "de"): 1, ("xx", "und"): 1}


def test_ngram_diversity_known_counts(ray_session):
    import ray.data as rd

    docs = rd.from_arrow(pa.table({
        "text": ["a b a b", "a b c"]}))
    t = ta.ngram_diversity(docs)
    got = {r["n"]: r for r in t.to_pylist()}
    # unigrams: 7 total, 3 distinct
    assert (got[1]["total_ngrams"], got[1]["distinct_ngrams"]) == (7, 3)
    # bigrams: 'a b','b a','a b' + 'a b','b c' = 5 total, 3 distinct
    assert (got[2]["total_ngrams"], got[2]["distinct_ngrams"]) == (5, 3)
    assert got[2]["diversity"] == 0.6
    # trigrams: 2 + 1 = 3 total, 3 distinct
    assert (got[3]["total_ngrams"], got[3]["distinct_ngrams"]) == (3, 3)
