"""Dedup family: exact, MinHash-LSH, SimHash, exact Jaccard, embedding
cosine — on synthetic docs with planted duplicates, cross-checked
against brute-force recomputation."""

import itertools
import random

import numpy as np
import pyarrow as pa
import pytest

from ferenda_ray.stages import dedup

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _mk_docs(n=40, seed=3):
    rng = random.Random(seed)
    texts = []
    for i in range(n):
        toks = [rng.choice(WORDS) for _ in range(60)]
        texts.append(" ".join(toks))
    # plant exact dups and near dups
    texts[10] = texts[0]
    texts[11] = texts[0]
    near = texts[1].split()
    near[5] = "zzz"
    texts[12] = " ".join(near)          # near-dup of 1
    return pa.table({"doc_id": list(range(n)), "text": texts})


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    return rd.from_arrow(_mk_docs()).materialize()


def test_exact_dedup(docs_ds):
    out = {r["doc_id"]: r["n_dups"]
           for r in dedup.exact_dedup(docs_ds).take_all()}
    assert out[0] == 3          # 0, 10, 11 identical; min id kept
    assert 10 not in out and 11 not in out
    assert sum(out.values()) == 40


def test_distinct_docs(docs_ds):
    kept = dedup.distinct_docs(docs_ds).take_all()
    ids = sorted(r["doc_id"] for r in kept)
    assert 0 in ids and 10 not in ids and 11 not in ids
    assert len(ids) == 38


def _true_jaccard(a: str, b: str, n: int):
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_minhash_pairs_find_planted(docs_ds):
    pairs = dedup.minhash_lsh_pairs(docs_ds, threshold=0.6).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 10) in found and (0, 11) in found and (10, 11) in found
    assert (1, 12) in found  # the near-dup
    # estimates are close to true jaccard for the planted near-dup
    docs = _mk_docs()
    texts = docs.column("text").to_pylist()
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    true = _true_jaccard(texts[1], texts[12], 5)
    assert abs(est[(1, 12)] - true) < 0.2


def test_minhash_clusters(docs_ds):
    m = dedup.minhash_clusters(docs_ds, threshold=0.6)
    assert m[10] == 0 and m[11] == 0 and m[12] == 1


def test_simhash_pairs(docs_ds):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs_ds, max_hamming=6).take_all()}
    assert pairs.get((0, 10)) == 0 and pairs.get((0, 11)) == 0
    assert (1, 12) in pairs  # one word changed → few bits differ


def test_simhash64_deterministic():
    sh = dedup.SimHasher()
    h1 = sh.simhash64("one two three four")
    h2 = sh.simhash64("one two three four")
    h3 = sh.simhash64("one two three five")
    assert h1 == h2 != h3
    assert bin(h1 ^ h3).count("1") <= 32


def test_jaccard_pairs_exact(docs_ds):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.jaccard_pairs(docs_ds, threshold=0.8).take_all()}
    # brute-force check over word SETS
    texts = _mk_docs().column("text").to_pylist()
    exp = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        A, B = set(texts[a].split()), set(texts[b].split())
        j = len(A & B) / len(A | B)
        if j >= 0.8:
            exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9


def test_embedding_neardup(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    V = rng.standard_normal((30, 16)).astype(np.float32)
    V[20] = V[3] + 0.01 * rng.standard_normal(16).astype(np.float32)
    V[21] = V[3]
    t = pa.table({"vec_id": list(range(30)),
                  "embedding": [v.tolist() for v in V]})
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in dedup.embedding_neardup_pairs(
                 rd.from_arrow(t), threshold=0.99).take_all()}
    assert (3, 20) in pairs and (3, 21) in pairs and (20, 21) in pairs
    # brute check: no other pair reaches 0.99
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    exp = {(a, b) for a in range(30) for b in range(a + 1, 30)
           if S[a, b] >= 0.99}
    assert set(pairs) == exp


def test_embedding_neardup_plans_identical(ray_session):
    """The measured-size plan pick: broadcast (≤cap) and block-pair
    (>cap) must emit the SAME pair set with the same cosines — the
    scale path is exact, not a recall tradeoff."""
    import ray.data as rd
    rng = np.random.default_rng(11)
    V = rng.standard_normal((80, 12))
    V[40] = V[2] + 0.005 * rng.standard_normal(12)
    V[41] = V[2]
    V[50] = V[7]
    t = pa.table({"vec_id": list(range(80)),
                  "embedding": [v.tolist() for v in V]})
    # >1 block so the block-pair plan exercises diagonal AND
    # cross-block emission
    ds = rd.from_arrow(t).repartition(4).materialize()

    def run(cap):
        return {(r["id_a"], r["id_b"]): round(r["cosine"], 12)
                for r in dedup.embedding_neardup_pairs(
                    ds, threshold=0.95, broadcast_bytes=cap).take_all()}

    bcast = run(1 << 30)          # everything under the cap
    blocked = run(0)              # force the block-pair plan
    assert bcast == blocked
    assert (2, 40) in bcast and (2, 41) in bcast and (40, 41) in bcast


def test_hash_sample_deterministic(ray_session, docs_ds):
    import hashlib
    from ferenda_ray.stages.sample import hash_sample, limit_per_group
    out = hash_sample(docs_ds, "doc_id", keep_buckets=(0,),
                      num_buckets=16).take_all()
    expect = {r["doc_id"] for r in docs_ds.take_all()
              if hashlib.md5(str(r["doc_id"]).encode())
              .hexdigest()[0] == "0"}
    assert {r["doc_id"] for r in out} == expect
    # grouped head: at most n rows per group, deterministic order
    top = limit_per_group(docs_ds, "text", 1, "doc_id").take_all()
    texts = [r["text"] for r in top]
    assert len(texts) == len(set(texts))


def test_hot_bucket_cap_minhash(ray_session):
    """A degenerate bucket (5000 identical docs collide in EVERY band)
    must complete in bounded time/memory: star emission caps pairs at
    O(b) while keeping every member connected to the min-id hub."""
    import time
    import ray.data as rd
    n = 5000
    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(n)),
        "text": ["same words everywhere for all docs"] * n}))
    t0 = time.monotonic()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, shingle_n=1,
                                    max_bucket=256).take_all()
    elapsed = time.monotonic() - t0
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # star: exactly hub->member edges, not O(n^2)
    assert got == {(0, i) for i in range(1, n)}
    assert elapsed < 120


def test_hot_bucket_cap_simhash(ray_session):
    import ray.data as rd
    n = 3000
    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(n)),
        "text": ["same words everywhere for all docs"] * n}))
    pairs = dedup.simhash_pairs(docs, max_hamming=3,
                                max_bucket=256).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, i) for i in range(1, n)}
    assert all(r["hamming"] == 0 for r in pairs)


def test_under_cap_pairs_unchanged(docs_ds):
    """Below the cap the vectorized kernel emits the identical all-pairs
    set the Python loop did (oracle-corpus invariance)."""
    a = {(r["id_a"], r["id_b"])
         for r in dedup.minhash_lsh_pairs(docs_ds, threshold=0.6,
                                          max_bucket=512).take_all()}
    b = {(r["id_a"], r["id_b"])
         for r in dedup.minhash_lsh_pairs(docs_ds, threshold=0.6,
                                          max_bucket=2).take_all()}
    # cap=2 forces star emission in any bucket with >2 members; the
    # planted triple (0,10,11) must still stay hub-connected
    assert (0, 10) in b and (0, 11) in b
    assert a >= b - {(10, 11)}


def test_jaccard_distributed_matches_broadcast(docs_ds):
    """BOTH physical plans of the prefix-filter operator (the local
    kernel picked at these sizes, and the exchange plan forced with
    driver_max_bytes=0 — the 100-TB shape) must reproduce the O(N²)
    broadcast baseline's exact pair set at several thresholds."""
    for t in (0.3, 0.6, 0.9):
        a = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
             for r in dedup.jaccard_pairs(docs_ds, threshold=t).take_all()}
        d = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
             for r in dedup.jaccard_pairs(
                 docs_ds, threshold=t, driver_max_bytes=0).take_all()}
        b = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
             for r in dedup.jaccard_pairs_broadcast(
                 docs_ds, threshold=t).take_all()}
        assert a == b, f"threshold {t}: {set(a) ^ set(b)}"
        assert d == b, f"threshold {t} (exchange plan): {set(d) ^ set(b)}"


def test_minhash_broadcast_and_join_plans_agree(docs_ds):
    """The size-picked broadcast plan and the 100-TB join plan are two
    physical plans of one logical operator: identical (id_a, id_b,
    est_jaccard) output."""
    def run(**kw):
        return sorted((r["id_a"], r["id_b"], round(r["est_jaccard"], 9))
                      for r in dedup.minhash_lsh_pairs(
                          docs_ds, threshold=0.5, **kw).take_all())
    bcast = run()                        # sig table is tiny -> broadcast
    joinp = run(broadcast_sig_bytes=0)   # force the join route
    assert bcast == joinp and len(bcast) > 0


def test_minhash_capped_flag(docs_ds):
    """emit_capped=True adds a bool column that is True exactly for
    pairs that ONLY surfaced from over-cap (hub-star) buckets — on
    both physical plans."""
    def run(**kw):
        rows = dedup.minhash_lsh_pairs(
            docs_ds, threshold=0.0, max_bucket=2, emit_capped=True,
            **kw).take_all()
        assert rows and sorted(rows[0]) == ["capped", "est_jaccard",
                                            "id_a", "id_b"]
        return {(r["id_a"], r["id_b"]): r["capped"] for r in rows}
    got = run()
    # the planted identical triple (0,10,11) collides in EVERY band as
    # a 3-member bucket > max_bucket=2: its hub edges are capped
    assert got[(0, 10)] is True and got[(0, 11)] is True
    # under-cap buckets keep capped=False
    assert not all(got.values())
    assert got == run(broadcast_sig_bytes=0)


def test_minhash_no_capped_column_by_default(docs_ds):
    rows = dedup.minhash_lsh_pairs(docs_ds, threshold=0.5).take_all()
    assert rows and sorted(rows[0]) == ["est_jaccard", "id_a", "id_b"]


def test_jaccard_prefix_filter_kills_hot_posting_list(ray_session):
    """Skew test: 10k docs all sharing one stopword-like token (a
    10k-member token group in the exploded table).  Rarest-first
    prefix ordering must EXCLUDE the hot token from every prefix, so
    the quadratic posting list never forms and the job completes in
    bounded time with (near-)zero pairs."""
    import time
    import ray.data as rd
    rng = random.Random(7)
    n = 10_000
    texts = []
    for i in range(n):
        words = [f"w{rng.randrange(200_000)}" for _ in range(15)]
        texts.append(" ".join(words + ["commontoken"]))
    docs = rd.from_arrow(pa.table({"doc_id": list(range(n)),
                                   "text": texts}))
    t0 = time.monotonic()
    pairs = dedup.jaccard_pairs(docs, threshold=0.5).take_all()
    elapsed = time.monotonic() - t0
    # 15 random draws from a 200k vocab almost never overlap >=50%
    assert len(pairs) < 50
    assert elapsed < 120


# ---------------------------------------------------------------------------
# exact substring (n-gram) duplication stats


def _brute_ngram_stats(texts, ids, n, stride):
    grams = {}
    for i, t in zip(ids, texts):
        b = t.encode()
        if len(b) < n:
            continue
        gs = {bytes(b[p:p + n]) for p in range(0, len(b) - n + 1, stride)}
        grams[i] = gs
    from collections import Counter
    cnt = Counter(g for gs in grams.values() for g in gs)
    return {i: (sum(1 for g in gs if cnt[g] >= 2), len(gs))
            for i, gs in grams.items()}


def test_ngram_dup_stats_matches_brute_force(ray_session):
    import ray.data as rd
    rng = random.Random(7)
    texts = ["".join(rng.choice("abcdef ") for _ in range(rng.randint(3, 90)))
             for _ in range(60)]
    texts[7] = texts[3]                       # full duplicate
    texts[9] = "X" * 5 + texts[3][10:40] + "Y" * 5   # shared substring
    ids = list(range(60))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = {r["doc_id"]: (r["dup_grams"], r["total_grams"])
           for r in dedup.ngram_dup_stats(ds, n=8, stride=2).take_all()}
    assert out == _brute_ngram_stats(texts, ids, 8, 2)


def test_ngram_dup_stats_short_docs_excluded(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                 "text": ["tiny", "this one is long enough!",
                                          "this one is long enough!"]}))
    rows = {r["doc_id"]: r for r in
            dedup.ngram_dup_stats(ds, n=16, stride=1).take_all()}
    assert 1 not in rows                       # len < n → no row
    assert rows[2]["dup_grams"] == rows[2]["total_grams"] > 0
    assert rows[3]["dup_grams"] == rows[3]["total_grams"]


def test_ngram_dup_stats_within_doc_repeat_not_dup(ray_session):
    # a gram repeated INSIDE one doc only is not "duplicated": the
    # count is per-doc-distinct (matches the SQL DISTINCT oracle)
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                 "text": ["abcdabcdabcdabcd",
                                          "zzzzyyyyxxxxwwww"]}))
    for r in dedup.ngram_dup_stats(ds, n=4, stride=4).take_all():
        assert r["dup_grams"] == 0


def test_ngram_dup_stats_nonmultiple_of_8_width(ray_session):
    # n % 8 != 0 exercises the zero-padded uint64 lane path
    import ray.data as rd
    texts = ["shared-prefix tail one", "shared-prefix tail two", "unrelated?"]
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": texts}))
    rows = {r["doc_id"]: r for r in
            dedup.ngram_dup_stats(ds, n=10, stride=1).take_all()}
    assert rows[1]["dup_grams"] > 0 and rows[2]["dup_grams"] > 0
    assert rows[3]["dup_grams"] == 0


def _brute_remove_spans(texts, ids, n):
    from collections import Counter
    encs = [t.encode() for t in texts]
    cnt = Counter(bytes(e[p:p + n]) for e in encs
                  for p in range(len(e) - n + 1))
    out = {}
    for i, e in zip(ids, encs):
        cov = [False] * len(e)
        for p in range(len(e) - n + 1):
            if cnt[bytes(e[p:p + n])] >= 2:
                for q in range(p, p + n):
                    cov[q] = True
        out[i] = (bytes(b for b, c in zip(e, cov) if not c).decode(),
                  sum(cov))
    return out


def test_remove_duplicated_spans_matches_brute_force(ray_session):
    import ray.data as rd
    rng = random.Random(13)
    texts = ["".join(rng.choice("abc ") for _ in range(rng.randint(0, 60)))
             for _ in range(50)]
    texts[4] = texts[2]                        # whole-doc duplicate
    texts[6] = "Q" * 4 + texts[2][5:30] + "Z" * 4   # shared substring
    texts[8] = "R" * 10 + "S" * 10 + "R" * 10       # within-doc repeat
    ids = list(range(50))
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dedup.remove_duplicated_spans(ds, n=8).take_all()}
    assert got == _brute_remove_spans(texts, ids, 8)


def test_remove_duplicated_spans_short_docs_pass_through(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                 "text": ["tiny", "",
                                          "no duplicate content here"]}))
    rows = {r["doc_id"]: r for r in
            dedup.remove_duplicated_spans(ds, n=16).take_all()}
    assert len(rows) == 3                      # every doc has a row
    assert rows[1]["clean_text"] == "tiny" and rows[1]["n_removed"] == 0
    assert rows[2]["clean_text"] == "" and rows[2]["n_removed"] == 0
    assert rows[3]["clean_text"] == "no duplicate content here"


def test_remove_duplicated_spans_overlap_merges(ray_session):
    # two overlapping dup windows cover their union exactly once
    import ray.data as rd
    base = "0123456789abcdefghij"         # 20 chars, dup in both docs
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["XX" + base + "YY", "PP" + base + "QQ"]}))
    rows = {r["doc_id"]: r for r in
            dedup.remove_duplicated_spans(ds, n=16).take_all()}
    # windows at offsets 2..6 of base region overlap; union = base (20)
    assert rows[1]["n_removed"] == 20
    assert rows[1]["clean_text"] == "XXYY"
    assert rows[2]["clean_text"] == "PPQQ"


def test_corpus_diff_statuses(ray_session):
    import ray.data as rd
    old = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["one", "two", "three", "four"]}))
    new = rd.from_arrow(pa.table({
        "doc_id": [2, 3, 4, 5],
        "text": ["two", "three EDITED", "four", "five"]}))
    got = {r["doc_id"]: r["status"]
           for r in dedup.corpus_diff(old, new).take_all()}
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_neardup_clusters_chain_transitivity(ray_session):
    # A-B and B-C pairs (no A-C edge): label propagation must still
    # put all three in one min-id cluster; 4/5 form a second cluster;
    # 6 is a singleton mapping to itself
    import ray.data as rd
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["a", "b", "c", "d", "e", "f"]}))
    pairs = rd.from_arrow(pa.table({
        "id_a": [1, 2, 4], "id_b": [2, 3, 5]}))
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.neardup_clusters(docs, pairs).take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_neardup_clusters_no_pairs(ray_session):
    import ray.data as rd
    docs = rd.from_arrow(pa.table({
        "doc_id": [7, 8], "text": ["a", "b"]}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64())}))
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.neardup_clusters(docs, pairs).take_all()}
    assert got == {7: 7, 8: 8}


def test_dedup_keep_best_score_and_ties(ray_session):
    # cluster {1,2,3}: 3 wins on n_chars; cluster {4,5}: tie on score
    # -> min id 4 wins; singleton 6 kept as its own cluster of 1
    import ray.data as rd
    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["a", "b", "c", "d", "e", "f"],
        "n_chars": [10, 20, 30, 7, 7, 1]}))
    pairs = rd.from_arrow(pa.table({
        "id_a": [1, 2, 4], "id_b": [2, 3, 5]}))
    rows = {r["doc_id"]: r for r in
            dedup.dedup_keep_best(docs, pairs).take_all()}
    assert set(rows) == {3, 4, 6}
    assert rows[3]["cluster_id"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[4]["cluster_id"] == 4 and rows[4]["cluster_size"] == 2
    assert rows[6]["cluster_size"] == 1 and rows[6]["n_chars"] == 1


def test_neardup_clusters_plans_agree(ray_session):
    # broadcast union-find (default) and distributed label propagation
    # (forced by a zero collect cap) must assign identical clusters
    import ray.data as rd
    docs = rd.from_arrow(pa.table({
        "doc_id": list(range(30)),
        "text": ["x"] * 30}))
    pairs = rd.from_arrow(pa.table({
        "id_a": [0, 1, 5, 6, 20],
        "id_b": [1, 2, 6, 7, 25]}))
    small = sorted(map(tuple, ((r["doc_id"], r["cluster_id"]) for r in
                   dedup.neardup_clusters(docs, pairs).take_all())))
    big = sorted(map(tuple, ((r["doc_id"], r["cluster_id"]) for r in
                 dedup.neardup_clusters(docs, pairs,
                                        max_collect_edges=0).take_all())))
    assert small == big
    as_map = dict(small)
    assert as_map[2] == 0 and as_map[7] == 5 and as_map[25] == 20


def test_neardup_clusters_dangling_pair_ids(ray_session):
    # pair list may reference ids outside the doc table (e.g. pairs
    # computed on a superset): assignment covers exactly the docs
    import ray.data as rd
    docs = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                   "text": ["a", "b"]}))
    pairs = rd.from_arrow(pa.table({"id_a": [1, 90],
                                    "id_b": [2, 91]}))
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.neardup_clusters(docs, pairs).take_all()}
    assert got == {1: 1, 2: 1}


# ---------------------------------------------------------------------------
# corpus-wide segment (line) dedup — CCNet-style


def _brute_segments(texts, ids, min_docs, mode, delim="\n"):
    from collections import defaultdict
    dl = {i: t.split(delim) for i, t in zip(ids, texts)}
    dcount = defaultdict(set)
    for i, ls in dl.items():
        for l in ls:
            if l.strip(" ") != "":
                dcount[l].add(i)
    dup = {l for l, s in dcount.items() if len(s) >= min_docs}
    firsts = {}
    for i in sorted(dl):
        for o, l in enumerate(dl[i]):
            if l in dup and l not in firsts:
                firsts[l] = (i, o)
    out = {}
    for i, ls in dl.items():
        kept, rem = [], 0
        for o, l in enumerate(ls):
            if l.strip(" ") == "" or l not in dup:
                kept.append(l)
            elif mode == "keep_first" and firsts[l] == (i, o):
                kept.append(l)
            else:
                rem += 1
        out[i] = (delim.join(kept), rem)
    return out


def _segment_fixture():
    rng = random.Random(11)
    common = ["shared line one", "shared line two", "boiler plate",
              "© footer"]
    texts, ids = [], []
    for i in range(50):
        lines = []
        for j in range(rng.randint(1, 8)):
            r = rng.random()
            if r < 0.3:
                lines.append(common[rng.randrange(len(common))])
            elif r < 0.4:
                lines.append("")          # blank — always kept
            elif r < 0.45:
                lines.append("   ")       # space-only — always kept
            else:
                lines.append(f"unique {i} {j}")
        if i % 5 == 0:                    # within-doc repeat
            lines.append(common[0])
        texts.append("\n".join(lines))
        ids.append(100 + i)
    return texts, ids


@pytest.mark.parametrize("mode", ["drop_all", "keep_first"])
def test_remove_duplicate_segments_both_plans_match_brute(ray_session,
                                                          mode):
    # broadcast plan (cap high) and distributed join plan (cap 0)
    # must be result-identical — and equal to brute force
    import ray.data as rd
    texts, ids = _segment_fixture()
    want = _brute_segments(texts, ids, 2, mode)
    for cap in (64 << 20, 0):
        ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in dedup.remove_duplicate_segments(
                   ds, min_docs=2, mode=mode,
                   broadcast_bytes=cap).take_all()}
        assert got == want, f"plan cap={cap}"


def test_remove_duplicate_segments_doc_losing_all_segments(ray_session):
    # a doc made entirely of duplicated segments must still appear,
    # with clean_text == "" (both plans)
    import ray.data as rd
    texts = ["dup line", "dup line", "dup line\nkeep me"]
    for cap in (64 << 20, 0):
        ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                     "text": texts}))
        got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in dedup.remove_duplicate_segments(
                   ds, broadcast_bytes=cap).take_all()}
        assert got == {1: ("", 1), 2: ("", 1), 3: ("keep me", 1)}


def test_remove_duplicate_segments_no_dups_passthrough(ray_session):
    import ray.data as rd
    texts = ["a\nb", "c\nd"]
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": texts}))
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dedup.remove_duplicate_segments(ds).take_all()}
    assert got == {1: ("a\nb", 0), 2: ("c\nd", 0)}


def test_remove_duplicate_segments_keep_first_survivor(ray_session):
    # survivor = (min doc_id, min ordinal within it), even when the
    # min doc repeats the segment
    import ray.data as rd
    texts = ["x\nboil\ny\nboil", "boil\nz"]
    ds = rd.from_arrow(pa.table({"doc_id": [5, 9], "text": texts}))
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dedup.remove_duplicate_segments(
               ds, mode="keep_first").take_all()}
    assert got == {5: ("x\nboil\ny", 1), 9: ("z", 1)}


@pytest.mark.parametrize("cap", [64 << 20, 0])
def test_segment_dup_stats_matches_brute(ray_session, cap):
    # broadcast plan (cap high) and shuffle plan (cap 0) both match
    import ray.data as rd
    from collections import defaultdict
    texts, ids = _segment_fixture()
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {r["doc_id"]: (r["dup_segments"], r["total_segments"])
           for r in dedup.segment_dup_stats(
               ds, min_docs=2, broadcast_bytes=cap).take_all()}
    dcount = defaultdict(set)
    dl = {i: t.split("\n") for i, t in zip(ids, texts)}
    for i, ls in dl.items():
        for l in ls:
            if l.strip(" ") != "":
                dcount[l].add(i)
    dup = {l for l, s in dcount.items() if len(s) >= 2}
    want = {i: (sum(1 for l in ls if l in dup and l.strip(" ") != ""),
                len(ls))
            for i, ls in dl.items()}
    assert got == want


def test_remove_duplicate_segments_bad_mode(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        dedup.remove_duplicate_segments(ds, mode="nope")


def test_remove_duplicate_segments_distributed_hot_segment(ray_session):
    # skew shape: one boilerplate line in 90% of docs plus blank lines
    # (whose salted join keys must NOT funnel into one partition);
    # distributed plan (cap 0) must match the broadcast plan
    import ray.data as rd
    n = 400
    texts = []
    for i in range(n):
        parts = [f"unique {i}"]
        if i % 10 != 0:
            parts.append("hot boilerplate line")
        parts.append("")                      # blank in every doc
        texts.append("\n".join(parts))
    ids = list(range(n))
    want = _brute_segments(texts, ids, 2, "drop_all")
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dedup.remove_duplicate_segments(
               ds, min_docs=2, broadcast_bytes=0).take_all()}
    assert got == want


# ---------------------------------------------------------------------------
# Persisted MinHash index + incremental probe


def _probe_pairs(ds, idx):
    got = dedup.probe_minhash_index(ds, idx).take_all()
    return {(r["new_id"], r["old_id"]) for r in got}


def test_minhash_index_probe_finds_planted(ray_session, tmp_path):
    """Old corpus indexed once; a new snapshot containing one exact
    word-set dup of an old doc and one fresh doc probes it."""
    import ray.data as rd
    t = _mk_docs()
    old = rd.from_arrow(t)
    dedup.build_minhash_index(old, str(tmp_path / "idx"))
    dup_of_0 = " ".join(reversed(t.column("text")[0].as_py().split()))
    new = rd.from_arrow(pa.table({
        "doc_id": [100, 101],
        "text": [dup_of_0, "entirely fresh words here"]}))
    pairs = _probe_pairs(new, str(tmp_path / "idx"))
    # doc 100 has the same word SET as old docs 0/10/11 (exact copies
    # of each other); doc 101 matches nothing
    assert (100, 0) in pairs and (100, 10) in pairs and (100, 11) in pairs
    assert not any(a == 101 for a, _ in pairs)


def test_minhash_index_reuse_across_probes(ray_session, tmp_path):
    """The index persists: two independent probes of the SAME on-disk
    index (no rebuild) return identical pairs — the incremental story
    where snapshot N+1 and N+2 both probe one corpus index."""
    import ray.data as rd
    t = _mk_docs()
    dedup.build_minhash_index(rd.from_arrow(t), str(tmp_path / "idx"))
    new = rd.from_arrow(pa.table({
        "doc_id": [200], "text": [t.column("text")[5].as_py()]}))
    first = _probe_pairs(new, str(tmp_path / "idx"))
    second = _probe_pairs(new, str(tmp_path / "idx"))
    # the tiny vocab makes many docs share doc 5's full word set;
    # what matters here: (200, 5) found, and the two probes agree
    assert (200, 5) in first
    assert first == second


def test_minhash_index_probe_equals_wordset_bruteforce(ray_session,
                                                       tmp_path):
    """Probe output == brute-force distinct-word-set equality across
    the old×new split (the oracle semantics)."""
    import ray.data as rd
    t = _mk_docs(n=60, seed=9)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    old_mask = [i % 3 != 0 for i in ids]
    old = pa.table({"doc_id": [i for i, m in zip(ids, old_mask) if m],
                    "text": [x for x, m in zip(texts, old_mask) if m]})
    new = pa.table({"doc_id": [i for i, m in zip(ids, old_mask) if not m],
                    "text": [x for x, m in zip(texts, old_mask) if not m]})
    dedup.build_minhash_index(rd.from_arrow(old), str(tmp_path / "idx"))
    got = _probe_pairs(rd.from_arrow(new), str(tmp_path / "idx"))
    want = {
        (n_id, o_id)
        for n_id, n_tx in zip(new.column("doc_id").to_pylist(),
                              new.column("text").to_pylist())
        for o_id, o_tx in zip(old.column("doc_id").to_pylist(),
                              old.column("text").to_pylist())
        if set(n_tx.split()) == set(o_tx.split())}
    assert got == want


def test_minhash_index_probe_plans_agree(ray_session, tmp_path):
    """Broadcast and phased-join probe plans are pair-identical
    (broadcast_bytes=0 forces the join plan)."""
    import ray.data as rd
    t = _mk_docs(n=50, seed=4)
    dedup.build_minhash_index(rd.from_arrow(t), str(tmp_path / "idx"))
    new = rd.from_arrow(pa.table({
        "doc_id": [300, 301, 302],
        "text": [t.column("text")[7].as_py(),
                 "fresh unseen words only",
                 t.column("text")[20].as_py()]})).materialize()
    bcast = _probe_pairs(new, str(tmp_path / "idx"))
    joined = {(r["new_id"], r["old_id"])
              for r in dedup.probe_minhash_index(
                  new, str(tmp_path / "idx"),
                  broadcast_bytes=0).take_all()}
    assert bcast == joined and (300, 7) in bcast
