"""Text-analysis operators over a document table.

Training-data-pipeline operators (beyond the reference's own surface):
language ID (n-gram/stopword heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), document fingerprinting
(winnowing rolling hash).  All vectorized with polars string kernels
where the semantics allow; per-row Python only where a set/rolling
structure is inherent (fingerprint).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

# tiny per-language stopword profiles for the heuristic language ID
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que"},
    "sv": {"och", "det", "att", "i", "en", "är", "som", "på", "av"},
}

_EN_STOP = _LANG_PROFILES["en"]

# BPE-ish token regex: words, numbers, or single non-space symbols —
# the common pre-tokenizer shape (GPT-2-style contractions omitted:
# the corpus is plain ASCII prose/code)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def language_id(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Best-matching language by stopword-hit ratio; ``und`` when no
    profile scores > 0.  Returns ``(id, lang_pred, lang_score)``."""
    def score(b: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in b.column(text_col).to_pylist():
            toks = t.lower().split()
            n = max(1, len(toks))
            best_lang, best = "und", 0.0
            for lang, prof in _LANG_PROFILES.items():
                s = sum(1 for w in toks if w in prof) / n
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(int(best * 1e6 + 0.5) / 1e6)
        return pa.table({id_col: b.column(id_col),
                         "lang_pred": pa.array(preds, pa.string()),
                         "lang_score": pa.array(scores, pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow", batch_size=8192)


def token_count(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace token count + BPE-ish regex token count + char count.
    Fully vectorized (polars ``str.count_matches``)."""
    def count(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = df.select(
            pl.col(id_col),
            pl.col(text_col).str.count_matches(r"\S+")
              .cast(pl.Int64).alias("ws_tokens"),
            pl.col(text_col).str.count_matches(_BPE_RE)
              .cast(pl.Int64).alias("bpe_tokens"),
            pl.col(text_col).str.len_chars()
              .cast(pl.Int64).alias("n_chars"),
        )
        return out.to_arrow()

    return docs.map_batches(count, batch_format="pyarrow", batch_size=16384)


def _rha(expr, digits: int):
    """polars expr: round half away from zero (DuckDB ROUND semantics;
    polars .round() is half-to-even) — inputs here are non-negative."""
    s = 10.0 ** digits
    return ((expr * s + 0.5).floor()) / s


def quality_score(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Length / punctuation / stopword / word-length heuristics —
    the standard pre-training quality filters.  Vectorized.
    Returns ``(id, n_tokens, mean_token_len, stopword_ratio,
    punct_ratio, alpha_ratio, quality)``; every ratio rounded to 6
    decimals so results are float-stable across engines."""
    stop_pat = r"(?i)\b(?:" + "|".join(sorted(_EN_STOP)) + r")\b"

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        n_tok = pl.col(text_col).str.count_matches(r"\S+").cast(pl.Int64)
        n_char = pl.col(text_col).str.len_chars().cast(pl.Int64)
        n_alpha = (pl.col(text_col).str.count_matches(r"[A-Za-z]")
                   .cast(pl.Int64))
        n_punct = (pl.col(text_col)
                   .str.count_matches(r"[!-/:-@\[-`{-~]").cast(pl.Int64))
        n_stop = pl.col(text_col).str.count_matches(stop_pat).cast(pl.Int64)
        n_ws = pl.col(text_col).str.count_matches(r"\s").cast(pl.Int64)
        out = df.select(
            pl.col(id_col),
            n_tok.alias("n_tokens"),
            _rha((n_char - n_ws) / pl.max_horizontal(n_tok, 1), 6)
            .alias("mean_token_len"),
            _rha(n_stop / pl.max_horizontal(n_tok, 1), 6)
            .alias("stopword_ratio"),
            _rha(n_punct / pl.max_horizontal(n_char, 1), 6)
            .alias("punct_ratio"),
            _rha(n_alpha / pl.max_horizontal(n_char, 1), 6)
            .alias("alpha_ratio"),
        )
        out = out.with_columns(
            # composite score in [0,1]: prose-like docs score high
            _rha(0.4 * (pl.col("stopword_ratio").clip(0, 0.5) / 0.5)
                 + 0.4 * pl.col("alpha_ratio")
                 + 0.2 * (1 - pl.col("punct_ratio").clip(0, 0.2) / 0.2), 6)
            .alias("quality"))
        return out.to_arrow()

    return docs.map_batches(score, batch_format="pyarrow", batch_size=16384)


class Fingerprinter:
    """Winnowing document fingerprint (Schleimer et al. 2003): k-gram
    rolling hashes, minimum per sliding window → a sparse, position-
    robust fingerprint set.  Returns one fingerprint (sorted int list)
    + a 64-bit digest per doc."""

    def __init__(self, k: int = 5, window: int = 4,
                 text_col: str = "text", id_col: str = "doc_id",
                 hash: str = "crc32"):
        # crc32: fast scale path.  md5: bit-identical to DuckDB's
        # md5_number_lower (little-endian bytes 8:16 of the digest,
        # masked to int63) so the driver can oracle-check the stage.
        self.k = k
        self.window = window
        self.text_col = text_col
        self.id_col = id_col
        if hash == "crc32":
            self._h = lambda b: zlib.crc32(b)
        elif hash == "md5":
            from ferenda_ray.stages.sample import md5_u64
            self._h = lambda b: md5_u64(b) & 0x7FFFFFFFFFFFFFFF
        else:
            raise ValueError("hash must be crc32 or md5")

    def fingerprint(self, text: str) -> list:
        s = " ".join(text.split()).lower()
        k = self.k
        if len(s) < k:
            return [self._h(s.encode())] if s else []
        hs = np.fromiter((self._h(s[i:i + k].encode())
                          for i in range(len(s) - k + 1)),
                         dtype=np.int64)
        w = self.window
        if len(hs) <= w:
            return [int(hs.min())]
        # rolling-window minima (vectorized via stride trick)
        from numpy.lib.stride_tricks import sliding_window_view
        mins = sliding_window_view(hs, w).min(axis=1)
        return sorted(set(int(x) for x in mins))

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column(self.id_col)
        fps = [self.fingerprint(t)
               for t in b.column(self.text_col).to_pylist()]
        digests = [zlib.crc32(repr(fp).encode()) for fp in fps]
        return pa.table({
            self.id_col: ids,
            "fingerprint": pa.array(fps, pa.list_(pa.int64())),
            "fp_digest": pa.array(digests, pa.int64()),
            "fp_size": pa.array([len(f) for f in fps], pa.int64()),
        })


def fingerprints(docs, k: int = 5, window: int = 4,
                 text_col: str = "text", id_col: str = "doc_id",
                 concurrency=None, hash: str = "crc32"):
    """State is tiny (window params): task-closure plan by default."""
    kw = dict(k=k, window=window, text_col=text_col, id_col=id_col,
              hash=hash)
    if concurrency is None:
        return docs.map_batches(Fingerprinter(**kw),
                                batch_format="pyarrow", batch_size=512)
    return docs.map_batches(
        Fingerprinter, fn_constructor_kwargs=kw,
        batch_format="pyarrow", batch_size=4096, concurrency=concurrency)


def repetition_stats(docs, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_dup_line_frac: float = 0.3,
                     max_dup_word_frac: float = 0.7,
                     min_words: int = 5):
    """Repetition-based quality filters in the MassiveText/Gopher
    style (Rae et al. 2021, arXiv:2112.11446 §A1.1 — duplicate-line
    and duplicate-n-gram fractions as LLM-training-data gates), as one
    vectorized polars pass:

    * ``dup_word_frac``  = 1 − distinct words / words
    * ``dup_line_frac``  = 1 − distinct lines / lines
    * ``passes``         = all thresholds met (tunable)

    Fractions are emitted rounded half-away-from-zero to 6 digits
    (DuckDB ROUND semantics) so the driver's value-hash compares
    bit-identically; the ``passes`` flag is computed on the unrounded
    values in BOTH engines."""

    def stats(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (pl.col(text_col).str.to_lowercase()
                .str.extract_all(r"\S+"))
        lines = pl.col(text_col).str.split("\n")
        n_words = toks.list.len().cast(pl.Int64)
        n_lines = lines.list.len().cast(pl.Int64)
        dup_word = (1.0 - toks.list.n_unique()
                    / pl.max_horizontal(n_words, 1))
        dup_line = (1.0 - lines.list.n_unique()
                    / pl.max_horizontal(n_lines, 1))
        out = df.select(
            pl.col(id_col),
            n_words.alias("n_words"),
            n_lines.alias("n_lines"),
            _rha(dup_word, 6).alias("dup_word_frac"),
            _rha(dup_line, 6).alias("dup_line_frac"),
            ((dup_line < max_dup_line_frac)
             & (dup_word < max_dup_word_frac)
             & (n_words >= min_words)).alias("passes"))
        return out.to_arrow()

    return docs.map_batches(stats, batch_format="pyarrow")


def benchmark_ngrams(docs, n: int = 8, text_col: str = "text",
                     id_col: str = "doc_id"):
    """The leading whitespace-token ``n``-gram of each benchmark doc
    (lowercased, single-space joined) — the contamination probe set.
    Docs shorter than ``n`` tokens contribute nothing."""

    def first_gram(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        toks = (pl.col(text_col).str.to_lowercase()
                .str.extract_all(r"\S+"))
        out = (df.select(pl.col(id_col),
                         toks.list.slice(0, n).list.join(" ")
                         .alias("gram"),
                         toks.list.len().alias("_n"))
               .filter(pl.col("_n") >= n).drop("_n"))
        return out.to_arrow()

    return docs.map_batches(first_gram, batch_format="pyarrow")


def decontaminate(docs, bench_grams, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  concurrency=None):
    """Benchmark decontamination: flag every doc whose whitespace
    ``n``-gram set intersects the benchmark probe set — the standard
    LLM-training-data hygiene pass (e.g. GPT-3, Brown et al. 2020
    arXiv:2005.14165 §C: 13-gram overlap removal).

    ``bench_grams`` is the SMALL side (one gram per benchmark doc): it
    is broadcast once — closed over for task workers, ``ray.put`` into
    actor ``__init__`` when ``concurrency`` is set — never shipped per
    batch.  Emits ``(doc_id, n_hits, contaminated)`` where ``n_hits``
    counts DISTINCT probe grams found in the doc."""
    import ray

    if isinstance(bench_grams, pa.Table):
        bench_grams = bench_grams.column("gram").to_pylist()
    bench = frozenset(bench_grams)

    class Flag:
        def __init__(self, bench=bench):
            if isinstance(bench, ray.ObjectRef):
                bench = ray.get(bench)
            self.bench = bench

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_pylist()
            hits = []
            for text in b.column(text_col).to_pylist():
                toks = text.lower().split()
                grams = {" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)}
                hits.append(len(grams & self.bench))
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array([h > 0 for h in hits],
                                         pa.bool_())})

    if concurrency is None:
        return docs.map_batches(Flag(), batch_format="pyarrow")
    return docs.map_batches(
        Flag, fn_constructor_kwargs={"bench": ray.put(bench)},
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency)


#: PII patterns chosen for identical semantics in Python re, polars
#: (rust regex) and DuckDB RE2 — no backrefs, no lookaround
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9][0-9 \-]{7,}[0-9]"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"),
)


def pii_scrub(docs, text_col: str = "text", id_col: str = "doc_id"):
    """PII scrubbing pass (the standard pre-training hygiene step —
    e.g. the email/IP/phone removal described for The Pile / C4-style
    corpora): replaces emails, long digit runs (phones) and IPv4
    addresses with ``<EMAIL>/<PHONE>/<IP>`` tokens, emitting per-doc
    redaction counts.  One vectorized polars pass; patterns are
    RE2-compatible so the DuckDB oracle applies the SAME regexes."""

    def scrub(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = df.select(
            pl.col(id_col),
            pl.col(text_col).str.count_matches(_PII_PATTERNS[0][1])
            .cast(pl.Int64).alias("n_email"),
            pl.col(text_col).str.count_matches(_PII_PATTERNS[1][1])
            .cast(pl.Int64).alias("n_phone"),
            pl.col(text_col).str.count_matches(_PII_PATTERNS[2][1])
            .cast(pl.Int64).alias("n_ipv4"),
            pl.col(text_col)
            .str.replace_all(_PII_PATTERNS[0][1], "<EMAIL>")
            .str.replace_all(_PII_PATTERNS[1][1], "<PHONE>")
            .str.replace_all(_PII_PATTERNS[2][1], "<IP>")
            .alias("clean_text"))
        return out.to_arrow()

    return docs.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LM-perplexity quality filtering (CCNet shape: Wenzek et al. 2020 train
# a small LM and keep the low-perplexity tail of the crawl).  Here the
# LM is an add-alpha-smoothed bigram model, trained AND scored fully
# distributed — counts are shuffle-partitioned tables, scoring is two
# hash joins; nothing model-sized ever rides the driver or a broadcast,
# so the vocabulary can be corpus-scale.


def _bigram_explode(docs, text_col: str, id_col: str):
    """``(id, w1, w2)`` — one row per adjacent whitespace-token pair,
    vectorized via polars list kernels (split → slice → explode)."""
    def explode(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).with_columns(
            pl.col(text_col).str.split(" ").alias("__l"))
        df = (df.with_columns(
                  pl.col("__l").list.slice(0, pl.col("__l").list.len() - 1)
                  .alias("w1"),
                  pl.col("__l").list.slice(1).alias("w2"))
              .select([id_col, "w1", "w2"])
              .explode(["w1", "w2"])
              .drop_nulls())
        t = df.to_arrow()
        # polars emits large_string; Ray's join requires both sides to
        # agree, and aggregates normalize to string — cast here once
        return t.cast(pa.schema([
            (name, pa.string() if t.schema.field(name).type
             == pa.large_string() else t.schema.field(name).type)
            for name in t.schema.names]))

    return docs.map_batches(explode, batch_format="pyarrow")


def bigram_lm_counts(docs, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Train the bigram LM: returns ``(pair_counts, context_counts,
    vocab_size)`` — two shuffle-partitioned count Datasets
    (``(w1, w2, c12)`` and ``(w1, c1)``, Ray's aggregate does the
    map-side combine) plus the scalar continuation-vocabulary size."""
    from ray.data.aggregate import Count as _Count

    big = _bigram_explode(docs, text_col, id_col)
    cb = big.groupby(["w1", "w2"]).aggregate(_Count(alias_name="c12"))
    cu = big.groupby("w1").aggregate(_Count(alias_name="c1"))
    vocab = big.groupby("w2").aggregate(_Count(alias_name="__n")).count()
    return cb, cu, int(vocab)


def perplexity_score(docs, train=None, alpha: float = 0.5,
                     text_col: str = "text", id_col: str = "doc_id",
                     broadcast_bytes: int = 256 << 20):
    """Per-doc bits-per-bigram under an add-alpha bigram LM:
    ``-mean(log2((c12+alpha) / (c1+alpha*V)))`` — the CCNet filter
    statistic (low = fluent/in-domain, high = noise).  ``train``
    defaults to the scored corpus itself (self-perplexity, the
    common dedup-then-filter arrangement).

    Docs with fewer than two tokens emit no row (they have no
    bigrams).  Returns ``(doc_id, n_bigrams, bits_per_bigram)``
    with the float UNROUNDED — callers pin digits for comparison.

    Two physical plans, picked from the MEASURED count-table size
    (LM counts are VOCABULARY²-bounded, not corpus-sized):

    * **≤ broadcast_bytes** — the count dicts ship once through the
      ``stateful_map`` policy and every doc scores in ONE map pass:
      zero joins, zero per-doc shuffles (the groupby disappears
      because a doc's bigrams live in its own batch row).
    * **larger** — scoring joins each doc bigram to the count tables
      on ``(w1, w2)`` then ``(w1,)`` — hash exchanges, no broadcast —
      and reduces per doc with Sum/Count.  Every doc-sized or
      model-sized structure stays a Dataset end-to-end.

    Both plans are asserted value-identical in pytest."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    def _empty():
        import ray.data as _rd
        return _rd.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "n_bigrams": pa.array([], pa.int64()),
             "bits_per_bigram": pa.array([], pa.float64())}))

    big = None
    if train is None:
        # materialize the scored-side bigram table: it feeds the
        # count tables AND (join plan) the join — one explode pass
        # instead of three.  Blocks live in the object store
        # (spillable).  Cross-trained paths never build it unless the
        # join plan needs it (the broadcast Scorer re-splits text).
        big = _bigram_explode(docs, text_col, id_col).materialize()
        if big.count() == 0:
            return _empty()
        from ray.data.aggregate import Count as _C
        cb = big.groupby(["w1", "w2"]).aggregate(_C(alias_name="c12"))
        cu = big.groupby("w1").aggregate(_C(alias_name="c1"))
        v = int(big.groupby("w2").aggregate(
            _C(alias_name="__n")).count())
        # self-trained: every scored bigram exists in the counts by
        # construction, so the cheaper inner join is exact
        jt = "inner"
    else:
        cb, cu, v = bigram_lm_counts(train, text_col, id_col)
        # cross-trained: a scored bigram (or its context word) can be
        # ABSENT from the training counts — add-alpha smoothing says
        # it scores (0+a)/(c1+aV), not "drop it from the mean" (which
        # an inner join silently did; caught composing Moore-Lewis)
        jt = "left_outer"

    cb = cb.materialize()
    cu = cu.materialize()
    if cb.size_bytes() + cu.size_bytes() <= broadcast_bytes:
        # ---- broadcast plan: dict lookups inside one map pass ----
        import ray as _ray
        cbd, cud = {}, {}
        # empty aggregate blocks carry no schema — skip them
        for t in _ray.get(cb.to_arrow_refs()):
            if t.num_rows:
                cbd.update(zip(zip(t.column("w1").to_pylist(),
                                   t.column("w2").to_pylist()),
                               t.column("c12").to_pylist()))
        for t in _ray.get(cu.to_arrow_refs()):
            if t.num_rows:
                cud.update(zip(t.column("w1").to_pylist(),
                               t.column("c1").to_pylist()))
        a, av = float(alpha), float(alpha) * v

        class Scorer:
            def __init__(self, ref):
                self.cb, self.cu = resolve(ref)

            def __call__(self, b: pa.Table) -> pa.Table:
                ids, nb, bits = [], [], []
                for i, t in zip(b.column(id_col).to_pylist(),
                                b.column(text_col).to_pylist()):
                    # literal single-space split, matching
                    # _bigram_explode's str.split(" ")
                    w = t.split(" ")
                    if len(w) < 2:
                        continue
                    cbg, cug = self.cb.get, self.cu.get
                    s = 0.0
                    for p in zip(w, w[1:]):
                        s -= np.log2((cbg(p, 0) + a)
                                     / (cug(p[0], 0) + av))
                    ids.append(i)
                    nb.append(len(w) - 1)
                    bits.append(s / (len(w) - 1))
                return pa.table({
                    id_col: pa.array(ids, pa.int64()),
                    "n_bigrams": pa.array(nb, pa.int64()),
                    "bits_per_bigram": pa.array(bits, pa.float64())})

        from ferenda_ray.stages.broadcast import resolve, stateful_map
        return stateful_map(docs, Scorer, (cbd, cud), batch_size=4096)

    # ---- join plan (count tables larger than the broadcast cap) ----
    if big is None:
        big = _bigram_explode(docs, text_col, id_col).materialize()
        if big.count() == 0:
            # Acero cannot infer the schema of a zero-row join side
            return _empty()
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        big, cb, cu = (d.repartition(co) for d in (big, cb, cu))
    j = big.join(cb, join_type=jt, num_partitions=np_,
                 on=("w1", "w2"))
    if not ray_join_handles_empty_blocks():
        j = j.repartition(coalesce_partitions())
    j = j.join(cu, join_type=jt, num_partitions=np_, on=("w1",))

    av = float(alpha) * v
    a = float(alpha)

    def logp(b: pa.Table) -> pa.Table:
        zero = pa.scalar(0, pa.int64())
        c12 = pc.fill_null(b.column("c12"), zero) \
            .to_numpy().astype(np.float64)
        c1 = pc.fill_null(b.column("c1"), zero) \
            .to_numpy().astype(np.float64)
        bits = -np.log2((c12 + a) / (c1 + av))
        return pa.table({id_col: b.column(id_col),
                         "__bits": pa.array(bits, pa.float64())})

    per = (j.map_batches(logp, batch_format="pyarrow")
           .groupby(id_col)
           .aggregate(_Sum("__bits", alias_name="__sum"),
                      _Count(alias_name="n_bigrams")))

    def finalize(b: pa.Table) -> pa.Table:
        s = b.column("__sum").to_numpy()
        n = b.column("n_bigrams").to_numpy()
        return pa.table({id_col: b.column(id_col),
                         "n_bigrams": b.column("n_bigrams"),
                         "bits_per_bigram": pa.array(s / n, pa.float64())})

    return per.map_batches(finalize, batch_format="pyarrow")


def chunk_documents(docs, chunk_tokens: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split each doc into fixed-size training chunks of
    ``chunk_tokens`` whitespace tokens overlapping by ``overlap``
    (stride = chunk-overlap): the standard context-window packing
    prep.  A doc with ≤ ``chunk_tokens`` tokens yields exactly one
    chunk; otherwise chunk j starts at token ``j*stride`` and the
    count is ``ceil((n-chunk)/stride)+1`` — the final chunk always
    reaches the last token and no chunk starts past it.

    Returns ``(doc_id, chunk_id, chunk_text, n_tokens)``.  Chunk
    texts are SLICES of the input string (token char offsets come
    from one vectorized space scan), never re-joined token lists —
    each output row costs one C-level slice."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def chunk(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        out_id, out_cid, out_txt, out_n = [], [], [], []
        for i, t in zip(ids, texts):
            t = t or ""
            buf = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            sp = np.flatnonzero(buf == 32)
            tok_start = np.concatenate(([0], sp + 1))
            tok_end = np.concatenate((sp, [len(buf)]))
            n = len(tok_start)
            if n <= chunk_tokens:
                nc = 1
            else:
                nc = int(-(-(n - chunk_tokens) // stride)) + 1
            s = np.arange(nc) * stride
            e = np.minimum(s + chunk_tokens, n) - 1
            a_off = tok_start[s]
            b_off = tok_end[e]
            out_id.extend([i] * nc)
            out_cid.extend(range(nc))
            out_txt.extend(t[a:bo] for a, bo in zip(a_off, b_off))
            out_n.extend((e - s + 1).tolist())
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "chunk_id": pa.array(out_cid, pa.int64()),
                         "chunk_text": pa.array(out_txt, pa.string()),
                         "n_tokens": pa.array(out_n, pa.int64())})

    return docs.map_batches(chunk, batch_format="pyarrow")


def pack_sequence_offsets(docs, seq_len: int = 1024,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          docs_per_part: int = 4096):
    """Concat-and-split sequence packing (the GPT-style pretraining
    layout): conceptually concatenate every doc's tokens in ``id``
    order and split every ``seq_len`` tokens.  Returns per doc
    ``(doc_id, n_tokens, token_start, seq_id, seq_offset)`` — where
    the doc's first token lands in the packed stream.

    Distributed prefix sum, no global sort: (1) vectorized per-batch
    token counts keyed by a coarse range partition (``id //
    docs_per_part``), (2) per-partition sums — ONE tiny row per
    partition — prefix-summed on the driver (bounded by doc count /
    ``docs_per_part``, not the corpus), (3) a per-partition grouped
    pass adds the broadcast partition offset to an in-partition
    cumsum.  Ids need not be dense; ordering is by id."""
    from ray.data.aggregate import Sum as _Sum

    def counts(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        out = df.select(
            pl.col(id_col),
            (pl.col(text_col).str.count_matches(" ", literal=True)
             + 1).cast(pl.Int64).alias("n_tokens"),
            (pl.col(id_col) // docs_per_part).cast(pl.Int64)
            .alias("__part"))
        return out.to_arrow()

    cnt = docs.map_batches(counts, batch_format="pyarrow")
    psums = (cnt.groupby("__part")
             .aggregate(_Sum("n_tokens", alias_name="__s")).take_all())
    psums.sort(key=lambda r: r["__part"])
    offsets, acc = {}, 0
    for r in psums:
        offsets[r["__part"]] = acc
        acc += r["__s"]

    def scan(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        n = group.column("n_tokens").to_numpy()
        order = np.argsort(ids)
        ids, n = ids[order], n[order]
        base = offsets[group.column("__part")[0].as_py()]
        start = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "token_start": pa.array(start, pa.int64()),
            "seq_id": pa.array(start // seq_len, pa.int64()),
            "seq_offset": pa.array(start % seq_len, pa.int64())})

    return (cnt.groupby("__part")
            .map_groups(scan, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016) — distributed
# broadcast-iterate like similarity.kmeans_iterate: the working set
# after the first pass is the WORD-FREQUENCY table (vocabulary-sized,
# orders of magnitude smaller than the corpus), each merge round is
# one vectorized pair-count pass + a tiny top-1 reduce + a broadcast
# merge application.


def word_frequencies(docs, text_col: str = "text",
                     id_col: str = "doc_id"):
    """``(word, freq)`` over whitespace tokens — per-batch polars
    value_counts combiner, one groupby sum."""
    from ray.data.aggregate import Sum as _Sum

    def combine(b: pa.Table) -> pa.Table:
        vc = (pl.from_arrow(b).select(
            pl.col(text_col).str.split(" ").alias("w"))
            .explode("w")["w"].value_counts())
        t = pa.table({"word": vc["w"].to_arrow(),
                      "c": vc["count"].to_arrow()})
        return t.cast(pa.schema([("word", pa.string()),
                                 ("c", pa.int64())]))

    return (docs.map_batches(combine, batch_format="pyarrow")
            .groupby("word").aggregate(_Sum("c", alias_name="freq")))


def _pair_counts_batch(b: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts of one batch of ``(syms, freq)``
    rows, weighted by freq — vectorized: one flattened symbol array,
    boundary-masked shifts, ``np.unique`` on integer codes."""
    syms = b.column("syms").to_pylist()
    freq = b.column("freq").to_numpy()
    lens = np.fromiter((len(s) for s in syms), dtype=np.int64,
                       count=len(syms))
    if not len(lens) or int(lens.sum()) == 0:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    flat = np.array([x for s in syms for x in s], dtype=object)
    codes, inv = np.unique(flat, return_inverse=True)
    w = np.repeat(freq, lens)
    # adjacent pairs, masking the last symbol of every word
    ends = np.cumsum(lens) - 1
    keep = np.ones(len(flat), dtype=bool)
    keep[ends] = False
    left = inv[:-1][keep[:-1]]
    right = inv[1:][keep[:-1]]
    wp = w[:-1][keep[:-1]]
    pair_key = left.astype(np.int64) * len(codes) + right
    uk, pinv = np.unique(pair_key, return_inverse=True)
    sums = np.zeros(len(uk), dtype=np.int64)
    np.add.at(sums, pinv, wp)
    return pa.table({
        "left": pa.array(codes[uk // len(codes)], pa.string()),
        "right": pa.array(codes[uk % len(codes)], pa.string()),
        "n": pa.array(sums, pa.int64())})


def bpe_train(docs, num_merges: int = 10, text_col: str = "text",
              id_col: str = "doc_id",
              checkpoint_dir: str | None = None,
              driver_max_words: int = 2_000_000):
    """Learn ``num_merges`` BPE merges over the corpus: highest
    adjacent-pair frequency wins each round, ties break on
    ``(left, right)`` lexicographically.  Returns ``[(rank, left,
    right, freq)]``.

    One corpus pass builds the word-frequency table; every round is
    a pair-count ``map_batches`` (+ per-batch combine) over THAT
    table, a groupby-sum, a top-1 ``sort.limit(1)`` reduce, and a
    broadcast merge application — the corpus is never re-read.

    PLAN PICK from the MEASURED word-table size (the
    ``minhash_lsh_pairs`` idiom): the table is VOCABULARY-sized, not
    corpus-sized, and each distributed round costs an exchange + two
    materializations of fixed overhead.  Under ``driver_max_words``
    the same per-round kernels (``_pair_counts_batch`` /
    ``_apply_merge``, reused verbatim) run on the collected table;
    above it the distributed loop runs unchanged.  Both plans are
    asserted merge-identical in pytest (``tests/test_text_analysis``
    BPE cases run the driver plan against hand-computed merges; the
    plan pin forces both)."""
    import ray

    from ray.data.aggregate import Sum as _Sum

    words = word_frequencies(docs, text_col, id_col)

    def init_syms(b: pa.Table) -> pa.Table:
        ws = b.column("word").to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in ws],
                             pa.list_(pa.string())),
            "freq": b.column("freq")})

    table = words.map_batches(init_syms,
                              batch_format="pyarrow").materialize()
    local = table.count() <= driver_max_words
    if local:
        tbls = [t for t in ray.get(table.to_arrow_refs()) if t.num_rows]
        ltbl = (pa.concat_tables(tbls) if tbls
                else pa.table({"syms": pa.array([], pa.list_(pa.string())),
                               "freq": pa.array([], pa.int64())}))
    merges = []
    ck_meta = None
    if checkpoint_dir is not None:
        from ferenda_ray.stages.similarity import _load_checkpoint
        # input fingerprint: refuse to replay merges recorded for a
        # different corpus (ADVICE r4).  num_merges is deliberately
        # NOT pinned — the merge sequence is prefix-stable, so
        # resuming with a larger budget is a valid continuation.
        ck_meta = {"text_col": text_col, "n_words": table.count()}
        ck = _load_checkpoint(checkpoint_dir, "bpe",
                              expect_meta=ck_meta)
        if ck is not None:
            # resume: replay the saved merges over the fresh word
            # table (deterministic, one pass per saved merge) and
            # continue from the recorded rank
            merges = [tuple(m) for m in ck["state"]]
            for _, l_, r_, _f in merges:
                if local:
                    ltbl = _apply_merge(l_, r_)(ltbl)
                else:
                    table = table.map_batches(
                        _apply_merge(l_, r_),
                        batch_format="pyarrow").materialize()
    for rank in range(len(merges), num_merges):
        if local:
            import polars as pl
            cdf = pl.from_arrow(_pair_counts_batch(ltbl))
            top = (cdf.sort(["n", "left", "right"],
                            descending=[True, False, False])
                   .head(1).to_dicts())
        else:
            counts = (table.map_batches(_pair_counts_batch,
                                        batch_format="pyarrow")
                      .groupby(["left", "right"])
                      .aggregate(_Sum("n", alias_name="n")))
            top = counts.sort(["n", "left", "right"],
                              descending=[True, False, False]).limit(1) \
                .take_all()
        if not top or top[0]["n"] < 2:
            break
        l, r, f = top[0]["left"], top[0]["right"], top[0]["n"]
        merges.append((rank, l, r, int(f)))
        if local:
            ltbl = _apply_merge(l, r)(ltbl)
        else:
            table = table.map_batches(
                _apply_merge(l, r),
                batch_format="pyarrow").materialize()
        if checkpoint_dir is not None:
            from ferenda_ray.stages.similarity import _save_checkpoint
            _save_checkpoint(checkpoint_dir, "bpe",
                             {"iter": rank + 1,
                              "state": [list(m) for m in merges],
                              "meta": ck_meta})
    return merges


def _apply_merge(l: str, r: str):
    def apply(b: pa.Table) -> pa.Table:
        out = []
        for s in b.column("syms").to_pylist():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pa.table({"syms": pa.array(out, pa.list_(pa.string())),
                         "freq": b.column("freq")})
    return apply


def tfidf_top_terms(docs, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id",
                    docs_per_part: int = 4096):
    """Top-k characteristic terms per doc, tf-idf ranked.  The RANK
    key is pure integers — ``(tf desc, df asc, term asc)`` — so the
    selection is bit-reproducible across engines (float tf·idf ties
    cannot flip on last-ulp ``ln`` differences); the reported
    ``tfidf = tf · ln(N/df)`` is informational, rounded to 6.

    Plan: per-batch term counts (docs never split across batches, so
    per-doc tf is complete in one pass) → df = one groupby over
    (doc, term) rows → hash join tf⋈df → per-coarse-group vectorized
    top-k (one Python call per ~4096 docs, polars head)."""
    from ray.data.aggregate import Count as _Count

    def tf_rows(b: pa.Table) -> pa.Table:
        df_ = (pl.from_arrow(b.select([id_col, text_col]))
               .with_columns(pl.col(text_col).str.split(" ")
                             .alias("t"))
               .explode("t")
               .group_by([id_col, "t"]).len()
               .rename({"len": "tf"}))
        t = df_.to_arrow()
        return t.cast(pa.schema([(id_col, pa.int64()),
                                 ("t", pa.string()),
                                 ("tf", pa.int64())]))

    tf = docs.map_batches(tf_rows, batch_format="pyarrow")
    dfreq = tf.groupby("t").aggregate(_Count(alias_name="df"))
    n_docs = docs.count()

    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        tf, dfreq = tf.repartition(co), dfreq.repartition(co)
    j = tf.join(dfreq, join_type="inner", num_partitions=np_,
                on=("t",))

    def topk(group: pa.Table) -> pa.Table:
        df_ = (pl.from_arrow(group.combine_chunks())
               .sort([id_col, "tf", "df", "t"],
                     descending=[False, True, False, False])
               .group_by(id_col, maintain_order=True).head(k)
               .rename({"t": "term"}))
        t = df_.select([id_col, "term", "tf", "df"]).to_arrow().cast(
            pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                       ("tf", pa.int64()), ("df", pa.int64())]))
        # numpy TRUE division for the rounding step: polars' `/scalar`
        # multiplies by the reciprocal, which is off by one ulp from
        # SQL's floor(x*1e6+0.5)/1e6
        tfv = t.column("tf").to_numpy().astype(np.float64)
        dfv = t.column("df").to_numpy().astype(np.float64)
        tfidf = np.floor(tfv * np.log(n_docs / dfv) * 1e6 + 0.5) / 1e6
        return t.append_column("tfidf", pa.array(tfidf, pa.float64()))

    return (j.add_column("__grp",
                         lambda d: d[id_col] % docs_per_part)
            .groupby("__grp")
            .map_groups(lambda g: topk(g.drop_columns(["__grp"])),
                        batch_format="pyarrow"))


def fuzzy_decontaminate(docs, probe_ids, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id"):
    """NEAR-duplicate benchmark decontamination: flag every doc whose
    distinct-word-set Jaccard vs ANY benchmark doc reaches
    ``threshold`` — catches paraphrase-level leakage the exact n-gram
    pass (:func:`decontaminate`) misses.  Returns one row per doc:
    ``(id, max_jaccard, contaminated)``.

    Plan: the benchmark side is SMALL BY CONSTRUCTION (same argument
    as :func:`decontaminate`'s broadcast grams), so its word sets
    broadcast once as a (vocab × probes) membership matrix via
    ``ray.put``; the corpus side is ONE distributed pass computing
    per-doc intersection counts with a vectorized fancy-index sum —
    no shuffle, no token join.  (A first cut joined exploded token
    rows instead: stopwords × probes blew the join output to ~30M
    rows and 92 s at sf0.1 — this plan measures 3-4 s.)"""
    import numpy as np

    from ferenda_ray.stages.broadcast import resolve, stateful_map

    probe_ids = sorted(int(i) for i in probe_ids)
    pid_set = set(probe_ids)

    # pass 0 (distributed filter, benchmark-sized take): probe word sets
    def probe_words(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column(id_col),
                        value_set=pa.array(probe_ids, pa.int64()))
        df = pl.from_arrow(b.filter(keep).select([id_col, text_col]))
        return df.select(pl.col(id_col),
                         pl.col(text_col).str.extract_all(r"\S+")
                         .list.unique().alias("__ws")).to_arrow()

    probes = {r[id_col]: (r["__ws"] or [])
              for r in docs.map_batches(
                  probe_words, batch_format="pyarrow").take_all()
              if r[id_col] in pid_set}
    vocab: dict = {}
    for ws in probes.values():
        for w in ws:
            vocab.setdefault(w, len(vocab))
    M = np.zeros((len(vocab), len(probes)), dtype=np.float64)
    psize = np.zeros(len(probes), dtype=np.float64)
    for col, (pid, ws) in enumerate(sorted(probes.items())):
        psize[col] = len(ws)
        for w in ws:
            M[vocab[w], col] = 1.0

    class Scorer:
        def __init__(self, ref):
            self.vocab, self.M, self.psize = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b.select([id_col, text_col]))
            wlists = (df.select(pl.col(text_col).str.extract_all(r"\S+")
                                .list.unique())
                      .to_series().to_list())
            vocab, M, psize = self.vocab, self.M, self.psize
            mj = np.zeros(len(wlists))
            for k, ws in enumerate(wlists):
                ws = ws or []
                rows = [vocab[w] for w in ws if w in vocab]
                if rows:
                    inter = M[rows].sum(axis=0)
                    j = inter / (len(ws) + psize - inter)
                    mj[k] = j.max()
            mj = np.round(mj, 6)
            return pa.table({
                id_col: b.column(id_col),
                "max_jaccard": pa.array(mj, pa.float64()),
                "contaminated": pa.array(mj >= threshold, pa.bool_())})

    return stateful_map(docs.select_columns([id_col, text_col]),
                        Scorer, (vocab, M, psize), batch_size=4096)


def bounded_quantile_threshold(ds, col: str, q: float,
                               digits: int = 6) -> float:
    """EXACT distributed quantile of a bounded, ``digits``-rounded
    column in ONE pass: per batch, bincount the values scaled to
    integers; one vectorized groupby-sum over ≤10^digits bins (the
    value DOMAIN, independent of corpus size); the driver walks the
    tiny histogram to the k-th smallest (k = ⌈q·n⌉ — the
    order-statistic definition, ties well-defined).  The exact
    analogue of the q-digest sketch for columns that are rounded
    anyway (quality ratios, scores in [0, 1])."""
    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    scale = 10 ** digits

    def hist(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy()
        bins = np.rint(v * scale).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"__bin": pa.array(u, pa.int64()),
                         "__c": pa.array(c, pa.int64())})

    rows = (ds.map_batches(hist, batch_format="pyarrow")
            .groupby("__bin").aggregate(_Sum("__c", alias_name="__c"))
            .take_all())
    rows.sort(key=lambda r: r["__bin"])
    n = sum(r["__c"] for r in rows)
    if n == 0:
        return 0.0
    k = int(-(-q * n // 1))           # ceil(q*n)
    acc = 0
    for r in rows:
        acc += r["__c"]
        if acc >= k:
            return r["__bin"] / scale
    return rows[-1]["__bin"] / scale


def quality_percentile_filter(docs, q: float = 0.25,
                              metric: str = "alpha_ratio",
                              text_col: str = "text",
                              id_col: str = "doc_id"):
    """Percentile-thresholded quality gate: keep docs whose quality
    ``metric`` reaches the corpus q-quantile — the adaptive version
    of a fixed-threshold filter (the cutoff tracks the corpus instead
    of hardcoding one).  Exact quantile via
    :func:`bounded_quantile_threshold`; second pass filters."""
    scores = quality_score(docs, text_col=text_col, id_col=id_col)
    scores = scores.materialize()   # consumed twice: histogram + filter
    thr = bounded_quantile_threshold(scores, metric, q)

    def flt(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column(metric),
                                pa.scalar(thr, pa.float64()))
        return b.filter(keep).select([id_col, metric])

    return scores.map_batches(flt, batch_format="pyarrow")


def grouped_bounded_quantiles(ds, group_col: str, col: str,
                              qs=(0.25, 0.5, 0.95)):
    """EXACT per-group quantiles of a bounded integer column without
    materializing any group: per batch a vectorized (group, value)
    count, ONE groupby-sum over (group, value) — rows bounded by
    groups × value DOMAIN, not corpus — and a driver walk to each
    k-th smallest (k = ⌈q·n⌉).  The scale-path alternative to
    ``events.value_percentiles``' full-group ``map_groups`` (exact
    there too, but the whole group must fit one task).  Returns
    ``(group, q, value)`` rows."""
    import polars as pl

    from ray.data.aggregate import Sum as _Sum

    def hist(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([group_col, col]))
              .group_by([group_col, col])
              .agg(pl.len().cast(pl.Int64).alias("__c")))
        return df.to_arrow()

    rows = (ds.map_batches(hist, batch_format="pyarrow")
            .groupby([group_col, col])
            .aggregate(_Sum("__c", alias_name="__c"))
            .take_all())
    by_group: dict = {}
    for r in rows:
        by_group.setdefault(r[group_col], []).append((r[col], r["__c"]))
    out_g, out_q, out_v = [], [], []
    for g in sorted(by_group):
        bins = sorted(by_group[g])
        n = sum(c for _, c in bins)
        for q in qs:
            k = int(-(-q * n // 1))          # ceil(q*n)
            acc = 0
            for v, c in bins:
                acc += c
                if acc >= k:
                    out_g.append(g)
                    out_q.append(float(q))
                    out_v.append(v)
                    break
    return pa.table({group_col: pa.array(out_g),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A1.1 — the published
# document-level heuristic gate used by most pre-training pipelines)

GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs, text_col: str = "text", id_col: str = "doc_id",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2,
                 stop_words: tuple = GOPHER_STOP):
    """Per-document Gopher rule flags, fully vectorized (polars list
    kernels; no Python per row).  Emits the measured statistic AND a
    boolean per rule so downstream mixing can re-gate without
    recomputation:

    1. ``pass_word_count`` — 50 ≤ words ≤ 100 000
    2. ``pass_mean_word_len`` — 3 ≤ mean word length ≤ 10
    3. ``pass_symbol_ratio`` — (# + …) per word ≤ 0.1
    4. ``pass_alpha_words`` — ≥ 80 % of words contain a letter
    5. ``pass_stopwords`` — ≥ 2 distinct canonical stop words present

    Ratios are rounded (half-away, 6 digits) BEFORE thresholding so
    the flags are float-stable across engines; words = single-space
    split, matching the SQL oracle's ``string_split(text, ' ')``."""

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        ws = pl.col(text_col).str.split(" ")
        df = df.with_columns(
            ws.list.len().cast(pl.Int64).alias("n_words"),
            ws.list.eval(pl.element().str.len_chars())
              .list.sum().cast(pl.Int64).alias("__sumlen"),
            ws.list.eval(pl.element().str.contains("[A-Za-z]")
                         .cast(pl.Int64))
              .list.sum().cast(pl.Int64).alias("__alpha"),
            (pl.col(text_col).str.count_matches("#", literal=True)
             + pl.col(text_col).str.count_matches(r"\.\.\."))
            .cast(pl.Int64).alias("__sym"),
            sum((pl.col(text_col)
                 .str.contains(r"(?i)\b" + w + r"\b").cast(pl.Int64))
                for w in stop_words).alias("n_stop_hits"),
        )
        nw1 = pl.max_horizontal(pl.col("n_words"), 1)
        df = df.with_columns(
            _rha(pl.col("__sumlen") / nw1, 6).alias("mean_word_len"),
            _rha(pl.col("__alpha") / nw1, 6).alias("frac_alpha_words"),
            _rha(pl.col("__sym") / nw1, 6).alias("symbol_ratio"),
        )
        df = df.with_columns(
            (pl.col("n_words").is_between(min_words, max_words))
            .alias("pass_word_count"),
            (pl.col("mean_word_len")
             .is_between(min_mean_word_len, max_mean_word_len))
            .alias("pass_mean_word_len"),
            (pl.col("symbol_ratio") <= max_symbol_ratio)
            .alias("pass_symbol_ratio"),
            (pl.col("frac_alpha_words") >= min_alpha_word_frac)
            .alias("pass_alpha_words"),
            (pl.col("n_stop_hits") >= min_stop_hits)
            .alias("pass_stopwords"),
        )
        df = df.with_columns(
            (pl.col("pass_word_count") & pl.col("pass_mean_word_len")
             & pl.col("pass_symbol_ratio") & pl.col("pass_alpha_words")
             & pl.col("pass_stopwords")).alias("passes_gopher"))
        return df.drop([text_col, "__sumlen", "__alpha", "__sym"]
                       ).to_arrow()

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=16384)


def pack_sequences(docs, seq_len: int = 1024,
                   text_col: str = "text", id_col: str = "doc_id",
                   docs_per_part: int = 4096,
                   seqs_per_shard: int = 1024):
    """MATERIALIZE the packed training sequences (the layout
    :func:`pack_sequence_offsets` only describes): concatenate every
    doc's whitespace tokens in ``id`` order, split every ``seq_len``
    tokens, return ``(seq_id, seq_text, n_tokens)`` — the final
    partial sequence included with ``n_tokens < seq_len``.

    Three stages, none corpus-sized on any worker:

    1. the offsets prefix sum (per-partition token sums → tiny driver
       reduce → broadcast base offsets), as in
       :func:`pack_sequence_offsets`;
    2. fragment slicing — one grouped pass per coarse id partition:
       each doc emits its (sequence, token-range) fragments by direct
       list slicing (a doc spans ``n // seq_len + 2`` sequences at
       most, so fragment rows ≈ doc rows);
    3. reassembly — fragments shuffle ONCE keyed by
       ``seq_id // seqs_per_shard`` and each shard is reassembled in
       ONE vectorized call (lexsort + ListArray + binary_join — the
       ``remove_duplicate_segments`` idiom), never one Python call
       per sequence."""
    from ray.data.aggregate import Sum as _Sum

    def counts(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        return df.select(
            pl.col(id_col), pl.col(text_col),
            (pl.col(text_col).str.count_matches(" ", literal=True)
             + 1).cast(pl.Int64).alias("n_tokens"),
            (pl.col(id_col) // docs_per_part).cast(pl.Int64)
            .alias("__part")).to_arrow()

    cnt = docs.map_batches(counts, batch_format="pyarrow")
    psums = (cnt.map_batches(
                 lambda b: b.select(["__part", "n_tokens"]),
                 batch_format="pyarrow")
             .groupby("__part")
             .aggregate(_Sum("n_tokens", alias_name="__s")).take_all())
    psums.sort(key=lambda r: r["__part"])
    offsets, acc = {}, 0
    for r in psums:
        offsets[r["__part"]] = acc
        acc += r["__s"]

    def fragments(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        n = group.column("n_tokens").to_numpy()
        order = np.argsort(ids)
        texts = group.column(text_col).take(pa.array(order)).to_pylist()
        n = n[order]
        base = offsets[group.column("__part")[0].as_py()]
        start = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        out_sid, out_fs, out_tx, out_nt = [], [], [], []
        for s, nn, t in zip(start, n, texts):
            toks = t.split(" ")
            for sid in range(int(s) // seq_len,
                             int(s + nn - 1) // seq_len + 1):
                a = max(sid * seq_len - int(s), 0)
                b2 = min((sid + 1) * seq_len - int(s), int(nn))
                out_sid.append(sid)
                out_fs.append(int(s) + a)
                out_tx.append(" ".join(toks[a:b2]))
                out_nt.append(b2 - a)
        return pa.table({
            "seq_id": pa.array(out_sid, pa.int64()),
            "__fstart": pa.array(out_fs, pa.int64()),
            # plain string: binary_join has no list<large_string>
            # kernel, and a fragment is at most seq_len tokens
            "__ftext": pa.array(out_tx, pa.string()),
            "__ftok": pa.array(out_nt, pa.int64()),
            "__shard": pa.array(
                [sid // seqs_per_shard for sid in out_sid], pa.int64()),
        })

    frag = cnt.groupby("__part").map_groups(fragments,
                                            batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        sid = group.column("seq_id").to_numpy()
        fs = group.column("__fstart").to_numpy()
        order = np.lexsort((fs, sid))
        sid = sid[order]
        tx = group.column("__ftext").combine_chunks().take(
            pa.array(order))
        nt = group.column("__ftok").to_numpy()[order]
        first = np.empty(len(sid), bool)
        if len(sid):
            first[0] = True
            np.not_equal(sid[1:], sid[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        bounds = np.concatenate((starts, [len(sid)]))
        lj = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), tx)
        seg = np.cumsum(first) - 1
        return pa.table({
            "seq_id": pa.array(sid[starts], pa.int64()),
            "seq_text": pc.binary_join(lj, " "),
            "n_tokens": pa.array(
                np.bincount(seg, weights=nt,
                            minlength=len(starts)).astype(np.int64),
                pa.int64())})

    return frag.groupby("__shard").map_groups(reassemble,
                                              batch_format="pyarrow")


def bpe_encode(docs, merges, text_col: str = "text",
               id_col: str = "doc_id",
               driver_max_words: int = 2_000_000):
    """Apply a trained merge list (``bpe_train`` output) to the
    corpus — the tokenizer's ENCODE side.  Returns ``(doc_id,
    n_words, n_bpe_tokens, bpe_tokens)`` with the full token
    sequence per doc.

    Scale shape: the corpus is never re-merged per doc.  The distinct
    WORD vocabulary is encoded once (``_apply_merge``, the training
    kernel, verbatim — one pass per merge in rank order, so encode
    semantics are bit-identical to training by construction), then
    docs re-tokenize through the word→tokens map.  Same plan pick as
    ``bpe_train``: a vocab under ``driver_max_words`` encodes on the
    driver and broadcasts via the ``stateful_map`` policy; larger
    vocabularies run the merge kernels as ``map_batches`` passes and
    attach tokens through a distributed hash join (explode to
    ``(doc, ord, word)`` → join on word → per-doc reassemble), so
    the map never lands in one heap.  The vocabulary is built from
    ``docs`` itself, so the join cannot miss (the driver plan's OOV
    fallback is the same belt-and-braces).

    Not SQL-expressible (iterative greedy merging — in particular a
    replace-based restatement diverges on odd same-symbol runs, where
    left-to-right greedy pairs (1,2)(3,4) but a guarded string
    replace pairs (1,2)(4,5)); verified in pytest against an
    independent reference encoder, with the oracle-checked exact
    twins ``docs_bpe_pair_counts`` / ``docs_token_count`` covering
    the input stats."""
    import ray

    from ferenda_ray.stages.broadcast import resolve, stateful_map

    ordered = [(l, r) for _rank, l, r, _f in
               sorted(merges, key=lambda m: m[0])]
    vocab = word_frequencies(docs, text_col, id_col)

    def init_syms(b: pa.Table) -> pa.Table:
        ws = b.column("word").to_pylist()
        return pa.table({
            "word": b.column("word"),
            "syms": pa.array([list(w) for w in ws],
                             pa.list_(pa.string())),
            # _apply_merge carries a freq column; unused here
            "freq": pa.array([1] * len(ws), pa.int64())})

    table = vocab.map_batches(init_syms,
                              batch_format="pyarrow").materialize()

    def keep_word(fn):
        def apply(b: pa.Table) -> pa.Table:
            out = fn(b.select(["syms", "freq"]))
            return out.append_column("word", b.column("word"))
        return apply

    if table.count() <= driver_max_words:
        tbls = [t for t in ray.get(table.to_arrow_refs()) if t.num_rows]
        ltbl = (pa.concat_tables(tbls) if tbls
                else pa.table({"word": pa.array([], pa.string()),
                               "syms": pa.array([], pa.list_(pa.string())),
                               "freq": pa.array([], pa.int64())}))
        for l, r in ordered:
            ltbl = keep_word(_apply_merge(l, r))(ltbl)
        word_toks = dict(zip(ltbl.column("word").to_pylist(),
                             ltbl.column("syms").to_pylist()))
    else:
        for l, r in ordered:
            table = table.map_batches(
                keep_word(_apply_merge(l, r)),
                batch_format="pyarrow").materialize()
        # distributed encode — the point of the plan pick is that the
        # word→tokens map never lands in ONE heap (driver or actor):
        # explode docs to (doc_id, __ord, word), hash-join the
        # encoded vocabulary, reassemble per doc in word order
        from ferenda_ray.cluster import (coalesce_partitions,
                                         join_partitions,
                                         ray_join_handles_empty_blocks)
        SEP = "\x1f"

        def pack(b: pa.Table) -> pa.Table:
            return pa.table({
                "word": b.column("word"),
                "__enc": pa.array(
                    [SEP.join(s) for s in b.column("syms").to_pylist()],
                    pa.string())})

        enc = table.map_batches(pack, batch_format="pyarrow")

        def explode(b: pa.Table) -> pa.Table:
            words = [t.split(" ")
                     for t in b.column(text_col).to_pylist()]
            n = np.array([len(w) for w in words], np.int64)
            idx = np.repeat(np.arange(b.num_rows), n)
            ords = (np.concatenate([np.arange(k) for k in n])
                    if len(n) else np.array([], np.int64))
            return pa.table({
                id_col: b.column(id_col).take(pa.array(idx)),
                "__ord": pa.array(ords, pa.int64()),
                "word": pa.array([w for ws in words for w in ws],
                                 pa.string())})

        ex = docs.map_batches(explode, batch_format="pyarrow")
        np_ = join_partitions()
        if not ray_join_handles_empty_blocks():
            co = coalesce_partitions()
            ex, enc = ex.repartition(co), enc.repartition(co)
        j = ex.join(enc, join_type="left_outer", on=("word",),
                    num_partitions=np_)

        def reassemble(g: pa.Table) -> pa.Table:
            order = np.argsort(g.column("__ord").to_numpy(),
                               kind="stable")
            encs = g.column("__enc").to_pylist()
            toks: list = []
            for k in order:
                e = encs[k]
                toks.extend(e.split(SEP) if e else [])
            return pa.table({
                id_col: g.column(id_col).slice(0, 1),
                "n_words": pa.array([g.num_rows], pa.int64()),
                "n_bpe_tokens": pa.array([len(toks)], pa.int64()),
                "bpe_tokens": pa.array([toks],
                                       pa.list_(pa.string()))})

        return j.groupby(id_col).map_groups(reassemble,
                                            batch_format="pyarrow")

    class Encoder:
        def __init__(self, ref):
            self.word_toks, self.ordered = resolve(ref)

        def _encode_oov(self, w: str) -> list:
            # word outside the vocabulary map (docs ≠ the corpus the
            # map was built from): apply the merges directly —
            # identical greedy left-to-right semantics
            s = list(w)
            for l, r in self.ordered:
                res, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                s = res
            return s

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col)
            toks_out, nw, nt = [], [], []
            for t in b.column(text_col).to_pylist():
                ws = t.split(" ")
                toks = [s for w in ws
                        for s in (self.word_toks.get(w)
                                  or self._encode_oov(w))]
                toks_out.append(toks)
                nw.append(len(ws))
                nt.append(len(toks))
            return pa.table({
                id_col: ids,
                "n_words": pa.array(nw, pa.int64()),
                "n_bpe_tokens": pa.array(nt, pa.int64()),
                "bpe_tokens": pa.array(toks_out,
                                       pa.list_(pa.string()))})

    return stateful_map(docs, Encoder, (word_toks, ordered),
                        batch_size=4096)


def moore_lewis_weights(docs, target, alpha: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Cross-entropy difference data selection (Moore & Lewis 2010):
    per doc, ``ce_diff = bits_in_domain − bits_general`` where the
    in-domain bigram LM trains on ``target`` and the general LM on
    the scored corpus itself; ``keep`` = docs that look more like the
    target domain than the general corpus (``ce_diff < 0``, compared
    on the 6-digit rounded value so the flag is float-stable).

    Two :func:`perplexity_score` passes + one id hash join — both
    per-doc statistic tables are corpus-row-sized with two numeric
    columns, and the LM count tables stay Datasets throughout (the
    cross-trained pass smooths unseen bigrams at the add-alpha
    floor via left joins)."""
    from ferenda_ray.cluster import (coalesce_partitions,
                                     join_partitions,
                                     ray_join_handles_empty_blocks)

    # phase barriers: each leg holds 2 hash joins, and Ray's join
    # aggregator actors reserve join_partitions() CPUs per join for
    # the life of the topology — 5 concurrent joins (2+2+1) starve
    # the map stages (46.7 s at sf0.1; 11 s phased).  The barrier
    # holds only the per-doc (id, n_bigrams, bits) stat table.
    bits_in = perplexity_score(docs, train=target, alpha=alpha,
                               text_col=text_col,
                               id_col=id_col).materialize()
    bits_gen = perplexity_score(docs, alpha=alpha, text_col=text_col,
                                id_col=id_col).materialize()

    def rename(suffix):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                id_col: b.column(id_col),
                "n_bigrams" + ("" if suffix == "_in" else "__d"):
                    b.column("n_bigrams"),
                "bits" + suffix: b.column("bits_per_bigram")})
        return f

    left = bits_in.map_batches(rename("_in"), batch_format="pyarrow")
    right = bits_gen.map_batches(rename("_gen"), batch_format="pyarrow")
    np_ = join_partitions()
    if not ray_join_handles_empty_blocks():
        co = coalesce_partitions()
        left, right = left.repartition(co), right.repartition(co)
    j = left.join(right, join_type="inner", on=(id_col,),
                  num_partitions=np_)

    def finalize(b: pa.Table) -> pa.Table:
        d = (b.column("bits_in").to_numpy()
             - b.column("bits_gen").to_numpy())
        d6 = np.floor(np.abs(d) * 1e6 + 0.5) / 1e6 * np.sign(d)
        return pa.table({
            id_col: b.column(id_col),
            "n_bigrams": b.column("n_bigrams"),
            "ce_diff": pa.array(d6, pa.float64()),
            "keep": pa.array(d6 < 0, pa.bool_())})

    return j.map_batches(finalize, batch_format="pyarrow")


def _md5_bucket(s: str, n_buckets: int) -> int:
    """``md5_number_lower``-compatible bucket — the engine-wide
    DuckDB-parity hash (one base: ``sample.md5_u64``)."""
    from ferenda_ray.stages.sample import md5_u64
    return md5_u64(s) % n_buckets


def _bigram_bucket_arrays(texts, n_buckets: int):
    """Flat bucket-id array for every bigram of every text plus the
    per-text bigram counts.  md5 runs ONCE per DISTINCT bigram in the
    batch (``np.unique`` inverse mapping) — on natural text the
    within-batch vocabulary is a small fraction of the token count."""
    grams, lens = [], np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        n = max(len(ws) - 1, 0)
        lens[i] = n
        grams.extend(ws[j] + " " + ws[j + 1] for j in range(n))
    if not grams:
        return np.empty(0, np.int64), lens
    uniq, inv = np.unique(np.asarray(grams, dtype=object),
                          return_inverse=True)
    ub = np.fromiter((_md5_bucket(u, n_buckets) for u in uniq),
                     dtype=np.int64, count=len(uniq))
    return ub[inv], lens


def dsir_weights(docs, target, n_buckets: int = 1024,
                 text_col: str = "text", id_col: str = "doc_id"):
    """Data Selection via Importance Resampling (Xie et al. 2023,
    hashed-n-gram variant): per doc, the mean log importance ratio of
    its hashed bigram features under the target-vs-raw distributions,

        ``lam[b] = ln((t[b]+1)/(T+B)) - ln((r[b]+1)/(R+B))``

    with ``t``/``r`` the bucket counts over ``target`` / ``docs``
    and add-one smoothing over the ``B = n_buckets`` feature space.
    Emits ``(id, n_bigrams, dsir_logratio, keep)`` — ``keep`` is the
    deterministic selection surrogate (rounded ratio > 0: the doc
    looks more target- than corpus-like); docs with <2 tokens have no
    features and emit no row (matches the SQL inner join).

    Scale shape — the reason DSIR works at 100 TB: the model is a
    FIXED ``B``-float array regardless of corpus size.  Two count
    passes (per-batch ``np.bincount`` partials → one tiny
    ``groupby('bucket')`` exchange each, ≤B rows out), a ≤B-row
    driver reduce, then ONE broadcast scoring pass
    (``stateful_map`` policy) — no joins, nothing corpus-sized off
    the Datasets.  Rounded half-away to 6 digits (signed) before the
    keep compare, the repo-wide float-stability convention."""
    from ray.data.aggregate import Sum as _Sum

    from ferenda_ray.stages.broadcast import resolve, stateful_map

    def bucket_hist(b: pa.Table) -> pa.Table:
        ub, _ = _bigram_bucket_arrays(
            b.column(text_col).to_pylist(), n_buckets)
        cnt = np.bincount(ub, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    def totals(ds):
        out = np.zeros(n_buckets, np.float64)
        agg = (ds.map_batches(bucket_hist, batch_format="pyarrow",
                              batch_size=8192)
               .groupby("bucket")
               .aggregate(_Sum("n", alias_name="n")))
        for r in agg.take_all():            # ≤ n_buckets rows
            out[r["bucket"]] = r["n"]
        return out

    r, t = totals(docs), totals(target)
    lam = (np.log((t + 1.0) / (t.sum() + n_buckets))
           - np.log((r + 1.0) / (r.sum() + n_buckets)))

    class Scorer:
        def __init__(self, ref):
            self.lam = resolve(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ub, lens = _bigram_bucket_arrays(
                b.column(text_col).to_pylist(), n_buckets)
            keep_rows = lens > 0
            if not keep_rows.any():
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "dsir_logratio": pa.array([], pa.float64()),
                    "keep": pa.array([], pa.bool_())})
            ends = np.cumsum(lens)
            starts = ends - lens
            sums = np.add.reduceat(
                np.concatenate([self.lam[ub], [0.0]]),
                np.minimum(starts[keep_rows], len(ub)))
            mean = sums / lens[keep_rows]
            m6 = np.floor(np.abs(mean) * 1e6 + 0.5) / 1e6 * np.sign(mean)
            return pa.table({
                id_col: b.column(id_col).filter(
                    pa.array(keep_rows, pa.bool_())),
                "n_bigrams": pa.array(lens[keep_rows], pa.int64()),
                "dsir_logratio": pa.array(m6, pa.float64()),
                "keep": pa.array(m6 > 0, pa.bool_())})

    return stateful_map(docs, Scorer, lam, batch_size=8192)


def normalize_text(docs, form: str = "NFKC", lowercase: bool = True,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Unicode + whitespace normalization — the canonical first
    cleaning stage: unicode normal form (``NFKC`` default; pass
    ``None`` to skip), control-character strip, whitespace collapse
    to single spaces, edge trim, optional lowercasing.  The regex
    passes are vectorized polars kernels; the unicode form runs
    through ``unicodedata.normalize`` with an ``isascii()`` fast
    path — pyarrow 16.1's ``utf8_normalize`` is NOT used because its
    NFC/NFKC emit DECOMPOSED forms (verified vs unicodedata:
    Å → A+U+030A).  Returns ``(id, norm_text, n_chars_before,
    n_chars_after)``.

    The oracled driver instance runs ``form="NFC"`` because DuckDB
    exposes only ``nfc_normalize``; NFKC (compatibility folding — the
    form real pipelines want) is pytest-pinned on crafted unicode."""
    def norm(b: pa.Table) -> pa.Table:
        txt = b.column(text_col)
        if form:
            import unicodedata
            txt = pa.array(
                [t if t.isascii() else unicodedata.normalize(form, t)
                 for t in txt.to_pylist()], pa.string())
        df = pl.from_arrow(pa.table({id_col: b.column(id_col),
                                     "__t": txt,
                                     "__orig": b.column(text_col)}))
        t = pl.col("__t")
        if lowercase:
            t = t.str.to_lowercase()
        # keep \t \n \r out of the control class: they are WHITESPACE
        # and must collapse to a space, not vanish (tab-fused words)
        t = (t.str.replace_all(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
             .str.replace_all(r"\s+", " ")
             .str.strip_chars(" "))
        out = df.select(
            pl.col(id_col),
            t.alias("norm_text"),
            pl.col("__orig").str.len_chars().cast(pl.Int64)
            .alias("n_chars_before"))
        out = out.with_columns(
            pl.col("norm_text").str.len_chars().cast(pl.Int64)
            .alias("n_chars_after"))
        return out.to_arrow()

    return docs.map_batches(norm, batch_format="pyarrow",
                            batch_size=16384)


def c4_rules(docs, text_col: str = "text", id_col: str = "doc_id",
             min_sentences: int = 3,
             min_terminal_punct_frac: float = 0.0):
    """Per-document C4 heuristic flags (Raffel et al. 2020 §2.2),
    fully vectorized — the line/boilerplate cleaning family that
    complements :func:`gopher_rules`' token statistics.  Emits the
    measured statistic AND a boolean per rule:

    * ``n_sentences`` — terminal-punctuation count; gate ≥
      ``min_sentences`` (C4 drops pages under 3 sentences);
    * ``frac_terminal_punct`` — fraction of lines ending in
      ``. ! ? "`` (C4 keeps only such lines; we flag at doc level);
    * ``has_lorem`` / ``has_brace`` / ``has_javascript`` /
      ``has_policy`` — the published page-level discard markers
      ("lorem ipsum", ``{``, "javascript", privacy/terms/cookie
      boilerplate);
    * ``passes_c4`` — sentence + punct-frac gates AND no marker.

    Ratios rounded half-away to 6 digits BEFORE thresholding (the
    engine float-stability convention); lines = ``\\n`` split,
    matching the SQL oracle."""

    def score(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select([id_col, text_col]))
        ls = pl.col(text_col).str.split("\n")
        df = df.with_columns(
            ls.list.len().cast(pl.Int64).alias("n_lines"),
            ls.list.eval(pl.element().str.contains(r'[.!?"]$')
                         .cast(pl.Int64))
              .list.sum().cast(pl.Int64).alias("__term"),
            pl.col(text_col).str.count_matches(r"[.!?]")
              .cast(pl.Int64).alias("n_sentences"),
            pl.col(text_col).str.contains(r"(?i)lorem ipsum")
              .alias("has_lorem"),
            pl.col(text_col).str.contains("{", literal=True)
              .alias("has_brace"),
            pl.col(text_col).str.contains(r"(?i)javascript")
              .alias("has_javascript"),
            pl.col(text_col).str.contains(
                r"(?i)privacy policy|terms of use|cookie policy")
              .alias("has_policy"),
        )
        df = df.with_columns(
            _rha(pl.col("__term")
                 / pl.max_horizontal(pl.col("n_lines"), 1), 6)
            .alias("frac_terminal_punct"))
        df = df.with_columns(
            ((pl.col("n_sentences") >= min_sentences)
             & (pl.col("frac_terminal_punct")
                >= min_terminal_punct_frac)
             & ~pl.col("has_lorem") & ~pl.col("has_brace")
             & ~pl.col("has_javascript") & ~pl.col("has_policy"))
            .alias("passes_c4"))
        return df.drop([text_col, "__term"]).to_arrow()

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=16384)


def ngram_diversity(docs, ns: tuple = (1, 2, 3),
                    text_col: str = "text"):
    """Corpus n-gram diversity — per n: total n-grams, distinct
    n-grams, and the distinct/total ratio (rounded 6) — the
    repetitiveness health metric a dataset card reports (low ratios
    flag boilerplate-heavy or templated corpora).

    One explode pass per n (gram strings, pre-distinct'd in-batch by
    ``bgp.distinct`` before the count exchange); totals are a
    row-count, distincts one groupby-count.  At the 100-TB tier the
    hashed-gram kernel (``dedup.ngram_dup_stats``: 16 B lane-hashes
    in flight, never gram text) is the drop-in shape; the string form
    here stays bit-comparable to the SQL restatement."""
    import math

    from ferenda_ray.stages.bgp import distinct

    rows = []
    for n in ns:
        def explode(b: pa.Table, n=n) -> pa.Table:
            out = []
            for t in b.column(text_col).to_pylist():
                ws = t.split(" ")
                out.extend(" ".join(ws[i:i + n])
                           for i in range(len(ws) - n + 1))
            return pa.table({"g": pa.array(out, pa.string())})

        ex = docs.map_batches(explode, batch_format="pyarrow")
        total = ex.count()
        dist = distinct(ex, ["g"]).count()
        ratio = (math.floor(dist / total * 1e6 + 0.5) / 1e6
                 if total else 0.0)
        rows.append((n, total, dist, ratio))
    return pa.table({
        "n": pa.array([r[0] for r in rows], pa.int64()),
        "total_ngrams": pa.array([r[1] for r in rows], pa.int64()),
        "distinct_ngrams": pa.array([r[2] for r in rows], pa.int64()),
        "diversity": pa.array([r[3] for r in rows], pa.float64())})
