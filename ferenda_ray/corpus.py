"""Deterministic synthetic source-code corpus with computable golden triples.

The analogue of the reference's checked-in fixture corpora
(``test/files/rfc/basic.txt`` → golden ``basic.xml``;
``RepoTester.distill_test`` golden Turtle graphs,
``ferenda/testutil.py:648-668``): a seeded generator renders files in
four languages (python / java / go / markdown) whose structure — title,
header key-values, numbered sections/subsections, prose with alias
mentions, cross-file citations, imports — is *known at generation
time*, so the exact canonical triple set the KG pipeline must emit is
computed here, independently of the extraction code.

Schema follows the driver ``input_hint``:
``(repo: string, path: string, commit: string, lang: string,
content: string)``.  Skew knob: two mega-repos hold ~half the files
(exercises salted repartition, SURVEY.md §7.3).

No RNG in distributed paths: everything derives from
``sha256(seed, repo, path)`` (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

import pyarrow as pa

from ferenda_ray import ns
from ferenda_ray.uri import DEFAULT_BASE, doc_uri, frag_uri, entity_uri

# ---------------------------------------------------------------------------
# fixed vocabularies (disjoint from alias tokens, so prose never forms an
# accidental alias mention)

WORDS = (
    "system value frame block metric stream record vector merge scan cursor "
    "filter window socket thread branch kernel buffer offset legend matrix "
    "tensor module handle router ledger packet signal beacon garden meadow "
    "harbor timber copper marble cobalt amber velvet canyon summit prairie "
    "lagoon breeze ember willow falcon heron otter badger linden tundra"
).split()

NAMES = ["Ada Byron", "Edsger Wijk", "Grace Mary", "Alan Ridge", "Barbara Nov"]

MODULES = [
    "corelib", "netkit", "mathx", "strfmt", "timeax", "iolayer", "cryptx",
    "geomx", "parsekit", "logfmt",
]

# concept slug -> spelling variants; each spelling is an alias mapping to its
# own variant entity URI; owl:sameAs links variants of one concept.  Includes
# near-miss spellings as first-class aliases (FIXTURES.md §2) — the analogue
# of ferenda's ``namedlaws`` abbreviation dictionary
# (ferenda/sources/legal/se/legalref.py:258-284).
CONCEPTS = [
    ("quicksilver", ["quicksilver", "quick silver", "qicksilver"]),
    ("ironwood", ["ironwood", "iron wood"]),
    ("brightwater", ["brightwater", "bright water", "brigthwater"]),
    ("stormvale", ["stormvale", "storm vale"]),
    ("goldspire", ["goldspire", "gold spire", "goldspier"]),
    ("nightglass", ["nightglass", "night glass"]),
    ("redhollow", ["redhollow", "red hollow"]),
    ("palecliff", ["palecliff", "pale cliff", "paleclif"]),
    ("duskmere", ["duskmere", "dusk mere"]),
    ("wintermoor", ["wintermoor", "winter moor"]),
]

GRAPH = DEFAULT_BASE + "dataset/code"
ENGINE_URI = DEFAULT_BASE + "engine"

LANGS = ["python", "java", "go", "markdown"]
EXT = {"python": "py", "java": "java", "go": "go", "markdown": "md"}


def _slug(s: str) -> str:
    return s.lower().replace(" ", "_")


def alias_rows() -> list[dict]:
    """(alias, label, entity_uri) rows — the linker's broadcast side input."""
    rows = []
    for slug, spellings in CONCEPTS:
        label = spellings[0]
        for sp in spellings:
            rows.append(
                {"alias": sp, "label": label,
                 "entity_uri": entity_uri(_slug(sp))}
            )
    return rows


def sameas_rows() -> list[dict]:
    """owl:sameAs edges: star from each variant to the first spelling."""
    rows = []
    for slug, spellings in CONCEPTS:
        canon = entity_uri(_slug(spellings[0]))
        for sp in spellings[1:]:
            rows.append({"subj": entity_uri(_slug(sp)), "obj": canon})
    return rows


def canonical_entity_map() -> dict:
    """variant entity URI -> canonical (lexicographically smallest in its
    sameAs cluster — the engine's deterministic representative rule)."""
    out = {}
    for slug, spellings in CONCEPTS:
        uris = [entity_uri(_slug(sp)) for sp in spellings]
        canon = min(uris)
        for u in uris:
            out[u] = canon
    return out


def vocab_triple_rows() -> list[dict]:
    """Label triples about entity variants (pre-canonicalization)."""
    rows = []
    for slug, spellings in CONCEPTS:
        label = spellings[0]
        for sp in spellings:
            u = entity_uri(_slug(sp))
            rows.append(_lit(u, ns.RDFS_LABEL, label))
            rows.append(_lit(u, ns.SKOS_ALTLABEL, sp))
    return rows


def _lit(subj, pred, value, lang=None, datatype=None):
    return {
        "subj": subj, "pred": pred, "obj_type": "literal",
        "obj_value": str(value), "obj_lang": lang, "obj_datatype": datatype,
    }


def _ref(subj, pred, obj):
    return {
        "subj": subj, "pred": pred, "obj_type": "uri",
        "obj_value": obj, "obj_lang": None, "obj_datatype": None,
    }


def ref_uri(repo: str, path: str, ordinal: str | None, base=DEFAULT_BASE) -> str:
    """Commit-less reference URI minted from a citation's parse groups —
    resolved to concrete doc URIs by the dependency join
    (relate_dependencies semantics, documentrepository.py:2018-2056)."""
    u = f"{base}ref/{repo}/{path}"
    if ordinal:
        u += f"#S{ordinal}"
    return u


def module_uri(mod: str, base=DEFAULT_BASE) -> str:
    return f"{base}module/{mod}"


# ---------------------------------------------------------------------------
# per-file deterministic plan

@dataclass
class SectionPlan:
    ordinal: str
    title: str
    prose: list[str] = field(default_factory=list)     # sentences
    citations: list[tuple] = field(default_factory=list)  # (repo, path, ord|None)
    mentions: list[str] = field(default_factory=list)  # alias spellings inserted
    subs: list["SectionPlan"] = field(default_factory=list)


@dataclass
class DocPlan:
    repo: str
    path: str
    commit: str
    lang: str
    title: str
    author: str
    issued: str
    imports: list[str]
    intro_prose: list[str]
    intro_citations: list[tuple]
    intro_mentions: list[str]
    sections: list[SectionPlan]


def _rng_for(seed: int, repo: str, path: str) -> random.Random:
    h = hashlib.sha256(f"{seed}:{repo}:{path}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def commit_for(seed: int, repo: str, path: str) -> str:
    return hashlib.sha256(f"commit:{seed}:{repo}:{path}".encode()).hexdigest()[:40]


def _sentence(rng: random.Random, mention: str | None = None) -> str:
    n = rng.randint(6, 11)
    words = [rng.choice(WORDS) for _ in range(n)]
    if mention is not None:
        pos = rng.randint(1, len(words) - 1)
        words[pos:pos] = [mention]
    return " ".join(words)


@dataclass
class CorpusSpec:
    n_files: int = 200
    n_repos: int = 8
    seed: int = 42
    base: str = DEFAULT_BASE
    mega_frac: float = 0.5  # share of files in the 2 mega-repos


def file_list(spec: CorpusSpec) -> list[tuple]:
    """Deterministic (repo, path, lang) assignment with mega-repo skew."""
    rng = random.Random(spec.seed)
    repos = [f"org{i % 4}/repo{i}" for i in range(spec.n_repos)]
    out = []
    n_mega = int(spec.n_files * spec.mega_frac)
    per_path_counter: dict = {}
    for i in range(spec.n_files):
        if i < n_mega:
            repo = repos[i % 2]          # 2 mega-repos
        else:
            repo = repos[2 + (i % max(1, spec.n_repos - 2))]
        lang = LANGS[i % len(LANGS)]
        k = per_path_counter.get(repo, 0)
        per_path_counter[repo] = k + 1
        path = f"src/pkg{k % 7}/mod_{k:04d}.{EXT[lang]}"
        out.append((repo, path, lang))
    return out


def plan_doc(spec: CorpusSpec, repo: str, path: str, lang: str,
             all_files: list[tuple]) -> DocPlan:
    rng = _rng_for(spec.seed, repo, path)
    title = " ".join(w.capitalize() for w in rng.sample(WORDS, 3))
    author = rng.choice(NAMES)
    issued = f"20{rng.randint(19, 24)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    imports = (
        sorted(rng.sample(MODULES, rng.randint(1, 3)))
        if lang != "markdown" else []
    )

    def prose_block(frag):
        for _ in range(rng.randint(1, 3)):
            if rng.random() < 0.5:
                spelling = rng.choice(rng.choice(CONCEPTS)[1])
                frag_mentions.append(spelling)
                frag_prose.append(_sentence(rng, spelling))
            else:
                frag_prose.append(_sentence(rng))

    intro_prose: list[str] = []
    intro_cit: list[tuple] = []
    intro_mentions: list[str] = []
    frag_prose, frag_mentions = intro_prose, intro_mentions
    prose_block(None)
    if rng.random() < 0.4 and len(all_files) > 1:
        tr, tp, _tl = all_files[rng.randrange(len(all_files))]
        if (tr, tp) != (repo, path):
            intro_cit.append((tr, tp, None))

    n_secs = rng.randint(2, 4)
    sections = []
    for si in range(1, n_secs + 1):
        sec = SectionPlan(ordinal=str(si),
                          title=" ".join(w.capitalize()
                                         for w in rng.sample(WORDS, 2)))
        frag_prose, frag_mentions = sec.prose, sec.mentions
        prose_block(sec)
        if rng.random() < 0.5 and len(all_files) > 1:
            tr, tp, _tl = all_files[rng.randrange(len(all_files))]
            if (tr, tp) != (repo, path):
                sec.citations.append(
                    (tr, tp, "1" if rng.random() < 0.5 else None))
        # go sections stay flat; others may nest
        n_subs = 0 if lang == "go" else rng.randint(0, 2)
        for sj in range(1, n_subs + 1):
            sub = SectionPlan(ordinal=f"{si}.{sj}",
                              title=" ".join(w.capitalize()
                                             for w in rng.sample(WORDS, 2)))
            frag_prose, frag_mentions = sub.prose, sub.mentions
            prose_block(sub)
            sec.subs.append(sub)
        sections.append(sec)
    return DocPlan(repo=repo, path=path,
                   commit=commit_for(spec.seed, repo, path), lang=lang,
                   title=title, author=author, issued=issued,
                   imports=imports, intro_prose=intro_prose,
                   intro_citations=intro_cit, intro_mentions=intro_mentions,
                   sections=sections)


# ---------------------------------------------------------------------------
# renderers — one per language; the extraction stage implements the inverse

def _cit_text(c: tuple) -> str:
    r, p, o = c
    return f"see {r}:{p}#S{o}" if o else f"see {r}:{p}"


def render_markdown(d: DocPlan) -> str:
    L = [f"# {d.title}", "", f"Author: {d.author}", f"Issued: {d.issued}", ""]
    for s in d.intro_prose:
        L.append(s)
    for c in d.intro_citations:
        L.append(_cit_text(c) + ".")
    L.append("")
    for sec in d.sections:
        L.append(f"## {sec.ordinal}. {sec.title}")
        L.append("")
        for s in sec.prose:
            L.append(s)
        for c in sec.citations:
            L.append(_cit_text(c) + ".")
        L.append("")
        for sub in sec.subs:
            L.append(f"### {sub.ordinal} {sub.title}")
            L.append("")
            for s in sub.prose:
                L.append(s)
            L.append("")
    return "\n".join(L).rstrip() + "\n"


def _pyname(rng_src: str, i: int) -> str:
    return f"item_{i}"


def render_python(d: DocPlan) -> str:
    L = [f'"""{d.title}"""', f"# Author: {d.author}", f"# Issued: {d.issued}"]
    for m in d.imports:
        L.append(f"import {m}")
    L.append("")
    for s in d.intro_prose:
        L.append(f"# {s}")
    for c in d.intro_citations:
        L.append(f"# {_cit_text(c)}")
    L.append("")
    for si, sec in enumerate(d.sections, 1):
        if sec.subs:
            L.append(f"class Cls{si}:")
            L.append(f'    """{sec.title}"""')
            for s in sec.prose:
                L.append(f"    # {s}")
            for c in sec.citations:
                L.append(f"    # {_cit_text(c)}")
            for sj, sub in enumerate(sec.subs, 1):
                L.append(f"    def meth{sj}(self):")
                L.append(f'        """{sub.title}"""')
                for s in sub.prose:
                    L.append(f"        # {s}")
                L.append(f"        return {sj}")
            L.append("")
        else:
            L.append(f"def fn{si}():")
            L.append(f'    """{sec.title}"""')
            for s in sec.prose:
                L.append(f"    # {s}")
            for c in sec.citations:
                L.append(f"    # {_cit_text(c)}")
            L.append(f"    return {si}")
            L.append("")
    return "\n".join(L).rstrip() + "\n"


def render_java(d: DocPlan) -> str:
    L = [f"// {d.title}", f"// Author: {d.author}", f"// Issued: {d.issued}",
         "package corpus.gen;", ""]
    for m in d.imports:
        L.append(f"import {m}.Lib;")
    L.append("")
    for s in d.intro_prose:
        L.append(f"// {s}")
    for c in d.intro_citations:
        L.append(f"// {_cit_text(c)}")
    L.append("")
    for si, sec in enumerate(d.sections, 1):
        L.append(f"// {sec.ordinal}. {sec.title}")
        L.append(f"class Cls{si} {{")
        for s in sec.prose:
            L.append(f"    // {s}")
        for c in sec.citations:
            L.append(f"    // {_cit_text(c)}")
        for sj, sub in enumerate(sec.subs, 1):
            L.append(f"    // {sub.ordinal} {sub.title}")
            L.append(f"    public void meth{sj}() {{")
            for s in sub.prose:
                L.append(f"        // {s}")
            L.append("    }")
        L.append("}")
        L.append("")
    return "\n".join(L).rstrip() + "\n"


def render_go(d: DocPlan) -> str:
    L = [f"// {d.title}", f"// Author: {d.author}", f"// Issued: {d.issued}",
         "package corpusgen", ""]
    for m in d.imports:
        L.append(f'import "{m}"')
    L.append("")
    for s in d.intro_prose:
        L.append(f"// {s}")
    for c in d.intro_citations:
        L.append(f"// {_cit_text(c)}")
    L.append("")
    for si, sec in enumerate(d.sections, 1):
        L.append(f"// {sec.ordinal}. {sec.title}")
        L.append(f"func Fn{si}() {{")
        for s in sec.prose:
            L.append(f"    // {s}")
        for c in sec.citations:
            L.append(f"    // {_cit_text(c)}")
        L.append("}")
        L.append("")
    return "\n".join(L).rstrip() + "\n"


RENDERERS = {
    "markdown": render_markdown,
    "python": render_python,
    "java": render_java,
    "go": render_go,
}


# ---------------------------------------------------------------------------
# golden triples

def expected_doc_triples(d: DocPlan, content: str,
                         base=DEFAULT_BASE) -> list[dict]:
    """The canonical triples the pipeline must emit for one document
    (post entity-canonicalization, pre global dedup)."""
    du = doc_uri(d.repo, d.path, d.commit, base)
    sha = hashlib.sha256(content.encode()).hexdigest()
    emap = canonical_entity_map()
    alias_map = {r["alias"]: r["entity_uri"] for r in alias_rows()}
    t = [
        _ref(du, ns.RDF_TYPE, ns.BIBO_DOCUMENT),
        _lit(du, ns.DCTERMS_TITLE, d.title, lang="en"),
        _lit(du, ns.DCTERMS_IDENTIFIER, f"{d.repo}/{d.path}@{d.commit[:7]}"),
        _lit(du, ns.DCTERMS_LANGUAGE, d.lang),
        _lit(du, ns.DCTERMS + "creator", d.author),
        _lit(du, ns.DCTERMS_ISSUED, d.issued, datatype=ns.XSD_DATE),
        _ref(du, ns.PROV_WASGENERATEDBY, ENGINE_URI),
        _lit(du, ns.FR_CONTENT_SHA256, sha),
    ]
    for m in d.imports:
        t.append(_ref(du, ns.DCTERMS + "requires", module_uri(m, base)))
    for c in d.intro_citations:
        t.append(_ref(du, ns.DCTERMS_REFERENCES, ref_uri(c[0], c[1], c[2], base)))
    mentioned = set()
    for sp in d.intro_mentions:
        mentioned.add(emap[alias_map[sp]])

    def emit_section(sec: SectionPlan, parent_uri: str):
        fu = frag_uri(du, sec.ordinal)
        t.append(_ref(fu, ns.RDF_TYPE, ns.BIBO_DOCUMENTPART))
        t.append(_lit(fu, ns.DCTERMS_TITLE, sec.title))
        t.append(_lit(fu, ns.BIBO_CHAPTER, sec.ordinal))
        t.append(_ref(fu, ns.DCTERMS_ISPARTOF, parent_uri))
        for c in sec.citations:
            t.append(_ref(fu, ns.DCTERMS_REFERENCES,
                          ref_uri(c[0], c[1], c[2], base)))
        for sp in sec.mentions:
            mentioned.add(emap[alias_map[sp]])
        for sub in sec.subs:
            emit_section(sub, fu)

    for sec in d.sections:
        emit_section(sec, du)
    for ent in sorted(mentioned):
        t.append(_ref(du, ns.DCTERMS_SUBJECT, ent))
    return t


def expected_vocab_triples_canonical() -> list[dict]:
    emap = canonical_entity_map()
    seen = set()
    out = []
    for row in vocab_triple_rows():
        row = dict(row, subj=emap.get(row["subj"], row["subj"]))
        key = (row["subj"], row["pred"], row["obj_value"],
               row["obj_lang"], row["obj_datatype"])
        if key not in seen:
            seen.add(key)
            out.append(row)
    return out


# ---------------------------------------------------------------------------
# assembly

TRIPLE_FIELDS = ["subj", "pred", "obj_type", "obj_value", "obj_lang",
                 "obj_datatype"]


def _triples_table(rows: list[dict]) -> pa.Table:
    return pa.table({f: [r.get(f) for r in rows] for f in TRIPLE_FIELDS})


def generate(spec: CorpusSpec) -> dict:
    """Build the corpus. Returns dict of pyarrow Tables:
    ``sources``, ``expected_triples`` (canonical, deduped),
    ``aliases``, ``sameas``, ``vocab_triples`` (pre-canonical)."""
    files = file_list(spec)
    srows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    expected: list[dict] = []
    for repo, path, lang in files:
        d = plan_doc(spec, repo, path, lang, files)
        content = RENDERERS[lang](d)
        srows["repo"].append(repo)
        srows["path"].append(path)
        srows["commit"].append(d.commit)
        srows["lang"].append(lang)
        srows["content"].append(content)
        expected.extend(expected_doc_triples(d, content, spec.base))
    expected.extend(expected_vocab_triples_canonical())
    # global exact dedup, as the canonicalization stage performs
    seen = set()
    deduped = []
    for r in expected:
        key = tuple(r[f] for f in TRIPLE_FIELDS)
        if key not in seen:
            seen.add(key)
            deduped.append(r)
    ar = alias_rows()
    sr = sameas_rows()
    return {
        "sources": pa.table(srows),
        "expected_triples": _triples_table(deduped),
        "aliases": pa.table({k: [r[k] for r in ar]
                             for k in ("alias", "label", "entity_uri")}),
        "sameas": pa.table({k: [r[k] for r in sr] for k in ("subj", "obj")}),
        "vocab_triples": _triples_table(vocab_triple_rows()),
    }


def write_corpus(spec: CorpusSpec, out_dir: str) -> dict:
    """Write corpus tables as parquet under ``out_dir``; returns paths."""
    import os
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    tables = generate(spec)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths


def write_sources_ray(spec: CorpusSpec, out_dir: str,
                      num_blocks: int = 64) -> str:
    """Distributed sources-only corpus generation (bench scale): the
    file plan is broadcast; each Ray task renders its slice of files
    and writes parquet shards.  No golden triples (those are for the
    test-scale generator; the bench measures throughput)."""
    import os
    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    files = file_list(spec)
    files_ref = ray.put(files)
    seed = spec.seed

    class Renderer:
        def __init__(self, files_ref):
            self.files = ray.get(files_ref)

        def __call__(self, batch) -> "pa.Table":
            rows = {k: [] for k in ("repo", "path", "commit", "lang",
                                    "content")}
            for i in batch["id"].to_pylist():
                repo, path, lang = self.files[i]
                d = plan_doc(CorpusSpec(n_files=spec.n_files, seed=seed),
                             repo, path, lang, self.files)
                rows["repo"].append(repo)
                rows["path"].append(path)
                rows["commit"].append(d.commit)
                rows["lang"].append(lang)
                rows["content"].append(RENDERERS[lang](d))
            return pa.table(rows)

    (rd.range(len(files)).repartition(num_blocks)
     .map_batches(Renderer, fn_constructor_kwargs={"files_ref": files_ref},
                  batch_format="pyarrow", batch_size=2048,
                  concurrency=(1, 16))
     .write_parquet(out_dir))
    return out_dir
