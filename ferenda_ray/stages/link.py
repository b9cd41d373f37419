"""Stage 2 — entity linking as an actor pool.

The Ray-native restatement of the reference's expensive-state linker:
``LegalRef`` compiles an EBNF grammar whose alternation is *rebuilt*
from the known-law/abbreviation dictionaries
(``ferenda/sources/legal/se/legalref.py:94-186``, ``:258-284``), and
``DocumentRepository.lookup_resource`` resolves labels against a small
``commondata`` graph with a difflib fuzzy fallback at cutoff 0.8
(``documentrepository.py:500-548``).

Here the alias/label dictionary is broadcast once (``ray.put`` on the
driver), each actor fetches it in ``__init__`` and compiles one
longest-first regex alternation over all aliases (the analogue of the
``LawAbbreviation ::=`` grammar rebuild) — setup cost paid once per
actor, not per batch.  ``__call__`` processes Arrow batches: rows with
``obj_type == "mention"`` are scanned and replaced by
``dcterms:subject`` triples (doc → entity); all other rows pass through
untouched, keeping the pipeline single-pass and streaming.

Ambiguous aliases resolve to the lexicographically smallest candidate
entity URI — a deterministic rule (the reference raises on ambiguity;
we must stay row-parallel and deterministic instead).
"""

from __future__ import annotations

import difflib
import re

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ferenda_ray import ns
from ferenda_ray.schema import TRIPLES
from ferenda_ray.uri import DEFAULT_BASE


class EntityLinker:
    """Callable class for ``map_batches(..., concurrency=N)``.

    ``aliases`` may be a list of ``{alias, label, entity_uri}`` dicts, a
    ``pyarrow.Table`` of the same, or a ``ray.ObjectRef`` to either
    (the broadcast pattern: ``ray.put`` once, ``ray.get`` per actor).
    """

    def __init__(self, aliases, base: str = DEFAULT_BASE,
                 fuzzy_cutoff: float = 0.8):
        import ray
        if isinstance(aliases, ray.ObjectRef):
            aliases = ray.get(aliases)
        if isinstance(aliases, pa.Table):
            aliases = aliases.to_pylist()
        self.base = base
        self.fuzzy_cutoff = fuzzy_cutoff
        # alias (lowercased) -> sorted candidate entity URIs
        amap: dict[str, list] = {}
        for row in aliases:
            amap.setdefault(row["alias"].lower(), []).append(row["entity_uri"])
        self.alias_map = {a: sorted(set(us)) for a, us in amap.items()}
        # longest-first alternation so multi-word aliases win over
        # prefixes (leftmost-first alternation semantics are identical
        # in Python re and the rust regex polars uses)
        pats = sorted(self.alias_map, key=len, reverse=True)
        alt = r"\b(" + "|".join(re.escape(a) for a in pats) + r")\b"
        self.matcher = re.compile(alt, re.IGNORECASE) if pats else None
        self.pl_pattern = "(?i)" + alt if pats else None
        # ambiguity rule: lexicographically smallest candidate URI
        self.first_uri = {a: us[0] for a, us in self.alias_map.items()}
        self._fuzzy_cache: dict = {}

    # --- lookup_resource analogue (documentrepository.py:500-548) ---------

    def lookup_resource(self, label: str) -> str | None:
        """Exact alias hit, else difflib fuzzy at ``fuzzy_cutoff``."""
        key = label.lower().strip()
        if key in self.alias_map:
            return self.alias_map[key][0]
        if key in self._fuzzy_cache:
            return self._fuzzy_cache[key]
        close = difflib.get_close_matches(
            key, self.alias_map.keys(), n=1, cutoff=self.fuzzy_cutoff)
        hit = self.alias_map[close[0]][0] if close else None
        self._fuzzy_cache[key] = hit
        return hit

    def entities_in(self, text: str) -> list:
        if self.matcher is None:
            return []
        found = {m.group(1).lower() for m in self.matcher.finditer(text)}
        return sorted({self.alias_map[a][0] for a in found})

    # --- batch processing --------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        is_mention = pc.equal(batch.column("obj_type"), "mention")
        if not pc.any(is_mention).as_py():
            return batch
        passthrough = batch.filter(pc.invert(is_mention))
        mentions = batch.filter(is_mention)
        if self.pl_pattern is None:
            return passthrough.cast(TRIPLES)
        # vectorized scan: one rust-regex pass over the whole column,
        # explode hits, dedup per mention row, map alias → entity URI
        df = (pl.from_arrow(mentions.select(
                  ["subj", "obj_value", "graph", "src_repo", "src_path"]))
              .with_row_index("_i")
              .with_columns(pl.col("obj_value")
                            .str.extract_all(self.pl_pattern)
                            .alias("_hits"))
              .drop("obj_value")
              .explode("_hits")
              .drop_nulls("_hits")
              .with_columns(pl.col("_hits").str.to_lowercase()
                            .replace_strict(self.first_uri, default=None)
                            .alias("obj_value"))
              .unique(subset=["_i", "obj_value"])
              .sort(["_i", "obj_value"]))
        n = df.height
        linked = pa.table({
            "subj": df["subj"].to_arrow(),
            "pred": pa.array([ns.DCTERMS_SUBJECT] * n, pa.string()),
            "obj_type": pa.array(["uri"] * n, pa.string()),
            "obj_value": df["obj_value"].to_arrow(),
            "obj_lang": pa.nulls(n, pa.string()),
            "obj_datatype": pa.nulls(n, pa.string()),
            "graph": df["graph"].to_arrow(),
            "src_repo": df["src_repo"].to_arrow(),
            "src_path": df["src_path"].to_arrow(),
        }, schema=TRIPLES)
        return pa.concat_tables([passthrough.cast(TRIPLES), linked])


def link(triples, aliases, base: str = DEFAULT_BASE, concurrency=None,
         batch_size: int | None = None, num_cpus: float = 1.0,
         actor_threshold: int = 100_000):
    """Attach the entity linker to a triples/mentions Dataset.

    Two physical plans for the same stage, picked by dictionary size
    (mirroring ``rewrite``):

    * small dictionary (< ``actor_threshold`` aliases, or
      ``concurrency=None``): the ``EntityLinker`` instance — alias map
      + compiled matcher — is built once on the driver and pickled into
      the task closure; Ray caches the deserialized UDF per worker
      process, so tasks scale to every free CPU with zero pool ramp-up.
    * large dictionary (the 100 TB path — alias dict of GBs): actor
      pool; ``aliases`` is broadcast via ``ray.put`` so it ships to
      each actor once in ``__init__`` — never per batch (SURVEY.md
      §2.4) — and grammar compilation is paid once per actor.
    """
    import ray
    n_aliases = (aliases.num_rows if isinstance(aliases, pa.Table)
                 else len(aliases))
    if concurrency is None and n_aliases < actor_threshold:
        # batch_size deliberately None: an explicit batch_size on a
        # fusing stage makes Ray bundle that many rows per fused task
        # (8192 here collapsed the 400k-doc chain to 43 tasks — a 2-
        # wave schedule with a long straggler tail); per-block batches
        # keep one task per upstream block
        linker = EntityLinker(aliases, base=base)
        return triples.map_batches(linker, batch_format="pyarrow",
                                   batch_size=batch_size)
    alias_ref = ray.put(aliases)
    return triples.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"aliases": alias_ref, "base": base},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, 8),
        num_cpus=num_cpus,
    )


def ambiguity_report(aliases, base: str = DEFAULT_BASE) -> pa.Table:
    """Audit surface for the deterministic-ambiguity rule: one row per
    alias with >1 candidate URI — ``(alias, n_candidates,
    chosen_uri)``.  The linker silently resolves such aliases to the
    lexicographically smallest candidate (``EntityLinker.first_uri``);
    the reference instead *raises* on ambiguity
    (``documentrepository.py:500-548`` via ``lookup_resource``), so
    this report is how an operator finds the aliases where the two
    behaviours diverge."""
    linker = EntityLinker(aliases, base=base)
    rows = [(a, len(us), us[0])
            for a, us in sorted(linker.alias_map.items())
            if len(us) > 1]
    return pa.table({
        "alias": pa.array([r[0] for r in rows], pa.string()),
        "n_candidates": pa.array([r[1] for r in rows], pa.int64()),
        "chosen_uri": pa.array([r[2] for r in rows], pa.string())})
