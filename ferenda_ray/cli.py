"""Command-line entry point — the ``ferenda-build.py`` analogue.

The reference drives everything through ``ferenda-build.py <alias>
<action>`` (``manager.py`` run loop; actions ``download parse relate
generate toc news`` + ``all``, SURVEY.md §2.10).  Here each action is
a Dataset pipeline over a Parquet corpus:

    python -m ferenda_ray.cli corpus  OUT --files 1000   # ≈ download
    python -m ferenda_ray.cli build   CORPUS OUT          # parse+relate
    python -m ferenda_ray.cli fulltext CORPUS OUT         # index sink
    python -m ferenda_ray.cli render  TRIPLES_DIR OUT     # ≈ generate
    python -m ferenda_ray.cli toc     TRIPLES_DIR          # pagesets
    python -m ferenda_ray.cli status  OUT_DIR              # manifests

This module is the ONLY library path that may own a Ray session
(guarded ``ray.init``) — library code never initializes Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import os

    import ray
    if not ray.is_initialized():
        # honor the surrounding cluster: under `ray job submit` (the
        # north rule's launch mode) RAY_ADDRESS points at the running
        # cluster and the job must JOIN it, not boot a private local
        # instance; standalone runs fall back to a local cluster
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_corpus(args) -> int:
    from ferenda_ray.corpus import CorpusSpec, write_corpus, write_sources_ray
    if args.files > 10_000:
        _ray()
        write_sources_ray(CorpusSpec(n_files=args.files), args.out)
    else:
        write_corpus(CorpusSpec(n_files=args.files), args.out)
    print(json.dumps({"action": "corpus", "out": args.out,
                      "files": args.files}))
    return 0


def cmd_build(args) -> int:
    """parse + relate: extract → link → canonicalize → materialize."""
    import os
    import pyarrow.parquet as pq
    from ferenda_ray.pipelines.kg import run_kg
    _ray()

    def side(name):
        p = os.path.join(args.corpus, f"{name}.parquet")
        return pq.read_table(p) if os.path.exists(p) else None

    sources = args.sources
    if sources is None:
        # a write_corpus dir holds sources.parquet next to the side
        # tables; a write_sources_ray dir is all sources shards
        cand = os.path.join(args.corpus, "sources.parquet")
        sources = cand if os.path.exists(cand) else args.corpus

    m = run_kg(sources, args.out,
               aliases=side("aliases"), sameas=side("sameas"),
               vocab=side("vocab_triples"), num_buckets=args.buckets,
               resume=not args.force, fmt=args.format)
    rows = sum(m.column("rows").to_pylist()) if m.num_rows else 0
    print(json.dumps({"action": "build", "out": args.out,
                      "buckets_written": m.num_rows, "triples": rows}))
    return 0


def cmd_fulltext(args) -> int:
    from ferenda_ray.stages.fulltext import fulltext_rows, write_fulltext
    import ray.data as rd
    _ray()
    rows = fulltext_rows(rd.read_parquet(args.sources or args.corpus))
    write_fulltext(rows, args.out)
    print(json.dumps({"action": "fulltext", "out": args.out}))
    return 0


def cmd_render(args) -> int:
    from ferenda_ray.stages.render import render_stage
    import ray.data as rd
    _ray()
    out = render_stage(rd.read_parquet(args.triples))
    out.write_parquet(args.out)
    print(json.dumps({"action": "render", "out": args.out}))
    return 0


def cmd_generate(args) -> int:
    """The *generate* action: triples → XHTML+RDFa → HTML5 pages
    (render + presentation transform in one streamed pass)."""
    from ferenda_ray.stages.render import html5_stage, render_stage
    import ray.data as rd
    _ray()
    pages = html5_stage(render_stage(rd.read_parquet(args.triples)),
                        depth=args.depth)
    pages.write_parquet(args.out)
    print(json.dumps({"action": "generate", "out": args.out}))
    return 0


def cmd_feeds(args) -> int:
    """news/Atom action: event stream → paged Atom feed files."""
    from ferenda_ray.stages.feeds import write_atom_pages
    import ray.data as rd
    _ray()
    manifest = write_atom_pages(rd.read_parquet(args.events), args.out,
                                base_url=args.base_url,
                                page_size=args.page_size).take_all()
    print(json.dumps({"action": "feeds", "out": args.out,
                      "pages": len(manifest)}))
    return 0


def cmd_toc(args) -> int:
    from ferenda_ray.functions.facets import DEFAULT_FACETS
    from ferenda_ray.pipelines.derived import faceted_data, toc_pagesets
    import ray.data as rd
    _ray()
    faceted = faceted_data(rd.read_parquet(args.triples))
    pages = {}
    for facet in DEFAULT_FACETS:
        if facet.multiple_values:
            continue
        t = toc_pagesets(faceted, facet)
        pages[facet.binding] = t.num_rows
    print(json.dumps({"action": "toc", "pagesets": pages}))
    return 0


def cmd_status(args) -> int:
    """``get_status`` analogue: manifest-derived per-partition counts
    (``documentrepository.py:3695-3753``)."""
    from ferenda_ray.state import manifest as mf
    recs = mf.read_manifests(args.out)
    total = sum(r.get("rows", 0) for r in recs.values())
    print(json.dumps({"action": "status", "out": args.out,
                      "partitions_done": len(recs), "rows": total}))
    return 0


def cmd_statusreport(args) -> int:
    """``devel statusreport`` analogue (``devel.py:1427-1545``):
    aggregate document entries into per-action counts + durations;
    ``--html`` renders the servable page via the template engine."""
    from ferenda_ray.state.docstore import (DocumentStore,
                                            statusreport,
                                            statusreport_html)
    store = DocumentStore(args.datadir)
    report = statusreport(store)
    if args.html:
        report["html"] = statusreport_html(store)
    print(json.dumps(report, sort_keys=True))
    return 0


# config cascade defaults (overridable via ferenda.ini / FERENDA_* env
# / --key=value, manager.py:351 semantics)
CONFIG_DEFAULTS = {"buckets": 32, "format": "parquet",
                   "page_size": 100, "base_url": "https://example.org/"}


def load_config(argv=None):
    """Assemble the layered config: Defaults < ferenda.ini < env <
    argv (the ``ferenda-build.py`` cascade, ``manager.py:65,351``)."""
    import os

    from ferenda_ray.state.config import (
        Commandline, Defaults, Environment, INIFile, LayeredConfig)
    ini = None
    for a in list(argv or []):
        if a.startswith("--config="):
            ini = a.split("=", 1)[1]
        elif a == "--config":
            i = argv.index(a)
            ini = argv[i + 1] if i + 1 < len(argv) else None
    if ini is None and os.path.exists("ferenda.ini"):
        ini = "ferenda.ini"
    sources = [Defaults(CONFIG_DEFAULTS)]
    if ini:
        sources.append(INIFile(ini))
    sources.append(Environment())
    # normalise argparse-style "--key value" pairs to "--key=value" so
    # a bare "--buckets 4" doesn't read as the boolean flag "True"
    opts, toks = [], list(argv or [])
    i = 0
    while i < len(toks):
        a = toks[i]
        if a.startswith("--") and not a.startswith("--config"):
            if "=" not in a and i + 1 < len(toks) \
                    and not toks[i + 1].startswith("--"):
                opts.append(f"{a}={toks[i + 1]}")
                i += 1
            else:
                opts.append(a)
        i += 1
    sources.append(Commandline(opts))
    return LayeredConfig(*sources, cascade=True)


def main(argv=None) -> int:
    if argv is None:
        # real CLI entry: argparse would read sys.argv while
        # load_config saw nothing — keep the two in lockstep so
        # --config / --key=value cascade overrides work outside tests
        argv = sys.argv[1:]
    cfg = load_config(argv)
    ap = argparse.ArgumentParser(prog="ferenda_ray")
    ap.add_argument("--config", help="ferenda.ini-style config file")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("corpus", help="generate the synthetic corpus")
    p.add_argument("out")
    p.add_argument("--files", type=int, default=1000)
    p.set_defaults(fn=cmd_corpus)

    p = sub.add_parser("build", help="parse+relate: corpus -> KG shards")
    p.add_argument("corpus")
    p.add_argument("out")
    p.add_argument("--sources", help="sources parquet (default: corpus dir)")
    p.add_argument("--buckets", type=int,
                   default=int(cfg.buckets))
    p.add_argument("--format", default=str(cfg.format),
                   choices=["parquet", "nt", "both"])
    p.add_argument("--force", action="store_true",
                   help="ignore resume manifests")
    p.set_defaults(fn=cmd_build)

    p = sub.add_parser("fulltext", help="build the fulltext index")
    p.add_argument("corpus")
    p.add_argument("out")
    p.add_argument("--sources")
    p.set_defaults(fn=cmd_fulltext)

    p = sub.add_parser("render", help="triples -> XHTML+RDFa pages")
    p.add_argument("triples")
    p.add_argument("out")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("generate", help="triples -> HTML5 pages")
    p.add_argument("triples")
    p.add_argument("out")
    p.add_argument("--depth", type=int, default=0)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("feeds", help="events -> paged Atom feeds")
    p.add_argument("events")
    p.add_argument("out")
    p.add_argument("--base-url", default=str(cfg.base_url))
    p.add_argument("--page-size", type=int, default=int(cfg.page_size))
    p.set_defaults(fn=cmd_feeds)

    p = sub.add_parser("toc", help="TOC pagesets per facet")
    p.add_argument("triples")
    p.set_defaults(fn=cmd_toc)

    p = sub.add_parser("status", help="resume-manifest status report")
    p.add_argument("out")
    p.set_defaults(fn=cmd_status)

    p = sub.add_parser("statusreport",
                       help="per-action success/duration report from "
                            "document entries (devel statusreport)")
    p.add_argument("datadir")
    p.add_argument("--html", action="store_true",
                   help="also write status/status.html")
    p.set_defaults(fn=cmd_statusreport)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
