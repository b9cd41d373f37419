"""Log-derived build dashboards — the ``devel`` log-analysis surface.

The reference ships three driver-side log scrapers (``ferenda/devel.py``):
``analyze_buildstats`` (:597-636) counting per-action OK lines,
``analyze_errors`` (:549-585) ranking error modules/locations, and
``analyze_timestats`` (:638-656) extracting per-(stage, repo) elapsed
seconds for the timing dashboard.  All three stream a logfile line by
line through Python regexes on one process.

Ray-Data-first restatement: logs are a Dataset of lines
(``read_text`` — at fleet scale one log shard per node), every
extraction is a VECTORIZED polars regex per batch, and the rollups
are small ``groupby`` aggregates.  The render helpers reproduce the
reference's text-block output shapes from the aggregated (small)
results.

Line format accepted: ``<timestamp> <module> <LEVEL> <message>``
(devel.py:559-561 split discipline — unparseable lines are skipped,
not errors).

Divergence note: the reference colors timing bars with the salted
``hash(repo)`` (devel.py:653) which changes across processes; this
module uses md5 so colors are deterministic.
"""

from __future__ import annotations

import hashlib

import polars as pl
import pyarrow as pa

ACTIONS = ("download", "parse", "relate", "generate", "transformlinks")
# devel.py:615-620 sort order
_SORTKEY = {a: i - len(ACTIONS) for i, a in enumerate(ACTIONS)}

_LINE_RE = r"^(?P<ts>\S+) (?P<module>\S+) (?P<level>\S+) (?P<message>.*)$"
_OK_RE = (r"^[^ ]+:? (download|parse|relate|generate|transformlinks) OK")
_LOC_RE = r"( \([\w/]+\.py:\d+\))"
_FINISHED_RE = (r"(?P<repo>\w+) (?P<stage>\w+) finished in "
                r"(?P<elapsed>\d+\.\d+) sec")


def read_logs(paths):
    """Log file(s)/dir → Dataset of ``{"text": line}`` rows."""
    import ray.data as rd
    return rd.read_text(paths)


def _split(batch: pa.Table) -> pl.DataFrame:
    """Vectorized ``timestamp module level message`` split; lines that
    don't parse are dropped (devel.py:559-562 try/except)."""
    df = pl.from_arrow(batch)
    return (df.with_columns(
        pl.col("text").str.extract_groups(_LINE_RE).alias("g"))
        .unnest("g")
        .filter(pl.col("message").is_not_null()))


def buildstats(lines):
    """``analyze_buildstats`` (devel.py:597-636): per (action, module)
    count of successful processing events.  Returns a small Dataset
    ``(action, module, n)``."""
    from ray.data.aggregate import Count

    def extract(b: pa.Table) -> pa.Table:
        df = _split(b)
        df = (df.with_columns(
            # strip the trailing " (file.py:123)" location first
            # (devel.py:604-608), then match the OK event
            pl.col("message").str.replace(_LOC_RE, "")
            .str.extract(_OK_RE, 1).alias("action"))
            .filter(pl.col("action").is_not_null())
            .select(["action", "module"]))
        return df.to_arrow().cast(pa.schema(
            [("action", pa.string()), ("module", pa.string())]))

    return (lines.map_batches(extract, batch_format="pyarrow")
            .groupby(["action", "module"])
            .aggregate(Count(alias_name="n")))


def format_buildstats(rows) -> str:
    """The reference's text block (devel.py:621-634)::

        download: 666 (prop: 42, sfs: 421, soukb: 12)
        parse:    555 (...)
    """
    rows = rows.take_all() if hasattr(rows, "take_all") else rows
    by_action: dict[str, dict[str, int]] = {}
    for r in rows:
        by_action.setdefault(r["action"], {})[r["module"]] = r["n"]
    actions = sorted(by_action, key=lambda a: _SORTKEY.get(a, 0))
    if not actions:
        return "[no successful processing actions found]\n"
    width = max(len(a) for a in actions)
    out = []
    for action in actions:
        mods = by_action[action]
        modcounts = ", ".join(f"{k}: {v}" for k, v in sorted(mods.items()))
        out.append(f"{action:<{width}}: {sum(mods.values())}"
                   f" ({modcounts})")
    return "\n".join(out) + "\n"


def errorstats(lines):
    """``analyze_errors`` (devel.py:549-585): ERROR lines → per-module
    counts and per-source-location counts with a representative (min)
    message.  Returns ``(modules, locations)`` small Datasets:
    ``(module, n)`` and ``(location, n, message)``."""
    from ray.data.aggregate import Count, Min

    def extract(b: pa.Table) -> pa.Table:
        df = _split(b).filter(pl.col("level") == "ERROR")
        df = df.with_columns(
            # root-module errors attribute to the message head
            # (devel.py:563-565)
            pl.when(pl.col("module") == "root")
            .then(pl.col("message").str.extract(r"^(\S+)", 1))
            .otherwise(pl.col("module")).alias("module"),
            pl.col("message").str.extract(r"(\([\w/]+\.py:\d+\))", 1)
            .alias("location"),
            pl.col("message").str.strip_chars().alias("message"),
        ).select(["module", "location", "message"])
        return df.to_arrow().cast(pa.schema(
            [("module", pa.string()), ("location", pa.string()),
             ("message", pa.string())]))

    errs = lines.map_batches(extract, batch_format="pyarrow")
    modules = (errs.groupby("module").aggregate(Count(alias_name="n")))
    def has_loc(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.is_valid(b.column("location")))

    locations = (errs.map_batches(has_loc, batch_format="pyarrow")
                 .groupby("location")
                 .aggregate(Count(alias_name="n"),
                            Min("message", alias_name="message")))
    return modules, locations


def timestats(lines, min_elapsed: float = 3.0):
    """``analyze_timestats`` (devel.py:638-656): per (stage, repo) max
    elapsed seconds from ``<repo> <stage> finished in N.N sec`` lines,
    with the dashboard's derived bar width (elapsed/3 px) and a
    DETERMINISTIC color (md5, not the reference's salted hash).
    Returns a small Dataset ``(stage, repo, elapsed, width, color)``."""
    from ray.data.aggregate import Max

    def extract(b: pa.Table) -> pa.Table:
        df = (_split(b)
              .with_columns(pl.col("message")
                            .str.extract_groups(_FINISHED_RE).alias("g"))
              .unnest("g")
              .filter(pl.col("elapsed").is_not_null())
              .with_columns(pl.col("elapsed").cast(pl.Float64))
              .filter(pl.col("elapsed") > min_elapsed)
              .select(["stage", "repo", "elapsed"]))
        return df.to_arrow().cast(pa.schema(
            [("stage", pa.string()), ("repo", pa.string()),
             ("elapsed", pa.float64())]))

    agg = (lines.map_batches(extract, batch_format="pyarrow")
           .groupby(["stage", "repo"])
           .aggregate(Max("elapsed", alias_name="elapsed")))

    def derive(b: pa.Table) -> pa.Table:
        elapsed = b.column("elapsed").to_pylist()
        repos = b.column("repo").to_pylist()
        width = pa.array([int(e / 3) for e in elapsed], pa.int64())
        color = pa.array(
            [format((int(hashlib.md5(r.encode()).hexdigest()[:8], 16)
                     % 256 ** 3) | 0x808080, "06x") for r in repos],
            pa.string())
        return (b.append_column("width", width)
                .append_column("color", color))

    return agg.map_batches(derive, batch_format="pyarrow")
