"""Per-partition lineage manifests + checkpoint-resume.

The dataset-native analogue of the reference's ``DocumentEntry``
watermarks and ``needed()`` mtime gates
(``ferenda/documententry.py:27-140``; ``ferenda/documentstore.py:400-470``):
every completed output partition writes one small JSON manifest
recording the shard file, row count and a digest; a rerun anti-joins
its input partitions against the manifest set and skips finished work
(SURVEY.md §4 "checkpoint/resume").

Writes are atomic: data file → ``.tmp`` then ``os.replace``; the
manifest is written only after the data file is in place, so a crash
never leaves a manifest without its shard (the two-phase-commit shape
of ferenda's bulk relate, ``documentrepository.py:1941-1952``).
"""

from __future__ import annotations

import json
import os


MANIFEST_DIR = "_manifest"


def manifest_path(out_dir: str, partition: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{partition}.json")


def write_manifest(out_dir: str, partition: str, record: dict) -> None:
    d = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{partition}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(record, f, sort_keys=True)
    os.replace(tmp, os.path.join(d, f"{partition}.json"))


def read_manifests(out_dir: str) -> dict:
    """partition -> manifest record (empty when nothing finished)."""
    d = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in os.listdir(d):
        if name.endswith(".json") and not name.startswith("."):
            with open(os.path.join(d, name)) as f:
                out[name[:-5]] = json.load(f)
    return out


def done_partitions(out_dir: str) -> set:
    return set(read_manifests(out_dir))


def bucket_layout_probe() -> dict:
    """Fingerprint of the bucket-assignment function.

    Resume correctness depends on ``polars`` 64-bit ``hash(seed=0)``
    being identical between the original run and the resume; polars
    does not guarantee hash stability across versions.  We record the
    polars version AND an actual hash-probe value (hash of a fixed
    sentinel) so a resume under a changed hash function is refused
    instead of silently mixing two bucket layouts (ADVICE r1)."""
    import polars as pl
    probe = int(pl.Series("s", ["ferenda-ray-bucket-probe"])
                .hash(seed=0)[0])
    return {"polars_version": pl.__version__, "hash_probe": probe}


def check_bucket_layout(out_dir: str, layout: dict) -> None:
    """Write ``_layout.json`` on first run; on resume, refuse if the
    recorded layout (hash probe / polars version / bucket count)
    differs from the current one."""
    path = os.path.join(out_dir, "_layout.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != layout:
            raise RuntimeError(
                f"refusing to resume into {out_dir}: bucket layout "
                f"changed ({prev} -> {layout}); wipe the output dir or "
                "pin the original polars version/bucket count")
        return
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(layout, f, sort_keys=True)
    os.replace(tmp, path)


def atomic_write(path: str, write_fn) -> None:
    """write_fn(tmp_path); then atomic rename to ``path``."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    write_fn(tmp)
    os.replace(tmp, path)
