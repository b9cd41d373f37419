"""Per-document artifact store with version archiving.

Re-implements the filesystem contract of the reference's
``DocumentStore`` (``ferenda/documentstore.py:287-376`` path algebra,
``:622-735`` version/attachment listing, ``:787-826`` archive move):
``{datadir}/{maindir}/{pathfrag}{suffix}`` for the current artifact,
``{datadir}/archive/{maindir}/{pathfrag}/.versions/{version}{suffix}``
for archived versions, percent-escaped path fragments, ``dir`` storage
policy with ``index{suffix}`` + attachments.

Scale note: in the Ray engine the BULK artifacts (triples, index rows,
rendered pages) live in partitioned parquet with per-partition
manifests (``state/manifest.py``) — this store covers the per-document
side channel (archived downloads, attachments) on a shared filesystem,
one directory tree per repo, no global state.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import quote, unquote


class ArchivingError(Exception):
    pass


class AttachmentNameError(Exception):
    pass


class AttachmentPolicyError(Exception):
    pass


_UNSAFE = ':%* <>"?'


def basefile_to_pathfrag(basefile: str) -> str:
    """Percent-escape characters unsafe in filenames; ``/`` stays a
    directory separator (``documentstore.py:737-760``)."""
    return "/".join(quote(seg, safe="") for seg in basefile.split("/"))


def pathfrag_to_basefile(pathfrag: str) -> str:
    return "/".join(unquote(seg) for seg in pathfrag.split("/"))


class DocumentStore:
    MAINDIRS = ("downloaded", "intermediate", "parsed", "distilled",
                "generated", "entries")

    def __init__(self, datadir: str, storage_policy: str = "file"):
        self.datadir = datadir
        self.storage_policy = storage_policy

    # -- path algebra ------------------------------------------------------

    def path(self, basefile: str, maindir: str, suffix: str | None,
             version: str | None = None,
             attachment: str | None = None) -> str:
        frag = basefile_to_pathfrag(basefile)
        if version:
            vfrag = basefile_to_pathfrag(version)
            segments = [self.datadir, "archive", maindir, frag,
                        ".versions", vfrag]
        else:
            segments = [self.datadir, maindir, frag]
        if self.storage_policy == "dir":
            if attachment:
                for illegal in ":/":
                    if illegal in attachment:
                        raise AttachmentNameError(
                            f"Char {illegal!r} in attachment name "
                            f"{attachment!r} not allowed")
                segments.append(attachment)
            else:
                segments.append("index" + (suffix or ""))
        else:
            if attachment is not None:
                raise AttachmentPolicyError(
                    "attachments require storage_policy='dir'")
            segments[-1] += suffix or ""
        return os.path.join(*segments)

    def downloaded_path(self, basefile, version=None):
        return self.path(basefile, "downloaded", ".html", version)

    def parsed_path(self, basefile, version=None):
        return self.path(basefile, "parsed", ".xhtml", version)

    def distilled_path(self, basefile, version=None):
        return self.path(basefile, "distilled", ".ttl", version)

    def generated_path(self, basefile, version=None):
        return self.path(basefile, "generated", ".html", version)

    def open(self, basefile, maindir, suffix, mode="r", version=None,
             attachment=None):
        p = self.path(basefile, maindir, suffix, version, attachment)
        if "w" in mode or "a" in mode:
            os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, mode)

    # -- archiving (documentstore.py:787-826) ------------------------------

    def archive(self, basefile: str, version: str,
                overwrite: bool = False, copy: bool = False) -> list:
        """Move (or copy) every current artifact of ``basefile`` into
        the archive tree under ``version``.  Returns archived paths."""
        moved = []
        for meth in (self.downloaded_path, self.parsed_path,
                     self.distilled_path, self.generated_path):
            src = meth(basefile)
            dest = meth(basefile, version)
            if self.storage_policy == "dir":
                src, dest = os.path.dirname(src), os.path.dirname(dest)
            if not os.path.exists(src):
                continue
            if os.path.exists(dest):
                if overwrite:
                    (shutil.rmtree if os.path.isdir(dest)
                     else os.remove)(dest)
                else:
                    raise ArchivingError(
                        f"archive destination {dest} for {basefile} "
                        f"version {version} already exists")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            (shutil.copy2 if copy and not os.path.isdir(src)
             else shutil.move)(src, dest)
            moved.append(dest)
        return moved

    # -- listing (documentstore.py:622-735) --------------------------------

    def list_versions(self, basefile: str, action: str | None = None):
        """All archived version ids for ``basefile`` (each yielded
        once, across the given action or all of them)."""
        actions = ((action,) if action
                   else ("downloaded", "parsed", "generated"))
        frag = basefile_to_pathfrag(basefile)
        seen = []
        for act in actions:
            d = os.path.join(self.datadir, "archive", act, frag,
                             ".versions")
            if not os.path.isdir(d):
                continue
            for root, dirs, files in os.walk(d):
                dirs.sort()
                for name in sorted(files):
                    rel = os.path.relpath(os.path.join(root, name), d)
                    vfrag = os.path.splitext(rel)[0]
                    if self.storage_policy == "dir":
                        vfrag = os.path.dirname(rel)
                    v = pathfrag_to_basefile(vfrag)
                    if v and v not in seen:
                        seen.append(v)
                        yield v

    def list_attachments(self, basefile: str, action: str,
                         version: str | None = None):
        if self.storage_policy != "dir":
            raise AttachmentPolicyError(
                "can't list attachments if storage_policy != 'dir'")
        frag = basefile_to_pathfrag(basefile)
        if version:
            d = os.path.join(self.datadir, "archive", action, frag,
                             ".versions", basefile_to_pathfrag(version))
        else:
            d = os.path.join(self.datadir, action, frag)
        if not os.path.isdir(d):
            return
        for name in sorted(os.listdir(d)):
            if not name.startswith("index") and not name.startswith("."):
                yield name


# ---------------------------------------------------------------------------
# duration-based scheduling + patch authoring (devel-tool surface)

def record_durations(store: DocumentStore, action: str,
                     durations: dict) -> str:
    """Merge per-basefile durations for ``action`` into
    ``entries/.durations.json`` (the ``devel statusreport`` artifact,
    ``ferenda/documentstore.py:542-547``)."""
    import json
    p = store.path(".durations", "entries", ".json")
    data: dict = {}
    if os.path.exists(p):
        try:
            with open(p) as fp:
                data = json.load(fp)
        except ValueError:
            data = {}
    data.setdefault(action, {}).update(
        {k: float(v) for k, v in durations.items()})
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fp:
        json.dump(data, fp, sort_keys=True)
    return p


def ordered_by_duration(store: DocumentStore, action: str,
                        basefiles) -> list:
    """Longest-job-first ordering: basefiles with a recorded duration
    for ``action`` first (descending), then the rest in given order —
    the parallel-throughput heuristic of
    ``documentstore.list_basefiles_for`` (``documentstore.py:542-562``)."""
    import json
    p = store.path(".durations", "entries", ".json")
    durations: dict = {}
    if os.path.exists(p):
        try:
            with open(p) as fp:
                durations = json.load(fp).get(action, {})
        except ValueError:
            durations = {}
    basefiles = list(basefiles)
    known = [b for b in basefiles if b in durations]
    known.sort(key=lambda b: durations[b], reverse=True)
    rest = [b for b in basefiles if b not in durations]
    return known + rest


def make_patch(original: str, edited: str, description: str = "",
               fromfile: str = "original", tofile: str = "edited") -> str:
    """Unified diff from ``original`` to hand-edited ``edited`` — the
    ``devel mkpatch`` flow (``ferenda/devel.py:919-1010``): the output
    round-trips through ``stages/render.apply_patch``.  The
    description travels separately (the reference's sidecar ``.desc``
    file, ``documentrepository.py:1375``)."""
    import difflib
    lines = difflib.unified_diff(
        original.split("\n"), edited.split("\n"),
        fromfile=fromfile, tofile=tofile, lineterm="")
    return "\n".join(lines)


def store_patch(store: DocumentStore, basefile: str, patch: str,
                description: str = "") -> tuple:
    """Write the patch + sidecar description where
    ``patch_if_needed`` will find them (``patches/`` maindir)."""
    ppath = os.path.join(store.datadir, "patches",
                         basefile_to_pathfrag(basefile) + ".patch")
    os.makedirs(os.path.dirname(ppath), exist_ok=True)
    with open(ppath, "w") as fp:
        fp.write(patch)
    dpath = ppath[:-6] + ".desc"
    if description:
        with open(dpath, "w") as fp:
            fp.write(description)
    return ppath, (dpath if description else None)


def load_patch(store: DocumentStore, basefile: str) -> tuple:
    """Return ``(patch_text, description)`` or ``(None, None)``."""
    ppath = os.path.join(store.datadir, "patches",
                         basefile_to_pathfrag(basefile) + ".patch")
    if not os.path.exists(ppath):
        return None, None
    desc = None
    dpath = ppath[:-6] + ".desc"
    if os.path.exists(dpath):
        desc = open(dpath).read()
    return open(ppath).read(), desc


# --- document entries + status report (devel-tool surface) ----------------

def write_entry_status(store: DocumentStore, basefile: str,
                       action: str, success, duration: float,
                       date: str, **extra) -> str:
    """Record one action's outcome in the per-document entry file
    (``entries/{basefile}.json`` — the ``DocumentEntry.status``
    sub-dict shape of ``ferenda/documententry.py`` that
    ``devel statusreport`` consumes, ``devel.py:1480-1520``)."""
    import json
    p = store.path(basefile, "entries", ".json")
    data: dict = {"basefile": basefile, "status": {}}
    if os.path.exists(p):
        try:
            with open(p) as fp:
                data = json.load(fp)
        except ValueError:
            pass
    st = {"success": success, "duration": float(duration),
          "date": date}
    st.update({k: v for k, v in extra.items() if v is not None})
    data.setdefault("status", {})[action] = st
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fp:
        json.dump(data, fp, sort_keys=True)
    return p


def statusreport(store: DocumentStore, actions=None) -> dict:
    """Aggregate every document entry into the ``devel statusreport``
    summary (``devel.py:1427-1545``): per action — processed / ok /
    with-warnings / failed / removed counts, total+max duration and
    the slowest basefiles — and merge the measured durations into
    ``entries/.durations.json`` (feeding longest-job-first
    scheduling, :func:`ordered_by_duration`)."""
    import glob as _glob
    import json
    root = os.path.join(store.datadir, "entries")
    per_action: dict = {}
    corrupt = 0
    for p in sorted(_glob.glob(os.path.join(root, "**", "*.json"),
                               recursive=True)):
        if os.path.basename(p) == ".durations.json":
            continue
        try:
            with open(p) as fp:
                data = json.load(fp)
        except ValueError:
            corrupt += 1
            continue
        basefile = data.get("basefile") or pathfrag_to_basefile(
            os.path.relpath(p, root)[:-len(".json")])
        for action, st in (data.get("status") or {}).items():
            if actions and action not in actions:
                continue
            a = per_action.setdefault(action, {
                "processed": 0, "ok": 0, "warnings": 0, "failed": 0,
                "removed": 0, "durations": {}})
            a["processed"] += 1
            if st.get("success") == "removed":
                a["removed"] += 1
                a["durations"][basefile] = -1
                continue
            a["durations"][basefile] = float(st.get("duration", 0))
            if st.get("success"):
                a["ok"] += 1
            else:
                a["failed"] += 1
            if "warnings" in st:
                a["warnings"] += 1
    report = {"actions": {}, "corrupt_entries": corrupt}
    for action, a in sorted(per_action.items()):
        record_durations(store, action, a["durations"])
        real = {b: d for b, d in a["durations"].items() if d >= 0}
        slowest = sorted(real, key=real.get, reverse=True)[:5]
        report["actions"][action] = {
            "processed": a["processed"], "ok": a["ok"],
            "warnings": a["warnings"], "failed": a["failed"],
            "removed": a["removed"],
            "total_duration": round(sum(real.values()), 3),
            "max_duration": round(max(real.values(), default=0.0), 3),
            "slowest": slowest,
        }
    return report


#: the statusreport HTML template (the engine-side analogue of the
#: reference's res/xsl/statusreport.xsl), rendered via the pluggable
#: Jinja transformer
STATUS_TEMPLATE = """<!DOCTYPE html>
<html><head><title>{{ title }}</title></head><body>
<h1>{{ title }}</h1>
{% for action, a in report.actions.items() %}
<section id="{{ action }}">
<h2>{{ action }}</h2>
<p>{{ a.processed }} processed, {{ a.ok }} ok
 ({{ a.warnings }} w/ warnings), {{ a.failed }} failed,
 {{ a.removed }} removed.</p>
<p>total {{ a.total_duration }}s, max {{ a.max_duration }}s;
 slowest: {{ a.slowest | join(', ') }}</p>
</section>
{% endfor %}
<p>{{ report.corrupt_entries }} corrupted entries.</p>
</body></html>
"""


def statusreport_html(store: DocumentStore,
                      title: str = "status") -> str:
    """``devel statusreport``'s final step: the aggregated report as
    a servable HTML page, through the pluggable template engine
    (``devel.py:1529-1541`` uses the XSLT transformer the same way).
    Returns the output path (``status/status.html``)."""
    from ferenda_ray.stages.transformer import JinjaTransform
    report = statusreport(store)
    t = JinjaTransform("status.html",
                       {"status.html": STATUS_TEMPLATE})
    html = t._template.render(title=title, report=report)
    out = os.path.join(store.datadir, "status", "status.html")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fp:
        fp.write(html)
    return out
