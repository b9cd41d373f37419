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
