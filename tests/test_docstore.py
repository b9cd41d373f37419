"""DocumentStore path algebra + version archiving
(documentstore.py:287-376, 622-735, 787-826 semantics)."""

import os

import pytest

from ferenda_ray.state.docstore import (
    ArchivingError, AttachmentPolicyError, DocumentStore,
    basefile_to_pathfrag, pathfrag_to_basefile)


def test_pathfrag_roundtrip():
    assert basefile_to_pathfrag("1998:204") == "1998%3A204"
    assert basefile_to_pathfrag("123/a") == "123/a"
    for b in ("1998:204", "123/a", "a b/c%d"):
        assert pathfrag_to_basefile(basefile_to_pathfrag(b)) == b


def test_path_algebra(tmp_path):
    d = DocumentStore(str(tmp_path))
    assert d.path("123/a", "parsed", ".xhtml") \
        == str(tmp_path / "parsed/123/a.xhtml")
    assert d.path("123/a", "downloaded", ".html", version="r4711") \
        == str(tmp_path / "archive/downloaded/123/a/.versions/r4711.html")
    d.storage_policy = "dir"
    assert d.path("123/a", "parsed", ".xhtml") \
        == str(tmp_path / "parsed/123/a/index.xhtml")
    assert d.path("123/a", "downloaded", None, "r1", "appendix.txt") \
        == str(tmp_path /
               "archive/downloaded/123/a/.versions/r1/appendix.txt")
    with pytest.raises(AttachmentPolicyError):
        DocumentStore(str(tmp_path)).path("x", "parsed", ".x",
                                          attachment="a.txt")


def test_archive_and_list_versions(tmp_path):
    d = DocumentStore(str(tmp_path))
    for version in ("r1", "r2"):
        with d.open("123/a", "downloaded", ".html", "w") as f:
            f.write(f"content {version}")
        with d.open("123/a", "parsed", ".xhtml", "w") as f:
            f.write(f"<x>{version}</x>")
        d.archive("123/a", version)
    # current files moved away
    assert not os.path.exists(d.downloaded_path("123/a"))
    # both versions listed, in order, once each
    assert list(d.list_versions("123/a")) == ["r1", "r2"]
    assert list(d.list_versions("123/a", "downloaded")) == ["r1", "r2"]
    with open(d.downloaded_path("123/a", version="r1")) as f:
        assert f.read() == "content r1"
    # collision refused unless overwrite
    with d.open("123/a", "downloaded", ".html", "w") as f:
        f.write("content r2 again")
    with pytest.raises(ArchivingError):
        d.archive("123/a", "r2")
    d.archive("123/a", "r2", overwrite=True)
    with open(d.downloaded_path("123/a", version="r2")) as f:
        assert f.read() == "content r2 again"


def test_attachments(tmp_path):
    d = DocumentStore(str(tmp_path), storage_policy="dir")
    with d.open("123/a", "downloaded", ".html", "w") as f:
        f.write("main")
    with d.open("123/a", "downloaded", None, "w",
                attachment="appendix.txt") as f:
        f.write("extra")
    assert list(d.list_attachments("123/a", "downloaded")) \
        == ["appendix.txt"]
    d.archive("123/a", "v1")
    assert list(d.list_attachments("123/a", "downloaded", "v1")) \
        == ["appendix.txt"]


def test_durations_ordering(tmp_path):
    from ferenda_ray.state.docstore import (
        DocumentStore, ordered_by_duration, record_durations)
    store = DocumentStore(str(tmp_path))
    record_durations(store, "parse", {"b": 2.0, "c": 9.0})
    record_durations(store, "parse", {"a": 5.0})  # merges
    out = ordered_by_duration(store, "parse", ["a", "b", "c", "d", "e"])
    assert out == ["c", "a", "b", "d", "e"]  # longest-first, rest stable
    # unknown action: original order
    assert ordered_by_duration(store, "relate", ["x", "y"]) == ["x", "y"]


def test_mkpatch_roundtrip(tmp_path):
    from ferenda_ray.stages.render import apply_patch
    from ferenda_ray.state.docstore import (
        DocumentStore, load_patch, make_patch, store_patch)
    store = DocumentStore(str(tmp_path))
    original = "line one\nsensitive ssn 123\nline three\n"
    edited = "line one\n[redacted]\nline three\n"
    patch = make_patch(original, edited)
    ppath, dpath = store_patch(store, "123/a", patch,
                               "Removed sensitive personal information")
    loaded, desc = load_patch(store, "123/a")
    assert desc == "Removed sensitive personal information"
    # the stored patch round-trips through the engine's patch stage
    assert apply_patch(original, loaded) == edited
    assert load_patch(store, "nope/x") == (None, None)


def test_statusreport_aggregation(tmp_path):
    from ferenda_ray.state.docstore import (DocumentStore,
                                            ordered_by_duration,
                                            statusreport,
                                            statusreport_html,
                                            write_entry_status)
    store = DocumentStore(str(tmp_path))
    write_entry_status(store, "a/1", "parse", True, 2.5, "2026-01-01")
    write_entry_status(store, "a/1", "relate", True, 0.5, "2026-01-01")
    write_entry_status(store, "a/2", "parse", False, 9.0, "2026-01-01",
                       error="boom")
    write_entry_status(store, "a/3", "parse", "removed", 0.0,
                       "2026-01-01")
    write_entry_status(store, "a/4", "parse", True, 1.0, "2026-01-01",
                       warnings="odd")
    rep = statusreport(store)
    p = rep["actions"]["parse"]
    assert (p["processed"], p["ok"], p["failed"], p["removed"],
            p["warnings"]) == (4, 2, 1, 1, 1)
    assert p["total_duration"] == 12.5
    assert p["slowest"][:2] == ["a/2", "a/1"]
    assert rep["actions"]["relate"]["processed"] == 1
    # durations feed longest-job-first scheduling
    assert ordered_by_duration(store, "parse",
                               ["a/1", "a/2", "a/4", "a/9"]) == \
        ["a/2", "a/1", "a/4", "a/9"]
    # the HTML report goes through the pluggable template engine
    out = statusreport_html(store)
    html = open(out).read()
    assert "4 processed, 2 ok" in html and "(1 w/ warnings)" in html


def test_statusreport_cli(tmp_path, capsys):
    import json as _json
    from ferenda_ray.cli import main
    from ferenda_ray.state.docstore import (DocumentStore,
                                            write_entry_status)
    store = DocumentStore(str(tmp_path))
    write_entry_status(store, "x", "parse", True, 1.0, "2026-01-01")
    assert main(["statusreport", str(tmp_path), "--html"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["actions"]["parse"]["ok"] == 1
    assert rep["html"].endswith("status/status.html")
