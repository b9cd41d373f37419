"""CLI (ferenda-build analogue) + composite parse."""

import json
import os
import subprocess
import sys

import pytest

from ferenda_ray.recognizers import composite_parse, parse_markdown

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_composite_parse_first_success():
    md = "# Title\n\n## 1. Intro\n\nBody text here.\n"
    name, doc = composite_parse(md)
    assert name == "markdown"
    assert doc.title == "Title" and doc.sections


def test_composite_parse_order_and_fallback():
    py = 'import os\n\n\ndef f():\n    "doc"\n'
    name, doc = composite_parse(py)
    assert name == "python"
    # explicit strategy order: a strategy that raises is skipped
    def boom(content):
        from ferenda_ray.fsm import FSMStateError
        raise FSMStateError("nope")
    name, doc = composite_parse(py, [("boom", boom),
                                     ("py", __import__(
                                         "ferenda_ray.recognizers",
                                         fromlist=["x"]).parse_python)])
    assert name == "py"
    # nothing recognizes plain prose -> generic fallback
    name, doc = composite_parse("just one line",
                                [("md", parse_markdown)])
    assert name == "fallback"
    assert doc.title == "just one line"


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    """corpus -> build -> status -> resume in ONE subprocess-owned Ray
    session per invocation (the CLI owns its session; keep it to the
    cheap actions)."""
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "kg")
    env = dict(os.environ, RAY_NUM_CPUS="4")

    def run(*argv):
        r = subprocess.run([sys.executable, "-m", "ferenda_ray.cli",
                            *argv], capture_output=True, text=True,
                           cwd=REPO, env=env, timeout=240)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    assert run("corpus", corpus, "--files", "60")["files"] == 60
    built = run("build", corpus, out, "--buckets", "4")
    assert built["buckets_written"] == 4 and built["triples"] > 0
    status = run("status", out)
    assert status["partitions_done"] == 4
    assert status["rows"] == built["triples"]
    # resume: nothing to redo
    again = run("build", corpus, out, "--buckets", "4")
    assert again["buckets_written"] == 0
