"""Pluggable template-driven transform (reference
ferenda/transformer.py:25-100,196-330) — engine registry, Jinja
templates, depth/assetroot, uritransform post-pass, per-repo stage."""

import pyarrow as pa
import pytest

from ferenda_ray.stages.render import render_xhtml
from ferenda_ray.stages.transformer import (Html5Transform,
                                            JinjaTransform,
                                            TransformError,
                                            Transformer,
                                            transform_stage)

DOC = "https://example.org/res/r/f.py@c"
TRIPLES = [
    (DOC, "http://purl.org/dc/terms/title", "literal", "My Title",
     "en", None),
    (DOC + "#S1", "http://purl.org/dc/terms/isPartOf", "uri", DOC,
     None, None),
]
XHTML = render_xhtml(DOC, TRIPLES)

TEMPLATES = {
    "site.html": ("<html><head><title>{{ title }}</title>"
                  '<link href="{{ assetroot }}css/m.css"/>'
                  "</head><body>{% include 'nav.html' %}"
                  "<main data-uri=\"{{ doc_uri }}\">{{ content }}"
                  "</main>{{ footer | default('') }}</body></html>"),
    "nav.html": "<nav>{{ sitename | default('site') }}</nav>",
}


def test_jinja_engine_renders_context():
    t = Transformer("JINJA", "site.html", TEMPLATES)
    out = t.transform(XHTML, depth=2,
                      parameters={"sitename": "lagen.nu",
                                  "footer": "<footer/>"})
    assert "<title>My Title</title>" in out
    assert '<link href="../../css/m.css"/>' in out      # depth -> ../
    assert "<nav>lagen.nu</nav>" in out                 # include
    assert f'data-uri="{DOC}"' in out
    assert "about=" in out                              # content embedded
    assert out.endswith("<footer/></body></html>")


def test_html5_default_engine_matches_fixed_pass():
    from ferenda_ray.stages.render import xhtml_to_html5
    assert Transformer("HTML5").transform(XHTML, depth=1) \
        == xhtml_to_html5(XHTML, depth=1)


def test_uritransform_post_pass():
    t = Transformer("JINJA", "site.html", TEMPLATES)
    out = t.transform(XHTML, parameters={},
                      uritransform=lambda u: u.replace(
                          "example.org", "localhost"))
    assert 'href="https://localhost/' in out or "localhost" in out


def test_errors():
    with pytest.raises(TransformError):
        Transformer("XSLT")                 # real engine, but no template
    with pytest.raises(TransformError):
        Transformer("JINJA", "missing.html", TEMPLATES)
    with pytest.raises(TransformError):
        Transformer("JINJA", "bad.html", {"bad.html": "{% if %}"})


def test_transform_stage_per_repo(ray_session):
    import ray.data as rd
    pages = rd.from_arrow(pa.table({
        "repo": ["styled", "plain"],
        "doc_uri": [DOC, DOC],
        "xhtml": [XHTML, XHTML]}))
    out = transform_stage(
        pages,
        repo_specs={"styled": {"transformertype": "JINJA",
                               "template": "site.html",
                               "templates": TEMPLATES}},
        parameters={"sitename": "S"}).to_pandas().set_index("repo")
    assert out.loc["styled", "html5"].startswith("<html><head>")
    assert "<nav>S</nav>" in out.loc["styled", "html5"]
    # rows without a spec fall back to the fixed HTML5 pass
    assert out.loc["plain", "html5"].startswith("<!DOCTYPE html>")
