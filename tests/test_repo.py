"""DocRepository extension surface (reference documentrepository.py
subclass model + compositerepository.py first-success parse)."""

import pyarrow as pa
import pytest

from ferenda_ray.repo import CompositeRepository, DocRepository


def test_default_hooks():
    r = DocRepository()
    uri = r.canonical_uri("doc/1")
    assert uri == "https://example.org/res/base/doc/1"
    assert r.basefile_from_uri(uri + "#S1") == "doc/1"
    assert r.basefile_from_uri("https://other/x") is None
    trips = r.parse_metadata("# Title line\n\nbody", "doc/1")
    preds = {t["pred"].rsplit("/", 1)[-1].rsplit("#", 1)[-1]
             for t in trips}
    assert "type" in preds and "identifier" in preds


def _my_repo():
    # defined inside a function so cloudpickle ships the subclass BY
    # VALUE to workers (a test-module top-level class pickles by
    # reference, and tests/ isn't importable from workers)
    class MyRepo(DocRepository):
        alias = "mine"
        rdf_type = "http://example.org/vocab/Report"
        transformertype = "JINJA"
        template = "t.html"
        templates = {"t.html": "<html>{{ title }}!</html>"}

        def canonical_uri(self, basefile):
            return f"{self.base_url}{self.alias}/{basefile}"

        def parse_metadata(self, content, basefile):
            trips = super().parse_metadata(content, basefile)
            trips.append({"subj": self.canonical_uri(basefile),
                          "pred": "http://example.org/vocab/lines",
                          "obj_type": "literal",
                          "obj_value": str(content.count("\n") + 1)})
            return trips

    return MyRepo()


def test_subclass_overrides_flow_through_parse_all(ray_session):
    import ray.data as rd
    sources = rd.from_arrow(pa.table({
        "basefile": ["a", "b"],
        "content": ["one\ntwo", "single"]}))
    out = _my_repo().parse_all(sources).to_pandas()
    assert set(out[out["pred"] == "http://example.org/vocab/lines"]
               ["obj_value"]) == {"2", "1"}
    assert out["subj"].str.startswith(
        "https://example.org/mine/").all()
    assert (out[out["pred"].str.endswith("#type")]["obj_value"]
            == "http://example.org/vocab/Report").all()


def test_template_hook_in_generate_all(ray_session):
    import ray.data as rd
    from ferenda_ray.stages.render import render_xhtml
    doc = "https://example.org/mine/a"
    xhtml = render_xhtml(doc, [(doc, "http://purl.org/dc/terms/title",
                                "literal", "T", "en", None)])
    pages = rd.from_arrow(pa.table({
        "repo": ["mine"], "doc_uri": [doc], "xhtml": [xhtml]}))
    out = _my_repo().generate_all(pages).to_pandas()
    assert out.loc[0, "html5"] == "<html>T!</html>"


def test_composite_first_success():
    class Fails(DocRepository):
        def parse_document(self, content, basefile):
            raise ValueError("nope")

    class Wins(DocRepository):
        def parse_document(self, content, basefile):
            from ferenda_ray.recognizers import ParsedDoc
            return ParsedDoc(title="won")

    class Comp(CompositeRepository):
        subrepos = (Fails(), Wins())

    doc = Comp().parse_document("x", "b")
    assert doc.title == "won"


def test_citation_roles_hook(ray_session):
    import ray.data as rd

    def make():
        class CiteRepo(DocRepository):
            alias = "cites"

            def citation_roles(self):
                return ["rattsfall", "eulag"]

        return CiteRepo()

    src = rd.from_arrow(pa.table({
        "basefile": ["x"],
        "content": ["Se NJA 1998 s. 14 och rådets direktiv "
                    "95/46/EG.\n"]}))
    out = make().parse_all(src).to_pandas()
    refs = out[out["pred"].str.endswith("references")]["obj_value"]
    assert sorted(refs) == [
        "https://lagen.nu/dom/nja/1998s14",
        "https://lagen.nu/ext/celex/31995L0046"]
