"""User-extension surface: subclass :class:`DocRepository` and
override hook methods — the engine's equivalent of the reference's
``DocumentRepository`` subclassing model (``documentrepository.py:
68-144``: ~100 hook methods behind seven entry-point actions).

The engine keeps the HOOK surface (URI minting, parse, facets,
citation roles, presentation template) as overridable methods, but
each ACTION is a Dataset pipeline: ``parse_all`` is one
``map_batches`` whose worker-side callable carries the repo instance
(pickled once per worker, the task-closure broadcast policy), and
``toc`` / ``generate_all`` compose the existing stage library.

Hook → reference mapping:

=====================  ==================================================
hook                   reference
=====================  ==================================================
``canonical_uri``      ``documentrepository.py:665-681``
``basefile_from_uri``  ``:719-743``
``parse_document``     ``parse``/``parse_document_from_soup`` (:1196+)
``parse_metadata``     ``parse_metadata_from_soup``
``facets``             ``:2223-2233``
``citation_roles``     LegalRef role selection (legalref.py:66-78)
``get_transformer``    per-repo template (transformer.py:25-100)
=====================  ==================================================
"""

from __future__ import annotations

import pyarrow as pa

from ferenda_ray import ns
from ferenda_ray.uri import DEFAULT_BASE


class DocRepository:
    """Base repo: override class attrs / hook methods in a subclass."""

    alias = "base"
    base_url = DEFAULT_BASE
    rdf_type = ns.BIBO_DOCUMENT
    lang = "en"

    #: presentation-template hook (Transformer kwargs); None → the
    #: fixed HTML5 pass
    transformertype = "HTML5"
    template = None
    templates = None

    # -- URI hooks -----------------------------------------------------

    def canonical_uri(self, basefile: str) -> str:
        return f"{self.base_url}res/{self.alias}/{basefile}"

    def basefile_from_uri(self, uri: str):
        prefix = f"{self.base_url}res/{self.alias}/"
        if not uri.startswith(prefix):
            return None
        return uri[len(prefix):].split("#", 1)[0]

    # -- parse hooks ---------------------------------------------------

    def parse_document(self, content: str, basefile: str):
        """content → ParsedDoc; default: the composite
        first-success strategy chain."""
        from ferenda_ray.recognizers import composite_parse
        return composite_parse(content)[1]

    def parse_metadata(self, content: str, basefile: str) -> list:
        """content → triple dicts (subj/pred/obj_type/obj_value);
        default: type + title + identifier from the parsed doc."""
        uri = self.canonical_uri(basefile)
        doc = self.parse_document(content, basefile)

        def lit(p, v):
            return {"subj": uri, "pred": p, "obj_type": "literal",
                    "obj_value": v}

        trips = [{"subj": uri, "pred": ns.RDF_TYPE, "obj_type": "uri",
                  "obj_value": self.rdf_type},
                 lit(ns.DCTERMS_IDENTIFIER, basefile)]
        if doc.title:
            trips.append(lit(ns.DCTERMS_TITLE, doc.title))
        roles = self.citation_roles()
        if roles:
            from ferenda_ray.legalref import Link, MultiRoleParser
            parser = getattr(self, "_role_parser", None)
            if parser is None:
                # compiled once per worker-side repo instance (the
                # grammar-compile-once policy of SURVEY.md §2.4)
                parser = self._role_parser = MultiRoleParser(*roles)
            seen = set()
            for node in parser.parse(content):
                if isinstance(node, Link) and node.uri not in seen:
                    seen.add(node.uri)
                    trips.append({"subj": uri,
                                  "pred": ns.DCTERMS + "references",
                                  "obj_type": "uri",
                                  "obj_value": node.uri})
        return trips

    # -- declarative hooks ---------------------------------------------

    def facets(self) -> list:
        from ferenda_ray.functions.facets import DEFAULT_FACETS
        return list(DEFAULT_FACETS)

    def citation_roles(self) -> list:
        """Role names for :class:`~ferenda_ray.legalref.
        MultiRoleParser` (empty → no citation pass)."""
        return []

    def get_transformer(self):
        from ferenda_ray.stages.transformer import Transformer
        return Transformer(self.transformertype, self.template,
                           self.templates)

    # -- actions (Dataset pipelines) -----------------------------------

    def parse_all(self, sources, basefile_col: str = "basefile",
                  content_col: str = "content"):
        """Sources Dataset → 4-col triples Dataset; the repo instance
        (with every override) ships in the task closure once per
        worker."""
        repo = self

        def parse_batch(b: pa.Table) -> pa.Table:
            rows = {"subj": [], "pred": [], "obj_type": [],
                    "obj_value": []}
            for basefile, content in zip(
                    b.column(basefile_col).to_pylist(),
                    b.column(content_col).to_pylist()):
                for t in repo.parse_metadata(content, basefile):
                    for k in rows:
                        rows[k].append(t[k])
            return pa.table({k: pa.array(v, pa.string())
                             for k, v in rows.items()})

        return sources.map_batches(parse_batch,
                                   batch_format="pyarrow")

    def generate_all(self, pages, **kw):
        """XHTML pages → HTML via this repo's template hook."""
        from ferenda_ray.stages.transformer import transform_stage
        spec = {"transformertype": self.transformertype}
        if self.template is not None:
            spec.update(template=self.template,
                        templates=self.templates)
        return transform_stage(pages, repo_specs={self.alias: spec},
                               repo_col="repo", **kw)

    def toc(self, faceted, facet=None):
        """Faceted rows → TOC pagesets for one facet (default: the
        first TOC-able facet)."""
        from ferenda_ray.pipelines.derived import toc_pagesets
        facet = facet or self.facets()[0]
        return toc_pagesets(faceted, facet)


class CompositeRepository(DocRepository):
    """``compositerepository.py:57-140`` semantics: subrepos tried in
    order, first successful parse wins."""

    #: subclasses list DocRepository INSTANCES in priority order
    subrepos: tuple = ()

    def parse_document(self, content: str, basefile: str):
        last_err = None
        for sub in self.subrepos:
            try:
                doc = sub.parse_document(content, basefile)
            except Exception as e:        # failures swallowed (:98)
                last_err = e
                continue
            if doc.sections or doc.meta or doc.title:
                return doc
        if last_err is not None and not self.subrepos:
            raise last_err
        return super().parse_document(content, basefile)
