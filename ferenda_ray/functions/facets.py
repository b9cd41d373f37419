"""Facet model: declarative grouping / projection spec.

Re-implements the semantics of the reference's ``Facet``
(``ferenda/facet.py:348-422`` with per-predicate defaults ``:440-540``):
a facet names an RDF predicate, a result-column *binding*, a *selector*
(value → group key, e.g. year, first letter) and a *key* (value → sort
key).  The selector/key function library mirrors ``facet.py``'s scalar
functions (``defaultselector`` ``:128``, ``year`` ``:156-177``,
``booleanvalue`` ``:179-193``, ``titlesortkey`` ``:195-210``,
``firstletter`` ``:212-232``, ``term``/``qname`` ``:294-331``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from ferenda_ray import ns
from ferenda_ray.functions.scalars import (
    firstletter, title_sortkey, uri_leaf, year_of)


def defaultselector(v: str) -> str:
    return v


def yearselector(v: str) -> str:
    return str(year_of(v))


def booleanvalue(v: str) -> bool:
    """(``facet.py:179-193``)"""
    return v == "true"


def term(v: str) -> str:
    """URI leaf (``facet.py:294-311``)."""
    return uri_leaf(v)


def qname(v: str) -> str:
    return ns.qname(v)


@dataclass
class Facet:
    rdfpred: str                       # full predicate URI
    binding: str                       # result column name, e.g. "dcterms_title"
    selector: Callable[[str], object] = defaultselector
    key: Callable[[str], object] = defaultselector
    multiple_values: bool = False
    selector_descending: bool = False
    key_descending: bool = False
    indexingtype: str = "Text"         # fulltextindex.IndexedType analogue

    @classmethod
    def defaults_for(cls, pred: str) -> "Facet":
        """Per-predicate defaults (``facet.py:440-540``)."""
        binding = ns.qname(pred).replace(":", "_")
        if pred == ns.RDF_TYPE:
            return cls(pred, binding, selector=qname, key=qname,
                       indexingtype="URI")
        if pred == ns.DCTERMS_TITLE:
            return cls(pred, binding, selector=firstletter,
                       key=title_sortkey)
        if pred == ns.DCTERMS_ISSUED:
            return cls(pred, binding, selector=yearselector,
                       key=defaultselector, indexingtype="Datetime")
        if pred == ns.DCTERMS_SUBJECT:
            return cls(pred, binding, multiple_values=True,
                       indexingtype="Keyword")
        if pred == ns.DCTERMS_IDENTIFIER:
            return cls(pred, binding, indexingtype="Label")
        if pred == ns.DCTERMS_PUBLISHER or pred == ns.DCTERMS + "creator":
            return cls(pred, binding, indexingtype="Resource")
        return cls(pred, binding)


DEFAULT_FACETS = [
    Facet.defaults_for(ns.RDF_TYPE),
    Facet.defaults_for(ns.DCTERMS_TITLE),
    Facet.defaults_for(ns.DCTERMS_ISSUED),
    Facet.defaults_for(ns.DCTERMS_IDENTIFIER),
    Facet.defaults_for(ns.DCTERMS + "creator"),
    Facet.defaults_for(ns.DCTERMS_LANGUAGE),
]


class SchemaConflictError(Exception):
    """Same binding declared with conflicting indexing types across
    repos (``fulltextindex.py:75-81``)."""


def merged_schema(facet_sets: list) -> dict:
    """Merge facet declarations from several repos into one fulltext
    schema: binding -> indexingtype; conflicts raise
    (``fulltextindex.py:65-94``, ``:232-305``)."""
    out: dict = {
        "uri": "Identifier", "repo": "Label", "basefile": "Label",
        "text": "Text",
    }
    for facets in facet_sets:
        for f in facets:
            if f.binding in out and out[f.binding] != f.indexingtype:
                raise SchemaConflictError(
                    f"{f.binding}: {out[f.binding]} vs {f.indexingtype}")
            out.setdefault(f.binding, f.indexingtype)
    return out
