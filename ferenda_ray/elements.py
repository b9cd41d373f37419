"""Minimal element tree for recognized document structure.

The reference models document content as a nested element tree
(``ferenda/elements/elements.py:96-718``: ``UnicodeElement`` = str
subclass with attributes, ``CompoundElement`` = list subclass with
attributes, concrete ``Body`` / ``Section`` / ``Paragraph`` /
``Preformatted`` / ``Heading``).  This engine keeps the same two base
shapes but only what extraction needs — the tree is transient: it is
flattened into fragment/triple rows inside the extraction UDF and never
persisted (SURVEY.md §1.3).
"""

from __future__ import annotations


class UnicodeElement(str):
    """A text node with attributes (``elements.py:168``)."""

    def __new__(cls, text="", **kwargs):
        obj = str.__new__(cls, text)
        for k, v in kwargs.items():
            setattr(obj, k, v)
        return obj


class CompoundElement(list):
    """A container node with attributes (``elements.py:216``)."""

    def __init__(self, children=None, **kwargs):
        super().__init__(children or [])
        for k, v in kwargs.items():
            setattr(self, k, v)

    def as_plaintext(self) -> str:
        """Whitespace-joined recursive text (``_extract_plaintext``
        semantics, ``documentrepository.py:2203-2221``)."""
        parts = []
        for c in self:
            if isinstance(c, CompoundElement):
                parts.append(c.as_plaintext())
            else:
                parts.append(str(c))
        return " ".join(" ".join(p.split()) for p in parts if p).strip()


class Body(CompoundElement):
    """Document body (``elements.py:587``)."""


class Section(CompoundElement):
    """A sectional element with ``ordinal`` and ``title``
    (``elements.py:611-677``)."""

    def __init__(self, children=None, *, ordinal=None, title=None, **kwargs):
        super().__init__(children, **kwargs)
        self.ordinal = ordinal
        self.title = title


class Paragraph(CompoundElement):
    pass


class Preformatted(CompoundElement):
    pass


class Heading(UnicodeElement):
    pass


def walk_sections(node, parent_ordinal=()):
    """Depth-first yield of (section, depth, parent) tuples."""
    for child in node if isinstance(node, CompoundElement) else []:
        if isinstance(child, Section):
            yield child, node
            yield from walk_sections(child)
