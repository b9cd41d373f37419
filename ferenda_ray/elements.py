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


class Subsection(Section):
    """(``elements.py:623``)"""


class Subsubsection(Section):
    """(``elements.py:629``)"""


class Paragraph(CompoundElement):
    pass


class Preformatted(CompoundElement):
    pass


class OrderedList(CompoundElement):
    """A list container with a CSS ``type`` (``elements.py:527``)."""

    def __init__(self, children=None, *, type=None, **kwargs):
        super().__init__(children, **kwargs)
        if type is not None:
            self.type = type


class UnorderedList(CompoundElement):
    pass


class ListItem(CompoundElement):
    """(``elements.py:547``)"""

    def __init__(self, children=None, *, ordinal=None, **kwargs):
        super().__init__(children, **kwargs)
        if ordinal is not None:
            self.ordinal = ordinal


class Heading(UnicodeElement):
    pass


class RFCHeader(UnicodeElement):
    """The two-column RFC masthead block (``sources/tech/rfc.py``)."""


class DocTitle(UnicodeElement):
    """The centered RFC document title."""


class PreambleSection(CompoundElement):
    """Titled pre-TOC section (Abstract, Status of This Memo, …)."""

    def __init__(self, children=None, *, title=None, **kwargs):
        super().__init__(children, **kwargs)
        if title is not None:
            self.title = title


class Pagebreak(CompoundElement):
    """Page-break marker carrying the running short title."""

    def __init__(self, children=None, *, shorttitle=None, **kwargs):
        super().__init__(children, **kwargs)
        if shorttitle is not None:
            self.shorttitle = shorttitle


# ---------------------------------------------------------------------------
# XML serialization — format-compatible with the reference's
# ``elements.serialize(root)`` (``elements.py:53-66, 869-920, 975-1004``)
# so the reference's checked-in fixture files (test/files/fsmparser/*.xml)
# compare byte-for-byte.  The indentation quirks are preserved
# deliberately: only the LAST child's tail is reset to the parent's
# indent, so a compound sibling is not separated from its successor
# (``</Paragraph><Subsection …`` in the goldens).

def _to_etree(node):
    import xml.etree.ElementTree as ET
    name = "str" if type(node) is str else type(node).__name__
    e = ET.Element(name)
    attrs = getattr(node, "__dict__", None)
    if attrs:
        for k, v in attrs.items():
            if k.startswith("_") or v is None:
                continue
            e.set(k, v if isinstance(v, str) else repr(v))
    if isinstance(node, str):
        if node:
            e.text = str(node)
    elif isinstance(node, list):
        for c in node:
            e.append(_to_etree(c))
    else:
        e.text = repr(node)
    return e


def _indent(elem, level, top=False):
    pad = "\n" + level * "  "
    if len(elem):
        if not elem.text or not elem.text.strip():
            elem.text = pad + "  "
        child = None
        for child in elem:
            _indent(child, level + 1)
            if top and (not child.tail or not child.tail.strip()):
                child.tail = pad + "  "
        if child is not None and (not child.tail or not child.tail.strip()):
            child.tail = pad
    elif level and (not elem.tail or not elem.tail.strip()):
        elem.tail = pad


def serialize(root) -> str:
    """Element tree → indented XML string (reference
    ``elements.serialize`` format)."""
    import xml.etree.ElementTree as ET
    t = _to_etree(root)
    _indent(t, 0, top=True)
    return ET.tostring(t, encoding="unicode") + "\n"


def walk_sections(node, parent_ordinal=()):
    """Depth-first yield of (section, depth, parent) tuples."""
    for child in node if isinstance(node, CompoundElement) else []:
        if isinstance(child, Section):
            yield child, node
            yield from walk_sections(child)
