"""Minimal HTML DOM + CSS-selector subset (stdlib ``html.parser``).

The environment has no bs4/lxml, so this module supplies the soup
surface the reference's generic parse path needs
(``documentrepository.py:1259-1352``): :func:`soup_parse` builds a
DOM; :meth:`Tag.select` implements the CSS-selector subset those call
sites actually use (tag, ``.class``, ``#id``, ``[attr=value]``,
descendant / child combinators, comma groups);
:func:`parse_document_from_soup` applies ``parse_content_selector`` +
``parse_filter_selectors`` (``:1340-1352``) and converts the surviving
tree to this engine's element classes — the semantics of
``elements_from_soup`` (``ferenda/elements/html.py:23-72``: unmapped
and remove-listed tags dropped, whitespace-only strings skipped, a
kept-attribute whitelist).

Pure functions of the content string: run per row inside
``map_batches`` like every other recognizer (SURVEY.md §2.2).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ferenda_ray import elements as el

_VOID = frozenset({"area", "base", "br", "col", "embed", "hr", "img",
                   "input", "link", "meta", "source", "track", "wbr"})


class Tag:
    __slots__ = ("name", "attrs", "children", "parent")

    def __init__(self, name: str, attrs: dict | None = None,
                 parent: "Tag | None" = None):
        self.name = name
        self.attrs = attrs or {}
        self.children: list = []      # Tag | str
        self.parent = parent

    # -- text --------------------------------------------------------------

    def get_text(self, sep: str = "") -> str:
        parts = []
        for c in self.children:
            parts.append(c.get_text(sep) if isinstance(c, Tag) else c)
        return sep.join(parts)

    # -- traversal ---------------------------------------------------------

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Tag):
                yield from c.iter()

    def classes(self) -> list:
        return (self.attrs.get("class") or "").split()

    # -- CSS selector subset ----------------------------------------------

    def select(self, selector: str) -> list:
        out = []
        for group in selector.split(","):
            steps = _parse_selector(group.strip())
            for tag in self.iter():
                if tag is self:
                    continue
                if _match_path(tag, steps) and tag not in out:
                    out.append(tag)
        return out

    def decompose(self):
        """Remove this tag from its parent (bs4 API)."""
        if self.parent is not None:
            self.parent.children.remove(self)
            self.parent = None

    def __repr__(self):
        return f"<Tag {self.name} {self.attrs}>"


_SIMPLE = re.compile(
    r"^(?P<tag>[\w-]+|\*)?"
    r"(?P<qualifiers>(?:[.#][\w-]+|\[[\w-]+(?:=[^\]]*)?\])*)$")
_QUAL = re.compile(r"([.#][\w-]+|\[[\w-]+(?:=[^\]]*)?\])")


def _parse_selector(group: str) -> list:
    """'div#main > p.note' → [(simple, combinator), ...] outermost
    first; combinator is ' ' (descendant) or '>' (child)."""
    tokens = re.split(r"\s*(>)\s*|\s+", group)
    steps = []
    comb = " "
    for tok in tokens:
        if tok is None or tok == "":
            continue
        if tok == ">":
            comb = ">"
            continue
        steps.append((tok, comb))
        comb = " "
    return steps


def _match_simple(tag: Tag, simple: str) -> bool:
    m = _SIMPLE.match(simple)
    if not m:
        return False
    want = m.group("tag")
    if want and want != "*" and tag.name != want:
        return False
    for q in _QUAL.findall(m.group("qualifiers") or ""):
        if q.startswith("."):
            if q[1:] not in tag.classes():
                return False
        elif q.startswith("#"):
            if tag.attrs.get("id") != q[1:]:
                return False
        else:                       # [attr] or [attr=value]
            body = q[1:-1]
            if "=" in body:
                k, v = body.split("=", 1)
                if tag.attrs.get(k) != v.strip("\"'"):
                    return False
            elif body not in tag.attrs:
                return False
    return True


def _match_path(tag: Tag, steps: list) -> bool:
    if not steps:
        return False
    simple, _ = steps[-1]
    if not _match_simple(tag, simple):
        return False
    node = tag.parent
    i = len(steps) - 2
    while i >= 0:
        simple, comb = steps[i + 1][0], steps[i + 1][1]
        want, _ = steps[i]
        if comb == ">":
            if node is None or not _match_simple(node, want):
                return False
            node = node.parent
            i -= 1
        else:
            while node is not None and not _match_simple(node, want):
                node = node.parent
            if node is None:
                return False
            node = node.parent
            i -= 1
    return True


class _Builder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Tag("[document]")
        self.stack = [self.root]

    def handle_starttag(self, name, attrs):
        tag = Tag(name, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(tag)
        if name not in _VOID:
            self.stack.append(tag)

    def handle_startendtag(self, name, attrs):
        self.stack[-1].children.append(
            Tag(name, dict(attrs), parent=self.stack[-1]))

    def handle_endtag(self, name):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == name:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def soup_parse(html: str) -> Tag:
    """``soup_from_basefile`` body (``documentrepository.py:1259-1278``)
    without the file I/O: html string → DOM root."""
    b = _Builder()
    b.feed(html)
    return b.root


class ParseError(Exception):
    pass


# html tag → engine element class (the _tagmap idea,
# ferenda/elements/html.py:557+, reduced to this engine's classes)
_TAGMAP = {
    "body": el.Body, "div": el.Section, "section": el.Section,
    "article": el.Section, "p": el.Paragraph, "pre": el.Preformatted,
    "ol": el.OrderedList, "ul": el.UnorderedList, "li": el.ListItem,
}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6", "title"}
_REMOVE = ("script", "style", "font", "map", "center")
_KEEP_ATTRS = ("class", "id", "dir", "lang", "src", "href", "name",
               "alt")


def elements_from_tag(tag: Tag, remove_tags=_REMOVE,
                      keep_attributes=_KEEP_ATTRS):
    """DOM subtree → engine element tree (``elements_from_soup``
    semantics: drop removed/unmapped tags, skip whitespace-only
    strings, keep a whitelist of attributes)."""
    if tag.name in remove_tags:
        return None
    if tag.name in _HEADINGS:
        return el.Heading(" ".join(tag.get_text(" ").split()))
    cls = _TAGMAP.get(tag.name)
    if cls is None:
        return None
    attrs = {k: tag.attrs[k] for k in keep_attributes if k in tag.attrs}
    element = cls(**attrs)
    for child in tag.children:
        if isinstance(child, str):
            if child.strip():
                element.append(child)
        else:
            sub = elements_from_tag(child, remove_tags, keep_attributes)
            if sub is not None:
                element.append(sub)
    return element


def parse_document_from_soup(html: str, content_selector: str = "body",
                             filter_selectors=("script",)):
    """The generic parse projection (``documentrepository.py:1322-1352``):
    select the content root via ``content_selector`` (ParseError when
    nothing matches; first match wins), prune every
    ``filter_selectors`` match, convert the rest to elements."""
    root = soup_parse(html)
    matches = root.select(content_selector)
    if not matches:
        raise ParseError(
            f"parse_content_selector {content_selector!r} matches nothing")
    content = matches[0]
    for fsel in filter_selectors:
        for tag in content.select(fsel):
            tag.decompose()
    return elements_from_tag(content)
