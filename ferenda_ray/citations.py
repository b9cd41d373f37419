"""Citation detection + URI formatting.

Re-implements the semantics of the reference's ``CitationParser``
(``ferenda/citationparser.py:10-165``): a set of named grammars scans a
string and splits it into plain-text and ``(matched_text, parse_result)``
spans (``parse_string``, ``:65-96``); a ``URIFormatter``
(``ferenda/uriformatter.py:7-52``) then dispatches on the grammar name
to turn each parse result into an object URI.  Grammars here are
compiled ``re`` patterns (the reference uses pyparsing; the public
behavior — named capture groups per production — is the same).

Patterns are compiled at module import: loaded once per worker process,
shared by every task on that worker (the cheap-state pattern of
SURVEY.md §7.2 — no actor needed).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional

from ferenda_ray.corpus import ref_uri, module_uri  # URI scheme shared w/ golden
from ferenda_ray.uri import DEFAULT_BASE

# "see org0/repo1:src/pkg0/mod_0001.py#S1.2" — the corpus citation grammar
CODE_REF = re.compile(
    r"\bsee (?P<repo>[\w-]+/[\w-]+):"
    r"(?P<path>(?:[\w.-]+/)*[\w-]+\.\w+)"
    r"(?:#S(?P<ordinal>\d+(?:\.\d+)*))?"
)

# bare URLs, decomposed into named productions exactly like the
# reference's ready-made ``citationpatterns.url`` grammar
# (``ferenda/citationpatterns.py:16-36``): scheme / netloc / path /
# query / fragment, with trailing punctuation (",", ")", ".") excluded
# from the end of each component — verified against the reference's
# ``test/files/citation/url`` fixtures.
URL = re.compile(
    r"\b(?P<scheme>https?|ftp)://"
    r"(?P<netloc>[^\s/.]+(?:\.[^\s/.]+)*)"
    r"(?P<path>[^\s?#,).]+(?:[,).]+[^\s?#,).]+)*)?"
    r"(?:\?(?P<query>[^\s#,).]+(?:[,).]+[^\s#,).]+)*))?"
    r"(?:#(?P<fragment>[^\s,).]+(?:[,).]+[^\s,).]+)*))?"
)


def citation_as_xml(name: str, groups: dict) -> str:
    """Parse-result dict → the reference's XML rendering
    (``util.parseresults_as_xml``, ``ferenda/util.py:743-790``):
    productions sorted by name, nulls omitted."""
    lines = [f"<{name}>"]
    for k in sorted(groups):
        if groups[k] is not None:
            lines.append(f"  <{k}>{groups[k]}</{k}>")
    lines.append(f"</{name}>")
    return "\n".join(lines)


class CitationParser:
    """Scan text with named grammars → (name, matchdict, span) hits."""

    def __init__(self, grammars: Optional[dict] = None):
        self.grammars = grammars or {"code_ref": CODE_REF, "url": URL}

    def parse_string(self, text: str) -> list:
        """Split ``text`` into segments: plain strings and
        ``(matched_text, name, groupdict)`` tuples, in order
        (``citationparser.py:65-96``).  As in the reference (whose
        pyparsing ``scanString`` end offsets sit past any whitespace
        that follows the grammar's last token), the matched span
        absorbs trailing whitespace — verified against the
        ``test/files/citation/url`` fixtures."""
        hits = sorted(
            (m.start(), m.end(), name, m)
            for name, rx in self.grammars.items()
            for m in rx.finditer(text)
        )
        out: list = []
        pos = 0
        last_end = -1
        for start, end, name, m in hits:
            if start < last_end:
                continue  # overlapping later grammar loses (first wins)
            if start > pos:
                out.append(text[pos:start])
            while end < len(text) and text[end].isspace():
                end += 1
            out.append((text[start:end], name, m.groupdict()))
            pos = end
            last_end = end
        if pos < len(text):
            out.append(text[pos:])
        return out

    def citations(self, text: str) -> Iterator[tuple]:
        """Just the hits: yields (name, groupdict)."""
        for seg in self.parse_string(text):
            if isinstance(seg, tuple):
                yield seg[1], seg[2]


class URIFormatter:
    """grammar name → formatter callable → URI
    (``ferenda/uriformatter.py:7-52``)."""

    def __init__(self, base: str = DEFAULT_BASE, extra: Optional[dict] = None):
        self.base = base
        self.formatters: dict[str, Callable[[dict], Optional[str]]] = {
            "code_ref": self._format_code_ref,
            "url": self._format_url,
        }
        if extra:
            self.formatters.update(extra)

    def _format_code_ref(self, d: dict) -> str:
        return ref_uri(d["repo"], d["path"], d.get("ordinal"), self.base)

    def _format_url(self, d: dict) -> Optional[str]:
        return None  # bare URLs are not corpus references

    def format(self, name: str, d: dict) -> Optional[str]:
        fn = self.formatters.get(name)
        return fn(d) if fn else None


_DEFAULT_PARSER = CitationParser()
_DEFAULT_FORMATTER = URIFormatter()


def extract_reference_uris(text: str, base: str = DEFAULT_BASE) -> list:
    """All object URIs cited in ``text`` (module-level fast path)."""
    fmt = _DEFAULT_FORMATTER if base == DEFAULT_BASE else URIFormatter(base)
    out = []
    for name, d in _DEFAULT_PARSER.citations(text):
        u = fmt.format(name, d)
        if u is not None:
            out.append(u)
    return out


def import_uris(imports: list, base: str = DEFAULT_BASE) -> list:
    return [module_uri(m, base) for m in imports]
