"""COIN-style deterministic URI minting.

Re-implements the *semantics* of the reference's COIN minter
(``ferenda/thirdparty/coin.py:14-236``): a ``URISpace`` holds an ordered
list of ``Template`` objects (sorted most-specific / highest-priority
first, cf. ``coin.py:38-41``); each template declares the attribute
*bindings* it needs and a URI template; minting evaluates templates in
order and returns the first complete expansion (``Template.coin_uri``,
``coin.py:132-147``).  Slug transforms (lowercase / space replacement /
char replacement / strip) follow ``coin.py:57-88``; ``{+base}`` and
fragment templates follow ``build_uri`` (``coin.py:149-179``); recursive
base minting via a ``relToBase``-style parent attribute follows
``coin.py:181-202``.

Everything is a pure function of the attribute dict — deterministic,
picklable, cheap enough to run inline inside ``map_batches`` (config is
module-level data, no actor needed; cf. SURVEY.md §2.2).

The engine's canonical document URI scheme (the analogue of
``DocumentRepository.canonical_uri``, ``documentrepository.py:665-681``)
is ``{base}res/{repo}/{path}@{commit}`` with section fragments
``#S{ordinal}``; ``basefile_from_uri`` (``documentrepository.py:719-743``)
is its exact inverse and is property-tested for round-trip.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

DEFAULT_BASE = "https://example.org/"

_VAR = re.compile(r"\{(\+?)([a-zA-Z_][a-zA-Z0-9_]*)\}")


@dataclass(frozen=True)
class SlugTransform:
    """Value → URI-slug transform (``coin.py:57-88``)."""

    lower: bool = True
    space_replacement: str = "_"
    char_replacements: tuple = ()  # tuple[(str, str), ...]
    strip: bool = True

    def __call__(self, value: str) -> str:
        s = str(value)
        if self.strip:
            s = s.strip()
        if self.lower:
            s = s.lower()
        for old, new in self.char_replacements:
            s = s.replace(old, new)
        if self.space_replacement is not None:
            s = s.replace(" ", self.space_replacement)
        return s


@dataclass(frozen=True)
class Template:
    """One URI template: required bindings + pattern.

    ``priority`` and binding-count specificity order template
    evaluation (``coin.py:38-41``).  ``for_type`` restricts the template
    to resources whose ``rdf_type`` attribute matches.  A
    ``fragment_template`` makes this template mint a fragment of a
    recursively-minted parent URI (``relToBase`` semantics,
    ``coin.py:181-202``) — the parent attrs live under
    ``attrs["parent"]``.
    """

    uri_template: str
    bindings: frozenset = frozenset()
    for_type: Optional[str] = None
    priority: int = 0
    fragment_template: Optional[str] = None
    slug: SlugTransform = field(default_factory=SlugTransform)
    raw_bindings: frozenset = frozenset()  # bindings NOT slug-transformed

    def _expand(self, template: str, attrs: dict, base: str) -> Optional[str]:
        out = []
        pos = 0
        for m in _VAR.finditer(template):
            out.append(template[pos:m.start()])
            plus, name = m.group(1), m.group(2)
            if name == "base" and plus:
                out.append(base)
            else:
                if name not in attrs or attrs[name] is None:
                    return None
                v = str(attrs[name])
                if not plus and name not in self.raw_bindings:
                    v = self.slug(v)
                out.append(v)
            pos = m.end()
        out.append(template[pos:])
        return "".join(out)

    def coin_uri(self, attrs: dict, base: str, space: "URISpace") -> Optional[str]:
        if self.for_type is not None and attrs.get("rdf_type") != self.for_type:
            return None
        for b in self.bindings:
            if attrs.get(b) is None:
                return None
        if self.fragment_template is not None:
            parent = attrs.get("parent")
            if parent is None:
                return None
            parent_uri = parent if isinstance(parent, str) else space.mint(parent)
            if parent_uri is None:
                return None
            frag = self._expand(self.fragment_template, attrs, base)
            if frag is None:
                return None
            return parent_uri + frag
        return self._expand(self.uri_template, attrs, base)

    @property
    def specificity(self) -> tuple:
        # more bindings first, then explicit priority (coin.py:38-41)
        return (self.priority, len(self.bindings), self.for_type is not None)


class URISpace:
    """Ordered template set with a base URI; ``mint(attrs) -> uri``."""

    def __init__(self, base: str = DEFAULT_BASE, templates: Optional[list] = None):
        if not base.endswith("/"):
            base += "/"
        self.base = base
        self.templates = sorted(
            templates or [], key=lambda t: t.specificity, reverse=True
        )

    def mint(self, attrs: dict) -> Optional[str]:
        for t in self.templates:
            uri = t.coin_uri(attrs, self.base, self)
            if uri is not None:
                return uri
        return None


# --- the engine's default document URI space ---------------------------------

def default_space(base: str = DEFAULT_BASE) -> URISpace:
    """Document + section-fragment templates for the code corpus."""
    return URISpace(
        base,
        [
            Template(
                uri_template="{+base}res/{repo}/{path}@{commit}",
                bindings=frozenset({"repo", "path", "commit"}),
                raw_bindings=frozenset({"repo", "path", "commit"}),
                priority=0,
            ),
            Template(
                uri_template="",
                fragment_template="#S{ordinal}",
                bindings=frozenset({"ordinal"}),
                raw_bindings=frozenset({"ordinal"}),
                priority=1,
            ),
        ],
    )


_SPACE_CACHE: dict = {}


def _space(base: str = DEFAULT_BASE) -> URISpace:
    if base not in _SPACE_CACHE:
        _SPACE_CACHE[base] = default_space(base)
    return _SPACE_CACHE[base]


def doc_uri(repo: str, path: str, commit: str, base: str = DEFAULT_BASE) -> str:
    """Canonical document URI (``canonical_uri`` analogue)."""
    return _space(base).mint({"repo": repo, "path": path, "commit": commit})


def frag_uri(parent_uri: str, ordinal: str) -> str:
    """Section fragment URI ``{doc}#S{ordinal}``."""
    return f"{parent_uri}#S{ordinal}"


def entity_uri(slug: str, base: str = DEFAULT_BASE) -> str:
    """URI for a linked entity (alias-dictionary target)."""
    return f"{base}entity/{slug}"


def basefile_from_uri(uri: str, base: str = DEFAULT_BASE) -> Optional[dict]:
    """Inverse of ``doc_uri`` (``documentrepository.py:719-743``).

    Returns ``{"repo":…, "path":…, "commit":…, "ordinal":… | None}`` or
    ``None`` when the URI is not in this space.
    """
    prefix = base if base.endswith("/") else base + "/"
    prefix += "res/"
    if not uri.startswith(prefix):
        return None
    rest = uri[len(prefix):]
    ordinal = None
    if "#" in rest:
        rest, frag = rest.split("#", 1)
        if not frag.startswith("S"):
            return None
        ordinal = frag[1:]
    if "@" not in rest or "/" not in rest:
        return None
    pathpart, commit = rest.rsplit("@", 1)
    # repo is the first two /-separated segments ("org/name")
    segs = pathpart.split("/")
    if len(segs) < 3:
        return None
    repo = "/".join(segs[:2])
    path = "/".join(segs[2:])
    return {"repo": repo, "path": path, "commit": commit, "ordinal": ordinal}


# --- Swedish legal-source URI space (legaluri conformance) -------------------

#: the reference's LegalRef role enums used as legaluri 'type' values
#: (sources/legal/se/legalref.py:66-78)
LAGRUM, RATTSFALL, MYNDIGHETSBESLUT = 1, 7, 8

RINFO_BASE = "http://rinfo.lagrummet.se/"


def rinfo_space(base: str = RINFO_BASE) -> URISpace:
    """The subset of the swedishlegalsource COIN space the reference's
    ``legaluri.construct`` exercises (``sources/legal/se/legaluri.py:
    78-120`` + ``res/uri/swedishlegalsource.space.ttl``), expressed
    with the engine's own :class:`Template` machinery — fixture corpus
    ``test/files/legaluri/*``."""
    return URISpace(base, [
        Template("{+base}publ/sfs/{law}",
                 bindings=frozenset({"law"}),
                 raw_bindings=frozenset({"law"}),
                 for_type=LAGRUM),
        Template("{+base}publ/rf/{rattsfallspublikation}"
                 "/{arsutgava}/s_{sidnummer}",
                 bindings=frozenset({"rattsfallspublikation",
                                     "arsutgava", "sidnummer"}),
                 for_type=RATTSFALL, priority=1),
        Template("{+base}publ/rf/{rattsfallspublikation}"
                 "/{arsutgava}:{lopnummer}",
                 bindings=frozenset({"rattsfallspublikation",
                                     "arsutgava", "lopnummer"}),
                 for_type=RATTSFALL),
        Template("{+base}publ/avg/{myndighet}/{dnr}",
                 bindings=frozenset({"myndighet", "dnr"}),
                 raw_bindings=frozenset({"dnr"}),
                 for_type=MYNDIGHETSBESLUT),
    ])


_LAGRUM_FRAG = (("chapter", "K"), ("section", "P"),
                ("piece", "S"), ("item", "N"))


def legaluri_construct(attrs: dict, base: str = RINFO_BASE) -> str:
    """``legaluri.construct`` analogue: attribute dict (with the
    numeric ``type`` role enum) → rinfo URI.  LAGRUM fragments follow
    the reference's ``#K{chapter}P{section}S{piece}N{item}`` pattern
    (``legaluri.py:63-66``)."""
    d = dict(attrs)
    d["rdf_type"] = d.pop("type", None)
    uri = rinfo_space(base).mint(d)
    if uri is None:
        raise ValueError(f"no template matches {attrs!r}")
    if d["rdf_type"] == LAGRUM:
        frag = "".join(p + str(d[k]) for k, p in _LAGRUM_FRAG
                       if d.get(k) is not None)
        if frag:
            uri += "#" + frag
    return uri
