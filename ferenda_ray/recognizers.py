"""Per-language structure recognizers: file content → ParsedDoc.

The markdown recognizer is a genuine :class:`ferenda_ray.fsm.FSMParser`
instance, modeled on the reference's RFC parser (12 recognizers +
transition table + section/subsection constructors,
``ferenda/sources/tech/rfc.py:134-428``; section-start regex
``^(\\d[\\.\\d]*) +(.*)$`` at ``rfc.py:352-368``).  The code-language
recognizers (python / java / go) are indentation/keyword line scanners
producing the same :class:`ParsedDoc` shape — the reference likewise
mixes FSM-based and ad-hoc parsers per source family.

All recognizers are pure functions of the content string: cheap enough
to run inline per row inside ``map_batches`` (SURVEY.md §2.2) — no
actor state.  Unparseable content raises :class:`~ferenda_ray.fsm.FSMStateError`,
which the extraction stage converts into a per-row error record rather
than a task failure (``fsmparser.py:150-152`` semantics; SURVEY.md §7.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ferenda_ray.elements import Body, Heading, Paragraph, Section, UnicodeElement
from ferenda_ray.fsm import FSMParser, FSMStateError
from ferenda_ray.fsm import newstate as fsm_newstate


@dataclass
class ParsedSection:
    ordinal: str
    title: str
    prose: list = field(default_factory=list)
    subs: list = field(default_factory=list)


@dataclass
class ParsedDoc:
    title: str = ""
    meta: dict = field(default_factory=dict)      # e.g. Author, Issued
    imports: list = field(default_factory=list)   # module names
    intro_prose: list = field(default_factory=list)
    sections: list = field(default_factory=list)  # list[ParsedSection]


# ---------------------------------------------------------------------------
# markdown — FSMParser instance

_RE_H1 = re.compile(r"^# (.+)$")
_RE_KV = re.compile(r"^([A-Z]\w+): (.+)$")
_RE_SEC = re.compile(r"^## (\d+)\. (.+)$")
_RE_SUB = re.compile(r"^### (\d+(?:\.\d+)+) (.+)$")


# recognizers receive the PARSER (reference API, fsmparser.py:118-156)
def _is_h1(p):
    return bool(_RE_H1.match(p.reader.peek()))


def _is_kv(p):
    return bool(_RE_KV.match(p.reader.peek()))


def _is_section(p):
    return bool(_RE_SEC.match(p.reader.peek()))


def _is_subsection(p):
    return bool(_RE_SUB.match(p.reader.peek()))


def _is_blank(p):
    return not p.reader.peek().strip()


def _is_para(p):
    return True


class _Meta(UnicodeElement):
    pass


def _make_heading(p):
    return Heading(_RE_H1.match(p.reader.next()).group(1))


def _make_meta(p):
    m = _RE_KV.match(p.reader.next())
    return _Meta(m.group(2), key=m.group(1))


def _skip(p):
    p.reader.next()
    return None


def _make_para(p):
    return Paragraph([p.reader.next()])


@fsm_newstate("section")
def _make_section(p):
    line = p.reader.next()
    m = _RE_SEC.match(line) or _RE_SUB.match(line)
    sec = Section(ordinal=m.group(1), title=m.group(2))
    return p.make_children(sec)


def markdown_parser() -> FSMParser:
    p = FSMParser()
    p.set_recognizers(_is_blank, _is_h1, _is_kv, _is_subsection, _is_section,
                      _is_para)
    p.set_transitions({
        ("body", _is_blank): (_skip, None),
        ("body", _is_h1): (_make_heading, None),
        ("body", _is_kv): (_make_meta, None),
        ("body", _is_para): (_make_para, None),
        ("body", _is_section): (_make_section, "section"),
        ("section", _is_blank): (_skip, None),
        ("section", _is_para): (_make_para, None),
        ("section", _is_section): (False, None),
        ("section", _is_subsection): (_make_section, "subsection"),
        ("subsection", _is_blank): (_skip, None),
        ("subsection", _is_para): (_make_para, None),
        ("subsection", _is_section): (False, None),
        ("subsection", _is_subsection): (False, None),
    })
    p.initial_state = "body"
    # the initial constructor recurses itself (reference semantics:
    # parse() returns initial_constructor(parser) directly)
    p.initial_constructor = lambda parser: parser.make_children(Body())
    return p


def parse_markdown(content: str) -> ParsedDoc:
    body = markdown_parser().parse(content.split("\n"))
    doc = ParsedDoc()

    def collect(node, out_prose, out_subs, depth):
        for child in node:
            if isinstance(child, Heading):
                doc.title = str(child)
            elif isinstance(child, _Meta):
                doc.meta[child.key] = str(child)
            elif isinstance(child, Paragraph):
                out_prose.append(child.as_plaintext())
            elif isinstance(child, Section):
                ps = ParsedSection(ordinal=child.ordinal, title=child.title)
                collect(child, ps.prose, ps.subs, depth + 1)
                out_subs.append(ps)
    collect(body, doc.intro_prose, doc.sections, 0)
    return doc


# ---------------------------------------------------------------------------
# python — line scanner

_RE_PY_DOCSTRING = re.compile(r'^\s*"""(.*)"""\s*$')
_RE_PY_KVC = re.compile(r"^# ([A-Z]\w+): (.+)$")
_RE_PY_IMPORT = re.compile(r"^import ([\w.]+)\s*$")
_RE_PY_FROM = re.compile(r"^from ([\w.]+) import ")
_RE_PY_CLASS = re.compile(r"^class (\w+)\b")
_RE_PY_DEF = re.compile(r"^def (\w+)\b")
_RE_PY_METH = re.compile(r"^    def (\w+)\b")
_RE_PY_COMMENT = re.compile(r"^\s*# (.*)$")


def parse_python(content: str) -> ParsedDoc:
    doc = ParsedDoc()
    cur_sec: ParsedSection | None = None
    cur_sub: ParsedSection | None = None
    top_n = 0
    pending_title_for: ParsedSection | None = None
    for line in content.split("\n"):
        m = _RE_PY_DOCSTRING.match(line)
        if m:
            if pending_title_for is not None:
                pending_title_for.title = m.group(1)
                pending_title_for = None
            elif not doc.title and cur_sec is None:
                doc.title = m.group(1)
            continue
        m = _RE_PY_KVC.match(line)
        if m and cur_sec is None:
            doc.meta[m.group(1)] = m.group(2)
            continue
        m = _RE_PY_IMPORT.match(line) or _RE_PY_FROM.match(line)
        if m:
            doc.imports.append(m.group(1))
            continue
        m = _RE_PY_CLASS.match(line) or _RE_PY_DEF.match(line)
        if m:
            top_n += 1
            cur_sec = ParsedSection(ordinal=str(top_n), title="")
            cur_sub = None
            pending_title_for = cur_sec
            doc.sections.append(cur_sec)
            continue
        m = _RE_PY_METH.match(line)
        if m and cur_sec is not None:
            cur_sub = ParsedSection(
                ordinal=f"{cur_sec.ordinal}.{len(cur_sec.subs) + 1}", title="")
            pending_title_for = cur_sub
            cur_sec.subs.append(cur_sub)
            continue
        m = _RE_PY_COMMENT.match(line)
        if m:
            target = cur_sub or cur_sec
            (target.prose if target is not None
             else doc.intro_prose).append(m.group(1))
            continue
        # other code lines / blanks: ignored
    return doc


# ---------------------------------------------------------------------------
# java / go — comment-annotated scanners

_RE_C_COMMENT = re.compile(r"^\s*// (.*)$")
_RE_C_KV = re.compile(r"^([A-Z]\w+): (.+)$")        # applied to comment text
_RE_C_SECTITLE = re.compile(r"^(\d+(?:\.\d+)*)\.? (.+)$")  # applied to comment text
_RE_JAVA_IMPORT = re.compile(r"^import ([\w.]+);")
_RE_JAVA_CLASS = re.compile(r"^(?:public )?class (\w+)\b")
_RE_JAVA_METHOD = re.compile(r"^\s+(?:public|private|protected)[\w<>\[\] ]* (\w+)\(")
_RE_GO_IMPORT = re.compile(r'^import "([\w./-]+)"')
_RE_GO_FUNC = re.compile(r"^func (?:\([\w* ]+\) )?(\w+)\(")


def _parse_c_like(content: str, import_re, section_re, method_re=None,
                  import_module=lambda m: m) -> ParsedDoc:
    doc = ParsedDoc()
    cur_sec: ParsedSection | None = None
    cur_sub: ParsedSection | None = None
    pending: tuple | None = None  # (ordinal, title) awaiting decl line
    seen_title = False
    for line in content.split("\n"):
        cm = _RE_C_COMMENT.match(line)
        if cm:
            text = cm.group(1)
            kv = _RE_C_KV.match(text)
            st = _RE_C_SECTITLE.match(text)
            if st:
                pending = (st.group(1), st.group(2))
            elif kv and cur_sec is None:
                doc.meta[kv.group(1)] = kv.group(2)
            elif not seen_title:
                doc.title = text
                seen_title = True
            else:
                target = cur_sub or cur_sec
                (target.prose if target is not None
                 else doc.intro_prose).append(text)
            continue
        m = import_re.match(line)
        if m:
            doc.imports.append(import_module(m.group(1)))
            continue
        m = section_re.match(line)
        if m and not line.startswith((" ", "\t")):
            ordinal, title = pending or (str(len(doc.sections) + 1), m.group(1))
            pending = None
            cur_sec = ParsedSection(ordinal=ordinal, title=title)
            cur_sub = None
            doc.sections.append(cur_sec)
            continue
        if method_re is not None:
            m = method_re.match(line)
            if m and cur_sec is not None:
                ordinal, title = pending or (
                    f"{cur_sec.ordinal}.{len(cur_sec.subs) + 1}", m.group(1))
                pending = None
                cur_sub = ParsedSection(ordinal=ordinal, title=title)
                cur_sec.subs.append(cur_sub)
            continue
    return doc


def parse_java(content: str) -> ParsedDoc:
    return _parse_c_like(content, _RE_JAVA_IMPORT, _RE_JAVA_CLASS,
                         _RE_JAVA_METHOD,
                         import_module=lambda m: m.split(".")[0])


def parse_go(content: str) -> ParsedDoc:
    return _parse_c_like(content, _RE_GO_IMPORT, _RE_GO_FUNC)


PARSERS = {
    "markdown": parse_markdown,
    "python": parse_python,
    "java": parse_java,
    "go": parse_go,
}


def parse_content(lang: str, content: str) -> ParsedDoc:
    """Dispatch on ``lang``; unknown languages get a minimal ParsedDoc
    (title = first non-blank line, no structure) — the analogue of the
    reference's generic fallback parse (``documentrepository.py:1196-1219``)."""
    fn = PARSERS.get(lang)
    if fn is not None:
        return fn(content)
    doc = ParsedDoc()
    for line in content.split("\n"):
        if line.strip():
            doc.title = line.strip()[:120]
            break
    return doc


def composite_parse(content: str, strategies: list | None = None):
    """Try parse strategies in declared order until one succeeds —
    ``CompositeRepository.parse`` semantics
    (``compositerepository.py:57-337``: subrepos attempted in order,
    first success wins, failures swallowed).  Success = no parse error
    AND recognized structure (sections or metadata).  Returns
    ``(strategy_name, ParsedDoc)``; exhaustion falls back to the
    minimal generic parse under the name ``"fallback"``.

    ``strategies``: ``[(name, parser_fn), ...]``; defaults to every
    registered language parser in registration order.
    """
    strategies = strategies or list(PARSERS.items())
    for name, fn in strategies:
        try:
            doc = fn(content)
        except FSMStateError:
            continue
        if doc.sections or doc.meta:
            return name, doc
    return "fallback", parse_content("?", content)
