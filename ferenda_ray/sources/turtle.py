"""Turtle (and N-Triples) parsing into the engine's triple rows.

The reference keeps ontology vocabularies and shared entity data as
Turtle files loaded at repo setup (``ferenda/res/vocab/*.ttl``,
``res/extra/*.ttl``; loading in ``documentrepository.py`` ``ontologies``
/ ``commondata`` properties) and distill-tests compare against golden
``.ttl`` graphs (``ferenda/testutil.py:648-668``).  No rdflib exists in
this environment, so this is a self-contained recursive-descent parser
for the Turtle subset those files use: prefixes/base, ``a``,
predicate-object and object lists, all four string quote forms with
escapes, language tags, typed/numeric/boolean literals, blank nodes
(labelled, anonymous property lists) and collections.

Output rows use ``schema.TRIPLES`` columns (minus lineage), so a
parsed vocabulary drops straight into the broadcast side-table stages
(``stages/broadcast.py``) or the materialize exchange.

Scale shape: one file parses inside one ``map_batches`` task
(vocabularies are small side inputs — the 100 TB path is the parquet
triple interchange, not Turtle).
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
XSD = "http://www.w3.org/2001/XMLSchema#"

__all__ = ["TurtleParseError", "parse_turtle", "turtle_table",
           "parse_ntriples"]


class TurtleParseError(Exception):
    pass


_TOKEN = re.compile(r"""
      (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<string>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"
               |'''(?:[^'\\]|\\.|'(?!''))*'''
               |"(?:[^"\\\n]|\\.)*"
               |'(?:[^'\\\n]|\\.)*')
    | (?P<prefix_dir>@prefix\b|@base\b|(?i:PREFIX|BASE)\b)
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<blank>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
    | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<boolean>true\b|false\b)
    | (?P<dtype>\^\^)
    | (?P<pname>(?:[A-Za-z0-9_][A-Za-z0-9_.-]*)?:
        (?:[A-Za-z0-9_:%\\-]|\.(?![\s.;,)\]]))*)
    | (?P<punct>[.;,\[\]()])
    | (?P<a>a(?=[\s<\[_]))
    | (?P<ws>\s+)
""", re.X)

_STR_ESC = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\x0c",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    def sub(m):
        g = m.group(1)
        if g[0] in "uU":
            return chr(int(g[1:], 16))
        return _STR_ESC.get(g, g)
    return re.sub(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", sub, s)


class _Parser:
    def __init__(self, text: str, base: str | None):
        self.toks: list = []
        pos = 0
        while pos < len(text):
            m = _TOKEN.match(text, pos)
            if not m:
                raise TurtleParseError("bad syntax at %r" %
                                       text[pos:pos + 30])
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            self.toks.append((kind, m.group(0)))
        self.i = 0
        self.base = base or ""
        self.prefixes: dict = {}
        self.bnode_n = 0
        self.rows: list = []

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, value):
        kind, tok = self.next()
        if tok != value:
            raise TurtleParseError("expected %r, got %r" % (value, tok))

    def fresh_bnode(self) -> str:
        self.bnode_n += 1
        return "_:b%d" % self.bnode_n

    def resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri
        if iri.startswith("#") or not iri:
            return self.base + iri
        # minimal relative resolution against @base
        return re.sub(r"[^/]*$", "", self.base) + iri

    def resolve_pname(self, tok: str) -> str:
        pfx, _, local = tok.partition(":")
        if pfx not in self.prefixes:
            raise TurtleParseError("undefined prefix %r" % pfx)
        local = re.sub(r"\\(.)", r"\1", local)
        return self.prefixes[pfx] + local

    # --- grammar ---

    def parse(self):
        while self.peek()[0] is not None:
            kind, tok = self.peek()
            if kind == "prefix_dir":
                self.directive()
            else:
                self.triples()
                self.expect(".")
        return self.rows

    def directive(self):
        _, d = self.next()
        dl = d.lower().lstrip("@")
        if dl == "prefix":
            _, pname = self.next()
            if not pname.endswith(":"):
                raise TurtleParseError("bad prefix decl %r" % pname)
            kind, iri = self.next()
            self.prefixes[pname[:-1]] = self.resolve_iri(iri)
        elif dl == "base":
            kind, iri = self.next()
            self.base = self.resolve_iri(iri)
        if d.startswith("@"):
            self.expect(".")

    def triples(self):
        kind, tok = self.peek()
        if tok == "[":
            subj = self.bnode_property_list()
            if self.peek()[1] != ".":
                self.predicate_object_list(subj)
        else:
            subj = self.subject()
            self.predicate_object_list(subj)

    def subject(self) -> str:
        kind, tok = self.next()
        if kind == "iriref":
            return self.resolve_iri(tok)
        if kind == "pname":
            return self.resolve_pname(tok)
        if kind == "blank":
            return tok
        if tok == "(":
            return self.collection(consumed=True)
        raise TurtleParseError("bad subject %r" % tok)

    def predicate_object_list(self, subj: str):
        while True:
            kind, tok = self.next()
            if kind == "a":
                pred = RDF_TYPE
            elif kind == "iriref":
                pred = self.resolve_iri(tok)
            elif kind == "pname":
                pred = self.resolve_pname(tok)
            else:
                raise TurtleParseError("bad predicate %r" % tok)
            while True:
                self.object(subj, pred)
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
            if self.peek()[1] == ";":
                self.next()
                # trailing ; before . is legal
                if self.peek()[1] in (".", "]", None):
                    break
                continue
            break

    def object(self, subj: str, pred: str):
        kind, tok = self.peek()
        if tok == "[":
            b = self.bnode_property_list()
            self.emit(subj, pred, "bnode", b)
            return
        if tok == "(":
            self.next()
            head = self.collection(consumed=True)
            ot = "uri" if head == RDF_NIL else "bnode"
            self.emit(subj, pred, ot, head)
            return
        self.next()
        if kind == "iriref":
            self.emit(subj, pred, "uri", self.resolve_iri(tok))
        elif kind == "pname":
            self.emit(subj, pred, "uri", self.resolve_pname(tok))
        elif kind == "blank":
            self.emit(subj, pred, "bnode", tok)
        elif kind == "string":
            q = 3 if tok[:3] in ('"""', "'''") else 1
            value = _unescape(tok[q:-q])
            lang = dtype = None
            k2, t2 = self.peek()
            if k2 == "langtag":
                self.next()
                lang = t2[1:]
            elif k2 == "dtype":
                self.next()
                k3, t3 = self.next()
                dtype = self.resolve_iri(t3) if k3 == "iriref" \
                    else self.resolve_pname(t3)
            self.emit(subj, pred, "literal", value, lang, dtype)
        elif kind == "integer":
            self.emit(subj, pred, "literal", tok, None, XSD + "integer")
        elif kind == "decimal":
            self.emit(subj, pred, "literal", tok, None, XSD + "decimal")
        elif kind == "double":
            self.emit(subj, pred, "literal", tok, None, XSD + "double")
        elif kind == "boolean":
            self.emit(subj, pred, "literal", tok, None, XSD + "boolean")
        else:
            raise TurtleParseError("bad object %r" % tok)

    def bnode_property_list(self) -> str:
        self.expect("[")
        b = self.fresh_bnode()
        if self.peek()[1] != "]":
            self.predicate_object_list(b)
        self.expect("]")
        return b

    def collection(self, consumed: bool = False) -> str:
        if not consumed:
            self.expect("(")
        items = []
        while self.peek()[1] != ")":
            node = self.fresh_bnode()
            items.append(node)
            self.object(node, RDF_FIRST)
        self.next()  # ")"
        if not items:
            return RDF_NIL
        for k, node in enumerate(items):
            nxt = items[k + 1] if k + 1 < len(items) else None
            if nxt is not None:
                self.emit(node, RDF_REST, "bnode", nxt)
            else:
                self.emit(node, RDF_REST, "uri", RDF_NIL)
        return items[0]

    def emit(self, subj, pred, obj_type, obj_value,
             obj_lang=None, obj_datatype=None):
        self.rows.append({
            "subj": subj, "pred": pred, "obj_type": obj_type,
            "obj_value": obj_value, "obj_lang": obj_lang,
            "obj_datatype": obj_datatype,
        })


def parse_turtle(text: str | bytes, base: str | None = None) -> list:
    """Turtle document → list of triple-row dicts
    (``schema.TRIPLES`` columns minus graph/lineage)."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    return _Parser(text, base).parse()


_NT = re.compile(
    r'^(?P<s><[^>]*>|_:\S+)\s+(?P<p><[^>]*>)\s+'
    r'(?P<o><[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
    r'(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)\s*\.\s*$')


def parse_ntriples(text: str | bytes) -> list:
    """N-Triples lines → triple-row dicts (the engine's own ``.nt``
    dump format reads back losslessly)."""
    if isinstance(text, bytes):
        text = text.decode("utf-8")
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT.match(line)
        if not m:
            raise TurtleParseError("bad N-Triples line %r" % line[:60])
        s, p, o = m.group("s"), m.group("p"), m.group("o")
        subj = s[1:-1] if s.startswith("<") else s
        pred = p[1:-1]
        if o.startswith("<"):
            rows.append({"subj": subj, "pred": pred, "obj_type": "uri",
                         "obj_value": o[1:-1], "obj_lang": None,
                         "obj_datatype": None})
        elif o.startswith("_:"):
            rows.append({"subj": subj, "pred": pred, "obj_type": "bnode",
                         "obj_value": o, "obj_lang": None,
                         "obj_datatype": None})
        else:
            lang = dtype = None
            body = o
            m2 = re.search(r'"\^\^<([^>]*)>$', o)
            m3 = re.search(r'"@([A-Za-z0-9-]+)$', o)
            if m2:
                dtype = m2.group(1)
                body = o[:m2.start() + 1]
            elif m3:
                lang = m3.group(1)
                body = o[:m3.start() + 1]
            rows.append({"subj": subj, "pred": pred,
                         "obj_type": "literal",
                         "obj_value": _unescape(body[1:-1]),
                         "obj_lang": lang, "obj_datatype": dtype})
    return rows


def to_nt_line(row: dict) -> str:
    """Triple-row dict → one N-Triples line (inverse of
    :func:`parse_ntriples`; bnode values keep their ``_:`` label)."""
    def term_s(v):
        return v if v.startswith("_:") else "<%s>" % v

    def esc(s):
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\r", "\\r")
                 .replace("\t", "\\t"))

    if row["obj_type"] == "uri":
        o = "<%s>" % row["obj_value"]
    elif row["obj_type"] == "bnode":
        o = row["obj_value"]
    else:
        o = '"%s"' % esc(row["obj_value"])
        if row.get("obj_lang"):
            o += "@%s" % row["obj_lang"]
        elif row.get("obj_datatype"):
            o += "^^<%s>" % row["obj_datatype"]
    return "%s <%s> %s ." % (term_s(row["subj"]), row["pred"], o)


def turtle_table(texts, graph: str | None = None):
    """One or many Turtle documents → Arrow table in the TRIPLES
    layout (graph constant, lineage empty) — ready for ``ray.put``
    broadcast or ``ray.data.from_arrow``."""
    import pyarrow as pa

    if isinstance(texts, (str, bytes)):
        texts = [texts]
    rows = []
    for t in texts:
        rows.extend(parse_turtle(t))
    cols = {
        "subj": pa.array([r["subj"] for r in rows], pa.string()),
        "pred": pa.array([r["pred"] for r in rows], pa.string()),
        "obj_type": pa.array([r["obj_type"] for r in rows], pa.string()),
        "obj_value": pa.array([r["obj_value"] for r in rows],
                              pa.large_string()),
        "obj_lang": pa.array([r["obj_lang"] for r in rows], pa.string()),
        "obj_datatype": pa.array([r["obj_datatype"] for r in rows],
                                 pa.string()),
        "graph": pa.array([graph] * len(rows), pa.string()),
    }
    return pa.table(cols)
