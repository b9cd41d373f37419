"""XPath 1.0 subset evaluator over a parent-linked DOM.

Support layer for the pure-Python XSLT engine
(:mod:`ferenda_ray.stages.xslt`), which re-implements the reference's
primary presentation path (``ferenda/transformer.py:196-330`` drives
``res/xsl/*.xsl`` through lxml.etree.XSLT; lxml is absent in this
environment, so both the XPath and XSLT layers are built from scratch
on ``xml.etree`` input).  The grammar and the function library cover
exactly what the reference stylesheet corpus uses (verified by
feature inventory over ``ferenda/res/xsl``): location paths on the
child / attribute / descendant / parent / ancestor /
self / following-sibling / preceding-sibling axes, predicates, unions,
the boolean/equality/relational/arithmetic operator ladder, variable
references, and the core function library plus ``key()``,
``generate-id()``, ``document()`` and EXSLT ``node-set()``.

Everything here is engine-side (driver or actor) string/tree work —
it is deliberately Ray-free; the Ray-side plumbing lives in
``stages/transformer.py`` (actor-pool ``transform_stage``).
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET


class XPathError(Exception):
    pass


# ---------------------------------------------------------------------------
# Node model: a tiny parent-linked DOM (xml.etree has no parent pointers,
# no document node, and folds text into .text/.tail — XPath needs all three).

DOCUMENT, ELEMENT, TEXT, ATTRIBUTE, COMMENT, PI = range(6)


class Node:
    __slots__ = ("kind", "name", "attrs", "text", "parent", "children",
                 "order", "nsmap")

    def __init__(self, kind, name=None, text=None, parent=None, nsmap=None):
        self.kind = kind
        self.name = name          # '{uri}local' for elements/attributes
        self.attrs = {}           # element only: name -> Node(ATTRIBUTE)
        self.text = text          # TEXT/COMMENT/ATTRIBUTE value; PI content
        self.parent = parent
        self.children = []
        self.order = 0            # document order (assigned by build)
        self.nsmap = nsmap        # elements: in-scope prefix -> uri

    # -- naming helpers -----------------------------------------------------
    @property
    def local_name(self):
        if self.name is None:
            return ""
        return self.name.rsplit("}", 1)[-1]

    @property
    def namespace_uri(self):
        if self.name and self.name.startswith("{"):
            return self.name[1:self.name.index("}")]
        return ""

    def string_value(self):
        if self.kind in (TEXT, COMMENT, ATTRIBUTE, PI):
            return self.text or ""
        out = []
        stack = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if n.kind == TEXT:
                out.append(n.text or "")
            elif n.kind == ELEMENT:
                stack.extend(reversed(n.children))
        return "".join(out)

    def attribute_nodes(self):
        return list(self.attrs.values())

    def __repr__(self):                      # pragma: no cover - debug aid
        k = "DETACP"[self.kind]
        return f"<Node {k} {self.name or self.text!r} @{self.order}>"


def _assign_order(root: Node):
    i = 0
    stack = [root]
    while stack:
        n = stack.pop()
        n.order = i
        i += 1
        for a in n.attrs.values():
            a.order = i
            i += 1
        stack.extend(reversed(n.children))


def build_tree(source, nsmap_events=None) -> Node:
    """Parse XML text (or wrap an ``ET.Element``) into a parent-linked
    :class:`Node` document.

    Text parses run in two phases: a pull-parse replays ``start-ns``
    events to record each element's in-scope prefix map (needed to
    resolve prefixed names in stylesheet XPath expressions; a plain
    ``fromstring`` discards prefixes), then a ``TreeBuilder`` parse
    with comments/PIs preserved builds the structure — text/tail are
    only final on completed elements, so the structural walk cannot
    ride the pull events themselves."""
    if isinstance(source, Node):
        return source
    if isinstance(source, ET.Element):
        doc = Node(DOCUMENT)
        _convert(source, doc, {})
        _assign_order(doc)
        return doc
    # phase 1: per-element namespace scopes, in element document order
    pull = ET.XMLPullParser(events=("start", "end", "start-ns"))
    scopes = []
    ns_stack = [{}]
    pending_ns = []
    try:
        pull.feed(source)
        pull.close()
        for ev, payload in pull.read_events():
            if ev == "start-ns":
                pending_ns.append(payload)
            elif ev == "start":
                scope = dict(ns_stack[-1])
                scope.update(pending_ns)
                pending_ns = []
                ns_stack.append(scope)
                scopes.append(scope)
            else:
                ns_stack.pop()
    except ET.ParseError as e:
        raise XPathError(f"XML parse error: {e}") from e
    # phase 2: full structure (comments + PIs preserved)
    parser = ET.XMLParser(target=ET.TreeBuilder(insert_comments=True,
                                                insert_pis=True))
    root = ET.fromstring(source, parser=parser)
    doc = Node(DOCUMENT)
    it = iter(scopes)
    _convert(root, doc, {}, scope_iter=it)
    _assign_order(doc)
    return doc


def _convert(el: ET.Element, parent: Node, nsmap, scope_iter=None):
    if scope_iter is not None:
        nsmap = next(scope_iter, nsmap)
    n = Node(ELEMENT, el.tag, parent=parent, nsmap=nsmap)
    for k, v in el.attrib.items():
        n.attrs[k] = Node(ATTRIBUTE, k, text=v, parent=n)
    parent.children.append(n)
    if el.text:
        n.children.append(Node(TEXT, text=el.text, parent=n))
    for c in el:
        if c.tag is ET.Comment:
            n.children.append(Node(COMMENT, text=c.text or "", parent=n))
        elif c.tag is ET.ProcessingInstruction:
            pi_target, _, pi_text = (c.text or "").partition(" ")
            n.children.append(Node(PI, name=pi_target, text=pi_text,
                                   parent=n))
        else:
            _convert(c, n, nsmap, scope_iter=scope_iter)
        if c.tail:
            n.children.append(Node(TEXT, text=c.tail, parent=n))


# ---------------------------------------------------------------------------
# Lexer

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<number>\d+(?:\.\d*)?|\.\d+)
    | (?P<literal>"[^"]*"|'[^']*')
    | (?P<var>\$[\w.-]+(?::[\w.-]+)?)
    | (?P<dslash>//)
    | (?P<dcolon>::)
    | (?P<ddot>\.\.)
    | (?P<op><=|>=|!=|[=<>|+\-*/,@\[\]().])
    | (?P<name>[\w-]+(?::\*|:[\w.-]+)?|\*)
    )""", re.VERBOSE)


def _lex(expr: str):
    tokens = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m or m.end() == m.start():
            if expr[pos:].strip() == "":
                break
            raise XPathError(f"cannot tokenize {expr!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        tokens.append((kind, val))
    tokens.append(("eof", ""))
    return tokens


# ---------------------------------------------------------------------------
# Parser → AST (tuples).  Shapes:
#   ('path', absolute: bool, steps)           step = (axis, nodetest, preds)
#   ('filter', primary, preds, steps)         primary expr with trailing path
#   ('union', a, b) ('or', a, b) ('and', a, b)
#   ('=', a, b) ('!=',) ('<',) ... ('+',) ('-',) ('*',) ('div',) ('mod',)
#   ('neg', a) ('num', f) ('str', s) ('var', name) ('call', name, args)

_NODE_TYPES = {"node", "text", "comment", "processing-instruction"}


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise XPathError(f"expected {val!r}, got {v!r}")

    # expression ladder ----------------------------------------------------
    def parse(self):
        e = self.or_expr()
        if self.peek()[0] != "eof":
            raise XPathError(f"trailing tokens at {self.peek()!r}")
        return e

    def or_expr(self):
        e = self.and_expr()
        while self.peek() == ("name", "or"):
            self.next()
            e = ("or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.equality_expr()
        while self.peek() == ("name", "and"):
            self.next()
            e = ("and", e, self.equality_expr())
        return e

    def equality_expr(self):
        e = self.relational_expr()
        while self.peek()[1] in ("=", "!=") and self.peek()[0] == "op":
            op = self.next()[1]
            e = (op, e, self.relational_expr())
        return e

    def relational_expr(self):
        e = self.additive_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("<", ">",
                                                            "<=", ">="):
            op = self.next()[1]
            e = (op, e, self.additive_expr())
        return e

    def additive_expr(self):
        e = self.multiplicative_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = (op, e, self.multiplicative_expr())
        return e

    def multiplicative_expr(self):
        e = self.unary_expr()
        while ((self.peek()[0] == "op" and self.peek()[1] == "*")
               or self.peek() in (("name", "div"), ("name", "mod"))):
            op = self.next()[1]
            e = (op, e, self.unary_expr())
        return e

    def unary_expr(self):
        if self.peek() == ("op", "-"):
            self.next()
            return ("neg", self.unary_expr())
        return self.union_expr()

    def union_expr(self):
        e = self.path_expr()
        while self.peek() == ("op", "|"):
            self.next()
            e = ("union", e, self.path_expr())
        return e

    # paths ------------------------------------------------------------
    def path_expr(self):
        k, v = self.peek()
        # primary expressions that may be followed by a path
        if (k in ("number", "literal", "var")
                or (k == "op" and v == "(")
                or (k == "name" and self.peek(1) == ("op", "(")
                    and v not in _NODE_TYPES)):
            prim = self.primary_expr()
            preds = self.predicates()
            steps = []
            if self.peek()[1] in ("/", "//"):
                steps = self.relative_path_steps()
            if preds or steps:
                return ("filter", prim, preds, steps)
            return prim
        return self.location_path()

    def primary_expr(self):
        k, v = self.next()
        if k == "number":
            return ("num", float(v))
        if k == "literal":
            return ("str", v[1:-1])
        if k == "var":
            return ("var", v[1:])
        if k == "op" and v == "(":
            e = self.or_expr()
            self.expect(")")
            return e
        if k == "name":                       # function call
            self.expect("(")
            args = []
            if self.peek() != ("op", ")"):
                args.append(self.or_expr())
                while self.peek() == ("op", ","):
                    self.next()
                    args.append(self.or_expr())
            self.expect(")")
            return ("call", v, args)
        raise XPathError(f"unexpected token {v!r}")

    def predicates(self):
        preds = []
        while self.peek() == ("op", "["):
            self.next()
            preds.append(self.or_expr())
            self.expect("]")
        return preds

    def location_path(self):
        k, v = self.peek()
        if v == "/":
            self.next()
            if self.peek()[0] in ("name", "ddot") or self.peek()[1] in (
                    ".", "@", "*"):
                return ("path", True, self.relative_steps())
            return ("path", True, [])
        if v == "//":
            self.next()
            steps = [("descendant-or-self", ("node",), [])]
            steps.extend(self.relative_steps())
            return ("path", True, steps)
        return ("path", False, self.relative_steps())

    def relative_path_steps(self):
        """Steps following a filter expr ('/' or '//' already pending)."""
        steps = []
        while self.peek()[1] in ("/", "//"):
            _, sep = self.next()
            if sep == "//":
                steps.append(("descendant-or-self", ("node",), []))
            steps.append(self.step())
        return steps

    def relative_steps(self):
        steps = [self.step()]
        while self.peek()[1] in ("/", "//"):
            _, sep = self.next()
            if sep == "//":
                steps.append(("descendant-or-self", ("node",), []))
            steps.append(self.step())
        return steps

    def step(self):
        k, v = self.peek()
        if k == "ddot":
            self.next()
            return ("parent", ("node",), [])
        if v == ".":
            self.next()
            return ("self", ("node",), [])
        axis = "child"
        if v == "@":
            self.next()
            axis = "attribute"
        elif k == "name" and self.peek(1)[0] == "dcolon":
            axis = self.next()[1]
            self.next()
        nodetest = self.node_test(axis)
        preds = self.predicates()
        return (axis, nodetest, preds)

    def node_test(self, axis):
        k, v = self.next()
        if k == "name" and v in _NODE_TYPES and self.peek() == ("op", "("):
            self.next()
            arg = None
            if self.peek()[0] == "literal":
                arg = self.next()[1][1:-1]
            self.expect(")")
            return (v, arg) if arg is not None else (v,)
        if v == "*":
            return ("name", None, None)
        if k == "name":
            if v.endswith(":*"):
                return ("name", v[:-2], None)
            if ":" in v:
                pfx, local = v.split(":", 1)
                return ("name", pfx, local)
            return ("name", None, v)
        raise XPathError(f"bad node test {v!r}")


def parse(expr: str):
    return _Parser(_lex(expr)).parse()


# ---------------------------------------------------------------------------
# Evaluation

class Context:
    """Evaluation context: current node, position/size, variables,
    namespace prefix map, and the engine hooks XSLT needs
    (``key()``, ``document()``, ``generate-id()`` counters)."""

    __slots__ = ("node", "position", "size", "variables", "nsmap",
                 "functions", "keys", "documents", "root")

    def __init__(self, node, position=1, size=1, variables=None,
                 nsmap=None, functions=None, keys=None, documents=None,
                 root=None):
        self.node = node
        self.position = position
        self.size = size
        # `is None` (not truthiness): an empty ChainMap scope over
        # lazy globals is falsy but must be kept
        self.variables = {} if variables is None else variables
        self.nsmap = nsmap or {}
        self.functions = functions or {}
        self.keys = keys          # XSLT key index: (name) -> {value: nodes}
        self.documents = documents  # XSLT document() loader
        self.root = root or _root_of(node)

    def rebind(self, node, position, size):
        c = Context.__new__(Context)
        c.node = node
        c.position = position
        c.size = size
        c.variables = self.variables
        c.nsmap = self.nsmap
        c.functions = self.functions
        c.keys = self.keys
        c.documents = self.documents
        c.root = self.root
        return c


def _root_of(node):
    while node.parent is not None:
        node = node.parent
    return node


def to_string(v) -> str:
    if isinstance(v, list):
        return v[0].string_value() if v else ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and not math.isinf(v):
            return str(int(v))
        return repr(v)
    return str(v)


def to_number(v) -> float:
    if isinstance(v, list):
        v = to_string(v)
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, float):
        return v
    try:
        return float(str(v).strip())
    except ValueError:
        return float("nan")


def to_boolean(v) -> bool:
    if isinstance(v, list):
        return bool(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return bool(v) and not math.isnan(v)
    return bool(str(v))


def _docsort(nodes):
    seen = {}
    for n in nodes:
        seen[id(n)] = n
    return sorted(seen.values(), key=lambda n: n.order)


def evaluate(expr, ctx: Context):
    if isinstance(expr, str):
        expr = parse(expr)
    return _eval(expr, ctx)


def _eval(ast, ctx):
    op = ast[0]
    if op == "num":
        return ast[1]
    if op == "str":
        return ast[1]
    if op == "var":
        name = ast[1]
        try:                  # KeyError (not `in`) so lazy-global
            return ctx.variables[name]      # mappings can materialize
        except KeyError:
            raise XPathError(f"unbound variable ${name}") from None
    if op == "path":
        return _eval_path(ast, ctx)
    if op == "filter":
        v = _eval(ast[1], ctx)
        if ast[2] or ast[3]:
            if not isinstance(v, list):
                raise XPathError("predicates/steps on a non-node-set")
            nodes = _apply_predicates(v, ast[2], ctx)
            for step in ast[3]:
                nodes = _eval_step(nodes, step, ctx)
            return nodes
        return v
    if op == "union":
        a, b = _eval(ast[1], ctx), _eval(ast[2], ctx)
        if not isinstance(a, list) or not isinstance(b, list):
            raise XPathError("union of non-node-sets")
        return _docsort(a + b)
    if op == "or":
        return to_boolean(_eval(ast[1], ctx)) or to_boolean(
            _eval(ast[2], ctx))
    if op == "and":
        return to_boolean(_eval(ast[1], ctx)) and to_boolean(
            _eval(ast[2], ctx))
    if op in ("=", "!="):
        return _compare_eq(op, _eval(ast[1], ctx), _eval(ast[2], ctx))
    if op in ("<", ">", "<=", ">="):
        return _compare_rel(op, _eval(ast[1], ctx), _eval(ast[2], ctx))
    if op in ("+", "-", "*", "div", "mod"):
        a = to_number(_eval(ast[1], ctx))
        b = to_number(_eval(ast[2], ctx))
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "div":
            try:
                return a / b
            except ZeroDivisionError:
                if a == 0:
                    return float("nan")
                return math.copysign(float("inf"), a)
        return math.fmod(a, b)
    if op == "neg":
        return -to_number(_eval(ast[1], ctx))
    if op == "call":
        return _call(ast[1], ast[2], ctx)
    raise XPathError(f"unknown AST op {op!r}")


def _compare_eq(op, a, b):
    neg = op == "!="
    if isinstance(a, list) and isinstance(b, list):
        avs = [n.string_value() for n in a]
        bvs = {n.string_value() for n in b}
        if neg:        # exists a pair with different string-values
            return any(x != y for x in avs for y in bvs)
        return any(x in bvs for x in avs)
    if isinstance(a, list) or isinstance(b, list):
        nodes, other = (a, b) if isinstance(a, list) else (b, a)
        if isinstance(other, bool):
            r = to_boolean(nodes) == other
            return r != neg
        if isinstance(other, float):
            r = any(to_number(n.string_value()) == other for n in nodes)
            if neg:
                return any(to_number(n.string_value()) != other
                           for n in nodes)
            return r
        r = any(n.string_value() == str(other) for n in nodes)
        if neg:
            return any(n.string_value() != str(other) for n in nodes)
        return r
    if isinstance(a, bool) or isinstance(b, bool):
        r = to_boolean(a) == to_boolean(b)
    elif isinstance(a, float) or isinstance(b, float):
        r = to_number(a) == to_number(b)
    else:
        r = str(a) == str(b)
    return r != neg


def _compare_rel(op, a, b):
    def cmp(x, y):
        if op == "<":
            return x < y
        if op == ">":
            return x > y
        if op == "<=":
            return x <= y
        return x >= y
    if isinstance(a, list) and isinstance(b, list):
        return any(cmp(to_number(m.string_value()),
                       to_number(n.string_value()))
                   for m in a for n in b)
    if isinstance(a, list):
        return any(cmp(to_number(n.string_value()), to_number(b))
                   for n in a)
    if isinstance(b, list):
        return any(cmp(to_number(a), to_number(n.string_value()))
                   for n in b)
    return cmp(to_number(a), to_number(b))


# -- axes -------------------------------------------------------------------

def _axis_nodes(node, axis):
    if axis == "child":
        return list(node.children)
    if axis == "attribute":
        return node.attribute_nodes() if node.kind == ELEMENT else []
    if axis == "self":
        return [node]
    if axis == "parent":
        return [node.parent] if node.parent is not None else []
    if axis == "ancestor":
        out = []
        p = node.parent
        while p is not None:
            out.append(p)
            p = p.parent
        return out
    if axis == "ancestor-or-self":
        out = [node]
        p = node.parent
        while p is not None:
            out.append(p)
            p = p.parent
        return out
    if axis in ("descendant", "descendant-or-self"):
        out = [node] if axis == "descendant-or-self" else []
        stack = list(reversed(node.children))
        while stack:
            n = stack.pop()
            out.append(n)
            stack.extend(reversed(n.children))
        return out
    if axis == "namespace":
        # synthesized from the element's in-scope prefix map; exposed
        # as xmlns[:pfx] attribute nodes (enough for the corpus's
        # ``//*/namespace::*`` copy-of idiom)
        if node.kind != ELEMENT or not node.nsmap:
            return []
        out = []
        for pfx, uri in sorted(node.nsmap.items()):
            name = f"xmlns:{pfx}" if pfx else "xmlns"
            a = Node(ATTRIBUTE, name, text=uri, parent=node)
            a.order = node.order
            out.append(a)
        return out
    if axis in ("following-sibling", "preceding-sibling"):
        if node.parent is None or node.kind == ATTRIBUTE:
            return []
        sibs = node.parent.children
        idx = next((i for i, s in enumerate(sibs) if s is node), None)
        if idx is None:
            return []
        if axis == "following-sibling":
            return sibs[idx + 1:]
        return list(reversed(sibs[:idx]))
    raise XPathError(f"unsupported axis {axis!r}")

def _node_test_match(node, test, ctx, axis):
    kind = test[0]
    if kind == "node":
        return True
    if kind == "text":
        return node.kind == TEXT
    if kind == "comment":
        return node.kind == COMMENT
    if kind == "processing-instruction":
        return node.kind == PI and (len(test) == 1 or node.name == test[1])
    # name test
    _, pfx, local = test
    want_kind = (ATTRIBUTE if axis in ("attribute", "namespace")
                 else ELEMENT)
    if node.kind != want_kind:
        return False
    if pfx is None and local is None:        # '*'
        return True
    uri = ""
    if pfx is not None:
        if pfx == "xml":                 # implicitly bound per the spec
            uri = "http://www.w3.org/XML/1998/namespace"
        elif pfx not in ctx.nsmap:
            raise XPathError(f"undeclared namespace prefix {pfx!r}")
        else:
            uri = ctx.nsmap[pfx]
    if local is None:                        # 'pfx:*'
        return node.namespace_uri == uri
    if pfx is None:
        # default namespace is NOT applied to name tests in XPath 1.0
        return node.name == local
    return node.local_name == local and node.namespace_uri == uri


def _eval_path(ast, ctx):
    _, absolute, steps = ast
    nodes = [ctx.root] if absolute else [ctx.node]
    for step in steps:
        nodes = _eval_step(nodes, step, ctx)
    return nodes


def _eval_step(nodes, step, ctx):
    axis, test, preds = step
    out = []
    for node in nodes:
        cand = [n for n in _axis_nodes(node, axis)
                if _node_test_match(n, test, ctx, axis)]
        for pred in preds:
            kept = []
            size = len(cand)
            for i, n in enumerate(cand):
                sub = ctx.rebind(n, i + 1, size)
                v = _eval(pred, sub)
                if isinstance(v, float):
                    if v == i + 1:
                        kept.append(n)
                elif to_boolean(v):
                    kept.append(n)
            cand = kept
        out.extend(cand)
    return _docsort(out)


def _apply_predicates(nodes, preds, ctx):
    cand = list(nodes)
    for pred in preds:
        kept = []
        size = len(cand)
        for i, n in enumerate(cand):
            sub = ctx.rebind(n, i + 1, size)
            v = _eval(pred, sub)
            if isinstance(v, float):
                if v == i + 1:
                    kept.append(n)
            elif to_boolean(v):
                kept.append(n)
        cand = kept
    return cand


# -- function library ---------------------------------------------------------

def _call(name, args, ctx):
    # engine-supplied functions (key/document/generate-id with a
    # run-scoped registry, EXSLT node-set) take precedence
    f = ctx.functions.get(name) or _FUNCTIONS.get(name)
    if f is None:
        raise XPathError(f"unknown function {name}()")
    return f(ctx, *[_eval(a, ctx) for a in args])


def _fn_last(ctx):
    return float(ctx.size)


def _fn_position(ctx):
    return float(ctx.position)


def _fn_count(ctx, ns):
    if not isinstance(ns, list):
        raise XPathError("count() needs a node-set")
    return float(len(ns))


def _fn_local_name(ctx, ns=None):
    n = _first(ctx, ns)
    return n.local_name if n is not None else ""


def _fn_namespace_uri(ctx, ns=None):
    n = _first(ctx, ns)
    return n.namespace_uri if n is not None else ""


def _fn_name(ctx, ns=None):
    n = _first(ctx, ns)
    if n is None:
        return ""
    uri = n.namespace_uri
    if not uri:
        return n.local_name
    nm = n.nsmap if n.kind == ELEMENT else (
        n.parent.nsmap if n.parent is not None else None)
    for pfx, u in (nm or {}).items():
        if u == uri and pfx:
            return f"{pfx}:{n.local_name}"
    for pfx, u in ctx.nsmap.items():
        if u == uri and pfx:
            return f"{pfx}:{n.local_name}"
    return n.local_name


def _first(ctx, ns):
    if ns is None:
        return ctx.node
    if not isinstance(ns, list):
        raise XPathError("expected a node-set")
    return ns[0] if ns else None


def _fn_string(ctx, v=None):
    return to_string(v if v is not None else [ctx.node])


def _fn_concat(ctx, *args):
    return "".join(to_string(a) for a in args)


def _fn_starts_with(ctx, a, b):
    return to_string(a).startswith(to_string(b))


def _fn_contains(ctx, a, b):
    return to_string(b) in to_string(a)


def _fn_substring_before(ctx, a, b):
    s, sub = to_string(a), to_string(b)
    i = s.find(sub)
    return s[:i] if i >= 0 else ""


def _fn_substring_after(ctx, a, b):
    s, sub = to_string(a), to_string(b)
    i = s.find(sub)
    return s[i + len(sub):] if i >= 0 else ""


def _fn_substring(ctx, s, start, length=None):
    s = to_string(s)
    start = to_number(start)
    if math.isnan(start):
        return ""
    if not math.isinf(start):                   # round(±inf) is ±inf
        start = math.floor(start + 0.5)         # XPath round(), not banker's
    if length is None:
        end = len(s) + 1.0
    else:
        length = to_number(length)
        if math.isnan(length):
            return ""
        if not math.isinf(length):
            length = math.floor(length + 0.5)
        end = start + length                    # -inf + inf → nan → ""
        if math.isnan(end):
            return ""
    # XPath is 1-based and allows out-of-range starts
    return "".join(c for i, c in enumerate(s, start=1)
                   if start <= i < end)


def _fn_string_length(ctx, s=None):
    return float(len(to_string(s if s is not None else [ctx.node])))


def _fn_normalize_space(ctx, s=None):
    return " ".join(to_string(
        s if s is not None else [ctx.node]).split())


def _fn_translate(ctx, s, frm, to):
    s, frm, to = to_string(s), to_string(frm), to_string(to)
    table = {}
    for i, c in enumerate(frm):
        # XPath 1.0 §4.2: the FIRST occurrence of a repeated character
        # in the from-string wins (str.maketrans would take the last).
        if ord(c) not in table:
            table[ord(c)] = to[i] if i < len(to) else None
    return s.translate(table)


def _fn_boolean(ctx, v):
    return to_boolean(v)


def _fn_not(ctx, v):
    return not to_boolean(v)


def _fn_true(ctx):
    return True


def _fn_false(ctx):
    return False


def _fn_number(ctx, v=None):
    return to_number(v if v is not None else [ctx.node])


def _fn_sum(ctx, ns):
    if not isinstance(ns, list):
        raise XPathError("sum() needs a node-set")
    return float(sum(to_number(n.string_value()) for n in ns))


def _fn_floor(ctx, v):
    return float(math.floor(to_number(v)))


def _fn_ceiling(ctx, v):
    return float(math.ceil(to_number(v)))


def _fn_round(ctx, v):
    n = to_number(v)
    if math.isnan(n) or math.isinf(n):
        return n
    return float(math.floor(n + 0.5))


def _fn_lang(ctx, v):
    want = to_string(v).lower()
    n = ctx.node
    while n is not None:
        if n.kind == ELEMENT:
            lang = n.attrs.get(
                "{http://www.w3.org/XML/1998/namespace}lang")
            if lang is not None:
                have = (lang.text or "").lower()
                return have == want or have.startswith(want + "-")
        n = n.parent
    return False


def _fn_id(ctx, v):
    # no DTD: match any element whose 'id' attribute is in the token list
    if isinstance(v, list):
        toks = set()
        for n in v:
            toks.update(n.string_value().split())
    else:
        toks = set(to_string(v).split())
    out = []
    stack = [ctx.root]
    while stack:
        n = stack.pop()
        if n.kind == ELEMENT:
            a = n.attrs.get("id")
            if a is not None and a.text in toks:
                out.append(n)
        stack.extend(reversed(n.children))
    return _docsort(out)


def _fn_generate_id(ctx, ns=None):
    n = _first(ctx, ns)
    if n is None:
        return ""
    return f"N{_root_of(n).order}x{n.order}"


_FUNCTIONS = {
    "last": _fn_last, "position": _fn_position, "count": _fn_count,
    "local-name": _fn_local_name, "namespace-uri": _fn_namespace_uri,
    "name": _fn_name, "string": _fn_string, "concat": _fn_concat,
    "starts-with": _fn_starts_with, "contains": _fn_contains,
    "substring-before": _fn_substring_before,
    "substring-after": _fn_substring_after, "substring": _fn_substring,
    "string-length": _fn_string_length,
    "normalize-space": _fn_normalize_space, "translate": _fn_translate,
    "boolean": _fn_boolean, "not": _fn_not, "true": _fn_true,
    "false": _fn_false, "number": _fn_number, "sum": _fn_sum,
    "floor": _fn_floor, "ceiling": _fn_ceiling, "round": _fn_round,
    "lang": _fn_lang, "id": _fn_id, "generate-id": _fn_generate_id,
}
