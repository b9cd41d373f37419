"""Pure-Python XSLT 1.0 subset — the reference's presentation engine.

The reference drives ``res/xsl/*.xsl`` through ``lxml.etree.XSLT``
(``ferenda/transformer.py:196-330``: template-dir setup, string
params, ``document()``-passed config/annotation files).  lxml is
absent in this environment, so this module implements the XSLT 1.0
subset that stylesheet corpus actually uses (feature inventory over
``ferenda/res/xsl``), on top of :mod:`ferenda_ray.xpath`:

* instructions — ``template`` (match/name/mode/priority),
  ``apply-templates`` (select/mode/sort/with-param),
  ``call-template``, ``value-of`` (incl.
  ``disable-output-escaping``), ``copy-of``, ``copy``, ``for-each``
  (with ``sort``), ``if``, ``choose/when/otherwise``,
  ``variable/param/with-param``, ``element``, ``attribute``,
  ``text``, ``comment``, ``message``;
* top level — ``include`` / ``import`` (with import precedence),
  global ``param`` / ``variable`` (lazy, forward-reference safe),
  ``key``, ``output`` (method html/xml/text, ``doctype-system`` /
  ``doctype-public``, ``omit-xml-declaration``),
  ``strip-space elements="*"``;
* functions — ``key()``, ``document()`` (href strings via a
  pluggable loader, cached per run), ``current()``,
  ``generate-id()`` (run-stable across documents), EXSLT
  ``node-set()``;
* attribute value templates (``{expr}`` with ``{{``/``}}`` escapes)
  on literal result elements and ``xsl:element`` / ``xsl:attribute``
  names;
* conflict resolution per spec: import precedence, then priority
  (explicit or default from the pattern shape), then declaration
  order (last wins).

Result tree fragments are represented as single-node node-sets over
a fragment document, so EXSLT ``node-set()`` is natural and string /
boolean conversions follow XSLT 1.0 semantics (a fragment is always
true).

Everything here is engine-side string/tree work — deliberately
Ray-free; the Ray plumbing is ``stages/transformer.py``'s actor-pool
``transform_stage``, which compiles a stylesheet ONCE per actor in
``__init__`` and only applies it per batch.
"""

from __future__ import annotations

import os
import re

from ferenda_ray import xpath as xp
from ferenda_ray.xpath import (ATTRIBUTE, COMMENT, DOCUMENT, ELEMENT, PI,
                               TEXT, Context, Node, XPathError, build_tree,
                               to_boolean, to_string)

XSL_NS = "http://www.w3.org/1999/XSL/Transform"
XML_NS = "http://www.w3.org/XML/1998/namespace"


class XSLTError(Exception):
    pass


def _xsl(local):
    return "{%s}%s" % (XSL_NS, local)


def _is_xsl(node, local=None):
    if node.kind != ELEMENT or not node.name.startswith("{" + XSL_NS + "}"):
        return False
    return local is None or node.local_name == local


# ---------------------------------------------------------------------------
# Attribute value templates

_AVT_RE = re.compile(r"\{\{|\}\}|\{([^{}]*)\}")


def _avt(value, ctx):
    """Expand an attribute value template."""
    if "{" not in value and "}" not in value:
        return value
    out = []
    pos = 0
    for m in _AVT_RE.finditer(value):
        out.append(value[pos:m.start()])
        pos = m.end()
        tok = m.group(0)
        if tok == "{{":
            out.append("{")
        elif tok == "}}":
            out.append("}")
        else:
            out.append(to_string(xp.evaluate(m.group(1), ctx)))
    out.append(value[pos:])
    return "".join(out)


# ---------------------------------------------------------------------------
# Patterns

class Pattern:
    """One alternative of a compiled match pattern."""

    __slots__ = ("absolute", "steps", "priority", "nsmap")

    def __init__(self, absolute, steps, priority, nsmap):
        self.absolute = absolute
        self.steps = steps
        self.priority = priority
        self.nsmap = nsmap

    def matches(self, node, run):
        ctx = run.make_context(node, nsmap=self.nsmap)
        return _match_steps(node, self.absolute, self.steps, ctx)


def compile_pattern(text, nsmap):
    """Compile a match pattern into a list of :class:`Pattern`
    alternatives (top-level ``|`` splits)."""
    ast = xp.parse(text)
    alts = []
    stack = [ast]
    while stack:
        a = stack.pop()
        if a[0] == "union":
            stack.extend((a[1], a[2]))
        else:
            alts.append(a)
    out = []
    for a in alts:
        if a[0] != "path":
            raise XSLTError(f"unsupported match pattern {text!r}")
        _, absolute, steps = a
        out.append(Pattern(absolute, steps,
                           _default_priority(absolute, steps), nsmap))
    return out


def _default_priority(absolute, steps):
    # XSLT 1.0 §5.5 default priorities
    if absolute and not steps:
        return 0.5                       # match="/"
    if len(steps) != 1 or absolute:
        return 0.5
    axis, test, preds = steps[0]
    if preds:
        return 0.5
    if test[0] == "name":
        _, pfx, local = test
        if local is not None:
            return 0.0                   # name or pfx:name
        if pfx is not None:
            return -0.25                 # pfx:*
        return -0.5                      # *
    if test[0] == "processing-instruction" and len(test) == 2:
        return 0.0
    return -0.5                          # node()/text()/comment()


def _match_steps(node, absolute, steps, ctx):
    if not steps:
        return node.kind == DOCUMENT if absolute else True
    if not _step_self_match(node, steps[-1], ctx):
        return False
    rest = steps[:-1]
    if rest and rest[-1][0] == "descendant-or-self":
        rest2 = rest[:-1]
        anc = node.parent
        while anc is not None:
            if _match_steps(anc, absolute, rest2, ctx):
                return True
            anc = anc.parent
        return False
    parent = node.parent
    if not rest:
        return (not absolute) or (parent is not None
                                  and parent.kind == DOCUMENT)
    if parent is None:
        return False
    return _match_steps(parent, absolute, rest, ctx)


def _step_self_match(node, step, ctx):
    axis, test, preds = step
    if axis == "attribute":
        if node.kind != ATTRIBUTE:
            return False
    elif axis in ("child", "descendant-or-self"):
        if node.kind == ATTRIBUTE:
            return False
    else:
        raise XSLTError(f"axis {axis!r} not allowed in a match pattern")
    ax = "attribute" if axis == "attribute" else "child"
    if not xp._node_test_match(node, test, ctx, ax):
        return False
    if preds:
        if node.parent is None:
            sibs = [node]
        else:
            sibs = [n for n in xp._axis_nodes(node.parent, ax)
                    if xp._node_test_match(n, test, ctx, ax)]
        pos = next((i + 1 for i, s in enumerate(sibs) if s is node), 1)
        for pred in preds:
            sub = ctx.rebind(node, pos, len(sibs))
            v = xp._eval(pred, sub)
            if isinstance(v, float):
                if v != pos:
                    return False
            elif not to_boolean(v):
                return False
    return True


# ---------------------------------------------------------------------------
# Stylesheet model

class Template:
    __slots__ = ("pattern", "mode", "name", "precedence", "order", "body",
                 "params", "nsmap")

    def __init__(self, pattern, mode, name, precedence, order, body, params,
                 nsmap):
        self.pattern = pattern       # Pattern or None (named-only)
        self.mode = mode
        self.name = name
        self.precedence = precedence
        self.order = order
        self.body = body             # list of stylesheet Nodes
        self.params = params         # list of xsl:param Nodes
        self.nsmap = nsmap


class _FileLoader:
    def __init__(self, base_dir=None, templates=None):
        self.base_dir = base_dir
        self.templates = templates or {}

    def __call__(self, href):
        if href in self.templates:
            return self.templates[href]
        base = os.path.basename(href)
        if base in self.templates:
            return self.templates[base]
        path = href
        if self.base_dir and not os.path.isabs(href):
            cand = os.path.join(self.base_dir, href)
            if os.path.exists(cand):
                path = cand
        with open(path, encoding="utf-8") as fp:
            return fp.read()


class XSLT:
    """A compiled stylesheet.  ``loader(href) -> source text`` resolves
    ``xsl:include`` / ``xsl:import`` / ``document()``; pass a
    ``templates`` mapping (name → source) and/or a ``base_dir`` for
    filesystem resolution (the analogue of the reference's
    one-temp-dir-for-all-templates setup,
    ``transformer.py:234-240``)."""

    def __init__(self, source, loader=None, base_dir=None,
                 templates=None):
        self.loader = loader or _FileLoader(base_dir, templates)
        self.templates = []
        self.globals = []            # (name, node, nsmap, precedence)
        self.keys = {}               # name -> (patterns, use_ast, nsmap)
        self.output = {}
        self.strip_space_all = False
        self._order = 0
        self._sheet_doc = None       # for document('')
        self._parse_sheet(source, precedence=0)
        # highest precedence first, then priority, then LAST declared
        self.templates.sort(
            key=lambda t: (t.precedence,
                           t.pattern.priority if t.pattern else 0.0,
                           t.order),
            reverse=True)
        self._named = {}
        for t in sorted(self.templates, key=lambda t: (t.precedence,
                                                       t.order)):
            if t.name:
                self._named[t.name] = t

    # -- parsing ----------------------------------------------------------
    def _parse_sheet(self, source, precedence):
        doc = build_tree(source)
        if self._sheet_doc is None:
            self._sheet_doc = doc
        root = next((c for c in doc.children if c.kind == ELEMENT), None)
        if root is None or not _is_xsl(root) or root.local_name not in (
                "stylesheet", "transform"):
            raise XSLTError("not an xsl:stylesheet")
        _strip_stylesheet_space(root)
        # XSLT 1.0 §2.6.2: every import ranks below the importing sheet,
        # and LATER imports have HIGHER precedence than earlier ones —
        # so the i-th of N imports (1-based) gets base - (N - i + 1) slots.
        n_imports = sum(1 for c in root.children
                        if c.kind == ELEMENT and _is_xsl(c)
                        and c.local_name == "import")
        i_import = 0
        for child in root.children:
            if child.kind != ELEMENT:
                continue
            if not _is_xsl(child):
                continue
            kind = child.local_name
            if kind == "import":
                i_import += 1
                self._parse_sheet(
                    self.loader(child.attrs["href"].text),
                    precedence - (n_imports - i_import + 1) * 1000)
            elif kind == "include":
                self._parse_include(child.attrs["href"].text, precedence)
            elif kind == "template":
                self._add_template(child, precedence)
            elif kind in ("param", "variable"):
                self.globals.append(
                    (child.attrs["name"].text, child, child.nsmap,
                     precedence, kind == "param"))
            elif kind == "key":
                self.keys[child.attrs["name"].text] = (
                    compile_pattern(child.attrs["match"].text, child.nsmap),
                    xp.parse(child.attrs["use"].text), child.nsmap)
            elif kind == "output":
                for k, a in child.attrs.items():
                    self.output.setdefault(k, a.text)
            elif kind == "strip-space":
                if child.attrs.get("elements",
                                   Node(ATTRIBUTE, text="")).text == "*":
                    self.strip_space_all = True
            elif kind in ("preserve-space", "namespace-alias",
                          "decimal-format", "attribute-set"):
                pass                     # not used by the corpus
            else:
                raise XSLTError(f"unsupported top-level xsl:{kind}")

    def _parse_include(self, href, precedence):
        """Include = textual merge at the including precedence."""
        doc = build_tree(self.loader(href))
        root = next((c for c in doc.children if c.kind == ELEMENT), None)
        if root is None or not _is_xsl(root):
            raise XSLTError(f"included {href!r} is not a stylesheet")
        _strip_stylesheet_space(root)
        inc_imports = 0
        for child in root.children:
            if child.kind != ELEMENT or not _is_xsl(child):
                continue
            kind = child.local_name
            if kind == "import":
                inc_imports += 1
                self._parse_sheet(self.loader(child.attrs["href"].text),
                                  precedence - inc_imports * 1000 - 500)
            elif kind == "include":
                self._parse_include(child.attrs["href"].text, precedence)
            elif kind == "template":
                self._add_template(child, precedence)
            elif kind in ("param", "variable"):
                self.globals.append(
                    (child.attrs["name"].text, child, child.nsmap,
                     precedence, kind == "param"))
            elif kind == "key":
                self.keys[child.attrs["name"].text] = (
                    compile_pattern(child.attrs["match"].text, child.nsmap),
                    xp.parse(child.attrs["use"].text), child.nsmap)
            elif kind == "output":
                for k, a in child.attrs.items():
                    self.output.setdefault(k, a.text)
            elif kind == "strip-space":
                if child.attrs.get("elements",
                                   Node(ATTRIBUTE, text="")).text == "*":
                    self.strip_space_all = True

    def _add_template(self, el, precedence):
        name = el.attrs.get("name")
        mode = el.attrs.get("mode")
        match = el.attrs.get("match")
        prio = el.attrs.get("priority")
        params = [c for c in el.children if _is_xsl(c, "param")]
        body = [c for c in el.children if not _is_xsl(c, "param")]
        patterns = (compile_pattern(match.text, el.nsmap)
                    if match is not None else [None])
        for pat in patterns:
            if pat is not None and prio is not None:
                pat = Pattern(pat.absolute, pat.steps, float(prio.text),
                              pat.nsmap)
            self.templates.append(Template(
                pat, mode.text if mode is not None else None,
                name.text if name is not None else None,
                precedence, self._order, body, params, el.nsmap))
            self._order += 1

    # -- public API ---------------------------------------------------------
    def transform(self, source, params=None):
        """Apply to an XML string / Node document; returns the result
        tree fragment root (a DOCUMENT Node)."""
        doc = build_tree(source)
        if self.strip_space_all:
            _strip_source_space(doc)
        run = _Run(self, doc, params or {})
        out = Node(DOCUMENT)
        ctx = run.make_context(doc)
        run.apply_templates([doc], None, ctx, {}, out)
        return out

    def transform_text(self, source, params=None) -> str:
        return serialize(self.transform(source, params), self.output)


def _strip_stylesheet_space(root):
    """Remove whitespace-only text nodes from a stylesheet tree,
    except inside ``xsl:text`` or ``xml:space='preserve'`` scopes."""
    def walk(el, preserve):
        sp = el.attrs.get("{%s}space" % XML_NS)
        if sp is not None:
            preserve = sp.text == "preserve"
        if _is_xsl(el, "text"):
            return
        el.children = [
            c for c in el.children
            if not (c.kind == TEXT and not preserve
                    and (c.text or "").strip(" \t\r\n") == "")]
        for c in el.children:
            if c.kind == ELEMENT:
                walk(c, preserve)
    walk(root, False)


def _strip_source_space(doc):
    def walk(el, preserve):
        if el.kind == ELEMENT:
            sp = el.attrs.get("{%s}space" % XML_NS)
            if sp is not None:
                preserve = sp.text == "preserve"
        el.children = [
            c for c in el.children
            if not (c.kind == TEXT and not preserve
                    and (c.text or "").strip(" \t\r\n") == "")]
        for c in el.children:
            if c.kind == ELEMENT:
                walk(c, preserve)
    walk(doc, False)


# ---------------------------------------------------------------------------
# Runtime

class _LazyGlobals(dict):
    """Global params/variables, materialized on first reference so
    declaration order doesn't matter (base.xsl's includes declare
    ``$configuration`` before the importing sheet's ``$dyntoc``)."""

    def __init__(self, run, decls, strparams):
        super().__init__()
        self._run = run
        self._decls = decls          # name -> (node, nsmap, is_param)
        self._strparams = strparams
        self._busy = set()

    def __missing__(self, name):
        if name not in self._decls:
            raise KeyError(name)
        if name in self._busy:
            raise XSLTError(f"circular global variable ${name}")
        node, nsmap, is_param = self._decls[name]
        if is_param and name in self._strparams:
            v = self._strparams[name]
        else:
            self._busy.add(name)
            try:
                ctx = self._run.make_context(self._run.doc, nsmap=nsmap)
                v = self._run.variable_value(node, ctx)
            finally:
                self._busy.discard(name)
        self[name] = v
        return v


class _Run:
    """One transform application: key indexes, document() cache and
    generate-id registry are run-scoped."""

    def __init__(self, sheet: XSLT, doc: Node, strparams):
        self.sheet = sheet
        self.doc = doc
        self._key_cache = {}
        self._doc_cache = {}
        self._root_ids = {}
        decls = {}
        for name, node, nsmap, prec, is_param in sorted(
                sheet.globals, key=lambda g: g[3]):
            decls[name] = (node, nsmap, is_param)   # higher prec wins
        self.globals = _LazyGlobals(self, decls, strparams)
        self.functions = {
            "key": self._fn_key,
            "document": self._fn_document,
            "generate-id": self._fn_generate_id,
            "current": self._fn_current,
            "ext:node-set": self._fn_node_set,
            "exsl:node-set": self._fn_node_set,
            "exslt:node-set": self._fn_node_set,
        }
        self._current = doc

    # -- context -----------------------------------------------------------
    def make_context(self, node, variables=None, nsmap=None, position=1,
                     size=1):
        return Context(node, position, size,
                       variables if variables is not None else self.globals,
                       nsmap or {}, self.functions, root=None)

    # -- engine functions ----------------------------------------------------
    def _fn_current(self, ctx):
        return [self._current]

    def _fn_node_set(self, ctx, v):
        if isinstance(v, list):
            return v
        raise XSLTError("node-set() of a non-fragment")

    def _fn_generate_id(self, ctx, ns=None):
        n = ctx.node if ns is None else (ns[0] if ns else None)
        if n is None:
            return ""
        root = n
        while root.parent is not None:
            root = root.parent
        rid = self._root_ids.setdefault(id(root), len(self._root_ids))
        return f"id{rid}x{n.order}"

    def _fn_document(self, ctx, href, base=None):
        if isinstance(href, list):
            href = to_string(href)
        href = str(href)
        if href == "":
            return [self.sheet._sheet_doc]
        if href not in self._doc_cache:
            try:
                text = self.sheet.loader(href)
            except OSError as e:
                raise XSLTError(f"document({href!r}): {e}") from e
            self._doc_cache[href] = build_tree(text)
        return [self._doc_cache[href]]

    def _fn_key(self, ctx, name, value):
        name = to_string(name)
        try:
            patterns, use_ast, nsmap = self.sheet.keys[name]
        except KeyError:
            raise XSLTError(f"undefined key {name!r}") from None
        root = ctx.root
        cache_key = (name, id(root))
        if cache_key not in self._key_cache:
            index = {}
            stack = [root]
            while stack:
                n = stack.pop()
                if n.kind == ELEMENT:
                    stack.extend(reversed(n.children))
                    cands = [n] + n.attribute_nodes()
                elif n.kind == DOCUMENT:
                    stack.extend(reversed(n.children))
                    continue
                else:
                    cands = [n]
                for c in cands:
                    if any(p.matches(c, self) for p in patterns):
                        kctx = self.make_context(c, nsmap=nsmap)
                        uv = xp._eval(use_ast, kctx)
                        if isinstance(uv, list):
                            for un in uv:
                                index.setdefault(un.string_value(),
                                                 []).append(c)
                        else:
                            index.setdefault(to_string(uv), []).append(c)
            self._key_cache[cache_key] = index
        index = self._key_cache[cache_key]
        if isinstance(value, list):
            out = []
            for n in value:
                out.extend(index.get(n.string_value(), []))
        else:
            out = index.get(to_string(value), [])
        return xp._docsort(out)

    # -- template application -------------------------------------------------
    def find_template(self, node, mode):
        for t in self.sheet.templates:
            if t.pattern is None or t.mode != mode:
                continue
            if t.pattern.matches(node, self):
                return t
        return None

    def apply_templates(self, nodes, mode, ctx, params, out):
        size = len(nodes)
        for i, node in enumerate(nodes):
            t = self.find_template(node, mode)
            if t is None:
                self._builtin(node, mode, out)
                continue
            scope = _new_scope(self.globals)
            tctx = Context(node, i + 1, size, scope, t.nsmap,
                           self.functions)
            prev = self._current
            self._current = node
            try:
                for p in t.params:
                    pname = p.attrs["name"].text
                    if pname in params:
                        scope.maps[0][pname] = params[pname]
                    else:
                        scope.maps[0][pname] = self.variable_value(p, tctx)
                self.exec_body(t.body, tctx, out)
            finally:
                self._current = prev

    def _builtin(self, node, mode, out):
        if node.kind in (ELEMENT, DOCUMENT):
            kids = list(node.children)
            ctx = self.make_context(node)
            self.apply_templates(kids, mode, ctx, {}, out)
        elif node.kind in (TEXT, ATTRIBUTE):
            _emit_text(out, node.text or "")
        # comments / PIs: nothing

    # -- instruction execution ---------------------------------------------
    def exec_body(self, body, ctx, out):
        """Execute a sequence of stylesheet nodes.  ``ctx.variables``
        must be a scope this call may extend (xsl:variable binds for
        following siblings)."""
        for node in body:
            if node.kind == TEXT:
                _emit_text(out, node.text or "")
            elif node.kind == ELEMENT:
                if _is_xsl(node):
                    self._instruction(node, ctx, out)
                else:
                    self._literal(node, ctx, out)
            # stylesheet comments/PIs produce nothing

    def _literal(self, el, ctx, out):
        res = Node(ELEMENT, el.name, parent=out, nsmap=el.nsmap)
        for aname, a in el.attrs.items():
            if aname.startswith("{" + XSL_NS + "}"):
                continue
            res.attrs[aname] = Node(ATTRIBUTE, aname,
                                    text=_avt(a.text or "", ctx),
                                    parent=res)
        out.children.append(res)
        sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
        sub.variables = _new_scope(ctx.variables)
        self.exec_body(el.children, sub, res)

    def _instruction(self, el, ctx, out):
        kind = el.local_name
        if kind == "value-of":
            v = to_string(xp.evaluate(el.attrs["select"].text, ctx))
            if v:
                doe = el.attrs.get("disable-output-escaping")
                t = Node(TEXT, text=v, parent=out)
                if doe is not None and doe.text == "yes":
                    t.name = "raw"
                out.children.append(t)
        elif kind == "apply-templates":
            sel = el.attrs.get("select")
            if sel is not None:
                nodes = xp.evaluate(sel.text, ctx)
                if not isinstance(nodes, list):
                    raise XSLTError("apply-templates select is not a "
                                    "node-set")
            else:
                nodes = [c for c in ctx.node.children]
            mode = el.attrs.get("mode")
            nodes = self._sorted(el, nodes, ctx)
            params = self._with_params(el, ctx)
            self.apply_templates(nodes, mode.text if mode is not None
                                 else None, ctx, params, out)
        elif kind == "call-template":
            name = el.attrs["name"].text
            t = self.sheet._named.get(name)
            if t is None:
                raise XSLTError(f"no template named {name!r}")
            params = self._with_params(el, ctx)
            scope = _new_scope(self.globals)
            tctx = Context(ctx.node, ctx.position, ctx.size, scope,
                           t.nsmap, self.functions)
            for p in t.params:
                pname = p.attrs["name"].text
                if pname in params:
                    scope.maps[0][pname] = params[pname]
                else:
                    scope.maps[0][pname] = self.variable_value(p, tctx)
            self.exec_body(t.body, tctx, out)
        elif kind == "for-each":
            nodes = xp.evaluate(el.attrs["select"].text, ctx)
            if not isinstance(nodes, list):
                raise XSLTError("for-each select is not a node-set")
            body = [c for c in el.children if not _is_xsl(c, "sort")]
            nodes = self._sorted(el, nodes, ctx)
            size = len(nodes)
            prev = self._current
            try:
                for i, n in enumerate(nodes):
                    self._current = n
                    sub = Context(n, i + 1, size,
                                  _new_scope(ctx.variables), ctx.nsmap,
                                  self.functions)
                    self.exec_body(body, sub, out)
            finally:
                self._current = prev
        elif kind == "if":
            if to_boolean(xp.evaluate(el.attrs["test"].text, ctx)):
                sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
                sub.variables = _new_scope(ctx.variables)
                self.exec_body(el.children, sub, out)
        elif kind == "choose":
            for c in el.children:
                if _is_xsl(c, "when"):
                    if to_boolean(xp.evaluate(c.attrs["test"].text, ctx)):
                        sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
                        sub.variables = _new_scope(ctx.variables)
                        self.exec_body(c.children, sub, out)
                        return
                elif _is_xsl(c, "otherwise"):
                    sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
                    sub.variables = _new_scope(ctx.variables)
                    self.exec_body(c.children, sub, out)
                    return
        elif kind in ("variable", "param"):
            # (in-body param behaves like variable with default)
            ctx.variables.maps[0][el.attrs["name"].text] = \
                self.variable_value(el, ctx)
        elif kind == "copy-of":
            v = xp.evaluate(el.attrs["select"].text, ctx)
            if isinstance(v, list):
                for n in v:
                    _deep_copy_into(n, out)
            else:
                _emit_text(out, to_string(v))
        elif kind == "copy":
            n = ctx.node
            if n.kind == ELEMENT:
                res = Node(ELEMENT, n.name, parent=out, nsmap=n.nsmap)
                out.children.append(res)
                sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
                sub.variables = _new_scope(ctx.variables)
                self.exec_body(el.children, sub, res)
            elif n.kind == DOCUMENT:
                sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
                sub.variables = _new_scope(ctx.variables)
                self.exec_body(el.children, sub, out)
            elif n.kind == ATTRIBUTE:
                if out.kind == ELEMENT:
                    out.attrs[n.name] = Node(ATTRIBUTE, n.name,
                                             text=n.text, parent=out)
            else:
                _emit_node_copy(n, out)
        elif kind == "element":
            name = _avt(el.attrs["name"].text, ctx)
            ns = el.attrs.get("namespace")
            if ns is not None:
                qname = "{%s}%s" % (_avt(ns.text, ctx),
                                    name.split(":")[-1])
            elif ":" in name:
                pfx, local = name.split(":", 1)
                uri = (el.nsmap or {}).get(pfx)
                if uri is None:
                    raise XSLTError(f"undeclared prefix {pfx!r}")
                qname = "{%s}%s" % (uri, local)
            else:
                qname = name
            res = Node(ELEMENT, qname, parent=out, nsmap=el.nsmap)
            out.children.append(res)
            sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
            sub.variables = _new_scope(ctx.variables)
            self.exec_body(el.children, sub, res)
        elif kind == "attribute":
            name = _avt(el.attrs["name"].text, ctx)
            ns = el.attrs.get("namespace")
            if ns is not None:
                qname = "{%s}%s" % (_avt(ns.text, ctx),
                                    name.split(":")[-1])
            else:
                qname = name
            frag = Node(DOCUMENT)
            sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
            sub.variables = _new_scope(ctx.variables)
            self.exec_body(el.children, sub, frag)
            if out.kind == ELEMENT:
                out.attrs[qname] = Node(ATTRIBUTE, qname,
                                        text=frag.string_value(),
                                        parent=out)
        elif kind == "text":
            doe = el.attrs.get("disable-output-escaping")
            t = Node(TEXT, text="".join(
                c.text or "" for c in el.children if c.kind == TEXT),
                parent=out)
            if doe is not None and doe.text == "yes":
                t.name = "raw"
            out.children.append(t)
        elif kind == "comment":
            frag = Node(DOCUMENT)
            sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
            sub.variables = _new_scope(ctx.variables)
            self.exec_body(el.children, sub, frag)
            out.children.append(Node(COMMENT, text=frag.string_value(),
                                     parent=out))
        elif kind == "processing-instruction":
            frag = Node(DOCUMENT)
            sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
            sub.variables = _new_scope(ctx.variables)
            self.exec_body(el.children, sub, frag)
            out.children.append(Node(
                PI, name=_avt(el.attrs["name"].text, ctx),
                text=frag.string_value(), parent=out))
        elif kind == "message":
            pass                         # diagnostic only
        elif kind == "apply-imports":
            raise XSLTError("xsl:apply-imports is not supported")
        elif kind == "number":
            raise XSLTError("xsl:number is not supported")
        else:
            raise XSLTError(f"unsupported instruction xsl:{kind}")

    # -- helpers -------------------------------------------------------------
    def _with_params(self, el, ctx):
        params = {}
        for c in el.children:
            if _is_xsl(c, "with-param"):
                params[c.attrs["name"].text] = self.variable_value(c, ctx)
        return params

    def _sorted(self, el, nodes, ctx):
        sorts = [c for c in el.children if _is_xsl(c, "sort")]
        if not sorts:
            return nodes
        def keyfn(node):
            k = []
            n_ctx = self.make_context(node, variables=ctx.variables,
                                      nsmap=ctx.nsmap)
            for s in sorts:
                sel = s.attrs.get("select")
                v = (xp.evaluate(sel.text, n_ctx) if sel is not None
                     else [node])
                dtype = s.attrs.get("data-type")
                if dtype is not None and dtype.text == "number":
                    k.append(xp.to_number(v))
                else:
                    k.append(to_string(v))
            return tuple(k)
        revs = []
        for s in sorts:
            order = s.attrs.get("order")
            revs.append(order is not None and order.text == "descending")
        if len(set(revs)) == 1:
            return sorted(nodes, key=keyfn, reverse=revs[0])
        # mixed per-key directions: compare component-wise, flipping
        # only the descending keys (order= applies per sort key)
        import functools

        def _cmp(a, b):
            for va, vb, rev in zip(a[0], b[0], revs):
                if va == vb:
                    continue
                if va < vb:
                    return 1 if rev else -1
                if vb < va:
                    return -1 if rev else 1
            return 0                       # incomparable (NaN) → stable

        decorated = sorted(((keyfn(n), i, n) for i, n in enumerate(nodes)),
                           key=functools.cmp_to_key(
                               lambda a, b: _cmp(a, b) or (a[1] - b[1])))
        return [n for _, _, n in decorated]

    def variable_value(self, el, ctx):
        """Value of xsl:variable / xsl:param / xsl:with-param: the
        select expression, else the body as a result tree fragment
        (represented as a one-document node-set), else ''."""
        sel = el.attrs.get("select")
        if sel is not None:
            return xp.evaluate(sel.text, ctx)
        if not el.children:
            return ""
        frag = Node(DOCUMENT)
        sub = ctx.rebind(ctx.node, ctx.position, ctx.size)
        sub.variables = _new_scope(ctx.variables)
        self.exec_body(el.children, sub, frag)
        xp._assign_order(frag)
        return [frag]


def _new_scope(parent):
    from collections import ChainMap
    if isinstance(parent, ChainMap):
        return parent.new_child()
    return ChainMap({}, parent)


def _emit_text(out, text):
    if text == "":
        return
    kids = out.children
    if kids and kids[-1].kind == TEXT and kids[-1].name is None:
        kids[-1].text = (kids[-1].text or "") + text
    else:
        out.children.append(Node(TEXT, text=text, parent=out))


def _emit_node_copy(n, out):
    c = Node(n.kind, n.name, text=n.text, parent=out)
    out.children.append(c)
    return c


def _deep_copy_into(n, out):
    if n.kind == DOCUMENT:
        for c in n.children:
            _deep_copy_into(c, out)
        return
    if n.kind == ATTRIBUTE:
        if out.kind == ELEMENT:
            out.attrs[n.name] = Node(ATTRIBUTE, n.name, text=n.text,
                                     parent=out)
        return
    c = Node(n.kind, n.name, text=n.text, parent=out, nsmap=n.nsmap)
    out.children.append(c)
    if n.kind == ELEMENT:
        for aname, a in n.attrs.items():
            c.attrs[aname] = Node(ATTRIBUTE, aname, text=a.text, parent=c)
        for ch in n.children:
            _deep_copy_into(ch, c)


# ---------------------------------------------------------------------------
# Serialization

_HTML_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
              "link", "meta", "param", "source", "track", "wbr"}
_HTML_RAW = {"script", "style"}


def _esc_text(s):
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _esc_attr(s):
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def serialize(frag: Node, output: dict | None = None) -> str:
    """Serialize a result fragment per ``xsl:output`` semantics.
    Default method: html if the first result element is ``html`` (no
    namespace), else xml (XSLT 1.0 §16)."""
    output = output or {}
    method = output.get("method")
    first_el = next((c for c in frag.children if c.kind == ELEMENT), None)
    if method is None:
        if (first_el is not None and first_el.local_name.lower() == "html"
                and not first_el.namespace_uri):
            method = "html"
        else:
            method = "xml"
    parts = []
    sysid = output.get("doctype-system")
    pubid = output.get("doctype-public")
    if method == "text":
        return frag.string_value()
    if method == "html":
        if pubid and sysid:
            parts.append(f'<!DOCTYPE html PUBLIC "{pubid}" "{sysid}">\n')
        elif sysid:
            parts.append(f'<!DOCTYPE html SYSTEM "{sysid}">\n')
        elif pubid:
            parts.append(f'<!DOCTYPE html PUBLIC "{pubid}">\n')
        for c in frag.children:
            _ser_html(c, parts)
        return "".join(parts)
    # xml
    if output.get("omit-xml-declaration") != "yes":
        enc = output.get("encoding", "utf-8")
        parts.append(f'<?xml version="1.0" encoding="{enc}"?>\n')
    if first_el is not None and (pubid or sysid):
        name = first_el.local_name
        if pubid and sysid:
            parts.append(f'<!DOCTYPE {name} PUBLIC "{pubid}" "{sysid}">\n')
        elif sysid:
            parts.append(f'<!DOCTYPE {name} SYSTEM "{sysid}">\n')
    for c in frag.children:
        _ser_xml(c, parts, {None: ""}, 0)
    return "".join(parts)


def _ser_html(n: Node, parts, raw=False):
    if n.kind == TEXT:
        if raw or n.name == "raw":
            parts.append(n.text or "")
        else:
            parts.append(_esc_text(n.text or ""))
        return
    if n.kind == COMMENT:
        parts.append(f"<!--{n.text or ''}-->")
        return
    if n.kind == PI:
        parts.append(f"<?{n.name} {n.text or ''}>")
        return
    if n.kind != ELEMENT:
        return
    name = n.local_name
    lname = name.lower()
    parts.append("<" + name)
    for aname, a in n.attrs.items():
        alocal = aname.rsplit("}", 1)[-1]
        parts.append(f' {alocal}="{_esc_attr(a.text or "")}"')
    parts.append(">")
    if lname in _HTML_VOID:
        return
    child_raw = lname in _HTML_RAW
    for c in n.children:
        _ser_html(c, parts, raw=child_raw)
    parts.append(f"</{name}>")


def _ser_xml(n: Node, parts, ns_scope, depth):
    if n.kind == TEXT:
        if n.name == "raw":
            parts.append(n.text or "")
        else:
            parts.append(_esc_text(n.text or ""))
        return
    if n.kind == COMMENT:
        parts.append(f"<!--{n.text or ''}-->")
        return
    if n.kind == PI:
        parts.append(f"<?{n.name} {n.text or ''}?>")
        return
    if n.kind != ELEMENT:
        return
    scope = ns_scope
    decls = []
    # literal xmlns[:pfx] attributes (e.g. copied namespace nodes)
    # extend the scope so descendants can reuse those prefixes
    for aname, a in n.attrs.items():
        if aname == "xmlns" or aname.startswith("xmlns:"):
            if scope is ns_scope:
                scope = dict(scope)
            scope[aname[6:] or None] = a.text or ""
    uri = n.namespace_uri
    tag = n.local_name
    pfx = next((p for p, u in scope.items() if u == uri and p is not None),
               None)
    if pfx is not None and uri:
        tag = f"{pfx}:{tag}"             # reuse an in-scope prefix
    elif uri != scope.get(None, ""):
        if scope is ns_scope:
            scope = dict(scope)
        scope[None] = uri
        decls.append((None, uri))
    # attribute namespaces get generated prefixes
    attrs_out = []
    for aname, a in n.attrs.items():
        if aname.startswith("{"):
            auri = aname[1:aname.index("}")]
            alocal = aname.rsplit("}", 1)[-1]
            if auri == XML_NS:
                attrs_out.append((f"xml:{alocal}", a.text or ""))
                continue
            pfx = next((p for p, u in scope.items()
                        if u == auri and p is not None), None)
            if pfx is None:
                if scope is ns_scope:
                    scope = dict(scope)
                pfx = f"ns{sum(1 for p in scope if p)}"
                scope[pfx] = auri
                decls.append((pfx, auri))
            attrs_out.append((f"{pfx}:{alocal}", a.text or ""))
        else:
            attrs_out.append((aname, a.text or ""))
    parts.append("<" + tag)
    for pfx, u in decls:
        if pfx is None:
            parts.append(f' xmlns="{_esc_attr(u)}"')
        else:
            parts.append(f' xmlns:{pfx}="{_esc_attr(u)}"')
    for k, v in attrs_out:
        parts.append(f' {k}="{_esc_attr(v)}"')
    if not n.children:
        parts.append("/>")
        return
    parts.append(">")
    for c in n.children:
        _ser_xml(c, parts, scope, depth + 1)
    parts.append(f"</{tag}>")
