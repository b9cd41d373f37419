"""Layered configuration cascade (defaults < INI < env < argv).

The reference wires every repo/action through the ``layeredconfig``
package: ``LayeredConfig(Defaults(DEFAULT_CONFIG), INIFile(inifile),
Commandline(argv), cascade=True)`` (``ferenda/manager.py:65,351``),
with per-repo SUBSECTIONS (``config.rfc.datadir``), typed coercion
(the typed default gives the type, string sources coerce to it) and
parent-cascade lookup.  This module re-implements those semantics
standalone: precedence right-to-left over the source list, runtime
writes overriding everything, int/float/bool/list/date coercion.
"""

from __future__ import annotations

import configparser
import datetime

__all__ = ["LayeredConfig", "Defaults", "INIFile", "Environment",
           "Commandline"]

_MISSING = object()


def _coerce(value, template):
    """Coerce a string ``value`` to the type of ``template``
    (layeredconfig's typed-by-default rule)."""
    if not isinstance(value, str) or isinstance(template, str):
        return value
    if isinstance(template, bool):  # before int: bool is an int subclass
        return value == "True"
    if isinstance(template, int):
        return int(value)
    if isinstance(template, float):
        return float(value)
    if isinstance(template, list):
        return [x.strip() for x in value.split(",")] if value else []
    if isinstance(template, datetime.datetime):
        return datetime.datetime.fromisoformat(value)
    if isinstance(template, datetime.date):
        return datetime.date.fromisoformat(value)
    return value


class Defaults:
    """Typed in-code defaults; nested dicts are subsections."""

    def __init__(self, d: dict | None = None):
        self._d = dict(d or {})

    def keys(self):
        return [k for k, v in self._d.items() if not isinstance(v, dict)]

    def has(self, key):
        return key in self._d and not isinstance(self._d[key], dict)

    def get(self, key):
        return self._d[key]

    def subsections(self):
        return [k for k, v in self._d.items() if isinstance(v, dict)]

    def subsection(self, name):
        return Defaults(self._d.get(name, {}))


class INIFile:
    """INI file source; the root section holds top-level keys and
    every other section is a subsection (repo alias)."""

    def __init__(self, path: str | None = None, rootsection: str = "__root__",
                 _parser=None, _section=None):
        if _parser is None:
            _parser = configparser.ConfigParser()
            if path:
                _parser.read(path)
        self._p = _parser
        self._root = rootsection
        self._section = _section  # None = root

    def _sect(self):
        name = self._section or self._root
        return self._p[name] if self._p.has_section(name) else {}

    def keys(self):
        return list(self._sect().keys())

    def has(self, key):
        return key in self._sect()

    def get(self, key):
        return self._sect()[key]

    def subsections(self):
        if self._section is not None:
            return []
        return [s for s in self._p.sections() if s != self._root]

    def subsection(self, name):
        return INIFile(_parser=self._p, rootsection=self._root,
                       _section=name)


class Environment:
    """Environment variables: ``<prefix>KEY`` (lower-cased), with
    ``__`` separating a subsection (``FERENDA_RFC__DATADIR``)."""

    def __init__(self, environ=None, prefix: str = "FERENDA_",
                 _section: str | None = None):
        import os
        self._env = dict(os.environ if environ is None else environ)
        self._prefix = prefix
        self._section = _section

    def _mine(self):
        out = {}
        for k, v in self._env.items():
            if not k.startswith(self._prefix):
                continue
            rest = k[len(self._prefix):].lower()
            if "__" in rest:
                sec, _, key = rest.partition("__")
                if self._section == sec:
                    out[key] = v
            elif self._section is None:
                out[rest] = v
        return out

    def keys(self):
        return list(self._mine().keys())

    def has(self, key):
        return key in self._mine()

    def get(self, key):
        return self._mine()[key]

    def subsections(self):
        secs = set()
        for k in self._env:
            if k.startswith(self._prefix) and "__" in k[len(self._prefix):]:
                secs.add(k[len(self._prefix):].lower().partition("__")[0])
        return sorted(secs)

    def subsection(self, name):
        return Environment(self._env, self._prefix, _section=name)


class Commandline:
    """``--key=value`` / ``--sub-key=value`` arguments; a bare
    ``--flag`` reads as the string "True" (bool-typed defaults coerce
    it).  Non-option arguments are exposed as ``.rest``."""

    def __init__(self, argv=None, _section: str | None = None,
                 _parsed=None, _rest=None):
        if _parsed is None:
            _parsed, _rest = {}, []
            for arg in (argv or []):
                if arg.startswith("--"):
                    body = arg[2:]
                    key, eq, val = body.partition("=")
                    _parsed[key.replace("-", "_")] = val if eq else "True"
                else:
                    _rest.append(arg)
        self._parsed = _parsed
        self.rest = _rest or []
        self._section = _section

    def _mine(self):
        out = {}
        for k, v in self._parsed.items():
            if "_" in k:
                sec, _, key = k.partition("_")
                if self._section == sec:
                    out[key] = v
            if self._section is None and "_" not in k:
                out[k] = v
        # top-level keys may legitimately contain underscores: expose
        # un-sectioned compound keys at the root too
        if self._section is None:
            for k, v in self._parsed.items():
                out.setdefault(k, v)
        return out

    def keys(self):
        return list(self._mine().keys())

    def has(self, key):
        return key in self._mine()

    def get(self, key):
        return self._mine()[key]

    def subsections(self):
        return sorted({k.partition("_")[0] for k in self._parsed
                       if "_" in k})

    def subsection(self, name):
        return Commandline(_parsed={k.partition("_")[2]: v
                                    for k, v in self._parsed.items()
                                    if k.partition("_")[0] == name},
                           _rest=self.rest, _section=None)


class LayeredConfig:
    """Attribute-access cascade over ordered sources (later wins);
    ``cascade=True`` lets subsection lookups fall back to the parent
    (``manager.py:351`` usage)."""

    def __init__(self, *sources, cascade: bool = False, _parent=None,
                 _name=None):
        object.__setattr__(self, "_sources", list(sources))
        object.__setattr__(self, "_cascade", cascade)
        object.__setattr__(self, "_parent", _parent)
        object.__setattr__(self, "_name", _name)
        object.__setattr__(self, "_runtime", {})
        object.__setattr__(self, "_subcache", {})

    # --- static helpers (the layeredconfig public API shape) ---

    @staticmethod
    def get(config, key, default=None):
        try:
            return getattr(config, key)
        except AttributeError:
            return default

    @staticmethod
    def set(config, key, value):
        config._runtime[key] = value

    # --- lookup ---

    def _typed_template(self, key):
        for src in self._sources:  # first (lowest) typed value wins
            if src.has(key) and not isinstance(src.get(key), str):
                return src.get(key)
        if self._cascade and self._parent is not None:
            return self._parent._typed_template(key)
        return None

    def _raw(self, key):
        if key in self._runtime:
            return self._runtime[key]
        for src in reversed(self._sources):  # later sources override
            if src.has(key):
                return src.get(key)
        if self._cascade and self._parent is not None:
            return self._parent._raw(key)
        return _MISSING

    def __getattr__(self, key):
        if key.startswith("_"):
            raise AttributeError(key)
        subs = set()
        for src in self._sources:
            subs.update(src.subsections())
        if key in subs:
            return self._subconfig(key)
        raw = self._raw(key)
        if raw is _MISSING:
            raise AttributeError(key)
        template = self._typed_template(key)
        return _coerce(raw, template) if template is not None else raw

    def __setattr__(self, key, value):
        self._runtime[key] = value

    def _subconfig(self, name):
        if name not in self._subcache:
            self._subcache[name] = LayeredConfig(
                *[s.subsection(name) for s in self._sources],
                cascade=self._cascade, _parent=self, _name=name)
        return self._subcache[name]

    def __contains__(self, key):
        try:
            getattr(self, key)
            return True
        except AttributeError:
            return False

    def keys(self):
        out = set(self._runtime)
        for src in self._sources:
            out.update(src.keys())
        if self._cascade and self._parent is not None:
            out.update(self._parent.keys())
        return sorted(out)
