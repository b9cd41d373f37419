"""A configurable finite-state-machine parser over a stream of chunks.

Re-implements the semantics of the reference's ``FSMParser``
(``ferenda/fsmparser.py:13-241``), verified against the reference's own
fixture corpus (``test/files/fsmparser/*.txt`` → ``*.xml``, driven by
``test/testFSMParser.py``) in ``tests/test_reference_fixtures.py``:

* *recognizers* are predicates over the PARSER (they inspect
  ``parser.reader.peek()``), tried in declaration order — but only
  those with a transition out of the current state are consulted
  (``analyze_symbol``, ``fsmparser.py:118-156``);
* the *transition table* maps ``(state, recognizer)`` →
  ``(constructor, newstate)`` or a callable
  ``f(symbol, state_stack) -> (constructor, newstate)``
  (``transition``, ``fsmparser.py:158-167``);
* a ``newstate`` on the transition PUSHES a state only when the
  constructor carries the ``newstate`` attribute (set by the
  :func:`newstate` decorator, ``decorators.py:372-376``) — i.e. the
  constructor will recurse via :meth:`FSMParser.make_children`;
  otherwise the top of the stack is REPLACED (state chain, not
  nesting — the State A/B/C pattern, ``fsmparser.py:216-221``);
* ``constructor is False`` pops back to the parent; with a non-None
  ``newstate`` it also rewrites the state the parent will resume in
  (``self._state_stack[-2]``, ``fsmparser.py:230-240``);
* the chunk stream is wrapped in a :class:`Peekable` with n-chunk
  lookahead (``fsmparser.py:244-268``).

The parser is pure Python and cheap: one instance per document inside a
``map_batches`` UDF — no actor state needed (SURVEY.md §2.2).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Optional


class FSMStateError(Exception):
    """No recognizer or no transition matched the current chunk."""


def newstate(state):
    """Decorator marking a constructor as one that pushes ``state`` and
    recurses via ``make_children`` (``decorators.py:372-376``)."""
    def deco(fn):
        fn.newstate = state
        return fn
    return deco


class Peekable:
    """Iterator with n-chunk lookahead (``fsmparser.py:244-268``)."""

    def __init__(self, iterable: Iterable):
        self._it = iter(iterable)
        self._cache: deque = deque()

    def _fill(self, n: int = 1):
        while len(self._cache) < n:
            self._cache.append(next(self._it))  # may raise StopIteration

    def peek(self, chunkno: int = 1):
        self._fill(chunkno)
        return self._cache[chunkno - 1]

    def next(self):
        self._fill(1)
        return self._cache.popleft()

    def __iter__(self):
        return self

    def __next__(self):
        return self.next()


class FSMParser:
    def __init__(self):
        self.recognizers: tuple = ()
        self.transitions: dict = {}
        self.initial_state: Any = None
        self.initial_constructor: Optional[Callable] = None
        self.reader: Optional[Peekable] = None
        self._state_stack: list = []
        self._applicable_cache: dict = {}
        self.debug = False

    # --- configuration (mirrors set_recognizers / set_transitions) ---------

    def set_recognizers(self, *fns):
        self.recognizers = tuple(fns)
        self._applicable_cache = {}

    def set_transitions(self, table: dict):
        """Keys ``(state, recognizer)``; state may be a tuple/list of
        states sharing the same transition (the reference expands these
        too, ``fsmparser.py:57-85``)."""
        self.transitions = {}
        self._applicable_cache = {}
        for (state, symbol), value in table.items():
            if isinstance(state, (tuple, list)):
                for s in state:
                    self.transitions[(s, symbol)] = value
            else:
                self.transitions[(state, symbol)] = value

    # --- debug ---------------------------------------------------------------

    def _debug(self, msg: str):
        if self.debug:
            print("%s: %s" % ("/".join(str(s) for s in self._state_stack),
                              msg))

    # --- parsing -------------------------------------------------------------

    @property
    def current_state(self):
        return self._state_stack[-1]

    def analyze_symbol(self):
        """First matching recognizer (among those with a transition out
        of the current state, in declaration order) for the peeked
        chunk; ``None`` at end of stream (``fsmparser.py:118-156``)."""
        try:
            chunk = self.reader.peek()
        except StopIteration:
            return None
        state = self._state_stack[-1]
        # per-state recognizer list is a pure function of the
        # (recognizers, transitions) config — cached, not recomputed
        # per chunk (this runs once per input line)
        applicable = self._applicable_cache.get(state)
        if applicable is None:
            applicable = [r for r in self.recognizers
                          if (state, r) in self.transitions]
            self._applicable_cache[state] = applicable
        for r in applicable:
            if r(self):
                return r
        raise FSMStateError(
            f"No recognizer matched chunk {str(chunk)!r:.90} in state "
            f"{state!r} (tried "
            f"{', '.join(getattr(r, '__name__', '?') for r in applicable)})")

    def transition(self, currentstate, symbol):
        if (currentstate, symbol) not in self.transitions:
            raise FSMStateError(
                f"No transition from state {currentstate!r} on symbol "
                f"{getattr(symbol, '__name__', symbol)!r}")
        t = self.transitions[(currentstate, symbol)]
        if callable(t):
            return t(symbol, self._state_stack)
        return t

    def parse(self, chunks: Iterable):
        assert self.initial_constructor is not None, "parser not configured"
        self.reader = Peekable(chunks)
        self._state_stack = [self.initial_state]
        return self.initial_constructor(self)

    def make_child(self, constructor, childstate):
        """Push ``childstate`` (or duplicate the current state), run the
        constructor, pop (``fsmparser.py:169-183``)."""
        if not childstate:
            childstate = self._state_stack[-1]
        self._state_stack.append(childstate)
        try:
            return constructor(self)
        finally:
            self._state_stack.pop()

    def make_children(self, parent):
        """Consume chunks as children of ``parent`` until a pop
        transition or end of stream (``fsmparser.py:185-241``)."""
        while True:
            symbol = self.analyze_symbol()
            if symbol is None:
                return parent
            constructor, ns = self.transition(self._state_stack[-1], symbol)
            # a newstate on a non-recursing constructor (no @newstate
            # marker) REPLACES the current state — a state chain, not a
            # nesting level
            if ns and not hasattr(constructor, "newstate"):
                self._state_stack[-1] = ns
            if constructor:
                try:
                    element = self.make_child(constructor, ns)
                except StopIteration:
                    return parent
                if element is not None:
                    parent.append(element)
            else:
                # pop to the parent; optionally rewrite the state the
                # parent resumes in (``fsmparser.py:230-240``)
                if ns and len(self._state_stack) >= 2:
                    self._state_stack[-2] = ns
                return parent
