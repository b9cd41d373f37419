"""A configurable finite-state-machine parser over a stream of chunks.

Re-implements the semantics of the reference's ``FSMParser``
(``ferenda/fsmparser.py:13-268``): a set of *recognizer* predicates run
in declaration order against the current chunk (``analyze_symbol``,
``fsmparser.py:114``); a *transition table* keyed ``(state, recognizer)``
maps the recognized symbol to ``(constructor, newstate)``
(``transition``, ``fsmparser.py:154``); constructors consume the chunk
and may recursively call :meth:`FSMParser.make_children`
(``fsmparser.py:181-239``) to build a nested element tree.  The chunk
stream is wrapped in a :class:`Peekable` (``fsmparser.py:244-268``).

Differences from the reference are deliberate simplifications, not
behavior changes for the cases this engine exercises:

* transition values may be ``(constructor, newstate)`` tuples or a
  callable ``f(symbol, state_stack) -> (constructor, newstate)`` (the
  reference allows the same for ordinal-depth-dependent decisions);
* ``constructor is False`` means "this symbol belongs to an ancestor:
  pop" — identical to the reference's pop behavior;
* an unmatched chunk raises :class:`FSMStateError`
  (``fsmparser.py:150-152``); extraction catches it per document and
  emits an error row instead of failing the Ray task (SURVEY.md §7.4).

The parser is pure Python and cheap: one instance per document inside a
``map_batches`` UDF — no actor state needed (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional


class FSMStateError(Exception):
    """No recognizer or no transition matched the current chunk."""


class Peekable:
    """Iterator with one-chunk lookahead (``fsmparser.py:244-268``)."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable):
        self._it = iter(iterable)
        self._peeked = self._SENTINEL

    def peek(self):
        if self._peeked is self._SENTINEL:
            self._peeked = next(self._it)  # may raise StopIteration
        return self._peeked

    def next(self):
        if self._peeked is not self._SENTINEL:
            v = self._peeked
            self._peeked = self._SENTINEL
            return v
        return next(self._it)

    def __iter__(self):
        return self

    def __next__(self):
        return self.next()


class FSMParser:
    def __init__(self):
        self.recognizers: list[Callable[[Any], bool]] = []
        self.transitions: dict = {}
        self.initial_state: Any = None
        self.initial_constructor: Optional[Callable] = None
        self.reader: Optional[Peekable] = None
        self._state_stack: list = []
        self.debug = False

    # --- configuration (mirrors set_recognizers / set_transitions) ---------

    def set_recognizers(self, *fns):
        self.recognizers = list(fns)

    def set_transitions(self, table: dict):
        """Keys ``(state, recognizer)``; state may be a tuple of states
        sharing the same transition (the reference expands these too)."""
        self.transitions = {}
        for (state, symbol), value in table.items():
            if isinstance(state, tuple):
                for s in state:
                    self.transitions[(s, symbol)] = value
            else:
                self.transitions[(state, symbol)] = value

    # --- parsing ------------------------------------------------------------

    @property
    def current_state(self):
        return self._state_stack[-1]

    def analyze_symbol(self):
        """First matching recognizer for the peeked chunk
        (``fsmparser.py:114``)."""
        chunk = self.reader.peek()
        for r in self.recognizers:
            if r(chunk):
                return r
        raise FSMStateError(f"No recognizer matched chunk: {chunk!r:.80}")

    def parse(self, chunks: Iterable):
        assert self.initial_constructor is not None, "parser not configured"
        self.reader = Peekable(chunks)
        self._state_stack = [self.initial_state]
        root = self.initial_constructor(self)
        return self.make_children(root)

    def make_children(self, parent):
        """Consume chunks as children of ``parent`` until a pop
        transition or end of stream (``fsmparser.py:181-239``)."""
        while True:
            try:
                self.reader.peek()
            except StopIteration:
                return parent
            symbol = self.analyze_symbol()
            key = (self.current_state, symbol)
            if key not in self.transitions:
                raise FSMStateError(
                    f"No transition from state {self.current_state!r} "
                    f"on symbol {getattr(symbol, '__name__', symbol)!r}"
                )
            value = self.transitions[key]
            if callable(value) and not isinstance(value, tuple):
                value = value(symbol, list(self._state_stack))
            constructor, newstate = value
            if constructor is False:
                # symbol belongs to an ancestor: pop back to it
                if newstate is not None:
                    self._state_stack[-1] = newstate
                return parent
            pushed = False
            if newstate is not None:
                self._state_stack.append(newstate)
                pushed = True
            node = constructor(self)
            if pushed:
                # constructor (via its own make_children call) is done
                # with the nested state
                if self._state_stack and self._state_stack[-1] is newstate:
                    self._state_stack.pop()
            if node is not None:
                parent.append(node)
