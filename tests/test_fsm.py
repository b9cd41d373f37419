"""FSM machinery driven with a synthetic transition table — the model of
the reference's testFSMParser.py (synthetic recognizers + transitions).
Recognizers receive the PARSER (reference API, fsmparser.py:118-156)."""

import pytest

from ferenda_ray.elements import Body, Paragraph, Section
from ferenda_ray.fsm import FSMParser, FSMStateError, Peekable, newstate


def test_peekable():
    p = Peekable(iter([1, 2, 3]))
    assert p.peek() == 1
    assert p.next() == 1
    assert p.peek() == 2
    assert list(p) == [2, 3]
    with pytest.raises(StopIteration):
        p.peek()


def test_peekable_ahead():
    # n-chunk lookahead (fsmparser.py:264-268)
    p = Peekable(range(4))
    assert p.peek(4) == 3
    assert p.peek(2) == 1
    assert p.peek() == 0
    assert list(p) == [0, 1, 2, 3]


def _simple_parser():
    is_header = lambda p: p.reader.peek().isupper()
    is_para = lambda p: True

    def make_para(p):
        return Paragraph([p.reader.next()])

    @newstate("section")
    def make_section(p):
        sec = Section(title=p.reader.next())
        return p.make_children(sec)

    f = FSMParser()
    f.set_recognizers(is_header, is_para)
    f.set_transitions({
        ("body", is_header): (make_section, "section"),
        ("section", is_para): (make_para, None),
        ("section", is_header): (False, None),
    })
    f.initial_state = "body"
    f.initial_constructor = lambda p: p.make_children(Body())
    return f


def test_sections_and_pop():
    body = _simple_parser().parse(["HEAD A", "one", "two", "HEAD B", "three"])
    assert len(body) == 2
    assert body[0].title == "HEAD A"
    assert [str(c[0]) for c in body[0]] == ["one", "two"]
    assert body[1].title == "HEAD B"
    assert [str(c[0]) for c in body[1]] == ["three"]


def test_no_transition_raises():
    f = _simple_parser()
    # "para" in state body has no transition → is_para is not even
    # applicable in body → no recognizer match (reference semantics:
    # analyze_symbol only consults state-applicable recognizers)
    with pytest.raises(FSMStateError):
        f.parse(["lowercase para before any header"])


def test_no_recognizer_raises():
    f = FSMParser()
    f.set_recognizers(lambda p: False)
    f.set_transitions({})
    f.initial_state = "body"
    f.initial_constructor = lambda p: p.make_children(Body())
    with pytest.raises(FSMStateError):
        f.parse(["anything"])


def test_state_chain_no_push():
    """A transition with a newstate but a non-@newstate constructor
    REPLACES the state (State A/B/C chain, fsmparser.py:216-221)."""
    is_a = lambda p: p.reader.peek().startswith("A:")
    is_b = lambda p: p.reader.peek().startswith("B:")

    def make(p):
        return Paragraph([p.reader.next()])

    f = FSMParser()
    f.set_recognizers(is_a, is_b)
    f.set_transitions({
        ("body", is_a): (make, "state-a"),
        ("state-a", is_b): (make, "state-b"),
    })
    f.initial_state = "body"
    f.initial_constructor = lambda p: p.make_children(Body())
    body = f.parse(["A: one", "B: two"])
    assert [str(c[0]) for c in body] == ["A: one", "B: two"]
    # B in body state would have had no transition: proves the chain
    with pytest.raises(FSMStateError):
        f.parse(["B: early"])


def test_pop_rewrites_return_state():
    """(False, newstate) rewrites the state the parent resumes in
    (the _state_stack[-2] hack, fsmparser.py:230-240)."""
    is_h = lambda p: p.reader.peek().isupper()
    is_x = lambda p: p.reader.peek().startswith("x")
    is_p = lambda p: True

    def make_para(p):
        return Paragraph([p.reader.next()])

    @newstate("section")
    def make_section(p):
        return p.make_children(Section(title=p.reader.next()))

    f = FSMParser()
    f.set_recognizers(is_h, is_x, is_p)
    f.set_transitions({
        ("body", is_h): (make_section, "section"),
        ("section", is_p): (make_para, None),
        ("section", is_x): (False, "after"),
        ("after", is_x): (make_para, None),
    })
    f.initial_state = "body"
    f.initial_constructor = lambda p: p.make_children(Body())
    body = f.parse(["HEAD", "text", "x tail"])
    assert body[0].title == "HEAD"
    assert str(body[1][0]) == "x tail"


def test_callable_transition():
    """Dynamic transitions: f(symbol, stack) -> (constructor, state)."""
    is_num = lambda p: p.reader.peek()[0].isdigit()
    is_para = lambda p: True

    @newstate("section")
    def make_sec(p):
        sec = Section(title=p.reader.next())
        return p.make_children(sec)

    def make_para(p):
        return Paragraph([p.reader.next()])

    def dynamic(symbol, stack):
        # nest at most one level deep: pop when already in a section
        if stack[-1] == "section":
            return (False, None)
        return (make_sec, "section")

    f = FSMParser()
    f.set_recognizers(is_num, is_para)
    f.set_transitions({
        ("body", is_num): dynamic,
        ("section", is_num): dynamic,
        ("body", is_para): (make_para, None),
        ("section", is_para): (make_para, None),
    })
    f.initial_state = "body"
    f.initial_constructor = lambda p: p.make_children(Body())
    body = f.parse(["1 alpha", "text", "2 beta", "more"])
    assert len(body) == 2 and body[0].title == "1 alpha"


def test_tuple_state_expansion():
    """A tuple of states in a transition key applies to each state."""
    is_x = lambda p: p.reader.peek() == "x"
    skip = lambda p: (p.reader.next(), None)[1]
    f = FSMParser()
    f.set_recognizers(is_x)
    f.set_transitions({(("a", "b"), is_x): (skip, None)})
    assert ("a", is_x) in f.transitions and ("b", is_x) in f.transitions
