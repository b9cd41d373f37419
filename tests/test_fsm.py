"""FSM machinery driven with a synthetic transition table — the model of
the reference's testFSMParser.py (synthetic recognizers + transitions)."""

import pytest

from ferenda_ray.elements import Body, Paragraph, Section
from ferenda_ray.fsm import FSMParser, FSMStateError, Peekable


def test_peekable():
    p = Peekable(iter([1, 2, 3]))
    assert p.peek() == 1
    assert p.next() == 1
    assert p.peek() == 2
    assert list(p) == [2, 3]
    with pytest.raises(StopIteration):
        p.peek()


def _simple_parser():
    is_header = lambda c: c.isupper()
    is_para = lambda c: True

    def make_para(p):
        return Paragraph([p.reader.next()])

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
    f.initial_constructor = lambda p: Body()
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
    # "para" in state body has no transition
    with pytest.raises(FSMStateError):
        f.parse(["lowercase para before any header"])


def test_no_recognizer_raises():
    f = FSMParser()
    f.set_recognizers(lambda c: False)
    f.set_transitions({})
    f.initial_state = "body"
    f.initial_constructor = lambda p: Body()
    with pytest.raises(FSMStateError):
        f.parse(["anything"])


def test_callable_transition():
    """Dynamic transitions: f(symbol, stack) -> (constructor, state)."""
    is_num = lambda c: c[0].isdigit()
    is_para = lambda c: True

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
    f.initial_constructor = lambda p: Body()
    body = f.parse(["1 alpha", "text", "2 beta", "more"])
    assert len(body) == 2 and body[0].title == "1 alpha"


def test_tuple_state_expansion():
    """A tuple of states in a transition key applies to each state."""
    is_x = lambda c: c == "x"
    skip = lambda p: (p.reader.next(), None)[1]
    f = FSMParser()
    f.set_recognizers(is_x)
    f.set_transitions({(("a", "b"), is_x): (skip, None)})
    assert ("a", is_x) in f.transitions and ("b", is_x) in f.transitions
