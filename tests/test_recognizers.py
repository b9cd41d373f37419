"""Per-language recognizers on handwritten snippets + renderer inverses.

The corpus-wide inverse property (render → parse → identical structure)
is the analogue of the reference's parser corpus tests
(test/integrationRFC.py:14-21: run FSM over each fixture file, compare
serialized tree)."""

from ferenda_ray.corpus import (
    CorpusSpec, RENDERERS, file_list, plan_doc)
from ferenda_ray.recognizers import (
    parse_content, parse_go, parse_java, parse_markdown, parse_python)

MD = """# My Title

Author: Jane Doe
Issued: 2023-01-02

intro line one
see org0/repo1:src/a.py.

## 1. First Part

body text

### 1.1 Nested Part

deep text

## 2. Second Part

more text
"""


def test_markdown_structure():
    d = parse_markdown(MD)
    assert d.title == "My Title"
    assert d.meta == {"Author": "Jane Doe", "Issued": "2023-01-02"}
    assert d.intro_prose == ["intro line one", "see org0/repo1:src/a.py."]
    assert [s.ordinal for s in d.sections] == ["1", "2"]
    assert d.sections[0].title == "First Part"
    assert [s.ordinal for s in d.sections[0].subs] == ["1.1"]
    assert d.sections[0].subs[0].prose == ["deep text"]
    assert d.sections[1].prose == ["more text"]


PY = '''"""Mod Title"""
# Author: Bob
# Issued: 2020-05-05
import corelib
from netkit import thing

# intro comment

class Cls1:
    """Alpha"""
    # alpha prose

    def meth1(self):
        """Beta"""
        # beta prose
        return 1

def fn2():
    """Gamma"""
    # gamma prose
    return 2
'''


def test_python_structure():
    d = parse_python(PY)
    assert d.title == "Mod Title"
    assert d.meta["Author"] == "Bob"
    assert d.imports == ["corelib", "netkit"]
    assert d.intro_prose == ["intro comment"]
    assert [(s.ordinal, s.title) for s in d.sections] == \
        [("1", "Alpha"), ("2", "Gamma")]
    assert d.sections[0].prose == ["alpha prose"]
    assert [(s.ordinal, s.title) for s in d.sections[0].subs] == \
        [("1.1", "Beta")]
    assert d.sections[0].subs[0].prose == ["beta prose"]


JAVA = """// Doc Title
// Author: Ann
package corpus.gen;

import corelib.Lib;

// intro prose

// 1. Part One
class Cls1 {
    // part one prose
    // 1.1 Sub One
    public void meth1() {
        // sub prose
    }
}
"""


def test_java_structure():
    d = parse_java(JAVA)
    assert d.title == "Doc Title"
    assert d.meta["Author"] == "Ann"
    assert d.imports == ["corelib"]
    assert d.intro_prose == ["intro prose"]
    s = d.sections[0]
    assert (s.ordinal, s.title) == ("1", "Part One")
    assert s.prose == ["part one prose"]
    assert [(x.ordinal, x.title) for x in s.subs] == [("1.1", "Sub One")]
    assert s.subs[0].prose == ["sub prose"]


GO = """// Go Title
// Issued: 2022-02-02
package corpusgen

import "mathx"

// 1. Only Part
func Fn1() {
    // inner prose
}
"""


def test_go_structure():
    d = parse_go(GO)
    assert d.title == "Go Title"
    assert d.imports == ["mathx"]
    s = d.sections[0]
    assert (s.ordinal, s.title) == ("1", "Only Part")
    assert s.prose == ["inner prose"]


def test_unknown_lang_fallback():
    d = parse_content("cobol", "  HELLO.\nsecond")
    assert d.title == "HELLO."
    assert d.sections == []


def test_render_parse_inverse_over_corpus():
    """For every generated file, parsing recovers the planned structure."""
    spec = CorpusSpec(n_files=40)
    files = file_list(spec)
    for repo, path, lang in files:
        plan = plan_doc(spec, repo, path, lang, files)
        parsed = parse_content(lang, RENDERERS[lang](plan))
        assert parsed.title == plan.title, (lang, path)
        assert parsed.meta.get("Author") == plan.author
        assert parsed.meta.get("Issued") == plan.issued
        assert parsed.imports == plan.imports
        assert [s.ordinal for s in parsed.sections] == \
            [s.ordinal for s in plan.sections]
        for ps, es in zip(parsed.sections, plan.sections):
            assert ps.title == es.title
            assert [s.ordinal for s in ps.subs] == \
                [s.ordinal for s in es.subs]
