"""Pure-Python XSLT 1.0 engine + XPath evaluator.

Conformance targets:

* the reference's OWN transformer tests
  (``/root/reference/test/testTransform.py``: document()-passed
  params, ``copy-of`` of external trees, html doctype output,
  the ``_depth`` helper) — replayed against
  :class:`ferenda_ray.stages.transformer.Transformer` with
  ``transformertype="XSLT"``;
* the reference's SHIPPED stylesheet corpus
  (``/root/reference/ferenda/res/xsl/*.xsl``,
  ``ferenda/transformer.py:196-330`` drives these through lxml):
  every stylesheet must compile, and the main page templates
  (generic/toc) plus the hardest one (rdfxml-grit: keys, sort,
  generate-id, namespace axis) must apply with correct output.
"""

import os

import pytest

from ferenda_ray import xpath as xp
from ferenda_ray.stages.transformer import Transformer, TransformError
from ferenda_ray.stages.xslt import XSLT, XSLTError, serialize

XSLDIR = "/root/reference/ferenda/res/xsl"
refxsl = pytest.mark.skipif(not os.path.isdir(XSLDIR),
                            reason="reference stylesheets not present")


# ---------------------------------------------------------------------------
# XPath unit coverage

@pytest.fixture(scope="module")
def tree():
    return xp.build_tree("""<root xmlns:h="http://x/h">
  <!-- a comment -->
  <h:div about="http://ex/doc#s1" class="sect">
    <h:span property="dcterms:title" content="Title One"/>
    text one <b>bold</b> tail
  </h:div>
  <h:div about="http://ex/doc#s2"><h:p>para</h:p></h:div>
  <item n="2"/><item n="10"/>
</root>""")


@pytest.fixture(scope="module")
def ctx(tree):
    return xp.Context(tree, nsmap={"h": "http://x/h"})


@pytest.mark.parametrize("expr,expected", [
    ("count(//h:div)", 2.0),
    ("local-name(/*)", "root"),
    ("substring-after(//h:div[1]/@about, '#')", "s1"),
    ("string(//h:span/@content)", "Title One"),
    ("normalize-space(//h:div[1])", "text one bold tail"),
    ("count(//comment())", 1.0),
    ("sum(//item/@n)", 12.0),
    ("count(/root/*)", 4.0),
    ("concat('a', 'b', 1 + 1)", "ab2"),
    ("count(//h:div[1]/ancestor::*)", 1.0),
    ("not(false())", True),
    ("string(//h:div[2]/h:p)", "para"),
    ("translate('abc','ab','A')", "Ac"),
    # first occurrence of a repeated from-char wins (XPath 1.0 §4.2)
    ("translate('a','aa','bc')", "b"),
    ("translate('a','aa','b')", "b"),
    ("substring('12345', 2, 3)", "234"),
    ("substring('12345', 0)", "12345"),
    # spec examples: non-finite start/length must not raise
    ("substring('12345', 2, 1 div 0)", "2345"),
    ("substring('12345', -42, 1 div 0)", "12345"),
    ("substring('12345', -1 div 0, 1 div 0)", ""),
    ("substring('12345', 1 div 0)", ""),
    ("count(/root/h:div[1]/following-sibling::*)", 3.0),
    ("count(/root/item[1]/preceding-sibling::h:div)", 2.0),
    ("//h:div[@about='http://ex/doc#s2']/h:p/text()='para'", True),
    ("boolean(//h:div[3])", False),
    ("string-length(name(//h:span))", 6.0),
    ("floor(2.7) + ceiling(2.2) + round(2.5)", 8.0),
    ("10 mod 3", 1.0),
    ("-(3) * -2", 6.0),
    ("2 > 1 and 1 < 2 and 2 >= 2 and 2 <= 2", True),
    ("number('13') div 2", 6.5),
    ("starts-with(//h:div/@about, 'http:')", True),
    ("contains('haystack', 'ays')", True),
    ("substring-before('a=b', '=')", "a"),
])
def test_xpath_scalar(ctx, expr, expected):
    assert xp.evaluate(expr, ctx) == expected


def test_xpath_nodeset_semantics(ctx):
    # position()/last() in predicates, unions in doc order, = on sets
    assert xp.evaluate("//item[last()]/@n", ctx)[0].text == "10"
    assert xp.evaluate("//item[@n > 5]/@n", ctx)[0].text == "10"
    u = xp.evaluate("//item/@n | //h:div/@about", ctx)
    assert [n.text for n in u] == [
        "http://ex/doc#s1", "http://ex/doc#s2", "2", "10"]
    # node-set = string: exists-semantics
    assert xp.evaluate("//item/@n = '2'", ctx) is True
    assert xp.evaluate("//item/@n != '2'", ctx) is True   # the other one
    assert xp.evaluate("//item/@n = '3'", ctx) is False


def test_xpath_variables_and_errors(tree):
    c = xp.Context(tree, variables={"v": 41.0})
    assert xp.evaluate("$v + 1", c) == 42.0
    with pytest.raises(xp.XPathError):
        xp.evaluate("$unbound", c)
    with pytest.raises(xp.XPathError):
        xp.evaluate("frobnicate()", c)


def test_build_tree_mixed_content_order(tree):
    div = xp.evaluate("//*[@class='sect']",
                      xp.Context(tree))[0]
    kinds = [(c.kind, (c.text or "").strip()) for c in div.children]
    # ws, span, tail-text, b, tail — .text/.tail folded into real
    # TEXT nodes in document order
    assert [k for k, _ in kinds] == [xp.TEXT, xp.ELEMENT, xp.TEXT,
                                     xp.ELEMENT, xp.TEXT]
    assert kinds[2][1] == "text one"
    assert kinds[4][1] == "tail"


# ---------------------------------------------------------------------------
# The reference's own transformer tests (testTransform.py:40-120)

TESTSTYLE = """<xsl:stylesheet version="1.0"
    xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
    <xsl:param name="value"/>
    <xsl:param name="file"/>
    <xsl:variable name="content" select="document($file)/root/*"/>
    <xsl:template match="/">
        <output>
            <paramvalue><xsl:value-of select="$value"/></paramvalue>
            <paramfile><xsl:copy-of select="$content"/></paramfile>
            <infile><xsl:value-of select="/doc/title"/></infile>
        </output>
    </xsl:template>
</xsl:stylesheet>
"""


def _norm_xml(s):
    import re
    s = re.sub(r"<\?xml[^>]*\?>", "", s)
    return re.sub(r">\s+<", "><", s).strip()


@pytest.mark.parametrize("paramfile", ["paramfile.xml",
                                       "shrimp sandwich.xml",
                                       "räksmörgås.xml"])
def test_transform_html_fileparams(tmp_path, paramfile):
    """testTransform.test_transform_html + the nonascii/space fileparam
    variants (the lxml workarounds in transformer.py:280-299 exist
    because of these)."""
    (tmp_path / paramfile).write_text(
        "<root><node key='value'><subnode>textnode</subnode></node></root>")
    (tmp_path / "infile.xml").write_text(
        "<doc><title>Document title</title></doc>")
    (tmp_path / "teststyle.xslt").write_text(TESTSTYLE)
    t = Transformer("XSLT", str(tmp_path / "teststyle.xslt"))
    t.transform_file(str(tmp_path / "infile.xml"),
                     str(tmp_path / "outfile.xml"),
                     {"value": "blahonga",
                      "file": str(tmp_path / paramfile)})
    got = (tmp_path / "outfile.xml").read_text()
    assert _norm_xml(got) == _norm_xml("""
        <output>
            <paramvalue>blahonga</paramvalue>
            <paramfile><node key="value"><subnode>textnode</subnode></node></paramfile>
            <infile>Document title</infile>
        </output>""")


def test_doctype(tmp_path):
    """testTransform.test_doctype: html output method + legacy-compat
    system doctype + omitted xml declaration."""
    style = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
    <xsl:output method="html" doctype-system="about:legacy-compat"
                omit-xml-declaration="yes" encoding='utf-8' indent="yes"/>
    <xsl:template match="/">
      <html><head><title><xsl:value-of select="/doc/title"/></title></head>
      <body><h1>hello world</h1></body></html>
    </xsl:template>
</xsl:stylesheet>"""
    (tmp_path / "teststyle-doctype.xslt").write_text(style)
    (tmp_path / "infile.xml").write_text(
        "<doc><title>Document title</title></doc>")
    t = Transformer("XSLT", str(tmp_path / "teststyle-doctype.xslt"))
    t.transform_file(str(tmp_path / "infile.xml"),
                     str(tmp_path / "outfile.xml"))
    out = (tmp_path / "outfile.xml").read_text()
    assert out.startswith('<!DOCTYPE html SYSTEM "about:legacy-compat">')
    assert "<h1>hello world</h1>" in out
    assert "<?xml" not in out


def test_depth(tmp_path):
    """testTransform.test_depth."""
    (tmp_path / "notused.xslt").write_text(
        '<xsl:stylesheet version="1.0" '
        'xmlns:xsl="http://www.w3.org/1999/XSL/Transform"/>')
    t = Transformer("XSLT", str(tmp_path / "notused.xslt"))
    assert t._depth("data", "data/index.html") == 0
    assert t._depth("data/repo", "data/index.html") == 1
    assert t._depth("data/repo/toc/title", "data/index.html") == 3


# ---------------------------------------------------------------------------
# Engine semantics beyond the reference's own tests

def test_template_conflict_last_declared_wins():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="a[@x]"><first/></xsl:template>
      <xsl:template match="a[@x]"><second/></xsl:template>
      <xsl:template match="/"><xsl:apply-templates/></xsl:template>
    </xsl:stylesheet>""")
    assert "<second/>" in s.transform_text("<a x='1'/>")


def test_import_precedence_and_include(tmp_path):
    (tmp_path / "lib.xsl").write_text("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="a"><imported/></xsl:template>
      <xsl:template match="b"><from-lib/></xsl:template>
    </xsl:stylesheet>""")
    main = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:import href="lib.xsl"/>
      <xsl:template match="a"><main/></xsl:template>
      <xsl:template match="/"><r><xsl:apply-templates select="//a|//b"/></r></xsl:template>
    </xsl:stylesheet>"""
    out = XSLT(main, base_dir=str(tmp_path)).transform_text(
        "<d><a/><b/></d>")
    # importing sheet wins for <a>; imported fills the <b> gap
    assert "<main/>" in out and "<imported/>" not in out
    assert "<from-lib/>" in out


def test_later_import_beats_earlier_import(tmp_path):
    # XSLT 1.0 §2.6.2: with two sibling imports, the LATER one has
    # higher import precedence
    (tmp_path / "a.xsl").write_text("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="x"><from-a/></xsl:template>
      <xsl:template match="y"><only-a/></xsl:template>
    </xsl:stylesheet>""")
    (tmp_path / "b.xsl").write_text("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="x"><from-b/></xsl:template>
    </xsl:stylesheet>""")
    main = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:import href="a.xsl"/>
      <xsl:import href="b.xsl"/>
      <xsl:template match="/"><r><xsl:apply-templates select="//x|//y"/></r></xsl:template>
    </xsl:stylesheet>"""
    out = XSLT(main, base_dir=str(tmp_path)).transform_text(
        "<d><x/><y/></d>")
    assert "<from-b/>" in out and "<from-a/>" not in out
    assert "<only-a/>" in out          # a.xsl still fills the gap


def test_sort_order_is_per_key():
    # secondary key descending while primary ascends
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <r><xsl:for-each select="//i">
          <xsl:sort select="@a"/>
          <xsl:sort select="@b" data-type="number" order="descending"/>
          <v><xsl:value-of select="concat(@a, @b)"/></v>
        </xsl:for-each></r>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text(
        "<d><i a='x' b='1'/><i a='x' b='2'/><i a='w' b='3'/></d>")
    assert "<v>w3</v><v>x2</v><v>x1</v>" in out


def test_modes_priority_builtins_and_params():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <r>
          <xsl:apply-templates select="//sec"/>
          <toc><xsl:apply-templates select="//sec" mode="toc"/></toc>
        </r>
      </xsl:template>
      <xsl:template match="sec">
        <xsl:param name="depth" select="'X'"/>
        <body d="{$depth}"><xsl:value-of select="@t"/></body>
      </xsl:template>
      <xsl:template match="sec" mode="toc">
        <li><xsl:value-of select="@t"/></li>
      </xsl:template>
      <xsl:template match="sec[@t='skip']" mode="toc" priority="2"/>
    </xsl:stylesheet>""")
    out = s.transform_text("<d><sec t='one'/><sec t='skip'/></d>")
    assert out.count("<li>") == 1 and "<li>one</li>" in out
    assert '<body d="X">one</body>' in out


def test_for_each_sort_variable_choose():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <r><xsl:for-each select="//i">
          <xsl:sort select="@k"/>
          <xsl:variable name="v"><xsl:value-of select="@k"/>!</xsl:variable>
          <xsl:choose>
            <xsl:when test="@k = 'b'"><hit><xsl:value-of select="$v"/></hit></xsl:when>
            <xsl:otherwise><miss p="{position()}"/></xsl:otherwise>
          </xsl:choose>
        </xsl:for-each></r>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text("<d><i k='c'/><i k='a'/><i k='b'/></d>")
    assert out.endswith('<r><miss p="1"/><hit>b!</hit><miss p="3"/></r>')


def test_numeric_sort_descending():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <r><xsl:for-each select="//i">
          <xsl:sort select="@k" data-type="number" order="descending"/>
          <v><xsl:value-of select="@k"/></v>
        </xsl:for-each></r>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text("<d><i k='9'/><i k='10'/><i k='2'/></d>")
    assert "<v>10</v><v>9</v><v>2</v>" in out


def test_keys_and_generate_id():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:key name="byref" match="//item" use="@ref"/>
      <xsl:template match="/">
        <r>
          <n><xsl:value-of select="count(key('byref', 'a'))"/></n>
          <first><xsl:value-of
            select="generate-id(//item[1]) = generate-id(key('byref','a')[1])"/></first>
        </r>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text(
        "<d><item ref='a' v='1'/><item ref='b'/><item ref='a' v='2'/></d>")
    assert "<n>2</n>" in out and "<first>true</first>" in out


def test_result_tree_fragment_node_set():
    """ext:node-set over a built fragment — the generic.xsl
    aside-annotations idiom."""
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        xmlns:ext="http://exslt.org/common">
      <xsl:template match="/">
        <xsl:variable name="markup">
          <a href="x">one</a><a href="y">two</a>
        </xsl:variable>
        <r n="{count(ext:node-set($markup)/a)}">
          <xsl:copy-of select="ext:node-set($markup)/a[2]"/>
        </r>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text("<d/>")
    assert '<r n="2"><a href="y">two</a></r>' in out


def test_attribute_element_comment_text_instructions():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/">
        <xsl:element name="el">
          <xsl:attribute name="a"><xsl:value-of select="1+1"/></xsl:attribute>
          <xsl:comment>a comment</xsl:comment>
          <xsl:text>  spaced  </xsl:text>
        </xsl:element>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text("<d/>")
    assert '<el a="2"><!--a comment-->  spaced  </el>' in out


def test_avt_escapes_and_copy():
    # {{ }} unescape only inside attribute value templates; xsl:copy
    # rebuilds the element shallowly
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/"><xsl:apply-templates/></xsl:template>
      <xsl:template match="*">
        <xsl:copy>
          <xsl:attribute name="lit">body-is-literal</xsl:attribute>
          <xsl:apply-templates/>
        </xsl:copy>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text("<d><e>t</e></d>")
    assert '<d lit="body-is-literal"><e lit="body-is-literal">t</e></d>' \
        in out
    s2 = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:template match="/"><r a="{{esc}} {1+1}"/></xsl:template>
    </xsl:stylesheet>""")
    assert '<r a="{esc} 2"/>' in s2.transform_text("<d/>")


def test_html_serialization_rules():
    s = XSLT("""<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      <xsl:output method="html" omit-xml-declaration="yes"/>
      <xsl:template match="/">
        <html><head><meta charset="utf-8"/>
          <script>if (1 &lt; 2 &amp;&amp; x) go();</script></head>
        <body><br/><img src="x.png"/><p>a &amp; b</p>
          <div><xsl:value-of select="/d/raw" disable-output-escaping="yes"/></div>
        </body></html>
      </xsl:template>
    </xsl:stylesheet>""")
    out = s.transform_text("<d><raw>&lt;b&gt;bold&lt;/b&gt;</raw></d>")
    assert "<meta charset=\"utf-8\">" in out          # void: no />
    assert "<br>" in out and "<img src=\"x.png\">" in out
    assert "if (1 < 2 && x) go();" in out             # raw script text
    assert "<p>a &amp; b</p>" in out                  # escaped elsewhere
    assert "<div><b>bold</b></div>" in out            # DOE honored


def test_unsupported_instruction_raises():
    with pytest.raises((XSLTError, TransformError)):
        XSLT("""<xsl:stylesheet version="1.0"
            xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="/"><xsl:number/></xsl:template>
        </xsl:stylesheet>""").transform_text("<d/>")


# ---------------------------------------------------------------------------
# The reference's shipped stylesheet corpus

XHTML_DOC = """<html xmlns="http://www.w3.org/1999/xhtml"
      xmlns:dcterms="http://purl.org/dc/terms/"
      about="http://example.org/doc/a">
  <head about="http://example.org/doc/a">
    <title>Document A</title>
    <link rel="stylesheet" href="custom.css"/>
  </head>
  <body about="http://example.org/doc/a">
    <div about="http://example.org/doc/a#S1" content="First section"
         property="dcterms:title" typeof="bibo:DocumentPart">
      <p>Text of the first section.</p>
      <div about="http://example.org/doc/a#S1.1" content="Nested"
           property="dcterms:title"><p>Nested text.</p></div>
    </div>
    <div about="http://example.org/doc/a#S2" content="Second section"
         property="dcterms:title"><p>Second section text.</p></div>
  </body>
</html>"""

CONF_XML = """<configuration>
  <sitename>testsite</sitename>
  <url>http://localhost:8000/</url>
  <search><endpoint>/mysearch/</endpoint></search>
  <tabs>
    <li><a href="http://localhost:8000/dataset/base">Foo</a></li>
    <li><a href="http://localhost:8000/dataset/other">Bar</a></li>
  </tabs>
  <stylesheets><link href="rsrc/css/ferenda.css" rel="stylesheet"/></stylesheets>
  <javascripts><script src="rsrc/js/ferenda.js"> </script></javascripts>
  <footerlinks><a href="/about">About</a></footerlinks>
</configuration>"""

ANN_XML = """<graph xmlns:dcterms="http://purl.org/dc/terms/">
  <resource uri="http://example.org/doc/a#S1">
    <dcterms:isReferencedBy ref="http://example.org/doc/b"/>
  </resource>
  <resource uri="http://example.org/doc/b">
    <dcterms:identifier>Doc B</dcterms:identifier>
  </resource>
</graph>"""


@pytest.fixture(scope="module")
def sitefiles(tmp_path_factory):
    d = tmp_path_factory.mktemp("xsltsite")
    (d / "conf.xml").write_text(CONF_XML)
    (d / "ann.xml").write_text(ANN_XML)
    return d


@refxsl
def test_reference_corpus_compiles():
    import glob
    files = sorted(glob.glob(XSLDIR + "/*.xsl"))
    assert len(files) >= 17
    for f in files:
        XSLT(open(f, encoding="utf-8").read(), base_dir=XSLDIR)


@refxsl
def test_reference_generic_xsl(sitefiles):
    """The reference's main page template (generic.xsl → imports
    annotations-panel.xsl, includes base.xsl → nav-search-form /
    analytics-tracker) applied unmodified to an XHTML+RDFa page."""
    t = Transformer("XSLT", os.path.join(XSLDIR, "generic.xsl"))
    out = t.transform(XHTML_DOC, parameters={
        "annotationfile": str(sitefiles / "ann.xml"),
        "configurationfile": str(sitefiles / "conf.xml")})
    assert out.startswith('<!DOCTYPE html SYSTEM "about:legacy-compat">')
    # headtitle: "<doc title> | <sitename>"
    assert "<title>Document A | testsite</title>" in out
    # config document(): navbar brand, tabs, search endpoint
    assert '<a class="navbar-brand" href="http://localhost:8000/">testsite</a>' in out
    assert '<a href="http://localhost:8000/dataset/base">Foo</a>' in out
    assert 'action="/mysearch/"' in out
    # toc mode over RDFa sections
    assert '<a href="#S1.1">Nested</a>' in out
    # section surgery: @about → <section id>, heading level by depth
    assert '<section id="S1"' in out and "<h2>" in out and "<h3>Nested</h3>" in out
    # annotations aside (document($annotationfile) + ext:node-set)
    assert '<a href="http://example.org/doc/b">Doc B</a>' in out
    # RDFa-only spans removed
    assert 'property="dcterms:title"' not in out
    # nbsp inside script survives (XML-whitespace-only stripping)
    assert " </script>" in out


@refxsl
def test_reference_toc_xsl(sitefiles):
    toc_in = """<html xmlns="http://www.w3.org/1999/xhtml">
  <head><title>Documents by title</title></head>
  <body>
    <div role="main">
      <h2>Starting with b</h2>
      <ul><li><a href="/res/base/b1">B one</a></li></ul>
    </div>
  </body>
</html>"""
    t = Transformer("XSLT", os.path.join(XSLDIR, "toc.xsl"))
    out = t.transform(toc_in, parameters={
        "annotationfile": "", "configurationfile":
        str(sitefiles / "conf.xml")})
    assert "<title>Documents by title</title>" in out
    assert '<div class="maintext">' in out
    assert "<!--Robot metatag goes here-->" in out
    assert '<a href="/res/base/b1">B one</a>' in out
    assert 'class="toc"' in out


@refxsl
def test_reference_rdfxml_grit_xsl():
    """rdfxml-grit.xsl: xsl:key + key(), generate-id() dedup,
    xsl:sort, the namespace axis, nested bnode inlining — the
    heaviest stylesheet in the corpus."""
    rdf_in = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:dcterms="http://purl.org/dc/terms/">
  <rdf:Description rdf:about="http://ex.org/b">
    <dcterms:title>Beta</dcterms:title>
    <dcterms:creator rdf:nodeID="n1"/>
  </rdf:Description>
  <rdf:Description rdf:about="http://ex.org/a">
    <dcterms:title xml:lang="en">Alpha</dcterms:title>
    <dcterms:references rdf:resource="http://ex.org/b"/>
    <dcterms:issued rdf:datatype="http://www.w3.org/2001/XMLSchema#date">2020-01-02</dcterms:issued>
  </rdf:Description>
  <rdf:Description rdf:nodeID="n1">
    <dcterms:title>Someone</dcterms:title>
  </rdf:Description>
</rdf:RDF>"""
    sheet = XSLT(open(os.path.join(XSLDIR, "rdfxml-grit.xsl"),
                      encoding="utf-8").read(), base_dir=XSLDIR)
    out = sheet.transform_text(rdf_in, params={})
    # resources sorted by @rdf:about
    assert out.index('uri="http://ex.org/a"') < out.index(
        'uri="http://ex.org/b"')
    # literal with language
    assert 'xml:lang="en">Alpha</dcterms:title>' in out
    # resource reference
    assert '<dcterms:references ref="http://ex.org/b"/>' in out
    # datatyped literal → fmt="datatype" + nested type element
    assert 'fmt="datatype"' in out and ">2020-01-02</" in out
    # bnode inlined at its single reference site (key()+generate-id())
    assert "<dcterms:creator><dcterms:title>Someone</dcterms:title>" in out
    # namespace axis copied onto the graph element
    assert 'xmlns:dcterms="http://purl.org/dc/terms/"' in out


# ---------------------------------------------------------------------------
# Ray-side plumbing: XSLT as a transform_stage engine

def test_transform_stage_xslt_engine(ray_session):
    import ray.data as rd

    from ferenda_ray.stages.transformer import transform_stage
    style = """<xsl:stylesheet version="1.0"
        xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
        xmlns:xhtml="http://www.w3.org/1999/xhtml"
        exclude-result-prefixes="xhtml">
      <xsl:output method="html" omit-xml-declaration="yes"/>
      <xsl:template match="/">
        <html><body><h1><xsl:value-of select="//xhtml:title"/></h1></body></html>
      </xsl:template>
    </xsl:stylesheet>"""
    rows = [{"repo": "x", "xhtml":
             '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
             f'<title>Doc {i}</title></head><body/></html>'}
            for i in range(8)]
    out = transform_stage(
        rd.from_items(rows),
        repo_specs={"x": {"transformertype": "XSLT",
                          "template": "main.xsl",
                          "templates": {"main.xsl": style}}},
        concurrency=(1, 2)).take_all()
    assert sorted(r["html5"] for r in out) == sorted(
        f"<html><body><h1>Doc {i}</h1></body></html>" for i in range(8))
