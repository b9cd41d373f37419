"""Conformance of the structured citation grammar against the
reference's LegalRef fixture corpus (test/files/legalref/*, driven the
same way as the reference's test/integrationLegalRef.py:42-89: split
paras on ---, honour BASE:/NOBASE:/RESET: directives, compare the
serialized <list>/<str>/<Link> output byte-for-byte).

The skip list mirrors the reference's own expected-failure list
(integrationLegalRef.py:139-145) — those fixtures fail under the
reference parser too.
"""

import ast
import codecs
import os
import re

import pytest

from ferenda_ray.legalref import (KNOWN_ABBREVS, KNOWN_LAWS,
                                  AvgParser, EULagParser,
                                  ForarbetenParser, LegalRefParser,
                                  Link, RattsfallParser, mint_uri,
                                  serialize)

FIXROOT = "/root/reference/test/files/legalref"

#: the reference's own broken-test list (integrationLegalRef.py:140-145)
REFERENCE_BROKEN = {
    "sfs-tricky-bokstavslista.txt",
    "sfs-tricky-eller.txt",
    "sfs-tricky-eller-paragrafer-stycke.txt",
    "sfs-tricky-overgangsbestammelse.txt",
    "sfs-tricky-uppdelat-lagnamn.txt",
    "sfs-tricky-vvfs.txt",
}


def run_fixture(path, mode, short=False):
    with codecs.open(path, encoding="windows-1252") as fp:
        testdata = fp.read()
    parts = re.split(r"\r?\n\r?\n", testdata, 1)
    if len(parts) == 1:
        testdata, want = parts[0], ""
    else:
        testdata, want = parts
    want = want.replace("\r\n", "\n").strip()
    paras = re.split(r"\r?\n---\r?\n", testdata)
    p = LegalRefParser(mode=mode, short=short)
    got_paras = []
    for para in paras:
        base = {"law": "9999:999"}
        if para.startswith("RESET:"):
            p.currentlynamedlaws.clear()
        elif para.startswith("NOBASE:"):
            base = {}
        elif para.startswith("BASE:"):
            b = para.split("\n")[0].split(":", 1)[1]
            base = ast.literal_eval(b)
            para = para.split("\n", 1)[1]
        got_paras.append(p.parse_to_serialized(para, base)
                         .replace("\r\n", "\n").strip())
    got = "\n---\n".join(got_paras).strip()
    assert got == want, f"{os.path.basename(path)}:\n{got}\nWANT:\n{want}"


def _params(subdir):
    d = os.path.join(FIXROOT, subdir)
    if not os.path.isdir(d):     # reference tree absent: skip cleanly
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".txt"))


@pytest.mark.parametrize("fname", _params("Simple"))
def test_simple(fname):
    run_fixture(os.path.join(FIXROOT, "Simple", fname), mode="enkla")


@pytest.mark.parametrize("fname", _params("SFS"))
def test_sfs(fname):
    if fname in REFERENCE_BROKEN:
        pytest.skip("broken under the reference parser too "
                    "(integrationLegalRef.py:140-145)")
    run_fixture(os.path.join(FIXROOT, "SFS", fname), mode="lagrum")


@pytest.mark.parametrize("fname", _params("Short"))
def test_short(fname):
    run_fixture(os.path.join(FIXROOT, "Short", fname), mode="lagrum",
                short=True)


def run_role_fixture(path, parser):
    """Same driver shape as run_fixture but for role parsers with a
    ``parse_to_serialized(text, base_attrs)`` surface (reference
    integrationLegalRef.py:42-89 with LegalRef(FORARBETEN/RATTSFALL));
    BASE: carries prop year/no + kommittensbetankande attrs."""
    with codecs.open(path, encoding="windows-1252") as fp:
        testdata = fp.read()
    parts = re.split(r"\r?\n\r?\n", testdata, 1)
    if len(parts) == 1:
        testdata, want = parts[0], ""
    else:
        testdata, want = parts
    want = want.replace("\r\n", "\n").strip()
    paras = re.split(r"\r?\n---\r?\n", testdata)
    p = parser
    got_paras = []
    for para in paras:
        base = {}
        if para.startswith("BASE:"):
            b = para.split("\n")[0].split(":", 1)[1]
            base = ast.literal_eval(b)
            para = para.split("\n", 1)[1]
        got_paras.append(p.parse_to_serialized(para, base)
                         .replace("\r\n", "\n").strip())
    got = "\n---\n".join(got_paras).strip()
    assert got == want, f"{os.path.basename(path)}:\n{got}\nWANT:\n{want}"


@pytest.mark.parametrize("fname", _params("Regpubl"))
def test_regpubl(fname):
    run_role_fixture(os.path.join(FIXROOT, "Regpubl", fname),
                     ForarbetenParser())


@pytest.mark.parametrize("fname", _params("DV"))
def test_dv(fname):
    run_role_fixture(os.path.join(FIXROOT, "DV", fname),
                     RattsfallParser())


@pytest.mark.parametrize("fname", _params("EGLag"))
def test_eglag(fname):
    run_role_fixture(os.path.join(FIXROOT, "EGLag", fname),
                     EULagParser())


@pytest.mark.parametrize("fname", _params("Avg"))
def test_avg(fname):
    run_role_fixture(os.path.join(FIXROOT, "Avg", fname),
                     AvgParser())


# -- unit surface ----------------------------------------------------------

def test_structured_attrs():
    p = LegalRefParser()
    nodes = p.parse("enligt 2 kap. 3 a § andra stycket 11 i denna lag")
    links = [n for n in nodes if isinstance(n, Link)]
    assert len(links) == 1
    assert links[0].attrs == {"chapter": "2", "section": "3 a",
                              "piece": "2", "item": "11",
                              "law": "9999:999"}
    assert links[0].uri == "https://lagen.nu/9999:999#K2P3aS2N11"


def test_mint_uri_component_order():
    assert mint_uri({"law": "1962:700", "chapter": "4",
                     "section": "9 c"}) \
        == "https://lagen.nu/1962:700#K4P9c"
    assert mint_uri({"law": "1736:0123 s. 2"}) \
        == "https://lagen.nu/1736:0123_s._2"


def test_retroactive_law_resolution():
    p = LegalRefParser()
    nodes = p.parse("se 4 kap. 9 c § och 10 § brottsbalken.")
    links = [n for n in nodes if isinstance(n, Link)]
    assert [l.uri for l in links] == [
        "https://lagen.nu/1962:700#K4P9c",
        "https://lagen.nu/1962:700#K4P10",
        "https://lagen.nu/1962:700"]


def test_named_law_memory():
    p = LegalRefParser()
    p.parse("enligt exempellagen (1999:123) gäller")
    nodes = p.parse("se 3 § exempellagen")
    links = [n for n in nodes if isinstance(n, Link)]
    assert links and links[0].uri == "https://lagen.nu/1999:123#P3"


def test_serialize_escaping():
    out = serialize(["a < b & c"])
    assert out == "<list>\n  <str>a &lt; b &amp; c</str>\n</list>"


def test_known_tables_well_formed():
    for num in list(KNOWN_LAWS.values()) + list(KNOWN_ABBREVS.values()):
        assert re.match(r"\d{4}:\d+( s\. \d+)?$", num)


def test_ecj_cases():
    # the reference's own ECJ fixtures are broken under its parser
    # (integrationLegalRef.py:151-153) so no golden exists; the celex
    # construction is eurattsfall_format_uri (legalref.py:1394-1416)
    from ferenda_ray.legalref import EURattsfallParser
    p = EURattsfallParser()
    links = [n for n in p.parse("By order in Case F‑23/07 M v "
                                "EMEA and Case C-197/09 RX-II")
             if isinstance(n, Link)]
    # the celex is 6 + year + 'C' + descriptor + serial, with the 'C'
    # constant (legalref.py:1373)
    assert [l.uri for l in links] == [
        "https://lagen.nu/ext/celex/62007CW0023",
        "https://lagen.nu/ext/celex/62009CJ0197"]
    # 2-digit years >= 54 resolve to 19xx
    l = [n for n in p.parse("T-65/89") if isinstance(n, Link)]
    assert l[0].uri == "https://lagen.nu/ext/celex/61989CA0065"


def test_multi_role_parser():
    from ferenda_ray.legalref import MultiRoleParser
    p = MultiRoleParser("rattsfall", "forarbeten", "eulag")
    nodes = p.parse("Se NJA 1998 s. 14, prop. 1997/98:44 och "
                    "rådets direktiv 95/46/EG.")
    links = [n for n in nodes if isinstance(n, Link)]
    assert [l.uri for l in links] == [
        "https://lagen.nu/dom/nja/1998s14",
        "https://lagen.nu/prop/1997/98:44",
        "https://lagen.nu/ext/celex/31995L0046"]
    # text nodes survive interleaving
    assert "".join(str(n) for n in nodes) == (
        "Se NJA 1998 s. 14, prop. 1997/98:44 och "
        "rådets direktiv 95/46/EG.")
    with pytest.raises(ValueError):
        MultiRoleParser("nosuchrole")
