"""Structured Swedish statute-citation grammar (LegalRef-class).

Parses *compound* legal references — "2 kap. 3 a § andra stycket 11",
"4 kap. 6 och 7 a-9 §§ rättegångsbalken", "6 § 1 eller 7 § 1 eller 2
förmånsrättslagen (1970:979)" — into STRUCTURED attributes
(law / chapter / section / piece / item / sentence), mints
lagen.nu-style URIs from them, and re-serializes the text as an
interleaved ``<list>`` of ``<str>`` and ``<Link uri="...">`` nodes.

Conformance target: the reference's LegalRef fixture corpus
(``/root/reference/test/files/legalref/{Simple,SFS}/*.txt``, driven by
``test/integrationLegalRef.py:42-89``).  The reference implements this
with a ~1,500-line EBNF grammar compiled by simpleparse plus ~30
``format_*`` productions (``ferenda/sources/legal/se/legalref.py:
225-394, 883-1447``); this module re-derives the SEMANTICS from the
fixture corpus as a hand-written cursor/recursive-descent parser —
no grammar file, no rdflib, no minter graph.

Key behaviors (each pinned by a fixture):

* list grouping: sections share a trailing mark ("22, 23 och 26 §§"
  → three links, last one includes "§§"); pieces share a trailing
  "styckena" and the FIRST piece merges with its section ("12 §
  första och andra styckena" → "12 § första" + "andra styckena").
* merge rules: a singular chain is ONE link ("2 kap. 3 a § andra
  stycket 11"); a chapter with multiple sections links separately
  ("7 kap." + "22" + "23" + "26 §§"); an item under an explicit piece
  merges into it unless it opens an interval ("tredje stycket 2, 3
  eller 4" merges the 2; "andra stycket 2-4" does not).
* law resolution is RETROACTIVE: a law name at the end of a compound
  patches every link before it; a named law with ONE preceding ref
  merges into that link ("12 § delgivningslagen (1970:428)"), with
  several it gets its own link; generic words (lagen / förordningen /
  kungörelsen) never merge — only the parenthesized SFS number links
  ("lagen (" + <Link>1998:674</Link> + ")").
* session state: ``currentlynamedlaws`` remembers "påhittadelagen
  (1960:729)" so a later bare "påhittadelagen" resolves; ``lastlaw``
  feeds "samma lag" (which merges into the preceding link).
"""

from __future__ import annotations

import re
from xml.sax.saxutils import escape, quoteattr

# ---------------------------------------------------------------------------
# vocabulary

ORDINALS = {
    "första": 1, "andra": 2, "tredje": 3, "fjärde": 4, "femte": 5,
    "sjätte": 6, "sjunde": 7, "åttonde": 8, "nionde": 9, "tionde": 10,
    "elfte": 11, "tolfte": 12, "trettonde": 13, "fjortonde": 14,
    "femtonde": 15, "sextonde": 16, "sjuttonde": 17, "artonde": 18,
    "nittonde": 19, "tjugonde": 20,
}

#: Well-known Swedish statutes cited by name alone (public facts —
#: each act's SFS number is published law).
KNOWN_LAWS = {
    "successionsordningen": "1810:0926",
    "handelsbalken": "1736:0123 s. 2",
    "rättegångsbalken": "1942:740",
    "tryckfrihetsförordningen": "1949:105",
    "föräldrabalken": "1949:381",
    "ärvdabalken": "1958:637",
    "brottsbalken": "1962:700",
    "jordabalken": "1970:994",
    "regeringsformen": "1974:152",
    "sekretesslagen": "1980:100",
    "utsökningsbalken": "1981:774",
    "äktenskapsbalken": "1987:230",
    "yttrandefrihetsgrundlagen": "1991:1469",
    "miljöbalken": "1998:808",
    "socialförsäkringsbalken": "2010:110",
    "upphovsrättslagen": "1960:729",
    "varumärkeslagen": "1960:644",
    "skattebetalningslagen": "1997:483",
    "inkomstskattelagen": "1999:1229",
    "personuppgiftslagen": "1998:204",
    "delgivningslagen": "1970:428",
    "arbetsmiljölagen": "1977:1160",
    "körkortsförordningen": "1998:980",
    "luftfartslagen": "1957:297",
}

#: KORTLAGRUM abbreviations (public facts: each is the customary
#: short form of a published statute).
KNOWN_ABBREVS = {
    "RF": "1974:152", "TF": "1949:105", "YGL": "1991:1469",
    "BrB": "1962:700", "RB": "1942:740", "HB": "1736:0123 s. 2",
    "JB": "1970:994", "FB": "1949:381", "ÄB": "1958:637",
    "ÄktB": "1987:230", "UB": "1981:774", "MB": "1998:808",
    "MBL": "1976:580", "LAS": "1982:80", "AML": "1977:1160",
    "OSL": "2009:400", "PUL": "1998:204", "IL": "1999:1229",
    "SekrL": "1980:100", "URL": "1960:729", "VML": "1960:644",
    "KL": "1991:900", "SFB": "2010:110",
}

GENERIC_LAW_WORDS = ("lagen", "förordningen", "kungörelsen")

_WS = r"[ \t\r\n\xa0]+"
_RE_WS = re.compile(_WS)
# a statute number like 1998:674 / 1736:0123 s. 2
_RE_SFSNUM = re.compile(r"(\d{4}:\d+(?:\s?s\.\s?\d+)?)")
# ordinal number, optionally with a section letter ("7 a").  The
# letter 'i' doubles as the preposition "i"; accept it only when a §
# follows ("26 i §"), never in "2 i denna paragraf".
_RE_NUM = re.compile(
    r"(\d+)(?:(?:[ \xa0]|\r?\n)([a-hj-z])(?![\wåäöÅÄÖ])"
    r"|(?:[ \xa0]|\r?\n)(i)(?=[ \r\n\xa0]*§))?")
_RE_CHAPWORD = re.compile(r"[kK]ap(\.|(?=[ \r\n\xa0]))")
_RE_MARK = re.compile(r"§§?")
_RE_SEP = re.compile(r"(?:,[ \r\n\xa0]+(?:och[ \r\n\xa0]+|eller[ \r\n\xa0]+|samt[ \r\n\xa0]+)?"
                     r"|[ \r\n\xa0]+(?:och|eller|samt)[ \r\n\xa0]+"
                     r"|[ \r\n\xa0]*-[ \r\n\xa0]*)")
_RE_ORD = re.compile("(" + "|".join(ORDINALS) + r")(?![\wåäö])")
_RE_NUMST = re.compile(r"(\d+)[ \r\n\xa0]+st\.?(?![\wåäö])")
_RE_PIECEWORD = re.compile(r"stycket|styckena")
_RE_NUMMOM = re.compile(r"(\d+)[ \r\n\xa0]+mom\.?(?![\wåäö])")
_RE_ORDPUNKT = re.compile(
    "(" + "|".join(ORDINALS) + r")[ \r\n\xa0]+punkten(?![\wåäö])")
_RE_MENING = re.compile(
    r"[ \r\n\xa0]+(" + "|".join(ORDINALS) + r")[ \r\n\xa0]+meningen(?![\wåäö])")
_RE_SAMMALAG = re.compile(
    r"samma[ \r\n\xa0]+"
    r"(?:lag|förordning|balk|kungörelse)(?![\wåäö])")
_RE_DOT = re.compile(r"[.)](?=[ \r\n\xa0]|$)")
_RE_IKW = re.compile(r"i[ \r\n\xa0]+")
_RE_LPAREN = re.compile(r"[ \r\n\xa0]*\(")
_RE_RPAREN = re.compile(r"\)")
_NAME_CORE = (r"[A-ZÅÄÖa-zåäö][a-zåäö-]*"
              r"(?:lagen|balken|förordningen|formen|ordningen|grundlagen|kungörelsen|stadgan)"
              r"s?(?![\wåäö])")
_RE_LAWNAME = re.compile(r"(?:[a-zåäö]+-[ \r\n\xa0]+och[ \r\n\xa0]+)?" + _NAME_CORE)
_RE_GENERIC = re.compile(
    r"([Ll]agen|lag|[Ff]örordningen|[Ff]örordning"
    r"|[Kk]ungörelsen|[Kk]ungörelse)"
    r"[ \r\n\xa0]*\(")
_RE_BARE_PAREN = re.compile(r"\([ \r\n\xa0]*")

_RE_CHANGELAW = re.compile(r"Lag[ \r\n\xa0]*\((\d{4}:\d+)\)\.?")

#: AbbrevLawShortRef: 'TF 1:1 [4 st.]' (kortlagrum.ebnf
#: ShortChapterSectionRef + PieceRef = ordinal ws PieceOrPieces)
_RE_ABBREV_SHORT = re.compile(
    r"([A-ZÅÄÖ][A-Za-zÅÄÖåäö]{1,6})[ \r\n\xa0]+(\d+):(\d+)(?![\d:])"
    r"(?:[ \r\n\xa0]+(\d+)[ \r\n\xa0]+st(?:\.|ycket)?(?![\wåäö]))?")

#: coarse scan for possible compound-reference starts
_RE_START = re.compile(
    r"Lag[ \r\n\xa0]*\(|"
    r"\d|" + "|".join(ORDINALS) +
    r"|[A-ZÅÄÖa-zåäö][a-zåäö-]*"
    r"(?:lagen|balken|förordningen|formen|ordningen|grundlagen|kungörelsen|stadgan)s?\b"
    r"|(?:[Ll]agen|lag|[Ff]örordningen|[Ff]örordning"
    r"|[Kk]ungörelsen|[Kk]ungörelse)[ \r\n\xa0]*\("
    r"|\([ \r\n\xa0]*\d{4}:\d")


class Link(str):
    """A linked span of text with a minted URI and structured attrs."""
    def __new__(cls, text, uri, attrs=None):
        o = super().__new__(cls, text)
        o.uri = uri
        o.attrs = dict(attrs or {})
        return o


def serialize(nodes) -> str:
    """``ferenda.elements.serialize``-compatible XML for a flat node
    list: ``<list>`` wrapping ``<str>`` / ``<Link uri="...">``."""
    if not nodes:
        return "<str />"
    out = ["<list>"]
    for n in nodes:
        if isinstance(n, Link):
            out.append("  <Link uri=%s>%s</Link>"
                       % (quoteattr(n.uri), escape(str(n))))
        else:
            out.append("  <str>%s</str>" % escape(str(n)))
    out.append("</list>")
    return "\n".join(out)


def _fmt_comp(v) -> str:
    return str(v).replace(" ", "").replace("\n", "")


ATTR_ORDER = (("chapter", "K"), ("section", "P"), ("moment", "O"),
              ("piece", "S"), ("item", "N"), ("sentence", "M"))


def mint_uri(attrs: dict, base: str = "https://lagen.nu/") -> str:
    """lagen.nu-style URI from structured attrs
    (law, chapter, section, piece, item, sentence)."""
    law = str(attrs.get("law", "")).replace(" ", "_")
    frag = "".join(prefix + _fmt_comp(attrs[k])
                   for k, prefix in ATTR_ORDER
                   if attrs.get(k) is not None)
    return base + law + ("#" + frag if frag else "")


class _Ref:
    """One pending link: character span + structured attrs."""
    __slots__ = ("start", "end", "attrs")

    def __init__(self, start, end, attrs):
        self.start, self.end, self.attrs = start, end, dict(attrs)


class _Fail(Exception):
    pass


class _Cursor:
    __slots__ = ("s", "i")

    def __init__(self, s: str, i: int = 0):
        self.s, self.i = s, i

    def clone(self):
        return _Cursor(self.s, self.i)

    def match(self, rx):
        m = rx.match(self.s, self.i)
        if m:
            self.i = m.end()
        return m

    def peek(self, rx):
        return rx.match(self.s, self.i)


def _numval(m) -> str:
    letter = m.group(2) or m.group(3)
    return m.group(1) + ((" " + letter) if letter else "")


class LegalRefParser:
    """LAGRUM-style parser with session state (named-law memory)."""

    def __init__(self, base: str = "https://lagen.nu/",
                 mode: str = "lagrum", short: bool = False):
        #: "lagrum" (full grammar) or "enkla" (simple-references
        #: profile).  The one observable difference in the fixture
        #: corpus: "enkla" merges a chapter-only ref with a following
        #: named law ("2 kap. tryckfrihetsförordningen" is ONE link),
        #: "lagrum" links them separately.
        self.base = base
        self.mode = mode
        self.short = short    # KORTLAGRUM: resolve "3 § MBL"
        self.currentlynamedlaws: dict[str, str] = {}
        self.lastlaw: str | None = None
        self._pending: list[_Ref] = []
        self._cur_chapter: str | None = None

    # -- public API ---------------------------------------------------

    def parse(self, text: str, base_attrs: dict | None = None):
        """Parse one paragraph -> flat list of str / Link nodes."""
        if base_attrs is None:
            base_attrs = {"law": "9999:999"}
        refs: list[_Ref] = []
        if self.short:
            # AbbrevLawShortRef (kortlagrum.ebnf:7-10): 'TF 1:1',
            # 'JB 22:2 4 st.' — abbreviation FIRST, then
            # chapter:section, optional piece.  The suffix form
            # ('10 kap. 1 § ÄB') is handled in the law tail below.
            for m in _RE_ABBREV_SHORT.finditer(text):
                if m.group(1) not in KNOWN_ABBREVS:
                    continue
                law = KNOWN_ABBREVS[m.group(1)]
                attrs = {"law": law, "chapter": m.group(2),
                         "section": m.group(3)}
                if m.group(4):
                    attrs["piece"] = m.group(4)
                refs.append(_Ref(m.start(), m.end(), attrs))
                self.lastlaw = law
        pos = 0
        while True:
            m = _RE_START.search(text, pos)
            if not m:
                break
            cur = _Cursor(text, m.start())
            cm = cur.peek(_RE_CHANGELAW)
            if cm and text[m.start():m.start() + 4] == "Lag " \
                    or (cm and text[m.start():m.start() + 4] == "Lag("):
                cur.i = cm.end()
                law = base_attrs.get("law") or self.lastlaw or ""
                r = _Ref(m.start(), cm.end(), {"law": law})
                r.attrs["_changelaw"] = cm.group(1)
                refs.append(r)
                pos = cm.end()
                continue
            if text[m.start()] == "(":
                pc = _Cursor(text, m.start())
                pc.match(_RE_BARE_PAREN)
                nm = pc.match(_RE_SFSNUM)
                if nm and pc.peek(re.compile(r"[ \r\n\xa0]*\)")):
                    law = nm.group(1)
                    self.lastlaw = law
                    refs.append(_Ref(nm.start(), nm.end(),
                                     {"law": law, "_lawroot": True}))
                    pos = nm.end()
                else:
                    pos = m.start() + 1
                continue
            try:
                got = self._compound(cur, base_attrs)
            except _Fail:
                got = None
            if got:
                refs.extend(got)
                pos = max(cur.i, m.start() + 1)
            else:
                pos = m.start() + 1
        return self._assemble(text, refs)

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))

    # -- node assembly ------------------------------------------------

    def _assemble(self, text, refs):
        nodes = []
        last = 0
        for r in sorted(refs, key=lambda r: r.start):
            if r.start < last:      # overlap safety: drop
                continue
            if r.start > last:
                nodes.append(text[last:r.start])
            if r.attrs.get("_changelaw"):
                uri = (mint_uri({"law": r.attrs["law"]}, self.base)
                       + "#L" + r.attrs["_changelaw"])
            elif r.attrs.get("_lawroot"):
                uri = mint_uri({"law": r.attrs["law"]}, self.base)
            else:
                uri = mint_uri(r.attrs, self.base)
            nodes.append(Link(text[r.start:r.end], uri, r.attrs))
            last = r.end
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes
                if isinstance(n, Link) or n != ""]

    # -- compound reference -------------------------------------------

    def _compound(self, cur: _Cursor, base_attrs: dict):
        """Parse a maximal run of reference groups + optional law
        tail.  Returns all link _Refs (law resolved)."""
        refs: list[_Ref] = []
        got_any = False
        self._cur_chapter = None   # chapter/section context flows
        self._cur_section = None   # across groups within a compound
        while True:
            before = cur.i
            try:
                part = self._ref_group(cur)
            except _Fail:
                cur.i = before
                break
            refs.extend(part)
            got_any = True
            save = cur.i
            if not cur.match(_RE_SEP):
                break
            probe = cur.clone()
            saved_pending = self._pending
            saved_ch = self._cur_chapter
            saved_sec = self._cur_section
            self._pending = []
            try:
                self._ref_group(probe)
                ok = True
            except _Fail:
                ok = False
            finally:
                self._pending = saved_pending
                self._cur_chapter = saved_ch
                self._cur_section = saved_sec
            if not ok:
                cur.i = save
                break
        law_refs = self._law_tail(cur, refs)
        if not got_any and not law_refs:
            raise _Fail()
        for r in refs:
            if r.attrs.get("law") is None:
                r.attrs["law"] = base_attrs.get("law") or self.lastlaw
            if r.attrs.get("law") is None:
                raise _Fail()
        return refs + law_refs

    # -- one group ----------------------------------------------------

    def _ref_group(self, cur: _Cursor):
        """chapter ref | section group | bare piece chain.  Extra
        links produced inside chains (piece lists, item lists) are
        accumulated on self._pending and folded into the result."""
        saved = self._pending
        self._pending = []
        try:
            main = self._ref_group_inner(cur)
            return main + self._pending
        finally:
            self._pending = saved

    def _ref_group_inner(self, cur: _Cursor):
        start = cur.i
        save = cur.i
        ch = self._chapter(cur)
        if ch is not None:
            ch_num, ch_end = ch
            save2 = cur.i
            if cur.match(_RE_WS):
                try:
                    sec_refs, merged = self._section_group(
                        cur, chapter=ch_num, merge_start=start)
                    if merged:
                        return sec_refs
                    return [_Ref(start, ch_end,
                                 {"chapter": ch_num})] + sec_refs
                except _Fail:
                    cur.i = save2
            else:
                cur.i = save2
            return [_Ref(start, ch_end, {"chapter": ch_num})]
        cur.i = save
        try:
            sec_refs, _ = self._section_group(
                cur, chapter=None, merge_start=start,
                inherit_ch=self._cur_chapter)
            return sec_refs
        except _Fail:
            cur.i = save
        return self._piece_chain_bare(cur)

    def _chapter(self, cur: _Cursor):
        m = cur.match(_RE_NUM)
        if not m:
            return None
        num = _numval(m)
        if not cur.match(_RE_WS):
            return None
        if not cur.match(_RE_CHAPWORD):
            return None
        self._cur_chapter = num
        return num, cur.i

    # -- section group ------------------------------------------------

    def _section_group(self, cur: _Cursor, chapter, merge_start,
                       inherit_ch=None):
        """NUM (SEP NUM)* terminated by §/§§ after the last element.
        Returns (refs, merged_with_chapter)."""
        elems = []          # [start, end, num]
        while True:
            st = cur.i
            m = cur.match(_RE_NUM)
            if not m:
                raise _Fail()
            elems.append([st, cur.i, _numval(m)])
            save = cur.i
            cur.match(_RE_WS)
            mark = cur.match(_RE_MARK)
            if mark:
                plural = mark.group(0) == "§§"
                mark_end = cur.i
                break
            cur.i = save
            if not cur.match(_RE_SEP):
                raise _Fail()
        ch_ctx = chapter if chapter is not None else inherit_ch
        ctx = {"chapter": ch_ctx} if ch_ctx is not None else {}
        self._cur_section = elems[-1][2]
        if len(elems) == 1 and not plural:
            attrs = dict(ctx, section=elems[0][2])
            pend0 = len(self._pending)
            end, attrs = self._chain_after_section(cur, mark_end, attrs)
            # a sub-list (piece list, item list) below the section
            # un-merges the chapter ("6 kap." + "2 § 3 st." + "4 st.")
            sub_list = len(self._pending) > pend0
            if chapter is not None and sub_list:
                return ([_Ref(elems[0][0], end, attrs)], False)
            return ([_Ref(merge_start if chapter is not None
                          else elems[0][0], end, attrs)],
                    chapter is not None)
        refs = []
        for k, (st, en, num) in enumerate(elems):
            end = mark_end if k == len(elems) - 1 else en
            refs.append(_Ref(st, end, dict(ctx, section=num)))
        return refs, False

    # -- chain after a singular "X §" ---------------------------------

    def _chain_after_section(self, cur: _Cursor, end, attrs):
        save = cur.i
        if not cur.match(_RE_WS):
            return end, attrs
        # "5 mom." (older statutes) -> O fragment
        m = cur.match(_RE_NUMMOM)
        if m:
            attrs["moment"] = m.group(1)
            return self._samma_lag(cur, cur.i, attrs)
        # "2 st." numeric piece (possibly a list: "3 st. och 4 st.")
        m = cur.match(_RE_NUMST)
        if m:
            attrs["piece"] = m.group(1)
            end2 = cur.i
            base = {k: v for k, v in attrs.items() if k != "piece"}
            got_list = False
            while True:
                save2 = cur.i
                if not cur.match(_RE_SEP):
                    break
                st2 = cur.i
                m2 = cur.match(_RE_NUMST)
                if not m2:
                    cur.i = save2
                    break
                self._pending.append(
                    _Ref(st2, cur.i, dict(base, piece=m2.group(1))))
                got_list = True
            if got_list:
                return end2, attrs
            return self._items_after_piece(cur, end2, attrs)
        # ordinal piece (possibly a shared-suffix list)
        if cur.peek(_RE_ORD):
            return self._piece_list(cur, end, attrs)
        # letter item: "10 § f och ..." -> P10S1Nf
        ml = cur.peek(re.compile(r"([a-hj-z])(?![\wåäöÅÄÖ])"))
        if ml:
            cur.i = ml.end()
            attrs.update(piece="1", item=ml.group(1))
            return cur.i, attrs
        # "anvisningarna punkt 4 [första stycket]" (older tax law)
        ma = cur.match(re.compile(
            r"anvisningarna[ \r\n\xa0]+punkt[ \r\n\xa0]+(\d+)"))
        if ma:
            attrs["item"] = ma.group(1)
            attrs["piece"] = "1"
            save3 = cur.i
            mo2 = cur.match(re.compile(
                r"[ \r\n\xa0]+(" + "|".join(ORDINALS)
                + r")[ \r\n\xa0]+stycket(?![\wåäö])"))
            if mo2:
                attrs["piece"] = str(ORDINALS[mo2.group(1)])
            else:
                cur.i = save3
            return cur.i, attrs
        # bare number => item under implicit piece 1
        m = cur.peek(_RE_NUM)
        if m and not self._is_section_start(cur.s, m):
            cur.i = m.end()
            item = _numval(m)
            save2 = cur.i
            sep = cur.match(_RE_SEP)
            nxt = cur.match(_RE_NUM) if sep else None
            if nxt and not self._is_section_start(cur.s, nxt):
                # item LIST: section keeps its own link, items apart
                cur.i = save2
                self._pending.append(
                    _Ref(m.start(), m.end(),
                         dict(attrs, piece="1", item=item)))
                self._pending.extend(
                    self._item_list(cur, dict(attrs, piece="1")))
                return end, attrs
            cur.i = save2
            dm = _RE_DOT.match(cur.s, m.end())
            attrs.update(piece="1", item=item)
            cur.i = dm.end() if dm else m.end()
            return self._samma_lag(cur, cur.i, attrs)
        cur.i = save
        return self._samma_lag(cur, end, attrs)

    def _is_section_start(self, s, m):
        """True if the number at match m starts a NEW section/chapter
        ref ('12 §', '11 kap.') rather than an item."""
        probe = _Cursor(s, m.end())
        probe.match(_RE_WS)
        if probe.peek(_RE_MARK):
            return True
        if probe.peek(_RE_CHAPWORD):
            return True
        return False

    def _samma_lag(self, cur: _Cursor, end, attrs):
        # handled in the law tail (merge rules need the whole
        # compound); chain level is a no-op now
        return end, attrs

    # -- piece (stycke) handling --------------------------------------

    def _piece_list(self, cur: _Cursor, end, attrs):
        """ORD (SEP ORD)* (stycket|styckena) with a shared suffix
        word.  A single piece merges (and may chain items); in a
        list the FIRST piece merges into the section link and the
        rest are queued separately (last one includes the word)."""
        elems = []
        while True:
            st = cur.i
            m = cur.match(_RE_ORD)
            if not m:
                raise _Fail()
            elems.append([st, cur.i, ORDINALS[m.group(1)]])
            save = cur.i
            if cur.match(_RE_WS):
                w = cur.match(_RE_PIECEWORD)
                if w:
                    word_end = cur.i
                    break
            cur.i = save
            if not cur.match(_RE_SEP):
                raise _Fail()
        if len(elems) == 1:
            attrs["piece"] = str(elems[0][2])
            return self._items_after_piece(cur, word_end, attrs)
        first = elems[0]
        base = {k: v for k, v in attrs.items()}
        for k, (st, en, num) in enumerate(elems[1:], 1):
            e = word_end if k == len(elems) - 1 else en
            self._pending.append(_Ref(st, e, dict(base,
                                                  piece=str(num))))
        attrs["piece"] = str(first[2])
        return first[1], attrs

    def _items_after_piece(self, cur: _Cursor, end, attrs):
        """Items after an explicit piece: a directly-adjacent item
        merges unless it opens an interval; SEP-joined items queue
        separately; then sentence / samma lag."""
        save = cur.i
        if cur.match(_RE_WS):
            m = cur.peek(_RE_NUM)
            if m and not self._is_section_start(cur.s, m):
                probe = _Cursor(cur.s, m.end())
                dash = probe.match(re.compile(r"[ \r\n\xa0]*-[ \r\n\xa0]*"))
                if dash and probe.peek(_RE_NUM):
                    # interval: no merge, all items separate
                    cur.i = save
                    self._pending.extend(
                        self._item_list(cur, dict(attrs), lead=True))
                    return end, attrs
                cur.i = m.end()
                dm = cur.match(_RE_DOT)
                item_end = cur.i
                attrs["item"] = _numval(m)
                rest = self._item_list(cur, {k: v for k, v in
                                             attrs.items()
                                             if k != "item"})
                self._pending.extend(rest)
                if rest:
                    return item_end, attrs
                return self._samma_lag(cur, item_end, attrs)
            mo = cur.match(_RE_ORDPUNKT)
            if mo:
                attrs["item"] = str(ORDINALS[mo.group(1)])
                return self._sentence(cur, cur.i, attrs)
        cur.i = end
        rest = self._item_list(cur, dict(attrs))
        if rest:
            self._pending.extend(rest)
            return end, attrs
        cur.i = save
        return self._sentence(cur, end, attrs)

    def _sentence(self, cur: _Cursor, end, attrs):
        save = cur.i
        cur.i = end
        m = cur.match(_RE_MENING)
        if m:
            attrs["sentence"] = str(ORDINALS[m.group(1)])
            return cur.i, attrs
        cur.i = max(save, end)
        return self._samma_lag(cur, end, attrs)

    def _item_list(self, cur: _Cursor, base, lead=False):
        """(SEP NUM[letter][.])* — items as separate links.  With
        lead=True the first element needs only whitespace before it
        (interval head)."""
        out = []
        first = lead
        while True:
            save = cur.i
            if first:
                if not cur.match(_RE_WS):
                    cur.i = save
                    break
                first = False
            else:
                if not cur.match(_RE_SEP):
                    cur.i = save
                    break
            m = cur.match(_RE_NUM)
            if not m or self._is_section_start(cur.s, m):
                cur.i = save
                break
            end = cur.i
            dm = cur.match(_RE_DOT)
            if dm:
                end = cur.i
            out.append(_Ref(m.start(), end,
                            dict(base, item=_numval(m))))
            if dm:
                break
        return out

    # -- bare piece chain ("tredje stycket 2 b") ----------------------

    def _piece_chain_bare(self, cur: _Cursor):
        start = cur.i
        if not cur.peek(_RE_ORD):
            raise _Fail()
        # a bare piece after a sectioned group inherits its context
        # ("3 § fjärde stycket 2 eller femte stycket" -> P3S5)
        attrs: dict = {}
        if self._cur_section is not None:
            attrs["section"] = self._cur_section
            if self._cur_chapter is not None:
                attrs["chapter"] = self._cur_chapter
        end, attrs = self._piece_list(cur, cur.i, attrs)
        return [_Ref(start, end, attrs)]

    # -- law tail ------------------------------------------------------

    def _law_tail(self, cur: _Cursor, refs):
        """Optional law after the groups; resolves + patches refs.
        Returns law-root link refs (possibly empty)."""
        save = cur.i
        ws = cur.match(_RE_WS)
        if refs and not ws:
            return []
        cur.match(_RE_IKW)
        law_start = cur.i
        m = cur.match(_RE_GENERIC)
        if m:
            cur.match(_RE_WS)
            num_start = cur.i
            nm = cur.match(_RE_SFSNUM)
            cur.match(_RE_WS)
            if nm and cur.match(_RE_RPAREN):
                law = nm.group(1)
                self.lastlaw = law
                self._patch(refs, law)
                return [_Ref(num_start, nm.end(),
                             {"law": law, "_lawroot": True})]
            cur.i = save
            return []
        if self.short:
            am = cur.match(re.compile(
                r"([A-ZÅÄÖ][A-Za-zÅÄÖåäö]{1,6})(?![\wåäö])"))
            if am and am.group(1) in KNOWN_ABBREVS:
                law = KNOWN_ABBREVS[am.group(1)]
                self.lastlaw = law
                self._patch(refs, law)
                if (len(refs) == 1
                        and refs[0].attrs.get("section") is not None):
                    refs[0].end = cur.i
                    return []
                return [_Ref(law_start, cur.i,
                             {"law": law, "_lawroot": True})]
            elif am:
                cur.i = law_start
        sm = cur.match(_RE_SAMMALAG)
        if sm:
            law = self.lastlaw
            if law is None:
                cur.i = save
                return []
            self._patch(refs, law)
            if (len(refs) == 1
                    and (self.mode == "enkla"
                         or refs[0].attrs.get("section") is not None)):
                refs[0].end = cur.i
            return []
        nm = cur.match(_RE_LAWNAME)
        if nm:
            name = nm.group(0)
            key = re.sub(r"[ \r\n\xa0]+", " ", name.lower())
            if key not in self._known() and key.endswith("s") \
                    and key[:-1] in self._known():
                key = key[:-1]
            name_end = cur.i
            law = None
            save2 = cur.i
            if cur.match(_RE_LPAREN):
                snm = cur.match(_RE_SFSNUM)
                if snm and cur.match(_RE_RPAREN):
                    law = snm.group(1)
                    name_end = cur.i
                    self.currentlynamedlaws[key] = law
                else:
                    cur.i = save2
            if law is None:
                law = self._known().get(key)
            if law is None:
                raise _Fail()
            self.lastlaw = law
            self._patch(refs, law)
            mergeable = (len(refs) == 1
                         and (self.mode == "enkla"
                              or refs[0].attrs.get("section")
                              is not None))
            if mergeable:
                refs[0].end = name_end
                cur.i = name_end
                return []
            cur.i = name_end
            return [_Ref(law_start, name_end,
                         {"law": law, "_lawroot": True})]
        cur.i = save
        return []

    def _known(self):
        d = dict(KNOWN_LAWS)
        d.update(self.currentlynamedlaws)
        return d

    def _patch(self, refs, law):
        for r in refs:
            if r.attrs.get("law") is None:
                r.attrs["law"] = law


# ===========================================================================
# FORARBETEN: preparatory-works references (prop./SOU/Ds/bet./rskr.,
# page refs, avsnitt refs, celex numbers).  Reference grammar:
# ferenda/sources/legal/se/legalref.py (FORARBETEN role) with the
# test corpus test/files/legalref/Regpubl/*.txt; re-derived from the
# fixtures as regex productions.

_RE_F_PROP = re.compile(
    r"[Pp]rop\.[ \r\n\xa0]*(\d{4}(?:/\d{2,4})?)[ \r\n\xa0]*:"
    r"[ \r\n\xa0]*([A-Z][ \r\n\xa0]?)?(\d+)")
_RE_F_PROP_NR = re.compile(
    r"[Pp]rop\.[ \r\n\xa0]+nr[ \r\n\xa0]+(\d+)/(\d{4})")
_RE_F_PROP_YRNR = re.compile(
    r"[Pp]rop\.[ \r\n\xa0]+(\d{4})[ \r\n\xa0]+nr[ \r\n\xa0]+(\d+)")
_RE_F_APROP = re.compile(r"a\.[ \r\n\xa0]+prop\.")
_RE_F_SOU = re.compile(r"SOU[ \r\n\xa0]+(\d{4}):(\d+)")
_RE_F_DS = re.compile(r"Ds[ \r\n\xa0]+(\d{4}):(\d+)")
_RE_F_BET = re.compile(r"bet\.[ \r\n\xa0]+(\d{4}/\d{2,4}):([A-Za-z]+\d+)")
_RE_F_RSKR = re.compile(r"rskr\.[ \r\n\xa0]+(\d{4}/\d{2,4}):(\d+)")
_RE_F_CELEX = re.compile(r"(3\d{4}[LRDE]\d{4}|3\d{2}[LRDE]\d{4})(?!\d)")
_RE_F_PAGE = re.compile(r",?[ \r\n\xa0]+s\.[ \r\n\xa0]*(\d+)")
_RE_F_PAGESEP = re.compile(
    r"(?:[ \r\n\xa0]*-[ \r\n\xa0]*|,[ \r\n\xa0]+(?:och[ \r\n\xa0]+)?"
    r"|[ \r\n\xa0]+och[ \r\n\xa0]+)")
_RE_F_NUM = re.compile(r"(\d+)(?![\d.])")
_RE_F_AVSNITT = re.compile(r"avsnitt[ \r\n\xa0]+(\d+(?:\.\d+)*)")
_RE_F_SECNUM = re.compile(r"(\d+(?:\.\d+)+)")
_RE_F_BETANK = re.compile(
    r"[ \r\n\xa0]+i[ \r\n\xa0]+kommitténs[ \r\n\xa0]+betänkande")

_RE_F_START = re.compile(
    r"[Pp]rop\.|SOU[ \r\n\xa0]+\d|Ds[ \r\n\xa0]+\d|bet\.[ \r\n\xa0]+\d"
    r"|rskr\.[ \r\n\xa0]+\d|a\.[ \r\n\xa0]+prop\.|avsnitt[ \r\n\xa0]+\d"
    r"|3\d{2,4}[LRDE]\d{4}")


class ForarbetenParser:
    """FORARBETEN-role parser: references to Swedish preparatory
    works.  ``lastref`` feeds "a. prop."; BASE attrs (type/year/no/
    kommittensbetankande) feed "avsnitt" references."""

    def __init__(self, base: str = "https://lagen.nu/"):
        self.base = base
        self.lastref: tuple | None = None   # (doctype, ordinal)

    def parse(self, text: str, base_attrs: dict | None = None):
        base_attrs = base_attrs or {}
        refs: list[_Ref] = []
        pos = 0
        while True:
            m = _RE_F_START.search(text, pos)
            if not m:
                break
            end = self._one(text, m.start(), refs, base_attrs)
            pos = end if end > m.start() else m.start() + 1
        nodes = []
        last = 0
        for r in sorted(refs, key=lambda r: r.start):
            if r.start < last:
                continue
            if r.start > last:
                nodes.append(text[last:r.start])
            nodes.append(Link(text[r.start:r.end], r.attrs["uri"],
                              r.attrs))
            last = r.end
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes if isinstance(n, Link) or n != ""]

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))

    # -- helpers ------------------------------------------------------

    def _uri(self, doctype, ordinal, page=None, section=None):
        u = f"{self.base}{doctype}/{ordinal}"
        if page is not None:
            u += f"#sid{page}"
        elif section is not None:
            u += "#S" + section.replace(".", "-")
        return u

    def _one(self, s, i, refs, base_attrs):
        cur = _Cursor(s, i)
        # --- document references -----------------------------------
        doc = None
        m = cur.match(_RE_F_PROP_NR)
        if m:
            doc = ("prop", f"{m.group(2)}:{m.group(1)}")
        if doc is None:
            m = cur.match(_RE_F_PROP_YRNR)
            if m:
                doc = ("prop", f"{m.group(1)}:{m.group(2)}")
        if doc is None:
            m = cur.match(_RE_F_PROP)
            if m:
                series = (m.group(2) or "").strip() or ""
                if series == "A":     # A is the default series: drop
                    series = ""
                doc = ("prop", f"{m.group(1)}:{series}{m.group(3)}")
        if doc is None:
            m = cur.match(_RE_F_SOU)
            if m:
                doc = ("sou", f"{m.group(1)}:{m.group(2)}")
        if doc is None:
            m = cur.match(_RE_F_DS)
            if m:
                doc = ("ds", f"{m.group(1)}:{m.group(2)}")
        if doc is None:
            m = cur.match(_RE_F_BET)
            if m:
                doc = ("bet", f"{m.group(1)}:{m.group(2)}")
        if doc is None:
            m = cur.match(_RE_F_RSKR)
            if m:
                doc = ("rskr", f"{m.group(1)}:{m.group(2)}")
        if doc is None:
            m = cur.match(_RE_F_APROP)
            if m and self.lastref:
                doc = self.lastref
        if doc is not None:
            self.lastref = doc
            return self._pages(s, i, cur, doc, refs)
        # --- celex -------------------------------------------------
        m = cur.match(_RE_F_CELEX)
        if m:
            num = m.group(1)
            if len(num) == 8:          # 392L0100 -> 31992L0100
                num = num[0] + "19" + num[1:]
            refs.append(_Ref(i, cur.i, {
                "celex": num,
                "uri": f"{self.base}ext/celex/{num}"}))
            return cur.i
        # --- avsnitt (needs BASE attrs to resolve the target doc) --
        m = cur.match(_RE_F_AVSNITT)
        if m and base_attrs.get("year") and base_attrs.get("no"):
            return self._avsnitt(s, i, cur, m, refs, base_attrs)
        return cur.i if cur.i > i else i + 1

    def _pages(self, s, start, cur, doc, refs):
        """Optional ', s. N' merged into the doc link; further list
        elements (ranges / och / commas) become separate #sidN
        links."""
        save = cur.i
        m = cur.match(_RE_F_PAGE)
        if not m:
            cur.i = save
            refs.append(_Ref(start, cur.i,
                             {"doctype": doc[0], "ordinal": doc[1],
                              "uri": self._uri(*doc)}))
            return cur.i
        refs.append(_Ref(start, cur.i,
                         {"doctype": doc[0], "ordinal": doc[1],
                          "page": m.group(1),
                          "uri": self._uri(*doc, page=m.group(1))}))
        while True:
            save = cur.i
            if not cur.match(_RE_F_PAGESEP):
                break
            pm = cur.match(_RE_F_NUM)
            if not pm:
                cur.i = save
                break
            refs.append(_Ref(pm.start(), pm.end(),
                             {"doctype": doc[0], "ordinal": doc[1],
                              "page": pm.group(1),
                              "uri": self._uri(*doc,
                                               page=pm.group(1))}))
        return cur.i

    def _avsnitt(self, s, start, cur, m, refs, base_attrs):
        """'avsnitt 8.2.2 [, 12.2.8 och 12.2.12] [i kommitténs
        betänkande]' — the suffix retargets every link in the list to
        the committee report (SOU) named by the BASE attrs."""
        secs = [[start, cur.i, m.group(1)]]
        while True:
            save = cur.i
            if not cur.match(_RE_F_PAGESEP):
                break
            sm = cur.match(_RE_F_SECNUM)
            if not sm:
                cur.i = save
                break
            secs.append([sm.start(), sm.end(), sm.group(1)])
        bm = cur.match(_RE_F_BETANK)
        if bm and base_attrs.get("kommittensbetankande"):
            doc = ("sou", base_attrs["kommittensbetankande"])
            secs[-1][1] = cur.i     # suffix merges into the LAST link
        else:
            doc = ("prop", f"{base_attrs['year']}:{base_attrs['no']}")
        for st, en, sec in secs:
            refs.append(_Ref(st, en, {
                "doctype": doc[0], "ordinal": doc[1], "section": sec,
                "uri": self._uri(*doc, section=sec)}))
        return cur.i


# ===========================================================================
# RATTSFALL: Swedish court-case references (NJA/RÅ/AD/RH/MÖD/...).
# Grammar re-derived from the reference's
# ferenda/sources/legal/se/res/ebnf/rattsfall.ebnf and
# legalref.py rattsfall_format_uri (:1376-1391), conformance corpus
# test/files/legalref/DV/*.txt.

#: DomstolRefID alternation, longest-first (PMÖD before MD etc.);
#: NJA is separate (only takes the s./not separators, never colon).
_RE_R_COURT = re.compile(
    r"(?<![A-Za-zÅÄÖåäö])(PMÖD|MMD|MIG|MÖD|HFD|NJA|RÅ|AD|RH|RK|MD)")
_RE_R_YEAR = re.compile(r"[ \r\n\xa0]+(\d{4})")
#: Separator ::= ((ws/-)('ref'/'nr') '.'? ws?) / (ws? (:|-) ws?)
_RE_R_SEP_WORD = re.compile(
    r"(?:[ \r\n\xa0]+|-)(?:ref|nr)\.?[ \r\n\xa0]*")
_RE_R_SEP_PUNCT = re.compile(r"[ \r\n\xa0]*[:-][ \r\n\xa0]*")
_RE_R_NJASEP = re.compile(r"[ \r\n\xa0]+s\.?[ \r\n\xa0]*")
_RE_R_NOTSEP = re.compile(r"[ \r\n\xa0]+not\.?[ \r\n\xa0]*")
_RE_R_NR = re.compile(r"(\d+)(?!\d)")

_COURT_SLUG = {c: (c.lower().replace("å", "a").replace("ö", "o"))
               for c in ("PMÖD", "MMD", "MIG", "MÖD", "HFD", "NJA",
                         "RÅ", "AD", "RH", "RK", "MD")}


class RattsfallParser:
    """RATTSFALL-role parser: court-case references to lagen.nu
    ``/dom/`` URIs (referat ``dom/ra/1986:116``, NJA page form
    ``dom/nja/1998s14``, notis ``dom/hfd/2013/not/3``)."""

    def __init__(self, base: str = "https://lagen.nu/"):
        self.base = base

    def parse(self, text: str, base_attrs: dict | None = None):
        refs: list[_Ref] = []
        pos = 0
        while True:
            m = _RE_R_COURT.search(text, pos)
            if not m:
                break
            end = self._one(text, m, refs)
            pos = end if end > m.start() else m.start() + 1
        nodes = []
        last = 0
        for r in refs:
            if r.start > last:
                nodes.append(text[last:r.start])
            nodes.append(Link(text[r.start:r.end], r.attrs["uri"],
                              r.attrs))
            last = r.end
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes if isinstance(n, Link) or n != ""]

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))

    def _one(self, s, m, refs):
        court = m.group(1)
        cur = _Cursor(s, m.end())
        ym = cur.match(_RE_R_YEAR)
        if not ym:
            return cur.i
        year = ym.group(1)
        slug = _COURT_SLUG[court]
        if court == "NJA":
            save = cur.i
            if cur.match(_RE_R_NJASEP):
                nm = cur.match(_RE_R_NR)
                if nm:
                    refs.append(_Ref(m.start(), cur.i, {
                        "court": court, "year": year,
                        "page": nm.group(1),
                        "uri": f"{self.base}dom/nja/{year}s{nm.group(1)}"}))
                    return cur.i
            cur.i = save
            if cur.match(_RE_R_NOTSEP):
                nm = cur.match(_RE_R_NR)
                if nm:
                    refs.append(_Ref(m.start(), cur.i, {
                        "court": court, "year": year,
                        "notnr": nm.group(1),
                        "uri": f"{self.base}dom/nja/{year}/not/"
                               f"{nm.group(1)}"}))
                    return cur.i
            return cur.i
        # referat (word separator tried before the punct one, as in the
        # EBNF: 'AD 2005-nr 115' must bind the hyphen to 'nr')
        save = cur.i
        if cur.match(_RE_R_SEP_WORD) or cur.match(_RE_R_SEP_PUNCT):
            nm = cur.match(_RE_R_NR)
            if nm:
                refs.append(_Ref(m.start(), cur.i, {
                    "court": court, "year": year, "no": nm.group(1),
                    "uri": f"{self.base}dom/{slug}/{year}:"
                           f"{nm.group(1)}"}))
                return cur.i
        cur.i = save
        if cur.match(_RE_R_NOTSEP):
            nm = cur.match(_RE_R_NR)
            if nm:
                refs.append(_Ref(m.start(), cur.i, {
                    "court": court, "year": year,
                    "notnr": nm.group(1),
                    "uri": f"{self.base}dom/{slug}/{year}/not/"
                           f"{nm.group(1)}"}))
                return cur.i
        return cur.i


# ===========================================================================
# EULAGSTIFTNING: EU directives / regulations -> CELEX URIs.  Grammar
# re-derived from the reference's res/ebnf/eulag.ebnf + the CELEX
# construction in legalref.py eulag_format_uri (:1316-1374, incl. the
# post-2015 year/serial swap guarded by the 'av den <datum>' year);
# conformance corpus test/files/legalref/EGLag/*.txt.

_EU_WS = r"[ \r\n\xa0]+"
_RE_EU_START = re.compile(
    r"artikel" + _EU_WS + r"|rådets" + _EU_WS
    + r"|Europaparlamentets" + _EU_WS + r"|kommissionens" + _EU_WS
    + r"|(?<![\d/])\d{1,4}/\d{1,4}/(?:EEG|EG|EU)(?![A-Za-zÅÄÖåäö])"
    + r"|\((?:EEG|EG|EU)\)")
_RE_EU_ARTIKEL = re.compile(
    r"artikel" + _EU_WS + r"(\d+)(?:\.(\d+))?")
_RE_EU_IWORD = re.compile(_EU_WS + "i" + _EU_WS)
_RE_EU_INST = re.compile(
    r"(?:Europaparlamentets" + _EU_WS + "och" + _EU_WS + r"rådets"
    + r"|rådets|kommissionens)")
_RE_EU_AKTTYP = re.compile(_EU_WS + r"(direktiv|förordning)" + _EU_WS)
_RE_EU_DIREKTIV = re.compile(
    r"(\d{1,4})/(\d{1,4})/(EEG|EG|EU)(?![A-Za-zÅÄÖåäö])")
_RE_EU_FORORDNING = re.compile(
    r"\((EEG|EG|EU)\)(?:" + _EU_WS + r"nr)?" + _EU_WS
    + r"(\d{1,4})/(\d{1,4})(?!\d)")
_RE_EU_AVDATUM = re.compile(
    _EU_WS + "av" + _EU_WS + "den" + _EU_WS + r"\d{1,2}" + _EU_WS
    + r"(?:januari|februari|mars|april|maj|juni|juli|augusti"
    + r"|september|oktober|november|december)" + _EU_WS + r"(\d{4})")


class EULagParser:
    """EULAGSTIFTNING-role parser: EU directive / regulation
    references minted as ``ext/celex/{celex}[#artikel]`` URIs."""

    def __init__(self, base: str = "https://lagen.nu/"):
        self.base = base

    def parse(self, text: str, base_attrs: dict | None = None):
        refs: list[_Ref] = []
        pos = 0
        while True:
            m = _RE_EU_START.search(text, pos)
            if not m:
                break
            end = self._one(text, m.start(), refs)
            pos = end if end > m.start() else m.start() + 1
        nodes = []
        last = 0
        for r in refs:
            if r.start > last:
                nodes.append(text[last:r.start])
            nodes.append(Link(text[r.start:r.end], r.attrs["uri"],
                              r.attrs))
            last = r.end
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes if isinstance(n, Link) or n != ""]

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))

    # -- helpers ------------------------------------------------------

    def _celex(self, akttyp, ar, lopnummer, datum_year):
        """eulag_format_uri's CELEX construction, incl. the post-2015
        serial/year swap (only when the AvDatum year confirms it)."""
        if int(lopnummer) > 2014 and datum_year > 2014:
            ar, lopnummer = lopnummer, ar
        if len(ar) == 2:
            ar = "19" + ar
        form = {"direktiv": "L", "förordning": "R"}[akttyp]
        return "3%s%s%04d" % (ar, form, int(lopnummer))

    def _rattsakt(self, s, i):
        """RattsaktRef -> (end, akttyp, ar, lopnr, datum_year) or
        None.  Institution form carries the akttyp word and optional
        AvDatum inside the span; the bare numeric forms don't."""
        cur = _Cursor(s, i)
        m = cur.match(_RE_EU_INST)
        if m:
            am = cur.match(_RE_EU_AKTTYP)
            if not am:
                return None
            akttyp = am.group(1)
            if akttyp == "direktiv":
                dm = cur.match(_RE_EU_DIREKTIV)
                if not dm:
                    return None
                ar, lopnr = dm.group(1), dm.group(2)
            else:
                fm = cur.match(_RE_EU_FORORDNING)
                if not fm:
                    return None
                lopnr, ar = fm.group(2), fm.group(3)
            year = 0
            save = cur.i
            tm = cur.match(_RE_EU_AVDATUM)
            if tm:
                year = int(tm.group(1))
            else:
                cur.i = save
            return cur.i, akttyp, ar, lopnr, year
        m = cur.match(_RE_EU_DIREKTIV)
        if m:
            return cur.i, "direktiv", m.group(1), m.group(2), 0
        m = cur.match(_RE_EU_FORORDNING)
        if m:
            return cur.i, "förordning", m.group(3), m.group(2), 0
        return None

    def _one(self, s, i, refs):
        am = _RE_EU_ARTIKEL.match(s, i)
        if am:
            # ArtikelRattsaktRef: 'artikel N[.M] i <rattsakt>'
            cur = _Cursor(s, am.end())
            if cur.match(_RE_EU_IWORD):
                r = self._rattsakt(s, cur.i)
                if r:
                    end, akttyp, ar, lopnr, year = r
                    celex = self._celex(akttyp, ar, lopnr, year)
                    frag = am.group(1) + (
                        "." + am.group(2) if am.group(2) else "")
                    refs.append(_Ref(i, end, {
                        "celex": celex, "artikel": frag,
                        "uri": f"{self.base}ext/celex/{celex}"
                               f"#{frag}"}))
                    return end
            # bare ArtikelRef: no celex context -> no link
            # (eulag_format_uri returns None, legalref.py:1355-1360)
            return am.end()
        r = self._rattsakt(s, i)
        if r:
            end, akttyp, ar, lopnr, year = r
            celex = self._celex(akttyp, ar, lopnr, year)
            refs.append(_Ref(i, end, {
                "celex": celex,
                "uri": f"{self.base}ext/celex/{celex}"}))
            return end
        return i


# ===========================================================================
# MYNDIGHETSBESLUT: agency decisions (ARN/JO/JK diarienummer).
# Grammar re-derived from the reference's res/ebnf/avg.ebnf and the
# myndighetsbeslut_format_uri date-vs-dnr check (legalref.py:1419-1446);
# conformance corpus test/files/legalref/Avg/*.txt.  Only the
# diarienummer itself is linked; preambles ("JO 2013/14 s. 392, dnr",
# "Justitiekanslerns beslut den ...") license the match but stay text.

_AVG_DATUM = (r"\d{1,2}" + _EU_WS
              + r"(?:januari|februari|mars|april|maj|juni|juli"
              + r"|augusti|september|oktober|november|december)"
              + _EU_WS + r"\d{4}")
_RE_AVG_START = re.compile(
    r"avgörande" + _EU_WS + r"\d{4}-\d{2}-\d{2};[ \xa0]"
    + r"|ARN:s" + _EU_WS + r"änr[ \xa0]"
    + r"|JO" + _EU_WS + r"\d{4}/\d{2,4}" + _EU_WS + r"s\.[ \xa0]\d+"
    + r"|JO:s" + _EU_WS + "beslut" + _EU_WS + "den" + _EU_WS
    + _AVG_DATUM
    + r"|[Dd]nr[ \xa0]|ärende" + _EU_WS + r"nr[ \xa0]")
_RE_AVG_COMMA_DNR = re.compile(r",[ \xa0][Dd]nr[ \xa0]")
_RE_AVG_CONN = re.compile(r"(?:;[ \xa0]|,[ \xa0]|[ \xa0]och[ \xa0])")
_RE_ARN_ID = re.compile(r"(\d{4}-\d{4,})(?!\d)")
_RE_JO_ID = re.compile(r"(\d+-\d{4})(?![\d-])")
_RE_JK_ID = re.compile(r"(\d+)-(\d{2})-(\d+)(?![\d-])")


class AvgParser:
    """MYNDIGHETSBESLUT-role parser: ARN/JO/JK decision references
    minted as ``avg/{arn,jo,jk}/{diarienr}`` URIs."""

    def __init__(self, base: str = "https://lagen.nu/"):
        self.base = base

    def parse(self, text: str, base_attrs: dict | None = None):
        refs: list[_Ref] = []
        pos = 0
        while True:
            m = _RE_AVG_START.search(text, pos)
            if not m:
                break
            end = self._one(text, m, refs)
            pos = end if end > m.start() else m.start() + 1
        nodes = []
        last = 0
        for r in sorted(refs, key=lambda r: r.start):
            if r.start > last:
                nodes.append(text[last:r.start])
            if r.attrs.get("uri"):      # drop-span: consumed, no text
                nodes.append(Link(text[r.start:r.end],
                                  r.attrs["uri"], r.attrs))
            last = r.end
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes if isinstance(n, Link) or n != ""]

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))

    # -- helpers ------------------------------------------------------

    def _idlist(self, cur, rx, myndighet, refs, check=None):
        """(RefID, Connector)* RefID with backtracking on a trailing
        connector; ids failing ``check`` are consumed but unlinked
        (the reference's date-vs-dnr rule returns None)."""
        n = 0
        while True:
            m = cur.match(rx)
            if not m:
                break
            n += 1
            if check is None or check(m):
                refs.append(_Ref(m.start(), m.end(), {
                    "myndighet": myndighet, "diarienr": m.group(0),
                    "uri": f"{self.base}avg/{myndighet}/"
                           f"{m.group(0)}"}))
            save = cur.i
            if not cur.match(_RE_AVG_CONN):
                break
            if not cur.peek(rx):
                cur.i = save
                break
        return n

    @staticmethod
    def _jk_not_date(m):
        ordinal, year, cat = (int(m.group(1)), int(m.group(2)),
                              int(m.group(3)))
        return not (1980 <= ordinal <= 2099 and 1 <= year <= 12
                    and cat <= 31)

    def _one(self, s, m, refs):
        tok = m.group(0)
        cur = _Cursor(s, m.end())
        if tok.startswith(("avgörande", "ARN:s")):
            self._idlist(cur, _RE_ARN_ID, "arn", refs)
            return cur.i
        if tok.startswith("JO"):
            if not cur.match(_RE_AVG_COMMA_DNR):
                return cur.i
            self._idlist(cur, _RE_JO_ID, "jo", refs)
            return cur.i
        # 'dnr ' / 'Dnr ' / 'ärende nr ': JK ids (NNN-ÅÅ-TT); a JO-
        # shaped id here without a JO preamble is UnknownAvgRefs ->
        # consumed, no link (avg.ebnf UnknownAvgRefs; no myndighet
        # attr -> format_uri returns None)
        if cur.peek(_RE_JK_ID):
            self._idlist(cur, _RE_JK_ID, "jk", refs,
                         check=self._jk_not_date)
            if tok.startswith("ärende"):
                # the reference swallows the licensing 'ärende nr '
                # token from the output (integrationLegalRef jk-basic
                # golden) — emit it as a drop-span
                refs.append(_Ref(m.start(), m.end(), {"uri": None}))
            return cur.i
        if cur.peek(_RE_JO_ID):
            self._idlist(cur, _RE_JO_ID, None, [])
            return cur.i
        return cur.i


# ===========================================================================
# EGRATTSFALL: EU court case references ("Case C-176/09") -> CELEX.
# Grammar from the reference's res/ebnf/euratt.ebnf + the celex
# construction in legalref.py eurattsfall_format_uri (:1394-1416).
# The reference's own ECJ fixtures are in its broken-test list
# (integrationLegalRef.py:151-153, they use U+2011 non-breaking
# hyphens); this parser accepts both hyphen forms.

_RE_ECJ = re.compile(
    r"(?:Case[ \r\n\xa0]+)?([CTF])[-‑](\d+)/(\d{2,4})(?!\d)")

_ECJ_DESCRIPTOR = {"C": "J",   # Judgment of the Court
                   "T": "A",   # Court of First Instance
                   "F": "W"}   # Civil Service Tribunal


class EURattsfallParser:
    """EGRATTSFALL-role parser: EU court cases as CELEX URIs
    (``Case C-176/09`` -> ``ext/celex/62009CJ0176``)."""

    def __init__(self, base: str = "https://lagen.nu/"):
        self.base = base

    def parse(self, text: str, base_attrs: dict | None = None):
        nodes, last = [], 0
        for m in _RE_ECJ.finditer(text):
            if m.start() < last:
                continue
            year = m.group(3)
            if len(year) == 2:
                year = ("20" if int(year) < 54 else "19") + year
            celex = "6%s C %s %04d" % (year,
                                       _ECJ_DESCRIPTOR[m.group(1)],
                                       int(m.group(2)))
            celex = celex.replace(" ", "")
            if m.start() > last:
                nodes.append(text[last:m.start()])
            nodes.append(Link(m.group(0),
                              f"{self.base}ext/celex/{celex}",
                              {"celex": celex}))
            last = m.end()
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes if isinstance(n, Link) or n != ""]

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))


# ===========================================================================
# Multi-role facade: the reference constructs ONE parser from several
# roles (LegalRef(LegalRef.RATTSFALL, LegalRef.FORARBETEN, ...) —
# legalref.py:118-170 builds root ::= (role1/role2/.../plain)+).  Here
# each role parser scans independently and the facade merges their
# spans: earliest start wins, longer span breaks ties (the PEG
# ordered-choice effect of the reference's root alternation).

#: role name -> parser class (the reference's LegalRef.LAGRUM..
#: MYNDIGHETSBESLUT constants, legalref.py:66-78)
ROLE_PARSERS = {
    "rattsfall": RattsfallParser,
    "forarbeten": ForarbetenParser,
    "eulag": EULagParser,
    "eurattsfall": EURattsfallParser,
    "myndighetsbeslut": AvgParser,
}


class MultiRoleParser:
    """Combined citation parser over several roles.

    ``MultiRoleParser("rattsfall", "forarbeten")`` scans a text with
    each role's grammar and interleaves the results into one
    ``<list>`` of ``<str>``/``<Link>`` nodes.  LAGRUM-family roles
    (the stateful :class:`LegalRefParser`) can be mixed in by passing
    a parser INSTANCE instead of a role name."""

    def __init__(self, *roles, base: str = "https://lagen.nu/"):
        self.parsers = []
        for role in roles:
            if isinstance(role, str):
                try:
                    self.parsers.append(ROLE_PARSERS[role](base=base))
                except KeyError:
                    raise ValueError(f"unknown role {role!r}; known: "
                                     f"{sorted(ROLE_PARSERS)}")
            else:
                self.parsers.append(role)

    def parse(self, text: str, base_attrs: dict | None = None):
        spans = []      # (start, end, Link)
        for p in self.parsers:
            pos = 0
            for n in p.parse(text, base_attrs):
                if isinstance(n, Link):
                    start = text.index(str(n), pos)
                    spans.append((start, start + len(str(n)), n))
                    pos = start + len(str(n))
                else:
                    pos = text.index(n, pos) + len(n)
        # earliest start first; longer span wins a tie; drop overlaps
        spans.sort(key=lambda s: (s[0], -(s[1] - s[0])))
        nodes, last = [], 0
        for start, end, link in spans:
            if start < last:
                continue
            if start > last:
                nodes.append(text[last:start])
            nodes.append(link)
            last = end
        if last < len(text) or not nodes:
            nodes.append(text[last:])
        return [n for n in nodes if isinstance(n, Link) or n != ""]

    def parse_to_serialized(self, text, base_attrs=None) -> str:
        return serialize(self.parse(text, base_attrs))
