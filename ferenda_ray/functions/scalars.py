"""Scalar function library — the needed subset of the reference's
``ferenda/util.py`` string/date/number helpers, reimplemented.

These are pure functions used inside extraction / facet UDFs and in
tests; each cites its reference analogue.
"""

from __future__ import annotations

import calendar
import datetime
import re

# --- whitespace / text ------------------------------------------------------


def normalize_space(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip
    (``util.py:290``)."""
    return " ".join(s.split())


_SPLIT_NUMALPHA = re.compile(r"(\d+)")


def split_numalpha(s: str) -> list:
    """Split into alternating text/int pieces for natural sort
    (``util.py:194-250``): ``"10 a"`` → ``["", 10, " a"]``."""
    return [int(p) if p.isdigit() else p
            for p in _SPLIT_NUMALPHA.split(s)]


def natural_sort_key(s: str) -> tuple:
    """Ordering key built on :func:`split_numalpha` that compares
    mixed str/int pieces safely."""
    return tuple((0, p) if isinstance(p, int) else (1, p)
                 for p in split_numalpha(s))


def title_sortkey(s: str) -> str:
    """Case-folded sort key: strip leading articles + non-alnum
    (``util.py:727``; ``Facet.titlesortkey`` ``facet.py:195-210``)."""
    s = s.lower()
    for article in ("the ", "a ", "an "):
        if s.startswith(article):
            s = s[len(article):]
            break
    return re.sub(r"[^a-z0-9 ]", "", s).strip()


def uri_leaf(uri: str) -> str:
    """Last path/fragment segment of a URI (``util.py:624``)."""
    return re.split(r"[/#]", uri.rstrip("/#"))[-1]


# --- roman numerals (util.py:692-714) ---------------------------------------

_ROMAN = [(1000, "m"), (900, "cm"), (500, "d"), (400, "cd"), (100, "c"),
          (90, "xc"), (50, "l"), (40, "xl"), (10, "x"), (9, "ix"),
          (5, "v"), (4, "iv"), (1, "i")]


def to_roman(n: int) -> str:
    if not 0 < n < 4000:
        raise ValueError("out of range (1..3999)")
    out = []
    for val, sym in _ROMAN:
        while n >= val:
            out.append(sym)
            n -= val
    return "".join(out)


_ROMAN_VAL = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500,
              "m": 1000}


def from_roman(s: str) -> int:
    s = s.lower()
    total = 0
    prev = 0
    for ch in reversed(s):
        v = _ROMAN_VAL[ch]
        total = total - v if v < prev else total + v
        prev = max(prev, v)
    return total


# --- base-27 identifiers (util.py:848) --------------------------------------

_B27 = "0abcdefghijklmnopqrstuvwxyz"


def base27encode(n: int) -> str:
    if n == 0:
        return _B27[0]
    out = []
    while n:
        n, rem = divmod(n, 27)
        out.append(_B27[rem])
    return "".join(reversed(out))


def increment(s: str, amount: int = 1) -> str:
    """Increment a trailing integer or letter suffix
    (``util.py:715``): ``"2"``→``"3"``, ``"2a"``→``"2b"``."""
    if s and s[-1].isdigit():
        m = re.search(r"(\d+)$", s)
        return s[:m.start()] + str(int(m.group(1)) + amount)
    if s and s[-1].isalpha():
        return s[:-1] + chr(ord(s[-1]) + amount)
    return s


# --- dates ------------------------------------------------------------------


def parse_date(s: str) -> datetime.date:
    """ISO date parse (``util.strptime`` analogue, ``util.py:496``)."""
    return datetime.date.fromisoformat(s)


def rfc_3339_timestamp(dt: datetime.datetime) -> str:
    """(``util.py:469``)"""
    if dt.tzinfo is None:
        return dt.isoformat() + "Z"
    return dt.isoformat()


_RFC822 = re.compile(
    r"(?:\w{3}, )?(\d{1,2}) (\w{3}) (\d{4}) (\d{2}):(\d{2}):(\d{2})")
_MONTHS = {m: i for i, m in enumerate(calendar.month_abbr) if m}


def parse_rfc822_date(s: str) -> datetime.datetime:
    """(``util.py:483``)"""
    m = _RFC822.match(s.strip())
    if not m:
        raise ValueError(f"not an RFC822 date: {s!r}")
    day, mon, year, hh, mm, ss = m.groups()
    return datetime.datetime(int(year), _MONTHS[mon], int(day),
                             int(hh), int(mm), int(ss))


def gyearmonth(s: str) -> str:
    """Normalize a date-ish string to ``YYYY-MM`` (the reference's
    ``xsd:gYearMonth`` quirk, ``rfc.py:630-640``)."""
    m = re.match(r"(\d{4})-(\d{2})", s)
    if not m:
        raise ValueError(f"no year-month in {s!r}")
    return f"{m.group(1)}-{m.group(2)}"


# --- misc -------------------------------------------------------------------


def firstletter(s: str) -> str:
    """First letter of the (title-)sort key (``facet.py:212-232``)."""
    key = title_sortkey(s)
    return key[0] if key else ""


def year_of(s: str) -> int:
    """Year of an ISO date string (``Facet.year`` ``facet.py:156-177``)."""
    m = re.match(r"(\d{4})-", s)
    if not m:
        raise ValueError(f"no year in {s!r}")
    return int(m.group(1))


# ---------------------------------------------------------------------------
# locale-collated sort keys (documentrepository.py:2924-2926:
# `util.switch_locale(collate_locale)` + `locale.strxfrm` for TOC
# ordering).  `locale.strxfrm` is process-global, non-deterministic
# across machines, and unusable inside parallel Ray workers — so the
# engine ships PINNED collation tables instead: a pure function of
# (string, locale) that every worker evaluates identically.

_COLLATE_SV = {
    # Swedish: å ä ö are distinct letters AFTER z (not variants of a/o)
    "å": "z{", "ä": "z|", "ö": "z}",
    "é": "e",  # acute-e collates with e
}
_COLLATE_GENERIC = {
    # latin-1 diacritics fold onto their base letter
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ç": "c", "ñ": "n", "ý": "y",
}
_COLLATE_TABLES = {"sv": _COLLATE_SV, "generic": _COLLATE_GENERIC}


def collation_key(s: str, locale: str = "generic") -> str:
    """Deterministic collation key: primary weight (lowercased, table-
    mapped) + tie-break on the casefolded original — so "Ärende" sorts
    after "Zebra" under ``sv`` but with "ärende" == "Ärende" at the
    primary level.  The strxfrm replacement for TOC page ordering."""
    table = _COLLATE_TABLES.get(locale, _COLLATE_GENERIC)
    low = s.lower()
    primary = "".join(table.get(ch, ch) for ch in low)
    return primary + "\x00" + low


def collated_firstletter(s: str, locale: str = "generic") -> str:
    """TOC page selector under pinned collation: the first collating
    letter (Swedish å/ä/ö keep their identity rather than folding)."""
    for ch in s.lower():
        if ch.isalpha():
            if locale == "sv" and ch in ("å", "ä", "ö"):
                return ch
            return _COLLATE_GENERIC.get(ch, ch)
    return ""


def sanitize_term(term: str, min_len: int = 2, max_len: int = 100,
                  invalid_start: str = "./:",
                  invalid_end: str = ".,") -> str | None:
    """Keyword sanity gate (``sources/general/keyword.py:64-183``):
    whitespace-normalized, length-bounded, and not starting/ending in
    punctuation that marks a non-keyword.  ``None`` = reject."""
    term = " ".join(term.split())
    if (max_len >= len(term) >= min_len
            and term[0] not in invalid_start
            and term[-1] not in invalid_end):
        return term
    return None
