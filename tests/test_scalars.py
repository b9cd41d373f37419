"""Scalar function library (util.py analogues)."""

import datetime

import pytest

from ferenda_ray.functions import scalars as s


def test_normalize_space():
    assert s.normalize_space("  a \t b\n c ") == "a b c"


def test_split_numalpha_and_natural_sort():
    assert s.split_numalpha("2 a") == ["", 2, " a"]
    vals = ["10 x", "2 x", "1 y"]
    assert sorted(vals, key=s.natural_sort_key) == ["1 y", "2 x", "10 x"]


def test_title_sortkey():
    assert s.title_sortkey("The "
                           "Quick? Brown") == "quick brown"
    assert s.title_sortkey("A minor tale") == "minor tale"


def test_uri_leaf():
    assert s.uri_leaf("https://x.org/a/b#frag") == "frag"
    assert s.uri_leaf("https://x.org/a/b") == "b"


def test_roman_roundtrip():
    for n in (1, 4, 9, 14, 40, 90, 400, 1999, 3999):
        assert s.from_roman(s.to_roman(n)) == n
    with pytest.raises(ValueError):
        s.to_roman(0)


def test_base27():
    assert s.base27encode(0) == "0"
    assert s.base27encode(1) == "a"
    assert s.base27encode(27) == "a0"


def test_increment():
    assert s.increment("2") == "3"
    assert s.increment("2a") == "2b"
    assert s.increment("19") == "20"


def test_dates():
    assert s.parse_date("2023-04-05") == datetime.date(2023, 4, 5)
    assert s.rfc_3339_timestamp(
        datetime.datetime(2020, 1, 2, 3, 4, 5)) == "2020-01-02T03:04:05Z"
    assert s.parse_rfc822_date("Mon, 02 Jan 2020 03:04:05 GMT") == \
        datetime.datetime(2020, 1, 2, 3, 4, 5)
    assert s.gyearmonth("2021-07-15") == "2021-07"


def test_firstletter_year():
    assert s.firstletter("The Zebra") == "z"
    assert s.year_of("2019-12-31") == 2019
    with pytest.raises(ValueError):
        s.year_of("nope")


def test_collation_key_swedish():
    from ferenda_ray.functions.scalars import (
        collated_firstletter, collation_key)
    titles = ["Ärende", "Zebra", "Öl", "Apa", "Åtgärd", "apa"]
    ordered = sorted(titles, key=lambda t: collation_key(t, "sv"))
    # Swedish: å ä ö after z; case-insensitive primary with stable tie
    assert ordered == ["Apa", "apa", "Zebra", "Åtgärd", "Ärende", "Öl"]
    # generic locale folds diacritics onto the base letter
    gen = sorted(["Über", "Uns", "Apfel"],
                 key=lambda t: collation_key(t, "generic"))
    assert gen == ["Apfel", "Über", "Uns"]
    assert collated_firstletter("Ärende", "sv") == "ä"
    assert collated_firstletter("Ärende", "generic") == "a"


def test_collation_key_as_facet(ray_session):
    """The collation key drives a TOC facet sort end-to-end."""
    import ray.data as rd
    import pyarrow as pa
    from ferenda_ray.functions.facets import Facet
    from ferenda_ray.functions.scalars import (
        collated_firstletter, collation_key)
    from ferenda_ray.pipelines.derived import toc_entries
    from ferenda_ray import ns
    titles = ["Ärende", "Zebra", "Öl", "Apa", "Åtgärd"]
    faceted = rd.from_arrow(pa.table({
        "uri": [f"u{i}" for i in range(len(titles))],
        "dcterms_title": titles}))
    facet = Facet(ns.DCTERMS_TITLE, "dcterms_title",
                  selector=lambda v: collated_firstletter(v, "sv"),
                  key=lambda v: collation_key(v, "sv"))
    rows = toc_entries(faceted, facet).take_all()
    by_sortkey = [r["uri"] for r in sorted(rows, key=lambda r: r["sortkey"])]
    assert by_sortkey == ["u3", "u1", "u4", "u0", "u2"]
    assert {r["value"] for r in rows} == {"a", "z", "å", "ä", "ö"}


def test_sanitize_term():
    from ferenda_ray.functions.scalars import sanitize_term
    assert sanitize_term("  data   engineering ") == "data engineering"
    assert sanitize_term(".hidden") is None
    assert sanitize_term("/path") is None
    assert sanitize_term("end.") is None
    assert sanitize_term("x") is None                 # too short
    assert sanitize_term("y" * 101) is None           # too long
    assert sanitize_term("ok term,") is None
    assert sanitize_term("ok term") == "ok term"
