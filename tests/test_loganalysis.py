"""Log-derived dashboards (devel.py:549-656 semantics) — distributed
line parse + small groupby rollups, render helpers reproduce the
reference's text block shapes."""

import pyarrow as pa
import pytest

from ferenda_ray.stages import loganalysis as la

LINES = [
    "12:00:01 sfs INFO 1998:204 parse OK (1.234 sec)",
    "12:00:02 sfs INFO 1998:205 parse OK (0.3 sec) (sfs.py:120)",
    "12:00:03 prop INFO 1997/98:44 parse OK",
    "12:00:04 sfs INFO 1998:204 relate OK",
    "12:00:05 sfs INFO downloaded something else entirely",
    "12:00:06 sfs ERROR 1998:206 parse failed (sfs.py:99)",
    "12:00:07 sfs ERROR 1998:207 parse failed (sfs.py:99)",
    "12:00:08 root ERROR prop 1997/98:45 failed (prop.py:10)",
    "malformed line without enough fields",
    "12:00:09 ferenda INFO sfs parse finished in 42.5 sec",
    "12:00:10 ferenda INFO sfs relate finished in 2.5 sec",
    "12:00:11 ferenda INFO prop parse finished in 7.25 sec",
]


@pytest.fixture(scope="module")
def lines_ds(ray_session, tmp_path_factory):
    import ray.data as rd
    p = tmp_path_factory.mktemp("logs") / "build.log"
    p.write_text("\n".join(LINES) + "\n")
    return la.read_logs(str(p))


def test_buildstats(lines_ds):
    rows = {(r["action"], r["module"]): r["n"]
            for r in la.buildstats(lines_ds).take_all()}
    assert rows == {("parse", "sfs"): 2, ("parse", "prop"): 1,
                    ("relate", "sfs"): 1}
    text = la.format_buildstats(la.buildstats(lines_ds))
    # devel.py:621-634 block shape, action sort order download<parse<...
    assert text.splitlines() == [
        "parse : 3 (prop: 1, sfs: 2)",
        "relate: 1 (sfs: 1)",
    ]


def test_buildstats_empty(ray_session):
    import ray.data as rd
    empty = rd.from_items([{"text": "nothing here"}])
    assert la.format_buildstats(la.buildstats(empty)) \
        == "[no successful processing actions found]\n"


def test_errorstats(lines_ds):
    modules, locations = la.errorstats(lines_ds)
    mods = {r["module"]: r["n"] for r in modules.take_all()}
    # root errors attribute to the message head (devel.py:563-565)
    assert mods == {"sfs": 2, "prop": 1}
    locs = {r["location"]: (r["n"], r["message"])
            for r in locations.take_all()}
    assert locs["(sfs.py:99)"][0] == 2
    assert "parse failed" in locs["(sfs.py:99)"][1]
    assert locs["(prop.py:10)"][0] == 1


def test_timestats(lines_ds):
    rows = {(r["stage"], r["repo"]): r
            for r in la.timestats(lines_ds).take_all()}
    # the 2.5 s line is below the 3 s dashboard pixel threshold
    assert set(rows) == {("parse", "sfs"), ("parse", "prop")}
    assert rows[("parse", "sfs")]["elapsed"] == 42.5
    assert rows[("parse", "sfs")]["width"] == 14
    # deterministic color, high-bit set (devel.py:653 | 0x808080)
    c = int(rows[("parse", "sfs")]["color"], 16)
    assert (c | 0x808080) == c and len(rows[("parse", "sfs")]["color"]) == 6
