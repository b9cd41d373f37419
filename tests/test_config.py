# -*- coding: utf-8 -*-
"""Layered config cascade — semantics of the reference's
``LayeredConfig(Defaults, INIFile, Commandline, cascade=True)`` usage
(``ferenda/manager.py:65,351``)."""

import datetime

import pytest

from ferenda_ray.state.config import (
    Commandline, Defaults, Environment, INIFile, LayeredConfig,
)

DEFAULTS = {
    "datadir": "data",
    "processes": 4,
    "force": False,
    "downloadmax": 100,
    "repos": ["base"],
    "cutoff": datetime.date(2014, 1, 4),
    "rfc": {"datadir": "data/rfc", "downloadmax": 10},
}


def test_precedence_later_source_wins(tmp_path):
    ini = tmp_path / "ferenda.ini"
    ini.write_text("[__root__]\ndatadir = /ini/data\nprocesses = 8\n")
    cfg = LayeredConfig(Defaults(DEFAULTS), INIFile(str(ini)),
                        Commandline(["--processes=16"]))
    assert cfg.datadir == "/ini/data"      # ini over default
    assert cfg.processes == 16             # argv over ini, int-coerced
    assert cfg.force is False              # default only


def test_typed_coercion_from_strings():
    cfg = LayeredConfig(
        Defaults(DEFAULTS),
        Commandline(["--force", "--downloadmax=5",
                     "--repos=base,rfc", "--cutoff=2020-06-01"]))
    assert cfg.force is True               # bare flag → bool
    assert cfg.downloadmax == 5
    assert cfg.repos == ["base", "rfc"]
    assert cfg.cutoff == datetime.date(2020, 6, 1)


def test_subsections_and_cascade():
    cfg = LayeredConfig(Defaults(DEFAULTS),
                        Commandline(["--rfc-downloadmax=3"]),
                        cascade=True)
    assert cfg.rfc.datadir == "data/rfc"
    assert cfg.rfc.downloadmax == 3        # argv subsection override
    # cascade: key absent from the subsection falls back to the parent
    assert cfg.rfc.processes == 4
    # without cascade the fallback must NOT happen
    flat = LayeredConfig(Defaults(DEFAULTS))
    with pytest.raises(AttributeError):
        flat.rfc.processes


def test_environment_source():
    env = {"FERENDA_DATADIR": "/env/data",
           "FERENDA_RFC__DOWNLOADMAX": "7", "OTHER": "x"}
    cfg = LayeredConfig(Defaults(DEFAULTS), Environment(env),
                        cascade=True)
    assert cfg.datadir == "/env/data"
    assert cfg.rfc.downloadmax == 7


def test_runtime_set_overrides_everything(tmp_path):
    cfg = LayeredConfig(Defaults(DEFAULTS),
                        Commandline(["--datadir=/argv"]))
    LayeredConfig.set(cfg, "datadir", "/runtime")
    assert cfg.datadir == "/runtime"
    cfg.processes = 2
    assert cfg.processes == 2
    assert LayeredConfig.get(cfg, "missing", "dflt") == "dflt"


def test_ini_subsections(tmp_path):
    ini = tmp_path / "ferenda.ini"
    ini.write_text("[__root__]\ndatadir = d\n"
                   "[rfc]\ndownloadmax = 12\n")
    cfg = LayeredConfig(Defaults(DEFAULTS), INIFile(str(ini)),
                        cascade=True)
    assert cfg.rfc.downloadmax == 12
    assert "rfc" in [s for s in cfg.keys()] or cfg.rfc  # subsection reachable


def test_commandline_rest_and_contains():
    cl = Commandline(["rfc", "download", "--force"])
    assert cl.rest == ["rfc", "download"]
    cfg = LayeredConfig(Defaults(DEFAULTS), cl)
    assert "force" in cfg and "nope" not in cfg


def test_cli_load_config(tmp_path, monkeypatch):
    """The CLI assembles defaults < ini < env < argv."""
    from ferenda_ray.cli import load_config
    ini = tmp_path / "my.ini"
    ini.write_text("[__root__]\nbuckets = 8\nformat = nt\n")
    cfg = load_config(["--config", str(ini), "build", "c", "o"])
    assert int(cfg.buckets) == 8 and str(cfg.format) == "nt"
    monkeypatch.setenv("FERENDA_BUCKETS", "16")
    cfg = load_config(["--config", str(ini)])
    assert int(cfg.buckets) == 16          # env over ini
    cfg = load_config(["--config", str(ini), "--buckets=64"])
    assert int(cfg.buckets) == 64          # argv over env
