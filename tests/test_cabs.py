"""stimela cab surface: pfb_tpu/parser/uncabbedcabs.yml (the analogue
of the reference's pfb/parser/uncabbedcabs.yml:1-80) must stay in sync
with the workers and their schema files — every cab names an importable
click command and includes an existing parameter schema whose structure
is stimela-cab-shaped (inputs/outputs with dtype'd parameters)."""

import importlib
import os

import yaml

PARSER = os.path.join(os.path.dirname(__file__), "..", "pfb_tpu",
                      "parser")


def _load_cabs():
    with open(os.path.join(PARSER, "uncabbedcabs.yml")) as fh:
        return yaml.safe_load(fh)


def test_every_worker_has_a_cab():
    cabs = _load_cabs()
    from pfb_tpu.workers.main import cli
    workers = set(cli.commands) - {"pipeline"}
    assert {c.split(".", 1)[1] for c in cabs} == workers


def test_cab_commands_importable_and_includes_exist():
    cabs = _load_cabs()
    for name, cab in cabs.items():
        assert cab["flavour"] == "python", name
        mod, attr = cab["command"].rsplit(".", 1)
        fn = getattr(importlib.import_module(mod), attr)
        assert callable(fn), cab["command"]
        for inc in cab["_include"]:
            path = inc.replace("(.)", "")
            assert os.path.exists(os.path.join(PARSER, path)), inc


def test_cab_schemas_are_stimela_shaped():
    cabs = _load_cabs()
    for name, cab in cabs.items():
        path = cab["_include"][0].replace("(.)", "")
        with open(os.path.join(PARSER, path)) as fh:
            schema = yaml.safe_load(fh)
        assert "inputs" in schema, name
        params = {k: v for k, v in schema["inputs"].items()
                  if k != "_include"}
        assert params, name
        for pname, p in params.items():
            assert "dtype" in p, (name, pname)
