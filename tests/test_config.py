"""User configuration (config.rs; apply_config_set main.rs:3014-3080):
key parsing/validation, delta-only persistence, env overrides."""

from __future__ import annotations

import json
import os

import pytest

from xf_spark import config as C


@pytest.fixture()
def cfg_file(tmp_path, monkeypatch):
    path = str(tmp_path / "config.json")
    monkeypatch.setenv("XF_SPARK_CONFIG", path)
    monkeypatch.delenv("XF_LIMIT", raising=False)
    return path


def test_defaults_when_no_file(cfg_file):
    cfg = C.load()
    assert cfg["search.fuzzy"] is False
    assert cfg["search.default_limit"] == 20
    assert cfg["output.format"] == "text"


def test_set_save_load_roundtrip(cfg_file):
    cfg = C.load()
    C.set_value(cfg, "search.fuzzy=true")
    C.set_value(cfg, "search.default_limit = 7")
    C.set_value(cfg, "indexing.skip_types=like, grok")
    C.set_value(cfg, "archive=/tmp/a")  # bare alias (main.rs:3031)
    C.save(cfg)
    # delta-only persistence: defaults are not written
    stored = json.load(open(cfg_file))
    assert stored == {
        "search.fuzzy": True,
        "search.default_limit": 7,
        "indexing.skip_types": ["like", "grok"],
        "paths.archive": "/tmp/a",
    }
    again = C.load()
    assert again["search.fuzzy"] is True
    assert again["search.default_limit"] == 7
    assert again["indexing.skip_types"] == ["like", "grok"]
    assert again["search.highlight"] is True  # untouched default


@pytest.mark.parametrize(
    "raw",
    [
        "nonsense",                   # no '='
        "=true",                      # empty key
        "search.bogus=1",             # unknown key
        "search.fuzzy=maybe",         # bad bool
        "search.min_score=1.5",       # out of range (main.rs:3045-3047)
        "search.default_limit=-2",    # negative
        "output.format=",             # empty format
    ],
)
def test_rejects_bad_assignments(cfg_file, raw):
    cfg = C.load()
    with pytest.raises(ValueError):
        C.set_value(cfg, raw)


def test_bool_forms_and_min_score(cfg_file):
    cfg = C.load()
    for raw, want in [("output.colors=0", False), ("output.colors=yes", True),
                      ("output.colors=off", False)]:
        C.set_value(cfg, raw)
        assert cfg["output.colors"] is want
    C.set_value(cfg, "search.min_score=0.25")
    assert cfg["search.min_score"] == 0.25


def test_xf_limit_env_override(cfg_file, monkeypatch):
    cfg = C.load()
    C.set_value(cfg, "search.default_limit=7")
    C.save(cfg)
    monkeypatch.setenv("XF_LIMIT", "11")
    assert C.load()["search.default_limit"] == 11
    monkeypatch.setenv("XF_LIMIT", "junk")
    assert C.load()["search.default_limit"] == 7


def test_corrupt_file_falls_back_to_defaults(cfg_file):
    os.makedirs(os.path.dirname(cfg_file), exist_ok=True)
    open(cfg_file, "w").write("{not json")
    assert C.load()["search.default_limit"] == 20


def test_completions_command(capsys):
    """Commands::Completions analog — generated from the live argparse
    tree, bash-syntax-valid, covers every subcommand."""
    import subprocess
    import sys

    from xf_spark.__main__ import build_parser, main

    assert main(["completions", "bash"]) == 0
    script = capsys.readouterr().out
    sub_names = set()
    for action in build_parser()._subparsers._group_actions:
        sub_names |= set(action.choices)
    for name in sub_names:
        assert f"\n    {name}) " in script or f"{name} " in script, name
    r = subprocess.run(["bash", "-n"], input=script, capture_output=True,
                       text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    # functional: the dispatcher must find the subcommand even with a
    # global flag before it (--cores 4 search), not assume COMP_WORDS[1]
    drive = (
        script
        + '\nCOMP_WORDS=(xf_spark --cores 4 search --); COMP_CWORD=4;'
        + '\n_xf_spark_complete; printf "%s\\n" "${COMPREPLY[@]}"'
    )
    r = subprocess.run(["bash"], input=drive, capture_output=True,
                       text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    got = set(r.stdout.split())
    assert {"--fuzzy", "--no-fuzzy"} <= got, got
    assert main(["completions", "zsh"]) == 0
    assert "#compdef" in capsys.readouterr().out


def test_set_does_not_persist_xf_limit(cfg_file, monkeypatch):
    """XF_LIMIT is a per-invocation override (config.rs:69); a
    read-modify-save with apply_env=False must not write it through."""
    monkeypatch.setenv("XF_LIMIT", "11")
    cfg = C.load(apply_env=False)
    C.set_value(cfg, "output.colors=0")
    C.save(cfg)
    stored = json.load(open(cfg_file))
    assert "search.default_limit" not in stored
    assert C.load()["search.default_limit"] == 11       # env still live
    monkeypatch.delenv("XF_LIMIT")
    assert C.load()["search.default_limit"] == 20       # not persisted


def test_validates_skip_types_and_format_at_set_time(cfg_file):
    cfg = C.load()
    with pytest.raises(ValueError, match="likes"):
        C.set_value(cfg, "indexing.skip_types=likes")   # plural: invalid
    with pytest.raises(ValueError):
        C.set_value(cfg, "output.format=xml")
    C.set_value(cfg, "indexing.skip_types=like,grok")   # singular: fine
    C.set_value(cfg, "output.format=json-pretty")


def test_search_parser_no_fuzzy_overrides_config():
    from xf_spark.__main__ import build_parser

    p = build_parser()
    assert p.parse_args(["search", "q"]).fuzzy is None
    assert p.parse_args(["search", "q", "--fuzzy"]).fuzzy is True
    assert p.parse_args(["search", "q", "--no-fuzzy"]).fuzzy is False
