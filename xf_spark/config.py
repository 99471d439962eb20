"""User configuration (config.rs + cmd_config, main.rs:2941-2969).

The reference persists a TOML config with dotted sections
(paths/search/indexing/output) and a `config --set key=value --show`
CLI. Same surface here, stored as flat dotted-key JSON at
``$XF_SPARK_CONFIG`` (default ``~/.config/xf_spark/config.json``).
Only non-default values are written; load() merges over DEFAULTS.

Keys that change engine behavior are wired where they land:
``search.fuzzy`` / ``search.default_limit`` / ``search.min_score`` ->
cmd_search defaults, ``output.format`` -> CLI format default,
``paths.index`` -> --index fallback, ``indexing.skip_types`` ->
archive-member skip during import (read_archive_dir). The rest are
accepted and persisted for config-file parity (apply_config_set,
main.rs:3014-3080) but have no Spark analog to drive (e.g.
``indexing.buffer_size_mb`` is a Tantivy writer-heap knob).
"""

from __future__ import annotations

import json
import os

DEFAULTS: dict = {
    "paths.db": None,
    "paths.index": None,
    "paths.archive": None,
    "search.default_limit": 20,
    "search.highlight": True,
    "search.fuzzy": False,
    "search.min_score": 0.0,
    "search.cache_size": 100,
    "indexing.parallel": True,
    "indexing.buffer_size_mb": 100,
    "indexing.threads": 0,
    "indexing.skip_types": [],
    "output.format": "text",
    "output.colors": True,
    "output.quiet": False,
}

# bare aliases the reference accepts (apply_config_set, main.rs:3025-3033)
_ALIASES = {"db": "paths.db", "index": "paths.index", "archive": "paths.archive"}


def config_path() -> str:
    env = os.environ.get("XF_SPARK_CONFIG")
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".config", "xf_spark", "config.json"
    )


def load(apply_env: bool = True) -> dict:
    """DEFAULTS overlaid with the stored file; unknown stored keys are
    preserved (forward compatibility). ``XF_LIMIT`` overrides
    search.default_limit (config.rs:69) — per-invocation only: a
    read-modify-save cycle must load with ``apply_env=False`` so the
    transient env value is never persisted."""
    cfg = dict(DEFAULTS)
    path = config_path()
    if os.path.isfile(path):
        try:
            with open(path) as fh:
                stored = json.load(fh)
        except (OSError, json.JSONDecodeError):
            stored = {}
        if isinstance(stored, dict):
            cfg.update(stored)
    env_limit = os.environ.get("XF_LIMIT") if apply_env else None
    if env_limit:
        try:
            cfg["search.default_limit"] = int(env_limit)
        except ValueError:
            pass
    return cfg


def save(cfg: dict) -> str:
    """Persist only the keys that differ from DEFAULTS."""
    path = config_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    delta = {
        k: v
        for k, v in cfg.items()
        if k not in DEFAULTS or DEFAULTS[k] != v
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(delta, fh, indent=2, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, path)
    return path


def _parse_bool(value: str, key: str) -> bool:
    low = value.strip().lower()
    if low in ("true", "1", "yes", "on"):
        return True
    if low in ("false", "0", "no", "off"):
        return False
    raise ValueError(f"{key} expects a boolean, got {value!r}")


def set_value(cfg: dict, raw: str) -> None:
    """Apply one ``key=value`` assignment with the reference's parsing
    and validation rules (apply_config_set, main.rs:3014-3080)."""
    if "=" not in raw:
        raise ValueError("Invalid --set format. Use key=value.")
    key, value = (s.strip() for s in raw.split("=", 1))
    if not key:
        raise ValueError("Invalid --set key. Use key=value.")
    key = _ALIASES.get(key, key)
    if key not in DEFAULTS:
        raise ValueError(f"Unknown config key: {key}")
    if key.startswith("paths."):
        cfg[key] = value or None
    elif key == "search.min_score":
        parsed = float(value)
        if not 0.0 <= parsed <= 1.0:
            raise ValueError(f"{key} must be between 0.0 and 1.0.")
        cfg[key] = parsed
    elif key == "indexing.skip_types":
        types = [t.strip() for t in value.split(",") if t.strip()]
        # validate at SET time: a bad member would otherwise surface
        # only after the expensive zip extraction, mid-import
        bad = sorted(set(types) - {"tweet", "like", "dm", "grok"})
        if bad:
            raise ValueError(
                f"{key}: unknown type(s) {bad} (valid: tweet,like,dm,grok)"
            )
        cfg[key] = types
    elif key == "output.format":
        valid = ("text", "json", "json-pretty", "csv", "compact")
        if value not in valid:
            raise ValueError(f"{key} must be one of {','.join(valid)}.")
        cfg[key] = value
    elif isinstance(DEFAULTS[key], bool):
        cfg[key] = _parse_bool(value, key)
    elif isinstance(DEFAULTS[key], int):
        parsed_i = int(value)
        if parsed_i < 0:
            raise ValueError(f"{key} must be non-negative.")
        cfg[key] = parsed_i
    else:
        cfg[key] = value
