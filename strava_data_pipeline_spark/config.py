"""Layered configuration: YAML file + environment overrides + defaults.

Parity with the reference's config layer
(/root/reference/internal/config/config.go: viper YAML named
``config.yaml`` searched in an explicit dir then ``.``, AutomaticEnv
overrides, defaults when the file is missing). Sections are re-scoped
for a batch/streaming engine: ``data`` (table roots) and ``spark``
(resource knobs) replace the Postgres block, while ``strava`` (API
credentials) and ``auth`` (JWT) carry over verbatim.

Precedence, highest first — the same order viper resolves:
    1. environment variables  (SPARK_GRAFT_<SECTION>_<KEY>)
    2. the YAML file          (config.yaml)
    3. built-in defaults

PyYAML isn't guaranteed in the runtime, so a strict two-level fallback
parser (sections + scalar keys, comments, quoted strings) handles the
config shape when ``yaml`` is absent; files beyond that shape raise.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, fields
from typing import Any

ENV_PREFIX = "SPARK_GRAFT"


@dataclass
class DataConfig:
    """Where tables live (the engine's analog of the Database block)."""

    sf_dir: str = "/root/testdata/sf0.1"
    warehouse_dir: str = "spark-warehouse"


@dataclass
class SparkConfig:
    """Resource/scale knobs get_spark applies."""

    cpus: str = "*"
    shuffle_partitions: int = 32
    driver_memory: str = "8g"
    broadcast_threshold: str = "64m"


@dataclass
class StravaConfig:
    """OAuth client settings (config.go Strava block)."""

    client_id: int = 0
    client_secret: str = ""
    callback_url: str = ""
    access_token: str = ""
    refresh_token: str = ""


@dataclass
class AuthConfig:
    """JWT settings (config.go Auth block)."""

    jwt_secret: str = ""
    token_duration: int = 60  # minutes


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
    strava: StravaConfig = field(default_factory=StravaConfig)
    auth: AuthConfig = field(default_factory=AuthConfig)


def _parse_scalar(raw: str) -> Any:
    s = raw.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'":
        return s[1:-1]
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _strip_comment(line: str, ln: int) -> str:
    """Drop a ``#`` comment, but only when it starts OUTSIDE a quoted
    span — a secret like ``jwt_secret: "s3#cret"`` must survive intact
    (naive ``split('#')`` truncated exactly the values this config
    carries).

    YAML-faithful details that matter for real values:
    - a quote only OPENS a span at the start of a value (right after
      ``:`` + spaces) or at line start — a mid-word apostrophe
      (``name: o'brien``) is plain-scalar content, not an unterminated
      quote;
    - ``#`` only starts a comment at line start or after whitespace —
      ``url: http://x#frag`` keeps its fragment, per YAML plain-scalar
      rules.
    A quote OPENED at value start but never closed still raises instead
    of silently yielding a malformed token."""
    quote: str | None = None
    at_value_start = True  # line start (before key) or just after ':'
    for i, ch in enumerate(line):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch == "#" and (i == 0 or line[i - 1] in " \t"):
            return line[:i]
        if ch in "\"'" and at_value_start:
            quote = ch
        elif ch == ":":
            at_value_start = True
        elif ch not in " \t":
            at_value_start = False
    if quote:
        raise ValueError(f"line {ln}: unterminated {quote} quote")
    return line


def _parse_simple_yaml(text: str) -> dict[str, dict[str, Any]]:
    """Two-level YAML subset: ``section:`` headers with indented
    ``key: value`` scalars. Comments and blank lines are skipped;
    anything deeper/list-shaped raises ValueError (use PyYAML then)."""
    out: dict[str, dict[str, Any]] = {}
    section: str | None = None
    for ln, line in enumerate(text.splitlines(), 1):
        stripped = _strip_comment(line, ln).rstrip()
        if not stripped.strip():
            continue
        indented = stripped[0] in " \t"
        body = stripped.strip()
        if ":" not in body:
            raise ValueError(f"line {ln}: expected 'key: value', got {body!r}")
        key, _, val = body.partition(":")
        key = key.strip()
        if not indented:
            if val.strip():
                raise ValueError(
                    f"line {ln}: top-level scalars not supported; "
                    "use 'section:' then indented keys"
                )
            section = key
            out.setdefault(section, {})
        else:
            if section is None:
                raise ValueError(f"line {ln}: indented key before any section")
            if not val.strip():
                raise ValueError(f"line {ln}: nesting deeper than 2 levels")
            out[section][key] = _parse_scalar(val)
    return out


def _load_yaml_file(path: str) -> dict[str, dict[str, Any]]:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    try:
        import yaml  # type: ignore[import-not-found]

        data = yaml.safe_load(text) or {}
        if not isinstance(data, dict):
            raise ValueError(f"{path}: top level must be a mapping")
        return {
            str(k): dict(v) if isinstance(v, dict) else v for k, v in data.items()
        }
    except ImportError:
        return _parse_simple_yaml(text)


def load_config(
    config_path: str | None = None, env: dict[str, str] | None = None
) -> Config:
    """Resolve the effective config.

    ``config.yaml`` is searched in ``config_path`` then ``.`` (viper's
    AddConfigPath order); a missing file is not an error — defaults +
    env apply, matching config.go's ConfigFileNotFoundError branch. A
    present-but-malformed file raises. Env overrides use
    ``SPARK_GRAFT_<SECTION>_<KEY>`` (e.g. SPARK_GRAFT_AUTH_JWT_SECRET,
    SPARK_GRAFT_SPARK_SHUFFLE_PARTITIONS) and win over the file.
    Unknown sections/keys in the file raise — silent typos in config
    are how prod deploys run with defaults they didn't choose.
    """
    environ = os.environ if env is None else env
    cfg = Config()
    search = [p for p in (config_path, ".") if p]
    file_data: dict[str, dict[str, Any]] = {}
    for d in search:
        candidate = os.path.join(d, "config.yaml")
        if os.path.isfile(candidate):
            file_data = _load_yaml_file(candidate)
            break
    sections = {f.name: getattr(cfg, f.name) for f in fields(cfg)}
    for sec_name, sec_vals in file_data.items():
        if sec_name not in sections:
            raise ValueError(f"unknown config section {sec_name!r}")
        section = sections[sec_name]
        valid = {f.name for f in fields(section)}
        for key, val in dict(sec_vals).items():
            if key not in valid:
                raise ValueError(f"unknown key {sec_name}.{key}")
            setattr(section, key, _coerce(type(getattr(section, key)), val))
    for sec_name, section in sections.items():
        for f in fields(section):
            env_key = f"{ENV_PREFIX}_{sec_name.upper()}_{f.name.upper()}"
            if env_key in environ:
                setattr(
                    section,
                    f.name,
                    _coerce(type(getattr(section, f.name)), environ[env_key]),
                )
    return cfg


def _coerce(typ: type, val: Any) -> Any:
    if typ is bool and isinstance(val, str):
        return val.lower() == "true"
    if typ in (int, float, str):
        return typ(val)
    return val
