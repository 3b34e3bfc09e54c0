"""Layered config tests (config.py): defaults → YAML file → env
overrides, mirroring the reference's viper setup
(/root/reference/internal/config/config.go). No SparkSession needed."""

from __future__ import annotations

import pytest

from strava_data_pipeline_spark.config import (
    _parse_simple_yaml,
    load_config,
)

YAML = """\
# engine deployment config
data:
  sf_dir: /data/sf10
spark:
  shuffle_partitions: 2048   # ~2-3x fleet cores
  driver_memory: "32g"
auth:
  jwt_secret: 'file-secret'
  token_duration: 120
strava:
  client_id: 4242
"""


def test_defaults_when_no_file(tmp_path):
    cfg = load_config(str(tmp_path), env={})
    assert cfg.spark.shuffle_partitions == 32
    assert cfg.auth.token_duration == 60
    assert cfg.data.sf_dir.endswith("sf0.1")


def test_yaml_file_overrides_defaults(tmp_path):
    (tmp_path / "config.yaml").write_text(YAML)
    cfg = load_config(str(tmp_path), env={})
    assert cfg.data.sf_dir == "/data/sf10"
    assert cfg.spark.shuffle_partitions == 2048
    assert cfg.spark.driver_memory == "32g"  # quoted scalar unwrapped
    assert cfg.auth.jwt_secret == "file-secret"
    assert cfg.strava.client_id == 4242
    # untouched keys keep defaults
    assert cfg.spark.cpus == "*"


def test_env_beats_file(tmp_path):
    (tmp_path / "config.yaml").write_text(YAML)
    cfg = load_config(
        str(tmp_path),
        env={
            "SPARK_GRAFT_SPARK_SHUFFLE_PARTITIONS": "4096",
            "SPARK_GRAFT_AUTH_JWT_SECRET": "env-secret",
        },
    )
    assert cfg.spark.shuffle_partitions == 4096
    assert cfg.auth.jwt_secret == "env-secret"
    assert cfg.spark.driver_memory == "32g"  # file value survives for others


def test_unknown_section_and_key_raise(tmp_path):
    (tmp_path / "config.yaml").write_text("postgres:\n  host: x\n")
    with pytest.raises(ValueError, match="unknown config section"):
        load_config(str(tmp_path), env={})
    (tmp_path / "config.yaml").write_text("spark:\n  shufle_partitions: 8\n")
    with pytest.raises(ValueError, match="unknown key"):
        load_config(str(tmp_path), env={})


def test_fallback_parser_shape_guard():
    parsed = _parse_simple_yaml("a:\n  k: 1\n  s: 'x y'  # c\n\nb:\n  t: true\n")
    assert parsed == {"a": {"k": 1, "s": "x y"}, "b": {"t": True}}
    with pytest.raises(ValueError, match="deeper than 2"):
        _parse_simple_yaml("a:\n  b:\n    c: 1\n")
    with pytest.raises(ValueError, match="before any section"):
        _parse_simple_yaml("  k: 1\n")
    with pytest.raises(ValueError, match="top-level scalars"):
        _parse_simple_yaml("k: 1\n")


def test_fallback_parser_quoted_hash_survives():
    # '#' inside a quoted value is DATA (exactly the secrets this config
    # carries), not a comment; only an unquoted '#' starts one
    parsed = _parse_simple_yaml(
        'auth:\n  jwt_secret: "s3#cret"  # real comment\n'
        "  token_duration: 120\n"
        "strava:\n  client_secret: 'a#b#c'\n"
    )
    assert parsed["auth"]["jwt_secret"] == "s3#cret"
    assert parsed["auth"]["token_duration"] == 120
    assert parsed["strava"]["client_secret"] == "a#b#c"


def test_fallback_parser_unterminated_quote_raises():
    with pytest.raises(ValueError, match="unterminated"):
        _parse_simple_yaml('auth:\n  jwt_secret: "s3#cret\n')


def test_fallback_parser_midvalue_apostrophe_is_plain_scalar():
    # a quote only OPENS a span at value start: an unquoted value with
    # one apostrophe (o'brien) is plain-scalar content, not an
    # unterminated-quote error
    parsed = _parse_simple_yaml("auth:\n  owner: o'brien's run\n")
    assert parsed["auth"]["owner"] == "o'brien's run"


def test_fallback_parser_hash_needs_preceding_whitespace():
    # YAML plain-scalar rule: '#' glued to the value is data, '#' after
    # whitespace is a comment
    parsed = _parse_simple_yaml(
        "strava:\n  redirect: http://x/y#frag\n  name: abc # trailing\n"
    )
    assert parsed["strava"]["redirect"] == "http://x/y#frag"
    assert parsed["strava"]["name"] == "abc"
