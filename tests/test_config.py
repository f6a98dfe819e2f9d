"""Config-file loading (reference application.conf / conf:1-10 —
SURVEY.md §3.1's 'argparse + a small config loader')."""

from __future__ import annotations

import json

import pytest

from kafka_sparkstreaming_sbt_spark.config import (
    load_config,
    parse_hocon_subset,
    resolve,
)

#: the reference's application.conf, verbatim shape (creds changed)
REFERENCE_CONF = """
kafka {
  bootstrap.servers = "localhost:9092"
}

db {
  url = "jdbc:postgresql://localhost:5432/postgres"  # inline comment
  user = postgres
  password = "secret"
  driver = "org.postgresql.Driver"
}
// trailing comment
"""


def test_parses_reference_shaped_conf():
    cfg = parse_hocon_subset(REFERENCE_CONF)
    assert cfg == {
        "kafka.bootstrap.servers": "localhost:9092",
        "db.url": "jdbc:postgresql://localhost:5432/postgres",
        "db.user": "postgres",
        "db.password": "secret",
        "db.driver": "org.postgresql.Driver",
    }


def test_colon_separator_and_nesting():
    cfg = parse_hocon_subset("a {\n b {\n  c: 1\n }\n d = x\n}\n")
    assert cfg == {"a.b.c": "1", "a.d": "x"}


@pytest.mark.parametrize(
    "bad", ["a {\n b = 1\n", "}\n", "just a line\n"]
)
def test_malformed_conf_raises(bad):
    with pytest.raises(ValueError):
        parse_hocon_subset(bad)


def test_load_json_flattens(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"db": {"url": "jdbc:x", "user": "u"}}))
    assert load_config(p) == {"db.url": "jdbc:x", "db.user": "u"}


def test_load_conf_file(tmp_path):
    p = tmp_path / "application.conf"
    p.write_text(REFERENCE_CONF)
    assert load_config(p)["db.user"] == "postgres"


def test_resolve_precedence_cli_over_file_over_defaults():
    defaults = {"db.url": "", "db.user": "d", "kafka.topic": "t"}
    merged = resolve(
        defaults,
        {"db.url": "jdbc:file", "db.user": "f"},
        {"db.user": "cli"},
    )
    assert merged == {
        "db.url": "jdbc:file",
        "db.user": "cli",
        "kafka.topic": "t",
    }


def test_resolve_rejects_unknown_keys():
    with pytest.raises(KeyError, match="db.ur"):
        resolve({"db.url": ""}, {"db.ur": "typo"})


def test_runner_defaults_accept_reference_conf():
    """The reference's own application.conf (kafka.bootstrap.servers +
    db.url/user/password/driver) must resolve against the runner's
    defaults without a rejected-key error."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples",
        ),
    )
    from run_pipeline import CONFIG_DEFAULTS

    merged = resolve(CONFIG_DEFAULTS, parse_hocon_subset(REFERENCE_CONF))
    assert merged["db.driver"] == "org.postgresql.Driver"
    assert merged["db.user"] == "postgres"
    assert merged["kafka.bootstrap.servers"] == "localhost:9092"
