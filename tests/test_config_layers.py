"""Config precedence: CLI > env > YAML > default (main.go:561-567
parity) plus the signal-triggered runtime introspection dump
(progress_tracker.go:291-305 parity)."""

from __future__ import annotations

import io
import json
import os
import signal

import pytest

from pg_bifrost_spark.config import resolve


@pytest.fixture
def yaml_file(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "whitelist: t_yaml\n"
        "partition-method: tablename\n"
        "partition-count: 4\n"
        "workers: 2\n"
        "client_buffer_size: 500\n"
    )
    return str(p)


def test_yaml_layer_alone(yaml_file):
    cfg = resolve(cli={}, env={}, config_file=yaml_file)
    assert cfg.pipeline.whitelist == ["t_yaml"]
    assert cfg.pipeline.partition_method == "tablename"
    assert cfg.pipeline.partition_buckets == 4
    assert cfg.workers == 2
    assert cfg.client_buffer_size == 500


def test_env_overrides_yaml(yaml_file):
    cfg = resolve(cli={}, env={"WHITELIST": "t_env", "WORKERS": "3"}, config_file=yaml_file)
    assert cfg.pipeline.whitelist == ["t_env"]
    assert cfg.workers == 3
    # untouched keys fall through to YAML
    assert cfg.pipeline.partition_buckets == 4


def test_cli_overrides_env_and_yaml(yaml_file):
    cfg = resolve(
        cli={"WHITELIST": "t_cli", "PARTITION_COUNT": 9},
        env={"WHITELIST": "t_env"},
        config_file=yaml_file,
    )
    assert cfg.pipeline.whitelist == ["t_cli"]
    assert cfg.pipeline.partition_buckets == 9
    assert cfg.pipeline.partition_method == "tablename"  # YAML survives


def test_defaults_when_no_layer_sets_key():
    cfg = resolve(cli={}, env={})
    assert cfg.pipeline.partition_method == "none"
    assert cfg.client_buffer_size == 10_000
    assert cfg.routing_method == "round-robin"


def test_yaml_bool_and_list_forms(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("blacklist: [a, b]\nno-marshal-old-value: true\n")
    cfg = resolve(cli={}, env={}, config_file=str(p))
    assert cfg.pipeline.blacklist == ["a", "b"]
    assert cfg.pipeline.no_marshal_old_value is True


def test_mutual_exclusion_across_layers(yaml_file):
    with pytest.raises(ValueError, match="mutually exclusive"):
        resolve(cli={"BLACKLIST": "x"}, env={}, config_file=yaml_file)


def test_cli_none_values_fall_through(yaml_file):
    """argparse passes None for flags the user didn't give — those
    must not mask lower layers."""
    cli = {k: None for k in ("WHITELIST", "WORKERS", "PARTITION_COUNT")}
    cfg = resolve(cli=cli, env={"WORKERS": "7"}, config_file=yaml_file)
    assert cfg.workers == 7
    assert cfg.pipeline.whitelist == ["t_yaml"]


# ---------------------------------------------------------- introspection
def test_dump_state_snapshots_active_query(spark, tmp_path):
    from pg_bifrost_spark.streaming.introspect import dump_state

    df = spark.readStream.format("rate").option("rowsPerSecond", "10").load()
    q = (
        df.writeStream.format("memory")
        .queryName("introspect_probe")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        buf = io.StringIO()
        states = dump_state(spark, out=buf)
        mine = [s for s in states if s["name"] == "introspect_probe"]
        assert mine and mine[0]["is_active"]
        assert mine[0]["sources"], "source offsets must be visible"
        # each line of the dump is standalone JSON (operator greps it)
        for line in buf.getvalue().strip().splitlines():
            json.loads(line)
    finally:
        q.stop()


def test_signal_dump_installs_and_fires(spark, tmp_path):
    from pg_bifrost_spark.streaming.introspect import install_signal_dump

    df = spark.readStream.format("rate").option("rowsPerSecond", "5").load()
    q = (
        df.writeStream.format("memory")
        .queryName("signal_probe")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    buf = io.StringIO()
    prev = install_signal_dump(spark, signum=signal.SIGUSR1, out=buf)
    try:
        q.processAllAvailable()
        os.kill(os.getpid(), signal.SIGUSR1)
        assert "signal_probe" in buf.getvalue()
    finally:
        signal.signal(signal.SIGUSR1, prev)
        q.stop()