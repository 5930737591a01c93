"""Config-layer parity and the native S3-layout file sink."""

from __future__ import annotations

import glob
import gzip
import json

import pytest

from pg_bifrost_spark.config import from_env
from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, raw_lines_df, txn
from pg_bifrost_spark.cdc.pipeline import PipelineConfig, run_pipeline
from pg_bifrost_spark.sinks.writers import kafka_frame, s3_time_partitioned


def test_config_from_env_full():
    cfg = from_env(
        {
            "WHITELIST": "public.a, public.b",
            "PARTITION_METHOD": "transaction-bucket",
            "PARTITION_COUNT": "8",
            "NO_MARSHAL_OLD_VALUE": "true",
            "WORKERS": "4",
            "BATCHER_ROUTING_METHOD": "partition",
        }
    )
    assert cfg.pipeline.whitelist == ["public.a", "public.b"]
    assert cfg.pipeline.partition_method == "transaction-bucket"
    assert cfg.pipeline.partition_buckets == 8
    assert cfg.pipeline.no_marshal_old_value is True
    assert cfg.workers == 4 and cfg.routing_method == "partition"


def test_config_mutual_exclusion_documented_intent():
    with pytest.raises(ValueError):
        from_env({"WHITELIST": "a", "BLACKLIST": "b"})
    with pytest.raises(ValueError):
        from_env({"BATCHER_ROUTING_METHOD": "bogus"})
    assert from_env({}).pipeline.partition_method == "none"


def _marshalled(spark):
    ops = [
        *txn(1, dml_line("public.t", "INSERT", [("id", "integer", 1)])),
        *txn(2, dml_line("public.t", "INSERT", [("id", "integer", 2)])),
    ]
    rows = [(ws, we, 1_700_000_000_000, sid, line) for ws, we, _, sid, line in ops_to_raw_lines(ops)]
    return run_pipeline(raw_lines_df(spark, rows), PipelineConfig())


def test_s3_time_partitioned_gzip_layout(spark, tmp_path):
    out = str(tmp_path / "s3")
    s3_time_partitioned(_marshalled(spark), out)
    files = glob.glob(f"{out}/year=2023/month=11/day=14/hour=*/*.txt.gz")
    assert files, "expected gzip NDJSON under the K5 time layout"
    records = []
    for f in files:
        with gzip.open(f, "rt") as g:
            records.extend(json.loads(line) for line in g if line.strip())
    assert {r["operation"] for r in records} == {"INSERT"}
    assert len(records) == 2


def test_kafka_frame_shape(spark):
    df = kafka_frame(_marshalled(spark), key_method="time-based-key")
    rows = df.collect()
    assert df.columns == ["key", "value"]
    assert len(rows) == 2  # control rows excluded
    assert all(isinstance(r.key, (bytes, bytearray)) for r in rows)
    envs = [json.loads(bytes(r.value)) for r in rows]
    assert {e["table"] for e in envs} == {"public.t"}
