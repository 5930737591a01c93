"""The STREAMING path (pgcdc source → run_pipeline_assembled) must
produce envelopes identical to the reference's golden file — same
normalization as the batch golden tests."""

from __future__ import annotations

import json
import os

from pg_bifrost_spark.cdc.pipeline import PipelineConfig
from pg_bifrost_spark.streaming.core import start_cdc_query
from tests.test_cdc_golden import basic_ops, load_golden, normalize
from tests.test_streaming import write_replay_dir


def test_streaming_matches_reference_golden(spark, tmp_path):
    wal_dir = write_replay_dir(tmp_path, basic_ops())
    got: list[str] = []

    def sink(df, epoch):
        got.extend(r.json for r in df.collect() if r.json)

    q = start_cdc_query(
        spark,
        sink,
        checkpoint_dir=str(tmp_path / "ck"),
        cfg=PipelineConfig(no_marshal_old_value=False),
        source_options={"wal_dir": wal_dir},
    )
    q.awaitTermination(180)
    assert normalize(got) == load_golden("basic.ndjson")
