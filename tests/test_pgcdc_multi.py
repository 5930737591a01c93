"""Partitioned multi-slot CDC source: per-slot ordering + txn
assembly, parallel partitions, per-slot acks."""

from __future__ import annotations

import json
import os

from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, txn
from pg_bifrost_spark.cdc.pipeline import PipelineConfig, run_pipeline_assembled
from pg_bifrost_spark.sources import pgcdc_multi


def _write_slot(base, slot, ops, start_lsn):
    d = os.path.join(base, slot)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "000.jsonl"), "w") as f:
        for ws, _, tm, _, line in ops_to_raw_lines(ops, start_lsn=start_lsn):
            f.write(json.dumps({"wal_start": ws, "server_time_ms": tm, "line": line}) + "\n")


def test_multi_slot_stream(spark, tmp_path):
    base = str(tmp_path / "wal")
    _write_slot(
        base,
        "slot_a",
        [
            *txn(10, dml_line("public.x", "INSERT", [("id", "integer", 1)])),
            *txn(11, dml_line("public.x", "INSERT", [("id", "integer", 2)])),
        ],
        start_lsn=1000,
    )
    _write_slot(
        base,
        "slot_b",
        txn(90, dml_line("public.y", "INSERT", [("id", "integer", 7)])),
        start_lsn=1000,  # overlapping LSN space: slots are independent
    )

    pgcdc_multi.register(spark)
    stream = spark.readStream.format("pgcdc-multi").option("wal_dir", base).load()
    out = run_pipeline_assembled(stream, PipelineConfig(partition_method="tablename"))
    collected = []
    q = (
        out.writeStream.foreachBatch(lambda df, e: collected.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    payloads = [r for r in collected if r.json]
    assert len(payloads) == 3
    by_table = {}
    for r in payloads:
        by_table.setdefault(r.table, []).append(r)
    assert len(by_table["public.x"]) == 2 and len(by_table["public.y"]) == 1
    assert sorted(r.transaction for r in payloads) == ["10", "11", "90"]

    # second batch: new data in ONE slot only; the other's offset holds
    with open(os.path.join(base, "slot_b", "001.jsonl"), "w") as f:
        for ws, _, tm, _, line in ops_to_raw_lines(
            txn(91, dml_line("public.y", "INSERT", [("id", "integer", 8)])), start_lsn=50_000
        ):
            f.write(json.dumps({"wal_start": ws, "server_time_ms": tm, "line": line}) + "\n")
    n0 = len(collected)
    q2 = (
        out.writeStream.foreachBatch(lambda df, e: collected.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    new = [r for r in collected[n0:] if r.json]
    assert [r.transaction for r in new] == ["91"]  # only the new txn, once

    # per-slot acks recorded after the follow-up batch triggered commit
    ack_a = open(os.path.join(base, "slot_a", ".ack")).read()
    assert int(ack_a) >= 1000
