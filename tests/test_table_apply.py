"""CDC → snapshot materialization: multi-batch apply, last-writer-wins
resolution, DELETE handling, and at-least-once idempotence (replaying
the same batch converges)."""

from __future__ import annotations

from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, raw_lines_df, txn
from pg_bifrost_spark.cdc.pipeline import PipelineConfig, run_pipeline
from pg_bifrost_spark.sinks.table_apply import (
    apply_changes,
    changes_to_upserts,
    snapshot_as_columns,
)


def _marshal(spark, ops, start_lsn):
    return run_pipeline(
        raw_lines_df(spark, ops_to_raw_lines(ops, start_lsn=start_lsn)), PipelineConfig()
    )


def _rows(snapshot):
    return sorted(
        (r.id, r.name)
        for r in snapshot_as_columns(snapshot, {"id": "bigint", "name": "string"}).collect()
    )


def test_multi_batch_apply_and_idempotence(spark):
    batch1 = [
        *txn(1, dml_line("public.t", "INSERT", [("id", "integer", 1), ("name", "text", "a")])),
        *txn(2, dml_line("public.t", "INSERT", [("id", "integer", 2), ("name", "text", "b")])),
    ]
    batch2 = [
        *txn(3, dml_line("public.t", "UPDATE", [("id", "integer", 1), ("name", "text", "a2")])),
        *txn(4, dml_line("public.t", "DELETE", [("id", "integer", 2)])),
        *txn(5, dml_line("public.t", "INSERT", [("id", "integer", 3), ("name", "text", "c")])),
    ]
    up1 = changes_to_upserts(_marshal(spark, batch1, 1000), pk="id")
    snap1 = apply_changes(None, up1, pk="id").cache()
    assert _rows(snap1) == [(1, "a"), (2, "b")]

    up2 = changes_to_upserts(_marshal(spark, batch2, 5000), pk="id")
    snap2 = apply_changes(snap1, up2, pk="id").cache()
    assert _rows(snap2) == [(1, "a2"), (3, "c")]

    # at-least-once: re-applying batch2 converges to the same state
    snap2_again = apply_changes(snap2, up2, pk="id")
    assert _rows(snap2_again) == [(1, "a2"), (3, "c")]
