"""Streaming analytics: windowed aggregation and watermark dedup under
readStream, checked against their DuckDB-verified batch twins."""

from __future__ import annotations

import pytest

from pg_bifrost_spark.streaming.analytics import (
    dedup_within_watermark,
    stream_events,
    windowed_counts,
)
import pg_bifrost_spark.plans as plans

plans.load_all()

SF = "/root/testdata/sf0.001"


def run_to_memory(df, name: str, mode: str) -> None:
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_tumbling_matches_batch_twin(spark):
    ev = stream_events(spark, SF)
    run_to_memory(windowed_counts(ev, "60 seconds"), "win_tumble", "complete")
    got = {
        (r.window_start, r.event_type): (r.n, r.total)
        for r in spark.sql("select * from win_tumble").collect()
    }
    batch = plans.QUERIES["tumbling_window_stats"](spark, SF).collect()
    expect = {(r.window_start, r.event_type): (r.n, r.total) for r in batch}
    assert got == expect


def test_streaming_sliding_window(spark):
    ev = stream_events(spark, SF)
    run_to_memory(windowed_counts(ev, "10 minutes", "5 minutes"), "win_slide", "complete")
    rows = spark.sql("select * from win_slide").collect()
    # every event lands in exactly 2 sliding windows
    assert sum(r.n for r in rows) == 2 * 1000


def test_streaming_interval_join_matches_batch_twin(spark):
    """Stream-stream interval join result == the DuckDB-verified batch
    twin (same pairs; watermark eviction must not drop valid matches
    under availableNow replay)."""
    from pg_bifrost_spark.streaming.analytics import interval_join

    ev = stream_events(spark, SF)
    clicks = ev.filter("event_type = 'click'")
    views = ev.filter("event_type = 'view'")
    run_to_memory(interval_join(clicks, views), "ij_pairs", "append")
    got = {
        (r.click_id, r.view_id, r.user_id, r.view_value)
        for r in spark.sql("select * from ij_pairs").collect()
    }
    batch = plans.QUERIES["interval_click_views"](spark, SF).collect()
    expect = {(r.click_id, r.view_id, r.user_id, r.view_value) for r in batch}
    assert got == expect
    assert len(got) > 0


def test_streaming_interval_join_left_outer(spark):
    """Left-outer stream-stream: matched pairs equal the batch twin;
    every unmatched click is null-emitted exactly once after the
    watermark passes its match window (availableNow drains the state)."""
    from pg_bifrost_spark.streaming.analytics import interval_join

    ev = stream_events(spark, SF)
    out = interval_join(
        ev.filter("event_type = 'click'"),
        ev.filter("event_type = 'view'"),
        watermark="1 minute",
        how="left_outer",
    )
    run_to_memory(out, "ij_outer", "append")
    rows = spark.sql("select * from ij_outer").collect()
    matched = {(r.click_id, r.view_id) for r in rows if r.view_id is not None}
    null_clicks = [r.click_id for r in rows if r.view_id is None]
    batch = plans.QUERIES["interval_click_views"](spark, SF).collect()
    expect_pairs = {(r.click_id, r.view_id) for r in batch}
    assert matched == expect_pairs
    matched_clicks = {c for c, _ in expect_pairs}
    clicks = plans.table(spark, SF, "events").filter("event_type='click'").collect()
    unmatched = {r.event_id for r in clicks} - matched_clicks
    # every null-emit is a real unmatched click, emitted exactly once
    assert len(null_clicks) == len(set(null_clicks))
    assert set(null_clicks) <= unmatched
    # the only unmatched clicks NOT emitted are those still inside the
    # final watermark horizon (their match window never closed — Spark
    # correctly retains them awaiting possible matches)
    import datetime

    final_wm = max(r.ts for r in clicks) - datetime.timedelta(minutes=1)
    held = unmatched - set(null_clicks)
    assert all(
        r.ts >= final_wm for r in clicks if r.event_id in held
    ), f"non-boundary clicks went missing: {held}"


def test_stream_static_enrichment_broadcast(spark):
    """Stream-static join: every event picks up its customer's segment
    without shuffling the stream; unmatched user_ids survive (left)."""
    from pg_bifrost_spark.streaming.analytics import enrich_with_static
    from pg_bifrost_spark.plans import table  # noqa

    ev = stream_events(spark, SF)
    dim = table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    run_to_memory(
        enrich_with_static(ev, dim, "user_id", "c_custkey").select(
            "event_id", "user_id", "c_mktsegment"
        ),
        "enriched",
        "append",
    )
    got = spark.sql("select * from enriched").collect()
    assert len(got) == 1000  # left join: no events lost
    batch_ev = table(spark, SF, "events")
    expect = {
        (r.event_id, r.c_mktsegment)
        for r in batch_ev.join(dim, batch_ev.user_id == dim.c_custkey, "left")
        .select("event_id", "c_mktsegment")
        .collect()
    }
    assert {(r.event_id, r.c_mktsegment) for r in got} == expect


def test_streaming_dedup_within_watermark(spark, tmp_path):
    # duplicate the events stream: two identical files → every event_id twice
    import shutil

    d = tmp_path / "dup"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    shutil.copy(f"{SF}/events.parquet", d / "events_copy.parquet")

    from pg_bifrost_spark.plans import events_ts_to_timestamp
    from pg_bifrost_spark.streaming.analytics import events_stream_schema

    raw = spark.readStream.schema(events_stream_schema(spark, SF)).parquet(str(d))
    ev = events_ts_to_timestamp(raw)
    run_to_memory(dedup_within_watermark(ev), "dedup_wm", "append")
    n = spark.sql("select count(*) as n from dedup_wm").collect()[0].n
    assert n == 1000  # duplicates dropped

    # distinct event_ids preserved exactly once
    dups = spark.sql(
        "select event_id from dedup_wm group by event_id having count(*) > 1"
    ).collect()
    assert dups == []
