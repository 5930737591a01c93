"""Streaming analytics operators over event streams — the readStream
twins of ``plans/events.py`` (same expressions, so the DuckDB-verified
batch results carry over; Structured Streaming runs the identical plan
per micro-batch with watermark-managed state).

Reference lineage: the only streaming aggregation in pg-bifrost is the
stats time-bucket (A6) with a late-data grace — generalized here to
arbitrary tumbling/sliding/session windows and watermark dedup (W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import _ensure_session_conf

EVENTS_DDL = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def events_stream_schema(spark: SparkSession, sf_dir: str) -> str:
    """Streams need an explicit schema; probe the parquet footer with a
    batch read so the DDL matches the fixture vintage (ts was
    TIMESTAMP(NANOS)→bigint under nanosAsLong in older fixtures,
    timestamp[us] in newer ones)."""
    _ensure_session_conf(spark)
    ts_type = (
        spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    )
    assert "ts bigint" in EVENTS_DDL, (
        "EVENTS_DDL reworded: the ts-type substitution anchor is gone"
    )
    return EVENTS_DDL.replace("ts bigint", f"ts {ts_type.simpleString()}")


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file stream (ts normalized to timestamp)."""
    from ..plans import events_ts_to_timestamp

    raw = (
        spark.readStream.schema(events_stream_schema(spark, sf_dir))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return events_ts_to_timestamp(raw)


def windowed_counts(
    events: DataFrame,
    width: str = "60 seconds",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding window counts with late-data drop. Late rows
    beyond ``watermark`` are discarded, exactly the stats aggregator's
    grace semantics (aggregator.go:44, 278-285)."""
    win = F.window("ts", width, slide) if slide else F.window("ts", width)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def session_windows(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` merges
    events within ``gap`` into one growing window per user; the
    watermark closes sessions so state is bounded. Batch twin:
    ``plans/events.py::sessionize_users`` (gaps-and-islands)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def interval_join(
    clicks: DataFrame,
    views: DataFrame,
    within: str = "24 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with EVERY view by
    the same user in the trailing ``within`` interval (unlike the as-of
    join, which keeps only the latest). Watermarks on BOTH sides let
    Spark evict buffered rows once they can no longer match — state is
    bounded by ``within`` + ``watermark`` regardless of stream length.
    ``how="left_outer"`` additionally emits unmatched clicks (null view
    columns) once the watermark passes their match window — the emission
    is watermark-DRIVEN, so outer rows appear a micro-batch later than
    their inner twins. Batch twin: ``plans/events.py::interval_click_views``."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    ).withWatermark("view_ts", watermark)
    return c.join(
        v,
        F.expr(
            f"c_user = v_user AND view_ts BETWEEN click_ts - INTERVAL {within} AND click_ts"
        ),
        how,
    ).select(
        "click_id",
        "view_id",
        F.col("c_user").alias("user_id"),
        F.round("view_value", 2).alias("view_value"),
    )


def enrich_with_static(
    events: DataFrame, dim: DataFrame, stream_key: str, dim_key: str
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a static
    dimension, broadcast so the stream never shuffles. The static side
    is re-resolved per micro-batch (Spark re-reads changed files), which
    is how slowly-changing dims stay fresh without restarting the
    query."""
    return events.join(
        F.broadcast(dim), F.col(stream_key) == F.col(dim_key), "left"
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for older keys is
    evicted. This is the ledger's replay-dedup (W4,
    ledger.go:50-61) generalized — the reference bounds state by txn
    completion, Spark bounds it by event time."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
