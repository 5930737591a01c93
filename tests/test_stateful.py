"""Custom stateful streaming operators (applyInPandasWithState):
ledger completion semantics and running totals, driven by a two-batch
file stream so state genuinely carries across micro-batches."""

from __future__ import annotations

import pytest

from pg_bifrost_spark.streaming.stateful import running_user_totals, txn_ledger_stream

LEDGER_IN_DDL = (
    "time_based_key string, operation string, wal_start bigint, expected_msgs bigint"
)


def _write_batch(spark, d, name, rows, ddl):
    """Write one flat parquet file into the stream dir (the file source
    does not recurse into subdirectories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{d}/{name}.parquet")


def _run_stream(spark, src_dir, ddl, build, mode, ckpt=None, acc=None):
    """With ``ckpt``+``acc``: a checkpointed foreachBatch query whose
    restart resumes from the committed offset — NEW rows only, so a
    second call genuinely proves state carried across micro-batches
    (a fresh memory-sink query would just reprocess everything)."""
    stream = spark.readStream.schema(ddl).parquet(src_dir)
    writer = build(stream).writeStream.outputMode(mode)
    if ckpt is not None:
        emitted = acc if acc is not None else []
        writer = writer.foreachBatch(lambda df, e: emitted.extend(df.collect())).option(
            "checkpointLocation", ckpt
        )
    else:
        emitted = None
        writer = writer.format("memory").queryName("stateful_out")
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(180)
    if ckpt is not None:
        return list(emitted)
    return spark.sql("select * from stateful_out").collect()


def test_txn_ledger_completion(spark, tmp_path):
    d = str(tmp_path / "in")
    # txn A: 2 data msgs + COMMIT expecting 2 → completes
    # txn B: 1 data msg, COMMIT expects 2 → stays pending (no output)
    rows = [
        ("A-1", "INSERT", 10, -1),
        ("A-1", "INSERT", 11, -1),
        ("A-1", "COMMIT", 12, 2),
        ("B-9", "INSERT", 20, -1),
        ("B-9", "COMMIT", 21, 2),
    ]
    import os

    os.makedirs(d)
    ckpt, acc = str(tmp_path / "ck"), []
    _write_batch(spark, d, "b0", rows, LEDGER_IN_DDL)
    out = _run_stream(spark, d, LEDGER_IN_DDL, txn_ledger_stream, "append", ckpt, acc)
    got = {r.time_based_key: (r.total_msgs, r.commit_wal_start) for r in out}
    assert got == {"A-1": (2, 12)}

    # late arrival completes txn B in a later micro-batch: the resumed
    # query reads ONLY the new file, so completion proves carried state
    _write_batch(spark, d, "b1", [("B-9", "INSERT", 22, -1)], LEDGER_IN_DDL)
    out2 = _run_stream(spark, d, LEDGER_IN_DDL, txn_ledger_stream, "append", ckpt, acc)
    got2 = {r.time_based_key: (r.total_msgs, r.commit_wal_start) for r in out2}
    assert got2["B-9"] == (2, 21)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (not functional "
    "in this container); the applyInPandasWithState ledger is the tested path",
)
def test_txn_ledger_v2_transform_with_state(spark, tmp_path):
    """Same ledger semantics on the new transformWithStateInPandas
    API, including state carry across micro-batches."""
    import os

    from pg_bifrost_spark.streaming.stateful import txn_ledger_stream_v2

    d = str(tmp_path / "in")
    os.makedirs(d)
    ckpt, acc = str(tmp_path / "ck"), []
    _write_batch(
        spark, d, "b0",
        [("A-1", "INSERT", 10, -1), ("A-1", "COMMIT", 12, 2), ("B-9", "INSERT", 20, -1)],
        LEDGER_IN_DDL,
    )
    out = _run_stream(spark, d, LEDGER_IN_DDL, txn_ledger_stream_v2, "append", ckpt, acc)
    assert {r.time_based_key for r in out} == set()  # A expects 2, has 1

    _write_batch(
        spark, d, "b1",
        [("A-1", "INSERT", 11, -1), ("B-9", "COMMIT", 21, 1)],
        LEDGER_IN_DDL,
    )
    out2 = _run_stream(spark, d, LEDGER_IN_DDL, txn_ledger_stream_v2, "append", ckpt, acc)
    got = {r.time_based_key: (r.total_msgs, r.commit_wal_start) for r in out2}
    assert got == {"A-1": (2, 12), "B-9": (1, 21)}


def test_running_user_totals(spark, tmp_path):
    import os

    d = str(tmp_path / "in")
    os.makedirs(d)
    ddl = "user_id bigint, value double"
    _write_batch(spark, d, "b0", [(1, 1.5), (1, 2.5), (2, 10.0)], ddl)
    out = _run_stream(spark, d, ddl, running_user_totals, "update")
    got = {r.user_id: (r.n_events, r.total_value) for r in out}
    assert got == {1: (2, 4.0), 2: (1, 10.0)}


# ---------------------------------------------------------------------------
# streaming funnel vs its batch twin
# ---------------------------------------------------------------------------
def test_funnel_stream_matches_batch_twin(spark, tmp_path):
    """The streaming funnel over the real events fixture, fed as two
    CHRONOLOGICAL micro-batches (users mid-funnel at the split must
    complete from carried state), must produce exactly the batch
    twin's converted-user set with identical step timestamps."""
    from pyspark.sql import functions as F

    from pg_bifrost_spark.plans import table
    from pg_bifrost_spark.plans.events import FUNNEL_WINDOW_HOURS
    from pg_bifrost_spark.streaming.stateful import FUNNEL_IN_DDL, funnel_stream

    ev = (
        table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("t_us"))
        .orderBy("t_us")
    )
    rows = [(r.user_id, r.event_type, r.t_us) for r in ev.collect()]
    cut = len(rows) // 2
    d = str(tmp_path / "in")
    import os

    os.makedirs(d)
    _write_batch(spark, d, "b0", rows[:cut], FUNNEL_IN_DDL)
    acc: list = []
    got = _run_stream(
        spark, d, FUNNEL_IN_DDL, funnel_stream, "append",
        ckpt=str(tmp_path / "ck"), acc=acc,
    )
    _write_batch(spark, d, "b1", rows[cut:], FUNNEL_IN_DDL)
    got = _run_stream(
        spark, d, FUNNEL_IN_DDL, funnel_stream, "append",
        ckpt=str(tmp_path / "ck"), acc=acc,
    )
    streamed = {r.user_id: (r.t_view, r.t_click, r.t_buy) for r in got}

    # batch twin, replicated step for step
    window = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
    ev_ts = table(spark, "/root/testdata/sf0.001", "events")
    v = (
        ev_ts.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev_ts.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + window))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"), F.first("t_view").alias("t_view"))
    )
    p = (
        ev_ts.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + window))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("t_buy"),
            F.first("t_view").alias("t_view"),
            F.first("t_click").alias("t_click"),
        )
    )
    batch = {
        r.user_id: (
            int(r.t_view.timestamp() * 1_000_000),
            int(r.t_click.timestamp() * 1_000_000),
            int(r.t_buy.timestamp() * 1_000_000),
        )
        for r in p.collect()
    }
    assert streamed == batch and len(streamed) > 0
