"""M2 streaming core: the CDC graph under Structured Streaming.

One streaming query replaces the reference's whole runner
(``app/runner.go:255-306``): source → stateless pipeline →
foreachBatch sink, with ``checkpointLocation`` playing the progress
tracker (offsets/N before batch N runs, commits/N after sinks
succeed — the contiguous-prefix invariant X12 for free).

Strict-ordering mode (reference: partition routing, K2 +
``batcher.go:391-404``): repartition by partition_key then
sortWithinPartitions(wal_start) inside foreachBatch — per-key total
order across workers, like ``BATCHER_ROUTING_METHOD=partition``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..cdc.pipeline import PipelineConfig, run_pipeline_assembled
from ..sources import pgcdc


def read_cdc_stream(spark: SparkSession, source=None, **options: str) -> DataFrame:
    """spark.readStream over the pgcdc source (option wal_dir=<replay
    dir> or dsn=<postgres dsn>). ``source`` is the DataSource class to
    drive (default ``pgcdc.PgCdcDataSource``) — threading it through
    here keeps ``drain_cdc_query``'s admission-contract check bound to
    the source the query actually reads."""
    source = source or pgcdc.PgCdcDataSource
    spark.dataSource.register(source)
    reader = spark.readStream.format(source.name())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def strict_order(df: DataFrame, workers: int) -> DataFrame:
    """Pin each partition_key to one task and restore WAL order within
    it (K2 'partition' routing; ordering guarantee of
    ``test_strict_order_shared``)."""
    return df.repartition(workers, F.col("partition_key")).sortWithinPartitions("wal_start")


def start_cdc_query(
    spark: SparkSession,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    trigger_seconds: float | None = None,
    workers: int | None = None,
    source_options: dict | None = None,
    source=None,
) -> StreamingQuery:
    """Wire source → pipeline → foreachBatch(sink) and start.

    ``workers`` enables strict-order partition routing inside each
    micro-batch before the sink sees it (None = Spark's own
    partitioning, the reference's round-robin analog)."""
    stream = read_cdc_stream(spark, source=source, **(source_options or {}))

    def run_sink(batch_df: DataFrame, epoch_id: int) -> None:
        # The parse stage's fast/slow split (``_parse_assembled``)
        # references its input twice; on a streaming plan each
        # reference re-executes the Python source's read(). Applying
        # the (stateless) pipeline inside foreachBatch over a
        # PERSISTED raw batch keeps the source at exactly one
        # materialization per micro-batch — measured 2× input rows
        # without it. Semantics are unchanged: every pipeline stage is
        # per-row, so batch-applying it per micro-batch is the same
        # computation the pre-sink streaming plan declared.
        batch_df.persist()
        try:
            out = run_pipeline_assembled(batch_df, cfg)
            out = strict_order(out, workers) if workers else out
            sink(out, epoch_id)
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(run_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_cdc_query(
    spark: SparkSession,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    workers: int | None = None,
    source_options: dict | None = None,
    max_rounds: int = 10_000,
    source=None,
) -> int:
    """Process ALL currently-available WAL and stop.

    The Python data source does not support Trigger.AvailableNow —
    Spark falls back to ONE bounded micro-batch per query run (with a
    warning that the fallback "may not guarantee processing new data
    if there is an uncommitted batch"), so with a small client buffer
    a single run under-drains. This loop runs single-batch queries
    against the same checkpoint until a run makes no progress (the
    backpressure bound still applies per batch). Returns the number of
    micro-batches executed. The warned-about uncommitted-batch edge is
    pinned by ``tests/test_streaming.py::
    test_drain_recovers_uncommitted_batch``: a failed sink leaves
    offsets/N without commits/N, and the next drain re-runs that batch
    (readBetweenOffsets determinism) then keeps draining.

    FETCH-LIMIT CONTRACT (ADVICE r5, runtime-enforced since r7): the
    under-cap early exit assumes the source admits exactly
    ``min(backlog, cap)`` MESSAGES per batch. The source class must
    DECLARE that (``ADMISSION_SEMANTICS == "messages"``) and OWN the
    cap parsing (``admission_cap(options)``) — both checked below, so
    a byte- or file-admitting source fails loudly here instead of
    silently under-draining, and the stop condition can never drift
    from the reader's own option parsing."""
    source = source or pgcdc.PgCdcDataSource
    sem = getattr(source, "ADMISSION_SEMANTICS", None)
    if sem != "messages":
        raise RuntimeError(
            f"drain_cdc_query requires a message-count-admitting source; "
            f"{source.__name__} declares ADMISSION_SEMANTICS={sem!r}. "
            "An under-cap batch from a bytes/files-admitting source does "
            "not imply an empty backlog — drive it with start_cdc_query "
            "and an explicit stop condition instead."
        )
    # a run that comes in UNDER the admission cap has by definition
    # consumed everything the source could fetch at that moment — the
    # empty confirm round would only re-pay query startup (~4 s
    # measured); data appearing later is the next drain's business
    cap = source.admission_cap(source_options or {})
    rounds = 0
    for _ in range(max_rounds):
        truncs_before = pgcdc.truncation_events()
        q = start_cdc_query(
            spark, sink, checkpoint_dir, cfg=cfg, workers=workers,
            source_options=source_options, source=source,
        )
        q.awaitTermination()
        rounds += 1
        progress = q.lastProgress
        if not progress or progress["numInputRows"] < cap:
            # under-cap proves the backlog empty ONLY if the batch was
            # not TRUNCATED (live-transport fetch budget, or a partial
            # batch committed when reconnects ran out — code-review
            # r9): a truncated round proves nothing, so keep draining;
            # a still-down server re-raises in the next round instead
            # of being silently swallowed with backlog remaining.
            # The signal channel is the OFFSET (ADVICE r9): the reader
            # runs inside PySpark's data-source worker process, so a
            # module counter bumped there is invisible here — the
            # reader folds the transport's truncation count into the
            # offset's ``trunc`` field, and this batch truncated iff
            # end.trunc > start.trunc in lastProgress. The module
            # counter is kept as a same-process fallback (tests,
            # direct-transport drains).
            if (
                _progress_trunc_delta(progress) == 0
                and pgcdc.truncation_events() == truncs_before
            ):
                break
    return rounds


def _progress_trunc_delta(progress: dict | None) -> int:
    """Truncated-fetch count of ONE batch, read from its progress
    entry's start/end offsets (the reader stamps a cumulative count
    into the offset dict — the only channel that crosses the
    data-source worker process boundary)."""
    import ast as _ast
    import json as _json

    def _trunc(raw) -> int:
        if raw is None:
            return 0
        if isinstance(raw, str):
            # Spark renders the Python source's offset as the dict's
            # REPR (single quotes; "None" for the initial offset), not
            # JSON — accept both forms
            try:
                raw = _json.loads(raw)
            except ValueError:
                try:
                    raw = _ast.literal_eval(raw)
                except (ValueError, SyntaxError):
                    return 0
        if isinstance(raw, dict):
            try:
                return int(raw.get("trunc") or 0)
            except (TypeError, ValueError):
                return 0
        return 0

    sources = (progress or {}).get("sources") or []
    if not sources:
        return 0
    src = sources[0]
    return max(0, _trunc(src.get("endOffset")) - _trunc(src.get("startOffset")))
