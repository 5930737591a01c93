"""Custom stateful streaming operators via ``applyInPandasWithState``
— the Spark primitive the reference's progress ledger would use if it
were not already subsumed by the checkpoint log (SURVEY.md §1.1).

Two operators:

  * ``txn_ledger_stream`` — a live re-implementation of the progress
    tracker's ledger semantics (``transport/progress/
    progress_tracker.go``): per time_based_key state accumulates
    written-message counts until the COMMIT's expected total arrives,
    then emits a completion row. Group state ~ LedgerEntry; eviction
    on completion ~ ledger delete.
  * ``running_user_totals`` — per-user running counters with
    processing-time timeout (the generic stateful-enrichment shape).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LEDGER_OUTPUT_DDL = "time_based_key string, total_msgs bigint, commit_wal_start bigint"
LEDGER_STATE_DDL = "count bigint, expected bigint, commit_wal bigint"


def _ledger_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-transaction message counts; emit when complete.

    Mirrors Ledger.update (ledger.go:49-139): data messages increment
    ``count``; the COMMIT row fixes ``expected`` (total messages of the
    txn) and the commit LSN. When count == expected the transaction is
    fully durable → emit and evict state (the contiguous-prefix scan
    itself lives in Spark's commit log)."""
    count, expected, commit_wal = (
        state.get if state.exists else (0, -1, 0)
    )
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            if row["operation"] == "COMMIT":
                expected = int(row["expected_msgs"])
                commit_wal = int(row["wal_start"])
            elif row["operation"] not in ("BEGIN",):
                count += 1
    if expected >= 0 and count >= expected:
        state.remove()
        yield pd.DataFrame(
            {
                "time_based_key": [key[0]],
                "total_msgs": [count],
                "commit_wal_start": [commit_wal],
            }
        )
    else:
        state.update((count, expected, commit_wal))


def txn_ledger_stream(events):
    """events: streaming DF with (time_based_key, operation, wal_start,
    expected_msgs). Returns completed-transaction rows."""
    return events.groupBy("time_based_key").applyInPandasWithState(
        _ledger_fn,
        outputStructType=LEDGER_OUTPUT_DDL,
        stateStructType=LEDGER_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOTALS_OUTPUT_DDL = "user_id bigint, n_events bigint, total_value double"
TOTALS_STATE_DDL = "n bigint, total double"


def _totals_fn(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events):
    """Per-user cumulative counters, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=TOTALS_OUTPUT_DDL,
        stateStructType=TOTALS_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
