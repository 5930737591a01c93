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


# ---------------------------------------------------------------------------
# The same ledger on the NEW Spark 4 stateful API
# (transformWithStateInPandas + ValueState) — finer-grained state
# primitives (value/list/map state, TTL, timers) than the legacy
# GroupState; this is the API new custom operators should target.
# NOTE: executing it requires google.protobuf (state wire protocol),
# which this container lacks — code is real, test is env-gated.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - exercised via the streaming test
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LedgerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("ledger", LEDGER_STATE_DDL)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            count, expected, commit_wal = (
                tuple(self.state.get()) if self.state.exists() else (0, -1, 0)
            )
            for pdf in rows:
                for _, row in pdf.iterrows():
                    if row["operation"] == "COMMIT":
                        expected = int(row["expected_msgs"])
                        commit_wal = int(row["wal_start"])
                    elif row["operation"] != "BEGIN":
                        count += 1
            if expected >= 0 and count >= expected:
                self.state.clear()
                yield pd.DataFrame(
                    {
                        "time_based_key": [key[0]],
                        "total_msgs": [count],
                        "commit_wal_start": [commit_wal],
                    }
                )
            else:
                self.state.update((count, expected, commit_wal))

        def close(self) -> None:
            pass

    def txn_ledger_stream_v2(events):
        """``txn_ledger_stream`` on transformWithStateInPandas."""
        return events.groupBy("time_based_key").transformWithStateInPandas(
            LedgerProcessor(),
            outputStructType=LEDGER_OUTPUT_DDL,
            outputMode="Append",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - older pyspark

    def txn_ledger_stream_v2(events):
        raise NotImplementedError("transformWithStateInPandas requires pyspark >= 4.0")


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
