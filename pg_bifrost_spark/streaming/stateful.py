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


# ---------------------------------------------------------------------------
# streaming conversion funnel (the batch twin is plans/events.py::
# events_funnel) — per-user state machine over applyInPandasWithState
# ---------------------------------------------------------------------------
FUNNEL_IN_DDL = "user_id bigint, event_type string, t_us bigint"
FUNNEL_OUT_DDL = "user_id bigint, t_view bigint, t_click bigint, t_buy bigint"
FUNNEL_STATE_DDL = "stage int, t_view bigint, t_click bigint"
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # mirrors FUNNEL_WINDOW_HOURS


def _funnel_fn(
    key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """view → click(≤24 h after the view) → purchase(≤24 h after the
    click), first-qualifying-event-wins at each step — identical
    semantics to the batch twin when each user's events arrive in
    event-time order across micro-batches (the CDC source preserves
    per-key order; the test feeds chronological batches). A completed
    user keeps stage=3 state (never re-emits) instead of evicting —
    eviction would let later events restart the machine and
    double-count the conversion."""
    stage, t_view, t_click = state.get if state.exists else (0, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("t_us")
    out = None
    for _, r in rows.iterrows():
        et, t = r["event_type"], int(r["t_us"])
        if stage == 0 and et == "view":
            stage, t_view = 1, t
        elif stage == 1 and et == "click" and t_view < t <= t_view + FUNNEL_WINDOW_US:
            stage, t_click = 2, t
        elif stage == 2 and et == "purchase" and t_click < t <= t_click + FUNNEL_WINDOW_US:
            stage = 3
            out = pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "t_view": [t_view],
                    "t_click": [t_click],
                    "t_buy": [t],
                }
            )
    state.update((stage, t_view, t_click))
    if out is not None:
        yield out


def funnel_stream(events):
    """events: streaming DF with FUNNEL_IN_DDL columns. Emits one row
    per user at the moment they complete the funnel."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_OUT_DDL,
        stateStructType=FUNNEL_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
