"""Runtime introspection — the Spark analog of the reference's
SIGIO ledger dump (``transport/progress/progress_tracker.go:291-305``:
``kill -io <pid>`` prints the in-flight transaction ledger).

Here the equivalent operational state lives in Structured Streaming's
progress objects (sources' start/end offsets = the WAL resume state,
sink commit info, per-batch row counts) plus our transport ack file.
``dump_state`` snapshots every active query; ``install_signal_dump``
wires it to a signal so an operator can inspect a live job without
stopping it:

    kill -USR1 <driver pid>   →  one JSON document per line on stderr
"""

from __future__ import annotations

import json
import signal
import sys


def query_state(q) -> dict:
    """Operational snapshot of one streaming query (name, liveness,
    last progress, and the recentProgress offsets that say exactly
    where the source will resume)."""
    lp = q.lastProgress or {}
    return {
        "id": str(q.id),
        "name": q.name,
        "is_active": q.isActive,
        "status": q.status,
        "last_batch_id": lp.get("batchId"),
        "num_input_rows": lp.get("numInputRows"),
        "sources": [
            {
                "description": s.get("description"),
                "start_offset": s.get("startOffset"),
                "end_offset": s.get("endOffset"),
                "num_input_rows": s.get("numInputRows"),
            }
            for s in lp.get("sources", [])
        ],
        "sink": lp.get("sink"),
        "state_operators": lp.get("stateOperators"),
    }


def dump_state(spark, out=None) -> list[dict]:
    """Snapshot every active streaming query on the session. Returns
    the list and, when ``out`` is given, writes one JSON per line
    (the reference dumps its ledger to the log the same way)."""
    states = [query_state(q) for q in spark.streams.active]
    if out is not None:
        for s in states:
            print(json.dumps(s, default=str), file=out)
    return states


def install_signal_dump(spark, signum: int = signal.SIGUSR1, out=None):
    """Register a signal handler that dumps all active-query state —
    ``kill -USR1 <pid>`` on the driver, parity with the reference's
    SIGIO handler. Returns the previous handler (restore to uninstall).
    Driver-only by design: state lives on the driver."""
    target = out if out is not None else sys.stderr

    def _handler(_signum, _frame):
        dump_state(spark, out=target)

    return signal.signal(signum, _handler)
