"""embedding_drift_report non-vacuity: the gate hash-compares Spark vs
DuckDB, but BOTH sides share the planted offset — if a fixture
regeneration left no vector with vec_id % DRIFT_MOD == 0 on the
drifted label, both engines would agree on an all-zeros report and
the gate row would test nothing. Pin that the plant actually fires
and stays label-isolated."""

from __future__ import annotations

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.profiling import DRIFT_LABEL

plans.load_all()


def test_planted_drift_fires_and_is_isolated(spark):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = {
            r.label: r.l1_shift_micro
            for r in plans.QUERIES["embedding_drift_report"](spark, sf).collect()
        }
        assert rows[DRIFT_LABEL] > 1_000_000, (sf, rows[DRIFT_LABEL])
        assert all(v == 0 for lbl, v in rows.items() if lbl != DRIFT_LABEL), rows
