"""Per-query performance regression gate — the Spark analog of the
reference's CI perf gate (``itests/common.bash:255-287``, which fails
on >50% CPU growth): every headline query must stay within 1.5× its
recorded round-1 wall time at sf0.1 (BENCH_r01.json), plus a small
absolute floor so sub-second queries don't flake on scheduler noise.

A plan regression (lost broadcast, dropped pushdown, new shuffle)
shows up as a 2-10× jump — far above the gate — while run-to-run
noise under a shared local[32] session stays inside it. Set
SPARK_GRAFT_SKIP_PERF=1 to skip (e.g. when profiling something else).
"""

from __future__ import annotations

import json
import os
import time

import pytest

import pg_bifrost_spark.plans as plans

plans.load_all()

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "..", "BENCH_r01.json")
SF_DIR = "/root/testdata/sf0.1"

RATIO = 1.5
ABS_FLOOR_S = 1.5  # absorbs fixed scheduling/codegen jitter on tiny queries


def _baseline() -> dict[str, float]:
    with open(BASELINE_PATH) as f:
        return json.load(f)["parsed"]["queries"]


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_PERF") == "1", reason="perf gate disabled"
)
def test_headline_queries_within_budget(spark):
    base = _baseline()
    # warm codegen + the full Python-worker pool once so the first
    # measured query isn't billed daemon forks (mirrors bench.py)
    plans.QUERIES["q6_forecast_revenue"](spark, "/root/testdata/sf0.001").collect()
    plans.QUERIES["cdc_lineitem_roundtrip"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    failures = []
    timings = {}
    for name, prev in base.items():
        if name not in plans.QUERIES:
            continue
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        budget = max(RATIO * prev, prev + ABS_FLOOR_S)
        if dt > budget:
            failures.append(f"{name}: {dt:.2f}s > budget {budget:.2f}s (r01 {prev:.2f}s)")
    assert not failures, "perf regressions:\n" + "\n".join(failures) + f"\nall: {timings}"
