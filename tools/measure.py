"""Ad-hoc per-query measurement with bench.py's exact discipline:
median-of-N noop-sink executions, cache-cleaned before every exec,
all queries interleaved round-robin in ONE session so host drift hits
every arm equally (the fold-vs-slice A/B precedent). A control query
(q6_forecast_revenue by default) can be added to normalize across
sessions.

Usage:
  python tools/measure.py q1 q2 ...            # median of 3, interleaved
  SPARK_GRAFT_MEASURE_EXECS=5 python tools/measure.py --control q1
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_bifrost_spark import plans  # noqa: E402
from pg_bifrost_spark.session import get_spark  # noqa: E402

CONTROL = "q6_forecast_revenue"


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--control" in sys.argv and CONTROL not in names:
        names = [CONTROL, *names]
    n_execs = int(os.environ.get("SPARK_GRAFT_MEASURE_EXECS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans.load_all()
    spark = get_spark(app_name="measure")
    times: dict[str, list[float]] = {n: [] for n in names}
    # warm-up exec per query (session/JIT warmth), not recorded
    for name in names:
        _run(spark, name, sf_dir)
    for i in range(n_execs):
        for name in names:  # interleaved round-robin
            times[name].append(_run(spark, name, sf_dir))
    out = {
        n: {
            "median": round(statistics.median(ts), 3),
            "all": ts,
        }
        for n, ts in times.items()
    }
    print(json.dumps({"sf_dir": sf_dir, "execs": n_execs, "queries": out}, indent=1))
    spark.stop()


def _run(spark, name: str, sf_dir: str) -> float:
    plans.release_caches()
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"measure: {name}")
    t0 = time.perf_counter()
    plans.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return dt


if __name__ == "__main__":
    main()
