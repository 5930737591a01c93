"""Count Spark JOBS (driver-paced scheduling round-trips) per registry
query — the nation-replay family's cost is fixed stage-chain latency,
not data (VERDICT r12 ask #6), so the metric that matters for them is
jobs-per-execution, measured via the status tracker's job-id watermark.

Usage: python tools/jobcount.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_bifrost_spark import plans  # noqa: E402
from pg_bifrost_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans.load_all()
    spark = get_spark(app_name="jobcount")
    tracker = spark.sparkContext.statusTracker()

    def run(name: str) -> tuple[int, float]:
        plans.release_caches()
        spark.catalog.clearCache()
        before = set(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        after = set(tracker.getJobIdsForGroup(None))
        return len(after - before), dt

    for name in names:
        run(name)  # warm (codegen/JIT), uncounted
        for i in range(2):
            n_jobs, dt = run(name)
            print(f"{name}: jobs={n_jobs} wall={dt}s (exec {i + 1})")
    spark.stop()


if __name__ == "__main__":
    main()
