"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The CDC replay benchmark mirrors the reference's throughput bar
(50 k messages ≤ 180 s, BASELINE.md) — ``cdc_lineitem_roundtrip`` at
sf0.1 pushes ~1.8 M WAL messages (600 k rows × BEGIN/INSERT/COMMIT)
through parse+marshal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg_bifrost_spark import plans  # noqa: E402
from pg_bifrost_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume",
    "topk_per_group",
    "rollup_returns",
    "tumbling_window_stats",
    "sessionize_users",
    "asof_click_to_view",
    "dedup_exact_documents",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "embedding_quantize_int8",
    "text_token_stats",
    "text_quality_score",
    "hypertable_rollup",
    "curation_pipeline",
    "salted_skew_join",
    "q13_customer_distribution",
    "q8_market_share",
    "q21_waiting_supplier",
    "cdc_lineitem_roundtrip",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    plans.load_all()
    spark = get_spark(app_name="pg_bifrost_spark_bench")

    # Warm-up discipline: run EVERY headline query once at sf0.001
    # before timing at the bench SF. First execution of a plan is
    # billed codegen/JIT + first-scan-of-table costs (measured 6-9 s
    # on a 0.5 s steady-state query); the sf0.001 pass absorbs those
    # one-time costs per query so the timed numbers are steady-state.
    # Different data than the bench SF — nothing is result-cached.
    warm_sf = "/root/testdata/sf0.001"
    for name in HEADLINE:
        plans.QUERIES[name](spark, warm_sf).write.format("noop").mode("overwrite").save()
    # the sf0.001 pass only spawns a couple of Python workers (few
    # input partitions); the bench-SF run spawns one PER CORE on first
    # exec and was billed ~4s of daemon fork cost (round-1 note). Spawn
    # the full worker pool up front with a core-count-partition
    # mapInPandas no-op.
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 4, 1, n_workers).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = plans.QUERIES[name]
        t0 = time.perf_counter()
        # noop sink materializes every column of the full plan (count()
        # would let Spark prune the projections)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
