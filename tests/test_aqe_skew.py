"""AQE skew-join: the engine's claimed runtime defense for skewed
shuffle joins (PARITY §2.3; salting covers the planned-ahead case,
AQE covers the discovered-at-runtime case). This pins that the
defense actually FIRES on a skewed join under this session's configs —
not just that the conf is set."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # tiny thresholds so the fixture-scale skew qualifies
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        n = 200_000
        # 90% of the big side lands on key 0 — one shuffle partition
        # carries ~90% of the bytes
        big = spark.range(n).select(
            F.when(F.col("id") % 10 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("pad-"), F.col("id").cast("string")).alias("payload"),
        )
        small = spark.range(5000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = big.join(small, "k")
        # collect() drives THIS DataFrame's own query execution, so its
        # executedPlan below is the adaptively-finalized one (count()
        # would build and finalize a different execution)
        rows = j.collect()
        # sanity: 180 001 rows with k=0 (ids not divisible by 10, plus
        # id=0) + 499 rows whose multiple-of-10 key is < 5000
        assert len(rows) == 180_500
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        # AQE's final plan marks the rebalanced join; the skew split
        # must have fired (isSkew=true on the shuffle read)
        assert "skew=true" in final or "isSkew=true" in final, final[:2000]
    finally:
        # conf.get(k, None) returns None for a conf sitting at its
        # DEFINED DEFAULT, so "restore only if previously set" leaks
        # the tiny AQE thresholds into every later test (it broke the
        # z-order layout test's file boundaries) — unset those instead
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
