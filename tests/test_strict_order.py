"""Strict-ordering mode (K2 'partition' routing): per-partition-key
total WAL order within each worker partition — the guarantee behind
the reference's SORT=false itests (test_staggered,
test_strict_order_shared)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, raw_lines_df, txn
from pg_bifrost_spark.cdc.pipeline import PipelineConfig, data_messages, run_pipeline
from pg_bifrost_spark.streaming.core import strict_order


def test_strict_order_per_key_within_partition(spark):
    # 3 tables interleaved, partitioned by tablename, routed to 2 workers
    ops = []
    for i in range(30):
        t = ["public.a", "public.b", "public.c"][i % 3]
        ops.extend(txn(1000 + i, dml_line(t, "INSERT", [("id", "integer", i)])))
    out = data_messages(
        run_pipeline(
            raw_lines_df(spark, ops_to_raw_lines(ops)),
            PipelineConfig(partition_method="tablename"),
        )
    )
    routed = strict_order(out, workers=2)

    def per_partition(it):
        rows = list(it)
        keys = {}
        ordered = True
        for r in rows:
            prev = keys.get(r["partition_key"], -1)
            if r["wal_start"] < prev:
                ordered = False
            keys[r["partition_key"]] = r["wal_start"]
        yield {"n": len(rows), "keys": len(keys), "ordered": ordered}

    parts = routed.rdd.mapPartitions(per_partition).collect()
    non_empty = [p for p in parts if p["n"] > 0]
    assert len(non_empty) <= 2
    assert all(p["ordered"] for p in non_empty), "WAL order violated within a partition"
    # a given key appears in exactly one partition (co-location)
    key_home = (
        routed.withColumn("pid", F.spark_partition_id())
        .groupBy("partition_key")
        .agg(F.countDistinct("pid").alias("homes"))
    )
    assert all(r.homes == 1 for r in key_home.collect())
