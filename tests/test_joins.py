"""Bucketed co-located join (no Exchange in plan) and salted-join
result parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_bifrost_spark.operators.joins import salted_join, write_bucketed
from pg_bifrost_spark.plans import table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        orders = table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "li_b", "l_orderkey", 8)
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", "l_orderkey", 8
        )
        j = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should be shuffle-free"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_salted_join_matches_plain_join(spark):
    li = table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_extendedprice"
    )
    orders = table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    salted = salted_join(li, orders, "k").groupBy("o_orderpriority").count()
    plain = li.join(orders, "k").groupBy("o_orderpriority").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
