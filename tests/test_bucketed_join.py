"""Bucketed-table co-location: a join of two tables bucketed on the
join key must compile with NO hash Exchange on either side (the
payoff that justifies paying the write-time shuffle once), and with
sortBy, no per-task Sort either."""

from __future__ import annotations

import pytest

from pg_bifrost_spark.sinks.bucketed import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    write_bucketed(li, "li_bkt", "l_orderkey", 8, path=str(base / "li"))
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bkt",
        "l_orderkey",
        8,
        path=str(base / "ord"),
    )
    yield "li_bkt", "ord_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ shape
    try:
        j = read_table(spark, li_t).join(read_table(spark, ord_t), "l_orderkey")
        text = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in text
        assert "Exchange hashpartitioning" not in text  # both sides co-located
        assert "SelectedBucketsCount" in text
        # correctness: same row count as the unbucketed join
        pl = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        po = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        plain = pl.join(po, pl["l_orderkey"] == po["o_orderkey"]).count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    # a bare filter has no partitioning requirement, so AQE's
    # auto-bucketed-scan would demote the scan to a plain one and skip
    # bucket pruning; disabling it keeps the bucketed layout (what a
    # point-lookup-heavy consumer would run with)
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = read_table(spark, li_t).filter("l_orderkey = 1")
        text = df._jdf.queryExecution().executedPlan().toString()
        # equality on the bucket key scans 1 of the 8 buckets
        assert "SelectedBucketsCount: 1 out of 8" in text
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)


def test_groupby_on_bucket_key_skips_exchange(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = read_table(spark, li_t).groupBy("l_orderkey").count()
    text = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in text
