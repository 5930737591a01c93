"""Oracle-verified exercise of the scalar-function surface (SURVEY.md
§2.9) over real data: hex LSN rendering, time formatting, routing keys,
S3 key layout. DuckDB's printf/strftime reproduce each formula
independently, so a hash match proves formula equivalence, not just
self-consistency."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, table
from ..functions.expressions import lsn_hex, rabbit_routing_key, rfc3339_from_ms, s3_object_key


@register(
    "scalar_function_suite",
    oracle="""
    SELECT o_orderkey,
           printf('%X/%X', o_orderkey >> 32, o_orderkey & 4294967295) AS lsn,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS rfc3339,
           'public.orders' || '.' || o_orderstatus AS routing_key,
           'cdc/' || strftime(o_orderdate, '%Y/%m/%d/%H/') ||
             strftime(o_orderdate, '%Y%m%d%H%M%S') || '_' || o_orderkey AS s3_key
    FROM orders WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    # o_orderdate is TIMESTAMP_NTZ; under a UTC session the cast is the
    # identity instant
    ms = (F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 1000).cast("long")
    return orders.select(
        "o_orderkey",
        lsn_hex(F.col("o_orderkey")).alias("lsn"),
        rfc3339_from_ms(ms).alias("rfc3339"),
        rabbit_routing_key(F.lit("public.orders"), F.col("o_orderstatus")).alias("routing_key"),
        s3_object_key("cdc", F.col("o_orderdate"), F.col("o_orderkey")).alias("s3_key"),
    ).orderBy("o_orderkey")


@register(
    "s3_time_partition_layout",
    oracle="""
    SELECT year(o_orderdate) AS year, month(o_orderdate) AS month,
           day(o_orderdate) AS day, hour(o_orderdate) AS hour,
           count(*) AS n
    FROM orders GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
    """,
)
def s3_time_partition_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K5 time-partitioned sink layout as a query: objects per
    (year, month, day, hour) partition directory."""
    orders = table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return (
        orders.groupBy(
            F.year(ts).alias("year"),
            F.month(ts).alias("month"),
            F.dayofmonth(ts).alias("day"),
            F.hour(ts).alias("hour"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("year", "month", "day", "hour")
    )
