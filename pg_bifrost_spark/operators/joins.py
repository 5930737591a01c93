"""Join-strategy operators: bucketed co-located joins and skew
salting — the two techniques that keep 100 TB fact-fact joins off the
network (SURVEY.md steering: bucketing for co-located joins, salting
for hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table


def write_bucketed(df: DataFrame, name: str, key: str, buckets: int) -> None:
    """Persist as a bucketed table: later equi-joins/aggs on ``key``
    between tables bucketed the same way need NO shuffle (both sides
    arrive pre-partitioned). This is the batch analog of the
    reference's hash routing (K2) made durable."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the fact side salts its key into ``salts``
    subkeys; the dim side replicates each row ``salts`` times. A hot
    key's rows then spread over ``salts`` tasks instead of one
    straggler. (AQE's skew-join does this adaptively for sort-merge
    joins; explicit salting is the portable form and also covers
    aggregations.) Results are identical to a plain join.

    The dim side's key and salt are aliased to distinct names and the
    join written as explicit equalities: same-named columns on both
    sides of an equi-join make Catalyst emit a "trivially true equals
    predicate" warning when attribute resolution collapses them."""
    salted_fact = fact.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)))
    replicated_dim = (
        dim.withColumnRenamed(key, "_dim_key")
        .withColumn("_dim_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
        .withColumn("_dim_salt", F.col("_dim_salt").cast("bigint"))
    )
    return (
        salted_fact.join(
            replicated_dim,
            (F.col(key) == F.col("_dim_key")) & (F.col("_salt") == F.col("_dim_salt")),
        )
        .drop("_salt", "_dim_salt", "_dim_key")
    )


@register(
    "salted_skew_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim aggregation — hash-identical to the plain join
    (salting only changes placement, never results)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        "k",
        salts=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("o_orderpriority")
    )
