"""Distribution window functions and GROUPING SETS — the last
classical-SQL surfaces not covered by the earlier tranches (§2.6-2.8
listed ranking/running/lead-lag; these add the distribution family and
multi-level grouping beyond rollup/cube).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import register, table


@register(
    "window_distribution_suite",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           nth_value(o_orderkey, 3) OVER w AS third_key,
           first_value(o_orderkey)  OVER w AS first_key
    FROM orders WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def window_distribution_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: ntile / percent_rank / cume_dist /
    nth_value / first_value over one shared window. The window ORDER BY
    includes o_orderkey as a tiebreak — totalprice ties would otherwise
    make ntile assignment engine-dependent. One shuffle on the
    partition key serves all five functions (Spark reuses the sort)."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
        F.first("o_orderkey").over(w).alias("first_key"),
    ).orderBy("o_orderkey")


@register(
    "grouping_sets_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS order_cnt,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
)
def grouping_sets_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not a rollup prefix — the ((a,b),(a),())
    lattice here happens to be one, but the API is the general one) with
    GROUPING() disambiguating real NULLs from superaggregate rows.
    Spark expands the sets into one Expand + single aggregate — one
    pass over orders for all three levels."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )
