"""Third tranche: min-cost-supplier correlation (Q2 shape), RANGE
window frames, exact percentiles, and edit-distance fuzzy matching —
the remaining classical expression shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import register, table


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(unit_cost) AS best_cost FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey, s_name
    FROM costs c JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
                 JOIN supplier ON s_suppkey = c.l_suppkey
    WHERE c.l_partkey <= 200
    ORDER BY c.l_partkey, s_name
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-cost supplier via a correlated
    min — decorrelated as agg + self-join on the min value. The cost
    itself is not emitted: a rounded quotient sits on round-half
    boundaries that Spark and DuckDB resolve differently; the
    min-selection semantics are what this query pins."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_partkey") <= 200)
    )
    supp = table(spark, sf_dir, "supplier")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    return (
        costs.join(best, "l_partkey")
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(supp), costs.l_suppkey == supp.s_suppkey)
        .select("l_partkey", "s_name")
        .orderBy("l_partkey", "s_name")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'FRANCE' AND sn.n_name = 'GERMANY')
       OR (cn.n_name = 'GERMANY' AND sn.n_name = 'FRANCE')
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — a disjunctive
    cross-dimension predicate over two roles of the same dimension."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
    )
    pair = (
        ((F.col("cust_nation") == "FRANCE") & (F.col("supp_nation") == "GERMANY"))
        | ((F.col("cust_nation") == "GERMANY") & (F.col("supp_nation") == "FRANCE"))
    )
    return (
        j.filter(pair)
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(9,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("cust_nation", "supp_nation")
    )


@register(
    "range_frame_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2)
             AS trailing_30d_spend
    FROM orders
    ORDER BY o_orderkey
    """,
)
def range_frame_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event time: per customer, trailing
    30-day spend (value-based frame, not row-based)."""
    orders = table(spark, sf_dir, "orders")
    # RANGE frames need a numeric order key in Spark: seconds since epoch
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_seconds(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-30 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_spend"),
    ).orderBy("o_orderkey")


@register(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS median_price,
           round(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p95_price,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS q1_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles — the non-sketch path for when
    correctness beats memory (grouped, so each group's sort is local
    to its shuffle partition)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
            F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "fuzzy_name_match",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE a.p_partkey <= 150 AND b.p_partkey <= 150
      AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY part_a, part_b
    """,
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution primitive).
    Bounded all-pairs here; the scale path blocks on a cheap key
    first (first-k chars / phonetic bucket) exactly like the shingle
    inverted index."""
    part = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 150).select(
        "p_partkey", "p_name"
    )
    a, b = part.alias("a"), part.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(b, F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 3)
        .orderBy("part_a", "part_b")
    )
