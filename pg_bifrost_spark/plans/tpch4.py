"""Fourth tranche: the remaining TPC-H query shapes the schema can
express — EXISTS / NOT-EXISTS correlation (Q4, Q21), nested-subquery
semi-joins (Q20), NOT-IN anti-join + distinct counting (Q16),
market-share ratio over an 8-table join (Q8), profit rollup (Q9),
conditional two-way counts (Q12), and a decorrelated scalar max (Q15).

The test schema has no partsupp table and no commit/receipt dates, so
Q9/Q16/Q20 derive supplier-part relationships from lineitem and
Q4/Q21 use ``l_shipdate > o_orderdate`` as the lateness predicate —
the operator shapes (what these queries exist to pin) are unchanged.
Reference parity: these cover the reference's correlated-subquery
plan nodes the earlier tranches didn't reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_cnt FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1 ORDER BY 1
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS with a cross-table inequality — a left-semi
    join whose condition spans both sides (late-shipment proxy for
    commit<receipt). Semi-join keeps orders deduplicated without a
    distinct."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_cnt"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(9,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY 1 ORDER BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share inside a region — the widest
    join in the suite (8 tables, nation twice). Every dimension is
    broadcast; the only shuffle left is lineitem⋈orders + the final
    7-row aggregate."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            # exact decimal volume: the share is a ratio of two EXACT
            # sums cast to double, bit-identical across engines —
            # round(double_sum/double_sum, 4) was boundary roulette
            # (q1 hash discipline)
            (
                F.col("l_extendedprice").cast("decimal(9,2)")
                * (1 - F.col("l_discount").cast("decimal(4,2)"))
            ).alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
            F.lit(0).cast("decimal(4,2)")
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (share.cast("double") / F.sum("volume").cast("double")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT sn.n_name AS supp_nation, year(o_orderdate) AS o_year,
           CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * (1 - CAST(l_discount AS DECIMAL(12,2)))
                         - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                                * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))
                           * CAST(0.5 AS DECIMAL(2,1))
                         AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS profit
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation and year for a part family
    (supply cost proxied by 0.5×retail price — no partsupp table; the
    revenue-minus-cost expression shape is what matters). Money math is
    done in DECIMAL: prices are a 2dp grid, so double group-sums land
    EXACTLY on half-cents and any float round() is a coin flip between
    engines; exact decimal sums (per-row products have scale ≤5, exact
    in (18,6)) are bit-identical instead.

    Precision discipline (round-2 fix): every product is TWO-operand
    with tight input types so no intermediate exceeds decimal(38,_) —
    a three-operand (18,2)³ chain hits Spark's 38-digit cap and
    allowPrecisionLoss silently rounds where DuckDB stays exact.
    (12,2)×(13,2)→(26,4); ((12,2)×(12,2)→(25,4))×(2,1)→(28,5);
    difference (29,5) — all lossless.

    Output discipline (round-3 fix): the FINAL column is the exact
    decimal sum cast once to DOUBLE on both engines. Emitting Decimal
    directly hash-fails whenever the scale exceeds the value's natural
    precision (per-row profit scale ≤5, output scale 6 ⇒ a trailing
    zero on every row): a comparator that surfaces one side as float
    sees '123.45' vs Decimal '123.450000'. Exact-decimal-sum → one
    correctly-rounded double conversion is bit-identical across
    engines; the internal math stays exact."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sn = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    d = lambda c: c.cast("decimal(12,2)")  # noqa: E731
    rev = d(F.col("l_extendedprice")) * (1 - d(F.col("l_discount")))
    cost = (d(F.col("p_retailprice")) * d(F.col("l_quantity"))).cast(
        "decimal(25,4)"
    ) * F.lit(0.5).cast("decimal(2,1)")
    profit = (rev - cost).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy("supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("decimal(38,6)").cast("double").alias("profit"))
        .orderBy("supp_nation", F.col("o_year").desc())
    )


@register(
    "q12_priority_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_cnt,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_cnt
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-way conditional counts (CASE inside SUM)
    after a fact-fact join. The shipdate filter is pushed to the
    lineitem scan before the join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_cnt"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_cnt"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1)
    SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — the view +
    scalar-max correlation, decorrelated as agg → broadcast scalar →
    filter. (Both engines compare their OWN max, so double summation
    order can't flip the selected supplier.)"""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    supp = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev.total_rev == best.best_rev)
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM ps JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
    GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, 1, 2, 3 LIMIT 20
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute,
    minus a supplier blacklist. partsupp is derived as DISTINCT
    (l_partkey, l_suppkey); the NOT IN is a broadcast left-anti join
    (null-safe here: s_suppkey is never null)."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 7 == 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@register(
    "q20_excess_shippers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3' AND s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%widget%' AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
    ORDER BY s_suppkey
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over an aggregated-with-HAVING subquery —
    a semi-join against a grouped relation. The inner aggregate is tiny
    (one row per supplier) so it broadcasts into the semi-join."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= _ts("1996-01-01"))
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > o_orderdate)
    GROUP BY 1 ORDER BY numwait DESC, 1 LIMIT 25
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the sole-late-supplier double correlation
    (EXISTS other supplier + NOT EXISTS other LATE supplier),
    decorrelated as ONE per-order aggregate: an order qualifies when it
    has ≥2 distinct suppliers and exactly 1 distinct late supplier;
    numwait counts that supplier's late lines. One pass over lineitem
    instead of the naive triple self-join."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.col("o_orderdate")
    per_order = j.groupBy("o_orderkey").agg(
        F.count_distinct("l_suppkey").alias("nsupp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("nlate_supp"),
        F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"),
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        per_order.filter((F.col("nsupp") >= 2) & (F.col("nlate_supp") == 1))
        .groupBy("late_supp")
        .agg(F.sum("late_lines").alias("numwait"))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
