"""Second tranche of TPC-H-style plans: correlated subqueries,
outer-join aggregates, disjunctive predicates, HAVING-over-global-agg —
the remaining classical shapes the first tranche didn't cover.
All hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, table


def _r(c, n=2):
    return F.round(c, n)


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer + two-level aggregation (TPC-H Q13)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN CAST(l_extendedprice AS DECIMAL(9,2))
                                       * (1 - CAST(l_discount AS DECIMAL(4,2))) END)
                        AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio (TPC-H Q14)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # exact decimal sums -> double ratio (q1 hash discipline)
    rev = F.col("l_extendedprice").cast("decimal(9,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery → per-key pre-aggregate + join
    (the standard decorrelation; Spark's optimizer would do the same
    for the SQL form)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        # exact decimal sum → double, then the /7.0 is the same double
        # op on both engines; round(double_sum/7, 2) was boundary
        # roulette (q1 hash discipline). The qty_cut threshold itself
        # is deterministic: quantities are integral, so the double avg
        # is an exact integer ratio on both engines.
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(9,2)")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides (TPC-H Q19's planner stress)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")

    def arm(brand, smax, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & (q >= qlo)
            & (q <= qhi)
        )

    return j.filter(
        arm("Brand#12", 15, 1, 30) | arm("Brand#23", 25, 10, 40) | arm("Brand#34", 35, 20, 50)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(9,2)")
            * (1 - F.col("l_discount").cast("decimal(4,2)"))
        )
        .cast("double")
        .alias("revenue")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(9,2))
                 * CAST(l_quantity AS DECIMAL(4,2))) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'GERMANY'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS val FROM v
    WHERE CAST(val AS DOUBLE) > CAST((SELECT sum(val) FROM v) AS DOUBLE) * 0.001
    ORDER BY val DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING against a global aggregate (TPC-H Q11): the global sum is
    a 1-row broadcast cross join, not a driver collect."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "GERMANY")
    german = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    # exact decimal per-part sums; the 0.1% cut compares doubles that
    # are identical on both engines (exact sum -> one double cast)
    v = (
        li.join(F.broadcast(german), li.l_suppkey == german.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(9,2)")
                * F.col("l_quantity").cast("decimal(4,2)")
            ).alias("val")
        )
    )
    threshold = v.agg((F.sum("val").cast("double") * 0.001).alias("cut"))
    return (
        v.crossJoin(F.broadcast(threshold))
        .filter(F.col("val").cast("double") > F.col("cut"))
        .select("l_partkey", F.col("val").cast("double").alias("val"))
        .orderBy(F.desc("val"), "l_partkey")
    )


@register(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.0)
    SELECT substr(c_name, 10, 1) AS cgroup, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1 ORDER BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join + scalar-subquery filter (TPC-H Q22 shape, adapted to
    our schema: group by a name digit instead of phone prefix)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    # threshold = exact-decimal sum as double / count: bit-identical on
    # both engines, so boundary customers filter identically (a plain
    # double avg's accumulation order differs per engine)
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(9,2)")).cast("double") / F.count("*")).alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("cgroup"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(9,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cgroup")
    )


@register(
    "approx_aggregates",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
             <= 0.05 * count(DISTINCT l_partkey) AS parts_ok,
           abs(approx_quantile(l_extendedprice, 0.5)
               - quantile_cont(l_extendedprice, 0.5))
             <= 0.05 * quantile_cont(l_extendedprice, 0.5) AS median_ok,
           abs(approx_quantile(l_extendedprice, 0.99)
               - quantile_cont(l_extendedprice, 0.99))
             <= 0.05 * quantile_cont(l_extendedprice, 0.99) AS p99_ok
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, quantile sketch) — the
    scale path where exact distinct/percentile would shuffle every
    value. Raw sketch outputs are engine-specific, so the
    hash-matchable contract is a BOUNDS CHECK computed on each engine
    against its own exact aggregate: |approx - exact| <= 5% * exact.
    Every row is (exact_parts, true, true, true) on both engines when
    the sketches honor their error budgets — a real correctness gate
    on the approximation, not just a smoke test.

    Two aggregation legs, deliberately (r12, sweep-outlier fix): a
    single agg mixing countDistinct with the percentile sketches makes
    the distinct-agg rewrite's Expand REPLICATE every input row
    through the sketch updates — measured 15.5 s at sf0.01 (21x the
    sweep median). The distinct leg (countDistinct + HLL — both over
    l_partkey, Expand cost is two int columns) and the percentile leg
    (KLL sketches at accuracy 1,000 — rank error 0.1%, far inside the
    5% value tolerance; 10,000 bought nothing but update cost) each
    aggregate to |l_returnflag| = 4 rows, then broadcast-join."""
    li = table(spark, sf_dir, "lineitem")
    tol = 0.05
    def ok(approx, exact):
        return (F.abs(approx - exact) <= tol * exact)
    distinct_leg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("ap"),
    )
    pct_leg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1_000).alias("am"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("em"),
        F.percentile_approx("l_extendedprice", 0.99, 1_000).alias("a99"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("e99"),
    )
    return (
        distinct_leg.join(F.broadcast(pct_leg), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            ok(F.col("ap"), F.col("exact_parts")).alias("parts_ok"),
            ok(F.col("am"), F.col("em")).alias("median_ok"),
            ok(F.col("a99"), F.col("e99")).alias("p99_ok"),
        )
        .orderBy("l_returnflag")
    )
