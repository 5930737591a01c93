"""Data-profiling operators: the diagnostics you run BEFORE tuning a
100 TB job — join-key skew reports and corpus shape histograms.

Both are single map-side-combined groupBys; the "top heavy hitters"
cut happens after aggregation on the already-tiny key-frequency table,
so the full corpus is scanned exactly once with no wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table, tracked_cache

SKEW_TOP_K = 10
HIST_BUCKET_TOKENS = 16


@register(
    "join_skew_report",
    oracle=f"""
    WITH freq AS (
      SELECT l_orderkey AS key, count(*) AS n FROM lineitem GROUP BY 1
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_n
      FROM freq
    )
    SELECT f.key, CAST(f.n AS BIGINT) AS n,
           f.n / (s.n_rows / s.n_keys) AS skew_factor
    FROM freq f CROSS JOIN stats s
    ORDER BY f.n DESC, f.key LIMIT {SKEW_TOP_K}
    """,
)
def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{SKEW_TOP_K} heaviest join keys on lineitem.l_orderkey with
    each key's skew factor (its row count over the mean rows-per-key).
    This is the first diagnostic before salting or AQE-skew-tuning a
    big join: a skew_factor in the hundreds means one task drags the
    stage. One scan, one groupBy; the global stats join back as a
    broadcast single row. skew_factor is a ratio of exact integers
    (bit-identical across engines — no rounding)."""
    li = table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_orderkey").alias("key")).agg(F.count("*").alias("n"))
    stats = freq.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "key",
            F.col("n").cast("bigint").alias("n"),
            (F.col("n") / (F.col("n_rows") / F.col("n_keys"))).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(SKEW_TOP_K)
    )


@register(
    "corpus_length_histogram",
    oracle=f"""
    SELECT CAST(len(string_split_regex(lower(trim(text)), '\\s+'))
                // {HIST_BUCKET_TOKENS} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
             AS min_tokens,
           CAST(max(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
             AS max_tokens
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram in {HIST_BUCKET_TOKENS}-token buckets
    — the corpus-shape overview (truncation loss, short-doc mass) a
    mixture designer reads before setting packing lengths. Fixed-width
    integer buckets: deterministic, partial-agg friendly, no
    percentile state."""
    docs = table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return (
        docs.select(
            ntok.alias("nt"),
            (ntok / F.lit(HIST_BUCKET_TOKENS)).cast("bigint").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("nt").cast("bigint").alias("min_tokens"),
            F.max("nt").cast("bigint").alias("max_tokens"),
        )
        .orderBy("bucket")
    )


ZSCORE_CUT = 3.0


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2)))
                  AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ), stats AS (
      SELECT event_type, n,
             s1 / n AS mean,
             sqrt(greatest((s2 - s1 * s1 / n) / n, 0)) AS std
      FROM s
    )
    SELECT e.event_type, any_value(st.n) AS n,
           any_value(st.mean) AS mean, any_value(st.std) AS std,
           CAST(sum(CASE WHEN st.std > 0
                          AND abs((e.value - st.mean) / st.std) > {ZSCORE_CUT}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM events e JOIN stats st USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly counts per event type with DETERMINISTIC
    variance: a naive stddev over doubles is accumulation-order
    dependent (different per engine/partitioning), so mean and
    population variance are derived from EXACT decimal sums of value
    and value² — (9,2)² products are exact (19,4) decimals — cast once
    to double, then the identical (s2 - s1²/n)/n expression runs on
    both engines. Two passes over events expressed as one groupBy plus
    a broadcast join of the per-type stats (tiny) back onto the rows —
    at 100 TB the stats table is |event_types| rows, the re-scan
    streams.

    Degenerate-variance guard (identical on both engines): variance is
    clamped to ≥ 0 before sqrt (double cancellation can go slightly
    negative — sqrt(neg) is NaN in Spark but an error in DuckDB), and
    anomalies count only WHEN std > 0. Without the guard a
    zero-variance event type divides by zero, which Spark's non-ANSI
    division turns into NULL (counts 0) while DuckDB's IEEE division
    yields NaN/inf (NaN > cut under DuckDB total ordering counts ALL
    rows) — a fixture-dependent cross-engine hash mismatch."""
    ev = table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(9,2)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(val).cast("double").alias("s1"),
        F.sum(val * val).cast("double").alias("s2"),
    )
    stats = s.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n"),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    z = F.abs((F.col("value") - F.col("mean")) / F.col("std"))
    is_anomaly = (F.col("std") > 0) & (z > ZSCORE_CUT)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value(F.col("n")).alias("n"),
            F.any_value(F.col("mean")).alias("mean"),
            F.any_value(F.col("std")).alias("std"),
            F.sum(F.when(is_anomaly, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# embedding drift report (snapshot-vs-snapshot distribution shift)
# --------------------------------------------------------------------------
# The train/serve data-quality check: per label, how far did the
# embedding distribution move between two corpus snapshots? The
# fixture plants snapshot B as A with a deterministic per-component
# offset on every vec_id % DRIFT_MOD == 0 vector of ONE label, so the
# drifted label must dominate the report and every other label must
# read ~0. Hash discipline: components are quantized to integer
# micro-units map-side and summed as BIGINT (order-independent), and
# the per-dimension centroid uses floor(sum/n) — floor division is
# floor in BOTH engines (Spark F.floor(a/b), DuckDB floor(a/b)), so
# the L1 shift is an exact integer.
DRIFT_MOD = 3
DRIFT_LABEL = 1
DRIFT_OFFSET = 0.25  # exactly representable in binary — quantizes cleanly
EMB_Q = 1_000_000


@register(
    "embedding_drift_report",
    oracle=f"""
    WITH a AS (
      SELECT label,
             unnest(range(1, len(e) + 1)) AS pos,
             floor(unnest(e) * {EMB_Q})::BIGINT AS xq
      FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    ),
    b AS (
      SELECT label,
             unnest(range(1, len(e) + 1)) AS pos,
             floor((unnest(e) + CASE WHEN vec_id % {DRIFT_MOD} = 0 AND label = {DRIFT_LABEL}
                                     THEN CAST({DRIFT_OFFSET} AS DOUBLE) ELSE 0 END)
                   * {EMB_Q})::BIGINT AS xq
      FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    ),
    ca AS (SELECT label, pos, floor(sum(xq) / (count(*) * 1.0))::BIGINT AS c,
                  count(*)::BIGINT AS n FROM a GROUP BY 1, 2),
    cb AS (SELECT label, pos, floor(sum(xq) / (count(*) * 1.0))::BIGINT AS c
           FROM b GROUP BY 1, 2)
    SELECT ca.label,
           ca.n AS n_vectors,
           sum(abs(ca.c - cb.c))::BIGINT AS l1_shift_micro
    FROM ca JOIN cb ON ca.label = cb.label AND ca.pos = cb.pos
    GROUP BY 1, 2 ORDER BY ca.label
    """,
)
def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L1 centroid shift (integer micro-units) between the
    embeddings snapshot and a planted-drift twin."""
    emb = table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    drifted = base.withColumn(
        "e",
        F.when(
            (F.col("vec_id") % DRIFT_MOD == 0) & (F.col("label") == DRIFT_LABEL),
            F.transform("e", lambda x: x + F.lit(float(DRIFT_OFFSET))),
        ).otherwise(F.col("e")),
    )
    return drift_report(base, drifted)


def drift_report(snap_a: DataFrame, snap_b: DataFrame) -> DataFrame:
    """(label, n_vectors, l1_shift_micro) between two embedding
    snapshots with columns (vec_id, label, e: array<double>).

    Scale shape: each side is ONE map-side-combined groupBy on
    (label, pos) over quantized BIGINT sums — integer, so the sums
    are accumulation-order-independent and the result hash-stable;
    the join of the two centroid tables is labels×dims rows (tiny),
    and nothing is collected."""

    def centroids(df: DataFrame) -> DataFrame:
        q = df.select(
            "label",
            F.posexplode("e").alias("pos0", "x"),
        ).select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("x") * EMB_Q).cast("bigint").alias("xq"),
        )
        return q.groupBy("label", "pos").agg(
            F.floor(F.sum("xq") / F.count("*")).cast("bigint").alias("c"),
            F.count("*").alias("n"),
        )
    ca, cb = centroids(snap_a), centroids(snap_b)
    return (
        ca.alias("a")
        .join(cb.alias("b"), ["label", "pos"])
        .groupBy("label")
        .agg(
            (F.max(F.col("a.n"))).cast("bigint").alias("n_vectors"),
            F.sum(F.abs(F.col("a.c") - F.col("b.c"))).cast("bigint").alias("l1_shift_micro"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# robust (median/MAD) outlier detection
# --------------------------------------------------------------------------
# The mean/std z-score above breaks exactly when you need it (outliers
# inflate the std that is supposed to expose them); the robust twin
# uses median and MAD, which tolerate up to 50% contamination.
#
# Exactness contract: NO floats anywhere in the decision path. Values
# become exact integer cents via a DECIMAL(9,2) cast; medians are
# "doubled medians" (the SUM of the two middle order statistics —
# integer for both parities, = 2x the interpolated median), MAD is the
# doubled median of dev = |2x - med2| (= 4x the true MAD), and the
# outlier test  0.6745 * |x-med| / MAD > 3.5  is cross-multiplied to
# the BIGINT inequality  1349 * dev > 3500 * mad2  (memory rule: never
# divide across engines, cross-multiply). The doubled/quadrupled raw
# integers are emitted alongside ONE final int->double division each
# for readability.
MAD_Z_NUM = 1349  # 2 * 0.6745 * 1000
MAD_Z_DEN = 3500  # 3.5 * 1000


def _doubled_median(vals: DataFrame, key: str, col: str) -> DataFrame:
    """(key, med2) where med2 = x_(ceil(n/2)) + x_(floor(n/2)+1) in
    sorted order — twice the interpolated median, always integer.

    Histogram method, NOT a per-group row sort: counts per (key,
    value) are map-side combined, the cumulative-sum window runs over
    the DISTINCT-value relation (value-domain-sized, orders of
    magnitude smaller than the rows), and the order statistics are
    min-value-where-cum>=k selections. Scales to groups of any row
    count as long as the value domain is bounded (integer cents here);
    a continuous domain would use approx quantiles instead.

    The cumulative relation feeds BOTH order-statistic selections, so
    it is tracked_cache'd — without that, each consumer re-executes
    the histogram groupBy over the full input (the 'tiny stats
    relations must be cached' rule)."""
    from pyspark.sql import Window

    from ..plans import tracked_cache

    cnt = vals.groupBy(key, col).agg(F.count("*").alias("c"))
    tot = cnt.groupBy(key).agg(F.sum("c").cast("bigint").alias("n"))
    w = (
        Window.partitionBy(key)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = tracked_cache(
        cnt.withColumn("cum", F.sum("c").over(w)).join(F.broadcast(tot), key)
    )
    m1 = (
        cum.filter(F.col("cum") >= F.expr("(n + 1) DIV 2"))
        .groupBy(key)
        .agg(F.min(col).alias("m1"))
    )
    m2 = (
        cum.filter(F.col("cum") >= F.expr("n DIV 2 + 1"))
        .groupBy(key)
        .agg(F.min(col).alias("m2"))
    )
    # per-key relations (one row per group) — broadcast explicitly:
    # the cache above hides size stats from the planner, which would
    # otherwise realign both sides with a sort-merge join
    return m1.join(F.broadcast(m2), key).select(
        key, (F.col("m1") + F.col("m2")).cast("bigint").alias("med2")
    )


@register(
    "events_robust_mad_outliers",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    cnt AS (SELECT event_type, cents, count(*) AS c FROM v GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    cum AS (
      SELECT c.event_type, c.cents, t.n,
             sum(c.c) OVER (PARTITION BY c.event_type ORDER BY c.cents
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cnt c JOIN tot t USING (event_type)
    ),
    med AS (
      SELECT a.event_type, CAST(a.m1 + b.m2 AS BIGINT) AS med2
      FROM (SELECT event_type, min(cents) AS m1 FROM cum
            WHERE cum >= (n + 1) // 2 GROUP BY 1) a
      JOIN (SELECT event_type, min(cents) AS m2 FROM cum
            WHERE cum >= n // 2 + 1 GROUP BY 1) b USING (event_type)
    ),
    dev AS (
      SELECT v.event_type, abs(2 * v.cents - m.med2) AS d
      FROM v JOIN med m USING (event_type)
    ),
    dcnt AS (SELECT event_type, d, count(*) AS c FROM dev GROUP BY 1, 2),
    dcum AS (
      SELECT dc.event_type, dc.d, t.n,
             sum(dc.c) OVER (PARTITION BY dc.event_type ORDER BY dc.d
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM dcnt dc JOIN tot t USING (event_type)
    ),
    mad AS (
      SELECT a.event_type, CAST(a.m1 + b.m2 AS BIGINT) AS mad2
      FROM (SELECT event_type, min(d) AS m1 FROM dcum
            WHERE cum >= (n + 1) // 2 GROUP BY 1) a
      JOIN (SELECT event_type, min(d) AS m2 FROM dcum
            WHERE cum >= n // 2 + 1 GROUP BY 1) b USING (event_type)
    )
    SELECT v.event_type,
           any_value(t.n) AS n,
           any_value(m.med2) AS median_cents_x2,
           any_value(md.mad2) AS mad_cents_x4,
           CAST(any_value(m.med2) AS DOUBLE) / 200 AS median_value,
           CAST(any_value(md.mad2) AS DOUBLE) / 400 AS mad_value,
           CAST(sum(CASE WHEN md.mad2 > 0
                          AND {MAD_Z_NUM} * abs(2 * v.cents - m.med2)
                              > {MAD_Z_DEN} * md.mad2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM v
    JOIN tot t USING (event_type)
    JOIN med m USING (event_type)
    JOIN mad md USING (event_type)
    GROUP BY v.event_type ORDER BY v.event_type
    """,
)
def events_robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust z-score (0.6745·|x−med|/MAD > 3.5, Iglewicz–Hoaglin)
    outlier counts per event type — the detector that still works when
    the contamination itself has inflated the variance the plain
    z-score depends on.

    Plan: value rows collapse to an exact-cents histogram (map-side
    combined groupBy on the high-cardinality (type, cents) key), every
    window runs over the distinct-value relation only, and the
    per-type stats (n, med2, mad2 — |event_types| rows) come back to
    the rows via broadcast joins; the full events relation is scanned
    for the histogram, the deviation histogram, and the final count.
    Nothing floats: medians are doubled order-statistic sums and the
    cut is a cross-multiplied BIGINT inequality, so the hash cannot
    drift on ulp differences between engines."""
    from ..plans import tracked_cache

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = tracked_cache(
        ev.select(
            "event_type",
            (F.col("value").cast("decimal(9,2)") * 100).cast("bigint").alias("cents"),
        )
    )
    med = tracked_cache(_doubled_median(v, "event_type", "cents"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(2 * F.col("cents") - F.col("med2")).alias("d")
    )
    mad = tracked_cache(
        _doubled_median(dev, "event_type", "d").withColumnRenamed("med2", "mad2")
    )
    tot = tracked_cache(
        v.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    )
    is_out = (F.col("mad2") > 0) & (
        MAD_Z_NUM * F.abs(2 * F.col("cents") - F.col("med2"))
        > MAD_Z_DEN * F.col("mad2")
    )
    return (
        v.join(F.broadcast(tot), "event_type")
        .join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value(F.col("n")).alias("n"),
            F.any_value(F.col("med2")).alias("median_cents_x2"),
            F.any_value(F.col("mad2")).alias("mad_cents_x4"),
            (F.any_value(F.col("med2")).cast("double") / 200).alias("median_value"),
            (F.any_value(F.col("mad2")).cast("double") / 400).alias("mad_value"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# exact distributed quantiles (r10): the missing analytics primitive
# next to the MAD/histogram-median ops — discrete p50/p95/p99 per
# segment, EXACT (the selected element, not an interpolation), via the
# histogram-cumsum formulation that survives 100 TB: the per-segment
# window runs over the VALUE HISTOGRAM (segments × distinct cents),
# never over corpus rows — a naive row_number over raw events would
# funnel each segment's full data through one sort task.
# ---------------------------------------------------------------------------

QUANTILE_PCTS = (50, 95, 99)


@register(
    "events_exact_quantiles",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(user_id % 8 AS BIGINT) AS seg,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
    ),
    hist AS (
      SELECT seg, cents, CAST(count(*) AS BIGINT) AS cnt
      FROM ev GROUP BY seg, cents
    ),
    cum AS (
      SELECT seg, cents,
             CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY cents) AS BIGINT)
               AS cum_cnt
      FROM hist
    ),
    seg_n AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n FROM hist GROUP BY seg),
    q AS (SELECT unnest(ARRAY{list(QUANTILE_PCTS)}) AS pct)
    SELECT c.seg, CAST(q.pct AS INT) AS pct, s.n,
           CAST(min(c.cents) AS BIGINT) AS cents,
           min(c.cents) / 100.0 AS value
    FROM cum c JOIN seg_n s USING (seg), q
    WHERE c.cum_cnt >= (q.pct * s.n + 99) // 100
    GROUP BY c.seg, q.pct, s.n
    ORDER BY seg, pct
    """,
)
def events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete per-segment quantiles (p50/p95/p99 of event
    value): the selected element is the smallest value whose
    cumulative count reaches rank ceil(pct·n/100) — pure BIGINT
    arithmetic on cent-quantized values, so Spark and DuckDB agree
    bit-for-bit (rank = (pct·n + 99) div 100; no interpolation, no
    float comparisons until the final deterministic cents/100.0).

    100-TB plan: ONE map-side-combined corpus groupBy builds the
    (segment, cents) histogram; the cumulative-sum window and the
    rank probe run over that HISTOGRAM (|segments|·|price domain|
    rows), and the 3-row percentile relation joins in broadcast — the
    segment-partitioned sort never sees corpus rows, which is what
    makes exact quantiles viable where a row_number-over-raw-events
    formulation would serialize each segment through one task."""
    from pyspark.sql import Window

    # NULL values are excluded on BOTH sides (code-review r10): a NULL
    # histogram bucket sorts NULLS FIRST in Spark's window but NULLS
    # LAST in DuckDB's, silently shifting every cumulative count
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            (F.col("user_id") % 8).cast("bigint").alias("seg"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    hist = ev.groupBy("seg", "cents").agg(F.count("*").cast("bigint").alias("cnt"))
    hist = tracked_cache(hist)
    w = Window.partitionBy("seg").orderBy("cents")
    cum = hist.withColumn("cum_cnt", F.sum("cnt").over(w).cast("bigint"))
    seg_n = hist.groupBy("seg").agg(F.sum("cnt").cast("bigint").alias("n"))
    pcts = spark.createDataFrame([(p,) for p in QUANTILE_PCTS], "pct int")
    rank = F.expr("(pct * n + 99) div 100")  # integral div: exact at any n
    return (
        cum.join(F.broadcast(seg_n), "seg")
        .join(F.broadcast(pcts))
        .filter(F.col("cum_cnt") >= rank)
        .groupBy("seg", "pct", "n")
        .agg(F.min("cents").alias("cents"))
        .select(
            "seg",
            F.col("pct").cast("int").alias("pct"),
            "n",
            F.col("cents").cast("bigint").alias("cents"),
            (F.col("cents") / 100.0).alias("value"),
        )
        .orderBy("seg", "pct")
    )


# --------------------------------------------------------------------------
# column-level table profile (r10) — the data-quality audit table
# --------------------------------------------------------------------------
# Per-column null count, exact distinct count, numeric min/max and
# string mean length in ONE corpus scan: rows are melted to
# (col, val_s, val_num, len) and aggregated twice — the first groupBy
# collapses to distinct (col, value) pairs (map-side combined, so the
# shuffle carries at most |columns|·|distinct values| rows), the
# second reads every profile stat off that type table. Doubles keep
# their numeric identity end-to-end (min/max surface as DOUBLE;
# distinctness is decided by grouping, never by string formatting —
# engine float-to-string repr is the documented hash trap). The
# NULL plant (l_tax on orderkey%97, l_returnflag on %89) makes the
# null accounting non-vacuous on the fixture.
_PROFILE_NULL_TAX_MOD = 97
_PROFILE_NULL_FLAG_MOD = 89

# (column, kind) — kind drives the melt arms on both engines
_LINEITEM_PROFILE_COLS = [
    ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
    ("l_linenumber", "int"), ("l_quantity", "num"),
    ("l_extendedprice", "num"), ("l_discount", "num"), ("l_tax", "num"),
    ("l_returnflag", "str"), ("l_linestatus", "str"), ("l_shipdate", "ts"),
]


def _profile_oracle() -> str:
    arms = []
    for c, kind in _LINEITEM_PROFILE_COLS:
        if kind == "int":
            vs, vn, ln = f"CAST({c} AS VARCHAR)", f"CAST({c} AS DOUBLE)", "NULL"
        elif kind == "num":
            vs, vn, ln = "NULL", f"CAST({c} AS DOUBLE)", "NULL"
        elif kind == "str":
            vs, vn, ln = c, "NULL", f"length({c})"
        else:  # ts
            vs, vn, ln = "NULL", f"CAST(epoch_us({c}) AS DOUBLE)", "NULL"
        arms.append(
            f"SELECT '{c}' AS col, CAST({vs} AS VARCHAR) AS val_s, "
            f"CAST({vn} AS DOUBLE) AS val_num, CAST({ln} AS BIGINT) AS len "
            f"FROM planted"
        )
    melted = " UNION ALL ".join(arms)
    return f"""
    WITH planted AS (
      SELECT * REPLACE (
        CASE WHEN l_orderkey % {_PROFILE_NULL_TAX_MOD} = 0 THEN NULL
             ELSE l_tax END AS l_tax,
        CASE WHEN l_orderkey % {_PROFILE_NULL_FLAG_MOD} = 0 THEN NULL
             ELSE l_returnflag END AS l_returnflag)
      FROM lineitem
    ),
    melted AS ({melted}),
    g1 AS (
      SELECT col, val_s, val_num,
             count(*) AS cnt, CAST(sum(len) AS BIGINT) AS sum_len
      FROM melted GROUP BY col, val_s, val_num
    )
    SELECT col,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN val_s IS NULL AND val_num IS NULL
                                  THEN cnt END), 0) AS BIGINT) AS n_nulls,
           CAST(count(CASE WHEN val_s IS NOT NULL OR val_num IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_distinct,
           min(val_num) AS min_num,
           max(val_num) AS max_num,
           CASE WHEN sum(CASE WHEN val_s IS NOT NULL THEN cnt END) > 0
                THEN CAST(sum(sum_len) AS BIGINT)
                     / CAST(sum(CASE WHEN val_s IS NOT NULL THEN cnt END)
                            AS DOUBLE) END AS avg_len
    FROM g1 GROUP BY col ORDER BY col
    """


def profile_columns(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """Generic profiler: melt ``(name, kind)`` columns of ``df`` (kind
    in int/num/str/ts) and aggregate the per-column profile. Library
    surface — any table, one scan, two map-side-combined shuffles."""
    arms = []
    for c, kind in cols:
        if kind == "int":
            vs, vn, ln = f"CAST({c} AS STRING)", f"CAST({c} AS DOUBLE)", "CAST(NULL AS BIGINT)"
        elif kind == "num":
            vs, vn, ln = "CAST(NULL AS STRING)", f"CAST({c} AS DOUBLE)", "CAST(NULL AS BIGINT)"
        elif kind == "str":
            vs, vn, ln = c, "CAST(NULL AS DOUBLE)", f"CAST(length({c}) AS BIGINT)"
        elif kind == "ts":
            # NTZ parquet timestamps reject unix_micros; the session is
            # pinned UTC (plans._ensure_session_conf) so the LTZ cast
            # is value-preserving and matches DuckDB's naive epoch_us
            vs, vn, ln = (
                "CAST(NULL AS STRING)",
                f"CAST(unix_micros(CAST({c} AS TIMESTAMP)) AS DOUBLE)",
                "CAST(NULL AS BIGINT)",
            )
        else:
            raise ValueError(f"unknown profile kind {kind!r} for {c}")
        arms.extend([f"'{c}'", vs, vn, ln])
    melted = df.selectExpr(
        f"stack({len(cols)}, {', '.join(arms)}) AS (col, val_s, val_num, len)"
    )
    g1 = melted.groupBy("col", "val_s", "val_num").agg(
        F.count("*").alias("cnt"), F.sum("len").cast("bigint").alias("sum_len")
    )
    null_grp = F.col("val_s").isNull() & F.col("val_num").isNull()
    n_str = F.sum(F.when(F.col("val_s").isNotNull(), F.col("cnt")))
    return g1.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(F.when(null_grp, F.col("cnt"))), F.lit(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.count(F.when(~null_grp, F.lit(1))).cast("bigint").alias("n_distinct"),
        F.min("val_num").alias("min_num"),
        F.max("val_num").alias("max_num"),
        F.when(
            n_str > 0, F.sum("sum_len").cast("bigint") / n_str.cast("double")
        ).alias("avg_len"),
    )


@register("table_profile", oracle=_profile_oracle())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of lineitem (nulls planted on two columns
    so the null accounting is exercised): one row per column with
    exact distinct counts and type-aware min/max/length stats.

    Plan: scan once → stack() melt (map-side, |cols|× rows but narrow)
    → groupBy(col, value) with map-side combine → tiny groupBy(col).
    No per-column countDistinct (which would Expand the scan |cols|×
    INSIDE the aggregate); the melt shape is the scalable exact-
    distinct profile at any table width."""
    li = table(spark, sf_dir, "lineitem")
    planted = li.withColumn(
        "l_tax",
        F.when(F.col("l_orderkey") % _PROFILE_NULL_TAX_MOD == 0, None).otherwise(
            F.col("l_tax")
        ),
    ).withColumn(
        "l_returnflag",
        F.when(F.col("l_orderkey") % _PROFILE_NULL_FLAG_MOD == 0, None).otherwise(
            F.col("l_returnflag")
        ),
    )
    return profile_columns(planted, _LINEITEM_PROFILE_COLS).orderBy("col")
