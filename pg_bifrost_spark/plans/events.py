"""Event-stream operators over the ``events`` table.

These are the batch-mode twins of the streaming operators in
``pg_bifrost_spark/streaming`` — same DataFrame expressions, so the
correctness proved here against the DuckDB oracle carries over to the
readStream versions (Structured Streaming runs the identical plan per
micro-batch).

Reference lineage: the stats time-bucket aggregation
(``stats/aggregator/aggregator.go:138-258``) is the 60 s tumbling
window here; ledger last-writer-wins (``transport/progress/
ledger.go:50-61``) is the keep-latest dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import register, table


# --------------------------------------------------------------------------
# Tumbling window aggregation (A6: 60s stat buckets with sum/count/min/max/avg)
# --------------------------------------------------------------------------
@register(
    "tumbling_window_stats",
    oracle="""
    SELECT date_trunc('minute', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total,
           min(value) AS vmin,
           max(value) AS vmax,
           CAST(sum(CAST(value AS DECIMAL(9,2))) AS DOUBLE) / count(*) AS vavg
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def tumbling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 stat buckets. Hash discipline (see q1): exact decimal sum →
    one double cast; avg = exact-sum-as-double / count; min/max are
    order-free picks of existing doubles — no rounding anywhere."""
    ev = table(spark, sf_dir, "events")
    val = F.col("value").cast("decimal(9,2)")
    n = F.count("*")
    return (
        ev.groupBy(F.window("ts", "60 seconds").alias("w"), "event_type")
        .agg(
            n.alias("n"),
            F.sum(val).cast("double").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            (F.sum(val).cast("double") / n).alias("vavg"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total", "vmin", "vmax", "vavg")
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Sliding (hopping) window — width 10 min, hop 5 min
# --------------------------------------------------------------------------
@register(
    "sliding_window_counts",
    oracle="""
    SELECT to_timestamp(floor(epoch(ts) / 300) * 300 - off)::timestamp AS window_start,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events CROSS JOIN (VALUES (0), (300)) AS hops(off)
    GROUP BY 1 ORDER BY 1
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
        .orderBy("window_start")
    )


# --------------------------------------------------------------------------
# Sessionization — gaps-and-islands, 5-minute inactivity gap
# --------------------------------------------------------------------------
@register(
    "sessionize_users",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 300000000 OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS session_value,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (5-minute inactivity gap).

    The gap test compares EXACT microsecond epochs on both engines
    (``unix_micros`` / ``epoch_us``) — ``ts.cast('long')`` truncates to
    whole seconds, so a gap of e.g. 300.4 s lands in a ±1 s window
    where the truncated and exact comparisons disagree and the two
    engines split sessions differently (round-2 residual hash fail:
    events.ts carries microsecond precision on every row)."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 300_000_000)
    ).cast("int")
    running = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(running))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            # value is a 2dp grid → decimal sum is exact; the FINAL
            # cast to double (both engines) avoids Decimal
            # trailing-zero vs float repr hash flakiness while keeping
            # the arithmetic exact (see q9_product_profit docstring).
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# As-of join: each 'click' picks up the value of the user's latest
# prior 'view' (Spark lacks a native as-of join; composition of window
# ops keeps it shuffle-once and codegen'd)
# --------------------------------------------------------------------------
@register(
    "asof_click_to_view",
    oracle="""
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_value
    FROM events
    QUALIFY event_type = 'click'
    ORDER BY event_id
    """,
)
def asof_click_to_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    view_val = F.when(F.col("event_type") == "view", F.col("value"))
    return (
        ev.withColumn("last_view_value", F.last(view_val, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_view_value")
        .orderBy("event_id")
    )


@register(
    "interval_click_views",
    oracle="""
    SELECT c.event_id AS click_id, v.event_id AS view_id,
           c.user_id AS user_id, round(v.value, 2) AS view_value
    FROM events c JOIN events v
      ON c.user_id = v.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 24 HOUR AND c.ts
    WHERE c.event_type = 'click' AND v.event_type = 'view'
    ORDER BY click_id, view_id
    """,
)
def interval_click_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: every click paired with ALL of that
    user's views in the trailing 24 h — the batch twin of the
    stream-stream interval join (`streaming/analytics.py::
    interval_join`), which bounds its state with two watermarks. The
    equi-key (user_id) keeps this a hash join + post-filter, not a
    cross product."""
    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return (
        c.join(
            v,
            (F.col("c_user") == F.col("v_user"))
            & F.col("view_ts").between(
                F.col("click_ts") - F.expr("INTERVAL 24 HOURS"), F.col("click_ts")
            ),
        )
        .select(
            "click_id",
            "view_id",
            F.col("c_user").alias("user_id"),
            F.round("view_value", 2).alias("view_value"),
        )
        .orderBy("click_id", "view_id")
    )


_ASOF_ORACLE = """
    SELECT event_id, user_id, ts,
           last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_value
    FROM events
    QUALIFY event_type = 'click'
    ORDER BY event_id
    """


@register("asof_click_to_view_pandas", oracle=_ASOF_ORACLE)
def asof_click_to_view_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics as ``asof_click_to_view`` but via
    ``applyInPandas`` per user group (the pd.merge_asof-style path the
    guide recommends when the composition gets hairy) — two independent
    implementations hash-matched against ONE oracle."""
    import pandas as pd  # noqa: F401

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type", "value")

    def per_user(pdf):
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # last view value among STRICTLY PRIOR rows in (ts, event_id)
        # order — identical frame to the window-based twin
        prior_view = pdf["value"].where(pdf["event_type"] == "view").ffill().shift(1)
        out = pdf[pdf["event_type"] == "click"].copy()
        out["last_view_value"] = prior_view[out.index]
        return out[["event_id", "user_id", "ts", "last_view_value"]]

    return ev.groupBy("user_id").applyInPandas(
        per_user, schema="event_id bigint, user_id bigint, ts timestamp, last_view_value double"
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# Lead/lag analytics: inter-event gap per user
# --------------------------------------------------------------------------
@register(
    "event_gaps",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS gap_us
    FROM events
    QUALIFY gap_us IS NOT NULL
    ORDER BY event_id
    """,
)
def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn(
            "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        )
        .filter(F.col("gap_us").isNotNull())
        .select("event_id", "user_id", "gap_us")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Dedup: keep-latest per key (ledger last-writer-wins semantics, W4)
# --------------------------------------------------------------------------
@register(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_type, event_id AS latest_event_id, ts AS latest_ts
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id, event_type
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max_by("event_id", F.struct("ts", "event_id")).alias("latest_event_id"),
            F.max("ts").alias("latest_ts"),
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# Hypertable-style continuous rollup: minute → hour → day, each level
# derived from the previous level's PARTIAL aggregates (merge, not
# recompute) — the incremental-materialization shape of a timeseries
# store; at 100 TB only the minute level ever scans raw events.
# --------------------------------------------------------------------------
@register(
    "hypertable_rollup",
    oracle="""
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS b, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS s,
             min(value) AS mn, max(value) AS mx
      FROM events GROUP BY 1, 2
    ), hour AS (
      SELECT date_trunc('hour', b) AS b, event_type,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS DECIMAL(18,2)) AS s,
             min(mn) AS mn, max(mx) AS mx
      FROM minute GROUP BY 1, 2
    ), day AS (
      SELECT date_trunc('day', b) AS b, event_type,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS DECIMAL(18,2)) AS s,
             min(mn) AS mn, max(mx) AS mx
      FROM hour GROUP BY 1, 2
    )
    SELECT 'minute' AS level, count(*) AS n_buckets,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(CAST(sum(s) AS DECIMAL(38,2)) AS DOUBLE) AS total
    FROM minute
    UNION ALL SELECT 'hour', count(*), CAST(sum(n) AS BIGINT),
                     CAST(CAST(sum(s) AS DECIMAL(38,2)) AS DOUBLE) FROM hour
    UNION ALL SELECT 'day', count(*), CAST(sum(n) AS BIGINT),
                     CAST(CAST(sum(s) AS DECIMAL(38,2)) AS DOUBLE) FROM day
    ORDER BY level
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # value is a 2dp grid → exact decimal partials merge losslessly
    # across levels; double sums re-rounded per level drift between
    # engines (the r01 hash-fail class).
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("b"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("s"),
        F.min("value").alias("mn"), F.max("value").alias("mx"),
    )
    def up(df, unit):
        return df.groupBy(F.date_trunc(unit, F.col("b")).alias("b"), "event_type").agg(
            F.sum("n").alias("n"), F.sum("s").cast("decimal(18,2)").alias("s"),
            F.min("mn").alias("mn"), F.max("mx").alias("mx"),
        )
    hour, day = up(minute, "hour"), None
    day = up(hour, "day")
    def level(df, name):
        # exact decimal sum, one final double conversion (both
        # engines) — Decimal output hash-fails when the cents digit is
        # zero (trailing-zero vs float repr; see q9 docstring).
        return df.agg(
            F.count("*").alias("n_buckets"), F.sum("n").alias("n_events"),
            F.sum("s").cast("decimal(38,2)").cast("double").alias("total"),
        ).select(F.lit(name).alias("level"), "n_buckets", "n_events", "total")
    return level(minute, "minute").unionByName(level(hour, "hour")).unionByName(
        level(day, "day")
    ).orderBy("level")


# --------------------------------------------------------------------------
# Exact distinct (dropDuplicates semantics)
# --------------------------------------------------------------------------
@register(
    "dedup_exact_events",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
)
def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates().orderBy("user_id", "event_type")


# --------------------------------------------------------------------------
# JSON prop extraction (the props column is a JSON string)
# --------------------------------------------------------------------------
@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                             '^-?[0-9]+$')
                         THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                    END) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string→bigint cast is made TOTAL on both engines by first
    gating on an integer regex (Spark string cast NULLs "1.5"/"1e3",
    DuckDB rounds or errors — semantics diverge on anything but pure
    integers); the oracle additionally casts the sum back to BIGINT
    because DuckDB sum(BIGINT) widens to HUGEINT, which pandas renders
    as float and breaks the value hash."""
    ev = table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    return (
        ev.select(
            "event_type",
            F.when(k_str.rlike(r"^-?[0-9]+$"), k_str.cast("bigint")).alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# funnel analysis (sequential conversion within deadlines)
# ---------------------------------------------------------------------------
FUNNEL_WINDOW_HOURS = 24


@register(
    "events_funnel",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click'
        AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_buy
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase'
        AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS users FROM v
      UNION ALL
      SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      UNION ALL
      SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
    ) ORDER BY step
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel: first view → first click within
    {FUNNEL_WINDOW_HOURS} h of it → first purchase within
    {FUNNEL_WINDOW_HOURS} h of that, per user; one row per step with
    the surviving-user count (the product-analytics staple the
    windowed suite doesn't cover — ORDER-dependent steps with
    deadlines, not independent aggregates).

    Per-step state is one min() per user (map-side combined); each
    step joins the previous step's per-user anchor — shuffles keyed on
    user_id reuse the same partitioning at every step, and no step's
    output exceeds one row per user. Scale: linear scans + 3
    user-keyed shuffles regardless of event volume."""
    ev = table(spark, sf_dir, "events")
    window = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter((F.col("ts") > F.col("t_view")) & (F.col("ts") <= F.col("t_view") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("t_click")) & (F.col("ts") <= F.col("t_click") + window))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def step(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("users")).select(
            F.lit(name).alias("step"), "users"
        )

    return (
        step(v, "1_view")
        .unionByName(step(c, "2_click"))
        .unionByName(step(p, "3_purchase"))
        .orderBy("step")
    )


# ---------------------------------------------------------------------------
# weekly retention cohorts
# ---------------------------------------------------------------------------
@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7 AS week_offset
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention matrix: users grouped by first-seen week
    (cohort), counted once per later week they were active — the
    growth-analytics artifact (cohort × week_offset → active users).

    Two user-keyed shuffles (first-week anchor, then the distinct
    (user, offset) dedup) plus an O(weeks²)-row final aggregate —
    event volume only flows through linear scans and map-side
    combines. date_trunc('week') is Monday-based on both engines; the
    offset is an exact integer day-diff // 7."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            F.col("week_offset").cast("bigint").alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# last-touch attribution
# ---------------------------------------------------------------------------
ATTRIB_WINDOW_HOURS = 24


@register(
    "purchase_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
      FROM events
    )
    SELECT coalesce(CASE WHEN ts <= touch_ts + INTERVAL {ATTRIB_WINDOW_HOURS} HOUR
                         THEN touch END, 'unattributed') AS channel,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(count(DISTINCT user_id) AS BIGINT) AS buyers
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY channel
    """,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding non-purchase event within
    {ATTRIB_WINDOW_HOURS} h (else 'unattributed') — the marketing-
    analytics sibling of the funnel, exercising the
    last_value-IGNORE-NULLS running-state window both engines must
    evaluate identically (ties broken by event_id so the frame is
    total-ordered).

    One user-partitioned window (the per-user sort is the only
    shuffle; event volume never concentrates beyond a user's own
    history) and an O(channels)-state final aggregate."""
    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    non_purchase = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    non_purchase_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.last(non_purchase, ignorenulls=True).over(w).alias("touch"),
        F.last(non_purchase_ts, ignorenulls=True).over(w).alias("touch_ts"),
    )
    window = F.expr(f"INTERVAL {ATTRIB_WINDOW_HOURS} HOURS")
    return (
        seq.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(F.col("ts") <= F.col("touch_ts") + window, F.col("touch")),
                F.lit("unattributed"),
            ).alias("channel"),
            "user_id",
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("purchases"),
            F.countDistinct("user_id").cast("bigint").alias("buyers"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# r11: CUSUM mean-shift changepoint detection over daily event volumes
# ---------------------------------------------------------------------------
# Slack k = mu/10 and threshold h = 3*sigma, both expressed in EXACT
# integer arithmetic (see the op docstring's scaling identity).
CUSUM_H_SIGMA = 3


@register(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ), stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS ss
      FROM daily GROUP BY event_type
    ), dev AS (
      SELECT d.event_type, d.day, d.n, t.cnt, t.s, t.ss,
             sum(10 * t.cnt * d.n - 11 * t.s) OVER (
               PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM daily d JOIN stats t ON d.event_type = t.event_type
    ), cusum AS (
      SELECT event_type, day, n, cnt, s, ss,
             cum - least(min(cum) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ), 0) AS s_t_scaled
      FROM dev
    )
    SELECT event_type, day, n AS n_events,
           CAST(s_t_scaled AS DOUBLE) / (10 * cnt) AS cusum_stat,
           CAST(s_t_scaled AS DOUBLE) * CAST(s_t_scaled AS DOUBLE)
             > 900.0 * CAST(cnt * ss - s * s AS DOUBLE) AS alarm
    FROM cusum ORDER BY event_type, day
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM mean-shift detection (Page 1954) over daily
    event counts per type, in EXACT integer arithmetic end to end.

    Two identities make this both window-expressible and bit-stable:
    (1) the textbook recursion S_t = max(0, S_{t-1} + x_t - mu - k)
    equals cum_t - min(0, min_{j<=t} cum_j) for cum = running sum of
    deviations — two stock window functions; (2) scaling deviations by
    10*cnt turns x_t - 1.1*mu (with mu = s/cnt, k = mu/10) into
    10*cnt*x_t - 11*s, an exact BIGINT — the running sum/min stay
    integers, so Spark's and DuckDB's different windowed-aggregation
    association orders cannot produce ULP drift (the registry's
    no-rounded-double-aggregates convention). The emitted statistic is
    one integer-over-integer division (bit-stable); the 3-sigma alarm
    compares s_t^2 > 9*var via 900*(cnt*ss - s^2), squares taken in
    double to bound magnitudes.

    Scale: the windows run over the (event_type, day) AGGREGATE (days
    x types rows), never raw events; the only corpus-sized pass is the
    map-side-combined daily count."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.col("ts")).alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dev = daily.join(F.broadcast(stats), "event_type").withColumn(
        "cum",
        F.sum(
            F.lit(10) * F.col("cnt") * F.col("n") - F.lit(11) * F.col("s")
        ).over(w),
    )
    cusum = dev.withColumn(
        "s_t_scaled",
        F.col("cum") - F.least(F.min("cum").over(w), F.lit(0).cast("bigint")),
    )
    scaled_d = F.col("s_t_scaled").cast("double")
    return cusum.select(
        "event_type",
        "day",
        F.col("n").alias("n_events"),
        (scaled_d / (F.lit(10) * F.col("cnt"))).alias("cusum_stat"),
        (
            scaled_d * scaled_d
            > F.lit(900.0)
            * (F.col("cnt") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        ).alias("alarm"),
    ).orderBy("event_type", "day")
