"""Data-selection and training-example construction operators:
model-free importance scoring that picks which raw documents resemble
a small high-quality target set, and the denoising-objective example
builder — the steps between raw-corpus cleaning and the trainer's
input pipeline.

``dsir_importance_score`` implements DSIR (Data Selection via
Importance Resampling, Xie et al. 2023): hashed n-gram bag-of-words
features, two multinomial bucket distributions (target vs raw), and a
per-document importance log-weight

    log w(doc) = sum_f count_doc(f) * (ln p_target(f) - ln p_raw(f))

All float math is quantized to integer micro-nats BEFORE any sum
(the repo-wide oracle-hash rule): each bucket's ln() is evaluated on
bit-identical exact-integer-ratio doubles in both engines, floored to
a BIGINT once, and only BIGINTs are ever summed.

Scale posture (100 TB): features are hash buckets — the model is a
fixed D-row table, never vocabulary-sized. The corpus is scanned for
(a) target bucket counts, (b) raw bucket counts, (c) per-doc scoring;
the tokenized feature relation is tracked_cache'd so the three passes
share one tokenization at test scale (a deployment would persist it).
The bucket-count shuffles land on D=256 keys but map-side partial
aggregation means post-shuffle traffic is O(D x partitions), not
O(tokens); the lambda table is broadcast (D rows) so per-doc scoring
is one map-side join plus a single groupBy(doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import register, table, tracked_cache
from .curation import md5_bucket
from .text import LEX_SCORE_SQL, _tokens, lexical_diversity_ppm

# Hashed feature space (unigrams + bigrams -> D buckets) and the
# DSIR target set: a small named slice of sources standing in for the
# "trusted high-quality corpus" (Wikipedia in the paper).
DSIR_BUCKETS = 256
DSIR_TARGET_SOURCES = ("src3", "src7")
_TGT_SQL = ", ".join(f"'{s}'" for s in DSIR_TARGET_SOURCES)

LOGPROB_SCALE = 1_000_000


def _qln(x: F.Column) -> F.Column:
    """floor(ln(x) * 1e6) as BIGINT — the order-free quantized log."""
    return F.floor(F.log(x) * LOGPROB_SCALE).cast("bigint")


def _hashed_features(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bucket) — one row per unigram AND bigram
    occurrence, hashed to DSIR_BUCKETS via the oracle-mirrored md5
    primitive. Bigrams join adjacent tokens with a single space; docs
    with one token contribute unigrams only (guarded: Spark's
    sequence(1, 0) would DESCEND, not return empty)."""
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    feats_arr = F.when(F.size("toks") >= 2, F.concat(F.col("toks"), bigrams)).otherwise(
        F.col("toks")
    )
    return docs.select(
        "doc_id", "source", F.explode(feats_arr).alias("feat")
    ).select(
        "doc_id",
        "source",
        md5_bucket(F.col("feat"), buckets=DSIR_BUCKETS).alias("bucket"),
    )


@register(
    "dsir_importance_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    feat AS (
      SELECT doc_id, source,
             unnest(list_concat(
               toks,
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1]))) AS feat
      FROM tok
    ),
    fb AS (
      SELECT doc_id, source,
             (CAST(CONCAT('0x', substr(md5(feat), 1, 8)) AS BIGINT)
                % {DSIR_BUCKETS}) AS bucket
      FROM feat
    ),
    tcnt AS (SELECT bucket, count(*) AS t FROM fb
             WHERE source IN ({_TGT_SQL}) GROUP BY 1),
    rcnt AS (SELECT bucket, count(*) AS r FROM fb
             WHERE source NOT IN ({_TGT_SQL}) GROUP BY 1),
    tot AS (SELECT (SELECT COALESCE(sum(t), 0) FROM tcnt) AS tt,
                   (SELECT COALESCE(sum(r), 0) FROM rcnt) AS rr),
    spine AS (SELECT range AS bucket FROM range(0, {DSIR_BUCKETS})),
    lam AS (
      SELECT s.bucket,
             CAST(floor(ln((COALESCE(t, 0) + 1) / (tt + {DSIR_BUCKETS}))
                        * {LOGPROB_SCALE}) AS BIGINT)
           - CAST(floor(ln((COALESCE(r, 0) + 1) / (rr + {DSIR_BUCKETS}))
                        * {LOGPROB_SCALE}) AS BIGINT) AS lam
      FROM spine s
      LEFT JOIN tcnt ON s.bucket = tcnt.bucket
      LEFT JOIN rcnt ON s.bucket = rcnt.bucket
      CROSS JOIN tot
    )
    SELECT f.doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(l.lam) AS BIGINT) AS dsir_micro_nats
    FROM fb f JOIN lam l ON f.bucket = l.bucket
    GROUP BY 1 ORDER BY 1
    """,
)
def dsir_importance_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weight per document (integer micro-nats):
    how much more likely the doc's hashed n-gram bag is under the
    target distribution than the raw distribution. Higher ⇒ more
    target-like ⇒ kept with higher probability by the resampling step
    (which is ``sample_deterministic``-style hash thresholding on this
    score downstream — scoring is the distributed-compute part).

    Plan: one tokenize+hash pass (cached), two D-key bucket counts
    with map-side combine, a D-row lambda table built on a bucket
    spine with the two totals as broadcast single-row crossJoins, then
    broadcast(lambda) ⋈ features → one groupBy(doc_id). Nothing
    corpus-proportional is broadcast, collected, or windowed.

    +1/(N+D) Laplace smoothing keeps empty buckets finite on both
    engines; both logs are quantized per-bucket before the BIGINT
    per-doc sum, so accumulation order cannot move the hash.

    r13 (guide §2.3 aggregate-before-you-move): the cached relation is
    the per-(doc, bucket) COUNT, not the raw occurrence stream. A doc
    hits ≤ DSIR_BUCKETS distinct buckets, so the compact relation is
    ≤ docs × 256 rows instead of ~2 rows per token — at the 10× scale
    leg that is ~1.3 M cached+rescanned rows instead of ~5.4 M, and
    every downstream sum is over counts (identical BIGINT totals:
    sum over occurrences ≡ sum of n·per-group). The partial
    aggregation runs map-side on explode output whose doc rows are
    contiguous, so the one exchange carries the compact rows only."""
    from .dedup import spread

    # spread BEFORE tokenizing (r13, guide §2.5 input skew): the
    # documents scan is often ONE parquet split, and every downstream
    # cost here (regex tokenize, bigram build, md5 per feature) is
    # CPU per ROW — un-spread, the whole feature build ran in one
    # task at the 10× scale leg. Narrow source rows move once; the
    # same pinning is correct on a real cluster (spread's contract).
    docs = spread(table(spark, sf_dir, "documents"), "doc_id").withColumn(
        "toks", _tokens()
    )
    feats = tracked_cache(
        _hashed_features(docs)
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count("*").alias("n"))
    )
    is_tgt = F.col("source").isin(*DSIR_TARGET_SOURCES)

    # Each bucket-count relation feeds BOTH its total and the lambda
    # spine join; uncached, the full-feature aggregation would execute
    # twice per side (4 passes where 2 suffice), so both are cached —
    # ≤DSIR_BUCKETS rows each.
    tcnt = tracked_cache(
        feats.filter(is_tgt).groupBy("bucket").agg(F.sum("n").alias("t"))
    )
    rcnt = tracked_cache(
        feats.filter(~is_tgt).groupBy("bucket").agg(F.sum("n").alias("r"))
    )
    tot_t = tcnt.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("tt"))
    tot_r = rcnt.agg(F.coalesce(F.sum("r"), F.lit(0)).alias("rr"))

    spine = spark.range(DSIR_BUCKETS).select(F.col("id").alias("bucket"))
    lam = (
        spine.join(tcnt, "bucket", "left")
        .join(rcnt, "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "bucket",
            (
                _qln((F.coalesce(F.col("t"), F.lit(0)) + 1) / (F.col("tt") + DSIR_BUCKETS))
                - _qln((F.coalesce(F.col("r"), F.lit(0)) + 1) / (F.col("rr") + DSIR_BUCKETS))
            ).alias("lam"),
        )
    )

    return (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_feats"),
            F.sum(F.col("n") * F.col("lam")).cast("bigint").alias("dsir_micro_nats"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# T5-style span corruption (denoising-objective example construction)
# --------------------------------------------------------------------------
# The trainer's input pair for a span-corruption objective: the
# document with masked spans replaced by numbered sentinels, and the
# target sequence holding the spans behind their sentinels. The
# streaming-era twist: masking must be DETERMINISTIC (re-runs and
# shard retries must produce byte-identical examples), so span starts
# come from the oracle-mirrored md5 primitive, not an RNG.
#
# Block scheme: tokens partition into fixed blocks of CORRUPT_BLOCK;
# each block longer than CORRUPT_SPAN tokens masks exactly one
# CORRUPT_SPAN-token run whose offset is md5(doc_id:block) modulo the
# legal range — a ~15% corruption rate (3/20) with non-overlapping
# spans BY CONSTRUCTION, which keeps the whole builder expressible as
# per-row array algebra (no sequential scan, no Python).
CORRUPT_BLOCK = 20
CORRUPT_SPAN = 3
# T5's sentinel vocabulary is <extra_id_0>..<extra_id_99> — corruption
# stops at block 100 so no emitted sentinel can fall outside it.
# Block-index numbering IS sequential numbering here: every non-final
# block has exactly CORRUPT_BLOCK (> CORRUPT_SPAN) tokens, so every
# block before b is masked and b equals the masked-span rank.
SENTINEL_LIMIT = 100

# shared sub-expressions (Spark SQL dialect); the DuckDB oracle
# mirrors each line 1:1 below
_SS_SPARK = (
    "transform(bs, b -> CASE WHEN b < {S} AND least({B}, n - b*{B}) > {L} THEN "
    "pmod(CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':', CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT), "
    "least({B}, n - b*{B}) - {L} + 1) ELSE -1 END)"
).format(B=CORRUPT_BLOCK, L=CORRUPT_SPAN, S=SENTINEL_LIMIT)


@register(
    "t5_span_corruption",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n
      FROM documents
    ),
    meta AS (
      SELECT doc_id, toks, n,
             range(0, (n + {CORRUPT_BLOCK - 1}) // {CORRUPT_BLOCK}) AS bs
      FROM tok
    ),
    off AS (
      SELECT doc_id, toks, n, bs,
             list_transform(bs, b -> CASE
               WHEN b < {SENTINEL_LIMIT}
                AND least({CORRUPT_BLOCK}, n - b*{CORRUPT_BLOCK}) > {CORRUPT_SPAN} THEN
                 CAST(CONCAT('0x', substr(md5(doc_id || ':' || b), 1, 8)) AS BIGINT)
                 % (least({CORRUPT_BLOCK}, n - b*{CORRUPT_BLOCK}) - {CORRUPT_SPAN} + 1)
               ELSE -1 END) AS ss
      FROM meta
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(len(list_filter(bs, b -> ss[b + 1] >= 0)) AS BIGINT) AS n_spans,
           CAST(len(list_filter(bs, b -> ss[b + 1] >= 0)) * {CORRUPT_SPAN} AS BIGINT)
             AS n_masked,
           array_to_string(flatten(list_transform(bs, b -> CASE
             WHEN ss[b + 1] >= 0 THEN
               list_concat(list_concat(
                 list_slice(toks, b*{CORRUPT_BLOCK} + 1, b*{CORRUPT_BLOCK} + ss[b + 1]),
                 ['<extra_id_' || b || '>']),
                 list_slice(toks,
                            b*{CORRUPT_BLOCK} + ss[b + 1] + {CORRUPT_SPAN} + 1,
                            b*{CORRUPT_BLOCK} + least({CORRUPT_BLOCK}, n - b*{CORRUPT_BLOCK})))
             ELSE
               list_slice(toks, b*{CORRUPT_BLOCK} + 1,
                          b*{CORRUPT_BLOCK} + least({CORRUPT_BLOCK}, n - b*{CORRUPT_BLOCK}))
             END)), ' ') AS corrupted_text,
           COALESCE(array_to_string(flatten(list_transform(
             list_filter(bs, b -> ss[b + 1] >= 0),
             b -> list_concat(
               ['<extra_id_' || b || '>'],
               list_slice(toks, b*{CORRUPT_BLOCK} + ss[b + 1] + 1,
                          b*{CORRUPT_BLOCK} + ss[b + 1] + {CORRUPT_SPAN})))), ' '), '')
             AS targets_text
    FROM off ORDER BY doc_id
    """,
)
def t5_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption example pairs (corrupted input +
    sentinel-keyed targets) per document.

    Plan: pure per-row array algebra — tokenize once, derive the
    per-block mask offsets as an integer array (the md5 primitive in a
    higher-order transform), then rebuild both sequences with
    slice/concat/flatten. ZERO shuffles before the output sort, zero
    Python, nothing leaves the row — the shape that runs at parquet
    scan speed on any corpus size and re-executes byte-identically on
    shard retry (the property an RNG-based masker cannot give you)."""
    B, L = CORRUPT_BLOCK, CORRUPT_SPAN
    docs = (
        table(spark, sf_dir, "documents")
        .withColumn("toks", _tokens())
        .withColumn("n", F.size("toks"))
        .withColumn("bs", F.expr(f"sequence(0, (n + {B - 1}) DIV {B} - 1)"))
        .withColumn("ss", F.expr(_SS_SPARK))
    )
    corrupted = f"""
      array_join(flatten(transform(bs, b -> CASE
        WHEN element_at(ss, CAST(b + 1 AS INT)) >= 0 THEN
          concat(
            slice(toks, CAST(b*{B} + 1 AS INT), CAST(element_at(ss, CAST(b + 1 AS INT)) AS INT)),
            array(concat('<extra_id_', CAST(b AS STRING), '>')),
            slice(toks,
                  CAST(b*{B} + element_at(ss, CAST(b + 1 AS INT)) + {L} + 1 AS INT),
                  CAST(least({B}, n - b*{B}) - element_at(ss, CAST(b + 1 AS INT)) - {L} AS INT)))
        ELSE slice(toks, CAST(b*{B} + 1 AS INT), CAST(least({B}, n - b*{B}) AS INT))
        END)), ' ')
    """
    targets = f"""
      array_join(flatten(transform(filter(bs, b -> element_at(ss, CAST(b + 1 AS INT)) >= 0),
        b -> concat(
          array(concat('<extra_id_', CAST(b AS STRING), '>')),
          slice(toks,
                CAST(b*{B} + element_at(ss, CAST(b + 1 AS INT)) + 1 AS INT),
                {L})))), ' ')
    """
    return docs.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(size(filter(bs, b -> element_at(ss, CAST(b + 1 AS INT)) >= 0)) AS BIGINT)"
        ).alias("n_spans"),
        F.expr(
            f"CAST(size(filter(bs, b -> element_at(ss, CAST(b + 1 AS INT)) >= 0)) * {L} AS BIGINT)"
        ).alias("n_masked"),
        F.expr(corrupted).alias("corrupted_text"),
        F.coalesce(F.expr(targets), F.lit("")).alias("targets_text"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# preference-pair construction (contrastive fine-tune data)
# --------------------------------------------------------------------------
# A DPO/RLHF-style trainer consumes (chosen, rejected) document pairs
# with a quality margin. Built model-free here: within each source,
# the top-PREF_K documents by an integer lexical-diversity score pair
# off rank-for-rank against the bottom-PREF_K (1st best vs 1st worst),
# the widest-margin matching that doesn't reuse documents. Pairs with
# a non-positive margin (score ties across the middle) are dropped —
# a tie teaches the reward model nothing.
#
# Score = unique-token ratio in integer parts-per-million: positive
# BIGINT division truncates identically in both engines, so the
# decision path is float-free end to end.
PREF_K = 5


@register(
    "preference_pair_build",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source, {LEX_SCORE_SQL} AS score FROM tok
    ),
    best AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id)
               AS r
      FROM scored
    ),
    worst AS (
      SELECT source, doc_id, score,
             row_number() OVER (PARTITION BY source ORDER BY score ASC, doc_id)
               AS r
      FROM scored
    )
    SELECT b.source, CAST(b.r AS BIGINT) AS pair_rank,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           b.score AS chosen_score, w.score AS rejected_score,
           b.score - w.score AS margin
    FROM best b JOIN worst w ON b.source = w.source AND b.r = w.r
    WHERE b.r <= {PREF_K} AND w.r <= {PREF_K}
      AND b.doc_id <> w.doc_id AND b.score > w.score
    ORDER BY b.source, pair_rank
    """,
)
def preference_pair_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chosen, rejected) preference pairs per source: rank-for-rank
    top-{PREF_K} vs bottom-{PREF_K} by integer lexical-diversity
    score, strict-positive margin.

    Plan: ONE narrow scoring projection (doc_id, source, score — no
    text) cached, two rank windows over it whose row_number ≤
    {PREF_K} filters become Partial WindowGroupLimits (each map
    partition forwards ≤ {PREF_K} rows per source per window), then a
    broadcast-sized equi-join of two {PREF_K}·|sources|-row relations.
    The corpus is scanned once; nothing text-sized survives the first
    projection."""
    docs = table(spark, sf_dir, "documents").withColumn("toks", _tokens())
    scored = tracked_cache(
        docs.select("doc_id", "source", lexical_diversity_ppm().alias("score"))
    )
    wb = Window.partitionBy("source").orderBy(F.desc("score"), "doc_id")
    ww = Window.partitionBy("source").orderBy(F.asc("score"), "doc_id")
    best = (
        scored.withColumn("r", F.row_number().over(wb)).filter(F.col("r") <= PREF_K)
    )
    worst = (
        scored.withColumn("r", F.row_number().over(ww)).filter(F.col("r") <= PREF_K)
    )
    return (
        best.alias("b")
        .join(
            F.broadcast(worst.alias("w")),
            (F.col("b.source") == F.col("w.source")) & (F.col("b.r") == F.col("w.r")),
        )
        .filter(
            (F.col("b.doc_id") != F.col("w.doc_id"))
            & (F.col("b.score") > F.col("w.score"))
        )
        .select(
            F.col("b.source").alias("source"),
            F.col("b.r").cast("bigint").alias("pair_rank"),
            F.col("b.doc_id").alias("chosen_id"),
            F.col("w.doc_id").alias("rejected_id"),
            F.col("b.score").alias("chosen_score"),
            F.col("w.score").alias("rejected_score"),
            (F.col("b.score") - F.col("w.score")).alias("margin"),
        )
        .orderBy("source", "pair_rank")
    )


# --------------------------------------------------------------------------
# session-dialog example assembly (behavioral-sequence training data)
# --------------------------------------------------------------------------
# Sequence models over user behavior (next-action prediction,
# session-intent classifiers) train on ORDERED per-session action
# strings. Assembly is the order-preserving group collect — the one
# aggregation shape where engines silently diverge unless the order
# key is pinned: both sides sort by (ts, event_id), exact microsecond
# epochs (the sessionize_users lesson — second-truncated timestamps
# split ±1 s gap ties differently per engine).
SESSION_GAP_US = 300_000_000


@register(
    "session_dialog_examples",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id))
                       > {SESSION_GAP_US} OR
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS dialog,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
             AS duration_us
    FROM sess GROUP BY user_id, session_id
    HAVING count(*) >= 2
    ORDER BY user_id, session_id
    """,
)
def session_dialog_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-session action strings ('view>click>purchase'),
    turn counts, and durations — sessions of at least 2 turns (a
    1-turn dialog teaches a sequence model nothing).

    Plan: the gaps-and-islands windows partition by user_id (bounded
    state per user, fully distributed), then ONE groupBy assembles the
    ordered turn array via sort_array(collect_list(struct(ts,
    event_id, event_type))) — the struct's leading fields ARE the
    order key, so ordering happens inside the aggregation buffer, not
    as a global sort. Nothing is collected; output is one row per
    session."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > SESSION_GAP_US)
    ).cast("int")
    running = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = ev.withColumn(
        "session_id", F.sum(new_session).over(running).cast("bigint")
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("dialog"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            .cast("bigint")
            .alias("duration_us"),
        )
        .filter(F.col("n_turns") >= 2)
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# per-source quality-score rank calibration (r8) — cross-domain
# comparable percentiles + a per-source quality floor
# --------------------------------------------------------------------------
CALIB_KEEP_PCT_MICRO = 400_000  # keep the top 60% of each source


@register(
    "quality_rank_calibration",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    scored AS (SELECT doc_id, source, {LEX_SCORE_SQL} AS score FROM tok),
    ranked AS (
      SELECT doc_id, source, score,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY score, doc_id) AS BIGINT) AS rnk,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      FROM scored
    ),
    pct AS (
      SELECT doc_id, source, score, rnk,
             CAST(CASE WHEN n_src > 1
                  THEN (rnk - 1) * 1000000 // (n_src - 1) ELSE 0 END
                  AS BIGINT) AS pct_micro
      FROM ranked
    )
    SELECT * FROM pct
    WHERE pct_micro >= {CALIB_KEEP_PCT_MICRO}
    ORDER BY doc_id
    """,
)
def quality_rank_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source RANK calibration of a quality score + quality floor:
    raw quality scores are not comparable across domains (a 'good'
    forum post scores below a mediocre encyclopedia article), so each
    source's scores are mapped to their within-source percentile
    (integer micro-units: (rank−1)·1e6 div (n−1)) and the corpus keeps
    every document at or above the {CALIB_KEEP_PCT_MICRO} µ floor —
    the per-dump percentile filtering recipe of FineWeb-style
    pipelines, with the shared ``lexical_diversity_ppm`` integer score
    standing in for the model-based scorer a deploy would plug in.

    Hash stability: score is the shared BIGINT-ppm lexical score;
    rank/percentile are pure integer window arithmetic with a total
    (score, doc_id) order — no floats anywhere.

    Plan: one shuffle on source, one within-partition sort for the
    rank window (per-source sort — the natural partitioning of a
    per-dump pipeline; a single pathologically large source would move
    to a two-level rank: range-partitioned pre-rank + offset merge).
    The count window shares the same exchange; the floor filter is
    evaluated map-side after the window."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    scored = docs.select(
        "doc_id",
        "source",
        lexical_diversity_ppm("(split(lower(trim(text)), '\\\\s+'))").alias("score"),
    )
    ws = Window.partitionBy("source")
    wr = ws.orderBy("score", "doc_id")
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(wr).cast("bigint").alias("rnk"),
        F.count("*").over(ws).cast("bigint").alias("n_src"),
    )
    pct = F.when(
        F.col("n_src") > 1,
        F.expr("(rnk - 1) * 1000000 DIV (n_src - 1)"),
    ).otherwise(F.lit(0)).cast("bigint")
    return (
        ranked.withColumn("pct_micro", pct)
        .filter(F.col("pct_micro") >= CALIB_KEEP_PCT_MICRO)
        .drop("n_src")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Fill-in-the-middle (FIM) transform (infilling-objective examples)
# --------------------------------------------------------------------------
# The standard code-pretraining transform: split each document into
# (prefix, middle, suffix) and re-serialize with sentinel tokens so an
# autoregressive model learns to infill. Two canonical orderings:
# PSM  <fim_prefix> prefix <fim_suffix> suffix <fim_middle> middle
# SPM  <fim_suffix> suffix <fim_prefix> prefix <fim_middle> middle
# As with t5_span_corruption, the split points and the PSM/SPM choice
# must be DETERMINISTIC (shard retries must rebuild byte-identical
# examples), so both come from the oracle-mirrored md5 primitive: with
# n whitespace tokens, i = H(doc:fa) % (n+1) and j = i + H(doc:fb) %
# (n-i+1) give 0 <= i <= j <= n (empty segments legal, as in the
# real transform), and H(doc:fm) % 2 picks the ordering ~50/50.
_FIM_H = (
    "pmod(CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':{salt}')), 1, 8), "
    "16, 10) AS BIGINT), {mod})"
)
_FIM_H_DUCK = (
    "CAST(CONCAT('0x', substr(md5(doc_id || ':{salt}'), 1, 8)) AS BIGINT) % ({mod})"
)


@register(
    "fim_transform",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n
      FROM documents
    ),
    split AS (
      SELECT doc_id, toks, n,
             {_FIM_H_DUCK.format(salt='fa', mod='n + 1')} AS i,
             {_FIM_H_DUCK.format(salt='fm', mod='2')} AS m
      FROM tok
    ),
    split2 AS (
      SELECT doc_id, toks, n, i, m,
             i + ({_FIM_H_DUCK.format(salt='fb', mod='n - i + 1')}) AS j
      FROM split
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(i AS BIGINT) AS split_i,
           CAST(j AS BIGINT) AS split_j,
           CASE WHEN m = 0 THEN 'PSM' ELSE 'SPM' END AS mode,
           array_to_string(CASE WHEN m = 0 THEN
             list_concat(list_concat(list_concat(list_concat(list_concat(
               ['<fim_prefix>'], list_slice(toks, 1, i)),
               ['<fim_suffix>']), list_slice(toks, j + 1, n)),
               ['<fim_middle>']), list_slice(toks, i + 1, j))
           ELSE
             list_concat(list_concat(list_concat(list_concat(list_concat(
               ['<fim_suffix>'], list_slice(toks, j + 1, n)),
               ['<fim_prefix>']), list_slice(toks, 1, i)),
               ['<fim_middle>']), list_slice(toks, i + 1, j))
           END, ' ') AS fim_text
    FROM split2 ORDER BY doc_id
    """,
)
def fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic FIM (fill-in-the-middle) examples per document:
    md5-derived split points, md5-derived PSM/SPM ordering, sentinel-
    joined re-serialization.

    Plan: pure per-row array algebra (tokenize once, two hash-derived
    integers, slice/concat/array_join) — ZERO shuffles before the
    presentation sort, zero Python, so the transform runs at parquet
    scan speed on any corpus size and rebuilds byte-identically on
    shard retry. The oracle restates every step 1:1 in DuckDB list
    algebra (list_slice is start..end inclusive; Spark slice is
    start+length — the two formulations are mirrored per segment)."""
    docs = (
        table(spark, sf_dir, "documents")
        .withColumn("toks", _tokens())
        .withColumn("n", F.size("toks"))
        .withColumn("i", F.expr(_FIM_H.format(salt="fa", mod="n + 1")))
        .withColumn("m", F.expr(_FIM_H.format(salt="fm", mod="2")))
        .withColumn("j", F.expr("i + " + _FIM_H.format(salt="fb", mod="n - i + 1")))
    )
    prefix = "slice(toks, 1, CAST(i AS INT))"
    middle = "slice(toks, CAST(i + 1 AS INT), CAST(j - i AS INT))"
    suffix = "slice(toks, CAST(j + 1 AS INT), CAST(n - j AS INT))"
    psm = (
        f"concat(array('<fim_prefix>'), {prefix}, array('<fim_suffix>'), "
        f"{suffix}, array('<fim_middle>'), {middle})"
    )
    spm = (
        f"concat(array('<fim_suffix>'), {suffix}, array('<fim_prefix>'), "
        f"{prefix}, array('<fim_middle>'), {middle})"
    )
    return docs.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.col("i").cast("bigint").alias("split_i"),
        F.col("j").cast("bigint").alias("split_j"),
        F.when(F.col("m") == 0, F.lit("PSM")).otherwise(F.lit("SPM")).alias("mode"),
        F.expr(
            f"array_join(CASE WHEN m = 0 THEN {psm} ELSE {spm} END, ' ')"
        ).alias("fim_text"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Weighted sampling without replacement (r10) — Efraimidis-Spirakis A-ES
# --------------------------------------------------------------------------
# THE distributed algorithm for "sample k docs per group, probability
# proportional to weight, in one pass": each item draws u ~ U(0,1]
# and keeps key = u^(1/w); the k largest keys per group are exactly a
# weighted sample without replacement (Efraimidis & Spirakis 2006).
# Here u is md5-derived (shard-retry deterministic, the repo's
# sampling convention), the key is compared in log space
# (ln(u)/w — monotone in u^(1/w)), and both the ORDERING and the
# surfaced key are the integer-quantized micro-nats value, so the
# per-group top-k is decided by exact BIGINT comparisons on both
# engines — no raw-double ordering anywhere.
WES_PER_GROUP = 5


@register(
    "weighted_sample_es",
    oracle=f"""
    WITH w AS (
      SELECT source, doc_id,
             CAST(n_chars AS BIGINT) AS wt,
             CAST(floor(ln(
               (CAST(CONCAT('0x', substr(md5(doc_id || ':ws'), 1, 8)) AS BIGINT)
                + 1) / 4294967296.0) / n_chars * 1000000) AS BIGINT) AS micro_key
      FROM documents WHERE n_chars > 0
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY micro_key DESC, doc_id) AS rnk
      FROM w
    )
    SELECT source, doc_id, wt, micro_key, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {WES_PER_GROUP}
    ORDER BY source, rnk
    """,
)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample without replacement: top-
    {WES_PER_GROUP} documents by the A-ES key, weight = n_chars (long
    documents proportionally likelier — the standard length-weighted
    corpus subsample).

    Plan: per-row hash/ln/quantize (codegen) → ONE window shuffle on
    source → filter rnk ≤ k → presentation sort. At 100 TB the window
    state per group is O(rows-in-group) streamed, and a heavy-hitter
    group is still one partition's sort — for extreme cardinality the
    same key feeds a groupBy-TopK (partial aggregation) instead; the
    algorithm (and this key column) is unchanged."""
    docs = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h32 = (
        "CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), ':ws')), 1, 8), "
        "16, 10) AS BIGINT)"
    )
    micro_key = F.expr(
        f"CAST(floor(ln(({h32} + 1) / 4294967296.0) / n_chars * 1000000) AS BIGINT)"
    )
    w = docs.select(
        "source", "doc_id",
        F.col("n_chars").cast("bigint").alias("wt"),
        micro_key.alias("micro_key"),
    )
    win = Window.partitionBy("source").orderBy(
        F.col("micro_key").desc(), F.col("doc_id")
    )
    return (
        w.withColumn("rnk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rnk") <= WES_PER_GROUP)
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# r11: best-of-n rejection sampling (RLHF-pipeline response selection)
# ---------------------------------------------------------------------------
BON_GROUPS = 100  # synthetic prompt grouping: doc_id % BON_GROUPS


@register(
    "rejection_sample_best_of_n",
    oracle=f"""
    WITH cand AS (
      SELECT doc_id % {BON_GROUPS} AS prompt_id, doc_id,
             CAST(len(regexp_extract_all(lower(text), '[a-z]')) AS DOUBLE)
               / greatest(n_chars, 1) AS score  -- raw integer-ratio division
      FROM documents
    ), ranked AS (
      SELECT prompt_id, doc_id, score,
             row_number() OVER (
               PARTITION BY prompt_id ORDER BY score DESC, doc_id ASC
             ) AS rk,
             count(*) OVER (PARTITION BY prompt_id) AS n_candidates
      FROM cand
    )
    SELECT prompt_id, doc_id AS chosen_doc_id, score, n_candidates
    FROM ranked WHERE rk = 1 ORDER BY prompt_id
    """,
)
def rejection_sample_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection sampling: per prompt group, keep the single
    highest-scoring candidate (deterministic doc_id tie-break) — the
    selection step of a rejection-sampling / RAFT-style fine-tuning
    pipeline (public: Dong et al. 2023, "RAFT: Reward rAnked
    FineTuning"). Candidates here are documents bucketed into
    ``doc_id % BON_GROUPS`` prompt groups with an alpha-density score
    standing in for the reward model (a real run swaps in an RM score
    column; the plan is identical). ONE window partitioned by
    prompt_id — at 100 TB each prompt's candidate set is one task's
    worth of work, never a global sort; no UDFs."""
    docs = table(spark, sf_dir, "documents")
    cand = docs.select(
        (F.col("doc_id") % BON_GROUPS).alias("prompt_id"),
        "doc_id",
        (
            F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
            .cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("score"),
    )
    w = Window.partitionBy("prompt_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    # candidate counts as a separate map-side-combined aggregate
    # joined back broadcast: sharing the rank window with an unbounded
    # count() window would defeat the Partial WindowGroupLimit (each
    # map partition must forward at most ONE candidate per prompt)
    n_cand = cand.groupBy("prompt_id").agg(
        F.count("*").cast("bigint").alias("n_candidates")
    )
    ranked = cand.select(
        "prompt_id", "doc_id", "score", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .join(F.broadcast(n_cand), "prompt_id")
        .select(
            "prompt_id",
            F.col("doc_id").alias("chosen_doc_id"),
            # raw integer-ratio double division — bit-stable on both
            # engines; round() on doubles is the banned coin flip
            "score",
            "n_candidates",
        )
        .orderBy("prompt_id")
    )
