"""PII detection / redaction operators — the anonymization pass a
training-data pipeline runs before text leaves the curation boundary.

The fixtures carry no real PII columns, so the operator first
SYNTHESIZES a deterministic contact blob per customer (same derivation
on both engines — it is ground truth, not the thing under test) and
then runs the real detection/redaction regexes over it: email, phone,
IPv4. Everything is built-in string/regexp expressions: a map-only,
codegen'd, shuffle-free pass at any corpus size.

The regexes stay inside the Java-regex ∩ RE2 common subset (explicit
classes and counted repetition, no lookaround, no \\b) so Spark and
DuckDB match identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table, tracked_cache

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{4}"
IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

# Deterministic synthetic contact blob: every 3rd customer gets a phone
# number; everyone gets an email and a client IP.
_BLOB_SQL = """
  c_name || ' <user' || c_custkey || '@example.com> '
  || CASE WHEN c_custkey % 3 = 0
          THEN 'tel 555-' || lpad((c_custkey * 7 % 10000)::VARCHAR, 4, '0') || ' '
          ELSE '' END
  || 'ip 10.' || (c_custkey % 256)::VARCHAR || '.' || (c_custkey * 3 % 256)::VARCHAR || '.7'
"""


def _blob() -> F.Column:
    key = F.col("c_custkey")
    return F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        key.cast("string"),
        F.lit("@example.com> "),
        F.when(
            key % 3 == 0,
            F.concat(
                F.lit("tel 555-"),
                F.lpad((key * 7 % 10000).cast("string"), 4, "0"),
                F.lit(" "),
            ),
        ).otherwise(F.lit("")),
        F.lit("ip 10."),
        (key % 256).cast("string"),
        F.lit("."),
        (key * 3 % 256).cast("string"),
        F.lit(".7"),
    )


@register(
    "pii_redact_customers",
    oracle=f"""
    WITH blob AS (
      SELECT c_custkey, c_name, {_BLOB_SQL} AS contact FROM customer
    )
    SELECT c_custkey,
           md5(c_name) AS name_pseudonym,
           len(regexp_extract_all(contact, '{EMAIL_RE}')) AS emails_found,
           len(regexp_extract_all(contact, '{PHONE_RE}')) AS phones_found,
           len(regexp_extract_all(contact, '{IPV4_RE}')) AS ips_found,
           regexp_replace(regexp_replace(regexp_replace(contact,
             '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IPV4_RE}', '<IP>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM blob ORDER BY c_custkey
    """,
)
def pii_redact_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction: count and strip emails, phone numbers,
    and IPv4 addresses; pseudonymize names with a stable hash (joins
    still work across redacted datasets — deterministic and replayable,
    unlike random tokens). The redaction order (email → ip → phone)
    matters and is pinned on both sides: the phone pattern is a
    substring of longer digit runs inside IPs."""
    cust = table(spark, sf_dir, "customer").withColumn("contact", _blob())
    return cust.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_pseudonym"),
        F.size(F.regexp_extract_all("contact", F.lit(EMAIL_RE), 0)).alias("emails_found"),
        F.size(F.regexp_extract_all("contact", F.lit(PHONE_RE), 0)).alias("phones_found"),
        F.size(F.regexp_extract_all("contact", F.lit(IPV4_RE), 0)).alias("ips_found"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("contact", EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
            ),
            PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# corpus-wide PII audit over documents
# --------------------------------------------------------------------------
# The fixture text is PII-free, so the scan query PLANTS deterministic
# PII into overlapping corpus slices (the planted-fixture move —
# dedup.plant_duplicates): ~1/9 of docs get an email, ~1/6 a phone,
# ~1/15 an IP; the overlaps produce docs with 0, 1, 2, or 3 PII kinds,
# so the per-source rollup is non-vacuous and both engines must agree
# on the SAME planted input.
_EMAIL_MOD = 9
_PHONE_MOD = 6
_IP_MOD = 15


def _plant_pii() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % _EMAIL_MOD == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % _PHONE_MOD == 0,
            F.concat(F.lit(" call 555-"), F.lpad((did * 13 % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            did % _IP_MOD == 0,
            F.concat(
                F.lit(" from 172."),
                (did % 32).cast("string"),
                F.lit("."),
                (did * 5 % 256).cast("string"),
                F.lit(".9"),
            ),
        ).otherwise(F.lit("")),
    )


_PLANT_PII_SQL = f"""
  text
  || CASE WHEN doc_id % {_EMAIL_MOD} = 0
          THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END
  || CASE WHEN doc_id % {_PHONE_MOD} = 0
          THEN ' call 555-' || lpad((doc_id * 13 % 10000)::VARCHAR, 4, '0') ELSE '' END
  || CASE WHEN doc_id % {_IP_MOD} = 0
          THEN ' from 172.' || (doc_id % 32)::VARCHAR || '.'
               || (doc_id * 5 % 256)::VARCHAR || '.9' ELSE '' END
"""


@register(
    "pii_scan_documents",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, source, {_PLANT_PII_SQL} AS text FROM documents
    ),
    per_doc AS (
      SELECT source,
             len(regexp_extract_all(text, '{EMAIL_RE}')) AS e,
             len(regexp_extract_all(text, '{PHONE_RE}')) AS p,
             len(regexp_extract_all(text, '{IPV4_RE}')) AS i
      FROM planted
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_scanned,
           CAST(sum(CASE WHEN e + p + i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(sum(e) AS BIGINT) AS emails,
           CAST(sum(p) AS BIGINT) AS phones,
           CAST(sum(i) AS BIGINT) AS ips
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def pii_scan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide PII audit: per-source counts of documents scanned,
    documents carrying any PII, and total email/phone/IP hits — the
    release-gate report a curation pipeline publishes before text
    leaves the boundary (redaction itself is the sibling
    ``pii_redact_customers`` shape applied per row).

    Map-only regex counting (whole-stage codegen) followed by ONE
    map-side-combined groupBy on ``source`` (tens of keys) — the
    aggregate state is O(sources), so the plan is a linear scan at any
    corpus size with a trivial final shuffle."""
    docs = table(spark, sf_dir, "documents").withColumn("text", _plant_pii())
    per_doc = docs.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0)).alias("e"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0)).alias("p"),
        F.size(F.regexp_extract_all("text", F.lit(IPV4_RE), 0)).alias("i"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("docs_scanned"),
            F.sum(((F.col("e") + F.col("p") + F.col("i")) > 0).cast("int"))
            .cast("bigint")
            .alias("docs_with_pii"),
            F.sum("e").cast("bigint").alias("emails"),
            F.sum("p").cast("bigint").alias("phones"),
            F.sum("i").cast("bigint").alias("ips"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# memorization-canary scan
# --------------------------------------------------------------------------
# The extraction-attack hygiene check a training pipeline runs before
# shipping a corpus: K known canary strings (secrets seeded into
# upstream systems to detect leakage into training data) are scanned
# for verbatim occurrence. The canary table is tiny BY DEFINITION, so
# the scan is a broadcast contains() pass over the corpus — map-only,
# no shuffle of the big side at any corpus size. The fixture corpus
# contains no canaries, so the gate PLANTS them into ~1/{_CANARY_MOD}
# of docs (two of the four canaries never planted — the zero rows
# prove absence is reported, not just presence).
_CANARY_MOD = 16  # divides gen_sf.STRIDE=10^8; 16 mod 20 spreads over 5 sources
CANARIES = (
    "canary-7f3a1c9e-credential",
    "canary-2b8d4e01-apikey",
    "canary-ffa0c355-never-planted",
    "canary-91e7b2d6-also-never-planted",
)
_CANARY_SQL = ", ".join(f"('{c}')" for c in CANARIES)


@register(
    "canary_extraction_scan",
    oracle=f"""
    WITH docs_c AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {_CANARY_MOD} = 0 THEN
               text || ' ' ||
               CASE WHEN doc_id % {_CANARY_MOD * 2} = 0
                    THEN 'canary-7f3a1c9e-credential'
                    ELSE 'canary-2b8d4e01-apikey' END
             ELSE text END AS text
      FROM documents
    ),
    canaries(canary) AS (VALUES {_CANARY_SQL})
    SELECT c.canary,
           CAST(count(d.doc_id) AS BIGINT) AS n_docs_hit,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources_hit,
           COALESCE(min(d.doc_id), -1) AS first_doc_id
    FROM canaries c
    LEFT JOIN docs_c d ON contains(d.text, c.canary)
    GROUP BY c.canary ORDER BY c.canary
    """,
)
def canary_extraction_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-canary verbatim-occurrence report: documents hit, sources
    hit, first document id (-1 when the canary is absent — the absent
    rows are the point, a leak scanner that only reports hits can't
    prove it ran).

    Plan: the canary table is broadcast (K rows by definition) into a
    contains() theta-join; the corpus streams map-side with NO
    exchange before the K-row aggregate. Never-planted canaries pin
    the LEFT JOIN's absence semantics in both engines."""
    docs = table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % _CANARY_MOD == 0,
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.when(
                    F.col("doc_id") % (_CANARY_MOD * 2) == 0, F.lit(CANARIES[0])
                ).otherwise(F.lit(CANARIES[1])),
            ),
        ).otherwise(F.col("text")),
    )
    canaries = spark.createDataFrame([(c,) for c in CANARIES], ["canary"])
    return (
        planted.join(
            F.broadcast(canaries),
            F.col("text").contains(F.col("canary")),
            "right",
        )
        .groupBy("canary")
        .agg(
            F.count("doc_id").cast("bigint").alias("n_docs_hit"),
            F.countDistinct("source").cast("bigint").alias("n_sources_hit"),
            F.coalesce(F.min("doc_id"), F.lit(-1)).alias("first_doc_id"),
        )
        .orderBy("canary")
    )


# ---------------------------------------------------------------------------
# k-anonymity report (r9): the re-identification audit a curation
# pass runs before releasing structured records — every equivalence
# class over the quasi-identifiers must hold at least K records, or
# its members are re-identifiable by joining the quasi-IDs against an
# external dataset (Sweeney's k-anonymity, public literature).
# ---------------------------------------------------------------------------
K_ANON = 8  # splits the fixture: sizes 5..21 ⇒ both verdicts populate


@register(
    "privacy_k_anonymity_report",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment, count(*) AS class_size
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(class_size AS BIGINT) AS class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(class_size * count(*) AS BIGINT) AS n_records,
           CAST(CASE WHEN class_size < {K_ANON} THEN 1 ELSE 0 END AS INT)
             AS violates_k
    FROM classes GROUP BY class_size ORDER BY class_size
    """,
)
def privacy_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class-size histogram over the quasi-identifier
    tuple (nation, market segment) with a per-size K=8 verdict —
    the data-card panel deciding whether a release needs coarsening
    (generalize a quasi-ID) or suppression (drop the small classes).

    Plan: two map-side-combined groupBys (quasi-IDs → class size,
    then size → histogram), same shape as the dedup cluster-size
    data card — one small shuffle keyed on the quasi-IDs, one
    histogram-sized one; nothing windowed, collected, or broadcast,
    so the audit costs two cheap exchanges at any corpus size."""
    classes = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("class_size"))
    )
    return (
        classes.groupBy("class_size")
        .agg(F.count("*").cast("bigint").alias("n_classes"))
        .select(
            F.col("class_size").cast("bigint").alias("class_size"),
            "n_classes",
            (F.col("class_size") * F.col("n_classes")).cast("bigint").alias("n_records"),
            (F.col("class_size") < K_ANON).cast("int").alias("violates_k"),
        )
        .orderBy("class_size")
    )


# l-diversity (the k-anonymity companion): a class can satisfy k yet
# leak the sensitive attribute when all its members SHARE the value
# (homogeneity attack) — each quasi-ID class must hold ≥ L distinct
# sensitive values (Machanavajjhala et al., public literature). The
# sensitive attribute here is the account-balance band; floor(x/2000)
# is one IEEE division + floor, bit-identical across engines.
L_DIV = 5  # fixture classes span l = 3..6 ⇒ both verdicts populate


@register(
    "privacy_l_diversity_report",
    oracle=f"""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS l,
             count(*) AS class_size
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(l AS BIGINT) AS l,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_records,
           CAST(CASE WHEN l < {L_DIV} THEN 1 ELSE 0 END AS INT) AS violates_l
    FROM classes GROUP BY l ORDER BY l
    """,
)
def privacy_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-sensitive-value (l) histogram per quasi-ID class with
    a per-l L=5 verdict — run together with
    ``privacy_k_anonymity_report`` before releasing structured
    records: k bounds re-identification, l bounds attribute
    disclosure. Plan: one distinct-aggregate groupBy over the
    quasi-IDs (Spark expands it to a two-phase partial/final pair,
    map-side combined) + one histogram-sized groupBy."""
    classes = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.countDistinct(
                F.floor(F.col("c_acctbal") / 2000).cast("bigint")
            ).alias("l"),
            F.count("*").alias("class_size"),
        )
    )
    return (
        classes.groupBy("l")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_records"),
        )
        .select(
            F.col("l").cast("bigint").alias("l"),
            "n_classes",
            "n_records",
            (F.col("l") < L_DIV).cast("int").alias("violates_l"),
        )
        .orderBy("l")
    )


# t-closeness (the trio's third leg): a class can satisfy k AND l yet
# still leak — when its sensitive-value DISTRIBUTION diverges from the
# corpus-wide one, observing the class updates an attacker's prior
# (skewness attack). Each quasi-ID class's distribution must stay
# within distance T of the global distribution (Li, Li &
# Venkatasubramanian, ICDE'07, public literature); for a categorical
# sensitive attribute the distance is total variation:
#   TVD(c) = ½ Σ_s |n_cs/n_c − N_s/N|
# Everything below stays in EXACT integers: the per-class audit emits
# the TVD as a numerator/denominator pair (cross-multiplied, absent
# sensitive values folded in via N − Σ_present N_s), and the verdict
# compares 2·num > n_c·N ⟺ TVD > 1/4 — no float division anywhere,
# so Spark and DuckDB agree bit-for-bit by construction.
T_CLOSE_NUM, T_CLOSE_DEN = 1, 4  # T = 0.25 splits the fixture:
#                                  sf0.01 classes span TVD 0.06..0.58


@register(
    "privacy_t_closeness_report",
    oracle=f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 2000) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_cs
      FROM customer GROUP BY 1, 2, 3
    ),
    gl AS (SELECT s, CAST(sum(n_cs) AS BIGINT) AS n_s FROM cls GROUP BY s),
    tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n FROM gl),
    nc AS (
      SELECT c_nationkey, c_mktsegment, CAST(sum(n_cs) AS BIGINT) AS n_c
      FROM cls GROUP BY 1, 2
    ),
    per AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             sum(abs(c.n_cs * t.n - g.n_s * x.n_c)) AS present,
             sum(g.n_s) AS present_ns,
             any_value(x.n_c) AS n_c, any_value(t.n) AS n
      FROM cls c JOIN gl g USING (s)
                 JOIN nc x USING (c_nationkey, c_mktsegment), tot t
      GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(n_c AS BIGINT) AS class_size,
           CAST(present + (n - present_ns) * n_c AS BIGINT) AS tvd_num,
           CAST(2 * n_c * n AS BIGINT) AS tvd_den,
           CAST(CASE WHEN {T_CLOSE_DEN} * (present + (n - present_ns) * n_c)
                          > {2 * T_CLOSE_NUM} * n_c * n
                THEN 1 ELSE 0 END AS INT) AS violates_t
    FROM per ORDER BY c_nationkey, c_mktsegment
    """,
)
def privacy_t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class total-variation distance between the class's
    sensitive-value distribution and the corpus-wide one, with a
    T=1/4 verdict — run as the third audit next to
    ``privacy_k_anonymity_report`` (re-identification) and
    ``privacy_l_diversity_report`` (homogeneity): t-closeness bounds
    the skewness attack l-diversity misses.

    Plan: ONE corpus-sized pass — the (quasi-ID, sensitive) groupBy —
    then everything else re-aggregates that class×band relation
    (|classes|·|bands| rows: the global marginal, the total, the class
    sizes), joined back broadcast-small. The absent-value TVD terms
    (a band the class never hits still contributes N_s·n_c) fold in
    arithmetically via (N − Σ_present N_s)·n_c instead of a dense
    class×band grid. At 100 TB the audit costs one map-side-combined
    shuffle on (quasi-IDs, band) plus tiny-relation joins."""
    cls = (
        table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("s"),
        )
        .agg(F.count("*").cast("bigint").alias("n_cs"))
    )
    cls = tracked_cache(cls)
    gl = cls.groupBy("s").agg(F.sum("n_cs").alias("n_s"))
    tot = gl.agg(F.sum("n_s").alias("n"))
    nc = cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_cs").alias("n_c")
    )
    per = (
        cls.join(F.broadcast(gl), "s")
        .join(F.broadcast(nc), ["c_nationkey", "c_mktsegment"])
        .join(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum(F.abs(F.col("n_cs") * F.col("n") - F.col("n_s") * F.col("n_c")))
            .alias("present"),
            F.sum("n_s").alias("present_ns"),
            F.first("n_c").alias("n_c"),
            F.first("n").alias("n"),
        )
    )
    tvd_num = F.col("present") + (F.col("n") - F.col("present_ns")) * F.col("n_c")
    return per.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_c").cast("bigint").alias("class_size"),
        tvd_num.cast("bigint").alias("tvd_num"),
        (2 * F.col("n_c") * F.col("n")).cast("bigint").alias("tvd_den"),
        (
            T_CLOSE_DEN * tvd_num > 2 * T_CLOSE_NUM * F.col("n_c") * F.col("n")
        )
        .cast("int")
        .alias("violates_t"),
    ).orderBy("c_nationkey", "c_mktsegment")


# --------------------------------------------------------------------------
# Luhn-validated card-number detection (r10) — checksum-gated PII
# --------------------------------------------------------------------------
# Pattern-only card detection drowns in false positives (order ids,
# timestamps, phone numbers all match \d{13,19}); production scanners
# gate on the Luhn checksum (ISO/IEC 7812), which rejects ~90% of
# random digit strings. The checksum is pure digit arithmetic —
# double every second digit from the right, subtract 9 when > 9, sum
# ≡ 0 (mod 10) — expressible as an aggregate over the digit array on
# both engines, so the whole detector stays JVM-side Column ops.
# The plant injects one VALID card (real check digit computed from the
# doc's own digits) into every %4==0 document and one INVALID card
# (same body, check digit +5 mod 10 — never accidentally valid) into
# every %4==1 document.
_LUHN_BODY = "lpad(CAST(doc_id * 7919 % 1000000000000000 AS STRING), 15, '0')"
_LUHN_BODY_DUCK = "lpad((doc_id * 7919 % 1000000000000000)::VARCHAR, 15, '0')"

# Luhn sum of a DIGIT-STRING column expression (Spark SQL): positions
# counted from the RIGHT of body || check; for a 15-digit body the
# check digit is position 1 (never doubled), body digit i (1-based
# from left) sits at even distance -> doubled when (16 - i) is even.
def _luhn_sum_spark(expr: str) -> str:
    return (
        f"aggregate(transform(split(reverse({expr}), ''), "
        "(d, i) -> CASE WHEN i % 2 = 1 THEN "
        "  CASE WHEN CAST(d AS INT) * 2 > 9 THEN CAST(d AS INT) * 2 - 9 "
        "       ELSE CAST(d AS INT) * 2 END "
        "ELSE CAST(d AS INT) END), 0, (acc, x) -> acc + x)"
    )


def _luhn_sum_duck(expr: str) -> str:
    return (
        f"list_sum(list_transform(string_split(reverse({expr}), ''), "
        "(d, i) -> CASE WHEN i % 2 = 0 THEN "
        "  CASE WHEN d::INT * 2 > 9 THEN d::INT * 2 - 9 ELSE d::INT * 2 END "
        "ELSE d::INT END))"
    )


@register(
    "pii_luhn_cards",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN text || ' card ' || {_LUHN_BODY_DUCK} ||
                 ((10 - ({_luhn_sum_duck(_LUHN_BODY_DUCK + " || '0'")}) % 10) % 10)::VARCHAR
               WHEN 1 THEN text || ' ref ' || {_LUHN_BODY_DUCK} ||
                 (((10 - ({_luhn_sum_duck(_LUHN_BODY_DUCK + " || '0'")}) % 10) % 10 + 5) % 10)::VARCHAR
               ELSE text END AS text
      FROM documents
    ),
    cands AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '[0-9]{{13,19}}') AS cands
      FROM planted
    ),
    judged AS (
      SELECT doc_id, text, cands,
             list_filter(cands, c -> ({_luhn_sum_duck('c')}) % 10 = 0) AS valid
      FROM cands
    )
    SELECT doc_id,
           CAST(len(cands) AS BIGINT) AS n_candidates,
           CAST(len(valid) AS BIGINT) AS n_valid_cards,
           CASE WHEN len(valid) > 0
                THEN replace(text, valid[1], '<CARD>') ELSE text END AS redacted
    FROM judged ORDER BY doc_id
    """,
)
def pii_luhn_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Card-number PII scan with checksum validation: extract 13-19
    digit candidates, keep only Luhn-valid ones, redact them. On the
    plant, %4==0 docs yield exactly one valid card (redacted), %4==1
    docs yield one candidate that FAILS the checksum (kept — the false
    positive a pattern-only scanner would have redacted), others none.

    Plan: map-only regexp + digit-array arithmetic (codegen; the Luhn
    fold is a higher-order aggregate over ≤19 ints) + presentation
    sort — zero shuffles, zero Python, scan-speed at any corpus
    size."""
    body = _LUHN_BODY
    body_plus_zero = f"concat({body}, '0')"
    check = f"((10 - ({_luhn_sum_spark(body_plus_zero)}) % 10) % 10)"
    planted_text = (
        f"CASE doc_id % 4 "
        f"WHEN 0 THEN concat(text, ' card ', {body}, CAST({check} AS STRING)) "
        f"WHEN 1 THEN concat(text, ' ref ', {body}, "
        f"  CAST(({check} + 5) % 10 AS STRING)) "
        f"ELSE text END"
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(planted_text).alias("text")
    )
    judged = docs.select(
        "doc_id",
        "text",
        F.expr("regexp_extract_all(text, '[0-9]{13,19}', 0)").alias("cands"),
    ).withColumn(
        "valid",
        F.expr(f"filter(cands, c -> ({_luhn_sum_spark('c')}) % 10 = 0)"),
    )
    return judged.select(
        "doc_id",
        F.size("cands").cast("bigint").alias("n_candidates"),
        F.size("valid").cast("bigint").alias("n_valid_cards"),
        F.when(
            F.size("valid") > 0,
            F.expr("replace(text, valid[0], '<CARD>')"),
        )
        .otherwise(F.col("text"))
        .alias("redacted"),
    ).orderBy("doc_id")
