"""Text cleaning/normalization operators — the remaining standard
pretraining-corpus transforms: whitespace collapse, markup stripping,
PII-pattern redaction, boilerplate-line detection. All single-pass
``regexp_replace`` chains (JVM, codegen'd) with DuckDB oracles proving
formula equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table

# RE2/Java-compatible patterns (no backreferences, no lookaround)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
TAG_RE = r"<[^>]{1,100}>"
WS_RE = r"\s+"


def clean_text_expr(col) -> F.Column:
    """strip markup → redact emails/URLs → collapse whitespace → trim.
    Order matters and is pinned by the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, TAG_RE, " ")
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, URL_RE, "<URL>")
    c = F.trim(F.regexp_replace(c, WS_RE, " "))
    return c


@register(
    "text_clean_normalize",
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{TAG_RE}', ' ', 'g'),
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{WS_RE}', ' ', 'g')) AS cleaned,
           length(text) - length(trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{TAG_RE}', ' ', 'g'),
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{WS_RE}', ' ', 'g'))) AS bytes_removed
    FROM documents ORDER BY doc_id
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning chain over every document + how much it removed
    (the corpus-shrinkage accounting a data build reports)."""
    docs = table(spark, sf_dir, "documents")
    cleaned = clean_text_expr("text")
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (F.length("text") - F.length(cleaned)).alias("bytes_removed"),
    ).orderBy("doc_id")


@register(
    "boilerplate_line_stats",
    oracle="""
    WITH lines AS (
      SELECT doc_id, unnest(string_split(text, '.')) AS line FROM documents
    ), counted AS (
      SELECT trim(line) AS l, count(*) AS df, count(DISTINCT doc_id) AS docs
      FROM lines WHERE trim(line) <> '' GROUP BY 1
    )
    SELECT count(*) AS n_lines,
           count(CASE WHEN docs >= 10 THEN 1 END) AS boilerplate_lines,
           max(docs) AS max_doc_freq
    FROM counted
    """,
)
def boilerplate_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection by line-level document frequency (the
    dedup trick for headers/footers/navigation): '.'-separated
    segments that recur across ≥10 documents. One explode + one
    groupBy; at 100 TB the count is a map-side-combined agg over the
    segment hash."""
    docs = table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\.")).alias("line")
    ).select("doc_id", F.trim("line").alias("l")).filter(F.col("l") != "")
    counted = lines.groupBy("l").agg(
        F.count("*").alias("df"), F.countDistinct("doc_id").alias("docs")
    )
    return counted.agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("docs") >= 10, 1)).alias("boilerplate_lines"),
        F.max("docs").alias("max_doc_freq"),
    )
