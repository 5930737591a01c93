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

from ..plans import register, table

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
