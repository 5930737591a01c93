"""Mojibake repair: the U+FFFD guard and byte-exactness (the planted
round trip is hash-gated by tests/test_oracle.py)."""

from pyspark.sql import functions as F

from pg_bifrost_spark.operators.cleaning import mojibake_fix_expr


def _run(spark, s: str) -> tuple[bool, str]:
    fix, cand = mojibake_fix_expr(F.col("s"))
    row = (
        spark.createDataFrame([(s,)], "s string")
        .select(fix.alias("f"), F.when(fix, cand).otherwise(F.col("s")).alias("r"))
        .collect()[0]
    )
    return bool(row["f"]), row["r"]


def test_repairs_real_double_encoding(spark):
    orig = "café №42 — naïve"
    moji = orig.encode("utf-8").decode("iso-8859-1")
    assert _run(spark, moji) == (True, orig)


def test_legit_latin1_accents_left_untouched(spark):
    """'â' as REAL text: its lone 0xE2 byte is an invalid UTF-8 lead,
    so the validity guard refuses — an overeager fixer would corrupt
    every French/Portuguese document."""
    s = "le château de Glués â la mode"
    assert _run(spark, s) == (False, s)


def test_suspicious_text_with_supra_latin1_chars_survives(spark):
    """A clean doc containing BOTH 'â' and a char > U+00FF ('№'): the
    Latin-1-representability guard must refuse BEFORE encode — Spark
    4's ANSI encode raises MALFORMED_CHARACTER_CODING otherwise, which
    would kill the whole job on one legitimate document."""
    s = "â naïve doc with № sign"
    assert _run(spark, s) == (False, s)


def test_plain_ascii_untouched(spark):
    s = "nothing suspicious here"
    assert _run(spark, s) == (False, s)
