"""Query registry: every operator the engine claims is registered here
as a (Spark builder, DuckDB oracle SQL) pair. The driver's correctness
gate runs both sides at sf0.01 and hash-compares.

Conventions (critical for the hash compare):
  * alias every computed column identically in Spark and SQL;
  * ROUND floating aggregates on BOTH sides (sum order differs between
    engines; bitwise-equal doubles are not guaranteed);
  * session timezone is UTC on the Spark side, DuckDB is naive-UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a query builder; ``oracle`` is DuckDB SQL over views
    named after the parquet tables, or None for non-SQL-expressible
    operators (driver then records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _ensure_session_conf(spark: SparkSession) -> None:
    """Queries must behave identically under ANY caller-provided
    session (the correctness driver builds its own): pin the two confs
    our plans depend on — UTC (oracle comparisons are naive-UTC) and
    nanos-as-long (the events fixture stores TIMESTAMP(NANOS), which
    the parquet reader otherwise rejects). Both are runtime-settable."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts was read as long nanos (nanosAsLong). Convert to a real
        # timestamp at microsecond precision — integer division, a
        # double round-trip would lose precision at 1e18 nanos.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all() -> None:
    """Import every module that registers queries."""
    from . import tpch, tpch2, tpch3, tpch4, events, functions_suite, windows_suite  # noqa: F401
    from . import cdc_bridge  # noqa: F401
    from ..operators import (  # noqa: F401
        cleaning,
        curation,
        dedup,
        joins,
        multimodal,
        similarity,
        text,
    )
