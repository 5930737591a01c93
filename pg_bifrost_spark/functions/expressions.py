"""Reusable Column helpers — the reference's scalar-function surface
(SURVEY.md §2.9), all JVM-side built-ins.

| helper            | reference                                    |
|--------------------|----------------------------------------------|
| lsn_hex            | "%X/%X" LSN (marshaller.go:312-317)          |
| crc32_bucket       | QuickHash crc32%n (utils/utils.go:31-35)     |
| rfc3339_from_ms    | RFC3339 time (marshaller.go:304-310)         |
| s3_object_key      | time-partitioned key (s3/transporter.go:240) |
| rabbit_routing_key | "{table}.{operation}" (rabbitmq:310-316)     |
| unescape_quotes    | '' → ' (parselogical.go:233)                 |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..cdc.marshaller import lsn_hex_expr as lsn_hex  # noqa: F401  (re-export)
from ..cdc.marshaller import time_rfc3339_expr as rfc3339_from_ms  # noqa: F401


def crc32_bucket(col: Column, buckets: int) -> Column:
    return F.pmod(F.crc32(col), F.lit(buckets))


def rabbit_routing_key(table: Column, operation: Column) -> Column:
    return F.concat_ws(".", table, operation)


def unescape_quotes(col: Column) -> Column:
    return F.regexp_replace(col, "''", "'")


def s3_object_key(keyspace: str, ts: Column, first_wal_start: Column) -> Column:
    """``keyspace/yyyy/mm/dd/hh/yyyyMMddHHmmss_<firstWalStart>``
    (gzip suffix added by the writer) — utils/time.go:49-64."""
    return F.concat(
        F.lit(keyspace + "/"),
        F.date_format(ts, "yyyy/MM/dd/HH/"),
        F.date_format(ts, "yyyyMMddHHmmss"),
        F.lit("_"),
        first_wal_start.cast("string"),
    )
