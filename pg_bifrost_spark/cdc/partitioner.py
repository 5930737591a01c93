"""Partition-key assignment — reference ``partitioner/partitioner.go:109-166``.

Methods (enum at ``partitioner/partitioner.go:30-46``):
  none               → ""
  tablename          → relation
  transaction        → txn id (xid)
  transaction-bucket → crc32_ieee(xid) % buckets   (utils/utils.go:31-35)

Spark's built-in ``crc32`` is the same CRC-32/IEEE over UTF-8 bytes, so
``pmod(crc32(xid), n)`` reproduces the reference's bucket placement
bit-for-bit. One ``withColumn`` — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARTITION_METHODS = ("none", "tablename", "transaction", "transaction-bucket")


def partition_key_expr(
    method: str,
    buckets: int = 1,
    relation_col: str = "relation",
    txn_col: str = "txn_id",
) -> Column:
    if method == "none":
        return F.lit("")
    if method == "tablename":
        return F.coalesce(F.col(relation_col), F.lit(""))
    if method == "transaction":
        return F.coalesce(F.col(txn_col), F.lit(""))
    if method == "transaction-bucket":
        # int32 wraparound: Go's int(uint32 checksum) % n on a 64-bit
        # platform is non-negative, matching pmod on the raw crc32.
        return F.pmod(F.crc32(F.coalesce(F.col(txn_col), F.lit(""))), F.lit(buckets)).cast(
            "string"
        )
    raise ValueError(f"unknown partition method {method!r}; one of {PARTITION_METHODS}")


def assign_partition_key(df: DataFrame, method: str = "none", buckets: int = 1) -> DataFrame:
    return df.withColumn("partition_key", partition_key_expr(method, buckets))
