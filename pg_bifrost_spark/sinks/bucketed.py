"""Bucketed parquet output — the storage-level co-location lever for
repeated big-to-big joins at 100 TB.

A fact table that is joined on the same key by many downstream
queries (lineitem⋈orders on orderkey, events⋈events on user_id,
postings⋈postings on shingle) pays one hash Exchange of its full
volume PER QUERY. Writing it ONCE with Spark's Hive-style bucketing
(`bucketBy(n, key)` + `sortBy`) persists the hash partitioning in the
table metadata: every later join/aggregation keyed on the bucket
column reads the co-located layout and compiles WITHOUT a shuffle of
that side (and with `sortBy`, without a sort for sort-merge joins).

This is infrastructure, not an operator: the CDC S3 sink's
time-partitioned layout (``writers.py``) solves pruning; this solves
join co-location. Both compose — partition by time, bucket by key.

Scale notes:
  * n_buckets is a LAYOUT constant: pick it once per table
    (≈ total_size / target_file_size); both sides of a co-located
    join must share it (or be integer multiples, which Spark 4
    coalesces).
  * Bucket pruning: an equality predicate on the bucket key scans 1/n
    of the files (`spark.sql.sources.bucketing.enabled`).
  * The write itself shuffles once (that is the point: pay the
    exchange once, not per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    parquet table registered in the session catalog. ``path`` makes it
    an external table (bucketing metadata lives in the catalog either
    way — plain `.parquet(path)` CANNOT record bucketing)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucketed layout is only visible through the
    catalog, never through `spark.read.parquet` on the files."""
    return spark.table(table)
