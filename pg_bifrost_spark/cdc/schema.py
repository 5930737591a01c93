"""Event and envelope schemas for the CDC DataFrame graph.

The event schema is deliberately dynamic (``MapType`` columns, not
per-table structs) so any table with any column set flows through one
stable schema — the Spark analog of the reference's
``map[string]ColumnValue`` (``parselogical/parselogical.go:42-69``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# value/type/quoted cell — ColumnValue in the reference
COLUMN_VALUE = T.StructType(
    [
        T.StructField("v", T.StringType()),
        T.StructField("t", T.StringType()),
        T.StructField("q", T.BooleanType()),
    ]
)

COLUMNS_MAP = T.MapType(T.StringType(), COLUMN_VALUE)

# One WAL message after parse + transaction assembly
# (reference WalMessage + ParseResult, replication/message.go:25-32).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("wal_start", T.LongType()),
        T.StructField("server_wal_end", T.LongType()),
        T.StructField("server_time_ms", T.LongType()),
        T.StructField("operation", T.StringType()),
        T.StructField("relation", T.StringType()),
        T.StructField("txn_id", T.StringType()),
        T.StructField("time_based_key", T.StringType()),
        T.StructField("no_tuple_data", T.BooleanType()),
        T.StructField("columns", COLUMNS_MAP),
        T.StructField("old_columns", COLUMNS_MAP),
        T.StructField("partition_key", T.StringType()),
    ]
)

# Raw line schema fed to the parser (what a source emits per message).
# stream_id identifies the replication stream (slot) a message belongs
# to: ordering/transaction assembly is only defined within a stream, so
# it is also the parallelism unit for replay fixtures.
RAW_LINE_SCHEMA = T.StructType(
    [
        T.StructField("wal_start", T.LongType()),
        T.StructField("server_wal_end", T.LongType()),
        T.StructField("server_time_ms", T.LongType()),
        T.StructField("stream_id", T.IntegerType()),
        T.StructField("line", T.StringType()),
    ]
)
