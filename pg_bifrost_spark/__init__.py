"""pg_bifrost_spark — a PySpark-native analytics & CDC engine.

A from-scratch Spark-first re-expression of the capabilities of
Nextdoor/pg-bifrost (a PostgreSQL logical-decoding CDC pipeline), plus
the batch/streaming analytics surface a large-scale training-data
pipeline needs (TPC-H-style queries, dedup, similarity search, text
analysis, windowed streaming aggregation).

Layout:
    cdc/        test_decoding parser, filter, partitioner, marshaller,
                end-to-end pipeline (reference: filter/, partitioner/,
                marshaller/, parselogical/ in pg-bifrost)
    sources/    custom streaming sources (pgcdc Python data source, WAL
                file replay)
    sinks/      foreachBatch sink writers with per-sink batch caps and
                partial-retry semantics (reference: transport/)
    operators/  analytics operators: dedup, similarity, text, windows,
                multimodal, asof
    functions/  reusable Column expression helpers
    plans/      TPC-H-ish query plans with DuckDB oracle SQL
    streaming/  stats aggregation, progress/ledger semantics
"""

__version__ = "0.1.0"
