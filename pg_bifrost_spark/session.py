"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime coalesce + skew-join), UTC session timezone (so
DuckDB-oracle comparisons are stable), Arrow enabled for the few
Pandas-UDF paths, and shuffle partitions sized to cores rather than
the 200 default (on a 1000-executor cluster this would be set to
~2-3x total cores instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pg_bifrost_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    # Python workers must be able to import this package (mapInPandas
    # kernels are pickled by module reference). Export it before the
    # JVM launches so executors inherit it; on a real cluster this is
    # a --py-files zip instead.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the events fixture stores TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long and convert explicitly (plans.table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the JVM fast-path parser builds column maps with map_concat;
        # LAST_WIN matches the Python scanner's dict overwrite semantics
        # for a (pathological) duplicate column name instead of raising
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # InferFiltersFromGenerate duplicates the generator's CHILD
        # expression into an inferred `size(e) > 0` filter. For cheap
        # array columns that enables pruning, but every explode in this
        # engine feeds either the optimizer barrier (explode over a
        # 1-element literal array — the filter is tautological) or an
        # expression-dense array (shingles, envelope structs) where the
        # duplicated evaluation costs far more than pruning saves:
        # measured 1.5x on cdc_lineitem_roundtrip (11s -> 7s median,
        # the envelope build ran twice per row) and parity-or-better on
        # every other headline query. Same pathology the with_shingles
        # docstring documents for a hand-written size() filter.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # static conf: saveAsTable target for bucketed tables
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pg_bifrost_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
