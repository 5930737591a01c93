"""CDC → table materialization: apply INSERT/UPDATE/DELETE envelopes
to a keyed snapshot (the downstream consumer a CDC pipeline exists
for). MERGE INTO without a lakehouse format: keep-latest within the
batch, anti-join the old snapshot, union, rewrite — the guide's
documented emulation (at deploy scale this is one `MERGE INTO` on
Delta/Iceberg; the change-resolution logic is identical).

At-least-once safety: applying the same batch twice is idempotent —
resolution is keyed by primary key with last-WAL-wins, so replays
converge (W4/W5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def changes_to_upserts(marshalled: DataFrame, pk: str) -> DataFrame:
    """Marshalled envelopes → one resolved change per key: the latest
    (by wal_start) INSERT/UPDATE/DELETE wins. Returns
    (pk_value string, op, wal_start, cells map<col, value-string>)."""
    env_ddl = (
        "table string, operation string, "
        "columns map<string, map<string, struct<q: string, t: string, v: string>>>"
    )
    env = marshalled.filter(F.col("json").isNotNull()).withColumn(
        "env", F.from_json("json", env_ddl)
    )
    cells = F.map_from_entries(
        F.transform(
            F.map_entries(F.col("env.columns")),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.coalesce(
                    F.element_at(e["value"], "new"), F.element_at(e["value"], "old")
                )["v"].alias("value"),
            ),
        )
    )
    changed = env.select(
        F.element_at(cells, pk).alias("_pk"),
        F.col("env.operation").alias("op"),
        "wal_start",
        cells.alias("cells"),
    )
    w = Window.partitionBy("_pk").orderBy(F.desc("wal_start"))
    return changed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def apply_changes(snapshot: DataFrame | None, upserts: DataFrame, pk: str) -> DataFrame:
    """Merge resolved changes into the previous snapshot:
    survivors = old rows with no change + non-DELETE change rows."""
    fresh = upserts.filter(F.col("op") != "DELETE").select(
        F.col("_pk"), F.col("cells")
    )
    if snapshot is None:
        return fresh
    keys = upserts.select("_pk")
    kept = snapshot.join(keys, "_pk", "left_anti")
    return kept.unionByName(fresh)


def snapshot_as_columns(snapshot: DataFrame, columns: dict[str, str]) -> DataFrame:
    """Materialized snapshot (cells map) → typed columns."""
    return snapshot.select(
        *[F.element_at(F.col("cells"), c).cast(t).alias(c) for c, t in columns.items()]
    )
