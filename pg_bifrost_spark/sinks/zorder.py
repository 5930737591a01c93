"""Z-order (Morton-curve) file layout — multi-dimensional data
skipping for parquet scans.

A linear sort optimizes min/max pruning for ONE column; every file
then spans the full range of every other column and a predicate on
those prunes nothing. Interleaving the bits of k normalized columns
orders rows along a space-filling curve, so each output file covers a
small HYPERCUBE: min/max footers stay narrow on ALL k columns and a
range predicate on any of them skips most files/row-groups (the
standard lakehouse OPTIMIZE ZORDER BY move, here as a plain write-time
transform).

Everything is codegen'd column expressions: one min/max aggregate per
column (broadcast back as a single-row crossJoin — never a driver
collect in the plan), bit interleave as a sum of shift/mask terms,
then repartitionByRange + sortWithinPartitions on the z value — the
same two-exchange shape as any global sort, paid once at write time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16  # 16 bits/column: k·16 ≤ 63 keeps the z value a long


def _normalized(col: str, bits: int) -> Column:
    """Scale a numeric column to [0, 2^bits) using its global min/max
    (broadcast as _min_<col>/_max_<col>); constant columns map to 0."""
    lo, hi = F.col(f"_min_{col}"), F.col(f"_max_{col}")
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (F.col(col) - lo).cast("double") / span).otherwise(F.lit(0.0))
    return F.least(
        F.floor(frac * ((1 << bits) - 1)).cast("long"), F.lit((1 << bits) - 1)
    )


def zorder_value(cols: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of the normalized columns: bit b of column i
    lands at position b·k + i."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed long")
    terms: list[Column] = []
    for i, c in enumerate(cols):
        n = _normalized(c, bits)
        for b in range(bits):
            terms.append(F.shiftleft(F.shiftright(n, b).bitwiseAND(F.lit(1)), b * k + i))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder_write(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = DEFAULT_BITS
) -> None:
    """Write ``df`` as ~``n_files`` parquet files z-ordered on
    ``cols``. Range-partitioning on z gives files contiguous curve
    segments (narrow per-file min/max on every z column); the
    within-partition sort tightens row-group stats too."""
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    )
    out = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", zorder_value(cols, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols])
    )
    out.write.mode("overwrite").parquet(path)
