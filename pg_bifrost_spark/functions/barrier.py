"""Optimizer barrier: force a projection's expensive expressions to be
evaluated exactly once.

Catalyst's ``CollapseProject`` merges adjacent projections, and when a
consumer only *extracts fields* of a produced struct it inlines the
producer expression at every extraction site — there is no runtime
common-subexpression elimination for interpreted (codegen-fallback)
expressions like higher-order ``aggregate``/``transform`` folds.  A
non-trivial expression referenced k times downstream then runs k times
per row.  Measured on the CDC fast-path parser: the token fold inlined
into ``columns`` / ``old_columns`` / envelope-JSON references turned a
~12 s pipeline into ~48 s (3 copies of the fold in the optimized plan).

``opt_barrier`` inserts a single-element ``explode`` — a ``Generate``
node that projection collapse cannot cross — so everything below it is
materialized once per row.  Zero shuffle, streaming-safe, one cheap
array allocation per row.  This is exactly the barrier a
``mapInPandas`` stage provides implicitly (Arrow materialization), at
none of the Python/Arrow cost.

Trade-off: the barrier also blocks column pruning of the child, so put
it where every (or nearly every) child column is genuinely consumed —
e.g. after a parse stage whose whole output feeds marshalling — never
speculatively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["opt_barrier"]


def opt_barrier(df: DataFrame) -> DataFrame:
    """Materialize every column of ``df`` exactly once per row.

    Plan shape: ``Project [_r.*] <- Generate explode(array(struct(*)))
    <- <child>``.  ``array(struct(...))`` always has exactly one
    non-null element, so row count and values are unchanged.
    """
    return df.select(
        F.explode(F.array(F.struct(*df.columns))).alias("_r")
    ).select("_r.*")
