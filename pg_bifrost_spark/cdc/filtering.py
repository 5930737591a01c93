"""Table whitelist/blacklist filter — reference ``filter/filter.go``.

Decision table (comment at ``filter/filter.go:186-197``):
  - BEGIN/COMMIT always pass (they carry transaction/progress metadata);
  - whitelist: pass iff relation matches any entry (exact or regex);
  - blacklist: pass iff relation matches no entry;
  - neither: pass-through.

Expressed as a single Column predicate so Catalyst can push it into the
scan and prune before the (more expensive) marshalling projection —
the reference does this ordering by hand (``app/runner.go:178-200``);
here it is free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CONTROL_OPS = ("BEGIN", "COMMIT")


def _match(relation: Column, tables: list[str], regex: bool) -> Column:
    if regex:
        return reduce(lambda a, b: a | b, (relation.rlike(p) for p in tables))
    return relation.isin(list(tables))


def table_filter_predicate(
    whitelist: list[str] | None = None,
    blacklist: list[str] | None = None,
    whitelist_regex: bool = False,
    blacklist_regex: bool = False,
    relation_col: str = "relation",
    operation_col: str = "operation",
) -> Column:
    """Build the pass predicate. Whitelist and blacklist are mutually
    exclusive (the reference validates this at config time,
    ``main/main.go:428-452`` — we replicate the documented intent)."""
    if whitelist and blacklist:
        raise ValueError("whitelist and blacklist are mutually exclusive")
    is_control = F.col(operation_col).isin(*CONTROL_OPS)
    rel = F.col(relation_col)
    if whitelist:
        return is_control | _match(rel, whitelist, whitelist_regex)
    if blacklist:
        return is_control | ~_match(rel, blacklist, blacklist_regex)
    return F.lit(True)


def apply_table_filter(df: DataFrame, **kwargs) -> DataFrame:
    return df.filter(table_filter_predicate(**kwargs))
