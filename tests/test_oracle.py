"""Correctness gate rehearsal: run every registered query on Spark and
its DuckDB oracle on the same parquet, compare row count + column names
+ order-insensitive values (mirrors the driver's CORRECTNESS check).

Default scale: sf0.01 — the DRIVER'S gate scale, so rehearsal and gate
are byte-comparable (VERDICT r4 ask; sf0.001 rehearsal once passed a
query the gate hash-failed). Set SPARK_GRAFT_ORACLE_SF=0.001 for a
faster smoke pass while iterating.

LONG LEG (VERDICT r12 ask #1): the full 206-query × two-engine
rehearsal runs ~10+ minutes, which pushed the driver's default
``pytest -x -q`` past its output/time budget (VERIFY_r12 tests_ok
false by truncation, not failure). It is therefore opt-in:
``SPARK_GRAFT_FULL_SUITE=1`` — the end-of-round discipline runs it;
the driver's own 50-query oracle gate covers correctness every round
regardless.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_SUITE") != "1",
    reason="long leg (~10 min): set SPARK_GRAFT_FULL_SUITE=1 to run the "
    "206-query oracle rehearsal (VERDICT r12 ask #1 default-fast profile)",
)

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "0.01")
SF_DIR = f"/root/testdata/sf{SF}"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm_cell(v):
    """Strict value canonicalization — round-2 lesson: the r01 driver
    hash-failed queries this rehearsal passed because floats were
    normalized at 6dp here. Floats now compare at FULL precision
    (repr), and Decimal compares scale-sensitively, so a query green
    here should be green under the driver's value hash too."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(ORACLES[name])
    duck_cols = [c.lower() for c in res.columns]
    # Arrow fetch mirrors how a pandas/arrow-based driver sees the
    # values: DuckDB HUGEINT (the sum(BIGINT) result type) surfaces as
    # decimal128 instead of silently collapsing to Python int — an
    # oracle missing CAST(... AS BIGINT) fails HERE, not in the gate.
    duck_rows = [
        tuple(d[c] for c in res.columns)
        for d in res.fetch_arrow_table().to_pylist()
    ]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    sn = _norm_rows(spark_cols, spark_rows)
    dn = _norm_rows(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    rows = sdf.collect()
    assert rows is not None
    # deterministic across two runs (replay identity)
    again = QUERIES[name](spark, SF_DIR).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again], f"{name}: nondeterministic"


def test_cluster_histogram_has_rich_size_distribution(spark):
    """ADVICE r8: a 2-row histogram (sizes 1 and 2) is minimal-variety
    — a decoder/oracle bug collapsing both counts symmetrically could
    pass. The TRIPLE_MOD/QUAD_MOD plant layers guarantee 4 distinct
    sizes at the 500-doc fixture; pin the exact (size, n_clusters)
    pairs so fixture drift is loud."""
    rows = QUERIES["dedup_cluster_size_histogram"](spark, SF_DIR).collect()
    got = [(r["cluster_size"], r["n_clusters"]) for r in rows]
    assert got == [(1, 492), (2, 6), (3, 1), (4, 1)], got
