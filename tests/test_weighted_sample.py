"""A-ES weighted sampling: independent single-process reference (same
md5 math, hand-rolled top-k) + the weight-monotonicity property."""

import hashlib
import math
from collections import defaultdict

import duckdb

from pg_bifrost_spark.operators.selection import WES_PER_GROUP
from pg_bifrost_spark.plans import QUERIES, load_all

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _micro_key(doc_id: int, n_chars: int) -> int:
    h = int(hashlib.md5(f"{doc_id}:ws".encode()).hexdigest()[:8], 16)
    return math.floor(math.log((h + 1) / 4294967296.0) / n_chars * 1_000_000)


def test_matches_independent_reference(spark):
    rows = duckdb.sql(
        f"SELECT source, doc_id, n_chars FROM '{SF_DIR}/documents.parquet' "
        "WHERE n_chars > 0"
    ).fetchall()
    per_src = defaultdict(list)
    for src, doc, n in rows:
        per_src[src].append((-_micro_key(doc, n), doc))
    expect = set()
    for src, items in per_src.items():
        for rnk, (_, doc) in enumerate(sorted(items)[:WES_PER_GROUP], 1):
            expect.add((src, doc, rnk))
    got = {
        (r["source"], r["doc_id"], r["rnk"])
        for r in QUERIES["weighted_sample_es"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_weight_monotone_inclusion():
    """The ES property, checked on the key math directly: for a FIXED
    uniform draw, a larger weight always yields a larger key — so
    heavier items dominate at equal luck."""
    for doc in (3, 17, 4242):
        assert _micro_key(doc, 500) > _micro_key(doc, 50)
