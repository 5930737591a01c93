"""Recall/precision pins for ``semantic_dedup_srp_scaled`` (rows-only:
its hash-derived planes aren't DuckDB-expressible, so like the other
rows-only entries it carries an exactness pin instead of an oracle)."""

from __future__ import annotations

import duckdb

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.dedup import (
    PLANT_MOD,
    PLANT_OFFSET,
    PLANTED_EMB_SQL,
    SEM_COSINE_THRESHOLD,
    srp_planes_for,
)

plans.load_all()

SF = "/root/testdata/sf0.001"


def _exact_pairs(sf_dir: str) -> set[tuple[int, int]]:
    """ALL planted-corpus pairs at cosine ≥ threshold, exact (DuckDB
    brute force) — the superset any bucketed method's output must be
    a subset of, and whose planted-clone rows it must recover."""
    rows = duckdb.sql(
        f"""
        WITH {PLANTED_EMB_SQL.replace('FROM embeddings',
             f"FROM '{sf_dir}/embeddings.parquet'")}
        SELECT a.vec_id, b.vec_id
        FROM embeddings_planted a JOIN embeddings_planted b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= {SEM_COSINE_THRESHOLD}
        """
    ).fetchall()
    return {(a, b) for a, b in rows}


def test_scaled_pairs_exact_subset_and_planted_recall(spark):
    from pg_bifrost_spark.operators.dedup import semantic_srp_scaled_pairs

    got = {
        (r.keep_id, r.drop_id)
        for r in semantic_srp_scaled_pairs(spark, SF).collect()
    }
    exact = _exact_pairs(SF)
    # precision 1.0: the verify stage is exact cosine, so every emitted
    # pair must be a true >=threshold pair
    assert got and got <= exact
    # planted clones are identical vectors (cosine 1.0, same bucket
    # under ANY deterministic plane set) — all must be recovered
    planted = {p for p in exact if p[1] - p[0] == PLANT_OFFSET and p[0] % PLANT_MOD == 0}
    assert planted and planted <= got
    # overall recall floor vs the exact pair set
    assert len(got) / len(exact) >= 0.5


def test_scaled_matches_fixture_op_at_small_n(spark):
    """At fixture scale the adaptive plane count lands on SRP_PLANES=3,
    but the planes themselves are hash-derived, not axis signs — the
    two ops agree on the planted clones (bucketing-invariant pairs)."""
    base = {
        (r.keep_id, r.drop_id)
        for r in plans.QUERIES["semantic_dedup_srp"](spark, SF).collect()
    }
    from pg_bifrost_spark.operators.dedup import semantic_srp_scaled_pairs

    scaled = {
        (r.keep_id, r.drop_id)
        for r in semantic_srp_scaled_pairs(spark, SF).collect()
    }
    planted = {p for p in base if p[1] - p[0] == PLANT_OFFSET}
    assert planted and planted <= scaled


def test_plane_formula_tracks_corpus():
    assert srp_planes_for(2_020) == 3
    assert srp_planes_for(20_200) == 7
    assert srp_planes_for(1_000_000_000) == 22
    # never below the fixture floor, even for tiny corpora
    assert srp_planes_for(10) == 3
