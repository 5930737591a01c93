"""Equivalence pin for the r12 GEMM verify tail: the per-cell
``_srp_cell_kernel`` (normalize + one matmul per bucket) must emit
EXACTLY the rows of the fold-based self-join it replaced — same pair
set, same 4dp cosines, same schema — under both bucketers that feed
``_semantic_verify_tail`` (the fixed sign bucket of semantic_dedup_srp
and the corpus-sized hash-plane bucket of the scaled variant).

Full-precision comparison (repr), mirroring the driver's value hash:
a 4dp rounding-boundary flip between the fold's sequential sum and the
kernel's GEMM accumulation order would fail here. The margin making
that impossible on the fixtures is structural — every qualifying pair
is a planted exact clone (cosine 1.0) and the nearest non-qualifying
pair measures cosine ≤ 0.61 at every SF — but the pin holds whatever
the data does next.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_bifrost_spark import plans
from pg_bifrost_spark.operators import dedup as D
from pg_bifrost_spark.operators.similarity import srp_bucket_expr

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return D.plant_duplicates(plans.table(spark, SF_DIR, "embeddings"), "vec_id").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def _rows(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def test_sign_bucket_kernel_matches_fold(spark):
    b = _emb(spark).withColumn("bucket", D._srp_bucket(F.col("v")))
    fold = _rows(D._semantic_verify_tail(b, kernel=False))
    kern = _rows(D._semantic_verify_tail(b, kernel=True))
    plans.release_caches()
    assert kern == fold
    assert len(kern) > 0  # planted clones guarantee a non-empty pin


def test_zero_norm_vectors_drop(spark):
    """ADVICE r12: zero-norm vectors have NaN cosine against everyone.
    The DEFINED semantics is DROP (a zero vector has no direction) —
    the kernel gets it from numpy (NaN >= t is False); the fold path
    needs its explicit isnan filter because Spark's >= orders NaN
    ABOVE every value. Two zero vectors planted into one bucket: both
    paths must emit no pair involving them, and stay equal."""
    rows = [
        (1, [0.0, 0.0, 0.0], 5),
        (2, [0.0, 0.0, 0.0], 5),  # zero–zero pair: 0/0 -> NaN
        (3, [1.0, 2.0, 3.0], 5),  # zero–nonzero pairs: 0/x -> NaN
        (4, [2.0, 4.0, 6.0], 5),  # the one REAL pair (cosine 1.0)
    ]
    b = spark.createDataFrame(rows, "vec_id long, v array<double>, bucket int")
    fold = _rows(D._semantic_verify_tail(b, kernel=False))
    kern = _rows(D._semantic_verify_tail(b, kernel=True))
    plans.release_caches()
    assert kern == fold
    pair_ids = {(r[1], r[2]) for r in kern}
    assert pair_ids == {("3", "4")}, pair_ids  # repr'd by _rows


def test_scaled_plane_bucket_kernel_matches_fold(spark):
    e = _emb(spark)
    planes = D.srp_planes_for(e.count())
    dim = len(e.select("v").first()[0])
    b = e.withColumn("bucket", srp_bucket_expr(F.col("v"), dim, planes))
    fold = _rows(D._semantic_verify_tail(b, kernel=False))
    kern = _rows(D._semantic_verify_tail(b, kernel=True))
    plans.release_caches()
    assert kern == fold
    assert len(kern) > 0
