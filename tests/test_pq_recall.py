"""Product-quantization ANN quality gate: like the IVF/LSH recall
pins, the rows-only registration is justified by a measured recall
bound against the exact brute-force top-k, plus structural checks on
the codes (the 32× compression story only holds if codes really are
M small ints)."""

from __future__ import annotations

import pg_bifrost_spark.plans as plans

plans.load_all()

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _recall(spark, sf):
    from pg_bifrost_spark.operators.similarity import pq_adc_topk

    exact = {r.vec_id for r in plans.QUERIES["ann_bruteforce_topk"](spark, sf).collect()}
    pq = {r.vec_id for r in pq_adc_topk(spark, sf).collect()}
    assert exact
    return len(pq & exact) / len(exact)


def test_pq_recall_floor(spark):
    # measured 0.70 / 0.80; floors tightened r7 (VERDICT r6 ask #9)
    # from 0.6/0.7 to 0.65/0.75 and taken as the MIN over 5 repeated
    # builds, so the float-accumulation nondeterminism of the codebook
    # training is sampled rather than given a one-shot pass.
    assert min(_recall(spark, SF) for _ in range(5)) >= 0.65
    assert min(_recall(spark, SF01) for _ in range(5)) >= 0.75


def test_pq_codes_shape_and_range(spark):
    from pyspark.sql import functions as F

    from pg_bifrost_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        _prepared,
        pq_codebooks,
        pq_encode,
    )

    emb = _prepared(spark, SF)
    books = pq_codebooks(emb)
    assert len(books) == PQ_M and all(len(b) == PQ_K for b in books)
    coded = pq_encode(emb, books)
    stats = coded.select(
        F.min(F.size("codes")).alias("lo"),
        F.max(F.size("codes")).alias("hi"),
        F.min(F.array_min("codes")).alias("cmin"),
        F.max(F.array_max("codes")).alias("cmax"),
    ).first()
    assert stats.lo == stats.hi == PQ_M
    assert 1 <= stats.cmin and stats.cmax <= PQ_K
    # the scan relation a 100 TB deployment persists: ids + codes only
    slim = coded.select("vec_id", "codes")
    assert [f.name for f in slim.schema.fields] == ["vec_id", "codes"]


def test_pq_codebooks_tiny_corpus(spark):
    """A corpus smaller than PQ_K must train k_eff=len(corpus)
    centroids, not crash (code-review r8 — the replaced distributed
    implementation handled this)."""
    from pyspark.sql import functions as F

    from pg_bifrost_spark.operators.similarity import PQ_M, _prepared, pq_codebooks, pq_encode

    emb = _prepared(spark, SF).filter(F.col("vec_id") < 10)
    books = pq_codebooks(emb)
    assert len(books) == PQ_M and all(len(b) == 10 for b in books)
    coded = pq_encode(emb, books).select("vec_id", "codes").collect()
    assert len(coded) == 10
    assert all(1 <= c <= 10 for r in coded for c in r["codes"])
