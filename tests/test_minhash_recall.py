"""MinHash-LSH quality gate: the probabilistic candidate generation
must recover (essentially) every pair the exact n-gram Jaccard query
finds — the recall property that justifies the rows-only check."""

from __future__ import annotations

import pg_bifrost_spark.plans as plans

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_lsh_recall_vs_exact(spark):
    exact = {
        (r.doc_a, r.doc_b)
        for r in plans.QUERIES["dedup_ngram_jaccard"](spark, SF).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in plans.QUERIES["dedup_minhash_lsh"](spark, SF).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    # LSH output is verified by exact jaccard, so no false positives…
    assert lsh <= exact or all(p in exact for p in lsh)
    # …and 16 bands × 4 rows gives ≥99% expected recall at j≥0.5
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall:.2%}"
