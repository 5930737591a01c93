"""MinHash-LSH quality gate: the probabilistic candidate generation
must recover (essentially) every pair the exact n-gram Jaccard query
finds — the recall property that justifies the rows-only check."""

from __future__ import annotations

import pg_bifrost_spark.plans as plans

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_lsh_recall_vs_exact(spark):
    from pg_bifrost_spark.operators.dedup import minhash_lsh_pairs
    from pg_bifrost_spark.plans import table

    exact = {
        (r.doc_a, r.doc_b)
        for r in plans.QUERIES["dedup_ngram_jaccard"](spark, SF).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(table(spark, SF, "documents")).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    # LSH output is verified by exact jaccard, so no false positives…
    assert lsh <= exact or all(p in exact for p in lsh)
    # …and 16 bands × 4 rows gives ≥99% expected recall at j≥0.5
    recall = len(lsh & exact) / len(exact)
    from pg_bifrost_spark.operators.dedup import LSH_RECALL_BOUND

    assert recall >= LSH_RECALL_BOUND, f"LSH recall {recall:.2%}"


SF01 = "/root/testdata/sf0.01"


def test_lsh_verified_subset_and_recall_sf01(spark):
    """VERDICT r5 ask #7 — the rows-only LSH query's VERIFIED output
    (exact Jaccard ≥ 0.5 on candidates) is deterministic even though
    candidate generation isn't: at the driver's own correctness scale
    it must be a subset of the oracle-checked exact pair set
    (dedup_ngram_jaccard, same threshold) with recall ≥ the pinned
    bound."""
    from pg_bifrost_spark.operators.dedup import minhash_lsh_pairs
    from pg_bifrost_spark.plans import table

    exact = {
        (r.doc_a, r.doc_b)
        for r in plans.QUERIES["dedup_ngram_jaccard"](spark, SF01).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(table(spark, SF01, "documents")).collect()
    }
    assert exact
    assert lsh <= exact, sorted(lsh - exact)[:5]
    from pg_bifrost_spark.operators.dedup import LSH_RECALL_BOUND

    recall = len(lsh & exact) / len(exact)
    assert recall >= LSH_RECALL_BOUND, f"LSH recall {recall:.2%} at sf0.01"
    # the r12 gate row summarizes exactly these properties — pin that
    # its booleans agree with the sets computed here
    row = plans.QUERIES["dedup_minhash_lsh"](spark, SF01).collect()[0]
    assert row.n_exact_pairs == len(exact)
    assert row.subset_ok and row.recall_ok


def test_simhash_equals_bruteforce_sf01(spark):
    """SimHash's blocking is pigeonhole-COMPLETE for hamming ≤ 3 (4
    blocks, 3 differing bits ⇒ ≥1 identical block) and fingerprints
    are deterministic, so the rows-only query's output is EXACTLY
    predictable: the brute-force all-pairs hamming set, minus pairs
    whose every shared block sits in a > BUCKET_CAP bucket (the cap
    FIRES at sf0.01 — two boilerplate block buckets hold 118 and 80
    members). Recomputed driver-side with independent Python-int
    arithmetic."""
    from collections import Counter

    from pg_bifrost_spark.operators.dedup import BUCKET_CAP, simhash_fingerprints

    docs = spark.read.parquet(SF01 + "/documents.parquet")
    fps = sorted(
        (r.doc_id, r.fp & (2**64 - 1)) for r in simhash_fingerprints(docs).collect()
    )
    bucket = Counter()
    for _, fp in fps:
        for k in range(4):
            bucket[(k, (fp >> (16 * k)) & 0xFFFF)] += 1
    assert any(n > BUCKET_CAP for n in bucket.values()), "cap should fire at sf0.01"

    def blocks(fp):
        return [(k, (fp >> (16 * k)) & 0xFFFF) for k in range(4)]

    expected = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            a, b = fps[i], fps[j]
            if bin(a[1] ^ b[1]).count("1") > 3:
                continue
            shared = set(blocks(a[1])) & set(blocks(b[1]))
            if any(bucket[blk] <= BUCKET_CAP for blk in shared):
                expected.add((a[0], b[0]))
    from pg_bifrost_spark.operators.dedup import simhash_pairs
    from pg_bifrost_spark.plans import table

    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_pairs(table(spark, SF01, "documents")).collect()
    }
    assert got == expected
    assert expected, "fixture should contain at least one hamming<=3 pair"
    # the r12 gate row summarizes the same detector — all booleans TRUE
    row = plans.QUERIES["dedup_simhash"](spark, SF01).collect()[0]
    assert row.pairs_found_ok and row.hamming_bound_ok and row.pairs_canonical_ok


def test_bucket_cap_drops_degenerate_mass(spark):
    """BUCKET_CAP (VERDICT r4 "Wrong #3"): 100 identical boilerplate
    docs collapse onto ONE signature, so every band bucket they share
    has 100 members — 100² candidate pairs per band without the cap.
    The capped operator must emit ZERO pairs among the degenerate mass
    (those are exact duplicates — exact dedup's job, and the
    documented recall trade-off of the cap) while a normal twin pair
    elsewhere in the corpus survives untouched. Same property for the
    SimHash block buckets."""
    from pg_bifrost_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    rows = [
        (i, "all rights reserved worldwide reproduction strictly prohibited forever")
        for i in range(100)
    ] + [
        (200, "alpha beta gamma delta epsilon zeta eta theta"),
        (201, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lsh_pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    assert lsh_pairs == {(200, 201)}
    sim_pairs = {(r.doc_a, r.doc_b) for r in simhash_pairs(docs).collect()}
    assert sim_pairs == {(200, 201)}


def test_bucket_cap_adds_no_shuffle(spark):
    """The per-bucket member-list aggregation must ride the existing
    (band, bh) exchange ``spread`` already emits — a second
    hashpartitioning on the band keys would double the
    candidate-generation shuffle at 100 TB. (r5 shape was a
    count-window + cached self-join; the groupBy/collect_list shape
    replaced it — same exchange discipline, no window, no cache.)"""
    import pg_bifrost_spark.plans as p

    text = (
        p.QUERIES["dedup_minhash_lsh"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "collect_list" in text
    # the only (band, bh) exchange is spread's explicit repartition
    # (REPARTITION_BY_NUM); an aggregation-induced one would be tagged
    # ENSURE_REQUIREMENTS.
    band_exchanges = [
        ln for ln in text.splitlines() if "hashpartitioning(band" in ln
    ]
    assert band_exchanges
    assert all("REPARTITION_BY_NUM" in ln for ln in band_exchanges), band_exchanges


def test_lsh_multiprobe_recall_and_adaptive_planes(spark):
    """The r12 ANN-LSH fix: corpus-adaptive plane count (the frozen
    12-plane bucket isolated EVERY fixture vector — zero candidates)
    plus 1-bit-flip multiprobe. Pins the plane formula's clamps and
    the measured recall (0.7 at both SFs) above the gate row's floor,
    so a probe-set or clamp regression has a local reproducer instead
    of only a driver-time recall_ok failure (code-review r12)."""
    from pg_bifrost_spark.operators.similarity import (
        ANN_RECALL_FLOORS,
        N_PLANES,
        lsh_bucket_topk,
        lsh_planes_for,
    )

    assert lsh_planes_for(10) == 2          # low clamp
    assert lsh_planes_for(500) == 3         # fixture scale: 8 buckets
    assert lsh_planes_for(64 * 2**12) == N_PLANES  # high clamp engages
    assert lsh_planes_for(10**9) == N_PLANES
    floor = ANN_RECALL_FLOORS["ann_lsh_buckets"]
    for sf in (SF, SF01):
        exact = {
            r.vec_id
            for r in plans.QUERIES["ann_bruteforce_topk"](spark, sf).collect()
        }
        got = {r.vec_id for r in lsh_bucket_topk(spark, sf).collect()}
        assert got, f"multiprobe returned no candidates at {sf}"
        recall = len(got & exact) / len(exact)
        assert recall >= floor, (sf, recall)
