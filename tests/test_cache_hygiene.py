"""Cache-hygiene gates (VERDICT r3 "Wrong #3"): operators that cache
intermediates must not leak them across queries or iterations. In a
long-lived session running all 99 registered queries (the driver's
correctness gate, bench.py) leaked cached blocks accumulate in executor
storage memory and tax whatever runs last.
"""

from __future__ import annotations

import pg_bifrost_spark.plans as plans

plans.load_all()

SF = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_label_propagation_unpersists_each_iteration(spark):
    """20 iterations over a planted 41-node chain (large-diameter
    component — every iteration makes progress, so none short-circuit):
    at most the edge list and the SURVIVING iterate may stay cached;
    the 19 dead iterates must be unpersisted as the loop advances.
    Before the fix this held 21 cached DataFrames."""
    from pg_bifrost_spark.operators.curation import connected_components

    plans.release_caches()
    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    labels = connected_components(edges, max_iter=20)
    got = {r.node: r.component for r in labels.collect()}
    # min-label propagation moves the 0 label one hop per iteration
    assert got[0] == 0 and got[20] == 0 and len(got) == 41
    # EXACTLY the edge cache + the surviving iterate. >2 = iterate
    # leak (VERDICT r3); <2 = the edge cache was force-unpersisted by
    # the per-iteration diff (ADVICE r4: the sym cache RDD used to
    # register during iteration 1's checkpoint job, land in that
    # iteration's new_ids, and get released after iteration 2 — every
    # later round recomputed the edge list from source).
    assert _n_persistent(spark) == 2, "edge cache or surviving iterate wrong"
    plans.release_caches()
    assert _n_persistent(spark) == 0


def test_query_build_releases_previous_caches(spark):
    """Building any registered query releases the caches the PREVIOUS
    one left behind (they are referenced by its returned plan, so the
    operator itself cannot unpersist them) — the leak is bounded to
    one query's working set in any sequential runner."""
    plans.release_caches()
    spark.catalog.clearCache()
    # materializes its tracked shingle cache during build (hot-set probe)
    plans.QUERIES["dedup_ngram_jaccard"](spark, SF)
    assert _n_persistent(spark) >= 1
    # a cache-free query's build must sweep the leftovers
    plans.QUERIES["q1_pricing_summary"](spark, SF)
    assert _n_persistent(spark) == 0
