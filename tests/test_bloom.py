"""Bloom-prefilter exact incremental dedup: exactness under any fpp
(including a fully saturated filter), engagement of all three routes
(definite-new / confirmed-dup / false-positive), and the plan shape
that makes it a 100 TB operator (broadcast probes, map-side bit_or)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_bifrost_spark.operators.bloom import (
    _fixture,
    bloom_build,
    bloom_params,
    bloom_probe,
    incremental_exact_new,
)


def _exact_new(history, batch, key):
    return batch.join(history.select(key).distinct(), key, "left_anti")


def test_bloom_params_scale():
    m1, k1 = bloom_params(1_000, 0.03)
    m2, k2 = bloom_params(1_000_000, 0.03)
    assert m2 > m1 and m2 & (m2 - 1) == 0 and 1 <= k2 <= 8
    # ~7.3 bits/key at 3%: the 1.2-byte/key claim in the docstring
    assert m2 / 1_000_000 < 16


def test_exactness_matches_anti_join(spark, sf_dir):
    history, batch = _fixture(spark, sf_dir)
    got = incremental_exact_new(history, batch, "content_hash")
    want = _exact_new(history, batch, "content_hash")
    g = {(r.doc_id, r.content_hash) for r in got.collect()}
    w = {(r.doc_id, r.content_hash) for r in want.collect()}
    assert g == w and len(g) > 0
    # dup path engaged: some batch rows were dropped
    assert batch.count() > len(g)


def test_exactness_under_saturated_filter(spark, sf_dir):
    """m=64 (one bucket word), k=1: nearly every probe is a false
    positive — the result must STILL be exact (bloom only routes)."""
    history, batch = _fixture(spark, sf_dir)
    got = incremental_exact_new(history, batch, "content_hash", params=(64, 1))
    want = _exact_new(history, batch, "content_hash")
    assert {(r.doc_id, r.content_hash) for r in got.collect()} == {
        (r.doc_id, r.content_hash) for r in want.collect()
    }


def test_no_false_negatives_and_fp_route_engaged(spark, sf_dir):
    history, batch = _fixture(spark, sf_dir)
    m, k = bloom_params(history.count(), fpp=0.3)
    bloom = bloom_build(history.select("content_hash"), "content_hash", m, k)
    probed = bloom_probe(batch, "content_hash", bloom, m, k)
    hits = probed.filter("bloom_hit")
    # every true dup must hit (no false negatives)
    true_dups = batch.join(
        history.select("content_hash").distinct(), "content_hash", "left_semi"
    )
    n_dups = true_dups.count()
    assert hits.join(true_dups.select("doc_id"), "doc_id", "left_semi").count() == n_dups
    # and the coarse gate fpp produces real false positives
    assert hits.count() > n_dups > 0
    # misses exist too (the map-only fast path does real work)
    assert probed.filter(~F.col("bloom_hit")).count() > 0


def test_plan_probe_broadcasts_and_build_has_partial_agg(spark, sf_dir):
    history, batch = _fixture(spark, sf_dir)
    m, k = bloom_params(history.count(), fpp=0.3)
    bloom = bloom_build(history.select("content_hash"), "content_hash", m, k)
    build_plan = bloom._jdf.queryExecution().executedPlan().toString()
    # map-side combine: partial + final HashAggregate around one exchange
    assert build_plan.count("HashAggregate") >= 2
    probed = bloom_probe(batch, "content_hash", bloom, m, k)
    probe_plan = probed._jdf.queryExecution().executedPlan().toString()
    assert probe_plan.count("BroadcastHashJoin") == k
    assert "SortMergeJoin" not in probe_plan
    # the probed batch side never shuffles: every hash exchange in the
    # tree belongs to the bloom build's groupBy(bucket) (broadcast side)
    import re

    batch_side_exchanges = [
        ln for ln in probe_plan.splitlines()
        if re.search(r"\bExchange hashpartitioning", ln) and "bucket#" not in ln
    ]
    assert batch_side_exchanges == [], batch_side_exchanges
