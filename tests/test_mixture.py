"""Mixture/codebook operator quality gates: k-means convergence and the
scale-shape of the token-budget prefix scan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.mixture import TOKEN_BUDGET, kmeans_codebook
from pg_bifrost_spark.plans import table

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_kmeans_inertia_monotone_and_assignment_optimal(spark):
    emb = table(spark, SF, "embeddings")
    cents, history = kmeans_codebook(emb, k=8, iters=4)
    # Lloyd's never increases inertia
    assert all(b <= a + 1e-6 for a, b in zip(history, history[1:])), history
    # every centroid is finite and has the embedding dimensionality
    dim = len(emb.select("embedding").first()[0])
    assert all(len(c) == dim and all(math.isfinite(x) for x in c) for c in cents)

    # the reported assignment is the true argmin: cross-check one vector
    # against a brute-force python computation
    row = emb.orderBy("vec_id").first()
    v = [float(x) for x in row["embedding"]]
    d2s = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
    best = d2s.index(min(d2s)) + 1  # 1-indexed like array_position

    cent_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    dists = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    got = (
        emb.orderBy("vec_id")
        .select(F.array_position(dists, F.array_min(dists)).alias("cell"))
        .first()["cell"]
    )
    assert int(got) == best


def test_token_budget_invariants(spark):
    out = plans.QUERIES["token_budget_sample"](spark, SF).collect()
    assert out, "budget selected nothing"
    # running_tokens is strictly increasing and within budget
    runs = [r["running_tokens"] for r in out]
    assert runs == sorted(runs) and len(set(runs)) == len(runs)
    assert runs[-1] <= TOKEN_BUDGET
    # running total is consistent with the selected docs' token counts
    assert runs[-1] == sum(r["n_tokens"] for r in out)


def test_token_budget_no_global_data_window(spark):
    """The corpus-wide running sum must never be a single-task global
    window over the data: the only unpartitioned window may be the one
    over per-bucket totals (~tens of rows)."""
    df = plans.QUERIES["token_budget_sample"](spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"Window \[sum\((\w+)#", plan):
        col = m.group(1)
        window_clause = plan[m.start() : plan.index("\n", m.start())]
        if col == "n_tokens":
            assert "bucket" in window_clause, (
                "data-sized window is not partitioned by bucket:\n" + window_clause
            )


def test_domain_cap_respected(spark):
    from pg_bifrost_spark.operators.mixture import DOMAIN_CAP

    out = plans.QUERIES["domain_cap_sample"](spark, SF)
    per = out.groupBy("source").count().collect()
    assert per and all(r["count"] <= DOMAIN_CAP for r in per)


def test_classifier_gate_fixture_discriminates(spark):
    """Fixture-degeneracy pin (the pagerank precedent): the classifier
    gate row is only meaningful if BOTH keep classes populate and the
    scores spread — a CLS_BIAS_FP drift or fixture-vintage change that
    collapses `kept` to a constant must fail HERE, not pass the
    oracle-parity gate vacuously."""
    import pg_bifrost_spark.plans as plans

    plans.load_all()
    rows = plans.QUERIES["quality_classifier_filter"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    kept = {r["kept"] for r in rows}
    assert kept == {0, 1}, f"kept degenerated to {kept}"
    frac = sum(r["kept"] for r in rows) / len(rows)
    assert 0.2 < frac < 0.8, f"keep rate {frac} — bias off-center"
    assert len({r["score_fp"] for r in rows}) > len(rows) // 2


def test_k_anonymity_gate_fixture_discriminates(spark):
    """Both verdicts must populate at gate scale (K_ANON=8 vs class
    sizes 5..21) — a K drift or fixture change that makes violates_k
    constant must fail here, not pass the parity gate vacuously."""
    import pg_bifrost_spark.plans as plans

    plans.load_all()
    rows = plans.QUERIES["privacy_k_anonymity_report"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert {r["violates_k"] for r in rows} == {0, 1}
    assert len(rows) >= 5  # a real size distribution, not 2 buckets


def test_l_diversity_gate_fixture_discriminates(spark):
    """Both verdicts must populate (L_DIV=5 vs fixture l = 3..6)."""
    import pg_bifrost_spark.plans as plans

    plans.load_all()
    rows = plans.QUERIES["privacy_l_diversity_report"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert {r["violates_l"] for r in rows} == {0, 1}
    assert len(rows) >= 3
