"""Full-registry gross-pathology perf check (VERDICT r10 ask #2).

The headline perf gate (`test_perf_regression.py`) protects only the
~97 HEADLINE queries; every other registered op had no wall-time
protection after rotating out of the gate. `python bench.py --sweep`
times ALL registry queries once at the gate SF and writes
BENCH_SWEEP.json; the committed BENCH_SWEEP_BASELINE.json is the
previous round's sweep. This test is a STATIC artifact comparison —
no Spark session — so it runs in milliseconds every suite run while
the expensive measurement stays once-per-round.

Normalization mirrors the headline gate: each query's slowdown ratio
vs its baseline is divided by the suite-wide median ratio (host
drift moves the median, a genuine plan pathology moves one query),
and only >5x normalized blowups fail — deliberately loose, this is a
tripwire for grossly-pathological regressions (lost broadcast, new
cartesian, driver collect), not a tuning gate.
"""

from __future__ import annotations

import json
import os
import statistics

import pytest

_REPO = os.path.join(os.path.dirname(__file__), "..")
SWEEP = os.path.join(_REPO, "BENCH_SWEEP.json")
BASELINE = os.path.join(_REPO, "BENCH_SWEEP_BASELINE.json")

GROSS_PATHOLOGY = 5.0  # normalized ratio beyond which a query fails

# Adjudicated sweep outliers (VERDICT r11 ask #5) — rows whose
# absolute sweep time sits far above the median for KNOWN,
# rationale-recorded reasons, so a future rotation doesn't re-litigate
# them as regressions. All three are DRIVER-LOOP ops: wall time is
# dominated by one Spark job per iteration (scheduler latency x
# iteration count), not by data volume — the per-iteration work is a
# small aggregate, so the time is flat-ish in corpus size (verified by
# their scale-FAMILY / 10x rows) and shrinks only by cutting
# iterations, which would change the algorithm:
#   dedup_jaccard_clusters — label-propagation to a fixed point over
#     the pair graph; ~1 checkpointed join+agg job per round until
#     convergence (recursive-CTE-oracle rehearsed).
#   ivf_kmeans_codebook — Lloyd iterations; one assignment+centroid
#     job per iteration, driver traffic k x d only.
#   near_dup_resolution — iterative cluster-representative
#     resolution over the near-dup graph; same fixed-point shape.
# approx_aggregates WAS the fourth outlier (15.5 s) — that one was a
# real plan pathology (countDistinct Expand multiplying sketch
# updates) and was FIXED in r12 (split legs, accuracy 1000): ~2 s.
ITERATION_DOMINATED = {
    "dedup_jaccard_clusters",
    "ivf_kmeans_codebook",
    "near_dup_resolution",
}
# same floor (and rationale) as the headline gate: the sweep is
# single-execution, so a ~1 s query whose baseline captured a lucky
# fast run can print a 5x "regression" out of pure scheduler jitter
# (r11: dedup_exact_events 0.30 s baseline vs 0.8-1.5 s steady-state,
# code untouched). Genuine pathologies on queries this small are
# caught by the plan pins and the scale FAMILY, not wall-time.
ABS_FLOOR_S = 2.0


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        return json.load(f)["queries"]


@pytest.mark.skipif(
    not (os.path.exists(SWEEP) and os.path.exists(BASELINE)),
    reason="sweep artifacts not present (run `python bench.py --sweep`)",
)
def test_registry_sweep_no_gross_pathology():
    cur, base = _load(SWEEP), _load(BASELINE)
    shared = sorted(set(cur) & set(base))
    assert len(shared) >= 50, "sweep/baseline overlap implausibly small"
    ratios = {
        q: cur[q] / max(base[q], 1e-3) for q in shared
    }
    machine = statistics.median(ratios.values())
    offenders = {
        q: round(ratios[q] / machine, 2)
        for q in shared
        if ratios[q] / machine > GROSS_PATHOLOGY and cur[q] > ABS_FLOOR_S
    }
    assert not offenders, (
        f"grossly-pathological sweep regressions (normalized by the "
        f"suite median machine factor {machine:.2f}): {offenders} — "
        f"note: {sorted(set(offenders) & ITERATION_DOMINATED)} are "
        "documented iteration-dominated rows (see ITERATION_DOMINATED); "
        "for those, first check whether the iteration count grew"
    )


@pytest.mark.skipif(
    not os.path.exists(SWEEP),
    reason="sweep artifact not present (run `python bench.py --sweep`)",
)
def test_registry_sweep_covers_every_registered_query():
    """Every query registered at sweep time must have a timing row —
    a sweep that silently skipped entries would read as 'covered'.
    Queries added AFTER the sweep ran are tolerated (they get rows at
    the next once-per-round sweep) but must be a small tail."""
    import pg_bifrost_spark.plans as plans

    plans.load_all()
    with open(SWEEP) as f:
        payload = json.load(f)
    swept = set(payload["queries"])
    assert payload["n_queries"] == len(swept)
    registered = set(plans.QUERIES)
    missing = registered - swept
    assert len(missing) <= 25, (
        f"{len(missing)} registered queries missing from the sweep — "
        f"rerun `python bench.py --sweep` ({sorted(missing)[:10]}...)"
    )
    stale = swept - registered
    assert not stale, f"sweep rows for unregistered queries: {sorted(stale)}"
