"""The shared hot-shingle kept-set helper (VERDICT r5 ask #1).

``subtract_hot_shingles`` is the one place the DF-cutoff subtraction
lives — Jaccard, containment, AND incremental all route through it,
so the >literal_max distributed fallback exists on every path. These
tests prove, on a synthetic extreme-boilerplate corpus:

  * the literal (array_except) and fallback (broadcast left-anti)
    branches produce IDENTICAL results;
  * the fallback branch actually engages (LeftAnti in the plan, no
    giant literal array) when the hot set exceeds literal_max;
  * the driver-side probe is bounded (limit(literal_max+1), never a
    full collect of the hot set);
  * the incremental path exercises the fallback end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_bifrost_spark.operators.dedup import (
    incremental_jaccard_pairs,
    ngram_jaccard_pairs,
    subtract_hot_shingles,
    with_shingles,
)

# 12 docs sharing one boilerplate tail (df=12 ⇒ hot at cutoff 4) plus
# a genuine near-dup pair with clean shingles.
BOILER = "all rights reserved worldwide reproduction strictly prohibited"


def _hot_corpus(spark):
    rows = [
        (i, f"unique lead sentence number {i} follows here {BOILER}")
        for i in range(12)
    ] + [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_literal_and_fallback_branches_agree(spark):
    docs = _hot_corpus(spark)
    lit = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, df_cutoff=4, literal_max=10_000).collect()
    }
    fb = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, df_cutoff=4, literal_max=0).collect()
    }
    assert lit == fb
    # the boilerplate family must NOT pair (only hot shingles shared);
    # the clean twin pair must survive both branches
    assert (100, 101) in {(a, b) for a, b, _ in lit}
    assert all(a >= 100 for a, b, _ in lit)


def test_fallback_branch_engages_in_plan(spark):
    docs = _hot_corpus(spark)
    base = with_shingles(docs).select("doc_id", "hshingles")
    kept_lit = subtract_hot_shingles(base, df_cutoff=4, literal_max=10_000)
    kept_fb = subtract_hot_shingles(base, df_cutoff=4, literal_max=0)
    lit_plan = kept_lit._jdf.queryExecution().optimizedPlan().toString()
    fb_plan = kept_fb._jdf.queryExecution().optimizedPlan().toString()
    assert "array_except" in lit_plan and "LeftAnti" not in lit_plan
    assert "LeftAnti" in fb_plan and "array_except" not in fb_plan
    # same kept sets either way (empty-array vs missing-row docs both
    # explode to zero rows; compare the exploded postings)
    explode = lambda df: {
        (r.doc_id, r.s)
        for r in df.select("doc_id", F.explode("hshingles").alias("s")).collect()
    }
    assert explode(kept_lit) == explode(kept_fb)


def test_probe_collect_is_bounded(spark, monkeypatch):
    """The branch decision must never pull more than literal_max+1 hot
    shingles onto the driver — pin by intercepting DataFrame.collect."""
    docs = _hot_corpus(spark)
    base = with_shingles(docs).select("doc_id", "hshingles")
    # Spark 4: pyspark.sql.DataFrame is an abstract facade — patch the
    # concrete class of the instances the helper actually builds.
    cls = type(base)
    seen = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        seen.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    subtract_hot_shingles(base, df_cutoff=4, literal_max=2)
    assert seen and max(seen) <= 3  # literal_max + 1, not the full hot set


def test_incremental_path_uses_fallback(spark):
    docs = _hot_corpus(spark)
    existing = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    lit = {
        (r.doc_new, r.doc_existing, r.jaccard)
        for r in incremental_jaccard_pairs(
            existing, incoming, df_cutoff=4, literal_max=10_000
        ).collect()
    }
    fb_df = incremental_jaccard_pairs(existing, incoming, df_cutoff=4, literal_max=0)
    fb = {(r.doc_new, r.doc_existing, r.jaccard) for r in fb_df.collect()}
    assert lit == fb
    assert (101, 100) in {(n, e) for n, e, _ in fb}
    assert "LeftAnti" in fb_df._jdf.queryExecution().optimizedPlan().toString()
