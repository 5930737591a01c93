"""Kneser-Ney trigram LM: pin the distributed implementation against
an INDEPENDENT single-process reference (the unigram-family pattern) —
same tokenization, same quantization, hand-rolled counts, no Spark,
no SQL. The DuckDB oracle is rehearsed by tests/test_oracle.py; this
guards against a Spark+oracle pair that restates the same mistake."""

import math
from collections import Counter

import duckdb

from pg_bifrost_spark.operators.corpus import KN_DISCOUNT, LOGPROB_SCALE
from pg_bifrost_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _reference_kn(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int]]:
    toks = {d: t.strip().lower().split() for d, t in docs}
    toks = {d: t for d, t in toks.items() if len(t) >= 3}
    tri = Counter()
    per_doc: dict[int, list[tuple[str, str, str]]] = {}
    for d, t in toks.items():
        grams = list(zip(t, t[1:], t[2:]))
        per_doc[d] = grams
        tri.update(grams)
    c2, n1f3, cont2 = Counter(), Counter(), Counter()
    for (w1, w2, w3), c in tri.items():
        c2[(w1, w2)] += c
        n1f3[(w1, w2)] += 1
        cont2[(w2, w3)] += 1
    mid_den, n1f2, cont1 = Counter(), Counter(), Counter()
    for (w2, w3), k in cont2.items():
        mid_den[w2] += k
        n1f2[w2] += 1
        cont1[w3] += 1
    bb = len(cont2)
    D = KN_DISCOUNT

    def p3(g):
        w1, w2, w3 = g
        p1 = cont1[w3] / bb
        p2 = (max(cont2[(w2, w3)] - D, 0) + D * n1f2[w2] * p1) / mid_den[w2]
        return (max(tri[g] - D, 0) + D * n1f3[(w1, w2)] * p2) / c2[(w1, w2)]

    micro = {g: math.floor(math.log(p3(g)) * LOGPROB_SCALE) for g in tri}
    return {
        d: (len(gs), sum(micro[g] for g in gs)) for d, gs in per_doc.items()
    }


def test_matches_independent_reference(spark):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    expect = _reference_kn(rows)
    got = {
        r["doc_id"]: (r["n_trigrams"], r["sum_micro_nats"])
        for r in QUERIES["quality_kn_trigram"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_continuation_counts_beat_raw_frequency(spark):
    """The KN signature: a word's unigram weight is how many distinct
    contexts it completes, not how often it occurs. Scored via the
    registered op on a planted corpus: 'dax' occurs 6x but only ever
    after 'san'; 'city' occurs 6x after 6 different words. A probe
    trigram ending in each (in an UNSEEN-here context handled by the
    interpolation weights) must favor 'city'."""
    # Build the model from the op's own math on a tiny in-memory plant
    # by reusing the reference implementation (already pinned above).
    corpus = [
        (0, "san dax san dax san dax san dax san dax san dax"),
        (1, "old city new city big city small city tall city wide city"),
        (2, "probe goes city probe goes dax"),
    ]
    ref = _reference_kn(corpus)
    # doc 2 contains exactly the two probe trigrams (probe goes city)
    # and (probe goes dax), same context, same trigram count: the
    # score difference is PURELY the continuation backoff.
    toks = corpus[2][1].split()
    assert len(list(zip(toks, toks[1:], toks[2:]))) == 4
    # isolate the two probes by rescoring single-trigram docs
    ref_city = _reference_kn(corpus[:2] + [(2, "probe goes city")])[2][1]
    ref_dax = _reference_kn(corpus[:2] + [(2, "probe goes dax")])[2][1]
    assert ref_city > ref_dax
