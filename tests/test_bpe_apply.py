"""BPE merge application: the Catalyst fold chain must match an
independent naive Python scanner exactly (same left-to-right
non-overlap semantics, rank-chained merges included)."""

from __future__ import annotations

import re

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.corpus import (
    BPE_APPLY_MERGES,
    bpe_encode,
    merged_symbol,
)

plans.load_all()

SF = "/root/testdata/sf0.001"


def _tokens_py(text: str) -> list[str]:
    """Mirror _tokens() exactly: Spark trim() strips SPACES only (not
    tabs/newlines, unlike str.strip()), then split on \\s+ — a leading
    tab yields a leading empty token on both sides."""
    return re.split(r"\s+", text.strip(" ").lower())


def naive_encode(text: str) -> list[str]:
    toks = _tokens_py(text)
    for a, b in BPE_APPLY_MERGES:
        m = merged_symbol(a, b)
        out: list[str] = []
        for t in toks:
            if out and out[-1] == a and t == b:
                out[-1] = m
            else:
                out.append(t)
        toks = out
    return toks


def test_encode_matches_naive_scanner(spark):
    docs = spark.read.parquet(SF + "/documents.parquet")
    got = {
        r.doc_id: (r.n_tokens_before, r.n_tokens_after, r.encoded)
        for r in bpe_encode(docs).collect()
    }
    changed = 0
    for row in docs.select("doc_id", "text").collect():
        toks = _tokens_py(row.text)
        enc = naive_encode(row.text)
        assert got[row.doc_id] == (len(toks), len(enc), " ".join(enc)), row.doc_id
        if len(enc) < len(toks):
            changed += 1
    assert changed > 0, "merge table should be non-vacuous on the fixture"


def test_rank_chained_merge_and_overlap_semantics(spark):
    rows = [
        (1, "order fast now"),            # simple merge
        (2, "order order order fast"),    # non-overlap: [o+o, order+fast]
        (3, "order order fast"),          # rank chain: o+o then (o+o)+fast
        (4, "part filter part filter"),   # repeated non-overlapping
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.encoded for r in bpe_encode(docs).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == " ".join(naive_encode(text)), (doc_id, got[doc_id])
    # the rank-chained case merges all three tokens into one symbol
    assert got[3] == merged_symbol(merged_symbol("order", "order"), "fast")
    assert got[4] == " ".join([merged_symbol("part", "filter")] * 2)


def test_randomized_corpus_matches_naive(spark):
    """200 seeded random docs over the merge alphabet — adversarial
    adjacency patterns (runs, alternations, chains) in one batch."""
    import random

    rng = random.Random(0xB9E)
    alphabet = ["order", "fast", "part", "filter", "table", "hash", "x"]
    rows = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(1, 30))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.encoded for r in bpe_encode(docs).collect()}
    for doc_id, text in rows:
        assert got[doc_id] == " ".join(naive_encode(text)), (doc_id, text)


def test_tokenizer_twin_handles_nonspace_whitespace(spark):
    """Pin the _tokens()/_tokens_py equivalence on the edge str.strip()
    would hide: leading tab/newline whitespace survives Spark trim()."""
    rows = [(1, "\torder fast"), (2, "order fast\n"), (3, "  order fast  ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens_before, r.encoded) for r in bpe_encode(docs).collect()}
    for doc_id, text in rows:
        enc = naive_encode(text)
        assert got[doc_id] == (len(_tokens_py(text)), " ".join(enc)), (doc_id, got[doc_id])
