"""Unigram-LM tokenizer pins: the distributed Viterbi kernel must
match an INDEPENDENT forward-DP reference exactly (piece sequences,
not just counts), segmentations must reconstruct the text, scores must
be sums of table entries, and the EM refit's counts must equal the
segmentation's own piece usage."""

from __future__ import annotations

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.unigram import (
    UNI_MAX_PIECE,
    UNI_UNK_LP,
    _collect_vocab,
    unigram_em_refit,
    unigram_piece_table,
    unigram_tokenize,
    viterbi_segment,
)

plans.load_all()


def _forward_dp(text: str, vocab: dict[str, int]) -> tuple[list[str], int]:
    """Independent reference: FORWARD relaxation (module code walks
    backward over ending positions); longest-piece tie-break expressed
    as (score, piece_len) lexicographic max."""
    s = text.lower()
    n = len(s)
    NEG = float("-inf")
    best: list[tuple[float, int]] = [(NEG, 0)] * (n + 1)
    best[0] = (0, 0)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for j in range(n):
        if best[j][0] == NEG:
            continue
        for ln in range(1, min(UNI_MAX_PIECE, n - j) + 1):
            piece = s[j : j + ln]
            lp = vocab.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = UNI_UNK_LP
            cand = (best[j][0] + lp, ln)
            if cand > best[j + ln]:
                best[j + ln] = cand
                back[j + ln] = (j, piece)
    pieces, i = [], n
    while i > 0:
        j, p = back[i]
        pieces.append(p)
        i = j
    pieces.reverse()
    return pieces, int(best[n][0]) if n else 0


def test_kernel_matches_independent_dp(spark, sf_dir):
    docs = plans.table(spark, sf_dir, "documents")
    vocab = _collect_vocab(unigram_piece_table(docs))
    sample = {r.doc_id: r.text for r in docs.limit(40).collect()}
    for doc_id, text in sample.items():
        got_pieces, got_lp = viterbi_segment(text, vocab)
        want_pieces, want_lp = _forward_dp(text, vocab)
        assert got_lp == want_lp, doc_id
        assert got_pieces == want_pieces, doc_id
        # reconstruction + score-sum invariants
        assert "".join(got_pieces) == text.lower()
        assert got_lp == sum(vocab.get(p, UNI_UNK_LP) for p in got_pieces)


def test_tokenize_surface_is_exact_and_nonempty(spark, sf_dir):
    """The per-piece-count library surface (r12: the registry row
    became the per-doc tiling bounds check, gated by the driver)."""
    from pg_bifrost_spark.operators.unigram import unigram_tokenize

    docs = plans.table(spark, sf_dir, "documents")
    vocab = _collect_vocab(unigram_piece_table(docs))
    out = {r.doc_id: r for r in unigram_tokenize(docs, vocab).collect()}
    assert len(out) > 0
    for r in docs.limit(20).collect():
        pieces, lp = _forward_dp(r.text, vocab)
        row = out[r.doc_id]
        assert row.n_pieces == len(pieces)
        assert row.total_lp_micro == lp
        assert row.n_word_pieces == sum(1 for p in pieces if len(p) > 1)
        assert row.n_chars_covered == sum(len(p) for p in pieces)
    # fixture-statistics sanity: the top-K vocab covers most tokens, so
    # char pieces (inter-word spaces + the odd out-of-vocab word's
    # characters) stay within 1.5x of word pieces corpus-wide
    total_w = sum(r.n_word_pieces for r in out.values())
    total_c = sum(r.n_char_pieces for r in out.values())
    assert total_w > 0 and total_c <= 1.5 * total_w
    # the registered gate row over the same data: every boolean TRUE
    gate = plans.QUERIES["unigram_lm_tokenize"](spark, sf_dir).collect()
    assert gate and all(r.pieces_tile_text_ok and r.score_negative_ok for r in gate)


def test_em_refit_counts_equal_segmentation_usage(spark, sf_dir):
    docs = plans.table(spark, sf_dir, "documents")
    vocab = _collect_vocab(unigram_piece_table(docs))
    refit = {r.piece: r.cnt for r in unigram_em_refit(docs, vocab).collect()}
    want: dict[str, int] = {}
    for r in docs.collect():
        for p in viterbi_segment(r.text, vocab)[0]:
            want[p] = want.get(p, 0) + 1
    assert refit == want
    # mass conservation: total pieces == sum of counts
    tok = unigram_tokenize(docs, vocab)
    total = tok.groupBy().sum("n_pieces").collect()[0][0]
    assert sum(refit.values()) == total
