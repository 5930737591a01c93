"""SentencePiece-style unigram-LM tokenizer: Viterbi segmentation of
the raw character stream under a piece vocabulary with log-probability
scores, plus one hard-EM (Viterbi-EM) refit step — the OTHER major
tokenizer family next to BPE (``corpus.bpe_pair_merges`` /
``bpe_apply_merges`` cover the merge family in pure Catalyst).

Why a Python kernel here and not Catalyst: Viterbi is a per-document
DP whose inner loop indexes best[i-len] for len up to MAX_PIECE —
an interpreted higher-order-function encoding re-evaluates the
accumulator expression per element (the measured O(len²) hazard
documented at dedup.shingles_from_tokens), so this is exactly the
"genuinely can't express" case: an Arrow-batched mapInPandas kernel
with a BROADCAST piece table (a few hundred entries), embarrassingly
parallel per partition, integer-only scores.

Determinism: piece log-probs are BIGINT micro-nats (floor(1e6·ln p) —
the integer-quantization rule the oracle-backed ops use), the DP adds
integers only, and ties break on the LONGEST matching piece; replays
are byte-identical on any partitioning.

Scale posture: the piece table is O(vocab) and driver-bounded by
construction (top-K LIMIT + alphabet); the corpus is never collected
and each task needs only the broadcast dict — the same shape at 100 TB
with 1000 executors. Training (the EM refit) aggregates piece counts
with one groupBy over the segmented output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table

UNI_TOP_WORDS = 200   # word pieces: top-K by corpus frequency
UNI_MAX_PIECE = 12    # longest piece considered by the DP
UNI_LP_SCALE = 1_000_000
UNI_UNK_LP = -20_000_000  # ln(~2e-9) in micro-nats: unknown single char


def unigram_piece_table(docs: DataFrame, top_words: int = UNI_TOP_WORDS) -> DataFrame:
    """(piece, cnt, lp_micro): top-K whitespace words plus every
    single character (the closed fallback alphabet — guarantees any
    text segments). Probabilities over the combined piece multiset;
    lp_micro = floor(1e6 · ln(cnt/total)) as BIGINT."""
    words = (
        docs.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("piece"))
        .filter((F.length("piece") > 0) & (F.length("piece") <= UNI_MAX_PIECE))
        .groupBy("piece")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(top_words)
    )
    chars = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), "")).alias("piece"))
        .filter(F.length("piece") == 1)
        .groupBy("piece")
        .agg(F.count("*").alias("cnt"))
    )
    # a word that IS a single char would collide with its alphabet row:
    # keep the max count (they estimate the same event)
    pieces = (
        words.unionByName(chars)
        .groupBy("piece")
        .agg(F.max("cnt").alias("cnt"))
    )
    tot = pieces.agg(F.sum("cnt").alias("tot"))
    return pieces.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.floor(
            F.lit(UNI_LP_SCALE)
            * (F.log(F.col("cnt").cast("double")) - F.log(F.col("tot").cast("double")))
        )
        .cast("long")
        .alias("lp_micro"),
    )


def viterbi_segment(text: str, vocab: dict[str, int], max_len: int = UNI_MAX_PIECE,
                    unk_lp: int = UNI_UNK_LP) -> tuple[list[str], int]:
    """(pieces, total_lp_micro) for one document. best[i] = best score
    of s[:i]; candidates scanned longest-first with strict > so the
    LONGEST piece wins score ties. Unknown single chars take the UNK
    penalty (the alphabet fallback makes this rare)."""
    s = text.lower()
    n = len(s)
    best = [0] + [None] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        b, bb = None, None
        for ln in range(min(max_len, i), 0, -1):
            prev = best[i - ln]
            if prev is None:
                continue
            piece = s[i - ln : i]
            lp = vocab.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = unk_lp
            cand = prev + lp
            if b is None or cand > b:
                b, bb = cand, (i - ln, piece)
        best[i] = b
        back[i] = bb
    pieces: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]
        pieces.append(piece)
        i = j
    pieces.reverse()
    return pieces, best[n] if n else 0


def _collect_vocab(pieces: DataFrame) -> dict[str, int]:
    """Driver-side piece dict — bounded by construction (top-K LIMIT +
    single-char alphabet), the same bounded-collect contract as the
    ANN codebooks (similarity.py)."""
    return {r["piece"]: r["lp_micro"] for r in pieces.collect()}


def unigram_tokenize(docs: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """(doc_id, n_pieces, n_word_pieces, n_char_pieces, total_lp_micro,
    n_chars_covered) via the Arrow-batched Viterbi kernel; ``vocab``
    is broadcast."""
    sc = docs.sparkSession.sparkContext
    bv = sc.broadcast(vocab)

    def kernel(batches):
        import pandas as pd

        v = bv.value
        for pdf in batches:
            ids, np_, nw, nc, lp = [], [], [], [], []
            cov, low = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                pieces, total = viterbi_segment(text, v)
                ids.append(doc_id)
                np_.append(len(pieces))
                nw.append(sum(1 for p in pieces if len(p) > 1))
                nc.append(sum(1 for p in pieces if len(p) == 1))
                lp.append(total)
                # exact-coverage witness for the gate row: the piece
                # lengths must tile the text (r12). The lowered length
                # is emitted FROM THIS KERNEL so the tiling comparison
                # is same-process exact — JVM lower(), Python
                # str.lower(), and DuckDB's utf8proc disagree on
                # length-changing case mappings (U+0130 class), so
                # comparing kernel coverage against an engine-side
                # lower() length would flake on multilingual corpora
                # (code-review r12)
                cov.append(sum(len(p) for p in pieces))
                low.append(len(text.lower()) if text is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_pieces": np_,
                    "n_word_pieces": nw,
                    "n_char_pieces": nc,
                    "total_lp_micro": lp,
                    "n_chars_covered": cov,
                    "n_chars_lower": low,
                }
            )

    # documents is a single parquet split — without an explicit spread
    # the whole corpus lands in ONE kernel task (measured 7.6 s vs sub-
    # second; same trap with_shingles documents)
    from .dedup import spread

    return spread(docs.select("doc_id", "text"), "doc_id").mapInPandas(
        kernel,
        schema="doc_id bigint, n_pieces bigint, n_word_pieces bigint, "
        "n_char_pieces bigint, total_lp_micro bigint, n_chars_covered bigint, "
        "n_chars_lower bigint",
    )


def unigram_em_refit(docs: DataFrame, vocab: dict[str, int]) -> DataFrame:
    """One hard-EM (Viterbi-EM) step: re-segment under the current
    piece table, count piece usage (E), renormalize to new micro-nat
    log-probs (M). Returns (piece, cnt, lp_micro) for the pieces that
    survived (cnt > 0) — iterating this to a fixed point IS unigram
    tokenizer training (SentencePiece prunes low-mass pieces between
    steps; callers can filter on lp_micro)."""
    sc = docs.sparkSession.sparkContext
    bv = sc.broadcast(vocab)

    def kernel(batches):
        import pandas as pd

        v = bv.value
        for pdf in batches:
            out: dict[str, int] = {}
            for text in pdf["text"]:
                for p in viterbi_segment(text, v)[0]:
                    out[p] = out.get(p, 0) + 1
            yield pd.DataFrame(
                {"piece": list(out), "cnt": list(out.values())}
            )

    from .dedup import spread

    counts = (
        spread(docs.select("doc_id", "text"), "doc_id")
        .select("text")
        .mapInPandas(kernel, schema="piece string, cnt bigint")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )
    tot = counts.agg(F.sum("cnt").alias("tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.floor(
            F.lit(UNI_LP_SCALE)
            * (F.log(F.col("cnt").cast("double")) - F.log(F.col("tot").cast("double")))
        )
        .cast("long")
        .alias("lp_micro"),
    )


@register(
    "unigram_lm_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           true AS pieces_tile_text_ok,
           true AS score_negative_ok
    FROM documents WHERE text IS NOT NULL
    ORDER BY doc_id
    """,
)
def unigram_lm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi segmentation, driver-gated per document as a
    BOUNDS CHECK (r12; was rows-only — the DP is not SQL, but its
    tiling invariant is): the cross-engine value is the document's
    character count, and the engine booleans the oracle pins TRUE are
    (a) the segmentation's piece lengths tile the LOWERCASED text
    EXACTLY (sum len(piece) == len(text.lower()), both sides of the
    comparison computed INSIDE the Python kernel — a dropped or
    duplicated piece flips the row; the cross-engine n_chars value is
    the RAW codepoint count, which Spark and DuckDB agree on, unlike
    lowercased lengths — code-review r12) and (b) the Viterbi score
    is negative for any non-empty text (log-probs of a normalized
    table). Piece-level sequences stay pinned by tests/test_unigram.py
    against an independent forward DP. NULL-text rows are excluded on
    both sides (the kernel cannot segment NULL)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    vocab = _collect_vocab(unigram_piece_table(docs))
    tok = unigram_tokenize(docs, vocab)
    return (
        tok.join(docs.select("doc_id", F.length("text").cast("bigint").alias("n_chars")), "doc_id")
        .select(
            "doc_id",
            "n_chars",
            (F.col("n_chars_covered") == F.col("n_chars_lower")).alias(
                "pieces_tile_text_ok"
            ),
            (
                (F.col("total_lp_micro") < 0) | (F.col("n_chars") == 0)
            ).alias("score_negative_ok"),
        )
        .orderBy("doc_id")
    )


def unigram_em_top_pieces(
    spark: SparkSession, sf_dir: str, limit: int = 50
) -> DataFrame:
    """One Viterbi-EM refit over the documents corpus: top pieces by
    re-estimated mass (count desc, piece asc — deterministic). The
    per-piece library surface; the r12 gate row is the conservation
    summary below. Pin: piece counts must equal the tokenize query's
    own segmentation counts (tests/test_unigram.py)."""
    docs = table(spark, sf_dir, "documents")
    vocab = _collect_vocab(unigram_piece_table(docs))
    return (
        unigram_em_refit(docs, vocab)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(limit)
    )


@register(
    "unigram_em_step",
    oracle="""
    SELECT CAST(sum(length(text)) AS BIGINT) AS total_chars,
           true AS mass_tiles_corpus_ok,
           true AS lp_normalized_ok
    FROM documents WHERE text IS NOT NULL
    """,
)
def unigram_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi-EM refit, driver-gated as a BOUNDS CHECK (r12; was
    rows-only): the cross-engine value is the RAW corpus codepoint
    count (Spark and DuckDB agree on length(text); LOWERCASED lengths
    can differ across JVM / Python / utf8proc on U+0130-class
    mappings — code-review r12), and the engine booleans the oracle
    pins TRUE are (a) MASS CONSERVATION — the re-estimated piece
    counts, weighted by piece length, tile the LOWERCASED corpus
    exactly (sum cnt·len(piece) == sum len(text.lower()), BOTH sides
    Python-computed so the comparison is same-process exact; a
    Viterbi step that dropped or double-counted a span flips this),
    and (b) the M-step's
    re-normalized log-probs sum to ~1 in probability space (|sum
    exp(lp_micro/1e6) − 1| ≤ 1e-3; floor quantization loses < 1e-6
    per piece). The top-piece list stays available as
    ``unigram_em_top_pieces``."""
    docs = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    vocab = _collect_vocab(unigram_piece_table(docs))
    refit = unigram_em_refit(docs, vocab)
    stats = refit.agg(
        F.sum(F.col("cnt") * F.length("piece")).cast("bigint").alias("mass_chars"),
        F.sum(F.exp(F.col("lp_micro").cast("double") / 1e6)).alias("prob_mass"),
    )

    def lowered_len_kernel(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {"n": [sum(len(t.lower()) for t in pdf["text"] if t is not None)]}
            )

    lowered = (
        docs.select("text")
        .mapInPandas(lowered_len_kernel, schema="n long")
        .agg(F.sum("n").cast("bigint").alias("lowered_chars"))
    )
    chars = docs.agg(
        F.sum(F.length(F.col("text"))).cast("bigint").alias("total_chars")
    )
    return (
        stats.crossJoin(F.broadcast(chars))
        .crossJoin(F.broadcast(lowered))
        .select(
            "total_chars",
            (F.col("mass_chars") == F.col("lowered_chars")).alias(
                "mass_tiles_corpus_ok"
            ),
            (F.abs(F.col("prob_mass") - F.lit(1.0)) <= F.lit(1e-3)).alias(
                "lp_normalized_ok"
            ),
        )
    )
