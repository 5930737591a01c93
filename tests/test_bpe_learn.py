"""Pin the distributed BPE trainer (``learn_bpe_merges``) against an
independently-formulated single-node implementation — the gate oracle's
plant deliberately avoids interacting merges (disjoint families), so
the general dynamics (merged symbols re-entering pair counts,
overlapping-run counting, lexicographic tie-breaks, greedy
left-to-right application) are proven here, the same split as the
JPEG decoder's independent-IDCT pin."""

from __future__ import annotations

from pg_bifrost_spark.operators.corpus import BPE_LEARN_STEPS, learn_bpe_merges


def reference_bpe(word_weights: dict[str, int], steps: int):
    """Dict-based single-node BPE trainer, written from the algorithm
    definition (count adjacent symbol pairs weighted by word count,
    merge the most frequent — ties to the lexicographically smallest
    (left, right) — greedily left-to-right, repeat)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_weights.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for step in range(1, steps + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, wgt in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + wgt
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, c))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, wgt in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + wgt
        vocab = new_vocab
    return merges


def _distributed(spark, word_weights: dict[str, int], steps: int):
    # local_vocab_max=0 forces the fully distributed iterative loop —
    # these small corpora would otherwise take the r12 small-vocab
    # driver arm and leave the distributed path untested
    df = spark.createDataFrame(
        list(word_weights.items()), "word string, weight bigint"
    )
    return learn_bpe_merges(df, steps, local_vocab_max=0)


def _local(spark, word_weights: dict[str, int], steps: int):
    df = spark.createDataFrame(
        list(word_weights.items()), "word string, weight bigint"
    )
    return learn_bpe_merges(df, steps, local_vocab_max=1 << 30)


def test_interacting_merges_match_reference(spark):
    """Merged symbols re-enter pair counting: 'abab' yields ('ab','ab')
    after step 1; overlapping runs ('aaab' counts (a,a) twice per
    word); ties break lexicographically ('xy' vs 'xz')."""
    corpus = {
        "abab": 5,   # (a,b) x2 per word, then (ab,ab) after the merge
        "aaab": 3,   # overlapping (a,a) run
        "xy": 7,     # ties with xz on (x,·) — lexicographic pick
        "xz": 7,
        "abxy": 2,   # cross-family word: both merges apply inside it
    }
    steps = 6
    got = _distributed(spark, corpus, steps)
    want = reference_bpe(corpus, steps)
    assert got == want, f"\n got={got}\nwant={want}"
    # the dynamics actually fired: some learned merge has a multi-char side
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in got)
    # the r12 small-vocab driver arm is the SAME algorithm — pin the
    # two arms against each other on the interacting corpus
    assert _local(spark, corpus, steps) == want


def test_fixture_text_matches_reference(spark):
    """The trainer on REAL fixture text (multi-char words, natural
    Zipf skew) matches the reference bit-for-bit, merge for merge."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""
        SELECT word, CAST(count(*) AS BIGINT) AS weight FROM (
          SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
          FROM '{sf}/documents.parquet'
        ) WHERE word <> '' GROUP BY word
        """
    ).fetchall()
    word_weights = {w: int(c) for w, c in rows}
    steps = 8
    df = spark.createDataFrame(
        list(word_weights.items()), "word string, weight bigint"
    )
    got = learn_bpe_merges(df, steps, local_vocab_max=0)
    want = reference_bpe(word_weights, steps)
    assert got == want, f"\n got={got}\nwant={want}"
    assert len(got) == steps
    # both arms on real Zipf-skewed text (the default arm for this
    # vocabulary size is the r12 local one)
    assert learn_bpe_merges(df, steps) == want


def test_saturation_stops_early(spark):
    """A vocabulary of single symbols has no pairs — the trainer
    returns fewer merges than requested instead of looping."""
    got = _distributed(spark, {"a": 3, "b": 2}, BPE_LEARN_STEPS)
    assert got == []
    assert _local(spark, {"a": 3, "b": 2}, BPE_LEARN_STEPS) == []


def test_empty_words_are_ignored(spark):
    """Spark's ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``, so a
    naive char-split of '' yields two ''-symbols and a phantom
    ('','') pair (code-review r10). An empty word — however heavy —
    must contribute nothing, matching the reference trainer, which
    produces no pairs for it."""
    corpus = {"": 10_000, "ab": 3, "ac": 2}
    got = _distributed(spark, corpus, 4)
    want = reference_bpe(corpus, 4)
    assert got == want, f"\n got={got}\nwant={want}"
    assert all(a and b for _, a, b, _ in got)
    assert _local(spark, corpus, 4) == want
