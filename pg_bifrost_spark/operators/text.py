"""Text-analysis operators over the ``documents`` table: token
statistics, language ID, quality scoring, fingerprinting.

All hot-path expressions are Spark built-ins (split/regexp/aggregate) —
whole-stage codegen, no Python per row. The same formulas are written
in the DuckDB oracles so every operator is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table

# A BPE-ish word/number/punct tokenizer both engines support (RE2-safe).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "mit", "von", "zu", "den", "ein"]
FR_STOPWORDS = ["le", "la", "de", "et", "est", "un", "une", "les", "des", "pour"]


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def lexical_diversity_ppm(toks_col: str = "toks") -> F.Column:
    """Unique-token ratio in integer parts-per-million — the shared
    float-free quality score behind ``preference_pair_build`` and the
    ``corpus_health_report`` capstone (oracles mirror it via
    ``LEX_SCORE_SQL``). Positive BIGINT division truncates identically
    in Spark (DIV) and DuckDB (//)."""
    # the multiply must run in BIGINT: size() is 32-bit and a document
    # with >2147 distinct tokens would wrap the INT product (DuckDB's
    # len() side is already BIGINT)
    return F.expr(
        f"CAST(size(array_distinct({toks_col})) AS BIGINT) * 1000000"
        f" DIV greatest(size({toks_col}), 1)"
    )


# DuckDB twin over a toks list column
LEX_SCORE_SQL = (
    "CAST(len(list_distinct(toks)) * 1000000"
    " // greatest(len(toks), 1) AS BIGINT)"
)


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
           length(text) AS n_chars_measured,
           len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS n_unique_words,
           length(replace(text, ' ', ''))::DOUBLE
             / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1)
             AS avg_word_len
    FROM documents ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: regex (BPE-ish) token count, char count,
    vocabulary size, average word length."""
    docs = table(spark, sf_dir, "documents")
    words = _tokens()
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.size(F.array_distinct(words)).alias("n_unique_words"),
        # raw int-ratio double (q1 hash discipline)
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            / F.greatest(F.size(words), F.lit(1))
        ).alias("avg_word_len"),
    ).orderBy("doc_id")


def _stopword_hits_sql(words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
        f" w -> list_contains([{lst}], w)))"
    )


def _stopword_hits(stopwords: list[str]) -> F.Column:
    return F.size(
        F.filter(_tokens(), lambda w: w.isin(stopwords))
    )


def guessed_lang() -> F.Column:
    """Stopword-vote language guess (en/de/fr, deterministic
    tie-break) — THE single guess definition shared by
    ``text_lang_id`` and ``lang_id_confusion`` (oracles mirror it via
    ``_GUESS_SQL``)."""
    en, de, fr = (
        _stopword_hits(EN_STOPWORDS),
        _stopword_hits(DE_STOPWORDS),
        _stopword_hits(FR_STOPWORDS),
    )
    return (
        F.when((en >= de) & (en >= fr), "en").when(de >= fr, "de").otherwise("fr")
    )


def _guess_sql() -> str:
    """DuckDB twin of ``guessed_lang`` over a documents-shaped
    relation with a ``text`` column."""
    return f"""CASE
             WHEN {_stopword_hits_sql(EN_STOPWORDS)} >= {_stopword_hits_sql(DE_STOPWORDS)}
              AND {_stopword_hits_sql(EN_STOPWORDS)} >= {_stopword_hits_sql(FR_STOPWORDS)}
              THEN 'en'
             WHEN {_stopword_hits_sql(DE_STOPWORDS)} >= {_stopword_hits_sql(FR_STOPWORDS)}
              THEN 'de'
             ELSE 'fr'
           END"""


_GUESS_SQL = _guess_sql()


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, {_GUESS_SQL} AS guessed_lang
    FROM documents ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free stopword-vote language ID (en/de/fr). A real system
    would use char-n-gram profiles; the plumbing (per-doc vote max) is
    identical and the tie-break is deterministic."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", guessed_lang().alias("guessed_lang")).orderBy(
        "doc_id"
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           0.4 * least(len(string_split_regex(lower(trim(text)), '\\s+')) / 50.0, 1.0)
           + 0.3 * ({_stopword_hits_sql(EN_STOPWORDS)}::DOUBLE
                    / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1))
           + 0.3 * (length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
                    / greatest(length(text), 1)) AS quality
    FROM documents ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + stopword density +
    alphabetic ratio (the classic C4/Gopher-style cheap filters)."""
    docs = table(spark, sf_dir, "documents")
    n_words = F.size(_tokens())
    length_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    stop_ratio = _stopword_hits(EN_STOPWORDS) / F.greatest(n_words, F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z ]", "")) / F.greatest(
        F.length("text"), F.lit(1)
    )
    return docs.select(
        "doc_id",
        # raw double: every term is an int-ratio (bit-identical across
        # engines) combined in the same association order; round(,4)
        # was boundary roulette (q1 hash discipline)
        (0.4 * length_score + 0.3 * stop_ratio + 0.3 * alpha_ratio).alias("quality"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
    SELECT source,
           count(DISTINCT md5(array_to_string(
             list_sort(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))), ' ')))
             AS n_fingerprints,
           count(*) AS n_docs
    FROM documents GROUP BY source ORDER BY source
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words fingerprint (sorted unique tokens → md5): the
    order-insensitive document identity used for fuzzy dedup grouping."""
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens()))))
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(F.countDistinct("fp").alias("n_fingerprints"), F.count("*").alias("n_docs"))
        .orderBy("source")
    )


@register(
    "text_rolling_hash",
    oracle="""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(
                   string_split_regex(lower(trim(text)), '\\s+'),
                   w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)),
               (acc, h) -> (acc * 31 + h) % 1000000007
             ) END AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the token stream (document
    fingerprinting primitive; e.g. for shift-resistant chunk identity).

    ORACLE-BACKED since r12 (was rows-only): the per-word hash is the
    first 8 hex digits of md5 — both engines agree byte-for-byte on
    md5, so the whole fingerprint is cross-engine exact integer
    arithmetic (word hash < 2^32, acc < 1e9+7, so acc*31 + h < 2^63;
    the fold is left-to-right in both F.aggregate and list_reduce).
    The r11 version hashed words with the Spark-only xxhash64, which
    is why it could not be hash-gated. NULL text → NULL fingerprint on
    BOTH sides (Spark's HOFs propagate NULL; DuckDB's
    list_prepend(7, NULL) would otherwise yield [7] → fingerprint 7,
    so the oracle carries an explicit CASE — code-review r12)."""
    docs = table(spark, sf_dir, "documents")
    word_hashes = F.transform(
        _tokens(), lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )
    rolling = F.aggregate(
        word_hashes,
        F.lit(7).cast("long"),
        lambda acc, h: F.pmod(acc * 31 + h, F.lit(1_000_000_007)),
    )
    return docs.select("doc_id", rolling.alias("fingerprint")).orderBy("doc_id")


def _ngram_col(toks: str, n: int) -> F.Column:
    """Word n-grams over a MATERIALIZED token-array column (HOF lambdas
    must index a real column, not recompute the split per element).
    Empty when the doc has fewer than n tokens (sequence() would
    otherwise count DOWN for start > stop)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(F.col(toks), i + k) for k in range(n)]
    )
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def _ngram_sql(n: int) -> str:
    """DuckDB mirror of ``_ngram_col`` (1-indexed lists; range()
    excludes the stop and is empty when stop <= start)."""
    parts = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return f"list_transform(range(1, len(toks) - {n - 2}), i -> {parts})"


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id, 2 AS gram_n, unnest({_ngram_sql(2)}) AS g FROM tok
      UNION ALL
      SELECT doc_id, 3 AS gram_n, unnest({_ngram_sql(3)}) AS g FROM tok
    ),
    counts AS (
      SELECT doc_id, gram_n, g, count(*) AS c FROM grams GROUP BY ALL
    )
    SELECT doc_id, gram_n,
           sum(c)::BIGINT AS total_grams,
           count(*)::BIGINT AS distinct_grams,
           (sum(c) - count(*))::DOUBLE / sum(c) AS dup_frac,
           max(c)::DOUBLE / sum(c) AS top_frac
    FROM counts GROUP BY doc_id, gram_n ORDER BY doc_id, gram_n
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition metrics (the Rae/Gopher repetition
    filter): per doc and n-gram order, the fraction of n-grams that are
    duplicates and the fraction taken by the single most frequent
    n-gram. One explode + a two-level aggregate — partial-agg friendly,
    no per-doc state, scales linearly in corpus size."""
    docs = table(spark, sf_dir, "documents").withColumn("toks", _tokens())
    grams = docs.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(_ngram_col("toks", 2), lambda g: F.struct(F.lit(2).alias("gram_n"), g.alias("g"))),
                F.transform(_ngram_col("toks", 3), lambda g: F.struct(F.lit(3).alias("gram_n"), g.alias("g"))),
            )
        ).alias("t"),
    ).select("doc_id", "t.gram_n", "t.g")
    counts = grams.groupBy("doc_id", "gram_n", "g").agg(F.count("*").alias("c"))
    total = F.sum("c")
    return (
        counts.groupBy("doc_id", "gram_n")
        .agg(
            total.alias("total_grams"),
            F.count("*").alias("distinct_grams"),
            # raw int-ratio doubles (q1 hash discipline)
            ((total - F.count("*")) / total).alias("dup_frac"),
            (F.max("c") / total).alias("top_frac"),
        )
        .orderBy("doc_id", "gram_n")
    )


# Gopher-style rule thresholds (Rae et al. 2021, Table A1) — the word
# bound straddles the fixtures' 10-99-word spread so both outcomes are
# exercised.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_WLEN, GOPHER_MAX_WLEN = 3.0, 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_ALPHA_FRAC = 0.8


def gopher_keep_parts(text_col: str = "text", toks_col: str = "toks"):
    """The Gopher rule predicates over a doc with materialized tokens
    — THE single definition both ``quality_gopher_rules`` and the
    ``training_set_build`` capstone (and their oracles, byte-mirrored)
    compose from. Returns (n_words, mean_wlen, ok_words, ok_wlen,
    ok_stop, ok_alpha) columns."""
    n_words = F.size(toks_col)
    mean_wlen = F.length(
        F.replace(F.col(text_col), F.lit(" "), F.lit(""))
    ) / F.greatest(n_words, F.lit(1))
    ok_words = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    ok_wlen = mean_wlen.between(GOPHER_MIN_WLEN, GOPHER_MAX_WLEN)
    ok_stop = (
        F.size(F.array_distinct(F.filter(toks_col, lambda w: w.isin(EN_STOPWORDS))))
        >= GOPHER_MIN_STOPWORDS
    )
    ok_alpha = (
        F.size(F.filter(toks_col, lambda w: w.rlike("[a-z]")))
        / F.greatest(n_words, F.lit(1))
        >= GOPHER_MIN_ALPHA_FRAC
    )
    return n_words, mean_wlen, ok_words, ok_wlen, ok_stop, ok_alpha


@register(
    "quality_gopher_rules",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             length(replace(text, ' ', ''))::DOUBLE AS nonspace_chars
      FROM documents
    )
    SELECT doc_id,
           len(toks)::BIGINT AS n_words,
           nonspace_chars / greatest(len(toks), 1) AS mean_word_len,
           (len(toks) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS ok_word_count,
           (nonspace_chars / greatest(len(toks), 1)
              BETWEEN {GOPHER_MIN_WLEN} AND {GOPHER_MAX_WLEN}) AS ok_mean_word_len,
           (len(list_distinct(list_filter(toks,
              w -> list_contains({EN_STOPWORDS!r}, w)))) >= {GOPHER_MIN_STOPWORDS})
             AS ok_stopwords,
           (len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::DOUBLE
              / greatest(len(toks), 1) >= {GOPHER_MIN_ALPHA_FRAC}) AS ok_alpha_words,
           ((len(toks) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
            AND (nonspace_chars / greatest(len(toks), 1)
                   BETWEEN {GOPHER_MIN_WLEN} AND {GOPHER_MAX_WLEN})
            AND (len(list_distinct(list_filter(toks,
                   w -> list_contains({EN_STOPWORDS!r}, w)))) >= {GOPHER_MIN_STOPWORDS})
            AND (len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::DOUBLE
                   / greatest(len(toks), 1) >= {GOPHER_MIN_ALPHA_FRAC})) AS keep
    FROM feat ORDER BY doc_id
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher heuristic quality battery as per-rule booleans plus
    the conjunctive keep flag: word-count bounds, mean word length,
    stopword presence, alphabetic-word fraction. Pure column
    expressions (codegen, no shuffle beyond the scan) — at 100 TB this
    is a map-only pass suitable as the first filter stage."""
    docs = table(spark, sf_dir, "documents").withColumn("toks", _tokens())
    n_words, mean_wlen, ok_words, ok_wlen, ok_stop, ok_alpha = gopher_keep_parts()
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        ok_words.alias("ok_word_count"),
        ok_wlen.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha_words"),
        (ok_words & ok_wlen & ok_stop & ok_alpha).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4-style cleaning rules (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------
# The OTHER canonical public cleaning recipe next to Gopher: C4 keeps
# lines that end in terminal punctuation AND have >= 5 words, and
# drops whole pages containing '{' (code), 'lorem ipsum' (placeholder
# boilerplate), or fewer than 3 sentences after line filtering. The
# documents fixture is single-line word soup, so the gate query plants
# line structure by doc_id MODs (mirrored byte-exactly in the oracle,
# same move as structure.py's paragraph/line fixtures): every doc gets
# a terminal '.', %3 docs two extra good sentences, %4 a short
# punct-less nav line, %5 a '{' code line, %7 a lorem-ipsum line.
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
_C4_GOOD_A = "this page has plenty of well formed sentences."
_C4_GOOD_B = "each of them ends with terminal punctuation today."
_C4_NAV = "menu home about"
_C4_CODE = "function main() { return 1; }"
_C4_LOREM = "Lorem ipsum dolor sit amet consectetur adipiscing elit."


def c4_line_keep(line: F.Column) -> F.Column:
    """C4 line rule: terminal punctuation AND >= 5 words."""
    return line.rlike("[.!?]$") & (
        F.size(F.split(F.trim(line), r"\s+")) >= C4_MIN_LINE_WORDS
    )


def c4_doc_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc C4 report: line counts before/after the line rule,
    sentence count over kept lines, and the page-level keep flag.
    Map-only — every column is a higher-order function over the
    split-lines array, no explode, no shuffle; at 100 TB this runs
    inside the scan stage like the Gopher battery."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, c4_line_keep)
    n_sentences = F.regexp_count(F.array_join(kept, "\n"), F.lit(r"[.!?]"))
    keep_doc = (
        (n_sentences >= C4_MIN_SENTENCES)
        & ~F.col(text_col).contains("{")
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
    )
    return docs.select(
        "doc_id",
        F.size(lines).alias("lines_total"),
        F.size(kept).alias("lines_kept"),
        n_sentences.alias("n_sentences"),
        keep_doc.alias("keep"),
    )


@register(
    "quality_c4_rules",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text || '.'
             || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || '{_C4_GOOD_A}' || chr(10) || '{_C4_GOOD_B}'
                     ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_C4_NAV}' ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '{_C4_CODE}' ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN chr(10) || '{_C4_LOREM}' ELSE '' END
               AS text
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS lines,
             list_filter(string_split(text, chr(10)),
                         l -> regexp_matches(l, '[.!?]$')
                              AND len(string_split_regex(trim(l), '\\s+'))
                                    >= {C4_MIN_LINE_WORDS}) AS kept,
             contains(text, '{{') AS has_brace,
             contains(lower(text), 'lorem ipsum') AS has_lorem
      FROM planted
    )
    SELECT doc_id,
           len(lines)::BIGINT AS lines_total,
           len(kept)::BIGINT AS lines_kept,
           len(regexp_extract_all(coalesce(list_aggregate(kept, 'string_agg', chr(10)), ''),
                                  '[.!?]'))::INT AS n_sentences,
           (len(regexp_extract_all(coalesce(list_aggregate(kept, 'string_agg', chr(10)), ''),
                                   '[.!?]')) >= {C4_MIN_SENTENCES}
            AND NOT has_brace AND NOT has_lorem) AS keep
    FROM feat ORDER BY doc_id
    """,
)
def quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning over the planted-line fixture: the gate proves the
    line rule (nav line dropped, good sentences kept), the sentence
    floor (only %3 docs reach 3 sentences), and both page-level
    killers ('{{' at %5, lorem-ipsum at %7) against the oracle's
    independent SQL evaluation."""
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("."),
            F.when(did % 3 == 0, F.lit("\n" + _C4_GOOD_A + "\n" + _C4_GOOD_B)).otherwise(F.lit("")),
            F.when(did % 4 == 0, F.lit("\n" + _C4_NAV)).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.lit("\n" + _C4_CODE)).otherwise(F.lit("")),
            F.when(did % 7 == 0, F.lit("\n" + _C4_LOREM)).otherwise(F.lit("")),
        ),
    )
    return c4_doc_report(planted).orderBy("doc_id")


# ---------------------------------------------------------------------------
# per-paragraph language mixture (multilingual-document detection)
# ---------------------------------------------------------------------------
# Corpus curation needs to know not just a doc's dominant language but
# whether it MIXES languages (multilingual pages get routed to their
# own pipeline or dropped). Same stopword-vote classifier as
# text_lang_id, applied per PARAGRAPH; the fixture plants a German
# paragraph on %2 docs (a SECOND on %4, so dominance flips off 'en'
# there) and a French one on %3 docs,
# mirrored byte-exactly in the oracle.
_DE_PARA = "der hund und die katze das ist von zu den ein haus mit garten"
_FR_PARA = "le chat et la maison est un jardin une les arbres des fleurs pour toi"


def _para_lang(ptoks: F.Column) -> F.Column:
    """Stopword-vote language of one paragraph's MATERIALIZED token
    array (en/de/fr), same tie-break order as text_lang_id. Takes
    tokens, not raw text: tokenizing inside the vote would re-split
    the paragraph once per language (the shingles_from_tokens
    re-evaluation hazard)."""
    def hits(words: list[str]) -> F.Column:
        return F.size(F.filter(ptoks, lambda w: w.isin(words)))

    en, de, fr = hits(EN_STOPWORDS), hits(DE_STOPWORDS), hits(FR_STOPWORDS)
    return (
        F.when((en >= de) & (en >= fr), "en").when(de >= fr, "de").otherwise("fr")
    )


def _para_lang_sql() -> str:
    def hits(words: list[str]) -> str:
        lst = ", ".join(f"'{w}'" for w in words)
        return (
            "len(list_filter(string_split_regex(lower(trim(p)), '\\s+'),"
            f" w -> list_contains([{lst}], w)))"
        )

    return f"""CASE
             WHEN {hits(EN_STOPWORDS)} >= {hits(DE_STOPWORDS)}
              AND {hits(EN_STOPWORDS)} >= {hits(FR_STOPWORDS)} THEN 'en'
             WHEN {hits(DE_STOPWORDS)} >= {hits(FR_STOPWORDS)} THEN 'de'
             ELSE 'fr'
           END"""


@register(
    "doc_language_mixture",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 2 = 0 THEN chr(10) || '{_DE_PARA}' ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_DE_PARA}' ELSE '' END
             || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_FR_PARA}' ELSE '' END
               AS text
      FROM documents
    ),
    langs AS (
      SELECT doc_id,
             list_transform(string_split(text, chr(10)), p -> {_para_lang_sql()})
               AS ls
      FROM planted
    )
    SELECT doc_id,
           len(ls)::BIGINT AS n_paras,
           len(list_filter(ls, l -> l = 'en'))::BIGINT AS n_en,
           len(list_filter(ls, l -> l = 'de'))::BIGINT AS n_de,
           len(list_filter(ls, l -> l = 'fr'))::BIGINT AS n_fr,
           CASE
             WHEN len(list_filter(ls, l -> l = 'en')) >= len(list_filter(ls, l -> l = 'de'))
              AND len(list_filter(ls, l -> l = 'en')) >= len(list_filter(ls, l -> l = 'fr'))
              THEN 'en'
             WHEN len(list_filter(ls, l -> l = 'de')) >= len(list_filter(ls, l -> l = 'fr'))
              THEN 'de'
             ELSE 'fr'
           END AS dominant_lang,
           (len(list_distinct(ls)) > 1) AS is_multilingual
    FROM langs ORDER BY doc_id
    """,
)
def doc_language_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level language histogram per document. Map-only:
    paragraph classification is a higher-order transform over the
    split array (the langs array is MATERIALIZED in a first projection
    so the four downstream aggregates don't re-run the classifier —
    the shingles_from_tokens re-evaluation hazard), no explode, no
    shuffle beyond the output sort."""
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(did % 2 == 0, F.lit("\n" + _DE_PARA)).otherwise(F.lit("")),
            F.when(did % 4 == 0, F.lit("\n" + _DE_PARA)).otherwise(F.lit("")),
            F.when(did % 3 == 0, F.lit("\n" + _FR_PARA)).otherwise(F.lit("")),
        ),
    )
    ptoks = planted.select(
        "doc_id",
        F.transform(
            F.split("text", "\n"), lambda p: F.split(F.lower(F.trim(p)), r"\s+")
        ).alias("pt"),
    )
    langs = ptoks.select("doc_id", F.transform("pt", _para_lang).alias("ls"))
    n = lambda lang: F.size(F.filter("ls", lambda l: l == lang))  # noqa: E731
    counted = langs.select(
        "doc_id",
        F.size("ls").alias("n_paras"),
        n("en").alias("n_en"),
        n("de").alias("n_de"),
        n("fr").alias("n_fr"),
    )
    return counted.select(
        "*",
        F.when(
            (F.col("n_en") >= F.col("n_de")) & (F.col("n_en") >= F.col("n_fr")), "en"
        )
        .when(F.col("n_de") >= F.col("n_fr"), "de")
        .otherwise("fr")
        .alias("dominant_lang"),
        (
            (F.col("n_en") > 0).cast("int")
            + (F.col("n_de") > 0).cast("int")
            + (F.col("n_fr") > 0).cast("int")
            > 1
        ).alias("is_multilingual"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# code-vs-prose detection
# --------------------------------------------------------------------------
# Pretraining mixtures track code share explicitly (and code wants
# different cleaning than prose), so the pipeline needs a cheap
# in-scan classifier: symbol density + keyword tokens + semicolon
# line endings. The decision path is ALL-INTEGER (cross-multiplied
# thresholds), so the oracle hash cannot drift.
#
# The natural fixture corpus is prose-only — a constant-false output
# would gate-pass vacuously (memory rule: check VARIETY, not just
# rows) — so every doc_id % CODE_MOD == 0 document is REPLACED by a
# deterministic two-line pseudo-function parameterized by doc_id,
# mirrored byte-exactly in the oracle via chr(10) concatenation.
CODE_MOD = 16  # divides gen_sf.STRIDE=10^8, so sf1 replicas reproduce the plant
CODE_KEYWORDS = ("def", "return", "import", "class", "function", "const", "var")
_KW_SQL = ", ".join(f"'{k}'" for k in CODE_KEYWORDS)
CODE_SYMBOL_RE = "[(){};=<>*]"
CODE_SYM_PERMILLE = 30  # symbols/chars >= 3.0%
CODE_MIN_KEYWORDS = 2

PLANTED_CODE_SQL = f"""documents_code AS (
      SELECT doc_id,
             CASE WHEN doc_id % {CODE_MOD} = 0 THEN
               'def f_' || doc_id || '(x):' || chr(10) ||
               '    y = x * ' || doc_id || ';' || chr(10) ||
               '    return y;'
             ELSE text END AS text,
             source
      FROM documents
    )"""


def plant_code_docs(df: DataFrame) -> DataFrame:
    """Byte-exact twin of PLANTED_CODE_SQL."""
    snippet = F.concat(
        F.lit("def f_"),
        F.col("doc_id").cast("string"),
        F.lit("(x):\n    y = x * "),
        F.col("doc_id").cast("string"),
        F.lit(";\n    return y;"),
    )
    return df.withColumn(
        "text",
        F.when(F.col("doc_id") % CODE_MOD == 0, snippet).otherwise(F.col("text")),
    )


@register(
    "quality_code_detect",
    oracle=f"""
    WITH {PLANTED_CODE_SQL},
    feat AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text)
                  - length(regexp_replace(text, '{CODE_SYMBOL_RE}', '', 'g'))
                  AS BIGINT) AS n_symbols,
             CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\\s+'),
                    t -> list_contains([{_KW_SQL}], t))) AS BIGINT) AS n_keywords,
             CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             CAST(len(list_filter(string_split(text, chr(10)),
                                  l -> ends_with(l, ';'))) AS BIGINT) AS semi_lines
      FROM documents_code
    )
    SELECT doc_id, n_chars, n_symbols, n_keywords, n_lines, semi_lines,
           CAST((n_symbols * 1000) // greatest(n_chars, 1) AS BIGINT) AS sym_permille,
           (n_keywords >= {CODE_MIN_KEYWORDS}
            AND n_symbols * 1000 >= {CODE_SYM_PERMILLE} * n_chars) AS is_code
    FROM feat ORDER BY doc_id
    """,
)
def quality_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document code-vs-prose heuristic: structural symbol density
    ({CODE_SYMBOL_RE}), programming-keyword token count, and
    semicolon-terminated line count, combined into an all-integer
    decision (cross-multiplied permille threshold AND a keyword
    floor).

    Plan: one map-only projection — regexp strip, token filter, and
    line split are all JVM higher-order functions inside one
    whole-stage-codegen span; zero shuffles before the output sort.
    At 100 TB this runs at scan speed and is exactly the shape you
    fold into the refinery's first pass."""
    docs = plant_code_docs(table(spark, sf_dir, "documents"))
    kw = F.array(*[F.lit(k) for k in CODE_KEYWORDS])
    feat = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", CODE_SYMBOL_RE, ""))
        ).cast("bigint").alias("n_symbols"),
        F.size(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: F.array_contains(kw, t),
            )
        ).cast("bigint").alias("n_keywords"),
        F.size(F.split(F.col("text"), "\n", -1)).cast("bigint").alias("n_lines"),
        F.size(
            F.filter(
                F.split(F.col("text"), "\n", -1), lambda l: l.endswith(";")
            )
        ).cast("bigint").alias("semi_lines"),
    )
    return feat.select(
        "*",
        F.expr("(n_symbols * 1000) DIV greatest(n_chars, 1)").cast("bigint").alias("sym_permille"),
        (
            (F.col("n_keywords") >= CODE_MIN_KEYWORDS)
            & (F.col("n_symbols") * 1000 >= CODE_SYM_PERMILLE * F.col("n_chars"))
        ).alias("is_code"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# language-ID agreement matrix
# --------------------------------------------------------------------------
# The labeled corpus carries an upstream ``lang`` field; the in-scan
# detector produces its own guess. The confusion matrix between them
# is the quality-control panel that decides whether the upstream
# labels can be trusted for mixture weighting — systematic
# (label, guess) off-diagonals localize either a mislabeled ingest
# feed or a detector blind spot to specific cells.


# The fixture corpus votes 'en' on every document (its synthetic text
# carries only English stopwords), which would make the guessed column
# CONSTANT — a vacuous matrix (the output-variety rule). The gate
# query therefore PLANTS decisive German/French stopword runs into two
# doc_id % {mod} slices (16 divides gen_sf.STRIDE and spreads over
# sources), mirrored byte-exactly in the oracle: the matrix then has
# real diagonal and off-diagonal mass in every guess column.
_LANG_PLANT_MOD = 16
_DE_RUN = " " + " ".join(DE_STOPWORDS * 3)
_FR_RUN = " " + " ".join(FR_STOPWORDS * 3)


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH docs_l AS (
      SELECT lang,
             CASE WHEN doc_id % {_LANG_PLANT_MOD} = 1 THEN text || '{_DE_RUN}'
                  WHEN doc_id % {_LANG_PLANT_MOD} = 2 THEN text || '{_FR_RUN}'
                  ELSE text END AS text
      FROM documents
    )
    SELECT lang AS labeled_lang,
           {_GUESS_SQL} AS guessed_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM docs_l
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(labeled_lang, guessed_lang, n_docs) confusion matrix between
    the corpus's lang labels and the stopword-vote detector, over the
    stopword-planted corpus (see _LANG_PLANT_MOD above).

    Plan: the plant and the guess are map-side projections (the shared
    ``guessed_lang`` expression — zero joins, zero Python), then ONE
    map-side-combined groupBy on the ≤|langs|² key space. Scales as a
    single scan at any corpus size."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % _LANG_PLANT_MOD == 1,
            F.concat(F.col("text"), F.lit(_DE_RUN)),
        )
        .when(
            F.col("doc_id") % _LANG_PLANT_MOD == 2,
            F.concat(F.col("text"), F.lit(_FR_RUN)),
        )
        .otherwise(F.col("text")),
    )
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            guessed_lang().alias("guessed_lang"),
        )
        .groupBy("labeled_lang", "guessed_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("labeled_lang", "guessed_lang")
    )


# --------------------------------------------------------------------------
# tokenizer fertility by language
# --------------------------------------------------------------------------
# Fertility (characters consumed per emitted token) is the
# per-language cost model a token-budget planner needs: the same byte
# budget buys different token counts per language, and a fertility
# shift after a tokenizer change is the canonical regression signal.
# Both tokenizations already exist in-repo: whitespace words and the
# BPE-ish TOKEN_RE regex pass (text_token_stats) — this is their
# per-language rollup, all-integer (chars·10⁶ DIV tokens).


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                AS BIGINT) AS total_words,
           CAST(sum(len(regexp_extract_all(text, '{TOKEN_RE}')))
                AS BIGINT) AS total_regex_tokens,
           CAST(sum(length(text)) * 1000000
                // greatest(sum(len(regexp_extract_all(text, '{TOKEN_RE}'))), 1)
             AS BIGINT) AS chars_per_token_micro
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: characters per BPE-ish regex
    token in integer micro units, plus the raw char/word/token
    volumes.

    Plan: map-only per-doc counts (length, word split, regex extract —
    all JVM expressions), ONE map-side-combined groupBy on the
    |langs|-sized key. The sums run in BIGINT end to end; the final
    ratio is a positive integer division (truncates identically in
    both engines)."""
    docs = table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("chars"),
        F.size(_tokens()).cast("bigint").alias("words"),
        # pattern via F.lit, NOT an F.expr SQL literal — Spark SQL
        # string parsing eats the backslash in \s, silently turning
        # the char class into [^A-Za-z0-9s] (which matches spaces)
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0))
        .cast("bigint")
        .alias("rtoks"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("chars").cast("bigint").alias("total_chars"),
            F.sum("words").cast("bigint").alias("total_words"),
            F.sum("rtoks").cast("bigint").alias("total_regex_tokens"),
            F.expr(
                "CAST(sum(chars) * 1000000 DIV greatest(sum(rtoks), 1) AS BIGINT)"
            ).alias("chars_per_token_micro"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Readability scores (Flesch Reading Ease / Flesch-Kincaid grade)
# --------------------------------------------------------------------------
# The classic curriculum/quality signals, computed float-free so the
# decision path hashes identically in both engines: words = whitespace
# tokens; sentences = [.!?]+ runs with a floor of 1 (headline-style
# fragments count as one sentence); syllables = vowel-group runs
# ([aeiouy]+) with the standard >=1-per-word floor applied at the
# document level (greatest(words, vowel_groups) — the per-word floor
# and the corpus-level floor agree unless a token is vowel-free).
# FRE = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words) and
# FK grade = 0.39*(w/s) + 11.8*(syl/w) - 15.59, both carried in
# milli-points over ppm-precision ratios: positive BIGINT DIV
# truncates identically in Spark and DuckDB, so bucket edges can never
# drift between the engines.
@register(
    "text_readability_scores",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
             greatest(len(string_split_regex(lower(trim(text)), '\\s+')),
                      len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS n_syll
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_words, n_sentences, n_syll,
             n_words * 1000000 // n_sentences AS wps_ppm,
             n_syll * 1000000 // greatest(n_words, 1) AS spw_ppm
      FROM m
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syll AS BIGINT) AS n_syllables,
           CAST(206835 - (1015 * wps_ppm) // 1000000
                       - (84600 * spw_ppm) // 1000000 AS BIGINT) AS fre_milli,
           CAST((390 * wps_ppm) // 1000000
                + (11800 * spw_ppm) // 1000000 - 15590 AS BIGINT) AS grade_milli,
           CASE WHEN 206835 - (1015 * wps_ppm) // 1000000
                           - (84600 * spw_ppm) // 1000000 >= 90000 THEN 'very_easy'
                WHEN 206835 - (1015 * wps_ppm) // 1000000
                           - (84600 * spw_ppm) // 1000000 >= 60000 THEN 'standard'
                WHEN 206835 - (1015 * wps_ppm) // 1000000
                           - (84600 * spw_ppm) // 1000000 >= 30000 THEN 'difficult'
                ELSE 'very_confusing' END AS level
    FROM r ORDER BY doc_id
    """,
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade per document, with a
    four-bucket level label — the standard readability-based quality/
    curriculum signal over the documents table.

    Plan: three regexp counts and integer arithmetic per row — zero
    shuffles before the presentation sort, zero Python, all inside
    whole-stage codegen; runs at parquet scan speed at any corpus
    size. All ratios are ppm-precision BIGINTs (positive DIV truncates
    identically in both engines), so the scores AND the bucket edges
    hash-match the oracle exactly."""
    # counts are cast to BIGINT BEFORE the ppm multiplies: size() is
    # 32-bit and a >2147-token document would wrap n_words * 1000000
    # (the module's own documented hazard at lexical_diversity_ppm —
    # code-review r10-late #2); _tokens() is the canonical tokenizer,
    # shared so a future tokenization change cannot desynchronize word
    # counts from the rest of the suite
    toks = _tokens()
    m = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.greatest(
            F.lit(1), F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), 0))
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.greatest(
            F.size(toks),
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)),
        )
        .cast("bigint")
        .alias("n_syll"),
    )
    r = m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syll",
        F.expr("n_words * 1000000 DIV n_sentences").alias("wps_ppm"),
        F.expr("n_syll * 1000000 DIV greatest(n_words, 1)").alias("spw_ppm"),
    )
    fre = "206835 - (1015 * wps_ppm) DIV 1000000 - (84600 * spw_ppm) DIV 1000000"
    return r.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        F.col("n_syll").cast("bigint").alias("n_syllables"),
        F.expr(f"CAST({fre} AS BIGINT)").alias("fre_milli"),
        F.expr(
            "CAST((390 * wps_ppm) DIV 1000000 + (11800 * spw_ppm) DIV 1000000 "
            "- 15590 AS BIGINT)"
        ).alias("grade_milli"),
        F.expr(
            f"CASE WHEN {fre} >= 90000 THEN 'very_easy' "
            f"WHEN {fre} >= 60000 THEN 'standard' "
            f"WHEN {fre} >= 30000 THEN 'difficult' "
            "ELSE 'very_confusing' END"
        ).alias("level"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# r11: sentence segmentation
# ---------------------------------------------------------------------------
# Lookaround-free sentence pattern (Java-regex ∩ RE2): a maximal run of
# non-terminators followed by a terminator run. A trailing fragment
# with no terminal punctuation is NOT a sentence under this rule —
# deterministic and identical on both engines, which matters more for
# a corpus statistic than linguistic edge perfection.
SENT_RE = "[^.!?]+[.!?]+"
# Spark-side twin: possessive first class (java.util.regex). Greedy ==
# possessive here because the classes are disjoint (see
# text_sentence_segments docstring); RE2 (DuckDB) rejects possessive
# quantifiers, so the oracle keeps SENT_RE.
SENT_RE_POSSESSIVE = "[^.!?]++[.!?]+"


@register(
    "text_sentence_segments",
    oracle=f"""
    WITH seg AS (
      SELECT doc_id,
             regexp_extract_all(text, '{SENT_RE}') AS sents
      FROM documents
    ), agg AS (
      SELECT doc_id,
             CAST(coalesce(len(sents), 0) AS BIGINT) AS n_sentences,
             CASE WHEN coalesce(len(sents), 0) > 0
                  THEN CAST(len(string_split_regex(
                         trim(array_to_string(sents, ' ')), '\\s+'
                       )) AS BIGINT)
                  ELSE 0 END AS n_words
      FROM seg
    )
    SELECT doc_id, n_sentences, n_words,
           CASE WHEN n_sentences > 0
                THEN CAST(n_words AS DOUBLE) / n_sentences END
             AS avg_words_per_sentence
    FROM agg ORDER BY doc_id
    """,
)
def text_sentence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based sentence segmentation: split each document into
    terminator-delimited sentences and report per-doc sentence/word
    counts and mean sentence length — the unit every
    readability/quality heuristic builds on, and the chunking
    granularity for sentence-aligned packing. Pure map-side JVM
    expressions, zero shuffle before the presentation sort, zero
    Python; the raw integer-ratio division is emitted unrounded (the
    registry's bit-stable convention).

    Word counting is a single split per DOCUMENT, not a per-sentence
    fold: every SENT_RE match contains a terminator char (non-
    whitespace), so no sentence trims to empty and
    sum_i size(split(trim(s_i), '\\s+')) ==
    size(split(trim(array_join(sents, ' ')), '\\s+')) exactly — the
    nested transform-inside-aggregate HOF this replaces ran
    interpreted per sentence. The DuckDB oracle uses the identical
    join-once formulation.

    Two Spark-only regex-engine guards (DuckDB's RE2 is linear and
    needs neither; match results are provably identical):
    - possessive `[^.!?]++` — the two classes are disjoint, so giving
      a char back to `[.!?]+` can never succeed and greedy ==
      possessive; without it java.util.regex backtracks O(len²) on
      every unmatched tail (measured 8.7 s on 1.5 MB of
      terminator-free text vs 1.8 s possessive);
    - an rlike('[.!?]') prefilter — a doc with no terminator at all
      has zero matches by construction, so skip the per-position
      find() restart entirely (NULL text also lands here: empty
      array → 0/0/NULL, same as the NULL-array path it replaces)."""
    docs = table(spark, sf_dir, "documents")
    sents = F.when(
        F.col("text").rlike("[.!?]"),
        F.regexp_extract_all("text", F.lit(SENT_RE_POSSESSIVE), 0),
    ).otherwise(F.array().cast("array<string>"))
    n_sent = F.coalesce(F.size(sents).cast("bigint"), F.lit(0))
    # NULL text → 0/0, matching the oracle's coalesce exactly (a NULL
    # array makes size()/array_join() NULL on the Spark side and
    # len()/array_to_string() NULL in DuckDB — align both to zero
    # rather than trusting the current fixture to never carry NULLs)
    n_words = (
        F.when(
            n_sent > 0,
            F.size(F.split(F.trim(F.array_join(sents, " ")), r"\s+")).cast("bigint"),
        )
        .otherwise(F.lit(0))
    )
    seg = docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
    )
    return seg.select(
        "doc_id",
        "n_sentences",
        "n_words",
        F.when(
            F.col("n_sentences") > 0,
            F.col("n_words").cast("double") / F.col("n_sentences"),
        ).alias("avg_words_per_sentence"),
    ).orderBy("doc_id")
