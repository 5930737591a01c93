"""Text cleaning/normalization operators — the remaining standard
pretraining-corpus transforms: whitespace collapse, markup stripping,
PII-pattern redaction, boilerplate-line detection. All single-pass
``regexp_replace`` chains (JVM, codegen'd) with DuckDB oracles proving
formula equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import register, table

# RE2/Java-compatible patterns (no backreferences, no lookaround)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
TAG_RE = r"<[^>]{1,100}>"
WS_RE = r"\s+"


def clean_text_expr(col) -> F.Column:
    """strip markup → redact emails/URLs → collapse whitespace → trim.
    Order matters and is pinned by the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, TAG_RE, " ")
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, URL_RE, "<URL>")
    c = F.trim(F.regexp_replace(c, WS_RE, " "))
    return c


@register(
    "text_clean_normalize",
    oracle=f"""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{TAG_RE}', ' ', 'g'),
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{WS_RE}', ' ', 'g')) AS cleaned,
           length(text) - length(trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{TAG_RE}', ' ', 'g'),
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{URL_RE}', '<URL>', 'g'),
             '{WS_RE}', ' ', 'g'))) AS bytes_removed
    FROM documents ORDER BY doc_id
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning chain over every document + how much it removed
    (the corpus-shrinkage accounting a data build reports)."""
    docs = table(spark, sf_dir, "documents")
    cleaned = clean_text_expr("text")
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (F.length("text") - F.length(cleaned)).alias("bytes_removed"),
    ).orderBy("doc_id")


@register(
    "boilerplate_line_stats",
    oracle="""
    WITH lines AS (
      SELECT doc_id, unnest(string_split(text, '.')) AS line FROM documents
    ), counted AS (
      SELECT trim(line) AS l, count(*) AS df, count(DISTINCT doc_id) AS docs
      FROM lines WHERE trim(line) <> '' GROUP BY 1
    )
    SELECT count(*) AS n_lines,
           count(CASE WHEN docs >= 10 THEN 1 END) AS boilerplate_lines,
           max(docs) AS max_doc_freq
    FROM counted
    """,
)
def boilerplate_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection by line-level document frequency (the
    dedup trick for headers/footers/navigation): '.'-separated
    segments that recur across ≥10 documents. One explode + one
    groupBy; at 100 TB the count is a map-side-combined agg over the
    segment hash."""
    docs = table(spark, sf_dir, "documents")
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\.")).alias("line")
    ).select("doc_id", F.trim("line").alias("l")).filter(F.col("l") != "")
    counted = lines.groupBy("l").agg(
        F.count("*").alias("df"), F.countDistinct("doc_id").alias("docs")
    )
    return counted.agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("docs") >= 10, 1)).alias("boilerplate_lines"),
        F.max("docs").alias("max_doc_freq"),
    )


# --------------------------------------------------------------------------
# jusText-style context-sensitive boilerplate classification (r10)
# --------------------------------------------------------------------------
# The line-DF detector above catches EXACT recurring boilerplate; the
# jusText algorithm (Pomikálek 2011 — the cleaner behind many web
# corpora) classifies each BLOCK from its own features (link density,
# stopword density, length) and then lets undecided blocks inherit
# from their nearest decided neighbor — navigation fragments between
# two content paragraphs survive context-free scoring but not the
# context pass. Thresholds are INTEGER cross-multiplications (3·links
# ≥ tokens, 6·stops ≥ tokens) so the class decision never touches a
# float. Blocks are 12-token windows (the fixture corpus has no
# sentence punctuation); a production run blocks on HTML paragraph
# boundaries with the same classifier.
BLOCK_TOKS = 12
SHORT_CHARS = 40
_NAV_BLOCK = "home <a>about</a> <a>contact</a> <a>login</a> <a>terms</a>"


@register(
    "boilerplate_justext_blocks",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    blocks AS (
      SELECT doc_id,
             unnest(range(1, CAST(ceil(len(toks) / {BLOCK_TOKS}.0) AS BIGINT) + 1))
               AS block_idx,
             toks
      FROM toked
    ),
    planted AS (
      SELECT doc_id, block_idx,
             CASE (doc_id * 31 + block_idx) % 5
               WHEN 0 THEN '{_NAV_BLOCK}'
               WHEN 1 THEN array_to_string(
                 toks[(block_idx-1)*{BLOCK_TOKS}+1 : (block_idx-1)*{BLOCK_TOKS}+2], ' ')
               ELSE array_to_string(
                 toks[(block_idx-1)*{BLOCK_TOKS}+1 : block_idx*{BLOCK_TOKS}], ' ')
             END AS block
      FROM blocks
    ),
    feats AS (
      SELECT doc_id, block_idx, block,
             len(string_split(block, ' ')) AS n_toks,
             len(list_filter(string_split(block, ' '),
                             t -> t LIKE '<a>%')) AS n_links,
             len(list_filter(string_split(block, ' '),
                             t -> t = 'the' OR t = 'a')) AS n_stop,
             length(block) AS n_chars
      FROM planted
    ),
    cf AS (
      SELECT *, CASE
               WHEN 3 * n_links >= n_toks THEN 'bad'
               WHEN n_chars < {SHORT_CHARS} THEN 'maybe'
               WHEN 6 * n_stop >= n_toks THEN 'good'
               ELSE 'bad' END AS cls_cf
      FROM feats
    ),
    ctx AS (
      SELECT *,
             last_value(CASE WHEN cls_cf <> 'maybe' THEN cls_cf END IGNORE NULLS)
               OVER (PARTITION BY doc_id ORDER BY block_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_cls,
             first_value(CASE WHEN cls_cf <> 'maybe' THEN cls_cf END IGNORE NULLS)
               OVER (PARTITION BY doc_id ORDER BY block_idx
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_cls
      FROM cf
    )
    SELECT doc_id, CAST(block_idx AS BIGINT) AS block_idx,
           cls_cf,
           CASE WHEN cls_cf <> 'maybe' THEN cls_cf
                WHEN prev_cls = 'good' OR next_cls = 'good' THEN 'good'
                ELSE 'bad' END AS cls_final,
           CAST(n_toks AS BIGINT) AS n_toks,
           CAST(n_links AS BIGINT) AS n_links,
           CAST(n_stop AS BIGINT) AS n_stop,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM ctx ORDER BY doc_id, block_idx
    """,
)
def boilerplate_justext_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText block classification: context-free class from link
    density / length / stopword density (integer cross-multiplied
    thresholds), then the context pass — 'maybe' blocks become good
    iff their nearest DECIDED neighbor on either side is good.

    The plant rewrites every (31·doc+idx)%5==0 block into a linky nav
    fragment and %5==1 into a 2-token stub, so all three context-free
    classes and both context outcomes occur (stubs next to content
    inherit good; stubs next to nav inherit bad).

    Plan: map-side block explode + per-row feature math (codegen), two
    doc-keyed window passes (last/first IGNORE NULLS — ONE shuffle on
    doc_id shared by both since partitioning matches), presentation
    sort. No joins; block count per doc is bounded, so window state
    stays small at any corpus size.

    Here too the tokenizer is the shared whitespace `_tokens()`; the
    classifier re-splits each block's own TEXT (it sees exactly what a
    production cleaner would see, not the plant's internals)."""
    from .text import _tokens

    toked = table(spark, sf_dir, "documents").select(
        "doc_id", _tokens().alias("toks")
    )
    blocks = toked.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, CAST(ceil(size(toks) / {BLOCK_TOKS}.0) AS BIGINT)), "
                f"b -> struct(b AS block_idx, "
                f"array_join(slice(toks, CAST((b-1)*{BLOCK_TOKS}+1 AS INT), {BLOCK_TOKS}), ' ') AS full_block, "
                f"array_join(slice(toks, CAST((b-1)*{BLOCK_TOKS}+1 AS INT), 2), ' ') AS stub_block))"
            )
        ).alias("b"),
    ).select(
        "doc_id",
        F.col("b.block_idx").alias("block_idx"),
        F.when(
            (F.col("doc_id") * 31 + F.col("b.block_idx")) % 5 == 0, F.lit(_NAV_BLOCK)
        )
        .when((F.col("doc_id") * 31 + F.col("b.block_idx")) % 5 == 1, F.col("b.stub_block"))
        .otherwise(F.col("b.full_block"))
        .alias("block"),
    )
    feats = blocks.select(
        "doc_id",
        "block_idx",
        F.expr("size(split(block, ' '))").alias("n_toks"),
        F.expr("size(filter(split(block, ' '), t -> t LIKE '<a>%'))").alias("n_links"),
        F.expr("size(filter(split(block, ' '), t -> t = 'the' OR t = 'a'))").alias(
            "n_stop"
        ),
        F.length("block").alias("n_chars"),
    )
    cls_cf = (
        F.when(3 * F.col("n_links") >= F.col("n_toks"), F.lit("bad"))
        .when(F.col("n_chars") < SHORT_CHARS, F.lit("maybe"))
        .when(6 * F.col("n_stop") >= F.col("n_toks"), F.lit("good"))
        .otherwise(F.lit("bad"))
    )
    cf = feats.withColumn("cls_cf", cls_cf)
    decided = F.when(F.col("cls_cf") != "maybe", F.col("cls_cf"))
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    prev_cls = F.last(decided, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_cls = F.first(decided, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        cf.withColumn("prev_cls", prev_cls)
        .withColumn("next_cls", next_cls)
        .select(
            "doc_id",
            F.col("block_idx").cast("bigint").alias("block_idx"),
            "cls_cf",
            F.when(F.col("cls_cf") != "maybe", F.col("cls_cf"))
            .when(
                (F.col("prev_cls") == "good") | (F.col("next_cls") == "good"),
                F.lit("good"),
            )
            .otherwise(F.lit("bad"))
            .alias("cls_final"),
            F.col("n_toks").cast("bigint").alias("n_toks"),
            F.col("n_links").cast("bigint").alias("n_links"),
            F.col("n_stop").cast("bigint").alias("n_stop"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("doc_id", "block_idx")
    )


# --------------------------------------------------------------------------
# mojibake repair (r10) — ftfy's core fix as a JVM charset round-trip
# --------------------------------------------------------------------------
# The classic web-corpus corruption: UTF-8 bytes decoded as Latin-1
# somewhere upstream ('café №42' → 'cafÃ© â„–42'). The repair is the
# inverse round-trip — re-encode the mojibake as Latin-1 (recovering
# the original UTF-8 bytes) and decode as UTF-8 — applied only when
# (a) the signature lead bytes ('Ã', 'Â', 'â') appear and (b) the
# round-trip decodes cleanly (no U+FFFD), ftfy's "fix only what
# un-breaks losslessly" rule. Everything is F.encode/F.decode Column
# ops: zero Python, zero shuffle, runs at scan speed on any corpus.
_MOJI_MARKER = " café №42"  # 2-byte and 3-byte UTF-8 sequences
_MOJI_PLANT_MOD = 3


@register(
    "text_mojibake_repair",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % {_MOJI_PLANT_MOD} = 0 THEN 1 ELSE 0 END
                AS INT) AS was_mojibake,
           CASE WHEN doc_id % {_MOJI_PLANT_MOD} = 0
                THEN text || '{_MOJI_MARKER}' ELSE text END AS repaired
    FROM documents ORDER BY doc_id
    """,
)
def text_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and repair UTF-8-as-Latin-1 double encoding.

    The plant appends a non-ASCII marker to every {_MOJI_PLANT_MOD}rd
    document and CORRUPTS it with the real fault (decode the UTF-8
    bytes as Latin-1); the operator sees only the corrupted string and
    must (1) flag it via the signature heuristic, (2) undo it with the
    byte-exact inverse, (3) leave clean rows untouched. The oracle
    states the expected REPAIRED text independently — a repair that
    mangles one byte, or fires on a clean row, hash-mismatches.

    At 100 TB this matters because the fix must be a column expression
    (scan-speed, codegen), not a Python pass; U+FFFD-guarded so a
    string that merely LOOKS like mojibake is never corrupted by an
    overeager round-trip."""
    docs = table(spark, sf_dir, "documents")
    planted_orig = F.concat(F.col("text"), F.lit(_MOJI_MARKER))
    moji = F.decode(F.encode(planted_orig, "UTF-8"), "ISO-8859-1")
    observed = F.when(
        F.col("doc_id") % _MOJI_PLANT_MOD == 0, moji
    ).otherwise(F.col("text"))
    docs = docs.select("doc_id", observed.alias("obs"))
    fix, candidate = mojibake_fix_expr(F.col("obs"))
    return docs.select(
        "doc_id",
        fix.cast("int").alias("was_mojibake"),
        F.when(fix, candidate).otherwise(F.col("obs")).alias("repaired"),
    ).orderBy("doc_id")


def mojibake_fix_expr(c: F.Column) -> tuple[F.Column, F.Column]:
    """(should_fix, repaired_candidate) for a string column. Fix fires
    only when (1) the mojibake signature appears, (2) every char is
    ≤ U+00FF (true mojibake always is — it was DECODED from Latin-1;
    Spark 4's ANSI encode raises on anything else, so this guard is
    also what keeps the job alive on clean docs containing '№â'), and
    (3) the recovered bytes are valid UTF-8 — legitimate accented text
    whose lone 0xE2/0xC3 bytes are invalid UTF-8 leads is refused.
    Both encode/decode sit INSIDE the conditionals (lazy CASE arms),
    so they only ever run on strings the guards proved safe."""
    suspicious = c.contains("Ã") | c.contains("Â") | c.contains("â")
    latin1able = c.rlike("^[\\x00-\\xff]*$")
    fix = F.when(
        suspicious & latin1able,
        F.call_function("is_valid_utf8", F.encode(c, "ISO-8859-1")),
    ).otherwise(F.lit(False))
    candidate = F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")
    return fix, candidate
