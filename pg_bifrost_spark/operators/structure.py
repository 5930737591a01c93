"""Structural text-cleaning operators over the ``documents`` table:
cross-document repeated-paragraph removal, intra-document line
deduplication, and HTML/markup stripping — the passes a web-corpus
refinery runs between raw extraction and document-level dedup
(CCNet/RefinedWeb-style line- and paragraph-level cleaning).

The synthetic fixture text carries no newlines or markup, so each
operator first PLANTS deterministic structure (boilerplate paragraphs,
duplicated lines, an HTML wrapper) with the exact same derivation
mirrored in the oracle — the established planted-fixture move
(``dedup.plant_duplicates``): both engines must clean the SAME
non-trivial input and produce hash-identical output.

Scale posture: paragraph removal is explode → one count shuffle → one
removal join → one reassembly shuffle (no broadcast of anything
corpus-proportional); line dedup and HTML stripping are map-only
column expressions (whole-stage codegen, zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table

# --------------------------------------------------------------------------
# planted structure fixtures (mirrored verbatim in each oracle)
# --------------------------------------------------------------------------
# Two boilerplate paragraphs appended to overlapping slices of the
# corpus: ~1/7 of docs get the legal footer, ~1/5 get the newsletter
# pitch, so their paragraph document-frequencies (~72 and ~100 at the
# 500-doc fixture) sit far above PARA_DF_CUTOFF while every original
# text is unique (df = 1). The cutoff provably fires on fixture data.
PARA_LEGAL = "all rights reserved unauthorized reproduction strictly prohibited"
PARA_PROMO = "subscribe to our newsletter for updates delivered every morning"
LEGAL_MOD = 7
PROMO_MOD = 5
PARA_DF_CUTOFF = 10  # paragraphs in >= this many docs are boilerplate

# Line-dedup plant: ~1/4 of docs get their own text duplicated as a
# second line (the classic scraped-page artifact: body repeated in a
# print view), and ~1/6 additionally get a repeated sign-off pair.
SIGNOFF = "thanks for reading"
DUPLINE_MOD = 4
SIGNOFF_MOD = 6


def plant_paragraphs(docs: DataFrame) -> DataFrame:
    """Append the boilerplate paragraphs ('\\n'-separated) per the MODs."""
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % LEGAL_MOD == 0, F.lit("\n" + PARA_LEGAL)
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % PROMO_MOD == 0, F.lit("\n" + PARA_PROMO)
            ).otherwise(F.lit("")),
        ),
    )


# oracle-side mirror (chr(10) keeps the SQL literal newline-free)
PLANT_PARAS_SQL = f"""docs_p AS (
      SELECT doc_id, text
             || CASE WHEN doc_id % {LEGAL_MOD} = 0
                     THEN chr(10) || '{PARA_LEGAL}' ELSE '' END
             || CASE WHEN doc_id % {PROMO_MOD} = 0
                     THEN chr(10) || '{PARA_PROMO}' ELSE '' END AS text
      FROM documents
    )"""


@register(
    "paragraph_dedup",
    oracle=f"""
    WITH {PLANT_PARAS_SQL},
    paras AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS para,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM docs_p
    ),
    hot AS (
      SELECT para FROM paras GROUP BY para
      HAVING count(DISTINCT doc_id) >= {PARA_DF_CUTOFF}
    ),
    kept AS (
      SELECT p.doc_id, p.para, p.pos FROM paras p
      WHERE p.para NOT IN (SELECT para FROM hot)
    ),
    rebuilt AS (
      SELECT doc_id,
             count(*) AS paras_kept,
             string_agg(para, chr(10) ORDER BY pos) AS cleaned
      FROM kept GROUP BY doc_id
    ),
    before AS (SELECT doc_id, len(string_split(text, chr(10))) AS paras_before FROM docs_p)
    SELECT b.doc_id,
           CAST(b.paras_before AS BIGINT) AS paras_before,
           CAST(b.paras_before - r.paras_kept AS BIGINT) AS paras_removed,
           md5(r.cleaned) AS cleaned_digest
    FROM before b JOIN rebuilt r USING (doc_id)
    WHERE b.paras_before > r.paras_kept
    ORDER BY doc_id
    """,
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-paragraph removal (the CCNet move):
    any paragraph appearing in >= {PARA_DF_CUTOFF} distinct documents
    is boilerplate and is stripped from every document; returns the
    affected documents with before/after counts and a digest of the
    cleaned text.

    Plan shape (scale-first): explode to (doc, pos, para) rows; ONE
    map-side-combined count shuffle keyed on the paragraph itself
    finds the hot set; removal is a LEFT ANTI join on the paragraph
    key (shuffle join — the hot set is corpus-proportional in the
    worst case, so it is never collected or broadcast; AQE may still
    choose broadcast when it measures small); reassembly is one
    groupBy(doc_id) with ``sort_array(collect_list(struct(pos, para)))``
    — deterministic order under any shuffle placement. No driver-side
    data path at any corpus size."""
    docs = plant_paragraphs(table(spark, sf_dir, "documents"))
    paras = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "para")
    )
    hot = (
        paras.groupBy("para")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= PARA_DF_CUTOFF)
        .select("para")
    )
    kept = paras.join(hot, "para", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("paras_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("cleaned"),
    )
    before = docs.select("doc_id", F.size(F.split("text", "\n")).alias("paras_before"))
    return (
        before.join(rebuilt, "doc_id")
        .filter(F.col("paras_before") > F.col("paras_kept"))
        .select(
            "doc_id",
            F.col("paras_before").cast("bigint").alias("paras_before"),
            (F.col("paras_before") - F.col("paras_kept"))
            .cast("bigint")
            .alias("paras_removed"),
            F.md5(F.col("cleaned").cast("binary")).alias("cleaned_digest"),
        )
        .orderBy("doc_id")
    )


def plant_dup_lines(docs: DataFrame) -> DataFrame:
    """Duplicate the body line and/or append a doubled sign-off."""
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % DUPLINE_MOD == 0,
                F.concat(F.lit("\n"), F.col("text")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % SIGNOFF_MOD == 0,
                F.lit("\n" + SIGNOFF + "\n" + SIGNOFF),
            ).otherwise(F.lit("")),
        ),
    )


PLANT_DUPLINES_SQL = f"""docs_l AS (
      SELECT doc_id, text
             || CASE WHEN doc_id % {DUPLINE_MOD} = 0
                     THEN chr(10) || text ELSE '' END
             || CASE WHEN doc_id % {SIGNOFF_MOD} = 0
                     THEN chr(10) || '{SIGNOFF}' || chr(10) || '{SIGNOFF}'
                     ELSE '' END AS text
      FROM documents
    )"""


@register(
    "doc_line_dedup",
    oracle=f"""
    WITH {PLANT_DUPLINES_SQL},
    lines AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM docs_l
    ),
    ranked AS (
      SELECT doc_id, line, pos,
             row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
      FROM lines
    ),
    rebuilt AS (
      SELECT doc_id,
             count(*) AS lines_kept,
             string_agg(line, chr(10) ORDER BY pos) AS cleaned
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ),
    before AS (SELECT doc_id, len(string_split(text, chr(10))) AS lines_before FROM docs_l)
    SELECT b.doc_id,
           CAST(b.lines_before AS BIGINT) AS lines_before,
           CAST(b.lines_before - r.lines_kept AS BIGINT) AS lines_removed,
           md5(r.cleaned) AS cleaned_digest
    FROM before b JOIN rebuilt r USING (doc_id)
    WHERE b.lines_before > r.lines_kept
    ORDER BY doc_id
    """,
)
def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document duplicate-line removal, keeping the FIRST
    occurrence (scraped-page print-view and repeated sign-off
    artifacts); returns affected documents with counts and a cleaned
    digest.

    MAP-ONLY: each document is cleaned by an array higher-order filter
    — keep line i iff its first occurrence index equals i
    (``array_position`` is 1-based, the lambda index 0-based). No
    explode, no shuffle, no state leaves the row; at 100 TB this is a
    pure codegen'd projection that scales linearly with executors.
    The O(L²) per-row scan is bounded by lines-per-document, not
    corpus size. Oracle cross-checks with the window-function
    formulation (row_number over (doc, line))."""
    docs = plant_dup_lines(table(spark, sf_dir, "documents"))
    lines = F.split("text", "\n")
    docs = docs.select("doc_id", lines.alias("lines"))
    kept = F.filter(
        F.col("lines"), lambda x, i: F.array_position(F.col("lines"), x) == i + 1
    )
    return (
        docs.select(
            "doc_id",
            F.size("lines").cast("bigint").alias("lines_before"),
            (F.size("lines") - F.size(kept)).cast("bigint").alias("lines_removed"),
            F.md5(F.array_join(kept, "\n").cast("binary")).alias("cleaned_digest"),
        )
        .filter(F.col("lines_removed") > 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# HTML stripping
# --------------------------------------------------------------------------
# Wrapper planted around every document: head/title boilerplate, <p>
# body with every ' data ' token bolded, and a void <br/> — enough tag
# variety (attrs-free open/close/void, digits in the title) to
# exercise the stripper beyond the trivial case.
TAG_RE = "<[^>]+>"  # Java-regex ∩ RE2 common subset (no lookaround)


def plant_html(docs: DataFrame, title: F.Column | None = None) -> DataFrame:
    """``title`` defaults to the doc_id; the refinery capstone passes
    ``doc_id % PLANT_OFFSET`` so a mutated clone and its original keep
    the SAME title and stay normalization-equal after stripping."""
    return docs.withColumn(
        "text",
        F.concat(
            F.lit("<html><head><title>doc "),
            (title if title is not None else F.col("doc_id")).cast("string"),
            F.lit("</title></head><body><p>"),
            F.regexp_replace("text", " data ", " <b>data</b> "),
            F.lit("</p><br/></body></html>"),
        ),
    )


PLANT_HTML_SQL = """docs_h AS (
      SELECT doc_id,
             '<html><head><title>doc ' || doc_id::VARCHAR
             || '</title></head><body><p>'
             || regexp_replace(text, ' data ', ' <b>data</b> ', 'g')
             || '</p><br/></body></html>' AS text
      FROM documents
    )"""


@register(
    "html_strip_text",
    oracle=f"""
    WITH {PLANT_HTML_SQL}
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TAG_RE}')) AS BIGINT) AS tags_stripped,
           trim(regexp_replace(regexp_replace(text, '{TAG_RE}', ' ', 'g'),
                               ' +', ' ', 'g')) AS stripped
    FROM docs_h ORDER BY doc_id
    """,
)
def html_strip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup removal: strip every ``<...>`` tag, collapse the spaces
    the removal leaves behind, and report how many tags each document
    carried. Map-only regexp expressions (whole-stage codegen, zero
    shuffle); the tag pattern stays inside the Java-regex ∩ RE2 subset
    so Spark and DuckDB agree byte-for-byte. A real extraction pass
    would also decode entities and drop script/style CONTENT — both
    still map-only regexp/translate layers over this same shape."""
    docs = plant_html(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TAG_RE), 0))
        .cast("bigint")
        .alias("tags_stripped"),
        F.trim(
            F.regexp_replace(F.regexp_replace("text", TAG_RE, " "), " +", " ")
        ).alias("stripped"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# refinery capstone: the full structural-cleaning chain, end to end
# --------------------------------------------------------------------------
# Every stage's planted trigger is composed into ONE corpus (mutated
# normalization clones → duplicated lines → boilerplate paragraphs →
# HTML wrapper), then the chain undoes them in the order a web-corpus
# refinery runs: strip markup → intra-doc line dedup → cross-doc hot
# line/paragraph removal → normalized exact dedup → quality floor.
# The per-source report is hash-checked against the identical DuckDB
# chain — the end-to-end proof that the stages COMPOSE, not just that
# each passes alone.
REFINERY_MIN_TOKENS = 20
# clone arithmetic: the SAME symbols the Spark half uses — a literal
# copy here already drifted once (the leakage_safe_split plant_mod=101
# post-mortem: aggregate-count coincidence kept the gate green)
from .dedup import PLANT_MOD as _RM  # noqa: E402  (dedup imports plans only)
from .dedup import PLANT_OFFSET as _RP  # noqa: E402


@register(
    "refinery_pipeline",
    oracle=f"""
    WITH docs_m AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + {_RP} AS doc_id, source,
             '  ' || upper(replace(text, ' ', '  ')) || ' ' AS text
      FROM documents WHERE doc_id % {_RM} = 0
    ),
    d1 AS (
      SELECT doc_id, source, text
             || CASE WHEN doc_id % {DUPLINE_MOD} = 0
                     THEN chr(10) || text ELSE '' END
             || CASE WHEN doc_id % {SIGNOFF_MOD} = 0
                     THEN chr(10) || '{SIGNOFF}' || chr(10) || '{SIGNOFF}'
                     ELSE '' END AS text
      FROM docs_m
    ),
    d2 AS (
      SELECT doc_id, source, text
             || CASE WHEN doc_id % {LEGAL_MOD} = 0
                     THEN chr(10) || '{PARA_LEGAL}' ELSE '' END
             || CASE WHEN doc_id % {PROMO_MOD} = 0
                     THEN chr(10) || '{PARA_PROMO}' ELSE '' END AS text
      FROM d1
    ),
    d3 AS (
      SELECT doc_id, source,
             '<html><head><title>doc ' || (doc_id % {_RP})::VARCHAR
             || '</title></head><body><p>'
             || regexp_replace(text, ' data ', ' <b>data</b> ', 'g')
             || '</p><br/></body></html>' AS text
      FROM d2
    ),
    stripped AS (
      SELECT doc_id, source,
             trim(regexp_replace(regexp_replace(text, '{TAG_RE}', ' ', 'g'),
                                 ' +', ' ', 'g')) AS text
      FROM d3
    ),
    lines AS (
      SELECT doc_id, source,
             trim(unnest(string_split(text, chr(10)))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM stripped
    ),
    l1 AS (
      SELECT doc_id, source, line, pos,
             row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
      FROM lines
    ),
    kept AS (SELECT doc_id, source, line, pos FROM l1 WHERE rn = 1),
    hot AS (
      SELECT line FROM kept GROUP BY line
      HAVING count(DISTINCT doc_id) >= {PARA_DF_CUTOFF}
    ),
    kept2 AS (
      SELECT * FROM kept WHERE line NOT IN (SELECT line FROM hot)
    ),
    rebuilt AS (
      SELECT doc_id, source,
             string_agg(line, chr(10) ORDER BY pos) AS text
      FROM kept2 GROUP BY doc_id, source
    ),
    norm AS (
      SELECT doc_id, source, text,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
      FROM rebuilt
    ),
    keepers AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY h),
    final AS (
      SELECT n.doc_id, n.source, n.text,
             len(string_split_regex(n.text, '\\s+')) AS n_toks
      FROM norm n JOIN keepers k USING (doc_id)
      WHERE len(string_split_regex(n.text, '\\s+')) >= {REFINERY_MIN_TOKENS}
    ),
    inputs AS (SELECT source, count(*) AS docs_in FROM docs_m GROUP BY source)
    SELECT i.source,
           CAST(i.docs_in AS BIGINT) AS docs_in,
           CAST(coalesce(f.docs_out, 0) AS BIGINT) AS docs_out,
           CAST(coalesce(f.chars_out, 0) AS BIGINT) AS chars_out,
           CAST(coalesce(f.tokens_out, 0) AS BIGINT) AS tokens_out
    FROM inputs i LEFT JOIN (
      SELECT source, count(*) AS docs_out, sum(len(text)) AS chars_out,
             sum(n_toks) AS tokens_out
      FROM final GROUP BY source
    ) f USING (source)
    ORDER BY i.source
    """,
)
def refinery_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole structural-refinery chain as ONE composed plan —
    markup strip, intra-doc line dedup, cross-doc boilerplate removal,
    normalized exact dedup, token-count quality floor — reported per
    source and hash-checked end-to-end against the identical DuckDB
    chain.

    Composition is where pipelines break (a stage that reorders or
    re-spaces text silently changes the next stage's keys), so this
    capstone is the regression net over all of structure.py +
    dedup_normalized. Plan shape: everything through line-reassembly
    is the paragraph_dedup shape (explode → count shuffle → anti join
    → one groupBy); the dedup stage is one digest groupBy; the report
    is an O(sources) aggregate. Nothing corpus-proportional is
    collected or broadcast."""
    from .dedup import PLANT_MOD, PLANT_OFFSET  # clone arithmetic shared

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    clones = docs.filter(F.col("doc_id") % PLANT_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        "source",
        F.concat(
            F.lit("  "), F.upper(F.regexp_replace("text", " ", "  ")), F.lit(" ")
        ).alias("text"),
    )
    planted = plant_html(
        plant_paragraphs(plant_dup_lines(docs.unionByName(clones))),
        title=F.col("doc_id") % PLANT_OFFSET,
    )
    stripped = planted.select(
        "doc_id",
        "source",
        F.trim(
            F.regexp_replace(F.regexp_replace("text", TAG_RE, " "), " +", " ")
        ).alias("text"),
    )
    lines = stripped.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", "\n")).alias("pos", "raw_line"),
    ).select("doc_id", "source", "pos", F.trim("raw_line").alias("line"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "line").orderBy("pos")
    kept = (
        lines.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    hot = (
        kept.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= PARA_DF_CUTOFF)
        .select("line")
    )
    kept2 = kept.join(hot, "line", "left_anti")
    rebuilt = kept2.groupBy("doc_id", "source").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text")
    )
    norm = rebuilt.withColumn(
        "h", F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    )
    keepers = norm.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    final = (
        norm.join(keepers, "doc_id")
        .withColumn("n_toks", F.size(F.split("text", r"\s+")))
        .filter(F.col("n_toks") >= REFINERY_MIN_TOKENS)
    )
    inputs = (
        plant_html(plant_paragraphs(plant_dup_lines(docs.unionByName(clones))))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("docs_in"))
    )
    outs = final.groupBy("source").agg(
        F.count("*").cast("bigint").alias("docs_out"),
        F.sum(F.length("text")).cast("bigint").alias("chars_out"),
        F.sum("n_toks").cast("bigint").alias("tokens_out"),
    )
    return (
        inputs.join(outs, "source", "left_outer")
        .select(
            "source",
            "docs_in",
            F.coalesce("docs_out", F.lit(0)).cast("bigint").alias("docs_out"),
            F.coalesce("chars_out", F.lit(0)).cast("bigint").alias("chars_out"),
            F.coalesce("tokens_out", F.lit(0)).cast("bigint").alias("tokens_out"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# r11: crawl-link extraction + markdown stripping
# --------------------------------------------------------------------------
# Planted anchors: every doc links to a deterministic host shard; every
# third doc carries a second cross-shard link — enough structure for a
# per-host outlink aggregate (the crawl-graph building block pagerank
# consumes) without needing real crawl data in the fixture.
HREF_RE = 'href="([^"]+)"'
HOST_RE = "https://([^/]+)/"

PLANT_LINKS_SQL = """docs_l AS (
      SELECT doc_id,
             '<p><a href="https://d' || (doc_id % 7)::VARCHAR
             || '.example.org/page/' || doc_id::VARCHAR || '">ref</a> '
             || CASE WHEN doc_id % 3 = 0
                THEN '<a href="https://d' || ((doc_id + 1) % 7)::VARCHAR
                     || '.example.org/x">x</a> ' ELSE '' END
             || text || '</p>' AS text
      FROM documents
    )"""


def plant_links(docs: DataFrame) -> DataFrame:
    second = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit('<a href="https://d'),
            ((F.col("doc_id") + 1) % 7).cast("string"),
            F.lit('.example.org/x">x</a> '),
        ),
    ).otherwise(F.lit(""))
    return docs.withColumn(
        "text",
        F.concat(
            F.lit('<p><a href="https://d'),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('.example.org/page/'),
            F.col("doc_id").cast("string"),
            F.lit('">ref</a> '),
            second,
            F.col("text"),
            F.lit("</p>"),
        ),
    )


@register(
    "html_link_extract",
    oracle=f"""
    WITH {PLANT_LINKS_SQL},
    links AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '{HREF_RE}', 1)) AS url
      FROM docs_l
    )
    SELECT regexp_extract(url, '{HOST_RE}', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM links GROUP BY 1 ORDER BY host
    """,
)
def html_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction: pull every ``href`` out of the page markup,
    reduce to per-host outlink counts — the edge-list pass that feeds
    crawl-frontier scheduling and the pagerank quality prior
    (``pagerank_quality_prior``). Map-only regexp extraction + explode
    feeding ONE map-side-combined groupBy on host; at 100 TB the
    shuffle carries (host, partial-count) rows, never page bytes. The
    href/host patterns stay in the Java-regex ∩ RE2 subset so Spark
    and DuckDB agree byte-for-byte."""
    docs = plant_links(table(spark, sf_dir, "documents"))
    links = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(HREF_RE), 1)).alias("url"),
    )
    return (
        links.select(
            F.regexp_extract("url", HOST_RE, 1).alias("host"), "doc_id"
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_links"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("host")
    )


# Markdown plant: heading marker, bold, italic, an inline link and a
# code span in front of every document — the constructs a
# markdown-sourced training corpus must normalize away.
MD_LINK_RE = r"\[([^\]]*)\]\([^)]*\)"
MD_CODE_RE = "`([^`]*)`"
MD_EMPH_RE = r"\*{1,2}([^*]+)\*{1,2}"
MD_HEAD_RE = "#+ +"

PLANT_MD_SQL = """docs_m AS (
      SELECT doc_id,
             '## T' || doc_id::VARCHAR || ' **b' || (doc_id % 5)::VARCHAR
             || '** *i* [l' || doc_id::VARCHAR
             || '](https://m.example.org/' || doc_id::VARCHAR
             || ') `c' || (doc_id % 3)::VARCHAR || '` ' || text AS text
      FROM documents
    )"""


def plant_markdown(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "text",
        F.concat(
            F.lit("## T"),
            F.col("doc_id").cast("string"),
            F.lit(" **b"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("** *i* [l"),
            F.col("doc_id").cast("string"),
            F.lit("](https://m.example.org/"),
            F.col("doc_id").cast("string"),
            F.lit(") `c"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("` "),
            F.col("text"),
        ),
    )


@register(
    "markdown_strip_text",
    oracle=rf"""
    WITH {PLANT_MD_SQL}
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{MD_LINK_RE}')) AS BIGINT)
             AS links_unwrapped,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(text,
                  '{MD_LINK_RE}', '\1', 'g'),
                  '{MD_CODE_RE}', '\1', 'g'),
                  '{MD_EMPH_RE}', '\1', 'g'),
                  '{MD_HEAD_RE}', '', 'g'),
                  ' +', ' ', 'g')) AS stripped
    FROM docs_m ORDER BY doc_id
    """,
)
def markdown_strip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown → plain text normalization: unwrap ``[label](url)``
    links to their labels, unquote inline code, drop bold/italic
    markers and heading hashes, collapse the whitespace the removals
    leave. Pure map-side regexp_replace chain (whole-stage codegen,
    zero shuffle, zero UDFs); the patterns avoid lookaround so the
    Java-regex and RE2 engines agree — only the replacement syntax
    differs ($1 vs \\1), which the oracle mirrors."""
    docs = plant_markdown(table(spark, sf_dir, "documents"))
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", MD_LINK_RE, "$1"),
                    MD_CODE_RE,
                    "$1",
                ),
                MD_EMPH_RE,
                "$1",
            ),
            MD_HEAD_RE,
            "",
        ),
        " +",
        " ",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(MD_LINK_RE), 0))
        .cast("bigint")
        .alias("links_unwrapped"),
        F.trim(stripped).alias("stripped"),
    ).orderBy("doc_id")
