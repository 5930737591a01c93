"""Document deduplication operators over the ``documents`` table.

Five families, each scale-posture-first:

  * exact          — hash groupBy (one shuffle on a 128-bit digest)
  * ngram_jaccard  — exact all-pairs Jaccard via an inverted shingle
                     index (explode → self-join on shingle → count),
                     NOT a cross join: candidate generation touches
                     only docs sharing a shingle, the standard
                     posting-list trick that survives 100 TB
  * minhash_lsh    — MinHash signatures + banded LSH bucketing; only
                     same-band-hash pairs are verified. Probabilistic
                     candidate recall → rows-only driver check; the
                     verification step is exact Jaccard.
  * simhash        — 64-bit SimHash + block rotation for hamming ≤ k
  * embedding      — cosine near-dup pairs over the embeddings table

Determinism: all hashing uses Spark built-ins (xxhash64, crc32, md5)
with fixed seeds — replays are byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table

# --------------------------------------------------------------------------
# shared shingling helpers (word-level n-grams)
# --------------------------------------------------------------------------


def tokens_expr(col: str = "text") -> F.Column:
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def shingles_expr(n: int = 3, col: str = "text") -> F.Column:
    """Distinct word n-grams as an array<string>."""
    toks = tokens_expr(col)
    # zip each token with the (n-1) following ones: transform over indices
    return F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda _, i: F.when(
                    i <= F.size(toks) - n,
                    F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )


def with_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select("doc_id", shingles_expr(n).alias("shingles")).filter(
        F.size("shingles") > 0
    )


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1 HAVING count(*) > 1
    ORDER BY content_hash
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content digest. At scale: one shuffle
    on the digest; the digest is computed map-side so the shuffle
    carries (hash, doc_id) only."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index
# --------------------------------------------------------------------------
@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct([
               x[1] || ' ' || x[2] || ' ' || x[3]
               FOR x IN [
                 toks[i:i+2] FOR i IN range(1, len(toks) - 1)
               ] IF len(x) = 3
             ])) AS shingle
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_common::DOUBLE / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM common JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with 3-gram Jaccard ≥ 0.5, computed exactly through an
    inverted shingle index (posting-list join). At 100 TB the hot
    shingles are the skew risk — AQE skew-join handles it; a production
    variant would also drop ultra-frequent shingles (stop-shingles)."""
    docs = table(spark, sf_dir, "documents")
    sh = with_shingles(docs).select(
        "doc_id", F.explode("shingles").alias("shingle"), F.size("shingles").alias("n")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# MinHash + banded LSH
# --------------------------------------------------------------------------
N_PERM = 64
N_BANDS = 16  # 4 rows/band → catches jaccard ≳ 0.5 with high prob


def minhash_signature(shingles: F.Column) -> F.Column:
    """64 minhash values; permutation i = min over shingles of
    xxhash64(shingle, seed=i). Built-ins only — codegen'd, no UDF."""
    return F.array(
        *[F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i)))) for i in range(N_PERM)]
    )


@register("dedup_minhash_lsh", oracle=None)  # probabilistic candidates → rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs verified by exact Jaccard ≥ 0.5.

    Plan shape: signatures map-side → explode to (band, band_hash,
    doc) → shuffle on band_hash (tiny rows) → same-bucket pairs →
    exact verify on the candidate subset only. This is the shape that
    scales: no all-pairs work anywhere."""
    docs = table(spark, sf_dir, "documents")
    sh = with_shingles(docs)
    sig = sh.select("doc_id", "shingles", minhash_signature(F.col("shingles")).alias("sig"))
    rows_per_band = N_PERM // N_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias("bh"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .dropDuplicates()
    )
    # exact verification on candidates only
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    return verified.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# SimHash (64-bit) with hamming-distance blocking
# --------------------------------------------------------------------------
@register("dedup_simhash", oracle=None)  # bit-level custom hashing → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs with hamming distance ≤ 3.

    Candidate blocking: split the 64-bit fingerprint into 4 16-bit
    blocks; pairs within hamming ≤ 3 share at least one exact block
    (pigeonhole), so a self-join per block replaces all-pairs."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.array_distinct(tokens_expr())).alias("tok"))
    h = toks.withColumn("h", F.xxhash64("tok", F.lit(7)))
    # per (doc, bit): sum of ±1 votes; bit set if majority positive
    bit_cols = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
            f"b{i}"
        )
        for i in range(64)
    ]
    votes = h.groupBy("doc_id").agg(*bit_cols)
    # bits are disjoint so integer + equals bitwise OR (incl. the sign bit)
    one = F.lit(1).cast("long")
    fp = votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("fp"),
    )
    blocks = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("blk"),
                        F.shiftrightunsigned(F.col("fp"), 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "fp", "e.blk", "e.bv")
    pairs = (
        blocks.alias("x")
        .join(
            blocks.alias("y"),
            (F.col("x.blk") == F.col("y.blk"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(F.col("x.fp").bitwiseXOR(F.col("y.fp"))).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 3)
    )
    return pairs.orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# Embedding cosine near-duplicates
# --------------------------------------------------------------------------
@register(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: cosine ≥ 0.95. Exact pairwise here
    (hash-verifiable); the LSH-bucketed scale path for the same
    predicate is ``similarity.ann_lsh_buckets``."""
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))  # noqa: E731
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # norms once per vector (map-side), not once per pair
    emb = emb.withColumn("nrm", norm(F.col("v")))
    a, b = emb.alias("a"), emb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= 0.95)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )
