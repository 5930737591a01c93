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
  * repeated spans — ExactSubstr-style K-token span repetition stats
                     (Lee et al. 2021) via hashed rolling spans

Determinism: all hashing uses Spark built-ins (xxhash64, crc32, md5)
with fixed seeds — replays are byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table, tracked_cache

# --------------------------------------------------------------------------
# shared shingling helpers (word-level n-grams)
# --------------------------------------------------------------------------


def tokens_expr(col: str = "text") -> F.Column:
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Pin an explicit hash partitioning at core-count parallelism.

    AQE coalesces shuffle partitions by BYTE size; expression-dense
    stages (shingling, posting joins, set intersections) are
    CPU-bound per row, so a few-MB intermediate collapses to one task
    and serializes the work. An explicit numPartitions opts the
    exchange out of AQE coalescing. Cost scales with rows, not bytes —
    the same pinning is correct on a 1000-executor cluster."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)


def shingles_from_tokens(toks: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-grams from a MATERIALIZED token array column.

    ``toks`` must be a plain column reference, not a nested expression:
    higher-order functions are interpreted, so an expression captured
    in the lambda would be re-evaluated per element (O(len²) per doc —
    measured 25× slowdown on the documents fixture)."""
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            starts,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
        )
    )


def with_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + distinct shingles, both as strings and as xxhash64
    longs. All joins/set-ops downstream run on the 8-byte hashes (a
    2^64 collision is negligible and Jaccard on hashed sets equals
    Jaccard on the sets); strings exist only for debugging."""
    # documents is a single small parquet file (1 input split); spread
    # it so shingling/hashing uses every core.
    # NO size()>0 filter here: Catalyst would push it into the file
    # scan with the whole (interpreted) shingle expression inlined —
    # measured 10× slower than the projection itself. Filter on the
    # materialized array downstream if empties matter (explode already
    # drops them).
    toks = spread(docs, "doc_id").select("doc_id", tokens_expr().alias("toks"))
    return toks.select(
        "doc_id", shingles_from_tokens(F.col("toks"), n).alias("shingles")
    ).withColumn("hshingles", F.transform("shingles", lambda s: F.xxhash64(s)))


# --------------------------------------------------------------------------
# planted-duplicate gate fixtures
# --------------------------------------------------------------------------
# The sf* documents/embeddings fixtures contain NO exact or cosine
# duplicates, so the driver's gate rows for the dedup operators were
# matching empty sets — a vacuous green (VERDICT r3). The reference
# proves behaviors on inputs that exercise them (itests/tests/base/
# test_basic/input/*.sql plants the exact rows its goldens expect);
# the same move here: the GATE QUERIES union a deterministic clone of
# every id % PLANT_MOD == 0 row (id offset by PLANT_OFFSET), mirrored
# exactly in the oracles, so both engines must find the SAME non-empty
# duplicate set. The raw operators over arbitrary DataFrames remain
# available un-planted (exact_dup_groups, ngram_jaccard_pairs, ...).
PLANT_MOD = 64  # divides gen_sf.STRIDE=10^8 (exact plant pattern per sf1 replica)
# AND spreads clones over five sources (64 mod 20 cycles 0,4,8,12,16)
# — a modulus ≡ 0 (mod 20) would confine every clone to src0 and turn
# the per-source dup-rate gate rows into vacuous 0==0 checks
PLANT_OFFSET = 10_000_000


def plant_duplicates(df: DataFrame, id_col: str) -> DataFrame:
    """Union a cloned subset (id % PLANT_MOD == 0, id += PLANT_OFFSET)."""
    clones = df.filter(F.col(id_col) % PLANT_MOD == 0).withColumn(
        id_col, F.col(id_col) + PLANT_OFFSET
    )
    return df.unionByName(clones)


# Planted BOILERPLATE (VERDICT r4 "Wrong #2"): the fixtures' max
# shingle document-frequency is 25, under DF_CUTOFF=64, so the hot-set
# branch of the posting-list cutoff machinery never executed on real
# data — the engine's headline skew defense was proven only by a
# synthetic unit test. This fixture prepends a fixed boilerplate
# sentence to every doc_id % BOILER_MOD == 0 document (~1/7 of the
# corpus ⇒ its 4 interior shingles have df ≈ 72 at the 500-doc
# fixtures), and the hotset gate query runs the Jaccard operator with
# HOTSET_CUTOFF below that df but above the natural max (25): the hot
# set is then EXACTLY the boilerplate shingles, the map-side
# array_except subtraction provably executes, and the full oracle
# mirrors the plant + the cutoff.
BOILER_TEXT = "all rights reserved unauthorized reproduction strictly prohibited"
BOILER_MOD = 7
HOTSET_CUTOFF = 32


def plant_boilerplate(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Prepend BOILER_TEXT to every id % BOILER_MOD == 0 row's text."""
    return df.withColumn(
        "text",
        F.when(
            F.col(id_col) % BOILER_MOD == 0,
            F.concat(F.lit(BOILER_TEXT + " "), F.col("text")),
        ).otherwise(F.col("text")),
    )


# oracle-side mirror of plant_duplicates on each table (column order
# matches the parquet schema, so UNION ALL aligns positionally)
PLANTED_DOCS_SQL = f"""documents_planted AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % {PLANT_MOD} = 0
    )"""
PLANTED_EMB_SQL = f"""embeddings_planted AS (
      SELECT vec_id, embedding, label FROM embeddings
      UNION ALL
      SELECT vec_id + {PLANT_OFFSET} AS vec_id, embedding, label
      FROM embeddings WHERE vec_id % {PLANT_MOD} = 0
    )"""


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content digest. At scale: one shuffle
    on the digest; the digest is computed map-side so the shuffle
    carries (hash, doc_id) only."""
    return (
        docs.select(F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_copies") > 1)
        .orderBy("content_hash")
    )


@register(
    "dedup_exact_documents",
    oracle=f"""
    WITH {PLANTED_DOCS_SQL}
    SELECT md5(lower(trim(text))) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents_planted
    GROUP BY 1 HAVING count(*) > 1
    ORDER BY content_hash
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``exact_dup_groups`` over the documents table with planted
    duplicates (see PLANT_MOD above) so the gate verifies a NON-EMPTY
    duplicate set: every planted clone must surface as a group with
    n_copies ≥ 2 and keeper = the original doc_id."""
    docs = plant_duplicates(table(spark, sf_dir, "documents"), "doc_id")
    return exact_dup_groups(docs)


# --------------------------------------------------------------------------
# exact n-gram Jaccard via inverted index
# --------------------------------------------------------------------------
# Stop-shingle document-frequency cutoff: a shingle occurring in k
# docs emits k² candidate pairs from the posting-list self-join, so
# ONE boilerplate shingle ("all rights reserved ...") in 10⁶ docs is
# 10¹² pairs — AQE skew splitting rebalances the tasks but not the
# O(k²) work. Shingles with df > DF_CUTOFF are dropped from the index
# AND from the per-doc set size (Jaccard over non-stop shingles, the
# standard curation semantics), mirrored exactly in the oracle. The
# fixtures' max df is 25 (measured at sf0.001/0.01/0.1), so the
# cutoff is semantically inert on the test tables while capping
# worst-case pair fan-out at DF_CUTOFF² per shingle at any scale.
DF_CUTOFF = 64

# Above this many hot shingles the map-side literal subtraction would
# bloat the plan/codegen (tens of thousands of F.lit nodes rebuilt on
# every ingest) — switch to a distributed broadcast anti-join instead.
HOT_LITERAL_MAX = 10_000


def subtract_hot_shingles(
    base: DataFrame,
    df_cutoff: int = DF_CUTOFF,
    literal_max: int = HOT_LITERAL_MAX,
    extra_cols: tuple = (),
) -> DataFrame:
    """Drop shingles with document frequency > ``df_cutoff`` from the
    per-doc shingle arrays — the shared kept-set step of every
    posting-list dedup variant (Jaccard, containment, incremental).

    Three-way branch, identical output semantics:

      * no hot shingles (the clean-fixture case): ``base`` unchanged —
        the plan is byte-identical to the cutoff-less one;
      * ≤ ``literal_max`` hot shingles: collected once and subtracted
        MAP-SIDE with ``array_except`` (the hot set is tiny BY
        CONSTRUCTION: df > cutoff ⇒ |hot| ≤ total_postings / cutoff);
      * more: the subtraction stays DISTRIBUTED — broadcast left-anti
        join on the exploded postings, then regroup. The driver never
        holds more than ``literal_max + 1`` shingles (the branch probe
        is a ``limit(literal_max + 1).collect()``, not a full collect).

    A doc whose every shingle is hot yields an empty array in the
    literal branch and no row in the fallback branch — equivalent for
    all callers, which explode the array next (zero rows either way).

    ``extra_cols`` are passthrough grouping columns (e.g. the
    incremental variant's ``side``).
    """
    posts = base.select("doc_id", *extra_cols, F.explode("hshingles").alias("shingle"))
    hot = (
        posts.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cutoff)
        .select("shingle")
    )
    hot_probe = hot.limit(literal_max + 1).collect()
    if not hot_probe:
        return base
    if len(hot_probe) <= literal_max:
        return base.select(
            "doc_id",
            *extra_cols,
            F.array_except(
                "hshingles", F.array(*[F.lit(r.shingle) for r in hot_probe])
            ).alias("hshingles"),
        )
    # extreme-boilerplate fallback: keep the filter distributed
    return (
        posts.join(F.broadcast(hot), "shingle", "left_anti")
        .groupBy("doc_id", *extra_cols)
        .agg(F.collect_list("shingle").alias("hshingles"))
    )


# Exact-pair CTE body, shared by the dedup_ngram_jaccard oracle and
# the dedup_minhash_lsh bounds-check oracle (r12) — one definition so
# the two gates can never drift apart.
_EXACT_JACCARD_CTES = f"""
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
    kept AS (
      SELECT doc_id, shingle FROM sh
      QUALIFY count(*) OVER (PARTITION BY shingle) <= {DF_CUTOFF}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    exact_pairs AS (
      SELECT doc_a, doc_b,
             n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
      FROM common JOIN sizes sa ON sa.doc_id = doc_a
                  JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
    )
"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    {_EXACT_JACCARD_CTES}
    SELECT doc_a, doc_b, jaccard FROM exact_pairs
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(table(spark, sf_dir, "documents"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    df_cutoff: int = DF_CUTOFF,
    literal_max: int = 10_000,
    base: DataFrame | None = None,
    kept: DataFrame | None = None,
) -> DataFrame:
    """All pairs with 3-gram Jaccard ≥ threshold over NON-STOP
    shingles, computed exactly through an inverted shingle index
    (posting-list join). Shingles with document frequency >
    ``df_cutoff`` are excluded from both the index and the set sizes
    (see DF_CUTOFF above) — the pair fan-out of any single shingle is
    then bounded by df_cutoff², independent of corpus size.

    The kept-set step is the shared ``subtract_hot_shingles`` (also
    used by the containment and incremental variants): map-side
    array_except for a small hot set — the round-1 perf gate caught
    the naive version (cache the exploded postings + anti-join + two
    sizes joins) at 3.3× the recorded time — byte-identical plan when
    the corpus is clean, and a distributed broadcast anti-join above
    ``literal_max`` hot shingles."""
    # Materialize the shingle arrays once: Catalyst's projection
    # collapse would otherwise inline the (interpreted, expensive)
    # shingling expression into every downstream use, and the
    # self-join would recompute the whole subtree twice. A caller that
    # already holds the cached shingle relation passes it as ``base``
    # (the dedup_minhash_lsh gate row shares ONE cache across its
    # exact and LSH legs — code-review r12).
    if base is None:
        base = tracked_cache(with_shingles(docs).select("doc_id", "hshingles"))
    if kept is None:
        kept = subtract_hot_shingles(base, df_cutoff, literal_max)
    sh = spread(
        kept.select(
            "doc_id", F.size("hshingles").alias("n"), F.explode("hshingles").alias("shingle")
        ),
        "shingle",
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
        common.filter(jac >= threshold)
        # raw double ratio: int/int division is bit-identical across
        # engines; round(,4) was boundary roulette (q1 hash discipline)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


_HOTSET_DOCS_SQL = f"""documents_boiler AS (
      SELECT doc_id,
             CASE WHEN doc_id % {BOILER_MOD} = 0
                  THEN '{BOILER_TEXT} ' || text ELSE text END AS text,
             lang, source, n_chars
      FROM documents
    ),
    documents_hotset AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents_boiler
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id, text, lang, source, n_chars
      FROM documents_boiler WHERE doc_id % {PLANT_MOD} = 0
    )"""


@register(
    "dedup_ngram_jaccard_hotset",
    oracle=f"""
    WITH {_HOTSET_DOCS_SQL},
    sh AS (
      SELECT doc_id, unnest(list_distinct([
               x[1] || ' ' || x[2] || ' ' || x[3]
               FOR x IN [
                 toks[i:i+2] FOR i IN range(1, len(toks) - 1)
               ] IF len(x) = 3
             ])) AS shingle
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents_hotset)
      WHERE len(toks) >= 3
    ),
    kept AS (
      SELECT doc_id, shingle FROM sh
      QUALIFY count(*) OVER (PARTITION BY shingle) <= {HOTSET_CUTOFF}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
    FROM common JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard_hotset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ngram_jaccard_pairs`` over documents with planted BOILERPLATE
    (see BOILER_TEXT above) plus planted exact clones, at a cutoff
    (HOTSET_CUTOFF=32) between the natural max shingle df (25) and the
    boilerplate df (~72): the hot set is non-empty BY CONSTRUCTION, so
    this gate row proves the map-side ``array_except`` hot-shingle
    subtraction end-to-end against the DuckDB oracle — the clone pairs
    must still surface at jaccard 1.0 computed over NON-boilerplate
    shingles only. (Before this fixture the hot branch only ever ran
    in a synthetic unit test: VERDICT r4 "Wrong #2".)"""
    docs = plant_duplicates(
        plant_boilerplate(table(spark, sf_dir, "documents")), "doc_id"
    )
    return ngram_jaccard_pairs(docs, df_cutoff=HOTSET_CUTOFF)


# --------------------------------------------------------------------------
# MinHash + banded LSH
# --------------------------------------------------------------------------
N_PERM = 64
N_BANDS = 16  # 4 rows/band → catches jaccard ≳ 0.5 with high prob

# Bucket fan-out cap (VERDICT r4 "Wrong #3") — the DF_CUTOFF analog in
# signature space: a band bucket (or SimHash block bucket) of k members
# emits k² candidate pairs from the self-join, so ONE degenerate bucket
# (boilerplate-heavy corpora collapse many docs onto identical MinHash
# bands / SimHash blocks) is a quadratic blowup no AQE skew split can
# fix (it rebalances tasks, not the O(k²) work). Buckets larger than
# BUCKET_CAP are dropped entirely. Recall impact (pinned in
# test_minhash_recall.py): pairs inside an oversized bucket are
# near-identical boilerplate clones — exactly the pairs EXACT dedup
# (dedup_exact_documents, run first in any real curation pipeline)
# already catches — and a genuinely-near-dup pair loses only the
# bands/blocks that collided with the degenerate mass, keeping its
# other N_BANDS-1 (or 3 of 4 block) chances. The fixtures' buckets are
# all far below the cap (max ~3), so gate/bench results are unchanged;
# the firing path is pinned by test_bucket_cap_drops_degenerate_mass.
BUCKET_CAP = 64


def _cap_buckets(df: DataFrame, *keys: str, cap: int = BUCKET_CAP) -> DataFrame:
    """Drop rows of over-populated buckets. The count runs as a window
    over the bucket keys, which the preceding ``spread(df, *keys)``
    exchange already satisfies — no extra shuffle, one local sort."""
    from pyspark.sql import Window

    n = F.count("*").over(Window.partitionBy(*keys))
    return df.withColumn("_bn", n).filter(F.col("_bn") <= cap).drop("_bn")


def minhash_signature(shingles: F.Column) -> F.Column:
    """64 minhash values; permutation i = min over shingles of
    xxhash64(shingle, seed=i). Built-ins only, no UDF.

    ONE aggregate pass over the shingle array, folding an elementwise
    running minimum of the 64 per-shingle hashes — vs the naive 64 ×
    (transform + array_min), which re-traverses the (typically ≫64
    element) shingle array once per permutation and allocates 64
    hash arrays of that length per doc. Measured 1.2× on the full
    dedup_minhash_lsh query at sf0.1 (2.0 s → 1.6 s median).
    On an empty array the signature is the MAX_LONG init vector
    (callers filter empty docs first)."""
    return F.aggregate(
        shingles,
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), N_PERM),
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(N_PERM)]),
            lambda a, b: F.least(a, b),
        ),
    )


LSH_RECALL_BOUND = 0.95  # imported by tests/test_minhash_recall.py


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    {_EXACT_JACCARD_CTES}
    SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
           true AS subset_ok,
           true AS recall_ok
    FROM exact_pairs
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate generation, driver-gated as a BOUNDS
    CHECK (r12; was rows-only): candidate pairs are probabilistic, so
    the gate row emits what IS cross-engine checkable — the exact
    Jaccard pair count (DuckDB recomputes it through the shared
    _EXACT_JACCARD_CTES; a Spark-side drift in shingling, hot-shingle
    cutoff, or the posting-list join hash-mismatches here) plus two
    engine-computed booleans the oracle pins to TRUE: every verified
    LSH pair is in the exact set (no false positives — verification
    is exact Jaccard on hashed shingles) and LSH recall ≥
    {LSH_RECALL_BOUND}. The pair LIST surface stays available as
    ``minhash_lsh_pairs`` (the library API) and is pinned by
    tests/test_minhash_recall.py at two SFs.

    Plan shape (unchanged underneath): signatures map-side → explode
    to (band, band_hash, doc) → shuffle on band_hash (tiny rows) →
    per-bucket member list with the BUCKET_CAP size filter → pairs
    enumerated IN-BUCKET by an array expression → exact verify on the
    candidate subset only — no all-pairs work anywhere, no degenerate
    bucket can go quadratic. The summary adds one semi/anti join pair
    against the exact relation (both sides cached pair lists, tiny)."""
    docs = table(spark, sf_dir, "documents")
    # ONE shingle cache shared by both legs (each would otherwise
    # tracked_cache an identical with_shingles subtree and compute the
    # expensive interpreted shingling twice — code-review r12)
    base = tracked_cache(with_shingles(docs).select("doc_id", "hshingles"))
    # ONE hot-subtracted kept relation shared by both legs (r12):
    # subtract_hot_shingles runs a build-time hot-set probe job plus a
    # full explode+groupBy over every shingle — the exact and LSH legs
    # each paid it separately (guide §2.4 shared-work rule). The kept
    # arrays are cached; the exact leg explodes them, the LSH leg
    # signs and verifies over them — identical inputs either way.
    kept = tracked_cache(subtract_hot_shingles(base))
    exact = tracked_cache(
        ngram_jaccard_pairs(docs, base=base, kept=kept).select("doc_a", "doc_b")
    )
    lsh = tracked_cache(
        minhash_lsh_pairs(docs, base=base, kept=kept).select("doc_a", "doc_b")
    )
    keys = ["doc_a", "doc_b"]
    ne = exact.agg(F.count("*").cast("bigint").alias("n_exact_pairs"))
    ni = lsh.join(exact, keys, "left_semi").agg(F.count("*").alias("n_in"))
    na = lsh.join(exact, keys, "left_anti").agg(F.count("*").alias("n_out"))
    return (
        ne.crossJoin(ni)
        .crossJoin(na)
        .select(
            "n_exact_pairs",
            (F.col("n_out") == 0).alias("subset_ok"),
            (F.col("n_in") >= LSH_RECALL_BOUND * F.col("n_exact_pairs")).alias(
                "recall_ok"
            ),
        )
    )


# (a, b) for all index pairs i < j of a pre-sorted id array — at most
# C(BUCKET_CAP, 2) structs per bucket, bounded by the size filter.
_BUCKET_PAIRS = (
    "flatten(transform(ids, (a, i) -> "
    "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS doc_a, b AS doc_b))))"
)


def minhash_lsh_pairs(
    docs: DataFrame,
    base: DataFrame | None = None,
    kept: DataFrame | None = None,
) -> DataFrame:
    if base is None:
        base = tracked_cache(with_shingles(docs).select("doc_id", "hshingles"))
    # r12 (code-review): signatures AND verification run over the SAME
    # hot-subtracted kept sets as ngram_jaccard_pairs. Over FULL sets,
    # a candidate pair sharing mostly hot (boilerplate) shingles could
    # verify >= 0.5 here yet score < 0.5 on the exact op's kept sets —
    # breaking the gate row's subset_ok on corpus shape rather than
    # engine drift. Excluding df > DF_CUTOFF shingles from signatures
    # is also the standard LSH posture (boilerplate carries no
    # near-dup signal and floods bands).
    if kept is None:
        kept = subtract_hot_shingles(base)
    sh = kept.filter(F.size("hshingles") > 0)  # cheap array check
    sig = sh.select("doc_id", "hshingles", minhash_signature(F.col("hshingles")).alias("sig"))
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
    # One groupBy riding spread's (band, bh) exchange collects each
    # bucket's members; the size filter IS the cap (≥2 to pair, ≤
    # BUCKET_CAP against degenerate mass), and pairs are enumerated
    # in-bucket by an array comprehension — this replaced the r5
    # cached-self-join + count-window shape, which paid the band sort
    # twice and a cache round-trip (VERDICT r5 "Wrong #3": 2.2 s →
    # 1.9 s median at sf0.1; the uncapped floor is 1.6 s). A
    # degenerate bucket buffers its member list in the (spillable,
    # ObjectHashAggregate) agg buffer before the filter drops it —
    # the same buffering class as the WindowExec count it replaced.
    buckets = (
        spread(bands, "band", "bh")
        .groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= BUCKET_CAP))
    )
    cand = (
        buckets.select(F.explode(F.expr(_BUCKET_PAIRS)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates()
    )
    # exact verification on candidates only (hashed sets: long compares)
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hshingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hshingles").alias("sh_b"))
    verified = (
        spread(cand, "doc_a")
        .join(sa, "doc_a")
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
@register(
    "dedup_simhash",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           true AS pairs_found_ok,
           true AS hamming_bound_ok,
           true AS pairs_canonical_ok
    FROM documents
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup detection, driver-gated as a BOUNDS CHECK
    (r12; was rows-only — the xxhash64 bit votes aren't DuckDB-
    expressible, but the detector's contract is): cross-engine doc
    count, plus engine booleans the oracle pins TRUE — the detector
    finds a non-empty pair set on the planted fixture, every emitted
    pair's RE-DERIVED hamming distance (recomputed from the
    fingerprint relation through an independent join, not read off
    the pair row) is ≤ 3 with doc_a < doc_b canonical ordering. No
    false positives can survive; COMPLETENESS (blocked pairs ==
    brute-force hamming pairs minus capped buckets) is pinned by
    tests/test_minhash_recall.py::test_simhash_equals_bruteforce_sf01.
    The pair-list surface stays available as ``simhash_pairs``.

    Candidate blocking (unchanged underneath): split the 64-bit
    fingerprint into 4 16-bit blocks; pairs within hamming ≤ 3 share
    at least one exact block (pigeonhole), so a self-join per block
    replaces all-pairs. Block buckets above BUCKET_CAP are dropped
    before the self-join (the same quadratic-fan-out defense as the
    LSH bands)."""
    docs = table(spark, sf_dir, "documents")
    # the 64-bit-vote fingerprint aggregation is the op's costliest
    # subtree and is referenced THREE times (pairs + both re-derive
    # sides) — one cache, shared everywhere (code-review r12)
    fp = tracked_cache(simhash_fingerprints(docs))
    pairs = tracked_cache(simhash_pairs(docs, fp=fp))
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
    rederived = (
        pairs.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            (
                (
                    F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
                    == F.col("hamming")
                )
                & (F.col("hamming") <= 3)
            ).cast("int").alias("ham_ok"),
            (F.col("doc_a") < F.col("doc_b")).cast("int").alias("canon_ok"),
        )
    )
    checks = rederived.agg(
        F.count("*").alias("n_pairs"),
        F.min("ham_ok").cast("boolean").alias("hamming_bound_ok"),
        F.min("canon_ok").cast("boolean").alias("pairs_canonical_ok"),
    )
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    return n.crossJoin(F.broadcast(checks)).select(
        "n_docs",
        (F.col("n_pairs") > 0).alias("pairs_found_ok"),
        "hamming_bound_ok",
        "pairs_canonical_ok",
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp): the deterministic 64-bit SimHash fingerprint —
    exposed so tests can brute-force the exact hamming≤k pair set and
    pin the blocking's pigeonhole completeness independently."""
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.array_distinct(tokens_expr())).alias("tok")
    )
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
    return votes.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
                for i in range(64)
            ],
            F.lit(0).cast("long"),
        ).alias("fp"),
    )


def simhash_pairs(docs: DataFrame, fp: DataFrame | None = None) -> DataFrame:
    if fp is None:
        fp = simhash_fingerprints(docs)
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
    blocks = tracked_cache(_cap_buckets(spread(blocks, "blk", "bv"), "blk", "bv"))
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
COSINE_THRESHOLD = 0.95
_BLOCK = 2048  # rows per block: 2048×64 float64 ≈ 1 MB per block row


def _cosine_block_kernel(batches):
    """mapInPandas kernel over block PAIRS: one BLAS matmul per pair of
    blocks instead of per-element lambda evaluation. Emits qualifying
    (vec_a, vec_b, cosine) with vec_a < vec_b.

    The payload is FLAT primitive arrays (ids: array<bigint>, flat
    row-major values: array<double>) — Arrow moves them as one buffer
    and np.asarray(...).reshape is zero-copy-class. The r11 shape
    (array<struct<bigint, array<double>>>) decoded to per-element
    Python dicts here and boxed every double JVM-side; that
    allocation churn made the query GC-/session-state-sensitive —
    the root cause of the reproduced in-suite 8x inflation (r12)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out_a, out_b, out_c = [], [], []
        for i in range(len(pdf)):
            ida = np.asarray(pdf["xi"].iloc[i], dtype=np.int64)
            idb = np.asarray(pdf["yi"].iloc[i], dtype=np.int64)
            # np.array (copy): the Arrow-backed buffer is read-only
            # and the normalize below is in-place
            A = np.array(pdf["xv"].iloc[i], dtype=np.float64).reshape(len(ida), -1)
            B = np.array(pdf["yv"].iloc[i], dtype=np.float64).reshape(len(idb), -1)
            A /= np.linalg.norm(A, axis=1, keepdims=True)
            B /= np.linalg.norm(B, axis=1, keepdims=True)
            S = A @ B.T
            ia, ib = np.nonzero((S >= COSINE_THRESHOLD) & (ida[:, None] < idb[None, :]))
            out_a.append(ida[ia])
            out_b.append(idb[ib])
            out_c.append(S[ia, ib])
        yield pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else [],
                "cos_raw": np.concatenate(out_c) if out_c else [],
            }
        )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {PLANTED_EMB_SQL}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
    FROM (SELECT * FROM embeddings_planted WHERE embedding IS NOT NULL) a
    JOIN (SELECT * FROM embeddings_planted WHERE embedding IS NOT NULL) b
      ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: cosine ≥ 0.95, exact, over the
    embeddings table with planted clones (cosine exactly 1.0 against
    their originals — see PLANT_MOD) so the gate verifies a non-empty
    pair set.

    Blocked all-pairs: vectors are grouped into ~1 MB blocks, the
    upper-triangle of block pairs fans out as independent tasks, and
    each task is a single BLAS matmul (Arrow in, numpy, Arrow out).
    O(n²/B²) tasks — the distributed GEMM shape that survives scale-up;
    for truly huge n the LSH-bucketed path (``similarity.
    ann_lsh_buckets``) prunes the block grid first. Hash-verified
    against DuckDB's list_cosine_similarity.

    Block payloads are FLAT primitive arrays: collect_list(vec_id)
    beside flatten(collect_list(v)) — both aggregates consume the
    group's rows in the same single pass, so ids[i] always labels flat
    row i. The r11 array<struct<...>> payload boxed every double in
    the JVM aggregate, broadcast the blocks relation TWICE (x/y legs,
    uncached), and Arrow-decoded to per-element Python dicts — an
    allocation storm whose cost tracked JVM heap state (9 s at 8g vs
    4 s at 16g vs 1 s on the baseline host; the reproduced in-suite
    8.24x flag). Flat primitives make the plan allocation-light and
    session-state-insensitive; blocks is deliberately NOT cached —
    see the inline comment below."""
    emb = (
        plant_duplicates(table(spark, sf_dir, "embeddings"), "vec_id")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        # collect_list drops NULLs PER COLUMN, so a NULL vec_id or v
        # would desynchronize ids[i] from flat row i in the block
        # payload (the old struct payload kept them co-located). Drop
        # such rows explicitly — the oracle's cosine against a NULL
        # embedding is NULL and fails the >= threshold the same way
        # (code-review r12).
        .filter(F.col("vec_id").isNotNull() & F.col("v").isNotNull())
    )
    # NOT cached, deliberately: InMemoryRelation's columnar
    # (de)serialization of wide array columns costs multiples of the
    # 0.5 s aggregate it would save (measured: cached reads 4-8 s vs
    # 1 s uncached end-to-end) — recomputing the cheap groupBy on each
    # self-join leg is the faster and allocation-lighter plan
    blocks = (
        emb.withColumn("blk", (F.col("vec_id") / _BLOCK).cast("int"))
        .groupBy("blk")
        .agg(
            F.collect_list("vec_id").alias("ids"),
            F.flatten(F.collect_list("v")).alias("flat"),
        )
    )
    x, y = blocks.alias("x"), blocks.alias("y")
    grid = x.join(y, F.col("x.blk") <= F.col("y.blk")).select(
        F.col("x.ids").alias("xi"),
        F.col("x.flat").alias("xv"),
        F.col("y.ids").alias("yi"),
        F.col("y.flat").alias("yv"),
    )
    pairs = grid.mapInPandas(
        _cosine_block_kernel, schema="vec_a bigint, vec_b bigint, cos_raw double"
    )
    return pairs.select(
        "vec_a", "vec_b", F.round("cos_raw", 4).alias("cosine")
    ).orderBy("vec_a", "vec_b")


# --------------------------------------------------------------------------
# normalized exact dedup (casefold + whitespace collapse)
# --------------------------------------------------------------------------
# The planted clones here are MUTATED (upper-cased, double-spaced,
# padded) so the raw md5 of clone != original: exact dedup misses
# them by construction and only the normalized digest may group them —
# the gate row is then evidence the normalization itself works, not a
# re-test of exact dedup. n_variants counts distinct RAW digests per
# group (2 for every planted pair) as the in-row proof.


def _mutate(text: F.Column) -> F.Column:
    return F.concat(
        F.lit("  "), F.upper(F.regexp_replace(text, " ", "  ")), F.lit(" ")
    )


@register(
    "dedup_normalized",
    oracle=f"""
    WITH docs_m AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id,
             '  ' || upper(replace(text, ' ', '  ')) || ' ' AS text
      FROM documents WHERE doc_id % {PLANT_MOD} = 0
    )
    SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS norm_hash,
           count(*) AS n_copies,
           count(DISTINCT md5(text)) AS n_variants,
           min(doc_id) AS keeper_doc_id
    FROM docs_m
    GROUP BY 1 HAVING count(*) > 1
    ORDER BY norm_hash
    """,
)
def dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact dedup (the Dolma/Gopher first pass):
    casefold, trim, collapse runs of whitespace, THEN digest-group —
    catches the re-encoded/re-wrapped copies raw-byte dedup misses
    while staying a single map-side digest + one shuffle (identical
    scale posture to ``dedup_exact_documents``; any further
    normalizers — punctuation strip, unicode NFKC via a JVM expr —
    slot into the same map stage at zero extra shuffles)."""
    docs = table(spark, sf_dir, "documents")
    clones = docs.filter(F.col("doc_id") % PLANT_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        _mutate(F.col("text")).alias("text"),
    )
    planted = docs.select("doc_id", "text").unionByName(clones)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        planted.select(
            F.md5(norm).alias("norm_hash"), F.md5(F.col("text")).alias("raw_hash"), "doc_id"
        )
        .groupBy("norm_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("raw_hash").alias("n_variants"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("norm_hash")
    )


# --------------------------------------------------------------------------
# semantic dedup: SRP bucket + within-bucket exact cosine
# --------------------------------------------------------------------------
# SemDeDup-shaped: partition the embedding space coarsely, verify
# pairs ONLY within a cell. The cells here are axis-aligned sign
# buckets over the first SRP_PLANES dims — a random-hyperplane LSH
# whose planes are the coordinate axes, which keeps the oracle plain
# SQL (sign tests) while exercising the same plan shape as the
# hash-derived-plane variant (ann_lsh_buckets). 2^SRP_PLANES cells is
# deliberately tiny for the fixture; production uses 12-16 planes
# (4k-65k cells) or the IVF codebook (ivf_kmeans_codebook) — the plan
# below is unchanged, only the bucket expression widens.
SRP_PLANES = 3
SEM_COSINE_THRESHOLD = 0.95
SEM_BUCKET_CAP = 4096  # same degenerate-cell defense as BUCKET_CAP


def _srp_bucket(v: F.Column) -> F.Column:
    b = F.lit(0)
    for i in range(SRP_PLANES):
        b = b + F.when(F.element_at(v, i + 1) > 0, F.lit(1 << (SRP_PLANES - 1 - i))).otherwise(
            F.lit(0)
        )
    return b.cast("int")


@register(
    "semantic_dedup_srp",
    oracle=f"""
    WITH {PLANTED_EMB_SQL},
    b AS (
      SELECT vec_id, embedding,
             4 * CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
           + 2 * CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END
           +     CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END AS bucket
      FROM embeddings_planted
    ),
    ok AS (SELECT bucket FROM b GROUP BY bucket HAVING count(*) <= {SEM_BUCKET_CAP}),
    bb AS (SELECT b.vec_id, b.embedding, b.bucket FROM b JOIN ok USING (bucket))
    SELECT a.bucket, a.vec_id AS keep_id, c.vec_id AS drop_id,
           round(list_cosine_similarity(a.embedding, c.embedding), 4) AS cosine
    FROM bb a JOIN bb c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE list_cosine_similarity(a.embedding, c.embedding) >= {SEM_COSINE_THRESHOLD}
    ORDER BY keep_id, drop_id
    """,
)
def semantic_dedup_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs, SemDeDup-shaped: coarse-partition the
    embedding space (sign-bucket LSH), drop degenerate cells above
    SEM_BUCKET_CAP, exact-verify cosine ONLY within a cell. vs the
    blocked-GEMM exact path (dedup_embedding_cosine): candidate count
    falls from O(n²/B²) blocks to O(Σ cell²) — at production plane
    counts cells are small and the join is the standard bucketed
    self-join that survives 100 TB.

    SCALE CAVEAT (explicit): SRP_PLANES is a fixture-scale constant.
    The cell count must grow with the corpus (planes ≈ log2(n /
    target_cell)); with the plane count frozen, every cell eventually
    exceeds SEM_BUCKET_CAP and the cap — correctly refusing quadratic
    work — drops ALL of them, i.e. the operator degrades to empty
    output rather than to a blow-up. Production corpora should use
    ``similarity.srp_bucket_expr`` (hash-derived planes, 12-16 of
    them) or the IVF cells (``ivf_kmeans_codebook``) as the
    partitioner feeding this same verify tail; the SQL-expressible
    axis-sign bucket here exists so the WHOLE chain stays
    oracle-checkable.

    All JVM: sign bucket and L2 norm are map-side expressions; the
    self-join shuffles on the bucket key; the dot product is a
    codegen'd ``aggregate(zip_with(...))`` fold — no Python, no UDF.
    Cosine values hash-checked against DuckDB's
    list_cosine_similarity at 4 dp (same contract as
    dedup_embedding_cosine)."""
    emb = plant_duplicates(table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return _semantic_verify_tail(
        emb.withColumn("bucket", _srp_bucket(F.col("v")))
    )


def _srp_cell_kernel(batches):
    """mapInPandas kernel over per-bucket groups (bucket, ids, flat):
    one normalized GEMM per cell instead of an interpreted
    ``aggregate(zip_with(...))`` fold per PAIR — the in-cell pair count
    is quadratic in occupancy, so at the cap (4096) a single cell is
    ~8.4 M folds of dim lambda dispatches vs one 4096×dim matmul here.
    Same flat-payload + normalize-then-matmul shape as
    ``_cosine_block_kernel`` (whose round(·,4) output hash-matches
    DuckDB's sequential-sum cosine — the 4dp-boundary precedent).
    Emits qualifying (bucket, keep_id, drop_id, cos_raw) with
    keep_id < drop_id. Zero-norm rows: 0/0 -> NaN, and numpy's
    ``NaN >= t`` is False, so degenerate vectors emit NO pair — the
    operator's DEFINED semantics (a zero vector has no direction, so
    it is never anyone's near-duplicate). NOTE (ADVICE r12): the fold
    reference path cannot be left bare — under ANSI mode (Spark 4
    default) its division ERRORS on a zero-norm pair, and with ANSI
    off Spark's ``>=`` orders NaN ABOVE every value and would KEEP
    the pair — so it guards the division (NULL ⇒ dropped) to match
    (pinned by test_srp_kernel.py::test_zero_norm_vectors_drop)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out_b, out_a, out_c, out_s = [], [], [], []
        for i in range(len(pdf)):
            ids = np.asarray(pdf["ids"].iloc[i], dtype=np.int64)
            V = np.array(pdf["flat"].iloc[i], dtype=np.float64).reshape(len(ids), -1)
            with np.errstate(divide="ignore", invalid="ignore"):
                V /= np.linalg.norm(V, axis=1, keepdims=True)
            S = V @ V.T
            ia, ic = np.nonzero(
                (S >= SEM_COSINE_THRESHOLD) & (ids[:, None] < ids[None, :])
            )
            out_b.append(np.full(len(ia), pdf["bucket"].iloc[i], dtype=np.int32))
            out_a.append(ids[ia])
            out_c.append(ids[ic])
            out_s.append(S[ia, ic])
        yield pd.DataFrame(
            {
                "bucket": np.concatenate(out_b) if out_b else [],
                "keep_id": np.concatenate(out_a) if out_a else [],
                "drop_id": np.concatenate(out_c) if out_c else [],
                "cos_raw": np.concatenate(out_s) if out_s else [],
            }
        )


def _semantic_verify_tail(
    emb: DataFrame, cap: int = SEM_BUCKET_CAP, kernel: bool = True
) -> DataFrame:
    """The SemDeDup verify stage shared by every coarse partitioner:
    ``emb`` is (vec_id, v DOUBLE[], bucket); output is the in-bucket
    near-dup pairs at SEM_COSINE_THRESHOLD. Plan shape: ONE exchange
    on bucket, cap rides it as a window, then one GEMM task per cell
    (``_srp_cell_kernel``) — no self-join, no cache, the capped
    relation is consumed exactly once. ``kernel=False`` keeps the
    r11 fold-based self-join for the equivalence pin
    (tests/test_srp_kernel.py)."""
    if kernel:
        capped = _cap_buckets(
            spread(emb.select("vec_id", "v", "bucket"), "bucket"), "bucket", cap=cap
        )
        # collect_list drops NULLs PER COLUMN → a null vec_id or v would
        # desynchronize ids[i] from flat row i (the _cosine_block_kernel
        # precedent). Filter AFTER the cap so such rows still count
        # toward occupancy exactly as they did in the join path (where
        # they rode the window but produced only null-cosine pairs).
        groups = (
            capped.filter(F.col("vec_id").isNotNull() & F.col("v").isNotNull())
            .groupBy("bucket")
            .agg(
                F.collect_list("vec_id").alias("ids"),
                F.flatten(F.collect_list("v")).alias("flat"),
            )
        )
        pairs = groups.mapInPandas(
            _srp_cell_kernel,
            schema="bucket int, keep_id bigint, drop_id bigint, cos_raw double",
        )
        return pairs.select(
            "bucket", "keep_id", "drop_id", F.round("cos_raw", 4).alias("cosine")
        ).orderBy("keep_id", "drop_id")
    emb = emb.select(
        "vec_id",
        "v",
        "bucket",
        F.sqrt(
            F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)
        ).alias("nrm"),
    )
    # cache the bucketed+capped relation: the self-join references it
    # twice, and without the cache each alias branch re-scans and
    # re-caps the full corpus (2× scan at any scale)
    emb = tracked_cache(_cap_buckets(spread(emb, "bucket"), "bucket", cap=cap))
    a, c = emb.alias("a"), emb.alias("c")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("c.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # zero-norm guard (ADVICE r12): under ANSI mode (Spark 4 default)
    # a bare division ERRORS on a zero-norm pair; the guard yields
    # NULL, which the threshold filter drops — matching the kernel's
    # defined semantics (numpy NaN >= t is False ⇒ no pair).
    nrm_prod = F.col("a.nrm") * F.col("c.nrm")
    cos_raw = F.when(nrm_prod > 0, dot / nrm_prod)
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.bucket").alias("bucket"),
            F.col("a.vec_id").alias("keep_id"),
            F.col("c.vec_id").alias("drop_id"),
            cos_raw.alias("cos_raw"),
        )
        # NaN filtered explicitly (ADVICE r12): Spark's >= orders NaN
        # above every value, so 0/0 zero-norm cosines would otherwise
        # pass the threshold here while the kernel path (numpy
        # NaN >= t == False) drops them. Dropping IS the defined
        # semantics — see _srp_cell_kernel's docstring.
        .filter(
            ~F.isnan(F.col("cos_raw"))
            & (F.col("cos_raw") >= SEM_COSINE_THRESHOLD)
        )
        .select("bucket", "keep_id", "drop_id", F.round("cos_raw", 4).alias("cosine"))
        .orderBy("keep_id", "drop_id")
    )


# Cell-sizing target for the production-posture variant below: planes
# grow with the corpus so expected cell occupancy stays ~SRP_TARGET_CELL
# and in-cell pair work stays ~n × SRP_TARGET_CELL (linear), never n².
SRP_TARGET_CELL = 256


def srp_planes_for(n: int) -> int:
    """planes = max(SRP_PLANES, ceil(log2(n / SRP_TARGET_CELL))): cell
    count tracks the corpus so expected occupancy stays ~SRP_TARGET_CELL
    (2 020 → 3, 20 200 → 7, 10⁹ → 22)."""
    import math

    return max(SRP_PLANES, math.ceil(math.log2(max(n / SRP_TARGET_CELL, 2.0))))


def semantic_srp_scaled_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``semantic_dedup_srp``'s documented SCALE CAVEAT, closed: the
    fixture op freezes SRP_PLANES=3 (8 cells, oracle-expressible sign
    tests), so cell occupancy — and the in-cell quadratic verify —
    grows linearly with the corpus (measured on the 10× sf1 rehearsal
    fixture: 2.2 s → 74 s, a 33× blow-up). This variant is the
    production posture the docstring prescribes: hash-derived planes
    (``similarity.srp_bucket_expr``) with the plane count chosen from
    the corpus size, planes = max(3, ceil(log2(n / SRP_TARGET_CELL))),
    so expected occupancy is ~constant and total pair work is ~linear.
    The count that sizes the planes is one cheap driver-side job
    (parquet row-count metadata) — the same adaptive-planning move AQE
    makes from shuffle statistics. Identical verify tail, identical
    output contract (recall vs the exact-cosine set pinned in
    test_srp_scaled.py). The pair-list library surface; the r12 gate
    row is the bounds-check summary below."""
    from .similarity import srp_bucket_expr

    emb = plant_duplicates(table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    planes = srp_planes_for(emb.count())
    dim = len(emb.select("v").first()[0])
    return _semantic_verify_tail(
        emb.withColumn("bucket", srp_bucket_expr(F.col("v"), dim, planes))
    )


@register(
    "semantic_dedup_srp_scaled",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_planted_pairs,
           true AS planted_recovered_ok,
           true AS pairs_cosine_verified_ok
    FROM embeddings WHERE vec_id % {PLANT_MOD} = 0
    """,
)
def semantic_dedup_srp_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-adaptive SRP semantic dedup, driver-gated as a BOUNDS
    CHECK (r12; was the registry's last rows-only entry — xxhash-
    derived planes aren't DuckDB-expressible, but the detector's
    contract is, and every check here is LINEAR so the gate row keeps
    the production scale posture): the cross-engine value is the
    planted-clone pair count (clones are identical vectors — cosine
    1.0, same bucket under ANY deterministic plane set, so ALL must
    be recovered), and the engine booleans the oracle pins TRUE are
    (a) planted recovery and (b) per-pair cosine RE-DERIVED from the
    embeddings relation through an independent join is >= the
    threshold for every emitted pair (precision — no false positive
    survives). Global recall vs the exact all-pairs set stays pinned
    at audit scale by test_srp_scaled.py over the
    ``semantic_srp_scaled_pairs`` library surface."""
    base = table(spark, sf_dir, "embeddings")
    pairs = tracked_cache(
        semantic_srp_scaled_pairs(spark, sf_dir).select("keep_id", "drop_id")
    )
    planted = base.filter(F.col("vec_id") % PLANT_MOD == 0).select(
        F.col("vec_id").alias("keep_id"),
        (F.col("vec_id") + PLANT_OFFSET).alias("drop_id"),
    )
    n_planted = planted.agg(
        F.count("*").cast("bigint").alias("n_planted_pairs")
    )
    missed = planted.join(pairs, ["keep_id", "drop_id"], "left_anti").agg(
        F.count("*").alias("n_missed")
    )
    # both re-derive sides reference this relation — cache it so the
    # union-with-clones + cast subtree scans the table once
    # (code-review r12; the _semantic_verify_tail precedent)
    emb_p = tracked_cache(
        plant_duplicates(base, "vec_id").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    ea = emb_p.select(F.col("vec_id").alias("keep_id"), F.col("v").alias("va"))
    eb = emb_p.select(F.col("vec_id").alias("drop_id"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    )
    verified = (
        pairs.join(ea, "keep_id")
        .join(eb, "drop_id")
        .select(
            ((dot / (nrm(F.col("va")) * nrm(F.col("vb"))))
             >= SEM_COSINE_THRESHOLD).cast("int").alias("ok")
        )
        .agg(F.min("ok").cast("boolean").alias("all_verified"))
    )
    return (
        n_planted.crossJoin(F.broadcast(missed))
        .crossJoin(F.broadcast(verified))
        .select(
            "n_planted_pairs",
            (F.col("n_missed") == 0).alias("planted_recovered_ok"),
            F.coalesce(F.col("all_verified"), F.lit(True)).alias(
                "pairs_cosine_verified_ok"
            ),
        )
    )


# --------------------------------------------------------------------------
# containment (asymmetric near-dup: excerpt/superset detection)
# --------------------------------------------------------------------------
# Jaccard misses the classic scraped-web shape where one document CONTAINS
# another (quote + commentary): |A∩B|/|A∪B| dilutes with the superset's
# extra content, but |A∩B|/min(|A|,|B|) stays 1.0. The planted fixture
# clones id % PLANT_MOD == 0 docs WITH APPENDED COMMENTARY, so the clone
# strictly contains the original's shingles — a pair only the containment
# measure is guaranteed to flag.
CONTAIN_THRESHOLD = 0.9
CONTAIN_SUFFIX = (
    "editorial note this excerpt is reproduced with additional commentary "
    "for context and review purposes only"
)

_CONTAIN_DOCS_SQL = f"""documents_contain AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id,
             text || ' {CONTAIN_SUFFIX}' AS text, lang, source, n_chars
      FROM documents WHERE doc_id % {PLANT_MOD} = 0
    )"""


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_CONTAIN_DOCS_SQL},
    sh AS (
      SELECT doc_id, unnest(list_distinct([
               x[1] || ' ' || x[2] || ' ' || x[3]
               FOR x IN [
                 toks[i:i+2] FOR i IN range(1, len(toks) - 1)
               ] IF len(x) = 3
             ])) AS shingle
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents_contain)
      WHERE len(toks) >= 3
    ),
    kept AS (
      SELECT doc_id, shingle FROM sh
      QUALIFY count(*) OVER (PARTITION BY shingle) <= {DF_CUTOFF}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           n_common::DOUBLE / least(sa.n, sb.n) AS containment
    FROM common JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common::DOUBLE / least(sa.n, sb.n) >= {CONTAIN_THRESHOLD}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs — |A∩B| / min(|A|, |B|) ≥ {CONTAIN_THRESHOLD}
    over non-stop 3-gram shingles, via the SAME posting-list index,
    DF cutoff, and hot-set subtraction as ``ngram_jaccard_pairs``
    (identical scale posture: per-shingle fan-out ≤ DF_CUTOFF², no
    corpus-proportional broadcast). Only the final per-pair formula
    differs — an exact-int division, hash-stable across engines."""
    docs = table(spark, sf_dir, "documents")
    clones = docs.filter(F.col("doc_id") % PLANT_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + CONTAIN_SUFFIX)).alias("text"),
        "lang", "source", "n_chars",
    )
    planted = docs.unionByName(clones)
    pairs = ngram_containment_pairs(planted)
    return pairs


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float = CONTAIN_THRESHOLD,
    df_cutoff: int = DF_CUTOFF,
) -> DataFrame:
    """``ngram_jaccard_pairs``'s index with the containment measure;
    the kept-set step (DF cutoff + hot-set subtraction with the
    >literal_max distributed fallback) is the shared
    ``subtract_hot_shingles``."""
    base = tracked_cache(with_shingles(docs).select("doc_id", "hshingles"))
    base = subtract_hot_shingles(base, df_cutoff)
    sh = spread(
        base.select(
            "doc_id", F.size("hshingles").alias("n"), F.explode("hshingles").alias("shingle")
        ),
        "shingle",
    )
    a, b = sh.alias("a"), sh.alias("b")
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
    cont = F.col("n_common") / F.least(F.col("na"), F.col("nb"))
    return (
        common.filter(cont >= threshold)
        .select("doc_a", "doc_b", cont.alias("containment"))
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# incremental dedup: new batch vs existing corpus
# --------------------------------------------------------------------------
# The production shape: a daily ingest batch must be deduped AGAINST
# THE EXISTING CORPUS, not only within itself — the posting-list join
# becomes new×existing instead of a self-join, so the pair space is
# |batch|-proportional, never |corpus|². The fixture splits on doc_id
# parity (even = existing corpus, odd = incoming batch) and PLANTS
# fuzzy incoming near-dups: existing docs re-ingested with a syndication
# prefix (id % INCR_MOD, offset to the odd side).
INCR_MOD = 50
INCR_PREFIX = "breaking update exclusive syndicated report follows"
INCR_THRESHOLD = 0.5


@register(
    "dedup_incremental_batch",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, 'existing' AS side FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, text, 'incoming' AS side FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} + 1 AS doc_id,
             '{INCR_PREFIX} ' || text AS text, 'incoming' AS side
      FROM documents WHERE doc_id % {INCR_MOD} = 0
    ),
    sh AS (
      SELECT doc_id, side, unnest(list_distinct([
               x[1] || ' ' || x[2] || ' ' || x[3]
               FOR x IN [
                 toks[i:i+2] FOR i IN range(1, len(toks) - 1)
               ] IF len(x) = 3
             ])) AS shingle
      FROM (SELECT doc_id, side, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM corpus)
      WHERE len(toks) >= 3
    ),
    kept AS (
      SELECT doc_id, side, shingle FROM sh
      QUALIFY count(*) OVER (PARTITION BY shingle) <= {DF_CUTOFF}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
    common AS (
      SELECT n.doc_id AS doc_new, e.doc_id AS doc_existing, count(*) AS n_common
      FROM kept n JOIN kept e ON n.shingle = e.shingle
      WHERE n.side = 'incoming' AND e.side = 'existing'
      GROUP BY 1, 2
    )
    SELECT doc_new, doc_existing,
           n_common::DOUBLE / (sn.n + se.n - n_common) AS jaccard
    FROM common JOIN sizes sn ON sn.doc_id = doc_new
                JOIN sizes se ON se.doc_id = doc_existing
    WHERE n_common::DOUBLE / (sn.n + se.n - n_common) >= {INCR_THRESHOLD}
    ORDER BY doc_new, doc_existing
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: fuzzy matches of the INCOMING batch
    against the EXISTING corpus through one shared posting-list index
    (same shingling, ``subtract_hot_shingles`` kept-set step — incl.
    the >literal_max distributed fallback, since daily web ingests are
    exactly the extreme-boilerplate regime — and exact-rational
    Jaccard as ``dedup_ngram_jaccard``) — but the join is new×existing, so the
    candidate space scales with the BATCH, and at 100 TB the existing
    side's index is the thing you persist between ingests (write it
    once with ``sinks.bucketed.write_bucketed`` on the shingle key and
    the daily join is co-located and shuffle-free on the corpus side)."""
    docs = table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    replant = docs.filter(F.col("doc_id") % INCR_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET + 1).alias("doc_id"),
        F.concat(F.lit(INCR_PREFIX + " "), F.col("text")).alias("text"),
    )
    incoming = incoming.unionByName(replant)
    return incremental_jaccard_pairs(existing, incoming)


def incremental_jaccard_pairs(
    existing: DataFrame,
    incoming: DataFrame,
    threshold: float = INCR_THRESHOLD,
    df_cutoff: int = DF_CUTOFF,
    literal_max: int = HOT_LITERAL_MAX,
) -> DataFrame:
    """Core of ``dedup_incremental_batch`` with the kept-set knobs
    exposed (so the >literal_max fallback is testable on a synthetic
    hot corpus — ``tests/test_hot_shingles.py``)."""
    corpus = existing.withColumn("side", F.lit("existing")).unionByName(
        incoming.withColumn("side", F.lit("incoming"))
    )
    base = tracked_cache(
        with_shingles(corpus)
        .join(corpus.select("doc_id", "side"), "doc_id")
        .select("doc_id", "side", "hshingles")
    )
    base = subtract_hot_shingles(base, df_cutoff, literal_max, extra_cols=("side",))
    sh = spread(
        base.select(
            "doc_id",
            "side",
            F.size("hshingles").alias("n"),
            F.explode("hshingles").alias("shingle"),
        ),
        "shingle",
    )
    new = sh.filter(F.col("side") == "incoming").alias("a")
    ex = sh.filter(F.col("side") == "existing").alias("b")
    common = (
        new.join(ex, F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(
            F.col("a.doc_id").alias("doc_new"),
            F.col("b.doc_id").alias("doc_existing"),
            F.col("a.n").alias("nn"),
            F.col("b.n").alias("ne"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("nn") + F.col("ne") - F.col("n_common"))
    return (
        common.filter(jac >= threshold)
        .select("doc_new", "doc_existing", jac.alias("jaccard"))
        .orderBy("doc_new", "doc_existing")
    )


# --------------------------------------------------------------------------
# repeated-span detection (ExactSubstr-style, Lee et al. 2021)
# --------------------------------------------------------------------------
# "Deduplicating Training Data Makes Language Models Better" removes
# EXACT repeated token spans rather than whole near-dup documents —
# the boilerplate/citation/license text that whole-doc Jaccard leaves
# behind. The suffix-array construction doesn't map to Spark; the
# equivalent relational shape does: every K-token rolling span (WITH
# position multiplicity — a span repeated inside one doc counts), one
# map-side-combined count per span, join the counts back, aggregate
# per doc. Spans are carried as xxhash64 LONGS through the shuffle
# (the hshingles trick): the exchange moves 8-byte keys, not K-token
# strings. The fixture plants a shared license footer on every
# doc_id % SPAN_MOD == 0 row, mirrored byte-exactly in the oracle.
SPAN_K = 8
SPAN_MOD = 25
SPAN_FOOTER = (
    "all rights reserved unauthorized reproduction of this "
    "document is strictly prohibited"
)


def plant_span_footer(docs: DataFrame) -> DataFrame:
    """Append SPAN_FOOTER to every doc_id % SPAN_MOD == 0 row — the
    ONE definition both span gate ops (and, byte-exactly, both their
    oracles) share; a drifted copy would desynchronize the twins
    silently."""
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % SPAN_MOD == 0,
            F.concat(F.col("text"), F.lit(" " + SPAN_FOOTER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


@register(
    "dedup_repeated_spans",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % {SPAN_MOD} = 0
                  THEN text || ' {SPAN_FOOTER}' ELSE text END AS text
      FROM documents
    ),
    sp AS (
      SELECT doc_id, unnest([
               array_to_string(x, ' ')
               FOR x IN [
                 toks[i:i+{SPAN_K - 1}] FOR i IN range(1, len(toks) - {SPAN_K - 2})
               ] IF len(x) = {SPAN_K}
             ]) AS span
      FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM corpus)
      WHERE len(toks) >= {SPAN_K}
    ),
    cnt AS (SELECT span, count(*) AS c FROM sp GROUP BY span)
    SELECT doc_id,
           count(*)::BIGINT AS n_spans,
           sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_repeated,
           sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS repeat_ratio
    FROM sp JOIN cnt USING (span)
    GROUP BY doc_id
    HAVING n_repeated > 0
    ORDER BY doc_id
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-{SPAN_K}-token-span stats over the corpus
    (planted license-footer fixture so the gate sees real repeats)."""
    return repeated_span_stats(
        plant_span_footer(table(spark, sf_dir, "documents"))
    )


def _span_hash_arrays(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, span_hs) — the K-token span xxhash64 array per doc of
    ≥ k tokens, materialized ONCE (projection-collapse rule: inlining
    the transform into explode would re-evaluate per use).

    Spread BEFORE tokenizing (r13, guide §2.5 input parallelism): the
    documents scan is often ONE parquet split, and tokenize + span
    hashing are CPU per row — un-spread, the whole span build ran in
    one task at the 10× scale leg (the with_shingles precedent)."""
    toked = spread(docs, "doc_id").select(
        "doc_id", tokens_expr().alias("toks")
    ).filter(F.size("toks") >= k)
    return toked.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(toks) - {k - 1}), "
            f"i -> xxhash64(concat_ws(' ', slice(toks, i, {k}))))"
        ).alias("span_hs"),
    )


def _mark_span_counts(
    sp: DataFrame,
    salts: int | None,
    order_col: str,
    count_join: bool = False,
) -> DataFrame:
    """Append ``c`` = corpus-wide occurrence count of each row's span.

    Default (``salts=None``, the measured winner): ONE exchange on the
    8-byte span hash + a window count PARTITIONED BY span_h riding it
    (one local sort, spillable per-group buffering; no join, no cache,
    no second span-scale shuffle). No key goes quadratic: a degenerate
    span repeated 10⁶ times is one window group, counted not paired —
    but it IS one task's group, so a boilerplate span covering ~10% of
    span rows makes that task a straggler at extreme scale.

    r13 re-adjudication: the cache + groupBy(span_h) + count-back-join
    shape (``count_join=True``, kept for the measurement pin) was
    built on the theory that the sort and the scattered-doc second
    exchange dominate; interleaved A/B at the 10× scale leg AFTER the
    input-parallelism fix in ``_span_hash_arrays`` says otherwise —
    window 3.2-3.8 s vs count-join 4.5-5.6 s (stats), 4.6-5.0 vs
    5.2-5.6 (removal): the cache materialization + extra join stages
    cost more than the sort they remove. The window stays the default;
    the REAL r13 win for this family was spreading the one-split
    documents scan before tokenization (2× at sf1).

    ``salts=S`` opts into the skew-bounded two-level shape (VERDICT r6
    ask #4): exchange on (span_h, salt) spreads any hot span over S
    tasks; per-bucket counts + one leader row per bucket ride that
    exchange (same window spec → same sort), bucket totals are summed
    per span over the THIN leader relation (≤ S rows/span), and flow
    back via an equi-join on (span_h, salt) that reuses the existing
    partitioning (only the thin side re-exchanges). Measured on a
    planted fixture with ONE span covering 30% of span rows
    (local[32], median of 3): 2.4 M span rows → default 1.87 s vs
    salted 4.07 s; 9.7 M rows → 4.90 s vs 8.02 s."""
    from pyspark.sql import Window

    if salts is None and count_join:
        sp = tracked_cache(sp)
        cnt = (
            sp.groupBy("span_h")
            .agg(F.count("*").alias("c2"))
            .filter(F.col("c2") >= 2)
        )
        return sp.join(cnt, "span_h", "left").withColumn(
            "c", F.coalesce(F.col("c2"), F.lit(1))
        ).drop("c2")
    if salts is None:
        sp = spread(sp, "span_h")
        return sp.withColumn(
            "c", F.count("*").over(Window.partitionBy("span_h"))
        )
    sp = spread(
        sp.withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.lit(salts))),
        "span_h",
        "salt",
    )
    w1 = Window.partitionBy("span_h", "salt")
    b = sp.withColumn("c1", F.count("*").over(w1)).withColumn(
        "rn", F.row_number().over(w1.orderBy(order_col))
    )
    totals = (
        b.filter(F.col("rn") == 1)
        .select("span_h", "salt", "c1")
        .withColumn("c", F.sum("c1").over(Window.partitionBy("span_h")))
        .select("span_h", "salt", "c")
    )
    return b.drop("c1", "rn").join(totals, ["span_h", "salt"]).drop("salt")


def repeated_span_stats(
    docs: DataFrame,
    k: int = SPAN_K,
    salts: int | None = None,
    count_join: bool = False,
) -> DataFrame:
    """(doc_id, n_spans, n_repeated, repeat_ratio) for docs containing
    at least one K-token span that occurs ≥2 times in the corpus.

    Scale shape: explode → ``_mark_span_counts`` (single span-hash
    exchange by default; ``salts=S`` for the skew-bounded two-level
    variant — measurement in its docstring) → one map-side-combined
    groupBy on doc_id. The ratio is an exact-int division
    (hash-stable across engines)."""
    spans = _span_hash_arrays(docs, k)
    sp = spans.select("doc_id", F.explode("span_hs").alias("span_h"))
    marked = _mark_span_counts(sp, salts, "doc_id", count_join=count_join)
    rep = F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast("bigint")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            rep.alias("n_repeated"),
        )
        .filter(F.col("n_repeated") > 0)
        .select(
            "doc_id",
            "n_spans",
            "n_repeated",
            (F.col("n_repeated") / F.col("n_spans")).alias("repeat_ratio"),
        )
        .orderBy("doc_id")
    )


# The ACTION companion to dedup_repeated_spans: Lee et al. 2021 don't
# just score repeated spans, they CUT them from the training text.
# Semantics: a token position is removed iff it is covered by any
# K-token span occurring ≥2 times in the corpus (interval union of
# repeated span starts); the cleaned text is the remaining tokens
# joined by single spaces. Integer/string output — hash-exact.
@register(
    "repeated_span_removal",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % {SPAN_MOD} = 0
                  THEN text || ' {SPAN_FOOTER}' ELSE text END AS text
      FROM documents
    ),
    toked AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM corpus
      WHERE len(string_split_regex(lower(trim(text)), '\\s+')) >= {SPAN_K}
    ),
    sp AS (
      -- parallel unnests of equal-length lists zip row-wise in DuckDB
      SELECT doc_id,
             unnest(range(1, len(toks) - {SPAN_K - 2})) AS pos,
             unnest([array_to_string(toks[i:i+{SPAN_K - 1}], ' ')
                     FOR i IN range(1, len(toks) - {SPAN_K - 2})]) AS span
      FROM toked
    ),
    rep AS (SELECT span FROM sp GROUP BY span HAVING count(*) >= 2),
    covered AS (
      SELECT doc_id, list(DISTINCT cp) AS cov
      FROM (SELECT doc_id, unnest(range(pos, pos + {SPAN_K})) AS cp
            FROM sp WHERE span IN (SELECT span FROM rep))
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           len(c.cov)::BIGINT AS n_removed,
           coalesce(array_to_string(
             [t.toks[i] FOR i IN range(1, len(t.toks) + 1)
              IF NOT list_contains(c.cov, i)], ' '), '') AS cleaned_text
    FROM toked t JOIN covered c USING (doc_id)
    ORDER BY t.doc_id
    """,
)
def repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (the action to ``dedup_repeated_spans``'
    report): cut every corpus-repeated {SPAN_K}-token span out of the
    text. Planted license-footer fixture (same as the stats op)."""
    return remove_repeated_spans(
        plant_span_footer(table(spark, sf_dir, "documents"))
    )


def remove_repeated_spans(
    docs: DataFrame,
    k: int = SPAN_K,
    salts: int | None = None,
    count_join: bool = False,
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, cleaned_text) for docs that had at
    least one repeated span removed.

    Scale shape: the span-occurrence stream (doc_id, pos, span_h) is
    exploded once, the repetition flag comes from
    ``_mark_span_counts`` (single span-hash exchange by default;
    ``salts=S`` for the skew-bounded variant — measurement there), and
    the removed positions flow back as ONE bounded-per-doc array
    (≤ doc length) through a groupBy(doc_id) + join with the tokenized
    doc — the interval-union/cut is then a map-side array expression.
    Nothing corpus-proportional is collected or broadcast; the only
    rows that return to the doc side are positions of REPEATED
    spans."""
    toked = spread(docs, "doc_id").select(
        "doc_id", tokens_expr().alias("toks")
    ).filter(F.size("toks") >= k)
    spans = _span_hash_arrays(docs, k)
    sp = spans.select(
        "doc_id", F.posexplode("span_hs").alias("pos0", "span_h")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "span_h")
    rep_pos = (
        _mark_span_counts(sp, salts, "pos", count_join=count_join)
        .filter(F.col("c") >= 2)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("rep_starts"))
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("rep_starts"),
                lambda s: F.sequence(s, s + F.lit(k - 1)),
            )
        )
    )
    cleaned = F.expr(
        "array_join(transform(filter(transform(toks, (t, p0) -> "
        "struct(t AS t, p0 + 1 AS p)), "
        "x -> NOT array_contains(cov, x.p)), x -> x.t), ' ')"
    )
    return (
        toked.join(rep_pos, "doc_id")
        .withColumn("cov", covered)
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            F.size("cov").cast("bigint").alias("n_removed"),
            cleaned.alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# URL canonicalization dedup (r7) — crawl-style duplicate URL variants
# --------------------------------------------------------------------------
# Synthesized URL fixture, mirrored byte-exactly in the oracle: every
# doc gets a stable URL derived from (source, doc_id); docs with
# doc_id % URL_MESSY_MOD == URL_MESSY_REM instead carry a "messy"
# variant of doc (doc_id - URL_MESSY_REM)'s URL — scheme upper-cased,
# http://, www., a utm_ tracking query, a fragment, and a trailing
# slash — so canonicalization must collapse exactly those pairs.
URL_MESSY_MOD = 10
URL_MESSY_REM = 3


def synth_url_expr() -> F.Column:
    """URL synth is a pure function of doc_id (host = site<doc_id%20>)
    so the messy variant can name its TARGET's host without depending
    on any other column — the messy row for doc 13 must collide with
    doc 10's clean URL after canonicalization, which requires building
    doc 10's host from doc 13's row."""
    host = lambda d: F.concat(F.lit("site"), (d % 20).cast("string"))  # noqa: E731
    base = F.concat(
        F.lit("https://"), host(F.col("doc_id")), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    target = F.col("doc_id") - URL_MESSY_REM
    messy = F.concat(
        F.lit("HTTP://WWW."), F.upper(host(target)), F.lit(".EXAMPLE.COM/docs/"),
        target.cast("string"),
        F.lit("/?utm_source=feed#frag"),
    )
    return F.when(
        F.col("doc_id") % URL_MESSY_MOD == URL_MESSY_REM, messy
    ).otherwise(base)


def canonical_url_expr(url: F.Column) -> F.Column:
    """Crawl-dedup URL canonicalization: lowercase, http→https, strip
    www., drop the fragment, drop a trailing utm_* tracking query,
    strip the trailing slash. Pure regexp chain — map-side, identical
    RE2/Java semantics for these patterns."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"^https://www\.", "https://")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"\?utm_[^#]*$", "")
    return F.regexp_replace(u, r"/$", "")


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id,
             CASE WHEN doc_id % {URL_MESSY_MOD} = {URL_MESSY_REM}
                  THEN 'HTTP://WWW.' || upper('site' || ((doc_id - {URL_MESSY_REM}) % 20))
                       || '.EXAMPLE.COM/docs/'
                       || (doc_id - {URL_MESSY_REM}) || '/?utm_source=feed#frag'
                  ELSE 'https://site' || (doc_id % 20) || '.example.com/docs/' || doc_id
             END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(url), '^http://', 'https://'),
                     '^https://www\\.', 'https://'),
                   '#.*$', ''),
                 '\\?utm_[^#]*$', ''),
               '/$', '') AS canonical_url
      FROM urls
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
    FROM canon
    GROUP BY canonical_url
    HAVING count(*) >= 2
    ORDER BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup, the cheapest crawl-dedup pass (before any
    content hashing): canonicalize every document's URL and group the
    collisions, keeping the lowest doc_id. The planted messy variants
    (see ``synth_url_expr``) make the gate prove the canonicalizer
    actually collapses scheme/www/tracking/fragment/slash noise.

    Plan: canonicalization is a map-side regexp chain; ONE
    map-side-combined groupBy on the canonical URL (high-cardinality
    key — no skew beyond genuinely-duplicated URLs, which are exactly
    the rows we want in one group); per-group doc lists are bounded by
    the true duplicate multiplicity."""
    urls = table(spark, sf_dir, "documents").select(
        "doc_id", synth_url_expr().alias("url")
    )
    canon = urls.select("doc_id", canonical_url_expr(F.col("url")).alias("canonical_url"))
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("doc_ids"),
        )
        .filter(F.col("n_urls") >= 2)
        .orderBy("canonical_url")
    )


# --------------------------------------------------------------------------
# prefix-truncation duplicates
# --------------------------------------------------------------------------
# Crawl pipelines routinely re-capture the same page truncated at a
# different byte budget; the truncated copy is an exact PREFIX of the
# full one, so neither exact-hash nor shingle-Jaccard dedup reliably
# catches it (the hash differs; Jaccard dilutes as the length ratio
# grows). This operator finds strict prefix pairs directly.
#
# Blocking contract: a pair is reported only when the shared prefix is
# at least PREFIX_MIN chars — the first PREFIX_MIN chars are then a
# shared block key, so candidate generation is an equi-join, never a
# corpus cross-join. (Sub-PREFIX_MIN docs are exact-dedup territory.)
# Hot blocks (boilerplate openings) are excluded by PREFIX_BLOCK_CAP
# before pairing — the same bounded-quadratic defense as the LSH
# bucket size filter.
PREFIX_MIN = 32
PREFIX_BLOCK_CAP = 64
TRUNC_MOD = 10  # divides gen_sf.STRIDE=10^8, so sf1 replicas reproduce the plant
TRUNC_OFFSET = 2_000_000

# oracle-side mirror of the truncation plant: every doc_id % 10 == 0
# document whose half-length clears PREFIX_MIN gains a clone holding
# its first half
PLANTED_TRUNC_SQL = f"""documents_trunc AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {TRUNC_OFFSET} AS doc_id,
             substr(text, 1, length(text) // 2) AS text
      FROM documents
      WHERE doc_id % {TRUNC_MOD} = 0 AND length(text) // 2 >= {PREFIX_MIN}
    )"""


def plant_truncations(df: DataFrame) -> DataFrame:
    """Union half-length prefix clones (the findable-by-construction
    fixture twin of PLANTED_TRUNC_SQL)."""
    clones = (
        df.filter(
            (F.col("doc_id") % TRUNC_MOD == 0)
            & (F.expr("length(text) DIV 2") >= PREFIX_MIN)
        )
        .select(
            (F.col("doc_id") + TRUNC_OFFSET).alias("doc_id"),
            F.expr("substring(text, 1, length(text) DIV 2)").alias("text"),
        )
    )
    return df.select("doc_id", "text").unionByName(clones)


@register(
    "dedup_prefix_truncation",
    oracle=f"""
    WITH {PLANTED_TRUNC_SQL},
    cand AS (
      SELECT doc_id, text, substr(text, 1, {PREFIX_MIN}) AS k
      FROM documents_trunc WHERE length(text) >= {PREFIX_MIN}
    ),
    blk AS (SELECT k, count(*) AS c FROM cand GROUP BY 1),
    ok AS (SELECT cand.doc_id, cand.text, cand.k
           FROM cand JOIN blk USING (k) WHERE c <= {PREFIX_BLOCK_CAP})
    SELECT a.doc_id AS prefix_doc_id,
           b.doc_id AS super_doc_id,
           CAST(length(a.text) AS BIGINT) AS prefix_chars
    FROM ok a JOIN ok b
      ON a.k = b.k
     AND length(b.text) > length(a.text)
     AND starts_with(b.text, a.text)
    ORDER BY 1, 2
    """,
)
def dedup_prefix_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict prefix-duplicate pairs (truncated re-crawls): doc A's
    full text is the first length(A) chars of doc B, with at least
    PREFIX_MIN shared chars.

    Plan: one block-key derivation pass (cached — the candidate
    relation feeds the block-size count AND both sides of the pair
    join), a map-side-combined block count joined back on the block
    key, then a self equi-join on the 32-char key with the
    starts_with + strict-length predicates evaluated in-join. Both
    pair-join sides shuffle on the same high-cardinality key; block
    sizes are capped at PREFIX_BLOCK_CAP first, so in-block pairing is
    bounded-quadratic exactly like the LSH bucket size filter. The
    planted truncations (PLANTED_TRUNC_SQL twin) make the gate prove
    pairs are FOUND, not that an empty set matches."""
    docs = table(spark, sf_dir, "documents")
    planted = plant_truncations(docs)
    cand = tracked_cache(
        planted.filter(F.length("text") >= PREFIX_MIN).select(
            "doc_id", "text", F.substring("text", 1, PREFIX_MIN).alias("k")
        )
    )
    blk = cand.groupBy("k").agg(F.count("*").alias("c"))
    ok = cand.join(blk.filter(F.col("c") <= PREFIX_BLOCK_CAP), "k").select(
        "k", "doc_id", "text"
    )
    a = ok.select(
        "k", F.col("doc_id").alias("prefix_doc_id"), F.col("text").alias("a_text")
    )
    # the self-join's right side aliases its key distinctly: a.k == b.k
    # on two projections of the SAME cached relation resolves to one
    # attribute and Catalyst emits the trivially-true-predicate warning
    # (correct result, but exactly the log line readers must not learn
    # to ignore — VERDICT r7 #2)
    b = ok.select(
        F.col("k").alias("bk"),
        F.col("doc_id").alias("super_doc_id"),
        F.col("text").alias("b_text"),
    )
    return (
        a.join(
            b,
            on=[
                F.col("k") == F.col("bk"),
                F.length("b_text") > F.length("a_text"),
                F.expr("startswith(b_text, a_text)"),
            ],
        )
        .select(
            "prefix_doc_id",
            "super_doc_id",
            F.length("a_text").cast("bigint").alias("prefix_chars"),
        )
        .orderBy("prefix_doc_id", "super_doc_id")
    )


# --------------------------------------------------------------------------
# Soft deduplication (r8): reweight duplicates instead of removing them
# --------------------------------------------------------------------------


@register(
    "dedup_soft_reweight",
    oracle=f"""
    WITH {PLANTED_DOCS_SQL},
    c AS (
      SELECT source, n_chars,
             count(*) OVER (PARTITION BY text) AS n
      FROM documents_planted
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(sum(n_chars) AS BIGINT) AS raw_chars,
           CAST(sum(n_chars * (1000000 // n)) AS BIGINT) AS eff_chars_ppm
    FROM c GROUP BY source ORDER BY source
    """,
)
def dedup_soft_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication: instead of dropping duplicate documents,
    each exact-duplicate cluster member gets sampling weight 1/n (the
    SoftDeDup recipe — duplicates carry signal about distribution
    mass; hard removal throws it away, reweighting keeps the expected
    token contribution of every distinct text constant regardless of
    how often it was crawled). Reported per source: document/duplicate
    counts and the raw vs effective (weight-scaled) character mass the
    sampler would draw.

    Hash stability: weights are integer ppm (1000000 div n — positive
    operands, so Spark DIV and DuckDB // agree) and every aggregate is
    an exact BIGINT sum.

    Plan: ONE shuffle — a count window partitioned by the text
    digest, with the text column PROJECTED AWAY before the exchange
    (the window carries whole rows, so keeping the body would shuffle
    the entire corpus by volume; the digest is all clustering needs —
    code-review r8) — then a map-side-combined groupBy(source).
    Planted clones (PLANT_MOD) guarantee n>1 clusters exist; the
    oracle mirrors the plant and partitions by raw text (identical
    clustering — md5 is collision-free on the fixture and any real
    corpus at 2^-64)."""
    from pyspark.sql import Window

    docs = plant_duplicates(
        table(spark, sf_dir, "documents").select("doc_id", "text", "source", "n_chars"),
        "doc_id",
    ).select(F.md5("text").alias("digest"), "source", "n_chars")
    n = F.count("*").over(Window.partitionBy("digest"))
    c = docs.withColumn("n", n).withColumn(
        "weight_ppm", F.expr("CAST(1000000 DIV n AS BIGINT)")
    )
    return (
        c.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("n") > 1).cast("bigint")).cast("bigint").alias("n_dup_docs"),
            F.sum("n_chars").cast("bigint").alias("raw_chars"),
            F.sum(F.col("n_chars") * F.col("weight_ppm")).cast("bigint").alias("eff_chars_ppm"),
        )
        .orderBy("source")
    )


# Histogram-only clone layers (ADVICE r8: a 2-row histogram — sizes 1
# and 2 — is minimal-variety; a symmetric decoder/oracle bug could
# cancel out). Both moduli divide gen_sf.STRIDE=10^8 (exact plant
# pattern per sf1 replica) and neither is ≡ 0 (mod 20), so clones
# spread across sources like PLANT_MOD itself. At the 500-doc gate
# fixture: 492 singletons, 6 pairs, 1 triple (doc 256), 1 quad (doc 0)
# — four distinct sizes, pinned exactly in tests/test_oracle.py.
TRIPLE_MOD = 256   # %64 clones get a SECOND copy  → cluster size 3
QUAD_MOD = 1250    # doc 0 also gets a THIRD copy  → cluster size 4


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH documents_hist AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % {PLANT_MOD} = 0
      UNION ALL
      SELECT doc_id + {2 * PLANT_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % {TRIPLE_MOD} = 0
      UNION ALL
      SELECT doc_id + {3 * PLANT_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % {QUAD_MOD} = 0
    ),
    c AS (
      SELECT count(*) AS cluster_size
      FROM documents_hist GROUP BY text
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM c GROUP BY cluster_size ORDER BY cluster_size
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE distribution — the data-card panel a
    dedup pass reports (how much of the corpus sits in 1-, 2-,
    k-member clusters decides between hard removal, soft reweighting
    (``dedup_soft_reweight``), and leaving it alone). Exact digest
    clustering over the planted corpus; all-integer output. The plant
    layers TRIPLE_MOD/QUAD_MOD clones on top of plant_duplicates so
    the histogram has 4 distinct sizes, not a minimal-variety 2
    (ADVICE r8).

    Plan: ONE documents scan (clone multiplicity is a computed column
    — a clone contributes copies of the SAME text, so cluster size ==
    sum of per-row copy counts; the unioned-scans form read the
    parquet 4× for the same answer — code-review r9), then two
    map-side-combined groupBys (digest → cluster size, then size →
    histogram). Nothing is windowed, collected, or broadcast."""
    n_copies = (
        F.lit(1)
        + (F.col("doc_id") % PLANT_MOD == 0).cast("int")
        + (F.col("doc_id") % TRIPLE_MOD == 0).cast("int")
        + (F.col("doc_id") % QUAD_MOD == 0).cast("int")
    )
    sizes = (
        table(spark, sf_dir, "documents")
        .select(F.md5("text").alias("digest"), n_copies.alias("n_copies"))
        .groupBy("digest")
        .agg(F.sum("n_copies").alias("cluster_size"))
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


# --------------------------------------------------------------------------
# winnowing fingerprints (r10) — the MOSS selection algorithm
# (Schleimer, Wilkerson & Aiken, SIGMOD'03): k-gram rolling hashes,
# then the RIGHTMOST MINIMUM of every w-hash window is selected as a
# fingerprint. Guarantees every shared substring of length ≥ k+w−1 is
# caught by at least one shared fingerprint, at ~2/(w+1) the density
# of full shingling — the classic signature-size/recall dial the
# inverted-shingle-index op doesn't have.
# --------------------------------------------------------------------------

WINNOW_K = 16         # k-gram length (characters) — a shared
#                       fingerprint means a ≥ k+w−1 = 19-char exact
#                       substring match (MOSS-typical noise threshold;
#                       k=8 saturated partner counts on organic text)
WINNOW_W = 4          # window (in hash positions)
WINNOW_PREFIX = 256   # chars fingerprinted per doc (documented cap —
#                       pos must fit the 2^20 tie-break field, and
#                       prefix fingerprinting is standard practice;
#                       cf. dedup_prefix_truncation)
WINNOW_MOD = 1_000_000_007
# 257^j mod WINNOW_MOD for j = 0..15 — literal in BOTH engines so the
# polynomial k-gram hash is bit-identical by construction
_WINNOW_POW = [
    1, 257, 66049, 16974593, 362470373, 154885210, 805498697, 13163680,
    383065739, 447894237, 108818104, 966252539, 326900787, 13501671,
    469929426, 771861642,
]
WINNOW_HOT = 32       # posting-list cutoff: fingerprints shared by
#                       more docs are stop-grams, dropped from partner
#                       counting (bounds every join fan-out at scale)

# selection key: h·2^20 + (2^20−1−pos0). min(key) over a window IS the
# rightmost minimum (min h; ties → max pos), decoded by key div 2^20.
_WINNOW_POSB = 1 << 20


def _winnow_kernel(batches):
    """mapInPandas kernel: (doc_id, t) → (doc_id, n_kgrams, fps) —
    the whole selection vectorized per doc: k-gram hashes as ONE
    numpy GEMV over a sliding-window view, selection keys h·2^20 +
    inverted position, window minima via a second sliding view, fps =
    unique(key div 2^20). Exact int64 throughout (max term
    0x10FFFF·1e9·16 < 2^63). ``t`` is case-folded/truncated JVM-SIDE
    via an explicit ASCII ``translate`` (not ``lower()``: JVM and
    DuckDB lower() verifiably disagree on locale-sensitive codepoints
    — U+0130 'İ' lowers to TWO codepoints in Java/Python and ONE in
    DuckDB — so translate with a literal A-Z→a-z table is the only
    form that is bit-identical across engines by construction; the
    same rule as the hash's literal power constants). The kernel only
    does integer math on codepoints."""
    import numpy as np
    import pandas as pd

    pows = np.array(_WINNOW_POW, dtype=np.int64)
    swv = np.lib.stride_tricks.sliding_window_view

    for pdf in batches:
        out = {"doc_id": [], "n_kgrams": [], "fps": []}
        for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
            t = t or ""
            cs = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            m = max(len(cs) - (WINNOW_K - 1), 0)
            fps: list = []
            if m >= WINNOW_W:
                h = (swv(cs, WINNOW_K)[:m] * pows).sum(axis=1) % WINNOW_MOD
                keys = h * _WINNOW_POSB + (_WINNOW_POSB - 1 - np.arange(m))
                wmin = swv(keys, WINNOW_W).min(axis=1)
                # divide the position field out BEFORE unique: the same
                # hash selected at two positions is ONE fingerprint
                fps = np.unique(wmin // _WINNOW_POSB).tolist()
            out["doc_id"].append(int(doc_id))
            out["n_kgrams"].append(m)
            out["fps"].append(fps)
        yield pd.DataFrame(out)


def _winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, n_kgrams, fps array<bigint>) — ONE
    Arrow kernel over a JVM case-fold/truncate projection: map-side only,
    zero shuffle, per-row cost only at any corpus scale.

    Why a kernel and not Catalyst HOFs: the selection is a nested-HOF
    shape (per-position polynomial hash, then per-window array min)
    that Spark evaluates INTERPRETED — measured 20 s for 5 000 docs at
    sf0.1 even with the char-array form (and 112 s with naive
    substring(t, p+j, 1), an O(p) UTF-8 scan per call). The numpy
    sliding-window form computes identical integers in ~2 s for the
    same corpus. unique() also sorts, so fps ordering is deterministic."""
    return docs.select(
        "doc_id",
        F.substring(
            F.translate(F.col("text"), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"), 1, WINNOW_PREFIX
        ).alias("t"),
    ).mapInPandas(
        _winnow_kernel,
        schema="doc_id bigint, n_kgrams int, fps array<bigint>",
    )


_WINNOW_ORACLE_HASH = " + ".join(
    f"CAST(ascii(substr(t, i + {j}, 1)) AS BIGINT) * {_WINNOW_POW[j]}"
    for j in range(WINNOW_K)
)

@register(
    "dedup_winnowing_fingerprint",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                              'abcdefghijklmnopqrstuvwxyz'), 1, {WINNOW_PREFIX}) AS t
      FROM documents
    ),
    keys AS (
      SELECT doc_id, i,
             (({_WINNOW_ORACLE_HASH}) % {WINNOW_MOD}) * {_WINNOW_POSB}
               + ({_WINNOW_POSB - 1} - (i - 1)) AS key
      FROM d, LATERAL (SELECT unnest(range(1, len(t) - {WINNOW_K - 1} + 1)) AS i)
      WHERE len(t) >= {WINNOW_K}
    ),
    wins AS (
      SELECT doc_id, min(key) OVER w AS wkey, count(*) OVER w AS wn
      FROM keys
      WINDOW w AS (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
    ),
    fps AS (
      SELECT DISTINCT doc_id, wkey // {_WINNOW_POSB} AS fp
      FROM wins WHERE wn = {WINNOW_W}
    ),
    kept AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING count(*) >= 2 AND count(*) <= {WINNOW_HOT}
    ),
    partners AS (
      SELECT a.doc_id, count(DISTINCT b.doc_id) AS n_dup_partners
      FROM fps a JOIN kept USING (fp) JOIN fps b USING (fp)
      WHERE b.doc_id <> a.doc_id
      GROUP BY a.doc_id
    )
    SELECT d.doc_id,
           CAST(greatest(len(d.t) - {WINNOW_K - 1}, 0) AS INT) AS n_kgrams,
           CAST((SELECT count(*) FROM fps f WHERE f.doc_id = d.doc_id) AS INT)
             AS n_fingerprints,
           CAST(COALESCE(p.n_dup_partners, 0) AS INT) AS n_dup_partners
    FROM d LEFT JOIN partners p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def dedup_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints + candidate-partner counts.

    Selection: polynomial k-gram hash (k=16, base 257 mod 1e9+7 — 16
    literal power constants shared with the oracle, so the hash is
    bit-identical by construction, the crc32-partitioner trick), then
    rightmost-minimum-per-window encoded as ONE integer min (h·2^20 +
    inverted position) — no struct ordering, no engine-specific
    tie-break.

    100-TB posture: fingerprint selection is a pure per-row HOF
    projection (no shuffle); partner counting explodes each doc's
    ~2·prefix/(w+1) fingerprints, drops stop-gram fingerprints shared
    by more than WINNOW_HOT=32 docs (every posting list ≤32 ⇒ join
    fan-out bounded, the dedup_ngram_jaccard hotset rule), and joins
    posting lists — never all-pairs."""
    docs = spread(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    sigs = tracked_cache(_winnow_fingerprints(docs))
    fp_doc = sigs.select("doc_id", F.explode("fps").alias("fp"))
    kept = (
        fp_doc.groupBy("fp")
        .agg(F.count("*").alias("nf"))
        .filter((F.col("nf") >= 2) & (F.col("nf") <= WINNOW_HOT))
        .select("fp")
    )
    partners = (
        fp_doc.join(kept, "fp")
        .alias("a")
        .join(fp_doc.alias("b"), "fp")
        .filter(F.col("b.doc_id") != F.col("a.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count_distinct(F.col("b.doc_id")).alias("n_dup_partners"))
    )
    out = (
        sigs.join(partners, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_kgrams").cast("int").alias("n_kgrams"),
            F.size("fps").cast("int").alias("n_fingerprints"),
            F.coalesce(F.col("n_dup_partners"), F.lit(0))
            .cast("int")
            .alias("n_dup_partners"),
        )
        .orderBy("doc_id")
    )
    return out
