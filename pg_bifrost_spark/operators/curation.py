"""Training-data curation operators: deterministic sampling, quality
filtering, duplicate-cluster resolution, and the composed curation
pipeline — the end-to-end shape of a pretraining data build.

Scale posture: sampling is a hash predicate (no RNG state, no
coordination — any executor can evaluate it); clustering is iterative
label propagation over the dup-pair edge list (log-diameter rounds of
joins), not a driver-side union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans import register, table, tracked_cache
from .dedup import (
    DF_CUTOFF,
    PLANT_MOD,
    PLANT_OFFSET,
    PLANTED_DOCS_SQL,
    ngram_jaccard_pairs,
    plant_duplicates,
    spread,
)

# ---------------------------------------------------------------------------
# Deterministic hash sampling (reproducible train/eval splits)
# ---------------------------------------------------------------------------

# md5 exists in both engines with identical output → oracle-able sampling.
_SAMPLE_BUCKETS = 100


def md5_bucket(key: F.Column, start: int = 1, buckets: int = _SAMPLE_BUCKETS) -> F.Column:
    """Stable [0,buckets) bucket from 8 hex digits of md5(key) taken at
    1-based offset ``start`` — THE oracle-mirrored sampling primitive
    (callers that need two independent draws use disjoint digit
    ranges, e.g. mixture.temperature_mixture_sample)."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), start, 8), 16, 10).cast("long"),
        F.lit(buckets),
    )


@register(
    "sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_SAMPLE_BUCKETS}) < 30
    ORDER BY doc_id
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30% sample by content-stable hash — the reproducible-split
    primitive (same rows on any cluster, any partitioning, any day;
    unlike rand()-based sampleBy). Hash sampling also keeps
    train/eval splits disjoint by construction when keyed disjointly."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(md5_bucket(F.col("doc_id")) < 30)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "stratified_sample_by_source",
    oracle=f"""
    SELECT source, count(*) AS n FROM (
      SELECT source,
             (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % {_SAMPLE_BUCKETS}) AS b
      FROM documents
    )
    WHERE (source = 'web' AND b < 20) OR (source <> 'web' AND b < 60)
    GROUP BY source ORDER BY source
    """,
)
def stratified_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates (downsample the over-represented source) —
    the domain-mixing knob of a pretraining data recipe."""
    docs = table(spark, sf_dir, "documents")
    b = md5_bucket(F.col("doc_id"))
    rate = F.when(F.col("source") == "web", F.lit(20)).otherwise(F.lit(60))
    return (
        docs.filter(b < rate).groupBy("source").agg(F.count("*").alias("n")).orderBy("source")
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution: connected components by label propagation
# ---------------------------------------------------------------------------


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(src, dst) undirected edges → (node, component) with component =
    min node id in the component. Iterative min-label propagation:
    O(diameter) rounds, each one join + groupBy — the standard
    large-graph shape (driver only checks a convergence count).
    Deterministic.

    Each iterate is ``localCheckpoint``-ed, NOT just cached: the next
    iterate's logical plan references ``labels`` twice (the join and
    the neighbor aggregation), so without lineage truncation the plan
    tree DOUBLES per round — analysis cost and driver heap go
    exponential and a 20-round run OOMs even on a 41-node test graph
    (execution would have reused the cache; planning is what explodes).
    The checkpoint replaces the subtree with a leaf. Superseded
    iterates' checkpoint RDDs are unpersisted as the loop advances
    (they have no DataFrame-level unpersist, so the loop releases them
    by RDD id); the surviving iterate is released at the next
    registered-query build via ``track_release``. On a real cluster
    the same loop would use reliable ``checkpoint()`` to survive
    executor loss — localCheckpoint is the single-box analog."""
    from ..plans import track_release

    sc = edges.sparkSession.sparkContext

    def persistent_ids() -> set[int]:
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def release_rdds(ids: set[int]) -> None:
        for rid in ids:
            sc._jsc.sc().unpersistRDD(rid, False)

    sym = edges.selectExpr("src", "dst").union(edges.selectExpr("dst as src", "src as dst"))
    labels = (
        sym.selectExpr("src as node").union(sym.selectExpr("dst as node")).distinct()
        .withColumn("component", F.col("node"))
    )
    sym = tracked_cache(spread(sym, "src"))
    # Materialize the sym cache NOW: its cached-buffer RDD registers
    # lazily at first materialization, which would otherwise happen
    # during iteration 1's eager checkpoint job — landing its id in
    # that iteration's `new_ids` diff and force-unpersisting the edge
    # cache after iteration 2 (every later round would recompute the
    # edge list from source, e.g. re-running the posting-list self-join
    # per round for the Jaccard-edge callers). One count() on the edge
    # list; iteration 1 reuses the blocks it fills.
    sym.count()
    prev_ids: set[int] = set()
    for _ in range(max_iter):
        # each node adopts min(own, neighbors' labels)
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        # carry the OLD label through the checkpoint so convergence is
        # a scan of the checkpointed blocks, not another per-round
        # shuffle join of new-vs-old (r12, guide §2.4: two relations
        # keyed the same way — here, the same relation — don't need a
        # join to compare). Labels only ever decrease (least), so
        # "changed" ⇔ some new component < its old one.
        new_labels = (
            labels.join(neighbor_min, "node", "left_outer")
            .select(
                "node",
                F.least("component", F.coalesce("nmin", "component")).alias("component"),
                F.col("component").alias("_old"),
            )
        )
        before = persistent_ids()
        new_labels = new_labels.localCheckpoint(eager=True)
        new_ids = persistent_ids() - before
        changed = (
            new_labels.filter(F.col("component") < F.col("_old")).limit(1).count()
        )
        new_labels = new_labels.select("node", "component")
        # the previous iterate's checkpoint is now dead weight —
        # without this the loop leaks one per round (VERDICT r3)
        release_rdds(prev_ids)
        prev_ids = new_ids
        labels = new_labels
        if changed == 0:
            break
    if prev_ids:
        # the surviving iterate backs the returned plan — defer
        surviving = set(prev_ids)
        track_release(lambda: release_rdds(surviving))
    return labels


@register(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE {PLANTED_DOCS_SQL},
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents_planted a JOIN documents_planted b
        ON a.doc_id < b.doc_id
       AND md5(lower(trim(a.text))) = md5(lower(trim(b.text)))
    ),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    walk(node, comp) AS (
      SELECT DISTINCT src AS node, src AS comp FROM sym
      UNION
      SELECT s.dst AS node, w.comp
      FROM walk w JOIN sym s ON s.src = w.node
      WHERE w.comp < s.dst
    )
    SELECT node AS doc_id, min(comp) AS component FROM walk GROUP BY node
    ORDER BY doc_id
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate clusters as connected components (keeper =
    min doc_id per component), over documents with planted duplicates
    (dedup.PLANT_MOD) so the gate verifies non-empty components: each
    planted clone forms a 2-node component labeled by the original.
    The label-propagation kernel is the same one a fuzzy-dup graph
    (jaccard/cosine edges) would use; exact-hash edges keep the
    oracle tractable (recursive CTE)."""
    docs = plant_duplicates(table(spark, sf_dir, "documents"), "doc_id")
    h = docs.select("doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
    edges = (
        h.alias("a")
        .join(h.alias("b"), (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    return (
        connected_components(edges)
        .select(F.col("node").alias("doc_id"), "component")
        .orderBy("doc_id")
    )


_JACCARD_EDGES_SQL = f"""sh AS (
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
    pairs AS (
      SELECT doc_a, doc_b
      FROM common JOIN sizes sa ON sa.doc_id = doc_a
                  JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= 0.5
    )"""


@register(
    "dedup_jaccard_clusters",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_EDGES_SQL},
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    walk(node, comp) AS (
      SELECT DISTINCT src AS node, src AS comp FROM sym
      UNION
      SELECT s.dst AS node, w.comp
      FROM walk w JOIN sym s ON s.src = w.node
      WHERE w.comp < s.dst
    ),
    comp AS (SELECT node, min(comp) AS component FROM walk GROUP BY node)
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_docs,
           max(node) AS max_doc_id
    FROM comp GROUP BY component ORDER BY component
    """,
)
def dedup_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate CLUSTERS: the n-gram-Jaccard pair list (exact,
    posting-list generated — ``dedup.ngram_jaccard_pairs``) resolved
    into connected components, each labeled by its minimum doc_id (the
    keeper a dedup pass retains). This is the step an actual curation
    run needs between pair detection and row dropping — near-dup
    relations are not transitive, so A~B and B~C must collapse into
    ONE {A,B,C} cluster or the pass would keep B twice.

    Scale shape: pair generation is the bounded posting-list join,
    clustering is O(diameter) label-propagation rounds with
    checkpointed iterates — no driver union-find, no all-pairs
    anywhere. The oracle mirrors both stages (same DF cutoff, same
    threshold) with a recursive CTE walk."""
    edges = (
        ngram_jaccard_pairs(table(spark, sf_dir, "documents"))
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    cc = connected_components(edges)
    return (
        cc.groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("node").alias("max_doc_id"),
        )
        .orderBy("component")
    )


@register(
    "near_dup_resolution",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_EDGES_SQL},
    sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs),
    walk(node, comp) AS (
      SELECT DISTINCT src AS node, src AS comp FROM sym
      UNION
      SELECT s.dst AS node, w.comp
      FROM walk w JOIN sym s ON s.src = w.node
      WHERE w.comp < s.dst
    ),
    comp AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
    dropped AS (SELECT node AS doc_id FROM comp WHERE node <> component)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(CASE WHEN dr.doc_id IS NULL
                    THEN len(string_split_regex(lower(trim(d.text)), '\\s+'))
                    ELSE 0 END) AS BIGINT) AS kept_tokens
    FROM documents d LEFT JOIN dropped dr USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """,
)
def near_dup_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-dropping step of fuzzy dedup, as an auditable report:
    every non-keeper member of a Jaccard cluster (keeper = min doc_id,
    per ``dedup_jaccard_clusters``) is dropped; the report gives
    per-source kept/dropped doc counts and the surviving token mass —
    the before/after a curation run records next to its config.

    Scale shape: the dropped set is |cluster members - clusters| rows.
    On the test fixtures that is a handful, but in a REAL web-corpus
    fuzzy dedup it is 20-50% of all documents — corpus-proportional,
    billions of ids at 100 TB — so the join strategy is left to the
    planner: AQE broadcasts when the runtime size is genuinely small
    and falls back to a shuffled join when it is not (a forced
    broadcast here was the round-4 scale-killer finding — tens of GB
    pushed to every executor). The corpus itself is scanned exactly
    once; the only further corpus-side work is the one groupBy on
    source. No second pass over text beyond the token count already
    being computed."""
    docs = table(spark, sf_dir, "documents")
    edges = ngram_jaccard_pairs(docs).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges)
    dropped = (
        cc.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
        .withColumn("_dropped", F.lit(1))
    )
    ntok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    is_drop = F.col("_dropped").isNotNull()
    return (
        docs.join(dropped, "doc_id", "left_outer")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(is_drop, 0).otherwise(1)).cast("bigint").alias("n_kept"),
            F.sum(F.when(is_drop, 1).otherwise(0)).cast("bigint").alias("n_dropped"),
            F.sum(F.when(is_drop, 0).otherwise(ntok)).cast("bigint").alias("kept_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# The composed curation pipeline
# ---------------------------------------------------------------------------


@register(
    "curation_pipeline",
    oracle=f"""
    WITH quality AS (
      SELECT doc_id, source, text,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_toks
      FROM documents
    ),
    filtered AS (SELECT * FROM quality WHERE n_toks >= 20),
    deduped AS (
      SELECT min(doc_id) AS doc_id
      FROM filtered GROUP BY md5(lower(trim(text)))
    ),
    sampled AS (
      SELECT d.doc_id FROM deduped d
      WHERE (CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
             % {_SAMPLE_BUCKETS}) < 50
    )
    SELECT q.source, count(*) AS n_docs, CAST(sum(q.n_toks) AS BIGINT) AS n_tokens
    FROM sampled s JOIN quality q ON q.doc_id = s.doc_id
    GROUP BY q.source ORDER BY q.source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter (min length) → exact-dedup (keep min doc_id) →
    deterministic 50% sample → per-source token accounting: the whole
    pretraining-data build as one declarative plan. Each stage is one
    narrow dependency or one keyed shuffle; the composition gives
    Catalyst the full graph to optimize across stages."""
    docs = table(spark, sf_dir, "documents")
    quality = docs.select(
        "doc_id", "source", "text",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_toks"),
    )
    filtered = quality.filter(F.col("n_toks") >= 20)
    deduped = (
        filtered.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .drop("h")
    )
    sampled = deduped.filter(md5_bucket(F.col("doc_id")) < 50)
    return (
        sampled.join(quality, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
        .orderBy("source")
    )


PACK_WINDOW = 512  # tokens per training context window


@register(
    "sequence_packing",
    oracle=f"""
    WITH sized AS (
      SELECT source, doc_id,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_toks
      FROM documents
    ),
    placed AS (
      SELECT source, doc_id, n_toks,
             floor((sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_toks) / {PACK_WINDOW})::BIGINT AS bin_id
      FROM sized
    )
    SELECT source, bin_id,
           count(*) AS n_docs,
           sum(n_toks)::BIGINT AS bin_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM placed GROUP BY source, bin_id ORDER BY source, bin_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: assign documents to
    {PACK_WINDOW}-token training context windows by running token
    total, per source, in doc_id order (the streaming-friendly
    contiguous packer — documents never reorder, so packing is
    replayable). The window partitions by source: fully distributed,
    no global ordering. Output is per-bin occupancy, the input a
    packing-efficiency audit needs."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    n_toks = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    sized = docs.select("source", "doc_id", n_toks.alias("n_toks"))
    placed = sized.withColumn(
        "bin_id",
        F.floor((F.sum("n_toks").over(w) - F.col("n_toks")) / PACK_WINDOW).cast("long"),
    )
    return (
        placed.groupBy("source", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin_id")
    )


# --------------------------------------------------------------------------
# corpus snapshot diff (dataset versioning audit)
# --------------------------------------------------------------------------
# Version-2 of the corpus is DERIVED deterministically (the planted-
# fixture move): ~1/13 of docs removed, ~1/11 of the survivors
# re-edited, ~1/17 cloned in as new docs — so the diff report is
# non-vacuous and byte-mirrored in the oracle. The operator itself
# (snapshot_diff) takes any two DataFrames.
DIFF_REMOVE_MOD = 13
DIFF_EDIT_MOD = 11
DIFF_ADD_MOD = 17
DIFF_ADD_OFFSET = 20_000_000


@register(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0
                  THEN text || ' rev2' ELSE text END AS text,
             n_chars
      FROM documents WHERE doc_id % {DIFF_REMOVE_MOD} <> 0
      UNION ALL
      SELECT doc_id + {DIFF_ADD_OFFSET} AS doc_id, text, n_chars
      FROM documents WHERE doc_id % {DIFF_ADD_MOD} = 0
    ),
    j AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             CASE
               WHEN a.doc_id IS NULL THEN 'added'
               WHEN b.doc_id IS NULL THEN 'removed'
               WHEN md5(a.text) <> md5(b.text) THEN 'changed'
               ELSE 'unchanged'
             END AS status,
             coalesce(b.n_chars, a.n_chars) AS n_chars
      FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    )
    SELECT status,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS char_mass,
           min(doc_id) AS first_doc_id,
           max(doc_id) AS last_doc_id
    FROM j GROUP BY status ORDER BY status
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning audit: diff two corpus snapshots by doc_id +
    content digest into added / removed / changed / unchanged classes
    with document and character mass per class — the release-notes
    artifact a training-data pipeline publishes per corpus version
    (and the guard against silently re-training on a shifted corpus).

    ONE full outer join keyed on doc_id (shuffle both sides on the
    id — no broadcast of anything corpus-proportional), digests
    computed map-side, then an O(4)-state aggregate. Identical plan
    shape at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    v2 = (
        docs.filter(F.col("doc_id") % DIFF_REMOVE_MOD != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % DIFF_EDIT_MOD == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text")).alias("text"),
            "n_chars",
        )
        .unionByName(
            docs.filter(F.col("doc_id") % DIFF_ADD_MOD == 0).select(
                (F.col("doc_id") + DIFF_ADD_OFFSET).alias("doc_id"), "text", "n_chars"
            )
        )
    )
    return snapshot_diff(docs.select("doc_id", "text", "n_chars"), v2)


def snapshot_diff(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Generic two-snapshot diff: (doc_id, text, n_chars) → per-status
    counts/mass. Digest-compare, never text-compare, so the join rows
    stay narrow."""
    a = v1.select(
        F.col("doc_id"), F.md5(F.col("text")).alias("h1"), F.col("n_chars").alias("c1")
    )
    b = v2.select(
        F.col("doc_id"), F.md5(F.col("text")).alias("h2"), F.col("n_chars").alias("c2")
    )
    j = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.coalesce("c2", "c1").alias("n_chars"),
    )
    return (
        j.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("char_mass"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .orderBy("status")
    )


# --------------------------------------------------------------------------
# leakage-safe train/val split
# --------------------------------------------------------------------------
# Splitting documents independently leaks: two copies of the same
# content land on opposite sides of the train/val boundary and the
# eval set scores memorization (planted clones make this concrete —
# the naive split provably leaks on the fixture). The safe split keys
# the assignment on the DUPLICATE GROUP (content digest here; the
# fuzzy-dedup cluster id in a full pipeline), so a group moves as one
# unit. Assignment is a deterministic hash-range test on the group
# key — reproducible, no RNG state.
VAL_HEX_PREFIX = "0"  # md5 first hex digit '0' → ~1/16 of groups → val


@register(
    "leakage_safe_split",
    oracle=f"""
    WITH docs_m AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {{plant_offset}} AS doc_id, text
      FROM documents WHERE doc_id % {{plant_mod}} = 0
    ),
    keyed AS (
      SELECT doc_id, md5(lower(trim(text))) AS grp FROM docs_m
    ),
    aware AS (
      SELECT doc_id, grp,
             CASE WHEN substr(grp, 1, 1) = '{VAL_HEX_PREFIX}'
                  THEN 'val' ELSE 'train' END AS split
      FROM keyed
    ),
    naive AS (
      SELECT doc_id, grp,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 1) = '{VAL_HEX_PREFIX}'
                  THEN 'val' ELSE 'train' END AS split
      FROM keyed
    ),
    leak AS (
      SELECT 'group_aware' AS method,
             count(DISTINCT CASE WHEN split = 'train' THEN doc_id END) AS n_train,
             count(DISTINCT CASE WHEN split = 'val' THEN doc_id END) AS n_val,
             CAST(count(DISTINCT grp) FILTER (
               grp IN (SELECT grp FROM aware GROUP BY grp
                       HAVING count(DISTINCT split) > 1)) AS BIGINT) AS leaked_groups
      FROM aware
      UNION ALL
      SELECT 'naive',
             count(DISTINCT CASE WHEN split = 'train' THEN doc_id END),
             count(DISTINCT CASE WHEN split = 'val' THEN doc_id END),
             CAST(count(DISTINCT grp) FILTER (
               grp IN (SELECT grp FROM naive GROUP BY grp
                       HAVING count(DISTINCT split) > 1)) AS BIGINT)
      FROM naive
    )
    SELECT method, CAST(n_train AS BIGINT) AS n_train,
           CAST(n_val AS BIGINT) AS n_val, leaked_groups
    FROM leak ORDER BY method
    """.format(plant_offset=PLANT_OFFSET, plant_mod=PLANT_MOD),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split audit: the dup-group-aware assignment (split
    decided by the GROUP digest) vs the naive per-document assignment,
    each reporting its split sizes and how many duplicate groups
    straddle the boundary. On the planted-clone fixture the naive
    method must leak (>0 groups with copies in both splits) and the
    aware method must report exactly 0 — the property that makes an
    eval set trustworthy.

    Plan: digests map-side; each method is one groupBy(grp) counting
    distinct splits (2-value state), then an O(2)-row aggregate. No
    joins against the corpus, nothing collected."""
    docs = plant_duplicates(
        table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    keyed = docs.select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("grp")
    )

    def classify(split_col: F.Column, method: str) -> DataFrame:
        d = keyed.withColumn("split", split_col)
        leaked = (
            d.groupBy("grp")
            .agg(F.countDistinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .agg(F.count("*").cast("bigint").alias("leaked_groups"))
        )
        sizes = d.agg(
            F.countDistinct(F.when(F.col("split") == "train", F.col("doc_id")))
            .cast("bigint")
            .alias("n_train"),
            F.countDistinct(F.when(F.col("split") == "val", F.col("doc_id")))
            .cast("bigint")
            .alias("n_val"),
        )
        return sizes.crossJoin(F.broadcast(leaked)).select(
            F.lit(method).alias("method"), "n_train", "n_val", "leaked_groups"
        )

    aware = classify(
        F.when(F.substring("grp", 1, 1) == VAL_HEX_PREFIX, F.lit("val")).otherwise(
            F.lit("train")
        ),
        "group_aware",
    )
    naive = classify(
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == VAL_HEX_PREFIX,
            F.lit("val"),
        ).otherwise(F.lit("train")),
        "naive",
    )
    return aware.unionByName(naive).orderBy("method")


# --------------------------------------------------------------------------
# training-set build capstone: quality → exact dedup → decontaminate
# → split → account, as ONE Catalyst plan
# --------------------------------------------------------------------------
# The selection twin of refinery_pipeline (which CLEANS text, this
# SELECTS documents): Gopher quality gate (map-only) → exact dedup
# keeping the min doc_id per digest (one shuffle on the digest) →
# drop the benchmark probe docs and anything sharing a 5-gram with
# them (broadcast of the bounded probe gram set) → deterministic
# train/val split → per-split doc/token accounting. Every stage
# reuses the EXACT predicates of its standalone operator (same
# constants), and the whole chain is hash-checked against one
# composed oracle — integration, not just unit, correctness.



from .corpus import _GRAM_SQL, PROBE_CAP, PROBE_MOD, contam_gram_arr
from .text import (
    EN_STOPWORDS,
    GOPHER_MAX_WLEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WLEN,
    GOPHER_MIN_WORDS,
    _tokens,
    gopher_keep_parts,
)

_TRAINING_SET_SQL = f"""
    WITH {PLANTED_DOCS_SQL},
    feat AS (
      SELECT doc_id, text,
             string_split_regex(lower(trim(text)), '\\s+') AS toks,
             length(replace(text, ' ', ''))::DOUBLE AS nsc
      FROM documents_planted
    ),
    quality AS (
      SELECT * FROM feat
      WHERE (len(toks) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
        AND (nsc / greatest(len(toks), 1) BETWEEN {GOPHER_MIN_WLEN} AND {GOPHER_MAX_WLEN})
        AND (len(list_distinct(list_filter(toks,
               w -> list_contains({EN_STOPWORDS!r}, w)))) >= {GOPHER_MIN_STOPWORDS})
        AND (len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::DOUBLE
               / greatest(len(toks), 1) >= {GOPHER_MIN_ALPHA_FRAC})
    ),
    dedup AS (
      SELECT * FROM quality
      QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
    ),
    probe_grams AS (
      SELECT DISTINCT unnest(list_distinct({_GRAM_SQL})) AS g
      FROM feat WHERE doc_id % {PROBE_MOD} = 0 AND doc_id < {PROBE_CAP}
    ),
    contaminated AS (
      SELECT DISTINCT d.doc_id
      FROM (SELECT doc_id, unnest(list_distinct({_GRAM_SQL})) AS g FROM dedup) d
      JOIN probe_grams p ON d.g = p.g
    ),
    clean AS (
      SELECT * FROM dedup
      WHERE NOT (doc_id % {PROBE_MOD} = 0 AND doc_id < {PROBE_CAP})
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    )
    SELECT CASE WHEN doc_id % 10 = 0 THEN 'val' ELSE 'train' END AS split,
           count(*)::BIGINT AS n_docs,
           sum(len(toks))::BIGINT AS n_tokens
    FROM clean GROUP BY 1 ORDER BY 1
    """


@register(
    "training_set_build",
    oracle=_TRAINING_SET_SQL,
)
def training_set_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split (train/val) document and token counts of the fully
    curated corpus — planted clones prove the dedup stage, the probe
    set proves decontamination."""
    from pyspark.sql import Window

    docs = plant_duplicates(table(spark, sf_dir, "documents"), "doc_id")
    feat = docs.withColumn("toks", _tokens())
    # quality gate: THE SAME predicate parts quality_gopher_rules uses
    _, _, ok_words, ok_wlen, ok_stop, ok_alpha = gopher_keep_parts()
    quality = feat.filter(ok_words & ok_wlen & ok_stop & ok_alpha)
    # exact dedup: keep the min doc_id per digest group — a window min
    # riding ONE digest exchange (a groupBy+join-back shape shuffles
    # the full-payload rows twice; mirrors the oracle's QUALIFY)
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    deduped = (
        quality.withColumn("dg", digest)
        .withColumn("_min_id", F.min("doc_id").over(Window.partitionBy("dg")))
        .filter(F.col("doc_id") == F.col("_min_id"))
        .drop("dg", "_min_id")
    )
    # decontamination: probe docs out; anything sharing a probe 5-gram
    # out — THE SAME gram construction contamination_ngram uses
    is_probe = (F.col("doc_id") % PROBE_MOD == 0) & (F.col("doc_id") < PROBE_CAP)
    probe_grams = (
        feat.filter(is_probe)
        .select(F.explode(contam_gram_arr()).alias("g"))
        .distinct()
    )
    grams = deduped.select("doc_id", F.explode(contam_gram_arr()).alias("g"))
    contaminated = (
        grams.join(F.broadcast(probe_grams), "g").select("doc_id").distinct()
    )
    clean = (
        deduped.filter(~is_probe)
        .join(contaminated, "doc_id", "left_anti")
    )
    split = F.when(F.col("doc_id") % 10 == 0, F.lit("val")).otherwise(F.lit("train"))
    return (
        clean.select(split.alias("split"), F.size("toks").alias("nt"))
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# per-source duplicate-rate report (r7) — curation diagnostics
# --------------------------------------------------------------------------


@register(
    "near_dup_rate_by_source",
    oracle=f"""
    WITH {PLANTED_DOCS_SQL},
    norm AS (
      SELECT doc_id, source,
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm_text
      FROM documents_planted
    ),
    marked AS (
      SELECT source, count(*) OVER (PARTITION BY norm_text) AS c
      FROM norm
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)
             AS dup_rate
    FROM marked
    GROUP BY source
    ORDER BY source
    """,
)
def near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate contamination per source — the diagnostic a curation
    pass uses to decide WHICH feeds to down-weight or re-crawl (a
    source-level rollup of the normalized exact-dedup signal, planted
    fixture so the gate sees real duplicates in every source bucket).

    Plan: normalization is map-side; the duplicate flag is a window
    count over the normalized text riding one exchange on that
    high-cardinality key (same shape as the span ops — a degenerate
    boilerplate text is one counted group, never a pair explosion);
    the rollup is one map-side-combined groupBy over the tiny source
    dimension. dup_rate is an exact-int division."""
    from pyspark.sql import Window

    docs = plant_duplicates(table(spark, sf_dir, "documents"), "doc_id")
    norm = docs.select(
        "doc_id",
        "source",
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias(
            "norm_text"
        ),
    )
    marked = spread(norm, "norm_text").withColumn(
        "c", F.count("*").over(Window.partitionBy("norm_text"))
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            (F.col("n_dup_docs") / F.col("n_docs").cast("double")).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PageRank quality prior — link authority as a curation signal
# ---------------------------------------------------------------------------
# Web-corpus recipes weight documents by link authority (the OPT/
# RefinedWeb lineage keeps high-PageRank hosts preferentially). The
# fixture has no link table, so the gate derives a deterministic
# IRREGULAR graph from doc ids — d -> (2d+1) mod N always,
# -> (3d+2) mod N unless d%3=0, -> (5d+3) mod N when d%5=0 — so
# out-degree varies 1..3 and in-degree is skewed (a uniform-degree
# graph converges to a near-constant rank vector and proves nothing);
# mirrored byte-exactly in the oracle.
#
# ALL arithmetic is BIGINT micro-units with floor division — integer
# sums are exact and order-independent, so there is NO float-
# aggregation hash risk (the oracle rule that forbids rounding double
# aggregates); the price is <=1 micro-unit of quantization per edge
# per iteration, irrelevant for a ranking prior.
PAGERANK_ITERS = 5
_PR_ONE = 1_000_000  # rank unit
_PR_JUMP = 150_000   # (1 - damping) * _PR_ONE


def pagerank_micro(nodes: DataFrame, edges: DataFrame, iters: int = PAGERANK_ITERS,
                   outdeg: DataFrame | None = None) -> DataFrame:
    """(node) + (src, dst) multigraph -> (node, rank_micro) after
    ``iters`` damped power iterations, all in exact integer math:
    contribution = rank DIV outdeg, next = 150000 + (85 * sum) DIV 100.

    Plan: per iteration one join (edges x ranks on src) + one groupBy
    (dst) + one left join back to the node set — the standard
    large-graph shape (same as connected_components, which this rides
    next to): O(iters) rounds, never a driver-side adjacency. Edges
    and the out-degree relation are cached once; the rank relation is
    O(nodes) per round. At 100 TB-scale graphs the edge relation would
    be bucketed by src so every round's join is co-located.
    """
    from ..plans import tracked_cache

    if outdeg is None:
        outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = tracked_cache(
        edges.join(outdeg, "src").select("src", "dst", "outdeg")
    )
    ranks = nodes.select(F.col("node"), F.lit(_PR_ONE).cast("long").alias("r"))
    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("r DIV outdeg").alias("c"))
        )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, nodes["node"] == sums["dst"], "left")
            .select(
                F.col("node"),
                (F.lit(_PR_JUMP) + F.expr("(85 * coalesce(s, 0)) DIV 100")).alias("r"),
            )
        )
    return ranks


def _pr_oracle() -> str:
    it = """
    r{i} AS (
      SELECT node, CAST(150000 + (85 * coalesce(s, 0)) // 100 AS BIGINT) AS r
      FROM nodes LEFT JOIN (
        SELECT dst, sum(r // outdeg) AS s
        FROM edges JOIN r{j} ON src = node GROUP BY dst
      ) ON node = dst
    )"""
    parts = [
        """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    nodes AS (SELECT doc_id AS node FROM documents),
    raw_edges AS (
      SELECT doc_id AS src, (doc_id * 2 + 1) % nn.n AS dst FROM documents, nn
      UNION ALL
      SELECT doc_id AS src, (doc_id * 3 + 2) % nn.n AS dst
      FROM documents, nn WHERE doc_id % 3 <> 0
      UNION ALL
      SELECT doc_id AS src, (doc_id * 5 + 3) % nn.n AS dst
      FROM documents, nn WHERE doc_id % 5 = 0
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM raw_edges GROUP BY src),
    edges AS (SELECT src, dst, outdeg FROM raw_edges JOIN deg USING (src)),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        parts.append(it.format(i=i, j=i - 1))
    return ",".join(parts) + f"""
    SELECT node AS doc_id, r AS rank_micro FROM r{PAGERANK_ITERS} ORDER BY doc_id
    """


@register("pagerank_quality_prior", oracle=_pr_oracle())
def pagerank_quality_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration integer PageRank over the derived irregular doc
    graph; the oracle unrolls the same five iterations as CTEs.
    Coinciding formula targets are kept as multi-edges in both
    engines; out-degree is counted from the raw edge list."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.count("*").alias("n"))
    base = docs.crossJoin(F.broadcast(n))
    d = F.col("doc_id")
    always = base.select(d.alias("src"), ((d * 2 + 1) % F.col("n")).alias("dst"))
    two = base.filter(d % 3 != 0).select(
        d.alias("src"), ((d * 3 + 2) % F.col("n")).alias("dst")
    )
    three = base.filter(d % 5 == 0).select(
        d.alias("src"), ((d * 5 + 3) % F.col("n")).alias("dst")
    )
    edges = always.unionByName(two).unionByName(three)
    nodes = docs.select(F.col("doc_id").alias("node"))
    ranks = pagerank_micro(nodes, edges, PAGERANK_ITERS)
    return ranks.select(F.col("node").alias("doc_id"), F.col("r").alias("rank_micro")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# deterministic per-group reservoir (exactly k docs per source)
# ---------------------------------------------------------------------------
# The OTHER balanced-sampling primitive next to rate-based
# stratified_sample_by_source: exactly-k-per-group selection via
# smallest-md5 order — a deterministic reservoir (uniform over each
# group, reproducible on any cluster layout, no RNG state). Ranking
# partitions by source, so the window is fully distributed — this is
# the scalable "give me 10k examples per domain" query.
RESERVOIR_K = 5


@register(
    "reservoir_per_group_sample",
    oracle=f"""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= {RESERVOIR_K}
    ORDER BY source, doc_id
    """,
)
def reservoir_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {RESERVOIR_K} docs per source, chosen by ascending md5
    prefix (ties by doc_id) — the deterministic reservoir. One
    partitioned window (never partition-less), one exchange on
    source; at 100 TB group skew is absorbed because rank state per
    task is O(1) and the exchange carries only (source, doc_id,
    8-char hash)."""
    docs = table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# r11: similarity-ordered packing (In-Context Pretraining ordering)
# ---------------------------------------------------------------------------
ICLM_BITS = 6  # 2^6 = 64 similarity buckets
ICLM_BUDGET = 400  # tokens per packed sequence


def _iclm_bucket_sql() -> str:
    return " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(ICLM_BITS)
    )


@register(
    "pack_similarity_ordered",
    oracle=f"""
    WITH j AS (
      SELECT d.doc_id,
             CAST(len(string_split_regex(lower(trim(d.text)), '\\s+'))
               AS BIGINT) AS n_tokens,
             {_iclm_bucket_sql()} AS bucket
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), w AS (
      SELECT doc_id, n_tokens, bucket,
             sum(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS cum_before
      FROM j
    ), pk AS (
      SELECT doc_id, n_tokens, bucket,
             cum_before // {ICLM_BUDGET} AS seq_local
      FROM w
    ), per_bucket AS (
      SELECT bucket, max(seq_local) + 1 AS n_seqs FROM pk GROUP BY bucket
    ), offs AS (
      SELECT bucket,
             coalesce(sum(n_seqs) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS seq_offset
      FROM per_bucket
    )
    SELECT pk.doc_id AS doc_id, pk.bucket AS bucket,
           CAST(offs.seq_offset + pk.seq_local AS BIGINT) AS seq_id,
           pk.n_tokens AS n_tokens
    FROM pk JOIN offs ON pk.bucket = offs.bucket
    ORDER BY doc_id
    """,
)
def pack_similarity_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-ordered sequence packing — the data-ordering step of
    In-Context Pretraining (Shi et al. 2023, public): related
    documents land in the SAME packed training sequence, so attention
    sees coherent context instead of random concatenation. Documents
    hash to a cosine-LSH bucket (sign pattern of the first ICLM_BITS
    embedding axes — standard-basis SRP; production swaps in random
    hyperplanes, the plan is identical), then pack greedily within
    each bucket under a token budget.

    Scale shape: the global "pack id" needs a global prefix over
    buckets, decomposed exactly like token_budget_sample — a per-
    bucket running sum (parallel, one window task per bucket), a
    per-bucket pack count (tiny aggregate), and a prefix sum over the
    2^ICLM_BITS bucket totals joined back as a broadcast. Everything
    is exact integer arithmetic; no floats ever cross an aggregation
    boundary (registry bit-stability convention)."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    bucket = None
    for i in range(ICLM_BITS):
        bit = F.when(F.element_at("embedding", i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    j = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
        bucket.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # seq_local = cum_before div budget in TRUE integral division —
    # Spark's `/` is double division and floor-of-double diverges from
    # the oracle's integer `//` once cum_before nears 2^45 (quotient
    # ulp > 1/budget); `div` keeps the path bigint end to end as the
    # docstring promises. pk itself is cached: it feeds BOTH per_bucket
    # and the final join, and without the cache the docs⋈embeddings
    # join + bucket window exchange execute twice per run.
    pk = tracked_cache(
        j.withColumn(
            "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
        ).withColumn(
            "seq_local", F.expr(f"cum_before div {ICLM_BUDGET}")
        ).drop("cum_before")
    )
    per_bucket = tracked_cache(
        pk.groupBy("bucket").agg((F.max("seq_local") + 1).alias("n_seqs"))
    )
    # prefix sum over the ≤2^ICLM_BITS bucket totals as a broadcast
    # strictly-less self-join — same result as a partition-less
    # window, but no "WindowExec: No Partition Defined" noise (the
    # token_budget_sample pattern; cached so the bucket aggregation
    # cannot recompute twice)
    x, y = per_bucket.alias("x"), per_bucket.alias("y")
    offs = (
        x.join(F.broadcast(y), F.col("y.bucket") < F.col("x.bucket"), "left")
        .groupBy(F.col("x.bucket").alias("bucket"))
        .agg(
            F.coalesce(F.sum("y.n_seqs"), F.lit(0))
            .cast("bigint")
            .alias("seq_offset")
        )
    )
    return (
        pk.join(F.broadcast(offs), "bucket")
        .select(
            "doc_id",
            "bucket",
            (F.col("seq_offset") + F.col("seq_local")).alias("seq_id"),
            "n_tokens",
        )
        .orderBy("doc_id")
    )
