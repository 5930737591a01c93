"""Bloom-filter-accelerated exact incremental dedup.

``dedup_incremental_batch`` (dedup.py) answers the FUZZY ingest
question through a posting-list index; this module answers the EXACT
one — "which of today's documents have a content digest we have ever
seen before?" — with the index structure a 100 TB corpus actually
affords: a Bloom filter over the historical digest set, built and
probed entirely in Catalyst (no JVM sketch objects, no Python).

Why a Bloom filter and not a digest anti-join: the anti-join shuffles
BOTH sides on the digest key every ingest. The bloom is ~1.2 bytes/key
at 3% fpp — 10⁹ historical docs fit in ~1.2 GB of bit buckets, a
relation Spark can broadcast — so the daily batch is classified
map-side, and only the tiny bloom-positive remainder (true dups +
fpp·batch false positives) needs exact confirmation against history.
False negatives are impossible by construction, so the final result is
EXACT regardless of fpp — the filter only decides how much work the
confirm step does. (Spark's own ``spark.sql.optimizer.runtime.
bloomFilter.enabled`` applies the same idea inside one query; here the
structure is an inter-job artifact that can be persisted between
ingests.)

Representation: (bucket BIGINT, bits BIGINT) — position p sets bit
p%64 of bucket p>>6. Build is one scan of history + a groupBy(bucket)
whose map-side partial ``bit_or`` collapses each task's contribution
to ≤ m/64 rows before the exchange, so the shuffle carries
O(tasks · m/64) rows, NOT O(history · k). Probe is k broadcast hash
joins of the bucket relation (≤ m/64 rows) — map-only over the batch.

Reference parity: pg-bifrost dedupes replayed WAL by txn ledger
(transactions/progress.go); corpus-level content dedup has no
reference counterpart — this is part of the training-data surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table, tracked_cache

# Floor on m keeps k sane for tiny corpora; bloom math below this size
# is irrelevant anyway (the relation would broadcast exactly).
_M_MIN_BITS = 1 << 10
_K_MAX = 8


def bloom_params(n_keys: int, fpp: float = 0.03) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at ``fpp``; m is
    rounded up to a power of two so ``pmod(hash, m)`` stays uniform
    (xxhash64 is full-width; pmod by a pow-2 keeps the low bits)."""
    n = max(1, n_keys)
    bits = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = _M_MIN_BITS
    while m < bits:
        m <<= 1
    k = max(1, min(_K_MAX, round(math.log(2) * m / n)))
    return m, k


def _positions(col: str, m: int, k: int) -> list[F.Column]:
    # Seed variation via an appended literal: xxhash64 is a multi-arg
    # hash, so (key, i) decorrelates the k probes without re-hashing
    # strings k times driver-side.
    return [F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m)) for i in range(k)]


def bloom_build(keys: DataFrame, col: str, m: int, k: int) -> DataFrame:
    """(bucket, bits) bloom relation from a key column. Duplicate keys
    are free (bit_or is idempotent) — callers should NOT pre-distinct
    the big side; that would add the very shuffle this avoids."""
    exploded = keys.select(F.explode(F.array(*_positions(col, m, k))).alias("pos"))
    return (
        exploded.select(
            F.shiftright(F.col("pos"), 6).alias("bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, col: str, bloom: DataFrame, m: int, k: int, hit_col: str = "bloom_hit"
) -> DataFrame:
    """Adds ``hit_col``: true iff all k bits are set. k broadcast hash
    joins against the ≤ m/64-row bucket relation — map-only on ``df``,
    no shuffle of the probed side at any scale."""
    out = df
    conds = []
    positions = _positions(col, m, k)
    for i in range(k):
        out = out.withColumn(f"_bp{i}", positions[i])
        side = bloom.select(
            F.col("bucket").alias(f"_bb{i}"), F.col("bits").alias(f"_bw{i}")
        )
        out = out.join(
            F.broadcast(side),
            F.shiftright(F.col(f"_bp{i}"), 6) == F.col(f"_bb{i}"),
            "left",
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_bp{i} % 64 AS INT))")
        conds.append(F.col(f"_bw{i}").isNotNull() & (F.col(f"_bw{i}").bitwiseAND(mask) != 0))
    hit = conds[0]
    for c in conds[1:]:
        hit = hit & c
    drop = [f"_bp{i}" for i in range(k)] + [f"_bb{i}" for i in range(k)] + [f"_bw{i}" for i in range(k)]
    return out.withColumn(hit_col, hit).drop(*drop)


def incremental_exact_new(
    history: DataFrame, batch: DataFrame, key: str, fpp: float = 0.03,
    params: tuple[int, int] | None = None,
) -> DataFrame:
    """Rows of ``batch`` whose ``key`` does NOT appear in ``history``
    — exact, with the bloom only routing work:

      1. survivor keys = bloom-hit rows (true dups + fpp·batch false
         positives) — the only batch keys that can possibly be dups,
         because a bloom miss proves absence;
      2. confirmed = history ⋉ broadcast(survivor keys) — one map-side
         scan of history, no shuffle of the big side;
      3. result = batch ⋉̸ broadcast(confirmed): a row with a
         confirmed key is a dup by definition; a row whose key is not
         confirmed is either a bloom miss (provably new) or a false
         positive (history scan proved it absent). The hit flag never
         needs re-evaluating in the final pass.

    Cost: batch scanned twice (probe pass, final anti pass — both
    map-only), history twice (build + confirm); at scale both
    artifacts persist between ingests — the bloom relation as a tiny
    parquet, history digests bucketed by key (sinks.bucketed) so the
    confirm is co-located — making the per-ingest cost the two
    map-only batch passes. The broadcast of survivor/confirmed keys
    assumes dup rate + fpp bounded (tune fpp down if survivors grow);
    cross-batch self-dups are out of scope (dedup_exact covers those).

    ``params`` overrides (m, k) for tests; default sizes from
    history.count() — one O(1)-result aggregation job, or free when
    stored stats exist.
    """
    if params is None:
        params = bloom_params(history.count(), fpp)
    m, k = params
    bloom = tracked_cache(bloom_build(history.select(key), key, m, k))
    probed = bloom_probe(batch, key, bloom, m, k)
    surv_keys = probed.filter(F.col("bloom_hit")).select(key).distinct()
    confirmed = (
        history.join(F.broadcast(surv_keys), key, "left_semi").select(key).distinct()
    )
    return batch.join(F.broadcast(confirmed), key, "left_anti")


# --------------------------------------------------------------------------
# registered gate query
# --------------------------------------------------------------------------
# Fixture: history = docs with doc_id % 3 != 0; batch = docs with
# doc_id % 3 == 0 (all genuinely new) UNION replanted clones of
# history rows (doc_id % 3 == 1 AND doc_id % 7 == 1, id += offset) —
# so BOTH outcomes are non-empty and the oracle must agree on each.
_REPLANT_OFFSET = 20_000_000


def _fixture(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = table(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash")
    history = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", digest)
    fresh = docs.filter(F.col("doc_id") % 3 == 0)
    replant = docs.filter((F.col("doc_id") % 3 == 1) & (F.col("doc_id") % 7 == 1)).withColumn(
        "doc_id", F.col("doc_id") + _REPLANT_OFFSET
    )
    batch = fresh.unionByName(replant).select("doc_id", digest)
    return history, batch


@register(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH history AS (
      SELECT md5(lower(trim(text))) AS content_hash
      FROM documents WHERE doc_id % 3 <> 0
    ),
    batch AS (
      SELECT doc_id, md5(lower(trim(text))) AS content_hash
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + {_REPLANT_OFFSET} AS doc_id, md5(lower(trim(text))) AS content_hash
      FROM documents WHERE doc_id % 3 = 1 AND doc_id % 7 = 1
    )
    SELECT b.doc_id, b.content_hash
    FROM batch b LEFT JOIN (SELECT DISTINCT content_hash FROM history) h USING (content_hash)
    WHERE h.content_hash IS NULL
    ORDER BY b.doc_id
    """,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental dedup through the bloom route. fpp=0.3 is
    deliberately coarse — a ~20–25% false-positive rate at ANY sf (m
    scales with n) keeps the confirm path exercised by the gate, not
    just the happy miss path — while the result must still equal the
    plain anti-join the oracle computes. Production callers keep the
    3% default."""
    history, batch = _fixture(spark, sf_dir)
    # USING-column anti-join hoists the key; restore the oracle's
    # (doc_id, content_hash) column order
    return (
        incremental_exact_new(history, batch, "content_hash", fpp=0.3)
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    )
