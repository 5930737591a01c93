"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the decode kernel is a
deterministic STUB (clearly marked) — but everything Spark-side is
real and tested: binary column handling, schema of the decoded
metadata, Arrow batch shape through ``mapInPandas``, and the
partition-parallel layout a real decoder would run under. Swapping the
stub for PIL/ffmpeg is a one-function change on the executors.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table

DECODED_SCHEMA_DDL = (
    "doc_id bigint, n_bytes int, magic string, width int, height int, channels int"
)


def fake_decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas kernel. STUB decoder: derives fake-but-deterministic
    image dimensions from the payload bytes. A real implementation
    would call PIL.Image.open(BytesIO(payload)) here; the function
    signature, batching, and output schema would not change."""
    import pandas as pd

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "magic": payloads.map(lambda b: b[:4].hex() if len(b) >= 4 else ""),
                # deterministic fake dims (stand-in for real decode)
                "width": (n_bytes % 640) + 1,
                "height": (n_bytes % 480) + 1,
                "channels": (n_bytes % 3) + 1,
            }
        )


def decode_binary_metadata(df_binary: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → decoded metadata rows. Arrow-batched;
    partition-parallel; no driver involvement."""
    return df_binary.mapInPandas(fake_decode_batches, schema=DECODED_SCHEMA_DDL)


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column round-trip: text → binary payload → mapInPandas
    decode stub → byte length. The byte count is oracle-verified; the
    stubbed dims are covered by unit tests."""
    docs = table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    decoded = decode_binary_metadata(binary)
    return decoded.select("doc_id", "n_bytes").orderBy("doc_id")


FRAME_SCHEMA_DDL = "doc_id bigint, frame_idx int, frame_offset bigint, frame_bytes int"


def sample_frames_batches(n_frames: int = 4):
    """mapInPandas kernel factory: (doc_id, payload) → ``n_frames``
    evenly spaced frame records per payload. STUB frame extraction
    (offset arithmetic on the raw bytes); a real video path would call
    ffmpeg/PyAV here with the identical batch shape. One input row →
    many output rows: the fan-out pattern for frame/chunk-level
    training records."""

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                step = max(n // n_frames, 1)
                for i in range(min(n_frames, n)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * step)
                    out["frame_bytes"].append(min(step, n - i * step))
            yield pd.DataFrame(out)

    return kernel


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, count(*) AS n_frames, CAST(sum(frame_bytes) AS BIGINT) AS covered_bytes
    FROM (
      SELECT doc_id, i AS frame_idx,
             (i * greatest(octet_length(encode(text)) // 4, 1)) AS frame_offset,
             least(greatest(octet_length(encode(text)) // 4, 1),
                   octet_length(encode(text)) - i * greatest(octet_length(encode(text)) // 4, 1))
               AS frame_bytes
      FROM documents,
           LATERAL (SELECT unnest(range(0, least(4, octet_length(encode(text))))) AS i)
    )
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (1 row → N frame rows via
    mapInPandas) with per-document coverage accounting; the offset
    arithmetic is oracle-verified, the decode itself is the stub."""
    docs = table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = binary.mapInPandas(sample_frames_batches(4), schema=FRAME_SCHEMA_DDL)
    return (
        frames.groupBy("doc_id")
        .agg(F.count("*").alias("n_frames"), F.sum("frame_bytes").alias("covered_bytes"))
        .orderBy("doc_id")
    )


@register("multimodal_decode_stub", oracle=None)  # stubbed decode → rows-only
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decoded-metadata surface (fake dims): exercises the real
    Spark plumbing a production image pipeline needs — binary columns
    through Arrow, stable output schema, per-partition batching."""
    docs = table(spark, sf_dir, "documents")
    binary = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return decode_binary_metadata(binary).orderBy("doc_id")
