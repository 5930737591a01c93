"""Per-sink batch caps and chunking — reference ``transport/``.

Caps (SURVEY.md §2.11):
  Kinesis  ≤500 records, ≤5 MiB/batch, ≤1 MiB/record (AWS PutRecords
           caps, ``kinesis/batch/batch.go:32-37``); oversize records
           are DROPPED but still counted for progress (``:63-68``)
  S3       ≤50,000 records per gzip NDJSON object (``s3/config.go:52-57``)
  Kafka    ≤5,000 records, ≤1,000,000 bytes/record (``kafka/config.go:42-65``)
  RabbitMQ ≤5,000 records (``rabbitmq/config.go:46-51``)
  stdout   batch size 1 (``transport/factory/factory.go:56-57``)

``chunk_records`` is driver-free, pure-Python, and runs inside each
foreachBatch partition — the Spark analog of the reference's batcher
goroutine (``transport/batcher/batcher.go:168-267``), except memory
pressure/flush-age concerns collapse into micro-batch sizing (A2/A3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator


@dataclass(frozen=True)
class BatchCaps:
    max_records: int
    max_batch_bytes: int | None = None
    max_record_bytes: int | None = None


KINESIS_CAPS = BatchCaps(max_records=500, max_batch_bytes=5 * 1024 * 1024, max_record_bytes=1024 * 1024)
S3_CAPS = BatchCaps(max_records=50_000)
KAFKA_CAPS = BatchCaps(max_records=5_000, max_record_bytes=1_000_000)
RABBITMQ_CAPS = BatchCaps(max_records=5_000)
STDOUT_CAPS = BatchCaps(max_records=1)


@dataclass
class ChunkStats:
    records: int = 0
    batches: int = 0
    dropped_oversize: int = 0


def chunk_records(
    records: Iterable,
    caps: BatchCaps,
    stats: ChunkStats | None = None,
    size_of=len,
) -> Iterator[list]:
    """Split a record stream into sink-sized batches.

    Oversize records are dropped (with a stat) but never fail the
    batch — and because Spark progress is offset-based, they still
    count as processed, preserving the reference's
    dropped-but-progress-advances semantics (``kinesis/batch/
    batch.go:63-68``; SURVEY.md §7 hard-part d)."""
    stats = stats if stats is not None else ChunkStats()
    batch: list = []
    batch_bytes = 0
    for rec in records:
        n = size_of(rec)
        if caps.max_record_bytes is not None and n > caps.max_record_bytes:
            stats.dropped_oversize += 1
            continue
        over_count = len(batch) >= caps.max_records
        over_bytes = (
            caps.max_batch_bytes is not None and batch and batch_bytes + n > caps.max_batch_bytes
        )
        if over_count or over_bytes:
            stats.batches += 1
            yield batch
            batch, batch_bytes = [], 0
        batch.append(rec)
        batch_bytes += n
        stats.records += 1
    if batch:
        stats.batches += 1
        yield batch
