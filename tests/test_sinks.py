"""Sink-layer unit tests: batch caps/chunking, oversize-drop
semantics, partial retry — mirrors the reference's batch/transporter
test behaviors (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from pg_bifrost_spark.sinks.batching import (
    BatchCaps,
    ChunkStats,
    KINESIS_CAPS,
    chunk_records,
)
from pg_bifrost_spark.sinks.retry import BackoffPolicy, RetryExhausted, send_with_partial_retry


def test_chunk_by_count():
    recs = [b"x"] * 1203
    batches = list(chunk_records(recs, BatchCaps(max_records=500)))
    assert [len(b) for b in batches] == [500, 500, 203]


def test_chunk_by_bytes():
    recs = [b"a" * 400] * 5
    batches = list(chunk_records(recs, BatchCaps(max_records=100, max_batch_bytes=1000)))
    assert [len(b) for b in batches] == [2, 2, 1]


def test_oversize_dropped_but_counted():
    stats = ChunkStats()
    recs = [b"ok", b"x" * (1024 * 1024 + 1), b"ok2"]
    batches = list(chunk_records(recs, KINESIS_CAPS, stats))
    assert batches == [[b"ok", b"ok2"]]
    assert stats.dropped_oversize == 1
    assert stats.records == 2


def test_partial_retry_only_failed_subset():
    sent: list[list[int]] = []

    def send(batch):
        sent.append(list(batch))
        # first call: fail the last two; second call: succeed
        return batch[-2:] if len(sent) == 1 else []

    n = send_with_partial_retry([1, 2, 3, 4], send, sleep=lambda s: None)
    assert n == 2
    assert sent == [[1, 2, 3, 4], [3, 4]]


def test_retry_exhausted_raises():
    clock = iter(range(0, 10_000, 100)).__next__

    def send(batch):
        return batch  # nothing ever succeeds

    with pytest.raises(RetryExhausted) as e:
        send_with_partial_retry(
            [1], send, BackoffPolicy(max_elapsed_s=300), sleep=lambda s: None, clock=clock
        )
    assert e.value.pending == [1]


def test_transport_exception_retries_whole_batch():
    calls = []

    def send(batch):
        calls.append(list(batch))
        if len(calls) < 3:
            raise ConnectionError("broker hiccup")
        return []

    send_with_partial_retry([1, 2], send, sleep=lambda s: None)
    assert calls == [[1, 2], [1, 2], [1, 2]]


def test_backoff_intervals_cap():
    p = BackoffPolicy(initial_s=1.5, multiplier=1.2, max_interval_s=5.0)
    it = p.intervals()
    vals = [next(it) for _ in range(30)]
    assert vals[0] == 1.5
    assert max(vals) == 5.0
    assert all(a <= b or b == 5.0 for a, b in zip(vals, vals[1:]))


def test_kinesis_shard_expr_rejects_non_power_of_two(spark):
    """The 32-bit MD5-prefix ring model is exact only when n_shards
    divides 2^32; a 3-shard caller must get a loud error, not silent
    near-boundary misrouting (ADVICE r7)."""
    from pyspark.sql import functions as F

    from pg_bifrost_spark.sinks.writers import kinesis_shard_expr

    for bad in (3, 5, 6, 0, -4):
        with pytest.raises(ValueError, match="power"):
            kinesis_shard_expr(F.lit("k"), bad)
    # powers of two still construct fine (column expr, no evaluation)
    for ok in (1, 2, 4, 1024):
        kinesis_shard_expr(F.lit("k"), ok)


def test_bench_json_atomic_write(tmp_path):
    """bench.py persists its JSON payload via write-tmp-then-rename so
    a driver stdout-pipe truncation can't erase per-query evidence
    (VERDICT r7 ask #7)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    path = str(tmp_path / "out.json")
    payload = {"metric": "m", "queries": {"q": 1.5}}
    bench._write_json_atomic(path, payload)
    with open(path) as f:
        assert json.load(f) == payload
    import os

    assert not os.path.exists(path + ".tmp")
