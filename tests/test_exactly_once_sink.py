"""Exactly-once epoch-manifest file sink: replaying a committed epoch
is a no-op, a partial (crashed) attempt is overwritten, and the
end-to-end stream delivers each payload exactly once across a
checkpoint restart that forces re-delivery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, raw_lines_df, txn
from pg_bifrost_spark.cdc.pipeline import PipelineConfig
from pg_bifrost_spark.sinks.writers import exactly_once_ndjson
from pg_bifrost_spark.streaming.core import drain_cdc_query


def test_committed_epoch_replay_is_noop(spark, tmp_path):
    out = str(tmp_path / "out")
    batch = spark.createDataFrame([("a",), ("b",)], "json string")
    assert exactly_once_ndjson(batch, 7, out) is True
    first = sorted(r.value for r in spark.read.text(os.path.join(out, "epoch=7")).collect())
    # replay of the SAME epoch (same id) must not duplicate
    assert exactly_once_ndjson(batch, 7, out) is False
    again = sorted(r.value for r in spark.read.text(os.path.join(out, "epoch=7")).collect())
    assert first == again == ["a", "b"]


def test_partial_attempt_is_overwritten(spark, tmp_path):
    out = str(tmp_path / "out")
    epoch_dir = os.path.join(out, "epoch=3")
    os.makedirs(epoch_dir)
    with open(os.path.join(epoch_dir, "part-stale.txt"), "w") as f:
        f.write("stale-partial-write\n")
    # no _SUCCESS marker → the retry must overwrite, not append or skip
    batch = spark.createDataFrame([("x",)], "json string")
    assert exactly_once_ndjson(batch, 3, out) is True
    rows = [r.value for r in spark.read.text(epoch_dir).collect()]
    assert rows == ["x"]


def test_stream_restart_delivers_each_payload_once(spark, tmp_path):
    """Drain a corpus, then re-run the SAME checkpoint with the sink's
    output intact: the second run must add nothing (offsets committed)
    and the union of epoch dirs holds every DML payload exactly once."""
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    ops = []
    for t in range(6):
        ops.extend(txn(900 + t, dml_line("public.t", "INSERT", [("id", "integer", t)])))
    lines = ops_to_raw_lines(ops)
    raw_lines_df(spark, lines).select(
        F.to_json(F.struct("wal_start", "server_time_ms", "line")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(wal_dir)
    for n in os.listdir(wal_dir):
        if n.startswith("part-"):
            os.rename(os.path.join(wal_dir, n), os.path.join(wal_dir, n + ".jsonl"))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sink(batch_df, epoch_id):
        exactly_once_ndjson(batch_df, epoch_id, out)

    drain_cdc_query(
        spark, sink, ckpt, cfg=PipelineConfig(),
        source_options={"wal_dir": wal_dir, "max_msgs_per_batch": "5"},
    )
    payloads = sorted(r.value for r in spark.read.text(os.path.join(out, "epoch=*")).collect())
    assert len(payloads) == 6  # one INSERT envelope per txn, no dups
    # re-run against the same checkpoint: nothing new, nothing doubled
    drain_cdc_query(
        spark, sink, ckpt, cfg=PipelineConfig(),
        source_options={"wal_dir": wal_dir, "max_msgs_per_batch": "5"},
    )
    again = sorted(r.value for r in spark.read.text(os.path.join(out, "epoch=*")).collect())
    assert again == payloads


# ---------------------------------------------------------------------------
# compaction lifecycle
# ---------------------------------------------------------------------------
from pg_bifrost_spark.sinks.compaction import (  # noqa: E402
    compact_epochs,
    read_ndjson,
    vacuum_epochs,
)


def _payloads(spark, base):
    return sorted(r.value for r in read_ndjson(spark, base).collect())


def test_compaction_preserves_exactly_once_at_every_stage(spark, tmp_path):
    base = str(tmp_path / "out")
    for e in range(4):
        b = spark.createDataFrame([(f"p{e}a",), (f"p{e}b",)], "json string")
        exactly_once_ndjson(b, e, base)
    expect = sorted(f"p{e}{s}" for e in range(4) for s in "ab")
    assert _payloads(spark, base) == expect

    # compact: same view, epochs absorbed into gen=0
    assert compact_epochs(spark, base) == 4
    assert _payloads(spark, base) == expect
    # crash-window: manifest committed, epochs not yet vacuumed — the
    # reader must NOT double-count the absorbed epochs (checked above);
    # vacuum then removes them and the view is unchanged
    assert vacuum_epochs(base) == 4
    assert _payloads(spark, base) == expect
    # idempotence: nothing left to compact or vacuum
    assert compact_epochs(spark, base) == 0
    assert vacuum_epochs(base) == 0

    # new epochs after compaction join the view; a second generation
    # absorbs only them
    exactly_once_ndjson(
        spark.createDataFrame([("p4a",)], "json string"), 4, base
    )
    assert _payloads(spark, base) == expect + ["p4a"]
    exactly_once_ndjson(
        spark.createDataFrame([("p5a",)], "json string"), 5, base
    )
    assert compact_epochs(spark, base) == 2
    assert _payloads(spark, base) == expect + ["p4a", "p5a"]


def test_partial_generation_without_manifest_is_invisible(spark, tmp_path):
    base = str(tmp_path / "out")
    for e in range(2):
        exactly_once_ndjson(
            spark.createDataFrame([(f"e{e}",)], "json string"), e, base
        )
    # simulate a compaction crash AFTER data files, BEFORE manifest
    gen = os.path.join(base, "compacted", "gen=0")
    os.makedirs(gen)
    with open(os.path.join(gen, "part-dead.txt"), "w") as f:
        f.write("e0\ne1\n")
    # reader ignores the manifest-less gen — no duplicates
    assert _payloads(spark, base) == ["e0", "e1"]
    # the retry overwrites the carcass and commits
    assert compact_epochs(spark, base) == 2
    assert _payloads(spark, base) == ["e0", "e1"]


def test_crashed_partial_gen_is_deleted_and_number_reused(spark, tmp_path):
    """ADVICE r5: gen numbering must come from committed manifests, not
    dir count — a crashed partial gen=N is deleted at the next
    compaction (no orphan data files leak) and its number is reused."""
    import shutil

    base = str(tmp_path / "out")
    for e in range(2):
        exactly_once_ndjson(
            spark.createDataFrame([(f"e{e}",)], "json string"), e, base
        )
    assert compact_epochs(spark, base) == 2  # committed gen=0
    assert vacuum_epochs(base) == 2
    for e in (2, 3):
        exactly_once_ndjson(
            spark.createDataFrame([(f"e{e}",)], "json string"), e, base
        )
    # simulate a crash mid-compaction: data files written, no manifest
    dead = os.path.join(base, "compacted", "gen=1")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-dead.txt"), "w") as f:
        f.write("e2\ne3\n")
    assert _payloads(spark, base) == ["e0", "e1", "e2", "e3"]  # partial invisible
    # retry: the carcass is deleted, the number reused, nothing leaks
    assert compact_epochs(spark, base) == 2
    comp = os.path.join(base, "compacted")
    gens = sorted(os.listdir(comp))
    assert gens == ["gen=0", "gen=1"]
    assert os.path.exists(os.path.join(comp, "gen=1", "_MANIFEST"))
    assert not os.path.exists(os.path.join(comp, "gen=1", "part-dead.txt"))
    assert _payloads(spark, base) == ["e0", "e1", "e2", "e3"]
