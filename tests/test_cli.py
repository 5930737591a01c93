"""CLI surface (python -m pg_bifrost_spark) — the reference binary's
command shape (main.go:557-763): `replicate <sink> --once` over a
replay corpus must drain end-to-end and leave real sink output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pg_bifrost_spark.__main__ import main
from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, raw_lines_df, txn


def _wal_corpus(spark, tmp_path, n_txns: int = 5) -> str:
    wal_dir = str(tmp_path / "wal")
    os.makedirs(wal_dir)
    ops = []
    for t in range(n_txns):
        ops.extend(
            txn(500 + t, dml_line("public.orders", "INSERT", [("id", "integer", t)]))
        )
    raw_lines_df(spark, ops_to_raw_lines(ops)).select(
        F.to_json(F.struct("wal_start", "server_time_ms", "line")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(wal_dir)
    for n in os.listdir(wal_dir):
        if n.startswith("part-"):
            os.rename(os.path.join(wal_dir, n), os.path.join(wal_dir, n + ".jsonl"))
    return wal_dir


def test_replicate_once_exactly_once_file_sink(spark, tmp_path):
    wal_dir = _wal_corpus(spark, tmp_path)
    out = str(tmp_path / "out")
    rc = main(
        [
            "replicate",
            "file-exactly-once",
            "--wal-dir", wal_dir,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--out", out,
            "--once",
        ]
    )
    assert rc == 0
    rows = [r.value for r in spark.read.text(os.path.join(out, "epoch=*")).collect()]
    assert len(rows) == 5  # one INSERT envelope per txn
    assert all('"table":"public.orders"' in v for v in rows)
    # re-running the SAME checkpoint is a no-op (exactly-once)
    assert main(
        [
            "replicate",
            "file-exactly-once",
            "--wal-dir", wal_dir,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--out", out,
            "--once",
        ]
    ) == 0
    again = [r.value for r in spark.read.text(os.path.join(out, "epoch=*")).collect()]
    assert sorted(again) == sorted(rows)


def test_replicate_once_whitelist_filters(spark, tmp_path):
    wal_dir = str(tmp_path / "wal2")
    os.makedirs(wal_dir)
    ops = []
    ops.extend(txn(600, dml_line("public.keep", "INSERT", [("id", "integer", 1)])))
    ops.extend(txn(601, dml_line("public.drop", "INSERT", [("id", "integer", 2)])))
    raw_lines_df(spark, ops_to_raw_lines(ops)).select(
        F.to_json(F.struct("wal_start", "server_time_ms", "line")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(wal_dir)
    for n in os.listdir(wal_dir):
        if n.startswith("part-"):
            os.rename(os.path.join(wal_dir, n), os.path.join(wal_dir, n + ".jsonl"))
    out = str(tmp_path / "out2")
    main(
        [
            "replicate",
            "file-exactly-once",
            "--wal-dir", wal_dir,
            "--checkpoint", str(tmp_path / "ck2"),
            "--out", out,
            "--once",
            "--whitelist", "public.keep",
        ]
    )
    rows = [r.value for r in spark.read.text(os.path.join(out, "epoch=*")).collect()]
    assert len(rows) == 1 and '"table":"public.keep"' in rows[0]
