"""pgcdc-multi offset planning must be O(metadata) (VERDICT r5 ask #2):
``latestOffset`` reads per-file LSN sidecars / the in-process stat
cache — never data file bodies — and ``read`` opens only the files
overlapping its range (plus bounded back-scan boundary files).
"""

from __future__ import annotations

import builtins
import json
import os

from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, txn
from pg_bifrost_spark.sources.pgcdc_multi import (
    PgCdcMultiStreamReader,
    SlotRangePartition,
)


def _write_file(slot_dir, name, ops, start_lsn):
    os.makedirs(slot_dir, exist_ok=True)
    with open(os.path.join(slot_dir, name), "w") as f:
        for ws, _, tm, _, line in ops_to_raw_lines(ops, start_lsn=start_lsn):
            f.write(json.dumps({"wal_start": ws, "server_time_ms": tm, "line": line}) + "\n")


def _corpus(base):
    for i, lsn in enumerate((1000, 5000, 9000)):
        _write_file(
            os.path.join(base, "slot_a"),
            f"{i:03d}.jsonl",
            txn(10 + i, dml_line("public.x", "INSERT", [("id", "integer", i)])),
            start_lsn=lsn,
        )
    _write_file(
        os.path.join(base, "slot_b"),
        "000.jsonl",
        txn(90, dml_line("public.y", "INSERT", [("id", "integer", 7)])),
        start_lsn=2000,
    )


def _spy_open(monkeypatch, opened):
    real = builtins.open

    def spy(file, *a, **kw):
        opened.append(str(file))
        return real(file, *a, **kw)

    monkeypatch.setattr(builtins, "open", spy)
    return real


def test_latest_offset_opens_no_data_bodies(tmp_path, monkeypatch):
    base = str(tmp_path / "wal")
    _corpus(base)
    # first reader indexes each file ONCE and persists .idx sidecars
    r1 = PgCdcMultiStreamReader({"wal_dir": base})
    off = r1.latestOffset()
    assert off["slot_a"] > off["slot_b"] > 0
    assert os.path.exists(os.path.join(base, "slot_a", "000.jsonl.idx"))

    opened = []
    _spy_open(monkeypatch, opened)
    # warm reader: repeat trigger hits the in-process cache — NOTHING opens
    assert r1.latestOffset() == off
    assert opened == [], opened

    # fresh reader (driver restart): only sidecars open, never bodies
    opened.clear()
    r2 = PgCdcMultiStreamReader({"wal_dir": base})
    assert r2.latestOffset() == off
    assert opened and all(p.endswith(".idx") for p in opened), opened


def test_stale_sidecar_reindexes_only_the_grown_file(tmp_path, monkeypatch):
    base = str(tmp_path / "wal")
    _corpus(base)
    r = PgCdcMultiStreamReader({"wal_dir": base})
    off0 = r.latestOffset()
    # append to ONE file (the active tail): only that body re-parses
    slot_a = os.path.join(base, "slot_a")
    with open(os.path.join(slot_a, "002.jsonl"), "a") as f:
        for ws, _, tm, _, line in ops_to_raw_lines(
            txn(13, dml_line("public.x", "INSERT", [("id", "integer", 99)])),
            start_lsn=12_000,
        ):
            f.write(json.dumps({"wal_start": ws, "server_time_ms": tm, "line": line}) + "\n")
    opened = []
    _spy_open(monkeypatch, opened)
    off1 = r.latestOffset()
    assert off1["slot_a"] > off0["slot_a"]
    bodies = [p for p in opened if p.endswith(".jsonl")]
    assert bodies == [os.path.join(slot_a, "002.jsonl")], opened


def test_read_opens_only_overlapping_files(tmp_path, monkeypatch):
    base = str(tmp_path / "wal")
    _corpus(base)
    r = PgCdcMultiStreamReader({"wal_dir": base})
    files = r._index["slot_a"].files()
    # range covering ONLY the middle file's txn (plus BEGIN back-scan
    # may touch the file straddling start — here start sits inside 001)
    part = SlotRangePartition(base, "slot_a", 0, 5000, 8000, files)
    opened = []
    _spy_open(monkeypatch, opened)
    [batch] = list(r.read(part))
    bodies = sorted({p for p in opened if p.endswith(".jsonl")})
    assert bodies == [os.path.join(base, "slot_a", "001.jsonl")], opened
    lines = batch.column(4).to_pylist()
    assert any("table public.x" in ln for ln in lines)
    # txn identity re-derived from the BEGIN at range start
    assert all(x == "11" for x in batch.column(5).to_pylist())


def test_back_scan_walks_to_earlier_file_for_begin(tmp_path):
    """Range starting mid-txn at a file boundary: the BEGIN lives in
    the PREVIOUS file; the back-scan must find it without parsing the
    whole slot."""
    base = str(tmp_path / "wal")
    slot = os.path.join(base, "slot_a")
    ops = list(
        txn(
            77,
            dml_line("public.x", "INSERT", [("id", "integer", 1)]),
            dml_line("public.x", "INSERT", [("id", "integer", 2)]),
        )
    )
    raws = list(ops_to_raw_lines(ops, start_lsn=1000))
    os.makedirs(slot, exist_ok=True)
    # split one txn across two files: BEGIN+first row | second row+COMMIT
    for name, chunk in (("000.jsonl", raws[:2]), ("001.jsonl", raws[2:])):
        with open(os.path.join(slot, name), "w") as f:
            for ws, _, tm, _, line in chunk:
                f.write(json.dumps({"wal_start": ws, "server_time_ms": tm, "line": line}) + "\n")
    r = PgCdcMultiStreamReader({"wal_dir": base})
    files = r._index["slot_a"].files()
    start = raws[1][0]  # after the first row: remaining = row 2 + COMMIT
    part = SlotRangePartition(base, "slot_a", 0, start, raws[-1][0], files)
    [batch] = list(r.read(part))
    assert batch.num_rows == 2
    assert all(x == "77" for x in batch.column(5).to_pylist())


def test_readonly_corpus_still_works(tmp_path, monkeypatch):
    """Sidecar persistence is best-effort: when the sidecar write
    fails (read-only corpus), offset planning falls back to the
    in-process cache without failing. The failure is INJECTED (chmod
    0o555 is a no-op under root's CAP_DAC_OVERRIDE, so a permissions
    -based version of this test is vacuous in CI)."""
    base = str(tmp_path / "wal")
    _corpus(base)
    real = builtins.open

    def deny_idx_writes(file, mode="r", *a, **kw):
        if str(file).endswith(".idx.tmp") and "w" in mode:
            raise OSError(30, "Read-only file system", str(file))
        return real(file, mode, *a, **kw)

    monkeypatch.setattr(builtins, "open", deny_idx_writes)
    r = PgCdcMultiStreamReader({"wal_dir": base})
    off = r.latestOffset()
    assert off["slot_a"] > 0
    # no sidecars could be persisted…
    assert not [
        p for slot in ("slot_a", "slot_b")
        for p in os.listdir(os.path.join(base, slot)) if p.endswith(".idx")
    ]
    # …but the warm reader still plans repeat offsets from memory
    assert r.latestOffset() == off
