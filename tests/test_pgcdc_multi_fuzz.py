"""Seeded fuzz for the r6 pgcdc-multi span-scoped reader: on random
multi-file slot layouts (in-order, interleaved, and out-of-order LSN
ranges) and random offset ranges, `read()` must produce exactly what
the r5 full-parse semantics produced — same rows, same enclosing-txn
back-scan — while the metadata index stays consistent with the files.
"""

from __future__ import annotations

import json
import os
import random

from pg_bifrost_spark.sources.pgcdc_multi import (
    PgCdcMultiStreamReader,
    SlotRangePartition,
    _parse_slot_file,
)


def _reference_read(slot_dir: str, start: int, end: int):
    """The r5 semantics, reimplemented naively: full-parse every file,
    sort globally, derive the txn from the last BEGIN ≤ start, then
    emit rows in (start, end]."""
    msgs = []
    for name in sorted(os.listdir(slot_dir)):
        if name.endswith(".jsonl"):
            msgs.extend(_parse_slot_file(os.path.join(slot_dir, name)))
    msgs.sort()
    xid = tbk = None
    for lsn, _, line in msgs:
        if lsn > start:
            break
        head = line.split(" ", 2)
        if head[0] == "BEGIN" and len(head) >= 2:
            xid, tbk = head[1], f"{head[1]}-{lsn}"
    out = []
    for lsn, tms, line in msgs:
        if lsn <= start or lsn > end:
            continue
        head = line.split(" ", 2)
        if head[0] == "BEGIN" and len(head) >= 2:
            xid, tbk = head[1], f"{head[1]}-{lsn}"
        out.append((lsn, tms, line, xid, tbk))
    return out


def _random_corpus(rng: random.Random, slot_dir: str) -> int:
    """Write 3-7 files of whole transactions. Layouts: sequential
    (file ranges ascend), interleaved (txns round-robined across
    files), or shuffled (files get random txn subsets) — all legal for
    the reader, which never assumes file-level ordering."""
    os.makedirs(slot_dir, exist_ok=True)
    n_txns = rng.randint(4, 20)
    lsn = rng.randint(100, 1000)
    txns = []
    for t in range(n_txns):
        xid = 100 + t
        msgs = [(lsn, f"BEGIN {xid}")]
        lsn += rng.randint(4, 40)
        for r in range(rng.randint(1, 4)):
            msgs.append((lsn, f"table public.t: INSERT: id[integer]:{t * 10 + r}"))
            lsn += rng.randint(4, 40)
        msgs.append((lsn, f"COMMIT {xid}"))
        lsn += rng.randint(4, 40)
        txns.append(msgs)
    n_files = rng.randint(3, 7)
    layout = rng.choice(["sequential", "interleave", "shuffle"])
    buckets: list[list] = [[] for _ in range(n_files)]
    if layout == "sequential":
        per = max(1, len(txns) // n_files)
        for i, t in enumerate(txns):
            buckets[min(i // per, n_files - 1)].extend(t)
    elif layout == "interleave":
        for i, t in enumerate(txns):
            buckets[i % n_files].extend(t)
    else:
        order = list(range(len(txns)))
        rng.shuffle(order)
        for i in order:
            buckets[rng.randrange(n_files)].extend(txns[i])
    for i, msgs in enumerate(buckets):
        with open(os.path.join(slot_dir, f"{i:03d}.jsonl"), "w") as f:
            for ws, line in msgs:
                f.write(json.dumps({"wal_start": ws, "server_time_ms": ws % 977, "line": line}) + "\n")
    return lsn


def test_read_matches_full_parse_reference(tmp_path):
    rng = random.Random(0x6F02)
    for case in range(25):
        base = str(tmp_path / f"wal{case}")
        slot_dir = os.path.join(base, "slot_a")
        max_lsn = _random_corpus(rng, slot_dir)
        reader = PgCdcMultiStreamReader({"wal_dir": base})
        files = reader._index["slot_a"].files()
        # metadata must agree with the data
        highs = [hi for _, _, hi in files if hi is not None]
        assert max(highs) == reader.latestOffset()["slot_a"]
        for _ in range(8):
            a = rng.randint(0, max_lsn)
            b = rng.randint(a, max_lsn + 10)
            part = SlotRangePartition(base, "slot_a", 0, a, b, files)
            [batch] = list(reader.read(part))
            got = list(
                zip(
                    batch.column(0).to_pylist(),  # wal_start
                    batch.column(2).to_pylist(),  # time_ms
                    batch.column(4).to_pylist(),  # line
                    batch.column(5).to_pylist(),  # xid
                    batch.column(6).to_pylist(),  # tbk
                )
            )
            want = _reference_read(slot_dir, a, b)
            assert got == want, (case, a, b, layoutinfo(files))


def layoutinfo(files):
    return [(n, lo, hi) for n, lo, hi in files]
