"""Compaction for the exactly-once epoch sink (``writers.
exactly_once_ndjson``) — the small-file hygiene a long-running CDC
stream needs: thousands of per-micro-batch epoch directories become a
few consolidated generations, WITHOUT breaking the exactly-once read
contract at any crash point.

Protocol (manifest-last, delete-later):
  1. ``compact_epochs`` reads every COMMITTED epoch dir (``_SUCCESS``
     present), writes one consolidated ``compacted/gen=<n>/`` with the
     data files first and a ``_MANIFEST`` (the list of absorbed epoch
     ids) written LAST — the manifest is the commit point. ``n`` is
     max(committed gen numbers) + 1, and any manifest-less gen dir (a
     crashed partial) is DELETED at compaction start — crashed
     partials never leak data files (ADVICE r5).
  2. ``read_ndjson`` returns compacted generations PLUS any epoch dir
     not named by a committed manifest. The generation listing is
     snapshotted FIRST and the absorbed set computed from that same
     snapshot, so a manifest committed concurrently between the two
     steps can't make its epochs double-read (they are still on disk
     and the snapshot doesn't see the new gen → read once, from the
     epoch dirs). A crash before the manifest leaves a partial gen
     that readers ignore (no manifest); a crash after the manifest but
     before cleanup double-STORES but never double-READS.
  3. ``vacuum_epochs`` deletes absorbed epoch dirs — safe at any time
     after the manifest exists, idempotent. (Running vacuum
     CONCURRENTLY with a reader is NOT snapshot-safe: if the reader
     snapshots the gen listing, then a compactor commits a new
     manifest and vacuum deletes the absorbed epochs before the reader
     lists epoch dirs, those rows are silently MISSING from that read
     — the new gen is invisible to the snapshot and the epoch dirs are
     gone (ADVICE r6). The interleaving where only the delete races
     the scan surfaces as a read error instead. Never duplicates
     either way. The in-repo consumers are single-process, which is
     the actual safety argument; a concurrent deployment must either
     not run vacuum while readers are active or have readers re-list
     gens after the epoch listing and retry when a new manifest
     appeared.)
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"


def _committed_epochs(base_path: str) -> list[str]:
    out = []
    if not os.path.isdir(base_path):
        return out
    for name in sorted(os.listdir(base_path)):
        if name.startswith("epoch=") and os.path.exists(
            os.path.join(base_path, name, "_SUCCESS")
        ):
            out.append(name)
    return out


def _gen_dirs(base_path: str) -> list[tuple[int, str, bool]]:
    """One listing of ``compacted/``: (gen_number, path, has_manifest)
    sorted by gen number — the single snapshot both the reader and the
    compactor derive everything from."""
    comp = os.path.join(base_path, "compacted")
    out = []
    if not os.path.isdir(comp):
        return out
    for g in os.listdir(comp):
        if not g.startswith("gen="):
            continue
        try:
            n = int(g.split("=", 1)[1])
        except ValueError:
            continue
        p = os.path.join(comp, g)
        out.append((n, p, os.path.exists(os.path.join(p, MANIFEST))))
    return sorted(out)


def _absorbed_from(gens: list[tuple[int, str, bool]]) -> set[str]:
    absorbed: set[str] = set()
    for _, p, has_manifest in gens:
        if has_manifest:
            with open(os.path.join(p, MANIFEST)) as f:
                absorbed.update(json.load(f)["epochs"])
    return absorbed


def compact_epochs(
    spark: SparkSession, base_path: str, min_epochs: int = 2
) -> int:
    """Consolidate un-absorbed committed epochs into the next
    ``compacted/gen=<n>``; returns how many epochs were absorbed (0 =
    nothing to do). One shuffle-free read+write of the absorbed data.
    Crashed partial generations (no manifest) are deleted first, and
    the new gen number is max(committed)+1 — a partial can therefore
    neither leak its orphan data files nor shadow a number."""
    gens = _gen_dirs(base_path)
    for _, p, has_manifest in gens:
        if not has_manifest:
            shutil.rmtree(p)
    committed = [g for g in gens if g[2]]
    absorbed = _absorbed_from(committed)
    todo = [e for e in _committed_epochs(base_path) if e not in absorbed]
    if len(todo) < min_epochs:
        return 0
    comp = os.path.join(base_path, "compacted")
    os.makedirs(comp, exist_ok=True)
    next_n = committed[-1][0] + 1 if committed else 0
    gen_dir = os.path.join(comp, f"gen={next_n}")
    paths = [os.path.join(base_path, e) for e in todo]
    df = spark.read.text(paths)
    # coalesce to ~one file per 64 MB of input (floor 1): pure
    # consolidation, no shuffle
    total = sum(
        os.path.getsize(os.path.join(p, f))
        for p in paths
        for f in os.listdir(p)
        if not f.startswith("_")
    )
    n_out = max(1, total // (64 << 20))
    df.coalesce(int(n_out)).write.mode("overwrite").text(gen_dir)
    with open(os.path.join(gen_dir, MANIFEST), "w") as f:  # commit point
        json.dump({"epochs": todo}, f)
    return len(todo)


def read_ndjson(spark: SparkSession, base_path: str) -> DataFrame:
    """Exactly-once view over the sink directory at ANY point of the
    compaction lifecycle: committed generations + epochs no committed
    manifest has absorbed — both derived from ONE generation-listing
    snapshot taken before the epoch listing (see module docstring for
    the concurrent-commit reasoning)."""
    gens = _gen_dirs(base_path)
    absorbed = _absorbed_from(gens)
    paths = [p for _, p, has_manifest in gens if has_manifest]
    paths.extend(
        os.path.join(base_path, e)
        for e in _committed_epochs(base_path)
        if e not in absorbed
    )
    if not paths:
        return spark.createDataFrame([], "value string")
    return spark.read.text(paths)


def vacuum_epochs(base_path: str) -> int:
    """Delete absorbed epoch dirs (idempotent, safe post-manifest)."""
    n = 0
    for e in _absorbed_from(_gen_dirs(base_path)):
        p = os.path.join(base_path, e)
        if os.path.isdir(p):
            shutil.rmtree(p)
            n += 1
    return n
