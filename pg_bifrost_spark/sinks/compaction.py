"""Compaction for the exactly-once epoch sink (``writers.
exactly_once_ndjson``) — the small-file hygiene a long-running CDC
stream needs: thousands of per-micro-batch epoch directories become a
few consolidated generations, WITHOUT breaking the exactly-once read
contract at any crash point.

Protocol (manifest-last, delete-later):
  1. ``compact_epochs`` reads every COMMITTED epoch dir (``_SUCCESS``
     present), writes one consolidated ``compacted/gen=<n>/`` with the
     data files first and a ``_MANIFEST`` (the list of absorbed epoch
     ids) written LAST — the manifest is the commit point.
  2. ``read_ndjson`` returns compacted generations PLUS any epoch dir
     not named by a committed manifest. A crash before the manifest
     leaves a partial gen that readers ignore (no manifest) and the
     next compaction overwrites; a crash after the manifest but before
     cleanup double-STORES but never double-READS.
  3. ``vacuum_epochs`` deletes absorbed epoch dirs — safe at any time
     after the manifest exists, idempotent.
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


def _absorbed_epochs(base_path: str) -> set[str]:
    absorbed: set[str] = set()
    comp = os.path.join(base_path, "compacted")
    if not os.path.isdir(comp):
        return absorbed
    for gen in sorted(os.listdir(comp)):
        mf = os.path.join(comp, gen, MANIFEST)
        if os.path.exists(mf):
            with open(mf) as f:
                absorbed.update(json.load(f)["epochs"])
    return absorbed


def compact_epochs(
    spark: SparkSession, base_path: str, min_epochs: int = 2
) -> int:
    """Consolidate un-absorbed committed epochs into the next
    ``compacted/gen=<n>``; returns how many epochs were absorbed (0 =
    nothing to do). One shuffle-free read+write of the absorbed data."""
    absorbed = _absorbed_epochs(base_path)
    todo = [e for e in _committed_epochs(base_path) if e not in absorbed]
    if len(todo) < min_epochs:
        return 0
    comp = os.path.join(base_path, "compacted")
    os.makedirs(comp, exist_ok=True)
    gens = [g for g in os.listdir(comp) if g.startswith("gen=")]
    gen_dir = os.path.join(comp, f"gen={len(gens)}")
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
    manifest has absorbed."""
    absorbed = _absorbed_epochs(base_path)
    paths = []
    comp = os.path.join(base_path, "compacted")
    if os.path.isdir(comp):
        for gen in sorted(os.listdir(comp)):
            if os.path.exists(os.path.join(comp, gen, MANIFEST)):
                paths.append(os.path.join(comp, gen))
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
    for e in _absorbed_epochs(base_path):
        p = os.path.join(base_path, e)
        if os.path.isdir(p):
            shutil.rmtree(p)
            n += 1
    return n
