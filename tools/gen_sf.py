"""Deterministic scale-up of a driver-generated sf fixture directory
(default: sf0.1 → a 10× "sf1" under /tmp) for scale-rehearsal benching
(VERDICT r6 ask #1: no query had ever been timed above sf0.1).

Design constraints — the point is to measure SCALING, so the scaled
corpus must make the expensive operators do N× the sf0.1 WORK, not a
different workload:

  * replica 0 is the original rows byte-for-byte; replicas 1..N-1
    shift every key column by ``i * STRIDE``.
  * STRIDE = 100_000_000 = 2⁸·5⁸, divisible by every planted-fixture
    modulus in the SCALE-GATED family (PLANT_MOD=64, SPAN_MOD=25,
    TRUNC_MOD=10, CODE_MOD=16, the %10/%20/%50 patterns), so each
    replica reproduces those plant patterns exactly (same duplicate
    clusters, same footer docs — N independent copies of the sf0.1
    workload). Non-scale-gated plants with coprime moduli (7, 9, 11,
    13, 17…) keep their DENSITY per replica (~1/m of rows) but shift
    which ids carry them — linear workload either way, just not
    byte-identical clusters.
  * document TEXT in replica i>0 gets a per-token ``_r<i>`` suffix:
    each replica is its own shingle/span/vocab universe, so dedup
    candidate generation grows LINEARLY with N. Naive row duplication
    would instead create N-way exact/near-duplicate clusters —
    O(N²) pair enumeration inside every LSH/SRP bucket, i.e. a
    quadratically different workload that no real 10× corpus has.
  * EMBEDDINGS in replica i>0 get deterministic per-dimension noise at
    ±0.5 amplitude (hash-derived, reproducible): scaled or copied
    vectors keep the same SRP sign pattern and cosine 1.0, which would
    again manufacture N-way near-dup clusters; noisy replicas are
    unrelated vectors, preserving the original neighbor structure per
    replica.
  * nation/region stay fixed (TPC-H semantics: dimension tables don't
    scale); all FK columns shift by the same stride as their PK, so
    joins stay consistent within each replica and never match across
    replicas.

Output parquet is written by DuckDB (micro timestamps; the engine's
``events_ts_to_timestamp`` normalizes any fixture vintage).

Usage: python tools/gen_sf.py [--src /root/testdata/sf0.1]
       [--dst /tmp/spark_graft_sf1] [--replicas 10]
Writes <dst>/<table>.parquet + a _SCALE_MANIFEST.json recording the
inputs; regeneration is skipped when the manifest matches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb

STRIDE = 100_000_000

# table -> columns shifted by i*STRIDE (PKs and FKs, same stride so
# intra-replica joins keep working)
SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["nation", "region"]


def _replica_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    """SELECT list for replica ``i`` of ``table`` (i=0 → SELECT *)."""
    if i == 0:
        return "SELECT * FROM src"
    parts = []
    for name, dtype in cols:
        if name in SHIFT_COLS.get(table, []):
            parts.append(f"{name} + {i * STRIDE} AS {name}")
        elif table == "documents" and name == "text":
            # per-token suffix: a fresh token universe per replica
            parts.append(
                "array_to_string(list_transform(string_split(text, ' '),"
                f" t -> t || '_r{i}'), ' ') AS text"
            )
        elif table == "embeddings" and name == "embedding":
            # deterministic ±0.5 per-dimension noise, then back to FLOAT[]
            parts.append(
                "CAST([embedding[j] + "
                f"((hash(vec_id * 1000003 + {i} * 31 + j) % 1000) / 1000.0 - 0.5)"
                " FOR j IN range(1, len(embedding) + 1)] AS FLOAT[]) AS embedding"
            )
        else:
            parts.append(name)
    return "SELECT " + ", ".join(parts) + " FROM src"


def generate(src: str, dst: str, replicas: int) -> None:
    manifest_path = os.path.join(dst, "_SCALE_MANIFEST.json")
    manifest = {"src": src, "replicas": replicas, "stride": STRIDE, "v": 1}
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                if json.load(f) == manifest and all(
                    os.path.exists(os.path.join(dst, f"{t}.parquet"))
                    for t in list(SHIFT_COLS) + FIXED
                ):
                    print(f"# {dst} up to date, skipping generation", file=sys.stderr)
                    return
        except (OSError, ValueError):
            pass
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
    for t in SHIFT_COLS:
        con.sql(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'")
        cols = [(r[0], r[1]) for r in con.sql("DESCRIBE src").fetchall()]
        union = "\nUNION ALL\n".join(
            _replica_select(t, cols, i) for i in range(replicas)
        )
        con.sql(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"# {t}: {n} rows", file=sys.stderr)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)


def ensure_sf1(
    src: str = "/root/testdata/sf0.1",
    dst: str = "/tmp/spark_graft_sf1",
    replicas: int = 10,
) -> str:
    """Generate-if-missing entry point for bench.py / the pytest gate."""
    generate(src, dst, replicas)
    return dst


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_sf1")
    ap.add_argument("--replicas", type=int, default=10)
    a = ap.parse_args()
    generate(a.src, a.dst, a.replicas)
