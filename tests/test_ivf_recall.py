"""IVF recall vs brute force with the k-means-trained codebook — the
quality property that justifies the rows-only check on the IVF path:
probing nprobe of k cells must still find most of the true neighbors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.mixture import kmeans_codebook
from pg_bifrost_spark.plans import table

plans.load_all()

SF = "/root/testdata/sf0.01"
TOP_K = 10
NPROBE = 4
N_CELLS = 16


def _l2(v, c):
    return sum((a - b) ** 2 for a, b in zip(v, c))


def test_ivf_probe_recall_vs_bruteforce(spark):
    emb = table(spark, SF, "embeddings")
    cents, _ = kmeans_codebook(emb, k=N_CELLS, iters=5)

    # cell assignment via the same map-side argmin the operator uses
    cent_lit = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    d2s = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(F.col("embedding"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    assigned = emb.select(
        "vec_id",
        "embedding",
        F.array_position(d2s, F.array_min(d2s)).alias("cell"),
    )

    rows = assigned.collect()
    by_id = {r.vec_id: ([float(x) for x in r.embedding], int(r.cell)) for r in rows}

    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    recalls = []
    for qid in sorted(by_id)[:5]:  # five probe queries
        qv, _ = by_id[qid]
        # brute-force true top-k
        scored = sorted(
            ((cos(qv, v), vid) for vid, (v, _) in by_id.items() if vid != qid),
            reverse=True,
        )
        true_top = {vid for _, vid in scored[:TOP_K]}
        # probe the NPROBE nearest cells to the query
        cell_order = sorted(range(len(cents)), key=lambda i: _l2(qv, cents[i]))
        probed = {i + 1 for i in cell_order[:NPROBE]}  # 1-indexed cells
        candidates = {vid for vid, (_, c) in by_id.items() if c in probed and vid != qid}
        got = {vid for _, vid in scored[:TOP_K] if vid in candidates}
        # recall = fraction of true top-k that the probed cells contain
        recalls.append(len(true_top & candidates) / TOP_K)
        assert got == (true_top & candidates)

    avg = sum(recalls) / len(recalls)
    assert avg >= 0.6, f"IVF recall@{TOP_K} nprobe={NPROBE}/{N_CELLS}: {avg:.2%} {recalls}"
