"""Integer PageRank: exactness vs a hand-rolled Python power
iteration (same integer quantization), and the irregular-graph gate
fixture's rank distribution actually discriminates."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_bifrost_spark.operators.curation import (
    PAGERANK_ITERS,
    _PR_JUMP,
    _PR_ONE,
    pagerank_micro,
)


def _python_pagerank(nodes, edges, iters):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: _PR_ONE for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {n: _PR_JUMP + (85 * s[n]) // 100 for n in nodes}
    return r


def test_matches_python_reference(spark):
    nodes = list(range(7))
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (5, 2), (6, 2), (6, 0)]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.r for r in pagerank_micro(ndf, edf, PAGERANK_ITERS).collect()
    }
    want = _python_pagerank(nodes, edges, PAGERANK_ITERS)
    assert got == want
    # the authority cycle 2 -> 0 -> 2 holds the mass: node 2 collects
    # in-degree 6, node 0 inherits ALL of 2's rank (outdeg 1)
    assert max(want, key=want.get) in (0, 2)
    assert min(want[0], want[2]) > max(want[n] for n in (1, 3, 4, 5))
    # dangling-in node (never linked): exactly the jump mass
    assert got[3] == _PR_JUMP


def test_gate_fixture_discriminates(spark, sf_dir):
    import pg_bifrost_spark.plans as plans

    plans.load_all()
    df = plans.QUERIES["pagerank_quality_prior"](spark, sf_dir)
    rows = df.collect()
    ranks = [r.rank_micro for r in rows]
    assert len(rows) > 0
    # the irregular graph must produce a real distribution, not the
    # 3-value near-constant vector a regular graph converges to
    assert len(set(ranks)) > 50
    assert min(ranks) == _PR_JUMP  # some node has no in-links
