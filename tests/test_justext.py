"""jusText block classifier: non-triviality pins (exact values are
hash-gated by tests/test_oracle.py)."""

from pg_bifrost_spark.plans import QUERIES, load_all

load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_context_pass_is_exercised_both_ways(spark):
    rows = QUERIES["boilerplate_justext_blocks"](spark, SF_DIR).collect()
    cf = {r["cls_cf"] for r in rows}
    assert cf == {"good", "bad", "maybe"}, cf
    inherited_good = [r for r in rows if r["cls_cf"] == "maybe" and r["cls_final"] == "good"]
    inherited_bad = [r for r in rows if r["cls_cf"] == "maybe" and r["cls_final"] == "bad"]
    assert inherited_good and inherited_bad
    # decided blocks never change class in the context pass
    assert all(
        r["cls_final"] == r["cls_cf"] for r in rows if r["cls_cf"] != "maybe"
    )
    # planted nav fragments are always context-free bad (link density)
    assert all(
        r["cls_cf"] == "bad"
        for r in rows
        if (r["doc_id"] * 31 + r["block_idx"]) % 5 == 0
    )
