"""Small-N full-JSON lineitem roundtrip (ADVICE r3).

The driver-gated ``cdc_lineitem_roundtrip`` consumes the envelope at
the STRUCT layer (perf: to_json+from_json of 600 k rows proves nothing
extra there), which means a regression in lineitem-specific JSON value
RENDERING would slip past that gate. This pins the byte layer for the
same payload: the full sf0.001 lineitem table (~6 k rows) through the
JSON pipeline, envelopes re-parsed in plain Python, values compared to
the source parquet.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.cdc.pipeline import PipelineConfig, data_messages, run_pipeline_assembled
from pg_bifrost_spark.plans.cdc_bridge import _lineitem_raw

plans.load_all()

SF = "/root/testdata/sf0.001"


def test_lineitem_full_json_roundtrip(spark):
    out = data_messages(
        run_pipeline_assembled(_lineitem_raw(spark, SF), PipelineConfig())
    )
    envs = [json.loads(r.json) for r in out.select("json").collect()]
    assert envs, "no envelopes produced"

    # envelope shape: every reference field present (marshaller.go:118-126)
    for env in envs[:50]:
        assert set(env) == {"time", "time_ms", "txn", "lsn", "table", "operation", "columns"}
        assert env["table"] == "public.lineitem"
        assert env["operation"] == "INSERT"
        assert env["lsn"].count("/") == 1  # %X/%X hex rendering
        # type names and quoted flags ride along as strings
        q = env["columns"]["l_quantity"]["new"]
        assert q["t"] == "double precision" and q["q"] == "false"
        rf = env["columns"]["l_returnflag"]["new"]
        assert rf["t"] == "text" and rf["q"] == "true"

    def vals(env):
        c = env["columns"]
        return (
            int(c["l_orderkey"]["new"]["v"]),
            int(c["l_linenumber"]["new"]["v"]),
            round(float(c["l_quantity"]["new"]["v"]), 2),
            c["l_returnflag"]["new"]["v"],
            c["l_linestatus"]["new"]["v"],
        )

    got = sorted(vals(e) for e in envs)
    src = sorted(
        (r.l_orderkey, r.l_linenumber, round(r.q, 2), r.l_returnflag, r.l_linestatus)
        for r in plans.table(spark, SF, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("q"),
            "l_returnflag",
            "l_linestatus",
        )
        .collect()
    )
    assert got == src
