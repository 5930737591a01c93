"""Golden-file tests: replay the reference's integration-test cases as
synthetic test_decoding WAL text through the full pipeline and compare
JSON envelopes against the vendored golden files (tests/golden/*),
using the same normalization as the reference harness
(itests/common.bash:230-233 — drop lsn/time/time_ms/txn, sort)."""

from __future__ import annotations

import json
import os

import pytest

from pg_bifrost_spark.cdc.fixtures import dml_line, ops_to_raw_lines, raw_lines_df, txn
from pg_bifrost_spark.cdc.pipeline import PipelineConfig, data_messages, run_pipeline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

NONDETERMINISTIC = ("lsn", "time", "time_ms", "txn")


def normalize(records: list[str]) -> list[dict]:
    out = []
    for r in records:
        d = json.loads(r)
        for k in NONDETERMINISTIC:
            d.pop(k, None)
        out.append(d)
    return sorted(out, key=lambda d: json.dumps(d, sort_keys=True))


def load_golden(name: str) -> list[dict]:
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return normalize([line for line in f if line.strip()])


def run(spark, ops, **cfg) -> list[str]:
    df = raw_lines_df(spark, ops_to_raw_lines(ops))
    out = data_messages(run_pipeline(df, PipelineConfig(**cfg)))
    return [r.json for r in out.select("json").collect()]


CUSTOMERS_INSERT_1 = dml_line(
    "public.customers",
    "INSERT",
    [("id", "integer", 1), ("first_name", "text", "Hello"), ("last_name", "text", "World")],
)


def basic_ops():
    return [
        *txn(565, CUSTOMERS_INSERT_1),
        *txn(
            566,
            dml_line(
                "public.customers",
                "INSERT",
                [
                    ("id", "integer", 2),
                    ("first_name", "text", "Goodbye"),
                    ("last_name", "text", "World"),
                ],
            ),
        ),
        *txn(
            567,
            dml_line(
                "public.customers",
                "UPDATE",
                [
                    ("id", "integer", 1),
                    ("first_name", "text", "Hello"),
                    ("last_name", "text", "Friends"),
                ],
            ),
        ),
        *txn(568, dml_line("public.customers", "DELETE", [("id", "integer", 2)])),
        *txn(
            569,
            dml_line(
                "public.products",
                "INSERT",
                [("id", "integer", 1), ("name", "text", "widget 1"), ("sku", "integer", None)],
            ),
        ),
        *txn(
            570,
            dml_line(
                "public.products",
                "UPDATE",
                [("id", "integer", 1), ("name", "text", "widget 1"), ("sku", "integer", 42)],
                old_columns=[
                    ("id", "integer", 1),
                    ("name", "text", "widget 1"),
                    ("sku", "integer", None),
                ],
            ),
        ),
        *txn(
            571,
            dml_line(
                "public.products",
                "UPDATE",
                [("id", "integer", 1), ("name", "text", "widget 1"), ("sku", "integer", None)],
                old_columns=[
                    ("id", "integer", 1),
                    ("name", "text", "widget 1"),
                    ("sku", "integer", 42),
                ],
            ),
        ),
    ]


def test_basic_crud_matches_reference_golden(spark):
    got = normalize(run(spark, basic_ops(), no_marshal_old_value=False))
    assert got == load_golden("basic.ndjson")


def test_truncate_matches_reference_golden(spark):
    ops = [
        *txn(600, CUSTOMERS_INSERT_1),
        *txn(601, "table public.customers: TRUNCATE: (no-flags)"),
        *txn(602, "table public.customers, public.orders: TRUNCATE: cascade"),
    ]
    got = normalize(run(spark, ops, no_marshal_old_value=False))
    assert got == load_golden("truncate.ndjson")


TOAST_BIG = "x" * 4000


def toast_ops():
    """Mirrors itests/tests/base/test_toasted input: REPLICA IDENTITY
    default first (no old-key), then FULL (old-key present)."""
    return [
        *txn(
            700,
            dml_line(
                "public.toast_test",
                "INSERT",
                [("id", "integer", 1), ("value", "text", TOAST_BIG), ("ivalue", "integer", 1)],
            ),
        ),
        # UPDATE of non-TOAST column; REPLICA IDENTITY default → no old-key,
        # TOAST column not resent.
        *txn(
            701,
            "table public.toast_test: UPDATE: id[integer]:1 "
            "value[text]:unchanged-toast-datum ivalue[integer]:2",
        ),
        # REPLICA IDENTITY FULL → old-key carries everything.
        *txn(
            702,
            "table public.toast_test: UPDATE: "
            "old-key: id[integer]:1 value[text]:'" + TOAST_BIG + "' ivalue[integer]:2 "
            "new-tuple: id[integer]:1 value[text]:unchanged-toast-datum ivalue[integer]:3",
        ),
    ]


@pytest.mark.parametrize("no_marshal", [True, False])
def test_toast_semantics(spark, no_marshal):
    got = {
        (d["operation"], d["columns"]["ivalue"]["new"]["v"]): d
        for d in normalize(run(spark, toast_ops(), no_marshal_old_value=no_marshal))
    }
    assert len(got) == 3

    # Replica-identity-default UPDATE: TOAST branch requires an old value;
    # without one the sentinel rides through as data (and with old values
    # kept, gets a synthesized old NULL) — exact reference branch order.
    upd1 = got[("UPDATE", "2")]
    assert upd1["columns"]["value"]["new"]["v"] == "unchanged-toast-datum"
    if no_marshal:
        assert "old" not in upd1["columns"]["value"]
    else:
        assert upd1["columns"]["value"]["old"]["v"] == "null"

    # REPLICA IDENTITY FULL: sentinel replaced by the old value.
    upd2 = got[("UPDATE", "3")]
    assert upd2["columns"]["value"]["new"]["v"] == TOAST_BIG
    if no_marshal:
        assert "old" not in upd2["columns"]["value"]
        assert "old" not in upd2["columns"]["ivalue"]
    else:
        assert upd2["columns"]["value"]["old"]["v"] == TOAST_BIG
        assert upd2["columns"]["ivalue"]["old"]["v"] == "2"
    # unchanged PK column: new-only either way
    assert "old" not in upd2["columns"]["id"]


def test_whitelist_blacklist(spark):
    ops = [
        *txn(800, dml_line("public.customers", "INSERT", [("id", "integer", 1)])),
        *txn(801, dml_line("public.inventory", "INSERT", [("id", "integer", 1)])),
        *txn(802, dml_line("public.passwords", "INSERT", [("id", "integer", 1)])),
    ]
    wl = run(spark, ops, whitelist=["public.customers", "public.inventory"])
    assert sorted(json.loads(r)["table"] for r in wl) == ["public.customers", "public.inventory"]
    bl = run(spark, ops, blacklist=["public.passwords"])
    assert sorted(json.loads(r)["table"] for r in bl) == ["public.customers", "public.inventory"]
    rx = run(spark, ops, whitelist=["public\\.(customers|inventory)"], whitelist_regex=True)
    assert len(rx) == 2


def test_partition_methods(spark):
    import zlib

    ops = [
        *txn(900, dml_line("public.a", "INSERT", [("id", "integer", 1)])),
        *txn(901, dml_line("public.b", "INSERT", [("id", "integer", 2)])),
    ]

    def keys(method, buckets=1):
        df = raw_lines_df(spark, ops_to_raw_lines(ops))
        out = data_messages(
            run_pipeline(df, PipelineConfig(partition_method=method, partition_buckets=buckets))
        )
        return [(r.table, r.transaction, r.partition_key) for r in out.collect()]

    assert all(k == "" for _, _, k in keys("none"))
    assert all(k == t for t, _, k in keys("tablename"))
    assert all(k == x for _, x, k in keys("transaction"))
    # crc32_ieee(xid) % buckets — bit-identical to utils.QuickHash
    for _, x, k in keys("transaction-bucket", buckets=7):
        assert int(k) == zlib.crc32(x.encode()) % 7


def test_control_rows_have_no_payload(spark):
    df = raw_lines_df(spark, ops_to_raw_lines(txn(950, CUSTOMERS_INSERT_1)))
    rows = run_pipeline(df, PipelineConfig()).collect()
    ops = {r.operation: r.json for r in rows}
    assert ops["BEGIN"] is None and ops["COMMIT"] is None and ops["INSERT"] is not None
    # transaction assembly stamped the xid everywhere
    assert all(r.transaction == "950" for r in rows)
