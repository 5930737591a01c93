"""Unit tests for the test_decoding parser — mirrors the behaviors the
reference asserts (parselogical tests + marshaller/filter test inputs)."""

from pg_bifrost_spark.cdc.parser import parse_line


def test_begin_commit():
    pr = parse_line("BEGIN 565")
    assert pr.operation == "BEGIN" and pr.transaction == "565" and pr.error is None
    pr = parse_line("COMMIT 565")
    assert pr.operation == "COMMIT" and pr.transaction == "565"


def test_insert_basic():
    pr = parse_line(
        "table public.customers: INSERT: id[integer]:1 first_name[text]:'Hello' last_name[text]:'World'"
    )
    assert pr.error is None
    assert pr.relation == "public.customers"
    assert pr.operation == "INSERT"
    assert pr.columns["id"] == ("1", "integer", False)
    assert pr.columns["first_name"] == ("Hello", "text", True)
    assert pr.old_columns == {}


def test_null_value_unquoted():
    pr = parse_line("table public.products: INSERT: id[integer]:1 sku[integer]:null")
    assert pr.columns["sku"] == ("null", "integer", False)


def test_quote_escape():
    pr = parse_line("table public.t: INSERT: v[text]:'it''s ''quoted'''")
    assert pr.columns["v"] == ("it's 'quoted'", "text", True)


def test_quoted_value_with_spaces_and_colons():
    pr = parse_line("table public.t: INSERT: v[text]:'a b: c [x]' w[integer]:2")
    assert pr.columns["v"] == ("a b: c [x]", "text", True)
    assert pr.columns["w"] == ("2", "integer", False)


def test_update_with_old_key():
    pr = parse_line(
        "table public.products: UPDATE: old-key: id[integer]:1 sku[integer]:null "
        "new-tuple: id[integer]:1 sku[integer]:42"
    )
    assert pr.old_columns["sku"] == ("null", "integer", False)
    assert pr.columns["sku"] == ("42", "integer", False)


def test_delete_no_tuple_data():
    pr = parse_line("table public.t: DELETE: (no-tuple-data)")
    assert pr.no_tuple_data is True
    assert pr.columns == {}


def test_truncate_variants():
    for line, rel in [
        ("table public.customers: TRUNCATE: (no-flags)", "public.customers"),
        ("table public.customers: TRUNCATE: restart_seqs", "public.customers"),
        (
            "table public.customers, public.orders: TRUNCATE: cascade",
            "public.customers, public.orders",
        ),
    ]:
        pr = parse_line(line)
        assert pr.error is None
        assert pr.operation == "TRUNCATE"
        assert pr.relation == rel
        assert pr.columns == {}


def test_array_type():
    pr = parse_line("table public.t: INSERT: tags[integer[]]:'{1,2}'")
    assert pr.columns["tags"] == ("{1,2}", "integer[]", True)


def test_character_varying_type():
    pr = parse_line("table public.t: INSERT: name[character varying]:'x'")
    assert pr.columns["name"] == ("x", "character varying", True)


def test_quoted_identifier():
    pr = parse_line('table "MySchema"."My Table": INSERT: id[integer]:1')
    assert pr.relation == '"MySchema"."My Table"'
    assert pr.columns["id"] == ("1", "integer", False)


def test_toast_sentinel():
    pr = parse_line(
        "table public.toast_test: UPDATE: old-key: id[integer]:1 value[text]:'big' "
        "new-tuple: id[integer]:1 value[text]:unchanged-toast-datum"
    )
    assert pr.columns["value"] == ("unchanged-toast-datum", "text", False)
    assert pr.old_columns["value"] == ("big", "text", True)


def test_malformed_messages_error_not_raise():
    for bad in ["xx", "BEGIN", "BEGIN 1 2", "garbage message", "table a:b: INSERT: x[int]:1"]:
        pr = parse_line(bad)
        assert pr.error is not None, bad
