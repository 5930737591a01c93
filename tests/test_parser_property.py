"""Property-based tests: any value/type/name rendered to
test_decoding text must parse back exactly (the parser and the fixture
renderer are independent implementations of the same grammar)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pg_bifrost_spark.cdc.fixtures import dml_line, fmt_value
from pg_bifrost_spark.cdc.parser import parse_line

# printable text without NUL; quotes and spaces very much included
text_values = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=60
)
int_values = st.integers(min_value=-(2**62), max_value=2**62)
col_names = st.from_regex(r"[a-z][a-z0-9_]{0,20}", fullmatch=True)


@settings(max_examples=300, deadline=None)
@given(
    cols=st.dictionaries(
        col_names,
        st.one_of(text_values, int_values, st.none()),
        min_size=1,
        max_size=6,
    )
)
def test_roundtrip_insert(cols):
    spec = [
        (name, "text" if isinstance(v, str) else "bigint", v) for name, v in cols.items()
    ]
    line = dml_line("public.fuzz", "INSERT", spec)
    pr = parse_line(line)
    assert pr.error is None, f"{line!r} -> {pr.error}"
    assert pr.relation == "public.fuzz"
    assert pr.operation == "INSERT"
    assert set(pr.columns) == set(cols)
    for name, v in cols.items():
        got_v, got_t, got_q = pr.columns[name]
        if v is None:
            assert (got_v, got_q) == ("null", False)
        elif isinstance(v, str):
            assert got_v == v and got_q is True and got_t == "text"
        else:
            assert got_v == str(v) and got_q is False and got_t == "bigint"


@settings(max_examples=200, deadline=None)
@given(old=st.dictionaries(col_names, text_values, min_size=1, max_size=3),
       new=st.dictionaries(col_names, text_values, min_size=1, max_size=3))
def test_roundtrip_update_with_old_key(old, new):
    line = dml_line(
        "public.fuzz",
        "UPDATE",
        [(k, "text", v) for k, v in new.items()],
        old_columns=[(k, "text", v) for k, v in old.items()],
    )
    pr = parse_line(line)
    assert pr.error is None
    assert {k: c[0] for k, c in pr.old_columns.items()} == old
    assert {k: c[0] for k, c in pr.columns.items()} == new


@settings(max_examples=200, deadline=None)
@given(v=text_values)
def test_fmt_value_quote_escaping(v):
    rendered = fmt_value(v, "text")
    pr = parse_line(f"table public.t: INSERT: c[text]:{rendered}")
    assert pr.error is None
    assert pr.columns["c"] == (v, "text", True)
