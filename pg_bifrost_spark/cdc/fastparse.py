"""JVM fast path for ``test_decoding`` DML lines.

The Python scanner (``parser.py``) is the semantic reference — it
handles every corner of the grammar (quoted relations, ``""`` escapes
in identifiers, arbitrary junk) and reports malformed lines instead of
raising. But it walks every character in Python, and on the hot CDC
path that is the single largest cost in the whole engine.

This module parses the COMMON case — unquoted relation, simple column
names, types like ``bigint`` / ``double precision`` /
``character varying(255)`` / ``integer[]``, quoted-or-bare values —
entirely with Spark SQL expressions, inside whole-stage codegen:

    eligibility:  one anchored regex full-match over the line
    tokenize:     ``regexp_extract_all`` — yields column tokens AND the
                  ``old-key:`` / ``new-tuple:`` section markers in
                  left-to-right order (a quoted value containing the
                  marker text is consumed INSIDE its token, so it can
                  never be mistaken for a real marker)
    fold:         ``transform`` parses each token, then one
                  ``aggregate`` builds the columns / old_columns maps,
                  switching target on the markers — exactly the
                  scanner's loop, declaratively

Lines that fail the eligibility regex (quoted identifiers, TRUNCATE,
malformed input) fall through to the Python scanner, which remains the
arbiter of the full grammar. Equivalence of the two paths on eligible
lines is pinned by ``tests/test_fastparse.py`` over an adversarial
corpus (quoted values with spaces, ``''`` escapes, ``]:`` inside
values, marker text inside values, NULL and TOAST sentinels).

All repeated quantifiers in the regexes are possessive (Java regex) —
every alternation is first-character-disjoint, so possessive matching
is both safe and linear-time: no backtracking blowup on adversarial
input, eligible or not.

Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by the session
helpers) so a duplicate column name keeps the scanner's last-wins dict
semantics instead of raising mid-job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fast_eligible", "jvm_parseable", "jvm_parse", "ELIGIBLE_RE", "TOKEN_RE"]

# Grammar fragments (Java regex, possessive quantifiers).
_NAME = r"[A-Za-z_][A-Za-z0-9_$]*+"
# bigint | double precision | character varying(255) | numeric(10, 2) | integer[]
_TYPE = r"[A-Za-z_][A-Za-z0-9_ ]*+(?:\([0-9, ]++\))?+(?:\[\])?+"
# quoted value with '' escapes, or a bare token (null, 42, -3.14, the
# TOAST sentinel). Bare tokens never contain quotes on the fast path —
# a mid-token quote makes the line ineligible and routes it to Python.
_VAL = r"(?:'(?:[^']++|'')*+'|[^ ']++)"
_COL = rf"{_NAME}\[{_TYPE}\]:{_VAL}"

# One column-or-marker token, scanned left to right over the body.
TOKEN_RE = rf"old-key:|new-tuple:|{_COL}"

# Anchored full-line eligibility: if this matches, the tokenizer above
# consumes the body exactly — nothing can be silently skipped.
_BODY = (
    rf"(?:\(no-tuple-data\)"
    rf"|(?:old-key: |new-tuple: )?+{_COL}(?: (?:old-key:|new-tuple:|{_COL}))*+)"
)
ELIGIBLE_RE = rf"^table ({_NAME}(?:\.{_NAME})*+): (INSERT|UPDATE|DELETE): {_BODY}$"

_COLMAP_T = "map<string,struct<v:string,t:string,q:boolean>>"


def fast_eligible(line: Column) -> Column:
    """True when ``line`` is parseable by the JVM fast path."""
    return line.rlike(ELIGIBLE_RE)


def _parse_token(tk: Column) -> Column:
    """One token → struct(marker, name, entry) — marker 1/2 for the
    section switches, 0 for a real column."""
    prefix = F.regexp_extract(tk, rf"^([^\[]++\[{_TYPE}\]:)", 1)
    raw = tk.substr(F.length(prefix) + 1, F.length(tk))
    quoted = raw.startswith("'")
    value = F.when(
        quoted,
        F.regexp_replace(raw.substr(F.lit(2), F.length(raw) - 2), "''", "'"),
    ).otherwise(raw)
    marker = (
        F.when(tk == "old-key:", 1).when(tk == "new-tuple:", 2).otherwise(0)
    )
    return F.struct(
        marker.alias("marker"),
        F.regexp_extract(tk, r"^([^\[]++)\[", 1).alias("name"),
        F.struct(
            value.alias("v"),
            F.regexp_extract(tk, rf"^[^\[]++\[({_TYPE})\]:", 1).alias("t"),
            quoted.alias("q"),
        ).alias("entry"),
    )


def _fold(parsed_tokens: Column) -> Column:
    """Fold parsed tokens into struct(cols, old) maps, switching the
    insertion target on the section markers."""
    empty = F.expr(f"cast(map() as {_COLMAP_T})")
    init = F.struct(
        empty.alias("cols"), empty.alias("old"), F.lit(True).alias("to_new")
    )

    def merge(acc: Column, p: Column) -> Column:
        entry = F.create_map(p["name"], p["entry"])
        is_col = p["marker"] == 0
        return F.struct(
            F.when(is_col & acc["to_new"], F.map_concat(acc["cols"], entry))
            .otherwise(acc["cols"])
            .alias("cols"),
            F.when(is_col & ~acc["to_new"], F.map_concat(acc["old"], entry))
            .otherwise(acc["old"])
            .alias("old"),
            F.when(p["marker"] == 1, F.lit(False))
            .when(p["marker"] == 2, F.lit(True))
            .otherwise(acc["to_new"])
            .alias("to_new"),
        )

    return F.aggregate(
        parsed_tokens,
        init,
        merge,
        lambda acc: F.struct(acc["cols"].alias("cols"), acc["old"].alias("old")),
    )


def _is_control(line: Column) -> Column:
    """Strict two-token BEGIN/COMMIT check (non-strict control-ish
    lines fall through to the Python parser's error accounting)."""
    tokens = F.split(line, " ")
    return (
        line.startswith("BEGIN ") | line.startswith("COMMIT ")
    ) & (F.size(tokens) == 2)


def jvm_parseable(line: Column) -> Column:
    """True when the line never needs the Python scanner: a strict
    control line or a fast-path-eligible DML line."""
    return _is_control(line) | fast_eligible(line)


def jvm_parse(df: DataFrame, passthrough: list[str] = ()) -> DataFrame:
    """Parse a DataFrame of JVM-PARSEABLE raw lines (RAW_LINE_SCHEMA
    [+ passthrough txn columns]) into the Python parser's output schema
    (PARSED_SCHEMA_DDL order, incl. txn_xid — callers on the assembled
    path drop it). Entirely JVM expressions inside whole-stage codegen:
    one regex tokenize + one fold per DML line, two string ops per
    control line."""
    line = F.col("line")
    ctrl_tokens = F.split(line, " ")
    is_ctrl = _is_control(line)
    body = F.regexp_extract(line, r"^table [^:]++: [A-Z]++: (.*+)$", 1)
    tokens = F.regexp_extract_all(body, F.lit(TOKEN_RE), F.lit(0))
    folded = _fold(F.transform(tokens, _parse_token))
    # control rows carry EMPTY maps — byte-equal to the Python
    # parser's output for BEGIN/COMMIT (empty dicts, not NULL)
    empty_map = F.expr(f"cast(map() as {_COLMAP_T})")
    # The fold feeds BOTH output maps. aggregate() is codegen-fallback
    # (no common-subexpression elimination), so referencing it twice in
    # one projection runs the whole fold twice per line — measured 2.2×
    # slower. Materialize it ONCE in a first projection, split after.
    staged = df.select(
        "wal_start",
        "server_wal_end",
        "server_time_ms",
        "stream_id",
        line.alias("line"),
        F.when(is_ctrl, F.lit(None)).otherwise(folded).alias("_folded"),
        *passthrough,
    )
    is_ctrl2 = _is_control(F.col("line"))
    return staged.select(
        "wal_start",
        "server_wal_end",
        "server_time_ms",
        "stream_id",
        F.when(is_ctrl2, F.element_at(F.split("line", " "), 1))
        .otherwise(
            F.regexp_extract("line", r"^table [^:]++: (INSERT|UPDATE|DELETE):", 1)
        )
        .alias("operation"),
        F.when(is_ctrl2, F.lit(None).cast("string"))
        .otherwise(F.regexp_extract("line", r"^table ([^:]++): ", 1))
        .alias("relation"),
        F.when(is_ctrl2, F.element_at(F.split("line", " "), 2))
        .otherwise(F.lit(None).cast("string"))
        .alias("txn_xid"),
        (~is_ctrl2 & F.col("line").endswith(": (no-tuple-data)")).alias("no_tuple_data"),
        F.coalesce(F.col("_folded.cols"), empty_map).alias("columns"),
        F.coalesce(F.col("_folded.old"), empty_map).alias("old_columns"),
        F.lit(None).cast("string").alias("parse_error"),
        *passthrough,
    )
