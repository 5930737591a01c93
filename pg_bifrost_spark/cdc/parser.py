"""Parser for PostgreSQL ``test_decoding`` logical-decoding text.

Grammar (semantics match the reference parser,
``parselogical/parselogical.go:81-290`` — independently re-implemented
as a token scanner rather than a char-state machine):

    line     := 'BEGIN <xid>' | 'COMMIT <xid>'
              | 'table ' relation ': ' operation ':' body
    relation := dotted identifiers; '"' quoting with '""' escape; a
                TRUNCATE may carry a comma-joined relation list
    body     := ' (no-tuple-data)'
              | { section | column }*
    section  := 'old-key:' | 'new-tuple:'      (switches target map)
    column   := name '[' type ']' ':' value    (type may contain '[]')
    value    := bare-token | "'" text "'"      ("''" unescapes to "'")

Special sentinel values ride through as data: unquoted ``null`` is SQL
NULL; ``unchanged-toast-datum`` is a TOAST column that was not resent
(``marshaller/marshaller.go:276-283``).

This is the one genuinely Python piece of the CDC hot path (quote rules
make regexes insufficient); it runs vectorized under ``mapInPandas`` —
Arrow batches in, Arrow batches out — so the per-row cost is a pure
C-like scan with no Spark serialization overhead beyond Arrow.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

__all__ = ["ParsedMessage", "parse_line", "parse_lines_to_pandas", "PARSED_SCHEMA_DDL"]


@dataclass
class ParsedMessage:
    operation: str | None = None
    relation: str | None = None
    transaction: str | None = None  # xid, only on BEGIN/COMMIT
    no_tuple_data: bool = False
    # name -> (value, type, quoted)
    columns: dict[str, tuple[str, str, bool]] = field(default_factory=dict)
    old_columns: dict[str, tuple[str, str, bool]] = field(default_factory=dict)
    error: str | None = None


class _Scanner:
    __slots__ = ("s", "i", "n")

    def __init__(self, s: str) -> None:
        self.s = s
        self.i = 0
        self.n = len(s)

    def eof(self) -> bool:
        return self.i >= self.n

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else "\0"

    def until_colon_space(self) -> str:
        """Consume up to the next ': ' that is outside double quotes;
        returns the consumed text (quotes preserved verbatim, as the
        reference does for relation/operation tokens)."""
        s, i, n = self.s, self.i, self.n
        start = i
        while i < n:
            c = s[i]
            if c == '"':
                i += 1
                while i < n:
                    if s[i] == '"':
                        if i + 1 < n and s[i + 1] == '"':
                            i += 2
                            continue
                        break
                    i += 1
            elif c == ":":
                if i + 1 >= n or s[i + 1] != " ":
                    raise ValueError(f"invalid character after ':' at {i + 1}")
                token = s[start:i]
                self.i = i + 2
                return token
            i += 1
        raise ValueError(f"expected ': ' delimiter after offset {start}")

    def column_name(self) -> str:
        """Consume a column name up to '['; honors '"' quoting."""
        s, i, n = self.s, self.i, self.n
        start = i
        while i < n:
            c = s[i]
            if c == '"':
                i += 1
                while i < n:
                    if s[i] == '"':
                        if i + 1 < n and s[i + 1] == '"':
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "[":
                self.i = i + 1
                return s[start:i]
            i += 1
        raise ValueError(f"expected '[' after column name at offset {start}")

    def column_type(self) -> str:
        """Consume a type up to the ']' that is followed by ':'; allows
        one level of nested '[]' (array types) and '"' quoting."""
        s, i, n = self.s, self.i, self.n
        start = i
        while i < n:
            c = s[i]
            if c == '"':
                i += 1
                while i < n and s[i] != '"':
                    i += 1
            elif c == "[":
                i += 1
                while i < n and s[i] != "]":
                    i += 1
            elif c == "]":
                if i + 1 >= n or s[i + 1] != ":":
                    raise ValueError(f"expected ':' after ']' at offset {i}")
                token = s[start:i]
                self.i = i + 2
                return token
            i += 1
        raise ValueError(f"unterminated type at offset {start}")

    def value(self) -> tuple[str, bool]:
        """Consume a value token; returns (unescaped_value, quoted)."""
        s, i, n = self.s, self.i, self.n
        if i < n and s[i] == "'":
            i += 1
            start = i
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    raw = s[start:i]
                    self.i = i + 1
                    if self.i < n:
                        if s[self.i] != " ":
                            raise ValueError(f"expected space after quoted value at {self.i}")
                        self.i += 1
                    return raw.replace("''", "'"), True
                i += 1
            raise ValueError(f"unterminated quoted value at offset {start}")
        start = i
        while i < n and s[i] != " ":
            i += 1
        token = s[start:i]
        self.i = i + 1 if i < n else i
        return token, False


def parse_line(line: str) -> ParsedMessage:
    """Parse one test_decoding line. Never raises: malformed input is
    reported via ``ParsedMessage.error`` (the reference counts and
    drops invalid messages, ``replication/client/client.go:470-482``)."""
    pr = ParsedMessage()
    try:
        if len(line) < 5:
            raise ValueError(f"message too short: {line!r}")
        if line.startswith(("BEGIN", "COMMIT")):
            parts = line.split()
            if len(parts) != 2:
                raise ValueError(f"unknown transaction message: {line!r}")
            pr.operation, pr.transaction = parts[0], parts[1]
            return pr
        if not line.startswith("table "):
            raise ValueError(f"unknown logical message: {line[:40]!r}")

        sc = _Scanner(line)
        sc.i = 6  # len("table ")
        pr.relation = sc.until_colon_space()
        # operation token ends at ':'; TRUNCATE is terminal (no columns)
        s, j = sc.s, sc.i
        k = s.find(":", j)
        if k < 0:
            raise ValueError("missing operation terminator")
        pr.operation = s[j:k]
        if k + 1 >= len(s) or s[k + 1] != " ":
            raise ValueError(f"invalid character after operation at {k + 1}")
        if pr.operation == "TRUNCATE":
            return pr
        sc.i = k + 2

        target = pr.columns
        while not sc.eof():
            rest = sc.s[sc.i :]
            if rest == "(no-tuple-data)":
                pr.no_tuple_data = True
                return pr
            if rest.startswith("old-key:"):
                target = pr.old_columns
                sc.i += len("old-key: ")
                continue
            if rest.startswith("new-tuple:"):
                target = pr.columns
                sc.i += len("new-tuple: ")
                continue
            name = sc.column_name()
            ctype = sc.column_type()
            val, quoted = sc.value()
            target[name] = (val, ctype, quoted)
        return pr
    except ValueError as exc:
        pr.error = str(exc)
        return pr


# Output schema of the vectorized parse stage (DDL form for mapInPandas).
PARSED_SCHEMA_DDL = (
    "wal_start bigint, server_wal_end bigint, server_time_ms bigint, "
    "stream_id int, "
    "operation string, relation string, txn_xid string, no_tuple_data boolean, "
    "columns map<string, struct<v: string, t: string, q: boolean>>, "
    "old_columns map<string, struct<v: string, t: string, q: boolean>>, "
    "parse_error string"
)

# Variant for sources that already assembled transactions (the
# streaming pgcdc reader stamps txn_id/time_based_key sequentially,
# like the reference client): those two columns pass through the parse.
PARSED_ASSEMBLED_SCHEMA_DDL = PARSED_SCHEMA_DDL + ", txn_id string, time_based_key string"


def parse_lines_to_pandas(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """``mapInPandas`` kernel: input batches with columns
    (wal_start, server_wal_end, server_time_ms, line) → PARSED_SCHEMA_DDL.

    Map columns are emitted as plain dicts (what PySpark's Arrow
    conversion expects for ``MapType``).
    """
    import pandas as pd

    for pdf in batches:
        out: dict[str, list] = {
            "wal_start": pdf["wal_start"].tolist(),
            "server_wal_end": pdf["server_wal_end"].tolist(),
            "server_time_ms": pdf["server_time_ms"].tolist(),
            "stream_id": pdf["stream_id"].tolist(),
            "operation": [],
            "relation": [],
            "txn_xid": [],
            "no_tuple_data": [],
            "columns": [],
            "old_columns": [],
            "parse_error": [],
        }
        # pre-assembled txn columns (streaming source) pass through
        for passthrough in ("txn_id", "time_based_key"):
            if passthrough in pdf.columns:
                out[passthrough] = pdf[passthrough].tolist()
        app_op = out["operation"].append
        app_rel = out["relation"].append
        app_txn = out["txn_xid"].append
        app_ntd = out["no_tuple_data"].append
        app_cols = out["columns"].append
        app_old = out["old_columns"].append
        app_err = out["parse_error"].append

        def as_map(d: dict[str, tuple[str, str, bool]]):
            return {k: {"v": v, "t": t, "q": q} for k, (v, t, q) in d.items()}

        for line in pdf["line"]:
            pr = parse_line(line)
            app_op(pr.operation)
            app_rel(pr.relation)
            app_txn(pr.transaction)
            app_ntd(pr.no_tuple_data)
            app_cols(as_map(pr.columns))
            app_old(as_map(pr.old_columns))
            app_err(pr.error)
        yield pd.DataFrame(out)
