"""pgoutput logical-decoding support: decode the in-core binary plugin
into the engine's canonical event form (test_decoding text lines).

The reference consumes ONLY the ``test_decoding`` plugin
(``utils/utils.go:50`` hardcodes the plugin name), which Postgres ships
as a demo and whose text output costs a render+reparse on every change.
Real deployments run ``pgoutput`` — the in-core plugin behind native
logical replication (``CREATE PUBLICATION``/``CREATE SUBSCRIPTION``) —
so a drop-in engine must speak it. Message layout follows the public
PostgreSQL protocol documentation (protocol-logicalrep-message-formats;
Begin 'B', Commit 'C', Origin 'O', Relation 'R', Type 'Y', Insert 'I',
Update 'U', Delete 'D', Truncate 'T', Message 'M', and TupleData cell
kinds 'n'/'u'/'t'/'b').

Design: the decoder CANONICALIZES each binary frame into the exact
test_decoding line the rest of the engine already parses, filters,
partitions and marshals (``cdc/parser.py`` grammar; rendering shares
``cdc/fixtures.py``'s quoting rule, itself derived from test_decoding's
own output). That keeps ONE downstream pipeline for both plugins — the
same envelopes, goldens, filters and sinks — instead of a parallel
binary path that could drift. The render+parse round trip costs O(line)
once per change in the sequential reader, the same place transaction
assembly already runs; all heavy lifting stays in executors either way.

Statefulness: pgoutput tuples carry NO column metadata — a Relation
('R') frame declares (name, type-oid, typmod) per column and is re-sent
whenever the schema changes. The decoder keeps that registry per
connection, exactly like the transaction-assembly state the protocol
already forces into the sequential reader (client.go:487-545 analog);
the downstream stays schema-registry-free because every canonical line
is self-describing.

Hardening (repo standard, same class as the MP4/JPEG kernels): every
declared count/length is validated against the remaining buffer BEFORE
any allocation or loop, so a tampered 0xFFFFFFFF column count degrades
to ``PgOutputError`` (callers count + drop — the reference's own
response to undecodable frames, client.go:470-482), never a 4-billion
iteration loop; a fuzz property pins "arbitrary bytes never raise
anything but PgOutputError" (tests/test_pgoutput.py).
"""

from __future__ import annotations

import re
import struct
from collections import Counter
from dataclasses import dataclass, field

__all__ = [
    "PgOutputError",
    "PgOutputDecoder",
    "Relation",
    "type_name",
    "encode_begin",
    "encode_commit",
    "encode_relation",
    "encode_insert",
    "encode_update",
    "encode_delete",
    "encode_truncate",
    "encode_origin",
    "encode_logical_message",
    "encode_begin_prepare",
    "encode_prepare",
    "encode_commit_prepared",
    "encode_rollback_prepared",
    "encode_stream_prepare",
]


class PgOutputError(ValueError):
    """Malformed pgoutput frame (truncated, bad declared count, unknown
    message/cell kind). Callers drop the frame and count it."""


class PgOutputOverflow(PgOutputError):
    """A streamed transaction exceeded ``max_streamed_lines``. MUST
    surface to the caller (never drop-and-count like a malformed
    frame): emitting or skipping a silently truncated transaction is
    the data-loss class this engine refuses — the conn adapter
    re-raises it so the streaming query fails loudly with the cap in
    the message (code-review r10-late #3)."""


# ---------------------------------------------------------------------------
# Type-OID rendering (pg_catalog OIDs are stable public ABI)
# ---------------------------------------------------------------------------
_TYPE_NAMES: dict[int, str] = {
    16: "boolean",
    17: "bytea",
    18: "char",
    19: "name",
    20: "bigint",
    21: "smallint",
    23: "integer",
    25: "text",
    26: "oid",
    114: "json",
    700: "real",
    701: "double precision",
    1042: "character",
    1043: "character varying",
    1082: "date",
    1083: "time without time zone",
    1114: "timestamp without time zone",
    1184: "timestamp with time zone",
    1186: "interval",
    1266: "time with time zone",
    1700: "numeric",
    2950: "uuid",
    3802: "jsonb",
    # common array types (test_decoding renders them with [] suffix)
    1000: "boolean[]",
    1005: "smallint[]",
    1007: "integer[]",
    1009: "text[]",
    1016: "bigint[]",
    1015: "character varying[]",
    1021: "real[]",
    1022: "double precision[]",
    1231: "numeric[]",
}

_TYPMOD_TYPES = {1042, 1043}  # character(n) / character varying(n)

# Types whose PG text output can never need quoting in a canonical
# line (no spaces/quotes in any value). EVERYTHING else is quoted:
# bpchar is ALWAYS space-padded ('ab' arrives as 'ab        '),
# interval renders '1 day', json/jsonb and arrays embed arbitrary
# text — an unquoted space-containing cell corrupts the line and the
# parser then drops the WHOLE row as a parse error, i.e. silent data
# loss on the pgoutput path (code-review r10-late #1, reproduced).
# The fixture generator's narrower _QUOTED_PG_TYPES list is a
# rendering choice for its OWN known-safe values; the decoder cannot
# assume that about arbitrary server data, so it quotes defensively —
# the parser strips quotes, so downstream values are identical either
# way.
_UNQUOTED_TYPE_PREFIXES = (
    "smallint",
    "integer",
    "bigint",
    "real",
    "double precision",
    "numeric",
    "boolean",
    "bytea",  # \xHEX — no spaces or quotes by construction
)


def _render_value(v: object, type_name_str: str, force_quote: bool = False) -> str:
    if v is None:
        return "null"
    s = str(v)
    # array types ('integer[]') share the scalar prefix but their text
    # form ('{"a b",...}') can embed anything — always quoted. 'oid'
    # must be an EXACT match: unknown OIDs render as 'oid:<n>' and
    # their values are arbitrary — prefix-matching them unquoted would
    # reintroduce the data-loss bug for every unmapped type. The same
    # goes for Type-registry names: the whitelist below is matched by
    # PREFIX (numeric(10,2) etc.), so a custom type whose rendered
    # name merely STARTS like a numeric builtin ('realtime.citext' vs
    # 'real') must never reach it — callers pass force_quote=True for
    # every non-builtin OID (code-review r10-late-2 #1, reproduced:
    # an unquoted space-bearing value desyncs the line and the parser
    # drops the whole row).
    if force_quote:
        return "'" + s.replace("'", "''") + "'"
    if type_name_str == "oid" or (
        "[" not in type_name_str
        and any(type_name_str.startswith(p) for p in _UNQUOTED_TYPE_PREFIXES)
    ):
        return s
    return "'" + s.replace("'", "''") + "'"


def type_name(oid: int, typmod: int = -1, custom: dict[int, str] | None = None) -> str:
    """Postgres type-OID → the name test_decoding renders inside
    ``col[type]:`` cells. varchar/bpchar carry their length typmod
    (``character varying(255)``); numeric carries (precision, scale).
    ``custom`` is a decoder's Type-message ('Y') registry: names the
    SERVER declared for non-builtin types, rendered namespace-
    qualified (``public.citext``). Quoting safety does NOT come from
    the qualifier (the whitelist is prefix-matched, and a schema named
    'realtime' would prefix-match 'real') — it comes from the tuple
    decoder passing force_quote for every non-builtin OID. Unknown
    OIDs render as ``oid:<n>`` — still a valid cell type token for the
    parser, and honest about the gap."""
    base = _TYPE_NAMES.get(oid)
    if base is None:
        if custom and oid in custom:
            return custom[oid]
        return f"oid:{oid}"
    if typmod is not None and typmod >= 4:
        if oid in _TYPMOD_TYPES:
            return f"{base}({typmod - 4})"
        if oid == 1700:  # numeric: (precision << 16) | scale, offset 4
            m = typmod - 4
            return f"{base}({(m >> 16) & 0xFFFF},{m & 0xFFFF})"
    return base


# ---------------------------------------------------------------------------
# Bounds-checked binary reader
# ---------------------------------------------------------------------------
class _Reader:
    __slots__ = ("buf", "i")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def _need(self, n: int) -> None:
        if n < 0 or self.i + n > len(self.buf):
            raise PgOutputError(
                f"truncated frame: need {n} bytes at offset {self.i}, "
                f"have {len(self.buf) - self.i}"
            )

    def u8(self) -> int:
        self._need(1)
        v = self.buf[self.i]
        self.i += 1
        return v

    def u16(self) -> int:
        self._need(2)
        (v,) = struct.unpack_from(">H", self.buf, self.i)
        self.i += 2
        return v

    def u32(self) -> int:
        self._need(4)
        (v,) = struct.unpack_from(">I", self.buf, self.i)
        self.i += 4
        return v

    def i32(self) -> int:
        self._need(4)
        (v,) = struct.unpack_from(">i", self.buf, self.i)
        self.i += 4
        return v

    def u64(self) -> int:
        self._need(8)
        (v,) = struct.unpack_from(">Q", self.buf, self.i)
        self.i += 8
        return v

    def take(self, n: int) -> bytes:
        self._need(n)
        v = self.buf[self.i : self.i + n]
        self.i += n
        return v

    def cstr(self) -> str:
        end = self.buf.find(b"\x00", self.i)
        if end < 0:
            raise PgOutputError("unterminated string in frame")
        v = self.buf[self.i : end]
        self.i = end + 1
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError as exc:
            raise PgOutputError(f"non-UTF-8 identifier: {exc}") from None

    def remaining(self) -> int:
        return len(self.buf) - self.i


# ---------------------------------------------------------------------------
# Relation registry
# ---------------------------------------------------------------------------
@dataclass
class Relation:
    namespace: str
    name: str
    replica_identity: int
    # (column name, type oid, typmod, part-of-key flag)
    columns: list[tuple[str, int, int, bool]]

    # Render-plan cache (r12, guide §4.5 heavyweight-init-once): every
    # per-COLUMN constant the tuple decoder used to re-derive per ROW —
    # the rendered type name, the non-builtin force-quote flag, the
    # ``name[type]:`` cell prefix, and the bare-vs-quoted decision
    # (_render_value's prefix whitelist). Keyed on the decoder's Type-
    # registry version: a 'Y' frame can rename a non-builtin oid after
    # this relation was registered, so the plan rebuilds whenever the
    # registry changes (cheap — Type frames are registry-rare).
    _plan: list | None = field(default=None, compare=False, repr=False)
    _plan_version: int = field(default=-1, compare=False, repr=False)

    @property
    def relation(self) -> str:
        # pg_catalog tables arrive with empty namespace per the docs
        return f"{self.namespace or 'pg_catalog'}.{self.name}"

    def cell_types(self) -> list[str]:
        return [type_name(oid, typmod) for _, oid, typmod, _ in self.columns]

    def render_plan(
        self, types: dict[int, str], version: int
    ) -> list[tuple[str, str, bool, str, bool, int]]:
        """Per-column (name, type_str, force_quote, cell_prefix, bare,
        oid) — semantics identical to per-row type_name +
        _render_value (pinned by the goldens and the frame fuzz
        suite).

        OWNERSHIP CONTRACT (ADVICE r12): the cache key is ``version``
        ALONE — the passed ``types`` dict is ignored on a version hit.
        That is only sound because a Relation belongs to exactly ONE
        PgOutputDecoder, whose ``_types_version`` is the single
        monotonic counter for its single ``types`` dict (bumped on
        every 'Y' frame). Do NOT share Relation objects across
        decoders: two decoders with coincidentally equal version
        counters would serve each other stale type names. Each decoder
        builds its own Relation instances from its own 'R' frames, so
        the contract holds for every in-repo caller."""
        if self._plan is None or self._plan_version != version:
            plan = []
            for name, oid, typmod, _key in self.columns:
                t = type_name(oid, typmod, custom=types)
                quote = oid not in _TYPE_NAMES  # non-builtin: always quote
                bare = (not quote) and (
                    t == "oid"
                    or (
                        "[" not in t
                        and any(t.startswith(p) for p in _UNQUOTED_TYPE_PREFIXES)
                    )
                )
                plan.append((name, t, quote, f"{name}[{t}]:", bare, oid))
            self._plan = plan
            self._plan_version = version
        return self._plan


_TOAST = object()  # sentinel: 'u' cell kind (unchanged TOAST datum)


@dataclass(frozen=True)
class LogicalMessage:
    """A decoded 'M' frame (``pg_logical_emit_message``): the generic
    WAL side-channel applications use for markers, schema-migration
    fences, and outbox events. test_decoding only renders these with
    its non-default ``include-message`` option and the reference never
    enables it, so messages do NOT join the canonical line stream —
    they surface through ``PgOutputDecoder.drain_messages()``."""

    transactional: bool
    lsn: int
    prefix: str
    content: bytes
    xid: int | None  # enclosing txn's xid (None for non-transactional)


@dataclass
class PgOutputDecoder:
    """Stateful per-connection decoder: binary pgoutput frame →
    canonical test_decoding line(s), or none for registry/metadata
    frames (Relation / Type / Origin / logical Message) which produce
    no downstream event. xid continuity mirrors the loop's transaction
    stamping: pgoutput's Commit carries no xid, so the decoder renders
    ``COMMIT <xid-of-last-BEGIN>`` exactly as test_decoding does.

    ``proto_version >= 2`` additionally speaks STREAMED in-progress
    transactions (Stream Start 'S' / Stop 'E' / Commit 'c' / Abort
    'A'; data messages inside a stream segment carry a leading xid).
    The decoder does what a real apply worker does: buffer each
    streamed transaction's canonical lines per TOPLEVEL xid (tagged
    with the message's own sub-xid), filter aborted subtransactions
    out on Stream Abort, and on Stream Commit replay the whole
    transaction as ``BEGIN xid … COMMIT xid`` — downstream sees the
    identical sequential shape test_decoding emits, so transaction
    assembly, the ledger and every sink stay stream-agnostic.

    ``max_streamed_lines`` is the memory safety valve: a transaction
    whose buffered lines exceed it raises ``PgOutputError`` at commit
    (LOUD failure, the engine's bomb-guard posture) rather than
    silently truncating — the reference's equal-LSN lesson (VERDICT
    r9) is that silent data loss at a boundary is the worst failure
    mode a CDC path can have. A real deployment sizes it to executor
    memory or spills; the default bounds a runaway txn at ~100 MB of
    line text."""

    relations: dict[int, Relation] = field(default_factory=dict)
    xid: int | None = None
    proto_version: int = 1
    max_streamed_lines: int = 1_000_000
    stats: Counter = field(default_factory=Counter)
    # Type ('Y') registry: non-builtin type names as the server
    # declared them, namespace-qualified (see type_name). The version
    # counter invalidates cached Relation render plans (r12).
    types: dict[int, str] = field(default_factory=dict)
    _types_version: int = 0
    # Logical-message ('M') buffer — bounded, drop-NEWEST with a loud
    # counter (drop-oldest would silently lose the earliest marker,
    # the one a migration fence cares about); drained via
    # drain_messages()
    messages: list[LogicalMessage] = field(default_factory=list)
    max_buffered_messages: int = 10_000
    # Origin filtering: replication-origin names whose transactions
    # are dropped wholesale (loop prevention in bidirectional setups —
    # the client-side mirror of pgoutput's server-side ``origin``
    # option, for slots created without it). Non-empty set switches
    # BEGIN emission to DEFERRED: the Origin frame arrives after
    # Begin, so BEGIN is held until the first surviving DML (or
    # Commit) decides the transaction's fate.
    skip_origins: frozenset[str] = field(default_factory=frozenset)
    last_origin: str | None = None
    _pending_begin: str | None = None
    _skip_txn: bool = False
    # v2 streaming state: current segment's toplevel xid; per-toplevel
    # buffered (sub_xid, line) pairs; toplevels that blew the cap;
    # toplevels whose Origin matched skip_origins (checked at buffer
    # time AND at Stream Commit — streamed transactions are exactly
    # the bulk writes loop prevention exists for, code-review
    # r10-late-2 #2)
    _stream_xid: int | None = None
    _stream_buf: dict[int, list[tuple[int, str]]] = field(default_factory=dict)
    _stream_overflow: set[int] = field(default_factory=set)
    _stream_skip: set[int] = field(default_factory=set)
    # transactional 'M' messages inside a streamed txn are NOT durable
    # until Stream Commit — buffer them per toplevel xid (tagged with
    # the frame's sub-xid) and publish only on commit, exactly like
    # _stream_buf lines. Publishing at decode time would surface
    # fence/outbox markers from transactions that later ABORT
    # (advisor r10 finding: stream_start + transactional M +
    # stream_abort must yield nothing from drain_messages()).
    _stream_msgs: dict[int, list[tuple[int, LogicalMessage]]] = field(
        default_factory=dict
    )
    # two-phase commit state (protocol two_phase option; proto v3 in
    # PG 15, but the frame shapes are version-independent). The engine
    # does what a real apply worker does with prepared transactions:
    # buffer between Begin Prepare ('b') and Prepare ('P'), hold per
    # GID, and replay as BEGIN xid … COMMIT xid at Commit Prepared
    # ('K') — data becomes visible downstream exactly when it becomes
    # durable on the publisher. Rollback Prepared ('r') drops the
    # buffer. Downstream (txn assembly, ledger, sinks) stays
    # two-phase-agnostic, same posture as streamed-txn replay.
    _prepare_gid: str | None = None
    _prepare_buf: list[str] = field(default_factory=list)
    _prepare_msgs: list[LogicalMessage] = field(default_factory=list)
    _prepared: dict[str, tuple[int, list[str]]] = field(default_factory=dict)
    _prepared_msgs: dict[str, list[LogicalMessage]] = field(default_factory=dict)
    _prepared_skip: set[str] = field(default_factory=set)
    _prepared_overflow: set[str] = field(default_factory=set)
    _prepare_overflowed: bool = False

    def drain_messages(self) -> list[LogicalMessage]:
        """Return and clear the buffered 'M' messages (arrival order).
        ``stats['messages_dropped']`` is the CUMULATIVE count of
        messages that overflowed ``max_buffered_messages``."""
        out = self.messages
        self.messages = []
        return out

    # ------------------------------------------------------------ tuples
    def _tuple(
        self, r: _Reader, rel: Relation
    ) -> list[tuple[tuple[str, str, bool, str, bool, int], object]]:
        """Cells as (column render-plan row, decoded value) pairs —
        the per-column constants come from the cached
        ``Relation.render_plan`` instead of being re-derived per row
        (r12; type_name + the quote whitelist were ~25% of decode CPU
        in the offline profile)."""
        ncols = r.u16()
        if ncols > r.remaining():  # every cell costs >= 1 byte
            raise PgOutputError(f"declared {ncols} cells, {r.remaining()} bytes left")
        if ncols != len(rel.columns):
            raise PgOutputError(
                f"tuple has {ncols} cells but relation {rel.relation} "
                f"declares {len(rel.columns)} columns"
            )
        plan = rel.render_plan(self.types, self._types_version)
        cells: list[tuple[tuple[str, str, bool, str, bool, int], object]] = []
        for meta in plan:
            kind = r.take(1)
            if kind == b"n":
                cells.append((meta, None))
            elif kind == b"u":
                cells.append((meta, _TOAST))
            elif kind == b"t":
                n = r.u32()
                raw = r.take(n)
                try:
                    cells.append((meta, raw.decode("utf-8")))
                except UnicodeDecodeError as exc:
                    raise PgOutputError(f"non-UTF-8 text cell: {exc}") from None
            elif kind == b"b":
                # binary cell (server sends only when the subscriber
                # asked for binary mode). Only bytea's binary wire form
                # IS its raw bytes — any other type's binary format
                # (int4 big-endian, numeric digit groups, …) would be
                # silently mis-rendered by hexing, so refuse loudly;
                # the engine never negotiates binary mode, making this
                # a corrupt-stream signal, not a feature gap
                # (advisor r10 finding).
                n = r.u32()
                if meta[5] != 17:
                    raise PgOutputError(
                        f"binary tuple cell for non-bytea column "
                        f"{meta[0]}[{meta[1]}] (oid {meta[5]}) — binary mode was "
                        "never requested and only bytea is hex-renderable"
                    )
                cells.append((meta, "\\x" + r.take(n).hex()))
            else:
                raise PgOutputError(f"unknown tuple cell kind {kind!r}")
        return cells

    @staticmethod
    def _cells_text(
        cells: list[tuple[tuple[str, str, bool, str, bool, int], object]]
    ) -> str:
        """Render cells from their precomputed plan rows — byte-
        identical to the former per-cell type_name + _render_value
        path (which remains the semantic reference for the plan's
        ``bare`` bit)."""
        parts = []
        for meta, v in cells:
            prefix = meta[3]
            if v is _TOAST:
                # test_decoding renders the sentinel unquoted
                # (marshaller.go:276-283 matches it by value)
                parts.append(prefix + "unchanged-toast-datum")
            elif v is None:
                parts.append(prefix + "null")
            elif meta[4]:  # bare: ints/floats/bools/bytea hex
                parts.append(prefix + str(v))
            else:
                parts.append(prefix + "'" + str(v).replace("'", "''") + "'")
        return " ".join(parts)

    def _rel(self, relid: int) -> Relation:
        rel = self.relations.get(relid)
        if rel is None:
            raise PgOutputError(f"tuple for unknown relation id {relid}")
        return rel

    # ------------------------------------------------------------ decode
    def decode(self, frame: bytes) -> str | None:
        """v1 single-event convenience: one payload → one canonical
        line or None. Streamed-transaction replay (v2 Stream Commit)
        yields MANY lines — use ``decode_events`` there; this wrapper
        refuses rather than silently dropping the tail."""
        events = self.decode_events(frame)
        if not events:
            return None
        if len(events) > 1:
            raise PgOutputError(
                "frame produced multiple events (streamed transaction) — "
                "use decode_events()"
            )
        return events[0]

    def decode_events(self, frame: bytes) -> list[str]:
        """One XLogData payload → canonical test_decoding lines (0, 1,
        or — for a v2 Stream Commit replay — a whole transaction).
        Raises PgOutputError on any malformed frame; never anything
        else."""
        if not frame:
            raise PgOutputError("empty frame")
        r = _Reader(frame)
        tag = r.take(1)
        try:
            if tag == b"B":  # Begin: final_lsn, commit_ts, xid
                r.u64()
                r.u64()
                self.xid = r.u32()
                self.last_origin = None
                self._skip_txn = False
                if self.skip_origins:
                    # deferred mode: the Origin frame (if any) arrives
                    # AFTER Begin — hold the line until a survivor
                    # forces emission (docstring at skip_origins)
                    self._pending_begin = f"BEGIN {self.xid}"
                    return []
                return [f"BEGIN {self.xid}"]
            if tag == b"C":  # Commit: flags, commit_lsn, end_lsn, ts
                r.u8()
                r.u64()
                r.u64()
                r.u64()
                xid = self.xid if self.xid is not None else 0
                if self._skip_txn:
                    self._skip_txn = False
                    self._pending_begin = None
                    self.stats["origin_txns_skipped"] += 1
                    return []
                if self._pending_begin is not None:
                    # empty local transaction under deferred mode:
                    # emit the same BEGIN/COMMIT pair the plain path
                    # would, so downstream txn accounting is identical
                    begin, self._pending_begin = self._pending_begin, None
                    return [begin, f"COMMIT {xid}"]
                return [f"COMMIT {xid}"]
            if tag in (b"S", b"E", b"c", b"A"):
                return self._stream_control(tag, r)
            if tag in (b"b", b"P", b"K", b"r", b"p"):
                # refuse-rather-than-mis-decode (ADVICE r11): the
                # server only emits 2PC frames on a two_phase slot,
                # which requires proto_version 3 — an un-negotiated
                # stream whose byte collides with these tags must
                # raise, not be silently consumed as 2PC state
                # (mirrors _stream_control's version check)
                if self.proto_version < 3:
                    raise PgOutputError(
                        f"two-phase message {tag!r} on proto_version "
                        f"{self.proto_version} (two_phase requires 3)"
                    )
                return self._two_phase(tag, r)
            # inside a stream segment, v2 data/metadata messages carry
            # the (sub)transaction xid right after the tag
            msg_xid: int | None = None
            if self._stream_xid is not None and tag in (
                b"R", b"Y", b"I", b"U", b"D", b"T", b"M",
            ):
                msg_xid = r.u32()
            line = self._decode_body(tag, r, msg_xid)
            if line is None:
                return []
            if self._stream_xid is not None and tag in (b"I", b"U", b"D", b"T"):
                self._buffer_streamed(
                    self._stream_xid,
                    msg_xid if msg_xid is not None else self._stream_xid,
                    line,
                )
                return []
            if self._prepare_gid is not None and tag in (b"I", b"U", b"D", b"T"):
                # between Begin Prepare and Prepare: buffer, emit at
                # Commit Prepared (two-phase docstring at _prepare_gid)
                if self._skip_txn:
                    self.stats["origin_lines_filtered"] += 1
                    return []
                if self._prepare_overflowed:
                    self.stats["stream_overflow_dropped"] += 1
                    return []
                if len(self._prepare_buf) >= self.max_streamed_lines:
                    self._prepare_buf = []
                    self._prepare_overflowed = True
                    self.stats["stream_overflow"] += 1
                    return []
                self._prepare_buf.append(line)
                return []
            if self._skip_txn:
                self.stats["origin_lines_filtered"] += 1
                return []
            if self._pending_begin is not None:
                begin, self._pending_begin = self._pending_begin, None
                return [begin, line]
            return [line]
        except struct.error as exc:  # pragma: no cover — _need guards first
            raise PgOutputError(str(exc)) from None

    # ----------------------------------------------- v2 streamed txns
    def _stream_control(self, tag: bytes, r: _Reader) -> list[str]:
        if self.proto_version < 2:
            raise PgOutputError(
                f"stream message {tag!r} on proto_version {self.proto_version}"
            )
        if tag == b"S":  # Stream Start: xid, first-segment flag
            xid = r.u32()
            r.u8()
            self._stream_xid = xid
            self.stats["stream_segments"] += 1
            return []
        if tag == b"E":  # Stream Stop — segment ends, txn still open
            self._stream_xid = None
            return []
        if tag == b"c":  # Stream Commit: xid, flags, lsns, ts → replay
            xid = r.u32()
            r.u8()
            r.u64()
            r.u64()
            r.u64()
            if xid in self._stream_skip:
                self._stream_skip.discard(xid)
                self._stream_buf.pop(xid, None)
                self._stream_msgs.pop(xid, None)
                self._stream_overflow.discard(xid)
                self.stats["origin_txns_skipped"] += 1
                return []
            if xid in self._stream_overflow:
                # refused transaction: its buffered messages must NOT
                # become durable either — surfacing outbox markers for
                # a transaction whose data was never emitted would
                # desync side channels from the data stream
                # (code-review r11 #3; matches the 2PC overflow path)
                self._stream_msgs.pop(xid, None)
                self._stream_overflow.discard(xid)
                raise PgOutputOverflow(
                    f"streamed transaction {xid} exceeded max_streamed_lines="
                    f"{self.max_streamed_lines}; refusing to emit a silently "
                    "truncated transaction"
                )
            # the transaction is now durable: publish its buffered
            # transactional messages (bounded, drop-newest — mirrors
            # the non-streamed path)
            for _sub, m in self._stream_msgs.pop(xid, []):
                if len(self.messages) >= self.max_buffered_messages:
                    self.stats["messages_dropped"] += 1
                else:
                    self.messages.append(m)
            buf = self._stream_buf.pop(xid, [])
            self.stats["stream_commits"] += 1
            return [f"BEGIN {xid}", *[line for _, line in buf], f"COMMIT {xid}"]
        # Stream Abort: toplevel xid + aborted sub-xid; sub == top
        # aborts the whole transaction, otherwise only that
        # subtransaction's buffered lines are filtered out
        xid = r.u32()
        sub = r.u32()
        self.stats["stream_aborts"] += 1
        if sub == xid:
            self._stream_buf.pop(xid, None)
            self._stream_msgs.pop(xid, None)
            self._stream_overflow.discard(xid)
            self._stream_skip.discard(xid)
        else:
            buf = self._stream_buf.get(xid)
            if buf is not None:
                self._stream_buf[xid] = [(sx, ln) for sx, ln in buf if sx != sub]
            msgs = self._stream_msgs.get(xid)
            if msgs is not None:
                self._stream_msgs[xid] = [
                    (sx, m) for sx, m in msgs if sx != sub
                ]
        return []

    # ----------------------------------------------- two-phase commit
    def _two_phase(self, tag: bytes, r: _Reader) -> list[str]:
        """PREPARE TRANSACTION support (the protocol's ``two_phase``
        option). Frame shapes per the PostgreSQL logical-replication
        message-format docs; replay-at-Commit-Prepared semantics per
        the apply-worker model (see the ``_prepare_gid`` field note).

        At-least-once caveat, documented not hidden: like streamed
        transactions, prepared data is held in-process between Prepare
        and Commit Prepared. The server's confirmed_flush/restart_lsn
        cannot advance past an unconsumed PREPARE, so a restart
        re-sends the whole prepared transaction; a Commit Prepared
        whose GID this process never saw (possible when the slot was
        created between the two phases) emits an EMPTY transaction and
        increments ``commit_prepared_unknown_gid`` rather than
        guessing."""
        if tag == b"b":  # Begin Prepare: lsns, ts, xid, gid
            r.u64()
            r.u64()
            r.u64()
            self.xid = r.u32()
            gid = r.cstr()
            self._prepare_gid = gid
            self._prepare_buf = []
            self._prepare_msgs = []
            self._prepare_overflowed = False
            self._skip_txn = False
            self.last_origin = None
            self.stats["begin_prepares"] += 1
            return []
        if tag == b"P":  # Prepare: flags, lsns, ts, xid, gid
            r.u8()
            r.u64()
            r.u64()
            r.u64()
            xid = r.u32()
            gid = r.cstr()
            if self._prepare_gid is not None and self._prepare_gid != gid:
                raise PgOutputError(
                    f"Prepare for gid {gid!r} while gid "
                    f"{self._prepare_gid!r} is open"
                )
            if self._skip_txn:
                self._prepared_skip.add(gid)
                self._skip_txn = False
            elif self._prepare_overflowed:
                self._prepared_overflow.add(gid)
            else:
                self._prepared[gid] = (xid, self._prepare_buf)
                if self._prepare_msgs:
                    self._prepared_msgs[gid] = self._prepare_msgs
            self._prepare_gid = None
            self._prepare_buf = []
            self._prepare_msgs = []
            self._prepare_overflowed = False
            self.stats["prepares"] += 1
            return []
        if tag == b"p":  # Stream Prepare: streamed txn's buffer → gid
            if self.proto_version < 2:
                raise PgOutputError(
                    f"stream prepare on proto_version {self.proto_version}"
                )
            r.u8()
            r.u64()
            r.u64()
            r.u64()
            xid = r.u32()
            gid = r.cstr()
            if xid in self._stream_skip:
                self._stream_skip.discard(xid)
                self._stream_buf.pop(xid, None)
                self._stream_msgs.pop(xid, None)
                self._stream_overflow.discard(xid)
                self._prepared_skip.add(gid)
            elif xid in self._stream_overflow:
                self._stream_overflow.discard(xid)
                self._prepared_overflow.add(gid)
            else:
                self._prepared[gid] = (
                    xid,
                    [ln for _, ln in self._stream_buf.pop(xid, [])],
                )
                msgs = [m for _, m in self._stream_msgs.pop(xid, [])]
                if msgs:
                    self._prepared_msgs[gid] = msgs
            self.stats["stream_prepares"] += 1
            return []
        if tag == b"K":  # Commit Prepared: flags, lsns, ts, xid, gid
            r.u8()
            r.u64()
            r.u64()
            r.u64()
            xid = r.u32()
            gid = r.cstr()
            if gid in self._prepared_skip:
                self._prepared_skip.discard(gid)
                self.stats["origin_txns_skipped"] += 1
                return []
            if gid in self._prepared_overflow:
                self._prepared_overflow.discard(gid)
                raise PgOutputOverflow(
                    f"prepared transaction {gid!r} exceeded "
                    f"max_streamed_lines={self.max_streamed_lines}; refusing "
                    "to emit a silently truncated transaction"
                )
            if gid not in self._prepared:
                self.stats["commit_prepared_unknown_gid"] += 1
                return [f"BEGIN {xid}", f"COMMIT {xid}"]
            pxid, lines = self._prepared.pop(gid)
            for m in self._prepared_msgs.pop(gid, []):
                if len(self.messages) >= self.max_buffered_messages:
                    self.stats["messages_dropped"] += 1
                else:
                    self.messages.append(m)
            self.stats["commit_prepareds"] += 1
            return [f"BEGIN {pxid}", *lines, f"COMMIT {pxid}"]
        # 'r' Rollback Prepared: flags, prepare/rollback lsns, 2 ts,
        # xid, gid — drop everything held for the GID
        r.u8()
        r.u64()
        r.u64()
        r.u64()
        r.u64()
        r.u32()
        gid = r.cstr()
        self._prepared.pop(gid, None)
        self._prepared_msgs.pop(gid, None)
        self._prepared_skip.discard(gid)
        self._prepared_overflow.discard(gid)
        self.stats["rollback_prepareds"] += 1
        return []

    def _buffer_streamed(self, top: int, msg_xid: int, line: str) -> None:
        if top in self._stream_skip:
            self.stats["origin_lines_filtered"] += 1
            return
        if top in self._stream_overflow:
            self.stats["stream_overflow_dropped"] += 1
            return
        buf = self._stream_buf.setdefault(top, [])
        if len(buf) >= self.max_streamed_lines:
            # free the memory now; the commit raises loudly (docstring)
            self._stream_buf.pop(top, None)
            self._stream_overflow.add(top)
            self.stats["stream_overflow"] += 1
            return
        buf.append((msg_xid, line))

    # ------------------------------------------------- per-tag bodies
    def _decode_body(
        self, tag: bytes, r: _Reader, msg_xid: int | None = None
    ) -> str | None:
        if tag == b"R":  # Relation: registry update, no event
            relid = r.u32()
            ns = r.cstr()
            name = r.cstr()
            ident = r.u8()
            ncols = r.u16()
            if ncols * 10 > r.remaining():  # each column costs >= 10 bytes
                raise PgOutputError(
                    f"declared {ncols} relation columns, {r.remaining()} bytes left"
                )
            cols = []
            for _ in range(ncols):
                flags = r.u8()
                cname = r.cstr()
                oid = r.u32()
                typmod = r.i32()
                cols.append((cname, oid, typmod, bool(flags & 1)))
            self.relations[relid] = Relation(ns, name, ident, cols)
            self.stats["relations"] += 1
            return None
        if tag == b"I":  # Insert: relid, 'N', new tuple
            rel = self._rel(r.u32())
            if r.take(1) != b"N":
                raise PgOutputError("INSERT without new-tuple marker")
            cells = self._tuple(r, rel)
            return f"table {rel.relation}: INSERT: {self._cells_text(cells)}"
        if tag == b"U":  # Update: relid, ['K'|'O' old]?, 'N' new
            rel = self._rel(r.u32())
            marker = r.take(1)
            old = None
            if marker in (b"K", b"O"):
                old = self._tuple(r, rel)
                if marker == b"K":
                    # a key tuple carries 'n' cells at every non-key
                    # position ("not sent", not SQL NULL — identity
                    # columns are non-nullable); test_decoding prints
                    # only the identity cells, so the canonical line
                    # must too
                    old = [c for c in old if c[1] is not None]
                marker = r.take(1)
            if marker != b"N":
                raise PgOutputError(f"UPDATE with unexpected marker {marker!r}")
            cells = self._tuple(r, rel)
            if old is not None:
                return (
                    f"table {rel.relation}: UPDATE: old-key: "
                    f"{self._cells_text(old)} new-tuple: {self._cells_text(cells)}"
                )
            return f"table {rel.relation}: UPDATE: {self._cells_text(cells)}"
        if tag == b"D":  # Delete: relid, 'K'|'O' old tuple
            rel = self._rel(r.u32())
            marker = r.take(1)
            if marker not in (b"K", b"O"):
                raise PgOutputError("DELETE without key/old marker")
            cells = self._tuple(r, rel)
            if marker == b"K":
                # same key-tuple semantics as UPDATE old-key above
                cells = [c for c in cells if c[1] is not None]
            # test_decoding renders the key/old cells as the line's
            # only cells; the marshaller emits them as old values
            # (DELETE branch, marshaller.go:269-271)
            return f"table {rel.relation}: DELETE: {self._cells_text(cells)}"
        if tag == b"T":  # Truncate: nrels, options, relids
            nrels = r.u32()
            opts = r.u8()
            if nrels * 4 > r.remaining():
                raise PgOutputError(
                    f"declared {nrels} truncated relations, {r.remaining()} bytes left"
                )
            rels = [self._rel(r.u32()).relation for _ in range(nrels)]
            flags = {0: "(no-flags)", 1: "cascade", 2: "restart_seqs", 3: "restart_seqs cascade"}[
                opts & 3
            ]
            return f"table {', '.join(rels)}: TRUNCATE: {flags}"
        if tag == b"O":  # Origin: commit LSN on the origin, name
            r.u64()
            self.last_origin = r.cstr()
            self.stats["origins"] += 1
            if self.last_origin in self.skip_origins:
                if self._stream_xid is not None:
                    self._stream_skip.add(self._stream_xid)
                else:
                    self._skip_txn = True
            return None
        if tag == b"Y":  # Type: declares a non-builtin type's name
            oid = r.u32()
            ns = r.cstr()
            name = r.cstr()
            self.types[oid] = f"{ns or 'pg_catalog'}.{name}"
            self._types_version += 1  # invalidate cached render plans
            self.stats["types"] += 1
            return None
        if tag == b"M":  # Message: pg_logical_emit_message side-channel
            flags = r.u8()
            lsn = r.u64()
            prefix = r.cstr()
            n = r.u32()
            if n > r.remaining():
                raise PgOutputError(
                    f"declared {n} message content bytes, {r.remaining()} left"
                )
            content = r.take(n)
            self.stats["messages"] += 1
            if (flags & 1) and (
                self._skip_txn
                or (self._stream_xid is not None
                    and self._stream_xid in self._stream_skip)
            ):
                # transactional message inside an origin-skipped txn:
                # outbox/fence events are exactly what loop prevention
                # must not re-surface (code-review r10-late-2 #5)
                self.stats["origin_messages_filtered"] += 1
                return None
            message = LogicalMessage(
                transactional=bool(flags & 1),
                lsn=lsn,
                prefix=prefix,
                content=content,
                xid=msg_xid
                if msg_xid is not None
                else (self.xid if flags & 1 else None),
            )
            if (flags & 1) and self._stream_xid is not None:
                # durable only at Stream Commit (field docstring);
                # same bounded-buffer posture as self.messages
                buf = self._stream_msgs.setdefault(self._stream_xid, [])
                if len(buf) >= self.max_buffered_messages:
                    self.stats["messages_dropped"] += 1
                else:
                    buf.append(
                        (msg_xid if msg_xid is not None else self._stream_xid,
                         message)
                    )
                return None
            if (flags & 1) and self._prepare_gid is not None:
                # durable only at Commit Prepared (two-phase docstring)
                if len(self._prepare_msgs) >= self.max_buffered_messages:
                    self.stats["messages_dropped"] += 1
                else:
                    self._prepare_msgs.append(message)
                return None
            if len(self.messages) >= self.max_buffered_messages:
                self.stats["messages_dropped"] += 1
            else:
                self.messages.append(message)
            return None
        raise PgOutputError(f"unknown pgoutput message tag {tag!r}")


# ---------------------------------------------------------------------------
# Encoder — spec-symmetric, used by the fake walsender, the batch replay
# fixture, and the decoder's own round-trip tests.
# ---------------------------------------------------------------------------
def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def encode_begin(xid: int, final_lsn: int = 0, commit_ts: int = 0) -> bytes:
    return b"B" + struct.pack(">QQI", final_lsn, commit_ts, xid)


def encode_commit(commit_lsn: int = 0, end_lsn: int = 0, ts: int = 0) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, commit_lsn, end_lsn, ts)


def encode_relation(
    relid: int,
    namespace: str,
    name: str,
    columns: list[tuple[str, int, int]],
    replica_identity: int = ord("d"),
    key_cols: set[str] | None = None,
) -> bytes:
    out = [b"R", struct.pack(">I", relid), _cstr(namespace), _cstr(name)]
    out.append(struct.pack(">BH", replica_identity, len(columns)))
    for cname, oid, typmod in columns:
        flags = 1 if key_cols and cname in key_cols else 0
        out.append(struct.pack(">B", flags))
        out.append(_cstr(cname))
        out.append(struct.pack(">Ii", oid, typmod))
    return b"".join(out)


def _encode_tuple(values: list) -> bytes:
    """values: str (text cell) | None (NULL) | Ellipsis (TOAST 'u') |
    bytes (binary cell)."""
    out = [struct.pack(">H", len(values))]
    for v in values:
        if v is None:
            out.append(b"n")
        elif v is Ellipsis:
            out.append(b"u")
        elif isinstance(v, bytes):
            out.append(b"b" + struct.pack(">I", len(v)) + v)
        else:
            enc = str(v).encode("utf-8")
            out.append(b"t" + struct.pack(">I", len(enc)) + enc)
    return b"".join(out)


def encode_insert(relid: int, values: list) -> bytes:
    return b"I" + struct.pack(">I", relid) + b"N" + _encode_tuple(values)


def encode_update(relid: int, new: list, old: list | None = None, key: bool = False) -> bytes:
    out = [b"U", struct.pack(">I", relid)]
    if old is not None:
        out.append(b"K" if key else b"O")
        out.append(_encode_tuple(old))
    out.append(b"N")
    out.append(_encode_tuple(new))
    return b"".join(out)


def encode_delete(relid: int, old: list, key: bool = True) -> bytes:
    return b"D" + struct.pack(">I", relid) + (b"K" if key else b"O") + _encode_tuple(old)


def encode_truncate(relids: list[int], cascade: bool = False, restart_seqs: bool = False) -> bytes:
    opts = (1 if cascade else 0) | (2 if restart_seqs else 0)
    return (
        b"T"
        + struct.pack(">IB", len(relids), opts)
        + b"".join(struct.pack(">I", rid) for rid in relids)
    )


def encode_origin(lsn: int = 0, name: str = "origin") -> bytes:
    return b"O" + struct.pack(">Q", lsn) + _cstr(name)


def encode_logical_message(
    prefix: str, content: bytes, lsn: int = 0, transactional: bool = False
) -> bytes:
    return (
        b"M"
        + struct.pack(">BQ", 1 if transactional else 0, lsn)
        + _cstr(prefix)
        + struct.pack(">I", len(content))
        + content
    )


def encode_type(oid: int, namespace: str, name: str) -> bytes:
    return b"Y" + struct.pack(">I", oid) + _cstr(namespace) + _cstr(name)


# ------------------------------------------------------- v2 streaming
def _xid_prefix(frame: bytes, stream_xid: int | None) -> bytes:
    """v2 data/metadata messages inside a stream segment carry the
    (sub)transaction xid right after the tag byte."""
    if stream_xid is None:
        return frame
    return frame[:1] + struct.pack(">I", stream_xid) + frame[1:]


def encode_begin_prepare(
    xid: int, gid: str, prepare_lsn: int = 0, end_lsn: int = 0, ts: int = 0
) -> bytes:
    return b"b" + struct.pack(">QQQI", prepare_lsn, end_lsn, ts, xid) + _cstr(gid)


def encode_prepare(
    xid: int, gid: str, prepare_lsn: int = 0, end_lsn: int = 0, ts: int = 0
) -> bytes:
    return b"P" + struct.pack(">BQQQI", 0, prepare_lsn, end_lsn, ts, xid) + _cstr(gid)


def encode_commit_prepared(
    xid: int, gid: str, commit_lsn: int = 0, end_lsn: int = 0, ts: int = 0
) -> bytes:
    return b"K" + struct.pack(">BQQQI", 0, commit_lsn, end_lsn, ts, xid) + _cstr(gid)


def encode_rollback_prepared(
    xid: int,
    gid: str,
    prepare_end_lsn: int = 0,
    rollback_end_lsn: int = 0,
    prepare_ts: int = 0,
    rollback_ts: int = 0,
) -> bytes:
    return (
        b"r"
        + struct.pack(
            ">BQQQQI", 0, prepare_end_lsn, rollback_end_lsn, prepare_ts,
            rollback_ts, xid,
        )
        + _cstr(gid)
    )


def encode_stream_prepare(
    xid: int, gid: str, prepare_lsn: int = 0, end_lsn: int = 0, ts: int = 0
) -> bytes:
    return b"p" + struct.pack(">BQQQI", 0, prepare_lsn, end_lsn, ts, xid) + _cstr(gid)


def encode_stream_start(xid: int, first_segment: bool = True) -> bytes:
    return b"S" + struct.pack(">IB", xid, 1 if first_segment else 0)


def encode_stream_stop() -> bytes:
    return b"E"


def encode_stream_commit(
    xid: int, commit_lsn: int = 0, end_lsn: int = 0, ts: int = 0
) -> bytes:
    return b"c" + struct.pack(">IBQQQ", xid, 0, commit_lsn, end_lsn, ts)


def encode_stream_abort(xid: int, sub_xid: int | None = None) -> bytes:
    return b"A" + struct.pack(">II", xid, sub_xid if sub_xid is not None else xid)


def encode_streamed(frame: bytes, stream_xid: int) -> bytes:
    """Wrap a v1-encoded data/metadata frame as its in-stream v2 form
    (leading xid). Valid for R/Y/I/U/D/T/M frames."""
    if frame[:1] not in (b"R", b"Y", b"I", b"U", b"D", b"T", b"M"):
        raise ValueError(f"tag {frame[:1]!r} cannot appear inside a stream")
    return _xid_prefix(frame, stream_xid)


# ---------------------------------------------------------------------------
# Inverse path: canonical test_decoding lines → pgoutput binary frames.
# Replay/fixture utility — lets any committed text WAL corpus (the
# reference's own itest fixtures) drive the BINARY plugin path, so
# golden parity can be asserted through pgoutput end to end.
# ---------------------------------------------------------------------------
_NAME_TO_OID = {v: k for k, v in _TYPE_NAMES.items()}
_VARCHAR_TYPMOD_RE = re.compile(r"^(character varying|character)\((\d+)\)$")
_NUMERIC_TYPMOD_RE = re.compile(r"^numeric\((\d+),(\d+)\)$")


def _oid_for_type(tname: str) -> tuple[int, int]:
    """Rendered type name → (oid, typmod); inverse of type_name for
    the builtin map plus the typmod forms it produces."""
    if tname in _NAME_TO_OID:
        return _NAME_TO_OID[tname], -1
    m = _VARCHAR_TYPMOD_RE.match(tname)
    if m:
        oid = 1043 if m.group(1) == "character varying" else 1042
        return oid, int(m.group(2)) + 4
    m = _NUMERIC_TYPMOD_RE.match(tname)
    if m:
        return 1700, ((int(m.group(1)) << 16) | int(m.group(2))) + 4
    raise ValueError(f"cannot reverse-map type name {tname!r} to an OID")


def _cell_value(v: str, quoted: bool):
    if not quoted and v == "null":
        return None
    if not quoted and v == "unchanged-toast-datum":
        return Ellipsis
    return v


def frames_from_lines(lines) -> list[bytes]:
    """See ``frames_with_lsns`` for the (lsn, line) variant used by the
    wire-replay tests."""
    return [f for _lsn, f in frames_with_lsns(
        (i, ln) for i, ln in enumerate(lines))]


def frames_with_lsns(items) -> list[tuple[int, bytes]]:
    """Convert a test_decoding line sequence into the pgoutput frames a
    walsender would send for the same changes: Relation frames emitted
    on first use and on shape change, key tuples ('K') reconstructed
    for old-key/DELETE cells (non-identity positions sent as 'n',
    exactly what the decoder's key-tuple omission undoes), TRUNCATE
    flags re-encoded. frames_from_lines∘decode is identity on the
    canonical form — pinned by the itest golden twin."""
    from .parser import parse_line

    registry: dict[str, tuple[int, tuple]] = {}  # table -> (relid, shape)
    out: list[bytes] = []
    next_relid = 1

    def ensure_relation(table: str, shape: tuple, key_names) -> int:
        nonlocal next_relid
        relid, known = registry.get(table, (None, None))
        if relid is None:
            relid = next_relid
            next_relid += 1
        if known != shape:
            cols = [(n, *_oid_for_type(t)) for n, t in shape]
            out.append((cur_lsn, encode_relation(
                relid, *table.split(".", 1), cols, key_cols=set(key_names)
            )))
            registry[table] = (relid, shape)
        return relid

    for cur_lsn, line in items:
        pm = parse_line(line)
        if pm.error:
            raise ValueError(f"unparseable line {line[:80]!r}: {pm.error}")
        if pm.operation == "BEGIN":
            out.append((cur_lsn, encode_begin(int(pm.transaction))))
            continue
        if pm.operation == "COMMIT":
            out.append((cur_lsn, encode_commit()))
            continue
        if pm.operation == "TRUNCATE":
            tables = [t.strip() for t in pm.relation.split(",")]
            flags = line.rsplit("TRUNCATE: ", 1)[1]
            relids = [
                registry[t][0] if t in registry
                # never-seen table: register an empty shape (TRUNCATE
                # carries no column metadata)
                else ensure_relation(t, (), ())
                for t in tables
            ]
            out.append((cur_lsn, encode_truncate(
                relids,
                cascade="cascade" in flags,
                restart_seqs="restart_seqs" in flags,
            )))
            continue
        if pm.no_tuple_data:
            # '(no-tuple-data)' (REPLICA IDENTITY NOTHING) has no
            # pgoutput equivalent a decoder could round-trip — the
            # server would simply not send the old tuple. Refuse
            # loudly rather than emit an empty-tuple frame that
            # decodes to a DIFFERENT canonical line (code-review
            # r10-late-3 #2).
            raise ValueError(
                f"cannot encode (no-tuple-data) line as pgoutput: {line[:80]!r}"
            )
        table = pm.relation
        new_shape = tuple((n, t) for n, (_v, t, _q) in pm.columns.items())
        if pm.operation == "INSERT":
            relid = ensure_relation(table, new_shape, ())
            out.append((cur_lsn, encode_insert(
                relid,
                [_cell_value(v, q) for v, _t, q in pm.columns.values()],
            )))
        elif pm.operation == "UPDATE":
            relid = ensure_relation(table, new_shape, pm.old_columns.keys())
            new_vals = [_cell_value(v, q) for v, _t, q in pm.columns.values()]
            old = None
            full = set(pm.old_columns) == {n for n, _t in new_shape}
            if pm.old_columns:
                # identity-FULL old rows cover every column (marker
                # 'O', real NULLs preserved); identity-default covers
                # a subset (marker 'K', non-identity positions 'n')
                old = [
                    _cell_value(*pm.old_columns[n][::2])
                    if n in pm.old_columns
                    else None
                    for n, _t in new_shape
                ]
            out.append((cur_lsn, encode_update(relid, new_vals, old=old, key=not full)))
        elif pm.operation == "DELETE":
            # the line's cells ARE the identity cells; non-identity
            # columns (known from a prior shape, if any) become 'n'
            relid, known = registry.get(table, (None, None))
            shape = known or new_shape
            relid = ensure_relation(table, shape, pm.columns.keys())
            old = [
                _cell_value(*pm.columns[n][::2]) if n in pm.columns else None
                for n, _t in shape
            ]
            full = set(pm.columns) == {n for n, _t in shape}
            out.append((cur_lsn, encode_delete(relid, old, key=not full)))
        else:
            raise ValueError(f"unsupported operation {pm.operation!r}")
    return out
