"""``pgcdc`` — a PySpark Python data source for PostgreSQL
logical-decoding CDC (the Spark-native replacement for the reference's
replication client, ``replication/client/client.go``).

Architecture (SURVEY.md §7 M3): a CDC stream is one inherently
sequential connection, so the reader is a
``SimpleDataSourceStreamReader`` — reads happen on the driver, exactly
like the reference's single replication goroutine; Spark's checkpoint
offset/commit log supplies the progress-ledger semantics (X12):

  * offset = ``{"lsn": N, "xid": ..., "tbk": ...}`` — the WAL position
    PLUS the in-flight transaction-assembly state (W3), so a restart
    resumes mid-transaction byte-identically;
  * ``commit(offset)`` fires after a micro-batch is durably written —
    the transport acks the LSN upstream (StandbyStatusUpdate, W1),
    which is the contiguous-prefix guarantee the reference builds its
    ledger for: Spark only commits batch N after batch N's sinks
    succeeded and batches < N committed;
  * re-delivery after an uncommitted crash replays from the last
    committed offset — at-least-once (W5), duplicates carry the same
    ``time_based_key`` for downstream idempotence (W4).

Transports:
  * ``ReplayTransport`` — WAL-text files on disk (deterministic tests,
    and the bridge to the itest corpus);
  * ``LiveTransport`` — a real replication connection over the
    pure-stdlib wire client (``sources/pgwire.py``; no DB driver —
    psycopg3 has no replication support), driven by the tested
    protocol state machine, with slot create/drop helpers mirroring
    ``utils/utils.go:38-77``. Exercised in-suite against a fake
    walsender speaking real protocol bytes (``tests/test_pgwire.py``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# raw message + assembled txn identity (parser runs downstream)
PGCDC_SCHEMA = StructType(
    [
        StructField("wal_start", LongType()),
        StructField("server_wal_end", LongType()),
        StructField("server_time_ms", LongType()),
        StructField("stream_id", IntegerType()),
        StructField("line", StringType()),
        StructField("txn_id", StringType()),
        StructField("time_based_key", StringType()),
    ]
)


# process-wide count of fetches that ended TRUNCATED — budget
# exhaustion, or a partial batch committed because reconnect attempts
# ran out. NOTE (ADVICE r9): when the reader runs inside PySpark's
# Python data-source worker (python_streaming_source_runner), this
# counter lives in THAT process, not the user's driver process — so it
# is a same-process convenience only (tests, direct transport use).
# The cross-process channel is the OFFSET: ``_Offset.trunc`` carries a
# cumulative truncated-fetch count through the checkpoint/progress
# log, and ``drain_cdc_query`` reads it from ``lastProgress`` (the
# start→end delta of one batch says whether THAT batch truncated).
_TRUNCATION_EVENTS = 0


def truncation_events() -> int:
    return _TRUNCATION_EVENTS


def _note_truncation() -> None:
    global _TRUNCATION_EVENTS
    _TRUNCATION_EVENTS += 1


class ReplayTransport:
    """Reads WAL messages from ``<dir>/*.jsonl`` files (sorted), each
    line ``{"wal_start": N, "server_time_ms": M, "line": "..."}``.
    Acked LSNs are recorded in ``<dir>/.ack`` — the test-visible stand-in
    for StandbyStatusUpdate.

    The corpus is parsed ONCE per on-disk state (file name/size/mtime
    signature) and fetches are a bisect + slice: the naive
    re-read-everything-per-fetch version made a K-micro-batch drain
    O(corpus × K) of driver-side JSON parsing — at the bench corpus
    (hundreds of thousands of messages, dozens of batches) the
    transport dwarfed the pipeline it feeds. Appending/rewriting WAL
    files between fetches still works: the signature changes and the
    corpus reloads."""

    def __init__(self, wal_dir: str):
        self.wal_dir = wal_dir
        self._sig: tuple | None = None
        self._msgs: list[tuple[int, int, str | None]] = []
        self._locs: list[tuple[str, int]] = []  # (file, raw line no) per msg
        self._lsns: list[int] = []

    # process-wide parsed-corpus cache keyed by directory: a drain loop
    # (drain_cdc_query) starts one query PER micro-batch, and every
    # query builds a fresh reader+transport — without this, each round
    # re-parses the full corpus on the driver (measured ~3 s per round
    # at the sf0.1 bench corpus). The signature check below still
    # invalidates on any on-disk change, so instance reuse semantics
    # are unchanged.
    _CORPUS_CACHE: dict = {}

    def _load(self) -> list[tuple[int, int, str | None]]:
        names = sorted(n for n in os.listdir(self.wal_dir) if n.endswith(".jsonl"))
        stats = []
        for n in names:
            st = os.stat(os.path.join(self.wal_dir, n))
            stats.append((n, st.st_size, st.st_mtime_ns))
        sig = tuple(stats)
        if sig != self._sig:
            cached = ReplayTransport._CORPUS_CACHE.get(self.wal_dir)
            if cached and cached[0] == sig:
                self._sig, self._msgs, self._locs, self._lsns = cached
                return self._msgs
            # each entry carries its (file, raw-line-number) location so
            # the parallel reader can hand executors seekable spans
            entries: list[tuple[int, int, str | None, str, int]] = []
            for name in names:
                with open(os.path.join(self.wal_dir, name)) as f:
                    for lineno, raw in enumerate(f):
                        if not raw.strip():
                            continue
                        msg = json.loads(raw)
                        entries.append(
                            (
                                msg["wal_start"],
                                msg.get("server_time_ms", 0),
                                None if "error" in msg else msg["line"],
                                name,
                                lineno,
                            )
                        )
            entries.sort(key=lambda t: (t[0], t[1]))  # stable → deterministic
            self._msgs = [(e[0], e[1], e[2]) for e in entries]
            self._locs = [(e[3], e[4]) for e in entries]
            self._lsns = [m[0] for m in self._msgs]
            self._sig = sig
            ReplayTransport._CORPUS_CACHE.clear()  # one corpus resident
            ReplayTransport._CORPUS_CACHE[self.wal_dir] = (
                sig, self._msgs, self._locs, self._lsns,
            )
        return self._msgs

    # replay never truncates a batch (the corpus is local); the
    # attribute exists so the reader can read one field off any
    # transport when stamping the offset's truncation count
    truncations = 0

    def fetch(
        self, after_lsn: int, limit: int, after_seq: int | None = None
    ) -> list[tuple[int, int, str | None, int]]:
        """Messages strictly after position ``(after_lsn, after_seq)``.

        Returns ``(lsn, time_ms, line, k)`` where ``k`` is the
        message's index within its equal-LSN run — a real walsender
        stamps BEGIN and the transaction's first change with the SAME
        wal_start (ADVICE r9), so an LSN alone cannot address a batch
        boundary: a limit cut between them would make the next fetch's
        ``> after_lsn`` filter silently drop the first DML of that
        transaction. ``after_seq = S`` means "the first S messages at
        ``after_lsn`` are consumed"; ``None`` is the legacy offset form
        (pre-seq checkpoints): everything at ``after_lsn`` consumed.

        A file line ``{"wal_start": N, "error": "..."}`` models a
        protocol ErrorResponse at that position (line=None) — the
        replay analog of a decoding fault."""
        import bisect

        msgs = self._load()
        if after_seq is None:
            i = bisect.bisect_right(self._lsns, after_lsn)
        else:
            i = min(bisect.bisect_left(self._lsns, after_lsn) + after_seq, len(msgs))
        out: list[tuple[int, int, str | None, int]] = []
        run_lsn, run_start = None, 0
        for idx in range(i, min(i + limit, len(msgs))):
            lsn, tms, line = msgs[idx]
            if lsn != run_lsn:
                run_lsn = lsn
                run_start = bisect.bisect_left(self._lsns, lsn)
            out.append((lsn, tms, line, idx - run_start))
        return out

    def current_end(self) -> int:
        """Highest LSN available — the 'server WAL end' the reference
        skips to on error recovery (client.go:386-424)."""
        msgs = self._load()
        return msgs[-1][0] if msgs else 0

    def ack(self, lsn: int, seq: int | None = None) -> None:
        """Record the durable position. ``seq`` (count of messages
        consumed at exactly ``lsn``) makes a restart resume exact when
        a batch boundary landed inside an equal-LSN run (ADVICE r9);
        omitted = legacy whole-run form."""
        with open(os.path.join(self.wal_dir, ".ack"), "w") as f:
            f.write(str(lsn) if seq is None else f"{lsn} {seq}")

    def acked(self) -> int:
        return self.acked_pos()[0]

    def acked_pos(self) -> tuple[int, int | None]:
        try:
            with open(os.path.join(self.wal_dir, ".ack")) as f:
                parts = f.read().split()
        except FileNotFoundError:
            return 0, None
        if not parts:
            return 0, None
        return int(parts[0]), (int(parts[1]) if len(parts) > 1 else None)


class LiveTransport:
    """Live replication transport over the pure-stdlib wire client
    (``sources/pgwire.py``) driven by the fully-tested protocol state
    machine (``sources/protocol.py::ReplicationClientLoop``) — NO
    database driver dependency (psycopg3 does not implement the
    replication sub-protocol, so the wire client IS the deploy path).

    Since r8 this path executes in-suite: ``tests/test_pgwire.py``
    runs it against a fake walsender speaking real protocol bytes over
    a localhost socket, so only the final postgres-server integration
    (the compose rig, itests/) remains deploy-time.

    The fetch contract matches ReplayTransport: ``fetch(after_lsn,
    limit)`` drains ``loop.step()`` into (wal_start, server_time_ms,
    line) rows until ``limit`` messages are buffered or a receive
    deadline signals the stream is idle (one bounded micro-batch —
    the admission cap applies above). ``ack`` advances the loop's
    durable LSN and sends a Standby Status Update immediately (W1).
    Reconnects (incomplete-txn defense, error recovery) restart the
    stream from the acked LSN — at-least-once, duplicates filtered by
    the ``after_lsn`` bound and downstream idempotence (W4/W5)."""

    def __init__(
        self,
        dsn: str,
        slot: str,
        create_slot: bool = True,
        receive_timeout_s: float = 1.0,
        fetch_budget_s: float = 30.0,
        max_connect_attempts: int = 5,
        reconnect_backoff_s: float = 0.5,
        plugin: str = "test_decoding",
        publication_names: str = "pgbifrost",
        pgoutput_proto_version: int = 1,
        skip_origins: str = "",
        two_phase: bool = False,
    ):
        from .pgwire import parse_dsn

        if plugin not in ("test_decoding", "pgoutput"):
            raise ValueError(f"unsupported logical-decoding plugin {plugin!r}")
        if pgoutput_proto_version not in (1, 2, 3):
            # v2 adds streamed in-progress transactions, v3 two-phase
            # commit (PG 15); v4 (parallel streamed apply, PG 16) only
            # changes apply-worker parallelism hints this sequential
            # reader does not need — refuse rather than mis-decode
            raise ValueError(
                f"unsupported pgoutput proto_version {pgoutput_proto_version}"
            )
        # two-phase decode: PREPARE TRANSACTION flows as b/P/K/r(/p)
        # frames (cdc/pgoutput.py::_two_phase). Requires a TWO_PHASE
        # slot and protocol v3 per the PG docs.
        self.two_phase = two_phase
        if two_phase and (plugin != "pgoutput" or pgoutput_proto_version < 3):
            raise ValueError(
                "two_phase requires the pgoutput plugin and proto_version >= 3"
            )
        self._kwargs = parse_dsn(dsn)
        self.slot = slot
        self._create_slot = create_slot
        # pgoutput (the in-core plugin behind native logical
        # replication) streams BINARY frames; a PgOutputConnAdapter
        # canonicalizes them to test_decoding lines so the loop and
        # every downstream stage stay plugin-agnostic (cdc/pgoutput.py)
        self.plugin = plugin
        self.publication_names = publication_names
        self.pgoutput_proto_version = pgoutput_proto_version
        # comma-separated replication-origin names whose transactions
        # the decoder drops wholesale (bidirectional-replication loop
        # prevention; pgoutput only)
        self.skip_origins = frozenset(
            o.strip() for o in skip_origins.split(",") if o.strip()
        )
        if self.skip_origins and plugin != "pgoutput":
            raise ValueError("skip_origins requires the pgoutput plugin")
        self.receive_timeout_s = receive_timeout_s
        # per-batch wall-clock bound (ADVICE r8): during a long replay
        # of already-acked WAL every frame is filtered by after_lsn —
        # no yield, no receive timeout — so without a budget one
        # micro-batch can block for the whole replay window
        self.fetch_budget_s = fetch_budget_s
        if max_connect_attempts < 1:
            # ADVICE r9: with 0 attempts the retry loop body never runs
            # and ``raise last_exc`` would raise None (TypeError)
            raise ValueError(
                f"max_connect_attempts must be >= 1, got {max_connect_attempts}"
            )
        self.max_connect_attempts = max_connect_attempts
        self.reconnect_backoff_s = reconnect_backoff_s
        # transport-level 'M' message buffer (drained from the decoder
        # each batch; bounded drop-newest like the decoder's own)
        self.messages: list = []
        self.max_buffered_messages = 10_000
        self._conn = None
        self._loop = None
        self._acked = 0
        # truncated-fetch count for THIS transport instance — the
        # reader folds the per-fetch delta into the offset's ``trunc``
        # field (the only channel that crosses the data-source worker
        # process boundary, ADVICE r9)
        self.truncations = 0
        # per-connection equal-LSN run tracker: k = index of a frame
        # within its wal_start run since (re)connect. START_REPLICATION
        # resends from the requested LSN's run start, so a frame's k is
        # stable across reconnects and can address batch boundaries.
        self._run_lsn: int | None = None
        self._run_k = 0
        self.stats: dict[str, int] = {"transport_errors": 0, "connects": 0}

    # -------------------------------------------------------- connection
    def _connected(self) -> bool:
        return self._conn is not None and self._conn._sock is not None

    def _disconnect(self) -> None:
        """Drop the connection state so the next ``_ensure_stream``
        reconnects from the acked LSN — the reference's response to ANY
        receive error, not just server-sent ones (client.go:386-424)."""
        if self._conn is not None:
            try:
                self._conn.close()
            except OSError:
                pass  # already dead — that's why we're here
        self._conn = None
        self._loop = None

    def _ensure_stream(self, start_lsn: int, deadline: float | None = None) -> None:
        """Connect with bounded retry/backoff (ADVICE r8): a routine
        network blip must resume the pipeline, not kill the streaming
        query. Exhausting the attempts re-raises the last error — a
        hard-down server IS fatal, matching the reference's runner.

        ``ServerError`` is retried too (code-review r9): right after a
        blip the server-side walsender often still holds the slot
        (SQLSTATE 55006 'replication slot is active'), which arrives
        as an ErrorResponse, not a socket error — the backoff is
        exactly the wait that releases it. A PERMANENT server error
        (bad credentials, missing slot with create disabled) costs the
        bounded schedule once, then surfaces. Backoff sleeps respect
        the caller's ``deadline`` so a reconnect can never blow the
        per-batch budget; the FIRST attempt always runs."""
        import time as _time

        from .pgwire import ServerError, WireConnection, WireError
        from .protocol import ReplicationClientLoop

        if self._connected():
            return
        last_exc: Exception | None = None
        for attempt in range(self.max_connect_attempts):
            if attempt:
                delay = self.reconnect_backoff_s * (2 ** (attempt - 1))
                if deadline is not None:
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        break  # budget spent — surface the last error
                    delay = min(delay, remaining)
                _time.sleep(delay)
            conn = None
            try:
                conn = WireConnection(**self._kwargs).connect()
                if self._create_slot:
                    conn.create_slot(  # idempotent on 42710
                        self.slot, plugin=self.plugin, two_phase=self.two_phase
                    )
                if self.plugin == "pgoutput":
                    options = {
                        "proto_version": str(self.pgoutput_proto_version),
                        "publication_names": self.publication_names,
                    }
                    if self.pgoutput_proto_version >= 2:
                        options["streaming"] = "on"
                    if self.two_phase:
                        options["two_phase"] = "on"
                    conn.start_replication(
                        self.slot,
                        start_lsn,
                        options=options,
                        binary_payload=True,
                    )
                else:
                    conn.start_replication(self.slot, start_lsn)
            except (WireError, ServerError, OSError) as exc:
                last_exc = exc
                self.stats["transport_errors"] += 1
                if conn is not None:
                    conn.close()  # never leak a half-set-up walsender backend
                continue
            self._conn = conn
            loop_conn = conn
            if self.plugin == "pgoutput":
                # fresh adapter per connection: the relation registry is
                # session state (the server re-sends Relation frames on
                # a new session before each relation's first use)
                from .protocol import PgOutputConnAdapter

                loop_conn = PgOutputConnAdapter(
                    conn,
                    proto_version=self.pgoutput_proto_version,
                    skip_origins=self.skip_origins,
                )
            self._loop = ReplicationClientLoop(
                loop_conn, receive_timeout_s=self.receive_timeout_s
            )
            self._loop.ack(self._acked)
            self.stats["connects"] += 1
            # fresh stream ⇒ the server resends the start LSN's run
            # from its first frame: reset the equal-LSN run tracker so
            # k values realign with the original delivery
            self._run_lsn, self._run_k = None, 0
            return
        raise last_exc  # type: ignore[misc]

    def _mark_truncated(self) -> None:
        self.truncations += 1
        _note_truncation()

    # ------------------------------------------------------------- fetch
    def fetch(
        self, after_lsn: int, limit: int, after_seq: int | None = None
    ) -> list[tuple[int, int, str | None, int]]:
        """One bounded micro-batch. Three exits: ``limit`` messages
        buffered, a receive timeout (stream idle), or the per-batch
        wall-clock budget. A transport-level failure mid-batch
        (socket death, corrupt frame, TLS teardown) RECONNECTS and
        CONTINUES the same batch from the emitted high-water mark —
        the reference reconnects on ANY receive error
        (client.go:386-424), and for the drain contract an under-cap
        batch must mean "stream idle", never "a blip truncated us"
        (ADVICE r8 + the r9 end-to-end drive that caught exactly
        that). Only reconnect exhaustion with an EMPTY batch raises;
        with rows in hand the partial batch commits its progress and
        the next fetch surfaces the error if the server is still
        down (the drain loop re-runs on truncation — see
        ``truncation_events``).

        Admission filter: position ``(wal_start, k) > (after_lsn,
        after_seq-1)`` where ``k`` is the frame's index within its
        equal-LSN run since (re)connect (or synthetic) — NEVER the
        emitted high-water mark (code-review r9): a real walsender can
        stamp BEGIN and the transaction's first change with the SAME
        wal_start, so filtering past the last emitted LSN would
        silently drop the first DML of every transaction; and the
        sub-LSN ``k`` (ADVICE r9) keeps that true even when the LIMIT
        cut itself lands between two equal-LSN frames — the next batch
        resumes mid-run instead of skipping its tail. ``after_seq =
        None`` (legacy/pre-seq offsets) degrades to ``wal_start >
        after_lsn``. After a mid-batch reconnect the server resends
        from the high-water-mark LSN, so frames in (after, hwm] can be
        re-delivered as intra-batch duplicates — at-least-once, the
        reference's own behavior on resume-from-ack, deduped
        downstream by time_based_key (W4)."""
        import time as _time

        from .pgwire import ServerError, WireError

        out: list[tuple[int, int, str | None, int]] = []
        # high-water mark of emitted POSITIONS: (a) a synthetic COMMIT
        # (error recovery) carries the last COMMIT's LSN, possibly
        # BELOW rows already emitted this batch — clamping keeps the
        # reader's end offset monotone (code-review r8); (b) after a
        # mid-batch reconnect its LSN is the RESUME position (never
        # the admission filter — see docstring)
        hwm, hwm_k = after_lsn, (after_seq - 1) if after_seq else -1
        truncated = False
        deadline = _time.monotonic() + self.fetch_budget_s
        while len(out) < limit and _time.monotonic() < deadline:
            try:
                self._ensure_stream(max(hwm, self._acked), deadline=deadline)
            except (WireError, ServerError, OSError):
                if out:
                    # commit the partial batch (progress is durable);
                    # flag truncation so a drain loop runs another
                    # round, where this re-raises if still down
                    truncated = True
                    break
                raise
            # snapshot, not the raw counter: the loop's stats
            # accumulate over the CONNECTION's lifetime, so "a timeout
            # happened before this batch" must not end it
            timeouts_at_start = self._loop.stats.get("receive_timeouts", 0)
            budget_spent = False
            while len(out) < limit:
                try:
                    msgs = self._loop.step()
                except (WireError, ServerError, OSError):
                    self.stats["transport_errors"] += 1
                    self._disconnect()
                    break  # outer loop reconnects and continues the batch
                for m in msgs:
                    if m.synthetic:
                        # error-recovery COMMIT: clamp to the batch
                        # high-water position; does not advance the
                        # equal-LSN run (it is not a WAL frame)
                        hwm = max(hwm, m.wal_start)
                        out.append((hwm, m.server_time_ms, m.line, hwm_k))
                        continue
                    if m.wal_start == self._run_lsn:
                        self._run_k += 1
                    else:
                        self._run_lsn, self._run_k = m.wal_start, 0
                    k = self._run_k
                    if m.wal_start > after_lsn or (
                        m.wal_start == after_lsn
                        and after_seq is not None
                        and k >= after_seq
                    ):
                        if (m.wal_start, k) > (hwm, hwm_k):
                            hwm, hwm_k = m.wal_start, k
                        out.append((m.wal_start, m.server_time_ms, m.line, k))
                if self._loop.stats.get("receive_timeouts", 0) > timeouts_at_start:
                    if getattr(self._loop.conn, "mid_stream", False):
                        # the pgoutput adapter's deadline fired while a
                        # v2 streamed transaction is still buffering —
                        # the stream is BUSY, not idle: an under-cap
                        # batch here proves nothing about the backlog,
                        # so it must flag truncation like every other
                        # non-idle exit (code-review r10-late #4)
                        truncated = budget_spent = True
                        break
                    # stream idle — micro-batch done (drain here too:
                    # this early return must not skip the 'M' sweep)
                    self._drain_decoder_messages()
                    return out[:limit]
                if not self._connected():
                    # the LOOP closed the conn deliberately
                    # (incomplete-txn defense / error recovery): end
                    # the batch so the reader can act on it — but an
                    # under-cap batch here proves NOTHING about the
                    # backlog (the reconnect resumes WAL from the
                    # ack), so it must flag truncation like every
                    # other non-idle exit (code-review r10)
                    truncated = budget_spent = True
                    break
                if _time.monotonic() >= deadline:
                    # replaying already-acked WAL yields nothing and
                    # never times out — bound per-batch latency; the
                    # next batch resumes where this one left off
                    self.stats["fetch_budget_exhausted"] = (
                        self.stats.get("fetch_budget_exhausted", 0) + 1
                    )
                    truncated = budget_spent = True
                    break
            if budget_spent:
                break
        # flag ANY under-cap exit that does not prove the stream idle:
        # partial-batch reconnect exhaustion, the loop-closed-conn
        # exit, the inner budget branch, and the outer-loop deadline
        # exit after a mid-batch error (ADVICE r9 + code-review r10 —
        # the last two previously returned unflagged)
        if truncated or len(out) < limit:
            self._mark_truncated()
        self._drain_decoder_messages()
        return out[:limit]

    # -------------------------------------------- logical messages (M)
    def _drain_decoder_messages(self) -> None:
        """Move the pgoutput decoder's buffered 'M' messages into the
        transport-level buffer after every batch, so the per-connection
        decoder never accumulates across batches (code-review
        r10-late-2 #6: nothing drained the decoder on the live path —
        the buffer grew to its cap and then dropped forever)."""
        loop = self._loop
        decoder = getattr(getattr(loop, "conn", None), "decoder", None)
        if decoder is None:
            return
        for m in decoder.drain_messages():
            if len(self.messages) >= self.max_buffered_messages:
                self.stats["messages_dropped"] = (
                    self.stats.get("messages_dropped", 0) + 1
                )
            else:
                self.messages.append(m)

    def drain_messages(self) -> list:
        """Return and clear the buffered ``LogicalMessage``s
        (``pg_logical_emit_message`` side-channel — outbox events,
        migration fences). In-process consumers (replay drains, the
        CLI --once path, tests) read these directly; across the
        PySpark data-source worker boundary only the stats counters
        travel (the same process-boundary limitation as
        ``truncation_events``, documented there)."""
        out = self.messages
        self.messages = []
        return out

    def current_end(self) -> int:
        from .pgwire import probe_xlogpos

        if self._connected():
            return self._conn.current_server_lsn()
        return probe_xlogpos(**self._kwargs)

    # --------------------------------------------------------------- ack
    def ack(self, lsn: int, seq: int | None = None) -> None:
        """``seq`` is accepted for transport-interface parity and
        ignored: StandbyStatusUpdate positions are LSN-granular (the
        walsender protocol has no sub-LSN cursor), so a reconnect may
        re-deliver an equal-LSN run head — at-least-once, deduped
        downstream by time_based_key (W4)."""
        from .pgwire import WireError

        self._acked = max(self._acked, lsn)
        if self._loop is not None and self._connected():
            self._loop.ack(self._acked)
            try:
                self._loop.send_progress()
            except (WireError, OSError):
                # the ack is durable locally (_acked); a dead socket
                # just means the next reconnect re-reports it in the
                # first standby status update (ADVICE r8)
                self.stats["transport_errors"] += 1
                self._disconnect()

    def acked(self) -> int:
        return self._acked

    def close(self) -> None:
        if self._conn is not None:
            self._conn.close()

    # ---------------------------------------------------- slot DDL (CLI)
    @staticmethod
    def create_slot_ddl(
        dsn: str,
        slot: str,
        plugin: str = "test_decoding",
        two_phase: bool = False,
    ) -> bool:
        """CREATE_REPLICATION_SLOT <slot> LOGICAL <plugin> over the
        wire (idempotent on SQLSTATE 42710) — utils/utils.go:38-56; the
        reference hardcodes test_decoding (utils.go:50), this engine
        also creates pgoutput slots. The retry/idempotency policy layer
        lives in sources/slots.py; a psycopg-based adapter
        (``slots.psycopg_factory``) remains for deployments that
        prefer a driver-managed connection."""
        from .pgwire import WireConnection, parse_dsn

        conn = WireConnection(**parse_dsn(dsn)).connect()
        try:
            return conn.create_slot(slot, plugin=plugin, two_phase=two_phase)
        finally:
            conn.close()

    @staticmethod
    def drop_slot_ddl(dsn: str, slot: str) -> None:
        """DROP_REPLICATION_SLOT <slot> WAIT — utils/utils.go:59-77."""
        from .pgwire import WireConnection, parse_dsn

        conn = WireConnection(**parse_dsn(dsn)).connect()
        try:
            conn.drop_slot(slot)
        finally:
            conn.close()


@dataclass
class _Offset:
    lsn: int = 0
    xid: str | None = None  # last-seen BEGIN xid (W3 carry-over)
    tbk: str | None = None  # its time_based_key
    # sub-LSN position: COUNT of messages consumed at exactly ``lsn``
    # (ADVICE r9 — BEGIN and the txn's first change share a wal_start,
    # so an LSN alone cannot address a batch boundary that lands
    # inside an equal-LSN run). ``None`` = legacy/pre-seq checkpoint
    # semantics: everything at ``lsn`` consumed.
    seq: int | None = None
    # cumulative count of TRUNCATED fetches along this offset lineage
    # (budget exhaustion / partial batch on reconnect exhaustion).
    # This is the signal's only channel across the data-source worker
    # process boundary (ADVICE r9): drain_cdc_query reads the
    # start→end delta from lastProgress to decide whether an under-cap
    # batch proves the backlog empty.
    trunc: int = 0

    def to_dict(self) -> dict:
        return {
            "lsn": self.lsn,
            "xid": self.xid,
            "tbk": self.tbk,
            "seq": self.seq,
            "trunc": self.trunc,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "_Offset":
        return cls(
            lsn=d.get("lsn", 0),
            xid=d.get("xid"),
            tbk=d.get("tbk"),
            seq=d.get("seq"),
            trunc=d.get("trunc") or 0,
        )


class PgCdcSimpleReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        wal_dir = options.get("wal_dir")
        if not wal_dir:
            dsn, slot = options.get("dsn"), options.get("slot", "pg_bifrost_spark")
            if not dsn:
                raise ValueError("pgcdc requires option wal_dir=<replay dir> or dsn=<postgres dsn>")
            self.transport = LiveTransport(
                dsn,
                slot,
                plugin=options.get("plugin", "test_decoding"),
                publication_names=options.get("publication_names", "pgbifrost"),
                pgoutput_proto_version=int(
                    options.get("pgoutput_proto_version", "1")
                ),
                skip_origins=options.get("skip_origins", ""),
                two_phase=options.get("two_phase", "").lower()
                in ("on", "true", "1"),
            )
        else:
            self.transport = ReplayTransport(wal_dir)
        # backpressure bound — reference client buffer (main.go:647-652)
        self.max_msgs = PgCdcDataSource.admission_cap(options)

    def initialOffset(self) -> dict:
        return _Offset().to_dict()

    def _read_batch(self, off: _Offset):
        """One admission-capped batch from position (off.lsn, off.seq).
        Returns (rows, positions, end_offset); positions[i] = (lsn, k)
        of rows[i] so replay filtering can address equal-LSN runs."""
        truncs_before = getattr(self.transport, "truncations", 0)
        msgs = self.transport.fetch(off.lsn, self.max_msgs, off.seq)
        rows, poss = [], []
        xid, tbk = off.xid, off.tbk
        for lsn, time_ms, line, k in msgs:
            if line is None:
                # error-recovery skip-ahead (S7, client.go:386-424):
                # close the open transaction with a synthetic COMMIT,
                # then jump past everything currently available —
                # at-least-once with an explicit, documented data gap.
                if xid is not None:
                    rows.append((lsn, lsn + 8, time_ms, 0, f"COMMIT {xid}", xid, tbk))
                    poss.append((lsn, k))
                off.lsn = max(lsn, self.transport.current_end())
                off.seq = None  # the jump consumes everything at off.lsn
                break
            # transaction assembly (client.go:487-545): xid appears on
            # BEGIN/COMMIT; intermediate rows take the last BEGIN's.
            # time_based_key uses the BEGIN's LSN as the deterministic
            # replay-distinguishing component.
            first = line.split(" ", 2)
            if first[0] == "BEGIN" and len(first) >= 2:
                xid, tbk = first[1], f"{first[1]}-{lsn}"
            rows.append((lsn, lsn + 8, time_ms, 0, line, xid, tbk))
            poss.append((lsn, k))
            # monotone end POSITION: a live reconnect mid-batch may
            # re-deliver boundary frames (at-least-once), so only a
            # strictly greater (lsn, k) advances the offset; seq is the
            # consumed COUNT at off.lsn (= last k + 1)
            if lsn > off.lsn or (lsn == off.lsn and off.seq is not None and k + 1 > off.seq):
                off.lsn, off.seq = lsn, k + 1
        off.xid, off.tbk = xid, tbk
        off.trunc += getattr(self.transport, "truncations", 0) - truncs_before
        return rows, poss, off

    def read(self, start: dict) -> Tuple[Iterator[tuple], dict]:
        rows, _poss, off = self._read_batch(_Offset.from_dict(start))
        return iter(rows), off.to_dict()

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay of a checkpointed range (exactly the
        reference's resume-at-LSN, X13)."""
        rows, poss, _ = self._read_batch(_Offset.from_dict(start))
        e = _Offset.from_dict(end)

        def _within(pos):
            lsn, k = pos
            if lsn != e.lsn:
                return lsn < e.lsn
            return e.seq is None or k < e.seq

        return iter([r for r, p in zip(rows, poss) if _within(p)])

    def commit(self, end: dict) -> None:
        """Micro-batch durably committed → ack the contiguous prefix
        upstream (StandbyStatusUpdate, W1/X12). The sub-LSN seq rides
        along: a replay resume via ``acked_pos`` must not skip the
        tail of an equal-LSN run when the batch cap cut inside one
        (same data-loss class the parallel reader's commit fixed,
        ADVICE r9); the live transport accepts and ignores it — the
        wire ack is LSN-granular by protocol."""
        off = _Offset.from_dict(end)
        self.transport.ack(off.lsn, off.seq)


# ---------------------------------------------------------------------------
# partition-parallel replay reader
# ---------------------------------------------------------------------------
@dataclass
class _WalChunk(InputPartition):
    """A contiguous slice of the sorted corpus addressed as seekable
    file spans — ``spans[k] = (file, raw_line_start, raw_line_end)``,
    half-open, in corpus order — plus the transaction-assembly state
    active at the slice's first message (computed by the driver so
    executors never need cross-chunk context). A task reads ONLY its
    span lines: per-task I/O and parse cost is proportional to the
    chunk, never to the corpus."""

    wal_dir: str
    spans: list
    base_xid: str | None
    base_tbk: str | None


def _read_span_msgs(wal_dir: str, spans: list):
    """Parse exactly the span lines into (lsn, time_ms, line|None), in
    span-list order.

    ONE sequential pass per distinct file regardless of span count: a
    WAL corpus whose control and DML records land in different files
    interleaves in LSN order, shattering a chunk into thousands of
    tiny spans — the naive open-per-span loop is O(spans × file) line
    iteration (measured 24 s for a 20 k-message chunk; this pass form
    is 0.2 s)."""
    by_file: dict[str, list] = {}
    for name, a, b in spans:
        by_file.setdefault(name, []).append((a, b))
    parsed: dict[tuple[str, int], tuple] = {}
    for name, ranges in by_file.items():
        ranges = sorted(ranges)
        ri, n_ranges = 0, len(ranges)
        last_line = ranges[-1][1]
        with open(os.path.join(wal_dir, name)) as f:
            for lineno, raw in enumerate(f):
                if lineno >= last_line:
                    break
                while ri < n_ranges and lineno >= ranges[ri][1]:
                    ri += 1
                if ri >= n_ranges or lineno < ranges[ri][0] or not raw.strip():
                    continue
                msg = json.loads(raw)
                parsed[(name, lineno)] = (
                    msg["wal_start"],
                    msg.get("server_time_ms", 0),
                    None if "error" in msg else msg["line"],
                )
    out = []
    for name, a, b in spans:
        for lineno in range(a, b):
            hit = parsed.get((name, lineno))
            if hit is not None:
                out.append(hit)
    return out


class PgCdcParallelReader(DataSourceStreamReader):
    """Replay-transport reader with executor-parallel Arrow reads.

    The driver does exactly what the reference's replication goroutine
    does — track the WAL position, assemble transaction identity,
    bound the client buffer (W6), skip ahead on decode errors (S7) —
    but ONLY over offsets: no row ever materializes driver-side. Data
    movement is per-partition on executors: each task parses its LSN
    slice of the corpus and yields one Arrow RecordBatch, so the
    Python→JVM hop is a columnar buffer, not 600 k pickled tuples.
    Offset dicts are byte-compatible with ``PgCdcSimpleReader``
    (``{"lsn", "xid", "tbk", "seq", "trunc"}`` — the sub-LSN resume
    position and the truncated-fetch count, ADVICE r9) — checkpoints
    carry the in-flight transaction state (W3) either way.

    Scale posture: a 1000-executor cluster reads a WAL replay corpus
    at aggregate disk bandwidth; per-batch admission is still bounded
    (max_msgs_per_batch), and commit() acks the contiguous prefix
    upstream exactly like the simple reader (X12/W1)."""

    def __init__(self, options: dict):
        self.wal_dir = options["wal_dir"]
        self.transport = ReplayTransport(self.wal_dir)
        self.max_msgs = PgCdcDataSource.admission_cap(options)
        self.msgs_per_partition = int(options.get("msgs_per_partition", "20000"))
        self._last: _Offset | None = None  # end offset of the last planned batch

    # -- driver-side offset planning ------------------------------------
    def initialOffset(self) -> dict:
        return _Offset().to_dict()

    def _resume_state(self) -> _Offset:
        """Offset to advance FROM when this reader object has planned
        no batch yet (fresh query or restart): the acked LSN is the
        last durably committed batch end (commit() wrote it). The
        in-flight txn state at that LSN is recovered by scanning the
        corpus backwards for the nearest BEGIN/COMMIT — O(txn) work,
        once per query start."""
        lsn, seq = self.transport.acked_pos()
        msgs, lsns = self.transport._load(), self.transport._lsns

        i = self._pos_index(lsns, _Offset(lsn=lsn, seq=seq))
        for j in range(i - 1, -1, -1):
            line = msgs[j][2]
            if line is None:
                break
            head = line.split(" ", 2)
            if head[0] == "COMMIT":
                break
            if head[0] == "BEGIN" and len(head) >= 2:
                return _Offset(
                    lsn=lsn, xid=head[1], tbk=f"{head[1]}-{msgs[j][0]}", seq=seq
                )
        return _Offset(lsn=lsn, seq=seq)

    @staticmethod
    def _advance(msgs, start: _Offset, transport=None) -> _Offset:
        """Fold txn state over a batch slice — the same per-message
        rules as PgCdcSimpleReader.read (BEGIN adopts xid, error
        marker skips to server WAL end). Accepts both fetch-shaped
        4-tuples (with the equal-LSN run index ``k``, which sets the
        end offset's sub-LSN ``seq``) and raw 3-tuple corpus slices
        (used only for per-chunk txn state, where seq is unused)."""
        xid, tbk = start.xid, start.tbk
        lsn, seq, trunc = start.lsn, start.seq, start.trunc
        for m in msgs:
            m_lsn, _t, line = m[0], m[1], m[2]
            if line is None:
                end = transport.current_end() if transport is not None else m_lsn
                # the jump consumes everything at the target lsn
                return _Offset(
                    lsn=max(m_lsn, end), xid=xid, tbk=tbk, seq=None, trunc=trunc
                )
            head = line.split(" ", 2)
            if head[0] == "BEGIN" and len(head) >= 2:
                xid, tbk = head[1], f"{head[1]}-{m_lsn}"
            lsn = m_lsn
            seq = (m[3] + 1) if len(m) > 3 else None
        return _Offset(lsn=lsn, xid=xid, tbk=tbk, seq=seq, trunc=trunc)

    def latestOffset(self) -> dict:
        start = self._last if self._last is not None else self._resume_state()
        batch = self.transport.fetch(start.lsn, self.max_msgs, start.seq)
        end = self._advance(batch, start, self.transport)
        self._last = end
        return end.to_dict()

    @staticmethod
    def _pos_index(lsns, off: _Offset) -> int:
        """First corpus index NOT consumed by ``off`` — sub-LSN aware:
        (lsn, seq) addresses ``seq`` messages into the equal-LSN run
        (ADVICE r9); seq=None is the legacy whole-run form."""
        import bisect

        if off.seq is None:
            return bisect.bisect_right(lsns, off.lsn)
        return min(bisect.bisect_left(lsns, off.lsn) + off.seq, len(lsns))

    @classmethod
    def _batch_slice(cls, msgs, lsns, start: _Offset, end: _Offset):
        """[i0, i1) of the sorted corpus for offset range (start, end],
        truncated just past the first error marker (skip-ahead leaves
        a documented gap)."""
        i0 = cls._pos_index(lsns, start)
        i1 = cls._pos_index(lsns, end)
        for j in range(i0, i1):
            if msgs[j][2] is None:
                return i0, j + 1
        return i0, i1

    def _spans(self, a: int, b: int) -> list:
        """Compress sorted-corpus indices [a, b) into (file, line_lo,
        line_hi) spans. Consecutive sorted messages on consecutive
        lines of one file merge into one span (the WAL writer emits
        LSN-ordered files, so spans are typically chunk-sized); an
        out-of-order corpus degrades to shorter spans, never to
        wrong data."""
        locs = self.transport._locs
        spans: list = []
        for i in range(a, b):
            name, line = locs[i]
            if spans and spans[-1][0] == name and spans[-1][2] == line:
                spans[-1][2] = line + 1
            else:
                spans.append([name, line, line + 1])
        return [tuple(s) for s in spans]

    def partitions(self, start: dict, end: dict):
        s, e = _Offset.from_dict(start), _Offset.from_dict(end)
        msgs, lsns = self.transport._load(), self.transport._lsns
        i0, i1 = self._batch_slice(msgs, lsns, s, e)
        self._last = e  # replay of a logged batch also anchors advance
        chunks: list[_WalChunk] = []
        state = s
        for a in range(i0, i1, self.msgs_per_partition):
            b = min(a + self.msgs_per_partition, i1)
            chunks.append(
                _WalChunk(self.wal_dir, self._spans(a, b), state.xid, state.tbk)
            )
            state = self._advance(msgs[a:b], state)
        return chunks or [_WalChunk(self.wal_dir, [], s.xid, s.tbk)]

    # -- executor-side data path ----------------------------------------
    def read(self, partition: _WalChunk):
        import pyarrow as pa

        msgs = _read_span_msgs(partition.wal_dir, partition.spans)
        xid, tbk = partition.base_xid, partition.base_tbk
        wal, tms, lines, xids, tbks = [], [], [], [], []
        for lsn, time_ms, line in msgs:
            if line is None:
                # decode-error skip-ahead: close the open txn with a
                # synthetic COMMIT (S7) — the offset planner already
                # jumped past the gap
                if xid is not None:
                    wal.append(lsn)
                    tms.append(time_ms)
                    lines.append(f"COMMIT {xid}")
                    xids.append(xid)
                    tbks.append(tbk)
                break
            head = line.split(" ", 2)
            if head[0] == "BEGIN" and len(head) >= 2:
                xid, tbk = head[1], f"{head[1]}-{lsn}"
            wal.append(lsn)
            tms.append(time_ms)
            lines.append(line)
            xids.append(xid)
            tbks.append(tbk)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(wal, pa.int64()),
                pa.array([w + 8 for w in wal], pa.int64()),
                pa.array(tms, pa.int64()),
                pa.array([0] * len(wal), pa.int32()),
                pa.array(lines, pa.string()),
                pa.array(xids, pa.string()),
                pa.array(tbks, pa.string()),
            ],
            names=[f.name for f in PGCDC_SCHEMA.fields],
        )

    def commit(self, end: dict) -> None:
        off = _Offset.from_dict(end)
        # ack the sub-LSN position too: this reader's restart resume
        # goes through the ack record (_resume_state), so an LSN-only
        # ack would skip the equal-LSN run tail after a mid-run batch
        # boundary (ADVICE r9)
        self.transport.ack(off.lsn, off.seq)


class PgCdcDataSource(DataSource):
    """spark.readStream.format("pgcdc").option("wal_dir", dir).load()"""

    # Admission contract (W6): both readers admit by MESSAGE COUNT —
    # each micro-batch is exactly min(backlog, admission_cap(options))
    # messages. ``drain_cdc_query`` asserts this declaration at
    # runtime before using an under-cap batch as its stop signal; a
    # source admitting by bytes/files must declare its own semantics
    # and will be rejected there instead of silently under-draining.
    ADMISSION_SEMANTICS = "messages"

    @staticmethod
    def admission_cap(options: dict) -> int:
        """The per-batch message cap the readers actually apply —
        single source of truth shared with ``drain_cdc_query`` so the
        drain loop's stop condition can never drift from the readers'
        parsing (same key, same default)."""
        return int(options.get("max_msgs_per_batch", "10000"))

    @classmethod
    def name(cls) -> str:
        return "pgcdc"

    def schema(self) -> StructType:
        return PGCDC_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> PgCdcSimpleReader:
        return PgCdcSimpleReader(self.options)

    def streamReader(self, schema: StructType) -> "PgCdcParallelReader":
        """Partition-parallel reader for the replay transport: the
        driver plans LSN ranges, EXECUTORS parse WAL lines and emit
        Arrow batches — no driver-side row materialization, no
        per-row Python→JVM conversion (measured ~5× on the sf0.1
        replay corpus vs the simple reader). A live-DSN source stays
        on the simple reader (one replication connection is inherently
        sequential): raising here makes Spark fall back to
        ``simpleStreamReader``."""
        if not self.options.get("wal_dir"):
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader (live DSN)"},
            )
        return PgCdcParallelReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PgCdcDataSource)
