"""Replication-slot DDL (S4) — reference ``utils/utils.go:38-77`` +
``main/main.go:173-204`` + ``replication/client/conn/conn.go:45-75``.

The walsender grammar the reference issues through pglogrepl:

    IDENTIFY_SYSTEM
    CREATE_REPLICATION_SLOT <slot> LOGICAL test_decoding
    DROP_REPLICATION_SLOT <slot> WAIT

All slot-admin SEMANTICS live here against an injectable connection
factory, so they are fully testable without a server
(``tests/test_slots.py``):

  * connect with exponential backoff, ~20 s max elapsed
    (conn.go:51-59: initial 0.5 s, ×1.5, max interval 60 s)
  * IDENTIFY_SYSTEM before any DDL (utils.go:45-48 — fails fast on a
    non-replication connection)
  * create is idempotent on SQLSTATE 42710 "already exists"
    (main.go:178-182)
  * drop uses WAIT — blocks until a concurrent consumer detaches
    instead of erroring (utils.go:71)
  * the connection is always closed, success or failure

Only the psycopg adapter (``psycopg_factory``) is deployment-gated —
it is the one line that needs a real server.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Protocol


class SlotDDLError(Exception):
    """DDL failure carrying the server's SQLSTATE (pgconn.PgError.Code
    in the reference, main.go:177-179)."""

    def __init__(self, sqlstate: str, message: str = ""):
        self.sqlstate = sqlstate
        super().__init__(f"[{sqlstate}] {message}")


class ReplicationConn(Protocol):
    """Minimal walsender-connection surface the admin needs."""

    def execute(self, sql: str) -> object: ...  # raises SlotDDLError
    def close(self) -> None: ...


SQLSTATE_DUPLICATE_OBJECT = "42710"  # main.go:179

# conn.go:51-59 — backoff.ExponentialBackOff defaults with
# MaxElapsedTime 20 s
_INITIAL_INTERVAL = 0.5
_MULTIPLIER = 1.5
_MAX_INTERVAL = 60.0
_MAX_ELAPSED = 20.0


def _validate_slot(slot: str) -> str:
    """Slot names interpolate into replication-grammar statements (no
    bind parameters on a walsender connection) — restrict to the
    charset Postgres itself allows for slot names."""
    if not slot or not all(c.isalnum() and c.isascii() or c == "_" for c in slot):
        raise ValueError(f"invalid replication slot name: {slot!r}")
    return slot.lower()


@dataclass
class SlotAdmin:
    """Slot create/drop over an injectable ``connect() -> ReplicationConn``.

    ``sleep``/``clock`` are injectable for deterministic retry tests.
    """

    connect: Callable[[], "ReplicationConn"]
    plugin: str = "test_decoding"
    sleep: Callable[[float], None] = time.sleep
    clock: Callable[[], float] = time.monotonic

    def _connect_with_retry(self) -> "ReplicationConn":
        """conn.go:45-75 — exponential backoff, give up after ~20 s."""
        start = self.clock()
        interval = _INITIAL_INTERVAL
        while True:
            try:
                return self.connect()
            except SlotDDLError:
                raise  # server spoke: not a connectivity failure
            except Exception:
                if self.clock() - start + interval > _MAX_ELAPSED:
                    raise
                self.sleep(interval)
                interval = min(interval * _MULTIPLIER, _MAX_INTERVAL)

    def create(self, slot: str) -> bool:
        """Create the slot. Returns True if created, False if it
        already existed (idempotent, main.go:178-182)."""
        slot = _validate_slot(slot)
        conn = self._connect_with_retry()
        try:
            conn.execute("IDENTIFY_SYSTEM")
            try:
                conn.execute(
                    f"CREATE_REPLICATION_SLOT {slot} LOGICAL {self.plugin}"
                )
                return True
            except SlotDDLError as exc:
                if exc.sqlstate == SQLSTATE_DUPLICATE_OBJECT:
                    return False
                raise
        finally:
            conn.close()

    def drop(self, slot: str) -> None:
        """Drop the slot; WAIT blocks on a concurrent consumer
        (utils.go:59-77). Errors (including "does not exist")
        propagate — the reference does not make drop idempotent."""
        slot = _validate_slot(slot)
        conn = self._connect_with_retry()
        try:
            conn.execute("IDENTIFY_SYSTEM")
            conn.execute(f"DROP_REPLICATION_SLOT {slot} WAIT")
        finally:
            conn.close()


def psycopg_factory(dsn: str) -> Callable[[], "ReplicationConn"]:  # pragma: no cover
    """Deployment adapter: a psycopg connection in replication mode
    (``?replication=database`` DSN, autocommit), mapping pg errors to
    SlotDDLError. The one import that needs a real server."""
    try:
        import psycopg
    except ImportError as exc:
        raise NotImplementedError(
            "psycopg is not available in this environment; slot DDL "
            "semantics are covered by tests/test_slots.py against a "
            "fake connection"
        ) from exc

    class _Conn:
        def __init__(self):
            self._c = psycopg.connect(dsn, autocommit=True)

        def execute(self, sql: str):
            try:
                with self._c.cursor() as cur:
                    cur.execute(sql)
                    return cur.fetchall() if cur.description else None
            except psycopg.errors.Error as exc:
                raise SlotDDLError(exc.sqlstate or "", str(exc)) from exc

        def close(self):
            self._c.close()

    return _Conn
