"""Retry with exponential backoff and PARTIAL-batch retry — reference
``kinesis/factory.go:111-118`` (1.5 s initial, ×1.2, 5 s cap, 5 min
max elapsed) and ``kinesis/transporter/transporter.go:180-201`` (only
the failed subset of a batch is re-sent).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")


@dataclass(frozen=True)
class BackoffPolicy:
    initial_s: float = 1.5
    multiplier: float = 1.2
    max_interval_s: float = 5.0
    max_elapsed_s: float = 300.0

    def intervals(self):
        t = self.initial_s
        while True:
            yield min(t, self.max_interval_s)
            t *= self.multiplier


class RetryExhausted(RuntimeError):
    def __init__(self, pending: Sequence, last_error: BaseException | None = None):
        super().__init__(f"retry budget exhausted with {len(pending)} records pending")
        self.pending = list(pending)
        self.last_error = last_error


def send_with_partial_retry(
    records: Sequence[T],
    send: Callable[[Sequence[T]], Sequence[T]],
    policy: BackoffPolicy = BackoffPolicy(),
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> int:
    """``send(batch) -> failed_subset``. Retries only the failed subset
    under the backoff policy; raises RetryExhausted past the elapsed
    budget (the caller fails the Spark task, and the micro-batch
    replays — at-least-once, exactly like the reference's worker).
    Returns the number of attempts made."""
    pending = list(records)
    attempts = 0
    start = clock()
    waits = policy.intervals()
    last_exc: BaseException | None = None
    while pending:
        attempts += 1
        try:
            pending = list(send(pending))
            last_exc = None
        except Exception as exc:  # transport-level error: whole batch retries
            last_exc = exc
        if not pending and last_exc is None:
            break
        wait = next(waits)
        if clock() - start + wait > policy.max_elapsed_s:
            raise RetryExhausted(pending, last_exc)
        sleep(wait)
    return attempts
