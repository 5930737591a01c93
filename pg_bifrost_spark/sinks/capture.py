"""File-capturing (optionally flaky) transport for the integration
harness's kinesis twins — the in-sandbox analog of the reference's
data-poller containers (``itests/containers/data-poller/app/
poller-kinesis.py``): whatever the sink SUCCESSFULLY sends is what the
poller sees, and that capture is what the golden diff runs against.

Error injection mirrors the reference's localstack
``KINESIS_ERROR_PROBABILITY`` knob (``itests/tests/kinesis/
test_high_kinesis_errors/envfile.env``: 0.4; the multi-worker variant:
0.5): each attempt fails a deterministic pseudo-random subset of its
records — crc32(payload ⊕ attempt) — so the partial-retry path
(``sinks/retry.send_with_partial_retry``) re-sends exactly the failed
subset, and every record lands in the capture EXACTLY once per
delivery. Deterministic ⇒ reproducible goldens on any cluster layout.

The class is a top-level package symbol so Spark can pickle it into
executor tasks (a class defined in a spec-loaded runner module would
not unpickle on workers).
"""

from __future__ import annotations

import os
import uuid
import zlib


class FlakyFileTransport:
    """``send(batch) -> failed_subset`` transport: successes append to
    a unique NDJSON file under ``out_dir``; ~``error_pct``% of each
    attempt's records fail deterministically. Each Spark task unpickles
    its own copy, so the attempt counter is task-local (same scheme as
    the bench degraded leg's ``_FlakyTransport``)."""

    def __init__(self, out_dir: str, error_pct: int = 0):
        self.out_dir = out_dir
        self.error_pct = error_pct
        self.attempt = 0

    def __call__(self, batch):
        self.attempt += 1
        salt = str(self.attempt).encode()
        failed, sent = [], []
        for rec in batch:
            data = rec[0]
            if self.error_pct and zlib.crc32(data + salt) % 100 < self.error_pct:
                failed.append(rec)
            else:
                sent.append(data)
        if sent:
            os.makedirs(self.out_dir, exist_ok=True)
            path = os.path.join(
                self.out_dir, f"capture-{uuid.uuid4().hex}.jsonl"
            )
            with open(path, "w") as f:
                for data in sent:
                    f.write(data.decode() if isinstance(data, (bytes, bytearray)) else str(data))
                    f.write("\n")
        return failed
