"""frames_from_lines: the decode-inverse used to drive the binary
plugin path from text WAL corpora. decode∘encode must be identity on
every committed itest corpus (byte-for-byte lines, LSN pairing)."""

import glob
import json

import pytest

from pg_bifrost_spark.cdc.pgoutput import (
    PgOutputDecoder,
    frames_from_lines,
    frames_with_lsns,
)

CASES = sorted(
    d.rsplit("/", 1)[1] for d in glob.glob("itests/tests/base/test_*")
)


def _lines(case: str) -> list[tuple[int, str]]:
    out = []
    for f in sorted(glob.glob(f"itests/tests/base/{case}/wal/*.jsonl")):
        for ln in open(f):
            if ln.strip():
                m = json.loads(ln)
                if "error" not in m:
                    out.append((m["wal_start"], m["line"]))
    return out


@pytest.mark.parametrize("case", CASES)
def test_roundtrip_identity_on_committed_corpora(case):
    pairs = _lines(case)
    if not pairs:
        pytest.skip("no wal fixture")
    d = PgOutputDecoder()
    back = []
    for lsn, fr in frames_with_lsns(pairs):
        for e in d.decode_events(fr):
            back.append((lsn, e))
    assert back == pairs


def test_shape_change_resends_relation():
    lines = [
        "BEGIN 1",
        "table public.t: INSERT: id[integer]:1 v[text]:'a'",
        "table public.t: INSERT: id[integer]:2 v[text]:'b' extra[bigint]:9",
        "COMMIT 1",
    ]
    frames = frames_from_lines(lines)
    assert sum(1 for f in frames if f[:1] == b"R") == 2  # resend on ALTER
    d = PgOutputDecoder()
    back = [e for f in frames for e in d.decode_events(f)]
    assert back == lines


def test_unknown_type_name_raises():
    with pytest.raises(ValueError, match="reverse-map"):
        frames_from_lines(["table public.t: INSERT: a[tsvector]:'x'"])


def test_no_tuple_data_refused_loudly():
    """REPLICA IDENTITY NOTHING lines have no pgoutput round trip —
    the converter must refuse, never emit an empty-tuple frame that
    decodes to a different canonical line."""
    with pytest.raises(ValueError, match=r"no-tuple-data"):
        frames_from_lines(["table public.t: DELETE: (no-tuple-data)"])
