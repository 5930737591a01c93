"""WARC (Web ARChive, ISO 28500) record reader.

The dominant on-disk format for web-crawl training corpora (Common
Crawl ships ~100 TB/crawl as WARC). A WARC file is a concatenation of
records, each framed as:

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n  (repeated)
    \\r\\n
    <exactly Content-Length payload octets>
    \\r\\n\\r\\n

Framing is length-delimited (``Content-Length``), NOT sentinel-
delimited — payloads may legally contain ``WARC/1.0`` — so the only
correct reader walks the byte stream record by record. This module
implements that walk as a pure-bytes generator plus an Arrow-batched
``mapInPandas`` kernel, the Spark-idiomatic shape for opaque binary
ingest: one Python task per input split, zero shuffle, each WARC blob
parsed exactly once.

At crawl scale the input arrives as whole files
(``spark.read.format("binaryFile").load("s3://.../\\*.warc")`` or a
custom split-at-record-boundary reader); the kernel below is the same
either way. ``operators/webarchive.py`` registers an oracle-backed
query that synthesizes WARC bytes deterministically from the
``documents`` table so DuckDB can restate every parsed field —
offsets, lengths, digests — in SQL.

No counterpart in the reference (it ingests WAL, not web archives);
this is part of the training-data-pipeline surface the task brief
adds on top of reference parity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

CRLF = b"\r\n"


class WarcFormatError(ValueError):
    """Framing violation: bad version line, missing Content-Length,
    truncated payload, or missing record terminator."""


def iter_warc_records(
    buf: bytes,
) -> Iterator[tuple[int, int, dict[str, str], bytes]]:
    """Yield ``(offset, index, headers, payload)`` per record.

    ``offset`` is the byte offset of the record's version line within
    ``buf``; ``headers`` keys are lower-cased. Strict by default: any
    framing violation raises ``WarcFormatError`` (a crawl pipeline
    wants truncated archives surfaced, not silently half-read)."""
    pos, idx, n = 0, 0, len(buf)
    while pos < n:
        eol = buf.find(CRLF, pos)
        if eol < 0:
            raise WarcFormatError(f"no version line at offset {pos}")
        version = buf[pos:eol]
        if not version.startswith(b"WARC/"):
            raise WarcFormatError(
                f"bad version line at offset {pos}: {version[:32]!r}"
            )
        p = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(CRLF, p)
            if eol < 0:
                raise WarcFormatError(f"unterminated header block @ {pos}")
            line = buf[p:eol]
            p = eol + 2
            if not line:
                break
            key, sep, val = line.partition(b":")
            if not sep:
                raise WarcFormatError(f"malformed header {line[:64]!r}")
            headers[key.strip().lower().decode("ascii")] = val.strip().decode(
                "utf-8"
            )
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise WarcFormatError(f"record @ {pos} lacks Content-Length")
        except ValueError:
            raise WarcFormatError(
                f"record @ {pos}: non-numeric Content-Length "
                f"{headers['content-length']!r}"
            ) from None
        if clen < 0 or p + clen > n:
            raise WarcFormatError(f"truncated payload @ {pos} (len {clen})")
        payload = buf[p : p + clen]
        p += clen
        if buf[p : p + 4] != CRLF + CRLF:
            raise WarcFormatError(f"missing record terminator @ {pos}")
        yield pos, idx, headers, payload
        pos = p + 4
        idx += 1


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split a ``WARC-Type: response`` payload (an HTTP/1.1 message)
    into ``(status, headers, body)``. Header keys lower-cased."""
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        raise WarcFormatError("HTTP payload lacks header terminator")
    head_lines = payload[:head_end].split(CRLF)
    parts = head_lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcFormatError(f"bad HTTP status line {head_lines[0][:64]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise WarcFormatError(
            f"non-numeric HTTP status {parts[1][:16]!r}"
        ) from None
    headers: dict[str, str] = {}
    for line in head_lines[1:]:
        key, sep, val = line.partition(b":")
        if sep:
            headers[key.strip().lower().decode("ascii")] = val.strip().decode(
                "utf-8"
            )
    return status, headers, payload[head_end + 4 :]


# Output of the record-level kernel (one row per WARC record; HTTP
# fields NULL for non-response records such as warcinfo/request).
RECORDS_SCHEMA_DDL = (
    "file_id BIGINT, rec_index BIGINT, rec_offset BIGINT, "
    "warc_type STRING, target_uri STRING, content_length BIGINT, "
    "http_status BIGINT, body_bytes BIGINT, body_md5 STRING"
)


def warc_records_kernel(batches):
    """``mapInPandas`` kernel over ``(file_id BIGINT, warc BINARY)``
    rows: walk each archive's framing, emit one row per record with
    HTTP status/body digest for response records. Arrow-batched, map-
    only; memory is bounded by one archive blob at a time (crawl WARCs
    are ~1 GB — below a sane executor's working set; a splittable
    reader would hand the kernel record-aligned chunks instead)."""
    import pandas as pd

    for pdf in batches:
        out: dict[str, list] = {
            "file_id": [], "rec_index": [], "rec_offset": [],
            "warc_type": [], "target_uri": [], "content_length": [],
            "http_status": [], "body_bytes": [], "body_md5": [],
        }
        for file_id, blob in zip(pdf["file_id"], pdf["warc"]):
            for off, idx, hdrs, payload in iter_warc_records(bytes(blob)):
                wtype = hdrs.get("warc-type", "")
                status = body_n = digest = None
                if wtype == "response":
                    st, _, body = parse_http_response(payload)
                    status = st
                    body_n = len(body)
                    digest = hashlib.md5(body).hexdigest()
                out["file_id"].append(int(file_id))
                out["rec_index"].append(idx)
                out["rec_offset"].append(off)
                out["warc_type"].append(wtype)
                out["target_uri"].append(hdrs.get("warc-target-uri"))
                out["content_length"].append(int(hdrs["content-length"]))
                out["http_status"].append(status)
                out["body_bytes"].append(body_n)
                out["body_md5"].append(digest)
        yield pd.DataFrame(out)
