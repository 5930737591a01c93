"""WARC reader: framing strictness, HTTP payload split, and the
fixture-archive round trip (offset arithmetic is hash-gated end-to-end
by tests/test_oracle.py; these pin the parser's failure modes)."""

import pytest

from pg_bifrost_spark.sources.warc import (
    CRLF,
    WarcFormatError,
    iter_warc_records,
    parse_http_response,
)


def _rec(wtype: str, payload: bytes, extra: dict[str, str] | None = None) -> bytes:
    hdrs = {"WARC-Type": wtype, "Content-Length": str(len(payload))}
    hdrs.update(extra or {})
    head = b"WARC/1.0" + CRLF
    for k, v in hdrs.items():
        head += k.encode() + b": " + v.encode() + CRLF
    return head + CRLF + payload + CRLF + CRLF


def test_two_records_walked_with_offsets():
    a = _rec("warcinfo", b"software: x")
    b = _rec("response", b"HTTP/1.1 200 OK" + CRLF + CRLF + b"hi",
             {"WARC-Target-URI": "http://e/1"})
    recs = list(iter_warc_records(a + b))
    assert [(r[0], r[1]) for r in recs] == [(0, 0), (len(a), 1)]
    assert recs[0][2]["warc-type"] == "warcinfo"
    assert recs[1][2]["warc-target-uri"] == "http://e/1"
    assert recs[1][3].endswith(b"hi")


def test_payload_containing_version_sentinel_is_not_split():
    """Framing is length-delimited: a payload that CONTAINS the bytes
    'WARC/1.0\\r\\n' must stay one record — sentinel-scanners fail here."""
    payload = b"leading" + CRLF + b"WARC/1.0" + CRLF + b"trailing"
    recs = list(iter_warc_records(_rec("resource", payload)))
    assert len(recs) == 1 and recs[0][3] == payload


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:-2], "missing record terminator"),
        (lambda b: b[:20], "unterminated header"),
        (lambda b: b.replace(b"WARC/1.0", b"WARX/1.0"), "bad version line"),
        (lambda b: b.replace(b"Content-Length", b"Content-Extent"),
         "lacks Content-Length"),
        (lambda b: b.replace(b"Content-Length: 2", b"Content-Length: 9"),
         "truncated payload"),
    ],
)
def test_framing_violations_raise(mutate, msg):
    good = _rec("resource", b"ok")
    with pytest.raises(WarcFormatError, match=msg):
        list(iter_warc_records(mutate(good)))


def test_http_response_split_and_bad_status_line():
    status, hdrs, body = parse_http_response(
        b"HTTP/1.1 404 Not Found" + CRLF + b"X-A: b" + CRLF + CRLF + b"<h1>no</h1>"
    )
    assert (status, hdrs["x-a"], body) == (404, "b", b"<h1>no</h1>")
    with pytest.raises(WarcFormatError, match="bad HTTP status line"):
        parse_http_response(b"nonsense" + CRLF + CRLF + b"x")
    with pytest.raises(WarcFormatError, match="header terminator"):
        parse_http_response(b"HTTP/1.1 200 OK")


def test_archive_fixture_geometry(spark):
    """The planted archive is real WARC: re-parse one blob off-Spark
    and check record count, warcinfo lead, and doc ordering."""
    from pg_bifrost_spark.operators.webarchive import plant_warc_archives
    from pg_bifrost_spark.plans import table

    blob = (
        plant_warc_archives(table(spark, "/root/testdata/sf0.001", "documents"))
        .filter("file_id = 0")
        .collect()[0]["warc"]
    )
    recs = list(iter_warc_records(bytes(blob)))
    assert recs[0][2]["warc-type"] == "warcinfo"
    uris = [r[2]["warc-target-uri"] for r in recs[1:]]
    assert all(r[2]["warc-type"] == "response" for r in recs[1:])
    assert uris == sorted(uris, key=lambda u: int(u.rsplit("/", 1)[1]))
    # byte-exact geometry: offsets are cumulative record lengths
    sizes = [recs[i + 1][0] - recs[i][0] for i in range(len(recs) - 1)]
    assert all(s > 0 for s in sizes)
    assert recs[-1][0] + len(_rebuild(recs[-1])) == len(blob)


def _rebuild(rec) -> bytes:
    """Re-serialize a parsed record; only used to close the geometry
    check (total bytes accounted for)."""
    _, _, hdrs, payload = rec
    head = b"WARC/1.0" + CRLF
    order = ["warc-type", "warc-record-id", "warc-target-uri", "content-length"]
    for k in order:
        if k in hdrs:
            canon = "-".join(
                "URI" if p == "uri" else ("ID" if p == "id" else
                 ("WARC" if p == "warc" else p.capitalize()))
                for p in k.split("-")
            )
            head += canon.encode() + b": " + hdrs[k].encode() + CRLF
    return head + CRLF + payload + CRLF + CRLF


def test_non_numeric_lengths_raise_format_error():
    """int() failures must surface as WarcFormatError, not bare
    ValueError — quarantine-by-exception-class callers depend on it
    (code-review r10-late-2 #3/#4)."""
    bad_cl = (b"WARC/1.0" + CRLF + b"WARC-Type: resource" + CRLF
              + b"Content-Length: abc" + CRLF + CRLF)
    with pytest.raises(WarcFormatError, match="non-numeric Content-Length"):
        list(iter_warc_records(bad_cl))
    with pytest.raises(WarcFormatError, match="non-numeric HTTP status"):
        parse_http_response(b"HTTP/1.1 OK fine" + CRLF + CRLF + b"x")
