"""Web-archive (WARC) ingest — the crawl-corpus source format.

``warc_ingest_records`` synthesizes a real multi-record WARC archive
per group of documents (a ``warcinfo`` lead record + one HTTP
``response`` record per document, strict ISO-28500 CRLF /
Content-Length framing), then recovers every record with the honest
byte-walking parser in ``sources/warc.py``. Because the archive bytes
are a pure function of the ``documents`` table, DuckDB can restate
every parsed field — including each record's BYTE OFFSET within its
archive, which only a framing-correct parser reproduces — so the
whole ingest path is hash-gated, not rows-only.

Scale shape: the fixture-build needs one shuffle (group docs into
archives); a production crawl skips it entirely — WARC files are read
whole (``binaryFile``) or record-aligned-split, and the SAME kernel
runs map-only over the scan. Parsing is O(bytes) single-pass with no
Python-side accumulation beyond one archive blob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import register, table
from ..sources.warc import RECORDS_SCHEMA_DDL, warc_records_kernel

_CRLF = "\r\n"
_DOCS_PER_FILE = 16

# DuckDB lacks a CRLF escape in plain literals; chr() keeps the oracle
# free of raw control bytes.
_D_CRLF = "chr(13) || chr(10)"

_WARC_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, doc_id // {_DOCS_PER_FILE} AS file_id,
             'http://' || source || '.example.org/doc/'
               || doc_id::VARCHAR AS uri,
             '<html><body>' || text || '</body></html>' AS html,
             {_D_CRLF} AS crlf
      FROM documents
    ),
    h AS (
      SELECT d.*,
             'HTTP/1.1 200 OK' || crlf
             || 'Content-Type: text/html; charset=utf-8' || crlf || crlf
             || html AS http
      FROM d
    ),
    r AS (
      SELECT h.*, strlen(http) AS clen,
             'WARC/1.0' || crlf
             || 'WARC-Type: response' || crlf
             || 'WARC-Record-ID: <urn:md5:' || md5(uri) || '>' || crlf
             || 'WARC-Target-URI: ' || uri || crlf
             || 'Content-Length: ' || strlen(http)::VARCHAR || crlf || crlf
             || http || crlf || crlf AS rec
      FROM h
    ),
    w AS (
      SELECT file_id, {_D_CRLF} AS crlf,
             'software: pg-bifrost-spark' || {_D_CRLF}
               || 'warc-file: ' || file_id::VARCHAR AS winfo
      FROM (SELECT DISTINCT file_id FROM d)
    ),
    wr AS (
      SELECT file_id,
             strlen('WARC/1.0' || crlf || 'WARC-Type: warcinfo' || crlf
                    || 'Content-Length: ' || strlen(winfo)::VARCHAR
                    || crlf || crlf || winfo || crlf || crlf) AS winfo_len
      FROM w
    )
    SELECT r.file_id,
           CAST(row_number() OVER win AS BIGINT) AS rec_index,
           CAST(wr.winfo_len + COALESCE(sum(strlen(r.rec)) OVER (
                  PARTITION BY r.file_id ORDER BY r.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS rec_offset,
           'response' AS warc_type,
           r.uri AS target_uri,
           CAST(r.clen AS BIGINT) AS content_length,
           CAST(200 AS BIGINT) AS http_status,
           CAST(strlen(r.html) AS BIGINT) AS body_bytes,
           md5(r.html) AS body_md5
    FROM r JOIN wr USING (file_id)
    WINDOW win AS (PARTITION BY r.file_id ORDER BY r.doc_id)
    ORDER BY file_id, rec_index
"""


def plant_warc_archives(docs: DataFrame) -> DataFrame:
    """(file_id BIGINT, warc BINARY): one synthetic WARC archive per
    {_DOCS_PER_FILE}-document group — warcinfo record first, then the
    documents' HTTP-response records in doc_id order."""
    crlf = F.lit(_CRLF)
    uri = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example.org/doc/"),
        F.col("doc_id").cast("string"),
    )
    html = F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>"))
    http = F.concat(
        F.lit("HTTP/1.1 200 OK" + _CRLF
              + "Content-Type: text/html; charset=utf-8" + _CRLF + _CRLF),
        html,
    )
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: response" + _CRLF
              + "WARC-Record-ID: <urn:md5:"),
        F.md5(uri), F.lit(">" + _CRLF + "WARC-Target-URI: "), uri,
        F.lit(_CRLF + "Content-Length: "),
        F.octet_length(http).cast("string"), crlf, crlf, http, crlf, crlf,
    )
    per_doc = docs.select(
        "doc_id",
        F.expr(f"doc_id DIV {_DOCS_PER_FILE}").alias("file_id"),
        rec.alias("rec"),
    )
    # Deterministic archive assembly: records concatenated in doc_id
    # order (array_sort over (doc_id, rec) structs — collect_list
    # order is partition-arrival-nondeterministic on its own).
    files = per_doc.groupBy("file_id").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(doc_id, rec))), '', "
            "(acc, x) -> concat(acc, x.rec))"
        ).alias("resp_blob")
    )
    winfo = F.concat(
        F.lit("software: pg-bifrost-spark" + _CRLF + "warc-file: "),
        F.col("file_id").cast("string"),
    )
    winfo_rec = F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: warcinfo" + _CRLF
              + "Content-Length: "),
        F.octet_length(winfo).cast("string"),
        F.lit(_CRLF + _CRLF), winfo, F.lit(_CRLF + _CRLF),
    )
    return files.select(
        "file_id",
        F.encode(F.concat(winfo_rec, F.col("resp_blob")), "UTF-8").alias("warc"),
    )


@register("warc_ingest_records", oracle=_WARC_ORACLE)
def warc_ingest_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build WARC archives from ``documents``, parse them back with the
    byte-walking reader, emit every HTTP-response record's framing
    facts (offset/index/length) and body digest.

    The oracle reconstructs the archive GEOMETRY arithmetically —
    warcinfo length + running sum of prior record lengths — so a
    parser that miscounts a single CRLF hash-mismatches every
    subsequent offset in the archive. rec_index is 1-based because the
    warcinfo record occupies index 0: the kernel demonstrably walks
    (not skips to) the response records.

    Plan: scan → per-row record strings (codegen) → ONE groupBy
    (fixture assembly only; absent in production ingest) → map-only
    Arrow kernel → presentation sort."""
    parsed = plant_warc_archives(table(spark, sf_dir, "documents")).mapInPandas(
        warc_records_kernel, RECORDS_SCHEMA_DDL
    )
    return (
        parsed.filter(F.col("warc_type") == "response")
        .select(
            "file_id", "rec_index", "rec_offset", "warc_type", "target_uri",
            "content_length", "http_status", "body_bytes", "body_md5",
        )
        .orderBy("file_id", "rec_index")
    )


# --------------------------------------------------------------------------
# compressed NDJSON shard ingest (r10) — the jsonl.gz corpus path
# --------------------------------------------------------------------------
# The other dominant training-corpus interchange format next to WARC:
# newline-delimited JSON in compressed shards (The Pile, RedPajama,
# most HF datasets ship *.jsonl.{gz,zst}). The fixture builds real
# multi-member shards — docs grouped, one JSON object per line, the
# whole shard gzip-compressed in the builder kernel — and the ingest
# kernel does the honest inverse: gzip-decompress, split lines, parse
# each JSON object, surface fields + the per-line byte accounting the
# oracle can restate from `documents` alone (compressed sizes are
# codec-dependent and deliberately NOT surfaced).
_NDJSON_DOCS_PER_SHARD = 25

NDJSON_SCHEMA_DDL = (
    "shard_id BIGINT, line_no BIGINT, id BIGINT, lang STRING, "
    "n_chars BIGINT, text_md5 STRING, line_bytes BIGINT"
)


def build_ndjson_gz_kernel(batches):
    """(shard_id, lines STRING) → (shard_id, gz BINARY): gzip each
    shard's concatenated NDJSON. Compression happens HERE (Spark SQL
    has no gzip expression) — mtime pinned so shard bytes are
    deterministic across retries."""
    import gzip
    import io

    import pandas as pd

    for pdf in batches:
        blobs = []
        for lines in pdf["lines"]:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(lines.encode("utf-8"))
            blobs.append(buf.getvalue())
        yield pd.DataFrame({"shard_id": pdf["shard_id"], "gz": blobs})


def parse_ndjson_gz_kernel(batches):
    """(shard_id, gz BINARY) → one row per JSON line. Strict: a
    truncated gzip stream or malformed JSON line raises (quarantine
    whole shards loudly — the WARC posture)."""
    import gzip
    import hashlib
    import json as _json

    import pandas as pd

    for pdf in batches:
        out = {k: [] for k in (
            "shard_id", "line_no", "id", "lang", "n_chars", "text_md5",
            "line_bytes")}
        for shard_id, blob in zip(pdf["shard_id"], pdf["gz"]):
            text = gzip.decompress(bytes(blob)).decode("utf-8")
            for i, line in enumerate(text.splitlines()):
                d = _json.loads(line)
                out["shard_id"].append(int(shard_id))
                out["line_no"].append(i + 1)
                out["id"].append(int(d["id"]))
                out["lang"].append(d["lang"])
                out["n_chars"].append(len(d["text"]))
                out["text_md5"].append(
                    hashlib.md5(d["text"].encode("utf-8")).hexdigest()
                )
                out["line_bytes"].append(len(line.encode("utf-8")))
        yield pd.DataFrame(out)


@register(
    "ndjson_gz_ingest",
    oracle=f"""
    WITH j AS (
      SELECT doc_id, doc_id // {_NDJSON_DOCS_PER_SHARD} AS shard_id,
             lang, text,
             '{{"id": ' || doc_id::VARCHAR || ', "lang": "' || lang
               || '", "text": "' || text || '"}}' AS line
      FROM documents
    )
    SELECT shard_id,
           CAST(row_number() OVER (PARTITION BY shard_id ORDER BY doc_id)
                AS BIGINT) AS line_no,
           doc_id AS id, lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           md5(text) AS text_md5,
           CAST(strlen(line) AS BIGINT) AS line_bytes
    FROM j ORDER BY shard_id, line_no
    """,
)
def ndjson_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonl.gz shard round trip: serialize docs to NDJSON (plain
    column concat — fixture text is quote/backslash-free, pinned by
    the kernel's strict json.loads), group into shards, gzip in the
    builder kernel, then recover every line with the decompressing
    parser. The oracle restates ids/order/digests/byte counts from the
    table alone — a parser that drops a line, scrambles shard order,
    or mis-frames a member mismatches.

    Plan: scan → per-row JSON line (codegen) → ONE groupBy (shard
    assembly, fixture-only: production reads *.jsonl.gz via
    spark.read.text/binaryFile and runs ONLY the parse kernel) → two
    chained map-only Arrow kernels (compress, decompress+parse) with
    no exchange between them → presentation sort."""
    docs = table(spark, sf_dir, "documents")
    line = F.concat(
        F.lit('{"id": '), F.col("doc_id").cast("string"),
        F.lit(', "lang": "'), F.col("lang"),
        F.lit('", "text": "'), F.col("text"), F.lit('"}'),
    )
    per_doc = docs.select(
        F.expr(f"doc_id DIV {_NDJSON_DOCS_PER_SHARD}").alias("shard_id"),
        "doc_id",
        line.alias("line"),
    )
    shards = per_doc.groupBy("shard_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(doc_id, line))), "
            "x -> x.line), '\\n')"
        ).alias("lines")
    )
    parsed = shards.mapInPandas(
        build_ndjson_gz_kernel, "shard_id BIGINT, gz BINARY"
    ).mapInPandas(parse_ndjson_gz_kernel, NDJSON_SCHEMA_DDL)
    return parsed.orderBy("shard_id", "line_no")
