"""Image-header decode unit tests: the Python parser side of the
``multimodal_image_decode`` round-trip, on bytes NOT produced by the
repo's own builder (hand-assembled per the public PNG/JPEG specs) —
plus the graceful-degradation paths a mixed 100-TB corpus needs
(truncated headers, non-image bytes, JPEG segment walks past
COM/APP segments)."""

from __future__ import annotations

import pandas as pd

from pg_bifrost_spark.operators.multimodal import (
    _parse_jpeg,
    _parse_png,
    decode_image_headers,
)

# hand-assembled 1x1 RGBA PNG header (spec: sig, IHDR len, "IHDR",
# w, h, depth=8, color=6 RGBA, compression/filter/interlace, CRC)
PNG_1x1 = (
    b"\x89PNG\r\n\x1a\x0a"
    b"\x00\x00\x00\x0dIHDR"
    b"\x00\x00\x00\x01\x00\x00\x00\x01\x08\x06\x00\x00\x00"
    b"\x1f\x15\xc4\x89"
)

# JPEG with a COM segment BETWEEN APP0 and SOF0 — the walk must skip it
JPEG_320x240_WITH_COMMENT = (
    b"\xff\xd8"
    + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
    + b"\xff\xfe\x00\x07hello"  # COM, len 7 = 2 + 5 payload
    + b"\xff\xc0\x00\x11\x08"
    + (240).to_bytes(2, "big")
    + (320).to_bytes(2, "big")
    + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
)


def test_parse_png_real_header_bytes():
    assert _parse_png(PNG_1x1) == ("png", 1, 1, 4, 8)


def test_parse_jpeg_walks_past_comment_segment():
    assert _parse_jpeg(JPEG_320x240_WITH_COMMENT) == ("jpeg", 320, 240, 3, 8)


def test_parse_progressive_jpeg_sof2():
    b = (
        b"\xff\xd8"
        + b"\xff\xc2\x00\x11\x08"  # SOF2 (progressive) is a frame header too
        + (10).to_bytes(2, "big")
        + (20).to_bytes(2, "big")
        + b"\x01\x01\x11\x00"
    )
    assert _parse_jpeg(b) == ("jpeg", 20, 10, 1, 8)


def test_truncated_and_foreign_bytes_degrade_to_unknown():
    cases = [
        PNG_1x1[:20],  # truncated mid-IHDR
        b"\xff\xd8\xff\xe0\x00\x10JF",  # truncated APP0
        b"plain text, no magic",
        b"",
    ]
    [pdf] = list(
        decode_image_headers(
            iter([pd.DataFrame({"doc_id": range(len(cases)), "payload": cases})])
        )
    )
    assert list(pdf["fmt"]) == ["unknown"] * len(cases)
    assert list(pdf["n_bytes"]) == [len(c) for c in cases]
    assert pdf["width"].isna().all() and pdf["height"].isna().all()


def test_kernel_parses_mixed_batch():
    [pdf] = list(
        decode_image_headers(
            iter(
                [
                    pd.DataFrame(
                        {
                            "doc_id": [1, 2],
                            "payload": [PNG_1x1, JPEG_320x240_WITH_COMMENT],
                        }
                    )
                ]
            )
        )
    )
    assert list(pdf["fmt"]) == ["png", "jpeg"]
    assert list(pdf["width"]) == [1, 320]
    assert list(pdf["height"]) == [1, 240]
    assert list(pdf["channels"]) == [4, 3]
