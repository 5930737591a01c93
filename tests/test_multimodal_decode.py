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


def _png_gray(pixels, filters):
    """Build a grayscale 8-bit PNG with EXPLICIT per-row filter types —
    an independent encoder (struct-packed, forward-filtered) used to
    probe decoder paths the committed builder never emits."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = [0] * w
    for y, ft in enumerate(filters):
        row = pixels[y]
        raw.append(ft)
        for x in range(w):
            left = row[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2, 4: paeth(left, up, ul)}[ft]
            raw.append((row[x] - pred) % 256)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\x0a" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )


def test_png_pixel_decoder_handles_average_and_paeth():
    """The committed builder only emits filters 0/1/2; the decoder
    claims all five — pin Average (3) and Paeth (4) against an
    independent forward-filtering encoder."""
    from pg_bifrost_spark.operators.multimodal import decode_png_pixels

    pixels = [[10, 200, 30, 99], [250, 3, 77, 128], [0, 255, 1, 254]]
    png = _png_gray(pixels, filters=[3, 4, 3])
    [pdf] = list(decode_png_pixels(iter([pd.DataFrame({"doc_id": [7], "payload": [png]})])))
    flat = [v for row in pixels for v in row]
    assert list(pdf["fmt"]) == ["png"]
    assert int(pdf["sum_pix"][0]) == sum(flat)
    assert int(pdf["wsum_pix"][0]) == sum(i * v for i, v in enumerate(flat))


def test_png_pixel_decoder_flags_bad_crc_and_unknown():
    from pg_bifrost_spark.operators.multimodal import decode_png_pixels

    png = bytearray(_png_gray([[1, 2], [3, 4]], filters=[0, 1]))
    png[-5] ^= 0xFF  # corrupt the IEND CRC
    [pdf] = list(decode_png_pixels(iter([pd.DataFrame(
        {"doc_id": [1, 2], "payload": [bytes(png), b"not a png at all"]}
    )])))
    assert list(pdf["fmt"]) == ["bad_crc", "unknown"]
    assert pdf["sum_pix"].isna().all()


def test_pcm_decoder_signedness_and_truncated_payload():
    """int16 interpretation: 0x8000 → -32768, 0xFFFF → -1; a data
    chunk shorter than its declared length → fmt='unknown'."""
    import struct

    from pg_bifrost_spark.operators.multimodal import decode_pcm_samples

    samples = [0, 1, -1, -32768, 32767]
    data = b"".join(struct.pack("<h", s) for s in samples)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    truncated = wav[:-4]
    [pdf] = list(decode_pcm_samples(iter([pd.DataFrame(
        {"doc_id": [1, 2], "payload": [wav, truncated]}
    )])))
    assert list(pdf["fmt"]) == ["wav", "unknown"]
    assert int(pdf["sum_samples"][0]) == sum(samples)
    assert int(pdf["min_sample"][0]) == -32768
    assert int(pdf["max_sample"][0]) == 32767
    assert int(pdf["sum_sq"][0]) == sum(s * s for s in samples)


def test_fixture_pcm_exercises_negative_samples(spark):
    """The planted sample arithmetic must produce NEGATIVE int16 values
    on the real fixture (u ≥ 32768 → u − 65536) — otherwise the
    signedness path would be gate-vacuous."""
    import pg_bifrost_spark.plans as plans

    plans.load_all()
    rows = plans.QUERIES["multimodal_audio_samples"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows and any(r["min_sample"] < 0 for r in rows)


def test_png_decoder_degrades_on_malformed_but_crc_valid():
    """CRC-valid but malformed PNGs (no IDAT; garbage deflate; dims
    exceeding the data; adversarially huge dims) must DEGRADE to
    null-stat rows, never raise — the mixed-corpus contract
    (code-review r8)."""
    import struct
    import zlib

    from pg_bifrost_spark.operators.multimodal import decode_png_pixels

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    sig = b"\x89PNG\r\n\x1a\x0a"
    ihdr = lambda w, h: chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))  # noqa: E731
    cases = [
        sig + ihdr(2, 2) + chunk(b"IEND", b""),                      # no IDAT
        sig + ihdr(2, 2) + chunk(b"IDAT", b"not deflate") + chunk(b"IEND", b""),
        sig + ihdr(9, 9) + chunk(b"IDAT", zlib.compress(b"\x00ab")) + chunk(b"IEND", b""),  # short data
        sig + ihdr(1 << 16, 1 << 16) + chunk(b"IDAT", zlib.compress(b"\x00a")) + chunk(b"IEND", b""),  # huge dims
    ]
    [pdf] = list(decode_png_pixels(iter([pd.DataFrame(
        {"doc_id": list(range(len(cases))), "payload": cases}
    )])))
    assert len(pdf) == len(cases)
    assert pdf["sum_pix"].isna().all()


def test_pcm_decoder_walks_past_list_chunk():
    """A LIST/INFO chunk between 'fmt ' and 'data' (the common
    real-world layout) must still decode the true sample data — a
    fixed-offset read would parse metadata bytes as samples
    (code-review r8). A float-format (code 3) WAV must stay unknown."""
    import struct

    from pg_bifrost_spark.operators.multimodal import decode_pcm_samples

    samples = [5, -7, 1000]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOab\x01\x02\x03\x04"
    body = fmt_chunk + lst + b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    fmt_f32 = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 16000, 2, 16)
    body2 = fmt_f32 + b"data" + struct.pack("<I", len(data)) + data
    wav_f32 = b"RIFF" + struct.pack("<I", 4 + len(body2)) + b"WAVE" + body2
    [pdf] = list(decode_pcm_samples(iter([pd.DataFrame(
        {"doc_id": [1, 2], "payload": [wav, wav_f32]}
    )])))
    assert list(pdf["fmt"]) == ["wav", "unknown"]
    assert int(pdf["sum_samples"][0]) == sum(samples)
    assert int(pdf["n_samples"][0]) == len(samples)


def test_png_decoder_bounds_deflate_bomb():
    """A CRC-valid IDAT that inflates far past the declared scanline
    size (deflate bomb) must be rejected WITHOUT materializing its
    full expansion — the decompress is output-bounded (code-review
    r8). 64 KB of zeros compresses to ~100 bytes; dims declare 2x2."""
    import struct
    import zlib

    from pg_bifrost_spark.operators.multimodal import decode_png_pixels

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    sig = b"\x89PNG\r\n\x1a\x0a"
    bomb = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 65536))
        + chunk(b"IEND", b"")
    )
    # and a header claiming dims past the pixel cap with a tiny stream
    huge = (
        sig
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00a"))
        + chunk(b"IEND", b"")
    )
    [pdf] = list(decode_png_pixels(iter([pd.DataFrame(
        {"doc_id": [1, 2], "payload": [bomb, huge]}
    )])))
    assert pdf["sum_pix"].isna().all()
    assert list(pdf["fmt"]) == ["unknown", "unknown"]


# ---------------------------------------------------------------------------
# property-based round-trip pins for the r8 payload codecs (hypothesis)
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, seed, data):
    """ANY pixel grid under ANY per-row filter choice (all five
    types) must decode back to the exact pixel sums — pins the
    encoder/decoder pair far beyond the fixture's 3-filter,
    arithmetic-pixel subset."""
    import random

    from pg_bifrost_spark.operators.multimodal import decode_png_pixels

    rng = random.Random(seed)
    pixels = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    png = _png_gray(pixels, filters)
    [pdf] = list(
        decode_png_pixels(iter([pd.DataFrame({"doc_id": [0], "payload": [png]})]))
    )
    flat = [v for row in pixels for v in row]
    assert list(pdf["fmt"]) == ["png"]
    assert int(pdf["width"][0]) == w and int(pdf["height"][0]) == h
    assert int(pdf["sum_pix"][0]) == sum(flat)
    assert int(pdf["wsum_pix"][0]) == sum(i * v for i, v in enumerate(flat))

@settings(max_examples=60, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    pad_list=st.booleans(),
)
def test_wav_roundtrip_property(samples, pad_list):
    """ANY int16 sample sequence — optionally behind a LIST chunk —
    must decode to its exact sum/min/max/energy."""
    import struct

    from pg_bifrost_spark.operators.multimodal import decode_pcm_samples

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt_chunk = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    mid = (b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00") if pad_list else b""
    body = fmt_chunk + mid + b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    [pdf] = list(
        decode_pcm_samples(iter([pd.DataFrame({"doc_id": [0], "payload": [wav]})]))
    )
    assert list(pdf["fmt"]) == ["wav"]
    assert int(pdf["n_samples"][0]) == len(samples)
    assert int(pdf["sum_samples"][0]) == sum(samples)
    assert int(pdf["sum_sq"][0]) == sum(s * s for s in samples)
    if samples:
        assert int(pdf["min_sample"][0]) == min(samples)
        assert int(pdf["max_sample"][0]) == max(samples)


# ---------------------------------------------------------------------------
# MP4 sample-table decoder (r9): generic box walk vs builder, tamper
# cases, and a hypothesis round-trip over arbitrary sample tables
# ---------------------------------------------------------------------------
def _mp4_for(doc_ids):
    from pg_bifrost_spark.operators.multimodal import build_mp4_payloads

    [built] = list(
        build_mp4_payloads(iter([pd.DataFrame({"doc_id": doc_ids})]))
    )
    return built


def test_mp4_sample_tables_decode_both_stsz_forms():
    """Track 1 uses an explicit stsz table, track 2 the uniform
    sample_size field — both branches must recover the same stats the
    plant arithmetic predicts."""
    from pg_bifrost_spark.operators.multimodal import (
        _mp4_track_plant,
        decode_mp4_samples,
    )

    built = _mp4_for([0, 1, 7, 123, 499])
    [out] = list(decode_mp4_samples(iter([built])))
    for doc_id in (0, 1, 7, 123, 499):
        for t in _mp4_track_plant(doc_id):
            row = out[(out["doc_id"] == doc_id) & (out["track_id"] == t["track_id"])]
            assert len(row) == 1, (doc_id, t["track_id"])
            r = row.iloc[0]
            assert r["handler"] == t["handler"].decode()
            assert int(r["timescale"]) == t["timescale"]
            assert int(r["n_samples"]) == len(t["sizes"])
            assert int(r["sum_sample_bytes"]) == sum(t["sizes"])
            assert int(r["n_chunks"]) == (len(t["sizes"]) + 1) // 2
            dur = sum(c * d for c, d in t["stts"])
            assert int(r["duration_ticks"]) == dur
            assert int(r["duration_ms"]) == dur * 1000 // t["timescale"]


def test_mp4_decoder_drops_malformed_tracks():
    """Tampered payloads degrade row-wise, never error: a corrupt
    stsz/stts disagreement drops that track; an out-of-file or
    non-increasing stco drops it; a non-MP4 payload emits nothing."""
    import struct

    from pg_bifrost_spark.operators.multimodal import decode_mp4_samples

    built = _mp4_for([3])
    good = bytes(built["payload"][0])

    def decode_one(payload):
        return list(
            decode_mp4_samples(
                iter([pd.DataFrame({"doc_id": [3], "payload": [payload]})])
            )
        )[0]

    assert len(decode_one(good)) == 2  # both tracks

    # (a) inflate the FIRST stts entry count: stts total != stsz count
    at = good.index(b"stts")
    tampered = bytearray(good)
    cnt = int.from_bytes(good[at + 8 : at + 12], "big")
    tampered[at + 8 : at + 12] = struct.pack(">I", cnt + 1)
    out = decode_one(bytes(tampered))
    assert list(out["track_id"]) == [2]  # video track dropped, audio kept

    # (b) make the first stco offset exceed the file length
    at = good.index(b"stco")
    tampered = bytearray(good)
    tampered[at + 12 : at + 16] = struct.pack(">I", len(good) + 100)
    out = decode_one(bytes(tampered))
    assert list(out["track_id"]) == [2]

    # (c) not an MP4 at all
    assert len(decode_one(b"plain text, not boxes")) == 0

    # (d) truncated mid-moov: box size runs past the buffer -> walk stops
    assert len(decode_one(good[: len(good) // 3])) == 0


@settings(max_examples=40, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 5000), min_size=1, max_size=40),
    runs=st.data(),
    uniform=st.booleans(),
    timescale=st.integers(1, 1 << 30),
)
def test_mp4_roundtrip_property(sizes, runs, uniform, timescale):
    """ANY sample table (sizes, stts run partition, uniform/table
    stsz, any timescale) must round-trip through builder+decoder with
    exact integer stats — the same pin the PNG/WAV codecs carry."""
    from pg_bifrost_spark.operators.multimodal import (
        build_mp4_payloads,
        decode_mp4_samples,
    )
    import pg_bifrost_spark.operators.multimodal as mm

    if uniform:
        sizes = [sizes[0]] * len(sizes)
    n = len(sizes)
    # draw a partition of n into stts runs with arbitrary deltas
    stts, left = [], n
    while left:
        c = runs.draw(st.integers(1, left))
        stts.append((c, runs.draw(st.integers(0, 10_000))))
        left -= c
    plant = [{
        "track_id": 9,
        "handler": b"vide",
        "timescale": timescale,
        "sizes": sizes,
        "stts": stts,
        "uniform": sizes[0] if uniform else 0,
    }]
    orig = mm._mp4_track_plant
    mm._mp4_track_plant = lambda _doc_id: plant
    try:
        [built] = list(
            build_mp4_payloads(iter([pd.DataFrame({"doc_id": [1]})]))
        )
        [out] = list(decode_mp4_samples(iter([built])))
    finally:
        mm._mp4_track_plant = orig
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["track_id"]) == 9
    assert int(r["timescale"]) == timescale
    assert int(r["n_samples"]) == n
    assert int(r["sum_sample_bytes"]) == sum(sizes)
    assert int(r["n_chunks"]) == (n + 1) // 2
    dur = sum(c * d for c, d in stts)
    assert int(r["duration_ticks"]) == dur
    assert int(r["duration_ms"]) == dur * 1000 // timescale


def test_mp4_decoder_bounds_declared_entry_counts():
    """Declared entry counts are attacker-controlled: a 0xFFFFFFFF
    stsz/stts/stco count must be rejected against the enclosing box's
    CAPACITY before any loop runs (code-review r9 — otherwise ~4 G
    Python iterations or a 4 G-element list per payload), and a
    uniform stsz whose product overflows BIGINT is dropped too."""
    import struct
    import time

    from pg_bifrost_spark.operators.multimodal import decode_mp4_samples

    built = _mp4_for([3])
    good = bytes(built["payload"][0])

    def decode_one(payload):
        t0 = time.monotonic()
        [out] = list(
            decode_mp4_samples(
                iter([pd.DataFrame({"doc_id": [3], "payload": [payload]})])
            )
        )
        assert time.monotonic() - t0 < 5.0, "decode stalled on tampered count"
        return out

    for marker, count_off in ((b"stts", 4), (b"stco", 4)):
        at = good.index(marker)
        tampered = bytearray(good)
        tampered[at + 4 + count_off : at + 8 + count_off] = struct.pack(
            ">I", 0xFFFFFFFF
        )
        out = decode_one(bytes(tampered))
        assert list(out["track_id"]) == [2], marker  # video track dropped

    # stsz TABLE form (video track): count field sits 8 past the type
    at = good.index(b"stsz")
    tampered = bytearray(good)
    tampered[at + 12 : at + 16] = struct.pack(">I", 0xFFFFFFFF)
    out = decode_one(bytes(tampered))
    assert list(out["track_id"]) == [2]

    # stsz UNIFORM form (audio track): huge size × huge count would
    # overflow the BIGINT column — drop, don't wrap
    at = good.index(b"stsz", at + 4)  # the second stsz (audio)
    tampered = bytearray(good)
    tampered[at + 8 : at + 16] = struct.pack(">II", 0xFFFFFFFF, 0xFFFFFFFF)
    out = decode_one(bytes(tampered))
    assert list(out["track_id"]) == [1]  # audio track dropped this time


# ---------------------------------------------------------------------------
# JPEG entropy decoder (r9): DC-only fixture round-trip, the general
# AC path vs an independent IDCT, tamper cases, hypothesis property
# ---------------------------------------------------------------------------
def _encode_jpeg_blocks(zz_blocks, bx, by, qtable=None, width=None, height=None):
    """Thin alias for the production ``encode_jpeg_gray`` (code-review
    r9 removed a near-verbatim test-local duplicate: encoder
    correctness is independently proven by the decoder × SQL-oracle
    triangle plus the reference IDCT below, so the tests SHOULD drive
    the one real encoder with arbitrary AC blocks)."""
    from pg_bifrost_spark.operators.multimodal import encode_jpeg_gray

    return encode_jpeg_gray(
        zz_blocks, bx, by, qtable=qtable, width=width, height=height
    )


def _reference_idct(zz, qtable):
    """Independent spec IDCT (separate formulation from the decoder:
    explicit quadruple loop, no matrix algebra)."""
    import math

    import numpy as np

    from pg_bifrost_spark.operators.multimodal import _ZIGZAG

    coeffs = [[0.0] * 8 for _ in range(8)]
    for idx, (r, c) in enumerate(_ZIGZAG):
        coeffs[r][c] = zz[idx] * qtable[idx]
    px = np.zeros((8, 8), dtype=np.int64)
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeffs[u][v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            px[y][x] = min(255, max(0, round(s / 4) + 128))
    return px


def test_jpeg_decoder_general_ac_path_matches_reference_idct():
    """The production plant is DC-only; this drives the decoder's full
    AC machinery (nonzero ACs, a >16-zero run forcing ZRL, EOB) and
    checks every pixel against an independently-formulated IDCT."""
    import numpy as np

    from pg_bifrost_spark.operators.multimodal import (
        _JPEG_QTABLE,
        decode_jpeg_blocks,
    )

    zz1 = [0] * 64
    zz1[0], zz1[1], zz1[2], zz1[5] = 40, -13, 7, 3  # DC + low-freq ACs
    zz2 = [0] * 64
    zz2[0], zz2[30], zz2[63] = -25, 9, -2  # long zero runs -> ZRL twice
    payload = _encode_jpeg_blocks([zz1, zz2], bx=2, by=1)
    r = decode_jpeg_blocks(payload)
    assert r is not None
    w, h, px = r
    assert (w, h) == (16, 8)
    want1 = _reference_idct(zz1, _JPEG_QTABLE)
    want2 = _reference_idct(zz2, _JPEG_QTABLE)
    assert np.array_equal(px[:, :8], want1)
    assert np.array_equal(px[:, 8:], want2)


def test_jpeg_decoder_honors_dqt_values():
    """Dequantization must use the DQT the file declares, not an
    assumed table — same coefficients with a different qtable must
    decode to different (reference-matched) pixels."""
    import numpy as np

    from pg_bifrost_spark.operators.multimodal import decode_jpeg_blocks

    zz = [0] * 64
    zz[0], zz[3] = 10, 4
    q2 = [16] * 64
    payload = _encode_jpeg_blocks([zz], bx=1, by=1, qtable=q2)
    r = decode_jpeg_blocks(payload)
    assert r is not None
    _, _, px = r
    assert np.array_equal(px, _reference_idct(zz, q2))


def test_jpeg_decoder_degrades_on_malformed():
    from pg_bifrost_spark.operators.multimodal import (
        build_jpeg_payloads,
        decode_jpeg_blocks,
    )

    [built] = list(
        build_jpeg_payloads(iter([pd.DataFrame({"doc_id": [7]})]))
    )
    good = bytes(built["payload"][0])
    assert decode_jpeg_blocks(good) is not None
    assert decode_jpeg_blocks(b"not a jpeg") is None
    assert decode_jpeg_blocks(good[:20]) is None  # truncated pre-scan
    # truncate the WHOLE entropy stream away: huffman runs dry -> None,
    # never an uncaught exception (the scan starts right after SOS)
    sos_end = good.index(b"\xff\xda") + 2 + int.from_bytes(
        good[good.index(b"\xff\xda") + 2 : good.index(b"\xff\xda") + 4], "big"
    )
    assert decode_jpeg_blocks(good[:sos_end]) is None
    # corrupt a huffman byte: either an invalid code (None) or a
    # DIFFERENT valid decode — never a raise, never a half-shaped array
    tampered = bytearray(good)
    tampered[sos_end + 1] ^= 0x55
    r = decode_jpeg_blocks(bytes(tampered))
    if r is not None:
        w, h, px = r
        assert px.shape == (h, w)


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=30, deadline=None)
@_given(
    consts=_st.lists(_st.integers(0, 255), min_size=1, max_size=12),
    bx=_st.integers(1, 4),
)
def test_jpeg_dc_only_roundtrip_property(consts, bx):
    """ANY sequence of block constants at ANY width must round-trip
    exactly through huffman encode -> full baseline decode (the PNG/
    WAV/MP4 property, extended to the entropy-coded codec)."""
    import numpy as np

    from pg_bifrost_spark.operators.multimodal import decode_jpeg_blocks

    while len(consts) % bx:
        consts.append(consts[-1])
    by = len(consts) // bx
    zz_blocks = []
    for c in consts:
        zz = [0] * 64
        zz[0] = c - 128
        zz_blocks.append(zz)
    payload = _encode_jpeg_blocks(zz_blocks, bx=bx, by=by)
    r = decode_jpeg_blocks(payload)
    assert r is not None
    w, h, px = r
    assert (w, h) == (bx * 8, by * 8)
    for bi, c in enumerate(consts):
        tile = px[(bi // bx) * 8 : (bi // bx) * 8 + 8,
                  (bi % bx) * 8 : (bi % bx) * 8 + 8]
        assert np.all(tile == c), (bi, c, tile)


def test_jpeg_decoder_crops_non_block_aligned_dims():
    """SOF0 dims need not be multiples of 8 (encoders pad to full
    MCUs): a 20x12 image carried in 3x2 blocks must decode to exactly
    20x12 with the padding cropped (code-review r9)."""
    import numpy as np

    from pg_bifrost_spark.operators.multimodal import decode_jpeg_blocks

    consts = [10, 60, 110, 160, 210, 250]
    zz_blocks = []
    for c in consts:
        zz = [0] * 64
        zz[0] = c - 128
        zz_blocks.append(zz)
    payload = _encode_jpeg_blocks(zz_blocks, bx=3, by=2, width=20, height=12)
    r = decode_jpeg_blocks(payload)
    assert r is not None
    w, h, px = r
    assert (w, h) == (20, 12) and px.shape == (12, 20)
    # top-left block fully inside; right/bottom blocks cropped
    assert np.all(px[:8, :8] == consts[0])
    assert np.all(px[:8, 16:20] == consts[2])   # third block: 4 cols survive
    assert np.all(px[8:12, :8] == consts[3])    # second row: 4 rows survive


def test_jpeg_decoder_short_tables_return_none():
    """Truncated DQT/DHT/SOF0 bodies must return None, never raise
    (code-review r9: IndexErrors escaped the mixed-corpus contract)."""
    import struct

    from pg_bifrost_spark.operators.multimodal import decode_jpeg_blocks

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    # SOF0 with a 2-byte body
    assert decode_jpeg_blocks(b"\xff\xd8" + seg(0xC0, b"\x08") + b"\xff\xd9") is None
    # DQT with only 10 table bytes
    assert decode_jpeg_blocks(b"\xff\xd8" + seg(0xDB, bytes(11)) + b"\xff\xd9") is None
    # DHT whose vals are shorter than sum(bits)
    dht = bytes([0x00]) + bytes([0, 9] + [0] * 14) + bytes([1, 2])  # claims 9 vals
    assert decode_jpeg_blocks(b"\xff\xd8" + seg(0xC4, dht) + b"\xff\xd9") is None


def test_sample_extract_matches_plant():
    """The extractor's per-sample digests equal the closed-form plant:
    byte p of track t's payload is (doc_id·131 + track_id·17 + p) % 256,
    so each sample's first byte / byte sum are computable from the
    plant sizes alone — a misplaced stco/stsc/stsz offset anywhere
    shifts bytes and fails this."""
    from pg_bifrost_spark.operators.multimodal import (
        _mp4_track_plant,
        extract_mp4_samples,
    )

    built = _mp4_for([0, 1, 7, 123, 499])
    [out] = list(extract_mp4_samples(iter([built])))
    for doc_id in (0, 1, 7, 123, 499):
        for t in _mp4_track_plant(doc_id):
            a = (doc_id * 131 + t["track_id"] * 17) % 256
            p0 = 0
            for idx, sz in enumerate(t["sizes"], start=1):
                row = out[
                    (out["doc_id"] == doc_id)
                    & (out["track_id"] == t["track_id"])
                    & (out["sample_idx"] == idx)
                ].iloc[0]
                want = [(a + p) % 256 for p in range(p0, p0 + sz)]
                assert int(row["sample_bytes"]) == sz
                assert int(row["first_byte"]) == want[0]
                assert int(row["byte_sum"]) == sum(want)
                p0 += sz


def test_sample_tables_use_co64_on_planted_quarter():
    """doc_id % 4 == 0 plants 64-bit co64 chunk offsets on the audio
    track (the >4 GiB-file form a real video corpus is full of): the
    box must actually be co64, and BOTH kernels must recover identical
    stats/digests through it."""
    from pg_bifrost_spark.operators.multimodal import (
        decode_mp4_samples,
        extract_mp4_samples,
    )

    built = _mp4_for([8, 9])  # 8 → co64 audio; 9 → stco audio
    p8 = bytes(built["payload"][0])
    p9 = bytes(built["payload"][1])
    assert b"co64" in p8 and b"co64" not in p9
    [dec] = list(decode_mp4_samples(iter([built])))
    assert sorted(zip(dec["doc_id"], dec["track_id"])) == [
        (8, 1), (8, 2), (9, 1), (9, 2),
    ]  # the co64 track decodes, not dropped
    [ext] = list(extract_mp4_samples(iter([built])))
    assert set(ext[ext["doc_id"] == 8]["track_id"]) == {1, 2}


def _minimal_mp4(sizes, stsc_runs, chunk_offsets, payload):
    """Hand-rolled single-track MP4 with an ARBITRARY stsc run map —
    the builder only emits one (1, 2, 1) run, so the general
    run-length path needs its own fixture."""
    import struct

    def box(btype, body):
        return struct.pack(">I", len(body) + 8) + btype + body

    def full(btype, body):
        return box(btype, b"\x00\x00\x00\x00" + body)

    tkhd = full(b"tkhd", struct.pack(">III", 0, 0, 9) + b"\x00" * 60)
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = full(
        b"stsc",
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", f, c, 1) for f, c in stsc_runs),
    )
    stco = full(
        b"stco",
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    trak = box(b"trak", tkhd + box(b"mdia", box(b"minf", box(b"stbl", stsz + stsc + stco))))
    head = box(b"ftyp", b"isom") + box(b"moov", trak)
    return head + box(b"mdat", payload)


def test_sample_extract_general_stsc_runs():
    """Multi-run stsc: chunk 1 holds one sample, chunks 2+ hold two —
    the extractor must expand the run map, not assume a constant
    samples-per-chunk."""
    from pg_bifrost_spark.operators.multimodal import extract_mp4_samples

    sizes = [10, 20, 30, 40, 50]
    # head length depends only on the box sizes (offsets are fixed words)
    probe = _minimal_mp4(sizes, [(1, 1), (2, 2)], [0, 0, 0], b"")
    data_at = len(probe)  # mdat body starts where the probe file ended
    offs = [data_at, data_at + 10, data_at + 60]  # s1 | s2 s3 | s4 s5
    payload = bytes(p % 256 for p in range(150))
    mp4 = _minimal_mp4(sizes, [(1, 1), (2, 2)], offs, payload)
    [out] = list(
        extract_mp4_samples(iter([pd.DataFrame({"doc_id": [42], "payload": [mp4]})]))
    )
    assert list(out["sample_bytes"]) == sizes
    assert list(out["first_byte"]) == [0, 10, 30, 60, 100]
    assert list(out["byte_sum"]) == [
        sum(range(0, 10)), sum(range(10, 30)), sum(range(30, 60)),
        sum(range(60, 100)), sum(range(100, 150)),
    ]


def test_sample_extract_drops_malformed():
    """Tampered tables degrade to drop-this-track: a sample running
    off the file, an stsc count past its box capacity, non-increasing
    run starts, and chunks that cannot cover the declared samples."""
    from pg_bifrost_spark.operators.multimodal import extract_mp4_samples

    def n_rows(mp4):
        [out] = list(
            extract_mp4_samples(
                iter([pd.DataFrame({"doc_id": [1], "payload": [mp4]})])
            )
        )
        return len(out)

    sizes = [10, 20]
    probe = _minimal_mp4(sizes, [(1, 2)], [0], b"")
    good = _minimal_mp4(sizes, [(1, 2)], [len(probe)], bytes(30))
    assert n_rows(good) == 2

    # (a) last sample runs past end-of-file
    assert n_rows(_minimal_mp4(sizes, [(1, 2)], [len(probe)], bytes(25))) == 0
    # (b) stsc claims more runs than its box holds
    import struct

    tampered = bytearray(good)
    at = good.index(b"stsc")
    tampered[at + 8 : at + 12] = struct.pack(">I", 1 << 30)
    assert n_rows(bytes(tampered)) == 0
    # (c) non-increasing first_chunk
    assert n_rows(_minimal_mp4(sizes, [(2, 1), (2, 1)], [len(probe)], bytes(30))) == 0
    # (d) one chunk of one sample cannot cover two declared samples
    assert n_rows(_minimal_mp4(sizes, [(1, 1)], [len(probe)], bytes(30))) == 0
    # (e) first run must cover chunk 1 (ISO-BMFF; code-review r10) —
    # a table starting at chunk 3 defines no mapping for chunks 1-2,
    # so expanding it anyway would slice undefined byte positions
    assert n_rows(_minimal_mp4(sizes, [(3, 2)], [len(probe)], bytes(30))) == 0


@_settings(max_examples=150, deadline=None)
@_given(data=_st.binary(min_size=0, max_size=400))
def test_mp4_and_jpeg_decoders_never_raise_on_arbitrary_bytes(data):
    """Mixed-corpus contract, fuzzed: ARBITRARY bytes must decode to
    None/empty, never raise — including bytes that start with valid
    magic and degrade into garbage."""
    from pg_bifrost_spark.operators.multimodal import (
        decode_jpeg_blocks,
        decode_mp4_samples,
        extract_mp4_samples,
    )

    for payload in (
        data,
        b"\xff\xd8" + data,          # JPEG SOI + garbage
        data[:4] + b"ftyp" + data,   # MP4-ish box + garbage
    ):
        r = decode_jpeg_blocks(payload)
        assert r is None or len(r) == 3
        for kernel in (decode_mp4_samples, extract_mp4_samples):
            [out] = list(
                kernel(iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})]))
            )
            assert len(out) >= 0  # reaching here == no raise


def test_png_resize_matches_direct_block_means():
    """The resize kernel's 2× box downsample equals the direct
    per-block integer mean over the planted gradient, including odd
    right/bottom edges (2×1 / 1×2 / 1×1 remainder blocks)."""
    from pg_bifrost_spark.operators.multimodal import (
        build_png_payloads,
        resize_png_pixels,
    )

    ids = [0, 1, 5, 13, 77]  # covers odd and even w/h
    [built] = list(build_png_payloads(iter([pd.DataFrame({"doc_id": ids})])))
    [rs] = list(resize_png_pixels(iter([built])))
    for doc_id in ids:
        w, h = 8 + doc_id % 8, 4 + doc_id % 4
        px = [(doc_id * 7 + i * 3) % 256 for i in range(w * h)]
        rw, rh = (w + 1) // 2, (h + 1) // 2
        exp = []
        for yy in range(rh):
            for xx in range(rw):
                block = [
                    px[y * w + x]
                    for y in range(2 * yy, min(2 * yy + 2, h))
                    for x in range(2 * xx, min(2 * xx + 2, w))
                ]
                exp.append(sum(block) // len(block))
        row = rs[rs.doc_id == doc_id].iloc[0]
        assert (row.rs_width, row.rs_height) == (rw, rh)
        assert row.sum_pix == sum(exp)
        assert row.wsum_pix == sum(i * v for i, v in enumerate(exp))


def test_png_resize_degrades_like_decoder():
    """Undecodable payloads pass through the resize kernel with the
    same fmt labels as the stats kernel and null features."""
    from pg_bifrost_spark.operators.multimodal import resize_png_pixels

    [out] = list(
        resize_png_pixels(
            iter([pd.DataFrame({"doc_id": [1, 2], "payload": [b"junk", b""]})])
        )
    )
    assert list(out["fmt"]) == ["unknown", "unknown"]
    assert out["rs_width"].isna().all() and out["sum_pix"].isna().all()


def test_audio_features_signs_clipping_peak():
    """Zero crossings count sign flips (s≥0 vs s<0, zero is
    non-negative), clipping counts both int16 rails, peak is the max
    |amplitude| — checked against a hand-built waveform."""
    import struct

    from pg_bifrost_spark.operators.multimodal import audio_feature_kernel

    def wav(samples, rate=8000):
        data = b"".join(struct.pack("<h", s) for s in samples)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    samples = [5, -3, 0, -1, 32767, -32768, 100]
    [out] = list(
        audio_feature_kernel(
            iter([pd.DataFrame({"doc_id": [9, 10], "payload": [wav(samples), b"x"]})])
        )
    )
    r = out.iloc[0]
    # flips: 5→-3, -3→0, 0→-1, -1→32767, 32767→-32768, -32768→100
    assert r.zero_crossings == 6
    assert r.n_clipped == 2 and r.peak == 32768 and r.n_samples == 7
    assert out.iloc[1].fmt == "unknown" and pd.isna(out.iloc[1].peak)
