"""PDF text extractor: spec-path unit tests + fuzz (the round trip and
the xref arithmetic are hash-gated by tests/test_oracle.py)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg_bifrost_spark.operators.multimodal import (
    PdfFormatError,
    _pdf_unescape,
    parse_pdf_text,
)


def _mini_pdf(stream: bytes, length: int | None = None) -> bytes:
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % (length if length is not None else len(stream))
        + stream
        + b"\nendstream\nendobj\n",
    ]
    b = b"%PDF-1.4\n"
    offs = []
    for o in objs:
        offs.append(len(b))
        b += o
    xref_off = len(b)
    b += b"xref\n0 5\n0000000000 65535 f \n"
    for o in offs:
        b += b"%010d 00000 n \n" % o
    b += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_off
    return b


def test_escapes_octal_and_control():
    assert _pdf_unescape(rb"a\(b\)c\\d") == "a(b)c\\d"
    assert _pdf_unescape(rb"x\n\t\r") == "x\n\t\r"
    assert _pdf_unescape(rb"\101\10\1Z") == "A\x08\x01Z"
    with pytest.raises(PdfFormatError, match="dangling escape"):
        _pdf_unescape(b"oops\\")


def test_balanced_nested_parens_and_multi_tj():
    n, xo, pc, text = parse_pdf_text(
        _mini_pdf(b"BT (a (nested) b) Tj (tail) Tj (not-shown) TL ET")
    )
    assert (n, pc) == (5, 1)
    assert text == "a (nested) btail"  # Tj concatenates; TL string ignored


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[2:], "missing %PDF header"),
        (lambda b: b.replace(b"startxref", b"startxre_"), "missing startxref"),
        (lambda b: b.replace(b"\nstartxref\n", b"\nstartxref\n9999"),
         "does not point at an xref"),
        (lambda b: b.replace(b"0000000009", b"0000000011"),
         "not the object"),
    ],
)
def test_structural_violations_raise(mutate, msg):
    good = _mini_pdf(b"BT (x) Tj ET")
    with pytest.raises(PdfFormatError, match=msg):
        parse_pdf_text(mutate(good))


def test_length_mismatch_raises():
    with pytest.raises(PdfFormatError, match="/Length"):
        parse_pdf_text(_mini_pdf(b"BT (x) Tj ET", length=3))


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_never_raises_other_exceptions(data):
    """Arbitrary bytes → PdfFormatError, never anything else — the
    repo's decoder standard (bounded: every declared count is
    capacity-checked before allocation)."""
    try:
        parse_pdf_text(data)
    except PdfFormatError:
        pass
