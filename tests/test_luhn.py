"""Luhn card scan: the checksum arithmetic vs an independent Python
implementation, and the planted valid/invalid split (exact values are
hash-gated by tests/test_oracle.py)."""

from pg_bifrost_spark.plans import QUERIES, load_all

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _luhn_ok(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_planted_split_matches_reference(spark):
    rows = QUERIES["pii_luhn_cards"](spark, SF_DIR).collect()
    for r in rows:
        mod = r["doc_id"] % 4
        if mod == 0:
            assert (r["n_candidates"], r["n_valid_cards"]) == (1, 1), r
            assert "<CARD>" in r["redacted"]
        elif mod == 1:
            assert (r["n_candidates"], r["n_valid_cards"]) == (1, 0), r
            assert "<CARD>" not in r["redacted"]  # checksum saved it
            # the surviving candidate really fails Luhn
            tail = r["redacted"].rsplit(" ", 1)[1]
            assert len(tail) == 16 and not _luhn_ok(tail)
        else:
            assert r["n_valid_cards"] == 0


def test_valid_plants_pass_independent_luhn(spark):
    """Recompute the planted check digit in pure Python and confirm the
    engine's arithmetic produced genuinely Luhn-valid numbers."""
    for doc_id in (0, 4, 8, 100):
        body = str(doc_id * 7919 % 10**15).zfill(15)
        # engine formula: check = (10 - luhn_sum(body||'0') % 10) % 10
        total = 0
        for i, ch in enumerate(reversed(body + "0")):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - 9 if d * 2 > 9 else d * 2
            total += d
        check = (10 - total % 10) % 10
        assert _luhn_ok(body + str(check))
        assert not _luhn_ok(body + str((check + 5) % 10))
