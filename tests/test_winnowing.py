"""Pin the winnowing fingerprint selection against an independent
single-node implementation written from the MOSS paper's definition
(Schleimer, Wilkerson & Aiken, SIGMOD'03): k-gram polynomial hashes,
window of w consecutive hashes, select the RIGHTMOST MINIMUM of each
window. The gate oracle restates the same algorithm in SQL; this test
proves the integer-key encoding (h·2^20 + inverted position) actually
implements rightmost-minimum, including ties."""

from __future__ import annotations

from pg_bifrost_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_MOD,
    WINNOW_PREFIX,
    WINNOW_W,
    _WINNOW_POW,
    _winnow_fingerprints,
)


def reference_winnow(text: str) -> tuple[int, set[int]]:
    """(n_kgrams, selected fingerprint set) per the paper: for every
    window of WINNOW_W consecutive k-gram hashes, select the minimum,
    breaking ties by RIGHTMOST position."""
    # ASCII-only case fold, mirroring the op's explicit translate —
    # full lower() is locale-sensitive and differs across engines
    t = text.translate(
        str.maketrans(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
        )
    )[:WINNOW_PREFIX]
    m = max(len(t) - (WINNOW_K - 1), 0)
    hashes = [
        sum(ord(t[p + j]) * _WINNOW_POW[j] for j in range(WINNOW_K)) % WINNOW_MOD
        for p in range(m)
    ]
    selected: set[int] = set()
    for s in range(m - WINNOW_W + 1):
        window = hashes[s : s + WINNOW_W]
        mn = min(window)
        # rightmost position achieving the minimum
        r = max(i for i, h in enumerate(window) if h == mn)
        selected.add(window[r])
    return m, selected


def _spark_winnow(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    rows = _winnow_fingerprints(df).collect()
    for r in rows:
        # the fps ARRAY itself must be duplicate-free: n_fingerprints
        # is size(fps), and a same-hash-two-positions selection that
        # dedupes only as a set inflates it (caught live in r10 when
        # the kernel uniqued keys before dividing the position out)
        assert len(r["fps"]) == len(set(r["fps"])), r
    return {r["doc_id"]: (r["n_kgrams"], set(r["fps"])) for r in rows}


def test_selection_matches_reference_on_fixture_text(spark):
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 40"
        ).fetchall()
    ]
    got = _spark_winnow(spark, texts)
    for i, t in enumerate(texts):
        m, want = reference_winnow(t)
        assert got[i] == (m, want), f"doc {i}"


def test_rightmost_tie_break_and_short_docs(spark):
    """A repeated k-gram inside one window forces an exact hash tie —
    the rightmost occurrence must win (one fingerprint, not a
    left-biased different selection); docs shorter than k+w-1 chars
    yield zero fingerprints but still report their k-gram count."""
    rep = "abcdefghijklmnop"  # one full k-gram (k=16)
    tie_doc = rep + rep + rep  # hash sequence has exact repeats
    short = "tiny"
    kgram_only = "x" * (WINNOW_K + WINNOW_W - 2)  # m = w-1: no full window
    got = _spark_winnow(spark, [tie_doc, short, kgram_only])
    for i, t in enumerate([tie_doc, short, kgram_only]):
        m, want = reference_winnow(t)
        assert got[i] == (m, want), f"case {i}"
    assert got[1] == (0, set())
    assert got[2][0] > 0 and got[2][1] == set()


def test_non_ascii_casefold_matches_oracle_semantics(spark):
    """Locale trap pinned (code-review r10): JVM/Python lower() turns
    U+0130 'İ' into TWO codepoints while DuckDB lower() yields ONE —
    so the op case-folds via an explicit ASCII translate in BOTH
    engines. A doc containing 'İ' must fingerprint identically to the
    reference (which uses the same ASCII-only fold), with the 'İ'
    passing through un-lowered."""
    base = "The Quick Brown Fox Jumps Over The Lazy Dog Again"
    doc = "İstanbul DEDUP corpus İİ " + base
    got = _spark_winnow(spark, [doc])
    m, want = reference_winnow(doc)
    assert got[0] == (m, want)
    # and DuckDB's translate produces the exact same folded string —
    # the cross-engine parity lower() cannot give on this input
    import duckdb

    folded = duckdb.sql(
        "SELECT translate(?, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        " 'abcdefghijklmnopqrstuvwxyz')",
        params=[doc],
    ).fetchone()[0]
    py_folded = doc.translate(
        str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")
    )
    assert folded == py_folded and "İ" in folded
    assert duckdb.sql("SELECT length(lower('İ'))").fetchone()[0] == 1  # the trap
