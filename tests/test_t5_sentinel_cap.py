"""T5 span corruption: the sentinel vocabulary is <extra_id_0>..
<extra_id_{99}> — a document with more than SENTINEL_LIMIT blocks must
stop corrupting at block 100 (later text passes through uncorrupted)
rather than emit sentinels that do not exist in the T5 vocabulary."""

from __future__ import annotations

import re

import pandas as pd
import pytest

import pg_bifrost_spark.plans as plans
from pg_bifrost_spark.operators.selection import (
    CORRUPT_BLOCK,
    CORRUPT_SPAN,
    SENTINEL_LIMIT,
    t5_span_corruption,
)

plans.load_all()

N_TOKENS = CORRUPT_BLOCK * (SENTINEL_LIMIT + 40)  # 140 blocks, all maskable


@pytest.fixture(scope="module")
def long_doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("t5cap")
    text = " ".join(f"w{i}" for i in range(N_TOKENS))
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": [len(text)],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_sentinels_stay_inside_t5_vocabulary(spark, long_doc_dir):
    row = t5_span_corruption(spark, long_doc_dir).collect()[0]
    ids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", row["corrupted_text"])]
    assert ids, "cap test is vacuous — no spans were masked at all"
    assert max(ids) <= SENTINEL_LIMIT - 1
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    # exactly the first SENTINEL_LIMIT blocks are masked (all 140
    # blocks here are full-length, hence maskable pre-cap)
    assert row["n_spans"] == SENTINEL_LIMIT
    assert row["n_masked"] == SENTINEL_LIMIT * CORRUPT_SPAN
    # targets carry the same capped sentinel set
    tids = [int(m) for m in re.findall(r"<extra_id_(\d+)>", row["targets_text"])]
    assert tids == ids
    # past-the-cap text is untouched: the tail tokens survive verbatim
    assert f"w{N_TOKENS - 1}" in row["corrupted_text"]
    corrupted_tokens = row["corrupted_text"].split(" ")
    tail_start = SENTINEL_LIMIT * CORRUPT_BLOCK
    expected_tail = [f"w{i}" for i in range(tail_start, N_TOKENS)]
    assert corrupted_tokens[-len(expected_tail) :] == expected_tail


def test_lexical_score_survives_wide_vocabulary(spark):
    """The shared lexical-diversity score must multiply in BIGINT: a
    document with >2147 distinct tokens would wrap a 32-bit product
    (size() is INT) into garbage while the DuckDB twin stays correct."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pg_bifrost_spark.operators.text import _tokens, lexical_diversity_ppm

    text = " ".join(f"tok{i}" for i in range(3000))
    df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    row = df.withColumn("toks", _tokens()).select(
        lexical_diversity_ppm().alias("score")
    ).collect()[0]
    assert row["score"] == 1_000_000  # all distinct, exact — not wrapped
