"""Z-order layout: the point is MEASURABLE data skipping on the
second dimension. We verify against the parquet footers themselves
(pyarrow): after z-ordering lineitem on (l_orderkey, l_partkey), a
range predicate on l_partkey alone must be able to skip most files,
while the linear orderkey-sorted layout can skip none."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from pg_bifrost_spark.sinks.zorder import zorder_value, zorder_write

N_FILES = 8


def _file_ranges(path: str, col: str):
    """(min, max) of ``col`` per parquet file, from footer statistics."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(col)
        lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
        hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
        out.append((lo, hi))
    return out


def test_zorder_skips_on_second_dimension(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    z_path = str(tmp_path / "z")
    lin_path = str(tmp_path / "lin")
    zorder_write(li, z_path, ["l_orderkey", "l_partkey"], N_FILES)
    li.repartitionByRange(N_FILES, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.mode("overwrite").parquet(lin_path)

    lo, hi = (r := li.agg({"l_partkey": "min"}).collect()[0][0]), None
    hi = li.agg({"l_partkey": "max"}).collect()[0][0]
    width = (hi - lo) // 8  # a 1/8-range box query on the SECOND dim
    box = (lo + 3 * width, lo + 4 * width)

    def files_hit(path):
        return sum(
            1 for (mn, mx) in _file_ranges(path, "l_partkey")
            if not (mx < box[0] or mn > box[1])
        )

    lin_hit, z_hit = files_hit(lin_path), files_hit(z_path)
    # linear layout: every file spans ~the full partkey range → no skip
    assert lin_hit == len(_file_ranges(lin_path, "l_partkey"))
    # z-order: a majority of files' partkey hypercubes miss the box.
    # (repartitionByRange samples boundaries with a seed derived from
    # the session's RDD id counter, so exact file splits jitter with
    # session history — assert the margin, not an exact count.)
    assert z_hit <= lin_hit * 5 // 8, (z_hit, lin_hit)
    # and the footer ranges themselves are categorically narrower:
    # total partkey width across z files < 60% of the linear layout's
    z_width = sum(mx - mn for mn, mx in _file_ranges(z_path, "l_partkey"))
    lin_width = sum(mx - mn for mn, mx in _file_ranges(lin_path, "l_partkey"))
    assert z_width < 0.6 * lin_width, (z_width, lin_width)
    # and the layout still helps the FIRST dimension too (curve
    # locality): an orderkey box must not hit every z file either
    ok_lo = li.agg({"l_orderkey": "min"}).collect()[0][0]
    ok_hi = li.agg({"l_orderkey": "max"}).collect()[0][0]
    ow = (ok_hi - ok_lo) // 8
    obox = (ok_lo + 3 * ow, ok_lo + 4 * ow)
    z_ok_hit = sum(
        1 for (mn, mx) in _file_ranges(z_path, "l_orderkey")
        if not (mx < obox[0] or mn > obox[1])
    )
    assert z_ok_hit < N_FILES

    # row identity: layout changes bytes, never content
    a = li.orderBy("l_orderkey", "l_partkey", "l_quantity").collect()
    b = (
        spark.read.parquet(z_path)
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
        .collect()
    )
    assert a == b


def test_zorder_value_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(0, 0), (1023, 0), (0, 1023), (1023, 1023), (512, 512)], "a long, b long"
    )
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min("a").alias("_min_a"), F.max("a").alias("_max_a"),
        F.min("b").alias("_min_b"), F.max("b").alias("_max_b"),
    )
    z = (
        df.crossJoin(F.broadcast(stats))
        .select("a", "b", zorder_value(["a", "b"], bits=8).alias("z"))
        .collect()
    )
    vals = {(r.a, r.b): r.z for r in z}
    assert vals[(0, 0)] == 0
    assert vals[(1023, 1023)] == (1 << 16) - 1  # all 16 interleaved bits set
    # corner points differ only in one dimension's bit lanes
    assert vals[(1023, 0)] | vals[(0, 1023)] == (1 << 16) - 1
    assert vals[(1023, 0)] & vals[(0, 1023)] == 0
