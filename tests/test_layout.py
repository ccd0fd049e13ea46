"""Z-order layout — operators/layout.py."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from polygon_algotrading_env_spark.operators.layout import (
    write_zordered,
    zorder_value,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pae_zorder_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_zorder_value_interleaves_bits(spark):
    # 2-bit interleave of (x, y) on the 0..3 grid is the classic Morton
    # curve: z = y1 x1 y0 x0 (x in even bit positions, y in odd).
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_value(df, ["x", "y"], bits=2)).collect()
    }

    def morton(x, y):
        return sum(((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
                   for i in range(2))

    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_rejects_bad_shapes(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    with pytest.raises(ValueError, match=">= 2"):
        zorder_value(df, ["a"])
    with pytest.raises(ValueError, match="bigint"):
        zorder_value(df, ["a", "b", "c"], bits=32)


def test_zorder_rejects_null_bounds(spark):
    empty = spark.createDataFrame([], "a int, b int")
    with pytest.raises(ValueError, match="NULL"):
        zorder_value(empty, ["a", "b"])
    all_null = spark.createDataFrame([(1, None), (2, None)], "a int, b int")
    with pytest.raises(ValueError, match="'b'"):
        zorder_value(all_null, ["a", "b"])


def _file_ranges(spark, path, col):
    """(max-min) spread of ``col`` within each parquet file."""
    df = (
        spark.read.parquet(path)
        .withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg((F.max(col) - F.min(col)).alias("spread"))
    )
    return [r["spread"] for r in df.collect()]


def test_zordered_files_tight_in_all_dims(spark, tmpdir):
    """The point of z-order: per-file min/max stats are narrow in EVERY
    participating dimension, so filters on any of them skip files. A
    single-column sort gives narrow stats only for that column."""
    n = 1 << 14
    df = (
        spark.range(n)
        .withColumn("x", (F.xxhash64("id") % n + n) % n)
        .withColumn("y", (F.xxhash64("id", F.lit(1)) % n + n) % n)
    )
    zpath, spath = f"{tmpdir}/z", f"{tmpdir}/s"
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=8)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    zx = sum(_file_ranges(spark, zpath, "x")) / 16
    zy = sum(_file_ranges(spark, zpath, "y")) / 16
    sx = sum(_file_ranges(spark, spath, "x")) / 16
    sy = sum(_file_ranges(spark, spath, "y")) / 16
    # x-sorted: tight in x, full-range in y.
    assert sx < 0.2 * n and sy > 0.8 * n
    # z-ordered: materially tight in BOTH dims (16 files ≈ 4x4 z-tiles →
    # each file spans about a quarter of each axis).
    assert zx < 0.5 * n and zy < 0.5 * n
    # And it must actually beat the single-sort layout on the neglected dim.
    assert zy < 0.6 * sy


def test_zordered_roundtrip_preserves_rows(spark, tmpdir):
    df = spark.range(1000).withColumn("x", F.col("id") % 37).withColumn(
        "y", F.col("id") % 11
    )
    write_zordered(df, f"{tmpdir}/t", ["x", "y"], n_files=4, bits=8)
    back = spark.read.parquet(f"{tmpdir}/t")
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2


def test_repartition_for_target_size(spark, sf_dir):
    """The stats-driven sizing knob: partition count scales inversely
    with the target size, honors the floor, and the data survives
    unchanged; hash mode co-locates keys."""
    from polygon_algotrading_env_spark.catalog import load_table
    from polygon_algotrading_env_spark.operators.layout import (
        estimated_size_bytes,
        repartition_for_target_size,
    )

    li = load_table(spark, sf_dir, "lineitem")
    est = estimated_size_bytes(li)
    assert est > 0

    small = repartition_for_target_size(li, target_mb=1)
    big = repartition_for_target_size(li, target_mb=10_000)
    n_small = small.rdd.getNumPartitions()
    n_big = big.rdd.getNumPartitions()
    assert n_small >= n_big == 1
    assert small.count() == li.count()

    keyed = repartition_for_target_size(
        li, target_mb=1, by=["l_orderkey"], min_partitions=4
    )
    assert keyed.rdd.getNumPartitions() >= 4
    # same key never splits across partitions under hash mode
    import pyspark.sql.functions as F

    spread = (
        keyed.withColumn("__p", F.spark_partition_id())
        .groupBy("l_orderkey")
        .agg(F.countDistinct("__p").alias("np"))
        .agg(F.max("np"))
        .first()[0]
    )
    assert spread == 1
