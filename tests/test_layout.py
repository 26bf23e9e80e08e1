"""Z-order layout (operators/layout.py): multi-column data skipping.

Verified the way the single-key lever is (test_bucketing.py): from the
actual parquet footers, not timings — a Z-ordered table must keep
min-max tight on EVERY clustering column, where a single-key sort is
tight on its key and useless on everything else. Results must be
layout-invariant.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators.layout import zorder_key, zorder_write


def _overlapping_files(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    n_overlap, n_files = 0, 0
    for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        n_files += 1
        for rg in range(md.num_row_groups):
            c = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            st = c.statistics
            if st.min <= hi and st.max >= lo:
                n_overlap += 1
                break
    return n_overlap, n_files


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    df = (
        spark.range(0, 100_000)
        .withColumn("a", (F.col("id") * 48271) % 100_000)
        .withColumn("b", (F.col("id") * 69621) % 100_000)
        .withColumn("payload", F.md5(F.col("id").cast("string")))
    )
    a_dir = str(tmp_path / "sorted_a")
    z_dir = str(tmp_path / "zorder_ab")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(a_dir)
    )
    zorder_write(df, z_dir, ["a", "b"], n_files=16)

    lo, hi = 41_000, 41_500  # 0.5% of either axis

    # single-key layout: tight on a, blind on b
    a_on_a, n1 = _overlapping_files(a_dir, "a", lo, hi)
    a_on_b, _ = _overlapping_files(a_dir, "b", lo, hi)
    assert n1 == 16
    assert a_on_a <= 2
    assert a_on_b == 16, "a-sorted layout cannot skip anything on b"

    # z-order: tight on BOTH. Files are grid-aligned by construction
    # (one directory per top-bit cell), so a 0.5%-of-axis range lies in
    # ONE strip of the 4x4 grid -> exactly 4 cells overlap per axis.
    # Deterministic: partitionBy routing is a pure function of values
    # (two repartitionByRange drafts flaked here on sampling).
    z_on_a, n2 = _overlapping_files(z_dir, "a", lo, hi)
    z_on_b, _ = _overlapping_files(z_dir, "b", lo, hi)
    assert n2 == 16
    assert z_on_a <= 4, f"z-layout should confine a to one grid strip, got {z_on_a}"
    assert z_on_b <= 4, f"z-layout should confine b to one grid strip, got {z_on_b}"

    # results are layout-invariant and the filter reaches the scan
    pred = (F.col("b") >= lo) & (F.col("b") <= hi)
    got_z = spark.read.parquet(z_dir).filter(pred)
    got_a = spark.read.parquet(a_dir).filter(pred)
    plan = got_z._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(b" in plan
    rz = sorted(r["id"] for r in got_z.collect())
    ra = sorted(r["id"] for r in got_a.collect())
    assert rz == ra and rz


def test_zorder_key_interleaves_bits(spark):
    """Exact Morton property on handcrafted values: key bits alternate
    between the two inputs (bit b of col i at position 2b + i)."""
    rows = [(0b1011, 0b0110)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")
    ).collect()[0]["z"]

    def ref(x, y, bits=4):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == ref(0b1011, 0b0110)


def test_zorder_constant_column_degenerates_safely(spark, tmp_path):
    """A constant clustering column contributes zero bits (span == 0)
    instead of dividing by zero; the write still succeeds and the other
    column still prunes."""
    df = (
        spark.range(0, 10_000)
        .withColumn("a", (F.col("id") * 48271) % 10_000)
        .withColumn("c", F.lit(7))
    )
    out = str(tmp_path / "z_const")
    zorder_write(df, out, ["a", "c"], n_files=8)
    # the constant axis contributes zero bits, so only the varying
    # axis's top bits produce distinct cells (fewer, non-empty dirs)
    hit, total = _overlapping_files(out, "a", 100, 150)
    assert 1 <= total <= 8 and hit < total
    assert spark.read.parquet(out).count() == 10_000
