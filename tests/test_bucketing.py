"""Bucketed tables join without a shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators.bucketing import (
    append_gold_bucketed,
    bucketed_join,
    plan_has_exchange,
    publish_gold_bucketed,
    recompact_gold_bucketed,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def warehouse(spark, tmp_path):
    # warehouse.dir is a static conf; a temp-located database keeps bucketed
    # tables out of the repo tree instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS btest LOCATION '{tmp_path / 'wh'}'")
    spark.sql("USE btest")
    yield spark
    spark.sql("USE default")
    spark.sql("DROP DATABASE IF EXISTS btest CASCADE")


def test_bucketed_join_no_exchange(warehouse):
    spark = warehouse
    # disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumnRenamed(
            "o_orderkey", "orderkey"
        )
        lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
            "l_orderkey", "orderkey"
        )
        write_bucketed(orders, "b_orders", "orderkey", 8)
        write_bucketed(lineitem, "b_lineitem", "orderkey", 8)

        joined = bucketed_join(spark, "b_orders", "b_lineitem", "orderkey")
        assert not plan_has_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()

        # unbucketed control: the same join DOES shuffle
        control = orders.join(lineitem, "orderkey")
        assert plan_has_exchange(control)

        # and results match the plain join
        assert joined.count() == control.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_gold_recompaction_no_exchange(warehouse, tmp_path):
    """Gold maintenance on the bucketed layout: the keep-latest window runs
    straight off the bucketed scan (no Exchange of the existing table), and
    append → recompact converges to exactly-once per transaction_id."""
    spark = warehouse
    from pyspark.sql import Window as W

    def gold_rows(run_id, ts, ids):
        return (
            spark.range(len(ids))
            .select(
                F.concat(F.lit("T"), F.format_string("%04d", (F.col("id") + ids[0]))).alias(
                    "transaction_id"
                ),
                F.lit("S1").alias("store_id"),
                F.lit("2025-07-10 10:00:00").cast("timestamp").alias("timestamp"),
                F.lit("ITEM1").alias("item_id"),
                F.lit(2).cast("long").alias("quantity"),
                F.lit(5.0).alias("unit_price"),
                F.lit(10.0).alias("revenue"),
                F.lit(run_id).alias("ingest_run_id"),
                F.lit(ts).alias("ingest_ts"),
                F.md5(F.concat(F.lit(run_id), F.col("id").cast("string"))).alias("row_hash"),
            )
        )

    base = gold_rows("run1", "2025-07-20 00:00:00", list(range(0, 20)))
    gold_dir = str(tmp_path / "gold_flat")
    base.write.parquet(gold_dir)
    publish_gold_bucketed(spark, gold_dir, "b_gold", n_buckets=4)

    # the dedup window over the bucket key needs no shuffle of the table
    w = W.partitionBy("transaction_id").orderBy(F.desc("ingest_ts"))
    windowed = spark.table("b_gold").withColumn("rn", F.row_number().over(w))
    assert not plan_has_exchange(windowed), (
        windowed._jdf.queryExecution().executedPlan().toString()
    )

    # redeliver 10 overlapping ids with a newer ingest_ts, then recompact
    append_gold_bucketed(gold_rows("run2", "2025-07-21 00:00:00", list(range(10, 20))), "b_gold")
    assert spark.table("b_gold").count() == 30
    final = recompact_gold_bucketed(spark, "b_gold", n_buckets=4)
    assert final.count() == 20
    assert final.select("transaction_id").distinct().count() == 20
    winners = final.filter(F.col("transaction_id") >= "T0010")
    assert {r["ingest_run_id"] for r in winners.select("ingest_run_id").collect()} == {"run2"}
    # swapped-in table is still bucketed: window remains exchange-free
    rewindowed = spark.table("b_gold").withColumn("rn", F.row_number().over(w))
    assert not plan_has_exchange(rewindowed)


def test_append_reorders_columns_by_name(warehouse, tmp_path):
    """ADVICE r1: insertInto matches by POSITION — a batch whose columns
    arrive in a different order must land with fields in the right places,
    and a batch missing a table column must be rejected loudly."""
    spark = warehouse
    base = spark.range(3).select(
        F.concat(F.lit("A"), F.col("id").cast("string")).alias("k"),
        F.lit(1).cast("long").alias("v"),
        F.lit("x").alias("tag"),
    )
    write_bucketed(base, "b_reorder", "k", 2)

    scrambled = spark.range(2).select(
        F.lit("y").alias("tag"),
        F.lit(7).cast("long").alias("v"),
        F.concat(F.lit("B"), F.col("id").cast("string")).alias("k"),
    )
    append_gold_bucketed(scrambled, "b_reorder")
    got = spark.table("b_reorder").filter(F.col("k").startswith("B"))
    assert got.count() == 2
    assert {r["tag"] for r in got.collect()} == {"y"}
    assert {r["v"] for r in got.collect()} == {7}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing"):
        append_gold_bucketed(scrambled.drop("tag"), "b_reorder")


def test_recompact_recovers_from_crash_between_drop_and_rename(warehouse):
    """ADVICE r1: a crash between DROP TABLE and RENAME leaves only the
    __staged table; the next recompaction must finish the swap on entry
    instead of failing on the missing target."""
    spark = warehouse
    df = spark.range(4).select(
        F.concat(F.lit("T"), F.col("id").cast("string")).alias("transaction_id"),
        F.lit("2025-07-20 00:00:00").alias("ingest_ts"),
        F.md5(F.col("id").cast("string")).alias("row_hash"),
    )
    # simulate the crash window: staged exists, target does not
    write_bucketed(df, "b_crash__staged", "transaction_id", 2)
    assert not spark.catalog.tableExists("b_crash")
    final = recompact_gold_bucketed(spark, "b_crash", n_buckets=2)
    assert final.count() == 4
    assert spark.catalog.tableExists("b_crash")
    assert not spark.catalog.tableExists("b_crash__staged")

    # stale staged table alongside a live target is dropped, not swapped in
    write_bucketed(df.limit(1), "b_crash__staged", "transaction_id", 2)
    final2 = recompact_gold_bucketed(spark, "b_crash", n_buckets=2)
    assert final2.count() == 4
    assert not spark.catalog.tableExists("b_crash__staged")


def test_sorted_layout_enables_stats_pruning(spark, tmp_path):
    """The 100 TB data-layout lever: range-sorted writes give each file /
    row group a TIGHT min-max on the sort key, so a selective pushed
    filter lets the parquet reader skip almost everything; an unsorted
    layout interleaves the key everywhere and nothing can be skipped.
    Pinned via footer statistics (pyarrow) + pushed-filter plan check +
    result equality across layouts."""
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    df = (
        spark.range(0, 100_000)
        .withColumn("key", (F.col("id") * 48271) % 100_000)
        .withColumn("payload", F.md5(F.col("id").cast("string")))
    )
    sorted_dir = str(tmp_path / "sorted")
    unsorted_dir = str(tmp_path / "unsorted")
    df.repartitionByRange(10, "key").sortWithinPartitions("key").write.parquet(sorted_dir)
    df.repartition(10).write.parquet(unsorted_dir)

    def overlapping_files(path, lo, hi):
        import glob

        n_overlap, n_files = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            n_files += 1
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "key"
                )
                st = col.statistics
                if st.min <= hi and st.max >= lo:
                    n_overlap += 1
                    break
        return n_overlap, n_files

    lo, hi = 41_000, 41_500
    s_hit, s_total = overlapping_files(sorted_dir, lo, hi)
    u_hit, u_total = overlapping_files(unsorted_dir, lo, hi)
    assert s_total == u_total == 10
    assert s_hit <= 2, f"sorted layout should bound candidates, got {s_hit}"
    assert u_hit == u_total, "unsorted layout cannot skip anything"

    # the filter actually reaches the scan, and results agree across layouts
    pred = (F.col("key") >= lo) & (F.col("key") <= hi)
    got_s = spark.read.parquet(sorted_dir).filter(pred)
    got_u = spark.read.parquet(unsorted_dir).filter(pred)
    plan = got_s._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(key" in plan
    rows_s = sorted(r["id"] for r in got_s.collect())
    rows_u = sorted(r["id"] for r in got_u.collect())
    assert rows_s == rows_u and rows_s
