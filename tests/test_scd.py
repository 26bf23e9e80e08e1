"""SCD2 merge: versioning, closing, idempotence on no-op updates."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators.scd import scd2_init, scd2_merge
from tests.conftest import SF_SMOKE

ATTRS = ["c_name", "c_nationkey", "c_mktsegment"]


def test_scd2_lifecycle(spark):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    t0, t1 = F.lit("2024-01-01 00:00:00"), F.lit("2024-02-01 00:00:00")
    dim = scd2_init(cust, "c_custkey", ATTRS, t0)
    n = cust.count()
    assert dim.count() == n
    assert dim.filter("is_current").count() == n

    # batch: 10 segment changes + 2 brand-new keys + rest unchanged
    changed = cust.filter(F.col("c_custkey") < 10).withColumn("c_mktsegment", F.lit("MOVED"))
    new = cust.filter(F.col("c_custkey") < 2).withColumn("c_custkey", F.col("c_custkey") + 1_000_000)
    unchanged = cust.filter(F.col("c_custkey") >= 10)
    updates = changed.unionByName(unchanged).unionByName(new)

    dim2 = scd2_merge(dim, updates, "c_custkey", ATTRS, t1)
    assert dim2.filter("is_current").count() == n + 2          # new keys current
    assert dim2.count() == n + 10 + 2                          # +10 new versions, +2 new keys
    closed = dim2.filter("NOT is_current")
    assert closed.count() == 10
    assert closed.select(F.max("valid_to")).collect()[0][0].strftime("%Y-%m-%d") == "2024-02-01"
    cur_moved = dim2.filter("is_current AND c_custkey < 10")
    assert cur_moved.filter("c_mktsegment = 'MOVED'").count() == 10

    # idempotence: merging the same batch again changes nothing
    dim3 = scd2_merge(dim2, updates, "c_custkey", ATTRS, F.lit("2024-03-01 00:00:00"))
    assert dim3.count() == dim2.count()
    assert dim3.filter("is_current").count() == dim2.filter("is_current").count()
