"""Bucketed tables join without a shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators.bucketing import (
    bucketed_join,
    plan_has_exchange,
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
