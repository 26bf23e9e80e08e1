"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Writing both
sides bucketed by the join key (`bucketBy(n, key).sortBy(key)`) fixes the
partitioning at rest, so later equi-joins on that key plan as sort-merge
joins WITHOUT an Exchange on either side — verified by
``tests/test_bucketing.py`` asserting no Exchange appears in the physical
plan.

Bucketed tables require a catalog (``saveAsTable``); in local mode the
default spark-warehouse + in-memory catalog suffices. Bucket count: total
data size / target partition size (aim 128-512 MB per bucket), and keep it
IDENTICAL on both sides of the intended join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed+sorted catalog table."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left: str, right: str, on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange (diagnostic)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
