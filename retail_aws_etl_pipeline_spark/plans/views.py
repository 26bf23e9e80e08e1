"""The analyst SQL surface: Athena/Glue-catalog analog over the lake.

Entry point 3 of the reference (SURVEY.md §3.3): analysts query
``retail_db.fact_sales`` through Athena. Here the whole path collapses to
Spark SQL — gold registered as a view, identical SQL through Catalyst,
partition pruning on ``date`` native. The two published Athena queries
(docs/athena_queries.md:23-38) are provided as canned functions plus a
passthrough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from retail_aws_etl_pipeline_spark.lake import LakeLayout


def register_lake_views(spark: SparkSession, lake: LakeLayout) -> None:
    """Register silver + gold as temp views (the Glue-crawler analog,
    docs/glue_crawlers.md — no crawler needed: schema travels with
    parquet, partitions discovered on read; manifested zones are served
    from their snapshot)."""
    from retail_aws_etl_pipeline_spark.operators.compact import read_gold, read_silver

    read_silver(spark, lake).createOrReplaceTempView("silver_sales")
    read_gold(spark, lake).createOrReplaceTempView("fact_sales")


def daily_revenue_gold(spark: SparkSession) -> DataFrame:
    """docs/athena_queries.md:24-28 verbatim (A5), exact-decimal sum."""
    return spark.sql(
        """
        SELECT date,
               CAST(SUM(CAST(revenue AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        FROM fact_sales
        GROUP BY date
        ORDER BY date DESC
        """
    )


def top_items_gold(spark: SparkSession, k: int = 10) -> DataFrame:
    """docs/athena_queries.md:31-38 (A6) with a deterministic tiebreak."""
    return spark.sql(
        f"""
        SELECT item_id,
               CAST(SUM(CAST(revenue AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        FROM fact_sales
        GROUP BY item_id
        ORDER BY revenue DESC, item_id ASC
        LIMIT {k}
        """
    )


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Plain SQL passthrough over the registered views."""
    return spark.sql(query)
