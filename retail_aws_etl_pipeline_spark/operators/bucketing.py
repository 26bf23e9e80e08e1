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


# ---------------------------------------------------------------------------
# Bucketed gold: fact_sales at rest bucketed by its dedup/join key
# ---------------------------------------------------------------------------
#
# The directory-partitioned gold (operators/compact.py) prunes by date but
# re-shuffles every recompaction on (date, transaction_id). Bucketing gold
# by transaction_id fixes hash(transaction_id) AT REST, so the keep-latest
# window — ClusteredDistribution(transaction_id) — is satisfied straight off
# the scan: recompaction shuffles ZERO bytes of the existing table (only a
# within-partition sort remains), and every equi-join/groupBy on
# transaction_id is likewise exchange-free. At 100 TB that's the difference
# between rewriting the cluster interconnect per maintenance run and a
# local sort. New batches pay one delta-sized shuffle on bucketed append.


def publish_gold_bucketed(
    spark: SparkSession, gold_path: str, table: str = "fact_sales_bucketed", n_buckets: int = 16
) -> None:
    """Publish directory-partitioned gold as a bucketed catalog table."""
    write_bucketed(
        spark.read.parquet(gold_path), table, "transaction_id", n_buckets=n_buckets
    )


def append_gold_bucketed(batch_df: DataFrame, table: str = "fact_sales_bucketed") -> None:
    """Append a silver-shaped batch into the bucketed layout (at-least-once
    transport: duplicates are absorbed by the next recompaction). Spark
    clusters the appended files into the table's existing bucket spec — the
    shuffle is sized by the DELTA, never the table.

    ``insertInto`` matches columns by POSITION, not name — project the
    batch into the published table's column order first, so a batch built
    in a different order cannot be silently written with scrambled fields.
    """
    spark = batch_df.sparkSession
    table_cols = spark.table(table).columns
    missing = set(table_cols) - set(batch_df.columns)
    if missing:
        raise ValueError(f"batch is missing bucketed-table columns: {sorted(missing)}")
    batch_df.select(*table_cols).write.mode("append").format("parquet").insertInto(table)


def recompact_gold_bucketed(
    spark: SparkSession, table: str = "fact_sales_bucketed", n_buckets: int = 16
) -> DataFrame:
    """Keep-latest dedup of the bucketed gold WITHOUT shuffling it.

    Returns the deduped frame (window over the bucket key, exchange-free —
    asserted in tests/test_bucketing.py) and swaps it in as ``table`` via a
    staged table + rename, the catalog analog of compact.py's dynamic
    partition overwrite.

    The swap is DROP TABLE + RENAME — in a catalog without atomic swap
    there is an unavoidable window between the two statements where the
    target name does not exist (data is safe under the ``__staged`` name).
    Recovery is on ENTRY: if a previous run crashed inside the window, the
    orphaned staged table is renamed into place before any new work; a
    stale staged table alongside a live target is dropped.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    staged = f"{table}__staged"
    if spark.catalog.tableExists(staged):
        if not spark.catalog.tableExists(table):
            # previous run crashed between DROP and RENAME: finish its swap
            spark.sql(f"ALTER TABLE {staged} RENAME TO {table}")
        else:
            # previous run crashed before its DROP: staged result is stale
            spark.sql(f"DROP TABLE {staged}")
    existing = spark.table(table)
    w = W.partitionBy("transaction_id").orderBy(
        F.desc(F.coalesce(F.col("ingest_ts").try_cast("timestamp"), F.lit("1970-01-01").cast("timestamp"))),
        F.desc("row_hash"),
    )
    deduped = (
        existing.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    write_bucketed(deduped, staged, "transaction_id", n_buckets=n_buckets)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {staged} RENAME TO {table}")
    return spark.table(table)
