"""Slowly-changing-dimension (SCD2) merge without Delta/Iceberg.

The reference defers "SCD handling" (docs/gold_job.md:39-40). Without a
MERGE-capable table format, the idiomatic plain-parquet emulation (guide
'CDC / SCD2') is anti-join + union + window:

1. incoming updates are compared to the current version of each key;
   unchanged rows are dropped (hash compare — no attribute-by-attribute
   SQL);
2. changed/new keys produce a new version row (``valid_from = effective``,
   open-ended ``valid_to``);
3. the previous current row of a changed key is closed
   (``valid_to = effective``);
4. everything else carries over untouched.

The result is a full rewritten dimension snapshot — at scale, partition
the dimension by a stable bucket of the key and rewrite only buckets that
contain changed keys (dynamic partition overwrite), exactly like the gold
compaction path.

All window orderings carry deterministic tiebreaks; the version hash uses
the same null-safe '||' canonical form as the gold row_hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 00:00:00"


def _attr_hash(attrs: list[str]) -> Column:
    return F.md5(
        F.concat_ws("||", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in attrs])
    )


def scd2_init(snapshot: DataFrame, key: str, attrs: list[str], effective: Column) -> DataFrame:
    """Bootstrap a versioned dimension from an initial snapshot."""
    return snapshot.select(
        key,
        *attrs,
        effective.cast("timestamp").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
        _attr_hash(attrs).alias("attr_hash"),
    )


def scd2_merge(
    dim: DataFrame, updates: DataFrame, key: str, attrs: list[str], effective: Column
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension; returns the new full
    dimension state (same schema as ``scd2_init``)."""
    updates_h = updates.select(
        key, *attrs, _attr_hash(attrs).alias("u_hash")
    )

    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    joined = updates_h.alias("u").join(
        current.select(key, F.col("attr_hash").alias("c_hash")).alias("c"), key, "left"
    )
    real_changes = joined.filter(
        F.col("c_hash").isNull() | (F.col("u_hash") != F.col("c_hash"))
    )

    new_versions = real_changes.select(
        key,
        *attrs,
        effective.cast("timestamp").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.col("u_hash").alias("attr_hash"),
    )

    changed_keys = real_changes.select(key)
    closed = (
        current.join(F.broadcast(changed_keys), key, "left_semi")
        .withColumn("valid_to", effective.cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = current.join(F.broadcast(changed_keys), key, "left_anti")

    return history.unionByName(closed).unionByName(untouched_current).unionByName(new_versions)
