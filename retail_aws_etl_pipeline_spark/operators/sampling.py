"""Deterministic dataset-split / sampling operators for training pipelines.

Train/validation/test assignment must be a pure function of a stable row
identity — never ``rand()`` — so that (a) re-runs, backfills, and engine
changes preserve the split, and (b) an ANSI-SQL oracle can reproduce it
bit-for-bit. The bucket is the first 16 bits of ``md5(id)`` (hex chars 1-4)
taken mod ``SPLIT_BUCKETS``: uniform, deterministic, and computable in any
engine with md5 + string ops.

At 100 TB this is a scan-side projection: no shuffle, no state, prunes to
the id column; the split column can also serve as a partition key for
writing per-split datasets in one pass (``partitionBy("split")``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of hash buckets the id space is divided into.
SPLIT_BUCKETS = 100

#: Default split fractions in buckets (train=80%, valid=10%, test=10%).
TRAIN_BUCKETS = 80
VALID_BUCKETS = 10


def split_bucket(id_col: str = "doc_id") -> Column:
    """Deterministic bucket 0..SPLIT_BUCKETS-1 from the first 16 md5 bits."""
    hx = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
    return (hx.cast("long") % SPLIT_BUCKETS).alias("bucket")


def with_split_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    train_buckets: int = TRAIN_BUCKETS,
    valid_buckets: int = VALID_BUCKETS,
) -> DataFrame:
    """Add ``bucket`` (long) and ``split`` ('train'|'valid'|'test')."""
    bucket = split_bucket(id_col)
    split = (
        F.when(F.col("bucket") < train_buckets, F.lit("train"))
        .when(F.col("bucket") < train_buckets + valid_buckets, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


#: Token capacity of one packed training sequence.
PACK_CAPACITY = 2048


def with_pack_assignment(
    df: DataFrame,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = PACK_CAPACITY,
) -> DataFrame:
    """Sequential sequence packing: adds ``n_toks``, ``start``, ``pack_id``.

    Documents are laid into a contiguous token stream in ``id_col`` order
    within each shard; a document's pack is the ``capacity``-token chunk
    containing its FIRST token (``pack_id = start_offset div capacity``).
    Deterministic, integer-exact, and order-stable across engines.

    The window is partitioned by ``shard_col`` — at 100 TB a global-order
    running sum is a single-task bottleneck, so packing always runs within
    shards (language, split bucket, source); shards are independent
    training streams anyway.
    """
    from pyspark.sql import Window as W

    n_toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        W.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.withColumn("n_toks", n_toks)
        .withColumn("start", F.sum("n_toks").over(w) - F.col("n_toks"))
        .withColumn("pack_id", F.expr(f"start div {capacity}"))
    )
