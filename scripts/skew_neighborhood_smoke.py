#!/usr/bin/env python
"""Sorted-neighborhood blocking under adversarial KEY SKEW (VERDICT r7 #4).

The sf0.1 corpus under-stresses the rank-space banding: langs are roughly
balanced and n_chars is smooth, so the blocking key (lang, n_chars, doc_id)
is nearly unique and the RangePartitioner's job is easy. A production
entity-resolution corpus is the opposite — one dominant language and a
MODAL length (fixed-width exports, tweet-length caps), i.e. a giant tie
mass on the first two sort keys. This script builds that corpus and
measures whether the operator's two skew-sensitive stages hold:

1. `repartitionByRange(partitions, lang, n_chars, doc_id)` — ties on
   (lang, n_chars) can only be split by the doc_id tiebreaker; if the
   sampler mishandles the tie mass, one range partition swallows it and
   the per-partition row_number serializes.
2. the block join — blocks are `window` ranks wide BY CONSTRUCTION, so it
   should be immune to value skew entirely (that is the point of moving
   from value space to rank space); the measurement proves it.

Usage: python scripts/skew_neighborhood_smoke.py [K] [out_dir]

Writes one JSON line: uniform-vs-skewed wall clock at the same K, plus the
range-partition balance (max/mean rows) under skew.  Findings land in
SCALING.md; this script is the reproducer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_aws_etl_pipeline_spark.operators import dedup as D  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"

#: The registered query's constants (plans/extensions.py).
SN_WINDOW = 8

#: Skew profile: one dominant lang + one modal length.
DOMINANT_LANG_PCT = 90  # % of docs forced to 'en'
MODAL_LEN_PCT = 60      # % of docs truncated/padded to exactly MODAL_LEN
MODAL_LEN = 280         # the tweet-cap classic


def synthesize(spark, k: int, out_dir: str, skewed: bool) -> str:
    """K key-shifted replicas of the sf0.1 documents table; the skewed
    variant then forces the lang/length marginals. Text is rewritten with
    the scale_smoke per-replica token so replicas are distinct documents,
    and n_chars is recomputed after any truncation/padding (the table
    contract: n_chars == length(text))."""
    tag = "skew" if skewed else "uniform"
    dst = os.path.join(out_dir, f"documents_{tag}_x{k}.parquet")
    if os.path.exists(dst):
        return dst
    df = spark.read.parquet(SRC)
    off = df.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(k):
        r = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * off))
        if i > 0:
            r = r.withColumn(
                "text",
                F.expr(
                    "array_join(transform(split(text, ' '), "
                    f"(x, j) -> IF(j % 3 = {i % 3}, concat(x, '{i}q'), x)), ' ')"
                ),
            )
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    if skewed:
        out = (
            out.withColumn(
                "lang",
                F.when(
                    F.pmod(F.col("doc_id"), 100) < DOMINANT_LANG_PCT, F.lit("en")
                ).otherwise(F.col("lang")),
            )
            .withColumn(
                "text",
                F.when(
                    F.pmod(F.col("doc_id"), 100) < MODAL_LEN_PCT,
                    F.rpad(F.substring("text", 1, MODAL_LEN), MODAL_LEN, "x"),
                ).otherwise(F.col("text")),
            )
            .withColumn("n_chars", F.length("text").cast(out.schema["n_chars"].dataType))
        )
    out.write.mode("overwrite").parquet(dst)
    return dst


def run_once(spark, path: str, partitions: int | None) -> dict:
    docs = spark.read.parquet(path)
    kwargs = {} if partitions is None else {"partitions": partitions}
    t0 = time.perf_counter()
    cands = D.sorted_neighborhood_candidates(
        docs, [F.asc("lang"), F.asc("n_chars"), F.asc("doc_id")], window=SN_WINDOW, **kwargs
    )
    n = cands.count()
    wall = time.perf_counter() - t0
    from retail_aws_etl_pipeline_spark.operators.caching import release_caches

    release_caches(cands)
    return {"sec": round(wall, 2), "n_candidates": n}


def partition_balance(spark, path: str, partitions: int) -> dict:
    docs = spark.read.parquet(path)
    sizes = (
        docs.repartitionByRange(
            partitions, F.asc("lang"), F.asc("n_chars"), F.asc("doc_id")
        )
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.avg("count").alias("mean"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .collect()[0]
    )
    return {
        "n_parts": sizes["n_parts"],
        "max_rows": sizes["mx"],
        "mean_rows": round(sizes["mean"], 1),
        "max_over_mean": round(sizes["mx"] / sizes["mean"], 2),
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/snskew_x{k}"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="skew_neighborhood_smoke")

    uni = synthesize(spark, k, out_dir, skewed=False)
    skw = synthesize(spark, k, out_dir, skewed=True)

    repeats = max(1, int(os.environ.get("SMOKE_REPEATS", "3")))
    report = {"k": k, "window": SN_WINDOW}
    for tag, path in (("uniform", uni), ("skewed", skw)):
        best = None
        for _ in range(repeats):
            r = run_once(spark, path, partitions=None)
            spark.catalog.clearCache()
            best = r if best is None or r["sec"] < best["sec"] else best
        report[tag] = best
        print(f"  {tag}: {best}", file=sys.stderr)
    report["skew_balance"] = partition_balance(spark, skw, 16)
    report["ratio_skew_over_uniform"] = round(
        report["skewed"]["sec"] / report["uniform"]["sec"], 2
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
