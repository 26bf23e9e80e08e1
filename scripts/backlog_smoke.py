#!/usr/bin/env python
"""Measure compact_pending on a many-pending-date backlog (ROADMAP #5).

Synthesizes a silver layout with N_DATES hive partitions (M rows each),
then times gold compaction one-plan vs chunked. The interesting axis is
partition COUNT (directory creation, dynamic-overwrite commit, window
groups), not row volume.

Usage: python scripts/backlog_smoke.py [n_dates] [rows_per_date] [chunk_sizes...]
Prints one JSON line per configuration on stdout (logs → stderr).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

_REAL_STDOUT_FD = os.dup(1)
os.dup2(2, 1)


def emit(obj) -> None:
    os.write(_REAL_STDOUT_FD, (json.dumps(obj) + "\n").encode())


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_aws_etl_pipeline_spark.lake import LakeLayout  # noqa: E402
from retail_aws_etl_pipeline_spark.operators.compact import compact_pending  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402


def synth_silver(spark, lake: LakeLayout, n_dates: int, rows_per_date: int) -> None:
    from pyspark.sql import functions as F

    base = dt.date(2020, 1, 1)
    dates = [(base + dt.timedelta(days=d)).isoformat() for d in range(n_dates)]
    df = (
        spark.createDataFrame([(d,) for d in dates], ["date"])
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(rows_per_date - 1))))
        .select(
            F.concat(F.col("date"), F.lit("_"), F.col("i")).alias("transaction_id"),
            F.lit("S1").alias("store_id"),
            F.concat(F.col("date"), F.lit(" 10:00:00")).alias("ingest_ts"),
            F.lit("2").alias("quantity"),
            F.lit("5.00").alias("unit_price"),
            F.lit("10.00").alias("revenue"),
            F.to_timestamp(F.concat(F.col("date"), F.lit(" 09:00:00"))).alias("timestamp"),
            "date",
        )
    )
    df.repartition(32, "date").write.partitionBy("date").parquet(lake.processed)


def main() -> None:
    n_dates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rows_per_date = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    chunk_sizes = [int(a) for a in sys.argv[3:]] or [None, 100, 250]
    if None not in chunk_sizes:
        chunk_sizes = [None] + chunk_sizes

    spark = get_spark(app_name="backlog_smoke")
    tmp = tempfile.mkdtemp(prefix="backlog_smoke_")
    try:
        for chunk in chunk_sizes:
            lake = LakeLayout(os.path.join(tmp, f"lake_{chunk}"))
            synth_silver(spark, lake, n_dates, rows_per_date)
            t0 = time.perf_counter()
            summary = compact_pending(
                spark, lake,
                max_partitions=10**9, write_audit=True, chunk_size=chunk,
            )
            elapsed = time.perf_counter() - t0
            emit(
                {
                    "n_dates": n_dates,
                    "rows_per_date": rows_per_date,
                    "chunk_size": chunk,
                    "chunks": summary.get("chunks", 1),
                    "compacted": summary["processed_partitions_count"],
                    "sec": round(elapsed, 2),
                    "dates_per_sec": round(n_dates / elapsed, 1),
                }
            )
            shutil.rmtree(os.path.join(tmp, f"lake_{chunk}"), ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
