"""Failure-injection: lake invariants after a crash mid-silver-write.

The lake's crash model (ingest.py::ingest_pending docstring, mirroring the
reference's at-least-once + idempotent-overwrite intent, docs/gold_job.md:
32-35): a run that dies after writing SOME silver files but BEFORE its
ledger append simply reprocesses the whole file on the next run. The
partial silver rows from the dead run remain as duplicates in silver, and
the gold keep-latest window (date, transaction_id) absorbs them — gold is
exactly-once however many times ingest crashed and retried.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.ingest import ingest_file, ingest_pending
from retail_aws_etl_pipeline_spark.lake import LakeLayout
from retail_aws_etl_pipeline_spark.operators.compact import compact_pending

HEADER = "transaction_id,store_id,timestamp,item_id,quantity,unit_price,revenue"


def _rows(ids):
    # 3 distinct dates, valid DQ (revenue == qty * price)
    return [
        f"T{i:04d},S{i % 3},2025-07-{10 + i % 3:02d} 10:0{i % 6}:00,ITEM{i},2,5.00,10.00"
        for i in ids
    ]


def _write_csv(path, ids):
    with open(path, "w") as f:
        f.write(HEADER + "\n")
        f.write("\n".join(_rows(ids)) + "\n")


def test_crash_midwrite_then_reingest_converges(spark, tmp_path):
    lake = LakeLayout(str(tmp_path / "lake"))
    incoming = tmp_path / "incoming"
    incoming.mkdir()

    # The dead run: ingested only the first 10 rows of the file (its silver
    # append completed for them, then the process died before the ledger
    # append). Simulated by ingesting a truncated copy with archive=False —
    # byte-identical rows, same silver layout, no ledger entry.
    partial = tmp_path / "partial.csv"
    _write_csv(partial, range(10))
    crashed = ingest_file(
        spark,
        str(partial),
        lake,
        ingest_run_id="run_crashed",
        ingest_ts=F.lit("2025-07-20 00:00:00").cast("timestamp"),
        archive=False,
        write_reject_csv=False,
    )
    assert crashed.counts["good_rows"] == 10

    # Recovery: the scheduler re-lists incoming, finds the file unledgered,
    # reprocesses it in full.
    _write_csv(incoming / "sales_full.csv", range(30))
    results = ingest_pending(
        spark,
        str(incoming),
        lake,
        ingest_ts=F.lit("2025-07-21 00:00:00").cast("timestamp"),
        write_reject_csv=False,
    )
    assert [r.status for r in results] == ["ok"]
    assert results[0].counts["good_rows"] == 30

    # Silver carries the crash debris: 10 duplicate rows from the dead run.
    silver = spark.read.parquet(lake.processed)
    assert silver.count() == 40
    assert silver.select("ingest_run_id").distinct().count() == 2

    # Gold converges to exactly-once regardless.
    compact_pending(spark, lake, max_partitions=100, write_audit=True)
    gold = spark.read.option("basePath", lake.gold).parquet(lake.gold)
    assert gold.count() == 30
    assert gold.select("transaction_id").distinct().count() == 30
    # keep-latest picked the recovery run's rows for the overlapping ids
    overlap = gold.filter(F.col("transaction_id") < "T0010")
    assert overlap.count() == 10
    assert {r["ingest_run_id"] for r in overlap.select("ingest_run_id").collect()} == {
        results[0].ingest_run_id
    }

    # Audit metrics account for the duplicates the window removed.
    audit = [
        json.load(open(os.path.join(lake.audit, f)))
        for f in sorted(os.listdir(lake.audit))
        if f.startswith("metrics_")
    ]
    assert sum(m["duplicate_rows_removed"] for m in audit) == 10
    assert sum(m["rows_after_dedup"] for m in audit) == 30


def test_recompaction_after_late_reingest_is_idempotent(spark, tmp_path):
    """A partition compacted BEFORE the retry arrives must be recompactable
    to the same exactly-once state (force_dates = the reference's
    --force_dates rerun path, incremental_auto_compaction.py:137-143)."""
    lake = LakeLayout(str(tmp_path / "lake"))
    incoming = tmp_path / "incoming"
    incoming.mkdir()

    _write_csv(incoming / "day1.csv", range(10))
    ingest_pending(
        spark,
        str(incoming),
        lake,
        ingest_ts=F.lit("2025-07-20 00:00:00").cast("timestamp"),
        write_reject_csv=False,
    )
    compact_pending(spark, lake, max_partitions=100, write_audit=False)
    assert spark.read.parquet(lake.gold).count() == 10

    # Late redelivery of the same rows under a new file name (at-least-once
    # transport): silver gains dups, the already-compacted dates need a
    # forced recompaction — and converge to the same 10 rows.
    _write_csv(incoming / "day1_redelivered.csv", range(10))
    ingest_pending(
        spark,
        str(incoming),
        lake,
        ingest_ts=F.lit("2025-07-22 00:00:00").cast("timestamp"),
        write_reject_csv=False,
    )
    dates = [
        d.split("=", 1)[1] for d in os.listdir(lake.processed) if d.startswith("date=")
    ]
    compact_pending(spark, lake, force_dates=dates, write_audit=False)
    gold = spark.read.parquet(lake.gold)
    assert gold.count() == 10
    assert gold.select("transaction_id").distinct().count() == 10
