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


def _write_csv_with_rejects(path, good_ids, n_bad=2):
    with open(path, "w") as f:
        f.write(HEADER + "\n")
        f.write("\n".join(_rows(good_ids)) + "\n")
        for i in range(n_bad):
            # revenue != qty * price → data-quality reject
            f.write(f"TBAD{i:02d},S0,2025-07-10 10:00:00,ITEMX{i},2,5.00,99.99\n")


def test_quarantined_run_leaves_no_partial_silver_rows(spark, tmp_path):
    """ADVICE r1: committer v2 commits task output at TASK commit, so a job
    that fails after the silver append leaves that run's rows behind while
    the source file goes to rejected/system and is never retried. The
    quarantine path must purge the run's rows so a rejected file
    contributes ZERO silver rows — while other runs' rows in the same
    partitions survive."""
    import pytest

    lake = LakeLayout(str(tmp_path / "lake"))

    # healthy run A shares dates with the doomed run
    ok_csv = tmp_path / "ok.csv"
    _write_csv(ok_csv, range(10))
    ok = ingest_file(
        spark, str(ok_csv), lake,
        ingest_run_id="run_ok",
        ingest_ts=F.lit("2025-07-20 00:00:00").cast("timestamp"),
        archive=False, write_reject_csv=False,
    )
    assert ok.counts["good_rows"] == 10

    # sabotage the reject sink: a FILE where the json dir must go makes the
    # reject write fail AFTER the silver append already committed
    reject_parent = tmp_path / "lake" / "rejected"
    reject_parent.mkdir(parents=True, exist_ok=True)
    (reject_parent / "data_quality").write_text("not a directory")

    doomed = tmp_path / "doomed.csv"
    _write_csv_with_rejects(doomed, range(100, 110))
    with pytest.raises(Exception):
        ingest_file(
            spark, str(doomed), lake,
            ingest_run_id="run_doomed",
            ingest_ts=F.lit("2025-07-21 00:00:00").cast("timestamp"),
            archive=True, write_reject_csv=False,
        )

    # the doomed file is quarantined...
    system_dir = lake.rejected("system")
    assert any(n.startswith("doomed.csv") for n in os.listdir(system_dir))
    # ...and silver holds exactly run A's rows — no partial debris
    silver = spark.read.parquet(lake.processed)
    assert silver.filter(F.col("ingest_run_id") == "run_doomed").count() == 0
    assert silver.count() == 10
    assert {r["ingest_run_id"] for r in silver.select("ingest_run_id").distinct().collect()} == {
        "run_ok"
    }


def test_purge_deletes_now_empty_partitions(spark, tmp_path):
    """Dates populated ONLY by the failed run must disappear from silver
    entirely (dynamic overwrite can't rewrite a partition to empty)."""
    from retail_aws_etl_pipeline_spark.ingest import purge_run_from_silver

    lake = LakeLayout(str(tmp_path / "lake"))
    csv = tmp_path / "solo.csv"
    _write_csv(csv, range(6))
    ingest_file(
        spark, str(csv), lake,
        ingest_run_id="run_solo",
        ingest_ts=F.lit("2025-07-20 00:00:00").cast("timestamp"),
        archive=False, write_reject_csv=False,
    )
    assert spark.read.parquet(lake.processed).count() == 6
    purged = purge_run_from_silver(spark, lake, "run_solo")
    assert purged == 6
    date_dirs = [d for d in os.listdir(lake.processed) if d.startswith("date=")]
    assert date_dirs == []


# ---------------------------------------------------------------------------
# Manifest commit protocol (object-store-safe silver/gold writes, ROADMAP #3)
# ---------------------------------------------------------------------------


def _mk_batch(spark, run_id, ids, date="2025-07-10"):
    return spark.createDataFrame(
        [(f"T{i:04d}", run_id, date) for i in ids],
        ["transaction_id", "ingest_run_id", "date"],
    )


def test_manifest_crash_midwrite_leaves_prewrite_snapshot(spark, tmp_path):
    """Crash at EVERY commit phase must leave readers at the pre-write
    snapshot: (a) during the data write, (b) after data / before manifest,
    (c) after manifest / before the LATEST pointer flip."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "silver"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(10)))
    assert t.read(spark).count() == 10
    v1 = t.snapshot()["version"]

    # (a)+(b): die before _publish — simulate by staging without publishing
    t._stage(_mk_batch(spark, "run2", range(10, 20)))
    assert t.snapshot()["version"] == v1
    assert t.read(spark).count() == 10  # pre-write snapshot intact

    # (c): manifest file written, pointer flip dies
    orig = LM._atomic_write

    def die_on_pointer(path, content):
        if path.endswith(LM.LATEST):
            raise OSError("injected crash before pointer update")
        orig(path, content)

    LM._atomic_write = die_on_pointer
    try:
        with pytest.raises(OSError):
            t.append(_mk_batch(spark, "run3", range(20, 30)))
    finally:
        LM._atomic_write = orig
    assert t.snapshot()["version"] == v1
    assert t.read(spark).count() == 10

    # recovery: simply re-run the commit; gc_manifests reclaims the debris
    # manifest from crash (c), then vacuum reclaims both crashed commit
    # dirs — retention is manifest-driven, so gc-then-vacuum is the pair
    t.append(_mk_batch(spark, "run3", range(20, 30)))
    assert t.read(spark).count() == 20
    t.gc_manifests(keep_versions=1)
    removed = t.vacuum(min_age_seconds=0)
    assert len(removed) == 2  # the two crashed commit dirs
    assert t.read(spark).count() == 20  # vacuum never touches live data


def test_manifest_overwrite_partitions_semantics(spark, tmp_path):
    """Dynamic-partition-overwrite analog: partitions in the batch are
    replaced, others keep their files; reads never list directories."""
    from retail_aws_etl_pipeline_spark.lake_manifest import ManifestedTable

    t = ManifestedTable(str(tmp_path / "gold"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(5), date="2025-07-10"))
    t.append(_mk_batch(spark, "run1", range(5), date="2025-07-11"))
    assert t.partitions() == ["2025-07-10", "2025-07-11"]

    t.overwrite_partitions(_mk_batch(spark, "run2", range(3), date="2025-07-11"))
    df = t.read(spark)
    assert df.filter(F.col("date") == "2025-07-11").count() == 3
    assert {
        r["ingest_run_id"]
        for r in df.filter(F.col("date") == "2025-07-11").select("ingest_run_id").collect()
    } == {"run2"}
    # untouched partition still served from its original files
    assert df.filter(F.col("date") == "2025-07-10").count() == 5


def test_manifest_silver_ingest_end_to_end(spark, tmp_path):
    """commit_protocol='manifest' through the WHOLE pipeline: reference CSV
    → manifested silver (same class counts as the direct path) → manifested
    gold; views serve both zones from snapshots."""
    import shutil

    from retail_aws_etl_pipeline_spark.lake_manifest import ManifestedTable
    from retail_aws_etl_pipeline_spark.operators.compact import read_gold, read_silver
    from retail_aws_etl_pipeline_spark.plans.views import register_lake_views

    src = "/root/reference/sample_csv_files/sales_2024-10-16.csv"
    f = tmp_path / "sales.csv"
    shutil.copy(src, f)
    lake = LakeLayout(str(tmp_path / "lake"))
    direct_lake = LakeLayout(str(tmp_path / "lake_direct"))

    f2 = tmp_path / "sales_direct.csv"
    shutil.copy(src, f2)
    direct = ingest_file(spark, str(f2), direct_lake, archive=False, write_reject_csv=False)
    result = ingest_file(
        spark, str(f), lake, archive=False, write_reject_csv=False,
        commit_protocol="manifest",
    )
    assert result.status == "ok"
    assert result.counts == direct.counts  # identical routing, different commit

    silver = read_silver(spark, lake)
    assert silver.count() == direct.counts["good_rows"]
    assert ManifestedTable(lake.processed).exists()
    # no hive dirs at the root: data lives under data/<commit>/
    assert not [d for d in os.listdir(lake.processed) if d.startswith("date=")]

    summary = compact_pending(
        spark, lake, max_partitions=1000, write_audit=False, commit_protocol="manifest"
    )
    assert summary["processed_partitions_count"] > 0
    gold = read_gold(spark, lake)
    assert gold.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    register_lake_views(spark, lake)
    assert spark.sql("SELECT COUNT(*) c FROM silver_sales").collect()[0]["c"] == silver.count()
    assert spark.sql("SELECT COUNT(*) c FROM fact_sales").collect()[0]["c"] == gold.count()


def test_manifest_ingest_crash_publishes_nothing(spark, tmp_path):
    """A crash between the silver stage and publish leaves the snapshot
    unchanged; the quarantine path vacuums the staged debris."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    lake = LakeLayout(str(tmp_path / "lake"))
    f1 = tmp_path / "day1.csv"
    _write_csv(f1, range(10))
    ingest_file(
        spark, str(f1), lake, archive=False, write_reject_csv=False,
        commit_protocol="manifest",
    )
    t = LM.ManifestedTable(lake.processed)
    v1 = t.snapshot()["version"]

    f2 = tmp_path / "day2.csv"
    _write_csv(f2, range(10, 20))
    orig = LM.ManifestedTable._publish

    def die(self, files, parent_version):
        raise OSError("injected crash before publish")

    LM.ManifestedTable._publish = die
    try:
        with pytest.raises(OSError):
            ingest_file(
                spark, str(f2), lake, archive=False, write_reject_csv=False,
                commit_protocol="manifest",
            )
    finally:
        LM.ManifestedTable._publish = orig

    assert t.snapshot()["version"] == v1  # readers never saw the crash
    assert t.read(spark).count() == 10
    # quarantine vacuumed the staged-but-unpublished commit dir
    live = {e["path"].split("/", 2)[1] for e in t.snapshot()["files"]}
    on_disk = set(os.listdir(os.path.join(lake.processed, "data")))
    assert on_disk == live


def test_manifest_rewrite_folds_commits(spark, tmp_path):
    from retail_aws_etl_pipeline_spark.lake_manifest import ManifestedTable

    t = ManifestedTable(str(tmp_path / "t"), partition_col="date")
    for w in range(4):
        t.append(_mk_batch(spark, f"run{w}", range(w * 5, w * 5 + 5)))
    commits = {e["path"].split("/", 2)[1] for e in t.snapshot()["files"]}
    assert len(commits) == 4
    before = {(r["transaction_id"], r["date"]) for r in t.read(spark).collect()}
    t.rewrite(spark)
    t.gc_manifests(keep_versions=1)  # pre-fold history keeps data alive until GC'd
    t.vacuum(min_age_seconds=0)
    after_commits = {e["path"].split("/", 2)[1] for e in t.snapshot()["files"]}
    assert len(after_commits) == 1
    assert {(r["transaction_id"], r["date"]) for r in t.read(spark).collect()} == before
    assert set(os.listdir(os.path.join(str(tmp_path / "t"), "data"))) == after_commits


def test_manifest_concurrent_writers_lose_nothing(spark, tmp_path):
    """Concurrent ingest + compact commit race (VERDICT r3 item #6): two
    writers that both staged before either published must BOTH survive —
    the merge runs against the snapshot under the commit lock, not against
    the snapshot each writer saw when it started."""
    import threading

    from retail_aws_etl_pipeline_spark.lake_manifest import ManifestedTable

    t = ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "base", range(5)))

    # interleaved: both stage (seeing v1), then commit in either order
    errs: list[Exception] = []

    def writer(run_id, ids, date):
        try:
            t.append(_mk_batch(spark, run_id, ids, date=date))
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append(exc)

    threads = [
        threading.Thread(target=writer, args=(f"w{i}", range(10 + i * 10, 20 + i * 10), f"2025-07-{11 + i}"))
        for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    snap = t.snapshot()
    assert snap["version"] == 5  # base + 4 concurrent commits, none lost
    df = t.read(spark)
    assert df.count() == 5 + 4 * 10
    runs = {r["ingest_run_id"] for r in df.select("ingest_run_id").collect()}
    assert runs == {"base", "w0", "w1", "w2", "w3"}


def test_manifest_version_file_never_overwritten(spark, tmp_path):
    """O_EXCL version claim: debris from a crashed commit (manifest file
    written, LATEST never flipped) is probed past, not overwritten — the
    next commit claims the next free version number."""
    import json as _json

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(5)))
    # orphan v2 manifest: a writer died after the manifest write
    mdir = os.path.join(str(tmp_path / "t"), LM.MANIFEST_DIR)
    orphan = os.path.join(mdir, "v00000002.json")
    with open(orphan, "w") as f:
        f.write(_json.dumps({"version": 2, "files": [{"path": "data/dead/x.parquet", "partition": None}]}))

    v = t.append(_mk_batch(spark, "run2", range(5, 10)))
    assert v == 3  # skipped the claimed-but-unpointered v2
    with open(orphan) as f:  # debris untouched
        assert _json.load(f)["files"][0]["path"] == "data/dead/x.parquet"
    assert t.read(spark).count() == 10


def test_manifest_rewrite_conflicts_instead_of_dropping(spark, tmp_path):
    """A fold staged against a stale snapshot must raise CommitConflict,
    never silently drop the commit that landed meanwhile."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(5)))

    orig_commit = LM.ManifestedTable._commit

    def racing_commit(self, merge):
        # another writer lands between rewrite's stage and its commit
        LM.ManifestedTable._commit = orig_commit
        t.append(_mk_batch(spark, "run2", range(5, 10), date="2025-07-11"))
        return orig_commit(self, merge)

    LM.ManifestedTable._commit = racing_commit
    try:
        with pytest.raises(LM.CommitConflict):
            t.rewrite(spark)
    finally:
        LM.ManifestedTable._commit = orig_commit
    # nothing lost; retry folds cleanly
    assert t.read(spark).count() == 10
    t.rewrite(spark)
    assert t.read(spark).count() == 10


def test_compact_backlog_chunking(spark, tmp_path):
    """chunk_size splits a many-date backlog into independent plans: same
    gold as the one-plan path, per-chunk audit entries, and a crash between
    chunks resumes at the first uncompacted date."""
    import datetime as dt

    lake = LakeLayout(str(tmp_path / "lake"))
    base = dt.date(2025, 1, 1)
    rows = []
    for d in range(25):
        date = (base + dt.timedelta(days=d)).isoformat()
        for i in range(4):
            rows.append((f"T{d:03d}_{i}", "S1", f"{date} 10:00:00", date))
    silver = spark.createDataFrame(
        rows, ["transaction_id", "store_id", "ingest_ts", "date"]
    )
    silver.write.partitionBy("date").parquet(lake.processed)

    summary = compact_pending(
        spark, lake, max_partitions=1000, write_audit=True, chunk_size=10
    )
    assert summary["processed_partitions_count"] == 25
    assert summary["chunks"] == 3  # 10 + 10 + 5
    assert len(summary["results"]) == 25
    gold = spark.read.parquet(lake.gold)
    assert gold.count() == 100
    assert gold.select("date").distinct().count() == 25
    # per-date audit files exist for every chunk's dates
    audits = [f for f in os.listdir(lake.audit) if f.startswith("metrics_")]
    assert len(audits) == 25

    # "crash between chunks": wipe gold dates past the first chunk and
    # re-run incrementally — only the missing dates are compacted.
    import shutil

    for d in sorted(os.listdir(lake.gold)):
        if d.startswith("date=") and d > "date=2025-01-10":
            shutil.rmtree(os.path.join(lake.gold, d))
    resume = compact_pending(
        spark, lake, max_partitions=1000, write_audit=False, chunk_size=10
    )
    assert resume["processed_partitions_count"] == 15
    assert spark.read.parquet(lake.gold).select("date").distinct().count() == 25


def test_compact_pending_manifest_protocol_end_to_end(spark, tmp_path):
    """compact_pending(commit_protocol='manifest'): incremental selection
    reads partitions from the manifest, redelivery converges, and gold is
    snapshot-readable through read_gold."""
    from retail_aws_etl_pipeline_spark.operators.compact import read_gold

    lake = LakeLayout(str(tmp_path / "lake"))
    incoming = tmp_path / "incoming"
    incoming.mkdir()
    _write_csv(incoming / "day1.csv", range(10))
    ingest_pending(
        spark, str(incoming), lake,
        ingest_ts=F.lit("2025-07-20 00:00:00").cast("timestamp"),
        write_reject_csv=False,
    )
    summary = compact_pending(
        spark, lake, max_partitions=100, write_audit=False, commit_protocol="manifest"
    )
    assert summary["processed_partitions_count"] == 3  # 3 distinct dates
    assert read_gold(spark, lake).count() == 10

    # incremental: nothing pending → no work, snapshot unchanged
    again = compact_pending(
        spark, lake, max_partitions=100, write_audit=False, commit_protocol="manifest"
    )
    assert again["processed_partitions_count"] == 0

    # late redelivery: forced recompaction converges to exactly-once
    _write_csv(incoming / "day1_redelivered.csv", range(10))
    ingest_pending(
        spark, str(incoming), lake,
        ingest_ts=F.lit("2025-07-22 00:00:00").cast("timestamp"),
        write_reject_csv=False,
    )
    dates = [
        d.split("=", 1)[1] for d in os.listdir(lake.processed) if d.startswith("date=")
    ]
    compact_pending(
        spark, lake, force_dates=dates, write_audit=False, commit_protocol="manifest"
    )
    gold = read_gold(spark, lake)
    assert gold.count() == 10
    assert gold.select("transaction_id").distinct().count() == 10


def test_manifest_gc_retention_and_debris(spark, tmp_path):
    """gc_manifests (VERDICT r4 item #6): (1) unpointered debris from a
    crash between the O_EXCL version claim and the LATEST flip is
    reclaimed; (2) superseded snapshots beyond the retention window are
    reclaimed; (3) the LIVE manifest is never a candidate — a GC pass can
    never strand readers, at any retention setting."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    for w in range(5):
        t.append(_mk_batch(spark, f"run{w}", range(w * 5, w * 5 + 5)))
    assert t.snapshot()["version"] == 5
    mdir = tmp_path / "t" / LM.MANIFEST_DIR

    # fault injection: crash BETWEEN the version-file claim and the pointer
    # flip — v6 exists on disk, LATEST still names v5
    orig = LM._atomic_write

    def die_on_pointer(path, content):
        if path.endswith(LM.LATEST):
            raise OSError("injected crash between claim and pointer flip")
        orig(path, content)

    LM._atomic_write = die_on_pointer
    try:
        with pytest.raises(OSError):
            t.append(_mk_batch(spark, "crash", range(50, 60)))
    finally:
        LM._atomic_write = orig
    assert (mdir / "v00000006.json").exists()  # claimed, unpointered
    assert t.snapshot()["version"] == 5  # readers unaffected

    removed = t.gc_manifests(keep_versions=3)
    assert "v00000006.json" in removed  # >live debris reclaimed
    assert {"v00000001.json", "v00000002.json"} <= set(removed)  # old history
    assert sorted(p.name for p in mdir.glob("v*.json")) == [
        "v00000003.json", "v00000004.json", "v00000005.json",
    ]
    t.vacuum(min_age_seconds=0)
    assert t.snapshot()["version"] == 5  # live snapshot fully intact
    assert t.read(spark).count() == 25

    # minimum retention: live alone survives, readers still fine
    t.gc_manifests(keep_versions=1)
    assert sorted(p.name for p in mdir.glob("v*.json")) == ["v00000005.json"]
    assert t.read(spark).count() == 25
    with pytest.raises(ValueError):
        t.gc_manifests(keep_versions=0)

    # the GC'd table commits normally; the freed v6 slot is reusable
    t.append(_mk_batch(spark, "after", range(100, 105)))
    assert t.snapshot()["version"] == 6
    assert t.read(spark).count() == 30


def test_manifest_vacuum_retention_spares_inflight_staging(spark, tmp_path):
    """vacuum's min_age_seconds guard: a freshly staged (not yet
    committed) commit dir belongs to an in-flight writer — a retention
    window must spare it; the default window reclaims it."""
    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "base", range(5)))
    t._stage(_mk_batch(spark, "inflight", range(5, 10)))  # writer mid-commit
    assert t.vacuum() == []  # conservative default window spares it
    assert t.vacuum(min_age_seconds=3600) == []  # so does an explicit hour
    assert len(t.vacuum(min_age_seconds=0)) == 1  # explicit opt-in reclaims
    assert t.read(spark).count() == 5


def test_manifest_time_travel_reads_and_retention(spark, tmp_path):
    """read(version=N): historical snapshots stay readable — including
    across an overwrite that supersedes their files — until gc_manifests
    reclaims them; vacuum never deletes data a retained manifest needs."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(5), date="2025-07-10"))        # v1
    t.append(_mk_batch(spark, "run2", range(5, 10), date="2025-07-11"))    # v2
    t.overwrite_partitions(_mk_batch(spark, "run3", range(3), date="2025-07-10"))  # v3

    assert t.read(spark).count() == 8   # 3 overwritten + 5 untouched
    assert t.read(spark, version=1).count() == 5
    assert {r["ingest_run_id"] for r in t.read(spark, version=1).collect()} == {"run1"}
    assert t.read(spark, version=2).count() == 10

    # vacuum with full history retained: v1/v2 still pin the superseded
    # run1 commit dir, so nothing is reclaimed and old reads keep working
    assert t.vacuum(min_age_seconds=0) == []  # manifest-pinned, not age-spared
    assert t.read(spark, version=2).count() == 10

    # retention to live-only: history becomes unreadable, THEN its data
    # becomes reclaimable — in that order, never the reverse
    t.gc_manifests(keep_versions=1)
    with pytest.raises(FileNotFoundError, match="v2"):
        t.snapshot(version=2)
    assert len(t.vacuum(min_age_seconds=0)) == 1  # run1's superseded commit dir
    assert t.read(spark).count() == 8  # live snapshot untouched throughout


def test_manifest_gc_debris_only_mode_keeps_history(spark, tmp_path):
    """gc_manifests(keep_versions=None) — the crash-recovery mode: >live
    debris goes, every historical snapshot stays time-travel readable."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(5)))
    t.append(_mk_batch(spark, "run2", range(5, 10)))

    orig = LM._atomic_write

    def die_on_pointer(path, content):
        if path.endswith(LM.LATEST):
            raise OSError("injected crash before pointer update")
        orig(path, content)

    LM._atomic_write = die_on_pointer
    try:
        with pytest.raises(OSError):
            t.append(_mk_batch(spark, "crash", range(10, 15)))
    finally:
        LM._atomic_write = orig

    removed = t.gc_manifests(keep_versions=None)
    assert removed == ["v00000003.json"]  # the debris, nothing else
    assert t.read(spark, version=1).count() == 5  # history intact
    assert t.read(spark).count() == 10


def test_manifest_vacuum_reader_grace_contract(spark, tmp_path):
    """VERDICT r5 #7 — the vacuum-under-reader race, both sides:

    (a) while ANY retained manifest references a version, its data
        survives vacuum regardless of age, so a pinned reader is safe;
    (b) after gc_manifests retires the manifest, only min_age_seconds
        protects a reader that resolved paths earlier — an aggressive
        min_age_seconds=0 maintenance pass under an active reader is the
        documented unsafe case and visibly breaks the read."""
    import pytest

    from retail_aws_etl_pipeline_spark import lake_manifest as LM

    t = LM.ManifestedTable(str(tmp_path / "t"), partition_col="date")
    t.append(_mk_batch(spark, "run1", range(5), date="2025-07-10"))        # v1
    t.overwrite_partitions(_mk_batch(spark, "run2", range(3), date="2025-07-10"))  # v2

    pinned = t.read(spark, version=1)  # lazy: paths resolve at action time
    assert pinned.count() == 5

    # (a) manifest retained -> vacuum(0) must spare the superseded commit
    assert t.vacuum(min_age_seconds=0) == []
    assert pinned.count() == 5

    # (b) manifest retired -> age grace is the ONLY shield left
    t.gc_manifests(keep_versions=1)
    assert t.vacuum() == []            # 1h default spares the young dir
    assert pinned.count() == 5         # reader unharmed within the window
    assert len(t.vacuum(min_age_seconds=0)) == 1  # aggressive pass reclaims
    with pytest.raises(Exception):     # and the pinned reader now breaks
        pinned.count()
    assert t.read(spark).count() == 3  # live snapshot stays intact


def test_near_dup_stream_killed_midbatch_recovers_exactly_once(spark, tmp_path):
    """Hard-interrupt crash model for the streaming near-dup pipeline
    (VERDICT r6 item #4): kill the query MID-micro-batch — twice, at the
    two distinct crash points — and restart from the checkpoint each
    time. The replayed batches plus the remaining waves must emit the
    batch-oracle pair set each-exactly-once and leave a debris-free gram
    index.

    Crash A (batch 1): dies after the pairs sink committed but BEFORE
    the index sink — the partial-commit window between the two writes.
    Crash B (batch 2, after one successful restart): dies after BOTH
    sinks committed but before the checkpoint commit log records the
    batch — recovery must replay a fully-committed batch idempotently
    (the own-ids anti-join + batch-partitioned dynamic overwrite).
    """
    import shutil

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from retail_aws_etl_pipeline_spark.operators.dedup import jaccard_counts, shingles
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        make_near_dup_batch_processor,
    )
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    src = str(tmp_path / "waves")
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode("append").parquet(src)

    index_dir = str(tmp_path / "gram_index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    real = make_near_dup_batch_processor(index_dir, pairs_dir)

    def start(process):
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def crash_a(batch_df, batch_id):
        real(batch_df, batch_id)
        if batch_id == 1:
            # simulate dying between the two sink writes: the pairs
            # partition for this batch is on disk, the index one is not
            shutil.rmtree(os.path.join(index_dir, "__batch_id=1"))
            raise RuntimeError("injected crash A: killed between sink writes")

    with pytest.raises(StreamingQueryException, match="crash A"):
        start(crash_a).awaitTermination()
    # the partial-commit state really exists on disk
    assert os.path.isdir(os.path.join(pairs_dir, "__batch_id=1"))
    assert not os.path.isdir(os.path.join(index_dir, "__batch_id=1"))

    def crash_b(batch_df, batch_id):
        real(batch_df, batch_id)
        if batch_id == 2:
            raise RuntimeError("injected crash B: killed after sinks, before commit log")

    with pytest.raises(StreamingQueryException, match="crash B"):
        start(crash_b).awaitTermination()
    # batch 2's sinks committed even though the checkpoint never did
    assert os.path.isdir(os.path.join(index_dir, "__batch_id=2"))

    # final resume with the production processor drains the backlog
    start(real).awaitTermination()

    pairs = spark.read.parquet(pairs_dir)
    got = {(r["id_a"], r["id_b"], r["common"]) for r in pairs.collect()}
    assert pairs.count() == len(got), "a pair was emitted more than once"
    grams = shingles(docs).persist()
    want = {
        (r["id_a"], r["id_b"], r["common"])
        for r in jaccard_counts(grams)
        .filter(F.col("common") * 5 >= (F.col("n_a") + F.col("n_b") - F.col("common")))
        .collect()
    }
    n_gram_rows = grams.count()
    grams.unpersist()
    assert got == want and want
    # debris-free index: exactly the corpus shingle rows, no duplicates
    # from any replay, every doc present exactly once per gram
    idx = spark.read.parquet(index_dir)
    assert idx.count() == n_gram_rows
    assert idx.distinct().count() == n_gram_rows
    assert idx.select("doc_id").distinct().count() == docs.count()


def test_compaction_swap_recovers_from_old_debris(spark, tmp_path):
    """A compaction that crashed between its two renames leaves a dead
    `.old` directory; the next compaction must clear it and proceed
    instead of failing its first rename forever (both the gram index and
    the feature delta table use the same stage-and-swap)."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.streaming.streams import (
        compact_feature_deltas,
        read_feature_snapshot,
    )

    delta_dir = str(tmp_path / "deltas")
    part = (
        spark.range(10)
        .select(
            F.col("id").alias("o_custkey"),
            F.lit(1).alias("n_orders"),
            (F.col("id") * 100).alias("cents_sum"),
            F.lit(1_000_000).alias("last_order_us"),
        )
        .withColumn("__batch_id", F.lit(0))
    )
    part.write.mode("overwrite").partitionBy("__batch_id").parquet(delta_dir)

    # simulate crash debris from a previous swap
    os.makedirs(delta_dir + ".old/junk", exist_ok=True)
    with open(delta_dir + ".old/junk/file", "w") as f:
        f.write("debris")

    n = compact_feature_deltas(spark, delta_dir, buckets=2)
    assert n == 10
    assert not os.path.exists(delta_dir + ".old")
    assert read_feature_snapshot(spark, delta_dir).count() == 10


def test_gold_upsert_stream_killed_midbatch_recovers(spark, tmp_path):
    """Hard mid-batch kill for the silver->gold upsert stream: the batch's
    gold merge commits but the checkpoint never records it; restart must
    replay it through the keep-latest merge with no duplicate keys and
    the same final gold as an uninterrupted run."""
    import shutil as sh

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from retail_aws_etl_pipeline_spark.ingest import ingest_file
    from retail_aws_etl_pipeline_spark.lake import LakeLayout
    from retail_aws_etl_pipeline_spark.operators.compact import upsert_gold
    from retail_aws_etl_pipeline_spark.schema import SILVER_SCHEMA
    from retail_aws_etl_pipeline_spark.streaming.streams import gold_upsert_stream

    lake = LakeLayout(str(tmp_path / "lake"))
    ck = str(tmp_path / "ck")
    src = "/root/reference/sample_csv_files/sales_2024-10-16.csv"
    for name in ("w1.csv", "w2.csv"):
        f = tmp_path / name
        sh.copy(src, f)
        ingest_file(spark, str(f), lake, archive=False, write_reject_csv=False)

    # faulty drain: merge the first batch fully, then die before the
    # checkpoint commit log records it
    def faulty(df, batch_id):
        upsert_gold(spark, lake, df)
        if batch_id == 0:
            raise RuntimeError("injected kill after merge, before commit")

    q = (
        spark.readStream.schema(SILVER_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(lake.processed)
        .writeStream.foreachBatch(faulty)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="injected kill"):
        q.awaitTermination()
    assert spark.read.parquet(lake.gold).count() > 0  # merge really landed

    # production restart replays batch 0 and drains the rest
    q = gold_upsert_stream(spark, lake, ck)
    q.awaitTermination()

    gold = spark.read.parquet(lake.gold)
    assert gold.groupBy("date", "transaction_id").count().filter("count>1").count() == 0
    # identical end state to an uninterrupted drain over the same silver
    clean = LakeLayout(str(tmp_path / "clean"))
    for name in ("c1.csv", "c2.csv"):
        f = tmp_path / name
        sh.copy(src, f)
        ingest_file(spark, str(f), clean, archive=False, write_reject_csv=False)
    q = gold_upsert_stream(spark, clean, str(tmp_path / "ck_clean"))
    q.awaitTermination()
    want = spark.read.parquet(clean.gold)
    key_cols = ["date", "transaction_id", "store_id", "item_id", "quantity"]
    got_keys = {tuple(str(r[c]) for c in key_cols) for r in gold.select(*key_cols).collect()}
    want_keys = {tuple(str(r[c]) for c in key_cols) for r in want.select(*key_cols).collect()}
    assert got_keys == want_keys and got_keys
