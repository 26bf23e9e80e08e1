"""Streaming operators converge to their batch twins; multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import multimodal as MM
from retail_aws_etl_pipeline_spark.plans import REGISTRY
from retail_aws_etl_pipeline_spark.session import load_tables
from retail_aws_etl_pipeline_spark.streaming import (
    dedup_stream,
    events_stream,
    hourly_rollup_stream,
    run_stream_to_memory,
    running_user_stats_stream,
    session_stream,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-shard sf0.001 events into 4 raw (ns-as-long) files so the stream
    runs several microbatches."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")  # ts stays long ns
    raw.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_hourly_rollup_stream_matches_batch(spark, events_dir):
    stream = hourly_rollup_stream(events_stream(spark, events_dir))
    got = run_stream_to_memory(stream, "rollup_out", output_mode="complete")
    batch = REGISTRY["hourly_event_rollup"].spark_fn(spark, SF_SMOKE)
    g = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in batch.collect()}
    assert set(g) == set(b)
    for k in b:
        assert g[k][0] == b[k][0]
        assert g[k][1] == pytest.approx(b[k][1], rel=1e-9)


def test_dedup_stream(spark, events_dir, tmp_path):
    # duplicate the whole input (append the same shards again): 2x rows,
    # same distinct keys; unordered replay => watermark=None
    doubled = str(tmp_path / "doubled")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(events_dir)
    raw.write.mode("overwrite").parquet(doubled)
    raw.write.mode("append").parquet(doubled)
    got = run_stream_to_memory(
        dedup_stream(events_stream(spark, doubled), watermark=None), "dedup_out"
    )
    n_distinct = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("event_id").distinct().count()
    assert spark.read.parquet(doubled).count() == 2 * n_distinct
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_session_stream_matches_batch_session_count(spark, tmp_path):
    # session_window drops watermark-late rows even in complete mode, so
    # feed one time-coherent shard (single microbatch = no late data)
    single = str(tmp_path / "single")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").coalesce(1).write.mode("overwrite").parquet(single)
    stream = session_stream(events_stream(spark, single))
    got = run_stream_to_memory(stream, "session_out", output_mode="complete")
    batch = REGISTRY["user_sessions"].spark_fn(spark, SF_SMOKE)
    assert got.count() == batch.count()
    g = got.groupBy("user_id").count().collect()
    b = batch.groupBy("user_id").count().collect()
    assert {(r["user_id"], r["count"]) for r in g} == {(r["user_id"], r["count"]) for r in b}


def test_running_user_stats_stream_matches_batch(spark, events_dir):
    # Update mode re-emits a user's totals every micro-batch that touches
    # them; n_events is monotone per user, so the final state is the row
    # with the max n_events.
    got = run_stream_to_memory(
        running_user_stats_stream(events_stream(spark, events_dir)),
        "running_stats_out",
        output_mode="update",
    )
    final = {}
    for r in got.collect():
        prev = final.get(r["user_id"])
        if prev is None or r["n_events"] > prev[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    b = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert set(final) == set(b)
    for k in b:
        assert final[k][0] == b[k][0]
        assert final[k][1] == pytest.approx(b[k][1], rel=1e-9)


def test_byte_histogram_kernel(spark):
    t = load_tables(spark, SF_SMOKE, ["documents"])
    doc = t["documents"].filter(F.col("doc_id") == 0)
    text = doc.collect()[0]["text"]
    media = MM.media_from_documents(doc)
    hist = {(r["byte"]): r["n"] for r in MM.byte_histogram(media).collect()}
    import collections

    expected = collections.Counter(text.encode("utf-8"))
    assert hist == dict(expected)


def test_decode_stub_raises(spark):
    t = load_tables(spark, SF_SMOKE, ["documents"])
    media = MM.media_from_documents(t["documents"].limit(2)).withColumn("kind", F.lit("image"))
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        MM.decode_images(media).collect()


def test_gold_upsert_stream(spark, tmp_path):
    """Two silver waves with overlapping transaction_ids: the streamed gold
    keeps exactly one (latest) row per key, and re-running the stream with
    the same checkpoint is a no-op."""
    import glob as g
    import shutil as sh

    from retail_aws_etl_pipeline_spark.ingest import ingest_file
    from retail_aws_etl_pipeline_spark.lake import LakeLayout
    from retail_aws_etl_pipeline_spark.streaming.streams import gold_upsert_stream

    lake = LakeLayout(str(tmp_path / "lake"))
    ck = str(tmp_path / "ck")
    src = "/root/reference/sample_csv_files/sales_2024-10-16.csv"

    # wave 1
    f1 = tmp_path / "w1.csv"; sh.copy(src, f1)
    ingest_file(spark, str(f1), lake, archive=False, write_reject_csv=False)
    q = gold_upsert_stream(spark, lake, ck); q.awaitTermination()
    gold1 = spark.read.parquet(lake.gold)
    n1 = gold1.count()
    assert n1 > 0
    assert gold1.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    # wave 2: same file again (same transaction_ids, later ingest_ts)
    f2 = tmp_path / "w2.csv"; sh.copy(src, f2)
    r2 = ingest_file(spark, str(f2), lake, archive=False, write_reject_csv=False)
    q = gold_upsert_stream(spark, lake, ck); q.awaitTermination()
    gold2 = spark.read.parquet(lake.gold)
    assert gold2.count() == n1  # same keys -> still one row each
    assert gold2.groupBy("date", "transaction_id").count().filter("count>1").count() == 0
    # latest wave won: every surviving row carries wave-2's run id
    assert gold2.filter(gold2.ingest_run_id == r2.ingest_run_id).count() == n1

    # re-run with same checkpoint: no new input -> no change
    q = gold_upsert_stream(spark, lake, ck); q.awaitTermination()
    assert spark.read.parquet(lake.gold).count() == n1


def test_continuous_pipeline_available_now(spark, tmp_path):
    """Three drains of the end-to-end pipeline: new file per wave lands in
    gold, dedup invariant holds, and an empty wave is a complete no-op."""
    import shutil as sh

    from retail_aws_etl_pipeline_spark.lake import LakeLayout
    from retail_aws_etl_pipeline_spark.streaming import run_pipeline_available_now

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    lake = LakeLayout(str(tmp_path / "lake"))
    ck = str(tmp_path / "ck")
    kw = dict(archive=False, write_reject_csv=False)

    sh.copy("/root/reference/sample_csv_files/sales_2024-10-16.csv", incoming / "a.csv")
    res1 = run_pipeline_available_now(spark, str(incoming), lake, ck, **kw)
    assert [r.status for r in res1] == ["ok"]
    gold1 = spark.read.parquet(lake.gold)
    n1 = gold1.count()
    assert n1 > 0
    assert gold1.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    sh.copy("/root/reference/sample_csv_files/sales_2024-12-07.csv", incoming / "b.csv")
    res2 = run_pipeline_available_now(spark, str(incoming), lake, ck, **kw)
    assert [r.status for r in res2] == ["ok"]  # only the new file ran
    gold2 = spark.read.parquet(lake.gold)
    assert gold2.count() > n1
    assert gold2.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    res3 = run_pipeline_available_now(spark, str(incoming), lake, ck, **kw)
    assert res3 == []  # ledger skips both files; stream checkpoint no-ops
    assert spark.read.parquet(lake.gold).count() == gold2.count()
