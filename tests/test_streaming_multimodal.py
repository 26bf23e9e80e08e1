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
