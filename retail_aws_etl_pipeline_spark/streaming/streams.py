"""Structured Streaming operators.

The reference's "streaming" is event-driven batch (S3 PUT → Lambda → one
Glue run per file; SURVEY.md §2.9). Its deferred roadmap items —
watermarking for late data, cross-batch dedup (docs/gold_job.md:39-40) —
map directly onto Structured Streaming:

| reference behavior                   | here                               |
|--------------------------------------|------------------------------------|
| one new file per trigger             | file source + Trigger.AvailableNow |
| idempotent per-partition overwrite   | foreachBatch + dynamic overwrite   |
| late data (future work)              | withWatermark + windowed agg       |
| dedup-by-key across batches          | watermarked dropDuplicates         |
| sessionization                       | session_window(ts, gap)            |

Each streaming aggregation has a batch twin in the query registry
(hourly_event_rollup, dedup_keep_latest, user_sessions) — tests assert the
streaming result converges to the batch result, which is the strongest
correctness statement available for non-SQL-expressible stateful ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Stateful-stream shuffle/state-store partition count (overridable via
#: SPARK_GRAFT_STREAM_STATE_PARTITIONS). A stateful micro-batch pays a
#: per-STATE-PARTITION open/commit/snapshot cost on EVERY trigger, so the
#: partition count should track the keyed STATE's cardinality, not the
#: session's batch compute width: these streams keep small keyed state
#: (event types, hourly windows, per-user rows), where 32 state stores
#: are ~4x pure overhead per batch (A/B at sf0.1, min-of-3:
#: streamed_hourly_rollup 1.79 -> 0.91 s, streamed_dedup_counts
#: 2.26 -> 1.47 s at 8 partitions). A deployment with large keyed state
#: raises the env override; the batch session width is untouched (the
#: conf is set around stream start only — Structured Streaming pins the
#: value into the checkpoint at first run regardless, so per-query is
#: the only granularity that exists).
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)

#: Canonical events schema — the start-stream-before-data-arrives fallback
#: when the directory is empty/absent at stream start (the standard
#: streaming-source pattern: the sink directory exists before producers do).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming scan of an events parquet directory, ``ts`` normalized to
    TIMESTAMP regardless of the files' physical type.

    ``max_files_per_trigger`` sizes micro-batches: 1 (default) maximizes
    batch-boundary coverage in tests (every file is its own trigger —
    the cross-batch state paths run as often as possible); production
    drains raise it so the per-batch fixed cost (planning + state-store
    round trip, ~1 s/batch measured on local[32]) amortizes over more
    input — the r8 K=10 smoke measured the streamed dedup drain 5.7×
    slower purely from batch COUNT when a 10× corpus arrived as 10×
    more files (SCALING.md).

    A streaming source needs its schema up front; rather than hard-coding
    one physical layout, sniff it from a zero-cost batch footer read and
    apply the same canonical ``ts`` normalization as ``load_tables``
    (SURVEY §1.4): nanosecond-long → µs-truncated timestamp, TIMESTAMP_NTZ
    → TIMESTAMP (UTC session, value-preserving), TIMESTAMP → as-is. The
    testdata generator has emitted all three layouts across rounds.

    If the directory is empty or absent at stream start (producers not up
    yet), the sniff raises ``AnalysisException`` and the stream falls back
    to the canonical ``EVENTS_RAW_SCHEMA`` — fallback mode therefore only
    supports the canonical µs-TIMESTAMP layout: files that later land with
    a different physical ``ts`` type (ns-long, TIMESTAMP_NTZ) bypass the
    sniff-based normalization. Any other read error (corrupt footer,
    permissions) re-raises — silently substituting the canonical schema
    there would mask a real failure AND skip the normalization this
    function exists to apply.
    """
    from pyspark.errors import AnalysisException

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        schema = spark.read.parquet(events_dir).schema
    except AnalysisException:  # empty/absent dir (message varies by version)
        schema = EVENTS_RAW_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", int(max_files_per_trigger))
        .parquet(events_dir)
    )
    ts_type = schema["ts"].dataType.typeName()
    if ts_type == "long":  # TIMESTAMP(NANOS) read as ns-long
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the ``hourly_event_rollup`` batch query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def dedup_stream(
    events: DataFrame,
    watermark: str | None = "2 hours",
    subset: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Cross-batch exactly-once by key: watermarked dropDuplicates
    (the streaming form of W1 keep-latest; state expires with the
    watermark, bounding memory at scale).

    Watermark semantics, pinned by ``test_watermark_lateness_sweep``:

    - with the default ``subset=("event_id",)`` the watermark only bounds
      STATE (keys older than it are expired) — late rows are NOT dropped;
      a late row whose key's state already expired passes through again.
      That is at-least-once under lateness, which the downstream gold
      keep-latest merge absorbs;
    - include the event-time column — ``subset=("event_id", "ts")`` — to
      get watermark-late DROP semantics (the engine filters late input
      only when the event-time column is part of the dedup subset), and
      note the filter takes effect one micro-batch after the watermark
      update that the progress line reports.

    Pass ``watermark=None`` for unordered replays (unbounded state; fine
    for bounded backfills)."""
    cols = list(subset)
    if watermark is None:
        return events.dropDuplicates(cols)
    return events.withWatermark("ts", watermark).dropDuplicates(cols)


def session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions via session_window — streaming twin of the
    ``user_sessions`` batch query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def running_user_stats_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value), re-emitted on every micro-batch that
    touches the user (Update mode).

    This is the escape hatch for stateful semantics ``session_window`` /
    ``dropDuplicates`` can't express — arbitrary per-key state carried
    across micro-batches, updated by an Arrow-batched pandas kernel. State
    here is a 2-field tuple per user, so memory is O(distinct keys); for
    key churn, swap ``NoTimeout`` for ``ProcessingTimeTimeout`` and expire
    idle keys in the kernel (``state.hasTimedOut``).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update(key, pdfs, state):
        import pandas as pd

        (n, total) = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming frame to completion over the available input and
    return the materialized result (memory sink; local testing harness).

    BOUNDED OUTPUTS ONLY: the memory sink holds every output row on the
    driver as a LocalTableScan — a K=100 dedup drain (10M rows) OOMed an
    8 GiB driver through this helper. Large drains should measure/land
    through ``foreachBatch`` (count or parquet sink), which keeps the
    output distributed; this helper exists for test-sized results where
    collecting is the point.

    The session's shuffle-partition conf is narrowed to
    :data:`STREAM_STATE_PARTITIONS` for the drain and restored after —
    the stateful operators' state-store count is sized by state
    cardinality instead of inheriting the batch compute width (see the
    constant's rationale). Results are partitioning-independent."""
    sess = df.sparkSession
    old = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set(
        "spark.sql.shuffle.partitions",
        str(min(int(old), STREAM_STATE_PARTITIONS)),
    )
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", old)
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def run_pipeline_available_now(
    spark: SparkSession,
    incoming_dir: str,
    lake,
    checkpoint_dir: str,
    **ingest_kwargs,
):
    """One end-to-end drain of the continuous pipeline: raw files →
    silver (ledgered per-file ingest) → gold (checkpointed upsert stream).

    Both stages are AvailableNow-style: the ingest ledger skips files
    already processed, the streaming checkpoint skips silver data already
    merged, so calling this on a schedule IS the reference's whole
    event-driven architecture (S3 PUT → Lambda → Glue ingest → gold
    compaction) as two idempotent drains. Crash between the stages is
    safe: the next call re-drains gold from the checkpoint; re-delivered
    rows collapse in the keep-latest merge.

    Returns the list of per-file ``IngestResult``s from the ingest stage.
    """
    from retail_aws_etl_pipeline_spark.ingest import ingest_pending

    results = ingest_pending(spark, incoming_dir, lake, **ingest_kwargs)
    q = gold_upsert_stream(spark, lake, checkpoint_dir)
    q.awaitTermination()
    return results


def gold_upsert_stream(
    spark: SparkSession,
    lake,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    processing_time: str = "1 second",
):
    """Continuous silver→gold maintenance: stream the silver directory and
    merge each micro-batch into gold via ``operators.compact.upsert_gold``
    (foreachBatch + dynamic partition overwrite = exactly-once-effective
    gold, the reference's docs/gold_job.md:32-35 idempotency goal).

    Returns the started StreamingQuery. Default Trigger.AvailableNow —
    drains what exists, then stops; schedule repeatedly for the reference's
    event-driven cadence. For 24/7 soak mode pass ``available_now=False``
    (micro-batches every ``processing_time``) and, to rate-limit each
    micro-batch to a bounded chunk of backlog — bounding both the
    foreachBatch merge size and executor memory — set
    ``max_files_per_trigger``; stop with ``query.stop()``. The merge is
    keyed keep-latest, so ANY interleaving of waves into micro-batches
    converges to the same gold (soak-tested across rates in
    ``tests/test_streaming_multimodal.py::test_gold_upsert_stream_soak``).
    """
    from retail_aws_etl_pipeline_spark.operators.compact import upsert_gold
    from retail_aws_etl_pipeline_spark.schema import SILVER_SCHEMA

    # NOTE: the streaming file source discovers work by DIRECTORY listing —
    # it requires the direct silver layout. A lake ingesting with
    # commit_protocol="manifest" should drive gold via compact_pending
    # (manifest) instead of this stream.
    reader = spark.readStream.schema(SILVER_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    silver = reader.parquet(lake.processed)
    writer = (
        silver.writeStream.foreachBatch(lambda df, _epoch: upsert_gold(spark, lake, df))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def span_dedup_stream(docs: DataFrame, w: int | None = None) -> DataFrame:
    """Streaming keep-first span dedup — the cross-batch form of
    ``operators.dedup.chunk_dedup_stats``: token spans explode scan-side
    and ``dropDuplicates`` on the span text carries seen-span state across
    micro-batches, so a span that arrived in ANY earlier batch never
    re-emits (the production cadence: each ingest wave dedups against
    everything already ingested, without re-reading the corpus).

    State is one entry per DISTINCT span — unbounded by design: exact
    corpus-wide dedup has no time horizon. Deployments that can accept
    recency-windowed dedup bound it by adding an ingest-time watermark
    column and passing it to dropDuplicates; the exact form instead
    relies on the state store the same way the batch form relies on the
    span-keyed shuffle. Provider choice is measured, not asserted
    (SCALING.md "state-store choice"): the default heap provider wins
    ~2.3× wall while state fits executor heap (~200 B/key resident —
    10M keys ≈ 2.0 GB measured), so flip
    ``spark.sql.streaming.stateStore.providerClass`` to RocksDB only
    when per-partition state outgrows heap — bounded off-heap memory +
    disk-resident SSTs, at ~2.3× wall and ~3.3× checkpoint size.
    """
    from retail_aws_etl_pipeline_spark.operators.dedup import CHUNK_W, token_chunks

    chunks = token_chunks(docs, w=w if w is not None else CHUNK_W)
    return chunks.dropDuplicates(["chunk"])


def near_dup_stream(
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
):
    """Production streaming near-dup dedup: every micro-batch checks its
    documents against the STANDING corpus and emits qualifying pairs,
    then adds itself to the corpus — the incremental cadence of
    ``incremental_jaccard_counts``, driven by Structured Streaming.

    Per batch (foreachBatch):
      1. shingle the batch (scan-side);
      2. within-batch pairs via the inverted-index self-join;
      3. cross pairs via batch-grams ⋈ standing-gram-index (parquet —
         cost tracks the ARRIVAL RATE, not corpus²);
      4. append pairs (normalized id_a < id_b) and the batch's grams.

    Each qualifying pair is emitted EXACTLY ONCE regardless of arrival
    order: the pair surfaces when its later-arriving member processes
    (same batch -> within-pairs; earlier batch -> cross-pairs), and
    cross/within candidate spaces are disjoint. Both sinks partition by
    batch id under dynamic overwrite, so a foreachBatch RETRY replaces
    its own partition instead of appending duplicates (at-least-once
    execution, exactly-once storage). The convergence test asserts the
    streamed union equals the batch corpus self-join.

    Integer-threshold Jaccard ≥ 0.2, same as the batch family. The gram
    index append is the state here — unbounded like any exact corpus
    index, stored as data (parquet), not executor state, so executors
    stay stateless and the index is queryable/compactable like any table.
    """
    process = make_near_dup_batch_processor(index_dir, pairs_dir)
    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_near_dup_batch_processor(index_dir: str, pairs_dir: str):
    """The foreachBatch body of :func:`near_dup_stream`, exposed so tests
    can invoke a single batch directly — in particular to simulate a
    RETRY (same batch_df + batch_id re-processed after a crash that
    already committed both sinks) and assert storage stays identical."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import (
        incremental_jaccard_counts,
        jaccard_counts,
        shingles,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grams = shingles(batch_df).persist()
        within = (
            jaccard_counts(grams)
            .filter(F.col("common") * 5 >= (F.col("n_a") + F.col("n_b") - F.col("common")))
            .select("id_a", "id_b", "common")
        )
        pairs = within
        # First batch: the index doesn't exist yet. Catch ONLY the
        # missing-path AnalysisException — a corrupt index or permission
        # failure must surface, not silently restart dedup from empty
        # (the events_stream fallback got the same narrowing in r6).
        from pyspark.errors import AnalysisException

        try:
            corpus = spark.read.parquet(index_dir)
        except AnalysisException:
            corpus = None
        if corpus is not None:
            # RETRY GUARD: a crash after the index write leaves this
            # batch's own grams in the standing index; re-processing
            # would then match the batch against itself (self-pairs at
            # Jaccard 1, within-pairs double-counted as cross). Exclude
            # the batch's own doc ids from the corpus side — a no-op on
            # the first attempt, exact idempotence on retry.
            own_ids = batch_df.select("doc_id").distinct()
            corpus = corpus.join(F.broadcast(own_ids), "doc_id", "left_anti")
            cross = (
                incremental_jaccard_counts(grams, corpus)
                .filter(
                    F.col("common") * 5
                    >= (F.col("n_batch") + F.col("n_corpus") - F.col("common"))
                )
                .select(
                    F.least("batch_id", "corpus_id").alias("id_a"),
                    F.greatest("batch_id", "corpus_id").alias("id_b"),
                    "common",
                )
            )
            pairs = pairs.unionByName(cross)
        # foreachBatch is at-least-once: a failed/retried batch re-runs
        # process(). Partitioning both sinks by batch id and dynamically
        # overwriting makes the replay idempotent (the retry replaces its
        # own partition instead of appending a duplicate) — the same
        # discipline as the gold upsert sink.
        (
            pairs.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(pairs_dir)
        )
        (
            grams.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(index_dir)
        )
        grams.unpersist()

    return process


def compact_gram_index(spark: SparkSession, index_dir: str, buckets: int = 8) -> int:
    """Maintenance for :func:`near_dup_stream`'s standing gram index: the
    per-batch dynamic-overwrite sink leaves one partition directory per
    micro-batch (the classic streaming small-files problem — thousands
    of tiny files after a day of 1-minute triggers). Rewrite the index
    into ``buckets`` files hash-clustered by gram, REPLACING the batch
    partitioning: the gram is the join key of every subsequent
    cross-batch probe, so clustering by it also tightens the inverted
    join's input. Stage-and-swap via a temp dir + atomic rename per the
    lake's commit discipline (a crash mid-compaction leaves the old
    index intact). Single-maintainer contract: between the two renames
    there is a brief window where the path does not exist, so run
    compaction from the same scheduler slot as the stream (never
    concurrently with a triggering batch); deployments needing
    concurrent readers should publish the index through the
    manifest-pointer flip in ``lake_manifest`` instead, which swaps a
    pointer rather than the directory. Returns the number of
    (doc_id, gram) rows compacted.

    The compacted layout drops the __batch_id column; subsequent batches
    append new __batch_id partitions beside it, and the next compaction
    folds them in — the standard base+delta table maintenance loop.
    """
    import os
    import shutil

    cur = spark.read.parquet(index_dir).select("doc_id", "gram")
    n = cur.count()
    tmp = index_dir.rstrip("/") + ".compacting"
    cur.repartition(buckets, "gram").write.mode("overwrite").parquet(tmp)
    old = index_dir.rstrip("/") + ".old"
    # A prior compaction crashed between its renames may leave .old
    # debris; clear it or the swap's first rename fails forever (the
    # live index was never touched in that crash, so the debris is dead).
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old)
    return n


def feature_delta_stream(
    orders: DataFrame,
    delta_dir: str,
    checkpoint_dir: str,
):
    """Incremental per-customer feature maintenance as a base+delta table:
    each micro-batch appends ONE partial-aggregate row per customer seen
    in the batch — (c_custkey, n_orders, cents_sum, last_order_us) —
    partitioned by batch id under dynamic overwrite, so a foreachBatch
    RETRY replaces its own partition instead of double-counting
    (at-least-once execution, exactly-once storage: the gram-index sink
    discipline applied to feature upkeep). A naive read-modify-write
    merge would double-apply the batch on retry — partial aggregates
    partitioned by the batch id are the idempotent form.

    Read the current snapshot with :func:`read_feature_snapshot` (folds
    deltas); fold the accumulated per-batch partitions down with
    :func:`compact_feature_deltas` on the compaction cadence — the same
    base+delta maintenance loop as ``compact_gram_index``.

    All three features are associative merges (sum, sum, max), so ANY
    interleaving of arrivals into micro-batches converges to the batch
    answer — the convergence test drives three wave splits and a mid-run
    retry against the one-shot batch aggregate.
    """
    from pyspark.sql import functions as F

    def process(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias("cents_sum"),
            F.max(F.unix_micros(F.col("o_orderdate"))).alias("last_order_us"),
        )
        (
            partial.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(delta_dir)
        )

    return (
        orders.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_feature_snapshot(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Current feature vector per customer from the delta table: one
    keyed groupBy folding the per-batch partials (sum/sum/max — the same
    associative merges the stream computes per batch)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(delta_dir)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("cents_sum").cast("long").alias("cents_sum"),
            F.max("last_order_us").cast("long").alias("last_order_us"),
        )
    )


def compact_feature_deltas(spark: SparkSession, delta_dir: str, buckets: int = 8) -> int:
    """Fold the accumulated per-batch delta partitions into ``buckets``
    files hash-clustered by customer key (one partial row per customer),
    stage-and-swap like ``compact_gram_index`` — the delta table stays
    small no matter how many micro-batches have run, and subsequent
    batches append fresh ``__batch_id`` partitions beside the compacted
    base. Returns the number of customer rows after folding. Same
    single-maintainer contract as the gram index: run from the stream's
    scheduler slot, never concurrently with a triggering batch."""
    import os
    import shutil

    cur = read_feature_snapshot(spark, delta_dir)
    tmp = delta_dir.rstrip("/") + ".compacting"
    cur.repartition(buckets, "o_custkey").write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    old = delta_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)  # dead debris from a crashed swap
    os.rename(delta_dir, old)
    os.rename(tmp, delta_dir)
    shutil.rmtree(old)
    return n


def ivf_retrieval_stream(
    probes: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
):
    """Continuous retrieval against the at-rest IVF index: each
    micro-batch of query vectors runs :func:`similarity.ivf_index_topk`
    (statically partition-pruned to the batch's probed cells) and lands
    its results under its own ``__batch_id`` partition with dynamic
    overwrite — the same at-least-once-execution / exactly-once-storage
    sink discipline as :func:`feature_delta_stream`, so a foreachBatch
    retry replaces its own partition instead of duplicating results.

    Per-probe top-k is independent across probes, so ANY interleaving of
    probes into micro-batches yields exactly the batch answer over the
    union — the stream==batch equivalence is by construction and pinned
    by test. foreachBatch is the right seam here (not a transform): the
    query needs the probed-cell collect + pruned index read per batch,
    which a streaming plan cannot express.

    The 100 TB shape: the index is the big side and never moves; each
    micro-batch reads only its probed cells' files. Retrieval throughput
    scales with batch cadence, not corpus size.
    """
    from retail_aws_etl_pipeline_spark.operators.similarity import ivf_index_topk

    def process(batch_df: DataFrame, batch_id: int) -> None:
        res = ivf_index_topk(batch_df, index_path, k, id_col=id_col, nprobe=nprobe)
        (
            res.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_dir)
        )

    return (
        probes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_hll_batch_processor(key_col: str, delta_dir: str):
    """The foreachBatch body of :func:`hll_register_stream`, exposed so
    tests can replay a batch verbatim (the at-least-once crash point).
    Idempotent twice over: the per-batch register table lands in its own
    ``__batch_id`` partition under dynamic overwrite (a retry replaces
    itself), and the snapshot fold is per-bucket MAX — idempotent even
    if a duplicate partition ever survived."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sketch import hll_registers

    def process(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, F.col(key_col))
        (
            regs.withColumn("__batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(delta_dir)
        )

    return process


def hll_register_stream(
    docs: DataFrame, key_col: str, delta_dir: str, checkpoint_dir: str
):
    """Incremental distinct-count sketch maintenance under streaming
    ingest: each micro-batch sketches ONLY its own rows into a
    <= HLL_BUCKETS-row register table appended as a ``__batch_id``
    partition (the feature_delta_stream base+delta discipline), so the
    standing corpus cardinality is answerable at any moment from
    :func:`read_hll_snapshot` — one per-bucket MAX fold over a table
    whose size is batches x <= 256 rows, NEVER a rescan of the corpus.
    MAX-merge idempotence (sketch algebra) makes any arrival
    interleaving AND any foreachBatch retry converge to the one-shot
    batch sketch bit-identically — pinned by the stream==batch test.

    The 100 TB shape: the stream pays one scan per batch at arrival
    time; every later "how many distincts so far?" is a 256-row read.
    """
    return (
        docs.writeStream.foreachBatch(make_hll_batch_processor(key_col, delta_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_snapshot(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Current (bucket, register) table from the delta partitions: one
    per-bucket MAX fold — the same merge :func:`operators.sketch.hll_merge`
    defines, so the snapshot IS sketch(all rows so far)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(delta_dir)
        .groupBy("bucket")
        .agg(F.max("register").cast("long").alias("register"))
    )


def make_cms_batch_processor(key_col: str, delta_dir: str):
    """The foreachBatch body of :func:`cms_cell_stream` (exposed for
    verbatim-replay tests). Unlike the HLL's MAX fold, count-min merges
    by SUM — which is NOT idempotent — so the per-batch partition under
    dynamic overwrite is the load-bearing idempotence here: a retried
    batch REPLACES its own cells instead of double-counting."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sketch import cms_cells

    def process(batch_df: DataFrame, batch_id: int) -> None:
        counted = (
            batch_df.filter(F.col(key_col).isNotNull())
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        )
        cells = cms_cells(counted, key_col, "__n")
        (
            cells.withColumn("__batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(delta_dir)
        )

    return process


def cms_cell_stream(
    docs: DataFrame, key_col: str, delta_dir: str, checkpoint_dir: str
):
    """Incremental FREQUENCY-sketch maintenance under streaming ingest —
    the count-min twin of :func:`hll_register_stream`: each micro-batch
    counts its own keys and sketches them into <= d*w cells appended as
    a ``__batch_id`` partition; the standing sketch is
    :func:`read_cms_snapshot`'s per-cell SUM fold (the cms_merge
    algebra), answerable at any moment without a corpus rescan. Sum is
    not idempotent, so exactly-once STORAGE comes from the
    batch-partitioned dynamic overwrite (a retry replaces itself) — the
    stream==batch + verbatim-retry test pins both properties."""
    return (
        docs.writeStream.foreachBatch(make_cms_batch_processor(key_col, delta_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_snapshot(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Current (row, col, cell) table from the delta partitions: one
    per-cell SUM fold — exactly :func:`operators.sketch.cms_merge` over
    every batch's sketch, so the snapshot IS sketch(all rows so far)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(delta_dir)
        .groupBy("row", "col")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )


def make_bottomk_batch_processor(
    row_key_expr: str, value_col: str, delta_dir: str, k: int | None = None
):
    """The foreachBatch body of :func:`bottomk_sample_stream` (exposed
    for verbatim-replay tests). Bottom-k is mergeable but NOT idempotent
    under row duplication (a replayed batch's copies would occupy sample
    slots and displace legitimate members), so — like the count-min
    cells — exactly-once storage comes from the batch-partitioned
    dynamic overwrite: a retried batch REPLACES its own partition."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sketch import (
        BOTTOMK_K,
        bottomk_sample,
    )

    kk = BOTTOMK_K if k is None else k

    def process(batch_df: DataFrame, batch_id: int) -> None:
        samp = bottomk_sample(
            batch_df.filter(F.col(value_col).isNotNull()),
            F.expr(row_key_expr),
            F.col(value_col),
            kk,
        )
        (
            samp.withColumn("__batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(delta_dir)
        )

    return process


def bottomk_sample_stream(
    rows: DataFrame,
    row_key_expr: str,
    value_col: str,
    delta_dir: str,
    checkpoint_dir: str,
    k: int | None = None,
):
    """Incremental QUANTILE-sketch maintenance under streaming ingest —
    the bottom-k twin of :func:`hll_register_stream` /
    :func:`cms_cell_stream`, completing the streamed sketch triple
    (distinct / frequency / quantile): each micro-batch takes ITS OWN
    k smallest md5(row-key) rows and appends them as a ``__batch_id``
    partition; the standing sample is :func:`read_bottomk_snapshot`'s
    re-take over batches × k rows — never a rescan. Correctness rests
    on bottom-k mergeability (Cohen & Kaplan 2007:
    bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) under the
    (h, v) total order), pinned by the stream==batch test."""
    return (
        rows.writeStream.foreachBatch(
            make_bottomk_batch_processor(row_key_expr, value_col, delta_dir, k)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_bottomk_snapshot(
    spark: SparkSession, delta_dir: str, k: int | None = None
) -> DataFrame:
    """Current (h, v) sample from the delta partitions: re-take the
    bottom k over the ≤ batches × k stored rows — exactly the
    mergeability identity, so the snapshot IS bottomk(all rows so far)."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sketch import BOTTOMK_K

    kk = BOTTOMK_K if k is None else k
    return (
        spark.read.parquet(delta_dir)
        .select("h", "v")
        .orderBy(F.asc("h"), F.asc("v"))
        .limit(kk)
    )


def make_bloom_batch_processor(text_col: str, delta_dir: str):
    """The foreachBatch body of :func:`bloom_word_stream` (exposed for
    verbatim-replay tests). Bloom words merge by bit_or — idempotent
    like the HLL's MAX, so a replayed batch could not corrupt the fold
    even without storage-level exactly-once; the batch-partitioned
    dynamic overwrite is kept anyway for uniformity with the sketch
    family (one recovery story across all four streams)."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import bloom_build_words

    def process(batch_df: DataFrame, batch_id: int) -> None:
        words = bloom_build_words(
            batch_df.filter(F.col(text_col).isNotNull()), text_col
        )
        (
            words.withColumn("__batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(delta_dir)
        )

    return process


def bloom_word_stream(
    docs: DataFrame, text_col: str, delta_dir: str, checkpoint_dir: str
):
    """Incremental MEMBERSHIP-sketch maintenance under streaming ingest
    — the Bloom twin of :func:`hll_register_stream` /
    :func:`cms_cell_stream` / :func:`bottomk_sample_stream`, extending
    the streamed sketch triple to the full quartet (distinct /
    frequency / quantile / membership): each micro-batch bit_or-folds
    ITS OWN rows into a <= BLOOM_WORDS-row word table appended as a
    ``__batch_id`` partition; the standing filter is
    :func:`read_bloom_snapshot`'s per-word bit_or fold, answerable at
    any moment without a corpus rescan. OR-idempotence (set union)
    makes any arrival interleaving and any retry converge to the
    one-shot batch filter bit-identically — pinned by the
    stream == batch test.

    The 100 TB shape: the stream pays one scan per batch at arrival
    time; every later "seen before?" gate reads 128 bytes."""
    return (
        docs.writeStream.foreachBatch(
            make_bloom_batch_processor(text_col, delta_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_bloom_snapshot(spark: SparkSession, delta_dir: str) -> DataFrame:
    """Current (word_idx, word) filter from the delta partitions: one
    per-word bit_or fold — exactly the merge the batch build's
    associative aggregate defines, so the snapshot IS
    bloom(all rows so far)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(delta_dir)
        .groupBy("word_idx")
        .agg(F.bit_or("word").cast("long").alias("word"))
    )
