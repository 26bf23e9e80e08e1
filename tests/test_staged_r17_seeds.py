"""Proof battery for the STAGED r17 seeds (built r14): the remaining two
members of the deterministic sketch family — count-min (frequency) and
bottom-k hash sample (quantiles) — next to the r15/r16 HLL (distincts).
Same discipline as every staged predecessor: DuckDB oracle compares at
two gate scales, structural invariants, mergeability pins, plan gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import sketch as SK
from retail_aws_etl_pipeline_spark.plans import extensions as E
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare

PAIRS = [
    ("countmin_topk_report", E.countmin_topk_report, E.COUNTMIN_TOPK_ORACLE),
    (
        "hash_sample_quantile_report",
        E.hash_sample_quantile_report,
        E.HASH_SAMPLE_ORACLE,
    ),
]


@pytest.mark.parametrize("name,fn,oracle", PAIRS, ids=[p[0] for p in PAIRS])
@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_staged_r17_seed_matches_oracle(spark, sf, name, fn, oracle):
    r = compare(fn(spark, sf), oracle, sf)
    assert r["ok"], (name, sf, r)


# --- count-min --------------------------------------------------------------


def test_countmin_never_undercounts(spark):
    """Structural: est_n >= exact_n on every probed key (count-min's
    one-sided error), at both gate scales."""
    for sf in (SF_SMOKE, SF_ORACLE):
        rows = E.countmin_topk_report(spark, sf).collect()
        assert len(rows) == E.CMS_TOPK
        for r in rows:
            assert r["overcount"] >= 0 and r["est_n"] == r["exact_n"] + r["overcount"]


def test_countmin_merge_equals_sketch_of_concat(spark):
    """cells(A ⊎ B) == cms_merge(cells(A), cells(B)) bit-identically —
    the elementwise-sum mergeability that lets shards sketch
    independently at 100 TB. Overlapping keys add, absent cells pass
    through."""
    a = spark.createDataFrame(
        [(f"k{i}", i + 1) for i in range(40)], "tok string, n long"
    )
    b = spark.createDataFrame(
        [(f"k{i}", 2 * i + 1) for i in range(20, 60)], "tok string, n long"
    )
    both = (
        a.unionByName(b)
        .groupBy("tok")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    merged = {
        (r["row"], r["col"]): r["cell"]
        for r in SK.cms_merge(
            SK.cms_cells(a, "tok", "n"), SK.cms_cells(b, "tok", "n")
        ).collect()
    }
    direct = {
        (r["row"], r["col"]): r["cell"]
        for r in SK.cms_cells(both, "tok", "n").collect()
    }
    assert merged == direct and merged


def test_countmin_exact_on_singleton_corpus(spark):
    """One distinct key: no collisions possible, so every row's cell IS
    the exact count and the estimate is exact."""
    one = spark.createDataFrame([("solo", 42)], "tok string, n long")
    cells = SK.cms_cells(one, "tok", "n")
    assert cells.count() == SK.CMS_DEPTH
    est = SK.cms_estimates(cells, one.select("tok"), "tok").collect()[0]
    assert est["est_n"] == 42


def test_countmin_excludes_null_keys(spark):
    """NULL keys are excluded inside the kernel (the hll_registers
    contract): md5 of the seeded concat is NULL for a NULL key and the
    row would land nowhere/somewhere depending on the engine."""
    df = spark.createDataFrame(
        [("a", 5), (None, 100)], "tok string, n long"
    )
    cells = SK.cms_cells(df, "tok", "n")
    total = cells.agg(F.sum("cell")).collect()[0][0]
    assert total == 5 * SK.CMS_DEPTH


def test_countmin_plan_gate(spark):
    """Vocab groupBy is the one corpus exchange; the probe join is
    broadcast; no Window, no Python eval."""
    plan = (
        E.countmin_topk_report(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "Python" not in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


# --- bottom-k hash sample ----------------------------------------------------


def test_bottomk_merge_equals_sample_of_union(spark):
    """bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — the
    mergeability that re-samples shards with a 2k-row union, no rescan."""
    a = spark.createDataFrame(
        [(f"a{i}", float(i)) for i in range(600)], "k string, v double"
    )
    b = spark.createDataFrame(
        [(f"b{i}", float(1000 + i)) for i in range(600)], "k string, v double"
    )
    sa = SK.bottomk_sample(a, F.col("k"), F.col("v"))
    sb = SK.bottomk_sample(b, F.col("k"), F.col("v"))
    remerged = sorted(
        (r["h"], r["v"])
        for r in sa.unionByName(sb)
        .orderBy(F.asc("h"), F.asc("v"))
        .limit(SK.BOTTOMK_K)
        .collect()
    )
    direct = sorted(
        (r["h"], r["v"])
        for r in SK.bottomk_sample(
            a.unionByName(b), F.col("k"), F.col("v")
        ).collect()
    )
    assert remerged == direct and len(direct) == SK.BOTTOMK_K


def test_bottomk_is_exact_when_population_fits(spark):
    """n <= k: the sample IS the population, so every est quantile
    equals the exact quantile (the audit's degenerate-correctness pin)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(i, i % 4 + 1, float(100 + 7 * i)) for i in range(200)]
    out = "/tmp/bottomk_smallpop"
    os.makedirs(out, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
                "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    row = E.hash_sample_quantile_report(spark, out).collect()[0]
    assert row["n_rows"] == 200 and row["sample_k"] == 200
    for q in (25, 50, 75, 90):
        assert row[f"q{q}_est"] == row[f"q{q}_exact"]
    r = compare(
        E.hash_sample_quantile_report(spark, out), E.HASH_SAMPLE_ORACLE, out
    )
    assert r["ok"], r


def test_bottomk_kernel_excludes_null_keys(spark):
    """NULL row keys never enter the sample (the engines order NULL
    hashes at opposite ends — the kernel refuses them outright)."""
    df = spark.createDataFrame(
        [(None, 1.0)] * 300 + [(f"k{i}", float(i)) for i in range(10)],
        "k string, v double",
    )
    got = SK.bottomk_sample(df, F.col("k"), F.col("v")).collect()
    assert len(got) == 10 and all(r["h"] is not None for r in got)


def test_bottomk_sample_rank_error_envelope(spark):
    """At the oracle gate scale the sampled quantiles land within the
    ~3/sqrt(k) rank band of the exact ones: compare by RANK (the value
    domain is heavy-tailed, ranks are uniform by construction)."""
    import math

    row = E.hash_sample_quantile_report(spark, SF_ORACLE).collect()[0]
    from retail_aws_etl_pipeline_spark.session import load_tables

    li = (
        load_tables(spark, SF_ORACLE, ["lineitem"])["lineitem"]
        .filter(F.col("l_extendedprice").isNotNull())
    )
    n = row["n_rows"]
    band = 3.0 / math.sqrt(SK.BOTTOMK_K)
    for q in (25, 50, 75, 90):
        est = row[f"q{q}_est"]
        rank = li.filter(F.col("l_extendedprice") <= est).count() / n
        assert abs(rank - q / 100.0) <= band, (q, rank, band)


def test_bottomk_plan_is_take_ordered_not_global_sort(spark):
    """The sample leg plans TakeOrderedAndProject (per-partition top-k +
    k-row merge) — never a global Sort+Exchange over the fact table; no
    Python eval anywhere."""
    plan = (
        E.hash_sample_quantile_report(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Python" not in plan, plan[:2000]


# --- streamed sketch maintenance ----------------------------------------------


def test_streamed_hll_equals_batch_sketch(spark, tmp_path):
    """Incremental sketch maintenance under streaming ingest: three
    arrival waves through hll_register_stream, then the snapshot's
    register table AND estimate must equal the one-shot batch sketch
    BIT-IDENTICALLY (MAX-merge idempotence). A verbatim foreachBatch
    retry of the last batch (the at-least-once crash point) must change
    nothing."""
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        hll_register_stream,
        make_hll_batch_processor,
        read_hll_snapshot,
    )

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    src = str(tmp_path / "waves")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    delta = str(tmp_path / "hll_delta")
    q = hll_register_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        key_col="text",
        delta_dir=delta,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    snap = {
        (r["bucket"], r["register"])
        for r in read_hll_snapshot(spark, delta).collect()
    }
    batch = {
        (r["bucket"], r["register"])
        for r in SK.hll_registers(docs, F.col("text")).collect()
    }
    assert snap == batch and snap
    est_stream = SK.hll_estimate(read_hll_snapshot(spark, delta)).collect()[0]
    est_batch = SK.hll_distinct(docs, F.col("text")).collect()[0]
    assert tuple(est_stream) == tuple(est_batch)

    # retry the LAST wave verbatim: partition replaces itself, MAX fold
    # is idempotent — snapshot unchanged.
    make_hll_batch_processor("text", delta)(
        docs.filter(F.col("doc_id") % 3 == 2), 2
    )
    assert {
        (r["bucket"], r["register"])
        for r in read_hll_snapshot(spark, delta).collect()
    } == batch


def test_streamed_cms_equals_batch_sketch(spark, tmp_path):
    """The count-min twin of the streamed-HLL pin: three arrival waves
    through cms_cell_stream, snapshot == one-shot batch sketch
    bit-identically. Sum-merge is NOT idempotent, so the verbatim
    last-batch retry specifically proves the batch-partitioned dynamic
    overwrite prevents double counting (the load-bearing half here)."""
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        cms_cell_stream,
        make_cms_batch_processor,
        read_cms_snapshot,
    )

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    src = str(tmp_path / "waves")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    delta = str(tmp_path / "cms_delta")
    q = cms_cell_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        key_col="text",
        delta_dir=delta,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    counted = (
        docs.filter(F.col("text").isNotNull())
        .groupBy("text")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    batch = {
        (r["row"], r["col"]): r["cell"]
        for r in SK.cms_cells(counted, "text", "__n").collect()
    }
    snap = {
        (r["row"], r["col"]): r["cell"]
        for r in read_cms_snapshot(spark, delta).collect()
    }
    assert snap == batch and snap

    # verbatim retry of the LAST wave: without the batch-partitioned
    # overwrite this would double-count (sum is not idempotent).
    make_cms_batch_processor("text", delta)(
        docs.filter(F.col("doc_id") % 3 == 2), 2
    )
    assert {
        (r["row"], r["col"]): r["cell"]
        for r in read_cms_snapshot(spark, delta).collect()
    } == batch
