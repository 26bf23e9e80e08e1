"""Unit tests: connected-components clustering + dataset curation operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators.dedup import connected_components
from retail_aws_etl_pipeline_spark.operators.sampling import (
    PACK_CAPACITY,
    SPLIT_BUCKETS,
    with_pack_assignment,
    with_split_assignment,
)


def _labels(spark, pair_list, node_list):
    pairs = spark.createDataFrame(pair_list, ["id_a", "id_b"])
    nodes = spark.createDataFrame([(n,) for n in node_list], ["doc_id"])
    rows = connected_components(pairs, nodes).collect()
    return {r["node"]: r["label"] for r in rows}

def test_cc_chain_converges_to_min(spark):
    # a chain needs multiple propagation rounds — the fixpoint loop matters
    got = _labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 2, 3, 4, 5])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cc_components_and_singletons(spark):
    got = _labels(spark, [(10, 11), (20, 21), (21, 22)], [10, 11, 20, 21, 22, 30])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30}


def test_split_assignment_is_deterministic_and_partitions(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = with_split_assignment(df).collect()
    b = with_split_assignment(df).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_split = {}
    for r in a:
        assert 0 <= r["bucket"] < SPLIT_BUCKETS
        by_split[r["split"]] = by_split.get(r["split"], 0) + 1
    # every split non-empty and ordered train > valid/test
    assert set(by_split) == {"train", "valid", "test"}
    assert by_split["train"] > by_split["valid"]
    assert by_split["train"] > by_split["test"]


def test_pack_assignment_chunks_token_stream(spark):
    # 10 docs of 600 tokens each in one shard: starts at 0,600,1200,...;
    # capacity 2048 → packs 0,0,0,0(1800 start),1(2400),...
    docs = [(i, "x", " ".join(["t"] * 600)) for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    rows = {r["doc_id"]: r for r in with_pack_assignment(df).collect()}
    for i in range(10):
        start = i * 600
        assert rows[i]["start"] == start
        assert rows[i]["pack_id"] == start // PACK_CAPACITY
    # shards pack independently
    two = df.withColumn("lang", F.when(F.col("doc_id") < 5, "a").otherwise("b"))
    rows2 = with_pack_assignment(two).collect()
    assert {r["start"] for r in rows2 if r["lang"] == "b"} == {i * 600 for i in range(5)}
