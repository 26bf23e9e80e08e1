#!/usr/bin/env python
"""Scale smoke: synthesize a K× copy of the sf0.1 tables and compare query
wall-clock at both scales.

Usage: python scripts/scale_smoke.py [K] [out_dir] [query,query,...]

Each replica is key-shifted (all join/entity keys offset by replica index ×
(max_key + 1)) so join fan-outs, group cardinalities and per-key row counts
stay REPRESENTATIVE — naive row duplication would instead multiply
duplicate groups and explode pair-generating operators quadratically.
Documents additionally get a per-replica suffix token, embeddings a small
per-replica perturbation, so the dedup/ANN workloads scale in corpus size
rather than in exact-duplicate count.

Findings land in SCALING.md; this script is the reproducer.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from retail_aws_etl_pipeline_spark.plans.queries import all_specs  # noqa: E402

REGISTRY = all_specs()
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

#: Key DOMAINS: each foreign-key family shares ONE offset, taken from the
#: owning dimension's max key — so replica i's lineitems reference replica
#: i's parts/suppliers/orders (per-key fan-out stays constant across K and
#: no replica's facts dangle or pile onto replica 0's dimensions).
DOMAINS = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

#: (column, domain) per table — every column of a domain shifts by the SAME
#: per-replica offset on every table that references it.
KEY_SHIFTS = {
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"), ("l_suppkey", "suppkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "customer": [("c_custkey", "custkey")],
    "part": [("p_partkey", "partkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "events": [("event_id", "event"), ("user_id", "user")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
    "nation": [],
    "region": [],
}

DEFAULT_QUERIES = [
    "daily_revenue",
    "pricing_summary",
    "region_revenue",
    "top_customers_per_nation",
    "dedup_keep_latest",
    "user_rolling_hour",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "doc_winnowing",
    "ann_topk_bruteforce",
    "doc_token_stats",
]


def synthesize(spark, k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # One offset per key DOMAIN, from the owning table's max — shared by
    # every referencing column so cross-table references stay aligned.
    domain_offsets = {}
    if k > 1:
        for dom, (owner, col) in DOMAINS.items():
            owner_df = spark.read.parquet(os.path.join(SRC, f"{owner}.parquet"))
            domain_offsets[dom] = owner_df.agg(F.max(col)).collect()[0][0] + 1
    for table, keys in KEY_SHIFTS.items():
        src = os.path.join(SRC, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(src)
        if not keys or k == 1:
            reps = [df] * (k if keys else 1)
        else:
            reps = []
            for i in range(k):
                r = df
                for c, dom in keys:
                    r = r.withColumn(
                        c, (F.col(c) + i * domain_offsets[dom]).cast(df.schema[c].dataType)
                    )
                if table == "documents" and i > 0:
                    # Rewrite every 3rd word with a replica-specific token:
                    # every 3-gram shingle spans 3 consecutive words, so
                    # every shingle contains a rewritten word and
                    # cross-replica Jaccard collapses to ~0 — replicas are
                    # genuinely distinct documents. Weaker perturbations
                    # measured the CORPUS, not the operator: a bare suffix
                    # token left replicas ~identical (every doc gained k-1
                    # near-dups, minhash 19x slower at 10x), and a 1-in-7
                    # rewrite still left Jaccard ~0.4 (half the replica
                    # pairs were LSH candidates, minhash verify ~10x).
                    r = r.withColumn(
                        "text",
                        F.expr(
                            "array_join(transform(split(text, ' '), "
                            f"(x, j) -> IF(j % 3 = {i % 3}, concat(x, '{i}q'), x)), ' ')"
                        ),
                    )
                if table == "embeddings" and i > 0:
                    r = r.withColumn(
                        "embedding",
                        F.expr(f"transform(embedding, x -> CAST(x + {i} * 0.00011 AS FLOAT))"),
                    )
                reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(dst)
    print(f"synthesized {k}x tables at {out_dir}", file=sys.stderr)


def _stage_shuffles(spark) -> dict[int, int]:
    """{(stageId, attempt-unique key): shuffle-write bytes} for every
    completed stage so far, from the UI REST API. Per-query deltas give
    the query's total shuffle volume AND its widest single exchange (the
    100 TB pressure point). Returns {} if the UI is unavailable."""
    import urllib.request

    try:
        base = "http://localhost:4040/api/v1/applications"
        with urllib.request.urlopen(base, timeout=5) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=5) as r:
            stages = json.load(r)
        return {
            (s["stageId"], s.get("attemptId", 0)): s.get("shuffleWriteBytes", 0)
            for s in stages
        }
    except Exception:
        return {}


def run(spark, sf_dir: str, names: list[str]) -> dict[str, dict]:
    """min-of-N wall per query (host shows multi-second load spikes — a
    single shot measured dedup_signal_report at both 11 s and 35 s minutes
    apart); shuffle bytes are plan-determined, recorded once."""
    repeats = max(1, int(os.environ.get("SMOKE_REPEATS", "3")))

    def _resolve(name):
        # STAGED ops (no registry entry yet) resolve straight off the
        # extensions module so their scale rows can be measured at
        # staging time, the same protocol as registered entries.
        if name in REGISTRY:
            return REGISTRY[name].spark_fn
        from retail_aws_etl_pipeline_spark.plans import extensions as _E

        return getattr(_E, name)

    timings = {}
    for name in names:
        fn = _resolve(name)
        best, shuffle = None, {}
        for _ in range(repeats):
            seen = set(_stage_shuffles(spark))
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            new = {k: v for k, v in _stage_shuffles(spark).items() if k not in seen}
            spark.catalog.clearCache()
            if best is None or wall < best:
                best, shuffle = wall, new
        timings[name] = {
            "sec": round(best, 2),
            "shuffle_mb": round(sum(shuffle.values()) / 1e6, 1),
            "max_stage_shuffle_mb": round(max(shuffle.values(), default=0) / 1e6, 1),
        }
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    return timings


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfscale_x{k}"
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else DEFAULT_QUERIES

    spark = get_spark(app_name="scale_smoke", extra_conf={"spark.ui.enabled": "true"})
    # events.ts is nanosecond parquet; read it as long (ns) — the scaled
    # copy then stores plain int64 ns, which load_tables converts the same
    # way it does for the source table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    synthesize(spark, k, out_dir)

    print("— baseline sf0.1 —", file=sys.stderr)
    base = run(spark, SRC, names)
    print(f"— scaled x{k} —", file=sys.stderr)
    scaled = run(spark, out_dir, names)

    report = {
        "k": k,
        "queries": {
            n: {
                "sf0_1": base[n],
                "scaled": scaled[n],
                "ratio": round(scaled[n]["sec"] / base[n]["sec"], 2)
                if base[n]["sec"]
                else None,
            }
            for n in names
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
