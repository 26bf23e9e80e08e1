#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries and print ONE JSON line.

Usage: python bench.py
Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] threads (default all)
  BENCH_QUERIES       comma-separated subset of registry names (default: all)

Each query's full plan is executed via the no-op sink (forces every column,
no driver collect). Prints {"metric", "value", "unit", "queries", "sf"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from retail_aws_etl_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="bench")

    names = os.environ.get("BENCH_QUERIES")
    selected = [n.strip() for n in names.split(",") if n.strip()] if names else list(REGISTRY)
    unknown = [n for n in selected if n not in REGISTRY]
    if unknown:
        sys.exit(f"bench: unknown queries {unknown}; available: {sorted(REGISTRY)}")

    # Warm the JVM / codegen / parquet footer cache so query timings measure
    # the queries, not session startup.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in selected:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        df = spec.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
