#!/usr/bin/env python
"""Stage-level profile of the graph/CC stack (VERDICT r8 item #6).

The CC-based queries (curation_funnel_report, dedup_retained_corpus,
doc_pagerank, dedup_graph_profile, graph_kcore_profile) are the repo's
most stage-count-heavy plans: iterative rounds each contribute jobs +
exchanges + (for the checkpointed variants) materializations. The r8
headline showed them spiking 2-4x under host contention while flat
queries moved ~1.3x — the hypothesis is that a large share of their
wall is SCHEDULER/LATENCY cost (stage round-trips), which multiplies
under contention, rather than task compute.

This script quantifies that split per query from the UI REST API:

  n_jobs, n_stages        — plan round-trips (latency-bound share rises
                            with these)
  task_sec                — sum of executorRunTime across tasks
  ideal_sec               — task_sec / slots (perfect-packing lower bound)
  wall_sec                — measured
  sched_overhead          — 1 - ideal/wall: the fraction of wall NOT
                            explained by task compute — stage latency,
                            scheduling gaps, driver work, materialization
                            barriers

Usage: python scripts/graph_profile.py [sf_dir] [query,query,...]
Findings land in SCALING.md; this script is the reproducer.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_aws_etl_pipeline_spark.plans.queries import all_specs  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402

REGISTRY = all_specs()

DEFAULT_QUERIES = [
    "curation_funnel_report",
    "dedup_retained_corpus",
    "doc_pagerank",
    "dedup_graph_profile",
    "graph_kcore_profile",
    # flat control: one exchange, no iteration
    "daily_revenue",
]


def _api(path: str):
    base = "http://localhost:4040/api/v1/applications"
    with urllib.request.urlopen(base, timeout=5) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}{path}", timeout=5) as r:
        return json.load(r)


def _snapshot():
    stages = _api("/stages?status=complete")
    jobs = _api("/jobs?status=succeeded")
    return (
        {(s["stageId"], s.get("attemptId", 0)): s for s in stages},
        {j["jobId"] for j in jobs},
    )


def profile(spark, sf_dir: str, name: str, slots: int) -> dict:
    spark.catalog.clearCache()
    s0, j0 = _snapshot()
    t0 = time.perf_counter()
    REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    s1, j1 = _snapshot()
    new = [v for k, v in s1.items() if k not in s0]
    task_ms = sum(s.get("executorRunTime", 0) for s in new)
    ideal = task_ms / 1000.0 / slots
    return {
        "wall_sec": round(wall, 2),
        "n_jobs": len(j1 - j0),
        "n_stages": len(new),
        "task_sec": round(task_ms / 1000.0, 2),
        "ideal_sec": round(ideal, 2),
        "sched_overhead": round(1 - ideal / wall, 3) if wall else None,
        "shuffle_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES
    slots = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="graph_profile", extra_conf={"spark.ui.enabled": "true"})
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # JIT/codegen warm-up so the first profiled query isn't charged for it
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        out[name] = profile(spark, sf_dir, name, slots)
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "slots": slots, "queries": out}))


if __name__ == "__main__":
    main()
