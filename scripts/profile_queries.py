#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1: measure first).

For each selected registry query, runs the plan through the noop sink
(exactly bench.py's timed action) N times and records:

- wall seconds per repeat (min is the query's cost; spikes are the host's)
- Spark job / stage / task counts for the LAST repeat (job-group scoped):
  at sf0.1 the testdata is tiny, so wall clock is dominated by scheduler
  round-trips (jobs) and exchange count — the same quantities that set the
  shuffle-barrier count at 100 TB
- the number of Exchange / BroadcastExchange / *EvalPython nodes in the
  formatted plan, plus the full ``explain("formatted")`` text written to
  ``plans/r16/<name>_<tag>.txt``

Usage:
  python scripts/profile_queries.py --tag before --queries a,b,c
  python scripts/profile_queries.py --tag before            # full registry
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as for bench.py.

Output: one JSON line per query on stdout + PROFILE_<tag>.json sidecar.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_aws_etl_pipeline_spark.plans.queries import all_specs  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402


def plan_counts(plan_text: str) -> dict:
    """Operator census of a formatted plan."""
    return {
        "exchange": len(re.findall(r"\bExchange\b", plan_text))
        - len(re.findall(r"\bBroadcastExchange\b", plan_text))
        - len(re.findall(r"\bReusedExchange\b", plan_text)),
        "reused_exchange": len(re.findall(r"\bReusedExchange\b", plan_text)),
        "broadcast_exchange": len(re.findall(r"\bBroadcastExchange\b", plan_text)),
        "sort_merge_join": len(re.findall(r"\bSortMergeJoin\b", plan_text)),
        "broadcast_hash_join": len(re.findall(r"\bBroadcastHashJoin\b", plan_text)),
        "shuffled_hash_join": len(re.findall(r"\bShuffledHashJoin\b", plan_text)),
        "python_eval": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas)\b", plan_text)
        ),
        "scan_parquet": len(re.findall(r"\bScan parquet\b", plan_text)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    # default sidecar is PROFILE_<tag>.json in the repo root; a subset
    # profile run must not clobber a committed full-registry profile, so
    # targeted runs pass an explicit path
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_specs()
    names = (
        [n.strip() for n in args.queries.split(",") if n.strip()]
        if args.queries
        else list(registry)
    )
    unknown = [n for n in names if n not in registry]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = args.plans_dir or os.path.join(repo, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(app_name=f"profile_{args.tag}")
    sc = spark.sparkContext
    # warm JVM/codegen as bench.py does
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        walls = []
        rec: dict = {}
        try:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            rec["plan"] = plan_counts(plan)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            continue
        for i in range(args.repeats):
            group = f"{name}-{args.tag}-{i}"
            sc.setJobGroup(group, name)
            try:
                t0 = time.perf_counter()
                df = spec.spark_fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
                break
            finally:
                sc.setJobGroup(None, None)
            spark.catalog.clearCache()
        if walls:
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numActiveTasks + si.numCompletedTasks + si.numFailedTasks >= 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            rec.update(
                {
                    "wall_min": round(min(walls), 4),
                    "walls": [round(w, 4) for w in walls],
                    "jobs": len(job_ids),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            )
        results[name] = rec
        print(json.dumps({"query": name, **rec.get("plan", {}),
                          **{k: rec.get(k) for k in ("wall_min", "jobs", "stages", "tasks", "error")}}),
              flush=True)

    out_path = args.out or os.path.join(repo, f"PROFILE_{args.tag}.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
