#!/usr/bin/env python
"""Refit-oracle scale proof for the sf0.01-pinned IVF trio.

The registered oracles for ann_topk_ivf_indexed, bitext_margin_pairs_ivf
and ann_recall_sweep embed centroid literals fitted from the sf0.01
parquet, so the driver's compare is only valid at that scale — the same
pinning `_dsir_oracle` documents. VERDICT r12 asked for the proof
dsir_selected_docs got at r12 to be extended to this trio: refit the
literals from the sf0.1 parquet and hash-compare ONCE there. The Spark
side needs no change — it derives centroids from whatever sf_dir it is
given; only the oracle literals are pinned.

Usage: python scripts/ivf_refit_proof.py [sf_dir]   (default sf0.1)

Prints one PASS/FAIL line per query and exits nonzero on any mismatch;
record the passing walls in SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from retail_aws_etl_pipeline_spark.plans import extensions as E  # noqa: E402
from retail_aws_etl_pipeline_spark.plans import all_specs  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402
from oracle import compare  # noqa: E402  (tests/oracle.py replica)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ivf_refit_proof")
    spark.range(1).count()  # JIT/session warm so walls measure the queries

    specs = all_specs()
    trio = [
        ("ann_topk_ivf_indexed", E._ivf_oracle(sf_dir)),
        ("bitext_margin_pairs_ivf", E._bitext_ivf_oracle(sf_dir)),
        ("ann_recall_sweep", E._recall_sweep_oracle(sf_dir)),
    ]
    failed = []
    for name, refit_oracle in trio:
        assert refit_oracle, f"{name}: no refit oracle (missing parquet?)"
        t0 = time.perf_counter()
        r = compare(specs[name].spark_fn(spark, sf_dir), refit_oracle, sf_dir)
        wall = time.perf_counter() - t0
        status = "PASS" if r["ok"] else "FAIL"
        print(f"{status} {name} @ {sf_dir}: {wall:.2f} s "
              f"(rows {r['spark_rows']}/{r['duck_rows']})")
        if not r["ok"]:
            failed.append((name, r))
    if failed:
        for name, r in failed:
            print("FAIL detail:", name, {k: v for k, v in r.items()
                                         if k != "first_diffs"}, r.get("first_diffs"))
        sys.exit(1)


if __name__ == "__main__":
    main()
