#!/usr/bin/env python
"""Refit-oracle scale proof for the sf0.01-pinned unigram-LM oracle.

The registered oracle for unigram_lm_report embeds piece-score literals
fitted from the sf0.01 parquet (the _dsir_oracle / _ivf_oracle pinning),
so the driver's compare is only valid at that scale. This is the same
proof the IVF trio carries (scripts/ivf_refit_proof.py): refit the
literals from the sf0.1 parquet and hash-compare ONCE there. The Spark
side needs no change — it fits from whatever sf_dir it is given; only
the oracle literals are pinned.

Usage: python scripts/unigram_refit_proof.py [sf_dir]   (default sf0.1)

Prints one PASS/FAIL line and exits nonzero on mismatch; record the
passing wall in SCALING.md.
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
    spark = get_spark(app_name="unigram_refit_proof")
    spark.range(1).count()  # JIT/session warm so the wall measures the query

    refit_oracle = E._unigram_oracle(sf_dir)
    assert refit_oracle, f"no refit oracle (missing parquet under {sf_dir}?)"
    spec = all_specs()["unigram_lm_report"]
    t0 = time.perf_counter()
    r = compare(spec.spark_fn(spark, sf_dir), refit_oracle, sf_dir)
    wall = time.perf_counter() - t0
    status = "PASS" if r["ok"] else "FAIL"
    print(f"{status} unigram_lm_report @ {sf_dir}: {wall:.2f} s "
          f"(rows {r['spark_rows']}/{r['duck_rows']})")
    if not r["ok"]:
        print("FAIL detail:", {k: v for k, v in r.items()
                               if k != "first_diffs"}, r.get("first_diffs"))
        sys.exit(1)


if __name__ == "__main__":
    main()
