#!/usr/bin/env python
"""Re-measure the standing IVF index's cold-build and warm-query walls.

SCALING.md's "IVF standing index" section commits to keeping both legs
auditable each round (the bench number for ann_topk_ivf_indexed is the
warm path by construction once the cache exists). This is the one-command
reproducer: it removes the sf0.1 standing index, times the cold
build+query, then min-of-3 warm queries.

Usage: python scripts/ivf_cold_warm.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_aws_etl_pipeline_spark.plans.extensions import (  # noqa: E402
    ann_topk_ivf_indexed,
    ivf_standing_index_dir,
)
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402


def standing_index_dir(sf_dir: str) -> str:
    # Shared derivation (ADVICE r12): hand-duplicating the cache key here
    # meant the next key field would silently desync the reproducer.
    return ivf_standing_index_dir(sf_dir)[0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ivf_cold_warm")
    # warm the session itself first so the cold number measures the BUILD,
    # not the JVM (the first-action variant is reported separately when
    # wanted — see SCALING.md r12 notes).
    spark.range(1).count()
    shutil.rmtree(standing_index_dir(sf_dir), ignore_errors=True)
    t0 = time.perf_counter()
    n = ann_topk_ivf_indexed(spark, sf_dir).count()
    cold = time.perf_counter() - t0
    warm = []
    for _ in range(3):
        t0 = time.perf_counter()
        ann_topk_ivf_indexed(spark, sf_dir).count()
        warm.append(time.perf_counter() - t0)
    print(
        f"sf_dir={sf_dir} rows={n} cold_build_plus_query={cold:.2f}s "
        f"warm_query_min={min(warm):.2f}s warm_all={[round(w, 2) for w in warm]}"
    )


if __name__ == "__main__":
    main()
