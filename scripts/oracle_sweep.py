#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary scale factor.

The driver gate and the local suite compare at sf0.01; this reproducer
runs EVERY oracle-paired spec (both registries) against DuckDB at the
given sf_dir — the sweep that caught the unpinned-repartitionByRange bug
at r11 and re-proves the correlated-series oracle rewrites at sf0.1.
The sf0.01-PINNED oracles (fit literals derive from the sf0.01 parquet:
the IVF trio + dsir + unigram) are excluded by construction — their
at-scale proof is the refit path (scripts/ivf_refit_proof.py).

Usage: python scripts/oracle_sweep.py [sf_dir] [name,name,...]
Prints one line per query; exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from retail_aws_etl_pipeline_spark.plans import all_specs  # noqa: E402
from retail_aws_etl_pipeline_spark.session import get_spark  # noqa: E402
from oracle import compare  # noqa: E402

#: oracle literals fitted from the sf0.01 parquet — compare is only valid
#: there; the refit scripts carry their at-scale proof.
SF001_PINNED = {
    "ann_topk_ivf_indexed",
    "bitext_margin_pairs_ivf",
    "ann_recall_sweep",
    "dsir_selected_docs",
    "unigram_lm_report",
}


def _staged_pairs():
    """(name, fn, oracle) for STAGED ops (module-level oracle constants,
    not yet in a registry) — swept with the same protocol so their
    at-scale proof exists before registration."""
    from retail_aws_etl_pipeline_spark.plans import extensions as E

    # The r15 tranche (doc_perplexity_report, minhash_estimate_error,
    # temperature_mixture_report, bloom_prefilter_stats,
    # join_key_skew_report, hll_distinct_report) registered at r15 and
    # moved to the registry sweep above. Classification: ALL SIX are
    # corpus-generic — no fit-time literals in any oracle (the KN table,
    # Bloom words, HLL registers and skew counts are re-derived from the
    # swept corpus in SQL; HLL_LC_TABLE is a function of m alone, not of
    # any corpus) — so none joins SF001_PINNED and none needs a refit
    # script.
    #
    # The r16 tranche (hll_overlap_report, badwords_filter_report,
    # ngram_diversity_report, template_affix_report,
    # corpus_snapshot_delta, langid_confusion_report) registered at r16
    # and moved to the registry sweep. Classification: ALL SIX are
    # corpus-generic — the badwords blocklist and AFFIX_K are fixed
    # design constants riding both engines' plans as literals (not
    # fitted from any corpus), the overlap/delta parity strata are
    # deterministic id arithmetic, and the confusion oracle shares
    # doc_lang_id's corpus-independent scored CTE generator — so none
    # joins SF001_PINNED and none needs a refit script.
    return [
        # staged r17 seeds (built r14): the frequency + quantile sketches
        ("countmin_topk_report", E.countmin_topk_report, E.COUNTMIN_TOPK_ORACLE),
        (
            "hash_sample_quantile_report",
            E.hash_sample_quantile_report,
            E.HASH_SAMPLE_ORACLE,
        ),
        # staged r17 tranche completion (built r15): all corpus-generic
        # (the agreement oracle shares the registered gate fragments;
        # the rank-spectrum oracles embed only the generated log2
        # ladder; the streamed sketch re-derives registers from scratch)
        (
            "streamed_hll_snapshot_report",
            E.streamed_hll_snapshot_report,
            E.STREAMED_HLL_SNAPSHOT_ORACLE,
        ),
        (
            "quality_gate_agreement_report",
            E.quality_gate_agreement_report,
            E.QUALITY_GATE_AGREEMENT_ORACLE,
        ),
        ("zipf_fit_report", E.zipf_fit_report, E.ZIPF_FIT_ORACLE),
        ("vocab_coverage_report", E.vocab_coverage_report, E.VOCAB_COVERAGE_ORACLE),
        # staged r18 seeds (built r15): the streamed count-min twin
        # (verbatim batch oracle) + the quantized-PSI drift monitor —
        # both corpus-generic.
        (
            "streamed_cms_topk_report",
            E.streamed_cms_topk_report,
            E.STREAMED_CMS_TOPK_ORACLE,
        ),
        ("token_drift_psi_report", E.token_drift_psi_report, E.TOKEN_PSI_ORACLE),
        ("tiff_dims_probe", E.tiff_dims_probe, E.TIFF_DIMS_ORACLE),
        (
            "source_priority_dedup_report",
            E.source_priority_dedup_report,
            E.SOURCE_PRIORITY_DEDUP_ORACLE,
        ),
        (
            "streamed_bottomk_quantile_report",
            E.streamed_bottomk_quantile_report,
            E.STREAMED_BOTTOMK_ORACLE,
        ),
        # staged r19-queue tranche (built r16): all corpus-generic —
        # the entropy ladder is generated from pure integer arithmetic
        # (a function of the ppm scale alone), the novelty/churn/
        # k-anonymity/UniMax oracles re-derive every count from the
        # swept corpus in SQL, and the streamed Bloom twin shares the
        # registered batch oracle verbatim — so none joins SF001_PINNED
        # and none needs a refit script.
        ("char_entropy_report", E.char_entropy_report, E.CHAR_ENTROPY_ORACLE),
        ("ngram_novelty_report", E.ngram_novelty_report, E.NGRAM_NOVELTY_ORACLE),
        ("topk_churn_report", E.topk_churn_report, E.TOPK_CHURN_ORACLE),
        ("k_anonymity_report", E.k_anonymity_report, E.K_ANONYMITY_ORACLE),
        (
            "unimax_allocation_report",
            E.unimax_allocation_report,
            E.UNIMAX_ORACLE,
        ),
        (
            "streamed_bloom_filter_report",
            E.streamed_bloom_filter_report,
            E.STREAMED_BLOOM_ORACLE,
        ),
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    staged_only = only == {"staged"}
    spark = get_spark(app_name="oracle_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    failed, skipped, n_ok = [], [], 0
    if staged_only:
        for name, fn, oracle in _staged_pairs():
            t0 = time.perf_counter()
            r = compare(fn(spark, sf_dir), oracle, sf_dir)
            wall = time.perf_counter() - t0
            if r["ok"]:
                n_ok += 1
                print(f"OK   {name}: {wall:.2f} s", flush=True)
            else:
                failed.append(name)
                print(f"FAIL {name}: {r}", flush=True)
        print(f"staged sweep @ {sf_dir}: {n_ok} OK, {len(failed)} failed")
        sys.exit(1 if failed else 0)
    for name, spec in sorted(all_specs().items()):
        if only is not None and name not in only:
            continue
        if spec.oracle is None:
            continue
        if name in SF001_PINNED:
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        try:
            r = compare(spec.spark_fn(spark, sf_dir), spec.oracle, sf_dir)
        except Exception as ex:  # noqa: BLE001 - sweep must report, not die
            print(f"ERR  {name}: {str(ex)[:200]}", flush=True)
            failed.append(name)
            continue
        wall = time.perf_counter() - t0
        if r["ok"]:
            n_ok += 1
            print(f"OK   {name}: {wall:.2f} s", flush=True)
        else:
            failed.append(name)
            print(
                f"FAIL {name}: {({k: v for k, v in r.items() if k != 'first_diffs'})} "
                f"{r.get('first_diffs')}",
                flush=True,
            )
    print(f"sweep @ {sf_dir}: {n_ok} OK, {len(failed)} failed, "
          f"{len(skipped)} sf0.01-pinned skipped ({sorted(skipped)})")
    if failed:
        print("FAILED:", sorted(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
