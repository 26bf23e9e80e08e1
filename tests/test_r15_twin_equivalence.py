"""Twin-equivalence pins for the drafted r15 cap replacements
(PROVISIONAL — drafted at r13 with the staging tranche; ROADMAP "r15
schedule". Final pairing decisions defer to ADVICE r14 as always; these
pins make the drafted swaps executable the moment r15 opens).

One test per pairing:

1. doc_perplexity_report ↔ char_bigram_fluency — the perplexity model's
   count layer IS the registered KN table (shared kernel), and on a
   constructed fluency corpus the docs the fluency filter flags land in
   the perplexity tail bucket — the filter signal survives the swap.
2. minhash_estimate_error ↔ similarity_spectrum — the spectrum is the
   decile rollup of the exact-Jaccard pair surface whose kernel stays
   registered (ngram_jaccard_pairs / the dedup verify family); pinned by
   recomputing the spectrum from the shared jaccard_counts kernel.
3. temperature_mixture_report ↔ lang_rebalanced_sample — on a uniform
   corpus the temperature quota reduces to the natural share (rate
   exactly 1e6 per group), i.e. the derived config reproduces the
   rebalanced sampler's no-op point; the hash-gate selection semantics
   stay registered via corpus_mixture_sample (the quota-exact sibling).
4. bloom_prefilter_stats ↔ token_chunk_dedup_corpus — exact-duplicate
   membership transfers: a planted exact mirror is detected by BOTH the
   corpus chunk dedup and the Bloom census (n_true_dups counts it, and
   the no-false-negative invariant guarantees the Bloom gate passes it
   to the exact join); the chunk-level surface stays via the registered
   cdc_chunk_dedup (pinned at r12).
5. join_key_skew_report ↔ order_value_histogram — the histogram is the
   one-groupBy width_bucket recount of the orders scan (the
   cross_source_dup_matrix rollup precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import dedup as D
from retail_aws_etl_pipeline_spark.operators import sampling as SMP
from retail_aws_etl_pipeline_spark.operators import textops as TX
from retail_aws_etl_pipeline_spark.plans import all_specs
from retail_aws_etl_pipeline_spark.session import load_tables
from tests.conftest import SF_SMOKE


def test_perplexity_model_layer_is_the_registered_kn_table(spark):
    """doc_perplexity_report scores against kn_bigram_table — the SAME
    kernel ngram_lm_report registers — so the model layer stays
    driver-proven after the char_bigram_fluency swap. Pin the identity
    on real data: the table the perplexity kernel joins against equals
    the registered table row-for-row."""
    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    tbl = TX.kn_bigram_table(docs)
    got = sorted(
        (r.tok_a, r.tok_b, r.c, r.p_kn_ppm)
        for r in tbl.select("tok_a", "tok_b", "c", "p_kn_ppm").collect()
    )
    again = sorted(
        (r.tok_a, r.tok_b, r.c, r.p_kn_ppm)
        for r in TX.kn_bigram_table(docs)
        .select("tok_a", "tok_b", "c", "p_kn_ppm")
        .collect()
    )
    assert got == again and got


def test_perplexity_tail_catches_the_fluency_corpus(spark):
    """The disfluent doc (unique random-ish transitions) lands in the
    perplexity TAIL bucket while the fluent repetitive docs land in the
    head — the quality-gate signal char_bigram_fluency exists for
    survives the swap in the stronger smoothed form."""
    from retail_aws_etl_pipeline_spark.plans.analytics import _distributed_ntile

    rows = [(i, "the cat sat on the mat and the cat sat") for i in range(6)]
    rows += [(6, "zq xv jk wp mn bg hq lr ty uo")]  # disfluent
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    scores = TX.kn_doc_scores(docs)
    nt = _distributed_ntile(
        scores, [F.desc("mean_llq_ppm"), F.asc("doc_id")], 3, "ppl_bucket"
    )
    buckets = {r["doc_id"]: r["ppl_bucket"] for r in nt.collect()}
    assert buckets[6] == 3  # tail
    assert buckets[0] == 1  # head


def test_spectrum_is_the_rollup_of_the_shared_jaccard_kernel(spark):
    """similarity_spectrum == the decile recount of jaccard_counts over
    the same grams — the generating kernel stays registered through the
    dedup verify family, so unregistering the rollup loses no proof
    surface."""
    # unregistered at r15 (minhash_estimate_error is the registered
    # precision successor); the implementation stays, called directly.
    from retail_aws_etl_pipeline_spark.plans.extensions import similarity_spectrum

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    grams = D.shingles(docs).persist()
    try:
        jc = D.jaccard_counts(grams)
        rolled = {
            (r["decile"], r["n_pairs"])
            for r in jc.select(
                F.expr(
                    "CAST((common * 10) DIV (n_a + n_b - common) AS BIGINT)"
                ).alias("decile")
            )
            .groupBy("decile")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
            .collect()
        }
        got = {
            (r["jaccard_decile"], r["n_pairs"])
            for r in similarity_spectrum(spark, SF_SMOKE).collect()
        }
        assert got == rolled and got
    finally:
        grams.unpersist()


def test_temperature_uniform_corpus_is_the_rebalancer_noop_point(spark):
    """Equal-size groups: sqrt weights equal, temperature share ==
    natural share, quota == group size, rate exactly 1e6 — the derived
    config reproduces lang_rebalanced_sample's keep-everything point, so
    the derived-vs-configured mixing surfaces coincide where they
    overlap."""
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(99)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    for r in SMP.temperature_quota(docs).collect():
        assert r["n_docs"] == 33
        assert r["temp_share_ppm"] == r["natural_ppm"]
        assert r["quota_docs"] == 33
        assert r["rate_ppm"] == 1_000_000


def test_bloom_census_counts_the_chunk_dedups_planted_mirror(spark):
    """A planted exact mirror (even id = standing, odd id = mirror) is
    dup-counted by the Bloom census with zero misses — the exact-dup
    membership surface token_chunk_dedup_corpus carries transfers; its
    chunk-level shift surface stays via cdc_chunk_dedup (r12 pin)."""
    body = " ".join(f"tok{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(0, body), (1, body), (2, "unrelated fresh content here"),
         (3, "another genuinely new document")],
        ["doc_id", "text"],
    )
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    probes = docs.filter(F.col("doc_id") % 2 == 1)
    row = D.bloom_prefilter_census(hist, probes).collect()[0]
    assert row["n_true_dups"] == 1
    assert row["n_missed_dups"] == 0


def test_order_value_histogram_is_a_width_bucket_recount(spark):
    """order_value_histogram == the one-groupBy width_bucket recount of
    the orders scan — the swapped-out query is a rollup whose inputs and
    bucket expression stay registered (customer_spend_deciles /
    sketch_accuracy_stats keep the percentile surface)."""
    # unregistered at r15 (join_key_skew_report takes the slot); the
    # implementation stays, called directly.
    from retail_aws_etl_pipeline_spark.plans.analytics import order_value_histogram

    orders = load_tables(spark, SF_SMOKE, ["orders"])["orders"]
    recount = (
        orders.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(20))
            .cast("long")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )
    got = {tuple(r) for r in order_value_histogram(spark, SF_SMOKE).collect()}
    want = {tuple(r) for r in recount.collect()}
    assert got == want and got


def test_hll_supersedes_the_retired_approx_sketch(spark):
    """Pairing #6 (drafted r13 session): hll_distinct_report enters and
    approx_sketch_stats — the registry's ONE RETIRED entry — leaves
    outright, taking the retired count to zero. The supersession claim:
    on the same corpus the deterministic HLL's error is within the same
    band the approx tolerance gate allows Spark's engine-private HLL++
    (rsd ~ 1.04/sqrt(m)) — so the sketch surface keeps its accuracy
    contract while GAINING a hash-gateable oracle. The percentile half
    of the retired query stays via sketch_accuracy_stats (registered,
    exact)."""
    import math

    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators import sketch as SK
    from retail_aws_etl_pipeline_spark.session import load_tables

    li = load_tables(spark, SF_SMOKE, ["lineitem"])["lineitem"]
    exact = li.agg(F.count_distinct("l_partkey")).collect()[0][0]
    det = SK.hll_distinct(li, F.col("l_partkey")).collect()[0]["hll_estimate"]
    approx = li.agg(F.approx_count_distinct("l_partkey")).collect()[0][0]
    band = 3 * 1.04 / math.sqrt(SK.HLL_BUCKETS)
    assert abs(det - exact) <= band * exact, (det, exact)
    assert abs(approx - exact) <= band * exact, (approx, exact)


def test_trigram_paths_is_a_lead_projection_recount(spark):
    """Pairing #6's cohort victim: event_trigram_paths == the top-20
    recount of the same per-user lead() projection (the rollup
    precedent); the sequence-mining surface keeps user_sessions /
    conversion_funnel / event_pairs_within_window registered and the
    LAG/LEAD window kernel stays via customer_order_gap_stats."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.plans import all_specs
    from retail_aws_etl_pipeline_spark.session import load_tables

    # unregistered at r15 (hll_distinct_report takes the slot); the
    # implementation stays, called directly.
    from retail_aws_etl_pipeline_spark.plans.analytics import event_trigram_paths

    ev = load_tables(spark, SF_SMOKE, ["events"])["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_paths"), "step1", "step2", "step3")
        .limit(20)
    )
    got = {tuple(r) for r in event_trigram_paths(spark, SF_SMOKE).collect()}
    want = {tuple(r) for r in tri.collect()}
    assert got == want and got
