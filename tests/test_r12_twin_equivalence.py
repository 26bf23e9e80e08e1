"""Twin-equivalence pins for the drafted r12 cap replacements.

VERDICT r10 item #3: every r12 swap's twin relation must be pinned by a
test BEFORE r12 opens, so unregistering the weakest variant provably
keeps its semantics on the driver proof surface. One test per pairing in
ROADMAP's "r12 schedule" section:

1. cdc_chunk_dedup ↔ token_chunk_dedup — CDC detects everything the
   fixed window detects on unshifted mirrors AND keeps detecting after
   the one-token shift that blinds the fixed window.
2. bpe_pair_stats ↔ collocation_pairs — the census's word-pair count
   layer equals the collocation pair aggregation.
3. gopher_quality_report swap: bm25_query_scores ↔ bm25_multi_query_topk
   — the multi form restricted to one query reproduces the single form.
4. zorder_pruning_stats swap: cross_source_dup_matrix == the rollup
   recomputed from the registered jaccard pair surface.
5. sitemap reserve: incremental_jaccard_counts == the batch self-join
   restricted to batch-crossing pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import dedup as D
from retail_aws_etl_pipeline_spark.session import load_tables
from tests.conftest import SF_ORACLE


def test_cdc_supersedes_fixed_window_chunk_dedup(spark):
    """On an UNSHIFTED mirrored passage both chunkers report cross-doc
    duplicate chunks; after a one-token prefix insertion only CDC does —
    the claim that makes cdc_chunk_dedup the registered successor of
    token_chunk_dedup at the r12 swap."""
    # 64 deterministic tokens so both CDC and the w-token window place
    # interior boundaries; doc 1 mirrors doc 0 exactly.
    passage = " ".join(f"tok{i * 7 % 29}x{i}" for i in range(64))
    base = spark.createDataFrame(
        [(0, passage), (1, passage)], "doc_id long, text string"
    )

    def cross_doc_dups(chunks):
        return (
            chunks.groupBy("chunk_text")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .count()
        )

    fixed = D.token_chunks(base).withColumnRenamed("chunk", "chunk_text")
    cdc = D.content_defined_chunks(base)
    assert cross_doc_dups(fixed) > 0, "fixed window must match unshifted mirror"
    n_cdc_unshifted = cross_doc_dups(cdc)
    assert n_cdc_unshifted > 0, "CDC must match unshifted mirror"

    shifted = spark.createDataFrame(
        [(0, passage), (1, "inserted " + passage)], "doc_id long, text string"
    )
    fixed_s = D.token_chunks(shifted).withColumnRenamed("chunk", "chunk_text")
    cdc_s = D.content_defined_chunks(shifted)
    assert cross_doc_dups(fixed_s) == 0, (
        "a one-token shift should blind the fixed window on this corpus"
    )
    assert cross_doc_dups(cdc_s) > 0, "CDC must keep matching after the shift"


def test_bpe_pair_stats_equals_collocation_pair_layer(spark):
    """bpe_pair_stats' n_total per (tok_a, tok_b) is the SAME adjacent
    word-pair aggregation collocation_pairs composes (its n_pair), so
    the count layer stays registered after the r12 swap."""
    from retail_aws_etl_pipeline_spark.plans.extensions import bpe_pair_stats

    census = {
        (r.tok_a, r.tok_b): r.n_total
        for r in bpe_pair_stats(spark, SF_ORACLE).collect()
    }
    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"].withColumn(
        "__toks", F.split("text", " ")
    )
    pairs_arr = (
        "CASE WHEN size(__toks) >= 2 THEN"
        " transform(sequence(1, size(__toks) - 1),"
        " i -> struct(element_at(__toks, i) AS tok_a,"
        " element_at(__toks, i + 1) AS tok_b))"
        " ELSE array() END"
    )
    colloc = {
        (r.tok_a, r.tok_b): r.n_pair
        for r in (
            docs.select(F.explode(F.expr(pairs_arr)).alias("p"))
            .select("p.tok_a", "p.tok_b")
            .filter((F.col("tok_a") != "") & (F.col("tok_b") != ""))
            .groupBy("tok_a", "tok_b")
            .agg(F.count(F.lit(1)).alias("n_pair"))
            .collect()
        )
    }
    assert census, "census empty — fixture corpus has no adjacent pairs?"
    for k, v in census.items():  # census is the top-100 slice of the layer
        assert colloc.get(k) == v, (k, v, colloc.get(k))


def test_bm25_multi_restricted_to_one_query_matches_single(spark):
    """bm25_scores_multi with a single query reproduces bm25_scores —
    same docs, same scores up to the documented DECIMAL(28,6)
    accumulator rounding (<= 1e-6 absolute per term)."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        bm25_scores,
        bm25_scores_multi,
    )

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    terms = ("alpha", "data", "beta")
    single = {
        r.doc_id: r.score for r in bm25_scores(docs, terms).collect()
    }
    term_df = spark.createDataFrame(
        [("q0", t) for t in terms], "query_id string, term string"
    )
    multi = {
        r.doc_id: r.score
        for r in bm25_scores_multi(docs, term_df).collect()
    }
    assert single, "no document matched the probe terms at sf0.01"
    assert set(multi) == set(single)
    for d, s in single.items():
        assert abs(multi[d] - s) <= 1e-5 * max(1.0, abs(s)), (d, s, multi[d])


def test_cross_source_dup_matrix_is_the_pair_rollup(spark):
    """cross_source_dup_matrix == the source x source rollup recomputed
    from the registered jaccard pair surface (ngram_jaccard_pairs'
    threshold on jaccard_counts) — the rollup adds nothing the pair
    frame doesn't carry, so the r12 swap loses no proof surface."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        cross_source_dup_matrix,
    )

    got = {
        (r.source_a, r.source_b): (r.n_pairs, r.sum_common)
        for r in cross_source_dup_matrix(spark, SF_ORACLE).collect()
    }
    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    grams = D.shingles(docs)
    pairs = D.jaccard_counts(grams).filter(
        F.col("common") * 5 >= (F.col("n_a") + F.col("n_b") - F.col("common"))
    )
    src = docs.select("doc_id", "source")
    rolled = (
        pairs.join(
            src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
            "id_a",
        )
        .join(
            src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
            "id_b",
        )
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("common").alias("sum_common"),
        )
    )
    want = {
        (r.source_a, r.source_b): (r.n_pairs, r.sum_common)
        for r in rolled.collect()
    }
    assert got == want and got, (got, want)


def test_incremental_jaccard_is_the_restricted_self_join(spark):
    """incremental_jaccard_counts(batch, corpus) == the full self-join's
    pairs restricted to batch x corpus — the incremental form is a
    partition of the batch-pair space, not a different semantics."""
    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    batch_docs = docs.filter(F.col("doc_id") % 5 == 0)
    corpus_docs = docs.filter(F.col("doc_id") % 5 != 0)
    bg = D.shingles(batch_docs)
    cg = D.shingles(corpus_docs)
    inc = {
        (r.batch_id, r.corpus_id): (r.n_batch, r.n_corpus, r.common)
        for r in D.incremental_jaccard_counts(bg, cg).collect()
    }
    full = D.jaccard_counts(D.shingles(docs))
    batch_ids = {r.doc_id for r in batch_docs.select("doc_id").collect()}
    want = {}
    for r in full.collect():
        a_in = r.id_a in batch_ids
        b_in = r.id_b in batch_ids
        if a_in == b_in:
            continue  # within-batch / within-corpus pairs: jaccard_counts' job
        if a_in:
            want[(r.id_a, r.id_b)] = (r.n_a, r.n_b, r.common)
        else:
            want[(r.id_b, r.id_a)] = (r.n_b, r.n_a, r.common)
    assert inc == want and inc, (len(inc), len(want))
