"""Tolerance gates for the approximate-sketch kernels.

``approx_sketch_stats`` is deliberately not driver-facing: sketch internals
(HyperLogLog registers, GK/KLL summaries) differ per engine, so no hash
oracle can exist for it. Its accuracy is proven here instead, against the
exact twin ``sketch_accuracy_stats`` (which IS hash-checked by the driver):

- ``approx_count_distinct(col, rsd)``: relative error gated at 3*rsd
  (HLL standard-error bound; 3 sigma ~ 99.7%).
- ``approx_percentile(col, p, accuracy)``: rank-error gated at
  n/accuracy + 1 — the documented GK guarantee — by recomputing the
  actual rank of each approximate quantile value against the base table.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retail_aws_etl_pipeline_spark.plans import all_specs
from retail_aws_etl_pipeline_spark.session import load_tables
from tests.conftest import SF_ORACLE

#: Mirrors the kernel parameters inside approx_sketch_stats.
HLL_RSD = 0.01
GK_ACCURACY = 10000  # Spark default for approx_percentile


def test_approx_sketch_within_tolerance(spark):
    # approx_sketch_stats left the registry outright at r15 (the
    # deterministic hll_distinct_report put the sketch surface under the
    # hash gate); the HLL++/GK tolerance gate keeps pinning the
    # UNREGISTERED spec so the engine-private kernels stay accuracy-proven.
    from retail_aws_etl_pipeline_spark.plans import UNREGISTERED

    specs = all_specs()
    approx = {
        r["l_returnflag"]: r
        for r in UNREGISTERED["approx_sketch_stats"]
        .spark_fn(spark, SF_ORACLE)
        .collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in specs["sketch_accuracy_stats"].spark_fn(spark, SF_ORACLE).collect()
    }
    assert set(approx) == set(exact) and approx, "group keys must line up"

    lineitem = load_tables(spark, SF_ORACLE, ["lineitem"])["lineitem"]
    # One pass: per (flag, percentile-label) rank of the approx value.
    rank_rows = (
        lineitem.groupBy("l_returnflag")
        .agg(
            *[
                F.sum(
                    (F.col("l_extendedprice") <= F.lit(approx_row[label])).cast("long")
                ).alias(f"rank_{label}_{flag}")
                for flag, approx_row in approx.items()
                for label in ("p50", "p90", "p99")
            ]
        )
        .collect()
    )
    ranks = {r["l_returnflag"]: r for r in rank_rows}

    for flag, a in approx.items():
        e = exact[flag]
        n = e["n"]
        assert a["n"] == n, f"{flag}: exact COUNT(*) must agree"

        # HLL: |approx - exact| / exact <= 3 * rsd
        rel = abs(a["approx_parts"] - e["distinct_parts"]) / e["distinct_parts"]
        assert rel <= 3 * HLL_RSD, (
            f"{flag}: approx_count_distinct off by {rel:.4f} "
            f"(> {3 * HLL_RSD}): {a['approx_parts']} vs {e['distinct_parts']}"
        )

        # GK: the returned value's true rank within n/accuracy + 1 of target.
        tol = n / GK_ACCURACY + 1
        for label, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            actual_rank = ranks[flag][f"rank_{label}_{flag}"]
            target_rank = p * n
            assert abs(actual_rank - target_rank) <= tol, (
                f"{flag}/{label}: rank {actual_rank} vs target {target_rank} "
                f"(tol {tol}) for approx value {a[label]}"
            )


def test_sketch_window_membership():
    """The exact twin stays driver-checkable (oracle'd — window membership
    itself rotates under the COVERAGE.md §rotation SLO, enforced by
    test_window_slo.py); since r15 the approx sketch is UNREGISTERED
    outright (hll_distinct_report carries the hash-gated sketch surface;
    the local tolerance gate above keeps the HLL++/GK kernels proven) and
    the RETIRED table is empty — every registered entry is oracle'd."""
    from retail_aws_etl_pipeline_spark.plans import (
        EXTRA_REGISTRY,
        REGISTRY,
        RETIRED,
        UNREGISTERED,
    )
    from retail_aws_etl_pipeline_spark.plans.queries import all_specs

    assert all_specs()["sketch_accuracy_stats"].oracle is not None
    assert all_specs()["hll_distinct_report"].oracle is not None
    assert "approx_sketch_stats" not in REGISTRY
    assert "approx_sketch_stats" not in EXTRA_REGISTRY
    assert "approx_sketch_stats" in UNREGISTERED
    assert RETIRED == {}
    # the whole driver window must be hash-checkable (VERDICT r5 #1) —
    # and with RETIRED empty, so must the ENTIRE registry.
    oracle_less = [n for n, s in all_specs().items() if s.oracle is None]
    assert oracle_less == [], f"registry has unprovable entries: {oracle_less}"


def test_chunk_dedup_handcrafted(spark):
    from retail_aws_etl_pipeline_spark.operators.dedup import chunk_dedup_stats

    # w=2 spans. doc 0: [a b][c d][a b] -> within-doc repeat dedups.
    # doc 1: [a b][x y z's tail] -> cross-doc repeat of "a b" dedups,
    # trailing partial span (1 token) retained.
    docs = spark.createDataFrame(
        [(0, "a b c d a b"), (1, "a b x")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_retained"],
            r["n_tokens"],
            r["n_tokens_retained"],
        )
        for r in chunk_dedup_stats(docs, w=2).collect()
    }
    # doc 0: 3 spans, "a b"@0 + "c d"@1 retained, third "a b" dropped.
    assert out[0] == (3, 2, 6, 4)
    # doc 1: spans "a b" (dup of doc0@0 -> dropped) + "x" (partial, kept).
    assert out[1] == (2, 1, 3, 1)


def test_chunk_dedup_corpus_rebuild(spark):
    from retail_aws_etl_pipeline_spark.operators.dedup import chunk_dedup_corpus

    docs = spark.createDataFrame(
        [(0, "a b c d a b"), (1, "a b x"), (2, "a b c d")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: (r["text"], r["n_tokens_retained"])
        for r in chunk_dedup_corpus(docs, w=2).collect()
    }
    # doc 0 keeps spans "a b"@0 and "c d"@1; the repeated "a b" drops.
    assert out[0] == ("a b c d", 4)
    # doc 1: "a b" already seen -> only the partial "x" survives.
    assert out[1] == ("x", 1)
    # doc 2: both spans already seen -> empty text, row preserved.
    assert out[2] == ("", 0)


def test_token_budget_greedy_edge(spark):
    from retail_aws_etl_pipeline_spark.operators.sampling import token_budget_select

    # quality order (diversity): doc 0 (4 distinct/4) > doc 1 (3/4) >
    # doc 2 (2/4) > doc 3 (1/4). Budget 10/16 of 16 tokens = 10 -> greedy
    # keeps docs 0 and 1 (cum 8); doc 2 would hit 12 > 10 -> excluded,
    # and so is everything after it even though nothing else fits either.
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "a b c a"),
            (2, "a b a b"),
            (3, "a a a a"),
        ],
        ["doc_id", "text"],
    )
    out = token_budget_select(docs, budget_num=10, budget_den=16)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1]
    # cum_tokens is the inclusive running total in quality order
    cums = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    assert cums == {0: 4, 1: 8}


def test_pairs_within_window_boundaries(spark):
    """Banded interval join edge cases: a pair straddling the block
    boundary is found, each pair is generated exactly ONCE (no double
    count from the two probes), equal timestamps tie-break on id, and a
    gap of exactly the window width is inclusive while width+1 is out."""
    from retail_aws_etl_pipeline_spark.plans.analytics import pairs_within_window

    W_US = 100
    rows = [
        # user 1: t=99 and t=101 straddle the 100-block boundary, gap 2
        (10, 1, 99),
        (11, 1, 101),
        # user 1: gap exactly W (inclusive) from t=101 -> 201
        (12, 1, 201),
        # user 2: gap W+1 -> excluded
        (20, 2, 0),
        (21, 2, 101),
        # user 3: identical timestamps -> one pair, id-ordered
        (30, 3, 500),
        (31, 3, 500),
    ]
    e = spark.createDataFrame(rows, ["event_id", "user_id", "t"])
    got = sorted(
        (r["user_id"], r["id_a"], r["id_b"], r["gap_us"])
        for r in pairs_within_window(e, W_US).collect()
    )
    # (10,12) has gap 102 > 100 -> excluded; (11,12) gap 100 inclusive
    assert got == [(1, 10, 11, 2), (1, 11, 12, 100), (3, 30, 31, 0)]


def test_pairs_within_window_negative_times(spark):
    """Pre-epoch (negative µs) timestamps: Spark's `div` truncates toward
    zero, so the block at zero spans [-(w-1), w-1] — wider than w, which
    is still sound for the probe-own-and-next-block rule (blocks are
    monotone and at least w wide). Verify against a brute-force filter."""
    from itertools import combinations

    from retail_aws_etl_pipeline_spark.plans.analytics import pairs_within_window

    W_US = 100
    ts = [-250, -199, -150, -101, -99, -50, -1, 0, 1, 99, 100, 199, 250]
    rows = [(i, 1, t) for i, t in enumerate(ts)]
    e = spark.createDataFrame(rows, ["event_id", "user_id", "t"])
    got = sorted(
        (r["id_a"], r["id_b"], r["gap_us"])
        for r in pairs_within_window(e, W_US).collect()
    )
    want = sorted(
        (i, j, ts[j] - ts[i])
        for i, j in combinations(range(len(ts)), 2)
        if 0 <= ts[j] - ts[i] <= W_US
    )
    assert got == want


def test_hll_sketches_merge_within_bounds(spark):
    """Distributed-sketch mergeability (the property that makes approx
    counting work at 100 TB): per-source HLL sketches built
    independently and unioned with hll_union_agg estimate the same
    cardinality within HLL error bounds. NOT asserted bit-equal to the
    monolithic sketch: DataSketches unions run through HLL-8 internally,
    so union-of-parts and one-pass sketches legitimately differ by a few
    counts, and different shardings of the SAME rows differ again. The
    reliable contract is the error bound alone."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.session import load_tables
    from tests.conftest import SF_ORACLE

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    direct = docs.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("text")).alias("est")
    ).collect()[0]["est"]

    def merged_by(col):
        return (
            docs.groupBy(col)
            .agg(F.hll_sketch_agg("text").alias("sk"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .collect()[0]["est"]
        )

    by_source = merged_by("source")
    by_bucket = merged_by(F.col("doc_id") % 13)
    # Measured here: by_source=503, by_bucket=501, direct=496 for exact
    # 500 — merge results also vary with the SHARDING (sub-sketch mode /
    # promotion differs by group size), so the only contract a pipeline
    # may rely on is the error bound, never sketch-identity. Both facts
    # pinned: estimates differ across plans, all stay within bounds.
    exact = docs.select("text").distinct().count()
    for est in (direct, by_source, by_bucket):
        assert abs(est - exact) <= max(3, int(exact * 0.05)), (est, exact)


def test_margin_mutual_pairs_handcrafted(spark):
    """Mutual-NN + margin semantics on a handcrafted embedding set:
    a0<->b0 mutual with a wide margin (accepted), a1/a2 both nearest to
    hub b1, whose best (a2, by a hair) and second-best (a1) are nearly
    tied — the mutual pair (a2, b1) survives mutuality but FAILS the
    11/10 margin; (a1, b1) is not mutual and never appears."""
    from retail_aws_etl_pipeline_spark.operators.similarity import (
        margin_mutual_pairs,
        with_quantized,
    )

    def emb(vid, vec):
        return (vid, [float(x) for x in vec])

    # 4-dim toy space. a0 aligned with b0 only; a1 and a2 both close to b1.
    rows_a = [
        emb(0, [1.0, 0.0, 0.0, 0.0]),   # a0
        emb(1, [0.0, 1.0, 0.0, 0.0]),   # a1
        emb(2, [0.0, 0.98, 0.2, 0.0]),  # a2, near-tie with a1 toward b1
    ]
    rows_b = [
        emb(10, [0.99, 0.1, 0.0, 0.0]),  # b0
        emb(11, [0.0, 0.99, 0.1, 0.0]),  # b1 hub
    ]
    mk = lambda rows: with_quantized(
        spark.createDataFrame(rows, "id long, embedding array<float>")
    ).select("id", "qvec", "qnorm")
    out = {
        (r.id_a, r.id_b): r.margin_ok
        for r in margin_mutual_pairs(mk(rows_a), mk(rows_b)).collect()
    }
    # a0's only plausible partner is b0 and vice versa; only two B vectors
    # exist so a0's second-best (b1, near-orthogonal) clears the margin.
    assert out.get((0, 10)) is True
    # (a2, b1) mutual: b1 prefers a2 by a sliver, but its second-best a1
    # is within 10% — margin must fail.
    assert (2, 11) in out and out[(2, 11)] is False
    assert (1, 11) not in out

    # sq_scale threads through (ADVICE r7): a 100x finer reduction gives
    # a tighter approximation of the exact ratio and must agree with the
    # default on this clear-cut set (the knob exists precisely so callers
    # with custom margins can pick their precision/headroom trade —
    # sq_scale=1 would overflow int64 even here, which is why the
    # reduction exists at all), while an absurdly coarse scale floors
    # every dot² to 0 and accepts everything (the knob visibly moves the
    # boundary).
    from retail_aws_etl_pipeline_spark.operators.similarity import (
        margin_mutual_pairs as mmp,
    )

    finer = {
        (r.id_a, r.id_b): r.margin_ok
        for r in mmp(mk(rows_a), mk(rows_b), sq_scale=10**4).collect()
    }
    assert finer == out
    coarse = {
        (r.id_a, r.id_b): r.margin_ok
        for r in mmp(mk(rows_a), mk(rows_b), sq_scale=10**15).collect()
    }
    assert coarse[(2, 11)] is True  # dot² div 1e15 == 0 on both sides


def test_containment_prefix_on_boilerplate_corpus(spark):
    """On the boilerplate-skew corpus the prefix path is (1) exactly equal
    to the brute inverted-index formulation — the prefix lemma under hot
    grams — and (2) probes FAR fewer candidates than the raw index join
    generates sharing pairs, the whole point of the filter."""
    from retail_aws_etl_pipeline_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_prefix,
        containment_prefix_candidates,
        jaccard_counts,
        shingles,
    )
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        CONTAINMENT_PCT,
        boilerplate_docs,
    )
    from retail_aws_etl_pipeline_spark.session import load_tables
    from tests.conftest import SF_ORACLE

    docs = boilerplate_docs(
        load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    )
    grams = shingles(docs).persist()
    brute = {
        tuple(r) for r in containment_pairs(grams, CONTAINMENT_PCT).collect()
    }
    prefix = {
        tuple(r)
        for r in containment_pairs_prefix(grams, CONTAINMENT_PCT).collect()
    }
    assert brute == prefix and brute, "prefix path must be exact and non-trivial"

    n_candidates = containment_prefix_candidates(grams, CONTAINMENT_PCT).count()
    n_sharing = jaccard_counts(grams).count()
    assert n_candidates * 5 <= n_sharing, (
        f"prefix filter should cut candidates >=5x on boilerplate skew: "
        f"{n_candidates} candidates vs {n_sharing} sharing pairs"
    )


@given(
    seed=st.integers(0, 10_000),
    na=st.integers(2, 6),
    nb=st.integers(2, 6),
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_margin_mutual_pairs_matches_bruteforce(spark, seed, na, nb):
    """margin_mutual_pairs equals a pure-Python mirror of the identical
    quantized schedule (mutual NN by (cosine DESC, id ASC); margin via the
    same floor-divided squared-integer cross-multiplication) on arbitrary
    deterministic vector sets."""
    import math

    from retail_aws_etl_pipeline_spark.operators.similarity import (
        MARGIN_DEN,
        MARGIN_NUM,
        MARGIN_SQ_SCALE,
        QUANT_SCALE,
        margin_mutual_pairs,
        with_quantized,
    )

    def vec(i, side):
        return [
            (((seed + i * 31 + d * 17 + side * 7) % 97) - 48) / 48.0
            for d in range(6)
        ]

    rows_a = [(i, vec(i, 0)) for i in range(na)]
    rows_b = [(100 + i, vec(i, 1)) for i in range(nb)]
    q = lambda v: [math.floor(x * QUANT_SCALE) for x in v]
    qa = {i: q(v) for i, v in rows_a}
    qb = {i: q(v) for i, v in rows_b}
    qn = lambda x: sum(c * c for c in x)
    dot = lambda x, y: sum(p * r for p, r in zip(x, y))

    def ranked(src, dsts, sv):
        return sorted(
            dsts,
            key=lambda j: (-dot(sv, dsts[j]) / math.sqrt(qn(sv) * qn(dsts[j])), j),
        )

    want = {}
    for i, av in qa.items():
        fb = ranked(i, qb, av)
        j = fb[0]
        if ranked(j, qa, qb[j])[0] != i:
            continue
        d = dot(av, qb[j])
        ok = d > 0
        if len(fb) > 1:
            d2 = dot(av, qb[fb[1]])
            if d2 > 0:
                ok = ok and (d * d) // MARGIN_SQ_SCALE * qn(qb[fb[1]]) * MARGIN_DEN**2 >= (
                    d2 * d2
                ) // MARGIN_SQ_SCALE * qn(qb[j]) * MARGIN_NUM**2
        ba = ranked(j, qa, qb[j])
        if len(ba) > 1:
            d2 = dot(qb[j], qa[ba[1]])
            if d2 > 0:
                ok = ok and (d * d) // MARGIN_SQ_SCALE * qn(qa[ba[1]]) * MARGIN_DEN**2 >= (
                    d2 * d2
                ) // MARGIN_SQ_SCALE * qn(qa[i]) * MARGIN_NUM**2
        want[(i, j)] = ok

    mk = lambda rows: with_quantized(
        spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "id long, embedding array<float>",
        )
    ).select("id", "qvec", "qnorm")
    got = {
        (r.id_a, r.id_b): r.margin_ok
        for r in margin_mutual_pairs(mk(rows_a), mk(rows_b)).collect()
    }
    assert got == want


def test_bitext_ivf_full_probe_equals_brute(spark):
    """With nprobe = n_centroids the IVF candidate set is every (a, b)
    pair, so margin_mutual_pairs_ivf must reproduce the brute operator
    EXACTLY — the invariant that pins the approximation's only source of
    difference to cell pruning."""
    import os

    from retail_aws_etl_pipeline_spark.operators.similarity import (
        ivf_centroids_from_parquet,
        margin_mutual_pairs,
        margin_mutual_pairs_ivf,
        with_quantized,
    )
    from retail_aws_etl_pipeline_spark.plans.extensions import IVF_SAMPLE_MOD
    from retail_aws_etl_pipeline_spark.session import load_tables
    from tests.conftest import SF_ORACLE

    t = load_tables(spark, SF_ORACLE, ["documents", "embeddings"])
    cents = ivf_centroids_from_parquet(
        os.path.join(SF_ORACLE, "embeddings.parquet"), sample_mod=IVF_SAMPLE_MOD
    )
    emb = with_quantized(t["embeddings"])
    sided = emb.join(
        t["documents"].select("doc_id", "lang"), emb.vec_id == F.col("doc_id")
    ).select(F.col("vec_id").alias("id"), "qvec", "qnorm", "lang")
    a = sided.filter(F.col("lang") == "en").select("id", "qvec", "qnorm")
    b = sided.filter(F.col("lang") == "de").select("id", "qvec", "qnorm")
    brute = {(r.id_a, r.id_b, r.dot_q, r.margin_ok)
             for r in margin_mutual_pairs(a, b).collect()}
    full = {(r.id_a, r.id_b, r.dot_q, r.margin_ok)
            for r in margin_mutual_pairs_ivf(a, b, cents, nprobe=len(cents)).collect()}
    assert full == brute and brute


def test_rag_chunk_spans_cover_every_token(spark):
    """Chunk spans tile each doc: starts advance by the stride, the
    union of [start, start+n_tokens) covers [0, doc_len) with no gap,
    every full chunk is exactly W tokens, and only the final chunk may
    be shorter."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        RAG_CHUNK_STRIDE,
        RAG_CHUNK_W,
        rag_chunk_spans,
    )
    from tests.conftest import SF_ORACLE

    rows = rag_chunk_spans(spark, SF_ORACLE).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        doc_len = chunks[-1].start_tok + chunks[-1].n_tokens
        covered_to = 0
        for i, c in enumerate(chunks):
            assert c.chunk_idx == i and c.start_tok == i * RAG_CHUNK_STRIDE
            assert c.start_tok <= covered_to, f"gap in doc {doc_id}"
            covered_to = max(covered_to, c.start_tok + c.n_tokens)
            if i < len(chunks) - 1:
                assert c.n_tokens == RAG_CHUNK_W
            assert 1 <= c.n_tokens <= RAG_CHUNK_W
        assert covered_to == doc_len


def test_funnel_step_latency_handcrafted(spark):
    """Hand-built event streams: user 1 converts view(t=0)->click(10)->
    purchase(40); user 2 view(0)->click(30) only; user 3 clicks BEFORE
    any view (never progresses). Gaps: view->click {10, 30} -> lower
    median 10; click->purchase {30} -> 30."""
    import datetime as dt

    from retail_aws_etl_pipeline_spark.plans.analytics import funnel_step_latency
    from retail_aws_etl_pipeline_spark.plans.queries import EXTRA_REGISTRY, REGISTRY

    def ts(sec):
        return dt.datetime(2024, 1, 1, 0, 0, sec)

    rows = [
        (1, 1, ts(0), "view"), (2, 1, ts(10), "click"), (3, 1, ts(40), "purchase"),
        (4, 2, ts(0), "view"), (5, 2, ts(30), "click"),
        (6, 3, ts(5), "click"), (7, 3, ts(10), "view"),
    ]
    df = spark.createDataFrame(
        [(e, u, t, k, 0.0, "{}") for e, u, t, k in rows],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        spec = REGISTRY.get("funnel_step_latency") or EXTRA_REGISTRY["funnel_step_latency"]
        got = {
            r.step: (r.n_users, r.p50_gap_us)
            for r in spec.spark_fn(spark, d).collect()
        }
    assert got == {
        "view->click": (2, 10_000_000),
        "click->purchase": (1, 30_000_000),
    }


def test_brute_force_topk_jvm_equals_pandas(spark):
    """The JVM F.aggregate brute-force ANN and the Arrow-batched numpy
    GEMM form must be row-identical. Both were driver-proven against the
    shared ANN_TOPK_ORACLE until r8 unregistered the JVM entry at the
    150-cap (COVERAGE.md §rotation r8); this parity test keeps the
    unregistered kernel pinned to the registered one."""
    from retail_aws_etl_pipeline_spark.operators import similarity as S
    from retail_aws_etl_pipeline_spark.plans.extensions import ANN_K, ANN_PROBE_IDS
    from retail_aws_etl_pipeline_spark.session import load_tables
    from tests.conftest import SF_SMOKE

    t = load_tables(spark, SF_SMOKE, ["embeddings"])
    key = lambda r: (r["probe_id"], r["rank"])  # noqa: E731
    jvm = sorted(S.brute_force_topk(t["embeddings"], ANN_PROBE_IDS, ANN_K).collect(), key=key)
    pd_ = sorted(
        S.brute_force_topk_pandas(t["embeddings"], ANN_PROBE_IDS, ANN_K).collect(), key=key
    )
    assert jvm == pd_ and len(jvm) == len(ANN_PROBE_IDS) * ANN_K


def test_hash_grams_scale_variant_is_output_identical(spark):
    """hash_grams=True (the 8-byte xxhash64 join key — 1.45x wall at
    K=100, SCALING.md) must be bit-identical to the exact string form on
    real corpora: sizes are row counts (hash-invariant unconditionally),
    and common shifts only on a cross-doc xxhash64 collision (~G²/2⁶⁵).
    Checked for the self-join kernel (with and without the hot-gram cap)
    and the incremental batch-vs-corpus kernel."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import (
        incremental_jaccard_counts,
        jaccard_counts,
        shingles,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(SF_ORACLE + "/documents.parquet")
    grams = shingles(docs).persist()
    try:
        cols = ["id_a", "id_b", "n_a", "n_b", "common"]
        base = sorted(map(tuple, jaccard_counts(grams).select(*cols).collect()))
        hashed = sorted(
            map(tuple, jaccard_counts(grams, hash_grams=True).select(*cols).collect())
        )
        assert base == hashed and len(base) > 0
        capped = sorted(
            map(tuple, jaccard_counts(grams, max_gram_freq=50).select(*cols).collect())
        )
        capped_h = sorted(
            map(
                tuple,
                jaccard_counts(grams, max_gram_freq=50, hash_grams=True)
                .select(*cols)
                .collect(),
            )
        )
        assert capped == capped_h

        batch = grams.filter(F.col("doc_id") % 10 == 0)
        corpus = grams.filter(F.col("doc_id") % 10 != 0)
        icols = ["batch_id", "corpus_id", "n_batch", "n_corpus", "common"]
        ibase = sorted(
            map(tuple, incremental_jaccard_counts(batch, corpus).select(*icols).collect())
        )
        ihash = sorted(
            map(
                tuple,
                incremental_jaccard_counts(batch, corpus, hash_grams=True)
                .select(*icols)
                .collect(),
            )
        )
        assert ibase == ihash and len(ibase) > 0
    finally:
        grams.unpersist()


def test_hash_band_key_candidates_identical(spark):
    """candidate_pairs(hash_band_key=True) — the 8-byte band-key join —
    must produce the identical candidate set on the real corpus."""
    from retail_aws_etl_pipeline_spark.operators.dedup import (
        candidate_pairs,
        lsh_bands,
        shingles,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(SF_ORACLE + "/documents.parquet")
    bands = lsh_bands(shingles(docs)).persist()
    try:
        base = sorted(map(tuple, candidate_pairs(bands).collect()))
        hashed = sorted(
            map(tuple, candidate_pairs(bands, hash_band_key=True).collect())
        )
        assert base == hashed and len(base) > 0
    finally:
        bands.unpersist()


def test_lsh_bucket_passthrough_keys_on_plane_values(spark):
    """with_lsh_bucket's idempotent pass-through must key on the plane
    VALUES, not the plane count (ADVICE r9): a different plane set of the
    same length must re-derive the bucket, while the identical set passes
    through unchanged."""
    from retail_aws_etl_pipeline_spark.operators.similarity import (
        PLANES,
        with_lsh_bucket,
        with_quantized,
    )

    docs = spark.read.parquet(SF_ORACLE + "/embeddings.parquet").limit(64)
    base = with_lsh_bucket(with_quantized(docs), planes=PLANES[:4])

    # Same plane set -> pass-through (same plan, no recompute).
    again = with_lsh_bucket(base, planes=PLANES[:4])
    assert again is base

    # Different plane set of the SAME length -> must re-derive.
    flipped = [[-w for w in p] for p in PLANES[:4]]
    rederived = with_lsh_bucket(base, planes=flipped)
    assert rederived is not base
    a = {r.vec_id: r.bucket for r in base.select("vec_id", "bucket").collect()}
    b = {r.vec_id: r.bucket for r in rederived.select("vec_id", "bucket").collect()}
    # Sign-flipped planes flip every bit whose projection is nonzero
    # (b == a XOR nonzero-projection-mask): with real-valued embeddings
    # at least one row must land elsewhere, proving the bucket was
    # recomputed rather than passed through stale.
    assert any(b[k] != a[k] for k in a)
