"""Proof battery for the STAGED r17 tranche built at r15 (beyond the two
r14 seeds, which carry their own battery in test_staged_r17_seeds.py):
streamed_hll_snapshot_report, quality_gate_agreement_report,
zipf_fit_report, vocab_coverage_report. Same discipline as every staged
predecessor: DuckDB oracle compares at two gate scales, handcrafted
semantics tests per operator, pure-Python mirrors for the novel
arithmetic, and plan gates."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.plans import extensions as E
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare

PAIRS = [
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
]


@pytest.mark.parametrize("name,fn,oracle", PAIRS, ids=[p[0] for p in PAIRS])
@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_staged_pair_matches_oracle(spark, name, fn, oracle, sf_dir):
    r = compare(fn(spark, sf_dir), oracle, sf_dir)
    assert r["ok"], (name, sf_dir, r)


# ---------------------------------------------------------------------------
# streamed_hll_snapshot_report
# ---------------------------------------------------------------------------


def test_streamed_snapshot_equals_the_batch_sketch_kernel(spark):
    """The streamed snapshot's estimate leg must equal the ONE-SHOT batch
    sketch (operators/sketch.py::hll_distinct) on the same corpus —
    MAX-merge reassembly of per-batch registers IS the sketch algebra."""
    from retail_aws_etl_pipeline_spark.operators import sketch as SK
    from retail_aws_etl_pipeline_spark.session import load_tables

    events = load_tables(spark, SF_SMOKE, ["events"])["events"]
    batch = SK.hll_distinct(events, F.col("user_id")).collect()[0]
    streamed = {
        r["metric"]: r
        for r in E.streamed_hll_snapshot_report(spark, SF_SMOKE).collect()
    }["events.user_id"]
    assert streamed["hll_estimate"] == batch["hll_estimate"]
    assert streamed["v_zero_registers"] == batch["v_zero_registers"]
    assert streamed["rc_max_register"] == batch["rc_max_register"]


def test_streamed_snapshot_delta_rows_mirror(spark):
    """n_delta_rows == sum over waves (event_id parity) of the wave's
    distinct md5 buckets — the pin that the delta table really holds
    per-batch partials, mirrored in pure hashlib."""
    from retail_aws_etl_pipeline_spark.session import load_tables

    rows = (
        load_tables(spark, SF_SMOKE, ["events"])["events"]
        .select("event_id", "user_id")
        .filter(F.col("user_id").isNotNull())
        .collect()
    )
    waves = {0: set(), 1: set()}
    for r in rows:
        h = hashlib.md5(str(r["user_id"]).encode()).hexdigest()
        waves[r["event_id"] % 2].add(int(h[:2], 16))
    want = len(waves[0]) + len(waves[1])
    got = E.streamed_hll_snapshot_report(spark, SF_SMOKE).collect()[0]
    assert got["n_delta_rows"] == want


# ---------------------------------------------------------------------------
# quality_gate_agreement_report
# ---------------------------------------------------------------------------


def _kappa_mirror(n, both_keep, both_drop, g_only, c_only):
    """The exact integer formula, mirrored in Python int arithmetic
    (// truncates toward zero for the non-negative po/pe; the possibly-
    negative numerator uses explicit trunc to match both engines)."""
    po = (both_keep + both_drop) * 1_000_000 // n
    pe = (
        (both_keep + g_only) * (both_keep + c_only)
        + (both_drop + c_only) * (both_drop + g_only)
    ) * 1_000_000 // (n * n)
    num = (po - pe) * 1_000_000
    den = max(1_000_000 - pe, 1)
    q = abs(num) // den
    return q if num >= 0 else -q


def test_kappa_formula_mirrors_the_reported_counts(spark):
    """On the real corpus: recompute kappa/po/pe from the four counts the
    query itself reports, in pure Python ints — pins the arithmetic
    (single-floor divisions, trunc-toward-zero portability)."""
    rows = E.quality_gate_agreement_report(spark, SF_ORACLE).collect()
    assert rows, "expected at least one source group"
    for r in rows:
        n = r["n_docs"]
        assert (
            r["n_both_keep"] + r["n_both_drop"]
            + r["n_gopher_only"] + r["n_c4_only"]
        ) == n
        po = (r["n_both_keep"] + r["n_both_drop"]) * 1_000_000 // n
        assert r["po_ppm"] == po
        assert r["kappa_ppm"] == _kappa_mirror(
            n, r["n_both_keep"], r["n_both_drop"],
            r["n_gopher_only"], r["n_c4_only"],
        )


def test_kappa_boundary_semantics(spark):
    """Handcrafted corpora pin the kappa conventions:

    - a source where BOTH gates drop every doc sits in one census cell,
      so chance agreement pe = 1e6 and kappa reads 0 by the GREATEST
      guard (standard kappa is undefined at pe = 1; 0 = 'no evidence of
      agreement beyond chance' is the documented convention);
    - NULL source is excluded entirely."""
    stop = "the be to of and that have with"
    # fails gopher (too few words) AND fails c4 (no terminal sentences)
    bad = "short doc no punct"
    docs = spark.createDataFrame(
        [(0, bad, "en", "s1", len(bad))]
        + [(i, bad + f" v{i}", "en", "s1", 10) for i in range(1, 6)]
        + [(9, stop, "en", None, len(stop))],  # NULL source: excluded
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="kappa_bound_")
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    rows = E.quality_gate_agreement_report(spark, out).collect()
    assert [r["source"] for r in rows] == ["s1"]
    r = rows[0]
    assert r["n_docs"] == 6 and r["n_both_drop"] == 6
    assert r["po_ppm"] == 1_000_000 and r["pe_ppm"] == 1_000_000
    assert r["kappa_ppm"] == 0


def test_kappa_detects_perfect_and_inverse_agreement(spark):
    """A mixed source where the two gates agree on every doc (some kept
    by both, some dropped by both) reads kappa = 1e6 exactly; the
    formula goes NEGATIVE when the gates systematically disagree —
    exercised via the mirror on the inverse confusion matrix."""
    stop = "the be to of and that have with"
    # passes gopher: >= 50 words incl. >= 2 stopword kinds, sane ratios;
    # passes c4: >= 3 kept lines (>= 5 words each, terminal punct).
    line = f"{stop} quick brown foxes jump over lazy dogs today."
    good = "\n".join([line] * 6)  # 54 words, 6 sentences
    bad = "short no punct"
    rows = [(i, good, "en", "s", len(good)) for i in range(4)]
    rows += [(10 + i, bad, "en", "s", len(bad)) for i in range(3)]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    import os
    import tempfile

    out = tempfile.mkdtemp(prefix="kappa_agree_")
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    r = E.quality_gate_agreement_report(spark, out).collect()[0]
    assert (r["n_both_keep"], r["n_both_drop"]) == (4, 3)
    assert (r["n_gopher_only"], r["n_c4_only"]) == (0, 0)
    assert r["kappa_ppm"] == 1_000_000
    # inverse matrix: same marginals, zero diagonal -> kappa < 0
    assert _kappa_mirror(7, 0, 0, 4, 3) < 0


# ---------------------------------------------------------------------------
# zipf_fit_report
# ---------------------------------------------------------------------------


def _write_docs(spark, tmp_path, texts):
    import os

    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def test_zipf_buckets_handcrafted(spark, tmp_path):
    """Known census: a×8 b×4 c×2 d×1 e×1 → ranks 1..5, octaves
    {0: rank 1}, {1: ranks 2-3}, {2: ranks 4-5}; masses floor-exact."""
    out = _write_docs(
        spark, tmp_path, ["a a a a a a a a b b", "b b c c d", "e"]
    )
    rows = {r["bucket"]: r for r in E.zipf_fit_report(spark, out).collect()}
    total = 16
    assert rows[0]["first_rank"] == 1 and rows[0]["n_types"] == 1
    assert rows[0]["occ"] == 8 and rows[0]["top_freq"] == 8
    assert rows[0]["llq_top"] == 3  # floor(log2(8))
    assert rows[0]["mass_ppm"] == 8 * 1_000_000 // total
    assert rows[1]["first_rank"] == 2 and rows[1]["n_types"] == 2
    assert rows[1]["occ"] == 4 + 2 and rows[1]["top_freq"] == 4
    assert rows[2]["first_rank"] == 4 and rows[2]["n_types"] == 2
    assert rows[2]["occ"] == 2 and rows[2]["top_freq"] == 1
    assert rows[2]["llq_top"] == 0
    assert set(rows) == {0, 1, 2}


def test_zipf_report_conservation(spark):
    """On the real corpus: bucket masses and type counts reassemble the
    full census (sum occ = total occurrences → sum mass_ppm within
    len(buckets) floor-losses of 1e6; n_types sums to the vocab)."""
    from retail_aws_etl_pipeline_spark.session import load_tables

    rows = E.zipf_fit_report(spark, SF_SMOKE).collect()
    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    census = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.count(F.lit(1)).alias("types"), F.sum("n").alias("occ"))
        .collect()[0]
    )
    assert sum(r["n_types"] for r in rows) == census["types"]
    assert sum(r["occ"] for r in rows) == census["occ"]
    mass = sum(r["mass_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= mass <= 1_000_000
    # buckets are consecutive octaves from 0 and ranks nest:
    # bucket b holds at most 2^b types
    for r in rows:
        assert r["n_types"] <= r["first_rank"]


# ---------------------------------------------------------------------------
# vocab_coverage_report
# ---------------------------------------------------------------------------


def test_vocab_coverage_handcrafted(spark, tmp_path):
    """Known census (a×8 b×4 c×2 d×1 e×1): top-16 covers everything,
    and a python mirror pins each K row."""
    out = _write_docs(
        spark, tmp_path, ["a a a a a a a a b b", "b b c c d", "e"]
    )
    freqs = sorted([8, 4, 2, 1, 1], reverse=True)
    total = sum(freqs)
    rows = {r["vocab_k"]: r for r in E.vocab_coverage_report(spark, out).collect()}
    assert set(rows) == set(E.VOCAB_COVERAGE_KS)
    for k in E.VOCAB_COVERAGE_KS:
        covered = sum(freqs[:k])
        assert rows[k]["covered_occ"] == covered
        assert rows[k]["n_types_used"] == min(k, len(freqs))
        assert rows[k]["coverage_ppm"] == covered * 1_000_000 // total
        assert rows[k]["oov_ppm"] == (total - covered) * 1_000_000 // total


def test_vocab_coverage_monotone_and_saturating(spark):
    """On the real corpus: coverage is nondecreasing in K, oov
    complementary within one floor loss, and K ≥ vocab saturates at
    full coverage."""
    rows = sorted(
        E.vocab_coverage_report(spark, SF_SMOKE).collect(),
        key=lambda r: r["vocab_k"],
    )
    last = -1
    for r in rows:
        assert r["covered_occ"] >= last
        last = r["covered_occ"]
        assert 1_000_000 - 1 <= r["coverage_ppm"] + r["oov_ppm"] <= 1_000_000
    if rows[-1]["n_types_used"] < rows[-1]["vocab_k"]:
        assert rows[-1]["coverage_ppm"] == 1_000_000
        assert rows[-1]["oov_ppm"] == 0


# ---------------------------------------------------------------------------
# plan gates
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_agreement_report_single_scan_no_join(spark):
    """Both gate batteries are scan-side projections chained into ONE
    pass — the plan must show exactly one documents FileScan and no join
    of any kind (an oracle-shaped double scan + doc_id join would read
    the 100 TB corpus twice)."""
    plan = _plan(E.quality_gate_agreement_report(spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1, plan[:2000]
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct"):
        assert bad not in plan, bad


def test_rank_spectrum_plans_no_global_window(spark):
    """The Zipf/coverage rank comes from the factored _distributed_rank,
    which is window-free since r16 (local sort + monotonically_increasing_id
    record numbers over the range partitions): the plan must show NO
    Window at all — a fortiori no global window — and no full-frame
    __pid-keyed sort (the shape the removed re-exchange fed); scans
    prune to the text column."""
    import re

    for fn in (E.zipf_fit_report, E.vocab_coverage_report):
        plan = _plan(fn(spark, SF_SMOKE))
        assert not re.search(r"\bWindow \[", plan), (
            f"{fn.__name__}: rank path regrew a Window"
        )
        assert "monotonically_increasing_id" in plan, fn.__name__
        assert not re.search(r"Sort \[__pid", plan), fn.__name__
        assert "CartesianProduct" not in plan
        read_schema = next(
            ln for ln in plan.splitlines() if "ReadSchema" in ln
        )
        assert "text" in read_schema
        assert "lang" not in read_schema and "doc_id" not in read_schema
