"""Proof battery for the STAGED r18 seeds built at r15:
streamed_cms_topk_report (the count-min twin of the streamed-HLL
registry entry) and token_drift_psi_report (quantized-PSI drift
monitor). Same discipline as every staged predecessor: DuckDB oracle
compares at two gate scales, the stream==batch verbatim-twin pin,
handcrafted drift semantics, a pure-Python mirror for the quantized
PSI arithmetic, and plan gates."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.plans import extensions as E
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare

PAIRS = [
    (
        "streamed_cms_topk_report",
        E.streamed_cms_topk_report,
        E.STREAMED_CMS_TOPK_ORACLE,
    ),
    ("token_drift_psi_report", E.token_drift_psi_report, E.TOKEN_PSI_ORACLE),
]


@pytest.mark.parametrize("name,fn,oracle", PAIRS, ids=[p[0] for p in PAIRS])
@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_seed_pair_matches_oracle(spark, name, fn, oracle, sf_dir):
    r = compare(fn(spark, sf_dir), oracle, sf_dir)
    assert r["ok"], (name, sf_dir, r)


def test_streamed_cms_is_the_verbatim_batch_twin(spark):
    """The streamed entry shares countmin_topk_report's oracle string
    VERBATIM (the streamed_hourly_rollup precedent), and the two
    queries' frames are row-identical — SUM-fold reassembly of
    per-batch cells IS the batch sketch."""
    assert E.STREAMED_CMS_TOPK_ORACLE is E.COUNTMIN_TOPK_ORACLE
    a = [tuple(r) for r in E.countmin_topk_report(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in E.streamed_cms_topk_report(spark, SF_SMOKE).collect()]
    assert a == b and a


def _bit_llq(x: int) -> int:
    """floor(log2(x^2)) for integer x >= 1 — exact via bit_length, the
    mirror of the generated threshold ladder."""
    return (x * x).bit_length() - 1


def test_psi_python_mirror(spark):
    """Recompute every PSI column from raw parquet in pure Python
    (hashlib buckets, integer shares, bit_length logs) at the smoke
    scale — the ladder, the floors, and the contribution product."""
    import pyarrow.parquet as pq

    from retail_aws_etl_pipeline_spark.operators.sampling import DSIR_BUCKETS

    tbl = pq.read_table(
        os.path.join(SF_SMOKE, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    counts: dict[int, list[int]] = {}
    for row in tbl:
        if row["text"] is None:
            continue
        half = row["doc_id"] % 2
        for tok in row["text"].split(" "):
            if tok == "":
                continue
            b = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16) % DSIR_BUCKETS
            counts.setdefault(b, [0, 0])[half] += 1
    t_a = sum(v[0] for v in counts.values())
    t_b = sum(v[1] for v in counts.values())
    want = {}
    for b, (n_a, n_b) in counts.items():
        p = n_a * 1_000_000 // max(t_a, 1)
        q = n_b * 1_000_000 // max(t_b, 1)
        la, lb = _bit_llq(max(p, 1)), _bit_llq(max(q, 1))
        want[b] = (n_a, n_b, p, q, la, lb, (p - q) * (la - lb))
    got = {
        r["bucket"]: (
            r["n_a"], r["n_b"], r["p_ppm"], r["q_ppm"],
            r["llq_a"], r["llq_b"], r["psi_contrib"],
        )
        for r in E.token_drift_psi_report(spark, SF_SMOKE).collect()
    }
    assert got == want and got


def test_psi_zero_on_identical_halves(spark, tmp_path):
    """A corpus whose parity halves are token-identical reads zero drift
    in every bucket — and every contribution is structurally >= 0 (the
    ladder is monotone, so (p-q) and (llq_p-llq_q) share sign)."""
    body = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(i, body, "en", "s", len(body)) for i in range(8)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    rows = E.token_drift_psi_report(spark, out).collect()
    assert rows
    for r in rows:
        assert r["psi_contrib"] == 0
        assert r["p_ppm"] == r["q_ppm"]


def test_psi_detects_a_planted_shift(spark, tmp_path):
    """Half A speaks one vocabulary, half B another: the drift score is
    strictly positive and every bucket's contribution non-negative."""
    rows = []
    for i in range(0, 20, 2):
        rows.append((i, "aardvark " * 10, "en", "s", 90))
        rows.append((i + 1, "zyzzyva " * 10, "en", "s", 80))
    docs = spark.createDataFrame(
        [(i, t.strip(), lg, so, n) for i, t, lg, so, n in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    got = E.token_drift_psi_report(spark, out).collect()
    assert all(r["psi_contrib"] >= 0 for r in got)
    assert sum(r["psi_contrib"] for r in got) > 0


def test_psi_plan_single_scan_bounded_output(spark):
    """One exploded scan + one bucket groupBy + a single-row broadcast:
    no sort-merge join, no window, and the report is <= DSIR_BUCKETS
    rows by construction."""
    from retail_aws_etl_pipeline_spark.operators.sampling import DSIR_BUCKETS

    df = E.token_drift_psi_report(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" not in plan and "CartesianProduct" not in plan
    assert df.count() <= DSIR_BUCKETS
