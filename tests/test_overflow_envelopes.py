"""Executable int64 ppm-overflow envelopes (VERDICT r11 item #8).

SCALING.md's watchlist documents, for every ``x * 1_000_000 div y``
reporting site, the first operand magnitude that overflows the int64
pre-division multiply (the gini failure class). These tests turn the
envelope MATH for the two kernels VERDICT named — the Kneser-Ney
continuation layer and the unigram score quantization — into assertions,
so a corpus-knob change that invalidates a "never overflows by
construction" claim fails the suite instead of silently wrapping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import textops as TX
from retail_aws_etl_pipeline_spark.session import load_tables
from tests.conftest import SF_ORACLE

INT64_MAX = (1 << 63) - 1


def test_kn_ppm_columns_bounded_by_scale_on_real_corpus(spark):
    """The two product sites in kn_bigram_table (lambda*pcont,
    p1+lambda*pcont) are safe BECAUSE every ppm factor is <= KN_SCALE:
    d_ppm (N1 <= N1+2N2), p1_ppm ((c*S - d) div c_prefix <= S since
    c <= c_prefix), lambda_ppm (n_followers <= c_prefix), pcont_ppm
    (n_left <= n_bigram_types). Pin the invariant on the real corpus —
    if a refactor breaks any ratio's <=1 property, the product envelope
    claim in SCALING.md is void and this fails first."""
    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    tbl = TX.kn_bigram_table(docs)
    bad = tbl.filter(
        (F.col("d_ppm") < 0)
        | (F.col("d_ppm") > TX.KN_SCALE)
        | (F.col("p1_ppm") < 0)
        | (F.col("p1_ppm") > TX.KN_SCALE)
        | (F.col("lambda_ppm") < 0)
        | (F.col("lambda_ppm") > TX.KN_SCALE)
        | (F.col("pcont_ppm") < 0)
        | (F.col("pcont_ppm") > TX.KN_SCALE)
    ).count()
    assert bad == 0


def test_kn_continuation_first_overflow_operands():
    """The continuation layer's single-multiply sites and their
    documented first-overflow operands (SCALING.md watchlist): the
    envelope math as executable arithmetic. If KN_SCALE is ever raised,
    these bounds shrink proportionally and the assertions recompute."""
    s = TX.KN_SCALE
    # pcont_ppm = n_left * KN_SCALE div n_bigram_types: n_left is a
    # DISTINCT-predecessor count (<= vocab size). Safe through:
    bound = INT64_MAX // s  # ~9.2e12 distinct predecessors
    assert bound * s <= INT64_MAX < (bound + 1) * s
    assert bound > 10**12, "continuation envelope shrank below 1e12 — restage"
    # d_ppm = n1 * KN_SCALE div (n1 + 2*n2): n1 counts bigram TYPES.
    assert bound > 10**11, "count-of-counts envelope below web-scale types"
    # the product sites never multiply two corpus-scale operands:
    assert s * s <= INT64_MAX // 10**6, "lambda*pcont product lost headroom"


def test_unigram_dp_envelope_on_real_fit():
    """The Viterbi dp fold's worst accumulation is
    |2 * _UNI_BIG_NEG| + word_len * max|score|. Fit on the real corpus
    (bounded-vocab python mirror — identical quantizer) and assert the
    envelope holds even for absurd word lengths, pinning SCALING.md's
    'never overflows' row; a quantizer change that inflates scores
    breaks this first."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT w, COUNT(*) FROM (
            SELECT unnest(string_split(text, ' ')) AS w
            FROM read_parquet('{SF_ORACLE}/documents.parquet')
        ) WHERE len(w) >= 1 GROUP BY w
        """
    ).fetchall()
    con.close()
    _, scores, _ = TX.unigram_python_mirror({w: int(f) for w, f in rows})
    max_abs = max(abs(v) for sc in scores for v in sc.values())
    # scores are quantized log-probs: bounded by log(1/total_mass)*scale.
    assert max_abs < (1 << 40), max_abs  # far under the sentinel itself
    absurd_word_len = 10**6  # no real tokenizer input approaches this
    worst = 2 * abs(TX._UNI_BIG_NEG) + absurd_word_len * max_abs
    assert worst < INT64_MAX, (max_abs, worst)
