"""Gopher repetition battery + duplicated-span extraction (staged r11).

The staged-operator proof set: DuckDB oracle compare at sf0.01,
handcrafted semantics documents, a Python-mirror hypothesis fuzz for the
shared interval-union kernel, and executed-plan gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import dedup as D
from retail_aws_etl_pipeline_spark.operators import textops as TX
from tests.conftest import SF_ORACLE
from tests.oracle import compare


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Oracle compares (the driver's proof, run locally while staged)
# ---------------------------------------------------------------------------


def test_gopher_repetition_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        GOPHER_REPETITION_ORACLE,
        gopher_repetition_report,
    )

    got = gopher_repetition_report(spark, SF_ORACLE)
    res = compare(got, GOPHER_REPETITION_ORACLE, SF_ORACLE)
    assert res["ok"], res


def test_duplicated_span_report_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        DUP_SPAN_ORACLE,
        duplicated_span_report,
    )

    got = duplicated_span_report(spark, SF_ORACLE)
    res = compare(got, DUP_SPAN_ORACLE, SF_ORACLE)
    assert res["ok"], res


# ---------------------------------------------------------------------------
# Handcrafted repetition semantics
# ---------------------------------------------------------------------------


def test_repetition_handcrafted_rules(spark):
    """One purpose-built document per rule family."""
    uniq = " ".join(f"w{i}x{i * 3 % 11}" for i in range(40))
    docs = [
        # 0: clean — nothing repeats
        (0, uniq),
        # 1: 4 identical lines of 10 (3 extra / 10 lines = 30% boundary:
        # kept at the paper boundary) — plus enough unique lines
        (1, "\n".join(["dup line"] * 4 + [f"u{i} line{i}" for i in range(6)])),
        # 2: 5 identical lines of 10 -> 4 extra / 10 = 40% > 30%: fails
        (2, "\n".join(["dup line"] * 5 + [f"u{i} line{i}" for i in range(5)])),
        # 3: one dominant 2-gram: "a b" * 20 -> top2 chars = 20*3=60 of
        # length 79 -> 76% > 20%: fails top2_ok
        (3, " ".join(["a", "b"] * 20)),
        # 4: duplicated paragraphs
        (4, "\n\n".join(["para one here"] * 3 + [f"p{i} unique" for i in range(2)])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x.doc_id: x for x in TX.gopher_repetition_flags(df).collect()}
    assert r[0].repetition_pass
    assert r[0].dup_line_extra == 0 and r[0].top2_chars == 0
    assert r[1].dup_line_extra == 3 and r[1].dup_line_ok  # exactly 30%: kept
    assert r[2].dup_line_extra == 4 and not r[2].dup_line_ok
    assert r[3].top2_chars > 0 and not r[3].top2_ok
    assert r[4].dup_para_extra == 2 and not r[4].dup_para_char_ok


def test_repetition_dup_ngram_chars_counted_once(spark):
    """Overlapping duplicated n-grams must not double-count characters:
    'a b c d e f a b c d e f' — every 5-gram of the first half repeats
    in the second; coverage is the union, i.e. the whole text (the two
    halves' spans overlap at the middle), so dup5_chars == n_chars."""
    text = " ".join(["a", "b", "c", "d", "e", "f"] * 2)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = TX.gopher_repetition_flags(df).collect()[0]
    # 12 tokens, 8 5-windows; windows 1..3 == windows 7..9 BUT windows
    # 4..6 ('d e f a b', 'e f a b c', 'f a b c d') are unique — the
    # union of duplicated 5-gram spans is [1,7] and [7,11]+... compute
    # independently:
    toks = text.split(" ")
    n = 5
    from collections import Counter

    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    cnt = Counter(grams)
    ivs = sorted(
        (i + 1, i + n) for i, g in enumerate(grams) if cnt[g] >= 2
    )
    merged = []
    for a, b in ivs:
        if merged and a <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    want = sum(
        len(" ".join(toks[a - 1 : b])) for a, b in merged
    )
    assert r.dup5_chars == want and want > 0


def test_repetition_plan_shape(spark):
    """One explode pass; no raw-row Windows; no Python eval."""
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    plan = _plan(TX.gopher_repetition_flags(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert " Window " not in plan


# ---------------------------------------------------------------------------
# Duplicated spans: semantics + mirror fuzz
# ---------------------------------------------------------------------------


def test_dup_spans_cross_doc_and_alignment(spark):
    """A shared passage is found at ANY alignment (the stride-1 claim the
    chunk-dedup family cannot make), and unique docs report zeros."""
    w = D.EXSUB_WINDOW
    passage = " ".join(f"p{i}q{i * 5 % 13}" for i in range(w + 4))
    uniq_a = " ".join(f"a{i}" for i in range(6))
    uniq_b = " ".join(f"b{i}" for i in range(9))
    docs = [
        (0, f"{uniq_a} {passage}"),
        (1, f"{uniq_b} {passage} tail0 tail1"),  # different offset
        (2, " ".join(f"c{i}d{i * 7 % 17}" for i in range(40))),  # unique
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x.doc_id: x for x in D.duplicated_span_stats(df).collect()}
    assert r[2].n_dup_spans == 0 and r[2].dup_tokens == 0
    for d in (0, 1):
        assert r[d].n_dup_spans == 1
        # the maximal span covers exactly the passage (w+4 tokens)
        assert r[d].dup_tokens == w + 4
        assert r[d].longest_span_tokens == w + 4
        assert r[d].dup_chars == len(passage)


def test_dup_spans_within_doc_repeat(spark):
    """A within-doc repeat (second occurrence in the SAME doc) also
    counts — Lee et al. dedup against the whole corpus including self."""
    w = D.EXSUB_WINDOW
    passage = " ".join(f"s{i}" for i in range(w))
    mid = " ".join(f"m{i}n{i}" for i in range(5))
    df = spark.createDataFrame(
        [(0, f"{passage} {mid} {passage}")], "doc_id long, text string"
    )
    r = D.duplicated_span_stats(df).collect()[0]
    assert r.n_dup_spans == 2
    assert r.dup_tokens == 2 * w


def test_dup_spans_python_mirror_fuzz(spark):
    """Window marking + interval union vs a literal Python mirror over
    small random corpora with engineered repeats."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    w = D.EXSUB_WINDOW
    token = st.sampled_from([f"t{i}" for i in range(6)])
    doc = st.lists(token, min_size=0, max_size=3 * w).map(" ".join)

    def mirror(texts):
        from collections import Counter

        wins = Counter()
        per_doc = []
        for t in texts:
            toks = [x for x in t.split(" ")] if t else [""]
            grams = [
                " ".join(toks[i : i + w]) for i in range(max(len(toks) - w + 1, 0))
            ]
            per_doc.append((toks, grams))
            wins.update(grams)
        out = []
        for toks, grams in per_doc:
            ivs = sorted(
                (i + 1, i + w) for i, g in enumerate(grams) if wins[g] >= 2
            )
            merged = []
            for a, b in ivs:
                if merged and a <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], b)
                else:
                    merged.append([a, b])
            out.append(
                {
                    "n_windows": len(grams),
                    "n_dup_windows": len(ivs),
                    "n_dup_spans": len(merged),
                    "dup_tokens": sum(b - a + 1 for a, b in merged),
                    "dup_chars": sum(
                        len(" ".join(toks[a - 1 : b])) for a, b in merged
                    ),
                    "longest_span_tokens": max(
                        (b - a + 1 for a, b in merged), default=0
                    ),
                }
            )
        return out

    @settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=st.lists(doc, min_size=1, max_size=4))
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.doc_id: r for r in D.duplicated_span_stats(df).collect()
        }
        want = mirror(texts)
        for i in range(len(texts)):
            for k, v in want[i].items():
                assert got[i][k] == v, (k, texts[i], v, got[i][k])

    check()


def test_dup_spans_plan_shape(spark):
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    plan = _plan(D.duplicated_span_stats(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert " Window " not in plan
    assert "CartesianProduct" not in plan


def test_merge_token_intervals_fold(spark):
    """The shared kernel: overlap merges, token-adjacency does NOT."""
    rows = [
        ([(1, 3), (2, 5), (7, 9)], [(1, 5), (7, 9)]),  # overlap + separate
        ([(1, 3), (4, 6)], [(1, 3), (4, 6)]),  # adjacent stays split
        ([(1, 10), (2, 3), (4, 12)], [(1, 12)]),  # containment + chain
        ([], []),
    ]
    df = spark.createDataFrame(
        [(i, [{"a": a, "b": b} for a, b in ivs]) for i, (ivs, _) in enumerate(rows)],
        "id long, ivs array<struct<a:int,b:int>>",
    )
    got = {
        r.id: [(x.a, x.b) for x in r.m]
        for r in df.select(
            "id", F.expr(D.merge_token_intervals("ivs")).alias("m")
        ).collect()
    }
    for i, (_, want) in enumerate(rows):
        assert got[i] == want, (i, got[i], want)


def test_repetition_hash_ngrams_output_identical(spark):
    """The hash_ngrams exchange knob changes bytes, not results — pinned
    on the real corpus (the jaccard_counts hash_grams discipline)."""
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    a = sorted(map(tuple, TX.gopher_repetition_flags(docs).collect()))
    b = sorted(
        map(tuple, TX.gopher_repetition_flags(docs, hash_ngrams=True).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# C4 cleanup battery (staged r11)
# ---------------------------------------------------------------------------


def test_c4_clean_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        C4_CLEAN_ORACLE,
        c4_clean_report,
    )

    got = c4_clean_report(spark, SF_ORACLE)
    res = compare(got, C4_CLEAN_ORACLE, SF_ORACLE)
    assert res["ok"], res


def test_c4_handcrafted_rules(spark):
    good = "this line has enough words in it."
    docs = [
        (0, "\n".join([good, "another full sentence right here!", good])),
        (1, "\n".join([good, "no terminal punct here at all", good])),  # line drop
        (2, "\n".join([good, "short one.", good])),  # < 5 words drop
        (3, "\n".join([good, "enable javascript to view this.", good])),  # js drop
        (4, "\n".join([good, "Lorem Ipsum dolor sit amet.", good])),  # page gate
        (5, "function f() { return 1; }\n" + good),  # brace gate
        (6, 'he said "stop right there now!" and left.'),  # 1 sentence-ish
        (7, "\n".join([good] * 2) + "\nends with quote after punct.\""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from retail_aws_etl_pipeline_spark.operators.textops import c4_clean_flags

    r = {x.doc_id: x for x in c4_clean_flags(df).collect()}
    assert r[0].page_kept and r[0].n_kept_lines == 3
    assert r[1].n_kept_lines == 2 and r[1].clean_text == "\n".join([good, good])
    assert r[2].n_kept_lines == 2
    assert r[3].n_kept_lines == 2
    assert r[4].has_lorem and not r[4].page_kept
    assert r[5].has_brace and not r[5].page_kept
    # doc 6: kept line has '!' inside quotes + terminal '.' => 2 markers < 3
    assert r[6].n_kept_lines == 1 and r[6].n_sentences == 2 and not r[6].page_kept
    # doc 7: closing-quote-after-punct line is kept
    assert r[7].n_kept_lines == 3 and r[7].page_kept


def test_c4_plan_is_scan_side(spark):
    from retail_aws_etl_pipeline_spark.operators.textops import c4_clean_flags
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    plan = _plan(c4_clean_flags(docs).select("doc_id", "page_kept", "clean_text"))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
