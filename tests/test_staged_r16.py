"""Proof battery for the STAGED r16 tranche (ROADMAP "r16 schedule"):
badwords_filter_report, ngram_diversity_report, template_affix_report,
corpus_snapshot_delta, langid_confusion_report (hll_overlap_report, the
sixth r16 swap, carries its battery in test_staged_r15.py). Same
discipline as every staged predecessor: DuckDB oracle compares at two
gate scales, handcrafted semantics tests per operator, and plan gates.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import textops as TX
from retail_aws_etl_pipeline_spark.plans import extensions as E
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle import compare

PAIRS = [
    ("badwords_filter_report", E.badwords_filter_report, E.BADWORDS_FILTER_ORACLE),
    ("ngram_diversity_report", E.ngram_diversity_report, E.NGRAM_DIVERSITY_ORACLE),
    ("template_affix_report", E.template_affix_report, E.TEMPLATE_AFFIX_ORACLE),
    ("corpus_snapshot_delta", E.corpus_snapshot_delta, E.CORPUS_DELTA_ORACLE),
    (
        "langid_confusion_report",
        E.langid_confusion_report,
        E.LANGID_CONFUSION_ORACLE,
    ),
]


@pytest.mark.parametrize("name,fn,oracle", PAIRS, ids=[p[0] for p in PAIRS])
@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE])
def test_staged_r16_matches_oracle(spark, sf, name, fn, oracle):
    r = compare(fn(spark, sf), oracle, sf)
    assert r["ok"], (name, sf, r)


def _docs(spark, rows):
    """(doc_id, text, lang, source) frame for handcrafted corpora."""
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _write_docs(tmp_path, spark, rows):
    """Handcrafted corpus written as a single parquet FILE (the driver's
    testdata shape — DuckDB reads the same path)."""
    out = str(tmp_path)
    _docs(spark, rows).toPandas().to_parquet(
        os.path.join(out, "documents.parquet"), index=False
    )
    return out


# --- badwords_filter_report -------------------------------------------------


def test_badwords_census_handcrafted(tmp_path, spark):
    """Planted blocklist hits: case-insensitive token membership, NULL
    lang excluded, occurrence vs doc counting distinguished, top word
    ties broken lexicographically, clean languages report zero with a
    NULL top word."""
    rows = [
        (1, "CASINO night casino day", "en", "web"),  # 2 hits, one doc
        (2, "pills and Pills and lottery", "en", "web"),  # 3 hits
        (3, "a perfectly clean document", "en", "web"),
        (4, "viagra", "de", "web"),
        (5, "casino lottery", None, "web"),  # NULL lang: excluded
        (6, "nothing here", "fr", "web"),
    ]
    out = _write_docs(tmp_path, spark, rows)
    got = {r["lang"]: r for r in E.badwords_filter_report(spark, out).collect()}
    assert set(got) == {"en", "de", "fr"}
    en = got["en"]
    assert (en["n_docs"], en["n_blocked_docs"], en["n_blocked_tokens"]) == (3, 2, 5)
    assert en["block_rate_ppm"] == 2 * 1_000_000 // 3
    # casino(2) vs pills(2) vs lottery(1): tie on 2 -> lex smallest
    assert en["top_badword"] == "casino"
    assert got["de"]["top_badword"] == "viagra"
    fr = got["fr"]
    assert (fr["n_blocked_docs"], fr["top_badword"]) == (0, None)
    r = compare(
        E.badwords_filter_report(spark, out), E.BADWORDS_FILTER_ORACLE, out
    )
    assert r["ok"], r


def test_badwords_blocklist_rides_as_literals(spark):
    """The blocklist is plan literals — no join, no Python eval, no
    Window anywhere in the census."""
    plan = (
        E.badwords_filter_report(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "Python" not in plan, plan[:2000]


# --- ngram_diversity_report --------------------------------------------------


def test_ngram_diversity_handcrafted(tmp_path, spark):
    """Hand-counted totals/distincts/hapax on a corpus with one repeated
    bigram across docs, NULL source excluded, and short docs simply
    contributing no higher-order grams."""
    rows = [
        (1, "a b c", "web", "web"),
        (2, "a b d", "web", "web"),
        (3, "x", "web", "web"),  # no bigrams/trigrams
        (4, "z z", None, None),  # NULL source: excluded
    ]
    rows = [(i, t, "en", s) for (i, t, _l, s) in rows]
    out = _write_docs(tmp_path, spark, rows)
    got = {
        (r["n"]): r
        for r in E.ngram_diversity_report(spark, out)
        .filter("source = 'web'")
        .collect()
    }
    # unigrams: a b c a b d x -> total 7, distinct 5 (a,b,c,d,x), hapax 3
    assert (got[1]["n_total"], got[1]["n_distinct"], got[1]["n_singletons"]) == (
        7,
        5,
        3,
    )
    # bigrams: "a b","b c","a b","b d" -> total 4, distinct 3, hapax 2
    assert (got[2]["n_total"], got[2]["n_distinct"], got[2]["n_singletons"]) == (
        4,
        3,
        2,
    )
    assert got[2]["diversity_ppm"] == 3 * 1_000_000 // 4
    assert got[2]["hapax_ppm"] == 2 * 1_000_000 // 3
    # trigrams: "a b c","a b d" -> all unique
    assert (got[3]["n_total"], got[3]["n_distinct"], got[3]["n_singletons"]) == (
        2,
        2,
        2,
    )
    r = compare(
        E.ngram_diversity_report(spark, out), E.NGRAM_DIVERSITY_ORACLE, out
    )
    assert r["ok"], r


def test_ngram_diversity_is_one_explode(spark):
    """All three sizes ride ONE generator/explode over one scan (the
    repetition-battery discipline) — exactly one Generate node, no
    Window, no Python eval."""
    plan = (
        E.ngram_diversity_report(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Generate") == 1, plan[:2000]
    assert "Window" not in plan and "Python" not in plan, plan[:2000]


# --- template_affix_report ---------------------------------------------------


def test_template_affix_handcrafted(tmp_path, spark):
    """A planted head-template family of 3 and tail family of 2; docs
    shorter than the affix width are excluded; a kind with no family
    still reports its base row with zeros and a NULL affix."""
    head = "From the desk of the news team :"  # 8 tokens
    tail = "unsubscribe here to stop receiving mail from us"  # 8 tokens
    rows = [
        (1, head + " story one body ends alpha", "en", "web"),
        (2, head + " story two body ends beta", "en", "web"),
        (3, head + " story three body ends gamma", "en", "web"),
        (4, "alpha beta " + tail, "en", "web"),
        (5, "gamma delta epsilon " + tail, "en", "web"),
        (6, "short doc", "en", "web"),  # < 8 tokens: ineligible
    ]
    out = _write_docs(tmp_path, spark, rows)
    got = {r["kind"]: r for r in E.template_affix_report(spark, out).collect()}
    assert set(got) == {"head", "tail"}
    assert got["head"]["n_eligible_docs"] == 5
    assert got["head"]["n_families"] == 1
    assert got["head"]["n_docs_in_families"] == 3
    assert got["head"]["top_family_docs"] == 3
    assert got["head"]["top_family_affix"] == head
    assert got["tail"]["n_families"] == 1
    assert got["tail"]["top_family_docs"] == 2
    assert got["tail"]["top_family_affix"] == tail
    r = compare(
        E.template_affix_report(spark, out), E.TEMPLATE_AFFIX_ORACLE, out
    )
    assert r["ok"], r


def test_template_affix_zero_family_rows(tmp_path, spark):
    """All-unique affixes: both kind rows present with zero families and
    NULL top affix — the LEFT JOIN base-row contract."""
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(10)), "en", "web")
        for i in range(4)
    ]
    out = _write_docs(tmp_path, spark, rows)
    got = {r["kind"]: r for r in E.template_affix_report(spark, out).collect()}
    for kind in ("head", "tail"):
        assert got[kind]["n_eligible_docs"] == 4
        assert got[kind]["n_families"] == 0
        assert got[kind]["top_family_affix"] is None
    r = compare(
        E.template_affix_report(spark, out), E.TEMPLATE_AFFIX_ORACLE, out
    )
    assert r["ok"], r


def test_template_affix_plan_gate(spark):
    """One (kind, affix) exchange; the eligible-count rides broadcast;
    no Window, no Python eval."""
    plan = (
        E.template_affix_report(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan and "Python" not in plan, plan[:2000]


# --- corpus_snapshot_delta ---------------------------------------------------


def test_snapshot_delta_statuses_by_construction(spark):
    """The deterministic slices make every status computable by hand
    from doc_id arithmetic alone: %4==0 -> added (only B), %4==1 ->
    removed (only A), %8==2 -> changed, the rest unchanged."""
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for i in ids:
        if i % 4 == 0:
            want["added"] += 1
        elif i % 4 == 1:
            want["removed"] += 1
        elif i % 8 == 2:
            want["changed"] += 1
        else:
            want["unchanged"] += 1
    got = {
        r["status"]: r["n_docs"]
        for r in E.corpus_snapshot_delta(spark, SF_ORACLE).collect()
    }
    assert got == {k: v for k, v in want.items() if v > 0}


def test_snapshot_delta_plan_gate(spark):
    """One id-keyed join + one rollup: no Window, no Python eval, and
    the join is NOT broadcast (both snapshot sides are corpus-scale —
    a broadcast here would OOM at 100 TB)."""
    plan = (
        E.corpus_snapshot_delta(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "Python" not in plan, plan[:2000]
    assert "BroadcastHashJoin" not in plan, plan[:2000]


# --- langid_confusion_report --------------------------------------------------


def test_langid_confusion_handcrafted(tmp_path, spark):
    """Planted labeled docs: marker-heavy text lands on the diagonal, a
    mislabeled doc shows up off-diagonal, share ppm sums to ~1e6 per
    truth row, NULL lang excluded."""
    rows = [
        (1, "the cat and the dog is a pet", "en", "web"),
        (2, "the quick brown fox is in a bag", "en", "web"),
        (3, "der hund und die katze ist nicht", "de", "web"),
        (4, "the the the and of", "de", "web"),  # mislabeled: predicts en
        (5, "le chat et la maison est les", "fr", "web"),
        (6, "anything at all", None, "web"),  # unlabeled: excluded
    ]
    out = _write_docs(tmp_path, spark, rows)
    got = {
        (r["lang"], r["lang_pred"]): r
        for r in E.langid_confusion_report(spark, out).collect()
    }
    assert got[("en", "en")]["n_docs"] == 2
    assert got[("de", "de")]["n_docs"] == 1
    assert got[("de", "en")]["n_docs"] == 1  # the off-diagonal mass
    assert got[("fr", "fr")]["n_docs"] == 1
    assert got[("de", "de")]["share_ppm"] == 1_000_000 // 2
    assert not any(k[0] is None for k in got)
    r = compare(
        E.langid_confusion_report(spark, out), E.LANGID_CONFUSION_ORACLE, out
    )
    assert r["ok"], r


def test_langid_confusion_shares_the_registered_kernel(spark):
    """The census's diagonal equals doc_lang_id's (lang == lang_pred)
    rollup — the confusion report IS the registered predictor's QA view,
    not a second predictor that could drift."""
    from retail_aws_etl_pipeline_spark.plans import all_specs

    pred = all_specs()["doc_lang_id"].spark_fn(spark, SF_ORACLE)
    want = {
        (r["lang"], r["lang_pred"]): r["n"]
        for r in pred.filter(F.col("lang").isNotNull())
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        (r["lang"], r["lang_pred"]): r["n_docs"]
        for r in E.langid_confusion_report(spark, SF_ORACLE).collect()
    }
    assert got == want and got


def test_langid_confusion_plan_gate(spark):
    """Scan-side scoring + one pair exchange + broadcast totals join —
    no Window, no Python eval."""
    plan = (
        E.langid_confusion_report(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "Window" not in plan and "Python" not in plan, plan[:2000]
