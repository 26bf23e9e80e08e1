"""Proof battery for the r16 tranche (staged r14, REGISTERED r16):
badwords_filter_report, ngram_diversity_report, template_affix_report,
corpus_snapshot_delta, langid_confusion_report (hll_overlap_report, the
sixth r16 swap, carries its battery in test_staged_r15.py). Same
discipline as every staged predecessor: DuckDB oracle compares at two
gate scales, handcrafted semantics tests per operator, and plan gates —
retained verbatim after registration (the staging-battery rule: direct
function refs survive rotation)."""

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


# --- registration-time hostile batteries (r16, VERDICT r15 item #7) ---------


def test_badwords_token_boundaries_and_case_folds(tmp_path, spark):
    """The gate is exact lowercase TOKEN membership on the single-space
    split — the boundary cases must NOT count: punctuation-attached
    ("casino,"), plural/substring ("casinos", "xxxl"), hyphen-joined
    ("casino-lottery"), and tab/newline-attached tokens (split(' ')
    leaves "casino\\tpills" as ONE token). Mixed-case forms DO count
    (lower() folds them); both engines must agree on every case."""
    rows = [
        (1, "casino, casinos casino-lottery xxxl", "en", "web"),  # 0 hits
        (2, "casino\tpills porn\nxxx clean", "en", "web"),  # 0 hits (tab/nl glue)
        (3, "CaSiNo PILLS ViAgRa", "de", "web"),  # 3 hits, all folded
        (4, "casino", "fr", "web"),  # exact single token
    ]
    out = _write_docs(tmp_path, spark, rows)
    got = {r["lang"]: r for r in E.badwords_filter_report(spark, out).collect()}
    en = got["en"]
    assert (en["n_docs"], en["n_blocked_docs"], en["n_blocked_tokens"]) == (2, 0, 0)
    assert en["top_badword"] is None
    de = got["de"]
    assert (de["n_blocked_docs"], de["n_blocked_tokens"]) == (1, 3)
    assert de["top_badword"] == "casino"  # 1-1-1 tie -> lex smallest
    assert got["fr"]["n_blocked_docs"] == 1
    r = compare(E.badwords_filter_report(spark, out), E.BADWORDS_FILTER_ORACLE, out)
    assert r["ok"], r


def test_langid_confusion_mixed_script_docs(tmp_path, spark):
    """Mixed-script docs (CJK + latin markers, cyrillic, quotes and
    backslashes inside the text) through BOTH engines' scored CTE: the
    census never drops a labeled doc (per-truth n_true == planted
    count), share_ppm floors sum to <= 1e6 per truth row, and the
    all-script rows land somewhere deterministic on both engines."""
    rows = [
        (1, "the cat 日本語 テスト and the dog", "en", "web"),
        (2, "日本語 テスト 中文 测试", "zh", "web"),
        (3, "der hund 'quoted' \\slash und die", "de", "web"),
        (4, "привет мир the and кот", "ru", "web"),
        (5, "…—• ### 123", "en", "web"),  # no markers of any lang
        (6, "le chat 中文 et la", "fr", "web"),
    ]
    out = _write_docs(tmp_path, spark, rows)
    frame = E.langid_confusion_report(spark, out).collect()
    by_truth: dict[str, int] = {}
    for r in frame:
        by_truth[r["lang"]] = by_truth.get(r["lang"], 0) + r["n_docs"]
    assert by_truth == {"en": 2, "zh": 1, "de": 1, "ru": 1, "fr": 1}
    for r in frame:
        assert 0 < r["share_ppm"] <= 1_000_000
    r = compare(E.langid_confusion_report(spark, out), E.LANGID_CONFUSION_ORACLE, out)
    assert r["ok"], r


def test_snapshot_delta_adversarial_collisions(tmp_path, spark):
    """Add/remove/change collision corpus: the %8==2 edit makes one
    doc's B-side text EQUAL another doc's unedited text (cross-id
    content collision — the hash census must still count distinct
    hashes, not ids), NULL texts ride the FULL OUTER join through both
    engines' CASE ladder (a present-both NULL-text doc classifies
    'added' by the shared text_a-IS-NULL-first order — engine
    agreement, not semantics, is the pin), and quote/unicode texts
    survive the ' v2' concat + md5 on both sides."""
    rows = [
        # doc 2 (%8==2): B-side becomes "shared body v2"
        (2, "shared body", "en", "web"),
        # doc 3: text IS already "shared body v2" -> collides with doc 2's B text
        (3, "shared body v2", "en", "web"),
        # doc 4 (%4==0): A drops it -> added; NULL text
        (4, None, "en", "web"),
        # doc 5 (%4==1): B drops it -> removed
        (5, "it's \\escaped 日本語", "en", "web"),
        # doc 6: present both, unchanged
        (6, "plain stable doc", "en", "web"),
        # doc 7: present both, NULL text -> text_a IS NULL fires first: 'added'
        (7, None, "en", "web"),
        # doc 10 (%8==2): edited, unicode + quotes through concat+md5
        (10, "naïve 'quote' body", "en", "web"),
    ]
    out = _write_docs(tmp_path, spark, rows)
    got = {r["status"]: r for r in E.corpus_snapshot_delta(spark, out).collect()}
    # statuses: added = {4, 7}, removed = {5}, changed = {2, 10}, unchanged = {3, 6}
    assert got["added"]["n_docs"] == 2
    assert got["removed"]["n_docs"] == 1
    assert got["changed"]["n_docs"] == 2
    assert got["unchanged"]["n_docs"] == 2
    # the cross-id collision: doc 2's B text == doc 3's text, but they sit
    # in DIFFERENT status buckets, so each keeps its own distinct hash;
    # added counts hashes over NULL-md5 rows -> 0 distinct
    assert got["added"]["n_content_hashes"] == 0
    assert got["changed"]["n_content_hashes"] == 2
    assert got["unchanged"]["n_content_hashes"] == 2
    r = compare(E.corpus_snapshot_delta(spark, out), E.CORPUS_DELTA_ORACLE, out)
    assert r["ok"], r
