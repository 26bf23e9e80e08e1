"""Adversarial-corpus oracle compares.

The fixed testdata corpora are well-behaved; the oracle-pair bug classes
ADVICE keeps finding (unescaped quotes in generated SQL literals, NULL
grouping divergence, int32 wrap) only bite on hostile content. This
suite synthesizes a deterministic adversarial documents table — quotes,
backslashes, unicode, newlines/paragraph breaks, empty and
whitespace-only docs, regex metacharacters, C4/Gopher trigger phrases,
NULL lang/source — and runs the documents-only oracle pairs through the
same three-way compare the driver uses.
"""

from __future__ import annotations

import os
import random

import pytest

from retail_aws_etl_pipeline_spark.plans import all_specs
from tests.oracle import compare

_WORDS = [
    "the", "data", "alpha", "beta", "Ünïcode", "naïve", "日本語", "中文",
    "it's", "o'brien", "a\\b", 'say_"hi"', "{brace}", "(paren)", "a.b?c",
    "x" * 300, "lorem", "ipsum", "javascript", "bullet", "point", "und",
    "1234", "...", "…", "der", "und", "la", "el", "—", "•",
]

_TRICKY_DOCS = [
    "",  # empty
    "   ",  # whitespace-only
    "one",  # single token
    "it's o'brien's 'quoted' word",  # single quotes everywhere
    'he said "hello" \\ backslash',  # double quotes + backslash
    "line one.\nline two!\n\npara two? ends.",  # newlines + paragraphs
    "日本語 テスト 中文 测试 mixed ascii",  # CJK
    "dup dup dup dup dup dup dup dup",  # heavy repetition
    "lorem ipsum filler {code} here",  # C4 page-gate triggers
    "ends without terminal punct",
    "- bullet line\n- another bullet\nreal sentence here.",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    rng = random.Random(0xC0FFEE)
    rows = []
    for i, t in enumerate(_TRICKY_DOCS):
        rows.append((i, t, "en", "fuzz", len(t)))
    for i in range(len(_TRICKY_DOCS), 64):
        n = rng.randint(1, 40)
        text = " ".join(rng.choice(_WORDS) for _ in range(n))
        if rng.random() < 0.25:
            text = text.replace(" ", "\n", 1)
        lang = rng.choice(["en", "de", "fr", "es", "zh", None])
        source = rng.choice(["web", "books", None])
        rows.append((i, text, lang, source, len(text)))
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("advfuzz"))
    # single FILE like the driver's testdata (DuckDB reads the same path)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(out, "documents.parquet"))
    return out


#: Registered documents-only pairs whose oracles are corpus-generic
#: (fit-literal/pinned oracles excluded by construction).
_REGISTERED = [
    "doc_token_stats",
    "doc_lang_id",
    "doc_fingerprints",
    "doc_quality",
    "corpus_vocabulary",
    "doc_repetition_ratio",
    "gopher_quality_report",
    "cdc_chunk_dedup",
    "tokenizer_fertility_by_lang",
    "dedup_signal_report",
]


@pytest.mark.parametrize("name", _REGISTERED)
def test_registered_pair_survives_adversarial_corpus(spark, adversarial_dir, name):
    spec = all_specs()[name]
    assert spec.oracle is not None
    r = compare(spec.spark_fn(spark, adversarial_dir), spec.oracle, adversarial_dir)
    assert r["ok"], (name, r)


def test_staged_pairs_survive_adversarial_corpus(spark, adversarial_dir):
    """The staged r13 battery queries (oracle constants on the module,
    not yet registered) through the same corpus — NULL lang/source
    exercises the shard manifest's COUNT(DISTINCT) semantics, the
    quality key exercises the BIGINT-first multiply."""
    from retail_aws_etl_pipeline_spark.plans import extensions as E

    for fn, oracle in [
        (E.training_shard_manifest, E.SHARD_MANIFEST_ORACLE),
        (E.c4_clean_report, E.C4_CLEAN_ORACLE),
    ]:
        r = compare(fn(spark, adversarial_dir), oracle, adversarial_dir)
        assert r["ok"], (fn.__name__, r)
