"""JSONL document-ingest source: explicit-schema single-pass read with
corrupt-line and required-field audits, gzip transparency, and unicode
round-trip."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.sources.jsonl import read_jsonl_documents

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11},
    {"doc_id": 2, "text": "第二个文档", "lang": "zh", "source": "s2", "n_chars": 999},
    {"doc_id": 3, "text": "", "lang": "en", "source": "s3", "n_chars": 0},
]


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def test_jsonl_good_corrupt_and_missing_split(spark, tmp_path):
    lines = [json.dumps(d, ensure_ascii=False) for d in GOOD]
    lines.insert(1, '{"doc_id": 4, "text": "broken')          # malformed JSON
    lines.append('{"doc_id": 5, "lang": "en"}')               # missing text
    lines.append('{"text": "no id", "lang": "en"}')           # missing doc_id
    f = tmp_path / "docs.jsonl"
    _write(f, lines)

    good, rejects = read_jsonl_documents(spark, str(f))
    got = {r["doc_id"]: r.asDict() for r in good.collect()}
    assert set(got) == {1, 2, 3}
    # n_chars is recomputed from text, not trusted from the wire
    assert got[2]["n_chars"] == len("第二个文档")
    assert got[3]["n_chars"] == 0

    rej = [(r["reason"], r["raw"]) for r in rejects.collect()]
    reasons = sorted(reason for reason, _ in rej)
    assert reasons == [
        "malformed_json",
        "missing_required_field",
        "missing_required_field",
    ]
    # the malformed line's raw text is preserved verbatim for the sink
    assert any('"broken' in raw for reason, raw in rej if reason == "malformed_json")


def test_jsonl_gzip_transparent(spark, tmp_path):
    f = tmp_path / "docs.jsonl.gz"
    payload = "\n".join(json.dumps(d, ensure_ascii=False) for d in GOOD) + "\n"
    with gzip.open(f, "wt", encoding="utf-8") as fh:
        fh.write(payload)
    good, rejects = read_jsonl_documents(spark, str(f))
    assert good.count() == 3
    assert rejects.count() == 0


def test_jsonl_read_is_single_pass_with_explicit_schema(spark, tmp_path):
    """The scan must NOT run an inference job: the plan's relation carries
    the caller schema and reading is lazy (zero jobs before an action)."""
    f = tmp_path / "docs.jsonl"
    _write(f, [json.dumps(d) for d in GOOD])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    good, _ = read_jsonl_documents(spark, str(f))
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "schema inference ran an eager job"
    assert [f.name for f in good.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars"
    ]


def test_jsonl_matches_documents_contract(spark, tmp_path):
    """Round-trip: the good frame unions cleanly with the parquet
    documents table (same names and physical types)."""
    f = tmp_path / "docs.jsonl"
    _write(f, [json.dumps(d) for d in GOOD])
    good, _ = read_jsonl_documents(spark, str(f))
    parquet = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merged = parquet.select(*good.columns).unionByName(good)
    assert merged.count() == parquet.count() + 3


def test_ingest_jsonl_corpus_partitioned_and_idempotent(spark, tmp_path):
    """lang-partitioned parquet + JSONL rejects; NULL lang bucketed; a
    re-ingest of the same source converges (dynamic partition overwrite,
    not append-duplication); counts ride the writes."""
    lines = [json.dumps(d, ensure_ascii=False) for d in GOOD]
    lines.append('{"doc_id": 9, "text": "no lang"}')     # NULL lang
    lines.append('{"doc_id": 10, "text": "broken')       # malformed
    f = tmp_path / "corpus.jsonl"
    _write(f, lines)
    dest = str(tmp_path / "corpus_parquet")
    rej = str(tmp_path / "corpus_rejects")

    from retail_aws_etl_pipeline_spark.sources.jsonl import ingest_jsonl_corpus

    counts = ingest_jsonl_corpus(spark, str(f), dest, rej)
    assert counts == {"good": 4, "rejects": 1}

    out = spark.read.parquet(dest)
    assert out.count() == 4
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en", "zh", "__unknown"}
    assert {r["reason"] for r in spark.read.json(rej).collect()} == {"malformed_json"}

    # re-ingest: same counts, same rows — no duplication
    counts2 = ingest_jsonl_corpus(spark, str(f), dest, rej)
    assert counts2 == counts
    assert spark.read.parquet(dest).count() == 4
