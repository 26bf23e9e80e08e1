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


def test_jsonl_stream_converges_to_batch(spark, tmp_path):
    """AvailableNow drain of the streaming JSONL reader == the batch
    reader on the same files, for BOTH the good frame and the rejects —
    guaranteed structurally (shared parse), asserted end-to-end."""
    import uuid

    from retail_aws_etl_pipeline_spark.sources.jsonl import (
        jsonl_documents_stream,
        read_jsonl_documents,
    )
    from retail_aws_etl_pipeline_spark.streaming.streams import run_stream_to_memory

    d = tmp_path / "drops"
    d.mkdir()
    _write(d / "a.jsonl", [json.dumps(x, ensure_ascii=False) for x in GOOD[:2]])
    _write(
        d / "b.jsonl",
        [json.dumps(GOOD[2], ensure_ascii=False), '{"bad', '{"doc_id": 7}'],
    )

    b_good, b_rej = read_jsonl_documents(spark, str(d))
    s_good, s_rej = jsonl_documents_stream(spark, str(d))
    tag = uuid.uuid4().hex[:8]
    got_good = run_stream_to_memory(s_good, f"jsonl_good_{tag}")
    got_rej = run_stream_to_memory(s_rej, f"jsonl_rej_{tag}")

    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got_good.collect()) == key(b_good.collect())
    assert key(got_rej.collect()) == key(b_rej.collect())
    assert got_good.count() == 3 and got_rej.count() == 2


def test_jsonl_drops_feed_near_dup_stream(spark, tmp_path):
    """End-to-end corpus arrival: JSONL drops → streaming ingest (shared
    parse, corrupt lines audited out) → the standing near-dup gram-index
    pipeline — streamed pairs equal the batch Jaccard >= 0.2 self-join
    over exactly the GOOD documents."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import jaccard_counts, shingles
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.sources.jsonl import jsonl_documents_stream
    from retail_aws_etl_pipeline_spark.streaming.streams import near_dup_stream

    docs = load_tables(spark, "/root/testdata/sf0.001", ["documents"])["documents"]
    rows = docs.select("doc_id", "text", "lang", "source", "n_chars").collect()
    drops = tmp_path / "drops"
    drops.mkdir()
    for wave in range(3):
        lines = [
            json.dumps(r.asDict(), ensure_ascii=False)
            for r in rows
            if r["doc_id"] % 3 == wave
        ]
        lines.append('{"wave %d corrupt' % wave)  # audited out, not ingested
        _write(drops / f"wave{wave}.jsonl", lines)

    good, _rejects = jsonl_documents_stream(spark, str(drops))
    q = near_dup_stream(
        good.select("doc_id", "text"),
        index_dir=str(tmp_path / "gram_index"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    grams = shingles(docs).persist()
    want = {
        (r["id_a"], r["id_b"])
        for r in jaccard_counts(grams)
        .filter(F.col("common") * 5 >= (F.col("n_a") + F.col("n_b") - F.col("common")))
        .collect()
    }
    grams.unpersist()
    assert got == want and want


def test_jsonl_untrusted_field_type_mismatch_is_not_a_reject(spark, tmp_path):
    """A wrong-typed field OUTSIDE the required/kept set (e.g. a producer
    emitting n_chars as a string) must NOT reject the line: n_chars is
    recomputed and discarded anyway, and the parse schema deliberately
    excludes it (ADVICE r7). String-typed kept fields (lang/source) accept
    any JSON value — from_json keeps the raw JSON text for StringType — so
    only the typed required field (doc_id) can still type-reject, which is
    correct: a non-numeric doc_id IS an unusable line."""
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": "11"}',
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3.5}',
        '{"doc_id": "notanint", "text": "bad id", "lang": "en", "source": "s"}',
    ]
    f = tmp_path / "docs.jsonl"
    _write(f, lines)
    good, rejects = read_jsonl_documents(spark, str(f))
    got = {r["doc_id"]: r["n_chars"] for r in good.collect()}
    assert got == {1: 2, 2: 3}  # recomputed from text, wire value ignored
    assert [r["reason"] for r in rejects.collect()] == ["malformed_json"]


def test_ingest_jsonl_corpus_does_not_mutate_session_overwrite_mode(spark, tmp_path):
    """The dynamic partition overwrite must ride the WRITE, not the session:
    a later static overwrite in the same session must stay static
    (ADVICE r7)."""
    from retail_aws_etl_pipeline_spark.sources.jsonl import ingest_jsonl_corpus

    f = tmp_path / "corpus.jsonl"
    _write(f, [json.dumps(d, ensure_ascii=False) for d in GOOD])
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "static")
        ingest_jsonl_corpus(spark, str(f), str(tmp_path / "dest"))
        assert spark.conf.get(key) == "static"
        assert spark.read.parquet(str(tmp_path / "dest")).count() == 3
    finally:
        spark.conf.set(key, prev)


def test_ingest_jsonl_corpus_writes_audit(spark, tmp_path):
    """The optional audit put mirrors the compaction metrics discipline:
    one JSON document per ingest keyed by source, with the counts."""
    lines = [json.dumps(d, ensure_ascii=False) for d in GOOD] + ['{"nope']
    f = tmp_path / "corpus.jsonl"
    _write(f, lines)

    from retail_aws_etl_pipeline_spark.sources.jsonl import ingest_jsonl_corpus

    audit = tmp_path / "audit"
    ingest_jsonl_corpus(
        spark,
        str(f),
        str(tmp_path / "dest"),
        str(tmp_path / "rej"),
        audit_dir=str(audit),
    )
    [doc] = list(audit.glob("jsonl_ingest_*.json"))
    metrics = json.loads(doc.read_text())
    assert metrics["good_rows"] == 3 and metrics["reject_rows"] == 1
    assert metrics["status"] == "SUCCESS" and metrics["source"] == str(f)
