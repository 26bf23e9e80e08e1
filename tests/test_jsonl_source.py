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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_jsonval = st.one_of(
    st.none(),
    st.integers(-(2**62), 2**62),
    st.text(max_size=8),
    st.booleans(),
    st.lists(st.integers(0, 9), max_size=3),
)


@given(
    docs=st.lists(
        st.fixed_dictionaries(
            {},
            optional={
                "doc_id": st.one_of(st.integers(-(2**62), 2**62), st.none()),
                "text": st.one_of(st.text(max_size=20), st.none()),
                "lang": st.one_of(st.text(min_size=1, max_size=4), st.none()),
                "source": _jsonval,
                "n_chars": _jsonval,
                "extra": _jsonval,
            },
        ),
        min_size=1,
        max_size=12,
    ),
    breakers=st.lists(st.sampled_from(["", "{", "not json", '{"a":', "[1,2]", "null", '"str"']), max_size=3),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_classify_jsonl_lines_matches_python_reference(spark, tmp_path_factory, docs, breakers):
    """classify_jsonl_lines partitions arbitrary lines exactly as a Python
    json.loads reference: a line is malformed_json iff it doesn't parse as
    a JSON OBJECT with a non-null integer-typed doc_id when present-typed
    fields are checked; missing_required_field iff it parses but doc_id or
    text is absent/null; otherwise good with doc_id/text/lang round-tripped
    and n_chars recomputed. Pins the PERMISSIVE from_json semantics the
    audit classes depend on (wrong-typed doc_id corrupts; wrong-typed
    untrusted fields don't; string fields accept any JSON value as text)."""
    from retail_aws_etl_pipeline_spark.sources.jsonl import classify_jsonl_lines

    lines = [json.dumps(d, ensure_ascii=False) for d in docs] + list(breakers)

    def ref(line):
        try:
            obj = json.loads(line)
        except ValueError:
            return ("malformed_json", None, None)
        if not isinstance(obj, dict):
            return ("malformed_json", None, None)
        # typed required field: a non-integer doc_id fails the LongType
        # parse and PERMISSIVE flags the whole line corrupt
        if "doc_id" in obj and obj["doc_id"] is not None and (
            isinstance(obj["doc_id"], bool) or not isinstance(obj["doc_id"], int)
        ):
            return ("malformed_json", None, None)
        doc_id = obj.get("doc_id")
        text = obj.get("text")
        # StringType accepts any JSON value (kept as raw JSON text), so a
        # non-string text is still "present"
        if doc_id is None or text is None:
            return ("missing_required_field", None, None)
        return ("good", doc_id, text if isinstance(text, str) else None)

    want = [ref(ln) for ln in lines]

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got_rows = classify_jsonl_lines(df).collect()
    assert len(got_rows) == len(lines)
    by_raw = {}
    for r in got_rows:
        by_raw.setdefault(r["raw"], []).append(r)
    for ln, (cls, doc_id, text) in zip(lines, want):
        r = by_raw[ln].pop(0)
        got_cls = r["reject_reason"] or "good"
        assert got_cls == cls, (ln, got_cls, cls)
        if cls == "good":
            assert r["doc_id"] == doc_id
            if text is not None:
                assert r["text"] == text and r["n_chars"] == len(text)


def test_ingest_jsonl_corpus_converges_over_crash_debris(spark, tmp_path):
    """A crashed previous ingest leaves committer debris (_temporary dirs,
    orphan part files in a lang partition); a re-ingest of the same source
    must converge to exactly the source's rows — dynamic partition
    overwrite replaces the partitions the source carries, and the reader
    must see no phantom rows."""
    import os

    from retail_aws_etl_pipeline_spark.sources.jsonl import ingest_jsonl_corpus

    f = tmp_path / "corpus.jsonl"
    _write(f, [json.dumps(d, ensure_ascii=False) for d in GOOD])
    dest = tmp_path / "dest"

    counts = ingest_jsonl_corpus(spark, str(f), str(dest))
    assert counts["good"] == 3

    # simulate a crashed writer: stray committer dir + orphan file in a
    # partition the source WILL rewrite
    os.makedirs(dest / "_temporary" / "0", exist_ok=True)
    (dest / "_temporary" / "0" / "junk").write_bytes(b"x")
    en_dir = next(p for p in dest.iterdir() if p.name == "lang=en")
    orphan = en_dir / "part-99999-orphan.snappy.parquet"
    # a real parquet file with the right schema, as a crashed task would leave
    spark.read.parquet(str(dest)).filter("lang = 'en'").limit(1).drop("lang").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "one"))
    import shutil as _sh

    src_part = next(p for p in (tmp_path / "one").iterdir() if p.name.endswith(".parquet"))
    _sh.copy(src_part, orphan)
    assert spark.read.parquet(str(dest)).filter("lang = 'en'").count() > 2  # phantom visible

    counts2 = ingest_jsonl_corpus(spark, str(f), str(dest))
    assert counts2 == counts
    out = spark.read.parquet(str(dest))
    assert out.count() == 3 and out.filter("lang = 'en'").count() == 2


def test_jsonl_stream_batch_sizing_knob_preserves_results(spark, tmp_path):
    """max_files_per_trigger sizes micro-batches (the production
    amortization knob the K=10 smoke motivated) without changing WHAT is
    computed: 3 drop files drain in 1 batch at mft=3 vs 3 batches at the
    default, with identical good/reject results either way."""
    import uuid

    from retail_aws_etl_pipeline_spark.sources.jsonl import jsonl_documents_stream

    d = tmp_path / "drops"
    d.mkdir()
    for i, doc in enumerate(GOOD):
        _write(d / f"w{i}.jsonl", [json.dumps(doc, ensure_ascii=False), '{"bad%d' % i])

    def drain(mft):
        good, rej = jsonl_documents_stream(spark, str(d), max_files_per_trigger=mft)
        tag = uuid.uuid4().hex[:8]
        q = (
            good.writeStream.format("memory")
            .queryName(f"knob_{mft}_{tag}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        rows = sorted(tuple(r) for r in spark.table(f"knob_{mft}_{tag}").collect())
        return n_batches, rows

    b1, rows1 = drain(1)
    b3, rows3 = drain(3)
    assert rows1 == rows3 and len(rows1) == 3
    assert b1 == 3 and b3 == 1, (b1, b3)
