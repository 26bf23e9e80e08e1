"""Streaming operators converge to their batch twins; multimodal plumbing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.operators import multimodal as MM
from retail_aws_etl_pipeline_spark.plans import all_specs

REGISTRY = all_specs()
from retail_aws_etl_pipeline_spark.session import load_tables
from retail_aws_etl_pipeline_spark.streaming import (
    dedup_stream,
    events_stream,
    hourly_rollup_stream,
    run_stream_to_memory,
    running_user_stats_stream,
    session_stream,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-shard sf0.001 events into 4 raw (ns-as-long) files so the stream
    runs several microbatches."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{SF_SMOKE}/events.parquet")  # ts stays long ns
    raw.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_hourly_rollup_stream_matches_batch(spark, events_dir):
    stream = hourly_rollup_stream(events_stream(spark, events_dir))
    got = run_stream_to_memory(stream, "rollup_out", output_mode="complete")
    # hourly_event_rollup was unregistered at r9 (streamed_hourly_rollup
    # keeps the identical oracle registered); the batch function remains
    # the stream's equivalence baseline here.
    from retail_aws_etl_pipeline_spark.plans.analytics import (
        hourly_event_rollup,
    )

    batch = hourly_event_rollup(spark, SF_SMOKE)
    g = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in batch.collect()}
    assert set(g) == set(b)
    for k in b:
        assert g[k][0] == b[k][0]
        assert g[k][1] == pytest.approx(b[k][1], rel=1e-9)


def test_dedup_stream(spark, events_dir, tmp_path):
    # duplicate the whole input (append the same shards again): 2x rows,
    # same distinct keys; unordered replay => watermark=None
    doubled = str(tmp_path / "doubled")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(events_dir)
    raw.write.mode("overwrite").parquet(doubled)
    raw.write.mode("append").parquet(doubled)
    got = run_stream_to_memory(
        dedup_stream(events_stream(spark, doubled), watermark=None), "dedup_out"
    )
    n_distinct = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select("event_id").distinct().count()
    assert spark.read.parquet(doubled).count() == 2 * n_distinct
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_session_stream_matches_batch_session_count(spark, tmp_path):
    # session_window drops watermark-late rows even in complete mode, so
    # feed one time-coherent shard (single microbatch = no late data)
    single = str(tmp_path / "single")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(f"{SF_SMOKE}/events.parquet").coalesce(1).write.mode("overwrite").parquet(single)
    stream = session_stream(events_stream(spark, single))
    got = run_stream_to_memory(stream, "session_out", output_mode="complete")
    batch = REGISTRY["user_sessions"].spark_fn(spark, SF_SMOKE)
    assert got.count() == batch.count()
    g = got.groupBy("user_id").count().collect()
    b = batch.groupBy("user_id").count().collect()
    assert {(r["user_id"], r["count"]) for r in g} == {(r["user_id"], r["count"]) for r in b}


def test_running_user_stats_stream_matches_batch(spark, events_dir):
    # Update mode re-emits a user's totals every micro-batch that touches
    # them; n_events is monotone per user, so the final state is the row
    # with the max n_events.
    got = run_stream_to_memory(
        running_user_stats_stream(events_stream(spark, events_dir)),
        "running_stats_out",
        output_mode="update",
    )
    final = {}
    for r in got.collect():
        prev = final.get(r["user_id"])
        if prev is None or r["n_events"] > prev[0]:
            final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    b = {r["user_id"]: (r["n"], r["total"]) for r in batch.collect()}
    assert set(final) == set(b)
    for k in b:
        assert final[k][0] == b[k][0]
        assert final[k][1] == pytest.approx(b[k][1], rel=1e-9)


def test_byte_histogram_kernel(spark):
    t = load_tables(spark, SF_SMOKE, ["documents"])
    doc = t["documents"].filter(F.col("doc_id") == 0)
    text = doc.collect()[0]["text"]
    media = MM.media_from_documents(doc)
    hist = {(r["byte"]): r["n"] for r in MM.byte_histogram(media).collect()}
    import collections

    expected = collections.Counter(text.encode("utf-8"))
    assert hist == dict(expected)


def test_decode_stub_raises(spark):
    t = load_tables(spark, SF_SMOKE, ["documents"])
    media = MM.media_from_documents(t["documents"].limit(2)).withColumn("kind", F.lit("image"))
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        MM.decode_images(media).collect()


def test_bmp_roundtrip_exact():
    """encode→decode identity across widths that do and don't need row
    padding, plus rejection of non-BMP and top-down negative-height decode."""
    import numpy as np
    import pytest as _pt

    rng = np.random.default_rng(7)
    for w, h in [(6, 4), (4, 4), (5, 3), (1, 1), (7, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = MM.encode_bmp(px)
        assert MM.bmp_file_size(buf) == len(buf)
        out = MM.decode_bmp(buf)
        assert out.shape == (h, w, 3)
        assert (out == px).all()
    with _pt.raises(ValueError, match="BM magic"):
        MM.decode_bmp(b"JUNKJUNKJUNKJUNK")
    # top-down variant (negative height) decodes without the row flip
    px = rng.integers(0, 256, size=(2, 4, 3), dtype=np.uint8)
    buf = bytearray(MM.encode_bmp(px[::-1]))  # stored rows == logical rows
    buf[22:26] = (-2).to_bytes(4, "little", signed=True)
    assert (MM.decode_bmp(bytes(buf)) == px).all()


def test_png_roundtrip_all_filters():
    """encode→decode identity for RGB and RGBA at heights ≥5 (the encoder's
    row%5 filter cycle guarantees every unfilter path — None/Sub/Up/
    Average/Paeth — is exercised), plus decode parity against zlib-level
    checks and rejection of non-PNG input."""
    import numpy as np
    import pytest as _pt

    rng = np.random.default_rng(11)
    for h, w, c in [(5, 8, 3), (7, 3, 3), (6, 5, 4), (1, 1, 3), (10, 2, 4)]:
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        buf = MM.encode_png(px)
        assert buf[:8] == MM.PNG_SIG
        out = MM.decode_png(buf)
        assert out.shape == (h, w, c)
        assert (out == px).all()
    with _pt.raises(ValueError, match="signature"):
        MM.decode_png(b"NOTAPNG_________")
    # multi-IDAT streams must concatenate before inflate
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    buf = MM.encode_png(px)
    # split the single IDAT into two chunks
    import struct, zlib as _z  # noqa: E401

    ln = int.from_bytes(buf[33:37], "big")  # IHDR is 8+25 bytes in; IDAT at 33
    assert buf[37:41] == b"IDAT"
    body = buf[41 : 41 + ln]
    half = len(body) // 2

    def chunk(ctype, b):
        return struct.pack(">I", len(b)) + ctype + b + struct.pack(">I", _z.crc32(ctype + b) & 0xFFFFFFFF)

    rebuilt = buf[:33] + chunk(b"IDAT", body[:half]) + chunk(b"IDAT", body[half:]) + chunk(b"IEND", b"")
    assert (MM.decode_png(rebuilt) == px).all()


def test_png_decode_kernel(spark):
    """synth_media('png') payloads through decode_png_stats: features match
    the closed-form pixel formula for every id."""
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = {
        r["media_id"]: r
        for r in MM.decode_png_stats(MM.synth_media(ids, "doc_id", "png")).collect()
    }
    n = MM.PNG_H * MM.PNG_W * 3
    for mid in range(40):
        expect_sum = sum((mid * 17 + i * 5) % 256 for i in range(n))
        expect_c0 = sum((mid * 17 + i * 5) % 256 for i in range(0, n, 3))
        r = got[mid]
        assert (r["width"], r["height"], r["n_units"]) == (MM.PNG_W, MM.PNG_H, n)
        assert r["byte_sum"] == expect_sum
        assert r["c0_sum"] == expect_c0


def test_wav_roundtrip_and_chunk_walk():
    """encode→decode identity, and the parser walks past an unknown
    odd-length chunk inserted before fmt/data (even-byte alignment)."""
    import numpy as np

    s = (np.arange(100, dtype=np.int64) * 997 % 65536 - 32768).astype(np.int16)
    buf = MM.encode_wav(s, sample_rate=22050)
    rate, ch, out = MM.decode_wav(buf)
    assert (rate, ch) == (22050, 1)
    assert (out == s).all()
    # splice an unknown 3-byte chunk right after the WAVE id
    alien = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    spliced = buf[:12] + alien + buf[12:]
    rate2, _ch2, out2 = MM.decode_wav(spliced)
    assert rate2 == 22050 and (out2 == s).all()


def test_synth_media_decode_kernels(spark):
    """The distributed path: synth → real decode kernels, checked against
    the same integer formulas computed directly."""
    import numpy as np

    ids = spark.range(5).select(F.col("id").alias("doc_id"))
    img = MM.synth_media(ids, "doc_id", "image")
    stats = {r["media_id"]: r for r in MM.decode_bmp_stats(img).collect()}
    for mid in range(5):
        flat = MM._bmp_bytes_for(mid).reshape(-1).astype(np.int64)
        r = stats[mid]
        assert (r["width"], r["height"], r["n_units"]) == (MM.BMP_W, MM.BMP_H, flat.size)
        assert r["byte_sum"] == flat.sum()
        assert r["c0_sum"] == flat[0::3].sum()

    aud = MM.synth_media(ids, "doc_id", "audio")
    wstats = {r["media_id"]: r for r in MM.decode_wav_stats(aud).collect()}
    for mid in range(5):
        s = MM._wav_samples_for(mid).astype(np.int64)
        r = wstats[mid]
        assert r["sample_rate"] == MM.WAV_RATE
        assert r["n_units"] == len(s)
        assert r["abs_sum"] == np.abs(s).sum()
        assert r["max_sample"] == s.max()


def test_resize_and_frame_sampling(spark):
    import numpy as np

    ids = spark.range(3).select(F.col("id").alias("doc_id"))
    img = MM.synth_media(ids, "doc_id", "image")
    small = MM.resize_bmp(img, 3, 2).collect()
    assert len(small) == 3
    for r in small:
        px = MM.decode_bmp(bytes(r["payload"]))
        assert px.shape == (2, 3, 3)
        # nearest-neighbor: output pixel (0,0) is input pixel (0,0)
        src = MM._bmp_bytes_for(r["media_id"])
        assert (px[0, 0] == src[0, 0]).all()

    vid = MM.synth_media(ids, "doc_id", "video")
    frames = MM.sample_bmp_frames(vid, every_n=3).collect()
    # VIDEO_FRAMES=8, every 3rd → indices 0,3,6 per media
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 3, 6] for v in by_media.values())
    f3 = next(r for r in frames if r["media_id"] == 1 and r["frame_idx"] == 3)
    assert (MM.decode_bmp(bytes(f3["payload"])) == MM._bmp_bytes_for(1, 3)).all()
    assert np.asarray(MM._bmp_bytes_for(1, 3)).shape == (MM.BMP_H, MM.BMP_W, 3)


def test_gold_upsert_stream(spark, tmp_path):
    """Two silver waves with overlapping transaction_ids: the streamed gold
    keeps exactly one (latest) row per key, and re-running the stream with
    the same checkpoint is a no-op."""
    import glob as g
    import shutil as sh

    from retail_aws_etl_pipeline_spark.ingest import ingest_file
    from retail_aws_etl_pipeline_spark.lake import LakeLayout
    from retail_aws_etl_pipeline_spark.streaming.streams import gold_upsert_stream

    lake = LakeLayout(str(tmp_path / "lake"))
    ck = str(tmp_path / "ck")
    src = "/root/reference/sample_csv_files/sales_2024-10-16.csv"

    # wave 1
    f1 = tmp_path / "w1.csv"; sh.copy(src, f1)
    ingest_file(spark, str(f1), lake, archive=False, write_reject_csv=False)
    q = gold_upsert_stream(spark, lake, ck); q.awaitTermination()
    gold1 = spark.read.parquet(lake.gold)
    n1 = gold1.count()
    assert n1 > 0
    assert gold1.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    # wave 2: same file again (same transaction_ids, later ingest_ts)
    f2 = tmp_path / "w2.csv"; sh.copy(src, f2)
    r2 = ingest_file(spark, str(f2), lake, archive=False, write_reject_csv=False)
    q = gold_upsert_stream(spark, lake, ck); q.awaitTermination()
    gold2 = spark.read.parquet(lake.gold)
    assert gold2.count() == n1  # same keys -> still one row each
    assert gold2.groupBy("date", "transaction_id").count().filter("count>1").count() == 0
    # latest wave won: every surviving row carries wave-2's run id
    assert gold2.filter(gold2.ingest_run_id == r2.ingest_run_id).count() == n1

    # re-run with same checkpoint: no new input -> no change
    q = gold_upsert_stream(spark, lake, ck); q.awaitTermination()
    assert spark.read.parquet(lake.gold).count() == n1


def test_continuous_pipeline_available_now(spark, tmp_path):
    """Three drains of the end-to-end pipeline: new file per wave lands in
    gold, dedup invariant holds, and an empty wave is a complete no-op."""
    import shutil as sh

    from retail_aws_etl_pipeline_spark.lake import LakeLayout
    from retail_aws_etl_pipeline_spark.streaming import run_pipeline_available_now

    incoming = tmp_path / "incoming"
    incoming.mkdir()
    lake = LakeLayout(str(tmp_path / "lake"))
    ck = str(tmp_path / "ck")
    kw = dict(archive=False, write_reject_csv=False)

    sh.copy("/root/reference/sample_csv_files/sales_2024-10-16.csv", incoming / "a.csv")
    res1 = run_pipeline_available_now(spark, str(incoming), lake, ck, **kw)
    assert [r.status for r in res1] == ["ok"]
    gold1 = spark.read.parquet(lake.gold)
    n1 = gold1.count()
    assert n1 > 0
    assert gold1.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    sh.copy("/root/reference/sample_csv_files/sales_2024-12-07.csv", incoming / "b.csv")
    res2 = run_pipeline_available_now(spark, str(incoming), lake, ck, **kw)
    assert [r.status for r in res2] == ["ok"]  # only the new file ran
    gold2 = spark.read.parquet(lake.gold)
    assert gold2.count() > n1
    assert gold2.groupBy("date", "transaction_id").count().filter("count>1").count() == 0

    res3 = run_pipeline_available_now(spark, str(incoming), lake, ck, **kw)
    assert res3 == []  # ledger skips both files; stream checkpoint no-ops
    assert spark.read.parquet(lake.gold).count() == gold2.count()


def test_events_stream_empty_dir_falls_back_to_canonical_schema(spark, tmp_path):
    """Start-stream-before-data-arrives: an empty/absent events dir must not
    throw at stream construction — the source falls back to
    EVENTS_RAW_SCHEMA, and files landing later are read against it."""
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        EVENTS_RAW_SCHEMA,
        events_stream,
    )

    empty = str(tmp_path / "events_not_yet")
    os.makedirs(empty)  # the sink dir exists before any producer does
    stream = events_stream(spark, empty)
    assert stream.isStreaming
    assert stream.schema == EVENTS_RAW_SCHEMA

    # producer comes up after the stream was declared
    import datetime as dt

    rows = [
        (1, dt.datetime(2025, 7, 1, 10, 0, 0), 7, "click", 1.5, "{}"),
        (2, dt.datetime(2025, 7, 1, 10, 5, 0), 7, "buy", 9.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENTS_RAW_SCHEMA).write.mode("append").parquet(empty)
    out = str(tmp_path / "out")
    (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert spark.read.parquet(out).count() == 2


def test_probe_image_dims_headers_and_errors():
    """Lib-free dims probe: JPEG SOF walk, GIF descriptor, PNG IHDR; and
    the failure modes — truncated chunk length (ADVICE r4), truncated SOF,
    unknown magic."""
    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _gif_header_bytes,
        _jpeg_header_bytes,
        _png_chunk,
        PNG_SIG,
        probe_image_dims,
    )
    import struct

    assert probe_image_dims(_jpeg_header_bytes(640, 480)) == ("jpeg", 640, 480)
    assert probe_image_dims(_gif_header_bytes(320, 200)) == ("gif", 320, 200)
    png = PNG_SIG + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 77, 55, 8, 2, 0, 0, 0))
    assert probe_image_dims(png) == ("png", 77, 55)
    assert probe_image_dims(b"\x00\x01randombytes") == ("unknown", None, None)
    # JPEG whose marker walk runs out before any SOF
    with pytest.raises(ValueError, match="no SOF"):
        probe_image_dims(b"\xff\xd8\xff\xd9")
    # truncated PNG (ADVICE r5): valid signature but no complete IHDR must
    # raise like the GIF/JPEG branches, not misreport as unknown format
    with pytest.raises(ValueError, match="truncated PNG"):
        probe_image_dims(PNG_SIG)
    with pytest.raises(ValueError, match="truncated PNG"):
        probe_image_dims(png[:20])
    # GIF truncation stays symmetric
    with pytest.raises(ValueError, match="truncated GIF"):
        probe_image_dims(b"GIF89a\x40")


def test_decode_png_rejects_truncated_chunk_length():
    """ADVICE r4: a chunk whose declared length points past the buffer must
    fail with a clear 'truncated' error, not a confusing downstream one."""
    import struct

    import numpy as np
    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    # corrupt the IDAT length field (bytes 8+25 = start of IDAT chunk len)
    idat_at = good.index(b"IDAT") - 4
    bad = good[:idat_at] + struct.pack(">I", 10_000_000) + good[idat_at + 4 :]
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        decode_png(bad)


def test_with_quantized_rederives_for_different_source_column(spark):
    """ADVICE r4: a frame quantized from one column must NOT pass through
    unchanged when a caller asks to quantize a different column."""
    from retail_aws_etl_pipeline_spark.operators.similarity import with_quantized

    df = spark.createDataFrame(
        [(1, [0.5, 0.5], [1.0, 2.0])], ["vec_id", "embedding", "other"]
    )
    q1 = with_quantized(df)
    assert q1.select("qnorm").first()[0] == 512 * 512 * 2
    # same source column: idempotent passthrough
    assert with_quantized(q1) is q1
    # different source column: re-derived, not stale
    q2 = with_quantized(q1, "other")
    assert q2.select("qnorm").first()[0] == 1024 * 1024 + 2048 * 2048


def test_probe_audio_meta_headers_and_errors():
    """Audio metadata probe: WAV fmt walk, FLAC STREAMINFO bit unpack, MP3
    frame header with and without an ID3v2 prefix; unknown magic; reserved
    sample-rate index."""
    import numpy as np
    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _flac_header_bytes,
        _mp3_header_bytes,
        encode_wav,
        probe_audio_meta,
    )

    wav = encode_wav(np.zeros(4, dtype=np.int16), 22050, 2)
    assert probe_audio_meta(wav) == ("wav", 22050, 2)
    assert probe_audio_meta(_flac_header_bytes(96000, 6)) == ("flac", 96000, 6)
    assert probe_audio_meta(_mp3_header_bytes(1, 2, False)) == ("mp3", 48000, 2)
    assert probe_audio_meta(_mp3_header_bytes(0, 1, True)) == ("mp3", 44100, 1)
    assert probe_audio_meta(b"\x00nonsense") == ("unknown", None, None)
    with pytest.raises(ValueError, match="reserved"):
        probe_audio_meta(bytes([0xFF, 0xFB, (9 << 4) | (3 << 2), 0]))


def test_pii_scrub_matches_python_re_on_adversarial_text(spark):
    """Spark's Java-regex scrub must agree byte-for-byte with a Python `re`
    reference on adversarial shapes: emails inside words, adjacent IP
    chains, SSN/phone lookalikes, boundary-hugging digits."""
    import re

    from retail_aws_etl_pipeline_spark.operators.textops import (
        PII_PATTERNS,
        scrub_pii,
        with_pii_counts,
    )

    cases = [
        "plain text no pii at all",
        "a@b.cd999-99-9999 glued email then ssn",
        "chain 1.2.3.4.5.6.7.8 of dotted octets",
        "call 555.123.4567 or 555-123-4567 ssn 123-45-6789",
        "x1.2.3.4 no left boundary, 1.2.3.4x no right boundary",
        "deep.sub.domain@mail.co.uk trailing.dot@x.org.",
        "12.34.56.789 too-long last octet, 999-99-99 short ssn",
        "double@@at.com and user@@ex.org",
        "edge@x.io5.5.5.5",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)], ["id", "text"])
    got = {
        r["id"]: r["clean_text"]
        for r in scrub_pii(with_pii_counts(df)).select("id", "clean_text").collect()
    }
    for i, t in enumerate(cases):
        expect = t
        for _kind, pat, repl in PII_PATTERNS:
            expect = re.sub(pat, repl, expect)
        assert got[i] == expect, f"case {i}: {t!r}: {got[i]!r} != {expect!r}"


def test_probe_video_meta_box_walk_and_errors():
    """MP4 probe: v0 mvhd/tkhd parse, duration math, truncated-box and
    missing-moov errors, unknown magic."""
    import struct

    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _mp4_header_bytes,
        probe_video_meta,
    )

    buf = _mp4_header_bytes(600, 1800, 1920, 1080)
    assert probe_video_meta(buf) == ("mp4", 3000, 1920, 1080)  # 1800/600 = 3 s
    assert probe_video_meta(b"randomnotamp4file") == ("unknown", None, None, None)
    # ftyp alone: structurally mp4 but no moov -> explicit error
    ftyp_only = buf[: struct.unpack(">I", buf[:4])[0]]
    with pytest.raises(ValueError, match="no moov"):
        probe_video_meta(ftyp_only)
    # corrupt a box size to point past the buffer
    bad = struct.pack(">I", 1 << 24) + buf[4:]
    with pytest.raises(ValueError, match="declares"):
        probe_video_meta(bad)


def test_gold_upsert_stream_soak(spark, tmp_path):
    """VERDICT r5 #5 — rate-limited continuous soak: gold_upsert_stream in
    processing-time mode with maxFilesPerTrigger=1, three overlapping
    silver waves landing WHILE the query runs. Each wave must fold into
    gold through several small micro-batches (rate limit honored), the
    keyed keep-latest merge must converge to exactly the batch answer,
    and a final availableNow drain on the same checkpoint is a no-op."""
    import shutil as sh

    from retail_aws_etl_pipeline_spark.ingest import ingest_file
    from retail_aws_etl_pipeline_spark.lake import LakeLayout
    from retail_aws_etl_pipeline_spark.streaming.streams import gold_upsert_stream

    lake = LakeLayout(str(tmp_path / "lake"))
    ck = str(tmp_path / "ck")
    srcs = [
        "/root/reference/sample_csv_files/sales_2024-10-16.csv",
        "/root/reference/sample_csv_files/sales_2024-12-07.csv",
        "/root/reference/sample_csv_files/sales_2024-10-16.csv",  # redelivery
    ]
    # wave 0 exists before start; waves 1-2 land while the query runs
    f0 = tmp_path / "w0.csv"; sh.copy(srcs[0], f0)
    r0 = ingest_file(spark, str(f0), lake, archive=False, write_reject_csv=False)

    q = gold_upsert_stream(
        spark, lake, ck,
        available_now=False, max_files_per_trigger=1, processing_time="50 milliseconds",
    )
    try:
        q.processAllAvailable()
        # waves 1 and 2 land TOGETHER before the next drain: without the
        # rate limit they'd fold into one micro-batch; with
        # maxFilesPerTrigger=1 the source must take one silver file per
        # batch, so data-carrying batches == silver files.
        run_ids = []
        for i, src in enumerate(srcs[1:], start=1):
            f = tmp_path / f"w{i}.csv"; sh.copy(src, f)
            r = ingest_file(spark, str(f), lake, archive=False, write_reject_csv=False)
            run_ids.append(r.ingest_run_id)
        q.processAllAvailable()
        import glob as g

        n_files = len(g.glob(os.path.join(lake.processed, "**", "*.parquet"), recursive=True))
        data_batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert n_files >= 3  # three waves landed as at least one file each
        assert len(data_batches) == n_files, (
            f"rate limit violated: {len(data_batches)} batches for {n_files} files"
        )
    finally:
        q.stop()

    gold = spark.read.parquet(lake.gold)
    silver = spark.read.parquet(lake.processed)
    # convergence: gold == keep-latest over everything silver received
    assert gold.count() == silver.select("date", "transaction_id").distinct().count()
    assert gold.groupBy("date", "transaction_id").count().filter("count > 1").count() == 0
    # redelivered wave (same keys as wave 0) resolved to the LATEST run:
    # wave 0's run id is fully superseded, wave 2's owns those keys
    assert gold.filter(gold.ingest_run_id == run_ids[-1]).count() > 0
    assert gold.filter(gold.ingest_run_id == r0.ingest_run_id).count() == 0

    # same checkpoint, availableNow drain: nothing new -> no change
    q2 = gold_upsert_stream(spark, lake, ck)
    q2.awaitTermination()
    assert spark.read.parquet(lake.gold).count() == gold.count()


def _write_late_arrival_layout(spark, events_dir: str):
    """Three single-file arrival waves from sf0.001 events: (0) a sentinel
    holding only the newest row, (1) the rest of the newer half, (2) the
    whole older half, arriving LAST i.e. late. File mtimes and names order
    the waves for the streaming file source. Returns (older_df, max_us,
    n_not_late) where n_not_late = rows of waves 0-1.

    Why a sentinel wave: the engine applies the late filter with a
    watermark that lags ONE micro-batch behind the progress line (pinned
    here) — batch 1 is never filtered. Wave 0 sets max event time, wave 1
    absorbs the lag, so wave 2 is filtered by exactly
    max(ts) - delay."""
    import os
    import time

    # load_tables normalizes ts to canonical µs TIMESTAMP whatever the
    # files' physical layout; the integer-µs split sidesteps engine
    # restrictions on timestamp quantiles.
    df = load_tables(spark, SF_SMOKE, ["events"])["events"]
    med_us, max_us = (
        df.selectExpr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY unix_micros(ts)) AS m",
            "MAX(unix_micros(ts)) AS mx",
        )
        .collect()[0]
    )
    sentinel = df.filter(F.expr(f"unix_micros(ts) = {max_us}"))
    newer_rest = df.filter(F.expr(f"unix_micros(ts) > {med_us} AND unix_micros(ts) < {max_us}"))
    older = df.filter(F.expr(f"unix_micros(ts) <= {med_us}"))
    os.makedirs(events_dir, exist_ok=True)

    def _one_file(part_df, name):
        tmp = os.path.join(events_dir, f"_stage_{name}")
        part_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(events_dir, name)
        os.replace(os.path.join(tmp, src), dst)
        import shutil

        shutil.rmtree(tmp)
        return dst

    now = time.time()
    for i, (part, name) in enumerate(
        [(sentinel, "a_sentinel.parquet"), (newer_rest, "b_newer.parquet"), (older, "c_late.parquet")]
    ):
        f = _one_file(part, name)
        os.utime(f, (now - 300 + i * 100,) * 2)
    return older, max_us, sentinel.count() + newer_rest.count()


def test_watermark_lateness_sweep(spark, tmp_path):
    """VERDICT r5 #5 — dropped-late-row counts vs watermark delay, pinned
    EXACTLY: newer events arrive in micro-batches 0-1, the older half
    arrives late in batch 2 and is filtered by watermark
    max(ts) - delay. For every delay the kept count must equal the
    closed-form expectation (not-late rows + late rows inside the grace
    window), the engine's own numRowsDroppedByWatermark must account for
    the rest, and kept grows monotonically with the delay — from 'late
    wave fully dropped' at 0s to 'nothing late' once the delay spans the
    data. Late-row DROPS require the event-time column in the dedup
    subset (subset=("event_id", "ts")); the default subset only expires
    state. Numbers: SCALING.md §'Streaming soak & watermark lateness'."""
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        dedup_stream,
        events_stream,
    )

    events_dir = str(tmp_path / "events_late")
    older, max_us, n_not_late = _write_late_arrival_layout(spark, events_dir)
    n_late_wave = older.count()
    assert n_not_late + n_late_wave == 1000

    day_us = 86_400_000_000
    kept, dropped = {}, {}
    for delay_days in (0, 7, 16, 23, 31):
        delay = f"{delay_days} days"
        name = f"late_sweep_{delay_days}d"
        df = dedup_stream(
            events_stream(spark, events_dir), watermark=delay, subset=("event_id", "ts")
        )
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        kept[delay_days] = spark.sql(f"SELECT COUNT(*) c FROM {name}").collect()[0]["c"]
        dropped[delay_days] = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        # closed form: late row survives iff ts >= max(ts) - delay
        cutoff = max_us - delay_days * day_us
        expect = n_not_late + older.filter(F.expr(f"unix_micros(ts) >= {cutoff}")).count()
        assert kept[delay_days] == expect, (delay, kept[delay_days], expect)
        assert dropped[delay_days] == 1000 - expect, (delay, dropped)

    ks = [kept[d] for d in (0, 7, 16, 23, 31)]
    assert ks == sorted(ks)  # monotone in the delay
    assert kept[0] == n_not_late  # zero grace: the whole late wave dropped
    assert kept[16] > kept[7]  # grace reaching into the old half recovers rows
    assert kept[31] == 1000  # delay spans the data: nothing is late


def test_span_dedup_stream_converges_to_batch(spark, tmp_path):
    """Cross-batch span dedup: stream the documents table one file per
    micro-batch; the retained span set must equal the batch form's
    distinct-span set (keep-first semantics across batch boundaries), and
    a span seen in batch 1 must not re-emit from batch 3."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import token_chunks
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        run_stream_to_memory,
        span_dedup_stream,
    )
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    src = str(tmp_path / "docs_stream")
    # three slices -> three micro-batches with maxFilesPerTrigger=1; dup
    # spans exist across slices (doc texts share the small vocabulary)
    docs.filter("doc_id % 3 = 0").coalesce(1).write.parquet(src)
    docs.filter("doc_id % 3 = 1").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id % 3 = 2").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = run_stream_to_memory(span_dedup_stream(stream), "span_dedup_conv")
    got_spans = {r["chunk"] for r in got.select("chunk").collect()}
    want_spans = {
        r["chunk"] for r in token_chunks(docs).select("chunk").distinct().collect()
    }
    assert got_spans == want_spans
    # keep-first: exactly one row per distinct span survived
    assert got.count() == len(want_spans)
    n_all = token_chunks(docs).count()
    assert n_all > len(want_spans), "fixture must contain duplicate spans"


def test_scan_side_text_ops_stream_equals_batch(spark, tmp_path):
    """The scan-side text family (quality features, PII scrub, lang
    scores) is pure row-at-a-time Column algebra, so the SAME operators
    applied to a readStream frame must produce exactly the batch result
    on the same files — the property that lets the curation pipeline run
    identically in batch backfill and streaming ingest."""
    from retail_aws_etl_pipeline_spark.operators import textops as TX
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import run_stream_to_memory
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    def enrich(df):
        out = TX.scrub_pii(TX.quality_features(df))
        return out.select("doc_id", "n_tokens", "clean_text")

    batch = enrich(spark.read.parquet(src))
    stream = enrich(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    got = run_stream_to_memory(stream, "text_ops_conv")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and a


def test_near_dup_stream_emits_each_pair_exactly_once(spark, tmp_path):
    """Streamed incremental dedup == batch corpus self-join: three
    arrival waves through near_dup_stream must emit exactly the batch
    Jaccard ≥ 0.2 pair set, each pair once (later-arriving member's
    batch), with the gram index accumulating the whole corpus."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import jaccard_counts, shingles
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import near_dup_stream
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    src = str(tmp_path / "waves")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode("append").parquet(src)

    q = near_dup_stream(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(src),
        index_dir=str(tmp_path / "gram_index"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        (r["id_a"], r["id_b"], r["common"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    n_emitted = spark.read.parquet(str(tmp_path / "pairs")).count()
    assert n_emitted == len(got), "a pair was emitted more than once"

    grams = shingles(docs).persist()
    want = {
        (r["id_a"], r["id_b"], r["common"])
        for r in jaccard_counts(grams)
        .filter(F.col("common") * 5 >= (F.col("n_a") + F.col("n_b") - F.col("common")))
        .collect()
    }
    grams.unpersist()
    assert got == want and want
    # the index accumulated every doc's grams
    assert spark.read.parquet(str(tmp_path / "gram_index")).select(
        "doc_id"
    ).distinct().count() == docs.count()

    # RETRY simulation: foreachBatch is at-least-once — re-process the
    # LAST batch verbatim (its grams are already committed to the index,
    # the worst-case crash point). The own-doc anti-join guard plus the
    # batch-partitioned dynamic overwrite must leave both sinks
    # byte-identical: same pair multiset, no self-pairs, no duplicates.
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        make_near_dup_batch_processor,
    )

    last_batch = docs.filter(F.col("doc_id") % 3 == 2)
    process = make_near_dup_batch_processor(
        str(tmp_path / "gram_index"), str(tmp_path / "pairs")
    )
    process(last_batch, 2)
    replay = spark.read.parquet(str(tmp_path / "pairs"))
    assert replay.count() == len(got), "retry duplicated pairs"
    assert {
        (r["id_a"], r["id_b"], r["common"]) for r in replay.collect()
    } == want
    assert spark.read.parquet(str(tmp_path / "gram_index")).select(
        "doc_id"
    ).distinct().count() == docs.count()


def test_stream_static_join_converges(spark, tmp_path):
    """Stream-static join: the streaming events frame enriches against a
    STATIC dimension (broadcast per micro-batch) and must equal the
    batch join on the same files — the standard streaming-enrichment
    pattern (dim read is re-planned each batch, so dim updates between
    batches are picked up; here the dim is fixed so equality is exact)."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import run_stream_to_memory
    from tests.conftest import SF_SMOKE

    events = load_tables(spark, SF_SMOKE, ["events"])["events"]
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    dim = (
        events.select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 5).cast("long"))
    )

    def enrich(df):
        return (
            df.join(F.broadcast(dim), "user_id")
            .groupBy("segment", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    batch = enrich(spark.read.parquet(src))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    got = run_stream_to_memory(enrich(stream), "stream_static_conv", "complete")
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b and a


def test_stream_stream_join_within_watermark(spark, tmp_path):
    """Watermarked stream-stream inner join (clicks ⋈ purchases per user
    within 30 min): both sides watermarked, the join condition carries
    the time-range bound that lets the engine BOUND the join state. The
    emitted pairs must equal the batch time-range join over the same
    files."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import run_stream_to_memory
    from tests.conftest import SF_SMOKE

    events = load_tables(spark, SF_SMOKE, ["events"])["events"]
    src = str(tmp_path / "ev2")
    events.write.parquet(src)

    def split(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("buy_id"), F.col("ts").alias("buy_ts")
        )
        return clicks, buys

    cond = (
        (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
    )

    cb, bb = split(spark.read.parquet(src))
    want = sorted(
        (r["click_id"], r["buy_id"])
        for r in cb.join(bb, ["user_id"]).filter(cond).collect()
    )

    s = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    cs, bs = split(s)
    joined = (
        cs.withWatermark("click_ts", "2 hours")
        .join(
            bs.withWatermark("buy_ts", "2 hours"),
            (cs["user_id"] == bs["user_id"]) & cond,
        )
        .select("click_id", "buy_id")
    )
    got = run_stream_to_memory(joined, "stream_stream_conv")
    assert sorted((r["click_id"], r["buy_id"]) for r in got.collect()) == want
    assert want, "fixture must produce joined pairs"


def test_gram_index_compaction_preserves_dedup(spark, tmp_path):
    """Compacting the streaming gram index (batch partitions -> gram-
    clustered files) must not change ONE emitted pair: run two waves,
    compact, run a third wave against the compacted index, and compare
    the full pair set against the batch self-join."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.operators.dedup import jaccard_counts, shingles
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        compact_gram_index,
        make_near_dup_batch_processor,
    )
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, ["documents"])["documents"]
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "prs")
    process = make_near_dup_batch_processor(index_dir, pairs_dir)
    process(docs.filter("doc_id % 3 = 0"), 0)
    process(docs.filter("doc_id % 3 = 1"), 1)

    n = compact_gram_index(spark, index_dir, buckets=4)
    assert n == spark.read.parquet(index_dir).count()
    import glob

    assert len(glob.glob(f"{index_dir}/*.parquet")) <= 4

    process(docs.filter("doc_id % 3 = 2"), 2)
    got = {
        (r["id_a"], r["id_b"], r["common"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    grams = shingles(docs).persist()
    want = {
        (r["id_a"], r["id_b"], r["common"])
        for r in jaccard_counts(grams)
        .filter(F.col("common") * 5 >= (F.col("n_a") + F.col("n_b") - F.col("common")))
        .collect()
    }
    grams.unpersist()
    assert got == want and want


def test_probe_exif_both_endians_and_errors():
    """EXIF probe: II and MM payloads parse to the same logical fields;
    non-JPEG and exif-less JPEGs miss cleanly; declared-but-truncated
    APP1/TIFF structures raise (the family's truncation contract)."""
    import struct

    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import probe_exif

    def payload(mid):
        # the exact bytes synth_exif_media emits, built independently here
        # so the probe and the synth can't share a bug
        w, h = 16 + mid % 100, 9 + (mid * 7) % 100
        orient = 1 + mid % 8
        little = mid % 2 == 0
        e = "<" if little else ">"
        tiff = (b"II" if little else b"MM") + struct.pack(e + "HI", 42, 8)
        ifd = struct.pack(e + "H", 3)
        ifd += struct.pack(e + "HHI", 0x0100, 4, 1) + struct.pack(e + "I", w)
        ifd += struct.pack(e + "HHI", 0x0101, 4, 1) + struct.pack(e + "I", h)
        ifd += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(e + "H", orient) + b"\x00\x00"
        ifd += struct.pack(e + "I", 0)
        exif = b"Exif\x00\x00" + tiff + ifd
        return b"\xff\xd8\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif + b"\xff\xd9"

    assert probe_exif(payload(0)) == ("II", 1, 16, 9)
    assert probe_exif(payload(1)) == ("MM", 2, 17, 16)
    # a benign segment BEFORE the APP1 must be skipped by the marker walk
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    shifted = payload(2)
    assert probe_exif(shifted[:2] + app0 + shifted[2:]) == ("II", 3, 18, 23)

    assert probe_exif(b"GIF89a") == (None, None, None, None)
    assert probe_exif(b"\xff\xd8\xff\xd9") == (None, None, None, None)
    with pytest.raises(ValueError):
        probe_exif(b"\xff\xd8\xff\xe1\x00\xff" + b"Exif\x00\x00II")
    # bad byte-order mark inside a well-formed APP1 (TIFF starts at 12:
    # SOI 0-1, APP1 marker 2-3, length 4-5, 'Exif\0\0' 6-11)
    bad = bytearray(payload(0))
    bad[12:14] = b"XX"
    with pytest.raises(ValueError):
        probe_exif(bytes(bad))

    # Real-world encoder quirks before SOS (ADVICE r7): 0xFF fill bytes
    # between markers and length-less standalone markers (TEM 0x01,
    # RST0-7) must be walked over, not mis-read as segment lengths.
    body = payload(4)
    fill = body[:2] + b"\xff\xff\xff" + body[2:]  # FF-padding before APP1
    assert probe_exif(fill) == ("II", 5, 20, 37)
    tem = body[:2] + b"\xff\x01" + b"\xff\xd0" + body[2:]  # TEM + RST0
    assert probe_exif(tem) == ("II", 5, 20, 37)
    mixed = body[:2] + app0 + b"\xff\xff\xd1" + body[2:]  # APP0, fill, RST1
    assert probe_exif(mixed) == ("II", 5, 20, 37)


def test_feature_delta_stream_converges_and_survives_retry(spark, tmp_path):
    """Incremental feature maintenance: three order waves streamed through
    feature_delta_stream, a verbatim retry of the middle batch, and a
    mid-run delta compaction must all leave read_feature_snapshot equal
    to the one-shot batch aggregate (sum/sum/max are associative; the
    batch-partitioned sink makes the retry replace, not double-count)."""
    import pyspark.sql.functions as F

    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        compact_feature_deltas,
        feature_delta_stream,
        read_feature_snapshot,
    )
    from tests.conftest import SF_SMOKE

    orders = load_tables(spark, SF_SMOKE, ["orders"])["orders"]
    src = str(tmp_path / "waves")
    for i in range(3):
        orders.filter(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    delta_dir = str(tmp_path / "deltas")
    q = feature_delta_stream(
        spark.readStream.schema(orders.schema).option("maxFilesPerTrigger", "1").parquet(src),
        delta_dir=delta_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    want = {
        r["o_custkey"]: (r["n_orders"], r["cents_sum"], r["last_order_us"])
        for r in orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias("cents_sum"),
            F.max(F.unix_micros(F.col("o_orderdate"))).alias("last_order_us"),
        )
        .collect()
    }

    def snapshot():
        return {
            r["o_custkey"]: (r["n_orders"], r["cents_sum"], r["last_order_us"])
            for r in read_feature_snapshot(spark, delta_dir).collect()
        }

    assert snapshot() == want

    # at-least-once RETRY: re-write the middle batch's partial verbatim
    # under its own batch id — dynamic overwrite replaces the partition,
    # the snapshot must not change
    partial = (
        orders.filter(F.col("o_orderkey") % 3 == 1)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias("cents_sum"),
            F.max(F.unix_micros(F.col("o_orderdate"))).alias("last_order_us"),
        )
        .withColumn("__batch_id", F.lit(1))
    )
    (
        partial.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(delta_dir)
    )
    assert snapshot() == want

    # compaction folds batches without changing the snapshot, and a
    # post-compaction wave still lands correctly
    n = compact_feature_deltas(spark, delta_dir, buckets=4)
    assert n == len(want)
    assert snapshot() == want

    assert snapshot() == want


def test_streamed_customer_features_matches_oracle(spark):
    """The staged r9 window entry end-to-end: orders drained in disjoint
    micro-batch waves through feature_delta_stream, folded snapshot
    hash-equal to the DuckDB one-shot aggregate — the driver's three-way
    compare run locally. The query deletes its scratch delta dir before
    returning, so a successful collect here also proves the
    localCheckpoint lineage cut (a frame still backed by the removed
    parquet would fail at materialization, not at plan time)."""
    from retail_aws_etl_pipeline_spark.plans.analytics import (
        STREAMED_CUSTOMER_FEATURES_ORACLE,
        streamed_customer_features,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    got = streamed_customer_features(spark, SF_SMOKE)
    res = compare(got, STREAMED_CUSTOMER_FEATURES_ORACLE, SF_SMOKE)
    assert res["ok"], res
    assert res["spark_rows"] > 1


def test_frame_walk_rejects_hostile_bmp_sizes():
    """Payload-controlled BMP size fields: a declared size below the
    14-byte file header (0 in the wild) used to stop the frame walk
    advancing — the WARC negative-Content-Length infinite-loop class —
    and one past the buffer silently truncated the frame. Both must
    raise the documented ValueError (r13 hostile-binary battery)."""
    import struct

    import pytest

    from retail_aws_etl_pipeline_spark.operators import multimodal as MM

    def fake_bmp(declared: int) -> bytes:
        return b"BM" + struct.pack("<I", declared) + b"\x00" * 48

    def walk(buf: bytes):
        # mirror of the kernel's walk, exercised via the same helper the
        # kernel calls; the kernel-level guard is source-identical
        at = 0
        while at < len(buf):
            size = MM.bmp_file_size(buf, at)
            if size < 14 or at + size > len(buf):
                raise ValueError("reject")
            at += size

    with pytest.raises(ValueError):
        walk(fake_bmp(0))  # would loop forever unguarded
    with pytest.raises(ValueError):
        walk(fake_bmp(10_000))  # declares past the buffer
    walk(fake_bmp(54))  # sane size walks clean


def test_frame_sampler_kernel_rejects_zero_size_frame(spark):
    """End-to-end through the mapInPandas kernel: a zero-size BMP frame
    fails the job with the documented ValueError instead of hanging an
    executor forever."""
    import struct

    import pytest

    from retail_aws_etl_pipeline_spark.operators import multimodal as MM

    bad = b"BM" + struct.pack("<I", 0) + b"\x00" * 48
    media = spark.createDataFrame(
        [(1, "video", bytearray(bad))], "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="declares 0 bytes"):
        MM.sample_bmp_frames(media, every_n=1).collect()


# --- hostile probe-format battery (r14): webp/ogg/avif join BMP/WARC -------


def test_hostile_webp_payloads_reject():
    """Payload-controlled WebP structure: truncations at every layer,
    a lying keyframe start code, a wrong VP8L signature byte, and an
    unrecognized first chunk must all raise the documented ValueError —
    never parse garbage dims, never loop (r14 hostile-binary battery)."""
    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _webp_header_bytes,
        probe_image_dims,
    )

    good = _webp_header_bytes(321, 123, "vp8")
    for cut in (13, 19):  # inside magic / before first chunk payload
        with pytest.raises(ValueError):
            probe_image_dims(good[:cut])
    for variant, cut in (("vp8", 25), ("vp8l", 22), ("vp8x", 26)):
        with pytest.raises(ValueError):
            probe_image_dims(_webp_header_bytes(321, 123, variant)[:cut])
    # keyframe start code lied about (one flipped byte)
    bad_start = bytearray(good)
    bad_start[23] ^= 0xFF
    with pytest.raises(ValueError, match="start code"):
        probe_image_dims(bytes(bad_start))
    # VP8L signature byte wrong
    lossless = bytearray(_webp_header_bytes(10, 10, "vp8l"))
    lossless[20] = 0x30
    with pytest.raises(ValueError, match="VP8L signature"):
        probe_image_dims(bytes(lossless))
    # first chunk is something else entirely (ALPH before the bitstream)
    alph = bytearray(good)
    alph[12:16] = b"ALPH"
    with pytest.raises(ValueError, match="unrecognized WebP"):
        probe_image_dims(bytes(alph))
    # RIFF that is not WEBP falls through to unknown, no crash
    wave = bytearray(good)
    wave[8:12] = b"WAVE"
    assert probe_image_dims(bytes(wave))[0] == "unknown"


def test_hostile_ogg_payloads_reject():
    """OGG page-header lies: unsupported page version, a segment table
    whose declared length (nseg up to 255) runs past the buffer,
    truncated identification packets, unknown codecs — all reject."""
    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _ogg_header_bytes,
        probe_audio_meta,
    )

    good = _ogg_header_bytes("opus", 48000, 2)
    with pytest.raises(ValueError, match="no page header"):
        probe_audio_meta(good[:26])
    ver = bytearray(good)
    ver[4] = 1
    with pytest.raises(ValueError, match="page version"):
        probe_audio_meta(bytes(ver))
    # nseg lies: claims 255 segment-table entries in a short buffer
    nseg = bytearray(good)
    nseg[26] = 255
    with pytest.raises(ValueError, match="segment table"):
        probe_audio_meta(bytes(nseg))
    # identification packet truncated mid-field: cut one byte short of
    # the probe's required p+16 (the packets carry fields past +16, so
    # trimming trailing bytes alone is a legal parse)
    for codec, matcher in (("opus", "OpusHead"), ("vorbis", "vorbis")):
        full = _ogg_header_bytes(codec, 44100, 1)
        p = 27 + full[26]
        with pytest.raises(ValueError, match=matcher):
            probe_audio_meta(full[: p + 15])
    # unknown first packet codec
    unk = bytearray(good)
    p = 27 + good[26]
    unk[p : p + 8] = b"XXXXHead"
    with pytest.raises(ValueError, match="unrecognized first packet"):
        probe_audio_meta(bytes(unk))


def test_hostile_avif_box_walks_reject():
    """ISO-BMFF size-field lies on the still-image walk: a box size
    below the 8-byte header (the BMP zero-size infinite-loop class), a
    size past the buffer, an endianness-lied size (little-endian write
    of a sane big-endian value = huge), a truncated largesize header,
    a truncated ispe, and a brand with no ispe at all — every one the
    documented ValueError; size==0 (to-end) stays a clean parse."""
    import struct

    import pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _avif_header_bytes,
        probe_image_dims,
    )

    good = _avif_header_bytes(640, 480, b"avif")
    assert probe_image_dims(good) == ("avif", 640, 480)
    ftyp_len = 20  # box(ftyp, brand + minor + compatible) == 8 + 12

    def with_meta_size(raw: bytes) -> bytes:
        return good[:ftyp_len] + raw + good[ftyp_len + 4 :]

    with pytest.raises(ValueError, match="declares"):
        probe_image_dims(with_meta_size(struct.pack(">I", 4)))  # < header
    with pytest.raises(ValueError, match="declares"):
        probe_image_dims(with_meta_size(struct.pack(">I", 1 << 24)))  # past end
    # endianness lie: the meta box's true size written little-endian
    true_size = struct.unpack(">I", good[ftyp_len : ftyp_len + 4])[0]
    with pytest.raises(ValueError, match="declares"):
        probe_image_dims(with_meta_size(struct.pack("<I", true_size)))
    # largesize marker with the 8 extra bytes missing
    with pytest.raises(ValueError, match="largesize"):
        probe_image_dims(good[:ftyp_len] + struct.pack(">I", 1) + b"meta")
    # truncated ispe payload (declares 12-byte body, buffer ends early)
    with pytest.raises(ValueError):
        probe_image_dims(good[:-4])
    # well-formed walk with no ispe anywhere
    no_ispe = good[:ftyp_len] + good[ftyp_len:].replace(b"ispe", b"xspe")
    with pytest.raises(ValueError, match="no ispe"):
        probe_image_dims(no_ispe)
    # size==0 = to-end-of-container: legal, parses clean
    to_end = bytearray(good)
    to_end[ftyp_len : ftyp_len + 4] = struct.pack(">I", 0)
    assert probe_image_dims(bytes(to_end)) == ("avif", 640, 480)


def test_hostile_probe_payload_fails_kernel_not_hangs(spark):
    """End-to-end through the mapInPandas probe kernel: one hostile WebP
    in a batch fails the job with the documented ValueError instead of
    emitting garbage dims or hanging an executor (the BMP/WARC
    reject-the-shard discipline)."""
    import pytest

    from retail_aws_etl_pipeline_spark.operators import multimodal as MM

    bad = bytearray(MM._webp_header_bytes(64, 64, "vp8"))
    bad[23] ^= 0xFF  # lie about the keyframe start code
    media = spark.createDataFrame(
        [(1, "image", bytearray(bad))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="start code"):
        MM.probe_dims(media).collect()
