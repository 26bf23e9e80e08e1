"""Proof battery for the STAGED r18 seeds built at r15:
streamed_cms_topk_report (the count-min twin of the streamed-HLL
registry entry), token_drift_psi_report (quantized-PSI drift monitor),
tiff_dims_probe (the probe family's one dual-endian header walk),
source_priority_dedup_report (the keep-the-trusted-copy dedup policy
census), and streamed_bottomk_quantile_report (the quantile member
completing the streamed sketch triple). Same discipline as every staged
predecessor: DuckDB oracle compares at two gate scales, stream==batch
verbatim-twin pins, handcrafted semantics, pure-Python mirrors,
hostile-input batteries, and plan gates."""

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


# ---------------------------------------------------------------------------
# tiff_dims_probe + source_priority_dedup_report (seeds #3/#4, built r15)
# ---------------------------------------------------------------------------

MORE_PAIRS = [
    ("tiff_dims_probe", E.tiff_dims_probe, E.TIFF_DIMS_ORACLE),
    (
        "source_priority_dedup_report",
        E.source_priority_dedup_report,
        E.SOURCE_PRIORITY_DEDUP_ORACLE,
    ),
]


@pytest.mark.parametrize("name,fn,oracle", MORE_PAIRS, ids=[p[0] for p in MORE_PAIRS])
@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_more_seed_pairs_match_oracle(spark, name, fn, oracle, sf_dir):
    r = compare(fn(spark, sf_dir), oracle, sf_dir)
    assert r["ok"], (name, sf_dir, r)


def test_tiff_four_corner_layouts_parse():
    """All four layout corners (II/MM × SHORT/LONG) parse to the same
    dims — and under 'MM' the SHORT value sits in the HIGH half of the
    value slot, where an endian-naive low-half read would return the
    zero padding instead (the trap the dual-endian walk exists for)."""
    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _tiff_header_bytes,
        probe_image_dims,
    )

    for endian in ("little", "big"):
        for wide in (False, True):
            buf = _tiff_header_bytes(640, 480, endian, wide)
            assert probe_image_dims(buf) == ("tiff", 640, 480), (endian, wide)
    # the misparse trap, demonstrated: naive low-half read of the MM
    # SHORT slot yields 0 — the correct parser must NOT return that
    mm_short = _tiff_header_bytes(640, 480, "big", False)
    e = 8 + 2 + 12  # second entry = ImageWidth
    naive = int.from_bytes(mm_short[e + 10 : e + 12], "big")  # low half
    assert naive == 0  # padding — what a left-justification-blind reader sees


def test_tiff_hostile_inputs_raise_or_unknown():
    """Truncations inside a recognized TIFF must RAISE (never misreport);
    an unrecognized byte-order marker is 'unknown'; an IFD whose entry
    count points past EOF raises; an unsupported dims type raises."""
    import pytest as _pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _tiff_header_bytes,
        probe_image_dims,
    )

    good = _tiff_header_bytes(33, 44, "little", False)
    assert probe_image_dims(good) == ("tiff", 33, 44)
    assert probe_image_dims(b"IX*\x00" + good[4:])[0] == "unknown"
    with _pytest.raises(ValueError):
        probe_image_dims(good[:6])  # no IFD offset
    with _pytest.raises(ValueError):
        probe_image_dims(good[:12])  # IFD entries beyond EOF
    # entry count lies: claims 200 entries in a 4-entry buffer
    lying = bytearray(good)
    lying[8:10] = (200).to_bytes(2, "little")
    with _pytest.raises(ValueError):
        probe_image_dims(bytes(lying))
    # unsupported dims type (RATIONAL=5) must raise, not misread
    bad_type = bytearray(good)
    e = 8 + 2 + 12  # ImageWidth entry
    bad_type[e + 2 : e + 4] = (5).to_bytes(2, "little")
    with _pytest.raises(ValueError):
        probe_image_dims(bytes(bad_type))
    # IFD offset pointing INSIDE the 8-byte header (e.g. 0) is
    # structurally invalid — must raise, never parse header bytes as
    # IFD entries (ADVICE r15)
    for bogus in (0, 4, 7):
        inside = bytearray(good)
        inside[4:8] = bogus.to_bytes(4, "little")
        with _pytest.raises(ValueError):
            probe_image_dims(bytes(inside))


def test_source_priority_census_handcrafted(spark, tmp_path):
    """Handcrafted cross-source dup groups pin the policy: the
    lexicographically-smallest source wins each md5 group (ties to the
    smallest doc_id), losers count as dropped — cross-source losses
    separately — and NULL source/text rows are excluded entirely."""
    rows = [
        # group X: copies in a (winner), b, c -> b and c each lose cross
        (0, "same body one", "en", "a", 13),
        (1, "same body one", "en", "b", 13),
        (2, "same body one", "en", "c", 13),
        # group Y: two copies BOTH in source b -> same-source drop
        (3, "same body two", "en", "b", 13),
        (4, "same body two", "en", "b", 13),
        # singletons
        (5, "unique alpha", "en", "a", 12),
        (6, "unique beta", "en", "c", 11),
        # excluded rows
        (7, "same body one", "en", None, 13),
        (8, None, "en", "a", 0),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    got = {
        r["source"]: (
            r["n_docs"], r["n_in_dup_groups"], r["n_kept"],
            r["n_dropped"], r["n_lost_cross_source"],
        )
        for r in E.source_priority_dedup_report(spark, out).collect()
    }
    assert got == {
        "a": (2, 1, 2, 0, 0),
        "b": (3, 3, 1, 2, 1),
        "c": (2, 1, 1, 1, 1),
    }


def test_source_priority_conservation(spark):
    """On the real corpus: kept + dropped == docs per source, one winner
    per group corpus-wide, and cross-source losses never exceed drops."""
    rows = E.source_priority_dedup_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
        assert r["n_lost_cross_source"] <= r["n_dropped"]
        assert r["n_in_dup_groups"] >= r["n_dropped"]


# ---------------------------------------------------------------------------
# streamed_bottomk_quantile_report (seed #5, built r15)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_ORACLE])
def test_streamed_bottomk_matches_the_shared_oracle(spark, sf_dir):
    r = compare(
        E.streamed_bottomk_quantile_report(spark, sf_dir),
        E.STREAMED_BOTTOMK_ORACLE,
        sf_dir,
    )
    assert r["ok"], (sf_dir, r)


def test_streamed_bottomk_is_the_verbatim_batch_twin(spark):
    """The streamed entry shares hash_sample_quantile_report's oracle
    string VERBATIM (the third verbatim twin after the hourly rollup
    and the streamed CMS), and the two frames are row-identical —
    bottom-k mergeability (re-take over per-batch samples) IS the
    one-shot sample."""
    assert E.STREAMED_BOTTOMK_ORACLE is E.HASH_SAMPLE_ORACLE
    a = [tuple(r) for r in E.hash_sample_quantile_report(spark, SF_SMOKE).collect()]
    b = [
        tuple(r)
        for r in E.streamed_bottomk_quantile_report(spark, SF_SMOKE).collect()
    ]
    assert a == b and a


def test_streamed_bottomk_snapshot_and_retry(spark, tmp_path):
    """Kernel-level stream==batch: three arrival waves through
    bottomk_sample_stream, snapshot == the one-shot bottom-k sample
    bit-identically; then a VERBATIM retry of the last wave — bottom-k
    is not idempotent under duplication (copies would displace
    legitimate members), so the retry proves the batch-partitioned
    dynamic overwrite keeps storage exactly-once."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sketch import bottomk_sample
    from retail_aws_etl_pipeline_spark.session import load_tables
    from retail_aws_etl_pipeline_spark.streaming.streams import (
        bottomk_sample_stream,
        make_bottomk_batch_processor,
        read_bottomk_snapshot,
    )

    li = load_tables(spark, SF_SMOKE, ["lineitem"])["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    src = str(tmp_path / "waves")
    for i in range(3):
        li.filter(
            F.pmod(F.coalesce(F.col("l_orderkey"), F.lit(0)), F.lit(3)) == i
        ).coalesce(1).write.mode("append").parquet(src)

    delta = str(tmp_path / "bk_delta")
    q = bottomk_sample_stream(
        spark.readStream.schema(li.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        E.HASH_SAMPLE_ROW_KEY_SQL,
        "l_extendedprice",
        delta_dir=delta,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    batch = [
        (r["h"], r["v"])
        for r in bottomk_sample(
            li.filter(F.col("l_extendedprice").isNotNull()),
            F.expr(E.HASH_SAMPLE_ROW_KEY_SQL),
            F.col("l_extendedprice"),
        ).collect()
    ]
    snap = [
        (r["h"], r["v"]) for r in read_bottomk_snapshot(spark, delta).collect()
    ]
    assert snap == batch and snap

    # verbatim retry of the LAST wave: the partition replaces itself
    make_bottomk_batch_processor(
        E.HASH_SAMPLE_ROW_KEY_SQL, "l_extendedprice", delta
    )(
        li.filter(
            F.pmod(F.coalesce(F.col("l_orderkey"), F.lit(0)), F.lit(3)) == 2
        ),
        2,
    )
    again = [
        (r["h"], r["v"]) for r in read_bottomk_snapshot(spark, delta).collect()
    ]
    assert again == batch
