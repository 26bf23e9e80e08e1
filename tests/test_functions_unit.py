"""Unit + property tests for the scalar operator layer."""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.functions.numeric import clean_currency, clean_quantity
from retail_aws_etl_pipeline_spark.functions.timestamps import (
    EXTENDED_PATTERNS,
    REFERENCE_PATTERNS,
    parse_timestamp,
)
from retail_aws_etl_pipeline_spark.schema import build_index_map, normalize_header_token
from retail_aws_etl_pipeline_spark.sources.sniff import sniff_delimiter


# --- header normalization (P16) -------------------------------------------


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Transaction ID", "transaction_id"),
        ("transactionid", "transaction_id"),
        ("TXN_ID", "transaction_id"),
        ("storeid", "store_id"),
        ("Shop-Id", "store_id"),
        ("product_id", "item_id"),
        ("qty", "quantity"),
        ("QuantitySold", "quantity"),
        ("Unit-Price", "unit_price"),
        ("price", "unit_price"),
        ("amount", "revenue"),
        ("revenueamount", "revenue"),
        ("discount_code", "discount_code"),  # unknown passes through
        ("revenue", "revenue"),
    ],
)
def test_normalize_header_token(raw, expected):
    assert normalize_header_token(raw) == expected


def test_index_map_shuffled_extra_missing():
    header = "item_id,revenue,store_id,transaction_id,discount_code,customer_id,item_category,quantity,payment_method,timestamp,unit_price".split(",")
    m = build_index_map(header)
    assert m["item_id"] == 0 and m["transaction_id"] == 3 and m["unit_price"] == 10
    assert "discount_code" not in m  # extra ignored
    m2 = build_index_map(["transaction_id", "store_id"])
    assert "quantity" not in m2


# --- delimiter sniffing (S5, bug-fixed) -----------------------------------


@pytest.mark.parametrize(
    "text,expected",
    [
        ("a,b,c\n1,2,3", ","),
        ("a;b;c\n1;2;3", ";"),
        ("a|b|c\n1|2|3", "|"),
        ("a\tb\tc\n1\t2\t3", "\t"),
        ("single_column\nvalue", ","),  # nothing matches -> default
    ],
)
def test_sniff_delimiter(text, expected):
    assert sniff_delimiter(text) == expected


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_sniff_never_raises(text):
    assert sniff_delimiter(text) in {",", ";", "|", "\t"}


# --- timestamp cascade (P8) -----------------------------------------------

TS_CASES = [
    ("2024-10-16 14:30:25", datetime(2024, 10, 16, 14, 30, 25)),
    ("2024-10-16 9:05", datetime(2024, 10, 16, 9, 5)),
    ("2024/10/16 14:30:25", datetime(2024, 10, 16, 14, 30, 25)),
    ("10/16/2024 14:30", datetime(2024, 10, 16, 14, 30)),
    ("10/16/2024", datetime(2024, 10, 16)),
    ("2024-10-16", datetime(2024, 10, 16)),
    ("2024/10/16", datetime(2024, 10, 16)),
    ("20241016 143025", datetime(2024, 10, 16, 14, 30, 25)),
    ("20241016", datetime(2024, 10, 16)),
    # rejected by the reference cascade:
    ("2025-06-12T05:03:38", None),
    ("07-12-24 20:23", None),
    ("09/03/2025 06:28AM", None),
    ("", None),
    ("2024/02/30 25:61", None),  # regex-passes, parse nulls (impossible)
    ("N/A", None),
]


def _parse_with(spark, values, patterns):
    df = spark.createDataFrame([(v,) for v in values], ["ts_raw"])
    return [
        r["parsed"]
        for r in df.select(parse_timestamp("ts_raw", patterns).alias("parsed")).collect()
    ]


def test_reference_cascade(spark):
    got = _parse_with(spark, [c[0] for c in TS_CASES], REFERENCE_PATTERNS)
    for (raw, want), actual in zip(TS_CASES, got):
        assert actual == want, (raw, actual, want)


def test_extended_cascade(spark):
    cases = [
        ("2025-06-12T05:03:38", datetime(2025, 6, 12, 5, 3, 38)),
        ("07-12-24 20:23", datetime(2024, 12, 7, 20, 23)),
        ("09/03/2025 06:28AM", datetime(2025, 9, 3, 6, 28)),
        ("10/18/2025 01:55PM", datetime(2025, 10, 18, 13, 55)),
        # MM/dd precedence holds; dd/MM catches month>12 only
        ("03/04/2025", datetime(2025, 3, 4)),
        ("25/12/2024", datetime(2024, 12, 25)),
        ("garbage", None),
    ]
    got = _parse_with(spark, [c[0] for c in cases], EXTENDED_PATTERNS)
    for (raw, want), actual in zip(cases, got):
        assert actual == want, (raw, actual, want)


@given(st.text(alphabet="0123456789-/: TAMP", max_size=25))
@settings(max_examples=30, deadline=None)
def test_cascade_never_raises(spark, text):
    # any input either parses or nulls — never throws (docs/timestamp_parsing.md:3-5)
    got = _parse_with(spark, [text], EXTENDED_PATTERNS)
    assert len(got) == 1


# --- currency / quantity cleaning (P9, P10) --------------------------------


def test_clean_currency_and_quantity(spark):
    cases = [
        ("$446.23", 446.23),
        ("$1,413.15", 1413.15),
        ("(5.00)", -5.0),
        ("N/A", None),
        ("", None),
        ("12.5", 12.5),
        ("USD 99.99", 99.99),
        (None, None),
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], ["x"])
    got = [r["c"] for r in df.select(clean_currency("x").alias("c")).collect()]
    assert got == [w for _, w in cases]

    qcases = [("3", 3), ("12 pcs", 12), ("N/A", None), ("", None), ("-2", -2)]
    dfq = spark.createDataFrame([(v,) for v, _ in qcases], ["x"])
    gotq = [r["c"] for r in dfq.select(clean_quantity("x").alias("c")).collect()]
    assert gotq == [w for _, w in qcases]


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(lambda f: round(f, 2)))
@settings(max_examples=20, deadline=None)
def test_currency_roundtrip(spark, value):
    # formatting a 2dp number with $ and thousands separators round-trips
    formatted = "${:,.2f}".format(value) if value >= 0 else "(${:,.2f})".format(-value)
    df = spark.createDataFrame([(formatted,)], ["x"])
    got = df.select(clean_currency("x").alias("c")).collect()[0]["c"]
    assert got == pytest.approx(value, abs=1e-9)


# --- determinism helpers: partition-layout invariance ----------------------


@given(st.integers(min_value=1, max_value=12))
@settings(max_examples=8, deadline=None)
def test_dec_sum_partition_invariant(spark, n_parts):
    """dec_sum must be bit-identical however the data is partitioned —
    the property the oracle comparison relies on."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.plans.queries import dec_sum

    df = spark.range(2000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 0.01 + 0.005).alias("v"),
    )
    result = {
        r["k"]: r["s"]
        for r in df.repartition(n_parts).groupBy("k").agg(dec_sum(F.col("v")).alias("s")).collect()
    }
    baseline = {
        r["k"]: r["s"]
        for r in df.coalesce(1).groupBy("k").agg(dec_sum(F.col("v")).alias("s")).collect()
    }
    assert result == baseline  # exact ==, not approx
