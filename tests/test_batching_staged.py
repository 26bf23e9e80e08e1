"""STAGED training-batch construction audits (plans/extensions.py tail).

The registry sits at its 150 cap, so these two operators follow the
streamed_customer_features pattern: module-level oracle string + full
local proof now, registration deferred to a rotation round with a free
window slot / cap replacement. The proofs here are the same three the
driver would run — DuckDB oracle compare (at sf0.01, the driver's gate
scale: sf0.001's 50 docs make NTILE(64) degenerate to one-doc batches
and zero waste), structural invariants, and executed-plan shape gates —
plus a pure-Python NTILE mirror for the padding-waste kernel.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_aws_etl_pipeline_spark.plans.extensions import (
    CORPUS_SHUFFLE_ORACLE,
    LENGTH_BUCKET_PADDING_ORACLE,
    PADDING_N_BATCHES,
    SHUFFLE_N_BATCHES,
    corpus_shuffle_batches,
    length_bucket_padding_stats,
    padding_waste,
)
from tests.conftest import SF_ORACLE
from tests.oracle import compare


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_all_windows_partitioned(plan: str) -> None:
    import re

    for ln in plan.splitlines():
        if re.search(r"\bWindow \[", ln):
            assert len(re.findall(r"\], \[", ln)) >= 2, (
                f"unpartitioned (single-task) Window: {ln.strip()[:200]}"
            )


def test_length_bucket_padding_matches_oracle(spark):
    got = length_bucket_padding_stats(spark, SF_ORACLE)
    res = compare(got, LENGTH_BUCKET_PADDING_ORACLE, SF_ORACLE)
    assert res["ok"], res


def test_length_bucket_padding_invariants(spark):
    row = length_bucket_padding_stats(spark, SF_ORACLE).collect()[0]
    # slots reconcile: padded slots = real tokens + waste, per strategy.
    assert row.slots_arrival == row.tokens_total + row.waste_arrival
    assert row.slots_sorted == row.tokens_total + row.waste_sorted
    # EMPIRICAL for this corpus (n >> k): minimality of sorted chunking
    # is only a theorem for equal batch sizes — see the hypothesis test
    # below for the NTILE ±1-slack counterexample. On 500 docs over 64
    # batches the boundary slack is noise and the sort must win.
    assert row.waste_sorted <= row.waste_arrival
    assert 0 <= row.savings_ppm <= 1_000_000
    # The audit is only interesting if the corpus has length variance at
    # all — guard that sf0.01 actually exercises the non-degenerate path.
    assert row.waste_arrival > 0


def test_length_bucket_padding_plan_shape(spark):
    plan = _plan(length_bucket_padding_stats(spark, SF_ORACLE))
    _assert_all_windows_partitioned(plan)
    # Rank-offset joins and the one-row assembly stay broadcast.
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


@pytest.mark.parametrize(
    "tokens,k",
    [
        ([5, 1, 9, 3, 3, 7, 2, 8, 4, 6, 1, 1], 4),
        ([10] * 7, 3),  # all ties: zero waste both ways
        ([3, 1, 4], 5),  # n < k: one-doc batches, zero waste
        (list(range(1, 41)) + [400, 1, 400, 1], 8),  # outlier tail
    ],
)
def test_padding_waste_matches_python_mirror(spark, tokens, k):
    """padding_waste vs a pure-Python NTILE mirror, arrival + sorted."""

    def mirror(vals):
        n = len(vals)
        big, small = divmod(n, k)
        sizes = [big + 1] * small + [big] * (k - small)
        slots = waste = 0
        i = 0
        for size in sizes:
            if size == 0:
                continue
            batch = vals[i : i + size]
            i += size
            slots += max(batch) * len(batch)
            waste += max(batch) * len(batch) - sum(batch)
        return slots, waste

    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    got_a = padding_waste(base, [F.asc("doc_id")], k).collect()[0]
    got_s = padding_waste(
        base, [F.asc("n_tokens"), F.asc("doc_id")], k
    ).collect()[0]
    assert (got_a.slots, got_a.waste) == mirror(tokens)
    assert (got_s.slots, got_s.waste) == mirror(sorted(tokens))


def test_corpus_shuffle_batches_matches_oracle(spark):
    got = corpus_shuffle_batches(spark, SF_ORACLE)
    res = compare(got, CORPUS_SHUFFLE_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == SHUFFLE_N_BATCHES


def test_corpus_shuffle_batches_invariants(spark):
    rows = corpus_shuffle_batches(spark, SF_ORACLE).collect()
    sizes = [r.n_docs for r in rows]
    # NTILE guarantee: batch sizes differ by at most one, nothing lost.
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == 500  # sf0.01 documents
    for r in rows:
        assert 1 <= r.n_langs <= r.n_docs
        assert 1 <= r.n_sources <= r.n_docs
        assert r.top_source_docs <= r.n_docs
        # The audit's point: a hash shuffle must break source clumping.
        # sf0.01 has few sources over 15-16 docs/batch — a failed shuffle
        # would put all ~16 docs in one source.
        assert r.top_source_docs < r.n_docs


def test_corpus_shuffle_batches_plan_shape(spark):
    plan = _plan(corpus_shuffle_batches(spark, SF_ORACLE))
    _assert_all_windows_partitioned(plan)
    # The keyed sub-aggregate formulation must not plan a multi-distinct
    # Expand (3x row blowup on the widest frame at scale).
    assert "Expand" not in plan


def test_tokenizer_fertility_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        TOKENIZER_FERTILITY_ORACLE,
        tokenizer_fertility_by_lang,
    )

    got = tokenizer_fertility_by_lang(spark, SF_ORACLE)
    res = compare(got, TOKENIZER_FERTILITY_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] >= 2  # multilingual corpus


def test_tokenizer_fertility_invariants(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        tokenizer_fertility_by_lang,
    )

    rows = tokenizer_fertility_by_lang(spark, SF_ORACLE).collect()
    assert sum(r.n_docs for r in rows) == 500  # sf0.01 documents
    for r in rows:
        # The regex tokenizer splits words further, never merges across
        # whitespace: every whitespace token yields >= 1 regex token
        # (empty-string tokens yield 0, but the corpus has none).
        assert r.n_word_tokens >= r.n_ws_tokens
        assert r.fertility_ppm >= 1_000_000
        # Tokens are at least 1 char.
        assert r.chars_per_token_ppm >= 1_000_000


def test_tokenizer_fertility_plan_is_one_exchange(spark):
    """One scan-side projection + one keyed aggregate: the executed plan
    must contain exactly one shuffle exchange (the lang groupBy; the
    presentation sort rides AQE's reuse of it or a tiny second one) and
    no join at all."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        tokenizer_fertility_by_lang,
    )

    plan = _plan(tokenizer_fertility_by_lang(spark, SF_ORACLE))
    assert "Join" not in plan
    # partial (map-side) aggregation must be present before the exchange
    assert "HashAggregate" in plan


def test_quality_by_length_decile_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        QUALITY_LENGTH_DECILE_ORACLE,
        quality_by_length_decile,
    )

    got = quality_by_length_decile(spark, SF_ORACLE)
    res = compare(got, QUALITY_LENGTH_DECILE_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == 10


def test_quality_by_length_decile_invariants(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        quality_by_length_decile,
    )

    rows = quality_by_length_decile(spark, SF_ORACLE).orderBy(
        "length_decile"
    ).collect()
    assert sum(r.n_docs for r in rows) == 500
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    for r in rows:
        assert r.min_tokens <= r.max_tokens
        assert 0 < r.mean_quality <= 1_000_000
    # Deciles are length-ordered. Ties can straddle a decile boundary
    # (max of one decile == min of the next), so assert the non-strict
    # form that holds under ties: per-decile minima are monotone.
    mins = [r.min_tokens for r in rows]
    assert mins == sorted(mins)
    # The audit's reason to exist: the TTR quality key falls with length
    # on any natural corpus — the first decile (shortest docs) must score
    # higher than the last (longest).
    assert rows[0].mean_quality > rows[-1].mean_quality


def test_quality_by_length_decile_plan_shape(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        quality_by_length_decile,
    )

    plan = _plan(quality_by_length_decile(spark, SF_ORACLE))
    _assert_all_windows_partitioned(plan)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_corpus_shuffle_new_salt_is_a_fresh_epoch(spark):
    """The salt is the epoch knob: same salt -> bit-identical batches
    (replay idempotence); a new salt -> the same balanced batch sizes
    but a genuinely different assignment (fresh training order)."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        corpus_shuffle_batches,
    )

    e1 = corpus_shuffle_batches(spark, SF_ORACLE).collect()
    e1_again = corpus_shuffle_batches(spark, SF_ORACLE).collect()
    assert sorted(map(tuple, e1)) == sorted(map(tuple, e1_again))

    e2 = corpus_shuffle_batches(spark, SF_ORACLE, salt="epoch2").collect()
    # Size multiset is a structural NTILE guarantee, salt-independent.
    assert sorted(r.n_docs for r in e1) == sorted(r.n_docs for r in e2)
    # But the assignment must move: with 500 docs over 32 batches, two
    # independent permutations agreeing on every batch's (source-count,
    # lang-count) profile is astronomically unlikely — if this ever
    # fails, the salt is not reaching the shuffle key.
    assert sorted(map(tuple, e1)) != sorted(map(tuple, e2))


def test_sorted_chunking_minimizes_padding_hypothesis():
    """The minimality behind the padding audit, fuzzed in pure Python —
    and scoped to where it is actually a theorem. Writing this test
    UNSCOPED found a real overclaim: with NTILE's unequal (±1) batch
    sizes, sorted-contiguous chunking does NOT always beat the arrival
    order — hypothesis produced tokens=[2,2,1], k=2, where identity
    batches [2,2],[1] pad zero while sorted [1,2],[2] pads one (the
    larger batch is pinned FIRST, i.e. onto the small values, and the
    boundary misaligns). The exchange argument needs equal group sizes,
    so: (a) for k | n, sorted is minimal vs every random order tried;
    (b) for general n, the operator's savings_ppm CASE guard (emit 0
    when waste_arrival <= waste_sorted) is load-bearing, and the
    corpus-level invariant test is empirical, not structural."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def waste(vals, k):
        n = len(vals)
        big, small = divmod(n, k)
        sizes = [big + 1] * small + [big] * (k - small)
        total, i = 0, 0
        for size in sizes:
            if size == 0:
                continue
            batch = vals[i : i + size]
            i += size
            total += max(batch) * len(batch) - sum(batch)
        return total

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=200),
        st.integers(min_value=1, max_value=64),
        st.randoms(use_true_random=False),
    )
    def check(tokens, k, rng):
        if len(tokens) % k == 0:  # the theorem's actual hypothesis
            shuffled = list(tokens)
            rng.shuffle(shuffled)
            assert waste(sorted(tokens), k) <= waste(shuffled, k)

    check()

    # The documented counterexample stays pinned so the scoping is
    # never silently "simplified" back to the unscoped claim.
    assert waste(sorted([2, 2, 1]), 2) > waste([2, 2, 1], 2)


def test_staged_ppm_division_boundary_operands(spark):
    """The staged x1000-twice remainder-corrected division (gini /
    padding / fertility sites) vs Python's exact floor(n*1e6/d) at the
    operand boundaries the overflow class bit at: d near the 9.2e15
    envelope edge, n=d-1 (max remainder), n=0, d=1, and the historical
    gini magnitudes. Spark evaluates the exact expression the sites
    inline; Python is exact by arbitrary precision."""
    cases = [
        (0, 1),
        (1, 1),
        (999_999, 1_000_000),
        (9_199_999_999_999_998, 9_199_999_999_999_999),  # near the envelope
        (1, 9_199_999_999_999_999),
        (59_999_999, 120_000_000_000_000),  # gini-scale magnitudes
        (1_234_567_890_123, 9_876_543_210_987),
    ]
    df = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r.n, r.d): r.ppm
        for r in df.selectExpr(
            "n", "d", "(n * 1000 div d) * 1000 + ((n * 1000 % d) * 1000) div d AS ppm"
        ).collect()
    }
    for n, d in cases:
        assert got[(n, d)] == (n * 1_000_000) // d, (n, d, got[(n, d)])


# --- staged WebP probe (multimodal family) ---


def test_webp_probe_handcrafted_payloads():
    """probe_image_dims on handcrafted WebP payloads: all three bitstream
    flavors, the 14-bit field boundary, and every truncation/garbage
    class raising rather than misreporting."""
    import pytest as _pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _webp_header_bytes,
        probe_image_dims,
    )

    for variant in ("vp8", "vp8l", "vp8x"):
        assert probe_image_dims(_webp_header_bytes(321, 123, variant)) == (
            "webp", 321, 123,
        ), variant
    # 14-bit boundary for the narrow-field flavors; 24-bit for VP8X.
    assert probe_image_dims(_webp_header_bytes(16383, 16383, "vp8")) == (
        "webp", 16383, 16383,
    )
    assert probe_image_dims(_webp_header_bytes(16383, 16383, "vp8l")) == (
        "webp", 16383, 16383,
    )
    assert probe_image_dims(_webp_header_bytes(100000, 70000, "vp8x")) == (
        "webp", 100000, 70000,
    )
    for variant in ("vp8", "vp8l", "vp8x"):
        full = _webp_header_bytes(64, 32, variant)
        for cut in (14, 21):  # mid-chunk-header and mid-dims
            with _pytest.raises(ValueError):
                probe_image_dims(full[:cut])
    bad_start = bytearray(_webp_header_bytes(64, 32, "vp8"))
    bad_start[23] ^= 0xFF  # corrupt the 9D 01 2A start code
    with _pytest.raises(ValueError):
        probe_image_dims(bytes(bad_start))
    with _pytest.raises(ValueError):  # unknown first chunk fourcc
        probe_image_dims(b"RIFF\x10\x00\x00\x00WEBPXXXX\x04\x00\x00\x00abcd")
    # A RIFF that is not WebP stays "unknown", not an error.
    assert probe_image_dims(b"RIFF\x04\x00\x00\x00WAVE")[0] == "unknown"


def test_webp_dims_probe_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        WEBP_DIMS_ORACLE,
        webp_dims_probe,
    )

    got = webp_dims_probe(spark, SF_ORACLE)
    res = compare(got, WEBP_DIMS_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == 500


def test_ogg_probe_handcrafted_payloads():
    """probe_audio_meta on handcrafted OGG payloads: both codecs, the
    truncation classes, unknown-codec packet, and version guard."""
    import pytest as _pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _ogg_header_bytes,
        probe_audio_meta,
    )

    assert probe_audio_meta(_ogg_header_bytes("opus", 48000, 2)) == (
        "opus", 48000, 2,
    )
    assert probe_audio_meta(_ogg_header_bytes("vorbis", 44100, 1)) == (
        "vorbis", 44100, 1,
    )
    full = _ogg_header_bytes("opus", 48000, 2)
    for cut in (20, 28, 35):  # page header / segment table / packet body
        with _pytest.raises(ValueError):
            probe_audio_meta(full[:cut])
    bad_ver = bytearray(full)
    bad_ver[4] = 9
    with _pytest.raises(ValueError):
        probe_audio_meta(bytes(bad_ver))
    unknown_packet = full[:27] + bytes([1, 8]) + b"FLACHEAD"
    with _pytest.raises(ValueError):
        probe_audio_meta(unknown_packet)


def test_ogg_meta_probe_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        OGG_META_ORACLE,
        ogg_meta_probe,
    )

    got = ogg_meta_probe(spark, SF_ORACLE)
    res = compare(got, OGG_META_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == 500


def test_avif_probe_handcrafted_payloads():
    import pytest as _pytest

    from retail_aws_etl_pipeline_spark.operators.multimodal import (
        _avif_header_bytes,
        _mp4_header_bytes,
        probe_image_dims,
    )

    assert probe_image_dims(_avif_header_bytes(640, 480, b"avif")) == (
        "avif", 640, 480,
    )
    assert probe_image_dims(_avif_header_bytes(7, 5, b"heic")) == ("heic", 7, 5)
    assert probe_image_dims(_avif_header_bytes(1, 1, b"mif1")) == ("heif", 1, 1)
    # An MP4 video container is NOT an image to this probe.
    assert probe_image_dims(_mp4_header_bytes(600, 1200, 320, 180))[0] == "unknown"
    full = _avif_header_bytes(64, 32, b"avif")
    with _pytest.raises(ValueError):  # box size past the buffer
        probe_image_dims(full[: len(full) - 5])
    # A recognized brand whose meta lacks ispe raises, never misreports.
    no_meta = full[: full.index(b"meta") - 4]
    with _pytest.raises(ValueError):
        probe_image_dims(no_meta)


def test_avif_dims_probe_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        AVIF_DIMS_ORACLE,
        avif_dims_probe,
    )

    got = avif_dims_probe(spark, SF_ORACLE)
    res = compare(got, AVIF_DIMS_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == 500


# --- staged URL canonicalization (crawl-dedup family) ---


def test_canonical_url_equivalence_classes(spark):
    """Handcrafted variant spellings collapse to one canonical form, and
    non-URLs / NULLs pass through untouched."""
    from retail_aws_etl_pipeline_spark.operators.urlops import canonical_url

    variants = [
        "http://Example.com/Path?b=2&a=1",
        "HTTP://EXAMPLE.COM:80/Path?a=1&b=2#frag",
        "http://example.com:80/Path?utm_source=x&b=2&a=1",
        "http://example.com/Path?gclid=abc&a=1&utm_campaign=z&b=2",
    ]
    rows = spark.createDataFrame([(v,) for v in variants], "u string").select(
        canonical_url("u").alias("c")
    ).collect()
    assert {r.c for r in rows} == {"http://example.com/Path?a=1&b=2"}

    passthrough = [
        ("ftp://example.com/file", "ftp://example.com/file"),
        ("not a url at all", "not a url at all"),
        ("https://Host.Example", "https://host.example/"),  # empty path -> /
        ("https://h.example:443/x", "https://h.example/x"),
        ("https://h.example:8443/x", "https://h.example:8443/x"),
        ("http://h.example/x?utm_source=a", "http://h.example/x"),
        (None, None),
    ]
    got = spark.createDataFrame(
        [(v,) for v, _ in passthrough], "u string"
    ).select(canonical_url("u").alias("c")).collect()
    assert [r.c for r in got] == [want for _, want in passthrough]


def test_url_canonical_dedup_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        URL_CANONICAL_ORACLE,
        url_canonical_dedup,
    )

    got = url_canonical_dedup(spark, SF_ORACLE)
    res = compare(got, URL_CANONICAL_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == 500


def test_url_canonical_dedup_plan_is_scan_side(spark):
    """Canonicalization is a pure projection: no exchange at all except
    the presentation sort, no UDF, no join."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        url_canonical_dedup,
    )

    plan = _plan(url_canonical_dedup(spark, SF_ORACLE))
    assert "Join" not in plan
    assert "mapInPandas" not in plan and "BatchEvalPython" not in plan


def test_canonical_url_idempotent_and_collapsing(spark):
    """Idempotence over a generated variant space: canonicalizing twice
    equals once, and the variant spellings of one resource (case, default
    port, tracking params, query permutations, fragments) collapse to one
    canonical form per resource."""
    from itertools import product

    from retail_aws_etl_pipeline_spark.operators.urlops import canonical_url

    rows = []
    for rid, (scheme, host, port, q, frag) in enumerate(
        product(
            ("http", "HTTP", "https"),
            ("a.example", "A.Example"),
            ("", ":80", ":8080"),
            ("", "?b=2&a=1", "?a=1&b=2", "?utm_source=x&a=1&b=2"),
            ("", "#f"),
        )
    ):
        rows.append((f"{scheme}://{host}{port}/p{q}{frag}",))
    df = spark.createDataFrame(rows, "u string").select(
        "u",
        canonical_url("u").alias("c1"),
        canonical_url(canonical_url("u")).alias("c2"),
    )
    got = df.collect()
    assert all(r.c1 == r.c2 for r in got)  # idempotent
    # Collapse: per (effective scheme+port class, query class) the
    # canonical space is small. http with :80 or no port collapses
    # together; every ?-variant with params a=1&b=2 collapses.
    canon = {r.c1 for r in got}
    assert "http://a.example/p?a=1&b=2" in canon
    assert "https://a.example:80/p" in canon  # :80 kept on https — not its default
    # Empty-query and tracking-only variants never leave a dangling '?'.
    assert not any(c.endswith("?") for c in canon)


def test_canonical_url_fragment_question_mark(spark):
    """ADVICE r8 regression: a '?' whose FIRST occurrence is inside the
    fragment is fragment content, not a query. The buggy form promoted it
    into the canonical query — failing to collapse with the query-less
    spelling AND falsely collapsing with the genuinely different '?x=1'
    resource (hashbang routes hit this constantly)."""
    from retail_aws_etl_pipeline_spark.operators.urlops import canonical_url

    cases = [
        ("http://h.example/p#frag?x=1", "http://h.example/p"),
        ("http://h.example/p#!/route?x=1", "http://h.example/p"),
        # Real query + fragment containing '?': query survives, fragment
        # (including its '?') is dropped.
        ("http://h.example/p?b=2&a=1#frag?x=9", "http://h.example/p?a=1&b=2"),
        # The genuinely different resource keeps its query — no false
        # collapse with the fragment case above.
        ("http://h.example/p?x=1", "http://h.example/p?x=1"),
    ]
    got = spark.createDataFrame(
        [(u,) for u, _ in cases], "u string"
    ).select(canonical_url("u").alias("c")).collect()
    assert [r.c for r in got] == [want for _, want in cases]


def test_robots_decisions_host_normalization(spark):
    """ADVICE r8 regression: case-shifted hosts, userinfo, and DEFAULT
    ports must match their host's rules instead of failing open; a
    NON-default port is a distinct origin and matches only an explicit
    host:port robots key."""
    from retail_aws_etl_pipeline_spark.operators.urlops import robots_decisions

    robots = spark.createDataFrame(
        [
            ("h.example", "User-agent: *\nDisallow: /a/"),
            ("h.example:8080", "User-agent: *\nDisallow: /b/"),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("http://H.EXAMPLE/a/x",),          # case-shifted host
            ("http://h.example:80/a/x",),       # default http port
            ("https://h.example:443/a/x",),     # default https port
            ("http://user@h.example/a/x",),     # userinfo
            ("http://h.example:8080/a/x",),     # other origin: /a/ rule N/A
            ("http://h.example:8080/b/x",),     # explicit host:port key
        ],
        "url string",
    )
    got = {
        r.url: (r.allowed, r.rule_verb)
        for r in robots_decisions(urls, robots).collect()
    }
    assert got["http://H.EXAMPLE/a/x"] == (False, "Disallow")
    assert got["http://h.example:80/a/x"] == (False, "Disallow")
    assert got["https://h.example:443/a/x"] == (False, "Disallow")
    assert got["http://user@h.example/a/x"] == (False, "Disallow")
    assert got["http://h.example:8080/a/x"] == (True, None)
    assert got["http://h.example:8080/b/x"] == (False, "Disallow")


def test_robots_decisions_semantics(spark):
    """Longest-match + Allow-wins-ties + no-rule-allows, on handcrafted
    rules including the tie case the ordering key exists for."""
    from retail_aws_etl_pipeline_spark.operators.urlops import robots_decisions

    robots = spark.createDataFrame(
        [
            (
                "h.example",
                "User-agent: *\nDisallow: /a/\nAllow: /a/b/\nDisallow: /a/b/c/",
            )
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("http://h.example/open",),        # no rule -> allowed
            ("http://h.example/a/x",),         # Disallow /a/
            ("http://h.example/a/b/x",),       # Allow /a/b/ (longer)
            ("http://h.example/a/b/c/x",),     # Disallow /a/b/c/ (longest)
            ("http://other.example/a/x",),     # host with no robots
        ],
        "url string",
    )
    got = {r.url: (r.allowed, r.rule_verb) for r in robots_decisions(urls, robots).collect()}
    assert got["http://h.example/open"] == (True, None)
    assert got["http://h.example/a/x"] == (False, "Disallow")
    assert got["http://h.example/a/b/x"] == (True, "Allow")
    assert got["http://h.example/a/b/c/x"] == (False, "Disallow")
    assert got["http://other.example/a/x"] == (True, None)


def test_crawl_robots_audit_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        ROBOTS_AUDIT_ORACLE,
        crawl_robots_audit,
    )

    got = crawl_robots_audit(spark, SF_ORACLE)
    res = compare(got, ROBOTS_AUDIT_ORACLE, SF_ORACLE)
    assert res["ok"], res
    assert res["spark_rows"] == 500


def test_robots_decisions_wildcards(spark):
    """RFC 9309 wildcard semantics: '*' spans any characters (incl. '/'),
    trailing '$' anchors to path end, non-trailing '$' is literal, regex
    specials in rules stay literal, and specificity is pattern LENGTH as
    written (a longer wildcard pattern beats a shorter literal one)."""
    from retail_aws_etl_pipeline_spark.operators.urlops import robots_decisions

    robots = spark.createDataFrame(
        [
            (
                "w.example",
                "User-agent: *\n"
                "Disallow: /doc/*7$\n"      # ends-in-7 under /doc/
                "Disallow: /p.x\n"          # '.' is literal
                "Disallow: /a$b\n"          # non-trailing '$' is literal
                "Disallow: /dl/ot*\n"       # len-7 wildcard ...
                "Allow: /dl/o\n",           # ... beats the len-5 Allow
            ),
        ],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("http://w.example/doc/x17",),   # ends in 7 -> blocked
            ("http://w.example/doc/x171",),  # does NOT end in 7 -> allowed
            ("http://w.example/p.x",),       # literal dot -> blocked
            ("http://w.example/pqx",),       # '.' must NOT act as regex
            ("http://w.example/a$b",),       # literal '$' mid-pattern
            ("http://w.example/dl/other",),  # wildcard Disallow (len 7)
            ("http://w.example/dl/o",),      # only the Allow matches
        ],
        "url string",
    )
    got = {
        r.url: (r.allowed, r.rule_prefix)
        for r in robots_decisions(urls, robots).collect()
    }
    assert got["http://w.example/doc/x17"] == (False, "/doc/*7$")
    assert got["http://w.example/doc/x171"] == (True, None)
    assert got["http://w.example/p.x"] == (False, "/p.x")
    assert got["http://w.example/pqx"] == (True, None)
    assert got["http://w.example/a$b"] == (False, "/a$b")
    # pattern-length specificity: '/dl/ot*' (7) outranks Allow '/dl/o' (5)
    assert got["http://w.example/dl/other"] == (False, "/dl/ot*")
    assert got["http://w.example/dl/o"] == (True, "/dl/o")


def test_robots_wildcard_translation_vs_python_reference(spark):
    """Property: the broadcast-side regex translation matches an
    independent Python reference of RFC 9309 matching (anchored prefix,
    '*' spans anything, trailing '$' anchors, everything else literal)
    over adversarial rule/path pairs — one batched Spark evaluation, not
    per-example sessions."""
    import re as _re

    from retail_aws_etl_pipeline_spark.operators.urlops import robots_decisions

    def ref_match(pattern: str, path: str) -> bool:
        anchored = pattern.endswith("$")
        core = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if ch == "*" else _re.escape(ch) for ch in core)
        return bool(_re.match("^" + rx + ("$" if anchored else ""), path))

    rule_chars = "/ab7.x*$()[]{}|+?^\\"
    # Paths exclude '?' and '#': in a URL those END the path (the
    # operator's extraction correctly truncates there), so they can never
    # appear in the matched path string.
    path_chars = "/ab7.x*$()[]{}|+^\\"
    import random

    rng = random.Random(90210)
    rules, paths = [], []
    for i in range(120):
        rules.append("/" + "".join(rng.choice(rule_chars) for _ in range(rng.randint(1, 6))))
        paths.append("/" + "".join(rng.choice(path_chars) for _ in range(rng.randint(1, 8))))
    # one host per (rule, path) pair so decisions are independent
    cases = list(zip(rules, paths))
    robots = spark.createDataFrame(
        [(f"h{i}.example", f"User-agent: *\nDisallow: {r}") for i, (r, _) in enumerate(cases)],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(f"http://h{i}.example{p}",) for i, (_, p) in enumerate(cases)],
        "url string",
    )
    got = {
        r.host: not r.allowed for r in robots_decisions(urls, robots).collect()
    }
    for i, (rule, path) in enumerate(cases):
        want = ref_match(rule, path)
        assert got[f"h{i}.example"] == want, (rule, path, got[f"h{i}.example"])


def test_strip_host_boilerplate_semantics(spark):
    """Handcrafted hosts pin the contract: strictly-greater threshold
    (ratio == 0.5 survives), the min_host_docs guard (single-page hosts
    strip nothing even at ratio 1.0), within-doc duplicate lines count
    ONCE toward DF but share one verdict, and reassembly preserves
    original line order."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        strip_host_boilerplate,
    )

    docs = spark.createDataFrame(
        [
            # h1: 4 docs. 'nav' on all 4 (1.0 -> strip); 'half' on 2 of 4
            # (exactly 0.5 -> KEEP, threshold is strict); unique lines.
            (1, "h1", "u1\nnav\nhalf"),
            (2, "h1", "u2\nnav\nhalf"),
            (3, "h1", "u3\nnav"),
            (4, "h1", "nav\nu4\nu4"),  # duplicate content line within one doc
            # h2: single page -> guard: nothing stripped.
            (5, "h2", "solo\nnav"),
        ],
        "doc_id long, host string, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_lines_kept)
        for r in strip_host_boilerplate(docs).collect()
    }
    assert got[1] == ("u1\nhalf", 3, 2)
    assert got[2] == ("u2\nhalf", 3, 2)
    assert got[3] == ("u3", 2, 1)
    # 'u4' appears twice in doc 4 but on one doc only -> DF 1/4, kept twice
    assert got[4] == ("u4\nu4", 3, 2)
    # single-page host: ratio 1.0 for every line, min_host_docs guards
    assert got[5] == ("solo\nnav", 2, 2)


def test_strip_host_boilerplate_empty_after_strip(spark):
    """A doc whose every line is site chrome comes back EMPTY, not
    missing — row count is preserved for downstream joins."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        strip_host_boilerplate,
    )

    docs = spark.createDataFrame(
        [(1, "h", "nav"), (2, "h", "nav"), (3, "h", "nav\nreal")],
        "doc_id long, host string, text string",
    )
    got = {r.doc_id: (r.text, r.n_lines_kept) for r in strip_host_boilerplate(docs).collect()}
    assert got[1] == ("", 0)
    assert got[2] == ("", 0)
    assert got[3] == ("real", 1)


def test_host_boilerplate_strip_stats_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        HOST_BOILERPLATE_ORACLE,
        host_boilerplate_strip_stats,
    )
    from tests.conftest import SF_ORACLE
    from tests.oracle import compare

    res = compare(
        host_boilerplate_strip_stats(spark, SF_ORACLE),
        HOST_BOILERPLATE_ORACLE,
        SF_ORACLE,
    )
    assert res["ok"], res
    assert res["spark_rows"] == 500


def test_host_boilerplate_plan_shape(spark):
    """No windows, no sort-merge joins on the line spine: the DF count
    and the verdict join are keyed hash work; host totals broadcast."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        host_boilerplate_strip_stats,
    )
    from tests.conftest import SF_ORACLE

    plan = (
        host_boilerplate_strip_stats(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# DSIR importance selection (staged r10)
# ---------------------------------------------------------------------------


def test_dsir_selected_docs_matches_oracle(spark):
    """The full chain vs an INDEPENDENT DuckDB fit: tokenization, feature
    hashing, both bucket-count models, quantized log-ratio, exact-int
    scoring, top-N rank."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        _dsir_oracle,
        dsir_selected_docs,
    )

    got = dsir_selected_docs(spark, SF_ORACLE)
    res = compare(got, _dsir_oracle(), SF_ORACLE)
    assert res["ok"], res


def test_dsir_selects_target_like_docs(spark):
    """Semantics: documents from the target distribution (lang='en') must
    dominate the selected set — the whole point of importance selection.
    The en share of the top-100 must exceed the corpus en share."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.plans.extensions import dsir_selected_docs
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    sel = dsir_selected_docs(spark, SF_ORACLE).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    n_sel = sel.count()
    sel_en = sel.filter(F.col("lang") == "en").count()
    n_all = docs.count()
    all_en = docs.filter(F.col("lang") == "en").count()
    assert sel_en / n_sel > all_en / n_all, (sel_en, n_sel, all_en, n_all)


def test_dsir_fit_handcrafted_ranking(spark):
    """Handcrafted two-vocabulary corpus: target docs use vocab A, raw-only
    docs vocab B. A fresh doc written in vocab A must outscore one in
    vocab B under the fitted model; scores are exact int64."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sampling import (
        DSIR_BUCKETS,
        dsir_fit,
        dsir_logratio,
        dsir_scores,
    )

    rows = [(i, "alpha beta gamma", 1) for i in range(20)] + [
        (i + 20, "zeta eta theta", 0) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t int")
    lut = dsir_fit(docs, F.col("is_t") == 1)
    assert len(lut) == DSIR_BUCKETS and all(isinstance(v, int) for v in lut)

    probe = spark.createDataFrame(
        [(100, "alpha beta gamma alpha"), (101, "zeta eta theta zeta")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.dsir_score for r in dsir_scores(probe, lut).collect()}
    assert got[100] > 0 > got[101], got

    # The quantizer is pure and deterministic on integer counts.
    assert dsir_logratio({0: 5}, {0: 10}) == dsir_logratio({0: 5}, {0: 10})


def test_dsir_scoring_plan_shape(spark):
    """Scoring is scan-side: the fitted model is a literal array lookup —
    the executed plan has NO join and exactly one exchange (the doc-keyed
    aggregate)."""
    from pyspark.sql import functions as F

    from retail_aws_etl_pipeline_spark.operators.sampling import (
        dsir_fit,
        dsir_scores,
    )
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    lut = dsir_fit(docs, F.col("lang") == "en")
    plan = _plan(dsir_scores(docs, lut))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# Gopher quality battery (staged r10)
# ---------------------------------------------------------------------------


def test_gopher_quality_report_matches_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        GOPHER_QUALITY_ORACLE,
        gopher_quality_report,
    )

    got = gopher_quality_report(spark, SF_ORACLE)
    res = compare(got, GOPHER_QUALITY_ORACLE, SF_ORACLE)
    assert res["ok"], res


def test_gopher_rules_handcrafted(spark):
    """Each rule triggered by a purpose-built document (the synthetic
    corpus is single-line prose, so bullets/ellipses/symbols only get
    exercised here)."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        gopher_quality_flags,
    )

    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * 60
    )  # 65 words, all alpha, stopwords present
    docs = [
        (0, good),
        (1, "short text"),  # word_count fails
        (2, " ".join(["#"] * 30 + ["the", "be"] + ["word"] * 40)),  # symbols
        (3, "\n".join(["- bullet line"] * 8 + [good, good])),  # bullets ok (80%)
        (4, "\n".join(["- b"] * 19 + [good])),  # bullets fail (95%)
        (5, "\n".join([good, "ends here...", "and this one...", "x..."])),  # ellipsis 75%
        (6, " ".join(["123", "456"] * 40 + ["the", "be"])),  # alpha fails
        (7, " ".join(["word"] * 60)),  # no stopwords
        (8, " ".join(["supercalifragilistic"] * 60 + ["the", "be"])),  # mean len > 10
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x.doc_id: x for x in gopher_quality_flags(df).collect()}
    assert r[0].gopher_pass
    assert not r[1].word_count_ok and not r[1].gopher_pass
    assert not r[2].symbol_ratio_ok
    assert r[3].bullet_lines_ok
    assert not r[4].bullet_lines_ok
    assert not r[5].ellipsis_lines_ok
    assert not r[6].alpha_word_ok
    assert not r[7].stopword_ok
    assert not r[8].mean_word_len_ok


def test_gopher_plan_is_scan_side(spark):
    """The battery is a projection: no Exchange before the final sort."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        gopher_quality_flags,
    )
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    plan = _plan(gopher_quality_flags(docs).select("doc_id", "gopher_pass"))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# BPE trainer (staged r10)
# ---------------------------------------------------------------------------


def _bpe_python_mirror(texts: list[str], rounds: int):
    """Reference greedy BPE trainer on a word-frequency table."""
    from collections import Counter

    freq = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in freq.items()}
    merges = []
    for r in range(1, rounds + 1):
        stats = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        # argmax: count desc, then lexicographic pair asc
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((r, a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_mirror(spark):
    """The distributed trainer must equal the canonical greedy trainer on
    a corpus engineered to exercise overlap handling (aaa chains, shared-
    space chains, EOW merges, frequency weighting)."""
    from retail_aws_etl_pipeline_spark.operators.textops import bpe_train_merges

    texts = [
        "aaa aa aaaa banana banana bandana",
        "low lower lowest low low newer new",
        "aaa abab ababab the the the the",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [
        (r.round, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(df, rounds=5).orderBy("round").collect()
    ]
    want = _bpe_python_mirror(texts, 5)
    assert got == want, (got, want)


def test_bpe_train_matches_mirror_on_corpus(spark):
    """Same equality on the real sf0.01 documents table at the registry
    round budget."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        BPE_MERGE_ROUNDS,
        bpe_train_merges,
    )
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    texts = [r.text for r in docs.select("text").collect()]
    got = [
        (r.round, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_train_merges(docs).orderBy("round").collect()
    ]
    assert got == _bpe_python_mirror(texts, BPE_MERGE_ROUNDS), got[:3]


def test_bpe_train_oracle_match(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        BPE_TRAIN_ORACLE,
        bpe_train_merges_report,
    )

    got = bpe_train_merges_report(spark, SF_ORACLE)
    res = compare(got, BPE_TRAIN_ORACLE, SF_ORACLE)
    assert res["ok"], res


# ---------------------------------------------------------------------------
# Content-defined chunking (staged r10)
# ---------------------------------------------------------------------------


def _cdc_python_mirror(text: str):
    """Reference CDC chunker (same md5-nibble hash, fold, boundaries)."""
    import hashlib

    from retail_aws_etl_pipeline_spark.operators.dedup import (
        CDC_BASE,
        CDC_DIVISOR,
        CDC_MOD,
        CDC_WINDOW,
    )

    toks = text.split(" ")
    hs = [
        int(hashlib.md5(t.encode()).hexdigest()[:4], 16) for t in toks
    ]
    chunks, start = [], 0
    for i in range(1, len(toks) + 1):
        acc = 0
        for x in hs[max(0, i - CDC_WINDOW):i]:
            acc = (acc * CDC_BASE + x) % CDC_MOD
        if acc % CDC_DIVISOR == 0 and i < len(toks):
            chunks.append(" ".join(toks[start:i]))
            start = i
    chunks.append(" ".join(toks[start:]))
    return chunks


def test_cdc_matches_python_mirror(spark):
    from retail_aws_etl_pipeline_spark.operators.dedup import (
        content_defined_chunks,
    )
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"].limit(50)
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {}
    for r in content_defined_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    for did, text in texts.items():
        chunks = [c for _, c in sorted(got[did])]
        assert chunks == _cdc_python_mirror(text), did
        # Coverage invariant: chunks reconstruct the document exactly.
        assert " ".join(chunks) == text


def test_cdc_is_shift_resistant(spark):
    """THE property fixed-window chunking lacks: inserting tokens at the
    front must leave every chunk after the first surviving boundary
    byte-identical."""
    from retail_aws_etl_pipeline_spark.operators.dedup import (
        content_defined_chunks,
    )

    base = " ".join(f"tok{i * 7919 % 101}" for i in range(200))
    df = spark.createDataFrame(
        [(0, base), (1, "inserted prefix tokens " + base)],
        "doc_id long, text string",
    )
    out = {}
    for r in content_defined_chunks(df).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
    c0 = [c for _, c in sorted(out[0])]
    c1 = [c for _, c in sorted(out[1])]
    # All but the first few chunks realign (the disturbance is bounded by
    # the window: once the rolling window clears the insertion, boundary
    # positions are pure functions of unchanged content). Compare as a
    # common SUFFIX of the chunk sequences — the base text is periodic, so
    # set intersection would undercount repeated chunk strings.
    k = 0
    while k < min(len(c0), len(c1)) and c0[-1 - k] == c1[-1 - k]:
        k += 1
    assert k >= len(c0) - 2, (k, len(c0))


def test_cdc_chunk_dedup_oracle(spark):
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        CDC_CHUNK_ORACLE,
        cdc_chunk_dedup,
    )

    res = compare(cdc_chunk_dedup(spark, SF_ORACLE), CDC_CHUNK_ORACLE, SF_ORACLE)
    assert res["ok"], res


def test_cdc_plan_is_scan_side_until_groupby(spark):
    """The chunker itself is one projection: the executed plan of the
    chunk stream has no Exchange and no Python eval."""
    from retail_aws_etl_pipeline_spark.operators.dedup import (
        content_defined_chunks,
    )
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    plan = _plan(content_defined_chunks(docs))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_bpe_encode_report_oracle(spark):
    """Train + encode under one hash gate (the full tokenizer lifecycle)."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        BPE_ENCODE_ORACLE,
        bpe_encode_report,
    )

    res = compare(bpe_encode_report(spark, SF_ORACLE), BPE_ENCODE_ORACLE, SF_ORACLE)
    assert res["ok"], res


def test_bpe_encode_matches_python_mirror(spark):
    """Encoding with trained merges must equal the canonical greedy
    encoder per document (same mirror as the trainer, applied)."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    texts = ["aaa aa aaaa banana bandana", "low lower lowest new newer"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train_merges(df, rounds=4).orderBy("round").collect()
    ]

    def encode(text):
        total = 0
        for w in text.split(" "):
            syms = list(w) + ["</w>"]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            total += len(syms)
        return total

    got = {
        r.doc_id: (r.n_base_symbols, r.n_bpe_tokens)
        for r in bpe_encode_stats(df, merges).select(
            "doc_id", "n_base_symbols", "n_bpe_tokens"
        ).collect()
    }
    for i, t in enumerate(texts):
        base = sum(len(w) + 1 for w in t.split(" "))
        assert got[i] == (base, encode(t)), (i, got[i], base, encode(t))


def test_bpe_encode_is_scan_side(spark):
    """The encode pass with literal merges is one projection: no join,
    no Exchange, no Python eval."""
    from retail_aws_etl_pipeline_spark.operators.textops import bpe_encode_stats
    from retail_aws_etl_pipeline_spark.session import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    plan = _plan(bpe_encode_stats(docs, [("a", "b"), ("ab", "c</w>")]))
    assert "Exchange" not in plan and "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_cdc_mirror_hypothesis_unicode(spark):
    """CDC vs the Python mirror over arbitrary unicode token streams —
    md5-of-utf8 and the fold must agree for any text shape."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from retail_aws_etl_pipeline_spark.operators.dedup import (
        content_defined_chunks,
    )

    token = st.text(
        alphabet=st.characters(blacklist_characters=" \x00", blacklist_categories=("Cs",)),
        min_size=0,
        max_size=6,
    )
    texts = st.lists(
        st.lists(token, min_size=1, max_size=40).map(" ".join),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=texts)
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {}
        for r in content_defined_chunks(df).collect():
            got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text))
        for i, t in enumerate(texts):
            chunks = [c for _, c in sorted(got[i])]
            assert chunks == _cdc_python_mirror(t), (i, t)
            assert " ".join(chunks) == t

    check()


def test_bpe_train_mirror_hypothesis(spark):
    """The two-pass-replace == greedy-merge equivalence, fuzzed: random
    small-alphabet corpora maximize repeated/overlapping pairs (aa-chains,
    shared-space chains), the exact shapes the proof hinges on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from retail_aws_etl_pipeline_spark.operators.textops import bpe_train_merges

    word = st.text(alphabet="ab", min_size=1, max_size=8)
    texts = st.lists(
        st.lists(word, min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(texts=texts)
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = [
            (r.round, r.left_sym, r.right_sym, r.pair_count)
            for r in bpe_train_merges(df, rounds=4).orderBy("round").collect()
        ]
        assert got == _bpe_python_mirror(texts, 4), (texts, got)

    check()


def test_pair_queries_survive_single_token_docs(spark):
    """Regression (r10 fuzz finding): sequence(1, 0) is descending [1, 0],
    so the old greatest()-guarded pair transform indexed past the end of
    a 1-element token array. Single-token (and empty-text) documents must
    flow through every adjacent-pair query, contributing zero pairs."""
    from retail_aws_etl_pipeline_spark.operators.textops import bpe_train_merges

    df = spark.createDataFrame(
        [(0, "solo"), (1, ""), (2, "two words")], "doc_id long, text string"
    )
    rows = bpe_train_merges(df, rounds=2).collect()
    assert len(rows) == 2  # trains fine; pairs exist within words
    # And fully-merged single-symbol words keep iterating (the original
    # crash site): a corpus of one 1-char word merges to one symbol in
    # round 1, leaving zero pairs for round 2's count — which must be an
    # empty aggregate, not an index error.
    tiny = spark.createDataFrame([(0, "a a a")], "doc_id long, text string")
    got = bpe_train_merges(tiny, rounds=3).collect()
    assert len(got) <= 3


def test_gopher_rules_match_python_mirror_fuzz(spark):
    """Every Gopher rule vs a literal Python re-implementation over
    generated multiline documents (bullets, ellipses, symbols, digits,
    stopwords mixed freely)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from retail_aws_etl_pipeline_spark.operators.textops import (
        GOPHER_MAX_WORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        gopher_quality_flags,
    )

    word = st.sampled_from(
        ["the", "be", "with", "word", "123", "#", "x...", "longishtoken", "•", "-"]
    )
    line = st.lists(word, min_size=1, max_size=12).map(" ".join)
    doc = st.lists(line, min_size=1, max_size=6).map("\n".join)

    def mirror(text):
        toks = text.split(" ")
        lines = text.split("\n")
        n_words = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_hash = text.count("#")
        n_ell = (len(text) - len(text.replace("...", ""))) // 3
        n_bullet = sum(1 for l in lines if l.startswith("- ") or l.startswith("•"))
        n_ell_lines = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
        n_alpha = sum(1 for t in toks if any(c.isascii() and c.isalpha() for c in t))
        n_stop = sum(1 for w in GOPHER_STOPWORDS if w in toks)
        return {
            "word_count_ok": GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS,
            "mean_word_len_ok": 3 * n_words <= sum_len <= 10 * n_words,
            "symbol_ratio_ok": (n_hash + n_ell) * 10 <= n_words,
            "bullet_lines_ok": n_bullet * 10 <= len(lines) * 9,
            "ellipsis_lines_ok": n_ell_lines * 10 <= len(lines) * 3,
            "alpha_word_ok": n_alpha * 5 >= n_words * 4,
            "stopword_ok": n_stop >= 2,
        }

    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    @given(docs=st.lists(doc, min_size=1, max_size=4))
    def check(docs):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
        for i, t in enumerate(docs):
            want = mirror(t)
            for k, v in want.items():
                assert bool(got[i][k]) == v, (k, t, v)

    check()


# ---------------------------------------------------------------------------
# ADVICE r10 regressions
# ---------------------------------------------------------------------------


def test_gopher_exact_boundary_documents_are_kept(spark):
    """Paper-faithful boundaries (ADVICE r10): Rae et al. remove only
    STRICTLY-greater violations, so documents sitting exactly on a ratio
    threshold pass. One document per boundary: symbol ratio exactly 0.1,
    exactly 90% bullet lines, exactly 80% alpha words, 30% ellipsis
    lines."""
    from retail_aws_etl_pipeline_spark.operators.textops import (
        gopher_quality_flags,
    )

    filler = " ".join(["the", "be"] + ["word"] * 58)  # 60 words, all alpha
    docs = [
        # 2 hashes / 20 words = exactly 0.1
        (0, " ".join(["#", "#", "the", "be"] + ["word"] * 16)),
        # 9 bullet lines / 10 lines = exactly 90%
        (1, "\n".join(["- b"] * 9 + [filler])),
        # 48 alpha / 60 words = exactly 80%
        (2, " ".join(["the", "be"] + ["word"] * 46 + ["123"] * 12)),
        # 3 ellipsis-ending lines / 10 lines = exactly 30%
        (3, "\n".join(["end..."] * 3 + [filler] * 7)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x.doc_id: x for x in gopher_quality_flags(df).collect()}
    assert r[0].symbol_ratio_ok, "symbol ratio exactly 0.1 must be kept"
    assert r[1].bullet_lines_ok, "exactly 90% bullet lines must be kept"
    assert r[2].alpha_word_ok, "exactly 80% alpha words must be kept"
    assert r[3].ellipsis_lines_ok, "exactly 30% ellipsis lines must be kept"


def test_dsir_fit_null_target_counts_as_nontarget(spark):
    """ADVICE r10: a bucket whose rows all carry a NULL target predicate
    (e.g. NULL lang under ``lang == 'en'``) must count as non-target —
    previously F.sum returned NULL and dsir_logratio raised on None + 1."""
    from retail_aws_etl_pipeline_spark.operators.sampling import (
        DSIR_BUCKETS,
        dsir_fit,
        dsir_logratio,
    )

    df = spark.createDataFrame(
        [(0, "alpha beta gamma", None), (1, "alpha delta", "en")],
        "doc_id long, text string, lang string",
    )
    model = dsir_fit(df, F.col("lang") == "en")
    assert len(model) == DSIR_BUCKETS
    # Equivalent explicit fit: NULL-target rows contribute to raw only.
    words_t = ["alpha", "delta"]
    words_r = ["alpha", "beta", "gamma", "alpha", "delta"]
    from retail_aws_etl_pipeline_spark.operators.sampling import dsir_bucket

    bucket_of = {
        r.w: r.b
        for r in spark.createDataFrame(
            [(w,) for w in set(words_r)], "w string"
        ).select("w", dsir_bucket(F.col("w")).alias("b")).collect()
    }
    ct, cr = {}, {}
    for w in words_t:
        ct[bucket_of[w]] = ct.get(bucket_of[w], 0) + 1
    for w in words_r:
        cr[bucket_of[w]] = cr.get(bucket_of[w], 0) + 1
    assert model == dsir_logratio(ct, cr)


def test_bpe_oracle_counts_all_pairs_of_long_tokens(spark, tmp_path):
    """ADVICE r10: the trainer oracle's pair positions are generated from
    the actual symbol count, not a fixed 128 cap — a >=129-symbol token
    (URLs, junk strings in crawl text) keeps every adjacent pair, so the
    oracle still hash-matches the operator."""
    from retail_aws_etl_pipeline_spark.plans.extensions import (
        BPE_TRAIN_ORACLE,
        bpe_train_merges_report,
    )

    long_tok = "qz" * 100  # 200 chars -> 201 symbols with EOW
    texts = [
        f"{long_tok} alpha beta alpha beta",
        f"{long_tok} gamma alpha beta",
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf_long")
    (tmp_path / "sf_long").mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
            }
        ),
        f"{sf}/documents.parquet",
    )
    got = bpe_train_merges_report(spark, sf)
    res = compare(got, BPE_TRAIN_ORACLE, sf)
    assert res["ok"], res
    # Ground truth: the mirror on the same corpus.
    from retail_aws_etl_pipeline_spark.operators.textops import (
        BPE_MERGE_ROUNDS,
    )

    want = _bpe_python_mirror(texts, BPE_MERGE_ROUNDS)
    assert [
        (r.round, r.left_sym, r.right_sym, r.pair_count) for r in got.collect()
    ] == want
