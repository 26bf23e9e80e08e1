"""Deterministic HyperLogLog — the oracle-able form of the sketch family.

``approx_sketch_stats`` (Spark's approx_count_distinct / HLL++) is
RETIRED from the driver surface because its register layout is engine
private: no ANSI-SQL oracle can recompute it, so it is only
tolerance-gated against its exact twin. This module implements HLL
(Flajolet et al. 2007) from scratch on the engine-portable md5 hash
family the repo already standardizes on (split_bucket / dsir_bucket),
with EVERY step integer-exact:

- hash: bucket = first 2 md5 hex chars (m = 256); w = next 13 hex chars
  (52 bits) — disjoint substrings both engines slice identically.
- rho = leading-zero count of w within 52 bits, + 1 (w = 0 -> 53),
  via a generated threshold CASE ladder (no libm log — the
  floor_log2_sq_sql discipline), CLAMPED to HLL_RHO_CAP.
- raw estimate alpha_m * m^2 / sum_j 2^(-M_j), computed as
  floor(N * ALPHA_PPM / D) / 1e6 with N = m^2 * 2^rc and
  D = sum_j 2^(rc - M_j): the nested-floor identity plus the repo's
  remainder-corrected division keep everything inside int64 — the
  HLL_RHO_CAP = 28 clamp bounds N at 2^44 and D at 2^36, capping the
  estimable cardinality at ~5e10 distinct (beyond any single corpus
  this engine targets; a crafted >28-leading-zero hash merely
  saturates its register instead of overflowing the arithmetic).
- small-range (linear counting) correction: when zero registers exist
  and 2*E <= 5*m, E = m * ln(m/V) — the one genuinely transcendental
  step — is a 255-entry INTEGER LITERAL table fitted in Python at
  import (the DSIR-LUT discipline), so both engines look it up instead
  of calling a libm whose rounding they may disagree on.

The result is a sketch estimate that is bit-identical across Spark and
DuckDB and therefore hash-gateable — the sketch surface re-enters the
driver proof regime that retirement took it out of. At 100 TB the
register table is the whole shuffle: <= m rows per partial aggregate,
merged by MAX — the same associative-partial shape as any SUM.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_BUCKETS = 256  # m (2 hex chars)
HLL_W_BITS = 52  # 13 hex chars
HLL_RHO_CAP = 28

#: alpha_256 = 0.7213 / (1 + 1.079/m), ppm-rounded once in Python so both
#: engines consume the same integer constant.
HLL_ALPHA_PPM = round(1_000_000 * 0.7213 / (1 + 1.079 / HLL_BUCKETS))

#: Linear-counting estimates round(m * ln(m / V)) for V = 1..m-1 zero
#: registers (V = m means an empty input: estimate 0). Integer literals
#: fitted at import — deterministic, engine-shared.
HLL_LC_TABLE = [
    round(HLL_BUCKETS * math.log(HLL_BUCKETS / v)) for v in range(1, HLL_BUCKETS)
]


def floor_log2_sql(x_expr: str, bits: int = HLL_W_BITS) -> str:
    """CASE ladder: floor(log2({x})) for integer 1 <= x < 2^bits — pure
    threshold compares, bit-identical on both engines."""
    whens = " ".join(
        f"WHEN {x_expr} >= {1 << t} THEN {t}" for t in range(bits - 1, 0, -1)
    )
    return f"(CASE {whens} ELSE 0 END)"


def hll_rho_sql(w_expr: str) -> str:
    """Clamped HLL register value for the 52-bit suffix ``w``:
    rho = 52 - floor(log2(w)) for w >= 1 (leading zeros + 1), 53 for
    w = 0, min'd with HLL_RHO_CAP."""
    fl2 = floor_log2_sql(w_expr)
    return (
        f"LEAST(CASE WHEN {w_expr} = 0 THEN {HLL_W_BITS + 1} "
        f"ELSE {HLL_W_BITS} - {fl2} END, {HLL_RHO_CAP})"
    )


def hll_registers(df: DataFrame, key: Column) -> DataFrame:
    """(bucket, register) — at most HLL_BUCKETS rows. The per-bucket MAX
    is an associative partial aggregate, so the full-corpus sketch build
    exchanges <= m rows per partition however large the input.

    NULL keys are excluded INSIDE the kernel (ADVICE r13): md5(NULL) is
    NULL, which would otherwise land a NULL-bucket row whose NULL width
    the rho ladder's ELSE clamp turns into register 28, inflating
    n_present and the harmonic denominator for any caller that did not
    pre-filter."""
    hashed = df.filter(key.isNotNull()).select(
        F.md5(key.cast("string")).alias("__h")
    )
    parts = hashed.select(
        F.conv(F.substring("__h", 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring("__h", 3, 13), 16, 10).cast("long").alias("__w"),
    )
    return parts.groupBy("bucket").agg(
        F.expr(f"CAST(MAX({hll_rho_sql('__w')}) AS BIGINT)").alias("register")
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """One-row (hll_estimate, v_zero_registers, rc_max_register) from the
    register table — pure Column algebra, nothing collected. Empty
    buckets (absent rows) count toward the zero-register tally V and
    contribute 2^rc to the harmonic denominator.

    Single-pass (r16 optimization): dp = sum_j 2^(rc - M_j) needs the max
    register rc, which used to force a two-pass head → crossJoin →
    d_present chain (3 tiny jobs + 2 broadcasts per estimate). Instead
    aggregate the rc-independent dpc = sum_j 2^(CAP - M_j) alongside rc
    in ONE agg, then shift: every term has M_j <= rc <= CAP, so
    dpc = 2^(CAP - rc) * dp exactly and dp = dpc >> (CAP - rc) is an
    exact integer — bit-identical dp, one aggregate instead of three.
    Bounds: terms <= 2^(CAP-1) = 2^27, <= m = 256 rows, so
    dpc <= 2^35 — no overflow."""
    m = HLL_BUCKETS
    agg = regs.agg(
        F.coalesce(F.max("register"), F.lit(0)).cast("long").alias("rc"),
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(1L, CAST({HLL_RHO_CAP} - register AS INT))")),
            F.lit(0),
        )
        .cast("long")
        .alias("__dpc"),
    )
    lc = ",".join(str(x) for x in HLL_LC_TABLE)
    return (
        agg.withColumn(
            "dp", F.expr(f"shiftright(__dpc, CAST({HLL_RHO_CAP} - rc AS INT))")
        )
        .withColumn("v", F.expr(f"{m}L - n_present"))
        .withColumn(
            "d", F.expr(f"dp + ({m}L - n_present) * shiftleft(1L, CAST(rc AS INT))")
        )
        # N = m^2 * 2^rc <= 2^44; Q = floor(N * ALPHA_PPM / D) via the
        # remainder-corrected split (both halves < ~5e16); E = Q div 1e6
        # (nested-floor identity).
        .withColumn("n_big", F.expr(f"{m}L * {m} * shiftleft(1L, CAST(rc AS INT))"))
        .withColumn(
            "e_raw",
            F.expr(
                f"((n_big div d) * {HLL_ALPHA_PPM}"
                f" + ((n_big % d) * {HLL_ALPHA_PPM}) div d) div 1000000"
            ),
        )
        .withColumn(
            "hll_estimate",
            F.expr(
                # linear counting when zero registers exist and the raw
                # estimate is in the small range (2E <= 5m); V = m means
                # empty input -> 0
                f"CASE WHEN v = {m} THEN 0L "
                f"WHEN v > 0 AND 2 * e_raw <= 5 * {m} "
                f"THEN element_at(array({lc}), CAST(v AS INT)) "
                f"ELSE e_raw END"
            ).cast("long"),
        )
        .select(
            "hll_estimate",
            F.col("v").alias("v_zero_registers"),
            F.col("rc").alias("rc_max_register"),
        )
    )


def hll_distinct(df: DataFrame, key: Column) -> DataFrame:
    """End-to-end: one row (hll_estimate, v_zero_registers,
    rc_max_register) for the key's distinct cardinality."""
    return hll_estimate(hll_registers(df, key))


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Union two register tables: elementwise per-bucket MAX — the
    property that makes HLL the DISTRIBUTED sketch. sketch(A) merged
    with sketch(B) equals sketch(A ∪ B) BIT-IDENTICALLY (max is
    associative/commutative/idempotent), so shards, partitions, days or
    whole corpora can be sketched independently and combined later with
    a <= m-row union — no rescan of either side. Pinned by
    tests/test_staged_r15.py::test_hll_merge_equals_sketch_of_union."""
    return (
        regs_a.unionByName(regs_b)
        .groupBy("bucket")
        .agg(F.max("register").cast("long").alias("register"))
    )


def hll_overlap(
    df_a: DataFrame, df_b: DataFrame, key_a: Column, key_b: Column
) -> DataFrame:
    """Sketch-algebra overlap estimate between two keyed sets: one row
    (est_a, est_b, est_union, est_overlap) where est_union comes from
    :func:`hll_merge` (exact register union — no rescan of either side)
    and est_overlap = est_a + est_b - est_union (inclusion–exclusion).

    The overlap estimate is SIGNED and noisy when the true intersection
    is small relative to the sketch error (it can go negative — three
    estimates' errors stack); the consuming report pairs it with the
    exact intersection so the audit shows exactly where the cheap
    algebra is trustworthy. The 100 TB shape is the point: snapshots /
    days / sources sketched once (<= m rows each at rest) answer any
    pairwise overlap question later WITHOUT a join over either corpus.
    """
    ra, rb = hll_registers(df_a, key_a), hll_registers(df_b, key_b)
    ea = hll_estimate(ra).select(F.col("hll_estimate").alias("est_a"))
    eb = hll_estimate(rb).select(F.col("hll_estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(ra, rb)).select(
        F.col("hll_estimate").alias("est_union")
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .withColumn("est_overlap", F.expr("est_a + est_b - est_union"))
    )


def hll_overlap_split(df: DataFrame, key: Column, is_a: Column) -> DataFrame:
    """Fused :func:`hll_overlap` for the common case where A and B are two
    disjoint predicate halves of ONE frame (r16 optimization): the same
    one-row (est_a, est_b, est_union, est_overlap), bit-identical to

        hll_overlap(df.filter(is_a), df.filter(~is_a), key, key)

    for any boolean ``is_a`` (rows where it is NULL belong to neither
    half — exactly what the two filters do), but from a SINGLE scan and
    a SINGLE <= m-row exchange instead of two scans + two register
    exchanges + three separate estimate chains: one groupBy(bucket)
    computes both halves' registers side by side (per-bucket conditional
    MAX), the union register is their per-bucket GREATEST (the
    :func:`hll_merge` MAX, registers are >= 1 so COALESCE 0 is neutral),
    and all three estimates are the single-pass :func:`hll_estimate`
    algebra as column expressions over one 1-row aggregate — no joins.
    """
    m = HLL_BUCKETS
    # is_a IS NULL rows belong to neither half (both filters drop them);
    # keeping them would mint a (reg_a NULL, reg_b NULL) bucket row that
    # inflates the union's n_present and poisons dpc_u with a register-0
    # term — caught by the hostile tri-table battery.
    hashed = df.filter(key.isNotNull() & is_a.isNotNull()).select(
        F.md5(key.cast("string")).alias("__h"), is_a.alias("__a")
    )
    parts = hashed.select(
        F.conv(F.substring("__h", 1, 2), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring("__h", 3, 13), 16, 10).cast("long").alias("__w"),
        "__a",
    )
    rho = hll_rho_sql("__w")
    regs = parts.groupBy("bucket").agg(
        F.expr(f"CAST(MAX(CASE WHEN __a THEN {rho} END) AS BIGINT)").alias("reg_a"),
        F.expr(f"CAST(MAX(CASE WHEN NOT __a THEN {rho} END) AS BIGINT)").alias(
            "reg_b"
        ),
    ).withColumn(
        "reg_u",
        F.greatest(
            F.coalesce(F.col("reg_a"), F.lit(0)), F.coalesce(F.col("reg_b"), F.lit(0))
        ).cast("long"),
    )
    agg = regs.agg(
        *[
            e
            for tag in ("a", "b", "u")
            for e in (
                F.expr(f"CAST(COALESCE(MAX(reg_{tag}), 0) AS BIGINT)").alias(
                    f"rc_{tag}"
                ),
                # count(col) skips NULLs: buckets this half actually hit
                F.expr(f"CAST(COUNT(reg_{tag}) AS BIGINT)").alias(f"np_{tag}"),
                F.expr(
                    f"CAST(COALESCE(SUM(CASE WHEN reg_{tag} IS NOT NULL THEN"
                    f" shiftleft(1L, CAST({HLL_RHO_CAP} - reg_{tag} AS INT))"
                    " END), 0) AS BIGINT)"
                ).alias(f"dpc_{tag}"),
            )
        ]
    )
    lc = ",".join(str(x) for x in HLL_LC_TABLE)
    out = agg
    for tag in ("a", "b", "u"):
        out = (
            out.withColumn(
                f"__dp_{tag}",
                F.expr(
                    f"shiftright(dpc_{tag}, CAST({HLL_RHO_CAP} - rc_{tag} AS INT))"
                ),
            )
            .withColumn(f"__v_{tag}", F.expr(f"{m}L - np_{tag}"))
            .withColumn(
                f"__d_{tag}",
                F.expr(
                    f"__dp_{tag} + ({m}L - np_{tag})"
                    f" * shiftleft(1L, CAST(rc_{tag} AS INT))"
                ),
            )
            .withColumn(
                f"__nbig_{tag}",
                F.expr(f"{m}L * {m} * shiftleft(1L, CAST(rc_{tag} AS INT))"),
            )
            .withColumn(
                f"__eraw_{tag}",
                F.expr(
                    f"((__nbig_{tag} div __d_{tag}) * {HLL_ALPHA_PPM}"
                    f" + ((__nbig_{tag} % __d_{tag}) * {HLL_ALPHA_PPM})"
                    f" div __d_{tag}) div 1000000"
                ),
            )
            .withColumn(
                f"__e_{tag}",
                F.expr(
                    f"CAST(CASE WHEN __v_{tag} = {m} THEN 0L"
                    f" WHEN __v_{tag} > 0 AND 2 * __eraw_{tag} <= 5 * {m}"
                    f" THEN element_at(array({lc}), CAST(__v_{tag} AS INT))"
                    f" ELSE __eraw_{tag} END AS BIGINT)"
                ),
            )
        )
    return out.select(
        F.col("__e_a").alias("est_a"),
        F.col("__e_b").alias("est_b"),
        F.col("__e_u").alias("est_union"),
        F.expr("__e_a + __e_b - __e_u").alias("est_overlap"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the FREQUENCY member
# of the deterministic sketch family (HLL above covers distincts,
# bottomk_sample below covers quantiles). Same engine-portable md5
# discipline: every cell is an exact int64 SUM, so the sketch — and any
# estimate read from it — hash-matches a relational oracle.
# ---------------------------------------------------------------------------

#: Sketch geometry: d independent hash rows x w columns. Cells at rest =
#: d*w = 1024 rows; expected overcount per estimate ~ N/w (point query
#: err <= 2N/w with prob 1 - (1/2)^d).
CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(key: Column, row: int) -> Column:
    """Column 0..CMS_WIDTH-1 for hash row ``row``: first 2 md5 hex chars
    of the seeded key — the HLL slicing discipline, one seed per row."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"cm{row}:"), key)), 1, 2), 16, 10)
        .cast("long")
    )


def cms_cells(counted: DataFrame, key_col: str, n_col: str) -> DataFrame:
    """(row, col, cell) — at most CMS_DEPTH * CMS_WIDTH rows — from a
    PRE-COUNTED (key, n) frame (count first, then sketch: the vocab
    groupBy is the one corpus-scale exchange; the sketch build is a
    vocab-scale projection + a <= d*w-row reduce). Cells are exact int64
    sums, so the merge rule is elementwise + (see :func:`cms_merge`).

    NULL keys are excluded inside the kernel (the hll_registers
    contract): md5(NULL) would silently drop the seeded concat to NULL
    and the row would land nowhere on one engine, somewhere on another.
    """
    df = counted.filter(F.col(key_col).isNotNull())
    legs = F.array(
        *[
            F.struct(
                F.lit(r).cast("long").alias("row"),
                cms_bucket(F.col(key_col), r).alias("col"),
            )
            for r in range(CMS_DEPTH)
        ]
    )
    return (
        df.select(F.col(n_col).alias("__n"), F.explode(legs).alias("g"))
        .groupBy(F.col("g.row").alias("row"), F.col("g.col").alias("col"))
        .agg(F.sum("__n").cast("long").alias("cell"))
    )


def cms_merge(cells_a: DataFrame, cells_b: DataFrame) -> DataFrame:
    """Merge two cell tables: elementwise SUM — sketch(A) + sketch(B) ==
    sketch(A ⊎ B) bit-identically (sum is associative/commutative), so
    shards sketch independently and combine with a <= d*w-row union."""
    return (
        cells_a.unionByName(cells_b)
        .groupBy("row", "col")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )


def cms_estimates(cells: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """(key, est_n) for each probe key: min over the d rows of the
    addressed cells. ``keys`` is a bounded probe frame (broadcast); the
    join touches d rows per key. Absent cells read 0 (a key the sketch
    never saw estimates 0 only if some row's cell is empty)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        cms_bucket(F.col(key_col), r).alias("col"),
                    )
                    for r in range(CMS_DEPTH)
                ]
            )
        ).alias("g"),
    ).select(key_col, F.col("g.row").alias("row"), F.col("g.col").alias("col"))
    # Broadcast the CELLS side: Spark cannot build a BroadcastHashJoin
    # on the stream (left) side of a left-outer join, so hinting the
    # probes would be silently ignored.  The cells table is bounded at
    # d*w rows by construction, always broadcastable.
    return (
        probes.join(F.broadcast(cells), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cell"), F.lit(0))).cast("long").alias("est_n"))
    )


# ---------------------------------------------------------------------------
# Bottom-k hash sample (Cohen & Kaplan 2007) — the QUANTILE member: the
# k rows with the smallest md5(row-key) are a uniform, DETERMINISTIC,
# MERGEABLE sample (bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B))),
# so empirical quantiles read from it are hash-gateable end to end.
# ---------------------------------------------------------------------------

#: Sample size: quantile error ~ 1/sqrt(k) in rank space.
BOTTOMK_K = 256


def bottomk_sample(
    df: DataFrame, row_key: Column, value: Column, k: int = BOTTOMK_K
) -> DataFrame:
    """(h, v) — the k rows with the smallest md5 hex of ``row_key``
    (ties on the full 32-hex string are ties on the key itself when the
    key is unique). orderBy(...).limit(k) plans TakeOrderedAndProject —
    a distributed per-partition top-k + a k-row driver merge, never a
    global sort.

    NULL row keys are excluded inside the kernel (the hll_registers
    contract): md5(NULL) is NULL, and the two engines ORDER NULLs at
    opposite ends (Spark first, DuckDB last), so an unkeyed row would
    silently displace a real sample member on exactly one engine.
    Callers wanting every row sampled should make the key total
    (COALESCE sentinel parts) before calling."""
    return (
        df.filter(row_key.isNotNull())
        .select(F.md5(row_key.cast("string")).alias("h"), value.alias("v"))
        .orderBy(F.asc("h"), F.asc("v"))
        .limit(k)
    )
