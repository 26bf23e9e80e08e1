"""Similarity search over embedding columns (array<float>).

Three implementations of cosine top-k, sharing one QUANTIZED contract so
results are integer-exact and engine-reproducible:

    q_i = floor(x_i * 1024)          (int64, exact from the float)
    dot_q(a,b) = Σ q_a[i]·q_b[i]     (int64, exact, order-free)
    cos_q = dot_q / sqrt(norm_a · norm_b)   (identical doubles everywhere)

- ``brute_force_topk``: exact scan — the correctness baseline. O(Q·N·d)
  but embarrassingly parallel; broadcast the probe set, no shuffle.
- ``lsh_bucketed_topk``: random-hyperplane LSH — each vector gets a B-bit
  sign code against B fixed pseudo-random planes (derived from md5, shared
  constant, no RNG); candidates = same-bucket vectors only. The 100 TB
  path: bucket is computed scan-side, the join is an equi-join on the
  bucket id, and recall is tunable via B / multi-probe.
- ``brute_force_topk_pandas``: the same contract through an Arrow-batched
  ``mapInPandas`` + numpy kernel — the vectorized-UDF pattern for when the
  expression form gets too wide (e.g. d in the thousands). Integer math in
  numpy matches the SQL form bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1024
NUM_PLANES = 8
PLANE_DIM = 64


def _plane_weight(p: int, i: int) -> int:
    """Deterministic pseudo-random weight in [-1000, 1000] from md5(p:i)."""
    h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
    return int(h[:8], 16) % 2001 - 1000


#: NUM_PLANES × PLANE_DIM fixed hyperplane matrix (shared with oracles).
PLANES: list[list[int]] = [
    [_plane_weight(p, i) for i in range(PLANE_DIM)] for p in range(NUM_PLANES)
]


def quantized(col: str = "embedding"):
    return F.expr(f"transform({col}, x -> CAST(floor(x * {QUANT_SCALE}) AS BIGINT))")


def _dot(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")


def with_quantized(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Add ``qvec`` (int64 array) and ``qnorm`` (int64 self-dot)."""
    out = df.withColumn("qvec", quantized(col))
    return out.withColumn("qnorm", _dot("qvec", "qvec"))


def cosine_pairs(probes: DataFrame, candidates: DataFrame) -> DataFrame:
    """Quantized cosine for every (probe, candidate) row pair.

    Inputs must carry ``qvec``/``qnorm`` (see ``with_quantized``) and ids
    aliased ``probe_id`` / ``vec_id``.
    """
    joined = probes.crossJoin(candidates).filter(F.col("probe_id") != F.col("vec_id"))
    dot = _dot("p_qvec", "qvec")
    return joined.withColumn("dot_q", dot).withColumn(
        "cosine", F.col("dot_q") / F.sqrt((F.col("p_qnorm") * F.col("qnorm")).cast("double"))
    )


def brute_force_topk(
    df: DataFrame, probe_ids: list[int], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k nearest by quantized cosine for each probe id."""
    from pyspark.sql import Window as W

    base = with_quantized(df).select(id_col, "qvec", "qnorm")
    probes = (
        base.filter(F.col(id_col).isin(probe_ids))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col("qvec").alias("p_qvec"),
            F.col("qnorm").alias("p_qnorm"),
        )
    )
    scored = cosine_pairs(F.broadcast(probes), base)
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, "dot_q", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def with_lsh_bucket(
    df: DataFrame, qvec_col: str = "qvec", planes: list[list[int]] | None = None
) -> DataFrame:
    """Add the B-bit random-hyperplane bucket id (computed scan-side).

    ``planes`` defaults to the full fixed matrix; pass a prefix slice
    (``PLANES[:n]``) to trade recall for bucket selectivity.
    """
    bucket = None
    for p, weights in enumerate(PLANES if planes is None else planes):
        arr = "array(" + ", ".join(f"{w}L" for w in weights) + ")"
        proj = F.expr(
            f"aggregate(zip_with({qvec_col}, {arr}, (x, w) -> x * w), 0L, (acc, v) -> acc + v)"
        )
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket)


def lsh_bucketed_topk(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    multiprobe_radius: int = 1,
    planes: list[list[int]] | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to buckets within Hamming
    distance ``multiprobe_radius`` of the probe's bucket (multi-probe LSH —
    the standard recall lever; radius 0 = single bucket).

    Here the probe set is tiny and broadcast, so the radius condition is a
    cheap nested-loop against ≤|probes| rows per scan row. At scale with
    many probes, expand each probe's bucket to its radius-ball (B·radius
    ids) and equi-join on bucket instead.
    """
    from pyspark.sql import Window as W

    base = with_lsh_bucket(with_quantized(df), planes=planes).select(
        id_col, "qvec", "qnorm", "bucket"
    )
    probes = (
        base.filter(F.col(id_col).isin(probe_ids))
        .select(
            F.col(id_col).alias("probe_id"),
            F.col("qvec").alias("p_qvec"),
            F.col("qnorm").alias("p_qnorm"),
            F.col("bucket").alias("p_bucket"),
        )
    )
    joined = F.broadcast(probes).join(
        base,
        (
            F.bit_count(F.col("p_bucket").bitwiseXOR(F.col("bucket")))
            <= F.lit(multiprobe_radius)
        )
        & (F.col("probe_id") != F.col(id_col)),
    )
    scored = joined.withColumn("dot_q", _dot("p_qvec", "qvec")).withColumn(
        "cosine", F.col("dot_q") / F.sqrt((F.col("p_qnorm") * F.col("qnorm")).cast("double"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, "dot_q", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def lsh_bucketed_topk_ball(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    multiprobe_radius: int = 1,
) -> DataFrame:
    """Multi-probe LSH via probe-side ball expansion + EQUI-join.

    Same candidate set (hence identical results) as ``lsh_bucketed_topk``,
    but built for many probes: each probe row explodes into the
    ``sum(C(B, r) for r <= radius)`` bucket ids of its Hamming ball (B=8,
    radius 1 → 9 rows) and the match is a plain equi-join on ``bucket`` —
    a shuffled/broadcast hash join the planner can scale, instead of a
    nested-loop bit_count(xor) predicate that evaluates every (probe, row)
    combination. Each candidate appears exactly once per probe (its bucket
    fixes the xor mask), so no dedup is needed.
    """
    from itertools import combinations

    from pyspark.sql import Window as W

    masks = [0]
    if multiprobe_radius >= 1:
        masks += [1 << p for p in range(NUM_PLANES)]
    if multiprobe_radius >= 2:
        masks += [(1 << p) | (1 << q) for p, q in combinations(range(NUM_PLANES), 2)]
    if multiprobe_radius >= 3:
        raise ValueError("ball expansion implemented for radius <= 2")

    base = with_lsh_bucket(with_quantized(df)).select(id_col, "qvec", "qnorm", "bucket")
    probes = base.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col("qvec").alias("p_qvec"),
        F.col("qnorm").alias("p_qnorm"),
        F.col("bucket").alias("p_bucket"),
    )
    balls = probes.withColumn(
        "bucket",
        F.explode(F.array(*[F.col("p_bucket").bitwiseXOR(F.lit(m)) for m in masks])),
    )
    joined = F.broadcast(balls).join(base, "bucket").filter(
        F.col("probe_id") != F.col(id_col)
    )
    scored = joined.withColumn("dot_q", _dot("p_qvec", "qvec")).withColumn(
        "cosine", F.col("dot_q") / F.sqrt((F.col("p_qnorm") * F.col("qnorm")).cast("double"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, "dot_q", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def brute_force_topk_pandas(
    df: DataFrame, probe_ids: list[int], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Same contract as ``brute_force_topk`` via mapInPandas + numpy.

    The probe matrix is tiny → shipped in the closure (broadcast-variable
    semantics); each Arrow batch computes an int64 GEMM against it. Output
    is the per-partition candidate pool; the exact global top-k window runs
    after (cheap: ≤ k rows per partition per probe would be a further
    optimization; at d=64 the full scored set is fine).
    """
    import pandas as pd  # noqa: F401

    spark = df.sparkSession
    base = with_quantized(df).select(id_col, "qvec", "qnorm")
    probe_rows = base.filter(F.col(id_col).isin(probe_ids)).collect()
    import numpy as np

    p_ids = np.array([r[id_col] for r in probe_rows], dtype=np.int64)
    p_mat = np.array([r["qvec"] for r in probe_rows], dtype=np.int64)
    p_norm = np.array([r["qnorm"] for r in probe_rows], dtype=np.int64)

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.stack(pdf["qvec"].to_numpy())  # (n, d) int64
            norms = pdf["qnorm"].to_numpy(dtype="int64")
            dots = mat @ p_mat.T  # (n, P) int64 exact
            for j in range(len(p_ids)):
                mask = ids != p_ids[j]
                cos = dots[mask, j] / np.sqrt(
                    (norms[mask] * p_norm[j]).astype("float64")
                )
                out = {
                    "probe_id": np.full(mask.sum(), p_ids[j], dtype="int64"),
                    id_col: ids[mask],
                    "dot_q": dots[mask, j],
                    "cosine": cos,
                }
                import pandas as _pd

                yield _pd.DataFrame(out)

    schema = f"probe_id long, {id_col} long, dot_q long, cosine double"
    scored = base.mapInPandas(score, schema=schema)
    from pyspark.sql import Window as W

    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, "dot_q", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def near_dup_pairs_pandas(df: DataFrame, min_cosine: float, id_col: str = "vec_id") -> DataFrame:
    """All near-dup pairs (cosine ≥ τ) via blockwise numpy int64 GEMM.

    Bit-identical to the SQL formulation (same quantized contract) but two
    orders of magnitude faster than per-pair Catalyst lambdas: each Arrow
    batch computes a (batch × corpus) integer matrix product against the
    broadcast corpus matrix and emits only ``id_a < id_b`` survivors of the
    squared cross-multiplied threshold.

    The corpus matrix is collected to the driver — right up to ~10M vectors
    (10M × 64 × 8B = 5 GB). Beyond that, LSH-bucket first (see
    ``with_lsh_bucket``) and run this kernel per bucket.
    """
    import numpy as np
    import pandas as pd

    base = with_quantized(df).select(id_col, "qvec", "qnorm")
    rows = base.collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r["qvec"] for r in rows], dtype=np.int64)
    norms = np.array([r["qnorm"] for r in rows], dtype=np.int64)
    tau_sq = float(min_cosine) * float(min_cosine)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            b_ids = pdf[id_col].to_numpy(dtype="int64")
            b_mat = np.stack(pdf["qvec"].to_numpy()).astype("int64")
            b_norms = pdf["qnorm"].to_numpy(dtype="int64")
            dots = b_mat @ mat.T  # (batch, corpus) exact int64
            # squared cross-multiplied threshold, sign-guarded — identical
            # to the SQL predicate
            lhs = dots.astype("float64") ** 2
            rhs = tau_sq * b_norms[:, None].astype("float64") * norms[None, :].astype("float64")
            keep = (dots > 0) & (lhs >= rhs) & (b_ids[:, None] < ids[None, :])
            bi, ci = np.nonzero(keep)
            cos = dots[bi, ci] / np.sqrt((b_norms[bi] * norms[ci]).astype("float64"))
            yield pd.DataFrame(
                {"id_a": b_ids[bi], "id_b": ids[ci], "cosine": cos}
            )

    return base.mapInPandas(kernel, schema="id_a long, id_b long, cosine double")


# --- IVF (inverted-file) coarse quantizer --------------------------------

IVF_CENTROIDS = 8
IVF_KMEANS_ITERS = 2


def ivf_centroids(df: DataFrame, id_col: str = "vec_id") -> list[list[int]]:
    """Deterministic integer k-means centroids for the IVF index.

    Init = the quantized vectors of the ``IVF_CENTROIDS`` lowest ids
    (deterministic, no RNG), then ``IVF_KMEANS_ITERS`` Lloyd iterations in
    numpy, with centroids ROUNDED TO INTEGERS after each update — all
    subsequent distance math is exact int64, so assignments are identical
    in Spark, numpy, and any SQL engine given the same centroid literals.

    Centroid fitting collects only the quantized matrix — at 100 TB fit on
    a sample (k-means centroids converge on far less data than the corpus).
    """
    import numpy as np

    base = with_quantized(df).select(id_col, "qvec").orderBy(id_col)
    mat = np.array([r["qvec"] for r in base.collect()], dtype=np.int64)
    return _kmeans_int(mat)


def _kmeans_int(mat) -> list[list[int]]:
    import numpy as np

    cents = mat[:IVF_CENTROIDS].astype(np.float64)
    for _ in range(IVF_KMEANS_ITERS):
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(IVF_CENTROIDS):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = np.rint(cents)
    return [[int(x) for x in row] for row in cents]


def ivf_centroids_from_parquet(path: str) -> list[list[int]]:
    """Spark-free centroid fit (pyarrow + numpy) — used by the DuckDB
    oracle side so both engines share identical centroid literals."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    emb = np.stack(t["embedding"].to_numpy()[order])
    mat = np.floor(emb.astype(np.float64) * QUANT_SCALE).astype(np.int64)
    return _kmeans_int(mat)


def assign_centroid(qvec_col: str, centroids: list[list[int]]):
    """Scan-side argmin-distance centroid assignment (exact int math,
    tiebreak = lowest centroid id).

    Built as ONE struct-array min — `array_min` over `(dist, cid)` structs
    compares field-by-field, so the lowest distance wins and ties break to
    the lowest centroid id. A nested WHEN chain here would duplicate every
    previous distance expression at each step (O(K²) tree → analysis and
    codegen dominated the runtime at K=8); this form is linear in K."""
    entries = []
    for cid, cent in enumerate(centroids):
        arr = "array(" + ", ".join(f"{w}L" for w in cent) + ")"
        dist = (
            f"aggregate(zip_with({qvec_col}, {arr}, (x, c) -> (x - c) * (x - c)),"
            " 0L, (acc, v) -> acc + v)"
        )
        entries.append(f"named_struct('d', {dist}, 'c', {cid}L)")
    return F.expr(f"array_min(array({', '.join(entries)})).c")


def ivf_topk(
    df: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    centroids: list[list[int]] | None = None,
) -> DataFrame:
    """IVF ANN: candidates restricted to the probe's centroid cell."""
    from pyspark.sql import Window as W

    cents = centroids if centroids is not None else ivf_centroids(df, id_col)
    base = with_quantized(df).withColumn("cell", assign_centroid("qvec", cents)).select(
        id_col, "qvec", "qnorm", "cell"
    )
    probes = base.filter(F.col(id_col).isin(probe_ids)).select(
        F.col(id_col).alias("probe_id"),
        F.col("qvec").alias("p_qvec"),
        F.col("qnorm").alias("p_qnorm"),
        F.col("cell").alias("p_cell"),
    )
    joined = F.broadcast(probes).join(
        base, (F.col("p_cell") == F.col("cell")) & (F.col("probe_id") != F.col(id_col))
    )
    scored = joined.withColumn("dot_q", _dot("p_qvec", "qvec")).withColumn(
        "cosine", F.col("dot_q") / F.sqrt((F.col("p_qnorm") * F.col("qnorm")).cast("double"))
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", id_col, "dot_q", "cosine", F.col("rank").cast("long").alias("rank"))
    )
