"""Distributed PCA — exact-integer cross-moment matrix + deterministic
power iteration for the dominant principal direction.

The linear-algebra member of the repo's iterative family (k-means
``clustering.py``, PageRank ``graph.py``, BPE ``bpe.py``): the corpus
is scanned ONCE to accumulate the d×d scatter matrix, after which
every iteration is Catalyst arithmetic over the BOUNDED matrix — the
only shape that survives 100 TB, because the data-sized stage is a
single map-side-combinable aggregation and the O(d²) matrix (4096
rows at d = 64) broadcasts anywhere.

Exactness discipline: vectors are e3-quantized (the q165/q178
precedent), so the centered scatter uses the one-shot identity

    css[i,j] = n·Σ q_i q_j − (Σ q_i)(Σ q_j)   ( = n² · cov[i,j] )

— no mean-subtraction pass, no catastrophic cancellation, pure
integer. Power iteration then renormalizes with the MAX-ABS norm
(v' = v·1000 div max|v|, truncation toward zero — identical in Spark
``div`` and DuckDB ``//``) instead of the L2 norm: max-abs keeps every
intermediate in bigint with headroom and needs no square root, and any
positively-scaled renormalization leaves the power-iteration fixpoint
direction unchanged. Every iterate is therefore an exact integer
vector any engine replays bit-for-bit; convergence gives the dominant
eigendirection to quantization precision (the deterministic all-ones
start loses only eigendirections exactly orthogonal to it —
measure-zero for data scatter).

Reference has no linear algebra; this extends the LLM-pipeline
extension's embedding stack (similarity/semdedup/moments) with the
decorrelation step whitening/indexing stages run first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

V_SCALE = 1000  # max-abs of every normalized iterate


def quantized_dims(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Explode vectors to ``(id_col, i, qv)`` rows with e3-quantized
    integer coordinates (floor(v·1000 + 0.5) — round-half-up, the
    q165/q178 quantization)."""
    return emb.select(
        id_col,
        F.posexplode(
            F.transform(
                F.col(vec_col).cast("array<double>"),
                lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("bigint"),
            )
        ).alias("_d0", "qv"),
    ).select(id_col, (F.col("_d0") + 1).alias("i"), "qv")


def scatter_matrix(dims: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Centered scatter matrix over ``quantized_dims`` rows:
    ``(i, j, a)`` with a = (n·Σ q_i q_j − Σq_i·Σq_j) div n — the n·cov
    scale, divided back by n so downstream products keep bigint
    headroom. All d² entries (both triangles — the consumer does plain
    matrix-vector products).

    Plan: the cross-product join fans each vector out d× against its
    own coordinates (the standard Gram accumulation — bounded d² per
    vector, data scanned once), then ONE keyed agg on (i, j) with
    map-side partials; first moments and n ride along in a broadcast.
    """
    a = dims.select(F.col(id_col).alias("_id"), F.col("i"), F.col("qv"))
    b = dims.select(
        F.col(id_col).alias("_id"), F.col("i").alias("j"), F.col("qv").alias("qw")
    )
    cross = (
        a.join(b, "_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("qv") * F.col("qw")).cast("bigint").alias("_sqq"))
    )
    firsts = dims.groupBy("i").agg(F.sum("qv").cast("bigint").alias("_s1"))
    n = dims.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    f_i = firsts.select(F.col("i"), F.col("_s1").alias("_s1i"))
    f_j = firsts.select(F.col("i").alias("j"), F.col("_s1").alias("_s1j"))
    return (
        cross.join(F.broadcast(f_i), "i")
        .join(F.broadcast(f_j), "j")
        .join(F.broadcast(n))
        .select(
            "i",
            "j",
            F.expr("CAST((_n * _sqq - _s1i * _s1j) div _n AS BIGINT)").alias("a"),
        )
    )


def _renorm(v: DataFrame) -> DataFrame:
    """v·V_SCALE div max|v| — exact max-abs renormalization with
    truncation toward zero (sign·(|v|·S div m) — ``div`` truncates the
    same way in Spark and DuckDB, kept explicit anyway)."""
    m = v.agg(F.max(F.abs(F.col("v"))).cast("bigint").alias("_m"))
    return v.join(F.broadcast(m)).select(
        "i",
        (
            F.signum(F.col("v")).cast("bigint")
            * F.expr(f"CAST((abs(v) * {V_SCALE}) div _m AS BIGINT)")
        ).alias("v"),
    )


def power_iteration_top(
    scatter: DataFrame, d: int, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Dominant eigendirection of the ``scatter_matrix`` by ``iters``
    rounds of w = A·v, v = renorm(w) from the all-ones start.

    Returns ``(v, lam)``: ``v`` = (i, v) the final normalized integer
    direction (max-abs = V_SCALE), ``lam`` = one row (lambda0) with the
    Rayleigh quotient (v·Av) div (v·v) — the dominant eigenvalue at the
    scatter's n·cov scale, plain integer division (precision ~1e-6 of
    the eigenvalue at V_SCALE = 1000; no e6 blow-up, so the oracle's
    bigint replay never overflows).

    Every round is two bounded joins over the d²-row matrix — no
    data-sized state; localCheckpoint between rounds is unnecessary
    because the lineage is d²-bounded (contrast ``operators/graph``,
    whose per-round frames are data-sized).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = scatter.sparkSession
    v = spark.range(1, d + 1).select(
        F.col("id").alias("i"), F.lit(V_SCALE).cast("bigint").alias("v")
    )
    aj = scatter.select("i", F.col("j"), F.col("a"))
    for _ in range(iters):
        w = (
            aj.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("a") * F.col("v")).cast("bigint").alias("v"))
        )
        v = _renorm(w)
    w = (
        aj.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
        .groupBy("i")
        .agg(F.sum(F.col("a") * F.col("v")).cast("bigint").alias("w"))
    )
    lam = (
        v.join(w, "i")
        .agg(
            F.sum(F.col("v") * F.col("w")).cast("bigint").alias("_vw"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("_vv"),
        )
        .select(F.expr("CAST(_vw div _vv AS BIGINT)").alias("lambda0"))
    )
    return v, lam
