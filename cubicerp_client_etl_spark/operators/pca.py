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
from cubicerp_client_etl_spark.checkpointing import pin_eager

V_SCALE = 1000  # max-abs of every normalized iterate


def quantized_vectors(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """Per-row e3-quantized integer vectors ``(id_col, *extra, qarr)``
    (floor(v·1000 + 0.5) — round-half-up, the q165/q178 quantization).
    Pure map projection — the array is NOT exploded, so downstream
    outer products stay map-side; ``extra`` carries grouping columns
    (label, source) along rather than re-joining them later."""
    if "qarr" in (id_col, *extra) or "qarr" in emb.columns:
        raise ValueError("'qarr' is the reserved output column; rename it")
    return emb.select(
        id_col,
        *extra,
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("bigint"),
        ).alias("qarr"),
    )


def quantized_dims(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Exploded form of ``quantized_vectors``: ``(id_col, i, qv)`` rows
    (1-based dim index) — for consumers that genuinely need one row
    per coordinate."""
    return quantized_vectors(emb, vec_col, id_col).select(
        id_col,
        F.posexplode("qarr").alias("_d0", "qv"),
    ).select(id_col, (F.col("_d0") + 1).alias("i"), "qv")


def gram_partials(vecs: DataFrame) -> DataFrame:
    """Arrow-batched exact int64 moment partials over ``(.., qarr)``
    rows: per batch, one numpy matmul emits the Gram partial QᵀQ as
    (i, j, p) rows (1-based dims), column sums as (i, 0, s1), and the
    row count as (0, 0, n) — ≤ d²+d+1 rows per batch, ADDITIVE, so
    batch shards and stream micro-batches merge by a plain keyed sum
    (``streaming/jobs.stream_gram_partials`` is literally this plus
    update-mode state)."""

    def _partials(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if pdf.empty:
                continue
            q = np.stack(pdf["qarr"].to_numpy()).astype(np.int64)
            d = q.shape[1]
            g = q.T @ q  # exact int64 Gram partial
            s1 = q.sum(axis=0)
            i = np.repeat(np.arange(1, d + 1), d)
            j = np.tile(np.arange(1, d + 1), d)
            out = pd.DataFrame({"i": i, "j": j, "p": g.reshape(-1)})
            moments = pd.DataFrame(
                {"i": np.arange(1, d + 1), "j": np.zeros(d, dtype=np.int64),
                 "p": s1}
            )
            count = pd.DataFrame({"i": [0], "j": [0], "p": [len(pdf)]})
            yield pd.concat([out, moments, count], ignore_index=True)

    return vecs.select("qarr").mapInPandas(_partials, "i long, j long, p long")


def scatter_matrix(vecs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Centered scatter matrix over ``quantized_vectors`` rows:
    ``(i, j, a)`` with a = (n·Σ q_i q_j − Σq_i·Σq_j) div n — the n·cov
    scale, divided back by n so downstream products keep bigint
    headroom. All d² entries (both triangles — the consumer does plain
    matrix-vector products).

    Plan: dense Gram accumulation is the one place the built-in
    operators genuinely lose — a self-join on the vector id shuffles
    the whole corpus to meet rows with themselves, and a nested array
    transform allocates d² structs per row outside vectorization — so
    each Arrow batch computes its EXACT int64 partial QᵀQ (plus column
    sums and count) with one numpy matmul and emits ≤ d²+d+1 partial
    rows; the ONLY shuffle then carries #batches·d² partials, never
    data, into the final (i, j) aggregation. Integer matmul is exact,
    so the result is bit-identical to the relational form and to the
    DuckDB oracle.
    """
    parts = gram_partials(vecs)
    # the bounded (≤ d²+d+1 row) aggregate feeds three subtrees (gram,
    # first moments, count) — pin it so the corpus is scanned ONCE
    # (the prefix.py localCheckpoint pattern)
    agg = (
        parts.groupBy("i", "j")
        .agg(F.sum("p").cast("bigint").alias("_sqq"))
        .transform(pin_eager)
    )
    cross = agg.where((F.col("i") > 0) & (F.col("j") > 0))
    firsts = agg.where((F.col("i") > 0) & (F.col("j") == 0)).select(
        "i", F.col("_sqq").alias("_s1")
    )
    n = agg.where((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("_sqq").alias("_n")
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


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark's ``div`` /
    DuckDB's ``//`` on matching signs (Python ``//`` floors, which
    differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _scatter_to_dense(scatter: DataFrame, d: int) -> list[list[int]]:
    """Collect the BOUNDED (≤ d² rows, data-size independent) scatter
    to the driver as a dense Python int matrix — the k-means
    centroid-collect precedent (clustering.py): the iterate math over
    a 64×64 matrix is driver-scale, and running it distributed cost
    ~6 scheduler round-trips per round for 4096-row frames."""
    A = [[0] * d for _ in range(d)]
    for r in scatter.select("i", "j", "a").collect():
        A[r["i"] - 1][r["j"] - 1] = int(r["a"])
    return A


def _matvec_i(A: list[list[int]], v: list[int]) -> list[int]:
    return [sum(row[j] * v[j] for j in range(len(v))) for row in A]


def _renorm_i(w: list[int]) -> list[int]:
    """Exact-int twin of ``_renorm``: sign(x)·(|x|·V_SCALE div max|w|),
    truncation toward zero (operands non-negative, so // == div)."""
    m = max(abs(x) for x in w)
    if m == 0:
        raise ValueError("power iteration degenerated to the zero vector")
    return [
        (0 if x == 0 else (1 if x > 0 else -1)) * ((abs(x) * V_SCALE) // m)
        for x in w
    ]


def _dot_i(a: list[int], b: list[int]) -> int:
    return sum(x * y for x, y in zip(a, b))


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

    r15: the iterate math runs ON THE DRIVER over the collected
    d²-bounded scatter (exact Python ints — bit-identical to the
    former join/agg form, which spent ~0.15 s of scheduler latency per
    bounded 4096-row job; see ``_scatter_to_dense``). The corpus-sized
    work (Gram accumulation) stays distributed in ``scatter_matrix``.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = scatter.sparkSession
    A = _scatter_to_dense(scatter, d)
    v = [V_SCALE] * d
    for _ in range(iters):
        v = _renorm_i(_matvec_i(A, v))
    w = _matvec_i(A, v)
    lam0 = _tdiv(_dot_i(v, w), _dot_i(v, v))
    vdf = spark.createDataFrame(
        [(i + 1, v[i]) for i in range(d)], "i long, v long"
    )
    lamdf = spark.createDataFrame([(lam0,)], "lambda0 long")
    return vdf, lamdf


# ---- keyed (per-group) form ----------------------------------------------


def gram_partials_by(vecs: DataFrame, key_col: str) -> DataFrame:
    """Keyed ``gram_partials``: (key_col, i, j, p) moment partials per
    group — the per-label/per-domain form (class-conditional scatter,
    per-source embedding statistics). Same Arrow/numpy exactness; each
    batch groups its rows by key first, so the shuffle still carries
    only #batches·#keys-in-batch·(d²+d+1) partial rows. The keyed twin
    of the prefix_sum→prefix_sum_by generalization."""

    def _partials(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if pdf.empty:
                continue
            outs = []
            for key, grp in pdf.groupby(key_col, dropna=False, sort=False):
                q = np.stack(grp["qarr"].to_numpy()).astype(np.int64)
                d = q.shape[1]
                g = q.T @ q
                s1 = q.sum(axis=0)
                i = np.repeat(np.arange(1, d + 1), d)
                j = np.tile(np.arange(1, d + 1), d)
                out = pd.DataFrame({key_col: key, "i": i, "j": j, "p": g.reshape(-1)})
                moments = pd.DataFrame(
                    {key_col: key, "i": np.arange(1, d + 1),
                     "j": np.zeros(d, dtype=np.int64), "p": s1}
                )
                count = pd.DataFrame({key_col: [key], "i": [0], "j": [0],
                                      "p": [len(grp)]})
                outs += [out, moments, count]
            yield pd.concat(outs, ignore_index=True)

    ktype = dict(vecs.dtypes)[key_col]
    return vecs.select(key_col, "qarr").mapInPandas(
        _partials, f"{key_col} {ktype}, i long, j long, p long"
    )


def scatter_matrix_by(vecs: DataFrame, key_col: str) -> DataFrame:
    """Per-group centered scatter matrices ``(key_col, i, j, a)`` —
    ``scatter_matrix`` keyed by ``key_col`` (group cardinality bounds
    every frame at #keys·(d²+d+1) rows; the corpus is still scanned
    once, map-side)."""
    parts = gram_partials_by(vecs, key_col)
    agg = (
        parts.groupBy(key_col, "i", "j")
        .agg(F.sum("p").cast("bigint").alias("_sqq"))
        .transform(pin_eager)
    )
    cross = agg.where((F.col("i") > 0) & (F.col("j") > 0))
    firsts = agg.where((F.col("i") > 0) & (F.col("j") == 0)).select(
        key_col, "i", F.col("_sqq").alias("_s1")
    )
    n = agg.where((F.col("i") == 0) & (F.col("j") == 0)).select(
        key_col, F.col("_sqq").alias("_n")
    )
    f_i = firsts.select(key_col, "i", F.col("_s1").alias("_s1i"))
    f_j = firsts.select(
        key_col, F.col("i").alias("j"), F.col("_s1").alias("_s1j")
    )
    return (
        cross.join(F.broadcast(f_i), [key_col, "i"])
        .join(F.broadcast(f_j), [key_col, "j"])
        .join(F.broadcast(n), key_col)
        .select(
            key_col,
            "i",
            "j",
            F.expr("CAST((_n * _sqq - _s1i * _s1j) div _n AS BIGINT)").alias("a"),
        )
    )


def power_iteration_top_by(
    scatter: DataFrame, key_col: str, d: int, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Per-group dominant eigendirection — ``power_iteration_top``
    keyed by ``key_col``: every iterate is (key, i, v), renorm divides
    by each group's own max|v| (keyed agg + broadcast join), and the
    Rayleigh quotient is per group. All frames bounded by #keys·d."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    keys = scatter.select(key_col).distinct()
    dims = scatter.sparkSession.range(1, d + 1).select(
        F.col("id").alias("i")
    )
    v = keys.join(dims).select(
        key_col, "i", F.lit(V_SCALE).cast("bigint").alias("v")
    )
    aj = scatter.select(key_col, "i", F.col("j"), F.col("a"))

    def matvec(vv: DataFrame, out: str) -> DataFrame:
        return (
            aj.join(
                F.broadcast(vv.select(key_col, F.col("i").alias("j"), "v")),
                [key_col, "j"],
            )
            .groupBy(key_col, "i")
            .agg(F.sum(F.col("a") * F.col("v")).cast("bigint").alias(out))
        )

    for _ in range(iters):
        w = matvec(v, "v")
        m = w.groupBy(key_col).agg(
            F.max(F.abs(F.col("v"))).cast("bigint").alias("_m")
        )
        v = w.join(F.broadcast(m), key_col).select(
            key_col,
            "i",
            (
                F.signum(F.col("v")).cast("bigint")
                * F.expr(f"CAST((abs(v) * {V_SCALE}) div _m AS BIGINT)")
            ).alias("v"),
        )
    w = matvec(v, "w")
    lam = (
        v.join(w, [key_col, "i"])
        .groupBy(key_col)
        .agg(
            F.sum(F.col("v") * F.col("w")).cast("bigint").alias("_vw"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("_vv"),
        )
        .select(key_col, F.expr("CAST(_vw div _vv AS BIGINT)").alias("lambda0"))
    )
    return v, lam


def power_iteration_top2(
    scatter: DataFrame, d: int, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Top TWO principal directions: the dominant one by
    ``power_iteration_top``, the second by power iteration with an
    exact-integer Gram–Schmidt deflation — every iterate is projected
    off v1 (u' = u·(v1·v1) − v1·(v1·u), pure bigint) before
    renormalizing, so the iteration converges to the dominant
    direction of the ORTHOGONAL complement without ever forming the
    (non-integer) deflated matrix A − λ·v1v1ᵀ/(v1·v1).

    Returns ``(dirs, lams)``: dirs = (i, v1, v2) with both directions
    at max-abs V_SCALE; lams = one row (lambda0, lambda1) of the two
    Rayleigh quotients. Deterministic start for u: sign-alternating
    by dim parity (orthogonalization immediately removes any v1
    component, so only exact parallelism — measure-zero — would
    stall). Same bounded-frame plan shape as the top-1 form.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = scatter.sparkSession
    A = _scatter_to_dense(scatter, d)  # one bounded collect for BOTH dirs

    # top-1 recursion, identical to power_iteration_top
    v1 = [V_SCALE] * d
    for _ in range(iters):
        v1 = _renorm_i(_matvec_i(A, v1))
    w = _matvec_i(A, v1)
    lam0 = _tdiv(_dot_i(v1, w), _dot_i(v1, v1))

    def orth(u: list[int]) -> list[int]:
        # exact Gram–Schmidt step: u' = u·(v1·v1) − v1·(v1·u)
        vv, vu = _dot_i(v1, v1), _dot_i(v1, u)
        return [u[i] * vv - v1[i] * vu for i in range(d)]

    # deterministic sign-alternating start by dim parity (i = 1..d)
    u = [-V_SCALE if (i + 1) % 2 == 0 else V_SCALE for i in range(d)]
    u = _renorm_i(orth(u))
    for _ in range(iters):
        u = _renorm_i(orth(_renorm_i(_matvec_i(A, u))))
    w = _matvec_i(A, u)
    lam1 = _tdiv(_dot_i(u, w), _dot_i(u, u))

    dirs = spark.createDataFrame(
        [(i + 1, v1[i], u[i]) for i in range(d)], "i long, v1 long, v2 long"
    )
    lams = spark.createDataFrame([(lam0, lam1)], "lambda0 long, lambda1 long")
    return dirs, lams
