"""SemDeDup-style semantic deduplication: cluster the embedding space,
then mark near-duplicates WITHIN each cluster (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"). The reference engine has no semantic layer at all
(its dedup surface is the keyed merge in cubicerpetl.py:419-451), so
this is part of the LLM-pipeline extension mandated by BASELINE.json.

Why clustering first: all-pairs cosine over a 100 TB embedding corpus
is O(n²) and never finishes. SemDeDup's observation is that semantic
duplicates co-locate in k-means cells, so the candidate join becomes an
EQUI-join on the cluster id — per-cluster quadratic, globally linear in
the number of clusters × (cluster size)². With k sized so clusters fit
comfortably in a shuffle partition (k ≈ n / 10⁴ in the paper), every
stage is a plain keyed shuffle; nothing is all-pairs.

Exact-integer discipline (same as ``operators/clustering.py``): the
cosine threshold test runs entirely on the int8-quantized vectors —
``cos(a,b) ≥ τ  ⇔  dot ≥ 0  AND  den²·dot² ≥ num²·‖a‖²·‖b‖²`` for
τ = num/den — no sqrt, no floats, so a DuckDB oracle replays it
bit-for-bit. Bounds: 64-dim int8 vectors give dot ≤ 64·127² ≈ 1.03e6,
so den²·dot² ≤ 1e4 · 1.07e12 ≈ 1.1e16 < 2⁶³ — safe in BIGINT for
den ≤ 90 at this dimension/quantization.

Survivor policy: a vector is REMOVED iff some same-cluster vector with
a smaller id is τ-similar to it (the lowest-id representative of every
ε-neighbourhood survives). This is the paper's "keep one per group"
rule made deterministic — no RNG, engine-replayable, and expressible
as one aggregation over the candidate-pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def cosine_ge_int(
    vec_a: F.Column, vec_b: F.Column, tau_num: int, tau_den: int
) -> F.Column:
    """Exact predicate ``cos(vec_a, vec_b) >= tau_num / tau_den`` over
    integer vectors (arrays of BIGINT). Zero-norm vectors are never
    τ-similar to anything (cosine undefined → False)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError("need 0 < tau_num <= tau_den")
    dot = _dot(vec_a, vec_b)
    na2 = _dot(vec_a, vec_a)
    nb2 = _dot(vec_b, vec_b)
    num, den = F.lit(tau_num).cast("bigint"), F.lit(tau_den).cast("bigint")
    return (
        (na2 > 0)
        & (nb2 > 0)
        & (dot >= 0)
        & (den * den * dot * dot >= num * num * na2 * nb2)
    )


def semantic_dedup(
    quant: DataFrame,
    assign: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qv",
    cluster_col: str = "cluster",
    tau_num: int = 9,
    tau_den: int = 10,
) -> DataFrame:
    """Within-cluster near-duplicate marking over int-quantized vectors.

    ``quant``: one row per vector — ``(id_col, vec_col: array<bigint>)``.
    ``assign``: the cluster assignment — ``(id_col, cluster_col)``,
    typically the output of ``clustering.kmeans_int``.

    Returns the REMOVED set: one row per dropped vector —
    ``(id_col, cluster_col, witness)`` where ``witness`` is the
    smallest-id same-cluster vector that certified the drop. The kept
    set is the input anti-joined on this result.

    Scale shape: join #1 attaches the cluster id (keyed on ``id_col``);
    join #2 is the candidate self-join — an EQUI-join on
    ``cluster_col`` restricted to ``a.id < b.id``, so a cluster of c
    vectors emits c·(c−1)/2 candidate rows, and the global cost is
    Σ c_i² — the SemDeDup contract (size k to bound max(c_i)). The
    final aggregation reuses the same cluster key. No raw-row windows,
    no cross join, no driver materialization.
    """
    vecs = quant.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).join(
        assign.select(
            F.col(id_col).alias("_id"), F.col(cluster_col).alias("_c")
        ),
        "_id",
    )
    # Per-cell verify as ONE int64 numpy Gram per cluster (r11; the
    # exact-cosine-pairs precedent DISTRIBUTED — applyInPandas groups
    # on the cluster key, no driver collect). The arithmetic is pure
    # INTEGERS so it is trivially bit-identical to the Catalyst HOF
    # form (pinned by test_semdedup_numpy_matches_hof): dot <=
    # 64·127² ≈ 1.03e6 (int8 quantization), den²·dot² <= 1e4·1.07e12
    # ≈ 1.1e16 < 2^63, all safe in int64. The HOF form evaluated three
    # 64-step folds PER PAIR — 56M pairs at the 10x census made the
    # verify the q292-era wall (396 s; semdedup, live q292 after r13); one 2000×64 @ 64×2000 matmul per
    # cell does the same integer ops in milliseconds.
    tn, td = int(tau_num), int(tau_den)
    out_schema = f"{id_col} long, {cluster_col} long, witness long"

    def verify(pdf):
        import numpy as _np
        import pandas as _pd

        if len(pdf) < 2:
            return _pd.DataFrame(
                {id_col: [], cluster_col: [], "witness": []}
            ).astype("int64")
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        ids = pdf["_id"].to_numpy(dtype=_np.int64)
        m = _np.array([list(v) for v in pdf["_v"]], dtype=_np.int64)
        g = m @ m.T  # exact int64 dot products
        n2 = _np.diag(g).copy()
        ok = (
            (n2[:, None] > 0)
            & (n2[None, :] > 0)
            & (g >= 0)
            & (td * td * g * g >= tn * tn * n2[:, None] * n2[None, :])
        )
        # strict upper triangle: witness candidates i < j (id order)
        ok &= _np.tri(len(ids), k=-1, dtype=bool).T
        j_hit = ok.any(axis=0)
        if not j_hit.any():
            return _pd.DataFrame(
                {id_col: [], cluster_col: [], "witness": []}
            ).astype("int64")
        # smallest-id witness per removed vector (rows sorted by id)
        first_i = ok.argmax(axis=0)
        return _pd.DataFrame(
            {
                id_col: ids[j_hit],
                cluster_col: pdf["_c"].to_numpy(dtype=_np.int64)[j_hit],
                "witness": ids[first_i[j_hit]],
            }
        )

    return vecs.groupBy("_c").applyInPandas(verify, schema=out_schema)
