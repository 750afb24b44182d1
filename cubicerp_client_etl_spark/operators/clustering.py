"""Exact-integer Lloyd's k-means over quantized embedding vectors —
the centroid-training stage the IVF ANN index (q184) assumes as given.

Why integer: floating-point k-means can never hash-match across
engines (per-cluster mean sums are accumulation-order-dependent in
double). Quantized int vectors + truncating integer means make every
iteration bit-identical under any partitioning, retry, or engine — so
the whole recursion is value-checkable against a DuckDB oracle, the
same discipline as ``graph.pagerank_int``.

Negative-value discipline: Spark's ``div`` truncates toward zero while
DuckDB's ``//`` floors, so they disagree on negative sums. All
arithmetic therefore runs in SHIFTED space (``x + shift`` ≥ 0, shift =
127 covers int8 quantization): squared-L2 distance is shift-invariant,
and on non-negative sums floor == truncate, so the engines agree.
Centroids are un-shifted on output.

Scale posture per iteration:

* centroids are COLLECTED to the driver — bounded O(k·dim), data-size
  independent (MLlib's KMeans does the same); they re-enter the plan
  as literals, so the assignment pass is a map-only projection over
  the vectors, zero join, zero shuffle;
* the update is one posexplode + groupBy(cid, pos) — a single shuffle
  of k·dim running sums with map-side partial aggregation.

So N iterations cost N scans + N small shuffles; no lineage growth
(each round starts from the same source frame plus fresh literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from cubicerp_client_etl_spark.checkpointing import pin


def _assign_expr(vec: F.Column, centroids: list[list[int]]) -> F.Column:
    """(cluster, dist_sq) struct: argmin of exact squared L2 over the
    literal centroid list, ties to the smaller cluster id — one
    array_min over an array of (dist, cid) structs, pure codegen."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(int(x)).cast("bigint") for x in cv]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                ).alias("dist_sq"),
                F.lit(cid).cast("bigint").alias("cluster"),
            )
            for cid, cv in enumerate(centroids)
        ]
    )
    return F.array_min(scored)


def kmeans_int(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qv",
    k: int = 4,
    iterations: int = 3,
    shift: int = 127,
) -> DataFrame:
    """Fixed-iteration integer Lloyd's over ``vectors[vec_col]``
    (``array`` of ints in ``[-shift, 2^31)``). Returns one row per
    vector: ``(id_col, cluster, dist_sq)`` — the final assignment and
    its exact squared distance (both in shifted space for the distance;
    squared L2 is shift-invariant so it equals the unshifted distance).

    Initialization: the ``k`` lowest-``id_col`` vectors, cluster ids
    assigned in id order (deterministic, matches the oracle). Empty
    clusters keep their previous centroid.
    """
    if k < 1 or iterations < 0:
        raise ValueError("k must be >= 1 and iterations >= 0")
    # Every iteration's assignment pass plus the seed scan re-read the
    # source (and re-run the caller's quantization map) without a
    # checkpoint — N iterations paid the vector build N+1 times. The
    # FINAL assignment below deliberately runs over the raw projection
    # instead, keeping the output plan a pure map over the source scan
    # (no storage dependency — the documented 100 TB posture, pinned by
    # tests/test_plan_posture.py::test_q165_kmeans_assignment_is_join_free).
    shifted_src = vectors.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col), lambda x: (x + F.lit(shift)).cast("bigint")
        ).alias("_v"),
    )
    shifted = shifted_src.transform(pin)
    seed_rows = shifted.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(seed_rows)}")
    centroids: list[list[int]] = [list(r["_v"]) for r in seed_rows]

    for _ in range(iterations):
        assigned = shifted.select(
            "_v", _assign_expr(F.col("_v"), centroids)["cluster"].alias("cluster")
        )
        upd_rows = (
            assigned.select("cluster", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.expr("s div c").alias("m")))
                    ),
                    lambda st: st["m"],
                ).alias("cv")
            )
            .collect()
        )
        for r in upd_rows:
            centroids[int(r["cluster"])] = list(r["cv"])

    final = _assign_expr(F.col("_v"), centroids)
    return shifted_src.select(
        F.col(id_col),
        final["cluster"].alias("cluster"),
        final["dist_sq"].alias("dist_sq"),
    )
