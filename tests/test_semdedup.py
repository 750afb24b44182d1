"""Unit tests for operators/semdedup.py — the within-cluster integer
cosine threshold marking (SemDeDup). Query-level value checks live in
q165's DuckDB oracle; these pin the operator's contract on hand-built
frames: exact threshold boundaries, zero-norm exclusion, survivor
policy, and cluster isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.semdedup import (
    cosine_ge_int,
    semantic_dedup,
)


def _quant(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, qv array<long>")


def _assign(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, cluster long")


def test_cosine_ge_int_boundaries(spark):
    df = spark.createDataFrame(
        [
            # identical vectors: cos = 1 -> passes tau = 1/1
            (1, [3, 4], [3, 4]),
            # orthogonal: cos = 0 -> fails any positive tau
            (2, [1, 0], [0, 1]),
            # cos = 0.6 exactly ([3,4]·[1,0]=3, norms 5 and 1)
            (3, [3, 4], [1, 0]),
            # opposite direction: dot < 0 -> always fails
            (4, [1, 1], [-1, -1]),
            # zero norm on one side -> never similar, even to itself
            (5, [0, 0], [0, 0]),
        ],
        "id long, a array<long>, b array<long>",
    )
    got = {
        r["id"]: (r["t10"], r["t35"], r["t61"])
        for r in df.select(
            "id",
            cosine_ge_int(F.col("a"), F.col("b"), 1, 1).alias("t10"),
            cosine_ge_int(F.col("a"), F.col("b"), 3, 5).alias("t35"),
            cosine_ge_int(F.col("a"), F.col("b"), 61, 100).alias("t61"),
        ).collect()
    }
    assert got[1] == (True, True, True)
    assert got[2] == (False, False, False)
    # cos = 0.6: >= 3/5 holds (boundary inclusive), >= 0.61 does not
    assert got[3] == (False, True, False)
    assert got[4] == (False, False, False)
    assert got[5] == (False, False, False)


def test_cosine_ge_int_rejects_bad_tau(spark):
    with pytest.raises(ValueError):
        cosine_ge_int(F.lit([1]), F.lit([1]), 0, 1)
    with pytest.raises(ValueError):
        cosine_ge_int(F.lit([1]), F.lit([1]), 3, 2)


def test_semantic_dedup_survivor_and_cluster_isolation(spark):
    # cluster 0: 10 and 11 are near-identical, 12 is orthogonal to both.
    # cluster 1: 20 is a twin of 10 but in ANOTHER cluster -> untouched
    # (SemDeDup only ever compares within a cell).
    quant = _quant(
        spark,
        [
            (10, [100, 0, 0]),
            (11, [100, 1, 0]),
            (12, [0, 0, 100]),
            (20, [100, 0, 0]),
        ],
    )
    assign = _assign(spark, [(10, 0), (11, 0), (12, 0), (20, 1)])
    removed = semantic_dedup(quant, assign, tau_num=9, tau_den=10)
    rows = {r["vec_id"]: (r["cluster"], r["witness"]) for r in removed.collect()}
    assert rows == {11: (0, 10)}


def test_semantic_dedup_witness_is_smallest_id(spark):
    # three-way duplicate group: 2 and 3 both removed, both witnessed by 1
    quant = _quant(spark, [(1, [10, 0]), (2, [10, 0]), (3, [10, 0])])
    assign = _assign(spark, [(1, 0), (2, 0), (3, 0)])
    removed = semantic_dedup(quant, assign)
    rows = {r["vec_id"]: r["witness"] for r in removed.collect()}
    assert rows == {2: 1, 3: 1}


def test_semdedup_numpy_matches_hof(spark):
    """r11: the per-cell numpy int64 Gram verify must reproduce the
    Catalyst HOF pair predicate EXACTLY (pure integer arithmetic on
    both paths — any divergence is a bug, not rounding). Rebuilds the
    HOF form inline and compares full (vec_id, cluster, witness)
    row sets on a mixed fixture (duplicates, near-misses, zero-norm,
    multiple clusters, singleton cluster)."""
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(120):
        base = [rnd.randint(-40, 40) for _ in range(8)]
        rows.append((i, [x * 3 for x in base]))
        if i % 4 == 0:  # plant a τ-near twin with a higher id
            rows.append(
                (1000 + i, [x * 3 + rnd.randint(-1, 1) for x in base])
            )
    rows.append((5000, [0] * 8))  # zero-norm: never similar
    quant = _quant(spark, rows)
    # twins (id 1000+i) share their base's cluster so the verify has
    # real work; the raw id%3 rule silently separated every twin
    assign = _assign(
        spark, [(r[0], (r[0] % 1000) % 3) for r in rows]
    )

    got = {
        (r.vec_id, r.cluster, r.witness)
        for r in semantic_dedup(quant, assign, tau_num=9, tau_den=10).collect()
    }

    # reference: the original Catalyst HOF pair-join form
    vecs = quant.join(assign, "vec_id").select(
        F.col("vec_id").alias("_id"), F.col("qv").alias("_v"), "cluster"
    )
    a = vecs.select(
        F.col("_id").alias("_ida"), F.col("_v").alias("_va"), "cluster"
    )
    b = vecs.select(
        F.col("_id").alias("_idb"), F.col("_v").alias("_vb"), "cluster"
    )
    want = {
        (r.vec_id, r.cluster, r.witness)
        for r in a.join(b, "cluster")
        .where(F.col("_ida") < F.col("_idb"))
        .where(cosine_ge_int(F.col("_va"), F.col("_vb"), 9, 10))
        .groupBy(F.col("_idb").alias("vec_id"), "cluster")
        .agg(F.min("_ida").alias("witness"))
        .collect()
    }
    assert got == want and len(want) > 10
