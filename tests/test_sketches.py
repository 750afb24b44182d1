"""Unit tests for operators/sketches.py — count-min sketch vs an exact
reference CMS computed driver-side with the same md5 hash family."""

from __future__ import annotations

import hashlib
import random
from collections import Counter

from cubicerp_client_etl_spark.operators.sketches import cms_build, cms_estimate

DEPTH, WIDTH, SEED = 3, 32, "t"


def _bucket(tok: str, rw: int) -> int:
    h = hashlib.md5(f"{tok}|cms{SEED}|{rw}".encode()).hexdigest()[:8]
    return int(h, 16) % WIDTH


def test_sketch_matches_reference_and_never_undercounts(spark):
    rng = random.Random(9)
    toks = [f"w{rng.randint(0, 40)}" for _ in range(3000)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    cms = cms_build(df, depth=DEPTH, width=WIDTH, seed=SEED)
    # reference grid
    grid = Counter()
    for t in toks:
        for rw in range(DEPTH):
            grid[(rw, _bucket(t, rw))] += 1
    got = {(r.rw, r.bucket): r.c for r in cms.collect()}
    assert got == dict(grid)

    truth = Counter(toks)
    probe_toks = ["w0", "w17", "w40", "absent"]
    probes = spark.createDataFrame([(t,) for t in probe_toks], "token string")
    est = {
        r.token: r.est_count
        for r in cms_estimate(
            cms, probes, depth=DEPTH, width=WIDTH, seed=SEED
        ).collect()
    }
    for t in probe_toks:
        want = min(grid[(rw, _bucket(t, rw))] for rw in range(DEPTH))
        assert est[t] == want
        assert est[t] >= truth.get(t, 0)  # CMS never undercounts


def test_sketches_merge_by_sum(spark):
    a = spark.createDataFrame([("x",), ("y",), ("x",)], "token string")
    b = spark.createDataFrame([("x",), ("z",)], "token string")
    merged = (
        cms_build(a, depth=DEPTH, width=WIDTH, seed=SEED)
        .unionAll(cms_build(b, depth=DEPTH, width=WIDTH, seed=SEED))
        .groupBy("rw", "bucket")
        .sum("c")
        .withColumnRenamed("sum(c)", "c")
    )
    whole = cms_build(a.unionAll(b), depth=DEPTH, width=WIDTH, seed=SEED)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_ivf_multiprobe_recall_not_below_single_probe(spark):
    """nprobe=2 must recover at least the nprobe=1 recall against the
    exact brute-force top-k (on the embeddings fixture)."""
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators import similarity as sim

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", sim.as_double("embedding").alias("v"))
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    probe_ids = [10, 20, 30]
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    exact = sim.brute_force_topk(
        emb.withColumnRenamed("v", "embedding"),
        probes.select("probe_id", F.col("pv").alias("embedding")),
        k=5,
        id_col="vec_id",
    )
    truth = {
        (r.probe_id, r.vec_id)
        for r in exact.collect()
        if r.probe_id != r.vec_id
    }

    def recall(nprobe: int) -> float:
        got = {
            (r.probe_id, r.vec_id)
            for r in sim.ivf_topk(emb, cents, probes, k=5, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert recall(8) >= r2  # probing every cluster == the exact scan
