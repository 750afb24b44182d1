"""L-pipeline sampling: keyed md5 Bernoulli sampling must be
deterministic, rate-accurate, and exact at the 0/1 edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.sampling import (
    deterministic_sample,
    weighted_mixture,
)


def test_sample_rate_accuracy_and_determinism(spark):
    df = spark.range(20000).withColumnRenamed("id", "k")
    kept = deterministic_sample(df, "k", 0.3, seed="s1")
    n = kept.count()
    assert abs(n / 20000 - 0.3) < 0.02
    # same key/seed/rate ⇒ identical sample, any run
    again = deterministic_sample(spark.range(20000).withColumnRenamed("id", "k"), "k", 0.3, seed="s1")
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0
    # a different seed gives an (almost) independent sample
    other = deterministic_sample(df, "k", 0.3, seed="s2")
    overlap = kept.join(other, "k").count()
    assert abs(overlap / 20000 - 0.09) < 0.02  # P(both) ≈ 0.3²


def test_sample_edge_rates_exact(spark):
    df = spark.range(5000).withColumnRenamed("id", "k")
    assert deterministic_sample(df, "k", 1.0).count() == 5000
    assert deterministic_sample(df, "k", 0.0).count() == 0


def test_weighted_mixture_realizes_blend(spark):
    df = spark.range(30000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("g"),
    )
    out = weighted_mixture(
        df, "k", "g", {"a": 1.0, "b": 0.5, "c": 0.0}, seed="mix"
    )
    got = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert got.get("a") == 10000  # rate 1.0 keeps every row exactly
    assert "c" not in got  # rate 0.0 drops all
    assert abs(got.get("b", 0) / 10000 - 0.5) < 0.03
