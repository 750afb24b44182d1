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


def test_stratified_exact_total_and_proportions(spark):
    from cubicerp_client_etl_spark.operators.sampling import stratified_sample_exact

    # groups 600/300/100 → quotas for n=50: base 30/15/5, no leftover
    rows = []
    for g, n in (("a", 600), ("b", 300), ("c", 100)):
        rows += [(hash((g, i)) % 10**9 + i * 10**9, g) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = stratified_sample_exact(df, "g", "k", total_n=50, seed="s").collect()
    by_g = {}
    for r in out:
        by_g[r["g"]] = by_g.get(r["g"], 0) + 1
    assert sum(by_g.values()) == 50
    assert by_g == {"a": 30, "b": 15, "c": 5}


def test_stratified_largest_remainder_seats(spark):
    from cubicerp_client_etl_spark.operators.sampling import stratified_sample_exact

    # sizes 5/5/5, n=7: base 2 each (6), one leftover seat to the
    # largest remainder — all remainders equal → tie-break by group
    # value ascending gives the seat to 'a'
    rows = [(g * 100 + i, chr(ord("a") + g)) for g in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "k long, g string")
    out = stratified_sample_exact(df, "g", "k", total_n=7, seed="t").collect()
    by_g = {}
    for r in out:
        by_g[r["g"]] = by_g.get(r["g"], 0) + 1
    assert sum(by_g.values()) == 7
    assert by_g["a"] == 3 and by_g["b"] == 2 and by_g["c"] == 2


def test_stratified_deterministic_under_partitioning(spark):
    from cubicerp_client_etl_spark.operators.sampling import stratified_sample_exact

    rows = [(i, f"g{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "k long, g string")
    a = {r["k"] for r in stratified_sample_exact(df, "g", "k", 40, "z").collect()}
    b = {r["k"] for r in
         stratified_sample_exact(df.repartition(9), "g", "k", 40, "z").collect()}
    assert a == b and len(a) == 40


def test_weighted_priority_sample_prefers_heavy_rows(spark):
    """Deterministic weighted sampling: rerun- and partition-stable,
    and across many groups the selected rows' mean weight exceeds the
    population mean (importance-sampling bias toward heavy rows)."""
    import random

    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.sampling import (
        weighted_priority_sample,
    )

    rng = random.Random(11)
    rows = [
        (f"g{i % 40}", i, rng.choice([1, 1, 1, 1, 20]))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    picked = weighted_priority_sample(
        df, group_col="g", weight_col="w", id_col="id", n=5, seed="t"
    )
    got = {(r.g, r.id) for r in picked.collect()}
    again = {
        (r.g, r.id)
        for r in weighted_priority_sample(
            df.repartition(13), group_col="g", weight_col="w", id_col="id",
            n=5, seed="t",
        ).collect()
    }
    assert got == again and len(got) == 40 * 5
    mean_w = sum(w for _, _, w in rows) / len(rows)
    picked_ids = {i for _, i in got}
    picked_mean = sum(w for _, i, w in rows if i in picked_ids) / len(picked_ids)
    assert picked_mean > mean_w * 1.5
