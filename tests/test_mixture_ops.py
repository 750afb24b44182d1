"""Unit tests for the round-6 continuation operators: hashed-feature
linear scoring (operators/classifier.py), temperature mixture
allocation + isqrt (operators/budget.py, functions.isqrt_exact),
length-bucketed batching (operators/packing.py), and the source
overlap matrix (operators/drift.py). Query-level value checks live in
q166–q169's DuckDB oracles; these pin operator contracts on hand-built
frames."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.functions import isqrt_exact
from cubicerp_client_etl_spark.operators.budget import temperature_mixture
from cubicerp_client_etl_spark.operators.classifier import (
    derived_weights,
    score_documents,
)
from cubicerp_client_etl_spark.operators.drift import source_overlap_matrix
from cubicerp_client_etl_spark.operators.packing import (
    length_bucketed_batches,
)


def test_isqrt_exact_matches_python(spark):
    vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**12, 10**12 + 1, (1 << 52) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {
        r["c"]: r["s"]
        for r in df.select("c", isqrt_exact(F.col("c")).alias("s")).collect()
    }
    assert got == {v: math.isqrt(v) for v in vals}


def test_score_documents_known_weights(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id long, text string"
    )
    # explicit 2-bucket weight table; hash parity of the tokens decides
    # the buckets, so compute expected from the operator's own hash
    from cubicerp_client_etl_spark.operators.classifier import token_bucket

    weights = spark.createDataFrame([(0, 5), (1, -7)], "bucket long, w long")
    tok2bucket = {
        r["t"]: r["b"]
        for r in spark.createDataFrame([("a",), ("b",), ("c",)], "t string")
        .select("t", token_bucket(F.col("t"), 2, "s").alias("b"))
        .collect()
    }
    wmap = {0: 5, 1: -7}
    expected = {
        1: wmap[tok2bucket["a"]] * 2 + wmap[tok2bucket["b"]] + 3,
        2: wmap[tok2bucket["c"]] + 3,
    }
    scored = score_documents(
        docs, weights, n_buckets=2, salt="s", intercept=3
    )
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert got == expected


def test_derived_weights_bounded_and_deterministic(spark):
    w1 = derived_weights(spark, 64, "x", spread=10).collect()
    w2 = derived_weights(spark, 64, "x", spread=10).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
    assert all(-10 <= r["w"] <= 10 for r in w1)
    assert len(w1) == 64


def test_temperature_mixture_sums_to_budget(spark):
    docs = spark.createDataFrame(
        [("web", 10000), ("web", 6000), ("books", 100), ("code", 900)],
        "source string, n_tokens long",
    )
    out = temperature_mixture(docs, "source", "n_tokens", budget=100)
    rows = {r["source"]: r for r in out.collect()}
    assert sum(r["target"] for r in rows.values()) == 100
    # alpha=0.5 weights: isqrt of the domain totals
    assert rows["web"]["w"] == math.isqrt(16000)
    assert rows["books"]["w"] == 10
    assert rows["code"]["w"] == 30
    # flattening: web has 160x books' tokens but only ~12.6x the weight
    assert rows["web"]["target"] < 160 * max(rows["books"]["target"], 1)


def test_length_bucketed_batches_shape(spark):
    docs = spark.createDataFrame(
        [(i, 10 + (i % 3)) for i in range(100)], "doc_id long, n_tokens long"
    )
    out = length_bucketed_batches(
        docs, "doc_id", "n_tokens", bucket_width=4, batch_size=8, seed="t"
    ).collect()
    assert len(out) == 100
    # buckets: tokens 10-12 -> bands 2 and 3
    for r in out:
        assert r["bucket"] == r["n_tokens"] // 4
    # every batch except possibly the last per bucket holds batch_size
    from collections import Counter

    per_batch = Counter((r["bucket"], r["batch_id"]) for r in out)
    per_bucket_max = {}
    for (b, bid), n in per_batch.items():
        per_bucket_max[b] = max(per_bucket_max.get(b, -1), bid)
    for (b, bid), n in per_batch.items():
        if bid < per_bucket_max[b]:
            assert n == 8, (b, bid, n)
        else:
            assert 1 <= n <= 8


def test_length_bucketed_batches_deterministic_under_repartition(spark):
    docs = spark.createDataFrame(
        [(i, 10) for i in range(50)], "doc_id long, n_tokens long"
    )
    a = length_bucketed_batches(
        docs, "doc_id", "n_tokens", bucket_width=4, batch_size=7, seed="t"
    ).collect()
    b = length_bucketed_batches(
        docs.repartition(13),
        "doc_id",
        "n_tokens",
        bucket_width=4,
        batch_size=7,
        seed="t",
    ).collect()
    key = lambda rows: sorted((r["doc_id"], r["batch_id"]) for r in rows)
    assert key(a) == key(b)


def test_source_overlap_matrix_exact_counts(spark):
    sh = spark.createDataFrame(
        [
            ("a", "x"), ("a", "y"), ("a", "z"),
            ("b", "y"), ("b", "z"), ("b", "w"),
            ("c", "q"),          # no overlap with anyone
            ("a", "y"),          # duplicate must not double-count
        ],
        "source string, sh string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(sh).collect()
    }
    assert set(rows) == {("a", "b")}
    r = rows[("a", "b")]
    assert (r["n_inter"], r["sz_a"], r["sz_b"]) == (2, 3, 3)
    assert r["jaccard_e6"] == 2 * 10**6 // 4
    assert r["cont_a_e6"] == 2 * 10**6 // 3
