"""Unit tests for operators/retention.py — content fingerprint,
cluster retention policy, incremental dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.retention import (
    bag_of_words_key,
    incremental_dedup,
    keep_best_per_cluster,
)


def test_bow_key_order_and_repetition_insensitive(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "fox brown quick the"),          # same vocab, reordered
            (3, "the the quick brown fox fox"),  # same vocab, repeated
            (4, "the quick brown wolf"),         # different vocab
        ],
        "id long, text string",
    )
    keys = {
        r.id: r.k
        for r in df.select("id", bag_of_words_key("text").alias("k")).collect()
    }
    assert keys[1] == keys[2] == keys[3]
    assert keys[4] != keys[1]


def test_keep_best_picks_max_score_lowest_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("a", 10, 100),
            ("a", 30, 101),
            ("a", 30, 102),  # tie on score → lowest id wins
            ("b", 5, 200),
        ],
        "cluster string, score long, id long",
    )
    out = {
        r.cluster: r.id
        for r in keep_best_per_cluster(
            df, "cluster", score=F.col("score"), tie_breaker=F.col("id")
        ).collect()
    }
    assert out == {"a": 101, "b": 200}


def test_incremental_dedup_drops_seen_and_intra_batch_dups(spark):
    batch = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k2"), (4, "k3")], "id long, key string"
    )
    seen = spark.createDataFrame([("k2",), ("k9",)], "key string")
    out = incremental_dedup(
        batch, seen, key_col="key", order_by=[F.col("id")]
    ).collect()
    got = {(r.id, r.key) for r in out}
    # k1 collapses to its first row (id=1), k2 is already seen, k3 is new
    assert got == {(1, "k1"), (4, "k3")}
