"""Sequence-packing invariants: exactly-once assignment, budget
respected, oversize isolation, and determinism under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.packing import pack_sequences


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(900)) + 1).alias("toks"),
    )


def test_packing_exactly_once_and_budget(spark):
    df = _corpus(spark)
    packed = pack_sequences(df, "id", "toks", max_tokens=2048, n_buckets=16)
    rows = packed.collect()
    assert len(rows) == 2000
    assert len({r.id for r in rows}) == 2000  # every doc exactly once
    sums = (
        packed.filter(~F.col("oversize"))
        .groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert all(r.s <= 2048 for r in sums)
    # positions are dense 0..k-1 per sequence
    pos = packed.groupBy("seq_id").agg(
        F.count("*").alias("n"), F.max("seq_pos").alias("mx")
    )
    assert pos.filter(F.col("mx") != F.col("n") - 1).count() == 0


def test_packing_oversize_isolated(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 5000), (3, 200)], "id long, toks long"
    )
    packed = pack_sequences(df, "id", "toks", max_tokens=1024, n_buckets=1)
    by_id = {r.id: r for r in packed.collect()}
    assert by_id[2].oversize
    # the oversize doc shares its sequence with nobody
    seq_of_2 = by_id[2].seq_id
    assert sum(1 for r in by_id.values() if r.seq_id == seq_of_2) == 1


def test_packing_deterministic_under_repartitioning(spark):
    df = _corpus(spark, 1000)
    a = pack_sequences(df.repartition(3), "id", "toks", 2048, n_buckets=8)
    b = pack_sequences(df.repartition(17, "toks"), "id", "toks", 2048, n_buckets=8)
    ka = sorted((r.id, r.seq_id, r.seq_pos) for r in a.collect())
    kb = sorted((r.id, r.seq_id, r.seq_pos) for r in b.collect())
    assert ka == kb
