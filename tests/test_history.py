"""Invariants for operators/history: SCD2 intervals tile the timeline
per key with no overlap and one open interval; snapshot_diff is
reflexively 'unchanged' and classifies all four transitions; hash_split
is deterministic and partition-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.history import (
    hash_split,
    scd2_intervals,
    snapshot_diff,
)


def test_scd2_intervals_tile_timeline(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10.0, 100),
        (1, "2024-01-03 00:00:00", 11.0, 101),
        (1, "2024-01-02 00:00:00", 12.0, 102),
        (2, "2024-01-05 00:00:00", 20.0, 103),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double, event_id long"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value", "event_id")
    scd = scd2_intervals(df, "user_id", ["ts", "event_id"], ["value"]).collect()
    by_user = {}
    for r in scd:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.version)
        # exactly one current (open) interval per key, and it's the last
        assert [r.is_current for r in ivs] == [False] * (len(ivs) - 1) + [True]
        assert ivs[-1].valid_to is None
        # consecutive intervals chain exactly: valid_to == next valid_from
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
        # versions are 1..n in ts order
        assert [r.version for r in ivs] == list(range(1, len(ivs) + 1))
    # out-of-order input still yields ts-ordered versions
    u1 = sorted(by_user[1], key=lambda r: r.version)
    assert [r.value for r in u1] == [10.0, 12.0, 11.0]


def test_snapshot_diff_classifies_all_transitions(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 2.0), (4, 40.0)], "k long, v double"
    )
    d = {r.k: r.change for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert d == {1: "unchanged", 2: "changed", 3: "deleted", 4: "inserted"}
    # reflexive: diff(x, x) is all unchanged (NULL-safe compare)
    refl = snapshot_diff(old, old, "k", ["v"]).select("change").distinct().collect()
    assert [r.change for r in refl] == ["unchanged"]


def test_hash_split_partition_independent(spark):
    df1 = spark.range(1000).select(F.col("id").alias("k"))
    a = {r.k: r.split for r in df1.coalesce(1).select("k", hash_split("k")).collect()}
    b = {
        r.k: r.split
        for r in df1.repartition(16).select("k", hash_split("k")).collect()
    }
    assert a == b
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.10 < frac < 0.28  # ~3/16 expected


def test_gap_fill_daily_dense_and_ffilled(spark):
    import datetime as dt

    from cubicerp_client_etl_spark.operators.history import gap_fill_daily

    d = dt.date
    obs = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 10),
            (1, d(2024, 1, 4), 40),  # 2-day gap
            (2, d(2024, 2, 1), 7),  # single-day key
        ],
        "k long, day date, v long",
    )
    out = gap_fill_daily(obs, key="k", day_col="day", value_col="v").collect()
    got = {(r["k"], str(r["day"])): (r["v"], r["is_observed"]) for r in out}
    assert got == {
        (1, "2024-01-01"): (10, True),
        (1, "2024-01-02"): (10, False),
        (1, "2024-01-03"): (10, False),
        (1, "2024-01-04"): (40, True),
        (2, "2024-02-01"): (7, True),
    }


def test_prefix_sum_matches_naive_window(spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.prefix import prefix_sum

    rows = [(i, ((i * 37) % 100) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").select(
        "k", F.col("v").cast("decimal(18,4)").alias("v")
    )
    got = {
        r["k"]: r["cum"]
        for r in prefix_sum(df, [F.col("v").desc(), F.col("k").asc()], "v").collect()
    }
    w = W.orderBy(F.col("v").desc(), F.col("k").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = {r["k"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_prefix_sum_multi_matches_naive_windows(spark):
    """Two running totals (value + ones-as-rank) from ONE ranged
    checkpoint must match two independent global windows exactly —
    the shape abc_classification rides."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.prefix import prefix_sum_multi

    rows = [(i, ((i * 37) % 100) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").withColumn(
        "one", F.lit(1).cast("bigint")
    )
    order = [F.col("v").desc(), F.col("k").asc()]
    got = {
        r["k"]: (r["cum_v"], r["rank"])
        for r in prefix_sum_multi(
            df, order, ["v", "one"], ["cum_v", "rank"]
        ).collect()
    }
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["k"]: (r["cum_v"], r["rank"])
        for r in df.withColumn("cum_v", F.sum("v").over(w))
        .withColumn("rank", F.sum("one").over(w))
        .collect()
    }
    assert got == want


def test_prefix_sum_stable_across_reruns(spark):
    """ADVICE r2 (medium): the ranged frame feeds two subtrees; pid
    assignment must be materialized once (localCheckpoint) so repeated
    actions over the same operator output — and fresh invocations —
    agree exactly, independent of exchange reuse."""
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.prefix import prefix_sum

    rows = [(i, ((i * 91) % 50) + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "k long, v long").select(
        "k", F.col("v").cast("decimal(18,4)").alias("v")
    )
    out = prefix_sum(df, [F.col("k").asc()], "v")
    first = sorted((r["k"], str(r["cum"])) for r in out.collect())
    again = sorted((r["k"], str(r["cum"])) for r in out.collect())
    fresh = sorted(
        (r["k"], str(r["cum"]))
        for r in prefix_sum(df, [F.col("k").asc()], "v").collect()
    )
    assert first == again == fresh


def test_prefix_sum_by_matches_naive_keyed_window(spark):
    """prefix_sum_by (the keyed two-phase scan behind q017/q142) must
    bit-match the naive PARTITION BY window on decimals, including NULL
    keys as their own group and keys that span many range partitions."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.prefix import prefix_sum_by

    rows = [
        (i, None if i % 11 == 0 else f"d{i % 3}", ((i * 37) % 100) + 1)
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "k long, dom string, v long").select(
        "k", "dom", F.col("v").cast("decimal(18,4)").alias("v")
    )
    got = {
        r["k"]: str(r["cum"])
        for r in prefix_sum_by(df, ["dom"], [F.col("k").asc()], "v").collect()
    }
    w = W.partitionBy("dom").orderBy(F.col("k").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = {
        r["k"]: str(r["cum"])
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_prefix_scan_guards_reserved_columns(spark):
    import pytest
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.operators.prefix import (
        prefix_sum,
        prefix_sum_by,
    )

    df = spark.createDataFrame([(1, 2, 3)], "k long, v long, _pid long")
    with pytest.raises(ValueError, match="_pid"):
        prefix_sum(df, [F.col("k")], "v")
    with pytest.raises(ValueError, match="_pid"):
        prefix_sum_by(df, ["k"], [F.col("k")], "v")
