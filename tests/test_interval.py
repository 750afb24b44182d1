"""Unit tests for operators/interval.py — binned interval-overlap join
vs a brute-force pair walk."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.interval import binned_interval_join


def _intervals(spark, n, seed, prefix):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randint(0, 5000)
        rows.append((rng.randint(0, 3), i, s, s + rng.randint(0, 700)))
    return spark.createDataFrame(
        rows, f"k long, {prefix}id long, {prefix}s long, {prefix}e long"
    ), rows


@pytest.mark.parametrize("width", [1, 173, 700, 5000])
def test_matches_bruteforce_across_bin_widths(spark, width):
    left, lrows = _intervals(spark, 80, 7, "a_")
    right, rrows = _intervals(spark, 90, 11, "b_")
    got = {
        (r.a_id, r.b_id)
        for r in binned_interval_join(
            left, right, ["k"], "a_s", "a_e", "b_s", "b_e", bin_width=width
        ).collect()
    }
    want = {
        (a[1], b[1])
        for a in lrows
        for b in rrows
        if a[0] == b[0] and a[2] <= b[3] and b[2] <= a[3]
    }
    assert got == want


def test_each_pair_emitted_exactly_once(spark):
    left, _ = _intervals(spark, 60, 3, "a_")
    right, _ = _intervals(spark, 60, 5, "b_")
    out = binned_interval_join(
        left, right, ["k"], "a_s", "a_e", "b_s", "b_e", bin_width=100
    )
    n_rows = out.count()
    n_pairs = out.select("a_id", "b_id").distinct().count()
    assert n_rows == n_pairs


def test_rejects_column_collisions_and_bad_width(spark):
    df = spark.createDataFrame([(1, 1, 2)], "k long, s long, e long")
    with pytest.raises(ValueError):
        binned_interval_join(df, df, ["k"], "s", "e", "s", "e", bin_width=10)
    left, _ = _intervals(spark, 2, 1, "a_")
    right, _ = _intervals(spark, 2, 2, "b_")
    with pytest.raises(ValueError):
        binned_interval_join(
            left, right, ["k"], "a_s", "a_e", "b_s", "b_e", bin_width=0
        )


def test_rejects_reserved_bin_column_on_either_side(spark):
    """ADVICE r5: a pre-existing _bin on ONE side slips past the
    cross-side collision check but would be silently overwritten and
    dropped — must raise instead."""
    import pytest
    from pyspark.sql import functions as F

    left, _ = _intervals(spark, 3, 1, "a_")
    right, _ = _intervals(spark, 3, 2, "b_")
    with pytest.raises(ValueError, match="_bin"):
        binned_interval_join(
            left.withColumn("_bin", F.lit(9)),
            right, ["k"], "a_s", "a_e", "b_s", "b_e", bin_width=10,
        )
    with pytest.raises(ValueError, match="_bin"):
        binned_interval_join(
            left,
            right.withColumn("_bin", F.lit(9)),
            ["k"], "a_s", "a_e", "b_s", "b_e", bin_width=10,
        )
