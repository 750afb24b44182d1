"""Unit tests for operators/drift.py."""

from __future__ import annotations

import pytest

from cubicerp_client_etl_spark.operators.drift import unigram_drift


def test_drift_hand_computed(spark):
    a = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 3 + [("z",)] * 1, "token string"
    )
    b = spark.createDataFrame([("x",)] * 2 + [("w",)] * 2, "token string")
    out = unigram_drift(a, b, top_k=10).collect()
    got = {r.token: (r.p_a_e6, r.p_b_e6, r.delta_e6) for r in out}
    # nA=10, nB=4: x 600000 vs 500000; y 300000 vs 0; z 100000 vs 0;
    # w absent in A -> 0 vs 500000
    assert got == {
        "w": (0, 500_000, 500_000),
        "y": (300_000, 0, 300_000),
        "x": (600_000, 500_000, 100_000),
        "z": (100_000, 0, 100_000),
    }
    # ordering: delta desc, token asc -> w, y, x, z
    assert [r.token for r in out] == ["w", "y", "x", "z"]


def test_drift_rejects_bad_topk(spark):
    df = spark.createDataFrame([("x",)], "token string")
    with pytest.raises(ValueError):
        unigram_drift(df, df, top_k=0)


def test_e6_floor_ratio_exact_across_full_bigint_range(spark):
    """ADVICE r5: the e6 probability must not abort (ANSI overflow) or
    drift once counts pass ~9.2e12 — exact vs Python's big-int floor
    division across boundary cases, including c = n = 2^63 - 1."""
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    m = (1 << 63) - 1
    rows = [
        (5, 3), (1, 3), (0, 7), (999_999, 1_000_000), (1, m),
        (m - 1, m), (m, m), (m // 2 + 1, m),
        (123456789012345678, 987654321098765432),
        (2_999_999_999_999, 3_000_000_000_000),  # frac 5e-7 below an int
        (9_999_999_999_999_999, 10_000_000_000_000_000),
    ]
    df = spark.createDataFrame(rows, "c long, n long")
    out = df.select("c", "n", e6_floor_ratio(F.col("c"), F.col("n")).alias("p"))
    for r in out.collect():
        assert r.p == (r.c * 1_000_000) // r.n, (r.c, r.n, r.p)
