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
