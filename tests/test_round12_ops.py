"""Round-12 wave unit tests: Croston intermittent-demand walker
(hand-computed states incl. the truncated-division edge), plus edge
cases the oracle comparison can't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import SF_SMOKE  # noqa: F401


def test_croston_states_hand_computed(spark):
    """One key, periods with gaps: every state transition checked by
    hand, including one negative (x - z) through the truncated
    division and the rate's one-step-ahead (pre-update) discipline."""
    from cubicerp_client_etl_spark.operators.forecast import croston_forecast

    # (period, demand): gaps 2, 3, 1
    rows = [(7, 1, 8), (7, 3, 20), (7, 6, 4), (7, 7, 12)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    got = {
        r.p: r
        for r in croston_forecast(df, "k", "p", "v", alpha_den=4).collect()
    }
    # row 1: z=8, p undefined
    assert (got[1].gap, got[1].size_level, got[1].interval_level,
            got[1].rate_e6) == (None, 8, None, None)
    # row 2: q=2; rate undefined (p was None); z=8+trunc((20-8)/4)=11; p=2
    assert (got[3].gap, got[3].size_level, got[3].interval_level,
            got[3].rate_e6) == (2, 11, 2, None)
    # row 3: q=3; rate=1e6*11//2=5500000; z=11+trunc((4-11)/4)=11-1=10
    # (TRUNCATION toward zero: (4-11)//4 floors to -2 in Python, the
    # walker must yield -1); p=2+trunc((3-2)/4)=2
    assert (got[6].gap, got[6].size_level, got[6].interval_level,
            got[6].rate_e6) == (3, 10, 2, 5_500_000)
    # row 4: q=1; rate=1e6*10//2=5000000; z=10+trunc((12-10)/4)=10;
    # p=2+trunc((1-2)/4)=2
    assert (got[7].gap, got[7].size_level, got[7].interval_level,
            got[7].rate_e6) == (1, 10, 2, 5_000_000)


def test_croston_key_isolation_and_key_contract(spark):
    """Keys never leak state across boundaries inside one bucket, and
    non-integer keys fail loudly at plan time."""
    import pytest

    from cubicerp_client_etl_spark.operators.forecast import croston_forecast

    rows = [(1, 1, 5), (1, 2, 5), (2, 1, 9), (2, 4, 9)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    got = {(r.k, r.p): r for r in croston_forecast(df, "k", "p", "v").collect()}
    assert got[(2, 1)].gap is None and got[(2, 1)].size_level == 9
    assert got[(2, 4)].gap == 3 and got[(2, 4)].interval_level == 3
    assert got[(1, 2)].gap == 1

    sdf = spark.createDataFrame([("a", 1, 1)], "k string, p long, v long")
    with pytest.raises(TypeError):
        croston_forecast(sdf, "k", "p", "v")
    with pytest.raises(ValueError):
        croston_forecast(df, "k", "p", "v", alpha_den=0)
