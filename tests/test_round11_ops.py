"""Round-11 operator unit tests: depreciation exactness, Holt trend
lock-on, turns arithmetic, HHI extremes, the fuzzy invoice screen's
bucket-boundary completeness (the exact defect the sf0.1 sweep caught
in the first cut — least() instead of greatest() dropped every
boundary-straddling pair), and novelty edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_depreciation_sums_to_cost_and_is_monotone(spark):
    from cubicerp_client_etl_spark.operators.finance import (
        depreciation_schedule,
    )

    assets = spark.createDataFrame(
        [(1, 1000, 3), (2, 999, 4), (3, 5, 7), (4, 100, 1)],
        "asset_id long, cost long, life long",
    )
    rows = depreciation_schedule(assets, "asset_id", "cost", "life").collect()
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    costs = {1: 1000, 2: 999, 3: 5, 4: 100}
    lives = {1: 3, 2: 4, 3: 7, 4: 1}
    for a, rs in by_asset.items():
        rs.sort(key=lambda r: r.period)
        assert len(rs) == lives[a]
        # the subledger invariant: periods sum EXACTLY to cost
        assert sum(r.depreciation_cents for r in rs) == costs[a]
        assert rs[-1].nbv_cents == 0
        # remainder cents land on the EARLIEST periods
        deps = [r.depreciation_cents for r in rs]
        assert deps == sorted(deps, reverse=True)
        # accum is the running sum of the per-period charges
        acc = 0
        for r in rs:
            acc += r.depreciation_cents
            assert r.accum_cents == acc


def test_holt_locks_onto_linear_trend(spark):
    """On a perfectly linear series (slope 8) the integer Holt
    recurrence reaches a deterministic fixed point: trend 7 with
    residual error 7 (truncation eats the last slope unit — err 7
    gives level step trunc(7/4)=1 on top of trend 7, keeping pace,
    while the trend update trunc(1/4)=0 freezes). That bounded
    residual is ~alpha_den·beta_den/2 of a slope unit; SES on the
    same series lags by ~alpha_den·slope — 4x worse — because its
    only state is the level."""
    from cubicerp_client_etl_spark.operators.forecast import (
        holt_forecast,
        ses_forecast,
    )

    rows = [(1, t, 100 + 8 * t) for t in range(40)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    holt = {r.p: r for r in holt_forecast(df, "k", "p", "v").collect()}
    ses = {r.p: r for r in ses_forecast(df, "k", "p", "v").collect()}
    assert holt[39].trend == 7 and holt[39].abs_err == 7  # fixed point
    # steady-state SES error ~ alpha_den * slope = 32: 4x Holt's
    assert ses[39].abs_err >= 4 * holt[39].abs_err


def test_holt_integer_key_contract(spark):
    from cubicerp_client_etl_spark.operators.forecast import holt_forecast

    s = spark.createDataFrame([("a", 0, 1)], "k string, p int, v int")
    with pytest.raises(TypeError, match="integer"):
        holt_forecast(s, "k", "p", "v")


def test_inventory_turns_hand_computed(spark):
    from cubicerp_client_etl_spark.operators.history import inventory_turns

    # part 1: +10, -4, +2, -3  -> onhand 10,6,8,5 sum=29; issued 7
    mv = spark.createDataFrame(
        [(1, 0, 10), (1, 1, -4), (1, 2, 2), (1, 3, -3)],
        "part long, seq long, qty long",
    )
    r = inventory_turns(mv, "part", "seq", "qty").collect()[0]
    assert (r.n_moves, r.issued_qty, r.onhand_sum) == (4, 7, 29)
    assert r.turns_e6 == 7 * 1_000_000 * 4 // 29


def test_hhi_extremes(spark):
    from cubicerp_client_etl_spark.operators.quality import hhi_concentration

    # monopoly: one key holds everything -> HHI = 1e12, top share 1e6
    mono = spark.createDataFrame([(1, 500)], "k long, v long")
    r = hhi_concentration(mono, "k", "v").collect()[0]
    assert (r.n_keys, r.hhi_e12, r.top_share_e6) == (1, 10**12, 10**6)
    # perfect split over 4 keys -> HHI = 4 * (250000)^2 = 2.5e11
    flat = spark.createDataFrame([(i, 100) for i in range(4)], "k long, v long")
    r = hhi_concentration(flat, "k", "v", top_n=2).collect()[0]
    assert r.hhi_e12 == 4 * 250_000**2
    assert r.top_share_e6 == 2 * 250_000


def test_fuzzy_invoice_screen_bucket_boundary_complete(spark):
    """Regression for the first-cut defect: a pair whose amounts
    straddle a bucket boundary (9 999 vs 10 001 with bucket 10 000)
    collides ONLY at the larger bucket's probe key — emission must
    elect greatest(bucket_a, bucket_b), or the pair silently vanishes
    (least() dropped it; the sf0.1 sweep caught the value mismatch)."""
    from cubicerp_client_etl_spark.operators.finance import (
        near_duplicate_invoice_screen,
    )

    inv = spark.createDataFrame(
        [
            (7, 1, 9_999, "2024-01-01"),   # bucket 0
            (7, 2, 10_001, "2024-01-03"),  # bucket 1 — boundary straddle
            (7, 3, 10_050, "2024-01-04"),  # bucket 1, near id 2
            (7, 4, 50_000, "2024-01-01"),  # far from everything
            (8, 5, 10_001, "2024-01-03"),  # other party — never pairs
        ],
        "party long, inv_id long, amt long, dt string",
    ).withColumn("dt", F.to_date("dt"))
    pairs = {
        (r.id_a, r.id_b)
        for r in near_duplicate_invoice_screen(
            inv, "party", "inv_id", "amt", "dt",
            amount_tol_cents=100, day_window=7, bucket_cents=10_000,
        ).collect()
    }
    assert pairs == {(1, 2), (1, 3), (2, 3)}
    with pytest.raises(ValueError, match="lossless"):
        near_duplicate_invoice_screen(
            inv, "party", "inv_id", "amt", "dt",
            amount_tol_cents=200, bucket_cents=100,
        )


def test_ngram_novelty_edges(spark):
    from cubicerp_client_etl_spark.operators.curation import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # fully seen -> novelty 0
            (2, "zeta eta theta iota"),     # fully novel -> 1e6
            (3, "hi"),                       # short doc: whole-text shingle
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, ref).collect()}
    assert out[1].novelty_e6 == 0
    assert out[2].novelty_e6 == 1_000_000
    assert out[3].n_shingles == 1 and out[3].novelty_e6 == 1_000_000


def test_cohort_ltv_hand_computed(spark):
    from cubicerp_client_etl_spark.operators.behavior import cohort_ltv

    rows = [
        (1, 10, 100), (1, 11, 50), (1, 13, 25),   # cohort 10, offsets 0,1,3
        (2, 10, 200),                              # cohort 10, offset 0
        (3, 11, 40), (3, 12, 10),                  # cohort 11
    ]
    df = spark.createDataFrame(rows, "u long, m long, v long")
    out = {
        (r.cohort_month, r.month_offset): r
        for r in cohort_ltv(df, "u", "m", "v").collect()
    }
    assert out[(10, 0)].revenue_cents == 300
    assert out[(10, 0)].cohort_users == 2
    assert out[(10, 0)].cum_ltv_per_user_cents == 150
    assert out[(10, 1)].cum_ltv_cents == 350
    assert out[(10, 3)].cum_ltv_cents == 375
    assert (10, 2) not in out  # gaps stay gaps; cum carries through
    assert out[(11, 1)].cum_ltv_cents == 50
