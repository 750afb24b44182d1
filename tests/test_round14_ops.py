"""Round-14 operator laws: cash-application mutual-best matching and
progressive marginal brackets (operators/finance.py), plus the capped
hyperplane-LSH pair join's bound (operators/similarity.py — the
query-level contracts live in test_capped_twins.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.finance import (
    cash_application_match,
    progressive_brackets,
)


def _d(day: int) -> dt.date:
    return dt.date(2024, 1, day)


def test_cash_application_mutual_best_resolves_ambiguity(spark):
    # two invoices share the amount 1000; stmt 11 pays 2 days after
    # inv 1 and 1 day after inv 2 → stmt 11's best is inv 2; stmt 12
    # (same amount, later) best is also inv 2 BUT inv 2's best is
    # stmt 11 (smaller lag) — so (11,2) applies and 12/1 do NOT pair
    # in the one-round law (12's rank-1 was taken; no re-ranking).
    invoices = spark.createDataFrame(
        [(1, 1000, _d(1)), (2, 1000, _d(2)), (3, 500, _d(1))],
        "inv_id long, amount_cents long, inv_date date",
    )
    stmts = spark.createDataFrame(
        [(11, 1000, _d(3)), (12, 1000, _d(4)), (13, 500, _d(2))],
        "stmt_id long, amount_cents long, value_date date",
    )
    got = {
        (r.stmt_id, r.inv_id, r.day_lag)
        for r in cash_application_match(stmts, invoices).collect()
    }
    assert got == {(11, 2, 1), (13, 3, 1)}


def test_cash_application_is_one_to_one(spark):
    # every applied statement and invoice appears at most once even
    # under heavy amount collision (all rows share one amount)
    invoices = spark.createDataFrame(
        [(i, 999, _d(1 + i % 5)) for i in range(20)],
        "inv_id long, amount_cents long, inv_date date",
    )
    stmts = spark.createDataFrame(
        [(100 + i, 999, _d(3 + i % 7)) for i in range(20)],
        "stmt_id long, amount_cents long, value_date date",
    )
    out = cash_application_match(stmts, invoices).collect()
    assert len({r.stmt_id for r in out}) == len(out)
    assert len({r.inv_id for r in out}) == len(out)
    assert all(0 < r.day_lag <= 10 for r in out)


def test_progressive_brackets_boundary_law(spark):
    brackets = [(0, 0), (1000, 100_000), (3000, 250_000)]
    df = spark.createDataFrame(
        [(0,), (1000,), (1001,), (3000,), (5000,)], "amount_cents long"
    )
    out = {
        r.amount_cents: (r.tax_cents, r.effective_rate_e6)
        for r in progressive_brackets(df, "amount_cents", brackets).collect()
    }
    # below / at the first paying bound: zero
    assert out[0] == (0, 0)
    assert out[1000] == (0, 0)
    # one cent into the 10% bracket: floor(0.1) = 0
    assert out[1001] == (0, 0)
    # full 10% bracket: 2000 * 10% = 200; eff = 1e6*200 div 3000
    assert out[3000] == (200, 66_666)
    # + 2000 into the 25% bracket: 200 + 500 = 700
    assert out[5000] == (700, 140_000)


def test_progressive_brackets_marginal_not_cliff(spark):
    # marginal law: tax is monotone and continuous across a bound —
    # one cent more of income can never cost more than one cent of tax
    brackets = [(0, 0), (1000, 100_000), (3000, 250_000)]
    df = spark.createDataFrame(
        [(v,) for v in range(990, 1011)] + [(v,) for v in range(2990, 3011)],
        "amount_cents long",
    )
    rows = sorted(
        (r.amount_cents, r.tax_cents)
        for r in progressive_brackets(df, "amount_cents", brackets).collect()
    )
    for (a0, t0), (a1, t1) in zip(rows, rows[1:]):
        if a1 == a0 + 1:
            assert 0 <= t1 - t0 <= 1


def test_lsh_capped_pairs_volume_bound(spark):
    # the cap bound: every bucket contributes <= cap*(cap-1)/2 pairs
    from cubicerp_client_etl_spark.operators.similarity import (
        lsh_bucket_pairs_capped,
    )

    rows = [(i, [1.0] * 4, "b%d" % (i % 3)) for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, lsh_bucket string"
    )
    cap = 5
    out = lsh_bucket_pairs_capped(
        df, hot_bucket_cap=cap, threshold=0.0
    ).collect()
    # every bucket holds 10 > cap rows → everything is hot → no pairs
    assert out == []
    # shrink one bucket under the cap → exactly C(4,2) pairs from it
    df2 = df.where((F.col("vec_id") % 3 != 0) | (F.col("vec_id") < 12))
    out2 = lsh_bucket_pairs_capped(df2, hot_bucket_cap=cap, threshold=0.0)
    per_bucket = (
        df2.groupBy("lsh_bucket").count().where(F.col("count") <= cap).count()
    )
    assert out2.count() == per_bucket * (4 * 3 // 2)
