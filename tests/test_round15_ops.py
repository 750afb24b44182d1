"""Round-15 ADVICE regressions (operators/finance.py): progressive
brackets must survive bigint-overflow-scale amounts (the e6_floor_ratio
pitfall — ADVICE r14 #1), backtick-needing column names must work, and
fx_revaluation's e6 sums must emit as exact signed hi/lo bigint pairs
instead of a bigint cast that overflows around SF≈200 (ADVICE r14 #2).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.finance import (
    fx_revaluation,
    progressive_brackets,
)


def test_progressive_brackets_survives_bigint_scale_amounts(spark):
    # The pre-r15 form computed rate_e6 * overlap as BIGINT — overflow
    # (silent NULL non-ANSI) once amount passes ~9.2e12/rate. A 5e18-
    # cent amount at a 999999e-6 top rate must still produce the exact
    # Python-integer answer.
    brackets = [(0, 0), (1000, 100_000), (3000, 999_999)]
    amount = 5_000_000_000_000_000_000
    df = spark.createDataFrame([(amount,)], "amount_cents long")
    row = progressive_brackets(df, "amount_cents", brackets).collect()[0]
    expected = (100_000 * 2000) // 10**6 + (999_999 * (amount - 3000)) // 10**6
    assert row.tax_cents == expected
    assert row.effective_rate_e6 == (10**6 * expected) // amount


def test_progressive_brackets_backtick_column_name(spark):
    # Raw f-string interpolation broke names needing backticks; the
    # F.col form must handle them.
    brackets = [(0, 0), (1000, 100_000)]
    df = spark.createDataFrame([(3000,)], "amount long").withColumnRenamed(
        "amount", "amount cents"
    )
    row = progressive_brackets(df, "amount cents", brackets, out_col="tax").collect()[0]
    assert row.tax == 200
    assert row.effective_rate_e6 == (10**6 * 200) // 3000


def test_fx_revaluation_signed_hi_lo_split_exact(spark):
    # One currency, one booking month, closing rate BELOW booking rate
    # → negative unrealized G/L. Amounts large enough that Σ cents·rate
    # would overflow a bigint: the hi/lo pair must carry the exact
    # signed value with d = hi*1e18 + lo in the trunc/sign-of-dividend
    # convention (both carriers non-positive for negative d).
    # 4e15 per item: Σ cents (1.6e18) stays inside the bigint contract
    # for open_fc_cents, while Σ cents·rate_e6 (2.4e24) is far past it
    cents = 4_000_000_000_000_000
    items = spark.createDataFrame(
        [("EUR", dt.date(2024, 1, 1), cents)] * 400,
        "cur string, m date, cents long",
    )
    rates = spark.createDataFrame(
        [
            ("EUR", dt.date(2024, 1, 1), 1_500_000),
            ("EUR", dt.date(2024, 6, 1), 900_000),
        ],
        "cur string, m date, rate_e6 long",
    )
    row = fx_revaluation(items, rates, close_month=dt.date(2024, 6, 1)).collect()[0]
    e18 = 10**18
    book = 400 * cents * 1_500_000  # 2.4e25 — far past bigint
    close = 400 * cents * 900_000
    ue = close - book  # negative
    assert (row.base_book_hi, row.base_book_lo) == (book // e18, book % e18)
    assert (row.base_close_hi, row.base_close_lo) == (close // e18, close % e18)
    # trunc-toward-zero + sign-of-dividend modulo (NOT Python floor/mod)
    hi = -((-ue) // e18)
    lo = ue - hi * e18
    assert (row.unrealized_hi, row.unrealized_lo) == (hi, lo)
    assert row.unrealized_hi * e18 + row.unrealized_lo == ue
    assert row.unrealized_hi <= 0 and row.unrealized_lo <= 0
    assert row.open_fc_cents == 400 * cents
    assert row.n_items == 400


def test_credit_netting_fifo_partial_application_order(spark):
    # pool 250 vs invoices 100/100/100 oldest-first: 100, 100, 50
    # applied; third invoice half-open; no unapplied credit
    from cubicerp_client_etl_spark.operators.finance import (
        credit_netting_fifo,
    )

    invoices = spark.createDataFrame(
        [
            (1, 7, 100, dt.date(2024, 1, 1)),
            (2, 7, 100, dt.date(2024, 1, 2)),
            (3, 7, 100, dt.date(2024, 1, 3)),
            (4, 8, 500, dt.date(2024, 1, 1)),  # customer without credits
        ],
        "doc_id long, custkey long, amount_cents long, doc_date date",
    )
    credits = spark.createDataFrame(
        [(7, 200), (7, 50)], "custkey long, amount_cents long"
    )
    out = {
        r.custkey: r.asDict()
        for r in credit_netting_fifo(invoices, credits).collect()
    }
    assert out[7]["credit_pool_cents"] == 250
    assert out[7]["applied_cents"] == 250
    assert out[7]["open_after_cents"] == 50
    assert out[7]["n_fully_netted"] == 2
    assert out[7]["unapplied_credit_cents"] == 0
    assert out[8] == {
        "custkey": 8,
        "n_inv": 1,
        "credit_pool_cents": 0,
        "applied_cents": 0,
        "open_after_cents": 500,
        "n_fully_netted": 0,
        "unapplied_credit_cents": 0,
    }


def test_credit_netting_fifo_surplus_credit_reported(spark):
    from cubicerp_client_etl_spark.operators.finance import (
        credit_netting_fifo,
    )

    invoices = spark.createDataFrame(
        [(1, 7, 100, dt.date(2024, 1, 1))],
        "doc_id long, custkey long, amount_cents long, doc_date date",
    )
    credits = spark.createDataFrame(
        [(7, 300)], "custkey long, amount_cents long"
    )
    row = credit_netting_fifo(invoices, credits).collect()[0]
    assert row.applied_cents == 100
    assert row.open_after_cents == 0
    assert row.unapplied_credit_cents == 200


def test_bank_rec_residual_conservation(spark):
    # every statement line is either applied or aged: applied count +
    # stmt-side residual docs == total statement lines (and likewise
    # for invoices) at sf0.001
    from cubicerp_client_etl_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    aging = REGISTRY["q313_bank_rec_residual_aging"].fn(spark, sf).collect()
    resid = {side: 0 for side in ("stmt", "inv")}
    for r in aging:
        resid[r.side] += r.n_docs
    from cubicerp_client_etl_spark.catalog import load

    orders = load(spark, sf, "orders")
    n_inv = orders.count()
    n_stmt = orders.where(F.col("o_orderkey") % 3 == 0).count()
    applied = n_stmt - resid["stmt"]
    assert applied >= 0
    assert resid["inv"] == n_inv - applied


def test_landed_cost_allocation_invariant(spark):
    # the digest must carry the exact-allocation invariant in its own
    # columns: sum_alloc == sum_freight in every n_lines cell
    from cubicerp_client_etl_spark.queries import REGISTRY

    rows = (
        REGISTRY["q315_landed_cost_allocation"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows
    for r in rows:
        assert r.sum_alloc_cents == r.sum_freight_cents
        assert r.sum_max_alloc >= r.sum_min_alloc >= 0


def test_expected_receipts_low_median_and_fallback(spark):
    # customer 7: lags [4, 10] -> low median = 4 (the (2+1) div 2 = 1st
    # smallest); customer 9 has no history -> global low median over
    # [4, 10, 8] = 8. Invoices land on the Monday-truncated week of
    # date + median.
    from cubicerp_client_etl_spark.operators.finance import (
        expected_receipts_forecast,
    )

    payments = spark.createDataFrame(
        [(7, 4), (7, 10), (8, 8)], "custkey long, pay_lag_days long"
    )
    invoices = spark.createDataFrame(
        [
            (7, 100, dt.date(2024, 1, 1)),   # +4 -> Jan 5 -> week of Jan 1
            (9, 200, dt.date(2024, 1, 1)),   # +8 -> Jan 9 -> week of Jan 8
        ],
        "custkey long, amount_cents long, inv_date date",
    )
    rows = {
        r.week: (r.n_invoices, r.expected_cents)
        for r in expected_receipts_forecast(payments, invoices).collect()
    }
    assert rows == {
        dt.date(2024, 1, 1): (1, 100),
        dt.date(2024, 1, 8): (1, 200),
    }


# ---------------------------------------------------------------------------
# Round-15 second wave: revenue recognition / dunning / bilateral netting
# ---------------------------------------------------------------------------


def test_revenue_recognition_conservation_and_remainder_first(spark):
    from cubicerp_client_etl_spark.operators.finance import (
        revenue_recognition_schedule,
    )

    # 1001 cents over 3 months: base 333, remainder 2 -> first two
    # months get 334; single-month term passes through whole.
    df = spark.createDataFrame(
        [
            (1, 1001, dt.date(1997, 11, 15), 3),
            (2, 500, dt.date(1998, 1, 3), 1),
        ],
        "contract_id int, amount_cents long, start_month date, term_months int",
    )
    rows = revenue_recognition_schedule(df).orderBy(
        "contract_id", "month_index"
    ).collect()
    c1 = [r for r in rows if r.contract_id == 1]
    assert [r.recognized_cents for r in c1] == [334, 334, 333]
    # year-month arithmetic crosses the year boundary exactly
    assert [str(r.rec_month) for r in c1] == [
        "1997-11-01",
        "1997-12-01",
        "1998-01-01",
    ]
    assert sum(r.recognized_cents for r in c1) == 1001
    c2 = [r for r in rows if r.contract_id == 2]
    assert len(c2) == 1 and c2[0].recognized_cents == 500


def test_dunning_levels_and_charge_floor_exact(spark):
    from cubicerp_client_etl_spark.operators.finance import dunning_escalation

    asof = "1998-08-01"
    # due dates chosen so days_overdue hits the exact level boundaries
    # 0 / 30 / 31 / 91, plus a bigint-scale amount where the decimal
    # floor correction matters (divisor 365e6 is not a power of ten).
    big = 9_000_000_000_000_000_000 // (180000 * 200)  # keeps product < 38 digits
    df = spark.createDataFrame(
        [
            (1, 10_000, dt.date(1998, 8, 10)),   # not yet due -> 0 days, L0
            (2, 10_000, dt.date(1998, 7, 2)),    # 30 days -> L1
            (3, 10_000, dt.date(1998, 7, 1)),    # 31 days -> L2
            (4, 10_000, dt.date(1998, 5, 2)),    # 91 days -> L4
            (5, big, dt.date(1998, 1, 13)),      # 200 days, huge amount
        ],
        "inv_id int, amount_cents long, due_date date",
    )
    out = {
        r.inv_id: r
        for r in dunning_escalation(df, asof).collect()
    }
    assert (out[1].days_overdue, out[1].dunning_level) == (0, 0)
    assert (out[2].days_overdue, out[2].dunning_level) == (30, 1)
    assert (out[3].days_overdue, out[3].dunning_level) == (31, 2)
    assert (out[4].days_overdue, out[4].dunning_level) == (91, 4)
    for r in out.values():
        expected = (r.amount_cents * 180000 * r.days_overdue) // (365 * 10**6)
        assert r.finance_charge_cents == expected, r


def test_bilateral_netting_direction_cancellation_and_self_pairs(spark):
    from cubicerp_client_etl_spark.operators.finance import bilateral_netting

    df = spark.createDataFrame(
        [
            ("A", "B", 300),  # A owes B 300
            ("B", "A", 100),  # B owes A 100 -> net A pays B 200
            ("C", "D", 50),
            ("D", "C", 50),   # perfectly netted pair -> payer NULL
            ("E", "E", 999),  # self-pair excluded entirely
        ],
        "from_key string, to_key string, amount_cents long",
    )
    rows = {(r.pair_a, r.pair_b): r for r in bilateral_netting(df).collect()}
    assert set(rows) == {("A", "B"), ("C", "D")}
    ab = rows[("A", "B")]
    assert (ab.gross_ab_cents, ab.gross_ba_cents, ab.net_cents) == (300, 100, 200)
    assert ab.payer == "A" and ab.n_flows == 2
    cd = rows[("C", "D")]
    assert cd.net_cents == 0 and cd.payer is None


def test_early_payment_discount_boundary_and_exact_cents(spark):
    from cubicerp_client_etl_spark.operators.finance import (
        early_payment_discounts,
    )

    # lag 10 captures (inclusive cutoff), 11 misses; discount is the
    # exact floored 2% regardless of capture.
    df = spark.createDataFrame(
        [(1, 10_001, 10), (2, 10_001, 11), (3, 49, 1)],
        "inv_id int, amount_cents long, pay_lag_days int",
    )
    out = {r.inv_id: r for r in early_payment_discounts(df).collect()}
    assert out[1].captured is True and out[2].captured is False
    assert out[1].discount_cents == (10_001 * 20000) // 10**6 == 200
    assert out[3].discount_cents == 0  # floor(49 * 2%) = 0


def test_kit_availability_zero_stock_and_limiting_tiebreak(spark):
    from cubicerp_client_etl_spark.operators.history import kit_availability

    bom = spark.createDataFrame(
        [
            (1, 11, 2),  # 10 on hand / 2 per kit = 5
            (1, 12, 1),  # absent from stock -> 0, the binding component
            (2, 21, 3),  # 9 / 3 = 3
            (2, 22, 1),  # 3 / 1 = 3 -> tie at 3 kits, lower key 21 wins
        ],
        "parent int, child int, qty_per int",
    )
    onhand = spark.createDataFrame(
        [(11, 10), (21, 9), (22, 3)], "partkey int, onhand_qty int"
    )
    rows = {r.parent: r for r in kit_availability(onhand, bom).collect()}
    assert rows[1].kits_buildable == 0
    assert rows[1].limiting_child == 12 and rows[1].limiting_onhand == 0
    assert rows[2].kits_buildable == 3
    assert rows[2].limiting_child == 21 and rows[2].limiting_onhand == 9


def test_sequence_gap_audit_islands_arithmetic(spark):
    from cubicerp_client_etl_spark.operators.quality import sequence_gap_audit

    docs = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 5), ("a", 9), ("b", 7)],
        "series string, num int",
    )
    rows = {
        r.series: r
        for r in sequence_gap_audit(docs, "series", "num").collect()
    }
    a = rows["a"]
    # gaps: 2->5 (missing 3,4) and 5->9 (missing 6,7,8)
    assert (a.n_docs, a.min_number, a.max_number) == (4, 1, 9)
    assert (a.n_gaps, a.missing_total, a.largest_gap) == (2, 5, 3)
    b = rows["b"]
    assert (b.n_gaps, b.missing_total, b.largest_gap) == (0, 0, 0)


def test_wilson_lower_bound_matches_integer_reference(spark):
    import math

    from cubicerp_client_etl_spark.operators.quality import (
        wilson_lower_bound_e6,
    )

    rows = [(1, 10, 1), (2, 10000, 100), (3, 3, 3), (4, 1, 0),
            (5, 5000000, 43210), (6, 7, 0)]
    df = spark.createDataFrame(rows, "id int, n long, k long")
    out = {
        r.id: r.wilson_lb_e6
        for r in wilson_lower_bound_e6(df, "n", "k").collect()
    }
    for i, n, k in rows:
        inner6 = (10**6 * (k * (n - k) + n)) // n
        s = math.isqrt(inner6)
        want = max(0, ((k + 2) * 10**6 - 2000 * s) // (n + 4))
        assert out[i] == want, (i, out[i], want)
    # monotone sanity: the small sample's bound sits far below its
    # raw rate while the large sample's hugs it
    assert out[1] < 100000 // 2
    assert out[2] > 8000


def test_mrr_waterfall_classification_and_tieout(spark):
    from cubicerp_client_etl_spark.operators.finance import mrr_waterfall

    # entity 1: 100 -> 150 (expansion 50); entity 2: 80 -> gone
    # (churn in m=11); entity 3: appears at m=11 (new); entity 4:
    # 60 -> 40 (contraction 20)
    rev = spark.createDataFrame(
        [
            (1, 10, 100), (1, 11, 150),
            (2, 10, 80),
            (3, 11, 30),
            (4, 10, 60), (4, 11, 40),
        ],
        "custkey int, ym int, amount_cents long",
    )
    rows = {r.ym: r for r in mrr_waterfall(rev).collect()}
    m11 = rows[11]
    assert m11.new_cents == 30 and m11.n_new == 1
    assert m11.expansion_cents == 50 and m11.n_expanded == 1
    assert m11.contraction_cents == 20 and m11.n_contracted == 1
    assert m11.churned_cents == 80 and m11.n_churned == 1
    # tie-out: net == new + expansion - contraction - churned
    assert m11.net_change == 30 + 50 - 20 - 80
    # m=10: every entity is new (no prior month)
    assert rows[10].new_cents == 240 and rows[10].n_new == 3
    # churn month one past an entity's last activity exists (m=12)
    assert rows[12].churned_cents == 150 + 40 + 30 and rows[12].n_churned == 3


def test_single_source_risk_share_and_spend(spark):
    from cubicerp_client_etl_spark.operators.quality import single_source_risk

    lines = spark.createDataFrame(
        [
            (1, 100, "A", 10), (1, 100, "A", 5),   # part 1: 1 supplier
            (2, 100, "A", 7), (2, 200, "A", 3),    # part 2: 2 suppliers
            (3, 300, "B", 9),                      # part 3: 1 supplier
        ],
        "part int, supp int, grp string, spend long",
    )
    rows = {
        r.grp: r
        for r in single_source_risk(
            lines, "part", "supp", "spend", "grp"
        ).collect()
    }
    a = rows["A"]
    assert (a.n_parts, a.n_single_source) == (2, 1)
    assert (a.total_spend_cents, a.single_source_spend_cents) == (25, 15)
    assert a.single_source_share_e6 == 500000
    assert rows["B"].single_source_share_e6 == 1000000


def test_stickiness_daily_window_arithmetic(spark):
    import datetime as _dt

    from cubicerp_client_etl_spark.operators.behavior import stickiness_daily

    # user 1 active d1 and d3; user 2 active d1 only.
    ev = spark.createDataFrame(
        [
            (1, _dt.datetime(2024, 1, 1, 9)),
            (1, _dt.datetime(2024, 1, 1, 10)),  # same day dedup
            (1, _dt.datetime(2024, 1, 3, 9)),
            (2, _dt.datetime(2024, 1, 1, 9)),
        ],
        "user_id int, ts timestamp",
    )
    rows = {str(r.day): r for r in stickiness_daily(ev).collect()}
    # only observed days appear (inner join back to DAU grid)
    assert set(rows) == {"2024-01-01", "2024-01-03"}
    d1 = rows["2024-01-01"]
    assert (d1.dau, d1.wau) == (2, 2) and d1.stickiness_e6 == 1000000
    d3 = rows["2024-01-03"]
    # trailing 7d of d3 saw users 1 and 2
    assert (d3.dau, d3.wau) == (1, 2) and d3.stickiness_e6 == 500000


def test_hourly_profile_dispersion_extremes_and_tiebreak(spark):
    import datetime as _dt

    from cubicerp_client_etl_spark.operators.behavior import hourly_profile

    base = _dt.datetime(2024, 1, 1)
    rows = []
    # type "spike": all 48 events in hour 5 -> dispersion 23e6
    for i in range(48):
        rows.append(("spike", base + _dt.timedelta(hours=5, seconds=i)))
    # type "flat": one event in every hour -> dispersion 0
    for h in range(24):
        rows.append(("flat", base + _dt.timedelta(hours=h)))
    # type "tie": equal peaks at hours 3 and 7 -> peak_hour 3
    for h in (3, 3, 7, 7, 9):
        rows.append(("tie", base + _dt.timedelta(hours=h)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in hourly_profile(ev).collect()}
    assert out["spike"].dispersion_e6 == 23_000_000
    assert out["spike"].peak_share_e6 == 1_000_000
    assert out["spike"].peak_hour == 5
    assert out["flat"].dispersion_e6 == 0
    assert out["tie"].peak_hour == 3
    # exact integer law replay for the non-trivial case
    ns = [2, 2, 1]
    n = sum(ns)
    var_num = 24 * sum(x * x for x in ns) - n * n
    assert out["tie"].dispersion_e6 == (10**6 * var_num) // (n * n)


def test_overlap_audit_halfopen_and_intrusion(spark):
    import datetime as _dt

    from cubicerp_client_etl_spark.operators.interval import overlap_audit

    d = _dt.date
    iv = spark.createDataFrame(
        [
            # key a: [1,5) then [3,4) overlaps (intrusion 2);
            # [5,8) touches 5 exactly -> NOT an overlap (half-open)
            ("a", 1, d(2024, 1, 1), d(2024, 1, 5)),
            ("a", 2, d(2024, 1, 3), d(2024, 1, 4)),
            ("a", 3, d(2024, 1, 5), d(2024, 1, 8)),
            # key b: disjoint
            ("b", 4, d(2024, 2, 1), d(2024, 2, 2)),
            ("b", 5, d(2024, 2, 3), d(2024, 2, 4)),
        ],
        "k string, id int, s date, e date",
    )
    rows = {
        r.k: r for r in overlap_audit(iv, "k", "s", "e", "id").collect()
    }
    a = rows["a"]
    assert (a.n_intervals, a.n_overlapping) == (3, 1)
    assert a.max_intrusion_days == 2
    assert a.overlap_share_e6 == 333333
    b = rows["b"]
    assert b.n_overlapping == 0 and b.max_intrusion_days is None


def test_three_sigma_flags_exact_inequality(spark):
    from cubicerp_client_etl_spark.operators.quality import three_sigma_flags

    # nineteen quiet labels at 10, one spike at 100: the spike flags
    # high, nothing else does; replay the integer inequality directly.
    # (A single spike among n points sits at z² = n − 1 EXACTLY, so
    # n = 10 lands on the 3σ boundary and the strict inequality
    # rightly does not flag it — n = 20 gives z² = 19 > 9.)
    vals = [10] * 19 + [100]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "label int, v long"
    )
    out = three_sigma_flags(df, "label", "v").collect()
    assert len(out) == 1 and out[0].label == 19
    assert out[0].direction == "high" and out[0].n_labels == 20
    n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
    assert (n * 100 - s) ** 2 > 9 * (n * ss - s * s)
    assert not (n * 10 - s) ** 2 > 9 * (n * ss - s * s)


def test_topk_with_others_tieout_and_tiebreak(spark):
    from cubicerp_client_etl_spark.operators.behavior import topk_with_others

    totals = spark.createDataFrame(
        [
            ("g", 1, 100), ("g", 2, 300), ("g", 3, 300),
            ("g", 4, 50), ("g", 5, 40), ("g", 6, 10),
            ("h", 7, 5),  # fewer entities than k -> no OTHERS row
        ],
        "grp string, ent int, v long",
    )
    rows = topk_with_others(totals, "grp", "ent", "v", k=3).collect()
    g = sorted([r for r in rows if r.grp == "g"], key=lambda r: r.rank)
    # ties at 300 break by the lower entity key
    assert [(r.rank, r.entity, r.value_cents) for r in g[:3]] == [
        (1, "2", 300), (2, "3", 300), (3, "1", 100),
    ]
    others = g[3]
    assert (others.entity, others.value_cents, others.n_entities) == (
        "OTHERS", 100, 3,
    )
    # the group total ties out exactly
    assert sum(r.value_cents for r in g) == 800
    h = [r for r in rows if r.grp == "h"]
    assert len(h) == 1 and h[0].rank == 1


def test_repeat_purchase_rate_counts_repeaters_not_repeats(spark):
    import datetime as _dt

    from cubicerp_client_etl_spark.operators.behavior import (
        repeat_purchase_rate,
    )

    d = _dt.date
    p = spark.createDataFrame(
        [
            # pair (1, A): three quick repeats -> counts ONCE
            (1, "A", "g", d(2024, 1, 1)),
            (1, "A", "g", d(2024, 1, 5)),
            (1, "A", "g", d(2024, 1, 9)),
            # pair (1, B): repeat at exactly 30 days -> inclusive
            (1, "B", "g", d(2024, 1, 1)),
            (1, "B", "g", d(2024, 1, 31)),
            # pair (2, A): repeat at 31 days -> NOT within window
            (2, "A", "g", d(2024, 1, 1)),
            (2, "A", "g", d(2024, 2, 1)),
            # pair (2, B): single purchase
            (2, "B", "g", d(2024, 3, 1)),
        ],
        "e int, i string, g string, d date",
    )
    row = repeat_purchase_rate(p, "e", "i", "d", "g").collect()[0]
    assert (row.n_pairs, row.n_repeat_pairs) == (4, 2)
    assert row.repeat_rate_e6 == 500000


def test_business_days_between_brute_force(spark):
    import datetime as _dt

    from cubicerp_client_etl_spark.functions import business_days_between

    base = _dt.date(1992, 1, 1)
    rows = [
        (
            i,
            base + _dt.timedelta(days=i * 13 % 900),
            base + _dt.timedelta(days=i * 13 % 900 + i % 40),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id int, a date, b date")
    out = {
        r.id: r.bd
        for r in df.select(
            "id", business_days_between(F.col("a"), F.col("b")).alias("bd")
        ).collect()
    }

    def ref(a, b):
        n, d = 0, a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += _dt.timedelta(days=1)
        return n

    for i, a, b in rows:
        assert out[i] == ref(a, b), (i, a, b, out[i], ref(a, b))
    # half-open semantics: same-day span is zero business days
    same = spark.createDataFrame(
        [(1, _dt.date(2024, 1, 3), _dt.date(2024, 1, 3))],
        "id int, a date, b date",
    )
    assert (
        same.select(
            business_days_between(F.col("a"), F.col("b")).alias("bd")
        ).collect()[0].bd
        == 0
    )


def test_newsvendor_level_exact_rank_rule(spark):
    from cubicerp_client_etl_spark.operators.history import newsvendor_level

    # key 1: demands [1,2,3,4] at ratio 3/4 -> smallest q with
    # cum*4 >= 3*4=12: cum(3)=3*4=12 -> S=3. key 2: constant demand.
    rows = [(1, q) for q in (1, 2, 3, 4)] + [(2, 7), (2, 7)]
    df = spark.createDataFrame(rows, "k int, qty int")
    out = {r.k: r for r in newsvendor_level(df, "k", "qty").collect()}
    assert (out[1].s_level, out[1].n_obs) == (3, 4)
    assert (out[2].s_level, out[2].n_obs) == (7, 2)
    assert out[1].critical_ratio_e6 == 750000


def test_skyline_screen_domination_cases(spark):
    from cubicerp_client_etl_spark.operators.quality import skyline_screen

    pts = spark.createDataFrame(
        [
            (1, 10, 50),   # frontier (cheapest)
            (2, 20, 40),   # frontier (more cost, better rate)
            (3, 20, 45),   # dominated by 2 (same cost, worse rate)
            (4, 30, 40),   # dominated by 2 (worse cost, same rate)
            (5, 40, 10),   # frontier
            (6, 40, 10),   # duplicate of 5 -> kept once (lowest id)
            (7, 50, 60),   # dominated by 1
        ],
        "id int, cost long, rate long",
    )
    out = {
        r.id: r.is_frontier
        for r in skyline_screen(pts, "cost", "rate", "id").collect()
    }
    assert out == {
        1: True, 2: True, 3: False, 4: False, 5: True, 6: False, 7: False,
    }
