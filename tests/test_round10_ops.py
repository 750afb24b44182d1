"""Round-10 operator semantics: AR aging, three-way match,
duplicate-payment screen, basket affinity, PSI drift, RFM quintiles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- AR aging ----


def test_ar_aging_buckets_edges_and_default_asof(spark):
    from cubicerp_client_etl_spark.operators.finance import ar_aging_buckets

    # newest doc 2024-03-31 → as-of 2024-04-01; ages: 1, 30, 31, 91
    rows = [
        (1, "2024-03-31", 100),
        (2, "2024-03-02", 200),  # age 30 → still 0-30
        (3, "2024-03-01", 300),  # age 31 → 31-60
        (1, "2024-01-01", 400),  # age 91 → 91+
    ]
    df = spark.createDataFrame(rows, "cust long, d string, cents long")
    out = {
        r.bucket: r
        for r in ar_aging_buckets(df, "d", "cents", "cust").collect()
    }
    assert out["0-30"].n_docs == 2 and out["0-30"].total_cents == 300
    assert out["0-30"].n_entities == 2
    assert out["31-60"].n_docs == 1 and out["31-60"].total_cents == 300
    assert out["91+"].n_docs == 1 and out["91+"].total_cents == 400
    assert "61-90" not in out


# ------------------------------------------------------- three-way match ----


def test_three_way_match_all_statuses(spark):
    from cubicerp_client_etl_spark.operators.finance import three_way_match

    po = spark.createDataFrame(
        [(k, 10, 500) for k in range(1, 7)], "k long, qty long, price_cents long"
    )
    rcv = spark.createDataFrame(
        [
            (1, 10),  # matched
            (2, 9),   # qty_mismatch (short receipt)
            (3, 10),  # price_mismatch via invoice
            (4, 9),   # both
            (6, 10),  # missing_invoice
        ],
        "k long, qty long",
    )
    inv = spark.createDataFrame(
        [
            (1, 10, 500),
            (2, 9, 500),
            (3, 10, 501),
            (4, 9, 501),
            (5, 10, 500),  # missing_receipt takes precedence
        ],
        "k long, qty long, price_cents long",
    )
    out = {
        r.k: r
        for r in three_way_match(po, rcv, inv, ["k"], "qty", "price_cents").collect()
    }
    assert out[1].match_status == "matched"
    assert out[2].match_status == "qty_mismatch" and out[2].qty_gap == -1
    assert out[3].match_status == "price_mismatch"
    assert out[3].price_gap_cents == 1
    assert out[4].match_status == "both"
    assert out[5].match_status == "missing_receipt"
    assert out[6].match_status == "missing_invoice"


def test_three_way_match_invoice_over_receipt_is_qty_mismatch(spark):
    from cubicerp_client_etl_spark.operators.finance import three_way_match

    # receipt agrees with PO but the invoice bills MORE than received
    po = spark.createDataFrame([(1, 10, 500)], "k long, qty long, price_cents long")
    rcv = spark.createDataFrame([(1, 10)], "k long, qty long")
    inv = spark.createDataFrame([(1, 12, 500)], "k long, qty long, price_cents long")
    r = three_way_match(po, rcv, inv, ["k"], "qty", "price_cents").collect()[0]
    assert r.match_status == "qty_mismatch" and r.qty_gap == 2


# ----------------------------------------------- duplicate payment screen ----


def test_duplicate_payment_screen_groups_and_span(spark):
    from cubicerp_client_etl_spark.operators.finance import (
        duplicate_payment_screen,
    )

    rows = [
        (7, 100, 1, "2024-01-01"),
        (7, 100, 5, "2024-01-04"),  # dup pair, span 3
        (7, 200, 2, "2024-01-01"),  # different amount → no group
        (8, 100, 3, "2024-01-01"),  # different entity → no group
        (9, 300, 4, "2024-02-01"),
        (9, 300, 6, "2024-02-01"),  # same-day double post, span 0
    ]
    df = spark.createDataFrame(rows, "e long, cents long, id long, d string")
    out = {
        (r.e, r.amount_cents): r
        for r in duplicate_payment_screen(df, "e", "cents", "id", "d").collect()
    }
    assert set(out) == {(7, 100), (9, 300)}
    assert out[(7, 100)].n_docs == 2
    assert (out[(7, 100)].first_id, out[(7, 100)].last_id) == (1, 5)
    assert out[(7, 100)].span_days == 3
    assert out[(9, 300)].span_days == 0


# ------------------------------------------------------- basket affinity ----


def test_basket_affinity_lift_exact_and_dedup(spark):
    from cubicerp_client_etl_spark.operators.graph import basket_affinity

    # 4 baskets; (a,b) together in 2 of them; item a repeated within
    # basket 1 must count once
    rows = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = basket_affinity(df, "b", "i", min_pair_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b) == ("a", "b")
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 2)
    # lift = n_baskets * n_ab / (n_a * n_b) = 4*2/(3*2) = 1.333...
    assert r.lift_e6 == 1_333_333


def test_basket_affinity_min_support_prunes(spark):
    from cubicerp_client_etl_spark.operators.graph import basket_affinity

    df = spark.createDataFrame([(1, "a"), (1, "b")], "b long, i string")
    assert basket_affinity(df, "b", "i", min_pair_support=2).count() == 0
    assert basket_affinity(df, "b", "i", min_pair_support=1).count() == 1
    with pytest.raises(ValueError):
        basket_affinity(df, "b", "i", min_pair_support=0)


# ------------------------------------------------------------- PSI drift ----


def test_psi_drift_identical_populations_zero(spark):
    from cubicerp_client_etl_spark.operators.drift import psi_drift

    rows = [(i % 5,) for i in range(100)]
    a = spark.createDataFrame(rows, "bucket long")
    b = spark.createDataFrame(rows, "bucket long")
    out = psi_drift(a, b, "bucket").collect()
    assert len(out) == 5
    for r in out:
        assert r.llr_e6 == 0 and r.psi_contrib_e12 == 0
        assert r.p_e6 == r.q_e6


def test_psi_drift_disjoint_buckets_positive_total(spark):
    from cubicerp_client_etl_spark.operators.drift import psi_drift

    a = spark.createDataFrame([(1,)] * 50, "bucket long")
    b = spark.createDataFrame([(2,)] * 50, "bucket long")
    out = psi_drift(a, b, "bucket").collect()
    assert len(out) == 2  # union grid
    total = sum(r.psi_contrib_e12 for r in out)
    # fully shifted distribution → PSI far above the 0.25 action line
    assert total > 250_000 * 1_000_000
    # smoothing keeps every contribution finite and each one positive
    # here ((p−q) and ln(p/q) share sign)
    assert all(r.psi_contrib_e12 > 0 for r in out)


# ---------------------------------------------------------------- RFM ----


def test_rfm_quintile_rule_exact(spark):
    from cubicerp_client_etl_spark.operators.behavior import rfm_segmentation

    # 5 customers, one order each on distinct days with distinct
    # amounts: frequency ties (all f=1 → every f cum=5 → score 5);
    # recency/monetary are clean quintiles 1..5
    rows = [
        (1, "2024-01-05", 500),  # most recent, highest spend
        (2, "2024-01-04", 400),
        (3, "2024-01-03", 300),
        (4, "2024-01-02", 200),
        (5, "2024-01-01", 100),
    ]
    df = spark.createDataFrame(rows, "cust long, d string, cents long")
    out = rfm_segmentation(df, "cust", "d", "cents").collect()
    cells = {(r.r_score, r.f_score, r.m_score): r for r in out}
    # ascending rule: cust1 has smallest recency (1 day) → r=1, largest
    # monetary → m=5; ties in f all share score 5
    assert (1, 5, 5) in cells and cells[(1, 5, 5)].total_cents == 500
    assert (5, 5, 1) in cells and cells[(5, 5, 1)].total_cents == 100
    assert sum(r.n_entities for r in out) == 5
    for r in out:
        assert r.f_score == 5  # all-tied metric shares the top score


# ------------------------------------------------------------- AVCO ----


def test_avco_hand_computed_recurrence(spark):
    from cubicerp_client_etl_spark.operators.history import avco_inventory

    # receipt 10 @ 100 → value 1000; receipt 10 @ 200 → value 3000,
    # onhand 20 (avg 150); issue 5 → cogs = 3000*5//20 = 750, value
    # 2250, onhand 15; issue 7 → cogs = 2250*7//15 = 1050, value 1200,
    # onhand 8
    rows = [
        (1, 0, 10, 100),
        (1, 1, 10, 200),
        (1, 2, -5, 0),
        (1, 3, -7, 0),
    ]
    df = spark.createDataFrame(rows, "p long, s long, q long, c long")
    out = {
        r.s: r for r in avco_inventory(df, "p", "s", "q", "c").collect()
    }
    assert (out[0].onhand_after, out[0].value_cents_after) == (10, 1000)
    assert (out[1].onhand_after, out[1].value_cents_after) == (20, 3000)
    assert (out[2].cogs_cents, out[2].value_cents_after) == (750, 2250)
    assert (out[3].cogs_cents, out[3].onhand_after) == (1050, 8)


def test_walker_key_contract_int_cast_and_string_raise(spark):
    """ADVICE r10: the Arrow walkers hardcode `key long`/`part long`
    in their output schemas — an INT key must be cast (not Arrow-fail),
    a STRING key must raise loudly with guidance."""
    import pytest

    from cubicerp_client_etl_spark.operators.forecast import ses_forecast
    from cubicerp_client_etl_spark.operators.history import avco_inventory

    # int (not long) keys cast cleanly end-to-end
    ses_int = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 104)], "k int, p int, v int"
    )
    out = {r.p: r for r in ses_forecast(ses_int, "k", "p", "v").collect()}
    assert out[1].forecast == 100 and out[1].level == 101
    avco_int = spark.createDataFrame(
        [(1, 0, 10, 100)], "p int, s int, q int, c int"
    )
    assert avco_inventory(avco_int, "p", "s", "q", "c").count() == 1

    # string keys raise with a hash-the-key hint instead of an Arrow
    # conversion failure / silent nulls
    ses_str = spark.createDataFrame([("a", 0, 100)], "k string, p int, v int")
    with pytest.raises(TypeError, match="integer"):
        ses_forecast(ses_str, "k", "p", "v")
    avco_str = spark.createDataFrame(
        [("a", 0, 10, 100)], "p string, s int, q int, c int"
    )
    with pytest.raises(TypeError, match="integer"):
        avco_inventory(avco_str, "p", "s", "q", "c")


def test_avco_value_conservation_property(spark):
    """Invariant: at every step, value = Σ receipts·price − Σ cogs so
    far (the walk tracks total value exactly; rounding never leaks)."""
    from cubicerp_client_etl_spark.operators.history import avco_inventory

    rows = []
    for p in range(3):
        seq = 0
        for i in range(12):
            q = (i * 7 + p) % 9 + 1
            rows.append((p, seq, q, (i * 13 + 50) % 300 + 1))
            seq += 1
            if i % 2 == 1:
                rows.append((p, seq, -(q // 2 + 1), 0))
                seq += 1
    df = spark.createDataFrame(rows, "p long, s long, q long, c long")
    out = avco_inventory(df, "p", "s", "q", "c").collect()
    by_part: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.p, r.s)):
        by_part.setdefault(r.p, []).append(r)
    src = {(p, s): (q, c) for p, s, q, c in rows}
    for p, steps in by_part.items():
        receipts = cogs = 0
        for r in steps:
            q, c = src[(p, r.s)]
            if q > 0:
                receipts += q * c
            cogs += r.cogs_cents
            assert r.value_cents_after == receipts - cogs, r
            assert r.onhand_after >= 0, r


# ---------------------------------------------------------- reorder point ----


def test_reorder_point_hand_computed(spark):
    from cubicerp_client_etl_spark.operators.history import reorder_point

    # part 1: daily demands 4, 8 → n=2, mean=6, var=((2*80)-144)/4=4,
    # std=2, ROP = 6*4 + (4*2*2)//2 = 24+8 = 32
    rows = [
        (1, "d1", 3), (1, "d1", 1),   # day d1 total 4
        (1, "d2", 8),
        (2, "d1", 5),                  # single day → var 0, std 0
    ]
    df = spark.createDataFrame(rows, "p long, d string, q long")
    out = {
        r.p: r
        for r in reorder_point(df, "p", "d", "q", lead_days=4, z_x2=4).collect()
    }
    assert out[1].n_days == 2 and out[1].mean_qty == 6
    assert out[1].var_qty == 4 and out[1].std_qty == 2
    assert out[1].reorder_point == 32
    assert out[2].var_qty == 0 and out[2].reorder_point == 20
    with pytest.raises(ValueError):
        reorder_point(df, "p", "d", "q", lead_days=0)


# ----------------------------------------------- referential integrity ----


def test_referential_integrity_audit_counts_orphans_and_nulls(spark):
    from cubicerp_client_etl_spark.operators.quality import (
        referential_integrity_audit,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = referential_integrity_audit(
        [("child->parent", child, "fk", parent, "pk")]
    ).collect()
    assert len(out) == 1
    r = out[0]
    # 99 is an orphan; the NULL FK is unparented too
    assert r.n_child == 4 and r.n_orphans == 2
    assert r.orphan_share_e6 == 500_000
    with pytest.raises(ValueError):
        referential_integrity_audit([])


# --------------------------------------------------- last-touch attribution ----


def test_last_touch_attribution_prev_event_and_direct(spark):
    from cubicerp_client_etl_spark.operators.behavior import (
        last_touch_attribution,
    )

    rows = [
        # user 1: view → purchase (credited to view)
        (1, 10, 1, "view", 0.0),
        (1, 20, 2, "purchase", 9.7),
        # user 2: purchase first (direct), then click → purchase
        (2, 5, 3, "purchase", 3.2),
        (2, 6, 4, "click", 0.0),
        (2, 7, 5, "purchase", 4.9),
    ]
    df = spark.createDataFrame(rows, "u long, t long, e long, ty string, v double")
    out = {
        r.source_type: r
        for r in last_touch_attribution(
            df, "u", "t", "e", "ty", "v", "purchase"
        ).collect()
    }
    assert out["view"].n_conversions == 1
    assert out["view"].sum_value_floor == 9  # floor(9.7)
    assert out["direct"].n_conversions == 1
    assert out["direct"].sum_value_floor == 3
    assert out["click"].n_conversions == 1
    assert out["click"].sum_value_floor == 4
    # a purchase right after a purchase credits the previous purchase —
    # never re-credits itself
    assert set(out) == {"view", "direct", "click"}


# ----------------------------------------------------------------- SES ----


def test_ses_forecast_hand_computed_including_negative_step(spark):
    from cubicerp_client_etl_spark.operators.forecast import ses_forecast

    # alpha 1/4: 100 → level 100; x=80: fc 100, step trunc(-20/4)=-5 →
    # 95; x=96: fc 95, step trunc(1/4)=0 → 95 (truncation toward zero,
    # NOT floor: floor of -20/4 is the same, but -1//4 differs — pin
    # with x=94: step trunc(-1/4)=0 keeps 95)
    rows = [(1, 1, 100), (1, 2, 80), (1, 3, 96), (1, 4, 94)]
    df = spark.createDataFrame(rows, "k long, p long, v long")
    out = {r.p: r for r in ses_forecast(df, "k", "p", "v").collect()}
    assert out[1].forecast is None and out[1].level == 100
    assert (out[2].forecast, out[2].level, out[2].abs_err) == (100, 95, 20)
    assert (out[3].forecast, out[3].level) == (95, 95)
    assert (out[4].forecast, out[4].level) == (95, 95)  # trunc(-1/4)=0
    with pytest.raises(ValueError):
        ses_forecast(df, "k", "p", "v", alpha_den=0)


# -------------------------------------------------------------- KM curve ----


def test_km_survival_hand_computed_with_censoring(spark):
    from cubicerp_client_etl_spark.operators.forecast import km_survival_curve

    # durations: events at t=2 (1 of 5 at risk), t=5 (1 of 3);
    # censored at t=3 (drops risk set) and t=5; survivor censored at 7
    rows = [(2, 1), (3, 0), (5, 1), (5, 0), (7, 0)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    out = {r.t: r for r in km_survival_curve(df, "dur", "ev").collect()}
    assert set(out) == {2, 5}
    assert out[2].n_at_risk == 5 and out[2].d_events == 1
    assert out[2].hazard_e6 == 200_000
    # ln(4/5)*1e6 ≈ -223144 (round)
    assert out[2].log_surv_e6 == -223144
    assert out[5].n_at_risk == 3 and out[5].d_events == 1
    assert out[5].n_censored_at_t == 1
    # cumulative: ln(4/5)+ln(2/3) ≈ -0.628609 → -628609 ± 1 rounding
    assert abs(out[5].log_surv_e6 - (-628609)) <= 1


def test_km_survival_everyone_dies_final_step_null_log(spark):
    from cubicerp_client_etl_spark.operators.forecast import km_survival_curve

    df = spark.createDataFrame([(1, 1), (1, 1)], "dur long, ev int")
    out = km_survival_curve(df, "dur", "ev").collect()
    assert len(out) == 1
    r = out[0]
    assert r.d_events == r.n_at_risk == 2
    assert r.hazard_e6 == 1_000_000 and r.log_surv_e6 is None


# --------------------------------------------------------------- finance ----


def test_trial_balance_balances_and_imbalance_detection(spark):
    from cubicerp_client_etl_spark.operators.finance import trial_balance

    # balanced journal: AR 100 / REV 100; plus an UNBALANCED orphan
    # debit of 7 that the global check must surface
    rows = [
        ("AR", 100, 0),
        ("REV", 0, 100),
        ("SUSPENSE", 7, 0),
    ]
    df = spark.createDataFrame(rows, "account string, d long, c long")
    out = {r.account: r for r in trial_balance(df, "account", "d", "c").collect()}
    assert out["AR"].balance_cents == 100
    assert out["REV"].balance_cents == -100
    assert all(r.journal_imbalance_cents == 7 for r in out.values())


def test_budget_vs_actual_grid_and_ytd(spark):
    from cubicerp_client_etl_spark.operators.finance import budget_vs_actual

    act = spark.createDataFrame(
        [("g", 1, 100), ("g", 2, 150)], "grp string, p long, amt long"
    )
    bud = spark.createDataFrame(
        [("g", 1, 120), ("g", 3, 130)], "grp string, p long, amt long"
    )
    out = {
        r.period: r
        for r in budget_vs_actual(act, bud, ["grp"], "p", "amt").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].variance_cents == -20
    assert out[2].budget_cents == 0 and out[2].variance_cents == 150
    assert out[3].actual_cents == 0 and out[3].variance_cents == -130
    assert out[3].ytd_actual_cents == 250
    assert out[3].ytd_budget_cents == 250
    assert out[3].ytd_variance_cents == 0
