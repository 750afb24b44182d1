"""Finance analytics: variance decomposition between periods.

The reference moves accounting rows (its ledger/reconciliation surface,
cubicerpetl.py:775-787); the questions a finance team asks OF those
rows — "how much of the revenue change is price, how much volume, how
much assortment?" — are first-class operators here, in the exact
integer discipline the rest of the engine uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def price_volume_bridge(
    prev: DataFrame,
    cur: DataFrame,
    key_col: str,
    qty_col: str,
    rev_col: str,
) -> DataFrame:
    """Price–volume–mix bridge between two periods, per key: decompose
    each key's revenue change ``Δr = r₂ − r₁`` into

    - ``volume_eff = sign · (r₁·|q₂−q₁| div q₁)`` — the prior unit
      price applied to the quantity change (truncated on the
      NON-NEGATIVE product so truncation == floor in every engine —
      Spark's ``div`` truncates toward zero while DuckDB's ``//``
      floors, and they disagree on negatives; the sign-factored form
      sidesteps the class),
    - ``price_eff = Δr − volume_eff`` — the residual assignment, so
      the decomposition sums EXACTLY to Δr by construction (the
      rounding residue of the floored volume effect lands in the
      price effect, documented not hidden),

    and classify keys present in only one period as ``new`` (only
    current — Δr is all new-business) or ``lost`` (only prior).

    Input: one row per key per side with integer ``qty_col`` > 0 and
    integer ``rev_col`` (cents). Output one row per key:
    ``(key_col, status, q_prev, q_cur, rev_prev, rev_cur, delta_rev,
    volume_eff, price_eff)`` with status ∈ {'both','new','lost'} and
    the effects zero outside 'both'. Products run in DECIMAL(38,0).

    Scale: ONE full-outer equi-join on the key; everything else is
    per-row arithmetic. Callers aggregate raw lines to per-key period
    totals first (one keyed aggregation per side).
    """
    p = prev.select(
        F.col(key_col),
        F.col(qty_col).cast("bigint").alias("q_prev"),
        F.col(rev_col).cast("bigint").alias("rev_prev"),
    )
    c = cur.select(
        F.col(key_col),
        F.col(qty_col).cast("bigint").alias("q_cur"),
        F.col(rev_col).cast("bigint").alias("rev_cur"),
    )
    j = p.join(c, key_col, "full_outer")
    status = (
        F.when(F.col("q_prev").isNull(), F.lit("new"))
        .when(F.col("q_cur").isNull(), F.lit("lost"))
        .otherwise(F.lit("both"))
    )
    qp = F.coalesce("q_prev", F.lit(0)).cast("bigint")
    qc = F.coalesce("q_cur", F.lit(0)).cast("bigint")
    rp = F.coalesce("rev_prev", F.lit(0)).cast("bigint")
    rc = F.coalesce("rev_cur", F.lit(0)).cast("bigint")
    dq = qc - qp
    sign = F.when(dq < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    vol = F.when(
        (status == "both") & (qp > 0),
        sign
        * F.expr(
            "CAST(CAST(coalesce(rev_prev, 0) AS DECIMAL(38,0))"
            " * abs(coalesce(q_cur, 0) - coalesce(q_prev, 0))"
            " div coalesce(q_prev, 1) AS BIGINT)"
        ),
    ).otherwise(F.lit(0)).cast("bigint")
    return j.select(
        key_col,
        status.alias("status"),
        qp.alias("q_prev"),
        qc.alias("q_cur"),
        rp.alias("rev_prev"),
        rc.alias("rev_cur"),
        (rc - rp).cast("bigint").alias("delta_rev"),
        vol.alias("volume_eff"),
        F.when(status == "both", (rc - rp) - vol)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("price_eff"),
    )


def ar_aging_buckets(
    docs: DataFrame,
    date_col: str,
    amount_col: str,
    entity_col: str,
    as_of: Column | None = None,
    bounds: tuple[int, ...] = (30, 60, 90),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Accounts-receivable aging — the collections report: open
    documents bucketed by age at the as-of date (default: the day
    after the newest document, broadcast from a 1-row aggregate so the
    report is pure data, no wall clock — wall-clock reads would break
    replay and the oracle).

    ``bounds`` are inclusive upper day-edges: the default makes
    buckets '0-30', '31-60', '61-90', '91+'. Age is exact integer
    ``datediff`` in days.

    Returns one row per bucket (per ``group_cols`` combination when
    given — r15: the bank-reconciliation residual report ages both
    unmatched SIDES in one pass):
    ``(*group_cols, bucket, n_docs, n_entities, total_cents)``.

    Scale: one broadcast 1-row as-of join, one CASE, one keyed
    aggregation with map-side combine. Nothing else.
    """
    d = F.to_date(F.col(date_col))
    if as_of is None:
        asof_row = docs.agg(
            F.date_add(F.max(d), 1).alias("_asof")
        )
        staged = docs.crossJoin(F.broadcast(asof_row))
        asof = F.col("_asof")
    else:
        staged = docs
        asof = as_of
    age = F.datediff(asof, d)
    prev = 0
    expr = None
    for b in bounds:
        lbl = F.lit(f"{prev}-{b}")
        cond = age <= b
        expr = F.when(cond, lbl) if expr is None else expr.when(cond, lbl)
        prev = b + 1
    expr = expr.otherwise(F.lit(f"{prev}+"))
    return (
        staged.groupBy(*group_cols, expr.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct(F.col(entity_col)).cast("bigint").alias(
                "n_entities"
            ),
            F.sum(F.col(amount_col)).cast("bigint").alias("total_cents"),
        )
    )


def three_way_match(
    po: DataFrame,
    receipt: DataFrame,
    invoice: DataFrame,
    key_cols: list[str],
    qty_col: str = "qty",
    price_col: str = "price_cents",
) -> DataFrame:
    """Three-way match — the procurement control: purchase order,
    goods receipt, and supplier invoice reconciled line-by-line.
    Each input carries ``key_cols + (qty_col, price_cols)``; the match
    joins the three on the keys and classifies every line:

    - ``matched``        — receipt qty == PO qty AND invoice price ==
      PO price AND invoice qty == receipt qty
    - ``qty_mismatch``   — a quantity disagrees (short/over receipt,
      or invoice billing more than received)
    - ``price_mismatch`` — invoice unit price differs from PO
    - ``both``           — quantity AND price disagree
    - ``missing_receipt`` / ``missing_invoice`` — the document never
      arrived (left-join nulls), the lines a payables team must chase

    Returns one row per PO line: ``(key_cols..., po_qty, rcv_qty,
    inv_qty, po_price_cents, inv_price_cents, match_status,
    qty_gap, price_gap_cents)`` with integer gaps (invoice − PO).

    Scale: two equi-joins on the line key (high cardinality) — AQE
    reuses the hash partitioning across both; per-row CASE after.
    """
    p = po.select(
        *key_cols,
        F.col(qty_col).cast("bigint").alias("po_qty"),
        F.col(price_col).cast("bigint").alias("po_price_cents"),
    )
    r = receipt.select(
        *key_cols, F.col(qty_col).cast("bigint").alias("rcv_qty")
    )
    i = invoice.select(
        *key_cols,
        F.col(qty_col).cast("bigint").alias("inv_qty"),
        F.col(price_col).cast("bigint").alias("inv_price_cents"),
    )
    j = p.join(r, key_cols, "left").join(i, key_cols, "left")
    qty_bad = (
        F.col("rcv_qty").isNotNull()
        & F.col("inv_qty").isNotNull()
        & (
            (F.col("rcv_qty") != F.col("po_qty"))
            | (F.col("inv_qty") != F.col("rcv_qty"))
        )
    )
    price_bad = F.col("inv_price_cents").isNotNull() & (
        F.col("inv_price_cents") != F.col("po_price_cents")
    )
    status = (
        F.when(F.col("rcv_qty").isNull(), "missing_receipt")
        .when(F.col("inv_qty").isNull(), "missing_invoice")
        .when(qty_bad & price_bad, "both")
        .when(qty_bad, "qty_mismatch")
        .when(price_bad, "price_mismatch")
        .otherwise("matched")
    )
    return j.select(
        *key_cols,
        "po_qty",
        "rcv_qty",
        "inv_qty",
        "po_price_cents",
        "inv_price_cents",
        status.alias("match_status"),
        (F.col("inv_qty") - F.col("po_qty")).cast("bigint").alias("qty_gap"),
        (F.col("inv_price_cents") - F.col("po_price_cents"))
        .cast("bigint")
        .alias("price_gap_cents"),
    )


def duplicate_payment_screen(
    docs: DataFrame,
    entity_col: str,
    amount_col: str,
    id_col: str,
    date_col: str,
) -> DataFrame:
    """Duplicate-payment screen — the classic payables audit: documents
    sharing (entity, exact amount) under DIFFERENT ids are duplicate
    candidates (double-keyed invoice, re-sent file, double-click).

    Returns one row per candidate group (``n_docs >= 2``):
    ``(entity_col, amount_cents, n_docs, first_id, last_id,
    span_days)`` — the id range to pull and the day span between first
    and last occurrence (0 = same-day double post, the highest-risk
    case).

    Scale: ONE keyed aggregation on (entity, amount) with map-side
    combine + a HAVING. The group key is high-cardinality (entity ×
    amount), so no skew concentration; nothing global.
    """
    d = F.to_date(F.col(date_col))
    return (
        docs.groupBy(
            F.col(entity_col),
            F.col(amount_col).cast("bigint").alias("amount_cents"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(F.col(id_col)).cast("bigint").alias("first_id"),
            F.max(F.col(id_col)).cast("bigint").alias("last_id"),
            F.datediff(F.max(d), F.min(d)).cast("bigint").alias("span_days"),
        )
        .where(F.col("n_docs") >= 2)
    )


def trial_balance(
    journal: DataFrame,
    account_col: str,
    debit_col: str,
    credit_col: str,
) -> DataFrame:
    """Double-entry trial balance — the accounting close's first
    control: per account, total debits, total credits, and the net
    balance (debit − credit); plus the GLOBAL zero-sum check carried
    on every row (``journal_imbalance_cents``: Σdebits − Σcredits over
    the whole journal — 0 iff every entry was posted double-sided).

    Returns one row per account: ``(account_col, total_debit_cents,
    total_credit_cents, balance_cents, journal_imbalance_cents)``.

    Scale: ONE keyed aggregation (map-side combine) + a broadcast
    1-row global aggregate. Nothing else.
    """
    per = journal.groupBy(account_col).agg(
        F.sum(F.col(debit_col)).cast("bigint").alias("total_debit_cents"),
        F.sum(F.col(credit_col)).cast("bigint").alias("total_credit_cents"),
    )
    glob = per.agg(
        (F.sum("total_debit_cents") - F.sum("total_credit_cents"))
        .cast("bigint")
        .alias("journal_imbalance_cents")
    )
    return per.crossJoin(F.broadcast(glob)).select(
        account_col,
        "total_debit_cents",
        "total_credit_cents",
        (F.col("total_debit_cents") - F.col("total_credit_cents"))
        .cast("bigint")
        .alias("balance_cents"),
        "journal_imbalance_cents",
    )


def budget_vs_actual(
    actual: DataFrame,
    budget: DataFrame,
    group_cols: "list[str]",
    period_col: str,
    amount_col: str,
) -> DataFrame:
    """Budget-vs-actual variance with YTD cumulatives — the FP&A
    monthly close view: per (group, period), the actual, the budget,
    the period variance, and the year-to-date running totals of all
    three (cumulative over the period axis within each group).

    Periods ABSENT from one side report 0 for it (full-outer grid —
    a month with budget and no actuals IS a variance). The YTD
    cumulatives run on a window PARTITIONED BY the group over the
    bounded period axis (months of a year — never raw rows).

    Returns one row per (group, period): ``(group_cols..., period,
    actual_cents, budget_cents, variance_cents, ytd_actual_cents,
    ytd_budget_cents, ytd_variance_cents)``.

    Scale: two keyed aggregations + one full-outer join on
    (group, period) + one group-keyed window over the bounded period
    grid.
    """
    a = actual.groupBy(
        *group_cols, F.col(period_col).alias("period")
    ).agg(F.sum(F.col(amount_col)).cast("bigint").alias("actual_cents"))
    b = budget.groupBy(
        *group_cols, F.col(period_col).alias("period")
    ).agg(F.sum(F.col(amount_col)).cast("bigint").alias("budget_cents"))
    grid = (
        a.join(b, [*group_cols, "period"], "full_outer")
        .withColumn(
            "actual_cents",
            F.coalesce("actual_cents", F.lit(0)).cast("bigint"),
        )
        .withColumn(
            "budget_cents",
            F.coalesce("budget_cents", F.lit(0)).cast("bigint"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        *group_cols,
        "period",
        "actual_cents",
        "budget_cents",
        (F.col("actual_cents") - F.col("budget_cents"))
        .cast("bigint")
        .alias("variance_cents"),
        F.sum("actual_cents").over(w).cast("bigint").alias("ytd_actual_cents"),
        F.sum("budget_cents").over(w).cast("bigint").alias("ytd_budget_cents"),
        (F.sum("actual_cents").over(w) - F.sum("budget_cents").over(w))
        .cast("bigint")
        .alias("ytd_variance_cents"),
    )


def depreciation_schedule(
    assets: DataFrame,
    id_col: str,
    cost_col: str,
    life_col: str,
) -> DataFrame:
    """Straight-line depreciation schedule with EXACT largest-remainder
    cents: asset cost ``cost_col`` (cents) spreads over ``life_col``
    periods as ``cost div life`` per period, with the remainder's
    cents landing one each on the EARLIEST periods — so the schedule
    sums to the cost exactly (no penny drift), the invariant every
    fixed-asset subledger audit checks first.

    Returns one row per (asset, period 1..life): ``(id_col, period,
    depreciation_cents, accum_cents, nbv_cents)``. Everything is
    CLOSED-FORM in the period index (accum = period·base +
    min(period, remainder)), so the explode is a pure map stage — no
    window, no shuffle; the reference books depreciation one journal
    row at a time (cubicerpetl.py:494 shape).
    """
    src = assets.select(
        F.col(id_col),
        F.col(cost_col).cast("bigint").alias("_cost"),
        F.col(life_col).cast("bigint").alias("_life"),
    ).where(F.col("_life") > 0)
    exploded = src.select(
        id_col,
        "_cost",
        "_life",
        F.explode(F.sequence(F.lit(1), F.col("_life"))).alias("period"),
    )
    base = F.expr("_cost div _life")
    rem = F.expr("_cost % _life")
    accum = F.col("period") * base + F.least(F.col("period"), rem)
    dep = base + F.when(F.col("period") <= rem, 1).otherwise(0)
    return exploded.select(
        id_col,
        F.col("period").cast("bigint").alias("period"),
        dep.cast("bigint").alias("depreciation_cents"),
        accum.cast("bigint").alias("accum_cents"),
        (F.col("_cost") - accum).cast("bigint").alias("nbv_cents"),
    )


def near_duplicate_invoice_screen(
    invoices: DataFrame,
    party_col: str,
    id_col: str,
    amount_col: str,
    date_col: str,
    amount_tol_cents: int = 100,
    day_window: int = 7,
    bucket_cents: int = 10_000,
) -> DataFrame:
    """FUZZY duplicate-payment screen — the near-amount twin of
    ``duplicate_payment_screen`` (q266 catches exact (party, amount)
    re-posts; this catches the re-keyed invoice that differs by a few
    cents or a corrected date): pairs of invoices for the SAME party
    whose amounts differ by at most ``amount_tol_cents`` (ABSOLUTE
    cents — a percent tolerance cannot guarantee the band join below
    stays lossless, since x% of a big invoice can exceed any fixed
    bucket width) and whose dates are within ``day_window`` days.

    Never all-pairs, and LOSSLESS by construction: amounts bucket at
    ``bucket_cents`` (must be >= the tolerance — enforced) and each
    invoice probes its own and the NEXT bucket, so any pair within
    tolerance differs by at most one bucket; the exact tolerance
    check runs on candidates only. Pairs are unique without a
    DISTINCT shuffle (the q050 (birth q204) matching-key-election rule): a pair is
    emitted only at probe key ``greatest(bucket_a, bucket_b)`` — when
    the buckets are EQUAL the pair collides at both b and b+1 and
    greatest keeps exactly the b collision; when they differ by one
    the ONLY shared probe key IS the larger bucket (a probes {b_a,
    b_a+1}, b probes {b_a+1, b_a+2} — they meet at b_a+1 alone), so
    least() would drop the pair entirely (caught by the sf0.1 sweep:
    boundary-straddling pairs vanished).

    Returns ``(party, id_a, id_b, amount_a, amount_b, diff_cents,
    day_gap)`` with ``id_a < id_b``.
    """
    if bucket_cents < amount_tol_cents:
        raise ValueError(
            "bucket_cents must be >= amount_tol_cents for the band "
            "join to be lossless"
        )
    src = invoices.select(
        F.col(party_col).alias("party"),
        F.col(id_col).alias("inv_id"),
        F.col(amount_col).cast("bigint").alias("amt"),
        F.col(date_col).cast("date").alias("dt"),
    ).withColumn("bkt", F.expr("amt div " + str(int(bucket_cents))))
    a = src.select(
        "party",
        F.col("inv_id").alias("id_a"),
        F.col("amt").alias("amount_a"),
        F.col("dt").alias("dt_a"),
        F.col("bkt").alias("bkt_a"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("probe"),
    )
    b = src.select(
        "party",
        F.col("inv_id").alias("id_b"),
        F.col("amt").alias("amount_b"),
        F.col("dt").alias("dt_b"),
        F.col("bkt").alias("bkt_b"),
        F.explode(F.array(F.col("bkt"), F.col("bkt") + 1)).alias("probe"),
    )
    diff = F.abs(F.col("amount_a") - F.col("amount_b"))
    tol_ok = diff <= F.lit(int(amount_tol_cents))
    gap = F.abs(F.datediff("dt_a", "dt_b"))
    return (
        a.join(b, ["party", "probe"])
        .where(F.col("id_a") < F.col("id_b"))
        # emit each candidate pair exactly once: at the probe key the
        # two sides are GUARANTEED to share (see docstring)
        .where(F.col("probe") == F.greatest("bkt_a", "bkt_b"))
        .where(tol_ok & (gap <= day_window))
        .select(
            "party",
            "id_a",
            "id_b",
            "amount_a",
            "amount_b",
            diff.cast("bigint").alias("diff_cents"),
            gap.cast("bigint").alias("day_gap"),
        )
    )


def cash_application_match(
    stmts: DataFrame,
    invoices: DataFrame,
    stmt_id_col: str = "stmt_id",
    inv_id_col: str = "inv_id",
    amount_col: str = "amount_cents",
    stmt_date_col: str = "value_date",
    inv_date_col: str = "inv_date",
    max_lag_days: int = 10,
    hot_amount_cap: int | None = None,
) -> DataFrame:
    """Cash application: match bank-statement lines to open invoices —
    the reconciliation the reference's ledger sink feeds a human to do
    (cubicerpetl.py:775-787 moves the rows; this operator closes them).

    Matching law (deterministic, engine-replayable):

    - CANDIDATES: exact amount equality AND the payment lands within
      ``(0, max_lag_days]`` days AFTER the invoice date;
    - MUTUAL BEST: each statement line ranks its candidates by
      (smallest day lag, then invoice id), each invoice ranks its
      candidates by (smallest day lag, then statement id); a pair is
      applied iff each side is the other's rank-1. This is ONE round
      of greedy stable matching — deterministic and iteration-free,
      documented as such (a full assignment solve would re-rank after
      each removal; cash-app products ship exactly this one-round
      auto-match and queue the remainder for review).

    Output: one row per APPLIED pair ``(stmt_id, inv_id, amount_cents,
    day_lag)``.

    Scale: candidates come from ONE equi-join on the integer amount
    (high-cardinality key), then two window ranks partitioned by
    either id. No cross join, no iteration. Candidate volume through
    an amount shared by ``d_s`` statements and ``d_i`` invoices is
    ``d_s·d_i`` — collision density grows with the corpus (the r14
    census read the uncapped query at 3.6x on 10x data), so the
    uncapped form is the exact-match contract and ``hot_amount_cap``
    is the 100 TB tier:

    ``hot_amount_cap`` (opt-in, the q021/q002 occupancy-cap recipe):
    census both sides' per-amount occupancy with one keyed COUNT
    each; amounts where EITHER side exceeds the cap are dropped
    ENTIRELY before the candidate join (real cash-app products queue
    exactly these ambiguous amounts for manual review), bounding any
    amount's candidate contribution at cap². Because a row's
    candidates and both mutual-best rankings only ever see its OWN
    amount, the applied pairs for every surviving amount are
    bit-identical to the uncapped law's — drop-only, engine-replayable
    (occupancy is a plain COUNT). The census joins ride the same
    amount key as the candidate join, so no extra shuffle shape.
    """
    s = stmts.select(
        F.col(stmt_id_col).alias("_sid"),
        F.col(amount_col).cast("bigint").alias("_amt"),
        F.col(stmt_date_col).alias("_sdt"),
    )
    i = invoices.select(
        F.col(inv_id_col).alias("_iid"),
        F.col(amount_col).cast("bigint").alias("_amt"),
        F.col(inv_date_col).alias("_idt"),
    )
    if hot_amount_cap is not None:
        if hot_amount_cap < 1:
            raise ValueError("hot_amount_cap must be >= 1")
        occ_s = s.groupBy("_amt").agg(F.count(F.lit(1)).alias("_ms"))
        occ_i = i.groupBy("_amt").agg(F.count(F.lit(1)).alias("_mi"))
        live = (
            occ_s.join(occ_i, "_amt")
            .where(
                (F.col("_ms") <= hot_amount_cap)
                & (F.col("_mi") <= hot_amount_cap)
            )
            .select("_amt")
        )
        s = s.join(live, "_amt")
        i = i.join(live, "_amt")
    # NOTE (r16 measured, then reverted): a composite (amount,
    # date-bucket-of-width-max_lag) candidate join key — invoice side
    # carries its one bucket, statement side explodes into the ≤2
    # buckets covering [sdt−max_lag, sdt−1] — provably preserves the
    # candidate set while bounding per-amount collision growth, but
    # A/B read FLAT at sf0.1 AND sf1 (q313 6.34→6.80 s, q015
    # 3.76→3.73 s medians): at these scales o_totalprice amounts are
    # nearly unique, so the plain amount join was never hot and the
    # explode only added map work. Reverted per the measured-wins-only
    # discipline; if a real ledger shows amount skew, that form (or
    # ``hot_amount_cap``) is the remedy.
    lag = F.datediff("_sdt", "_idt")
    cand = (
        s.join(i, "_amt")
        .where((lag > 0) & (lag <= max_lag_days))
        .select("_sid", "_iid", "_amt", lag.alias("_lag"))
    )
    w_s = Window.partitionBy("_sid").orderBy("_lag", "_iid")
    w_i = Window.partitionBy("_iid").orderBy("_lag", "_sid")
    return (
        cand.withColumn("_rs", F.row_number().over(w_s))
        .withColumn("_ri", F.row_number().over(w_i))
        .where((F.col("_rs") == 1) & (F.col("_ri") == 1))
        .select(
            F.col("_sid").alias(stmt_id_col),
            F.col("_iid").alias(inv_id_col),
            F.col("_amt").alias(amount_col),
            F.col("_lag").cast("bigint").alias("day_lag"),
        )
    )


def progressive_brackets(
    df: DataFrame,
    amount_col: str,
    brackets: list[tuple[int, int]],
    out_col: str = "tax_cents",
) -> DataFrame:
    """Progressive marginal-bracket arithmetic (payroll tax, customs
    duty, tiered commissions): ``out = Σ_b rate_b · overlap_b`` where
    ``overlap_b = clamp(amount − lower_b, 0, upper_b − lower_b)``.

    ``brackets`` is ``[(lower_cents, rate_e6), ...]`` sorted ascending
    by lower bound with the first lower bound 0; each bracket runs to
    the next lower bound (the last is open-ended). Exact integers all
    the way: per-bracket tax is ``rate_e6 · overlap div 10⁶`` with the
    NON-NEGATIVE product carried in DECIMAL(38,0) (ADVICE r14: the
    bigint form overflows once amounts pass ~9.2e12/rate — exactly the
    e6_floor_ratio pitfall; truncation == floor on the non-negative
    product in every engine, and DuckDB oracles keep the plain bigint
    form, identical below its overflow ceiling where they'd abort, not
    diverge), summed over the literal bracket array — no join, no UDF.

    Output: input plus ``out_col`` (bigint cents) and
    ``effective_rate_e6 = floor(10⁶·out / amount)`` (0 for amount == 0,
    via ``e6_floor_ratio`` so the full bigint range is exact). Columns
    are referenced with ``F.col`` — names needing backticks work.
    """
    from ..functions import e6_floor_ratio

    lowers = [int(lo) for lo, _ in brackets]
    assert lowers == sorted(lowers) and lowers[0] == 0, "brackets must ascend from 0"
    amt = F.col(amount_col).cast("bigint")
    tax = None
    for idx, (lo, rate_e6) in enumerate(brackets):
        upper = lowers[idx + 1] if idx + 1 < len(brackets) else None
        span = (
            F.least(amt, F.lit(int(upper))) if upper is not None else amt
        ) - F.lit(int(lo))
        overlap = F.greatest(span, F.lit(0)).cast("decimal(38,0)")
        # floor((rate_e6 · overlap) / 1e6) on a non-negative DECIMAL(38,0)
        # product: the 6-dp quotient is exactly representable at the
        # division's result scale, so floor needs no correction step.
        prod = overlap * F.lit(int(rate_e6)).cast("decimal(38,0)")
        term = F.floor(prod / F.lit(1000000).cast("decimal(38,0)")).cast("bigint")
        tax = term if tax is None else tax + term
    out = df.withColumn(out_col, tax.cast("bigint"))
    eff = F.when(
        amt > 0, e6_floor_ratio(F.col(out_col).cast("bigint"), amt)
    ).otherwise(F.lit(0))
    return out.withColumn("effective_rate_e6", eff.cast("bigint"))


def fx_revaluation(
    items: DataFrame,
    rates: DataFrame,
    close_month,
    cur_col: str = "cur",
    month_col: str = "m",
    amount_col: str = "cents",
    rate_col: str = "rate_e6",
) -> DataFrame:
    """Period-end FX revaluation of open foreign-currency items — the
    close-process step after as-of conversion (q234): each open item,
    booked at its booking-month rate, is restated at the CLOSING rate,
    and the difference is the unrealized gain/loss the close posts.

    ``items``: one row per open item ``(cur, m, cents)`` (booking
    month, amount in foreign-currency cents). ``rates``: the bounded
    ``(cur, m, rate_e6)`` dimension (broadcast — currencies × months).
    ``close_month``: the month whose rate restates everything.

    Output per ``(cur, m)``: item count, open FC cents, and the three
    e6-scaled sums — booking-rate base value, closing-rate base value,
    and ``unrealized = Σ cents·(rate_close − rate_book)`` (SIGNED) —
    each computed in DECIMAL(38,0) and emitted as a ``_hi``/``_lo``
    bigint pair (``hi_lo_bigint``). The group COUNT is bounded
    (currencies × months) but group SIZE grows linearly with the
    corpus, so Σ cents·rate_e6 (~4e16 per group at SF1) passes the
    bigint ceiling around SF≈200 — far below the 100 TB design point;
    the hi/lo split keeps every cell exact and driver-hashable at any
    SF (ADVICE r14). Exact integers throughout, every cell
    engine-replayable (the signed trunc-div/sign-of-dividend-mod
    convention agrees between Spark ``div``/``%`` and DuckDB HUGEINT
    ``//``/``%``).

    Scale: two broadcast joins against the bounded rate dimension +
    one keyed agg on (cur, m); no window, no shuffle beyond the agg.
    """
    from ..functions import hi_lo_bigint
    close_rates = rates.filter(F.col(month_col) == F.lit(close_month)).select(
        F.col(cur_col), F.col(rate_col).alias("_rate_close")
    )
    book = rates.select(
        F.col(cur_col), F.col(month_col), F.col(rate_col).alias("_rate_book")
    )
    j = (
        items.join(F.broadcast(book), [cur_col, month_col])
        .join(F.broadcast(close_rates), [cur_col])
    )
    amt_dec = F.col(amount_col).cast("decimal(38,0)")
    agg = (
        j.groupBy(cur_col, month_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(amount_col).cast("bigint").alias("open_fc_cents"),
            F.sum(amt_dec * F.col("_rate_book"))
            .cast("decimal(38,0)")
            .alias("_bbe"),
            F.sum(amt_dec * F.col("_rate_close"))
            .cast("decimal(38,0)")
            .alias("_bce"),
            F.sum(amt_dec * (F.col("_rate_close") - F.col("_rate_book")))
            .cast("decimal(38,0)")
            .alias("_ue"),
        )
    )
    return agg.select(
        cur_col,
        month_col,
        "n_items",
        "open_fc_cents",
        *hi_lo_bigint("_bbe", "base_book"),
        *hi_lo_bigint("_bce", "base_close"),
        *hi_lo_bigint("_ue", "unrealized"),
    )


def credit_netting_fifo(
    invoices: DataFrame,
    credits: DataFrame,
    entity_col: str = "custkey",
    amount_col: str = "amount_cents",
    date_col: str = "doc_date",
    id_col: str = "doc_id",
) -> DataFrame:
    """Payment-run netting with credit memos — before a payment run,
    each customer's open credit memos are netted against their open
    invoices OLDEST-FIRST (the FIFO application rule AR teams post),
    and the run pays only the remainder. The reference's merge sink
    moves both document types row by row (cubicerpetl.py:775-787);
    this operator computes the netting the run needs.

    Law (deterministic, closed-form — NO walker): per entity the
    credit pool ``C = Σ credit_cents``; invoices ordered by
    ``(date, id)`` consume the pool in order:
    ``applied_i = clamp(C − cum_before_i, 0, amt_i)`` where
    ``cum_before_i`` is the exact prefix sum of amounts over earlier
    invoices — the q241/q014 cumulative-space trick (FIFO needs no
    iteration when the consumed resource is a single pool).

    Output per entity: ``(entity, n_inv, credit_pool_cents,
    applied_cents, open_after_cents, n_fully_netted,
    unapplied_credit_cents)`` — Σ applied + unapplied == C and
    applied + open_after == Σ amt hold exactly (cents, bigint).

    Scale: one keyed agg for the pool, one keyed join (entity — high
    cardinality), one prefix-sum window per entity (bounded per-entity
    fan), one keyed agg. All shuffles share the entity key.
    """
    pool = credits.groupBy(F.col(entity_col).alias("_ent")).agg(
        F.sum(F.col(amount_col).cast("bigint")).alias("_pool")
    )
    inv = invoices.select(
        F.col(entity_col).alias("_ent"),
        F.col(id_col).alias("_id"),
        F.col(date_col).alias("_dt"),
        F.col(amount_col).cast("bigint").alias("_amt"),
    )
    j = inv.join(pool, "_ent", "left").withColumn(
        "_pool", F.coalesce(F.col("_pool"), F.lit(0))
    )
    w = (
        Window.partitionBy("_ent")
        .orderBy("_dt", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("_amt").over(w), F.lit(0))
    applied = F.greatest(
        F.lit(0), F.least(F.col("_amt"), F.col("_pool") - cum_before)
    )
    staged = j.withColumn("_app", applied)
    return (
        staged.groupBy(F.col("_ent").alias(entity_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_inv"),
            F.first("_pool").cast("bigint").alias("credit_pool_cents"),
            F.sum("_app").cast("bigint").alias("applied_cents"),
            F.sum(F.col("_amt") - F.col("_app"))
            .cast("bigint")
            .alias("open_after_cents"),
            F.sum(
                F.when(F.col("_app") == F.col("_amt"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_fully_netted"),
            (F.first("_pool") - F.sum("_app"))
            .cast("bigint")
            .alias("unapplied_credit_cents"),
        )
    )


def expected_receipts_forecast(
    payments: DataFrame,
    open_invoices: DataFrame,
    entity_col: str = "custkey",
    lag_col: str = "pay_lag_days",
    amount_col: str = "amount_cents",
    date_col: str = "inv_date",
) -> DataFrame:
    """Cash-receipts forecast from open AR — the treasury step after
    the close: each open invoice's expected receipt date is its issue
    date plus the customer's HISTORICAL payment lag, and the forecast
    is the weekly receipts calendar treasury plans against.

    The lag statistic is the LOW MEDIAN (the k = (n+1) div 2-th
    smallest observed lag) — an order statistic, so it is an integer
    from the data and replays exactly in any engine (an interpolated
    median would be engine-rounding-dependent). Customers with no
    payment history fall back to the GLOBAL low median (one
    broadcastable row). Weeks are ``date_trunc('week',
    expected_date)`` — ISO Monday in both Spark and DuckDB.

    Output per week: ``(week, n_invoices, expected_cents)``.

    Scale: medians are computed on the (entity, lag) HISTOGRAM, not
    the raw payments — day lags are small integers (a payment
    arriving years late is an outlier, not a population), so the
    per-entity cumulative window runs over at most a few hundred
    histogram rows per entity regardless of corpus size, and the
    global median's single-partition window sees only the bounded
    distinct-lag histogram. One keyed agg (histogram), two windows on
    the entity key, one tiny single-partition window, one left join +
    1-row broadcast fallback, one keyed agg over the bounded week
    grid.
    """
    lags = payments.select(
        F.col(entity_col).alias("_ent"),
        F.col(lag_col).cast("bigint").alias("_lag"),
    )
    hist = lags.groupBy("_ent", "_lag").agg(F.count(F.lit(1)).alias("_c"))
    w_cum = (
        Window.partitionBy("_ent")
        .orderBy("_lag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("_ent")
    med = (
        hist.withColumn("_cum", F.sum("_c").over(w_cum))
        .withColumn("_n", F.sum("_c").over(w_tot))
        .where(F.col("_cum") >= F.expr("(_n + 1) div 2"))
        .groupBy("_ent")
        .agg(F.min("_lag").alias("_med"))
    )
    ghist = lags.groupBy("_lag").agg(F.count(F.lit(1)).alias("_c"))
    gw_cum = Window.orderBy("_lag").rowsBetween(Window.unboundedPreceding, 0)
    gw_tot = Window.partitionBy()
    gmed = (
        ghist.withColumn("_cum", F.sum("_c").over(gw_cum))
        .withColumn("_n", F.sum("_c").over(gw_tot))
        .where(F.col("_cum") >= F.expr("(_n + 1) div 2"))
        .agg(F.min("_lag").alias("_gmed"))
    )
    inv = open_invoices.select(
        F.col(entity_col).alias("_ent"),
        F.col(amount_col).cast("bigint").alias("_amt"),
        F.to_date(F.col(date_col)).alias("_dt"),
    )
    staged = (
        inv.join(med, "_ent", "left")
        .crossJoin(F.broadcast(gmed))
        .withColumn("_use", F.coalesce(F.col("_med"), F.col("_gmed")))
    )
    week = F.date_trunc("week", F.expr("date_add(_dt, CAST(_use AS INT))"))
    return (
        staged.groupBy(F.to_date(week).alias("week"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_invoices"),
            F.sum("_amt").cast("bigint").alias("expected_cents"),
        )
    )


def revenue_recognition_schedule(
    contracts: DataFrame,
    id_col: str = "contract_id",
    amount_col: str = "amount_cents",
    start_col: str = "start_month",
    months_col: str = "term_months",
) -> DataFrame:
    """Straight-line revenue recognition — the deferred-revenue
    waterfall the close posts for service contracts: each contract's
    amount is recognized evenly across its term, exact in cents.

    Law (deterministic, engine-replayable): for a contract of
    ``amt`` cents over ``n`` months, ``base = amt div n`` and the
    remainder ``r = amt % n`` cents land one each on the FIRST ``r``
    months (the fixed largest-remainder convention for equal quotas —
    ``recognized_k = base + (k < r)``), so Σ over the schedule equals
    the contract amount exactly with no drift row. Amounts are
    non-negative, so truncating and flooring division agree in both
    engines.

    Month arithmetic runs in INTEGER year-month space (``ym = 12·year
    + month − 1 + k`` → ``make_date(ym div 12, ym % 12 + 1, 1)``) so
    no engine-specific interval semantics are involved.

    Output: one row per (contract, schedule month): ``(id, rec_month,
    month_index, recognized_cents)``.

    Scale: pure map + a bounded ``sequence`` explode (fan-out = the
    contract term, a small constant) — no shuffle at all; downstream
    per-month aggregation is one keyed agg over a bounded month grid.
    """
    amt = F.col(amount_col).cast("bigint")
    n = F.col(months_col).cast("bigint")
    staged = contracts.select(
        F.col(id_col).alias("_id"),
        amt.alias("_amt"),
        n.alias("_n"),
        (
            F.lit(12) * F.year(start_col) + F.month(start_col) - F.lit(1)
        ).alias("_ym0"),
        F.expr(f"`{amount_col}` div `{months_col}`").alias("_base"),
        (amt % n).alias("_r"),
    ).withColumn("_k", F.explode(F.sequence(F.lit(0), (F.col("_n") - 1).cast("int"))))
    ym = F.col("_ym0") + F.col("_k")
    return staged.select(
        F.col("_id").alias(id_col),
        F.make_date(
            F.expr("(_ym0 + _k) div 12"), ym % 12 + F.lit(1), F.lit(1)
        ).alias("rec_month"),
        F.col("_k").cast("bigint").alias("month_index"),
        (
            F.col("_base")
            + F.when(F.col("_k") < F.col("_r"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("recognized_cents"),
    )


def dunning_escalation(
    invoices: DataFrame,
    asof,
    level_thresholds: list[int] | None = None,
    annual_rate_e6: int = 180000,
    amount_col: str = "amount_cents",
    due_col: str = "due_date",
) -> DataFrame:
    """Dunning escalation with finance charges — the collections step
    after aging (q049 lineage): each open invoice gets the dunning
    level its days-past-due has escalated to, plus the simple-interest
    finance charge the dunning letter quotes.

    ``level_thresholds`` are ascending days-past-due lower bounds (the
    default ``[0, 30, 60, 90]`` gives level 1 at 1+ days overdue
    through level 4 past 90 — level = number of thresholds strictly
    exceeded, 0 = current). The finance charge is
    ``floor(cents · rate_e6 · days_overdue / (365 · 10⁶))`` — simple
    interest, ACT/365, with the NON-NEGATIVE triple product carried in
    DECIMAL(38,0) (the progressive_brackets/ADVICE discipline: the
    bigint form overflows once ``cents · rate · days`` passes ~9.2e18,
    reachable for large invoices years overdue; truncation == floor on
    a non-negative product in every engine).

    Output: input plus ``days_overdue`` (bigint, 0-floored),
    ``dunning_level`` (bigint) and ``finance_charge_cents`` (bigint).

    Scale: pure map — no join, no window, no shuffle; ``asof`` is a
    literal or a 1-row broadcast the caller supplies.
    """
    thresholds = level_thresholds if level_thresholds is not None else [0, 30, 60, 90]
    assert list(thresholds) == sorted(thresholds), "thresholds must ascend"
    days = F.greatest(
        F.lit(0), F.datediff(F.lit(asof) if isinstance(asof, str) else asof, F.col(due_col))
    ).cast("bigint")
    out = invoices.withColumn("days_overdue", days)
    level = None
    for t in thresholds:
        term = F.when(F.col("days_overdue") > F.lit(int(t)), 1).otherwise(0)
        level = term if level is None else level + term
    out = out.withColumn("dunning_level", level.cast("bigint"))
    prod = (
        F.col(amount_col).cast("decimal(38,0)")
        * F.lit(int(annual_rate_e6)).cast("decimal(38,0)")
        * F.col("days_overdue").cast("decimal(38,0)")
    )
    # The divisor 365·10⁶ is NOT a power of ten (unlike
    # progressive_brackets' 10⁶, where the 6-dp quotient is exact), so
    # Spark's HALF_UP pre-round at the decimal division's result scale
    # can push a quotient sitting within 5e-7 below an integer one too
    # HIGH — the e6_floor_ratio regime: one exact-decimal comparison
    # corrects it, never too low.
    divisor = F.lit(365 * 1000000).cast("decimal(38,0)")
    q0 = F.floor(prod / divisor).cast("decimal(38,0)")
    charge = F.when(q0 * divisor > prod, q0 - F.lit(1)).otherwise(q0)
    return out.withColumn("finance_charge_cents", charge.cast("bigint"))


def bilateral_netting(
    flows: DataFrame,
    from_col: str = "from_key",
    to_col: str = "to_key",
    amount_col: str = "amount_cents",
) -> DataFrame:
    """Bilateral netting settlement matrix — the treasury netting run
    over intercompany (or inter-nation) payment flows: gross flows in
    both directions of every counterparty pair collapse to ONE net
    settlement per unordered pair, the wire each netting cycle
    actually sends.

    Output per unordered pair ``(a, b)`` with ``a < b`` (self-pairs
    excluded — an entity owes itself nothing): ``gross_ab_cents``
    (a pays b), ``gross_ba_cents``, ``net_cents = gross_ab −
    gross_ba`` (SIGNED), ``n_flows``, and ``payer`` — ``a`` when net
    > 0, ``b`` when net < 0, NULL when the pair nets to zero.

    Scale: one keyed agg over the directed-pair key (bounded by the
    entity universe squared), then a map-side canonicalization
    (least/greatest) and a second tiny agg over unordered pairs —
    the fact scan dominates; nothing downstream grows with the
    corpus.
    """
    directed = (
        flows.where(F.col(from_col) != F.col(to_col))
        .groupBy(F.col(from_col).alias("_f"), F.col(to_col).alias("_t"))
        .agg(
            F.sum(F.col(amount_col).cast("bigint")).alias("_amt"),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
        )
    )
    a = F.least("_f", "_t")
    b = F.greatest("_f", "_t")
    fwd = F.col("_f") == a  # this directed row is the a→b direction
    pairs = directed.select(
        a.alias("pair_a"),
        b.alias("pair_b"),
        F.when(fwd, F.col("_amt")).otherwise(F.lit(0)).alias("_ab"),
        F.when(fwd, F.lit(0)).otherwise(F.col("_amt")).alias("_ba"),
        F.col("_n"),
    )
    agg = pairs.groupBy("pair_a", "pair_b").agg(
        F.sum("_ab").cast("bigint").alias("gross_ab_cents"),
        F.sum("_ba").cast("bigint").alias("gross_ba_cents"),
        F.sum("_n").cast("bigint").alias("n_flows"),
    )
    net = F.col("gross_ab_cents") - F.col("gross_ba_cents")
    return agg.select(
        "pair_a",
        "pair_b",
        "gross_ab_cents",
        "gross_ba_cents",
        net.cast("bigint").alias("net_cents"),
        "n_flows",
        F.when(net > 0, F.col("pair_a"))
        .when(net < 0, F.col("pair_b"))
        .otherwise(F.lit(None))
        .alias("payer"),
    )


def early_payment_discounts(
    invoices: DataFrame,
    lag_col: str = "pay_lag_days",
    amount_col: str = "amount_cents",
    discount_rate_e6: int = 20000,
    cutoff_days: int = 10,
) -> DataFrame:
    """Early-payment discount capture — the AP-side close metric for
    "2/10 net 30"-style terms: an invoice paid within ``cutoff_days``
    CAPTURES the discount; paid later, the same cents are the cost of
    missing it. ``discount_cents = floor(cents · rate_e6 / 10⁶)`` —
    the divisor IS a power of ten, so the DECIMAL(38,0) quotient is
    exact at the division's result scale and needs no correction
    (progressive_brackets' regime, not dunning's).

    Adds ``captured`` (boolean) and ``discount_cents`` (bigint) —
    pure map, no shuffle; callers aggregate capture rates with
    ``e6_floor_ratio`` on the exact sums.
    """
    prod = (
        F.col(amount_col).cast("decimal(38,0)")
        * F.lit(int(discount_rate_e6)).cast("decimal(38,0)")
    )
    disc = F.floor(prod / F.lit(1000000).cast("decimal(38,0)")).cast("bigint")
    return invoices.withColumn(
        "captured", F.col(lag_col) <= F.lit(int(cutoff_days))
    ).withColumn("discount_cents", disc)


def mrr_waterfall(
    rev: DataFrame,
    entity_col: str = "custkey",
    ym_col: str = "ym",
    amount_col: str = "amount_cents",
) -> DataFrame:
    """MRR waterfall — the recurring-revenue close report: each
    month's revenue change decomposed into NEW (entity had nothing
    last month), EXPANSION (grew), CONTRACTION (shrank), and CHURNED
    (entity had revenue last month, nothing this month), so
    ``net_change = new + expansion − contraction − churned`` ties out
    to ``Σ cur − Σ prev`` exactly in cents.

    ``rev``: one row per (entity, month) with integer cents and the
    month as an INTEGER year-month index (``12·year + month − 1`` —
    consecutive months differ by exactly 1, no date arithmetic).
    Months with no revenue simply have no row; churn lands in the
    month AFTER the entity's last active month (which can sit one
    past the data's horizon — the report's standard convention).

    Law per (entity, m): prev = amount at m−1 (0 if absent), cur =
    amount at m (0 if absent, via the shifted full-outer join);
    new = cur if prev = 0, churned = prev if cur = 0, expansion =
    max(0, cur − prev) when both, contraction = max(0, prev − cur)
    when both. Output per month: the four components (non-negative
    bigint cents), net_change, n_new/n_churned/n_expanded/
    n_contracted entity counts.

    Scale: ONE full-outer self-join on (entity, month) + one keyed
    agg over the bounded month grid. No window, no densification.
    The (usually aggregated) monthly-revenue input feeds BOTH join
    sides; ReuseExchange cannot dedupe them (the prev side's shifted
    join key rewrites its exchange child — the documented repo
    gotcha), so the input is persisted once under the fresh-cache
    discipline (q040/q299): both sides read one in-memory scan and
    the upstream aggregation runs once, not twice.
    """
    from pyspark import StorageLevel

    base = rev.select(
        F.col(entity_col).alias("_e"),
        F.col(ym_col).cast("bigint").alias("_ym"),
        F.col(amount_col).cast("bigint").alias("_amt"),
    )
    base.unpersist()
    base.persist(StorageLevel.MEMORY_AND_DISK)
    cur = base.select(
        "_e", F.col("_ym").alias("_m"), F.col("_amt").alias("_cur")
    )
    prev = base.select(
        "_e", (F.col("_ym") + 1).alias("_m"), F.col("_amt").alias("_prev")
    )
    j = cur.join(prev, ["_e", "_m"], "full_outer").select(
        "_m",
        F.coalesce("_cur", F.lit(0)).alias("_c"),
        F.coalesce("_prev", F.lit(0)).alias("_p"),
    )
    is_new = (F.col("_p") == 0) & (F.col("_c") > 0)
    is_churn = (F.col("_c") == 0) & (F.col("_p") > 0)
    both = (F.col("_p") > 0) & (F.col("_c") > 0)
    return (
        j.groupBy(F.col("_m").alias(ym_col))
        .agg(
            F.sum(F.when(is_new, F.col("_c")).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(
                F.when(both, F.greatest(F.col("_c") - F.col("_p"), F.lit(0)))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("expansion_cents"),
            F.sum(
                F.when(both, F.greatest(F.col("_p") - F.col("_c"), F.lit(0)))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("contraction_cents"),
            F.sum(F.when(is_churn, F.col("_p")).otherwise(0))
            .cast("bigint")
            .alias("churned_cents"),
            F.sum(F.col("_c") - F.col("_p")).cast("bigint").alias("net_change"),
            F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint").alias("n_new"),
            F.sum(F.when(is_churn, 1).otherwise(0))
            .cast("bigint")
            .alias("n_churned"),
            F.sum(F.when(both & (F.col("_c") > F.col("_p")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_expanded"),
            F.sum(F.when(both & (F.col("_c") < F.col("_p")), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contracted"),
        )
    )
