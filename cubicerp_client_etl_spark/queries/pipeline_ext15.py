"""Round-15 extension wave: the close/treasury arc around the cash
application matcher (judge r14 item 6), plus the matcher's own capped
twin (item 3 — the r14 census read uncapped cash application at 3.6x
on 10x data and the warm idle re-measure held 3.1x: the amount-key
candidate join grows with collision density exactly as the capped
families did, so the occupancy-cap recipe lands BEFORE it crosses the
floor).

- q312: capped cash application (``hot_amount_cap`` — amounts whose
  per-side occupancy exceeds the cap are queued for review, not
  auto-matched; whole-dollar statement amounts so the cap BITES at
  sf0.1).
- q313: bank-reconciliation residual aging — the unmatched remainder
  of q015's auto-match tier, both sides, aged into collection buckets.
- q314: payment-run netting with credit memos — FIFO credit
  application per customer, closed-form in cumulative space.
- q315: landed-cost allocation — a header-level freight charge spread
  over the shipment's lines by exact largest-remainder proration.
- q316: cash-receipts forecast — open AR landed on the weekly
  treasury calendar at issue date + the customer's historical
  low-median payment lag (histogram-median form).
- q317: straight-line revenue recognition waterfall — exact
  largest-remainder cents across each contract's term, month math in
  integer year-month space.
- q318: dunning escalation with ACT/365 simple-interest finance
  charges, exact at any bigint amount (decimal product + floor
  correction).
- q319: bilateral netting settlement matrix — signed net wire per
  unordered counterparty pair over inter-nation trade flows.

Same corpus discipline as the rest of the registry: exact integer
arithmetic the DuckDB oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register

# --------------------------------------------------------------------------
# q312 — CAPPED cash application (L-fin9 under the cap discipline):
# q015's exact matching law with ``finance.cash_application_match(
# hot_amount_cap=4)`` — per-amount occupancy is censused on BOTH sides
# with one keyed COUNT each, and amounts where either side exceeds 4
# are dropped entirely before the candidate join (the manual-review
# queue every cash-app product keeps). Statement amounts here are
# WHOLE DOLLARS (payments rounded to the dollar — floor, both engines)
# so collision density is real: at sf0.1 twelve amounts push past
# occupancy 4 and the cap BITES; at sf0.01 no amount exceeds 2 and the
# capped law coincides with the uncapped one (the q021 precedent,
# pinned by test). Because candidates and both mutual-best rankings
# never see another amount, surviving amounts' applied pairs are
# bit-identical to the uncapped law's — drop-only by construction.
# Scale: candidate volume per amount bounded at cap²; census joins
# ride the same amount key as the candidate join.
# --------------------------------------------------------------------------
@register(
    "q312_cash_application_capped",
    oracle="""
WITH inv AS (
  SELECT o_orderkey AS iid, o_custkey AS ent,
         CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) * 100
           AS amt,
         CAST(o_orderdate AS DATE) AS idt
  FROM orders
),
st AS (
  SELECT o_orderkey + 500000000 AS sid,
         CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) * 100
           AS amt,
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 10 + 1 AS INTEGER)
           AS sdt
  FROM orders WHERE o_orderkey % 3 = 0
),
occ_s AS (SELECT amt, COUNT(*) AS ms FROM st GROUP BY amt),
occ_i AS (SELECT amt, COUNT(*) AS mi FROM inv GROUP BY amt),
live AS (
  SELECT occ_s.amt FROM occ_s JOIN occ_i USING (amt)
  WHERE ms <= 4 AND mi <= 4
),
cand AS (
  SELECT st.sid, inv.iid, st.amt, st.sdt - inv.idt AS lag
  FROM st JOIN live USING (amt) JOIN inv ON inv.amt = st.amt
  WHERE st.sdt - inv.idt > 0 AND st.sdt - inv.idt <= 10
),
ranked AS (
  SELECT sid, iid, amt, lag,
         ROW_NUMBER() OVER (PARTITION BY sid ORDER BY lag, iid) AS rs,
         ROW_NUMBER() OVER (PARTITION BY iid ORDER BY lag, sid) AS ri
  FROM cand
)
SELECT CAST(sid AS BIGINT) AS stmt_id,
       CAST(iid AS BIGINT) AS inv_id,
       amt AS amount_cents,
       CAST(lag AS BIGINT) AS day_lag
FROM ranked WHERE rs = 1 AND ri = 1
ORDER BY stmt_id
""",
)
def q312_cash_application_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        cash_application_match,
    )

    orders = load(spark, sf_dir, "orders")
    amt = F.expr(
        "CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) * 100"
    )
    invoices = orders.select(
        F.col("o_orderkey").cast("bigint").alias("inv_id"),
        amt.alias("amount_cents"),
        F.to_date("o_orderdate").alias("inv_date"),
    )
    stmts = orders.where(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey") + 500000000).cast("bigint").alias("stmt_id"),
        amt.alias("amount_cents"),
        F.expr(
            "date_add(CAST(o_orderdate AS DATE), "
            "CAST(o_orderkey % 10 + 1 AS INT))"
        ).alias("value_date"),
    )
    return cash_application_match(
        stmts, invoices, max_lag_days=10, hot_amount_cap=4
    ).orderBy("stmt_id")


# --------------------------------------------------------------------------
# q313 — Bank-reconciliation residual aging (L-fin12): the OTHER side
# of q015's auto-match — the statement lines and open invoices the
# one-round mutual-best tier did NOT close, aged into collection
# buckets at the data-derived as-of (day after the newest residual
# document). Exactly the report a reconciliation team works from: how
# old is what's left, on each side. Entities are the paying customer
# (statement counterparty = the order's customer). Replays fully: the
# oracle recomputes the match, both anti-joins, the as-of and every
# bucket. Scale: the q015 matcher (one amount equi-join + two windows)
# + two LEFT-ANTI joins on the high-cardinality ids + one broadcast
# 1-row as-of + one keyed agg over <= 8 (side, bucket) cells.
# Operators: finance.cash_application_match + finance.ar_aging_buckets
# (group_cols, r15).
# --------------------------------------------------------------------------
@register(
    "q313_bank_rec_residual_aging",
    oracle="""
WITH inv AS (
  SELECT o_orderkey AS iid, o_custkey AS ent,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt,
         CAST(o_orderdate AS DATE) AS idt
  FROM orders
),
st AS (
  SELECT o_orderkey + 500000000 AS sid, o_custkey AS ent,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt,
         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 10 + 1 AS INTEGER)
           AS sdt
  FROM orders WHERE o_orderkey % 3 = 0
),
cand AS (
  SELECT st.sid, inv.iid, st.sdt - inv.idt AS lag
  FROM st JOIN inv ON inv.amt = st.amt
  WHERE st.sdt - inv.idt > 0 AND st.sdt - inv.idt <= 10
),
ranked AS (
  SELECT sid, iid,
         ROW_NUMBER() OVER (PARTITION BY sid ORDER BY lag, iid) AS rs,
         ROW_NUMBER() OVER (PARTITION BY iid ORDER BY lag, sid) AS ri
  FROM cand
),
applied AS (SELECT sid, iid FROM ranked WHERE rs = 1 AND ri = 1),
residual AS (
  SELECT 'stmt' AS side, st.ent, st.amt, st.sdt AS dt
  FROM st WHERE st.sid NOT IN (SELECT sid FROM applied)
  UNION ALL
  SELECT 'inv' AS side, inv.ent, inv.amt, inv.idt AS dt
  FROM inv WHERE inv.iid NOT IN (SELECT iid FROM applied)
),
asof_d AS (SELECT MAX(dt) + 1 AS a FROM residual)
SELECT side,
       CASE WHEN a - dt <= 30 THEN '0-30'
            WHEN a - dt <= 60 THEN '31-60'
            WHEN a - dt <= 90 THEN '61-90'
            ELSE '91+' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT ent) AS BIGINT) AS n_entities,
       CAST(SUM(amt) AS BIGINT) AS total_cents
FROM residual CROSS JOIN asof_d
GROUP BY side, bucket
ORDER BY side, bucket
""",
)
def q313_bank_rec_residual_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        ar_aging_buckets,
        cash_application_match,
    )

    orders = load(spark, sf_dir, "orders")
    amt = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    invoices = orders.select(
        F.col("o_orderkey").cast("bigint").alias("inv_id"),
        F.col("o_custkey").cast("bigint").alias("ent"),
        amt.alias("amount_cents"),
        F.to_date("o_orderdate").alias("inv_date"),
    )
    stmts = orders.where(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey") + 500000000).cast("bigint").alias("stmt_id"),
        F.col("o_custkey").cast("bigint").alias("ent"),
        amt.alias("amount_cents"),
        F.expr(
            "date_add(CAST(o_orderdate AS DATE), "
            "CAST(o_orderkey % 10 + 1 AS INT))"
        ).alias("value_date"),
    )
    applied = cash_application_match(stmts, invoices, max_lag_days=10)
    res_s = stmts.join(
        applied.select("stmt_id"), "stmt_id", "left_anti"
    ).select(
        F.lit("stmt").alias("side"),
        "ent",
        "amount_cents",
        F.col("value_date").alias("dt"),
    )
    res_i = invoices.join(
        applied.select("inv_id"), "inv_id", "left_anti"
    ).select(
        F.lit("inv").alias("side"),
        "ent",
        "amount_cents",
        F.col("inv_date").alias("dt"),
    )
    residual = res_s.unionByName(res_i)
    return ar_aging_buckets(
        residual,
        date_col="dt",
        amount_col="amount_cents",
        entity_col="ent",
        group_cols=("side",),
    ).orderBy("side", "bucket")


# --------------------------------------------------------------------------
# q314 — Payment-run netting with credit memos (L-fin13): before the
# run pays a customer's open invoices, their open credit memos are
# netted OLDEST-INVOICE-FIRST. FIFO against a single per-customer
# credit pool is CLOSED-FORM in cumulative space (the q241/q014
# trick): applied_i = clamp(pool − cum_before_i, 0, amt_i) — one
# prefix-sum window, no walker. Credit memos are every 7th order at
# 10% of its value (trunc div — non-negative, both engines agree);
# invoices are the rest. Output one row per customer holding the run's
# numbers: invoices, pool, applied, open-after, fully-netted count,
# unapplied credit — with applied + open_after == Σ amt and applied +
# unapplied == pool exact in cents. Scale: every shuffle (pool agg,
# join, window, final agg) shares the customer key.
# Operator: finance.credit_netting_fifo.
# --------------------------------------------------------------------------
@register(
    "q314_payment_run_netting",
    oracle="""
WITH base AS (
  SELECT o_orderkey AS id, o_custkey AS ent,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt,
         CAST(o_orderdate AS DATE) AS dt
  FROM orders
),
credits AS (SELECT ent, amt // 10 AS c FROM base WHERE id % 7 = 0),
pool AS (SELECT ent, SUM(c) AS pool FROM credits GROUP BY ent),
inv AS (SELECT * FROM base WHERE id % 7 <> 0),
staged AS (
  SELECT inv.ent, inv.amt,
         COALESCE(pool.pool, 0) AS pool,
         COALESCE(SUM(inv.amt) OVER (
           PARTITION BY inv.ent ORDER BY inv.dt, inv.id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM inv LEFT JOIN pool USING (ent)
),
app AS (
  SELECT ent, amt, pool,
         GREATEST(0, LEAST(amt, pool - cum_before)) AS applied
  FROM staged
)
SELECT CAST(ent AS BIGINT) AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_inv,
       CAST(MIN(pool) AS BIGINT) AS credit_pool_cents,
       CAST(SUM(applied) AS BIGINT) AS applied_cents,
       CAST(SUM(amt - applied) AS BIGINT) AS open_after_cents,
       CAST(SUM(CASE WHEN applied = amt THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fully_netted,
       CAST(MIN(pool) - SUM(applied) AS BIGINT) AS unapplied_credit_cents
FROM app
GROUP BY ent
ORDER BY custkey
""",
)
def q314_payment_run_netting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        credit_netting_fifo,
    )

    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").cast("bigint").alias("doc_id"),
        F.col("o_custkey").cast("bigint").alias("custkey"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("amount_cents"),
        F.to_date("o_orderdate").alias("doc_date"),
    )
    credits = base.where(F.col("doc_id") % 7 == 0).select(
        "custkey", F.expr("amount_cents div 10").alias("amount_cents")
    )
    invoices = base.where(F.col("doc_id") % 7 != 0)
    return credit_netting_fifo(
        invoices,
        credits,
        entity_col="custkey",
        amount_col="amount_cents",
        date_col="doc_date",
        id_col="doc_id",
    ).orderBy("custkey")


# --------------------------------------------------------------------------
# q315 — Landed-cost allocation (L-erp26): a header-level freight
# charge (a deterministic ~2.7% of order value: totalprice cents div
# 37) spread over the shipment's lines proportionally to line value by
# EXACT largest-remainder proration (operators/budget.prorate_exact,
# the q288 machinery applied to the inbound-logistics case) — per
# order Σ alloc == freight to the cent, the invariant floating
# prorating never delivers. Output is the bounded per-line-count
# digest (1..7 lines per order): order count, Σ freight, Σ alloc
# (equal by the invariant — visible in the output, not just asserted),
# and Σ of per-order max/min allocations, which pin every rank/
# remainder decision. Scale: freight rides a broadcast-joinable
# header... no — the header table is the ORDER table (high
# cardinality), so the line join is a keyed equi-join; prorate_exact
# adds two windows on the same order key (bounded 7-line fan); the
# digest agg is <= 7 rows.
# --------------------------------------------------------------------------
@register(
    "q315_landed_cost_allocation",
    oracle="""
WITH l AS (
  SELECT l_orderkey AS k, l_linenumber AS ln,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
  FROM lineitem
),
hdr AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 37
           AS a
  FROM orders
),
j AS (SELECT l.k, l.ln, l.w, hdr.a FROM l JOIN hdr USING (k)),
tot AS (SELECT k, SUM(w) AS wsum FROM j GROUP BY k),
st AS (
  SELECT j.k, j.ln, j.a, tot.wsum,
         CAST(CAST(j.a AS HUGEINT) * j.w // tot.wsum AS BIGINT) AS base,
         CAST(CAST(j.a AS HUGEINT) * j.w % tot.wsum AS BIGINT) AS frac
  FROM j JOIN tot USING (k)
),
sh AS (SELECT k, a - SUM(base) AS short FROM st GROUP BY k, a),
alloc AS (
  SELECT st.k, st.a,
         st.base + CASE WHEN ROW_NUMBER() OVER (
           PARTITION BY st.k ORDER BY st.frac DESC, st.ln) <= sh.short
           THEN 1 ELSE 0 END AS alloc
  FROM st JOIN sh USING (k)
),
per_order AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_lines, MIN(a) AS freight,
         SUM(alloc) AS alloc_sum, MAX(alloc) AS mx, MIN(alloc) AS mn
  FROM alloc GROUP BY k
)
SELECT n_lines,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(freight) AS BIGINT) AS sum_freight_cents,
       CAST(SUM(alloc_sum) AS BIGINT) AS sum_alloc_cents,
       CAST(SUM(mx) AS BIGINT) AS sum_max_alloc,
       CAST(SUM(mn) AS BIGINT) AS sum_min_alloc
FROM per_order
GROUP BY n_lines
ORDER BY n_lines
""",
)
def q315_landed_cost_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.budget import prorate_exact

    lines = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("k"),
        F.col("l_linenumber").cast("bigint").alias("ln"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("w"),
    )
    hdr = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div 37"
        ).alias("freight_cents"),
    )
    j = lines.join(hdr, "k")
    alloc = prorate_exact(
        j,
        key_col="k",
        amount_col="freight_cents",
        weight_col="w",
        order_col="ln",
        out_col="alloc",
    )
    per_order = alloc.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("freight_cents").cast("bigint").alias("freight"),
        F.sum("alloc").cast("bigint").alias("alloc_sum"),
        F.max("alloc").cast("bigint").alias("mx"),
        F.min("alloc").cast("bigint").alias("mn"),
    )
    return (
        per_order.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("freight").cast("bigint").alias("sum_freight_cents"),
            F.sum("alloc_sum").cast("bigint").alias("sum_alloc_cents"),
            F.sum("mx").cast("bigint").alias("sum_max_alloc"),
            F.sum("mn").cast("bigint").alias("sum_min_alloc"),
        )
        .orderBy("n_lines")
    )


# --------------------------------------------------------------------------
# q316 — Cash-receipts forecast from open AR (L-fin14): the treasury
# step after the close — open invoices land on the receipts calendar
# at issue date + the customer's HISTORICAL payment lag, the weekly
# grid treasury plans liquidity against. The lag statistic is the LOW
# MEDIAN (the (n+1) div 2-th smallest observed lag — an integer order
# statistic, engine-exact; interpolated medians round differently
# across engines), computed on the (customer, lag) HISTOGRAM so the
# cumulative windows run over at most a few hundred rows per customer
# at any corpus size; customers without history fall back to the
# global low median (one broadcast row). Payment history = fulfilled
# orders under a deterministic lag law (orderkey % 45 + 3 — the
# replayable stand-in for observed behavior); open AR = 'O' orders.
# Every median pick, fallback and week bucket replays bit-for-bit.
# Scale: one keyed histogram agg + two entity-key windows + one tiny
# single-partition window over the bounded distinct-lag histogram +
# one left join + 1-row broadcast + one keyed agg over the bounded
# week grid. Operator: finance.expected_receipts_forecast.
# --------------------------------------------------------------------------
@register(
    "q316_cash_receipts_forecast",
    oracle="""
WITH pays AS (
  SELECT o_custkey AS ent, o_orderkey % 45 + 3 AS lg
  FROM orders WHERE o_orderstatus = 'F'
),
hist AS (SELECT ent, lg, COUNT(*) AS c FROM pays GROUP BY ent, lg),
st AS (
  SELECT ent, lg,
         SUM(c) OVER (PARTITION BY ent ORDER BY lg
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY ent) AS n
  FROM hist
),
med AS (SELECT ent, MIN(lg) AS med FROM st
        WHERE cum >= (n + 1) // 2 GROUP BY ent),
ghist AS (SELECT lg, COUNT(*) AS c FROM pays GROUP BY lg),
gst AS (
  SELECT lg,
         SUM(c) OVER (ORDER BY lg
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS n
  FROM ghist
),
gmed AS (SELECT MIN(lg) AS gmed FROM gst WHERE cum >= (n + 1) // 2),
inv AS (
  SELECT o_custkey AS ent,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt,
         CAST(o_orderdate AS DATE) AS dt
  FROM orders WHERE o_orderstatus = 'O'
),
x AS (
  SELECT inv.ent, inv.amt, inv.dt, COALESCE(med.med, gmed.gmed) AS u
  FROM inv LEFT JOIN med USING (ent) CROSS JOIN gmed
)
SELECT CAST(date_trunc('week', dt + CAST(u AS INTEGER)) AS DATE) AS week,
       CAST(COUNT(*) AS BIGINT) AS n_invoices,
       CAST(SUM(amt) AS BIGINT) AS expected_cents
FROM x GROUP BY week ORDER BY week
""",
)
def q316_cash_receipts_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        expected_receipts_forecast,
    )

    orders = load(spark, sf_dir, "orders")
    payments = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").cast("bigint").alias("custkey"),
        F.expr("o_orderkey % 45 + 3").cast("bigint").alias("pay_lag_days"),
    )
    open_inv = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").cast("bigint").alias("custkey"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("amount_cents"),
        F.to_date("o_orderdate").alias("inv_date"),
    )
    return expected_receipts_forecast(payments, open_inv).orderBy("week")


# --------------------------------------------------------------------------
# q317 — Straight-line revenue recognition waterfall (L-fin15): every
# fulfilled order is a service contract recognized evenly across a
# term of (orderkey % 12) + 1 months from the order month — base =
# amt div n cents per month with the remainder landing one cent each
# on the FIRST r months (fixed largest-remainder for equal quotas), so
# each contract's schedule sums to its amount exactly and the monthly
# deferred-revenue waterfall carries no drift row. Month arithmetic in
# integer year-month space (make_date) — no engine interval semantics.
# Replays fully: the oracle explodes the same generate_series and
# replays base/remainder per month. Scale: pure map + bounded explode
# (fan ≤ 12) + one keyed agg over the bounded month grid — no other
# shuffle. Operator: finance.revenue_recognition_schedule.
# --------------------------------------------------------------------------
@register(
    "q317_revenue_recognition_waterfall",
    oracle="""
WITH c AS (
  SELECT o_orderkey AS cid,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt,
         CAST(o_orderkey % 12 + 1 AS BIGINT) AS n,
         12 * EXTRACT(year FROM CAST(o_orderdate AS DATE))
           + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1 AS ym0
  FROM orders WHERE o_orderstatus = 'F'
),
sched AS (
  SELECT cid, amt, n, ym0, unnest(generate_series(0, n - 1)) AS k FROM c
),
rec AS (
  SELECT make_date(CAST((ym0 + k) // 12 AS INTEGER),
                   CAST((ym0 + k) % 12 + 1 AS INTEGER), 1) AS rec_month,
         amt // n + CASE WHEN k < amt % n THEN 1 ELSE 0 END AS cents
  FROM sched
)
SELECT rec_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(cents) AS BIGINT) AS recognized_cents
FROM rec GROUP BY rec_month ORDER BY rec_month
""",
)
def q317_revenue_recognition_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        revenue_recognition_schedule,
    )

    orders = load(spark, sf_dir, "orders")
    contracts = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("contract_id"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("amount_cents"),
        F.to_date("o_orderdate").alias("start_month"),
        (F.col("o_orderkey") % 12 + 1).cast("bigint").alias("term_months"),
    )
    sched = revenue_recognition_schedule(contracts, id_col="contract_id")
    return (
        sched.groupBy("rec_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("recognized_cents").cast("bigint").alias("recognized_cents"),
        )
        .orderBy("rec_month")
    )


# --------------------------------------------------------------------------
# q318 — Dunning escalation with finance charges (L-fin16): open 1998
# invoices (status 'O', net-30 from the order date) aged at the
# data-derived as-of (day after the newest order corpus-wide) into
# dunning levels — level = thresholds {0,30,60,90} days-past-due
# strictly exceeded — with the simple-interest finance charge the
# letter quotes: floor(cents · 180000 · days / (365·10⁶)), ACT/365 at
# 18% annual, the non-negative triple product in DECIMAL(38,0) with
# the e6_floor_ratio-style floor correction (the divisor is not a
# power of ten). Report per (level, market segment). The oracle
# replays the as-of, the level arithmetic and the charge in HUGEINT
# (trunc-div == floor on the non-negative product). Scale: pure map +
# one customer equi-join + 1-row as-of broadcast + one keyed agg over
# ≤ 5×5 cells. Operator: finance.dunning_escalation.
# --------------------------------------------------------------------------
@register(
    "q318_dunning_escalation",
    oracle="""
WITH asof_d AS (
  SELECT CAST(max(CAST(o_orderdate AS DATE)) + INTERVAL 1 DAY AS DATE) AS a
  FROM orders
),
inv AS (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) + 30 AS due
  FROM orders
  WHERE o_orderstatus = 'O'
    AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
),
staged AS (
  SELECT i.cents, c.c_mktsegment AS segment,
         GREATEST(0, asof_d.a - i.due) AS days_over
  FROM inv i JOIN customer c ON c.c_custkey = i.o_custkey CROSS JOIN asof_d
),
lvl AS (
  SELECT segment, cents, days_over,
         CASE WHEN days_over > 0 THEN 1 ELSE 0 END
           + CASE WHEN days_over > 30 THEN 1 ELSE 0 END
           + CASE WHEN days_over > 60 THEN 1 ELSE 0 END
           + CASE WHEN days_over > 90 THEN 1 ELSE 0 END AS lv,
         CAST(CAST(cents AS HUGEINT) * 180000 * days_over
              // 365000000 AS BIGINT) AS charge
  FROM staged
)
SELECT CAST(lv AS BIGINT) AS dunning_level, segment,
       CAST(COUNT(*) AS BIGINT) AS n_invoices,
       CAST(SUM(cents) AS BIGINT) AS open_cents,
       CAST(SUM(charge) AS BIGINT) AS charge_cents,
       CAST(MAX(days_over) AS BIGINT) AS max_days_overdue
FROM lvl GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q318_dunning_escalation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import dunning_escalation

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    asof = orders.agg(
        F.date_add(F.max(F.to_date("o_orderdate")), 1).alias("_asof")
    )
    inv = orders.where(
        (F.col("o_orderstatus") == "O")
        & (F.to_date("o_orderdate") >= F.lit("1998-01-01"))
    ).select(
        F.col("o_custkey"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("amount_cents"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
    )
    staged = dunning_escalation(
        inv.crossJoin(F.broadcast(asof)), F.col("_asof")
    )
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        staged.join(seg, "o_custkey")
        .groupBy("dunning_level", "segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_invoices"),
            F.sum("amount_cents").cast("bigint").alias("open_cents"),
            F.sum("finance_charge_cents").cast("bigint").alias("charge_cents"),
            F.max("days_overdue").cast("bigint").alias("max_days_overdue"),
        )
        .orderBy("dunning_level", "segment")
    )


# --------------------------------------------------------------------------
# q319 — Bilateral netting settlement matrix (L-fin17): intercompany
# treasury netting over inter-nation trade flows — each lineitem is a
# payment owed from the customer's nation to the supplier's nation;
# gross flows in both directions of every unordered nation pair
# collapse to ONE signed net settlement (the wire the netting cycle
# sends) with the payer named by the sign. Complements q304's
# elimination (which removes intra-group rows from a consolidation;
# this one nets the cross-group remainder). Scale: the fact scan +
# three dim equi-joins dominate; the directed agg is bounded by
# nations² (625) and everything after is map + a tiny second agg —
# nothing downstream grows with the corpus. Operator:
# finance.bilateral_netting.
# --------------------------------------------------------------------------
@register(
    "q319_bilateral_netting_matrix",
    oracle="""
WITH flows AS (
  SELECT cn.n_name AS from_n, sn.n_name AS to_n,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS amt
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
),
directed AS (
  SELECT from_n, to_n, SUM(amt) AS amt, COUNT(*) AS n
  FROM flows WHERE from_n <> to_n GROUP BY 1, 2
),
pairs AS (
  SELECT LEAST(from_n, to_n) AS pair_a, GREATEST(from_n, to_n) AS pair_b,
         CASE WHEN from_n = LEAST(from_n, to_n) THEN amt ELSE 0 END AS ab,
         CASE WHEN from_n = LEAST(from_n, to_n) THEN 0 ELSE amt END AS ba,
         n
  FROM directed
)
SELECT pair_a, pair_b,
       CAST(SUM(ab) AS BIGINT) AS gross_ab_cents,
       CAST(SUM(ba) AS BIGINT) AS gross_ba_cents,
       CAST(SUM(ab) - SUM(ba) AS BIGINT) AS net_cents,
       CAST(SUM(n) AS BIGINT) AS n_flows,
       CASE WHEN SUM(ab) - SUM(ba) > 0 THEN pair_a
            WHEN SUM(ab) - SUM(ba) < 0 THEN pair_b END AS payer
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q319_bilateral_netting_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import bilateral_netting

    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("from_key"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("to_key"),
    )
    flows = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            lineitem["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(F.broadcast(cn), "c_nationkey")
        .join(F.broadcast(sn), "s_nationkey")
        .select(
            "from_key",
            "to_key",
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("amount_cents"),
        )
    )
    return bilateral_netting(flows).orderBy("pair_a", "pair_b")


# --------------------------------------------------------------------------
# q320 — Budget seasonal phasing (L-fin18): next year's budget per
# nation (prior-year revenue grown 5%, integer cents) spread across
# the calendar months proportional to the PRIOR year's monthly
# revenue — the FP&A phasing step that turns an annual number into a
# month grid the variance reports compare against. Exact
# largest-remainder proration (budget.prorate_exact in its WEIGHTED
# form — q315 used equal-ish line weights; here the weights are the
# seasonality itself), so each nation's phased months sum to its
# budget to the cent. The oracle replays the growth, the per-month
# base/fraction split and the remainder ranking. Scale: one keyed agg
# over the fact scan → a 25×12 grid; the proration windows run on the
# bounded nation key — nothing after the scan grows with the corpus.
# --------------------------------------------------------------------------
@register(
    "q320_budget_seasonal_phasing",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation,
         EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS m,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS w
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1997
  GROUP BY 1, 2
),
tot AS (
  SELECT nation, SUM(w) AS wsum,
         CAST(SUM(w) AS HUGEINT) * 105 // 100 AS a
  FROM rev GROUP BY nation
),
st AS (
  SELECT rev.nation, rev.m, rev.w, tot.wsum, tot.a,
         CAST(tot.a * rev.w // tot.wsum AS BIGINT) AS base,
         CAST(tot.a * rev.w % tot.wsum AS BIGINT) AS frac
  FROM rev JOIN tot USING (nation)
),
sh AS (
  SELECT nation, CAST(MIN(a) AS BIGINT) - SUM(base) AS short
  FROM st GROUP BY nation
),
alloc AS (
  SELECT st.nation, st.m, st.w,
         st.base + CASE WHEN ROW_NUMBER() OVER (
           PARTITION BY st.nation ORDER BY st.frac DESC, st.m)
           <= sh.short THEN 1 ELSE 0 END AS phased
  FROM st JOIN sh USING (nation)
)
SELECT nation, CAST(m AS BIGINT) AS cal_month,
       CAST(w AS BIGINT) AS weight_cents,
       CAST(phased AS BIGINT) AS phased_cents
FROM alloc ORDER BY nation, cal_month
""",
)
def q320_budget_seasonal_phasing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.budget import prorate_exact

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
        orders.where(F.year(F.to_date("o_orderdate")) == 1997)
        .join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("nation"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("nation", F.month(F.to_date("o_orderdate")).alias("cal_month"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                )
            ).alias("weight_cents")
        )
    )
    budget = rev.groupBy("nation").agg(
        F.expr(
            "CAST(CAST(SUM(weight_cents) AS DECIMAL(38,0)) * 105 div 100"
            " AS BIGINT)"
        ).alias("budget_cents")
    )
    j = rev.join(F.broadcast(budget), "nation")
    phased = prorate_exact(
        j,
        key_col="nation",
        amount_col="budget_cents",
        weight_col="weight_cents",
        order_col="cal_month",
        out_col="phased_cents",
    )
    return phased.select(
        "nation",
        F.col("cal_month").cast("bigint").alias("cal_month"),
        F.col("weight_cents").cast("bigint").alias("weight_cents"),
        "phased_cents",
    ).orderBy("nation", "cal_month")


# --------------------------------------------------------------------------
# q321 — Allowance for doubtful accounts (L-fin19): the close entry
# after aging — open 1998 receivables aged into the q049 buckets (per
# market segment, data-derived as-of) and provisioned at the policy
# rate per bucket (0.5% / 2% / 5% / 10% e6), allowance =
# floor(bucket_cents · rate_e6 / 10⁶) exact on the bucket totals
# (power-of-ten divisor — the correction-free regime). The oracle
# replays the as-of, every bucket edge and the provision arithmetic.
# Scale: finance.ar_aging_buckets (1-row broadcast as-of + one keyed
# agg over ≤ 5×4 cells) + a literal CASE rate map — map-only after
# the agg. Operators: finance.ar_aging_buckets (group_cols).
# --------------------------------------------------------------------------
@register(
    "q321_doubtful_accounts_allowance",
    oracle="""
WITH inv AS (
  SELECT o_custkey, c.c_mktsegment AS segment,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM orders JOIN customer c ON c.c_custkey = o_custkey
  WHERE o_orderstatus = 'O' AND CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
),
asof_d AS (SELECT CAST(max(d) + INTERVAL 1 DAY AS DATE) AS a FROM inv),
aged AS (
  SELECT segment, o_custkey, cents,
         CASE WHEN asof_d.a - d <= 30 THEN '0-30'
              WHEN asof_d.a - d <= 60 THEN '31-60'
              WHEN asof_d.a - d <= 90 THEN '61-90'
              ELSE '91+' END AS bucket
  FROM inv CROSS JOIN asof_d
),
b AS (
  SELECT segment, bucket,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_entities,
         CAST(SUM(cents) AS BIGINT) AS open_cents
  FROM aged GROUP BY 1, 2
),
r AS (
  SELECT b.*,
         CASE bucket WHEN '0-30' THEN 5000 WHEN '31-60' THEN 20000
              WHEN '61-90' THEN 50000 ELSE 100000 END AS rate_e6
  FROM b
)
SELECT segment, bucket, n_docs, n_entities, open_cents,
       CAST(rate_e6 AS BIGINT) AS rate_e6,
       CAST(CAST(open_cents AS HUGEINT) * rate_e6 // 1000000 AS BIGINT)
         AS allowance_cents
FROM r ORDER BY segment, bucket
""",
)
def q321_doubtful_accounts_allowance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import ar_aging_buckets

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    inv = (
        orders.where(
            (F.col("o_orderstatus") == "O")
            & (F.to_date("o_orderdate") >= F.lit("1998-01-01"))
        )
        .join(
            customer.select(
                "c_custkey", F.col("c_mktsegment").alias("segment")
            ),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "segment",
            F.col("o_custkey"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
            F.to_date("o_orderdate").alias("d"),
        )
    )
    aged = ar_aging_buckets(
        inv,
        date_col="d",
        amount_col="cents",
        entity_col="o_custkey",
        group_cols=("segment",),
    )
    rate = (
        F.when(F.col("bucket") == "0-30", 5000)
        .when(F.col("bucket") == "31-60", 20000)
        .when(F.col("bucket") == "61-90", 50000)
        .otherwise(100000)
        .cast("bigint")
    )
    prod = F.col("total_cents").cast("decimal(38,0)") * rate.cast(
        "decimal(38,0)"
    )
    return aged.select(
        "segment",
        "bucket",
        "n_docs",
        "n_entities",
        F.col("total_cents").alias("open_cents"),
        rate.alias("rate_e6"),
        F.floor(prod / F.lit(1000000).cast("decimal(38,0)"))
        .cast("bigint")
        .alias("allowance_cents"),
    ).orderBy("segment", "bucket")


# --------------------------------------------------------------------------
# q322 — Early-payment discount capture (L-fin20): the AP-side close
# metric for 2/10-net-30 terms — per customer nation, the discounts
# CAPTURED (paid within the 10-day window, lag = orderkey % 40 + 1)
# vs the cost of the ones missed, with the capture rate exact via
# e6_floor_ratio on the cents sums (zero-denominator guarded to 0 in
# both engines). discount = floor(cents · 2% / 10⁶-scale) — a
# power-of-ten divisor, the correction-free decimal regime. Scale:
# pure map + one customer equi-join + broadcast nation + one keyed
# agg over 25 cells. Operator: finance.early_payment_discounts.
# --------------------------------------------------------------------------
@register(
    "q322_discount_capture",
    oracle="""
WITH inv AS (
  SELECT n.n_name AS nation,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         o_orderkey % 40 + 1 AS lag
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
d AS (
  SELECT nation, lag <= 10 AS captured,
         CAST(CAST(cents AS HUGEINT) * 20000 // 1000000 AS BIGINT) AS disc
  FROM inv
),
g AS (
  SELECT nation,
         CAST(SUM(CASE WHEN captured THEN 1 ELSE 0 END) AS BIGINT)
           AS n_captured,
         CAST(SUM(CASE WHEN captured THEN disc ELSE 0 END) AS BIGINT)
           AS captured_cents,
         CAST(SUM(CASE WHEN NOT captured THEN 1 ELSE 0 END) AS BIGINT)
           AS n_missed,
         CAST(SUM(CASE WHEN NOT captured THEN disc ELSE 0 END) AS BIGINT)
           AS missed_cents
  FROM d GROUP BY nation
)
SELECT nation, n_captured, captured_cents, n_missed, missed_cents,
       CASE WHEN captured_cents + missed_cents > 0
            THEN CAST(CAST(captured_cents AS HUGEINT) * 1000000
                 // (captured_cents + missed_cents) AS BIGINT)
            ELSE 0 END AS capture_rate_e6
FROM g ORDER BY nation
""",
)
def q322_discount_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio
    from cubicerp_client_etl_spark.operators.finance import (
        early_payment_discounts,
    )

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    inv = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("nation"))
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "nation",
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("amount_cents"),
            (F.col("o_orderkey") % 40 + 1).alias("pay_lag_days"),
        )
    )
    flagged = early_payment_discounts(inv)
    g = flagged.groupBy("nation").agg(
        F.sum(F.when(F.col("captured"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_captured"),
        F.sum(F.when(F.col("captured"), F.col("discount_cents")).otherwise(0))
        .cast("bigint")
        .alias("captured_cents"),
        F.sum(F.when(~F.col("captured"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missed"),
        F.sum(
            F.when(~F.col("captured"), F.col("discount_cents")).otherwise(0)
        )
        .cast("bigint")
        .alias("missed_cents"),
    )
    den = F.col("captured_cents") + F.col("missed_cents")
    rate = F.when(
        den > 0, e6_floor_ratio(F.col("captured_cents"), den)
    ).otherwise(F.lit(0))
    return g.select(
        "nation",
        "n_captured",
        "captured_cents",
        "n_missed",
        "missed_cents",
        rate.cast("bigint").alias("capture_rate_e6"),
    ).orderBy("nation")
