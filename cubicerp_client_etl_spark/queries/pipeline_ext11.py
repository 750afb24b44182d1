"""Round-11 extension wave: the accounting-close / supply-chain /
customer-economics operators an ERP analytics engine is asked for
right after the round-10 set — fixed-asset depreciation, purchase
price variance, DSO, the VAT box report, OTIF service levels,
intercompany elimination, seasonality indices, Holt double exponential
smoothing (the trend-aware sibling of q261's SES, same recursive-CTE
oracle discipline), inventory turns, customer-concentration HHI,
n-gram novelty scoring for corpus curation, cohort LTV curves, credit
exposure, and the fuzzy (near-amount) duplicate-invoice screen.

Same corpus discipline as the rest of the registry: exact integer /
decimal arithmetic so every query carries a DuckDB oracle the driver
can hash-compare, and every operator keeps the shape that survives
100 TB (map-only explodes, keyed aggregates, bounded-grid windows,
banded joins — never all-pairs, never a raw-row global window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register

_CENTS = "CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents(col: str) -> F.Column:
    return (F.col(col).cast("decimal(18,2)") * 100).cast("bigint")


# --------------------------------------------------------------------------
# q002 (birth q278) — Straight-line depreciation schedule (operators/finance.
# depreciation_schedule): assets from part (cost = retail price cents,
# life = 3 + p_size % 5 periods); the per-period charge is
# cost div life with the remainder's cents on the EARLIEST periods, so
# Σ periods == cost exactly (the fixed-asset subledger invariant).
# Everything is CLOSED-FORM in the period index — the explode is a
# pure map stage, no window, no shuffle. Reference: depreciation is a
# metadata-declared journal job (cubicerpetl.py:494 shape), one row
# per period per asset.
# --------------------------------------------------------------------------


@register(
    "q299_depreciation_schedule",
    oracle=f"""
WITH a AS (
  SELECT p_partkey AS asset_id,
         {_CENTS.format(c='p_retailprice')} AS cost,
         CAST(3 + p_size % 5 AS BIGINT) AS life
  FROM part WHERE p_partkey % 10 = 0
)
SELECT asset_id,
       CAST(g.p AS BIGINT) AS period,
       CAST(cost // life
            + CASE WHEN g.p <= cost % life THEN 1 ELSE 0 END AS BIGINT)
         AS depreciation_cents,
       CAST(g.p * (cost // life) + LEAST(g.p, cost % life) AS BIGINT)
         AS accum_cents,
       CAST(cost - g.p * (cost // life) - LEAST(g.p, cost % life)
         AS BIGINT) AS nbv_cents
FROM a CROSS JOIN generate_series(1, 7) g(p)
WHERE g.p <= life
""",
)
def q299_depreciation_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        depreciation_schedule,
    )

    assets = (
        load(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 10 == 0)
        .select(
            F.col("p_partkey").alias("asset_id"),
            _cents("p_retailprice").alias("cost_cents"),
            (F.lit(3) + F.col("p_size") % 5).cast("bigint").alias("life"),
        )
    )
    return depreciation_schedule(assets, "asset_id", "cost_cents", "life")


# --------------------------------------------------------------------------
# q003 (birth q279) — Purchase price variance (PPV): actual unit cost (invoice line
# cents div qty, floored — both sides non-negative so floor == trunc
# in every engine) against the part's standard cost, extended by
# quantity and rolled up per brand with the favorable-line share. The
# procurement variance report every standard-costing shop closes the
# month with. One equi-join + one keyed aggregate.
# --------------------------------------------------------------------------


@register(
    "q300_purchase_price_variance",
    oracle=f"""
WITH l AS (
  SELECT p.p_brand,
         CAST(l_quantity AS BIGINT) AS qty,
         {_CENTS.format(c='l_extendedprice')}
           // CAST(l_quantity AS BIGINT) AS actual_unit,
         {_CENTS.format(c='p_retailprice')} AS std_unit
  FROM lineitem JOIN part p ON p.p_partkey = l_partkey
),
v AS (
  SELECT p_brand, qty, (actual_unit - std_unit) * qty AS ppv FROM l
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(SUM(ppv) AS BIGINT) AS ppv_cents,
       CAST(SUM(CASE WHEN ppv < 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS favorable_e6
FROM v GROUP BY p_brand
""",
)
def q300_purchase_price_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        _cents("l_extendedprice").alias("ext_cents"),
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", _cents("p_retailprice").alias("std_unit")
    )
    ppv = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            "qty",
            (
                (F.expr("ext_cents div qty") - F.col("std_unit"))
                * F.col("qty")
            ).alias("ppv"),
        )
    )
    return ppv.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.sum("ppv").cast("bigint").alias("ppv_cents"),
        e6_floor_ratio(
            F.sum(F.when(F.col("ppv") < 0, 1).otherwise(0)),
            F.count(F.lit(1)),
        ).alias("favorable_e6"),
    )


# --------------------------------------------------------------------------
# q004 (birth q280) — Days sales outstanding (DSO) by month: month's open AR (order
# status 'O') against the month's billed revenue, scaled by a 30-day
# month — the collections-efficiency metric next to q049's aging
# buckets. Exact: dso_days = open_ar · 30 div revenue. One scan, one
# keyed aggregate on the bounded month grid.
# --------------------------------------------------------------------------


@register(
    "q301_dso_monthly",
    oracle=f"""
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
         AS yyyymm,
       CAST(SUM({_CENTS.format(c='o_totalprice')}) AS BIGINT)
         AS revenue_cents,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN {_CENTS.format(c='o_totalprice')} ELSE 0 END)
         AS BIGINT) AS open_ar_cents,
       CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN {_CENTS.format(c='o_totalprice')} ELSE 0 END)
              AS BIGINT) * 30
            // CAST(SUM({_CENTS.format(c='o_totalprice')}) AS BIGINT)
         AS BIGINT) AS dso_days
FROM orders
GROUP BY 1
""",
)
def q301_dso_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("yyyymm"),
        _cents("o_totalprice").alias("cents"),
        F.col("o_orderstatus").alias("st"),
    )
    return o.groupBy("yyyymm").agg(
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.sum(F.when(F.col("st") == "O", F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("open_ar_cents"),
        F.expr(
            "CAST(sum(CASE WHEN st = 'O' THEN cents ELSE 0 END) * 30"
            " div sum(cents) AS BIGINT)"
        ).alias("dso_days"),
    )


# --------------------------------------------------------------------------
# q008 (birth q281) — VAT box summary: lines grouped by tax-rate percent (the raw
# l_tax double cast to DECIMAL(4,2) — a RAW-column cast, exact in both
# engines) with the taxable base and the tax amount
# (base · rate div 100, exact cents). The tax-return box report; the
# reference files it from per-row journal loads.
# --------------------------------------------------------------------------


@register(
    "q302_tax_box_summary",
    oracle=f"""
WITH l AS (
  SELECT l_returnflag,
         CAST(CAST(l_tax AS DECIMAL(4,2)) * 100 AS BIGINT) AS rate_pct,
         {_CENTS.format(c='l_extendedprice')} AS base_cents
  FROM lineitem
)
SELECT l_returnflag, rate_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(base_cents) AS BIGINT) AS taxable_base_cents,
       CAST(SUM(base_cents * rate_pct // 100) AS BIGINT) AS tax_cents
FROM l GROUP BY l_returnflag, rate_pct
""",
)
def q302_tax_box_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_tax").cast("decimal(4,2)") * 100)
        .cast("bigint")
        .alias("rate_pct"),
        _cents("l_extendedprice").alias("base_cents"),
    )
    return l.groupBy("l_returnflag", "rate_pct").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("base_cents").cast("bigint").alias("taxable_base_cents"),
        F.sum(F.expr("base_cents * rate_pct div 100"))
        .cast("bigint")
        .alias("tax_cents"),
    )


# --------------------------------------------------------------------------
# q012 (birth q282) — OTIF (on-time-in-full) service level per order priority:
# on-time = shipped within the priority's SLA days of the order date
# (exact integer day math on epoch micros — no engine date-interval
# quirks); in-full = shipped quantity covers the deterministic
# synthesized ordered quantity. The fulfillment KPI ops teams pin to
# the wall. One join + one bounded rollup.
# --------------------------------------------------------------------------


@register(
    "q303_otif_fill_rate",
    oracle="""
WITH l AS (
  SELECT o.o_orderpriority,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
           // 86400000000 AS lead_days,
         CASE substr(o.o_orderpriority, 1, 1)
           WHEN '1' THEN 7 WHEN '2' THEN 14 WHEN '3' THEN 21
           WHEN '4' THEN 28 ELSE 35 END AS sla_days,
         CAST(l.l_quantity AS BIGINT) AS shipped,
         (l.l_orderkey * 7 + l.l_linenumber) % 30 + 1 AS ordered
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
f AS (
  SELECT o_orderpriority,
         CASE WHEN lead_days <= sla_days THEN 1 ELSE 0 END AS on_time,
         CASE WHEN shipped >= ordered THEN 1 ELSE 0 END AS in_full
  FROM l
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(on_time) AS BIGINT) AS n_on_time,
       CAST(SUM(in_full) AS BIGINT) AS n_in_full,
       CAST(SUM(on_time * in_full) AS BIGINT) AS n_otif,
       CAST(SUM(on_time * in_full) * 1000000 // COUNT(*) AS BIGINT)
         AS otif_e6
FROM f GROUP BY o_orderpriority
""",
)
def q303_otif_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.unix_micros("l_shipdate").alias("ship_us"),
        F.col("l_quantity").cast("bigint").alias("shipped"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 30 + 1).alias(
            "ordered"
        ),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros("o_orderdate").alias("ord_us"),
        F.expr(
            "CASE substring(o_orderpriority, 1, 1)"
            " WHEN '1' THEN 7 WHEN '2' THEN 14 WHEN '3' THEN 21"
            " WHEN '4' THEN 28 ELSE 35 END"
        ).alias("sla_days"),
    )
    f = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.when(
                F.expr("(ship_us - ord_us) div 86400000000")
                <= F.col("sla_days"),
                1,
            )
            .otherwise(0)
            .alias("on_time"),
            F.when(F.col("shipped") >= F.col("ordered"), 1)
            .otherwise(0)
            .alias("in_full"),
        )
    )
    return f.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("on_time").cast("bigint").alias("n_on_time"),
        F.sum("in_full").cast("bigint").alias("n_in_full"),
        F.sum(F.col("on_time") * F.col("in_full"))
        .cast("bigint")
        .alias("n_otif"),
        e6_floor_ratio(
            F.sum(F.col("on_time") * F.col("in_full")), F.count(F.lit(1))
        ).alias("otif_e6"),
    )


# --------------------------------------------------------------------------
# q014 (birth q283) — Intercompany elimination: orders synthesized into entity-to-
# entity transactions (seller = custkey % 5, buyer = (custkey +
# orderkey) % 5, self-trades excluded); for every UNORDERED entity
# pair the gross flow, the directional net, and the eliminated amount
# (gross − |net|) — what a consolidation close removes from group
# revenue. One keyed aggregate on the bounded pair grid with
# conditional directional sums — no self-join.
# --------------------------------------------------------------------------


@register(
    "q304_intercompany_elimination",
    oracle=f"""
WITH t AS (
  SELECT o_custkey % 5 AS seller,
         (o_custkey + o_orderkey) % 5 AS buyer,
         {_CENTS.format(c='o_totalprice')} AS amt
  FROM orders WHERE o_custkey % 5 <> (o_custkey + o_orderkey) % 5
),
p AS (
  SELECT LEAST(seller, buyer) AS e_lo, GREATEST(seller, buyer) AS e_hi,
         amt,
         CASE WHEN seller < buyer THEN amt ELSE -amt END AS signed_amt
  FROM t
)
SELECT CAST(e_lo AS BIGINT) AS e_lo, CAST(e_hi AS BIGINT) AS e_hi,
       CAST(COUNT(*) AS BIGINT) AS n_txn,
       CAST(SUM(amt) AS BIGINT) AS gross_cents,
       CAST(SUM(signed_amt) AS BIGINT) AS net_lo_to_hi_cents,
       CAST(SUM(amt) - ABS(SUM(signed_amt)) AS BIGINT)
         AS eliminated_cents
FROM p GROUP BY e_lo, e_hi
""",
)
def q304_intercompany_elimination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = (
        load(spark, sf_dir, "orders")
        .select(
            (F.col("o_custkey") % 5).alias("seller"),
            ((F.col("o_custkey") + F.col("o_orderkey")) % 5).alias("buyer"),
            _cents("o_totalprice").alias("amt"),
        )
        .where(F.col("seller") != F.col("buyer"))
    )
    p = t.select(
        F.least("seller", "buyer").cast("bigint").alias("e_lo"),
        F.greatest("seller", "buyer").cast("bigint").alias("e_hi"),
        "amt",
        F.when(F.col("seller") < F.col("buyer"), F.col("amt"))
        .otherwise(-F.col("amt"))
        .alias("signed_amt"),
    )
    return p.groupBy("e_lo", "e_hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_txn"),
        F.sum("amt").cast("bigint").alias("gross_cents"),
        F.sum("signed_amt").cast("bigint").alias("net_lo_to_hi_cents"),
        (F.sum("amt") - F.abs(F.sum("signed_amt")))
        .cast("bigint")
        .alias("eliminated_cents"),
    )


# --------------------------------------------------------------------------
# q016 (birth q284) — Seasonality index by calendar month: each month-of-year's
# revenue against the flat 1/12 share — index_e6 = rev_m · 12 · 1e6
# div total (1e6 = exactly seasonal-neutral). The demand-planning
# input that turns q261/q311's level forecasts into monthly targets.
# One scan, 12-row output.
# --------------------------------------------------------------------------


@register(
    "q305_seasonality_index",
    oracle=f"""
WITH m AS (
  SELECT month(o_orderdate) AS mth,
         {_CENTS.format(c='o_totalprice')} AS amt
  FROM orders
),
g AS (
  SELECT mth, CAST(SUM(amt) AS BIGINT) AS rev FROM m GROUP BY mth
),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM g)
SELECT CAST(mth AS BIGINT) AS mth, rev AS revenue_cents,
       CAST(rev * 12 * 1000000 // total AS BIGINT) AS index_e6
FROM g CROSS JOIN t
""",
)
def q305_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load(spark, sf_dir, "orders")
        .select(
            F.month("o_orderdate").cast("bigint").alias("mth"),
            _cents("o_totalprice").alias("amt"),
        )
        .groupBy("mth")
        .agg(F.sum("amt").cast("bigint").alias("revenue_cents"))
    )
    t = g.agg(F.sum("revenue_cents").cast("bigint").alias("_total"))
    return g.crossJoin(F.broadcast(t)).select(
        "mth",
        "revenue_cents",
        F.expr(
            "CAST(CAST(revenue_cents * 12 AS DECIMAL(38,0)) * 1000000"
            " div _total AS BIGINT)"
        ).alias("index_e6"),
    )


# --------------------------------------------------------------------------
# q311 (birth q285) — Holt double exponential smoothing (operators/forecast.
# holt_forecast): q261's SES with a TREND state — per-part monthly
# demand, alpha = beta = 1/4 on exact integers in the error-correction
# form (l += trunc(err/4); b += trunc(level_step/4)). Same
# irreducibly-sequential recurrence class as SES/AVCO → 64-way
# hash-bucketed Arrow walk; the oracle replays BOTH states with a
# RECURSIVE CTE in per-part row-number lockstep. Parts sampled (% 10)
# to bound the oracle recursion width, mirroring q261.
# --------------------------------------------------------------------------


@register(
    "q311_holt_forecast",
    oracle="""
WITH RECURSIVE series AS (
  SELECT l_partkey AS key,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
           AS period,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS value
  FROM lineitem WHERE l_partkey % 10 = 0
  GROUP BY 1, 2
),
m AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY period) AS rn
  FROM series
),
s AS (
  SELECT key, rn, period, value,
         CAST(NULL AS BIGINT) AS forecast,
         value AS level,
         CAST(0 AS BIGINT) AS trend,
         CAST(NULL AS BIGINT) AS abs_err
  FROM m WHERE rn = 1
  UNION ALL
  SELECT m.key, m.rn, m.period, m.value,
         s.level + s.trend AS forecast,
         s.level + s.trend
           + (m.value - s.level - s.trend) // 4 AS level,
         s.trend + ((m.value - s.level - s.trend) // 4) // 4 AS trend,
         abs(m.value - s.level - s.trend) AS abs_err
  FROM s JOIN m ON m.key = s.key AND m.rn = s.rn + 1
)
SELECT CAST(key AS BIGINT) AS l_partkey, period, value,
       CAST(forecast AS BIGINT) AS forecast,
       CAST(level AS BIGINT) AS level,
       CAST(trend AS BIGINT) AS trend,
       CAST(abs_err AS BIGINT) AS abs_err
FROM s
""",
)
def q311_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.forecast import holt_forecast

    series = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 10 == 0)
        .groupBy(
            "l_partkey",
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("period"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("demand"))
    )
    return holt_forecast(
        series, "l_partkey", "period", "demand", alpha_den=4, beta_den=4
    ).select(
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
        "period",
        F.col("demand").alias("value"),
        "forecast",
        "level",
        "trend",
        "abs_err",
    )


# --------------------------------------------------------------------------
# q022 (birth q286) — Inventory turns (operators/history.inventory_turns): the
# q309 AVCO move ledger (receipts + half-quantity issues per line,
# parts % 20) summarized per part as issued quantity against the
# average post-move on-hand — turns_e6 = issued · 1e6 · n div
# Σ onhand. Fully SET-BASED next to AVCO's sequential walker (turns
# need no per-move cost state): one part-keyed running-balance window
# + one part-keyed aggregate.
# --------------------------------------------------------------------------


@register(
    "q308_inventory_turns",
    oracle="""
WITH base AS (
  SELECT l_partkey AS part,
         (l_orderkey * 10 + l_linenumber) AS lk,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem WHERE l_partkey % 20 = 0
),
mv AS (
  SELECT part, lk * 2 AS seq, q AS qty FROM base
  UNION ALL
  SELECT part, lk * 2 + 1, -(q // 2) FROM base WHERE q // 2 > 0
),
bal AS (
  SELECT part, seq, qty,
         SUM(qty) OVER (PARTITION BY part ORDER BY seq) AS onhand
  FROM mv
)
SELECT CAST(part AS BIGINT) AS l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_moves,
       CAST(SUM(CASE WHEN qty < 0 THEN -qty ELSE 0 END) AS BIGINT)
         AS issued_qty,
       CAST(SUM(onhand) AS BIGINT) AS onhand_sum,
       CASE WHEN SUM(onhand) > 0 THEN
         CAST(CAST(SUM(CASE WHEN qty < 0 THEN -qty ELSE 0 END) AS BIGINT)
              * 1000000 * CAST(COUNT(*) AS BIGINT)
              // CAST(SUM(onhand) AS BIGINT) AS BIGINT)
       END AS turns_e6
FROM bal GROUP BY part
""",
)
def q308_inventory_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.history import inventory_turns

    base = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 20 == 0)
        .select(
            F.col("l_partkey").alias("part"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lk"),
            F.col("l_quantity").cast("bigint").alias("q"),
        )
    )
    mv = base.select(
        "part", (F.col("lk") * 2).alias("seq"), F.col("q").alias("qty")
    ).unionByName(
        base.where(F.expr("q div 2") > 0).select(
            "part",
            (F.col("lk") * 2 + 1).alias("seq"),
            (-F.expr("q div 2")).alias("qty"),
        )
    )
    return inventory_turns(mv, "part", "seq", "qty").select(
        F.col("part").cast("bigint").alias("l_partkey"),
        "n_moves",
        "issued_qty",
        "onhand_sum",
        "turns_e6",
    )


# --------------------------------------------------------------------------
# q025 (birth q287) — Customer-concentration HHI (operators/quality.
# hhi_concentration): the Herfindahl index over per-customer revenue —
# Σ (e6 share)² on a 1e12 scale plus the top-5 combined share. The
# revenue-concentration risk line in every diligence datasheet, next
# to the Gini audit (q236 measures inequality; HHI measures how much
# the biggest holders own). One keyed aggregate + a bounded TakeOrdered
# top-N — no global window over the customer table.
# --------------------------------------------------------------------------


@register(
    "q160_customer_hhi",
    oracle=f"""
WITH per AS (
  SELECT o_custkey AS k,
         CAST(SUM({_CENTS.format(c='o_totalprice')}) AS BIGINT) AS v
  FROM orders GROUP BY o_custkey
),
t AS (SELECT CAST(SUM(v) AS BIGINT) AS total FROM per),
sh AS (
  SELECT k, v, v * 1000000 // total AS s,
         ROW_NUMBER() OVER (ORDER BY v DESC, k) AS rn
  FROM per CROSS JOIN t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(v * 0) + (SELECT total FROM t) AS BIGINT) AS total_cents,
       CAST(SUM(s * s) AS BIGINT) AS hhi_e12,
       CAST(SUM(CASE WHEN rn <= 5 THEN s ELSE 0 END) AS BIGINT)
         AS top_share_e6
FROM sh
""",
)
def q160_customer_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import hhi_concentration

    rev = load(spark, sf_dir, "orders").select(
        "o_custkey", _cents("o_totalprice").alias("cents")
    )
    return hhi_concentration(rev, "o_custkey", "cents", top_n=5)


# --------------------------------------------------------------------------
# q070 (birth q288) — N-gram novelty vs a reference corpus (operators/curation.
# ngram_novelty): even-id documents are the reference snapshot,
# odd-id documents score — the fraction of each scored doc's distinct
# trigram shingles never seen in the reference (the keep-side
# complement of the dedup family: near-dup drops, novelty ranks).
# One LEFT-ANTI shingle equi-join (the q158/q045 decontamination
# shape), never all-pairs.
# --------------------------------------------------------------------------


@register(
    "q070_ngram_novelty",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks CROSS JOIN generate_series(1, 4096) g(i)
  WHERE len(t) >= 3 AND i <= len(t) - 2
  UNION
  SELECT DISTINCT doc_id, array_to_string(t, ' ') AS sh
  FROM toks WHERE len(t) < 3
),
ref AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 2 = 0),
scored AS (SELECT doc_id, sh FROM sh WHERE doc_id % 2 = 1),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
  FROM scored GROUP BY doc_id
),
nov AS (
  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_unseen
  FROM scored s LEFT JOIN ref r ON r.sh = s.sh
  WHERE r.sh IS NULL GROUP BY s.doc_id
)
SELECT t.doc_id, t.n_shingles,
       CAST(COALESCE(n.n_unseen, 0) AS BIGINT) AS n_unseen,
       CAST(COALESCE(n.n_unseen, 0) * 1000000 // t.n_shingles AS BIGINT)
         AS novelty_e6
FROM tot t LEFT JOIN nov n ON n.doc_id = t.doc_id
""",
)
def q070_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.curation import ngram_novelty

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_novelty(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        "doc_id",
        "text",
        shingle_n=3,
    )


# --------------------------------------------------------------------------
# q135 (birth q289) — Cohort LTV curve (operators/behavior.cohort_ltv): customers
# cohort by first order month; revenue accumulates per (cohort,
# month offset) with the per-user running LTV — the revenue twin of
# q233's retention matrix. Two keyed aggregates + one window over the
# bounded (cohort × offset) grid.
# --------------------------------------------------------------------------


@register(
    "q135_cohort_ltv",
    oracle=f"""
WITH src AS (
  SELECT o_custkey AS u,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
         {_CENTS.format(c='o_totalprice')} AS v
  FROM orders
),
f AS (SELECT u, MIN(m) AS cohort_month FROM src GROUP BY u),
sizes AS (
  SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM f GROUP BY cohort_month
),
grid AS (
  SELECT f.cohort_month,
         CAST(s.m - f.cohort_month AS BIGINT) AS month_offset,
         CAST(SUM(s.v) AS BIGINT) AS revenue_cents
  FROM src s JOIN f ON f.u = s.u
  GROUP BY 1, 2
),
w AS (
  SELECT cohort_month, month_offset, revenue_cents,
         CAST(SUM(revenue_cents) OVER (
           PARTITION BY cohort_month ORDER BY month_offset) AS BIGINT)
           AS cum_ltv_cents
  FROM grid
)
SELECT w.cohort_month, w.month_offset, w.revenue_cents, w.cum_ltv_cents,
       z.cohort_users,
       CAST(w.cum_ltv_cents // z.cohort_users AS BIGINT)
         AS cum_ltv_per_user_cents
FROM w JOIN sizes z ON z.cohort_month = w.cohort_month
""",
)
def q135_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import cohort_ltv

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("m"),
        _cents("o_totalprice").alias("v"),
    )
    return cohort_ltv(orders, "o_custkey", "m", "v")


# --------------------------------------------------------------------------
# q028 (birth q290) — Credit exposure vs limit per market segment: each customer's
# OPEN order value (status 'O') against a deterministic credit limit
# (positive part of the account balance + a 50k floor, exact cents),
# rolled up per segment with the over-limit count and the worst
# utilization. The credit-control dashboard; data-derived, no wall
# clock. One join + two keyed aggregates.
# --------------------------------------------------------------------------


@register(
    "q187_credit_exposure",
    oracle=f"""
WITH open_ar AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN o_orderstatus = 'O'
                  THEN {_CENTS.format(c='o_totalprice')} ELSE 0 END)
           AS BIGINT) AS open_cents
  FROM orders GROUP BY o_custkey
),
c AS (
  SELECT c_custkey, c_mktsegment,
         GREATEST(CAST(floor(c_acctbal) AS BIGINT), 0) * 100 + 5000000
           AS limit_cents,
         COALESCE(a.open_cents, 0) AS open_cents
  FROM customer LEFT JOIN open_ar a ON a.o_custkey = c_custkey
),
u AS (
  SELECT c_mktsegment, open_cents, limit_cents,
         open_cents * 1000000 // limit_cents AS util_e6
  FROM c
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN util_e6 > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_limit,
       CAST(SUM(open_cents) AS BIGINT) AS open_cents,
       CAST(SUM(limit_cents) AS BIGINT) AS limit_cents,
       CAST(MAX(util_e6) AS BIGINT) AS max_util_e6
FROM u GROUP BY c_mktsegment
""",
)
def q187_credit_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    open_ar = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O", _cents("o_totalprice")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("open_cents")
        )
    )
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        (
            F.greatest(F.floor("c_acctbal").cast("bigint"), F.lit(0)) * 100
            + 5000000
        ).alias("limit_cents"),
    )
    u = (
        cust.join(open_ar, cust.c_custkey == open_ar.o_custkey, "left")
        .select(
            "c_mktsegment",
            F.coalesce("open_cents", F.lit(0)).cast("bigint").alias(
                "open_cents"
            ),
            "limit_cents",
        )
        .withColumn(
            "util_e6", e6_floor_ratio(F.col("open_cents"), F.col("limit_cents"))
        )
    )
    return u.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("util_e6") > 1000000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_limit"),
        F.sum("open_cents").cast("bigint").alias("open_cents"),
        F.sum("limit_cents").cast("bigint").alias("limit_cents"),
        F.max("util_e6").cast("bigint").alias("max_util_e6"),
    )


# --------------------------------------------------------------------------
# q136 (birth q291) — FUZZY duplicate-invoice screen (operators/finance.
# near_duplicate_invoice_screen): planted near-copies (amount +37
# cents, date +2 days at orderkey % 97) must surface among same-party
# invoice pairs within 100 cents and 7 days. The banded amount join
# (bucket + next-bucket probes, least-bucket unique emission — the
# q050-family matching-key-election rule) is LOSSLESS for the absolute tolerance, so the oracle is
# the NAIVE same-party pair join: the datasheet (pair count + planted
# recall) must agree exactly.
# --------------------------------------------------------------------------


@register(
    "q136_fuzzy_dup_invoices",
    oracle=f"""
WITH inv AS (
  SELECT o_custkey AS party, o_orderkey AS inv_id,
         {_CENTS.format(c='o_totalprice')} AS amt,
         CAST(o_orderdate AS DATE) AS dt
  FROM orders
  UNION ALL
  SELECT o_custkey, o_orderkey + 10000000,
         {_CENTS.format(c='o_totalprice')} + 37,
         CAST(o_orderdate AS DATE) + 2
  FROM orders WHERE o_orderkey % 97 = 0
),
pairs AS (
  SELECT a.party, a.inv_id AS id_a, b.inv_id AS id_b,
         ABS(a.amt - b.amt) AS diff_cents,
         ABS(datediff('day', a.dt, b.dt)) AS day_gap
  FROM inv a JOIN inv b
    ON a.party = b.party AND a.inv_id < b.inv_id
  WHERE ABS(a.amt - b.amt) <= 100
    AND ABS(datediff('day', a.dt, b.dt)) <= 7
),
planted AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_planted
  FROM orders WHERE o_orderkey % 97 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(diff_cents) AS BIGINT) AS sum_diff_cents,
       (SELECT n_planted FROM planted) AS n_planted,
       CAST(SUM(CASE WHEN id_b = id_a + 10000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS planted_found,
       CAST(SUM(CASE WHEN id_b = id_a + 10000000 THEN 1 ELSE 0 END)
            * 1000000 // (SELECT n_planted FROM planted) AS BIGINT)
         AS planted_recall_e6
FROM pairs
""",
)
def q136_fuzzy_dup_invoices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio
    from cubicerp_client_etl_spark.operators.finance import (
        near_duplicate_invoice_screen,
    )

    o = load(spark, sf_dir, "orders")
    inv = o.select(
        F.col("o_custkey").alias("party"),
        F.col("o_orderkey").alias("inv_id"),
        _cents("o_totalprice").alias("amt"),
        F.col("o_orderdate").cast("date").alias("dt"),
    ).unionByName(
        o.where(F.col("o_orderkey") % 97 == 0).select(
            F.col("o_custkey").alias("party"),
            (F.col("o_orderkey") + 10000000).alias("inv_id"),
            (_cents("o_totalprice") + 37).alias("amt"),
            F.date_add(F.col("o_orderdate").cast("date"), 2).alias("dt"),
        )
    )
    pairs = near_duplicate_invoice_screen(
        inv,
        "party",
        "inv_id",
        "amt",
        "dt",
        amount_tol_cents=100,
        day_window=7,
        bucket_cents=10_000,
    )
    npl = o.where(F.col("o_orderkey") % 97 == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_planted")
    )
    found = F.sum(
        F.when(F.col("id_b") == F.col("id_a") + 10000000, 1).otherwise(0)
    )
    return pairs.join(F.broadcast(npl)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("diff_cents").cast("bigint").alias("sum_diff_cents"),
        F.first("n_planted").alias("n_planted"),
        found.cast("bigint").alias("planted_found"),
        e6_floor_ratio(found, F.first("n_planted")).alias(
            "planted_recall_e6"
        ),
    )
