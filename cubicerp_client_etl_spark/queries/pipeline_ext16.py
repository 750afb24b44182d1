"""Round-15 extension waves 4-5: manufacturing/audit/subscription
breadth next to the close arc — kit availability (the ATP question
for assembled goods), the document-number sequence-gap audit (the
completeness control on numbered series), the exact-integer Wilson
lower bound (rate ranking on unequal sample sizes), the MRR waterfall
(new/expansion/contraction/churn with the exact tie-out), the
single-source supply-risk audit, DAU/WAU stickiness (trailing
distinct via a bounded spread-explode, no window), lexical diversity
per source, the hour-of-day load profile (UTC-instant hour
arithmetic + an exact integer dispersion index), the interval-overlap
double-booking audit, exact k-sigma anomaly flags, the top-k
leaderboard with an exact OTHERS rollup, the repeat-purchase rate,
the intraday price-consistency audit, business-day SLA arithmetic
(closed-form, no calendar table), the slow-mover screen, newsvendor
order-up-to levels (exact histogram rank rule), funnel
time-to-convert percentiles, and the 2-D Pareto/skyline screen on
the two-phase distributed prefix-min.

Same corpus discipline as the rest of the registry: exact integer
arithmetic the DuckDB oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register

# --------------------------------------------------------------------------
# q323 — Kit availability (L-erp27): how many kits of each assembly
# can be built from component stock right now — kits(parent) = min
# over direct components of floor(onhand / qty_per), with the
# LIMITING component named (smallest buildable count, ties to the
# lowest component key). The BOM reuses q012's digit-structure forest
# (parent = key div 10, qty_per = 1 + key % 3); on-hand is the total
# lineitem quantity per part, absent parts counting as ZERO stock
# (left join — a kit with an unstocked component builds 0). Exact
# integer division on non-negative integers: floor == trunc in every
# engine. Scale: one keyed agg for on-hand, one equi-join on the
# component key, one bounded-fan window + one keyed agg on the parent
# key. Operator: history.kit_availability.
# --------------------------------------------------------------------------
@register(
    "q323_kit_availability",
    oracle="""
WITH oh AS (
  SELECT l_partkey AS c, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS ohq
  FROM lineitem GROUP BY l_partkey
),
edges AS (
  SELECT p_partkey AS c, p_partkey // 10 AS p, 1 + p_partkey % 3 AS q
  FROM part WHERE p_partkey >= 10
),
j AS (
  SELECT e.p, e.c, COALESCE(oh.ohq, 0) AS ohq,
         COALESCE(oh.ohq, 0) // e.q AS kits
  FROM edges e LEFT JOIN oh ON oh.c = e.c
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p ORDER BY kits, c) AS rk
  FROM j
)
SELECT CAST(p AS BIGINT) AS parent,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(MIN(kits) AS BIGINT) AS kits_buildable,
       CAST(MAX(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS limiting_child,
       CAST(MAX(CASE WHEN rk = 1 THEN ohq END) AS BIGINT)
         AS limiting_onhand
FROM r GROUP BY p ORDER BY parent
""",
)
def q323_kit_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.history import kit_availability

    part = load(spark, sf_dir, "part")
    lineitem = load(spark, sf_dir, "lineitem")
    bom = part.where(F.col("p_partkey") >= 10).select(
        F.expr("p_partkey div 10").cast("bigint").alias("parent"),
        F.col("p_partkey").cast("bigint").alias("child"),
        (F.lit(1) + F.col("p_partkey") % 3).cast("bigint").alias("qty_per"),
    )
    onhand = lineitem.groupBy(
        F.col("l_partkey").cast("bigint").alias("partkey")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("onhand_qty"))
    return kit_availability(onhand, bom).orderBy("parent")


# --------------------------------------------------------------------------
# q324 — Document-number sequence-gap audit (L-qa5): the completeness
# control auditors run on numbered series — per customer (each
# account's own document numbering), every break in the owned
# order-key sequence is a potential missing/voided document: gap
# count, total missing numbers (span − docs) and the largest single
# run. Gaps-and-islands exactly (one lag window + one keyed agg, both
# on the series key; per-series fan is one account's issuance — a
# bounded few dozen documents — while series CARDINALITY carries the
# corpus growth, the scale-right window shape). The oracle replays
# the lag, every gap test and the span arithmetic. Operator:
# quality.sequence_gap_audit.
# --------------------------------------------------------------------------
@register(
    "q324_sequence_gap_audit",
    oracle="""
WITH d AS (
  SELECT o_custkey AS s, CAST(o_orderkey AS BIGINT) AS n FROM orders
),
g AS (
  SELECT s, n,
         COALESCE(n - LAG(n) OVER (PARTITION BY s ORDER BY n) - 1, 0)
           AS gap
  FROM d
)
SELECT CAST(s AS BIGINT) AS series,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n) AS BIGINT) AS min_number,
       CAST(MAX(n) AS BIGINT) AS max_number,
       CAST(SUM(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(MAX(n) - MIN(n) + 1 - COUNT(*) AS BIGINT) AS missing_total,
       CAST(MAX(gap) AS BIGINT) AS largest_gap
FROM g GROUP BY s ORDER BY series
""",
)
def q324_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import sequence_gap_audit

    orders = load(spark, sf_dir, "orders")
    out = sequence_gap_audit(
        orders, series_col="o_custkey", number_col="o_orderkey"
    )
    return out.select(
        F.col("o_custkey").cast("bigint").alias("series"),
        "n_docs",
        "min_number",
        "max_number",
        "n_gaps",
        "missing_total",
        "largest_gap",
    ).orderBy("series")


# --------------------------------------------------------------------------
# q325 — Return-rate ranking by Wilson lower bound (L-qa6): per part
# brand, the conservative return-rate bound that keeps a 3-of-3
# small sample from outranking a 100-of-10000 one — the exact-integer
# Wilson law at z = 2 (quality.wilson_lower_bound_e6: e6-floored
# radicand → floor-corrected isqrt → integer quotient; both engines
# compute identical integers, and the numerator is provably
# non-negative so trunc == floor). Plain rate via e6_floor_ratio for
# contrast. Scale: one fact×part equi-join + one keyed agg over 25
# brands; the bound itself is pure map. Operators:
# quality.wilson_lower_bound_e6 + functions.isqrt_exact.
# --------------------------------------------------------------------------
@register(
    "q325_wilson_return_rates",
    oracle="""
WITH l AS (
  SELECT p_brand, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
g AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(ret) AS BIGINT) AS k
  FROM l GROUP BY p_brand
),
w AS (
  SELECT p_brand, n, k,
         CAST((CAST(1000000 AS HUGEINT) * (CAST(k AS HUGEINT) * (n - k) + n))
              // n AS BIGINT) AS inner6
  FROM g
),
s AS (
  SELECT *, CAST(floor(sqrt(CAST(inner6 AS DOUBLE))) AS BIGINT) AS s0
  FROM w
),
e AS (
  SELECT p_brand, n, k,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= inner6 THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > inner6 THEN 1 ELSE 0 END) AS sq
  FROM s
)
SELECT p_brand AS brand, n AS n_lines, k AS n_returns,
       CAST(k * 1000000 // n AS BIGINT) AS rate_e6,
       CAST(GREATEST(0, ((k + 2) * 1000000 - 2000 * sq) // (n + 4))
            AS BIGINT) AS wilson_lb_e6
FROM e ORDER BY brand
""",
)
def q325_wilson_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio
    from cubicerp_client_etl_spark.operators.quality import (
        wilson_lower_bound_e6,
    )

    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    g = (
        lineitem.join(
            part.select("p_partkey", F.col("p_brand").alias("brand")),
            lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_returns"),
        )
    )
    out = wilson_lower_bound_e6(g, "n_lines", "n_returns")
    return out.select(
        "brand",
        "n_lines",
        "n_returns",
        e6_floor_ratio(F.col("n_returns"), F.col("n_lines")).alias("rate_e6"),
        "wilson_lb_e6",
    ).orderBy("brand")


# --------------------------------------------------------------------------
# q326 — MRR waterfall (L-fin21): the recurring-revenue close report —
# each month's change decomposed into new / expansion / contraction /
# churned so net_change ties out to Σcur − Σprev exactly in cents.
# Months ride an INTEGER year-month index (12·y + m − 1) so
# "consecutive" is arithmetic, not calendar; churn lands in the month
# after the entity's last active month (possibly one past the data
# horizon — the report's standard convention). The oracle replays the
# shifted full-outer join and every CASE. Scale: one full-outer
# self-join on (entity, month) + one keyed agg over the bounded month
# grid — no window, no densification. Operator: finance.mrr_waterfall.
# --------------------------------------------------------------------------
@register(
    "q326_mrr_waterfall",
    oracle="""
WITH rev AS (
  SELECT o_custkey AS e,
         12 * EXTRACT(year FROM CAST(o_orderdate AS DATE))
           + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1 AS m,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) AS BIGINT) AS amt
  FROM orders GROUP BY 1, 2
),
j AS (
  SELECT COALESCE(cur.m, prv.m) AS m,
         COALESCE(cur.amt, 0) AS c, COALESCE(prv.amt, 0) AS p
  FROM rev cur FULL OUTER JOIN (SELECT e, m + 1 AS m, amt FROM rev) prv
    ON cur.e = prv.e AND cur.m = prv.m
)
SELECT CAST(m AS BIGINT) AS ym,
       CAST(SUM(CASE WHEN p = 0 AND c > 0 THEN c ELSE 0 END) AS BIGINT)
         AS new_cents,
       CAST(SUM(CASE WHEN p > 0 AND c > 0 AND c > p THEN c - p ELSE 0 END)
            AS BIGINT) AS expansion_cents,
       CAST(SUM(CASE WHEN p > 0 AND c > 0 AND p > c THEN p - c ELSE 0 END)
            AS BIGINT) AS contraction_cents,
       CAST(SUM(CASE WHEN c = 0 AND p > 0 THEN p ELSE 0 END) AS BIGINT)
         AS churned_cents,
       CAST(SUM(c - p) AS BIGINT) AS net_change,
       CAST(SUM(CASE WHEN p = 0 AND c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN c = 0 AND p > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_churned,
       CAST(SUM(CASE WHEN p > 0 AND c > 0 AND c > p THEN 1 ELSE 0 END)
            AS BIGINT) AS n_expanded,
       CAST(SUM(CASE WHEN p > 0 AND c > 0 AND c < p THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contracted
FROM j GROUP BY m ORDER BY ym
""",
)
def q326_mrr_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import mrr_waterfall

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        (
            F.lit(12) * F.year(F.to_date("o_orderdate"))
            + F.month(F.to_date("o_orderdate"))
            - F.lit(1)
        ).alias("ym"),
    ).agg(
        F.sum(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )
        ).alias("amount_cents")
    )
    return mrr_waterfall(rev).orderBy("ym")


# --------------------------------------------------------------------------
# q327 — Single-source supply risk (L-erp28): the procurement
# resilience audit — per brand, how many traded parts are bought from
# exactly ONE supplier and how much spend sits on them; share exact
# via e6_floor_ratio. The supplier-count distinct and the spend agg
# ride the same part key. Scale: one (part, supplier) distinct-agg +
# one part-level agg + one bounded brand agg — no window, no
# self-join. Operator: quality.single_source_risk.
# --------------------------------------------------------------------------
@register(
    "q327_single_source_risk",
    oracle="""
WITH pp AS (
  SELECT l_partkey AS p, p_brand AS g,
         COUNT(DISTINCT l_suppkey) AS ns,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS spend
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
)
SELECT g AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_source,
       CAST(SUM(spend) AS BIGINT) AS total_spend_cents,
       CAST(SUM(CASE WHEN ns = 1 THEN spend ELSE 0 END) AS BIGINT)
         AS single_source_spend_cents,
       CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS single_source_share_e6
FROM pp GROUP BY g ORDER BY brand
""",
)
def q327_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import single_source_risk

    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    lines = lineitem.join(
        part.select("p_partkey", F.col("p_brand").alias("brand")),
        lineitem["l_partkey"] == F.col("p_partkey"),
    ).select(
        "l_partkey",
        "l_suppkey",
        "brand",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("spend_cents"),
    )
    return single_source_risk(
        lines,
        part_col="l_partkey",
        supplier_col="l_suppkey",
        spend_col="spend_cents",
        group_col="brand",
    ).orderBy("brand")


# --------------------------------------------------------------------------
# q328 — DAU/WAU stickiness (L-beh9): per calendar day, daily actives
# over trailing-7-day actives, exact e6. Trailing DISTINCT can't ride
# a range window, so the WAU side explodes the already-distinct
# (user, day) grid into the 7 report days each contributes to and
# de-duplicates — a bounded ×7 fan; the inner join back to the DAU
# grid drops the explode's forward spill past the horizon (and the
# first 6 days are honest partial windows, the report's usual left
# edge). The oracle replays the distinct, the spread and the floor
# ratio. Scale: two distincts + two keyed counts, all on day/user
# keys; no window at all. Operator: behavior.stickiness_daily.
# --------------------------------------------------------------------------
@register(
    "q328_dau_wau_stickiness",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events
),
dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
spread AS (
  SELECT DISTINCT u, d + CAST(k AS INTEGER) AS day
  FROM ud CROSS JOIN generate_series(0, 6) g(k)
),
wau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM spread GROUP BY 1
)
SELECT dau.day AS day, dau.dau, wau.wau,
       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_e6
FROM dau JOIN wau ON wau.day = dau.day ORDER BY dau.day
""",
)
def q328_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import stickiness_daily

    events = load(spark, sf_dir, "events")
    return stickiness_daily(events).orderBy("day")


# --------------------------------------------------------------------------
# q329 — Lexical diversity per source (L-txt3): corpus-level
# type-token ratio per document source — the curation screen that
# catches template farms (low TTR) and OCR noise (anomalously high
# TTR) before training data ships. The corpus tokenizer convention
# (lower → trim → whitespace split, text.tokens) with distinct types
# counted PER SOURCE; ttr exact at e6 via e6_floor_ratio. Scale: one
# explode + one keyed agg (count + count_distinct on the source key)
# + the bounded per-source doc count — no window, no join beyond the
# tiny source grid. Operators: text.tokens + functions.e6_floor_ratio.
# --------------------------------------------------------------------------
@register(
    "q329_lexical_diversity",
    oracle="""
WITH toks AS (
  SELECT source, u.t AS tok
  FROM documents,
       UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS u(t)
),
g AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS total_tokens,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_tokens
  FROM toks GROUP BY source
),
d AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT g.source, d.n_docs, g.total_tokens, g.distinct_tokens,
       CAST(g.distinct_tokens * 1000000 // g.total_tokens AS BIGINT)
         AS ttr_e6
FROM g JOIN d ON d.source = g.source ORDER BY g.source
""",
)
def q329_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio
    from cubicerp_client_etl_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    g = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
        F.count_distinct("tok").cast("bigint").alias("distinct_tokens"),
    )
    d = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return (
        g.join(d, "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "distinct_tokens",
            e6_floor_ratio(
                F.col("distinct_tokens"), F.col("total_tokens")
            ).alias("ttr_e6"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q330 — Hour-of-day load profile (L-beh10): per event class, where
# traffic concentrates across the 24-hour clock and how far from
# uniform it is — peak hour (ties to the lowest hour), exact peak
# share, and the integer dispersion index floor(1e6·(24·Σn_h² −
# N²)/N²) (0 = uniform, 23e6 = single-hour spike; the variance
# numerator is exact integers, no means, no doubles — carried in
# DECIMAL(38,0)/HUGEINT past the Σn² bigint ceiling). Hour is
# UTC-instant arithmetic ((epoch div 3600) % 24) — independent of
# session timezone, both engines compute the same integers. Scale:
# one keyed agg to the bounded 24·|classes| grid; everything after is
# on that grid. Operator: behavior.hourly_profile.
# --------------------------------------------------------------------------
@register(
    "q330_hourly_load_profile",
    oracle="""
WITH h AS (
  SELECT event_type,
         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS BIGINT)
           AS hr
  FROM events
),
c AS (
  SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS n
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT event_type, SUM(n) AS total, MAX(n) AS peak,
         CAST(24 AS HUGEINT) * SUM(CAST(n AS HUGEINT) * n)
           - CAST(SUM(n) AS HUGEINT) * SUM(n) AS var_num
  FROM c GROUP BY event_type
),
pk AS (
  SELECT c.event_type, MIN(c.hr) AS peak_hour
  FROM c JOIN agg ON agg.event_type = c.event_type AND c.n = agg.peak
  GROUP BY c.event_type
)
SELECT a.event_type, CAST(a.total AS BIGINT) AS n_events,
       pk.peak_hour,
       CAST(a.peak * 1000000 // a.total AS BIGINT) AS peak_share_e6,
       CAST(a.var_num * 1000000
            // (CAST(a.total AS HUGEINT) * a.total) AS BIGINT)
         AS dispersion_e6
FROM agg a JOIN pk ON pk.event_type = a.event_type
ORDER BY a.event_type
""",
)
def q330_hourly_load_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import hourly_profile

    events = load(spark, sf_dir, "events")
    return hourly_profile(events).orderBy("event_type")


# --------------------------------------------------------------------------
# q331 — Shipping-window overlap audit (L-qa7): the double-booking
# detector — per supplier, how many shipments STARTED before an
# earlier shipment's transit window had closed (half-open semantics:
# touching endpoints don't overlap; window = ship date + a
# deterministic 2–15-day transit, line-keyed — the fixture carries no
# receipt date). Sweep-line in ONE window: order by (ship date, line
# id), carry the running MAX of prior window ends; overlap iff start
# < that max. Counting pairs would be quadratic — counting
# overlapping INTERVALS is linear and is what the auditor triages;
# worst intrusion depth reported in days. The oracle replays the
# frame, the tie-break and every comparison. Scale: one window + one
# keyed agg on the supplier key; per-supplier fan is that supplier's
# shipment count (constant in SF — suppliers and lineitems scale
# together). Operator: interval.overlap_audit.
# --------------------------------------------------------------------------
@register(
    "q331_shipping_overlap_audit",
    oracle="""
WITH iv AS (
  SELECT l_suppkey AS k, l_orderkey * 8 + l_linenumber AS id,
         CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 8 + l_linenumber) % 14 + 2 AS INTEGER) AS e
  FROM lineitem
),
st AS (
  SELECT k, id, s, e,
         MAX(e) OVER (PARTITION BY k ORDER BY s, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv
),
o AS (
  SELECT k, s, pmax,
         CASE WHEN pmax IS NOT NULL AND s < pmax THEN 1 ELSE 0 END AS ov
  FROM st
)
SELECT CAST(k AS BIGINT) AS l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(ov) AS BIGINT) AS n_overlapping,
       CAST(MAX(CASE WHEN ov = 1 THEN pmax - s END) AS BIGINT)
         AS max_intrusion_days,
       CAST(SUM(ov) * 1000000 // COUNT(*) AS BIGINT) AS overlap_share_e6
FROM o GROUP BY k ORDER BY l_suppkey
""",
)
def q331_shipping_overlap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.interval import overlap_audit

    lineitem = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("line_id"),
        "l_shipdate",
        F.expr(
            "date_add(CAST(l_shipdate AS DATE), "
            "CAST((l_orderkey * 8 + l_linenumber) % 14 + 2 AS INT))"
        ).alias("window_end"),
    )
    return overlap_audit(
        lineitem,
        key_col="l_suppkey",
        start_col="l_shipdate",
        end_col="window_end",
        id_col="line_id",
    ).orderBy("l_suppkey")


# --------------------------------------------------------------------------
# q332 — Three-sigma revenue-day flags (L-qa8): the daily-close
# anomaly screen with NO doubles anywhere — a day flags iff
# (N·x − S)² > 9·(N·SS − S²), the textbook |x−μ| > 3σ multiplied
# through by N² so means and variances never materialize
# (quality.three_sigma_flags, DECIMAL(38,0)/HUGEINT). 13 days flag at
# sf0.01 and 3 at sf0.1 — the law bites on real fixture variance,
# not a synthetic plant. The oracle replays the exact inequality in
# HUGEINT. Scale: one keyed agg to the bounded day grid, one 1-row
# stats aggregate broadcast back over it. Operator:
# quality.three_sigma_flags.
# --------------------------------------------------------------------------
@register(
    "q332_revenue_day_anomalies",
    oracle="""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS revenue_cents
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(revenue_cents) AS HUGEINT) AS sm,
         SUM(CAST(revenue_cents AS HUGEINT) * revenue_cents) AS ss
  FROM d
)
SELECT day, CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST(s.n AS BIGINT) AS n_labels,
       CASE WHEN s.n * revenue_cents > s.sm THEN 'high' ELSE 'low' END
         AS direction
FROM d CROSS JOIN s
WHERE (s.n * revenue_cents - s.sm) * (s.n * revenue_cents - s.sm)
      > 9 * (s.n * ss - sm * sm)
ORDER BY day
""",
)
def q332_revenue_day_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import three_sigma_flags

    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )
        ).alias("revenue_cents")
    )
    return three_sigma_flags(daily, "day", "revenue_cents").orderBy("day")


# --------------------------------------------------------------------------
# q333 — Top-3 customers per nation with exact OTHERS rollup
# (L-fin22): the revenue-review leaderboard — per nation the three
# largest customers (ties to the lowest key, deterministic) plus ONE
# remainder row carrying the exact sum and count below the cut, so
# every nation's total ties out by construction. The rank window runs
# over the REDUCED (nation, customer) totals — the fact scan is the
# keyed agg, the window sorts only aggregates. Oracle replays the
# rank, the cut and the rollup. Operator: behavior.topk_with_others.
# --------------------------------------------------------------------------
@register(
    "q333_top_customers_leaderboard",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation, o.o_custkey AS cust,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
rk AS (
  SELECT nation, cust, v,
         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY v DESC, cust) AS r
  FROM rev
),
top AS (
  SELECT nation, CAST(r AS BIGINT) AS rank, CAST(cust AS VARCHAR) AS entity,
         CAST(v AS BIGINT) AS value_cents, CAST(1 AS BIGINT) AS n_entities
  FROM rk WHERE r <= 3
),
rest AS (
  SELECT nation, CAST(4 AS BIGINT) AS rank, 'OTHERS' AS entity,
         CAST(SUM(v) AS BIGINT) AS value_cents,
         CAST(COUNT(*) AS BIGINT) AS n_entities
  FROM rk WHERE r > 3 GROUP BY nation
)
SELECT * FROM top UNION ALL SELECT * FROM rest ORDER BY nation, rank
""",
)
def q333_top_customers_leaderboard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import topk_with_others

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (
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
        .groupBy("nation", F.col("o_custkey").alias("cust"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).alias("v")
        )
    )
    return topk_with_others(
        rev, group_col="nation", entity_col="cust", value_col="v", k=3
    ).orderBy("nation", "rank")


# --------------------------------------------------------------------------
# q334 — Repeat-purchase rate by brand (L-beh11): of the (customer,
# part) pairs with any purchase, how many bought the SAME part again
# within 30 days — the replenishment signal merchandisers rank
# categories by; a pair counts once however many quick repeats it has
# (repeaters, not repeats). One lag window on the (customer, part)
# composite key (per-pair fan = that pair's history — behavior-
# bounded, not corpus-bounded) + two keyed aggs; rate exact at e6.
# The oracle replays the lag, the 30-day test, the pair collapse and
# the ratio. Operator: behavior.repeat_purchase_rate.
# --------------------------------------------------------------------------
@register(
    "q334_repeat_purchase_rate",
    oracle="""
WITH p AS (
  SELECT o.o_custkey AS e, l.l_partkey AS i, pt.p_brand AS g,
         CAST(l.l_shipdate AS DATE) AS d
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part pt ON pt.p_partkey = l.l_partkey
),
lg AS (
  SELECT e, i, g, d,
         d - LAG(d) OVER (PARTITION BY e, i ORDER BY d) AS diff
  FROM p
),
pr AS (
  SELECT e, i, g, MAX(CASE WHEN diff <= 30 THEN 1 ELSE 0 END) AS hr
  FROM lg GROUP BY 1, 2, 3
)
SELECT g AS brand, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(hr) AS BIGINT) AS n_repeat_pairs,
       CAST(SUM(hr) * 1000000 // COUNT(*) AS BIGINT) AS repeat_rate_e6
FROM pr GROUP BY g ORDER BY brand
""",
)
def q334_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import (
        repeat_purchase_rate,
    )

    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    purchases = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(
            part.select("p_partkey", F.col("p_brand").alias("brand")),
            lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .select("o_custkey", "l_partkey", "brand", "l_shipdate")
    )
    return repeat_purchase_rate(
        purchases,
        entity_col="o_custkey",
        item_col="l_partkey",
        date_col="l_shipdate",
        group_col="brand",
    ).orderBy("brand")


# --------------------------------------------------------------------------
# q335 — Intraday price-consistency audit (L-qa9): the pricing-
# control screen — the same part sold at materially different unit
# prices on the same day is a discounting-discipline (or data-entry)
# violation. Unit price exact at e6 via e6_floor_ratio(ext_cents,
# qty); per (part, day) the spread max − min; violation when the
# spread exceeds 10% (100000 e6). Reported per brand with the worst
# spread. Composition query: e6_floor_ratio + two keyed aggs (the
# (part, day) grid, then the bounded brand grid) — no window, no
# join beyond the part dimension.
# --------------------------------------------------------------------------
@register(
    "q335_price_consistency_audit",
    oracle="""
WITH u AS (
  SELECT l_partkey AS p, pt.p_brand AS g, CAST(l_shipdate AS DATE) AS d,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * 1000000 // CAST(l_quantity AS BIGINT) AS unit_e6
  FROM lineitem JOIN part pt ON pt.p_partkey = l_partkey
),
pd AS (
  SELECT p, g, d, MAX(unit_e6) - MIN(unit_e6) AS spread
  FROM u GROUP BY 1, 2, 3
)
SELECT g AS brand, CAST(COUNT(*) AS BIGINT) AS n_part_days,
       CAST(SUM(CASE WHEN spread > 100000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(MAX(spread) AS BIGINT) AS max_spread_e6,
       CAST(SUM(CASE WHEN spread > 100000 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS violation_share_e6
FROM pd GROUP BY g ORDER BY brand
""",
)
def q335_price_consistency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    u = lineitem.join(
        part.select("p_partkey", F.col("p_brand").alias("brand")),
        lineitem["l_partkey"] == F.col("p_partkey"),
    ).select(
        "l_partkey",
        "brand",
        F.to_date("l_shipdate").alias("d"),
        e6_floor_ratio(
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)"
            ),
            F.col("l_quantity").cast("bigint"),
        ).alias("unit_e6"),
    )
    pd_grid = u.groupBy("l_partkey", "brand", "d").agg(
        (F.max("unit_e6") - F.min("unit_e6")).alias("spread")
    )
    return (
        pd_grid.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_part_days"),
            F.sum(F.when(F.col("spread") > 100000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
            F.max("spread").cast("bigint").alias("max_spread_e6"),
        )
        .withColumn(
            "violation_share_e6",
            e6_floor_ratio(F.col("n_violations"), F.col("n_part_days")),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# q336 — Business-day fulfillment SLA (L-erp29): per order priority,
# the exact Mon–Fri business days from order to EACH line's ship date
# — the SLA metric ops contracts are written in — with no calendar
# table, no explode, no UDF: a closed form over epoch days
# (functions.business_days_between — cum(e) = 5·(i div 7) +
# least(i % 7, 5) on the Monday-aligned index i = epoch_day + 3;
# brute-force-pinned over 200 random ranges in the unit suite).
# Output per priority: lines, exact Σ business days, mean at e6, and
# the share breaching a 10-business-day SLA. Scale: one fact
# equi-join + pure map + one keyed agg over 5 cells. The oracle
# replays the closed form on d − DATE '1970-01-01'.
# --------------------------------------------------------------------------
@register(
    "q336_business_day_sla",
    oracle="""
WITH l AS (
  SELECT o.o_orderpriority AS prio,
         CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' + 3 AS ia,
         CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' + 3 AS ib
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
bd AS (
  SELECT prio,
         (5 * (ib // 7) + LEAST(ib % 7, 5))
           - (5 * (ia // 7) + LEAST(ia % 7, 5)) AS nbd
  FROM l
)
SELECT prio AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(nbd) AS BIGINT) AS total_bdays,
       CAST(SUM(nbd) * 1000000 // COUNT(*) AS BIGINT) AS mean_bdays_e6,
       CAST(SUM(CASE WHEN nbd > 10 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS breach_share_e6
FROM bd GROUP BY prio ORDER BY priority
""",
)
def q336_business_day_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import (
        business_days_between,
        e6_floor_ratio,
    )

    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    j = lineitem.join(
        orders.select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("odt"),
        ),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "priority",
        business_days_between(
            F.col("odt"), F.to_date("l_shipdate")
        ).alias("nbd"),
    )
    g = j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("nbd").cast("bigint").alias("total_bdays"),
        F.sum(F.when(F.col("nbd") > 10, 1).otherwise(0))
        .cast("bigint")
        .alias("_breach"),
    )
    return g.select(
        "priority",
        "n_lines",
        "total_bdays",
        e6_floor_ratio(F.col("total_bdays"), F.col("n_lines")).alias(
            "mean_bdays_e6"
        ),
        e6_floor_ratio(F.col("_breach"), F.col("n_lines")).alias(
            "breach_share_e6"
        ),
    ).orderBy("priority")


# --------------------------------------------------------------------------
# q337 — Slow-mover screen (L-erp30): per brand, parts whose LAST
# sale is more than 180 days before the data-derived as-of (day after
# the newest shipment corpus-wide) — the dead-stock candidate list
# every inventory review opens with, plus how recent each brand's
# assortment is on average. One max-agg per part (map-side
# combinable), a 1-row broadcast as-of, one bounded brand agg. The
# oracle replays the as-of, the staleness test and the ratios.
# --------------------------------------------------------------------------
@register(
    "q337_slow_mover_screen",
    oracle="""
WITH asof_d AS (
  SELECT CAST(max(CAST(l_shipdate AS DATE)) + INTERVAL 1 DAY AS DATE) AS a
  FROM lineitem
),
lastsale AS (
  SELECT l_partkey AS p, pt.p_brand AS g,
         MAX(CAST(l_shipdate AS DATE)) AS last_d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part pt ON pt.p_partkey = l_partkey
  GROUP BY 1, 2
),
staged AS (
  SELECT g, qty, asof_d.a - last_d AS age FROM lastsale CROSS JOIN asof_d
)
SELECT g AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN age > 180 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stale,
       CAST(SUM(CASE WHEN age > 180 THEN qty ELSE 0 END) AS BIGINT)
         AS stale_qty,
       CAST(SUM(CASE WHEN age > 180 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS stale_share_e6,
       CAST(MAX(age) AS BIGINT) AS oldest_age_days
FROM staged GROUP BY g ORDER BY brand
""",
)
def q337_slow_mover_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    asof = lineitem.agg(
        F.date_add(F.max(F.to_date("l_shipdate")), 1).alias("_asof")
    )
    lastsale = (
        lineitem.join(
            part.select("p_partkey", F.col("p_brand").alias("brand")),
            lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "brand")
        .agg(
            F.max(F.to_date("l_shipdate")).alias("last_d"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )
    staged = lastsale.crossJoin(F.broadcast(asof)).withColumn(
        "age", F.datediff(F.col("_asof"), F.col("last_d"))
    )
    g = staged.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.when(F.col("age") > 180, 1).otherwise(0))
        .cast("bigint")
        .alias("n_stale"),
        F.sum(F.when(F.col("age") > 180, F.col("qty")).otherwise(0))
        .cast("bigint")
        .alias("stale_qty"),
        F.max("age").cast("bigint").alias("oldest_age_days"),
    )
    return g.select(
        "brand",
        "n_parts",
        "n_stale",
        "stale_qty",
        e6_floor_ratio(F.col("n_stale"), F.col("n_parts")).alias(
            "stale_share_e6"
        ),
        "oldest_age_days",
    ).orderBy("brand")


# --------------------------------------------------------------------------
# q338 — Newsvendor order-up-to levels (L-erp31): the service-level
# stocking rule — per part, the smallest stock level whose empirical
# in-stock probability reaches the critical ratio cu/(cu+co) (3:1
# here → 75% service), decided by the EXACT integer rank rule
# cum·(cu+co) ≥ cu·n over the per-part demand histogram (the q316
# histogram-order-statistic discipline; no division, no doubles),
# summarized per brand. Scale: one keyed histogram agg + a cumulative
# window over the bounded per-part distinct-quantity grid + the
# bounded brand agg. Operator: history.newsvendor_level.
# --------------------------------------------------------------------------
@register(
    "q338_newsvendor_stock_levels",
    oracle="""
WITH h AS (
  SELECT l_partkey AS p, CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
st AS (
  SELECT p, q,
         SUM(c) OVER (PARTITION BY p ORDER BY q) AS cm,
         SUM(c) OVER (PARTITION BY p) AS n
  FROM h
),
pick AS (
  SELECT p, CAST(MIN(q) AS BIGINT) AS s_level,
         CAST(MIN(n) AS BIGINT) AS n_obs
  FROM st WHERE cm * 4 >= 3 * n GROUP BY p
),
j AS (
  SELECT pick.s_level, pick.n_obs, pt.p_brand AS g
  FROM pick JOIN part pt ON pt.p_partkey = pick.p
)
SELECT g AS brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(s_level) AS BIGINT) AS total_stock_units,
       CAST(MAX(s_level) AS BIGINT) AS max_stock_units,
       CAST(SUM(n_obs) AS BIGINT) AS n_demand_obs
FROM j GROUP BY g ORDER BY brand
""",
)
def q338_newsvendor_stock_levels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.history import newsvendor_level

    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    levels = newsvendor_level(
        lineitem, key_col="l_partkey", qty_col="l_quantity"
    )
    j = levels.join(
        part.select("p_partkey", F.col("p_brand").alias("brand")),
        levels["l_partkey"] == F.col("p_partkey"),
    )
    return (
        j.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("s_level").cast("bigint").alias("total_stock_units"),
            F.max("s_level").cast("bigint").alias("max_stock_units"),
            F.sum("n_obs").cast("bigint").alias("n_demand_obs"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# q339 — Funnel time-to-convert percentiles (L-beh12): how long the
# view → click → purchase journey takes for users who complete it —
# exact p50/p90/max over the conversion latency in whole seconds,
# via the q031 funnel chain composed with quantiles.exact_quantiles
# (type-1 rank rule on the latency histogram; latency values are
# session-scale small integers by NATURE — the q316 boundedness
# argument — so the global histogram grid is behavior-bounded, not
# corpus-bounded). Output one row per quantile with the converted
# count alongside. Scale: the funnel's keyed min-agg chain + one
# histogram agg + the bounded-grid prefix scan. Operators:
# behavior.funnel_steps + quantiles.exact_quantiles.
# --------------------------------------------------------------------------
@register(
    "q339_funnel_latency_quantiles",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY e.user_id
),
lat AS (
  SELECT (p.t3 - v.t1) // 1000000 AS s FROM p JOIN v USING (user_id)
),
counts AS (SELECT s, COUNT(*) AS c FROM lat GROUP BY s),
cum AS (SELECT s, SUM(c) OVER (ORDER BY s) AS cm FROM counts),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
qs AS (SELECT CAST(unnest([0.5, 0.9, 1.0]) AS DOUBLE) AS q)
SELECT qs.q, CAST(MIN(cum.s) AS BIGINT) AS latency_s,
       CAST(tot.n AS BIGINT) AS n_converted
FROM qs CROSS JOIN tot
JOIN cum ON CAST(cum.cm AS DOUBLE) / CAST(tot.n AS DOUBLE) >= qs.q
GROUP BY qs.q, tot.n ORDER BY qs.q
""",
)
def q339_funnel_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import funnel_steps
    from cubicerp_client_etl_spark.operators.quantiles import exact_quantiles

    events = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    per_user = funnel_steps(
        events, "user_id", "t", "event_type", ["view", "click", "purchase"]
    )
    lat = per_user.where(F.col("t3_us").isNotNull()).select(
        F.expr("(t3_us - t1_us) div 1000000").alias("latency_s")
    )
    n = lat.agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    qv = exact_quantiles(lat, "latency_s", [0.5, 0.9, 1.0], out_col="latency_s")
    return (
        qv.crossJoin(F.broadcast(n))
        .select(
            "q",
            F.col("latency_s").cast("bigint").alias("latency_s"),
            "n_converted",
        )
        .orderBy("q")
    )


# --------------------------------------------------------------------------
# q340 — Supplier Pareto frontier (L-qa10): the two-criteria sourcing
# shortlist — suppliers not dominated on (average unit price, return
# rate), both exact at e6. The skyline law runs in ONE scan: in the
# (cost, rate, id) total order a supplier is on the frontier iff its
# rate is strictly below the running min of all predecessors — and
# that scan is the TWO-PHASE distributed prefix-min
# (prefix.prefix_min_strict), not a single-partition global window,
# so the screen survives a 10⁷-supplier dimension. The oracle replays
# the same law with a plain global window (fine at oracle scale).
# Operators: quality.skyline_screen + prefix.prefix_min_strict.
# --------------------------------------------------------------------------
@register(
    "q340_supplier_pareto_frontier",
    oracle="""
WITH s AS (
  SELECT l_suppkey AS sk,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS ext,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM lineitem GROUP BY 1
),
c AS (
  SELECT sk, CAST(ext * 1000000 // qty AS BIGINT) AS cost_e6,
         CAST(r * 1000000 // n AS BIGINT) AS rate_e6
  FROM s
),
m AS (
  SELECT sk, cost_e6, rate_e6,
         MIN(rate_e6) OVER (ORDER BY cost_e6, rate_e6, sk
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm
  FROM c
)
SELECT CAST(sk AS BIGINT) AS l_suppkey, cost_e6, rate_e6
FROM m WHERE pm IS NULL OR rate_e6 < pm
ORDER BY cost_e6, rate_e6, l_suppkey
""",
)
def q340_supplier_pareto_frontier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio
    from cubicerp_client_etl_spark.operators.quality import skyline_screen

    lineitem = load(spark, sf_dir, "lineitem")
    crit = (
        lineitem.groupBy(F.col("l_suppkey"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).alias("_ext"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("_qty"),
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("_r"),
        )
        .select(
            "l_suppkey",
            e6_floor_ratio(F.col("_ext"), F.col("_qty")).alias("cost_e6"),
            e6_floor_ratio(F.col("_r"), F.col("_n")).alias("rate_e6"),
        )
    )
    out = skyline_screen(crit, "cost_e6", "rate_e6", "l_suppkey")
    return (
        out.where(F.col("is_frontier"))
        .select(
            F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
            "cost_e6",
            "rate_e6",
        )
        .orderBy("cost_e6", "rate_e6", "l_suppkey")
    )
