"""TPC-H-derived query wave (SURVEY §2 Del surface, fourth wave).

The reference forwards all of this to its source database as opaque
``sql_query`` text (cubicerpetl/cubicerpetl.py:299-302); the engine owns
it natively. These are the classic TPC-H shapes adapted to the fixture
schema (no partsupp, no commit/receipt dates, no phone — substitutes
noted per query): multi-way star joins with top-k, EXISTS/NOT-EXISTS
decorrelation, two-level aggregation, disjunctive pushdown predicates,
HAVING-subquery semi-joins, and scalar-subquery thresholds.

Scale notes inline. Shared discipline: money math routed through
DECIMAL(18,4) (see functions.py) so every revenue sum is
order-independent and hash-identical to the DuckDB oracle; dimension
tables (nation/supplier/customer/part — ≤20k rows at sf0.1, and fixed
~1e6 rows even at 100 TB lineitem scale) are explicitly broadcast so no
query here shuffles anything but lineitem/orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import MONEY, dec, dec2, dsum, dsum_disc_price
from cubicerp_client_etl_spark.queries import register


def _dp() -> F.Column:
    """Exact-decimal discounted price l_extendedprice*(1-l_discount)."""
    return (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(MONEY)


_DP_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)


# --------------------------------------------------------------------------
# q080 — TPC-H Q3 (shipping priority): 3-way join, grouped revenue, top 10.
# o_shippriority doesn't exist in the fixture → o_orderpriority.
# Scale: customer is broadcast (fixed-size dim); the orders⋈lineitem join
# shuffles on orderkey once; TakeOrderedAndProject keeps the top-k merge
# on the driver at k rows, not a global sort.
# --------------------------------------------------------------------------
@register(
    "q080_tpch_q3_shipping_priority",
    headline=True,
    oracle=f"""
SELECT l.l_orderkey,
       CAST(SUM({_DP_SQL}) AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q080_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_dp()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q084 (birth q081) — TPC-H Q4 (order priority checking): EXISTS with a correlated
# non-equi predicate, decorrelated to a left-semi join.
# l_commitdate/l_receiptdate don't exist → "some line shipped >30 days
# after the order date" carries the same correlated-interval shape.
# Scale: semi join shuffles both sides on orderkey once; the count-by-
# priority agg is 5 groups — map-side partials collapse it.
# --------------------------------------------------------------------------
@register(
    "q084_tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""",
)
def q084_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# q032 (birth q082) — TPC-H Q10 (returned items): 4-way join, revenue per customer over
# a quarter of returned lines, top 20.
# Scale: nation and customer broadcast; one shuffle on orderkey for
# orders⋈lineitem, one on custkey for the agg; top-k never global-sorts.
# --------------------------------------------------------------------------
@register(
    "q032_tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       CAST(SUM({_DP_SQL}) AS DOUBLE) AS revenue,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q032_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dp()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q035 (birth q083) — TPC-H Q13 (customer distribution): left outer join with a
# compound ON condition, then a two-level aggregation (orders per
# customer → customers per order-count).
# Scale: first agg shuffles on custkey (high cardinality — the real
# shuffle); second agg's key space is tiny and collapses map-side.
# --------------------------------------------------------------------------
@register(
    "q150_tpch_q13_cust_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
)
def q150_tpch_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT")
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q036 (birth q084) — TPC-H Q18 (large-volume customers): HAVING-subquery turned
# left-semi join against an aggregated key set, then a 3-way join + agg.
# Scale: the qualifying-orderkey set is tiny (p99 filter) → Spark
# broadcasts it for the semi join; lineitem is shuffled once on orderkey
# for the inner agg; AQE converts the join to broadcast at runtime.
# --------------------------------------------------------------------------
@register(
    "q182_tpch_q18_large_volume",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
)
def q182_tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q038 (birth q085) — TPC-H Q19 (discounted revenue, disjunctive predicates): OR of
# conjunct blocks spanning both join sides. Catalyst extracts the common
# join key and pushes each side's derivable disjuncts into the scans.
# Scale: part broadcasts; lineitem never shuffles at all.
# --------------------------------------------------------------------------
@register(
    "q038_tpch_q19_disjunctive",
    oracle=f"""
SELECT CAST(SUM({_DP_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q038_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    blocks = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#24")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(blocks).agg(F.sum(_dp()).cast("double").alias("revenue"))


# --------------------------------------------------------------------------
# q086 — TPC-H Q22 (global sales opportunity): scalar-subquery threshold +
# NOT EXISTS anti join. The fixture has no phone country code → group by
# c_nationkey; "no orders at all" is empty in the fixture → "no URGENT
# orders", same anti-join shape.
# Scale: the scalar average is one tiny aggregate broadcast to every
# partition (no driver collect); the anti join shuffles on custkey once.
# Threshold avg is decimal-routed so the cutoff is bit-identical across
# engines — a ULP-different average would flip borderline customers.
# --------------------------------------------------------------------------
@register(
    "q086_tpch_q22_global_sales",
    oracle="""
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                            / COUNT(*)
                     FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
""",
)
def q086_tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("cutoff"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q020 (birth q087) — TPC-H Q7 (volume shipping): supplier-nation × customer-nation
# pair revenue by ship year. Both nation lookups are the same broadcast
# dim joined twice under different aliases.
# Scale: the only real shuffles are lineitem⋈orders on orderkey and the
# final agg on (nation, nation, year) — a few hundred groups.
# --------------------------------------------------------------------------
@register(
    "q306_tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l.l_shipdate) AS l_year,
       CAST(SUM({_DP_SQL}) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l.l_shipdate)
""",
)
def q306_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_dp()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# q039 (birth q088) — TPC-H Q11-ish (important supplier share): per-supplier revenue
# kept only when it exceeds a fraction of the global total (no partsupp
# table → lineitem extendedprice stands in for stock value).
# Scale: one shuffle on l_suppkey; the global total is a 1-row broadcast.
# Both sums decimal-routed so threshold comparison is exact.
# --------------------------------------------------------------------------
@register(
    "q039_tpch_q11_supplier_share",
    oracle="""
WITH sup AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
  FROM lineitem GROUP BY l_suppkey
), tot AS (
  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
         COUNT(DISTINCT l_suppkey) AS nsupp
  FROM lineitem
)
SELECT s.l_suppkey, s.value
FROM sup s, tot t
WHERE s.value > 1.1 * t.total / t.nsupp
""",
)
def q039_tpch_q11_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = li.groupBy("l_suppkey").agg(dsum("l_extendedprice").alias("value"))
    tot = li.agg(
        dsum("l_extendedprice").alias("total"),
        F.countDistinct("l_suppkey").alias("nsupp"),
    )
    return (
        sup.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 1.1 * F.col("total") / F.col("nsupp"))
        .select("l_suppkey", "value")
    )


# --------------------------------------------------------------------------
# q044 (birth q089) — TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
# the max-revenue supplier(s) via a scalar MAX subquery. Revenue is
# exact decimal cast to double, so the MAX-equality predicate matches
# identically in both engines.
# Scale: one shuffle on suppkey; the MAX is a 1-row broadcast back onto
# a 100-ish-row aggregate — nothing global-sorts.
# --------------------------------------------------------------------------
@register(
    "q044_tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({_DP_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q044_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_dp()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# q091 — statistics pack from exact moments (D3 extension). Built-in
# STDDEV/CORR are accumulation-order-dependent in double (Welford /
# pairwise merges differ per engine and per partitioning), so they can
# never hash-match across engines. Instead: accumulate the raw moments
# (n, Σx, Σx², Σy, Σy², Σxy) in exact DECIMAL — order-independent — and
# assemble variance/correlation from them with IEEE double arithmetic,
# which is bit-identical everywhere. Same trick both engines.
# Scale: one partial-agg shuffle of 6 decimal cells per group — cheaper
# than Welford merging, and deterministic under any partitioning.
# --------------------------------------------------------------------------
@register(
    "q091_stats_pack",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
       ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       ROUND((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
FROM m
""",
)
def q091_stats_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(19,4)")
    y = F.col("l_extendedprice").cast("decimal(19,4)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return m.select(
        "l_returnflag",
        "n",
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("var_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("covar_qty_price"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# q092 — daily-active-users with week-over-week movement (events
# analytics): date_trunc bucketing, COUNT DISTINCT per day, then lag-7
# self-comparison via window. The distinct-per-day is the real shuffle;
# the lag window rides the same day-ordered frame.
# Scale: two shuffles (day⨯user dedup, then day) — at 100 TB the first
# becomes the HLL sketch path (q077) with identical query shape.
# --------------------------------------------------------------------------
@register(
    "q092_dau_wow",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(DISTINCT user_id) AS dau,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, dau, n_events,
       lag(dau, 7) OVER (ORDER BY day) AS dau_prev_week,
       ROUND(CAST(dau - lag(dau, 7) OVER (ORDER BY day) AS DOUBLE)
             / lag(dau, 7) OVER (ORDER BY day), 6) AS wow_change
FROM d
""",
)
def q092_dau_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("dau"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = W.orderBy("day")
    prev = F.lag("dau", 7).over(w)
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "n_events",
        prev.alias("dau_prev_week"),
        F.round((F.col("dau") - prev).cast("double") / prev, 6).alias("wow_change"),
    )
