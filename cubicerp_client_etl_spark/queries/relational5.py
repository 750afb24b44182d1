"""TPC-H-derived query wave, fifth wave (SURVEY §2 Del surface).

Completes the TPC-H shape coverage begun in relational4.py: Q5/Q6/Q8/
Q9/Q12/Q14/Q16/Q17/Q20/Q21 adapted to the fixture schema (no partsupp,
no ship/commit/receipt dates beyond l_shipdate, no shipmode — the
substitutions are noted per query). The reference forwards all of these
to its source database as opaque ``sql_query`` text
(cubicerpetl/cubicerpetl.py:299-302); the engine owns them natively.

Shared scale discipline (same as relational4): money through
DECIMAL(18,4) so sums are order-independent and hash-identical to
DuckDB; fixed-size dimensions (region/nation/supplier/part — bounded
even at 100 TB lineitem) broadcast explicitly so the only shuffles are
on lineitem/orders keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import MONEY, dec2, dsum_disc_price
from cubicerp_client_etl_spark.queries import register


_DP_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)


# --------------------------------------------------------------------------
# q085 (birth q093) — TPC-H Q5 (local supplier volume): 6-way join constrained to
# customer and supplier in the same nation, region-filtered, revenue per
# nation. Scale: region/nation/supplier broadcast (bounded dims); the
# customer⋈orders and orders⋈lineitem joins shuffle on their keys once
# each; the same-nation constraint rides the join output as a filter, so
# no extra shuffle.
# --------------------------------------------------------------------------
@register(
    "q085_tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name, CAST(SUM({_DP_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q085_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dp = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(MONEY)
    return (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(li, F.col("l_orderkey") == o.o_orderkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(dp).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# q021 (birth q094) — TPC-H Q6 (forecast revenue change): single-table scan-agg with a
# tight 3-predicate filter; the whole query is one map-side partial agg
# plus a 1-row final — the minimal-shuffle shape. All three predicates
# push down to the Parquet scan.
# --------------------------------------------------------------------------
@register(
    "q307_tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q307_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec2("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# q095 — TPC-H Q8 (national market share): revenue share of one supplier
# nation within a region's PROMO-part imports, per order year. The
# numerator is a conditional sum over the same joined frame — one pass,
# no second join. Scale: part is filtered before the join and broadcast;
# nation×2/region broadcast; only orders⋈lineitem⋈customer shuffle.
# --------------------------------------------------------------------------
@register(
    "q095_tpch_q8_market_share",
    oracle=f"""
WITH flat AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         {_DP_SQL} AS dp,
         sn.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'PROMO' AND r.r_name = 'AMERICA'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN dp
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(dp) AS DOUBLE), 6) AS mkt_share
FROM flat GROUP BY o_year
""",
)
def q095_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("supp_nation")
    )
    dp = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(MONEY)
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            dp.alias("dp"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(MONEY)
    return flat.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("dp")).otherwise(zero))
            .cast("double")
            / F.sum("dp").cast("double"),
            6,
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# q260 (birth q096) — TPC-H Q9 (product-type profit): no partsupp/ps_supplycost in the
# fixture, so cost := 0.6 × p_retailprice × l_quantity (the 0.6 factor
# keeps profits signed both ways). Decimal discipline: qty and retail
# are exact at scale 2, their product exact at scale 4; ×0.6 yields a
# scale-5 digit that is always even (6·x mod 10 ∈ {0,2,4,6,8}), so the
# cast back to scale 4 never hits a rounding tie — bit-identical in both
# engines. Scale: part/supplier/nation broadcast; profit aggregates per
# (nation, year) after one orders⋈lineitem shuffle.
# --------------------------------------------------------------------------
@register(
    "q260_tpch_q9_product_profit",
    oracle=f"""
SELECT sn.n_name AS nation,
       EXTRACT(year FROM o.o_orderdate) AS o_year,
       CAST(SUM(CAST({_DP_SQL}
            - CAST(CAST(CAST(l.l_quantity AS DECIMAL(18,2))
                        * CAST(p.p_retailprice AS DECIMAL(18,2)) AS DECIMAL(18,4))
                   * CAST(0.6 AS DECIMAL(2,1)) AS DECIMAL(18,4))
            AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%o%'
GROUP BY nation, o_year
""",
)
def q260_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%o%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    dp = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(MONEY)
    cost = (
        (dec2("l_quantity") * dec2("p_retailprice")).cast(MONEY)
        * F.lit(0.6).cast("decimal(2,1)")
    ).cast(MONEY)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (dp - cost).cast(MONEY).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# q097 — TPC-H Q12 (shipping classes / priority counts): no l_shipmode in
# the fixture → classify by l_returnflag instead; "late" := shipped more
# than 90 days after the order date. Conditional-count aggregation over
# one orders⋈lineitem join; integer outputs, no float discipline needed.
# --------------------------------------------------------------------------
@register(
    "q097_tpch_q12_late_shipping",
    oracle="""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
""",
)
def q097_tpch_q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q098 — TPC-H Q14 (promo revenue share): conditional-sum ratio over a
# part⋈lineitem join for one ship month. Part is broadcast; single
# lineitem pass.
# --------------------------------------------------------------------------
@register(
    "q098_tpch_q14_promo_revenue",
    oracle=f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DP_SQL}
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({_DP_SQL}) AS DOUBLE), 6) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
  AND l.l_shipdate < TIMESTAMP '1996-10-01'
""",
)
def q098_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    dp = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(MONEY)
    zero = F.lit(0).cast(MONEY)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(zero)).cast("double")
            / F.sum(dp).cast("double"),
            6,
        ).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# q099 — TPC-H Q16 (supplier count by part attributes): distinct
# suppliers that shipped each (brand, type, size) bucket, excluding one
# brand and suppliers in deficit. partsupp is replaced by the observed
# supplier⨯part pairs in lineitem. The NOT IN subquery becomes a
# broadcast anti-join. Scale: the distinct-count shuffles on the group
# key after a map-side partial distinct; part broadcast.
# --------------------------------------------------------------------------
@register(
    "q099_tpch_q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 2, 3, 4, 5)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q099_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = load(spark, sf_dir, "lineitem")
    deficit = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(deficit),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q023 (birth q100) — TPC-H Q17 (small-quantity-order revenue): lineitems of one
# brand whose quantity is under 20% of that part's average quantity.
# The correlated scalar subquery decorrelates into a per-part aggregate
# joined back. Float discipline: l_quantity is integral, so its double
# SUM is exact (< 2^53) under any accumulation order; the avg division
# and 0.2× threshold are then single IEEE ops — deterministic in both
# engines. Scale: the per-part avg aggregates lineitem once on partkey;
# the join back is on the same key (no extra shuffle under AQE reuse);
# part is broadcast.
# --------------------------------------------------------------------------
@register(
    "q127_tpch_q17_small_qty",
    oracle="""
WITH pa AS (
  SELECT l_partkey, SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.2 * pa.avg_qty
""",
)
def q127_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# q101 — TPC-H Q20 (excess-supply suppliers): suppliers in one nation
# that shipped more than 50 units of some '%7%' part in 1996. The
# grouped-HAVING subquery becomes a semi-join against a per
# (suppkey, partkey) aggregate. Scale: the aggregate shuffles lineitem
# on the compound key; the outer side is the tiny supplier dim, so the
# semi-join broadcasts the *outer* relation's build side naturally.
# --------------------------------------------------------------------------
@register(
    "q101_tpch_q20_excess_supply",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_nationkey = 3
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%o%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(l.l_quantity) > 50
  )
""",
)
def q101_tpch_q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%o%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        qualified, s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# q024 (birth q102) — TPC-H Q21 (suppliers who kept orders waiting): for finalized
# orders, count per supplier the late lineitems (shipped >90 days after
# order) where some other supplier contributed to the same order but no
# other supplier was also late. The EXISTS becomes a semi-join and the
# NOT EXISTS an anti-join, both against order-level supplier sets
# derived from lineitem. Scale: three passes over lineitem, all
# shuffling on l_orderkey — AQE reuses the exchange; supplier/nation
# broadcast.
# --------------------------------------------------------------------------
@register(
    "q157_tpch_q21_waiting_suppliers",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE s.s_nationkey = 1
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s.s_name
""",
)
def q157_tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 1)
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    l1 = late.alias("l1")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("o2"))
            & (F.col("l1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("o3"))
            & (F.col("l1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# q103 — pivot (reshape, D-family extension): revenue matrix of
# returnflag × linestatus via Spark's native groupBy().pivot() with the
# value set pinned (pinning skips the extra distinct-values job AND
# fixes the column order). Oracle = conditional aggregation, which is
# exactly the plan Spark compiles a pivot into — one shuffle.
# --------------------------------------------------------------------------
@register(
    "q103_pivot_revenue_matrix",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {_DP_SQL}
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS f,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {_DP_SQL}
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS o
FROM lineitem GROUP BY l_returnflag
""",
)
def q103_pivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum_disc_price("l_extendedprice", "l_discount"))
    )
    return piv.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("f"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("o"),
    )


# --------------------------------------------------------------------------
# q104 — unpivot (reshape): melt the per-part price/size attributes into
# (part, attribute, value) long form with Spark's native unpivot
# (SQL UNPIVOT / melt). Narrow, no shuffle — pure row generation.
# --------------------------------------------------------------------------
@register(
    "q104_unpivot_part_attrs",
    oracle="""
SELECT p_partkey, attr, val FROM (
  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
  UNION ALL
  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
) WHERE p_partkey <= 100
""",
)
def q104_unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("retailprice"),
            F.col("p_size").cast("double").alias("size"),
        )
    )
    return p.unpivot("p_partkey", ["retailprice", "size"], "attr", "val")


# --------------------------------------------------------------------------
# q296 (birth q105) — TPC-H Q2 (minimum-cost supplier): no partsupp/ps_supplycost in
# the fixture, so unit cost := MIN(l_extendedprice / l_quantity)
# observed per (supplier, part) in lineitem; for each STANDARD part,
# keep the EUROPE supplier(s) achieving the per-part minimum (ties kept,
# as in Q2). The correlated MIN subquery becomes a window-min + equality
# filter. Float discipline: each unit cost is one IEEE division and MIN
# is order-independent, so both engines compare identical doubles.
# Output cost is floor-scaled to integer micros: ROUND(double, n) is
# NOT portable (engines disagree on decimal-tie direction — caught by
# the sf0.1 sweep), while floor of an IEEE product is bit-determined.
# Scale: one (partkey, suppkey) aggregation shuffle over lineitem, then
# a partkey-window over the already-reduced (≤ parts × suppliers) frame;
# supplier/nation/region broadcast.
# --------------------------------------------------------------------------
@register(
    "q296_tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT c.l_partkey, c.l_suppkey, c.unit_cost, s.s_name, s.s_acctbal, n.n_name
  FROM cost c
  JOIN supplier s ON s.s_suppkey = c.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_name,
       CAST(floor(eu.unit_cost * 1000000) AS BIGINT) AS unit_cost_micros
FROM eu
JOIN part p ON p.p_partkey = eu.l_partkey
WHERE p.p_type = 'STANDARD'
  AND eu.unit_cost = (SELECT MIN(e2.unit_cost) FROM eu e2
                      WHERE e2.l_partkey = eu.l_partkey)
""",
)
def q296_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu = (
        cost.join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name")
    )
    w = W.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return best.join(F.broadcast(p), best.l_partkey == p.p_partkey).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_name",
        F.floor(F.col("unit_cost") * 1000000).cast("long").alias("unit_cost_micros"),
    )
