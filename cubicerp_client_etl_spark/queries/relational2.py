"""Relational coverage, second wave: as-of join, subqueries, exact
median, count-distinct, date/string packs, histogram, unpivot, and
TPC-H-style composites (SURVEY §2.C9, D3-D5, H pack, Del surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import dsum, dsum_disc_price
from cubicerp_client_etl_spark.queries import register

# --------------------------------------------------------------------------
# q055 — count distinct, exact + grouped (D3): one shuffle per distinct
# column via expand; AQE handles the skew.
# --------------------------------------------------------------------------
@register(
    "q055_count_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_returnflag
""",
)
def q055_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# q226 (birth q019) — date-function pack (H3/H4): shifts, truncation, parts.
# dayofweek: Spark is 1=Sunday, DuckDB dayofweek is 0=Sunday → +1.
# --------------------------------------------------------------------------
@register(
    "q226_date_pack",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       dayofweek(o_orderdate) + 1 AS dow,
       dayofyear(o_orderdate) AS doy,
       quarter(o_orderdate) AS qtr,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
FROM orders
""",
)
def q226_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(d, 7), "yyyy-MM-dd").alias("plus_week"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(d).alias("dow"),
        F.dayofyear(d).alias("doy"),
        F.quarter(d).alias("qtr"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


# --------------------------------------------------------------------------
# q218 (birth q020) — as-of join (C9): each event joined to the most recent 'signup'
# event of the same user at-or-before its timestamp. Spark has no native
# ASOF; expressed as a last_value window over a union-marked stream —
# one shuffle on user_id, no range explosion. Oracle = DuckDB ASOF JOIN.
# --------------------------------------------------------------------------
@register(
    "q218_asof_join",
    oracle="""
SELECT e.event_id, epoch_us(s.ts) AS signup_ts_us
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def q218_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    signup_ts = F.when(F.col("event_type") == "signup", F.col("ts"))
    return ev.select(
        "event_id",
        F.unix_micros(F.last(signup_ts, ignorenulls=True).over(w)).alias(
            "signup_ts_us"
        ),
    )


# --------------------------------------------------------------------------
# q143 (birth q021) — correlated scalar subquery (TPC-H Q17 shape): lineitems whose
# quantity exceeds 1.5× their part's average. Catalyst decorrelates to a
# join on the aggregated subquery — no per-row subquery execution.
# --------------------------------------------------------------------------
@register(
    "q143_correlated_subquery",
    oracle="""
SELECT l.l_partkey, COUNT(*) AS n_heavy,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem l
WHERE l.l_quantity > 1.5 * (
  SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY l.l_partkey
""",
)
def q143_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q26_lineitem")
    return spark.sql("""
        SELECT l.l_partkey, COUNT(*) AS n_heavy,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM q26_lineitem l
        WHERE l.l_quantity > 1.5 * (
          SELECT AVG(l2.l_quantity) FROM q26_lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
    """)


# --------------------------------------------------------------------------
# q056 — exact median via window (F2/E1): rank-based middle-two average —
# identical integer arithmetic in both engines, unlike percentile_cont
# whose interpolation formula is engine-specific.
# --------------------------------------------------------------------------
@register(
    "q056_median_window",
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders
)
SELECT o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS median_price,
       MAX(n) AS n_orders
FROM ranked
WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
GROUP BY o_custkey
""",
)
def q056_median_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wp = W.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    )
    return mid.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))).alias(
            "median_price"
        ),
        F.max("n").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# q057 — histogram / binning (width_bucket shape, emulated with floor
# arithmetic so both engines compute the identical expression).
# --------------------------------------------------------------------------
@register(
    "q057_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
""",
)
def q057_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
    )


# --------------------------------------------------------------------------
# q058 — unpivot / melt (Spark unpivot ↔ SQL UNION ALL oracle).
# --------------------------------------------------------------------------
@register(
    "q058_unpivot",
    oracle="""
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
""",
)
def q058_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


# --------------------------------------------------------------------------
# q062 — TPC-H Q4 shape: correlated EXISTS with a date window.
# --------------------------------------------------------------------------
@register(
    "q062_exists_agg",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
""",
)
def q062_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate), "left_semi"
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# --------------------------------------------------------------------------
# q063 — TPC-H Q12 shape: CASE bucket aggregation over a join.
# --------------------------------------------------------------------------
@register(
    "q063_case_buckets",
    oracle="""
SELECT o.o_orderpriority,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines,
       CAST(SUM(CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def q063_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "returned_lines"
        ),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0)).alias(
            "kept_lines"
        ),
    )


# --------------------------------------------------------------------------
# q064 — TPC-H Q14 shape: conditional revenue ratio (promo share). The
# ratio divides two decimal-exact sums as doubles — deterministic.
# --------------------------------------------------------------------------
@register(
    "q064_conditional_ratio",
    oracle="""
SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%%'
         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""".replace("%%", "%"),
)
def q064_conditional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import MONEY, dec2

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    dp = (dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))).cast(MONEY)
    promo = F.when(F.col("p_type").like("PROMO%"), dp).otherwise(
        F.lit(0).cast(MONEY)
    )
    return j.agg(
        (100.0 * F.sum(promo).cast("double") / F.sum(dp).cast("double")).alias(
            "promo_revenue_pct"
        )
    )


# --------------------------------------------------------------------------
# q065 — string-distance pack (H pack extension): levenshtein between the
# first two tokens of each document.
# --------------------------------------------------------------------------
@register(
    "q065_levenshtein",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
)
SELECT doc_id, toks[1] AS w1, toks[2] AS w2,
       levenshtein(toks[1], toks[2]) AS lev
FROM t WHERE len(toks) >= 2
""",
)
def q065_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.element_at("toks", 1).alias("w1"),
            F.element_at("toks", 2).alias("w2"),
            F.levenshtein(F.element_at("toks", 1), F.element_at("toks", 2)).alias(
                "lev"
            ),
        )
    )


# --------------------------------------------------------------------------
# q066 — explode / UDTF-shape (K-surface, SURVEY §2.K): word frequency via
# lateral explode — Spark's generator path, oracle via UNNEST.
# --------------------------------------------------------------------------
@register(
    "q066_explode_wordcount",
    oracle="""
SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS word
      FROM documents)
GROUP BY word
""",
)
def q066_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs")
    )
