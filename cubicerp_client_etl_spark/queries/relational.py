"""Relational core queries (SURVEY §2.B, .C6-C9, .D, .F, .G, .H).

This is the surface the reference delegates to its source database via
``sql_query`` passthrough (cubicerpetl/cubicerpetl.py:299-302); the engine
owns it natively with DataFrame/Catalyst plans. Each query lists the
SURVEY §2 operator IDs it covers.

Scale notes are inline: which side broadcasts, where the shuffles are,
and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.compilers.domain import compile_domain
from cubicerp_client_etl_spark.functions import davg, dec, dsum, dsum_charge, dsum_disc_price
from cubicerp_client_etl_spark.queries import register


# --------------------------------------------------------------------------
# q001 — TPC-H-Q1-style pricing summary. Covers D3 (group-by aggregates),
# B6 (predicate pushdown), F2 (sort). Flagship/headline query.
# Scale: single shuffle on two low-cardinality keys; map-side partial
# aggregation collapses 100 TB to a handful of groups before the exchange.
# --------------------------------------------------------------------------
@register(
    "q001_pricing_summary",
    headline=True,
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q001_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_disc_price("l_extendedprice", "l_discount").alias("sum_disc_price"),
            dsum_charge("l_extendedprice", "l_discount", "l_tax").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q278 (birth q002) — projection + filter (B1, B6, H3). Catalyst pushes both the
# predicate and the 4-column ReadSchema into the Parquet scan.
# --------------------------------------------------------------------------
@register(
    "q278_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
""",
)
def q278_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


# --------------------------------------------------------------------------
# q279 (birth q003) — Odoo domain filter (B5): the domain below compiles to one Catalyst
# predicate and is pushed into the scan like any WHERE clause.
# Domain: ['|', ('c_mktsegment','=','BUILDING'),
#               '&', ('c_acctbal','>',5000.0), ('c_nationkey','in',[1,2,3]),
#          ('c_name','ilike','customer')]
# --------------------------------------------------------------------------
@register(
    "q279_domain_filter",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE (c_mktsegment = 'BUILDING'
       OR (c_acctbal > 5000.0 AND c_nationkey IN (1, 2, 3)))
  AND upper(c_name) LIKE '%' || upper('customer') || '%'
""",
)
def q279_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    domain = [
        "|",
        ("c_mktsegment", "=", "BUILDING"),
        "&",
        ("c_acctbal", ">", 5000.0),
        ("c_nationkey", "in", [1, 2, 3]),
        ("c_name", "ilike", "customer"),
    ]
    return cust.filter(compile_domain(domain)).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


# --------------------------------------------------------------------------
# q280 (birth q004) — top-k (F3): Catalyst compiles orderBy+limit to
# TakeOrderedAndProject — per-partition heaps, no global sort, no shuffle
# of the full table. Tie-break on the unique key for determinism.
# --------------------------------------------------------------------------
@register(
    "q280_top_k",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q280_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q153 (birth q005) — distinct (D5): hash aggregate on the pair, partial distinct
# map-side first.
# --------------------------------------------------------------------------
@register(
    "q153_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q153_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# q051 — group-by + HAVING (D3, B6-on-aggregate).
# --------------------------------------------------------------------------
@register(
    "q051_group_having",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
""",
)
def q051_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_total"))
        .filter(F.col("n_orders") > 10)
    )


# --------------------------------------------------------------------------
# q006 — star-schema join + agg (C6, D3). Headline join query.
# Scale: lineitem⋈orders is the one big shuffle (both sides hashed on
# orderkey); orders⋈customer shuffles on custkey; nation and region are
# broadcast (SMALL_DIMS) so the fact side never re-shuffles for them.
# AQE converts to broadcast joins automatically where a side is small.
# --------------------------------------------------------------------------
@register(
    "q006_star_join_revenue",
    headline=True,
    oracle="""
SELECT n.n_name AS nation, r.r_name AS region,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
""",
)
def q006_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            dsum_disc_price("l_extendedprice", "l_discount").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q052 — left outer join (C6): every customer, order stats or zeros.
# --------------------------------------------------------------------------
@register(
    "q052_left_join",
    oracle="""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS sum_total
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def q052_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_total"),
        )
    )


# --------------------------------------------------------------------------
# q258 / q119 (birth q007/q008) — semi and anti joins (C7): EXISTS / NOT EXISTS without
# materializing the right side into the output; Spark's left_semi /
# left_anti avoid the row-multiplication a plain join would cause.
# --------------------------------------------------------------------------
@register(
    "q258_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
)
def q258_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q119_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q119_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# q171 — theta self-join (C8): non-equi predicate on top of an equi key so
# the plan stays a hash join on nationkey with a residual filter, not a
# full cartesian product (which would never survive scale).
# --------------------------------------------------------------------------
@register(
    "q171_theta_self_join",
    oracle="""
SELECT a.s_suppkey AS suppkey_lo, b.s_suppkey AS suppkey_hi, a.s_nationkey AS nationkey
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_acctbal < b.s_acctbal
""",
)
def q171_theta_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_acctbal") < F.col("b.s_acctbal")),
    ).select(
        F.col("a.s_suppkey").alias("suppkey_lo"),
        F.col("b.s_suppkey").alias("suppkey_hi"),
        F.col("a.s_nationkey").alias("nationkey"),
    )


# --------------------------------------------------------------------------
# q122 (birth q010) — range/banding join (C9): fact joined to a tiny interval table on
# lo <= x < hi. The band table is broadcast, so the "range join" is a
# broadcast nested loop over 4 rows — O(1) per fact row, no shuffle.
# --------------------------------------------------------------------------
_BANDS = [
    ("micro", 0.0, 1000.0),
    ("small", 1000.0, 10000.0),
    ("medium", 10000.0, 50000.0),
    ("large", 50000.0, 1e18),
]


@register(
    "q122_range_band_join",
    oracle="""
WITH bands(band, lo, hi) AS (VALUES
  ('micro', 0.0, 1000.0), ('small', 1000.0, 10000.0),
  ('medium', 10000.0, 50000.0), ('large', 50000.0, 1e18))
SELECT b.band AS band, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM lineitem l JOIN bands b ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
GROUP BY b.band
""",
)
def q122_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# q172 — ranking window (E1): top-3 orders per customer. Total ordering
# (tie-break on unique o_orderkey) keeps row_number deterministic.
# --------------------------------------------------------------------------
@register(
    "q172_window_rank",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
""",
)
def q172_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# q123 (birth q012) — analytic window lag (E2): days since the supplier's previous
# shipment. Ordering is total via (shipdate, orderkey, linenumber).
# --------------------------------------------------------------------------
@register(
    "q123_window_lag",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       date_diff('day',
                 CAST(LAG(l_shipdate) OVER w AS DATE),
                 CAST(l_shipdate AS DATE)) AS days_since_prev
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
""",
)
def q123_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    prev = F.lag("l_shipdate").over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date("l_shipdate"), F.to_date(prev)).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# q126 (birth q013) — running aggregate with explicit frame (E3): per-customer running
# order total in order-date order. Decimal accumulation keeps the running
# sum exact at any depth.
# --------------------------------------------------------------------------
@register(
    "q126_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
""",
)
def q126_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


# --------------------------------------------------------------------------
# q174 / q053 — rollup & cube (D4): Spark expands grouping sets in a single
# shuffle (Expand + partial agg), not one pass per set.
# --------------------------------------------------------------------------
@register(
    "q174_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q174_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "q088_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q088_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


# --------------------------------------------------------------------------
# q130 (birth q015) — union all with provenance tag (G1).
# --------------------------------------------------------------------------
@register(
    "q130_union_all",
    oracle="""
SELECT nationkey, src, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
) GROUP BY nationkey, src
""",
)
def q130_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s).groupBy("nationkey", "src").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# q295 (birth q016) — intersect / except (G2), tagged and re-unioned so one result
# covers both set ops.
# --------------------------------------------------------------------------
@register(
    "q295_intersect_except",
    oracle="""
SELECT nationkey, 'both' AS tag FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS tag FROM
  (SELECT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT s_nationkey FROM supplier)
""",
)
def q295_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("tag", F.lit("both"))
    # subtract = EXCEPT DISTINCT (exceptAll would keep multiset leftovers
    # for values that also appear on the right — different semantics)
    only = c.subtract(s).withColumn("tag", F.lit("customer_only"))
    return both.unionByName(only)


# --------------------------------------------------------------------------
# q141 (birth q017) — scalar function pack (H1-H6, H11, H13): string physics, date
# parts, regex — all JVM-side built-ins, zero UDFs.
# --------------------------------------------------------------------------
@register(
    "q141_scalar_pack",
    oracle="""
SELECT o_orderkey,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS okey_padded,
       upper(substring(o_orderpriority, 3, 20)) AS prio_word,
       regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS prio_num,
       year(o_orderdate) AS od_year,
       month(o_orderdate) AS od_month,
       strftime(o_orderdate, '%Y-%m') AS od_ym,
       concat(o_orderstatus, '/', o_orderpriority) AS status_prio,
       length(o_orderpriority) AS prio_len
FROM orders
""",
)
def q141_scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("okey_padded"),
        F.upper(F.substring("o_orderpriority", 3, 20)).alias("prio_word"),
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).alias("prio_num"),
        F.year("o_orderdate").alias("od_year"),
        F.month("o_orderdate").alias("od_month"),
        F.date_format("o_orderdate", "yyyy-MM").alias("od_ym"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
    )


# --------------------------------------------------------------------------
# q089 (birth q175) — JSON scalar extraction (H14) over the events props column.
# --------------------------------------------------------------------------
@register(
    "q089_json_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
         / COUNT(json_extract_string(props, '$.k')) AS avg_k
FROM events
GROUP BY event_type
""",
)
def q089_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# q054 — pivot (common OLAP reshaping; oracle via conditional aggregates).
# --------------------------------------------------------------------------
@register(
    "q054_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_F
FROM lineitem GROUP BY l_returnflag
""",
)
def q054_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )
