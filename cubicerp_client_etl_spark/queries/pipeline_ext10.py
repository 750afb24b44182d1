"""Round-10 extension wave.

Scale REMEDIES promoted from unit-test-only code to registered,
oracled corpus queries — the salted skew join
(``operators/lookups.salted_join``, the remedy
``quality.key_skew_audit`` points at) and the bucketed co-located
fact-to-fact join (``sinks/writers.write_bucketed_table``, the
pay-the-layout-once shape) — plus the declared end-to-end reference
job lifecycle as ONE oracled query, then the ERP/analytics additions:
AR aging, three-way match, PSI drift, RFM quintile segmentation,
market-basket lift, the duplicate-payment screen, the 1-NN label
audit, and AVCO moving-average inventory (the recursive-CTE-oracled
applyInPandas walk).

Same corpus discipline as the rest of the registry: exact integer /
decimal arithmetic so every query carries a DuckDB oracle the driver
can hash-compare, and every operator keeps the shape that survives
100 TB.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register
from cubicerp_client_etl_spark.checkpointing import pin

# --------------------------------------------------------------------------
# q007 (birth q258) — Salted skew join (operators/lookups.salted_join): the
# audit-to-remedy pipeline. events.user_id % 25 is a DELIBERATELY
# hot key (10k rows over 25 segments at sf0.01; billions per segment
# at 100 TB — more than one executor's memory, past what AQE's
# skew-split can fix because the single key itself must subdivide);
# q235_shuffle_skew_audit is the audit that names such keys, this
# query applies the remedy: the skewed side salts into 8 sub-keys,
# the 25-row nation dim replicates 8x, and the rollup is
# row-identical to the plain join — the oracle IS the plain join.
# Money discipline: floor(value) is IEEE-exact and identical across
# engines; the sum is exact bigint.
# --------------------------------------------------------------------------


@register(
    "q007_salted_skew_join",
    oracle="""
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(e.value) AS BIGINT)) AS BIGINT)
         AS sum_value_floor
FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
GROUP BY n.n_name
""",
)
def q007_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.lookups import salted_join

    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 25).cast("int").alias("n_nationkey"),
        F.floor("value").cast("bigint").alias("_vf"),
    )
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        salted_join(ev, nat, "n_nationkey", n_salts=8)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("_vf").cast("bigint").alias("sum_value_floor"),
        )
    )


# --------------------------------------------------------------------------
# q259 — Bucketed co-located fact join (sinks/writers.
# write_bucketed_table): orders and lineitem are materialized as
# hash-bucketed managed tables on the order key (8 buckets, per-bucket
# sorted), then joined WITHOUT an exchange on either side — the
# bucketing satisfies the SortMergeJoin's HashPartitioning requirement
# (zero-Exchange-below-join pinned at sf0.001 AND sf0.1 in
# tests/test_plan_posture.py). At 100 TB this is the recurring
# fact-to-fact join's layout: pay the shuffle once at write time,
# reuse it every night. The rollup (revenue cents by order priority)
# is layout-independent, so the oracle is the plain join — bucketing
# is a physical property only.
# --------------------------------------------------------------------------


def bucketed_fact_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Write (overwrite) the bucketed orders/lineitem tables for
    ``sf_dir`` and return them as catalog-backed DataFrames. Table
    names carry an sf_dir digest AND the driver pid (ADVICE r10: the
    sf tag alone let two concurrent suites on the SAME sf_dir race —
    one deleting the table the other was reading; the pid scopes the
    drop-and-rewrite to this process, at the cost of one extra table
    per concurrent suite in the shared warehouse)."""
    import os
    import shutil
    from urllib.parse import urlparse

    from cubicerp_client_etl_spark.sinks.writers import write_bucketed_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8] + f"_{os.getpid()}"
    t_orders, t_li = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    # a managed table's location can survive from a PREVIOUS session's
    # metastore (each test/sweep session gets a fresh in-memory derby,
    # but the warehouse dir is shared) — drop both the catalog entry
    # and any orphaned location, or saveAsTable raises
    # LOCATION_ALREADY_EXISTS
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (t_orders, t_li):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    write_bucketed_table(
        orders, t_orders, ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        li, t_li, ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    return spark.table(t_orders), spark.table(t_li)


@register(
    "q009_bucketed_colocated_join",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def q009_bucketed_colocated_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    a, b = bucketed_fact_tables(spark, sf_dir)
    return (
        a.join(b, a.o_orderkey == b.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# q005 (birth q260) — Declared end-to-end reference job lifecycle (plans/
# interpreter.run_job over a JobSpec): the reference's §3.1 loop —
# INI server bootstrap (config.server_spec_from_ini; etl.ini section
# -> ServerSpec, cbc_xmlrpc.py:39-55 analogue) -> date-templated CSV
# extract (H5 {aaaa}{mm}{dd} path vars, A3 csv parse) -> transform
# with field expressions + C1 value-mapping decode + B5 domain filter
# -> reprocess='update' merge against the existing target (I1,
# cubicerpetl.py:494-537 semantics) -> CSV load + run ledger (I4/I7)
# — as ONE registered, oracled query. The staged batch is the orders
# feed exported to CSV first (so the extract really parses CSV
# bytes); the pre-existing target is every o_orderkey % 3 == 0 row at
# yesterday's prices (total_cents - 50), so the merge exercises all
# three actions: matched rows 'updated' to staged prices, new keys
# 'inserted', and target-only rows (status P, excluded from the feed
# by the domain) 'kept'. The oracle replays extract-filter, mapping,
# and the full-outer merge in SQL; the CSV hop is value-exact because
# money is %.2f-rendered and decimal-parsed on both engines.
# --------------------------------------------------------------------------


@register(
    "q005_reference_job_lifecycle",
    oracle="""
WITH src AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id,
         CASE WHEN o_orderstatus = 'O' THEN 'Open' ELSE 'Closed' END
           AS status,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS total_cents
  FROM orders WHERE o_orderstatus <> 'P'
),
tgt AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id,
         CASE WHEN o_orderstatus = 'O' THEN 'Open' ELSE 'Closed' END
           AS status,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) - 50
           AS total_cents
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT COALESCE(s.id, t.id) AS id,
       CASE WHEN s.id IS NOT NULL THEN s.status ELSE t.status END AS status,
       CAST(CASE WHEN s.id IS NOT NULL THEN s.total_cents
                 ELSE t.total_cents END AS BIGINT) AS total_cents,
       CASE WHEN s.id IS NOT NULL AND t.id IS NOT NULL THEN 'updated'
            WHEN t.id IS NULL THEN 'inserted'
            ELSE 'kept' END AS action
FROM tgt t FULL JOIN src s ON s.id = t.id
""",
)
def q005_reference_job_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os

    from cubicerp_client_etl_spark.config import server_spec_from_ini
    from cubicerp_client_etl_spark.plans.interpreter import run_job
    from cubicerp_client_etl_spark.plans.spec import (
        ColumnSpec,
        FieldSpec,
        JobSpec,
        MappingSpec,
        ResourceSpec,
        TransformSpec,
    )
    from cubicerp_client_etl_spark.sinks.writers import write_csv_resource

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ws = f"/tmp/spark_graft_q260_{tag}"
    os.makedirs(f"{ws}/config", exist_ok=True)
    with open(f"{ws}/config/etl.ini", "w") as fh:
        fh.write(
            "[erp_fs]\netl_type = fs\nfs_protocol = file\n"
            f"fs_path = {ws}\nencoding = UTF-8\n"
        )
    server = server_spec_from_ini("erp_fs", path=f"{ws}/config/etl.ini")

    orders = load(spark, sf_dir, "orders")
    # export the staged batch as real CSV bytes (the feed the job parses)
    write_csv_resource(
        orders.select(
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.format_string("%.2f", F.col("o_totalprice")),
        ),
        f"{server.fs_path}/orders_20240105",
    )
    job = JobSpec(
        name="reference_lifecycle",
        extract=ResourceSpec(
            name="orders_feed",
            f_type="csv",
            f_filename=f"{server.fs_path}/orders_{{aaaa}}{{mm}}{{dd}}",
            columns=(
                ColumnSpec("o_orderkey"),
                ColumnSpec("o_orderstatus"),
                ColumnSpec("o_totalprice"),
            ),
            domain=(("o_orderstatus", "!=", "P"),),
            server=server,
        ),
        transform=TransformSpec(
            name="decode_orders",
            fields=(
                FieldSpec("id", value="CAST(o_orderkey AS BIGINT)"),
                FieldSpec("status", field_name="o_orderstatus", mapping="status"),
                FieldSpec(
                    "total_cents",
                    value="CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)",
                ),
            ),
            reprocess="update",
            mappings=(
                MappingSpec("status", lines=(("O", "Open"),), default="Closed"),
            ),
        ),
        load=ResourceSpec(
            name="orders_out",
            f_type="csv",
            f_filename=f"{server.fs_path}/out_{{aaaa}}{{mm}}{{dd}}",
        ),
        run_date="2024-01-05",
        pk_field="id",
        ledger_path=f"{ws}/ledger",
    )
    # the pre-existing target: every third order at yesterday's prices
    existing = orders.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").cast("bigint").alias("id"),
        F.when(F.col("o_orderstatus") == "O", "Open")
        .otherwise("Closed")
        .alias("status"),
        (
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
            - 50
        ).alias("total_cents"),
    )
    merged = run_job(spark, job, existing_target=existing)
    return merged.select(
        "id",
        "status",
        F.col("total_cents").cast("bigint").alias("total_cents"),
        "action",
    )


# --------------------------------------------------------------------------
# q261 — AR aging buckets (operators/finance.ar_aging_buckets): open
# (non-finished) orders bucketed by age in days at the data-derived
# as-of date (newest order + 1 — never the wall clock), per-bucket
# count / distinct customers / total cents. The collections report
# every ERP ships. Scale: broadcast 1-row as-of, one CASE, one keyed
# agg.
# --------------------------------------------------------------------------


@register(
    "q049_ar_aging_buckets",
    oracle="""
WITH asof_d AS (
  SELECT CAST(max(CAST(o_orderdate AS DATE)) + INTERVAL 1 DAY AS DATE)
           AS a
  FROM orders WHERE o_orderstatus <> 'F'
),
open_docs AS (
  SELECT o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         date_diff('day', CAST(o_orderdate AS DATE), (SELECT a FROM asof_d))
           AS age
  FROM orders WHERE o_orderstatus <> 'F'
)
SELECT CASE WHEN age <= 30 THEN '0-30'
            WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90'
            ELSE '91+' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_entities,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM open_docs GROUP BY 1
""",
)
def q049_ar_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import ar_aging_buckets

    docs = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") != "F")
        .select(
            "o_custkey",
            "o_orderdate",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    return ar_aging_buckets(docs, "o_orderdate", "cents", "o_custkey")


# --------------------------------------------------------------------------
# q010 (birth q262) — Three-way match (operators/finance.three_way_match): PO /
# goods receipt / supplier invoice reconciled per line — the
# procurement control the reference's ledger feeds. Documents are
# synthesized deterministically from lineitem (receipts short 1 unit
# on every 37th line-key, invoices +1 cent on every 41st, every 53rd
# line never receipted, every 59th never invoiced), so all six match
# statuses appear and the oracle replays the synthesis + both joins +
# the CASE verbatim. Scale: two equi-joins on the line key; AQE reuses
# the hash partitioning.
# --------------------------------------------------------------------------


@register(
    "q010_three_way_match",
    headline=True,
    oracle="""
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         l_orderkey * 10 + l_linenumber AS lk,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents
  FROM lineitem
),
po AS (SELECT l_orderkey, l_linenumber, qty, price_cents FROM base),
rcv AS (
  SELECT l_orderkey, l_linenumber,
         qty - CASE WHEN lk % 37 = 0 THEN 1 ELSE 0 END AS qty
  FROM base WHERE lk % 53 <> 0
),
inv AS (
  SELECT l_orderkey, l_linenumber, qty,
         price_cents + CASE WHEN lk % 41 = 0 THEN 1 ELSE 0 END
           AS price_cents
  FROM base WHERE lk % 59 <> 0
)
SELECT p.l_orderkey, p.l_linenumber,
       p.qty AS po_qty, r.qty AS rcv_qty, i.qty AS inv_qty,
       p.price_cents AS po_price_cents, i.price_cents AS inv_price_cents,
       CASE WHEN r.qty IS NULL THEN 'missing_receipt'
            WHEN i.qty IS NULL THEN 'missing_invoice'
            WHEN (r.qty <> p.qty OR i.qty <> r.qty)
                 AND i.price_cents <> p.price_cents THEN 'both'
            WHEN r.qty <> p.qty OR i.qty <> r.qty THEN 'qty_mismatch'
            WHEN i.price_cents <> p.price_cents THEN 'price_mismatch'
            ELSE 'matched' END AS match_status,
       CAST(i.qty - p.qty AS BIGINT) AS qty_gap,
       CAST(i.price_cents - p.price_cents AS BIGINT) AS price_gap_cents
FROM po p
LEFT JOIN rcv r ON r.l_orderkey = p.l_orderkey
               AND r.l_linenumber = p.l_linenumber
LEFT JOIN inv i ON i.l_orderkey = p.l_orderkey
               AND i.l_linenumber = p.l_linenumber
""",
)
def q010_three_way_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import three_way_match

    # PO, receipt and invoice all derive from this frame — checkpoint
    # so the scan + money derivation run once (was 3 scans), and AQE
    # sees REAL sizes for the two match joins instead of the
    # estimate-blind post-filter guesses.
    base = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lk"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    ).transform(pin)
    po = base.select("l_orderkey", "l_linenumber", "qty", "price_cents")
    rcv = base.where(F.col("lk") % 53 != 0).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("qty")
            - F.when(F.col("lk") % 37 == 0, 1).otherwise(0)
        ).alias("qty"),
        "price_cents",
    )
    inv = base.where(F.col("lk") % 59 != 0).select(
        "l_orderkey",
        "l_linenumber",
        "qty",
        (
            F.col("price_cents")
            + F.when(F.col("lk") % 41 == 0, 1).otherwise(0)
        ).alias("price_cents"),
    )
    return three_way_match(
        po, rcv, inv, ["l_orderkey", "l_linenumber"], "qty", "price_cents"
    )


# --------------------------------------------------------------------------
# q263 — PSI drift screen (operators/drift.psi_drift): Population
# Stability Index of the document-length distribution between the
# first ten sources (baseline) and the rest (current) over a bounded
# n_chars div 200 bucket grid — the standard ML feature-monitoring
# score next to the χ² (q238) and Cramér's V (q257) screens.
# Add-one smoothing keeps vanished buckets finite; the only float step
# is one ln per bucket of an integer ratio rounded to e6 (the
# DSIR/idf precedent). Scale: two keyed counts + bounded grid join.
# --------------------------------------------------------------------------


@register(
    "q263_psi_drift",
    oracle="""
WITH d AS (
  SELECT CAST(n_chars // 200 AS BIGINT) AS bucket,
         CAST(substr(source, 4) AS INT) < 10 AS is_base
  FROM documents
),
cb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_base
       FROM d WHERE is_base GROUP BY 1),
cc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_cur
       FROM d WHERE NOT is_base GROUP BY 1),
grid AS (
  SELECT COALESCE(cb.bucket, cc.bucket) AS bucket,
         CAST(COALESCE(n_base, 0) AS BIGINT) AS n_base,
         CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
  FROM cb FULL JOIN cc ON cb.bucket = cc.bucket
),
tots AS (
  SELECT CAST(sum(n_base) AS BIGINT) AS na,
         CAST(sum(n_cur) AS BIGINT) AS nc,
         CAST(count(*) AS BIGINT) AS B
  FROM grid
)
SELECT g.bucket, g.n_base, g.n_cur,
       CAST((g.n_base + 1) * CAST(1000000 AS HUGEINT) // (t.na + t.B)
            AS BIGINT) AS p_e6,
       CAST((g.n_cur + 1) * CAST(1000000 AS HUGEINT) // (t.nc + t.B)
            AS BIGINT) AS q_e6,
       CAST(round(ln((CAST(g.n_base + 1 AS DOUBLE) * (t.nc + t.B))
                     / (CAST(g.n_cur + 1 AS DOUBLE) * (t.na + t.B)))
                  * 1000000) AS BIGINT) AS llr_e6,
       CAST((CAST((g.n_base + 1) * CAST(1000000 AS HUGEINT)
                  // (t.na + t.B) AS BIGINT)
             - CAST((g.n_cur + 1) * CAST(1000000 AS HUGEINT)
                    // (t.nc + t.B) AS BIGINT))
            * CAST(round(ln((CAST(g.n_base + 1 AS DOUBLE) * (t.nc + t.B))
                            / (CAST(g.n_cur + 1 AS DOUBLE) * (t.na + t.B)))
                         * 1000000) AS BIGINT) AS BIGINT)
         AS psi_contrib_e12
FROM grid g CROSS JOIN tots t
""",
)
def q263_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.drift import psi_drift

    docs = load(spark, sf_dir, "documents").select(
        F.expr("CAST(n_chars div 200 AS BIGINT)").alias("bucket"),
        (F.substring("source", 4, 10).cast("int") < 10).alias("is_base"),
    )
    return psi_drift(
        docs.where(F.col("is_base")),
        docs.where(~F.col("is_base")),
        "bucket",
    )


# --------------------------------------------------------------------------
# q011 (birth q264) — RFM segmentation (operators/behavior.rfm_segmentation):
# customers quintiled on recency / frequency / monetary by the exact
# integer rule score = ceil(cum·5/n) over each metric's value-count
# prefix scan, rolled up to the ≤125-cell segment grid. As-of is
# data-derived (newest order + 1). Scale: one customer-keyed agg,
# three bounded value-count prefix scans, bounded rollup.
# --------------------------------------------------------------------------


@register(
    "q011_rfm_segmentation",
    headline=True,
    oracle="""
WITH asof_d AS (
  SELECT CAST(max(CAST(o_orderdate AS DATE)) + INTERVAL 1 DAY AS DATE) AS a
  FROM orders
),
per AS (
  SELECT o_custkey,
         date_diff('day', max(CAST(o_orderdate AS DATE)),
                   (SELECT a FROM asof_d)) AS r,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS m
  FROM orders GROUP BY o_custkey
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
rs AS (SELECT r, CAST(sum(count(*))
              OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       FROM per GROUP BY r),
fs AS (SELECT f, CAST(sum(count(*))
              OVER (ORDER BY f ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       FROM per GROUP BY f),
ms AS (SELECT m, CAST(sum(count(*))
              OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       FROM per GROUP BY m),
scored AS (
  SELECT per.o_custkey, per.m,
         CAST((rs.cum * 5 + n.n - 1) // n.n AS INT) AS r_score,
         CAST((fs.cum * 5 + n.n - 1) // n.n AS INT) AS f_score,
         CAST((ms.cum * 5 + n.n - 1) // n.n AS INT) AS m_score
  FROM per
  JOIN rs ON rs.r = per.r
  JOIN fs ON fs.f = per.f
  JOIN ms ON ms.m = per.m
  CROSS JOIN n
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_entities,
       CAST(sum(m) AS BIGINT) AS total_cents
FROM scored GROUP BY 1, 2, 3
""",
)
def q011_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import rfm_segmentation

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return rfm_segmentation(orders, "o_custkey", "o_orderdate", "cents")


# --------------------------------------------------------------------------
# q265 — Market-basket pair affinity (operators/graph.basket_affinity):
# support + exact e6 lift for every part pair co-bought in >= 3
# orders. Pairs come from a self-equi-join ON the order key (per-order
# fan-out bounded by basket size, never all-pairs across orders) —
# the association-rule view next to the triangle census (q254 counts
# structure, this scores attraction). Scale: per-basket dedup, one
# basket-keyed pair join, one item-keyed count, broadcast totals.
# --------------------------------------------------------------------------


@register(
    "q265_basket_affinity",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM items),
freq AS (SELECT i, CAST(count(*) AS BIGINT) AS f FROM items GROUP BY i),
pairs AS (
  SELECT a.i AS item_a, b.i AS item_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT p.item_a, p.item_b, p.n_ab,
       fa.f AS n_a, fb.f AS n_b,
       CAST(CAST(nb.nb AS HUGEINT) * p.n_ab * 1000000
            // (fa.f * fb.f) AS BIGINT) AS lift_e6
FROM pairs p
JOIN freq fa ON fa.i = p.item_a
JOIN freq fb ON fb.i = p.item_b
CROSS JOIN nb
""",
)
def q265_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.graph import basket_affinity

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return basket_affinity(li, "l_orderkey", "l_partkey", min_pair_support=3)


# --------------------------------------------------------------------------
# q266 — Duplicate-payment screen (operators/finance.
# duplicate_payment_screen): orders sharing (customer, exact total
# cents) under different keys — the payables double-post audit. ONE
# keyed aggregation on the high-cardinality (entity, amount) key +
# HAVING; span_days = 0 flags the same-day double post.
# --------------------------------------------------------------------------


@register(
    "q266_duplicate_payment_screen",
    oracle="""
SELECT o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         AS amount_cents,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(o_orderkey) AS BIGINT) AS first_id,
       CAST(max(o_orderkey) AS BIGINT) AS last_id,
       CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
                      max(CAST(o_orderdate AS DATE))) AS BIGINT)
         AS span_days
FROM orders
GROUP BY 1, 2 HAVING count(*) >= 2
""",
)
def q266_duplicate_payment_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import (
        duplicate_payment_screen,
    )

    docs = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return duplicate_payment_screen(
        docs, "o_custkey", "cents", "o_orderkey", "o_orderdate"
    )


# --------------------------------------------------------------------------
# q267 — 1-NN label audit (operators/similarity.brute_force_topk over
# the labeled embeddings): a FIXED-SIZE probe panel (~50 probes — the
# sampling modulus is DERIVED from one scalar corpus count, the q038
# bucket-rule precedent, so the panel does NOT grow with the corpus
# and the scan stays linear at 10×/100×; a %-of-corpus panel measured
# 29× wall at 10× — quadratic — before this rule) probes the corpus
# for its nearest non-self neighbor (rounded-cosine rank, id
# tie-break — cross-engine deterministic); the output carries both
# labels and the agreement flag — the leave-one-out sanity check that
# label structure exists before training a classifier on the
# embedding. Scale: probes broadcast, corpus streams once (the q034
# shape); the label joins are broadcast-size. The exhaustive-recall
# path at scale is the IVF family (q150/q048) — this is the
# oracle-checkable exact baseline.
# --------------------------------------------------------------------------


@register(
    "q267_knn_label_audit",
    oracle="""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
pm AS (SELECT greatest(10, count(*) // 50) AS m FROM e),
probes AS (SELECT vec_id AS probe_id, label AS probe_label, v AS pv
           FROM e WHERE vec_id % (SELECT m FROM pm) = 0),
scored AS (
  SELECT p.probe_id, p.probe_label, e.vec_id, e.label AS nn_label,
         ROUND(list_dot_product(e.v, p.pv) /
               sqrt(list_dot_product(e.v, e.v)
                    * list_dot_product(p.pv, p.pv)), 6) AS sim
  FROM e CROSS JOIN probes p
  WHERE e.vec_id <> p.probe_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                               ORDER BY sim DESC, vec_id) AS rk
  FROM scored
)
SELECT probe_id, vec_id AS nn_id, sim,
       CAST(probe_label AS INT) AS label,
       CAST(nn_label AS INT) AS nn_label,
       probe_label = nn_label AS label_match
FROM ranked WHERE rk = 1
""",
)
def q267_knn_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cubicerp_client_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    # fixed-size probe panel: modulus derived from ONE scalar count so
    # the panel stays ~50 probes at any corpus size (q038 precedent)
    probe_mod = max(10, emb.count() // 50)
    probes = emb.where(F.col("vec_id") % probe_mod == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    top = brute_force_topk(corpus, probes, k=2)
    w = W.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    nn = (
        top.where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    labels = emb.select("vec_id", "label")
    pl = labels.select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("label")
    )
    nl = labels.select(
        F.col("vec_id").alias("nn_id"), F.col("label").alias("nn_label")
    )
    return (
        nn.select("probe_id", F.col("vec_id").alias("nn_id"), "sim")
        .join(F.broadcast(pl), "probe_id")
        .join(F.broadcast(nl), "nn_id")
        .select(
            "probe_id",
            "nn_id",
            "sim",
            F.col("label").cast("int").alias("label"),
            F.col("nn_label").cast("int").alias("nn_label"),
            (F.col("label") == F.col("nn_label")).alias("label_match"),
        )
    )


# --------------------------------------------------------------------------
# q015 (birth q268) — AVCO moving-average inventory (operators/history.
# avco_inventory): the other standard costing method next to FIFO
# (q013). Moves are synthesized from lineitem per part — every line
# yields a receipt of qty at its unit price (seq 2k) then an issue of
# qty div 2 (seq 2k+1), so stock accumulates and the average keeps
# moving; first move per part is always a receipt and on-hand never
# goes negative. The recurrence is IRREDUCIBLY sequential (floor
# division inside every issue), so the Spark side is a per-part Arrow
# applyInPandas walk and the oracle replays the exact recurrence with
# a RECURSIVE CTE stepping all parts in lockstep on the per-part row
# number. Unit price = extendedprice div qty (integer cents).
# --------------------------------------------------------------------------


@register(
    "q309_avco_inventory",
    oracle="""
WITH RECURSIVE base AS (
  SELECT l_partkey AS part,
         (l_orderkey * 10 + l_linenumber) AS lk,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           // CAST(l_quantity AS BIGINT) AS unit_cents
  FROM lineitem WHERE l_partkey % 20 = 0
),
mv AS (
  SELECT part, lk * 2 AS seq, q AS qty, unit_cents AS price_cents
  FROM base
  UNION ALL
  SELECT part, lk * 2 + 1, -(q // 2), 0 FROM base WHERE q // 2 > 0
),
m AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY part ORDER BY seq) AS rn
  FROM mv
),
s AS (
  SELECT part, rn, seq, qty,
         CAST(qty AS BIGINT) AS onhand,
         CAST(qty * price_cents AS BIGINT) AS value,
         CAST(0 AS BIGINT) AS cogs
  FROM m WHERE rn = 1
  UNION ALL
  SELECT m.part, m.rn, m.seq, m.qty,
         CASE WHEN m.qty >= 0 THEN s.onhand + m.qty
              ELSE s.onhand + m.qty END AS onhand,
         CASE WHEN m.qty >= 0 THEN s.value + m.qty * m.price_cents
              ELSE s.value - (s.value * (-m.qty) // s.onhand) END AS value,
         CASE WHEN m.qty >= 0 THEN 0
              ELSE s.value * (-m.qty) // s.onhand END AS cogs
  FROM s JOIN m ON m.part = s.part AND m.rn = s.rn + 1
)
SELECT CAST(part AS BIGINT) AS l_partkey, CAST(seq AS BIGINT) AS seq,
       CAST(qty AS BIGINT) AS qty,
       CAST(onhand AS BIGINT) AS onhand_after,
       CAST(value AS BIGINT) AS value_cents_after,
       CAST(cogs AS BIGINT) AS cogs_cents
FROM s
""",
)
def q309_avco_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.history import avco_inventory

    base = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 20 == 0)
        .select(
            F.col("l_partkey").alias("part"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lk"),
            F.col("l_quantity").cast("bigint").alias("q"),
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " div CAST(l_quantity AS BIGINT)"
            ).alias("unit_cents"),
        )
    )
    receipts = base.select(
        "part",
        (F.col("lk") * 2).alias("seq"),
        F.col("q").alias("qty"),
        F.col("unit_cents").alias("price_cents"),
    )
    issues = base.where(F.expr("q div 2") > 0).select(
        "part",
        (F.col("lk") * 2 + 1).alias("seq"),
        (-F.expr("q div 2")).alias("qty"),
        F.lit(0).alias("price_cents"),
    )
    moves = receipts.unionByName(issues)
    return avco_inventory(moves, "part", "seq", "qty", "price_cents").select(
        F.col("part").cast("bigint").alias("l_partkey"),
        F.col("seq").cast("bigint").alias("seq"),
        F.col("qty").cast("bigint").alias("qty"),
        "onhand_after",
        "value_cents_after",
        "cogs_cents",
    )


# --------------------------------------------------------------------------
# q269 — Reorder point / safety stock (operators/history.
# reorder_point): per-part daily-demand statistics (over observed
# demand days) and the planning closed form ROP = mean·L + z·σ·√L with
# L = 4, z = 2 — exact integers end-to-end: decimal(38,0) moment sums,
# floored population variance, the floor-corrected integer sqrt
# (functions.isqrt_exact) the oracle replays. Two keyed aggregations,
# nothing else.
# --------------------------------------------------------------------------


@register(
    "q269_reorder_point",
    oracle="""
WITH daily AS (
  SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS q
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_days,
         sum(q) AS sd, sum(q * q) AS sdd
  FROM daily GROUP BY 1
),
stats AS (
  SELECT l_partkey, n_days,
         CAST(sd AS BIGINT) AS sum_qty,
         CAST(sd // n_days AS BIGINT) AS mean_qty,
         CAST((n_days * sdd - sd * sd)
              // (CAST(n_days AS HUGEINT) * n_days) AS BIGINT) AS var_qty
  FROM agg
),
rooted AS (
  SELECT *, CAST(floor(sqrt(CAST(var_qty AS DOUBLE))) AS BIGINT) AS s0
  FROM stats
),
std AS (
  SELECT l_partkey, n_days, sum_qty, mean_qty, var_qty,
         CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= var_qty
                         THEN 1 ELSE 0 END)
                 - (CASE WHEN s0 * s0 > var_qty THEN 1 ELSE 0 END)
              AS BIGINT) AS std_qty
  FROM rooted
)
SELECT l_partkey, n_days, sum_qty, mean_qty, var_qty, std_qty,
       CAST(mean_qty * 4 + (4 * std_qty * 2) // 2 AS BIGINT)
         AS reorder_point
FROM std
""",
)
def q269_reorder_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.history import reorder_point

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("ship_day"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return reorder_point(
        li, "l_partkey", "ship_day", "qty", lead_days=4, z_x2=4
    )


# --------------------------------------------------------------------------
# q018 (birth q270) — Referential-integrity audit (operators/quality.
# referential_integrity_audit): orphan counts + exact e6 shares for
# the four fixture FK relationships — the load-time data contract. The
# healthy answer is four zero rows, and pinning that zero under the
# oracle hash is the point (a broken extract shows up as a non-zero
# orphan share before any downstream join silently drops rows). One
# LEFT ANTI join per relationship, parents broadcast-scale.
# --------------------------------------------------------------------------


@register(
    "q310_referential_integrity_audit",
    oracle="""
WITH r1 AS (
  SELECT 'lineitem.l_orderkey->orders' AS relationship,
         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey))
              AS BIGINT) AS n_orphans
),
r2 AS (
  SELECT 'orders.o_custkey->customer',
         CAST((SELECT count(*) FROM orders) AS BIGINT),
         CAST((SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
              AS BIGINT)
),
r3 AS (
  SELECT 'lineitem.l_partkey->part',
         CAST((SELECT count(*) FROM lineitem) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey))
              AS BIGINT)
),
r4 AS (
  SELECT 'lineitem.l_suppkey->supplier',
         CAST((SELECT count(*) FROM lineitem) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                 WHERE s.s_suppkey = l.l_suppkey))
              AS BIGINT)
),
u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
      UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4)
SELECT relationship, n_child, n_orphans,
       CAST(CASE WHEN n_child > 0
                 THEN CAST(n_orphans AS HUGEINT) * 1000000 // n_child
                 ELSE 0 END AS BIGINT) AS orphan_share_e6
FROM u
""",
)
def q310_referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import (
        referential_integrity_audit,
    )

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    return referential_integrity_audit(
        [
            ("lineitem.l_orderkey->orders", li, "l_orderkey", orders,
             "o_orderkey"),
            ("orders.o_custkey->customer", orders, "o_custkey", cust,
             "c_custkey"),
            ("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
            ("lineitem.l_suppkey->supplier", li, "l_suppkey", supp,
             "s_suppkey"),
        ]
    )


# --------------------------------------------------------------------------
# q271 — Last-touch attribution (operators/behavior.
# last_touch_attribution): every purchase credited to the event type
# immediately preceding it in the user's stream ('direct' when the
# purchase opens the stream) — counts and exact floor(value) revenue
# per source. ONE user-partitioned lag() window + a bounded rollup;
# the single-touch baseline next to the funnel (q136) and Markov
# (q019) views.
# --------------------------------------------------------------------------


@register(
    "q271_last_touch_attribution",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, event_type, value
  FROM events
),
lagged AS (
  SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY t, event_id) AS prev_ty
  FROM e
)
SELECT COALESCE(prev_ty, 'direct') AS source_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(COALESCE(sum(CAST(floor(value) AS BIGINT)), 0) AS BIGINT)
         AS sum_value_floor
FROM lagged WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def q271_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators.behavior import (
        last_touch_attribution,
    )

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t"),
        "event_id",
        "event_type",
        "value",
    )
    return last_touch_attribution(
        ev, "user_id", "t", "event_id", "event_type", "value", "purchase"
    )


# --------------------------------------------------------------------------
# q049 (birth q272) — Single exponential smoothing (operators/forecast.
# ses_forecast): per-part monthly demand smoothed with alpha = 1/4 on
# exact integers — level updates by floor((x − s)/4), the one-step
# forecast is the PRIOR level so the error column is honest. Like
# AVCO (q268) the floor inside every step makes the recurrence
# irreducibly sequential → per-part Arrow applyInPandas walk, and the
# oracle replays it with a RECURSIVE CTE in per-part row-number
# lockstep. Parts sampled (% 10) to bound the oracle recursion width.
# --------------------------------------------------------------------------


@register(
    "q261_ses_forecast",
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
         CAST(NULL AS BIGINT) AS abs_err
  FROM m WHERE rn = 1
  UNION ALL
  SELECT m.key, m.rn, m.period, m.value,
         s.level AS forecast,
         s.level + (m.value - s.level) // 4 AS level,
         abs(m.value - s.level) AS abs_err
  FROM s JOIN m ON m.key = s.key AND m.rn = s.rn + 1
)
SELECT CAST(key AS BIGINT) AS l_partkey, period, value,
       CAST(forecast AS BIGINT) AS forecast,
       CAST(level AS BIGINT) AS level,
       CAST(abs_err AS BIGINT) AS abs_err
FROM s
""",
)
def q261_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.forecast import ses_forecast

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
    return ses_forecast(
        series, "l_partkey", "period", "demand", alpha_den=4
    ).select(
        F.col("l_partkey").cast("bigint").alias("l_partkey"),
        "period",
        F.col("demand").alias("value"),
        "forecast",
        "level",
        "abs_err",
    )


# --------------------------------------------------------------------------
# q273 — Kaplan–Meier churn survival (operators/forecast.
# km_survival_curve): customer lifetimes = days between first and last
# order, right-censored when the last order falls within 90 days of
# the dataset horizon (still alive). The curve is carried in LOG
# space — per distinct event time, risk counts from one value-count
# prefix scan, hazard as an exact e6 floor, and the survival product
# telescoped to a prefix SUM of e6-rounded lns (the DSIR precedent) —
# so no cross-engine float product ever forms. The everyone-dies step
# (d = n, curve exactly 0) reports NULL log-survival, standard KM.
# --------------------------------------------------------------------------


@register(
    "q273_km_churn_survival",
    oracle="""
WITH horizon AS (
  SELECT CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS h FROM orders
),
life AS (
  SELECT o_custkey,
         date_diff('day', min(CAST(o_orderdate AS DATE)),
                   max(CAST(o_orderdate AS DATE))) AS dur,
         CASE WHEN date_diff('day', max(CAST(o_orderdate AS DATE)),
                             (SELECT h FROM horizon)) < 90
              THEN 0 ELSE 1 END AS event
  FROM orders GROUP BY o_custkey
),
vc AS (
  SELECT CAST(dur AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(event) AS BIGINT) AS d_events
  FROM life GROUP BY 1
),
cum AS (
  SELECT *, CAST(sum(n_all) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS c
  FROM vc
),
tot AS (SELECT CAST(sum(n_all) AS BIGINT) AS total FROM vc),
risk AS (
  SELECT cum.*, (tot.total - cum.c + cum.n_all) AS n_at_risk
  FROM cum CROSS JOIN tot
),
ev AS (
  SELECT t, n_at_risk, d_events,
         CAST(n_all - d_events AS BIGINT) AS n_censored_at_t,
         CAST(CAST(d_events AS HUGEINT) * 1000000 // n_at_risk AS BIGINT)
           AS hazard_e6,
         CASE WHEN d_events < n_at_risk THEN
           CAST(round(ln(CAST(n_at_risk - d_events AS DOUBLE)
                         / n_at_risk) * 1000000) AS BIGINT)
         END AS step_log
  FROM risk WHERE d_events > 0
)
SELECT t, CAST(n_at_risk AS BIGINT) AS n_at_risk, d_events,
       n_censored_at_t, hazard_e6,
       CASE WHEN d_events < n_at_risk THEN
         CAST(sum(step_log) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
              AS BIGINT)
       END AS log_surv_e6
FROM ev
""",
)
def q273_km_churn_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.forecast import km_survival_curve

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    horizon = orders.agg(F.max("d").alias("_h"))
    life = (
        orders.crossJoin(F.broadcast(horizon))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("dur"),
            F.when(
                F.datediff(F.first("_h"), F.max("d")) < 90, F.lit(0)
            )
            .otherwise(F.lit(1))
            .alias("event"),
        )
    )
    return km_survival_curve(life, "dur", "event")


# --------------------------------------------------------------------------
# q274 — Price elasticity of demand (operators/quality.
# grouped_ols_trend over e6-ln coordinates): per brand, the log-log
# OLS slope of part-level (unit price, total quantity) — slope_e6 IS
# the elasticity ×1e6 (the common e6 scaling of both axes cancels in
# dy/dx). One part-level aggregation, one e6-rounded ln per axis per
# part (DSIR precedent), one brand-keyed closed-form OLS.
# --------------------------------------------------------------------------


@register(
    "q274_price_elasticity",
    oracle="""
WITH pp AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS HUGEINT)
           // CAST(sum(CAST(l.l_quantity AS BIGINT)) AS HUGEINT)
           AS price_cents,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l GROUP BY 1
),
pts AS (
  SELECT p.p_brand,
         CAST(round(ln(CAST(pp.price_cents AS DOUBLE)) * 1000000)
              AS BIGINT) AS x,
         CAST(round(ln(CAST(pp.qty AS DOUBLE)) * 1000000) AS BIGINT) AS y
  FROM pp JOIN part p ON p.p_partkey = pp.l_partkey
),
agg AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pts GROUP BY 1
),
d AS (
  SELECT *, n * sxx - sx * sx AS det,
         (n * sxy - sx * sy) * 1000000 AS s_num,
         (sy * sxx - sx * sxy) * 1000000 AS i_num
  FROM agg
)
SELECT p_brand, n, CAST(sy AS BIGINT) AS sum_y,
       CASE WHEN n >= 2 AND det <> 0 THEN
         CAST(CASE WHEN s_num < 0 THEN -((-s_num) // det)
                   ELSE s_num // det END AS BIGINT) END AS slope_e6,
       CASE WHEN n >= 2 AND det <> 0 THEN
         CAST(CASE WHEN i_num < 0 THEN -((-i_num) // det)
                   ELSE i_num // det END AS BIGINT) END AS intercept_e6
FROM d
""",
)
def q274_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import grouped_ols_trend

    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    pp = li.groupBy("l_partkey").agg(
        F.expr("CAST(sum(cents) div sum(qty) AS BIGINT)").alias(
            "price_cents"
        ),
        F.sum("qty").cast("bigint").alias("qty_total"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = pp.join(
        F.broadcast(part), pp.l_partkey == part.p_partkey
    ).select(
        "p_brand",
        F.round(F.log(F.col("price_cents").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("qty_total").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("y"),
    )
    return grouped_ols_trend(pts, ["p_brand"], "x", "y")


# --------------------------------------------------------------------------
# q275 — Trial balance (operators/finance.trial_balance): double-entry
# journal synthesized from orders (each order posts debit AR / credit
# REVENUE for the full amount, plus every third order reclasses 10% of
# it debit REVENUE / credit DEFERRED), balanced by construction — the
# audit proves it: per-account debits/credits/balances plus the global
# zero-sum imbalance carried on every row. One keyed agg + a broadcast
# 1-row global.
# --------------------------------------------------------------------------


@register(
    "q275_trial_balance",
    oracle="""
WITH o AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
journal AS (
  SELECT 'AR' AS account, cents AS debit, 0 AS credit FROM o
  UNION ALL
  SELECT 'REVENUE', 0, cents FROM o
  UNION ALL
  SELECT 'REVENUE', cents // 10, 0 FROM o WHERE k % 3 = 0
  UNION ALL
  SELECT 'DEFERRED', 0, cents // 10 FROM o WHERE k % 3 = 0
),
per AS (
  SELECT account,
         CAST(sum(debit) AS BIGINT) AS total_debit_cents,
         CAST(sum(credit) AS BIGINT) AS total_credit_cents
  FROM journal GROUP BY account
),
gtot AS (
  SELECT CAST(sum(total_debit_cents) - sum(total_credit_cents) AS BIGINT)
           AS journal_imbalance_cents
  FROM per
)
SELECT per.account, per.total_debit_cents, per.total_credit_cents,
       CAST(per.total_debit_cents - per.total_credit_cents AS BIGINT)
         AS balance_cents,
       gtot.journal_imbalance_cents
FROM per CROSS JOIN gtot
""",
)
def q275_trial_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import trial_balance

    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    z = F.lit(0).cast("bigint")
    journal = (
        o.select(F.lit("AR").alias("account"), F.col("cents").alias("debit"),
                 z.alias("credit"))
        .unionByName(
            o.select(F.lit("REVENUE").alias("account"), z.alias("debit"),
                     F.col("cents").alias("credit"))
        )
        .unionByName(
            o.where(F.col("k") % 3 == 0).select(
                F.lit("REVENUE").alias("account"),
                F.expr("cents div 10").alias("debit"),
                z.alias("credit"),
            )
        )
        .unionByName(
            o.where(F.col("k") % 3 == 0).select(
                F.lit("DEFERRED").alias("account"),
                z.alias("debit"),
                F.expr("cents div 10").alias("credit"),
            )
        )
    )
    return trial_balance(journal, "account", "debit", "credit")


# --------------------------------------------------------------------------
# q276 — Budget vs actual with YTD (operators/finance.
# budget_vs_actual): per (order priority, month of 1997), actuals from
# orders and a synthesized budget (the 1996 month × 105% — the classic
# prior-year-plus plan), period variance, and YTD cumulatives of all
# three. Absent months on either side report 0 — a budgeted month with
# no actuals IS a variance. Two keyed aggs, one full-outer grid join,
# one group-keyed window over the bounded month axis.
# --------------------------------------------------------------------------


@register(
    "q276_budget_vs_actual",
    oracle="""
WITH act AS (
  SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS period,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS actual_cents
  FROM orders WHERE year(o_orderdate) = 1997
  GROUP BY 1, 2
),
bud AS (
  SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS period,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) * 105 // 100) AS BIGINT) AS budget_cents
  FROM orders WHERE year(o_orderdate) = 1996
  GROUP BY 1, 2
),
grid AS (
  SELECT COALESCE(a.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
         COALESCE(a.period, b.period) AS period,
         CAST(COALESCE(a.actual_cents, 0) AS BIGINT) AS actual_cents,
         CAST(COALESCE(b.budget_cents, 0) AS BIGINT) AS budget_cents
  FROM act a FULL JOIN bud b
    ON a.o_orderpriority = b.o_orderpriority AND a.period = b.period
)
SELECT o_orderpriority, period, actual_cents, budget_cents,
       CAST(actual_cents - budget_cents AS BIGINT) AS variance_cents,
       CAST(sum(actual_cents) OVER w AS BIGINT) AS ytd_actual_cents,
       CAST(sum(budget_cents) OVER w AS BIGINT) AS ytd_budget_cents,
       CAST(sum(actual_cents) OVER w - sum(budget_cents) OVER w AS BIGINT)
         AS ytd_variance_cents
FROM grid
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY period
             ROWS UNBOUNDED PRECEDING)
""",
)
def q276_budget_vs_actual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.finance import budget_vs_actual

    orders = load(spark, sf_dir, "orders")
    actual = orders.where(F.year("o_orderdate") == 1997).select(
        "o_orderpriority",
        F.month("o_orderdate").cast("bigint").alias("m"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    budget = orders.where(F.year("o_orderdate") == 1996).select(
        "o_orderpriority",
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.expr(
            "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " * 105 div 100 AS BIGINT)"
        ).alias("cents"),
    )
    return budget_vs_actual(
        actual, budget, ["o_orderpriority"], "m", "cents"
    )


# --------------------------------------------------------------------------
# q277 — Zipf rank-frequency fit (quality.grouped_ols_trend over the
# token frequency table): the corpus-linguistics datasheet — token
# frequencies ranked by the value-count prefix scan (rank = prefix sum
# of ones over (freq desc, token), the ABC shape, never a raw global
# window), then the ln-ln OLS slope; a natural corpus sits near −1,
# boilerplate/duplication bends it. One keyed count, one two-phase
# prefix scan, one e6-ln per distinct token, one closed-form OLS.
# --------------------------------------------------------------------------


@register(
    "q277_zipf_fit",
    oracle="""
WITH tok AS (
  SELECT u.t AS token
  FROM documents, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS u(t)
  WHERE length(trim(text)) > 0
),
freq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS f FROM tok GROUP BY token
),
ranked AS (
  SELECT f, CAST(row_number() OVER (ORDER BY f DESC, token) AS BIGINT) AS r
  FROM freq
),
pts AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS y
  FROM ranked
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pts
),
d AS (
  SELECT *, n * sxx - sx * sx AS det,
         (n * sxy - sx * sy) * 1000000 AS s_num,
         (sy * sxx - sx * sxy) * 1000000 AS i_num
  FROM agg
)
SELECT n, CAST(sy AS BIGINT) AS sum_y,
       CASE WHEN n >= 2 AND det <> 0 THEN
         CAST(CASE WHEN s_num < 0 THEN -((-s_num) // det)
                   ELSE s_num // det END AS BIGINT) END AS slope_e6,
       CASE WHEN n >= 2 AND det <> 0 THEN
         CAST(CASE WHEN i_num < 0 THEN -((-i_num) // det)
                   ELSE i_num // det END AS BIGINT) END AS intercept_e6
FROM d
""",
)
def q277_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.prefix import prefix_sum
    from cubicerp_client_etl_spark.operators.quality import grouped_ols_trend
    from cubicerp_client_etl_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    )
    freq = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    ranked = prefix_sum(
        freq.withColumn("_one", F.lit(1).cast("bigint")),
        order_by=[F.col("f").desc(), F.col("token")],
        value_col="_one",
        out_col="r",
    )
    pts = ranked.select(
        F.lit(1).alias("_g"),
        F.round(F.log(F.col("r").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("y"),
    )
    return grouped_ols_trend(pts, ["_g"], "x", "y").drop("_g")
