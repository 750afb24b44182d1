"""Warehouse-history and reproducible-split queries (sixth wave):
SCD Type-2, CDC snapshot diff, deterministic train/test split.

These exercise ``operators/history.py`` — the history-preserving load
shapes the reference's upsert modes (cubicerpetl/cubicerpetl.py:494-537)
don't keep, plus the md5-based split every reproducible training-data
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import dsum
from cubicerp_client_etl_spark.operators.history import (
    hash_split,
    scd2_intervals,
    snapshot_diff,
)
from cubicerp_client_etl_spark.queries import register


# --------------------------------------------------------------------------
# q107 — SCD Type-2 build (I-family extension): purchase events as a
# per-user attribute change log → validity intervals. One window pass
# partitioned by user_id; (ts, event_id) is a deterministic total order.
# Timestamps surface as epoch-micros (the engine-portable rendering).
# Scale: single shuffle on user_id; no global sort, no self-join —
# the lead() frame is per-key within the shuffled partition.
# --------------------------------------------------------------------------
@register(
    "q107_scd2_intervals",
    oracle="""
SELECT user_id,
       value AS attr_value,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       ROW_NUMBER() OVER w AS version,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q107_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    scd = scd2_intervals(
        ev, key="user_id", order_by=["ts", "event_id"], attrs=["value"]
    )
    return scd.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "version",
        "is_current",
    )


# --------------------------------------------------------------------------
# q108 — CDC snapshot diff (C-family extension): per-order revenue
# snapshots as of two ship-date cutoffs, every order classified
# inserted / changed / unchanged (deleted can't occur in an append-only
# log — asserting its absence is part of the check). The diff is one
# full-outer join on orderkey. Revenue compares in exact decimal-summed
# doubles, so 'unchanged' is bit-identity, not tolerance.
# Scale: two aggregations + one join, all shuffling on o_orderkey —
# with both snapshots derived from the same scan, AQE reuses the
# exchange; at 100 TB this is the standard two-bucketed-tables diff.
# --------------------------------------------------------------------------
@register(
    "q108_cdc_snapshot_diff",
    oracle="""
WITH snap_old AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_orderkey
),
snap_new AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY l_orderkey
)
SELECT COALESCE(o.l_orderkey, n.l_orderkey) AS l_orderkey,
       CASE WHEN o.l_orderkey IS NULL THEN 'inserted'
            WHEN n.l_orderkey IS NULL THEN 'deleted'
            WHEN o.revenue = n.revenue THEN 'unchanged'
            ELSE 'changed' END AS change,
       o.revenue AS old_revenue,
       n.revenue AS new_revenue
FROM snap_old o
FULL OUTER JOIN snap_new n ON o.l_orderkey = n.l_orderkey
""",
)
def q108_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def snap(cutoff: str) -> DataFrame:
        return (
            li.filter(F.col("l_shipdate") < cutoff)
            .groupBy("l_orderkey")
            .agg(dsum("l_extendedprice").alias("revenue"))
        )

    diff = snapshot_diff(
        snap("1998-01-01"), snap("1999-01-01"), key="l_orderkey", compare=["revenue"]
    )
    return diff.select(
        "l_orderkey",
        "change",
        F.col("old_revenue").alias("old_revenue"),
        F.col("new_revenue").alias("new_revenue"),
    )


# --------------------------------------------------------------------------
# q109 — deterministic train/test split with stratification proof
# (L-family): md5-hash assignment per customer (engine-portable,
# partition-independent), counted per (split, mktsegment) to show the
# split is unbiased within every stratum. Never rand()/hash() — those
# are engine- or seed-dependent; md5 of the key's string rendering is
# bit-identical in Spark and DuckDB.
# Scale: the split is a per-row map (no shuffle); only the count
# aggregates — at 100 TB the assignment stays a pushed-down projection.
# --------------------------------------------------------------------------
@register(
    "q109_hash_split_stratified",
    oracle="""
SELECT CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '3'
            THEN 'test' ELSE 'train' END AS split,
       c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY split, c_mktsegment
""",
)
def q109_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select(hash_split("c_custkey"), "c_mktsegment", "c_acctbal")
        .groupBy("split", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )
