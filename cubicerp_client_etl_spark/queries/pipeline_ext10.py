"""Round-10 extension wave: the 100 TB scale REMEDIES promoted from
unit-test-only code to registered, oracled corpus queries — the salted
skew join (``operators/lookups.salted_join``, the remedy
``quality.key_skew_audit`` points at) and the bucketed co-located
fact-to-fact join (``sinks/writers.write_bucketed_table``, the
pay-the-layout-once shape) — plus the declared end-to-end reference
job lifecycle as ONE oracled query.

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

# --------------------------------------------------------------------------
# q258 — Salted skew join (operators/lookups.salted_join): the
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
    "q258_salted_skew_join",
    oracle="""
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(e.value) AS BIGINT)) AS BIGINT)
         AS sum_value_floor
FROM events e JOIN nation n ON n.n_nationkey = e.user_id % 25
GROUP BY n.n_name
""",
)
def q258_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    names carry an sf_dir digest so concurrent suites at different
    scale factors never collide in the shared warehouse."""
    import shutil
    from urllib.parse import urlparse

    from cubicerp_client_etl_spark.sinks.writers import write_bucketed_table

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
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
    "q259_bucketed_colocated_join",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def q259_bucketed_colocated_join(
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
# q260 — Declared end-to-end reference job lifecycle (plans/
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
    "q260_reference_job_lifecycle",
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
def q260_reference_job_lifecycle(
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
