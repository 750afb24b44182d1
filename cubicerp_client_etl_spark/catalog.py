"""Test-fixture catalog: the TPC-H-ish star schema + LLM-pipeline tables.

The driver harness generates deterministic Parquet fixtures under
``/root/testdata/sf{0.001,0.01,0.1}/`` (see TESTDATA.md). This module is
the single place that knows their names and how to load them; every query
and test goes through it so the scan configuration (and any future
partitioning/bucketing of large fixtures) is centralized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (used via F.expr)
from pyspark.sql.types import TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# harness generates. (customer/part/supplier grow with SF but stay
# dimension-sized relative to lineitem; Catalyst + AQE decide for them.)
SMALL_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    Fixture generators have varied across rounds: events.ts has been
    written as parquet TIMESTAMP(NANOS, adjusted-to-UTC) and as
    TIMESTAMP(MICROS, naive). Spark 4 reads the naive form as
    TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled``
    defaults true), which ``unix_micros``/``window`` reject. With the
    session TZ pinned to UTC (see ``load``), casting NTZ → LTZ
    reinterprets the naive wall time as UTC — exactly how the DuckDB
    oracle's ``epoch_us`` treats it, so epoch comparisons agree.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar Parquet scan (SURVEY A9): Catalyst prunes columns and
    pushes predicates into the scan; nothing is materialized here.

    events.ts has been stored as parquet TIMESTAMP(NANOS), which Spark
    rejects by default; read it as a long (legacy conf) and truncate to
    micros — the same truncation DuckDB applies, so oracles agree.
    Integer `div` (not `/`): epoch-nanos exceed double's 2^53 mantissa.
    Naive-micros fixture vintages are normalized NTZ→LTZ instead.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name!r}")
    # Timestamp rendering (date_format etc.) follows the session TZ; pin
    # UTC so results match the UTC-naive DuckDB oracle regardless of the
    # host machine's timezone. Runtime-settable, so this also covers
    # driver-owned sessions that didn't go through session.get_spark().
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return normalize_timestamps(df)
    return normalize_timestamps(spark.read.parquet(table_path(sf_dir, name)))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view so queries can use spark.sql."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def widen_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a NARROW scan up to the session's parallelism before
    a CPU-heavy map stage.

    A single parquet file with one row group reads as ONE input
    partition no matter how small ``maxPartitionBytes`` is (Spark
    splits files only at row-group boundaries) — which serializes
    every downstream map stage on one core. For expensive per-row work
    (winnowing's per-gram hashing, Arrow gram partials, media decode)
    the round-robin exchange of the raw rows costs milliseconds and
    buys a cores-wide map stage: q009 measured 7.6 s -> 0.9 s on
    local[32]. For cheap columnar work (plain aggregates over scans)
    the exchange LOSES — q001's lineitem agg measured 0.16 s -> 0.66 s
    widened — so this is opt-in per operator, not a ``load`` default.

    No-op when the scan is already at least ``min_partitions`` wide
    (the production case: large inputs arrive as many files/row
    groups), so shipped plans don't pay a pointless shuffle at scale.
    """
    if df.isStreaming:
        # micro-batch partitioning is the source's business and
        # ``.rdd`` raises on streaming frames — widening is a no-op
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
