"""JDBC source/sink integration (VERDICT r5 #7): executed end-to-end
against Apache Derby EMBEDDED — a real JDBC database whose driver ships
inside the Spark distribution itself (pyspark/jars/derby-*.jar), so the
named north-star path (BASELINE.json: "DataFrame transformations + JDBC
sink") gets real coverage with zero extra dependencies (column names are UPPERCASE: Derby
uppercases unquoted identifiers while the Spark writer quotes the
DataFrame names verbatim). External
servers (postgres/mysql) still need their jar via spark.jars; the
driver-missing error path is pinned here too."""

from __future__ import annotations

import pytest

from cubicerp_client_etl_spark.sinks.jdbc import read_jdbc, write_jdbc

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY)
        return True
    except Exception:  # noqa: BLE001
        return False


@pytest.fixture
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby jar not on the Spark classpath")
    # keep derby.log out of the repo cwd
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(i, f"name_{i}", i * 10) for i in range(100)],
        "ID bigint, NAME string, AMOUNT bigint",
    )
    write_jdbc(df, derby_url, "items", driver=DERBY, mode="overwrite")
    back = read_jdbc(
        spark, derby_url, "SELECT ID, NAME, AMOUNT FROM items", driver=DERBY
    )
    got = sorted((r.ID, r.NAME, r.AMOUNT) for r in back.collect())
    assert got == [(i, f"name_{i}", i * 10) for i in range(100)]


def test_jdbc_query_pushdown_runs_in_database(spark, derby_url):
    """The `query` option pushes the WHERE/aggregate into the DB: the
    frame Spark sees is already filtered/reduced."""
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(80)], "ID bigint, GRP bigint"
    )
    write_jdbc(df, derby_url, "pushed", driver=DERBY, mode="overwrite")
    agg = read_jdbc(
        spark,
        derby_url,
        "SELECT GRP, COUNT(*) AS N FROM pushed WHERE ID >= 40 GROUP BY GRP",
        driver=DERBY,
    )
    assert sorted((r.GRP, r.N) for r in agg.collect()) == [
        (0, 10), (1, 10), (2, 10), (3, 10)
    ]


def test_jdbc_partitioned_read_parallelizes(spark, derby_url):
    """Bounded partition read: numPartitions tasks, each with a bound
    predicate — the shape that keeps a big-table ingest off the
    one-task bottleneck. Rows must arrive exactly once."""
    df = spark.createDataFrame([(i,) for i in range(200)], "ID bigint")
    write_jdbc(df, derby_url, "parts", driver=DERBY, mode="overwrite")
    back = read_jdbc(
        spark,
        derby_url,
        "SELECT ID FROM parts",
        driver=DERBY,
        num_partitions=4,
        partition_column="ID",
        lower_bound=0,
        upper_bound=200,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(r.ID for r in back.collect()) == list(range(200))


def test_jdbc_append_mode_accumulates(spark, derby_url):
    df = spark.createDataFrame([(1,), (2,)], "ID bigint")
    write_jdbc(df, derby_url, "acc", driver=DERBY, mode="overwrite")
    write_jdbc(df, derby_url, "acc", driver=DERBY, mode="append")
    back = read_jdbc(spark, derby_url, "SELECT ID FROM acc", driver=DERBY)
    assert sorted(r.ID for r in back.collect()) == [1, 1, 2, 2]


def test_missing_driver_fails_fast_with_guidance(spark):
    with pytest.raises(RuntimeError, match="spark.jars"):
        read_jdbc(
            spark,
            "jdbc:postgresql://nowhere/db",
            "SELECT 1",
            driver="org.postgresql.Driver",
        )
