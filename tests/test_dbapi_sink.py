"""I2 — per-row SQL sink against a real DBAPI target (stdlib sqlite3):
parameterized binds (never the reference's `sql % row` templating),
partition-parallel connections, per-row error isolation into the
ledger shape, successful rows surviving a failing neighbor."""

from __future__ import annotations

import sqlite3

from cubicerp_client_etl_spark.sinks.dbapi import dbapi_load

DB = None  # set per-test via module global so the factory pickles


def _factory_path(path):
    def factory():
        conn = sqlite3.connect(path, timeout=30)
        conn.execute("PRAGMA busy_timeout=30000")
        return conn

    return factory


def test_dbapi_sink_per_row_isolation(spark, tmp_path):
    db = str(tmp_path / "target.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE tgt (k INTEGER PRIMARY KEY, v REAL CHECK (v >= 0))"
        )

    rows = [(1, 10.0), (2, -5.0), (3, 7.5), (4, 1.0), (1, 2.0)]  # bad v; dup pk
    df = spark.createDataFrame(rows, "k long, v double").coalesce(1)
    ledger = dbapi_load(
        df,
        _factory_path(db),
        "INSERT INTO tgt (k, v) VALUES (?, ?)",
        pk_col="k",
        batch_size=2,
    ).collect()

    by_pk_msg = {(r.pk, r.level) for r in ledger}
    assert ("1", "info") in by_pk_msg and ("3", "info") in by_pk_msg
    assert ("2", "error") in by_pk_msg  # CHECK violation
    errs = [r for r in ledger if r.level == "error"]
    assert len(errs) == 2  # bad v and duplicate pk
    with sqlite3.connect(db) as conn:
        got = sorted(conn.execute("SELECT k, v FROM tgt").fetchall())
    # every good row landed exactly once, bad rows absent
    assert got == [(1, 10.0), (3, 7.5), (4, 1.0)]


def test_dbapi_sink_exactly_once_across_actions(spark, tmp_path):
    """The ledger is materialized inside dbapi_load: re-running actions
    on it must NOT re-execute the inserts (the pre-fix behavior
    duplicated rows on PK-less targets)."""
    db = str(tmp_path / "once.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE tgt (k INTEGER, v REAL)")  # no PK on purpose
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double").coalesce(1)
    ledger = dbapi_load(
        df, _factory_path(db), "INSERT INTO tgt (k, v) VALUES (?, ?)", pk_col="k"
    )
    # three separate actions on the returned frame
    assert ledger.count() == 2
    assert ledger.filter("level = 'info'").count() == 2
    assert len(ledger.collect()) == 2
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT COUNT(*) FROM tgt").fetchone()[0] == 2


def test_dbapi_sink_begin_end_hooks(spark, tmp_path):
    """I2 begin/end: setup runs before the partition's rows, teardown
    after — observable via a staging table the inserts target."""
    db = str(tmp_path / "hooks.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE final (k INTEGER, v REAL)")
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double").coalesce(1)
    ledger = dbapi_load(
        df,
        _factory_path(db),
        "INSERT INTO staging (k, v) VALUES (?, ?)",
        pk_col="k",
        begin_sql="CREATE TEMP TABLE staging (k INTEGER, v REAL)",
        end_sql="INSERT INTO final SELECT * FROM staging",
        begin_delay=0.1,
    )
    assert ledger.filter("level = 'error'").count() == 0
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT COUNT(*) FROM final").fetchone()[0] == 2


def _duck_factory(path):
    def factory():
        import duckdb

        return duckdb.connect(path)

    return factory


def test_dbapi_sink_duckdb_no_savepoint_fallback(spark, tmp_path):
    """DuckDB has no SAVEPOINT support: the capability probe must fall
    back to commit-per-row and still deliver per-row isolation instead
    of marking every row 'error'."""
    import duckdb

    db = str(tmp_path / "duck.db")
    with duckdb.connect(db) as conn:
        conn.execute("CREATE TABLE tgt (k BIGINT PRIMARY KEY, v DOUBLE)")

    rows = [(1, 10.0), (2, 2.0), (1, 99.0), (3, 3.0)]  # dup pk mid-stream
    df = spark.createDataFrame(rows, "k long, v double").coalesce(1)
    ledger = dbapi_load(
        df, _duck_factory(db), "INSERT INTO tgt (k, v) VALUES (?, ?)", pk_col="k"
    ).collect()
    levels = sorted((r.pk, r.level) for r in ledger)
    assert ("1", "error") in levels  # the duplicate
    assert sum(1 for _, lv in levels if lv == "info") == 3
    with duckdb.connect(db) as conn:
        got = sorted(conn.execute("SELECT k, v FROM tgt").fetchall())
    assert got == [(1, 10.0), (2, 2.0), (3, 3.0)]


def test_dbapi_sink_parallel_partitions(spark, tmp_path):
    db = str(tmp_path / "par.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE tgt (k INTEGER PRIMARY KEY, v REAL)")
    df = spark.range(200).selectExpr("id AS k", "CAST(id AS DOUBLE) * 2 AS v").repartition(4)
    ledger = dbapi_load(
        df, _factory_path(db), "INSERT INTO tgt (k, v) VALUES (?, ?)", pk_col="k"
    )
    assert ledger.filter("level = 'error'").count() == 0
    assert ledger.count() == 200
    with sqlite3.connect(db) as conn:
        n, s = conn.execute("SELECT COUNT(*), SUM(v) FROM tgt").fetchone()
    assert n == 200 and s == sum(2.0 * i for i in range(200))
