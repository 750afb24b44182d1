"""RPC connector tests (SURVEY A2/I1 transport, §7.2.9): mock-server
round trip, batched partition-parallel load, per-row error isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.connectors.mock import MockTransport
from cubicerp_client_etl_spark.connectors.rpc import rpc_extract, rpc_load


def test_rpc_extract_mock_roundtrip(spark):
    df = rpc_extract(
        spark,
        MockTransport(),
        "res.partner",
        domain=[("active", "=", True)],
        fields=["id", "name"],
        schema="id long, name string",
    )
    assert df.count() == 7
    assert df.filter(F.col("name") == "p0").count() == 1


def test_rpc_load_batches_and_isolates_errors(spark):
    rows = [(i, float(i if i % 5 else -i)) for i in range(1, 251)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(4)
    ledger = rpc_load(df, MockTransport, "res.partner", pk_col="k", batch_size=100)
    got = ledger.collect()
    assert len(got) == 250  # no tail-drop: every row gets an outcome
    errors = [r for r in got if r["level"] == "error"]
    infos = [r for r in got if r["level"] == "info"]
    assert len(errors) == 50  # multiples of 5 fail (v negative)
    assert all(r["model_id"] is None for r in errors)
    assert all("bad v=" in r["message"] for r in errors)
    assert all(r["model_id"] == int(r["pk"]) * 2 for r in infos)


def test_rpc_load_respects_batch_size(spark):
    # single partition so the mock's call log is observable via an
    # accumulator-free check: route results through the ledger count
    df = spark.createDataFrame([(i, 1.0) for i in range(7)], "k int, v double").coalesce(1)
    ledger = rpc_load(df, MockTransport, "res.partner", pk_col="k", batch_size=3)
    assert ledger.count() == 7  # 3+3+1 — remainder batch not dropped


def test_rpc_python_datasource_parallel_slices(spark):
    """A2 as a Spark 4 Python DataSource: executor-side reads, id-range
    slicing, domain passthrough — union is partitioning-independent."""
    from cubicerp_client_etl_spark.sources.rpc_datasource import RpcModelDataSource

    spark.dataSource.register(RpcModelDataSource)

    def read(n_parts: int, domain: str = "[]"):
        return (
            spark.read.format("rpc_model")
            .option(
                "transport",
                "cubicerp_client_etl_spark.connectors.mock:range_mock_factory",
            )
            .option("model", "res.partner")
            .option("domain", domain)
            .option("fields", "id,name,amount")
            .option("schema", "id long, name string, amount double")
            .option("id_lo", "0")
            .option("id_hi", "103")
            .option("num_partitions", str(n_parts))
            .load()
        )

    df8 = read(8)
    assert df8.rdd.getNumPartitions() == 8
    rows = sorted((r.id, r.name, r.amount) for r in df8.collect())
    assert len(rows) == 103
    assert rows[5] == (5, "rec5", 7.5)
    # same union regardless of slicing
    assert rows == sorted((r.id, r.name, r.amount) for r in read(1).collect())
    # user domain composes with the slice predicate on the executor side
    odd = read(8, domain='[["parity", "=", 1]]')
    assert sorted(r.id for r in odd.collect()) == list(range(1, 103, 2))
