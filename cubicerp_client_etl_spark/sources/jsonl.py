"""JSON-Lines codec (A-family extension; not in the reference).

The reference's file surface stops at csv/txt/dbf
(cubicerpetl/cubicerpetl.py:203-286); JSONL is the interchange format
modern data pipelines actually move documents and event logs in, so the
engine supports it as a first-class source/sink.

Read path: ``spark.read.json`` with an explicit schema (always pass
one at scale — schema inference re-reads the whole input), and
``columnNameOfCorruptRecord`` routed to a quarantine column instead of
failing the batch, mirroring the engine's row-level error isolation
(the ledger philosophy of cubicerpetl.py:738-745, done declaratively).

Scale: JSONL is line-splittable, so reads parallelize like CSV;
writes shard one file per partition. Still prefer Parquet for
persistent tables — JSONL is a boundary format, not a storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL; malformed lines land in ``_corrupt_record`` (NULL
    elsewhere) rather than aborting, when ``keep_corrupt``."""
    reader = spark.read
    if schema is not None:
        if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
            schema = StructType(
                [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
            )
        reader = reader.schema(schema)
    reader = reader.option("mode", "PERMISSIVE" if keep_corrupt else "FAILFAST")
    if keep_corrupt:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE JSONL read into (good_rows, corrupt_rows)."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    # Spark refuses plans whose referenced columns reduce to ONLY the
    # internal corrupt-record column (column pruning makes even a
    # count() on the bad side hit this). The documented contract is to
    # materialize the parsed frame first; both halves then reuse it.
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write JSONL, one shard per partition (no coalesce(1) — a single
    reducer is the classic small-cluster bottleneck)."""
    df.write.mode(mode).json(path)
