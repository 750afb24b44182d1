"""DBAPI SQL sink with per-row error isolation (SURVEY I2).

The reference's db load runs ``sql_query % row`` per row through a raw
cursor (cubicerpetl/cubicerpetl.py:466-492) — string-templating row
values into SQL text (injection by design, §4.4.5). The engine's form:
**bind parameters**, partition-parallel connections, batched commits,
and per-row error capture into the same ledger shape the RPC sink
produces — load errors are data, not exceptions (cubicerpetl.py:738-745
semantics, minus the per-row network round-trip).

Works with any DBAPI-2 driver importable on the executors (sqlite3,
psycopg2, duckdb, ...). ``connect_factory`` must be a top-level
callable or otherwise picklable.

Scale posture: one connection per partition (not per row); commit every
``batch_size`` rows so a mid-partition failure re-runs bounded work;
per-row ``execute`` keeps error isolation — when the target supports
savepoints-free batch inserts and you don't need row isolation, raise
``batch_size`` and let executemany-style batching win. The returned
ledger is a DataFrame: write it with sinks/ledger, never collect it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def dbapi_load(
    df: DataFrame,
    connect_factory: Callable[[], Any],
    insert_sql: str,
    pk_col: str,
    batch_size: int = 500,
) -> DataFrame:
    """Execute ``insert_sql`` (with ``?``/``%s`` placeholders matching
    df's column order) once per row, parameterized. Returns the
    ledger-shaped frame (pk, level, message)."""
    cols = df.columns

    def send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conn = connect_factory()
        try:
            cur = conn.cursor()
            for pdf in batches:
                pks, levels, messages = [], [], []
                since_commit = 0
                for rec in pdf[cols].itertuples(index=False):
                    vals = tuple(rec)
                    pk = str(getattr(rec, pk_col))
                    # savepoint-scoped row: a failure rolls back ONLY
                    # this row, never the committed-pending batch — a
                    # plain rollback() here would silently discard rows
                    # already reported as 'info'.
                    cur.execute("SAVEPOINT row_sp")
                    try:
                        cur.execute(insert_sql, vals)
                        cur.execute("RELEASE SAVEPOINT row_sp")
                        pks.append(pk)
                        levels.append("info")
                        messages.append("Ok")
                    except Exception as ex:  # noqa: BLE001 — per-row isolation
                        cur.execute("ROLLBACK TO SAVEPOINT row_sp")
                        cur.execute("RELEASE SAVEPOINT row_sp")
                        pks.append(pk)
                        levels.append("error")
                        messages.append(str(ex))
                        continue
                    since_commit += 1
                    if since_commit >= batch_size:
                        conn.commit()
                        since_commit = 0
                conn.commit()
                yield pd.DataFrame(
                    {"pk": pks, "level": levels, "message": messages}
                )
        finally:
            conn.close()

    return df.mapInPandas(send, schema="pk string, level string, message string")
