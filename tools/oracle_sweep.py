#!/usr/bin/env python
"""Full-corpus cross-engine sweep: run every __spark_entry__ query on a
vanilla SparkSession AND its DuckDB oracle on the same fixtures, and
compare (column names, row counts, stringified sorted values) — the
same canonicalization family the external driver uses for its
correctness gate.

Run at MULTIPLE scale factors: value ties (e.g. ROUND on doubles) are
data-dependent, so a query can pass sf0.01 and fail sf0.1 — this sweep
at sf0.1 is what caught exactly that in q106.

Usage: python tools/oracle_sweep.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def sweep(spark, sf_dir: str) -> int:
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries, oracles = e.queries(), e.oracle_sql()
    fails = rows_only = 0
    for name in sorted(queries):
        if name not in oracles:
            try:
                queries[name](spark, sf_dir).count()
                rows_only += 1
            except Exception as ex:  # noqa: BLE001
                fails += 1
                print(f"FAIL {name} (rows-only run): {ex}", flush=True)
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            srows = sorted(
                tuple(str(x) for x in r)
                for r in sdf.select(*sorted(sdf.columns)).collect()
            )
            rel = con.execute(oracles[name])
            cols = [d[0] for d in rel.description]
            drows = sorted(
                tuple(str(dict(zip(cols, r))[c]) for c in sorted(cols))
                for r in rel.fetchall()
            )
            if sorted(c.lower() for c in sdf.columns) != sorted(
                c.lower() for c in cols
            ):
                fails += 1
                print(f"FAIL {name}: columns differ", flush=True)
            elif srows != drows:
                fails += 1
                print(
                    f"FAIL {name}: values differ "
                    f"({len(srows)} vs {len(drows)} rows)",
                    flush=True,
                )
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
    n = len(queries)
    print(
        f"[{sf_dir}] {n} queries: {n - fails - rows_only} oracle-matched, "
        f"{rows_only} rows-only, {fails} FAILED",
        flush=True,
    )
    return fails


def main() -> None:
    from pyspark.sql import SparkSession

    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    total = sum(sweep(spark, d) for d in dirs)
    spark.stop()
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
