#!/usr/bin/env python
"""Full-corpus cross-engine sweep: run every __spark_entry__ query on a
vanilla SparkSession AND its DuckDB oracle on the same fixtures, and
compare (column names, row counts, stringified sorted values, AND
column types) — a strictly stronger canonicalization than the external
driver's correctness gate.

The type check exists because the driver's hash is TYPE-sensitive:
DuckDB widens SUM(BIGINT) to HUGEINT (int128), which fails the driver
even when every value stringifies identically (round-1 reds
q21/q110/q117 were exactly this). String-only comparison masked it, so
each oracle column's DuckDB type must now exactly equal the mapped
Spark type (long↔BIGINT, decimal widths included), and
HUGEINT/unsigned types are always failures.

Run at MULTIPLE scale factors: value ties (e.g. ROUND on doubles) are
data-dependent, so a query can pass sf0.01 and fail sf0.1 — this sweep
at sf0.1 is what caught exactly that in the min-cost-supplier query
(q105 under the round-2 numbering).

Usage: python tools/oracle_sweep.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# Spark simpleString -> the DuckDB type FAMILY the driver's hash treats
# as identical. Empirically (round-1 CORRECTNESS) the driver hashes
# signed ints of any width ≤ 64 the same (q13 rn INT vs BIGINT was
# green) but distinguishes int128 (q21/q110/q117 reds), so all of
# tinyint..bigint collapse to one INT family while HUGEINT/unsigned
# are always failures.
_INT_FAMILY = "INT64"
_SPARK_TO_DUCK = {
    "tinyint": _INT_FAMILY,
    "smallint": _INT_FAMILY,
    "int": _INT_FAMILY,
    "bigint": _INT_FAMILY,
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}
_DUCK_TO_FAMILY = {
    "TINYINT": _INT_FAMILY,
    "SMALLINT": _INT_FAMILY,
    "INTEGER": _INT_FAMILY,
    "BIGINT": _INT_FAMILY,
}


def _spark_type_to_duck(simple: str) -> str | None:
    if simple in _SPARK_TO_DUCK:
        return _SPARK_TO_DUCK[simple]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", simple)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"array<(.+)>", simple)
    if m:
        inner = _spark_type_to_duck(m.group(1))
        return f"{inner}[]" if inner else None
    return None  # unmapped → only flag if DuckDB side is int128/unsigned


_ALWAYS_BAD = ("HUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")

# DuckDB backs DECIMAL(p>18) with int128 storage, and the driver's
# hash is int128-SENSITIVE: the round-8 reds (q016/q019/q026/q029/
# q038) were DECIMAL(38,0) digest columns whose rows, schema and
# stringified values all matched — only the storage width differed.
# Any int128-backed output column is therefore driver-unhashable and
# must fail the sweep loudly (wide digests leave a query as bigint
# hi/lo carriers — functions.hi_lo_bigint).
_DEC_RE = re.compile(r"DECIMAL\((\d+),\s*(\d+)\)", re.IGNORECASE)


def _int128_backed(duck_type: str) -> bool:
    up = duck_type.upper()
    if any(b in up for b in _ALWAYS_BAD):
        return True
    m = _DEC_RE.search(up)
    return bool(m and int(m.group(1)) > 18)


def type_mismatches(sdf, con, sql: str) -> list[str]:
    """Columns whose DuckDB oracle type differs from the Spark type
    (or is a type no engine pair should ever surface)."""
    duck_types = {
        r[0].lower(): r[1]
        for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    bad = []
    for f in sdf.schema.fields:
        dt = duck_types.get(f.name.lower())
        if dt is None:
            continue  # column-name check happens separately
        want = _spark_type_to_duck(f.dataType.simpleString())
        got = _DUCK_TO_FAMILY.get(dt.upper(), dt.upper())
        if _int128_backed(dt):
            bad.append(f"{f.name}: oracle {dt} (int128/unsigned — driver-unhashable)")
        elif want is not None and got != want:
            bad.append(f"{f.name}: spark {f.dataType.simpleString()} vs oracle {dt}")
    return bad


def sweep(spark, sf_dir: str, only: str | None = None) -> int:
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries, oracles = e.queries(), e.oracle_sql()
    if only:
        subs = [s for s in only.split(",") if s]
        queries = {n: q for n, q in queries.items() if any(s in n for s in subs)}
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
            elif bad_types := type_mismatches(sdf, con, oracles[name]):
                fails += 1
                print(f"FAIL {name}: type drift {bad_types}", flush=True)
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

    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit("usage: oracle_sweep.py [sf_dir ...] [--only SUBSTR]")
        only = args[i + 1]
        args = args[:i] + args[i + 2 :]
    dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    total = sum(sweep(spark, d, only) for d in dirs)
    spark.stop()
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
