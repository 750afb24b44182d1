"""Mirror of the driver's t2 gate: every oracle-backed query must match
DuckDB on row count, column names, and order-insensitive values.

Values are canonicalized the strict way (repr of sorted rows with floats
kept at full precision) — if this passes, any reasonable driver-side
hash canonicalization passes too.
"""

from __future__ import annotations

import math

import pytest

from cubicerp_client_etl_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


def canon_value(v):
    if v is None:
        return "\x00<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision: the gate is bit-identity for our decimal-routed
        # aggregates; repr collapses -0.0 vs 0.0 explicitly
        return repr(v + 0.0 if v != 0 else 0.0)
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_ORACLE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(q.oracle)
    duck_cols = [d[0].lower() for d in rel.description]
    duck_rows = rel.fetchall()

    s_cols, s_rows = canon_rows(spark_cols, spark_rows)
    d_cols, d_rows = canon_rows(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[0]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(name, spark):
    q = REGISTRY[name]
    df = q.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_int128_rule_pinned():
    """The sweep's driver-unhashable rule: HUGEINT/unsigned AND any
    DECIMAL(p>18) — DuckDB backs those with int128 storage, which the
    external driver's hash distinguishes even when values stringify
    identically (round-1 HUGEINT reds; round-8 DECIMAL(38,0) digest
    reds q016/q019/q026/q029/q038)."""
    from tools.oracle_sweep import _int128_backed

    assert _int128_backed("HUGEINT")
    assert _int128_backed("UBIGINT")
    assert _int128_backed("DECIMAL(38,0)")
    assert _int128_backed("DECIMAL(19,4)")
    assert _int128_backed("DECIMAL(38,0)[]")
    assert not _int128_backed("DECIMAL(18,2)")
    assert not _int128_backed("DECIMAL(12,2)")
    assert not _int128_backed("BIGINT")
    assert not _int128_backed("VARCHAR")


def test_no_oracle_emits_int128(duck):
    """Pre-commit guard: DESCRIBE every registered oracle and fail if
    ANY output column is int128-backed — this is what would have turned
    the round-8 canonicalization reds into a local failure."""
    from tools.oracle_sweep import _int128_backed

    offenders = []
    for name in ORACLE_QUERIES:
        for col, typ, *_ in duck.execute(
            f"DESCRIBE {REGISTRY[name].oracle}"
        ).fetchall():
            if _int128_backed(typ):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, f"driver-unhashable oracle outputs: {offenders}"
