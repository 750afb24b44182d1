"""Unit tests for operators/quantiles.py — exact quantiles vs DuckDB's
quantile_disc on randomized data (the independent implementation of the
same type-1 semantics)."""

from __future__ import annotations

import random

import duckdb
import pytest

from cubicerp_client_etl_spark.operators.quantiles import exact_quantiles

QS = [0.0, 0.07, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def test_matches_duckdb_quantile_disc_randomized(spark):
    rng = random.Random(42)
    vals = [rng.randint(0, 200) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r.q: r.value
        for r in exact_quantiles(df, "x", QS, out_col="value").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES {}) v(x)".format(
        ",".join(f"({v})" for v in vals)
    ))
    for q in QS:
        want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert got[q] == want, (q, got[q], want)


def test_min_max_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [(5,), (None,), (1,), (9,), (None,)], "x int"
    )
    got = {r.q: r.value for r in exact_quantiles(df, "x", [0.0, 1.0]).collect()}
    assert got[0.0] == 1 and got[1.0] == 9


def test_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [1.5])


def test_grouped_matches_duckdb_quantile_disc(spark):
    rng = random.Random(7)
    rows = [(f"g{rng.randint(0, 4)}", rng.randint(0, 60)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "g string, x long")
    from cubicerp_client_etl_spark.operators.quantiles import exact_quantiles_by

    got = {
        (r.g, r.q): r.value
        for r in exact_quantiles_by(df, "g", "x", [0.1, 0.5, 0.9]).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES {}) v(g, x)".format(
            ",".join(f"('{g}',{x})" for g, x in rows)
        )
    )
    for q in [0.1, 0.5, 0.9]:
        for g, want in con.execute(
            f"SELECT g, quantile_disc(x, {q}) FROM t GROUP BY g"
        ).fetchall():
            assert got[(g, q)] == want, (g, q)


def test_histogram_quantile_sketch_bound_certified(spark):
    """The equi-width sketch's contract on adversarial (skewed) data:
    est is the hit bucket's lower edge, the exact disc-quantile lies in
    [est, est + bound), and the whole thing is deterministic — checked
    against a pure-Python reference on a lognormal-ish pile plus a
    99%-heavy point mass."""
    import random

    from cubicerp_client_etl_spark.operators.quantiles import (
        exact_quantiles,
        histogram_quantile_sketch,
    )

    rnd = random.Random(11)
    vals = [int(rnd.expovariate(1 / 500)) for _ in range(4000)]
    vals += [7] * 6000  # heavy point mass
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    qs = [0.01, 0.5, 0.9, 0.99, 1.0]
    sk = {
        r.q: (r.est, r.bound)
        for r in histogram_quantile_sketch(df, "v", qs, n_buckets=64).collect()
    }
    ex = {r.q: r.value for r in exact_quantiles(df, "v", qs).collect()}
    lo, hi = min(vals), max(vals)
    w = (hi - lo + 64) // 64
    assert len(sk) == len(qs)
    for q in qs:
        est, bound = sk[q]
        assert bound == w
        assert est <= ex[q] < est + bound, (q, est, ex[q], bound)
        assert (est - lo) % w == 0  # lower edge of a bucket

    import pytest

    with pytest.raises(ValueError):
        histogram_quantile_sketch(df, "v", [])
    with pytest.raises(ValueError):
        histogram_quantile_sketch(df, "v", [1.5])
    with pytest.raises(ValueError):
        histogram_quantile_sketch(df, "v", [0.5], n_buckets=0)


def test_histogram_quantile_sketch_by_null_group_and_bounds(spark):
    """Keyed sketch: per-group grids, the NULL group (unattributed
    source) survives the null-safe grid join, and every group's exact
    disc-quantile lies in [est, est + bound)."""
    from cubicerp_client_etl_spark.operators.quantiles import (
        exact_quantiles_by,
        histogram_quantile_sketch_by,
    )

    rows = (
        [("a", v) for v in range(100)]
        + [("b", v * 1000) for v in range(50)]
        + [(None, v + 7) for v in range(30)]
    )
    df = spark.createDataFrame(rows, "g string, v long")
    qs = [0.5, 0.9]
    sk = {
        (r.g, r.q): (r.est, r.bound)
        for r in histogram_quantile_sketch_by(df, "g", "v", qs, n_buckets=16).collect()
    }
    ex = {
        (r.g, r.q): r.value
        for r in exact_quantiles_by(df, "g", "v", qs).collect()
    }
    assert set(sk) == {(g, q) for g in ("a", "b", None) for q in qs}
    for key, (est, bound) in sk.items():
        assert est <= ex[key] < est + bound, (key, est, ex[key], bound)
    # per-group grids: b's bound reflects b's (wide) range, not a's
    assert sk[("b", 0.5)][1] > sk[("a", 0.5)][1]


def test_histogram_quantile_sketch_property(spark):
    """Hypothesis: for any integer multiset (negatives included) and
    any q, the exact disc quantile lies in [est, est + bound)."""
    from hypothesis import given, settings, strategies as st

    from cubicerp_client_etl_spark.operators.quantiles import (
        histogram_quantile_sketch,
    )

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(st.integers(-(10**9), 10**9), min_size=1, max_size=60),
        q=st.sampled_from([0.0, 0.1, 0.5, 0.93, 1.0]),
        nb=st.sampled_from([1, 4, 16]),
    )
    def check(vals, q, nb):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        rows = histogram_quantile_sketch(df, "v", [q], n_buckets=nb).collect()
        assert len(rows) == 1
        est, bound = rows[0].est, rows[0].bound
        # exact disc quantile: smallest v with rank/n >= q (q=0 -> min)
        sv = sorted(vals)
        n = len(sv)
        exact = sv[0] if q == 0.0 else next(
            sv[i] for i in range(n) if (i + 1) / n >= q
        )
        assert est <= exact < est + bound, (vals, q, nb, est, exact, bound)

    check()
