"""Property tests (SURVEY §5.2.5): the Odoo-domain compiler against its
pure-Python reference evaluator over arbitrary generated domains and
rows (FIXTURES.md B7)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.compilers.domain import (
    DomainError,
    compile_domain,
    eval_domain,
)

FIELDS = ["f_int", "f_str", "f_float"]

_values = {
    "f_int": st.one_of(st.none(), st.integers(-5, 5)),
    "f_str": st.one_of(st.none(), st.sampled_from(["alpha", "Beta", "gamma", "ALPHA", ""])),
    "f_float": st.one_of(st.none(), st.floats(-2, 2, allow_nan=False).map(lambda x: round(x, 2))),
}


def _term(field: str):
    v = _values[field]
    comparable = v.filter(lambda x: x is not None)
    if field == "f_str":
        ops = st.sampled_from(["=", "!=", "in", "not in", "like", "ilike", ">", "<", ">=", "<="])
    else:
        ops = st.sampled_from(["=", "!=", "in", "not in", ">", "<", ">=", "<="])

    def build(op):
        if op in ("in", "not in"):
            return st.lists(comparable, min_size=1, max_size=3).map(
                lambda vs: (field, op, vs)
            )
        if op in (">", "<", ">=", "<=", "like", "ilike"):
            return comparable.map(lambda val: (field, op, val))
        return v.map(lambda val: (field, op, val))

    return ops.flatmap(build)


terms = st.sampled_from(FIELDS).flatmap(_term)


@st.composite
def domains(draw, max_terms=4):
    # build a well-formed polish-notation domain: a sequence of
    # expressions, each either a term or op applied to sub-expressions
    def expr(depth):
        choice = draw(st.integers(0, 3)) if depth < 2 else 0
        if choice == 0:
            return [draw(terms)]
        if choice == 1:
            return ["!"] + expr(depth + 1)
        op = "&" if choice == 2 else "|"
        return [op] + expr(depth + 1) + expr(depth + 1)

    n = draw(st.integers(1, max_terms))
    out = []
    for _ in range(n):
        out.extend(expr(0))
    return out


rows_st = st.fixed_dictionaries({f: _values[f] for f in FIELDS})


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.filter_too_much, HealthCheck.too_slow],
)
@given(domain=domains(), rows=st.lists(rows_st, min_size=1, max_size=8))
def test_compiled_domain_matches_reference_eval(spark, domain, rows):
    df = spark.createDataFrame(
        [(r["f_int"], r["f_str"], r["f_float"]) for r in rows],
        "f_int int, f_str string, f_float double",
    )
    got = sorted(
        (tuple(r) for r in df.filter(compile_domain(domain)).collect()),
        key=lambda t: tuple(str(x) for x in t),
    )
    want = sorted(
        ((r["f_int"], r["f_str"], r["f_float"]) for r in rows if eval_domain(domain, r)),
        key=lambda t: tuple(str(x) for x in t),
    )
    assert got == want, f"domain={domain}"


def test_empty_domain_selects_all(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    assert df.filter(compile_domain([])).count() == 2


def test_malformed_domain_raises():
    with pytest.raises(DomainError):
        compile_domain([("f", "~=", 1)])
    with pytest.raises(DomainError):
        compile_domain(["&", ("f", "=", 1)])  # dangling operator


def test_null_semantics(spark):
    df = spark.createDataFrame([(None,), ("x",)], "f_str string")
    assert df.filter(compile_domain([("f_str", "=", None)])).count() == 1
    assert df.filter(compile_domain([("f_str", "!=", None)])).count() == 1
    # NULL never matches a value comparison (SQL 3VL), unlike Odoo's
    # False-folding — documented divergence (SURVEY §1.3)
    assert df.filter(compile_domain([("f_str", "!=", "x")])).count() == 0


def test_ilike_and_like(spark):
    df = spark.createDataFrame([("Customer#1",), ("CUSTOMER#2",), ("supplier",)], "s string")
    assert df.filter(compile_domain([("s", "ilike", "customer")])).count() == 2
    assert df.filter(compile_domain([("s", "like", "Customer")])).count() == 1
    assert df.filter(compile_domain([("s", "=like", "C%1")])).count() == 1
