"""Odoo-style domain expressions → Spark Column predicates (SURVEY B5).

The reference forwards domain lists to a remote server's ``search``
(``cubicerpetl/cubicerpetl.py:327`` for RPC, ``:281-282`` for DBF); this
engine owns the evaluation by compiling the domain into a single Catalyst
``Column`` predicate, so filters participate in predicate pushdown and
whole-stage codegen like any other ``df.filter``.

Domain grammar (prefix/polish notation):

* a *term* is a ``(field, operator, value)`` triple;
* ``'&'``, ``'|'`` are binary prefix operators, ``'!'`` unary;
* consecutive top-level operands are implicitly AND-ed.

Supported term operators (the set the reference's corpus uses):
``= != <> in not in like ilike =like =ilike > < >= <=``.

NULL semantics deliberately diverge from Odoo's False-folding (SURVEY
§1.3): ``('f', '=', None)`` compiles to ``IS NULL`` and ``('f', '!=',
None)`` to ``IS NOT NULL``; everything else keeps standard SQL
three-valued logic (so results match a SQL oracle exactly).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

Term = tuple  # (field, op, value)
Domain = Sequence  # list of terms and '&' '|' '!' tokens


class DomainError(ValueError):
    pass


def _like_to_regex_free(col: Column, pattern: str, case_insensitive: bool) -> Column:
    # Odoo `like`/`ilike` are substring matches: LIKE '%' || v || '%'.
    if case_insensitive:
        return F.upper(col).contains(F.lit(str(pattern).upper()))
    return col.contains(F.lit(pattern))


def _compile_term(term: Term) -> Column:
    if not (isinstance(term, (tuple, list)) and len(term) == 3):
        raise DomainError(f"malformed domain term: {term!r}")
    field, op, value = term
    col = F.col(field)
    if op == "=":
        return col.isNull() if value is None else (col == F.lit(value))
    if op in ("!=", "<>"):
        return col.isNotNull() if value is None else (col != F.lit(value))
    if op == "in":
        return col.isin(list(value))
    if op == "not in":
        return ~col.isin(list(value))
    if op == "like":
        return _like_to_regex_free(col, value, case_insensitive=False)
    if op == "ilike":
        return _like_to_regex_free(col, value, case_insensitive=True)
    if op == "=like":
        return col.like(str(value))
    if op == "=ilike":
        return col.ilike(str(value))
    if op == ">":
        return col > F.lit(value)
    if op == "<":
        return col < F.lit(value)
    if op == ">=":
        return col >= F.lit(value)
    if op == "<=":
        return col <= F.lit(value)
    raise DomainError(f"unsupported domain operator: {op!r}")


def compile_domain(domain: Domain) -> Column:
    """Compile a full domain list into one Column predicate.

    Empty domain → TRUE (matches Odoo: empty search domain selects all).
    """
    if not domain:
        return F.lit(True)
    tokens = list(domain)

    def parse() -> Column:
        if not tokens:
            raise DomainError("domain ended mid-expression")
        tok = tokens.pop(0)
        if tok == "&":
            return parse() & parse()
        if tok == "|":
            return parse() | parse()
        if tok == "!":
            return ~parse()
        return _compile_term(tok)

    exprs = []
    while tokens:
        exprs.append(parse())
    pred = exprs[0]
    for e in exprs[1:]:  # implicit AND between top-level operands
        pred = pred & e
    return pred


# ---------------------------------------------------------------------------
# Reference evaluator (driver-side, for property tests only — never in a
# data path). Mirrors compile_domain's semantics over a plain dict row.
# ---------------------------------------------------------------------------


def _eval_term(term: Term, row: dict) -> bool | None:
    field, op, value = term
    v = row.get(field)
    if op == "=":
        return v is None if value is None else (None if v is None else v == value)
    if op in ("!=", "<>"):
        return v is not None if value is None else (None if v is None else v != value)
    if v is None:
        return None  # SQL three-valued logic: NULL op x → NULL
    if op == "in":
        return v in list(value)
    if op == "not in":
        return v not in list(value)
    if op == "like":
        return str(value) in str(v)
    if op == "ilike":
        return str(value).upper() in str(v).upper()
    if op == ">":
        return v > value
    if op == "<":
        return v < value
    if op == ">=":
        return v >= value
    if op == "<=":
        return v <= value
    raise DomainError(f"unsupported domain operator: {op!r}")


def eval_domain(domain: Domain, row: dict) -> bool:
    """Three-valued evaluation collapsed to a filter decision (NULL→False)."""
    if not domain:
        return True
    tokens = list(domain)

    def parse() -> Callable[[], Any]:
        tok = tokens.pop(0)
        if tok == "&":
            a, b = parse(), parse()
            return lambda: _and3(a(), b())
        if tok == "|":
            a, b = parse(), parse()
            return lambda: _or3(a(), b())
        if tok == "!":
            a = parse()
            return lambda: _not3(a())
        return lambda t=tok: _eval_term(t, row)

    exprs = []
    while tokens:
        exprs.append(parse())
    acc = exprs[0]()
    for e in exprs[1:]:
        acc = _and3(acc, e())
    return acc is True


def _and3(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or3(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _not3(a):
    return None if a is None else (not a)
