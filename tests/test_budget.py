"""Unit tests for operators/budget.py (token-budget selection and
round-robin interleaving)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.budget import (
    interleave_round_robin,
    shuffle_key,
    token_budget_select,
)


def _docs(spark):
    rows = [
        (i, "web" if i % 3 else "books", 10 * (1 + i % 5)) for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, domain string, toks long")


def test_budget_selects_prefix_under_deterministic_order(spark):
    docs = _docs(spark)
    out = token_budget_select(
        docs, "domain", "toks", "doc_id", budget=100, seed="s"
    ).collect()
    # every kept row's cumulative total is within budget
    assert all(r.cum_tokens <= 100 for r in out)
    # the selection is the PREFIX of the md5-shuffled order: recompute
    # the order driver-side and check the kept set matches a greedy walk
    ordered = (
        docs.withColumn("_h", shuffle_key("doc_id", "s"))
        .orderBy("domain", "_h", "doc_id")
        .collect()
    )
    expect = set()
    cum: dict[str, int] = {}
    for r in ordered:
        c = cum.get(r.domain, 0) + r.toks
        cum[r.domain] = c
        if c <= 100:
            expect.add(r.doc_id)
    assert {r.doc_id for r in out} == expect


def test_budget_is_rerun_stable(spark):
    docs = _docs(spark)
    a = {
        r.doc_id
        for r in token_budget_select(
            docs, "domain", "toks", "doc_id", budget=150
        ).collect()
    }
    b = {
        r.doc_id
        for r in token_budget_select(
            docs.repartition(7), "domain", "toks", "doc_id", budget=150
        ).collect()
    }
    assert a == b


def test_budget_mapping_unlisted_domain_gets_zero(spark):
    docs = _docs(spark)
    out = token_budget_select(
        docs, "domain", "toks", "doc_id", budget={"books": 200}
    ).collect()
    assert out and all(r.domain == "books" for r in out)


def test_interleave_positions_unique_and_round_robin(spark):
    docs = _docs(spark)
    out = interleave_round_robin(docs, "domain", "doc_id", seed="x").collect()
    pos = [r.global_pos for r in out]
    assert len(pos) == len(set(pos)) == 60
    # two domains: books ≡ 0 (mod 2), web ≡ 1 (mod 2) by name order
    for r in out:
        assert r.global_pos % 2 == (0 if r.domain == "books" else 1)
    # per-domain order of positions matches the md5-shuffle order
    out_sorted = sorted(
        (r for r in out if r.domain == "web"), key=lambda r: r.global_pos
    )
    web_order = (
        docs.where(F.col("domain") == "web")
        .withColumn("_h", shuffle_key("doc_id", "x"))
        .orderBy("_h", "doc_id")
        .collect()
    )
    assert [r.doc_id for r in out_sorted] == [r.doc_id for r in web_order]


def test_budget_prefix_property_randomized(spark):
    """Property (randomized inputs): for any weights and budget, the
    kept set per domain is exactly the maximal prefix of the
    md5-shuffled order whose running total (counting every doc seen)
    stays within budget."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(123)
    for trial in range(3):
        n = rng.randint(5, 120)
        budget = rng.randint(1, 300)
        rows = [
            (i, rng.choice(["a", "b", "c"]), rng.randint(1, 60))
            for i in range(n)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, domain string, toks long")
        out = token_budget_select(
            docs, "domain", "toks", "doc_id", budget=budget, seed=f"s{trial}"
        ).collect()
        ordered = (
            docs.withColumn("_h", shuffle_key("doc_id", f"s{trial}"))
            .orderBy("domain", "_h", "doc_id")
            .collect()
        )
        cum: dict[str, int] = {}
        want: dict[int, int] = {}
        for r in ordered:
            c = cum.get(r.domain, 0) + r.toks
            cum[r.domain] = c
            if c <= budget:
                want[r.doc_id] = c
        assert {r.doc_id: r.cum_tokens for r in out} == want, (trial, budget)


def test_budget_single_hot_domain_spreads_and_stays_exact(spark):
    """The reason prefix_sum_by exists: ONE domain holding every row
    (the boilerplate/web-dump shape) must still compute the exact
    running sum — and must NOT funnel all rows through a single window
    partition. Correctness vs a driver-side walk; spread verified by
    the physical plan's windows all carrying _pid."""
    rows = [(i, "web", (i * 7) % 23 + 1) for i in range(5_000)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, toks long")
    out = token_budget_select(
        docs, "domain", "toks", "doc_id", budget=3_000, seed="hot"
    )
    got = {r.doc_id: r.cum_tokens for r in out.collect()}
    ordered = (
        docs.withColumn("_h", shuffle_key("doc_id", "hot"))
        .orderBy("_h", "doc_id")
        .collect()
    )
    cum, want = 0, {}
    for r in ordered:
        cum += r.toks
        if cum <= 3_000:
            want[r.doc_id] = cum
    assert got == want
    import re

    plan = out._jdf.queryExecution().executedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec, spec


def test_null_domain_is_a_valid_group_in_both_operators(spark):
    """ADVICE r5: NULL domains must neither be dropped (interleave's
    old inner join) nor treated inconsistently between the two
    operators."""
    rows = [(1, None, 10), (2, None, 20), (3, "a", 5), (4, "a", 6)]
    docs = spark.createDataFrame(rows, "doc_id long, domain string, toks long")
    sel = token_budget_select(docs, "domain", "toks", "doc_id", budget=100)
    assert {r.doc_id for r in sel.collect()} == {1, 2, 3, 4}
    inter = interleave_round_robin(docs, "domain", "doc_id").collect()
    assert {r.doc_id for r in inter} == {1, 2, 3, 4}  # nothing dropped
    pos = [r.global_pos for r in inter]
    assert len(pos) == len(set(pos)) == 4
    # NULL sorts first in the domain index (asc_nulls_first) -> didx 0
    for r in inter:
        assert r.global_pos % 2 == (0 if r.domain is None else 1)
