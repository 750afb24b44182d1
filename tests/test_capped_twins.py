"""Round-13 capped-twin queries (q002/q003, birth q299/q300): the hot-bucket caps under
the oracle discipline. The operator-level cap laws (huge-cap ==
uncapped, boilerplate drop, brute-force equivalence) are already
pinned in test_dedup.py; these tests pin the QUERY-level contracts the
round-13 wave adds:

- the chunk family's fixture fingerprints are clustered enough that
  the 64 cap BITES even on the smallest fixture (the documents table
  holds 500 docs at every SF): q002 must report a non-zero hot census
  and a strictly smaller candidate set than uncapped q050, and the cap
  may only ever DROP candidates, never invent them;
- the setsim universe cap (16) cannot bite on the small fixture (max
  shingle doc-frequency is 7), so q003 must reproduce q217's exact
  full-universe clustering row for row — the cap is a pure opt-in,
  not a semantic drift.
"""

from __future__ import annotations

from cubicerp_client_etl_spark.queries import REGISTRY

SF_TINY = "/root/testdata/sf0.001"


def _row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_capped_simhash_bites_and_only_drops(spark):
    capped = _row(REGISTRY["q002_simhash_capped_blocking"].fn(spark, SF_TINY))
    plain = _row(REGISTRY["q050_simhash_blocking"].fn(spark, SF_TINY))
    assert capped["hot_buckets"] > 0
    assert capped["hot_pair_mass"] > 0
    assert capped["n_cand"] < plain["n_cand"]
    # the cap may only ever DROP candidates, never invent them
    assert capped["n_within3"] <= plain["n_within3"]
    assert capped["planted_found"] <= plain["planted_found"]
    assert capped["n_planted"] == plain["n_planted"]


def test_capped_retention_coincides_with_exact_when_cap_cannot_bite(spark):
    capped = {
        tuple(r)
        for r in REGISTRY["q003_fuzzy_dedup_retention_capped"]
        .fn(spark, SF_TINY)
        .collect()
    }
    exact = {
        tuple(r)
        for r in REGISTRY["q217_fuzzy_dedup_retention"].fn(spark, SF_TINY).collect()
    }
    assert capped == exact


def test_capped_lsh_coincides_when_cap_cannot_bite(spark):
    # r14 twin (q021, birth q307): at the tiny fixture no hyperplane bucket exceeds
    # occupancy 8 (the 500-vector embeddings table is shared by
    # sf0.001/sf0.01), so the 16 cap is a pure opt-in there — the
    # capped law must reproduce uncapped q209 row for row.
    capped = {
        tuple(r)
        for r in REGISTRY["q021_lsh_bucketed_pairs_capped"]
        .fn(spark, SF_TINY)
        .collect()
    }
    plain = {
        tuple(r)
        for r in REGISTRY["q209_lsh_bucketed_pairs"].fn(spark, SF_TINY).collect()
    }
    assert capped == plain
    assert len(capped) > 0


def test_capped_lsh_bites_and_only_drops_at_sf01(spark):
    # at sf0.1 the 2000-vector corpus pushes 9 buckets over occupancy
    # 16 (max 26) — the cap must BITE (strictly fewer pairs) and may
    # only ever DROP pairs, never invent or alter one (drop-only law).
    sf = "/root/testdata/sf0.1"
    capped = {
        tuple(r)
        for r in REGISTRY["q021_lsh_bucketed_pairs_capped"].fn(spark, sf).collect()
    }
    plain = {
        tuple(r)
        for r in REGISTRY["q209_lsh_bucketed_pairs"].fn(spark, sf).collect()
    }
    assert capped < plain  # strict subset: bites, and drop-only


def _cash_app_frames(spark, sf, cap):
    # q312's whole-dollar fixture, run through the operator directly so
    # the capped and uncapped laws share one fixture
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.catalog import load
    from cubicerp_client_etl_spark.operators.finance import (
        cash_application_match,
    )

    orders = load(spark, sf, "orders")
    amt = F.expr(
        "CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) * 100"
    )
    invoices = orders.select(
        F.col("o_orderkey").cast("bigint").alias("inv_id"),
        amt.alias("amount_cents"),
        F.to_date("o_orderdate").alias("inv_date"),
    )
    stmts = orders.where(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_orderkey") + 500000000).cast("bigint").alias("stmt_id"),
        amt.alias("amount_cents"),
        F.expr(
            "date_add(CAST(o_orderdate AS DATE), "
            "CAST(o_orderkey % 10 + 1 AS INT))"
        ).alias("value_date"),
    )
    return cash_application_match(
        stmts, invoices, max_lag_days=10, hot_amount_cap=cap
    )


def test_capped_cash_application_coincides_at_sf001(spark):
    # r15 twin (q312): at sf0.01 no whole-dollar amount exceeds
    # occupancy 2 on either side, so the 4-cap is a pure opt-in —
    # the capped law must reproduce the uncapped one row for row.
    sf = "/root/testdata/sf0.01"
    capped = {tuple(r) for r in _cash_app_frames(spark, sf, 4).collect()}
    plain = {tuple(r) for r in _cash_app_frames(spark, sf, None).collect()}
    assert capped == plain
    assert len(capped) > 0


def test_capped_cash_application_bites_and_restricts_at_sf01(spark):
    # at sf0.1 twelve whole-dollar amounts push past occupancy 4 — the
    # cap must BITE, and per-amount independence means the capped
    # output is EXACTLY the uncapped output restricted to non-hot
    # amounts (stronger than drop-only: surviving pairs are
    # bit-identical, not merely a subset).
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.1"
    capped_df = _cash_app_frames(spark, sf, 4)
    plain_df = _cash_app_frames(spark, sf, None)
    capped = {tuple(r) for r in capped_df.collect()}
    plain = {tuple(r) for r in plain_df.collect()}
    assert capped < plain  # strict subset: the cap bites
    # hot amounts from the fixture occupancy censuses, not the output
    from cubicerp_client_etl_spark.catalog import load

    orders = load(spark, sf, "orders")
    amt = F.expr(
        "CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2))) AS BIGINT) * 100"
    )
    occ_i = (
        orders.groupBy(amt.alias("a")).agg(F.count(F.lit(1)).alias("c"))
    )
    occ_s = (
        orders.where(F.col("o_orderkey") % 3 == 0)
        .groupBy(amt.alias("a"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hot = {r.a for r in occ_i.where(F.col("c") > 4).collect()} | {
        r.a for r in occ_s.where(F.col("c") > 4).collect()
    }
    assert hot, "fixture regression: no hot amounts at sf0.1"
    restricted = {t for t in plain if t[2] not in hot}
    assert capped == restricted
