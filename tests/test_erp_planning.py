"""Round-13 planning wave (BOM rollup q012, MRP netting q014 — birth q303/q304): pin the
exact arithmetic against independent brute-force Python on the fixture
(the oracles prove Spark==DuckDB; these prove both match the spec)."""

from __future__ import annotations

import duckdb

from cubicerp_client_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _parts():
    return duckdb.sql(
        f"SELECT p_partkey, CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 "
        f"AS BIGINT) AS own FROM '{SF}/part.parquet'"
    ).fetchall()


def test_bom_rollup_matches_bruteforce_recursion(spark):
    own = dict(_parts())
    qty = {p: 1 + p % 3 for p in own}
    kids: dict[int, list[int]] = {}
    for p in own:
        if p >= 10:
            kids.setdefault(p // 10, []).append(p)

    def rolled(p: int) -> int:
        return own[p] + sum(qty[c] * rolled(c) for c in kids.get(p, ()))

    def n_desc(p: int) -> int:
        return sum(1 + n_desc(c) for c in kids.get(p, ()))

    got = {
        r.p_partkey: (r.n_descendants, r.rolled_cost_cents)
        for r in REGISTRY["q012_bom_cost_rollup"].fn(spark, SF).collect()
    }
    want = {
        p: (n_desc(p), rolled(p)) for p in own if kids.get(p)
    }
    assert got == want and got  # every assembly, exact cents


def test_mrp_netting_invariants_and_hand_series(spark):
    rows = REGISTRY["q014_mrp_net_requirements"].fn(spark, SF).collect()
    assert rows
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r)
    for pk, rs in by_part.items():
        rs.sort(key=lambda r: r.ym)
        onhand0 = 100 + (pk % 7) * 50
        lot = 50 + (pk % 5) * 25
        onhand = onhand0
        for r in rs:
            # orders are non-negative lot multiples
            assert r.planned_order_qty >= 0
            assert r.planned_order_qty % lot == 0
            # simulate the period: receive planned orders, consume gross
            onhand = onhand + r.planned_order_qty - r.gross_qty
            assert r.projected_on_hand == onhand
            # netting never leaves a shortfall, and never over-orders by
            # more than one lot's headroom
            assert 0 <= onhand
            if r.planned_order_qty > 0:
                assert onhand < lot
