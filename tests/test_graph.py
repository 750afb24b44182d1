"""Unit tests for distributed connected components (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.graph import connected_components


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges or [(-1, -1)], "src long, dst long")
    if not edges:
        edf = edf.filter(F.lit(False))
    out = connected_components(ndf, edf)
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain_propagates_beyond_one_hop(spark):
    # 0-1-2-3-4 chain: diameter 4 forces multiple propagation rounds
    got = _cc(spark, range(5), [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert got == {i: 0 for i in range(5)}


def test_isolated_nodes_self_labeled(spark):
    got = _cc(spark, range(4), [(2, 3)])
    assert got == {0: 0, 1: 1, 2: 2, 3: 2}


def test_directed_input_is_symmetrized(spark):
    # edge only given as (high → low); low id must still win the label
    got = _cc(spark, [10, 20], [(20, 10)])
    assert got == {10: 10, 20: 10}


def test_two_components_dont_merge(spark):
    got = _cc(spark, range(6), [(0, 1), (1, 2), (4, 5)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [7, 8], [])
    assert got == {7: 7, 8: 8}


def test_pagerank_int_invariants(spark):
    from cubicerp_client_etl_spark.operators.graph import pagerank_int

    # star graph: hub h <-> a,b,c (undirected)
    pairs = [("h", x) for x in ("a", "b", "c")]
    edges = spark.createDataFrame(
        [(s, d) for s, d in pairs] + [(d, s) for s, d in pairs],
        "src string, dst string",
    )
    r = {row.node: row.units for row in pagerank_int(edges, iterations=5).collect()}
    assert set(r) == {"h", "a", "b", "c"}
    # teleport floor holds for every node (default unit 10**9 → 0.15e9)
    assert all(u >= 150_000_000 for u in r.values())
    # the hub dominates the leaves; leaves are symmetric → exactly equal
    assert r["h"] > r["a"]
    assert r["a"] == r["b"] == r["c"]
    # bit-determinism: a second run is identical
    r2 = {row.node: row.units for row in pagerank_int(edges, iterations=5).collect()}
    assert r == r2


def test_pointer_jump_resolves_deep_chain(spark):
    from cubicerp_client_etl_spark.operators.graph import pointer_jump_roots

    # chain 0<-1<-2<-...<-12 (depth 12) plus a separate root 100
    rows = [(0, 0), (100, 100)] + [(i, i - 1) for i in range(1, 13)]
    df = spark.createDataFrame(rows, "node long, parent long")
    out = {r["node"]: (r["root"], r["depth"]) for r in
           pointer_jump_roots(df, rounds=4).collect()}
    assert out[0] == (0, 0)
    assert out[12] == (0, 12)  # depth 12 < 2^4
    assert out[100] == (100, 0)
    assert out[5] == (0, 5)


def test_pointer_jump_rounds_beyond_depth_are_noops(spark):
    from cubicerp_client_etl_spark.operators.graph import pointer_jump_roots

    rows = [(0, 0), (1, 0), (2, 1)]
    df = spark.createDataFrame(rows, "node long, parent long")
    a = sorted(map(tuple, pointer_jump_roots(df, rounds=2).collect()))
    b = sorted(map(tuple, pointer_jump_roots(df, rounds=6).collect()))
    assert a == b == [(0, 0, 0), (1, 0, 1), (2, 0, 2)]


def test_pointer_jump_dangling_parent_not_dropped(spark):
    """ADVICE r2: a node pointing at an id absent from the input must
    survive to the output (left join) instead of vanishing, and
    validate=True must flag it as a non-fixpoint root."""
    import pytest

    from cubicerp_client_etl_spark.operators.graph import pointer_jump_roots

    # node 3 points at 99 which has no row — violated contract
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 99)], "node long, parent long"
    )
    out = {r["node"]: r["root"] for r in pointer_jump_roots(df, rounds=3).collect()}
    assert set(out) == {1, 2, 3}  # nothing dropped
    assert out[1] == 1 and out[2] == 1
    assert out[3] == 99  # surfaced as-is, not silently resolved

    with pytest.raises(ValueError, match="non-root"):
        pointer_jump_roots(df, rounds=3, validate=True)
    # clean forest passes validation
    clean = spark.createDataFrame([(1, 1), (2, 1)], "node long, parent long")
    assert pointer_jump_roots(clean, rounds=2, validate=True).count() == 2


def test_pointer_jump_insufficient_rounds_flagged(spark):
    import pytest

    from cubicerp_client_etl_spark.operators.graph import pointer_jump_roots

    # chain of depth 8 needs rounds >= 3; rounds=1 reaches only depth 2
    chain = [(i, max(i - 1, 0)) for i in range(9)]
    df = spark.createDataFrame(chain, "node long, parent long")
    with pytest.raises(ValueError, match="rounds"):
        pointer_jump_roots(df, rounds=1, validate=True)
    assert (
        pointer_jump_roots(df, rounds=4, validate=True)
        .filter("root = 0").count() == 9
    )
