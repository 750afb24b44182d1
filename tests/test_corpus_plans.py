"""Corpus-wide plan invariants: every registered query must build an
executable physical plan, none may contain a cartesian product — the
one join shape that is always a scale-killer between data-sized sides —
and every UNPARTITIONED window must be provably bounded by construction
(VERDICT r5 #3: the bench log's benign `WindowExec: No Partition
Defined` warnings all come from offset/count-table frames; this test
makes that a checked invariant so a future data-sized global window
can't hide in the noise). (Broadcast nested-loop joins against bounded
dims/aggregates are allowed; specific per-query shapes are pinned in
test_plan_posture.py.)
"""

from __future__ import annotations

from cubicerp_client_etl_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

# ---- physical-plan tree walk (py4j) ---------------------------------------

# Cardinality-REDUCING sources: a grouping/global aggregate's output is
# the distinct-key count of its input (count tables, offset tables,
# domain dims, partition totals) — the "bounded by construction" frames
# the two-phase scans window over. Literal frames are bounded outright.
_BOUNDED_SOURCES = {
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "LocalTableScan",
    "EmptyRelation",
    # a global limit / top-k bounds its OUTPUT at the literal k no
    # matter what feeds it (a LocalLimit alone does not — per-partition
    # k × #partitions grows with the cluster, so it stays pass-through)
    "GlobalLimit",
    "TakeOrderedAndProject",
    "CollectLimit",
}

# Cardinality-NON-INCREASING (or bounded-combining) operators a bounded
# frame may flow through on its way to the window. Joins require ALL
# inputs bounded (handled in _bounded); anything not listed — explode
# Generates, file scans, checkpointed data (Scan ExistingRDD is the
# DATA-SIZED two-phase-scan input!), streaming sources — breaks the
# boundedness proof.
_PASS_THROUGH = {
    "Project",
    "Filter",
    "Sort",
    "Exchange",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "BroadcastExchange",
    "ReusedExchange",
    "TableCacheQueryStage",
    "InMemoryTableScan",
    "Coalesce",
    "ColumnarToRow",
    "RowToColumnar",
    "InputAdapter",
    "WholeStageCodegen",
    "Window",
    "WindowGroupLimit",
    "RunningWindowFunction",
    "Limit",
    "LocalLimit",
    "Union",
    "Expand",
    "Subquery",
    "SubqueryBroadcast",
    "AdaptiveSparkPlan",
    "ResultQueryStage",
    "DeserializeToObject",
    "SerializeFromObject",
}

_JOINS = {
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "ShuffledHashJoin",
    "SortMergeJoin",
}


def _name(node) -> str:
    # "WholeStageCodegen (3)" -> "WholeStageCodegen"
    return node.nodeName().split("(")[0].strip()


def _children(node):
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    # AdaptiveSparkPlanExec holds its plan out-of-band, not as a child
    if _name(node) == "AdaptiveSparkPlan":
        out.append(node.inputPlan())
    return out


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def _bounded(node) -> bool:
    """True iff this subtree's row count is provably bounded by
    construction: it bottoms out in aggregates/literal tables through
    cardinality-non-increasing operators (joins: every input bounded)."""
    name = _name(node)
    if name in _BOUNDED_SOURCES:
        return True
    kids = _children(node)
    if name in _JOINS or name in _PASS_THROUGH:
        return bool(kids) and all(_bounded(c) for c in kids)
    # anything else — scans, Scan ExistingRDD (checkpointed DATA),
    # Generate/explode, Python evals, streaming — is not provably
    # bounded. Fail closed: whitelist by construction, not by name.
    return False


def _unpartitioned_windows(root):
    """(node, reason) for every Window/WindowGroupLimit with an EMPTY
    partition spec whose input is not provably bounded."""
    bad = []
    for node in _walk(root):
        if _name(node) not in ("Window", "WindowGroupLimit", "WindowInPandas"):
            continue
        try:
            empty_part = node.partitionSpec().isEmpty()
        except Exception:  # noqa: BLE001 — node without a partitionSpec
            continue
        if not empty_part:
            continue
        kids = _children(node)
        if not kids or not all(_bounded(c) for c in kids):
            bad.append(node.nodeName())
    return bad


def test_every_query_plans_without_cartesian_or_unbounded_global_window(spark):
    failures = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, SF_SMOKE)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            failures[name] = f"plan build failed: {str(ex)[:120]}"
            continue
        if "CartesianProduct" in plan:
            failures[name] = "CartesianProduct in physical plan"
            continue
        bad = _unpartitioned_windows(qe.executedPlan())
        if bad:
            failures[name] = f"unbounded global window(s): {bad[:2]}"
    assert not failures, failures


def test_boundedness_walker_catches_a_planted_global_window(spark):
    """Self-test of the invariant: a global cumsum over a DATA-SIZED
    frame (parquet scan) must be flagged; the same window over an
    aggregate's output must pass."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cubicerp_client_etl_spark.catalog import load

    li = load(spark, SF_SMOKE, "lineitem")
    w = Window.orderBy("l_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    planted = li.withColumn("c", F.sum("l_quantity").over(w))
    assert _unpartitioned_windows(planted._jdf.queryExecution().executedPlan())

    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    wa = Window.orderBy("l_returnflag").rowsBetween(Window.unboundedPreceding, 0)
    fine = agg.withColumn("c", F.sum("s").over(wa))
    assert not _unpartitioned_windows(fine._jdf.queryExecution().executedPlan())
