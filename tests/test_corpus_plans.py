"""Corpus-wide plan invariants: every registered query must build an
executable physical plan, and none may contain a cartesian product —
the one join shape that is always a scale-killer between data-sized
sides. (Broadcast nested-loop joins against bounded dims/aggregates are
allowed; specific per-query shapes are pinned in test_plan_posture.py.)
"""

from __future__ import annotations

from cubicerp_client_etl_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def test_every_query_plans_without_cartesian(spark):
    failures = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, SF_SMOKE)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            failures[name] = f"plan build failed: {str(ex)[:120]}"
            continue
        if "CartesianProduct" in plan:
            failures[name] = "CartesianProduct in physical plan"
    assert not failures, failures
