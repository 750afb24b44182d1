#!/usr/bin/env python
"""Dump the formatted physical plans of the headline queries to
PLANS.md — the artifact a plan audit reads: scan pushdown/pruning,
exchange count, broadcast vs shuffle joins, whole-stage codegen spans.

Regenerate after plan-affecting changes: python tools/plan_digest.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cubicerp_client_etl_spark.queries import REGISTRY
from cubicerp_client_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="plan_digest")
    names = [n for n, q in sorted(REGISTRY.items()) if q.headline]
    lines = [
        "# Headline-query physical plans",
        "",
        f"`explain(formatted)` at `{SF_DIR}` — regenerate with "
        "`python tools/plan_digest.py`. What to look for: "
        "`PushedFilters`/`ReadSchema` on scans (pushdown + pruning), "
        "`Exchange` count (shuffles), `BroadcastHashJoin` on dims, "
        "`partial_*` aggregates before exchanges (map-side combine), "
        "no `CartesianProduct` anywhere.",
        "",
    ]
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md: {len(names)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
