#!/usr/bin/env python
"""Dump `explain("formatted")` for a list of queries to per-query files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX [query ...]
       (no query args = the headline set)

Writes OUTDIR/<query>_<SUFFIX>.txt — the optimization-round evidence
format (plans/r15/<query>_before.txt / _after.txt). Plan capture is
driver-only; queries whose builder runs jobs (PCA/k-means collect
their bounded iterates) execute those as usual.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cubicerp_client_etl_spark.queries import REGISTRY
from cubicerp_client_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: dump_plans.py OUTDIR SUFFIX [query ...]")
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or [n for n, q in sorted(REGISTRY.items()) if q.headline]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR} [{suffix}]\n\n{plan}")
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
