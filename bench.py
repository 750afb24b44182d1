#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": <total_sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute + count-style consume) on
a warm session; the session itself (JVM startup) is excluded — that's
harness cost, not engine cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cubicerp_client_etl_spark.queries import REGISTRY
from cubicerp_client_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="bench")
    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    names = [n for n, q in sorted(REGISTRY.items()) if q.headline]
    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        df = q.fn(spark, SF_DIR)
        # consume the full result without driver-materializing rows
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
