#!/usr/bin/env python
"""Ad-hoc A/B timing of registered queries for optimization evidence.

Times each named query with the noop sink (guide §1.4) on a warm
get_spark session, N runs (default 3), prints per-query median/best/all
samples as one JSON line per query. Data dir from --dir (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1).

Usage: python tools/ab_time.py [--dir DIR] [--runs N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cubicerp_client_etl_spark.queries import REGISTRY
from cubicerp_client_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="ab_time")
    spark.read.parquet(f"{args.dir}/region.parquet").count()
    for name in args.queries:
        q = REGISTRY[name]
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "query": name,
                    "dir": args.dir,
                    "median": round(statistics.median(samples), 3),
                    "best": min(samples),
                    "samples": samples,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
