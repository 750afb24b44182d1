#!/usr/bin/env python
"""Synthesize a larger fixture set by replicating the sf0.1 fact tables
with shifted ids (dimensions stay fixed — how real warehouses grow).

Writes /root/repo/.scaledata/sf<factor/10>/*.parquet (git-ignored).
Used for local scaling experiments: run bench.py with
SPARK_GRAFT_SF_DIR pointing at the output and compare per-query times
against sf0.1 — a plan that holds should scale ~linearly in fact rows
(constant overhead amortizes; anything superlinear is a red flag).

Usage: python tools/scale_up.py [factor]   (default 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import TABLES, load
from cubicerp_client_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFF = 100_000_000  # id shift per copy — far above any sf0.1 key

# fact tables and the id columns shifted per copy; FK pairs shift in
# lockstep (lineitem.l_orderkey tracks orders.o_orderkey; events keep
# per-user density by shifting user_id too). Dimension FKs (custkey,
# partkey, suppkey) stay, pointing at the unscaled dims.
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = f"/root/repo/.scaledata/sf{factor / 10:g}"
    spark = get_spark(app_name="scale_up")
    for name in TABLES:
        df = load(spark, SRC, name)
        if name in FACTS:
            copies = []
            for i in range(factor):
                c = df
                for col in FACTS[name]:
                    c = c.withColumn(col, F.col(col) + F.lit(i * OFF))
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionAll(c)
        df.coalesce(max(1, factor // 2)).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: written")
    print(f"done -> {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
