"""Count-min sketch with an engine-portable, deterministic hash family.

The CMS answers "how often does token X appear?" over a corpus too
large to hold exact per-token counts: a depth×width counter grid where
each of ``depth`` hash rows increments one of ``width`` buckets per
occurrence; the estimate is the MIN over rows of the probed buckets —
always >= the true count, overshooting only on collisions
(Cormode & Muthukrishnan 2005).

Spark shape: the sketch IS a (row, bucket, count) DataFrame of at most
depth×width rows — built by one groupBy (map-side combinable partial
counts; the shuffle moves bounded partials, never tokens), probed by a
broadcast join. Counts are additive, so sketches of corpus shards (or
stream micro-batches) merge by a further groupBy-sum — the property
that makes CMS the standard streaming/heavy-hitter sketch.

Hash family: bucket = int(first 8 hex chars of md5(token|cms<seed>|<row>))
mod width — the repo's portable-hash technique (operators/sampling.py),
so DuckDB replays the sketch EXACTLY: unlike sketch libraries with
opaque native hashing, every bucket and every estimate is
oracle-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(token: Column, row: Column, width: int, seed: str) -> Column:
    """Deterministic bucket in [0, width) for a token under hash row
    ``row`` — md5-derived, identical in any engine that computes md5."""
    from cubicerp_client_etl_spark.functions import md5_hash32

    return (
        md5_hash32(F.concat(token, F.lit(f"|cms{seed}|"), row.cast("string")))
        % width
    )


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
    seed: str = "1",
) -> DataFrame:
    """Build the sketch over a token column (one input row = one
    occurrence). Returns ``(rw int, bucket bigint, c bigint)`` with at
    most depth×width rows. One bounded shuffle; no Python."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    expanded = tokens.withColumn(
        "rw", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    )
    return (
        expanded.select(
            "rw",
            cms_bucket(F.col(token_col), F.col("rw"), width, seed).alias("bucket"),
        )
        .groupBy("rw", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
    seed: str = "1",
) -> DataFrame:
    """Point-frequency estimates for each probe token: the min over the
    ``depth`` hash rows of the probed bucket counts (0 when a bucket is
    empty — only possible for tokens the corpus never hashed there).
    Probes and the sketch are both bounded → broadcast joins only."""
    expanded = probes.withColumn(
        "rw", F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    ).withColumn(
        "bucket", cms_bucket(F.col(token_col), F.col("rw"), width, seed)
    )
    joined = expanded.join(F.broadcast(cms), on=["rw", "bucket"], how="left")
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("est_count")
    )


def occupancy_sketch(
    tokens: DataFrame,
    token_col: str = "token",
    m: int = 1024,
    seed: str = "1",
) -> DataFrame:
    """Linear-counting distinct sketch (Whang et al. 1990): hash every
    value into ``m`` buckets and count how many buckets are OCCUPIED —
    one bigint per corpus, mergeable by OR (union the occupied-bucket
    sets). The distinct estimate is ``-m·ln(1 - occupied/m)``; this
    operator returns the occupied count and leaves the (float) estimate
    to the caller, because the occupancy itself is an exact integer any
    engine reproduces — the oracle-checkable core, unlike opaque HLL
    registers (q077's sketch is rows-only for exactly that reason).

    Plan: map-side bucket projection → distinct over at most ``m``
    values → count. The distinct's shuffle carries at most ``m`` rows
    per partition after partial dedup — bounded state at any scale.
    """
    if m < 1:
        raise ValueError("m must be >= 1")
    from cubicerp_client_etl_spark.functions import md5_hash32

    bucket = (
        md5_hash32(F.concat(F.col(token_col), F.lit(f"|occ{seed}"))) % m
    ).alias("bucket")
    return tokens.select(bucket).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("occupied")
    )
