"""Corpus drift detection — distribution shift between two corpus
snapshots (crawl batches, before/after a filter change, train vs
incoming data).

The statistic is the per-token absolute difference of e6-scaled
unigram probabilities over the UNION vocabulary:
``delta_e6(tok) = |cntA(tok)·1e6 div nA - cntB(tok)·1e6 div nB|``.
Summed over the vocabulary this is (2e6×) the total-variation distance
— the standard drift alarm — and the top-|delta| tokens name WHAT
drifted (a spam template, a language shift, a broken decoder).
Integer arithmetic end-to-end: no KL/JS logs (not bit-portable across
engines), same ordering for alerting purposes, exactly replayable by
the DuckDB oracle.

Plan shape: one token-keyed aggregation per side (map-side partial
counts), a full-outer join on the token key, map-only deltas, and a
TakeOrdered top-k — no global window, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.functions import e6_floor_ratio


def unigram_drift(
    side_a: DataFrame,
    side_b: DataFrame,
    token_col: str = "token",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` drifting tokens between two token streams (one
    row = one occurrence). Output per token:
    ``(token, p_a_e6, p_b_e6, delta_e6)``, largest delta first, ties
    broken by token for determinism. A token absent from one side
    contributes its full probability on the other — disappearance IS
    drift."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    ca = side_a.groupBy(token_col).agg(F.count(F.lit(1)).alias("_ca"))
    cb = side_b.groupBy(token_col).agg(F.count(F.lit(1)).alias("_cb"))
    # totals as 1-row broadcast aggregates OVER THE COUNT TABLES — no
    # driver .count() and no second scan of the raw token streams
    ta = ca.agg(F.sum("_ca").cast("bigint").alias("_na"))
    tb = cb.agg(F.sum("_cb").cast("bigint").alias("_nb"))
    joined = (
        ca.join(cb, token_col, "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            token_col,
            # exact decimal-floor ratio: no ANSI overflow abort past
            # count ~9.2e12 (functions.e6_floor_ratio, ADVICE r5)
            e6_floor_ratio(F.coalesce(F.col("_ca"), F.lit(0)), F.col("_na")).alias(
                "p_a_e6"
            ),
            e6_floor_ratio(F.coalesce(F.col("_cb"), F.lit(0)), F.col("_nb")).alias(
                "p_b_e6"
            ),
        )
    )
    out = joined.withColumn(
        "delta_e6", F.abs(F.col("p_a_e6") - F.col("p_b_e6")).cast("bigint")
    ).select(
        token_col,
        F.col("p_a_e6").cast("bigint"),
        F.col("p_b_e6").cast("bigint"),
        "delta_e6",
    )
    return out.orderBy(F.col("delta_e6").desc(), token_col).limit(top_k)
