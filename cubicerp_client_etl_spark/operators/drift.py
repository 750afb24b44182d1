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


def source_overlap_matrix(
    sh: "DataFrame", group_col: str = "source", sh_col: str = "sh"
) -> "DataFrame":
    """Pairwise shingle-set overlap between corpus groups (sources,
    snapshots, languages): for each unordered group pair, the distinct-
    shingle intersection plus exact e6 Jaccard and per-side containment
    — the release-datasheet view of "how much of source B is already in
    source A" (catches mirror sites, re-crawls, and licensing overlap
    before training).

    ``sh``: (group_col, sh_col) rows, one per group×shingle — need not
    be distinct (deduped here).

    Scale: one distinct (keyed shuffle on the shingle hash), one
    equi-join on the shingle restricted to ``a < b`` group order —
    never all-pairs on rows — then a #group²-bounded aggregate; the
    per-group size table broadcasts. Pairs with empty intersection are
    omitted (they carry no signal and would need a cross join to
    enumerate).
    """
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    d = sh.select(
        F.col(group_col).alias("_g"), F.col(sh_col).alias("_sh")
    ).distinct()
    sizes = d.groupBy("_g").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    a = d.select(F.col("_g").alias("source_a"), "_sh")
    b = d.select(F.col("_g").alias("source_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("_g").alias("source_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_g").alias("source_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_inter",
            "sz_a",
            "sz_b",
            e6_floor_ratio(
                F.col("n_inter"),
                F.col("sz_a") + F.col("sz_b") - F.col("n_inter"),
            ).alias("jaccard_e6"),
            e6_floor_ratio(F.col("n_inter"), F.col("sz_a")).alias("cont_a_e6"),
            e6_floor_ratio(F.col("n_inter"), F.col("sz_b")).alias("cont_b_e6"),
        )
    )
