"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023): score every raw-corpus document by how target-like its
hashed n-gram distribution is, so a pretraining pipeline can upsample
web data that "looks like" a small high-quality target set (Wikipedia,
books, an eval-adjacent domain) without training a model.

The method's core is deliberately cheap: hash tokens into B buckets,
estimate target and raw bucket distributions with add-one smoothing,
and give each document the sum over its tokens of the per-bucket
log-likelihood ratio log(p_target(b) / p_raw(b)). Resampling on those
weights is then ordinary weighted sampling (``operators/sampling``).

Numeric discipline: the ONLY float step is one ln per bucket — a pure
function of four exact integers, rounded once to e6 fixed point
(``ROUND(ln(...) · 1e6)``, the q039 idf precedent) — after which every
document weight is an INTEGER sum of per-bucket e6 values: order-
independent, overflow-safe (|llr_e6| ≤ ~3e7, docs ≤ 1e6 tokens →
≤ 3e13), and bit-replayable by the DuckDB oracle.

Scale posture (100 TB): bucket counting is one map-side-combinable
groupBy whose shuffle carries at most B partial rows per task; the
weight table is B rows (a broadcast literal at any corpus size); doc
scoring is a map-side bucket projection + broadcast join + keyed sum.
No windows, no self-joins, no driver collect.

Reference has no selection surface; this extends its per-row routing
idea (cubicerpetl.py:494-537) to corpus-level importance weighting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dsir_bucket(token: Column | str, n_buckets: int, seed: str = "") -> Column:
    """Deterministic feature bucket in [0, n_buckets) — the repo's
    portable md5 family, replayed by DuckDB as
    ``CAST(concat('0x', substr(md5(t || '|dsir<seed>'), 1, 8)) AS
    BIGINT) % B``."""
    from cubicerp_client_etl_spark.functions import md5_hash32

    t = F.col(token) if isinstance(token, str) else token
    return md5_hash32(F.concat(t, F.lit(f"|dsir{seed}"))) % n_buckets


def dsir_bucket_weights(
    raw_tokens: DataFrame,
    target_tokens: DataFrame,
    token_col: str = "t",
    n_buckets: int = 256,
    seed: str = "",
    bucket_col: str | None = None,
) -> DataFrame:
    """Per-bucket importance weights: ``(b int, llr_e6 bigint)`` for ALL
    ``n_buckets`` buckets (absent buckets score via smoothing alone).

    llr_e6 = round(ln((tc+1)·(Tr+B) / ((rc+1)·(Tt+B))) · 1e6) with
    tc/rc the bucket's target/raw token counts and Tt/Tr the totals —
    the add-one-smoothed log-likelihood ratio of the two hashed
    unigram models. Positive → the bucket is over-represented in the
    target; a document's score sums these over its tokens.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    # bucket_col: optional PRE-HASHED bucket column (must equal
    # dsir_bucket(token_col, n_buckets, seed)) so a caller sharing one
    # token frame across weights + scoring pays the md5 once, not per
    # pass — equivalence pinned by tests/test_wave2_ops.py
    b = (
        F.col(bucket_col)
        if bucket_col
        else dsir_bucket(F.col(token_col), n_buckets, seed)
    )
    rawc = raw_tokens.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_rc")
    )
    tgtc = target_tokens.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_tc")
    )
    tots = (
        rawc.agg(F.sum("_rc").cast("bigint").alias("_tr"))
        .join(tgtc.agg(F.sum("_tc").cast("bigint").alias("_tt")))
    )
    dim = raw_tokens.sparkSession.range(n_buckets).select(
        F.col("id").cast("bigint").alias("b")
    )
    joined = (
        dim.join(F.broadcast(rawc), "b", "left")
        .join(F.broadcast(tgtc), "b", "left")
        .join(F.broadcast(tots))
        .select(
            "b",
            F.coalesce(F.col("_rc"), F.lit(0)).alias("_rc"),
            F.coalesce(F.col("_tc"), F.lit(0)).alias("_tc"),
            F.coalesce(F.col("_tr"), F.lit(0)).alias("_tr"),
            F.coalesce(F.col("_tt"), F.lit(0)).alias("_tt"),
        )
    )
    num = (F.col("_tc") + 1).cast("double") * (F.col("_tr") + n_buckets)
    den = (F.col("_rc") + 1).cast("double") * (F.col("_tt") + n_buckets)
    return joined.select(
        "b",
        F.round(F.log(num / den) * 1_000_000).cast("bigint").alias("llr_e6"),
    )


def dsir_doc_scores(
    doc_tokens: DataFrame,
    weights: DataFrame,
    id_cols: list[str],
    token_col: str = "t",
    n_buckets: int = 256,
    seed: str = "",
    bucket_col: str | None = None,
) -> DataFrame:
    """Per-document importance score: ``(id_cols..., n_toks bigint,
    weight_e6 bigint)`` — the integer sum over the document's tokens of
    their buckets' llr_e6. One broadcast join + one keyed aggregation;
    carries every ``id_cols`` value via first() (constant per id)."""
    b = (
        F.col(bucket_col)
        if bucket_col
        else dsir_bucket(F.col(token_col), n_buckets, seed)
    )
    scored = doc_tokens.withColumn("b", b).join(F.broadcast(weights), "b")
    head, *rest = id_cols
    return scored.groupBy(head).agg(
        *[F.first(c).alias(c) for c in rest],
        F.count(F.lit(1)).cast("bigint").alias("n_toks"),
        F.sum("llr_e6").cast("bigint").alias("weight_e6"),
    )
