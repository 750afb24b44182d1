"""Model-based quality filtering: a linear classifier over hashed
bag-of-token features — the scale shape of the fastText/CCNet-style
quality filters every LLM curation pipeline runs (GPT-3's quality
classifier, CCNet's LM filter). The reference engine has no model
scoring at all; this is part of the LLM-pipeline extension.

The model is a BUCKET → WEIGHT table (the hashing trick: token →
32-bit hash → bucket id mod D). Scoring is therefore pure relational
algebra — explode tokens, hash to bucket, broadcast-join the weight
table, one keyed sum per document — no Python in the row path, no
model object on the executors, and the weight table is O(D) rows
regardless of corpus size, so it broadcasts at any scale.

Weights are INTEGERS. A trained float model quantizes to int weights
(e.g. e4-scaled) without measurable quality loss, and integer sums are
order-independent — so the whole scoring pass is bit-reproducible
across engines and the DuckDB oracle can hash-compare scores exactly.

Hash discipline: ``functions.md5_hash32`` — the one portable hash every
bucketed operator in this repo shares (CMS, shard assignment,
priorities), replayable in DuckDB as
``CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.functions import md5_hash32


def token_bucket(token: F.Column, n_buckets: int, salt: str) -> F.Column:
    """Feature-hash a token to a bucket id in [0, n_buckets)."""
    return md5_hash32(F.concat(token, F.lit(f"|{salt}"))) % n_buckets


def derived_weights(
    spark: SparkSession, n_buckets: int, salt: str, spread: int = 1000
) -> DataFrame:
    """A deterministic stand-in weight table ``(bucket, w)`` with
    w ∈ [-spread, spread], derived from the bucket id's hash — the
    fixture for tests/oracles. A real deployment loads trained,
    int-quantized weights from parquet instead; every consumer takes
    the table as a DataFrame, so the swap is a one-line reader change.
    """
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            md5_hash32(F.concat(F.col("id").cast("string"), F.lit(f"|{salt}")))
            % (2 * spread + 1)
            - spread
        ).alias("w"),
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    salt: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    intercept: int = 0,
) -> DataFrame:
    """Linear score per document: ``intercept + Σ w[bucket(token)]``
    over the token multiset (a token appearing twice contributes
    twice, exactly as a bag-of-words dot product).

    Returns ``docs``' rows (minus ``text_col``) plus ``score``
    (BIGINT). Documents whose text yields zero tokens score
    ``intercept``.

    Scale: one explode (map-side), one BROADCAST join against the
    O(n_buckets) weight table, one keyed sum on ``id_col`` with
    map-side partial aggregation — a single shuffle of (doc, partial
    sum) pairs. The left join + coalesce keeps empty documents.
    """
    keep = [c for c in docs.columns if c != text_col]
    tok = docs.select(
        *keep, F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    ).select(
        *keep, token_bucket(F.col("_tok"), n_buckets, salt).alias("bucket")
    )
    scored = (
        tok.join(F.broadcast(weights), "bucket")
        .groupBy(*[F.col(c) for c in keep])
        .agg(F.sum("w").alias("_s"))
    )
    base = docs.select(*keep)
    return base.join(scored, keep, "left").select(
        *keep,
        (F.coalesce(F.col("_s"), F.lit(0)) + F.lit(intercept))
        .cast("bigint")
        .alias("score"),
    )
