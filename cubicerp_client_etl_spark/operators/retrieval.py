"""BM25 ranked retrieval over the document corpus (Robertson &
Spärck Jones probabilistic relevance; the Okapi BM25 scoring function)
— the keyword-search half of a training-data pipeline: eval-set
leakage triage ("which corpus docs score highest against this probe?"),
targeted corpus audits, and the lexical leg of hybrid (BM25 + vector)
retrieval next to ``operators/similarity``.

Exactness: BM25 with k1 = 1.2, b = 0.75 is pure rational arithmetic
once the term-frequency saturation is multiplied through by 10·L
(L = total corpus token count):

    tf_part = (k1+1)·tf / (tf + k1·(1−b) + k1·b·dl/avgdl)
            = 22·L·tf / (10·L·tf + 3·L + 9·dl·N)        (avgdl = L/N)

computed as one ``e6_floor_ratio`` — exact integer for the full bigint
range. The idf is the Lucene-shaped non-negative ln((N+1)/(df+0.5)),
the ONE float step: a pure function of two exact integers rounded once
to e6 (the q039 idf precedent), after which every document score is an
integer Σ idf_e6 · tf_part_e6 — order-independent and replayed
bit-for-bit by the DuckDB oracle.

Scale posture (100 TB): doc lengths are one map-side-combinable keyed
agg; the probe's term list is a literal broadcast; tf/df aggregate only
the MATCHING postings (the corpus shuffles nothing for terms it doesn't
contain); totals are scalar broadcasts; the final top-k is
TakeOrdered, never a global sort. No windows, no self-joins.

Reference has no retrieval surface; this extends its filter/lookup
operators (cubicerpetl.py:494-537) to ranked search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
) -> DataFrame:
    """Unranked BM25 scores: ``(id_col, n_terms_hit bigint, score_e12
    bigint)`` for every document matching >= 1 probe term (the scoring
    stage ``bm25_topk`` ranks; rank-fusion consumers take this form
    directly — a TakeOrdered with an unbounded k would allocate its
    whole top-k buffer)."""
    if not terms:
        raise ValueError("terms must not be empty")
    if any(t != t.lower() for t in terms):
        # the corpus side lowercases before matching; a mixed-case
        # probe would silently match nothing
        raise ValueError(f"probe terms must be lowercase: {terms}")
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("_t"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("_dl"))
    tot = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("_dl").cast("bigint").alias("_l"),
    )
    match = toks.where(F.col("_t").isin(*terms))
    tf = match.groupBy(id_col, "_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_tf")
    )
    df_t = tf.groupBy("_t").agg(F.count(F.lit(1)).cast("bigint").alias("_df"))
    idf = df_t.join(F.broadcast(tot)).select(
        "_t",
        F.round(
            F.log((F.col("_n") + 1).cast("double") / (F.col("_df") + F.lit(0.5)))
            * 1_000_000
        )
        .cast("bigint")
        .alias("_idf_e6"),
    )
    scored = (
        tf.join(dl, id_col)
        .join(F.broadcast(idf), "_t")
        .join(F.broadcast(tot))
        .select(
            id_col,
            "_t",
            (
                F.col("_idf_e6")
                * e6_floor_ratio(
                    F.lit(22) * F.col("_l") * F.col("_tf"),
                    F.lit(10) * F.col("_l") * F.col("_tf")
                    + F.lit(3) * F.col("_l")
                    + F.lit(9) * F.col("_dl") * F.col("_n"),
                )
            ).alias("_s_e12"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        F.sum("_s_e12").cast("bigint").alias("score_e12"),
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by BM25 score against the literal ``terms``
    probe (k1 = 1.2, b = 0.75 — the exact-rational factoring above).

    Returns ``(id_col, n_terms_hit bigint, score_e12 bigint)`` ordered
    by score desc then id — only documents matching >= 1 term (BM25
    retrieval semantics: non-matching docs score 0 and are not
    ranked). The plan is TakeOrdered (per-partition top-k heaps), so
    keep ``k`` result-sized; for a full ranking use ``bm25_scores``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        bm25_scores(docs, id_col, text_col, terms)
        .orderBy(F.col("score_e12").desc(), id_col)
        .limit(k)
    )
