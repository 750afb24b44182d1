"""Observability wave continued (q156): corpus drift between
snapshots. New-file home for post-q155 additions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register


# --------------------------------------------------------------------------
# q156 — corpus drift report (operators/drift.py): the keyed-md5 split
# plays two crawl snapshots; the report names the top-20 tokens whose
# e6-scaled unigram probability moved most between them — the
# distribution-shift alarm a pipeline watches across snapshots.
# Integer arithmetic end-to-end (total-variation-style |Δp|, no
# log-divergences), so the oracle replays it exactly.
# --------------------------------------------------------------------------
@register(
    "q156_corpus_drift",
    oracle="""
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tagged AS (
  SELECT token, md5(CAST(doc_id AS VARCHAR) || '|drift1') < '8' AS is_a
  FROM flat
),
ca AS (SELECT token, COUNT(*) AS c FROM tagged WHERE is_a GROUP BY token),
cb AS (SELECT token, COUNT(*) AS c FROM tagged WHERE NOT is_a GROUP BY token),
na AS (SELECT SUM(c) AS n FROM ca),
nb AS (SELECT SUM(c) AS n FROM cb),
joined AS (
  SELECT COALESCE(ca.token, cb.token) AS token,
         COALESCE(ca.c, 0) * 1000000 // na.n AS p_a_e6,
         COALESCE(cb.c, 0) * 1000000 // nb.n AS p_b_e6
  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
  CROSS JOIN na CROSS JOIN nb
)
SELECT token,
       CAST(p_a_e6 AS BIGINT) AS p_a_e6,
       CAST(p_b_e6 AS BIGINT) AS p_b_e6,
       CAST(abs(p_a_e6 - p_b_e6) AS BIGINT) AS delta_e6
FROM joined
ORDER BY delta_e6 DESC, token
LIMIT 20
""",
)
def q156_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.drift import unigram_drift

    docs = load(spark, sf_dir, "documents")
    flat = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn(
        "_is_a",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|drift1")))
        < "8",
    )
    side_a = flat.where(F.col("_is_a")).select("token")
    side_b = flat.where(~F.col("_is_a")).select("token")
    return unigram_drift(side_a, side_b, top_k=20)
