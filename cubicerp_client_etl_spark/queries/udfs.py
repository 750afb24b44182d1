"""UDF/UDAF/UDTF surface queries (SURVEY §2.K7): the sanctioned slow
path — Arrow-batched Pandas UDFs — with SQL oracles proving the Python
results match the declarative semantics exactly.

These exist to pin the *plumbing* (Arrow batches, grouped-map schemas),
not to do work built-ins could do; each docstring names the built-in
equivalent a real pipeline should prefer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register


def _normalize_text_udf():
    """Scalar Pandas UDF (vectorized over Arrow batches): whitespace-
    collapse + lowercase. Built-in equivalent: lower(regexp_replace(...)).
    Built lazily — the decorator parses its DDL schema and needs an
    active session, so it cannot run at import time."""

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    return normalize


# --------------------------------------------------------------------------
# q188 — scalar pandas_udf vs its SQL twin.
# --------------------------------------------------------------------------
@register(
    "q188_pandas_scalar_udf",
    oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS norm_md5
FROM documents
""",
)
def q188_pandas_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    normalize = _normalize_text_udf()
    return docs.select(
        "doc_id", F.md5(normalize(F.col("text"))).alias("norm_md5")
    )


# --------------------------------------------------------------------------
# q067 — grouped-map applyInPandas (UDAF/K7 shape): per-group range and
# count computed in pandas; oracle via plain aggregates. Integer/exact
# arithmetic only, so Python and SQL agree bit-for-bit.
# --------------------------------------------------------------------------
@register(
    "q067_apply_in_pandas",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       MAX(value) - MIN(value) AS value_range,
       MAX(event_id) AS max_event_id
FROM events GROUP BY event_type
""",
)
def q067_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "event_id", "value")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "value_range": [float(pdf["value"].max() - pdf["value"].min())],
                "max_event_id": [int(pdf["event_id"].max())],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        per_group,
        schema="event_type string, n long, value_range double, max_event_id long",
    )


# --------------------------------------------------------------------------
# q068 — mapInPandas (per-partition batch iterator, the custom-operator
# escape hatch): token counting in pandas; oracle via SQL len(split).
# --------------------------------------------------------------------------
@register(
    "q068_map_in_pandas",
    oracle="""
SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
FROM documents
""",
)
def q068_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.strip().str.split(r"\s+").str.len(),
                }
            )

    return docs.mapInPandas(count_tokens, schema="doc_id long, n_tokens long")


# --------------------------------------------------------------------------
# q113 — true Python UDTF (K4/K7, Spark 4 `@udtf`): per-document bigram
# generation as a lateral table function — the typed, sandboxed
# replacement for the reference's exec'd row-generating hooks
# (cubicerpetl/cubicerpetl.py:315-320). Registered and invoked through
# SQL LATERAL, the UDTF runs arrow-batched per executor.
# Scale: row generation is map-side (no shuffle); only the bigram
# count aggregates. A UDTF is still Python — at 100 TB prefer the
# built-in explode form (q066) where expressible; this exists for the
# shapes that aren't.
# --------------------------------------------------------------------------
@register(
    "q113_python_udtf_bigrams",
    oracle=r"""
WITH grams AS (
  SELECT doc_id, lst[i] || ' ' || lst[i+1] AS bigram
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS lst
        FROM documents WHERE doc_id <= 200),
       UNNEST(generate_series(1, len(lst)-1)) AS g(i)
)
SELECT bigram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY bigram HAVING COUNT(*) >= 5
""",
)
def q113_python_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class BigramUDTF:
        def eval(self, doc_id, text):
            toks = (text or "").strip().split()
            for a, b in zip(toks, toks[1:]):
                yield doc_id, f"{a} {b}"

    spark.udtf.register("bigrams_udtf", BigramUDTF)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 200).select(
        "doc_id", "text"
    ).createOrReplaceTempView("q115_docs")
    return spark.sql(
        """
        SELECT g.bigram, COUNT(*) AS n, COUNT(DISTINCT g.doc_id) AS n_docs
        FROM q115_docs d, LATERAL bigrams_udtf(d.doc_id, d.text) g
        GROUP BY g.bigram HAVING COUNT(*) >= 5
        """
    )
