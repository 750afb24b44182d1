"""Round-6 continuation wave (q165+): semantic dedup, model-based
quality filtering, temperature-scaled mixture weights, length-bucketed
batch packing, cross-source overlap observability.

Same corpus discipline as every other module: exact integer / IEEE-
deterministic arithmetic end-to-end so each query carries a DuckDB
oracle the driver can hash-compare, and every operator's scale shape is
the one that survives 100 TB (equi-joins on bounded keys, keyed
prefix scans, broadcast dimension tables — no all-pairs, no raw-row
windows on low-cardinality keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register

# --------------------------------------------------------------------------
# q165 — SemDeDup semantic deduplication (operators/semdedup.py):
# k-means cells bound the candidate join (equi-join on cluster id, the
# paper's trick for never going all-pairs), then an EXACT integer
# cosine-threshold test marks every vector whose cluster holds a
# τ-similar smaller-id twin. The fixture embeddings are near-orthogonal
# (max natural cosine ≈ 0.51), so the query PLANTS deterministic twins
# — vec_id % 10 == 0 gets a clamped ±2 perturbed copy at id + 10⁶ —
# and τ = 9/10 must recover exactly the planted set and nothing else.
# The oracle replays everything: quantization, twin planting, the full
# k-means recursion (unrolled CTEs, as q013), and the integer cosine
# predicate — a value-level check on the complete SemDeDup chain.
# --------------------------------------------------------------------------
_SD_K = 4
_SD_ITER = 2
_SD_DIM = 64


def _sd_dist(v: str, cv: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {_SD_DIM}), "
        f"i -> ({v}[i] - {cv}[i]) * ({v}[i] - {cv}[i]))) AS BIGINT)"
    )


def _sd_iter_sql(i: int) -> str:
    prev, d = f"c{i - 1}", _sd_dist("q.v", "c.cv")
    return f"""
a{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT q.vec_id, q.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {d}, c.cid) AS rn
    FROM q CROSS JOIN {prev} c)
  WHERE rn = 1),
u{i} AS (
  SELECT cid, list(m ORDER BY pos) AS cv FROM (
    SELECT a.cid, g.i AS pos,
           CAST(SUM(a.v[g.i]) AS BIGINT) // COUNT(*) AS m
    FROM a{i} a, (SELECT unnest(generate_series(1, {_SD_DIM})) AS i) g
    GROUP BY a.cid, g.i)
  GROUP BY cid),
c{i} AS (SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
         FROM {prev} p LEFT JOIN u{i} u USING (cid))"""


_SD_IDOT = (
    "CAST(list_sum(list_transform(generate_series(1, 64), "
    "i -> {a}[i] * {b}[i])) AS BIGINT)"
)

_SD_ORACLE = (
    f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
m AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) AS ma FROM e),
qu AS (SELECT vec_id,
              CASE WHEN ma = 0 THEN list_transform(dv, x -> CAST(0 AS BIGINT))
                   ELSE list_transform(dv,
                        x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT))
              END AS uv
       FROM m),
tw AS (SELECT vec_id + 1000000 AS vec_id,
              list_transform(generate_series(1, {_SD_DIM}),
                  i -> greatest(-127, least(127, uv[i] + ((i - 1) % 5) - 2))) AS uv
       FROM qu WHERE vec_id % 10 = 0),
allq AS (SELECT * FROM qu UNION ALL SELECT * FROM tw),
q AS (SELECT vec_id, list_transform(uv, x -> x + 127) AS v FROM allq),
c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v AS cv
       FROM (SELECT * FROM q ORDER BY vec_id LIMIT {_SD_K})),"""
    + ",".join(_sd_iter_sql(i) for i in range(1, _SD_ITER + 1))
    + f""",
asn AS (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cid AS cluster,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_sd_dist("q.v", "c.cv")}, c.cid) AS rn
    FROM q CROSS JOIN c{_SD_ITER} c)
  WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb, a.cluster,
         {_SD_IDOT.format(a="qa.uv", b="qb.uv")} AS dot,
         {_SD_IDOT.format(a="qa.uv", b="qa.uv")} AS na2,
         {_SD_IDOT.format(a="qb.uv", b="qb.uv")} AS nb2
  FROM asn a
  JOIN asn b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN allq qa ON qa.vec_id = a.vec_id
  JOIN allq qb ON qb.vec_id = b.vec_id)
SELECT idb AS vec_id, cluster, CAST(MIN(ida) AS BIGINT) AS witness
FROM pairs
WHERE na2 > 0 AND nb2 > 0 AND dot >= 0
  AND 100 * dot * dot >= 81 * na2 * nb2
GROUP BY idb, cluster
ORDER BY vec_id
"""
)


@register("q165_semantic_dedup", oracle=_SD_ORACLE)
def q165_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim
    from cubicerp_client_etl_spark.operators.clustering import kmeans_int
    from cubicerp_client_etl_spark.operators.semdedup import semantic_dedup

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double("embedding").alias("dv")
    )
    quant = emb.select(
        "vec_id",
        F.transform(
            sim.quantize_int8(F.col("dv")), lambda x: x.cast("bigint")
        ).alias("qv"),
    )
    twins = quant.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "qv",
            lambda x, i: F.greatest(
                F.lit(-127).cast("bigint"),
                F.least(
                    F.lit(127).cast("bigint"),
                    x + (i % 5).cast("bigint") - 2,
                ),
            ),
        ).alias("qv"),
    )
    allq = quant.unionByName(twins)
    assign = kmeans_int(allq, k=_SD_K, iterations=_SD_ITER)
    removed = semantic_dedup(allq, assign, tau_num=9, tau_den=10)
    return removed.orderBy("vec_id")
