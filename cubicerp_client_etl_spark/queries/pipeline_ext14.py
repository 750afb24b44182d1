"""Round-14 extension wave.

The round-13 verdict's item 1 closed on idle evidence: of the four
census watch entries, q082 (1.7x) and q292 (1.6x) were load noise, and
the two REAL superlinear members get the q299/q300 treatment here —
q212 is declared (its capped twin q300 already ships, oracle-green at
1.17x), and the hyperplane-LSH family gets its capped twin below
(q209's uncapped form is declared alongside: with n_planes fixed the
bucket universe is finite, so occupancy — and the within-bucket join —
grows with the corpus by geometry).

Same corpus discipline as the rest of the registry: md5-portable hash
families and exact integer/double arithmetic the oracle replays
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.queries import register

# --------------------------------------------------------------------------
# q307 — CAPPED hyperplane-LSH near-neighbor join (L-sim1 under the
# cap discipline): q209's exact pipeline — portable Rademacher-md5
# hyperplane buckets, within-bucket exact cosine >= 0.3 — with
# ``similarity.lsh_bucket_pairs_capped(hot_bucket_cap=16)``: buckets
# whose occupancy exceeds 16 are dropped entirely before the
# self-join. The idle 10x census measured uncapped q209 at 4.2x (the
# bucket universe is finite at 2^8, so occupancy grows linearly with
# the corpus and the join quadratically); capped, any bucket
# contributes at most 16²/2 pairs and the join volume is bounded by
# 256·128 pairs NO MATTER the corpus size. The cap rule is a plain
# COUNT(*) over the engine-portable bucket key, so the oracle replays
# the occupancy census, the live-bucket set and every surviving cosine
# value bit-for-bit. At sf0.01 no bucket exceeds occupancy 8, so the
# capped law coincides with q209 there (pinned by test); at sf0.1 it
# drops 9 hot buckets — the cap BITES under the oracle, the q299/q300
# requirement. Scale: occupancy census is one keyed agg over ≤256
# groups; the live list broadcasts; one equi-join on the bucket key.
# --------------------------------------------------------------------------
@register(
    "q307_lsh_bucketed_pairs_capped",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
proj AS (
  SELECT vec_id, m.m AS m,
         SUM(qv[CAST(d.d AS INT) + 1] *
             CASE WHEN substr(md5(m.m || ',' || d.d), 1, 1) >= '8'
                  THEN 1 ELSE -1 END) AS p
  FROM e CROSS JOIN generate_series(0, 7) m(m)
         CROSS JOIN generate_series(0, 63) d(d)
  GROUP BY vec_id, m.m
),
bucketed AS (
  SELECT vec_id,
         string_agg(CASE WHEN p >= 0 THEN '1' ELSE '0' END, '' ORDER BY m)
           AS lsh_bucket
  FROM proj GROUP BY vec_id
),
occ AS (
  SELECT lsh_bucket, COUNT(*) AS m FROM bucketed GROUP BY lsh_bucket
),
live AS (SELECT lsh_bucket FROM occ WHERE m <= 16),
kept AS (
  SELECT b.vec_id, b.lsh_bucket FROM bucketed b
  JOIN live l ON l.lsh_bucket = b.lsh_bucket
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM kept a JOIN kept b
    ON a.lsh_bucket = b.lsh_bucket AND a.vec_id < b.vec_id
)
SELECT p.id_a, p.id_b,
       ROUND(list_dot_product(ea.v, eb.v) /
             sqrt(list_dot_product(ea.v, ea.v) * list_dot_product(eb.v, eb.v)),
             6) AS sim
FROM pairs p JOIN e ea ON ea.vec_id = p.id_a JOIN e eb ON eb.vec_id = p.id_b
WHERE list_dot_product(ea.v, eb.v) /
      sqrt(list_dot_product(ea.v, ea.v) * list_dot_product(eb.v, eb.v)) >= 0.3
""",
)
def q307_lsh_bucketed_pairs_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings")
    bucketed = sim.hyperplane_lsh_bucket_portable(
        emb, "embedding", n_planes=8, dim=64
    )
    return sim.lsh_bucket_pairs_capped(
        bucketed,
        id_col="vec_id",
        vec_col="embedding",
        hot_bucket_cap=16,
        threshold=0.3,
    ).orderBy("id_a", "id_b")
