"""Round-12 extension wave: observability for the near-dup candidate
machinery. The 10x scale census showed candidate DENSITY (not any plan
defect) is where 100x pressure lands first on the MinHash/SimHash/
setsim families — so the engine gets a first-class datasheet that
reports, per blocking family, the bucket-occupancy distribution and
the candidate-pair mass the bucket join would emit, BEFORE the join
runs. The observability twin of the three hot-bucket caps
(``lsh_candidate_pairs.hot_band_cap``, ``simhash_chunk_candidates.
hot_chunk_cap``, ``setsim_join.hot_cap``): the datasheet's
``hot_buckets`` / ``hot_pair_e6`` columns are exactly what says
whether a cap is needed and what it would remove.

Same corpus discipline as the rest of the registry: md5-portable hash
families and exact integer arithmetic, so the whole datasheet carries
a DuckDB oracle the driver can hash-compare at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import e6_floor_ratio
from cubicerp_client_etl_spark.queries import register

# a bucket whose occupancy exceeds this emits > HOT_OCC^2/2 ~ 2k pairs;
# the same default the cap equivalence tests exercise
_HOT_OCC = 64


def _bucket_stats(buckets: DataFrame, family: str) -> DataFrame:
    """One datasheet row from a (bucket-key..., m) occupancy frame:
    bucket count, singleton count, max occupancy, total candidate-pair
    mass Σ m(m-1)/2, hot-bucket count (m > 64) and the e6 share of the
    pair mass the hot buckets contribute — all exact integers."""
    pairs = F.sum(F.expr("m * (m - 1) div 2"))
    hot_pairs = F.sum(
        F.when(F.col("m") > _HOT_OCC, F.expr("m * (m - 1) div 2")).otherwise(
            F.lit(0)
        )
    )
    return buckets.agg(
        F.lit(family).alias("family"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum(F.when(F.col("m") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
        F.max("m").cast("bigint").alias("max_bucket"),
        pairs.cast("bigint").alias("candidate_pairs"),
        F.sum(F.when(F.col("m") > _HOT_OCC, 1).otherwise(0))
        .cast("bigint")
        .alias("hot_buckets"),
        F.when(pairs > 0, e6_floor_ratio(hot_pairs, pairs))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("hot_pair_e6"),
    )


# --------------------------------------------------------------------------
# q292 — Near-dup candidate datasheet (L-obs, judge r11 item 3): per
# blocking family — MinHash band buckets (q082's join key), SimHash
# 8-bit chunk buckets (q204's join key), setsim rarest-first prefix
# buckets (q212's join key) — the bucket-occupancy distribution and
# candidate-pair mass Σ m(m−1)/2 the family's equi-join would emit,
# plus how much of that mass sits in hot (occ > 64) buckets. This is
# the report a 100 TB operator reads BEFORE running the join: a
# hot_pair_e6 near 1e6 says boilerplate mega-buckets dominate and the
# family's hot-bucket cap should be turned on. All three families are
# the md5-portable forms, so DuckDB replays fingerprints, signatures,
# prefixes AND the stats bit-for-bit.
# Scale: each family is (map-heavy fingerprint/signature build) + one
# bucket-keyed count + one global agg over bucket rows (bounded by
# docs x bands) — no candidate pair is ever materialized.
# --------------------------------------------------------------------------
@register(
    "q292_neardup_candidate_datasheet",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
-- MinHash (portable, 4 hashes carved per digest), 8 bands of 4
msh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks CROSS JOIN generate_series(1, 4096) g(i)
  WHERE len(t) >= 3 AND i <= len(t) - 2
  UNION
  SELECT DISTINCT doc_id, array_to_string(t, ' ') AS sh
  FROM toks WHERE len(t) < 3
),
hashes AS (
  SELECT doc_id, g.i AS i,
         MIN(substr(md5(sh || '|' || CAST(g.i // 4 AS VARCHAR)),
                    8 * (g.i % 4) + 1, 8)) AS h
  FROM msh CROSS JOIN generate_series(0, 31) g(i)
  GROUP BY doc_id, g.i
),
bands AS (
  SELECT doc_id, CAST(i // 4 AS INT) AS band_id,
         md5(string_agg(h, '|' ORDER BY i)) AS band_hash
  FROM hashes GROUP BY doc_id, i // 4
),
mh_b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m
  FROM bands GROUP BY band_id, band_hash
),
-- SimHash 32-bit single-digest fingerprints, 4 chunks of 8 bits
stoks AS (
  SELECT doc_id, u.t AS t
  FROM documents, UNNEST(string_split_regex(lower(trim(text)), '\\s+')) AS u(t)
),
digs AS (SELECT doc_id, md5(t) AS d FROM stoks),
ones AS (
  SELECT doc_id, g.i AS i,
         COUNT(*) FILTER (WHERE substr(d, g.i + 1, 1) >= '8') AS o
  FROM digs CROSS JOIN generate_series(0, 31) g(i)
  GROUP BY doc_id, g.i
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM stoks GROUP BY doc_id),
fp AS (
  SELECT o.doc_id,
         CAST(SUM(CASE WHEN 2 * o.o > c.n
                       THEN CAST(1 AS BIGINT) << (31 - o.i)
                       ELSE 0 END) AS BIGINT) AS f
  FROM ones o JOIN counts c ON c.doc_id = o.doc_id
  GROUP BY o.doc_id
),
sh_b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m
  FROM fp CROSS JOIN generate_series(0, 3) g(c)
  GROUP BY g.c, (f >> (8 * (3 - g.c))) & 255
),
-- setsim prefix tokens (3-gram shingles, J >= 1/2, rarest-first)
st AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ss AS (
  SELECT doc_id,
         list_sort(list_distinct(list_transform(
             generate_series(1, len(tk) - 2),
             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS ts
  FROM st WHERE len(tk) >= 3
),
sf AS (SELECT doc_id, unnest(ts) AS sh, len(ts) AS sz FROM ss),
freq AS (SELECT sh, COUNT(*) AS f FROM sf GROUP BY sh),
ord AS (
  SELECT sf.doc_id, sf.sz, sf.sh,
         ROW_NUMBER() OVER (PARTITION BY sf.doc_id
                            ORDER BY freq.f, sf.sh) AS rn
  FROM sf JOIN freq USING (sh)
),
pref AS (
  SELECT doc_id, sh FROM ord WHERE rn <= sz - (sz + 1) // 2 + 1
),
ss_b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pref GROUP BY sh
),
stats AS (
  SELECT 'minhash_band' AS family, * FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(MAX(m) AS BIGINT) AS max_bucket,
           CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(SUM(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS hot_buckets,
           CAST(CASE WHEN SUM(m * (m - 1) // 2) = 0 THEN 0
                ELSE SUM(CASE WHEN m > 64 THEN m * (m - 1) // 2 ELSE 0 END)
                     * 1000000 // SUM(m * (m - 1) // 2) END AS BIGINT)
             AS hot_pair_e6
    FROM mh_b)
  UNION ALL
  SELECT 'simhash_chunk' AS family, * FROM (
    SELECT CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MAX(m) AS BIGINT),
           CAST(SUM(m * (m - 1) // 2) AS BIGINT),
           CAST(SUM(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(CASE WHEN SUM(m * (m - 1) // 2) = 0 THEN 0
                ELSE SUM(CASE WHEN m > 64 THEN m * (m - 1) // 2 ELSE 0 END)
                     * 1000000 // SUM(m * (m - 1) // 2) END AS BIGINT)
    FROM sh_b)
  UNION ALL
  SELECT 'setsim_prefix' AS family, * FROM (
    SELECT CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MAX(m) AS BIGINT),
           CAST(SUM(m * (m - 1) // 2) AS BIGINT),
           CAST(SUM(CASE WHEN m > 64 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(CASE WHEN SUM(m * (m - 1) // 2) = 0 THEN 0
                ELSE SUM(CASE WHEN m > 64 THEN m * (m - 1) // 2 ELSE 0 END)
                     * 1000000 // SUM(m * (m - 1) // 2) END AS BIGINT)
    FROM ss_b)
)
SELECT * FROM stats
""",
)
def q292_neardup_candidate_datasheet(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cubicerp_client_etl_spark.operators import dedup as dd
    from cubicerp_client_etl_spark.operators.dedup import (
        _setsim_prefix_tokens,
        simhash_int_portable,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    # family 1: MinHash band buckets (the q082 join key, digest-reuse
    # portable form — 8 md5 per shingle for the 32-hash signature)
    sigs = dd.minhash_signatures(
        docs, "doc_id", "text", num_hashes=32, portable=True, hashes_per_digest=4
    )
    mh_buckets = (
        sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    *[F.col(f"h{b * 4 + r}") for r in range(4)],
                                )
                            ).alias("band_hash"),
                        )
                        for b in range(8)
                    ]
                )
            ).alias("_b"),
        )
        .select("doc_id", "_b.band_id", "_b.band_hash")
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )

    # family 2: SimHash 8-bit chunk buckets (the q204 join key)
    fp = docs.select("doc_id", simhash_int_portable("text", n_bits=32).alias("f"))
    sh_buckets = (
        fp.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("chunk_id"),
                            F.shiftright(F.col("f"), 8 * (3 - c))
                            .bitwiseAND(F.lit(255))
                            .alias("chunk"),
                        )
                        for c in range(4)
                    ]
                )
            ).alias("_c"),
        )
        .select("doc_id", "_c.chunk_id", "_c.chunk")
        .groupBy("chunk_id", "chunk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )

    # family 3: setsim rarest-first prefix buckets (the q212 join key —
    # the same helper setsim_join blocks on)
    _base, pref = _setsim_prefix_tokens(
        docs, "text", "doc_id", shingle_n=3, num=1, den=2, hot_cap=None
    )
    ss_buckets = pref.groupBy("_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )

    return (
        _bucket_stats(mh_buckets, "minhash_band")
        .unionByName(_bucket_stats(sh_buckets, "simhash_chunk"))
        .unionByName(_bucket_stats(ss_buckets, "setsim_prefix"))
    )
