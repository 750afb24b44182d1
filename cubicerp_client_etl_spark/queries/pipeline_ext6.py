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
from cubicerp_client_etl_spark.checkpointing import pin

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
_SD_K = 4  # floor on the cell count
_SD_ITER = 2
_SD_DIM = 64
# SemDeDup sizing rule (the q038/q220 derive-from-one-scalar rule,
# r11: the standing 10x census measured the FIXED k=4 form at 27x
# when fact rows grew 10x — cells of n/4 vectors give n^2/16 pairs,
# the exact quadratic SemDeDup exists to avoid): the cell count
# derives from the corpus so cells stay ~_SD_CELL vectors and the
# within-cell pair volume stays LINEAR in n. k = max(4, n div 2000)
# is 4 at both fixture SFs (output unchanged, driver hash stable)
# and 27 at the 10x census fixture.
_SD_CELL = 2000


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
       FROM (SELECT * FROM q ORDER BY vec_id\n             LIMIT (SELECT GREATEST({_SD_K}, COUNT(*) // {_SD_CELL})\n                    FROM q))),"""
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


@register("q292_semantic_dedup", oracle=_SD_ORACLE)
def q292_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # three consumers (the k-derivation count, the k-means input, the
    # dedup verify input) — checkpoint so quantize+twin-union runs once
    allq = quant.unionByName(twins).transform(pin)
    # k derives from ONE scalar count (the q038 rule) so cells stay
    # ~_SD_CELL vectors and pair volume is linear in n — see _SD_CELL
    n_vecs = allq.count()
    k = max(_SD_K, n_vecs // _SD_CELL)
    assign = kmeans_int(allq, k=k, iterations=_SD_ITER)
    removed = semantic_dedup(allq, assign, tau_num=9, tau_den=10)
    return removed.orderBy("vec_id")

# --------------------------------------------------------------------------
# q221 (birth q166) — model-based quality filter (operators/classifier.py): the
# fastText/CCNet-style hashed-bag-of-words linear classifier as pure
# relational algebra — explode tokens, hash to one of 1024 buckets,
# broadcast-join the integer weight table, one keyed sum per document,
# threshold at 0. Reported per source: docs scored, docs kept, exact
# e6 keep rate, and the summed score (integer, order-independent).
# The weight table here is the deterministic hash-derived fixture
# (derived_weights); production swaps in trained int-quantized weights
# by reading parquet — same plan. Oracle replays hash, weights, sum,
# and threshold exactly.
# --------------------------------------------------------------------------
_QC_BUCKETS = 1024


@register(
    "q221_quality_classifier",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
  FROM documents
),
b AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(token || '|qcls'), 1, 8)) AS BIGINT)
           % {_QC_BUCKETS} AS bucket
  FROM tok
),
w AS (
  SELECT g.b AS bucket,
         CAST(concat('0x', substr(md5(CAST(g.b AS VARCHAR) || '|qclsw'), 1, 8))
              AS BIGINT) % 2001 - 1000 AS w
  FROM (SELECT unnest(generate_series(0, {_QC_BUCKETS - 1})) AS b) g
),
scored AS (
  SELECT b.doc_id, ANY_VALUE(b.source) AS source,
         CAST(SUM(w.w) AS BIGINT) AS score
  FROM b JOIN w USING (bucket)
  GROUP BY b.doc_id
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN score >= 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS keep_e6,
       CAST(SUM(score) AS BIGINT) AS sum_score
FROM scored
GROUP BY source
ORDER BY source
""",
)
def q221_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.classifier import (
        derived_weights,
        score_documents,
    )
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    weights = derived_weights(spark, _QC_BUCKETS, "qclsw")
    scored = score_documents(docs, weights, _QC_BUCKETS, "qcls")
    keep = F.sum(F.when(F.col("score") >= 0, 1).otherwise(0)).cast("bigint")
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            keep.alias("n_keep"),
            F.sum("score").cast("bigint").alias("sum_score"),
        )
        .select(
            "source",
            "n_docs",
            "n_keep",
            e6_floor_ratio(F.col("n_keep"), F.col("n_docs")).alias("keep_e6"),
            "sum_score",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q167 — temperature-scaled mixture allocation (operators/budget.py
# temperature_mixture): per-domain sampling weights at α = 1/2
# (isqrt of the domain token count — the mT5/XLM-R smoothing that
# keeps head domains from drowning tails), then 10,000 curriculum
# slots apportioned by exact largest-remainder so Σ target == budget.
# Exact integer end-to-end: isqrt_exact's floor-corrected root, floor
# ratios, remainder ranking — the oracle replays every step. Scale:
# one keyed corpus aggregation; all windows run over the O(#domains)
# aggregate (bounded by construction, per the corpus plan invariant).
# --------------------------------------------------------------------------
_TM_BUDGET = 10000


@register(
    "q167_temperature_mixture",
    oracle=f"""
WITH c AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS c_tokens
  FROM documents GROUP BY source
),
s0 AS (
  SELECT source, c_tokens,
         CAST(floor(sqrt(CAST(c_tokens AS DOUBLE))) AS BIGINT) AS s0
  FROM c
),
w AS (
  SELECT source, c_tokens,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= c_tokens THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > c_tokens THEN 1 ELSE 0 END) AS w
  FROM s0
),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM w),
a AS (
  SELECT source, c_tokens, w,
         CAST(w * 1000000 // t.tw AS BIGINT) AS share_e6,
         CAST({_TM_BUDGET} * w // t.tw AS BIGINT) AS base,
         CAST({_TM_BUDGET} * w % t.tw AS BIGINT) AS rem
  FROM w CROSS JOIN t
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk,
         {_TM_BUDGET} - SUM(base) OVER () AS short
  FROM a
)
SELECT source, c_tokens, w, share_e6,
       CAST(base + (CASE WHEN rnk <= short THEN 1 ELSE 0 END) AS BIGINT)
         AS target
FROM r
ORDER BY source
""",
)
def q167_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.budget import temperature_mixture

    docs = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    return temperature_mixture(
        docs, "source", "n_tokens", budget=_TM_BUDGET
    ).orderBy("source")


# --------------------------------------------------------------------------
# q168 — length-bucketed dynamic batching (operators/packing.py
# length_bucketed_batches): documents split into 16-token length
# bands, deterministically shuffled within each band, cut into
# 32-doc batches; the report is the per-batch padding datasheet —
# docs, max/sum tokens, exact e6 padding-waste fraction (what the
# trainer saves vs corpus-wide max-length padding). The per-band
# running count rides the KEYED two-phase prefix scan, not a raw-row
# window (length bands are low-cardinality — the q141-class
# scale-killer the corpus-plan invariant guards). The oracle states
# the plain SQL window; the scan is value-identical (total order).
# --------------------------------------------------------------------------
@register(
    "q168_length_bucketed_batches",
    oracle="""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens, CAST(n_tokens // 16 AS BIGINT) AS bucket,
         md5(CAST(doc_id AS VARCHAR) || '|lenbatch') AS sk
  FROM d
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY sk, doc_id) AS rn
  FROM b
),
g AS (
  SELECT bucket, CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
  FROM r GROUP BY bucket, CAST((rn - 1) // 32 AS BIGINT)
)
SELECT bucket, batch_id, n_docs, max_tokens, sum_tokens,
       CAST((max_tokens * n_docs - sum_tokens) * 1000000
            // (max_tokens * n_docs) AS BIGINT) AS pad_waste_e6
FROM g
ORDER BY bucket, batch_id
""",
)
def q168_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import e6_floor_ratio
    from cubicerp_client_etl_spark.operators.packing import (
        length_bucketed_batches,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    assigned = length_bucketed_batches(
        docs, "doc_id", "n_tokens", bucket_width=16, batch_size=32,
        seed="lenbatch",
    )
    return (
        assigned.groupBy("bucket", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_tokens",
            "sum_tokens",
            e6_floor_ratio(
                F.col("max_tokens") * F.col("n_docs") - F.col("sum_tokens"),
                F.col("max_tokens") * F.col("n_docs"),
            ).alias("pad_waste_e6"),
        )
        .orderBy("bucket", "batch_id")
    )


# --------------------------------------------------------------------------
# q169 — cross-source overlap matrix (operators/drift.py
# source_overlap_matrix): for every source pair, the distinct 3-gram
# shingle intersection with exact e6 Jaccard and per-side containment
# — the datasheet view that catches mirror sites / re-crawls /
# licensing overlap between corpus sources before training. Shingle
# semantics shared with the dedup stack (operators/dedup.shingles;
# oracle CTE replays it as in q032). Scale: distinct on the shingle
# key, one equi-join on shingle with a < b group order, #sources²-
# bounded output; size table broadcast.
# --------------------------------------------------------------------------
@register(
    "q169_source_overlap_matrix",
    oracle="""
WITH toks AS (
  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks CROSS JOIN generate_series(1, 4096) g(i)
  WHERE len(t) >= 3 AND i <= len(t) - 2
  UNION
  SELECT DISTINCT source, array_to_string(t, ' ') AS sh
  FROM toks WHERE len(t) < 3
),
sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, n_inter, sa.sz AS sz_a, sb.sz AS sz_b,
       CAST(n_inter * 1000000 // (sa.sz + sb.sz - n_inter) AS BIGINT)
         AS jaccard_e6,
       CAST(n_inter * 1000000 // sa.sz AS BIGINT) AS cont_a_e6,
       CAST(n_inter * 1000000 // sb.sz AS BIGINT) AS cont_b_e6
FROM inter
JOIN sz sa ON sa.source = inter.source_a
JOIN sz sb ON sb.source = inter.source_b
ORDER BY source_a, source_b
""",
)
def q169_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.dedup import shingles
    from cubicerp_client_etl_spark.operators.drift import source_overlap_matrix

    docs = load(spark, sf_dir, "documents").select(
        "source", shingles("text", n=3).alias("shs")
    )
    sh = docs.select("source", F.explode("shs").alias("sh"))
    return source_overlap_matrix(sh).orderBy("source_a", "source_b")


# --------------------------------------------------------------------------
# q225 (birth q170) — REAL audio decode path (operators/multimodal.py WAV codec):
# deterministic PCM16 waveforms are ENCODED as real RIFF/WAVE bytes
# (stdlib `wave`), then audio_features(fake=False) parses the actual
# container back and derives exact-integer features — samples,
# duration_us, peak, isqrt RMS, zero crossings. The audio twin of
# q024's BMP chain: the oracle replays the waveform arithmetic
# directly (the WAV round-trip is the identity on samples, pinned by
# unit tests), so a codec bug surfaces as a value mismatch. Scale:
# synth + decode are both pure map stages (mapInPandas), no shuffle.
# --------------------------------------------------------------------------
@register(
    "q225_wav_audio_features",
    oracle="""
WITH sz AS (SELECT doc_id, 160 + doc_id % 40 AS n FROM documents),
samp AS (
  SELECT doc_id, n, g.i AS i,
         ((doc_id * 31 + g.i * 7919) % 65536) - 32768 AS x
  FROM sz CROSS JOIN generate_series(0, 198) g(i)
  WHERE g.i < n
),
zc AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN xp IS NOT NULL AND (xp >= 0) <> (x >= 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
  FROM (SELECT doc_id, i, x,
               LAG(x) OVER (PARTITION BY doc_id ORDER BY i) AS xp
        FROM samp)
  GROUP BY doc_id
),
agg AS (
  SELECT doc_id, ANY_VALUE(n) AS n, MAX(abs(x)) AS peak,
         CAST(SUM(x * x) // ANY_VALUE(n) AS BIGINT) AS v
  FROM samp GROUP BY doc_id
),
s AS (
  SELECT doc_id, n, peak, v,
         CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS s0
  FROM agg
)
SELECT s.doc_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000000 // 16000 AS BIGINT) AS duration_us,
       CAST(peak AS BIGINT) AS peak,
       CAST(s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= v THEN 1 ELSE 0 END)
               - (CASE WHEN s0 * s0 > v THEN 1 ELSE 0 END) AS BIGINT) AS rms,
       zc.zero_crossings
FROM s JOIN zc ON zc.doc_id = s.doc_id
ORDER BY s.doc_id
""",
)
def q225_wav_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def synth(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 160 + d % 40
                xs = [((d * 31 + i * 7919) % 65536) - 32768 for i in range(n)]
                payloads.append(encode_wav_pcm16(16000, xs))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    wav = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    return audio_features(wav, fake=False).orderBy("doc_id")
