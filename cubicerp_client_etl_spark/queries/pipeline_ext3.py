"""Corpus-curation query wave (q122–q125): the document-hygiene stages
of an LLM pretraining pipeline — repetition filtering, eval-set
decontamination, sliding-window chunking, corpus-frequency scoring.

All exercise ``operators/curation.py``; every derived ratio is an exact
``1e6``-scaled integer (integer ``div`` in both engines) so the driver's
value hash is bit-stable. These sit past the q001–q050 driver window on
purpose — the window already holds one representative per family; this
wave extends the LLM-pipeline component table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.operators.curation import (
    chunk_documents,
    decontaminate,
    repetition_stats,
    unigram_freq_score,
)
from cubicerp_client_etl_spark.queries import register


# --------------------------------------------------------------------------
# q177 (birth q122) — Gopher-style repetition filter (L-txt extension). Per-document
# duplicate-token / top-token / duplicate-bigram fractions as exact
# 1e6-scaled integers, plus the documents a Gopher-ish rule would drop.
# Map-only Catalyst HOFs (array_sort + aggregate fold for the top-token
# run) — zero shuffle, zero Python; survives 100 TB as a streaming
# pass. Oracle rebuilds the same counts via unnest + two GROUP BYs.
# --------------------------------------------------------------------------
@register(
    "q177_repetition_filter",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
flat AS (
  SELECT doc_id, unnest(t) AS tok FROM toks
),
counts AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM flat GROUP BY doc_id, tok
),
tok_agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_token_count,
         CAST(SUM(c * c) AS BIGINT) AS sum_sq_counts
  FROM counts GROUP BY doc_id
),
bg AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i + 1])
              ELSE [] END AS b
  FROM toks
),
bg_agg AS (
  SELECT doc_id,
         CAST(len(b) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(b)) AS BIGINT) AS n_distinct_bigrams
  FROM bg
)
SELECT a.doc_id, a.n_tokens, a.n_distinct, a.top_token_count,
       a.sum_sq_counts, g.n_bigrams, g.n_distinct_bigrams,
       1000000 * (a.n_tokens * a.n_tokens - a.sum_sq_counts)
         // (a.n_tokens * a.n_tokens) AS simpson_div_e6,
       1000000 * (a.n_tokens - a.n_distinct) // a.n_tokens AS dup_token_frac_e6,
       1000000 * a.top_token_count // a.n_tokens AS top_token_frac_e6,
       CASE WHEN g.n_bigrams = 0 THEN CAST(0 AS BIGINT)
            ELSE 1000000 * (g.n_bigrams - g.n_distinct_bigrams) // g.n_bigrams
       END AS dup_bigram_frac_e6
FROM tok_agg a JOIN bg_agg g USING (doc_id)
""",
)
def q177_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_stats(docs)


# --------------------------------------------------------------------------
# q158 (birth q123) — n-gram benchmark decontamination (L-pipeline). Benchmark set =
# documents with doc_id % 97 = 0 (a stand-in eval suite); corpus
# documents sharing any 5-token shingle with it are flagged with the
# count of distinct overlapping shingles. Posture: benchmark shingle
# set DISTINCT-ed + broadcast; corpus side is a map-side explode into a
# broadcast hash join; the only shuffle is the final per-doc count.
# --------------------------------------------------------------------------
@register(
    "q158_decontaminate",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 5
                     THEN list_transform(generate_series(1, len(t) - 4),
                                         i -> array_to_string(list_slice(t, i, i + 4), ' '))
                     ELSE [] END) AS sh
  FROM toks
),
bench AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0
)
SELECT s.doc_id, CAST(COUNT(DISTINCT s.sh) AS BIGINT) AS n_hits
FROM sh s JOIN bench USING (sh)
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
""",
)
def q158_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, bench, n=5)


# --------------------------------------------------------------------------
# q124 — sliding-window document chunking (L-pipeline / RAG indexing):
# 32-token windows every 24 tokens (8-token overlap), ragged tail,
# chunk text surfaced as md5 so the check stays value-level without
# megabyte rows. Map-only flatMap (explode of a computed index range),
# no shuffle. Oracle replays the same start-offset arithmetic with
# generate_series + list_slice.
# --------------------------------------------------------------------------
@register(
    "q124_chunking",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t, len(string_split(text, ' ')) AS n
  FROM documents
),
idx AS (
  SELECT doc_id, t, n,
         unnest(generate_series(0,
           CASE WHEN n <= 32 THEN CAST(0 AS BIGINT)
                ELSE (n - 32 + 24 - 1) // 24 END)) AS chunk_idx
  FROM toks
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(t, chunk_idx * 24 + 1,
                           least(chunk_idx * 24 + 32, n))) AS BIGINT) AS chunk_tokens,
       md5(array_to_string(list_slice(t, chunk_idx * 24 + 1,
                           least(chunk_idx * 24 + 32, n)), ' ')) AS chunk_md5
FROM idx
""",
)
def q124_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_size=32, stride=24)


# --------------------------------------------------------------------------
# q125 — corpus unigram-frequency scoring (L-txt extension): each token
# occurrence contributes the GLOBAL corpus count of that token —
# rare-token outlier detection / boilerplate flagging, as the
# exact-integer stand-in for unigram-LM perplexity (log-space floats
# are not bit-portable; the integer field orders identically). Two
# shuffles (token histogram, per-doc rollup); vocab join resolves to
# broadcast under AQE for Zipf vocabularies.
# --------------------------------------------------------------------------
@register(
    "q125_unigram_freq_score",
    oracle="""
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hist AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM flat GROUP BY tok
),
scored AS (
  SELECT f.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(h.freq) AS BIGINT) AS sum_freq,
         CAST(MIN(h.freq) AS BIGINT) AS min_freq
  FROM flat f JOIN hist h USING (tok)
  GROUP BY f.doc_id
)
SELECT doc_id, n_tokens, sum_freq, min_freq,
       sum_freq // n_tokens AS avg_freq_e0
FROM scored
""",
)
def q125_unigram_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_freq_score(docs)


# --------------------------------------------------------------------------
# q165 (birth q126) — integer k-means centroid training (L-sim extension): the Lloyd
# iterations that produce the IVF index's centroids (q184 takes them as
# given). Exact integer arithmetic in shifted space (see
# operators/clustering.py) makes every iteration bit-identical across
# engines, so the DuckDB oracle replays the full recursion as unrolled
# CTEs — assignment, update, and empty-cluster carry included — and the
# driver gets a VALUE-level check on an iterative clustering algorithm.
# Posture: per iteration one map-only assignment pass (centroids are
# literals, no join) + one k·dim-sized partial-agg shuffle.
# --------------------------------------------------------------------------
_KM_K = 4
_KM_ITER = 3
_KM_DIM = 64  # fixture embeddings are 64-dim at every SF


def _km_dist(v: str, cv: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {_KM_DIM}), "
        f"i -> ({v}[i] - {cv}[i]) * ({v}[i] - {cv}[i]))) AS BIGINT)"
    )


def _km_iter_sql(i: int) -> str:
    prev, d = f"c{i - 1}", _km_dist("q.v", "c.cv")
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
    FROM a{i} a, (SELECT unnest(generate_series(1, {_KM_DIM})) AS i) g
    GROUP BY a.cid, g.i)
  GROUP BY cid),
c{i} AS (SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
         FROM {prev} p LEFT JOIN u{i} u USING (cid))"""


_KM_ORACLE = (
    f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
m AS (SELECT vec_id, dv, list_max(list_transform(dv, x -> abs(x))) AS ma FROM e),
q AS (SELECT vec_id,
             CASE WHEN ma = 0 THEN list_transform(dv, x -> CAST(127 AS BIGINT))
                  ELSE list_transform(dv,
                       x -> CAST(floor(x * 127.0 / ma + 0.5) AS BIGINT) + 127)
             END AS v
      FROM m),
c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v AS cv
       FROM (SELECT * FROM q ORDER BY vec_id LIMIT {_KM_K})),"""
    + ",".join(_km_iter_sql(i) for i in range(1, _KM_ITER + 1))
    + f"""
SELECT vec_id, cluster, dist_sq FROM (
  SELECT q.vec_id, c.cid AS cluster, {_km_dist("q.v", "c.cv")} AS dist_sq,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_km_dist("q.v", "c.cv")}, c.cid) AS rn
  FROM q CROSS JOIN c{_KM_ITER} c)
WHERE rn = 1
"""
)


@register("q165_kmeans_int", oracle=_KM_ORACLE)
def q165_kmeans_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim
    from cubicerp_client_etl_spark.operators.clustering import kmeans_int

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double("embedding").alias("dv")
    )
    quant = emb.select(
        "vec_id",
        F.transform(sim.quantize_int8(F.col("dv")), lambda x: x.cast("bigint")).alias(
            "qv"
        ),
    )
    return kmeans_int(quant, k=_KM_K, iterations=_KM_ITER)


# --------------------------------------------------------------------------
# q023 (birth q127) — changelog apply / MERGE compaction (I-family extension, the
# inverse of q107's CDC snapshot diff): base = customer accounts, changelog
# = events keyed on user_id (purchase/signup upsert the account's
# tracked value, error deletes it; latest event per key wins via
# (ts, event_id) total order). Money surfaces as exact integer e2/e6
# scalings — base balances are exact 2-decimal, event values go through
# IEEE-deterministic floor(value*1e6). Posture: the log is compacted to
# <=1 row/key BEFORE the full-outer join; both shuffles share the key.
# --------------------------------------------------------------------------
@register(
    "q023_apply_changelog",
    oracle="""
WITH chg AS (
  SELECT user_id AS c_custkey,
         CASE event_type WHEN 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(floor(value * 1000000) AS BIGINT) AS val_e6
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type IN ('purchase', 'signup', 'error'))
  WHERE rn = 1
),
base AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) * 10000 AS val_e6
  FROM customer
)
SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
       CASE WHEN c.op IS NOT NULL THEN c.val_e6 ELSE b.val_e6 END AS val_e6,
       CASE WHEN c.op IS NOT NULL THEN 'chg' ELSE 'base' END AS src
FROM base b FULL OUTER JOIN chg c USING (c_custkey)
WHERE c.op IS NULL OR c.op <> 'D'
""",
)
def q023_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.history import apply_changelog

    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100).cast("bigint") * 10000).alias("val_e6"),
    )
    chg = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup", "error"))
        .select(
            F.col("user_id").alias("c_custkey"),
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("val_e6"),
            "ts",
            "event_id",
        )
    )
    return apply_changelog(
        base, chg, key="c_custkey", op_col="op",
        order_by=["ts", "event_id"], payload=["val_e6"],
    )


# --------------------------------------------------------------------------
# q128 — exact per-group cap (L-pipeline, corpus balancing): at most 40
# documents per (lang, source) bucket, selected by smallest
# md5(doc_id|capA) — uniform, deterministic, rerun-stable. Exact-N
# variant (one row_number window keyed on the group); the skew-immune
# scale twin is q129.
# --------------------------------------------------------------------------
@register(
    "q128_cap_per_group",
    oracle="""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '|capA'), 1, 16),
                    doc_id) AS rn
  FROM documents)
WHERE rn <= 40
""",
)
def q128_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    capped = cap_per_group(
        docs.withColumn("_g", F.concat_ws("", "lang", "source")),
        group_col="_g", key_col="doc_id", n=40, seed="capA",
    )
    return capped.drop("_g")


# --------------------------------------------------------------------------
# q129 — rate-based per-group cap (L-pipeline scale twin of q128): the
# group's size determines an exact integer hash threshold
# floor(n*2^32/size); the corpus pass is then a map-only keyed-hash
# filter behind a broadcast of group counts — no per-group data
# shuffle, no skew, ~n rows per group. Threshold arithmetic is bigint
# `div`, so the oracle replays it exactly.
# --------------------------------------------------------------------------
@register(
    "q129_rate_cap_per_group",
    oracle="""
WITH counts AS (
  SELECT lang, COUNT(*) AS gc FROM documents GROUP BY lang
),
thr AS (
  SELECT lang,
         CASE WHEN gc <= 40 THEN 'g'
              ELSE lpad(lower(hex(40 * 4294967296 // gc)), 8, '0')
         END AS t
  FROM counts
)
SELECT d.doc_id, d.lang
FROM documents d JOIN thr USING (lang)
WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '|capB'), 1, 8) < thr.t
""",
)
def q129_rate_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sampling import rate_cap_per_group

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return rate_cap_per_group(
        docs, group_col="lang", key_col="doc_id", n=40, seed="capB"
    )


# --------------------------------------------------------------------------
# q224 (birth q130) — end-to-end curation pipeline (L-pipeline flagship): the full
# document-hygiene chain COMPOSED from the engine's operators —
#   (1) quality gate: >=10 tokens and duplicate-token fraction < 60%
#       (repetition_stats, map-only),
#   (2) exact dedup on md5(text), smallest doc_id survives (exact_dedup),
#   (3) benchmark decontamination: drop docs sharing any 5-gram with
#       the doc_id%97 eval set — and the eval set itself (decontaminate
#       as an anti-join),
#   (4) per-lang cap of 60 by keyed hash (cap_per_group),
#   (5) md5 train/test split (hash_split machinery, 1/8 test).
# One declarative lineage end to end — Catalyst sees through all five
# stages (the quality gate's map-only metrics fuse with the scan; the
# only shuffles are dedup's text-hash window, the decontamination
# aggregate, and the cap window). The oracle replays the exact chain.
# --------------------------------------------------------------------------
@register(
    "q224_curation_pipeline",
    headline=True,
    oracle="""
WITH stats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id, tok)
  GROUP BY doc_id
),
gated AS (
  SELECT d.doc_id, d.text, d.lang
  FROM documents d JOIN stats s USING (doc_id)
  WHERE s.n_tokens >= 10
    AND 1000000 * (s.n_tokens - s.n_distinct) // s.n_tokens < 600000
),
deduped AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated)
  WHERE rn = 1
),
sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 5
                     THEN list_transform(generate_series(1, len(t) - 4),
                          i -> array_to_string(list_slice(t, i, i + 4), ' '))
                     ELSE [] END) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (sh)
  WHERE s.doc_id % 97 <> 0
),
clean AS (
  SELECT * FROM deduped
  WHERE doc_id % 97 <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
capped AS (
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '|cur1'), 1, 16),
                      doc_id) AS rn
    FROM clean)
  WHERE rn <= 60
)
SELECT doc_id, lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|cursplit'), 1, 8) < '20000000'
            THEN 'test' ELSE 'train' END AS split
FROM capped
""",
)
def q224_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.dedup import exact_dedup
    from cubicerp_client_etl_spark.operators.sampling import cap_per_group

    from cubicerp_client_etl_spark.catalog import widen_scan

    # per-doc shingle/HOF work: widen the single-row-group fixture scan
    docs = widen_scan(
        load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    )

    # (1) quality gate on repetition metrics — `keep` passes text/lang
    # through the same map-only projection, so the gate fuses with the
    # scan instead of joining stats back on doc_id (one less shuffle)
    gated = (
        repetition_stats(docs, keep=("text", "lang"))
        .filter((F.col("n_tokens") >= 10) & (F.col("dup_token_frac_e6") < 600_000))
        .select("doc_id", "text", "lang")
    )

    # (2) exact dedup on content hash, smallest doc_id wins
    deduped = exact_dedup(
        gated.withColumn("_h", F.md5("text")),
        keys=["_h"],
        order_by=[F.col("doc_id").asc()],
    ).drop("_h")

    # (3) decontamination: drop the eval set and everything overlapping it
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    contaminated = decontaminate(corpus, bench, n=5).select("doc_id")
    clean = (
        deduped.filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )

    # (4) per-lang cap, (5) keyed split
    capped = cap_per_group(
        clean.select("doc_id", "lang"), group_col="lang", key_col="doc_id",
        n=60, seed="cur1",
    )
    h = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|cursplit"))), 1, 8
    )
    return capped.select(
        "doc_id", "lang",
        F.when(h < "20000000", "test").otherwise("train").alias("split"),
    )


# --------------------------------------------------------------------------
# q131 — compression-ratio quality signal (L-txt, rows-only): zlib
# ratio per document via Arrow-batched mapInPandas — the long-range
# repetition/boilerplate detector that complements q122's n-gram
# fractions. No SQL engine has zlib → no oracle (driver does the
# rows-only check); unit tests pin exact byte counts. Map-only, no
# shuffle; the Python stage is Arrow-batched, never per-row.
# --------------------------------------------------------------------------
@register("q131_compression_ratio", oracle=None)
def q131_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.curation import compression_ratio

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return compression_ratio(docs)


# --------------------------------------------------------------------------
# q132 — duplicated-span removal (L-dedup flagship, the C4 §2.2 stage):
# every occurrence of a globally-duplicated 5-token window except the
# first (smallest (doc_id, pos)) has its span deleted; documents are
# re-emitted as md5 of the cleaned text plus removal counts. The
# keeper rule is a total order, so the whole transformation is
# deterministic and the oracle replays it exactly — a VALUE-level
# check on exact substring-level dedup. Posture: one shingle-keyed
# window (rank + count in a single pass), one span explode + per-doc
# distinct aggregate, one join back on doc_id; all map-side HOFs
# otherwise, zero Python.
# --------------------------------------------------------------------------
@register(
    "q132_span_dedup",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh0 AS (
  SELECT doc_id, t,
         unnest(CASE WHEN len(t) >= 5 THEN generate_series(1, len(t) - 4)
                     ELSE [] END) AS pos
  FROM toks
),
sh AS (
  SELECT doc_id, pos, array_to_string(list_slice(t, pos, pos + 4), ' ') AS v
  FROM sh0
),
ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY v ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY v) AS c
  FROM sh
),
rem AS (
  SELECT DISTINCT doc_id, pos + off AS idx
  FROM (SELECT doc_id, pos, unnest(generate_series(0, 4)) AS off
        FROM ranked WHERE c > 1 AND rn > 1)
),
remagg AS (
  SELECT doc_id, list(idx) AS rm FROM rem GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(len(r.rm), 0) AS BIGINT) AS n_removed,
       md5(CASE WHEN r.rm IS NULL THEN array_to_string(d.t, ' ')
            -- array_to_string([]) is NULL in DuckDB but '' in Spark
            ELSE COALESCE(array_to_string(
                   list_transform(
                     list_filter(generate_series(1, len(d.t)),
                                 i -> NOT list_contains(r.rm, i)),
                     i -> d.t[i]), ' '), '')
       END) AS clean_md5
FROM toks d LEFT JOIN remagg r USING (doc_id)
""",
)
def q132_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.dedup import remove_duplicate_spans

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(docs, width=5)


# --------------------------------------------------------------------------
# q133 — time-series gap fill (I+ extension, resample/ffill): each
# user's last purchase value per day, densified to every calendar day
# between the user's first and last purchase and forward-filled — the
# densification step that makes "value on day X" / trailing averages
# correct on sparse data. Day surfaces as yyyy-MM-dd, value as exact
# floor(value*1e6). Posture: spine via per-key sequence() off a tiny
# min/max aggregate (never a calendar cross join); all three shuffles
# keyed on user_id.
# --------------------------------------------------------------------------
@register(
    "q133_gap_fill",
    oracle="""
WITH obs AS (
  SELECT user_id, day, val_e6 FROM (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(floor(value * 1000000) AS BIGINT) AS val_e6,
           ROW_NUMBER() OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase')
  WHERE rn = 1
),
bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY user_id
),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
       last_value(o.val_e6 IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_e6,
       o.val_e6 IS NOT NULL AS is_observed
FROM spine s LEFT JOIN obs o USING (user_id, day)
""",
)
def q133_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cubicerp_client_etl_spark.operators.history import gap_fill_daily

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("val_e6"),
        "ts",
        "event_id",
    )
    w = W.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    obs = (
        daily.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "day", "val_e6")
    )
    filled = gap_fill_daily(obs, key="user_id", day_col="day", value_col="val_e6")
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "val_e6",
        "is_observed",
    )


# --------------------------------------------------------------------------
# q212 (birth q134) — exact set-similarity self-join via prefix filtering (L-dedup,
# PPJoin/AllPairs family): all document pairs with 3-gram shingle-set
# Jaccard >= 1/2, found WITHOUT MinHash (lossless — no hash-family
# false negatives) and WITHOUT all-pairs (candidates only where rare
# prefix shingles collide + length filter). All threshold arithmetic
# is the integer fraction (1,2), bit-identical across engines. The
# oracle brute-forces the DEFINITION (explode join on any shared
# shingle, exact integer test) — equality proves the prefix filter is
# lossless on real data, not just in theory.
# --------------------------------------------------------------------------
@register(
    "q212_setsim_join",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
s AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(tk) - 2),
             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS ts
  FROM t WHERE len(tk) >= 3
),
f AS (
  SELECT doc_id, unnest(ts) AS sh, len(ts) AS sz FROM s
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS inter,
         CAST(ANY_VALUE(a.sz) AS BIGINT) AS sza,
         CAST(ANY_VALUE(b.sz) AS BIGINT) AS szb
  FROM f a JOIN f b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, inter,
       sza + szb - inter AS uni,
       1000000 * inter // (sza + szb - inter) AS jaccard_e6
FROM pairs
WHERE 3 * inter >= sza + szb
""",
)
def q212_setsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.dedup import setsim_join

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return setsim_join(docs, shingle_n=3, threshold=(1, 2))


# --------------------------------------------------------------------------
# q135 — hierarchy resolution by pointer jumping (C-family extension):
# customers form a synthetic forest (parent = custkey div 8; keys < 8
# are roots) — the account/org/BOM-hierarchy shape every warehouse
# eventually rolls up. Doubling reaches depth 2^rounds in `rounds`
# joins (the recursive-CTE walk needs one join per LEVEL); the oracle
# IS that per-level recursive CTE, so equality also checks the
# doubling algebra (root fixpoints, distance addition) exactly.
# --------------------------------------------------------------------------
@register(
    "q027_hierarchy_roots",
    oracle="""
WITH RECURSIVE w AS (
  SELECT c_custkey AS node, c_custkey AS cur, CAST(0 AS BIGINT) AS depth
  FROM customer
  UNION ALL
  SELECT node, cur // 8, depth + 1 FROM w WHERE cur >= 8
)
SELECT node, CAST(cur AS BIGINT) AS root, depth
FROM w WHERE cur < 8
""",
)
def q027_hierarchy_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.graph import pointer_jump_roots

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node"),
        F.when(F.col("c_custkey") >= 8, F.expr("c_custkey div 8"))
        .otherwise(F.col("c_custkey"))
        .alias("parent"),
    )
    return pointer_jump_roots(cust, node_col="node", parent_col="parent", rounds=4)


# --------------------------------------------------------------------------
# q136 — ordered funnel analysis (E-family extension, the
# MATCH_RECOGNIZE shape): per user with at least one 'view', the first
# view, the first 'click' strictly after it, the first 'purchase'
# strictly after that; reached_stage = how far the user got.
# Implemented as staged conditional-MIN aggregations joined on user_id
# — every shuffle shares the key and no per-user event array is ever
# materialized, so a billion-event power user costs per-row work only
# (the collect-per-user alternative caps at executor memory). Stage
# values are min timestamps, so determinism needs no tie-breaking.
# --------------------------------------------------------------------------
@register(
    "q031_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY e.user_id
)
SELECT v.user_id, v.t1, c.t2, p.t3,
       CAST(1 + CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS reached_stage
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
""",
)
def q031_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    out = v.join(c, "user_id", "left").join(p, "user_id", "left")
    return out.select(
        "user_id",
        "t1",
        "t2",
        "t3",
        (
            F.lit(1)
            + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
            + F.when(F.col("t3").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("reached_stage"),
    )


# --------------------------------------------------------------------------
# q137 — cohort retention matrix (D-family extension): users cohorted
# by first-signup week; for each later week offset, how many of the
# cohort were active (any event). The third classic engagement shape
# next to DAU (q092) and funnels (q136). Weeks are integer epoch-day
# div 7 (no timezone/week-start ambiguity across engines). Two keyed
# shuffles (per-user cohort, then cohort-week rollup); the activity
# join is user-keyed.
# --------------------------------------------------------------------------
@register(
    "q137_cohort_retention",
    oracle="""
WITH su AS (
  SELECT user_id,
         MIN(epoch_us(ts) // 86400000000 // 7) AS cohort_wk
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, su.cohort_wk,
         (epoch_us(e.ts) // 86400000000 // 7) - su.cohort_wk AS wk_offset
  FROM events e JOIN su USING (user_id)
  WHERE (epoch_us(e.ts) // 86400000000 // 7) >= su.cohort_wk
)
SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
       CAST(wk_offset AS BIGINT) AS wk_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM act GROUP BY cohort_wk, wk_offset
""",
)
def q137_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("wk"),
    )
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"))
    )
    act = (
        ev.join(su, "user_id")
        .filter(F.col("wk") >= F.col("cohort_wk"))
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"))
        .distinct()
    )
    return act.groupBy("cohort_wk", "wk_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )


# --------------------------------------------------------------------------
# q197 (birth q138) — exact stratified sample (L-pipeline): EXACTLY 120 documents,
# allocated across languages proportionally by largest-remainder
# (Hamilton) quotas, selected per group by keyed hash — "same mix as
# the corpus, exact total". All integer arithmetic (base = n·gc div
# tot, leftovers to largest remainders, ties by group value), so the
# oracle replays the allocation exactly. The quota window runs over
# the group-cardinality table (bounded); the data pass is one
# per-group rank window.
# --------------------------------------------------------------------------
_STRAT_N = 120


@register(
    "q197_stratified_sample",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS gc FROM documents GROUP BY lang
),
tot AS (SELECT SUM(gc) AS t FROM counts),
alloc AS (
  SELECT lang, gc,
         {_STRAT_N} * gc // t AS base,
         ({_STRAT_N} * gc) % t AS rem
  FROM counts, tot
),
quotas AS (
  SELECT lang,
         base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang)
                       <= {_STRAT_N} - (SELECT SUM(base) FROM alloc)
                     THEN 1 ELSE 0 END AS quota
  FROM alloc
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR) || '|strat1'), 1, 16),
                    doc_id) AS rn
  FROM documents
)
SELECT r.doc_id, r.lang
FROM ranked r JOIN quotas q USING (lang)
WHERE r.rn <= q.quota
""",
)
def q197_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sampling import stratified_sample_exact

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample_exact(
        docs, group_col="lang", key_col="doc_id", total_n=_STRAT_N, seed="strat1"
    )


# --------------------------------------------------------------------------
# q139 — frequent co-occurrence mining (D-family extension, the
# market-basket 2-itemset shape with the Apriori prune): token pairs
# appearing together in >= 20% of documents, with both tokens
# individually frequent first (monotonicity: an infrequent token can't
# be in a frequent pair — the prune that keeps the pair join from
# exploding on a 100 TB corpus with a Zipf vocabulary). Support
# threshold is exact integer arithmetic (5·support >= n_docs). Pair
# generation is a doc-keyed self-join of the FILTERED token list, so
# pair fan-out is bounded by frequent-tokens-per-doc squared, not
# vocabulary squared.
# --------------------------------------------------------------------------
@register(
    "q139_cooccurrence",
    oracle="""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
tok AS (
  SELECT doc_id, unnest(ts) AS t FROM d
),
freq AS (
  SELECT t FROM tok, n GROUP BY t, n.n_docs
  HAVING 5 * COUNT(*) >= n_docs
),
ft AS (
  SELECT doc_id, t FROM tok WHERE t IN (SELECT t FROM freq)
),
pairs AS (
  SELECT a.t AS tok_a, b.t AS tok_b, CAST(COUNT(*) AS BIGINT) AS support
  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t
)
SELECT tok_a, tok_b, support
FROM pairs, n
WHERE 5 * support >= n.n_docs
""",
)
def q139_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    )
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    tok = docs.select("doc_id", F.explode("ts").alias("t"))
    freq = (
        tok.groupBy("t")
        .agg(F.count("*").alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(5 * F.col("_df") >= F.col("n_docs"))
        .select("t")
    )
    ft = tok.join(F.broadcast(freq), "t")
    a = ft.select(F.col("doc_id"), F.col("t").alias("tok_a"))
    b = ft.select(F.col("doc_id"), F.col("t").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("bigint").alias("support"))
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .filter(5 * F.col("support") >= F.col("n_docs"))
        .select("tok_a", "tok_b", "support")
    )


# --------------------------------------------------------------------------
# q170 (birth q140) — Pareto revenue concentration (F/E-family scale showcase):
# parts ranked by revenue desc with an EXACT running revenue total
# computed by the two-phase distributed scan (operators/prefix.py) —
# never a single-partition global window — and the 80%-of-revenue flag
# decided in pure decimal arithmetic (5·cum <= 4·total). Decimal
# addition is associative, so the distributed scan is bit-identical to
# the oracle's global window; (rev desc, partkey) is a total order so
# partition boundaries can't reorder ties.
# --------------------------------------------------------------------------
@register(
    "q170_pareto_scan",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev_dec
  FROM lineitem GROUP BY l_partkey
),
scan AS (
  SELECT l_partkey, rev_dec,
         SUM(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec,
         SUM(rev_dec) OVER () AS tot_dec
  FROM rev
)
SELECT l_partkey,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(cum_dec AS DOUBLE) AS cum_revenue,
       (5 * cum_dec <= 4 * tot_dec) AS in_top80
FROM scan
""",
)
def q170_pareto_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import dec
    from cubicerp_client_etl_spark.operators.prefix import prefix_sum

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("rev_dec")
    )
    scanned = prefix_sum(
        rev,
        order_by=[F.col("rev_dec").desc(), F.col("l_partkey").asc()],
        value_col="rev_dec",
        out_col="cum_dec",
    )
    total = rev.agg(F.sum("rev_dec").alias("tot_dec"))
    return (
        scanned.crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.col("cum_dec").cast("double").alias("cum_revenue"),
            (F.lit(5) * F.col("cum_dec") <= F.lit(4) * F.col("tot_dec")).alias(
                "in_top80"
            ),
        )
    )
