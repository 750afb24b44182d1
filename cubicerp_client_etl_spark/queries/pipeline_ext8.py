"""Round-8 extension wave: checksum-validated PII auditing,
data-constrained epoch allocation, vocabulary-growth datasheets,
sorted-neighborhood dedup blocking, and bucketed negative sampling.

Same corpus discipline as the rest of the registry: exact integer /
IEEE-deterministic arithmetic so every query carries a DuckDB oracle
the driver can hash-compare, and every operator keeps the shape that
survives 100 TB — keyed aggregations with map-side combine, equi-joins
on hash buckets, windows only on high-cardinality keys or bounded
aggregates, no all-pairs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import hi_lo_bigint
from cubicerp_client_etl_spark.queries import register
from cubicerp_client_etl_spark.checkpointing import pin

# --------------------------------------------------------------------------
# q282 (birth q216) — Luhn-validated payment-card PII audit (operators/text.py
# luhn_valid/card_candidates): regex extraction finds 13-19-digit card
# CANDIDATES; the ISO/IEC 7812 Luhn checksum separates real card
# numbers from random digit runs — the precision upgrade over the
# reference-style regex-only scrub (redact_pii). Cards are synthesized
# deterministically from doc_id (even ids get a VALID check digit, odd
# ids a guaranteed-invalid one; every 5th doc also embeds the classic
# 4111-1111-1111-1111), so the oracle replays synthesis AND detection
# digit-for-digit. Scale: pure map-side regex + HOF arithmetic, one
# keyed aggregation — zero extra shuffle at any corpus size.
# --------------------------------------------------------------------------


@register(
    "q282_pii_card_audit",
    oracle=r"""
WITH synth AS (
  SELECT doc_id, source,
         lpad(CAST(doc_id * 7919 % 100000000000000 AS VARCHAR), 15, '4') AS b15
  FROM documents
),
chk AS (
  SELECT doc_id, source, b15,
         list_sum(list_transform(range(1, 16),
           j -> CASE WHEN j % 2 = 0 THEN CAST(substr(reverse(b15), j, 1) AS INT)
                     ELSE CASE WHEN 2*CAST(substr(reverse(b15), j, 1) AS INT) > 9
                               THEN 2*CAST(substr(reverse(b15), j, 1) AS INT) - 9
                               ELSE 2*CAST(substr(reverse(b15), j, 1) AS INT) END
                END)) AS s
  FROM synth
),
card AS (
  SELECT doc_id, source,
         b15 || CAST(CASE WHEN doc_id % 2 = 1
                          THEN ((10 - s % 10) % 10 + 5) % 10
                          ELSE (10 - s % 10) % 10 END AS VARCHAR) AS c16
  FROM chk
),
txt AS (
  SELECT doc_id, source,
         'pay ' || substr(c16, 1, 4) || ' ' || substr(c16, 5, 4) || ' '
                || substr(c16, 9, 4) || ' ' || substr(c16, 13, 4)
                || CASE WHEN doc_id % 5 = 0
                        THEN ' plus 4111 1111 1111 1111' ELSE '' END
                || ' ref' AS text
  FROM card
),
cand AS (
  SELECT doc_id, source,
         unnest(list_transform(
           regexp_extract_all(text, '\b\d(?:[ -]?\d){12,18}\b'),
           x -> regexp_replace(x, '[ -]', '', 'g'))) AS s
  FROM txt
),
v AS (
  SELECT doc_id, source, s,
         length(s) BETWEEN 13 AND 19 AND
         list_sum(list_transform(range(1, length(s) + 1),
           i -> CASE WHEN i % 2 = 1 THEN CAST(substr(reverse(s), i, 1) AS INT)
                     ELSE CASE WHEN 2*CAST(substr(reverse(s), i, 1) AS INT) > 9
                               THEN 2*CAST(substr(reverse(s), i, 1) AS INT) - 9
                               ELSE 2*CAST(substr(reverse(s), i, 1) AS INT) END
                END)) % 10 = 0 AS ok
  FROM cand
)
SELECT source,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_cands,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid,
       CAST(COALESCE(SUM(DISTINCT CASE WHEN ok THEN doc_id END), 0) AS BIGINT)
         AS valid_doc_sum
FROM v GROUP BY source
""",
)
def q282_pii_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.text import (
        card_candidates,
        luhn_valid,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    b15 = F.lpad(
        (F.col("doc_id") * 7919 % F.lit(10**14)).cast("string"), 15, "4"
    )
    rb = F.reverse(b15)

    def _term(j):
        d = F.substring(rb, j, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(j % 2 == 0, d).otherwise(
            F.when(dbl > 9, dbl - 9).otherwise(dbl)
        )

    s = F.aggregate(
        F.sequence(F.lit(1), F.lit(15)), F.lit(0), lambda acc, j: acc + _term(j)
    )
    good = (10 - s % 10) % 10
    chk = F.when(F.col("doc_id") % 2 == 1, (good + 5) % 10).otherwise(good)
    c16 = F.concat(b15, chk.cast("string"))
    text = F.concat(
        F.lit("pay "),
        F.concat_ws(
            " ",
            F.substring(c16, 1, 4),
            F.substring(c16, 5, 4),
            F.substring(c16, 9, 4),
            F.substring(c16, 13, 4),
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(" plus 4111 1111 1111 1111")
        ).otherwise(F.lit("")),
        F.lit(" ref"),
    )
    cands = docs.select(
        "doc_id", "source", F.explode(card_candidates(text)).alias("s")
    ).withColumn("ok", luhn_valid("s"))
    return cands.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cands"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).cast("bigint").alias("n_invalid"),
        F.coalesce(
            F.sum_distinct(F.when(F.col("ok"), F.col("doc_id"))), F.lit(0)
        )
        .cast("bigint")
        .alias("valid_doc_sum"),
    )


# --------------------------------------------------------------------------
# q248 (birth q217) — Data-constrained epoch allocation (operators/budget.py
# epoch_allocation; Muennighoff et al. 2023): even budget split across
# domains, ≤4 epochs of any domain's fresh data, capped domains hand
# their surplus to domains with headroom. Four tiny domains + one
# pooled 'web' domain make the cap bite at sf0.01 (redistribution
# exercised) while sf0.1 allocates uncapped — both exactly replayed.
# Scale: one keyed corpus aggregation; everything else runs on the
# O(#domains) frame.
# --------------------------------------------------------------------------

_EPOCH_BUDGET = 120_000
_EPOCH_MAX = 4


@register(
    "q248_epoch_allocation",
    oracle=f"""
WITH d AS (
  SELECT CASE WHEN source IN ('src0','src1','src2','src3') THEN source
              ELSE 'web' END AS domain,
         len(string_split(text, ' ')) AS tok
  FROM documents
),
c AS (
  SELECT domain, CAST(sum(tok) AS BIGINT) AS c_tokens FROM d GROUP BY domain
),
s AS (
  SELECT domain, c_tokens,
         count(*) OVER () AS _d,
         row_number() OVER (ORDER BY domain) AS _rk
  FROM c
),
s2 AS (
  SELECT *, {_EPOCH_BUDGET} // _d
            + CASE WHEN _rk <= {_EPOCH_BUDGET} % _d THEN 1 ELSE 0 END AS share,
         {_EPOCH_MAX} * c_tokens AS _cap
  FROM s
),
s3 AS (
  SELECT *, least(share, _cap) AS used1,
         _cap - least(share, _cap) AS head
  FROM s2
),
p AS (
  SELECT *, sum(share - used1) OVER () AS _unused,
         sum(head) OVER () AS _thead
  FROM s3
),
f AS (
  SELECT domain, c_tokens, share,
         used1 + CASE WHEN _thead > 0
                      THEN least(head, (_unused * head) // _thead)
                      ELSE 0 END AS allocated
  FROM p
)
SELECT domain, c_tokens,
       CAST(share AS BIGINT) AS share,
       CAST(allocated AS BIGINT) AS allocated,
       CAST(CASE WHEN c_tokens > 0 THEN allocated // c_tokens ELSE 0 END
            AS BIGINT) AS full_epochs,
       CAST(CASE WHEN c_tokens > 0 THEN allocated % c_tokens ELSE 0 END
            AS BIGINT) AS partial_tokens,
       CAST(CASE WHEN c_tokens > 0 THEN (allocated * 1000000) // c_tokens
            ELSE 0 END AS BIGINT) AS epochs_e6
FROM f
""",
)
def q248_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.budget import epoch_allocation

    docs = load(spark, sf_dir, "documents").select(
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3"),
            F.col("source"),
        )
        .otherwise(F.lit("web"))
        .alias("domain"),
        F.size(F.split(F.col("text"), " ")).alias("tok"),
    )
    return epoch_allocation(
        docs, "domain", "tok", budget=_EPOCH_BUDGET, max_epochs=_EPOCH_MAX
    )


# --------------------------------------------------------------------------
# q081 (birth q218) — Vocabulary-growth datasheet (operators/curation.py
# vocab_growth; Heaps' law / Good–Turing N₁): 8 ingestion slices by
# doc_id order; per slice the exact cumulative tokens, vocabulary,
# newly-seen words and singletons-so-far. Scale: token explode + two
# keyed aggs; the per-word cumulative window partitions on the word
# (high cardinality); bucket-level windows run over the 8-row
# aggregate (prover-bounded).
# --------------------------------------------------------------------------


@register(
    "q081_vocab_growth",
    oracle="""
WITH hi AS (SELECT max(doc_id) + 1 AS _hi FROM documents),
t AS (
  SELECT least(7, (doc_id * 8) // _hi) AS b,
         unnest(string_split(text, ' ')) AS w
  FROM documents, hi
),
t2 AS (SELECT b, w FROM t WHERE len(w) > 0),
wc AS (SELECT w, b, CAST(count(*) AS BIGINT) AS c FROM t2 GROUP BY w, b),
fb AS (SELECT w, min(b) AS _fb FROM wc GROUP BY w),
grid AS (
  SELECT fb.w, fb._fb, gb.b, coalesce(wc.c, 0) AS c
  FROM fb CROSS JOIN range(0, 8) gb(b)
  LEFT JOIN wc ON wc.w = fb.w AND wc.b = gb.b
),
cum AS (
  SELECT *, sum(c) OVER (PARTITION BY w ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM grid
),
pb AS (
  SELECT b,
         CAST(sum(c) AS BIGINT) AS tokens,
         CAST(sum(CASE WHEN _fb = b THEN 1 ELSE 0 END) AS BIGINT) AS vocab_new,
         CAST(sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_cum
  FROM cum GROUP BY b
)
SELECT CAST(b AS INT) AS bucket, tokens,
       CAST(sum(tokens) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS tokens_cum,
       vocab_new,
       CAST(sum(vocab_new) OVER (ORDER BY b
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_cum,
       n1_cum
FROM pb
""",
)
def q081_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.curation import vocab_growth

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = vocab_growth(docs, "text", "doc_id", n_buckets=8)
    return out.select(
        "bucket", "tokens", "tokens_cum", "vocab_new", "vocab_cum", "n1_cum"
    )


# --------------------------------------------------------------------------
# q029 (birth q219) — Sorted-neighborhood dedup blocking (operators/dedup.py
# sorted_neighborhood_pairs; Hernández & Stolfo 1995): candidates from
# a window-4 slide over the lower(text) sort order, sharded by 2-char
# prefix blocks with exact boundary recovery, then exact 3-shingle
# Jaccard verification on candidates only. Scale: the within-block
# window partitions on the prefix block (block_cap bounds a
# pathological block); the next-block lookup runs on the distinct-
# block aggregate; verify joins touch candidate pairs only.
# --------------------------------------------------------------------------

_SNM_W = 4
_SNM_P = 2
_SNM_KEYLEN = 64  # bounded sort key: at corpus scale you sort 64-byte
#                   keys, never full documents (ties broken by doc_id)
_SNM_TAU = 0.5


@register(
    "q029_sorted_neighborhood",
    headline=True,
    oracle=f"""
WITH base AS (
  SELECT doc_id AS _id, substr(lower(text), 1, {_SNM_KEYLEN}) AS _k,
         substr(lower(text), 1, {_SNM_P}) AS _blk
  FROM documents
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY _blk ORDER BY _k, _id) AS _rn
  FROM base
),
within AS (
  SELECT a._id AS id_a, b._id AS id_b, 'window' AS via
  FROM rn a JOIN rn b
    ON a._blk = b._blk
   AND b._rn > a._rn AND b._rn <= a._rn + {_SNM_W - 1}
),
blocks AS (SELECT _blk, max(_rn) AS _n FROM rn GROUP BY _blk),
ordd AS (
  SELECT _blk, _n, row_number() OVER (ORDER BY _blk) AS _ord FROM blocks
),
adj AS (
  SELECT a._blk, b._blk AS _blk_next
  FROM ordd a JOIN ordd b ON b._ord = a._ord + 1
),
tails AS (
  SELECT adj._blk_next AS _jblk, rn._id AS id_a, rn._rn AS _trn, blocks._n AS _tn
  FROM rn JOIN adj ON adj._blk = rn._blk
  JOIN blocks ON blocks._blk = rn._blk
  WHERE rn._rn > blocks._n - {_SNM_W - 1}
),
heads AS (
  SELECT _blk AS _jblk, _id AS id_b, _rn AS _hrn FROM rn WHERE _rn <= {_SNM_W - 1}
),
boundary AS (
  SELECT t.id_a, h.id_b, 'boundary' AS via
  FROM tails t JOIN heads h ON h._jblk = t._jblk
  WHERE h._hrn <= {_SNM_W - 1} - (t._tn - t._trn)
),
pairs AS (
  SELECT DISTINCT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b, via
  FROM (SELECT * FROM within UNION ALL SELECT * FROM boundary)
),
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
  FROM toks CROSS JOIN generate_series(1, 4096) g(i)
  WHERE len(t) >= 3 AND i <= len(t) - 2
  UNION
  SELECT DISTINCT doc_id, array_to_string(t, ' ') AS sh FROM toks WHERE len(t) < 3
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pd AS (SELECT DISTINCT id_a, id_b FROM pairs),
inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pd p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.sh = sa.sh
  GROUP BY p.id_a, p.id_b
),
jac AS (
  SELECT i.id_a, i.id_b,
         ROUND(CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter), 6) AS j
  FROM inter i
  JOIN sizes za ON za.doc_id = i.id_a
  JOIN sizes zb ON zb.doc_id = i.id_b
),
agg AS (
  SELECT p.via,
         CAST(COUNT(*) AS BIGINT) AS n_cands,
         CAST(SUM(CASE WHEN jac.j >= {_SNM_TAU} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_verified,
         CAST(COALESCE(SUM(CASE WHEN jac.j >= {_SNM_TAU}
                           THEN CAST(p.id_a AS DECIMAL(38,0)) * 1000000 + p.id_b
                           END), 0) AS HUGEINT)
           AS _ks
  FROM pairs p
  LEFT JOIN jac ON jac.id_a = p.id_a AND jac.id_b = p.id_b
  GROUP BY p.via
)
SELECT via, n_cands, n_verified,
       CAST(_ks // 1000000000000000000 AS BIGINT) AS verified_key_hi,
       CAST(_ks % 1000000000000000000 AS BIGINT) AS verified_key_lo
FROM agg
""",
)
def q029_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.catalog import widen_scan
    from cubicerp_client_etl_spark.operators.dedup import (
        jaccard_pairs,
        sorted_neighborhood_pairs,
    )

    # widen the narrow fixture scan: the shingle explode in the verify
    # stage is per-row CPU work that runs before any shuffle
    docs = widen_scan(load(spark, sf_dir, "documents").select("doc_id", "text"))
    # consumed twice (the verify-stage candidate list and the final
    # left join) — checkpoint so the blocking pass runs once
    pairs = sorted_neighborhood_pairs(
        docs,
        "doc_id",
        F.substring(F.lower(F.col("text")), 1, _SNM_KEYLEN),
        window=_SNM_W,
        prefix_len=_SNM_P,
        block_cap=10_000,
    ).transform(pin)
    ver = jaccard_pairs(
        docs, pairs.select("id_a", "id_b").distinct(), "doc_id", "text", 3
    )
    j = pairs.join(ver, ["id_a", "id_b"], "left")
    agg = j.groupBy("via").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cands"),
        F.sum(F.when(F.col("jaccard") >= _SNM_TAU, 1).otherwise(0))
        .cast("bigint")
        .alias("n_verified"),
        # decimal pair keys: bigint ids × 1e6 summed over many pairs
        # overflows int64 (hit at 10× shifted ids) — decimal(38,0)
        # stays exact at any id scale; the OUTPUT carrier is split
        # into two bigints because the driver's hash distinguishes
        # int128-backed values (DuckDB DECIMAL(p>18)) even when they
        # stringify identically (tools/oracle_sweep.py:8-14)
        F.coalesce(
            F.sum(
                F.when(
                    F.col("jaccard") >= _SNM_TAU,
                    F.col("id_a").cast("decimal(38,0)") * 1_000_000
                    + F.col("id_b"),
                )
            ),
            F.lit(0),
        )
        .cast("decimal(38,0)")
        .alias("_ks"),
    )
    return agg.select(
        "via",
        "n_cands",
        "n_verified",
        *hi_lo_bigint("_ks", "verified_key"),
    )


# --------------------------------------------------------------------------
# q094 (birth q220) — Bucketed negative sampling for contrastive training
# (operators/sampling.py bucketed_negative_sample): every embedding
# anchors k=4 probes into hash buckets and takes the md5-smallest
# different-label candidate per probe — deterministic negatives with
# NO per-anchor corpus scan (the naive form is a cross join). Scale:
# equi-join on bucket id, min-struct aggregate (map-side combinable);
# total candidate rows ≈ |anchors|·k·|pool|/n_buckets. The bucket
# count is DERIVED from the pool (greatest(32, pool div 64) — one
# cheap count job) so per-probe work stays a constant ~64 candidates
# and the whole stage is linear at any corpus size; a FIXED bucket
# count is the measured anti-example (README 100× table: 32 buckets
# does not complete at 100×, pool-proportional buckets run 0.8 s).
# --------------------------------------------------------------------------

_NEG_K = 4
_NEG_B_MIN = 32
_NEG_PER_BUCKET = 64


@register(
    "q094_contrastive_negatives",
    oracle=f"""
WITH nb AS (
  SELECT greatest({_NEG_B_MIN}, count(*) // {_NEG_PER_BUCKET}) AS b
  FROM embeddings
),
a AS (SELECT vec_id AS aid, label FROM embeddings),
probes AS (
  SELECT aid, label, t.j AS probe,
         CAST(concat('0x', substr(md5(aid || '|' || t.j || '|'), 1, 8))
              AS BIGINT) % nb.b AS _bkt
  FROM a CROSS JOIN range(1, {_NEG_K + 1}) t(j) CROSS JOIN nb
),
pool AS (
  SELECT vec_id AS cid, label AS clabel,
         CAST(concat('0x', substr(md5(vec_id || '|'), 1, 8))
              AS BIGINT) % nb.b AS _bkt
  FROM embeddings CROSS JOIN nb
),
joined AS (
  SELECT p.aid, p.label, p.probe, c.cid,
         md5(p.aid || '|' || c.cid || '|' || p.probe || '|') AS pick
  FROM probes p JOIN pool c ON c._bkt = p._bkt
  WHERE p.aid <> c.cid AND p.label <> c.clabel
),
best AS (
  SELECT aid, label, probe, min_by(cid, pick) AS neg_id
  FROM joined GROUP BY aid, label, probe
),
agg AS (
  SELECT label,
         CAST(COUNT(DISTINCT aid) AS BIGINT) AS n_anchors,
         CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(COUNT(DISTINCT neg_id) AS BIGINT) AS n_distinct_negs,
         CAST(SUM(CAST(aid AS DECIMAL(38,0)) * 10000000
                  + probe * 1000000 + neg_id) AS HUGEINT) AS _ks
  FROM best GROUP BY label
)
SELECT label, n_anchors, n_hits, n_distinct_negs,
       CAST(_ks // 1000000000000000000 AS BIGINT) AS key_sum_hi,
       CAST(_ks % 1000000000000000000 AS BIGINT) AS key_sum_lo
FROM agg
""",
)
def q094_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sampling import (
        bucketed_negative_sample,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    # size buckets from the pool (one cheap count job) so per-probe
    # candidate work is a constant ~_NEG_PER_BUCKET rows at ANY scale
    n_buckets = max(_NEG_B_MIN, emb.count() // _NEG_PER_BUCKET)
    negs = bucketed_negative_sample(
        emb,
        emb,
        anchor_id="vec_id",
        cand_id="vec_id",
        exclude_on="label",
        k=_NEG_K,
        n_buckets=n_buckets,
    )
    lab = emb.select(F.col("vec_id"), F.col("label"))
    agg = (
        negs.join(lab, "vec_id")
        .groupBy("label")
        .agg(
            F.countDistinct("vec_id").cast("bigint").alias("n_anchors"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.countDistinct("neg_id").cast("bigint").alias("n_distinct_negs"),
            F.sum(
                F.col("vec_id").cast("decimal(38,0)") * 10_000_000
                + F.col("probe") * 1_000_000
                + F.col("neg_id")
            )
            .cast("decimal(38,0)")
            .alias("_ks"),
        )
    )
    return agg.select(
        "label",
        "n_anchors",
        "n_hits",
        "n_distinct_negs",
        *hi_lo_bigint("_ks", "key_sum"),
    )


# --------------------------------------------------------------------------
# q100 (birth q221) — HLL join-cardinality probe (operators/sketches.hll_set_algebra):
# register max-merge gives |A∪B|, inclusion–exclusion gives |A∩B| — the
# pre-join key-overlap estimate (how many customers actually ordered?)
# at m-register memory however large both sides are. Reported next to
# the exact counts so the query doubles as the estimator's accuracy
# datasheet (est_inter_raw keeps the sign — the documented HLL-
# intersection caveat). Every register and every division is exact
# integer arithmetic the oracle replays bit-for-bit.
# --------------------------------------------------------------------------


@register(
    "q100_hll_join_cardinality",
    oracle="""
WITH ha AS (
  SELECT CAST(concat('0x',
           substr(md5(CAST(o_custkey AS VARCHAR) || '|hll1'), 1, 8))
         AS BIGINT) AS h
  FROM orders
),
hb AS (
  SELECT CAST(concat('0x',
           substr(md5(CAST(c_custkey AS VARCHAR) || '|hll1'), 1, 8))
         AS BIGINT) AS h
  FROM customer
),
ra AS (
  SELECT bucket, MAX(m_rho) AS m_rho FROM (
    SELECT h // 67108864 AS bucket,
           CASE WHEN h % 67108864 = 0 THEN 27
                ELSE 27 - length(bin(h % 67108864)) END AS m_rho
    FROM ha) GROUP BY bucket
),
rb AS (
  SELECT bucket, MAX(m_rho) AS m_rho FROM (
    SELECT h // 67108864 AS bucket,
           CASE WHEN h % 67108864 = 0 THEN 27
                ELSE 27 - length(bin(h % 67108864)) END AS m_rho
    FROM hb) GROUP BY bucket
),
ga AS (
  SELECT g.i AS bucket, COALESCE(ra.m_rho, 0) AS m_rho
  FROM generate_series(0, 63) g(i) LEFT JOIN ra ON ra.bucket = g.i
),
gb AS (
  SELECT g.i AS bucket, COALESCE(rb.m_rho, 0) AS m_rho
  FROM generate_series(0, 63) g(i) LEFT JOIN rb ON rb.bucket = g.i
),
gu AS (
  SELECT ga.bucket, greatest(ga.m_rho, gb.m_rho) AS m_rho
  FROM ga JOIN gb ON gb.bucket = ga.bucket
),
ea AS (
  SELECT CAST(389776872046592000 //
           (SUM(CAST(1 AS BIGINT) << (27 - m_rho)) * 1000000) AS BIGINT)
         AS est_a
  FROM ga
),
eb AS (
  SELECT CAST(389776872046592000 //
           (SUM(CAST(1 AS BIGINT) << (27 - m_rho)) * 1000000) AS BIGINT)
         AS est_b
  FROM gb
),
eu AS (
  SELECT CAST(389776872046592000 //
           (SUM(CAST(1 AS BIGINT) << (27 - m_rho)) * 1000000) AS BIGINT)
         AS est_union
  FROM gu
),
ex AS (
  SELECT CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
           AS exact_a,
         CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
           AS exact_b,
         CAST((SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
               JOIN customer c ON c.c_custkey = o.o_custkey) AS BIGINT)
           AS exact_inter
)
SELECT CAST(64 AS BIGINT) AS m, est_a, est_b, est_union,
       CAST(est_a + est_b - est_union AS BIGINT) AS est_inter_raw,
       CAST(greatest(est_a + est_b - est_union, 0) AS BIGINT) AS est_inter,
       exact_a, exact_b, exact_inter,
       CAST(abs(greatest(est_a + est_b - est_union, 0) - exact_inter)
            * 1000000 // exact_inter AS BIGINT) AS inter_err_e6
FROM ea CROSS JOIN eb CROSS JOIN eu CROSS JOIN ex
""",
)
def q100_hll_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sketches import hll_set_algebra

    orders = load(spark, sf_dir, "orders").select("o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    est = hll_set_algebra(orders, "o_custkey", cust, "c_custkey", seed="1")
    exact = (
        orders.agg(
            F.count_distinct("o_custkey").cast("bigint").alias("exact_a")
        )
        .join(
            F.broadcast(
                cust.agg(
                    F.count_distinct("c_custkey").cast("bigint").alias("exact_b")
                )
            )
        )
        .join(
            F.broadcast(
                orders.join(
                    cust, orders.o_custkey == cust.c_custkey
                ).agg(
                    F.count_distinct("o_custkey")
                    .cast("bigint")
                    .alias("exact_inter")
                )
            )
        )
    )
    return est.join(F.broadcast(exact)).select(
        "m",
        "est_a",
        "est_b",
        "est_union",
        "est_inter_raw",
        "est_inter",
        "exact_a",
        "exact_b",
        "exact_inter",
        F.expr("abs(est_inter - exact_inter) * 1000000 div exact_inter")
        .cast("bigint")
        .alias("inter_err_e6"),
    )


# --------------------------------------------------------------------------
# q102 (birth q222) — Matryoshka truncation recall audit (L-sim family): rank top-10
# neighbors with the FULL 64-dim embedding and again with only the
# first 32 dims (the Matryoshka-representation deployment trick: store/
# search half the vector, verify the recall cost before shipping it).
# Both rankings are exact rounded-cosine + id tie-break (the q034
# discipline), so the oracle replays every rank and the overlap counts
# hash-check. Scale: probes broadcast, corpus streamed once per
# ranking; the overlap join touches 10 rows per probe per side.
# --------------------------------------------------------------------------

_MRL_K = 10
_MRL_DIMS = 32


@register(
    "q102_matryoshka_recall",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         CAST(embedding[1:{_MRL_DIMS}] AS DOUBLE[]) AS vt
  FROM embeddings
),
probes AS (
  SELECT vec_id AS probe_id, v AS pv, vt AS pvt FROM e
  WHERE vec_id % GREATEST(100,
          (SELECT COUNT(*) FROM embeddings) // 50) = 7
),
full_rank AS (
  SELECT probe_id, vec_id, rank FROM (
    SELECT p.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
             ROUND(list_dot_product(e.v, p.pv) /
                   sqrt(list_dot_product(e.v, e.v) *
                        list_dot_product(p.pv, p.pv)), 6) DESC,
             e.vec_id) AS rank
    FROM e CROSS JOIN probes p
    WHERE e.vec_id <> p.probe_id)
  WHERE rank <= {_MRL_K}
),
trunc_rank AS (
  SELECT probe_id, vec_id, rank FROM (
    SELECT p.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
             ROUND(list_dot_product(e.vt, p.pvt) /
                   sqrt(list_dot_product(e.vt, e.vt) *
                        list_dot_product(p.pvt, p.pvt)), 6) DESC,
             e.vec_id) AS rank
    FROM e CROSS JOIN probes p
    WHERE e.vec_id <> p.probe_id)
  WHERE rank <= {_MRL_K}
)
SELECT f.probe_id,
       CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(t.vec_id) * 1000000 // {_MRL_K} AS BIGINT) AS recall_e6
FROM full_rank f
LEFT JOIN trunc_rank t
  ON t.probe_id = f.probe_id AND t.vec_id = f.vec_id
GROUP BY f.probe_id
""",
)
def q102_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    _mod = max(100, emb.count() // 50)

    def topk(vec_expr):
        corpus = emb.select("vec_id", vec_expr.alias("embedding"))
        # FIXED-size probe panel (the q038/q267 rule): the modulus
        # derives from ONE scalar count so probes stay ~50 at any
        # scale — the %100 form made probes 1% OF THE CORPUS, turning
        # the brute-force crossJoin quadratic (the standing census
        # measured 14.5x at 10x; same class as q267's first cut).
        # mod = 100 at both fixture SFs, so fixture outputs are
        # unchanged.
        probes = corpus.filter(F.col("vec_id") % _mod == 7).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        out = sim.brute_force_topk(corpus, probes, k=_MRL_K + 1)
        w = Window.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("vec_id")
        )
        return (
            out.filter(F.col("vec_id") != F.col("probe_id"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= _MRL_K)
            .select("probe_id", "vec_id")
        )

    full = topk(F.col("embedding"))
    trunc = topk(F.slice(F.col("embedding"), 1, _MRL_DIMS))
    t = trunc.select("probe_id", F.col("vec_id").alias("_tv"))
    return (
        full.join(
            t,
            (t.probe_id == full.probe_id) & (F.col("_tv") == full.vec_id),
            "left",
        )
        .drop(t.probe_id)
        .groupBy("probe_id")
        .agg(
            F.count("_tv").cast("bigint").alias("n_overlap"),
            F.expr(f"CAST(count(_tv) * 1000000 div {_MRL_K} AS BIGINT)").alias(
                "recall_e6"
            ),
        )
    )


# --------------------------------------------------------------------------
# q204 (birth q223) — Phonetic (Soundex) blocking for record linkage
# (operators/linkage.soundex_portable): surnames synthesized
# deterministically from custkey out of a 12-name panel chosen so each
# phonetic key mixes true near-matches (SMITH/SMYTH, lev 1) with
# decoys that share the sound but not the spelling (SMOOT, lev 3) —
# the precision/recall anatomy of phonetic blocking, verified by
# edit distance on candidates only. The blocking key chain is the
# RE2-safe translate/regexp form both engines execute identically, so
# every key, pair and verdict oracle-replays. Scale: equi-join on
# (soundex, nation, segment); verify touches candidates only.
# --------------------------------------------------------------------------

_SDX_NAMES = [
    "SMITH", "SMYTH", "SMOOT", "JOHNSON", "JONSON", "JANSEN",
    "MEYER", "MAYER", "MOYER", "SCHMIDT", "SCHMITT", "SCHMID",
]


@register(
    "q204_soundex_blocking",
    oracle=f"""
WITH rec AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         (['{"','".join(_SDX_NAMES)}'])[(c_custkey % 12) + 1] AS surname
  FROM customer
),
keyed AS (
  SELECT *, substr(u,1,1) || rpad(substr(
           replace(substr(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(
               translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                         '01230120022455012623010202'),
               '0+','0','g'),'1+','1','g'),'2+','2','g'),'3+','3','g'),
               '4+','4','g'),'5+','5','g'),'6+','6','g'),
           2), '0', ''), 1, 3), 3, '0') AS sdx
  FROM (SELECT *, upper(regexp_replace(surname, '[^A-Za-z]', '', 'g')) AS u
        FROM rec)
),
cand AS (
  SELECT a.sdx, a.surname AS sa, b.surname AS sb
  FROM keyed a JOIN keyed b
    ON a.sdx = b.sdx
   AND a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
)
SELECT sdx,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN levenshtein(sa, sb) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lev0,
       CAST(SUM(CASE WHEN levenshtein(sa, sb) BETWEEN 1 AND 2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       CAST(SUM(CASE WHEN levenshtein(sa, sb) > 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_far
FROM cand GROUP BY sdx
""",
)
def q204_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.linkage import (
        blocked_pairs,
        soundex_portable,
    )

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    rec = cust.withColumn(
        "surname",
        F.element_at(
            F.array(*[F.lit(n) for n in _SDX_NAMES]),
            (F.col("c_custkey") % 12 + 1).cast("int"),
        ),
    ).withColumn("sdx", soundex_portable("surname"))
    cand = blocked_pairs(
        rec, "c_custkey", ["sdx", "c_nationkey", "c_mktsegment"]
    )
    lev = F.levenshtein(F.col("surname_a"), F.col("surname_b"))
    return cand.groupBy("sdx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(lev == 0, 1).otherwise(0)).cast("bigint").alias("n_lev0"),
        F.sum(F.when((lev >= 1) & (lev <= 2), 1).otherwise(0))
        .cast("bigint")
        .alias("n_near"),
        F.sum(F.when(lev > 2, 1).otherwise(0)).cast("bigint").alias("n_far"),
    )


# --------------------------------------------------------------------------
# q268 (birth q224) — k-anonymous aggregate release (operators/quality.
# k_anonymize_release): cross-tab of customer balances by
# (nation, segment, cohort) with the minimum-cell-size rule — cells
# under k=4 rows pool into one '*' catch-all so no published cell
# isolates fewer than k individuals. Additive measures (count, cents
# sum) stay exact through the pooling. Scale: one keyed aggregation;
# the suppression decision and the pool run on the aggregate only.
# --------------------------------------------------------------------------


@register(
    "q268_k_anonymous_release",
    oracle="""
WITH g AS (
  SELECT CAST(c_nationkey AS VARCHAR) AS nation,
         c_mktsegment AS segment,
         CAST(c_custkey % 9 AS VARCHAR) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS sum_bal_cents
  FROM customer
  GROUP BY 1, 2, 3
),
released AS (SELECT * FROM g WHERE n_rows >= 4),
pooled AS (
  SELECT '*' AS nation, '*' AS segment, '*' AS cohort,
         CAST(SUM(n_rows) AS BIGINT) AS n_rows,
         CAST(SUM(sum_bal_cents) AS BIGINT) AS sum_bal_cents
  FROM g WHERE n_rows < 4
  HAVING COUNT(*) > 0
)
SELECT * FROM released UNION ALL SELECT * FROM pooled
""",
)
def q268_k_anonymous_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import k_anonymize_release

    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_custkey") % 9).alias("cohort"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("_cents"),
    )
    return k_anonymize_release(
        cust,
        ["nation", "segment", "cohort"],
        k=4,
        measures={"sum_bal_cents": F.sum("_cents").cast("bigint")},
    )


# --------------------------------------------------------------------------
# q232 (birth q225) — Winsorized statistics via the mergeable quantile sketch
# (operators/quantiles.histogram_quantile_sketch): clip lineitem price
# cents at the sketch's p01/p99 estimates and report the clipped-tail
# anatomy — the outlier-capping pre-processing step feature pipelines
# run, at sketch cost (two map-side-combinable passes) instead of an
# exact order statistic. Every threshold and sum is exact integer /
# decimal, oracle-replayed including the sketch itself.
# --------------------------------------------------------------------------


@register(
    "q232_winsorized_stats",
    oracle="""
WITH c AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM lineitem
),
mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi, CAST(COUNT(*) AS BIGINT) AS n FROM c),
pw AS (SELECT lo, hi, n, (hi - lo + 256) // 256 AS w FROM mm),
bu AS (
  SELECT (c.v - pw.lo) // pw.w AS b, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c CROSS JOIN pw GROUP BY 1
),
cum AS (SELECT b, SUM(cnt) OVER (ORDER BY b) AS cum FROM bu),
spec AS (SELECT unnest([0.01, 0.99]) AS q),
est AS (
  SELECT s.q, pw.lo + MIN(cum.b) * pw.w AS est
  FROM spec s CROSS JOIN cum CROSS JOIN pw
  WHERE CAST(cum.cum AS DOUBLE) / pw.n >= s.q
  GROUP BY s.q, pw.lo, pw.w
),
thr AS (
  SELECT MIN(CASE WHEN q = 0.01 THEN est END) AS p01,
         MIN(CASE WHEN q = 0.99 THEN est END) AS p99
  FROM est
),
agg AS (
  SELECT CAST(p01 AS BIGINT) AS p01_cents,
         CAST(p99 AS BIGINT) AS p99_cents,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN v < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         CAST(SUM(CASE WHEN v > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS _sc,
         CAST(SUM(CAST(least(greatest(v, p01), p99) AS HUGEINT)) AS HUGEINT)
           AS _swc
  FROM c CROSS JOIN thr
  GROUP BY p01, p99
)
SELECT p01_cents, p99_cents, n, n_low, n_high,
       CAST(_sc // 1000000000000000000 AS BIGINT) AS sum_cents_hi,
       CAST(_sc % 1000000000000000000 AS BIGINT) AS sum_cents_lo,
       CAST(_swc // 1000000000000000000 AS BIGINT) AS sum_winsorized_hi,
       CAST(_swc % 1000000000000000000 AS BIGINT) AS sum_winsorized_lo
FROM agg
""",
)
def q232_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quantiles import (
        histogram_quantile_sketch,
    )

    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v")
    )
    sk = histogram_quantile_sketch(li, "v", [0.01, 0.99], n_buckets=256)
    thr = sk.agg(
        F.min(F.when(F.col("q") == 0.01, F.col("est"))).alias("p01"),
        F.min(F.when(F.col("q") == 0.99, F.col("est"))).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("p01")), F.col("p99"))
    return (
        li.join(F.broadcast(thr))
        .groupBy("p01", "p99")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("v") < F.col("p01"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("v") > F.col("p99"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
            F.sum(F.col("v").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("_sc"),
            F.sum(clipped.cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("_swc"),
        )
        .select(
            F.col("p01").cast("bigint").alias("p01_cents"),
            F.col("p99").cast("bigint").alias("p99_cents"),
            "n",
            "n_low",
            "n_high",
            *hi_lo_bigint("_sc", "sum_cents"),
            *hi_lo_bigint("_swc", "sum_winsorized"),
        )
    )


# --------------------------------------------------------------------------
# q234 (birth q226) — Currency conversion with sparse as-of rates (C9 in its ERP
# shape): monthly FX rates synthesized deterministically per currency
# with ~1/3 of months MISSING, forward-filled over the bounded
# (currency × month) grid — never a raw-row window on the 4-currency
# key — then orders equi-join the filled dimension on
# (currency, order month) and convert exactly (cents × rate_e6 in
# decimal(38,0); int64 would overflow at scale-fixture ids). Orders
# predating the first rate stay unconverted and are COUNTED, not
# dropped. Scale: the rate dimension is bounded and broadcast; the
# fact side is one equi-join, no shuffle beyond the final rollup.
# --------------------------------------------------------------------------

_FX_CURS = ["USD", "EUR", "JPY", "GBP"]


@register(
    "q234_currency_asof_conversion",
    oracle=f"""
WITH months AS (
  SELECT unnest(generate_series(DATE '1992-01-01', DATE '1998-12-01',
                                INTERVAL 1 MONTH))::DATE AS m
),
grid AS (
  SELECT c.cur, months.m,
         CAST(concat('0x', substr(md5(c.cur || '|' ||
              strftime(months.m, '%Y-%m-%d')), 1, 8)) AS BIGINT) AS h
  FROM (SELECT unnest(['{"','".join(_FX_CURS)}']) AS cur) c
  CROSS JOIN months
),
sparse AS (
  SELECT cur, m,
         CASE WHEN h % 3 <> 0 THEN 500000 + (h // 3) % 1500000 END AS rate_e6
  FROM grid
),
filled AS (
  SELECT cur, m,
         last_value(rate_e6 IGNORE NULLS) OVER (
           PARTITION BY cur ORDER BY m
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rate_e6
  FROM sparse
),
o AS (
  SELECT o.o_orderkey,
         (['{"','".join(_FX_CURS)}'])[(c.c_nationkey % 4) + 1] AS cur,
         date_trunc('month', o.o_orderdate)::DATE AS m,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
agg AS (
  SELECT o.cur,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CASE WHEN f.rate_e6 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unrated,
         CAST(SUM(CAST(o.cents AS HUGEINT)) AS HUGEINT) AS _slc,
         CAST(SUM(CASE WHEN f.rate_e6 IS NOT NULL
                  THEN CAST(o.cents AS HUGEINT) * f.rate_e6 END)
              AS HUGEINT) AS _sbe
  FROM o LEFT JOIN filled f ON f.cur = o.cur AND f.m = o.m
  GROUP BY o.cur
)
SELECT cur, n_orders, n_unrated,
       CAST(_slc // 1000000000000000000 AS BIGINT) AS sum_local_hi,
       CAST(_slc % 1000000000000000000 AS BIGINT) AS sum_local_lo,
       CAST(_sbe // 1000000000000000000 AS BIGINT) AS sum_base_e6_hi,
       CAST(_sbe % 1000000000000000000 AS BIGINT) AS sum_base_e6_lo
FROM agg
""",
)
def q234_currency_asof_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import md5_hash32

    months = spark.sql(
        "SELECT explode(sequence(to_date('1992-01-01'), "
        "to_date('1998-12-01'), interval 1 month)) AS m"
    )
    curs = spark.createDataFrame([(c,) for c in _FX_CURS], "cur string")
    h = md5_hash32(
        F.concat(F.col("cur"), F.lit("|"), F.col("m").cast("string"))
    )
    # bigint div, never a double round-trip (module discipline)
    _hdiv3 = F.floor(h / 3).cast("bigint")
    sparse = curs.crossJoin(months).select(
        "cur",
        "m",
        F.when(h % 3 != 0, (F.lit(500_000) + _hdiv3 % 1_500_000)).alias(
            "rate_e6"
        ),
    )
    w = (
        Window.partitionBy("cur")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = sparse.select(
        "cur", "m", F.last("rate_e6", ignorenulls=True).over(w).alias("rate_e6")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.element_at(
            F.array(*[F.lit(c) for c in _FX_CURS]),
            (F.col("c_nationkey") % 4 + 1).cast("int"),
        ).alias("cur"),
        F.trunc("o_orderdate", "month").alias("m"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    j = o.join(F.broadcast(filled), ["cur", "m"], "left")
    agg = j.groupBy("cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("rate_e6").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unrated"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("_slc"),
        F.sum(
            F.when(
                F.col("rate_e6").isNotNull(),
                F.col("cents").cast("decimal(38,0)") * F.col("rate_e6"),
            )
        )
        .cast("decimal(38,0)")
        .alias("_sbe"),
    )
    return agg.select(
        "cur",
        "n_orders",
        "n_unrated",
        *hi_lo_bigint("_slc", "sum_local"),
        *hi_lo_bigint("_sbe", "sum_base_e6"),
    )


# --------------------------------------------------------------------------
# q254 (birth q227) — Co-purchase triangle census (operators/graph.triangle_stats;
# Suri & Vassilvitskii 2011 degree orientation): parts bought in the
# same order form an edge; triangles measure co-purchase cohesion.
# Orientation bounds each node's out-degree at O(√m), so the wedge
# join emits O(m^{3/2}) worst-case instead of the Σd² a naive
# adjacency self-join hits on hub parts. Exact integers end-to-end;
# the oracle replays orientation, wedges and closures verbatim.
# Per-order edge fan is bounded (orders hold ≤ 7 lines).
# --------------------------------------------------------------------------


@register(
    "q254_copurchase_triangles",
    oracle="""
WITH e AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
         greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY x
),
ed AS (
  SELECT e.u, e.v, du.d AS du, dv.d AS dv
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
),
oriented AS (
  SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS a,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS b,
         CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS db
  FROM ed
),
wedges AS (
  SELECT o1.b AS b1, o2.b AS b2
  FROM oriented o1 JOIN oriented o2 ON o2.a = o1.a
  WHERE o1.db < o2.db OR (o1.db = o2.db AND o1.b < o2.b)
),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM wedges w JOIN oriented c ON c.a = w.b1 AND c.b = w.b2
),
tot AS (
  SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
         CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
         CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CAST(CASE WHEN n_wedges > 0
            THEN (3 * n_triangles * 1000000) // n_wedges
            ELSE 0 END AS BIGINT) AS clustering_e6
FROM tot CROSS JOIN tri
""",
)
def q254_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.graph import triangle_stats

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )
    return triangle_stats(edges)


# --------------------------------------------------------------------------
# q244 (birth q228) — Geo neighbor join via grid-cell blocking (operators/geo.
# grid_neighbor_pairs): customers get deterministic micro-degree
# coordinates; every pair within 0.2° (planar, exact integer d²) is
# found through the 3×3 cell equi-join — the spatial member of the
# blocking family (LSH: hash buckets; SNM: sort order; ER: soundex;
# here: space). No all-pairs, no window; the oracle replays cells,
# probes and the exact verify.
# --------------------------------------------------------------------------

_GEO_R = 200_000  # 0.2 degrees in micro-degrees


@register(
    "q244_geo_neighbor_join",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id,
         CAST(concat('0x', substr(md5('x|' || c_custkey), 1, 8)) AS BIGINT)
           % 360000000 AS x,
         CAST(concat('0x', substr(md5('y|' || c_custkey), 1, 8)) AS BIGINT)
           % 170000000 AS y
  FROM customer
),
base AS (
  SELECT id, x, y, x // {_GEO_R} AS cx, y // {_GEO_R} AS cy FROM pts
),
probes AS (
  SELECT b.id AS id_a, b.x AS xa, b.y AS ya,
         b.cx + dx.d AS cx, b.cy + dy.d AS cy
  FROM base b
  CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
  CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
),
cand AS (
  SELECT DISTINCT p.id_a, h.id AS id_b,
         (p.xa - h.x) * (p.xa - h.x) + (p.ya - h.y) * (p.ya - h.y) AS d2
  FROM probes p JOIN base h ON h.cx = p.cx AND h.cy = p.cy
  WHERE p.id_a < h.id
    AND (p.xa - h.x) * (p.xa - h.x) + (p.ya - h.y) * (p.ya - h.y)
        <= CAST({_GEO_R} AS BIGINT) * {_GEO_R}
),
agg AS (
  SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_points,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COALESCE(MIN(d2), 0) AS BIGINT) AS min_dist2,
         CAST(COALESCE(SUM(CAST(d2 AS HUGEINT)), 0) AS HUGEINT) AS _sd,
         CAST(COALESCE(SUM(CAST(id_a AS HUGEINT) * 1000000 + id_b), 0)
              AS HUGEINT) AS _pk
  FROM cand
)
SELECT n_points, n_pairs, min_dist2,
       CAST(_sd // 1000000000000000000 AS BIGINT) AS sum_dist2_hi,
       CAST(_sd % 1000000000000000000 AS BIGINT) AS sum_dist2_lo,
       CAST(_pk // 1000000000000000000 AS BIGINT) AS pair_key_hi,
       CAST(_pk % 1000000000000000000 AS BIGINT) AS pair_key_lo
FROM agg
""",
)
def q244_geo_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.functions import md5_hash32
    from cubicerp_client_etl_spark.operators.geo import grid_neighbor_pairs

    cust = load(spark, sf_dir, "customer").select("c_custkey")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (
            md5_hash32(F.concat(F.lit("x|"), F.col("c_custkey").cast("string")))
            % 360_000_000
        ).alias("x"),
        (
            md5_hash32(F.concat(F.lit("y|"), F.col("c_custkey").cast("string")))
            % 170_000_000
        ).alias("y"),
    )
    pairs = grid_neighbor_pairs(pts, "id", "x", "y", max_dist=_GEO_R)
    n_points = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
    return (
        pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.min("dist2"), F.lit(0)).cast("bigint").alias("min_dist2"),
            F.coalesce(F.sum(F.col("dist2").cast("decimal(38,0)")), F.lit(0))
            .cast("decimal(38,0)")
            .alias("_sd"),
            F.coalesce(
                F.sum(
                    F.col("id_a").cast("decimal(38,0)") * 1_000_000
                    + F.col("id_b")
                ),
                F.lit(0),
            )
            .cast("decimal(38,0)")
            .alias("_pk"),
        )
        .join(F.broadcast(n_points))
        .select(
            "n_points",
            "n_pairs",
            "min_dist2",
            *hi_lo_bigint("_sd", "sum_dist2"),
            *hi_lo_bigint("_pk", "pair_key"),
        )
    )


# --------------------------------------------------------------------------
# q105 (birth q229) — Empirical-CDF feature transform (operators/quantiles.
# cdf_transform): quantile-normalize lineitem quantities and roll the
# transformed values up per return flag — the rank-based scaling step
# (sklearn QuantileTransformer's exact form) built on the value-count
# table + two-phase prefix scan + one join back, never a window over
# raw rows. Exact e6 integers; the oracle replays the CDF and rollup.
# --------------------------------------------------------------------------


@register(
    "q105_cdf_transform",
    oracle="""
WITH v AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem
),
c AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY q),
cum AS (SELECT q, SUM(c) OVER (ORDER BY q) AS cum FROM c),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
cdf AS (SELECT q, CAST((cum * 1000000) // n AS BIGINT) AS cdf_e6
        FROM cum CROSS JOIN tot)
SELECT v.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(cdf.cdf_e6) AS BIGINT) AS min_cdf_e6,
       CAST(MAX(cdf.cdf_e6) AS BIGINT) AS max_cdf_e6,
       CAST(SUM(cdf.cdf_e6) // COUNT(*) AS BIGINT) AS mean_cdf_e6
FROM v JOIN cdf ON cdf.q = v.q
GROUP BY v.l_returnflag
""",
)
def q105_cdf_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quantiles import cdf_transform

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    t = cdf_transform(li, "q")
    return t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("cdf_e6").cast("bigint").alias("min_cdf_e6"),
        F.max("cdf_e6").cast("bigint").alias("max_cdf_e6"),
        F.expr("CAST(sum(cdf_e6) div count(1) AS BIGINT)").alias("mean_cdf_e6"),
    )


# --------------------------------------------------------------------------
# q093 (birth q230) — Benford first-digit audit (operators/quality.benford_audit):
# the fraud / fabricated-data screen on order totals — naturally
# multiplicative amounts lead with digit d at log10(1+1/d);
# expectations are PINNED e6 integer literals so the audit is
# float-free and the oracle replays every share and deviation.
# Map-only + one 9-group aggregate.
# --------------------------------------------------------------------------


@register(
    "q093_benford_audit",
    oracle="""
WITH v AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
  FROM orders
  WHERE o_totalprice > 0
),
c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY d),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM v),
exp AS (
  SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
                        (4, 96910), (5, 79181), (6, 66946),
                        (7, 57991), (8, 51152), (9, 45757)) e(d, expected_e6)
)
SELECT exp.d AS digit,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       CAST((COALESCE(c.n, 0) * 1000000) // tot.t AS BIGINT) AS observed_e6,
       CAST(exp.expected_e6 AS BIGINT) AS expected_e6,
       CAST(abs((COALESCE(c.n, 0) * 1000000) // tot.t - exp.expected_e6)
            AS BIGINT) AS abs_dev_e6
FROM exp LEFT JOIN c ON c.d = exp.d CROSS JOIN tot
""",
)
def q093_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import benford_audit

    orders = load(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    return benford_audit(orders, "cents")


# --------------------------------------------------------------------------
# q291 (birth q231) — Time-weighted average value per user (D-family extension):
# each event's value holds until the user's NEXT event, so the honest
# per-user mean weights by holding time (TWAP — the metering/billing
# aggregation), not by event count. lead() over the (high-cardinality)
# user partition gives exact integer micro-second holding intervals;
# the last event of a user has no successor and is excluded from the
# weighted mean by construction (reported via n_open). Exact integer
# value-cents × micros products in decimal(38,0); the final division
# is integer `div` (floor), matching the oracle's `//` bit-for-bit on
# the non-negative domain — plain `/` would round HALF_UP to 6 dp
# before the cast and diverge near integer boundaries (ADVICE r8).
# --------------------------------------------------------------------------


@register(
    "q291_time_weighted_average",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS t_next
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN t_next IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open,
       CAST(COALESCE(SUM(CASE WHEN t_next IS NOT NULL
                          THEN t_next - t END), 0) AS BIGINT) AS held_us,
       CAST(CASE WHEN SUM(CASE WHEN t_next IS NOT NULL THEN t_next - t END) > 0
            THEN SUM(CASE WHEN t_next IS NOT NULL
                     THEN CAST(cents AS HUGEINT) * (t_next - t) END)
                 // SUM(CASE WHEN t_next IS NOT NULL THEN t_next - t END)
            ELSE 0 END AS BIGINT) AS twap_cents
FROM e GROUP BY user_id
""",
)
def q291_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    e = ev.withColumn("t_next", F.lead("t").over(w))
    held = F.when(F.col("t_next").isNotNull(), F.col("t_next") - F.col("t"))
    agg = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("t_next").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_open"),
        F.coalesce(F.sum(held), F.lit(0)).cast("bigint").alias("held_us"),
        F.sum(
            F.when(
                F.col("t_next").isNotNull(),
                F.col("cents").cast("decimal(38,0)")
                * (F.col("t_next") - F.col("t")),
            )
        )
        .cast("decimal(38,0)")
        .alias("_wsum"),
    )
    # integer `div` on the decimal weighted sum — the repo's exact-
    # integer discipline. Plain `/` would round HALF_UP to 6 dp before
    # the bigint cast, diverging from the oracle's floor `//` whenever
    # the true quotient sits within 5e-7 below an integer (ADVICE r8).
    return agg.select(
        "user_id",
        "n_events",
        "n_open",
        "held_us",
        F.when(
            F.col("held_us") > 0,
            F.expr("CAST(_wsum div held_us AS BIGINT)"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("twap_cents"),
    )
