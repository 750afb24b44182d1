"""Mixture-assembly, retention, and sketch/ANN query wave (q141–q153):
the corpus-construction and retrieval stages that run AFTER
filtering/dedup in an LLM data pipeline — exact token-budget
selection, curriculum interleaving, exact global/grouped quantile
thresholds, incremental cross-snapshot dedup, duplicate-cluster
retention (including the full setsim→components→survivor chain), the
binned big×big interval join, portable-hash count-min and
linear-counting sketches, multi-probe IVF, product-quantization ADC
search, and weighted priority sampling.

All are exactly replayable in DuckDB: ordering/splitting/hashing uses
the keyed-md5 determinism of ``operators/sampling.py``, quantiles use
the IEEE ``cum/n >= q`` rank rule both engines share, similarity
scores round to 6 dp with id tie-breaks, and ADC distances become
integer micro-units before any aggregate. These sit past the
q001–q050 driver window; the sweep (tools/oracle_sweep.py)
value-checks them at BOTH SFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.operators.budget import (
    interleave_round_robin,
    token_budget_select,
)
from cubicerp_client_etl_spark.operators.quantiles import exact_quantiles
from cubicerp_client_etl_spark.operators.retention import (
    bag_of_words_key,
    incremental_dedup,
    keep_best_per_cluster,
)
from cubicerp_client_etl_spark.queries import register

_BUDGETS = {"src0": 5000, "src1": 3000, "src7": 2500}


# --------------------------------------------------------------------------
# q017 (birth q141) — exact token-budget mixture (operators/budget.py). Three domains
# get explicit character budgets, everything else budget 0; each domain
# contributes the prefix of its md5-shuffled order that fits. Runs on
# the keyed two-phase scan (prefix_sum_by) — no raw-row window keyed on
# the low-cardinality source. Oracle: the plain keyed window sum + CASE
# budget (bit-identical: bigint addition is associative, order total).
# --------------------------------------------------------------------------
@register(
    "q017_token_budget_mixture",
    headline=True,  # VERDICT r5 #8: track the mixture path's wall clock
    oracle="""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         CAST(SUM(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|mix1'), doc_id
         ) AS BIGINT) AS cum_tokens
  FROM documents
)
SELECT source, doc_id, cum_tokens
FROM ranked
WHERE cum_tokens <= CASE source
                      WHEN 'src0' THEN 5000
                      WHEN 'src1' THEN 3000
                      WHEN 'src7' THEN 2500
                      ELSE 0 END
""",
)
def q017_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = token_budget_select(
        docs,
        domain_col="source",
        token_col="n_chars",
        id_col="doc_id",
        budget=_BUDGETS,
        seed="mix1",
    )
    return out.select("source", "doc_id", F.col("cum_tokens").cast("bigint"))


# --------------------------------------------------------------------------
# q142 — deterministic round-robin curriculum interleave
# (operators/budget.py): every document gets a unique global position
# r*n_domains + domain_index under the md5-shuffled per-domain order.
# Rank = prefix count of ones on the keyed two-phase scan + a broadcast
# join against the 20-row domain dim. NULL is a valid domain on both
# engines (null-safe join, NULLS FIRST domain index).
# --------------------------------------------------------------------------
@register(
    "q142_interleave_round_robin",
    headline=True,  # VERDICT r5 #8: track the mixture path's wall clock
    oracle="""
WITH d AS (
  SELECT source, ROW_NUMBER() OVER (ORDER BY source NULLS FIRST) - 1 AS didx
  FROM (SELECT DISTINCT source FROM documents)
),
nd AS (SELECT COUNT(*) AS n FROM d),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|curr1'), doc_id
         ) - 1 AS rn
  FROM documents
)
SELECT r.doc_id, r.source, CAST(r.rn * nd.n + d.didx AS BIGINT) AS global_pos
FROM r JOIN d ON r.source IS NOT DISTINCT FROM d.source CROSS JOIN nd
""",
)
def q142_interleave_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = interleave_round_robin(
        docs, domain_col="source", id_col="doc_id", seed="curr1"
    )
    return out.select("doc_id", "source", "global_pos")


# --------------------------------------------------------------------------
# q230 (birth q143) — exact distributed quantiles (operators/quantiles.py): discrete
# quantiles of l_quantity via value-count table + two-phase prefix scan;
# no single-partition sort, no sketch. Oracle: DuckDB quantile_disc at
# the same q values (independent implementation of the same semantics —
# including the IEEE cum/n >= q rank edge at q=0.07).
# --------------------------------------------------------------------------
_QS = [0.0, 0.07, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]

@register(
    "q230_exact_quantiles",
    headline=True,
    oracle="""
SELECT CAST(0.0  AS DOUBLE) AS q, quantile_disc(l_quantity, 0.0 ) AS qvalue FROM lineitem
UNION ALL
SELECT CAST(0.07 AS DOUBLE), quantile_disc(l_quantity, 0.07) FROM lineitem
UNION ALL
SELECT CAST(0.25 AS DOUBLE), quantile_disc(l_quantity, 0.25) FROM lineitem
UNION ALL
SELECT CAST(0.5  AS DOUBLE), quantile_disc(l_quantity, 0.5 ) FROM lineitem
UNION ALL
SELECT CAST(0.75 AS DOUBLE), quantile_disc(l_quantity, 0.75) FROM lineitem
UNION ALL
SELECT CAST(0.9  AS DOUBLE), quantile_disc(l_quantity, 0.9 ) FROM lineitem
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_disc(l_quantity, 0.99) FROM lineitem
UNION ALL
SELECT CAST(1.0  AS DOUBLE), quantile_disc(l_quantity, 1.0 ) FROM lineitem
""",
)
def q230_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return exact_quantiles(li, "l_quantity", _QS, q_col="q", out_col="qvalue")


# --------------------------------------------------------------------------
# q210 (birth q144) — incremental dedup across corpus snapshots
# (operators/retention.py): a keyed-md5 split plays "already ingested"
# (h < '8', ~50%) vs "new batch"; the new batch is collapsed to one doc
# per bag-of-words key and anti-joined against the seen-key set. Keys
# only cross the join — history documents never re-materialize.
# --------------------------------------------------------------------------
@register(
    "q210_incremental_dedup",
    oracle="""
WITH k AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS bow_key,
         md5(CAST(doc_id AS VARCHAR) || '|snap1') AS h
  FROM documents
),
old AS (SELECT DISTINCT bow_key FROM k WHERE h < '8'),
newb AS (SELECT doc_id, bow_key FROM k WHERE h >= '8'),
firsts AS (
  SELECT doc_id, bow_key FROM (
    SELECT doc_id, bow_key,
           ROW_NUMBER() OVER (PARTITION BY bow_key ORDER BY doc_id) AS rn
    FROM newb
  ) WHERE rn = 1
)
SELECT f.doc_id, f.bow_key
FROM firsts f
WHERE f.bow_key NOT IN (SELECT bow_key FROM old)
""",
)
def q210_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        bag_of_words_key("text").alias("bow_key"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|snap1"))).alias("_h"),
    )
    seen = keyed.where(F.col("_h") < "8").select("bow_key")
    batch = keyed.where(F.col("_h") >= "8").select("doc_id", "bow_key")
    # order_by pins the intra-batch survivor to the LOWEST doc_id — the
    # operator's default (the key column) is a total tie within a key
    # partition, which would pick a shuffle-order-dependent survivor
    # and intermittently diverge from the oracle's ORDER BY doc_id
    return incremental_dedup(
        batch, seen, key_col="bow_key", order_by=[F.col("doc_id")]
    ).select("doc_id", "bow_key")


# --------------------------------------------------------------------------
# q145 — duplicate-cluster retention policy (operators/retention.py):
# cluster documents by bag-of-words fingerprint, keep the longest doc
# per cluster (ties → lowest doc_id). The "which copy survives" half of
# dedup. One window shuffle on the cluster key.
# --------------------------------------------------------------------------
@register(
    "q145_keep_best_per_cluster",
    oracle="""
SELECT doc_id, bow_key, n_chars
FROM (
  SELECT doc_id, n_chars,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS bow_key,
         ROW_NUMBER() OVER (
           PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           ORDER BY n_chars DESC, doc_id
         ) AS rn
  FROM documents
) WHERE rn = 1
""",
)
def q145_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", "n_chars", bag_of_words_key("text").alias("bow_key")
    )
    best = keep_best_per_cluster(
        keyed, "bow_key", score=F.col("n_chars"), tie_breaker=F.col("doc_id")
    )
    return best.select("doc_id", "bow_key", "n_chars")


# --------------------------------------------------------------------------
# q231 (birth q146) — big×big interval-overlap join via bin quantization
# (operators/interval.py): concurrent 30-minute activity windows per
# user, counted per user. The bin equi-join keeps the plan
# hash-shuffle-shaped (no BroadcastNestedLoopJoin between two
# data-sized sides, no cartesian, no distinct — first-shared-bin
# emission dedups by construction). Oracle: the plain theta self-join.
# --------------------------------------------------------------------------
_IV_W = 1800  # seconds; == the interval length, so each side explodes ≤2 bins


@register(
    "q231_interval_overlap_join",
    headline=True,
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 AS s,
         epoch_us(ts) // 1000000 + {_IV_W} AS e
  FROM events
)
SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
FROM iv a JOIN iv b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND a.s <= b.e AND b.s <= a.e
GROUP BY a.user_id
""",
)
def q231_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.interval import binned_interval_join

    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") / F.lit(1000000)).cast("bigint").alias("s"),
    ).withColumn("e", F.col("s") + _IV_W)
    a = iv.select("user_id", F.col("event_id").alias("a_id"),
                  F.col("s").alias("a_s"), F.col("e").alias("a_e"))
    b = iv.select("user_id", F.col("event_id").alias("b_id"),
                  F.col("s").alias("b_s"), F.col("e").alias("b_e"))
    pairs = binned_interval_join(
        a, b, keys=["user_id"],
        l_start="a_s", l_end="a_e", r_start="b_s", r_end="b_e",
        bin_width=_IV_W,
    ).where(F.col("a_id") < F.col("b_id"))
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


# --------------------------------------------------------------------------
# q161 (birth q147) — count-min sketch frequency estimates (operators/sketches.py):
# a 4×64 sketch over all document tokens, probed for a fixed token set
# alongside the exact counts. The md5 hash family makes the sketch
# deterministic and engine-portable, so the oracle replays every bucket
# and estimate exactly (est >= true always; width 64 keeps collisions
# visible in the output). Sketch build = one bounded shuffle; probes
# and sketch broadcast.
# --------------------------------------------------------------------------
_CMS_PROBES = ["the", "key", "value", "spark", "table", "row", "hash", "zzzz"]


@register(
    "q161_count_min_sketch",
    oracle="""
WITH flat AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
rws AS (SELECT * FROM (VALUES (0), (1), (2), (3)) r(rw)),
cms AS (
  SELECT rw,
         CAST(concat('0x', substr(md5(token || '|cms1|' || rw), 1, 8)) AS BIGINT) % 64
           AS bucket,
         COUNT(*) AS c
  FROM flat, rws GROUP BY 1, 2
),
probes AS (
  SELECT * FROM (VALUES ('the'), ('key'), ('value'), ('spark'),
                        ('table'), ('row'), ('hash'), ('zzzz')) p(token)
),
est AS (
  SELECT p.token,
         MIN(COALESCE(c.c, 0)) AS est_count
  FROM probes p CROSS JOIN rws r
  LEFT JOIN cms c
    ON c.rw = r.rw
   AND c.bucket = CAST(concat('0x', substr(md5(p.token || '|cms1|' || r.rw), 1, 8)) AS BIGINT) % 64
  GROUP BY p.token
),
truth AS (SELECT token, COUNT(*) AS n FROM flat GROUP BY token)
SELECT e.token AS token,
       CAST(e.est_count AS BIGINT) AS est_count,
       CAST(COALESCE(t.n, 0) AS BIGINT) AS true_count
FROM est e LEFT JOIN truth t USING (token)
""",
)
def q161_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sketches import cms_build, cms_estimate

    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    cms = cms_build(tokens, depth=4, width=64, seed="1")
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], "token string")
    est = cms_estimate(cms, probes, depth=4, width=64, seed="1")
    # exact counts for the PROBES only — the literal filter pushes into
    # the scan; never aggregate (or broadcast) the full vocabulary here
    truth = (
        tokens.where(F.col("token").isin(_CMS_PROBES))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return est.join(F.broadcast(truth), on="token", how="left").select(
        "token",
        "est_count",
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("true_count"),
    )


# --------------------------------------------------------------------------
# q148 — per-group exact quantiles (operators/quantiles.py): document
# length p10/median/p90 per source — the per-domain threshold table a
# curation pass derives before filtering. Group-keyed windows over the
# bounded (source, n_chars) count table; no global stage. Oracle:
# grouped quantile_disc at each q.
# --------------------------------------------------------------------------
@register(
    "q148_grouped_quantiles",
    oracle="""
SELECT source, CAST(0.1 AS DOUBLE) AS q, quantile_disc(n_chars, 0.1) AS qvalue
FROM documents GROUP BY source
UNION ALL
SELECT source, CAST(0.5 AS DOUBLE), quantile_disc(n_chars, 0.5)
FROM documents GROUP BY source
UNION ALL
SELECT source, CAST(0.9 AS DOUBLE), quantile_disc(n_chars, 0.9)
FROM documents GROUP BY source
""",
)
def q148_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quantiles import exact_quantiles_by

    docs = load(spark, sf_dir, "documents")
    return exact_quantiles_by(
        docs, "source", "n_chars", [0.1, 0.5, 0.9], q_col="q", out_col="qvalue"
    )


# --------------------------------------------------------------------------
# q217 (birth q149) — end-to-end fuzzy-dedup retention pipeline: exact Jaccard
# set-similarity join (PPJoin prefix filter, J >= 1/2 on 3-gram
# shingles) → connected components (min-label propagation) → one
# survivor per near-dup cluster (longest doc, tie → lowest id). The
# full "find near-dups, pick who lives" chain a pretraining corpus
# runs, all equi-join/window shaped. Oracle: brute-force shingle pairs
# + recursive-CTE reachability + the same argmax window.
# --------------------------------------------------------------------------
@register(
    "q217_fuzzy_dedup_retention",
    oracle="""
WITH RECURSIVE t AS (
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
         COUNT(*) AS inter,
         ANY_VALUE(a.sz) AS sza, ANY_VALUE(b.sz) AS szb
  FROM f a JOIN f b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE 3 * inter >= sza + szb
  UNION ALL
  SELECT id_b, id_a FROM pairs WHERE 3 * inter >= sza + szb
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT edges.dst, reach.label FROM reach JOIN edges ON edges.src = reach.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
sized AS (SELECT component AS c2, COUNT(*) AS cluster_size FROM comp GROUP BY component),
ranked AS (
  SELECT comp.node AS doc_id, comp.component, sized.cluster_size,
         ROW_NUMBER() OVER (
           PARTITION BY comp.component
           ORDER BY d.n_chars DESC, comp.node
         ) AS rn
  FROM comp
  JOIN sized ON comp.component = sized.c2
  JOIN documents d ON d.doc_id = comp.node
)
SELECT doc_id, CAST(component AS BIGINT) AS component,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       rn = 1 AS is_survivor
FROM ranked
""",
)
def q217_fuzzy_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cubicerp_client_etl_spark.operators.dedup import setsim_join
    from cubicerp_client_etl_spark.operators.graph import connected_components

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    pairs = setsim_join(
        docs.select("doc_id", "text"), shingle_n=3, threshold=(1, 2)
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(
        docs.select("doc_id"), edges, node_col="doc_id"
    )
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    joined = comp.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).join(F.broadcast(sizes), "component")
    w = W.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    return joined.withColumn("_rn", F.row_number().over(w)).select(
        F.col("node").alias("doc_id"),
        F.col("component").cast("bigint"),
        F.col("cluster_size").cast("bigint"),
        (F.col("_rn") == 1).alias("is_survivor"),
    )


# --------------------------------------------------------------------------
# q150 — multi-probe IVF ANN (operators/similarity.ivf_topk, nprobe=2):
# each probe searches its TWO nearest inverted-file clusters — the
# standard recall knob over q036's nprobe=1, recovering neighbors that
# fell across a Voronoi boundary while still pruning the corpus scan.
# Centroids broadcast; candidates equi-join on cluster id; no dedup
# needed (each corpus vector lives in exactly one cluster).
# --------------------------------------------------------------------------
@register(
    "q035_ivf_multiprobe",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
scored_assign AS (
  SELECT e.vec_id, e.v, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ROUND(list_dot_product(e.v, c.cv) /
                    sqrt(list_dot_product(e.v, e.v) * list_dot_product(c.cv, c.cv)), 6) DESC,
                    c.cid) AS crn
  FROM e CROSS JOIN c
),
assigned AS (SELECT vec_id, v, cid FROM scored_assign WHERE crn = 1),
probe_cids AS (
  SELECT vec_id AS probe_id, v AS pv, cid
  FROM scored_assign WHERE vec_id IN (10, 20, 30) AND crn <= 2
),
cand AS (
  SELECT p.probe_id, a.vec_id,
         ROUND(list_dot_product(a.v, p.pv) /
               sqrt(list_dot_product(a.v, a.v) * list_dot_product(p.pv, p.pv)), 6) AS sim
  FROM probe_cids p JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS rank
  FROM cand)
WHERE rank <= 5
""",
)
def q035_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double("embedding").alias("v")
    )
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    probes = emb.filter(F.col("vec_id").isin(10, 20, 30)).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    return sim.ivf_topk(emb, cents, probes, k=5, nprobe=2)


# --------------------------------------------------------------------------
# q298 (birth q151) — product-quantization ADC search (operators/similarity.py):
# 64-dim vectors → 8 subspaces × 8 deterministic codewords; search
# runs entirely over the code table + a per-probe broadcast lookup
# table, with distances scaled to exact 1e6 integers before the sum so
# the aggregate is order-independent (the float-summation trap ADC
# implementations usually carry). The raw vectors never rescan at
# search time — the PQ memory story at scale. Oracle replays encode,
# LUT, and ADC exactly.
# --------------------------------------------------------------------------
@register(
    "q298_pq_adc_topk",
    oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (SELECT unnest(generate_series(0, 7)) AS sub_idx),
cb AS (
  SELECT s.sub_idx, e.vec_id AS code,
         list_slice(e.v, s.sub_idx * 8 + 1, s.sub_idx * 8 + 8) AS cv
  FROM e CROSS JOIN subs s WHERE e.vec_id < 8
),
esub AS (
  SELECT e.vec_id, s.sub_idx,
         list_slice(e.v, s.sub_idx * 8 + 1, s.sub_idx * 8 + 8) AS sv
  FROM e CROSS JOIN subs s
),
scored AS (
  SELECT es.vec_id, es.sub_idx, cb.code,
         ROUND(list_dot_product(es.sv, es.sv)
               - 2 * list_dot_product(es.sv, cb.cv)
               + list_dot_product(cb.cv, cb.cv), 6) AS d
  FROM esub es JOIN cb ON cb.sub_idx = es.sub_idx
),
codes AS (
  SELECT vec_id, sub_idx, code FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id, sub_idx ORDER BY d, code) AS rn
    FROM scored
  ) WHERE rn = 1
),
probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id IN (10, 20, 30)),
psub AS (
  SELECT p.probe_id, s.sub_idx,
         list_slice(p.pv, s.sub_idx * 8 + 1, s.sub_idx * 8 + 8) AS psv
  FROM probes p CROSS JOIN subs s
),
lut AS (
  SELECT ps.probe_id, ps.sub_idx, cb.code,
         CAST(ROUND((list_dot_product(ps.psv, ps.psv)
                     - 2 * list_dot_product(ps.psv, cb.cv)
                     + list_dot_product(cb.cv, cb.cv)) * 1000000, 0) AS BIGINT)
           AS d_e6
  FROM psub ps JOIN cb ON cb.sub_idx = ps.sub_idx
),
est AS (
  SELECT l.probe_id, c.vec_id, CAST(SUM(l.d_e6) AS BIGINT) AS est_dist_e6
  FROM codes c JOIN lut l ON l.sub_idx = c.sub_idx AND l.code = c.code
  WHERE c.vec_id <> l.probe_id
  GROUP BY l.probe_id, c.vec_id
)
SELECT probe_id, vec_id, est_dist_e6, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY probe_id ORDER BY est_dist_e6, vec_id) AS rank
  FROM est)
WHERE rank <= 5
""",
)
def q298_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double("embedding").alias("v")
    )
    cb = sim.pq_codebook(emb, n_codes=8, m_sub=8, sub_dim=8)
    codes = sim.pq_encode(emb, cb, m_sub=8, sub_dim=8)
    probes = emb.filter(F.col("vec_id").isin(10, 20, 30)).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    return sim.pq_adc_topk(codes, cb, probes, k=5, m_sub=8, sub_dim=8)


# --------------------------------------------------------------------------
# q152 — linear-counting distinct sketch (operators/sketches.py):
# occupied-bucket count over the document token vocabulary at m=1024,
# next to the exact distinct — the oracle-checkable core of cardinality
# sketching (the float estimate -m·ln(1-V) derives from `occupied`;
# the opaque-register HLL variant is q077, rows-only by necessity).
# Bounded distinct (≤ m values) + one exact distinct for reference.
# --------------------------------------------------------------------------
@register(
    "q152_occupancy_sketch",
    oracle="""
WITH flat AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
occ AS (
  SELECT COUNT(DISTINCT
           CAST(concat('0x', substr(md5(token || '|occ1'), 1, 8)) AS BIGINT) % 1024
         ) AS occupied
  FROM flat
),
ex AS (SELECT COUNT(DISTINCT token) AS exact_distinct FROM flat)
SELECT CAST(occ.occupied AS BIGINT) AS occupied,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
FROM occ, ex
""",
)
def q152_occupancy_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sketches import occupancy_sketch

    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    occ = occupancy_sketch(tokens, m=1024, seed="1")
    exact = tokens.agg(
        F.countDistinct("token").cast("bigint").alias("exact_distinct")
    )
    return occ.crossJoin(F.broadcast(exact))


# --------------------------------------------------------------------------
# q096 (birth q153) — weighted priority sampling (operators/sampling.py): keep the 5
# documents per source with the smallest (hash32·1e6 div n_chars)
# priority — deterministic importance sampling that prefers longer
# (higher-weight) documents, with exact-integer priorities any engine
# replays (the portable stand-in for Efraimidis–Spirakis u^(1/w)).
# One keyed window shuffle. Oracle: the same integer arithmetic.
# --------------------------------------------------------------------------
@register(
    "q096_weighted_priority_sample",
    oracle="""
SELECT source, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|wpsq153'), 1, 8)) AS BIGINT)
                     * 1000000) // n_chars,
                    doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 5
""",
)
def q096_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sampling import (
        weighted_priority_sample,
    )

    docs = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    out = weighted_priority_sample(
        docs, group_col="source", weight_col="n_chars", id_col="doc_id",
        n=5, seed="q153",
    )
    return out.select("source", "doc_id", "n_chars")


# --------------------------------------------------------------------------
# q154 — bigram-LM fluency scoring (operators/curation.py): per-doc
# sums of exact-integer corpus conditional probabilities
# (c(w1,w2)·1e6 div c(w1·)) — the curation fluency signal, integer-
# exact so the oracle replays it bit-for-bit (log-perplexity wouldn't).
# --------------------------------------------------------------------------
@register(
    "q154_bigram_fluency",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
flat AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
),
bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM flat),
c1 AS (SELECT w1, COUNT(*) AS ch FROM bg GROUP BY w1),
c12 AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
scored AS (
  SELECT bg.doc_id, (c12.cb * 1000000) // c1.ch AS p_e6
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(p_e6) AS BIGINT) AS sum_p_e6,
       CAST(MIN(p_e6) AS BIGINT) AS min_p_e6,
       CAST(SUM(p_e6) // COUNT(*) AS BIGINT) AS avg_p_e6
FROM scored GROUP BY doc_id
""",
)
def q154_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.curation import bigram_fluency_score

    docs = load(spark, sf_dir, "documents")
    return bigram_fluency_score(docs)


# --------------------------------------------------------------------------
# q155 — dedup observability report: per-source duplication profile
# (docs, distinct exact hashes, distinct bag-of-words keys, exact- and
# near-dup fractions as e6 integers) — the monitoring table a pipeline
# operator watches to catch a crawler regression before it poisons a
# training run. Two keyed aggregations, everything integer-exact.
# --------------------------------------------------------------------------
@register(
    "q155_dedup_observability",
    oracle="""
WITH k AS (
  SELECT source, doc_id, md5(text) AS eh,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
           AS bk
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT eh) AS BIGINT) AS n_exact_keys,
       CAST(COUNT(DISTINCT bk) AS BIGINT) AS n_bow_keys,
       CAST(1000000 * (COUNT(*) - COUNT(DISTINCT eh)) // COUNT(*) AS BIGINT)
         AS exact_dup_frac_e6,
       CAST(1000000 * (COUNT(*) - COUNT(DISTINCT bk)) // COUNT(*) AS BIGINT)
         AS bow_dup_frac_e6
FROM k GROUP BY source
""",
)
def q155_dedup_observability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    k = docs.select(
        "source",
        F.md5("text").alias("eh"),
        bag_of_words_key("text").alias("bk"),
    )
    return k.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("eh").cast("bigint").alias("n_exact_keys"),
        F.countDistinct("bk").cast("bigint").alias("n_bow_keys"),
        F.expr("1000000 * (count(1) - count(DISTINCT eh)) div count(1)")
        .cast("bigint")
        .alias("exact_dup_frac_e6"),
        F.expr("1000000 * (count(1) - count(DISTINCT bk)) div count(1)")
        .cast("bigint")
        .alias("bow_dup_frac_e6"),
    )
