"""Warehouse-history and reproducible-split queries (sixth wave):
SCD Type-2, CDC snapshot diff, deterministic train/test split.

These exercise ``operators/history.py`` — the history-preserving load
shapes the reference's upsert modes (cubicerpetl/cubicerpetl.py:494-537)
don't keep, plus the md5-based split every reproducible training-data
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import dec2, dsum
from cubicerp_client_etl_spark.operators.history import (
    hash_split,
    scd2_intervals,
    snapshot_diff,
)
from cubicerp_client_etl_spark.queries import register


# --------------------------------------------------------------------------
# q106 — SCD Type-2 build (I-family extension): purchase events as a
# per-user attribute change log → validity intervals. One window pass
# partitioned by user_id; (ts, event_id) is a deterministic total order.
# Timestamps surface as epoch-micros (the engine-portable rendering).
# Scale: single shuffle on user_id; no global sort, no self-join —
# the lead() frame is per-key within the shuffled partition.
# --------------------------------------------------------------------------
@register(
    "q106_scd2_intervals",
    oracle="""
SELECT user_id,
       value AS attr_value,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       ROW_NUMBER() OVER w AS version,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q106_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    scd = scd2_intervals(
        ev, key="user_id", order_by=["ts", "event_id"], attrs=["value"]
    )
    return scd.select(
        "user_id",
        F.col("value").alias("attr_value"),
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "version",
        "is_current",
    )


# --------------------------------------------------------------------------
# q107 — CDC snapshot diff (C-family extension): per-order revenue
# snapshots as of two ship-date cutoffs, every order classified
# inserted / changed / unchanged (deleted can't occur in an append-only
# log — asserting its absence is part of the check). The diff is one
# full-outer join on orderkey. Revenue compares in exact decimal-summed
# doubles, so 'unchanged' is bit-identity, not tolerance.
# Scale: two aggregations + one join, all shuffling on o_orderkey —
# with both snapshots derived from the same scan, AQE reuses the
# exchange; at 100 TB this is the standard two-bucketed-tables diff.
# --------------------------------------------------------------------------
@register(
    "q107_cdc_snapshot_diff",
    oracle="""
WITH snap_old AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_orderkey
),
snap_new AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
  GROUP BY l_orderkey
)
SELECT COALESCE(o.l_orderkey, n.l_orderkey) AS l_orderkey,
       CASE WHEN o.l_orderkey IS NULL THEN 'inserted'
            WHEN n.l_orderkey IS NULL THEN 'deleted'
            WHEN o.revenue = n.revenue THEN 'unchanged'
            ELSE 'changed' END AS change,
       o.revenue AS old_revenue,
       n.revenue AS new_revenue
FROM snap_old o
FULL OUTER JOIN snap_new n ON o.l_orderkey = n.l_orderkey
""",
)
def q107_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    def snap(cutoff: str) -> DataFrame:
        return (
            li.filter(F.col("l_shipdate") < cutoff)
            .groupBy("l_orderkey")
            .agg(dsum("l_extendedprice").alias("revenue"))
        )

    diff = snapshot_diff(
        snap("1998-01-01"), snap("1999-01-01"), key="l_orderkey", compare=["revenue"]
    )
    return diff.select(
        "l_orderkey",
        "change",
        F.col("old_revenue").alias("old_revenue"),
        F.col("new_revenue").alias("new_revenue"),
    )


# --------------------------------------------------------------------------
# q108 — deterministic train/test split with stratification proof
# (L-family): md5-hash assignment per customer (engine-portable,
# partition-independent), counted per (split, mktsegment) to show the
# split is unbiased within every stratum. Never rand()/hash() — those
# are engine- or seed-dependent; md5 of the key's string rendering is
# bit-identical in Spark and DuckDB.
# Scale: the split is a per-row map (no shuffle); only the count
# aggregates — at 100 TB the assignment stays a pushed-down projection.
# --------------------------------------------------------------------------
@register(
    "q108_hash_split_stratified",
    oracle="""
SELECT CASE WHEN substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '3'
            THEN 'test' ELSE 'train' END AS split,
       c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer
GROUP BY split, c_mktsegment
""",
)
def q108_hash_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.select(hash_split("c_custkey"), "c_mktsegment", "c_acctbal")
        .groupBy("split", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# q272 (birth q049) — data-quality constraint report (D2 extension): row rules in one
# conditional-sum pass, uniqueness via group-count, referential
# integrity via broadcast anti-join — the declarative, one-shuffle-each
# form of the reference's per-row check/amount reconciliation
# (cubicerpetl/cubicerpetl.py:775-787).
# --------------------------------------------------------------------------
@register(
    "q272_quality_report",
    oracle="""
SELECT 'nonpositive_quantity' AS rule,
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS n_violations
UNION ALL
SELECT 'discount_out_of_range',
       (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.5)
UNION ALL
SELECT 'null_orderkey', (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
UNION ALL
SELECT 'ship_before_1995',
       (SELECT COUNT(*) FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-01-01')
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)',
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
          SELECT COUNT(*) AS n FROM lineitem
          GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
UNION ALL
SELECT 'fk(l_orderkey->o_orderkey)',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
""",
)
def q272_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.quality import (
        combine_reports,
        fk_report,
        row_rule_report,
        uniqueness_report,
    )

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    rows = row_rule_report(
        li,
        {
            "nonpositive_quantity": F.col("l_quantity") <= 0,
            "discount_out_of_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.5),
            "null_orderkey": F.col("l_orderkey").isNull(),
            "ship_before_1995": F.col("l_shipdate") < "1995-01-01",
        },
    )
    uniq = uniqueness_report(li, ["l_orderkey", "l_linenumber"])
    fk = fk_report(li, "l_orderkey", o, "o_orderkey")
    return combine_reports(rows, uniq, fk)


# --------------------------------------------------------------------------
# q109 — exact discrete percentiles per group (E-family extension): the
# p-th value selected explicitly via row_number == ceil(p*n), the same
# algorithm spelled out in both engines — engine-native quantile
# functions differ in interpolation/tie rules across engines, so a
# portable percentile must pin the algorithm, not the function name.
# Scale: one shuffle on the group key; the per-group sort is the
# window's partition-local sort, no global ordering.
# --------------------------------------------------------------------------
@register(
    "q109_exact_percentiles",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rk,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_mktsegment,
       MAX(CASE WHEN rk = CAST(ceil(0.25 * n) AS BIGINT) THEN c_acctbal END) AS p25,
       MAX(CASE WHEN rk = CAST(ceil(0.50 * n) AS BIGINT) THEN c_acctbal END) AS p50,
       MAX(CASE WHEN rk = CAST(ceil(0.75 * n) AS BIGINT) THEN c_acctbal END) AS p75,
       MAX(CASE WHEN rk = CAST(ceil(0.90 * n) AS BIGINT) THEN c_acctbal END) AS p90
FROM ranked GROUP BY c_mktsegment
""",
)
def q109_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment")
    ranked = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w.orderBy("c_acctbal", "c_custkey")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )

    def pick(p: float, name: str):
        hit = F.col("rk") == F.ceil(F.lit(p) * F.col("n")).cast("long")
        return F.max(F.when(hit, F.col("c_acctbal"))).alias(name)

    return ranked.groupBy("c_mktsegment").agg(
        pick(0.25, "p25"), pick(0.50, "p50"), pick(0.75, "p75"), pick(0.90, "p90")
    )


# --------------------------------------------------------------------------
# q110 — incremental aggregate maintenance (D-family extension): the
# monthly revenue rollup is maintained by merging the standing
# aggregate with the new slice's partial aggregate — re-aggregation of
# partials, NOT recompute. The oracle computes the same result from
# scratch; equality proves the incremental path is exact, which it is
# precisely because the decimal sums are associative/order-independent.
# Scale: at 100 TB you aggregate only the arriving partition and merge
# k×groups rows — this query IS that merge, expressed over two slices.
# --------------------------------------------------------------------------
@register(
    "q110_incremental_rollup",
    oracle="""
SELECT l_returnflag, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2
""",
)
def q110_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    month = F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM")

    def partial(frame: DataFrame) -> DataFrame:
        return frame.groupBy(
            "l_returnflag", month.alias("month")
        ).agg(
            F.sum(dec2("l_extendedprice")).alias("rev_partial"),
            F.count(F.lit(1)).alias("n_partial"),
        )

    base = partial(li.filter(F.col("l_shipdate") < "1997-01-01"))
    delta = partial(
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("l_returnflag", "month")
        .agg(
            F.sum("rev_partial").cast("double").alias("revenue"),
            F.sum("n_partial").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q111 — heavy hitters (skew diagnostics, L-scale): the most frequent
# join keys with share-of-total — what you run BEFORE choosing a salted
# join. Ties broken by key so the top-k cut is deterministic. One
# aggregation shuffle; the rank window runs on the already-reduced
# (distinct keys) frame.
# --------------------------------------------------------------------------
@register(
    "q111_heavy_hitters",
    oracle="""
WITH freq AS (
  SELECT l_partkey, COUNT(*) AS n
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(n) AS total FROM freq),
ranked AS (
  SELECT l_partkey, n, ROW_NUMBER() OVER (ORDER BY n DESC, l_partkey) AS rk
  FROM freq
)
SELECT r.l_partkey, r.n, ROUND(CAST(r.n AS DOUBLE) / t.total, 6) AS share
FROM ranked r, tot t WHERE r.rk <= 20
""",
)
def q111_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    # top-k FIRST via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps, no single-partition window over every distinct key — a
    # global row_number here is a scale-killer at 100 TB key counts);
    # the rank window then runs over only the 20 surviving rows
    top = freq.orderBy(F.desc("n"), F.asc("l_partkey")).limit(20)
    ranked = top.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("n"), F.asc("l_partkey")))
    )
    total = freq.agg(F.sum("n").alias("total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )


# --------------------------------------------------------------------------
# q114 — PII redaction (L-txt extension): mask emails/URLs/phone runs
# with the engine-portable pattern set in operators/text.py. The
# fixture corpus is synthetic prose without PII, so the query splices
# deterministic PII into each document first (same splice in both
# engines), then proves the scrub via per-class counts and the md5 of
# the redacted text. Pure regexp_replace chain — JVM-side codegen, no
# UDF, scan-speed at 100 TB.
# --------------------------------------------------------------------------
@register(
    "q114_pii_redaction",
    oracle="""
WITH spiked AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com or call +1-555-000-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         ' see https://ex.org/d/' || doc_id AS t
  FROM documents
),
redacted AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^ ]+', '<URL>', 'g'),
           '[+]?[0-9][0-9()./ -]{6,}[0-9]', '<PHONE>', 'g') AS clean,
         len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS n_emails
  FROM spiked
)
SELECT doc_id, n_emails, md5(clean) AS clean_md5 FROM redacted
""",
)
def q114_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.text import (
        PII_EMAIL,
        pii_counts,
        redact_pii,
    )

    docs = load(spark, sf_dir, "documents")
    spiked = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1-555-000-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" see https://ex.org/d/"),
            F.col("doc_id").cast("string"),
        ).alias("t"),
    )
    return spiked.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(PII_EMAIL)).alias("n_emails"),
        F.md5(redact_pii("t")).alias("clean_md5"),
    )


# --------------------------------------------------------------------------
# q200 (birth q050) — PageRank over the customer–supplier transaction graph
# (L-family, iterative): 5 fixed iterations in exact integer units
# (operators/graph.pagerank_int) — integer division makes every step
# bit-identical under any partitioning/engine, which is the only way an
# iterative float recursion can be oracle-hash-checked. The oracle
# unrolls the same recursion as chained CTEs. Importance over the
# bipartite who-trades-with-whom graph = entity centrality for
# prioritizing curation.
# --------------------------------------------------------------------------
_PR_EDGES_SQL = """
pairs AS (
  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
edges AS (SELECT c AS src, s AS dst FROM pairs
          UNION ALL SELECT s AS src, c AS dst FROM pairs),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS units FROM nodes)
"""


def _pr_iter_sql(k: int) -> str:
    # Same exact integer recursion as operators.graph.pagerank_int:
    # unit 10**9, damping 85%, and the overflow-safe decomposition
    # (85*s)//100 == 85*(s//100) + (85*(s%100))//100. The SUM is cast
    # back to BIGINT because DuckDB widens SUM(BIGINT) to HUGEINT,
    # which the driver's type-sensitive hash would flag.
    return f"""
r{k} AS (
  SELECT n.node,
         CAST(150000000 AS BIGINT)
         + CAST(85 AS BIGINT) * (COALESCE(i.s, 0) // 100)
         + (CAST(85 AS BIGINT) * (COALESCE(i.s, 0) % 100)) // 100 AS units
  FROM nodes n LEFT JOIN (
    SELECT e.dst, CAST(SUM(r.units // d.deg) AS BIGINT) AS s
    FROM edges e
    JOIN r{k - 1} r ON e.src = r.node
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) i ON i.dst = n.node)
"""


@register(
    "q200_pagerank_int",
    oracle="WITH "
    + ",".join([_PR_EDGES_SQL] + [_pr_iter_sql(k) for k in range(1, 6)])
    + "\nSELECT node, units FROM r5",
)
def q200_pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.graph import pagerank_int

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # Narrower shuffle keys (guide §2.3): the five rank iterations
    # shuffle the node id in every join/agg, so the bipartite ids run
    # encoded as longs (c:x -> 2x, s:y -> 2y+1 — injective, so the
    # distinct/join/group structure is untouched and PageRank's values
    # don't depend on id ordering); the display string is decoded once
    # on output. 8-byte fixed keys also hash/compare cheaper than
    # 'c:…'/'s:…' strings.
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("c"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank_int(edges, iterations=5)
    return ranks.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("c:")).otherwise(F.lit("s:")),
            F.expr("CAST(node div 2 AS STRING)"),
        ).alias("node"),
        "units",
    )


# --------------------------------------------------------------------------
# q116 — k-anonymity audit (L-family, privacy): group sizes over a
# quasi-identifier set, flagging groups below k — the standard
# pre-release privacy check for training data (suppress or generalize
# flagged groups). One aggregation shuffle on the QI columns; the
# summary rides the reduced frame.
# --------------------------------------------------------------------------
@register(
    "q116_k_anonymity_audit",
    oracle="""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, group_size,
       group_size < 5 AS below_k,
       CASE WHEN group_size < 5 THEN group_size ELSE 0 END AS suppressed_rows
FROM g
""",
)
def q116_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    k = 5
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return g.select(
        "c_nationkey",
        "c_mktsegment",
        "group_size",
        (F.col("group_size") < k).alias("below_k"),
        F.when(F.col("group_size") < k, F.col("group_size"))
        .otherwise(F.lit(0))
        .alias("suppressed_rows"),
    )


# --------------------------------------------------------------------------
# q117 — general as-of join via cogrouped pandas merge_asof
# (operators/asof.py; C9's applyInPandas path, complementing q020's
# window formulation): each purchase matched to the user's latest
# signup at-or-before it. Oracle = DuckDB's native ASOF JOIN.
# Scale: one shuffle per side on user_id; per-user groups are small, so
# the pandas merge is Arrow-batched per group, never per row.
# --------------------------------------------------------------------------
@register(
    "q117_asof_cogroup",
    oracle="""
SELECT p.event_id, p.user_id, epoch_us(s.ts) AS signup_ts_us
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def q117_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(
        purchases, signups, by=["user_id"], on="ts", carry_on="signup_ts"
    )
    return joined.select(
        "event_id", "user_id", F.unix_micros("signup_ts").alias("signup_ts_us")
    )


# --------------------------------------------------------------------------
# q118 — deterministic weighted corpus mixture (L-pipeline, training-data
# blending): per-lang keep rates realized by keyed md5 Bernoulli
# sampling (operators/sampling.py) — one map-only pass, no shuffle, no
# RNG, bit-identical across engines/partitionings/retries. The oracle
# is the SAME hash expression in DuckDB, so the driver checks the
# sampled corpus exactly.
# --------------------------------------------------------------------------
_MIX_RATES = {"de": 0.25, "en": 0.5, "es": 0.75, "fr": 0.1, "zh": 1.0}


@register(
    "q118_weighted_mixture",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|mix1'), 1, 8) <
      CASE lang WHEN 'de' THEN '40000000'
                WHEN 'en' THEN '80000000'
                WHEN 'es' THEN 'c0000000'
                WHEN 'fr' THEN '19999999'
                WHEN 'zh' THEN 'g'
                ELSE '00000000' END
""",
)
def q118_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.sampling import weighted_mixture

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return weighted_mixture(
        docs, key_col="doc_id", group_col="lang", rates=_MIX_RATES, seed="mix1"
    )


# --------------------------------------------------------------------------
# q281 (birth q119) — sequence packing (L-pipeline, sample packing for LLM training):
# greedy contiguous token-budget binning per bucket stream
# (operators/packing.py). The recurrence is deterministic, so the
# DuckDB oracle replays it exactly with a recursive CTE over the same
# (bucket = doc_id % 8, ORDER BY doc_id) streams — packing gets a full
# value-level check, not just rows-only. Token source: the fixture's
# n_chars column (the operator is agnostic to what "tokens" measures).
# --------------------------------------------------------------------------
_PACK_MAX = 1500


@register(
    "q281_sequence_packing",
    oracle=f"""
WITH RECURSIVE t AS (
  SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS n_tokens,
         doc_id % 8 AS bucket,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
  FROM documents
),
rec AS (
  SELECT bucket, rn, id, n_tokens,
         n_tokens > {_PACK_MAX} AS oversize,
         CAST(0 AS BIGINT) AS seq_local,
         0 AS pos,
         CAST(CASE WHEN n_tokens > {_PACK_MAX} THEN 1 ELSE 0 END AS BIGINT) AS cur_seq,
         CAST(CASE WHEN n_tokens > {_PACK_MAX} THEN 0 ELSE n_tokens END AS BIGINT) AS acc
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.bucket, t.rn, t.id, t.n_tokens,
         t.n_tokens > {_PACK_MAX} AS oversize,
         CASE WHEN t.n_tokens > {_PACK_MAX}
                THEN r.cur_seq + CASE WHEN r.acc > 0 THEN 1 ELSE 0 END
              WHEN r.acc + t.n_tokens > {_PACK_MAX} THEN r.cur_seq + 1
              ELSE r.cur_seq END AS seq_local,
         CASE WHEN t.n_tokens > {_PACK_MAX} THEN 0
              WHEN r.acc + t.n_tokens > {_PACK_MAX} THEN 0
              WHEN r.oversize THEN 0
              ELSE r.pos + 1 END AS pos,
         CASE WHEN t.n_tokens > {_PACK_MAX}
                THEN r.cur_seq + CASE WHEN r.acc > 0 THEN 1 ELSE 0 END + 1
              WHEN r.acc + t.n_tokens > {_PACK_MAX} THEN r.cur_seq + 1
              ELSE r.cur_seq END AS cur_seq,
         CASE WHEN t.n_tokens > {_PACK_MAX} THEN 0
              WHEN r.acc + t.n_tokens > {_PACK_MAX} THEN t.n_tokens
              ELSE r.acc + t.n_tokens END AS acc
  FROM rec r JOIN t ON t.bucket = r.bucket AND t.rn = r.rn + 1
)
SELECT id, n_tokens, bucket,
       CAST(bucket * 1000000000 + seq_local AS BIGINT) AS seq_id,
       pos AS seq_pos, oversize
FROM rec
""",
)
def q281_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return pack_sequences(
        docs,
        "doc_id",
        "n_chars",
        max_tokens=_PACK_MAX,
        bucket_expr=F.pmod(F.col("doc_id"), F.lit(8)),
    )


# --------------------------------------------------------------------------
# q120 — embedding L2 norm + symmetric int8 quantization (L-sim
# preprocessing: ANN indexes and vector stores run on quantized
# vectors; 4× memory cut vs float32 at ~1% recall cost). Map-only
# Catalyst HOFs, no shuffle. Outputs are per-vector scalars
# (floor-scaled norm, quant checksum/extremes) so the driver's
# value hash stays array-free; rounding is floor-based throughout
# (ROUND(double) tie direction is not portable across engines).
# --------------------------------------------------------------------------
@register(
    "q120_embedding_quantize",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
  SELECT vec_id, v,
         sqrt(list_dot_product(v, v)) AS nrm,
         list_max(list_transform(v, x -> abs(x))) AS ma
  FROM e
),
q AS (
  SELECT vec_id, nrm,
         CASE WHEN ma = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / ma + 0.5) AS INTEGER))
         END AS qv
  FROM n
)
SELECT vec_id,
       CAST(floor(nrm * 1000000) AS BIGINT) AS norm_e6,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(qv, 'min') AS INTEGER) AS q_min,
       CAST(list_aggregate(qv, 'max') AS INTEGER) AS q_max
FROM q
""",
)
def q120_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.operators import similarity as sim

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", sim.as_double("embedding").alias("v")
    )
    qv = sim.quantize_int8(F.col("v"))
    return emb.select(
        "vec_id",
        F.floor(sim.l2_norm(F.col("v")) * 1_000_000).cast("bigint").alias("norm_e6"),
        F.aggregate(qv, F.lit(0).cast("bigint"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(qv).alias("q_min"),
        F.array_max(qv).alias("q_max"),
    )


# --------------------------------------------------------------------------
# q121 — leakage-aware grouped split (L-pipeline): train/val/test
# assignment keyed on the GROUP (source corpus), not the row — every
# document of a source lands in the same split, so near-duplicates
# within a source can never straddle the train/test boundary (the
# classic eval-leakage failure of row-keyed splits; row-keyed md5
# splitting itself is q108). Same portable md5 hex-threshold machinery
# as q118; map-only.
# --------------------------------------------------------------------------
@register(
    "q121_grouped_split",
    oracle="""
SELECT doc_id, source,
       CASE WHEN substr(md5(source || '|split1'), 1, 8) < 'cccccccc' THEN 'train'
            WHEN substr(md5(source || '|split1'), 1, 8) < 'e6666666' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def q121_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    h = F.substring(F.md5(F.concat(F.col("source"), F.lit("|split1"))), 1, 8)
    # thresholds: 0.8 → cccccccc, 0.9 → e6666666 (floor(r·2^32) in hex)
    return docs.select(
        "doc_id",
        "source",
        F.when(h < "cccccccc", "train")
        .when(h < "e6666666", "val")
        .otherwise("test")
        .alias("split"),
    )
