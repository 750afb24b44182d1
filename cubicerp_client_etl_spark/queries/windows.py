"""Event-time window queries (SURVEY §2.J batch-checkable forms, D1).

The streaming runtime lives in ``streaming/``; these queries run the
same window semantics in batch so the DuckDB oracle can check them (the
stream-vs-batch equivalence tests in tests/ close the loop, SURVEY
§5.2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.catalog import load
from cubicerp_client_etl_spark.functions import dec, dsum
from cubicerp_client_etl_spark.queries import register

# --------------------------------------------------------------------------
# q043 — tumbling event-time window (J2): hourly per-type counts/sums.
# Epoch-aligned in both engines (Spark window() and date_trunc agree for
# hour buckets); output as epoch micros to dodge timestamp rendering.
# --------------------------------------------------------------------------
@register(
    "q043_tumbling_window",
    headline=True,
    oracle="""
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q043_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q076 — sliding window (J2): 1-hour windows sliding every 30 minutes.
# Oracle expands each event into the two windows that contain it.
# --------------------------------------------------------------------------
@register(
    "q076_sliding_window",
    oracle="""
WITH expanded AS (
  SELECT epoch_us(ts) - (epoch_us(ts) % (30*60*1000000)) - s.ofs AS window_start_us,
         event_type, value
  FROM events,
       (SELECT UNNEST([0, 30*60*1000000]) AS ofs) s
)
SELECT window_start_us, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM expanded GROUP BY 1, 2
""",
)
def q076_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q222 (birth q044) — session window (J3): per-user sessions with a 30-minute gap.
# Spark session_window semantics: a session extends while the next event
# starts strictly before last_ts + gap; oracle = gaps-and-islands with
# the same boundary rule (diff >= gap ⇒ new session).
# --------------------------------------------------------------------------
@register(
    "q222_session_window",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, sess_id
""",
)
def q222_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q229 (birth q046) — header/footer first/last-row broadcast (D1/F1): the reference
# reads file row 0 as header and row N-1 as footer and broadcasts their
# values onto every body row (cubicerpetl.py:235-240,265). Over an
# ordered table this is min_by/max_by on a total order key — one
# aggregate, broadcast back via crossJoin.
# --------------------------------------------------------------------------
@register(
    "q229_header_footer_broadcast",
    oracle="""
WITH hf AS (
  SELECT min_by(strftime(l_shipdate, '%Y-%m-%d'),
                lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                  || lpad(CAST(l_linenumber AS VARCHAR), 2, '0')
                  || strftime(l_shipdate, '%Y-%m-%d')) AS header_ship,
         max_by(strftime(l_shipdate, '%Y-%m-%d'),
                lpad(CAST(l_orderkey AS VARCHAR), 12, '0')
                  || lpad(CAST(l_linenumber AS VARCHAR), 2, '0')
                  || strftime(l_shipdate, '%Y-%m-%d')) AS footer_ship,
         COUNT(*) AS n_body_rows
  FROM lineitem
)
SELECT l.l_returnflag, hf.header_ship, hf.footer_ship, hf.n_body_rows,
       COUNT(*) AS n
FROM lineitem l CROSS JOIN hf
GROUP BY 1, 2, 3, 4
""",
)
def q229_header_footer_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture;
    # fold the payload (shipdate) into the order key so min_by/max_by
    # ties can only occur between rows with identical payloads —
    # deterministic across engines.
    pos = F.concat(
        F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
        F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    hf = li.agg(
        F.min_by(F.date_format("l_shipdate", "yyyy-MM-dd"), pos).alias("header_ship"),
        F.max_by(F.date_format("l_shipdate", "yyyy-MM-dd"), pos).alias("footer_ship"),
        F.count(F.lit(1)).alias("n_body_rows"),
    )
    return (
        li.crossJoin(F.broadcast(hf))
        .groupBy("l_returnflag", "header_ship", "footer_ship", "n_body_rows")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# q140 (birth q045) — sessionization via lag+cumsum (the batch/SQL-expressible twin of
# q044, SURVEY "common OLAP patterns"): window-function path, checked
# against the same oracle shape but keyed by session ordinal.
# --------------------------------------------------------------------------
@register(
    "q140_sessionize_lag_cumsum",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
  FROM marked
)
SELECT user_id, sess_id, COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us
FROM sessions GROUP BY user_id, sess_id
""",
)
def q140_sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag(F.col("ts")).over(w))
    marked = ev.withColumn(
        "new_sess",
        F.when(gap_us.isNull() | (gap_us >= 30 * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = marked.withColumn("sess_id", F.sum("new_sess").over(w2))
    return sessions.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


# --------------------------------------------------------------------------
# q112 — interval join, batch twin of the stream-stream join
# (streaming/jobs.view_purchase_interval_join; J-family + C9): purchases
# attributed to same-user views within a 30-minute window. The
# band condition compiles to a range join; the streaming form bounds
# state with watermarks on both sides. Equality of the two forms is
# asserted in tests/test_streaming.py; equality to DuckDB here.
# --------------------------------------------------------------------------
@register(
    "q112_interval_join_attribution",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
       p.value AS purchase_value,
       epoch_us(v.ts) AS view_ts_us, epoch_us(p.ts) AS purchase_ts_us
FROM events v
JOIN events p ON p.user_id = v.user_id
             AND p.ts >= v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
""",
)
def q112_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cubicerp_client_etl_spark.streaming.jobs import (
        view_purchase_interval_join,
    )

    ev = load(spark, sf_dir, "events")
    return view_purchase_interval_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )


# --------------------------------------------------------------------------
# q115 — time-RANGE frame (E3's rangeBetween, distinct from the
# rowsBetween running frames elsewhere): trailing 7-day revenue per
# order day, frame bounded by VALUE distance (epoch seconds), not row
# count — days with no neighbors contribute shorter frames, which a
# rows-frame can't express. Both engines pin the identical numeric
# RANGE frame over epoch seconds.
# Scale: one day-level aggregation shuffle; the range window then runs
# over ~#days rows — negligible. The daily pre-aggregate is what keeps
# a trailing-window metric viable at 100 TB (never window raw rows).
# --------------------------------------------------------------------------
@register(
    "q115_trailing_range_window",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         epoch(CAST(date_trunc('day', o_orderdate) AS TIMESTAMP)) AS day_s,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1, 2
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER (ORDER BY day_s
                               RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rev_7d
FROM daily
""",
)
def q115_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    daily = daily.withColumn("day_s", F.unix_timestamp(F.col("day").cast("timestamp")))
    w = W.orderBy("day_s").rangeBetween(-518400, W.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("rev_7d"),
    )
