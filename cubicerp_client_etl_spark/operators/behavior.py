"""Event-sequence behavioral analytics: funnel completion, cohort
retention, and Markov transition counts over an event stream.

The reference's ETL jobs feed exactly these downstream dashboards
(extract → per-user ordered scan → keyed rollup); here each operator
is expressed as bounded passes of keyed aggregation + equi-join so the
shapes survive 100 TB:

- funnels are K conditional min-aggregations chained by equi-joins on
  the (high-cardinality) user key — K is the number of steps, a query
  constant, never a per-row loop;
- cohort retention is two keyed aggregations and one join, with the
  matrix rollup running on the (cohort × offset) aggregate;
- transition counts come from one lead() window partitioned by the
  user key (high cardinality — prover-compliant) and a bounded
  (from × to) rollup.

All arithmetic is exact integers (epoch micros, counts, e6 floor
ratios) so DuckDB oracles replay every row bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.functions import e6_floor_ratio


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Earliest-completion funnel: for each user, the timestamp of the
    first ``steps[0]`` event, then the first ``steps[1]`` event strictly
    AFTER it, and so on (greedy-earliest is optimal for an unbounded
    conversion window: taking the earliest feasible step can only
    enlarge the candidate set for every later step).

    Returns one row per user that reached step 1:
    ``(user_col, t1_us, t2_us, ..., tK_us)`` with ``tk_us`` NULL once
    the user stalls (NULLs are monotone: a NULL at step k forces NULL
    at k+1).

    Scale: K conditional min-aggregations on the user key, chained by
    K−1 equi-joins on that same key — every exchange hash-partitions
    on the user, so AQE reuses the partitioning across stages; no
    window over raw events, no per-user collect.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"duplicate step types: {steps}")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_t"),
        F.col(type_col).alias("_ty"),
    )
    cur = (
        ev.where(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("t1_us"))
    )
    for k, s in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("_ty") == s)
            .join(cur.select("_u", F.col(f"t{k - 1}_us").alias("_prev")), "_u")
            .where(F.col("_prev").isNotNull() & (F.col("_t") > F.col("_prev")))
            .groupBy("_u")
            .agg(F.min("_t").alias(f"t{k}_us"))
        )
        cur = cur.join(nxt, "_u", "left")
    return cur.withColumnRenamed("_u", user_col)


def funnel_report(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-step funnel rollup over :func:`funnel_steps`: one row per
    step with ``(step, step_type, n_users, conv_from_first_e6,
    conv_from_prev_e6, sum_elapsed_us)`` — the counts, the conversion
    rates against step 1 and against the previous step (exact e6 floor
    ratios), and the exact total time from step 1 for users who
    reached the step (sum, not median: order-independent and
    map-combinable)."""
    per_user = funnel_steps(events, user_col, ts_col, type_col, steps)
    rows = []
    for k, s in enumerate(steps, start=1):
        t = F.col(f"t{k}_us")
        rows.append(
            per_user.agg(
                F.lit(k).cast("int").alias("step"),
                F.lit(s).alias("step_type"),
                F.count(t).cast("bigint").alias("n_users"),
                F.coalesce(
                    F.sum(F.when(t.isNotNull(), t - F.col("t1_us"))), F.lit(0)
                )
                .cast("bigint")
                .alias("sum_elapsed_us"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    w_first = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("step")
    # windows over the K-row per-step aggregate — bounded by construction
    first_n = F.first("n_users").over(w_first)
    prev_n = F.lag("n_users").over(w_prev)
    return out.select(
        "step",
        "step_type",
        "n_users",
        F.when(first_n > 0, e6_floor_ratio(F.col("n_users"), first_n))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("conv_from_first_e6"),
        F.when(prev_n.isNull(), F.lit(1_000_000))
        .when(prev_n > 0, e6_floor_ratio(F.col("n_users"), prev_n))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("conv_from_prev_e6"),
        "sum_elapsed_us",
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period (epoch
    days div ``period_days``) of their FIRST event; for every
    (cohort, offset) cell, the count of cohort users active in
    cohort+offset, the cohort size, and the exact e6 retention share.

    Offset 0 is the cohort period itself (retention 1e6 by
    construction — kept as the self-check row). ``ts_col`` must be
    epoch MICROSECONDS (bigint) — callers convert timestamps with
    ``unix_micros`` first; integer division then lands every event in
    exactly one period with no float boundary risk.

    Scale: one min-aggregation on the user key, one distinct over
    (user, period) — both map-side combinable — one equi-join on the
    user key, then the matrix rollup on the bounded
    (cohort × offset) aggregate.
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    # integer div end-to-end (epoch micros → days → period index):
    # float division + floor can land one off at integer boundaries
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.expr(
            f"CAST(({ts_col} div 86400000000) div {int(period_days)} AS BIGINT)"
        ).alias("_p"),
    )
    first = ev.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    active = ev.distinct()
    cell = (
        active.join(first, "_u")
        .groupBy(F.col("_cohort"), (F.col("_p") - F.col("_cohort")).alias("_off"))
        .agg(F.count_distinct("_u").cast("bigint").alias("n_active"))
    )
    size = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        cell.join(size, "_cohort")
        .select(
            F.col("_cohort").cast("bigint").alias("cohort"),
            # not named "offset": SQL keyword in enough engines to
            # make oracles and consumers quote it forever
            F.col("_off").cast("bigint").alias("period_offset"),
            "cohort_size",
            "n_active",
            e6_floor_ratio(F.col("n_active"), F.col("cohort_size"))
            .cast("bigint")
            .alias("retention_e6"),
        )
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: ``(from_type, to_type, n, p_e6)`` where ``p_e6`` is the
    exact row-normalized transition probability (floor e6). The last
    event of each user has no successor and contributes no row.

    Scale: ONE lead() window partitioned by the high-cardinality user
    key (prover-compliant), then a bounded (from × to) rollup; the
    per-from normalization joins against the bounded from-totals
    aggregate (broadcast).
    """
    order_cols = [F.col(ts_col)] + (
        [F.col(order_col)] if order_col is not None else []
    )
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    pairs = (
        events.select(
            F.col(user_col),
            *order_cols,
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("_tot")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        e6_floor_ratio(F.col("n"), F.col("_tot")).cast("bigint").alias("p_e6"),
    )


def session_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str,
    gap: int,
    max_steps: int = 5,
) -> DataFrame:
    """Navigation-path signatures: sessionize each user's events by an
    idle gap (``gap`` in the same integer units as ``ts_col``; a new
    session starts when the inter-event gap is >= gap — the q222
    boundary rule), then fingerprint every session by its FIRST
    ``max_steps`` event types joined with '>' ("view>click>purchase").

    Returns one row per session: ``(user_col, session_seq, n_events,
    path)`` where ``session_seq`` numbers the user's sessions from 1.

    Scale: two windows partitioned by the high-cardinality user key
    (lag + running session counter), one window on (user, session) for
    the step rank, then ONE keyed aggregation whose collected list is
    capped at ``max_steps`` elements BEFORE collection (the rank
    filter runs inside the aggregate via conditional collect) — state
    per group is bounded by max_steps however long a bot session runs.
    """
    if gap < 1 or max_steps < 1:
        raise ValueError("gap >= 1 and max_steps >= 1 required")
    w_u = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    new_sess = F.when(
        F.lag(ts_col).over(w_u).isNull()
        | (F.col(ts_col) - F.lag(ts_col).over(w_u) >= gap),
        1,
    ).otherwise(0)
    sessed = events.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_s = Window.partitionBy(user_col, "session_seq").orderBy(
        ts_col, order_col
    )
    ranked = sessed.withColumn("_rk", F.row_number().over(w_s))
    return ranked.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_rk") <= max_steps,
                            F.struct(
                                F.col("_rk").alias("r"),
                                F.col(type_col).alias("ty"),
                            ),
                        )
                    )
                ),
                lambda x: x["ty"],
            ),
            ">",
        ).alias("path"),
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket: Column,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Maximum simultaneous open intervals, per reporting bucket — the
    capacity question (peak concurrent sessions / connections / jobs).

    Classic boundary walk, distributed: every interval emits +1 at
    ``start_col`` and −1 at ``end_col``; the running sum over the
    global (time, delta) order — ends before starts at the same tick,
    the half-open [start, end) convention — is the concurrency curve;
    the per-bucket max of the curve is the answer.

    The running sum is GLOBAL, so it runs on the two-phase scan
    (``prefix.prefix_sum``: range partition, per-slice sums, broadcast
    offsets) — never a single-partition window over corpus-sized
    boundaries. ``bucket`` is evaluated against the boundary's
    timestamp column (pass e.g. ``F.expr("t div 86400000000")``
    against the emitted ``t`` column).

    Returns one row per bucket: ``(bucket_name, n_boundaries,
    peak_concurrency)``.
    """
    from cubicerp_client_etl_spark.operators.prefix import prefix_sum

    starts = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).cast("bigint").alias("d")
    )
    ends = intervals.select(
        F.col(end_col).alias("t"), F.lit(-1).cast("bigint").alias("d")
    )
    bounds = starts.unionByName(ends)
    # order: time, then delta ASC so -1 (ends) apply before +1 (starts)
    # at the same tick — half-open interval semantics
    cum = prefix_sum(
        bounds, order_by=[F.col("t"), F.col("d")], value_col="d", out_col="_c"
    )
    return cum.groupBy(bucket.alias(bucket_name)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
        F.max("_c").cast("bigint").alias("peak_concurrency"),
    )
