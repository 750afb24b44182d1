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
from cubicerp_client_etl_spark.checkpointing import pin


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
    map-combinable).

    All K counts and elapsed sums come from ONE ``.agg`` over the
    per-user frame (the K-join funnel chain is planned and executed
    once, not once per step), then a ``stack`` unpivots the 1-row
    aggregate to per-step rows — K separate whole-frame aggregations
    would re-execute the chain K times (K² join stages). Because every
    step's count is a COLUMN of that single row, the conversion ratios
    need no window at all: first/prev are sibling columns."""
    per_user = funnel_steps(events, user_col, ts_col, type_col, steps)
    aggs = []
    for k in range(1, len(steps) + 1):
        t = F.col(f"t{k}_us")
        aggs.append(F.count(t).cast("bigint").alias(f"_n{k}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(t.isNotNull(), t - F.col("t1_us"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"_e{k}")
        )
    one = per_user.agg(*aggs)
    for k in range(1, len(steps) + 1):
        n_k, n_1 = F.col(f"_n{k}"), F.col("_n1")
        one = one.withColumn(
            f"_cf{k}",
            F.when(n_1 > 0, e6_floor_ratio(n_k, n_1))
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        if k == 1:
            cp = F.lit(1_000_000).cast("bigint")
        else:
            prev = F.col(f"_n{k - 1}")
            cp = (
                F.when(prev > 0, e6_floor_ratio(n_k, prev))
                .otherwise(F.lit(0))
                .cast("bigint")
            )
        one = one.withColumn(f"_cp{k}", cp)
    def _sql_str(s: str) -> str:
        # backslash is an escape character inside Spark SQL string
        # literals, so it must be doubled BEFORE quote-doubling —
        # otherwise a step name containing \ corrupts the stack()
        # labels or fails to parse (ADVICE r10)
        return s.replace("\\", "\\\\").replace("'", "''")

    stacked = ", ".join(
        f"{k}, '{_sql_str(s)}', _n{k}, _cf{k}, _cp{k}, _e{k}"
        for k, s in enumerate(steps, start=1)
    )
    out = one.select(
        F.expr(
            f"stack({len(steps)}, {stacked})"
            " AS (step, step_type, n_users, conv_from_first_e6,"
            " conv_from_prev_e6, sum_elapsed_us)"
        )
    )
    return out.select(
        F.col("step").cast("int").alias("step"),
        "step_type",
        "n_users",
        "conv_from_first_e6",
        "conv_from_prev_e6",
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
    against the emitted ``t`` column) and must produce an INTEGRAL
    value (it is cast to bigint to build the dense bucket axis).

    The per-bucket answer is ``max(carry-in level, per-boundary max)``:
    the carry-in — the number of intervals already open when the
    bucket begins, i.e. the sum of all deltas in earlier buckets — is
    a real candidate for the bucket's peak (a bucket whose first event
    is an end would otherwise report level−1), and buckets fully
    covered by open intervals but containing no boundaries of their
    own still exist: the output is DENSE over [min bucket, max bucket]
    (empty covered buckets report ``n_boundaries = 0`` and the
    carried-in level). Both fixes run on bounded frames — the bucket
    grid and the 2-row span aggregate — so nothing here scales with
    raw boundary count.

    Returns one row per bucket in the span: ``(bucket_name,
    n_boundaries, peak_concurrency)``.
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
    # bucket grid: one row per non-empty bucket — bounded by #buckets
    grid = cum.groupBy(bucket.cast("bigint").alias("_b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
        F.max("_c").cast("bigint").alias("_maxc"),
        F.sum("d").cast("bigint").alias("_sumd"),
    )
    # carry-in = level at bucket entry — windows run over the BOUNDED
    # grid aggregate (never over raw boundaries, never over the
    # generated dense axis: the plan prover requires every global
    # window's input to be provably bounded)
    w_carry = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.orderBy("_b")
    staged = grid.withColumn(
        "_carry",
        F.coalesce(F.sum("_sumd").over(w_carry), F.lit(0).cast("bigint")),
    ).withColumn("_next", F.lead("_b").over(w_next))
    nonempty = staged.select(
        F.col("_b").alias(bucket_name),
        "n_boundaries",
        F.greatest(F.col("_maxc"), F.col("_carry"))
        .cast("bigint")
        .alias("peak_concurrency"),
    )
    # gap-fill AFTER the windows: buckets between consecutive non-empty
    # buckets hold the constant carried level (carry-in + this bucket's
    # net delta); the explode sits at the top of the plan, feeding no
    # window
    gaps = staged.where(
        F.col("_next").isNotNull() & (F.col("_next") > F.col("_b") + 1)
    ).select(
        F.explode(
            F.sequence(F.col("_b") + 1, F.col("_next") - 1)
        ).alias(bucket_name),
        F.lit(0).cast("bigint").alias("n_boundaries"),
        (F.col("_carry") + F.col("_sumd"))
        .cast("bigint")
        .alias("peak_concurrency"),
    )
    return nonempty.unionByName(gaps)


def rfm_segmentation(
    orders: DataFrame,
    entity_col: str,
    date_col: str,
    amount_col: str,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic customer-value grid. Per entity: days since last
    order (against a data-derived as-of = newest order + 1 day, never
    the wall clock), order count, and total cents; each metric is
    scored 1..5 by the exact integer quintile rule

        score = ceil(cum_count(metric value) · 5 / n)
              = (cum·5 + n − 1) div n

    over the ASCENDING value order (ties share a score; score 1 =
    smallest values — most recent / fewest orders / least spend — a
    uniform convention the consumer can flip per metric).

    Returns the bounded segment grid: one row per (r_score, f_score,
    m_score) with ``n_entities`` and ``total_cents``.

    Scale: one entity-keyed aggregation, then each metric's quintile
    runs on its VALUE-COUNT table through the two-phase prefix scan
    (``prefix.prefix_sum`` — bounded by distinct metric values, never
    a global window over entities), joined back on the metric value;
    n broadcasts as a 1-row aggregate. The final rollup is ≤ 125
    cells.
    """
    from cubicerp_client_etl_spark.operators.prefix import prefix_sum

    d = F.to_date(F.col(date_col))
    asof = orders.agg(F.date_add(F.max(d), 1).alias("_asof"))
    # The per-entity aggregate feeds the n-row count, all three metric
    # value-count tables and the final score join — checkpoint it so
    # the orders scan + aggregation run once. Each metric's score map
    # depends only on that metric's VALUE DISTRIBUTION (the join-backs
    # never change the row multiset), so the three maps are built
    # independently from `per` and attached in one join chain, instead
    # of the previous nested tile(tile(tile(...))) whose inner stages
    # were re-evaluated by every outer value-count pass.
    per = (
        orders.crossJoin(F.broadcast(asof))
        .groupBy(entity_col)
        .agg(
            F.datediff(F.first("_asof"), F.max(d)).cast("bigint").alias("_r"),
            F.count(F.lit(1)).cast("bigint").alias("_f"),
            F.sum(F.col(amount_col)).cast("bigint").alias("_m"),
        )
        .transform(pin)
    )
    n_row = per.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))

    def score_map(metric: str, out: str) -> DataFrame:
        vc = per.groupBy(metric).agg(
            F.count(F.lit(1)).cast("bigint").alias("_c")
        )
        cum = prefix_sum(
            vc, order_by=[F.col(metric)], value_col="_c", out_col="_cum"
        )
        return cum.crossJoin(F.broadcast(n_row)).select(
            metric,
            F.expr(f"CAST((_cum * 5 + _n - 1) div _n AS INT)").alias(out),
        )

    staged = (
        per.join(score_map("_r", "r_score"), "_r")
        .join(score_map("_f", "f_score"), "_f")
        .join(score_map("_m", "m_score"), "_m")
    )
    return staged.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_entities"),
        F.sum("_m").cast("bigint").alias("total_cents"),
    )


def last_touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    direct_label: str = "direct",
) -> DataFrame:
    """Last-touch conversion attribution: every ``conversion_type``
    event is credited to the event type IMMEDIATELY preceding it in
    the user's stream (``direct_label`` when the conversion is the
    user's first event). The single-touch baseline every attribution
    debate starts from.

    Returns one row per attributed source type:
    ``(source_type, n_conversions, sum_value_floor)`` — counts and the
    exact sum of ``floor(value)`` (IEEE-identical across engines).

    Scale: ONE lag() window partitioned by the (high-cardinality) user
    key over (ts, order) — prover-compliant — then a bounded rollup on
    the source type.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    staged = events.withColumn("_prev_ty", F.lag(type_col).over(w))
    conv = staged.where(F.col(type_col) == conversion_type)
    return (
        conv.groupBy(
            F.coalesce(F.col("_prev_ty"), F.lit(direct_label)).alias(
                "source_type"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.coalesce(F.sum(F.floor(F.col(value_col)).cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("sum_value_floor"),
        )
    )


def cohort_ltv(
    orders: DataFrame,
    user_col: str,
    month_col: str,
    value_col: str,
) -> DataFrame:
    """Cohort lifetime-value curve: customers cohort by their FIRST
    month; each cohort's revenue accumulates over month offsets,
    reported per (cohort_month, offset) as exact cents plus the
    per-customer average — the revenue twin of the retention matrix
    (``cohort_retention`` counts active users; LTV sums what they
    spent).

    ``month_col`` is an integer month index (e.g. yyyymm or a month
    sequence number from months_between). Offset = month − cohort
    month in POSITIONS OF THE OBSERVED GRID? No — calendar offset:
    offset = month_index − cohort_index (gaps stay gaps: a cohort
    with no revenue at offset 2 simply has no row; the cumulative sum
    still carries through via the window over observed offsets).

    Returns one row per (cohort, offset) with revenue in that offset
    month, the RUNNING cumulative (the LTV curve), cohort size, and
    ``cum_ltv_per_user_cents`` (floored division, exact).

    Scale: one user-keyed min-aggregate (cohort assignment, broadcast
    back by equi-join), one (cohort, offset) aggregate — both bounded
    by calendar cardinality — and a window over the bounded cohort
    grid. No raw-row window.
    """
    from pyspark.sql import Window as W

    src = orders.select(
        F.col(user_col).alias("_u"),
        F.col(month_col).cast("long").alias("_m"),
        F.col(value_col).cast("long").alias("_v"),
    )
    first = src.groupBy("_u").agg(F.min("_m").alias("cohort_month"))
    sizes = first.groupBy("cohort_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    grid = (
        src.join(first, "_u")
        .groupBy(
            "cohort_month",
            (F.col("_m") - F.col("cohort_month")).cast("bigint").alias(
                "month_offset"
            ),
        )
        .agg(F.sum("_v").cast("bigint").alias("revenue_cents"))
    )
    w = (
        W.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.withColumn(
            "cum_ltv_cents", F.sum("revenue_cents").over(w).cast("bigint")
        )
        .join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "revenue_cents",
            "cum_ltv_cents",
            "cohort_users",
            F.expr("cum_ltv_cents div cohort_users")
            .cast("bigint")
            .alias("cum_ltv_per_user_cents"),
        )
    )


def stickiness_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """DAU/WAU stickiness — the engagement ratio product teams track:
    per calendar day, daily active users over trailing-``window_days``
    active users, exact (``stickiness_e6 = floor(10⁶·DAU/WAU)``).

    Trailing distinct counts can't ride a range window (no
    distinct-over-frame), so the WAU side EXPLODES each distinct
    (user, day) into the ``window_days`` report days it contributes
    to and de-duplicates — a bounded ×7 fan on the already-distinct
    day grid, all exact. Report days outside the observed range
    (the explode's forward spill) are dropped by an inner join back
    to the DAU grid, which also makes the first ``window_days − 1``
    days honest partial windows (documented — the report's usual
    left edge).

    Output per day: ``(day, dau, wau, stickiness_e6)``.

    Scale: one distinct on (user, day) — linear — then a ×window_days
    explode of THAT (already deduplicated) set, one more distinct and
    two keyed counts; everything keyed on day/user, no window at all.
    """
    from ..functions import e6_floor_ratio

    ud = events.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    dau = ud.groupBy(F.col("_d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    spread = (
        ud.withColumn(
            "_k", F.explode(F.sequence(F.lit(0), F.lit(int(window_days) - 1)))
        )
        .select("_u", F.expr("date_add(_d, _k)").alias("day"))
        .distinct()
    )
    wau = spread.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .withColumn(
            "stickiness_e6", e6_floor_ratio(F.col("dau"), F.col("wau"))
        )
        .select("day", "dau", "wau", "stickiness_e6")
    )


def hourly_profile(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Hour-of-day load profile — the capacity/anomaly question ops
    teams ask of any event stream: where is each event class's
    traffic concentrated across the 24-hour clock, and how far from
    uniform is it?

    Hour is UTC-instant arithmetic (``(unix_seconds div 3600) % 24``)
    — NOT calendar rendering, so the answer is independent of any
    session timezone and both engines compute it from the same
    integers. Per key: total events, the peak hour (ties to the
    lowest hour), the peak hour's share (e6, exact), and a dispersion
    index ``floor(10⁶ · (24·Σn_h² − N²) / N²)`` — 0 for perfectly
    uniform traffic, 23·10⁶ for a single-hour spike; the variance
    numerator ``24·Σn² − N²`` is the exact integer form (no means, no
    doubles), carried in DECIMAL(38,0)/HUGEINT since Σn² passes the
    bigint ceiling once hourly counts reach ~6e8.

    Scale: one keyed agg to the (key, hour) grid — bounded at
    24·|keys| — then two tiny aggs and a peak-row join on that grid.
    Nothing after the first agg grows with the corpus.
    """
    from ..functions import e6_floor_ratio

    hr = F.expr(f"CAST((unix_seconds(`{ts_col}`) div 3600) % 24 AS BIGINT)")
    grid = events.groupBy(
        F.col(key_col).alias("_k"), hr.alias("_h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    agg = grid.groupBy("_k").agg(
        F.sum("_n").cast("bigint").alias("_total"),
        F.max("_n").cast("bigint").alias("_peak"),
        (
            F.lit(24).cast("decimal(38,0)")
            * F.sum(F.col("_n").cast("decimal(38,0)") * F.col("_n"))
        ).cast("decimal(38,0)").alias("_sq24"),
    )
    peak_hr = (
        grid.join(agg, "_k")
        .where(F.col("_n") == F.col("_peak"))
        .groupBy("_k")
        .agg(F.min("_h").cast("bigint").alias("peak_hour"))
    )
    staged = agg.join(peak_hr, "_k").withColumn(
        "_var_num",
        (
            F.col("_sq24")
            - F.col("_total").cast("decimal(38,0)") * F.col("_total")
        ).cast("decimal(38,0)"),
    )
    disp = F.expr(
        "CAST((_var_num * 1000000) div "
        "(CAST(_total AS DECIMAL(38,0)) * _total) AS BIGINT)"
    )
    return staged.select(
        F.col("_k").alias(key_col),
        F.col("_total").alias("n_events"),
        "peak_hour",
        e6_floor_ratio(F.col("_peak"), F.col("_total")).alias(
            "peak_share_e6"
        ),
        disp.alias("dispersion_e6"),
    )


def topk_with_others(
    totals: DataFrame,
    group_col: str,
    entity_col: str,
    value_col: str,
    k: int = 3,
    others_label: str = "OTHERS",
) -> DataFrame:
    """Top-k leaderboard with an exact OTHERS rollup — the BI report
    shape every revenue review uses: per group, the k largest
    entities by value (ties broken by the entity key, deterministic)
    plus ONE remainder row carrying the exact sum and count of
    everything below the cut, so the group total always ties out.

    Input is the ALREADY-REDUCED (group, entity, value) frame — the
    fact-table reduce is the caller's keyed agg; the rank window here
    runs over the reduced set. Output per group: k rows
    ``(group, rank 1..k, entity as string, value, n_entities=1)`` and,
    when anything remains, ``(group, k+1, OTHERS, Σ rest, count rest)``.

    Scale: one window (rank over the reduced set, partitioned by
    group) + one keyed agg for the remainder — both on the group key.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).desc(), F.col(entity_col)
    )
    ranked = totals.withColumn("_rk", F.row_number().over(w))
    top = ranked.where(F.col("_rk") <= k).select(
        F.col(group_col),
        F.col("_rk").cast("bigint").alias("rank"),
        F.col(entity_col).cast("string").alias("entity"),
        F.col(value_col).cast("bigint").alias("value_cents"),
        F.lit(1).cast("bigint").alias("n_entities"),
    )
    rest = (
        ranked.where(F.col("_rk") > k)
        .groupBy(group_col)
        .agg(
            F.sum(F.col(value_col).cast("bigint")).alias("value_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_entities"),
        )
        .select(
            F.col(group_col),
            F.lit(k + 1).cast("bigint").alias("rank"),
            F.lit(others_label).alias("entity"),
            F.col("value_cents"),
            F.col("n_entities"),
        )
    )
    return top.unionByName(rest)


def repeat_purchase_rate(
    purchases: DataFrame,
    entity_col: str,
    item_col: str,
    date_col: str,
    group_col: str,
    within_days: int = 30,
) -> DataFrame:
    """Repeat-purchase rate — the replenishment signal merchandisers
    rank categories by: of the (customer, item) pairs with any
    purchase, how many bought the SAME item again within
    ``within_days``? A pair counts once no matter how many quick
    repeats it has (the auditor counts REPEATERS, not repeats).

    Per group (brand/category): pairs observed, pairs with a repeat
    within the window, and the exact rate at e6.

    Scale: one lag window on the (entity, item) composite key
    (per-pair fan = that pair's purchase history, bounded by behavior
    not corpus) + two keyed aggs. The caller supplies the joined
    (entity, item, date, group) purchase lines.
    """
    from ..functions import e6_floor_ratio

    d = purchases.select(
        F.col(entity_col).alias("_e"),
        F.col(item_col).alias("_i"),
        F.col(group_col).alias("_g"),
        F.to_date(F.col(date_col)).alias("_d"),
    )
    w = Window.partitionBy("_e", "_i").orderBy("_d")
    flagged = d.withColumn(
        "_rep",
        F.when(
            F.datediff(F.col("_d"), F.lag("_d").over(w))
            <= F.lit(int(within_days)),
            1,
        ).otherwise(0),
    )
    pairs = flagged.groupBy("_e", "_i", "_g").agg(
        F.max("_rep").alias("_has_rep")
    )
    g = pairs.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("_has_rep").cast("bigint").alias("n_repeat_pairs"),
    )
    return g.withColumn(
        "repeat_rate_e6",
        e6_floor_ratio(F.col("n_repeat_pairs"), F.col("n_pairs")),
    )
