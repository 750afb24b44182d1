"""Exact distributed quantiles (discrete / type-1).

``approxQuantile`` / ``percentile_approx`` are sketches — fine for
monitoring, wrong for anything that must reproduce (dataset cut
thresholds, dedup length caps, SLA percentiles). Spark's exact
``percentile`` pulls every value into one aggregation buffer; a global
``row_number`` sort is single-partition. Neither survives 100 TB.

The scalable exact form factors through the value-count table:

1. ``groupBy(value).count()`` — one shuffle; output is bounded by the
   number of DISTINCT values, which for quantile-bearing columns
   (quantities, lengths, scores, prices) is orders of magnitude below
   the row count. (For a continuous column with ~all-distinct values,
   quantize first — that decision is the caller's, not hidden here.)
2. An exact running count over the value order via the two-phase scan
   (``operators.prefix.prefix_sum`` — range partition, local cumsum,
   broadcast offsets). No single-partition stage anywhere.
3. The q-quantile is the smallest value whose cumulative fraction
   reaches q: ``min(value) where cum/n >= q`` — a broadcast join of the
   tiny quantile spec against the count table.

Semantics match DuckDB's ``quantile_disc`` exactly, INCLUDING the
floating-point edge: both engines evaluate "rank i reaches quantile q"
as the IEEE-double comparison ``i/n >= q``, so e.g. q=0.07 over n=100
picks rank 7 (0.07*100 rounds above 7.0 in binary, but 7/100 >= 0.07
compares true — verified against DuckDB in tests/test_quantiles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.prefix import prefix_sum


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    q_col: str = "q",
    out_col: str = "value",
) -> DataFrame:
    """Exact discrete quantiles of ``value_col`` at each q in ``qs``.

    Returns one row per q: ``(q_col double, out_col <value type>)`` —
    the smallest value whose cumulative count fraction >= q (type-1 /
    ``quantile_disc`` semantics; q=0 → min, q=1 → max). Nulls in
    ``value_col`` are excluded, matching SQL aggregate semantics.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    vals = df.where(F.col(value_col).isNotNull())
    counts = vals.groupBy(value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    cum = prefix_sum(
        counts, order_by=[F.col(value_col)], value_col="_cnt", out_col="_cum"
    )
    # total = max cumulative count, read from prefix_sum's OUTPUT: its
    # localCheckpoint already materialized the count table, so this
    # aggregate reuses the checkpoint instead of re-running the input
    # scan + groupBy a second time (counts.agg would)
    total = cum.agg(F.max("_cum").cast("bigint").alias("_n"))
    spark = df.sparkSession
    spec = spark.createDataFrame([(float(q),) for q in qs], f"{q_col} double")
    # broadcast (spec × 1-row total) against the bounded count table;
    # IEEE-double cum/n >= q is the exact quantile_disc rank rule.
    hit = cum.crossJoin(F.broadcast(spec.crossJoin(total))).where(
        (F.col("_cum").cast("double") / F.col("_n").cast("double")) >= F.col(q_col)
    )
    return hit.groupBy(q_col).agg(F.min(value_col).alias(out_col))


def exact_quantiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    q_col: str = "q",
    out_col: str = "value",
) -> DataFrame:
    """Per-group exact discrete quantiles — ``exact_quantiles`` keyed by
    ``group_col``; one row per (group, q).

    The keyed form needs no two-phase scan: the running count is a
    window PARTITIONED BY the group, so each group's (bounded,
    distinct-value-sized) count table stays on one partition while
    groups spread across the cluster — the scalable shape as long as a
    single group's distinct values fit a partition (quantize first for
    continuous columns, same contract as the global form).

    Plan: groupBy(group, value) count → group-keyed window (cum +
    group total) → explode the q spec → min(value) per (group, q).
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    vals = df.where(F.col(value_col).isNotNull())
    counts = vals.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = counts.withColumn("_cum", F.sum("_cnt").over(w_cum)).withColumn(
        "_n", F.sum("_cnt").over(w_all)
    )
    hit = cum.withColumn(
        q_col, F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).where(
        (F.col("_cum").cast("double") / F.col("_n").cast("double")) >= F.col(q_col)
    )
    return hit.groupBy(group_col, q_col).agg(F.min(value_col).alias(out_col))


def histogram_quantile_sketch(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    n_buckets: int = 256,
    q_col: str = "q",
    est_col: str = "est",
    bound_col: str = "bound",
) -> DataFrame:
    """Mergeable equi-width histogram quantile ESTIMATE with a
    certified error bound — the quantile member of the portable sketch
    family (CMS = counts, HLL = cardinality, Bloom = membership,
    occupancy = coverage, this = order statistics).

    Exact quantiles (``exact_quantiles``) need the distinct-value
    table; when even that is too wide — or when shards must compute
    independently and merge — the production shape is a fixed-size
    histogram: two corpus passes, both map-side combinable aggregates
    ((1) integer min/max, (2) ``n_buckets`` bucket counts), and shard
    sketches merge by elementwise count sum + min/min + max/max.

    All arithmetic is exact integer, so the sketch is bit-portable:
    bucket width ``w = ceil((max-min+1)/B)``, bucket ``(v - min) // w``,
    estimate = the LOWER EDGE ``min + b*w`` of the smallest bucket
    whose cumulative count reaches q (the same IEEE ``cum/n >= q``
    disc-rank rule as ``exact_quantiles``), and the true q-quantile
    provably lies inside that bucket — ``|est - exact| < w`` by
    construction, reported per row as ``bound_col``.

    Requires an integer column (quantize first — the
    ``exact_quantiles`` contract). Returns one row per q:
    ``(q double, est bigint, bound bigint)``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("bigint").alias("_v")
    )
    mm = vals.agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    ).withColumn(
        "_w",
        # exact integer ceil((hi-lo+1)/B); bigint `div`, never a
        # double round-trip (exactness past 2^53)
        F.expr(f"(_hi - _lo + {n_buckets}) div {n_buckets}").cast("bigint"),
    )
    bucketed = (
        vals.crossJoin(F.broadcast(mm))
        .select(F.expr("(_v - _lo) div _w").cast("bigint").alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    cum = prefix_sum(bucketed, order_by=[F.col("_b")], value_col="_cnt", out_col="_cum")
    spark = df.sparkSession
    spec = spark.createDataFrame([(float(q),) for q in qs], f"{q_col} double")
    hit = cum.crossJoin(F.broadcast(spec.crossJoin(mm))).where(
        (F.col("_cum").cast("double") / F.col("_n").cast("double")) >= F.col(q_col)
    )
    return hit.groupBy(q_col).agg(
        (F.first("_lo") + F.min("_b") * F.first("_w"))
        .cast("bigint")
        .alias(est_col),
        F.first("_w").cast("bigint").alias(bound_col),
    )


def histogram_quantile_sketch_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    n_buckets: int = 256,
    q_col: str = "q",
    est_col: str = "est",
    bound_col: str = "bound",
) -> DataFrame:
    """Per-group ``histogram_quantile_sketch`` — fixed memory per group
    (B counter rows) regardless of the group's distinct-value count,
    which is what ``exact_quantiles_by`` cannot promise for continuous
    columns. Each group gets its own integer grid (min/max/width), so
    bounds are as tight as that group's range allows.

    Plan: one groupBy for per-group (lo, hi, n) -> broadcast back ->
    one groupBy for (group, bucket) counts -> group-keyed cumulative
    window over <= ``n_buckets`` rows per group (bounded by
    construction, the ``exact_quantiles_by`` precedent) -> explode the
    q spec -> min-bucket per (group, q). One row per (group, q):
    ``(group, q double, est bigint, bound bigint)``.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql import Window

    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col), F.col(value_col).cast("bigint").alias("_v")
    )
    mm = vals.groupBy(group_col).agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    ).withColumn(
        "_w",
        F.expr(f"(_hi - _lo + {n_buckets}) div {n_buckets}").cast("bigint"),
    )
    # null-safe grid join: a NULL group (unattributed source) is a real
    # group and must not be silently dropped by the equi-join
    mmr = mm.withColumnRenamed(group_col, "_g")
    bucketed = (
        vals.join(
            F.broadcast(mmr), F.col(group_col).eqNullSafe(F.col("_g"))
        )
        .select(
            group_col,
            F.expr("(_v - _lo) div _w").cast("bigint").alias("_b"),
        )
        .groupBy(group_col, "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        bucketed.withColumn("_cum", F.sum("_cnt").over(w_cum))
        .join(F.broadcast(mmr), F.col(group_col).eqNullSafe(F.col("_g")))
        .drop("_g")
    )
    hit = cum.withColumn(
        q_col, F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).where(
        (F.col("_cum").cast("double") / F.col("_n").cast("double")) >= F.col(q_col)
    )
    return hit.groupBy(group_col, q_col).agg(
        (F.first("_lo") + F.min("_b") * F.first("_w"))
        .cast("bigint")
        .alias(est_col),
        F.first("_w").cast("bigint").alias(bound_col),
    )


def cdf_transform(
    df: DataFrame,
    value_col: str,
    out_col: str = "cdf_e6",
) -> DataFrame:
    """Exact empirical-CDF (quantile-normalization) transform: every
    row gains ``out_col`` = ⌊10⁶ · P(X ≤ x)⌋ — the rank-based feature
    scaling ML pipelines use when magnitudes are meaningless but order
    matters (and the exact form of sklearn's QuantileTransformer).

    Factors through the value-count table like ``exact_quantiles``:
    distinct-value counts (one shuffle, bounded by #distinct), exact
    running count via the two-phase ``prefix_sum`` scan (no
    single-partition stage), then ONE equi-join back on the value —
    never a window over raw rows. Exact integer e6 arithmetic,
    engine-replayable. Quantize continuous columns first (the
    ``exact_quantiles`` contract).
    """
    vals = df.where(F.col(value_col).isNotNull())
    counts = vals.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    cum = prefix_sum(
        counts, order_by=[F.col("_v")], value_col="_c", out_col="_cum"
    )
    tot = vals.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    cdf = cum.join(F.broadcast(tot)).select(
        "_v",
        F.expr("(_cum * 1000000) div _n").cast("bigint").alias(out_col),
    )
    return df.join(
        cdf, F.col(value_col).eqNullSafe(F.col("_v")), "left"
    ).drop("_v")


def gini_concentration(df: DataFrame, value_col: str) -> DataFrame:
    """Exact Gini coefficient of a non-negative integer column — the
    concentration audit for token/byte budgets (how unevenly is the
    corpus spread over documents/sources?). Returns ONE row:
    ``(n_rows, n_distinct, gini_e6)`` with

        gini_e6 = floor((2·S − (n+1)·T) · 1e6 / (n·T))

    where ``S = Σ rank_i·x_i`` over values in ascending order and
    ``T = Σ x_i``. Ties are exact: a block of ``c`` equal values ``v``
    starting after cumulative count ``p`` contributes
    ``v·(c·p + c·(c+1)/2)`` — the closed form of the rank sum, so no
    per-row ranking is ever materialized.

    Scale: the same value-count-table discipline as
    ``cdf_transform`` — one keyed count (map-side combinable), a
    prefix scan over the BOUNDED distinct-value table, and a 1-row
    aggregate. S and the products run in decimal(38,0) (S can reach
    ~n·v_max·n — far past int64 on trillion-row corpora); the output
    ratio is an integer ``div``. Requires x ≥ 0 (Gini's domain);
    raises nothing at runtime — negative inputs are the caller's
    contract violation and simply produce an out-of-range ratio.
    """
    vals = df.where(F.col(value_col).isNotNull())
    counts = vals.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    cum = prefix_sum(counts, order_by=[F.col("_v")], value_col="_c", out_col="_cum")
    # DOUBLED rank-sum closed form per tie block (p = cum − c, the
    # count BEFORE the block): 2·Σrank·v over the block is
    # v·(2·c·p + c·(c+1)) — staying in the 2S form end-to-end avoids
    # any /2 intermediate (c·(c+1) is decimal; a bigint half would
    # overflow once a single value repeats ~4e9 times)
    contrib = cum.select(
        (
            F.col("_v").cast("decimal(38,0)")
            * (
                F.lit(2)
                * F.col("_c").cast("decimal(38,0)")
                * (F.col("_cum") - F.col("_c"))
                + F.col("_c").cast("decimal(38,0)") * (F.col("_c") + 1)
            )
        ).alias("_s2"),
        (F.col("_v").cast("decimal(38,0)") * F.col("_c")).alias("_t"),
        F.col("_c"),
    )
    return contrib.agg(
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.expr(
            "CAST((CAST(sum(_s2) AS DECIMAL(38,0))"
            " - (sum(_c) + 1) * CAST(sum(_t) AS DECIMAL(38,0))) * 1000000"
            " div (sum(_c) * CAST(sum(_t) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_e6"),
    )


def mad_outlier_screen(
    df: DataFrame, value_col: str, k: int = 3
) -> DataFrame:
    """Robust outlier screen via the Median Absolute Deviation: one row

    ``(n, median, mad, lo_fence, hi_fence, n_low, n_high)``

    with ``fences = median ± k·MAD`` (integer k — the float 0.6745
    normal-consistency constant is deliberately NOT applied: the screen
    stays exact-integer and engine-replayable; calibrate k instead).
    MAD is the median of |x − median|, so one wild value cannot drag
    the fence the way a stddev screen lets it (50% breakdown point vs
    0 for mean ± kσ).

    ONE corpus scan total: the value-count table carries everything —
    the median (weighted rank rule on the count prefix), the MAD
    (deviation values |v − m| are a FUNCTION of the distinct values,
    so the deviation count table is a regroup of the value counts,
    never a second raw-row pass), and the fence-breach counts (sums of
    counts beyond the fences). The integer ``2·cum ≥ n`` form of the
    q = 1/2 rank rule matches ``quantile_disc`` exactly with no float
    edge. The two prefix scans run over BOUNDED distinct-value tables.
    (The original two-corpus-pass composition measured 7.9 s at sf0.1
    — the rework amortizes to the one scan it mathematically needs.)
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    vals = df.where(F.col(value_col).isNotNull())
    counts = vals.groupBy(F.col(value_col).alias("_v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    cum = prefix_sum(counts, order_by=[F.col("_v")], value_col="_c", out_col="_cum")
    tot = cum.agg(F.max("_cum").cast("bigint").alias("_n"))
    med = (
        cum.join(F.broadcast(tot))
        .where(2 * F.col("_cum") >= F.col("_n"))
        .agg(F.min("_v").cast("bigint").alias("_med"))
    )
    # deviation counts from the COUNT TABLE (|v-m| regroups distinct
    # values; two v can share a deviation, so re-aggregate)
    devc = (
        cum.join(F.broadcast(med))
        .groupBy(F.abs(F.col("_v") - F.col("_med")).alias("_d"))
        .agg(F.sum("_c").cast("bigint").alias("_c"))
    )
    dcum = prefix_sum(devc, order_by=[F.col("_d")], value_col="_c", out_col="_cum")
    mad = (
        dcum.join(F.broadcast(tot))
        .where(2 * F.col("_cum") >= F.col("_n"))
        .agg(F.min("_d").cast("bigint").alias("_mad"))
    )
    return (
        cum.join(F.broadcast(med))
        .join(F.broadcast(mad))
        .join(F.broadcast(tot))
        .agg(
            F.first("_n").alias("n"),
            F.first("_med").alias("median"),
            F.first("_mad").alias("mad"),
            (F.first("_med") - k * F.first("_mad")).cast("bigint").alias("lo_fence"),
            (F.first("_med") + k * F.first("_mad")).cast("bigint").alias("hi_fence"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_v") < F.col("_med") - k * F.col("_mad"),
                        F.col("_c"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_low"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_v") > F.col("_med") + k * F.col("_mad"),
                        F.col("_c"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_high"),
        )
    )


def weighted_median(df: DataFrame, value_col: str, weight_col: str) -> DataFrame:
    """Exact weighted discrete median: the smallest value whose
    cumulative WEIGHT fraction reaches 1/2 (type-1 semantics on the
    weight measure — the cost-weighted p50 a spend analysis needs,
    where a big invoice should pull the median more than a small one).

    Same scalable shape as :func:`exact_quantiles`: weight-sum per
    distinct value (one keyed aggregation), two-phase prefix scan over
    the bounded value table, rank rule ``2·cum ≥ total`` evaluated in
    exact integers (no float division at all — the q=1/2 special case
    admits it). Rows with null or non-positive weight are excluded.

    Returns one row: ``(n_rows, total_weight, weighted_median)``.
    """
    vals = df.where(
        F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    )
    counts = vals.groupBy(F.col(value_col).alias("_v")).agg(
        F.sum(F.col(weight_col)).cast("bigint").alias("_w"),
        F.count(F.lit(1)).cast("bigint").alias("_c"),
    )
    cum = prefix_sum(counts, order_by=[F.col("_v")], value_col="_w", out_col="_cum")
    tot = cum.agg(
        F.max("_cum").cast("bigint").alias("_tw"),
        F.sum("_c").cast("bigint").alias("_n"),
    )
    hit = cum.join(F.broadcast(tot)).where(2 * F.col("_cum") >= F.col("_tw"))
    return hit.agg(
        F.first("_n").alias("n_rows"),
        F.first("_tw").alias("total_weight"),
        F.min("_v").cast("bigint").alias("weighted_median"),
    )
