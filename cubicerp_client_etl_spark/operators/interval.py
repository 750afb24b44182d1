"""Binned interval-overlap join — big×big interval joins without a
range-condition nested loop.

Spark turns a pure inequality join into BroadcastNestedLoopJoin (fine
when one side is a handful of bands — see the q122 band join) or, for
two large sides, a cartesian — quadratic and DOA at scale. The standard
fix factors the range predicate through a bin equi-join:

1. quantize every interval to the ``bin_width`` grid and EXPLODE it
   over the bins it covers — an interval touching b bins emits b rows
   (choose ``bin_width`` near the typical interval length so b stays
   O(1));
2. equi-join on ``(keys..., bin)`` — hash-shuffle-able, AQE-skew-safe,
   exactly the join shape Catalyst optimizes well;
3. re-check the EXACT overlap predicate (bins overfetch neighbors);
4. keep each qualifying pair exactly once WITHOUT a distinct: emit
   only in the first bin both intervals share,
   ``bin == greatest(l_start div w, r_start div w)`` — every
   overlapping pair shares that bin by construction, so no dedup
   shuffle is needed.

Overlap semantics are CLOSED-interval: [ls,le] meets [rs,re] iff
``ls <= re AND rs <= le``. Bounds are EXPECTED to be non-negative
integers with start <= end (epoch seconds/micros both fit); this is a
documented contract, not a runtime check — ``div`` truncates toward
zero, so negative bounds still join correctly but bin 0 spans double
width (worse selectivity), and an inverted interval feeds
``F.sequence`` a descending range and produces garbage bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _binned(df: DataFrame, start: str, end: str, width: int) -> DataFrame:
    return df.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {width}"), F.expr(f"{end} div {width}")
            )
        ),
    )


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """All (left, right) pairs with equal ``keys`` whose closed
    intervals overlap, each pair exactly once. Column names of the two
    sides must be disjoint apart from ``keys`` (rename before calling).

    One hash shuffle per side on ``(keys, bin)``; no cartesian, no
    distinct. ``bin_width`` trades explode fan-out (wide bins → few
    rows per interval) against join selectivity (narrow bins → fewer
    false candidates); set it near the typical interval length.
    """
    if bin_width < 1:
        raise ValueError("bin_width must be >= 1")
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    # _binned would silently overwrite (and the tail drop() discard) a
    # caller's _bin on EITHER side — the cross-side check above can't
    # see a _bin that exists on only one input (ADVICE r5)
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError("'_bin' is reserved by binned_interval_join; rename it")
    lb = _binned(left, l_start, l_end, bin_width)
    rb = _binned(right, r_start, r_end, bin_width)
    joined = lb.join(rb, on=[*keys, "_bin"])
    first_shared = F.greatest(
        F.expr(f"{l_start} div {bin_width}"), F.expr(f"{r_start} div {bin_width}")
    )
    return joined.where(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (F.col("_bin") == first_shared)
    ).drop("_bin")


def overlap_audit(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Interval-overlap audit — the double-booking detector for any
    per-resource interval set (a supplier shipping two orders in
    overlapping windows, a machine double-scheduled, a consultant
    double-billed): per key, how many intervals START before some
    earlier interval has ENDED.

    Sweep-line in one window, exactly: order intervals by (start, id)
    and carry the RUNNING MAX of the ends of all PRIOR intervals; an
    interval overlaps its past iff ``start < max_prior_end``
    (half-open [start, end) semantics — touching endpoints do not
    overlap). Counting pairs would be quadratic; counting OVERLAPPING
    INTERVALS is linear and is what the auditor triages. Also
    reports each key's longest interval and the worst intrusion depth
    ``max(max_prior_end − start)`` in days.

    Output per key: ``(key, n_intervals, n_overlapping,
    overlap_share_e6, max_intrusion_days)``.

    Scale: ONE window (running max) + one keyed agg, both on the
    resource key; per-key fan is one resource's bookings. No join,
    no explode.
    """
    from ..functions import e6_floor_ratio

    d = intervals.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        F.to_date(F.col(start_col)).alias("_s"),
        F.to_date(F.col(end_col)).alias("_e"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_s", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = d.withColumn("_pmax", F.max("_e").over(w)).withColumn(
        "_ov",
        F.when(
            F.col("_pmax").isNotNull() & (F.col("_s") < F.col("_pmax")), 1
        ).otherwise(0),
    )
    agg = staged.groupBy(F.col("_k").alias(key_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("_ov").cast("bigint").alias("n_overlapping"),
        F.max(
            F.when(
                F.col("_ov") == 1, F.datediff(F.col("_pmax"), F.col("_s"))
            )
        )
        .cast("bigint")
        .alias("max_intrusion_days"),
    )
    return agg.withColumn(
        "overlap_share_e6",
        e6_floor_ratio(F.col("n_overlapping"), F.col("n_intervals")),
    )
