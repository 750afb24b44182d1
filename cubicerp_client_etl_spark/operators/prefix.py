"""Distributed exact prefix sum (scan) — the scalable replacement for
a single-partition global ``SUM() OVER (ORDER BY ...)`` window.

A global ordered cumsum is the one aggregate Catalyst cannot
parallelize as written: ``Window.orderBy(...)`` with no partition key
moves EVERY row to one partition (the WindowExec warning — a
scale-killer past dimension-table sizes). The classic two-phase scan
fixes it:

1. ``repartitionByRange`` on the scan order — each partition holds a
   contiguous, ordered slice (reservoir-sampled boundaries absorb
   skew);
2. a per-partition running sum (window keyed on the partition id — the
   shuffle is bounded and preserves slice locality);
3. partition totals (one tiny aggregate, rows = #partitions) turned
   into per-partition OFFSETS by a cumsum over that bounded table,
   broadcast back and added.

Exactness: keep the value in DECIMAL through every step — decimal
addition is associative under any grouping, so the result is
bit-identical to the single-partition form and to the oracle's global
window. Requires a TOTAL order (pass tie-breaker columns), otherwise
boundary placement of tied rows changes their cumulative values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from cubicerp_client_etl_spark.checkpointing import pin_eager

_RESERVED = ("_pid", "_local", "_off", "_ptot")


def _guard_columns(df: DataFrame, out_col: str) -> None:
    clash = [c for c in (*_RESERVED, out_col) if c in df.columns and c != out_col]
    if clash:
        raise ValueError(
            f"prefix scan temporaries {clash} collide with input columns; "
            "rename them first"
        )


def prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Exact running total of ``value_col`` in ``order_by`` order (must
    be a total order), computed with the two-phase distributed scan.
    Adds ``out_col``; preserves all input columns.

    The ``ranged`` frame feeds TWO subtrees (per-slice running sums and
    per-pid totals). ``repartitionByRange`` samples its boundaries with
    an RDD-id-derived seed, so two *independent* evaluations of the
    exchange could assign different ``_pid``s and add offsets to the
    wrong slices — a silent wrong answer. ``localCheckpoint`` (eager)
    materializes the partitioning exactly once, so both branches read
    the same pid assignment regardless of exchange-reuse behavior
    (``spark.sql.exchange.reuse`` off, canonicalization misses, plan
    changes). Costs one materialization of the input into executor
    storage — the price of an exact scan consumed twice. Checkpoint
    blocks are also what keeps re-running the operator deterministic —
    see tests/test_plan_posture.py.
    """
    _guard_columns(df, out_col)
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin_eager)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum(value_col).over(w_local))
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_ptot"))
    # the offsets window runs over #partitions rows — bounded, single
    # partition is fine here by construction
    w_off = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    vtype = dict(df.dtypes)[value_col]
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ptot").over(w_off), F.lit(0).cast(vtype)).alias("_off"),
    )
    joined = local.join(F.broadcast(offsets), "_pid")
    return joined.withColumn(out_col, F.col("_local") + F.col("_off")).drop(
        "_pid", "_local", "_off"
    )


def prefix_sum_multi(
    df: DataFrame,
    order_by: list[Column],
    value_cols: list[str],
    out_cols: list[str],
) -> DataFrame:
    """Exact running totals of SEVERAL value columns in one two-phase
    scan — same machinery as :func:`prefix_sum`, but the ranged
    checkpoint, the per-slice window, and the broadcast offset join are
    paid ONCE for all columns instead of once per column. Use when a
    query needs e.g. both a cumulative value and a cumulative count
    over the same total order (rank = prefix sum of ones), as
    ``quality.abc_classification`` does.
    """
    if len(value_cols) != len(out_cols):
        raise ValueError("value_cols and out_cols must pair up")
    for out_col in out_cols:
        _guard_columns(df, out_col)
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin_eager)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged
    for v, o in zip(value_cols, out_cols):
        local = local.withColumn(f"_local_{o}", F.sum(v).over(w_local))
    totals = ranged.groupBy("_pid").agg(
        *[F.sum(v).alias(f"_ptot_{o}") for v, o in zip(value_cols, out_cols)]
    )
    # offsets window runs over #partitions rows — bounded by construction
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    dtypes = dict(df.dtypes)
    offsets = totals.select(
        "_pid",
        *[
            F.coalesce(
                F.sum(f"_ptot_{o}").over(w_off), F.lit(0).cast(dtypes[v])
            ).alias(f"_off_{o}")
            for v, o in zip(value_cols, out_cols)
        ],
    )
    joined = local.join(F.broadcast(offsets), "_pid")
    for o in out_cols:
        joined = joined.withColumn(o, F.col(f"_local_{o}") + F.col(f"_off_{o}"))
    return joined.drop(
        "_pid", *[f"_local_{o}" for o in out_cols], *[f"_off_{o}" for o in out_cols]
    )


def prefix_sum_by(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Exact running total of ``value_col`` per ``keys`` group in
    ``order_by`` order — the KEYED two-phase scan. Adds ``out_col``;
    preserves all input columns.

    The naive form — ``SUM() OVER (PARTITION BY keys ORDER BY ...)`` —
    funnels each key's entire row set through one task. For a
    low-cardinality key (a training mixture has O(10) domains) that is
    the same single-partition WindowExec scale-killer the module
    docstring describes, just sharded ten ways: at 100 TB each domain
    still pushes billions of rows through one partition. This keyed
    generalization keeps every stage bounded:

    1. ``repartitionByRange(keys + order)`` — each physical partition
       holds a contiguous ordered slice; a hot key simply spans many
       partitions. ``localCheckpoint`` pins the sampled boundaries so
       both consuming subtrees see one pid assignment (see
       ``prefix_sum``).
    2. per-(key, pid) running sums — the window is partitioned by
       ``keys + _pid``, so no task sees more than one partition's slice
       of one key.
    3. per-(key, pid) totals → per-key offsets. Because ranges are
       contiguous, each key occupies a contiguous pid span, so the
       totals table has at most ``#partitions + #keys − 1`` rows —
       bounded regardless of data size; the offsets window over it is
       keyed and tiny, and the join back is a broadcast.

    Key columns may contain NULL: windows/groupBy treat NULL as a
    group, and the offset join is null-safe, so NULL-keyed rows get a
    running sum like any other group (consistent with the SQL window
    the oracle replays). Exactness follows ``prefix_sum``: keep
    decimals decimal, pass a total order in ``order_by``.
    """
    _guard_columns(df, out_col)
    key_cols = [F.col(k) for k in keys]
    ranged = (
        df.repartitionByRange(*key_cols, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin_eager)
    )
    w_local = (
        Window.partitionBy(*keys, "_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum(value_col).over(w_local))
    totals = ranged.groupBy(*keys, "_pid").agg(F.sum(value_col).alias("_ptot"))
    # offsets: keyed window over the bounded totals table (≤ #partitions
    # + #keys − 1 rows by range-contiguity) — never over raw rows
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vtype = dict(df.dtypes)[value_col]
    offsets = totals.select(
        *keys,
        "_pid",
        F.coalesce(F.sum("_ptot").over(w_off), F.lit(0).cast(vtype)).alias("_off"),
    )
    for k in keys:
        offsets = offsets.withColumnRenamed(k, f"_k_{k}")
    offsets = offsets.withColumnRenamed("_pid", "_kpid")
    cond = local["_pid"] == offsets["_kpid"]
    for k in keys:
        # null-safe: NULL keys form a group like any other
        cond = cond & local[k].eqNullSafe(offsets[f"_k_{k}"])
    joined = local.join(F.broadcast(offsets), cond)
    return (
        joined.withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off", "_kpid", *[f"_k_{k}" for k in keys])
    )


def prefix_min_strict(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "prefix_min",
) -> DataFrame:
    """Running MIN of ``value_col`` over the STRICTLY-PRECEDING rows in
    ``order_by`` order (a total order) — the scan a 2-D skyline/Pareto
    frontier needs — via the same two-phase distributed form as
    :func:`prefix_sum` (a global ``MIN() OVER (ORDER BY …)`` window is
    the identical single-partition scale-killer). NULL where no row
    precedes (the global first row).

    Phase 1: range-repartition on the order and run the strict
    rows-frame min per slice; phase 2: per-slice TOTAL mins → a
    strict cumulative min over the bounded partition table, broadcast
    back; the answer is ``least(slice-local strict min, min of all
    earlier slices)``. MIN is associative/commutative, so the split
    is exact for any dtype with an order (no decimal-only caveat).
    Same ``localCheckpoint`` determinism discipline as prefix_sum.
    """
    _guard_columns(df, out_col)
    ranged = (
        df.repartitionByRange(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .transform(pin_eager)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_local", F.min(value_col).over(w_local))
    totals = ranged.groupBy("_pid").agg(F.min(value_col).alias("_ptot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.min("_ptot").over(w_off).alias("_off")
    )
    joined = local.join(F.broadcast(offsets), "_pid")
    return joined.withColumn(
        out_col, F.least(F.col("_local"), F.col("_off"))
    ).drop("_pid", "_local", "_off")
