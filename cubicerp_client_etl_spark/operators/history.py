"""Change-history operators: SCD Type-2 interval build and CDC snapshot
diff (SURVEY §2.I extension).

The reference's reprocess modes (cubicerpetl/cubicerpetl.py:494-537)
implement upsert-style "latest state wins" loading; warehouse practice
additionally needs the two history-preserving shapes built here:

- ``scd2_intervals``: turn an append-only change log into slowly-
  changing-dimension type-2 validity intervals ([valid_from, valid_to),
  version, is_current) — one window pass per entity, no self-join.
- ``snapshot_diff``: given two keyed snapshots, classify every key as
  inserted / deleted / changed / unchanged — one full-outer join, the
  distributed form of table diff. This is what the reference's ledger
  recovery (cubicerpetl.py:658-671) approximates per-row over RPC.

Scale: both operators shuffle exactly once on the entity key. SCD2's
window needs no global sort — ordering is per-key within partitions.
At 100 TB the key (user/entity id) is high-cardinality and uniform, so
neither operator has a skew hazard; snapshot_diff's join benefits from
both sides being bucketed/pre-partitioned on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    changes: DataFrame,
    key: str,
    order_by: Sequence[str],
    attrs: Sequence[str],
) -> DataFrame:
    """Build SCD2 validity intervals from an append-only change log.

    Each change row opens a version valid from its own ordering point
    until the next change for the same key (NULL for the current one).
    ``order_by`` must be a deterministic total order per key (e.g.
    ``["ts", "event_id"]``) so versions are stable across engines.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    first_order = order_by[0]
    return changes.select(
        key,
        *attrs,
        F.col(first_order).alias("valid_from"),
        F.lead(first_order).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(first_order).over(w).isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: Sequence[str],
) -> DataFrame:
    """Classify keys across two snapshots: inserted/deleted/changed/
    unchanged, carrying both sides' compare columns.

    NULL-safe comparison (``eqNullSafe``) so a NULL→value transition
    counts as changed, not unchanged.
    """
    o = old.select(
        F.col(key).alias("old_key"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        F.col(key).alias("new_key"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    same: Column = F.lit(True)
    for c in compare:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    joined = o.join(n, F.col("old_key") == F.col("new_key"), "full_outer")
    return joined.select(
        F.coalesce(F.col("old_key"), F.col("new_key")).alias(key),
        F.when(F.col("old_key").isNull(), F.lit("inserted"))
        .when(F.col("new_key").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("change"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )


def hash_split(key: str, test_hex_prefix_below: str = "3") -> Column:
    """Deterministic, engine-portable train/test assignment.

    md5 of the key's decimal string rendering, first hex digit compared
    lexically — e.g. ``"3"`` sends 3/16 of keys to 'test'. Stable across
    runs, partitionings, and engines (md5 is bit-identical everywhere),
    which is what a reproducible training-data split needs; never use
    engine-native ``hash()``/``rand()`` for splits.
    """
    h = F.md5(F.col(key).cast("string"))
    return (
        F.when(F.substring(h, 1, 1) < test_hex_prefix_below, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str,
    order_by: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Apply a keyed changelog to a base snapshot — the MERGE /
    merge-on-read compaction shape (Delta `MERGE INTO`, Hudi snapshot
    read): for every key, the LATEST change (by ``order_by``, which
    must totally order changes within a key) wins:

    * latest op ``'D'``  → the key disappears from the result;
    * latest op ``'I'``/``'U'`` → the change's ``payload`` columns win
      (insert-if-absent and update collapse to the same rule once only
      the latest change matters);
    * no change for the key → the base row's ``payload`` survives.

    Output: ``(key, *payload, src)`` with ``src`` ∈ {'base','chg'}.
    This is the inverse of ``snapshot_diff`` (diff ∘ apply = the
    changelog's net effect) and completes the CDC family: SCD2 keeps
    all history, snapshot_diff derives a log, apply_changelog replays
    one.

    Scale: one window shuffle on the key over changes (compacts the log
    to ≤1 row/key BEFORE the join — never join the raw log), then one
    full-outer join also keyed on ``key``, so AQE can reuse the
    partitioning. High-cardinality uniform keys → no skew hazard;
    co-locate by bucketing both sides on ``key`` to drop the join
    exchange entirely.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_by])
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, op_col, *[F.col(c).alias(f"_chg_{c}") for c in payload])
    )
    joined = base.join(latest, key, "full_outer")
    kept = joined.filter(F.col(op_col).isNull() | (F.col(op_col) != F.lit("D")))
    return kept.select(
        key,
        *[
            F.when(F.col(op_col).isNotNull(), F.col(f"_chg_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
        F.when(F.col(op_col).isNotNull(), F.lit("chg"))
        .otherwise(F.lit("base"))
        .alias("src"),
    )


def gap_fill_daily(
    obs: DataFrame,
    key: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Time-series densification + forward fill: expand each key's
    sparse daily observations to a DENSE daily spine (every calendar
    day between the key's first and last observation) and carry the
    last observed value forward into the gaps — the resample/ffill
    step every balance/inventory/metric warehouse needs before
    window math (sparse rows make "value on day X" and trailing
    averages silently wrong).

    Input: one row per (key, day) — pre-aggregate duplicates away
    first. Output: ``(key, day_col, value_col, is_observed)`` dense per
    key.

    Scale: the spine is generated per key with ``sequence()`` (map-side
    flatMap off a tiny min/max aggregate — never a calendar cross
    join); the fill is one ``last(ignorenulls)`` running window per
    key. Shuffles: min/max agg + join + window, all keyed on ``key``
    (AQE reuses the partitioning). Span explosion is bounded by
    calendar days, not data volume.
    """
    from pyspark.sql import Window as W

    bounds = obs.groupBy(key).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    spine = bounds.select(
        key,
        F.explode(
            F.expr(f"sequence(_d0, _d1, interval 1 day)")
        ).alias(day_col),
    )
    joined = spine.join(obs, [key, day_col], "left")
    w = (
        W.partitionBy(key)
        .orderBy(day_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        key,
        day_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.col(value_col).isNotNull().alias("is_observed"),
    )


def running_balance_audit(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[Column],
    delta_col: str,
) -> DataFrame:
    """Stock-ledger running balance per key — the ERP inventory audit:
    walk each key's movements in ``order_cols`` order (must be a total
    order within keys), accumulate ``delta_col``, and report per key:

    ``(key, n_moves, total_in, total_out, final_balance, min_balance,
    n_breach_moves)``

    where ``n_breach_moves`` counts movements that left the balance
    negative (an outbound booked before its receipt — the oversell /
    phantom-stock signal the reference's reconciliation fields chase
    per-row, cubicerpetl.py:775-787) and ``min_balance`` is the worst
    excursion.

    Scale: ONE window pass partitioned by the stock key — at warehouse
    scale the key (part/SKU) is high-cardinality and grows with the
    business, so the window is prover-compliant; the rollup is the
    same keyed aggregate. No self-join, no driver state. Exact bigint
    deltas (quantize units/cents first).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = F.col(delta_col)
    bal = df.withColumn("_bal", F.sum(d).over(w))
    return bal.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.sum(F.when(d > 0, d).otherwise(0)).cast("bigint").alias("total_in"),
        F.sum(F.when(d < 0, -d).otherwise(0)).cast("bigint").alias("total_out"),
        F.sum(d).cast("bigint").alias("final_balance"),
        F.min("_bal").cast("bigint").alias("min_balance"),
        F.sum(F.when(F.col("_bal") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_breach_moves"),
    )


def as_known_at(
    df: DataFrame,
    key_col: str,
    ingest_col: str,
    as_of: Column,
    fields: Sequence[str],
) -> DataFrame:
    """Bitemporal read: reconstruct, per key, the LATEST version whose
    ``ingest_col`` (system/transaction time) is <= ``as_of`` — "what
    did we believe about this key at time T", the query a restatement
    audit or a point-in-time regulatory report needs. Keys with no
    version ingested by ``as_of`` yield no row (they were unknown).

    ``ingest_col`` must be a total order within keys (compose a
    version counter into the low bits when ingest timestamps can tie).
    Returns ``(key, known_ingest, <fields...>)`` where ``known_ingest``
    is the winning version's ingest key.

    Scale: one filter + one keyed max_by aggregation (map-side
    combinable) — never a window over the version history, never a
    per-key sort. The same call with ``as_of = lit(+inf)`` gives the
    final state; diffing the two IS the restatement audit (one
    equi-join on the key).
    """
    mask = F.when(F.col(ingest_col) <= as_of, F.col(ingest_col))
    filt = df.where(F.col(ingest_col) <= as_of)
    return filt.groupBy(key_col).agg(
        F.max(mask).cast("bigint").alias("known_ingest"),
        *[F.max_by(F.col(f), mask).alias(f) for f in fields],
    )


def fifo_lot_matching(
    inbound: DataFrame,
    outbound: DataFrame,
    key_col: str,
    in_order: Sequence[Column],
    out_order: Sequence[Column],
    in_qty: str,
    out_qty: str,
    in_carry: Sequence[str] = (),
    out_carry: Sequence[str] = (),
) -> DataFrame:
    """FIFO lot matching as an interval join of cumulative-quantity
    ranges — the set-based form of the sequential "consume the oldest
    lot first" walk, and the engine for FIFO cost-of-goods-sold:

    each inbound lot owns the unit range ``[cum_before, cum_after)``
    of its key's cumulative inbound quantity; each outbound demand
    owns the analogous range of cumulative OUTBOUND quantity; FIFO
    says demand units map to supply units IN ORDER, so the match
    quantity between a lot and a demand is exactly the OVERLAP LENGTH
    of their ranges. No loop, no recursion — two windows (one per
    side, partitioned by the high-cardinality stock key) and one
    equi-join on the key with a range-overlap residual, whose fan-out
    is bounded per key by lots+demands actually overlapping.

    Returns one row per (lot, demand) pair with positive overlap:
    ``(key_col, <in_carry...>, <out_carry...>, matched_qty)`` plus
    ``in_lo``/``out_lo`` (range starts — the audit columns that prove
    order). Unfilled demand (outbound beyond total inbound) simply has
    no supply range to overlap — callers detect it by comparing
    matched sums to demand (exactly the reconciliation the reference's
    ledger fields carry, cubicerpetl.py:775-787).

    Quantities must be positive integers (quantize units first).
    """
    w_in = Window.partitionBy(key_col).orderBy(*in_order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_out = Window.partitionBy(key_col).orderBy(*out_order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lots = inbound.select(
        F.col(key_col),
        *[F.col(c) for c in in_carry],
        (F.sum(in_qty).over(w_in) - F.col(in_qty)).alias("in_lo"),
        F.sum(in_qty).over(w_in).alias("_in_hi"),
    )
    demands = outbound.select(
        F.col(key_col).alias("_k2"),
        *[F.col(c) for c in out_carry],
        (F.sum(out_qty).over(w_out) - F.col(out_qty)).alias("out_lo"),
        F.sum(out_qty).over(w_out).alias("_out_hi"),
    )
    j = lots.join(
        demands,
        (lots[key_col] == demands["_k2"])
        & (F.col("in_lo") < F.col("_out_hi"))
        & (F.col("out_lo") < F.col("_in_hi")),
    )
    return j.select(
        key_col,
        *in_carry,
        *out_carry,
        "in_lo",
        "out_lo",
        (
            F.least(F.col("_in_hi"), F.col("_out_hi"))
            - F.greatest(F.col("in_lo"), F.col("out_lo"))
        )
        .cast("bigint")
        .alias("matched_qty"),
    )


def maintain_aggregate(
    summary: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    count_col: str,
    sum_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Incremental view maintenance for an ADDITIVE aggregate table:
    fold a changelog of row inserts ('I') and deletes ('D') into a
    pre-aggregated summary WITHOUT recomputing from the fact table —
    the nightly-rollup-to-streaming-rollup upgrade path, and the only
    shape that holds when the fact table is 100 TB and the delta is a
    million rows.

    ``summary`` has one row per key group with ``count_col`` and the
    additive ``sum_cols``; ``changes`` carries RAW rows with the same
    measure columns plus ``op_col`` ∈ {'I','D'}. The delta aggregate
    signs every measure (+1 insert, −1 delete), one full-outer join on
    the keys merges it in, and groups whose maintained count reaches 0
    DISAPPEAR (the invariant that keeps maintain ∘ maintain ≡
    recompute); a maintained count below 0 raises no error — it is the
    caller's over-delete and surfaces as a negative count rather than
    silent clamping (auditable, like the reference's ledger
    philosophy).

    Scale: ONE keyed aggregation over the (small) changelog + ONE
    equi-join against the summary — cost is O(|delta| + |touched
    groups|), independent of the fact-table size. Additive measures
    only (count/sum; min/max/distinct need re-aggregation of the
    group and are deliberately out of contract).
    """
    sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias("_dc"),
        *[
            F.sum(sign * F.col(c)).cast("bigint").alias(f"_d_{c}")
            for c in sum_cols
        ],
    )
    j = summary.join(delta, list(keys), "full_outer")
    maintained = j.select(
        *keys,
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("_dc"), F.lit(0))
        )
        .cast("bigint")
        .alias(count_col),
        *[
            (
                F.coalesce(F.col(c), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            )
            .cast("bigint")
            .alias(c)
            for c in sum_cols
        ],
    )
    return maintained.where(F.col(count_col) != 0)


def avco_inventory(
    moves: DataFrame,
    part_col: str,
    seq_col: str,
    qty_col: str,
    price_col: str,
) -> DataFrame:
    """Moving-average (AVCO) inventory valuation — the other standard
    costing method next to FIFO (:func:`fifo_lot_matching`): receipts
    re-average the unit cost, issues consume at the CURRENT average.
    Per part, in ``seq_col`` order, with integer state
    ``(onhand, value_cents)``:

    - receipt (qty > 0):  value += qty·price;  onhand += qty
    - issue  (qty < 0):   cogs = value·|qty| div onhand  (floor);
                          value −= cogs;  onhand −= |qty|

    Issue cost comes from TOTAL VALUE (never a stored average) so
    rounding never compounds: value_cents is exact at every step and
    the final average is ``value div onhand``.

    Unlike FIFO — which this module deliberately expresses as a
    set-based interval join because lot consumption ranges are
    order-reconstructible — AVCO is IRREDUCIBLY sequential: the floor
    division inside every issue makes each state a non-associative
    function of the previous one, so no prefix-sum trick recovers it.
    The honest distributed shape is therefore a per-part ordered walk
    in Arrow ``applyInPandas`` — grouped on a HASH BUCKET of the part
    (64-way), not the part itself: parts are independent, so each
    Arrow batch carries MANY parts' move lists sorted by (part, seq)
    and one Python pass walks them all, resetting state at part
    boundaries. Per-part grouping pays ~4 ms of pandas overhead per
    group (the ses_forecast measurement); bucketing amortizes it while
    each part's walk stays ordered. The DuckDB oracle replays the
    recurrence with a recursive CTE.

    Requires: first move per part is a receipt and issues never exceed
    on-hand (the caller's ledger contract — violations surface as
    negative onhand in the output, reported not masked).

    Returns one row per move: ``(part_col, seq_col, qty,
    onhand_after, value_cents_after, cogs_cents)`` (cogs 0 on
    receipts).
    """
    # `part long` is hardcoded in the output schema, so the key is cast
    # EXPLICITLY (integer-key contract, same as ses_forecast — a
    # string/decimal part id would otherwise fail in Arrow or null out
    # silently, ADVICE r10)
    part_type = dict(moves.dtypes).get(part_col, "")
    if part_type in ("string", "binary", "boolean") or part_type.startswith(
        ("array", "map", "struct", "decimal")
    ):
        raise TypeError(
            f"avco_inventory requires an integer {part_col!r} key "
            f"(got {part_type}); hash or dictionary-encode the key first"
        )
    src = moves.select(
        F.col(part_col).cast("long").alias("part"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(qty_col).cast("long").alias("qty"),
        F.col(price_col).cast("long").alias("price_cents"),
    ).withColumn("_b", F.pmod(F.xxhash64("part"), F.lit(64)))
    out_schema = (
        "part long, seq long, qty long, onhand_after long, "
        "value_cents_after long, cogs_cents long"
    )

    # no annotations on the walker: with `from __future__ import
    # annotations` stringified hints would need pandas importable at
    # MODULE scope for Spark's signature inspection (verify-skill gotcha)
    def walk(pdf):
        pdf = pdf.sort_values(["part", "seq"]).reset_index(drop=True)
        onhand = 0
        value = 0
        prev_part = None
        oh, val, cogs = [], [], []
        for pk, q, p in zip(pdf["part"], pdf["qty"], pdf["price_cents"]):
            if pk != prev_part:
                prev_part = pk
                onhand = 0
                value = 0
            q, p = int(q), int(p)
            if q >= 0:
                value += q * p
                onhand += q
                cogs.append(0)
            else:
                u = -q
                c = value * u // onhand if onhand else 0
                value -= c
                onhand -= u
                cogs.append(c)
            oh.append(onhand)
            val.append(value)
        pdf["onhand_after"] = oh
        pdf["value_cents_after"] = val
        pdf["cogs_cents"] = cogs
        return pdf[
            ["part", "seq", "qty", "onhand_after", "value_cents_after",
             "cogs_cents"]
        ]

    return (
        src.groupBy("_b")
        .applyInPandas(walk, schema=out_schema)
        .withColumnRenamed("part", part_col)
        .withColumnRenamed("seq", seq_col)
        .withColumnRenamed("qty", qty_col)
    )


def reorder_point(
    demand: DataFrame,
    part_col: str,
    day_col: str,
    qty_col: str,
    lead_days: int = 4,
    z_x2: int = 4,
) -> DataFrame:
    """Reorder point / safety stock per part — the inventory-planning
    closed form on exact integers:

        ROP = mean_daily · lead_days + (z · σ_daily · sqrt(lead_days))

    computed as ``mean·L + (z_x2 · std · isqrt(L)) div 2`` with
    ``z_x2 = 2·z`` (half-integer z levels without floats; default
    z = 2 ≈ 97.7% service). Statistics run over OBSERVED demand days
    (documented: zero-demand days are not imputed — imputing them
    needs the dense calendar per part, a deliberate non-goal here; the
    stats are per-active-day):

        mean = Σd div n
        var  = (n·Σd² − (Σd)²) div n²      (population, floored)
        std  = isqrt_exact(var)

    Products run in DECIMAL(38,0); the square root is the
    floor-corrected integer isqrt the oracles replay bit-for-bit.

    Returns one row per part: ``(part_col, n_days, sum_qty, mean_qty,
    var_qty, std_qty, reorder_point)``.

    Scale: one (part, day) aggregation then one part aggregation —
    both map-side combinable; nothing else.
    """
    import math

    from cubicerp_client_etl_spark.functions import isqrt_exact

    if lead_days < 1:
        raise ValueError("lead_days must be >= 1")
    sqrt_l = math.isqrt(lead_days)
    daily = demand.groupBy(
        F.col(part_col).alias("_p"), F.col(day_col).alias("_d")
    ).agg(F.sum(F.col(qty_col)).cast("decimal(38,0)").alias("_q"))
    agg = daily.groupBy("_p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("_q").cast("decimal(38,0)").alias("_sd"),
        F.sum(F.expr("_q * _q")).cast("decimal(38,0)").alias("_sdd"),
    )
    mean_q = F.expr("CAST(_sd div n_days AS BIGINT)")
    var_q = F.expr(
        "CAST((n_days * _sdd - _sd * _sd)"
        " div (CAST(n_days AS DECIMAL(38,0)) * n_days) AS BIGINT)"
    )
    staged = agg.select(
        F.col("_p").alias(part_col),
        "n_days",
        F.expr("CAST(_sd AS BIGINT)").alias("sum_qty"),
        mean_q.alias("mean_qty"),
        var_q.alias("var_qty"),
    ).withColumn("std_qty", isqrt_exact(F.col("var_qty")))
    rop = (
        F.col("mean_qty") * lead_days
        + F.expr(f"CAST(({z_x2} * std_qty * {sqrt_l}) div 2 AS BIGINT)")
    )
    return staged.withColumn("reorder_point", rop.cast("bigint"))


def inventory_turns(
    moves: DataFrame,
    part_col: str,
    seq_col: str,
    qty_col: str,
) -> DataFrame:
    """Inventory-turns datasheet per part from a signed move ledger
    (receipts > 0, issues < 0): total issued quantity against the
    AVERAGE post-move on-hand level,

        onhand_after_i = Σ_{j <= i} qty_j          (running balance)
        turns_e6       = issued_total · 1e6 · n_moves div Σ onhand_after

    — the classic turns ratio with the average carried as an exact
    (sum, count) pair instead of a float mean. Parts whose on-hand sum
    is 0 report NULL turns (never divide-by-zero).

    Fully SET-BASED (contrast AVCO's sequential walker: turns need no
    per-move cost state): one part-keyed ordered window for the
    running balance, one part-keyed aggregate. Survives any move count
    per part.

    Returns one row per part: ``(part_col, n_moves, issued_qty,
    onhand_sum, turns_e6)``.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("_p").orderBy("_s")
    bal = moves.select(
        F.col(part_col).alias("_p"),
        F.col(seq_col).cast("long").alias("_s"),
        F.col(qty_col).cast("long").alias("_q"),
    ).withColumn("_onhand", F.sum("_q").over(w).cast("long"))
    return (
        bal.groupBy("_p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_moves"),
            F.sum(F.when(F.col("_q") < 0, -F.col("_q")).otherwise(0))
            .cast("bigint")
            .alias("issued_qty"),
            F.sum("_onhand").cast("bigint").alias("onhand_sum"),
        )
        .select(
            F.col("_p").alias(part_col),
            "n_moves",
            "issued_qty",
            "onhand_sum",
            F.when(
                F.col("onhand_sum") > 0,
                F.expr(
                    "CAST(issued_qty * 1000000 * n_moves AS DECIMAL(38,0))"
                    " div onhand_sum"
                ).cast("bigint"),
            ).alias("turns_e6"),
        )
    )


def kit_availability(
    onhand: DataFrame,
    bom: DataFrame,
    part_col: str = "partkey",
    qty_col: str = "onhand_qty",
    parent_col: str = "parent",
    child_col: str = "child",
    per_col: str = "qty_per",
) -> DataFrame:
    """Kit availability — the ATP question for assembled goods: how
    many kits of each assembly can be built from component stock
    RIGHT NOW? ``kits(parent) = min over direct components c of
    floor(onhand(c) / qty_per(c))`` — the binding-constraint form
    every MRP kitting screen shows, with the LIMITING component named
    (smallest buildable count, ties broken by the lowest component
    key, so the answer is deterministic).

    ``onhand``: one row per component ``(part, qty)``; components
    absent from ``onhand`` count as zero stock (left join — a kit
    with an unstocked component builds 0). Integer division is on
    non-negative integers, so floor == trunc in every engine.

    Output per parent: ``(parent, n_components, kits_buildable,
    limiting_child, limiting_onhand)``.

    Scale: one equi-join on the component key + one window on the
    parent key (per-parent fan = the BOM line count, bounded) + one
    keyed agg. All shuffles share the parent key after the join.
    """
    edges = bom.select(
        F.col(parent_col).alias("_p"),
        F.col(child_col).alias("_c"),
        F.col(per_col).cast("bigint").alias("_q"),
    )
    stock = onhand.select(
        F.col(part_col).alias("_c"),
        F.col(qty_col).cast("bigint").alias("_oh"),
    )
    j = edges.join(stock, "_c", "left").select(
        "_p",
        "_c",
        F.coalesce(F.col("_oh"), F.lit(0)).alias("_oh"),
        F.expr("coalesce(_oh, 0) div _q").cast("bigint").alias("_kits"),
    )
    w = Window.partitionBy("_p").orderBy("_kits", "_c")
    ranked = j.withColumn("_rk", F.row_number().over(w))
    return (
        ranked.groupBy(F.col("_p").alias(parent_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_components"),
            F.min("_kits").cast("bigint").alias("kits_buildable"),
            F.max(F.when(F.col("_rk") == 1, F.col("_c")))
            .cast("bigint")
            .alias("limiting_child"),
            F.max(F.when(F.col("_rk") == 1, F.col("_oh")))
            .cast("bigint")
            .alias("limiting_onhand"),
        )
    )


def newsvendor_level(
    demands: DataFrame,
    key_col: str,
    qty_col: str,
    underage_cost: int = 3,
    overage_cost: int = 1,
) -> DataFrame:
    """Newsvendor order-up-to level — the service-level stocking rule:
    per key, the smallest stock level S whose empirical in-stock
    probability reaches the critical ratio ``cu / (cu + co)``
    (underage vs overage cost). Decided by the EXACT integer rank
    rule ``cum·(cu + co) ≥ cu·n`` over the per-key demand HISTOGRAM —
    no division, no doubles, the q316 histogram-order-statistic
    discipline (type-1 / quantile_disc semantics).

    Output per key: ``(key, n_obs, s_level, critical_ratio_e6)``.

    Scale: one keyed histogram agg (map-side combinable), one
    cumulative window over the bounded per-key distinct-quantity
    grid (demand quantities are small integers by nature), one
    filter + min-agg. All shuffles share the key.
    """
    from ..functions import e6_floor_ratio

    cu, co = int(underage_cost), int(overage_cost)
    assert cu > 0 and co >= 0
    h = demands.groupBy(
        F.col(key_col).alias("_k"), F.col(qty_col).cast("bigint").alias("_q")
    ).agg(F.count(F.lit(1)).alias("_c"))
    w_cum = (
        Window.partitionBy("_k")
        .orderBy("_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("_k")
    staged = h.withColumn("_cum", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_tot)
    )
    pick = (
        staged.where(
            F.col("_cum") * F.lit(cu + co) >= F.lit(cu) * F.col("_n")
        )
        .groupBy(F.col("_k").alias(key_col))
        .agg(
            F.min("_q").cast("bigint").alias("s_level"),
            F.first("_n").cast("bigint").alias("n_obs"),
        )
    )
    return pick.select(
        key_col,
        "n_obs",
        "s_level",
        e6_floor_ratio(F.lit(cu), F.lit(cu + co)).alias("critical_ratio_e6"),
    )
