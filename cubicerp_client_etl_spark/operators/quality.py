"""Declarative data-quality constraint profiling (D2 extension).

The reference's only quality machinery is the per-row ledger with its
``check``/``amount`` reconciliation fields (cubicerpetl/
cubicerpetl.py:775-787) — operational, row-at-a-time, RPC-bound. The
engine's form is declarative: a rule set evaluated in ONE pass over the
table (conditional aggregation), plus set-based rules (uniqueness via
group-count, referential integrity via anti-join) that each cost one
shuffle. Output is a long-form report (rule, n_violations) — the shape
monitoring systems ingest.

Scale: row rules are a single map-side conditional-sum pass — no
shuffle beyond the 1-row final aggregate. Uniqueness shuffles on the
key; FK checks anti-join (broadcast when the parent is a dim). At
100 TB you run the row rules on every load and the set rules on a
sampled or incremental basis — the API keeps them separable.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def row_rule_report(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate boolean violation predicates in one pass.

    ``rules`` maps rule name → Column that is true when the row
    VIOLATES the rule. Returns (rule, n_violations) long form.

    Rule names are embedded in a ``stack()`` expression, so names
    containing quotes/backticks (or an empty rule set) would otherwise
    produce a confusing parse error — rejected up front instead.
    """
    if not rules:
        raise ValueError("row_rule_report: rules mapping is empty")
    for name in rules:
        if any(ch in name for ch in "'`\"\\"):
            raise ValueError(
                f"row_rule_report: rule name {name!r} may not contain "
                "quotes, backticks, or backslashes"
            )
    wide = df.agg(
        *[
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
            for name, pred in rules.items()
        ]
    )
    stack = ", ".join(f"'{n}', `{n}`" for n in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
    )


def uniqueness_report(
    df: DataFrame, key: Sequence[str], rule_name: str | None = None
) -> DataFrame:
    """Count rows participating in duplicate groups of ``key``."""
    name = rule_name or f"unique({','.join(key)})"
    dup = (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_violations"))
    )
    return dup.select(F.lit(name).alias("rule"), "n_violations")


def fk_report(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rule_name: str | None = None,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Count child rows whose FK has no parent (orphans) via anti-join."""
    name = rule_name or f"fk({child_key}->{parent_key})"
    p = parent.select(parent_key).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    orphans = child.join(
        p, child[child_key] == p[parent_key], "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    return orphans.select(F.lit(name).alias("rule"), "n_violations")


def combine_reports(*reports: DataFrame) -> DataFrame:
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def k_anonymize_release(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    measures: Mapping[str, Column],
    other_label: str = "*",
) -> DataFrame:
    """k-anonymous aggregate release: group by the quasi-identifier
    columns, publish groups with ≥ ``k`` rows as-is, and POOL every
    smaller group into one catch-all row (quasi-identifiers replaced
    by ``other_label``) — the minimum-cell-size suppression rule
    statistical agencies apply before releasing cross-tabs, so no
    published cell isolates fewer than k individuals.

    ``measures`` maps output column name → aggregate Column (evaluated
    per group; the catch-all row re-aggregates the SUPPRESSED GROUPS'
    ROWS, so additive measures stay exact — use additive aggregates
    (sum/count) for release tables). Every released row carries
    ``n_rows`` (≥ k except possibly the catch-all, which may pool
    fewer than k total rows — standard practice still publishes it;
    filter it out downstream if the residual is too small).

    Deterministic, exact-integer/decimal, oracle-replayable. Scale:
    one keyed aggregation + a broadcast of the small-group keys back
    onto the aggregate (never onto raw rows); the catch-all is a
    second aggregate over the (bounded) suppressed-group rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")] + [
        c.alias(name) for name, c in measures.items()
    ]
    # quasi-identifiers as strings so the catch-all label unions
    # type-cleanly whatever the input types were
    df = df.withColumns({c: F.col(c).cast("string") for c in group_cols})
    g = df.groupBy(*group_cols).agg(*aggs)
    released = g.where(F.col("n_rows") >= k)
    small = g.where(F.col("n_rows") < k)
    # re-aggregate the suppressed groups' aggregates: counts and any
    # additive measure pool exactly; one row, labels as other_label
    pool_aggs = [F.sum("n_rows").cast("bigint").alias("n_rows")] + [
        F.sum(name).alias(name) for name in measures
    ]
    pooled = small.agg(*pool_aggs).select(
        *[F.lit(other_label).alias(c) for c in group_cols],
        "n_rows",
        *measures.keys(),
    )
    # emit the catch-all only when something was suppressed
    pooled = pooled.where(F.col("n_rows").isNotNull())
    return released.unionByName(pooled)


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — pinned integer constants
# so the audit is float-free and engine-identical (they sum to 999995;
# the 5e-6 shortfall is the floor, documented not hidden)
BENFORD_E6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit (Benford's law) audit of a positive integer column —
    the classic fraud / fabricated-data screen for financial amounts:
    naturally-occurring multiplicative quantities lead with digit d at
    probability log10(1+1/d); fabricated or truncated data doesn't.

    Returns one row per digit 1-9: observed count, observed share
    (e6 floor), the pinned Benford expectation, and |obs − exp|; plus
    the consumer can sum the deviation column for a single screening
    stat. Exact integers end-to-end (expectations are pinned e6
    literals, never a runtime log), so the audit oracle-replays.
    Rows with NULL or non-positive values are excluded (Benford is
    undefined there) — screen them separately with ``row_rule_report``.

    Scale: first digit is string arithmetic on the value (map-only);
    one 9-group aggregate with map-side combine. Nothing else.
    """
    v = df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0)).select(
        F.substring(F.col(value_col).cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("_d")
    )
    counts = v.groupBy("_d").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d, BENFORD_E6[d - 1]) for d in range(1, 10)],
        "_d int, expected_e6 bigint",
    )
    tot = v.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    return (
        expected.join(counts, "_d", "left")
        .join(F.broadcast(tot))
        .select(
            F.col("_d").alias("digit"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr("(coalesce(n, 0) * 1000000) div _n")
            .cast("bigint")
            .alias("observed_e6"),
            "expected_e6",
            F.abs(
                F.expr("(coalesce(n, 0) * 1000000) div _n") - F.col("expected_e6")
            )
            .cast("bigint")
            .alias("abs_dev_e6"),
        )
    )


def key_skew_audit(
    df: DataFrame, key_col: str, top_k: int = 5
) -> DataFrame:
    """Shuffle-skew pre-flight: the per-key row distribution a planner
    needs BEFORE hash-partitioning a join/agg on ``key_col``. Returns
    the ``top_k`` heaviest keys, each row also carrying the global
    summary (denormalized so the output is one scalar-only frame):

    ``(rank, key, key_rows, share_e6, n_keys, n_rows, skew_ratio_e6)``

    where ``skew_ratio_e6 = max_key_rows · n_keys · 1e6 div n_rows``
    (the heaviest key's multiple of the mean, ×1e6 — 1e6 means
    perfectly even). A ratio past the executor-partition budget says
    salt this key or let AQE skew-split it; the top-k rows name the
    keys to salt.

    Scale: one keyed count (map-side combinable), a top-k
    (TakeOrdered, never a global sort), and 1-row/bounded broadcast
    joins — the audit costs one scan regardless of corpus size.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("key_rows")
    )
    summary = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("key_rows").cast("bigint").alias("n_rows"),
        F.max("key_rows").cast("bigint").alias("_max"),
    )
    top = counts.orderBy(F.col("key_rows").desc(), F.col("key")).limit(top_k)
    # rank over the top-k frame only (GlobalLimit-bounded — prover ok)
    w = Window.orderBy(F.col("key_rows").desc(), F.col("key"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .join(F.broadcast(summary))
        .select(
            "rank",
            F.col("key").cast("string").alias("key"),
            "key_rows",
            # decimal-routed floors: key_rows*1e6 and _max*n_keys*1e6
            # overflow bigint under ANSI on trillion-row/billion-key
            # inputs (the e6_floor_ratio rationale, ADVICE r5)
            F.expr(
                "CAST(CAST(key_rows AS DECIMAL(38,0)) * 1000000"
                " div n_rows AS BIGINT)"
            ).alias("share_e6"),
            "n_keys",
            "n_rows",
            F.expr(
                "CAST(CAST(_max AS DECIMAL(38,0)) * n_keys * 1000000"
                " div n_rows AS BIGINT)"
            ).alias("skew_ratio_e6"),
        )
    )


def cusum_alarm(
    day_counts: DataFrame,
    time_col: str,
    value_col: str,
    target: int,
    threshold: int,
) -> DataFrame:
    """One-sided CUSUM changepoint alarm over a BOUNDED per-period
    aggregate (daily counts, hourly error rates): the classic
    sequential drift detector ``S_t = max(0, S_{t-1} + (x_t − k))``
    evaluated in its CLOSED FORM

        S_t = P_t − min_{0 ≤ j ≤ t} P_j,   P_t = Σ_{i≤t} (x_i − k)

    so no recursion and no driver loop — two windows over the
    period table, which is bounded by the time span (a year of days
    is 365 rows however big the corpus), prover-compliant.

    Returns one row per period: ``(time_col, value_col, cusum,
    alarm)`` with ``alarm = cusum > threshold``. Exact integers; both
    windows replay in any engine.

    Callers aggregate the raw stream to per-period counts first (one
    keyed aggregation — the only corpus-sized stage).
    """
    w_cum = Window.orderBy(time_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = F.sum(F.col(value_col) - F.lit(int(target))).over(w_cum)
    staged = day_counts.withColumn("_p", p).withColumn(
        # min over P_0..P_t INCLUDING the current prefix, with the
        # virtual start P_0 = 0 folded in via least(0, ·) — the
        # reflection identity needs j = t in range (dropping it makes
        # S_t go negative on a first-below-target period)
        "_pmin",
        F.least(F.lit(0).cast("bigint"), F.min("_p").over(w_cum)),
    )
    return staged.select(
        time_col,
        value_col,
        (F.col("_p") - F.col("_pmin")).cast("bigint").alias("cusum"),
        ((F.col("_p") - F.col("_pmin")) > threshold).alias("alarm"),
    )


def abc_classification(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_cut_e6: int = 800_000,
    b_cut_e6: int = 950_000,
) -> DataFrame:
    """ABC (Pareto) classification — the inventory/portfolio rule:
    rank keys by total value descending, classify the keys covering
    the first ``a_cut_e6`` (default 80%) of cumulative value as 'A',
    through ``b_cut_e6`` (default 95%) as 'B', the tail as 'C'. A
    key's class is decided by its cumulative share INCLUDING itself
    (the key that crosses the 80% line is still an A — standard
    practice), ties broken by key for determinism.

    Returns one row per key: ``(key_col, value, rank, cum_value,
    cum_share_e6, abc_class)``. Exact integers: cumulative sums in
    bigint, shares as decimal-routed e6 floors.

    Scale: one keyed aggregation (map-side combine), then the ordered
    prefix runs through the TWO-PHASE scan (``prefix.prefix_sum_multi``
    on (value desc, key): range partition, per-slice sums, broadcast
    offsets) — rank is the prefix sum of ones over the same order, and
    the grand total arrives as a broadcast 1-row aggregate. No
    un-partitioned WindowExec anywhere: for a corpus-scaled key (every
    l_partkey at SF100k) the aggregate itself is billions of rows, so
    the global-window form this replaces would funnel them through ONE
    task — the exact hazard the module's siblings (gini, MAD, weighted
    median) already route around.
    """
    from cubicerp_client_etl_spark.operators.prefix import prefix_sum_multi

    if not 0 < a_cut_e6 < b_cut_e6 <= 1_000_000:
        raise ValueError("need 0 < a_cut_e6 < b_cut_e6 <= 1e6")
    agg = df.groupBy(key_col).agg(
        F.sum(F.col(value_col)).cast("bigint").alias("value")
    )
    scanned = prefix_sum_multi(
        agg.withColumn("_one", F.lit(1).cast("bigint")),
        order_by=[F.col("value").desc(), F.col(key_col)],
        value_cols=["value", "_one"],
        out_cols=["cum_value", "rank"],
    )
    total = agg.agg(F.sum("value").cast("bigint").alias("_tot"))
    staged = scanned.crossJoin(F.broadcast(total)).withColumn(
        "cum_value", F.col("cum_value").cast("bigint")
    )
    share = F.expr(
        "CAST(CAST(cum_value AS DECIMAL(38,0)) * 1000000 div _tot AS BIGINT)"
    )
    return staged.select(
        key_col,
        "value",
        "rank",
        "cum_value",
        share.alias("cum_share_e6"),
        F.when(share <= a_cut_e6, F.lit("A"))
        .when(share <= b_cut_e6, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def grouped_ols_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact per-group OLS trend line — "is this part's revenue
    rising?" answered with the closed-form least-squares slope on
    integer (x, y):

        slope_e6     = (n·Σxy − Σx·Σy) · 1e6 div (n·Σx² − (Σx)²)
        intercept_e6 = (Σy·Σx² − Σx·Σxy) · 1e6 div (n·Σx² − (Σx)²)

    All five sufficient statistics are map-side-combinable sums; the
    products run in DECIMAL(38,0) so nothing overflows below ~1e19
    scale sums; the divisions are integer ``div`` (truncation toward
    zero in BOTH engines — numerators can be negative, so oracles
    must use a truncating division form, NOT ``//``; see the q251
    sign discipline — here the oracle replays Spark's div via
    sign-factored floor).

    Degenerate groups (n < 2 or zero x-variance) report NULL slope —
    reported, never a div-by-zero abort. Returns one row per group:
    ``(group_cols..., n, sum_y, slope_e6, intercept_e6)``.

    Scale: ONE keyed aggregation. Nothing else.
    """
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.col(y_col).cast("decimal(38,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("decimal(38,0)").alias("_sx"),
        F.sum(y).cast("decimal(38,0)").alias("_sy"),
        F.sum(x * x).cast("decimal(38,0)").alias("_sxx"),
        F.sum(x * y).cast("decimal(38,0)").alias("_sxy"),
    )
    det = F.expr("n * _sxx - _sx * _sx")
    return agg.select(
        *group_cols,
        "n",
        F.col("_sy").cast("bigint").alias("sum_y"),
        F.when(
            (F.col("n") >= 2) & (det != 0),
            F.expr(
                "CAST((n * _sxy - _sx * _sy) * 1000000"
                " div (n * _sxx - _sx * _sx) AS BIGINT)"
            ),
        ).alias("slope_e6"),
        F.when(
            (F.col("n") >= 2) & (det != 0),
            F.expr(
                "CAST((_sy * _sxx - _sx * _sxy) * 1000000"
                " div (n * _sxx - _sx * _sx) AS BIGINT)"
            ),
        ).alias("intercept_e6"),
    )


def referential_integrity_audit(
    pairs: "list[tuple[str, DataFrame, str, DataFrame, str]]",
) -> DataFrame:
    """Referential-integrity audit across a set of FK relationships —
    the load-time data contract every warehouse checks: for each
    ``(name, child_df, fk_col, parent_df, pk_col)`` report the child
    row count, the orphan count (child rows whose FK matches no parent
    PK — NULL FKs count as orphans: an unparented fact is unparented
    either way), and the exact e6 orphan share.

    Returns one row per relationship:
    ``(relationship, n_child, n_orphans, orphan_share_e6)``.

    Scale: one LEFT ANTI join per relationship on the key (broadcast
    when the parent is a dimension) + two 1-row aggregates; the union
    is K rows for K relationships. Zero orphans is the healthy answer
    — the audit's value is pinning that zero under the oracle hash.
    """
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    if not pairs:
        raise ValueError("pairs must be non-empty")
    outs = []
    for name, child, fk, parent, pk in pairs:
        c = child.select(F.col(fk).alias("_fk"))
        p = parent.select(F.col(pk).alias("_fk")).distinct()
        total = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
        orphans = c.join(p, "_fk", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans")
        )
        outs.append(
            total.crossJoin(orphans).select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_orphans",
                F.when(
                    F.col("n_child") > 0,
                    e6_floor_ratio(F.col("n_orphans"), F.col("n_child")),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("orphan_share_e6"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def hhi_concentration(
    revenue: DataFrame,
    key_col: str,
    value_col: str,
    top_n: int = 5,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index over keyed revenue —
    the antitrust-grade sibling of the Gini audit
    (:func:`operators.quantiles.gini_concentration` measures
    inequality of the distribution; HHI measures how much of the
    market the biggest players hold):

        share_e6_i = v_i · 1e6 div total
        hhi_e12    = Σ share_e6_i²          (10 000-point scale × 1e8)

    plus the top-``top_n`` combined share. Both engines floor the
    per-key share identically, so the sum of squares is exact.

    Returns ONE row: ``(n_keys, total_cents, hhi_e12, top_share_e6)``.

    Scale: one keyed aggregate; the share math is a second pass over
    the per-key aggregate; the top-N share comes from an ordered
    ``limit(top_n)`` (TakeOrdered — a bounded heap, never a global
    row_number window over the data-sized key table; rank by value
    with key tie-break, deterministic across engines).
    """
    per = revenue.groupBy(F.col(key_col).alias("_k")).agg(
        F.sum(F.col(value_col).cast("bigint")).cast("bigint").alias("_v")
    )
    tot = per.agg(F.sum("_v").cast("bigint").alias("_total"))
    shared = per.crossJoin(F.broadcast(tot)).select(
        "_k",
        "_v",
        "_total",
        F.expr("CAST(_v * 1000000 AS DECIMAL(38,0)) div _total")
        .cast("bigint")
        .alias("_sh"),
    )
    top = (
        shared.orderBy(F.col("_v").desc(), F.col("_k"))
        .limit(top_n)
        .agg(F.sum("_sh").cast("bigint").alias("top_share_e6"))
    )
    return (
        shared.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.first("_total").cast("bigint").alias("total_cents"),
            F.sum(F.col("_sh") * F.col("_sh"))
            .cast("bigint")
            .alias("hhi_e12"),
        )
        .crossJoin(F.broadcast(top))
    )


def sequence_gap_audit(
    docs: DataFrame,
    series_col: str,
    number_col: str,
) -> DataFrame:
    """Document-number sequence-gap audit — the completeness control
    auditors run on any numbered series (invoices, receipts, journal
    entries): within each series, every break in the consecutive
    numbering is a potential missing/voided document to explain.

    Gaps-and-islands on integers, exactly: per series ordered by
    number, a GAP is a consecutive pair with ``next − cur > 1``.
    Output per series: ``(series, n_docs, min_number, max_number,
    n_gaps, missing_total = span − n_docs, largest_gap)`` where
    ``span = max − min + 1`` (``missing_total`` counts every absent
    number; ``largest_gap`` is the biggest single run of them, 0 for
    a complete series). Duplicate numbers within a series would make
    ``missing_total`` disagree with the pairwise gap sum — callers
    screen duplicates separately (the q266 family).

    Scale: one lag window + one keyed agg, both on the series key —
    per-series fan is the document count of ONE numbering series
    (bounded by issuance policy, not corpus size); no join.
    """
    d = docs.select(
        F.col(series_col).alias("_s"),
        F.col(number_col).cast("bigint").alias("_n"),
    )
    w = Window.partitionBy("_s").orderBy("_n")
    staged = d.withColumn("_prev", F.lag("_n").over(w)).withColumn(
        "_gap",
        F.when(
            F.col("_prev").isNotNull(), F.col("_n") - F.col("_prev") - 1
        ).otherwise(F.lit(0)),
    )
    return (
        staged.groupBy(F.col("_s").alias(series_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("_n").cast("bigint").alias("min_number"),
            F.max("_n").cast("bigint").alias("max_number"),
            F.sum(F.when(F.col("_gap") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_gaps"),
            (F.max("_n") - F.min("_n") + 1 - F.count(F.lit(1)))
            .cast("bigint")
            .alias("missing_total"),
            F.max("_gap").cast("bigint").alias("largest_gap"),
        )
    )


def wilson_lower_bound_e6(
    df: DataFrame,
    n_col: str,
    k_col: str,
    out_col: str = "wilson_lb_e6",
) -> DataFrame:
    """Conservative success-rate lower bound, exact-integer form — the
    ranking statistic for rates on unequal sample sizes (return rates
    by brand, defect rates by vendor): a small sample with one return
    must not outrank a large sample with thousands.

    The law is the Wilson score lower bound at z = 2 (≈95.4%),
    carried ENTIRELY in integers so both engines replay it
    bit-for-bit:

        inner6 = (10⁶ · (k·(n−k) + n)) div n        -- DECIMAL(38,0)/HUGEINT
        s      = isqrt(inner6)                       -- floor-corrected
        lb_e6  = greatest(0, ((k+2)·10⁶ − 2000·s) div (n+4))

    (The real-valued Wilson bound is ((k+2) − 2·√(k(n−k)/n + 1)) /
    (n+4) at z = 2; ``inner6`` floors the radicand at e6 scale and
    ``s/1000`` is its root, so ``2000·s ≈ 2·√(...)·10⁶`` with a
    deterministic floor at each step — a DEFINED integer statistic,
    not an approximation contract: both engines compute the identical
    integers. The 0-clamp makes trunc-vs-floor on the possibly
    negative numerator irrelevant: both conventions land ≤ 0.)
    Domain: ``inner6 < 2^53`` needs n ≲ 3.6e10 per group — far past
    any per-brand line count at the 100 TB design point.

    Adds ``out_col`` (bigint) to ``df`` (which carries the prior
    keyed aggregation's ``n_col``/``k_col``). Pure map — no shuffle.
    """
    from ..functions import isqrt_exact

    inner6 = F.expr(
        f"CAST((CAST(1000000 AS DECIMAL(38,0)) * "
        f"(CAST(`{k_col}` AS DECIMAL(38,0)) * (`{n_col}` - `{k_col}`)"
        f" + `{n_col}`))"
        f" div CAST(`{n_col}` AS DECIMAL(38,0)) AS BIGINT)"
    )
    staged = df.withColumn("_w_inner6", inner6).withColumn(
        "_w_s", isqrt_exact(F.col("_w_inner6"))
    )
    lb = F.expr(
        f"CAST(greatest(0, ((`{k_col}` + 2) * 1000000 - 2000 * _w_s)"
        f" div (`{n_col}` + 4)) AS BIGINT)"
    )
    return staged.withColumn(out_col, lb).drop("_w_inner6", "_w_s")


def single_source_risk(
    lines: DataFrame,
    part_col: str,
    supplier_col: str,
    spend_col: str,
    group_col: str,
) -> DataFrame:
    """Single-source supply risk — the procurement resilience audit:
    a part bought from exactly ONE supplier is a disruption risk, and
    the report every sourcing review starts from is "how much of each
    category's spend sits on single-sourced parts".

    Per ``group_col`` (brand/category): parts traded, single-sourced
    parts, the single-source share of parts (e6, exact via
    e6_floor_ratio), total spend, and the spend concentrated on
    single-sourced parts.

    Scale: one DISTINCT on (part, supplier) — the supplier-count agg
    rides the same part key — plus one keyed part-level agg and one
    bounded group agg; no window, no self-join.
    """
    from ..functions import e6_floor_ratio

    per_part = lines.groupBy(
        F.col(part_col).alias("_p"), F.col(group_col).alias("_g")
    ).agg(
        F.count_distinct(F.col(supplier_col)).cast("bigint").alias("_ns"),
        F.sum(F.col(spend_col).cast("bigint")).alias("_spend"),
    )
    g = per_part.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.when(F.col("_ns") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_single_source"),
        F.sum("_spend").cast("bigint").alias("total_spend_cents"),
        F.sum(F.when(F.col("_ns") == 1, F.col("_spend")).otherwise(0))
        .cast("bigint")
        .alias("single_source_spend_cents"),
    )
    return g.withColumn(
        "single_source_share_e6",
        e6_floor_ratio(F.col("n_single_source"), F.col("n_parts")),
    )


def three_sigma_flags(
    df: DataFrame,
    label_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """k-sigma outlier flags WITHOUT doubles — the daily-close anomaly
    screen: flag every label whose value sits more than k standard
    deviations from the mean, decided by the EXACT integer
    inequality

        (N·x − S)² > k² · (N·SS − S²)

    (multiply the textbook |x − S/N| > k·σ through by N² — means and
    variances never materialize, so there is no rounding to disagree
    on; both engines compare the same integers). Carried in
    DECIMAL(38,0)/HUGEINT: the squared deviation passes the bigint
    ceiling as soon as daily cents meet thousands of days.

    Input: an already-aggregated (label, value) frame — the stats are
    ONE tiny aggregate broadcast back over it. Output: flagged rows
    only, ``(label, value, n_labels, direction)`` with direction
    'high'/'low' by the sign of N·x − S.

    Scale: one 1-row aggregate + a broadcast re-join over the
    (bounded, already-reduced) label grid. The fact scan that builds
    the input is the caller's keyed agg.
    """
    v = F.col(value_col).cast("decimal(38,0)")
    stats = df.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(v).cast("decimal(38,0)").alias("_s"),
        F.sum(v * v).cast("decimal(38,0)").alias("_ss"),
    )
    j = df.crossJoin(F.broadcast(stats))
    dev = (F.col("_n") * v - F.col("_s")).cast("decimal(38,0)")
    var_num = (
        F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    ).cast("decimal(38,0)")
    return (
        j.where(dev * dev > F.lit(int(k * k)).cast("decimal(38,0)") * var_num)
        .select(
            F.col(label_col),
            F.col(value_col),
            F.col("_n").cast("bigint").alias("n_labels"),
            F.when(dev > 0, F.lit("high")).otherwise(F.lit("low")).alias(
                "direction"
            ),
        )
    )


def skyline_screen(
    df: DataFrame,
    cost_col: str,
    rate_col: str,
    id_col: str,
) -> DataFrame:
    """2-D Pareto frontier screen (minimize BOTH criteria) — the
    shortlist every two-criteria sourcing decision starts from
    (cheapest-vs-best-quality suppliers, fastest-vs-cheapest
    carriers): a point is on the frontier iff no other point is at
    least as good on both axes and better on one.

    Law (deterministic, one scan): in the TOTAL order ``(cost, rate,
    id)``, a point is on the frontier iff its rate is STRICTLY below
    the running min of all preceding rows (or no row precedes).
    Predecessors have cost ≤ c, so ``prefix_min ≤ r`` is exactly
    "some point with cost ≤ c and rate ≤ r sits earlier" — strict
    domination because either its cost is strictly lower, or it ties
    on cost with a strictly lower rate, or it ties on BOTH (the
    duplicate case — kept once, lowest id, the documented dedup
    convention). Adds ``is_frontier`` boolean.

    Scale: the scan is :func:`..prefix.prefix_min_strict`'s two-phase
    distributed form — no single-partition global window; the input
    is the caller's already-reduced per-entity criteria frame.
    """
    from .prefix import prefix_min_strict

    scanned = prefix_min_strict(
        df,
        [F.col(cost_col), F.col(rate_col), F.col(id_col)],
        rate_col,
        out_col="_pm",
    )
    return scanned.withColumn(
        "is_frontier",
        F.col("_pm").isNull() | (F.col(rate_col) < F.col("_pm")),
    ).drop("_pm")
