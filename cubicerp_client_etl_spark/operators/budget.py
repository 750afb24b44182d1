"""Token-budget corpus selection & deterministic domain interleaving.

Two mixture-construction stages a pretraining pipeline runs after
filtering/dedup (reference has no such surface; this extends its
per-row routing idea — cubicerpetl.py:494-537 — to corpus assembly):

* ``token_budget_select`` — "take documents from each domain, in a
  deterministic shuffled order, until that domain's token budget is
  spent". The industry-standard way to hit a target mixture (e.g.
  "30 B tokens web, 5 B books") exactly, instead of rate-sampling and
  hoping the token counts land.
* ``interleave_round_robin`` — assign every selected document a global
  curriculum position that round-robins across domains, so a sequential
  reader sees domains evenly mixed (no "all of domain A, then all of
  B"), again deterministically.

Scale posture: a training mixture has O(10) domains, so a window
partitioned by the domain column funnels each domain's ENTIRE row set
through one task — the single-partition WindowExec scale-killer
``operators/prefix.py`` documents, merely sharded ten ways. Both
operators therefore run on ``prefix.prefix_sum_by``, the keyed
two-phase scan: range-partition on (domain, shuffle order), per-
(domain, partition) local sums, then a per-domain offset table whose
size is bounded by #partitions + #domains — no stage ever holds more
than one partition's slice of one domain, at any corpus size.
Interleaving adds one broadcast join against the bounded domain
dimension. Ordering is the keyed-md5 determinism of
``operators/sampling.py`` — retry/partitioning/cluster-independent and
exactly replayable in the DuckDB oracle (the oracle states the plain
SQL window; the scan is bit-identical to it because decimal/bigint
addition is associative and the order is total). NULL domains are a
valid group in BOTH operators (null-safe joins throughout — a null
domain selects and interleaves like any other).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.operators.prefix import prefix_sum_by


def shuffle_key(id_col: Column | str, seed: str = "") -> Column:
    """Deterministic per-row sort key: md5(id | seed). Same key on any
    cluster/partitioning/retry; DuckDB computes the identical hex."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(c.cast("string"), F.lit("|" + seed)))


def token_budget_select(
    docs: DataFrame,
    domain_col: str,
    token_col: str,
    id_col: str,
    budget: int | Mapping[str, int],
    seed: str = "",
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Keep each domain's deterministically-shuffled prefix of documents
    whose running token total stays within the domain's budget.

    A document is kept iff the running sum of ``token_col`` over
    ``(md5(id|seed), id)`` order within its domain is <= budget — so the
    selected set is a prefix under a fixed permutation: stable under
    reruns, append-only under corpus growth in expectation, and exactly
    replayable as a SQL window. ``budget`` is one int for all domains or
    a per-domain mapping (missing domains get budget 0 — explicit
    opt-in per domain, the mixture-spec reading).

    Runs on the keyed two-phase scan (``prefix_sum_by``) — no window
    over raw rows partitioned only by the low-cardinality domain; no
    Python, no collect. Costs one localCheckpoint materialization of
    the input (the price of consuming the range partitioning twice).
    """
    order = [shuffle_key(id_col, seed), F.col(id_col)]
    out = prefix_sum_by(docs, [domain_col], order, token_col, out_col=cum_col)
    if isinstance(budget, Mapping):
        if not budget:
            raise ValueError("budget mapping must not be empty")
        limit = F.lit(None).cast("bigint")
        for dom, b in budget.items():
            limit = F.when(F.col(domain_col) == dom, F.lit(int(b))).otherwise(limit)
        limit = F.coalesce(limit, F.lit(0))
    else:
        limit = F.lit(int(budget))
    return out.where(F.col(cum_col) <= limit)


def interleave_round_robin(
    docs: DataFrame,
    domain_col: str,
    id_col: str,
    seed: str = "",
    pos_col: str = "global_pos",
) -> DataFrame:
    """Assign a deterministic global curriculum position that
    round-robins across domains: position ``r * n_domains + d`` for the
    r-th document (0-based, md5-shuffled order) of the d-th domain
    (0-based, domains ordered by name).

    Positions are unique and a sequential reader sees domains
    interleaved ~evenly regardless of domain sizes (a domain that runs
    out simply leaves gaps — position order, not density, is the
    contract; gaps don't affect relative order).

    Plan: the per-domain rank is a prefix count of ones on the keyed
    two-phase scan (``prefix_sum_by`` — no raw-row window keyed on the
    low-cardinality domain), plus one broadcast join against the
    bounded domain dimension (distinct aggregate, rows = #domains,
    derived from the scan's checkpoint so the input is read once).
    NULL is a valid domain: the dim join is null-safe and NULL sorts
    first in the domain index (Spark's asc_nulls_first; oracle: ORDER
    BY ... NULLS FIRST). No global window, no collect.
    """
    order = [shuffle_key(id_col, seed), F.col(id_col)]
    ranked = prefix_sum_by(
        docs.withColumn("_one", F.lit(1).cast("bigint")),
        [domain_col],
        order,
        "_one",
        out_col="_rn1",
    )
    ranked = ranked.withColumn("_rn", F.col("_rn1") - 1).drop("_one", "_rn1")
    doms = ranked.select(F.col(domain_col)).distinct()
    # bounded: one row per domain
    wd = Window.orderBy(F.col(domain_col).asc_nulls_first())
    dim = doms.select(
        F.col(domain_col).alias("_dom"),
        (F.row_number().over(wd) - 1).alias("_didx"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_ndom"),
    )
    return (
        ranked.join(
            F.broadcast(dim), ranked[domain_col].eqNullSafe(dim["_dom"])
        )
        .withColumn(
            pos_col,
            (F.col("_rn").cast("bigint") * F.col("_ndom") + F.col("_didx")).cast(
                "bigint"
            ),
        )
        .drop("_dom", "_rn", "_didx", "_ndom")
    )


def temperature_mixture(
    docs: DataFrame,
    domain_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Temperature-scaled mixture allocation at α = 1/2: each domain's
    sampling weight is ``isqrt(domain_token_count)`` — the square-root
    temperature flattening multilingual/multi-domain pipelines use
    (mT5's α-scaled mixing, XLM-R's exponent-smoothed sampling) so head
    domains stop drowning tail domains — then ``budget`` slots are
    split across domains by exact largest-remainder apportionment on
    those weights (every slot assigned, deterministic ties by domain).

    Returns one row per domain: ``(domain_col, c_tokens, w, share_e6,
    target)`` with Σ target = budget exactly.

    All arithmetic is exact integer (``isqrt_exact`` + floor ratios +
    remainder ranking), so a DuckDB oracle replays it bit-for-bit.
    Scale: one keyed aggregation over the corpus (map-side partial
    sums); everything after runs on the O(#domains) result — the
    windows below are over that bounded aggregate, never raw rows.
    """
    from cubicerp_client_etl_spark.functions import e6_floor_ratio, isqrt_exact

    c = docs.groupBy(domain_col).agg(
        F.sum(F.col(token_col)).cast("bigint").alias("c_tokens")
    )
    w = c.withColumn("w", isqrt_exact(F.col("c_tokens")))
    tot = w.agg(F.sum("w").cast("bigint").alias("_tw"))
    a = w.join(F.broadcast(tot)).select(
        domain_col,
        "c_tokens",
        "w",
        e6_floor_ratio(F.col("w"), F.col("_tw")).alias("share_e6"),
        # integer div; truncation == floor because operands are >= 0
        F.expr(f"CAST({int(budget)} AS BIGINT) * w div _tw").alias("_base"),
        ((F.lit(budget).cast("bigint") * F.col("w")) % F.col("_tw")).alias(
            "_rem"
        ),
    )
    # bounded-by-construction windows: input is the per-domain aggregate
    w_rank = Window.orderBy(F.col("_rem").desc(), F.col(domain_col))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        a.withColumn("_short", F.lit(budget) - F.sum("_base").over(w_all))
        .withColumn("_rank", F.row_number().over(w_rank))
        .select(
            domain_col,
            "c_tokens",
            "w",
            "share_e6",
            (
                F.col("_base")
                + F.when(F.col("_rank") <= F.col("_short"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("target"),
        )
    )


def epoch_allocation(
    docs: DataFrame,
    domain_col: str,
    token_col: str,
    budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """Data-constrained epoch allocation (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): split a token budget
    EVENLY across domains, but cap every domain at ``max_epochs``
    repeats of its fresh data — past ~4 epochs repeated tokens stop
    buying loss — and give the budget the capped (data-poor) domains
    hand back to the domains that still have headroom.

    Exact integer arithmetic throughout so a DuckDB oracle replays it
    bit-for-bit: even split by largest-remainder (ties by domain name),
    one floor-proportional-to-headroom redistribution pass CLAMPED to
    each domain's headroom (≤ D−1 rounding tokens — plus the whole
    surplus when budget > max_epochs × total tokens — stay
    unallocated: reported via allocated < share, never handed out past
    the epoch cap).

    Returns one row per domain: ``(domain, c_tokens, share, allocated,
    full_epochs, partial_tokens, epochs_e6)`` where ``allocated =
    full_epochs·c_tokens + partial_tokens`` and ``epochs_e6`` is the
    repeat factor ×10⁶ (floor).

    Scale: one keyed corpus aggregation (map-side combine); everything
    downstream — the even split, the cap, the redistribution — runs on
    the O(#domains) aggregate, with windows only over that bounded
    frame (prover-checkable).
    """
    if budget < 0 or max_epochs < 1:
        raise ValueError("budget must be >= 0 and max_epochs >= 1")
    c = docs.groupBy(domain_col).agg(
        F.sum(F.col(token_col)).cast("bigint").alias("c_tokens")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_name = Window.orderBy(domain_col)
    b = F.lit(int(budget)).cast("bigint")
    share = (
        c.withColumn("_d", F.count(F.lit(1)).over(w_all))
        .withColumn("_rk", F.row_number().over(w_name))
        .withColumn(
            "share",
            F.expr(f"CAST({int(budget)} AS BIGINT) div _d")
            + F.when(F.col("_rk") <= b % F.col("_d"), 1).otherwise(0),
        )
        .withColumn("_cap", F.lit(int(max_epochs)).cast("bigint") * F.col("c_tokens"))
        .withColumn("used1", F.least(F.col("share"), F.col("_cap")))
        .withColumn("head", F.col("_cap") - F.col("used1"))
    )
    # returned-by-capped-domains pool and total headroom: windows over
    # the bounded per-domain frame
    pool = (
        share.withColumn("_unused", F.sum(F.col("share") - F.col("used1")).over(w_all))
        .withColumn("_thead", F.sum("head").over(w_all))
        .withColumn(
            "extra",
            # clamp to the domain's headroom: when budget exceeds
            # max_epochs × total tokens, the floor-proportional share
            # (_unused*head div _thead) can exceed head and silently
            # over-allocate past the epoch cap (ADVICE r8). The
            # clamped residual stays unallocated — reported through
            # allocated < share, never handed out past the cap.
            F.when(
                F.col("_thead") > 0,
                F.least(
                    F.col("head"), F.expr("(_unused * head) div _thead")
                ),
            ).otherwise(F.lit(0).cast("bigint")),
        )
        .withColumn("allocated", F.col("used1") + F.col("extra"))
    )
    return pool.select(
        domain_col,
        "c_tokens",
        "share",
        "allocated",
        F.when(F.col("c_tokens") > 0, F.expr("allocated div c_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("full_epochs"),
        F.when(F.col("c_tokens") > 0, F.col("allocated") % F.col("c_tokens"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("partial_tokens"),
        F.when(
            F.col("c_tokens") > 0,
            F.expr("(allocated * 1000000) div c_tokens"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("epochs_e6"),
    )


def prorate_exact(
    lines: DataFrame,
    key_col: str,
    amount_col: str,
    weight_col: str,
    order_col: str,
    out_col: str = "alloc",
) -> DataFrame:
    """Exact largest-remainder proration — the ERP allocation rule:
    distribute each key's integer ``amount_col`` (a header-level
    discount/freight/tax in cents, constant within the key) over its
    lines proportionally to ``weight_col``, so that the per-key sum of
    allocations EQUALS the amount to the cent (floating prorating
    never does; the reference leaves the header/line mismatch to
    manual reconciliation).

    Per key with total weight W: ``base_i = floor(A·w_i / W)``; the
    shortfall ``r = A − Σ base`` (0 ≤ r < #lines) goes one unit each
    to the r largest fractional remainders ``(A·w_i) mod W``, ties
    broken by ``order_col`` — fully deterministic. Degenerate W = 0
    (all-zero weights) books the whole amount on the first line by
    ``order_col`` so the invariant Σalloc = A still holds.

    Adds ``out_col``; preserves input columns. Products run in
    DECIMAL(38,0) (A·w overflows int64 once cents × token-scale
    weights meet). Scale: two windows partitioned by the
    high-cardinality document key (sum + rank) — the per-document
    line fan is bounded (an invoice has tens of lines), so no
    single-partition hazard; no self-join.
    """
    w_key = Window.partitionBy(key_col)
    a = F.col(amount_col).cast("decimal(38,0)")
    wgt = F.col(weight_col).cast("decimal(38,0)")
    with_tot = lines.withColumn("_W", F.sum(wgt).over(w_key))
    base = F.when(
        F.col("_W") > 0, F.expr(f"(CAST({amount_col} AS DECIMAL(38,0))"
                                f" * {weight_col}) div _W")
    ).otherwise(F.lit(0)).cast("bigint")
    frac = F.when(
        F.col("_W") > 0,
        (a * wgt - base.cast("decimal(38,0)") * F.col("_W")).cast("bigint"),
    ).otherwise(F.lit(0))
    staged = (
        with_tot.withColumn("_base", base)
        .withColumn("_frac", frac)
        .withColumn("_short", (a - F.sum("_base").over(w_key)).cast("bigint"))
    )
    w_rank = Window.partitionBy(key_col).orderBy(
        F.col("_frac").desc(), F.col(order_col)
    )
    return (
        staged.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn(
            out_col,
            F.when(
                F.col("_W") > 0,
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_short"), 1).otherwise(0),
            )
            .otherwise(
                # W = 0: whole amount on the first line by order_col
                F.when(
                    F.row_number()
                    .over(Window.partitionBy(key_col).orderBy(order_col))
                    == 1,
                    F.col(amount_col),
                ).otherwise(F.lit(0))
            )
            .cast("bigint"),
        )
        .drop("_W", "_base", "_frac", "_short", "_rk")
    )
