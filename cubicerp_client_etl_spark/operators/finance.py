"""Finance analytics: variance decomposition between periods.

The reference moves accounting rows (its ledger/reconciliation surface,
cubicerpetl.py:775-787); the questions a finance team asks OF those
rows — "how much of the revenue change is price, how much volume, how
much assortment?" — are first-class operators here, in the exact
integer discipline the rest of the engine uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def price_volume_bridge(
    prev: DataFrame,
    cur: DataFrame,
    key_col: str,
    qty_col: str,
    rev_col: str,
) -> DataFrame:
    """Price–volume–mix bridge between two periods, per key: decompose
    each key's revenue change ``Δr = r₂ − r₁`` into

    - ``volume_eff = sign · (r₁·|q₂−q₁| div q₁)`` — the prior unit
      price applied to the quantity change (truncated on the
      NON-NEGATIVE product so truncation == floor in every engine —
      Spark's ``div`` truncates toward zero while DuckDB's ``//``
      floors, and they disagree on negatives; the sign-factored form
      sidesteps the class),
    - ``price_eff = Δr − volume_eff`` — the residual assignment, so
      the decomposition sums EXACTLY to Δr by construction (the
      rounding residue of the floored volume effect lands in the
      price effect, documented not hidden),

    and classify keys present in only one period as ``new`` (only
    current — Δr is all new-business) or ``lost`` (only prior).

    Input: one row per key per side with integer ``qty_col`` > 0 and
    integer ``rev_col`` (cents). Output one row per key:
    ``(key_col, status, q_prev, q_cur, rev_prev, rev_cur, delta_rev,
    volume_eff, price_eff)`` with status ∈ {'both','new','lost'} and
    the effects zero outside 'both'. Products run in DECIMAL(38,0).

    Scale: ONE full-outer equi-join on the key; everything else is
    per-row arithmetic. Callers aggregate raw lines to per-key period
    totals first (one keyed aggregation per side).
    """
    p = prev.select(
        F.col(key_col),
        F.col(qty_col).cast("bigint").alias("q_prev"),
        F.col(rev_col).cast("bigint").alias("rev_prev"),
    )
    c = cur.select(
        F.col(key_col),
        F.col(qty_col).cast("bigint").alias("q_cur"),
        F.col(rev_col).cast("bigint").alias("rev_cur"),
    )
    j = p.join(c, key_col, "full_outer")
    status = (
        F.when(F.col("q_prev").isNull(), F.lit("new"))
        .when(F.col("q_cur").isNull(), F.lit("lost"))
        .otherwise(F.lit("both"))
    )
    qp = F.coalesce("q_prev", F.lit(0)).cast("bigint")
    qc = F.coalesce("q_cur", F.lit(0)).cast("bigint")
    rp = F.coalesce("rev_prev", F.lit(0)).cast("bigint")
    rc = F.coalesce("rev_cur", F.lit(0)).cast("bigint")
    dq = qc - qp
    sign = F.when(dq < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
    vol = F.when(
        (status == "both") & (qp > 0),
        sign
        * F.expr(
            "CAST(CAST(coalesce(rev_prev, 0) AS DECIMAL(38,0))"
            " * abs(coalesce(q_cur, 0) - coalesce(q_prev, 0))"
            " div coalesce(q_prev, 1) AS BIGINT)"
        ),
    ).otherwise(F.lit(0)).cast("bigint")
    return j.select(
        key_col,
        status.alias("status"),
        qp.alias("q_prev"),
        qc.alias("q_cur"),
        rp.alias("rev_prev"),
        rc.alias("rev_cur"),
        (rc - rp).cast("bigint").alias("delta_rev"),
        vol.alias("volume_eff"),
        F.when(status == "both", (rc - rp) - vol)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("price_eff"),
    )
