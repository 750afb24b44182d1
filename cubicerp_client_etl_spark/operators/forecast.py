"""Time-series forecasting and survival analytics on exact integers.

The reference's jobs feed demand-planning and churn dashboards; these
operators own the two standard first-line models:

- single exponential smoothing (SES) — the irreducibly SEQUENTIAL
  recurrence (like AVCO costing, :mod:`history.avco_inventory`): the
  floor division inside every update makes each level a
  non-associative function of the previous one, so the distributed
  shape is a per-key ordered walk in Arrow ``applyInPandas`` and the
  DuckDB oracle replays the recurrence with a RECURSIVE CTE;
- Kaplan–Meier survival — fully SET-BASED: risk counts come from one
  value-count prefix scan over the bounded distinct-duration table,
  and the survival curve is carried in LOG space (e6-rounded ln per
  step — the DSIR/idf precedent — summed by prefix scan), so no
  cross-engine float product ever forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ses_forecast(
    series: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    alpha_den: int = 4,
) -> DataFrame:
    """Single exponential smoothing with alpha = 1/``alpha_den`` on
    exact integers, per key over the OBSERVED periods in order:

        s_1       = x_1
        s_t       = s_{t-1} + trunc((x_t − s_{t-1}) / alpha_den)

    (TRUNCATION toward zero, the engine-portable choice: DuckDB's
    integer ``//`` truncates on negatives — measured, part 1790's
    first down-step — while Python's ``//`` floors, so the walker
    sign-factors: ``d // a`` for d ≥ 0, ``-((-d) // a)`` otherwise;
    the oracle's ``//`` then replays it verbatim. Same discipline as
    the q251/q253 sign-factored divisions.) The one-step-ahead
    forecast for period t is s_{t-1} — the level BEFORE seeing x_t —
    so the output carries the honest forecast error.

    Returns one row per (key, period): ``(key_col, period_col, value,
    forecast, level, abs_err)`` with ``forecast`` NULL on each key's
    first period (no prior level exists).

    Scale: the recurrence is irreducibly sequential PER KEY (trunc
    inside every step — no prefix-sum trick recovers it; contrast the
    set-based FIFO/KM shapes), but keys are independent, so the apply
    groups on a HASH BUCKET of the key (not the key itself): each
    Arrow batch carries MANY series sorted by (key, period) and one
    Python pass walks them all, resetting at key boundaries — the
    per-group pandas overhead of millions of tiny groups is the cost
    this amortizes (measured 8.1 s → sub-second on 2 000 series at
    sf0.1; per-key grouping paid ~4 ms of pandas per group). Oracle:
    RECURSIVE CTE stepping all keys in lockstep on the per-key row
    number.
    """
    import pandas as pd

    if alpha_den < 1:
        raise ValueError("alpha_den must be >= 1")
    n_buckets = 64
    # the output schema hardcodes `key long`, so the key is cast
    # EXPLICITLY here (integer-key contract — a string/decimal key
    # would otherwise surface as an Arrow conversion error or silent
    # nulls at apply time, ADVICE r10); non-castable types fail loudly
    # at plan time via the analyzer
    key_type = dict(series.dtypes).get(key_col, "")
    if key_type in ("string", "binary", "boolean") or key_type.startswith(
        ("array", "map", "struct", "decimal")
    ):
        raise TypeError(
            f"ses_forecast requires an integer {key_col!r} key "
            f"(got {key_type}); hash or dictionary-encode the key first"
        )
    src = series.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(period_col).cast("long").alias("period"),
        F.col(value_col).cast("long").alias("value"),
    ).withColumn("_b", F.pmod(F.xxhash64("key"), F.lit(n_buckets)))
    out_schema = (
        "key long, period long, value long, forecast long, "
        "level long, abs_err long"
    )

    # no annotations on the walker (stringified-hints gotcha, see
    # history.avco_inventory)
    def walk(pdf):
        pdf = pdf.sort_values(["key", "period"]).reset_index(drop=True)
        level = None
        prev_key = None
        fc, lv, ae = [], [], []
        for k, x in zip(pdf["key"], pdf["value"]):
            x = int(x)
            if k != prev_key:
                prev_key = k
                level = None
            if level is None:
                fc.append(None)
                ae.append(None)
                level = x
            else:
                fc.append(level)
                ae.append(abs(x - level))
                d = x - level
                step = d // alpha_den if d >= 0 else -((-d) // alpha_den)
                level = level + step
            lv.append(level)
        pdf["forecast"] = pd.array(fc, dtype="Int64")
        pdf["level"] = lv
        pdf["abs_err"] = pd.array(ae, dtype="Int64")
        return pdf[["key", "period", "value", "forecast", "level", "abs_err"]]

    return (
        src.groupBy("_b")
        .applyInPandas(walk, schema=out_schema)
        .withColumnRenamed("key", key_col)
        .withColumnRenamed("period", period_col)
        .withColumnRenamed("value", value_col)
    )


def km_survival_curve(
    durations: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival curve on exact integers, carried in LOG
    space. Input: one row per subject with an integer duration and an
    event flag (1 = the event happened at ``duration``, 0 = censored
    there — still at risk through it, then gone).

    At each distinct EVENT time t (ascending):

        n_t (at risk)    = #{duration >= t}
        d_t (events)     = #{duration == t AND event = 1}
        hazard_e6        = d_t·1e6 div n_t
        log_surv_e6      = Σ_{t' <= t} round(ln((n_t' − d_t') / n_t') · 1e6)

    — the KM product Π(1 − d/n) telescopes to a SUM of per-step logs,
    so the only float op is one ln of an integer ratio per distinct
    event time, e6-rounded (the DSIR/idf precedent); no cross-engine
    float product ever accumulates. S(t) = exp(log_surv_e6 / 1e6) for
    human reading — deliberately NOT computed in-engine (exp rounding
    is not cross-engine-pinned; ln is the established precedent).
    The step where everyone remaining dies (d = n) reports NULL logs
    (the curve hits exactly 0 — log-undefined, standard KM).

    Returns one row per distinct event time: ``(t, n_at_risk,
    d_events, n_censored_at_t, hazard_e6, log_surv_e6)``.

    Scale: one keyed value-count over (duration, event), one two-phase
    prefix scan over the BOUNDED distinct-duration table (risk counts
    = total − cumulative-before), a second bounded prefix scan for the
    log sum. No raw-row window anywhere.
    """
    from cubicerp_client_etl_spark.operators.prefix import prefix_sum

    vc = durations.groupBy(
        F.col(duration_col).cast("bigint").alias("t")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_all"),
        F.sum(
            F.when(F.col(event_col).cast("int") == 1, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("d_events"),
    )
    cum = prefix_sum(vc, order_by=[F.col("t")], value_col="_n_all", out_col="_cum")
    total = cum.agg(F.max("_cum").cast("bigint").alias("_total"))
    risk = cum.crossJoin(F.broadcast(total)).withColumn(
        "n_at_risk", (F.col("_total") - F.col("_cum") + F.col("_n_all")).cast("bigint")
    )
    ev = risk.where(F.col("d_events") > 0).select(
        "t",
        "n_at_risk",
        "d_events",
        (F.col("_n_all") - F.col("d_events")).cast("bigint").alias(
            "n_censored_at_t"
        ),
        F.expr(
            "CAST(CAST(d_events AS DECIMAL(38,0)) * 1000000"
            " div n_at_risk AS BIGINT)"
        ).alias("hazard_e6"),
        F.when(
            F.col("d_events") < F.col("n_at_risk"),
            F.round(
                F.log(
                    (F.col("n_at_risk") - F.col("d_events")).cast("double")
                    / F.col("n_at_risk").cast("double")
                )
                * 1_000_000
            ).cast("bigint"),
        ).alias("_step_log_e6"),
    )
    # second bounded prefix scan: the cumulative log-survival. A d = n
    # step (log-undefined: the curve hits exactly 0) can only be the
    # LAST event time — every remaining subject ends there — so the
    # NULL needs no forward propagation; the final when() pins it.
    curved = prefix_sum(
        ev,
        order_by=[F.col("t")],
        value_col="_step_log_e6",
        out_col="_ls",
    )
    return curved.select(
        "t",
        "n_at_risk",
        "d_events",
        "n_censored_at_t",
        "hazard_e6",
        F.when(F.col("d_events") < F.col("n_at_risk"), F.col("_ls"))
        .cast("bigint")
        .alias("log_surv_e6"),
    )


def holt_forecast(
    series: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    alpha_den: int = 4,
    beta_den: int = 4,
) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend) on
    exact integers, per key over the observed periods in order:

        l_1 = x_1,  b_1 = 0
        f_t = l_{t-1} + b_{t-1}            (one-step-ahead forecast)
        l_t = f_t + trunc((x_t − f_t) / alpha_den)
        b_t = b_{t-1} + trunc(((l_t − l_{t-1}) − b_{t-1}) / beta_den)

    — the error-correction form of Holt's method with alpha =
    1/alpha_den, beta = 1/beta_den, every division TRUNCATED toward
    zero with the sign-factored rule that matches DuckDB's ``//`` on
    positives and replays exactly on negatives (the ses_forecast
    discipline; Holt extends it with the trend state the SES level
    can't capture — a steadily growing demand series saturates SES
    one step behind, while Holt's b_t carries the slope).

    Returns one row per (key, period): ``(key_col, period_col, value,
    forecast, level, trend, abs_err)`` with ``forecast``/``abs_err``
    NULL on each key's first period.

    Scale: same 64-way hash-bucketed Arrow walk as ses_forecast (the
    recurrence is irreducibly sequential per key; buckets amortize
    pandas overhead across many keys per batch). Integer-key contract:
    the key is cast to long (raises on string/decimal). Oracle:
    RECURSIVE CTE carrying BOTH states per key per step.
    """
    import pandas as pd

    if alpha_den < 1 or beta_den < 1:
        raise ValueError("alpha_den and beta_den must be >= 1")
    key_type = dict(series.dtypes).get(key_col, "")
    if key_type in ("string", "binary", "boolean") or key_type.startswith(
        ("array", "map", "struct", "decimal")
    ):
        raise TypeError(
            f"holt_forecast requires an integer {key_col!r} key "
            f"(got {key_type}); hash or dictionary-encode the key first"
        )
    n_buckets = 64
    src = series.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(period_col).cast("long").alias("period"),
        F.col(value_col).cast("long").alias("value"),
    ).withColumn("_b", F.pmod(F.xxhash64("key"), F.lit(n_buckets)))
    out_schema = (
        "key long, period long, value long, forecast long, "
        "level long, trend long, abs_err long"
    )

    def _trunc(d: int, den: int) -> int:
        return d // den if d >= 0 else -((-d) // den)

    # no annotations on the walker (stringified-hints gotcha)
    def walk(pdf):
        pdf = pdf.sort_values(["key", "period"]).reset_index(drop=True)
        level = trend = None
        prev_key = None
        fc, lv, tr, ae = [], [], [], []
        for k, x in zip(pdf["key"], pdf["value"]):
            x = int(x)
            if k != prev_key:
                prev_key = k
                level = None
            if level is None:
                fc.append(None)
                ae.append(None)
                level, trend = x, 0
            else:
                f = level + trend
                fc.append(f)
                ae.append(abs(x - f))
                new_level = f + _trunc(x - f, alpha_den)
                trend = trend + _trunc((new_level - level) - trend, beta_den)
                level = new_level
            lv.append(level)
            tr.append(trend)
        pdf["forecast"] = pd.array(fc, dtype="Int64")
        pdf["level"] = lv
        pdf["trend"] = tr
        pdf["abs_err"] = pd.array(ae, dtype="Int64")
        return pdf[
            ["key", "period", "value", "forecast", "level", "trend", "abs_err"]
        ]

    return (
        src.groupBy("_b")
        .applyInPandas(walk, schema=out_schema)
        .withColumnRenamed("key", key_col)
        .withColumnRenamed("period", period_col)
        .withColumnRenamed("value", value_col)
    )


def croston_forecast(
    series: DataFrame,
    key_col: str,
    period_col: str,
    value_col: str,
    alpha_den: int = 4,
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972, the
    standard forecaster for slow movers — spare parts, long-tail SKUs)
    on exact integers, per key over the observed demand periods in
    order. Two smoothed states — demand size ``z`` and inter-demand
    interval ``p`` — update only when demand occurs (here every
    observed row carries demand; the interval is the PERIOD GAP to the
    previous demand):

        row 1:  z = x_1,  p undefined
        row t:  q_t   = period_t - period_{t-1}        (gap, >= 1)
                rate  = 1e6 * z / p   (one-step-ahead, BEFORE update;
                                       undefined until p exists)
                z    += trunc((x_t - z) / alpha_den)
                p     = q_t                  on its first observation,
                        p + trunc((q_t - p) / alpha_den)  after

    — the same truncated-toward-zero division discipline as
    ``ses_forecast``/``holt_forecast`` (DuckDB's integer ``//``
    truncates; the walker sign-factors to match), so the recursive-CTE
    oracle replays every state bit-for-bit. This is the corpus's first
    THREE-state recursive oracle (z, p, and the previous period for
    the gap).

    Returns one row per (key, period): ``(key_col, period_col, value,
    gap, size_level, interval_level, rate_e6)`` — ``gap`` NULL on each
    key's first row, ``interval_level`` NULL until the second,
    ``rate_e6`` (the 1e6-scaled demand-per-period forecast) NULL until
    the third; ``size_level``/``interval_level`` are post-update.

    Scale: same 64-way hash-bucketed Arrow walk as Holt (sequential
    per key, keys independent, buckets amortize pandas overhead).
    Integer-key contract: the key casts to long (raises on
    string/decimal keys).
    """
    import pandas as pd

    if alpha_den < 1:
        raise ValueError("alpha_den must be >= 1")
    key_type = dict(series.dtypes).get(key_col, "")
    if key_type in ("string", "binary", "boolean") or key_type.startswith(
        ("array", "map", "struct", "decimal")
    ):
        raise TypeError(
            f"croston_forecast requires an integer {key_col!r} key "
            f"(got {key_type}); hash or dictionary-encode the key first"
        )
    n_buckets = 64
    src = series.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(period_col).cast("long").alias("period"),
        F.col(value_col).cast("long").alias("value"),
    ).withColumn("_b", F.pmod(F.xxhash64("key"), F.lit(n_buckets)))
    out_schema = (
        "key long, period long, value long, gap long, "
        "size_level long, interval_level long, rate_e6 long"
    )

    def _trunc(d: int, den: int) -> int:
        return d // den if d >= 0 else -((-d) // den)

    # no annotations on the walker (stringified-hints gotcha)
    def walk(pdf):
        pdf = pdf.sort_values(["key", "period"]).reset_index(drop=True)
        prev_key = prev_period = z = p = None
        gaps, zs, ps, rates = [], [], [], []
        for k, per, x in zip(pdf["key"], pdf["period"], pdf["value"]):
            per, x = int(per), int(x)
            if k != prev_key:
                prev_key = k
                prev_period = z = p = None
            if z is None:
                gaps.append(None)
                rates.append(None)
                z = x
            else:
                q = per - prev_period
                gaps.append(q)
                rates.append(1_000_000 * z // p if p is not None else None)
                z = z + _trunc(x - z, alpha_den)
                p = q if p is None else p + _trunc(q - p, alpha_den)
            prev_period = per
            zs.append(z)
            ps.append(p)
        pdf["gap"] = pd.array(gaps, dtype="Int64")
        pdf["size_level"] = zs
        pdf["interval_level"] = pd.array(ps, dtype="Int64")
        pdf["rate_e6"] = pd.array(rates, dtype="Int64")
        return pdf[
            ["key", "period", "value", "gap", "size_level",
             "interval_level", "rate_e6"]
        ]

    return (
        src.groupBy("_b")
        .applyInPandas(walk, schema=out_schema)
        .withColumnRenamed("key", key_col)
        .withColumnRenamed("period", period_col)
        .withColumnRenamed("value", value_col)
    )
