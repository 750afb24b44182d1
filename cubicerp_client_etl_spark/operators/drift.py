"""Corpus drift detection — distribution shift between two corpus
snapshots (crawl batches, before/after a filter change, train vs
incoming data).

The statistic is the per-token absolute difference of e6-scaled
unigram probabilities over the UNION vocabulary:
``delta_e6(tok) = |cntA(tok)·1e6 div nA - cntB(tok)·1e6 div nB|``.
Summed over the vocabulary this is (2e6×) the total-variation distance
— the standard drift alarm — and the top-|delta| tokens name WHAT
drifted (a spam template, a language shift, a broken decoder).
Integer arithmetic end-to-end: no KL/JS logs (not bit-portable across
engines), same ordering for alerting purposes, exactly replayable by
the DuckDB oracle.

Plan shape: one token-keyed aggregation per side (map-side partial
counts), a full-outer join on the token key, map-only deltas, and a
TakeOrdered top-k — no global window, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cubicerp_client_etl_spark.functions import e6_floor_ratio
from cubicerp_client_etl_spark.checkpointing import pin


def unigram_drift(
    side_a: DataFrame,
    side_b: DataFrame,
    token_col: str = "token",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` drifting tokens between two token streams (one
    row = one occurrence). Output per token:
    ``(token, p_a_e6, p_b_e6, delta_e6)``, largest delta first, ties
    broken by token for determinism. A token absent from one side
    contributes its full probability on the other — disappearance IS
    drift."""
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    ca = side_a.groupBy(token_col).agg(F.count(F.lit(1)).alias("_ca"))
    cb = side_b.groupBy(token_col).agg(F.count(F.lit(1)).alias("_cb"))
    # totals as 1-row broadcast aggregates OVER THE COUNT TABLES — no
    # driver .count() and no second scan of the raw token streams
    ta = ca.agg(F.sum("_ca").cast("bigint").alias("_na"))
    tb = cb.agg(F.sum("_cb").cast("bigint").alias("_nb"))
    joined = (
        ca.join(cb, token_col, "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            token_col,
            # exact decimal-floor ratio: no ANSI overflow abort past
            # count ~9.2e12 (functions.e6_floor_ratio, ADVICE r5)
            e6_floor_ratio(F.coalesce(F.col("_ca"), F.lit(0)), F.col("_na")).alias(
                "p_a_e6"
            ),
            e6_floor_ratio(F.coalesce(F.col("_cb"), F.lit(0)), F.col("_nb")).alias(
                "p_b_e6"
            ),
        )
    )
    out = joined.withColumn(
        "delta_e6", F.abs(F.col("p_a_e6") - F.col("p_b_e6")).cast("bigint")
    ).select(
        token_col,
        F.col("p_a_e6").cast("bigint"),
        F.col("p_b_e6").cast("bigint"),
        "delta_e6",
    )
    return out.orderBy(F.col("delta_e6").desc(), token_col).limit(top_k)


def source_overlap_matrix(
    sh: "DataFrame", group_col: str = "source", sh_col: str = "sh"
) -> "DataFrame":
    """Pairwise shingle-set overlap between corpus groups (sources,
    snapshots, languages): for each unordered group pair, the distinct-
    shingle intersection plus exact e6 Jaccard and per-side containment
    — the release-datasheet view of "how much of source B is already in
    source A" (catches mirror sites, re-crawls, and licensing overlap
    before training).

    ``sh``: (group_col, sh_col) rows, one per group×shingle — need not
    be distinct (deduped here).

    Scale: one distinct (keyed shuffle on the shingle hash), one
    equi-join on the shingle restricted to ``a < b`` group order —
    never all-pairs on rows — then a #group²-bounded aggregate; the
    per-group size table broadcasts. Pairs with empty intersection are
    omitted (they carry no signal and would need a cross join to
    enumerate).
    """
    from cubicerp_client_etl_spark.functions import e6_floor_ratio

    # sizes + the pair build read the distinct frame; checkpoint so the
    # caller's shingle explode + the distinct run once.
    d = sh.select(
        F.col(group_col).alias("_g"), F.col(sh_col).alias("_sh")
    ).distinct().transform(pin)
    sizes = d.groupBy("_g").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    # NOTE (r15 measured): a collect_set-per-shingle + pair-explode
    # rewrite of this self-join (aggregate-before-shuffle) measured ~1 s
    # SLOWER at sf0.1 — the set aggregate shuffles the same bytes the
    # join does and loses the join's AQE exchange reuse. Join retained.
    a = d.select(F.col("_g").alias("source_a"), "_sh")
    b = d.select(F.col("_g").alias("source_b"), "_sh")
    inter = (
        a.join(b, "_sh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("_g").alias("source_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("_g").alias("source_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_inter",
            "sz_a",
            "sz_b",
            e6_floor_ratio(
                F.col("n_inter"),
                F.col("sz_a") + F.col("sz_b") - F.col("n_inter"),
            ).alias("jaccard_e6"),
            e6_floor_ratio(F.col("n_inter"), F.col("sz_a")).alias("cont_a_e6"),
            e6_floor_ratio(F.col("n_inter"), F.col("sz_b")).alias("cont_b_e6"),
        )
    )


def chi2_contingency_audit(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Fixed-point χ² contingency audit between two categorical
    columns — the drift screen ("did the event-type mix shift by
    source?") run before retraining or after an ingestion change.

    All probabilities are e6-quantized floor ratios, which makes the
    statistic DETERMINISTIC and DuckDB-replayable (a float χ² would
    drift across engines in the last ulps). Per cell, with
    ``a = o·1e6 div T``, ``b = r·1e6 div T``, ``c = c·1e6 div T``:

        cell_e6 = T · (a·1e6 − b·c)² div (1e6 · b·c)

    which is the exact χ² cell ``T·(p_oc − p_r·p_c)²/(p_r·p_c)``
    evaluated on the quantized shares, ×1e6. Quantization error is
    bounded by the e6 grid (~1e-6·T per cell) — this is a drift
    SCREEN, not an inference-grade p-value, and the output carries the
    exact integer counts so a consumer can recompute any statistic.
    Decimal(38,0) internals: (a·1e6 − b·c)² ≤ 1e24, ×T ≤ 1e38 for
    T < 1e14 — past the 100 TB row budget.

    QUANTIZATION FLOOR: a marginal share rarer than 1-in-1e6
    (``row_total·1e6 < grand_total``) quantizes to b = 0 (likewise c),
    which would zero the χ² divisor. Such cells report
    ``cell_chi2_e6 = NULL`` — explicitly, on BOTH engines (the Spark
    expr and every oracle carry the same ``b·c > 0`` guard; an
    unguarded oracle would abort on division-by-zero in DuckDB while
    Spark silently NULLed under non-ANSI). NULL here means "below the
    e6 resolution", not zero drift; downstream sums skip NULLs in both
    engines identically.

    Output: one row per (row value, col value) cell —
    ``(row_val, col_val, n, row_total, col_total, grand_total,
    expected_e0, cell_chi2_e6)`` with ``expected_e0 = r·c div T`` (the
    floor of the expected count). Cells absent from the data (o = 0
    for a seen row/col pair) are INCLUDED via the row×col grid — a
    vanished combination is drift too.

    Scale: one keyed count over the data, bounded row/col marginal
    aggregates, and a grid join of the two bounded marginals
    (|rows|×|cols| cells — categorical dims, broadcast both ways).
    """
    cells = df.groupBy(
        F.col(row_col).alias("row_val"), F.col(col_col).alias("col_val")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rt = cells.groupBy("row_val").agg(
        F.sum("n").cast("bigint").alias("row_total")
    )
    ct = cells.groupBy("col_val").agg(
        F.sum("n").cast("bigint").alias("col_total")
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("grand_total"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(tot))
    full = grid.join(cells, ["row_val", "col_val"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
    )
    a = F.expr("CAST(n AS DECIMAL(38,0)) * 1000000 div grand_total")
    b = F.expr("CAST(row_total AS DECIMAL(38,0)) * 1000000 div grand_total")
    c = F.expr("CAST(col_total AS DECIMAL(38,0)) * 1000000 div grand_total")
    return (
        full.withColumn("_a", a)
        .withColumn("_b", b)
        .withColumn("_c", c)
        .select(
            "row_val",
            "col_val",
            "n",
            "row_total",
            "col_total",
            "grand_total",
            F.expr(
                "CAST(CAST(row_total AS DECIMAL(38,0)) * col_total"
                " div grand_total AS BIGINT)"
            ).alias("expected_e0"),
            F.expr(
                "CASE WHEN _b > 0 AND _c > 0 THEN"
                " CAST(CAST(grand_total AS DECIMAL(38,0))"
                " * (CAST(_a AS DECIMAL(38,0)) * 1000000 - CAST(_b AS DECIMAL(38,0)) * _c)"
                " * (CAST(_a AS DECIMAL(38,0)) * 1000000 - CAST(_b AS DECIMAL(38,0)) * _c)"
                " div (1000000 * CAST(_b AS DECIMAL(38,0)) * _c) AS BIGINT)"
                " ELSE NULL END"
            ).alias("cell_chi2_e6"),
        )
    )


def association_strength(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Cramér's V on top of :func:`chi2_contingency_audit` — the
    NORMALIZED association strength between two categoricals (0 =
    independent, 1e6 = fully determined), comparable across tables of
    different size and shape, which raw χ² is not:

        V = sqrt( χ² / (n · (min(r, c) − 1)) )
        v_e6 = isqrt_exact( χ²_e6 · 1e6 div (n·k) )

    — the e6/e12 units line up so the only non-integer step is the
    floor-corrected integer square root (``functions.isqrt_exact``,
    replayed in oracles as the same floor±1-corrected expression).
    Degenerate tables (min(r,c) = 1: a constant column) report
    v_e6 = 0 with the χ² still carried.

    Returns ONE row: ``(n, r_levels, c_levels, chi2_e6, cramers_v_e6)``.
    Scale: the χ² grid machinery (one keyed count + bounded marginal
    grid) plus a bounded rollup.
    """
    from cubicerp_client_etl_spark.functions import isqrt_exact

    cells = chi2_contingency_audit(df, row_col, col_col)
    agg = cells.agg(
        F.first("grand_total").cast("bigint").alias("n"),
        F.count_distinct("row_val").cast("bigint").alias("r_levels"),
        F.count_distinct("col_val").cast("bigint").alias("c_levels"),
        F.sum("cell_chi2_e6").cast("bigint").alias("chi2_e6"),
    )
    k = F.least(F.col("r_levels"), F.col("c_levels")) - 1
    # the k >= 1 guard is folded INTO the division (not only the outer
    # when): a degenerate single-level column makes the divisor 0 —
    # NULL under Spark non-ANSI but an ABORT under ANSI mode, and the
    # oracle's mirrored CTE would error in DuckDB before any outer CASE
    ratio = F.expr(
        "CASE WHEN least(r_levels, c_levels) >= 2 THEN"
        " CAST(CAST(chi2_e6 AS DECIMAL(38,0)) * 1000000"
        " div (n * (least(r_levels, c_levels) - 1)) AS BIGINT)"
        " ELSE 0 END"
    )
    return agg.select(
        "n",
        "r_levels",
        "c_levels",
        "chi2_e6",
        F.when(k >= 1, isqrt_exact(ratio))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("cramers_v_e6"),
    )


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    bucket_col: str,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    population over a shared (bounded) bucketing — THE standard ML
    feature-monitoring drift score (PSI < 0.1 stable, 0.1–0.25 watch,
    > 0.25 act, read against psi_e12/1e12):

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    Add-one smoothing on counts makes absent buckets finite (a bucket
    that vanished IS drift and must contribute, not NULL out):
    ``p_b = (c_b + 1) / (n + B)`` with B the bucket-grid size. Numeric
    discipline: shares are e6 floors; the ONLY float step is one ln
    per bucket of an integer ratio, rounded to e6 (the DSIR/idf
    precedent) — contributions multiply back to e12 integers, so the
    oracle replays every row.

    Returns one row per bucket in the union grid:
    ``(bucket, n_base, n_cur, p_e6, q_e6, llr_e6, psi_contrib_e12)``.
    Scale: two keyed counts (map-side combine), a bounded full-outer
    grid join, two broadcast 1-row totals.
    """
    cb = base.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base")
    )
    cc = cur.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cur")
    )
    grid = (
        cb.join(cc, "bucket", "full_outer")
        .withColumn("n_base", F.coalesce("n_base", F.lit(0)).cast("bigint"))
        .withColumn("n_cur", F.coalesce("n_cur", F.lit(0)).cast("bigint"))
    )
    tots = grid.agg(
        F.sum("n_base").cast("bigint").alias("_na"),
        F.sum("n_cur").cast("bigint").alias("_nc"),
        F.count(F.lit(1)).cast("bigint").alias("_B"),
    )
    g = grid.crossJoin(F.broadcast(tots))
    p_e6 = F.expr(
        "CAST((n_base + 1) * CAST(1000000 AS DECIMAL(38,0))"
        " div (_na + _B) AS BIGINT)"
    )
    q_e6 = F.expr(
        "CAST((n_cur + 1) * CAST(1000000 AS DECIMAL(38,0))"
        " div (_nc + _B) AS BIGINT)"
    )
    # ln of an integer ratio — smoothed, so both sides are >= 1/(n+B)
    llr_e6 = F.round(
        F.log(
            (
                (F.col("n_base") + 1).cast("double")
                * (F.col("_nc") + F.col("_B")).cast("double")
            )
            / (
                (F.col("n_cur") + 1).cast("double")
                * (F.col("_na") + F.col("_B")).cast("double")
            )
        )
        * 1_000_000
    ).cast("bigint")
    staged = g.select(
        "bucket",
        "n_base",
        "n_cur",
        p_e6.alias("p_e6"),
        q_e6.alias("q_e6"),
        llr_e6.alias("llr_e6"),
    )
    return staged.withColumn(
        "psi_contrib_e12",
        ((F.col("p_e6") - F.col("q_e6")) * F.col("llr_e6")).cast("bigint"),
    )
