"""Deterministic sampling & mixture weighting (L-pipeline extension).

Training-data pipelines blend corpora at fixed per-source rates ("20%
web, 50% books, …"). ``sample()``-style RNG sampling is partition- and
retry-dependent — rerunning the job yields a different corpus. The
engine's form is KEYED Bernoulli sampling: a row is kept iff the first
8 hex chars of ``md5(key || '|' || seed)`` fall below ``rate·2³²``,
compared as zero-padded lowercase hex STRINGS. Properties:

* deterministic — same key/seed/rate ⇒ same decision on any cluster,
  any partitioning, any retry;
* engine-portable — md5 and substring behave identically in Spark and
  DuckDB, and the hex-string comparison sidesteps integer-conversion
  portability (the reason the driver's oracle can check it exactly);
* map-only — no shuffle, no state; scales to any corpus size;
* composable — different seeds give independent samples (the md5 bits
  are effectively independent across seeds).

The reference has no sampling surface; this generalizes its per-row
routing idea (cubicerpetl.py:494-537 routes per row by mode — here per
row by hash) to corpus construction.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """rate∈[0,1] → 8-hex-char cutoff for the md5 prefix. Rates are
    quantized to k/2³². rate=1.0 returns 'g' — lexicographically above
    every hex string, so `hash < 'g'` keeps ALL rows exactly (a plain
    'ffffffff' cutoff would drop the 2⁻³² hash-prefix collision)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 2**32), "08x")


def sample_mark(key: Column, rate: float, seed: str = "") -> Column:
    """Boolean keep/drop decision for a deterministic Bernoulli sample."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    h = F.substring(F.md5(F.concat(key.cast("string"), F.lit("|" + seed))), 1, 8)
    return h < F.lit(_hex_threshold(rate))


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keyed Bernoulli sample at ``rate`` — see module docstring."""
    return df.filter(sample_mark(F.col(key_col), rate, seed))


def weighted_mixture(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: Mapping[str, float],
    seed: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group mixture sampling in ONE map-only pass: each row's keep
    threshold comes from its ``group_col`` value (e.g. lang or source
    corpus), so the output corpus realizes the requested blend without
    splitting/unioning the input N ways."""
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + seed))), 1, 8
    )
    thr: Column = F.lit(_hex_threshold(default_rate))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(_hex_threshold(r))).otherwise(thr)
    return df.filter(h < thr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    seed: str = "",
) -> DataFrame:
    """EXACT deterministic per-group cap: keep the ``n`` rows of each
    group with the smallest ``md5(key || '|' || seed)`` — a uniform
    "at most N documents per source" subsample that is bit-stable
    across engines and reruns (no RNG, no input-order dependence).

    Scale caveat (the q056-style exact/scale split): the row_number
    window shuffles every row of a group to one partition — fine for
    many medium groups, a skew hazard when single groups hold billions
    of rows. For that regime use ``rate_cap_per_group``: same keyed
    hash, but a per-group THRESHOLD instead of a rank — map-only after
    a broadcast of group counts, at the cost of ~N (binomial, not
    exactly N) rows per group.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + seed))), 1, 16
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def rate_cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n: int,
    seed: str = "",
) -> DataFrame:
    """Scale-path per-group cap: compute each group's size (one cheap
    pre-aggregation — group cardinality rows, always broadcastable),
    derive keep-rate ``min(1, n/size)`` as an exact hex threshold
    ``floor(n·2³² / size)``, and filter with the SAME keyed-hash
    comparison as ``weighted_mixture`` — map-only over the corpus, no
    per-group shuffle of the data, no skew (a billion-row group costs
    the same scan as anything else). Yields ~``n`` rows per group
    (binomial); use ``cap_per_group`` when exactly-N matters more than
    skew immunity. Deterministic and engine-portable: the threshold is
    integer arithmetic on counts, the decision a hex-string compare.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_gc"))
    # exact integer threshold (floor(n·2³²/size)) — double division can
    # misround the floor for large groups, so stay in bigint `div`
    thr = F.when(F.col("_gc") <= n, F.lit("g")).otherwise(
        F.lpad(
            F.lower(
                F.conv(
                    F.expr(f"CAST({n} * 4294967296 AS BIGINT) div _gc").cast(
                        "string"
                    ),
                    10,
                    16,
                )
            ),
            8,
            "0",
        )
    )
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + seed))), 1, 8
    )
    return (
        df.join(F.broadcast(counts.select(group_col, thr.alias("_thr"))), group_col)
        .filter(h < F.col("_thr"))
        .drop("_thr")
    )


def stratified_sample_exact(
    df: DataFrame,
    group_col: str,
    key_col: str,
    total_n: int,
    seed: str = "",
) -> DataFrame:
    """EXACTLY ``total_n`` rows, allocated across groups proportionally
    to group size by the largest-remainder (Hamilton) method, selected
    within each group by smallest ``md5(key || '|' || seed)`` — the
    deterministic form of stratified sampling ("give me exactly 100k
    docs, same language mix as the corpus").

    Quota arithmetic is exact integers: ``base_g = total_n·size_g div
    total``; the ``total_n - Σbase`` leftover seats go to the largest
    remainders ``(total_n·size_g) mod total`` (ties by group value —
    fully ordered, engine-portable). Selection reuses the keyed-hash
    rank of ``cap_per_group``.

    Scale: quota computation runs on the group-cardinality table (tiny
    by definition — single partition is fine and bounded); selection is
    one row_number window per group over the data. Groups smaller than
    their quota cap at their size (the shortfall is NOT redistributed —
    callers wanting that run a second pass on the residue).
    """
    if total_n < 0:
        raise ValueError("total_n must be >= 0")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_gc"))
    tot = counts.agg(F.sum("_gc").alias("_tot"))
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        "_gc",
        F.expr(f"CAST({total_n} AS BIGINT) * _gc div _tot").alias("_base"),
        F.expr(f"(CAST({total_n} AS BIGINT) * _gc) % _tot").alias("_rem"),
    )
    wr = Window.orderBy(F.col("_rem").desc(), F.col(group_col).asc())
    # leftover seats = total_n - Σbase; rank groups by remainder (the
    # window is over the GROUP table — bounded rows, single partition OK)
    leftover = F.lit(total_n).cast("bigint") - F.sum("_base").over(
        Window.partitionBy()
    )
    quotas = alloc.select(
        group_col,
        (
            F.col("_base")
            + F.when(F.row_number().over(wr) <= leftover, 1).otherwise(0)
        ).alias("_quota"),
    )
    h = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|" + seed))), 1, 16
    )
    wg = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("_rn", F.row_number().over(wg))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def weighted_priority_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    id_col: str,
    n: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the
    ``n`` rows per group with the smallest integer priority
    ``(hash32(id|seed) * 1e6) div weight`` — a row with twice the
    weight halves its expected priority, so selection probability
    scales ~proportionally to ``weight_col`` (the exact-integer
    stand-in for Efraimidis–Spirakis u^(1/w) priorities, chosen
    because integer div replays bit-identically in any engine while
    pow/log may differ in the last ulp across libm implementations).

    Importance sampling for corpus work: weight by quality score to
    keep high-quality documents preferentially, deterministically, and
    reproducibly on any cluster/retry. Weights must be positive
    integers (scale fractional scores first).

    One window shuffle on the group; priorities are map-side
    expressions.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from cubicerp_client_etl_spark.functions import md5_hash32

    h32 = md5_hash32(
        F.concat(F.col(id_col).cast("string"), F.lit("|wps" + seed))
    )
    # zero/negative weights would silently invert the policy (NULL/
    # negative priorities sort FIRST under ascending order) — fail loud
    # per row instead of sampling garbage
    guard = (
        f"CASE WHEN {weight_col} > 0 THEN {weight_col} "
        f"ELSE raise_error('weighted_priority_sample: weights must be "
        f"positive integers') END"
    )
    out = df.withColumn("_num", h32 * F.lit(1_000_000)).withColumn(
        "_prio", F.expr(f"_num div ({guard})")
    )
    w = Window.partitionBy(group_col).orderBy("_prio", id_col)
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_num", "_prio", "_rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 900), ("val", 50), ("test", 50)),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment — the split
    every released corpus ships with. Adds ``split_col``; no rows are
    dropped, so the splits PARTITION the input by construction
    (disjoint + exhaustive — the property audit crews re-verify by
    hand when a split was done with rand()).

    Each row's bucket is ``md5_hash32(id | salt) mod Σ shares``; split
    boundaries are the running share totals, so a (name, share) spec of
    (900, 50, 50) is an exact 90/5/5 per-mille partition in expectation
    with membership a pure function of the id — stable across reruns,
    partitioning, cluster size, and engine (the DuckDB oracle replays
    the same bucket arithmetic). Hashing the ID rather than rand()
    also keeps membership stable under corpus APPEND: old rows never
    migrate between splits when new data arrives.

    Scale: one map-side projection, no shuffle, no state.
    """
    if not splits:
        raise ValueError("splits must not be empty")
    if any(s <= 0 for _, s in splits):
        raise ValueError("split shares must be positive")
    names = [n for n, _ in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    from cubicerp_client_etl_spark.functions import md5_hash32

    total = sum(s for _, s in splits)
    bucket = (
        md5_hash32(F.concat(F.col(id_col).cast("string"), F.lit("|split" + salt)))
        % total
    )
    expr = None
    acc = 0
    for name, share in splits[:-1]:
        acc += share
        cond = bucket < acc
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def bucketed_negative_sample(
    anchors: DataFrame,
    candidates: DataFrame,
    anchor_id: str,
    cand_id: str,
    exclude_on: str | None = None,
    k: int = 4,
    n_buckets: int = 32,
    seed: str = "",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor, pick ``k`` pseudo-random negatives from the candidate
    pool WITHOUT the cross join a naive "rank all candidates per
    anchor" implies.

    Construction: candidates are hashed into ``n_buckets`` buckets
    (``md5_hash32(cand_id|seed) mod n_buckets``); each anchor probes
    ``k`` buckets (``md5_hash32(anchor_id|j|seed) mod n_buckets`` for
    ``j = 1..k``) and takes the candidate with the SMALLEST md5 of the
    (anchor, candidate, probe) triple inside each probed bucket,
    skipping candidates that match the anchor's ``exclude_on`` column
    (same label / same document — the positives). Two probes of one
    anchor can land in the same bucket and (since each probe re-ranks
    by its own hash) can pick the same negative — callers wanting
    distinct-per-anchor negatives dedup ``(anchor, neg_id)`` and read
    the collision rate off the audit; with ``n_buckets ≫ k`` the
    collision probability is ≈ k²/(2·n_buckets).

    Deterministic and engine-portable (keyed md5 everywhere, the module
    discipline), so a DuckDB oracle replays every pick exactly. A probe
    whose bucket holds no admissible candidate yields no row (reported
    by the caller's audit, never silently resampled — resampling would
    break determinism).

    Scale posture: the probe→bucket join is an equi-join on the bucket
    id; per-probe candidate work is one bucket ≈ |candidates|/n_buckets
    rows, so total candidate rows ≈ |anchors|·k·|candidates|/n_buckets.
    Size ``n_buckets ≈ |candidates|/c`` for a constant per-bucket c and
    the whole stage is LINEAR in the corpus; the per-(anchor,probe)
    top-1 is a min-struct aggregate (map-side combinable), not a window
    over raw rows.

    Returns ``(anchor_id, probe, neg_id)`` with ``probe ∈ 1..k``.
    """
    from cubicerp_client_etl_spark.functions import md5_hash32

    if k < 1 or n_buckets < 1:
        raise ValueError("k >= 1 and n_buckets >= 1 required")
    sfx = "|" + seed
    probes = anchors.select(
        F.col(anchor_id).alias("_aid"),
        *(
            [F.col(exclude_on).alias("_axl")]
            if exclude_on is not None
            else []
        ),
        F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("probe"),
    ).withColumn(
        "_bkt",
        F.pmod(
            md5_hash32(
                F.concat(
                    F.col("_aid").cast("string"),
                    F.lit("|"),
                    F.col("probe").cast("string"),
                    F.lit(sfx),
                )
            ),
            F.lit(int(n_buckets)),
        ),
    )
    pool = candidates.select(
        F.col(cand_id).alias("_cid"),
        *(
            [F.col(exclude_on).alias("_cxl")]
            if exclude_on is not None
            else []
        ),
    ).withColumn(
        "_bkt",
        F.pmod(
            md5_hash32(F.concat(F.col("_cid").cast("string"), F.lit(sfx))),
            F.lit(int(n_buckets)),
        ),
    )
    joined = probes.join(pool, "_bkt").where(F.col("_aid") != F.col("_cid"))
    if exclude_on is not None:
        joined = joined.where(
            ~F.col("_axl").eqNullSafe(F.col("_cxl"))
        )
    pick = F.md5(
        F.concat(
            F.col("_aid").cast("string"),
            F.lit("|"),
            F.col("_cid").cast("string"),
            F.lit("|"),
            F.col("probe").cast("string"),
            F.lit(sfx),
        )
    )
    return (
        joined.select("_aid", "probe", F.struct(pick.alias("_h"), F.col("_cid")).alias("_s"))
        .groupBy("_aid", "probe")
        .agg(F.min("_s").alias("_m"))
        .select(
            F.col("_aid").alias(anchor_id),
            "probe",
            F.col("_m._cid").alias("neg_id"),
        )
    )


def effective_sample_size(df: DataFrame, weight_col: str) -> DataFrame:
    """Kish effective sample size of a non-negative weight column —
    the one-row audit run before weighted sampling / importance
    reweighting ships: ``ESS = (Σw)² / Σw²`` collapses toward 1 when a
    few rows dominate the weight mass (the estimator variance blows
    up by n/ESS).

    Exact integer arithmetic: (Σw)² and Σw² run in DECIMAL(38,0)
    (safe to Σw < 1e19 — a 100 TB corpus weighted by token counts sums
    to ~1e16), the ESS itself is an integer ``div``, and the shares
    are e6 floors. Output:

    ``(n_rows, ess, ess_share_e6, max_w, top_w_share_e6)``

    Scale: one map-side-combinable aggregate — a single scan, no
    shuffle beyond the 1-row combine.
    """
    w = F.col(weight_col).cast("decimal(38,0)")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(w).cast("decimal(38,0)").alias("_sw"),
        F.sum(w * w).cast("decimal(38,0)").alias("_sw2"),
        F.max(F.col(weight_col)).cast("bigint").alias("max_w"),
    )
    return agg.select(
        "n_rows",
        # CASE guards: an all-zero weight column is a caller bug but
        # must report ess=0, not abort the job under ANSI div-by-zero
        F.expr(
            "CAST(CASE WHEN _sw2 > 0 THEN (_sw * _sw) div _sw2"
            " ELSE 0 END AS BIGINT)"
        ).alias("ess"),
        F.expr(
            "CAST(CASE WHEN _sw2 > 0 THEN"
            " (_sw * _sw) * 1000000 div (_sw2 * n_rows)"
            " ELSE 0 END AS BIGINT)"
        ).alias("ess_share_e6"),
        "max_w",
        F.expr(
            "CAST(CASE WHEN _sw > 0 THEN"
            " CAST(max_w AS DECIMAL(38,0)) * 1000000 div _sw"
            " ELSE 0 END AS BIGINT)"
        ).alias("top_w_share_e6"),
    )
