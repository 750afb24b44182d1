"""Duplicate-cluster retention policy & incremental (cross-snapshot)
dedup.

Dropping duplicates is only half of dedup — production pipelines must
decide WHICH copy survives (the longest? the highest-quality? the
oldest?) and must dedup each incoming batch against everything already
ingested, without re-scanning history as all-pairs.

* ``bag_of_words_key`` — an order/repetition-insensitive content
  fingerprint: md5 of the sorted distinct token set. Catches the
  near-dup class exact hashing misses (same words, shuffled or
  repeated) while staying a pure map-side expression both Spark and
  DuckDB evaluate identically (so the driver's oracle can replay it).
* ``keep_best_per_cluster`` — one representative per duplicate
  cluster by explicit policy: max score, ties broken by a total-order
  key. ``max_by``-shaped window; one keyed shuffle.
* ``incremental_dedup`` — anti-join a new batch's content keys
  against the seen-key set. At scale the seen set is a parquet table
  of KEYS ONLY (not documents); the anti-join shuffles on the key,
  or broadcast when the batch's distinct keys are small. New-batch
  internal dups are resolved first so exactly one doc per new key
  survives.

Reference parity: the reference dedups per-row on ledger identity
(cubicerpetl.py write-mode handling); these operators generalize that
to content identity and corpus snapshots.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bag_of_words_key(text_col: Column | str, sep: str = " ") -> Column:
    """md5 over the sorted distinct token set of a document — equal for
    any two documents that use exactly the same vocabulary, regardless
    of word order or repetition. Map-only; engine-portable (DuckDB:
    ``md5(array_to_string(list_sort(list_distinct(string_split(...))),
    ...))``)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.array_sort(F.array_distinct(F.split(c, sep)))
    return F.md5(F.array_join(toks, sep))


def keep_best_per_cluster(
    df: DataFrame,
    cluster_col: Column | str,
    score: Column,
    tie_breaker: Column,
) -> DataFrame:
    """One row per cluster: the highest ``score``, ties resolved by
    ascending ``tie_breaker`` (pass a unique key — the policy must be a
    total order or "best" is nondeterministic). One window shuffle on
    the cluster key; no global ordering anywhere."""
    c = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    w = Window.partitionBy(c).orderBy(score.desc(), tie_breaker.asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") == 1)
        .drop("_rank")
    )


def incremental_dedup(
    new_batch: DataFrame,
    seen_keys: DataFrame,
    key_col: str,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Rows of ``new_batch`` whose ``key_col`` is absent from
    ``seen_keys`` (a one-column frame of previously-ingested keys),
    with intra-batch duplicates collapsed to the first row under
    ``order_by``. PASS A TOTAL ORDER over the batch (a unique id): the
    default orders by ``key_col``, which ties within every key
    partition, so when a key repeats in the batch the survivor is
    shuffle-order-dependent — fine only when any copy is acceptable.

    Two keyed shuffles (intra-batch window + anti-join), both on the
    content key; Catalyst/AQE broadcast the anti-join when the seen-key
    side is small. History never re-materializes documents — keys only.
    """
    order = order_by if order_by is not None else [F.col(key_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    firsts = (
        new_batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return firsts.join(
        seen_keys.select(key_col).distinct(), on=key_col, how="left_anti"
    )
