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

Scale posture: both are ONE keyed shuffle (window partitioned by the
domain column) plus, for interleaving, a broadcast join against the
bounded domain dimension. The per-domain running sum keys the window on
``domain`` — each domain's rows land on one partition. That is the
right plan while a single domain fits a partition (tokens are counted,
not materialized — rows are narrow); for a pathological single-domain
corpus compose ``operators.prefix.prefix_sum`` per domain instead (the
two-phase scan), which this module deliberately does not hide behind a
heuristic. Ordering is the keyed-md5 determinism of
``operators/sampling.py`` — retry/partitioning/cluster-independent and
exactly replayable in the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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

    One window shuffle on ``domain_col``; no Python, no collect.
    """
    order = [shuffle_key(id_col, seed), F.col(id_col)]
    w = (
        Window.partitionBy(domain_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = docs.withColumn(cum_col, F.sum(F.col(token_col)).over(w))
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

    Plan: one window shuffle on ``domain_col`` for the per-domain rank +
    one broadcast join against the bounded domain dimension (distinct
    aggregate, rows = #domains). No global window, no collect.
    """
    doms = docs.select(F.col(domain_col)).distinct()
    wd = Window.orderBy(domain_col)  # bounded: one row per domain
    dim = doms.select(
        F.col(domain_col),
        (F.row_number().over(wd) - 1).alias("_didx"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_ndom"),
    )
    w = Window.partitionBy(domain_col).orderBy(shuffle_key(id_col, seed), F.col(id_col))
    ranked = docs.withColumn("_rn", F.row_number().over(w) - 1)
    return (
        ranked.join(F.broadcast(dim), domain_col)
        .withColumn(
            pos_col,
            (F.col("_rn").cast("bigint") * F.col("_ndom") + F.col("_didx")).cast(
                "bigint"
            ),
        )
        .drop("_rn", "_didx", "_ndom")
    )
