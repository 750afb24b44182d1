"""Declared-query corpus: the driver-checkable surface of the engine.

Every operator from SURVEY.md §2 gets at least one entry here: a PySpark
implementation (``fn(spark, sf_dir) -> DataFrame``) and, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle query over the same
fixture views. The driver hash-compares the two at sf0.01
(CORRECTNESS_r{N}.json); ``bench.py`` times a headline subset at sf0.1.

Numeric discipline (see ``functions.py``): per-row arithmetic stays in
DOUBLE (IEEE-deterministic, identical across engines); aggregation of
money goes through DECIMAL(18,4) so the sum is order-independent and the
final DOUBLE cast is bit-identical in Spark and DuckDB.

WINDOW OUTPUT CONTRACT: the external driver correctness-checks the
FIRST 50 registry names in sorted order, and its canonicalizer does a
pandas ``sort_values`` over every output column — an array/struct/map
cell raises ``TypeError: unhashable type`` (the round-2 q041 red).
Every window query (first 50 sorted names) must therefore return
SCALAR columns only; serialize composites first (per-element columns,
``md5(to_json(...))``, ``array_join``). Enforced by
``tests/test_window_contract.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # included in bench.py timing set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from cubicerp_client_etl_spark.queries import (  # noqa: F401
        lookups,
        pipeline_ext,
        pipeline_ext2,
        pipeline_ext3,
        pipeline_ext4,
        pipeline_ext5,
        pipeline_ext6,
        pipeline_ext7,
        pipeline_ext8,
        pipeline_ext9,
        pipeline_ext10,
        pipeline_ext11,
        pipeline_ext12,
        pipeline_ext13,
        pipeline_ext14,
        pipeline_ext15,
        pipeline_ext16,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        udfs,
        windows,
    )


_load_all()
