"""Cogrouped pandas as-of join (SURVEY C9, the applyInPandas path).

The window formulation (queries/relational2.q020) covers the common
"probe and reference are the same keyed stream" case by unioning and
running last-non-null over one window. This operator is the general
form — two ARBITRARY keyed frames, pandas ``merge_asof`` per key group
via ``cogroup().applyInPandas`` — for when the window trick doesn't
apply (different tables, backward/forward/nearest directions,
tolerance bounds).

Scale: one shuffle of each side on the key columns (the cogroup);
within a group, merge_asof is O(n log n) for its sort then linear.
Key groups must fit in executor memory — true for per-user/per-entity
event history (the intended shape); for a single giant key, fall back
to the window formulation. Arrow moves the batches, so the Python cost
is per-group, not per-row.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    on: str,
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
    carry_on: str | None = None,
) -> DataFrame:
    """pandas.merge_asof per cogrouped key. ``on`` must be orderable
    (timestamp/numeric); right-side non-key columns arrive suffixed on
    collision. Left rows with no match keep NULLs (left-join
    semantics, like merge_asof).

    ``carry_on`` names an output column holding the MATCHED right
    row's ``on`` value. It must be produced inside the pandas merge:
    duplicating the column up front (``right.select(ts,
    ts.alias(...))``) does not survive to the UDF — Spark/Arrow
    collapses duplicate columns before cogrouped frames are handed to
    Python.
    """
    from pyspark.sql import functions as F

    by = list(by)
    l_fields = left.schema.fields
    r_fields = [
        f for f in right.schema.fields if f.name not in by and f.name != on
    ]
    taken = {f.name for f in l_fields}
    out_names = {}  # prefixed right name -> output name
    out = StructType(list(l_fields))
    for f in r_fields:
        name = f.name if f.name not in taken else f.name + suffix
        out_names[f"__r_{f.name}"] = name
        out = out.add(name, f.dataType, True)
    if carry_on is not None:
        out = out.add(carry_on, right.schema[on].dataType, True)

    # Pre-alias every right-side payload column: when both cogroup
    # sides descend from the same source DataFrame, Spark dedups the
    # shared attributes and the right frame arrives WITHOUT columns
    # whose names (and expr ids) collide with the left's — aliasing
    # forces fresh attributes that survive to the Python worker.
    r_on = f"__r_{on}"
    right = right.select(
        *by,
        F.col(on).alias(r_on),
        *[F.col(f.name).alias(f"__r_{f.name}") for f in r_fields],
    )

    l_cols = [f.name for f in l_fields]
    r_carry = list(out_names.values()) + ([carry_on] if carry_on else [])

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out.fields])
        ldf = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            for dst in r_carry:
                ldf[dst] = None
            return ldf
        rdf = rdf[[r_on, *out_names]].rename(columns={r_on: on, **out_names})
        if carry_on is not None:
            rdf[carry_on] = rdf[on]
        rdf = rdf.sort_values(on, kind="mergesort")
        merged = pd.merge_asof(
            ldf, rdf, on=on, direction=direction, tolerance=tolerance
        )
        return merged[[*l_cols, *r_carry]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, schema=out)
    )
