"""Cogrouped pandas as-of join (SURVEY C9, the applyInPandas path).

The window formulation (queries/relational2.q218, birth q020) covers the common
"probe and reference are the same keyed stream" case by unioning and
running last-non-null over one window. This operator is the general
form — two ARBITRARY keyed frames, pandas ``merge_asof`` per key group
via ``cogroup().applyInPandas`` — for when the window trick doesn't
apply (different tables, backward/forward/nearest directions,
tolerance bounds).

Scale: one shuffle of each side on a 64-way HASH BUCKET of the key
columns (the cogroup) — not the key itself: pandas pays ~4–9 ms of
per-group overhead (measured: the per-user form ran q117 in 14 s at
sf0.1 / 41 s at 10×; the bucketed form with ``merge_asof(by=keys)``
runs many keys per Arrow batch and cut both). Within a batch,
merge_asof sorts by ``on`` once and walks all key groups linearly via
its ``by=`` parameter. A bucket's combined rows must fit in executor
memory — buckets hold many SMALL per-entity histories (the intended
shape); for a single giant key, fall back to the window formulation.
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

    NULL keys NEVER MATCH (ADVICE r10): ``pandas.merge_asof(by=...)``
    treats NaN/None group keys as unmatchable, so a left row with a
    NULL in any ``by`` column always gets NULL carries — SQL
    equi-join semantics (and DuckDB ``ASOF JOIN`` semantics), NOT the
    null-groups-together behavior of the pre-r10 per-key cogroup
    form. Filter or coalesce NULL keys first if they should pair.
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
    bucket = "__asof_b"
    # key columns aliased like the payload: shared attributes get
    # deduped in transit to the Python worker (see the payload note
    # above), and merge_asof(by=) needs the keys PRESENT on both sides
    r_by = {k: f"__r_by_{k}" for k in by}
    right = right.select(
        *[F.col(k).alias(r_by[k]) for k in by],
        F.col(on).alias(r_on),
        *[F.col(f.name).alias(f"__r_{f.name}") for f in r_fields],
    ).withColumn(
        bucket, F.pmod(F.xxhash64(*[r_by[k] for k in by]), F.lit(64))
    )
    left = left.withColumn(bucket, F.pmod(F.xxhash64(*by), F.lit(64)))

    l_cols = [f.name for f in l_fields]
    r_carry = list(out_names.values()) + ([carry_on] if carry_on else [])

    def merge(key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out.fields])
        # merge_asof(by=...) wants a global sort on `on`; key groups
        # are then walked linearly inside ONE call for the whole bucket
        ldf = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            for dst in r_carry:
                ldf[dst] = None
            return ldf[[*l_cols, *r_carry]]
        rdf = rdf[[*r_by.values(), r_on, *out_names]].rename(
            columns={r_on: on, **out_names, **{v: k for k, v in r_by.items()}}
        )
        if carry_on is not None:
            rdf[carry_on] = rdf[on]
        rdf = rdf.sort_values(on, kind="mergesort")
        merged = pd.merge_asof(
            ldf, rdf, on=on, by=by, direction=direction, tolerance=tolerance
        )
        return merged[[*l_cols, *r_carry]]

    return (
        left.groupBy(bucket)
        .cogroup(right.groupBy(bucket))
        .applyInPandas(merge, schema=out)
    )
