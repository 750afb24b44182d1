"""Spatial neighbor search via integer grid-cell blocking (L-geo).

The spatial twin of the LSH/blocking family: "find every pair of
points within distance r" is an all-pairs trap at scale; the
engine-native shape buckets points into square grid cells of side
≥ r, probes each point's 3×3 cell neighborhood (an equi-join on the
cell key — the only shuffle), and verifies the EXACT distance on
candidates only. Delta-lake Z-ordering covers the storage-layout half
of this (sinks/writers.py); this is the join-time half.

Coordinates are exact integer micro-units (e6 fixed point, the repo's
money/e6 discipline) in a NON-NEGATIVE domain — integer division
truncates toward zero in Spark and floors in DuckDB, so negative
coordinates would break oracle replay; shift to [0, span) first.
Distances are planar (equirectangular): right for city/regional
scales and for demonstrating the blocking shape; great-circle metrics
would need trig whose last-ulp behavior differs across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    max_dist: int,
    cell_size: int | None = None,
) -> DataFrame:
    """All pairs within EXACT planar distance ``max_dist`` (integer
    units), found via 3×3 grid-cell candidate generation. Returns
    ``(id_a, id_b, dist2)`` with ``id_a < id_b`` and
    ``dist2 = dx²+dy² ≤ max_dist²`` exact.

    ``cell_size`` defaults to ``max_dist`` (the smallest side for
    which the 3×3 neighborhood is complete — any true pair is within
    one cell step). Candidate volume per point is the occupancy of 9
    cells ≈ 9·n·(cell²/area) — linear in n for fixed density; a
    hotspot cell is the usual blocking skew exposure (AQE skew-join
    splits the work; the emitted pairs are the honest cost of a dense
    neighborhood).

    Scale: one explode (×9) + one equi-join on the cell key + exact
    integer verify on candidates; no window, no collect, no cross
    join.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    cell = int(cell_size) if cell_size is not None else int(max_dist)
    if cell < max_dist:
        raise ValueError(
            f"cell_size {cell} < max_dist {max_dist}: the 3x3 "
            "neighborhood would miss true pairs"
        )
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
        F.expr(f"CAST({x_col} AS BIGINT) div {cell}").alias("_cx"),
        F.expr(f"CAST({y_col} AS BIGINT) div {cell}").alias("_cy"),
    )
    probes = base.select(
        "_id",
        "_x",
        "_y",
        F.explode(F.expr("array(-1, 0, 1)")).alias("_dx"),
        F.col("_cx"),
        F.col("_cy"),
    ).select(
        "_id",
        "_x",
        "_y",
        (F.col("_cx") + F.col("_dx")).alias("_cx"),
        F.explode(F.expr("array(-1, 0, 1)")).alias("_dy"),
        F.col("_cy"),
    ).select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("xa"),
        F.col("_y").alias("ya"),
        "_cx",
        (F.col("_cy") + F.col("_dy")).alias("_cy"),
    )
    home = base.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        "_cx",
        "_cy",
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probes.join(home, ["_cx", "_cy"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(d2 <= int(max_dist) * int(max_dist))
        .select("id_a", "id_b", d2.cast("bigint").alias("dist2"))
        .distinct()
    )
