"""Spatial within-radius join via grid bucketing.

Reference basis: Redshift ships a GEOMETRY type and ST_* functions
(ST_DWithin / ST_DistanceSphere) reachable through the SQL pass-through
sites; Spark has no native spatial operators, so the within-radius join
— the workhorse spatial query — is rebuilt here from relational
primitives. The technique is the standard grid-hash spatial join:
bucket points into radius-sized cells, explode ONE side to its 3×3
neighbor cells, equi-join on the cell key, and verify the exact
distance on candidates only. Any pair within the radius differs by at
most one cell in each axis, so the neighborhood join finds every true
pair (no false negatives) and candidate count is bounded by local
density, never |points|².

Determinism: coordinates are integer planar units (meters on a local
projection — what ST_Transform to a metric SRID produces), so the
distance check is an EXACT integer comparison (dx² + dy² ≤ r²) with no
transcendentals to diverge between engines. The spherical (haversine)
form is the same plan with a trig verify — noted, not default, because
libm last-ulp drift makes its boundary non-replayable across engines.

100 TB: one shuffle per side on the cell key (the exploded side carries
9× rows of (id, x, y) — ~30 B each); per-cell pair work is bounded by
cell occupancy, which the radius-sized grid keeps at local-density
scale. Skewed hotspots (every point in one city) are ordinary join
skew — AQE splits them like any other hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(coord: Column, cell_size: int) -> Column:
    """Grid cell index along one axis (floor division; negative-safe)."""
    return F.floor(coord / F.lit(cell_size)).cast("long")


def spatial_self_join_within(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    radius: int,
) -> DataFrame:
    """All point pairs within ``radius`` (integer planar units):
    (id_a, id_b, dist2) with ``id_a < id_b`` and
    ``dist2 = (xa-xb)² + (ya-yb)² <= radius²`` exactly.

    Cell size = radius, so a within-radius pair's cells differ by at
    most 1 per axis; side A explodes to its 3×3 neighborhood and joins
    side B on the exact cell — each qualifying pair meets exactly once
    (B's cell is unique), so no dedup pass is needed.
    """
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    b = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        _cell(F.col("_x"), radius).alias("cx"),
        _cell(F.col("_y"), radius).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = (
        pts.select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("xa"),
            F.col("_y").alias("ya"),
            _cell(F.col("_x"), radius).alias("_cxa"),
            _cell(F.col("_y"), radius).alias("_cya"),
            F.explode(offsets).alias("_o"),
        )
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("_cxa") + F.col("_o.dx")).alias("cx"),
            (F.col("_cya") + F.col("_o.dy")).alias("cy"),
        )
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", dist2.cast("long"))
        .filter(F.col("dist2") <= radius * radius)
        .select("id_a", "id_b", "dist2")
    )


def grid_density_smooth(
    pts: DataFrame,
    x_col: str,
    y_col: str,
    *,
    cell: int,
) -> DataFrame:
    """Grid-cell density with 3x3 binomial-kernel smoothing — the
    hotspot/heatmap aggregate (KDE-lite on a metric plane): every point
    contributes weight ``(2-|dx|)·(2-|dy|)`` (center 4, edge 2, corner
    1, total 16) to its cell's 3x3 neighborhood, so a cell's smoothed
    mass reads local density without grid-artifact cliffs.

    Distributed convolution WITHOUT a join: each point map-side
    explodes into its 9 (neighbor-cell, weight) contributions and ONE
    hash aggregate folds them — raw count and smoothed mass come out
    of the same pass (``is_center`` rides the explode). All integer.

    Returns (cx, cy, n_points, smooth_q) for every cell with nonzero
    smoothed mass, ordered by (cx, cy); ``smooth_q`` sums to
    16·|points| over the whole grid (kernel mass conservation — the
    pytest invariant).

    100 TB: the 9x explode is map-only and collapses to cells-sized
    groups via partial aggregation before the single shuffle; no
    neighbor self-join, no window. The classic alternative (8
    cell-offset joins) shuffles the grid 8 times; this shuffles
    contributions once.
    """
    contrib = pts.select(
        (F.col(x_col).cast("long") / cell).cast("long").alias("px"),
        (F.col(y_col).cast("long") / cell).cast("long").alias("py"),
    ).select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> struct("
                "px + dx AS cx, py + dy AS cy, "
                "CAST((2 - abs(dx)) * (2 - abs(dy)) AS BIGINT) AS w, "
                "dx = 0 AND dy = 0 AS is_center))))"
            )
        ).alias("c")
    )
    return (
        contrib.groupBy(F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
        .agg(
            F.sum(F.when(F.col("c.is_center"), 1).otherwise(0))
            .cast("long")
            .alias("n_points"),
            F.sum("c.w").cast("long").alias("smooth_q"),
        )
        .orderBy("cx", "cy")
    )
