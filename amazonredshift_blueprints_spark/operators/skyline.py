"""Skyline (Pareto frontier) operator, grid-pruned.

The skyline of a table under "minimize x AND minimize y" is the set of
rows not *dominated* by any other row, where q dominates p iff
``q.x <= p.x AND q.y <= p.y`` and at least one inequality is strict
(Börzsönyi, Kossmann & Stocker, ICDE 2001 — the operator classic OLAP
engines expose as ``SKYLINE OF``). The naive plan is a |T|² NOT EXISTS
self-join; the distributed form below is the standard grid/angular
partition-prune (Vlachou et al.) expressed in DataFrame ops.

Plan shape (and why it scales):
1. ONE scalar aggregate for the global (min, max) of both axes — four
   doubles to the driver (metadata-sized, the same class as a codebook
   collect).
2. Bin every row into a ``bins × bins`` grid cell (map-only arithmetic)
   and hash-aggregate the nonempty cell list — at most bins² rows
   collected (4 096 at the default 64), again metadata.
3. Driver-side staircase prune over that CELL LIST (not the data): a
   cell is pruned iff some nonempty cell lies STRICTLY southwest of it.
   Strictness is what makes the prune sound with closed-interval bins:
   any point in a strictly-SW cell has x' < cell_x_lo <= x and
   y' < cell_y_lo <= y, i.e. strictly dominates every point of the
   pruned cell. Inductively the dominator chain terminates in a
   surviving cell, so no skyline member is ever pruned and every
   dominator of a survivor is itself among the survivors.
4. Broadcast the surviving cell ids back as a semi-join (equi-join on
   the cell id — never a theta join against the full table).
5. Exact dominance among the survivors only: a broadcast
   "candidate-vs-candidate" LEFT ANTI theta-join. Survivors live in the
   O(bins) anti-diagonal staircase band, so the quadratic step runs on
   a vanishing fraction of the input; for adversarially anti-correlated
   data (everything on the diagonal) the recursion path is a finer grid
   over the band — documented, not built, because real catalogs are not
   adversarial.

Determinism: dominance is pure comparison — no floating arithmetic is
ever *created*, so the result set is exact regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bins: int = 64,
) -> DataFrame:
    """All rows of ``df`` on the Pareto frontier minimizing
    (``x_col``, ``y_col``); full input schema preserved. Duplicate
    frontier points are all kept (neither dominates the other — no
    strict inequality)."""
    spark: SparkSession = df.sparkSession

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    lo_hi = df.agg(
        F.min(x).alias("x0"),
        F.max(x).alias("x1"),
        F.min(y).alias("y0"),
        F.max(y).alias("y1"),
    ).first()
    if lo_hi is None or lo_hi["x0"] is None:
        return df.limit(0)
    x0, x1, y0, y1 = lo_hi["x0"], lo_hi["x1"], lo_hi["y0"], lo_hi["y1"]
    wx = (x1 - x0) or 1.0  # degenerate axis → everything in bin 0
    wy = (y1 - y0) or 1.0

    def cell(col, lo, width):
        raw = F.floor((col - F.lit(lo)) / F.lit(width) * F.lit(bins))
        return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))

    binned = df.withColumn("_gx", cell(x, x0, wx)).withColumn(
        "_gy", cell(y, y0, wy)
    )

    cells = [
        (int(r["_gx"]), int(r["_gy"]))
        for r in binned.groupBy("_gx", "_gy").count().collect()
    ]  # ≤ bins² rows — metadata-sized by construction

    # Staircase prune on the cell list: min _gy among cells strictly
    # left of column gx; cell (gx, gy) survives iff that min is >= gy.
    min_gy_left: dict[int, int] = {}
    best = None
    for gx in range(bins):
        min_gy_left[gx] = best if best is not None else bins
        col_min = min((gy for cx, gy in cells if cx == gx), default=None)
        if col_min is not None:
            best = col_min if best is None else min(best, col_min)
    survivors = [(gx, gy) for gx, gy in cells if gy <= min_gy_left[gx]]

    surv_df = spark.createDataFrame(survivors, "_gx bigint, _gy bigint")
    cand = binned.join(F.broadcast(surv_df), ["_gx", "_gy"], "semi")

    # Exact dominance among candidates only (broadcast anti theta-join).
    dom = F.broadcast(
        cand.select(x.alias("_dx"), y.alias("_dy"))
    )
    not_dominated = (
        (F.col("_dx") > x)
        | (F.col("_dy") > y)
        | ((F.col("_dx") == x) & (F.col("_dy") == y))
    )
    out = cand.join(dom, ~not_dominated, "left_anti")
    return out.drop("_gx", "_gy")
