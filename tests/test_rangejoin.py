"""Edge semantics of the bucketed range join (operators/rangejoin.py):
boundary inclusivity, intervals spanning many buckets, non-matching rows,
and exactness vs the naive theta join."""

from __future__ import annotations

import pytest

from amazonredshift_blueprints_spark.operators.rangejoin import range_join


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 20.0), ("wide", 0.0, 100.0)],
        "band string, lo double, hi double",
    )


@pytest.fixture(scope="module")
def facts(spark):
    return spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 19.999), (5, 99.999), (6, 100.0), (7, -5.0)],
        "id long, v double",
    )


def test_boundaries_half_open(spark, facts, bands):
    got = {
        (r.id, r.band)
        for r in range_join(facts, bands, "v", "lo", "hi", bucket_width=3.0).collect()
    }
    assert got == {
        (1, "low"), (1, "wide"),
        (2, "low"), (2, "wide"),
        (3, "mid"), (3, "wide"),   # 10.0 excluded from [0,10), included in [10,20)
        (4, "mid"), (4, "wide"),
        (5, "wide"),
        # 6 (=hi of wide) and 7 (below all) match nothing
    }


def test_width_does_not_change_result(spark, facts, bands):
    naive = {
        (r.id, r.band)
        for r in facts.join(
            bands, (facts.v >= bands.lo) & (facts.v < bands.hi)
        ).collect()
    }
    for w in (0.5, 7.0, 1000.0):
        got = {
            (r.id, r.band)
            for r in range_join(facts, bands, "v", "lo", "hi", bucket_width=w).collect()
        }
        assert got == naive, f"width {w} diverged"


def test_outer_rejected(facts, bands):
    with pytest.raises(ValueError):
        range_join(facts, bands, "v", "lo", "hi", 1.0, how="left")


def test_spatial_within_equals_bruteforce(spark):
    """Grid-bucketed spatial join must equal the brute-force pair scan
    (no false negatives across cell boundaries, no duplicates)."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.geo import (
        spatial_self_join_within,
    )

    pts = spark.createDataFrame(
        [(i, (i * 337) % 1000, (i * 613) % 1000) for i in range(120)],
        "id long, x long, y long",
    )
    r = 150
    got = {
        (row["id_a"], row["id_b"]): row["dist2"]
        for row in spatial_self_join_within(pts, "id", "x", "y", radius=r).collect()
    }
    rows = pts.collect()
    want = {}
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            lo, hi = sorted([a, b], key=lambda p: p["id"])
            d2 = (lo["x"] - hi["x"]) ** 2 + (lo["y"] - hi["y"]) ** 2
            if d2 <= r * r:
                want[(lo["id"], hi["id"])] = d2
    assert got == want and want  # exact pair set, nonempty

    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        spatial_self_join_within(pts, "id", "x", "y", radius=0)


def test_grid_density_smooth_kernel_invariants(spark):
    """Kernel mass conservation (sum smooth_q == 16·N), exact center
    weights on an isolated point, and correct neighbor spill across a
    cell boundary."""
    from amazonredshift_blueprints_spark.operators.geo import (
        grid_density_smooth,
    )

    # one isolated point mid-cell + two points in adjacent cells
    pts = spark.createDataFrame(
        [(50, 50), (105, 50), (95, 50)], "x long, y long"
    )
    out = {(r.cx, r.cy): (r.n_points, r.smooth_q)
           for r in grid_density_smooth(pts, "x", "y", cell=100).collect()}
    assert sum(s for _, s in out.values()) == 16 * 3  # mass conserved
    # cell (0,0) holds points 1 and 3; (1,0) holds point 2
    assert out[(0, 0)][0] == 2 and out[(1, 0)][0] == 1
    # smoothed mass at (0,0): 2 own points * 4 + 1 neighbor * 2 = 10
    assert out[(0, 0)][1] == 2 * 4 + 2
    # (1,1): corner weight 1 from each (0,0) point, edge weight 2 from
    # the (1,0) point -> 1 + 1 + 2
    assert out[(1, 1)] == (0, 4)
