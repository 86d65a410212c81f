"""gap_fill_locf (operators/timeseries.py) on a hand-built frame:
per-key grids, LOCF carry, NULL passthrough for non-fill columns."""

from __future__ import annotations

import datetime as dt

from amazonredshift_blueprints_spark.operators.timeseries import gap_fill_locf


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_gapfill_locf_semantics(spark):
    observed = spark.createDataFrame(
        [
            (1, _ts(0), 10, 1.5),
            (1, _ts(3), 30, 4.5),   # hours 1,2 missing for key 1
            (2, _ts(5), 50, 9.9),   # single point: no gaps, span = [5, 5]
        ],
        "k long, bucket timestamp, n long, v double",
    )
    out = gap_fill_locf(observed, key="k", bucket="bucket", step="interval 1 hour",
                        fill_cols=["v"])
    rows = {(r.k, r.bucket.hour): r for r in out.collect()}

    # key 1 densified to hours 0..3; key 2 only hour 5 (bounds are per-key)
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 5)}
    # observed rows keep their values
    assert rows[(1, 0)].n == 10 and rows[(1, 0)].v_filled == 1.5
    assert rows[(1, 3)].n == 30 and rows[(1, 3)].v_filled == 4.5
    # gap rows: non-fill columns NULL, fill column carried forward
    assert rows[(1, 1)].n is None and rows[(1, 1)].v is None
    assert rows[(1, 1)].v_filled == 1.5 and rows[(1, 2)].v_filled == 1.5
    assert rows[(2, 5)].v_filled == 9.9


def test_robust_outliers_flags_spike_not_constant(spark):
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.timeseries import robust_outliers

    rows = [("a", float(i % 7)) for i in range(50)] + [("a", 500.0)]
    rows += [("b", 3.0)] * 20                      # constant group: mad = 0
    df = spark.createDataFrame(rows, ["k", "v"]).withColumn(
        "id", F.monotonically_increasing_id()
    )
    out = robust_outliers(df, "k", "v", threshold=3.5).collect()
    assert [r["v"] for r in out] == [500.0]        # spike flagged
    assert all(r["k"] == "a" for r in out)         # mad=0 group flags nothing
    z = out[0]["z"]
    assert z > 3.5 and out[0]["mad"] > 0
