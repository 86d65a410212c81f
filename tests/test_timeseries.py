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


def test_ewma_fold_hand_recurrence(spark):
    """s: 100 -> (3*100+201)//4=125 -> (3*125+20)//4=98; spike at x=201
    (strictly > 2*100; exactly 2x does NOT fire). Input arrives
    scrambled — array_sort must restore the (ts, tiebreak) order
    before folding."""
    import datetime as dt

    from amazonredshift_blueprints_spark.operators.timeseries import ewma_fold

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=2), 3, 0.20),   # out of order
        (1, t0, 1, 1.00),
        (1, t0 + dt.timedelta(minutes=1), 2, 2.01),
        (2, t0, 4, 0.50),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {
        r["user_id"]: (r["n_events"], r["ewma_q"], r["n_spikes"])
        for r in ewma_fold(df, "user_id", "ts", "event_id", "value").collect()
    }
    assert got[1] == (3, 98, 1)
    assert got[2] == (1, 50, 0)


def test_ewma_fold_tiebreak_on_equal_ts(spark):
    """Two events at the same instant order by the tiebreaker, not by
    arrival: (ts0, id1, x=100) then (ts0, id2, x=400) -> s = 175,
    spike fires (400 > 200)."""
    import datetime as dt

    from amazonredshift_blueprints_spark.operators.timeseries import ewma_fold

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t0, 2, 4.00), (1, t0, 1, 1.00)],
        ["user_id", "ts", "event_id", "value"],
    )
    r = ewma_fold(df, "user_id", "ts", "event_id", "value").collect()[0]
    assert (r["n_events"], r["ewma_q"], r["n_spikes"]) == (2, 175, 1)


def test_holt_fold_matches_python_replay(spark):
    """Random-ish descending series exercises NEGATIVE trend state —
    the floor-vs-truncation boundary; replay in pure Python."""
    import datetime as dt

    from amazonredshift_blueprints_spark.operators.timeseries import holt_fold

    xs = [500, 400, 300, 250, 100, 90, 700, 20]
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, x / 100.0)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = holt_fold(df, "user_id", "ts", "event_id", "value").collect()[0]
    import math

    l, b = None, 0
    for x in xs:
        if l is None:
            l = x
        else:
            lt = math.floor((x + 3 * (l + b)) / 4)
            b = math.floor(((lt - l) + 3 * b) / 4)
            l = lt
    assert (r["n_events"], r["level_q"], r["trend_q"], r["forecast_q"]) == (
        len(xs), l, b, l + b,
    )
    assert b < 0  # the fixture really did drive the trend negative


def test_cusum_fold_hand_recurrence(spark):
    from amazonredshift_blueprints_spark.operators.timeseries import cusum_fold

    # key 1: x = [50, 80, 120, 10] cents, drift 30, threshold 150
    # s: max(0,0+50-30)=20 -> max(0,20+80-30)=70 -> 70+120-30=160 >=150
    #    -> alarm, s=0 -> max(0,0+10-30)=0
    df = spark.createDataFrame(
        [
            (1, _ts(0), 0, 0.50),
            (1, _ts(1), 1, 0.80),
            (1, _ts(2), 2, 1.20),
            (1, _ts(3), 3, 0.10),
            # key 2: never crosses, ends clamped at 0
            (2, _ts(0), 4, 0.10),
            (2, _ts(1), 5, 0.20),
        ],
        "k long, ts timestamp, tie long, v double",
    )
    out = {
        r.k: r
        for r in cusum_fold(
            df, "k", "ts", "tie", "v", drift_q=30, threshold_q=150
        ).collect()
    }
    assert out[1].n_events == 4 and out[1].n_alarms == 1
    assert out[1].cusum_q == 0
    assert out[2].n_events == 2 and out[2].n_alarms == 0
    assert out[2].cusum_q == 0


def test_cusum_fold_order_insensitive_to_arrival(spark):
    from amazonredshift_blueprints_spark.operators.timeseries import cusum_fold

    rows = [(1, _ts(h), h, float(h)) for h in range(8)]
    a = spark.createDataFrame(rows, "k long, ts timestamp, tie long, v double")
    b = spark.createDataFrame(
        list(reversed(rows)), "k long, ts timestamp, tie long, v double"
    ).repartition(7)
    ra = cusum_fold(a, "k", "ts", "tie", "v", drift_q=100, threshold_q=400)
    rb = cusum_fold(b, "k", "ts", "tie", "v", drift_q=100, threshold_q=400)
    assert ra.collect() == rb.collect()


def test_seasonal_profile_dow_and_shares(spark):
    """Known dates: 1970-01-01 is dow 0 (Thursday), 1970-01-04 (Sunday)
    is dow 3; shares are integer micro DIV of the key total."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.timeseries import (
        seasonal_profile,
    )

    rows = [
        ("a", "1970-01-01 10:00:00", 1.0),
        ("a", "1970-01-08 09:00:00", 3.0),  # also Thursday -> dow 0
        ("a", "1970-01-04 09:00:00", 1.0),  # Sunday -> dow 3
    ]
    df = spark.createDataFrame(rows, "k string, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    got = {
        (r["key"], r["dow"]): r
        for r in seasonal_profile(df, "k", "ts", "v").collect()
    }
    assert set(got) == {("a", 0), ("a", 3)}
    thu = got[("a", 0)]
    assert (thu["n"], thu["sum_q"], thu["mean_micro"]) == (2, 400, 200000000)
    assert thu["share_micro"] == 400 * 1000000 // 500
    assert got[("a", 3)]["share_micro"] == 100 * 1000000 // 500


def test_ohlc_bars_tiebreak_and_quantize(spark):
    """Same-timestamp ticks: open/close resolve by the tiebreaker, not
    arrival luck; high/low/sum are cents-exact."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.timeseries import ohlc_bars

    rows = [
        ("a", "2024-01-01 09:00:00", 2, 10.50),
        ("a", "2024-01-01 09:00:00", 1, 99.99),  # same ts, lower tie -> open
        ("a", "2024-01-01 15:00:00", 3, 0.01),   # last -> close
        ("a", "2024-01-02 10:00:00", 4, 5.00),   # second bar
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, tie long, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "tie", "v")
    got = {
        r["day"].isoformat(): r
        for r in ohlc_bars(df, "k", "ts", "tie", "v").collect()
    }
    d1 = got["2024-01-01"]
    assert (d1["open_q"], d1["close_q"]) == (9999, 1)
    assert (d1["high_q"], d1["low_q"], d1["n"], d1["sum_q"]) == (
        9999, 1, 3, 9999 + 1050 + 1,
    )
    d2 = got["2024-01-02"]
    assert d2["open_q"] == d2["close_q"] == 500 and d2["n"] == 1


def test_twap_holding_weights_and_single_obs_null(spark):
    """10.00 held 1s then 20.00 held 3s -> twap = (1000*1000 +
    2000*3000)/4000 = 1750 cents; the last observation carries no
    weight; a single-observation day is NULL, not its own value."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.timeseries import twap

    rows = [
        ("a", "2024-01-01 00:00:00", 1, 10.0),
        ("a", "2024-01-01 00:00:01", 2, 20.0),
        ("a", "2024-01-01 00:00:04", 3, 99.0),  # open interval: weight 0
        ("b", "2024-01-01 12:00:00", 4, 42.0),  # singleton
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, tie long, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "tie", "v")
    got = {r["key"]: r for r in twap(df, "k", "ts", "tie", "v").collect()}
    a = got["a"]
    assert (a["n"], a["dur_ms"]) == (3, 4000)
    assert a["twap_r6"] == 1750.0
    b = got["b"]
    assert b["n"] == 1 and b["dur_ms"] == 0 and b["twap_r6"] is None


def test_xcorr_lags_known_shift(spark):
    """y is x shifted by exactly 2 days: lag 2 correlates 1.0, other
    lags less; a constant series is NULL at every lag; overlap length
    shrinks by one day per lag."""
    import datetime as dt

    from amazonredshift_blueprints_spark.operators.timeseries import (
        xcorr_lags,
    )

    d0 = dt.date(2024, 1, 1)
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = [
        (d0 + dt.timedelta(days=i), xs[i], xs[i - 2] if i >= 2 else 0)
        for i in range(len(xs))
    ]
    df = spark.createDataFrame(rows, "day date, x int, y int")
    got = {r.lag: (r.n_days, r.corr) for r in
           xcorr_lags(df, "day", "x", "y", max_lag=3).collect()}
    assert got[2][1] == 1.0            # exact shift found
    assert got[2][0] == 8              # 10 days - lag 2
    assert got[0][0] == 10 and got[3][0] == 7
    assert all(got[lag][1] < 1.0 for lag in (0, 1, 3))
    const = spark.createDataFrame(
        [(d0 + dt.timedelta(days=i), 5, xs[i]) for i in range(10)],
        "day date, x int, y int",
    )
    gc = {r.lag: r.corr for r in
          xcorr_lags(const, "day", "x", "y", max_lag=2).collect()}
    assert all(v is None for v in gc.values())  # zero variance -> NULL


def test_changepoint_scan_finds_level_shift(spark):
    """A series that jumps from level 100 to 200 after day 10 must
    score its true boundary highest; scores replay in pure Python."""
    import datetime as dt

    from amazonredshift_blueprints_spark.operators.timeseries import (
        changepoint_scan,
    )

    d0 = dt.date(2024, 5, 1)
    vals = [100] * 10 + [200] * 10
    rows = [(d0 + dt.timedelta(days=i), vals[i]) for i in range(20)]
    df = spark.createDataFrame(rows, "day date, v long")
    out = changepoint_scan(df, "day", "v").collect()
    assert len(out) == 19  # last point is not a boundary
    best = max(out, key=lambda r: (r.delta_q, r.day))
    assert best.day == str(d0 + dt.timedelta(days=9))  # split after day 10
    assert (best.n_left, best.n_right) == (10, 10)

    def replay(i):  # split after index i (0-based), left size i+1
        nl, nr = i + 1, len(vals) - i - 1
        sl, sr = sum(vals[: i + 1]), sum(vals[i + 1:])
        return (sl * nr - sr * nl) ** 2 // (nl * nr)

    assert [r.delta_q for r in out] == [replay(i) for i in range(19)]


def test_gapfill_interpolate_tolerates_duplicate_buckets(spark):
    """Duplicate (key, bucket) observations violate the one-row-per-
    key+bucket contract, but must not be a hard runtime error: without
    the _nb > _b guard, lead() pairs the duplicates and
    sequence(start > stop, +step) throws 'illegal sequence boundaries'
    (r13 advisor). Each duplicate emits its own bucket row."""
    from amazonredshift_blueprints_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    observed = spark.createDataFrame(
        [
            (1, _ts(0), 10.0),
            (1, _ts(0), 12.0),   # duplicate bucket
            (1, _ts(2), 30.0),
        ],
        "k long, bucket timestamp, v double",
    )
    rows = gap_fill_interpolate(
        observed, key="k", bucket="bucket", value_col="v",
        step="interval 1 hour",
    ).collect()
    hours = sorted(r.bucket.hour for r in rows)
    assert hours == [0, 0, 1, 2]
    by_hour = {r.bucket.hour: r for r in rows if r.bucket.hour in (1, 2)}
    # the gap row interpolates from whichever duplicate lead() paired
    # with the h2 observation; both candidates bound it in [10, 30]
    assert 10.0 <= by_hour[1].v_interp <= 30.0
    assert by_hour[2].v_interp == 30.0
