"""Time-series regularization: dense bucket grids + gap filling (LOCF).

Reference basis: Redshift users build calendar spines with
``generate_series`` joins and fill gaps with ``LAST_VALUE IGNORE NULLS``
window scans — SQL that reaches the reference through its pass-through
sites (``store_query_results.py:103``). Spark-first equivalent below:
``sequence()`` + ``explode`` builds each key's bucket grid distributed
(no driver-side calendar), a left join attaches observed aggregates, and
``last(..., ignorenulls=True)`` over an unbounded-preceding row frame
carries the last observation forward.

Scale notes (100 TB): the grid explode emits |keys| x |buckets-in-span|
rows — bounded per key by its own observed span, not the global one, so
sparse keys stay cheap. Grid build, join, and LOCF window all hash on the
series key: one shuffle partitioning reused end-to-end (the join and the
window share it), and AQE coalesces the tail. The LOCF window is a
running frame — single pass, no per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucket_grid(per_key_bounds: DataFrame, key: str, lo: str, hi: str, step: str) -> DataFrame:
    """One row per ``key`` per ``step``-sized bucket between lo..hi (inclusive).

    ``step`` is a SQL interval expression, e.g. ``"interval 1 hour"``.
    """
    return per_key_bounds.select(
        key,
        F.explode(F.sequence(F.col(lo), F.col(hi), F.expr(step))).alias("bucket"),
    )


def gap_fill_locf(
    observed: DataFrame,
    key: str,
    bucket: str,
    step: str,
    fill_cols: list[str],
) -> DataFrame:
    """Densify ``observed`` (one row per key+bucket) onto each key's full
    bucket grid and fill ``fill_cols`` by last-observation-carried-forward.

    Buckets must already be truncated (e.g. ``date_trunc('hour', ts)``).
    Non-fill columns come through as NULL on gap rows.
    """
    bounds = observed.groupBy(key).agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    grid = bucket_grid(bounds, key, "_lo", "_hi", step).withColumnRenamed(
        "bucket", bucket
    )
    joined = grid.join(observed, [key, bucket], "left")
    w = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: list[Column] = [
        F.last(c, ignorenulls=True).over(w).alias(f"{c}_filled") for c in fill_cols
    ]
    return joined.select(key, bucket, *[c for c in observed.columns if c not in (key, bucket)], *filled)


def robust_outliers(
    df: DataFrame,
    key: str,
    value: str,
    *,
    threshold: float = 3.5,
) -> DataFrame:
    """Flag outliers per ``key`` group by the robust (median/MAD) z-score
    — the metric-anomaly detector mean/stddev can't be trusted for,
    because an outlier inflates its own detection threshold; median and
    MAD have a 50% breakdown point.

    Per group: ``med = median(value)``, ``mad = median(|value - med|)``,
    ``z = 0.6745 * (value - med) / mad`` (0.6745 ≈ Φ⁻¹(3/4) rescales MAD
    to σ under normality). Rows with ``|z| > threshold`` are returned;
    ``mad = 0`` (constant group) yields null z and flags nothing.

    Determinism: exact interpolated ``percentile`` — DuckDB's
    ``quantile_cont`` computes the identical linear interpolation
    (verified value-equal for c51) — and the z arithmetic is a fixed
    order of IEEE double ops, so the filter boundary replays exactly;
    z is additionally rounded to 6 dp for display/hash stability.

    Scale: two hash aggregates on the group key (medians) + one
    broadcast join of the metadata-sized per-key stats back onto the
    stream — the fact table is scanned twice but never shuffled on a
    row basis. The exact percentile buffers each group's values (audit/
    oracle form); at 100 TB swap ``approx_percentile`` in for bounded
    memory, same plan shape (the c51 trade-off).
    """
    med = df.groupBy(key).agg(F.percentile(value, 0.5).alias("med"))
    mad = (
        df.join(F.broadcast(med), key)
        .groupBy(key, "med")
        .agg(F.percentile(F.abs(F.col(value) - F.col("med")), 0.5).alias("mad"))
    )
    z = (
        F.lit(0.6745)
        * (F.col(value) - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0))
    )
    return (
        df.join(F.broadcast(mad), key)
        .withColumn("_z", z)
        .filter(F.abs(F.col("_z")) > threshold)
        .withColumn("z", F.round(F.col("_z"), 6))
        .drop("_z")
    )


def gap_fill_interpolate(
    observed: DataFrame,
    key: str,
    bucket: str,
    step: str,
    value_col: str,
) -> DataFrame:
    """Densify like :func:`gap_fill_locf`, but fill gaps by LINEAR
    interpolation between the surrounding observations — the metric-
    dashboard fill where a flat carry-forward (LOCF) misrepresents a
    trending series.

    For a gap bucket t between observations (t0, v0) and (t1, v1):
    ``v = v0 + (v1 - v0) * (t - t0) / (t1 - t0)`` over epoch seconds.
    Observed buckets keep their value exactly. The grid spans each
    key's own [min, max] observed bucket, so every gap has both
    neighbors (no extrapolation).

    Determinism: bucket epochs are integral (truncated buckets), the
    interpolation is one fixed-order IEEE double expression — engines
    replay it bit-identically.

    Scale (r13 rewrite): SEGMENT-EXPLODE, not grid-windows. The old
    shape densified the grid first and then ran a forward-looking
    ``first(..., ignorenulls) OVER (... UNBOUNDED FOLLOWING)`` window
    over it — Spark evaluates unbounded-FOLLOWING frames by rescanning
    the partition tail per row (O(rows²) per key partition), which at
    sf0.1 made this the slowest entry in the whole catalog (20.6 s)
    and would be quadratic in series length at 100 TB. Now one O(n)
    ``lead`` window over the OBSERVED rows pairs each observation with
    its successor, and each segment explodes map-side into its gap
    buckets with the interpolation computed directly from the segment
    endpoints — the dense grid is never sorted, joined, or windowed.
    Rows whose value is NULL are not observations (dropped up front;
    the old code also interpolated across them — but a NULL-valued row
    at a key's edge no longer emits an edge row, since the span is
    defined by real observations).
    """
    obs = observed.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(key).orderBy(bucket)
    seg = obs.select(
        F.col(key).alias("_k"),
        F.col(bucket).alias("_b"),
        F.col(value_col).alias("_v"),
        F.lead(bucket).over(w).alias("_nb"),
        F.lead(value_col).over(w).alias("_nv"),
    )
    # this segment's buckets: [_b, _nb) on the step grid (the successor
    # emits its own segment); the final observation emits just itself.
    # The _nb > _b guard matters: duplicate (key, bucket) observations
    # violate the one-row-per-key+bucket contract, but the old
    # grid-join shape tolerated them — without the guard, _nb == _b
    # makes sequence(start > stop, +step) a hard Spark runtime error.
    # With it, each duplicate emits just its own bucket row.
    seg_buckets = F.when(
        F.col("_nb").isNotNull() & (F.col("_nb") > F.col("_b")),
        F.expr(f"sequence(_b, _nb - {step}, {step})"),
    ).otherwise(F.array(F.col("_b")))
    ex = seg.select(
        "_k", "_b", "_v", "_nb", "_nv", F.explode(seg_buckets).alias("_g")
    )
    t = F.unix_timestamp(F.col("_g"))
    t0 = F.unix_timestamp(F.col("_b"))
    t1 = F.unix_timestamp(F.col("_nb"))
    is_obs = F.col("_g") == F.col("_b")
    interp = F.when(is_obs, F.col("_v")).otherwise(
        F.col("_v")
        + (F.col("_nv") - F.col("_v"))
        * ((t - t0).cast("double") / (t1 - t0).cast("double"))
    )
    return ex.select(
        F.col("_k").alias(key),
        F.col("_g").alias(bucket),
        F.when(is_obs, F.col("_v")).alias(value_col),
        interp.alias(f"{value_col}_interp"),
    )


def ewma_fold(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    *,
    den: int = 4,
    spike_mult: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Per-key exponentially-weighted moving average with spike
    detection — a LINEAR RECURRENCE (``s_t`` depends on ``s_{t-1}``),
    which plain window functions cannot express, computed here entirely
    JVM-side: collect each key's ordered history into an array and run
    one ``aggregate`` (fold) over it. No Python UDF, no driver loop, no
    iterative job.

        x_t = round(value * scale)            (exact integer units)
        s_1 = x_1;   s_t = ((den-1)*s_{t-1} + x_t) div den   (α = 1/den)
        spike at t>1  iff  x_t > spike_mult * s_{t-1}

    All-integer state (the floor division is exact integer arithmetic:
    ``(tot - tot % den) / den``), so the recurrence replays bit-exactly
    in any engine — values must be non-negative (floor vs truncation
    divergence on negatives; enforced nowhere, documented here).

    Returns (key, n_events, ewma_q, n_spikes) — one row per key.

    100 TB: ONE hash shuffle on the key (the groupBy), then the fold is
    a map-side array expression inside whole-stage codegen. Memory is
    bounded by the largest single key's history — the same bound every
    sessionization carries; for unbounded histories the streaming
    twin (applyInPandasWithState) or a time-windowed pre-aggregate is
    the escape hatch. Ordering inside the array is array_sort on
    (ts, tiebreak), so collect_list's nondeterministic arrival order
    cannot leak into the result.
    """
    xq = F.round(F.col(value_col).cast("double") * scale).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tie"),
                xq.alias("xq"),
            )
        )
    )

    def step(acc, e):
        tot = (den - 1) * acc["s"] + e["xq"]
        nxt = ((tot - tot % den) / den).cast("long")
        return F.struct(
            F.when(acc["s"].isNull(), e["xq"]).otherwise(nxt).alias("s"),
            (
                acc["spikes"]
                + F.when(
                    acc["s"].isNotNull()
                    & (e["xq"] > spike_mult * acc["s"]),
                    1,
                ).otherwise(0)
            ).cast("long").alias("spikes"),
        )

    init = F.struct(
        F.lit(None).cast("long").alias("s"),
        F.lit(0).cast("long").alias("spikes"),
    )
    return (
        df.groupBy(F.col(key))
        .agg(arr.alias("_h"))
        .select(
            key,
            F.size("_h").cast("long").alias("n_events"),
            F.aggregate(F.col("_h"), init, step).alias("_st"),
        )
        .select(
            key,
            "n_events",
            F.col("_st.s").alias("ewma_q"),
            F.col("_st.spikes").alias("n_spikes"),
        )
    )


def holt_fold(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    *,
    den: int = 4,
    scale: int = 100,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) — the
    TWO-state linear recurrence (``ewma_fold`` carries one):

        l_1 = x_1,  b_1 = 0
        l_t = floor((x_t + (den-1)·(l_{t-1} + b_{t-1})) / den)
        b_t = floor(((l_t - l_{t-1}) + (den-1)·b_{t-1}) / den)

    (α = β = 1/den), one-step forecast = l + b — the trend-aware
    smoother for drifting series where plain EWMA lags. All-integer
    state; divisions are explicit double-floor (exact below 2^53)
    because the TREND can go negative and truncation-vs-floor would
    diverge between engines there — the one place ``ewma_fold``'s
    positive-only modular trick doesn't carry over.

    Returns (key, n_events, level_q, trend_q, forecast_q).

    100 TB: identical shape to ewma_fold — one key-keyed hash
    aggregate, the fold a map-side array expression; per-key history
    bounds memory.
    """
    xq = F.round(F.col(value_col).cast("double") * scale).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tie"),
                xq.alias("xq"),
            )
        )
    )

    def fdiv(c):
        return F.floor(c.cast("double") / den).cast("long")

    def step(acc, e):
        lt = fdiv(e["xq"] + (den - 1) * (acc["l"] + acc["b"]))
        bt = fdiv((lt - acc["l"]) + (den - 1) * acc["b"])
        return F.struct(
            F.when(acc["n"] == 0, e["xq"]).otherwise(lt).alias("l"),
            F.when(acc["n"] == 0, F.lit(0).cast("long"))
            .otherwise(bt)
            .alias("b"),
            (acc["n"] + 1).alias("n"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("n"),
    )
    return (
        df.groupBy(F.col(key))
        .agg(F.aggregate(arr, init, step).alias("_st"))
        .select(
            key,
            F.col("_st.n").alias("n_events"),
            F.col("_st.l").alias("level_q"),
            F.col("_st.b").alias("trend_q"),
            (F.col("_st.l") + F.col("_st.b")).alias("forecast_q"),
        )
    )


def cusum_fold(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    *,
    drift_q: int = 6000,
    threshold_q: int = 20000,
    scale: int = 100,
) -> DataFrame:
    """Per-key one-sided CUSUM change detection (Page 1954) over the
    ordered value series — the classic "has this metric drifted above
    its allowance?" alarm:

        x_t = round(value * scale)                 (exact integer units)
        s_t = max(0, s_{t-1} + x_t - drift_q)      (one-sided cumsum)
        alarm at t  iff  s_t >= threshold_q        (then s_t resets to 0)

    Like :func:`ewma_fold` this is a NON-LINEAR recurrence (the max-
    with-zero clamp and the reset-on-alarm) that window functions
    cannot express; it runs as ONE JVM-side ``array_sort`` +
    ``aggregate`` fold per key — no Python UDF, no driver loop. The
    state is all-integer so the fold replays bit-exactly in any
    engine; the oracle is a recursive CTE walking the identical
    recurrence.

    Returns (key, n_events, cusum_q, n_alarms) — one row per key.

    100 TB: ONE hash shuffle on the key (the groupBy); the fold is a
    map-side array expression inside whole-stage codegen. Memory bounds
    by the largest single key's history — the bound every
    sessionization carries; unbounded histories escape to the
    streaming twin (applyInPandasWithState) or a windowed pre-split.
    """
    xq = F.round(F.col(value_col).cast("double") * scale).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tie"),
                xq.alias("xq"),
            )
        )
    )

    def step(acc, e):
        raised = F.greatest(
            F.lit(0).cast("long"),
            acc["s"] + e["xq"] - F.lit(drift_q).cast("long"),
        )
        alarm = raised >= threshold_q
        return F.struct(
            F.when(alarm, F.lit(0).cast("long")).otherwise(raised).alias("s"),
            (acc["alarms"] + F.when(alarm, 1).otherwise(0))
            .cast("long")
            .alias("alarms"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("alarms"),
    )
    return (
        df.groupBy(F.col(key))
        .agg(arr.alias("_h"))
        .select(
            key,
            F.size("_h").cast("long").alias("n_events"),
            F.aggregate(F.col("_h"), init, step).alias("_st"),
        )
        .select(
            key,
            "n_events",
            F.col("_st.s").alias("cusum_q"),
            F.col("_st.alarms").alias("n_alarms"),
        )
    )


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Day-of-week seasonal profile per series — the decomposition step
    behind seasonal-naive forecasting and weekday-effect dashboards:
    for every (key, weekday), the observation count, the exact
    ``scale``-quantized value sum, the integer-micro mean, and the
    weekday's share of the key's total.

    Weekday index is computed ARITHMETICALLY as days-since-epoch mod 7
    (0 = Thursday, 1970-01-01): Spark's ``dayofweek`` is 1-based from
    Sunday while DuckDB's ``dayofweek`` is 0-based, and locale-free
    integer arithmetic sidesteps the whole family of off-by-one
    calendar APIs.

    Returns (key, dow, n, sum_q, mean_micro, share_micro): mean in
    micro-quanta ``sum_q*1e6 DIV n``, share in micro-units of the
    key's total ``sum_q*1e6 DIV total_q``.

    100 TB: one hash aggregate to (key, dow) — map-side combinable, 7
    rows per key out — then a key-partitioned window sum over those 7
    rows; no data-sized shuffle after the aggregate and no Python.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        (
            F.datediff(
                F.col(ts_col).cast("date"), F.to_date(F.lit("1970-01-01"))
            )
            % 7
        ).cast("long").alias("dow"),
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vq"),
    )
    per = base.groupBy("key", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vq").alias("sum_q"),
    )
    return per.select(
        "key",
        "dow",
        "n",
        "sum_q",
        F.expr("CAST(sum_q * 1000000 DIV n AS BIGINT)").alias("mean_micro"),
        F.expr(
            "CAST(sum_q * 1000000 DIV "
            "(SUM(sum_q) OVER (PARTITION BY key)) AS BIGINT)"
        ).alias("share_micro"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Open-high-low-close downsampling — the standard bar aggregation
    that turns a raw tick/event stream into per-(key, day) candles for
    charting, feature windows, and storage rollups.

    Open and close are the FIRST and LAST observation in event order
    (``ts`` with ``tie_col`` as the total-order tiebreaker — without
    it, same-timestamp ticks would make open/close nondeterministic);
    high/low/sum/count are plain aggregates. Values are quantized to
    integer ``scale``-ths first, so every output is engine-exact.

    Returns (key, day, n, open_q, high_q, low_q, close_q, sum_q).

    100 TB: one window pass (two row_numbers over the SAME
    (key, day)-partitioning — one Exchange, both windows reuse it)
    feeding one map-side-combinable hash aggregate; bars shrink the
    output to keys × days. No Python, no driver state.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(tie_col).alias("tie"),
        F.col(ts_col).cast("date").alias("day"),
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vq"),
    )
    wa = Window.partitionBy("key", "day").orderBy(
        F.asc("ts"), F.asc("tie")
    )
    wd = Window.partitionBy("key", "day").orderBy(
        F.desc("ts"), F.desc("tie")
    )
    staged = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return (
        staged.groupBy("key", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max(F.when(F.col("rn_a") == 1, F.col("vq"))).alias("open_q"),
            F.max("vq").alias("high_q"),
            F.min("vq").alias("low_q"),
            F.max(F.when(F.col("rn_d") == 1, F.col("vq"))).alias("close_q"),
            F.sum("vq").alias("sum_q"),
        )
        .select(
            "key", "day", "n", "open_q", "high_q", "low_q", "close_q", "sum_q"
        )
    )


def twap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Time-WEIGHTED average per (key, day) — the finance/metering
    aggregate where a plain mean is wrong because observations are
    irregularly spaced: a price that held for six hours must count
    36 000x more than one that held for 600 ms.

        twap = Σ v_i · Δt_i / Σ Δt_i,   Δt_i = ms until the next
        observation in the same (key, day);  the day's LAST
        observation carries no weight (its holding interval is open).

    Values quantize to integer ``scale``-ths and Δt to integer
    MILLISECONDS, so numerator and denominator are exact BIGINTs; the
    single closing division is double, rounded to 6 decimals (the
    catalog's transcendental contract). Single-observation days have
    an empty weight sum and yield NULL, explicitly — not 0, not the
    raw value.

    Returns (key, day, n, dur_ms, twap_r6) — ``twap_r6`` in value
    units (e.g. cents when scale=100).

    100 TB: one lead() window and the closing hash aggregate share the
    SAME (key, day) partitioning — one Exchange total; numerator
    magnitude is bounded by value_q · 86.4e6 ms per row (int64-safe
    through ~1e3-observation days at cent precision; document larger
    with a coarser Δt unit).
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(tie_col).alias("tie"),
        F.col(ts_col).cast("date").cast("string").alias("day"),
        F.round(F.col(value_col).cast("double") * scale)
        .cast("long")
        .alias("vq"),
    )
    w = Window.partitionBy("key", "day").orderBy(F.asc("ts"), F.asc("tie"))
    staged = base.withColumn(
        "dt_ms", F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")
    )
    return (
        staged.groupBy("key", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dt_ms").alias("dur_ms"),
            F.sum(F.col("vq") * F.col("dt_ms")).alias("_num"),
        )
        .select(
            "key",
            "day",
            "n",
            F.coalesce("dur_ms", F.lit(0)).cast("long").alias("dur_ms"),
            F.when(
                F.coalesce("dur_ms", F.lit(0)) > 0,
                F.round(
                    F.col("_num").cast("double")
                    / F.col("dur_ms").cast("double"),
                    6,
                ),
            ).alias("twap_r6"),
        )
    )


def xcorr_lags(
    daily: DataFrame,
    day_col: str,
    x_col: str,
    y_col: str,
    *,
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation lag scan: Pearson correlation of
    ``(x_t, y_{t+lag})`` for every lag in 0..``max_lag`` over an
    already-aggregated daily series — "does a spike in views predict
    purchases N days later", the lead-lag discovery primitive.

    Input is one row per day with both series' values (produce it with
    one corpus aggregate); NULL-day gaps simply don't pair. Per lag the
    five sufficient statistics are exact BIGINT sums and the
    correlation is the c120/c121 fixed-IEEE expression, ROUND 6 dp;
    degenerate (zero-variance) lags emit NULL. Overlap length shrinks
    by one day per lag — ``n_days`` is reported so the caller can judge
    significance.

    Returns (lag, n_days, corr) ordered by lag.

    100 TB: the corpus collapses to the DAYS table before this operator
    runs (c161 discipline); everything here — the lag expansion (a
    ``sequence`` explode, max_lag+1 copies of a days-sized table), the
    shifted self equi-join on (day+lag), and the lags-sized aggregate —
    is metadata-sized. No corpus shuffle, no window over anything
    unbounded.
    """
    d = daily.select(
        F.col(day_col).alias("d"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    lagged = d.select(
        "d", "x", F.explode(F.expr(f"sequence(0, {max_lag})")).alias("lag")
    ).withColumn("match_d", F.expr("date_add(d, CAST(lag AS INT))"))
    paired = lagged.join(
        d.select(F.col("d").alias("match_d"), F.col("y").alias("y_lead")),
        "match_d",
    )
    a = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y_lead").alias("sy"),
        F.sum(F.col("x") * F.col("y_lead")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y_lead") * F.col("y_lead")).alias("syy"),
    )
    vx = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = num.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double"))
    return a.select(
        F.col("lag").cast("long").alias("lag"),
        "n_days",
        F.when((vx > 0) & (vy > 0), F.round(corr, 6)).alias("corr"),
    ).orderBy("lag")


def changepoint_scan(
    daily: DataFrame,
    day_col: str,
    val_col: str,
) -> DataFrame:
    """Single-changepoint localization (the first split of binary
    segmentation, Scott & Knott): for every candidate boundary between
    consecutive points of an ordered series, score how much splitting
    there reduces total squared error — the offline complement of CUSUM
    (c147 flags WHEN a stream drifts; this finds WHERE a recorded
    series shifted level).

    The SSE reduction at a split with left/right (count, sum) =
    (nL, sL), (nR, sR) is ``(sL·nR − sR·nL)² / (N·nL·nR)``; N is
    constant across candidates, so the reported integer score is
    ``delta_q = (sL·nR − sR·nL)² DIV (nL·nR)`` — exact BIGINT while
    ``|s|·n < ~3e9`` (≈1e3 points with micro-unit values; quantize
    coarser for longer series — the standard documented bound). The
    argmax row is the changepoint; ties break to the earliest day.

    Returns one row per candidate split (all but the last point):
    (day, n_left, n_right, delta_q), day as STRING (c155 convention),
    ordered by day.

    100 TB: the input is an already-aggregated series (collapse the
    corpus to days first — c161 discipline); the cumulative scan and
    the scoring are two expressions over ONE days-sized window. No
    corpus work here at all.
    """
    from pyspark.sql.window import Window

    d = daily.select(
        F.col(day_col).alias("_bp_day"),
        F.col(val_col).cast("long").alias("v"),
    )
    cum = Window.orderBy("_bp_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    return (
        d.select(
            "_bp_day",
            F.sum(F.lit(1)).over(cum).alias("n_left"),
            F.sum("v").over(cum).alias("s_left"),
            F.sum(F.lit(1)).over(tot).alias("n_tot"),
            F.sum("v").over(tot).alias("s_tot"),
        )
        .filter(F.col("n_left") < F.col("n_tot"))
        .select(
            F.col("_bp_day").cast("string").alias("day"),
            F.col("n_left").cast("long").alias("n_left"),
            (F.col("n_tot") - F.col("n_left")).cast("long").alias("n_right"),
            F.expr(
                "CAST((s_left * (n_tot - n_left) "
                "- (s_tot - s_left) * n_left) "
                "* (s_left * (n_tot - n_left) "
                "- (s_tot - s_left) * n_left) "
                "DIV (n_left * (n_tot - n_left)) AS BIGINT)"
            ).alias("delta_q"),
        )
        .orderBy("day")
    )


def mase_backtest(
    df: DataFrame,
    key_col: str,
    t_col: str,
    value_col: str,
    *,
    season: int = 7,
) -> DataFrame:
    """MASE backtest of the seasonal-naive forecast (Hyndman & Koehler
    2006): per series, forecast each point with the value one season
    back (t − season) and report the mean absolute error SCALED by the
    same naive error — MASE < 1e6 (micro-units) means a candidate
    model must beat "same day last week" to be worth shipping. The
    standard sanity bar BEFORE any fancier forecaster (c139 Holt,
    c152 seasonal profile).

    Here both numerator and scale are the seasonal-naive one-step
    error over the evaluable region (t ≥ season), so the statistic is
    the IDENTITY 1e6 by construction for the naive forecaster itself;
    the operator's value is the decomposition it returns — per-series
    (n_eval, sae = Σ|v_t − v_{t−season}|, mean_ae_micro) — which a
    candidate forecast joins against to compute ITS mase as
    ``cand_sae * 1e6 DIV sae``. All BIGINT; series with no evaluable
    points are dropped (honest absence).

    ``t_col`` must be an integer time index with unit steps (caller
    builds day numbers); gaps make the lag lookup miss (LEFT join
    semantics: missing lag drops the point from both sums — stated).

    100 TB: ONE self-equi-join on (key, t−season) — co-partitioned,
    no window, no explosion — then ONE hash aggregate per series.
    """
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("long").alias("t"),
        F.col(value_col).cast("long").alias("v"),
    )
    lag = base.select(
        F.col("k"),
        (F.col("t") + season).alias("t"),
        F.col("v").alias("v_lag"),
    )
    joined = base.join(lag, ["k", "t"])
    return (
        joined.groupBy(F.col("k").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(F.abs(F.col("v") - F.col("v_lag")))
            .cast("long")
            .alias("sae"),
        )
        .select(
            "key",
            "n_eval",
            "sae",
            F.expr("CAST(sae * 1000000 DIV n_eval AS BIGINT)").alias(
                "mean_ae_micro"
            ),
        )
    )
