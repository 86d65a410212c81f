"""Event sessionization (gap-and-islands) over the events stream table.

Two equivalent implementations:
- ``sessionize``       — explicit lag-gap flagging + running-sum session
  index (windowed, batch; the oracle-checkable form).
- ``session_window_agg`` — Spark's native ``session_window`` grouping
  (same semantics, and the one that also runs under Structured
  Streaming — see ``streaming/sessions.py``).

Scale: both shuffle once on user_id; window state per reducer is one
user's events. Session assignment never crosses user partitions, so the
operator scales with the user-key cardinality, not total volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based sessions, one output row per session.

    Returns (user_id, session_idx, session_start, session_end, n_events,
    duration_secs). ``session_idx`` is the 1-based session ordinal per
    user; a session ends when the next event is > gap after the previous.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_secs = gap_minutes * 60
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_secs)
    ).cast("long")
    with_idx = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_idx"),
    )
    return (
        with_idx.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            user_col,
            "session_idx",
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
            ).alias("duration_secs"),
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Spark-native ``session_window`` grouping — identical session
    boundaries to ``sessionize`` (window.end = last event + gap).

    Returns (user_id, session_start, last_event, n_events).
    """
    gap = f"{gap_minutes} minutes"
    return (
        events.groupBy(F.col(user_col), F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"), F.max(ts_col).alias("last_event"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            "last_event",
            "n_events",
        )
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention cohorts: how many of each signup-week cohort's
    users are still active N weeks later — the standard product-
    analytics rollup, and at corpus scale the "contributor churn" view
    of an event log.

    cohort_week = Monday-truncated week of the user's first event;
    week_offset = whole weeks between cohort week and each distinct
    active week (both week-truncated, so the day difference is an exact
    multiple of 7). Returns (cohort_week, week_offset, n_users).

    Plan: one groupBy(user) min for first-seen, one distinct over
    (user, week) — both partial-aggregate map-side and shuffle on
    user_id only — then an equi-join on user_id and a final (cohort,
    offset) aggregate whose output is |weeks|² rows at most. At 100 TB
    the user-keyed stages dominate and AQE handles power-user skew; no
    stage ever holds more than (user, week) pairs.
    """
    first = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    activity = events.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("week", F.col(ts_col)).alias("week"),
    ).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users completed each prefix of
    ``steps`` in strict time order (each step strictly after the
    previous step's first completion).

    Returns (step_idx, step, n_users), one row per step. Semantics: a
    user counts for step i if they have an event of type ``steps[i]``
    strictly after their *earliest* completion of step i-1 (the
    standard first-touch funnel; simultaneous events do not advance).

    Plan: per step one filtered scan, one user-keyed equi-join against
    the previous stage's (user, first-ts) table, and one groupBy-min —
    the per-step user tables shrink monotonically, every shuffle is on
    user_id, and the final counts are single-row aggregates. At 100 TB
    the type filter pushes into the scan, so each stage reads only its
    step's events.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out = []
    prev = None
    for i, step in enumerate(steps):
        f = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            f = f.join(prev, "user_id").filter(F.col("_ts") > F.col("_prev_ts"))
        stage = f.groupBy("user_id").agg(F.min("_ts").alias("_prev_ts"))
        out.append(
            stage.agg(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
        prev = stage
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def event_pattern_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    order_cols: list[str],
    patterns: dict[str, str],
) -> DataFrame:
    """Sequential pattern matching over per-user event streams — the
    MATCH_RECOGNIZE family, reduced to its portable core: order each
    user's events by ``order_cols``, join the event-type sequence into
    one comma-separated string, and count non-overlapping regex
    occurrences of each named pattern (e.g. exact adjacency
    ``'view,purchase'``, error-tolerant ``'view(,error)*,purchase'``).

    Returns (user, n_events, <one BIGINT column per pattern name>).

    Scale: ONE user-keyed shuffle; per-user state is bounded by a
    user's activity history (the same contract as sessionization and
    pack_documents) — compose with :func:`sessionize` first to bound
    it harder; the regex scan runs JVM-side per user row. Determinism:
    ``order_cols`` must totalize the order (include a unique id);
    non-overlapping greedy regex counts replay identically across
    engines.
    """
    seq = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(*order_cols, type_col))
            ),
            lambda s: s[type_col],
        ),
        ",",
    )
    agg = df.groupBy(F.col(user_col)).agg(
        seq.alias("_seq"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    cols = [F.col(user_col), F.col("n_events")]
    for name, pat in patterns.items():
        cols.append(
            F.regexp_count("_seq", F.lit(pat)).cast("long").alias(name)
        )
    return agg.select(*cols)


def transition_model(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition model over per-key ordered state
    sequences: count every consecutive (state -> next_state) pair and
    report the MLE transition probability — the behavioral-analytics
    staple (what do users do after an error?) and the generative twin
    of :func:`event_pattern_counts`'s matcher.

        p(a -> b) = n(a -> b) * 1e6 div n(a -> *)

    in integer micro-units (exact integer division, no floats), so the
    whole model replays bit-exactly. Row order inside a key is
    (ts, tiebreak) — the tiebreaker makes simultaneous events
    deterministic.

    Returns (prev_state, next_state, n, p_micro), the model being
    |states|^2-sized at most.

    100 TB: ONE hash shuffle on the key for the lead() window (the
    same exchange every sessionization pays), then the count table is
    a states^2-sized hash aggregate with map-side partials. Nothing
    data-sized shuffles twice and nothing is collected.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(tiebreak_col))
    nxt = F.lead(F.col(state_col)).over(w)
    pairs = (
        df.select(
            F.col(state_col).alias("prev_state"), nxt.alias("next_state")
        )
        .filter(F.col("next_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.groupBy("prev_state").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(tot), "prev_state")
        .select(
            "prev_state",
            "next_state",
            "n",
            F.expr("CAST(n * 1000000 DIV tot AS BIGINT)").alias("p_micro"),
        )
    )


def attribution_credit(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    type_col: str,
    *,
    conversion: str = "purchase",
    touches: tuple[str, ...] = ("click", "view"),
    micro: int = 1_000_000,
) -> DataFrame:
    """Multi-touch marketing attribution over per-key event streams:
    for every conversion, credit the touch events (channels) that
    preceded it since the PREVIOUS conversion, under the three classic
    models at once — first-touch, last-touch, and linear.

    Mechanics: an exclusive running count of prior conversions splits
    each key's stream into epochs (one conversion closes each epoch);
    touches are grouped per (key, epoch, channel); linear credit is
    ``count_channel * micro DIV n_touches`` — exact integer division,
    so credits replay bit-exactly (the floor remainder is the
    documented rounding, not float noise). Conversions with no
    preceding touch in their epoch earn no credit (dropped, the
    standard attribution convention).

    Returns (channel, first_touch_convs, last_touch_convs,
    linear_micro) — one row per channel.

    100 TB: ONE key-partitioned window pass builds epochs (the same
    exchange sessionization already pays), then all grouping keys are
    prefixed by (key, epoch) so the aggregates reuse that partitioning;
    final channel rollup is channel-cardinality-sized. Nothing
    data-sized is joined unbucketed and nothing is collected.
    """
    from pyspark.sql.window import Window

    w_prior = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_conv = (F.col(type_col) == conversion).cast("long")
    base = df.select(
        F.col(key).alias("k"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tie"),
        F.col(type_col).alias("channel"),
        F.coalesce(F.sum(is_conv).over(w_prior), F.lit(0))
        .cast("long")
        .alias("epoch"),
    )
    tou = base.filter(F.col("channel").isin(*touches))
    conv = base.filter(F.col("channel") == conversion).select("k", "epoch")

    w_first = Window.partitionBy("k", "epoch").orderBy(
        F.col("ts").asc(), F.col("tie").asc()
    )
    w_last = Window.partitionBy("k", "epoch").orderBy(
        F.col("ts").desc(), F.col("tie").desc()
    )
    ranked = tou.select(
        "k",
        "epoch",
        "channel",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    ch_cnt = ranked.groupBy("k", "epoch", "channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_ch"),
        F.min("rn_first").alias("best_first"),
    )
    tot = ranked.groupBy("k", "epoch").agg(
        F.count(F.lit(1)).cast("long").alias("n_touch")
    )
    # rn_last == 1 marks the LAST touch of the epoch.
    last_flag = ranked.filter(F.col("rn_last") == 1).select(
        "k", "epoch", F.col("channel").alias("last_ch")
    )
    joined = (
        ch_cnt.join(tot, ["k", "epoch"])
        .join(conv, ["k", "epoch"])
        .join(last_flag, ["k", "epoch"])
    )
    return (
        joined.groupBy("channel")
        .agg(
            F.sum((F.col("best_first") == 1).cast("long"))
            .cast("long")
            .alias("first_touch_convs"),
            F.sum((F.col("channel") == F.col("last_ch")).cast("long"))
            .cast("long")
            .alias("last_touch_convs"),
            F.sum(
                F.expr(f"CAST(n_ch * {micro} DIV n_touch AS BIGINT)")
            )
            .cast("long")
            .alias("linear_micro"),
        )
    )


def funnel_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    *,
    quantiles: tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """Time-to-convert distribution — the follow-on question after
    funnel counts (c34): for users who reached ``to_type`` after their
    first ``from_type``, how long did it take? Emits exact DISCRETE
    percentiles of the latency per first-exposure weekday cohort.

    Latency is first-exposure to FIRST subsequent conversion, in exact
    integer MICROSECONDS (``unix_micros`` / ``epoch_us`` — second-
    truncation would alias sub-second funnels; float epochs would
    drift). Percentile is the order statistic at rank
    ``ceil(q·n/100)`` — the inverted-CDF definition, pure integer
    arithmetic, no interpolation to diverge between engines. Cohort =
    days-since-epoch mod 7 of the exposure date (0 = Thursday), the
    same arithmetic weekday as timeseries.seasonal_profile.

    Returns (cohort_dow, n_pairs, p<q>_us ...).

    100 TB: two user-keyed hash aggregates and one user-keyed join (the
    exposure table is user-cardinality); the percentile window
    partitions by cohort over USER-level rows — for cohorts beyond
    memory, swap the window for approx_percentile (same plan shape,
    documented trade).
    """
    base = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(type_col).alias("et"),
    )
    first_seen = (
        base.filter(F.col("et") == from_type)
        .groupBy("u")
        .agg(F.min("ts").alias("t0"))
    )
    conv = (
        base.filter(F.col("et") == to_type)
        .join(first_seen, "u")
        .filter(F.col("ts") >= F.col("t0"))
        .groupBy("u", "t0")
        .agg(F.min("ts").alias("t1"))
        .select(
            "u",
            (
                F.datediff(F.col("t0").cast("date"), F.to_date(F.lit("1970-01-01")))
                % 7
            ).cast("long").alias("cohort_dow"),
            (F.unix_micros("t1") - F.unix_micros("t0")).alias("lat_us"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cohort_dow").orderBy(F.asc("lat_us"), F.asc("u"))
    sized = conv.withColumn("rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("cohort_dow"))
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_pairs")] + [
        F.max(
            F.when(
                F.col("rk") == F.expr(f"CAST(({q} * _n + 99) DIV 100 AS INT)"),
                F.col("lat_us"),
            )
        ).alias(f"p{q}_us")
        for q in quantiles
    ]
    return sized.groupBy("cohort_dow").agg(*aggs)


def user_growth_daily(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Daily active / new / cumulative-distinct user curve — the
    growth dashboard every event product tracks. The naive form
    (COUNT(DISTINCT user) OVER cumulative window) rescans history per
    day; this uses the FIRST-SEEN identity instead: a user adds to the
    cumulative distinct count exactly once, on their first day, so

        cum_distinct(day) = Σ_{d<=day} n_new(d)

    turning an O(days·corpus) rescan into one user-cardinality
    aggregate plus a running sum over the DAY-level table.

    Returns (day, n_active, n_events, n_new, cum_distinct_users), day
    as string (the catalog's date-portability convention).

    100 TB: one (day, user) distinct + day rollup, one user-keyed
    min aggregate for first days, then windows over the days table
    (rows = calendar days — driver-trivial). Nothing rescans history.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("date").cast("string").alias("day"),
    )
    daily = base.groupBy("day").agg(
        F.countDistinct("u").cast("long").alias("n_active"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    first_day = base.groupBy("u").agg(F.min("day").alias("day"))
    new_by_day = first_day.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new_by_day, "day", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)).cast("long"))
        .withColumn(
            "cum_distinct_users", F.sum("n_new").over(w).cast("long")
        )
        .select("day", "n_active", "n_events", "n_new", "cum_distinct_users")
    )


def windowed_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    max_gap_days: int = 3,
) -> DataFrame:
    """Strict-order funnel with per-step conversion windows — the
    product-analytics workhorse c34's unordered counts and c156's
    single-hop latency don't cover: a user converts step k only with
    an event of type ``steps[k]`` strictly AFTER their step-(k-1)
    anchor and within ``max_gap_days`` of it; the anchor is the FIRST
    qualifying event (earliest-chain semantics, deterministic).

    Shape: one per-user aggregate per step — step k joins the step-k-1
    anchor table (user-keyed) against the event stream, keeping
    ``min(ts)`` inside the window. No per-user explode, no window
    function over the corpus, and the anchor tables shrink
    monotonically (each join's right side is the previous step's
    converters only).

    Returns one row per step: (step_idx, step, n_users,
    conv_from_prev_micro, conv_from_first_micro), exact integer
    micro rates.

    100 TB: k user-keyed aggregates/joins, each over a stream already
    filtered to one event type — the joins reuse the same user-hash
    partitioning, and every anchor table is bounded by the funnel's
    own attrition.
    """
    from functools import reduce

    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    )
    anchors = (
        e.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("anchor"))
    )
    tables = [anchors]
    for step in steps[1:]:
        prev = tables[-1]
        nxt = (
            e.filter(F.col("et") == step)
            .join(prev.select("u", F.col("anchor").alias("_prev")), "u")
            .filter(
                (F.col("ts") > F.col("_prev"))
                & (
                    F.col("ts")
                    <= F.col("_prev")
                    + F.expr(f"INTERVAL {max_gap_days} DAYS")
                )
            )
            .groupBy("u")
            .agg(F.min("ts").alias("anchor"))
        )
        tables.append(nxt)
    # LAZY single-plan counts (guide §5): the per-step counts were k
    # sequential driver count() actions, and step k's action re-executed
    # the whole un-persisted anchor chain 1..k — O(k²) passes. As
    # crossJoined 1-row aggregates they form ONE job where each anchor
    # table's aggregate exchange is planned once and reused by both its
    # own count leg and the next step's join (ReuseExchange), so the
    # chain executes once end to end and no count reaches the driver.
    counts_row = reduce(
        lambda a, b: a.crossJoin(b),
        (
            t.agg(F.count(F.lit(1)).cast("long").alias(f"_n{i}"))
            for i, t in enumerate(tables)
        ),
    )
    entries = []
    for i, step in enumerate(steps):
        prev = f"_n{i - 1}" if i > 0 else "_n0"
        entries.append(
            F.struct(
                F.lit(i + 1).cast("long").alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"_n{i}").alias("n_users"),
                F.when(
                    F.col(prev) != 0,
                    F.expr(f"_n{i} * 1000000 DIV {prev}"),
                ).alias("conv_from_prev_micro"),
                F.when(
                    F.col("_n0") != 0,
                    F.expr(f"_n{i} * 1000000 DIV _n0"),
                ).alias("conv_from_first_micro"),
            )
        )
    return counts_row.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.*"
    )


def markov_holdout_accuracy(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
    cutoff,
) -> DataFrame:
    """Honest out-of-sample evaluation of the c118 Markov model: train
    :func:`transition_model` on pre-``cutoff`` events, predict each
    post-cutoff transition with the modal next state (ties → smallest
    state string), and report per-prev-state top-1 accuracy — "is the
    behavioral model actually predictive", the eval every
    transition-matrix dashboard needs before anyone trusts it.

    Split rule, stated: events split into halves FIRST and pairs form
    within each half independently — boundary-crossing pairs belong to
    neither (clean replay; no train/test leakage through a shared
    pair). Unseen prev states predict nothing and score 0 over their
    test count (honest misses, not dropped rows). All-integer:
    accuracy is ``correct * 1e6 DIV n_test``.

    Returns (prev_state, n_test, n_correct, acc_micro).

    100 TB: two key-ordered lead() windows (the sessionization
    exchange, once per half), a states²-sized model aggregate whose
    argmax is one min-struct fold, the model BROADCAST back over the
    test pairs, ONE final aggregate to |states| rows.
    """
    def pairs(part: DataFrame) -> DataFrame:
        w = Window.partitionBy(key).orderBy(
            F.col(ts_col), F.col(tiebreak_col)
        )
        nxt = F.lead(F.col(state_col)).over(w)
        return (
            part.select(
                F.col(state_col).alias("prev_state"),
                nxt.alias("next_state"),
            )
            .filter(F.col("next_state").isNotNull())
        )

    train = pairs(df.filter(F.col(ts_col) < cutoff))
    test = pairs(df.filter(F.col(ts_col) >= cutoff))
    counts = train.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # argmax with ties to the smallest state: min over ((-n), state)
    model = (
        counts.groupBy("prev_state")
        .agg(
            F.min(
                F.struct(
                    (-F.col("n")).alias("_nn"),
                    F.col("next_state").alias("_nx"),
                )
            ).alias("m")
        )
        .select("prev_state", F.col("m._nx").alias("predicted"))
    )
    scored = test.join(F.broadcast(model), "prev_state", "left")
    return (
        scored.groupBy("prev_state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (F.col("next_state") == F.col("predicted")).cast("long")
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "prev_state",
            "n_test",
            F.coalesce(F.col("n_correct"), F.lit(0)).alias("n_correct"),
            F.expr(
                "CAST(coalesce(n_correct, 0) * 1000000 DIV n_test"
                " AS BIGINT)"
            ).alias("acc_micro"),
        )
    )


def sliding_distinct_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    window_days: int = 7,
) -> DataFrame:
    """Exact trailing-N-day distinct users per day (WAU when N=7) —
    the sliding COUNT DISTINCT a plain window cannot express (distinct
    is not decomposable over frames) and sketches only approximate
    (c68). Exact construction: collapse to distinct (user, day) pairs,
    EXPLODE each pair to the ``window_days`` report days it supports
    (day .. day+N-1), drop the explosion's overhang past the corpus's
    last day, distinct again, count per report day.

    Returns (day, wau) for every day in the observed range that has a
    full or partial trailing window. Days with zero activity in their
    entire window are absent (honest absence, not zero-filled — join
    c21's calendar spine to densify).

    100 TB: the explosion is exactly window_days × |distinct
    user-days| — bounded metadata relative to the event stream (the
    user-day table is the DAU table), and both distincts are hash
    aggregates with map-side partials. No window function at all.
    """
    day = F.col(ts_col).cast("date")
    pairs = df.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    last_day = pairs.agg(F.max("d").alias("mx"))
    supported = (
        pairs.select(
            "u",
            F.explode(
                F.sequence(
                    F.col("d"),
                    F.date_add(F.col("d"), window_days - 1),
                )
            ).alias("day"),
        )
        .distinct()
        .join(F.broadcast(last_day), F.col("day") <= F.col("mx"))
        .drop("mx")
    )
    return (
        supported.groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
        .orderBy("day")
    )
