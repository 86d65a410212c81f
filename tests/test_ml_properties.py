"""Property tests (hypothesis) for the round-11 recurrence/linkage
operators: each Spark result must equal an independent pure-Python
replay of the spec on randomized inputs — catching threshold/ordering
edge cases hand fixtures miss. Example counts are small because every
example is a Spark job."""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    seqs=st.lists(
        st.lists(st.integers(min_value=0, max_value=9999),
                 min_size=1, max_size=10),
        min_size=1,
        max_size=3,
    )
)
@settings(**_SETTINGS)
def test_ewma_fold_matches_python_replay(spark, seqs):
    from amazonredshift_blueprints_spark.operators.timeseries import ewma_fold

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, xs in enumerate(seqs):
        for i, x in enumerate(xs):
            rows.append((u, t0 + dt.timedelta(minutes=i), eid, x / 100.0))
            eid += 1
    rows.reverse()  # scrambled arrival must not matter
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {
        r["user_id"]: (r["n_events"], r["ewma_q"], r["n_spikes"])
        for r in ewma_fold(df, "user_id", "ts", "event_id", "value").collect()
    }
    for u, xs in enumerate(seqs):
        s, spikes = None, 0
        for x in xs:
            if s is None:
                s = x
            else:
                if x > 2 * s:
                    spikes += 1
                s = (3 * s + x) // 4
        assert got[u] == (len(xs), s, spikes)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=6),
        min_size=2,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_containment_join_matches_bruteforce(spark, docs):
    from amazonredshift_blueprints_spark.operators.dedup import (
        containment_prefix_join,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"])
        for r in containment_prefix_join(
            df, "doc_id", "text", threshold_pct=50, ngram=1
        ).collect()
    }
    want = {}
    sets = [set(toks) for toks in docs]
    for a, b in itertools.permutations(range(len(docs)), 2):
        inter = len(sets[a] & sets[b])
        if 100 * inter >= 50 * len(sets[a]):
            want[(a, b)] = (inter, len(sets[a]))
    assert got == want


@given(
    seqs=st.lists(
        st.lists(st.sampled_from("xyz"), min_size=1, max_size=8),
        min_size=1,
        max_size=3,
    )
)
@settings(**_SETTINGS)
def test_transition_model_matches_python(spark, seqs):
    from amazonredshift_blueprints_spark.operators.sessions import (
        transition_model,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, states in enumerate(seqs):
        for i, s in enumerate(states):
            rows.append((u, t0 + dt.timedelta(minutes=i), eid, s))
            eid += 1
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {
        (r["prev_state"], r["next_state"]): (r["n"], r["p_micro"])
        for r in transition_model(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    counts: dict[tuple[str, str], int] = {}
    totals: dict[str, int] = {}
    for states in seqs:
        for a, b in zip(states, states[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
            totals[a] = totals.get(a, 0) + 1
    want = {
        (a, b): (n, n * 1_000_000 // totals[a])
        for (a, b), n in counts.items()
    }
    assert got == want


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_decision_stump_matches_bruteforce(spark, data):
    """Stump ranking == brute-force weighted-Gini scan with identical
    integer quantization, on arbitrary (feature, label) multisets."""
    from amazonredshift_blueprints_spark.operators.ml import decision_stump

    df = spark.createDataFrame(data, "x long, y int")
    got = [
        (r.threshold, r.score_micro)
        for r in decision_stump(df, "x", "y", top_k=1000).collect()
    ]
    xs = sorted({x for x, _ in data})
    n_tot = len(data)
    p_tot = sum(y for _, y in data)
    expect = []
    for t in xs:
        nl = sum(1 for x, _ in data if x <= t)
        pl = sum(y for x, y in data if x <= t)
        nr, pr = n_tot - nl, p_tot - pl
        if nr == 0:
            continue
        score = (pl * pl + (nl - pl) * (nl - pl)) * 1_000_000 // nl + (
            pr * pr + (nr - pr) * (nr - pr)
        ) * 1_000_000 // nr
        expect.append((t, score))
    expect.sort(key=lambda p: (-p[1], p[0]))
    assert got == expect


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40
    )
)
@settings(**_SETTINGS)
def test_changepoint_scan_matches_python(spark, vals):
    """Every boundary score equals the exact integer SSE-reduction
    formula on arbitrary series (negatives included — the squared
    numerator keeps the division non-negative)."""
    import datetime as _dt

    from amazonredshift_blueprints_spark.operators.timeseries import (
        changepoint_scan,
    )

    d0 = _dt.date(2024, 1, 1)
    rows = [(d0 + _dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "day date, v long")
    got = [r.delta_q for r in changepoint_scan(df, "day", "v").collect()]
    n = len(vals)
    s_tot = sum(vals)
    expect = []
    for i in range(n - 1):
        nl, nr = i + 1, n - i - 1
        sl = sum(vals[: i + 1])
        expect.append((sl * nr - (s_tot - sl) * nl) ** 2 // (nl * nr))
    assert got == expect


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_mutual_information_matches_python(spark, pairs):
    """MI replay on arbitrary joint distributions, including the
    negative-sum clamp edge."""
    import math
    from collections import Counter

    from amazonredshift_blueprints_spark.operators.ml import (
        mutual_information,
    )

    df = spark.createDataFrame(
        [(x, y) for x, y in pairs], "f long, label string"
    )
    got = {r.feature: (r.n_cells, r.mi_micro)
           for r in mutual_information(df, ["f"], "label").collect()}
    n_xy = Counter(pairs)
    n_x = Counter(x for x, _ in pairs)
    n_l = Counter(y for _, y in pairs)
    n = len(pairs)
    s = sum(
        c * round(math.log(c * n / (n_x[x] * n_l[y])) * 1_000_000)
        for (x, y), c in n_xy.items()
    )
    assert got["f"] == (len(n_xy), max(s, 0) // n)
