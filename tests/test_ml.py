"""operators/ml.py semantics on hand-computed fixtures: Naive Bayes
(smoothing, argmax tiebreak), leave-one-out target encoding (singleton
NULL), two-proportion z-test (closed form)."""

from __future__ import annotations

import math

from amazonredshift_blueprints_spark.operators.ml import (
    loo_target_encoding,
    naive_bayes_classify,
    two_proportion_ztest,
)


def test_naive_bayes_separable_corpus(spark):
    """Fully separable vocabularies → every doc classified correctly,
    and the winning score matches the hand-computed smoothed model."""
    rows = [
        (1, "aa aa bb", "en"),
        (2, "aa bb bb", "en"),
        (3, "xx yy yy", "de"),
        (4, "xx xx yy", "de"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: (r["label"], r["pred_label"], r["score_q"])
        for r in naive_bayes_classify(df, "doc_id", "text", "lang").collect()
    }
    assert set(got) == {1, 2, 3, 4}
    for doc_id, (label, pred, _) in got.items():
        assert pred == label, (doc_id, label, pred)
    # hand-check doc 1 under 'en': V=4 vocab tokens, en has 6 tokens;
    # counts en: aa=3, bb=3. prior ln(2/4).
    q = lambda x: round(math.log(x) * 1_000_000)
    want = q(2 / 4) + 2 * q((3 + 1) / (6 + 4)) + q((3 + 1) / (6 + 4))
    assert got[1][2] == want


def test_naive_bayes_tie_breaks_to_smallest_label(spark):
    """Two perfectly symmetric classes (identical token distributions,
    equal priors) score every document identically — the argmax must
    break the tie to the lexically smallest label, deterministically."""
    df = spark.createDataFrame(
        [(1, "aa", "x"), (2, "aa", "y")], ["doc_id", "text", "lang"]
    )
    out = {
        r["doc_id"]: r["pred_label"]
        for r in naive_bayes_classify(df, "doc_id", "text", "lang").collect()
    }
    assert out == {1: "x", 2: "x"}


def test_loo_target_encoding_hand_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("c", 5.0)],
        ["k", "t"],
    )
    out = loo_target_encoding(df, "k", "t")
    got = sorted(
        (r["key"], r["target_q"], r["enc_micro"]) for r in out.collect()
    )
    # key a: LOO means exclude own value: (2+3)/2=2.5, (1+3)/2=2.0, (1+2)/2=1.5
    a_encs = sorted(e for k, _, e in got if k == "a")
    assert a_encs == [1_500_000.0, 2_000_000.0, 2_500_000.0]
    # b/c singletons -> NULL
    assert [e for k, _, e in got if k in ("b", "c")] == [None, None]


def test_two_proportion_ztest_closed_form(spark):
    df = spark.createDataFrame(
        [("A", 1)] * 30 + [("A", 0)] * 70 + [("B", 1)] * 45 + [("B", 0)] * 55,
        ["variant", "converted"],
    )
    out = two_proportion_ztest(df, "variant", "converted").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["variant_a"], r["variant_b"]) == ("A", "B")
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 45)
    pa, pb, pp = 0.30, 0.45, 0.375
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    assert abs(r["z"] - round(z, 6)) < 1e-9


def test_rrf_fuse_hand_ranks(spark):
    """doc 1 ranked 1st by both systems beats doc 2 ranked 2nd by one;
    contributions are exact integer micro-units."""
    from amazonredshift_blueprints_spark.operators.text import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(1, 1), (3, 2)], ["doc_id", "rank"])
    out = {r["doc_id"]: (r["n_systems"], r["rrf_q"], r["fused_rank"])
           for r in rrf_fuse([a, b], k=10).collect()}
    u1, u2 = 1_000_000 // 61, 1_000_000 // 62
    assert out[1] == (2, 2 * u1, 1)
    assert out[2] == (1, u2, 2)  # doc_id tiebreak vs doc 3
    assert out[3] == (1, u2, 3)


def test_groupwise_ols_exact_fit_and_degenerate(spark):
    from amazonredshift_blueprints_spark.operators.ml import groupwise_ols

    rows = [
        ("a", 0, 1), ("a", 1, 3), ("a", 2, 5),   # y = 2x + 1 exactly
        ("b", 4, 7), ("b", 4, 9),                # all x equal -> NULL
    ]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    got = {r["key"]: (r["n"], r["slope"], r["intercept"])
           for r in groupwise_ols(df, "k", "x", "y").collect()}
    assert got["a"] == (3, 2.0, 1.0)
    assert got["b"] == (2, None, None)


def test_pairwise_correlation_hand_cases(spark):
    """dim1 == dim2 (corr 1), dim3 == -dim1 (corr -1), dim4 constant
    (NULL)."""
    from amazonredshift_blueprints_spark.operators.ml import (
        pairwise_correlation,
    )

    rows = [([1.0, 1.0, -1.0, 5.0],), ([2.0, 2.0, -2.0, 5.0],),
            ([3.0, 3.0, -3.0, 5.0],)]
    df = spark.createDataFrame(rows, ["v"])
    got = {(r["i"], r["j"]): r["corr"]
           for r in pairwise_correlation(df, "v", dims=4).collect()}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == -1.0
    assert got[(1, 1)] == 1.0
    assert got[(1, 4)] is None and got[(4, 4)] is None
    assert len(got) == 10  # 4*5/2 upper-triangle cells


def test_psi_drift_identical_slices_zero(spark):
    """Identical distributions -> every contribution (and PSI) is
    exactly 0; a bucket present in one slice only still contributes
    finitely (smoothing)."""
    from amazonredshift_blueprints_spark.operators.ml import psi_drift

    same = [(True, b) for b in (1, 1, 2)] + [(False, b) for b in (1, 1, 2)]
    df = spark.createDataFrame(same, ["is_ref", "bucket"])
    rows = psi_drift(df, "is_ref", "bucket").collect()
    assert all(r["contrib_q"] == 0 and r["psi_q"] == 0 for r in rows)
    skew = spark.createDataFrame(
        [(True, 1), (True, 1), (False, 2), (False, 2)], ["is_ref", "bucket"]
    )
    rows = psi_drift(skew, "is_ref", "bucket").collect()
    assert {r["bucket"] for r in rows} == {1, 2}
    psi = rows[0]["psi_q"]
    assert psi > 0 and all(r["psi_q"] == psi for r in rows)


def test_churn_labels_leakage_boundary(spark):
    """user 1 active both sides (not churned); user 2 pre-only
    (churned); user 3 post-only (EXCLUDED — nothing to featurize)."""
    import datetime as dt

    from amazonredshift_blueprints_spark.operators.ml import churn_labels

    pre, post = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 25)
    rows = [
        (1, pre, "view"), (1, pre, "purchase"), (1, post, "view"),
        (2, pre, "view"),
        (3, post, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {
        r["key"]: (r["n_events"], r["n_positive"], r["days_active"], r["churned"])
        for r in churn_labels(
            df, "user_id", "ts", "event_type", cutoff="2024-01-24"
        ).collect()
    }
    assert got == {1: (2, 1, 1, False), 2: (1, 0, 1, True)}


def test_benford_screen_uniform_digits_flag(spark):
    """A uniform-digit population must produce a large chi2 (clearly
    non-Benford) and per-digit counts matching the fixture exactly."""
    from amazonredshift_blueprints_spark.operators.ml import benford_screen

    rows = [(float(d) * 10,) for d in range(1, 10) for _ in range(100)]
    df = spark.createDataFrame(rows, ["v"])
    out = benford_screen(df, "v").collect()
    assert {r["digit"] for r in out} == set(range(1, 10))
    assert all(r["n_obs"] == 100 for r in out)
    chi2 = out[0]["chi2_q"] / 1_000_000
    assert chi2 > 15.5  # df=8 alpha=.05 critical value — flags
    assert all(r["chi2_q"] == out[0]["chi2_q"] for r in out)


def test_median_impute_hand_fill(spark):
    """Odd group -> exact middle; even group -> half-integer; all-NULL
    group stays NULL."""
    from amazonredshift_blueprints_spark.operators.ml import median_impute

    rows = [
        ("a", 1.0), ("a", 3.0), ("a", 9.0), ("a", None),
        ("b", 2.0), ("b", 3.0), ("b", None),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        (r["key"], r["value_q"]): (r["was_null"], r["filled_q"])
        for r in median_impute(df, "k", "v").collect()
    }
    assert got[("a", None)] == (True, 300.0)   # median of 100,300,900
    assert got[("b", None)] == (True, 250.0)   # mean of two middles
    assert got[("c", None)] == (True, None)    # nothing to impute from
    assert got[("a", 100)] == (False, 100.0)


def test_woe_encoding_signs_and_total(spark):
    """A goods-heavy bucket gets positive WoE, a bads-heavy one
    negative; IV total is the exact sum repeated per row."""
    from amazonredshift_blueprints_spark.operators.ml import woe_encoding

    rows = [(1, 1)] * 8 + [(1, 0)] * 2 + [(2, 1)] * 2 + [(2, 0)] * 8
    df = spark.createDataFrame(rows, ["bucket", "y"])
    out = woe_encoding(df, "bucket", "y").collect()
    got = {r["bucket"]: r for r in out}
    assert got[1]["woe_q"] > 0 and got[2]["woe_q"] < 0
    assert got[1]["iv_q"] == got[2]["iv_q"]
    assert got[1]["iv_q"] == got[1]["iv_contrib_q"] + got[2]["iv_contrib_q"]
    assert (got[1]["n_good"], got[1]["n_bad"]) == (8, 2)


def test_auc_ranksum_perfect_and_random(spark):
    from amazonredshift_blueprints_spark.operators.ml import auc_ranksum

    # perfect separation: every positive scores above every negative
    rows = [("g", s, 0) for s in (1, 2, 3)] + [("g", s, 1) for s in (4, 5, 6)]
    # reversed group: positives all BELOW negatives -> AUC 0
    rows += [("r", s, 1) for s in (1, 2, 3)] + [("r", s, 0) for s in (4, 5, 6)]
    # single-class group -> NULL
    rows += [("o", 7, 1)]
    df = spark.createDataFrame(rows, "grp string, score long, y int")
    out = {r.grp: r for r in auc_ranksum(df, "grp", "score", "y").collect()}
    assert out["g"].auc_micro == 1_000_000
    assert out["r"].auc_micro == 0
    assert out["o"].auc_micro is None
    assert out["o"].n_pos == 1 and out["o"].n_neg == 0


def test_auc_ranksum_ties_use_midranks(spark):
    from amazonredshift_blueprints_spark.operators.ml import auc_ranksum

    # one positive tied with one negative at the top: AUC = (1 + 0.5)/2?
    # scores: neg 1, neg 5, pos 5, pos 9 -> pairs: (p5 vs n1)=1,
    # (p5 vs n5)=0.5, (p9 vs n1)=1, (p9 vs n5)=1 -> AUC = 3.5/4 = 0.875
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 5, 0), ("g", 5, 1), ("g", 9, 1)],
        "grp string, score long, y int",
    )
    (r,) = auc_ranksum(df, "grp", "score", "y").collect()
    assert r.auc_micro == 875_000


def test_knn_classify_labels_from_neighbors(spark):
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.ml import knn_classify

    # two tight clusters on orthogonal axes; test points sit inside one
    def v(x, y, z):
        return [float(x), float(y), float(z)]

    rows = [
        (0, v(10, 0, 0), 7),     # test (id % 10 == 0) near cluster A
        (1, v(9, 1, 0), 1),
        (2, v(10, 1, 0), 1),
        (3, v(11, 0, 1), 1),
        (10, v(0, 10, 1), 7),    # test near cluster B
        (11, v(0, 9, 0), 2),
        (12, v(1, 10, 0), 2),
        (13, v(0, 11, 1), 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {
        r.vec_id: r
        for r in knn_classify(df, F.col("vec_id") % 10 == 0, k=3).collect()
    }
    assert out[0].pred_label == 1 and out[0].true_label == 7
    assert not out[0].correct and out[0].votes == 3
    assert out[10].pred_label == 2 and not out[10].correct


def test_ndcg_perfect_reversed_and_irrelevant(spark):
    from amazonredshift_blueprints_spark.operators.ml import ndcg_eval

    # group "p": predicted order == ideal order -> nDCG = 1
    rows = [("p", 1, 30, 3), ("p", 2, 20, 2), ("p", 3, 10, 1)]
    # group "r": predicted order exactly reversed
    rows += [("r", 1, 10, 3), ("r", 2, 20, 2), ("r", 3, 30, 1)]
    # group "z": nothing relevant -> IDCG 0 -> NULL
    rows += [("z", 1, 5, 0), ("z", 2, 4, 0)]
    df = spark.createDataFrame(rows, "grp string, item long, score long, rel long")
    out = {r.grp: r for r in ndcg_eval(df, "grp", "item", "score", "rel").collect()}
    assert out["p"].ndcg_micro == 1_000_000
    assert out["p"].dcg_q == out["p"].idcg_q == 3_000_000 + 2 * 630_930 + 500_000
    # reversed: DCG = 1*1e6 + 2*630930 + 3*500000
    rev = 1_000_000 + 2 * 630_930 + 3 * 500_000
    assert out["r"].dcg_q == rev
    assert out["r"].ndcg_micro == rev * 1_000_000 // out["r"].idcg_q
    assert out["z"].ndcg_micro is None and out["z"].dcg_q == 0


def test_ndcg_cutoff_ignores_positions_past_k(spark):
    from amazonredshift_blueprints_spark.operators.ml import ndcg_eval

    # k=2: the rel-5 item parked at position 3 contributes nothing to
    # DCG but dominates IDCG's top slot
    df = spark.createDataFrame(
        [("g", 1, 30, 1), ("g", 2, 20, 1), ("g", 3, 10, 5)],
        "grp string, item long, score long, rel long",
    )
    (r,) = ndcg_eval(df, "grp", "item", "score", "rel", k=2).collect()
    assert r.dcg_q == 1_000_000 + 630_930
    assert r.idcg_q == 5_000_000 + 630_930
    assert r.n_retrieved == 3


def test_weighted_median_crossing_and_ties(spark):
    from amazonredshift_blueprints_spark.operators.ml import weighted_median

    # weights: v=1 w=1, v=2 w=1, v=3 w=10 -> half of 12 is 6, first v
    # whose cumweight >= 6 is 3
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0)]
    # duplicate values merge their weight: v=5 appears twice (w 3+3),
    # v=7 once (w 2) -> total 8, crossing at v=5 (cum 6 >= 4)
    rows += [("t", 5.0, 3.0), ("t", 5.0, 3.0), ("t", 7.0, 2.0)]
    df = spark.createDataFrame(rows, "grp string, v double, w double")
    out = {r.grp: r for r in weighted_median(df, "grp", "v", "w").collect()}
    assert out["g"].wmedian_q == 300 and out["g"].total_w == 1200
    assert out["t"].wmedian_q == 500 and out["t"].total_w == 800


def test_rfm_segments_hand_scores(spark):
    """4 customers, n_bins=2: the halves formula (rank-1)*2 DIV 4 + 1
    gives scores {1,1,2,2} on each axis; recency inverts (most recent
    order = HIGH score); monetary is cents-exact."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.ml import rfm_segments

    rows = [
        # cust, date, amount    (c1 recent+rich+frequent, c4 stale+poor)
        (1, "2024-01-10", 50.0), (1, "2024-01-20", 50.25),
        (2, "2024-01-18", 30.0), (2, "2024-01-02", 10.0),
        (3, "2024-01-05", 20.0),
        (4, "2024-01-01", 5.0),
    ]
    df = spark.createDataFrame(
        [(k, d, a) for k, d, a in rows], "key long, d string, amt double"
    ).select("key", F.col("d").cast("timestamp").alias("d"), "amt")
    got = {
        r["key"]: r
        for r in rfm_segments(df, "key", "d", "amt", n_bins=2).collect()
    }
    assert got[1]["recency_days"] == 0 and got[4]["recency_days"] == 19
    assert got[1]["monetary_q"] == 10025
    # recency order worst->best: 4(19d), 3(15d), 2(2d), 1(0d) -> scores 1,1,2,2
    assert [got[k]["r_score"] for k in (4, 3, 2, 1)] == [1, 1, 2, 2]
    # frequency asc with key tiebreak: 3(1),4(1),1(2),2(2) -> 1,1,2,2
    assert [got[k]["f_score"] for k in (3, 4, 1, 2)] == [1, 1, 2, 2]
    # monetary asc: 4(500),3(2000),2(4000),1(10025) -> 1,1,2,2
    assert [got[k]["m_score"] for k in (4, 3, 2, 1)] == [1, 1, 2, 2]
    assert got[1]["segment"] == 222 and got[4]["segment"] == 111


def test_lag_features_leakage_safe_frame(spark):
    """The rolling frame must END at the previous row: row 4's rolling
    stats cover rows 1-3 only; heads are NULL, not zero-filled."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.ml import lag_features

    rows = [
        ("u", "2024-01-01 00:00:01", 1, 1.00),
        ("u", "2024-01-01 00:00:02", 2, 2.00),
        ("u", "2024-01-01 00:00:03", 3, 4.00),
        ("u", "2024-01-01 00:00:04", 4, 8.00),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts string, tie long, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "tie", "v")
    got = {
        r["tie"]: r
        for r in lag_features(df, "k", "ts", "tie", "v").collect()
    }
    head = got[1]
    assert head["lag1_q"] is None and head["delta_q"] is None
    assert head["roll_n"] == 0 and head["roll_mean_micro"] is None
    r4 = got[4]
    assert (r4["lag1_q"], r4["lag2_q"], r4["delta_q"]) == (400, 200, 400)
    # frame over rows 1-3: sum 700, mean 700/3 in micro-quanta, max 400
    assert (r4["roll_sum_q"], r4["roll_n"], r4["roll_max_q"]) == (700, 3, 400)
    assert r4["roll_mean_micro"] == 700 * 1000000 // 3
    import pytest

    with pytest.raises(ValueError, match="lags must include 1"):
        lag_features(df, "k", "ts", "tie", "v", lags=(2,))


def test_confusion_matrix_hand_values(spark):
    """3 classes, known cells: diagonal rows carry recall (row-wise)
    and precision (column-wise) in micro-units; off-diagonal carry
    neither."""
    from amazonredshift_blueprints_spark.operators.ml import confusion_matrix

    pred = spark.createDataFrame(
        [("a", "a")] * 3 + [("a", "b")] + [("b", "b")] * 2 + [("b", "a")],
        "label string, pred string",
    )
    got = {
        (r["label"], r["pred_label"]): r
        for r in confusion_matrix(pred, "label", "pred").collect()
    }
    aa = got[("a", "a")]
    assert (aa["n"], aa["row_tot"], aa["col_tot"]) == (3, 4, 4)
    assert aa["recall_micro"] == 750000 and aa["precision_micro"] == 750000
    bb = got[("b", "b")]
    assert (bb["n"], bb["row_tot"], bb["col_tot"]) == (2, 3, 3)
    assert bb["recall_micro"] == 2 * 1000000 // 3
    ab = got[("a", "b")]
    assert ab["recall_micro"] is None and ab["precision_micro"] is None


def test_decision_stump_exact_gini(spark):
    """Stump split search replayed in pure Python: the returned best
    threshold matches brute-force weighted-Gini minimization with the
    same micro quantization, ties to the smallest threshold, and the
    empty-right split is excluded."""
    from amazonredshift_blueprints_spark.operators.ml import decision_stump

    rows = [
        # perfectly separable at x <= 3: y=1 iff x <= 3
        (1, 1), (2, 1), (3, 1), (4, 0), (5, 0), (6, 0), (7, 0),
    ]
    df = spark.createDataFrame(rows, "x long, y int")
    best = decision_stump(df, "x", "y", top_k=1).collect()[0]
    assert best.threshold == 3
    assert best.n_left == 3 and best.pos_left == 3
    assert best.n_right == 4 and best.pos_right == 0
    # perfect split: both sides pure → score hits its N*1e6 maximum
    # ((pos²+neg²)/n == n on a pure side, so the sum is nL+nR = N)
    assert best.score_micro == 7_000_000

    # noisy fixture: replay every split in python with identical
    # integer quantization and compare the full ranking
    import random

    rng = random.Random(7)
    data = [(rng.randint(1, 20), rng.randint(0, 1)) for _ in range(200)]
    df2 = spark.createDataFrame(data, "x long, y int")
    got = [
        (r.threshold, r.score_micro)
        for r in decision_stump(df2, "x", "y", top_k=100).collect()
    ]

    def replay(pairs):
        xs = sorted({x for x, _ in pairs})
        out = []
        for t in xs:
            nl = sum(1 for x, _ in pairs if x <= t)
            pl = sum(y for x, y in pairs if x <= t)
            nr = len(pairs) - nl
            pr = sum(y for _, y in pairs) - pl
            if nr == 0:
                continue
            score = (pl * pl + (nl - pl) * (nl - pl)) * 1_000_000 // nl + (
                pr * pr + (nr - pr) * (nr - pr)
            ) * 1_000_000 // nr
            out.append((t, score))
        out.sort(key=lambda p: (-p[1], p[0]))
        return out

    assert got == replay(data)


def test_calibration_report_replay(spark):
    """banded_rate_score + calibration_report replayed in pure Python:
    unseen test bands take the train prior, bin edges / integer means /
    Brier sums match exactly."""
    from amazonredshift_blueprints_spark.operators.ml import (
        banded_rate_score,
        calibration_report,
    )

    train = [(0, 1), (0, 1), (0, 0), (1, 0), (1, 0), (1, 0), (1, 1)]
    test = [(0, 1), (0, 0), (1, 0), (2, 1)]  # band 2 unseen in train
    tr = spark.createDataFrame(train, "band long, y int")
    te = spark.createDataFrame(test, "band long, y int")
    scored = banded_rate_score(tr, te, "band", "y")
    p = {r.band: r.p_micro for r in scored.collect()}
    assert p[0] == 2 * 1_000_000 // 3          # 2/3 positives
    assert p[1] == 1 * 1_000_000 // 4          # 1/4
    assert p[2] == 3 * 1_000_000 // 7          # prior 3/7 fallback
    got = [
        (r.bin, r.n, r.avg_pred_micro, r.emp_rate_micro, r.brier_sum)
        for r in calibration_report(scored).collect()
    ]

    rows = [(p[b], y) for b, y in test]
    bins = {}
    for pm, y in rows:
        bins.setdefault(pm // 100_000, []).append((pm, y))
    expect = sorted(
        (
            b,
            len(v),
            sum(pm for pm, _ in v) // len(v),
            sum(y for _, y in v) * 1_000_000 // len(v),
            sum((pm - y * 1_000_000) ** 2 for pm, y in v),
        )
        for b, v in bins.items()
    )
    assert got == expect


def test_mutual_information_ranking(spark):
    """A feature that determines the label scores ln(2) micro-nats on
    a balanced binary fixture; an independent feature clamps to ~0;
    python replay matches the quantized contract exactly."""
    import math

    from amazonredshift_blueprints_spark.operators.ml import (
        mutual_information,
    )

    rows = []
    for i in range(64):
        label = "a" if i % 2 == 0 else "b"
        rows.append((i % 2, i % 4 // 2, label))  # f1 = label, f2 ~ noise
    df = spark.createDataFrame(rows, "f1 long, f2 long, label string")
    got = {r.feature: (r.n_cells, r.mi_micro)
           for r in mutual_information(df, ["f1", "f2"], "label").collect()}
    # f1 determines label on a balanced fixture: I = ln 2 exactly; the
    # per-cell quantization rounds ln(2)*1e6 once per cell
    assert got["f1"][0] == 2
    assert got["f1"][1] == round(math.log(2) * 1_000_000)
    # f2 independent of label: clamps to >= 0 and ~0
    assert got["f2"][0] == 4 and 0 <= got["f2"][1] < 5

    def replay(pairs):
        from collections import Counter

        n_xy = Counter(pairs)
        n_x = Counter(x for x, _ in pairs)
        n_l = Counter(y for _, y in pairs)
        n = len(pairs)
        s = sum(
            c * round(math.log(c * n / (n_x[x] * n_l[y])) * 1_000_000)
            for (x, y), c in n_xy.items()
        )
        return max(s, 0) // n

    assert got["f1"][1] == replay([(r[0], r[2]) for r in rows])
    assert got["f2"][1] == replay([(r[1], r[2]) for r in rows])


def test_conformal_intervals_coverage_contract(spark):
    """Split conformal replayed by hand: q̂ is the exact order statistic
    at ceil((n+1)·0.9) (integer ceiling), coverage counts |y-pred|<=q̂,
    and a group whose column name collides with internals still works."""
    from amazonredshift_blueprints_spark.operators.ml import (
        conformal_intervals,
    )

    train = [("g1", v) for v in (10, 10, 10, 10)]        # pred = 10
    calib = [("g1", 10 + r) for r in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9)]
    test = [("g1", 10 + d) for d in (-9, -8, 0, 5, 9, 20)]
    mk = lambda rows: spark.createDataFrame(rows, "g string, y long")
    out = conformal_intervals(
        mk(train), mk(calib), mk(test), "g", "y", coverage_pct=90
    ).collect()
    assert len(out) == 1
    r = out[0]
    # residuals 0..9, n_cal=10: k = ceil(11*0.9) = ceil(9.9) = 10 -> q̂=9
    assert (r.n_cal, r.pred, r.qhat, r.n_test) == (10, 10, 9, 6)
    # |y-10| <= 9 for 5 of 6 test rows
    assert r.coverage_micro == 5 * 1_000_000 // 6


def test_sprt_monitor_crossing_and_replay(spark):
    """SPRT: a variant converting at the H1 rate crosses the upper Wald
    boundary and stays crossed; one converting at H0 crosses the lower;
    increments replay in pure Python from the same quantized-ln
    contract."""
    import datetime as dt
    import math

    from amazonredshift_blueprints_spark.operators.ml import sprt_monitor

    d0 = dt.datetime(2024, 3, 1)
    rows = []
    for day in range(30):
        for i in range(100):
            # variant 0 converts at 30% (>> p1=0.22), variant 1 at 10%
            rows.append((0, d0 + dt.timedelta(days=day), 1 if i < 30 else 0))
            rows.append((1, d0 + dt.timedelta(days=day), 1 if i < 10 else 0))
    df = spark.createDataFrame(rows, "variant long, ts timestamp, c int")
    out = sprt_monitor(df, "variant", "ts", "c").collect()
    lr1 = round(math.log(220 / 180) * 1_000_000)
    lr0 = round(math.log(780 / 820) * 1_000_000)
    bound = round(math.log(950 / 50) * 1_000_000)
    day1 = [r for r in out if r.grp == 0][0]
    assert day1.llr_day_micro == 30 * lr1 + 70 * lr0
    states0 = [r.state for r in out if r.grp == 0]
    states1 = [r.state for r in out if r.grp == 1]
    assert states0[-1] == "accept_h1" and "accept_h1" in states0
    assert states1[-1] == "accept_h0"
    # cumulative sums replay exactly
    cum = 0
    for r in [r for r in out if r.grp == 0]:
        cum += r.llr_day_micro
        assert r.llr_cum_micro == cum
        assert r.state == (
            "accept_h1" if cum >= bound
            else "accept_h0" if cum <= -bound else "continue"
        )


def test_power_planner_textbook_case(spark):
    """The planner reproduces the textbook two-proportion sample size:
    p1=0.20, +10% relative lift -> p2=0.22; n/arm matches the closed
    form computed in python; day arithmetic is exact integer ceiling."""
    import datetime as dt
    import math

    from amazonredshift_blueprints_spark.operators.ml import power_planner

    d0 = dt.datetime(2024, 6, 1)
    rows = []
    for day in range(10):
        for i in range(100):  # both arms convert at exactly 20%
            for arm in (0, 1):
                rows.append(
                    (arm, d0 + dt.timedelta(days=day), 1 if i < 20 else 0)
                )
    df = spark.createDataFrame(rows, "variant long, ts timestamp, c int")
    r = power_planner(df, "variant", "c", "ts", lift_milli=100).collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (1000, 200, 1000, 200)
    assert r.p_pool_micro == 200_000 and r.mde_micro == 20_000
    p1, p2 = 0.2, 0.2 * 1.1
    za, zb = 1.959964, 0.841621
    n = math.ceil(
        (za * math.sqrt(2 * p1 * (1 - p1))
         + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
        / (p2 - p1) ** 2
    )
    assert r.n_per_arm == n
    # 1000 subjects over 10 observed days -> 100/day/arm
    assert r.days_needed_a == -(-n * 10 // 1000)  # python ceil-div


def test_welch_ttest_scipy_free_replay(spark):
    """Welch t and df match the closed form on a hand fixture with
    unequal variances and sizes; n<2 arms yield NULL statistics."""
    import math

    from amazonredshift_blueprints_spark.operators.ml import welch_ttest

    va = [10, 12, 14, 16, 18, 20]          # mean 15, var 14
    vb = [30, 31, 29, 32]                  # mean 30.5, var ~1.67
    rows = [(0, v) for v in va] + [(1, v) for v in vb]
    df = spark.createDataFrame(rows, "g long, v long")
    r = welch_ttest(df, "g", "v").collect()[0]
    assert (r.group_a, r.n_a, r.group_b, r.n_b) == (0, 6, 1, 4)
    assert r.mean_a == sum(va) // len(va) and r.mean_b == sum(vb) // len(vb)

    def var(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / (len(v) - 1)

    se_a, se_b = var(va) / len(va), var(vb) / len(vb)
    t = (sum(va) / len(va) - sum(vb) / len(vb)) / math.sqrt(se_a + se_b)
    dof = (se_a + se_b) ** 2 / (
        se_a**2 / (len(va) - 1) + se_b**2 / (len(vb) - 1)
    )
    assert abs(r.t - round(t, 6)) < 1e-9
    assert abs(r.df - round(dof, 3)) < 1e-9
    # degenerate: a single-row arm -> NULL t/df
    tiny = spark.createDataFrame([(0, 5), (1, 7), (1, 9)], "g long, v long")
    r2 = welch_ttest(tiny, "g", "v").collect()[0]
    assert r2.t is None and r2.df is None


def test_srm_guardrail_detects_broken_split(spark):
    """A 90/10 day alarms, a clean 50/50 day doesn't; chi2 replays in
    python; a three-arm stream refuses loudly."""
    import datetime as dt

    import pytest

    from amazonredshift_blueprints_spark.operators.ml import srm_guardrail

    d0 = dt.datetime(2024, 7, 1)
    rows = []
    for i in range(100):  # day 1: clean 50/50
        rows.append((0 if i < 50 else 1, d0))
    for i in range(100):  # day 2: broken 90/10
        rows.append((0 if i < 90 else 1, d0 + dt.timedelta(days=1)))
    df = spark.createDataFrame(rows, "arm long, ts timestamp")
    out = {r.day: (r.n_a, r.n_b, r.chi2_micro, r.srm_alarm)
           for r in srm_guardrail(df, "arm", "ts").collect()}
    assert out["2024-07-01"] == (50, 50, 0, False)
    # chi2 for 90/10 vs 50/50: 2*(40^2/50) = 64
    assert out["2024-07-02"] == (90, 10, 64_000_000, True)
    three = spark.createDataFrame(
        [(0, d0), (1, d0), (2, d0)], "arm long, ts timestamp"
    )
    with pytest.raises(ValueError, match="exactly 2 assignment arms"):
        srm_guardrail(three, "arm", "ts")


def test_ips_policy_value_hand_case(spark):
    """IPS recovers the true policy value on a fully-enumerated
    fixture; SNIPS normalizes by match count; unmatched contexts count
    in N and contribute 0."""
    from amazonredshift_blueprints_spark.operators.ml import (
        ips_policy_value,
    )

    # ctx 0: policy says action 0; ctx 1: action 1; ctx 9 not in policy
    logged = [
        (0, 0, 1), (0, 0, 0), (0, 1, 1),   # 2 matched (r=1,0), 1 not
        (1, 1, 1), (1, 0, 1),              # 1 matched (r=1), 1 not
        (9, 0, 1),                          # context not in policy
    ]
    pol = [(0, 0), (1, 1)]
    ldf = spark.createDataFrame(logged, "ctx long, act long, r int")
    pdf = spark.createDataFrame(pol, "ctx long, act long")
    r = ips_policy_value(ldf, pdf, "ctx", "act", "r").collect()[0]
    assert (r.n, r.n_matched) == (6, 3)
    assert r.match_rate_micro == 3 * 1_000_000 // 6
    # matched reward = 2; IPS = 2 * 1e9 // (500 * 6); SNIPS = 2e6 // 3
    assert r.ips_value_micro == 2 * 1_000_000_000 // (500 * 6)
    assert r.snips_value_micro == 2 * 1_000_000 // 3


def test_ks_two_sample_exact_and_replay(spark):
    """KS D on hand samples matches scipy-free python ECDF math:
    identical samples give D=0 (no reject); disjoint samples give
    D=1e6 (reject); a random fixture replays exactly; 3 groups refuse."""
    import math

    import pytest

    from amazonredshift_blueprints_spark.operators.ml import ks_two_sample

    mk = lambda rows: spark.createDataFrame(rows, "g string, v long")
    same = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    r = ks_two_sample(mk(same), "g", "v").collect()[0]
    assert r.ks_d_micro == 0 and not r.reject
    apart = [("a", v) for v in range(0, 10)] + [
        ("b", v) for v in range(100, 112)
    ]
    r2 = ks_two_sample(mk(apart), "g", "v").collect()[0]
    assert r2.ks_d_micro == 1_000_000 and r2.at_value == 9
    # n1=10, n2=12: crit = 1.3581*sqrt(22/120) ~ 0.58 < 1 -> reject.
    # (With n=2 vs 3 the asymptotic threshold EXCEEDS 1 and even a
    # fully separated pair doesn't reject — correct, the formula's
    # small-sample honesty.)
    assert r2.reject

    import random

    rng = random.Random(3)
    data = [("a", rng.randint(0, 15)) for _ in range(40)] + [
        ("b", rng.randint(5, 20)) for _ in range(25)
    ]
    r3 = ks_two_sample(mk(data), "g", "v").collect()[0]
    xs = sorted({v for _, v in data})
    n1 = sum(1 for g, _ in data if g == "a")
    n2 = len(data) - n1
    best = max(
        (
            abs(
                sum(1 for g, v in data if g == "a" and v <= t) * n2
                - sum(1 for g, v in data if g == "b" and v <= t) * n1
            ),
            -t,
        )
        for t in xs
    )
    assert r3.ks_d_micro == best[0] * 1_000_000 // (n1 * n2)
    assert r3.at_value == -best[1]
    crit = round(1_358_100 * math.sqrt((n1 + n2) / (n1 * n2)))
    assert r3.crit_micro == crit
    three = mk([("a", 1), ("b", 2), ("c", 3)])
    with pytest.raises(ValueError, match="exactly 2 groups"):
        ks_two_sample(three, "g", "v")


def test_uplift_curve_separates_responders(spark):
    """A band whose conversions only happen under treatment tops the
    ranking and contributes its full incremental count; a band where
    treatment HURTS ranks last; the Qini arithmetic replays by hand."""
    from amazonredshift_blueprints_spark.operators.ml import uplift_curve

    # band 1: treat converts 100%, control 0%  -> score 1e6 (best)
    # band 2: no effect (both convert half the time) -> score 0
    # band 3: treat 0%, control 100%           -> score -1e6 (worst)
    def rows2(n):
        out = []
        for i in range(n):
            out.append((1, 1, 1)); out.append((1, 0, 0))
            out.append((2, 1, i % 2)); out.append((2, 0, i % 2))
            out.append((3, 1, 0)); out.append((3, 0, 1))
        return out

    df = spark.createDataFrame(rows2(10), "band long, t int, y int")
    out = uplift_curve(df, df, "band", "t", "y").collect()
    assert [r.band for r in out] == [1, 2, 3]
    assert out[0].score_micro == 1_000_000
    assert out[1].score_micro == 0
    assert out[2].score_micro == -1_000_000
    # after band 1 only: cxt=10, cnt=10, cxc=0, cnc=10 -> qini = 10e6
    assert out[0].qini_micro == 10_000_000
    # after all: cxt=15, cxc=15, cnt=cnc=30 -> qini 0 (no net effect)
    assert out[2].qini_micro == 0


def test_theil_sen_robust_to_outlier(spark):
    """Theil-Sen recovers the true slope under a gross outlier that
    would wreck OLS; median convention and truncating-negative slopes
    replay in python."""
    from amazonredshift_blueprints_spark.operators.ml import theil_sen_trend

    # y = 3x except one wild point; 6 points -> 15 pairs
    pts = [(1, x, 3 * x) for x in range(5)] + [(1, 5, 1_000_000)]
    # a clean negative-slope group: y = -7x/2 (odd dys exercise trunc)
    pts += [(2, x, -7 * x // 2 * 2 - (x % 2)) for x in range(4)]
    df = spark.createDataFrame(pts, "k long, x long, y long")
    got = {r.key: (r.n_points, r.n_pairs, r.slope_micro)
           for r in theil_sen_trend(df, "k", "x", "y").collect()}

    def replay(rows):
        slopes = []
        for i in range(len(rows)):
            for j in range(len(rows)):
                (x1, y1), (x2, y2) = rows[i], rows[j]
                if x1 < x2:
                    num = (y2 - y1) * 1_000_000
                    q = abs(num) // (x2 - x1)
                    slopes.append(q if num >= 0 else -q)  # trunc
        slopes.sort()
        return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]

    for k in (1, 2):
        rows = [(x, y) for kk, x, y in pts if kk == k]
        m, med = replay(rows)
        assert got[k] == (len(rows), m, med), k
    # the outlier did not drag the median off the true 3.0 slope
    assert got[1][2] == 3_000_000


def test_cuped_adjustment_removes_covariate_noise(spark):
    """When post = pre + arm_effect exactly, CUPED recovers the pure
    effect with theta=1 and rho2~1 while the raw diff is polluted by
    the pre-period imbalance; constant-pre degenerates to NULLs."""
    from amazonredshift_blueprints_spark.operators.ml import (
        cuped_adjustment,
    )

    rows = []
    # arm 0 users happen to have higher pre-period activity
    for i in range(20):
        pre = 100 + i * 10 + (50 if i % 2 == 0 else 0)
        arm = i % 2
        post = pre + (7 if arm == 0 else 0)  # true effect: +7 for arm 0
        rows.append((arm, pre, post))
    df = spark.createDataFrame(rows, "arm long, x long, y long")
    r = cuped_adjustment(df, "arm", "x", "y").collect()[0]
    assert (r.n_a, r.n_b) == (10, 10)
    # pre means: arm0 = 240, arm1 = 200 -> raw diff = 40 + 7 = 47
    assert abs(r.raw_diff_r6 - 47.0) < 1e-6
    # theta ~ 1 (slightly >1: the effect itself correlates with pre
    # through the arm assignment — pooled-theta's known small bias)
    assert abs(r.theta_r6 - 1.0) < 0.05
    # CUPED strips the 40-unit pre imbalance; residual ~ the theta bias
    assert abs(r.cuped_diff_r6 - 7.0) < 1.0
    assert abs(r.cuped_diff_r6) < abs(r.raw_diff_r6) / 5
    assert r.rho2_r6 > 0.99
    flat = spark.createDataFrame(
        [(0, 5, 1), (1, 5, 2), (0, 5, 3), (1, 5, 4)], "arm long, x long, y long"
    )
    r2 = cuped_adjustment(flat, "arm", "x", "y").collect()[0]
    assert r2.theta_r6 is None and r2.rho2_r6 is None  # var(x)=0


def test_isotonic_fit_matches_pav(spark):
    """The minimax fit equals a pure-python PAV (pool adjacent
    violators) on a violating sequence, is always monotone, and leaves
    an already-monotone sequence untouched."""
    from amazonredshift_blueprints_spark.operators.ml import isotonic_fit

    SCALE = 1_000_000_000

    def pav(points):  # [(num, den)] -> pooled rates in SCALE units
        blocks = [[n, d] for n, d in points]
        out = []
        for b in blocks:
            out.append(b)
            while len(out) > 1 and (
                out[-2][0] * out[-1][1] >= out[-1][0] * out[-2][1]
            ):
                n2, d2 = out.pop()
                out[-1][0] += n2
                out[-1][1] += d2
        fits = []
        for n, d in out:
            fits.append(n * SCALE // d)
        expanded, bi = [], 0
        consumed = 0
        for n, d in points:
            expanded.append(fits[bi])
            consumed += d
            if consumed == sum(x[1] for x in out[: bi + 1]):
                bi += 1
        return expanded

    # rates: .8, .2, .6, .6, .1 — multiple violations
    pts = [(8, 10), (2, 10), (6, 10), (6, 10), (1, 10)]
    df = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(pts)],
        "x long, num long, den long",
    )
    got = [r.fit_q for r in isotonic_fit(df, "x", "num", "den").collect()]
    assert got == sorted(got, reverse=True) or got == sorted(got)
    # isotonic = NON-DECREASING fit; our violating fixture pools down
    assert got == sorted(got)
    assert got == pav(pts)
    # already monotone input: fit == observed rates exactly
    mono = [(1, 10), (3, 10), (5, 10), (9, 10)]
    df2 = spark.createDataFrame(
        [(i, n, d) for i, (n, d) in enumerate(mono)],
        "x long, num long, den long",
    )
    out2 = isotonic_fit(df2, "x", "num", "den").collect()
    assert [r.fit_q for r in out2] == [r.rate_q for r in out2]


def test_calibration_bin_clamp_and_edge_alignment(spark):
    """r11 advisor: p = 1e6 exactly (an all-positive band's score) must
    land in the LAST bin, not an overflow bin; and a bin count that
    does not divide 1e6 (n_bins=7) still covers the unit interval with
    no bin index ever reaching n_bins."""
    from amazonredshift_blueprints_spark.operators.ml import (
        calibration_report,
    )

    rows = [(1_000_000, 1), (999_999, 1), (0, 0), (500_000, 1)]
    scored = spark.createDataFrame(rows, "p_micro long, y int")
    got = {r.bin: r.n for r in calibration_report(scored).collect()}
    assert got == {0: 1, 5: 1, 9: 2}  # 1.0 and 0.999999 share bin 9
    for n_bins in (3, 7, 10):
        bins = [
            r.bin
            for r in calibration_report(scored, n_bins=n_bins).collect()
        ]
        assert all(0 <= b < n_bins for b in bins), (n_bins, bins)


def test_two_arm_contract_welch_cuped_power(spark):
    """r11 advisor: welch/cuped/power refuse multi-arm inputs loudly
    (the srm/ks contract) instead of silently using min/max arms."""
    import datetime as dt

    import pytest

    from amazonredshift_blueprints_spark.operators.ml import (
        cuped_adjustment,
        power_planner,
        welch_ttest,
    )

    three = spark.createDataFrame(
        [(0, 5), (1, 7), (2, 9)], "g long, v long"
    )
    with pytest.raises(ValueError, match="exactly 2 groups"):
        welch_ttest(three, "g", "v").collect()
    users3 = spark.createDataFrame(
        [(0, 1, 2), (1, 3, 4), (2, 5, 6)], "g long, pre long, post long"
    )
    with pytest.raises(ValueError, match="exactly 2 groups"):
        cuped_adjustment(users3, "g", "pre", "post").collect()
    d0 = dt.datetime(2024, 7, 1)
    stream3 = spark.createDataFrame(
        [(0, 1, d0), (1, 0, d0), (2, 1, d0)],
        "g long, s int, ts timestamp",
    )
    with pytest.raises(ValueError, match="exactly 2 groups"):
        power_planner(stream3, "g", "s", "ts").collect()


def test_gini_concentration_replay(spark):
    """Gini matches the sequential rank-form replay: uniform weights
    score 0, one-holder concentration approaches (n-1)/n."""
    from amazonredshift_blueprints_spark.operators.ml import (
        gini_concentration,
    )

    uniform = spark.createDataFrame(
        [(i, 10) for i in range(20)], "id long, w long"
    )
    r = gini_concentration(uniform, "w", "id").collect()[0]
    assert (r.n, r.total_w, r.gini_micro) == (20, 200, 0)
    onehot = spark.createDataFrame(
        [(i, 0) for i in range(19)] + [(99, 100)], "id long, w long"
    )
    r = gini_concentration(onehot, "w", "id").collect()[0]
    # G = (2*20*100 - 21*100) / (20*100) = 0.95 exactly
    assert r.gini_micro == 950_000
    skewed = [(i, (i * 7) % 13 + 1) for i in range(50)]
    df = spark.createDataFrame(skewed, "id long, w long")
    got = gini_concentration(df, "w", "id").collect()[0]
    ws = sorted((w, i) for i, w in skewed)
    n, tot = len(ws), sum(w for w, _ in ws)
    num = 2 * sum((r + 1) * w for r, (w, _) in enumerate(ws)) - (n + 1) * tot
    assert got.gini_micro == num * 1_000_000 // (n * tot)


def test_cohens_kappa_replay(spark):
    """Kappa matches the closed form; perfect agreement = 1e6; the
    pe=1 degenerate yields NULL."""
    from amazonredshift_blueprints_spark.operators.ml import cohens_kappa

    rows = [(1, 1)] * 20 + [(0, 0)] * 15 + [(1, 0)] * 5 + [(0, 1)] * 10
    df = spark.createDataFrame(rows, "a int, b int")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, n11, n10, n01, n00 = 50, 20, 5, 10, 15
    num = (n11 + n00) * n - (n11 + n10) * (n11 + n01) - (n01 + n00) * (
        n10 + n00
    )
    den = n * n - (n11 + n10) * (n11 + n01) - (n01 + n00) * (n10 + n00)
    q, rem = divmod(num * 1_000_000, den)
    assert r.kappa_micro == q
    perfect = spark.createDataFrame([(1, 1)] * 3 + [(0, 0)] * 2, "a int, b int")
    assert cohens_kappa(perfect, "a", "b").collect()[0].kappa_micro == 1_000_000
    const = spark.createDataFrame([(1, 1)] * 4, "a int, b int")
    assert cohens_kappa(const, "a", "b").collect()[0].kappa_micro is None


def test_trimmed_mean_exact_replay(spark):
    """5%-trim on a hand fixture matches the sequential replay,
    tie values split their multiplicity across the cut correctly,
    degenerate bands yield NULL, invalid trim refuses."""
    import pytest

    from amazonredshift_blueprints_spark.operators.ml import trimmed_mean

    vals = [100] * 3 + [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                        15, 16, 17]  # n=20, 10% trim -> drop 2 low, 2 high
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v long")
    r = {
        x.grp: (x.n, x.lo_cut, x.hi_cut, x.mean_micro)
        for x in trimmed_mean(df, "g", "v", trim_milli=100).collect()
    }
    s = sorted(vals)
    kept = s[2:-2]
    assert r["a"] == (
        20, 2, 18, sum(kept) * 1_000_000 // len(kept)
    )
    # tie straddling the cut: [5,5,5,5] with 25% trim keeps middle 2
    ties = spark.createDataFrame(
        [("t", 5)] * 4, "g string, v long"
    )
    rt = trimmed_mean(ties, "g", "v", trim_milli=250).collect()[0]
    assert (rt.lo_cut, rt.hi_cut, rt.mean_micro) == (1, 3, 5_000_000)
    with pytest.raises(ValueError, match="trim_milli"):
        trimmed_mean(df, "g", "v", trim_milli=500)


def test_kaplan_meier_hand_replay(spark):
    """KM on the classic hand fixture matches the sequential integer
    recurrence exactly: censored subjects leave the risk set without
    dropping the curve; per-group curves are independent."""
    from amazonredshift_blueprints_spark.operators.ml import kaplan_meier

    rows = [
        ("a", 1, 1), ("a", 2, 1), ("a", 3, 0), ("a", 4, 1), ("a", 5, 0),
        ("a", 2, 1),
        ("b", 1, 0), ("b", 1, 0), ("b", 2, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, dur long, ev int")
    got = {
        (r.grp, r.t): (r.n_risk, r.d, r.s_micro)
        for r in kaplan_meier(df, "grp", "dur", "ev").collect()
    }

    def replay(subset):
        day = {}
        for _, d, e in subset:
            day.setdefault(d, [0, 0])
            day[d][0] += e
            day[d][1] += 1
        s, tot, seen, out = 1_000_000, len(subset), 0, {}
        for t in sorted(day):
            d, leave = day[t]
            n = tot - seen
            seen += leave
            num = s * (n - d)
            s = (num - num % n) // n
            out[t] = (n, d, s)
        return out

    for g in ("a", "b"):
        exp = replay([r for r in rows if r[0] == g])
        for t, v in exp.items():
            assert got[(g, t)] == v, (g, t)
    # group b: day 1 all censored -> survival still 1e6 at t=1
    assert got[("b", 1)][2] == 1_000_000


def test_km_step_exact_beyond_double_precision(spark):
    """The KM fold step is exact for risk sets past 2^53 (r12 advisor):
    the old long-arithmetic form divided as DOUBLE, drifting a few
    micros once s * n_risk exceeded 2^53 (n_risk ~9e9); the decimal
    (38,0) form matches Python big-int floor division bit-for-bit."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.ml import _km_step

    cases = [
        (999_999, 10**13 + 19, 7),
        (1_000_000, 9_223_372_036_854_775, 123_456_789),
        (1_000_000, 10**10 + 1, 1),  # the ~9e9 double breaking point
        (1_000_000, 5, 2),
        (0, 10, 1),
    ]
    df = spark.createDataFrame(
        [{"s": s, "n": n, "d": d} for s, n, d in cases]
    )
    for r in df.select(
        "s", "n", "d",
        _km_step(F.col("s"), F.col("n"), F.col("d")).alias("got"),
    ).collect():
        assert r["got"] == r["s"] * (r["n"] - r["d"]) // r["n"], r


def test_average_precision_hand_replay(spark):
    """AP@k on a hand fixture matches the literal definition, with the
    per-term quantization (floor each Precision@i to micro, BIGINT sum,
    floor-divide by min(R, k)); no-positive groups emit NULL."""
    from amazonredshift_blueprints_spark.operators.ml import (
        average_precision_eval,
    )

    rows = [
        # group a, ranked by score desc: labels 1,0,1,0 -> terms at
        # pos 1 (1/1) and pos 3 (2/3); R=2 -> denom 2
        ("a", 1, 40, 1), ("a", 2, 30, 0), ("a", 3, 20, 1), ("a", 4, 10, 0),
        # group b: no positives -> NULL ap
        ("b", 1, 9, 0), ("b", 2, 8, 0),
        # group c: positive beyond k=2 contributes nothing; R=2 but
        # only pos-1 hit is inside k -> denom min(2, 2) = 2
        ("c", 1, 9, 1), ("c", 2, 8, 0), ("c", 3, 7, 1),
    ]
    df = spark.createDataFrame(rows, "g string, item int, score int, lab int")
    got = {
        r["grp"]: (r["n_retrieved"], r["n_pos"], r["sum_prec_q"], r["ap_micro"])
        for r in average_precision_eval(
            df, "g", "item", "score", "lab", k=2
        ).collect()
    }
    # a: terms = 1000000 (pos1) ; pos3 outside k=2 -> sum 1000000,
    #    denom min(2,2)=2 -> 500000
    assert got["a"] == (4, 2, 1_000_000, 500_000)
    assert got["b"] == (2, 0, 0, None)
    assert got["c"] == (3, 2, 1_000_000, 500_000)
    # k=10 over group a: terms 1000000 + 2000000//3=666666 -> 1666666,
    # denom 2 -> 833333
    got10 = {
        r["grp"]: r["ap_micro"]
        for r in average_precision_eval(
            df, "g", "item", "score", "lab", k=10
        ).collect()
    }
    assert got10["a"] == 833_333
