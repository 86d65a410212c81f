"""Unit tests for the round-11 late additions: blocked fuzzy record
linkage (operators/linkage.py), the grid-pruned skyline operator
(operators/skyline.py), and n-gram novelty (operators/text.py) — each
checked against an in-Python brute force on adversarial fixtures
(duplicates, ties, degenerate axes, skewed blocks)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from amazonredshift_blueprints_spark.operators.linkage import blocked_fuzzy_match
from amazonredshift_blueprints_spark.operators.skyline import skyline_2d
from amazonredshift_blueprints_spark.operators.text import ngram_novelty


# ---------------------------------------------------------------- skyline


def _brute_skyline(points):
    """ids of points not dominated under minimize-(x, y)."""
    out = []
    for i, (pid, x, y) in enumerate(points):
        dominated = any(
            (qx <= x and qy <= y and (qx < x or qy < y))
            for j, (qid, qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(pid)
    return sorted(out)


@pytest.mark.parametrize("bins", [4, 64])
def test_skyline_matches_brute_force(spark, bins):
    rng = random.Random(7)
    # small integer grid => plenty of exact ties and duplicate points
    pts = [(i, float(rng.randint(0, 15)), float(rng.randint(0, 15)))
           for i in range(300)]
    df = spark.createDataFrame(pts, "id bigint, x double, y double")
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y", bins=bins).collect())
    assert got == _brute_skyline(pts)


def test_skyline_keeps_coordinate_equal_frontier_twins(spark):
    pts = [(1, 1.0, 5.0), (2, 1.0, 5.0), (3, 4.0, 4.0), (4, 9.0, 1.0),
           (5, 9.0, 9.0)]
    df = spark.createDataFrame(pts, "id bigint, x double, y double")
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y", bins=8).collect())
    # twins 1/2 don't dominate each other; 5 is dominated by 3 and 4
    assert got == [1, 2, 3, 4]


def test_skyline_degenerate_axis_and_empty(spark):
    # all x equal -> frontier is the min-y row(s) only
    pts = [(1, 2.0, 9.0), (2, 2.0, 3.0), (3, 2.0, 7.0)]
    df = spark.createDataFrame(pts, "id bigint, x double, y double")
    got = [r["id"] for r in skyline_2d(df, "x", "y", bins=4).collect()]
    assert got == [2]
    empty = df.limit(0)
    assert skyline_2d(empty, "x", "y").count() == 0


# ---------------------------------------------------------------- linkage


def test_blocked_fuzzy_match_vs_brute_force(spark):
    rows = [
        (1, "red bolt", "bolt"),
        (2, "old bolt", "bolt"),
        (3, "blue bolt", "bolt"),
        (4, "red gear", "gear"),
        (5, "red bolt", "bolt"),  # exact duplicate -> distance 0 pair
        (6, "red gearx", "gearx"),  # cross-block near-match: MISSED by design
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, blk string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_match(
            df, "id", "name", F.col("blk"), max_distance=2
        ).collect()
    }

    def lev(a, b):
        # tiny DP reference
        d = [[i + j if 0 in (i, j) else 0 for j in range(len(b) + 1)]
             for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
        return d[len(a)][len(b)]

    want = {
        (ia, ib, lev(na, nb))
        for ia, na, ba in [(r[0], r[1], r[2]) for r in rows]
        for ib, nb, bb in [(r[0], r[1], r[2]) for r in rows]
        if ia < ib and ba == bb and lev(na, nb) <= 2
    }
    assert got == want
    assert (1, 5, 0) in got  # exact dup kept as strongest evidence
    assert not any({a, b} == {4, 6} for a, b, _ in got)  # blocking recall gap


def test_blocked_fuzzy_match_max_block_guard(spark):
    rows = [(i, f"name{i}", "big") for i in range(10)] + [
        (100, "red bolt", "small"),
        (101, "old bolt", "small"),
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, blk string")
    got = blocked_fuzzy_match(
        df, "id", "name", F.col("blk"), max_distance=2, max_block=5
    ).collect()
    # the oversized 'big' block is dropped entirely; 'small' survives
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}


# ---------------------------------------------------------------- novelty


def test_ngram_novelty_duplicates_and_first_seen(spark):
    rows = [
        (1, "a b c d e"),          # first doc: all grams novel
        (2, "a b c d e"),          # exact duplicate: nothing novel
        (3, "a b c x y z"),        # shares 'a b c' only
        (4, "p q"),                # too short for 3-grams: omitted
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["novelty_pct"] == 100.0
    assert got[2]["n_novel"] == 0 and got[2]["novelty_pct"] == 0.0
    # doc 3 grams: 'a b c', 'b c x', 'c x y', 'x y z' -> 3 of 4 novel
    assert (got[3]["n_grams"], got[3]["n_novel"]) == (4, 3)
    assert got[3]["novelty_pct"] == pytest.approx(75.0)


# ------------------------------------------------------- setsim / triangles


def test_setsim_prefix_join_matches_brute_force(spark):
    from amazonredshift_blueprints_spark.operators.dedup import (
        setsim_prefix_join,
    )

    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),          # exact dup of 1
        (3, "a b c d e f g x"),          # near dup of 1/2
        (4, "p q r s t u v w"),          # unrelated
        (5, "a b c p q r s t"),          # shares half with 1, half with 4
        (6, "x y"),                      # too short for 3-grams
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
        for r in setsim_prefix_join(
            df, "doc_id", "text", threshold_pct=60, ngram=3
        ).collect()
    }

    def grams(t):
        toks = t.split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, (ia, ta) in enumerate([(d, t) for d, t in docs]):
        for ib, tb in docs[i + 1:]:
            ga, gb = grams(ta), grams(tb)
            if not ga or not gb:
                continue
            inter = len(ga & gb)
            union = len(ga | gb)
            if 100 * inter >= 60 * union:
                want[(ia, ib)] = (inter, union)
    assert got == want
    assert (1, 2) in got and (1, 3) in got  # dup + planted near-dup found
    assert not any(4 in pair for pair in got)  # unrelated stays out


def test_setsim_prefix_join_token_domain(spark):
    from amazonredshift_blueprints_spark.operators.dedup import (
        setsim_prefix_join,
    )

    docs = [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
        for r in setsim_prefix_join(
            df, "doc_id", "text", threshold_pct=60, ngram=1
        ).collect()
    }
    assert got == {(1, 2): (3, 5)}  # 3/5 = 0.6 exactly (>= is inclusive)


def test_triangle_count_matches_brute_force(spark):
    import itertools
    import random

    from amazonredshift_blueprints_spark.operators.graph import triangle_count

    rng = random.Random(11)
    edges = [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(80)]
    edges += [(3, 3), (5, 5)]            # self loops: ignored
    edges += edges[:10]                  # duplicates: deduped
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = triangle_count(df).collect()[0]["n_triangles"]

    undirected = {frozenset(e) for e in edges if e[0] != e[1]}
    nodes = sorted({v for e in undirected for v in e})
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {frozenset((a, b)), frozenset((a, c)), frozenset((b, c))}
        <= undirected
    )
    assert got == want and want > 0


def test_survivorship_modal_fields_beat_canonical(spark):
    """Cluster {1,2,3}: doc 3 is longest (canonical) but its lang 'zz'
    is the minority — the modal 'en' must win the field; source ties
    2-2... no: sources s1,s1,s2 -> modal s1. Lexical tiebreak pinned
    by the two-way lang tie in cluster {10,11}."""
    from amazonredshift_blueprints_spark.operators.linkage import (
        survivorship_golden_record,
    )

    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        ["doc_id", "group_id"],
    )
    docs = spark.createDataFrame(
        [
            (1, 50, "en", "s1"),
            (2, 60, "en", "s1"),
            (3, 90, "zz", "s2"),
            (10, 10, "de", "sA"),
            (11, 10, "fr", "sB"),
        ],
        ["doc_id", "n_chars", "lang", "source"],
    )
    got = {
        r["group_id"]: (
            r["canonical_id"], r["n_members"], r["max_n_chars"],
            r["lang_modal"], r["source_modal"],
        )
        for r in survivorship_golden_record(
            groups, docs, "doc_id", quality_col="n_chars",
            fields=["lang", "source"],
        ).collect()
    }
    assert got[1] == (3, 3, 90, "en", "s1")
    # 1-1 ties: lexically smallest value wins, canonical by id tiebreak
    assert got[10] == (10, 2, 10, "de", "sA")


def test_clustering_coefficients_hand_graph(spark):
    """K3 plus a pendant: triangle nodes have lcc depending on degree
    (node 1 has deg 3 incl. pendant -> 1/3; nodes 2,3 deg 2 -> 1.0);
    pendant node 4 (deg 1) is excluded."""
    from amazonredshift_blueprints_spark.operators.graph import (
        clustering_coefficients,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4)], ["src", "dst"]
    )
    got = {
        r["node"]: (r["degree"], r["n_tri"], r["lcc_micro"])
        for r in clustering_coefficients(e).collect()
    }
    assert got == {
        1: (3, 1, 2 * 1_000_000 // 6),
        2: (2, 1, 1_000_000),
        3: (2, 1, 1_000_000),
    }
