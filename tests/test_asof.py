"""asof_join edge semantics on a hand-built frame."""

from __future__ import annotations

import datetime as dt

from amazonredshift_blueprints_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 10, _ts(2)), (3, 11, _ts(9)), (4, 12, _ts(1))],
        "lid LONG, k LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts(2)),   # equal ts to lid=2 → counts (<=)
            (101, 10, _ts(4)),
            (102, 10, _ts(6)),   # after lid=1 → ignored for it
            (103, 11, _ts(9)),   # equal-ts tie with 104
            (104, 11, _ts(9)),   # higher tiebreak id at same ts → wins
        ],
        "rid LONG, k LONG, ts TIMESTAMP",
    )
    out = {
        r["lid"]: (r["prior_rid"], r["prior_ts"])
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="ts",
            payload={"prior_rid": "rid", "prior_ts": "ts"},
            tiebreak="rid",
        ).collect()
    }
    assert out[1] == (101, _ts(4))   # latest at-or-before ts=5
    assert out[2] == (100, _ts(2))   # equal timestamp counts
    assert out[3] == (104, _ts(9))   # tie at same ts → highest tiebreak
    assert out[4] == (None, None)    # no prior right row
    assert len(out) == 4             # every left row survives


def test_asof_forward_nearest_tolerance(spark):
    """merge_asof parity: forward takes the earliest at-or-after row
    (first tiebreak), nearest picks by absolute distance with ties to
    backward, tolerance voids too-far matches; invalid args refuse."""
    import pytest

    from amazonredshift_blueprints_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L10"), (1, 25, "L25"), (1, 100, "L100"), (2, 5, "Lk2")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 8, 1, "r8"), (1, 20, 2, "r20"), (1, 30, 3, "r30"),
         (1, 25, 4, "r25")],
        "k long, ts long, rid long, val string",
    )
    kw = dict(on="k", left_ts="ts", right_ts="ts",
              payload={"val": "val"}, tiebreak="rid")

    fwd = {
        (r.ts,): r.val
        for r in asof_join(left, right, direction="forward", **kw).collect()
    }
    # ts=10 -> r20; ts=25 -> r25 (at-or-after includes equal);
    # ts=100 -> none; k=2 -> none
    assert fwd == {(10,): "r20", (25,): "r25", (100,): None, (5,): None}

    near = {
        (r.ts,): r.val
        for r in asof_join(left, right, direction="nearest", **kw).collect()
    }
    # ts=10: r8 (d=2) vs r20 (d=10) -> r8; ts=25: exact r25 (d=0);
    # ts=100: backward r30; k=2: only forward side empty AND backward
    # empty -> None
    assert near == {(10,): "r8", (25,): "r25", (100,): "r30", (5,): None}

    tol = {
        (r.ts,): r.val
        for r in asof_join(
            left, right, direction="nearest", tolerance=5, **kw
        ).collect()
    }
    assert tol == {(10,): "r8", (25,): "r25", (100,): None, (5,): None}

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, direction="sideways", **kw)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, tolerance=-1, **kw)


def test_asof_forward_equal_ts_tie_first_wins(spark):
    """Equal-timestamp right rows under forward: smallest tiebreak
    wins (mirror of backward's last-wins)."""
    from amazonredshift_blueprints_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 2, "b"), (1, 10, 1, "a")], "k long, ts long, rid long, v string"
    )
    got = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        payload={"v": "v"}, tiebreak="rid", direction="forward",
    ).collect()
    assert got[0].v == "a"


def test_asof_forward_mirror_matches_bruteforce(spark):
    """r13: forward/nearest moved from a [current, UNBOUNDED FOLLOWING]
    frame (O(n²) per partition in Spark) to the reversed-order running
    frame. Pin the mirror's equivalence against a brute-force
    per-row computation on a randomized fixture with equal-ts ties."""
    import random

    from amazonredshift_blueprints_spark.operators.asof import asof_join

    rng = random.Random(13)
    lrows = [(k, rng.randint(0, 30)) for k in ("a", "b") for _ in range(25)]
    rrows = [
        (k, rng.randint(0, 30), i, i * 10)
        for i, k in enumerate(k for k in ("a", "b") for _ in range(20))
    ]
    left = spark.createDataFrame(lrows, "k string, ts long")
    right = spark.createDataFrame(rrows, "k string, ts long, rid long, v long")

    def brute(direction):
        out = {}
        for lk, lts in lrows:
            cands = [(rts, rid, v) for (rk, rts, rid, v) in rrows if rk == lk]
            if direction == "forward":
                c = [(rts, rid, v) for rts, rid, v in cands if rts >= lts]
                # earliest ts, then smallest tiebreak (first wins)
                pick = min(c, key=lambda x: (x[0], x[1]), default=None)
            else:  # nearest, ties -> backward
                b = [(rts, rid, v) for rts, rid, v in cands if rts <= lts]
                f = [(rts, rid, v) for rts, rid, v in cands if rts >= lts]
                # backward: latest ts, equal-ts ties -> LAST (largest
                # tiebreak) wins, the documented backward convention
                pb = max(b, key=lambda x: (x[0], x[1]), default=None)
                pf = min(f, key=lambda x: (x[0], x[1]), default=None)
                if pb is None:
                    pick = pf
                elif pf is None:
                    pick = pb
                else:
                    pick = pb if (lts - pb[0]) <= (pf[0] - lts) else pf
            out.setdefault((lk, lts), pick[2] if pick else None)
        return out

    for direction in ("forward", "nearest"):
        got = asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            payload={"v": "v"}, tiebreak="rid", direction=direction,
        )
        want = brute(direction)
        for r in got.collect():
            assert r["v"] == want[(r["k"], r["ts"])], (
                direction, r["k"], r["ts"], r["v"], want[(r["k"], r["ts"])]
            )
