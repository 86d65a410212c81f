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
