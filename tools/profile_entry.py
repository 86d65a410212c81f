"""Per-entry profiling for the optimization rounds: time an entry with
the noop sink (guide §1.4) and capture its ``explain("formatted")`` plan.

Usage:
    python tools/profile_entry.py [--sf DIR] [--runs N] [--plan-out DIR:TAG] name...

- Timing: one warmup + N timed runs (median reported), cache cleared
  before each timed run — the same methodology as bench.py, so numbers
  are comparable.
- ``--plan-out plans/r16:before`` writes ``plans/r16/<name>_before.txt``
  with the formatted plan (the judge-facing artifact).
- Plan summary: Exchange / BatchEvalPython / ArrowEvalPython / join node
  counts are printed per entry so plan-shape diffs are one grep away.
"""

from __future__ import annotations

import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonredshift_blueprints_spark.plans import QUERIES  # noqa: E402
from amazonredshift_blueprints_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def plan_summary(text: str) -> str:
    counts = {}
    for node in (
        "Exchange",
        "BroadcastExchange",
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "BatchEvalPython",
        "ArrowEvalPython",
        "MapInArrow",
        "FlatMapGroupsInPandas",
        "MapInPandas",
        "Sort ",
        "Window",
        "HashAggregate",
        "ObjectHashAggregate",
        "SortAggregate",
        "InMemoryTableScan",
    ):
        n = len(re.findall(rf"(?m)^\s*[+:\-\s|]*\*?\(?\d*\)?\s?{re.escape(node)}", text))
        if n:
            counts[node.strip()] = n
    return " ".join(f"{k}={v}" for k, v in sorted(counts.items()))


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    plan_out = None
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            i += 1
            sf_dir = argv[i]
        elif a == "--runs":
            i += 1
            runs = int(argv[i])
        elif a == "--plan-out":
            i += 1
            plan_out = argv[i]
        else:
            names.append(a)
        i += 1

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        full = name if name in QUERIES else next(
            (k for k in QUERIES if k.split("_", 1)[0] == name), None
        )
        if full is None:
            print(f"SKIP {name}: not in catalog")
            continue
        build = QUERIES[full].build
        spark.sparkContext.setJobDescription(f"profile:{full}")
        t0 = time.time()
        df = build(spark, sf_dir)
        build_s = time.time() - t0
        text = plan_text(df)
        if plan_out:
            out_dir, tag = plan_out.split(":", 1)
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"{full}_{tag}.txt"), "w") as f:
                f.write(text)
        _force(df)  # warmup
        timed = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            _force(build(spark, sf_dir))
            timed.append(round(time.time() - t0, 3))
        med = statistics.median(timed)
        print(
            f"{full}: median={med:.3f}s runs={timed} build={build_s:.2f}s\n"
            f"  plan: {plan_summary(text)}"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
