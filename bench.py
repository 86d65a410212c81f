"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line per the driver contract.

Methodology:
- Each benched query runs once as warmup (JVM/codegen/broadcast caches —
  Spark 4's first collation-aware expression alone costs ~10 s) and once
  timed. Persisted DataFrames are dropped between the two
  (``clearCache``) so operators that cache a multi-consumer stage
  (e.g. the MinHash signature table) are timed cold, not from the
  warmup's cache.
- Execution is forced with the ``noop`` sink: full computation, no
  sink-side cost, no driver-side collect.
- ``value`` is the sum of timed per-query seconds (lower is better).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazonredshift_blueprints_spark.plans import QUERIES  # noqa: E402
from amazonredshift_blueprints_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, spec in QUERIES.items() if spec.bench]
    timings: dict[str, float] = {}
    for name in names:
        build = QUERIES[name].build
        _force(build(spark, sf_dir))  # warmup
        spark.catalog.clearCache()  # time operator-level persists cold
        t0 = time.time()
        _force(build(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
