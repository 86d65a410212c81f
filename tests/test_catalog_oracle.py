"""Every catalog entry with an oracle must match DuckDB bit-for-bit at
sf0.001 — a fast local mirror of the driver's t2 gate (which runs the
same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from amazonredshift_blueprints_spark.plans import QUERIES
from tools.check_correctness import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    sdf = spec.build(spark, sf_dir).toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert sdf.columns.tolist(), name
        return
    ddf = duck.execute(spec.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
