"""Skew mitigation: explicit key salting for pathological hot keys.

AQE's skew-join handling (on by default in session.py) splits oversized
*partitions* at runtime and covers most real skew. Explicit salting is
the remaining tool for the case AQE cannot fix: a SINGLE key whose rows
exceed one executor's capacity (the classic offenders in LLM pipelines:
the empty document, the null user id, the default timestamp). Salting
splits that one key's rows across ``n_salts`` reducers by widening the
join key.

Cost model: the uniform (smaller) side is replicated ``n_salts`` times —
choose the side to salt accordingly; the skewed side is scanned once
with a per-row hash. Both sides stay fully distributed; nothing touches
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    uniform: DataFrame,
    left_on: str,
    right_on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key rows spread over ``n_salts`` reducers.

    The skewed side's salt is a deterministic hash of its full row (so
    re-runs and retries agree); the uniform side is replicated once per
    salt value. Output equals the plain ``skewed.join(uniform, on, how)``
    for inner/left joins (asserted in tests/test_skew.py).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    ).cast("long")
    left = skewed.withColumn("_salt", salt)
    right = uniform.withColumn(
        "_salt_r",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    cond = (F.col(left_on) == F.col(right_on)) & (
        F.col("_salt") == F.col("_salt_r")
    )
    return left.join(right, cond, how).drop("_salt", "_salt_r")
