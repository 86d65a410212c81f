"""As-of (time-travel) join — a custom operator Spark SQL lacks.

For each left row, attach the LATEST right row with
``right_ts <= left_ts`` within the same key partition (the classic
quote-before-trade / last-view-before-click join).

Implementation is the union + running-last trick, NOT a theta join:
tag both inputs, union them, and take ``last(payload, ignorenulls)``
over a window ordered by (ts, tag, tiebreaker). One shuffle on the key,
O(n log n) per partition, zero range explosion — a theta join
(``l.ts >= r.ts``) would build |L|·|R| pairs per key before pruning,
which is exactly what kills at 100 TB. Right rows sort before left rows
at equal timestamps (tag 0 < 1), so ``<=`` semantics are exact; a final
unique tiebreaker makes equal-timestamp right rows deterministic.

DuckDB grew a native ASOF JOIN for the same reason; the catalog oracle
(c19) mirrors this union+window form instead so both engines compute
identical tie behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tiebreak: str,
) -> DataFrame:
    """Attach, to every ``left`` row, the payload of the latest ``right``
    row at-or-before its timestamp (per ``on`` key).

    ``payload`` maps output column name → right column; ``tiebreak`` is
    a unique right column ordering equal-timestamp right rows (last
    wins). Left rows with no prior right row carry nulls.
    """
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{out}:{right.schema[src].dataType.simpleString()}"
                for out, src in payload.items()
            )
            + ">"
        )
        .alias("_right"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tie"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        F.struct(
            *[F.col(src).alias(out) for out, src in payload.items()]
        ).alias("_right"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_tag"), F.asc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "_asof", F.last("_right", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_tag") == 1).select(
        F.col("_left.*"),
        *[F.col(f"_asof.{name}").alias(name) for name in payload],
    )
    return out
