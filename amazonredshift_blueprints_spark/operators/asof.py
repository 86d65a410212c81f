"""As-of (time-travel) join — a custom operator Spark SQL lacks.

For each left row, attach the LATEST right row with
``right_ts <= left_ts`` within the same key partition (the classic
quote-before-trade / last-view-before-click join) — or, with
``direction``, the EARLIEST at-or-after row ("forward": time-to-next-
event) or the closest of the two ("nearest"), optionally bounded by a
``tolerance`` (the pandas ``merge_asof`` parameter surface).

Implementation is the union + running-last trick, NOT a theta join:
tag both inputs, union them, and take ``last(payload, ignorenulls)``
over a window ordered by (ts, tag, tiebreaker). One shuffle on the key,
O(n log n) per partition, zero range explosion — a theta join
(``l.ts >= r.ts``) would build |L|·|R| pairs per key before pruning,
which is exactly what kills at 100 TB. Right rows sort before left rows
at equal timestamps (tag 0 < 1), so ``<=`` semantics are exact; a final
unique tiebreaker makes equal-timestamp right rows deterministic. The
forward direction is the REVERSED-order running window (``last`` over
[unbounded, current] with the total ordering flipped — same answer as
a first-over-[current, unbounded-following] frame, but O(n) per
partition where Spark evaluates unbounded-FOLLOWING frames by
rescanning the tail per row, O(n²) on the data-sized union);
"nearest" evaluates both windows over the SAME union (one shuffle,
two sorts) and picks per row by absolute distance, ties backward —
the pandas convention.

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
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Attach, to every ``left`` row, the payload of the matched
    ``right`` row (per ``on`` key): latest at-or-before
    (``direction="backward"``, the default), earliest at-or-after
    (``"forward"``), or the absolute-closest with ties to backward
    (``"nearest"``).

    ``payload`` maps output column name → right column; ``tiebreak`` is
    a unique right column ordering equal-timestamp right rows (last
    wins backward, first wins forward). Left rows with no match carry
    nulls. ``tolerance`` (optional) voids matches further than that
    many ts units away — NATIVE units for numeric timestamps, SECONDS
    for TimestampType (both engines' ``CAST(ts AS BIGINT)`` epoch), a
    stated contract, not a hidden cast.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    need_rts = tolerance is not None or direction == "nearest"
    payload_fields = ",".join(
        f"{out}:{right.schema[src].dataType.simpleString()}"
        for out, src in payload.items()
    )
    if need_rts:
        payload_fields += f",_rts:{right.schema[right_ts].dataType.simpleString()}"
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast("struct<" + payload_fields + ">").alias("_right"),
    )
    r_payload = [F.col(src).alias(out) for out, src in payload.items()]
    if need_rts:
        r_payload.append(F.col(right_ts).alias("_rts"))
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak).alias("_tie"),
        F.lit(None).cast(l_tagged.schema["_left"].dataType).alias("_left"),
        F.struct(*r_payload).alias("_right"),
    )
    merged = l_tagged.unionByName(r_tagged)
    # backward: right rows sort BEFORE left at equal ts (tag 0 < 1), so
    # the [unbounded, current] frame's running-last sees them — exact
    # <= semantics. forward is the REVERSED-order running frame:
    # "first non-null at-or-after in (ts asc, tag desc, tie asc)" is
    # exactly "last non-null at-or-before in (ts desc, tag asc, tie
    # desc)" — same answer, but a running [unbounded, current] frame is
    # O(n) per partition while Spark evaluates a [current, unbounded-
    # FOLLOWING] frame by rescanning the partition tail per row,
    # O(n²) on the data-sized union (the c88 gap-fill lesson, r13).
    w_b = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_tag"), F.asc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy("_k")
        .orderBy(F.desc("_ts"), F.asc("_tag"), F.desc_nulls_first("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction == "backward":
        merged = merged.withColumn(
            "_asof", F.last("_right", ignorenulls=True).over(w_b)
        )
    elif direction == "forward":
        merged = merged.withColumn(
            "_asof", F.last("_right", ignorenulls=True).over(w_f)
        )
    else:  # nearest: both windows over the same union (two sorts, one
        # shuffle — the orderings already differed before the rewrite)
        bwd = F.last("_right", ignorenulls=True).over(w_b)
        fwd = F.last("_right", ignorenulls=True).over(w_f)
        d_b = F.col("_ts").cast("long") - bwd["_rts"].cast("long")
        d_f = fwd["_rts"].cast("long") - F.col("_ts").cast("long")
        merged = merged.withColumn(
            "_asof",
            F.when(bwd.isNull(), fwd)
            .when(fwd.isNull(), bwd)
            .when(d_b <= d_f, bwd)  # tie -> backward (pandas)
            .otherwise(fwd),
        )
    if tolerance is not None:
        delta = F.abs(
            F.col("_ts").cast("long") - F.col("_asof._rts").cast("long")
        )
        merged = merged.withColumn(
            "_asof", F.when(delta <= tolerance, F.col("_asof"))
        )
    out = merged.filter(F.col("_tag") == 1).select(
        F.col("_left.*"),
        *[F.col(f"_asof.{name}").alias(name) for name in payload],
    )
    return out
