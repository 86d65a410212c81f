"""Bucketed range join: equi-join acceleration for interval predicates.

Reference basis: the reference hands range predicates straight to Redshift
as theta joins (``store_query_results.py:103`` — SQL like ``JOIN bands ON
price >= lo AND price < hi``). Spark lowers such a join to
BroadcastNestedLoopJoin (every fact row tested against every interval),
which is O(|fact| x |bands|) — fine for 5 bands, fatal when the interval
table grows. The standard scale fix (Databricks calls it a "range join
optimization"; the same banding idea underlies interval trees) is:

1. pick a bucket width ``W``;
2. explode each interval ``[lo, hi)`` into the integer buckets it overlaps
   (``floor(lo/W) .. floor((hi-eps)/W)``);
3. tag each fact row with its single bucket ``floor(value/W)``;
4. equi-join on the bucket id — a hash join Catalyst can shuffle or
   broadcast — then re-apply the exact ``lo <= value < hi`` residual.

Join work drops to O(|fact| + sum(interval_width/W)) candidate pairs; with
W chosen near the median interval width each interval explodes into O(1)
buckets, so the candidate set is within a small constant of the true
output. Correctness does not depend on W — the residual filter restores
exact semantics for any width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value: str,
    lo: str,
    hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` rows to every interval with ``lo <= value < hi``.

    ``intervals`` must not share column names with ``fact`` (aside from
    none); both inputs keep all their columns in the result. ``how`` is
    restricted to ``inner`` — outer range joins need the unmatched-side
    union the caller can add cheaply.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")

    w = float(bucket_width)
    fact_b = fact.withColumn("_rj_bucket", F.floor(F.col(value) / w))
    # one row per (interval, overlapped bucket)
    iv_b = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w),
                # hi is exclusive: a bucket starting exactly at hi is not overlapped
                F.floor((F.col(hi) - F.lit(1e-9)) / w),
            )
        ),
    )
    residual: Column = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return (
        fact_b.join(iv_b, on="_rj_bucket", how="inner")
        .filter(residual)
        .drop("_rj_bucket")
    )
