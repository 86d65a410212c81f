"""Storage-layout operators: partitioned table writes whose readers get
partition-pruned scans.

The cheapest query at 100 TB is the one whose input never leaves disk:
laying a fact table out as ``date=`` (or any low-cardinality key)
directories turns every time-ranged query into a scan of just the
matching directories — Catalyst turns the reader's filter into
PartitionFilters and the unmatched directories are never listed into
the scan (the same mechanism the stored IVF index exploits per ``cell=``
in `similarity.build_ivf_index`).

Partition-count discipline: one directory per value — date works
(thousands of partitions over years); raw timestamps or user ids do NOT
(millions of tiny files). Keep partition columns at the granularity
queries actually filter on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    date_col: str = "event_date",
) -> None:
    """Materialize ``df`` as a ``date_col=``-partitioned parquet table,
    deriving the date from ``ts_col``. One pass over the input; rows
    land in their date directory (no pre-shuffle — each input task
    appends to the partitions it sees, which is the right default; add
    a ``repartition(date_col)`` first only when the writer's
    files-per-partition explosion matters more than the shuffle)."""
    (
        df.withColumn(date_col, F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy(date_col)
        .parquet(path)
    )


def read_date_pruned(
    spark: SparkSession,
    path: str,
    start: str,
    end: str,
    *,
    date_col: str = "event_date",
) -> DataFrame:
    """Scan a date-partitioned table restricted to ``[start, end)`` —
    the filter lands in the scan's PartitionFilters (asserted in
    tests/test_plans.py), so unmatched ``date=`` directories are pruned
    from the file listing, not read-and-discarded."""
    return spark.read.parquet(path).filter(
        (F.col(date_col) >= F.lit(start).cast("date"))
        & (F.col(date_col) < F.lit(end).cast("date"))
    )
