"""Table-maintenance operators: small-file compaction with sorted output.

Reference basis: Redshift handles this inside the warehouse (VACUUM /
auto-sort merges the unsorted region; ``upload_file.py``'s chunked
INSERTs are exactly the kind of trickle-ingest that fragments a table).
On a lake-backed Spark table the same problem appears as the SMALL
FILES problem: every micro-batch / chunk upload lands one file, file
counts explode, and scan planning + open() overhead dominate reads.
Compaction is the VACUUM analog: rewrite a directory into few
near-target-size files, optionally range-sorted so parquet row-group
min/max statistics (zone maps) make later range filters selective.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (local filesystem walk;
    on an object store, table/catalog statistics replace this)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    *,
    target_file_bytes: int = 128 << 20,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite a fragmented parquet directory into ``ceil(total/target)``
    near-target-size files — Spark's VACUUM.

    With ``order_cols`` the rewrite is ``repartitionByRange`` +
    ``sortWithinPartitions`` on those columns: every output file (and
    row group inside it) covers a narrow value range, so parquet
    min/max statistics turn later filters on those columns into
    row-group skips — the zone-map benefit Redshift gets from its sort
    keys, here for free from the write layout. Without ``order_cols``
    a plain round-robin ``repartition`` balances file sizes.

    Returns the compacted DataFrame (read back from ``dest_dir``).

    100 TB: one shuffle (range or round-robin) sized by the data being
    compacted — compaction jobs run per-partition/per-day in practice,
    so the shuffle is one increment, not the table. The range
    partitioner samples keys, so output files stay balanced even under
    skewed sort columns.
    """
    df = spark.read.parquet(src_dir)
    n_files = max(1, math.ceil(_dir_bytes(src_dir) / target_file_bytes))
    if order_cols:
        out = df.repartitionByRange(n_files, *order_cols).sortWithinPartitions(
            *order_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dest_dir)
    return spark.read.parquet(dest_dir)
