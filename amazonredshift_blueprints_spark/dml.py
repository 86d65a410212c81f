"""DML parity: DELETE / UPDATE / MERGE as copy-on-write table rewrites.

Reference basis: Redshift DELETE/UPDATE/MERGE statements arrive through
the reference's verbatim SQL hand-off (execute_sql.py:64,77). Spark's
session catalog over parquet has no in-place row mutation; ACID DML
belongs to table formats (Delta/Iceberg). The format-agnostic
Spark-native equivalent is the copy-on-write rewrite below — the same
strategy those formats implement under the hood, minus the transaction
log.

Semantics / limits (documented, not hidden):
- The rewrite is atomic per Spark's ``INSERT OVERWRITE`` job commit,
  but there is no multi-statement transaction or time travel.
- Source must be a managed catalog table (not a temp view over
  read-only files).

100 TB: both operations are one scan + one write, fully distributed;
predicate pushdown applies to the scan. With partitioned tables,
``spark.sql.sources.partitionOverwriteMode=dynamic`` confines the
rewrite to partitions that contain matches.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F


_STAGE_PREFIX = "_bp_dml_stage"


def _n(metric) -> int:
    """Observation sums are NULL over zero matching rows — report 0."""
    return int(metric) if metric is not None else 0


def _rewrite(spark: SparkSession, table: str, df) -> None:
    """Materialize ``df`` into a staging table, then overwrite ``table``.

    Spark (correctly) refuses ``INSERT OVERWRITE`` of a table the plan
    also reads (UNSUPPORTED_OVERWRITE), so the rewrite stages through a
    second managed table — the minimal copy-on-write commit without a
    table format's transaction log.

    The staging name is unique per call: concurrent DML statements in
    one warehouse (e.g. two sessions, or the streaming upsert sink's
    per-micro-batch MERGE racing an ad-hoc DELETE) must not overwrite
    or drop each other's stage. Note the per-TARGET-table race is still
    the caller's to serialize — two simultaneous rewrites of the SAME
    table last-write-wins, as in any catalog without a transaction log.
    """
    from .ingest import _clean_stale_location

    stage = f"{_STAGE_PREFIX}_{uuid.uuid4().hex[:12]}"
    _clean_stale_location(spark, stage, None)
    df.write.mode("overwrite").saveAsTable(stage)
    try:
        spark.sql(f"INSERT OVERWRITE TABLE {table} SELECT * FROM {stage}")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {stage}")


def delete_from(spark: SparkSession, table: str, condition: str) -> int:
    """``DELETE FROM table WHERE condition`` via copy-on-write.

    Returns the number of rows deleted.

    SQL DELETE removes only rows where the predicate is TRUE; rows where
    it evaluates NULL (e.g. ``x > 5`` with ``x`` NULL) are KEPT. A bare
    ``~expr(condition)`` would propagate NULL and drop those rows from
    the kept set, so the predicate is coalesced to FALSE first.

    The deleted-row count rides the rewrite's own scan via
    ``DataFrame.observe`` (a CollectMetrics node above the scan, below
    the filter) — no separate COUNT job before or after. At 100 TB the
    scan is the dominant cost and it runs exactly once.
    """
    hit = F.coalesce(F.expr(condition), F.lit(False))
    obs = Observation()
    observed = spark.table(table).observe(
        obs, F.sum(F.when(hit, 1).otherwise(0)).alias("n_deleted")
    )
    _rewrite(spark, table, observed.filter(~hit))
    return _n(obs.get["n_deleted"])


def merge_into(
    spark: SparkSession,
    table: str,
    source,
    keys: list[str],
    *,
    delete_condition: str | None = None,
) -> tuple[int, int, int]:
    """``MERGE INTO table USING source ON keys
    [WHEN MATCHED AND <delete_condition> THEN DELETE]
    WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT``
    via copy-on-write.

    ``source`` must carry the target's full schema. Matched target rows
    take the source's values wholesale (the common upsert form);
    unmatched source rows are inserted; target-only rows pass through.
    ``delete_condition`` (a SQL expression over the SOURCE row — the
    CDC pattern where change records carry a deletion marker) turns
    matching source rows into deletes: matched targets are removed,
    and unmatched delete-records are ignored rather than inserted —
    Redshift's ``WHEN MATCHED THEN DELETE`` arm. Returns
    ``(n_updated, n_inserted, n_deleted)``.

    Plan shape: ONE full-outer hash join on the merge keys plus the
    rewrite's scan+write — the same cost profile as Delta/Iceberg
    copy-on-write MERGE. At 100 TB the join shuffles both sides on the
    keys once; with a partitioned target and dynamic partition
    overwrite, untouched partitions never rewrite. All counters ride
    the rewrite's own job via ``DataFrame.observe`` (a CollectMetrics
    node over the joined rows), so the join executes exactly once — not
    the four times (write + three counts) of a naive implementation.
    """
    target = spark.table(table)
    if set(source.columns) != set(target.columns):
        raise ValueError(
            f"MERGE source schema {sorted(source.columns)} != target {sorted(target.columns)}"
        )
    non_keys = [c for c in target.columns if c not in keys]
    # evaluate the delete marker against the RAW source row, before the
    # _src_ aliasing, so the condition reads naturally (CDC flag columns)
    src = source.withColumn(
        "_s_delete",
        F.coalesce(F.expr(delete_condition), F.lit(False))
        if delete_condition
        else F.lit(False),
    )
    t = target.withColumn("_t_present", F.lit(True))
    s = src.select(
        *keys,
        "_s_delete",
        *[F.col(c).alias(f"_src_{c}") for c in non_keys],
    ).withColumn("_s_present", F.lit(True))
    matched = F.col("_t_present") & F.col("_s_present")
    deleting = F.coalesce(F.col("_s_delete"), F.lit(False))
    obs = Observation()
    j = t.join(s, on=keys, how="full_outer").observe(
        obs,
        F.sum(F.when(matched & ~deleting, 1).otherwise(0)).alias("n_updated"),
        F.sum(
            F.when(
                F.col("_s_present") & F.col("_t_present").isNull() & ~deleting,
                1,
            ).otherwise(0)
        ).alias("n_inserted"),
        F.sum(F.when(matched & deleting, 1).otherwise(0)).alias("n_deleted"),
    )
    merged = (
        j.filter(~(F.col("_s_present").isNotNull() & deleting))
        .select(
            *keys,
            *[
                F.when(F.col("_s_present"), F.col(f"_src_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in non_keys
            ],
        )
        .select(*target.columns)  # restore declared column order
    )
    _rewrite(spark, table, merged)
    m = obs.get
    return _n(m["n_updated"]), _n(m["n_inserted"]), _n(m["n_deleted"])


def update_table(
    spark: SparkSession, table: str, assignments: dict[str, str], condition: str
) -> int:
    """``UPDATE table SET col = expr, ... WHERE condition`` via rewrite.

    ``assignments`` maps column name → SQL expression (evaluated against
    the pre-update row, per standard UPDATE semantics). Returns the
    number of rows updated, observed during the rewrite's single scan
    (no separate pre-count job).
    """
    df = spark.table(table)
    unknown = set(assignments) - set(df.columns)
    if unknown:
        raise ValueError(f"UPDATE of unknown column(s): {sorted(unknown)}")
    cond = F.expr(condition)
    obs = Observation()
    updated = df.observe(
        obs,
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 1).otherwise(0)
        ).alias("n_updated"),
    ).select(
        *[
            F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in df.columns
        ]
    )
    _rewrite(spark, table, updated)
    return _n(obs.get["n_updated"])
