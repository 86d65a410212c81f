"""SparkSession factory + catalog registration.

The reference resolves a connection/catalog from host/port/database args
(upload_file.py:79-82, execute_sql.py:58-60); here the "catalog" is the
Spark session catalog with one temp view per fixture parquet table.

Scale notes (100 TB design):
- AQE on: runtime join-strategy re-planning, skew-join splitting, and
  partition coalescing replace any hand-tuned shuffle counts.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE ceiling; AQE
  coalesces small post-shuffle partitions automatically.
- Timezone pinned to UTC so timestamp semantics match the DuckDB oracle
  and are cluster-location independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "amazonredshift-blueprints-spark") -> SparkSession:
    """Build (or reuse) a local SparkSession with scale-oriented defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def configure_runtime(spark: SparkSession) -> None:
    """Pin runtime confs we rely on, even on a session we didn't build.

    The driver harness constructs its own SparkSession; queries() entries
    must behave identically there, so set the runtime-settable confs here.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass  # static conf on some builds; defaults are fine


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture parquet table as a temp view; return the dfs.

    Mirrors the reference's catalog resolution (a Redshift schema of named
    tables) onto the Spark session catalog. Parquet scans get predicate
    pushdown + column pruning from Catalyst for free.
    """
    configure_runtime(spark)
    dfs: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
