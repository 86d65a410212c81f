"""JDBC connectivity to a live Redshift (or any warehouse) endpoint.

Reference basis: ``create_connection_url`` builds a
``redshift+redshift_connector://`` SQLAlchemy URL from host/user/password/
db/port, default port 5439 (``upload_file.py:79-82``, duplicated at
``store_query_results.py:120-122`` and ``execute_sql.py:58-60``); the
tri-mode CLI auth (url / host+db+user / env var) is ``get_args``
(``upload_file.py:11-76``). The Spark-native equivalent is the JDBC data
source — no cursor management, and reads parallelize via
partitionColumn/numPartitions instead of the reference's single
server-side cursor.

Scale notes: a single-connection JDBC read is a 1-task scan; always pass
``partition_column``/``num_partitions`` (+ bounds) for real tables so the
read fans out. Predicate pushdown applies to JDBC sources (Catalyst sends
WHERE clauses through), column pruning too. Writes batch via
``batchsize``; for bulk loads into Redshift proper, staging to S3 + COPY
(the reference's own blueprint pattern) beats row-wise JDBC by orders of
magnitude — this module is the direct-connection path only.

The Redshift JDBC driver jar is not in this container, so everything here
is driver-agnostic option plumbing (unit-tested); ``.load()`` is the only
part that needs the jar at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_PORT = 5439  # upload_file.py:79 default


def redshift_jdbc_options(
    host: str,
    database: str,
    user: str,
    password: str,
    port: int = DEFAULT_PORT,
    **extra: str,
) -> dict[str, str]:
    """JDBC option map for a Redshift endpoint (reference URL parity)."""
    opts = {
        "url": f"jdbc:redshift://{host}:{port}/{database}",
        "user": user,
        "password": password,
        "driver": "com.amazon.redshift.jdbc42.Driver",
    }
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def jdbc_reader(
    spark: SparkSession,
    options: dict[str, str],
    *,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
):
    """Configured ``DataFrameReader`` for a JDBC table or pushdown query.

    Exactly one of ``table``/``query``. Partitioned reads need all four
    of partition_column/lower_bound/upper_bound/num_partitions.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    parts = [partition_column, lower_bound, upper_bound, num_partitions]
    if any(p is not None for p in parts) and any(p is None for p in parts):
        raise ValueError(
            "partitioned read needs partition_column, lower_bound, "
            "upper_bound and num_partitions together"
        )
    reader = spark.read.format("jdbc").options(**options)
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def jdbc_writer(
    df: DataFrame,
    options: dict[str, str],
    table: str,
    *,
    mode: str = "error",
    batchsize: int = 10_000,
):
    """Configured ``DataFrameWriter`` mirroring the reference's write modes.

    ``mode`` accepts the reference's ``fail``/``replace``/``append``
    vocabulary (``upload_file.py:44-52``) as well as Spark's native names;
    ``batchsize`` defaults to the reference's 10 000-row chunking
    (``upload_file.py:126``).
    """
    spark_mode = {"fail": "error", "replace": "overwrite", "append": "append"}.get(
        mode, mode
    )
    return (
        df.write.format("jdbc")
        .options(**options)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(spark_mode)
    )
