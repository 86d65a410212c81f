"""PySpark-native analytics engine with the capabilities of
shipyardapp/amazonredshift-blueprints (reference read-only at
/root/reference), rebuilt Spark-first per SURVEY.md.

Layout:
- ``session``   — SparkSession factory + fixture catalog registration.
- ``ingest``    — CSV → table loads (reference upload_file.py parity).
- ``export``    — query → CSV (reference store_query_results.py parity).
- ``sqlrun``    — SQL statement pass-through (reference execute_sql.py parity).
- ``dml``       — DELETE/UPDATE/MERGE as copy-on-write rewrites.
- ``sources``   — JDBC connectivity (Redshift URL parity, partitioned reads).
- ``functions`` — Redshift-dialect compatibility shims.
- ``plans``     — named-query catalog (QuerySpec registry) driving
  ``__spark_entry__.queries()`` / ``oracle_sql()``.
- ``operators`` — LLM-data-pipeline extensions: dedup, similarity search,
  text analysis, sessionization, multimodal column plumbing.
- ``streaming`` — Structured Streaming variants (events sessionization).
"""

from .session import configure_runtime, get_spark, load_table, load_tables, register_tables

__all__ = [
    "configure_runtime",
    "get_spark",
    "load_table",
    "load_tables",
    "register_tables",
]
