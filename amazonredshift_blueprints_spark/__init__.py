"""amazonredshift_blueprints_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of
``shipyardapp/amazonredshift-blueprints`` (reference at /root/reference),
re-expressed Spark-first:

- ``sources``   — file discovery + CSV/parquet scans (reference upload_file.py:85-126)
- ``operators`` — ingest / export / SQL pass-through parity ops, plus
  LLM-data-pipeline extensions (dedup, similarity, text analysis,
  sessionization, multimodal)
- ``functions`` — Redshift-dialect SQL shim and vector column helpers
- ``plans``     — the named-query catalog (each query paired with a DuckDB
  oracle) that backs ``__spark_entry__.queries()``
- ``streaming`` — Structured Streaming variants over the events table

Everything is DataFrame/Spark-SQL first: Catalyst plans the physical
execution (broadcast vs sort-merge joins, partial aggregation, predicate
pushdown); nothing here hand-schedules work or materializes data on the
driver.
"""

__version__ = "0.1.0"
