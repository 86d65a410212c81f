"""Named-query catalog backing ``__spark_entry__.queries()``.

Each ``QuerySpec`` pairs a Spark DataFrame builder with the ANSI-SQL
oracle the driver runs in DuckDB (SURVEY.md §5.2).
"""

from .catalog import QUERIES, QuerySpec, query

__all__ = ["QUERIES", "QuerySpec", "query"]
