"""Named-query catalog: the engine's declared capability surface.

``catalog.QUERIES`` maps query name → QuerySpec(spark_fn, oracle_sql).
``__spark_entry__`` at the repo root exposes this registry to the driver.
"""

from .catalog import QUERIES, QuerySpec  # noqa: F401
