"""Per-SparkSession mutable state, keyed on the SESSION OBJECT via
weakref.

The repo's session-scoped registries (prepared statements, cursors,
stored procedures, the active transaction, query-history logs) used to
key on ``id(spark)``. Two defects with that (r12 advisor, found on the
system-table logs and applied uniformly in r13): the entry outlives
its session — never reclaimed for the life of the process — and a
garbage-collected session's recycled ``id()`` can leak one session's
state into a brand-new session (a prepared statement or open
transaction appearing out of nowhere). A ``WeakKeyDictionary`` keyed
on the session object fixes both: lookups are identity-based while the
session lives, and the whole namespace dies with it.
"""

from __future__ import annotations

import weakref

from pyspark.sql import SparkSession

_STATE: weakref.WeakKeyDictionary[SparkSession, dict] = (
    weakref.WeakKeyDictionary()
)


def session_state(spark: SparkSession, namespace: str) -> dict:
    """The mutable dict for ``namespace`` scoped to this session —
    created on first use, garbage-collected with the session."""
    return _STATE.setdefault(spark, {}).setdefault(namespace, {})
