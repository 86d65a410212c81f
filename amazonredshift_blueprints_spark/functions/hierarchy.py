"""CONNECT BY hierarchical queries: the Redshift dialect form Spark SQL
lacks, lowered onto iterative frontier joins.

Reference basis: the reference passes user SQL through verbatim
(execute_sql.py:62-79), and Redshift accepts Oracle-style hierarchical
queries — ``SELECT ... FROM t [WHERE ...] START WITH <pred> CONNECT BY
PRIOR <key> = <parent>`` with the ``LEVEL`` pseudo-column. Spark SQL has
neither CONNECT BY nor (before 4.x flags) recursive CTEs, so this module
parses the restricted statement shape and lowers it:

- level 1 = rows matching START WITH;
- level k+1 = rows whose ``<parent>`` equals a level-k row's ``<key>``,
  one output row PER PATH (a node reachable via two parents appears
  twice — the Oracle/Redshift hierarchical semantics, which is why the
  frontier join keeps duplicates and never ``distinct``s);
- ``LEVEL`` is exposed as a regular ``level`` column, so select lists,
  WHERE (applied AFTER hierarchy construction, the Redshift rule) and
  ORDER BY referencing it run as plain Spark SQL over the result.

Cycles: Redshift errors when a hierarchy loops; here growth past
``max_levels`` raises naming the bound.

Scale (100 TB): each round is ONE equi-join of the new frontier against
the base relation. The frontier is broadcast while hierarchies are
dimension-sized (org charts, BOM graphs — the overwhelmingly common
case); pass ``broadcast_frontier=False`` for adversarially wide fan-out
and the join falls back to AQE's choice. The base relation is scanned
from cache each round, not re-read.

Equivalent ANSI form (what the DuckDB oracle runs): a recursive CTE
whose anchor is the START WITH filter and whose recursive arm joins on
``child.parent = prior.key`` carrying ``level + 1``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LEVEL_COL = "level"
_PRIOR_KEY = "_bp_prior_key"

_CONNECT_BY_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<table>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+START\s+WITH\s+(?P<start>.+?)"
    r"\s+CONNECT\s+BY\s+(?P<connect>.+?)"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.+?))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# PRIOR may sit on either side: PRIOR a = b  <=>  b = PRIOR a
_PRIOR_LEFT_RE = re.compile(
    r"^\s*PRIOR\s+([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*$", re.IGNORECASE
)
_PRIOR_RIGHT_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\s*=\s*PRIOR\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE
)


@dataclass
class ConnectBySpec:
    select: str
    table: str
    where: str | None
    start_with: str
    prior_col: str  # evaluated on the PARENT (prior) row
    child_col: str  # evaluated on the CHILD row
    order_by: str | None


def parse_connect_by(sql: str) -> ConnectBySpec | None:
    """Parse the restricted hierarchical-query shape; ``None`` when the
    statement has no CONNECT BY (caller falls through to ``spark.sql``).
    Present-but-malformed CONNECT BY raises rather than mis-running."""
    if re.search(r"\bCONNECT\s+BY\b", sql, re.IGNORECASE) is None:
        return None
    m = _CONNECT_BY_RE.match(sql)
    if m is None:
        raise ValueError(
            "CONNECT BY: expected the shape SELECT ... FROM <table> "
            "[WHERE ...] START WITH <pred> CONNECT BY PRIOR <key> = "
            "<parent> [ORDER BY ...] (START WITH before CONNECT BY; "
            "single table; no NOCYCLE)"
        )
    cond = m.group("connect")
    pm = _PRIOR_LEFT_RE.match(cond)
    if pm is not None:
        prior_col, child_col = pm.group(1), pm.group(2)
    else:
        pm = _PRIOR_RIGHT_RE.match(cond)
        if pm is None:
            raise ValueError(
                "CONNECT BY condition must be PRIOR <col> = <col> or "
                f"<col> = PRIOR <col>, got: {cond.strip()!r}"
            )
        child_col, prior_col = pm.group(1), pm.group(2)
    return ConnectBySpec(
        select=m.group("select").strip(),
        table=m.group("table"),
        where=(m.group("where") or "").strip() or None,
        start_with=m.group("start").strip(),
        prior_col=prior_col,
        child_col=child_col,
        order_by=(m.group("order") or "").strip() or None,
    )


def connect_by_frame(
    base: DataFrame,
    prior_col: str,
    child_col: str,
    start_with: str,
    *,
    max_levels: int = 64,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Expand the hierarchy: all base columns plus 1-based ``level``,
    one row per PATH from a START WITH root. See the module docstring
    for semantics and the scale notes."""
    b = base.persist()
    frontier = b.filter(F.expr(start_with)).withColumn(
        _LEVEL_COL, F.lit(1).cast("long")
    ).persist()
    acc = frontier
    spent = [frontier]
    n = frontier.count()
    lvl = 1
    while n > 0:
        lvl += 1
        if lvl > max_levels:
            for c in spent:
                c.unpersist()
            b.unpersist()
            raise ValueError(
                f"CONNECT BY exceeded {max_levels} levels — hierarchy "
                "loop (Redshift errors on cycles) or raise max_levels"
            )
        parents = frontier.select(F.col(prior_col).alias(_PRIOR_KEY))
        if broadcast_frontier:
            parents = F.broadcast(parents)
        nxt = (
            b.join(parents, on=b[child_col] == F.col(_PRIOR_KEY))
            .drop(_PRIOR_KEY)
            .withColumn(_LEVEL_COL, F.lit(lvl).cast("long"))
        ).persist()
        n = nxt.count()
        spent.append(nxt)
        acc = acc.unionAll(nxt)
        frontier = nxt
    out = acc.persist()
    out.count()  # materialize before the per-level caches release
    for c in spent:
        c.unpersist()
    b.unpersist()
    out._bp_cache_owner = out
    return out


def run_connect_by(
    spark: SparkSession,
    sql: str,
    *,
    max_levels: int = 64,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Run a hierarchical query end-to-end: parse, expand, then apply
    the select list / WHERE / ORDER BY as plain Spark SQL over the
    expanded relation (so ``LEVEL`` references just work)."""
    spec = parse_connect_by(sql)
    if spec is None:
        raise ValueError("not a CONNECT BY statement")
    hier = connect_by_frame(
        spark.table(spec.table),
        spec.prior_col,
        spec.child_col,
        spec.start_with,
        max_levels=max_levels,
        broadcast_frontier=broadcast_frontier,
    )
    view = "__bp_connect_by_result"
    hier.createOrReplaceTempView(view)
    parts = [f"SELECT {spec.select} FROM {view}"]
    if spec.where:
        # Redshift applies WHERE after hierarchy construction (rows are
        # filtered; subtrees are NOT pruned) — post-filtering matches
        parts.append(f"WHERE {spec.where}")
    if spec.order_by:
        parts.append(f"ORDER BY {spec.order_by}")
    result = spark.sql(" ".join(parts))
    result._bp_cache_owner = getattr(hier, "_bp_cache_owner", None)
    return result
