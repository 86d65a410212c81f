"""PREPARE/EXECUTE and DECLARE CURSOR/FETCH statement families.

Reference basis: both families are plain Redshift statements that reach
the reference verbatim through its pass-through site (execute_sql.py:77)
— PREPARE/EXECUTE/DEALLOCATE for parameterized reuse, DECLARE ... CURSOR
FOR / FETCH / CLOSE for paged result consumption (the cursor dance
Redshift drivers run under the hood for big result sets; the reference's
own chunked fetch at store_query_results.py:103 is the pandas face of
the same pattern).

Spark-first lowering:
- A prepared statement is a session-scoped (name → (param types, SQL
  text)) registry entry; EXECUTE substitutes ``$n`` placeholders with
  the call's literal arguments — wrapped in ``CAST(arg AS type)`` when
  the PREPARE declared types, so coercion happens in the engine with
  engine semantics, not in Python — and runs the result through the
  normal statement dispatch.
- A cursor is a session-scoped (name → (SQL text, offset)) entry;
  FETCH n runs the query with ``OFFSET current LIMIT n`` (Spark's
  native offset/limit — no driver-side buffering of the full result)
  and advances the offset by the rows actually returned. Paging is
  deterministic only when the cursor's query is totally ORDERED —
  same contract as any SQL engine's cursor over an unordered query;
  documented, not hidden.

Registries key on ``id(spark)`` (the transactions.py convention):
prepared statements and cursors are session state, dropped with the
session. At 100 TB a FETCH page is one Spark job whose scan is bounded
by offset+limit pushdown; the cursor never materializes on the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_PREPARED: dict[tuple[int, str], tuple[list[str], str]] = {}
_CURSORS: dict[tuple[int, str], dict] = {}

_PREPARE_RE = re.compile(
    r"^\s*PREPARE\s+(\w+)\s*(?:\(([^)]*)\))?\s+AS\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXECUTE_RE = re.compile(
    r"^\s*EXECUTE\s+(\w+)\s*(?:\((.*)\))?\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
_DEALLOCATE_RE = re.compile(
    r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?(\w+)\s*;?\s*$", re.IGNORECASE
)
_DECLARE_RE = re.compile(
    r"^\s*DECLARE\s+(\w+)\s+CURSOR\s+(?:WITHOUT\s+HOLD\s+)?FOR\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_FETCH_RE = re.compile(
    r"^\s*FETCH\s+(?:FORWARD\s+)?(ALL|\d+)\s+(?:FROM|IN)\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
_CLOSE_RE = re.compile(r"^\s*CLOSE\s+(\w+)\s*;?\s*$", re.IGNORECASE)

# Redshift parameter-type spellings → Spark CAST targets. Spark rejects
# length-less VARCHAR in CAST, so the string family maps to STRING.
_TYPE_MAP = {
    "varchar": "string",
    "char": "string",
    "text": "string",
    "bpchar": "string",
    "int2": "smallint",
    "int4": "int",
    "integer": "int",
    "int": "int",
    "int8": "bigint",
    "bigint": "bigint",
    "float4": "float",
    "real": "float",
    "float8": "double",
    "double precision": "double",
    "numeric": "decimal(18,2)",
    "bool": "boolean",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
}


def _spark_type(t: str) -> str:
    t = re.sub(r"\(.*\)", "", t).strip().lower()
    return _TYPE_MAP.get(t, t)


def _split_args(arglist: str) -> list[str]:
    """Split EXECUTE's argument list on top-level commas, honoring
    single-quoted literals (with ``''`` doubling) and parentheses."""
    out, buf, depth, i, n = [], [], 0, 0, len(arglist)
    while i < n:
        ch = arglist[i]
        if ch == "'":
            buf.append(ch)
            i += 1
            while i < n:
                buf.append(arglist[i])
                if arglist[i] == "'":
                    if i + 1 < n and arglist[i + 1] == "'":
                        buf.append(arglist[i + 1])
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


def prepare_statement(
    spark: SparkSession, name: str, types: list[str], sql: str
) -> None:
    _PREPARED[(id(spark), name.lower())] = (types, sql)


def substitute_prepared(spark: SparkSession, name: str, args: list[str]) -> str:
    """Resolve an EXECUTE call to its substituted SQL text."""
    entry = _PREPARED.get((id(spark), name.lower()))
    if entry is None:
        raise ValueError(f"EXECUTE of unknown prepared statement {name!r}")
    types, sql = entry
    if types and len(args) != len(types):
        raise ValueError(
            f"prepared statement {name!r} takes {len(types)} argument(s), "
            f"got {len(args)}"
        )
    # substitute $10 before $1: longest placeholder index first
    for idx in sorted(range(1, len(args) + 1), reverse=True):
        arg = args[idx - 1]
        repl = (
            f"CAST({arg} AS {_spark_type(types[idx - 1])})" if types else arg
        )
        sql = sql.replace(f"${idx}", repl)
    return sql


def execute_prepared(
    spark: SparkSession, name: str, args: list[str]
) -> DataFrame:
    """EXECUTE returning the result DataFrame (the API face; the
    statement face in execute_sql runs it through the noop sink)."""
    from ..functions import translate_redshift_sql

    return spark.sql(translate_redshift_sql(substitute_prepared(spark, name, args)))


def declare_cursor(spark: SparkSession, name: str, select_sql: str) -> None:
    key = (id(spark), name.lower())
    if key in _CURSORS:
        raise ValueError(f"cursor {name!r} already open (CLOSE it first)")
    _CURSORS[key] = {"sql": select_sql, "offset": 0}


def fetch_cursor(spark: SparkSession, name: str, count: int | None) -> DataFrame:
    """FETCH the next ``count`` rows (None = ALL remaining) and advance
    the cursor by the rows actually returned."""
    from ..functions import translate_redshift_sql

    cur = _CURSORS.get((id(spark), name.lower()))
    if cur is None:
        raise ValueError(f"FETCH from unknown/closed cursor {name!r}")
    base = spark.sql(translate_redshift_sql(cur["sql"])).offset(cur["offset"])
    page = base if count is None else base.limit(count)
    cur["offset"] += page.count()
    return page


def close_cursor(spark: SparkSession, name: str) -> None:
    if _CURSORS.pop((id(spark), name.lower()), None) is None:
        raise ValueError(f"CLOSE of unknown cursor {name!r}")


def maybe_handle(spark: SparkSession, query: str) -> bool:
    """Statement-face dispatch for both families; returns True when the
    statement was recognized and handled. EXECUTE and FETCH force full
    execution through the noop sink (reference parity: side effects and
    errors surface, no rows land on the driver)."""
    m = _PREPARE_RE.match(query)
    if m:
        name, typelist, sql = m.groups()
        types = (
            [t.strip() for t in typelist.split(",") if t.strip()]
            if typelist
            else []
        )
        prepare_statement(spark, name, types, sql)
        return True
    m = _EXECUTE_RE.match(query)
    if m:
        name, arglist = m.groups()
        args = _split_args(arglist) if arglist else []
        from ..sqlrun import execute_sql

        execute_sql(spark, substitute_prepared(spark, name, args))
        return True
    m = _DEALLOCATE_RE.match(query)
    if m:
        if _PREPARED.pop((id(spark), m.group(1).lower()), None) is None:
            raise ValueError(
                f"DEALLOCATE of unknown prepared statement {m.group(1)!r}"
            )
        return True
    m = _DECLARE_RE.match(query)
    if m:
        declare_cursor(spark, m.group(1), m.group(2))
        return True
    m = _FETCH_RE.match(query)
    if m:
        count = None if m.group(1).upper() == "ALL" else int(m.group(1))
        page = fetch_cursor(spark, m.group(2), count)
        page.write.format("noop").mode("overwrite").save()
        return True
    m = _CLOSE_RE.match(query)
    if m:
        close_cursor(spark, m.group(1))
        return True
    return False
