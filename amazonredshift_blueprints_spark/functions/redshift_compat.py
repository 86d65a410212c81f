"""Redshift → Spark SQL dialect translation (string-level shim).

Reference basis: the two SQL pass-through sites
(``store_query_results.py:132→103``, ``execute_sql.py:64→77``) accept any
Redshift SQL. Spark SQL is near-identical; the known deltas we shim:

- ``DATEDIFF(unit, start, end)`` (Redshift arg order, boundary-crossing
  semantics) vs Spark ``datediff(end, start)`` (days only).
- ``GETDATE()`` → ``current_timestamp()``.

Everything else (NVL, SPLIT_PART, ILIKE, APPROXIMATE COUNT(DISTINCT) →
approx_count_distinct, ...) either exists in Spark under the same name or
is translated here.

The shim is regex-based and intentionally conservative: it only rewrites
call sites it fully parses; anything else passes through untouched so
valid Spark SQL is never corrupted.
"""

from __future__ import annotations

import re

# Redshift DATEDIFF counts *boundary crossings* of the unit, not elapsed
# intervals. For each unit, a Spark expression with identical semantics.
_DATEDIFF_TEMPLATES = {
    "day": "datediff(CAST(({end}) AS DATE), CAST(({start}) AS DATE))",
    "week": "CAST(floor(datediff(CAST(({end}) AS DATE), CAST(({start}) AS DATE)) / 7) AS INT)",
    "month": "((year({end}) * 12 + month({end})) - (year({start}) * 12 + month({start})))",
    "quarter": "((year({end}) * 4 + quarter({end})) - (year({start}) * 4 + quarter({start})))",
    "year": "(year({end}) - year({start}))",
    "hour": "CAST((unix_timestamp(date_trunc('hour', {end})) - unix_timestamp(date_trunc('hour', {start}))) / 3600 AS BIGINT)",
    "minute": "CAST((unix_timestamp(date_trunc('minute', {end})) - unix_timestamp(date_trunc('minute', {start}))) / 60 AS BIGINT)",
    "second": "CAST(unix_timestamp(date_trunc('second', {end})) - unix_timestamp(date_trunc('second', {start})) AS BIGINT)",
}

_UNIT_ALIASES = {
    "d": "day", "days": "day",
    "w": "week", "weeks": "week",
    "mon": "month", "mons": "month", "months": "month",
    "qtr": "quarter", "quarters": "quarter",
    "y": "year", "yr": "year", "yrs": "year", "years": "year",
    "h": "hour", "hr": "hour", "hrs": "hour", "hours": "hour",
    "m": "minute", "min": "minute", "mins": "minute", "minutes": "minute",
    "s": "second", "sec": "second", "secs": "second", "seconds": "second",
}


def _split_two_args(body: str) -> tuple[str, str] | None:
    """Split ``a, b`` at the top-level comma (paren- and quote-aware)."""
    depth = 0
    in_str: str | None = None
    for i, ch in enumerate(body):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            return body[:i].strip(), body[i + 1 :].strip()
    return None


def _inside_string(sql: str, pos: int) -> bool:
    """True if ``pos`` falls inside a single- or double-quoted literal."""
    in_str: str | None = None
    for i in range(pos):
        ch = sql[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
    return in_str is not None


def _find_call(sql: str, func: str, start: int = 0) -> tuple[int, int, str] | None:
    """Locate ``func( ... )`` returning (start, end, inner) with balanced parens."""
    pat = re.compile(rf"\b{func}\s*\(", re.IGNORECASE)
    m = pat.search(sql, start)
    while m and _inside_string(sql, m.start()):
        m = pat.search(sql, m.end())
    if not m:
        return None
    depth = 1
    i = m.end()
    in_str: str | None = None
    while i < len(sql) and depth:
        ch = sql[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    if depth:
        return None
    return m.start(), i, sql[m.end() : i - 1]


def translate_redshift_sql(sql: str) -> str:
    """Rewrite Redshift-dialect call sites into Spark SQL equivalents."""
    # GETDATE() / SYSDATE → current_timestamp()
    sql = re.sub(r"\bGETDATE\s*\(\s*\)", "current_timestamp()", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bSYSDATE\b", "current_timestamp()", sql, flags=re.IGNORECASE)
    # APPROXIMATE COUNT(DISTINCT x) → approx_count_distinct(x)
    sql = re.sub(
        r"\bAPPROXIMATE\s+COUNT\s*\(\s*DISTINCT\s+(.*?)\)",
        r"approx_count_distinct(\1)",
        sql,
        flags=re.IGNORECASE,
    )

    # DATEDIFF(unit, start, end) → unit-specific Spark expression.
    out = sql
    pos = 0
    while True:
        hit = _find_call(out, "DATEDIFF", pos)
        if hit is None:
            break
        s, e, inner = hit
        first = _split_two_args(inner)
        if first is None:
            pos = e
            continue
        unit_raw, rest = first
        unit = _UNIT_ALIASES.get(unit_raw.strip("'\" ").lower(), unit_raw.strip("'\" ").lower())
        second = _split_two_args(rest)
        if unit not in _DATEDIFF_TEMPLATES or second is None:
            pos = e  # two-arg Spark datediff or unknown unit: leave as-is
            continue
        start_expr, end_expr = second
        repl = _DATEDIFF_TEMPLATES[unit].format(start=start_expr, end=end_expr)
        out = out[:s] + repl + out[e:]
        pos = s + len(repl)
    return out
