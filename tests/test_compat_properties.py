"""Property tests for the dialect shim (pure string functions, no JVM):
identity on SQL without dialect constructs, idempotence on rewritten
output, and no corruption of string literals."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from amazonredshift_blueprints_spark.functions.redshift_compat import (
    translate_redshift_sql,
)

_DIALECT_TOKENS = re.compile(
    r"\b(GETDATE|SYSDATE|LEN|CHARINDEX|STRTOL|CONVERT_TIMEZONE|TO_CHAR|"
    r"DATEDIFF|APPROXIMATE|QUALIFY|TOP)\b",
    re.IGNORECASE,
)

ident = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: not _DIALECT_TOKENS.search(s)
)


@st.composite
def plain_select(draw):
    cols = ", ".join(draw(st.lists(ident, min_size=1, max_size=4)))
    table = draw(ident)
    where = draw(st.sampled_from(["", " WHERE {} > 0"])).format(draw(ident))
    order = draw(st.sampled_from(["", " ORDER BY {}"])).format(draw(ident))
    return f"SELECT {cols} FROM {table}{where}{order}"


@given(plain_select())
@settings(max_examples=200, deadline=None)
def test_identity_without_dialect_constructs(sql):
    assert translate_redshift_sql(sql) == sql


@given(plain_select())
@settings(max_examples=100, deadline=None)
def test_dialect_words_inside_literals_untouched(sql):
    salted = sql.replace(
        "SELECT ", "SELECT 'use QUALIFY and DATEDIFF and TOP 5 here' AS lit, ", 1
    )
    out = translate_redshift_sql(salted)
    assert "'use QUALIFY and DATEDIFF and TOP 5 here'" in out


_DIALECT_EXAMPLES = [
    "SELECT TOP 10 a FROM t ORDER BY a",
    "SELECT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1",
    "SELECT DATEDIFF(day, a, b) FROM t",
    "SELECT DATEDIFF(hour, a, b), LEN(x), CHARINDEX('q', y) FROM t",
    "SELECT TO_CHAR(ts, 'YYYY-MM-DD'), GETDATE() FROM t",
    "SELECT APPROXIMATE COUNT(DISTINCT x) FROM t",
    "SELECT CONVERT_TIMEZONE('PST', ts) FROM t",
    "SELECT STRTOL(h, 16) FROM t",
]


def test_idempotent_on_rewritten_output():
    for sql in _DIALECT_EXAMPLES:
        once = translate_redshift_sql(sql)
        assert translate_redshift_sql(once) == once, sql
