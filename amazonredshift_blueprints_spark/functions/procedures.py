"""Stored procedures: ``CREATE [OR REPLACE] PROCEDURE`` / ``CALL`` /
``DROP PROCEDURE`` — the SQL-body subset.

Redshift shops keep operational logic in plpgsql procedures and submit
``CALL`` through exactly the pass-through the reference exposes
(``execute_sql.py:77`` hands any statement text to the warehouse).
This module covers the common case — a procedure whose body is a
sequence of SQL statements over named IN arguments — by registering
the body at CREATE time and replaying it through
:func:`..sqlrun.execute_sql_script` at CALL time, so every body
statement gets COPY/UNLOAD lowering, dialect translation, and
transaction routing exactly as if submitted alone.

Deliberate subset, refused honestly (``NotImplementedError``) rather
than silently mis-run:

- OUT / INOUT argument modes (no channel to return them through the
  statement face);
- procedural plpgsql — DECLARE'd variables, IF/LOOP/RAISE; one outer
  ``BEGIN ... END`` block wrapper is accepted (and stripped) because
  virtually every dumped procedure has it, but control flow inside is
  not a statement list and errors at CALL time statement-by-statement.

Argument substitution mirrors functions/prepared.py's quote-aware
single-pass rule: identifiers matching an arg name are replaced by
``CAST(<argtext> AS <type>)`` outside single-quoted literals only,
each original occurrence rewritten exactly once (substituted text is
never rescanned). Redshift's own pitfall — an argument named like a
referenced column shadows it — carries over and is documented here.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from .prepared import _spark_type, _split_args

# (session id, procedure name) -> (list[(argname, sparktype)], body sql)
_PROCEDURES: dict[tuple[int, str], tuple[list[tuple[str, str]], str]] = {}

_CREATE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?PROCEDURE\s+([\w.]+)\s*\(",
    re.IGNORECASE,
)
_CALL_RE = re.compile(
    r"^\s*CALL\s+([\w.]+)\s*\((.*)\)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+PROCEDURE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*(?:\([^)]*\))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_DOLLAR_TAG_RE = re.compile(r"\$\w*\$")
_BLOCK_RE = re.compile(
    # one outer plpgsql BEGIN...END wrapper; the lookahead keeps a
    # transaction-control `BEGIN;` body from matching as a block
    r"^\s*BEGIN\s*(?!;)(.*)\bEND\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PROCEDURAL_RE = re.compile(
    r"^\s*(DECLARE\b|IF\b|FOR\b|WHILE\b|LOOP\b|RAISE\b|RETURN\b|EXECUTE\b"
    r"|EXCEPTION\b)",
    re.IGNORECASE,
)


def _parse_args(arglist: str) -> list[tuple[str, str]]:
    """``name [IN|OUT|INOUT] type`` items → [(name, spark_type)];
    OUT/INOUT refuse (nothing to return them through)."""
    out: list[tuple[str, str]] = []
    for item in _split_args(arglist):
        if not item:
            continue
        parts = item.split()
        name = parts[0]
        rest = parts[1:]
        if rest and rest[0].upper() in ("IN", "OUT", "INOUT"):
            mode = rest[0].upper()
            if mode != "IN":
                raise NotImplementedError(
                    f"argument {name!r}: {mode} arguments need a result "
                    "channel the statement face does not have; only IN "
                    "arguments are supported"
                )
            rest = rest[1:]
        if not rest:
            raise ValueError(f"procedure argument {item!r} is missing a type")
        out.append((name.lower(), _spark_type(" ".join(rest))))
    return out


def _parse_create(query: str):
    """CREATE [OR REPLACE] PROCEDURE name(args) AS $tag$ body $tag$
    [LANGUAGE plpgsql] — paren-depth arg scan (types like varchar(20)
    contain parens), backreference-matched dollar tag."""
    m = _CREATE_HEAD_RE.match(query)
    if not m:
        return None
    replace = bool(m.group(1))
    name = m.group(2)
    i, depth, n = m.end(), 1, len(query)
    start = i
    while i < n and depth:
        if query[i] == "(":
            depth += 1
        elif query[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(f"unbalanced parentheses in {query[:80]!r}")
    arglist = query[start : i - 1]
    rest = query[i:]
    m2 = re.match(r"\s*AS\s+", rest, re.IGNORECASE)
    if not m2:
        raise ValueError(
            "CREATE PROCEDURE needs AS $$ ... $$ (SQL-body form); got "
            f"{rest[:60]!r}"
        )
    rest = rest[m2.end() :]
    mt = _DOLLAR_TAG_RE.match(rest)
    if not mt:
        raise NotImplementedError(
            "only dollar-quoted procedure bodies ($$...$$ / $tag$...$tag$) "
            "are supported"
        )
    tag = mt.group(0)
    end = rest.find(tag, mt.end())
    if end == -1:
        raise ValueError(f"unterminated {tag} block in CREATE PROCEDURE")
    body = rest[mt.end() : end]
    tail = rest[end + len(tag) :]
    if not re.match(
        r"\s*(LANGUAGE\s+plpgsql\s*)?;?\s*$", tail, re.IGNORECASE
    ):
        raise ValueError(
            f"unexpected text after procedure body: {tail[:60]!r}"
        )
    blk = _BLOCK_RE.match(body)
    if blk:
        body = blk.group(1)
    if _PROCEDURAL_RE.match(body):
        raise NotImplementedError(
            "procedural plpgsql (DECLARE/IF/LOOP/RAISE/...) is not "
            "supported; the SQL-body subset runs a statement list"
        )
    return replace, name, _parse_args(arglist), body.strip()


def create_procedure(
    spark: SparkSession,
    name: str,
    args: list[tuple[str, str]],
    body: str,
    *,
    replace: bool = False,
) -> None:
    key = (id(spark), name.lower())
    if not replace and key in _PROCEDURES:
        raise ValueError(
            f"procedure {name!r} already exists (use CREATE OR REPLACE)"
        )
    _PROCEDURES[key] = (args, body)


def substitute_call(spark: SparkSession, name: str, argtexts: list[str]) -> str:
    """Resolve CALL to the procedure body with named args substituted —
    quote-aware, single pass, word-boundary identifier match."""
    entry = _PROCEDURES.get((id(spark), name.lower()))
    if entry is None:
        raise ValueError(f"CALL of unknown procedure {name!r}")
    argspec, body = entry
    if len(argtexts) != len(argspec):
        raise ValueError(
            f"procedure {name!r} takes {len(argspec)} argument(s), got "
            f"{len(argtexts)}"
        )
    if not argspec:
        return body
    by_name = {
        aname: f"CAST({text} AS {atype})"
        for (aname, atype), text in zip(argspec, argtexts)
    }
    pat = re.compile(
        r"\b(" + "|".join(re.escape(a) for a in by_name) + r")\b",
        re.IGNORECASE,
    )
    parts = re.split(r"('(?:[^']|'')*')", body)  # odd indices = quoted
    return "".join(
        p
        if i % 2
        else pat.sub(lambda m: by_name[m.group(1).lower()], p)
        for i, p in enumerate(parts)
    )


def call_procedure(spark: SparkSession, name: str, argtexts: list[str]) -> int:
    """CALL: replay the substituted body through execute_sql_script
    (each statement gets the full dispatcher; a failure names the
    statement index). Returns the statement count."""
    from ..sqlrun import execute_sql_script

    return execute_sql_script(spark, substitute_call(spark, name, argtexts))


def drop_procedure(spark: SparkSession, name: str, *, if_exists: bool) -> None:
    if _PROCEDURES.pop((id(spark), name.lower()), None) is None and not if_exists:
        raise ValueError(f"DROP PROCEDURE of unknown procedure {name!r}")


def maybe_handle(spark: SparkSession, query: str) -> bool:
    """Statement-face dispatch; True when recognized and handled."""
    parsed = _parse_create(query)
    if parsed is not None:
        replace, name, argspec, body = parsed
        create_procedure(spark, name, argspec, body, replace=replace)
        return True
    m = _CALL_RE.match(query)
    if m:
        name, arglist = m.groups()
        call_procedure(
            spark, name, _split_args(arglist) if arglist.strip() else []
        )
        return True
    m = _DROP_RE.match(query)
    if m:
        drop_procedure(spark, m.group(2), if_exists=bool(m.group(1)))
        return True
    return False
