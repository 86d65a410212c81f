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

Control flow — ``IF cond THEN ... [ELSIF cond THEN ...] [ELSE ...]
END IF;`` and ``WHILE cond LOOP ... END LOOP;`` — IS supported
(r12 verdict item 3): bodies are parsed into a statement tree at
CREATE time (quote/comment-aware, CASE-aware condition scanning) and
the tree is executed at CALL time, each leaf statement through the
full dispatcher. Conditions are SQL boolean expressions over the
substituted arguments (scalar subqueries allowed — the plpgsql form
without variables); they evaluate through ``spark.sql`` after dialect
translation, so inside an open transaction they see staged writes via
the transaction's read-your-writes views. A NULL condition is false,
the plpgsql rule. WHILE is capped at ``_MAX_LOOP_ITERATIONS`` — loop
progress must come from table state, and a condition that never
changes would otherwise spin forever.

Deliberate subset, refused honestly (``NotImplementedError``) rather
than silently mis-run:

- OUT / INOUT argument modes (no channel to return them through the
  statement face);
- procedural plpgsql beyond IF/WHILE — DECLARE'd variables (incl.
  cursors), FOR, RAISE, RETURN, dynamic EXECUTE, EXCEPTION blocks;
  one outer ``BEGIN ... END`` block wrapper is accepted (and
  stripped) because virtually every dumped procedure has it. These
  refuse at CREATE time, where the parser sees the statement starts.

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
# plpgsql statement starters outside the supported subset — refused at
# CREATE time with the reason. EXECUTE here is plpgsql *dynamic SQL*
# (EXECUTE 'string'), not the SQL-face EXECUTE of a prepared statement;
# inside a procedure body the plpgsql reading applies, so it refuses.
_UNSUPPORTED_STARTERS = {
    "DECLARE": "DECLARE'd variables have no storage in the statement face",
    "FOR": "FOR loops need a loop variable (DECLARE support)",
    "LOOP": "bare LOOP has no exit condition without EXIT support",
    "RAISE": "RAISE needs a notice/exception channel",
    "RETURN": "procedures here have no return channel",
    "EXECUTE": "plpgsql EXECUTE is dynamic SQL over variables",
    "EXCEPTION": "EXCEPTION blocks need savepoint semantics",
}

#: hard cap on WHILE iterations — loop progress must come from table
#: state; a condition that never changes would otherwise spin forever.
_MAX_LOOP_ITERATIONS = 10_000

_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")


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


def _skip_ws_comments(text: str, i: int) -> int:
    """Advance past whitespace and ``--`` line comments."""
    n = len(text)
    while i < n:
        if text[i].isspace():
            i += 1
        elif text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
        else:
            break
    return i


def _skip_quoted(text: str, i: int) -> int:
    """``text[i]`` opens a ``'``/``"`` literal: return the index just
    past its close (doubled-quote escape aware)."""
    q, n = text[i], len(text)
    i += 1
    while i < n:
        if text[i] == q:
            if i + 1 < n and text[i + 1] == q:
                i += 2
                continue
            return i + 1
        i += 1
    return n  # unterminated: consume to end; Spark will error on the text


def _peek_word(text: str, i: int) -> tuple[str | None, int]:
    """Next word (uppercased) at/after ``i``, skipping whitespace and
    comments; (None, i) when the next token is not a word."""
    i = _skip_ws_comments(text, i)
    m = _WORD_RE.match(text, i)
    if not m:
        return None, i
    return m.group(0).upper(), m.end()


def _scan_expr_until(text: str, i: int, stops: frozenset[str]) -> tuple[str, str, int]:
    """Consume an SQL expression from ``i`` until one of the ``stops``
    keywords appears OUTSIDE quotes/comments at CASE-depth 0 (``CASE
    WHEN x THEN ...`` inside an IF condition must not end the
    condition at its own THEN/ELSE/END). Returns
    (expression text, stopword, index past the stopword)."""
    n = len(text)
    depth = 0  # CASE ... END nesting
    start = i
    while i < n:
        ch = text[i]
        if ch in "'\"":
            i = _skip_quoted(text, i)
            continue
        if text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
            continue
        m = _WORD_RE.match(text, i)
        if m:
            w = m.group(0).upper()
            if w == "CASE":
                depth += 1
            elif depth and w == "END":
                depth -= 1
            elif not depth and w in stops:
                return text[start : i].strip(), w, m.end()
            i = m.end()
            continue
        i += 1
    raise ValueError(
        f"expected one of {sorted(stops)} after {text[start:start + 60]!r} "
        "in procedure body"
    )


def _consume_statement(text: str, i: int) -> tuple[str, int]:
    """Consume one plain SQL statement up to its top-level ``;``
    (quote/comment-aware); the ``;`` is consumed but not included."""
    n = len(text)
    start = i
    while i < n:
        ch = text[i]
        if ch in "'\"":
            i = _skip_quoted(text, i)
            continue
        if text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
            continue
        if ch == ";":
            return text[start:i].strip(), i + 1
        i += 1
    return text[start:n].strip(), n  # final statement may omit its ';'


def _parse_block(
    text: str, i: int, stops: frozenset[str]
) -> tuple[list, str | None, int]:
    """Parse a statement list until end-of-text or a ``stops`` keyword
    at statement position. Nodes: ``("sql", stmt)``,
    ``("if", [(cond, items), ...], else_items | None)``,
    ``("while", cond, items)``. Returns (items, stopword|None, index
    past the stopword)."""
    items: list = []
    n = len(text)
    while True:
        i = _skip_ws_comments(text, i)
        if i >= n:
            if stops:
                raise ValueError(
                    f"procedure body ended before {sorted(stops)}"
                )
            return items, None, i
        word, j = _peek_word(text, i)
        if word in stops:
            return items, word, j
        if word in _UNSUPPORTED_STARTERS:
            raise NotImplementedError(
                f"procedural plpgsql {word} is not supported "
                f"({_UNSUPPORTED_STARTERS[word]}); the subset is a "
                "statement list plus IF/WHILE"
            )
        if word == "IF":
            branches: list[tuple[str, list]] = []
            else_items: list | None = None
            k = j
            while True:
                cond, _, k = _scan_expr_until(text, k, frozenset({"THEN"}))
                blk, stop, k = _parse_block(
                    text, k, frozenset({"ELSIF", "ELSE", "END"})
                )
                branches.append((cond, blk))
                if stop != "ELSIF":
                    break
            if stop == "ELSE":
                else_items, stop, k = _parse_block(text, k, frozenset({"END"}))
            w2, k = _peek_word(text, k)
            if w2 != "IF":
                raise ValueError("IF block must close with END IF")
            k = _skip_ws_comments(text, k)
            if k < n and text[k] == ";":
                k += 1
            items.append(("if", branches, else_items))
            i = k
            continue
        if word == "WHILE":
            cond, _, k = _scan_expr_until(text, j, frozenset({"LOOP"}))
            blk, _, k = _parse_block(text, k, frozenset({"END"}))
            w2, k = _peek_word(text, k)
            if w2 != "LOOP":
                raise ValueError("WHILE block must close with END LOOP")
            k = _skip_ws_comments(text, k)
            if k < n and text[k] == ";":
                k += 1
            items.append(("while", cond, blk))
            i = k
            continue
        stmt, i = _consume_statement(text, i)
        if stmt:
            items.append(("sql", stmt))


def _parse_body(text: str) -> list:
    items, _, _ = _parse_block(text, 0, frozenset())
    return items


def _has_control_flow(items: list) -> bool:
    return any(node[0] != "sql" for node in items)


def _eval_condition(spark: SparkSession, cond: str) -> bool:
    """Evaluate an IF/WHILE condition as a SQL boolean expression —
    dialect-translated, scalar subqueries allowed, NULL is false (the
    plpgsql rule). The collect is a single 1-row boolean."""
    from . import translate_redshift_sql

    rows = spark.sql(
        translate_redshift_sql(f"SELECT CAST(({cond}) AS BOOLEAN) AS b")
    ).collect()
    return bool(rows[0][0])


def _exec_items(spark: SparkSession, items: list) -> int:
    """Execute a parsed statement tree; returns leaf statements run.
    Each leaf goes through :func:`..sqlrun.execute_sql`, so it gets
    COPY/UNLOAD lowering, dialect translation, and transaction
    routing exactly like a standalone statement."""
    from ..sqlrun import execute_sql

    n = 0
    for node in items:
        if node[0] == "sql":
            execute_sql(spark, node[1])
            n += 1
        elif node[0] == "if":
            _, branches, else_items = node
            for cond, blk in branches:
                if _eval_condition(spark, cond):
                    n += _exec_items(spark, blk)
                    break
            else:
                if else_items is not None:
                    n += _exec_items(spark, else_items)
        else:  # while
            _, cond, blk = node
            iters = 0
            while _eval_condition(spark, cond):
                iters += 1
                if iters > _MAX_LOOP_ITERATIONS:
                    raise RuntimeError(
                        f"WHILE loop exceeded {_MAX_LOOP_ITERATIONS} "
                        f"iterations (condition {cond[:80]!r} never went "
                        "false — loop progress must come from table state)"
                    )
                n += _exec_items(spark, blk)
    return n


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
    _parse_body(body)  # CREATE-time validation: refuses DECLARE/FOR/
    # RAISE/... with the reason; raises on unbalanced IF/WHILE blocks
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
    """CALL: replay the substituted body. Straight-line bodies go
    through execute_sql_script unchanged (a failure names the statement
    index); bodies with IF/WHILE execute their parsed tree, with the
    same no-dangling-transaction guarantee — a transaction OPENED BY
    THIS CALL is rolled back when a statement fails. Returns the count
    of leaf statements actually executed."""
    from .. import transactions
    from ..sqlrun import execute_sql_script

    body = substitute_call(spark, name, argtexts)
    items = _parse_body(body)
    if not _has_control_flow(items):
        return execute_sql_script(spark, body)
    entered_with = transactions.active(spark)
    try:
        return _exec_items(spark, items)
    except Exception as e:
        txn = transactions.active(spark)
        rolled = ""
        if txn is not None and txn is not entered_with:
            txn.rollback()
            rolled = " (open transaction rolled back)"
        raise RuntimeError(
            f"procedure {name!r} failed{rolled}: {e}"
        ) from e


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
