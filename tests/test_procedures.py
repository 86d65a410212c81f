"""Stored-procedure face (functions/procedures.py): CREATE/CALL/DROP
lifecycle, named-argument substitution rules, and the honest refusals
of the out-of-subset forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from amazonredshift_blueprints_spark.functions import procedures
from amazonredshift_blueprints_spark.functions.procedures import (
    _parse_body,
    _parse_create,
    create_procedure,
    substitute_call,
)
from amazonredshift_blueprints_spark.sqlrun import (
    execute_sql,
    execute_sql_script,
)


def test_parse_create_handles_typed_args_and_tagged_body():
    replace, name, args, declares, body = _parse_create(
        "CREATE OR REPLACE PROCEDURE sp.upd(f1 int, f2 varchar(20))\n"
        "AS $body$ UPDATE t SET a = f1 WHERE b = f2; $body$ "
        "LANGUAGE plpgsql;"
    )
    assert replace and name == "sp.upd"
    assert args == [("f1", "int", "IN"), ("f2", "string", "IN")]
    assert declares == []
    assert body == "UPDATE t SET a = f1 WHERE b = f2;"


def test_parse_create_strips_block_but_not_transaction_begin():
    # plpgsql BEGIN...END block wrapper: stripped
    _, _, _, _, body = _parse_create(
        "CREATE PROCEDURE p() AS $$ BEGIN SELECT 1; SELECT 2; END; $$"
    )
    assert body == "SELECT 1; SELECT 2;"
    # transaction-control `BEGIN;` is a statement, not a block
    _, _, _, _, body = _parse_create(
        "CREATE PROCEDURE p() AS $$ BEGIN; SELECT 1; COMMIT; $$"
    )
    assert body.startswith("BEGIN;")


def test_parse_create_declare_header():
    """A DECLARE header parses into (name, spark type, default) specs;
    cursor/record/constant declarations refuse; a variable shadowing
    an argument refuses (the substitution collision would be silent)."""
    _, _, _, declares, body = _parse_create(
        "CREATE PROCEDURE p(k int) AS $$ DECLARE v_total bigint := 0; "
        "v_msg varchar(20); BEGIN SELECT 1; END; $$"
    )
    assert declares == [
        ("v_total", "bigint", "0"), ("v_msg", "string", None)
    ]
    assert body == "SELECT 1;"
    # bound cursors now parse (r14): (name, "CURSOR", query)
    _, _, _, declares, _ = _parse_create(
        "CREATE PROCEDURE p() AS $$ DECLARE c CURSOR FOR SELECT 1; "
        "BEGIN OPEN c; END; $$"
    )
    assert declares == [("c", "CURSOR", "SELECT 1")]
    # RECORD declarations parse since r14
    _, _, _, declares, _ = _parse_create(
        "CREATE PROCEDURE p() AS $$ DECLARE r RECORD; "
        "BEGIN SELECT 1 AS x INTO r; END; $$"
    )
    assert declares == [("r", "RECORD", None)]
    # CONSTANT parses since r14 (type carries the constness marker)
    _, _, _, declares, _ = _parse_create(
        "CREATE PROCEDURE p() AS $$ DECLARE k CONSTANT int := 1; "
        "BEGIN SELECT k; END; $$"
    )
    assert declares == [("k", "CONSTANT int", "1")]
    # ALIAS resolves by textual rewrite since r14; the alias name is
    # gone from the returned declares and references are rewritten
    _, _, _, declares, body = _parse_create(
        "CREATE PROCEDURE p(k int) AS $$ DECLARE a ALIAS FOR $1; "
        "BEGIN SELECT a; END; $$"
    )
    assert declares == [] and body == "SELECT k;"
    with pytest.raises(ValueError, match="unknown name"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ DECLARE a ALIAS FOR x; "
            "BEGIN SELECT 1; END; $$"
        )
    with pytest.raises(ValueError, match="shadow"):
        _parse_create(
            "CREATE PROCEDURE p(v int) AS $$ DECLARE v int; BEGIN "
            "SELECT 1; END; $$"
        )
    with pytest.raises(ValueError, match="undeclared"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ BEGIN x := 1; END; $$"
        )


def test_parse_create_refusals():
    # OUT/INOUT now parse with their mode (r14)
    _, _, args, _, _ = _parse_create(
        "CREATE PROCEDURE p(x INOUT int, y OUT bigint) AS $$ BEGIN "
        "x := x + 1; y := 2; END; $$"
    )
    assert args == [("x", "int", "INOUT"), ("y", "bigint", "OUT")]
    # nested body DECLARE now opens an inner-scope block (r14); a
    # malformed one (no BEGIN) still errors
    with pytest.raises(ValueError, match="expected one of"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ BEGIN SELECT 1; DECLARE v int; "
            "END; $$"  # DECLARE with no following BEGIN block
        )
    with pytest.raises(NotImplementedError, match="dollar-quoted"):
        _parse_create("CREATE PROCEDURE p() AS 'SELECT 1'")
    assert _parse_create("SELECT 1") is None  # not a CREATE PROCEDURE


def test_substitution_is_quote_aware_and_arity_checked(spark):
    create_procedure(
        spark,
        "subst",
        [("lo", "int"), ("tag", "string")],
        "INSERT INTO t SELECT lo, 'lo fixed literal', tag",
        replace=True,
    )
    got = substitute_call(spark, "subst", ["7", "'x'"])
    # arg names rewritten outside literals only, each exactly once
    assert got == (
        "INSERT INTO t SELECT CAST(7 AS int), 'lo fixed literal', "
        "CAST('x' AS string)"
    )
    with pytest.raises(ValueError, match="takes 2 argument"):
        substitute_call(spark, "subst", ["1"])
    with pytest.raises(ValueError, match="unknown procedure"):
        substitute_call(spark, "never_created", [])


def test_lifecycle_call_twice_and_drop(spark):
    spark.sql("DROP TABLE IF EXISTS bp_proc_unit")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_unit_load")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_unit_load(lo int, hi int, p_src varchar(10))
        AS $$
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_unit (v INT, src STRING)
              USING parquet;
          INSERT INTO bp_proc_unit SELECT id, p_src FROM range(lo, hi);
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    execute_sql(spark, "CALL bp_unit_load(0, 3, 'a')")
    execute_sql(spark, "CALL bp_unit_load(10, 12, 'b')")
    rows = sorted(
        (r["v"], r["src"]) for r in spark.table("bp_proc_unit").collect()
    )
    assert rows == [(0, "a"), (1, "a"), (2, "a"), (10, "b"), (11, "b")]
    # duplicate CREATE without OR REPLACE refuses; DROP then allows it
    with pytest.raises(ValueError, match="already exists"):
        execute_sql(
            spark, "CREATE PROCEDURE bp_unit_load() AS $$ SELECT 1 $$"
        )
    execute_sql(spark, "DROP PROCEDURE bp_unit_load")
    with pytest.raises(ValueError, match="unknown procedure"):
        execute_sql(spark, "CALL bp_unit_load(0, 1, 'x')")
    with pytest.raises(ValueError, match="unknown procedure"):
        execute_sql(spark, "DROP PROCEDURE bp_unit_load")
    spark.sql("DROP TABLE IF EXISTS bp_proc_unit")


def test_parse_body_control_flow_tree():
    """IF/ELSIF/ELSE and nested WHILE parse into the statement tree;
    a CASE ... THEN inside an IF condition does not end the condition
    at its own THEN/ELSE/END."""
    items = _parse_body(
        "IF (CASE WHEN 1 = 1 THEN 'a' ELSE 'b' END) = 'a' THEN\n"
        "  INSERT INTO t SELECT 1;\n"
        "ELSIF 2 > 1 THEN\n"
        "  INSERT INTO t SELECT 2;\n"
        "ELSE\n"
        "  WHILE (SELECT COUNT(*) FROM t) < 5 LOOP\n"
        "    INSERT INTO t SELECT 9;\n"
        "  END LOOP;\n"
        "END IF;\n"
        "SELECT 'done';"
    )
    kinds = [n[0] for n in items]
    assert kinds == ["if", "sql"]
    branches, else_items = items[0][1], items[0][2]
    assert len(branches) == 2
    assert branches[0][0].startswith("(CASE WHEN 1 = 1 THEN")
    assert else_items[0][0] == "while"
    # keyword-looking text inside string literals is inert
    items = _parse_body("INSERT INTO t SELECT 'END IF; WHILE'; SELECT 1;")
    assert [n[0] for n in items] == ["sql", "sql"]


def test_parse_create_control_flow_refusals_and_balance():
    # EXECUTE/EXCEPTION now parse (r14); their malformed/out-of-
    # position forms still refuse with the reason
    with pytest.raises(NotImplementedError, match="WHEN OTHERS"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ BEGIN SELECT 1; EXCEPTION WHEN "
            "division_by_zero THEN SELECT 2; END; $$"
        )
    with pytest.raises(ValueError, match="only valid directly"):
        _parse_body(
            "IF 1 = 1 THEN EXCEPTION WHEN OTHERS THEN SELECT 1; END IF;"
        )
    # RAISE/RETURN now execute; their unsupported FORMS still refuse
    with pytest.raises(NotImplementedError, match="USING"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ BEGIN RAISE x; END; $$"
        )
    with pytest.raises(NotImplementedError, match="bare RETURN"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ BEGIN RETURN x; END; $$"
        )
    # FOR-over-query parses into a record loop node (r14)
    items = _parse_body(
        "FOR r IN SELECT 1 AS x LOOP SELECT 2; END LOOP;"
    )
    assert items == [("forq", "r", "SELECT 1 AS x", [("sql", "SELECT 2")])]
    with pytest.raises(ValueError, match="ended before"):
        _parse_body("IF 1 = 1 THEN SELECT 1;")
    with pytest.raises(ValueError, match="ended before"):
        _parse_body("WHILE 1 = 1 LOOP SELECT 1;")
    with pytest.raises(ValueError, match="expected one of"):
        _parse_body("IF 1 = 1 SELECT 1; END IF;")


def test_if_branches_choose_by_argument(spark):
    spark.sql("DROP TABLE IF EXISTS bp_proc_ifb")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_if_branch")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_if_branch(p_k int) AS $$
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_ifb (k INT, branch STRING)
              USING parquet;
          IF p_k > 10 THEN
            INSERT INTO bp_proc_ifb SELECT p_k, 'big';
          ELSIF p_k > 0 THEN
            INSERT INTO bp_proc_ifb SELECT p_k, 'small';
          ELSE
            INSERT INTO bp_proc_ifb SELECT p_k, 'nonpos';
          END IF;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    for k in (42, 3, -1):
        execute_sql(spark, f"CALL bp_if_branch({k})")
    rows = sorted(
        (r["k"], r["branch"]) for r in spark.table("bp_proc_ifb").collect()
    )
    assert rows == [(-1, "nonpos"), (3, "small"), (42, "big")]
    execute_sql(spark, "DROP PROCEDURE bp_if_branch")
    spark.sql("DROP TABLE IF EXISTS bp_proc_ifb")


def test_while_loop_progresses_via_table_state(spark):
    """The variable-free WHILE pattern: loop progress comes from the
    table the body inserts into (plpgsql without DECLARE)."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_wh")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_while_fill")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_while_fill(p_n int, p_tag varchar(8)) AS $$
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_wh (tag STRING, v BIGINT)
              USING parquet;
          WHILE (SELECT COUNT(*) FROM bp_proc_wh WHERE tag = p_tag) < p_n
          LOOP
            INSERT INTO bp_proc_wh
              SELECT p_tag,
                     (SELECT COUNT(*) FROM bp_proc_wh WHERE tag = p_tag);
          END LOOP;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    execute_sql(spark, "CALL bp_while_fill(3, 'a')")
    execute_sql(spark, "CALL bp_while_fill(0, 'z')")  # false on entry
    rows = sorted(
        (r["tag"], r["v"]) for r in spark.table("bp_proc_wh").collect()
    )
    assert rows == [("a", 0), ("a", 1), ("a", 2)]
    execute_sql(spark, "DROP PROCEDURE bp_while_fill")
    spark.sql("DROP TABLE IF EXISTS bp_proc_wh")


def test_while_iteration_cap(spark, monkeypatch):
    monkeypatch.setattr(procedures, "_MAX_LOOP_ITERATIONS", 5)
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_spin")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_spin() AS $$ WHILE 1 = 1 LOOP SELECT 1; "
        "END LOOP; $$",
    )
    with pytest.raises(RuntimeError, match="exceeded 5 iterations"):
        execute_sql(spark, "CALL bp_spin()")
    execute_sql(spark, "DROP PROCEDURE bp_spin")


def test_null_condition_is_false(spark):
    """plpgsql rule: a NULL IF condition takes the ELSE path."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_nullc")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_nullc")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_nullc() AS $$
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_nullc (s STRING)
              USING parquet;
          IF CAST(NULL AS BOOLEAN) THEN
            INSERT INTO bp_proc_nullc SELECT 'then';
          ELSE
            INSERT INTO bp_proc_nullc SELECT 'else';
          END IF;
        END;
        $$
        """,
    )
    execute_sql(spark, "CALL bp_nullc()")
    assert [r["s"] for r in spark.table("bp_proc_nullc").collect()] == [
        "else"
    ]
    execute_sql(spark, "DROP PROCEDURE bp_nullc")
    spark.sql("DROP TABLE IF EXISTS bp_proc_nullc")


def test_control_flow_body_rolls_back_own_transaction(spark):
    """A transaction OPENED INSIDE a control-flow body must not dangle
    past a failing statement (the execute_sql_script guarantee, ported
    to the tree executor): the next statement would otherwise hit
    'nested BEGIN' and the staged tables/locks would leak."""
    from amazonredshift_blueprints_spark import transactions

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_txn_cf")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_txn_cf(p_k int) AS $$
        BEGIN
          IF p_k > 0 THEN
            BEGIN;
            SELECT * FROM bp_no_such_table_cf_xyz;
            COMMIT;
          END IF;
        END;
        $$
        """,
    )
    with pytest.raises(RuntimeError, match="rolled back"):
        execute_sql(spark, "CALL bp_txn_cf(1)")
    assert transactions.active(spark) is None  # nothing dangles
    execute_sql(spark, "BEGIN")  # a fresh BEGIN works (no nested error)
    execute_sql(spark, "ROLLBACK")
    execute_sql(spark, "DROP PROCEDURE bp_txn_cf")


def test_script_embedded_create_and_call(spark):
    """A .sql script holding CREATE PROCEDURE + CALL runs end to end:
    split_statements keeps the $$ body whole, and a failing body
    statement names its index through execute_sql_script."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_script")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_script_proc")
    n = execute_sql_script(
        spark,
        """
        CREATE PROCEDURE bp_script_proc(k int) AS $$
          CREATE TABLE IF NOT EXISTS bp_proc_script (v INT)
              USING parquet;
          INSERT INTO bp_proc_script SELECT k;
        $$;
        CALL bp_script_proc(41);
        CALL bp_script_proc(42);
        """,
    )
    assert n == 3
    assert sorted(
        r["v"] for r in spark.table("bp_proc_script").collect()
    ) == [41, 42]
    # body failure at CALL time names the failing body statement
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_script_bad() AS $$ SELECT 1; "
        "SELECT * FROM bp_no_such_table_xyz; $$",
    )
    with pytest.raises(RuntimeError, match="statement 2/2"):
        execute_sql(spark, "CALL bp_script_bad()")
    execute_sql(spark, "DROP PROCEDURE bp_script_proc")
    execute_sql(spark, "DROP PROCEDURE bp_script_bad")
    spark.sql("DROP TABLE IF EXISTS bp_proc_script")


def test_variables_for_loop_select_into_end_to_end(spark):
    """DECLARE variables: defaults evaluate at CALL entry, FOR
    accumulates via assignment, SELECT INTO captures a scalar, IF
    branches on variable state, and the final INSERT writes the
    variables' values. v_-prefixed names per the stated shadowing
    contract (variables substitute textually, like plpgsql's own
    naming advice)."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_vars")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_vars_e2e")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_vars_e2e(p_n int, p_tag varchar(8)) AS $$
        DECLARE
          v_total bigint := 0;
          v_cnt int;
          v_msg varchar(40);
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_vars (
              tag STRING, total BIGINT, msg STRING) USING parquet;
          FOR i IN 1 .. p_n LOOP
            v_total := v_total + i * i;
          END LOOP;
          SELECT COUNT(*) INTO v_cnt FROM bp_proc_vars;
          IF v_total > 10 THEN
            v_msg := 'big:' || CAST(v_cnt AS STRING);
          ELSE
            v_msg := 'small:' || CAST(v_cnt AS STRING);
          END IF;
          INSERT INTO bp_proc_vars SELECT p_tag, v_total, v_msg;
        END;
        $$ LANGUAGE plpgsql
        """,
    )
    execute_sql(spark, "CALL bp_vars_e2e(3, 'a')")  # 1+4+9=14 -> big:0
    execute_sql(spark, "CALL bp_vars_e2e(2, 'b')")  # 1+4=5 -> small:1
    rows = sorted(
        (r["tag"], r["total"], r["msg"])
        for r in spark.table("bp_proc_vars").collect()
    )
    assert rows == [("a", 14, "big:0"), ("b", 5, "small:1")]
    execute_sql(spark, "DROP PROCEDURE bp_vars_e2e")
    spark.sql("DROP TABLE IF EXISTS bp_proc_vars")


def test_for_reverse_and_empty_range_and_loop_var_scope(spark):
    spark.sql("DROP TABLE IF EXISTS bp_proc_rev")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_rev_e2e")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_rev_e2e() AS $$
        DECLARE v_s varchar(20) := '';
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_rev (s STRING) USING parquet;
          FOR i IN REVERSE 3 .. 1 LOOP
            v_s := v_s || CAST(i AS STRING);
          END LOOP;
          FOR i IN 5 .. 4 LOOP  -- empty ascending range: zero passes
            v_s := v_s || 'X';
          END LOOP;
          INSERT INTO bp_proc_rev SELECT v_s;
        END;
        $$
        """,
    )
    execute_sql(spark, "CALL bp_rev_e2e()")
    assert [r["s"] for r in spark.table("bp_proc_rev").collect()] == ["321"]
    execute_sql(spark, "DROP PROCEDURE bp_rev_e2e")
    spark.sql("DROP TABLE IF EXISTS bp_proc_rev")


def test_select_into_no_rows_gives_null_and_table_into_stays_ctas(spark):
    """Non-STRICT plpgsql INTO: zero rows -> NULL; and a SELECT INTO
    whose target is NOT a declared variable stays the Redshift CTAS
    statement (the q94 form), exactly the plpgsql precedence."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_into")
    spark.sql("DROP TABLE IF EXISTS bp_proc_into_src")
    spark.sql("DROP TABLE IF EXISTS bp_ctas_target")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_into_e2e")
    spark.sql(
        "CREATE TABLE bp_proc_into_src (v INT) USING parquet"
    )
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_into_e2e() AS $$
        DECLARE v_x int := 7;
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_into (r STRING) USING parquet;
          SELECT v INTO v_x FROM bp_proc_into_src;  -- no rows -> NULL
          INSERT INTO bp_proc_into
            SELECT CASE WHEN v_x IS NULL THEN 'null' ELSE 'set' END;
          SELECT 42 AS v INTO bp_ctas_target;  -- table, not a variable
        END;
        $$
        """,
    )
    execute_sql(spark, "CALL bp_into_e2e()")
    assert [r["r"] for r in spark.table("bp_proc_into").collect()] == [
        "null"
    ]
    assert [r["v"] for r in spark.table("bp_ctas_target").collect()] == [42]
    execute_sql(spark, "DROP PROCEDURE bp_into_e2e")
    for t in ("bp_proc_into", "bp_proc_into_src", "bp_ctas_target"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_exit_continue_and_bare_loop(spark):
    """plpgsql EXIT [WHEN] / CONTINUE [WHEN] unwind the innermost loop;
    a bare LOOP runs as WHILE TRUE and terminates via EXIT; EXIT
    outside a loop refuses at CREATE."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_ec")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_ec_e2e")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_ec_e2e() AS $$
        DECLARE
          v_i int := 0;
          v_s varchar(30) := '';
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_ec (s STRING) USING parquet;
          LOOP
            v_i := v_i + 1;
            EXIT WHEN v_i > 6;
            CONTINUE WHEN v_i = 3;   -- skip 3
            IF v_i = 5 THEN
              CONTINUE;              -- unconditional skip of 5
            END IF;
            v_s := v_s || CAST(v_i AS STRING);
          END LOOP;
          FOR i IN 1 .. 10 LOOP
            EXIT WHEN i = 3;         -- FOR honors EXIT too
            v_s := v_s || 'f';
          END LOOP;
          INSERT INTO bp_proc_ec SELECT v_s;
        END;
        $$
        """,
    )
    execute_sql(spark, "CALL bp_ec_e2e()")
    assert [r["s"] for r in spark.table("bp_proc_ec").collect()] == [
        "1246ff"
    ]
    with pytest.raises(ValueError, match="outside a LOOP"):
        _parse_body("EXIT;")
    with pytest.raises(ValueError, match="outside a LOOP"):
        _parse_body("IF 1 = 1 THEN CONTINUE; END IF;")
    # a bare LOOP with no EXIT trips the iteration cap, not an infloop
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_ec_spin")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_ec_spin() AS $$ LOOP SELECT 1; END LOOP; $$",
    )
    import pytest as _pytest

    from amazonredshift_blueprints_spark.functions import procedures as _p

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(_p, "_MAX_LOOP_ITERATIONS", 4)
        with pytest.raises(RuntimeError, match="exceeded 4"):
            execute_sql(spark, "CALL bp_ec_spin()")
    execute_sql(spark, "DROP PROCEDURE bp_ec_e2e")
    execute_sql(spark, "DROP PROCEDURE bp_ec_spin")
    spark.sql("DROP TABLE IF EXISTS bp_proc_ec")


def test_random_programs_match_python_interpreter(spark):
    """Differential test of the plpgsql interpreter: seeded-random
    programs over integer variables (assignment, IF/ELSE on parity,
    bounded WHILE, FOR with EXIT/CONTINUE) execute once through the
    Spark procedure face and once through a direct Python
    interpretation of the same program; the final variable states must
    match exactly. All arithmetic is integer, so there is no float
    tolerance anywhere."""
    import random

    def gen_program(rng, depth=0):
        stmts = []
        n = rng.randint(2, 4 if depth else 6)
        for _ in range(n):
            kind = rng.choice(
                ["assign", "assign", "if", "while", "for"]
                if depth < 2
                else ["assign"]
            )
            if kind == "assign":
                v = rng.choice(["v_a", "v_b"])
                c = rng.randint(1, 5)
                op = rng.choice(["+", "*"])
                stmts.append(("assign", v, op, c))
            elif kind == "if":
                t = gen_program(rng, depth + 1)
                f = gen_program(rng, depth + 1)
                stmts.append(("if", rng.choice(["v_a", "v_b"]), t, f))
            elif kind == "while":
                lim = rng.randint(1, 4)
                body = gen_program(rng, depth + 1)
                stmts.append(("while", lim, body))
            else:
                a, b = rng.randint(1, 3), rng.randint(3, 6)
                body = gen_program(rng, depth + 1)
                guard = rng.choice([None, "exit", "continue"])
                stmts.append(("for", a, b, guard, rng.randint(a, b), body))
        return stmts

    def render(stmts, ind="  "):
        out = []
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                out.append(f"{ind}{v} := ({v} {op} {c}) % 1000;")
            elif s[0] == "if":
                _, v, t, f = s
                out.append(f"{ind}IF {v} % 2 = 0 THEN")
                out.append(render(t, ind + "  "))
                out.append(f"{ind}ELSE")
                out.append(render(f, ind + "  "))
                out.append(f"{ind}END IF;")
            elif s[0] == "while":
                _, lim, body = s
                out.append(f"{ind}v_w := 0;")
                out.append(f"{ind}WHILE v_w < {lim} LOOP")
                out.append(f"{ind}  v_w := v_w + 1;")
                out.append(render(body, ind + "  "))
                out.append(f"{ind}END LOOP;")
            else:
                _, a, b, guard, gval, body = s
                out.append(f"{ind}FOR i IN {a} .. {b} LOOP")
                if guard:
                    out.append(
                        f"{ind}  {guard.upper()} WHEN i = {gval};"
                    )
                out.append(f"{ind}  v_a := (v_a + i) % 1000;")
                out.append(render(body, ind + "  "))
                out.append(f"{ind}END LOOP;")
        return "\n".join(out)

    class _Exit(Exception):
        pass

    class _Cont(Exception):
        pass

    def interp(stmts, env):
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                env[v] = (env[v] + c if op == "+" else env[v] * c) % 1000
            elif s[0] == "if":
                _, v, t, f = s
                interp(t if env[v] % 2 == 0 else f, env)
            elif s[0] == "while":
                _, lim, body = s
                env["v_w"] = 0
                while env["v_w"] < lim:
                    env["v_w"] += 1
                    try:
                        interp(body, env)
                    except _Cont:
                        continue
                    except _Exit:
                        break
            else:
                _, a, b, guard, gval, body = s
                try:
                    for i in range(a, b + 1):
                        try:
                            if guard == "exit" and i == gval:
                                raise _Exit()
                            if guard == "continue" and i == gval:
                                raise _Cont()
                            env["v_a"] = (env["v_a"] + i) % 1000
                            interp(body, env)
                        except _Cont:
                            continue
                except _Exit:
                    pass

    spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz")
    for seed in (7, 13, 99):
        rng = random.Random(seed)
        prog = gen_program(rng)
        env = {"v_a": 1, "v_b": 2, "v_w": 0}
        interp(prog, env)
        body = render(prog)
        execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_fuzz")
        execute_sql(
            spark,
            "CREATE PROCEDURE bp_fuzz() AS $$\n"
            "DECLARE v_a int := 1; v_b int := 2; v_w int := 0;\n"
            "BEGIN\n"
            "CREATE TABLE IF NOT EXISTS bp_proc_fuzz "
            "(a INT, b INT) USING parquet;\n"
            f"{body}\n"
            "INSERT INTO bp_proc_fuzz SELECT v_a, v_b;\n"
            "END;\n$$",
        )
        execute_sql(spark, "CALL bp_fuzz()")
        rows = [(r["a"], r["b"]) for r in spark.table("bp_proc_fuzz").collect()]
        assert rows == [(env["v_a"], env["v_b"])], (seed, rows, env)
        spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz")
        execute_sql(spark, "DROP PROCEDURE bp_fuzz")


def test_raise_levels_and_bare_return(spark, capsys):
    """RAISE INFO/NOTICE/WARNING print plpgsql-formatted messages to
    stdout (the reference CLI's own notice channel); RAISE EXCEPTION
    aborts the CALL; bare RETURN exits the procedure early; RETURN
    with a value and RAISE USING forms refuse at CREATE."""
    spark.sql("DROP TABLE IF EXISTS bp_proc_raise")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_raise_e2e")
    execute_sql(
        spark,
        """
        CREATE PROCEDURE bp_raise_e2e(p_k int) AS $$
        DECLARE v_n int := 0;
        BEGIN
          CREATE TABLE IF NOT EXISTS bp_proc_raise (s STRING)
              USING parquet;
          SELECT p_k * 2 INTO v_n;
          RAISE INFO 'doubled % to % (100%% sure)', p_k, v_n;
          IF p_k < 0 THEN
            RAISE EXCEPTION 'negative input: %', p_k;
          END IF;
          IF p_k = 0 THEN
            RETURN;
          END IF;
          INSERT INTO bp_proc_raise SELECT 'ran:' || CAST(v_n AS STRING);
        END;
        $$
        """,
    )
    execute_sql(spark, "CALL bp_raise_e2e(3)")
    out = capsys.readouterr().out
    assert "INFO: doubled 3 to 6 (100% sure)" in out
    execute_sql(spark, "CALL bp_raise_e2e(0)")  # early RETURN: no row
    with pytest.raises(RuntimeError, match="RAISE EXCEPTION: negative "
                                           "input: -2"):
        execute_sql(spark, "CALL bp_raise_e2e(-2)")
    assert [r["s"] for r in spark.table("bp_proc_raise").collect()] == [
        "ran:6"
    ]
    with pytest.raises(NotImplementedError, match="bare RETURN"):
        _parse_body("RETURN 42;")
    with pytest.raises(NotImplementedError, match="USING"):
        _parse_body("RAISE division_by_zero;")
    with pytest.raises(ValueError, match="placeholder"):
        _parse_body("RAISE INFO 'one % two %', 5;")
    execute_sql(spark, "DROP PROCEDURE bp_raise_e2e")
    spark.sql("DROP TABLE IF EXISTS bp_proc_raise")


def test_session_state_is_per_session_and_weakref_scoped(spark):
    """Registries are weakref-keyed per-session namespaces
    (sessionstate.py): a procedure registered in one session is
    invisible to a sibling newSession(), and the store is a
    WeakKeyDictionary so a dead session's registrations are
    reclaimable (the old id(spark) keys outlived their session and a
    recycled id could leak them into a fresh one)."""
    import weakref

    from amazonredshift_blueprints_spark import sessionstate

    assert isinstance(sessionstate._STATE, weakref.WeakKeyDictionary)
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_scoped")
    execute_sql(
        spark, "CREATE PROCEDURE bp_scoped() AS $$ SELECT 1 $$"
    )
    sibling = spark.newSession()
    with pytest.raises(ValueError, match="unknown procedure"):
        execute_sql(sibling, "CALL bp_scoped()")
    execute_sql(spark, "CALL bp_scoped()")  # still registered here
    execute_sql(spark, "DROP PROCEDURE bp_scoped")


def test_early_return_count_survives_unwind(spark):
    """call_procedure's statement count must include statements run
    BEFORE an early RETURN — the old unwind added a local count that
    was always 0 (r13 advisor)."""
    from amazonredshift_blueprints_spark.functions.procedures import (
        call_procedure,
    )

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_retcount")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_retcount() AS $$\n"
        "DECLARE v_x int := 0;\n"
        "BEGIN\n"
        "  v_x := 1;\n"
        "  v_x := 2;\n"
        "  IF v_x = 2 THEN\n"
        "    v_x := 3;\n"
        "    RETURN;\n"
        "  END IF;\n"
        "  v_x := 99;\n"
        "END;\n$$",
    )
    # 3 assignments executed before RETURN; the post-RETURN one not
    assert call_procedure(spark, "bp_retcount", []) == 3
    execute_sql(spark, "DROP PROCEDURE bp_retcount")


def test_with_prefixed_select_into_assigns_variable(spark):
    """WITH ... SELECT x INTO v_total must capture the variable, not
    fall through to the q94 CTAS rewrite and CREATE TABLE v_total
    (r13 advisor: silent mis-run)."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_with_into")
    execute_sql(spark, "DROP TABLE IF EXISTS bp_with_into_out")
    execute_sql(spark, "DROP TABLE IF EXISTS v_total")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_with_into() AS $$\n"
        "DECLARE v_total int;\n"
        "BEGIN\n"
        "  WITH t AS (SELECT 21 AS x UNION ALL SELECT 21)\n"
        "  SELECT SUM(x) INTO v_total FROM t;\n"
        "  CREATE TABLE bp_with_into_out USING parquet AS\n"
        "    SELECT v_total AS total;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_with_into()")
    assert spark.table("bp_with_into_out").collect()[0]["total"] == 42
    assert not spark.catalog.tableExists("v_total")
    execute_sql(spark, "DROP TABLE bp_with_into_out")
    execute_sql(spark, "DROP PROCEDURE bp_with_into")


def test_with_insert_into_cte_is_not_variable_capture(spark):
    """A writable-CTE INSERT INTO inside a procedure must stay plain
    SQL even when the target table name collides with a declared
    variable name (the INSERT-precedes-INTO exclusion)."""
    from amazonredshift_blueprints_spark.functions.procedures import (
        _into_targets,
    )

    got = _into_targets(
        "WITH t AS (SELECT 1 AS x) INSERT INTO v_sink SELECT x FROM t",
        frozenset({"v_sink"}),
    )
    assert got is None


def test_string_variable_with_backslash_round_trips(spark):
    """A captured string containing a backslash must substitute back
    byte-identical — Spark's default literal parser processes
    backslash escapes, so unescaped 'a\\nb' corrupts to a newline on
    every subsequent reference (r13 advisor)."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_backslash")
    execute_sql(spark, "DROP TABLE IF EXISTS bp_backslash_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_backslash() AS $$\n"
        "DECLARE v_s varchar(20);\n"
        "BEGIN\n"
        "  SELECT CONCAT('a', CHR(92), 'nb') INTO v_s;\n"
        "  CREATE TABLE bp_backslash_out USING parquet AS\n"
        "    SELECT v_s AS s, LENGTH(v_s) AS n;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_backslash()")
    row = spark.table("bp_backslash_out").collect()[0]
    assert row["s"] == "a\\nb" and row["n"] == 4
    execute_sql(spark, "DROP TABLE bp_backslash_out")
    execute_sql(spark, "DROP PROCEDURE bp_backslash")


def test_select_into_multirow_takes_first_row_only(spark):
    """INTO over a multi-row query binds the FIRST row (non-STRICT
    plpgsql) — and does so via take(1), never a full collect."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_firstrow")
    execute_sql(spark, "DROP TABLE IF EXISTS bp_firstrow_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_firstrow() AS $$\n"
        "DECLARE v_k int;\n"
        "BEGIN\n"
        "  SELECT x INTO v_k FROM (SELECT 5 AS x UNION ALL SELECT 7\n"
        "    UNION ALL SELECT 9) ORDER BY x DESC;\n"
        "  CREATE TABLE bp_firstrow_out USING parquet AS\n"
        "    SELECT v_k AS k;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_firstrow()")
    assert spark.table("bp_firstrow_out").collect()[0]["k"] == 9
    execute_sql(spark, "DROP TABLE bp_firstrow_out")
    execute_sql(spark, "DROP PROCEDURE bp_firstrow")


# ---------------------------------------------------------------------------
# round 14: EXCEPTION blocks, dynamic EXECUTE, FOR-over-query, bound
# cursors, OUT/INOUT result channel
# ---------------------------------------------------------------------------


def test_exception_block_nonatomic_semantics(spark):
    """Statements before the failing one stand (NONATOMIC — each leaf
    auto-commits), the failed statement's write is absent, the handler
    runs with sqlerrm/sqlstate in scope, and the block's successor
    statements continue."""
    spark.sql("DROP TABLE IF EXISTS bp_exc")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_exc_p")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_exc_p() AS $$\n"
        "DECLARE v_x int;\n"
        "BEGIN\n"
        "  CREATE TABLE bp_exc (a INT, msg STRING) USING parquet;\n"
        "  BEGIN\n"
        "    INSERT INTO bp_exc SELECT 1, NULL;\n"
        "    SELECT 1/0 INTO v_x;\n"
        "    INSERT INTO bp_exc SELECT 99, NULL;\n"
        "  EXCEPTION WHEN OTHERS THEN\n"
        "    INSERT INTO bp_exc SELECT -1, sqlstate;\n"
        "  END;\n"
        "  INSERT INTO bp_exc SELECT 2, NULL;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_exc_p()")
    rows = {r.a: r.msg for r in spark.table("bp_exc").collect()}
    assert set(rows) == {1, -1, 2}          # 99 never ran
    assert rows[-1] == "22012"              # division-by-zero SQLSTATE
    spark.sql("DROP TABLE bp_exc")
    execute_sql(spark, "DROP PROCEDURE bp_exc_p")


def test_exception_block_rolls_back_inner_transaction(spark):
    """A transaction OPENED INSIDE the guarded block and dangling at
    the failure is rolled back before the handler runs — staged writes
    discarded, target untouched, and the handler does not execute
    inside a half-dead transaction."""
    from amazonredshift_blueprints_spark import transactions

    spark.sql("DROP TABLE IF EXISTS bp_exc_txn")
    spark.sql("CREATE TABLE bp_exc_txn USING parquet AS SELECT 1 AS a")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_exc_txn_p")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_exc_txn_p() AS $$\n"
        "DECLARE v_n int := 0;\n"
        "BEGIN\n"
        "  BEGIN\n"
        "    BEGIN;\n"
        "    DELETE FROM bp_exc_txn;\n"
        "    RAISE EXCEPTION 'abort before COMMIT';\n"
        "  EXCEPTION WHEN OTHERS THEN\n"
        "    SELECT COUNT(*) INTO v_n FROM bp_exc_txn;\n"
        "  END;\n"
        "  INSERT INTO bp_exc_txn SELECT v_n + 100;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_exc_txn_p()")
    assert transactions.active(spark) is None
    # handler saw the ROLLED-BACK table (1 row), so it inserted 101
    assert sorted(r.a for r in spark.table("bp_exc_txn").collect()) == [1, 101]
    spark.sql("DROP TABLE bp_exc_txn")
    execute_sql(spark, "DROP PROCEDURE bp_exc_txn_p")


def test_exception_block_passes_control_flow_signals(spark):
    """RETURN inside a guarded block is not an error: the handler must
    NOT run, and the early-exit count still reaches the caller."""
    from amazonredshift_blueprints_spark.functions.procedures import (
        call_procedure,
    )

    spark.sql("DROP TABLE IF EXISTS bp_exc_ret")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_exc_ret_p")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_exc_ret_p() AS $$\n"
        "BEGIN\n"
        "  CREATE TABLE bp_exc_ret (a INT) USING parquet;\n"
        "  BEGIN\n"
        "    INSERT INTO bp_exc_ret SELECT 1;\n"
        "    RETURN;\n"
        "  EXCEPTION WHEN OTHERS THEN\n"
        "    INSERT INTO bp_exc_ret SELECT -1;\n"
        "  END;\n"
        "  INSERT INTO bp_exc_ret SELECT 2;\n"
        "END;\n$$",
    )
    assert call_procedure(spark, "bp_exc_ret_p", []) == 2
    assert sorted(r.a for r in spark.table("bp_exc_ret").collect()) == [1]
    spark.sql("DROP TABLE bp_exc_ret")
    execute_sql(spark, "DROP PROCEDURE bp_exc_ret_p")


def test_unhandled_error_in_plain_nested_block_still_raises(spark):
    """A nested BEGIN block WITHOUT an EXCEPTION section does not
    swallow anything."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_exc_none")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_exc_none() AS $$ BEGIN\n"
        "  BEGIN\n    RAISE EXCEPTION 'boom';\n  END;\n"
        "END; $$",
    )
    with pytest.raises(RuntimeError, match="boom"):
        execute_sql(spark, "CALL bp_exc_none()")
    execute_sql(spark, "DROP PROCEDURE bp_exc_none")


def test_dynamic_execute_ddl_into_and_quote_safety(spark):
    """EXECUTE builds a command from variables, routes through the
    full dispatcher; EXECUTE ... INTO captures a scalar; an INTO
    keyword INSIDE the command string does not split."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_dyn")
    spark.sql("DROP TABLE IF EXISTS bp_dyn_t")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_dyn(tname varchar(30), seed int) AS $$\n"
        "DECLARE v_sql varchar(200); v_cnt bigint;\n"
        "BEGIN\n"
        "  v_sql := 'CREATE TABLE ' || tname ||\n"
        "           ' USING parquet AS SELECT ' || seed || ' AS x';\n"
        "  EXECUTE v_sql;\n"
        "  EXECUTE 'INSERT INTO ' || tname || ' SELECT ' || (seed + 1);\n"
        "  EXECUTE 'SELECT COUNT(*) FROM ' || tname INTO v_cnt;\n"
        "  EXECUTE 'INSERT INTO ' || tname || ' SELECT ' || (v_cnt * 10);\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_dyn('bp_dyn_t', 7)")
    assert sorted(r.x for r in spark.table("bp_dyn_t").collect()) == [7, 8, 20]
    spark.sql("DROP TABLE bp_dyn_t")
    execute_sql(spark, "DROP PROCEDURE bp_dyn")


def test_dynamic_execute_null_command_and_bad_into_target(spark):
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_dyn_null")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_dyn_null() AS $$\n"
        "DECLARE v_sql varchar(10);\nBEGIN\n  EXECUTE v_sql;\nEND;\n$$",
    )
    with pytest.raises(RuntimeError, match="NULL"):
        execute_sql(spark, "CALL bp_dyn_null()")
    execute_sql(spark, "DROP PROCEDURE bp_dyn_null")
    with pytest.raises(ValueError, match="not declared"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ BEGIN "
            "EXECUTE 'SELECT 1' INTO nosuch; END; $$"
        )


def test_for_over_query_records_exit_and_scoping(spark):
    """FOR r IN <query>: r.field substitutes per row; EXIT WHEN works;
    the record goes out of scope after the loop."""
    from amazonredshift_blueprints_spark.functions.procedures import (
        call_procedure,
    )

    spark.sql("DROP TABLE IF EXISTS bp_forq")
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_forq_p")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_forq_p() AS $$\n"
        "DECLARE v_sum bigint := 0;\n"
        "BEGIN\n"
        "  CREATE TABLE bp_forq (k BIGINT, s BIGINT) USING parquet;\n"
        "  FOR r IN SELECT id AS k, id * 10 AS v FROM range(10)\n"
        "           ORDER BY id LOOP\n"
        "    EXIT WHEN r.k = 3;\n"
        "    v_sum := v_sum + r.v;\n"
        "    INSERT INTO bp_forq SELECT r.k, v_sum;\n"
        "  END LOOP;\n"
        "END;\n$$",
    )
    call_procedure(spark, "bp_forq_p", [])
    rows = sorted((r.k, r.s) for r in spark.table("bp_forq").collect())
    assert rows == [(0, 0), (1, 10), (2, 30)]
    spark.sql("DROP TABLE bp_forq")
    execute_sql(spark, "DROP PROCEDURE bp_forq_p")


def test_for_over_query_empty_result_runs_zero_iterations(spark):
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_forq_empty")
    spark.sql("DROP TABLE IF EXISTS bp_forq_empty_t")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_forq_empty() AS $$ BEGIN\n"
        "  CREATE TABLE bp_forq_empty_t (a BIGINT) USING parquet;\n"
        "  FOR r IN SELECT id FROM range(10) WHERE id < 0 LOOP\n"
        "    INSERT INTO bp_forq_empty_t SELECT r.id;\n"
        "  END LOOP;\n"
        "END; $$",
    )
    execute_sql(spark, "CALL bp_forq_empty()")
    assert spark.table("bp_forq_empty_t").count() == 0
    spark.sql("DROP TABLE bp_forq_empty_t")
    execute_sql(spark, "DROP PROCEDURE bp_forq_empty")


def test_bound_cursor_open_fetch_close_and_leak_close(spark):
    """plpgsql bound cursor drains via FETCH INTO (NULLs past the
    end); a second OPEN refuses; a cursor left open at exit is closed
    (registry leak check)."""
    from amazonredshift_blueprints_spark.functions.prepared import _cursors

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_cur_p")
    spark.sql("DROP TABLE IF EXISTS bp_cur_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_cur_p(lim int) AS $$\n"
        "DECLARE c CURSOR FOR SELECT id, id * 2 AS d FROM range(100)\n"
        "  WHERE id < lim ORDER BY id;\n"
        "  v_i bigint; v_d bigint; v_sum bigint := 0;\n"
        "BEGIN\n"
        "  OPEN c;\n"
        "  FETCH c INTO v_i, v_d;\n"
        "  WHILE v_i IS NOT NULL LOOP\n"
        "    v_sum := v_sum + v_d;\n"
        "    FETCH NEXT FROM c INTO v_i, v_d;\n"
        "  END LOOP;\n"
        "  CLOSE c;\n"
        "  CREATE TABLE bp_cur_out USING parquet AS SELECT v_sum AS s;\n"
        "END;\n$$",
    )
    before = set(_cursors(spark))
    execute_sql(spark, "CALL bp_cur_p(4)")
    assert spark.table("bp_cur_out").collect()[0]["s"] == 12  # 0+2+4+6
    assert set(_cursors(spark)) == before  # nothing leaked
    spark.sql("DROP TABLE bp_cur_out")

    # leak path: procedure exits with the cursor still open
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_cur_leak")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_cur_leak() AS $$\n"
        "DECLARE c CURSOR FOR SELECT 1 AS x;\n  v_x int;\n"
        "BEGIN\n  OPEN c;\n  FETCH c INTO v_x;\nEND;\n$$",
    )
    execute_sql(spark, "CALL bp_cur_leak()")
    assert set(_cursors(spark)) == before
    # double OPEN refuses
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_cur_dbl")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_cur_dbl() AS $$\n"
        "DECLARE c CURSOR FOR SELECT 1 AS x;\nBEGIN\n"
        "  OPEN c;\n  OPEN c;\nEND;\n$$",
    )
    with pytest.raises(RuntimeError, match="already open"):
        execute_sql(spark, "CALL bp_cur_dbl()")
    assert set(_cursors(spark)) == before  # error exit also closed it
    for p in ("bp_cur_p", "bp_cur_leak", "bp_cur_dbl"):
        execute_sql(spark, f"DROP PROCEDURE {p}")


def test_out_inout_result_channel(spark):
    """OUT args are omitted from CALL, INOUT passed; exit values come
    back as a one-row DataFrame in declaration order."""
    from amazonredshift_blueprints_spark.functions.procedures import (
        call_procedure_returning,
    )

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_outp")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_outp(f1 IN int, f2 INOUT varchar(256),\n"
        "                         out_var OUT varchar(256)) AS $$\n"
        "BEGIN\n"
        "  f2 := f2 || ' born';\n"
        "  out_var := 'v=' || f1;\n"
        "END;\n$$",
    )
    n, res = call_procedure_returning(spark, "bp_outp", ["2", "'2019'"])
    assert n == 2
    assert [f.name for f in res.schema.fields] == ["f2", "out_var"]
    row = res.collect()[0]
    assert row["f2"] == "2019 born" and row["out_var"] == "v=2"
    # statement face: OUT-arg CALL arity is checked with the hint
    with pytest.raises(ValueError, match="omitted from CALL"):
        execute_sql(spark, "CALL bp_outp(1, 'x', 'y')")
    # statement face accepts the call (result discarded)
    execute_sql(spark, "CALL bp_outp(1, 'x')")
    execute_sql(spark, "DROP PROCEDURE bp_outp")


def test_random_raising_programs_match_python_interpreter(spark):
    """Differential fuzz for EXCEPTION blocks: seeded-random programs
    whose guarded blocks conditionally RAISE; the Spark interpreter
    and a direct Python interpretation must agree on the final
    variable state (NONATOMIC: variable writes before the raise
    persist into the handler)."""
    import random

    def gen(rng, depth=0):
        stmts = []
        for _ in range(rng.randint(2, 4)):
            kind = rng.choice(
                ["assign", "assign", "try", "if"] if depth < 2 else ["assign"]
            )
            if kind == "assign":
                stmts.append(("assign", rng.choice(["v_a", "v_b"]),
                              rng.choice(["+", "*"]), rng.randint(1, 5)))
            elif kind == "if":
                stmts.append(("if", rng.choice(["v_a", "v_b"]),
                              gen(rng, depth + 1), gen(rng, depth + 1)))
            else:
                stmts.append(("try", gen(rng, depth + 1),
                              rng.choice(["v_a", "v_b"]), rng.randint(0, 2),
                              gen(rng, depth + 1), gen(rng, depth + 1)))
        return stmts

    def render(stmts, ind="  "):
        out = []
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                out.append(f"{ind}{v} := ({v} {op} {c}) % 1000;")
            elif s[0] == "if":
                _, v, t, f = s
                out.append(f"{ind}IF {v} % 2 = 0 THEN")
                out.append(render(t, ind + "  "))
                out.append(f"{ind}ELSE")
                out.append(render(f, ind + "  "))
                out.append(f"{ind}END IF;")
            else:
                _, t, v, m, rest, h = s
                out.append(f"{ind}BEGIN")
                out.append(render(t, ind + "  "))
                out.append(f"{ind}  IF {v} % 3 = {m} THEN")
                out.append(f"{ind}    RAISE EXCEPTION 'fz %', {v};")
                out.append(f"{ind}  END IF;")
                out.append(render(rest, ind + "  "))
                out.append(f"{ind}EXCEPTION WHEN OTHERS THEN")
                out.append(render(h, ind + "  "))
                out.append(f"{ind}END;")
        return "\n".join(out)

    def interp(stmts, env):
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                env[v] = (env[v] + c if op == "+" else env[v] * c) % 1000
            elif s[0] == "if":
                _, v, t, f = s
                interp(t if env[v] % 2 == 0 else f, env)
            else:
                _, t, v, m, rest, h = s
                try:
                    interp(t, env)
                    if env[v] % 3 == m:
                        raise RuntimeError("fz")
                    interp(rest, env)
                except RuntimeError:
                    interp(h, env)

    spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz_exc")
    for seed in (3, 21, 77):
        rng = random.Random(seed)
        prog = gen(rng)
        env = {"v_a": 1, "v_b": 2}
        interp(prog, env)
        execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_fuzz_exc")
        execute_sql(
            spark,
            "CREATE PROCEDURE bp_fuzz_exc() AS $$\n"
            "DECLARE v_a int := 1; v_b int := 2;\n"
            "BEGIN\n"
            "CREATE TABLE IF NOT EXISTS bp_proc_fuzz_exc "
            "(a INT, b INT) USING parquet;\n"
            f"{render(prog)}\n"
            "INSERT INTO bp_proc_fuzz_exc SELECT v_a, v_b;\n"
            "END;\n$$",
        )
        execute_sql(spark, "CALL bp_fuzz_exc()")
        rows = [
            (r["a"], r["b"])
            for r in spark.table("bp_proc_fuzz_exc").collect()
        ]
        assert rows == [(env["v_a"], env["v_b"])], (seed, rows, env)
        spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz_exc")
        execute_sql(spark, "DROP PROCEDURE bp_fuzz_exc")


def test_nested_declare_block_scoping_and_reinit(spark):
    """Inner DECLARE blocks: shadow outer variables, re-initialize on
    every entry (defaults see the OUTER scope until the inner name is
    declared), restore the outer value at scope exit; shadowing an IN
    argument refuses at CREATE."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_nest")
    spark.sql("DROP TABLE IF EXISTS bp_nest_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_nest() AS $$\n"
        "DECLARE v_x int := 1; v_log varchar(200) := '';\n"
        "BEGIN\n"
        "  FOR i IN 1 .. 2 LOOP\n"
        "    DECLARE\n"
        "      v_y int := v_x * 10;\n"
        "      v_x int := 99;\n"
        "    BEGIN\n"
        "      v_log := v_log || '[' || v_x || ',' || v_y || ']';\n"
        "      v_y := v_y + i;\n"
        "      v_log := v_log || v_y;\n"
        "    END;\n"
        "  END LOOP;\n"
        "  v_log := v_log || '|outer=' || v_x;\n"
        "  CREATE TABLE bp_nest_out USING parquet AS\n"
        "    SELECT v_log AS log;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_nest()")
    got = spark.table("bp_nest_out").collect()[0]["log"]
    assert got == "[99,10]11[99,10]12|outer=1"
    spark.sql("DROP TABLE bp_nest_out")
    execute_sql(spark, "DROP PROCEDURE bp_nest")
    with pytest.raises(ValueError, match="shadow IN argument"):
        _parse_create(
            "CREATE PROCEDURE p(k int) AS $$ BEGIN "
            "DECLARE k int; BEGIN SELECT 1; END; END; $$"
        )


def test_nested_declare_block_with_exception_and_cursor(spark):
    """An inner block's EXCEPTION section sees the inner scope; a
    cursor declared in an inner scope closes at scope exit even when
    left open."""
    from amazonredshift_blueprints_spark.functions.prepared import _cursors

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_nest_exc")
    spark.sql("DROP TABLE IF EXISTS bp_nest_exc_out")
    before = set(_cursors(spark))
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_nest_exc() AS $$\n"
        "BEGIN\n"
        "  DECLARE v int := 0;\n"
        "    c CURSOR FOR SELECT 42 AS x;\n"
        "  BEGIN\n"
        "    OPEN c;\n"
        "    FETCH c INTO v;\n"
        "    SELECT v / 0 INTO v;\n"
        "  EXCEPTION WHEN OTHERS THEN\n"
        "    CREATE TABLE bp_nest_exc_out USING parquet AS\n"
        "      SELECT sqlstate AS st, v AS vv;\n"
        "  END;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_nest_exc()")
    r = spark.table("bp_nest_exc_out").collect()[0]
    assert (r.st, r.vv) == ("22012", 42)
    assert set(_cursors(spark)) == before  # inner cursor closed
    spark.sql("DROP TABLE bp_nest_exc_out")
    execute_sql(spark, "DROP PROCEDURE bp_nest_exc")


def test_record_variables_bind_rebind_and_fetch(spark):
    """DECLARE r RECORD: SELECT INTO binds the whole first row (fields
    substitute as r.field), re-binding may change the shape, an
    exhausted query binds NULL fields, FETCH INTO r works, and
    whole-record assignment refuses."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_rec")
    spark.sql("DROP TABLE IF EXISTS bp_rec_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_rec() AS $$\n"
        "DECLARE r RECORD; v_log varchar(300) := '';\n"
        "  c CURSOR FOR SELECT id AS k, id * 5 AS f FROM range(3)\n"
        "    ORDER BY id DESC;\n"
        "BEGIN\n"
        "  SELECT 7 AS a, 'hi' AS b INTO r;\n"
        "  v_log := v_log || r.a || r.b;\n"
        "  SELECT 3.5 AS z INTO r FROM range(1);\n"
        "  v_log := v_log || '|' || r.z;\n"
        "  SELECT 9 AS q INTO r FROM range(1) WHERE id < 0;\n"
        "  v_log := v_log || '|' || COALESCE(CAST(r.q AS STRING), 'null');\n"
        "  OPEN c;\n"
        "  FETCH c INTO r;\n"
        "  v_log := v_log || '|' || r.k || ',' || r.f;\n"
        "  CLOSE c;\n"
        "  CREATE TABLE bp_rec_out USING parquet AS SELECT v_log AS log;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_rec()")
    got = spark.table("bp_rec_out").collect()[0]["log"]
    assert got == "7hi|3.5|null|2,10"
    spark.sql("DROP TABLE bp_rec_out")
    execute_sql(spark, "DROP PROCEDURE bp_rec")

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_rec_assign")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_rec_assign() AS $$\n"
        "DECLARE r RECORD;\nBEGIN\n  r := 1;\nEND;\n$$",
    )
    with pytest.raises(RuntimeError, match="cannot assign to record"):
        execute_sql(spark, "CALL bp_rec_assign()")
    execute_sql(spark, "DROP PROCEDURE bp_rec_assign")
    # record mixed with scalars in one INTO refuses at exec
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_rec_mix")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_rec_mix() AS $$\n"
        "DECLARE r RECORD; v int;\nBEGIN\n"
        "  SELECT 1, 2 INTO r, v;\nEND;\n$$",
    )
    with pytest.raises(RuntimeError, match="whole row alone"):
        execute_sql(spark, "CALL bp_rec_mix()")
    execute_sql(spark, "DROP PROCEDURE bp_rec_mix")
    # RECORD with a default refuses at CREATE
    with pytest.raises(ValueError, match="no default"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ DECLARE r RECORD := 1; "
            "BEGIN SELECT 1; END; $$"
        )


def test_constant_declarations_enforced_at_create(spark):
    """CONSTANT initializes once; any write (assign or INTO) refuses
    at CREATE; an inner plain variable may shadow an outer constant
    legally; a CONSTANT without an initializer refuses."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_const")
    spark.sql("DROP TABLE IF EXISTS bp_const_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_const(p int) AS $$\n"
        "DECLARE k CONSTANT int := p * 2; v int;\n"
        "BEGIN\n  v := k + 1;\n"
        "  CREATE TABLE bp_const_out USING parquet AS SELECT v AS x;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_const(20)")
    assert spark.table("bp_const_out").collect()[0]["x"] == 41
    spark.sql("DROP TABLE bp_const_out")
    execute_sql(spark, "DROP PROCEDURE bp_const")
    for body in ("k := 2;", "SELECT 9 INTO k;", "EXECUTE 'SELECT 9' INTO k;"):
        with pytest.raises(ValueError, match="CONSTANT"):
            _parse_create(
                "CREATE PROCEDURE p() AS $$ DECLARE k CONSTANT int := 1; "
                f"BEGIN {body} END; $$"
            )
    with pytest.raises(ValueError, match="initializer"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ DECLARE k CONSTANT int; "
            "BEGIN SELECT 1; END; $$"
        )
    # inner plain variable shadows the constant legally
    _parse_create(
        "CREATE PROCEDURE p() AS $$ DECLARE k CONSTANT int := 1; BEGIN "
        "DECLARE k int; BEGIN k := 2; END; END; $$"
    )


def test_refcursor_result_set_idiom(spark):
    """The Redshift procedure-returns-result-set pattern: an INOUT
    refcursor argument names a session cursor, OPEN ... FOR registers
    it, and the CALLER fetches after CALL — the cursor outlives the
    procedure. Unnamed refcursors get a generated portal name."""
    from amazonredshift_blueprints_spark.functions.prepared import (
        close_cursor,
        fetch_cursor,
    )
    from amazonredshift_blueprints_spark.functions.procedures import (
        call_procedure_returning,
    )

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_get_rs")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_get_rs(p_n IN int, rs INOUT refcursor) AS $$\n"
        "BEGIN\n"
        "  OPEN rs FOR SELECT id, id * 2 AS d FROM range(10)\n"
        "    WHERE id < p_n ORDER BY id;\n"
        "END;\n$$",
    )
    n, res = call_procedure_returning(spark, "bp_get_rs", ["3", "'bp_rs_cur'"])
    assert res.collect()[0]["rs"] == "bp_rs_cur"
    rows = [(r.id, r.d) for r in fetch_cursor(spark, "bp_rs_cur", 10).collect()]
    assert rows == [(0, 0), (1, 2), (2, 4)]
    close_cursor(spark, "bp_rs_cur")
    execute_sql(spark, "DROP PROCEDURE bp_get_rs")

    # in-proc refcursor: FETCH/CLOSE route via the variable's value;
    # NULL-named refcursor gets a generated name
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_rc_local")
    spark.sql("DROP TABLE IF EXISTS bp_rc_local_out")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_rc_local() AS $$\n"
        "DECLARE rc refcursor; v_i bigint;\n"
        "BEGIN\n"
        "  OPEN rc FOR SELECT id FROM range(5) ORDER BY id DESC;\n"
        "  FETCH rc INTO v_i;\n"
        "  CLOSE rc;\n"
        "  CREATE TABLE bp_rc_local_out USING parquet AS\n"
        "    SELECT v_i AS i, rc AS portal;\n"
        "END;\n$$",
    )
    execute_sql(spark, "CALL bp_rc_local()")
    r = spark.table("bp_rc_local_out").collect()[0]
    assert r.i == 4 and r.portal.startswith("bp_rc_")
    spark.sql("DROP TABLE bp_rc_local_out")
    execute_sql(spark, "DROP PROCEDURE bp_rc_local")
    # FETCH before OPEN refuses
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_rc_bad")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_rc_bad() AS $$\n"
        "DECLARE rc refcursor; v int;\nBEGIN\n  FETCH rc INTO v;\nEND;\n$$",
    )
    with pytest.raises(RuntimeError, match="has not been OPENed"):
        execute_sql(spark, "CALL bp_rc_bad()")
    execute_sql(spark, "DROP PROCEDURE bp_rc_bad")


def test_random_nested_scope_programs_match_python_interpreter(spark):
    """Differential fuzz for nested DECLARE blocks: seeded-random
    programs open inner scopes that declare v_s (possibly shadowing an
    enclosing v_s) initialized from the live outer state; the Spark
    interpreter and a direct Python interpretation must agree on the
    final variable state — pinning initializer order, shadowing, and
    scope restoration."""
    import random

    def gen(rng, depth=0, vs_ok=False):
        stmts = []
        names = ["v_a", "v_b"] + (["v_s"] if vs_ok else [])
        for _ in range(rng.randint(2, 4)):
            kind = rng.choice(
                ["assign", "assign", "scope", "if"]
                if depth < 2
                else ["assign"]
            )
            if kind == "assign":
                stmts.append(("assign", rng.choice(names),
                              rng.choice(["+", "*"]), rng.randint(1, 5)))
            elif kind == "if":
                stmts.append(("if", rng.choice(names),
                              gen(rng, depth + 1, vs_ok),
                              gen(rng, depth + 1, vs_ok)))
            else:
                stmts.append(("scope", rng.randint(1, 9),
                              gen(rng, depth + 1, True)))
        return stmts

    def render(stmts, ind="  "):
        out = []
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                out.append(f"{ind}{v} := ({v} {op} {c}) % 1000;")
            elif s[0] == "if":
                _, v, t, f = s
                out.append(f"{ind}IF {v} % 2 = 0 THEN")
                out.append(render(t, ind + "  "))
                out.append(f"{ind}ELSE")
                out.append(render(f, ind + "  "))
                out.append(f"{ind}END IF;")
            else:
                _, c, body = s
                out.append(f"{ind}DECLARE v_s int := (v_a + {c}) % 1000;")
                out.append(f"{ind}BEGIN")
                out.append(render(body, ind + "  "))
                out.append(f"{ind}  v_a := (v_a + v_s) % 1000;")
                out.append(f"{ind}END;")
        return "\n".join(out)

    def interp(stmts, env):
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                env[v] = (env[v] + c if op == "+" else env[v] * c) % 1000
            elif s[0] == "if":
                _, v, t, f = s
                interp(t if env[v] % 2 == 0 else f, env)
            else:
                _, c, body = s
                saved = env.get("v_s")
                env["v_s"] = (env["v_a"] + c) % 1000
                interp(body, env)
                env["v_a"] = (env["v_a"] + env["v_s"]) % 1000
                if saved is None:
                    env.pop("v_s", None)
                else:
                    env["v_s"] = saved

    spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz_scope")
    for seed in (5, 42, 101):
        rng = random.Random(seed)
        prog = gen(rng)
        env = {"v_a": 1, "v_b": 2}
        interp(prog, env)
        execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_fuzz_scope")
        execute_sql(
            spark,
            "CREATE PROCEDURE bp_fuzz_scope() AS $$\n"
            "DECLARE v_a int := 1; v_b int := 2;\n"
            "BEGIN\n"
            "CREATE TABLE IF NOT EXISTS bp_proc_fuzz_scope "
            "(a INT, b INT) USING parquet;\n"
            f"{render(prog)}\n"
            "INSERT INTO bp_proc_fuzz_scope SELECT v_a, v_b;\n"
            "END;\n$$",
        )
        execute_sql(spark, "CALL bp_fuzz_scope()")
        rows = [
            (r["a"], r["b"])
            for r in spark.table("bp_proc_fuzz_scope").collect()
        ]
        assert rows == [(env["v_a"], env["v_b"])], (seed, rows, env)
        spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz_scope")
        execute_sql(spark, "DROP PROCEDURE bp_fuzz_scope")


def test_alias_declarations_resolve_as_synonyms(spark):
    """``new ALIAS FOR $n|name`` (r14): aliases of IN args collapse to
    the argument's CALL substitution, aliases of variables read AND
    write through, and $n is 1-based over the full argument list."""
    from amazonredshift_blueprints_spark.functions.procedures import (
        call_procedure_returning,
    )

    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_alias")
    execute_sql(
        spark,
        "CREATE PROCEDURE bp_alias(p_mult IN int, res OUT int) AS $$\n"
        "DECLARE\n"
        "  factor ALIAS FOR $1;\n"
        "  v_acc int := 0;\n"
        "  acc ALIAS FOR v_acc;\n"
        "  acc2 ALIAS FOR acc;\n"
        "BEGIN\n"
        "  acc := acc + 10 * factor;\n"
        "  acc2 := acc2 + 1;\n"
        "  res := v_acc;\n"
        "END;\n$$",
    )
    n, res = call_procedure_returning(spark, "bp_alias", ["3"])
    assert n == 3
    assert res.collect()[0]["res"] == 31
    execute_sql(spark, "DROP PROCEDURE bp_alias")


def test_alias_refusals(spark):
    """Alias shadow/scope refusals: name collisions, $n out of range,
    unknown targets, nested DECLARE in either direction."""
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_alias_bad")

    def create(decls, body="  NULL;\n"):
        execute_sql(
            spark,
            "CREATE OR REPLACE PROCEDURE bp_alias_bad(p IN int) AS $$\n"
            f"DECLARE\n{decls}BEGIN\n{body}END;\n$$",
        )

    with pytest.raises(ValueError, match="collides"):
        create("  v_x int := 0;\n  v_x ALIAS FOR p;\n")
    with pytest.raises(ValueError, match="out of range"):
        create("  a2 ALIAS FOR $2;\n")
    with pytest.raises(ValueError, match="unknown name"):
        create("  a2 ALIAS FOR nope;\n")
    with pytest.raises(NotImplementedError, match="nested DECLARE"):
        create(
            "  a2 ALIAS FOR p;\n",
            "  DECLARE v_i int := a2; BEGIN NULL; END;\n",
        )
    with pytest.raises(NotImplementedError, match="nested DECLARE"):
        create(
            "  v_x int := 0;\n",
            "  DECLARE a2 ALIAS FOR v_x; BEGIN NULL; END;\n",
        )
    with pytest.raises(ValueError, match="cannot parse ALIAS"):
        create("  a2 ALIAS v_x;\n")
    # a DECLARE mentioned only inside -- or /* */ comments is NOT a
    # nested block (r14 advisor: the scan must strip comments first)
    create(
        "  a2 ALIAS FOR p;\n",
        "  -- DECLARE in a line comment\n"
        "  /* DECLARE inside a\n     block comment */\n"
        "  NULL;\n",
    )
    # block comments NEST in plpgsql: a DECLARE anywhere inside the
    # outermost /* */ — including after an inner close — is a comment
    create(
        "  a2 ALIAS FOR p;\n",
        "  /* outer /* DECLARE x int; */ DECLARE y int; */\n"
        "  NULL;\n",
    )
    execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_alias_bad")


def test_fuzz_records_cursors_scopes_exceptions(spark):
    """Differential fuzz, family 4 (r15 — VERDICT r14 item 6): seeded
    random programs mixing FOR-r-IN-query record loops, bound-cursor
    FETCH INTO RECORD drains inside nested DECLARE blocks, shadowing
    inner scopes, and EXCEPTION recovery — including raises that unwind
    THROUGH a nested DECLARE scope to an outer handler (the inner
    shadow must be discarded on the way out). The Spark interpreter and
    a direct Python interpretation (scope stack + exception propagation)
    must agree on the final variable state. Rows come from range(6) with
    v = k*k % 7, so every loop/fetch result is closed-form."""
    import random

    ROWS = [(k, (k * k) % 7) for k in range(6)]

    def matches(m, rm):
        return [(k, v) for k, v in ROWS if k % m == rm]

    def gen(rng, depth=0, in_try=False):
        stmts = []
        for _ in range(rng.randint(2, 4)):
            kinds = ["assign", "assign"]
            if depth < 2:
                kinds += ["forq", "cursor", "shadow", "exc"]
                if in_try:
                    kinds.append("shadow_raise")
            kind = rng.choice(kinds)
            if kind == "assign":
                stmts.append(("assign", rng.choice(["v_a", "v_b"]),
                              rng.choice(["+", "*"]), rng.randint(1, 5)))
            elif kind == "forq":
                m = rng.choice([1, 2, 3])
                rm = rng.randrange(m)
                stmts.append(("forq", m, rm, gen(rng, depth + 1, in_try)))
            elif kind == "cursor":
                m = rng.choice([1, 2, 3])
                rm = rng.randrange(m)
                nf = rng.randint(1, len(matches(m, rm)))
                stmts.append(("cursor", m, rm, nf))
            elif kind == "shadow":
                stmts.append(("shadow", rng.randint(1, 9),
                              gen(rng, depth + 1, in_try)))
            elif kind == "shadow_raise":
                stmts.append(("shadow_raise", rng.randint(1, 9),
                              rng.choice(["v_a", "v_b"]), rng.randint(0, 2)))
            else:
                stmts.append(("exc", gen(rng, depth + 1, True),
                              rng.choice(["v_a", "v_b"]), rng.randint(0, 2),
                              gen(rng, depth + 1, in_try)))
        return stmts

    Q = ("SELECT id AS k, (id * id) % 7 AS v FROM range(6) "
         "WHERE id % {m} = {rm} ORDER BY id")

    def render(stmts, ind="  "):
        out = []
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                out.append(f"{ind}{v} := ({v} {op} {c}) % 1000;")
            elif s[0] == "forq":
                _, m, rm, body = s
                out.append(f"{ind}FOR r IN {Q.format(m=m, rm=rm)} LOOP")
                out.append(f"{ind}  v_a := (v_a + r.k + r.v) % 1000;")
                out.append(render(body, ind + "  "))
                out.append(f"{ind}END LOOP;")
            elif s[0] == "cursor":
                _, m, rm, nf = s
                out.append(f"{ind}DECLARE")
                out.append(f"{ind}  c CURSOR FOR {Q.format(m=m, rm=rm)};")
                out.append(f"{ind}  rc RECORD;")
                out.append(f"{ind}BEGIN")
                out.append(f"{ind}  OPEN c;")
                for _ in range(nf):
                    out.append(f"{ind}  FETCH c INTO rc;")
                    out.append(
                        f"{ind}  v_b := (v_b + rc.k * 2 + rc.v) % 1000;"
                    )
                out.append(f"{ind}  CLOSE c;")
                out.append(f"{ind}END;")
            elif s[0] == "shadow":
                _, init, body = s
                out.append(f"{ind}DECLARE v_b int := {init};")
                out.append(f"{ind}BEGIN")
                out.append(f"{ind}  v_b := (v_b + 5) % 1000;")
                out.append(render(body, ind + "  "))
                out.append(f"{ind}END;")
            elif s[0] == "shadow_raise":
                _, init, v, mm = s
                out.append(f"{ind}DECLARE v_b int := {init};")
                out.append(f"{ind}BEGIN")
                out.append(f"{ind}  v_b := (v_b + {v}) % 1000;")
                out.append(f"{ind}  IF {v} % 3 = {mm} THEN")
                out.append(f"{ind}    RAISE EXCEPTION 'fz4 %', {v};")
                out.append(f"{ind}  END IF;")
                out.append(f"{ind}  v_a := (v_a + v_b) % 1000;")
                out.append(f"{ind}END;")
            else:
                _, t, v, mm, h = s
                out.append(f"{ind}BEGIN")
                out.append(render(t, ind + "  "))
                out.append(f"{ind}  IF {v} % 3 = {mm} THEN")
                out.append(f"{ind}    RAISE EXCEPTION 'fz4 %', {v};")
                out.append(f"{ind}  END IF;")
                out.append(f"{ind}EXCEPTION WHEN OTHERS THEN")
                out.append(render(h, ind + "  "))
                out.append(f"{ind}END;")
        return "\n".join(out)

    def get(env, v):
        for d in reversed(env):
            if v in d:
                return d[v]
        raise KeyError(v)

    def setv(env, v, val):
        for d in reversed(env):
            if v in d:
                d[v] = val
                return
        raise KeyError(v)

    def interp(stmts, env):
        for s in stmts:
            if s[0] == "assign":
                _, v, op, c = s
                cur = get(env, v)
                setv(env, v, (cur + c if op == "+" else cur * c) % 1000)
            elif s[0] == "forq":
                _, m, rm, body = s
                for k, v in matches(m, rm):
                    setv(env, "v_a", (get(env, "v_a") + k + v) % 1000)
                    interp(body, env)
            elif s[0] == "cursor":
                _, m, rm, nf = s
                for k, v in matches(m, rm)[:nf]:
                    setv(env, "v_b",
                         (get(env, "v_b") + k * 2 + v) % 1000)
            elif s[0] == "shadow":
                _, init, body = s
                env.append({"v_b": init})
                try:
                    setv(env, "v_b", (get(env, "v_b") + 5) % 1000)
                    interp(body, env)
                finally:
                    env.pop()
            elif s[0] == "shadow_raise":
                _, init, v, mm = s
                env.append({"v_b": init})
                try:
                    setv(env, "v_b",
                         (get(env, "v_b") + get(env, v)) % 1000)
                    if get(env, v) % 3 == mm:
                        raise RuntimeError("fz4")
                    setv(env, "v_a",
                         (get(env, "v_a") + get(env, "v_b")) % 1000)
                finally:
                    env.pop()
            else:
                _, t, v, mm, h = s
                try:
                    interp(t, env)
                    if get(env, v) % 3 == mm:
                        raise RuntimeError("fz4")
                except RuntimeError:
                    interp(h, env)

    from amazonredshift_blueprints_spark.sqlrun import execute_sql

    spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz4")
    n_cases = 0
    for seed in (5, 17, 41, 63, 88, 123):
        rng = random.Random(seed)
        prog = gen(rng)
        env = [{"v_a": 1, "v_b": 2}]
        interp(prog, env)
        body = render(prog)
        execute_sql(spark, "DROP PROCEDURE IF EXISTS bp_fuzz4")
        execute_sql(
            spark,
            "CREATE PROCEDURE bp_fuzz4() AS $$\n"
            "DECLARE v_a int := 1; v_b int := 2;\n"
            "BEGIN\n"
            "CREATE TABLE IF NOT EXISTS bp_proc_fuzz4 "
            "(a INT, b INT) USING parquet;\n"
            f"{body}\n"
            "INSERT INTO bp_proc_fuzz4 SELECT v_a, v_b;\n"
            "END;\n$$",
        )
        execute_sql(spark, "CALL bp_fuzz4()")
        rows = [
            (r["a"], r["b"]) for r in spark.table("bp_proc_fuzz4").collect()
        ]
        assert rows == [(env[0]["v_a"], env[0]["v_b"])], (seed, rows, env)
        spark.sql("DROP TABLE IF EXISTS bp_proc_fuzz4")
        execute_sql(spark, "DROP PROCEDURE bp_fuzz4")
        n_cases += 1
    assert n_cases == 6
