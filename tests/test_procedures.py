"""Stored-procedure face (functions/procedures.py): CREATE/CALL/DROP
lifecycle, named-argument substitution rules, and the honest refusals
of the out-of-subset forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with siblings)

from amazonredshift_blueprints_spark.functions.procedures import (
    _parse_create,
    create_procedure,
    substitute_call,
)
from amazonredshift_blueprints_spark.sqlrun import (
    execute_sql,
    execute_sql_script,
)


def test_parse_create_handles_typed_args_and_tagged_body():
    replace, name, args, body = _parse_create(
        "CREATE OR REPLACE PROCEDURE sp.upd(f1 int, f2 varchar(20))\n"
        "AS $body$ UPDATE t SET a = f1 WHERE b = f2; $body$ "
        "LANGUAGE plpgsql;"
    )
    assert replace and name == "sp.upd"
    assert args == [("f1", "int"), ("f2", "string")]
    assert body == "UPDATE t SET a = f1 WHERE b = f2;"


def test_parse_create_strips_block_but_not_transaction_begin():
    # plpgsql BEGIN...END block wrapper: stripped
    _, _, _, body = _parse_create(
        "CREATE PROCEDURE p() AS $$ BEGIN SELECT 1; SELECT 2; END; $$"
    )
    assert body == "SELECT 1; SELECT 2;"
    # transaction-control `BEGIN;` is a statement, not a block
    _, _, _, body = _parse_create(
        "CREATE PROCEDURE p() AS $$ BEGIN; SELECT 1; COMMIT; $$"
    )
    assert body.startswith("BEGIN;")


def test_parse_create_refusals():
    with pytest.raises(NotImplementedError, match="INOUT"):
        _parse_create("CREATE PROCEDURE p(x INOUT int) AS $$ SELECT 1 $$")
    with pytest.raises(NotImplementedError, match="procedural"):
        _parse_create(
            "CREATE PROCEDURE p() AS $$ DECLARE v int; BEGIN SELECT 1; "
            "END; $$"
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
