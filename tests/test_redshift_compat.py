"""Dialect shim unit tests (no Spark needed)."""

from amazonredshift_blueprints_spark.functions import translate_redshift_sql


def test_getdate():
    assert translate_redshift_sql("SELECT GETDATE()") == "SELECT current_timestamp()"


def test_datediff_day_arg_order():
    out = translate_redshift_sql("SELECT DATEDIFF(day, a, b) FROM t")
    assert "datediff(CAST((b) AS DATE), CAST((a) AS DATE))" in out


def test_datediff_nested_exprs():
    out = translate_redshift_sql(
        "SELECT DATEDIFF(month, date_trunc('day', x), f(y, z)) FROM t"
    )
    assert "year(f(y, z)) * 12" in out
    assert "year(date_trunc('day', x)) * 12" in out


def test_datediff_unit_aliases():
    out = translate_redshift_sql("SELECT DATEDIFF('days', a, b)")
    assert "datediff(CAST((b) AS DATE)" in out


def test_spark_two_arg_datediff_untouched():
    sql = "SELECT datediff(b, a) FROM t"
    assert translate_redshift_sql(sql) == sql


def test_approximate_count_distinct():
    out = translate_redshift_sql("SELECT APPROXIMATE COUNT(DISTINCT x) FROM t")
    assert "approx_count_distinct(x)" in out


def test_string_literal_not_rewritten():
    sql = "SELECT 'DATEDIFF(day, a, b)' AS s"
    assert translate_redshift_sql(sql) == sql
