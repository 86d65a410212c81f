"""JDBC option plumbing (sources/jdbc.py): URL parity with the
reference's create_connection_url, reader/writer configuration. No live
endpoint — the driver jar is absent, so .load()/.save() are not called."""

from __future__ import annotations

import pytest

from amazonredshift_blueprints_spark.sources import (
    jdbc_reader,
    jdbc_writer,
    redshift_jdbc_options,
)


def test_options_url_parity():
    opts = redshift_jdbc_options("h.example", "dev", "u", "pw")
    assert opts["url"] == "jdbc:redshift://h.example:5439/dev"  # default port 5439
    opts = redshift_jdbc_options("h", "db", "u", "pw", port=5555, ssl="true")
    assert opts["url"] == "jdbc:redshift://h:5555/db"
    assert opts["ssl"] == "true"


def test_reader_requires_exactly_one_source(spark):
    opts = redshift_jdbc_options("h", "db", "u", "pw")
    with pytest.raises(ValueError):
        jdbc_reader(spark, opts)
    with pytest.raises(ValueError):
        jdbc_reader(spark, opts, table="t", query="SELECT 1")


def test_reader_partition_options_all_or_none(spark):
    opts = redshift_jdbc_options("h", "db", "u", "pw")
    with pytest.raises(ValueError):
        jdbc_reader(spark, opts, table="t", partition_column="id")
    r = jdbc_reader(
        spark, opts, table="t",
        partition_column="id", lower_bound=0, upper_bound=100, num_partitions=8,
    )
    assert r is not None  # fully-specified partitioned reader configures


def test_writer_mode_vocabulary(spark, sf_dir):
    from amazonredshift_blueprints_spark.session import load_table

    df = load_table(spark, sf_dir, "region")
    opts = redshift_jdbc_options("h", "db", "u", "pw")
    for ref_mode in ("fail", "replace", "append"):
        w = jdbc_writer(df, opts, "t", mode=ref_mode)
        assert w is not None
