"""Structured Streaming parity: the streaming session/window aggs must
equal their batch twins after consuming all input (availableNow)."""

from __future__ import annotations

import os
import shutil

import pytest

from amazonredshift_blueprints_spark.operators.sessions import session_window_agg
from amazonredshift_blueprints_spark.session import load_table
from amazonredshift_blueprints_spark.streaming.sessions import (
    read_events_stream,
    stream_session_counts,
    stream_window_counts,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    src = os.path.join(sf_dir, "events.parquet")
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(src, d / "part-0.parquet")
    return str(d)


def _run_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_sessions_match_batch(spark, sf_dir, events_stream_dir):
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    got = _run_to_memory(
        spark, stream_session_counts(stream, gap_minutes=30), "t_sessions"
    ).collect()
    batch = session_window_agg(
        load_table(spark, sf_dir, "events"), gap_minutes=30
    ).collect()
    got_m = {(r["user_id"], r["session_start"]): r["n_events"] for r in got}
    want_m = {(r["user_id"], r["session_start"]): r["n_events"] for r in batch}
    assert got_m == want_m


def test_stateful_user_counts_match_batch(spark, sf_dir, events_stream_dir):
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.streaming.sessions import stateful_user_counts

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    q = (
        stateful_user_counts(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("t_stateful")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("sum_value_q").alias("s"))
        .collect()
    )
    e = load_table(spark, sf_dir, "events")
    batch = (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("s"),
        )
        .collect()
    )
    got_m = {r["user_id"]: (r["n"], r["s"]) for r in got}
    want_m = {r["user_id"]: (r["n"], r["s"]) for r in batch}
    assert got_m == want_m


def test_stream_window_counts_match_batch(spark, sf_dir, events_stream_dir):
    from pyspark.sql import functions as F

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    got = _run_to_memory(
        spark, stream_window_counts(stream, window="6 hours"), "t_windows"
    ).collect()
    e = load_table(spark, sf_dir, "events")
    batch = (
        e.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
        .collect()
    )
    got_m = {(r["window_start"], r["event_type"]): r["n_events"] for r in got}
    want_m = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch}
    assert got_m == want_m
