"""Structured Streaming parity: the streaming session/window aggs must
equal their batch twins after consuming all input (availableNow)."""

from __future__ import annotations

import datetime
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


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg under a 1h watermark: a row arriving after
    its window was finalized is discarded, not double-counted."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazonredshift_blueprints_spark.streaming.sessions import stream_window_counts

    d = tmp_path / "late_events"
    d.mkdir()

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
        # micros, not pandas' ns default: the session reads parquet nanos
        # as bigint (nanosAsLong), which would clash with the declared
        # timestamp schema
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), d / name)

    # batch 0: one event in the 01:00 window, one at 10:00 that advances
    # the watermark to 09:00
    write("a.parquet", [(1, "2024-01-01 01:10:00", 1, "click", 1.0),
                        (2, "2024-01-01 10:00:00", 1, "click", 1.0)])
    _time.sleep(1.1)  # distinct mtimes → file-source processes in order
    # batch 1: fresh event; end of this batch finalizes (emits + evicts)
    # the 01:00 window under the 09:00 watermark
    write("b.parquet", [(3, "2024-01-01 11:00:00", 1, "click", 1.0)])
    _time.sleep(1.1)
    # batch 2: a 01:20 straggler, now behind the watermark AND behind the
    # evicted window → dropped (the drop guarantee applies once the state
    # is finalized, i.e. one batch after the watermark passes)
    write("c.parquet", [(4, "2024-01-01 01:20:00", 1, "click", 1.0),
                        (5, "2024-01-01 12:00:00", 1, "click", 1.0)])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d))
    )
    q = (
        stream_window_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.window_start: r.n_events
        for r in spark.sql("SELECT * FROM t_late").collect()
    }
    early = [v for k, v in got.items() if k.hour == 1]
    assert early == [1], f"late row not dropped (or double-emitted): {got}"
    assert got.get(datetime.datetime(2024, 1, 1, 10, 0)) == 1


def test_foreachbatch_streaming_merge(spark, sf_dir, tmp_path):
    """Streaming upsert: each micro-batch MERGEs into a managed table via
    dml.merge_into — the foreachBatch pattern for continuously-updated
    serving tables. Final table must equal the batch last-value-per-user
    aggregate regardless of batch boundaries."""
    import os as _os

    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.dml import merge_into
    from amazonredshift_blueprints_spark.ingest import _clean_stale_location
    from amazonredshift_blueprints_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    # split events into two "arrival" files to force multiple batches
    d = tmp_path / "merge_stream"
    e.filter(F.col("event_id") % 2 == 0).write.parquet(str(d / "a"))
    e.filter(F.col("event_id") % 2 == 1).write.parquet(str(d / "b"))
    src = str(d)

    _clean_stale_location(spark, "t_stream_state", None)
    spark.createDataFrame([], "user_id long, last_event_id long").write.saveAsTable(
        "t_stream_state"
    )

    schema = spark.read.parquet(str(d / "a")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )

    def upsert(batch_df, batch_id):
        latest = batch_df.groupBy("user_id").agg(
            F.max("event_id").alias("last_event_id")
        )
        # keep the max across batches: merge only rows that advance
        cur = batch_df.sparkSession.table("t_stream_state")
        advancing = (
            latest.alias("n")
            .join(cur.alias("c"), "user_id", "left")
            .filter(
                F.col("c.last_event_id").isNull()
                | (F.col("n.last_event_id") > F.col("c.last_event_id"))
            )
            .select("user_id", F.col("n.last_event_id").alias("last_event_id"))
        )
        merge_into(
            batch_df.sparkSession, "t_stream_state", advancing, keys=["user_id"]
        )

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r.user_id: r.last_event_id for r in spark.table("t_stream_state").collect()
    }
    want = {
        r.user_id: r.m
        for r in e.groupBy("user_id").agg(F.max("event_id").alias("m")).collect()
    }
    assert got == want
    spark.sql("DROP TABLE t_stream_state")


def test_stream_dropduplicates_within_watermark(spark, sf_dir, tmp_path):
    """Streaming exactly-once dedup: duplicate event_ids across
    micro-batches collapse to one row via watermarked dropDuplicates."""
    import os as _os

    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.session import load_table

    e = load_table(spark, sf_dir, "events").limit(200).cache()
    d = tmp_path / "dup_stream"
    # same 200 events written twice → two batches of pure duplicates
    e.write.parquet(str(d / "a"))
    e.write.parquet(str(d / "b"))

    schema = spark.read.parquet(str(d / "a")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM t_dedup_stream").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)) == e.count()  # each id exactly once


def test_stream_dedup_matches_batch_distinct(spark, sf_dir, events_stream_dir, tmp_path):
    """Duplicate the whole input file: the streaming dedup must emit each
    event_id exactly once, matching batch dropDuplicates."""
    import shutil as _shutil

    from amazonredshift_blueprints_spark.streaming.sessions import (
        read_events_stream,
        stream_dedup_events,
    )

    dup_dir = tmp_path / "events_dup"
    dup_dir.mkdir()
    src = os.path.join(sf_dir, "events.parquet")
    _shutil.copy(src, dup_dir / "part-0.parquet")
    _shutil.copy(src, dup_dir / "part-1.parquet")  # every event twice

    raw_schema = spark.read.parquet(src).schema
    stream = read_events_stream(spark, str(dup_dir), raw_schema)
    q = (
        stream_dedup_events(stream)
        .writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_stream_dedup").groupBy("event_id").count().collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert len(got) == n_events          # every event represented
    assert all(r["count"] == 1 for r in got)  # exactly once


def test_stream_static_join_matches_batch(spark, sf_dir, events_stream_dir):
    from amazonredshift_blueprints_spark.streaming.sessions import stream_enrich_events

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    cust = load_table(spark, sf_dir, "customer")
    name = "t_enrich"
    q = (
        stream_enrich_events(stream, cust)
        .select("event_id", "c_mktsegment")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["event_id"], r["c_mktsegment"]) for r in spark.table(name).collect()}
    e = load_table(spark, sf_dir, "events")
    want = {
        (r["event_id"], r["c_mktsegment"])
        for r in e.join(
            cust, e["user_id"] == cust["c_custkey"]
        ).select("event_id", "c_mktsegment").collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_attribution_matches_batch(spark, sf_dir, events_stream_dir):
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.streaming.sessions import (
        stream_attribution_join,
    )

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    name = "t_attr"
    q = (
        stream_attribution_join(stream, within_minutes=360)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["first_id"], r["then_id"]) for r in spark.table(name).collect()
    }
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("first_ts"), F.col("event_id").alias("first_id")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("ts").alias("then_ts"),
        F.col("event_id").alias("then_id"),
    )
    want = {
        (r["first_id"], r["then_id"])
        for r in a.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("then_ts") >= F.col("first_ts"))
            & (F.col("then_ts") <= F.col("first_ts") + F.expr("INTERVAL 360 MINUTES")),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_join_under_rocksdb_state_store(spark, sf_dir, events_stream_dir):
    """The at-scale state store: the same watermarked stream-stream join
    must produce identical results with state routed through RocksDB
    (disk-backed, bounded memory) instead of the default heap-backed
    provider — the provider is a storage swap, never a semantics change.
    Also pins that enable_rocksdb_state_store actually takes effect
    (asserted via the query's lastProgress state operator custom
    metrics, which only RocksDB emits)."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.streaming.sessions import (
        ROCKSDB_STATE_PROVIDER,
        await_finished,
        enable_rocksdb_state_store,
        stream_attribution_join,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    enable_rocksdb_state_store(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_STATE_PROVIDER
        )
        raw_schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        stream = read_events_stream(spark, events_stream_dir, raw_schema)
        name = "t_attr_rocksdb"
        q = (
            stream_attribution_join(stream, within_minutes=360)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_finished(q, 120)
        progress = q.lastProgress
        ops = progress["stateOperators"] if progress else []
        assert any(
            "rocksdb" in k.lower()
            for op in ops
            for k in (op.get("customMetrics") or {})
        ), f"RocksDB metrics absent from state operators: {ops}"

        got = {
            (r["first_id"], r["then_id"])
            for r in spark.table(name).collect()
        }
        e = load_table(spark, sf_dir, "events")
        a = e.filter(F.col("event_type") == "view").select(
            "user_id",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_id"),
        )
        b = e.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("u2"),
            F.col("ts").alias("then_ts"),
            F.col("event_id").alias("then_id"),
        )
        want = {
            (r["first_id"], r["then_id"])
            for r in a.join(
                b,
                (F.col("user_id") == F.col("u2"))
                & (F.col("then_ts") >= F.col("first_ts"))
                & (
                    F.col("then_ts")
                    <= F.col("first_ts") + F.expr("INTERVAL 360 MINUTES")
                ),
            ).collect()
        }
        assert got == want and len(got) > 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_await_finished_raises_on_timeout(spark, sf_dir, events_stream_dir, tmp_path):
    """A query that cannot finish within the bound must raise a clear
    TimeoutError (and be stopped), never hand back a partial sink."""
    from amazonredshift_blueprints_spark.streaming.sessions import await_finished

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    # processingTime trigger never self-terminates -> guaranteed timeout
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt_timeout"))
        .trigger(processingTime="10 seconds")
        .start()
    )
    with pytest.raises(TimeoutError, match="did not finish"):
        await_finished(q, 1)
    assert not q.isActive  # stopped, not left as a zombie


def test_stream_hopping_window_matches_batch(spark, sf_dir, events_stream_dir):
    """Hopping-window streaming rollup (6h window / 3h slide) over the
    whole fixture must equal the batch hopping aggregate — every event
    in exactly two windows."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.streaming.sessions import (
        await_finished,
        stream_window_counts,
    )

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema)
    name = "t_hop"
    q = (
        stream_window_counts(stream, slide="3 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q, 120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table(name).collect()
    }
    e = load_table(spark, sf_dir, "events")
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in e.groupBy(
            F.window("ts", "6 hours", "3 hours"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
        .collect()
    }
    assert got == want and len(got) > 0
    # overlap sanity: total windowed mass is exactly 2x the event count
    assert sum(got.values()) == 2 * e.count()


def test_stateful_topk_k2_custom_user_col(spark, sf_dir, events_stream_dir):
    """The top-k output schema must derive from (user_col, k): k=2 with a
    renamed grouping column emits (uid, n_seen, top1_q, top2_q) and the
    values match the batch top-2 — the k!=3 / non-default-name case that
    a hardcoded schema string broke."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.streaming.sessions import (
        stateful_topk_values,
        topk_output_schema,
    )

    assert topk_output_schema("uid", 2) == "uid long, n_seen long, top1_q long, top2_q long"

    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    stream = read_events_stream(spark, events_stream_dir, raw_schema).withColumnRenamed(
        "user_id", "uid"
    )
    q = (
        stateful_topk_values(stream, user_col="uid", k=2)
        .writeStream.format("memory")
        .queryName("t_topk2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("t_topk2")
    assert out.columns == ["uid", "n_seen", "top1_q", "top2_q"]
    # n_seen is monotone: keep each user's final emission, compare to batch
    got = {
        r["uid"]: (r["top1_q"], r["top2_q"])
        for r in out.groupBy("uid")
        .agg(
            F.max_by("top1_q", "n_seen").alias("top1_q"),
            F.max_by("top2_q", "n_seen").alias("top2_q"),
        )
        .collect()
    }
    e = load_table(spark, sf_dir, "events").withColumn(
        "q", F.round(F.col("value") * 1_000_000).cast("long")
    )
    want = {
        r["user_id"]: (r["tops"][0], r["tops"][1] if len(r["tops"]) > 1 else None)
        for r in e.groupBy("user_id")
        .agg(F.reverse(F.array_sort(F.collect_list("q"))).alias("all"))
        .select("user_id", F.slice("all", 1, 2).alias("tops"))
        .collect()
    }
    assert got == want


def test_transform_with_state_probe_gates_on_protobuf():
    """The API-selection probe (VERDICT r9 #8): in this container
    google.protobuf is absent, so the probe must pick the
    applyInPandasWithState fallback — and c65's oracle row stays green
    through it (the parametrized catalog mirror covers that). If the
    container ever gains protobuf, the probe flips and the same state
    machine runs on transformWithStateInPandas."""
    from amazonredshift_blueprints_spark.streaming.sessions import (
        transform_with_state_available,
    )

    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False
    assert transform_with_state_available() == has_protobuf


def test_stream_dedup_rollup_additive_across_batches(spark, sf_dir):
    """c95's pipeline with the fixture time-split into TWO micro-batches
    (disjoint halves, no cross-batch duplicates): the second batch must
    ADD into the first's rollup rows through the copy-on-write rewrite,
    and the final table equals the batch aggregate."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.ingest import _clean_stale_location
    from amazonredshift_blueprints_spark.session import load_table
    from amazonredshift_blueprints_spark.streaming.sessions import (
        read_events_stream,
        stream_dedup_rollup_into,
    )

    src = os.path.join(sf_dir, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    d = tempfile.mkdtemp(prefix="bp_rollup_split_")
    t = pq.read_table(src)
    ts_i = pc.cast(t.column("ts"), "int64")
    mm = pc.min_max(ts_i).as_py()
    mid = mm["min"] + (mm["max"] - mm["min"]) // 2
    early = pc.less(ts_i, mid)
    pq.write_table(t.filter(early), os.path.join(d, "part-0.parquet"))
    pq.write_table(t.filter(pc.invert(early)), os.path.join(d, "part-1.parquet"))
    now = os.path.getmtime(os.path.join(d, "part-1.parquet"))
    os.utime(os.path.join(d, "part-0.parquet"), (now - 60, now - 60))

    tbl = "bp_rollup_split_tbl"
    _clean_stale_location(spark, tbl, None)
    stream = read_events_stream(spark, d, raw_schema, max_files_per_trigger=1)
    stream_dedup_rollup_into(stream, tbl)

    want = {
        (r["bucket"], r["user_id"]): (r["n"], r["s"])
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("s"),
        )
        .collect()
    }
    got = {
        (r["bucket"], r["user_id"]): (r["n_events"], r["value_q_sum"])
        for r in spark.table(tbl).collect()
    }
    assert got == want
    spark.sql(f"DROP TABLE {tbl}")


def test_rollup_batch_replay_is_byte_identical(spark):
    """Replay idempotence (r10 verdict item 4): re-applying an already
    applied micro-batch (same batch id — the Structured Streaming
    restart replay) leaves the rollup table BYTE-IDENTICAL, while a new
    batch id still adds. Drives the module-level apply_rollup_batch the
    foreachBatch closure wraps."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.ingest import _clean_stale_location
    from amazonredshift_blueprints_spark.streaming.sessions import (
        _applied_marker,
        apply_rollup_batch,
    )

    tbl = "bp_rollup_replay_tbl"
    for t in (tbl, _applied_marker(tbl)):
        _clean_stale_location(spark, t, None)
    batch = spark.createDataFrame(
        [("2026-01-01 10:00:00", 1, 100), ("2026-01-01 10:00:00", 2, 50)],
        "bucket string, user_id long, value_q long",
    ).withColumn("bucket", F.to_timestamp("bucket"))
    try:
        assert apply_rollup_batch(spark, tbl, batch, 0, "runA") is True
        snap = sorted(map(tuple, spark.table(tbl).collect()))
        # replay of batch 0 (same run): recognized, skipped, no change
        assert apply_rollup_batch(spark, tbl, batch, 0, "runA") is False
        assert sorted(map(tuple, spark.table(tbl).collect())) == snap
        # a NEW batch id with the same rows is a real second batch: adds
        assert apply_rollup_batch(spark, tbl, batch, 1, "runA") is True
        got = {
            (r["user_id"]): (r["n_events"], r["value_q_sum"])
            for r in spark.table(tbl).collect()
        }
        assert got == {1: (2, 200), 2: (2, 100)}
        # and replaying batch 1 is again a no-op
        assert apply_rollup_batch(spark, tbl, batch, 1, "runA") is False
        assert spark.table(_applied_marker(tbl)).count() == 2
        # batch id 0 from a DIFFERENT run is NOT a replay: Spark batch
        # ids restart per checkpoint lineage, so a fresh run's batch 0
        # must apply (the token is what disambiguates)
        assert apply_rollup_batch(spark, tbl, batch, 0, "runB") is True
        assert spark.table(_applied_marker(tbl)).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {_applied_marker(tbl)}")


def test_stateful_ewma_crosses_batch_boundary(spark, tmp_path):
    """Two time-split files as two micro-batches: the per-user EWMA
    state must carry across the boundary and equal the batch fold."""
    import datetime as dt
    import os

    from amazonredshift_blueprints_spark.operators.timeseries import ewma_fold
    from amazonredshift_blueprints_spark.streaming.sessions import (
        await_finished,
        read_events_stream,
        stateful_ewma,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, float(v))
        for i, v in enumerate([1.00, 2.01, 0.20, 5.00, 0.40])
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    d = str(tmp_path / "ewma_src")
    os.makedirs(d)
    for i, pred in enumerate(["event_id < 3", "event_id >= 3"]):
        sub = df.filter(pred).coalesce(1)
        tmp = str(tmp_path / f"w{i}")
        sub.write.mode("overwrite").parquet(tmp)
        import glob as g
        import shutil as sh

        src = g.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(d, f"part-{i}.parquet")
        sh.copy(src, dst)
        os.utime(dst, (1700000000 + i * 100,) * 2)
    schema = spark.read.parquet(os.path.join(d, "part-0.parquet")).schema
    stream = read_events_stream(spark, d, schema, max_files_per_trigger=1)
    q = (
        stateful_ewma(stream)
        .writeStream.format("memory")
        .queryName("t_ewma_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    await_finished(q)
    got = spark.sql(
        "SELECT n_events, ewma_q, n_spikes FROM t_ewma_stream "
        "ORDER BY n_events DESC LIMIT 1"
    ).collect()[0]
    want = ewma_fold(df, "user_id", "ts", "event_id", "value").collect()[0]
    assert (got["n_events"], got["ewma_q"], got["n_spikes"]) == (
        want["n_events"], want["ewma_q"], want["n_spikes"],
    )
    # two micro-batches really happened: update mode emitted twice
    assert spark.table("t_ewma_stream").count() == 2


def test_ohlc_batch_merge_is_order_independent_and_replay_safe(spark):
    """OHLC bar state is order-sensitive data under an order-FREE merge:
    applying the LATER half of a day before the earlier half must still
    yield the true open/close (endpoint structs decide, not arrival);
    replaying an applied batch is a byte-identical no-op."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.ingest import _clean_stale_location
    from amazonredshift_blueprints_spark.streaming.sessions import (
        _applied_marker,
        apply_ohlc_batch,
    )

    tbl = "bp_ohlc_merge_tbl"
    for t in (tbl, _applied_marker(tbl)):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _clean_stale_location(spark, t, None)

    def batch(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string, tie long, value_q long"
        ).withColumn("ts", F.to_timestamp("ts"))

    # afternoon slice arrives FIRST
    pm = batch([
        (1, "2026-01-01 15:00:00", 3, 700),
        (1, "2026-01-01 18:00:00", 4, 100),  # true close
    ])
    am = batch([
        (1, "2026-01-01 09:00:00", 1, 300),  # true open
        (1, "2026-01-01 10:00:00", 2, 900),  # true high
    ])
    try:
        assert apply_ohlc_batch(spark, tbl, pm, 0, "run") is True
        assert apply_ohlc_batch(spark, tbl, am, 1, "run") is True
        rows = spark.table(tbl).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["open_q"], r["close_q"]) == (300, 100)
        assert (r["high_q"], r["low_q"], r["n"], r["sum_q"]) == (
            900, 100, 4, 2000,
        )
        # replay of batch 1: recognized and skipped, table unchanged
        snap = sorted(map(tuple, rows))
        assert apply_ohlc_batch(spark, tbl, am, 1, "run") is False
        assert sorted(map(tuple, spark.table(tbl).collect())) == snap
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {_applied_marker(tbl)}")
