"""Pandas-UDF surface vs NumPy / built-in aggregates at sf0.001."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from amazonredshift_blueprints_spark.functions.udfs import (
    QUANT,
    embedding_norms,
    user_event_stats,
)
from amazonredshift_blueprints_spark.session import load_table


def test_embedding_norms_match_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    got = {r["vec_id"]: r["l2_norm_q"] for r in embedding_norms(e).collect()}
    for r in e.collect():
        q = np.round(np.asarray(r["embedding"], dtype=np.float64) * QUANT).astype(np.int64)
        assert got[r["vec_id"]] == float(np.sqrt(float(q @ q)))


def test_user_event_stats_match_builtin_agg(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    got = {r["user_id"]: r for r in user_event_stats(e).collect()}
    want = (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * QUANT).cast("long")).alias("s"),
        )
        .collect()
    )
    assert len(got) == len(want)
    for r in want:
        g = got[r["user_id"]]
        assert g["n_events"] == r["n"]
        assert g["sum_value_q"] == r["s"]
        assert g["mean_value"] == (r["s"] / QUANT) / r["n"]
