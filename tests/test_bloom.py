"""Bloom join-pruning operator: superset guarantee + sizing guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazonredshift_blueprints_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_prune,
)


def test_bloom_no_false_negatives_and_low_fp(spark):
    small = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    big = spark.range(0, 50_000).select(F.col("id").alias("k"))
    pruned = bloom_semi_prune(big, small, "k", "k")
    kept = {r["k"] for r in pruned.collect()}
    members = {i * 7 for i in range(500) if i * 7 < 50_000}
    assert members <= kept  # Bloom never drops a true member
    fp = (len(kept) - len(members)) / (50_000 - len(members))
    assert fp < 0.01, fp  # 2^17 bits / 500 keys -> far below 1%


def test_bloom_pruned_join_equals_plain_join(spark):
    """The whole contract: join-after-prune == plain join (false
    positives removed by the join, false negatives impossible)."""
    dim = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    ).filter(F.col("grp") == 2)
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    plain = fact.join(dim, "k").agg(F.sum("v").alias("s")).collect()[0]["s"]
    pruned = (
        bloom_semi_prune(fact, dim, "k", "k")
        .join(dim, "k")
        .agg(F.sum("v").alias("s"))
        .collect()[0]["s"]
    )
    assert pruned == plain


def test_bloom_build_validates_params(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "k", n_bits=100)
    with pytest.raises(ValueError, match="n_hashes"):
        bloom_build(df, "k", n_hashes=0)


def test_bloom_membership_bit63(spark):
    """Bit 63 is the sign bit of a long — the mask table's negative
    entry must still test correctly (a shift-overflow bug would corrupt
    exactly this bit)."""
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = bloom_build(df, "k", n_bits=64, n_hashes=1)  # 1 word, saturates
    assert words[0] == -1  # all 64 bits set, incl. the sign bit
    got = (
        spark.range(0, 100)
        .select(F.col("id").alias("k"))
        .filter(bloom_might_contain("k", words, n_hashes=1))
        .count()
    )
    assert got == 100  # everything "maybe" in a saturated filter


def test_kmv_overlap_accuracy_and_exact_smallside(spark, sf_dir):
    """At sf0.001 both key sets exceed k=64, so the estimator path
    runs; estimates must land within the O(1/sqrt(k)) band of exact.
    With k larger than the key sets the sketch IS the set (exact)."""
    from amazonredshift_blueprints_spark.operators.maintenance import (
        kmv_overlap_estimate,
    )
    from amazonredshift_blueprints_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    exact_l = o.select("o_custkey").distinct().count()
    exact_r = c.select("c_custkey").distinct().count()
    exact_overlap = (
        o.select("o_custkey").distinct()
        .join(c.select(F.col("c_custkey").alias("o_custkey")).distinct(),
              "o_custkey")
        .count()
    )
    r = kmv_overlap_estimate(o, "o_custkey", c, "c_custkey", k=64).collect()[0]
    assert abs(r["d_l"] - exact_l) / exact_l < 0.5      # k=64: coarse band
    assert abs(r["d_r"] - exact_r) / exact_r < 0.5
    assert abs(r["overlap"] - exact_overlap) / max(exact_overlap, 1) < 0.6
    big = kmv_overlap_estimate(
        o, "o_custkey", c, "c_custkey", k=100_000
    ).collect()[0]
    assert big["d_l"] == exact_l and big["d_r"] == exact_r
    assert big["overlap"] == exact_overlap
