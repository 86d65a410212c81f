"""Portable hash sampling (operators/sampling.py): partitioning
invariance, salt independence, fraction accuracy, edge fractions."""

from __future__ import annotations

import pytest

from amazonredshift_blueprints_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from amazonredshift_blueprints_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id")


def test_partitioning_invariance(docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), "doc_id", 0.3).collect()
    }
    assert a == b and a  # identical membership, non-empty


def test_split_is_total_and_disjoint(docs):
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # total: every row gets exactly one split
    assert 0.7 < counts["train"] / n < 0.9  # 500 rows: ±binomial noise


def test_salt_changes_assignment(docs):
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, salt="a").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5, salt="b").collect()}
    assert a != b  # re-dealt


def test_edge_fractions(docs):
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.6})


def test_stratified_sample_quota_and_salt(spark, sf_dir):
    from amazonredshift_blueprints_spark.operators.sampling import stratified_sample
    from amazonredshift_blueprints_spark.session import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    got = stratified_sample(d, ["lang"], key="doc_id", n_per_stratum=10)
    per = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(10, n) for lang, n in sizes.items()}
    # determinism: same salt -> same rows; different salt -> a re-deal
    a = {(r["doc_id"]) for r in got.collect()}
    b = {(r["doc_id"]) for r in stratified_sample(d, ["lang"], key="doc_id", n_per_stratum=10).collect()}
    c = {(r["doc_id"]) for r in stratified_sample(d, ["lang"], key="doc_id", n_per_stratum=10, salt="v2").collect()}
    assert a == b
    assert a != c


def test_token_budget_sample_equals_single_window_form(spark):
    """The two-level (band offset + within-band) prefix sum must equal
    the naive one-window-per-stratum running sum row-for-row."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from amazonredshift_blueprints_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [
        ("en", i, (i * 37) % 100 + 1) for i in range(200)
    ] + [("de", i, (i * 17) % 60 + 1) for i in range(150)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")

    got = {
        (r["stratum"], r["id"], r["weight"], r["cum_weight"])
        for r in token_budget_sample(
            df, strata_col="lang", id_col="doc_id",
            weight_col="n_tokens", budget=900, band_width=16,
        ).collect()
    }
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r["lang"], r["doc_id"], r["n_tokens"], r["cum"])
        for r in df.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= 900)
        .collect()
    }
    assert got == want and len(got) > 0


def test_token_budget_sample_validates_inputs(spark):
    import pytest as _pytest

    from amazonredshift_blueprints_spark.operators.sampling import (
        token_budget_sample,
    )

    df = spark.createDataFrame([("en", 1, 5)], "lang string, doc_id long, n_tokens long")
    with _pytest.raises(ValueError, match="budget"):
        token_budget_sample(
            df, strata_col="lang", id_col="doc_id",
            weight_col="n_tokens", budget=0,
        )
    with _pytest.raises(ValueError, match="band_width"):
        token_budget_sample(
            df, strata_col="lang", id_col="doc_id",
            weight_col="n_tokens", budget=10, band_width=0,
        )


def test_weighted_sample_proportionality_and_determinism(spark):
    """The draw must be exactly reproducible, land every target inside
    its owner's interval, and approximate weight-proportionality on a
    skewed corpus (the heavy row wins ~its weight share)."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.sampling import (
        weighted_sample_with_replacement,
    )

    rows = [(i, 1) for i in range(100)] + [(100, 900)]  # 90% of the mass
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = weighted_sample_with_replacement(
        df, id_col="doc_id", weight_col="w", n_samples=300
    ).collect()
    b = weighted_sample_with_replacement(
        df, id_col="doc_id", weight_col="w", n_samples=300
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    assert len(a) == 300  # every target resolves to exactly one owner
    heavy = sum(1 for r in a if r["id"] == 100)
    assert 240 <= heavy <= 300, heavy  # ~90% +- slack, hash-fixed
    # zero-weight rows never drawn
    df0 = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, w long")
    only = weighted_sample_with_replacement(
        df0, id_col="doc_id", weight_col="w", n_samples=20
    )
    assert only.filter(F.col("id") == 1).count() == 0
    assert only.count() == 20


def test_global_rank_matches_total_order(spark):
    """Distributed global rank (range-sort + offset pass) must equal
    the single-partition truth, and must NOT plan a single-partition
    ORDER BY window (the 100 TB bottleneck it exists to avoid)."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.sampling import global_rank

    rows = [(i, (i * 37) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(7)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, [F.desc("v"), F.asc("id")]).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want
    plan = (
        global_rank(df, [F.desc("v"), F.asc("id")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every window spec is keyed by the partition id — no global window
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec, spec


def test_token_balanced_shards_skew_bound(spark, sf_dir):
    """Longest-first round-robin: every shard gets within one maximal
    document of every other shard's token total, and shards partition
    the corpus exactly."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.sampling import (
        token_balanced_shards,
    )
    from amazonredshift_blueprints_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    shards = token_balanced_shards(d, "doc_id", "text", n_shards=8)
    agg = shards.groupBy("shard").agg(
        F.sum("n_tokens").alias("toks"), F.count("*").alias("docs")
    ).collect()
    assert {r["shard"] for r in agg} == set(range(8))
    assert sum(r["docs"] for r in agg) == d.count()
    totals = [r["toks"] for r in agg]
    max_doc = shards.agg(F.max("n_tokens")).first()[0]
    assert max(totals) - min(totals) <= max_doc


def test_frequency_cap_semantics(spark):
    """Cap keeps exactly min(cap, group size) rows per group, audit
    column carries the pre-cap size, and the kept subset is stable
    across partitionings (portable hash order)."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.sampling import frequency_cap

    rows = [(i, f"g{i % 3}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = frequency_cap(df, "id", "grp", max_per_group=5)
    agg = {r["grp"]: (r["n"], r["pre"]) for r in
           out.groupBy("grp").agg(F.count("*").alias("n"),
                                  F.first("n_in_group").alias("pre")).collect()}
    for g in ("g0", "g1", "g2"):
        assert agg[g][0] == 5
        assert agg[g][1] in (16, 17)
    kept1 = {r["id"] for r in out.collect()}
    kept2 = {
        r["id"]
        for r in frequency_cap(
            df.repartition(13), "id", "grp", max_per_group=5
        ).collect()
    }
    assert kept1 == kept2


def test_global_rank_offset_is_broadcast_join_not_case(spark):
    """The per-partition offset must be applied via a broadcast join on
    _pid, never a P-branch CaseWhen tree: at the shuffle-partition
    counts a 100 TB range sort implies (1e4-1e5), a partition-count
    CASE expression blows past codegen method limits (VERDICT r10)."""
    import re

    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.sampling import global_rank

    df = spark.createDataFrame(
        [(i, (i * 37) % 101) for i in range(300)], "id long, v long"
    ).repartition(7)
    out = global_rank(df, [F.desc("v"), F.asc("id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # No CaseWhen keyed on the partition id anywhere in the plan.
    for m in re.findall(r"CASE WHEN [^\n]*", plan):
        assert "_pid" not in m, m


def test_global_rank_high_partition_count(spark):
    """Correct at a repartitionByRange-forced high partition count (512
    partitions over 2000 rows — most partitions hold a handful of rows,
    many are empty), the regime where the old CASE-offset form would
    have built a 512-branch expression tree."""
    from pyspark.sql import functions as F

    from amazonredshift_blueprints_spark.operators.sampling import global_rank

    rows = [(i, (i * 7919) % 4001) for i in range(2000)]
    df = (
        spark.createDataFrame(rows, "id long, v long")
        .repartitionByRange(512, "id")
    )
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, [F.asc("v"), F.asc("id")]).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_unimax_budgets_waterfilling(spark):
    """UniMax allocation: saturating strata cap at epochs_cap*avail,
    the rest split the remainder evenly (integer floor); budget beyond
    the capped total leaves every stratum at its cap; invalid inputs
    refuse."""
    import pytest

    from amazonredshift_blueprints_spark.operators.sampling import (
        unimax_budgets,
    )

    stats = spark.createDataFrame(
        [("tiny", 100), ("mid", 1000), ("big", 10000)],
        "stratum string, avail long",
    )
    # budget 3000, cap 2x: tiny caps at 200; remainder 2800 over 2 ->
    # theta 1400 (mid caps? a_mid=2000 > 1400 -> both get 1400)
    got = {
        r["stratum"]: (r["cap_weight"], r["alloc"])
        for r in unimax_budgets(stats, budget=3000, epochs_cap=2).collect()
    }
    assert got == {
        "tiny": (200, 200),
        "mid": (2000, 1400),
        "big": (20000, 1400),
    }
    # sum of allocations never exceeds the budget
    assert sum(a for _, a in got.values()) <= 3000
    # budget above the capped total: everything saturates
    got2 = {
        r["stratum"]: r["alloc"]
        for r in unimax_budgets(stats, budget=10**9, epochs_cap=2).collect()
    }
    assert got2 == {"tiny": 200, "mid": 2000, "big": 20000}
    # budget below even the uniform floor: even split, no stratum capped
    got3 = {
        r["stratum"]: r["alloc"]
        for r in unimax_budgets(stats, budget=90, epochs_cap=2).collect()
    }
    assert got3 == {"tiny": 30, "mid": 30, "big": 30}
    with pytest.raises(ValueError, match="budget"):
        unimax_budgets(stats, budget=0)
    with pytest.raises(ValueError, match="epochs_cap"):
        unimax_budgets(stats, budget=10, epochs_cap=0)


def test_negative_sampling_determinism_and_exclusion(spark):
    """Proposals are a pure function of (user, item, slot); no emitted
    negative is a positive of the same user; at most k per positive."""
    from amazonredshift_blueprints_spark.operators.sampling import (
        negative_sampling,
    )

    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12)], ["u", "it"]
    )
    out1 = sorted(
        (r["user"], r["pos_item"], r["slot"], r["neg_item"])
        for r in negative_sampling(pos, "u", "it", k=2).collect()
    )
    out2 = sorted(
        (r["user"], r["pos_item"], r["slot"], r["neg_item"])
        for r in negative_sampling(pos, "u", "it", k=2).collect()
    )
    assert out1 == out2  # bit-for-bit deterministic
    positives = {(1, 10), (1, 11), (2, 10), (3, 12)}
    for u, p, s, n in out1:
        assert (u, n) not in positives
        assert 1 <= s <= 2
    # universe is the observed items only
    assert {n for _, _, _, n in out1} <= {10, 11, 12}


def test_poisson_bootstrap_weights_and_ci(spark):
    """Poisson bootstrap: weights replay in pure Python from the same
    md5+CDF contract, replicate means are exact integer quotients, the
    empirical weight mean over many draws is ~1 (Poisson(1)), and the
    order-statistic CI brackets the point estimate."""
    import hashlib
    import math

    from amazonredshift_blueprints_spark.operators.sampling import (
        POISSON1_CDF_HEX,
        poisson_bootstrap_means,
    )

    data = [(i, 100 + (i * 37) % 50) for i in range(200)]
    df = spark.createDataFrame(data, "k long, x long")
    out = poisson_bootstrap_means(df, "k", "x", reps=40).collect()
    assert [r.rep for r in out] == list(range(40))

    def weight(key, rep):
        h8 = hashlib.md5(f"{key}:{rep}:v1".encode()).hexdigest()[:8]
        return sum(1 for t in POISSON1_CDF_HEX if h8 >= t)

    for r in out[:5]:  # replay the first five replicates exactly
        ws = [(weight(k, r.rep), x) for k, x in data]
        n_eff = sum(w for w, _ in ws)
        assert r.n_eff == n_eff
        assert r.wmean == sum(w * x for w, x in ws) // n_eff
    # Poisson(1): mean weight over 200 keys x 40 reps ~ 1 (±10%)
    tot = sum(r.n_eff for r in out)
    assert abs(tot / (200 * 40) - 1.0) < 0.1
    # CI from order statistics brackets the true mean
    means = sorted(r.wmean for r in out)
    true_mean = sum(x for _, x in data) / len(data)
    lo, hi = means[0], means[-1]  # 40 reps: 1st/40th order stats
    assert lo <= true_mean <= hi
    # CDF thresholds really are the quantized Poisson(1) CDF
    cum, expect = 0.0, []
    for k in range(9):
        cum += math.exp(-1) / math.factorial(k)
        expect.append(format(int(cum * 2**32), "08x"))
    assert POISSON1_CDF_HEX == expect


def test_neyman_allocation_exact_budget(spark):
    """Allocations sum exactly to the budget; a bigger/more-volatile
    stratum gets more seats; singleton strata weight 0; python replay
    of the Hamilton apportionment matches."""
    import math

    from amazonredshift_blueprints_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = (
        [("big_volatile", v) for v in (0, 100) * 30]      # N=60, sd~50
        + [("small_flat", v) for v in (50, 51) * 10]      # N=20, sd~0.5
        + [("mid", v) for v in (10, 30, 50, 70) * 8]      # N=32
        + [("single", 5)]                                  # N=1 -> w=0
    )
    df = spark.createDataFrame(rows, "s string, v long")
    out = {r.stratum: (r.n_rows, r.sd_r6, r.alloc)
           for r in neyman_allocation(df, "s", "v", n_total=100).collect()}
    assert sum(a for _, _, a in out.values()) == 100
    assert out["big_volatile"][2] > out["mid"][2] > out["small_flat"][2]
    assert out["single"] == (1, None, 0)

    def replay(budget):
        strata = {}
        for s, v in rows:
            strata.setdefault(s, []).append(v)
        w = {}
        for s, vs in strata.items():
            if len(vs) > 1:
                m = sum(vs) / len(vs)
                sd = math.sqrt(sum((x - m) ** 2 for x in vs) / (len(vs) - 1))
                w[s] = len(vs) * sd
            else:
                w[s] = 0.0
        tot = sum(w.values())
        quota = {s: budget * x / tot for s, x in w.items()}
        base = {s: math.floor(q) for s, q in quota.items()}
        left = budget - sum(base.values())
        order = sorted(quota, key=lambda s: (-(quota[s] - base[s]), s))
        for s in order[:left]:
            base[s] += 1
        return base

    want = replay(100)
    assert {s: a for s, (_, _, a) in out.items()} == want


def test_global_cumsum_matches_truth_and_totals(spark):
    """Distributed prefix sums (range-sort + broadcast offsets) equal
    the sequential truth on every prefix, totals come back exact, and
    every window spec in the plan is keyed by the partition id."""
    import re

    from amazonredshift_blueprints_spark.operators.sampling import (
        global_cumsum,
    )

    rows = [((i * 37) % 101, i % 5, (i * 13) % 7) for i in range(300)]
    # distinct keys: (v, id) would collide on v; make key unique
    rows = [(i, a, b) for i, (a, b, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "k long, a long, b long").repartition(7)
    out = global_cumsum(df, ["k"], ["a", "b"])
    got = {r["k"]: (r["a_cum"], r["b_cum"]) for r in out.collect()}
    acc_a = acc_b = 0
    for k, a, b in sorted(rows):
        acc_a += a
        acc_b += b
        assert got[k] == (acc_a, acc_b), k
    assert out._bp_totals == {"a": acc_a, "b": acc_b}
    plan = out._jdf.queryExecution().executedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec, spec


def test_grouped_cumsum_survives_one_giant_group(spark):
    """Per-group prefix sums stay correct when ONE group holds nearly
    everything (the regime where Window.partitionBy(grp) degenerates
    to a single task): forced through 64 range partitions, the giant
    group spans many partitions and every prefix still matches the
    sequential truth; offsets are broadcast, windows are _pid-keyed."""
    import re

    from amazonredshift_blueprints_spark.operators.sampling import (
        grouped_cumsum,
    )

    rows = [("big", i, (i * 7) % 11) for i in range(1900)] + [
        ("tiny", i, i % 3) for i in range(100)
    ]
    df = (
        spark.createDataFrame(rows, "g string, v long, n long")
        .repartitionByRange(64, "g", "v")
    )
    out = grouped_cumsum(df, ["g"], ["v"], ["n"])
    got = {(r["g"], r["v"]): r["n_cum"] for r in out.collect()}
    for g in ("big", "tiny"):
        acc = 0
        for gg, v, n in sorted(r for r in rows if r[0] == g):
            acc += n
            assert got[(g, v)] == acc, (g, v)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "_pid" in spec, spec


def test_stratified_kfold_balance_and_determinism(spark):
    """Every stratum's rows spread across folds with max size spread 1;
    assignment is deterministic and salt-sensitive; k<2 refuses."""
    import pytest

    from amazonredshift_blueprints_spark.operators.sampling import (
        stratified_kfold,
    )

    rows = [(i, "s" + str(i % 3)) for i in range(101)]
    df = spark.createDataFrame(rows, "doc long, grp string")
    got = stratified_kfold(df, "grp", "doc", k=4).collect()
    assert len(got) == 101
    sizes = {}
    for r in got:
        sizes.setdefault(r.stratum, {}).setdefault(r.fold, 0)
        sizes[r.stratum][r.fold] += 1
    for s, by_fold in sizes.items():
        assert set(by_fold) == {0, 1, 2, 3}, (s, by_fold)
        assert max(by_fold.values()) - min(by_fold.values()) <= 1, by_fold
    again = {
        (r.id, r.fold)
        for r in stratified_kfold(df, "grp", "doc", k=4).collect()
    }
    assert again == {(r.id, r.fold) for r in got}
    redealt = {
        (r.id, r.fold)
        for r in stratified_kfold(df, "grp", "doc", k=4, salt="v2").collect()
    }
    assert redealt != again
    with pytest.raises(ValueError, match="k must be"):
        stratified_kfold(df, "grp", "doc", k=1)
