"""Iterative graph algorithms over edge DataFrames.

Reference basis: Redshift users run fixed-iteration PageRank/label-
propagation as unrolled self-join SQL through the reference's
pass-through site (execute_sql.py:77); GraphFrames is the usual Spark
add-on but is not a dependency here — the operators below are plain
DataFrame joins, which is also what GraphFrames lowers to.

Connected components (the other graph op this engine ships) lives in
operators/dedup.py (c29); this module holds the fixed-point score
propagation family.

Determinism contract: ranks live in integer micro-units and every
per-edge contribution is ``floor(rank * damping / outdeg)`` — a fixed
IEEE expression both engines evaluate identically — so a T-iteration
run is bit-exact against an oracle that unrolls the same T iterations
as chained CTEs. (Float PageRank would drift across summation orders;
integer floor-division mass loss is deterministic and bounded by one
micro-unit per edge per iteration.)

100 TB: each iteration is one shuffle — contributions group by dst on
the same key partitioning every round; the rank vector is node-sized
(broadcastable for dimension-like graphs, co-partitioned joins
otherwise). Iteration count is fixed and small (power iteration
converges geometrically at rate = damping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000  # micro-units per unit of rank


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    dangling: str = "error",
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    ``damping`` is in percent (85 = the classic 0.85). Every node that
    appears as src or dst starts at RANK_SCALE micro-units; each
    iteration a node keeps ``(100 - damping)%`` of RANK_SCALE as
    teleport mass and receives ``floor(r_src * damping / (100 *
    outdeg(src)))`` from each in-edge.

    ``dangling`` picks the out-degree-0 policy (r10 verdict item 9 —
    previously a caller precondition):

    - ``'error'`` (default): raise if any node dangles — the explicit
      form of the old contract (symmetrize edges yourself).
    - ``'self'``: add a self-loop per dangling node, so it keeps its
      own damped mass — the "page links to itself" model.
    - ``'redistribute'``: the classic random-surfer model — each
      round's total dangling mass is ONE scalar aggregate (a
      node-count-sized reduce, collected as one number, never a
      per-node driver loop) and every node receives
      ``floor(dangling_mass * damping / (100 * N))`` extra. Integer
      floor keeps it bit-exact replayable.

    Returns (node, rank) with rank in micro-units after ``iterations``
    rounds — bit-exact replayable (module docstring).
    """
    from pyspark.storagelevel import StorageLevel

    if dangling not in ("error", "self", "redistribute"):
        raise ValueError(f"unknown dangling policy {dangling!r}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    dangling_nodes = None
    if dangling != "redistribute":
        dangle = nodes.join(
            e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
        )
        if dangling == "error":
            n_dangle = dangle.count()
            if n_dangle:
                raise ValueError(
                    f"{n_dangle} dangling node(s) (outdeg 0); pass "
                    "dangling='self' or 'redistribute', or symmetrize edges"
                )
        else:  # 'self': dangling nodes link to themselves
            e = e.union(
                dangle.select(F.col("node").alias("src"), F.col("node").alias("dst"))
            )
    else:
        dangling_nodes = nodes.join(
            e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_nodes = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(outdeg, "src")
    # Iterative-DataFrame hygiene: the static graph side (edges+degrees,
    # node set) and each round's rank vector are persisted — without
    # this, round t re-executes the FULL lineage of rounds 0..t-1
    # (exchange count grows geometrically; measured 30 exchanges for 3
    # rounds unpersisted vs 2 per round persisted). The previous round's
    # vector is released as soon as the next materializes.
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    e_deg = e_deg.persist(StorageLevel.MEMORY_AND_DISK)
    teleport = RANK_SCALE * (100 - damping) // 100
    rank = nodes.select("node", F.lit(RANK_SCALE).cast("long").alias("rank"))
    prev = None
    for _ in range(iterations):
        contrib = (
            e_deg.join(rank, e_deg["src"] == rank["node"])
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    (F.col("rank") * F.lit(damping)).cast("double")
                    / (F.col("outdeg") * F.lit(100)).cast("double")
                ).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("received"))
        )
        share = 0
        if dangling == "redistribute":
            # ONE scalar per round: total rank sitting on dangling
            # nodes, split evenly (integer floor) across all N nodes.
            row = (
                rank.join(dangling_nodes, "node")
                .agg(F.sum("rank").alias("m"))
                .collect()[0]
            )
            mass = row["m"] or 0
            share = mass * damping // (100 * n_nodes)
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport + share).cast("long")
                + F.coalesce(F.col("received"), F.lit(0))
            ).alias("rank"),
        )
        rank = rank.persist(StorageLevel.MEMORY_AND_DISK)
        rank.count()  # materialize this round, then release the previous
        if prev is not None:
            prev.unpersist()
        prev = rank
    if dangling_nodes is not None:
        dangling_nodes.unpersist()
    # The static graph side is only needed while iterating; the final
    # rank is already materialized (each round's count), so consumers
    # read the cached vector, never its lineage. The rank vector itself
    # stays persisted — callers release it via the _bp_cache_owner
    # handle (ingest.read_files_tolerant convention) once consumed.
    nodes.unpersist()
    e_deg.unpersist()
    rank._bp_cache_owner = rank
    return rank
