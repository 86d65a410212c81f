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
    # Persist the edge projection FIRST: the setup phase alone reads it
    # from up to five consumers (node enumeration, the dangling check's
    # two sides, outdeg, the e_deg join), and without the cache each one
    # re-executes the caller's full edge-build lineage (for c90 that is
    # a scan + JSON-parse + distinct per consumer — guide §5 persist
    # rule: reused AND expensive to recompute).
    from pyspark.storagelevel import StorageLevel as _SL

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist(_SL.MEMORY_AND_DISK)
    # One cached pass enumerates both endpoint roles (explode, map-side)
    # instead of a union of two scans.
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node")).distinct()
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
        updated = nodes.join(contrib, "node", "left")
        if dangling == "redistribute":
            # ONE scalar per round: total rank sitting on dangling
            # nodes, split evenly (integer floor) across all N nodes.
            # Folded INTO the round's plan as a broadcast 1-row
            # aggregate (r17): the eager checkpoint below already runs
            # one job per round, and a driver collect of the mass here
            # added a second — the crossJoin form computes mass and the
            # new vector in the same job, zero driver round trips.
            # BIGINT DIV == Python // for these non-negative operands,
            # so the shares are bit-identical to the collected form.
            mass_df = F.broadcast(
                rank.join(dangling_nodes, "node").agg(
                    F.sum("rank").alias("_bp_m")
                )
            )
            share_col = F.expr(
                f"CAST(coalesce(_bp_m, 0) * {damping} "
                f"DIV {100 * n_nodes} AS BIGINT)"
            )
            rank = updated.crossJoin(mass_df).select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + share_col
                    + F.coalesce(F.col("received"), F.lit(0))
                ).alias("rank"),
            )
        else:
            rank = updated.select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.coalesce(F.col("received"), F.lit(0))
                ).alias("rank"),
            )
        # localCheckpoint (eager) both materializes the round AND
        # truncates its lineage: with persist()+count() the round-t plan
        # still nests every earlier round under its InMemoryTableScan,
        # so analysis/planning time grows with t (the final c90 plan
        # carried 260 Exchange nodes of pure lineage text); checkpointed
        # rounds keep planning O(1) per round (guide §5: localCheckpoint
        # to cut lineage when that intermediate's fault tolerance is
        # not critical — it is re-derivable here).
        rank = rank.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        prev = rank
    if dangling_nodes is not None:
        dangling_nodes.unpersist()
    # The static graph side is only needed while iterating; the final
    # rank is already materialized (each round's eager checkpoint), so
    # consumers read the checkpointed blocks, never the lineage.
    nodes.unpersist()
    e_deg.unpersist()
    e.unpersist()
    rank._bp_cache_owner = rank
    return rank


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Global triangle count of an UNDIRECTED graph given as an edge
    list (either orientation, duplicates/self-loops tolerated), by
    degree orientation — the classic distributed formulation (Cohen
    2009; Suri & Vassilvitskii WWW'11 "MapReduce triangles"):

    1. Canonicalize: drop self-loops, dedupe to one (lo, hi) row per
       undirected edge.
    2. Orient each edge from the LOWER-(degree, id) endpoint to the
       higher — every triangle then has exactly ONE wedge whose center
       is its minimum-degree vertex, so it is counted exactly once.
    3. Wedges: self-join oriented edges on the center (u→v, u→w with
       v < w by the same order); close: semi-join the wedge's (v, w)
       pair against the oriented edge set.

    Returns a single row (n_triangles BIGINT).

    Why this scales: the wedge join's fanout is Σ outdeg(u)² under the
    ORIENTED degree, which degree-ordering bounds by O(m^{3/2}) total —
    a hub of raw degree d contributes ~0 wedges as a center because
    high-degree vertices come LAST in the order and keep almost no
    out-edges. Without orientation the same join is Σ deg² and one
    celebrity node explodes it. All three steps are equi-joins
    (shuffle by vertex key); nothing driver-side.
    """
    from pyspark.storagelevel import StorageLevel

    # The canonical edge set feeds FOUR consumers (both degree unions,
    # the orientation join, the wedge-closing semi-join); without a
    # persist each re-executes the full dedup lineage (measured 44
    # exchanges at fixture scale vs 12 persisted). Released via the
    # _bp_cache_owner handle once the count is consumed.
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg, wedges = _oriented_wedges(e)
    # close the wedge: (v, w) must be an oriented edge in EITHER
    # direction of the (deg, id) order; since v < w only by ID here, try
    # both orientations via a canonical (lo, hi) compare against e.
    # shuffle_hash on the EDGE side (guide §3.1, deliberate strategy):
    # the wedge stream is O(m^1.5) rows and the edge set m rows, so a
    # sort-merge join would sort the strictly larger side; a shuffled
    # hash join builds on the per-partition slice of the edge set and
    # streams the wedges unsorted.
    closed = wedges.join(
        e.select(F.col("lo").alias("v"), F.col("hi").alias("w")).hint(
            "shuffle_hash"
        ),
        ["v", "w"],
        "semi",
    )
    out = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    out._bp_cache_owner = e
    return out


def bfs_hops(
    edges: DataFrame,
    source: int,
    *,
    max_hops: int = 3,
) -> DataFrame:
    """Bounded breadth-first search: minimum hop distance from
    ``source`` to every node reachable within ``max_hops`` — the
    neighborhood-expansion primitive (related items, blast-radius,
    k-hop feature extraction). Edges are treated as DIRECTED; pass a
    symmetrized edge set for undirected semantics.

    Frontier iteration, all-integer, no scores to drift: round k joins
    the current frontier against the edge list, anti-joins the visited
    set, and tags survivors with hop k. Exactly ``max_hops`` rounds —
    the fixed-unroll contract every iterative operator here shares, so
    an oracle that chains k CTEs replays it bit-for-bit.

    Returns (node, hops), hops in 0..max_hops, one row per reached
    node at its MINIMUM distance.

    100 TB: each round is one equi-join (frontier x edges, frontier
    side broadcastable while small — the common case for k-hop
    queries) plus one distinct and one anti-join against the visited
    set; visited and edges are persisted once and released by the
    caller via ``_bp_cache_owner``. Frontier size is the real cost
    driver (neighborhood growth), not round count.
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).persist()
    visited = spark.createDataFrame(
        [(int(source), 0)], "node long, hops int"
    ).persist()
    frontier = visited.select("node")
    spent = []  # per-round frontier caches, released once superseded
    for k in range(1, max_hops + 1):
        nxt = (
            e.join(
                F.broadcast(frontier.withColumnRenamed("node", "src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(k).alias("hops"))
        ).persist()
        new_visited = visited.unionAll(nxt).persist()
        new_visited.count()  # materialize before parents are released
        visited.unpersist()
        spent.append(nxt)
        visited = new_visited
        frontier = nxt.select("node")
    for c in spent:  # visited is materialized; round caches can go
        c.unpersist()
    e.unpersist()
    out = visited.select("node", F.col("hops").cast("long").alias("hops"))
    out._bp_cache_owner = visited
    return out


def hits(edges: DataFrame, *, iterations: int = 2) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999), fixed small
    iteration count, ALL-INTEGER — the link-analysis complement of
    :func:`pagerank` (PageRank finds globally endorsed nodes; HITS
    separates good POINTERS from good TARGETS, the natural reading of
    a bipartite user->item graph):

        a_t(v) = Σ over edges u->v of h_{t-1}(u)
        h_t(v) = Σ over edges v->w of a_t(w)

    starting from h_0 = 1. No normalization (classic HITS normalizes
    each round; exact integer sums replay bit-for-bit instead, and for
    a FIXED iteration count the unnormalized ranking is identical —
    normalization is a positive per-round scalar). Overflow grows like
    (max degree)^(2·iterations): fine through int64 for the 2-3
    rounds HITS needs.

    Returns (node, hub_q, auth_q) for every node incident to an edge.

    100 TB: each half-iteration is one equi-join of the edge list with
    the node-sized score vector plus one hash aggregate — the same
    shuffle-per-round shape (and persist hygiene duty) as pagerank;
    scores are node-sized, broadcastable for dimension-like graphs.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).persist()
    # r16: score vectors carry only NONZERO entries while iterating —
    # a zero-score node contributes nothing to either half-round sum,
    # so the per-half-round right-join that re-attached every node
    # (two extra node-sized joins per iteration) moved to ONE restore
    # join at the end; intermediate vectors also shrink to the nodes
    # actually reachable. h_0 = 1 on nodes WITH out-edges (others can
    # never receive hub mass from themselves and contribute nothing).
    # Rounds are eagerly localCheckpoint'ed: materialized and
    # lineage-truncated (the persist+count form nested every earlier
    # half-round under the next plan — 1,661 Exchange nodes of lineage
    # by round 2 at c126; guide §5).
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node")).distinct()
    ).persist()
    h = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1).cast("long").alias("s")
    )
    a = None
    for _ in range(iterations):
        a = (
            e.join(h.withColumnRenamed("node", "src")
                    .withColumnRenamed("s", "hs"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hs").alias("s"))
        ).localCheckpoint(eager=True)
        h = (
            e.join(a.withColumnRenamed("node", "dst")
                    .withColumnRenamed("s", "as_"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("as_").alias("s"))
        ).localCheckpoint(eager=True)
    out = (
        nodes.join(h.withColumnRenamed("s", "hub_q"), "node", "left")
        .join(a.withColumnRenamed("s", "auth_q"), "node", "left")
        .select(
            "node",
            F.coalesce("hub_q", F.lit(0)).cast("long").alias("hub_q"),
            F.coalesce("auth_q", F.lit(0)).cast("long").alias("auth_q"),
        )
    ).persist()
    out.count()
    e.unpersist()
    nodes.unpersist()
    out._bp_cache_owner = out
    return out


def _oriented_wedges(e: DataFrame):
    """Degree-orient the canonical (lo, hi) edge set and build wedges
    (u, v, w), v < w — shared by :func:`triangle_count` (global count
    via semi-join close) and :func:`clustering_coefficients` (per-node
    counts via inner-join close). Returns (deg, wedges).

    r16: ``deg`` (node-sized) and the oriented edge list ``keyed``
    (edge-sized) are persisted — ``deg`` has up to three consumers
    (both orientation joins, the callers' final output join) and
    ``keyed`` two (both wedge sides); unpersisted, each consumer
    re-ran the whole union+aggregate+two-join orientation lineage
    (the final c141 plan carried 70 Exchange nodes, ~5 copies of the
    deg subtree). Released by clearCache/GC with the canonical edge
    cache (the established global_rank convention)."""
    deg = (
        e.select(F.explode(F.array("lo", "hi")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # orient by (deg, id): src = smaller endpoint under that order
    keyed = (
        e.join(deg.select(F.col("v").alias("lo"), F.col("deg").alias("dlo")), "lo")
        .join(deg.select(F.col("v").alias("hi"), F.col("deg").alias("dhi")), "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("src"), F.col("hi").alias("dst")),
            )
            .otherwise(
                F.struct(F.col("hi").alias("src"), F.col("lo").alias("dst"))
            )
            .alias("o"),
            F.col("dlo"), F.col("dhi"),
        )
        .select("o.src", "o.dst")
        .persist()
    )
    w1 = keyed.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    w2 = keyed.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w"))
    return deg, wedges


def clustering_coefficients(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node local clustering coefficient of an undirected graph —
    Watts-Strogatz: how close a node's neighborhood is to a clique,

        lcc(v) = 2 · tri(v) / (deg(v) · (deg(v) − 1))

    in integer micro-units (exact DIV), for nodes with deg >= 2 (below
    that the coefficient is undefined). The community-vs-bridge
    structural signal :func:`triangle_count` aggregates away.

    Per-node triangle counts come from the SAME degree-oriented wedge
    machinery (``_oriented_wedges``): each closed wedge is one
    triangle (u, v, w) counted once; exploding the triple and one hash
    aggregate gives tri(v) exactly. Degrees are over the canonical
    deduped edge set (self-loops dropped).

    Returns (node, degree, n_tri, lcc_micro).

    100 TB: identical O(m^1.5) wedge bound as triangle_count; the
    close step is an inner equi-join (the distinct edge set makes it
    1:1 with the semi-join) so the triple survives to the explode;
    per-node counts are one node-keyed hash aggregate.
    """
    from pyspark.storagelevel import StorageLevel

    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg, wedges = _oriented_wedges(e)
    # shuffle_hash on the edge side: same rationale as triangle_count's
    # semi close — never sort the O(m^1.5) wedge stream to join it
    # against the m-row edge set (guide §3.1).
    closed = wedges.join(
        e.select(F.col("lo").alias("v"), F.col("hi").alias("w")).hint(
            "shuffle_hash"
        ),
        ["v", "w"],
    )
    tri = (
        closed.select(
            F.explode(F.array("u", "v", "w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    out = (
        deg.filter(F.col("deg") >= 2)
        .join(tri.withColumnRenamed("node", "v"), "v", "left")
        .select(
            F.col("v").alias("node"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.expr(
                "CAST(2 * COALESCE(n_tri, 0) * 1000000 "
                "DIV (deg * (deg - 1)) AS BIGINT)"
            ).alias("lcc_micro"),
        )
    )
    out._bp_cache_owner = e
    return out


def kcore(
    edges: DataFrame,
    k: int,
    *,
    rounds: int = 4,
) -> DataFrame:
    """k-core peeling, fixed round count: repeatedly drop nodes whose
    degree within the SURVIVING subgraph is below ``k`` — the standard
    density filter for graph cleanup (spam/fringe-account removal,
    community-core extraction) before expensive downstream analytics.

    Edges must be the SYMMETRIZED directed form of an undirected graph
    (every node appears as ``src``), matching :func:`bfs_hops`'s
    contract. Exactly ``rounds`` peels run — the fixed-unroll contract
    every iterative operator here shares, so an oracle that chains
    ``rounds`` CTE stages replays it bit-for-bit; at convergence extra
    rounds are no-ops, so a ``rounds`` generous enough to converge
    yields the true k-core.

    Returns (node, deg): survivors with their degree inside the
    surviving subgraph. All-integer — nothing to drift.

    100 TB (r16 rewrite — incremental peeling): the naive form
    recounts degrees over the FULL surviving edge set every round
    (two edge-sized equi-joins + one edge-sized aggregate × rounds).
    This form maintains the degree table incrementally instead — the
    standard k-core decrement scheme: one full-degree aggregate up
    front (edges are the symmetrized form, so ``groupBy(src)`` counts
    every node's degree in one map-side-combinable pass), then each
    round only touches edges INCIDENT TO THE JUST-REMOVED nodes:

        removed_r = {v alive : deg(v) < k}
        deg(v)   -= |edges (v, u), u ∈ removed_r|   for surviving v

    which is exactly the induced-subgraph degree by induction. Per
    round that is one equi-join of the cached edge set against the
    (shrinking, usually tiny) removed set plus one node-sized left
    join — O(edges incident to removed), not O(edges). A round that
    removes nothing proves the fixpoint (degrees can never drop
    again), so remaining rounds are skipped — output-identical to
    running them as no-ops. Round states are eagerly
    ``localCheckpoint``ed: materialized AND lineage-truncated, so
    round t's plan does not nest rounds 0..t-1 (the persist+count
    form re-planned a 5,000-Exchange lineage text by round 4).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.storagelevel import StorageLevel

    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Full degree once: symmetrized input ⇒ every node appears as src.
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .select(F.col("src").alias("node"), "deg")
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        removed = deg.filter(F.col("deg") < k).select("node")
        if removed.isEmpty():
            break  # fixpoint: every later round is a no-op
        dec = (
            e.join(removed.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .select(F.col("src").alias("node"), "_d")
        )
        deg = (
            deg.filter(F.col("deg") >= k)
            .join(dec, "node", "left")
            .select(
                "node",
                (F.col("deg") - F.coalesce("_d", F.lit(0)))
                .cast("long")
                .alias("deg"),
            )
            .localCheckpoint(eager=True)
        )
    # Survivors whose degree inside the surviving subgraph is zero have
    # no incident surviving edge; the naive groupBy form emitted no row
    # for them, so filter them out to match exactly.
    out = deg.filter(F.col("deg") >= 1)
    e.unpersist()
    out._bp_cache_owner = deg
    return out


def link_prediction(
    edges: DataFrame,
    *,
    k: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    max_center_degree: int | None = None,
) -> DataFrame:
    """Neighborhood-based link prediction (Liben-Nowell & Kleinberg
    CIKM'03): score every NON-edge pair that shares at least one
    neighbor by common-neighbor count, Jaccard, and Adamic-Adar, and
    return the top-``k`` — "customers who bought these parts together
    will likely co-buy those" / related-item candidates.

    Scores, all integer:
    - ``cn``             — |Γ(a) ∩ Γ(b)|;
    - ``jaccard_micro``  — ``cn * 1e6 DIV (deg(a)+deg(b)-cn)``;
    - ``aa_micro``       — Σ over common neighbors z of
      ``1e12 DIV round(ln(deg(z))*1e6)`` (Adamic-Adar's 1/ln(deg),
      micro-scaled through the catalog's fixed-IEEE ln contract; every
      wedge center has deg >= 2, so ln > 0 — no guard needed).

    Ranking: jaccard DESC, then aa DESC, then (a, b) — fully
    deterministic.

    100 TB: the wedge self-join on the center vertex is the whole
    cost, Σ deg(z)² — unlike triangle counting, link prediction needs
    EVERY wedge, so degree orientation cannot bound it. The lever is
    ``max_center_degree``: drop hub centers above the cap (the c106
    doc-frequency-cap discipline) — a node connected to everything
    contributes near-zero Adamic-Adar weight and pure noise as
    evidence anyway. Everything else is equi-joins and one hash
    aggregate; the result exits through TakeOrdered, no global sort.
    """
    from pyspark.storagelevel import StorageLevel

    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionAll(
        e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )
    # persisted (r16): the degree table has three consumers (centers,
    # deg_a, deg_b) and is node-sized; unpersisted each re-ran the
    # adjacency aggregate over the cached edge set
    deg = adj.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    ).persist()
    # per-center Adamic-Adar weight, attached once to the adjacency rows.
    # deg >= 2 is both semantics and safety: a degree-1 center forms no
    # wedge, and ln(1) = 0 would make its weight a division by zero
    # (an ANSI-mode runtime error, not just a NULL).
    centers = deg.filter(F.col("deg") >= 2)
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)
    adjw = adj.join(centers, "u").select(
        "u",
        "v",
        F.expr(
            "CAST(1000000000000 DIV "
            "CAST(round(ln(CAST(deg AS DOUBLE)) * 1000000) AS BIGINT) "
            "AS BIGINT)"
        ).alias("w"),
    )
    pairs = (
        adjw.alias("x")
        .join(adj.alias("y"), F.col("x.u") == F.col("y.u"))
        .filter(F.col("x.v") < F.col("y.v"))
        .groupBy(F.col("x.v").alias("a"), F.col("y.v").alias("b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cn"),
            F.sum("w").cast("long").alias("aa_micro"),
        )
        .join(
            e.select(F.col("lo").alias("a"), F.col("hi").alias("b")),
            ["a", "b"],
            "left_anti",  # existing edges out: predict NEW links only
        )
    )
    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            F.expr(
                "CAST(cn * 1000000 DIV (deg_a + deg_b - cn) AS BIGINT)"
            ).alias("jaccard_micro"),
            "aa_micro",
        )
    )
    out = scored.orderBy(
        F.col("jaccard_micro").desc(),
        F.col("aa_micro").desc(),
        "a",
        "b",
    ).limit(k)
    out._bp_cache_owner = e
    return out


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    iterations: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation with clamped seeds (the
    Zhu/Ghahramani 2002 scheme, integer-vote form): each synchronous
    round, every NON-seed node takes the majority label among its
    currently-labeled in-neighbors (ties → smallest label); seed nodes
    never change. Community/category spreading over a co-occurrence
    graph — "label 10 products, infer the rest".

    Exactly ``iterations`` rounds, recomputed from the seed set each
    round (the classic clamped sync update) — the fixed-unroll
    contract every iterative operator here shares, so a chained-CTE
    oracle replays it bit-for-bit. All-integer votes, deterministic
    tie rule, no scores to drift.

    ``edges`` (src, dst) are DIRECTED (pass a symmetrized set for
    undirected semantics); ``seeds`` is (node, label). Returns
    (node, label) for every node labeled after the final round.

    100 TB: each round is ONE equi-join (edges × current labels on
    dst — label table grows toward node cardinality, stays far under
    edge cardinality) + ONE hash aggregate to (node, label) votes +
    ONE max-struct aggregate to winners + an anti-join vs seeds; the
    c90 persist hygiene (materialize new state, then release old)
    keeps two label generations at most in cache.
    """
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).persist()
    sd = seeds.select(
        F.col("node").cast("long").alias("node"),
        F.col("label").cast("long").alias("label"),
    ).persist()
    labels = sd
    for _ in range(iterations):
        votes = (
            e.join(
                labels.select(
                    F.col("node").alias("dst"),
                    F.col("label"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        winners = (
            votes.groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"), (-F.col("label")).alias("neg")
                    )
                ).alias("m")
            )
            .select("node", (-F.col("m.neg")).cast("long").alias("label"))
            .join(sd.select("node"), "node", "left_anti")
        )
        # eager localCheckpoint: materialize AND truncate lineage so
        # round t's plan does not nest rounds 0..t-1 (guide §5; same
        # rationale as pagerank/kcore — the persist+count form grew the
        # final plan to ~90 Exchange nodes of lineage text by round 2).
        new_labels = sd.unionAll(winners).localCheckpoint(eager=True)
        if labels is not sd:
            labels.unpersist()
        labels = new_labels
    e.unpersist()
    out = labels.select("node", "label")
    out._bp_cache_owner = labels
    sd.unpersist()
    return out
