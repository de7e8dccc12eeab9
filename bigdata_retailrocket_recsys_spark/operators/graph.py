"""Graph operators over relational edge lists.

Connected components (dedup clustering) lives in ``operators/dedup.py``;
this module holds the scoring side: PageRank over an edge list — the
classic "importance in the co-visitation graph" signal a recommender
blends with popularity (the reference's pop_cands strategy, py:331-340,
is the degenerate damping=1-iteration version of this).

Scale notes: each power iteration is ONE job — the dangling-mass scalar is
a 1-row aggregate broadcast-joined INTO the rank-update dataflow (no
driver ``collect`` sync barrier, no double execution of the ranks
lineage), and each iteration's ranks are materialized with an eager
``localCheckpoint`` so the plan stays constant-size however many
iterations run (same discipline as connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Standard formulation: ``r' = (1-d)/N + d * (Σ_in r/outdeg +
    dangling_mass/N)`` — dangling nodes (no out-edges) redistribute their
    mass uniformly, so total rank mass stays 1 every iteration (asserted
    in tests). Fixed ``iters`` rounds; the dangling-mass term stays inside
    the dataflow as a broadcast 1-row aggregate, so the driver never
    synchronizes mid-loop and each iteration's lineage executes exactly
    once (``checkpoint_every`` is kept for signature compatibility; ranks
    are checkpointed eagerly every iteration, which IS the per-iteration
    materialization any Pregel-style loop needs).

    Output: (node, rank) — float ranks are reduction-order dependent →
    rows-only in the driver contract; invariants (mass conservation,
    NumPy power-iteration agreement) are property-tested.
    """
    # Pin the canonical edge set ONCE (r14): every derived frame below —
    # nodes, out-degrees, weights AND the per-iteration dangling branch —
    # reads the pinned LogicalRDD instead of re-executing the caller's
    # edge pipeline (often itself a covis self-join; the old shape
    # re-derived src degrees from RAW edges once per iteration).
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # per-node dangling flag carried THROUGH the iteration (r14, §2.4):
    # the dangling mass becomes a 1-row aggregate over the checkpointed
    # ranks themselves — the old per-iteration node-sized anti-join
    # shuffle against the src list is gone. Same mass over the same node
    # set (reduction order may differ in the last ulp; ranks are
    # documented reduction-order-dependent floats, rows-only).
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            outdeg.select(F.col("src").alias("node"), F.lit(1).alias("__o")),
            "node",
            "left",
        )
        .select("node", F.col("__o").isNull().alias("__dng"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    # edge weight = 1/outdeg of the source, fixed for all iterations
    w = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).cache()

    ranks = nodes.select("node", "__dng", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(iters):
        # mass parked on dangling nodes (no out-edges) this round:
        # a 1-row aggregate kept IN the dataflow (broadcast nested-loop
        # join fans the scalar to every row — no driver round-trip)
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("__dng"), F.col("rank"))), F.lit(0.0)
            ).alias("dangling_m")
        )
        contribs = (
            w.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__dng",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dangling_m") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # one materialization per iteration: both the contribs branch and
        # the dangling branch read the SAME checkpointed ranks, and the
        # next iteration starts from a constant-size plan
        if i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def triangle_counts(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list.

    Input edges may be directed/duplicated either way; they are first
    canonicalized to distinct undirected ``(u < v)`` pairs. Enumeration
    uses the degree-orientation optimization (Schank/Wagner; the
    MapReduce form is Suri & Vassilvitskii's "Counting triangles and the
    curse of the last reducer", WWW'11): every undirected edge is
    directed from its lower-(degree, id) endpoint to the higher one, so
    wedges are only built at each triangle's *lowest-order* apex. That
    bounds the wedge fan-out by O(m^1.5) overall instead of Σ deg(v)²
    — the hub vertex of a star graph generates ZERO wedges because all
    its edges point inward. Each triangle is found exactly once, then
    exploded to its three vertices for the per-vertex rollup.

    Shuffle shape: degree agg (map-side combinable) + two self-joins on
    vertex keys + one final groupBy — all hash-partitioned on vertex /
    edge keys; no driver collection, no iteration. The canonical edge
    list is referenced 4× (degrees, orientation, both wedge sides via
    `oriented`) and Spark's ReuseExchange does NOT dedupe it (verified
    on the executed plan), so `und` and `oriented` are cached — the S7
    shared-subtree discipline; without it the upstream edge derivation
    (often itself a self-join) recomputes ~6×.

    Returns ``(vtx, n_tri)`` — vertices in ≥1 triangle only.
    Complements the reference's popularity/co-visitation signals
    (py:331-340) with a cohesion signal; oracle-checked against the
    naive a<b<c enumeration in DuckDB (orientation changes which join
    finds a triangle, never the triangle set).
    """
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("u").alias("vtx"))
        .unionAll(und.select(F.col("v").alias("vtx")))
        .groupBy("vtx")
        .agg(F.count("*").alias("deg"))
    )
    # orient each edge low→high in the (deg, id) total order
    with_deg = (
        und.join(deg.withColumnRenamed("vtx", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("vtx", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.struct("dv", "v")).otherwise(F.struct(F.col("du").alias("dv"), F.col("u").alias("v"))).alias("d"),
    ).select("s", F.col("d.v").alias("d"), F.col("d.dv").alias("dd")).cache()
    # wedges at the apex: two out-neighbors a<b in the (deg, id) order
    e1 = oriented.select(F.col("s"), F.col("d").alias("a"), F.col("dd").alias("da"))
    e2 = oriented.select(F.col("s"), F.col("d").alias("b"), F.col("dd").alias("db"))
    wedges = e1.join(e2, "s").filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    # close the wedge: an oriented a→b edge exists (inner join cannot
    # duplicate — oriented edges are distinct)
    closed = wedges.join(
        oriented.select(F.col("s").alias("a"), F.col("d").alias("b")),
        ["a", "b"],
        "inner",
    )
    tri_vertices = closed.select(
        F.explode(F.array("s", "a", "b")).alias("vtx")
    )
    return tri_vertices.groupBy("vtx").agg(
        F.count("*").cast("bigint").alias("n_tri")
    )


def pagerank_exact(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 4,
    unit: int = 1_000_000,
    damping_num: int = 850,
    damping_den: int = 1000,
) -> DataFrame:
    """Integer-mass PageRank — bit-exact cross-engine, so an iterative
    graph algorithm can be ORACLED instead of rows-only (`pagerank`'s
    float ranks are reduction-order dependent; these integer masses are
    not: + and div on bigints are associative-safe).

    Semantics: canonicalize input to the SYMMETRIC directed graph (both
    orientations of each undirected edge — guarantees every node has
    out- and in-degree, so no dangling handling), start every node at
    ``unit`` micro-mass, then ``iters`` rounds of

        mass'(v) = base + (num · Σ_{u→v} floor(mass(u)/outdeg(u))) div den

    with ``base = unit·(den−num) div den``. The floors leak a little
    mass (deterministically — this is a defined fixed-point scheme, not
    an approximation of the float one); ranking order converges to the
    same importance order as float PageRank on these graphs. One
    join+agg shuffle per round, eager localCheckpoint keeps the plan
    constant-size (same discipline as `pagerank`).
    """
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = und.select(F.col("u").alias("s"), F.col("v").alias("d")).unionAll(
        und.select(F.col("v").alias("s"), F.col("u").alias("d"))
    ).localCheckpoint(eager=True)
    outdeg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("o"))
    # cached (r14): the loop references out_edges every iteration and
    # Spark never reuses a twice-referenced subtree — uncached, each
    # round re-aggregates degrees and re-joins them onto sym. Exact
    # integers, so caching cannot perturb values.
    out_edges = sym.join(outdeg, "s").cache()
    base = (unit * (damping_den - damping_num)) // damping_den
    ranks = sym.select(F.col("s").alias("vtx")).distinct().withColumn(
        "mass", F.lit(unit).cast("bigint")
    )
    for i in range(iters):
        contrib = out_edges.join(
            ranks, out_edges.s == ranks.vtx
        ).select(
            F.col("d").alias("vtx"),
            F.expr("mass div o").alias("c"),
        )
        ranks = contrib.groupBy("vtx").agg(
            (
                F.lit(base)
                + F.expr(f"({damping_num} * sum(c)) div {damping_den}")
            )
            .cast("bigint")
            .alias("mass")
        )
        if i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def edge_jaccard(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-edge neighborhood Jaccard similarity — the classic
    link-prediction / community-strength feature:
    ``J(u,v) = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|`` for every undirected edge
    ``(u < v)``, where ``N(x)`` is x's adjacent vertex set (so v ∈ N(u)
    and u ∈ N(v): the union denominator is ``deg(u) + deg(v) − common``
    and is ≥ 2 for any real edge — no zero-division branch).

    |N(u) ∩ N(v)| for an EDGE is exactly the number of triangles through
    that edge, so the counting rides the same degree-oriented wedge
    closure as :func:`triangle_counts` (Suri & Vassilvitskii WWW'11) —
    O(m^1.5) wedge bound instead of the Σ deg(v)² a naive
    adjacency×adjacency self-join pays; a hub's edges all point inward
    and generate zero wedges. Each closed triangle (s,a,b) then credits
    its THREE canonical edges. Edges in no triangle surface with
    common = 0 via the left join back onto the canonical edge list.

    All counts are exact ints; the single jaccard division runs on
    int→double casts (bit-identical across engines, plans/catalog.py
    rules). Extends the reference's co-visitation signal (py:331-340)
    from pair-counts to normalized neighborhood overlap.

    Returns ``(u, v, common, deg_u, deg_v, jaccard)``.
    """
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("u").alias("vtx"))
        .unionAll(und.select(F.col("v").alias("vtx")))
        .groupBy("vtx")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    with_deg = (
        und.join(
            deg.withColumnRenamed("vtx", "u").withColumnRenamed("deg", "du"),
            "u",
        )
        .join(
            deg.withColumnRenamed("vtx", "v").withColumnRenamed("deg", "dv"),
            "v",
        )
        .cache()  # consumed by BOTH the orientation and the output join;
        # ReuseExchange does not dedupe shared subtrees (CLAUDE.md)
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.struct("dv", "v"))
            .otherwise(F.struct(F.col("du").alias("dv"), F.col("u").alias("v")))
            .alias("d"),
        )
        .select("s", F.col("d.v").alias("d"), F.col("d.dv").alias("dd"))
        .cache()
    )
    e1 = oriented.select("s", F.col("d").alias("a"), F.col("dd").alias("da"))
    e2 = oriented.select("s", F.col("d").alias("b"), F.col("dd").alias("db"))
    wedges = e1.join(e2, "s").filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    )
    closed = wedges.join(
        oriented.select(F.col("s").alias("a"), F.col("d").alias("b")),
        ["a", "b"],
        "inner",
    ).select("s", "a", "b")
    # each triangle (s,a,b) → its three canonical (min,max) edges
    tri_edges = closed.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("s", "a").alias("u"), F.greatest("s", "a").alias("v")
                ),
                F.struct(
                    F.least("s", "b").alias("u"), F.greatest("s", "b").alias("v")
                ),
                F.struct(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    per_edge = tri_edges.groupBy("u", "v").agg(
        F.count("*").cast("bigint").alias("common")
    )
    out = (
        with_deg.select("u", "v", "du", "dv")
        .join(per_edge, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.coalesce("common", F.lit(0)).cast("bigint").alias("common"),
            F.col("du").cast("bigint").alias("deg_u"),
            F.col("dv").cast("bigint").alias("deg_v"),
        )
    )
    return out.withColumn(
        "jaccard",
        F.col("common").cast("double")
        / (F.col("deg_u") + F.col("deg_v") - F.col("common")).cast("double"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    vertices of degree < k until none remain; the survivors are the
    (unique, order-independent) maximal subgraph with min degree ≥ k —
    the standard community-cohesion / crawler-spam filter next to
    triangles and Jaccard — a cohesion gate for the reference's
    co-visitation graph (py:331-340), like the other graph operators.

    Each round is one degree agg + two semi joins (edges keep only
    endpoints that survived); the loop runs O(peeling-rounds) times with
    a driver-side count check per round — same discipline (and the same
    honest caveat) as min-label connected components: rounds are
    data-shaped, bounded by the degeneracy ordering depth, typically
    ≪ 20 on real graphs. Not SQL-recursion expressible (fixpoint needs
    aggregation in the recursive term, which neither engine allows) →
    rows-only entry with the defining invariant locked in tests.

    Returns ``(vtx, deg)`` — vertices of the k-core with their degree
    WITHIN the core.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # localCheckpoint per round: the loop otherwise nests each round's
    # plan inside the next and planning blows up long before the data
    # does (same discipline as pagerank / connected_components)
    from pyspark.sql import Observation

    cur = und.localCheckpoint(eager=True)
    n_prev = cur.count()
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("u").alias("vtx"))
            .unionAll(cur.select(F.col("v").alias("vtx")))
            .groupBy("vtx")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("vtx")
        # surviving-edge count rides the checkpoint's own job as an
        # Observation metric (r13) — the old separate count() job per
        # peeling round is gone; count(*) is 0, never NULL, on empty
        obs = Observation()
        nxt = (
            cur.join(keep.withColumnRenamed("vtx", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("vtx", "v"), "v", "left_semi")
            .select("u", "v")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_now = obs.get["n"]
        cur = nxt
        if n_now == n_prev:
            break
        n_prev = n_now
    else:
        raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
    out = (
        cur.select(F.col("u").alias("vtx"))
        .unionAll(cur.select(F.col("v").alias("vtx")))
        .groupBy("vtx")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    return out


def bfs_distances(
    edges: DataFrame,
    source,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 30,
) -> DataFrame:
    """Single-source shortest hop distances over an undirected edge
    list — the SCALE path for reachability that `q_sql_recursive_bfs`'s
    recursive CTE enumerates by paths (exponential on dense graphs):
    classic frontier BFS, one round per hop level, each round ONE join
    (frontier → neighbors) + ONE left-anti (drop already-visited) +
    dedup. Work is O(edges-touched) total — every edge relaxes at most
    twice over the whole run, never per path — and rounds are bounded by
    the graph's hop diameter from the source (≤ ``max_hops``).
    localCheckpoint per round keeps the plan constant-size (k_core /
    pagerank discipline).

    Returns ``(node, min_hop)`` for every node reachable within
    ``max_hops`` (source included at hop 0). Deterministic exact ints →
    fully DuckDB-oracle-checkable against the recursive-CTE min-hop.
    Reachability over the reference's co-visitation pair graph
    (py:252-260 builds the edges this walks).
    """
    adj = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    adj = (
        adj.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .unionAll(adj.select(F.col("v").alias("x"), F.col("u").alias("y")))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Observation

    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(source, 0)], ["node", "min_hop"]
    ).localCheckpoint(eager=True)
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        # frontier size rides the checkpoint's job as an Observation
        # metric, and ``visited`` accumulates as a UNION of the per-hop
        # checkpointed frames instead of re-materializing per hop (r13):
        # one job per hop where the old loop paid three (checkpoint +
        # take(1) probe + visited re-checkpoint). Each union arm is a
        # LogicalRDD, so the anti-join right side never recomputes and
        # the plan stays ≤ max_hops unions wide.
        obs = Observation()
        nxt = (
            frontier.join(adj, frontier.node == adj.x)
            .select(F.col("y").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if obs.get["n"] == 0:
            break
        visited = visited.unionByName(
            nxt.select("node", F.lit(hop).alias("min_hop"))
        )
        frontier = nxt
    return visited.select(
        "node", F.col("min_hop").cast("bigint").alias("min_hop")
    )
