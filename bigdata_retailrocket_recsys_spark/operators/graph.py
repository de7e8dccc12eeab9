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
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # edge weight = 1/outdeg of the source, fixed for all iterations
    w = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).cache()
    srcs = outdeg.select(F.col("src").alias("node"))

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for i in range(iters):
        # mass parked on dangling nodes (no out-edges) this round:
        # a 1-row aggregate kept IN the dataflow (broadcast nested-loop
        # join fans the scalar to every row — no driver round-trip)
        dangling = ranks.join(srcs, "node", "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_m")
        )
        contribs = (
            w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
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
    return ranks
