"""Graph operators over relational edge lists.

Connected components (dedup clustering) lives in ``operators/dedup.py``;
this module holds the scoring side: PageRank over an edge list — the
classic "importance in the co-visitation graph" signal a recommender
blends with popularity (the reference's pop_cands strategy, py:331-340,
is the degenerate damping=1-iteration version of this).

Scale notes: each power iteration is ONE shuffle (contribution groupBy)
plus a broadcast of the dangling-mass scalar; lineage is truncated with
``localCheckpoint`` every few rounds so 10+ iterations don't build an
unexecutably deep plan (same discipline as connected_components).
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
    in tests). Fixed ``iters`` rounds (deterministic plan, no
    convergence-check actions in the loop beyond the dangling-mass
    scalar, which is a 1-row aggregate).

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
        # mass parked on dangling nodes (no out-edges) this round
        dangling = (
            ranks.join(srcs, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        contribs = (
            w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
