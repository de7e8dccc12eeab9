"""Physical-design advisory: zone-map clustering effectiveness.

"Automated Clustering Recommendation With Database Zone Maps" (SIGMOD'24,
see PAPERS.md) observes that a zone map (per-file min/max, what parquet
row-group stats are) only skips I/O for columns the physical row order
CLUSTERS — and that the decision "which column should the table be
re-clustered by" can be driven by measuring, per candidate column, how
narrow each zone's value range is relative to the column's full range.

This operator computes that diagnostic relationally: rows are assigned to
zones in their CURRENT order (a deterministic surrogate order column at
this engine's level — file/row-group position at rest), then per
(column, zone) min/max widths are normalized by the global range and
averaged. avg width ≈ 0 → already clustered (zone maps skip almost
everything); ≈ 1 → random layout (zone maps useless; re-cluster by this
column if it is filter-hot). The engine's `q_sink_sorted_pruning` /
`q_sink_zorder_pruning` are the actuators this advisor chooses between.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zone_clustering_profile(
    df: DataFrame,
    order_col: str,
    candidates: dict[str, Column],
    *,
    rows_per_zone: int = 1000,
) -> DataFrame:
    """Per-candidate-column zone-map effectiveness under the layout
    implied by ordering on ``order_col``.

    ``candidates`` maps output names to NUMERIC expressions (cast dates/
    timestamps to epoch ints first; guard NaN to NULL — NULLs are
    ignored like parquet stats ignore them). Zones are consecutive
    ``rows_per_zone`` blocks in ``order_col`` order (the at-rest file
    order surrogate), assigned with the sharded global_rank — no
    single-reducer window. Returns one row per candidate:
    ``(column, n_zones, avg_zone_width_e6)`` where width is the zone's
    (max-min)/(global max-min) µ-floored AFTER averaging in exact
    arithmetic is impossible (widths are data-dependent doubles) — so
    each zone width is µ-floored, then integer-averaged (`div`), making
    the whole statistic engine-exact.
    """
    if not candidates:
        raise ValueError("no candidate columns")
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        global_rank,
    )

    named = df.select(
        F.col(order_col).alias("__o"),
        *[expr.cast("double").alias(name) for name, expr in candidates.items()],
    )
    ranked = global_rank(
        named, [F.col("__o").asc()], out_col="__grn"
    ).withColumn("__zone", F.expr(f"(__grn - 1) div {rows_per_zone}"))
    stacked = ranked.select(
        "__zone",
        F.expr(
            "stack({n}, {pairs}) AS (column, v)".format(
                n=len(candidates),
                pairs=", ".join(f"'{c}', {c}" for c in candidates),
            )
        ),
    ).filter(
        F.col("v").isNotNull()
        & ~F.isnan("v")
        & (F.abs("v") != float("inf"))
    )
    zones = stacked.groupBy("column", "__zone").agg(
        F.min("v").alias("zmin"), F.max("v").alias("zmax")
    )
    glob = stacked.groupBy("column").agg(
        F.min("v").alias("gmin"), F.max("v").alias("gmax")
    )
    width_u = F.when(
        F.col("gmax") > F.col("gmin"),
        F.floor(
            (F.col("zmax") - F.col("zmin"))
            * F.lit(1000000.0)
            / (F.col("gmax") - F.col("gmin"))
        ),
    ).otherwise(0).cast("bigint")
    return (
        zones.join(F.broadcast(glob), "column")
        .withColumn("width_u", width_u)
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_zones"),
            F.expr("CAST(sum(width_u) div count(1) AS BIGINT)").alias(
                "avg_zone_width_e6"
            ),
        )
    )
