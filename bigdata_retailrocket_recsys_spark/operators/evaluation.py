"""Offline recommender evaluation operators.

The reference validates its training matrices by eyeballing counts
(py:636-660); production recsys work needs the actual offline metrics —
hit-rate@k / DCG@k against a temporally held-out next item. Implemented
as pure relational plans so they run at corpus scale: the candidate list
is a top-k table (broadcast), the held-out set is one window pass, and
every metric is exact-integer or µ-floored (cross-engine deterministic,
see plans/catalog.py float rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 1/log2(rank+1) DCG gain, µ-floored — ONE expression tree shared with
#: the DuckDB oracle (ln-quotient form; both engines' log2 would also
#: work but ln keeps the same 1-ulp-then-floor contract as tfidf/bm25).
DCG_GAIN_SQL = (
    "CAST(FLOOR(1e6 / (ln(CAST({rank} + 1 AS DOUBLE))"
    " / ln(CAST(2 AS DOUBLE)))) AS BIGINT)"
)


def popularity_topk(
    train: DataFrame, *, item_col: str = "item", k: int = 10
) -> DataFrame:
    """Global popularity top-k: (item, rank) with deterministic
    (count DESC, item ASC) ordering. The k-row result is meant to be
    broadcast — it is the whole 'model'."""
    counts = train.filter(F.col(item_col).isNotNull()).groupBy(item_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.orderBy(F.col("__n").desc(), F.col(item_col).asc())
    # k rows survive — the single-partition window sorts the ITEM
    # VOCABULARY (bounded), never the interaction facts
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(item_col, F.col("rank").cast("bigint").alias("rank"))
    )


def next_item_eval(
    test_next: DataFrame,
    topk: DataFrame,
    *,
    item_col: str = "item",
    group_col: str = "event_type",
) -> DataFrame:
    """Hit-rate@k and DCG@k of a candidate table against held-out next
    items.

    ``test_next``: one row per evaluation case with the true ``item_col``
    (+ a ``group_col`` to slice the report by). ``topk``: (item, rank)
    candidates (broadcast — it is k rows). Join is a broadcast left join;
    facts never shuffle except the final tiny group rollup.

    Returns per group: n_test, n_hits, hitrate_e6 (exact integer
    ``hits*1e6 div n``), dcg_u (sum of µ-floored 1/log2(rank+1) gains —
    deterministic cross-engine; divide by n_test off-line for the mean).
    """
    gain = F.expr(DCG_GAIN_SQL.format(rank="rank"))
    joined = test_next.join(F.broadcast(topk), item_col, "left")
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("rank").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hits"),
        F.expr(
            "CAST(sum(CASE WHEN rank IS NOT NULL THEN 1 ELSE 0 END)"
            " * 1000000 div count(1) AS BIGINT)"
        ).alias("hitrate_e6"),
        F.sum(F.when(F.col("rank").isNotNull(), gain).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dcg_u"),
    )
