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


def binary_auc(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "y",
    n_shards: int = 32,
) -> DataFrame:
    """Exact ROC-AUC of a score column against binary labels via the
    rank (Mann-Whitney U) identity — tie-aware, no pair enumeration.

    ``AUC = (Σ_pos avgrank − n_pos(n_pos+1)/2) / (n_pos·n_neg)`` with
    average ranks for tied scores. Ranks come from `windows.global_rank`
    (shard+offset, no single-reducer window); within a tie group the
    row_number is partitioner-dependent, but only the group's
    ``min+max`` enters the statistic (= 2·avgrank — rank ranges are
    contiguous because range partitioning keeps equal keys together),
    so the result is deterministic and engine-exact: all-integer until
    ONE final IEEE division. NULL/NaN/inf scores and NULL labels are
    excluded (NaN would rank differently across engines). Rows whose
    label is not EXACTLY 0 or 1 are excluded too — the rank-sum formula
    silently corrupts under any other encoding (a -1/+1 scheme, or
    Spark's signed ``%`` emitting -1, would make n_pos a net of
    cancelling signs and push "AUC" outside [0,1]; caught by the 10M
    volume check). Re-encode multi-class labels before calling.

    Returns one row: (n_pos, n_neg, auc_num2, auc) where
    ``auc_num2 = 2·n_pos·n_neg·AUC`` exactly.
    """
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        global_rank,
    )

    s = F.col(score_col).cast("double")
    clean = scored.select(
        s.alias("__s"), F.col(label_col).cast("int").alias("__y")
    ).filter(
        s.isNotNull()
        & ~F.isnan(s)
        & (F.abs(s) != float("inf"))
        & F.col(label_col).cast("int").isin(0, 1)
    )
    r = global_rank(clean, [F.col("__s").asc()], n_shards=n_shards)
    g = r.groupBy("__s").agg(
        (F.min("rank") + F.max("rank")).cast("bigint").alias("r2"),
        F.sum("__y").cast("bigint").alias("npos_g"),
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
    )
    t = g.agg(
        F.sum("npos_g").cast("bigint").alias("n_pos"),
        F.sum(F.col("n_g") - F.col("npos_g")).cast("bigint").alias("n_neg"),
        F.sum(F.col("npos_g") * F.col("r2")).cast("bigint").alias("s2"),
    )
    num2 = (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("bigint")
    return t.select(
        "n_pos",
        "n_neg",
        num2.alias("auc_num2"),
        (
            num2.cast("double")
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


def reciprocal_rank_eval(
    test_next: DataFrame,
    topk: DataFrame,
    *,
    item_col: str = "item",
    group_col: str = "event_type",
    k: int = 10,
) -> DataFrame:
    """MRR@k — mean reciprocal rank of the true next item in a candidate
    list — as an EXACT-integer relational plan (the third standard
    offline recsys metric after hit-rate and DCG; rank-sensitive like
    DCG but with the 1/rank weighting retrieval papers report).

    Float-free trick: 1/rank for rank ∈ 1..k is made exact by scaling
    with L = lcm(1..k) (k=10 → 2520): ``rr_scaled = L div rank`` is an
    exact integer, so ``Σ rr_scaled`` aggregates without rounding and
    MRR = Σ/(L·n) needs ONE final IEEE division (bit-identical
    cross-engine — the binary_auc discipline). Misses contribute 0.

    Same join shape as :func:`next_item_eval`: the k-row candidate
    table broadcasts, facts never shuffle except the final group
    rollup. Returns per group: (n_test, n_hits, rr_scale,
    rr_sum_scaled, mrr).
    """
    import math

    scale = math.lcm(*range(1, k + 1))
    joined = test_next.join(
        F.broadcast(topk.filter(F.col("rank") <= k)), item_col, "left"
    )
    hit = F.col("rank").isNotNull()
    agg = joined.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_hits"),
        F.sum(
            F.when(hit, F.expr(f"CAST({scale} AS BIGINT) div rank")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rr_sum_scaled"),
    )
    return agg.select(
        group_col,
        "n_test",
        "n_hits",
        F.lit(scale).cast("bigint").alias("rr_scale"),
        "rr_sum_scaled",
        (
            F.col("rr_sum_scaled").cast("double")
            / (F.col("n_test") * F.lit(scale)).cast("double")
        ).alias("mrr"),
    )


def exposure_coverage_gini(
    recs: DataFrame,
    catalog: DataFrame,
    *,
    item_col: str = "item",
    n_shards: int = 32,
) -> DataFrame:
    """Catalog coverage + Gini exposure concentration of a
    recommendation slate — the BEYOND-accuracy offline metrics
    (Castells/Vargas diversity line): hit-rate can look great while the
    recommender only ever shows 40 blockbusters; coverage counts the
    catalog share that gets ANY exposure, Gini measures how unequally
    exposure concentrates (0 = uniform, →1 = one item takes all).

    Exact-integer identity: with exposure counts x_i sorted ASC
    (rank i = 1..n, ties broken by item — the Σ(2i−n−1)x_i statistic is
    TIE-INVARIANT since x is constant within a tie group and ranks are
    contiguous), ``gini = Σ(2i−n−1)·x_i / (n·Σx)``: numerator and
    denominator are exact bigints, ONE final IEEE division. Ranks come
    from the sharded `global_rank` (no single-reducer window over the
    item vocabulary); the 1-row totals frame broadcasts.

    Output (one row): (n_recommended, catalog_n, coverage_ppm,
    gini_num, gini_den, gini).
    """
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        global_rank,
    )

    exp = recs.filter(F.col(item_col).isNotNull()).groupBy(item_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__x")
    )
    ranked = global_rank(
        exp,
        [F.col("__x").asc(), F.col(item_col).asc()],
        n_shards=n_shards,
        out_col="__i",
    )
    cat_n = catalog.select(item_col).filter(
        F.col(item_col).isNotNull()
    ).distinct().agg(F.count(F.lit(1)).cast("bigint").alias("__cn"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_recommended"),
        F.sum("__x").cast("bigint").alias("__sx"),
        F.sum(
            (F.lit(2) * F.col("__i") - F.lit(1)) * F.col("__x")
        ).cast("bigint").alias("__s2ix"),
    )
    return (
        agg.crossJoin(F.broadcast(cat_n))
        .select(
            "n_recommended",
            F.col("__cn").alias("catalog_n"),
            F.expr(
                "CAST(n_recommended * 1000000 AS BIGINT) div __cn"
            ).alias("coverage_ppm"),
            (F.col("__s2ix") - F.col("n_recommended") * F.col("__sx"))
            .cast("bigint")
            .alias("gini_num"),
            (F.col("n_recommended") * F.col("__sx"))
            .cast("bigint")
            .alias("gini_den"),
            (
                (F.col("__s2ix") - F.col("n_recommended") * F.col("__sx"))
                .cast("double")
                / (F.col("n_recommended") * F.col("__sx")).cast("double")
            ).alias("gini"),
        )
    )


def forecast_mase(
    series: DataFrame,
    *,
    group_col: str,
    step_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Scaled forecast-error report per group (Hyndman & Koehler 2006's
    MASE construction): the mean absolute error of the SEASONAL-naive
    forecast (value ``season`` steps back) scaled by the one-step-naive
    MAE — the unit-free "is there weekly structure worth modeling?"
    readout (ratio < 1: seasonal-naive beats naive, seasonality is
    real). Inputs are per-(group, step) EXACT integers (cents, counts —
    the caller reduces facts to the series; decimal-guard floats
    first), so both absolute-error sums are exact bigints and the
    ratio is ONE IEEE division of cross-multiplied integers:
    ``(sae_s·n_1) / (sae_1·n_s)``.

    Lags run over the ordered step axis per group (missing steps lag to
    the previous OBSERVED step — documented; densify upstream for
    strict calendar lags). One window partitioning serves both lags.
    Output: (group, n_steps, n_e1, sae1, n_es, saes, mase).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(step_col).asc())
    v = F.col(value_col).cast("bigint")
    d = series.select(
        group_col,
        step_col,
        v.alias("__v"),
        (v - F.lag(v, 1).over(w)).alias("__e1"),
        (v - F.lag(v, season).over(w)).alias("__es"),
    )
    agg = d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.count("__e1").cast("bigint").alias("n_e1"),
        F.coalesce(F.sum(F.abs(F.col("__e1"))), F.lit(0))
        .cast("bigint")
        .alias("sae1"),
        F.count("__es").cast("bigint").alias("n_es"),
        F.coalesce(F.sum(F.abs(F.col("__es"))), F.lit(0))
        .cast("bigint")
        .alias("saes"),
    )
    return agg.select(
        group_col,
        "n_steps",
        "n_e1",
        "sae1",
        "n_es",
        "saes",
        F.when(
            (F.col("sae1") > 0) & (F.col("n_es") > 0),
            (F.col("saes") * F.col("n_e1")).cast("double")
            / (F.col("sae1") * F.col("n_es")).cast("double"),
        ).alias("mase"),
    )
