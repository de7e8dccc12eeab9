"""Sequence / market-basket operators — session-based recsys analytics.

The reference's candidate generators are co-occurrence driven (covis
self-joins, py:252-329) but it never materializes the *directed* session
dynamics those counts approximate. These operators close that gap —
first-order transition statistics (which item follows which) and directed
association rules (support / confidence / lift) — as one- and two-shuffle
DataFrame plans.

Scale notes:
- ``transition_counts`` is ONE window shuffle (hash by group) + one agg
  shuffle; the window stays inside whole-stage codegen (lead + project).
- ``association_rules`` reuses :func:`covis_pairs` (bounded by
  ``min_pair_count``) and joins two small aggregated dims — both sides of
  the final join are post-aggregation, orders of magnitude smaller than
  the event stream, so Spark broadcasts them.
- All ratios are IEEE double divisions of exact bigints — bit-identical
  across engines (plans/catalog.py determinism rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdata_retailrocket_recsys_spark.operators.joins import covis_pairs


def transition_counts(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    item_col: str,
    tiebreak_cols: list[str] | None = None,
    min_count: int = 1,
) -> DataFrame:
    """First-order (Markov) transition counts within ordered groups.

    For each group (session/user) ordered by ``order_col``, pairs every
    item with its immediate successor and counts `(src, dst)` transitions
    corpus-wide, attaching the row-level transition probability
    ``p = n / n_src_total`` (directed, self-transitions kept — a repeat
    view IS a signal).

    Replaces the reference's unordered covis heuristic (py:252-260) with
    the directed next-item statistic a sequential recommender trains on.

    Plan: one window shuffle (lead over group) + one aggregation shuffle;
    the per-src total comes from a window over the aggregated pairs
    (negligible — post-agg cardinality), not a re-scan.
    """
    order = [F.col(order_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(group_col).orderBy(*order)
    pairs = (
        df.select(group_col, order_col, *(tiebreak_cols or []), item_col)
        .withColumn("__dst", F.lead(item_col).over(w))
        .filter(F.col("__dst").isNotNull())
        .select(F.col(item_col).alias("src"), F.col("__dst").alias("dst"))
    )
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        counts = counts.filter(F.col("n") >= min_count)
    total_w = Window.partitionBy("src")
    return counts.withColumn(
        "p",
        F.col("n").cast("double") / F.sum("n").over(total_w).cast("double"),
    )


def association_rules(
    df: DataFrame,
    *,
    group_col: str,
    item_col: str,
    min_pair_count: int = 1,
) -> DataFrame:
    """Directed association rules over item co-occurrence in groups.

    Classic market-basket statistics from the same self-join the
    reference's covis candidates use (py:252-260): for every unordered
    co-occurring pair, emit BOTH directed rules ``a -> b`` and ``b -> a``
    with

    - ``support``    = n_ab / n_groups
    - ``confidence`` = n_ab / n_antecedent
    - ``lift``       = n_ab * n_groups / (n_a * n_b)

    Plan: covis pair counts (bounded by ``min_pair_count``) left as the
    fact; per-item group counts and the 1-row group total are broadcast;
    the two directed rules come from one ``explode`` of a 2-element
    struct array — no union, single pass.
    """
    base = df.select(group_col, item_col).distinct()
    pair_counts = covis_pairs(
        base, group_col=group_col, item_col=item_col, min_count=min_pair_count
    )
    item_counts = base.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    # 1-row lazy total, broadcast-cross-joined — no driver-side action
    totals = base.agg(F.countDistinct(group_col).alias("n_groups"))

    a_cnt = item_counts.select(
        F.col(item_col).alias("item_a"), F.col("n_item").alias("n_a")
    )
    b_cnt = item_counts.select(
        F.col(item_col).alias("item_b"), F.col("n_item").alias("n_b")
    )
    joined = (
        pair_counts.join(F.broadcast(a_cnt), "item_a")
        .join(F.broadcast(b_cnt), "item_b")
        .crossJoin(F.broadcast(totals))
    )
    directed = F.array(
        F.struct(
            F.col("item_a").alias("antecedent"),
            F.col("item_b").alias("consequent"),
            F.col("n_a").alias("n_ante"),
            F.col("n_b").alias("n_cons"),
        ),
        F.struct(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            F.col("n_b").alias("n_ante"),
            F.col("n_a").alias("n_cons"),
        ),
    )
    ng = F.col("n_groups").cast("double")
    return (
        joined.select(
            F.col("covis").alias("n_pair"),
            F.col("n_groups"),
            F.explode(directed).alias("r"),
        )
        .select(
            "r.antecedent",
            "r.consequent",
            "n_pair",
            (F.col("n_pair").cast("double") / ng).alias("support"),
            (
                F.col("n_pair").cast("double")
                / F.col("r.n_ante").cast("double")
            ).alias("confidence"),
            (
                F.col("n_pair").cast("double")
                * ng
                / (
                    F.col("r.n_ante").cast("double")
                    * F.col("r.n_cons").cast("double")
                )
            ).alias("lift"),
        )
    )


def key_skew_profile(
    df: DataFrame, key_col: str, *, bucket_width: int | None = None
) -> DataFrame:
    """Key-frequency skew histogram — the shuffle-planning diagnostic.

    Buckets keys by their row count — decimal digits of the count by
    default (order-of-magnitude view for heavy-tail detection), or fixed
    ``bucket_width`` linear bins — and reports, per bucket: how many keys
    land there, the min/max per-key count, and the total row share. A
    100 TB join planner reads this to decide salting / AQE skew
    thresholds before running the join (SURVEY §7.3: the covis self-join
    is the #1 scale risk; this is how you see the blowup coming without
    executing it).

    Plan: one agg shuffle (per-key counts) + one tiny re-agg; buckets
    use integer ops (``length(cast(n as string))`` / integer DIV) —
    identical in Spark and DuckDB, unlike ``log10`` (1-ulp libm
    divergence risk).
    """
    per_key = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    totals = df.agg(F.count(F.lit(1)).alias("n_total"))
    if bucket_width:
        bucket = F.expr(f"n DIV {int(bucket_width)} * {int(bucket_width)}")
    else:
        bucket = F.length(F.col("n").cast("string")).cast("bigint")
    return (
        per_key.withColumn("magnitude", bucket)
        .groupBy("magnitude")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.min("n").alias("min_rows_per_key"),
            F.max("n").alias("max_rows_per_key"),
            F.sum("n").alias("rows_total"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "magnitude",
            "n_keys",
            "min_rows_per_key",
            "max_rows_per_key",
            "rows_total",
            (
                F.col("rows_total").cast("double")
                / F.col("n_total").cast("double")
            ).alias("row_share"),
        )
    )


def skipgram_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Skip-gram (center, context) pair counts — the training-pair
    generation step of Word2Vec/item2vec (what gensim does inside its C
    loop, py:403-431, expressed relationally so it runs at corpus
    scale and feeds ANY embedding trainer).

    In-array assembly: per-document token array → nested ``transform``
    emits forward pairs (center, each of the next ``window`` tokens)
    WITHOUT a positional self-join (the lm_bigram_score precedent —
    zero extra shuffle for pair generation, fan-out bounded by
    window·len). Only FORWARD occurrences shuffle (map-side-combined
    count); the symmetric orientation is recovered on the counts table
    — ``n(c,x) = fwd(c,x) + fwd(x,c)``. Pre-combine row volume is half
    of a both-directions explode; on a SMALL pair vocabulary that win
    is already captured by partial aggregation (1M-doc / 5k-vocab soak:
    no wall-clock difference), but on realistic corpora the pair
    vocabulary is occurrence-scale, map-side combine cannot compress,
    and halving what reaches the exchange is the difference that
    matters. Identical output either way (locked by oracle + unit).
    """
    toks = docs.select(
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("__t")
    )
    arr = F.col("__t")
    fwd = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, window),
                lambda y: F.struct(x.alias("c"), y.alias("x")),
            ),
        )
    )
    fwd_counts = (
        toks.select(F.explode(fwd).alias("p"))
        .groupBy(F.col("p.c").alias("center"), F.col("p.x").alias("context"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sym = fwd_counts.unionAll(
        fwd_counts.select(
            F.col("context").alias("center"),
            F.col("center").alias("context"),
            "n",
        )
    )
    return (
        sym.groupBy("center", "context")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .filter(F.col("n") >= min_count)
    )


def frequent_sequences(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    item_col: str = "event_type",
    min_support: float = 0.5,
    max_pattern_length: int = 2,
) -> DataFrame:
    """Sequential pattern mining via MLlib PrefixSpan (Pei et al., the
    projection-based algorithm — no candidate-generation explosion),
    extending the reference's MLlib usage (Word2Vec, py:403-431) to
    order-aware patterns next to the unordered `association_rules`.

    Each user's journey becomes one sequence of singleton itemsets in
    the TOTAL (ts, tiebreak) order — ties must break deterministically
    or subsequence containment itself is nondeterministic. Support
    counts are exact sequence counts (ints); the threshold is Spark's
    ``ceil(minSupport · nSeqs)``, exact for dyadic minSupport values
    (0.5, 0.25 — document the choice; an arbitrary float threshold can
    straddle an integer across engines).

    Patterns flatten to ``a>b`` strings (driver-safe types). At 100 TB:
    sequence assembly is ONE groupBy shuffle; PrefixSpan distributes by
    projected-database partitioning (maxLocalProjDBSize bounds any
    single task's projection).

    Returns ``(pattern, freq)`` for patterns of length ≤
    ``max_pattern_length`` with ``freq ≥ ceil(min_support · n_users)``.
    """
    from pyspark.ml.fpm import PrefixSpan

    seqs = (
        events.filter(
            F.col(user_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(item_col).isNotNull()
            # the tiebreak must be non-null or the total order (and thus
            # subsequence containment itself) is engine-ambiguous
            & F.col(tiebreak_col).isNotNull()
        )
        .groupBy(user_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(tiebreak_col).alias("k"),
                            F.col(item_col).alias("x"),
                        )
                    )
                ),
                lambda s: F.array(s["x"]),
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
    )
    pat = ps.findFrequentSequentialPatterns(seqs)
    return pat.select(
        F.array_join(F.flatten("sequence"), ">").alias("pattern"),
        F.col("freq").cast("bigint").alias("freq"),
    )


def touch_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    touch_types: list[str] | None = None,
    lookback_seconds: int = 604800,
) -> DataFrame:
    """Multi-touch marketing attribution — per conversion, credit the
    touch events (clicks/views) in its lookback window, reported per
    channel under the three standard models at once: FIRST-touch,
    LAST-touch, and LINEAR (equal split). The funnel/cohort family's
    missing sibling: funnels count ordered step reach, attribution
    answers "which channel gets credit for the conversion".

    Exact-integer throughout: linear credit is ``1e6 div n`` ppm per
    touch (integer division — a conversion's total credit is n·(1e6
    div n), deliberately the floor allocation rather than a float
    split); first/last are rank==1 flags under a TOTAL order
    ((ts, touch id) asc / desc). Join shape: conversions ⋈ touches is
    an EQUI join on user with the lookback band as a residual
    predicate (touch strictly before the conversion, within
    ``lookback_seconds``) — never a cross/BNLJ; the three window
    functions (count, rank asc, rank desc) share ONE partitioning by
    conversion id (one exchange; partitions are bounded by a user's
    touch density in one lookback window). NULL user/ts rows cannot
    join or be ranked and are excluded up front.

    Output per channel: (channel, n_touches, n_conversions, n_first,
    n_last, credit_ppm).
    """
    touch_types = touch_types or ["click", "view"]
    base = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
    )
    conv = base.filter(F.col("__t") == conversion_type).select(
        F.col("__id").alias("conv_id"),
        F.col("__u"),
        F.col("__us").alias("__cus"),
    )
    tch = base.filter(F.col("__t").isin(touch_types)).select(
        F.col("__id").alias("touch_id"),
        F.col("__u"),
        F.col("__t").alias("channel"),
        F.col("__us").alias("__tus"),
    )
    lb = int(lookback_seconds) * 1_000_000
    j = conv.join(
        tch,
        (conv["__u"] == tch["__u"])
        & (tch["__tus"] < conv["__cus"])
        & (tch["__tus"] >= conv["__cus"] - F.lit(lb)),
    ).select("conv_id", "channel", "touch_id", "__tus")
    wp = Window.partitionBy("conv_id")
    wf = wp.orderBy(F.col("__tus").asc(), F.col("touch_id").asc())
    wl = wp.orderBy(F.col("__tus").desc(), F.col("touch_id").desc())
    r = (
        j.withColumn("__n", F.count(F.lit(1)).over(wp))
        .withColumn("__rf", F.row_number().over(wf))
        .withColumn("__rl", F.row_number().over(wl))
    )
    return r.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.countDistinct("conv_id").cast("bigint").alias("n_conversions"),
        F.sum(F.when(F.col("__rf") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_first"),
        F.sum(F.when(F.col("__rl") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_last"),
        F.sum(F.expr("CAST(1000000 AS BIGINT) div __n"))
        .cast("bigint")
        .alias("credit_ppm"),
    )
