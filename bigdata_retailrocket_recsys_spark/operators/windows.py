"""Window-function operators (SURVEY.md §2.5, W1-W4).

All windows take explicit tiebreaker columns — the reference's bare
``ORDER BY ts`` / ``ORDER BY metric DESC`` (py:96-101, 171-173, 280-287)
breaks ties arbitrarily, which is run-to-run nondeterministic (SURVEY §4.4).

Scale notes:
- ``topk_per_group`` / ``latest_per_key`` compile to Spark's
  WindowGroupLimit (rank-limit pushdown, Spark ≥3.5): each partition keeps
  only k rows per group *before* the shuffle-side sort materializes — the
  per-group top-k never holds a full group in memory.
- All operators are single-shuffle (hash by the partition keys) and stay
  inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _ordered_window(
    partition_by: list[str], order_by: list[Column | str]
) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def lag_delta(
    df: DataFrame,
    *,
    partition_by: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
    out_col: str = "gap_us",
) -> DataFrame:
    """W1 — previous-row timestamp delta per group, exact integer µs
    (reference: lag(ts) at py:96-101 + float-seconds diff at py:103-109).
    NULL for the first row of each group (py:106)."""
    order: list[Column | str] = [F.col(ts_col), *(tiebreak_cols or [])]
    w = _ordered_window(partition_by, order)
    return df.withColumn(
        out_col, F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    )


def running_sum(
    df: DataFrame,
    value: Column,
    *,
    partition_by: list[str],
    order_by: list[Column | str],
    out_col: str,
) -> DataFrame:
    """W2 — cumulative sum over rows unbounded-preceding..current
    (reference: session-ordinal running sum, py:119-123)."""
    w = _ordered_window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value).over(w))


def latest_per_key(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """W3 — keep the most recent row per key (reference: latest category per
    item, row_number OVER (... ORDER BY ts DESC) = 1 at py:171-173)."""
    order: list[Column] = [F.col(ts_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).desc())
    w = _ordered_window(key_cols, order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """W4 — per-group top-k via row_number + rank filter (reference:
    top-15 co-vis / top-10 co-occur / 10 most-recent at py:280-287, 322-329,
    354-362). Compiles to WindowGroupLimit — no full per-group sort."""
    w = _ordered_window(group_cols, order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def prefix_counts_window(
    df: DataFrame,
    *,
    group_col: str,
    ts_col: str = "ts",
    item_col: str | None = None,
) -> DataFrame:
    """Cumulative prefix statistics with ONE shuffle and NO join.

    When the anchors are rows of the SAME event stream (the RetailRocket
    case: every add-to-cart is itself an event of its session), the
    anchor-prefix theta join (joins.prefix_agg_join, ref py:465-471) is
    overkill — a range window ``RANGE BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING`` over epoch-µs computes "events strictly before this row in
    its group" in place: one hash shuffle on the group, no second pass, no
    join fan-out. Strictness matches the reference's ``se.ts < a.atc_ts``
    (ties at the same microsecond are excluded on both paths).

    Adds per row: ``n_prefix_events``; with ``item_col`` also
    ``n_prefix_items`` (distinct items strictly before, via
    size(collect_set) — exact, window-legal where countDistinct is not)
    and ``session_start_us`` (first event time in the whole group).
    """
    ts_us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_us)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn("n_prefix_events", F.count(F.lit(1)).over(w))
    if item_col:
        out = out.withColumn(
            "n_prefix_items", F.size(F.collect_set(item_col).over(w))
        ).withColumn(
            "session_start_us",
            F.min(ts_us).over(Window.partitionBy(group_col)),
        )
    return out


def resample_ffill(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Fixed-interval resampling with forward fill — the time-series
    regularization shape (sensor/metric streams → one row per key per
    bucket, gaps carrying the last observation forward).

    Three steps, all shuffle-partitionable by key: (1) per-key min/max
    bucket bounds → `sequence()` + explode generates the dense grid
    JVM-side (no driver-side date arithmetic); (2) per-bucket latest
    observation picked deterministically by (ts, tiebreak) —
    WindowGroupLimit applies; (3) one cumulative window carries the last
    non-null value forward. NULL observations are skipped by the fill
    (``ignorenulls``), matching SQL ``LAST_VALUE(x IGNORE NULLS)``.

    Output: key cols, ``bucket`` (timestamp), ``value_ffill``.
    """
    bucket = F.date_trunc(unit, F.col(ts_col))
    bounds = df.groupBy(*key_cols).agg(
        F.min(bucket).alias("__b0"), F.max(bucket).alias("__b1")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("__b0", "__b1", F.expr(f"interval 1 {unit}"))
        ).alias("bucket"),
    )
    w_latest = Window.partitionBy(*key_cols, "__b").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    latest = (
        df.select(
            *key_cols, bucket.alias("__b"), F.col(ts_col), F.col(tiebreak_col),
            F.col(value_col),
        )
        .withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .select(*key_cols, F.col("__b").alias("bucket"), F.col(value_col))
    )
    w_ffill = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(latest, [*key_cols, "bucket"], "left").withColumn(
        "value_ffill", F.last(value_col, ignorenulls=True).over(w_ffill)
    ).drop(value_col)


def global_ntile(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    *,
    n_shards: int = 32,
    partition_by: list[str] | None = None,
    out_col: str = "ntile",
) -> DataFrame:
    """SQL ``NTILE(k) OVER (ORDER BY ...)`` without the single-reducer
    window a global ORDER BY normally compiles to.

    Range-partition on the order columns (shards are order-contiguous),
    ``row_number`` per shard, then add each shard's offset from a
    broadcast ``n_shards``-row count table — the same shard+offset move
    as ``features.popularity_negative_samples`` / ``pack_sequences``.
    The global rank is exact, so the closed-form NTILE bucket
    (first ``n % k`` buckets get ``n div k + 1`` rows, the rest
    ``n div k``) is bit-identical to the SQL function for ANY
    ``n_shards``.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker) —
    with ties the rank, and therefore the bucket, would be
    partitioner-dependent. At 100 TB this is the quantile-bucketing
    primitive (RFM scores, decile features): facts flow through one
    range exchange instead of funnelling into one task.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    res = _sharded_global_rank(df, order_by, n_shards, partition_by)
    # NTILE closed form over global rank r in [1, n]:
    #   q = n div k, m = n % k; first m buckets hold q+1 rows.
    r = "(__rn + __off)"
    q = f"(__n div {k})"
    m = f"(__n % {k})"
    bucket = F.expr(
        f"CASE WHEN {r} <= ({q} + 1) * {m} THEN ({r} - 1) div ({q} + 1) + 1 "
        f"ELSE {m} + ({r} - ({q} + 1) * {m} - 1) div {q} + 1 END"
    ).cast("int")
    return res.withColumn(out_col, bucket).drop("__shard", "__rn", "__off", "__n")


def _sharded_global_rank(
    df: DataFrame,
    order_by: list[Column],
    n_shards: int,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Internal: df + ``__rn``/``__off``/``__n`` such that ``__rn+__off``
    is the ROW_NUMBER over ``order_by`` (per ``partition_by`` group if
    given, else global) and ``__n`` the (group) total — one range
    exchange + a broadcast offset table, never a single-reducer window.
    Shared by `global_ntile` / `global_rank`.

    With ``partition_by``, the range partitioning leads with the group
    columns, so each group's shards are CONTIGUOUS in the tuple order
    and per-(group, shard) count cumsums give exact in-group ranks. The
    offset table is ≤ groups·shards rows, so this form is for FEW huge
    groups (the per-returnflag winsorize case — 3 groups that would each
    be a single-reducer window otherwise); high-cardinality groups
    should use a plain partitioned window, which already parallelizes.

    The ranked table is CACHED: the offset table derives from it, so the
    plan references it twice, and Spark does not reuse the subtree
    (verified — no ReusedExchange even under AQE). Without the cache
    every chained call doubles the upstream compute (a 3-metric RFM
    would re-run its input aggregate 8×). One materialization is the
    structural price of data-dependent offsets — S7 discipline."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    grp = [F.col(c) for c in (partition_by or [])]
    part = df.repartitionByRange(n_shards, *grp, *order_by).withColumn(
        "__shard", F.spark_partition_id()
    )
    gnames = list(partition_by or [])
    local = part.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__shard", *gnames).orderBy(*order_by)
        ),
    ).cache()
    counts = local.groupBy("__shard", *gnames).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_prev = Window.partitionBy(*gnames).orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*gnames).orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "__shard",
        *gnames,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0))
        .cast("bigint")
        .alias("__off"),
        F.sum("__cnt").over(w_all).cast("bigint").alias("__n"),
    )
    # null-SAFE equality on the group columns: a plain name-list join
    # drops NULL-group rows entirely (caught by q_quality_length_iqr on
    # the adversarial fixture — a NULL source must form its own group,
    # not vanish). Window partitioning and groupBy already treat NULL as
    # a group; the join-back must too.
    loc, off = local.alias("__l"), offs.alias("__o")
    cond = F.col("__l.__shard") == F.col("__o.__shard")
    for g in gnames:
        cond = cond & F.col(f"__l.{g}").eqNullSafe(F.col(f"__o.{g}"))
    return loc.join(F.broadcast(off), cond).select(
        "__l.*", F.col("__o.__off").alias("__off"), F.col("__o.__n").alias("__n")
    )


def _sharded_prefix_sum(
    df: DataFrame,
    order_by: list[Column],
    weight_col: str,
    n_shards: int,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Internal: df + ``__cum``/``__tot`` where ``__cum`` is the
    inclusive running sum of ``weight_col`` over ``order_by`` (per
    ``partition_by`` group if given) and ``__tot`` the group total —
    the `_sharded_global_rank` move applied to SUMS: one range
    exchange (group-leading, so each group's shards are contiguous),
    per-shard windowed cumsum, and a ≤ groups·shards-row broadcast
    offset table. Never a single-reducer window.

    PRECONDITION: ``order_by`` must be unique within each group
    (pre-aggregate to one row per key first) — RangePartitioner keeps
    equal keys in one shard, but intra-tie cumsum order would still be
    nondeterministic. The per-shard frame is CACHED (offsets derive
    from it; Spark never reuses the subtree) — same S7 price as
    `_sharded_global_rank`."""
    out = _sharded_prefix_sums(
        df, order_by, [weight_col], n_shards, partition_by
    )
    return out.withColumnsRenamed(
        {f"__cum_{weight_col}": "__cum", f"__tot_{weight_col}": "__tot"}
    )


def _sharded_prefix_sums(
    df: DataFrame,
    order_by: list[Column],
    weight_cols: list[str],
    n_shards: int,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Multi-weight form of :func:`_sharded_prefix_sum`: ALL the
    running sums ride ONE range exchange, one cached per-shard frame,
    and one broadcast offset table — for consumers that need several
    cumulative lines over the same axis (ks_two_sample's two ECDFs;
    ADVICE r10: the two single-weight calls each re-ran the base
    scan+collapse). Adds ``__cum_<col>``/``__tot_<col>`` per weight
    column."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    grp = [F.col(c) for c in (partition_by or [])]
    gnames = list(partition_by or [])
    part = df.repartitionByRange(n_shards, *grp, *order_by).withColumn(
        "__shard", F.spark_partition_id()
    )
    w_cum = (
        Window.partitionBy("__shard", *gnames)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumns(
        {f"__lcum_{wc}": F.sum(wc).over(w_cum) for wc in weight_cols}
    ).cache()
    counts = local.groupBy("__shard", *gnames).agg(
        *[F.sum(wc).alias(f"__cnt_{wc}") for wc in weight_cols]
    )
    w_prev = Window.partitionBy(*gnames).orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*gnames).orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "__shard",
        *gnames,
        *[
            F.coalesce(F.sum(f"__cnt_{wc}").over(w_prev), F.lit(0))
            .cast("bigint")
            .alias(f"__coff_{wc}")
            for wc in weight_cols
        ],
        *[
            F.sum(f"__cnt_{wc}")
            .over(w_all)
            .cast("bigint")
            .alias(f"__tot_{wc}")
            for wc in weight_cols
        ],
    )
    loc, off = local.alias("__l"), offs.alias("__o")
    cond = F.col("__l.__shard") == F.col("__o.__shard")
    for g in gnames:
        cond = cond & F.col(f"__l.{g}").eqNullSafe(F.col(f"__o.{g}"))
    out = loc.join(F.broadcast(off), cond).select(
        "__l.*",
        *[
            (F.col(f"__l.__lcum_{wc}") + F.col(f"__o.__coff_{wc}"))
            .cast("bigint")
            .alias(f"__cum_{wc}")
            for wc in weight_cols
        ],
        *[F.col(f"__o.__tot_{wc}").alias(f"__tot_{wc}") for wc in weight_cols],
    )
    return out.drop(*[f"__lcum_{wc}" for wc in weight_cols])


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    *,
    n_shards: int = 32,
    partition_by: list[str] | None = None,
    out_col: str = "rank",
) -> DataFrame:
    """``ROW_NUMBER() OVER ([PARTITION BY ...] ORDER BY ...)`` via the
    shard+offset move (see `global_ntile`) — exact, and identical for
    any ``n_shards``. ``partition_by`` is for FEW huge groups (each one
    otherwise a single-reducer window); see `_sharded_global_rank`.
    ``order_by`` should be a total order; with ties the rank WITHIN a
    tie group is partitioner-dependent (rank-range aggregates per tie
    group — min/max/sum — remain deterministic, which is what tie-aware
    consumers like AUC use)."""
    if out_col in ("__shard", "__rn", "__off", "__n"):
        raise ValueError(f"out_col {out_col!r} collides with internals")
    res = _sharded_global_rank(df, order_by, n_shards, partition_by)
    return (
        res.withColumn(out_col, (F.col("__rn") + F.col("__off")).cast("bigint"))
        .drop("__shard", "__rn", "__off", "__n")
    )
