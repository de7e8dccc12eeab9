"""Join operators (SURVEY.md §2.3, J1-J8).

The interesting shapes are the reference's point-in-time ("prefix") theta
joins and the co-visitation self-join:

- J2  prefix join: ``a.key = b.key AND b.ts < a.ts`` — all rows strictly
  before an anchor, same group (py:235-239, 265-268, 305-309, 466-471).
- J5  PIT join: as-of lookup of the latest prior row (py:349-353).
- J3  co-visitation self-join: ``a.key = b.key AND a.item < b.item``
  (py:252-257, 295-300) — the `<` dedupes unordered pairs & self-pairs.

Scale design:
- Spark executes equality+inequality joins as SortMergeJoin on the equality
  key with the inequality as a residual predicate — fan-out equals the full
  per-key cross product *before* filtering. Where the downstream use is an
  aggregation over the prefix, ``prefix_agg_join`` therefore pre-aggregates
  per (key, attribute) BEFORE joining to anchors when algebraically legal,
  or uses cumulative windows (``prefix_counts_window``) which need ONE
  shuffle and no join at all.
- ``covis_pairs`` caps events per group first (``max_per_group``) — the
  reference's quadratic blowup control is only post-hoc HAVING thresholds
  (py:260,303); at 100 TB you must bound the pair generation itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_agg_join(
    anchors: DataFrame,
    events: DataFrame,
    *,
    key_cols: list[str],
    anchor_ts: str,
    event_ts: str,
    aggs: list[Column],
    how: str = "left",
    strict: bool = True,
) -> DataFrame:
    """J2 — theta join anchors⋈events on key equality + ``event_ts <
    anchor_ts`` (strictly-before, half-open — SURVEY §4.4), then aggregate
    the prefix per anchor row.

    ``anchors`` must carry a unique row identity (its key cols + anchor_ts
    must identify rows — pre-distinct if not). ``aggs`` are expressions over
    the event side, e.g. ``F.count(F.lit(1)).alias("n_prefix")``.
    """
    a = anchors.alias("a")
    e = events.alias("e")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"e.{k}"))
    cmp = F.col(f"e.{event_ts}") < F.col(f"a.{anchor_ts}") if strict else (
        F.col(f"e.{event_ts}") <= F.col(f"a.{anchor_ts}")
    )
    joined = a.join(e, cond & cmp, how)
    group = [F.col(f"a.{c}") for c in anchors.columns]
    return joined.groupBy(*group).agg(*aggs)


def pit_last_join(
    anchors: DataFrame,
    events: DataFrame,
    *,
    key_cols: list[str],
    anchor_ts: str,
    event_ts: str,
    value_aggs: list[Column],
) -> DataFrame:
    """J5 — point-in-time as-of aggregate: for each anchor, aggregate over
    the latest state strictly before it (reference: user history
    ``last_seen < atc_ts`` at py:349-353). Same mechanics as
    ``prefix_agg_join`` — kept separate for intent."""
    return prefix_agg_join(
        anchors,
        events,
        key_cols=key_cols,
        anchor_ts=anchor_ts,
        event_ts=event_ts,
        aggs=value_aggs,
        how="left",
    )


def covis_pairs(
    df: DataFrame,
    *,
    group_col: str,
    item_col: str,
    count_distinct_col: str | None = None,
    min_count: int = 1,
    max_per_group: int | None = None,
    ts_col: str | None = None,
    pair_strategy: str = "auto",
    aggregate: bool = True,
    symmetric: bool = False,
) -> DataFrame:
    """J3 — unordered co-occurrence pairs within a group.

    ``symmetric=True`` (r13, aggregate-mode only): emit BOTH orientations
    (a,b) and (b,a) from ONE pass — the pair condition becomes ``!=``
    instead of ``<`` so each unordered pair contributes two rows to the
    same single count aggregate. Value-identical to
    ``pairs.union(pairs-flipped)`` of the default output, but that union
    re-executes the whole pair pipeline twice (Spark never reuses a
    twice-referenced subtree — S7); this form pays one pipeline and one
    exchange with 2× the aggregate input rows.

    Self-join ``a.group = b.group AND a.item < b.item``; `<` drops self-pairs
    and (b,a) duplicates (reference py:252-260). Output:
    ``item_a, item_b, covis`` (+ HAVING ``covis >= min_count``).

    ``max_per_group`` keeps only the most recent N items per group before
    pairing (needs ``ts_col``) — bounds the quadratic fan-out at scale.

    ``pair_strategy``:

    - ``"array"`` — collect the group's distinct items into an array (one
      shuffle), generate pairs with JVM higher-order functions, explode,
      count (second shuffle). 2 shuffles total vs the self-join's 4-5;
      requires per-group item counts to be bounded (a cap, or a naturally
      small item domain like categories) since one group's pairs
      materialize inside a single row before the explode.
    - ``"selfjoin"`` — the relational SortMergeJoin form; per-group size
      only affects row fan-out, never single-row memory. The safe default
      for unbounded groups.
    - ``"auto"`` — array when ``max_per_group`` bounds the group, else
      selfjoin.

    Both strategies are value-identical (items are distinct per group, so a
    pair occurs once per group either way).

    NULL discipline (SQL-join parity): the relational form's
    ``a.group = b.group AND a.item < b.item`` never matches NULL groups or
    NULL items; the array form's groupBy WOULD form a NULL-group row and
    pair its items, so both paths drop NULL group/item rows up front.

    ``aggregate=False`` returns the RAW per-group pair rows
    ``(group, item_a, item_b)`` before the covis count — the per-group
    pair listing, and the frame whose task layout the skew tests probe
    (its partitions are exactly the pair-materialization stage's tasks).
    """
    df = df.filter(
        F.col(group_col).isNotNull() & F.col(item_col).isNotNull()
    )
    if symmetric and not aggregate:
        raise ValueError("symmetric=True requires aggregate=True")
    if count_distinct_col not in (None, group_col):
        pair_strategy = "selfjoin"  # array path can't count a third column
    elif pair_strategy == "auto":
        pair_strategy = "array" if max_per_group else "selfjoin"
    if max_per_group and not ts_col:
        raise ValueError("max_per_group requires ts_col")

    if pair_strategy == "array":
        # no pre-distinct: the (group, item[, ts]) dedup happens INSIDE the
        # group's array (array_distinct / collect_set) — one exchange (hash
        # by group) instead of two (distinct's + the groupBy re-exchange),
        # value-identical (A/B-verified vs the distinct form)
        if max_per_group:
            # top-N (ts desc, item desc) rows per group — same ranking the
            # window form uses; struct sort is lexicographic so
            # reverse(array_sort) == ORDER BY ts DESC, item DESC;
            # array_distinct first so duplicate (ts, item) observations
            # don't eat top-N slots (≡ the old distinct() semantics)
            g = df.groupBy(group_col).agg(
                F.slice(
                    F.reverse(
                        F.array_sort(
                            F.array_distinct(
                                F.collect_list(
                                    F.struct(
                                        F.col(ts_col).alias("t"),
                                        F.col(item_col).alias("i"),
                                    )
                                )
                            )
                        )
                    ),
                    1,
                    max_per_group,
                ).alias("top")
            )
            g = g.select(
                group_col,
                F.array_distinct(
                    F.transform(F.col("top"), lambda s: s["i"])
                ).alias("items"),
            )
        else:
            g = df.groupBy(group_col).agg(
                F.collect_set(item_col).alias("items")
            )
        arr = F.col("items")
        pairs_arr = F.flatten(
            F.transform(
                arr,
                lambda x: F.transform(
                    F.filter(
                        arr,
                        (lambda y: y != x) if symmetric else (lambda y: y > x),
                    ),
                    lambda y: F.struct(
                        x.alias("item_a"), y.alias("item_b")
                    ),
                ),
            )
        )
        raw = g.select(
            F.col(group_col), F.explode(pairs_arr).alias("p")
        ).select(group_col, "p.item_a", "p.item_b")
        if not aggregate:
            return raw
        out = raw.groupBy("item_a", "item_b").agg(
            F.count(F.lit(1)).alias("covis")
        )
        if min_count > 1:
            out = out.filter(F.col("covis") >= min_count)
        return out

    items = df.select(
        group_col, item_col, *([ts_col] if ts_col else [])
    ).distinct()
    if max_per_group:
        w = Window.partitionBy(group_col).orderBy(
            F.col(ts_col).desc(), F.col(item_col).desc()
        )
        items = (
            items.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_per_group)
            .drop("__rn")
        )
    items = items.select(group_col, item_col).distinct()
    a = items.alias("a")
    b = items.alias("b")
    pair_cond = (
        F.col(f"a.{item_col}") != F.col(f"b.{item_col}")
        if symmetric
        else F.col(f"a.{item_col}") < F.col(f"b.{item_col}")
    )
    pairs = a.join(
        b,
        (F.col(f"a.{group_col}") == F.col(f"b.{group_col}")) & pair_cond,
        "inner",
    )
    if not aggregate:
        return pairs.select(
            F.col(f"a.{group_col}").alias(group_col),
            F.col(f"a.{item_col}").alias("item_a"),
            F.col(f"b.{item_col}").alias("item_b"),
        )
    metric = (
        F.countDistinct(F.col(f"a.{count_distinct_col}"))
        if count_distinct_col
        else F.count(F.lit(1))
    )
    out = pairs.groupBy(
        F.col(f"a.{item_col}").alias("item_a"),
        F.col(f"b.{item_col}").alias("item_b"),
    ).agg(metric.alias("covis"))
    if min_count > 1:
        out = out.filter(F.col("covis") >= min_count)
    return out


def asof_join(
    anchors: DataFrame,
    events: DataFrame,
    *,
    key_cols: list[str],
    anchor_ts: str,
    event_ts: str,
    value_cols: list[str],
    tiebreak_col: str,
    strict: bool = True,
    prefix: str = "prev_",
) -> DataFrame:
    """True as-of join: attach the SINGLE nearest-preceding event to each
    anchor row (reference builds the as-of *pattern* from theta joins,
    py:349-353 — this is the proper operator the reference lacks,
    SURVEY §2.3 "ASOF joins proper").

    Spark-first plan: instead of a SortMergeJoin with residual inequality
    (whose intermediate fan-out is anchors × full per-key event history),
    union both sides into one stream and take a running ``last`` over a
    window — ONE shuffle on the key, ONE sort, zero join fan-out. This is
    the formulation that survives 100 TB: cost is O(n log n) per key,
    independent of history length per anchor.

    Semantics: for each anchor, the event with the greatest
    ``(event_ts, tiebreak_col)`` such that ``event_ts < anchor_ts``
    (strictly before — SURVEY §4.4 half-open discipline; ``strict=False``
    for ``<=``). Anchors with no preceding event get NULLs. Event rows with
    NULL values are matched as-is (the carried payload is a struct, so a
    NULL field does not fall through to an older event).

    Output: all anchor columns + ``prefix + value_col`` for each value col
    + ``prefix + event_ts``.

    NULL discipline (SQL-join parity): event rows with a NULL key or NULL
    ``event_ts`` can never satisfy ``e.key = a.key AND e.ts < a.ts`` in the
    relational formulation, so they are filtered before the union —
    otherwise the window partitioning (which groups NULL keys together,
    unlike a join) would fabricate matches. NULL-key/NULL-ts ANCHORS are
    kept and come out unmatched (left-join semantics): a NULL-ts anchor
    sorts before every event in its partition (NULLS FIRST) and a NULL-key
    anchor shares its partition only with other NULL-key anchors.
    """
    a_cols = anchors.columns
    for k in key_cols:
        events = events.filter(F.col(k).isNotNull())
    events = events.filter(F.col(event_ts).isNotNull())
    payload = F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col(event_ts).alias("__ets"),
    )
    # __pos orders same-ts rows: strict → anchors (0) BEFORE events (1) so
    # an event at exactly anchor_ts is invisible; non-strict → events (0)
    # first so it is visible.
    ev_side = events.select(
        *[F.col(c) for c in key_cols],
        F.col(event_ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__pos"),
        F.col(tiebreak_col).alias("__tb"),
        payload.alias("__payload"),
        *[F.lit(None).cast(anchors.schema[c].dataType).alias(f"__a_{c}")
          for c in a_cols],
    )
    an_side = anchors.select(
        *[F.col(c) for c in key_cols],
        F.col(anchor_ts).alias("__ts"),
        F.lit(0 if strict else 1).alias("__pos"),
        F.lit(None).cast(ev_side.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(ev_side.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__a_{c}") for c in a_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__pos", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ev_side.unionByName(an_side).withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("__payload").isNull()).select(
        *[F.col(f"__a_{c}").alias(c) for c in a_cols],
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in value_cols],
        F.col("__match.__ets").alias(f"{prefix}{event_ts}"),
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_val: str,
    right_val: str,
    eps: float,
    extra_cond: Column | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """ε-band join: pairs with ``|left.val - right.val| <= eps`` (optionally
    also equal on ``key_cols``).

    Naive form is a cross join with a residual predicate —
    BroadcastNestedLoopJoin, quadratic, dead at scale. This bucketizes both
    sides by ``floor(val / eps)``: any ε-close pair differs by at most one
    bucket, so the left side is exploded to buckets {b-1, b, b+1} and the
    join is a plain equi join on (key, bucket) — shuffle-partitionable,
    AQE-skew-splittable. Each qualifying pair matches exactly once (the
    right row's bucket is unique). The exact band predicate is re-applied
    after the equi join.

    Output: left columns aliased ``a_*``, right columns ``b_*``.

    Non-finite discipline: NULL/NaN/±inf values can never satisfy
    ``|a - b| <= eps`` (NaN comparisons are false, inf-inf is NaN), but
    they DO break the bucketing — ``floor(±inf / eps)`` saturates to
    Long.MAX/MIN and the ±1 neighbour arithmetic overflows under ANSI.
    Both sides filter to finite values first: value-identical to the
    theta-join semantics, and the scan-side filter is pushed down.
    """

    def _finite(df: DataFrame, val: str) -> DataFrame:
        c = F.col(val)
        return df.filter(
            c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))
        )

    left = _finite(left, left_val)
    right = _finite(right, right_val)
    lb = F.floor(F.col(left_val) / F.lit(eps))
    rb = F.floor(F.col(right_val) / F.lit(eps))
    key_cols = key_cols or []
    l = left.select(
        *[F.col(c).alias(f"a_{c}") for c in left.columns],
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("__bucket"),
        *[F.col(c).alias(f"__lk_{c}") for c in key_cols],
    )
    r = right.select(
        *[F.col(c).alias(f"b_{c}") for c in right.columns],
        rb.alias("__bucket"),
        *[F.col(c).alias(f"__rk_{c}") for c in key_cols],
    )
    on = [l["__bucket"] == r["__bucket"]] + [
        l[f"__lk_{c}"] == r[f"__rk_{c}"] for c in key_cols
    ]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    band = (
        F.abs(F.col(f"a_{left_val}") - F.col(f"b_{right_val}")) <= F.lit(eps)
    )
    if extra_cond is not None:
        band = band & extra_cond
    drop = ["__bucket"] + [f"__lk_{c}" for c in key_cols] + [
        f"__rk_{c}" for c in key_cols
    ]
    return l.join(r, cond, "inner").filter(band).drop(*drop)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-spreading equi join: manual salting for hot keys.

    AQE's skew-join splitting handles most skew at runtime; manual salting
    remains the tool when (a) AQE is unavailable (streaming joins), or
    (b) one key is so hot a single AQE split still overflows a task. The
    fact side gets a DETERMINISTIC salt (xxhash64 of the whole row — no
    rand(), so retries/replays produce identical partitioning); the dim
    side is replicated ``buckets`` times via explode. Join on
    (key, salt) spreads each hot key over ``buckets`` tasks. Result is
    value-identical to ``facts.join(dim, on, how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim is replicated)")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(buckets)
    ).cast("int")
    f = facts.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")


def fuzzy_pairs(
    df: DataFrame,
    *,
    id_col: str,
    key_col: str,
    block_cols: list[str],
    max_distance: int = 2,
) -> DataFrame:
    """Blocked fuzzy self-join — pairs whose ``key_col`` strings are
    within ``max_distance`` Levenshtein edits, joined only WITHIN the
    blocking key (north-star extension, SURVEY §2.11 — no reference
    counterpart). The entity-resolution staple for short strings (product
    titles, author names, URLs after normalization) where token-set
    similarity is useless — one typo changes every shingle but is 1 edit.

    Scale shape: the equi-join on ``block_cols`` is a plain shuffled
    hash join; Levenshtein runs only inside blocks, so cost is
    Σ_block C(rows,2) · O(len²) — choose blocks accordingly (brand,
    zip, lang). A cheap length-difference prune
    (|len(a)−len(b)| ≤ d ⇒ necessary for distance ≤ d) runs before the
    DP so most pairs never pay it. Everything JVM built-ins
    (``levenshtein`` is codegen'd); distance is an exact integer on any
    engine.

    Output: (id_a, id_b, key_a, key_b, distance) with id_a < id_b.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(key_col).alias("__k"),
        *block_cols,
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # length prune is a necessary condition for the edit bound — it
    # stays in the join condition so Catalyst filters before the DP
    cond = cond & (
        F.abs(F.length("a.__k") - F.length("b.__k")) <= max_distance
    )
    return (
        a.join(b, cond)
        .filter(F.levenshtein("a.__k", "b.__k") <= max_distance)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__k").alias("key_a"),
            F.col("b.__k").alias("key_b"),
            F.levenshtein("a.__k", "b.__k")
            .cast("bigint")
            .alias("distance"),
        )
    )


def semi(df: DataFrame, other: DataFrame, on: list[str]) -> DataFrame:
    """LEFT SEMI — rows of df with a match in other (SQL EXISTS)."""
    return df.join(other, on, "left_semi")


def anti(df: DataFrame, other: DataFrame, on: list[str]) -> DataFrame:
    """LEFT ANTI — rows of df with no match in other (SQL NOT EXISTS)."""
    return df.join(other, on, "left_anti")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    start_col: str = "start_us",
    end_col: str = "end_us",
    cell: int,
    key_cols: list[str] | None = None,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Interval overlap join: pairs where ``a.start < b.end AND b.start <
    a.end`` (half-open [start, end) on both sides), optionally also equal
    on ``key_cols``.

    The naive form is a cross join with a residual theta predicate —
    BroadcastNestedLoopJoin, quadratic, dead at scale. This grid-buckets
    time into ``cell``-sized cells: every interval explodes to the cells
    it touches (``sequence(start DIV cell, (end-1) DIV cell)``), the join
    is a plain equi join on (key, cell), and each overlapping pair is
    emitted EXACTLY once — only in the first cell both intervals share,
    ``greatest(a.start, b.start) DIV cell`` — so no post-join distinct is
    needed. The exact overlap predicate is re-applied after the equi
    join.

    Pick ``cell`` near the typical interval length: explode fan-out per
    row is ``len/cell + 1`` while cell population stays low — both sides
    of the quadratic risk stay bounded. Same family as band_join
    (ε-band ≡ fixed-length intervals).

    Output: left columns aliased ``a_*``, right columns ``b_*``.
    """
    key_cols = key_cols or []

    def cells(df: DataFrame, side: str) -> DataFrame:
        # integer cell ids: DIV keeps everything bigint (no double floor)
        grid = F.expr(
            f"sequence(CAST({start_col} AS BIGINT) DIV {cell}, "
            f"CAST({end_col} - 1 AS BIGINT) DIV {cell})"
        )
        return df.select(
            *[F.col(c).alias(f"{side}_{c}") for c in df.columns],
            F.explode(grid).alias("__cell"),
        )

    l = cells(left, "a")
    r = cells(right, "b")
    cond = l["__cell"] == r["__cell"]
    for c in key_cols:
        cond = cond & (l[f"a_{c}"] == r[f"b_{c}"])
    a_s, a_e = F.col(f"a_{start_col}"), F.col(f"a_{end_col}")
    b_s, b_e = F.col(f"b_{start_col}"), F.col(f"b_{end_col}")
    overlap = (a_s < b_e) & (b_s < a_e)
    first_shared = F.expr(
        f"CAST(greatest(a_{start_col}, b_{start_col}) AS BIGINT) DIV {cell}"
    )
    out = (
        l.join(r, cond, "inner")
        .filter(overlap & (l["__cell"] == first_shared))
    )
    if extra_cond is not None:
        out = out.filter(extra_cond)
    return out.drop("__cell")


def dim_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Manual runtime-filter join: broadcast the (already filtered) dim
    side's DISTINCT join keys as a left-semi prune of the fact table
    BEFORE the wide join — the explicit form of Spark's own
    InjectRuntimeFilter (``spark.sql.optimizer.runtime.bloomFilter.*``),
    usable at any size and for joins the optimizer's thresholds decline
    (creation side > 10 MB / application side < 10 GB at defaults).

    Why it matters at 100 TB: a selective dim predicate means most fact
    rows have no match, yet a plain shuffle join still shuffles ALL of
    them. The broadcast semi-join drops unmatched fact rows map-side, at
    the scan, so the big exchange only carries survivors. The dim
    distinct is dim-sized (tiny by assumption — same broadcastability
    assumption the join itself makes); exactness of the semi filter
    (vs bloom's false positives) costs the distinct but never re-checks.

    Plan shape (asserted in tests/test_plans.py): BroadcastHashJoin
    LeftSemi BELOW the fact-side Exchange of the main join.
    """
    keys = dim.select(*on).distinct()
    pruned = fact.join(F.broadcast(keys), on, "left_semi")
    return pruned.join(dim, on, how)
