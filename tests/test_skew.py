"""Skew-survival demonstration (SURVEY §7.3 #1 scale risk, VERDICT r3 #6).

The co-visitation self-join is the engine's quadratic hazard: one hot
session with 10⁴ events means ~5×10⁷ pairs from that single group — a
single straggler task at cluster scale. These tests pin down, on a
genuinely hot key:

- the NAIVE self-join's fan-out really is the quadratic number (measured
  analytically from per-group counts — we prove the blowup without paying
  for it), and its plan is the SortMergeJoin whose per-key cross product
  materializes before the residual filter;
- the CAPPED path (max_per_group) completes with task-level fan-out
  bounded by cap²/2 per group regardless of how hot the group is;
- ``salted_join`` actually spreads a hot key's rows across ``buckets``
  tasks (measured per-partition row histogram), where the unsalted
  shuffle join lands them all in ONE task.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_retailrocket_recsys_spark.operators.joins import (
    covis_pairs,
    salted_join,
)

HOT_N = 10_000  # events in the hot session (the VERDICT r3 #6 fixture)
NORMAL_SESSIONS = 200
NORMAL_N = 5


def _skewed_events(spark):
    hot = spark.range(HOT_N).selectExpr(
        "'hot' AS sid", "id AS item", "id AS ts"
    )
    normal = spark.range(NORMAL_SESSIONS * NORMAL_N).selectExpr(
        "concat('s', CAST(id % 200 AS STRING)) AS sid",
        "id + 1000000 AS item",  # disjoint from hot items
        "id AS ts",
    )
    return hot.union(normal)


def test_covis_naive_fanout_is_quadratic(spark):
    """The uncapped self-join WOULD emit ~5×10⁷ pairs for the hot session
    (proved from per-group counts, not by materializing them), and its
    physical plan is the SortMergeJoin whose per-key cross product exists
    before the a.item < b.item residual prunes it."""
    events = _skewed_events(spark)
    fanout = (
        events.groupBy("sid")
        .agg(F.countDistinct("item").alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("pairs"))
        .first()["pairs"]
    )
    expected_hot = HOT_N * (HOT_N - 1) // 2
    assert fanout >= expected_hot  # 49,995,000 pairs from one group
    naive = covis_pairs(
        events, group_col="sid", item_col="item", pair_strategy="selfjoin"
    )
    plan = naive.sparkSession._jvm.PythonSQLUtils.explainString(
        naive._jdf.queryExecution(), "formatted"
    )
    # the pair set materializes through a real join (broadcast here at toy
    # size, SortMergeJoin at scale) whose `<` is a residual condition —
    # i.e. the per-key cross product exists before the filter prunes it
    assert "Join" in plan, plan
    assert "< item" in plan or "<item" in plan.replace(" ", ""), plan


def test_covis_capped_path_bounds_hot_group(spark):
    """With max_per_group=50 the hot session contributes exactly
    50·49/2 = 1225 pairs — fan-out bounded by the cap, independent of the
    10⁴ group size — and the whole job completes promptly."""
    events = _skewed_events(spark)
    capped = covis_pairs(
        events,
        group_col="sid",
        item_col="item",
        max_per_group=50,
        ts_col="ts",
    )
    rows = capped.collect()
    hot_pairs = [r for r in rows if r.item_a < 1_000_000]
    normal_pairs = [r for r in rows if r.item_a >= 1_000_000]
    assert len(hot_pairs) == 50 * 49 // 2
    assert len(normal_pairs) == NORMAL_SESSIONS * (NORMAL_N * (NORMAL_N - 1) // 2)
    # cap keeps the most RECENT items: hot top-50 by ts desc = items 9950..9999
    assert min(r.item_a for r in hot_pairs) == HOT_N - 50


def _partition_histogram(df):
    return sorted(
        r["cnt"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )


def test_salted_join_spreads_hot_key(spark):
    """90 % of fact rows share one key. An unsalted shuffle join hashes
    them all into ONE task; salted_join(buckets=8) spreads the hot key
    over 8 (key, salt) partitions. Measured per-partition histograms —
    the max-task share must drop by ≥3×."""
    n = 50_000
    facts = spark.range(n).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 42 ELSE CAST(id % 97 AS INT) + 100 END AS k",
        "id AS payload",
    )
    dim = facts.sparkSession.createDataFrame(
        [(k, f"name{k}") for k in list(range(100, 197)) + [42]],
        "k int, name string",
    ).hint("merge")  # forbid broadcast so the shuffle layout is observable

    # AQE's partition coalescing merges these tiny post-shuffle partitions
    # into one, hiding the layout we're measuring; its skew SPLITTING only
    # fires >256 MB, so at cluster scale the hot key below would still be
    # one task unless salted. Freeze the raw hash layout for the probe.
    spark = facts.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    parts_was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # 32 salts over 8 partitions collide heavily (birthday) — widen the
    # layout so the histogram reflects the salt spread, not bucket collisions
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        plain_hist = _partition_histogram(facts.join(dim, "k"))
        salted_hist = _partition_histogram(
            salted_join(facts, dim, "k", buckets=32)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        spark.conf.set("spark.sql.shuffle.partitions", parts_was)

    assert sum(plain_hist) == sum(salted_hist) == n  # value parity (row counts)
    hot_rows = int(n * 0.9)
    assert plain_hist[-1] >= hot_rows  # the whole hot key in one task
    assert salted_hist[-1] <= plain_hist[-1] // 4  # spread over ≥4 tasks


def test_global_rank_tie_skew_spread_by_tiebreak(spark):
    """Range partitioning sends ALL rows of one key value to one shard —
    a 90%-tied order column concentrates in a single task unless the
    order includes a tiebreaker. Measured: with (metric) alone the hot
    value is one shard; with (metric, id) it spreads. Consumers that
    need tie-group contiguity (AUC) must accept the concentration;
    consumers that only need the k-th value (winsorize) should add the
    tiebreak. This is the documented guidance, locked."""
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        _sharded_global_rank,
    )

    n = 50_000
    df = spark.range(n).select(
        "id",
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 97)
        .alias("m"),
    )
    tied = _sharded_global_rank(df, [F.col("m").asc()], 32)
    spread = _sharded_global_rank(
        df, [F.col("m").asc(), F.col("id").asc()], 32
    )
    hist_tied = sorted(
        r["cnt"]
        for r in tied.groupBy("__shard").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    hist_spread = sorted(
        r["cnt"]
        for r in spread.groupBy("__shard").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    assert sum(hist_tied) == sum(hist_spread) == n
    hot = int(n * 0.9)
    assert hist_tied[-1] >= hot  # whole tie group in ONE shard
    assert hist_spread[-1] <= hot // 4  # tiebreak spreads it


def test_covis_power_law_sessions_bounded_tasks_under_aqe(spark):
    """VERDICT r6 #8: the cap must hold covis fan-out AND task balance on
    a power-law session-length distribution (the realistic shape — a few
    huge sessions, a long tail) with AQE ON, not just on one synthetic
    hot key with AQE frozen.

    Fixture: session i has ~4000/(i+1) events (zipf-ish), 400 sessions,
    items disjoint per session so expected pair counts are exact. With
    max_per_group=50: per-session pairs = C(min(len,50), 2); we assert
    the EXACT total (value correctness under the cap) and that the raw
    pair-materialization stage's max task carries ≤ a small multiple of
    the mean (no single task inherits the head sessions' quadratic)."""
    sizes = [max(1, 4000 // (i + 1)) for i in range(400)]
    offsets = []
    total = 0
    for s in sizes:
        offsets.append(total)
        total += s
    rows = spark.createDataFrame(
        [(i, off, n) for i, (off, n) in enumerate(zip(offsets, sizes))],
        "sid int, off long, n int",
    )
    events = rows.select(
        F.col("sid"),
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("j"),
    ).select(
        "sid",
        (F.col("j") + F.col("sid") * 1_000_000).alias("item"),
        F.col("j").cast("long").alias("ts"),
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    cap = 50
    raw = covis_pairs(
        events,
        group_col="sid",
        item_col="item",
        max_per_group=cap,
        ts_col="ts",
        aggregate=False,
    )
    hist = _partition_histogram(raw)
    expected = sum(min(s, cap) * (min(s, cap) - 1) // 2 for s in sizes)
    assert sum(hist) == expected  # exact capped fan-out, power law included
    # no task inherits a quadratic share: with per-session contribution
    # capped at C(50,2)=1225 the worst task is bounded by (sessions
    # hashed there)×1225, which must stay within a small multiple of the
    # mean — an uncapped head session (4000 events → 8M pairs) would blow
    # this by orders of magnitude
    mean = sum(hist) / max(1, len(hist))
    assert hist[-1] <= max(6 * mean, 3 * 1225), (hist[-5:], mean)

    agg = covis_pairs(
        events,
        group_col="sid",
        item_col="item",
        max_per_group=cap,
        ts_col="ts",
    )
    n_pairs = agg.agg(F.sum("covis").alias("s")).first()["s"]
    assert n_pairs == expected  # aggregate path agrees with the raw path
