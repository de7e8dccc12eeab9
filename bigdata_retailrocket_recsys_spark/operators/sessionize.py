"""Gap-based sessionization — the reference's signature operator.

Reference semantics (prepare_training_data_pyspark.py:96-131; README.md:92-97):
  1. ``lag(ts) OVER (PARTITION BY user ORDER BY ts)``     (py:96-101)
  2. gap seconds = ts - prev_ts                            (py:103-109)
  3. ``is_new_session = prev IS NULL OR gap > 30*60``      (py:111-117)
  4. running sum of the flag → per-user session ordinal    (py:119-123)
  5. ``session_id = concat(user, '_', ordinal)``           (py:125-128)

Engine improvements (SURVEY.md §4.4):
- deterministic tiebreaker column for equal timestamps (the reference's
  bare ``orderBy(ts)`` is run-to-run nondeterministic on ties);
- gap compared in exact integer microseconds, not float seconds;
- single window spec shared by both functions → Catalyst plans ONE
  shuffle (hash by user) + ONE sort for the whole operator.

Scale: one shuffle of the event table by ``user_col``. No driver state, no
UDF — pure whole-stage-codegen. At 100 TB the only tuning point is skew
(celebrity users): AQE skew handling applies to the window exchange, and the
streaming variant (streaming/sessionize_stream.py) bounds state by watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Assign 30-min-gap session ids. Adds ``session_col`` (string
    ``"<user>_<ordinal>"``) to ``df``; keeps all input columns.

    Rows with a NULL ``user_col`` or NULL ``ts_col`` are DROPPED: a
    session requires an identified user and an event time (the streaming
    variant enforces the same at ingest — a watermarked stream discards
    NULL event-time rows). Without this rule, engines diverge on
    degenerate rows (e.g. string-concat session ids propagate NULL in SQL
    but skip NULL in concat_ws).
    """
    df = df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    order: list[Column] = [F.col(ts_col)]
    for c in tiebreak_cols or []:
        order.append(F.col(c))
    w = Window.partitionBy(user_col).orderBy(*order)

    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > F.lit(gap_minutes * 60 * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    # Default window frame for sum() over an ordered window is
    # rangeBetween(unboundedPreceding, currentRow) — same as the reference's
    # running sum (py:119-123); make it rowsBetween for tie safety.
    ordinal = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_col,
        F.concat_ws("_", F.col(user_col).cast("string"), ordinal.cast("string")),
    )


def session_stats(
    df: DataFrame,
    *,
    session_col: str = "session_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: event count, span, bounds (exact integer µs)."""
    return df.groupBy(session_col).agg(
        F.first(user_col).alias("user_id"),
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min(ts_col)).alias("start_us"),
        F.unix_micros(F.max(ts_col)).alias("end_us"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias(
            "duration_us"
        ),
    )


def sessionize_capped(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    max_minutes: int = 240,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Gap sessionization with a MAXIMUM session duration (north-star
    extension, SURVEY §2.11 — no reference counterpart): gap-only
    sessions are unbounded — a bot firing every 29 minutes produces one
    week-long session that poisons per-session aggregates. After the
    30-min-gap assignment, any session longer than ``max_minutes`` is
    split at fixed multiples of the cap from the SESSION START
    (sub-session = elapsed div cap — the standard deterministic
    semantics; the "restart the clock at each split" variant is
    inherently sequential and needs stateful streaming, which
    ``streaming/`` provides).

    Two windows over ONE (user, ts) partitioning: the gap flags + run
    ids reuse :func:`sessionize`'s frame, the session-start min is a
    frameless aggregate over (user, run) — Spark plans both behind a
    single exchange when the leading partition keys agree. Integer
    microsecond arithmetic end-to-end.

    Output: input columns + ``session_col``
    (``"<user>_<run>_<subsession>"``).
    """
    df = df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    order: list[Column] = [F.col(ts_col)]
    for c in tiebreak_cols or []:
        order.append(F.col(c))
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > F.lit(gap_minutes * 60 * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_run = df.withColumn("__run", run)
    w_run = Window.partitionBy(user_col, "__run")
    start_us = F.min(F.unix_micros(F.col(ts_col))).over(w_run)
    # integer division: unix-micros delta and the cap are exact bigints
    sub = F.expr(
        f"(unix_micros({ts_col}) - __start) div "
        f"{max_minutes * 60 * 1_000_000}"
    )
    return (
        with_run.withColumn("__start", start_us)
        .withColumn(
            session_col,
            F.concat_ws(
                "_",
                F.col(user_col).cast("string"),
                F.col("__run").cast("string"),
                sub.cast("string"),
            ),
        )
        .drop("__run", "__start")
    )


def concurrency_sweep(
    sessions: DataFrame,
    *,
    session_col: str = "session_id",
    start_col: str = "start_us",
    end_col: str = "end_us",
    n_shards: int = 32,
) -> DataFrame:
    """Max concurrent sessions per day — the capacity-planning sweep
    ("how many users were on at once?"), computed as the classic
    interval +1/−1 boundary walk WITHOUT a single-reducer window: each
    session [start, end] (inclusive µs) emits +1 at start and −1 at
    end+1; the global running sum over the TOTAL boundary order
    (us, delta, session id) is a `_sharded_prefix_sum` (range-contiguous
    shards + a broadcast offset table), so concurrency-after-boundary is
    exact and deterministic at any shard count. Ties at one instant
    process closes (−1) before opens (+1) — a back-to-back handoff never
    double-counts.

    Reported at boundary grain: a day with zero boundaries (fully
    spanned by one long session) has no row — documented, the sweep is
    about PEAKS and peaks move only at boundaries. Corollary (ADVICE
    r10): a day's reported max is the max over concurrency-AFTER-
    boundary values WITHIN that day, so a level carried in from the
    previous day is understated when the day's FIRST boundary is a
    close — e.g. 10 sessions open overnight, one closes at 00:01 and
    nothing else happens: the day reports 9, though 10 were concurrent
    at midnight (that peak belongs to the boundary that created it, on
    the previous day). Cross-midnight peak attribution needs synthetic
    day-start boundaries carrying the running level; at the daily
    capacity-planning grain the boundary-attribution convention is the
    standard sweep-line answer, so it is documented rather than
    re-modeled.

    Output: (day_str, max_concurrent, n_boundaries) per active day.
    """
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        _sharded_prefix_sum,
    )

    b = sessions.select(
        F.col(start_col).cast("bigint").alias("us"),
        F.lit(1).cast("bigint").alias("delta"),
        F.col(session_col).alias("sid"),
    ).unionByName(
        sessions.select(
            (F.col(end_col).cast("bigint") + F.lit(1)).alias("us"),
            F.lit(-1).cast("bigint").alias("delta"),
            F.col(session_col).alias("sid"),
        )
    )
    c = _sharded_prefix_sum(
        b,
        [F.col("us").asc(), F.col("delta").asc(), F.col("sid").asc()],
        "delta",
        n_shards,
    )
    return (
        c.select(
            F.date_format(F.timestamp_micros("us"), "yyyy-MM-dd").alias(
                "day_str"
            ),
            F.col("__cum").alias("conc"),
        )
        .groupBy("day_str")
        .agg(
            F.max("conc").cast("bigint").alias("max_concurrent"),
            F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
        )
    )
