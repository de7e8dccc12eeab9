"""Aggregation operators (SURVEY.md §2.4, A1-A8).

Most aggregates are direct built-ins; the two worth naming:

- ``two_level_agg`` (A5): re-aggregation, e.g. per-(user,session) duration →
  per-user avg duration (reference py:524-529). Two shuffles, second one
  strictly narrower; map-side partial aggregation applies at both levels.
- ``collect_ordered_seq`` (A6): the reference does ``orderBy`` *before*
  ``groupBy().collect_list`` (py:396-400), which does NOT guarantee
  intra-group order after the shuffle (SURVEY §4.4). The engine collects
  ``struct(order_key, value)`` and ``sort_array``s inside each group —
  deterministic, and still one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def two_level_agg(
    df: DataFrame,
    *,
    fine_keys: list[str],
    fine_aggs: list[Column],
    coarse_keys: list[str],
    coarse_aggs: list[Column],
) -> DataFrame:
    """A5 — groupBy(fine).agg(...) → groupBy(coarse).agg(...)."""
    return df.groupBy(*fine_keys).agg(*fine_aggs).groupBy(*coarse_keys).agg(*coarse_aggs)


def collect_ordered_seq(
    df: DataFrame,
    *,
    group_cols: list[str],
    order_cols: list[str],
    value_col: str,
    out_col: str = "seq",
) -> DataFrame:
    """A6 — deterministic ordered sequence per group.

    Collects ``struct(order_cols..., value)`` then ``sort_array`` (struct
    comparison is lexicographic over fields, so order columns come first)
    and projects back to the bare value sequence.
    """
    packed = F.struct(*[F.col(c) for c in order_cols], F.col(value_col).alias("__v"))
    return df.groupBy(*group_cols).agg(
        F.transform(
            F.sort_array(F.collect_list(packed)), lambda s: s["__v"]
        ).alias(out_col)
    )


def conditional_agg(when_cond: Column, value: Column, agg: str = "sum") -> Column:
    """A4 — filtered aggregation: agg(CASE WHEN cond THEN value END)
    (reference: cat_count_in_prefix / recency at py:479-483)."""
    fn = getattr(F, agg)
    return fn(F.when(when_cond, value))
