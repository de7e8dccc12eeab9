"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (sessionize sf0.001 events, per-session
rollup). ``queries()`` / ``oracle_sql()`` — the declared operator catalog
from SURVEY.md §2, implemented in
``bigdata_retailrocket_recsys_spark/plans/catalog*.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_retailrocket_recsys_spark.plans import QUERIES

FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 30-min-gap sessionization of events + per-session rollup
    (the reference's signature operator, py:96-131)."""
    return QUERIES["q_sessionize"].fn(spark, FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
