"""Sources: CSV + Parquet scans with explicit schemas.

Reference sites: CSV scan with header+inferSchema
(prepare_training_data_pyspark.py:70-71, 146-153), parquet re-read
(ipynb cell 24). We replace schema inference with explicit ``StructType``
(one pass, deterministic — SURVEY.md §1.3/S1) but keep an opt-in
``infer_schema`` escape hatch for exploration.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bigdata_retailrocket_recsys_spark.schemas import TESTDATA_SCHEMAS


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType | None = None,
    *,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan (reference S1/S2). Multiple paths union-read in one scan —
    the engine form of the reference's two-file property read (py:146-153)."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(paths)


def read_parquet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parquet scan (reference S4). Schema comes from parquet footers; filters
    and projections push down to row-group pruning automatically."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.parquet(*paths)


#: testdata columns physically stored as TIMESTAMP(NANOS) int64 — Spark reads
#: them as LongType under ``spark.sql.legacy.parquet.nanosAsLong`` and we
#: normalize to TimestampType here (floor ns→µs, same truncation DuckDB does).
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md) with normalized types.

    Works on ANY caller-provided SparkSession (the driver builds its own):
    the two runtime confs the engine's semantics depend on are pinned here —
    ns-as-long parquet reads and the UTC session timezone (SURVEY §4.4).
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown testdata table {name!r}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
