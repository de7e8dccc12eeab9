"""bigdata_retailrocket_recsys_spark — a PySpark-native analytics engine.

A composable operator library + pipeline runner with the query and
data-processing capabilities of the reference repo
GY-Bai/bigdata-retailrocket-recsys (a PySpark RetailRocket ETL pipeline,
see SURVEY.md), re-expressed as a reusable, tested, 100-TB-minded engine:

- ``session``     — SparkSession factory (UTC, AQE, explicit shuffle sizing)
- ``schemas``     — explicit StructType contracts (no inferSchema in prod)
- ``sources``     — CSV/Parquet readers & sinks
- ``operators``   — sessionization, windows, joins (as-of/PIT/co-vis),
                    aggregates, dedup, similarity, text analysis
- ``pipelines``   — the reference-parity RetailRocket pipeline
                    (sessionize → candidates → features → embeddings)
- ``plans``       — the declared query catalog (driver contract)
- ``streaming``   — Structured Streaming sessionization (extension)

Design stance (SURVEY.md §7): DataFrame/Spark SQL only; UDF-free hot path;
deterministic semantics (explicit tiebreakers, half-open time windows,
UTC session timezone); no driver-side collects in any operator.
"""

from bigdata_retailrocket_recsys_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
