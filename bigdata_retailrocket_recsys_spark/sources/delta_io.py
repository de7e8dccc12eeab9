"""Delta Lake / Iceberg table-format surface (VERDICT r12 #7).

The reference has no table format (its IO surface is CSV + Parquet,
SURVEY §2.1); a real lakehouse deployment of this engine lands on Delta
Lake or Iceberg. Both are EXTERNAL connector jars + session extensions:

- Delta: ``--packages io.delta:delta-spark_2.13:<version>`` plus TWO
  session-BUILD-time confs (``spark.sql.extensions=io.delta.sql
  .DeltaSparkSessionExtension`` and ``spark.sql.catalog.spark_catalog=
  org.apache.spark.sql.delta.catalog.DeltaCatalog``).
- Iceberg: ``--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13
  :<version>`` plus a catalog conf.

Neither jar is on this sandbox's classpath, and — unlike the parquet
reader confs that ``sources/readers.load_table`` self-pins at read time —
the session EXTENSIONS cannot be injected after the SparkSession exists.
So this module follows the avro_io.py precedent: resolve at call time,
work fully when deployed, fail LOUDLY with deployment guidance when not
(never a silent parquet fallback — that would lose ACID semantics the
caller asked for by name).

Until a connector is deployed, the engine's native primitives cover the
same operational loop on plain parquet and are fully oracled:
copy-on-write upsert (``q_sink_upsert``), small-file compaction
(``q_sink_compaction``), SCD2 history (``q_scd2_enrich``), CDC
content-digest diff (``q_corpus_snapshot_diff``), snapshot re-cut
(``q_corpus_snapshot_recut``), and the incremental commit loops
(``q_corpus_incremental_commit`` / ``q_stream_*_commit``). What they do
NOT give is concurrent-writer isolation or time travel — those are
exactly what the connector adds, which is why the gate is loud.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DELTA_SOURCE_CLASS = "org.apache.spark.sql.delta.sources.DeltaDataSource"
_DELTA_EXTENSION = "io.delta.sql.DeltaSparkSessionExtension"
_DELTA_CATALOG = "org.apache.spark.sql.delta.catalog.DeltaCatalog"
_ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def delta_session_confs() -> dict[str, str]:
    """The confs a DEPLOYER must put on the session BUILDER (they cannot
    be set after the session exists — extension wiring happens at build):
    pass to ``SparkSession.builder.config(map=...)`` alongside the
    delta-spark package."""
    return {
        "spark.sql.extensions": _DELTA_EXTENSION,
        "spark.sql.catalog.spark_catalog": _DELTA_CATALOG,
    }


def _class_on_classpath(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta connector class is on the classpath."""
    return _class_on_classpath(spark, _DELTA_SOURCE_CLASS)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    return _class_on_classpath(spark, _ICEBERG_CATALOG_CLASS)


def delta_format(spark: SparkSession) -> str:
    """The format string for ``.format(...)`` — ``"delta"`` when the
    connector is deployed, else a loud gate with the exact deployment
    recipe and the native-primitive alternatives."""
    if delta_available(spark):
        return "delta"
    raise NotImplementedError(
        "Delta Lake needs the delta-spark connector jar and session "
        "extensions; neither is on this classpath. Deploy with "
        "--packages io.delta:delta-spark_2.13:<version> and build the "
        f"session with {delta_session_confs()!r}. Until then the "
        "engine's oracled parquet primitives cover the operational "
        "loop: q_sink_upsert (copy-on-write upsert), q_sink_compaction, "
        "q_scd2_enrich, q_corpus_snapshot_diff/recut, and the "
        "incremental commit loops — without concurrent-writer isolation "
        "or time travel."
    )


def write_delta(
    df: DataFrame, path: str, *, mode: str = "overwrite"
) -> None:
    """Write ``df`` as a Delta table (loud gate when undeployed)."""
    df.write.format(delta_format(df.sparkSession)).mode(mode).save(path)


def read_delta(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Read a Delta table; ``version=`` time-travels to a snapshot."""
    r = spark.read.format(delta_format(spark))
    if version is not None:
        r = r.option("versionAsOf", str(version))
    return r.load(path)


def merge_upsert_delta(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
) -> None:
    """ACID MERGE upsert via the Delta python API (needs the deployed
    ``delta-spark`` python package as well as the jar). The connector-free
    equivalent is the engine's copy-on-write upsert (q_sink_upsert) —
    same end state, no writer isolation."""
    delta_format(spark)  # loud gate first
    try:
        from delta.tables import DeltaTable  # type: ignore[import-not-found]
    except ImportError as exc:  # jar without the python package
        raise NotImplementedError(
            "merge_upsert_delta needs the delta-spark PYTHON package "
            "(pip install delta-spark) in addition to the jar"
        ) from exc
    tgt = DeltaTable.forPath(spark, path)
    cond = " AND ".join(f"t.{c} <=> s.{c}" for c in key_cols)
    (
        tgt.alias("t")
        .merge(updates.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
