"""Streaming package. ``pin_streaming_confs`` is called by every streaming
entry point: UTC event-time semantics plus the RocksDB state store — the
production state backend (state lives off-heap/on-disk with incremental
checkpointing, so watermark/session/join state survives executor heap
pressure at 100 TB ingest; the HDFS-backed default keeps ALL state on the
JVM heap and dies first at scale)."""

from pyspark.sql import SparkSession


def pin_streaming_confs(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )


from bigdata_retailrocket_recsys_spark.streaming.sessionize_stream import (  # noqa: E402
    run_streaming_sessionize,
    streaming_session_stats,
)

__all__ = [
    "pin_streaming_confs",
    "run_streaming_sessionize",
    "streaming_session_stats",
]
