"""Custom stateful streaming via ``transformWithStateInPandas`` — the
Spark ≥4.0 successor to ``applyInPandasWithState`` (stateful.py keeps the
legacy API; both surfaces belong in the engine the way the reference's
single batch pipeline py:96-131 needs neither).

Operator: per-user engagement accumulator. ValueState holds
(n, cents, min, max); every micro-batch upserts one row per touched user.
Exactness discipline: the running sum is kept in INTEGER CENTS (the
``value`` column is 2-decimal by construction — plans/catalog.py decimal
rules), so accumulation order can never change the result and the bounded
AvailableNow run is value-equal to the batch GROUP BY → full DuckDB
oracle. Non-finite values are excluded up front on both engines.

At 100 TB/continuous: state is four scalars per user (bounded), hash-
partitioned by the grouping key on the RocksDB store; update-mode output
is one row per touched key per batch, not per event.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from bigdata_retailrocket_recsys_spark.sources.readers import events_stream
from bigdata_retailrocket_recsys_spark.streaming import pin_streaming_confs

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


class EngagementProcessor(StatefulProcessor):
    """Running per-user (count, integer-cent sum, min, max)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("acc", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, cents, mn, mx = 0, 0, None, None
        if self._state.exists():
            n, cents, mn, mx = self._state.get()
        for pdf in rows:
            for v in pdf["value"]:
                fv = float(v)
                # upstream filters non-finite; belt-and-braces here so a
                # stray NaN can't poison the running cents
                if not math.isfinite(fv):
                    continue
                n += 1
                cents += int(round(fv * 100))
                mn = fv if mn is None or fv < mn else mn
                mx = fv if mx is None or fv > mx else mx
        self._state.update((n, cents, mn, mx))
        yield pd.DataFrame(
            [(key[0], n, cents, mn, mx)],
            columns=[f.name for f in OUTPUT_SCHEMA],
        )

    def close(self) -> None:
        pass


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` drives a long-lived Python driver
    worker over a protobuf channel — it requires the ``protobuf`` package
    (``google.protobuf``), which this sandbox does not ship. The legacy
    ``applyInPandasWithState`` path (stateful.py) has no such dependency
    and remains the supported custom-stateful surface here; on a cluster
    with protobuf installed this module runs as-is."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # parent 'google' namespace absent
        return False


def transform_state_engagement(events: DataFrame) -> DataFrame:
    """Apply the stateful processor to a (streaming or batch) events
    frame. Requires columns user_id, value."""
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(google.protobuf) for its streaming Python runner channel; "
            "not available in this environment. Use "
            "streaming.stateful.stateful_sessionize "
            "(applyInPandasWithState) instead."
        )
    prepared = events.filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
    ).select("user_id", "value")
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EngagementProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_transform_state(
    spark: SparkSession,
    sf_dir: str,
    *,
    sink_table: str = "bdrr_stream_tws",
) -> DataFrame:
    """Events parquet stream → transformWithStateInPandas → memory sink,
    Trigger.AvailableNow. The memory sink APPENDS update-mode rows
    (CLAUDE.md), so the runner keeps each user's FINAL emission — the
    count is strictly monotone per user, so max-by-count is exact and
    batching-independent."""
    pin_streaming_confs(spark)
    stream = events_stream(spark, sf_dir)
    out = transform_state_engagement(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sunk = spark.table(sink_table)
    final = sunk.groupBy("user_id").agg(
        F.max(
            F.struct("n_events", "sum_cents", "min_value", "max_value")
        ).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.sum_cents").alias("sum_cents"),
        F.col("s.min_value").alias("min_value"),
        F.col("s.max_value").alias("max_value"),
    )
