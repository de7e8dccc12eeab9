"""Sustained multi-batch streaming soak: state-store size must stay
BOUNDED under the watermark across many micro-batches (VERDICT r4 #8).

The bounded AvailableNow runs in the catalog prove value-correctness but
execute only a handful of batches — the watermark-bounds-eviction
subtlety (a window is evicted one batch AFTER the watermark passes its
end; CLAUDE.md) only shows its steady-state behavior across a long run.
Here the generator micro-batch source (sources/generator.py) drives a
watermarked 1-minute tumbling aggregate in UPDATE mode for >= 20 batches
of monotonically-advancing event time on the RocksDB state store; each
batch spans ~16 windows of event time, so WITHOUT eviction state would
grow to ~400 windows by the end. The assertions pin: every batch ran,
state plateaued at the watermark horizon (a few windows), and it never
approached the no-eviction growth line.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow

ROWS = 44_000
BATCH_ROWS = 2_000  # -> 22 micro-batches
STEP_US = 1_000_000  # 1 s of event time per row


def test_streaming_state_bounded_under_watermark(spark):
    from bigdata_retailrocket_recsys_spark.sources.generator import (
        register_events_generator,
    )
    from bigdata_retailrocket_recsys_spark.streaming import pin_streaming_confs

    pin_streaming_confs(spark)
    register_events_generator(spark)
    st = (
        spark.readStream.format("bdrr_events_gen")
        .option("rows", ROWS)
        .option("batch_rows", BATCH_ROWS)
        .option("step_us", STEP_US)
        .load()
    )
    agg = (
        st.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("bdrr_soak_sink")
        .outputMode("update")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import ast

        deadline = time.time() + 300
        while time.time() < deadline:
            lp = q.lastProgress
            if lp and lp["sources"][0]["endOffset"]:
                off = lp["sources"][0]["endOffset"]
                if isinstance(off, str):
                    # Python-source offsets surface as a repr string
                    off = ast.literal_eval(off)
                if int(off["i"]) >= ROWS:
                    break
            time.sleep(0.5)
        progresses = [
            p
            for p in q.recentProgress
            if p["numInputRows"] > 0 and p["stateOperators"]
        ]
    finally:
        q.stop()
        q.awaitTermination()

    assert len(progresses) >= 20, f"only {len(progresses)} data batches ran"
    curve = [p["stateOperators"][0]["numRowsTotal"] for p in progresses]
    # steady state: watermark horizon (2 min) + one batch's event-time span
    # (~33 min of 1-min windows x 4 event types) is the worst transient;
    # no-eviction growth would reach ~400 windows x 4 types by batch 22.
    assert max(curve) <= 250, curve
    # plateau, not growth: the last quarter of the run must not exceed the
    # running max of the first half (eviction keeps pace with ingest)
    assert max(curve[-5:]) <= max(curve[: len(curve) // 2]), curve
    # eviction actually happened: state rows must drop somewhere
    assert any(b < a for a, b in zip(curve, curve[1:])), curve
    # and the aggregate itself is correct-to-date: every ingested row
    # landed in exactly one (window, type) cell of the sink's latest rows
    sink = spark.table("bdrr_soak_sink")
    latest = (
        sink.groupBy("w", "event_type").agg(F.max("n").alias("n"))
    )
    total = latest.agg(F.sum("n")).collect()[0][0]
    assert total == ROWS, total
