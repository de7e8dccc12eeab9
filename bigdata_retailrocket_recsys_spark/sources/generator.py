"""Deterministic synthetic events generator — a pure-Python custom data
source on Spark 4's Python Data Source API (``pyspark.sql.datasource``).

Why an engine needs this at 100 TB: scale/soak tests should not require
storing 100 TB first. A generator source synthesizes any volume with
N parallel tasks (one per ``partitions`` option) and ZERO storage or
shuffle — each task derives its row range arithmetically, so the source
scales linearly with requested parallelism and is exactly reproducible
across runs and engines.

Every column is a closed-form function of the global row index ``i`` (no
RNG state), which makes the output expressible in ANY engine — the DuckDB
oracle reproduces it from ``range(n)`` — and keeps per-task generation
independent: task k generates rows [k·rows/P, (k+1)·rows/P) without
coordination.

The reference ingests fixed CSVs (prepare_training_data_pyspark.py:70-71);
this is the engine's synthetic-ingest extension (SURVEY §2.11 family).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: closed-form column recipe (mirrored in the q_scan_pysource oracle):
#:   event_id = i
#:   ts       = START_US + i * step_us          (µs since epoch, UTC)
#:   user_id  = (i * 2654435761) % n_users      (Knuth multiplicative hash)
#:   event_type = TYPES[(i * 7) % len(TYPES)]
#:   value    = ((i * 48271) % 100000) / 100.0  (MINSTD multiplier)
TYPES = ("view", "click", "purchase", "signup", "error")
START_US = 1_704_067_200_000_000  # 2024-01-01 UTC


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class EventsGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.parts = max(1, int(options.get("partitions", 8)))
        self.n_users = int(options.get("n_users", 1_000))
        self.step_us = int(options.get("step_us", 1_000_000))

    def partitions(self) -> list[_Range]:
        per = -(-self.rows // self.parts)  # ceil — last partition may be short
        return [
            _Range(k * per, min((k + 1) * per, self.rows))
            for k in range(self.parts)
            if k * per < self.rows
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            us = START_US + i * self.step_us
            yield (
                i,
                datetime.fromtimestamp(us / 1e6, tz=timezone.utc),
                (i * 2654435761) % self.n_users,
                TYPES[(i * 7) % len(TYPES)],
                ((i * 48271) % 100_000) / 100.0,
            )


class EventsGeneratorDataSource(DataSource):
    """``spark.read.format("bdrr_events_gen")`` — options: rows, partitions,
    n_users, step_us. Register once per session with
    ``spark.dataSource.register(EventsGeneratorDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "bdrr_events_gen"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> EventsGenReader:
        return EventsGenReader(self.options)


def register_events_generator(spark) -> None:
    spark.dataSource.register(EventsGeneratorDataSource)
