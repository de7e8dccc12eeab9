"""Per-session scratch paths for write→read-back queries.

Every roundtrip/persisted-table/streaming-stage query writes somewhere
under the system temp dir. A FIXED name there is a cross-session race:
two concurrent sessions on one machine (driver + rehearsal, gate +
rehearsal, two CI lanes) overwrite each other's in-flight reads —
measured r7: a concurrent full gate overwrote `bdrr_late_drop_stage`
mid-stream and the rehearsal's q_stream_late_drop read half its staged
rows (ADVICE r6 #4 class). Keying on the Spark applicationId makes the
path unique per session while staying stable WITHIN one, so repeated
queries still exercise their own overwrite/rmtree discipline.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def session_scratch(spark: SparkSession, name: str) -> str:
    """``$TMPDIR/bdrr_<name>_<applicationId>`` — unique per session,
    stable within it."""
    app = spark.sparkContext.applicationId.replace(":", "_")
    return os.path.join(tempfile.gettempdir(), f"bdrr_{name}_{app}")
