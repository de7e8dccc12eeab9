"""Sinks: Parquet writer with scale-friendly defaults.

Reference site: ``write.mode("overwrite").parquet`` with 200 shuffle
partitions and ``maxRecordsPerFile=50000`` (prepare_training_data_pyspark.py:
640-644; ipynb cell 22). The engine keeps snappy + maxRecordsPerFile and adds
optional partitioned layout — at 100 TB you always write partitioned
(e.g. by date) so downstream scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 1_000_000,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """Parquet sink (reference S3).

    ``sort_within_partitions`` clusters rows inside each file so parquet
    min/max row-group stats become selective for downstream point-in-time
    predicates — free pruning at read time.
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table — the co-located-join layout.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT a shuffle (no Exchange in the plan; asserted in
    tests/test_plans.py). At 100 TB this is how the repeatedly-joined keys
    (session_id, user_id, item_id) avoid re-shuffling the fact table for
    every query: pay the clustering once at write time. ``sort_by`` the
    bucket key too and the sort-merge join skips its sort.

    Bucket metadata lives in the session catalog (``saveAsTable``); pass
    ``path`` to make it an external table at a chosen location.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_range_clustered(
    df: DataFrame,
    path: str,
    *,
    range_by: list[str],
    sort_by: list[str] | None = None,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet — the data-skipping layout for range keys.

    ``repartitionByRange`` gives each output file a disjoint key range
    (global clustering), then rows are sorted inside each file so every
    parquet row group carries tight min/max stats on the cluster keys. A
    downstream range predicate then skips whole files AND whole row
    groups — the poor man's Z-order, exactly right for the engine's
    dominant access patterns (user slices, time slices). At 100 TB:
    partition by coarse time (day), range-cluster by (user_id, ts) inside
    each partition; point-in-time scans touch one partition and a handful
    of row groups instead of the full table.

    The range boundaries come from a sampling pass over ``range_by``
    (Spark's RangePartitioner) — one extra job at write time, free at
    read time forever after.
    """
    clustered = df.repartitionByRange(num_files, *range_by)
    clustered = clustered.sortWithinPartitions(*(sort_by or range_by))
    clustered.write.mode(mode).parquet(path)


def upsert_parquet(
    spark,
    target_path: str,
    updates: DataFrame,
    *,
    key_cols: list[str],
    out_path: str,
) -> DataFrame:
    """Copy-on-write MERGE (upsert) for plain parquet: rows from
    ``updates`` replace target rows with the same key, unmatched update
    rows append, untouched target rows carry over — written as a NEW
    snapshot directory (``out_path``), never in place. This is the
    primitive under Delta/Iceberg MERGE: at 100 TB you pair it with
    partition pruning so only partitions containing touched keys are
    rewritten; readers atomically switch snapshots by path (or catalog
    pointer swap).

    Plan: one left_anti join (target minus touched keys — broadcast when
    updates are small, the common CDC case) + unionByName + write.
    Returns the re-read snapshot.

    Keys match NULL-safely (``<=>``): MERGE treats two NULL keys as the
    same key — a plain equi-anti-join would keep the stale NULL-key row
    AND append the updated one, duplicating that group every merge.
    """
    from pyspark.sql import functions as F2

    target = spark.read.parquet(target_path)
    cond = [
        target[k].eqNullSafe(updates[k]) for k in key_cols
    ] or [F2.lit(True)]
    survivors = target.join(updates, cond, "left_anti")
    merged = survivors.unionByName(updates)
    merged.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    *,
    target_rows_per_file: int,
) -> "DataFrame":
    """Small-file compaction: rewrite a fragmented parquet directory into
    ``ceil(rows / target)`` evenly-sized files. The small-files problem
    is the classic death-by-metadata failure at 100 TB (a streaming sink
    or over-parallel write leaves millions of KB-sized files; every
    downstream scan pays per-file open + footer + scheduling costs).
    Compaction = one narrow read → round-robin repartition → write; run
    it partition-by-partition behind the same snapshot-swap pattern as
    :func:`upsert_parquet`. Returns a 1-row stats DataFrame
    (files_before, files_after, n_rows).
    """
    import math

    from pyspark.sql import functions as F2

    df = spark.read.parquet(in_path)
    n_rows = df.count()
    files_before = df.select(
        F2.input_file_name().alias("f")
    ).distinct().count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    files_after = (
        spark.read.parquet(out_path)
        .select(F2.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    return spark.createDataFrame(
        [(files_before, files_after, n_rows)],
        "files_before bigint, files_after bigint, n_rows bigint",
    )


def zorder_value(cols: list[str], *, bits: int = 16):
    """Z-order (Morton) curve value for 2+ integer columns: interleave the
    low ``bits`` bits of each column, column j owning bit positions
    j, j+k, j+2k, ... (k = number of columns). Pure JVM bit arithmetic
    (shifts/AND/OR unrolled — whole-stage-codegen, no UDF).

    Each column is first reduced ``pmod(col, 2^bits)`` so the interleave is
    well-defined for ANY input sign/magnitude. Values 2^bits apart alias to
    the same curve position — harmless for correctness (layout-only) but it
    erodes locality, so for keys with cardinality above 2^bits pass a
    rank/bucket expression (or raise ``bits``) rather than the raw value.
    NULLs sort first (NULL z-value). ``len(cols)·bits`` must fit a bigint
    (≤ 63) — Spark's shiftleft wraps shift counts mod 64, which would
    silently corrupt the interleave otherwise."""
    from pyspark.sql import functions as F

    k = len(cols)
    if k * bits > 63:
        raise ValueError(
            f"zorder_value: {k} cols × {bits} bits = {k * bits} bit positions"
            " exceeds bigint (max 63) — lower bits or drop a column"
        )
    m = 1 << bits
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            # bit i of column j → bit (i*k + j) of the z-value
            terms.append(
                f"(shiftleft((pmod(CAST(`{c}` AS BIGINT), {m}) >> {i}) & 1,"
                f" {i * k + j}))"
            )
    return F.expr(" | ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zorder_by: list[str],
    bits: int = 16,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet — MULTI-dimensional data skipping.
    North-star extension (SURVEY §2.11) — no reference counterpart.

    ``write_range_clustered`` gives tight min/max stats on a prefix of the
    sort key only; the Morton curve interleaves the key bits so EVERY
    z-ordered column gets locality: each output file covers a small
    hyper-rectangle of the key space, and a predicate on ANY subset of the
    columns skips most files via parquet min/max stats. This is the layout
    Delta/Iceberg OPTIMIZE ZORDER produces, expressed with stock Spark:
    one z-value projection + repartitionByRange + sortWithinPartitions.
    At 100 TB: z-order the fact table by its two dominant filter columns
    (e.g. user_id, event-day) inside coarse time partitions; either-column
    point queries then touch O(files^(1/2)) of the data instead of all of
    it. The z column is dropped before write — layout-only, no schema
    change (oracle = plain scan, like bucketing)."""
    z = zorder_value(zorder_by, bits=bits)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    clustered.write.mode(mode).parquet(path)
