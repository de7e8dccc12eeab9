"""Declared query catalog — the driver contract (SURVEY.md §2).

Every operator the engine claims is registered here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) the equivalent DuckDB oracle SQL. The driver runs both at
sf=0.01 and compares row count + schema + order-insensitive value hash.

Cross-engine determinism rules used throughout (these are the reason the
hashes match — keep them when adding queries):

1. Timestamps leave the query as exact integer epoch-µs
   (Spark ``unix_micros`` ≡ DuckDB ``epoch_us``).
2. Sums over doubles go through DECIMAL(18,2|6) — exact, order-independent —
   then cast back to double (same rational → bit-identical double).
   CAVEAT (learned from q_agg_corr_moments): the cast-back is bit-identical
   ONLY while the decimal's scaled value fits in 53 bits. A sum of decimal
   PRODUCTS (price², price·qty) can carry 17+ significant digits; there
   Spark's BigDecimal→double and DuckDB's int128-scaled→double casts may
   round 1 ulp apart. Either keep scaled magnitudes < 2^53 or quantize the
   OUTPUT (floor(x·1e9) for values in [-1,1], floor(x·1e6) otherwise).
3. Derived doubles use the *same IEEE expression tree* on both sides
   (+-*/ and sqrt are correctly-rounded per IEEE-754 → bit-identical);
   never ``round()`` (Spark HALF_UP vs DuckDB HALF_EVEN differ on ties) and
   never bare libm transcendentals (log/exp may differ by 1 ulp between
   JVM and glibc) — those go through ``floor(x * 1e6)`` → bigint.
4. Every window/top-k carries a total-order tiebreaker (SURVEY §4.4).
5. Half-open time ranges: ``>= start AND < end``; point-in-time predicates
   strictly ``<``.
6. RESULT TYPES must stringify identically under str(), pandas, AND arrow
   conversion on both engines — the driver's hash may go through any of
   them. The one asymmetry that bit us (the r1/r2 driver hash-fails on
   q_null_handling / q_join_asof_prefix / q_window_running_sum /
   q_agg_twolevel, root-caused in r3): DuckDB ``SUM`` over integers yields
   HUGEINT (int128), which pandas renders as float64 ("123.0") while
   Spark's LongType renders "123" — identical under fetchall()+str() (how
   the local rehearsal compared, hence "passes locally, fails on driver").
   Rule: CAST every DuckDB integer SUM (plain, windowed, or COALESCEd) to
   BIGINT. Allowed type pairs are locked inside
   tests/test_catalog_oracle.py::test_oracle_match (``_TYPE_OK``).
"""

from __future__ import annotations

import os
import re
import tempfile
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_retailrocket_recsys_spark.operators.aggregates import (
    collect_ordered_seq,
    two_level_agg,
)
from bigdata_retailrocket_recsys_spark.operators.joins import (
    anti,
    covis_pairs,
    pit_last_join,
    prefix_agg_join,
    semi,
)
from bigdata_retailrocket_recsys_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from bigdata_retailrocket_recsys_spark.operators.windows import (
    lag_delta,
    latest_per_key,
    running_sum,
    topk_per_group,
)
from bigdata_retailrocket_recsys_spark.sources.readers import load_table
from bigdata_retailrocket_recsys_spark.sources.scratch import session_scratch
from bigdata_retailrocket_recsys_spark.sources.writers import write_parquet

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class CatalogQuery:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None → rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


QUERIES: dict[str, CatalogQuery] = {}

#: The engine reads ``events.ts`` (physically TIMESTAMP(NANOS)) FLOORED to
#: µs (`sources/readers.py` load_table: ``(ts - pmod(ts,1000)) div 1000`` on
#: the ns bigint). DuckDB's parquet scan behavior for TIMESTAMP_NS *differs
#: by version* (1.0 truncates to µs at scan; newer versions preserve ns) —
#: so every oracle that touches ``events`` is rewritten at registration time
#: to read through a CTE that floors ts to µs with exact integer arithmetic:
#: ``epoch_ns`` is exact in both representations, and ``_floordiv_sql``
#: subtracts a non-negative modulus before dividing so the division is exact
#: — where trunc ≡ floor, making the expression identical under EITHER
#: integer-division semantics (DuckDB 1.0's ``//`` truncates; do not assume
#: it floors). After the CTE, oracle ts semantics (comparisons, ORDER BY,
#: epoch_us, windows) are identical to the engine's µs view in ANY DuckDB
#: version, for ANY epoch sign.


def _floordiv_sql(x: str, n: int) -> str:
    """Version/sign-proof FLOOR(x/n) for DuckDB oracle SQL (n > 0).

    ``((x % n) + n) % n`` is the non-negative modulus on any engine;
    subtracting it makes the division exact, so trunc-vs-floor ``//``
    semantics can no longer matter. Spark twin: ``(x - pmod(x, n)) div n``
    (`_floordiv_expr`)."""
    return f"(({x}) - ((({x}) % {n} + {n}) % {n})) // {n}"


def _floormul_sql(x: str, n: int) -> str:
    """FLOOR(x/n)*n — bucket start (tumbling-window form) of `_floordiv_sql`."""
    return f"(({x}) - ((({x}) % {n} + {n}) % {n}))"


def floordiv_expr(x: str, n: int) -> str:
    """Spark SQL twin of `_floordiv_sql`: exact FLOOR(x/n) for any sign of x."""
    return f"(({x}) - pmod(({x}), {n})) div {n}"


_EVENTS_US_CTE = (
    "events_us AS (SELECT * REPLACE "
    f"(make_timestamp({_floordiv_sql('epoch_ns(ts)', 1000)}) AS ts) FROM events)"
)

_EVENTS_REF = re.compile(r"\bevents\b")


def _normalize_oracle(sql: str | None) -> str | None:
    """Prepend the µs-floor events CTE to any oracle referencing ``events``.

    Rewrites table references ``events`` → ``events_us`` (word-boundary, so
    aliases like ``n_events`` are untouched) and splices the CTE into an
    existing WITH list when present (incl. WITH RECURSIVE — non-recursive
    members in a recursive list are legal)."""
    if sql is None or not _EVENTS_REF.search(sql):
        return sql
    body = _EVENTS_REF.sub("events_us", sql)
    stripped = body.lstrip()
    lead_ws = body[: len(body) - len(stripped)]
    low = stripped.lower()
    if low.startswith("with recursive"):
        rest = stripped[len("with recursive") :]
        return f"{lead_ws}WITH RECURSIVE {_EVENTS_US_CTE},{rest}"
    if low.startswith("with"):
        rest = stripped[len("with") :]
        return f"{lead_ws}WITH {_EVENTS_US_CTE},{rest}"
    return f"{lead_ws}WITH {_EVENTS_US_CTE}\n{stripped}"


def query(name: str, oracle: str | None = None, *, headline: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        # latest-wins shadowing once silently DELETED a declared query
        # (a second q_snapshot_diff, r7) — duplicate names are a bug
        if name in QUERIES:
            raise ValueError(f"duplicate catalog query name: {name!r}")
        QUERIES[name] = CatalogQuery(
            name, fn, _normalize_oracle(oracle), headline, fn.__doc__ or ""
        )
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec_value(col: str = "value", prec: str = "18,2"):
    """NaN/±inf-guarded decimal cast of an arbitrary double column.

    ``events.value`` is driver-generated and may contain NaN/inf; a bare
    decimal cast of NaN throws under ANSI Spark AND under every DuckDB CAST
    (1.0's TRY_CAST included). Guarding on both engines maps NaN/inf → NULL
    identically, so decimal sums skip them on both sides. Oracle twin:
    ``CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(...) END``.
    """
    c = F.col(col)
    return F.when(~F.isnan(c) & (F.abs(c) != float("inf")), c).cast(
        f"decimal({prec})"
    )


# ---------------------------------------------------------------------------
# §2.1 Scans / sources / sinks
# ---------------------------------------------------------------------------


@query(
    "q_scan_parquet",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id < 2000
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — parquet scan with pushed filter + pruned columns
    (ref: ipynb cell 24 re-read; engine checks PushedFilters in bench)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "q_scan_csv",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — CSV scan with explicit schema (ref py:70-71 uses inferSchema;
    engine declares the schema — SURVEY §1.3). Round-trips the events table
    through CSV to prove the reader, then aggregates."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bigdata_retailrocket_recsys_spark.sources.readers import read_csv

    out = session_scratch(spark, "csv_roundtrip")
    (
        _t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    return (
        read_csv(spark, out, schema)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec_value())
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "q_sink_parquet",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events
    WHERE user_id < 100 GROUP BY event_type
    """,
)
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — parquet sink (overwrite, maxRecordsPerFile — ref py:640-644,
    ipynb cell 22) proven by write → re-read → aggregate."""
    out = session_scratch(spark, "parquet_sink")
    write_parquet(
        _t(spark, sf_dir, "events").filter(F.col("user_id") < 100),
        out,
        max_records_per_file=50_000,
    )
    return spark.read.parquet(out).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q_sql_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
    """,
)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL front door: the engine's tables registered as temp views and
    queried with ``spark.sql`` (TPC-H Q6 shape) — same Catalyst plan as
    the DataFrame API, proving both entry points serve the catalog."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("bdrr_lineitem")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM bdrr_lineitem
        WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
        """
    )


@query(
    "q_scan_json",
    oracle="""
    SELECT event_type, COUNT(*) AS n, MIN(user_id) AS min_user
    FROM events WHERE user_id < 200 GROUP BY event_type
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source (engine extension; reference reads only CSV):
    write → read with explicit schema (no inference pass at scale) →
    aggregate."""
    out = session_scratch(spark, "json_roundtrip")
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("event_id", "user_id", "event_type")
        .write.mode("overwrite")
        .json(out)
    )
    schema = "event_id bigint, user_id bigint, event_type string"
    return (
        spark.read.schema(schema)
        .json(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("user_id").alias("min_user"),
        )
    )


@query(
    "q_scan_orc",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink (engine extension): columnar round-trip through the
    other columnar format Spark ships natively; predicate/column pushdown
    works the same as parquet."""
    out = session_scratch(spark, "orc_roundtrip")
    (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite")
        .orc(out)
    )
    return (
        spark.read.orc(out)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "q_sink_partitioned",
    oracle="""
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_value
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned re-read: the 100 TB
    layout where a predicate on the partition column prunes directories
    instead of scanning row groups (PartitionFilters asserted in
    tests/test_plans.py)."""
    out = session_scratch(spark, "parquet_partitioned")
    write_parquet(
        _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        ),
        out,
        partition_by=["event_type"],
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec_value())
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "q_sink_sorted_pruning",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_value
    FROM events WHERE user_id BETWEEN 40 AND 49 GROUP BY event_type
    """,
)
def q_sink_sorted_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered parquet sink + data-skipping re-read: files get
    disjoint user_id ranges (repartitionByRange) and row groups carry
    tight min/max stats (sortWithinPartitions), so the BETWEEN predicate
    skips whole files/row groups at scan time — the complement of
    q_sink_partitioned for keys too high-cardinality to be directory
    partitions (PushedFilters asserted in tests/test_plans.py)."""
    from bigdata_retailrocket_recsys_spark.sources.writers import (
        write_range_clustered,
    )

    out = session_scratch(spark, "parquet_rangeclustered")
    write_range_clustered(
        _t(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "event_type", "value"
        ),
        out,
        range_by=["user_id"],
        sort_by=["user_id", "ts"],
        num_files=8,
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id").between(40, 49))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec_value())
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "q_sink_zorder_pruning",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n
    FROM (SELECT event_type,
                 user_id,
                 {_floordiv_sql("epoch_us(ts)", 86400000000)} AS d
          FROM events)
    WHERE user_id BETWEEN 40 AND 49 AND d BETWEEN 19723 AND 19730
    GROUP BY event_type
    """,
)
def q_sink_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered sink + MULTI-column data-skipping re-read: the
    Morton curve interleaves (user_id, epoch-day) bits so each output file
    covers a small hyper-rectangle of the key space — predicates on EITHER
    or BOTH columns skip files via parquet min/max stats, where
    range-clustering (q_sink_sorted_pruning) only skips on the sort-key
    prefix. Both keys here fit 16 bits (1.5k users, epoch-day ~19.7k);
    at 100 TB a key with cardinality above 2^bits must be bucketed/ranked
    first or it aliases across the curve and locality erodes
    (zorder_value masks with pmod, so results stay correct either way).
    Layout-only: the oracle is the plain filtered scan. The
    locality invariant (per-file hypervolume ≪ random layout) is
    unit-tested; PushedFilters asserted in tests/test_plans.py."""
    from bigdata_retailrocket_recsys_spark.sources.writers import (
        write_zordered,
    )

    out = session_scratch(spark, "parquet_zordered")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(floordiv_expr("unix_micros(ts)", 86400000000)).alias("d"),
    )
    write_zordered(ev, out, zorder_by=["user_id", "d"], num_files=8)
    return (
        spark.read.parquet(out)
        .filter(
            F.col("user_id").between(40, 49) & F.col("d").between(19723, 19730)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.7 Set operations
# ---------------------------------------------------------------------------


@query(
    "q_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 100000
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 200000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION ALL bag semantics (ref py:153, py:365-369): overlapping
    inputs stay duplicated."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.filter(F.col("o_totalprice") < 100000).union(
        o.filter(F.col("o_totalprice") < 200000)
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_totalprice < 100000
    UNION
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — UNION set semantics via union().distinct() (ref py:365-370:
    candidate merge)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") < 100000)
        .select("o_orderkey")
        .union(o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"))
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op extension (not in reference — SURVEY §2.7)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
        .intersect(o.select(F.col("o_custkey").alias("c_custkey")))
    )


@query(
    "q_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op extension (not in reference — SURVEY §2.7)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.select("c_custkey").subtract(
        o.filter(F.col("o_totalprice") > 50000).select(
            F.col("o_custkey").alias("c_custkey")
        )
    )


# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "q_project_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(l_linenumber AS BIGINT) AS ln,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           l_returnflag
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — project + rename + cast (ref py:86-91, 164-168)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 3000)
        .select(
            "l_orderkey",
            F.col("l_orderkey").cast("string").alias("okey_str"),
            F.col("l_linenumber").cast("bigint").alias("ln"),
            F.floor("l_quantity").cast("bigint").alias("qty_floor"),
            "l_returnflag",
        )
    )


@query(
    "q_filter_ts_range",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    """,
)
def q_filter_ts_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — half-open timestamp range (ref py:80-83, 199-207: >= start AND
    < end; SURVEY §4.4)."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
    ).select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"))


@query(
    "q_filter_eq",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — string equality predicate (ref py:162 property='categoryid',
    py:186 event='addtocart')."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


@query(
    "q_having",
    oracle="""
    SELECT user_id, COUNT(*) AS n_purchases
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING COUNT(*) >= 15
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — post-aggregation threshold (ref py:260 covis>=3, py:303
    cooccur>=5)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .filter(F.col("n_purchases") >= 15)
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN value IS NOT NULL
                       AND (isnan(value) OR value >= 5)
                      THEN 1 END) AS n_notnull,
           CAST(SUM(CASE WHEN value IS NULL
                     OR (NOT isnan(value) AND value < 5)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM events GROUP BY event_type
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — isNull/isNotNull discipline (ref py:106,114 NULL lag rows).

    NaN placement is decided by EXPLICIT ``isnan`` on both engines — never
    by a comparison against the NaN-able column. ``NaN >= 5`` is TRUE under
    total-order semantics (Spark, DuckDB >= 1.0) but FALSE under IEEE
    semantics (older DuckDB builds) — the exact count-flip signature of the
    r1/r2 driver hash-fail (VERDICT r2 item #2). With isnan short-circuiting
    first, NaN lands in n_notnull on every engine version."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "is_big",
        F.col("value").isNotNull()
        & (F.isnan("value") | (F.col("value") >= 5)),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("is_big"), 1)).alias("n_notnull"),
        F.sum(F.when(~F.col("is_big"), 1).otherwise(0)).alias("n_null"),
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — distinct on projected keys (ref py:136, 246, 370)."""
    return _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@query(
    "q_join_inner_eq",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def q_join_inner_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — single-key equi inner join (ref py:187,241,...). Catalyst
    broadcasts the 1.5k-row customer side automatically."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 450000
    """,
)
def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketing: both sides written
    bucketed by the join key (same bucket count), so the sort-merge join
    runs with NO Exchange — the 100 TB layout for repeatedly-joined keys.
    Oracle is the plain equi join (bucketing is a physical layout, not a
    semantic change)."""
    from bigdata_retailrocket_recsys_spark.sources.writers import write_bucketed

    base = session_scratch(spark, "bucketed")
    write_bucketed(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        "bdrr_orders_bkt",
        bucket_by=["o_custkey"],
        num_buckets=8,
        sort_by=["o_custkey"],
        path=os.path.join(base, "orders"),
    )
    write_bucketed(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        "bdrr_customer_bkt",
        bucket_by=["c_custkey"],
        num_buckets=8,
        sort_by=["c_custkey"],
        path=os.path.join(base, "customer"),
    )
    o = spark.table("bdrr_orders_bkt").filter(F.col("o_totalprice") > 450000)
    c = spark.table("bdrr_customer_bkt")
    # merge hint: prove the co-located SMJ path (broadcast would hide it)
    return (
        o.hint("merge")
        .join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_custkey", "c_name")
    )


@query(
    "q_join_salted_skew",
    oracle="""
    SELECT c.c_custkey, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew salting: deterministic fact-side salt + dim replicated
    ×buckets, joined on (key, salt) — value-identical to the plain equi
    join (the oracle IS the plain join), spreads hot keys over
    ``buckets`` tasks where AQE skew splitting can't run (streaming) or
    isn't enough."""
    from bigdata_retailrocket_recsys_spark.operators.joins import salted_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return salted_join(c, n, "c_nationkey", buckets=8).select(
        "c_custkey", "n_name"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — explicit broadcast of a small dim (replaces the reference's
    broadcast-dict UDF lookup, py:603-622 — SURVEY §2.10/F1)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (engine extension — SURVEY §2.3 'surfaces anyway')."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi(c, o, ["c_custkey"]).select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (engine extension)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti(c, o, ["c_custkey"]).select("c_custkey", "c_name")


@query(
    "q_join_left_nullfill",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left_nullfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — left join + coalesce null-fill (ref py:532-555 feature assembly,
    py:564-590 null discipline)."""
    c = _t(spark, sf_dir, "customer")
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_spent", F.lit(0.0)).alias("total_spent"),
    )


@query(
    "q_join_composite_key",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, g.type_cnt
    FROM events e
    JOIN (SELECT user_id, event_type, COUNT(*) AS type_cnt
          FROM events GROUP BY user_id, event_type) g
      ON e.user_id = g.user_id AND e.event_type = g.event_type
    WHERE e.event_id < 2000
    """,
)
def q_join_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 — composite-key equi join (ref py:451-455 (session_id, atc_ts))."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("type_cnt"))
    return (
        ev.filter(F.col("event_id") < 2000)
        .join(g, ["user_id", "event_type"], "inner")
        .select("event_id", "user_id", "event_type", "type_cnt")
    )


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — cross join with a tiny side → BroadcastNestedLoopJoin
    (ref py:339-340: ATC × top-20 categories)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    s = _t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(s))


@query(
    "q_join_asof_prefix",
    headline=True,
    oracle="""
    SELECT a.event_id,
           COUNT(e.event_id) AS n_prefix_events,
           CAST(COALESCE(SUM(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_prefix_views
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') a
    LEFT JOIN events e ON a.user_id = e.user_id AND e.ts < a.ts
    GROUP BY a.event_id, a.user_id, a.ts
    """,
)
def q_join_asof_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — point-in-time prefix theta-join + aggregate (ref py:235-239,
    465-496: all events strictly before the anchor, same key)."""
    ev = _t(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = prefix_agg_join(
        anchors,
        ev.select("user_id", "ts", "event_id", "event_type"),
        key_cols=["user_id"],
        anchor_ts="ts",
        event_ts="ts",
        aggs=[
            F.count(F.col("e.event_id")).alias("n_prefix_events"),
            F.coalesce(
                F.sum(F.when(F.col("e.event_type") == "view", 1).otherwise(0)),
                F.lit(0),
            ).alias("n_prefix_views"),
        ],
    )
    return out.select("event_id", "n_prefix_events", "n_prefix_views")


@query(
    "q_join_pit_user",
    oracle="""
    SELECT a.event_id,
           COALESCE(epoch_us(MAX(e.ts)), -1) AS last_view_us
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') a
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') e
      ON a.user_id = e.user_id AND e.ts < a.ts
    GROUP BY a.event_id, a.user_id, a.ts
    """,
)
def q_join_pit_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — as-of lookup of latest prior state (ref py:343-353: user history
    last_seen < atc_ts)."""
    ev = _t(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = pit_last_join(
        anchors,
        views,
        key_cols=["user_id"],
        anchor_ts="ts",
        event_ts="ts",
        value_aggs=[
            F.coalesce(F.unix_micros(F.max(F.col("e.ts"))), F.lit(-1)).alias(
                "last_view_us"
            )
        ],
    )
    return out.select("event_id", "last_view_us")


@query(
    "q_join_self_covis",
    oracle="""
    WITH items AS (
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM events
    )
    SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS covis
    FROM items a JOIN items b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY a.item, b.item
    HAVING COUNT(*) >= 40
    """,
)
def q_join_self_covis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — co-visitation self-join with key-ordering predicate
    (ref py:252-260: a.item < b.item dedupes unordered pairs; HAVING bounds
    the quadratic blowup)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("item"),
    )
    return covis_pairs(ev, group_col="user_id", item_col="item", min_count=40)


# ---------------------------------------------------------------------------
# §2.5 Window functions + sessionization
# ---------------------------------------------------------------------------


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id,
           epoch_us(ts) - epoch_us(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)) AS gap_us
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — lag per group, exact µs (ref py:96-109); NULL first rows."""
    ev = _t(spark, sf_dir, "events")
    return lag_delta(
        ev, partition_by=["user_id"], ts_col="ts", tiebreak_cols=["event_id"]
    ).select("event_id", "gap_us")


@query(
    "q_window_running_sum",
    oracle="""
    SELECT event_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS run_purchases
    FROM events
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — running sum, unbounded-preceding frame (ref py:119-123 session
    ordinal)."""
    ev = _t(spark, sf_dir, "events")
    flag = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    return running_sum(
        ev,
        flag,
        partition_by=["user_id"],
        order_by=[F.col("ts"), F.col("event_id")],
        out_col="run_purchases",
    ).select("event_id", "run_purchases")


@query(
    "q_window_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — latest row per key (ref py:171-173: latest category per item)."""
    ev = _t(spark, sf_dir, "events")
    return latest_per_key(
        ev, key_cols=["user_id"], ts_col="ts", tiebreak_cols=["event_id"]
    ).select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"))


@query(
    "q_window_topk_per_group",
    headline=True,
    oracle="""
    SELECT event_type, user_id, cnt, rnk FROM (
        SELECT event_type, user_id, cnt,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY cnt DESC NULLS LAST, user_id ASC NULLS FIRST) AS rnk
        FROM (SELECT event_type, user_id, COUNT(*) AS cnt
              FROM events GROUP BY event_type, user_id)
    ) WHERE rnk <= 3
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — per-group top-k with deterministic tiebreak (ref py:280-287,
    322-329, 354-362). Compiles to WindowGroupLimit."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return topk_per_group(
        counts,
        group_cols=["event_type"],
        order_by=[F.col("cnt").desc(), F.col("user_id").asc()],
        k=3,
        rank_col="rnk",
    ).select("event_type", "user_id", "cnt", "rnk")


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
    ), sessions AS (
        SELECT user_id, ts,
               CAST(user_id AS VARCHAR) || '_' || CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS session_id
        FROM flagged
    )
    SELECT session_id,
           MIN(user_id) AS user_id,
           COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS start_us,
           MAX(epoch_us(ts)) AS end_us,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
    FROM sessions GROUP BY session_id
    """,
    headline=True,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2 composite — the reference's signature operator: 30-min-gap
    sessionization (py:96-131) + per-session rollup. One shuffle."""
    ev = _t(spark, sf_dir, "events")
    s = sessionize(
        ev, user_col="user_id", ts_col="ts", gap_minutes=30, tiebreak_cols=["event_id"]
    )
    return session_stats(s)


# ---------------------------------------------------------------------------
# §2.6 Sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "q_orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST LIMIT 20
    """,
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — global top-k: TakeOrderedAndProject, no full sort
    (ref py:331-337 top-20 categories)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — multi-column global sort (ref py:396) with total order."""
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@query(
    "q_agg_count",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — hash aggregate count(*) (ref py:258-259, 335-336)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — exact countDistinct (ref py:302, 477, 485, 514, 527)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q_agg_minmax_avg",
    oracle="""
    SELECT event_type,
           MIN(value) AS min_v, MAX(value) AS max_v,
           CAST(SUM(CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_v,
           CAST(SUM(CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) / COUNT(*) AS avg_v
    FROM events GROUP BY event_type
    """,
)
def q_agg_minmax_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — min/max/sum/avg; sums exact via decimal, avg as identical IEEE
    division (ref py:347, 484, 528)."""
    sum_dec = F.sum(_dec_value()).cast("double")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            sum_dec.alias("sum_v"),
            (sum_dec / F.count(F.lit(1))).alias("avg_v"),
        )
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    THEN CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE CAST(value AS DECIMAL(18,2)) END END), 0) AS DOUBLE)
               AS purchase_value,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
    FROM events GROUP BY user_id
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — filtered aggregation sum(CASE WHEN ...) (ref py:479-483)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        _dec_value(),
                    )
                ),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("purchase_value"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
    )


@query(
    "q_agg_twolevel",
    oracle=f"""
    SELECT user_id,
           COUNT(*) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_events_per_day
    FROM (SELECT user_id, {_floordiv_sql("epoch_us(ts)", 86400000000)} AS d,
                 COUNT(*) AS n
          FROM events GROUP BY user_id, 2)
    GROUP BY user_id
    """,
)
def q_agg_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — two-level re-aggregation (ref py:524-529: per-(user,session)
    duration → per-user avg).

    Day bucket is a tz-independent integer (FLOOR(epoch-µs / 86.4e9)) on
    BOTH engines — Spark's date_trunc is session-timezone-sensitive and
    DuckDB's is naive, so a truncated-timestamp key can shift day buckets
    whenever the driver's session tz differs; integer division cannot.
    FLOOR via exact-division form (`floordiv_expr`), not `div`/`//`, so
    pre-1970 epochs bucket identically under trunc- or floor-division
    semantics (r2 driver-fail hazard, VERDICT r2 item #2)."""
    ev = _t(spark, sf_dir, "events")
    return two_level_agg(
        ev,
        fine_keys=[
            "user_id",
            F.expr(floordiv_expr("unix_micros(ts)", 86400000000)).alias("d"),
        ],
        fine_aggs=[F.count(F.lit(1)).alias("n")],
        coarse_keys=["user_id"],
        coarse_aggs=[
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("n_events"),
            (F.sum("n").cast("double") / F.count(F.lit(1))).alias(
                "avg_events_per_day"
            ),
        ],
    )


@query(
    "q_agg_collect_seq",
    oracle="""
    SELECT user_id,
           STRING_AGG(event_type, ',' ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS seq
    FROM events GROUP BY user_id
    """,
)
def q_agg_collect_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — deterministic ordered sequence per group (ref py:393-400; the
    reference's orderBy-before-groupBy is NOT order-stable — SURVEY §4.4;
    engine packs struct(order_keys, value) + sort_array)."""
    ev = _t(spark, sf_dir, "events")
    seq = collect_ordered_seq(
        ev,
        group_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="event_type",
        out_col="seq_arr",
    )
    return seq.select("user_id", F.array_join("seq_arr", ",").alias("seq"))


@query(
    "q_agg_rollup",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets extension (not in reference — SURVEY §2.4 'engine
    adds')."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
    )


@query(
    "q_fn_struct_map",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS packed_price,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS from_map
    FROM orders WHERE o_orderkey < 400
    """,
)
def q_fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested types (absent from the reference — SURVEY §1.2): pack a
    struct, read a field back; build a map literal, look up a key. Output
    projected to scalars so the oracle compares values, not engine-specific
    nested renderings. The multimodal meta column (multimodal.py) uses the
    same struct machinery."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    packed = o.withColumn(
        "pack",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ),
    ).withColumn(
        "status_flags",
        F.create_map(F.lit("F"), F.lit(1), F.lit("O"), F.lit(0), F.lit("P"), F.lit(0)),
    )
    return packed.select(
        "o_orderkey",
        F.col("pack.price").alias("packed_price"),
        F.coalesce(
            F.col("status_flags")[F.col("pack.status")], F.lit(0)
        ).alias("from_map"),
    )


@query(
    "q_window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LEAD(o_orderkey) OVER w AS next_order,
           DENSE_RANK() OVER w AS drank,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey NULLS FIRST
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS rolling3_price
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey NULLS FIRST)
    """,
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window completeness beyond the reference's lag/row_number
    (SURVEY §2.5 'not present' list): lead, dense_rank, ntile,
    first_value, and an explicit ROWS BETWEEN rolling frame — one window
    spec, one shuffle."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    roll = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(roll)
        .cast("double")
        .alias("rolling3_price"),
    )


@query(
    "q_window_prefix_counts",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) NULLS FIRST
                          RANGE BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS n_prefix_events
    FROM events WHERE user_id < 50
    """,
)
def q_window_prefix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-before prefix counts as a RANGE window — ONE shuffle, no
    join: the superior plan for the reference's prefix-stats theta join
    (py:465-471) whenever anchors are rows of the same stream. Value-based
    frame makes same-µs ties deterministic on both engines."""
    from bigdata_retailrocket_recsys_spark.operators.windows import (
        prefix_counts_window,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return prefix_counts_window(ev, group_col="user_id", ts_col="ts").select(
        "event_id", "user_id", "n_prefix_events"
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, '*') AS rf,
           COALESCE(l_linestatus, '*') AS ls,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 grouping combinations in one pass
    (engine extension, SURVEY §2.4)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("*")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("*")).alias("ls"),
            "n",
        )
    )


@query(
    "q_pivot",
    oracle="""
    SELECT n_name,
           COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS seg_building,
           COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS seg_machinery,
           COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS seg_automobile
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) — compiles to the same
    hash-aggregate as SQL FILTER clauses; pivot values enumerated
    explicitly so no extra distinct-discovery job runs at scale."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE"]
    out = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "n_name",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"seg_{s.lower()}")
            for s in segs
        ],
    )
    return renamed


@query(
    "q_explode",
    oracle="""
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
    FROM documents WHERE doc_id < 20
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode / lateral unnest of an array column (generator in the
    SELECT list — the row-expanding primitive under every tokenize/
    shingle op)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )


@query(
    "q_fn_levenshtein",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
)
def q_fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy-matching primitive for entity dedup) — JVM
    built-in, exact integer → engine-independent."""
    a = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a")
    )
    b = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b")
    )
    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(FLOOR(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) * 1e6)
                AS BIGINT) AS median_qty_e6,
           CAST(FLOOR(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) * 1e6)
                AS BIGINT) AS p90_price_e6
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (linear interpolation). Interpolation arithmetic
    may differ by 1 ulp across engines → floor(x*1e6) per the catalog
    float rules."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.floor(
            F.percentile(F.col("l_quantity").cast("double"), F.lit(0.5)) * 1e6
        )
        .cast("bigint")
        .alias("median_qty_e6"),
        F.floor(
            F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.9))
            * 1e6
        )
        .cast("bigint")
        .alias("p90_price_e6"),
    )


@query(
    "q_agg_approx_percentile",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           1 AS median_rank_ok, 1 AS p90_rank_ok
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    GROUP BY l_returnflag
    """,
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (Greenwald-Khanna sketch) — the fixed-memory,
    mergeable quantile for 100 TB profiling where exact percentile's
    per-group sort/collect is the bottleneck. Raw sketch outputs are
    implementation- AND partitioning-specific, so the driver-hashable
    output is the sketch's own accuracy CONTRACT instead (r6 rows-only
    graduation, VERDICT r6 #5): per group, the exact rank interval of
    each approx value must intersect the GK-guaranteed window
    ``p·n ± n/accuracy (+1 slack)``. The oracle emits the constant-true
    flags — any Spark-side violation (wrong column, wrong p, merge bug,
    garbage value) flips a 1 to 0 and breaks the value hash. Exact
    VALUES are covered by q_agg_percentile; Spark-to-Spark partitioning
    stability of the flags is locked in tests/test_properties.py."""
    return approx_percentile_flags(_t(spark, sf_dir, "lineitem"))


def approx_percentile_flags(li: DataFrame) -> DataFrame:
    """Flag computation behind q_agg_approx_percentile, reusable over any
    (possibly re-partitioned) lineitem frame — the partitioning-stability
    property test drives it directly."""
    li = li.filter(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            F.col("l_quantity").cast("double"), F.lit(0.5), F.lit(1000)
        ).alias("mq"),
        F.percentile_approx(
            F.col("l_extendedprice").cast("double"), F.lit(0.9), F.lit(1000)
        ).alias("pp"),
    )
    # null-safe join back: a NULL l_returnflag group (advdata fixture)
    # must keep its flags — plain inner join on the key would drop it
    approx = approx.withColumnRenamed("l_returnflag", "_rf")
    joined = li.join(
        F.broadcast(approx),
        F.col("l_returnflag").eqNullSafe(F.col("_rf")),
    ).drop("_rf")
    ranks = joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_quantity").cast("double") < F.col("mq")).cast("bigint"))
        .alias("q_lo"),
        F.sum((F.col("l_quantity").cast("double") <= F.col("mq")).cast("bigint"))
        .alias("q_hi"),
        F.sum(
            (F.col("l_extendedprice").cast("double") < F.col("pp")).cast("bigint")
        ).alias("p_lo"),
        F.sum(
            (F.col("l_extendedprice").cast("double") <= F.col("pp")).cast("bigint")
        ).alias("p_hi"),
    )
    n = F.col("n_rows").cast("double")

    def ok(lo: str, hi: str, p: float) -> F.Column:
        eps = n / 1000.0 + 1.0  # 1/accuracy relative rank error + slack
        return (
            (F.col(lo) <= p * n + eps) & (F.col(hi) >= p * n - eps)
        ).cast("int")

    return ranks.select(
        "l_returnflag",
        "n_rows",
        ok("q_lo", "q_hi", 0.5).alias("median_rank_ok"),
        ok("p_lo", "p_hi", 0.9).alias("p90_rank_ok"),
    )


@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           1 AS within_bound
    FROM events GROUP BY event_type
    """,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate countDistinct (HLL++) — engine extension. Raw register
    estimates are implementation-specific, so (same move as
    q_agg_approx_percentile, r7 graduation) the driver-hashable output is
    the sketch's accuracy CONTRACT: per group, |estimate − exact| must be
    within 5× the configured rsd (0.02 → 10%, a ≥5σ margin — the estimate
    is deterministic per dataset, so the flag is stable). The exact
    distinct count rides along as a real hashed value column; a wrong
    column, wrong rsd, or merge bug flips the flag and breaks the hash."""
    est = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("n_exact"),
        )
    )
    err = F.abs(
        F.col("approx_users").cast("double") - F.col("n_exact").cast("double")
    )
    return est.select(
        "event_type",
        "n_exact",
        (err <= 0.10 * F.col("n_exact").cast("double")).cast("int").alias(
            "within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# §2.8 Scalar functions
# ---------------------------------------------------------------------------


@query(
    "q_fn_datetime",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS ts_us,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(dayofweek(ts) + 1 AS INT) AS day_of_week,
           CAST(CASE WHEN ts IS NULL THEN NULL
                     WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS INT)
               AS is_weekend,
           strftime(ts, '%Y-%m-%d') AS day_str
    FROM events WHERE event_id < 2000
    """,
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family (ref py:74-77 epoch→ts, py:573-575 hour/dayofweek/
    weekend). Spark dayofweek: 1=Sunday; DuckDB dayofweek: 0=Sunday → +1."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.dayofweek("ts").cast("int").alias("day_of_week"),
        F.dayofweek("ts").isin([1, 7]).cast("int").alias("is_weekend"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
    )


@query(
    "q_fn_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS size_class,
           GREATEST(l_quantity, 10.0) AS qty_floor10,
           CAST(CASE WHEN l_returnflag IS NULL THEN NULL
                     WHEN l_returnflag IN ('A', 'R') THEN 1 ELSE 0 END AS INT)
               AS is_returned
    FROM lineitem WHERE l_orderkey < 3000
    """,
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: when/otherwise, greatest, isin (ref py:105-117,
    564-590, 568, 575)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.greatest(F.col("l_quantity"), F.lit(10.0)).alias("qty_floor10"),
        F.col("l_returnflag").isin(["A", "R"]).cast("int").alias("is_returned"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(ln(1.0 + value) * 1000000) AS BIGINT) AS log1p_value_e6,
           sqrt(value) AS sqrt_value,
           abs(value - 10.0) AS abs_dev,
           value * 2.0 - 1.0 AS affine
    FROM events WHERE event_id < 2000 AND value >= 0
      AND NOT isnan(value) AND NOT isinf(value)
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (ref py:570, 581, 585 log1p; arithmetic py:76,114).
    sqrt/abs/* are IEEE-exact; ln goes through floor(x*1e6) because JVM and
    glibc libm may differ by 1 ulp."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("event_id") < 2000)
        & (F.col("value") >= 0)
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
    )
    return ev.select(
        "event_id",
        F.floor(F.log1p("value") * 1_000_000).cast("bigint").alias("log1p_value_e6"),
        F.sqrt("value").alias("sqrt_value"),
        F.abs(F.col("value") - 10.0).alias("abs_dev"),
        (F.col("value") * 2.0 - 1.0).alias("affine"),
    )


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           concat_ws('_', c_name, c_mktsegment) AS tagged,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INT) AS name_len
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (ref py:125-128 concat session-id synthesis)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("_", "c_name", "c_mktsegment").alias("tagged"),
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(list_contains(string_split(text, ' '), 'spark') AS INT)
               AS has_spark,
           list_sort(string_split(text, ' '))[1] AS first_token
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (ref: collect_list py:398-400; engine adds size/
    sort_array/array_contains — SURVEY §2.8)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.element_at(F.sort_array(toks), 1).alias("first_token"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction extension (driver testdata events.props — SURVEY
    §2.1 note, §2.11)."""
    return (
        _t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, 'spark')) AS INT) AS n_spark,
           CAST(regexp_matches(text, 'join|merge') AS INT) AS mentions_join
    FROM documents
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extension (SURVEY §2.8: engine adds regexp ops)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_count("text", F.lit("spark")).cast("int").alias("n_spark"),
        F.col("text").rlike("join|merge").cast("int").alias("mentions_join"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (bench anchors on the star schema)
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2001-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the scan+agg throughput anchor.
    Product terms computed in double (identical IEEE tree both engines),
    then decimal-summed for order-independent exactness."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
            "sum_qty"
        ),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_base_price"),
        F.sum(disc_price.cast("decimal(18,6)")).cast("double").alias(
            "sum_disc_price"
        ),
        F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_tpch_q3",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           epoch_us(o.o_orderdate) AS orderdate_us
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC NULLS LAST, o_orderkey ASC NULLS FIRST LIMIT 10
    """,
    headline=True,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join + agg + global top-k. Customer dim
    broadcasts; orders⋈lineitem shuffles on the join key once."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        F.broadcast(c)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue.cast("decimal(18,6)")).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("orderdate_us"))
    )


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    headline=True,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: the 6-table star join (local-supplier revenue).
    Every dimension (customer, supplier, nation, region) broadcasts; the
    only shuffle is lineitem⋈orders on the orderkey plus the final 5-row
    agg — the shape where Catalyst's join-order + broadcast selection does
    the heavy lifting. Decimal sum for order-independent revenue."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(revenue.cast("decimal(18,6)")).cast("double").alias("revenue")
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >= 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           epoch_us(o.o_orderdate) AS orderdate_us, b.sum_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped (large-volume customers): pre-aggregate the fact
    to order grain WITH the HAVING gate first — the aggregated+filtered
    side is then small enough to drive broadcast joins against orders and
    customer, instead of joining the raw fact three ways. Exact decimal
    quantity sum gates the threshold."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
        )
        .filter(F.col("q") >= 300)
        .select("l_orderkey", F.col("q").cast("double").alias("sum_qty"))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            "sum_qty",
        )
    )
