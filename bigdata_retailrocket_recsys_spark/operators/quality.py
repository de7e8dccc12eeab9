"""Declarative data-quality expectations (dbt-tests / Great-Expectations
shape) as ONE aggregate pass.

A production ingest pipeline gates every batch on assertions — null rate,
uniqueness, value ranges, referential membership. Naively that is one
scan per rule; here every rule compiles to a conditional aggregate over
the SAME single scan (count-if is map-side combinable), plus one
grouped-distinct pass for uniqueness rules, so a 100-TB table pays one
read for its whole contract. Results are exact integers → trivially
cross-engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: ``name`` + a boolean ``violated`` expression (row-level).
    NULL predicate results count as violations (three-valued logic made
    explicit — an unevaluable rule is a failing rule)."""

    name: str
    violated: Column


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", F.col(col).isNull())


def expect_between(col: str, lo, hi) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"between_{col}",
        ~((c >= F.lit(lo)) & (c <= F.lit(hi))) | c.isNull(),
    )


def expect_finite(col: str) -> Expectation:
    c = F.col(col).cast("double")
    return Expectation(
        f"finite_{col}",
        c.isNull() | F.isnan(c) | (F.abs(c) == float("inf")),
    )


def expect_matches(col: str, pattern: str) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"matches_{col}", c.isNull() | ~c.rlike(pattern)
    )


def check_expectations(
    df: DataFrame,
    rules: list[Expectation],
    *,
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate all rules in one scan; returns the violations report
    ``(rule, n_violations, n_rows, passed)`` (passed as INT — NULL-free
    flags stay cross-engine stringify-safe, see catalog type rules).

    Row-level rules share a single aggregate (one scan, map-side
    combined). A ``unique_cols`` rule needs its own grouped pass by
    nature (count rows in key groups of size > 1 — counts every row of
    a duplicated key, NULL keys exempt as SQL UNIQUE does); it is the
    only extra shuffle.
    """
    if not rules and not unique_cols:
        raise ValueError("no expectations given")
    aggs = [
        F.sum(F.when(r.violated, 1).otherwise(0))
        .cast("bigint")
        .alias(r.name)
        for r in rules
    ] + [F.count(F.lit(1)).cast("bigint").alias("__n")]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {pairs}) AS (rule, n_violations)".format(
                n=len(rules),
                pairs=", ".join(f"'{r.name}', {r.name}" for r in rules),
            )
        ),
        F.col("__n").alias("n_rows"),
    )
    if unique_cols:
        key = [F.col(c) for c in unique_cols]
        nn = df
        for c in unique_cols:
            nn = nn.filter(F.col(c).isNotNull())
        dup = (
            nn.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__k"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__k") > 1, F.col("__k"))), F.lit(0)
                )
                .cast("bigint")
                .alias("n_violations")
            )
            .select(
                F.lit("unique_" + "_".join(unique_cols)).alias("rule"),
                "n_violations",
            )
            .crossJoin(
                F.broadcast(df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")))
            )
        )
        stacked = stacked.unionByName(dup)
    return stacked.withColumn(
        "passed", F.when(F.col("n_violations") == 0, 1).otherwise(0)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style diff of two corpus snapshots: per key, is the row
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    content digest differs), or ``unchanged``. The maintenance primitive
    behind incremental reprocessing ("which documents must re-embed /
    re-dedup after this crawl?") and audit ("what did the pipeline
    change?").

    Relational shape: each side reduces to (key, md5-of-compare-cols) —
    16-byte digests shuffle, never content (the exact_dedup move) — then
    ONE full outer join on the keys decides the status. NULL/encoding
    discipline: each compare col contributes a FIXED-WIDTH field — the
    32-hex md5 of its value (NULL coalesced to '') plus a 1-char
    presence bit — and the row digest is the md5 of their plain concat.
    Fixed-width fields make the encoding injective for ANY column
    content (no separator to forge: a value embedding \\x01 or any other
    byte cannot reproduce adjacent-field framing), and the presence bit
    keeps NULL distinct from ''. Rows with NULL KEYS are dropped on both
    sides (a keyless row cannot be matched across snapshots; quarantine
    upstream).

    Output: (*key_cols, status string) — one row per key present in
    either snapshot.
    """

    def digest(df: DataFrame) -> DataFrame:
        parts = []
        for c in compare_cols:
            # 33-char fixed-width field per column: md5(value) + presence
            # bit — injective without separators (nothing to forge)
            parts.append(
                F.md5(F.coalesce(F.col(c).cast("string"), F.lit("")))
            )
            parts.append(F.col(c).isNull().cast("int").cast("string"))
        keep = None
        for c in key_cols:
            nn = F.col(c).isNotNull()
            keep = nn if keep is None else (keep & nn)
        return df.filter(keep).select(
            *key_cols, F.md5(F.concat(*parts)).alias("__digest")
        )

    o = digest(old).withColumnRenamed("__digest", "__d_old")
    n = digest(new).withColumnRenamed("__digest", "__d_new")
    joined = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old") == F.col("__d_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, status.alias("status"))


def enforce_k_anonymity(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """k-anonymity suppression: drop every row whose quasi-identifier
    combination is shared by fewer than ``k`` rows — the release gate a
    privacy-safe analytics/export pipeline runs before data leaves the
    boundary (small groups re-identify individuals). Returns surviving
    rows plus ``k_group_n`` (the group size, so downstream noise/
    generalization steps can calibrate).

    One window over the quasi columns (count, no ordering — a frameless
    aggregate window, map-side combinable into WindowExec without a
    sort) and a filter; rows shuffle once on the quasi key. NULL quasi
    values group together (SQL GROUP BY semantics) — a NULL is itself a
    quasi-identifier value and small NULL-groups are suppressed like any
    other. At 100 TB this is the same shape as any keyed count: AQE
    skew-join handling applies if one quasi combo dominates.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("k_group_n", F.count(F.lit(1)).over(w).cast("bigint"))
        .filter(F.col("k_group_n") >= k)
    )


def enforce_l_diversity(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """l-diversity release gate — the k-anonymity companion
    (Machanavajjhala et al. 2007): a group can be large (k-anonymous)
    yet still leak if everyone in it shares the same SENSITIVE value
    (the homogeneity attack — "all 80 rows in that zip/day are the same
    user"). Suppress every row whose quasi-identifier group holds fewer
    than ``l`` DISTINCT sensitive values.

    Shape: Spark does not allow distinct aggregates in a window, so the
    per-group distinct count is a two-phase aggregate —
    distinct (quasi, sensitive) → count per quasi — joined back on the
    quasi key NULL-SAFELY (a NULL quasi value is itself a
    quasi-identifier; its group must gate like any other, not vanish
    through a null-unsafe join — the _sharded_global_rank lesson). The
    group-count frame is quasi-cardinality-bounded.

    Output: surviving rows + ``l_distinct`` (the group's distinct
    sensitive count, for downstream generalization to calibrate).
    """
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    counts = (
        df.select(*quasi_cols, sensitive_col)
        .distinct()
        .groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("l_distinct"))
    )
    left, right = df.alias("__r"), counts.alias("__c")
    cond = None
    for c in quasi_cols:
        e = F.col(f"__r.{c}").eqNullSafe(F.col(f"__c.{c}"))
        cond = e if cond is None else (cond & e)
    return (
        left.join(F.broadcast(right), cond)
        .filter(F.col("__c.l_distinct") >= l)
        .select("__r.*", F.col("__c.l_distinct").alias("l_distinct"))
    )


def enforce_t_closeness(
    df: DataFrame,
    *,
    quasi_cols: list[str],
    bucket_col: str,
    t_num: int,
    t_den: int,
) -> DataFrame:
    """t-closeness release gate (Li, Li, Venkatasubramanian 2007) — the
    third of the privacy trio after k-anonymity and l-diversity: a
    group can be large AND diverse yet still leak if its SENSITIVE
    distribution is skewed vs the table at large ("that zip/day is 90%
    high-value purchases"). Suppress every row whose quasi-identifier
    group's ordered-EMD to the GLOBAL sensitive distribution exceeds
    ``t = t_num / t_den``.

    For an ORDERED sensitive attribute (``bucket_col``, an integer
    bucket; callers COALESCE NULLs to a sentinel bucket so every row
    participates), EMD has the closed form
    ``(1/(m-1)) * Σ_i |Σ_{j<=i} (p_j - q_j)|`` over the m ordered
    buckets. Kept exact/all-integer by cross-multiplication: with group
    counts g_j (size n_g) and global counts c_j (size N), the scaled
    prefix is ``s_i = Σ_{j<=i} (g_j·N − c_j·n_g)`` and the gate is
    ``t_den·Σ|s_i| <= t_num·(m−1)·n_g·N`` — no division anywhere, so
    the verdict is bit-identical cross-engine. (At counts beyond ~3e9
    the g·N products need DECIMAL(38,0); bigint is exact to 2^63 and
    fine at any per-table N where n_g·N < 9e18.)

    Shuffle shape: one groupBy per grain (global bucket counts — m rows,
    broadcast; group sizes; (group, bucket) counts), a dense
    groups×buckets grid via broadcast cross join (|groups|·m rows), a
    cumulative window per group over the m-bounded bucket axis, and a
    broadcast join-back to rows NULL-SAFELY on the quasi key (NULL
    quasi values are themselves quasi-identifiers — the
    _sharded_global_rank lesson). Output: surviving rows + ``emd_abs``
    (the scaled Σ|s_i|) and ``t_group_n``.
    """
    if t_den <= 0 or t_num < 0:
        raise ValueError(f"need t_num >= 0, t_den > 0; got {t_num}/{t_den}")
    from pyspark.sql import Window

    tot = df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    stats = tot.agg(
        F.sum("__c").cast("bigint").alias("__N"),
        F.count(F.lit(1)).cast("bigint").alias("__m"),
    )
    grp = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_g")
    )
    gc = df.groupBy(*quasi_cols, bucket_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__g")
    )
    grid = grp.crossJoin(F.broadcast(tot))
    cond = None
    for c in quasi_cols:
        e = F.col(f"__grid.{c}").eqNullSafe(F.col(f"__gc.{c}"))
        cond = e if cond is None else (cond & e)
    cond = cond & (
        F.col(f"__grid.{bucket_col}") == F.col(f"__gc.{bucket_col}")
    )
    joined = (
        grid.alias("__grid")
        .join(gc.alias("__gc"), cond, "left")
        .select(
            *[F.col(f"__grid.{c}") for c in quasi_cols],
            F.col(f"__grid.{bucket_col}"),
            F.col("__grid.__n_g"),
            F.col("__grid.__c"),
            F.coalesce(F.col("__gc.__g"), F.lit(0)).cast("bigint").alias("__g"),
        )
        .crossJoin(F.broadcast(stats))
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.withColumn(
        "__s",
        F.sum(
            F.col("__g") * F.col("__N") - F.col("__c") * F.col("__n_g")
        ).over(w),
    )
    emd = cum.groupBy(*quasi_cols).agg(
        F.max("__n_g").alias("__n_g"),
        F.sum(F.abs(F.col("__s"))).cast("bigint").alias("emd_abs"),
        F.max("__N").alias("__N"),
        F.max("__m").alias("__m"),
    )
    left, right = df.alias("__r"), emd.alias("__e")
    jc = None
    for c in quasi_cols:
        e = F.col(f"__r.{c}").eqNullSafe(F.col(f"__e.{c}"))
        jc = e if jc is None else (jc & e)
    return (
        left.join(F.broadcast(right), jc)
        .filter(
            F.lit(t_den) * F.col("__e.emd_abs")
            <= F.lit(t_num)
            * (F.col("__e.__m") - 1)
            * F.col("__e.__n_g")
            * F.col("__e.__N")
        )
        .select(
            "__r.*",
            F.col("__e.emd_abs").alias("emd_abs"),
            F.col("__e.__n_g").alias("t_group_n"),
        )
    )
