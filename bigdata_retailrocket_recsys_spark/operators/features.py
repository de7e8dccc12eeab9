"""Feature engineering for training-data pipelines (north-star extension).

Two staples the reference's feature-assembly stage
(prepare_training_data_pyspark.py:441-626) hand-rolls per column, offered
here as engine-portable, leakage-aware operators:

- :func:`feature_hash_index` — the hashing trick: map an unbounded
  categorical to a fixed index space without a fitted vocabulary (no
  StringIndexer state to ship, no OOV problem). Content-defined (md5), so
  indices are stable across runs, engines, partitionings, and corpus
  growth — a model trained last month agrees with features computed today.
- :func:`target_encode_oof` — out-of-fold target encoding: each row gets
  the mean target of its category computed EXCLUDING the row's own fold,
  the standard leakage-safe form (in-fold means leak the row's own label
  into its feature; naive whole-data means leak every row's).

Scale shape: feature hashing is a narrow JVM expression (no shuffle, no
fitted state). Target encoding aggregates to a (category × fold) table —
tiny relative to the fact table — and broadcast-joins it back, so the
fact rows NEVER shuffle; the only exchange is the map-side-combined
partial aggregate.

Cross-engine determinism: fold ids and hash indices come from md5 hex
(string compare / exact 32-bit hex→int, both available in any dialect);
target sums are integer (CAST BIGINT per the catalog type rules) and the
encoding itself is ONE identical IEEE division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_retailrocket_recsys_spark.operators.splits import kfold_assign


def feature_hash_index(
    col: Column | str,
    *,
    n_buckets: int,
    salt: str = "",
) -> Column:
    """Hashing-trick index 0..n_buckets-1 for a categorical value.

    index = int(md5(salt ++ value)[:8], 16) % n_buckets — the first 32
    hash bits, exact in any engine that can parse 8 hex chars (Spark:
    ``conv(h,16,10)``; DuckDB: ``('0x'||h)::BIGINT``). NULL in → NULL out
    (a NULL category is missing data, not bucket 0). ``salt`` decorrelates
    multiple hashed features drawn from the same column.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return F.when(
        c.isNotNull(),
        F.pmod(F.conv(h, 16, 10).cast("bigint"), F.lit(n_buckets)).cast("int"),
    )


def target_encode_oof(
    df: DataFrame,
    *,
    cat_col: str,
    target_col: str,
    key_cols: list[str],
    k: int = 5,
    out_col: str = "te",
    fold_col: str = "fold",
) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding.

    Every row is deterministically assigned a fold (:func:`kfold_assign`
    over ``key_cols``); its encoding is the mean target of its category
    over the OTHER k-1 folds. A category seen only inside the row's own
    fold falls back to the global out-of-fold mean (never the in-fold
    one — that would leak). Output: input columns + ``fold_col`` +
    ``out_col`` (double; NULL only if the row's fold is the entire
    dataset).

    Plan: one map-side-combined aggregate to the (category, fold) stats
    table, category and global totals derived from it by re-aggregation
    (no second pass over the facts), broadcast-joined back — the fact
    table never shuffles. OOF mean = (tot_sum − fold_sum)/(tot_cnt −
    fold_cnt): exact BIGINT sums, one IEEE division, cross-engine
    bit-stable.
    """
    folds = kfold_assign(df, key_cols=key_cols, k=k, fold_col=fold_col)
    t = F.col(target_col).cast("bigint")
    stats = folds.groupBy(cat_col, fold_col).agg(
        F.sum(t).alias("__fs"), F.count(t).alias("__fc")
    )
    cat_tot = stats.groupBy(cat_col).agg(
        F.sum("__fs").alias("__cs"), F.sum("__fc").alias("__cc")
    )
    glob_fold = stats.groupBy(fold_col).agg(
        F.sum("__fs").alias("__gfs"), F.sum("__fc").alias("__gfc")
    )
    glob = stats.agg(
        F.sum("__fs").alias("__gs"), F.sum("__fc").alias("__gc")
    )
    joined = (
        folds.join(F.broadcast(stats), [cat_col, fold_col], "left")
        .join(F.broadcast(cat_tot), [cat_col], "left")
        .join(F.broadcast(glob_fold), [fold_col], "left")
        .crossJoin(F.broadcast(glob))
    )
    # rows whose category is NULL have no (cat, fold) stats row — they take
    # the global fallback like a fold-only category does
    fs = F.coalesce(F.col("__fs"), F.lit(0)).cast("bigint")
    fc = F.coalesce(F.col("__fc"), F.lit(0)).cast("bigint")
    cs = F.coalesce(F.col("__cs"), F.lit(0)).cast("bigint")
    cc = F.coalesce(F.col("__cc"), F.lit(0)).cast("bigint")
    oof_cnt = cc - fc
    oof = (cs - fs).cast("double") / oof_cnt.cast("double")
    g_oof_cnt = F.col("__gc") - F.col("__gfc")
    g_oof = (F.col("__gs") - F.col("__gfs")).cast("double") / g_oof_cnt.cast(
        "double"
    )
    te = F.when(oof_cnt > 0, oof).otherwise(
        F.when(g_oof_cnt > 0, g_oof)
    )
    return joined.withColumn(out_col, te).drop(
        "__fs", "__fc", "__cs", "__cc", "__gfs", "__gfc", "__gs", "__gc"
    )
