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
- :func:`popularity_negative_samples` — deterministic popularity-
  proportional negative sampling for implicit-feedback recsys training
  (the reference's training matrix `prepare_training_data_pyspark.py:
  441-626` carries positives only; every ranking-loss trainer downstream
  needs negatives). Hash-derived draws, so the sample is reproducible
  across runs/engines/partitionings — no RNG state, no seed plumbing.
- :func:`pack_sequences` — GPT-style pretraining sequence packing:
  concatenate documents in a deterministic order and cut the token
  stream into fixed-length training sequences, documents spanning
  boundaries. Expressed RELATIONALLY (cumulative sums + interval
  arithmetic), not as a stateful loop — so it scales shard-parallel and
  is exactly reproducible in any engine.

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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdata_retailrocket_recsys_spark.operators.splits import _SEP, kfold_assign


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


def popularity_negative_samples(
    positives: DataFrame,
    *,
    user_col: str,
    item_col: str,
    k: int = 4,
    weights: DataFrame | None = None,
    j_col: str = "j",
    neg_col: str = "neg_item",
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic popularity-proportional negative sampling.

    For each positive ``(user, item)`` pair and draw index ``j`` in
    ``0..k-1``, draw a candidate item with probability proportional to its
    popularity weight, then drop candidates the user actually interacted
    with (strict negatives — includes the self-collision case). Output:
    ``user_col, item_col, j_col, neg_col`` — so a positive yields AT MOST
    ``k`` negatives (dense users lose more draws; that is the standard
    semantics, not a bug).

    Draw mechanics (cross-engine reproducible, no RNG): ``target =
    first-32-md5-bits(user ⟂ item ⟂ j) mod total_weight``; items own
    contiguous ``[lo, lo+w)`` intervals of the cumulative-weight line
    (ordered by item id — any deterministic total order works, it only
    fixes WHICH item maps to which hash values); the draw picks the
    interval containing ``target``.

    Plan shape at scale: the interval lookup is NOT a nested-loop range
    join — intervals are exploded into fixed-width buckets (integer
    ``div``) and the draw joins its single bucket equi-wise with a
    residual ``lo <= target < hi``, then the exploded catalog (items ×
    ~2 rows) is broadcast, so the fact-sized draw stream never shuffles
    for the lookup. The only fact shuffles are the ``distinct`` on
    positives and the map-side-combined popularity count; the final
    not-interacted filter is a left-anti join back to the (distinct)
    positive set. One 2-scalar driver action (total weight + item count)
    sizes the buckets — same precedent as KMeans ``clusterCenters()``.
    The cumulative-weight line is SHARDED: the catalog is range-
    partitioned on ``item_col`` into ``n_shards`` order-contiguous
    shards, the prefix sum runs per shard (partitioned window), and a
    tiny ``n_shards``-row offset table (itself a bounded-size window)
    is broadcast back — so a billion-item catalog never funnels through
    one reducer. Because shards are contiguous in item order, each
    item's ``[lo, hi)`` interval is the GLOBAL prefix sum exactly, so
    the output is bit-identical for any ``n_shards`` (locked in a
    test).

    ``weights``: optional ``(item_col, weight)`` DataFrame (positive
    bigint weights, one row per item). Default: interaction counts from
    ``positives`` itself. Items present only in ``weights`` can be drawn;
    items absent from it can never be drawn.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # NULL user/item positives are discarded UP FRONT: they are not valid
    # training pairs, and they must not influence the popularity weights
    # either. (Also removes a cross-engine trap: Spark's concat_ws SKIPS
    # nulls while SQL `||` nullifies, so a NULL-keyed draw would silently
    # survive here and vanish in a SQL twin — caught by the advdata sweep.)
    pos = (
        positives.select(user_col, item_col)
        .filter(F.col(user_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    if weights is None:
        w = pos.groupBy(item_col).agg(F.count(F.lit(1)).alias("__w"))
    else:
        w = weights.filter(F.col(item_col).isNotNull()).select(
            F.col(item_col), F.col([c for c in weights.columns if c != item_col][0]).cast("bigint").alias("__w")
        )
    total, n_items = w.agg(
        F.sum("__w").cast("bigint"), F.count(F.lit(1))
    ).first()
    if not total:
        raise ValueError("empty or zero-weight item catalog")
    bucket_w = max(1, total // (2 * n_items))
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # Sharded cumulative-weight line: range-partition the catalog on
    # item_col (shards are CONTIGUOUS in item order), prefix-sum per shard,
    # then add each shard's offset (= total weight of all preceding
    # shards). The offset table is n_shards rows — its own cumsum window is
    # bounded-size by construction, and it broadcasts. The per-item [lo,hi)
    # intervals equal the global prefix sums for ANY n_shards.
    part = w.repartitionByRange(n_shards, F.col(item_col)).withColumn(
        "__shard", F.spark_partition_id()
    )
    local_win = (
        Window.partitionBy("__shard")
        .orderBy(item_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        part.groupBy("__shard")
        .agg(F.sum("__w").cast("bigint").alias("__stot"))
        .select(
            "__shard",
            F.coalesce(
                F.sum("__stot").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("__off"),
        )
    )
    cum = (
        part.withColumn(
            "__loc_lo",
            F.coalesce(F.sum("__w").over(local_win), F.lit(0)).cast("bigint"),
        )
        .join(F.broadcast(offsets), "__shard")
        .select(
            F.col(item_col).alias("__neg_candidate"),
            (F.col("__loc_lo") + F.col("__off")).alias("__lo"),
            F.col("__w").cast("bigint"),
        )
        .withColumn("__hi", F.col("__lo") + F.col("__w"))
    )
    catalog = cum.select(
        "__neg_candidate",
        "__lo",
        "__hi",
        F.explode(
            F.sequence(
                F.expr(f"__lo div {bucket_w}"),
                F.expr(f"(__hi - 1) div {bucket_w}"),
            )
        ).alias("__b"),
    )
    draws = pos.select(
        user_col,
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias(j_col),
    ).withColumn(
        "__target",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            _SEP,
                            F.col(user_col).cast("string"),
                            F.col(item_col).cast("string"),
                            F.col(j_col).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(total),
        ),
    ).withColumn("__b", F.expr(f"__target div {bucket_w}"))
    matched = draws.join(
        F.broadcast(catalog),
        (draws["__b"] == catalog["__b"])
        & (F.col("__target") >= F.col("__lo"))
        & (F.col("__target") < F.col("__hi")),
        "inner",
    )
    interacted = pos.select(
        F.col(user_col), F.col(item_col).alias("__neg_candidate")
    )
    return (
        matched.select(user_col, item_col, j_col, "__neg_candidate")
        .join(interacted, [user_col, "__neg_candidate"], "left_anti")
        .withColumnRenamed("__neg_candidate", neg_col)
        .select(user_col, item_col, j_col, neg_col)
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    n_shards: int | None = 32,
) -> DataFrame:
    """GPT-style pretraining sequence packing as a relational plan.

    Documents are laid end-to-end on a token line in deterministic order
    (ascending ``id_col``) and the line is cut every ``seq_len`` tokens;
    a document crossing a cut contributes one segment to each sequence it
    touches (concat-then-chunk packing — zero padding waste except the
    final sequence). Output, one row per (document × sequence) segment::

        shard, seq_id, <id_col>, doc_offset, seq_offset, seg_len

    where ``doc_offset`` is the segment's start within the document and
    ``seq_offset`` its start within the sequence; per sequence the
    segments tile [0, seq_len) exactly (the shard's last sequence may be
    short), and per document they tile [0, n_tokens) — both locked in
    tests.

    The sequential-looking "running total" is ONE window cumulative sum;
    the doc→sequences fan-out is interval arithmetic (integer ``div``)
    exploded per touched sequence — no loop, no UDF, no driver state.
    Documents are first bucketed by a content hash (md5, engine-stable)
    into ``n_shards`` shards (default 32) and packing runs per shard:
    each shard is an independent token line, so the window sort
    parallelizes across shards — the 100 TB form (one global sort would
    serialize). ``n_shards=None`` is an EXPLICIT opt-in to a single
    global token line (single-reducer sort — calibration/small-corpus
    tier only; same opt-in precedent as ``max_block_rows=None`` in
    ``embedding_cosine_pairs``). Docs with NULL or non-positive token
    counts are dropped (nothing to pack).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    d = df.filter(
        F.col(n_tokens_col).isNotNull() & (F.col(n_tokens_col) > 0)
    ).select(
        F.col(id_col),
        F.col(n_tokens_col).cast("bigint").alias("__nt"),
    )
    if n_shards is not None:
        shard = F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
            ).cast("bigint"),
            F.lit(n_shards),
        ).cast("int")
    else:
        shard = F.lit(0)
    d = d.withColumn("__shard", shard)
    w = (
        Window.partitionBy("__shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "__start", F.coalesce(F.sum("__nt").over(w), F.lit(0)).cast("bigint")
    ).withColumn("__end", F.col("__start") + F.col("__nt"))
    seg = c.select(
        "__shard",
        id_col,
        "__start",
        "__end",
        F.explode(
            F.sequence(
                F.expr(f"__start div {seq_len}"),
                F.expr(f"(__end - 1) div {seq_len}"),
            )
        ).alias("__seq"),
    )
    seq_base = F.col("__seq") * seq_len
    seg_from = F.greatest(F.col("__start"), seq_base)
    seg_to = F.least(F.col("__end"), seq_base + seq_len)
    return seg.select(
        F.col("__shard").alias("shard"),
        F.col("__seq").alias("seq_id"),
        F.col(id_col),
        (seg_from - F.col("__start")).alias("doc_offset"),
        (seg_from - seq_base).alias("seq_offset"),
        (seg_to - seg_from).alias("seg_len"),
    )


#: shared Spark/DuckDB tree (the LM_CONTRIB_SQL discipline): µ-floored
#: log-likelihood ratio of one hashed-feature bucket under the TARGET
#: vs the RAW distribution, both add-one smoothed over {b} buckets.
DSIR_CONTRIB_SQL = (
    "CAST(FLOOR(ln("
    " ((CAST({ct} AS DOUBLE) + 1.0) / (CAST({nt} AS DOUBLE) + {b}.0))"
    " / ((CAST({cr} AS DOUBLE) + 1.0) / (CAST({nr} AS DOUBLE) + {b}.0))"
    ") * 1e6) AS BIGINT)"
)


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    shingle_n: int = 2,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per raw document, the
    log-likelihood ratio of its hashed n-gram features under the TARGET
    distribution vs the RAW distribution — the published
    importance-resampling estimator for "pick web data that looks like
    the target domain". Select by weight (top share / resample) with the
    existing samplers; this op computes the weights.

    Features are the paper's hashed n-grams: word ``shingle_n``-grams →
    :func:`feature_hash_index` buckets (md5-derived, exact on any
    engine). Both bucket distributions are add-one smoothed over
    ``n_buckets``; per-bucket contributions are µ-floored bigints
    (``DSIR_CONTRIB_SQL`` — one tree shared with the DuckDB oracle)
    scaled by in-doc occurrence and summed exactly; the final average is
    ONE IEEE division, so even the double is value-hashable.

    Scale shape: two (bucket, count) tables (≤ ``n_buckets`` rows each —
    broadcastable by construction) + their 1-row totals; the raw corpus
    reduces to (doc, bucket, count) map-side-combinable counts. Raw docs
    with no features (NULL/whitespace text) are absent.

    Output: (id, n_feats, weight_u [µ-floored LLR sum, bigint],
    importance [avg LLR, double]).
    """
    from bigdata_retailrocket_recsys_spark.operators.dedup import (
        shingle_rows,
    )

    def _buckets(df: DataFrame) -> DataFrame:
        rows = shingle_rows(
            df.filter(
                F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
            ),
            id_col=id_col,
            text_col=text_col,
            n=shingle_n,
            distinct=False,
        )
        return rows.select(
            "doc",
            feature_hash_index("shingle", n_buckets=n_buckets)
            .cast("bigint")
            .alias("b"),
        )
    rawf = _buckets(raw)
    tgtf = _buckets(target)
    # bucket tables are bounded by n_buckets (≤10k rows at the default —
    # NOT corpus-sized; cached: each feeds its totals aggregate AND the
    # scoring join, S7). The caches outlive the call on purpose: they
    # back the returned LAZY frame — unpersisting here would recompute
    # both at the caller's action; bounded size makes that safe
    # (ADVICE r9 #1 cache-lifetime audit).
    rc = rawf.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_r")
    ).cache()
    tc = tgtf.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_t")
    ).cache()
    tot = rc.agg(
        F.coalesce(F.sum("c_r"), F.lit(0)).cast("bigint").alias("n_r")
    ).crossJoin(
        tc.agg(
            F.coalesce(F.sum("c_t"), F.lit(0)).cast("bigint").alias("n_t")
        )
    )
    db = rawf.groupBy("doc", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_db")
    )
    contrib = F.col("c_db") * F.expr(
        DSIR_CONTRIB_SQL.format(
            ct="COALESCE(c_t, CAST(0 AS BIGINT))",
            cr="COALESCE(c_r, CAST(0 AS BIGINT))",
            nt="n_t",
            nr="n_r",
            b=n_buckets,
        )
    )
    return (
        db.join(F.broadcast(rc), "b", "left")
        .join(F.broadcast(tc), "b", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc")
        .agg(
            F.sum("c_db").cast("bigint").alias("n_feats"),
            F.sum(contrib).cast("bigint").alias("weight_u"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_feats",
            "weight_u",
            (
                F.col("weight_u").cast("double")
                / (F.col("n_feats").cast("double") * F.lit(1e6))
            ).alias("importance"),
        )
    )
