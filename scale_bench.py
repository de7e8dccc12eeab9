#!/usr/bin/env python
"""Reference-volume throughput benchmark.

The reference publishes one end-to-end number: 1,902,445 events -> feature
matrix in 444.13 s on local[*] (BASELINE.md). This script runs OUR full
pipeline (sessionize -> 5-strategy candidates -> star-schema features ->
MLlib Word2Vec embeddings) at the same event volume by replicating the
driver testdata events table with shifted user ids (preserves per-user
event counts and session structure; adds no synthetic tables to the
declared query surface, which only ever reads /root/testdata directly).

Prints one JSON line: {"metric": "pipeline_events_per_sec", ...}.

Target volume via SPARK_GRAFT_TARGET_EVENTS (default 1.9M = reference
parity; 10M verified: 224 s / 44.6k events/s on local[32]). Driver heap
via SPARK_GRAFT_DRIVER_MEM.

Replication is a CONSTANT-WIDTH plan: explode(sequence(0, copies-1))
fans every base row out to `copies` shifted-user copies inside the
executors — same result as a copies-wide unionByName of shifted copies
(identical per-user event counts and session structure), but the plan
size never grows with the target volume. The old unionByName form hit a
hard planning/codegen cliff at ~500 copies (50M events): >20 min of
94%-system-CPU plan processing before the first task finished (measured
r4); the explode form planned and ran the same volume immediately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target_events = int(os.environ.get("SPARK_GRAFT_TARGET_EVENTS", 1_900_000))

    from pyspark.sql import functions as F

    from bigdata_retailrocket_recsys_spark.pipelines import retailrocket as rr
    from bigdata_retailrocket_recsys_spark.session import get_spark
    from bigdata_retailrocket_recsys_spark.sources.readers import load_table

    spark = get_spark(
        "bdrr-scale-bench",
        # ≥50M events saturate an 8g single-JVM heap (r9 measured: 8g =
        # executor task OOM at ~19 min); 16g completes — see the
        # broadcast note below for the second failure mode at 16g.
        driver_memory=os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM",
            "16g" if target_events >= 50_000_000 else "8g",
        ),
        # 32 partitions is right for sf0.1 (see session.py note) but at
        # >=100M events one partition's sort working set reaches GBs; scale
        # partition count with volume so spills are many-small not few-huge
        # (AQE coalesces the small-stage excess back down).
        shuffle_partitions=max(32, target_events // 500_000),
        extra_conf={
            # Spill-bound at >=100M events on one box: the covis/feature
            # shuffles exceed local-disk capacity under lz4 (measured r5:
            # 100M died SPILL_OUT_OF_MEMORY / no-space on an ~80 GB /tmp).
            # zstd shrinks shuffle+spill bytes ~2x for ~equal CPU here —
            # the standard config for spill-bound jobs; override with
            # SPARK_GRAFT_IO_CODEC=lz4 to A/B.
            "spark.io.compression.codec": os.environ.get(
                "SPARK_GRAFT_IO_CODEC", "zstd"
            ),
            # ≥50M events in ONE 32-thread JVM: a runtime-estimated
            # AUTO-broadcast dies with "Not enough memory to build and
            # broadcast the table" — the unified pool is saturated by 32
            # concurrent sort tasks sharing the same heap (r9 measured:
            # 16g + defaults fails at ~19 min; 16g + threshold=-1
            # COMPLETES in 1269 s = 78.8k ev/s, the fastest 100M run
            # yet). Real clusters isolate executor heaps from the
            # driver's broadcast build; single-JVM local mode shares
            # everything, so auto/AQE broadcast conversion is disabled
            # once volume contends the pool. Explicit F.broadcast hints
            # (item_cat, cat_pop, top_pop, emb — all item/category-grain,
            # volume-independent) are unaffected by the threshold.
            **(
                {
                    "spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
                }
                if target_events >= 50_000_000
                else {}
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "events")
    per_copy = base.count()
    copies = max(1, target_events // per_copy)
    # the 100k-row base scan is 1-2 parquet splits — repartition the SMALL
    # side first so the explode fans out with full-width parallelism.
    base = base.repartition(spark.sparkContext.defaultParallelism)
    if os.environ.get("SPARK_GRAFT_REPL_MODE", "explode") == "union":
        # legacy copies-wide plan — planning cost grows with `copies`
        # (cliff measured at ~500); kept for A/B only
        rep = None
        for i in range(copies):
            shifted = base.withColumn(
                "user_id", F.col("user_id") + F.lit(i * 10_000_000)
            )
            rep = shifted if rep is None else rep.unionByName(shifted)
    else:
        rep = (
            base.select(
                "*",
                F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__copy"),
            )
            .withColumn(
                "user_id",
                F.col("user_id")
                + F.col("__copy").cast("bigint") * F.lit(10_000_000),
            )
            .drop("__copy")
        )
    n_events = per_copy * copies

    cfg = rr.PipelineConfig()
    raw = rep.select(
        "user_id",
        "ts",
        F.get_json_object("props", "$.k").cast("bigint").alias("item_id"),
        F.when(F.col("event_type") == "purchase", "addtocart")
        .otherwise(F.col("event_type"))
        .alias("event"),
    )

    t0 = time.perf_counter()
    events_sess = rr.sessionize_events(raw, cfg)
    # cached (r14): 2 consumers (events_cat join + both splits'
    # candidate dim via item_cat_dim=) — uncached, each re-scanned and
    # re-parsed the replicated JSON
    item_cat = (
        raw.select("item_id")
        .distinct()
        .select("item_id", (F.col("item_id") % 20).alias("category_id"))
        .cache()
    )
    # `event` rides in the cache (r14, the run_events_pipeline move): the
    # per-split anchor extraction reads the cache instead of re-running
    # the full sessionize window — at 10M events that was two extra
    # fact-sized window shuffles per run (one per split)
    events_cat = (
        events_sess.join(F.broadcast(item_cat), "item_id", "inner")
        .select(
            "session_id", "user_id", "ts", "item_id", "category_id", "event"
        )
        .cache()
    )
    # BOTH matrices, like the reference's 444 s run (py:629-630): train
    # anchors before the cutoff, valid anchors after — valid features
    # still use only ≤cutoff history (leak rule, SURVEY §4.4)
    cutoff, end = "2024-01-21", "2024-02-01"

    def build_split(a_start: str, a_end: str):
        anchors = (
            events_cat.filter(F.col("event") == "addtocart")
            .filter(
                (F.col("ts") >= F.lit(a_start).cast("timestamp"))
                & (F.col("ts") < F.lit(a_end).cast("timestamp"))
            )
            .select(
                "session_id",
                "user_id",
                F.col("ts").alias("atc_ts"),
                "item_id",
                "category_id",
            )
            .cache()
        )
        prefix = rr.prefix_events(anchors, events_cat).cache()
        cands = rr.build_candidates(
            anchors, events_cat, cfg, prefix=prefix, item_cat_dim=item_cat
        ).cache()
        feats = rr.build_features(
            anchors, cands, events_cat, train_cutoff=cutoff, cfg=cfg,
            prefix=prefix,
        )
        return feats, cands

    feats_train, cands_train = build_split("2024-01-01", cutoff)
    feats_valid, cands_valid = build_split(cutoff, end)
    # overlap the W2V fit with candidate materialization (r14, the
    # run_events_pipeline move): populate the shared events_cat cache
    # once, then the fit's small serial jobs run while both splits'
    # candidate shuffles back-fill the idle cores
    events_cat.write.format("noop").mode("overwrite").save()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        fit = pool.submit(
            rr.train_category_embeddings,
            events_cat.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")),
            cfg,
        )
        cands_train.write.format("noop").mode("overwrite").save()
        cands_valid.write.format("noop").mode("overwrite").save()
        emb = fit.result()
    out = rr.attach_embeddings(
        feats_train.unionByName(feats_valid), emb, cfg
    )
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "pipeline_events_per_sec",
                "value": round(n_events / wall, 1),
                "unit": "events/sec",
                "wall_sec": round(wall, 1),
                "n_events": n_events,
                "reference_baseline": {
                    "events": 1_902_445,
                    "wall_sec": 444.13,
                    "events_per_sec": 4284,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
