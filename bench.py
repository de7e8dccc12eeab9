#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized through the noop sink (full execution, no driver
collect). Every timing includes plan + execution, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bigdata_retailrocket_recsys_spark.session import get_spark
    from bigdata_retailrocket_recsys_spark.plans import QUERIES

    spark = get_spark("bdrr-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM: parquet footers + codegen/shuffle paths (a small
    # window+join+agg touches the same compiled-plan machinery the headline
    # queries use, so their timings measure the query, not first-run JIT)
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("r_regionkey").orderBy("n_nationkey")
            ),
        )
        .groupBy("r_regionkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    def timed(thunk, runs: int = 2) -> float:
        # best of N: GC/JIT noise at small SF can double a single run;
        # min-of-N measures the query, not the JVM's mood
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            thunk()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    headline = [n for n, q in sorted(QUERIES.items()) if q.headline]
    timings: dict[str, float] = {}
    for name in headline:
        q = QUERIES[name]
        timings[name] = timed(lambda: materialize(q.fn(spark, sf_dir)))

    # end-to-end reference-shaped pipeline (sessionize → candidates →
    # features) if available. NOTE: run_events_pipeline caches its interior
    # stages, so a second call would measure cache hits, not the pipeline —
    # clear the cache registry between runs.
    try:
        from bigdata_retailrocket_recsys_spark.pipelines.retailrocket import (
            run_events_pipeline,
        )

        def run_pipeline():
            spark.catalog.clearCache()
            materialize(run_events_pipeline(spark, sf_dir))

        # the pipeline is the longest, noisiest timing (GC pressure from the
        # W2V fit + caches) — a third run materially tightens the estimate
        timings["pipeline_e2e"] = timed(run_pipeline, runs=3)
    except ImportError:
        pass

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
