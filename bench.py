#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are materialized through the noop sink (full execution, no driver
collect). Every timing includes plan + execution, not session startup.

Self-defending against machine drift (VERDICT r3 #3): after the absolute
timings, the harness checks out the latest ``r*`` git tag (previous round's
final commit) into a temp worktree and runs counterbalanced interleaved
passes — current, baseline, baseline, current — of the same headline set
IN THE SAME Spark session, swapping which package tree is imported. The
resulting ``ab_ratio_vs_<tag>`` (current/baseline wall time, ~1.0 = no code
regression) is emitted alongside the absolute numbers, so a ±25 % absolute
drift like r2→r3 is adjudicated by the artifact itself, not forensics.
Disable with SPARK_GRAFT_AB=0; override the ref with
SPARK_GRAFT_BASELINE_REF.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _load_engine(root: str):
    """(Re)import the engine from ``root``, purging any prior import, so one
    Python/JVM process can alternate between two checkouts of the package."""
    for m in [k for k in list(sys.modules) if k.startswith("bigdata_retailrocket_recsys_spark")]:
        del sys.modules[m]
    sys.path.insert(0, root)
    try:
        from bigdata_retailrocket_recsys_spark.plans import QUERIES
        try:
            from bigdata_retailrocket_recsys_spark.pipelines.retailrocket import (
                run_events_pipeline,
            )
        except ImportError:
            run_events_pipeline = None
        return QUERIES, run_events_pipeline
    finally:
        sys.path.remove(root)


def _latest_round_tag() -> str | None:
    try:
        out = subprocess.run(
            ["git", "-C", REPO_ROOT, "tag", "--list", "r*"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        tags = sorted(
            (t for t in out if t[1:].isdigit()), key=lambda t: int(t[1:])
        )
        return tags[-1] if tags else None
    except Exception:
        return None


def _ab_compare(spark, sf_dir: str, ref: str) -> tuple[float, dict] | None:
    """Interleaved A/B: min-of-2 counterbalanced passes (cur, base, base,
    cur) over headline queries + pipeline, both sides in this one session.
    Returns (current/baseline total ratio, {query: per-query ratio}) —
    per-query ratios surface a single-query plan regression that the
    total can hide (VERDICT r4 #5) — or None if the ref can't be checked
    out."""
    wt = tempfile.mkdtemp(prefix="bdrr_ab_")
    try:
        subprocess.run(
            ["git", "-C", REPO_ROOT, "worktree", "add", "--detach", "--force", wt, ref],
            capture_output=True, text=True, check=True,
        )
    except subprocess.CalledProcessError as e:
        print(f"# ab: worktree add failed: {e.stderr.strip()[:200]}", file=sys.stderr)
        shutil.rmtree(wt, ignore_errors=True)
        return None
    try:
        best: dict[str, dict[str, float]] = {"cur": {}, "base": {}}

        def one_pass(side: str, root: str) -> None:
            queries, pipeline = _load_engine(root)
            names = [n for n, q in sorted(queries.items()) if q.headline]
            for name in names:
                t0 = time.perf_counter()
                materialize(queries[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best[side][name] = min(best[side].get(name, float("inf")), dt)
            if pipeline is not None:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(pipeline(spark, sf_dir))
                dt = time.perf_counter() - t0
                best[side]["pipeline_e2e"] = min(
                    best[side].get("pipeline_e2e", float("inf")), dt
                )

        for side, root in (("cur", REPO_ROOT), ("base", wt), ("base", wt), ("cur", REPO_ROOT)):
            one_pass(side, root)

        common = sorted(set(best["cur"]) & set(best["base"]))
        if not common:
            return None
        cur_total = sum(best["cur"][n] for n in common)
        base_total = sum(best["base"][n] for n in common)
        if base_total <= 0:
            return None
        per_query = {
            n: round(best["cur"][n] / best["base"][n], 3)
            for n in common
            if best["base"][n] > 0
        }
        return round(cur_total / base_total, 3), per_query
    finally:
        # restore the working-tree import for any later use of this process
        _load_engine(REPO_ROOT)
        subprocess.run(
            ["git", "-C", REPO_ROOT, "worktree", "remove", "--force", wt],
            capture_output=True, text=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


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
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
    }

    if os.environ.get("SPARK_GRAFT_AB", "1") != "0":
        ref = os.environ.get("SPARK_GRAFT_BASELINE_REF") or _latest_round_tag()
        if ref:
            ab = _ab_compare(spark, sf_dir, ref)
            if ab is not None:
                ratio, per_query = ab
                payload[f"ab_ratio_vs_{ref}"] = ratio
                payload[f"ab_per_query_vs_{ref}"] = per_query

    print(json.dumps(payload))


if __name__ == "__main__":
    main()
