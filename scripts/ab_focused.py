#!/usr/bin/env python
"""Focused interleaved A/B: current working tree vs a git ref, named
queries only (bench.py's counterbalanced harness, but scoped so a single
query's delta can be adjudicated quickly on an idle box).

Usage: python scripts/ab_focused.py <ref> [--passes N] [--pipeline] name...
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def load_engine(root: str):
    for m in [k for k in list(sys.modules) if k.startswith("bigdata_retailrocket_recsys_spark")]:
        del sys.modules[m]
    sys.path.insert(0, root)
    try:
        from bigdata_retailrocket_recsys_spark.plans import QUERIES
        from bigdata_retailrocket_recsys_spark.pipelines.retailrocket import (
            run_events_pipeline,
        )
        return QUERIES, run_events_pipeline
    finally:
        sys.path.remove(root)


def main():
    ref = sys.argv[1]
    args = sys.argv[2:]
    passes = 3
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    with_pipeline = "--pipeline" in args
    names = [a for a in args if a != "--pipeline"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bigdata_retailrocket_recsys_spark.session import get_spark

    spark = get_spark("bdrr-ab-focused")
    spark.sparkContext.setLogLevel("ERROR")

    wt = tempfile.mkdtemp(prefix="bdrr_abf_")
    subprocess.run(
        ["git", "-C", REPO_ROOT, "worktree", "add", "--detach", "--force", wt, ref],
        capture_output=True, text=True, check=True,
    )
    try:
        best = {"cur": {}, "base": {}}

        def one_pass(side, root):
            queries, pipeline = load_engine(root)
            for name in names:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(queries[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best[side][name] = min(best[side].get(name, 9e9), dt)
            if with_pipeline:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                materialize(pipeline(spark, sf_dir))
                best[side]["pipeline_e2e"] = min(
                    best[side].get("pipeline_e2e", 9e9),
                    time.perf_counter() - t0,
                )

        order = []
        for i in range(passes):
            order += [("cur", REPO_ROOT), ("base", wt)] if i % 2 == 0 else [
                ("base", wt), ("cur", REPO_ROOT)
            ]
        for side, root in order:
            one_pass(side, root)

        out = {
            n: {
                "cur": round(best["cur"][n], 3),
                "base": round(best["base"][n], 3),
                "ratio": round(best["cur"][n] / best["base"][n], 3),
            }
            for n in best["cur"]
        }
        print(json.dumps(out, indent=1))
    finally:
        load_engine(REPO_ROOT)
        subprocess.run(
            ["git", "-C", REPO_ROOT, "worktree", "remove", "--force", wt],
            capture_output=True, text=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    main()
