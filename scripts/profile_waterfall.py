"""Per-stage wall-time breakdown of the 8-pass waterfall at bench scale.

Uses the same corpus + sides construction as bench.py and the
run_waterfall(metrics=...) counters to show where the seconds go —
per-pass build+checkpoint vs winners-count, side materialisation, prep
materialisation, broadcast measurement.  Run alone on the box (the
machine-speed caveats from bench.py apply)."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from address_matcher_spark.plans import pipeline as P
    from address_matcher_spark.session import get_spark

    spark = get_spark(app_name=f"amspark-profile-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = P.MatchConfig(run_field_passes=True)

    _, n_search, n_ref = bench._er_scale(sf_dir)
    corpus = bench._bench_corpus(n_search, n_ref)

    warm = bench._sides(spark, bench._bench_corpus(400, 500), cfg)
    bench.run_block_score(spark, warm, cfg)

    sides = bench._sides(spark, corpus, cfg)
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "2")))
    for rep in range(reps):
        metrics: dict = {}
        t0 = time.perf_counter()
        res = P.run_waterfall(sides["smin"], sides["sfull"],
                              sides["rmin"], sides["rfull"], cfg,
                              sides_materialized=True, metrics=metrics)
        matched = res.filter(F.col("full_match")).count()
        metrics["combine_and_count_sec"] = round(
            time.perf_counter() - t0 - metrics["waterfall_sec"], 3)
        metrics["end_to_end_sec"] = round(time.perf_counter() - t0, 3)
        metrics["matched_final"] = matched
        metrics["rep"] = rep
        print(json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
