"""Benchmark harness: headline ER waterfall + representative operator
queries; prints ONE JSON line.

  SPARK_GRAFT_SF_DIR   parquet dir for operator queries (default sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_SEARCH / _REF   override ER bench corpus size

The headline metric is candidate-pairs/sec through the full fuzzy
waterfall (block join → token_set_ratio UDF → verify → select), on the
deterministic synthetic corpus with the FIXTURES.md §7 skew profile (one
block ≈ 25% of rows + Zipf tail), sized from the sf dir's lineitem count.
Candidate pairs are counted at the block-join output (what the scoring UDF
actually consumes).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _er_scale(sf_dir: str):
    import duckdb

    n_li = duckdb.connect().execute(
        f"select count(*) from '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    sf = n_li / 6_000_000  # TPC-H lineitem ≈ 6M rows at SF1
    n_search = int(os.environ.get("SPARK_GRAFT_BENCH_SEARCH", 0)) or max(
        1500, int(sf * 60_000)
    )
    n_ref = int(os.environ.get("SPARK_GRAFT_BENCH_REF", 0)) or int(n_search * 1.25)
    return sf, n_search, n_ref


def _bench_corpus(sf: float, n_search: int, n_ref: int) -> str:
    """Generate (or reuse) the deterministic bench corpus on local disk."""
    from address_matcher_spark import datagen

    cache = f"/tmp/amspark_bench_{n_search}_{n_ref}"
    marker = os.path.join(cache, "_done")
    if not os.path.exists(marker):
        datagen.write_fixtures(
            cache,
            datagen.Scale(
                n_ref=n_ref, n_search=n_search,
                n_postcodes=max(120, n_search // 40),
            ),
        )
        open(marker, "w").close()
    return cache


def run_er_waterfall(spark, corpus_dir: str, cfg=None):
    """Returns (candidate_pairs, matched, wall_seconds)."""
    from pyspark.sql import functions as F

    from address_matcher_spark.operators import blocking
    from address_matcher_spark.plans import pipeline as P

    cfg = cfg or P.MatchConfig(run_field_passes=False)
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    ref_raw = spark.read.parquet(f"{corpus_dir}/reference_addresses.parquet")

    t0 = time.perf_counter()
    search = P.prepare_search(P.search_from_pages(pages), cfg)
    ref = P.prepare_reference(ref_raw)
    sides = {
        "smin": P.standardise_search(search, False),
        "sfull": P.standardise_search(search, True),
        "rmin": P.standardise_reference(ref, False),
        "rfull": P.standardise_reference(ref, True),
    }
    res = P.run_waterfall(sides["smin"], sides["sfull"],
                          sides["rmin"], sides["rfull"], cfg)
    matched = res.filter(F.col("full_match")).count()
    wall = time.perf_counter() - t0

    # candidate-pair volume of the dominant first pass (block-join output —
    # what the scoring UDF consumes); counted outside the timed window
    s1 = sides["smin"].filter(F.col("postcode_search") != "")
    r1 = sides["rmin"].filter(F.col("postcode_search") != "")
    pairs = blocking.block_join(
        s1.select("record_id", F.col("postcode_search").alias("bk")),
        r1.select("ref_id", F.col("postcode_search").alias("bk")),
        "bk", salt=1,
    ).count()
    return pairs, matched, wall


OPERATOR_QUERIES = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "window_best_order_per_customer",
    "er_block_pair_counts",
    "er_levenshtein_best",
    "er_connected_components",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "text_stats",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from address_matcher_spark.plans.driver_queries import QUERIES
    from address_matcher_spark.session import get_spark

    spark = get_spark(app_name=f"amspark-bench-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sf, n_search, n_ref = _er_scale(sf_dir)
    corpus = _bench_corpus(sf, n_search, n_ref)

    # warm the JVM/Python-worker pools once (tiny run, excluded from timing)
    run_er_waterfall(spark, _bench_corpus(0.0001, 400, 500))

    pairs, matched, wall = run_er_waterfall(spark, corpus)
    pairs_per_sec = pairs / wall if wall > 0 else 0.0

    queries: dict[str, float] = {"er_waterfall": round(wall, 3)}
    for name in OPERATOR_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "candidate_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "sec",
        "queries": queries,
        "sf": round(sf, 4),
        "cpus": cpus,
        "er_candidate_pairs": pairs,
        "er_matched": matched,
        "er_search_rows": n_search,
        "er_ref_rows": n_ref,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
