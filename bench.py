"""Benchmark harness: headline ER metrics + representative operator
queries; prints ONE JSON line.

  SPARK_GRAFT_SF_DIR   parquet dir for operator queries (default sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  SPARK_GRAFT_BENCH_SEARCH / _REF   override ER bench corpus size
  SPARK_GRAFT_HEADLINE_ONLY=1   time ONLY the block-score stage (the
      candidate_pairs_per_sec numerator) — the scaling-run mode for
      long-stage corpora where a full leg would take an hour

Metrics (per BASELINE.md §C):
  * candidate_pairs_per_sec — the block-join + cross-score + shortlist
    stage (BASELINE.md's "candidate-pairs/sec (block join + score)"):
    candidate pairs = Σ over blocks of search_rows × ref_rows, i.e. what
    the scoring kernel actually compares.
  * er_waterfall_sec — the full 4-pass waterfall end-to-end (standardise →
    4 × block/score/verify/select → combine), reported under queries.

The corpus is the deterministic synthetic generator with the FIXTURES.md
§7 skew profile (one block ≈ 25% of rows + Zipf tail), sized from the sf
dir's lineitem count.
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
        1500, int(sf * 200_000)
    )
    n_ref = int(os.environ.get("SPARK_GRAFT_BENCH_REF", 0)) or int(n_search * 1.25)
    return sf, n_search, n_ref


def _bench_corpus(n_search: int, n_ref: int) -> str:
    import hashlib

    from address_matcher_spark import datagen

    # cache key includes a datagen content hash so edits to the generator
    # invalidate stale fixtures instead of silently reusing them
    with open(datagen.__file__, "rb") as fh:
        gen_hash = hashlib.sha256(fh.read()).hexdigest()[:10]
    cache = f"/tmp/amspark_bench_{n_search}_{n_ref}_{gen_hash}"
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


def _sides(spark, corpus_dir: str, cfg):
    from address_matcher_spark.plans import pipeline as P

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    ref_raw = spark.read.parquet(f"{corpus_dir}/reference_addresses.parquet")
    search = P.prepare_search(P.search_from_pages(pages), cfg)
    ref = P.prepare_reference(ref_raw)
    return {
        "smin": P.standardise_search(search, False).localCheckpoint(),
        "sfull": P.standardise_search(search, True).localCheckpoint(),
        "rmin": P.standardise_reference(ref, False).localCheckpoint(),
        "rfull": P.standardise_reference(ref, True).localCheckpoint(),
    }


def count_candidate_pairs(sides) -> int:
    """Σ over postcode blocks of search_rows × ref_rows (what the scoring
    kernel compares; computed outside any timed window)."""
    from pyspark.sql import functions as F

    s = sides["smin"].filter(F.col("postcode_search") != "")
    r = (
        sides["rmin"].filter(F.col("postcode_search") != "")
        .dropDuplicates(["postcode_search", "reference_mod_address"])
    )
    sh = s.groupBy("postcode_search").count().withColumnRenamed("count", "sc")
    rh = r.groupBy("postcode_search").count().withColumnRenamed("count", "rc")
    row = sh.join(rh, "postcode_search").agg(
        F.sum(F.col("sc") * F.col("rc")).alias("pairs")
    ).collect()[0]
    return int(row["pairs"] or 0)


def _bc_ref(sides, cfg) -> bool:
    """The byte-measured broadcast decision, taken OUTSIDE the timed
    windows: the product path (run_waterfall) measures once per run and
    threads the bool into every pass, so a per-pass benchmark must not
    charge the one-time measurement to the pass."""
    from address_matcher_spark.plans import pipeline as P

    return P.should_broadcast(sides["rmin"], cfg.broadcast_max_bytes)


def run_block_score(spark, sides, cfg) -> tuple[int, float]:
    """The BASELINE.md §C 'block join + score' stage: candidate generation
    + cross-scoring + per-record shortlist, materialised."""
    from address_matcher_spark.plans import pipeline as P

    bc = _bc_ref(sides, cfg)
    t0 = time.perf_counter()
    out = P.fuzzy_pass(sides["smin"], sides["rmin"], "Postcode", cfg,
                       "bench", broadcast_ref=bc)
    n = out.count()
    return n, time.perf_counter() - t0


def run_field_pass(spark, sides, cfg) -> tuple[int, float]:
    """The field-wise pass (cogrouped Arrow field scorer) on the same
    corpus — tracks the O(rows)-transfer claim from round 3."""
    from address_matcher_spark.operators.fieldmatch import field_pass

    bc = _bc_ref(sides, cfg)
    t0 = time.perf_counter()
    out = field_pass(sides["smin"], sides["rmin"], "Postcode", cfg, "bench",
                     broadcast_ref=bc)
    n = out.count()
    return n, time.perf_counter() - t0


def run_er_waterfall(spark, sides, cfg) -> tuple[int, float]:
    from pyspark.sql import functions as F

    from address_matcher_spark.plans import pipeline as P

    t0 = time.perf_counter()
    res = P.run_waterfall(sides["smin"], sides["sfull"],
                          sides["rmin"], sides["rfull"], cfg,
                          sides_materialized=True)
    matched = res.filter(F.col("full_match")).count()
    return matched, time.perf_counter() - t0


def run_er_waterfall_full(spark, sides) -> tuple[int, float]:
    """The COMPLETE 8-pass waterfall (fuzzy + field passes, postcode +
    street blocks) — the user-facing product path.  Timed separately
    from er_waterfall, which stays fuzzy-only for r1-r3 comparability."""
    from address_matcher_spark.plans import pipeline as P

    cfg = P.MatchConfig(run_field_passes=True)
    return run_er_waterfall(spark, sides, cfg)


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
    "dedup_duplicate_spans",
    "dedup_duplicate_span_bounds",
    "dedup_incremental",
    "sequence_pack_chunks",
    "text_stats",
    "ann_cosine_topk",
    "ann_ivf_topk",
]


def machine_index(procs: int = 8) -> float:
    """Instantaneous machine-speed index (L1-resident compute probe,
    tasks/s at 8 procs): this sandbox's per-core speed drifts ±20-30%
    with co-tenancy (measured 90.5-133.8 within one day), so every bench
    JSON records the conditions it ran under.  See
    scripts/kernel_calibration.py for the probe definition."""
    import multiprocessing as mp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from kernel_calibration import _spin

    with mp.Pool(procs) as pool:
        pool.map(_spin, range(procs))
        t0 = time.perf_counter()
        pool.map(_spin, range(procs * 4))
        dt = time.perf_counter() - t0
    return round(procs * 4 / dt, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    idx = machine_index()

    from address_matcher_spark.plans import pipeline as P
    from address_matcher_spark.plans.driver_queries import QUERIES
    from address_matcher_spark.session import get_spark

    spark = get_spark(app_name=f"amspark-bench-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = P.MatchConfig(run_field_passes=False)

    sf, n_search, n_ref = _er_scale(sf_dir)
    corpus = _bench_corpus(n_search, n_ref)

    # warm the JVM/codegen/Python-worker pools (tiny, untimed)
    warm = _sides(spark, _bench_corpus(400, 500), cfg)
    run_block_score(spark, warm, cfg)

    sides = _sides(spark, corpus, cfg)
    pairs = count_candidate_pairs(sides)
    # the two headline stages run REPS times INTERLEAVED (block→waterfall
    # kept adjacent within a rep — stage order affects JIT/GC warm-up on
    # this box), with the machine-speed index sampled per rep: the
    # sandbox's per-core speed drifts ±20-30% with co-tenancy, so a
    # single run can't distinguish a regression from a slow hour.
    # Reported per-query value = min over reps; spread recorded.
    #
    # The FIRST full-scale rep is a warm-up and is DISCARDED (the tiny
    # warm corpus above does not warm the full-scale codegen/JIT shapes —
    # round-5's kept warm rep put er_block_score's spread at 73.9%), and
    # reps extend past SPARK_GRAFT_REPS up to SPARK_GRAFT_REPS_CAP until
    # both headline spreads are <15% — the discipline
    # scripts/tune_block_score.py already uses.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    reps_cap = max(reps, int(os.environ.get("SPARK_GRAFT_REPS_CAP", "5")))
    headline_only = os.environ.get("SPARK_GRAFT_HEADLINE_ONLY") == "1"
    block_times: list[float] = []
    wf_times: list[float] = []
    rep_idx: list[float] = []
    shortlisted = matched = 0
    warm_block = run_block_score(spark, sides, cfg)[1]
    warm_wf = 0.0 if headline_only else run_er_waterfall(spark, sides, cfg)[1]

    def _spread(ts: list[float]) -> float:
        return (max(ts) - min(ts)) / min(ts) if ts else 0.0

    while len(block_times) < reps or (
        len(block_times) < reps_cap
        and (_spread(block_times) > 0.15 or _spread(wf_times) > 0.15)
    ):
        rep_idx.append(machine_index())
        shortlisted, t_score = run_block_score(spark, sides, cfg)
        block_times.append(t_score)
        if not headline_only:
            matched, t_wf = run_er_waterfall(spark, sides, cfg)
            wf_times.append(t_wf)
    t_score = min(block_times)
    t_wf = min(wf_times) if wf_times else 0.0
    queries: dict[str, float] = {
        "er_block_score": round(t_score, 3),
    }
    if not headline_only:
        queries["er_waterfall"] = round(t_wf, 3)
    # field-pass timing runs AFTER the waterfall so the two headline
    # stages keep the exact r1/r2 measurement ordering (stage order
    # affects JIT/GC warm-up on this box); scaling_run skips it entirely
    # so its artifacts stay comparable across rounds
    field_times = []
    wf8_times = []
    warm_field = warm_wf8 = 0.0
    if headline_only:
        pass  # scaling mode: the block stage is the whole measurement
    elif os.environ.get("SPARK_GRAFT_SKIP_FIELD") != "1":
        # full warm-discard + min-of-reps + spread-extension discipline,
        # same as the two headline stages (round-7, VERDICT r6 item #5):
        # these two were single-shot through round 5 and min-of-2 in
        # round 6, and full-8pass still showed 74% spread on a choppy
        # box — the first full-scale rep of each plan shape is a codegen
        # /JIT warm-up and is discarded, then reps extend to the cap
        # until spread < 15% (the stage order — field after the
        # waterfall, 8-pass after field — is preserved inside each rep)
        warm_field = run_field_pass(spark, sides, cfg)[1]
        warm_wf8 = run_er_waterfall_full(spark, sides)[1]
        while len(field_times) < min(reps, 2) or (
            len(field_times) < reps_cap
            and (_spread(field_times) > 0.15 or _spread(wf8_times) > 0.15)
        ):
            _, t_field = run_field_pass(spark, sides, cfg)
            _, t_wf8 = run_er_waterfall_full(spark, sides)
            field_times.append(t_field)
            wf8_times.append(t_wf8)
        queries["er_field_pass"] = round(min(field_times), 3)
        queries["er_waterfall_full_8pass"] = round(min(wf8_times), 3)
    if not headline_only:
        for name in OPERATOR_QUERIES:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            queries[name] = round(time.perf_counter() - t0, 3)

    def spread_pct(ts: list[float]) -> float:
        return round(100.0 * (max(ts) - min(ts)) / min(ts), 1) if ts else 0.0

    # index-normalized times: t_nominal = t_raw · idx/NOMINAL (time scales
    # inversely with per-core speed; NOMINAL pins cross-round comparisons
    # to one reference machine state — r3's stamp)
    NOMINAL_INDEX = 129.4
    mean_idx = sum(rep_idx) / len(rep_idx) if rep_idx else idx
    queries_norm = {
        k: round(v * mean_idx / NOMINAL_INDEX, 3) for k, v in queries.items()
    }
    out = {
        "metric": "candidate_pairs_per_sec",
        "value": round(pairs / t_score, 1) if t_score else 0.0,
        "unit": "pairs/sec",
        "queries": queries,
        "queries_norm_at_index_129.4": queries_norm,
        "headline_reps": {
            "er_block_score": [round(t, 3) for t in block_times],
            "er_waterfall": [round(t, 3) for t in wf_times],
            "er_field_pass": [round(t, 3) for t in field_times],
            "er_waterfall_full_8pass": [round(t, 3) for t in wf8_times],
            "warm_rep_discarded": {
                "er_block_score": round(warm_block, 3),
                "er_waterfall": round(warm_wf, 3),
                "er_field_pass": round(warm_field, 3),
                "er_waterfall_full_8pass": round(warm_wf8, 3),
            },
            "machine_index_per_rep": rep_idx,
            "spread_pct": {
                "er_block_score": spread_pct(block_times),
                "er_waterfall": spread_pct(wf_times),
                "er_field_pass": spread_pct(field_times),
                "er_waterfall_full_8pass": spread_pct(wf8_times),
            },
        },
        "sf": round(sf, 4),
        "cpus": cpus,
        "machine_index": idx,
        "er_candidate_pairs": pairs,
        "er_shortlisted": shortlisted,
        # headline-only mode never runs the waterfall: report null, not a
        # phantom 0-match regression (ADVICE r6)
        "er_matched": None if headline_only else matched,
        "er_search_rows": n_search,
        "er_ref_rows": n_ref,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
