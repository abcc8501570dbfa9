"""The end-to-end matching pipeline: the reference's 4-pass waterfall
(tools/matcher_funcs.py:988-1074) rebuilt as Spark job DAGs.

Flow per EP1 (SURVEY §3):
  pages → extract text (native exprs) → search side
  LPI reference → fulladdress assembly → reference side
  both → minimal + full standardisation (one DataFrame each, reused by all
  passes — the reference's four standing datasets, tools/matcher_funcs.py:752-772)
  waterfall: fuzzy(min, postcode) → fuzzy(min, street) → fuzzy(full,
  postcode) → fuzzy(full, street) → fieldwise(min, postcode) →
  fieldwise(min, street) → fieldwise(full, postcode) →
  fieldwise(full, street),
  each pass attempting only records the previous passes failed (anti-join
  F1, tools/matcher_funcs.py:83-109), combined with the W2 window dedup.
  matched pairs → connected components → clusters.

Scale: blocking joins are equi-joins with semi-join prefilter + optional
measured salting (operators/blocking.py); scoring is Arrow-batched pandas
UDFs; everything else is codegen'd expressions and windows.
"""

from __future__ import annotations

import logging as _logging
import threading as _threading
import time as _time
from concurrent.futures import Future as CFuture
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from address_matcher_spark.functions import extract as X
from address_matcher_spark.functions import standardise as S
from address_matcher_spark.operators import (
    _util, blocking, cofilter, scoring, select, verify,
)
from address_matcher_spark.operators.fieldmatch import field_pass
from address_matcher_spark.sources.checkpoint import CheckpointStore


@dataclass
class MatchConfig:
    fuzzy_match_limit: float = 85.0         # tools/constants.py:39
    no_number_fuzzy_match_limit: float = 100.0  # tools/constants.py:235
    score_cut_off: float = 98.7             # tools/constants.py:231
    score_cut_off_street: float = 99.5      # tools/constants.py:233
    salt: int = 0                           # 0 → measure via choose_salt
    salt_target_rows: int = 5000            # join-path salting (field pass)
    salt_target_pairs: int | None = None    # cogroup cross-score salting;
                                            # None → concurrency-adaptive
                                            # (see salt_target_pairs_for)
    broadcast_ref: bool | None = None       # None → measure bytes (see below)
    broadcast_max_bytes: int = 256 * 1024 * 1024  # explicit-broadcast ceiling
    run_field_passes: bool = True
    paired_blockers: bool = True            # run pc+street of one level
                                            # concurrently (output-identical;
                                            # see run_waterfall level pairing)
    area_cofilter: bool = True              # F3 (tools/matcher_funcs.py:567-606)
    address_cols: tuple = ("address_line1", "address_line2", "town")
    postcode_col: str = "postcode"


SEARCH_FIELDS = [f"{f}_search" for f in verify.FIELDS]
REF_FIELDS = [f"{f}_reference" for f in verify.FIELDS]


# ---------------------------------------------------------------------------
# side preparation
# ---------------------------------------------------------------------------


def search_from_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → search rows with a stable
    record_id derived from url (SURVEY §1.4: monotonically_increasing_id is
    unstable across recompute — hash the natural key instead).

    The raw pages are repartitioned BEFORE the extraction projection: a
    projection sits below any later repartition in the physical plan, so
    without this the html→text regexes would run on the scan's (possibly
    single) input split."""
    pages = _ensure_parallel(pages)
    text = X.extract_text(F.col("html"))
    return pages.select(
        F.xxhash64(F.col("url")).alias("record_id"),
        F.col("url"),
        X.first_address_line(text).alias("address_line1"),
        F.lit("").alias("address_line2"),
        X.page_town(text).alias("town"),
        X.page_postcode(text).alias("postcode"),
    )


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """The standardisation layer is ~150 regex ops per row; a small input
    (one parquet split) would run it on one core.  Round-robin repartition
    when the scan has fewer splits than the cluster has slots — a no-op on
    real multi-split inputs."""
    from address_matcher_spark.operators._util import ensure_parallel

    return ensure_parallel(df)


def prepare_search(df: DataFrame, cfg: MatchConfig) -> DataFrame:
    """T3/T4 + F2/F5/F6 + T7: clean/join address cols, exclusion flags,
    blocking key (tools/preparation.py:53-118, tools/standardise.py:19-36)."""
    df = _ensure_parallel(df)
    cleaned = []
    for c in cfg.address_cols:
        col = F.coalesce(F.col(c).cast("string"), F.lit(""))
        col = F.regexp_replace(col, r"nan", "")
        col = F.regexp_replace(col, r"\s{2,}", " ")
        col = F.regexp_replace(col, r",", " ")
        cleaned.append(F.trim(col))
    full_address = F.trim(
        F.regexp_replace(F.concat_ws(" ", *cleaned), r"\s{2,}", " ")
    )
    out = (
        df.withColumn("full_address", full_address)
        .withColumn("postcode", F.coalesce(F.col(cfg.postcode_col).cast("string"), F.lit("")))
        .filter(F.length(F.trim(F.col("full_address"))) > 0)  # F2
        .withColumn("excluded", S.exclusion_flag(F.col("full_address")))
        .withColumn("full_address_search", S.full_address_search(F.col("full_address")))
        .withColumn(
            "postcode_search",
            F.when(
                F.col("excluded") == "Excluded - non-postal address", F.lit("")
            ).otherwise(S.postcode_search_key(F.col("postcode"))),
        )
        .withColumn(
            "street_key",
            F.when(
                F.col("excluded") == "Excluded - non-postal address", F.lit("")
            ).otherwise(S.extract_street_name(F.col("full_address_search"))),
        )
    )
    return out


def prepare_reference(df: DataFrame) -> DataFrame:
    """LPI columns → fulladdress (T5/T6) + blocking keys
    (tools/preparation.py:172-237)."""
    df = _ensure_parallel(df)
    scrubbed = {}
    for c in S._LPI_COLS:
        col = F.coalesce(F.col(c).cast("string"), F.lit(""))
        col = F.regexp_replace(col, r"nan", "")
        col = F.regexp_replace(col, r"\.0", "")
        scrubbed[c] = col
    full = S.clean_fulladdress(S.create_full_address(scrubbed))
    return (
        df.filter(F.col("Postcode").isNotNull())
        .withColumn("fulladdress", full)
        .withColumn("full_address_search", S.full_address_search(F.col("fulladdress")))
        .withColumn("postcode_search", S.postcode_search_key(F.col("Postcode")))
        .withColumn("street_key", F.upper(F.coalesce(F.col("Street"), F.lit(""))))
    )


def prepare_sides(
    search_raw: DataFrame,
    ref_raw: DataFrame,
    cfg: MatchConfig,
    prior_results: DataFrame | None = None,
    cofilter_ref: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Raw sides → prepared sides with the reference's pre-match filters:
    F3 postcode-area co-filter (both directions) and F4 previously-matched
    exclusion when a prior results table is supplied.  Both run on the RAW
    frames so the heavy standardisation projections only touch surviving
    rows (the semi-joins sit below the regex layer in the plan).

    cofilter_ref=False keeps the FULL reference: required when the ref
    sides are materialised for cross-run reuse (bucketed tables) — the
    area co-filter depends on the current search corpus, and the ref
    direction is perf-only (full_match needs close_postcode_match, finer
    than area equality, so dropping other-area ref rows never changes a
    result); the per-pass semi-join prefilter prunes at plan time
    instead."""
    if cfg.area_cofilter:
        search_kept, ref_kept, _ = cofilter.area_cofilter(
            search_raw, ref_raw, cfg.postcode_col, "Postcode",
            address_cols=cfg.address_cols,
        )
        search_raw = search_kept
        if cofilter_ref:
            ref_raw = ref_kept
    if prior_results is not None:
        search_raw, _ = cofilter.exclude_previously_matched(
            search_raw, prior_results
        )
    return prepare_search(search_raw, cfg), prepare_reference(ref_raw)


def standardise_search(df: DataFrame, standardise_flag: bool) -> DataFrame:
    out = S.standardise_address_df(
        df, "full_address_search", "search_mod_address", standardise_flag
    )
    for f in verify.FIELDS:
        out = out.withColumnRenamed(f, f"{f}_search")
    return out.select(
        "record_id", "url", "full_address", "postcode", "postcode_search",
        "street_key", "excluded", "search_mod_address", *SEARCH_FIELDS,
    )


def standardise_reference(df: DataFrame, standardise_flag: bool) -> DataFrame:
    out = S.standardise_address_df(
        df, "full_address_search", "reference_mod_address", standardise_flag
    )
    for f in verify.FIELDS:
        out = out.withColumnRenamed(f, f"{f}_reference")
    # LPI source columns ride along for the field-wise pass (J5 compares
    # them directly; strings only, cheap relative to the pair fan-out)
    # The original ref postcode is renamed to a CASE-DISTINCT name: search
    # rows carry `postcode`, and under Spark's default caseSensitive=false
    # `Postcode` vs `postcode` on the joined pair frame is AMBIGUOUS_REFERENCE.
    lpi = [c for c in S._LPI_COLS if c != "Postcode"]
    return out.select(
        "ref_id", "UPRN", "fulladdress",
        F.col("Postcode").alias("postcode_ref"), "postcode_search",
        "street_key", "reference_mod_address", *REF_FIELDS, *lpi,
    )


# ---------------------------------------------------------------------------
# one fuzzy pass (postcode- or street-blocked)
# ---------------------------------------------------------------------------


# shared with the field pass (operators/_util.py to avoid a circular import)
scoring_npart = _util.scoring_npart


def prep_ref_for_block(ref_std: DataFrame, blocker: str) -> DataFrame:
    """Block-keyed reference variant: filter empty keys, rename the block
    key to __bk, drop the other key, dedup identical standardised rows
    (X7 — join-key fan-out guard).  There are only FOUR distinct variants
    per run ((min|full) × (postcode|street)); run_waterfall materialises
    them once and threads them into every pass instead of paying the
    dedup shuffle 8× (once per pass)."""
    key = "postcode_search" if blocker == "Postcode" else "street_key"
    r = ref_std.filter(F.col(key) != "").withColumnRenamed(key, "__bk")
    r = r.drop(*({"postcode_search", "street_key"} - {key}))
    return r.dropDuplicates(["__bk", "reference_mod_address"])


def fuzzy_pass(
    search_std: DataFrame,
    ref_std: DataFrame,
    blocker: str,
    cfg: MatchConfig,
    pass_name: str,
    broadcast_ref: bool | None = None,
    residue_rows: int | None = None,
    ref_prepped: DataFrame | None = None,
    ref_rows: int | None = None,
    ref_hist: DataFrame | None = None,
) -> DataFrame:
    """J1/J2 + P1 + J6 + D1-D7 + P2 + W1: block-join candidates, score with
    the vectorized token_set_ratio UDF, shortlist to per-record max, verify,
    tie-break, pick best.  Returns one row per attempted search record.

    ref_hist: the prep's materialised (__bk, count) histogram — reused
    across passes by run_waterfall so the salting stats job stops
    recomputing the ref aggregation (and the prefilter semi-join feeding
    it) once per pass (round 8; equivalence in
    blocking.salt_for_cogroup_adaptive)."""
    key = "postcode_search" if blocker == "Postcode" else "street_key"
    s = search_std.filter(F.col(key) != "").withColumnRenamed(key, "__bk")
    # drop the other key col to avoid collisions
    drop_s = {"postcode_search", "street_key"} - {key}
    s = s.drop(*drop_s)
    # ref side: the filtered/renamed/dedup'd variant — materialised once
    # per (level, blocker) by run_waterfall (ref_prepped), else built here
    r = ref_prepped if ref_prepped is not None else (
        prep_ref_for_block(ref_std, blocker)
    )
    # semi-join prefilter: ref blocks nobody searches never ship (J3/X3)
    r = blocking.prefilter_ref(r, s, "__bk")

    # Scoring is the reference's cdist re-expressed for Spark: cogroup
    # both sides by (block, salt) and cross-score INSIDE an Arrow UDF
    # (scoring.block_cross_score).  Strings cross the JVM↔Python boundary
    # once per row — not once per pair — and only pairs >= cutoff return.
    # Salting is PER-BLOCK from the measured cross-product histogram
    # (tools/matcher_funcs.py:894-986's batch packer, done right): a heavy
    # block splits so no salt-group exceeds ~target comparisons; small
    # blocks stay whole.
    s_salted, r_salted, extra = blocking.salt_for_cogroup_adaptive(
        s.select("record_id", "__bk", "search_mod_address"),
        r.select("ref_id", "__bk", "reference_mod_address"),
        "__bk", blocking.salt_target_pairs_for(s.sparkSession, cfg),
        ref_hist=ref_hist,
    )
    # pin the scoring stage's parallelism with an explicit NUMBERED
    # repartition on the grouping keys: it satisfies the cogroup's
    # required clustering (no second shuffle) and numbered repartitions
    # are exempt from AQE's byte-based coalescing, which would otherwise
    # serialise this compute-bound stage onto a couple of tasks.
    # Flat defaultParallelism decomposition: with the round-5 kernel the
    # stage is fixed-cost-per-task dominated, and mirrored A/B finds
    # mult-1 best at every width/corpus tried (see _util.scoring_npart;
    # the old kernel's measured 8-32× over-decomposition inverted when
    # the per-pair cost dropped ~10×).  Residue-scaled when the caller
    # knows how much is left to match (scoring_npart).
    npart = scoring_npart(s.sparkSession, residue_rows)
    # Pack blocks into ~4·npart hash buckets: the cogrouped scorer pays a
    # fixed Arrow/pandas dispatch per GROUP (~40 ms measured) against
    # sub-ms of kernel time for a typical postcode block, so per-block
    # groups make dispatch the dominant stage cost at every scale.  The
    # UDF sub-groups by __bk internally — identical pair set.
    n_groups = _util.pack_group_count(s.sparkSession, npart, residue_rows,
                                      ref_rows=ref_rows)
    s_salted, r_salted, keys = blocking.pack_groups(
        s_salted, r_salted, "__bk", extra, n_groups
    )
    s_salted = s_salted.repartition(npart, *[F.col(k) for k in keys])
    r_salted = r_salted.repartition(npart, *[F.col(k) for k in keys])
    cand = scoring.block_cross_score(
        s_salted, r_salted, keys, cutoff=cfg.fuzzy_match_limit,
        block_col="__bk",
    )

    shortlist = select.keep_max_score(cand, "record_id")
    # join the (now tiny) shortlist back to both sides for verification;
    # ref side is dimension-like → broadcast (falls back to a shuffled
    # equi-join on ref_id when the reference is too big to broadcast)
    # run_waterfall always threads its once-measured decision in; a DIRECT
    # caller falls back to cfg, then to a fresh byte measurement — never an
    # unconditional broadcast (a multi-GB ref side would OOM the executors)
    if broadcast_ref is None:
        broadcast_ref = cfg.broadcast_ref
    if broadcast_ref is None:
        broadcast_ref = should_broadcast(ref_std, cfg.broadcast_max_bytes)
    shortlist = shortlist.join(
        search_std.drop("street_key", "postcode_search"), "record_id"
    )
    ref_back = ref_std.drop("postcode_search", "street_key")
    shortlist = shortlist.join(
        F.broadcast(ref_back) if broadcast_ref else ref_back, "ref_id"
    )
    shortlist = verify.add_decisions(
        shortlist,
        blocker,
        cfg.fuzzy_match_limit,
        cfg.no_number_fuzzy_match_limit,
    )
    shortlist = select.add_wratio_tiebreak(shortlist, scoring.ratio_udf)
    best = select.best_match(shortlist, "record_id")
    return best.withColumn("match_method", F.lit(pass_name))


RESULT_COLS = [
    "record_id", "url", "full_address", "postcode", "fuzzy_score",
    "full_match", "full_number_match", "close_postcode_match",
    "fuzzy_score_match", "wratio_score", "search_mod_address",
    "reference_mod_address", "fulladdress", "postcode_ref", "ref_id", "UPRN",
    "match_method",
    *[f"{f}_match" for f in verify.FIELDS],
    *SEARCH_FIELDS, *REF_FIELDS,
]


# re-exported from operators/_util.py (shared with the field pass)
estimated_bytes = _util.estimated_bytes
should_broadcast = _util.should_broadcast


def _residue(search_std: DataFrame, matched: DataFrame) -> DataFrame:
    """F1: anti-join away records already matched (tools/matcher_funcs.py:83-109)."""
    winners = matched.filter(F.col("full_match")).select("record_id")
    return search_std.join(winners, "record_id", "left_anti")


def run_waterfall(
    search_min: DataFrame,
    search_full: DataFrame,
    ref_min: DataFrame,
    ref_full: DataFrame,
    cfg: MatchConfig | None = None,
    store: CheckpointStore | None = None,
    sides_materialized: bool = False,
    ref_materialized: bool = False,
    metrics: dict | None = None,
) -> DataFrame:
    """O3/O4/O5: the full waterfall.  Returns one row per matched-or-
    attempted search record (best candidate + decisions + method).

    ref_materialized=True: the ref sides are already durable — e.g.
    BUCKETED tables (sources/bucketing.ensure_bucketed_ref), whose scan
    carries a HashPartitioning that a store.write/localCheckpoint would
    destroy (every per-pass ref dedup/histogram would shuffle again).

    metrics: pass a dict to collect per-stage run counters — wall seconds,
    residue rows, and matched counts per pass (the same counters a
    store.write records durably; this is the in-process view for ops
    dashboards and for profiling where waterfall time goes)."""
    cfg = cfg or MatchConfig()
    _t = _time.perf_counter
    _t0 = _t()
    # The four standing datasets are reused by every pass
    # (tools/matcher_funcs.py:752-772).  Materialise them AND cut their
    # lineage: the standardisation layer is hundreds of expressions, and
    # without truncation every pass re-analyzes that whole tree on the
    # driver (~seconds per pass of pure planning).  With a store this is
    # a real checkpoint (resumable); otherwise localCheckpoint.  Callers
    # that already checkpointed/cached the sides pass
    # sides_materialized=True to skip the redundant second scan+write.
    if store is not None:
        search_min = store.write(search_min, "side_search_min")
        search_full = store.write(search_full, "side_search_full")
        if not ref_materialized:
            ref_min = store.write(ref_min, "side_ref_min")
            ref_full = store.write(ref_full, "side_ref_full")
    elif not sides_materialized:
        search_min = search_min.localCheckpoint()
        search_full = search_full.localCheckpoint()
        if not ref_materialized:
            ref_min = ref_min.localCheckpoint()
            ref_full = ref_full.localCheckpoint()
    if metrics is not None:
        metrics["sides_sec"] = round(_t() - _t0, 3)
    # broadcast decision measured once in BYTES, not row count (X11): the
    # ref side is dimension-like; broadcast only while the serialized table
    # fits an executor comfortably
    _t1 = _t()
    if cfg.broadcast_ref is None:
        bc_ref = should_broadcast(ref_min, cfg.broadcast_max_bytes)
    else:
        bc_ref = cfg.broadcast_ref
    if metrics is not None:
        metrics["broadcast_measure_sec"] = round(_t() - _t1, 3)
        metrics["broadcast_ref"] = bc_ref
        metrics["passes"] = []
    # Block-keyed ref variants (filter/rename/dedup, prep_ref_for_block):
    # only FOUR distinct ones exist per run ((min|full) × (pc|street)) but
    # the 8-pass plan used to rebuild them per pass — 8 dedup shuffles of
    # the full reference side.  Shared across passes unless the ref is
    # already a durable bucketed table (persisting would destroy the
    # bucketed scan's exchange-free HashPartitioning).  With a store this
    # is a real checkpoint (resumable); otherwise localCheckpoint: even
    # WITHIN one pass the prep subtree is referenced three times (rh
    # histogram, semi-join prefilter, salted ref side) and Catalyst
    # recomputes shared subtrees — profiled at ~15 core-s of repeated
    # dedup aggregation per pass at bench scale.  (An in-memory .cache()
    # variant measured SLOWER end-to-end: columnar compress-on-write +
    # decompress-per-read beats a local checkpoint scan only when the
    # frame is read once, and these are read ~3× per pass.)
    materialize_prep = not ref_materialized
    _prep_futs: dict[tuple[str, str], "CFuture"] = {}
    _prep_rows: dict[tuple[str, str], int] = {}
    _prep_hists: dict[tuple[str, str], DataFrame] = {}
    _prep_lock = _threading.Lock()

    def get_prep(level: str, blocker: str, rstd: DataFrame) -> DataFrame:
        # called from concurrent pass threads AND the prefetcher below;
        # a Future per (level, blocker) makes the materialisation
        # once-only — the first arrival builds, the rest block on it
        k = (level, blocker)
        with _prep_lock:
            fut = _prep_futs.get(k)
            mine = fut is None
            if mine:
                fut = CFuture()
                _prep_futs[k] = fut
        if mine:
            try:
                tp = _t()
                v = prep_ref_for_block(rstd, blocker)
                if materialize_prep:
                    # the prep's row count rides the materialisation via
                    # observe() (no extra job) — it sizes the pack-bucket
                    # memory guard from the REF side too
                    # (_util.pack_group_count), since the cogroup holds
                    # both sides of a group in worker memory at once
                    obs = Observation()
                    v = v.observe(obs, F.count(F.lit(1)).alias("rows"))
                    v = (store.write(v, f"ref_prep_{level}_{blocker}")
                         if store is not None else v.localCheckpoint())
                    _prep_rows[k] = int(obs.get["rows"])
                    # the prep's block histogram, materialised once and
                    # reused by every pass's salting stats (round 8) —
                    # ≤ #blocks rows, one tiny job off the critical path
                    # (preps are prefetched)
                    _prep_hists[k] = (
                        v.groupBy("__bk").count().localCheckpoint()
                    )
                if metrics is not None:
                    metrics[f"prep_{level}_{blocker}_sec"] = round(
                        _t() - tp, 3)
                fut.set_result(v)
            except BaseException as e:
                fut.set_exception(e)
                raise
        return fut.result()

    passes: list[DataFrame] = []

    def run_pass(fn, name):
        # NOTE: does not touch `passes` — paired levels run two of these
        # from worker threads, and pass_priority (combine_passes) must
        # follow PLAN order, so the caller appends results in unit order.
        #
        # The pass's winner count rides the materialisation via observe()
        # (CollectMetrics in the written plan) instead of a separate
        # count job per level — the checkpoint/localCheckpoint action is
        # the only driver-blocking job a pass runs (VERDICT r6 item #3).
        out = fn()
        obs = Observation()
        out = out.select(*RESULT_COLS).observe(
            obs, F.count(F.when(F.col("full_match"), 1)).alias("won")
        )
        if store is not None:
            out = store.write(out, f"pass_{name}")
        else:
            out = out.localCheckpoint()
        # the materialisation above already executed the plan, so the
        # metric is available; .get would block forever only if the
        # action somehow skipped execution, which store.write/
        # localCheckpoint never do
        return out, int(obs.get["won"])

    def prep_and_rows(level: str, blocker: str, rstd: DataFrame):
        # (ref_prepped, ref_rows, ref_hist) for a pass lambda: the
        # observed count and histogram are filled by the get_prep call,
        # so evaluate it first
        v = get_prep(level, blocker, rstd)
        k = (level, blocker)
        return v, _prep_rows.get(k), _prep_hists.get(k)

    plan = [
        ("fuzzy_min_pc", lambda s, n: fuzzy_pass(s, ref_min, "Postcode", cfg, "fuzzy_min_pc", bc_ref, n, *prep_and_rows("min", "Postcode", ref_min)), search_min),
        ("fuzzy_min_st", lambda s, n: fuzzy_pass(s, ref_min, "Street", cfg, "fuzzy_min_st", bc_ref, n, *prep_and_rows("min", "Street", ref_min)), search_min),
        ("fuzzy_full_pc", lambda s, n: fuzzy_pass(s, ref_full, "Postcode", cfg, "fuzzy_full_pc", bc_ref, n, *prep_and_rows("full", "Postcode", ref_full)), search_full),
        ("fuzzy_full_st", lambda s, n: fuzzy_pass(s, ref_full, "Street", cfg, "fuzzy_full_st", bc_ref, n, *prep_and_rows("full", "Street", ref_full)), search_full),
    ]
    if cfg.run_field_passes:
        # The reference's NN stage runs a Postcode-blocked score_based_match
        # then a Street-blocked one at EACH standardisation level
        # (tools/matcher_funcs.py:1425-1462), the street pass with the
        # raised 99.5 cutoff (tools/recordlinkage_funcs.py:264-267 via
        # score_cut_off_street — fieldmatch.field_pass selects it from
        # blocker="Street") and D3's digit-free-never-matches-on-street
        # rule (verify.add_decisions).  The reference's fall-back-to-the-
        # postcode-result-when-street-finds-nothing behaviour
        # (tools/matcher_funcs.py:1455-1462) is structural here: each pass
        # only attempts the previous passes' residue and combine_passes
        # keeps the earliest pass's row per record, so a record the street
        # pass can't improve retains its postcode-pass row untouched.
        # the field passes get the SAME measured broadcast decision and the
        # same residue-scaled partitioning as the fuzzy passes — round 4
        # threaded bc_ref only into the fuzzy lambdas, leaving the field
        # passes force-broadcasting a possibly multi-GB ref side (VERDICT
        # r4 "What's wrong #1")
        plan += [
            ("field_min_pc", lambda s, n: field_pass(s, ref_min, "Postcode", cfg, "field_min_pc", bc_ref, n, *prep_and_rows("min", "Postcode", ref_min)), search_min),
            ("field_min_st", lambda s, n: field_pass(s, ref_min, "Street", cfg, "field_min_st", bc_ref, n, *prep_and_rows("min", "Street", ref_min)), search_min),
            ("field_full_pc", lambda s, n: field_pass(s, ref_full, "Postcode", cfg, "field_full_pc", bc_ref, n, *prep_and_rows("full", "Postcode", ref_full)), search_full),
            ("field_full_st", lambda s, n: field_pass(s, ref_full, "Street", cfg, "field_full_st", bc_ref, n, *prep_and_rows("full", "Street", ref_full)), search_full),
        ]

    # Prefetch: the prep materialisations are residue-independent, so
    # build them concurrently in the background while level 1 runs
    # instead of serially on each level's critical path (~0.8 s each at
    # bench scale).  Skipped for bucketed refs (prep stays a lazy plan —
    # no job to prefetch) and in store mode (a resume should only find
    # checkpoint stages the waterfall actually reached).  An early exit
    # may waste a prefetched prep; a failed prefetch surfaces on first
    # use (the Future re-raises) or never, if that pass was skipped.
    # Only the LATER levels' preps prefetch — level 1 builds its own two
    # in its pass threads, and prefetching those as well just makes all
    # four compete for the same slots on level 1's critical path
    # (measured: full-prefetch inflated each prep 1.0 s → 2.3 s and the
    # 8-pass wall by ~2 s).
    _prefetch = None
    if materialize_prep and store is None:
        prep_specs = [("full", "Postcode", ref_full),
                      ("full", "Street", ref_full)]
        _prefetch = ThreadPoolExecutor(max_workers=len(prep_specs),
                                       thread_name_prefix="prep-prefetch")

        def _log_prefetch_failure(fut, _log=_logging.getLogger(__name__)):
            # a failed prefetch whose pass the early-exit gate skips would
            # otherwise vanish (the Future re-raises only on consumption);
            # surface it in the log either way (ADVICE r6)
            exc = None if fut.cancelled() else fut.exception()
            if exc is not None:
                _log.warning("ref-prep prefetch failed: %r", exc)

        for lv, bl, rstd in prep_specs:
            _prefetch.submit(get_prep, lv, bl, rstd).add_done_callback(
                _log_prefetch_failure
            )

    # Level pairing: the two BLOCKERS of one standardisation level (pc +
    # street) read the SAME residue, and combine_passes keeps the
    # earliest pass's row per record — so running them CONCURRENTLY is
    # output-identical to the strict sequential waterfall (a record both
    # passes match keeps the pc pass's row via pass_priority; a record
    # only the street pass matches gets the same row either way; the
    # next level's residue is the same union of winners).  What changes
    # is the schedule: the per-pass wall at bench scale is dominated by
    # sequential stage latency (~6 exchanges × scheduler latency, NOT
    # core-seconds — profiled in round 6), so halving the sequential
    # depth nearly halves the waterfall wall.  The street pass does
    # score records the pc pass will win (bounded extra compute: street
    # blocks are the smaller fan-out; at bench scale ~2× the street
    # pass's own pairs) — on a fully saturated cluster where wasted
    # compute costs wall time, cfg.paired_blockers=False restores the
    # strict residue-sequential schedule (same results, per-PASS
    # early-exit granularity).
    #
    # early-exit gate (X2, ref tools/matcher_funcs.py:1013-1017): the
    # reference aborts the waterfall when nothing is left to match;
    # paired, the gate runs between LEVELS.  Pass winners within a level
    # may overlap (both blockers can match the same record), so the
    # matched total is a distinct count over the level's (tiny,
    # checkpointed) winner ids — one cheap job per level.
    units: list[list] = []
    for entry in plan:
        if (cfg.paired_blockers and units and len(units[-1]) == 1
                and units[-1][0][2] is entry[2]
                and units[-1][0][0].rsplit("_", 1)[0]
                == entry[0].rsplit("_", 1)[0]):
            units[-1].append(entry)
        else:
            units.append([entry])

    total_records = search_min.count()
    matched_union: DataFrame | None = None
    matched_count = 0
    try:
        for unit in units:
            if passes and matched_count >= total_records:
                # matched_count is a SUM of observed per-pass winner
                # counts — a paired level's two blockers can both match
                # the same record, so it is an upper bound.  Confirm with
                # one exact distinct count (over tiny checkpointed winner
                # ids) before skipping real matching work; this fires at
                # most once per run, only when the corpus looks done.
                matched_count = matched_union.distinct().count()
                if matched_count >= total_records:
                    break  # every search record already has a full match
            # (level 1 always runs so an empty input still yields a
            # result frame with the full schema)
            residue_rows = max(1, total_records - matched_count)
            side = unit[0][2]
            residue = side if matched_union is None else side.join(
                matched_union, "record_id", "left_anti"
            )
            tpass = _t()
            if len(unit) == 1:
                uname, ufn, _ = unit[0]
                outs = [run_pass(
                    lambda s=residue, n=residue_rows: ufn(s, n), uname)]
            else:
                with ThreadPoolExecutor(len(unit)) as ex:
                    futs = [
                        ex.submit(
                            run_pass,
                            lambda s=residue, n=residue_rows, f=fn: f(s, n),
                            name,
                        )
                        for name, fn, _ in unit
                    ]
                    outs = [f.result() for f in futs]
            passes.extend(out for out, _ in outs)
            # winner count folded into the checkpoint write via observe()
            # (run_pass) — no separate count job per level.  Within a
            # paired level the sum can double-count a record both
            # blockers match; it only feeds the early-exit gate (which
            # re-verifies exactly before firing) and the residue-size
            # partitioning hints, where an under-estimate is harmless.
            won = sum(w for _, w in outs)
            matched_count += won
            winners = None
            for out, _ in outs:
                w = out.filter(F.col("full_match")).select("record_id")
                winners = w if winners is None else winners.unionByName(w)
            if metrics is not None:
                metrics["passes"].append({
                    "pass": "+".join(name for name, _, _ in unit),
                    "residue_rows": int(residue_rows),
                    "matched": int(won),
                    "matched_per_pass": [int(w) for _, w in outs],
                    "seconds": round(_t() - tpass, 3),
                })
            matched_union = winners if matched_union is None else (
                matched_union.unionByName(winners)
            )
    finally:
        # join the prefetcher on every exit path (ADVICE r6): an early
        # exit or a raise must not leave a prep thread running a Spark
        # job against a session the caller may be tearing down, and a
        # hung thread would otherwise block interpreter shutdown
        # (cancel_futures drops queued-but-unstarted preps; running ones
        # finish — they're ~1 s materialisations at bench scale)
        if _prefetch is not None:
            _prefetch.shutdown(wait=True, cancel_futures=True)

    if metrics is not None:
        metrics["total_records"] = int(total_records)
        metrics["matched"] = int(matched_count)
        metrics["waterfall_sec"] = round(_t() - _t0, 3)
    return select.combine_passes(passes, key="record_id")


def match_summary(results: DataFrame) -> DataFrame:
    """A4: single-pass conditional counts (tools/matcher_funcs.py:1591-1626)."""
    return results.agg(
        F.count(F.lit(1)).alias("attempted"),
        F.count(F.when(F.col("full_match"), 1)).alias("matched"),
        F.count(F.when(~F.col("full_match"), 1)).alias("not_matched"),
        F.round(
            100 * F.count(F.when(F.col("full_match"), 1))
            / F.greatest(F.count(F.lit(1)), F.lit(1)),  # ANSI-safe on empty
            1,
        ).alias("match_rate_pct"),
    )
