"""Blocking: equi-join candidate generation with skew defusal.

Replaces the reference's per-postcode Python loop + greedy batch packer
(tools/fuzzy_match.py:141-168, tools/matcher_funcs.py:894-986) with:

  * a semi-join prefilter dropping reference rows whose block key has no
    search rows (J3/X3, tools/matcher_funcs.py:1213-1216) — at 100 TB this
    is the difference between scanning the whole reference universe and
    only the blocks that matter; Catalyst pushes it into the scan where the
    key is a partition column;
  * the block equi-join itself (J1/J4) — AQE skew-join splits oversized
    post-shuffle partitions;
  * optional explicit salting (X4): the search side gets
    ``pmod(xxhash64(id), S)`` and the reference side is replicated S ways,
    so one heavy key (the synthetic corpus puts ~25% of rows on a single
    postcode) fans out to S tasks instead of one straggler.  The salt
    factor is *measured* from the block histogram, not guessed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefilter_ref(ref: DataFrame, search: DataFrame, key: str) -> DataFrame:
    """Semi-join: keep only reference rows in blocks the search side hits."""
    return ref.join(search.select(key).distinct(), on=key, how="left_semi")


def salt_target_pairs_for(spark, cfg) -> int:
    """Target cross-product size per salt group for the cogrouped scorer.
    Explicit cfg.salt_target_pairs wins; the default is a flat 250k,
    RE-MEASURED after the round-5 exact matrix char bound.

    History: the round-4 kernel streamed ~24 MB of float64 matrices per
    250k-pair group and profiling showed DRAM saturation at 32
    concurrent workers, so the default was concurrency-adaptive
    (~2M/parallelism, clamped [32k, 250k]) to keep grids cache-resident
    at high width.  The round-5 kernel halves the matrix bytes (int32
    decision matrices) and skips the LCS/string stage entirely, so the
    bandwidth term shrank below the per-group fixed costs (frozenset
    build, inverted index, Arrow slices) that FAVOUR bigger groups:
    mirrored A/B at mult-1 decomposition (scripts/tune_block_score.py)
    measures the target flat within noise from 62.5k to 1M at both
    local[8] and local[32], with 250k the consistent best at both
    widths and at 324M pairs (47M pairs/s).  250k also keeps the
    replicated-ref salt factor small (choose_salt_cross caps the heavy
    block's product per group, so ref replication ∝ pairs/target)."""
    explicit = getattr(cfg, "salt_target_pairs", None)
    if explicit is not None:
        return explicit
    return 250_000


def choose_salt(search: DataFrame, key: str, target_block_rows: int = 5000,
                max_salt: int = 64) -> int:
    """Pick the salt factor from the measured block-key histogram: enough
    to split the heaviest block to ~target_block_rows rows per task."""
    top = (
        search.groupBy(key).count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    if top is None:
        return 1
    salt = int((top + target_block_rows - 1) // target_block_rows)
    return max(1, min(salt, max_salt))


def choose_salt_cross(search: DataFrame, ref: DataFrame, key: str,
                      target_pairs: int = 1_000_000,
                      max_salt: int = 256) -> int:
    """Salt factor for cogrouped cross-scoring: measured from the largest
    block's CROSS-PRODUCT size (search_rows × ref_rows), since the scoring
    cost per group is the product, not the row count.  Splitting the
    search side S ways caps each salt-group at ~max_product/S comparisons."""
    sh = search.groupBy(key).count().withColumnRenamed("count", "sc")
    rh = ref.groupBy(key).count().withColumnRenamed("count", "rc")
    mx = (
        sh.join(rh, key)
        .agg(F.max(F.col("sc") * F.col("rc")).alias("mx"))
        .collect()[0]["mx"]
    )
    if not mx:
        return 1
    return max(1, min(int((mx + target_pairs - 1) // target_pairs), max_salt))


def salt_for_cogroup(search: DataFrame, ref: DataFrame, salt: int,
                     salt_id_col: str = "record_id"):
    """Uniform salting: split the search side into salt groups and
    replicate the ref side into every group (the cogroup analogue of the
    salted join).  Prefer salt_for_cogroup_adaptive, which only salts the
    blocks that need it."""
    if salt <= 1:
        return search, ref, []
    s = search.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_id_col)), F.lit(salt)).cast("int")
    )
    r = ref.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return s, r, ["__salt"]


def salt_for_cogroup_adaptive(
    search: DataFrame,
    ref: DataFrame,
    key: str,
    target_pairs: int = 250_000,
    max_splits: int = 64,
    search_id_col: str = "record_id",
    ref_id_col: str = "ref_id",
    ref_hist: DataFrame | None = None,
):
    """PER-BLOCK two-sided (grid) salting for cogrouped cross-scoring —
    X4 done properly.

    Each block needs n = ceil(sc·rc / target) salt groups.  A one-sided
    split replicates the whole ref side n times (row cost rc·n); the grid
    split factors n = a×b with the search side cut a ways × replicated b
    times and the ref side cut b ways × replicated a times, minimising
    replication at a ≈ √(n·sc/rc):  cost sc·b + rc·a ≈ 2√(n·sc·rc)
    instead of rc·n.  Tiny blocks stay whole (a=b=1), so the group count
    — and the per-group UDF overhead — grows only where the data demands
    it.  Per-block factors live in a broadcast histogram join; no driver
    collect.
    """
    # ref_hist (round 8): a precomputed (key, count) histogram of the
    # ref side — run_waterfall materialises one per (level, blocker) ref
    # prep and threads it into all passes, where each pass previously
    # recomputed the aggregation (and the prefilter semi-join feeding
    # it) from scratch.  The histogram may cover a SUPERSET of ref's
    # blocks (it is taken before the per-pass semi-join prefilter):
    # per-block counts are identical for surviving blocks — the
    # prefilter drops whole blocks, never rows within one — and extra
    # blocks vanish in the inner join with the search histogram, so the
    # salting decisions are unchanged.
    sh = search.groupBy(key).count().withColumnRenamed("count", "__sc")
    rh = (ref_hist.withColumnRenamed("count", "__rc")
          if ref_hist is not None
          else ref.groupBy(key).count().withColumnRenamed("count", "__rc"))
    n = F.ceil(F.col("__sc") * F.col("__rc") / F.lit(target_pairs))
    a = F.ceil(F.sqrt(n * F.col("__sc") / F.col("__rc")))
    a = F.greatest(F.least(a, F.lit(max_splits), F.col("__sc")), F.lit(1))
    b = F.greatest(F.least(F.ceil(n / a), F.lit(max_splits), F.col("__rc")), F.lit(1))
    stats = (
        sh.join(rh, key)
        .withColumn("__na", a.cast("int"))
        .withColumn("__nb", b.cast("int"))
        .select(key, "__na", "__nb")
    )
    s = (
        search.join(F.broadcast(stats), key)
        .withColumn(
            "__si",
            F.pmod(F.xxhash64(F.col(search_id_col)), F.col("__na")).cast("int"),
        )
        .withColumn(
            "__sj",
            F.explode(F.sequence(F.lit(0), (F.col("__nb") - 1).cast("int"))),
        )
        .drop("__na", "__nb")
    )
    r = (
        ref.join(F.broadcast(stats), key)
        .withColumn(
            "__sj",
            F.pmod(F.xxhash64(F.col(ref_id_col)), F.col("__nb")).cast("int"),
        )
        .withColumn(
            "__si",
            F.explode(F.sequence(F.lit(0), (F.col("__na") - 1).cast("int"))),
        )
        .drop("__na", "__nb")
    )
    return s, r, ["__si", "__sj"]


def pack_groups(
    search: DataFrame,
    ref: DataFrame,
    key: str,
    extra: list[str],
    n_groups: int,
):
    """Pack (block, salt) cogroup keys into ~n_groups hash buckets.

    The cogrouped scorer pays a fixed Arrow/pandas dispatch cost PER
    GROUP (two pandas frames built, one UDF invocation, one result frame
    — measured ~40 ms against ~0.7 ms of kernel time for a typical
    postcode block).  With one group per block that overhead dominates
    whenever blocks are small, which is the normal shape for postcode
    blocking at any scale.  Bucketing blocks by hash turns ~#blocks
    invocations into ~n_groups, and the scorer sub-groups by the block
    column INSIDE the UDF with one factorize + argsort (numpy, amortised
    over the whole bucket) — the reference's greedy batch packer
    (tools/matcher_funcs.py:894-986) re-expressed as a hash pack.

    Correctness: a (block, si, sj) group lands in exactly one
    (bucket, si, sj) group, and the scorer never crosses rows from
    different blocks (it sub-groups by the block column), so the pair
    set is identical to the unpacked plan.  Heavy blocks keep their grid
    salting: their salt shards spread over (bucket, si, sj) keys exactly
    as before.
    """
    gb = F.pmod(F.xxhash64(F.col(key)), F.lit(n_groups)).cast("int")
    return (
        search.withColumn("__gb", gb),
        ref.withColumn("__gb", gb),
        ["__gb", *extra],
    )


def block_join(
    search: DataFrame,
    ref: DataFrame,
    key: str,
    salt: int = 1,
    salt_id_col: str = "record_id",
    prefilter: bool = True,
) -> DataFrame:
    """Candidate-pair generation: equi-join on the block key.

    Column-name collisions must be resolved by the caller (both sides
    should carry disjoint names apart from ``key``).
    """
    if prefilter:
        ref = prefilter_ref(ref, search, key)
    if salt <= 1:
        return search.join(ref, on=key, how="inner")
    salted_search = search.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_id_col)), F.lit(salt)).cast("int")
    )
    salted_ref = ref.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = salted_search.join(salted_ref, on=[key, "__salt"], how="inner")
    return out.drop("__salt")
