"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_parallel(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    cluster has slots.  For compute-heavy per-row projections (md5 chains,
    shingle explodes) a small parquet scan is otherwise 1-2 tasks however
    many cores exist; AQE can't fix it because it sizes stages by input
    BYTES, and these stages are cheap in bytes but hot in CPU.  A no-op on
    real multi-split inputs, so it costs nothing at 100 TB."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def estimated_bytes(df: DataFrame, n_rows: int, sample_rows: int = 2000) -> int:
    """Byte-size estimate for the broadcast decision: avg serialized row
    width from an UNBIASED random sample × exact row count.  A row-count
    heuristic is wrong at scale (5M rows × 30 string cols is multi-GB —
    executor OOM); bytes are what the executor actually holds.  A
    limit(sample_rows) would read only the first partitions — on sorted
    input that systematically under/over-samples wide rows — so sample by
    fraction instead (one projected pass; the frame under consideration is
    the dimension side, which every pass scans anyway)."""
    if n_rows == 0:
        return 0
    per_field = [
        F.coalesce(F.octet_length(F.col(f.name).cast("string")), F.lit(0))
        + F.lit(16)  # UnsafeRow field overhead + object headers, roughly
        for f in df.schema.fields
    ]
    row_bytes = per_field[0]
    for e in per_field[1:]:
        row_bytes = row_bytes + e
    frac = min(1.0, (4.0 * sample_rows) / max(n_rows, 1))
    sampled = df if frac >= 1.0 else df.sample(False, frac, seed=7)
    agg = sampled.limit(sample_rows * 4).agg(
        F.avg(row_bytes).alias("avg_b")
    ).first()
    avg = float(agg["avg_b"] or 0.0)
    return int(avg * n_rows)


def should_broadcast(df: DataFrame, max_bytes: int, n_rows: int | None = None) -> bool:
    """True when the measured size fits under the explicit-broadcast ceiling.
    Anything larger is left to a shuffled equi-join (AQE may still convert
    it if its own byte stats allow)."""
    n = df.count() if n_rows is None else n_rows
    return estimated_bytes(df, n) <= max_bytes


def scoring_npart(spark, residue_rows: int | None = None) -> int:
    """Partition count for the cogrouped fuzzy scoring stage.  32×
    over-decomposition evens salt-group imbalance on a full corpus: the
    stage runs npart/dp waves of tasks, and the straggler tail of the
    LAST wave is ∝ 1/waves.  Profiled at mult 8 on the 1.2G-pair corpus
    (scripts/profile_block_score.py) the tail was 13.8s of a 136.5s
    local[16] wall (10%, busy_frac 0.864); mirrored-order A/B of the
    multiplier (geometric-mean legs, fresh JVM per leg) measured:
    local[8] 178.2s (8×) vs 179.0s (32×) — neutral; local[16] 111.6 vs
    103.9 — 32× wins 6.8%; local[32] 77.5 vs 74.9 — 32× wins 3.4%.  The
    tail binds where concurrent workers are many, so the finer
    decomposition helps exactly where scaling needs it; per-task
    overhead (~1s total at 1024 partitions / 32 cores) stays ≪ the tail
    it removes.  A flat dp*32 is pure scheduling overhead for the small
    residues of later waterfall passes — so when the caller knows the
    residue size, scale down: ~1 salt group per 64 search rows (bench
    corpus measures ~2.9k candidate pairs per search row at 250k target
    pairs/group), clamped to [dp, dp*32].  (The FIELD pass does not use
    this: its rank-1 accumulation is too light per pair — flat dp
    measured best there, operators/fieldmatch.py.)"""
    dp = spark.sparkContext.defaultParallelism
    if residue_rows is None:
        return dp * 32
    return max(dp, min(dp * 32, residue_rows // 64))
