"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
