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
