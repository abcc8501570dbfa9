"""J14: fuzzy-vs-score-based diagnostic comparison
(tools/recordlinkage_funcs.py:280-350, check_matches_against_fuzzy).

Given the per-record best rows from two methods (the fuzzy waterfall and
the field-wise score-based/NN pass), produce one row per record with both
verdicts, the combined OR flag the reference exports as
`full_match_fuzzy_or_score_based`, and a method_agreement label for the
two single-method slices the reference materialises separately
(model-found-only / fuzzy-found-only).

Scale: one full-outer equi-join on the record key — a single shuffle of
two already-deduplicated per-record frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_match_methods(
    fuzzy: DataFrame,
    scored: DataFrame,
    key: str = "record_id",
    match_col: str = "full_match",
    score_col: str = "fuzzy_score",
) -> DataFrame:
    """One row per record_id seen by either method:
    fuzzy_full_match / score_full_match (absent side → false, per the
    reference's fillna at recordlinkage_funcs.py:296-299),
    full_match_either (the reference's full_match_fuzzy_or_score_based),
    method_agreement ∈ both | fuzzy_only | score_only | neither."""
    f = fuzzy.dropDuplicates([key]).select(
        F.col(key),
        F.coalesce(F.col(match_col), F.lit(False)).alias("fuzzy_full_match"),
        F.col(score_col).cast("double").alias("fuzzy_method_score"),
    )
    s = scored.dropDuplicates([key]).select(
        F.col(key),
        F.coalesce(F.col(match_col), F.lit(False)).alias("score_full_match"),
        F.col(score_col).cast("double").alias("score_method_score"),
    )
    out = (
        f.join(s, key, "full_outer")
        .withColumn("fuzzy_full_match",
                    F.coalesce(F.col("fuzzy_full_match"), F.lit(False)))
        .withColumn("score_full_match",
                    F.coalesce(F.col("score_full_match"), F.lit(False)))
        .withColumn(
            "full_match_either",
            F.col("fuzzy_full_match") | F.col("score_full_match"),
        )
        .withColumn(
            "method_agreement",
            F.when(F.col("fuzzy_full_match") & F.col("score_full_match"),
                   F.lit("both"))
            .when(F.col("fuzzy_full_match"), F.lit("fuzzy_only"))
            .when(F.col("score_full_match"), F.lit("score_only"))
            .otherwise(F.lit("neither")),
        )
    )
    return out
