"""Shortlisting & waterfall selection (W1-W3, J6) as window functions.

The reference does per-group max + merge + stable-sort + drop_duplicates
(tools/fuzzy_match.py:239-243,313-318,384-386;
tools/matcher_funcs.py:1489-1523).  Windows express the same semantics in
one shuffle each, with explicit deterministic tie-breaks (pandas relied on
stable sort over input order; we order by ref_id/pass priority instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_max_score(pairs: DataFrame, group_col: str,
                   score_col: str = "fuzzy_score") -> DataFrame:
    """J6/A1: keep every candidate tying the per-group max score
    (tools/fuzzy_match.py:239-243) — prunes before the expensive verify/
    tie-break stage without a self-join."""
    w = Window.partitionBy(group_col)
    return (
        pairs.withColumn("__mx", F.max(score_col).over(w))
        .filter(F.col(score_col) == F.col("__mx"))
        .drop("__mx")
    )


def best_match(shortlist: DataFrame, group_col: str = "record_id",
               tiebreak_col: str = "ref_id") -> DataFrame:
    """W1: top-1 per search record with the reference's tie-break cascade
    (tools/fuzzy_match.py:313-318,384-386): full_match desc,
    full_number_match desc, fuzzy_score desc, wratio_score desc, then a
    deterministic id tie-break."""
    w = Window.partitionBy(group_col).orderBy(
        F.desc("full_match"),
        F.desc("full_number_match"),
        F.desc("fuzzy_score"),
        F.desc_nulls_last("wratio_score"),
        F.asc(tiebreak_col),
    )
    return (
        shortlist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def combine_passes(results: list[DataFrame], key: str = "record_id") -> DataFrame:
    """W2/W3: waterfall combine — union per-pass outputs, keep one row per
    record preferring full_match=true then the earliest pass
    (tools/matcher_funcs.py:1489-1523)."""
    tagged = [
        df.withColumn("pass_priority", F.lit(i)) for i, df in enumerate(results)
    ]
    allr = tagged[0]
    for df in tagged[1:]:
        allr = allr.unionByName(df, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(
        F.desc("full_match"), F.asc("pass_priority")
    )
    return (
        allr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def add_wratio_tiebreak(shortlist: DataFrame, ratio_udf,
                        group_cols=("record_id", "search_mod_address",
                                    "full_number_match",
                                    "room_number_search", "fuzzy_score")) -> DataFrame:
    """P2/X6: compute the plain-ratio tie-break ONLY for groups that are
    actually tied with full_number_match=true (tools/fuzzy_match.py:296-308)
    — the expensive UDF runs on the tiny tied subset.

    The group keys lead with record_id so this window's required
    clustering is satisfied by the keep_max_score/best_match exchange —
    all three windows share ONE shuffle.  (The reference counts ties
    globally by address text; keying by record additionally only splits
    ties between distinct records that share identical address text,
    which cannot change any per-record selection.)"""
    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    flagged = shortlist.withColumn("__ties", F.count(F.lit(1)).over(w))
    return flagged.withColumn(
        "wratio_score",
        F.when(
            F.col("full_number_match") & (F.col("__ties") > 1),
            ratio_udf(F.col("search_mod_address"), F.col("reference_mod_address")),
        ),
    ).drop("__ties")
