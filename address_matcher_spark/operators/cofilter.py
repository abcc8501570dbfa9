"""Pre-match co-filters and prior-results plumbing (F3/F4/J10/J11).

Reference semantics:
  F3  postcode-AREA co-filter         tools/matcher_funcs.py:567-606
  F4  previously-matched exclusion    tools/matcher_funcs.py:556-606
  J11 prior-results join              tools/matcher_funcs.py:527-531
  J10 join results back to orig df    tools/fuzzy_match.py:389-444

Scale notes (100 TB): the postcode-area domain is bounded (a few thousand
distinct values however big the corpus), so both co-filter semi-joins
broadcast the distinct-area side — the big fact tables are filtered in
place with zero shuffle of their own rows.  Prior-matched exclusion is a
key anti-join (one shuffle of ids, not payloads).  join_to_orig_df keeps
only full-match winners on the build side so the user's original table is
streamed once against a winner set no bigger than itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INCLUDED = "Included in search"
EXCL_AREA = "Postcode area not found"
EXCL_LEN0 = "Address length 0"
EXCL_PRIOR = "Previously matched"
EXCLUSION_COL = "excluded_from_search"


def postcode_area(col: Column) -> Column:
    """strip → upper → despace → drop the last 2 chars
    (tools/matcher_funcs.py:571-572 — the inward code minus the final two
    characters, i.e. district + sector prefix)."""
    x = F.regexp_replace(F.upper(F.trim(F.coalesce(col, F.lit("")))), r"\s", "")
    return x.substr(F.lit(1), F.greatest(F.length(x) - 2, F.lit(0)))


def joined_address_length(address_cols) -> Column:
    """The reference's ``address_cols_joined`` length check
    (tools/matcher_funcs.py:561-565): fillna('') each address column,
    concatenate WITHOUT separator, strip, measure.  Stripping matches
    pandas str.strip() (= str.isspace()) exactly: (?U) makes Java's \\s
    the Unicode White_Space class (covers U+00A0, U+2000-200A, U+3000,
    ...), and the explicit \\x1c-\\x1f adds the file/group separators
    Python's isspace() strips but White_Space doesn't include.  Plain
    ASCII \\s left an address of non-breaking spaces counted non-empty
    here but empty (EXCL_LEN0) in the reference."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in address_cols]
    ws = r"(?U)^[\s\x1c-\x1f]+|[\s\x1c-\x1f]+$"
    return F.length(F.regexp_replace(F.concat(*parts), ws, ""))


def label_area_exclusions(
    search: DataFrame,
    ref: DataFrame,
    search_pc: str = "postcode",
    ref_pc: str = "Postcode",
    address_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """F3 labeling half: append EXCLUSION_COL to the search side —
    'Postcode area not found' when the row's area is absent from the
    reference's area set (areas shorter than 4 chars don't count as ref
    evidence, tools/matcher_funcs.py:574).  When address_cols is given,
    zero-length joined addresses are labeled 'Address length 0', which is
    applied AFTER the area label in the reference and therefore takes
    precedence (tools/matcher_funcs.py:578-580)."""
    areas = (
        ref.select(postcode_area(F.col(ref_pc)).alias("__area"))
        .filter(F.length("__area") > 3)
        .distinct()
        .withColumn("__found", F.lit(True))
    )
    label = F.when(F.col("__found").isNotNull(), F.lit(INCLUDED)).otherwise(
        F.lit(EXCL_AREA)
    )
    if address_cols:
        label = F.when(
            joined_address_length(address_cols) == 0, F.lit(EXCL_LEN0)
        ).otherwise(label)
    out = (
        search.withColumn("__area", postcode_area(F.col(search_pc)))
        .join(F.broadcast(areas), "__area", "left")
        .withColumn(EXCLUSION_COL, label)
        .drop("__area", "__found")
    )
    return out


def area_cofilter(
    search: DataFrame,
    ref: DataFrame,
    search_pc: str = "postcode",
    ref_pc: str = "Postcode",
    address_cols: tuple[str, ...] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """F3 both directions (tools/matcher_funcs.py:567-606): returns
    (search_kept, ref_kept, search_labeled).  search rows keep only areas
    present in the reference AND (when address_cols is given) non-empty
    joined addresses; the reference then keeps only areas present in the
    SURVIVING search rows.  Both semi-joins broadcast a bounded
    distinct-area set — no shuffle of either fact table."""
    labeled = label_area_exclusions(search, ref, search_pc, ref_pc, address_cols)
    kept = labeled.filter(F.col(EXCLUSION_COL) == INCLUDED).drop(EXCLUSION_COL)
    search_areas = (
        kept.select(postcode_area(F.col(search_pc)).alias("__area")).distinct()
    )
    ref_kept = (
        ref.withColumn("__area", postcode_area(F.col(ref_pc)))
        .join(F.broadcast(search_areas), "__area", "left_semi")
        .drop("__area")
    )
    return kept, ref_kept, labeled


def exclude_previously_matched(
    search: DataFrame,
    prior_results: DataFrame,
    key: str = "record_id",
    match_col: str = "full_match",
) -> tuple[DataFrame, DataFrame]:
    """F4/J11 (tools/matcher_funcs.py:527-556): drop search rows whose key
    appears as a full match in a prior results table.  Returns
    (todo, labeled) where labeled carries EXCLUSION_COL = 'Previously
    matched' / 'Included in search' for bookkeeping parity with the
    reference's pre_filter_search_df."""
    matched = (
        prior_results.filter(F.col(match_col))
        .select(F.col(key))
        .distinct()
        .withColumn("__prior", F.lit(True))
    )
    labeled = (
        search.join(matched, key, "left")
        .withColumn(
            EXCLUSION_COL,
            F.when(F.col("__prior").isNotNull(), F.lit(EXCL_PRIOR)).otherwise(
                F.lit(INCLUDED)
            ),
        )
        .drop("__prior")
    )
    todo = labeled.filter(F.col(EXCLUSION_COL) == INCLUDED).drop(EXCLUSION_COL)
    return todo, labeled


def join_prior_results(
    search: DataFrame, prior_results: DataFrame, key: str = "record_id"
) -> DataFrame:
    """J11 (tools/matcher_funcs.py:527-531): left-join a previous run's
    results onto the search frame so downstream stages can see existing
    matches.  Prior columns that collide with search columns are suffixed
    '_prior' (pandas-merge suffix semantics, Spark-safe)."""
    dup = {c for c in prior_results.columns if c in search.columns and c != key}
    prior = prior_results
    for c in dup:
        prior = prior.withColumnRenamed(c, f"{c}_prior")
    return search.join(prior, key, "left")


def join_to_orig_df(
    results: DataFrame,
    orig: DataFrame,
    key: str = "record_id",
    join_cols: tuple[str, ...] = ("UPRN",),
    matched_address_col: str = "fulladdress",
) -> DataFrame:
    """J10 (tools/fuzzy_match.py:389-444): append the match outcome to the
    user's ORIGINAL dataframe.  Winners only (full_match) build the join
    side; carried columns are renamed to the reference's result names and,
    when the original already has them (re-runs), the new value wins and
    the old fills the gaps (np.where semantics at fuzzy_match.py:421-424).
    Output = every original row, matched or not."""
    winners = (
        results.filter(F.col("full_match"))
        .select(
            F.col(key),
            F.col(matched_address_col).alias("ref_matched_address"),
            F.col("full_match").alias("matched_with_reference"),
            *[F.col(c) for c in join_cols],
        )
        .dropDuplicates([key])
    )
    carried = ["ref_matched_address", "matched_with_reference", *join_cols]
    overlap = [c for c in carried if c in orig.columns]
    w = winners
    for c in overlap:
        w = w.withColumnRenamed(c, f"{c}__new")
    out = orig.join(w, key, "left")
    for c in overlap:
        out = out.withColumn(c, F.coalesce(F.col(f"{c}__new"), F.col(c))).drop(
            f"{c}__new"
        )
    if "matched_with_reference" not in overlap:
        out = out.withColumn(
            "matched_with_reference",
            F.coalesce(F.col("matched_with_reference"), F.lit(False)),
        )
    return out
