"""Field-pass cogroup parity: the Arrow cogrouped field scorer
(fieldmatch.field_cross_score, O(rows) transfer) must select exactly the
same per-record max-score candidates as the round-2 formula it replaced —
an explicit pair join scored with JVM/pandas-UDF column expressions
(reference semantics tools/recordlinkage_funcs.py:15-278)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from address_matcher_spark import datagen
from address_matcher_spark.operators import fieldmatch as FM
from address_matcher_spark.operators import scoring, select
from address_matcher_spark.plans import pipeline as P


@pytest.fixture(scope="module")
def sides(spark):
    fx = datagen.generate(datagen.Scale(n_ref=300, n_search=200))
    cfg = P.MatchConfig()
    search = P.prepare_search(
        P.search_from_pages(spark.createDataFrame(fx["pages"])), cfg
    )
    ref = P.prepare_reference(spark.createDataFrame(fx["reference_addresses"]))
    smin = P.standardise_search(search, False)
    rmin = P.standardise_reference(ref, False)
    # pre-dedup the ref side so both paths see identical rows (each path's
    # internal dropDuplicates picks an arbitrary survivor otherwise)
    rmin = rmin.dropDuplicates(["postcode_search", "reference_mod_address"])
    return smin.localCheckpoint(), rmin.localCheckpoint(), cfg


def _expected_candidates(s_std, r_std, blocker):
    """Round-2 path: explicit block join + column-expression weighted sum."""
    key = "postcode_search" if blocker == "Postcode" else "street_key"
    other = ({"postcode_search", "street_key"} - {key}).pop()
    s = (
        FM.predict_lpi_fields(s_std).filter(F.col(key) != "")
        .withColumnRenamed(key, "__bk").drop(other)
    )
    r = (
        r_std.filter(F.col(key) != "")
        .withColumnRenamed(key, "__bk").drop(other)
    )
    r = r.dropDuplicates(["__bk", "reference_mod_address"])
    pairs = s.join(r, "__bk")

    def txt(c):
        x = F.lower(F.coalesce(c.cast("string"), F.lit("")))
        return F.when(x == "", F.lit(" ")).otherwise(x)

    score = F.lit(0.0)
    for c in FM.EXACT_COLUMNS:
        score = score + F.lit(FM.WEIGHTS[c]) * scoring.exact_similarity(
            F.lower(F.coalesce(F.col(f"p_{c}"), F.lit(""))),
            F.lower(F.coalesce(F.col(c).cast("string"), F.lit(""))),
        )
    for c in FM.TEXT_COLUMNS:
        if FM.WEIGHTS[c] == 0.0:
            continue
        score = score + F.lit(FM.WEIGHTS[c]) * scoring.jaro_winkler_udf(
            txt(F.col(f"p_{c}")), txt(F.col(c))
        )
    for c in FM.LEV_COLUMNS:
        score = score + F.lit(FM.WEIGHTS[c]) * scoring.levenshtein_similarity(
            txt(F.col(f"p_{c}")), txt(F.col(FM.REF_COL.get(c, c)))
        )
    pairs = pairs.withColumn(
        "fuzzy_score", F.round(100.0 * score / F.lit(FM.WEIGHT_SUM), 1)
    )
    return select.keep_max_score(pairs, "record_id").select(
        "record_id", "ref_id", "fuzzy_score"
    )


@pytest.mark.parametrize("blocker", ["Postcode", "Street"])
def test_field_candidates_parity(sides, blocker):
    smin, rmin, cfg = sides
    got = {
        (r["record_id"], r["ref_id"], r["fuzzy_score"])
        for r in FM.field_candidates(smin, rmin, blocker, cfg).collect()
    }
    want = {
        (r["record_id"], r["ref_id"], r["fuzzy_score"])
        for r in _expected_candidates(smin, rmin, blocker).collect()
    }
    assert got == want and len(got) > 0


def test_field_candidates_salted_block_parity(spark, sides):
    """A block heavy enough to trigger grid salting must still return the
    global per-record max (per-group maxima + the window restore it)."""
    smin, rmin, _ = sides
    cfg = P.MatchConfig(salt_target_pairs=50)  # force multi-way splits
    got = {
        (r["record_id"], r["ref_id"], r["fuzzy_score"])
        for r in FM.field_candidates(smin, rmin, "Postcode", cfg).collect()
    }
    want = {
        (r["record_id"], r["ref_id"], r["fuzzy_score"])
        for r in _expected_candidates(smin, rmin, "Postcode").collect()
    }
    assert got == want
