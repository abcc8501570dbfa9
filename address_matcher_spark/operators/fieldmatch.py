"""Field-wise weighted scoring pass (the reference's recordlinkage/NN pass,
tools/recordlinkage_funcs.py:15-278, re-expressed Spark-first).

The reference parses search addresses into LPI fields with a bi-LSTM whose
weights are not shipped (tools/matcher_funcs.py:1028-1033 skips the pass
when the model is absent), so the primary field-extractor here is the
deterministic regex layer (SURVEY §2.10 note): predicted fields come from
the standardisation outputs (flat/property numbers, street key, postcode).

Per-field comparison (J5/P3-P6):
  exact     — Sao/Pao number & suffix fields + SaoText  (missing→0)
  jaro-winkler — Organisation, PaoText, Street, PostTown (pandas UDF)
  levenshtein  — Postcode (built-in JVM function)
weights from tools/constants.py:246-268; score_perc rounded to 1 dp
(tools/recordlinkage_funcs.py:102-104); cutoffs 98.7 / 99.5 (street block)
per tools/constants.py:231-233 (D8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from address_matcher_spark.operators import blocking, scoring, select, verify

# tools/constants.py:238-268
MATCHING_VARIABLES = [
    "Organisation", "SaoStartNumber", "SaoStartSuffix", "SaoEndNumber",
    "SaoEndSuffix", "SaoText", "PaoStartNumber", "PaoStartSuffix",
    "PaoEndNumber", "PaoEndSuffix", "PaoText", "Street", "PostTown",
    "Postcode",
]
TEXT_COLUMNS = ["Organisation", "PaoText", "Street", "PostTown"]  # JW
LEV_COLUMNS = ["Postcode"]
EXACT_COLUMNS = [
    c for c in MATCHING_VARIABLES if c not in TEXT_COLUMNS + LEV_COLUMNS
]
# ref-side frame renames `Postcode` → `postcode_ref` (case-distinct from the
# search side's `postcode` under default caseSensitive=false)
REF_COL = {"Postcode": "postcode_ref"}
WEIGHTS = {c: 1.0 for c in MATCHING_VARIABLES}
WEIGHTS.update({
    "Organisation": 0.1, "SaoStartNumber": 2.0, "PaoStartNumber": 2.0,
    "Street": 2.0, "PostTown": 0.0, "Postcode": 0.5,
})
WEIGHT_SUM = sum(WEIGHTS.values())


def predict_lpi_fields(search_std: DataFrame) -> DataFrame:
    """Deterministic regex 'parser': standardisation outputs → predicted
    LPI fields (lower-cased; the reference side is lower-cased to match)."""
    blank = F.lit("")
    return (
        search_std
        .withColumn("p_Organisation", blank)
        .withColumn("p_SaoText", blank)
        .withColumn("p_SaoStartNumber", F.coalesce(F.col("flat_number_search"), blank))
        .withColumn("p_SaoStartSuffix", blank)
        .withColumn("p_SaoEndNumber", blank)
        .withColumn("p_SaoEndSuffix", blank)
        .withColumn("p_PaoText", blank)
        .withColumn("p_PaoStartNumber", F.coalesce(F.col("property_number_search"), blank))
        .withColumn("p_PaoStartSuffix", blank)
        .withColumn("p_PaoEndNumber", blank)
        .withColumn("p_PaoEndSuffix", blank)
        .withColumn("p_Street", F.lower(F.col("street_key")))
        .withColumn("p_PostTown", blank)
        .withColumn("p_Postcode", F.lower(F.regexp_replace(F.col("postcode"), r"\s+", "")))
    )


def field_pass(
    search_std: DataFrame,
    ref_std: DataFrame,
    blocker: str,
    cfg,
    pass_name: str,
) -> DataFrame:
    """J4 block → J5 per-field compare → P6 weighted sum → A2 max → D8 →
    D4-D7 verify → W5 best-per-record.  Output schema matches fuzzy_pass
    (score_perc carried as fuzzy_score, per the reference's rename at
    tools/recordlinkage_funcs.py:219-221)."""
    cutoff = cfg.score_cut_off_street if blocker == "Street" else cfg.score_cut_off
    key = "postcode_search" if blocker == "Postcode" else "street_key"

    s = predict_lpi_fields(search_std).filter(F.col(key) != "")
    s = s.withColumnRenamed(key, "__bk").drop(
        *({"postcode_search", "street_key"} - {key})
    )
    r = ref_std.filter(F.col(key) != "").withColumnRenamed(key, "__bk").drop(
        *({"postcode_search", "street_key"} - {key})
    )
    r = r.dropDuplicates(["__bk", "reference_mod_address"])

    salt = cfg.salt
    if salt == 0:
        salt = blocking.choose_salt(s, "__bk", cfg.salt_target_rows)
    # see fuzzy_pass: repartition the search side pre-join so the pair
    # fan-out + UDFs run on all cores and the windows reuse the clustering;
    # explicitly broadcast the small dimension-like ref side
    npart = int(s.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    s = s.repartition(npart, F.col("record_id"))
    if cfg.broadcast_ref is not False:
        pairs = s.join(
            F.broadcast(blocking.prefilter_ref(r, s, "__bk")),
            on="__bk", how="inner",
        )
    else:
        pairs = blocking.block_join(s, r, "__bk", salt=salt, prefilter=True)

    # blank text fields → ' ' so scorers accept them (F10,
    # tools/recordlinkage_funcs.py:27-29); lower-case both sides.
    def txt(c):
        x = F.lower(F.coalesce(c.cast("string"), F.lit("")))
        return F.when(x == "", F.lit(" ")).otherwise(x)

    score = F.lit(0.0)
    for c in EXACT_COLUMNS:
        sim = scoring.exact_similarity(
            F.lower(F.coalesce(F.col(f"p_{c}"), F.lit(""))),
            F.lower(F.coalesce(F.col(c).cast("string"), F.lit(""))),
        )
        score = score + F.lit(WEIGHTS[c]) * sim
    for c in TEXT_COLUMNS:
        if WEIGHTS[c] == 0.0:
            continue
        sim = scoring.jaro_winkler_udf(txt(F.col(f"p_{c}")), txt(F.col(c)))
        score = score + F.lit(WEIGHTS[c]) * sim
    for c in LEV_COLUMNS:
        sim = scoring.levenshtein_similarity(
            txt(F.col(f"p_{c}")), txt(F.col(REF_COL.get(c, c)))
        )
        score = score + F.lit(WEIGHTS[c]) * sim

    pairs = pairs.withColumn(
        "fuzzy_score", F.round(100.0 * score / F.lit(WEIGHT_SUM), 1)
    )
    shortlist = select.keep_max_score(pairs, "record_id")
    shortlist = verify.add_decisions(
        shortlist, blocker,
        fuzzy_match_limit=cutoff,
        no_number_fuzzy_match_limit=cfg.no_number_fuzzy_match_limit,
    )
    shortlist = shortlist.withColumn("wratio_score", F.lit(None).cast("double"))
    best = select.best_match(shortlist, "record_id")
    return best.withColumn("match_method", F.lit(pass_name))
