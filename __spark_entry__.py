"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full blocking + scoring + verification
                 waterfall over pseudo-addresses synthesised from the
                 sf0.001 orders/customer tables (deterministic; exercises
                 the whole operator stack end-to-end).
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 training-data extensions), defined in
                 address_matcher_spark/plans/driver_queries.py.
oracle_sql()   — DuckDB-runnable equivalents generated from the same rule
                 tables as the Spark operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: ER waterfall over sf0.001-derived pseudo addresses."""
    from address_matcher_spark.plans import driver_queries as DQ
    from address_matcher_spark.plans import pipeline as P

    sf_dir = "/root/testdata/sf0.001"
    DQ.register_views(spark, sf_dir)

    search_raw = spark.table("er_search").select(
        F.col("record_id"),
        F.concat(F.lit("order://"), F.col("record_id").cast("string")).alias("url"),
        F.col("body").alias("address_line1"),
        F.lit("").alias("address_line2"),
        F.lit("london").alias("town"),
        F.col("postcode"),
    )
    ref_raw = spark.table("er_ref").select(
        F.col("ref_id"),
        F.lit("").alias("Organisation"),
        F.lit("").alias("SaoText"),
        F.lit("").alias("SaoStartNumber"),
        F.lit("").alias("SaoStartSuffix"),
        F.lit("").alias("SaoEndNumber"),
        F.lit("").alias("SaoEndSuffix"),
        F.lit("").alias("PaoText"),
        F.col("pao_number").alias("PaoStartNumber"),
        F.lit("").alias("PaoStartSuffix"),
        F.lit("").alias("PaoEndNumber"),
        F.lit("").alias("PaoEndSuffix"),
        F.upper(F.col("street")).alias("Street"),
        F.lit("LONDON").alias("PostTown"),
        F.col("postcode").alias("Postcode"),
        F.col("ref_id").cast("string").alias("UPRN"),
    )

    # run_field_passes=True: the flagship executes ALL 8 passes (4 fuzzy +
    # 4 field) so the driver's end-to-end smoke covers the fieldmatch
    # cogroup and both lockstep kernel lanes too (VERDICT r5 'Next
    # round' #1); at sf0.001 the field passes add ~seconds.
    cfg = P.MatchConfig(run_field_passes=True)
    # keep the synthesized record_id as the stable key (no url re-hash here)
    search = P.prepare_search(search_raw, cfg)
    ref = P.prepare_reference(ref_raw)
    res = P.run_waterfall(
        P.standardise_search(search, False),
        P.standardise_search(search, True),
        P.standardise_reference(ref, False),
        P.standardise_reference(ref, True),
        cfg,
    )
    return res.select(
        "record_id", "ref_id", "UPRN", "fuzzy_score", "full_match",
        "full_number_match", "close_postcode_match", "match_method",
        "search_mod_address", "reference_mod_address",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from address_matcher_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from address_matcher_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
