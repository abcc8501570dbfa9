"""Reference-side schema coercion + multi-file ingest (S2/S3).

Reference semantics:
  on-prem LLPG rename map      tools/matcher_funcs.py:416-432
  Addressbase API rename map   tools/matcher_funcs.py:442-462
  missing-LPI backfill         tools/matcher_funcs.py:466-473
  multi-file provenance column tools/matcher_funcs.py:404-412
  non-standard last-col-is-postcode fallback  tools/matcher_funcs.py:475-478

Scale notes: renames and backfills are pure projections (zero shuffle);
multi-file union is a UnionExec over per-file scans with the provenance
column computed from input_file_name() at scan time — no per-file driver
loop over data, only over paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# tools/matcher_funcs.py:417-432 — on-prem LLPG extract → LPI
LLPG_RENAMES = {
    "Name_LPI": "PaoText",
    "Num_LPI": "PaoStartNumber",
    "Num_Suffix_LPI": "PaoStartSuffix",
    "Number End_LPI": "PaoEndNumber",
    "Number_End_Suffix_LPI": "PaoEndSuffix",
    "Secondary_Name_LPI": "SaoText",
    "Secondary_Num_LPI": "SaoStartNumber",
    "Secondary_Num_Suffix_LPI": "SaoStartSuffix",
    "Secondary_Num_End_LPI": "SaoEndNumber",
    "Secondary_Num_End_Suffix_LPI": "SaoEndSuffix",
    "Postcode_LPI": "Postcode",
    "Postal_Town_LPI": "PostTown",
    "UPRN_BLPU": "UPRN",
}

# tools/matcher_funcs.py:442-462 — Addressbase Places API output → LPI
API_RENAMES = {
    "ORGANISATION_NAME": "Organisation",
    "ORGANISATION": "Organisation",
    "PAO_TEXT": "PaoText",
    "PAO_START_NUMBER": "PaoStartNumber",
    "PAO_START_SUFFIX": "PaoStartSuffix",
    "PAO_END_NUMBER": "PaoEndNumber",
    "PAO_END_SUFFIX": "PaoEndSuffix",
    "STREET_DESCRIPTION": "Street",
    "SAO_TEXT": "SaoText",
    "SAO_START_NUMBER": "SaoStartNumber",
    "SAO_START_SUFFIX": "SaoStartSuffix",
    "SAO_END_NUMBER": "SaoEndNumber",
    "SAO_END_SUFFIX": "SaoEndSuffix",
    "POSTCODE_LOCATOR": "Postcode",
    "TOWN_NAME": "PostTown",
    "LOCALITY_NAME": "LocalityName",
    "ADMINISTRATIVE_AREA": "AdministrativeArea",
}

LPI_ADDRESS_COLS = [
    "Organisation", "SaoStartNumber", "SaoStartSuffix", "SaoEndNumber",
    "SaoEndSuffix", "SaoText", "PaoStartNumber", "PaoStartSuffix",
    "PaoEndNumber", "PaoEndSuffix", "PaoText", "Street", "PostTown",
    "Postcode",
]


def _apply_renames(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    present = {src: dst for src, dst in renames.items() if src in df.columns}
    # two sources can map to the same target (ORGANISATION_NAME vs
    # ORGANISATION) — first hit wins, like pandas rename on real frames
    taken: set[str] = set(df.columns)
    for src, dst in present.items():
        if dst in taken:
            continue
        df = df.withColumnRenamed(src, dst)
        taken.add(dst)
    return df


def coerce_reference_schema(
    df: DataFrame, ref_address_cols: list[str] | None = None
) -> DataFrame:
    """Normalise an arbitrary reference extract to the standard LPI schema.

    Detection is by column presence (no driver-side data peek):
      * 'Address_LPI' column        → on-prem LLPG rename map
      * any ALL_CAPS API column     → Addressbase API rename map
      * ref_address_cols given      → non-standard source; its LAST entry
        is renamed 'Postcode' (tools/matcher_funcs.py:475-478)
    then every missing LPI column is backfilled as null string
    (tools/matcher_funcs.py:466-473) so prepare_reference never crashes on
    a thinner extract."""
    if "Address_LPI" in df.columns:
        df = _apply_renames(df, LLPG_RENAMES)
    if any(c in df.columns for c in API_RENAMES):
        df = _apply_renames(df, API_RENAMES)
    if ref_address_cols and "SaoText" not in df.columns:
        last = ref_address_cols[-1]
        if last in df.columns and last != "Postcode":
            df = df.withColumnRenamed(last, "Postcode")
    for c in LPI_ADDRESS_COLS:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    if "UPRN" not in df.columns:
        # thin extracts without an id column still flow through the full
        # pipeline (UPRN is carried into results/join-back)
        df = df.withColumn("UPRN", F.lit(None).cast("bigint"))
    return df


def read_reference_files(
    spark: SparkSession,
    paths: list[str],
    fmt: str = "parquet",
    provenance_col: str = "reference_file",
) -> DataFrame:
    """S2: union N reference extracts with a provenance column naming the
    source file (tools/matcher_funcs.py:404-412, `get_file_name`).  Each
    path is read and coerced independently (schemas may differ); the
    provenance column is the dataset's basename (what the reference
    records) and `input_file` carries the physical split from
    input_file_name() for per-partition lineage.  Union is by name with
    missing columns null-filled."""
    out: DataFrame | None = None
    for p in paths:
        df = spark.read.format(fmt).load(p)
        df = coerce_reference_schema(df)
        base = os.path.basename(p.rstrip("/"))
        base = base.rsplit(".", 1)[0] if "." in base else base
        df = df.withColumn(provenance_col, F.lit(base)).withColumn(
            "input_file", F.input_file_name()
        )
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    if out is None:
        raise ValueError("read_reference_files: no paths given")
    return out
