"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the reference side of the matcher is a slowly-changing
dimension (the LPI extract) that every incremental run re-joins on the
same blocking key.  Writing BOTH sides bucketed on that key means the
per-run block join needs NO exchange at all: Spark's bucketed
SortMergeJoin reads matching buckets pairwise (bucket pruning applies to
equality filters on the key too).  This is the Hive/Iceberg
`bucket(N, key)` partition-transform pattern expressed through Spark's
native bucketed tables — the closest analogue available without an
external catalog in this environment.

Shape rules (locked by tests/test_bucketing.py):
  * both tables bucketed on the SAME key with the SAME bucket count;
  * bucket count chosen once for the corpus (at 100 TB: thousands —
    each bucket should be a few hundred MB after compression);
  * `sortBy` the key so the merge join needs no per-bucket sort.

Ref context: the reference re-reads its whole reference extract per run
(tools/matcher_funcs.py:620-720); this module is the scale-path
replacement for that pattern, not a port of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (+ sorted) parquet table in the session
    catalog.  `path` overrides the warehouse location (external table)."""
    writer = df.write.format("parquet").mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def _path_has_success(spark: SparkSession, path: str) -> bool:
    """True when a previous bucketed write completed at `path` (Hadoop FS
    API — works for any configured filesystem, not just local)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def ensure_bucketed_ref(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str = "postcode_search",
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Write-once bucketed materialisation of a standardised reference
    side (the 100 TB dimension-reuse path, scripts/job_match.py
    AM_BUCKETED_REF_DIR).

    First run: writes `df` as a bucketed external table at `path`.
    Later runs (fresh session, in-memory catalog empty): the bucketing
    METADATA lives in the catalog, not the files, so the table is
    re-DECLARED over the existing files with CREATE TABLE ... CLUSTERED
    BY ... LOCATION — data is not rewritten and the scan keeps its
    exchange-free HashPartitioning.  A bucketed table is already
    durable, so callers skip the pipeline's checkpoint materialisation
    for it (run_waterfall(ref_materialized=True))."""
    if spark.catalog.tableExists(table):
        return spark.table(table)
    if path is not None and _path_has_success(spark, path):
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        )
        sorted_clause = f"SORTED BY (`{key}` ASC)" if sort else ""
        spark.sql(
            f"CREATE TABLE `{table}` ({ddl}) USING PARQUET "
            f"CLUSTERED BY (`{key}`) {sorted_clause} "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
        return spark.table(table)
    write_bucketed(df, table, key, n_buckets, path=path, sort=sort)
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.  With equal
    bucket counts on both sides this plans as a zero-exchange
    SortMergeJoin (asserted in tests) — at 100 TB that removes the
    dominant shuffle of the blocking stage entirely."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
