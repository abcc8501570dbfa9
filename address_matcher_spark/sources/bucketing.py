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

import json
import re

from pyspark.sql import DataFrame, SparkSession

# sidecar persisted next to _SUCCESS at write time; the re-declare path
# validates against it (the CLUSTERED BY declaration is TRUSTED by Spark —
# files hashed with a different key/bucket-count would silently misroute
# rows through every "exchange-free" join)
_SIDECAR = "_bucket_spec.json"


def _fs(spark: SparkSession, p: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(p)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _write_text(spark: SparkSession, p: str, text: str) -> None:
    fs, hpath, _ = _fs(spark, p)
    out = fs.create(hpath, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()


def _read_text(spark: SparkSession, p: str) -> str | None:
    fs, hpath, jvm = _fs(spark, p)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray()).decode("utf-8")


def _bucket_spec(df: DataFrame, key: str, n_buckets: int, sort: bool) -> dict:
    return {
        "key": key,
        "n_buckets": n_buckets,
        "sort": sort,
        "schema": [[f.name, f.dataType.simpleString()] for f in df.schema.fields],
    }


_BUCKET_ID_RE = re.compile(r"_(\d{5})\.c\d+")


def _file_bucket_ids(spark: SparkSession, path: str) -> dict[int, int]:
    """Bucket-id → file count parsed from the data filenames (Spark
    writes part-...-<uuid>_<bucketid>.c000.parquet; getName() is the
    basename, so a path component can never shadow the id)."""
    fs, hpath, _ = _fs(spark, path)
    ids: dict[int, int] = {}
    for st in fs.listStatus(hpath):
        m = _BUCKET_ID_RE.search(st.getPath().getName())
        if m:
            b = int(m.group(1))
            ids[b] = ids.get(b, 0) + 1
    return ids


def _check_one_file_per_bucket(ids: dict[int, int], path: str,
                               sort: bool) -> None:
    """sort=True promises per-BUCKET key order, but the in-file
    monotonicity probe only proves per-FILE order — with two files in
    one bucket the bucket's global order is unproven, so refuse
    (ADVICE r6).  Spark's own bucketed writer emits one file per
    (bucket, write task attempt); multiple files mean hand-assembly."""
    if not sort:
        return
    multi = {b: c for b, c in ids.items() if c > 1}
    if multi:
        raise ValueError(
            f"bucketed table at {path} declares sort=True but buckets "
            f"{sorted(multi)} have multiple data files each; per-bucket "
            "sort order cannot be verified — rewrite the table or "
            "declare sort=False"
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (+ sorted) parquet table in the session
    catalog.  `path` overrides the warehouse location (external table);
    external writes also persist a _bucket_spec.json sidecar so later
    sessions can VALIDATE the layout before re-declaring it."""
    writer = df.write.format("parquet").mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
    if path:
        _write_text(
            df.sparkSession, f"{path}/{_SIDECAR}",
            json.dumps(_bucket_spec(df, key, n_buckets, sort)),
        )


def _path_has_success(spark: SparkSession, path: str) -> bool:
    """True when a previous bucketed write completed at `path` (Hadoop FS
    API — works for any configured filesystem, not just local)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _verify_layout_by_scan(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    n_buckets: int,
    sort: bool,
) -> None:
    """Prove the on-disk files carry the declared bucket layout by
    SCANNING them (one-time sidecar migration, ADVICE r5): schema
    equality, per-row pmod(murmur3(key), n) == the filename's bucket id
    (Spark's HashPartitioning.partitionIdExpression — F.hash is the same
    murmur3/seed-42), and per-file key monotonicity when sort=True.
    Stronger than trusting a sidecar; costs one read of the table.

    The sort probe checks consecutive same-file runs within each scan
    partition; a file large enough to be SPLIT across partitions is not
    checked across the split boundary (migration tables here are single
    write-task outputs, far below maxPartitionBytes)."""
    from pyspark.sql import functions as F

    disk = spark.read.parquet(path)
    want_schema = [[f.name, f.dataType.simpleString()]
                   for f in df.schema.fields]
    got_schema = [[f.name, f.dataType.simpleString()]
                  for f in disk.schema.fields]
    if want_schema != got_schema:
        raise ValueError(
            f"bucketed table at {path} (no sidecar) has on-disk schema "
            f"{got_schema!r} but the declaration expects {want_schema!r}; "
            "refusing to migrate — rewrite the table"
        )
    ids = _file_bucket_ids(spark, path)
    if ids and max(ids) >= n_buckets:
        raise ValueError(
            f"bucketed table at {path} (no sidecar) contains bucket-id "
            f"{max(ids)} >= declared bucket count {n_buckets}; refusing "
            "to migrate — rewrite the table"
        )
    _check_one_file_per_bucket(ids, path, sort)
    # bucket id parsed from the BASENAME only (ADVICE r6): a directory
    # component that happens to match _(\d{5}).c\d+ anywhere in the full
    # path must not shadow the filename's real bucket id
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    probe = disk.select(
        F.col(key).alias("__k"),
        F.regexp_extract(base, r"_(\d{5})\.c\d+", 1)
        .cast("int").alias("__fid"),
        F.pmod(F.hash(F.col(key)), F.lit(n_buckets)).alias("__hid"),
        F.input_file_name().alias("__f"),
    )
    bad_hash = probe.where(
        F.col("__fid").isNull() | (F.col("__fid") != F.col("__hid"))
    ).limit(1).count()
    if bad_hash:
        raise ValueError(
            f"bucketed table at {path} (no sidecar): rows hash to a "
            f"different bucket than their filename claims under key="
            f"{key!r} n_buckets={n_buckets}; the files were not written "
            "with this layout — rewrite the table"
        )
    if sort:
        def _runs_sorted(batches):
            import pandas as pd

            last_f = None
            last_k = None
            viol = 0
            for b in batches:
                for f, k in zip(b["__f"].values, b["__k"].values):
                    if f == last_f:
                        # ascending, nulls first (Spark sortBy default)
                        if last_k is not None and (k is None or k < last_k):
                            viol += 1
                    last_f, last_k = f, k
            yield pd.DataFrame({"viol": [viol]})

        total = (
            probe.select("__f", "__k")
            .mapInPandas(_runs_sorted, "viol long")
            .agg(F.sum("viol").alias("v")).first()["v"]
        )
        if total:
            raise ValueError(
                f"bucketed table at {path} (no sidecar) declares "
                f"sort={sort} but {total} in-file key inversions were "
                "found; refusing to migrate — rewrite the table or "
                "declare sort=False"
            )


def _validate_bucket_layout(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: str,
    n_buckets: int,
    sort: bool,
) -> None:
    """Raise unless the on-disk layout matches what the caller is about to
    declare.  CREATE TABLE ... CLUSTERED BY over existing files is a pure
    TRUST declaration: if AM_REF_BUCKETS or the standardisation schema
    changed between runs, Spark would assume a hash partitioning the files
    don't have and exchange-free joins would silently drop/misroute rows.

    Tables written before the sidecar existed migrate in place: the
    layout is PROVEN by scanning the files (_verify_layout_by_scan),
    then the sidecar is written so later declares are metadata-only."""
    raw = _read_text(spark, f"{path}/{_SIDECAR}")
    if raw is None:
        _verify_layout_by_scan(spark, df, path, key, n_buckets, sort)
        _write_text(
            spark, f"{path}/{_SIDECAR}",
            json.dumps(_bucket_spec(df, key, n_buckets, sort)),
        )
        return
    spec = json.loads(raw)
    want = _bucket_spec(df, key, n_buckets, sort)
    for field in ("key", "n_buckets", "sort", "schema"):
        if spec.get(field) != want[field]:
            raise ValueError(
                f"bucketed table at {path} was written with {field}="
                f"{spec.get(field)!r} but the current run declares "
                f"{want[field]!r}; refusing to re-declare (joins would "
                "silently misroute rows) — rewrite the table or align the "
                "configuration"
            )
    ids = _file_bucket_ids(spark, path)
    if ids and max(ids) >= n_buckets:
        raise ValueError(
            f"bucketed table at {path} contains bucket-id {max(ids)} >= "
            f"declared bucket count {n_buckets}; files do not match the "
            "sidecar — rewrite the table"
        )
    _check_one_file_per_bucket(ids, path, sort)


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
        _validate_bucket_layout(spark, df, path, key, n_buckets, sort)
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
